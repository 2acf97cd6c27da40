"""GP surrogate modeling with Gpx: fit, predict, uncertainty, sampling,
persistence."""

import numpy as np

import egobox_tpu as egx

xt = np.array([[0.0, 1.0, 2.0, 3.0, 4.0]]).T
yt = np.array([[0.0, 1.0, 1.5, 0.9, 1.0]]).T

gpx = egx.Gpx.builder().fit(xt, yt)
xq = np.linspace(0, 4, 9)[:, None]
print("mean:", gpx.predict(xq).round(3))
print("std :", np.sqrt(gpx.predict_var(xq))[:, 0].round(3))
print("traj:", gpx.sample(xq, 3).shape)
gpx.save("gp_model.json")
print(egx.Gpx.load("gp_model.json"))
