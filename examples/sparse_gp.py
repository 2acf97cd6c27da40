"""Sparse GP (FITC/VFE) on noisy data with inducing points."""

import numpy as np

import egobox_tpu as egx

rng = np.random.RandomState(42)
n = 300
xt = np.sort(rng.uniform(0, 4 * np.pi, (n, 1)), axis=0)
yt = (np.sin(xt[:, 0]) + rng.normal(0, 0.1, n))[:, None]

sgp = egx.SparseGpx.builder(nz=30, method=egx.SparseMethod.VFE).fit(xt, yt)
print(sgp)
print("estimated noise variance:", sgp.noise_variances()[0])
