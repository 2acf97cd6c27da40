"""Dense kriging fit/predict with Matern 5/2 on Mauna-Loa-like CO2 data
(BASELINE.json config: "Gpx on Mauna Loa CO2").

The real dataset needs network access; this example synthesizes the same
structure — slow rise + seasonal oscillation + noise — at the same scale
(~500 monthly observations).
"""

import numpy as np

import egobox_tpu as egx


def co2_like(t):
    """ppm-like signal: quadratic trend + annual cycle."""
    return (
        315.0
        + 1.5 * t
        + 0.02 * t**2
        + 3.0 * np.sin(2 * np.pi * t)
        + 0.7 * np.sin(4 * np.pi * t + 0.3)
    )


if __name__ == "__main__":
    rng = np.random.RandomState(0)
    t = np.sort(rng.uniform(0.0, 40.0, 480))  # ~40 years monthly
    y = co2_like(t) + rng.normal(0.0, 0.3, t.shape[0])

    gpx = egx.Gpx.builder(
        corr_spec=egx.CorrelationSpec.MATERN52,
        regr_spec=egx.RegressionSpec.QUADRATIC,
        n_start=5,
    ).fit(t[:, None], y[:, None])

    t_test = np.linspace(0.0, 42.0, 200)[:, None]  # extrapolate 2 years
    mean = gpx.predict(t_test)
    std = np.sqrt(gpx.predict_var(t_test))

    in_range = t_test[:, 0] <= 40.0
    err = np.abs(mean[in_range] - co2_like(t_test[in_range, 0]))
    print(f"in-range MAE: {err.mean():.3f} ppm (noise sigma 0.3)")
    print(f"extrapolation std grows to {std[-1]:.2f} ppm")
