"""Ackley 3-D (mirror of the reference example
crates/ego/examples/ackley.rs: Matern52 + LogEI + SLSQP, n_doe=20; the
reference runs 480 iterations — this demo uses a short budget)."""

import numpy as np

import egobox_tpu as egx


def ackley(x: np.ndarray) -> np.ndarray:
    x = np.atleast_2d(x)
    d = x.shape[1]
    s1 = np.sqrt(np.sum(x**2, axis=1) / d)
    s2 = np.sum(np.cos(2.0 * np.pi * x), axis=1) / d
    y = -20.0 * np.exp(-0.2 * s1) - np.exp(s2) + 20.0 + np.e
    return y.reshape(-1, 1)


if __name__ == "__main__":
    xlimits = [[-32.768, 32.768]] * 3
    egor = egx.Egor(
        xlimits,
        corr_spec=egx.CorrelationSpec.MATERN52,
        infill_strategy=egx.InfillStrategy.LOG_EI,
        infill_optimizer=egx.InfillOptimizer.SLSQP,
        n_doe=20,
        seed=42,
    )
    res = egor.minimize(ackley, max_iters=40)
    print(f"Ackley 3D optimum y = {res.y_opt[0]:.4f} at x = {res.x_opt}")
