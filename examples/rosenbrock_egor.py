"""Rosenbrock 2-D (mirror of crates/ego/examples/rosenbrock.rs:
min f = 0 at (1, 1))."""

import numpy as np

import egobox_tpu as egx


def rosenbrock(x: np.ndarray) -> np.ndarray:
    x = np.atleast_2d(x)
    y = np.sum(
        100.0 * (x[:, 1:] - x[:, :-1] ** 2) ** 2 + (1.0 - x[:, :-1]) ** 2,
        axis=1,
    )
    return y.reshape(-1, 1)


if __name__ == "__main__":
    egor = egx.Egor(
        [[-2.0, 2.0], [-2.0, 2.0]],
        infill_strategy=egx.InfillStrategy.WB2,
        n_doe=10,
        seed=42,
    )
    res = egor.minimize(rosenbrock, max_iters=50)
    print(f"Rosenbrock optimum y = {res.y_opt[0]:.5f} at x = {res.x_opt}")
