"""Michalewicz 2-D (mirror of crates/ego/examples/michalewicz.rs:
min D=2 f = -1.8013 at (2.20, 1.57))."""

import numpy as np

import egobox_tpu as egx


def michalewicz(x: np.ndarray, m: float = 10.0) -> np.ndarray:
    x = np.atleast_2d(x)
    i = np.arange(1, x.shape[1] + 1)
    y = -np.sum(
        np.sin(x) * np.sin(i[None, :] * x**2 / np.pi) ** (2 * m), axis=1
    )
    return y.reshape(-1, 1)


if __name__ == "__main__":
    egor = egx.Egor(
        [[0.0, np.pi]] * 2,
        n_doe=10,
        seed=42,
    )
    res = egor.minimize(michalewicz, max_iters=40)
    print(f"Michalewicz 2D optimum y = {res.y_opt[0]:.4f} at x = {res.x_opt}")
