"""Flagship example: 1-D Bayesian optimization of xsinx with Egor
(mirror of the egobox README example)."""

import numpy as np

import egobox_tpu as egx


def xsinx(x: np.ndarray) -> np.ndarray:
    x = np.atleast_2d(x)
    return ((x - 3.5) * np.sin((x - 3.5) / np.pi)).reshape(-1, 1)


if __name__ == "__main__":
    egor = egx.Egor([[0.0, 25.0]], seed=42)
    res = egor.minimize(xsinx, max_iters=20)
    print(f"optimum y = {res.y_opt[0]:.4f} at x = {res.x_opt[0]:.4f}")
