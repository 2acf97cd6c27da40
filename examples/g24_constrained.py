"""Constrained optimization: the G24 problem with two metamodelized
constraints and the upper-trust-bound strategy."""

import numpy as np

import egobox_tpu as egx


def g24(point):
    p = np.atleast_2d(point)
    obj = -p[:, 0] - p[:, 1]
    c1 = (-2 * p[:, 0] ** 4 + 8 * p[:, 0] ** 3 - 8 * p[:, 0] ** 2
          + p[:, 1] - 2)
    c2 = (-4 * p[:, 0] ** 4 + 32 * p[:, 0] ** 3 - 88 * p[:, 0] ** 2
          + 96 * p[:, 0] + p[:, 1] - 36)
    return np.stack([obj, c1, c2], axis=1)


if __name__ == "__main__":
    egor = egx.Egor(
        [[0.0, 3.0], [0.0, 4.0]],
        n_cstr=2,
        cstr_tol=np.array([1e-3, 1e-3]),
        cstr_strategy=egx.ConstraintStrategy.UTB,
        seed=42,
        n_doe=5,
    )
    res = egor.minimize(g24, max_iters=30)
    print(f"optimum y = {res.y_opt[0]:.4f} at {res.x_opt}")
