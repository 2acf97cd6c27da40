"""Mixed-integer Bayesian optimization (FLOAT + ENUM + ORD variables)."""

import numpy as np

import egobox_tpu as egx


def mixobj(X):
    x1, c1, c2, i = X[:, 0], X[:, 1], X[:, 2], X[:, 3]
    coef = (c1 == 0) + 2 * (c1 == 1) + 3 * (c1 == 2)
    y = coef * (c2 == 0) * x1 + coef * (c2 == 1) * 0.95 * x1 + i
    return y.reshape(-1, 1)


if __name__ == "__main__":
    xtypes = [
        egx.XSpec(egx.XType.FLOAT, [-5.0, 5.0]),
        egx.XSpec(egx.XType.ENUM, tags=["blue", "red", "green"]),
        egx.XSpec(egx.XType.ENUM, xlimits=[2]),
        egx.XSpec(egx.XType.ORD, [0, 2, 3]),
    ]
    egor = egx.Egor(xtypes, seed=42)
    res = egor.minimize(mixobj, max_iters=20)
    print(f"optimum y = {res.y_opt[0]:.4f} at {res.x_opt}")
