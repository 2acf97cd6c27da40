"""Portfolio-scale serving: B independent optimizations in lockstep.

EgorBatch vmaps the entire fused EGO iteration (surrogate training +
infill optimization) over a problem axis, so a batch of optimizations
costs ONE program dispatch per iteration — a TPU-native capability with no
reference counterpart (the reference runs one optimization per process).
"""

import numpy as np

import egobox_tpu as egx


def make_problem(center: float):
    def sphere(x):
        x = np.atleast_2d(x)
        return np.sum((x - center) ** 2, axis=1, keepdims=True)

    return sphere


if __name__ == "__main__":
    centers = [3.0, 7.0, 12.0, 18.0]
    problems = [make_problem(c) for c in centers]
    eb = egx.EgorBatch(problems, [[0.0, 25.0]], seed=42)
    results = eb.minimize(max_iters=15)
    for c, r in zip(centers, results):
        print(f"center {c:5.1f}: x_opt = {r.x_opt[0]:7.3f} "
              f"y_opt = {r.y_opt[0]:.4f}")
