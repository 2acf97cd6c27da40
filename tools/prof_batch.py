"""EgorBatch throughput on TPU: B problems in lockstep vs one at a time."""
import time

import numpy as np

from egobox_tpu import EgorBatch
from egobox_tpu.ego.config import GpConfig


def make_problem(center):
    def sphere(x):
        x = np.atleast_2d(x)
        return np.sum((x - center) ** 2, axis=1, keepdims=True)

    return sphere


def run(n_problems, max_iters=15):
    probs = [make_problem(3.0 + 2.0 * b) for b in range(n_problems)]
    eb = EgorBatch(probs, [[0.0, 25.0]], seed=42, n_start=8,
                   gp_config=GpConfig(n_start=4, max_eval=25))
    t0 = time.perf_counter()
    res = eb.minimize(max_iters=max_iters)
    first = time.perf_counter() - t0
    eb2 = EgorBatch(probs, [[0.0, 25.0]], seed=7, n_start=8,
                    gp_config=GpConfig(n_start=4, max_eval=25))
    t0 = time.perf_counter()
    res = eb2.minimize(max_iters=max_iters)
    warm = time.perf_counter() - t0
    errs = [abs(float(r.x_opt[0]) - (3.0 + 2.0 * b))
            for b, r in enumerate(res)]
    print(f"B={n_problems}: first={first:.1f}s warm={warm:.2f}s "
          f"({max_iters/warm:.2f} its/s, "
          f"{n_problems*max_iters/warm:.1f} problem-iters/s) "
          f"max|x_opt-c|={max(errs):.3f}")


if __name__ == "__main__":
    run(1)
    run(8)
