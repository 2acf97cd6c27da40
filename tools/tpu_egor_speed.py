"""Egor steady-state throughput on the real TPU: fused vs unfused."""
import os
import sys
import time

import numpy as np


def xsinx(x):
    x = np.atleast_2d(x)
    return ((x - 3.5) * np.sin((x - 3.5) / np.pi)).reshape(-1, 1)


def run(label, max_iters=30, **env):
    for k, v in env.items():
        os.environ[k] = v
    from egobox_tpu import Egor

    egor = Egor([[0.0, 25.0]], seed=42)
    t0 = time.perf_counter()
    res = egor.minimize(xsinx, max_iters=max_iters)
    wall = time.perf_counter() - t0
    # second run: everything compiled (buckets seen), fresh state
    egor2 = Egor([[0.0, 25.0]], seed=7)
    t0 = time.perf_counter()
    res2 = egor2.minimize(xsinx, max_iters=max_iters)
    wall2 = time.perf_counter() - t0
    print(f"{label}: first={wall:.1f}s warm={wall2:.2f}s "
          f"({max_iters / wall2:.1f} iters/s) y_opt={res2.y_opt[0]:.4f}")
    for k in env:
        del os.environ[k]


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
    if mode == "fused":
        run("fused")
    else:
        run("unfused", EGOBOX_NO_FUSED_STEP="1")
