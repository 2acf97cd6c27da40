"""Measure the clustered/MoE Egor path on the real TPU (VERDICT r3 weak
#3: "the clustered path has no TPU performance story at all").

Times steady-state iters/s for a 2-cluster smooth-recombination Egor run
on a 1-d piecewise objective (discontinuity at x=10 — the clustering has
something real to find), before and after any fused-MoE work, plus the
single-cluster baseline on the same problem for the dispatch-overhead
delta.

Usage: python tools/prof_moe_egor.py  (TPU)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def piecewise(x):
    """Discontinuous objective (reference moe test family: a step between
    two smooth branches)."""
    x = np.atleast_2d(x)
    left = ((x - 3.5) * np.sin((x - 3.5) / np.pi))
    right = 0.5 * (x - 18.0) ** 2 - 15.0
    return np.where(x < 10.0, left, right).reshape(-1, 1)


def main():
    from egobox_tpu import Egor

    out = {}
    for label, kw in (
        ("moe2_smooth", dict(n_clusters=2)),
        ("single", dict()),
    ):
        def make(seed):
            return Egor([[0.0, 25.0]], seed=seed, n_doe=10, **kw)

        t0 = time.perf_counter()
        make(42).minimize(piecewise, max_iters=15)  # compile
        compile_s = time.perf_counter() - t0
        ips = []
        for seed in (7, 11, 23):
            t0 = time.perf_counter()
            res = make(seed).minimize(piecewise, max_iters=15)
            ips.append(15.0 / (time.perf_counter() - t0))
        out[label] = {
            "iters_per_s_median": round(float(np.median(ips)), 3),
            "runs": [round(v, 3) for v in ips],
            "compile_s": round(compile_s, 1),
            "y_opt": float(res.y_opt[0]),
        }
        print(f"{label}: {out[label]}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
