"""Constrained-infill budget ladder (VERDICT r4 item 4, second half).

prof_g24_traced.py located the constrained traced-run cliff at B->C
(37.0 -> 10.3 it/s): carrying 3 outputs + the constrained multistart.
Structurally the AL path runs n_outer=4 x inner_iters=40 = 160 L-BFGS
iterations per start vs the unconstrained path's 80 — a built-in 2x in
sequential program depth. This ladder measures whether G24-class
problems actually need that budget: each (inner, outer) variant runs in
a FRESH subprocess (the budget is bound at import via
EGOBOX_INFILL_ITERS/EGOBOX_INFILL_OUTER; programs compiled earlier in a
process keep their traced budget), timing traced G24/UTB and recording
the achieved optimum (golden f* = -5.5080) per seed.

Protocol: warm-compile one run (seed 42), then 3 fresh-seed timed runs
of 20 iterations each; same-session comparisons only (tunnel latency
varies across sessions, CLAUDE.md).
"""
import json
import os
import subprocess
import sys
import time

BUDGETS = [(40, 4), (30, 3), (20, 3), (16, 2)]
G24_STAR = -5.5080
MAX_ITERS = 20

CHILD = r"""
import json, sys, time
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, ".")
from egobox_tpu import ConstraintStrategy, Egor

def g24(x):
    x = jnp.atleast_2d(x)
    f = -x[:, 0] - x[:, 1]
    g1 = (-2.0 * x[:, 0] ** 4 + 8.0 * x[:, 0] ** 3
          - 8.0 * x[:, 0] ** 2 + x[:, 1] - 2.0)
    g2 = (-4.0 * x[:, 0] ** 4 + 32.0 * x[:, 0] ** 3
          - 88.0 * x[:, 0] ** 2 + 96.0 * x[:, 0] + x[:, 1] - 36.0)
    return jnp.stack([f, g1, g2], axis=1)

def make(seed):
    return Egor([[0.0, 3.0], [0.0, 4.0]], n_cstr=2,
                cstr_strategy=ConstraintStrategy.UTB,
                cstr_tol=np.array([2e-6, 2e-6]), seed=seed, n_doe=5,
                traced_run=True)

MAX_ITERS = %d
t0 = time.perf_counter()
make(42).minimize(g24, max_iters=MAX_ITERS)
compile_s = time.perf_counter() - t0
ips, yopts = [], []
for seed in (7, 11, 23):
    egor = make(seed)
    t0 = time.perf_counter()
    res = egor.minimize(g24, max_iters=MAX_ITERS)
    ips.append(MAX_ITERS / (time.perf_counter() - t0))
    yopts.append(float(res.y_opt[0]))
print("CHILD_RESULT " + json.dumps(
    {"ips": ips, "yopts": yopts, "compile_s": compile_s}))
""" % MAX_ITERS


def main():
    out = {}
    for inner, outer in BUDGETS:
        env = dict(os.environ)
        env["EGOBOX_INFILL_ITERS"] = str(inner)
        env["EGOBOX_INFILL_OUTER"] = str(outer)
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "-c", CHILD], env=env, cwd="/root/repo",
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines()
                if l.startswith("CHILD_RESULT ")]
        if not line:
            print(f"({inner},{outer}): FAILED\n{proc.stdout[-800:]}"
                  f"\n{proc.stderr[-800:]}", flush=True)
            continue
        r = json.loads(line[0][len("CHILD_RESULT "):])
        med_ips = sorted(r["ips"])[1]
        worst = max(100.0 * (y - G24_STAR) / abs(G24_STAR)
                    for y in r["yopts"])
        out[f"{inner}x{outer}"] = {
            "iters_per_s": round(med_ips, 2),
            "worst_yopt_deficit_pct": round(worst, 3),
            "yopts": [round(y, 4) for y in r["yopts"]],
            "compile_s": round(r["compile_s"], 1),
        }
        print(f"({inner},{outer}): {med_ips:.2f} it/s  worst-deficit "
              f"{worst:.3f}%  yopts={r['yopts']}  "
              f"wall={time.perf_counter() - t0:.0f}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
