"""Stage-2 ablation for the constrained traced-run gap.

prof_infill_budget.py showed the AL multistart budget (160 -> 40 iters)
does NOT move G24/UTB traced throughput (10.9 -> 10.4 it/s, flat) — the
constrained infill optimization is cheap. The remaining suspects for the
B->C cliff (37 -> 10.3 it/s, prof_g24_traced.py) are the in-scan m=3
vmapped GP MLE (GpConfig defaults: 10 starts x 50 L-BFGS iters, each
iteration = 8-wide batched likelihood + one gradient w/ in-program
Cholesky) and the fixed per-step machinery. Variants:

  D0      G24/UTB shipped            — the 10.7 it/s baseline
  D_qo2   + q_optmod=2               — MLE skipped every other step
  D_qo4   + q_optmod=4               — MLE skipped 3 of 4 steps
  D_fit20 + GpConfig(max_eval=20)    — fit depth 50 -> 20
  D_ns4   + GpConfig(n_start=4)      — fit width 10 -> 4 (depth same)
  B_qo4   smooth-2d m=1 q_optmod=4   — unconstrained fit share

If fits dominate, D_qo4 jumps toward B-level; if D_ns4 moves but
D_fit20 doesn't, the fit is width(MXU)-bound not depth-bound (unlikely
at these tiny shapes).

Same-session protocol: warm-compile run (seed 42), median-of-3
fresh-seed 20-iter runs, quality recorded vs G24 f* = -5.5080.
"""
import json
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from egobox_tpu import ConstraintStrategy, Egor, GpConfig

MAX_ITERS = 20
G24_STAR = -5.5080
BOX2 = [[0.0, 3.0], [0.0, 4.0]]


def g24(x):
    x = jnp.atleast_2d(x)
    f = -x[:, 0] - x[:, 1]
    g1 = (-2.0 * x[:, 0] ** 4 + 8.0 * x[:, 0] ** 3
          - 8.0 * x[:, 0] ** 2 + x[:, 1] - 2.0)
    g2 = (-4.0 * x[:, 0] ** 4 + 32.0 * x[:, 0] ** 3
          - 88.0 * x[:, 0] ** 2 + 96.0 * x[:, 0] + x[:, 1] - 36.0)
    return jnp.stack([f, g1, g2], axis=1)


def smooth2d(x):
    x = jnp.atleast_2d(x)
    f = -x[:, 0] - x[:, 1] + 0.1 * jnp.sin(3.0 * x[:, 0]) * jnp.sin(
        3.0 * x[:, 1])
    return f[:, None]


def make(name, seed):
    g24_kw = dict(
        n_cstr=2, cstr_strategy=ConstraintStrategy.UTB,
        cstr_tol=np.array([2e-6, 2e-6]), seed=seed, n_doe=5,
        traced_run=True,
    )
    if name == "D0":
        return Egor(BOX2, **g24_kw), g24
    if name == "D_qo2":
        return Egor(BOX2, q_optmod=2, **g24_kw), g24
    if name == "D_qo4":
        return Egor(BOX2, q_optmod=4, **g24_kw), g24
    if name == "D_fit20":
        return Egor(BOX2, gp_config=GpConfig(max_eval=20), **g24_kw), g24
    if name == "D_ns4":
        return Egor(BOX2, gp_config=GpConfig(n_start=4), **g24_kw), g24
    if name == "B_qo4":
        return (Egor(BOX2, seed=seed, n_doe=5, q_optmod=4,
                     traced_run=True), smooth2d)
    raise ValueError(name)


def main():
    out = {}
    names = ("D0", "D_qo2", "D_qo4", "D_fit20", "D_ns4", "B_qo4")
    for name in names:
        egor, fobj = make(name, 42)
        t0 = time.perf_counter()
        egor.minimize(fobj, max_iters=MAX_ITERS)
        compile_s = time.perf_counter() - t0
        ips, yopts = [], []
        for seed in (7, 11, 23):
            egor, fobj = make(name, seed)
            t0 = time.perf_counter()
            res = egor.minimize(fobj, max_iters=MAX_ITERS)
            ips.append(MAX_ITERS / (time.perf_counter() - t0))
            yopts.append(float(res.y_opt[0]))
        med = sorted(ips)[1]
        worst = (max(100.0 * (y - G24_STAR) / abs(G24_STAR)
                     for y in yopts) if fobj is g24 else float("nan"))
        out[name] = round(med, 2)
        print(f"{name}: median {med:.2f} it/s  worst-deficit "
              f"{worst:.3f}%  yopts={[round(y, 4) for y in yopts]}  "
              f"first(compile+run)={compile_s:.1f}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
