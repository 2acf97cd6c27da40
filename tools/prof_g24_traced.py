"""Ablation ladder for the constrained traced-run gap (VERDICT r4 item 4).

Round-4 recorded: traced xsinx 50.38 it/s vs traced G24 11.63 it/s — a
4.3x gap with no breakdown. The traced run is ONE XLA program per chunk
(ego/fused_run.py), so host-side stage timers can't see inside it; the
honest protocol is an ablation ladder of config variants timed in the
SAME session (the axon tunnel roundtrip varies across sessions,
CLAUDE.md):

  A  xsinx 1-D, m=1, n_cstr=0          — the round-4 50-it/s baseline
  B  2-D smooth objective, m=1, n_cstr=0, G24 box — isolates nx=1->2
  C  G24, m=3, n_cstr=2, MC            — + 2 vmapped constraint fits
                                          + constrained infill (mean)
  D  G24, m=3, n_cstr=2, UTB (shipped) — + UTB sigma terms in infill

(C-B) is the cost of carrying 3 outputs + the penalized multistart;
(D-C) is the UTB increment. Round-5's obj_and_viol refactor (ONE
surrogate_valvar_single call per penalized evaluation instead of two,
optim/optimize_infill) targeted the (C-B) component.

Protocol matches bench.py: warm-compile one run, then median-of-3
fresh-seed runs of 20 iterations, clock stopped by Egor.minimize's own
host fetch of the result rows.
"""
import json
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from egobox_tpu import ConstraintStrategy, Egor

MAX_ITERS = 20


def xsinx_traced(x):
    return ((x - 3.5) * jnp.sin((x - 3.5) / jnp.pi)).reshape(-1, 1)


def smooth2d_traced(x):
    x = jnp.atleast_2d(x)
    f = -x[:, 0] - x[:, 1] + 0.1 * jnp.sin(3.0 * x[:, 0]) * jnp.sin(
        3.0 * x[:, 1])
    return f[:, None]


def g24_traced(x):
    x = jnp.atleast_2d(x)
    f = -x[:, 0] - x[:, 1]
    g1 = (-2.0 * x[:, 0] ** 4 + 8.0 * x[:, 0] ** 3
          - 8.0 * x[:, 0] ** 2 + x[:, 1] - 2.0)
    g2 = (-4.0 * x[:, 0] ** 4 + 32.0 * x[:, 0] ** 3
          - 88.0 * x[:, 0] ** 2 + 96.0 * x[:, 0] + x[:, 1] - 36.0)
    return jnp.stack([f, g1, g2], axis=1)


BOX2 = [[0.0, 3.0], [0.0, 4.0]]


def make_variant(name, seed):
    if name == "A_xsinx_1d":
        return Egor([[0.0, 25.0]], seed=seed, traced_run=True), xsinx_traced
    if name == "B_smooth_2d":
        return (Egor(BOX2, seed=seed, n_doe=5, traced_run=True),
                smooth2d_traced)
    if name == "C_g24_mc":
        return (Egor(BOX2, n_cstr=2, cstr_strategy=ConstraintStrategy.MC,
                     cstr_tol=np.array([2e-6, 2e-6]), seed=seed, n_doe=5,
                     traced_run=True), g24_traced)
    if name == "D_g24_utb":
        return (Egor(BOX2, n_cstr=2, cstr_strategy=ConstraintStrategy.UTB,
                     cstr_tol=np.array([2e-6, 2e-6]), seed=seed, n_doe=5,
                     traced_run=True), g24_traced)
    raise ValueError(name)


def time_variant(name):
    egor, fobj = make_variant(name, 42)
    t0 = time.perf_counter()
    egor.minimize(fobj, max_iters=MAX_ITERS)  # compile + warm run
    compile_s = time.perf_counter() - t0
    ips = []
    for seed in (7, 11, 23):
        egor, fobj = make_variant(name, seed)
        t0 = time.perf_counter()
        egor.minimize(fobj, max_iters=MAX_ITERS)
        ips.append(MAX_ITERS / (time.perf_counter() - t0))
    return float(np.median(ips)), compile_s, ips


def main():
    out = {}
    for name in ("A_xsinx_1d", "B_smooth_2d", "C_g24_mc", "D_g24_utb"):
        med, compile_s, ips = time_variant(name)
        out[name] = round(med, 2)
        print(f"{name}: median {med:.2f} it/s  runs="
              f"{['%.2f' % v for v in ips]}  first(compile+run)="
              f"{compile_s:.1f}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
