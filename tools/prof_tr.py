"""Real-TPU A/B: trust-region polish vs Armijo line-search polish on the
headline n=10k fit (ROADMAP perf item 2).

Measured context (tools/prof_r3b.py, same-session clean numbers):
polish_iters=0 runs 0.19 s, the shipped pi=2 line-search recipe 0.66-0.86 s
-> the polish phase is ~0.5 s for 2 L-BFGS iterations whose gradients are
~10 ms stochastic-trace evaluations, i.e. ~3 full 62 ms forwards per
iteration go to Armijo trials. The TR solver (optim/lbfgsb.minimize_tr)
pays exactly ONE forward per iteration, so pi=2 should land ~0.35-0.45 s.

Every variant reports the per-seed QUALITY DELTA vs the direct-fit goldens
(bench.py GOLDEN_DIRECT_LKH) — the gate is 2.6%, shipped worst is 2.44%,
so a recipe change must hold the same deltas to be adopted.

Run CONTENTION-FREE (no concurrent pytest on this 1-CPU host; CLAUDE.md):
    timeout 5400 python tools/prof_tr.py
"""

import sys
import time

import numpy as np  # noqa: F401

sys.path.insert(0, ".")

import os  # noqa: E402

os.environ.setdefault("EGOBOX_TPU_NO_X64", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import GOLDEN_DIRECT_LKH, _make_data  # noqa: E402
from egobox_tpu.gp.fit import fit_gp  # noqa: E402

N, D = 10_000, 10
DT = jnp.float32


def fit_seeded(seed, **kw):
    x, y = _make_data(jnp, jax, seed, N, D, DT)
    float(x[0, 0])
    t0 = time.perf_counter()
    m = fit_gp(x, y, n_start=1, max_iters=4, nugget=1e-3,
               subsample_warmstart=2000, grad_probes=64, **kw)
    lkh = float(m.likelihood)
    return time.perf_counter() - t0, lkh


def run(name, **kw):
    print(f"== {name} ==", flush=True)
    times, deltas = [], []
    for i, seed in enumerate((0, 1, 2, 3)):
        t, lkh = fit_seeded(seed, **kw)
        if i == 0:
            print(f"  compile+first {t:6.2f}s", flush=True)
            continue
        times.append(t)
        gold = GOLDEN_DIRECT_LKH[seed]
        deltas.append(100.0 * (gold - lkh) / abs(gold))
    print(f"  best={min(times):.3f}s times={['%.3f' % t for t in times]} "
          f"deltas={['%.2f%%' % d for d in deltas]}", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    run("ls_pi2 (shipped)", polish_iters=2, polish_residual=True)
    run("tr_pi2", polish_iters=2, polish_tr=True)
    run("tr_pi3", polish_iters=3, polish_tr=True)
    run("tr_pi4", polish_iters=4, polish_tr=True)
    run("ls_pi1", polish_iters=1, polish_residual=True)
