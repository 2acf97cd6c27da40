"""Shared harness for the multi-fidelity n=10k fit A/Bs (prof_mf/prof_r3c).

Times seeds 1-3 (seed 0 is the compile run) and reports best wall time +
per-seed likelihood deficits vs the bench goldens."""

import sys
import time

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
