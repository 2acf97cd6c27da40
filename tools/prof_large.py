"""Real-TPU large-n single-chip GP fit: n=20k and n=30k, d=10, f32.

Beyond the n=10k headline (BASELINE.json), this measures how far ONE v5e
chip carries the dense MLE fit. Memory at n=30k: R + L are 3.6 GB each,
the stochastic-trace gradient (gp/likelihood.py _sqexp_dphi_stoch) never
forms R^-1, so peak live is a handful of (n, n) f32 buffers — inside the
16 GB HBM. The reference (LAPACK potrf per COBYLA probe, single host)
is O(hours) at this size (crates/gp/src/algorithm.rs:879-948).

Recipe mirrors bench.py (multi-draw subsample warm start + trust-region
polish); quality is reported against a direct single-start fit at the
same n (computed here once — slow, compile-heavy).

Run contention-free:  timeout 7200 python tools/prof_large.py
"""

import sys
import time

sys.path.insert(0, ".")

import os  # noqa: E402

os.environ.setdefault("EGOBOX_TPU_NO_X64", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _make_data  # noqa: E402
from egobox_tpu.gp.fit import fit_gp  # noqa: E402

D = 10
DT = jnp.float32


def fit_seeded(n, seed, **kw):
    x, y = _make_data(jnp, jax, seed, n, D, DT)
    float(x[0, 0])
    t0 = time.perf_counter()
    m = fit_gp(x, y, nugget=1e-3, **kw)
    lkh = float(m.likelihood)
    return time.perf_counter() - t0, lkh


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    mf = dict(n_start=1, max_iters=4, subsample_warmstart=2000,
              sub_draws=3, polish_iters=2, grad_probes=64, polish_tr=True)
    for n in (20_000, 30_000):
        print(f"== n={n} ==", flush=True)
        ts, lk = [], None
        for i, seed in enumerate((0, 1, 2)):
            t, lkh = fit_seeded(n, seed, **mf)
            tag = "compile+first" if i == 0 else "run"
            print(f"  {tag} seed={seed} {t:7.2f}s lkh={lkh:.1f}",
                  flush=True)
            if i:
                ts.append(t)
                lk = lkh
        print(f"  mf best={min(ts):.3f}s", flush=True)
        # direct-fit quality anchor (seed 2): single start, 12 iters
        t, gold = fit_seeded(n, 2, n_start=1, max_iters=12,
                             grad_probes=64, polish_tr=False)
        delta = 100.0 * (gold - lk) / abs(gold)
        print(f"  direct seed=2 {t:7.2f}s lkh={gold:.1f} "
              f"mf delta={delta:.2f}%", flush=True)

    # memory-ceiling probe: forward-only likelihood at n=40k/50k. The
    # stochastic-trace gradient never materializes R^-1, so the live set is
    # a couple of (n, n) f32 buffers — 6.4 GB at 40k, 10 GB at 50k vs
    # 16 GB HBM. Reports OOM cleanly if XLA cannot reuse the Gram buffer.
    from egobox_tpu.gp.likelihood import reduced_likelihood

    for n in (40_000, 50_000):
        try:
            x, y = _make_data(jnp, jax, 0, n, D, DT)
            xm = (x - x.mean(0)) / x.std(0)
            ym = ((y - y.mean()) / y.std())[:, None]
            f = jax.jit(lambda xm, ym: reduced_likelihood(
                "squared_exponential", "constant", xm, ym,
                jnp.ones((), DT), jnp.full((D,), 0.3, DT), None, 1e-3,
            )[0])
            t0 = time.perf_counter()
            v = float(f(xm, ym))
            t_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            v = float(f(xm, ym))
            print(f"n={n} forward {time.perf_counter() - t0:.3f}s "
                  f"(first {t_first:.1f}s) rlf={v:.1f}", flush=True)
        except Exception as e:  # noqa: BLE001 — OOM probe
            print(f"n={n} forward FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
