"""Headline benchmark: GP (kriging) MLE fit wall-time at n=10k, d=10 on one
TPU chip, plus Egor steady-state throughput — with a QUALITY GATE.

North star (BASELINE.json): GP fit at n=10k in < 1 s on one v5e. The
reference's hot loop is the (n(n-1)/2, nx) kernel construction + n x n
Cholesky per likelihood evaluation inside a COBYLA multistart
(crates/gp/src/algorithm.rs:879-948, 988-1056) — at n=10k that is minutes
per restart on CPU. Here one full MLE fit (L-BFGS on the exact concentrated
likelihood with its analytic O(n^3) adjoint) runs as one compiled XLA
program on the MXU.

Fit config: multi-fidelity MLE — 2 independent 2k-subsample multistarts
(one vmapped program), then a vmapped 2-lane 1-iteration trust-region
polish on the full 10k data keeps the best final likelihood; f32,
nugget 1e-3 (f32-scale regularization at n=10k). The final model is the
exact full-data GP at the polished theta. The trust-region polish costs
ONE forward per iteration (vs ~3 line-search trials) with the 64-probe
stochastic-trace gradient (gp/likelihood.py _sqexp_dphi_stoch); the
multi-draw selection erases the subsample basin lottery. Measured on
v5e 2026-08-18 in ONE session (tools/prof_r3c.py): 3x2k-draw pi2
(round-3 shipped) 0.629 s / worst delta 0.49%, 2x2k pi2 0.449 s /
1.03%, 3x2k pi1 0.503 s / 0.49%, 2x2k pi1 0.355 s / 1.03% — polish
iterations past the first never move the deltas (basin-limited), so the
shipped recipe is 2x2k pi1.

QUALITY GATE (VERDICT r2 item 3): the direct full-data fit likelihoods for
seeds 1-3 were computed once on v5e (n_start=1, max_iters=12 — see
GOLDEN_DIRECT_LKH) and every bench run asserts the multi-fidelity result is
within QUALITY_TOL_PCT of them. A perf tweak that silently regresses fit
quality now fails the bench loudly (precedent: the G24 matmul-precision
collapse, CLAUDE.md). The max deficit is emitted in the JSON line.

Egor throughput (VERDICT r2 item 4): steady-state iters/s for the fused
single-program iteration on xsinx (unconstrained) and G24 (2 surrogate
constraints, UTB), measured on a warm-compiled second run with a different
seed. The axon tunnel roundtrip varies by session (CLAUDE.md) — these are
recorded for round-over-round comparability, the primary metric stays the
GP fit.

Timing is steady-state (post-compile) with fresh data and a forced host
sync — the axon platform dispatches asynchronously, so we pull a scalar
result to stop the clock honestly.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"quality_delta_pct", "egor_xsinx_iters_per_s", "egor_g24_iters_per_s",
"egor_xsinx_traced_iters_per_s" (whole-run fused mode, ego/fused_run.py)}.
vs_baseline = baseline_seconds / measured_seconds (>1 beats the 1 s
target). Exits non-zero if the quality gate fails.
"""

import json
import os
import sys
import time

import numpy as np

#: direct full-data fit likelihoods (n_start=1, max_iters=12, nugget=1e-3,
#: f32) measured on v5e 2026-08-17; the multi-fidelity fit must stay within
#: QUALITY_TOL_PCT of these
GOLDEN_DIRECT_LKH = {1: 12311.2139, 2: 12226.0566, 3: 12379.1699}
#: measured worst-seed deficit of the shipped 2-draw pi1 recipe is 1.03%
#: (tools/prof_r3c.py, v5e 2026-08-18). The gate catches REGRESSIONS from
#: that calibrated point: a fall back to a single subsample draw costs
#: 2.7% on seed 3, the historical matmul-precision collapse cost >10%.
QUALITY_TOL_PCT = 1.5


def _make_data(jnp, jax, seed, n, d, dtype):
    kx, _ = jax.random.split(jax.random.key(seed))
    x = jax.random.uniform(kx, (n, d), dtype=dtype, minval=-600, maxval=600)
    y = (
        jnp.sum(x**2 / 4000.0, axis=1)
        - jnp.prod(
            jnp.cos(x / jnp.sqrt(jnp.arange(1, d + 1, dtype=dtype))), axis=1
        )
        + 1.0
    )
    return x, y


def _xsinx(x):
    x = np.atleast_2d(x)
    return ((x - 3.5) * np.sin((x - 3.5) / np.pi)).reshape(-1, 1)


def _g24(x):
    x = np.atleast_2d(x)
    f = -x[:, 0] - x[:, 1]
    g1 = (-2.0 * x[:, 0] ** 4 + 8.0 * x[:, 0] ** 3 - 8.0 * x[:, 0] ** 2
          + x[:, 1] - 2.0)
    g2 = (-4.0 * x[:, 0] ** 4 + 32.0 * x[:, 0] ** 3 - 88.0 * x[:, 0] ** 2
          + 96.0 * x[:, 0] + x[:, 1] - 36.0)
    return np.stack([f, g1, g2], axis=1)


def _egor_throughput(constrained: bool, max_iters: int = 20):
    """Warm-compile with one run, then time a fresh-seed run."""
    from egobox_tpu import ConstraintStrategy, Egor

    def make(seed):
        if constrained:
            return Egor(
                [[0.0, 3.0], [0.0, 4.0]], n_cstr=2,
                cstr_strategy=ConstraintStrategy.UTB,
                cstr_tol=np.array([2e-6, 2e-6]), seed=seed, n_doe=5,
            )
        return Egor([[0.0, 25.0]], seed=seed)

    fobj = _g24 if constrained else _xsinx
    make(42).minimize(fobj, max_iters=max_iters)  # compile all buckets
    t0 = time.perf_counter()
    make(7).minimize(fobj, max_iters=max_iters)
    return max_iters / (time.perf_counter() - t0)


def _egor_traced_throughput(max_iters: int = 20):
    """Whole-run fused mode (ego/fused_run.py): the jax-traceable xsinx
    runs in chunks of iterations per dispatch, so the tunnel roundtrip is
    paid per CHUNK, not per iteration."""
    import jax.numpy as jnp

    from egobox_tpu import Egor

    def xsinx_traced(x):
        return ((x - 3.5) * jnp.sin((x - 3.5) / jnp.pi)).reshape(-1, 1)

    def make(seed):
        return Egor([[0.0, 25.0]], seed=seed, traced_run=True)

    make(42).minimize(xsinx_traced, max_iters=max_iters)  # compile
    t0 = time.perf_counter()
    make(7).minimize(xsinx_traced, max_iters=max_iters)
    return max_iters / (time.perf_counter() - t0)


def main():
    # TPU-native dtype is f32; keep x64 off for the bench path.
    os.environ.setdefault("EGOBOX_TPU_NO_X64", "1")
    import jax
    import jax.numpy as jnp

    import egobox_tpu.gp as gp

    n, d = 10_000, 10
    dtype = jnp.float32

    def fit(seed):
        x, y = _make_data(jnp, jax, seed, n, d, dtype)
        _ = float(x[0, 0])  # force data on device before the clock starts
        t0 = time.perf_counter()
        m = gp.fit_gp(x, y, n_start=1, max_iters=4, nugget=1e-3,
                      subsample_warmstart=2000, sub_draws=2,
                      polish_iters=1, grad_probes=64, polish_tr=True)
        lkh = float(m.likelihood)  # host sync = honest stop
        return time.perf_counter() - t0, lkh

    t0 = time.perf_counter()
    fit(0)  # compile + run
    compile_s = time.perf_counter() - t0

    times, deltas = [], []
    for seed in (1, 2, 3):
        t, lkh = fit(seed)
        times.append(t)
        gold = GOLDEN_DIRECT_LKH[seed]
        deltas.append(100.0 * (gold - lkh) / abs(gold))
    best = min(times)
    worst_delta = max(deltas)

    xsinx_ips = _egor_throughput(constrained=False)
    g24_ips = _egor_throughput(constrained=True)
    traced_ips = _egor_traced_throughput()

    baseline_s = 1.0  # north-star target: n=10k fit < 1 s on one v5e
    result = {
        "metric": "gp_fit_n10k_d10_wall_time",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(baseline_s / best, 3),
        "quality_delta_pct": round(worst_delta, 3),
        "egor_xsinx_iters_per_s": round(xsinx_ips, 2),
        "egor_g24_iters_per_s": round(g24_ips, 2),
        "egor_xsinx_traced_iters_per_s": round(traced_ips, 2),
    }
    print(json.dumps(result))
    print(
        f"# compile+first={compile_s:.1f}s runs={['%.3f' % t for t in times]}"
        f" deltas={['%.2f%%' % v for v in deltas]}"
        f" backend={jax.default_backend()}",
        file=sys.stderr,
    )
    if worst_delta > QUALITY_TOL_PCT:
        print(
            f"# QUALITY GATE FAILED: multi-fidelity fit is "
            f"{worst_delta:.2f}% below the direct-fit likelihood "
            f"(tolerance {QUALITY_TOL_PCT}%)",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
