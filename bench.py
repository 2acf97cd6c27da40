"""Headline benchmark: GP (kriging) MLE fit wall-time at n=10k, d=10 on one
TPU chip, plus Egor steady-state throughput — with a QUALITY GATE.

North star (BASELINE.json): GP fit at n=10k in < 1 s on one v5e. The
reference's hot loop is the (n(n-1)/2, nx) kernel construction + n x n
Cholesky per likelihood evaluation inside a COBYLA multistart
(crates/gp/src/algorithm.rs:879-948, 988-1056) — at n=10k that is minutes
per restart on CPU. Here one full MLE fit (L-BFGS on the exact concentrated
likelihood with its analytic O(n^3) adjoint) runs as one compiled XLA
program on the MXU.

Fit config: multi-fidelity MLE — 3 independent 2k-subsample multistarts
(one vmapped program), then a vmapped 3-lane 1-iteration trust-region
polish on the full 10k data keeps the best final likelihood; f32,
nugget 1e-3 (f32-scale regularization at n=10k). The final model is the
exact full-data GP at the polished theta. The trust-region polish costs
ONE forward per iteration (vs ~3 line-search trials) with the 64-probe
stochastic-trace gradient (gp/likelihood.py _sqexp_dphi_stoch); the
multi-draw selection erases the subsample basin lottery. Measured on
v5e 2026-08-18 in ONE session (tools/prof_r3c.py): 3x2k-draw pi2
(round-3 shipped) 0.629 s / worst delta 0.49%, 2x2k pi2 0.449 s /
1.03%, 3x2k pi1 0.503 s / 0.49%, 2x2k pi1 0.355 s / 1.03% — polish
iterations past the first never move the deltas (basin-limited). The
round-4 shipped recipe is 3x2k pi1: the 2-draw point's 1.03% worst
delta sat only 0.47pp under the old 1.5% gate (ADVICE r3), while 3
draws hold 0.49% against a 1.0% gate at ~0.5 s — still 2x the 1 s
north star.

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

#: CONVERGED direct full-data fit likelihoods (11-init multistart:
#: theta0=0.1 + 10 maximin-LHS seeds, max_iters=50 each, nugget=1e-3, f32;
#: tools/golden_r4.py, v5e 2026-08-19). The theta0=0.1 basin won on every
#: seed — the round-2 n_start=1 goldens were already converged (deltas
#: < 4e-5%), closing VERDICT r3 weak #2 ("the golden is itself weakly
#: converged"). The multi-fidelity fit must stay within QUALITY_TOL_PCT.
GOLDEN_DIRECT_LKH = {1: 12311.2178, 2: 12226.0645, 3: 12379.1768}
#: measured worst-seed deficit of the shipped 3-draw pi1 recipe is 0.49%
#: (tools/prof_r3c.py, v5e 2026-08-18; re-confirmed vs the converged
#: goldens 2026-08-19). The gate catches REGRESSIONS from that calibrated
#: point: a fall back to a single subsample draw costs 2.7% on seed 3,
#: the historical matmul-precision collapse cost >10%.
QUALITY_TOL_PCT = 1.0


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


#: timed Egor runs per metric — the median absorbs tunnel-roundtrip
#: weather (the same code measured 7.59 vs 6.79 G24 iters/s on the same
#: day; CLAUDE.md documents 1.1-4.4 iters/s day-to-day swings), VERDICT
#: r3 weak #8
EGOR_TIMED_RUNS = 3


def _median_ips(run, max_iters):
    """Median iters/s over EGOR_TIMED_RUNS fresh-seed runs (post-compile)."""
    ips = []
    for seed in (7, 11, 23)[:EGOR_TIMED_RUNS]:
        t0 = time.perf_counter()
        run(seed)
        ips.append(max_iters / (time.perf_counter() - t0))
    return float(np.median(ips))


#: SGP-at-scale quality floor: 4/4 runs (FITC/VFE x 2 seeds) measured
#: holdout Q2 in [0.9959, 0.9963] on 2026-08-19 (tools/prof_sgp50k.py,
#: v5e) with the dense-subsample theta warm start; the gate catches the
#: all-noise-basin collapse this recipe fixed (Q2 0.36 / -11.9 before)
SGP_Q2_MIN = 0.98


def _sgp_throughput(jax, jnp, n=50_000, m_ind=512, n_hold=2_000):
    """Warm FITC fit wall time at n=50k, M=512 (VERDICT r3 item 2: the
    designated big-n mechanism, previously never run above n=200) + a
    holdout-Q2 quality check. Seed 0 warms the compile; seed 1 is timed."""
    from egobox_tpu.gp.sgp import fit_sgp, sgp_predict

    def run(seed):
        x, y = _make_data(jnp, jax, seed, n + n_hold, 10, jnp.float32)
        # SGP does not normalize x (reference parity): scale the +-600
        # domain into the kernel's expressible length-scale range
        x = x / 600.0
        kn = jax.random.key(seed + 100)
        yn = y + 0.05 * jnp.std(y) * jax.random.normal(
            kn, y.shape, jnp.float32
        )
        xh, yh = x[n:], y[n:]
        x, yn = x[:n], yn[:n]
        _ = float(x[0, 0])
        t0 = time.perf_counter()
        # round-5 recipe (tools/prof_sgp_r5.py ladder, v5e 2026-08-19):
        # the shipped ns7/mi60 measured 17.5 s with lkh -122308; ns2/mi30
        # gives the SAME likelihood (-122248, marginally better) at
        # 9.3 s — lanes past 2 and iterations past 30 never moved the
        # optimum. The dense warm-start subfit is additionally budgeted
        # (3 starts x 20 iters x parallel line search, gp/sgp.py) — it
        # alone was 11.6 s at full defaults.
        mdl = fit_sgp(x, yn, n_inducing=m_ind, n_start=2, max_iters=30,
                      seed=seed, subsample_warmstart=2000)
        _ = float(mdl.likelihood)
        t_fit = time.perf_counter() - t0
        yp = np.asarray(sgp_predict(mdl, xh))
        yh = np.asarray(yh)
        q2 = 1.0 - float(
            np.sum((yh - yp) ** 2) / np.sum((yh - yh.mean()) ** 2)
        )
        return t_fit, q2

    run(0)  # compile
    return run(1)


def _piecewise(x):
    """Discontinuous objective for the clustered (MoE) path: two smooth
    branches with a step at x=10 (right-branch optimum -15 at x=18)."""
    x = np.atleast_2d(x)
    left = (x - 3.5) * np.sin((x - 3.5) / np.pi)
    right = 0.5 * (x - 18.0) ** 2 - 15.0
    return np.where(x < 10.0, left, right).reshape(-1, 1)


def _egor_moe_throughput(max_iters: int = 15):
    """Clustered-mixture Egor steady-state iters/s (fused MoE iteration,
    ego/fused_step.py fused_select_point_moe) — the reference runs its
    clustered mixtures inside the same measured loop as everything else
    (solver_impl.rs:121-296), so the clustered path must have a recorded
    number too (VERDICT r4 missing #1). Config matches
    tools/prof_moe_egor.py (first measured 2026-08-19: 1.22 iters/s vs
    2.29 single-cluster on the same problem/session — the clustered
    iteration costs ~1.9x single)."""
    from egobox_tpu import Egor

    def make(seed):
        return Egor([[0.0, 25.0]], seed=seed, n_doe=10, n_clusters=2)

    make(42).minimize(_piecewise, max_iters=max_iters)  # compile
    return _median_ips(
        lambda seed: make(seed).minimize(_piecewise, max_iters=max_iters),
        max_iters,
    )


def _egor_throughput(constrained: bool, max_iters: int = 20):
    """Warm-compile with one run, then median-of-3 fresh-seed runs."""
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
    return _median_ips(
        lambda seed: make(seed).minimize(fobj, max_iters=max_iters),
        max_iters,
    )


def _egor_traced_throughput(max_iters: int = 20, constrained: bool = False):
    """Whole-run fused mode (ego/fused_run.py): the jax-traceable
    objective runs in chunks of iterations per dispatch, so the tunnel
    roundtrip is paid per CHUNK, not per iteration. ``constrained=True``
    times G24 (2 traced surrogate constraints, UTB) — the traced-mode
    constrained number VERDICT r3 weak #5 asked for."""
    import jax.numpy as jnp

    from egobox_tpu import ConstraintStrategy, Egor

    def xsinx_traced(x):
        return ((x - 3.5) * jnp.sin((x - 3.5) / jnp.pi)).reshape(-1, 1)

    def g24_traced(x):
        x = jnp.atleast_2d(x)
        f = -x[:, 0] - x[:, 1]
        g1 = (-2.0 * x[:, 0] ** 4 + 8.0 * x[:, 0] ** 3
              - 8.0 * x[:, 0] ** 2 + x[:, 1] - 2.0)
        g2 = (-4.0 * x[:, 0] ** 4 + 32.0 * x[:, 0] ** 3
              - 88.0 * x[:, 0] ** 2 + 96.0 * x[:, 0] + x[:, 1] - 36.0)
        return jnp.stack([f, g1, g2], axis=1)

    def make(seed):
        if constrained:
            return Egor(
                [[0.0, 3.0], [0.0, 4.0]], n_cstr=2,
                cstr_strategy=ConstraintStrategy.UTB,
                cstr_tol=np.array([2e-6, 2e-6]), seed=seed, n_doe=5,
                traced_run=True,
            )
        return Egor([[0.0, 25.0]], seed=seed, traced_run=True)

    fobj = g24_traced if constrained else xsinx_traced
    make(42).minimize(fobj, max_iters=max_iters)  # compile
    return _median_ips(
        lambda seed: make(seed).minimize(fobj, max_iters=max_iters),
        max_iters,
    )


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
                      subsample_warmstart=2000, sub_draws=3,
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

    sgp_s, sgp_q2 = _sgp_throughput(jax, jnp)

    xsinx_ips = _egor_throughput(constrained=False)
    g24_ips = _egor_throughput(constrained=True)
    traced_ips = _egor_traced_throughput()
    g24_traced_ips = _egor_traced_throughput(constrained=True)
    moe2_ips = _egor_moe_throughput()

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
        "egor_g24_traced_iters_per_s": round(g24_traced_ips, 2),
        "egor_moe2_iters_per_s": round(moe2_ips, 2),
        "sgp_fit_n50k_m512_s": round(sgp_s, 3),
        "sgp_q2_holdout": round(sgp_q2, 4),
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
    if sgp_q2 < SGP_Q2_MIN:
        print(
            f"# SGP QUALITY GATE FAILED: holdout Q2 {sgp_q2:.4f} < "
            f"{SGP_Q2_MIN} (the all-noise basin collapse the subsample "
            f"warm start exists to prevent)",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
