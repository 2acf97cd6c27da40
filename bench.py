"""Headline benchmark: GP (kriging) MLE fit wall-time at n=10k, d=10 on one
TPU chip.

North star (BASELINE.json): GP fit at n=10k in < 1 s on one v5e. The
reference's hot loop is the (n(n-1)/2, nx) kernel construction + n x n
Cholesky per likelihood evaluation inside a COBYLA multistart
(crates/gp/src/algorithm.rs:879-948, 988-1056) — at n=10k that is minutes
per restart on CPU. Here one full MLE fit (L-BFGS on the exact concentrated
likelihood with its analytic O(n^3) adjoint) runs as one compiled XLA
program on the MXU.

Config: multi-fidelity MLE — multistart (1+1 restarts, 4 L-BFGS
iterations) on a 2k subsample, then 2 polish iterations on the full 10k
data; f32, nugget 1e-3 (f32-scale regularization at n=10k). The final model
is the exact full-data GP at the polished theta. Budget calibration
(measured on v5e, seeds 0-3): the subsample multistart converges in <=4
iterations and polish iteration 3 never moves theta — this config matches
the high-budget (12-iter, 3-start, 3-polish) likelihood exactly on 3 of 4
seeds and is within 0.4% on the fourth. Timing is steady-state
(post-compile) with fresh data and a forced host sync — the axon platform
dispatches asynchronously, so we pull a scalar result to stop the clock
honestly.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = baseline_seconds / measured_seconds (>1 beats the 1 s target).
"""

import json
import os
import sys
import time

import numpy as np


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
                      subsample_warmstart=2000, polish_iters=2)
        lkh = float(m.likelihood)  # host sync = honest stop
        return time.perf_counter() - t0, lkh

    t0 = time.perf_counter()
    _, lkh0 = fit(0)  # compile + run
    compile_s = time.perf_counter() - t0

    times = []
    lkh = lkh0
    for seed in (1, 2, 3):
        t, lkh = fit(seed)
        times.append(t)
    best = min(times)

    baseline_s = 1.0  # north-star target: n=10k fit < 1 s on one v5e
    result = {
        "metric": "gp_fit_n10k_d10_wall_time",
        "value": round(best, 4),
        "unit": "s",
        "vs_baseline": round(baseline_s / best, 3),
    }
    print(json.dumps(result))
    print(
        f"# compile+first={compile_s:.1f}s runs={['%.3f' % t for t in times]}"
        f" lkh={lkh:.2f} backend={jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
