"""Recompute bench.py GOLDEN_DIRECT_LKH with CONVERGED direct fits.

VERDICT r3 weak #2: the round-2 goldens were n_start=1, max_iters=12 —
a single-basin direct fit. Here: 11 inits (0.1 + 10 maximin-LHS seeds over
the log10 theta bounds, the same seeding rule as fit_gp_core's multistart),
each polished with max_iters=50 (residual-API L-BFGS, converges earlier),
best likelihood wins. Run ONCE offline on the real TPU; paste the results
into bench.py.

Usage: python tools/golden_r4.py  (TPU; ~10-15 min incl. compile)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    import egobox_tpu.gp as gp
    from egobox_tpu.doe.lhs import maximin_lhs

    from bench import _make_data

    n, d = 10_000, 10
    dtype = jnp.float32
    lo, up = np.log10(1e-2), np.log10(1e1)

    key = jax.random.key(2026)
    seeds_lhs = np.array(maximin_lhs(key, 10, d, False, 5, dtype))
    inits = np.concatenate(
        [np.full((1, d), 0.1, np.float32),
         10.0 ** (lo + seeds_lhs * (up - lo))], axis=0
    ).astype(np.float32)

    out = {}
    for seed in (1, 2, 3):
        x, y = _make_data(jnp, jax, seed, n, d, dtype)
        _ = float(x[0, 0])
        lkhs = []
        for i, t0 in enumerate(inits):
            t0c = time.perf_counter()
            m = gp.fit_gp(
                x, y, n_start=0, max_iters=50, nugget=1e-3,
                theta_init=t0, polish_residual=True,
            )
            lkh = float(m.likelihood)
            lkhs.append(lkh)
            print(f"seed={seed} init={i} lkh={lkh:.4f} "
                  f"t={time.perf_counter() - t0c:.1f}s", flush=True)
        out[seed] = {"best": max(lkhs), "all": lkhs}
        print(f"seed={seed} BEST={max(lkhs):.4f}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
