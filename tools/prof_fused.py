"""Standalone timing of the fused program + auxiliary dispatches on TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from egobox_tpu.ego.fused_step import fused_select_point
from egobox_tpu.doe.lhs import LhsKind, lhs_normalized


def timeit(label, fn, n=5):
    fn()  # compile/warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label}: min={min(ts)*1e3:.1f}ms med={sorted(ts)[n//2]*1e3:.1f}ms")


def main():
    dtype = jnp.float32
    nb, nx, m, k = 16, 1, 1, 20
    rng = np.random.default_rng(0)
    xp = rng.uniform(0, 25, (nb, nx))
    yp = np.sin(xp)
    mask = np.ones(nb, dtype=bool)
    mask[12:] = False
    theta0s = np.full((m, 1), 0.1)
    t_lo, t_up = np.full(1, 1e-2), np.full(1, 1e1)
    starts = rng.uniform(0, 25, (k, nx))
    lo, hi = np.zeros(1), np.full(1, 25.0)
    tols = np.zeros((0,))

    args0 = [jnp.asarray(a, dtype) for a in
             (xp, yp, mask, theta0s, t_lo, t_up)]
    args0[2] = jnp.asarray(mask)
    starts_d = jnp.asarray(starts, dtype)
    lo_d, hi_d = jnp.asarray(lo, dtype), jnp.asarray(hi, dtype)
    tols_d = jnp.asarray(tols, dtype)
    fk = jax.random.key(1)
    ck = jax.random.key(2)
    statics = dict(corr="squared_exponential", trend="constant",
                   kpls_dim=None, gp_n_start=10, gp_max_iters=50,
                   fixed=False, nugget=2.22e-14, n_cloud=100, crit="LogEI",
                   cstr_strategy="MC", n_cstr=0, cstr_infill=False,
                   feasibility=True, optimizer="COBYLA")

    def call_fused():
        p, _ = fused_select_point(
            *args0, fk, ck, starts_d, lo_d, hi_d,
            jnp.asarray(-1.0, dtype), tols_d, **statics)
        return float(p[0])

    timeit("fused program (device-resident args)", call_fused)

    def call_fused_np():
        p, _ = fused_select_point(
            jnp.asarray(xp, dtype), jnp.asarray(yp, dtype),
            jnp.asarray(mask), jnp.asarray(theta0s, dtype),
            args0[4], args0[5], fk, ck, jnp.asarray(starts, dtype),
            lo_d, hi_d, jnp.asarray(-1.0, dtype), tols_d, **statics)
        return float(p[0])

    timeit("fused program (numpy uploads)", call_fused_np)

    def call_lhs():
        u = lhs_normalized(jax.random.key(3), 20, nx, LhsKind.MAXIMIN, dtype)
        return float(u[0, 0])

    timeit("maximin LHS(20) + fetch", call_lhs)

    def call_split():
        k1, k2 = jax.random.split(jax.random.key(4))
        jax.block_until_ready(k1)

    timeit("eager key split (no fetch)", call_split)

    def roundtrip():
        return float(jnp.asarray(1.0) + 1.0)

    timeit("scalar add + fetch (pure roundtrip)", roundtrip)

    # gp_max_iters sweep: how much of the program is L-BFGS trip count?
    for mi in (10, 20):
        st = dict(statics, gp_max_iters=mi)

        def call_mi():
            p, _ = fused_select_point(
                *args0, fk, ck, starts_d, lo_d, hi_d,
                jnp.asarray(-1.0, dtype), tols_d, **st)
            return float(p[0])

        timeit(f"fused gp_max_iters={mi}", call_mi)


if __name__ == "__main__":
    main()
