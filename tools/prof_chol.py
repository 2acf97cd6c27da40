"""Real-TPU micro-breakdown of the n=10k Cholesky (ROADMAP perf item 1).

Decides where a custom kernel could pay: is blocked_cholesky's remaining
cost in (a) the 10 small b x b panel factorizations (XLA small-chol
latency), (b) the sub-diagonal triangular solve / inverse-GEMM, or
(c) the trailing-update GEMMs? Each phase is timed standalone with a
host-sync (float of a scalar pulled from the result) per CLAUDE.md.

Run contention-free:  timeout 3600 python tools/prof_chol.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.scipy.linalg import solve_triangular  # noqa: E402

from egobox_tpu.ops.block_linalg import (  # noqa: E402
    blocked_cholesky,
    tri_inverse_lower,
)

N = 10_240
DT = jnp.float32


def spd(key, n):
    a = jax.random.normal(key, (n, n), DT) / np.sqrt(n)
    r = a @ a.T + 2.0 * jnp.eye(n, dtype=DT)
    return r


def timeit(name, fn, *args, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.ravel(out if not isinstance(out, tuple) else out[0])[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.ravel(out if not isinstance(out, tuple) else out[0])[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {min(ts) * 1e3:8.2f} ms", flush=True)
    return min(ts)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} n={N}", flush=True)
    key = jax.random.key(0)
    r = spd(key, N)
    l = jnp.linalg.cholesky(r)

    timeit("native chol n=10240", jnp.linalg.cholesky, r)
    for b in (1024, 2048):
        timeit(
            f"blocked b={b} solve high",
            lambda r, b=b: blocked_cholesky(
                r, block=b, precision=jax.lax.Precision.HIGH, panel="solve"
            ),
            r,
        )
        timeit(
            f"blocked b={b} inverse high",
            lambda r, b=b: blocked_cholesky(
                r, block=b, precision=jax.lax.Precision.HIGH,
                panel="inverse",
            ),
            r,
        )

    # phase (a): the 10 sequential b x b panel factorizations alone
    for b in (1024, 2048):
        nb = N // b
        diag = jnp.stack([r[k * b:(k + 1) * b, k * b:(k + 1) * b]
                          for k in range(nb)])

        def panels_seq(diag):
            def body(c, blk):
                lk = jnp.linalg.cholesky(blk + c * 0.0)
                return c + lk[0, 0], lk
            return jax.lax.scan(body, jnp.asarray(0.0, DT), diag)[0]

        timeit(f"{nb} sequential chol({b}) (scan)", panels_seq, diag)

    # single small chols (latency floor)
    for b in (512, 1024, 2048):
        rb = spd(jax.random.key(b), b)
        timeit(f"single chol({b})", jnp.linalg.cholesky, rb)

    # phase (b): one full-height panel apply, b=1024, rows=N-1024
    lkk = jnp.linalg.cholesky(r[:1024, :1024])
    below = r[1024:, :1024]
    timeit(
        "panel apply solve (9216 rhs)",
        lambda lkk, below: solve_triangular(lkk, below.T, lower=True).T,
        lkk, below,
    )

    def apply_inv(lkk, below):
        li = tri_inverse_lower(lkk, jax.lax.Precision.HIGH, block=256)
        return jnp.matmul(below, li.T, precision=jax.lax.Precision.HIGH)

    timeit("panel apply inverse+gemm", apply_inv, lkk, below)

    # phase (c): the dominant trailing GEMM (left-looking, k=5 of 10)
    left = jax.random.normal(jax.random.key(2), (N - 5 * 1024, 5 * 1024),
                             DT)
    top = jax.random.normal(jax.random.key(3), (1024, 5 * 1024), DT)
    for prec in ("high", "highest"):
        p = dict(high=jax.lax.Precision.HIGH,
                 highest=jax.lax.Precision.HIGHEST)[prec]
        timeit(
            f"trailing gemm (5120x{N - 5120})x1024 {prec}",
            lambda left, top, p=p: jnp.matmul(left, top.T, precision=p),
            left, top,
        )
