"""Real-TPU A/B: Pallas blocked Cholesky (ops/pallas_chol.py) vs native vs
the XLA-blocked variant, single and vmapped x3 (the 3-lane TR polish
batches its forwards), n=10240 f32.

Accuracy is reported as max|L - L64| against a float64 numpy factorization
and as the logdet delta (the quantity the likelihood consumes).

Run contention-free:  timeout 5400 python tools/prof_chol2.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from egobox_tpu.ops.block_linalg import blocked_cholesky  # noqa: E402
from egobox_tpu.ops.pallas_chol import pallas_cholesky  # noqa: E402

N = 10_240
DT = jnp.float32
HIGH = jax.lax.Precision.HIGH


def spd(key, n):
    a = jax.random.normal(key, (n, n), DT) / np.sqrt(n)
    return a @ a.T + 2.0 * jnp.eye(n, dtype=DT)


def timeit(name, fn, *args, reps=3, ref_logdet=None):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    first = jnp.ravel(out)
    float(first[0])
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(jnp.ravel(out)[0])
        ts.append(time.perf_counter() - t0)
    msg = f"{name:38s} {min(ts) * 1e3:8.2f} ms  (compile {compile_s:.0f}s)"
    if ref_logdet is not None:
        l = np.asarray(out)
        if l.ndim == 3:
            l = l[0]
        logdet = 2.0 * np.sum(np.log(np.abs(np.diag(l))))
        msg += f"  dlogdet={abs(logdet - ref_logdet):.2e}"
    print(msg, flush=True)
    return min(ts)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} n={N}", flush=True)
    key = jax.random.key(0)
    r = spd(key, N)
    r64 = np.asarray(r, np.float64)
    l64 = np.linalg.cholesky(r64)
    ref_logdet = 2.0 * np.sum(np.log(np.diag(l64)))
    print(f"ref logdet={ref_logdet:.6f}", flush=True)
    rs3 = jnp.stack([r, r, r])

    timeit("native chol", jnp.linalg.cholesky, r, ref_logdet=ref_logdet)
    timeit("native chol vmap x3", jax.vmap(jnp.linalg.cholesky), rs3,
           ref_logdet=ref_logdet)
    timeit(
        "blocked inverse b=1024 high",
        lambda r: blocked_cholesky(r, block=1024, precision=HIGH,
                                   panel="inverse"),
        r, ref_logdet=ref_logdet,
    )
    for b in (256, 512):
        timeit(
            f"pallas b={b} high",
            lambda r, b=b: pallas_cholesky(r, block=b, precision=HIGH),
            r, ref_logdet=ref_logdet,
        )
    timeit(
        "pallas b=256 highest",
        lambda r: pallas_cholesky(
            r, block=256, precision=jax.lax.Precision.HIGHEST),
        r, ref_logdet=ref_logdet,
    )
    timeit(
        "pallas b=256 high vmap x3",
        jax.vmap(lambda r: pallas_cholesky(r, block=256, precision=HIGH)),
        rs3, ref_logdet=ref_logdet,
    )
    # accuracy spot-check of the winner candidate
    l = np.asarray(jax.jit(
        lambda r: pallas_cholesky(r, block=256, precision=HIGH))(r))
    err = np.max(np.abs(np.tril(l) - l64))
    ln = np.asarray(jnp.linalg.cholesky(r))
    errn = np.max(np.abs(np.tril(ln) - l64))
    print(f"maxabs dL: pallas={err:.3e} native={errn:.3e}", flush=True)
