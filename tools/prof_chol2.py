"""Real-TPU A/B: Pallas blocked Cholesky (ops/pallas_chol.py) vs native,
single and vmapped x3 (the 3-lane TR polish batches its forwards),
n=10240 f32.

TIMING: each variant is ONE jitted program returning sum(log(diag(L)))
— a scalar whose value depends on the entire factor, so XLA cannot
dead-code-eliminate any panel and the host fetch is an honest sync.
Per-chol cost = T - T_null where T_null times an equivalently-shaped
trivial program (pure dispatch + tunnel roundtrip, ~30-45 ms this
session). A k=8 unrolled chain was tried first and is a trap: the
native-chol chain took 5163 s to compile and produced anomalously slow
code (1.66 s/chol vs 48 ms single) — do not resurrect it.

Accuracy is reported as the logdet delta vs a float64 numpy
factorization (the quantity the likelihood consumes).

Run contention-free:  timeout 5400 python tools/prof_chol2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# Mosaic kernels cannot compile under global x64 (i64 index maps fail to
# legalize) — run f32-native like the TPU deployment path
os.environ.setdefault("EGOBOX_TPU_NO_X64", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from egobox_tpu.ops.pallas_chol import pallas_cholesky  # noqa: E402

N = 10_240
DT = jnp.float32
HIGH = jax.lax.Precision.HIGH


def spd_np(seed, n):
    # NOTE: host numpy at n=10k costs ~10 min on the 1-CPU host (a@a.T is
    # 2e12 flops) but the f64 ground-truth chol needs the matrix on host
    # anyway.
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    return a @ a.T + 2.0 * np.eye(n, dtype=np.float32)


def logdet_prog(chol_fn):
    def f(r):
        l = chol_fn(r)
        return jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)))
    return f


def run(name, fn, r, t_null, ref, reps=5):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = float(f(r))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = float(f(r))
        ts.append(time.perf_counter() - t0)
    per = min(ts) - t_null
    b = r.shape[0] if r.ndim == 3 else 1
    print(f"{name:34s} {per * 1e3:8.2f} ms/prog ({per / b * 1e3:6.2f}"
          f"/lane)  t={min(ts):.3f}s compile={compile_s:.0f}s "
          f"dlogdet={out - ref:+.4f}", flush=True)
    return per


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} n={N}", flush=True)
    r_np = spd_np(0, N)
    l64 = np.linalg.cholesky(r_np.astype(np.float64))
    ref = float(np.sum(np.log(np.diag(l64))))
    print(f"f64 logdet/2 = {ref:.4f}", flush=True)

    r = jnp.asarray(r_np)
    rs3 = jnp.stack([r, r, r])

    # pure-roundtrip nulls: same input, trivial scalar program
    t_null = run("null (r[0,0] fetch)",
                 lambda r: r[0, 0] * 2.0, r, 0.0, 2.0 * float(r_np[0, 0]))
    t_null3 = run("null vmap3", lambda r: 2.0 * jnp.sum(r[:, 0, 0]), rs3,
                  0.0, 6.0 * float(r_np[0, 0]))

    run("native chol", logdet_prog(jnp.linalg.cholesky), r, t_null, ref)
    # b=512 exceeds the 16M scoped VMEM limit (17.7M: double-buffered
    # (tm, b) slabs + the b x b chol/inv live set) — measured OOM on v5e
    for bsz in (256,):
        run(f"pallas b={bsz} high",
            logdet_prog(lambda x, b=bsz: pallas_cholesky(
                x, block=b, precision=HIGH)),
            r, t_null, ref)
    run("native chol vmap x3",
        logdet_prog(jax.vmap(jnp.linalg.cholesky)), rs3, t_null3, 3 * ref)
    run("pallas b=256 high vmap x3",
        logdet_prog(jax.vmap(lambda x: pallas_cholesky(
            x, block=256, precision=HIGH))),
        rs3, t_null3, 3 * ref)
