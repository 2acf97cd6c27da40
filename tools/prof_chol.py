"""Real-TPU A/B of n=10k f32 Cholesky variants (ROADMAP perf item 1).

Hypotheses batched into one session (CLAUDE.md: each TPU compile is
minutes via the remote helper):

  A. XLA native jnp.linalg.cholesky            (baseline, 48 ms round 3)
  B. blocked_cholesky panel="solve"  b=1024    (50 ms round 3)
  C. blocked_cholesky panel="inverse" b=1024   (moves the ~n^2 b panel
     flops from triangular_solve (~4.7 TFLOP/s) onto the MXU)
  D. blocked_cholesky panel="inverse" b=2048
  E. full likelihood forward with each chol variant (the actual payoff)

Every timing forces a host sync (float of a scalar pulled from the
result); fresh SPD data per timed call so no caching flatters a variant.

Run: timeout 3600 python tools/prof_chol.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import os  # noqa: E402

os.environ.setdefault("EGOBOX_TPU_NO_X64", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from egobox_tpu.ops.block_linalg import blocked_cholesky  # noqa: E402

N = 10_000
DT = jnp.float32
REPS = 4


def make_spd(seed):
    """Fresh SPD matrix shaped like the GP correlation matrix: unit
    diagonal, off-diagonal decay, Gershgorin-safe jitter."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(N, 10)).astype(np.float32)
    return x


@jax.jit
def corr_mat(x):
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    r = jnp.exp(-5.0 * d2)
    rowsum = jnp.max(jnp.sum(jnp.abs(r), axis=1))
    return r + (1e-3 * rowsum) * jnp.eye(N, dtype=r.dtype)


variants = {
    "xla_native": jax.jit(jnp.linalg.cholesky),
    "blk_solve_1024": jax.jit(
        lambda r: blocked_cholesky(r, block=1024, panel="solve")
    ),
    "blk_inv_1024": jax.jit(
        lambda r: blocked_cholesky(r, block=1024, panel="inverse")
    ),
    "blk_inv_2048": jax.jit(
        lambda r: blocked_cholesky(r, block=2048, panel="inverse")
    ),
    "blk_inv_512": jax.jit(
        lambda r: blocked_cholesky(r, block=512, panel="inverse")
    ),
}


def main():
    xs = [jnp.asarray(make_spd(s)) for s in range(REPS + 1)]
    rs = [corr_mat(x) for x in xs]
    float(rs[0][0, 0])  # materialize

    # reference factor for accuracy deltas
    l_ref = np.asarray(variants["xla_native"](rs[0]))
    logdet_ref = 2.0 * np.sum(np.log(np.diag(l_ref)))

    for name, fn in variants.items():
        t0 = time.perf_counter()
        l0 = fn(rs[0])
        logdet = 2.0 * float(jnp.sum(jnp.log(jnp.diag(l0))))
        t_compile = time.perf_counter() - t0
        ts = []
        for i in range(1, REPS + 1):
            t0 = time.perf_counter()
            li = fn(rs[i])
            float(li[N - 1, N - 1])  # host sync
            ts.append(time.perf_counter() - t0)
        # accuracy: logdet is the quantity the likelihood consumes;
        # also max |L - L_ref| on a probe row
        dlogdet = abs(logdet - logdet_ref) / abs(logdet_ref)
        row_err = float(
            jnp.max(jnp.abs(l0[N - 1, :] - jnp.asarray(l_ref[N - 1, :])))
        )
        print(
            f"{name:16s} best {min(ts)*1e3:7.1f} ms  "
            f"(all {[f'{t*1e3:.1f}' for t in ts]})  "
            f"compile {t_compile:.1f}s  dlogdet {dlogdet:.2e}  "
            f"row_err {row_err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
