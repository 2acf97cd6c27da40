"""Round-3b real-TPU session: (1) chol trailing-update precision A/B,
(2) fused-fit phase split, (3) e2e fit with the best chol variant.

All hypotheses batched into ONE session (CLAUDE.md: each n=10k compile is
minutes via the remote helper). Every timing forces a host sync.

Hypothesis: blocked_cholesky's trailing-update GEMMs at Precision.HIGH
(bf16x3, ~2x faster than HIGHEST's bf16x6) cut the 48 ms native chol to
~25-30 ms with ~1e-6 relative factor error — harmless under the
Gershgorin-scaled nugget=1e-3. The forward is chol-dominated (62 ms total,
48 ms chol), so this directly attacks the polish-phase trial cost.

Run: timeout 5400 python tools/prof_r3b.py [--skip-chol] [--skip-phase]
     [--skip-e2e]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import os  # noqa: E402

os.environ.setdefault("EGOBOX_TPU_NO_X64", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import GOLDEN_DIRECT_LKH, _make_data  # noqa: E402
from egobox_tpu.gp.fit import fit_gp  # noqa: E402
from egobox_tpu.ops.block_linalg import blocked_cholesky  # noqa: E402

N, D = 10_000, 10
DT = jnp.float32
REPS = 3
P = jax.lax.Precision


def sync(v):
    return float(v)


@jax.jit
def corr_mat(x):
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    r = jnp.exp(-5.0 * d2)
    rowsum = jnp.max(jnp.sum(jnp.abs(r), axis=1))
    return r + (1e-3 * rowsum) * jnp.eye(N, dtype=r.dtype)


def chol_ab():
    print("== chol variants (n=10k f32) ==", flush=True)
    variants = {
        "native": jax.jit(jnp.linalg.cholesky),
        "solve_1024_high": jax.jit(
            lambda r: blocked_cholesky(r, 1024, P.HIGH, "solve")
        ),
        "solve_2048_high": jax.jit(
            lambda r: blocked_cholesky(r, 2048, P.HIGH, "solve")
        ),
        "inv_1024_high": jax.jit(
            lambda r: blocked_cholesky(r, 1024, P.HIGH, "inverse")
        ),
        "inv_2048_high": jax.jit(
            lambda r: blocked_cholesky(r, 2048, P.HIGH, "inverse")
        ),
        "inv_2048_highest": jax.jit(
            lambda r: blocked_cholesky(r, 2048, P.HIGHEST, "inverse")
        ),
    }
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.uniform(size=(N, 10)).astype(np.float32))
        for _ in range(REPS + 1)
    ]
    rs = [corr_mat(x) for x in xs]
    sync(rs[0][0, 0])
    l_ref = variants["native"](rs[0])
    logdet_ref = 2.0 * float(jnp.sum(jnp.log(jnp.diag(l_ref))))
    for name, fn in variants.items():
        t0 = time.perf_counter()
        l0 = fn(rs[0])
        logdet = 2.0 * float(jnp.sum(jnp.log(jnp.diag(l0))))
        t_comp = time.perf_counter() - t0
        ts = []
        for i in range(1, REPS + 1):
            t0 = time.perf_counter()
            li = fn(rs[i])
            sync(li[N - 1, N - 1])
            ts.append(time.perf_counter() - t0)
        dld = abs(logdet - logdet_ref) / abs(logdet_ref)
        print(
            f"{name:18s} best {min(ts)*1e3:7.1f} ms "
            f"all={[f'{t*1e3:.0f}' for t in ts]} "
            f"compile {t_comp:.0f}s dlogdet {dld:.2e}",
            flush=True,
        )


def fit_seeded(seed, **kw):
    x, y = _make_data(jnp, jax, seed, N, D, DT)
    sync(x[0, 0])
    t0 = time.perf_counter()
    m = fit_gp(x, y, n_start=1, max_iters=4, nugget=1e-3,
               subsample_warmstart=2000, grad_probes=64,
               polish_residual=True, **kw)
    lkh = sync(m.likelihood)
    return time.perf_counter() - t0, lkh


def phase_split():
    print("== fused-fit phase split (polish_iters sweep) ==", flush=True)
    for pi in (0, 1, 2):
        ts = []
        for i, seed in enumerate((0, 1, 11, 21)):
            t, _ = fit_seeded(seed, polish_iters=pi)
            if i == 0:
                print(f"  pi={pi} compile+first {t:6.2f}s", flush=True)
            else:
                ts.append(t)
        print(f"  polish_iters={pi}: best {min(ts):.3f}s "
              f"all={['%.3f' % t for t in ts]}", flush=True)


def e2e(chol_spec):
    print(f"== e2e fit with EGOBOX_CHOL={chol_spec} ==", flush=True)
    os.environ["EGOBOX_CHOL"] = chol_spec
    jax.clear_caches()
    times, deltas = [], []
    for i, seed in enumerate((0, 1, 2, 3)):
        t, lkh = fit_seeded(seed, polish_iters=2)
        if i == 0:
            print(f"  compile+first {t:6.2f}s", flush=True)
            continue
        times.append(t)
        gold = GOLDEN_DIRECT_LKH[seed]
        deltas.append(100.0 * (gold - lkh) / abs(gold))
    print(f"  best={min(times):.3f}s times={['%.3f' % t for t in times]} "
          f"deltas={['%.2f%%' % d for d in deltas]}", flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    if "--skip-chol" not in sys.argv:
        chol_ab()
    if "--skip-phase" not in sys.argv:
        phase_split()
    # baseline e2e in the SAME session for a fair delta
    if "--skip-e2e" not in sys.argv:
        e2e("native")
        e2e(sys.argv[sys.argv.index("--chol") + 1]
            if "--chol" in sys.argv else "blk:solve:2048:high")
