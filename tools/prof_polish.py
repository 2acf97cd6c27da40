"""Real-TPU A/B of the n=10k GP-fit polish: exact vs stochastic-trace
gradient, vg vs residual routing — plus micro costs of each primitive.

Batched-hypotheses script (CLAUDE.md: each n=10k compile is minutes via the
remote helper — measure everything in ONE session). Every timing forces a
host sync (float(...)); fresh data/theta per timed call.

Run: timeout 3600 python tools/prof_polish.py [--skip-micro] [--skip-e2e]
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
from egobox_tpu.gp.likelihood import (  # noqa: E402
    make_neg_reduced_likelihood,
    reduced_likelihood,
)

N, D = 10_000, 10
DT = jnp.float32


def sync(v):
    return float(v)


def timed(fn, reps=3):
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        fn(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def micro():
    print("== micro (n=10k d=10 f32) ==", flush=True)
    x, y = _make_data(jnp, jax, 1, N, D, DT)
    xm, xs = jnp.mean(x, axis=0), jnp.std(x, axis=0, ddof=1)
    ym, ys = jnp.mean(y, axis=0), jnp.std(y, axis=0, ddof=1)
    xn, yn = (x - xm) / xs, ((y - ym) / ys)[:, None]
    nugget = 1e-3

    fwd = jax.jit(
        lambda th: reduced_likelihood(
            "squared_exponential", "constant", xn, yn, ys, th, None, nugget
        )[0]
    )

    def vg_fn(probes):
        neg = make_neg_reduced_likelihood(
            "squared_exponential", "constant", xn, yn, ys, None, nugget,
            stoch_probes=probes,
        )
        return jax.jit(jax.value_and_grad(lambda t: neg(10.0 ** t)))

    thetas = [jnp.full((D,), 0.1 * (1 + 0.01 * i), DT) for i in range(4)]
    lts = [jnp.log10(t) for t in thetas]

    t0 = time.perf_counter()
    sync(fwd(thetas[0]))
    print(f"fwd compile+run      {time.perf_counter()-t0:7.2f}s", flush=True)
    print(f"fwd steady           {timed(lambda r: sync(fwd(thetas[1+r]))):7.3f}s",
          flush=True)

    for p in (0, 64, 128):
        vg = vg_fn(p)
        t0 = time.perf_counter()
        v, g = vg(lts[0])
        sync(v)
        print(f"vg p={p:<4} compile+run {time.perf_counter()-t0:7.2f}s",
              flush=True)

        def run(r, vg=vg):
            v, g = vg(lts[1 + r])
            sync(v)
            sync(g[0])

        print(f"vg p={p:<4} steady      {timed(run):7.3f}s", flush=True)


def e2e():
    print("== end-to-end recipes (seeds 1-3, quality vs goldens) ==",
          flush=True)
    variants = [
        ("A default(exact vg)", dict()),
        ("B stoch64 vg      ", dict(grad_probes=64)),
        ("C stoch64 residual", dict(grad_probes=64, polish_residual=True)),
    ]
    for name, kw in variants:
        times, deltas = [], []
        for seed in (0, 1, 2, 3):  # seed 0 = compile run
            x, y = _make_data(jnp, jax, seed, N, D, DT)
            sync(x[0, 0])
            t0 = time.perf_counter()
            m = fit_gp(x, y, n_start=1, max_iters=4, nugget=1e-3,
                       subsample_warmstart=2000, polish_iters=2, **kw)
            lkh = sync(m.likelihood)
            dt = time.perf_counter() - t0
            if seed == 0:
                print(f"{name} compile+first {dt:7.2f}s", flush=True)
                continue
            times.append(dt)
            gold = GOLDEN_DIRECT_LKH[seed]
            deltas.append(100.0 * (gold - lkh) / abs(gold))
        print(f"{name} best={min(times):.3f}s times="
              f"{['%.3f' % t for t in times]} "
              f"deltas={['%.2f%%' % d for d in deltas]}", flush=True)


def subphases():
    print("== phase split ==", flush=True)
    # closing forward + assembly only (fixed theta)
    x, y = _make_data(jnp, jax, 1, N, D, DT)
    sync(x[0, 0])
    for r in range(2):
        x2, y2 = _make_data(jnp, jax, 10 + r, N, D, DT)
        sync(x2[0, 0])
        t0 = time.perf_counter()
        m = fit_gp(x2, y2, theta_fixed=True, theta_init=0.3, nugget=1e-3)
        sync(m.likelihood)
        print(f"fixed-theta assembly run{r}: {time.perf_counter()-t0:7.3f}s",
              flush=True)
    # subsample fit alone (2000-point direct fit, same statics as warmstart)
    for r in range(2):
        x2, y2 = _make_data(jnp, jax, 20 + r, 2000, D, DT)
        sync(x2[0, 0])
        t0 = time.perf_counter()
        m = fit_gp(x2, y2, n_start=1, max_iters=4, nugget=1e-3)
        sync(m.likelihood)
        print(f"sub-2k direct fit run{r}:  {time.perf_counter()-t0:7.3f}s",
              flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    if "--skip-micro" not in sys.argv:
        micro()
    if "--skip-phase" not in sys.argv:
        subphases()
    if "--skip-e2e" not in sys.argv:
        e2e()
