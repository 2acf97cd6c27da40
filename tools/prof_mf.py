"""Real-TPU A/B: multi-draw warm start (fit.py sub_draws /
subsample_warmstart2) + trust-region polish on the headline n=10k fit.

Context (tools/prof_tr.py, clean same-session numbers):
  ls_pi2 (shipped r2 recipe)  0.673 s  deltas [0.98, 1.06, 2.44]%
  tr_pi2                      0.232 s  deltas [0.98, 1.06, 2.73]%
  tr_pi3/pi4                  same deltas — the polish is basin-limited.
The warm-start basin is a subsample lottery (CLAUDE.md: sub2k worst seed
2.44%, sub4k [0.05, 2.51, 0.58]% — no single draw dominates). Multi-draw
polishes ALL candidates on the full data (vmapped multi-init TR) and
keeps the best final likelihood; per-seed expected deficit = min over
draws ~ 1.06% worst if the 2k/4k measurements transfer.

Run contention-free:  timeout 7200 python tools/prof_mf.py
"""

import sys
import time

sys.path.insert(0, ".")

import os  # noqa: E402

os.environ.setdefault("EGOBOX_TPU_NO_X64", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import GOLDEN_DIRECT_LKH, _make_data  # noqa: E402
from egobox_tpu.gp.fit import fit_gp  # noqa: E402

N, D = 10_000, 10
DT = jnp.float32


def fit_seeded(seed, **kw):
    x, y = _make_data(jnp, jax, seed, N, D, DT)
    float(x[0, 0])
    t0 = time.perf_counter()
    m = fit_gp(x, y, n_start=1, max_iters=4, nugget=1e-3,
               subsample_warmstart=2000, grad_probes=64, **kw)
    lkh = float(m.likelihood)
    return time.perf_counter() - t0, lkh


def run(name, **kw):
    print(f"== {name} ==", flush=True)
    times, deltas = [], []
    for i, seed in enumerate((0, 1, 2, 3)):
        t, lkh = fit_seeded(seed, **kw)
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
    run("md 1x2k+4k tr_pi2", polish_iters=2, polish_tr=True,
        subsample_warmstart2=4000)
    run("md 2x2k+4k tr_pi2", polish_iters=2, polish_tr=True,
        sub_draws=2, subsample_warmstart2=4000)
    run("md 3x2k tr_pi2", polish_iters=2, polish_tr=True, sub_draws=3)
