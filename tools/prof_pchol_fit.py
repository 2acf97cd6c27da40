"""Real-TPU end-to-end A/B of the headline n=10k fit recipe under a
Cholesky dispatch variant. EGOBOX_CHOL is read at TRACE time and the jit
cache does not key on it, so each variant runs in its OWN process:

    timeout 5400 python tools/prof_pchol_fit.py                 # native
    EGOBOX_CHOL=pallas:256:high timeout 5400 python tools/prof_pchol_fit.py

Reports per-seed wall times and quality deltas vs bench.py goldens. The
axon roundtrip inflates both variants equally (fused fit = 1 dispatch +
1 fetch); compare variants within ONE session.
"""

import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("EGOBOX_TPU_NO_X64", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import GOLDEN_DIRECT_LKH, _make_data  # noqa: E402
from egobox_tpu.gp.fit import fit_gp  # noqa: E402

N, D = 10_000, 10
DT = jnp.float32

if __name__ == "__main__":
    print(f"backend={jax.default_backend()} "
          f"EGOBOX_CHOL={os.environ.get('EGOBOX_CHOL', 'native')}",
          flush=True)
    times, deltas = [], []
    for i, seed in enumerate((0, 1, 2, 3)):
        x, y = _make_data(jnp, jax, seed, N, D, DT)
        float(x[0, 0])
        t0 = time.perf_counter()
        m = fit_gp(x, y, n_start=1, max_iters=4, nugget=1e-3,
                   subsample_warmstart=2000, sub_draws=3,
                   polish_iters=2, grad_probes=64, polish_tr=True)
        lkh = float(m.likelihood)
        t = time.perf_counter() - t0
        if i == 0:
            print(f"compile+first {t:7.2f}s", flush=True)
            continue
        gold = GOLDEN_DIRECT_LKH[seed]
        d = 100.0 * (gold - lkh) / abs(gold)
        times.append(t)
        deltas.append(d)
        print(f"seed={seed} {t:6.3f}s lkh={lkh:.1f} delta={d:.2f}%",
              flush=True)
    print(f"best={min(times):.3f}s worst_delta={max(deltas):.2f}%",
          flush=True)
