"""Compile-warmup for tools/prof_tr.py's recipe variants: runs each
variant once (seed 0) so the persistent TPU compile cache is hot before
the contention-free timed A/B. Timings printed here are NOT authoritative.
"""

import sys
import time

sys.path.insert(0, ".")

import os  # noqa: E402

os.environ.setdefault("EGOBOX_TPU_NO_X64", "1")

from tools.prof_tr import fit_seeded  # noqa: E402

VARIANTS = [
    ("tr_pi2", dict(polish_iters=2, polish_tr=True)),
    ("tr_pi3", dict(polish_iters=3, polish_tr=True)),
    ("tr_pi4", dict(polish_iters=4, polish_tr=True)),
    ("ls_pi1", dict(polish_iters=1, polish_residual=True)),
]

if __name__ == "__main__":
    for name, kw in VARIANTS:
        t0 = time.time()
        t, lkh = fit_seeded(0, **kw)
        print(f"{name}: compile+run {time.time() - t0:.1f}s "
              f"lkh {lkh:.2f}", flush=True)
