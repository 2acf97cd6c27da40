"""Real-TPU A/B: push the headline n=10k fit under 0.5 s.

Shipped recipe (bench.py): 3x2k-draw subfit + vmapped 3-lane TR polish
(pi2) = 0.637 s driver-measured, worst-seed delta 0.49%. Candidates:

  ship    3x2k tr_pi2   — same-session reference point (shapes cached)
  A       2x2k tr_pi2   — one fewer lane everywhere (~0.2 s/lane slope)
  B       3x2k tr_pi1   — polish is basin-limited; is iter 2 needed?
  C       2x2k tr_pi1   — both cuts

Quality bar: worst-seed delta must stay under the bench gate (1.5%).

Run contention-free:  timeout 7200 python tools/prof_r3c.py
"""

import sys

sys.path.insert(0, ".")

import os  # noqa: E402

os.environ.setdefault("EGOBOX_TPU_NO_X64", "1")

import jax  # noqa: E402

from prof_mf_lib import run  # noqa: E402

if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    run("ship 3x2k tr_pi2", polish_iters=2, polish_tr=True, sub_draws=3)
    run("A 2x2k tr_pi2", polish_iters=2, polish_tr=True, sub_draws=2)
    run("B 3x2k tr_pi1", polish_iters=1, polish_tr=True, sub_draws=3)
    run("C 2x2k tr_pi1", polish_iters=1, polish_tr=True, sub_draws=2)
