"""Headline recovery ladder (VERDICT r4 item 6): mixed-size multi-draw
warm starts for the n=10k d=10 GP fit, in ONE batched script.

Shipped round-4 recipe: 3x2k draws + 1 TR polish iter = 0.495 s, worst
seed-1..3 deficit 0.49% vs the converged goldens. ROADMAP's untried idea:
replace one-or-two same-size draws with one LARGER draw (the 4k basin
statistics differ from 2k — sub4k worst seeds are different seeds), which
might buy the 3-draw quality at nearer the 2-draw time. Ladder:

  A  3x2k            (ship       — reproduce 0.495 s / 0.49%)
  B  2x2k + 1x4k     (mixed      — candidate)
  C  1x2k + 1x4k     (mixed lean — candidate)
  D  2x2k            (round-3 ship, 0.355 s / 1.03% — session scaling)

All share n_start=1, max_iters=4, polish_iters=1 TR, grad_probes=64,
nugget=1e-3 (bench.py fit config). Per phase: best wall of seeds 1-3 +
deltas vs GOLDEN_DIRECT_LKH, plus raw likelihoods on seeds 4-6 for
recipe-vs-recipe comparison (no goldens there; higher is better).

Usage: python tools/prof_r5_headline.py  (TPU)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import os

    os.environ.setdefault("EGOBOX_TPU_NO_X64", "1")
    import jax
    import jax.numpy as jnp

    import egobox_tpu.gp as gp

    from bench import GOLDEN_DIRECT_LKH, _make_data

    n, d = 10_000, 10
    dtype = jnp.float32

    phases = {
        "A_3x2k": dict(sub_draws=3),
        "B_2x2k_1x4k": dict(sub_draws=2, subsample_warmstart2=4096),
        "C_1x2k_1x4k": dict(sub_draws=1, subsample_warmstart2=4096),
        "D_2x2k": dict(sub_draws=2),
    }

    out = {}
    for label, kw in phases.items():
        def fit(seed):
            x, y = _make_data(jnp, jax, seed, n, d, dtype)
            _ = float(x[0, 0])
            t0 = time.perf_counter()
            m = gp.fit_gp(
                x, y, n_start=1, max_iters=4, nugget=1e-3,
                subsample_warmstart=2000, polish_iters=1, grad_probes=64,
                polish_tr=True, **kw,
            )
            lkh = float(m.likelihood)
            return time.perf_counter() - t0, lkh

        t0 = time.perf_counter()
        fit(0)
        compile_s = time.perf_counter() - t0
        times, deltas, extra = [], [], {}
        for seed in (1, 2, 3):
            t, lkh = fit(seed)
            times.append(t)
            gold = GOLDEN_DIRECT_LKH[seed]
            deltas.append(100.0 * (gold - lkh) / abs(gold))
        for seed in (4, 5, 6):
            _, lkh = fit(seed)
            extra[f"lkh_s{seed}"] = round(lkh, 2)
        out[label] = {
            "best_s": round(min(times), 4),
            "times": [round(t, 3) for t in times],
            "worst_delta_pct": round(max(deltas), 3),
            "deltas": [round(v, 3) for v in deltas],
            "compile_s": round(compile_s, 1),
            **extra,
        }
        print(f"{label}: {out[label]}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
