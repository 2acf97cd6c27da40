"""SGP n=50k perf pass (VERDICT r4 item 2): phase breakdown + recipe
ladder in ONE script (A/B experiments cost ~8-10 min compile each on the
remote helper — batch the hypotheses, CLAUDE.md).

The recorded 18.57 s (bench.py _sgp_throughput: FITC, M=512, n_start=7,
max_iters=60, subsample_warmstart=2000) carries estimated 2-3x slack:
one FITC likelihood at n=50k/M=512 is ~40 GFLOP, so 8 vmapped lanes x
60 L-BFGS iters x ~(3+trials) forwards ~ 60-100 TFLOP ~ 4-6 s of MXU at
the chol path's measured ~17 TFLOP/s. Phases measured here:

  P0  dense 2k-subsample warm-start subfit alone (fit_sgp runs this
      inside the timed region; if it dominates, shrink ITS recipe)
  A   shipped recipe (n_start=7, mi=60)        -- reproduce the 18.57
  B   n_start=2, mi=60                         -- fewer basin lanes
  C   n_start=2, mi=30                         -- + fewer iterations
  D   n_start=0, mi=30                         -- warm-started lane only
  E   n_start=0, mi=30, ls_batch=4             -- parallel line search
  F   n_start=2, mi=30, ls_batch=4

Each phase reports fit_s (fresh-seed warm-compiled), likelihood and
holdout Q2 (gate >= 0.98, bench.py SGP_Q2_MIN). Ship the cheapest phase
whose Q2/likelihood matches A.

Usage: python tools/prof_sgp_r5.py  (TPU)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from egobox_tpu.gp.sgp import fit_sgp, sgp_predict

    from bench import _make_data

    n, d, m_ind, n_hold = 50_000, 10, 512, 2_000
    dtype = jnp.float32

    def data(seed):
        x, y = _make_data(jnp, jax, seed, n + n_hold, d, dtype)
        x = x / 600.0
        kn = jax.random.key(seed + 100)
        yn = y + 0.05 * jnp.std(y) * jax.random.normal(kn, y.shape, dtype)
        return x[:n], yn[:n], x[n:], y[n:]

    out = {}

    # P0: the dense warm-start subfit alone (fit_sgp's internal call is
    # fit_gp(x[sub], y[sub], corr=..., seed=...) with ALL defaults)
    from egobox_tpu.gp.fit import fit_gp

    for seed in (0, 1):
        x, y, _, _ = data(seed)
        sub = np.asarray(
            jax.random.permutation(
                jax.random.split(jax.random.key(seed))[0], n
            )[:2000]
        )
        xs, ys = x[sub], y[sub]
        _ = float(xs[0, 0])
        t0 = time.perf_counter()
        msub = fit_gp(xs, ys, seed=seed)
        _ = float(msub.likelihood)
        if seed == 1:
            out["P0_dense_subfit_s"] = round(time.perf_counter() - t0, 3)
    print(f"P0 {out['P0_dense_subfit_s']}", flush=True)

    phases = {
        "A_ship_ns7_mi60": dict(n_start=7, max_iters=60),
        "B_ns2_mi60": dict(n_start=2, max_iters=60),
        "C_ns2_mi30": dict(n_start=2, max_iters=30),
        "D_ns0_mi30": dict(n_start=0, max_iters=30),
        "E_ns0_mi30_ls4": dict(n_start=0, max_iters=30, ls_batch=4),
        "F_ns2_mi30_ls4": dict(n_start=2, max_iters=30, ls_batch=4),
    }
    for label, kw in phases.items():
        rec = {}
        for seed in (0, 1):  # seed 0 warms the compile, seed 1 is honest
            x, y, xh, yh = data(seed)
            _ = float(x[0, 0])
            t0 = time.perf_counter()
            m = fit_sgp(
                x, y, method="FITC", n_inducing=m_ind, seed=seed,
                subsample_warmstart=2000, **kw,
            )
            lkh = float(m.likelihood)
            t_fit = time.perf_counter() - t0
            yp = np.asarray(sgp_predict(m, xh))
            yh_np = np.asarray(yh)
            q2 = 1.0 - float(
                np.sum((yh_np - yp) ** 2)
                / np.sum((yh_np - yh_np.mean()) ** 2)
            )
            rec[f"s{seed}"] = {
                "fit_s": round(t_fit, 3), "lkh": round(lkh, 1),
                "q2": round(q2, 4),
            }
        out[label] = rec
        print(f"{label}: {rec}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
