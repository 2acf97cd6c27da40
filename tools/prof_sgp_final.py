"""Final SGP n=50k recipe measurement: ns2/mi30 (tools/prof_sgp_r5.py
ladder winner) WITH the budgeted dense warm-start subfit (gp/sgp.py:
3 starts x 20 iters x ls_batch=8 — the full-default subfit alone was
11.6 s). Also times the budgeted subfit standalone (P0b) and a VFE run.

Usage: python tools/prof_sgp_final.py  (TPU)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from egobox_tpu.gp.fit import fit_gp
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

    # P0b: budgeted dense subfit standalone
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
        msub = fit_gp(xs, ys, seed=seed, n_start=3, max_iters=20,
                      ls_batch=8)
        _ = float(msub.likelihood)
        if seed == 1:
            out["P0b_budgeted_subfit_s"] = round(
                time.perf_counter() - t0, 3
            )
    print(f"P0b {out['P0b_budgeted_subfit_s']}", flush=True)

    for method in ("FITC", "VFE"):
        rec = {}
        for seed in (0, 1):
            x, y, xh, yh = data(seed)
            _ = float(x[0, 0])
            t0 = time.perf_counter()
            m = fit_sgp(
                x, y, method=method, n_inducing=m_ind, n_start=2,
                max_iters=30, seed=seed, subsample_warmstart=2000,
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
        out[method] = rec
        print(f"{method}: {rec}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
