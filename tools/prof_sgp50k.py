"""SGP at scale (VERDICT r3 item 2): n=50k, M=512 FITC/VFE fit + predict
on one real TPU chip, with a holdout-Q2 quality check.

The reference's sparse GP exists to make n=1e4-1e6 tractable at O(NM^2)
(crates/gp/src/sparse_algorithm.rs:45-51) but was only ever exercised at
n<=200 here. This measures the real thing: noisy 10-d Griewank-family
data (bench.py generator + 5% noise), M=512 inducing points, joint
(theta, sigma2, noise) MLE with a 4-init vmapped multistart.

Usage: python tools/prof_sgp50k.py  (TPU)
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
        # SGP does NOT normalize x (reference parity,
        # sparse_algorithm.rs) and its theta bounds are (1e-2, 1e2):
        # scale the +-600 domain to +-1 so the kernel can express the
        # function's length scales — the user-side normalization the
        # reference's own examples perform.
        x = x / 600.0
        kn = jax.random.key(seed + 100)
        yn = y + 0.05 * jnp.std(y) * jax.random.normal(
            kn, y.shape, dtype
        )
        return x[:n], yn[:n], x[n:], y[n:]

    out = {}
    for method in ("FITC", "VFE"):
        for seed in (0, 1):
            x, y, xh, yh = data(seed)
            _ = float(x[0, 0])
            t0 = time.perf_counter()
            m = fit_sgp(
                x, y, method=method, n_inducing=m_ind, n_start=7,
                max_iters=60, seed=seed, subsample_warmstart=2000,
            )
            lkh = float(m.likelihood)  # host sync stops the clock
            t_fit = time.perf_counter() - t0
            t0 = time.perf_counter()
            yp = sgp_predict(m, xh)
            yp0 = float(yp[0])
            t_pred = time.perf_counter() - t0
            yh_np, yp_np = np.asarray(yh), np.asarray(yp)
            q2 = 1.0 - float(
                np.sum((yh_np - yp_np) ** 2)
                / np.sum((yh_np - yh_np.mean()) ** 2)
            )
            key = f"{method}_s{seed}"
            out[key] = {
                "fit_s": round(t_fit, 3), "pred_s": round(t_pred, 4),
                "lkh": lkh, "q2_holdout": round(q2, 4),
                "noise": float(m.noise), "sigma2": float(m.sigma2),
            }
            print(f"{key}: {out[key]}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
