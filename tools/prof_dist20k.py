"""Distributed GP fit -> predict END-TO-END at n=20k on the real TPU
(VERDICT r3 item 1 closeout: "one real-TPU n>=20k fit+predict number").

Single-chip mesh (multi-chip hardware is not attached): the block-cyclic
machinery runs the same program path as the 8-device CPU-mesh parity
tests, here at real scale — fit_gp(mesh=...) returns a DistGpModel, and
predict/predict_var run against the sharded factor (an (n, n) f32 factor
at n=20k is 1.6 GB; nothing is gathered).

Usage: python tools/prof_dist20k.py  (TPU)
"""
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import numpy as np

    from egobox_tpu.gp.fit import fit_gp
    from egobox_tpu.parallel import DistGpModel

    from bench import _make_data

    n, d, n_q = 20_000, 10, 512
    dtype = jnp.float32
    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))

    out = {}
    for seed in (0, 1):  # seed 0 warms the compile; seed 1 is honest
        x, y = _make_data(jnp, jax, seed, n + n_q, d, dtype)
        xq = x[n:]
        x, y = x[:n], y[:n]
        _ = float(x[0, 0])
        t0 = time.perf_counter()
        m = fit_gp(
            x, y, nugget=1e-3, mesh=mesh,
            subsample_warmstart=2000, polish_iters=2, grad_probes=64,
        )
        lkh = float(m.likelihood)
        t_fit = time.perf_counter() - t0
        assert isinstance(m, DistGpModel)
        t0 = time.perf_counter()
        mean, var = m.predict_valvar(xq)
        _ = float(mean[0]) + float(var[0])
        t_pred = time.perf_counter() - t0
        out[f"s{seed}"] = {
            "fit_s": round(t_fit, 3), "pred512_s": round(t_pred, 4),
            "lkh": lkh,
            "var_min": float(jnp.min(var)), "var_max": float(jnp.max(var)),
        }
        print(f"s{seed}: {out[f's{seed}']}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
