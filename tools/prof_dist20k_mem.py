"""Diagnose the n=20k distributed-fit OOM (prof_dist20k RESOURCE_EXHAUSTED
at the first dist_likelihood_parts evaluation, v5e 2026-08-19) in stages:

  S0  free-HBM probe: allocate 1 GB f32 buffers until failure
  S1  ONE dist_likelihood_parts eval at n=20k (Gram + block-cyclic chol
      + solves) — no L-BFGS wrapper
  S2  realize_dist_model + sharded predict at a warm-started theta
      (the SERVING claim at n=20k: only r/l feeds + O(n) live)
  S3  fit_gp(mesh=...) with a lighter polish (polish_iters=1,
      grad_probes=32) — the full-fit claim at reduced peak

Each stage prints before it runs so the log shows exactly where HBM dies.
Take-3 lesson: stages contaminate each other — the axon allocator
reclaims dead buffers LAZILY, so S1's (n,n) feeds were still resident
when S2 allocated (S1 standalone passed at 723 s incl. compile, then
S2/S3 died RESOURCE_EXHAUSTED). Run ONE stage per process:
Usage: python tools/prof_dist20k_mem.py [s1|s2|s3]  (TPU)

MEASURED (take 4, one stage per process, v5e 2026-08-20, slow-tunnel
session — times include cold compiles):
  S1 one dist_likelihood_parts eval   723.1 s   rlf 11978.6
  S2 realize_dist_model + serve       235.1 s realize, 56.8 s predict512
  S3 FULL fit_gp(mesh=..., polish_iters=1, grad_probes=32)
                                      651.5 s   lkh 24496.6
S3's likelihood beats S2's warm-start-only realize (24141.8), i.e. the
distributed polish genuinely improves theta. Conclusion: n=20k fits and
serves on ONE v5e chip provided the process is fresh; the round-5 "OOM"
was allocator contamination from earlier stages, not a real capacity
limit of the fit itself.
"""
import json
import os
import sys
import time

os.environ.setdefault("EGOBOX_TPU_NO_X64", "1")

sys.path.insert(0, ".")


def main(stage="all"):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    out = {}

    # S0 (REMOVED): the 1-GiB-chunk free-HBM probe measured 15 GiB
    # allocatable but poisoned the axon allocator — even with explicit
    # buffer .delete() every subsequent eager op died RESOURCE_EXHAUSTED
    # (two takes, 2026-08-19). Known from take 1: ~15 GiB allocatable.

    from egobox_tpu.gp.fit import fit_gp
    from egobox_tpu.parallel import realize_dist_model
    from egobox_tpu.parallel.dist_fit import dist_likelihood_parts

    from bench import _make_data

    n, d, n_q = 20_000, 10, 512
    dtype = jnp.float32
    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
    x, y = _make_data(jnp, jax, 1, n + n_q, d, dtype)
    xq = x[n:]
    x, y = x[:n], y[:n]
    xm, xs = jnp.mean(x, axis=0), jnp.std(x, axis=0, ddof=1)
    ym, ys = jnp.mean(y), jnp.std(y, ddof=1)
    xn = (x - xm) / xs
    yn = ((y - ym) / ys)[:, None]
    theta = jnp.full((d,), 0.2, dtype)

    # S1: one likelihood eval
    if stage in ("all", "s1"):
      print("S1 dist_likelihood_parts ...", flush=True)
      try:
        t0 = time.perf_counter()
        rlf, _ = dist_likelihood_parts(
            mesh, xn, yn, theta, corr="squared_exponential",
            trend="constant", nugget=1e-3, bp=None,
        )
        out["s1_rlf"] = float(rlf)
        out["s1_s"] = round(time.perf_counter() - t0, 2)
      except Exception as e:  # noqa: BLE001
        out["s1_err"] = f"{type(e).__name__}: {str(e)[:120]}"
      print(f"S1 {out.get('s1_s', out.get('s1_err'))}", flush=True)

    # S2: warm-started realize + serve
    if stage in ("all", "s2"):
      print("S2 realize + predict ...", flush=True)
      try:
        sub = np.random.default_rng(0).permutation(n)[:2000]
        m0 = fit_gp(x[sub], y[sub], nugget=1e-3, n_start=3, max_iters=20,
                    ls_batch=8)
        th = m0.theta
        t0 = time.perf_counter()
        dm = realize_dist_model(mesh, x, y, th, nugget=1e-3)
        lkh = float(dm.likelihood)
        t_real = time.perf_counter() - t0
        t0 = time.perf_counter()
        mean, var = dm.predict_valvar(xq)
        _ = float(mean[0]) + float(var[0])
        out["s2_realize_s"] = round(t_real, 2)
        out["s2_pred512_s"] = round(time.perf_counter() - t0, 3)
        out["s2_lkh"] = lkh
      except Exception as e:  # noqa: BLE001
        out["s2_err"] = f"{type(e).__name__}: {str(e)[:120]}"
      print(f"S2 {out.get('s2_realize_s', out.get('s2_err'))}", flush=True)

    # S3: full distributed fit, lighter polish
    if stage in ("all", "s3"):
      print("S3 fit_gp(mesh=...) ...", flush=True)
      try:
        t0 = time.perf_counter()
        m = fit_gp(
            x, y, nugget=1e-3, mesh=mesh, subsample_warmstart=2000,
            polish_iters=1, grad_probes=32,
        )
        out["s3_lkh"] = float(m.likelihood)
        out["s3_fit_s"] = round(time.perf_counter() - t0, 2)
      except Exception as e:  # noqa: BLE001
        out["s3_err"] = f"{type(e).__name__}: {str(e)[:120]}"
      print(f"S3 {out.get('s3_fit_s', out.get('s3_err'))}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
