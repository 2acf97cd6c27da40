"""Per-phase timing of one Egor iteration on the real TPU (xsinx)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from egobox_tpu.ego.config import EgorConfig
from egobox_tpu.ego.solver import EgorSolver
from egobox_tpu.ego.infill_optim import (
    compute_scaling, optimize_infill, virtual_point,
)
from egobox_tpu.ego.start_points import middle_picker_starts
from egobox_tpu.doe.lhs import LhsKind


def xsinx(x):
    x = np.atleast_2d(x)
    return ((x - 3.5) * np.sin((x - 3.5) / np.pi)).reshape(-1, 1)


def main():
    print("backend:", jax.default_backend())
    cfg = EgorConfig(seed=42)
    xlimits = np.array([[0.0, 25.0]])
    solver = EgorSolver(cfg, xlimits)
    state = solver.init_state(xsinx)

    crit = "LogEI"
    n_iters = 12
    tot = {"train": 0.0, "cloud": 0.0, "scaling": 0.0, "starts": 0.0,
           "infill": 0.0, "virtual": 0.0, "host": 0.0}
    t_all0 = time.perf_counter()
    for it in range(n_iters):
        t0 = time.perf_counter()
        xt, yt = state.x_data, state.y_data
        xp, yp, mask = solver._pad(xt, yt)
        fmin = float(yt[state.best_index, 0])
        lo = jnp.asarray(xlimits[:, 0])
        hi = jnp.asarray(xlimits[:, 1])
        tols = jnp.zeros((0,))
        t1 = time.perf_counter()

        models = solver._train_gp_batched(state, xt, yt, True)
        _ = float(models.theta[0, 0])
        t2 = time.perf_counter()

        npts = min(100 * solver.nx, 1000)
        cloud = jnp.asarray(solver._lhs(npts, LhsKind.MAXIMIN))
        _ = float(cloud[0, 0])
        t3 = time.perf_counter()

        s_inf, s_cstr, s_wb2 = compute_scaling(
            models, cloud, fmin, tols, crit=crit, n_cstr=0)
        _ = float(s_inf)
        t4 = time.perf_counter()

        starts = middle_picker_starts(
            state.rng, xt, xlimits, cfg.n_start,
            lambda n: solver._lhs_in(n, xlimits))
        starts = jnp.asarray(starts)
        t5 = time.perf_counter()

        xk, fk, _ = optimize_infill(
            models, starts, lo, hi, fmin, s_inf, s_wb2, s_cstr, tols,
            crit=crit, cstr_strategy="MC", n_cstr=0)
        xk_np = np.asarray(xk)
        _ = float(fk)
        t6 = time.perf_counter()

        i_min = int(np.argmin(yt[:, 0]))
        yk = virtual_point(models, xk, jnp.asarray(yt[i_min]), strategy="KB")
        _ = float(yk[0])
        t7 = time.perf_counter()

        # host update
        y_new = xsinx(xk_np[None])
        state.x_data = np.vstack([state.x_data, xk_np[None]])
        state.y_data = np.vstack([state.y_data, y_new])
        state.c_data = np.vstack([state.c_data, np.zeros((1, 0))])
        state.best_index = int(np.argmin(state.y_data[:, 0]))
        state.added += 1
        t8 = time.perf_counter()
        if it >= 2:  # skip compile iters
            tot["host"] += (t1 - t0) + (t8 - t7)
            tot["train"] += t2 - t1
            tot["cloud"] += t3 - t2
            tot["scaling"] += t4 - t3
            tot["starts"] += t5 - t4
            tot["infill"] += t6 - t5
            tot["virtual"] += t7 - t6
        print(f"iter {it}: train={t2-t1:.3f} cloud={t3-t2:.3f} "
              f"scale={t4-t3:.3f} starts={t5-t4:.3f} infill={t6-t5:.3f} "
              f"virt={t7-t6:.3f} total={t8-t0:.3f} n={xt.shape[0]}")
    n_meas = n_iters - 2
    print({k: round(v / n_meas, 4) for k, v in tot.items()})
    print(f"wall={time.perf_counter()-t_all0:.1f}s")


if __name__ == "__main__":
    main()
