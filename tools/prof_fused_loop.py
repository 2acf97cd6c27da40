"""Per-stage timing inside the fused Egor iteration on TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from egobox_tpu.ego.config import EgorConfig
from egobox_tpu.ego.solver import EgorSolver, _CRIT_NAME, _CSTR_NAME, _OPT_NAME
from egobox_tpu.ego.fused_step import fused_select_point


def xsinx(x):
    x = np.atleast_2d(x)
    return ((x - 3.5) * np.sin((x - 3.5) / np.pi)).reshape(-1, 1)


def main():
    cfg = EgorConfig(seed=42)
    xlimits = np.array([[0.0, 25.0]])
    solver = EgorSolver(cfg, xlimits)
    state = solver.init_state(xsinx)
    crit = _CRIT_NAME[cfg.infill_strategy]
    cstrat = _CSTR_NAME[cfg.cstr_strategy]

    for it in range(14):
        t0 = time.perf_counter()
        xt, yt = state.x_data, state.y_data
        m = yt.shape[1]
        xp, yp, mask = solver._pad(xt, yt)
        t1 = time.perf_counter()
        theta0s, t_lo, t_up = solver._theta_setup(state, m)
        t2 = time.perf_counter()
        fit_key = jax.random.key(int(state.rng.integers(0, 2**31)))
        cloud_key = solver._next_key()
        t3 = time.perf_counter()
        starts = jnp.asarray(
            solver._multistart_seeds(state, xt, xlimits, None))
        t4 = time.perf_counter()
        fmin = float(yt[state.best_index, 0])
        dtype = xp.dtype
        box_key = xlimits.tobytes()
        if box_key not in solver._box_dev:
            solver._box_dev[box_key] = (
                jnp.asarray(np.ascontiguousarray(xlimits[:, 0]), dtype),
                jnp.asarray(np.ascontiguousarray(xlimits[:, 1]), dtype),
                jnp.asarray(state.cstr_tol[:0], dtype))
        lo_d, hi_d, tols_d = solver._box_dev[box_key]
        packed, models = fused_select_point(
            xp, yp, mask, theta0s, t_lo, t_up, fit_key, cloud_key,
            starts, lo_d, hi_d, jnp.asarray(fmin, dtype), tols_d,
            corr=solver.spec.corr, trend=solver.spec.trend,
            kpls_dim=None, gp_n_start=solver.spec.n_start,
            gp_max_iters=solver.spec.max_iters, fixed=False,
            nugget=solver.spec.nugget, n_cloud=100, crit=crit,
            cstr_strategy=cstrat, n_cstr=0, cstr_infill=False,
            feasibility=True, optimizer=_OPT_NAME[cfg.infill_optimizer])
        t5 = time.perf_counter()
        state.theta_inits = models.theta
        arr = np.asarray(packed)
        t6 = time.perf_counter()
        xk = arr[:1]
        y_new = xsinx(xk[None])
        state.x_data = np.vstack([state.x_data, xk[None]])
        state.y_data = np.vstack([state.y_data, y_new])
        state.c_data = np.vstack([state.c_data, np.zeros((1, 0))])
        state.best_index = int(np.argmin(state.y_data[:, 0]))
        state.iter += 1
        t7 = time.perf_counter()
        print(f"it{it} n={xt.shape[0]}: pad={t1-t0:.3f} theta={t2-t1:.3f} "
              f"keys={t3-t2:.3f} starts={t4-t3:.3f} call={t5-t4:.3f} "
              f"fetch={t6-t5:.3f} host={t7-t6:.3f} tot={t7-t0:.3f}")


if __name__ == "__main__":
    main()
