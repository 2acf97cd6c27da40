"""MOPTA08-class showcase: 124-d, 68-constraint CoEGO optimization.

The reference ships MOPTA08 — a 124-variable vehicle-mass minimization
under 68 performance constraints — as THE problem its CoEGO machinery
exists for (crates/ego/examples/mopta08.rs: n_cstr=68, cstr_tol=1e-4,
EI + cstr_infill, COBYLA, coego(5), q_points=10/q_optmod=2, warm/hot
start). The reference's objective is an opaque vendor binary
(mopta08_elf64.bin) invoked per point; this example substitutes a
self-contained analog with the same shape and the same optimization
config, so the full high-dim + many-constraints pipeline (CoEGO groups,
partial theta tuning, 69 batched surrogates, constrained infill, qEI)
is exercised end-to-end without the binary.

The analog: minimize a weighted "mass" quadratic whose unconstrained
minimum lies partly OUTSIDE the unit box and outside the feasible set,
subject to 68 smooth ellipsoidal performance constraints g_i(x) <= 0.
A strictly feasible anchor x_f is built in, so the feasible set is
guaranteed nonempty; the small-margin constraints are active at the
optimum, making this a genuinely constrained problem (pulling toward
the unconstrained minimum crosses their boundaries).

Run: python examples/mopta08_like.py [--dim 124] [--iters 30]
"""

import argparse

import numpy as np

import egobox_tpu as egx

DIM = 124
N_CSTR = 68


def make_problem(d: int = DIM, n_cstr: int = N_CSTR, seed: int = 2008):
    """Deterministic problem generator -> (fn, x_feasible).

    ``fn``: (n, d) in [0,1]^d -> (n, 1 + n_cstr) with column 0 the
    objective and columns 1.. the constraints (feasible <= 0) — the same
    output convention as the reference's mopta() driver
    (mopta08.rs:173-207).
    """
    rng = np.random.default_rng(seed)
    w = 1.0 + rng.uniform(size=d)  # positive "mass" weights
    # unconstrained minimizer: partly outside the box AND the feasible set
    x_u = rng.uniform(-0.25, 1.25, size=d)
    # strictly feasible anchor (margins below guarantee g_i(x_f) < 0)
    x_f = 0.35 + 0.30 * rng.uniform(size=d)
    centers = rng.uniform(0.0, 1.0, size=(n_cstr, d))
    scales = rng.uniform(0.5, 1.5, size=(n_cstr, d)) / d
    # calibrated so ~3% of the box is feasible (a 125-point DoE gets a
    # feasible toehold) while 7 constraints cut off the unconstrained
    # minimizer — measured over 4000 uniform samples at the default seed
    margins = rng.uniform(0.06, 0.65, size=n_cstr)
    radii = np.einsum("cd,cd->c", scales, (x_f - centers) ** 2) + margins

    def fn(x):
        x = np.atleast_2d(np.asarray(x, dtype=float))
        f = ((x - x_u) ** 2) @ w / d
        diff = x[:, None, :] - centers[None, :, :]
        g = np.einsum("cd,ncd->nc", scales, diff**2) - radii[None, :]
        return np.concatenate([f[:, None], g], axis=1)

    return fn, x_f


def run(dim: int = DIM, max_iters: int = 30, seed: int = 42,
        q_points: int = 10, n_doe: int = 0):
    """Reference-config run (mopta08.rs:255-296 default branch):
    EI + cstr_infill, COBYLA infill optimizer, CoEGO with 5 cooperative
    groups, q_points Kriging-believer batches, theta refit every 2nd
    iteration."""
    fn, _ = make_problem(d=dim)
    egor = egx.Egor(
        [[0.0, 1.0]] * dim,
        n_cstr=N_CSTR,
        cstr_tol=np.full(N_CSTR, 1e-4),
        n_doe=n_doe or dim + 1,
        infill_strategy=egx.InfillStrategy.EI,
        cstr_infill=True,
        infill_optimizer=egx.InfillOptimizer.COBYLA,
        q_points=q_points,
        q_optmod=2,
        q_infill_strategy=egx.QInfillStrategy.KB,
        coego_n_coop=5,
        seed=seed,
    )
    res = egor.minimize(fn, max_iters=max_iters)
    viol = int(np.sum(res.y_opt[1:] > 1e-4))
    print(f"mopta08-like dim={dim}: y = {res.y_opt[0]:.4f} "
          f"(violated {viol}/{N_CSTR} constraints) after {max_iters} iters")
    return res


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=DIM)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--q-points", type=int, default=10)
    args = ap.parse_args()
    run(dim=args.dim, max_iters=args.iters, q_points=args.q_points)
