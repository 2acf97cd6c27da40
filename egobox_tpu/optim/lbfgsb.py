"""Box-constrained L-BFGS, fully jittable and vmappable.

This replaces the reference's derivative-free COBYLA/SLSQP local optimizers
(crates/gp/src/optimization.rs, crates/ego/src/optimizers/optimizer.rs) on
the TPU compute path: since JAX gives exact gradients of the likelihood and
infill criteria, a projected quasi-Newton method converges in far fewer
evaluations, and an entire multistart batch runs as ONE vmapped program
(the reference fans multistarts out over rayon threads instead).

Implementation: limited-memory BFGS two-loop recursion with a fixed-size
circular (s, y) history, gradient projection onto the box, and Armijo
backtracking line search along the projected path. NaN/inf objective values
are treated as +inf so the line search backs away from invalid regions
(mirrors the reference's "likelihood failure -> INFINITY" robustness,
gp/src/algorithm.rs:893-896).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LbfgsbResult(NamedTuple):
    x: jnp.ndarray
    fun: jnp.ndarray
    n_iters: jnp.ndarray
    converged: jnp.ndarray
    #: residual pytree of the accepted final point when the objective was
    #: given as fun_and_res/grad_from_res (else an empty tuple) — lets
    #: callers reuse the last factorization instead of recomputing a
    #: forward at res.x
    res: object = ()


def _sanitize(f):
    return jnp.where(jnp.isfinite(f), f, jnp.inf)


def _two_loop(g, s_hist, y_hist, rho, valid, head):
    """H @ g via the standard L-BFGS two-loop recursion over a circular
    (s, y) history (most-recent-first), with invalid slots masked out.
    Shared by the line-search solver (minimize_lbfgsb) and the
    trust-region solver (minimize_tr)."""
    history = s_hist.shape[0]
    order = (head - 1 - jnp.arange(history)) % history  # newest first

    def fwd(carry, i):
        q, alphas = carry
        si, yi, ri, vi = s_hist[i], y_hist[i], rho[i], valid[i]
        a = jnp.where(vi, ri * jnp.dot(si, q), 0.0)
        q = q - jnp.where(vi, a, 0.0) * yi
        return (q, alphas), a

    (q, _), alphas = lax.scan(fwd, (g, None), order)

    # initial Hessian scale from the newest valid pair
    newest = (head - 1) % history
    sy = jnp.dot(s_hist[newest], y_hist[newest])
    yy = jnp.dot(y_hist[newest], y_hist[newest])
    gamma = jnp.where(valid[newest] & (yy > 0), sy / yy, 1.0)
    r = gamma * q

    def bwd(r, idx):
        i, a = idx
        si, yi, ri, vi = s_hist[i], y_hist[i], rho[i], valid[i]
        b = jnp.where(vi, ri * jnp.dot(yi, r), 0.0)
        r = r + jnp.where(vi, a - b, 0.0) * si
        return r, None

    r, _ = lax.scan(bwd, r, (order[::-1], alphas[::-1]))
    return r


def minimize_lbfgsb(
    fun: Callable,
    x0: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    max_iters: int = 50,
    history: int = 8,
    max_ls: int = 20,
    gtol: float = 1e-8,
    xtol: float = 1e-12,
    fun_and_res: Callable = None,
    grad_from_res: Callable = None,
    ls_batch: int = 0,
    final_grad: bool = True,
) -> LbfgsbResult:
    """Minimize ``fun`` (scalar) over the box [lower, upper].

    All arguments after ``fun`` are arrays of shape (d,); the whole solver is
    a single lax.while_loop so it can be vmapped over multistarts.

    ``fun_and_res``/``grad_from_res`` enable factorization reuse for
    objectives with an expensive shared forward (the GP likelihood keeps
    its Cholesky): line-search trials call ``fun_and_res(x) -> (f, res)``
    and the accepted trial's residuals feed ``grad_from_res(x, res) -> g``
    directly, saving one full forward per iteration vs value_and_grad.
    The residual pytree rides the solver's while_loop carry (static
    shapes).

    ``final_grad=False`` skips the gradient evaluation on the LAST allowed
    iteration: the result consumer discards gradients (only x/fun are
    returned), so when the objective's adjoint is expensive (the GP
    likelihood's O(n^3) trace term) the final grad is pure waste. The
    stale gradient only feeds the convergence check of an iteration that
    terminates regardless; lanes stopping earlier are unaffected.

    ``ls_batch > 1`` switches to a SPECULATIVE PARALLEL line search: all
    ``ls_batch`` backtracking step sizes (1, 1/2, 1/4, ...) are evaluated
    as ONE vmapped forward and the largest Armijo-passing alpha is taken —
    the same point sequential backtracking would accept, at the device
    cost of ~one batched evaluation instead of up to ``max_ls`` sequential
    ones. On TPU the sequential trials inside a (vmapped) while loop are
    the dominant cost of small-n fits — a batch of tiny Grams/Choleskys
    costs nearly the same as one, so this is the TPU-shaped line search
    (the reference's COBYLA has no line search at all; each of its probes
    pays a full likelihood, gp/src/algorithm.rs:879-948). Memory is
    ls_batch x the forward's live set — do NOT enable at n ~ 10k.
    """
    d = x0.shape[0]
    dtype = x0.dtype

    def clip(x):
        return jnp.clip(x, lower, upper)

    x0 = clip(x0)
    if fun_and_res is None:
        vg = jax.value_and_grad(fun)
        fun_and_res = lambda x: (fun(x), ())  # noqa: E731
        grad_from_res = lambda x, res: vg(x)[1]  # noqa: E731
        f0, g0 = vg(x0)  # one fused eval at init
        res0 = ()
    else:
        f0, res0 = fun_and_res(x0)
        g0 = grad_from_res(x0, res0)
    f0 = _sanitize(f0)
    g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)

    s_hist = jnp.zeros((history, d), dtype)
    y_hist = jnp.zeros((history, d), dtype)
    rho = jnp.zeros((history,), dtype)
    valid = jnp.zeros((history,), bool)

    def proj_grad_norm(x, g):
        # norm of the projected gradient: components pointing outside the
        # active box faces are zeroed
        pg = jnp.where((x <= lower) & (g > 0), 0.0, g)
        pg = jnp.where((x >= upper) & (pg < 0), 0.0, pg)
        return jnp.max(jnp.abs(pg))

    def line_search_parallel(x, f, res, g, direction, need_grad):
        """Speculative parallel backtracking: evaluate all ls_batch
        alphas in one vmapped forward, accept the largest alpha passing
        Armijo — the same point sequential backtracking accepts whenever
        Armijo fires within the first ls_batch halvings (the common
        case). If NO trial in the batch improves, further batches of
        ls_batch halved alphas are evaluated (while_loop) until one
        improves or the sequential search's 2^-max_ls floor is reached,
        so ill-scaled objectives keep the same reach as sequential
        backtracking instead of stalling at alpha = 2^-(ls_batch-1)."""
        c1 = 1e-4

        def trial_batch(scale):
            alphas = scale * 0.5 ** jnp.arange(ls_batch, dtype=dtype)

            def trial(a):
                x_new = clip(x + a * direction)
                f_raw, res_new = fun_and_res(x_new)
                return x_new, _sanitize(f_raw), res_new

            return jax.vmap(trial)(alphas)

        xs, fs, ress = trial_batch(jnp.asarray(1.0, dtype))
        n_rounds = max(1, -(-max_ls // ls_batch))

        def deeper_cond(carry):
            scale, _xs, fs_c, _ress, r = carry
            return (jnp.min(fs_c) >= f) & (r < n_rounds)

        def deeper_body(carry):
            scale, _xs, _fs, _ress, r = carry
            scale = scale * (0.5**ls_batch)
            xs_n, fs_n, ress_n = trial_batch(scale)
            return scale, xs_n, fs_n, ress_n, r + 1

        _, xs, fs, ress, _ = lax.while_loop(
            deeper_cond,
            deeper_body,
            (jnp.asarray(1.0, dtype), xs, fs, ress,
             jnp.asarray(1, jnp.int32)),
        )
        dxs = xs - x[None, :]
        armijo = fs <= f + c1 * (dxs @ g)
        any_ok = jnp.any(armijo)
        idx = jnp.where(any_ok, jnp.argmax(armijo), jnp.argmin(fs))
        x_new, f_new = xs[idx], fs[idx]
        res_new = jax.tree_util.tree_map(lambda a: a[idx], ress)
        improved = f_new < f
        x_new = jnp.where(improved, x_new, x)
        f_new = jnp.where(improved, f_new, f)
        res_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(improved, a, b), res_new, res
        )
        g_new = lax.cond(
            need_grad,
            lambda: jnp.where(
                improved, grad_from_res(x_new, res_new), g
            ),
            lambda: g,
        )
        return x_new, f_new, res_new, g_new, improved

    def line_search(x, f, res, g, direction, need_grad):
        """Armijo backtracking along the projected path x(a)=clip(x+a*d).

        Value-only trials: the gradient (which may carry an expensive
        analytic adjoint, e.g. the GP likelihood's O(n^3) trace term) is
        evaluated ONCE at the accepted point, not per trial — and when the
        objective provides residuals, the accepted trial's factorization
        is reused so the forward is not recomputed either."""
        c1 = 1e-4

        def body(carry):
            alpha, _, _, _, it = carry
            x_new = clip(x + alpha * direction)
            f_raw, res_new = fun_and_res(x_new)
            f_new = _sanitize(f_raw)
            dx = x_new - x
            ok = f_new <= f + c1 * jnp.dot(g, dx)
            # degenerate step (projection killed the move) also terminates
            stuck = jnp.max(jnp.abs(dx)) <= xtol
            return (alpha * 0.5, x_new, f_new, res_new,
                    jnp.where(ok | stuck, max_ls + 1, it + 1))

        def cond(carry):
            return carry[4] < max_ls

        init = (jnp.asarray(1.0, dtype), x, f, res,
                jnp.asarray(0, jnp.int32))
        _, x_new, f_new, res_new, _ = lax.while_loop(cond, body, init)
        improved = f_new < f
        x_new = jnp.where(improved, x_new, x)
        f_new = jnp.where(improved, f_new, f)
        res_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(improved, a, b), res_new, res
        )
        g_new = lax.cond(
            need_grad,
            lambda: jnp.where(
                improved, grad_from_res(x_new, res_new), g
            ),
            lambda: g,
        )
        return x_new, f_new, res_new, g_new, improved

    def step(state):
        (x, f, res, g, s_hist, y_hist, rho, valid, head, it, _) = state
        direction = -_two_loop(g, s_hist, y_hist, rho, valid, head)
        # fall back to steepest descent if the direction is not a descent one
        descent = jnp.dot(direction, g) < 0
        direction = jnp.where(descent, direction, -g)

        ls = line_search_parallel if ls_batch > 1 else line_search
        need_grad = (
            jnp.asarray(True) if final_grad else ((it + 1) < max_iters)
        )
        x_new, f_new, res_new, g_new, improved = ls(
            x, f, res, g, direction, need_grad
        )
        g_new = jnp.where(jnp.isfinite(g_new), g_new, 0.0)

        s = x_new - x
        y = g_new - g
        sy = jnp.dot(s, y)
        good_pair = improved & (sy > 1e-10 * jnp.linalg.norm(s)
                                * jnp.linalg.norm(y))
        s_hist = jnp.where(good_pair, s_hist.at[head].set(s), s_hist)
        y_hist = jnp.where(good_pair, y_hist.at[head].set(y), y_hist)
        rho = jnp.where(good_pair, rho.at[head].set(
            1.0 / jnp.where(sy != 0, sy, 1.0)), rho)
        valid = jnp.where(good_pair, valid.at[head].set(True), valid)
        head = jnp.where(good_pair, (head + 1) % history, head)

        done = (~improved) | (proj_grad_norm(x_new, g_new) <= gtol)
        return (x_new, f_new, res_new, g_new, s_hist, y_hist, rho, valid,
                head, it + 1, done)

    def cond(state):
        it, done = state[9], state[10]
        return (it < max_iters) & (~done)

    init = (x0, f0, res0, g0, s_hist, y_hist, rho, valid,
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(False))
    final = lax.while_loop(cond, step, init)
    x, f = final[0], final[1]
    it, done = final[9], final[10]
    return LbfgsbResult(x=x, fun=f, n_iters=it, converged=done,
                        res=final[2])


def minimize_tr(
    x0: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    *,
    fun_and_res: Callable,
    grad_from_res: Callable,
    max_iters: int = 50,
    history: int = 8,
    delta0: float = 0.25,
    delta_max: float = 4.0,
    gtol: float = 1e-8,
    final_grad: bool = False,
) -> LbfgsbResult:
    """Box-constrained trust-region L-BFGS: exactly ONE objective forward
    per iteration (accepted or not), gradient only on acceptance.

    The Armijo backtracking in ``minimize_lbfgsb`` pays one full forward
    per trial — measured ~3 trials/iteration on the n=10k GP polish
    (tools/prof_r3b.py phase split: 0.47 s for 2 polish iterations whose
    gradients are ~10 ms stochastic-trace evaluations, i.e. the polish is
    line-search-trial dominated, ROADMAP perf item 2). Here the step is
    the L-BFGS direction CLIPPED to an adaptive trust radius, evaluated
    once, and the radius is updated from the actual-vs-first-order
    predicted reduction:

        ratio > 0.75 and the step hit the radius -> delta *= 2
        ratio < 0.25                             -> delta *= 0.25

    Rejected steps (f_trial >= f) shrink the radius and retry from the
    same point — one forward, like a single line-search halving, but the
    radius persists ACROSS iterations so the solver does not re-discover
    the step scale every iteration (the classic TR economy; no reference
    equivalent — the reference's COBYLA is itself a trust-region method
    but derivative-free, paying a full likelihood per simplex probe,
    crates/gp/src/optimization.rs:26-71).

    Semantics shared with ``minimize_lbfgsb``: objective given as
    ``fun_and_res``/``grad_from_res`` (factorization reuse), non-finite
    values treated as +inf, (s, y) curvature pairs accepted only when
    sy > 0 holds meaningfully, ``final_grad=False`` skips the wasted
    last-iteration adjoint. ``delta0``/``delta_max`` are in the solver's
    variable space (log10-theta for the GP fit — 0.25 ~ a 1.8x theta
    move, ample for a warm-started polish).
    """
    d = x0.shape[0]
    dtype = x0.dtype

    def clip(x):
        return jnp.clip(x, lower, upper)

    x0 = clip(x0)
    f0, res0 = fun_and_res(x0)
    f0 = _sanitize(f0)
    g0 = grad_from_res(x0, res0)
    g0 = jnp.where(jnp.isfinite(g0), g0, 0.0)

    s_hist = jnp.zeros((history, d), dtype)
    y_hist = jnp.zeros((history, d), dtype)
    rho = jnp.zeros((history,), dtype)
    valid = jnp.zeros((history,), bool)

    def proj_grad_norm(x, g):
        pg = jnp.where((x <= lower) & (g > 0), 0.0, g)
        pg = jnp.where((x >= upper) & (pg < 0), 0.0, pg)
        return jnp.max(jnp.abs(pg))

    def step(state):
        (x, f, res, g, s_hist, y_hist, rho, valid, head, delta, it,
         _) = state
        direction = -_two_loop(g, s_hist, y_hist, rho, valid, head)
        descent = jnp.dot(direction, g) < 0
        direction = jnp.where(descent, direction, -g)

        dnorm = jnp.linalg.norm(direction)
        scale = jnp.minimum(1.0, delta / jnp.maximum(dnorm, 1e-30))
        x_new = clip(x + scale * direction)
        s = x_new - x
        snorm = jnp.linalg.norm(s)

        f_raw, res_new = fun_and_res(x_new)
        f_new = _sanitize(f_raw)
        pred = -jnp.dot(g, s)  # first-order predicted decrease (>= 0)
        ratio = (f - f_new) / jnp.maximum(pred, 1e-30)

        at_radius = snorm >= 0.99 * delta
        grow = (ratio > 0.75) & at_radius
        shrink = ratio < 0.25
        delta = jnp.where(
            grow, jnp.minimum(delta * 2.0, delta_max),
            jnp.where(shrink, delta * 0.25, delta),
        )

        improved = f_new < f
        x_new = jnp.where(improved, x_new, x)
        f_new = jnp.where(improved, f_new, f)
        res_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(improved, a, b), res_new, res
        )
        need_grad = (
            jnp.asarray(True) if final_grad else ((it + 1) < max_iters)
        )
        g_new = lax.cond(
            need_grad & improved,
            lambda: grad_from_res(x_new, res_new),
            lambda: g,
        )
        g_new = jnp.where(jnp.isfinite(g_new), g_new, 0.0)

        y = g_new - g
        sy = jnp.dot(s, y)
        good_pair = improved & (sy > 1e-10 * snorm * jnp.linalg.norm(y))
        s_hist = jnp.where(good_pair, s_hist.at[head].set(s), s_hist)
        y_hist = jnp.where(good_pair, y_hist.at[head].set(y), y_hist)
        rho = jnp.where(good_pair, rho.at[head].set(
            1.0 / jnp.where(sy != 0, sy, 1.0)), rho)
        valid = jnp.where(good_pair, valid.at[head].set(True), valid)
        head = jnp.where(good_pair, (head + 1) % history, head)

        # a dead radius or a converged projected gradient terminates; a
        # rejected step does NOT (the shrunken radius retries next iter)
        done = (delta < 1e-10) | (
            improved & (proj_grad_norm(x_new, g_new) <= gtol)
        )
        return (x_new, f_new, res_new, g_new, s_hist, y_hist, rho, valid,
                head, delta, it + 1, done)

    def cond(state):
        it, done = state[10], state[11]
        return (it < max_iters) & (~done)

    init = (x0, f0, res0, g0, s_hist, y_hist, rho, valid,
            jnp.asarray(0, jnp.int32), jnp.asarray(delta0, dtype),
            jnp.asarray(0, jnp.int32), jnp.asarray(False))
    final = lax.while_loop(cond, step, init)
    return LbfgsbResult(x=final[0], fun=final[1], n_iters=final[10],
                        converged=final[11], res=final[2])


def multistart_minimize(fun, x0s, lower, upper, **kw):
    """vmapped multistart: x0s (k, d) -> best (x, f) across starts.

    This is the TPU replacement for the reference's rayon par_iter-reduce
    multistart (gp/src/algorithm.rs:927-945): all starts advance in lockstep
    as one batched program on-chip.
    """
    res = jax.vmap(lambda x0: minimize_lbfgsb(fun, x0, lower, upper, **kw))(
        x0s
    )
    best = jnp.argmin(res.fun)
    return res.x[best], res.fun[best], res
