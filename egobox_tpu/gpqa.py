"""gpqa — offline GP quality assessment CLI.

Rebuild of the reference's gpqa crate (crates/gpqa/src/main.rs:28-125):
loads saved Gpx / SparseGpx model dumps and prints cross-validated quality
metrics (Q2, PVA, IAE_alpha) per model. The reference parallelizes metric
evaluation with rayon; here the fold-refits are vmapped masked fits
(moe/metrics.py).

Usage:
    gpqa model1.json model2.bin ... [--kfold K]
"""

from __future__ import annotations

import argparse
import sys


def _gp_expert_xy(e):
    """Reconstruct one dense GP expert's training data from its own
    state via the GLS identity y_norm = F beta + R gamma
    (= F beta + L L^T gamma) — exact, so recorder dumps carry their
    training sets implicitly."""
    import jax.numpy as jnp
    import numpy as np

    from .gp.trends import trend_basis

    keep = np.asarray(e.mask)
    x_norm = jnp.asarray(e.x_norm)
    x = np.asarray(x_norm * e.x_std + e.x_mean)[keep]
    fx = trend_basis(e.trend, x_norm)
    y_norm = fx @ e.beta + e.r_chol @ (e.r_chol.T @ e.gamma)
    y = np.asarray(y_norm * e.y_std + e.y_mean)[keep]
    return x, y


def _gp_expert_entry(e, label):
    from .moe.metrics import gp_fit_predict

    x, y = _gp_expert_xy(e)
    kpls_dim = None if e.w_star is None else int(e.w_star.shape[1])
    hook = gp_fit_predict(
        corr=e.corr, trend=e.trend, kpls_dim=kpls_dim, n_start=3,
        seed=0, max_iters=20,
    )
    return (label, x, y, hook)


def _load_recorder(path: str):
    """Load an EGOR_USE_GP_RECORDER dump written by
    ego/recorders.record_gp_models and reconstruct each recorded
    surrogate's training data from its own state, so the reference
    workflow EGOR_USE_GP_RECORDER=1 run -> `gpqa egor_gp_models.bin`
    connects end-to-end (ref: crates/gpqa/src/main.rs:28-41, which loads
    any Vec<Box<dyn MixtureGpSurrogate>> from the bincode dumps). Two
    payload shapes exist, matching ego/solver._train: the batched dense
    GpModel pytree (single-cluster fast path) and a tuple of MoeModel
    pytrees (clustered / multi-combo path) — the latter yields one entry
    per (output, expert) pair. Returns a list of
    (label, x, y, fit_predict_hook) or None if the file is not a
    recorder dump."""
    import pickle

    import jax

    from .gp.gp import GpModel
    from .moe.moe import MoeModel

    try:
        with open(path, "rb") as f:
            payload = pickle.load(f)
    except Exception:
        return None

    def _out_label(k):
        return "objective" if k == 0 else f"constraint_{k - 1}"

    if isinstance(payload, GpModel):
        m = payload.theta.shape[0]
        return [
            _gp_expert_entry(
                jax.tree_util.tree_map(lambda a, _k=k: a[_k], payload),
                _out_label(k),
            )
            for k in range(m)
        ]

    if (
        isinstance(payload, (tuple, list))
        and payload
        and all(isinstance(p, MoeModel) for p in payload)
    ):
        out = []
        for k, mix in enumerate(payload):
            base = _out_label(k)
            multi = len(mix.experts) > 1
            for j, e in enumerate(mix.experts):
                if not isinstance(e, GpModel):
                    # sparse experts hold inducing points, not training
                    # rows — nothing to cross-validate against
                    continue
                label = f"{base}/expert_{j}" if multi else base
                out.append(_gp_expert_entry(e, label))
        return out

    return None


def assess(path: str, kfold=None):
    from .api import Gpx, SparseGpx
    from .moe.metrics import iae_alpha_with_plot, pva_score, q2_score

    try:
        gpx = Gpx.load(path)
        kind = "Gpx"
    except Exception:
        gpx = SparseGpx.load(path)
        kind = "SparseGpx"

    x, y = gpx.training_data()
    n = x.shape[0]
    kfold = kfold or min(n, 10)

    if kind == "Gpx":
        fp = gpx._fit_predict_hook()
    else:
        # vmapped batched protocol: ALL SGP fold-refits run as one
        # program (moe/metrics.sgp_fit_predict; the reference refits
        # sequentially, moe/src/metrics.rs)
        from .moe.metrics import sgp_fit_predict

        model = gpx._model
        fp = sgp_fit_predict(
            corr=model.corr, method=model.method,
            n_inducing=model.z.shape[0],
        )

    return _metrics(path, kind, x, y, fp, kfold)


def _metrics(label, kind, x, y, fp, kfold):
    from .moe.metrics import iae_alpha_with_plot, pva_score, q2_score

    q2 = q2_score(x, y, fp, kfold)
    pva = pva_score(x, y, fp, kfold)
    iae, alphas, coverage = iae_alpha_with_plot(x, y, fp, kfold)

    return {
        "file": label,
        "kind": kind,
        "n": x.shape[0],
        "kfold": kfold,
        "q2": q2,
        "pva": pva,
        "iae_alpha": iae,
        "alphas": alphas,
        "coverage": coverage,
    }


def assess_all(path: str, kfold=None):
    """One result per model in the file: recorder dumps hold the whole
    surrogate set (objective + constraints); Gpx/SparseGpx saves hold
    one."""
    recorded = _load_recorder(path)
    if recorded is not None:
        results = []
        for label, x, y, hook in recorded:
            kf = kfold or min(x.shape[0], 10)
            results.append(
                _metrics(f"{path}:{label}", "EgorGP", x, y, hook, kf)
            )
        return results
    return [assess(path, kfold)]


def print_coverage_table(alphas, coverage, out=None):
    """Per-alpha coverage table (ref: gpqa/src/main.rs:44-60)."""
    out = out or sys.stdout
    print("\nIAEα plot data for first GP model:", file=out)
    print("Alpha | Empirical coverage | Target coverage | Delta", file=out)
    print("---------------------------------------------------", file=out)
    for a, c in zip(alphas, coverage):
        print(
            f"{a * 100.0:5.2f}% |       {c * 100.0:5.2f}%      |"
            f"     {(1.0 - a) * 100.0:5.2f}%    |"
            f" {abs(c - (1.0 - a)) * 100.0:5.2f}%",
            file=out,
        )
    print(file=out)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="gpqa", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("models", nargs="+", help="saved model files")
    parser.add_argument("--kfold", type=int, default=None,
                        help="CV folds (default min(n, 10))")
    args = parser.parse_args(argv)

    header = (
        f"{'model':<32} {'kind':<10} {'n':>5} {'Q2':>8} {'PVA':>8} "
        f"{'IAE_a':>8}"
    )
    print(header)
    print("-" * len(header))
    rc = 0
    first = True
    for path in args.models:
        try:
            for r in assess_all(path, args.kfold):
                print(
                    f"{r['file']:<32} {r['kind']:<10} {r['n']:>5} "
                    f"{r['q2']:>8.4f} {r['pva']:>8.4f} "
                    f"{r['iae_alpha']:>8.4f}"
                )
                if first:
                    # per-alpha coverage table for the first model, like
                    # the reference CLI (gpqa/src/main.rs:41-60)
                    print_coverage_table(r["alphas"], r["coverage"])
                    first = False
        except Exception as e:  # pragma: no cover
            print(f"{path:<32} ERROR: {e}", file=sys.stderr)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
