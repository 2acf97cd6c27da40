"""User-facing API mirroring the egobox Python bindings.

Parity surface (ref: python/src/{gp_mix.rs,sparse_gp_mix.rs,sampling.rs,
gp_config.rs} and the generated egobox.pyi):

- ``Gpx.builder(...).fit(xt, yt)`` -> Gpx with predict / predict_var /
  predict_gradients / predict_var_gradients / sample / save / load / dims /
  training_data / thetas / variances / likelihoods
- ``SparseGpx.builder(...)`` == SparseGpMix
- ``lhs(xspecs, n_samples, seed)`` and ``sampling(method, xspecs, n, seed)``
  (mixed-integer aware)

Conventions preserved: n_clusters >0 fixed / 0 auto / <0 automax(-n)
(gp_mix.rs:197-201); n_start < 0 means fixed theta (gp_mix.rs:202-208);
1-D inputs accepted, multi-output rejected (gp_mix.rs:140-236).
"""

from __future__ import annotations

import json
import pickle
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .doe.lhs import LhsKind, Lhs as _Lhs
from .doe.full_factorial import FullFactorial as _FullFactorial
from .doe.random import Random as _Random
from .ego.mixint import MixintContext, parse_xspecs
from .gp.gp import GpModel
from .gp.sgp import (
    SgpModel,
    fit_sgp,
    sgp_predict,
    sgp_predict_gradients,
    sgp_predict_valvar,
    sgp_predict_var,
    sgp_predict_var_gradients,
)
from .moe.gaussian_mixture import GaussianMixture
from .moe.metrics import iae_alpha_score, pva_score, q2_score
from .moe.moe import GpMixture, train_moe
from .types import (
    CorrelationSpec,
    Recombination,
    RegressionSpec,
    Sampling,
    SparseMethod,
    correlation_spec_names,
    regression_spec_names,
)

_LHS_KIND = {
    Sampling.LHS: LhsKind.OPTIMIZED,
    Sampling.LHS_CLASSIC: LhsKind.CLASSIC,
    Sampling.LHS_CENTERED: LhsKind.CENTERED,
    Sampling.LHS_MAXIMIN: LhsKind.MAXIMIN,
    Sampling.LHS_CENTERED_MAXIMIN: LhsKind.CENTERED_MAXIMIN,
}


def _as_xy(xt, yt):
    xt = np.asarray(xt, dtype=float)
    if xt.ndim == 1:
        xt = xt[:, None]
    yt = np.asarray(yt, dtype=float)
    if yt.ndim == 2:
        if yt.shape[1] != 1:
            raise ValueError(
                "multi-output training not supported (ref: Gpx rejects "
                f"multi-output), got {yt.shape[1]} outputs"
            )
        yt = yt[:, 0]
    return xt, yt


class GpMix:
    """GP mixture builder (ref: python/src/gp_mix.rs GpMix)."""

    def __init__(
        self,
        regr_spec: RegressionSpec = RegressionSpec.CONSTANT,
        corr_spec: CorrelationSpec = CorrelationSpec.SQUARED_EXPONENTIAL,
        kpls_dim: Optional[int] = None,
        n_clusters: int = 1,
        recombination: Recombination = Recombination.HARD,
        theta_init: Optional[Sequence[float]] = None,
        theta_bounds: Optional[Sequence[Sequence[float]]] = None,
        n_start: int = 10,
        max_eval: int = 50,
        seed: Optional[int] = None,
    ):
        self.regr_spec = regr_spec
        self.corr_spec = corr_spec
        self.kpls_dim = kpls_dim
        self.n_clusters = n_clusters
        self.recombination = recombination
        self.theta_init = theta_init
        self.theta_bounds = theta_bounds
        self.n_start = n_start
        self.max_eval = max_eval
        self.seed = seed if seed is not None else 42

    def fit(self, xt, yt) -> "Gpx":
        xt, yt = _as_xy(xt, yt)
        # n_start < 0 -> fixed theta at theta_init (gp_mix.rs:202-208)
        fixed = self.n_start < 0
        if fixed:
            from .gp.fit import fit_gp
            from .moe.gmm import fit_gmm
            from .moe.gaussian_mixture import from_gmm_x_marginal

            ti = self.theta_init if self.theta_init is not None else 0.1
            expert = fit_gp(
                jnp.asarray(xt), jnp.asarray(yt),
                corr=correlation_spec_names(self.corr_spec)[0],
                trend=regression_spec_names(self.regr_spec)[0],
                kpls_dim=self.kpls_dim, theta_init=ti, theta_fixed=True,
                seed=self.seed,
            )
            gmm = fit_gmm(
                jax.random.key(self.seed),
                jnp.asarray(np.hstack([xt, yt[:, None]])), 1,
            )
            mixture = GpMixture(
                [expert], from_gmm_x_marginal(gmm, xt.shape[1]),
                self.recombination,
            )
        else:
            mixture = train_moe(
                xt, yt,
                n_clusters=self.n_clusters,
                recombination=self.recombination,
                regr_names=regression_spec_names(self.regr_spec),
                corr_names=correlation_spec_names(self.corr_spec),
                kpls_dim=self.kpls_dim,
                n_start=self.n_start,
                seed=self.seed,
                theta_init=self.theta_init,
                theta_bounds=self.theta_bounds,
            )
        return Gpx(mixture, (xt, yt), builder=self)


class Gpx:
    """Trained GP mixture (ref: python/src/gp_mix.rs Gpx)."""

    def __init__(self, mixture: GpMixture, training_data, builder=None):
        self._mixture = mixture
        self._training = training_data
        self._builder = builder

    # -- construction ---------------------------------------------------

    @staticmethod
    def builder(**kwargs) -> GpMix:
        return GpMix(**kwargs)

    # -- prediction -----------------------------------------------------

    def predict(self, x) -> np.ndarray:
        return np.asarray(self._mixture.predict(self._x(x)))

    def predict_var(self, x) -> np.ndarray:
        return np.asarray(self._mixture.predict_var(self._x(x)))

    def predict_valvar(self, x):
        m, v = self._mixture.predict_valvar(self._x(x))
        return np.asarray(m), np.asarray(v)

    def predict_gradients(self, x) -> np.ndarray:
        return np.asarray(self._mixture.predict_gradients(self._x(x)))

    def predict_var_gradients(self, x) -> np.ndarray:
        return np.asarray(self._mixture.predict_var_gradients(self._x(x)))

    def sample(self, x, n_traj: int, seed: Optional[int] = None):
        key = jax.random.key(seed if seed is not None else 0)
        return np.asarray(self._mixture.sample(self._x(x), n_traj, key))

    def _x(self, x):
        x = np.asarray(x, dtype=float)
        if x.ndim == 1:
            x = x[:, None]
        return jnp.asarray(x)

    # -- introspection (ref: gp_mix.rs:242-496) --------------------------

    def dims(self):
        nx = self._training[0].shape[1]
        return (nx, 1)

    def training_data(self):
        return self._training

    def thetas(self) -> np.ndarray:
        return np.stack([np.asarray(e.theta) for e in self._mixture.experts])

    def variances(self) -> np.ndarray:
        return np.asarray(
            [float(e.sigma2) for e in self._mixture.experts]
        )

    def likelihoods(self) -> np.ndarray:
        return np.asarray(
            [float(e.likelihood) for e in self._mixture.experts]
        )

    def n_clusters(self) -> int:
        return self._mixture.n_clusters

    # -- QA metrics (ref: GpQualityAssurance, moe/src/metrics.rs) ---------

    def _fit_predict_hook(self):
        """Batched CV hook: all fold-fits run as one vmapped masked-fit
        program (moe/metrics.py gp_fit_predict)."""
        from .moe.metrics import gp_fit_predict

        b = self._builder or GpMix()
        return gp_fit_predict(
            corr=correlation_spec_names(b.corr_spec)[0],
            trend=regression_spec_names(b.regr_spec)[0],
            kpls_dim=b.kpls_dim, n_start=min(max(b.n_start, 1), 5),
            seed=b.seed, max_iters=20,
        )

    def q2(self, kfold: Optional[int] = None) -> float:
        x, y = self._training
        return q2_score(x, y, self._fit_predict_hook(), kfold)

    def pva(self, kfold: Optional[int] = None) -> float:
        x, y = self._training
        return pva_score(x, y, self._fit_predict_hook(), kfold)

    def iae_alpha(self, kfold: Optional[int] = None) -> float:
        x, y = self._training
        return iae_alpha_score(x, y, self._fit_predict_hook(), kfold)

    # -- persistence (ref: moe/src/algorithm.rs:509-525 json/bincode) ----

    def save(self, path: str) -> bool:
        """Returns True on success, False on failure
        (ref: egobox.pyi:442-453)."""
        try:
            payload = _serialize_mixture(self._mixture, self._training)
            if str(path).endswith(".json"):
                with open(path, "w") as f:
                    json.dump(payload, f)
            else:
                with open(path, "wb") as f:
                    pickle.dump(payload, f)
        except OSError:
            return False
        return True

    @staticmethod
    def load(path: str) -> "Gpx":
        if str(path).endswith(".json"):
            with open(path) as f:
                payload = json.load(f)
        else:
            with open(path, "rb") as f:
                payload = pickle.load(f)
        mixture, training = _deserialize_mixture(payload)
        return Gpx(mixture, training)

    def __repr__(self):
        return (
            f"Gpx(n_clusters={self._mixture.n_clusters}, "
            f"recombination={self._mixture.recombination.value}, "
            f"experts=[{', '.join(e.trend + '_' + e.corr for e in self._mixture.experts)}])"
        )

    __str__ = __repr__


def _arr(a):
    return np.asarray(a).tolist()


def _serialize_mixture(mix: GpMixture, training) -> dict:
    """Typed expert registry: every surrogate kind the mixture can hold
    serializes with a ``type`` tag — the JSON/pickle equivalent of the
    reference's typetag registry that covers dense AND sparse surrogates
    (crates/moe/src/surrogates.rs:266-422)."""
    from .gp.sgp import SgpModel

    experts = []
    for e in mix.experts:
        if isinstance(e, SgpModel):
            experts.append({
                "type": "sgp",
                "corr": e.corr,
                "method": e.method,
                "arrays": {
                    k: _arr(getattr(e, k))
                    for k in ("theta", "sigma2", "noise", "z", "w_vec",
                              "w_inv", "likelihood")
                },
                "w_star": None if e.w_star is None else _arr(e.w_star),
            })
            continue
        experts.append({
            "type": "gp",
            "corr": e.corr,
            "trend": e.trend,
            "arrays": {
                k: _arr(getattr(e, k))
                for k in ("x_norm", "x_mean", "x_std", "y_mean", "y_std",
                          "theta", "beta", "gamma", "r_chol", "ft",
                          "ft_qr_r", "sigma2", "likelihood", "mask")
            },
            "w_star": None if e.w_star is None else _arr(e.w_star),
        })
    g = mix.gmx
    return {
        "format": "egobox_tpu.GpMixture.v1",
        "recombination": mix.recombination.value,
        "experts": experts,
        "gmx": {
            "weights": _arr(g.weights),
            "means": _arr(g.means),
            "covariances": _arr(g.covariances),
            "precisions_chol": _arr(g.precisions_chol),
            "heaviside_factor": float(g.heaviside_factor),
        },
        "training": {
            "x": _arr(training[0]),
            "y": _arr(training[1]),
        },
    }


def _deserialize_mixture(payload: dict):
    from .gp.sgp import SgpModel

    experts = []
    for e in payload["experts"]:
        arrays = {
            k: jnp.asarray(v) for k, v in e["arrays"].items()
        }
        w_star = (
            None if e["w_star"] is None else jnp.asarray(e["w_star"])
        )
        # entries without a type tag predate the registry: dense GP
        if e.get("type", "gp") == "sgp":
            experts.append(SgpModel(
                w_star=w_star, corr=e["corr"], method=e["method"],
                **arrays,
            ))
            continue
        arrays["mask"] = arrays["mask"].astype(bool)
        experts.append(GpModel(
            w_star=w_star,
            corr=e["corr"],
            trend=e["trend"],
            **arrays,
        ))
    g = payload["gmx"]
    gmx = GaussianMixture(
        weights=jnp.asarray(g["weights"]),
        means=jnp.asarray(g["means"]),
        covariances=jnp.asarray(g["covariances"]),
        precisions_chol=jnp.asarray(g["precisions_chol"]),
        heaviside_factor=jnp.asarray(g["heaviside_factor"]),
    )
    mix = GpMixture(experts, gmx, Recombination(payload["recombination"]))
    training = (
        np.asarray(payload["training"]["x"]),
        np.asarray(payload["training"]["y"]),
    )
    return mix, training


# ---------------------------------------------------------------------------
# Sparse GP API (ref: python/src/sparse_gp_mix.rs)
# ---------------------------------------------------------------------------


class SparseGpMix:
    def __init__(
        self,
        corr_spec: CorrelationSpec = CorrelationSpec.SQUARED_EXPONENTIAL,
        theta_init=None,
        theta_bounds=None,
        kpls_dim: Optional[int] = None,
        n_start: int = 10,
        nz: Optional[int] = None,
        z=None,
        method: SparseMethod = SparseMethod.FITC,
        seed: Optional[int] = None,
        subsample_warmstart: Optional[int] = None,
    ):
        """``subsample_warmstart`` (extension, no reference counterpart):
        initialize theta from a budgeted dense-GP MLE on a k-row random
        subsample — at large n the joint (theta, sigma2, noise) SGP
        landscape is a basin lottery (measured n=50k: 2/4 raw
        multistarts collapsed into the all-noise optimum, Q2 < 0;
        gp/sgp.py fit_sgp). Recommended at n >= 10k: the bench recipe
        uses subsample_warmstart=2000 (tools/prof_sgp50k.py)."""
        self.corr_spec = corr_spec
        self.theta_init = theta_init
        self.theta_bounds = theta_bounds
        self.kpls_dim = kpls_dim
        self.n_start = n_start
        self.nz = nz
        self.subsample_warmstart = subsample_warmstart
        self.z = z
        self.method = method
        self.seed = seed if seed is not None else 0

    def fit(self, xt, yt) -> "SparseGpx":
        xt, yt = _as_xy(xt, yt)
        model = fit_sgp(
            jnp.asarray(xt), jnp.asarray(yt),
            corr=correlation_spec_names(self.corr_spec)[0],
            method="FITC" if self.method is SparseMethod.FITC else "VFE",
            n_inducing=self.nz if self.nz is not None else 10,
            z=self.z,
            theta_init=self.theta_init,
            theta_bounds=self.theta_bounds,
            kpls_dim=self.kpls_dim,
            n_start=self.n_start,
            seed=self.seed,
            subsample_warmstart=self.subsample_warmstart,
        )
        return SparseGpx(model, (xt, yt))


class SparseGpx:
    """Trained sparse GP (ref: python/src/sparse_gp_mix.rs SparseGpx)."""

    def __init__(self, model: SgpModel, training_data):
        self._model = model
        self._training = training_data

    @staticmethod
    def builder(**kwargs) -> SparseGpMix:
        return SparseGpMix(**kwargs)

    def predict(self, x) -> np.ndarray:
        return np.asarray(sgp_predict(self._model, self._x(x)))

    def predict_var(self, x) -> np.ndarray:
        return np.asarray(sgp_predict_var(self._model, self._x(x)))

    def predict_valvar(self, x):
        m, v = sgp_predict_valvar(self._model, self._x(x))
        return np.asarray(m), np.asarray(v)

    def predict_gradients(self, x) -> np.ndarray:
        return np.asarray(sgp_predict_gradients(self._model, self._x(x)))

    def predict_var_gradients(self, x) -> np.ndarray:
        return np.asarray(
            sgp_predict_var_gradients(self._model, self._x(x))
        )

    def sample(self, x, n_traj: int, seed: Optional[int] = None):
        """Sample GP trajectories -> array[nsamples, n_traj]
        (ref: egobox.pyi:733-744, sparse_algorithm.rs:338-361)."""
        from .gp.sgp import sgp_sample

        key = jax.random.key(seed if seed is not None else 0)
        return np.asarray(sgp_sample(self._model, self._x(x), n_traj, key))

    def _x(self, x):
        x = np.asarray(x, dtype=float)
        if x.ndim == 1:
            x = x[:, None]
        return jnp.asarray(x)

    def dims(self):
        return (self._training[0].shape[1], 1)

    def training_data(self):
        return self._training

    def thetas(self) -> np.ndarray:
        return np.asarray(self._model.theta)[None, :]

    def variances(self) -> np.ndarray:
        return np.asarray([float(self._model.sigma2)])

    def noise_variances(self) -> np.ndarray:
        return np.asarray([float(self._model.noise)])

    def likelihoods(self) -> np.ndarray:
        return np.asarray([float(self._model.likelihood)])

    def inducings(self) -> np.ndarray:
        return np.asarray(self._model.z)

    def save(self, path: str) -> bool:
        """Returns True on success, False on failure
        (ref: egobox.pyi:660-671)."""
        payload = {
            "format": "egobox_tpu.Sgp.v1",
            "corr": self._model.corr,
            "method": self._model.method,
            "arrays": {
                k: _arr(getattr(self._model, k))
                for k in ("theta", "sigma2", "noise", "z", "w_vec",
                          "w_inv", "likelihood")
            },
            "w_star": None if self._model.w_star is None
            else _arr(self._model.w_star),
            "training": {
                "x": _arr(self._training[0]),
                "y": _arr(self._training[1]),
            },
        }
        try:
            if str(path).endswith(".json"):
                with open(path, "w") as f:
                    json.dump(payload, f)
            else:
                with open(path, "wb") as f:
                    pickle.dump(payload, f)
        except OSError:
            return False
        return True

    @staticmethod
    def load(path: str) -> "SparseGpx":
        if str(path).endswith(".json"):
            with open(path) as f:
                payload = json.load(f)
        else:
            with open(path, "rb") as f:
                payload = pickle.load(f)
        arrays = {k: jnp.asarray(v) for k, v in payload["arrays"].items()}
        model = SgpModel(
            w_star=None if payload["w_star"] is None
            else jnp.asarray(payload["w_star"]),
            corr=payload["corr"],
            method=payload["method"],
            **arrays,
        )
        training = (
            np.asarray(payload["training"]["x"]),
            np.asarray(payload["training"]["y"]),
        )
        return SparseGpx(model, training)

    def __repr__(self):
        m = self._model
        return (
            f"SparseGpx(method={m.method}, corr={m.corr}, "
            f"theta={np.asarray(m.theta)}, variance={float(m.sigma2)}, "
            f"noise_variance={float(m.noise)})"
        )

    __str__ = __repr__


# ---------------------------------------------------------------------------
# sampling functions (ref: python/src/sampling.rs:11-88)
# ---------------------------------------------------------------------------


def sampling(method: Sampling, xspecs, n_samples: int,
             seed: Optional[int] = None) -> np.ndarray:
    """Mixed-integer-aware sampling in the folded (user) space."""
    specs = parse_xspecs(xspecs)
    ctx = MixintContext(specs)
    xlimits = ctx.continuous_xlimits()
    if method is Sampling.FULL_FACTORIAL:
        pts = _FullFactorial(xlimits).sample(n_samples)
    elif method is Sampling.RANDOM:
        pts = _Random(xlimits, seed=seed).sample(n_samples)
    else:
        pts = _Lhs(xlimits, kind=_LHS_KIND[method], seed=seed).sample(
            n_samples
        )
    pts = np.asarray(pts)
    if ctx.is_discrete:
        return ctx.fold(ctx.cast_continuous(pts))
    return pts


def lhs(xspecs, n_samples: int, seed: Optional[int] = None) -> np.ndarray:
    """Optimized (ESE) LHS, mixint-aware (ref: sampling.rs lhs)."""
    return sampling(Sampling.LHS, xspecs, n_samples, seed)
