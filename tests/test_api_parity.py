"""API-parity sweep against the reference's generated stub
(/root/reference/python/egobox/egobox.pyi — signatures restated here so the
test is self-contained).

Every public class/function/enum of the reference Python API must exist with
compatible kwargs and defaults. Extra kwargs on our side (supersets) are
allowed; missing or differently-defaulted ones are failures.
"""

import inspect

import numpy as np
import pytest

import egobox_tpu as egx


def _params(fn):
    return inspect.signature(fn).parameters


def _assert_accepts(fn, names, where):
    p = _params(fn)
    missing = [n for n in names if n not in p]
    assert not missing, f"{where} missing kwargs: {missing}"


def _assert_defaults(fn, defaults: dict, where):
    p = _params(fn)
    for name, want in defaults.items():
        got = p[name].default
        assert got == want, f"{where}({name}) default {got!r} != {want!r}"


def test_egor_ctor_signature():
    # pyi:123
    _assert_accepts(
        egx.Egor.__init__,
        ["xspecs", "gp_config", "n_cstr", "cstr_tol", "n_start", "n_doe",
         "doe", "infill_strategy", "cstr_infill", "cstr_strategy",
         "q_points", "q_infill_strategy", "infill_optimizer", "trego",
         "coego_n_coop", "q_optmod", "target", "outdir", "warm_start",
         "hot_start", "seed"],
        "Egor",
    )
    _assert_defaults(
        egx.Egor.__init__,
        {"n_cstr": 0, "cstr_tol": None, "n_start": 20, "n_doe": 0,
         "doe": None, "cstr_infill": False,
         "infill_strategy": egx.InfillStrategy.LOG_EI,
         "cstr_strategy": egx.ConstraintStrategy.MC,
         "q_points": 1, "q_infill_strategy": egx.QInfillStrategy.KB,
         "infill_optimizer": egx.InfillOptimizer.COBYLA,
         "trego": False, "coego_n_coop": 0, "q_optmod": 1,
         "outdir": None, "warm_start": False, "hot_start": None,
         "seed": None},
        "Egor",
    )


def test_egor_methods_signatures():
    # pyi:124 minimize(fun, fcstrs=[], max_iters=20, run_info=None)
    _assert_accepts(egx.Egor.minimize,
                    ["fun", "fcstrs", "max_iters", "run_info"],
                    "Egor.minimize")
    _assert_defaults(egx.Egor.minimize,
                     {"max_iters": 20, "run_info": None}, "Egor.minimize")
    # pyi:156/169/181
    _assert_accepts(egx.Egor.suggest, ["x_doe", "y_doe"], "Egor.suggest")
    _assert_accepts(egx.Egor.get_result_index, ["y_doe"],
                    "Egor.get_result_index")
    _assert_accepts(egx.Egor.get_result, ["x_doe", "y_doe"],
                    "Egor.get_result")


def test_gpmix_ctor_signature_and_defaults():
    # pyi:358 — default recombination is HARD (gp_mix.rs:95)
    _assert_accepts(
        egx.GpMix.__init__,
        ["regr_spec", "corr_spec", "kpls_dim", "n_clusters",
         "recombination", "theta_init", "theta_bounds", "n_start",
         "max_eval", "seed"],
        "GpMix",
    )
    _assert_defaults(
        egx.GpMix.__init__,
        {"kpls_dim": None, "n_clusters": 1,
         "recombination": egx.Recombination.HARD,
         "theta_init": None, "theta_bounds": None, "n_start": 10,
         "max_eval": 50, "seed": None},
        "GpMix",
    )
    # GpConfig (used by Egor) defaults match pyi GpConfig docs
    assert egx.GpConfig().recombination is egx.Recombination.HARD
    assert egx.GpConfig().n_clusters == 1
    assert egx.GpConfig().n_start == 10


def test_gpx_surface():
    # pyi:423-557
    for m in ("builder", "save", "load", "predict", "predict_var",
              "predict_gradients", "predict_var_gradients", "sample",
              "dims", "training_data", "thetas", "variances",
              "likelihoods"):
        assert hasattr(egx.Gpx, m), f"Gpx.{m} missing"
    _assert_accepts(egx.Gpx.sample, ["x", "n_traj"], "Gpx.sample")


def test_sparse_gpx_surface():
    # pyi:590-767
    _assert_accepts(
        egx.SparseGpMix.__init__,
        ["corr_spec", "theta_init", "theta_bounds", "kpls_dim", "n_start",
         "nz", "z", "method", "seed"],
        "SparseGpMix",
    )
    _assert_defaults(
        egx.SparseGpMix.__init__,
        {"theta_init": None, "theta_bounds": None, "kpls_dim": None,
         "n_start": 10, "nz": None, "z": None,
         "method": egx.SparseMethod.FITC, "seed": None},
        "SparseGpMix",
    )
    for m in ("builder", "save", "load", "predict", "predict_var",
              "predict_gradients", "predict_var_gradients", "sample",
              "thetas", "variances", "likelihoods"):
        assert hasattr(egx.SparseGpx, m), f"SparseGpx.{m} missing"


def test_runinfo_and_expected_optimum_fields():
    # pyi:578-587 RunInfo(fname, num=0), settable
    ri = egx.RunInfo("rosenbrock")
    assert ri.fname == "rosenbrock" and ri.num == 0
    ri.fname = "sphere"
    ri.num = 3
    assert (ri.fname, ri.num) == ("sphere", 3)
    # pyi:198-202 ExpectedOptimum.val / .tol
    eo = egx.ExpectedOptimum(-15.125, 1e-2)
    assert eo.val == -15.125 and eo.tol == 1e-2


def test_enum_members():
    assert {m.name for m in egx.InfillStrategy} >= {"EI", "WB2", "WB2S",
                                                    "LOG_EI"}
    assert {m.name for m in egx.QInfillStrategy} == {"KB", "KBLB", "KBUB",
                                                     "CLMIN"}
    assert {m.name for m in egx.ConstraintStrategy} == {"MC", "UTB"}
    assert {m.name for m in egx.InfillOptimizer} == {"COBYLA", "SLSQP"}
    assert {m.name for m in egx.XType} == {"FLOAT", "INT", "ORD", "ENUM"}
    assert len(list(egx.Sampling)) == 7
    # pyi:827-830 stubgen names are aliases of the canonical members
    assert egx.SparseMethod.Fitc is egx.SparseMethod.FITC
    assert egx.SparseMethod.Vfe is egx.SparseMethod.VFE
    # bitflags values (pyi:10-16, 570-575)
    assert int(egx.CorrelationSpec.ALL) == 15
    assert int(egx.RegressionSpec.ALL) == 7


def test_module_functions():
    _assert_accepts(egx.lhs, ["xspecs", "n_samples", "seed"], "lhs")
    _assert_accepts(egx.sampling, ["method", "xspecs", "n_samples", "seed"],
                    "sampling")


@pytest.fixture(scope="module")
def tiny_xy():
    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, (20, 2))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2
    return x, y


def test_gpx_save_returns_bool(tiny_xy, tmp_path):
    x, y = tiny_xy
    gpx = egx.Gpx.builder(n_start=2).fit(x, y)
    assert gpx.save(str(tmp_path / "m.json")) is True
    assert gpx.save("/nonexistent_dir_xyz/m.json") is False


def test_sparse_gpx_sample_and_save(tiny_xy, tmp_path):
    x, y = tiny_xy
    sgpx = egx.SparseGpx.builder(nz=8, n_start=2, seed=0).fit(x, y)
    traj = sgpx.sample(np.array([[0.1, 0.2], [0.5, 0.5], [0.9, 0.1]]), 5)
    assert traj.shape == (3, 5)
    assert np.all(np.isfinite(traj))
    # trajectories scatter around the posterior mean with prior-cov spread
    assert np.std(traj) > 0.0
    assert sgpx.save(str(tmp_path / "s.json")) is True
