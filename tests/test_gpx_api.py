"""Python API parity tests (ref: python/egobox/tests/test_gpmix.py,
test_sgpmix.py, test_sampling.py)."""

import numpy as np
import pytest

import egobox_tpu as egx


@pytest.fixture(scope="module")
def gpx_1d():
    xt = np.array([[0.0, 1.0, 2.0, 3.0, 4.0]]).T
    yt = np.array([[0.0, 1.0, 1.5, 0.9, 1.0]]).T
    return egx.Gpx.builder().fit(xt, yt), xt, yt


def test_gpx_kriging(gpx_1d):
    """(ref: test_gpmix.py:30-52)"""
    gpx, xt, yt = gpx_1d
    assert abs(gpx.predict(np.array([[1.0]])).item() - 1.0) < 1e-6
    assert abs(gpx.predict_var(np.array([[1.0]])).item()) < 1e-6
    assert abs(gpx.predict(np.array([[1.1]])).item() - 1.1163) < 1e-3
    assert abs(gpx.predict_var(np.array([[1.1]])).item()) < 1e-3
    assert abs(
        gpx.predict_gradients(np.array([[1.1]])).item() - 1.1204
    ) < 1e-3
    assert abs(
        gpx.predict_var_gradients(np.array([[1.1]])).item() - 0.0145
    ) < 1e-3
    assert gpx.thetas().shape == (1, 1)
    assert gpx.variances().shape == (1,)
    assert gpx.likelihoods().shape == (1,)
    assert gpx.dims() == (1, 1)


def test_gpx_save_load(tmp_path, gpx_1d):
    """JSON + binary round-trip (ref: test_gpmix.py test_gpx_save_load)."""
    gpx, xt, yt = gpx_1d
    for name in ["gpdump.json", "gpdump.bin"]:
        path = str(tmp_path / name)
        gpx.save(path)
        loaded = egx.Gpx.load(path)
        xq = np.linspace(0, 4, 17)[:, None]
        np.testing.assert_allclose(
            loaded.predict(xq), gpx.predict(xq), rtol=1e-10
        )
        np.testing.assert_allclose(
            loaded.predict_var(xq), gpx.predict_var(xq), rtol=1e-8,
            atol=1e-12,
        )
        xdata, ydata = loaded.training_data()
        np.testing.assert_allclose(xdata, xt)
        np.testing.assert_allclose(ydata, yt[:, 0])


def test_gpx_1d_input_acceptance():
    """(ref: test_gpmix.py 1-D input acceptance)"""
    xt = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    yt = np.array([0.0, 1.0, 1.5, 0.9, 1.0])
    gpx = egx.Gpx.builder().fit(xt, yt)
    assert abs(gpx.predict(np.array([1.0])).item() - 1.0) < 1e-6


def test_gpx_multioutput_rejected():
    with pytest.raises(ValueError):
        egx.Gpx.builder().fit(np.zeros((5, 1)), np.zeros((5, 2)))


def test_gpx_fixed_theta_nstart_negative():
    """n_start=-1 -> fixed theta (ref: test_gpmix.py fixed-theta test)."""
    xt = np.array([[0.0, 1.0, 2.0, 3.0, 4.0]]).T
    yt = np.array([0.0, 1.0, 1.5, 0.9, 1.0])
    gpx = egx.Gpx.builder(n_start=-1, theta_init=[0.37]).fit(xt, yt)
    np.testing.assert_allclose(gpx.thetas(), [[0.37]])


def test_gpx_metrics(gpx_1d):
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (30, 2))
    y = np.sin(3 * x[:, 0]) + x[:, 1]
    gpx = egx.Gpx.builder(n_start=3).fit(x, y)
    assert gpx.q2(kfold=5) > 0.9


def test_sparse_gpx_api(tmp_path):
    """(ref: test_sgpmix.py)"""
    rng = np.random.RandomState(42)
    n = 150
    xt = np.sort(rng.uniform(0, 4 * np.pi, (n, 1)), axis=0)
    f = np.sin(xt[:, 0])
    yt = (f + rng.normal(0, 0.1, n))[:, None]

    sgp = egx.SparseGpx.builder(nz=30, method=egx.SparseMethod.VFE,
                                seed=0).fit(xt, yt)
    pred = sgp.predict(xt)
    assert np.sqrt(np.mean((pred - f) ** 2)) < 0.1
    assert abs(sgp.noise_variances()[0] - 0.01) < 0.02
    assert sgp.inducings().shape == (30, 1)

    # located inducings
    z = np.linspace(0, 4 * np.pi, 25)[:, None]
    sgp2 = egx.SparseGpx.builder(z=z).fit(xt, yt)
    np.testing.assert_allclose(sgp2.inducings(), z)

    # save/load round trip
    path = str(tmp_path / "sgp.json")
    sgp.save(path)
    loaded = egx.SparseGpx.load(path)
    np.testing.assert_allclose(loaded.predict(xt), pred, rtol=1e-10)


def test_sampling_api():
    """(ref: test_sampling.py)"""
    xlimits = [[0.0, 25.0], [-10.0, 10.0]]
    x = egx.lhs(xlimits, 10, seed=42)
    assert x.shape == (10, 2)
    assert np.all(x[:, 0] >= 0) and np.all(x[:, 0] <= 25)

    x2 = egx.sampling(egx.Sampling.FULL_FACTORIAL, xlimits, 9)
    assert x2.shape == (9, 2)
    x3 = egx.sampling(egx.Sampling.RANDOM, xlimits, 5, seed=0)
    assert x3.shape == (5, 2)
    x4 = egx.sampling(egx.Sampling.LHS_MAXIMIN, xlimits, 8, seed=1)
    assert x4.shape == (8, 2)


def test_sampling_mixint():
    """Mixed-integer sampling folds ENUM and snaps INT
    (ref: sampling.rs MixintContext path)."""
    xspecs = [
        egx.XSpec(egx.XType.FLOAT, [0.0, 1.0]),
        egx.XSpec(egx.XType.INT, [0, 5]),
        egx.XSpec(egx.XType.ENUM, tags=["a", "b", "c"]),
    ]
    x = egx.lhs(xspecs, 12, seed=3)
    assert x.shape == (12, 3)
    assert np.allclose(x[:, 1], np.round(x[:, 1]))  # INT snapped
    assert set(np.unique(x[:, 2])).issubset({0.0, 1.0, 2.0})  # ENUM folded
