"""gpqa CLI test (ref: crates/gpqa/src/main.rs — offline GP QA)."""

import numpy as np

import egobox_tpu as egx
from egobox_tpu.gpqa import main


def test_gpqa_cli(tmp_path, capsys):
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (30, 2))
    y = np.sin(3 * x[:, 0]) + x[:, 1]
    gpx = egx.Gpx.builder(n_start=3).fit(x, y)
    path = str(tmp_path / "model.json")
    gpx.save(path)

    rc = main([path, "--kfold", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Q2" in out and "PVA" in out
    assert "model.json" in out
    # Q2 column should be near 1 for this smooth function
    line = [ln for ln in out.splitlines() if "model.json" in ln][0]
    q2 = float(line.split()[-3])
    assert q2 > 0.9


def test_gpqa_cli_missing_file(capsys):
    rc = main(["/nonexistent/model.json"])
    assert rc == 1
