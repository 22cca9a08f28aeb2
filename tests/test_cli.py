"""CLI pipelines (reference dglgo: recipe/configure/train/export/apply)."""
import json
import runpy

import numpy as np
import pytest

from dgl_tpu.cli import main


def test_recipe_and_configure(capsys):
    main(["recipe", "list"])
    names = capsys.readouterr().out.split()
    assert len(names) >= 4
    main(["configure", "nodepred", "--model", "gcn", "--dataset", "cora"])
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["pipeline"] == "nodepred" and cfg["model"] == "gcn"


def test_export_run_apply_roundtrip(tmp_path, capsys):
    """export generates a standalone script; running it trains + saves a
    checkpoint; apply loads the checkpoint and writes predictions
    (reference dglgo export_cli.py / apply_cli.py workflow)."""
    cfg = {"pipeline": "nodepred", "model": "gcn", "dataset": "cora",
           "epochs": 12, "lr": 1e-2, "hidden": 16}
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(json.dumps(cfg))
    script = tmp_path / "gen.py"
    ck = tmp_path / "ck.npz"
    main(["export", "--cfg", str(cfgp), "--output", str(script),
          "--checkpoint", str(ck)])
    assert "standalone script" in capsys.readouterr().out
    runpy.run_path(str(script), run_name="__main__")
    assert ck.exists()
    out = tmp_path / "preds.npy"
    main(["apply", "--checkpoint", str(ck), "--model", "gcn",
          "--dataset", "cora", "--output", str(out)])
    assert "predictions" in capsys.readouterr().out
    preds = np.load(out)
    assert preds.shape == (2708,)
    assert preds.dtype.kind in "iu"


def test_export_rejects_other_pipelines(tmp_path):
    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(json.dumps({"pipeline": "linkpred"}))
    with pytest.raises(SystemExit):
        main(["export", "--cfg", str(cfgp), "--output",
              str(tmp_path / "x.py")])
