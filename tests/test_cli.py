"""End-to-end CLI tests (in-process) on the synthetic preset.

The CLI is the user-facing replacement for the reference's script pairs
(train.py, evel_*.py, hvg_*.py); this exercises the full
hvg -> train -> eval -> predict flow with no real data.
"""

import json
import os

import numpy as np
import pytest

from mclstexp_tpu.cli.main import main

pytestmark = pytest.mark.slow


def _flags(tmp_path, extra):
    return [
        "--dataset", "synthetic",
        "--checkpoint-dir", str(tmp_path / "model_result"),
        "--patch-cache", str(tmp_path / "patch_cache"),
    ] + extra


def test_cli_full_flow(tmp_path):
    # hvg: preprocessed matrices in the reference genes x spots layout
    rc = main(["hvg", "--dataset", "synthetic", "--out", str(tmp_path / "pre"),
               "--checkpoint-dir", str(tmp_path / "model_result"),
               "--patch-cache", str(tmp_path / "patch_cache")])
    assert rc == 0
    mats = []
    for root, _, files in os.walk(tmp_path / "pre"):
        mats += [os.path.join(root, f) for f in files if f == "preprocessed_matrix.npy"]
    assert len(mats) == 3
    m = np.load(mats[0])
    assert m.shape[0] < m.shape[1]  # genes x spots

    # train one fold, 1 epoch
    rc = main(["train", "--fold", "0", "--max_epochs", "1"] + _flags(tmp_path, []))
    assert rc == 0
    log = (tmp_path / "model_result" / "train_log.jsonl").read_text()
    assert "epoch_loss" in log
    ckpts = list((tmp_path / "model_result").rglob("best_0"))
    assert len(ckpts) == 1

    # train the remaining folds so full-protocol eval has all checkpoints
    for fold in ("1", "2"):
        rc = main(["train", "--fold", fold, "--max_epochs", "1"] + _flags(tmp_path, []))
        assert rc == 0

    # eval: full LOO protocol, metrics JSON
    out_json = tmp_path / "results.json"
    rc = main(["eval", "--json", str(out_json)] + _flags(tmp_path, []))
    assert rc == 0
    results = json.loads(out_json.read_text())
    for k in ("heg_pcc", "hvg_pcc", "mse", "mae"):
        assert np.isfinite(results["avg"][k])

    # --device-metrics: same protocol, fold bundles reduced on-device
    # (fp32, 4-scalar readback) — must agree with the fp64 host path
    dev_json = tmp_path / "results_dev.json"
    rc = main(["eval", "--device-metrics", "--json", str(dev_json)]
              + _flags(tmp_path, []))
    assert rc == 0
    dev_results = json.loads(dev_json.read_text())
    for k in ("heg_pcc", "hvg_pcc", "mse", "mae"):
        np.testing.assert_allclose(
            dev_results["avg"][k], results["avg"][k], rtol=1e-4, atol=1e-5,
            err_msg=f"--device-metrics diverged on {k}")

    # predict: one section's expression from its fold checkpoint
    ckpt_dir = str(ckpts[0])
    out_npy = tmp_path / "pred.npy"
    rc = main(["predict", "--fold", "0", "--checkpoint", ckpt_dir,
               "--out", str(out_npy)] + _flags(tmp_path, []))
    assert rc == 0
    pred = np.load(out_npy)
    assert pred.ndim == 2 and np.isfinite(pred).all()


def test_cli_unknown_dataset():
    import pytest

    with pytest.raises(SystemExit):  # argparse choices reject it
        main(["train", "--dataset", "nope"])


def test_cli_baseline_checkpoint_roundtrip(tmp_path, capsys):
    """baseline trains + saves a checkpoint (the reference's Lightning
    save_checkpoint analog), then --load-checkpoint skips training and
    reproduces the exact same eval metrics."""
    import json as _json

    args = _flags(tmp_path, ["--baseline", "histogene", "--fold", "0",
                             "--max_epochs", "2", "--patch-size", "16",
                             "--batch_size", "8"])
    def last_json(out):
        # stdout = MetricLogger jsonl lines + one indent=2 result block
        idx = out.rfind("\n{\n")
        return _json.loads(out[idx:] if idx >= 0 else out)

    rc = main(["baseline"] + args)
    assert rc == 0
    trained = last_json(capsys.readouterr().out)
    ckpt_dir = tmp_path / "model_result" / "baselines" / "histogene" / "best_0"
    assert ckpt_dir.exists()

    rc = main(["baseline", "--load-checkpoint", str(ckpt_dir)] + args)
    assert rc == 0
    restored = last_json(capsys.readouterr().out)
    assert restored == trained
