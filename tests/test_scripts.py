"""Smoke tests for the utility scripts."""

import json
import os
import sys

import numpy as np


def test_sweep_gmm_script(tmp_path, monkeypatch, capsys):
    from tests.conftest import make_config

    cfg = make_config(prior="ours", num_epochs=1, sg_pretraining=0,
                      n_MC_samples=2, num_hidden_units=64,
                      num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2,
                      synthetic_n_train=128, synthetic_n_test=128,
                      batch_size=64, enable_plots=0, load_model=0)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "sweep_gmm.py", "-c", str(cfg_path), "--mixtures", "3",
        "--epochs", "1"])

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "sweep_gmm", "/root/repo/scripts/sweep_gmm.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith('{"sweep"')][-1]
    result = json.loads(line)["sweep"]
    assert result[0]["n_mixtures"] == 3
    assert np.isfinite(result[0]["final_val_loss"])


def test_prepare_celeba_script(tmp_path, monkeypatch):
    from PIL import Image

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(6):
        arr = rng.integers(0, 256, (40, 32, 3)).astype("uint8")
        Image.fromarray(arr).save(str(img_dir / f"{i:03d}.jpg"))

    out_dir = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "prepare_celeba.py", "--images", str(img_dir), "--out", str(out_dir),
        "--size", "16", "--n-train", "4", "--n-val", "1"])
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "prepare_celeba", "/root/repo/scripts/prepare_celeba.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()

    from ladder_tpu.data.tfrecord import ImageRecordReader
    r = ImageRecordReader(str(out_dir / "celebA_train.tfrecords"), (16, 16, 3))
    assert len(r) == 4
    assert r.read(0).shape == (16, 16, 3)
    r.close()
    r2 = ImageRecordReader(str(out_dir / "celebA_test.tfrecords"), (16, 16, 3))
    assert len(r2) == 1
    r2.close()
