"""CLI entry-point test: python train.py --config <json> end-to-end
(reference train.py:18-71 wiring)."""

import json
import os
import sys


def test_train_cli_main(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = {
        "exp_name": "mnist_digit",
        "loss_function": "ELBO",
        "prior": "standard_gaussian",
        "inner_activation": "leaky_relu",
        "n_mixtures": 3,
        "n_MC_samples": 2,
        "load_model": 1,
        "load_dir": "default",
        "num_epochs": 1,
        "sg_pretraining": 0,
        "kernel_size": 3,
        "learning_rate_ae": 3e-4,
        "batch_size": 64,
        "dim_input_x": 28,
        "dim_input_y": 28,
        "dim_input_channel": 1,
        "code_size": 8,
        "representation_size": 2,
        "TRAIN_VAE": 1,
        "TRAIN_sigma": 1,
        "TRAIN_prior": 0,
        "sigma": 0.5,
        "num_hidden_units": 64,
        "num_hidden_units_inner_VAE": 16,
        "n_layers_inner_VAE": 2,
        "synthetic_data": 1,
        "synthetic_n_train": 128,
        "synthetic_n_test": 256,
        "enable_plots": 0,
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    sys.path.insert(0, "/root/repo")
    import importlib

    train = importlib.import_module("train")
    train.main(["--config", str(cfg_path)])

    base = ("experiments/mnist_digit/batch-64/"
            "prior-standard_gaussian-64-8-2-leaky_relu-2-mixture-3")
    assert os.path.isfile(os.path.join(
        base, "result", "mnist_digit-result.npz"))
    assert os.path.isfile(os.path.join(
        base, "checkpoint", "vae-model.msgpack"))
    # config snapshot saved
    snaps = [f for f in os.listdir(os.path.join(base, "checkpoint"))
             if f.startswith("training_config_")]
    assert snaps

    # the serving CLI picks the trained checkpoint up from the same config
    # (standard_gaussian prior: generation needs no GM fit) and writes both
    # npz keys ('x' for --reconstruct round-trips, 'sampled_images' for the
    # FID tooling)
    import numpy as np

    serve = importlib.import_module("serve")
    out_path = tmp_path / "gen.npz"
    rc = serve.main(["--config", str(cfg_path), "--serve-batch", "4",
                     "--generate", "4", "--out", str(out_path)])
    assert rc == 0
    z = np.load(out_path)
    assert z["x"].shape == (4, 28, 28, 1)
    np.testing.assert_array_equal(z["x"], z["sampled_images"])


def test_train_cli_bad_args(capsys):
    sys.path.insert(0, "/root/repo")
    import importlib

    train = importlib.import_module("train")
    try:
        train.main(["--config", "/nonexistent/cfg.json"])
    except SystemExit as e:
        assert e.code == 0
    out = capsys.readouterr().out
    assert "missing or invalid arguments" in out
