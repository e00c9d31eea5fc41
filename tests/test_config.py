"""Config-system parity tests (reference codes/utils.py:11-124)."""

import json
import os

from ladder_tpu.utils.config import (
    apply_defaults,
    create_dirs,
    process_config,
    save_config,
)


def _write_cfg(tmp_path, **overrides):
    cfg = {
        "exp_name": "mnist_digit",
        "prior": "ours",
        "inner_activation": "leaky_relu",
        "n_mixtures": 50,
        "load_dir": "default",
        "batch_size": 256,
        "code_size": 8,
        "representation_size": 2,
        "num_hidden_units": 256,
        "n_layers_inner_VAE": 5,
    }
    cfg.update(overrides)
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_derived_dirs_match_reference_scheme(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = process_config(_write_cfg(tmp_path))
    base = "./experiments/mnist_digit/batch-256"
    name = "prior-ours-256-8-2-leaky_relu-5-mixture-50"
    assert cfg["result_dir"] == os.path.join(base, name, "result/")
    assert cfg["checkpoint_dir"] == os.path.join(base, name, "checkpoint/")
    assert cfg["summary_dir"] == os.path.join(base, name, "summary/")


def test_load_dir_branch(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = process_config(_write_cfg(tmp_path, load_dir="./pretrained_models/"))
    assert cfg["checkpoint_dir"] == "./pretrained_models/mnist_digit"
    assert cfg["result_dir"] == "./figures/mnist_digit/result/"


def test_reference_configs_load():
    """Our processing accepts the reference's JSON configs byte-for-byte."""
    for name in ["mnist_digit_config.json", "mnist_fashion_config.json",
                 "celeba_config.json"]:
        path = os.path.join("/root/reference/codes", name)
        cfg = process_config(path)
        assert "checkpoint_dir" in cfg and "result_dir" in cfg
        assert cfg["n_MC_samples"] == 100


def test_save_config_and_dirs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = process_config(_write_cfg(tmp_path))
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
    assert os.path.isdir(cfg["checkpoint_dir"])
    f = save_config(cfg)
    assert os.path.isfile(f)
    assert json.load(open(f))["exp_name"] == "mnist_digit"


def test_defaults_fill_missing_keys():
    cfg = apply_defaults({"exp_name": "x", "prior": "standard_gaussian"})
    assert cfg["TRAIN_decoded_z_std"] == 0
    assert cfg["latent_variance_precision"] == 1e-3


def test_validate_config_catches_errors():
    import pytest as _pytest

    from ladder_tpu.utils.config import apply_defaults, validate_config

    def base(**o):
        c = {
            "exp_name": "mnist_digit", "prior": "ours", "batch_size": 64,
            "num_epochs": 1, "code_size": 8, "num_hidden_units": 64,
            "dim_input_x": 28, "dim_input_y": 28, "dim_input_channel": 1,
            "learning_rate_ae": 3e-4, "sigma": 0.5, "load_dir": "default",
        }
        c.update(o)
        return apply_defaults(c)

    validate_config(base())  # valid passes

    with _pytest.raises(ValueError, match="missing required"):
        c = base()
        del c["batch_size"]
        validate_config(c)
    with _pytest.raises(ValueError, match="unknown prior"):
        validate_config(base(prior="bogus"))
    with _pytest.raises(ValueError, match="divisible by 64"):
        validate_config(base(num_hidden_units=32))
    with _pytest.raises(ValueError, match="dtype"):
        validate_config(base(dtype="float16"))
    with _pytest.raises(ValueError, match="fused_train_step"):
        validate_config(base(fused_train_step=3))
