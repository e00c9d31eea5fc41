"""Demo entry point across model families (reference demo: mnist_digit
only, demo/mnist_digit_config.json; this framework additionally ships
fashion and CelebA demo configs backed by pretrained_models/).

The CelebA run drives the full demo pipeline — restore -> accurate GM fit
-> val embeddings -> SLP optimisation -> image strips + path overlays —
through demo/interpolate.py's CLI against a checkpoint trained in-test,
exercising the exp_name dispatch and the TFRecord val-set branch."""

import importlib
import json
import os
import shutil
import sys

import pytest


def _tiny_celeba_cfg(tmp_path):
    return {
        "exp_name": "celeba",
        "data_path": str(tmp_path / "celeba") + "/",
        "loss_function": "ELBO",
        "prior": "ours",
        "inner_activation": "leaky_relu",
        "n_mixtures": 4,
        "GM_fit_restart": 1,
        "n_MC_samples": 2,
        "load_model": 0,
        "load_dir": "default",
        "num_epochs": 1,
        "use_mask_start": 100,
        "sg_pretraining": 0,
        "num_iter_to_plot": 0,
        "accurate_fit": 1,
        "kernel_size": 3,
        "learning_rate_ae": 2.5e-4,
        "learning_rate_sigma": 2.5e-4,
        "learning_rate_prior": 1.25e-4,
        "learning_rate_inner_sigma": 2e-4,
        "batch_size": 8,
        "max_to_keep": 1,
        "dim_input_x": 128,
        "dim_input_y": 128,
        "dim_input_channel": 3,
        "code_size": 16,
        "representation_size": 2,
        "TRAIN_VAE": 1,
        "TRAIN_sigma": 1,
        "TRAIN_prior": 1,
        "TRAIN_inner_sigma": 1,
        "TRAIN_decoded_z_std": 0,
        "sigma": 0.5,
        "inner_sigma": 0.1,
        "inner_sigma_ub": 0.1,
        "inner_sigma_lb": 0.05,
        "latent_variance_precision": 1e-3,
        "num_hidden_units": 16,
        "num_hidden_units_inner_VAE": 16,
        "n_layers_inner_VAE": 2,
        "synthetic_data": 1,
        "synthetic_n_train": 32,
        "synthetic_n_val": 16,
        "synthetic_n_test": 8,
        "enable_plots": 0,
    }


@pytest.mark.slow
def test_celeba_demo_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo")

    # 1) train a tiny celeba 'ours' model for one epoch via the CLI
    cfg = _tiny_celeba_cfg(tmp_path)
    train_cfg = tmp_path / "train_cfg.json"
    train_cfg.write_text(json.dumps(cfg))
    train = importlib.import_module("train")
    train.main(["--config", str(train_cfg)])

    ck = ("experiments/celeba/batch-8/"
          "prior-ours-16-16-2-leaky_relu-2-mixture-4/checkpoint")
    assert os.path.isfile(os.path.join(ck, "vae-model.msgpack"))

    # 2) stage it in the pretrained_models/{exp} layout the demo loads from
    pm = tmp_path / "pm" / "celeba"
    pm.mkdir(parents=True)
    for f in ("vae-model.msgpack", "prior-model.msgpack"):
        shutil.copy(os.path.join(ck, f), pm / f)

    demo_cfg = dict(cfg, load_model=1, num_epochs=0,
                    load_dir=str(tmp_path / "pm") + "/")
    demo_path = tmp_path / "demo_cfg.json"
    demo_path.write_text(json.dumps(demo_cfg))

    # 3) run the demo CLI (short optimisation; idx within the 16-image val
    # split)
    sys.modules.pop("demo.interpolate", None)
    interp = importlib.import_module("demo.interpolate")
    monkeypatch.setattr(sys, "argv", [
        "interpolate.py", "--config", str(demo_path),
        "--idx-start", "0", "--idx-end", "9",
        "--n-step", "3", "--n-iter", "5"])
    interp.main()

    rdir = "./figures/celeba/result/"
    produced = os.listdir(rdir)
    # SLP + SP strips, loss curves, 2-D path overlays, accurate-fit GM dump
    for pattern in ("interpolated_image", "interpolated_path", "loss_image",
                    "GM_prior_info"):
        assert any(f.startswith(pattern) for f in produced), (
            pattern, sorted(produced))
    for suffix in ("SLP.pdf", "SP.pdf"):
        assert any(f.startswith("interpolated_image") and f.endswith(suffix)
                   for f in produced), (suffix, sorted(produced))


def test_demo_configs_match_shipped_reference_checkpoints():
    """The fashion/celeba demo configs must describe the architectures of
    the reference's shipped pretrained checkpoints (h=512/code=32 fashion;
    t-dim 32 celeba) so imported TF1 blobs drop straight in."""
    fashion = json.load(open("/root/repo/demo/mnist_fashion_config.json"))
    assert fashion["num_hidden_units"] == 512
    assert fashion["code_size"] == 32
    assert fashion["load_dir"] == "./pretrained_models/"
    celeba = json.load(open("/root/repo/demo/celeba_config.json"))
    assert celeba["representation_size"] == 32
    assert celeba["synthetic_data"] == 1
    assert celeba["load_dir"] == "./pretrained_models/"
