"""Coverage for the plotting / prior-sample-generation paths (the reference's
per-epoch PDF artifacts, base.py:1012-1271) — run with plots enabled on a
tiny config and assert the artifact files appear."""

import os

import numpy as np
import pytest

from tests.conftest import make_config


def _run_with_plots(tmp_path, monkeypatch, prior, **overrides):
    monkeypatch.chdir(tmp_path)
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    cfg = make_config(
        prior=prior, num_epochs=1, sg_pretraining=0, accurate_fit=1,
        synthetic_n_train=128, synthetic_n_test=128,
        num_hidden_units=64, num_hidden_units_inner_VAE=16,
        n_layers_inner_VAE=2, n_MC_samples=2, n_mixtures=3,
        enable_plots=1, **overrides)
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    cfg["checkpoint_dir"] = str(tmp_path / "checkpoint") + "/"
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
    data = DataGenerator(cfg)
    model = make_model(cfg)
    trainer = MNISTTrainer(model, data, cfg)
    trainer.train()
    return cfg, trainer


def _pdfs(cfg):
    return sorted(os.listdir(cfg["result_dir"]))


def test_plots_ours_full_artifact_set(tmp_path, monkeypatch):
    cfg, trainer = _run_with_plots(tmp_path, monkeypatch, "ours")
    files = _pdfs(cfg)
    # ground truth + reconstruction grids
    assert "test_original_0.pdf" in files
    assert "test_reconstructed_1_0.pdf" in files
    # GM prior scatter + density for both fit modes (accurate_fit=1)
    assert "prior_estimate_circle_1_crude-GM.pdf" in files
    assert "prior_estimate_density_1_accurate-GM.pdf" in files
    # prior samples + loss panels
    assert any(f.startswith("generated_samples_prior_1") for f in files)
    assert "loss-elbo.pdf" in files
    assert "loss-outer-VAE-val.pdf" in files
    assert "loss-inner-VAE.pdf" in files
    assert "sigma.pdf" in files
    assert "GM_prior_info.npz" in files


@pytest.mark.parametrize("prior", ["standard_gaussian", "hierarchical",
                                   "vampPrior"])
def test_plots_other_priors_generate(tmp_path, monkeypatch, prior):
    cfg, trainer = _run_with_plots(tmp_path, monkeypatch, prior)
    files = _pdfs(cfg)
    assert "generated_samples_prior_1.pdf" in files
    if prior == "vampPrior":
        assert "vampPrior-prior-loss.pdf" in files


def test_sample_codes_from_all_priors(tmp_path, monkeypatch):
    """sample_codes_from_prior covers every method branch
    (base.py:1065-1122)."""
    cfg, trainer = _run_with_plots(tmp_path, monkeypatch, "ours")
    for method in ["standard_gaussian", "ours", "hierarchical"]:
        codes = trainer.sample_codes_from_prior(16, method=method)
        assert codes.shape == (16, cfg["code_size"])
        assert np.all(np.isfinite(np.asarray(codes)))
