"""CelebA-128 end-to-end smoke: one epoch on synthetic TFRecords exercises
the BN encoder, style decoder, staircase lr, TFRecord pipeline and the
mid-epoch checkpoint plots path."""

import os

import numpy as np
import pytest

from tests.conftest import make_config


def _celeba_config(tmp_path, **overrides):
    base = dict(
        exp_name="celeba", dim_input_x=128, dim_input_y=128,
        dim_input_channel=3, num_hidden_units=16, code_size=16,
        batch_size=8, num_epochs=1, sg_pretraining=0,
        n_MC_samples=2, n_mixtures=3, num_iter_to_plot=0,
        synthetic_n_train=32, synthetic_n_val=16, synthetic_n_test=8,
        enable_plots=0, data_path=str(tmp_path / "celeba") + "/")
    base.update(overrides)
    cfg = make_config(**base)
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    cfg["checkpoint_dir"] = str(tmp_path / "checkpoint") + "/"
    return cfg


@pytest.mark.slow
def test_celeba_e2e_standard_gaussian(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ladder_tpu.data.celeba import CelebAData
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.celeba_trainer import CelebATrainer
    from ladder_tpu.utils.config import create_dirs

    cfg = _celeba_config(tmp_path, prior="standard_gaussian")
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
    data = CelebAData(cfg)
    model = make_model(cfg)
    trainer = CelebATrainer(model, data, cfg)
    trainer.train()

    assert len(trainer.metrics.train_loss) == 32 // 8
    assert np.all(np.isfinite(trainer.metrics.train_loss))
    # staircase lr: epoch 1 uses base lr
    assert trainer.current_lr_ae() == pytest.approx(cfg["learning_rate_ae"])
    r = np.load(os.path.join(cfg["result_dir"], "celeba-result.npz"))
    assert len(r["train_loss"]) == 4
    assert os.path.isfile(os.path.join(cfg["checkpoint_dir"],
                                       "vae-model.msgpack"))


def test_celeba_staircase_lr():
    from ladder_tpu.training.schedules import lr_ae_celeba
    cfg = {"learning_rate_ae": 1e-3, "exp_name": "celeba"}
    assert lr_ae_celeba(cfg, 1) == pytest.approx(1e-3)
    assert lr_ae_celeba(cfg, 25) == pytest.approx(1e-3 * 0.99 ** 24)
    assert lr_ae_celeba(cfg, 26) == pytest.approx(5e-4 * 0.99)
    assert lr_ae_celeba(cfg, 51) == pytest.approx(2e-4 * 0.99)
    assert lr_ae_celeba(cfg, 76) == pytest.approx(1e-4 * 0.99)


@pytest.mark.slow
def test_celeba_mid_epoch_checkpoints_with_multi_step(tmp_path, monkeypatch):
    """Regression: with steps_per_call>1 the mid-epoch reconstruction
    checkpoints (trainers.py:156-158) must still fire — the hook receives
    the dispatch window and matches every checkpoint index inside it."""
    monkeypatch.chdir(tmp_path)
    from ladder_tpu.data.celeba import CelebAData
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.celeba_trainer import CelebATrainer
    from ladder_tpu.utils.config import create_dirs

    cfg = _celeba_config(tmp_path, prior="standard_gaussian",
                         num_iter_to_plot=2, enable_plots=1,
                         steps_per_call=2)
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
    data = CelebAData(cfg)
    model = make_model(cfg)
    trainer = CelebATrainer(model, data, cfg)
    # 32 train / batch 8 = 4 steps; checkpoints at indices 0 and 2 — both
    # inside K=2 dispatch windows, neither at a window's last index
    assert list(trainer.idx_check_point) == [0, 2]
    trainer.train()

    pdfs = [f for f in os.listdir(cfg["result_dir"])
            if "interleaved" in f or "recon" in f]
    assert len(pdfs) >= 2, pdfs


@pytest.mark.slow
def test_val_gating_parity_train_vae_off(tmp_path, monkeypatch):
    """Reference parity of the validation gates: MNIST records VAE val
    curves even with TRAIN_VAE=0 (trainers.py:62-66 has no gate); CelebA
    gates on TRAIN_VAE but still appends the 0.0 epoch average
    (trainers.py:180-186)."""
    monkeypatch.chdir(tmp_path)
    from ladder_tpu.data.celeba import CelebAData
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.celeba_trainer import CelebATrainer
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    cfg = _celeba_config(tmp_path, prior="standard_gaussian", TRAIN_VAE=0)
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
    trainer = CelebATrainer(make_model(cfg), CelebAData(cfg), cfg)
    trainer.train()
    assert trainer.metrics.val_loss_ave_epoch == [0.0]

    mcfg = make_config(prior="standard_gaussian", TRAIN_VAE=0, num_epochs=1,
                       sg_pretraining=0)
    mcfg["result_dir"] = str(tmp_path / "mresult") + "/"
    mcfg["checkpoint_dir"] = str(tmp_path / "mckpt") + "/"
    create_dirs([mcfg["result_dir"], mcfg["checkpoint_dir"]])
    mtrainer = MNISTTrainer(make_model(mcfg), DataGenerator(mcfg), mcfg)
    mtrainer.train()
    assert len(mtrainer.metrics.val_loss_ave_epoch) == 1
    assert np.isfinite(mtrainer.metrics.val_loss_ave_epoch[0])
    assert mtrainer.metrics.val_loss_ave_epoch[0] != 0.0
