"""Real-data dress rehearsal (VERDICT r2 item 8): synthesize datasets in
the REAL on-disk layouts the reference consumes — idx-format MNIST files
(/root/reference/README.md:84-95) and an image folder converted through
scripts/prepare_celeba.py into the reference's TFRecord layout
(models.py:346-390) — then drive the full real-data path end-to-end:
verify_real_data check -> train -> verify_real_data compare. This proves
the non-synthetic code path executes before anyone points it at the actual
datasets."""

import argparse
import gzip
import importlib.util
import json
import os
import struct
import sys

import numpy as np
import pytest

from tests.conftest import make_config

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SCRIPTS, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def write_idx_images(path, images):
    """idx3-ubyte (magic 2051) — the raw-MNIST distribution format."""
    n, h, w = images.shape
    with gzip.open(path, "wb") as f:
        f.write(struct.pack(">iiii", 2051, n, h, w))
        f.write(np.ascontiguousarray(images, np.uint8).tobytes())


def write_idx_labels(path, labels):
    with gzip.open(path, "wb") as f:
        f.write(struct.pack(">ii", 2049, len(labels)))
        f.write(np.ascontiguousarray(labels, np.uint8).tobytes())


def rehearsal_envelope(tmp_path, **checks):
    """Short-run envelope: same check machinery as docs/envelopes/*.json,
    thresholds a successful few-epoch run genuinely meets."""
    base = dict(min_train_loss_drop=0.05, final_sigma_max=0.6,
                sigma_monotone_tolerance=0.15,
                val_final_within_train_frac=0.5)
    base.update(checks)
    p = str(tmp_path / "envelope.json")
    with open(p, "w") as f:
        json.dump({"checks": base}, f)
    return p


def test_mnist_idx_rehearsal(tmp_path, monkeypatch, capsys):
    """idx-gz MNIST files -> check -> 3-epoch 'ours' train -> compare."""
    from ladder_tpu.data.mnist import DataGenerator, synthetic_mnist
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    # synthesize a dataset in the REAL idx layout (digit-blob images, so a
    # short run actually learns structure)
    (xtr, ytr), (xte, yte) = synthetic_mnist(n_train=512, n_test=256, seed=3)
    data_dir = tmp_path / "mnist_raw"
    os.makedirs(data_dir)
    write_idx_images(str(data_dir / "train-images-idx3-ubyte.gz"),
                     xtr)
    write_idx_labels(str(data_dir / "train-labels-idx1-ubyte.gz"), ytr)
    write_idx_images(str(data_dir / "t10k-images-idx3-ubyte.gz"), xte)
    write_idx_labels(str(data_dir / "t10k-labels-idx1-ubyte.gz"), yte)

    cfg = make_config(prior="ours", num_epochs=3, sg_pretraining=1,
                      accurate_fit=2, n_MC_samples=4, n_mixtures=4,
                      num_hidden_units=64, num_hidden_units_inner_VAE=16,
                      n_layers_inner_VAE=2, enable_plots=0, batch_size=64,
                      synthetic_data=0, data_dir=str(data_dir))
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt") + "/"
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    vrd = _load_script("verify_real_data")
    monkeypatch.setattr(vrd, "_load_config", lambda p: json.load(open(p)))

    # 1) layout check BEFORE training finds the idx files
    rc = vrd.check(argparse.Namespace(config=cfg_path,
                                      data_dir=str(data_dir)))
    out = capsys.readouterr().out
    assert rc == 0 and "OK: mnist_digit dataset" in out

    # 2) the loader consumes the idx layout (not the synthetic generator)
    data = DataGenerator(cfg)
    assert data.n_train == 512 and data.n_val == 256
    np.testing.assert_allclose(data.train_set["image"][0, :, :, 0],
                               xtr[0] / 255.0, atol=1e-6)
    trainer = MNISTTrainer(make_model(cfg), data, cfg)
    trainer.train()

    # 3) envelope compare AFTER training
    rc = vrd.compare(argparse.Namespace(
        config=cfg_path,
        envelope=rehearsal_envelope(tmp_path, min_active_mixtures=1)))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "All envelope checks passed" in out


@pytest.mark.slow
def test_celeba_imagefolder_rehearsal(tmp_path, monkeypatch, capsys):
    """image folder -> prepare_celeba.py TFRecords -> check -> 1-epoch
    train -> compare (the reference's CelebA ingestion contract)."""
    from PIL import Image

    from ladder_tpu.data.celeba import CelebAData
    from ladder_tpu.data.mnist import synthetic_mnist
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.celeba_trainer import CelebATrainer
    from ladder_tpu.utils.config import create_dirs

    # a folder of non-square RGB images (center-crop + resize must run)
    img_dir = tmp_path / "img_align_celeba"
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    (blobs, _), _ = synthetic_mnist(n_train=56, n_test=1, seed=5)
    for i in range(56):
        face = np.repeat(np.repeat(blobs[i], 6, 0), 6, 1)[:160, :144]
        rgb = np.stack([face,
                        np.roll(face, 3, 0),
                        np.roll(face, 3, 1)], axis=-1)
        rgb = np.clip(rgb.astype(np.int32)
                      + rng.integers(0, 30, rgb.shape), 0, 255)
        Image.fromarray(rgb.astype(np.uint8)).save(
            img_dir / f"{i:06d}.png")

    out_dir = str(tmp_path / "celeba_records") + "/"
    prep = _load_script("prepare_celeba")
    monkeypatch.setattr(sys, "argv", [
        "prepare_celeba.py", "--images", str(img_dir), "--out", out_dir,
        "--size", "128", "--n-train", "40", "--n-val", "8"])
    prep.main()
    for split, n in (("train", 40), ("val", 8), ("test", 8)):
        assert os.path.isfile(os.path.join(
            out_dir, f"celebA_{split}.tfrecords"))

    cfg = make_config(
        exp_name="celeba", prior="standard_gaussian",
        dim_input_x=128, dim_input_y=128, dim_input_channel=3,
        num_hidden_units=16, code_size=16, batch_size=8, num_epochs=2,
        sg_pretraining=0, n_MC_samples=2, num_iter_to_plot=0,
        enable_plots=0, synthetic_data=0, data_path=out_dir,
        n_train_celeba=40, n_val_celeba=8)
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt") + "/"
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    vrd = _load_script("verify_real_data")
    monkeypatch.setattr(vrd, "_load_config", lambda p: json.load(open(p)))
    rc = vrd.check(argparse.Namespace(config=cfg_path, data_dir=out_dir))
    out = capsys.readouterr().out
    assert rc == 0 and out.count("OK:") == 3, out

    monkeypatch.chdir(tmp_path)
    data = CelebAData(cfg)
    trainer = CelebATrainer(model=make_model(cfg), data=data, config=cfg)
    trainer.train()

    rc = vrd.compare(argparse.Namespace(
        config=cfg_path,
        envelope=rehearsal_envelope(tmp_path, min_train_loss_drop=0.01,
                                    final_sigma_max=1.0,
                                    sigma_monotone_tolerance=0.3)))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "All envelope checks passed" in out
