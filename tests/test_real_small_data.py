"""GENUINELY-real-data rehearsal: train on the real datasets bundled with
scikit-learn via scripts/make_small_real_data.py.

test_real_data_rehearsal.py proves the real-data *code path* with
synthesized files in the real layouts; this module goes one step further —
the pixels themselves are real measurements (UCI handwritten digits:
scanned pen strokes from human writers; sklearn's sample photographs), so
the committed evidence includes training runs on non-synthetic data even
though MNIST/CelebA proper cannot be fetched in this environment
(SURVEY.md §6; reference ingestion contracts
/root/reference/codes/data_loader.py:19-33, models.py:354-367)."""

import importlib.util
import os

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


def test_digits_builder_writes_real_handwriting(tmp_path):
    """mnist.npz in keras layout, 28x28 uint8, stratified split deep enough
    for the reference's balanced test-batch tables (data_loader.py:37-44)."""
    mod = _load_script("make_small_real_data")
    path = mod.build_digits(str(tmp_path))
    with np.load(path) as d:
        xtr, ytr = d["x_train"], d["y_train"]
        xte, yte = d["x_test"], d["y_test"]
    assert xtr.shape[1:] == (28, 28) and xtr.dtype == np.uint8
    assert xtr.shape[0] + xte.shape[0] == 1797  # every real digit used once
    # enough test images per class for the batch-256 balanced table (26)
    assert np.bincount(yte, minlength=10).min() >= 26
    # real handwriting, not blobs: strokes span the dynamic range
    assert xtr.max() > 200 and xtr.mean() > 10
    # deterministic rebuild (seeded split)
    path2 = mod.build_digits(str(tmp_path / "again"))
    with np.load(path2) as d2:
        np.testing.assert_array_equal(xtr, d2["x_train"])


def test_photos_builder_writes_celeba_layout(tmp_path):
    """Real-photograph crops land in the reference TFRecord layout and read
    back through the training reader."""
    from ladder_tpu.data.celeba import CelebARecords

    mod = _load_script("make_small_real_data")
    mod.build_photos(str(tmp_path), n_train=24, n_val=8, n_test=8, size=64)
    rec = CelebARecords(str(tmp_path / "celebA_train.tfrecords"), (64, 64, 3))
    assert rec.n == 24
    batch = np.asarray(rec.first_batch(8))
    assert batch.shape == (8, 64, 64, 3)
    # photographic content: non-degenerate per-image variance in every
    # channel (a flat-sky crop can be fairly uniform, hence the low bar)
    assert (batch.std(axis=(1, 2)) > 0.25).all()
    # seeded: a rebuild is byte-identical
    first = open(tmp_path / "celebA_val.tfrecords", "rb").read()
    mod.build_photos(str(tmp_path / "again"), n_train=24, n_val=8, n_test=8,
                     size=64)
    assert open(tmp_path / "again" / "celebA_val.tfrecords", "rb").read() \
        == first


def test_train_on_real_handwritten_digits(tmp_path):
    """2-epoch 'ours' training on the 1,438 real handwritten digits: loss
    drops, sigma anneals, the DP-GM prior fits — the full LaDDer loop on
    real data."""
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    mod = _load_script("make_small_real_data")
    data_dir = str(tmp_path / "real_digits")
    mod.build_digits(data_dir)

    cfg = make_config(prior="ours", num_epochs=2, sg_pretraining=1,
                      accurate_fit=2, n_MC_samples=4, n_mixtures=4,
                      num_hidden_units=64, num_hidden_units_inner_VAE=16,
                      n_layers_inner_VAE=2, enable_plots=0, batch_size=256,
                      synthetic_data=0, data_dir=data_dir)
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt") + "/"
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])

    data = DataGenerator(cfg)
    assert data.n_train == 1438 and data.n_val == 359
    trainer = MNISTTrainer(make_model(cfg), data, cfg)
    trainer.train()

    res = np.load(os.path.join(cfg["result_dir"], "mnist_digit-result.npz"))
    # npz `train_loss` is the reference's PER-STEP buffer (appended once per
    # ae step, /root/reference/codes/base.py:798): 2 epochs x (1438//256)=5
    # steps -> 10 entries. Per-epoch averages live in train_loss_ave_epoch.
    train_loss = np.asarray(res["train_loss"])
    steps_per_epoch = 1438 // 256
    assert len(train_loss) == 2 * steps_per_epoch
    # learning real structure: second-epoch mean below first-epoch mean
    assert train_loss[steps_per_epoch:].mean() \
        < train_loss[:steps_per_epoch].mean()
    sigma = np.asarray(res["sigma"])
    assert sigma[-1] < float(cfg["sigma"])  # sigma annealing engaged
    assert os.path.isfile(os.path.join(cfg["result_dir"],
                                       "GM_prior_info.npz"))
