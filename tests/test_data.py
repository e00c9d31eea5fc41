"""Data-layer tests: balanced test batch (data_loader.py:35-58) and epoch
batching semantics."""

import numpy as np

from ladder_tpu.data.mnist import (
    DataGenerator,
    balanced_counts,
    build_balanced_test_batch,
    epoch_batches,
    synthetic_mnist,
)


def test_balanced_counts_reference_table():
    assert balanced_counts(64) == (7, 7, 7, 7, 6, 6, 6, 6, 6, 6)
    assert balanced_counts(128) == (13,) * 8 + (12, 12)
    assert balanced_counts(256) == (26,) * 6 + (25,) * 4
    assert balanced_counts(512) == (51,) * 8 + (52, 52)
    assert sum(balanced_counts(96)) == 96


def test_balanced_batch_layout():
    (_, _), (x_test, y_test) = synthetic_mnist(n_train=10, n_test=2000, seed=1)
    x_sel, y_sel = build_balanced_test_batch(x_test, y_test, 64)
    counts = balanced_counts(64)
    # classes appear in contiguous blocks in class order
    expected = np.concatenate([[c] * n for c, n in enumerate(counts)])
    np.testing.assert_array_equal(y_sel, expected)
    # every selected image really has that label (first-scan-order fill)
    offsets = np.cumsum((0,) + counts)
    for c in range(10):
        idxs_val = np.where(y_test == c)[0][: counts[c]]
        np.testing.assert_array_equal(
            x_sel[offsets[c]:offsets[c + 1]], x_test[idxs_val])


def test_datagen_synthetic(small_config):
    data = DataGenerator(small_config)
    assert data.train_set["image"].shape == (512, 28, 28, 1)
    assert data.val_set["image"].shape == (256, 28, 28, 1)
    assert data.test_set["image"].shape == (64, 28, 28, 1)
    img = data.train_set["image"]
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_epoch_batches_deterministic_and_complete():
    x = np.arange(100, dtype=np.float32).reshape(100, 1, 1, 1)
    b1 = list(epoch_batches(x, 32, epoch_seed=3))
    b2 = list(epoch_batches(x, 32, epoch_seed=3))
    b3 = list(epoch_batches(x, 32, epoch_seed=4))
    assert len(b1) == 3  # drop remainder
    np.testing.assert_array_equal(np.stack(b1), np.stack(b2))
    assert not np.array_equal(np.stack(b1), np.stack(b3))
    seen = np.concatenate([b.ravel() for b in b1])
    assert len(np.unique(seen)) == 96  # no sample repeats within an epoch


def test_separate_train_and_val_set():
    from ladder_tpu.data.mnist import separate_train_and_val_set

    idx_train, idx_val = separate_train_and_val_set(100, seed=0)
    assert len(idx_train) == 90
    assert len(idx_val) == 10
    assert set(idx_train) | set(idx_val) == set(range(100))
    assert not set(idx_train) & set(idx_val)
