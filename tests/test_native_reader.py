"""Native C++ TFRecord reader: parity with the Python reader and batch
throughput sanity."""

import time

import numpy as np
import pytest

from ladder_tpu.data.celeba import synthetic_celeba_images
from ladder_tpu.data.tfrecord import ImageRecordReader, write_image_tfrecords

runtime = pytest.importorskip("ladder_tpu.runtime")


@pytest.fixture(scope="module")
def record_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("native") / "imgs.tfrecords")
    imgs = synthetic_celeba_images(64, seed=0, size=32)
    write_image_tfrecords(path, imgs)
    return path, imgs


def test_native_builds():
    assert runtime.native_available(), "g++ toolchain expected in this image"


def test_native_matches_python(record_file):
    path, imgs = record_file
    native = runtime.NativeImageRecordReader(path, (32, 32, 3))
    py = ImageRecordReader(path, (32, 32, 3))
    assert len(native) == len(py) == 64
    idxs = [0, 5, 63, 17, 17]
    np.testing.assert_array_equal(native.read_batch(idxs),
                                  py.read_batch(idxs))
    np.testing.assert_array_equal(native.read(3), imgs[3])
    native.close()
    py.close()


def test_native_full_shuffle_epoch(record_file):
    path, imgs = record_file
    native = runtime.NativeImageRecordReader(path, (32, 32, 3))
    perm = np.random.default_rng(0).permutation(64)
    batch = native.read_batch(perm)
    np.testing.assert_array_equal(batch, imgs[perm])
    native.close()


def test_native_bad_index_raises(record_file):
    path, _ = record_file
    native = runtime.NativeImageRecordReader(path, (32, 32, 3))
    with pytest.raises(IOError):
        native.read_batch([999])
    native.close()


def test_native_faster_than_python_on_big_batches(tmp_path):
    """Throughput sanity on 128x128x3 records (the production shape)."""
    imgs = synthetic_celeba_images(96, seed=1, size=128)
    path = str(tmp_path / "big.tfrecords")
    write_image_tfrecords(path, imgs)
    native = runtime.NativeImageRecordReader(path, (128, 128, 3))
    py = ImageRecordReader(path, (128, 128, 3))
    idxs = np.arange(96)

    native.read_batch(idxs)  # warm page cache
    t0 = time.perf_counter()
    for _ in range(5):
        native.read_batch(idxs)
    t_native = time.perf_counter() - t0

    py.read_batch(idxs)
    t0 = time.perf_counter()
    for _ in range(5):
        py.read_batch(idxs)
    t_python = time.perf_counter() - t0

    print(f"native {t_native*200:.2f} ms/batch vs python "
          f"{t_python*200:.2f} ms/batch")
    assert t_native < t_python
    native.close()
    py.close()
