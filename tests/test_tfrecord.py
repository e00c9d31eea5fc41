"""TFRecord codec tests: framing, CRC, Example proto round-trip, indexed
reads, and (if TF-written files exist) cross-compat."""

import struct

import numpy as np

from ladder_tpu.data.celeba import (
    CelebAData,
    CelebARecords,
    synthetic_celeba_images,
)
from ladder_tpu.data.tfrecord import (
    ImageRecordReader,
    crc32c,
    encode_example_bytes,
    index_tfrecords,
    masked_crc32c,
    parse_example_bytes,
    write_image_tfrecords,
    write_tfrecords,
)


def test_crc32c_known_vectors():
    # standard crc32c test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"a") == 0xC1D04330


def test_example_roundtrip():
    raw = bytes(range(256)) * 3
    buf = encode_example_bytes("X", raw)
    assert parse_example_bytes(buf, "X") == raw


def test_example_multiple_features():
    # entry order in the map must not matter; other keys skipped
    raw = b"payload-bytes"
    other = encode_example_bytes("Y", b"nope")
    # concatenating two Examples' features fields merges them in proto
    buf = encode_example_bytes("X", raw)
    assert parse_example_bytes(other + buf, "X") == raw


def test_write_index_read(tmp_path):
    imgs = synthetic_celeba_images(10, seed=0, size=16)
    path = str(tmp_path / "test.tfrecords")
    write_image_tfrecords(path, imgs)
    idx = index_tfrecords(path)
    assert len(idx) == 10
    reader = ImageRecordReader(path, (16, 16, 3))
    np.testing.assert_array_equal(reader.read(0), imgs[0])
    np.testing.assert_array_equal(reader.read(9), imgs[9])
    batch = reader.read_batch([3, 1, 4])
    np.testing.assert_array_equal(batch, imgs[[3, 1, 4]])
    reader.close()


def test_crc_framing_valid(tmp_path):
    """Our writer's frame CRCs verify against our crc32c."""
    payload = b"hello tfrecord"
    path = str(tmp_path / "one.tfrecords")
    write_tfrecords(path, [payload])
    blob = open(path, "rb").read()
    (length,) = struct.unpack_from("<Q", blob, 0)
    assert length == len(payload)
    (len_crc,) = struct.unpack_from("<I", blob, 8)
    assert len_crc == masked_crc32c(blob[0:8])
    (data_crc,) = struct.unpack_from("<I", blob, 12 + length)
    assert data_crc == masked_crc32c(payload)


def test_celeba_records_epoch(tmp_path):
    imgs = synthetic_celeba_images(20, seed=1, size=16)
    path = str(tmp_path / "train.tfrecords")
    write_image_tfrecords(path, imgs)
    rec = CelebARecords(path, (16, 16, 3))
    batches = list(rec.epoch(8, seed=0))
    assert len(batches) == 2  # drop remainder
    assert batches[0].shape == (8, 16, 16, 3)
    assert batches[0].dtype == np.uint8
    # deterministic per seed
    again = list(rec.epoch(8, seed=0))
    np.testing.assert_array_equal(np.stack(batches), np.stack(again))
    other = list(rec.epoch(8, seed=1))
    assert not np.array_equal(np.stack(batches), np.stack(other))


def test_celeba_data_synthetic(tmp_path):
    cfg = dict(dim_input_x=16, dim_input_y=16, dim_input_channel=3,
               synthetic_data=1, synthetic_n_train=12, synthetic_n_val=8,
               synthetic_n_test=4, seed=0,
               data_path=str(tmp_path / "celeba") + "/")
    data = CelebAData(cfg)
    assert data.n_train == 12
    assert data.n_val == 8
    tb = data.test.first_batch(4)
    assert tb.shape == (4, 16, 16, 3)
    # idempotent: second construction reuses files
    data2 = CelebAData(cfg)
    np.testing.assert_array_equal(data2.test.first_batch(4), tb)
