"""Cross-framework parity tests against TensorFlow: the exact ops whose
semantics the reference depends on (SURVEY.md §7 hard parts) are checked
numerically against TF's implementations."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")


import jax.numpy as jnp  # noqa: E402

from ladder_tpu.data.tfrecord import (  # noqa: E402
    ImageRecordReader,
    encode_example_bytes,
    parse_example_bytes,
    write_image_tfrecords,
)
from ladder_tpu.ops.image import (  # noqa: E402
    depth_to_space,
    pad_symmetric,
    resize_bilinear_tf1,
)
from ladder_tpu.training.optim import adam_init, adam_update  # noqa: E402


def test_resize_matches_tf1_legacy():
    """TF1 align_corners=False legacy bilinear (models.py:519-578)."""
    rng = np.random.default_rng(0)
    for in_s, out_s in [(1, 2), (2, 8), (8, 16), (16, 32), (32, 64),
                        (64, 128), (7, 13), (16, 9)]:
        x = rng.standard_normal((2, in_s, in_s, 3)).astype(np.float32)
        want = tf.compat.v1.image.resize_images(
            tf.constant(x), [out_s, out_s],
            method=tf.image.ResizeMethod.BILINEAR,
            align_corners=False).numpy()
        got = np.asarray(resize_bilinear_tf1(jnp.asarray(x), out_s, out_s))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5), \
            (in_s, out_s)


def test_depth_to_space_matches_tf():
    rng = np.random.default_rng(1)
    for block in [2, 4]:
        x = rng.standard_normal((2, 3, 3, 16 * block * block)).astype(
            np.float32)
        want = tf.nn.depth_to_space(tf.constant(x), block).numpy()
        got = np.asarray(depth_to_space(jnp.asarray(x), block))
        np.testing.assert_array_equal(got, want)


def test_pad_symmetric_matches_tf():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 5, 1)).astype(np.float32)
    want = tf.pad(tf.constant(x), [[0, 0], [2, 2], [2, 2], [0, 0]],
                  "SYMMETRIC").numpy()
    got = np.asarray(pad_symmetric(jnp.asarray(x), 2, 2))
    np.testing.assert_array_equal(got, want)


def test_example_proto_cross_compat():
    """Our minimal Example codec interoperates with TF's real proto."""
    raw = bytes(range(256))
    ours = encode_example_bytes("X", raw)
    ex = tf.train.Example()
    ex.ParseFromString(ours)
    assert ex.features.feature["X"].bytes_list.value[0] == raw

    theirs = tf.train.Example(features=tf.train.Features(
        feature={"X": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[raw]))})).SerializeToString()
    assert parse_example_bytes(theirs, "X") == raw


def test_tfrecord_cross_compat(tmp_path):
    """Records we write are readable by tf.data (CRCs verified by TF), and
    TF-written records are readable by our reader."""
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (5, 8, 8, 3)).astype(np.uint8)

    ours_path = str(tmp_path / "ours.tfrecords")
    write_image_tfrecords(ours_path, imgs)
    ds = tf.data.TFRecordDataset(ours_path)
    out = []
    for rec in ds:
        ex = tf.train.Example()
        ex.ParseFromString(rec.numpy())
        out.append(np.frombuffer(
            ex.features.feature["X"].bytes_list.value[0],
            dtype=np.uint8).reshape(8, 8, 3))
    np.testing.assert_array_equal(np.stack(out), imgs)

    tf_path = str(tmp_path / "tf.tfrecords")
    with tf.io.TFRecordWriter(tf_path) as w:
        for img in imgs:
            ex = tf.train.Example(features=tf.train.Features(
                feature={"X": tf.train.Feature(bytes_list=tf.train.BytesList(
                    value=[img.tobytes()]))}))
            w.write(ex.SerializeToString())
    reader = ImageRecordReader(tf_path, (8, 8, 3))
    np.testing.assert_array_equal(reader.read_batch(range(5)), imgs)
    reader.close()


def test_native_reader_reads_tf_records(tmp_path):
    runtime = pytest.importorskip("ladder_tpu.runtime")
    if not runtime.native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (4, 8, 8, 3)).astype(np.uint8)
    tf_path = str(tmp_path / "tf.tfrecords")
    with tf.io.TFRecordWriter(tf_path) as w:
        for img in imgs:
            ex = tf.train.Example(features=tf.train.Features(
                feature={"X": tf.train.Feature(bytes_list=tf.train.BytesList(
                    value=[img.tobytes()]))}))
            w.write(ex.SerializeToString())
    native = runtime.NativeImageRecordReader(tf_path, (8, 8, 3))
    np.testing.assert_array_equal(native.read_batch(range(4)), imgs)
    native.close()


def test_adam_matches_tf_keras_adam():
    """Our TF1-style Adam vs tf.keras Adam (same formulation: bias correction
    in the step size, eps outside the corrected sqrt)."""
    rng = np.random.default_rng(5)
    w0 = rng.standard_normal(6).astype(np.float32)
    grads = [rng.standard_normal(6).astype(np.float32) for _ in range(5)]

    var = tf.Variable(w0)
    opt = tf.keras.optimizers.Adam(learning_rate=1e-2, beta_1=0.9,
                                   beta_2=0.95, epsilon=1e-8)
    for g in grads:
        opt.apply_gradients([(tf.constant(g), var)])
    want = var.numpy()

    params = {"w": jnp.asarray(w0)}
    state = adam_init(params)
    for g in grads:
        params, state = adam_update({"w": jnp.asarray(g)}, state, params,
                                    1e-2)
    got = np.asarray(params["w"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
