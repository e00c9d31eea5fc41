"""Model architecture tests: output shapes for all three outer VAEs (incl.
the 32->28 valid-conv crop, models.py:142-148), std-dev parameterisation
semantics, and image ops parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ladder_tpu.models import make_model
from ladder_tpu.ops.image import (
    depth_to_space,
    instance_norm,
    pad_symmetric,
    resize_bilinear_tf1,
    space_to_depth,
)
from tests.conftest import make_config


@pytest.mark.parametrize("exp,hwc,h", [
    ("mnist_digit", (28, 28, 1), 64),
    ("mnist_fashion", (28, 28, 1), 64),
    ("celeba", (128, 128, 3), 32),
])
def test_outer_vae_shapes(exp, hwc, h):
    cfg = make_config(exp_name=exp, dim_input_x=hwc[0], dim_input_y=hwc[1],
                      dim_input_channel=hwc[2], num_hidden_units=h,
                      code_size=16, prior="standard_gaussian")
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2,) + hwc)
    mean, std = model.encode(params, x)
    assert mean.shape == (2, 16)
    assert std.shape == (2, 16)
    out = model.decode(params, mean)
    assert out.shape == (2,) + hwc


def test_std_head_relu_semantics():
    """std = relu(dense) + precision: strictly >= precision, and exactly ==
    precision on the zero side (models.py:90-95)."""
    cfg = make_config(prior="standard_gaussian")
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (16, 28, 28, 1)),
                    dtype=jnp.float32)
    _, std = model.encode(params, x)
    assert float(std.min()) >= cfg["latent_variance_precision"] - 1e-9
    # at least one unit sits on the relu floor at init
    assert np.any(np.isclose(np.asarray(std),
                             cfg["latent_variance_precision"]))


def test_inner_vae_shapes(small_config):
    model = make_model(small_config)
    params = model.init(jax.random.PRNGKey(0))
    z = jnp.zeros((4, small_config["code_size"]))
    t_mean, t_std = model.inner_encode(params, z)
    assert t_mean.shape == (4, 2)
    decoded, std_head = model.inner_decode(params, t_mean)
    assert decoded.shape == (4, small_config["code_size"])
    assert std_head is None  # TRAIN_decoded_z_std = 0


def test_inner_sigma_clamped(small_config):
    model = make_model(small_config)
    params = model.init(jax.random.PRNGKey(0))
    params["inner_sigma"]["inner_sigma"] = jnp.asarray(5.0)
    assert float(model.inner_sigma_value(params)) == pytest.approx(
        small_config["inner_sigma_ub"], rel=1e-6)
    params["inner_sigma"]["inner_sigma"] = jnp.asarray(1e-4)
    assert float(model.inner_sigma_value(params)) == pytest.approx(
        small_config["inner_sigma_lb"], rel=1e-6)


def test_vamp_pseudo_inputs_shape():
    cfg = make_config(prior="vampPrior", n_mixtures=7)
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    pseudo = model.pseudo_inputs(params)
    assert pseudo.shape == (7, 28, 28, 1)


def test_depth_to_space_matches_blocks():
    x = jnp.arange(2 * 2 * 2 * 8, dtype=jnp.float32).reshape(2, 2, 2, 8)
    y = depth_to_space(x, 2)
    assert y.shape == (2, 4, 4, 2)
    np.testing.assert_array_equal(np.asarray(space_to_depth(y, 2)),
                                  np.asarray(x))
    # channel layout: output pixel (i*r+di, j*r+dj) channel c comes from
    # input channel (di*r + dj)*C + c — tf.nn.depth_to_space convention
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0]), np.asarray(x[0, 0, 0, 0:2]))
    np.testing.assert_array_equal(np.asarray(y[0, 0, 1]), np.asarray(x[0, 0, 0, 2:4]))
    np.testing.assert_array_equal(np.asarray(y[0, 1, 0]), np.asarray(x[0, 0, 0, 4:6]))


def test_pad_symmetric():
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 2, 2, 1)
    y = pad_symmetric(x, 1, 1)
    assert y.shape == (1, 4, 4, 1)
    # symmetric: edge value mirrored (first row duplicates row 0)
    np.testing.assert_array_equal(np.asarray(y[0, 0, :, 0]),
                                  np.asarray(y[0, 1, :, 0]))


def test_resize_bilinear_tf1_semantics():
    """TF1 align_corners=False: src = dst * in/out. Upscaling 2x of [a,b]
    gives [a, (a+b)/2, b, b] (last sample clamps), unlike half-pixel-centres
    resizes."""
    x = jnp.array([[1.0, 3.0]]).reshape(1, 1, 2, 1)
    y = resize_bilinear_tf1(x, 1, 4)
    np.testing.assert_allclose(np.asarray(y).ravel(), [1.0, 2.0, 3.0, 3.0])
    # identity when size unchanged
    np.testing.assert_array_equal(np.asarray(resize_bilinear_tf1(x, 1, 2)),
                                  np.asarray(x))


def test_instance_norm_moments():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 3)),
                    dtype=jnp.float32)
    y = instance_norm(x)
    m = np.asarray(jnp.mean(y, axis=(1, 2)))
    v = np.asarray(jnp.var(y, axis=(1, 2)))
    np.testing.assert_allclose(m, 0.0, atol=1e-5)
    np.testing.assert_allclose(v, 1.0, atol=1e-3)


def test_param_groups_and_counts(small_config):
    model = make_model(small_config)
    params = model.init(jax.random.PRNGKey(0))
    assert set(params.keys()) == {"encoder", "decoder", "sigma", "prior",
                                  "inner_sigma"}
    counts = model.count_params()
    assert counts[0] > 0 and counts[1] > 0
    assert counts[2] == 1  # sigma scalar
    assert counts[4] == 1  # inner sigma scalar


def test_fused_upconv_matches_resize_conv():
    """conv3x3_up2x_tf1 == conv3x3_SAME(resize_bilinear_tf1(x, 2n, 2n)) to
    float accuracy, values and both gradients, across sizes incl. borders."""
    import jax
    import jax.numpy as jnp

    from ladder_tpu.ops.image import conv3x3_up2x_tf1, resize_bilinear_tf1

    rng = np.random.default_rng(0)
    for n, ci, co in [(3, 2, 4), (4, 3, 5), (8, 16, 8)]:
        x = jnp.asarray(rng.standard_normal((2, n, n, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.2,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal((co,)), jnp.float32)

        def ref_fn(x, w):
            y = jax.lax.conv_general_dilated(
                resize_bilinear_tf1(x, 2 * n, 2 * n), w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + b

        ref = ref_fn(x, w)
        got = conv3x3_up2x_tf1(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-5)
        for argnum in (0, 1):
            g_ref = jax.grad(lambda *a: jnp.sum(ref_fn(*a) ** 2), argnum)(x, w)
            g_got = jax.grad(
                lambda x, w: jnp.sum(conv3x3_up2x_tf1(x, w, b) ** 2),
                argnum)(x, w)
            np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                       atol=1e-3, rtol=1e-4)


def test_celeba_decoder_fused_upsample_parity():
    """The fused decoder (default) and the explicit resize+conv decoder
    produce identical outputs from the SAME parameter pytree (checkpoint
    interchangeability: param names/shapes pinned to Conv_0..Conv_8)."""
    import jax
    import jax.numpy as jnp

    from ladder_tpu.models.celeba import CelebADecoder

    dec_fused = CelebADecoder(64, fuse_upsample=True)
    dec_plain = CelebADecoder(64, fuse_upsample=False)
    z = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16)),
                    jnp.float32)
    params = dec_plain.init(jax.random.PRNGKey(0), z)
    # identical param trees (names and shapes)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(
        dec_fused.init(jax.random.PRNGKey(0), z))[0]
    assert [(jax.tree_util.keystr(k), v.shape) for k, v in flat_a] == \
           [(jax.tree_util.keystr(k), v.shape) for k, v in flat_b]
    out_plain = dec_plain.apply(params, z)
    out_fused = dec_fused.apply(params, z)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               atol=2e-4, rtol=1e-4)


def test_fused_upconv_non_square():
    """The batched boundary corrections treat rows and columns through
    separate grouped convs; non-square inputs catch any h/w mix-up."""
    import jax
    import jax.numpy as jnp

    from ladder_tpu.ops.image import conv3x3_up2x_tf1, resize_bilinear_tf1

    rng = np.random.default_rng(7)
    for h, w in [(3, 5), (6, 4)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 4)) * 0.3, jnp.float32)

        def ref_fn(x, k):
            return jax.lax.conv_general_dilated(
                resize_bilinear_tf1(x, 2 * h, 2 * w), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        np.testing.assert_allclose(
            np.asarray(conv3x3_up2x_tf1(x, k)), np.asarray(ref_fn(x, k)),
            atol=1e-4, rtol=1e-5)
        for argnum in (0, 1):
            g_ref = jax.grad(lambda *a: jnp.sum(ref_fn(*a) ** 2),
                             argnum)(x, k)
            g_got = jax.grad(lambda x, k: jnp.sum(
                conv3x3_up2x_tf1(x, k) ** 2), argnum)(x, k)
            np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                       atol=1e-3, rtol=1e-4)
