"""Fused output-stage kernel (ops/pallas_output.py): exact parity with the
explicit leaky_relu -> Conv_8 -> reconstruction-sum path, values AND both
gradients, in interpret mode on CPU. The kernel's contract is the CelebA
decoder tail (/root/reference/codes/models.py:581-586) + the loss
reductions (base.py:372-390)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ladder_tpu.ops.pallas_output as po
from tests.conftest import make_config

# may not skip: conftest fails the session if any pallas_parity test skips
pytestmark = pytest.mark.pallas_parity


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(po, "_INTERPRET", True)


def explicit(u, kernel, bias, target):
    """The unfused reference composition (decoder tail + loss sums): the
    weights round to the activation dtype (flax Conv promote_dtype), the
    contraction accumulates in fp32 (the MXU's accumulator), the result
    rounds to the activation dtype where the decoder materialises it."""
    x7 = jnp.where(u > 0, u, jnp.asarray(0.2, u.dtype) * u)
    dec = jax.lax.conv_general_dilated(
        x7.astype(jnp.float32), kernel.astype(u.dtype).astype(jnp.float32),
        (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dec = dec + bias
    dec = dec.astype(u.dtype).astype(jnp.float32)
    diff = target - dec
    return dec, jnp.sum(jnp.abs(diff)), jnp.sum(diff * diff)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (3, 12, 4, 8)])
def test_forward_parity(dtype, shape):
    rng = np.random.default_rng(0)
    b, h, w, c = shape
    u = jnp.asarray(rng.standard_normal(shape), dtype)
    kernel = jnp.asarray(rng.standard_normal((1, 1, c, 3)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(3) * 0.1, jnp.float32)
    target = jnp.asarray(rng.random((b, h, w, 3)), jnp.float32)

    dec_f, l1_f, l2_f = po.fused_output_recon(u, kernel, bias, target)
    dec_e, l1_e, l2_e = explicit(u, kernel, bias, target)
    np.testing.assert_allclose(np.asarray(dec_f), np.asarray(dec_e),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(l1_f), float(l1_e), rtol=1e-5)
    np.testing.assert_allclose(float(l2_f), float(l2_e), rtol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gradient_parity(dtype):
    rng = np.random.default_rng(1)
    shape = (2, 8, 8, 16)
    u = jnp.asarray(rng.standard_normal(shape), dtype)
    kernel = jnp.asarray(rng.standard_normal((1, 1, 16, 3)) * 0.2,
                         jnp.float32)
    bias = jnp.asarray(rng.standard_normal(3) * 0.1, jnp.float32)
    target = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)

    def scalar(fn):
        def s(u, k, b):
            dec, l1, l2 = fn(u, k, b, target)
            # exercise every output's cotangent incl. a nonzero ddecoded
            return 0.7 * l1 + 0.3 * l2 + jnp.sum(dec * 0.01)
        return s

    gf = jax.grad(scalar(po.fused_output_recon), argnums=(0, 1, 2))(
        u, kernel, bias)
    ge = jax.grad(scalar(explicit), argnums=(0, 1, 2))(u, kernel, bias)
    for a, b_ in zip(gf, ge):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=2e-2, atol=2e-5)


def test_target_gradient_parity():
    """d(loss)/d(target) must be the true gradient (sign/2*diff terms),
    not a silent zero — input-sensitivity probes differentiate w.r.t. the
    image data even though training never does."""
    rng = np.random.default_rng(2)
    shape = (2, 8, 8, 16)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((1, 1, 16, 3)) * 0.2,
                         jnp.float32)
    bias = jnp.asarray(rng.standard_normal(3) * 0.1, jnp.float32)
    target = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)

    def scalar(fn):
        def s(t):
            _, l1, l2 = fn(u, kernel, bias, t)
            return 0.7 * l1 + 0.3 * l2
        return s

    gf = jax.grad(scalar(po.fused_output_recon))(target)
    ge = jax.grad(scalar(explicit))(target)
    assert float(jnp.max(jnp.abs(ge))) > 0  # the probe is non-trivial
    np.testing.assert_allclose(np.asarray(gf), np.asarray(ge),
                               rtol=1e-6, atol=1e-6)


def test_compute_loss_parity_with_fused_output():
    """Loss-level: fused_output_stage=1 equals the explicit path on a tiny
    CelebA model — loss values and full parameter gradients."""
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.losses import compute_loss, identity_gm

    def build(fused):
        cfg = make_config(
            exp_name="celeba", prior="ours", batch_size=4,
            dim_input_x=128, dim_input_y=128, dim_input_channel=3,
            code_size=8, num_hidden_units=16, num_hidden_units_inner_VAE=8,
            n_layers_inner_VAE=2, n_MC_samples=4, n_mixtures=3,
            fused_output_stage=fused)
        return make_model(cfg), cfg

    model_f, cfg = build(1)
    model_e, _ = build(0)
    assert model_f.fused_output and not model_e.fused_output
    params = model_f.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(2).integers(
        0, 256, (4, 128, 128, 3)), jnp.uint8)
    rng = jax.random.PRNGKey(3)
    gm = identity_gm(cfg["n_mixtures"], cfg["representation_size"])

    def loss_of(model):
        def f(p):
            loss, m = compute_loss(model, p, x, rng, gm)
            return loss, m
        return f

    (lf, mf), gfull = jax.value_and_grad(loss_of(model_f), has_aux=True)(
        params)
    (le, me), gexp = jax.value_and_grad(loss_of(model_e), has_aux=True)(
        params)
    np.testing.assert_allclose(float(lf), float(le), rtol=1e-5)
    for k in ("l1_reconstruction_error", "l2_reconstruction_error",
              "mean_pixel_error", "sigma", "elbo"):
        np.testing.assert_allclose(float(mf[k]), float(me[k]), rtol=1e-5,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(mf["decoded"]),
                               np.asarray(me["decoded"]), rtol=1e-5,
                               atol=1e-6)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(gfull)[0],
            jax.tree.leaves(gexp)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        # Several bias leaves have EXACTLY zero analytic gradient — every
        # encoder conv feeds BatchNorm and the in_style decoder convs
        # feed instance_norm, both of which subtract the mean, so a bias
        # shift never reaches the loss. Both paths return only f32
        # reduction-order noise there (sums of ~1e5 O(1) terms cancelling
        # to ~1e-2), so comparing them elementwise compares noise to
        # noise: assert near-zero on both instead. Real gradients (every
        # kernel, the heads, sigma — O(0.1..100) here) compare at
        # leaf-scale tolerance, where an actual bug (wrong mask, missing
        # term) shows at O(scale).
        name = jax.tree_util.keystr(path)
        if max(np.abs(a).max(), np.abs(b).max()) < 5e-2:
            assert np.abs(a).max() < 5e-2 and np.abs(b).max() < 5e-2, name
            continue
        np.testing.assert_allclose(a, b, rtol=1e-3,
                                   atol=2e-3 * np.abs(b).max(),
                                   err_msg=name)


def test_trainer_disables_fused_output_under_mesh(tmp_path, monkeypatch):
    """The fused output stage is a single-device pallas call; the trainer
    must fall back to the XLA path when a device mesh is wired in."""
    import jax

    from ladder_tpu.data.celeba import CelebAData
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.parallel.mesh import make_mesh
    from ladder_tpu.training.celeba_trainer import CelebATrainer
    from ladder_tpu.utils.config import create_dirs

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.chdir(tmp_path)
    cfg = make_config(
        exp_name="celeba", prior="standard_gaussian",
        dim_input_x=128, dim_input_y=128, dim_input_channel=3,
        num_hidden_units=16, code_size=16, batch_size=8, num_epochs=1,
        n_MC_samples=2, num_iter_to_plot=0, enable_plots=0,
        synthetic_n_train=16, synthetic_n_val=8, synthetic_n_test=8,
        data_path=str(tmp_path / "celeba") + "/",
        fused_output_stage=1)
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt") + "/"
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
    model = make_model(cfg)
    assert model.fused_output
    trainer = CelebATrainer(model=model, data=CelebAData(cfg), config=cfg,
                            mesh=make_mesh())
    assert not model.fused_output  # guard fired
    del trainer


def test_trunk_only_matches_full_decoder_prefix():
    """decode_trunk + explicit tail == decode (checkpoint compatibility of
    the split)."""
    from ladder_tpu.models.builder import make_model

    cfg = make_config(
        exp_name="celeba", prior="standard_gaussian", batch_size=2,
        dim_input_x=128, dim_input_y=128, dim_input_channel=3,
        code_size=8, num_hidden_units=16)
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    z = jnp.asarray(np.random.default_rng(4).standard_normal((2, 8)),
                    jnp.float32)
    u = model.decode_trunk(params, z)
    k8, b8 = model.output_stage_params(params)
    x7 = jnp.where(u > 0, u, 0.2 * u)
    dec = jax.lax.conv_general_dilated(
        x7, k8, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b8
    np.testing.assert_allclose(np.asarray(dec.astype(jnp.float32)),
                               np.asarray(model.decode(params, z)),
                               rtol=1e-5, atol=1e-6)
