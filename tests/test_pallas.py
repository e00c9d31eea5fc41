"""Pallas fused kernel tests (interpret mode on CPU): forward and backward
parity against the unfused composition."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ladder_tpu.ops.pallas_kernels as pk

# may not skip: conftest fails the session if any pallas_parity test skips
pytestmark = pytest.mark.pallas_parity


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


def _inputs(b=2, h=8, w=8, c=16, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype=dtype)
    scale = jnp.asarray(0.1 * rng.standard_normal((b, c)), dtype=dtype)
    shift = jnp.asarray(0.1 * rng.standard_normal((b, c)), dtype=dtype)
    return x, scale, shift


def test_fused_forward_matches_reference():
    x, scale, shift = _inputs()
    got = pk.fused_instnorm_style_lrelu(x, scale, shift)
    want = pk.reference_instnorm_style_lrelu(x, scale, shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_backward_matches_reference():
    x, scale, shift = _inputs(seed=1)

    def loss_fused(x, s, t):
        return jnp.sum(jnp.square(pk.fused_instnorm_style_lrelu(x, s, t)))

    def loss_ref(x, s, t):
        return jnp.sum(jnp.square(pk.reference_instnorm_style_lrelu(x, s, t)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, shift)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, shift)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_bf16():
    x, scale, shift = _inputs(seed=2, dtype=jnp.bfloat16)
    got = pk.fused_instnorm_style_lrelu(x, scale, shift)
    want = pk.reference_instnorm_style_lrelu(x, scale, shift)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want, dtype=np.float32),
                               rtol=0.02, atol=0.02)


def test_vmem_budget():
    assert pk.vmem_fits(64, 64, 128)          # decoded_5 stage
    assert not pk.vmem_fits(128, 128, 512)    # whole-image h block: too big


def test_decoder_pallas_matches_reference_path():
    """Full CelebA decoder with use_pallas on vs off: same params, same
    output (interpret mode on CPU)."""
    import jax
    from ladder_tpu.models.celeba import CelebADecoder

    z = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8)),
                    dtype=jnp.float32)
    dec_ref = CelebADecoder(num_hidden_units=16, use_pallas=False)
    dec_pal = CelebADecoder(num_hidden_units=16, use_pallas=True)
    params = dec_ref.init(jax.random.PRNGKey(0), z)
    out_ref = dec_ref.apply(params, z)
    out_pal = dec_pal.apply(params, z)  # identical parameter tree
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# fused Adam (ops/pallas_adam.py)
# ---------------------------------------------------------------------------

def _adam_tree(seed=0):
    rng = np.random.default_rng(seed)
    shapes = {
        "conv": (3, 3, 64, 128),     # eligible (multiple of 128 lanes)
        "dense": (256, 512),         # eligible
        "bias": (77,),               # ragged -> jnp fallback
        "scalar": (),                # jnp fallback
    }
    mk = lambda s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    params = {k: mk(s) for k, s in shapes.items()}
    grads = {k: 3.0 * mk(s) for k, s in shapes.items()}  # exercises the clip
    return params, grads


def test_fused_adam_matches_reference(monkeypatch):
    import ladder_tpu.ops.pallas_adam as pa
    from ladder_tpu.training.optim import (
        ADAM_B1, ADAM_B2, ADAM_EPS, adam_init, adam_update, clip_grads)

    monkeypatch.setattr(pa, "_INTERPRET", True)
    monkeypatch.setattr(pa, "_MIN_FUSED_ELEMS", 1024)
    params, grads = _adam_tree()
    state = adam_init(params)
    # two consecutive steps so the bias-correction t-dependence is covered
    lr = jnp.asarray(2.5e-4, jnp.float32)
    p_ref, s_ref, p_got, s_got = params, state, params, state
    for _ in range(2):
        p_ref, s_ref = adam_update(clip_grads(grads), s_ref, p_ref, lr)
        p_got, s_got = pa.adam_update_fused(grads, s_got, p_got, lr,
                                            ADAM_B1, ADAM_B2, ADAM_EPS)
    for k in params:
        np.testing.assert_allclose(np.asarray(p_got[k]),
                                   np.asarray(p_ref[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
        np.testing.assert_allclose(np.asarray(s_got["m"][k]),
                                   np.asarray(s_ref["m"][k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
        np.testing.assert_allclose(np.asarray(s_got["v"][k]),
                                   np.asarray(s_ref["v"][k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
    assert int(s_got["t"]) == int(s_ref["t"]) == 2
