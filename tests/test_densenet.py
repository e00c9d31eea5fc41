"""FC-DenseNet block tests (vestigial reference helpers, modules.py:13-138)."""

import numpy as np

import jax
import jax.numpy as jnp

from ladder_tpu.models.densenet import (
    ConvLayer,
    DenseBlock,
    TransitionDown,
    TransitionUp,
)


def _apply(module, x, training=True):
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, training) if not isinstance(module, TransitionUp) else \
        module.init(jax.random.PRNGKey(0), x)
    if isinstance(module, TransitionUp):
        return module.apply(variables, x)
    return module.apply(variables, x, training,
                        rngs={"dropout": jax.random.PRNGKey(2)},
                        mutable=["batch_stats"])[0]


def test_conv_layer_shape():
    x = jnp.zeros((2, 8, 8, 4))
    y = _apply(ConvLayer(16), x)
    assert y.shape == (2, 8, 8, 16)


def test_dense_block_growth():
    x = jnp.zeros((2, 8, 8, 4))
    y = _apply(DenseBlock(layers_per_block=(3,), block_nb=0, growth_k=5), x)
    # output concatenates 3 layers of growth_k channels
    assert y.shape == (2, 8, 8, 15)


def test_transition_down_halves():
    x = jnp.zeros((2, 8, 8, 12))
    y = _apply(TransitionDown(6), x)
    assert y.shape == (2, 4, 4, 6)


def test_transition_up_doubles():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 6)),
                    dtype=jnp.float32)
    y = _apply(TransitionUp(3), x)
    assert y.shape == (2, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(y)))
