"""Shared NN building blocks for the LaDDer model family.

TPU-first flax.linen replacements for the reference's tf.layers usage:
xavier/glorot-uniform init everywhere (tf.contrib.layers.xavier_initializer,
/root/reference/codes/models.py:82), leaky_relu with TF's default alpha=0.2,
StyleGAN-style style modulation (/root/reference/codes/modules.py:6-10) and
training-mode batch norm (the CelebA encoder always normalises with batch
statistics — is_training is a constant True, models.py:471).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

# TF's tf.nn.leaky_relu default alpha is 0.2; jax.nn.leaky_relu defaults to
# 0.01, so always go through this helper.
def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def get_activation(name) -> Callable:
    """Resolve config['inner_activation'] (base.py:134-139)."""
    if name == "tanh":
        return jnp.tanh
    if name == "relu":
        return nn.relu
    if name == "leaky_relu":
        return leaky_relu
    raise ValueError(f"unknown activation: {name}")


xavier = nn.initializers.glorot_uniform()


def Dense(features, name=None):
    return nn.Dense(features, kernel_init=xavier, name=name)


def Conv(features, kernel_size, strides=1, padding="SAME", name=None):
    return nn.Conv(
        features,
        kernel_size=(kernel_size, kernel_size),
        strides=(strides, strides),
        padding=padding,
        kernel_init=xavier,
        name=name,
    )


class StyleMod(nn.Module):
    """x * (scale+1) + shift where (scale, shift) = Dense(dlatent, 2C)
    (modules.py:6-10). x: [B,H,W,C], dlatent: [B,D]."""

    @nn.compact
    def __call__(self, x, dlatent):
        c = x.shape[-1]
        style = Dense(2 * c, name="style")(dlatent)
        style = style.reshape(-1, 2, 1, 1, c)
        return x * (style[:, 0] + 1.0) + style[:, 1]


class BatchNormTrain(nn.Module):
    """Batch normalisation that always uses batch statistics, with learnable
    scale/offset. Matches tf.layers.batch_normalization(training=True)
    (epsilon 1e-3) as used in the CelebA encoder (models.py:398-460). The
    reference's moving averages are updated but never read (is_training is
    constant True), so we do not carry them.

    Under data parallelism the statistics are per-replica by default (the
    reference's per-device semantics); pass axis_name to psum across the mesh.
    """

    epsilon: float = 1e-3
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        reduce_axes = tuple(range(x.ndim - 1))
        if self.axis_name is not None:
            import jax
            mean = jax.lax.pmean(jnp.mean(x, axis=reduce_axes), self.axis_name)
            mean2 = jax.lax.pmean(jnp.mean(x * x, axis=reduce_axes), self.axis_name)
            var = mean2 - mean * mean
        else:
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.var(x, axis=reduce_axes)
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        return (x - mean) * inv * gamma + beta
