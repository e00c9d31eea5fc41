"""FC-DenseNet (Tiramisu) building blocks.

The reference vendors these helpers (/root/reference/codes/modules.py:13-138,
from HasnainRaz/FC-DenseNet-TensorFlow) but never calls them from its models
— SURVEY.md §2 component 13 lists them as vestigial. They are provided here
as idiomatic flax modules for inventory completeness and for users extending
the framework with segmentation-style decoders:

  * ConvLayer       — BN -> relu -> 3x3 conv -> dropout (modules.py:31-58)
  * DenseBlock      — growth-rate concatenating block (modules.py:61-86)
  * TransitionDown  — BN relu 1x1-conv dropout maxpool (modules.py:89-116)
  * TransitionUp    — 3x3 stride-2 transposed conv (modules.py:119-138)

He (variance-scaling) init matches the reference's
variance_scaling_initializer; dropout rate 0.2.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

he_init = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")


class ConvLayer(nn.Module):
    """BN -> relu -> conv3x3 -> dropout (modules.py:31-58)."""

    filters: int
    dropout_rate: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training=True):
        x = nn.BatchNorm(use_running_average=not training, momentum=0.999,
                         epsilon=1e-3, use_scale=False,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.filters, (3, 3), padding="SAME",
                    kernel_init=he_init, dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return x


class DenseBlock(nn.Module):
    """Concatenating dense block: each layer adds growth_k channels; the
    block output concatenates the per-layer features (modules.py:61-86)."""

    layers_per_block: Sequence[int]
    block_nb: int
    growth_k: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training=True):
        dense_out = []
        for i in range(self.layers_per_block[self.block_nb]):
            conv = ConvLayer(self.growth_k, dtype=self.dtype,
                             name=f"layer_{i}")(x, training)
            x = jnp.concatenate([conv, x], axis=3)
            dense_out.append(conv)
        return jnp.concatenate(dense_out, axis=3)


class TransitionDown(nn.Module):
    """BN relu conv1x1 dropout maxpool2x2 (modules.py:89-116)."""

    filters: int
    dropout_rate: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, training=True):
        x = nn.BatchNorm(use_running_average=not training, momentum=0.999,
                         epsilon=1e-3, use_scale=False,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.filters, (1, 1), padding="SAME",
                    kernel_init=he_init, dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        return x


class TransitionUp(nn.Module):
    """3x3 stride-2 transposed conv (modules.py:119-138)."""

    filters: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.filters, (3, 3), strides=(2, 2),
                                padding="SAME", kernel_init=he_init,
                                dtype=self.dtype)(x)
