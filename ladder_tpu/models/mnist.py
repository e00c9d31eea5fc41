"""Outer VAE architectures for MNIST digit and fashion.

Faithful re-expression of /root/reference/codes/models.py (MNISTModel_digit
build at :46-148, MNISTModel_fashion at :199-315) as pure flax modules. The
TF1 placeholder/tf.cond switches (is_code_input) become separate pure methods:
`encode` and `decode`; reparameterised sampling lives in the loss layer so
RNG threading is explicit.

Both std-dev heads use the reference's relu parameterisation exactly:
std = relu(dense(h)) + latent_variance_precision (models.py:90-95) — not
softplus/exp. This zeroes gradients for negative pre-activations and floors
the posterior scale; parity depends on it.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ladder_tpu.models.layers import Conv, Dense, leaky_relu
from ladder_tpu.ops.image import depth_to_space, pad_symmetric


class DigitEncoder(nn.Module):
    """models.py:46-95. 28x28x1 -> (code_mean, code_std) each [B, code_size]."""

    num_hidden_units: int
    code_size: int
    kernel_size: int = 3
    latent_variance_precision: float = 1e-3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h, dt = self.num_hidden_units, self.dtype
        x = pad_symmetric(x, 2, 2)                                  # 32x32
        x = leaky_relu(Conv(h // 16, self.kernel_size, strides=2, dtype=dt)(x))  # 16x16
        x = leaky_relu(Conv(h // 4, self.kernel_size, strides=2, dtype=dt)(x))   # 8x8
        x = leaky_relu(Conv(h, self.kernel_size, strides=2, dtype=dt)(x))        # 4x4
        x = x.reshape(x.shape[0], -1)
        x = leaky_relu(Dense(h // 4, dtype=dt)(x))
        x = x.astype(jnp.float32)  # heads in fp32: posterior scales feed logs
        mean = Dense(self.code_size, name="code_mean")(x)
        std = nn.relu(Dense(self.code_size, name="code_std_dev")(x))
        return mean, std + self.latent_variance_precision


class DigitDecoder(nn.Module):
    """models.py:106-148. [B, code_size] -> [B,28,28,1] (relu output)."""

    num_hidden_units: int
    dtype: Any = None

    @nn.compact
    def __call__(self, z):
        h, dt = self.num_hidden_units, self.dtype
        x = leaky_relu(Dense(4 * 4 * h, dtype=dt)(z))
        x = x.reshape(-1, 1, 1, 4 * 4 * h)
        x = depth_to_space(x, 4)                                    # 4x4xh
        x = leaky_relu(Conv(h, 3, dtype=dt)(x))
        x = depth_to_space(x, 2)                                    # 8x8xh/4
        x = leaky_relu(Conv(h // 4, 3, dtype=dt)(x))
        x = depth_to_space(x, 2)                                    # 16x16xh/16
        x = leaky_relu(Conv(h // 16, 3, dtype=dt)(x))
        x = depth_to_space(x, 2)                                    # 32x32xh/64
        x = nn.relu(Conv(1, 5, padding="VALID")(x))                 # 28x28x1
        return x.astype(jnp.float32)


class FashionEncoder(nn.Module):
    """models.py:199-253. Variant: 4 convs, dense(h)."""

    num_hidden_units: int
    code_size: int
    latent_variance_precision: float = 1e-3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h, dt = self.num_hidden_units, self.dtype
        x = pad_symmetric(x, 2, 2)                                  # 32x32
        x = leaky_relu(Conv(h // 4, 3, strides=2, dtype=dt)(x))     # 16x16
        x = leaky_relu(Conv(h // 4, 3, strides=2, dtype=dt)(x))     # 8x8
        x = leaky_relu(Conv(h // 2, 3, strides=2, dtype=dt)(x))     # 4x4
        x = leaky_relu(Conv(h // 2, 3, padding="VALID", dtype=dt)(x))  # 2x2
        x = x.reshape(x.shape[0], -1)
        x = leaky_relu(Dense(h, dtype=dt)(x))
        x = x.astype(jnp.float32)
        mean = Dense(self.code_size, name="code_mean")(x)
        std = nn.relu(Dense(self.code_size, name="code_std_dev")(x))
        return mean, std + self.latent_variance_precision


class FashionDecoder(nn.Module):
    """models.py:264-315. d2s(2)+conv x5 pyramid then 5x5 valid conv."""

    num_hidden_units: int
    dtype: Any = None

    @nn.compact
    def __call__(self, z):
        h, dt = self.num_hidden_units, self.dtype
        x = leaky_relu(Dense(h, dtype=dt)(z))
        x = x.reshape(-1, 1, 1, h)
        x = depth_to_space(x, 2)                                    # 2x2xh/4
        x = leaky_relu(Conv(h, 1, dtype=dt)(x))
        x = depth_to_space(x, 2)                                    # 4x4xh/4
        x = leaky_relu(Conv(h, 3, dtype=dt)(x))
        x = depth_to_space(x, 2)                                    # 8x8xh/4
        x = leaky_relu(Conv(h, 3, dtype=dt)(x))
        x = depth_to_space(x, 2)                                    # 16x16xh/4
        x = leaky_relu(Conv(h, 3, dtype=dt)(x))
        x = depth_to_space(x, 2)                                    # 32x32xh/4
        x = nn.relu(Conv(1, 5, padding="VALID")(x))                 # 28x28x1
        return x.astype(jnp.float32)
