"""Inner VAE over the latent code z -> 2-D representation t (the LaDDer
hyper-prior network) plus the VampPrior pseudo-input module.

Re-expression of /root/reference/codes/base.py:127-254
(define_inner_VAE_prior, define_vampPrior). The TF1 input switches
(is_outer_VAE_input / is_representation_input tf.conds) become pure methods:
encode(z) and decode(t). The std head uses the reference's relu + precision
parameterisation (base.py:158-162).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ladder_tpu.models.layers import Dense, get_activation


class InnerEncoder(nn.Module):
    """base.py:142-168: n_layers dense -> (t_mean, t_std)."""

    num_hidden_units: int
    representation_size: int
    n_layers: int = 5
    activation: str = "leaky_relu"
    latent_variance_precision: float = 1e-3
    dtype: Any = None

    @nn.compact
    def __call__(self, z):
        act = get_activation(self.activation)
        x = z if self.dtype is None else z.astype(self.dtype)
        for i in range(self.n_layers):
            x = act(Dense(self.num_hidden_units, name=f"enc_{i}",
                          dtype=self.dtype)(x))
        x = x.astype(jnp.float32)
        mean = Dense(self.representation_size, name="representation_mean")(x)
        std = nn.relu(Dense(self.representation_size,
                            name="representation_std_dev")(x))
        return mean, std + self.latent_variance_precision


class InnerDecoder(nn.Module):
    """base.py:171-200: n_layers dense -> decoded code (and optional std head
    gated by train_decoded_z_std, mirroring TRAIN_decoded_z_std)."""

    num_hidden_units: int
    code_size: int
    n_layers: int = 5
    activation: str = "leaky_relu"
    train_decoded_z_std: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, t):
        act = get_activation(self.activation)
        x = t if self.dtype is None else t.astype(self.dtype)
        for i in range(self.n_layers):
            x = act(Dense(self.num_hidden_units, name=f"dec_{i}",
                          dtype=self.dtype)(x))
        decoded_code = Dense(self.code_size, name="decoded_code")(
            x.astype(jnp.float32))
        if self.train_decoded_z_std:
            s = t if self.dtype is None else t.astype(self.dtype)
            for i in range(self.n_layers):
                s = act(Dense(self.num_hidden_units, name=f"dec_std_{i}",
                              dtype=self.dtype)(s))
            decoded_code_std = Dense(self.code_size, name="decoded_code_std")(
                s.astype(jnp.float32))
            return decoded_code, decoded_code_std
        return decoded_code, None


class VampPseudoInputs(nn.Module):
    """Trainable pseudo-inputs [n_mixtures, H, W, C] (base.py:224-225).

    The pseudo-inputs are pushed through the (shared) outer encoder by the
    loss layer to form a uniform-weight mixture of diagonal Gaussians
    (base.py:228-254).
    """

    n_mixtures: int
    dim_x: int
    dim_y: int
    dim_c: int

    @nn.compact
    def __call__(self):
        return self.param(
            "psedeu_input",
            nn.initializers.normal(stddev=1.0),
            (self.n_mixtures, self.dim_x, self.dim_y, self.dim_c),
        )
