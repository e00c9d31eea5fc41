"""CelebA-128 outer VAE: BN-conv pyramid encoder + StyleGAN-modulated decoder.

Re-expression of /root/reference/codes/models.py:392-598 (CelebAModel_densenet)
as flax modules. The encoder is 6x [conv -> batch_norm -> leaky_relu]
(128->64->32->16->8->4-> valid), always in training mode (batch statistics;
models.py:471). The decoder maps z through an 8-layer MLP "dlatent" network
and a conv/resize pyramid with per-stage instance_norm + style modulation
(models.py:505-587); bilinear resizes use TF1 legacy coordinates
(align_corners=False) via resize_bilinear_tf1 for numeric parity.

The raw decoder output is returned (the reference's is_training const is
True, so the clip-to-[0,1] branch never runs in the graph; models.py:587);
callers clip for visualisation exactly as the reference does in numpy.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ladder_tpu.models.layers import (
    BatchNormTrain,
    Conv,
    Dense,
    StyleMod,
    leaky_relu,
    xavier,
)
from ladder_tpu.ops.image import (
    conv3x3_up2x_tf1,
    instance_norm,
    resize_bilinear_tf1,
)


class CelebAEncoder(nn.Module):
    """models.py:392-488. 128x128x3 -> (code_mean, code_std)."""

    num_hidden_units: int
    code_size: int
    kernel_size: int = 3
    latent_variance_precision: float = 1e-3
    bn_axis_name: str | None = None  # cross-replica BN if set
    dtype: Any = None
    bn_frozen: bool = False  # serving-only: fixed population BN statistics

    @nn.compact
    def __call__(self, x):
        h, dt = self.num_hidden_units, self.dtype
        k = self.kernel_size
        if dt is not None:
            x = x.astype(dt)
        widths = [h // 4, h // 4, h // 2, h // 2, h]
        for w in widths:                                   # 128->64->32->16->8->4
            x = Conv(w, k, strides=2, dtype=dt)(x)
            x = BatchNormTrain(axis_name=self.bn_axis_name,
                               frozen=self.bn_frozen)(x)
            x = leaky_relu(x)
        x = Conv(h, k, padding="VALID", dtype=dt)(x)       # 4x4 -> 2x2 (k=3)
        x = BatchNormTrain(axis_name=self.bn_axis_name,
                           frozen=self.bn_frozen)(x)
        x = leaky_relu(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        mean = Dense(self.code_size, name="code_mean")(x)
        std = nn.relu(Dense(self.code_size, name="code_std_dev")(x))
        return mean, std + self.latent_variance_precision


class UpConvTF1(nn.Module):
    """Fused [TF1 bilinear 2x upsample -> SAME 3x3 conv] as one lhs-dilated
    convolution (ops/image.py:conv3x3_up2x_tf1). Parameter names and shapes
    ('kernel' [3,3,ci,co], 'bias' [co]) are identical to nn.Conv, so
    checkpoints are interchangeable with the explicit resize+Conv path."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        kernel = self.param("kernel", xavier, (3, 3, ci, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dt = self.dtype or x.dtype
        return conv3x3_up2x_tf1(x.astype(dt), kernel.astype(dt),
                                bias.astype(dt))


class CelebADecoder(nn.Module):
    """models.py:499-587. [B, code_size] -> [B,128,128,3] (unclipped).

    use_pallas=True routes each instance_norm -> style_mod -> leaky chain
    through the fused Pallas kernel (one VMEM pass instead of 3+ HBM passes;
    identical math and parameters).

    fuse_upsample=True (default) computes each [2x resize -> 3x3 conv] pair
    as one lhs-dilated conv (exact same math; the full-resolution upsample
    intermediate never exists — measured -29% fwd+bwd on the 64->128 stage,
    v5e). Conv names are pinned so both paths share checkpoints."""

    num_hidden_units: int
    dtype: Any = None
    use_pallas: bool = False
    fuse_upsample: bool = True

    @nn.compact
    def __call__(self, z, trunk_only=False):
        """trunk_only=True returns the pre-activation feeding the final
        leaky_relu -> Conv_8 stage instead of the image — the input of the
        fused output-stage kernel (ops/pallas_output.py). Conv_8's
        parameters are still created at init (trunk_only is never used
        there), so checkpoints are identical either way."""
        h, dt = self.num_hidden_units, self.dtype
        if dt is not None:
            z = z.astype(dt)
        encoded = leaky_relu(Dense(h, dtype=dt)(z))

        def in_style(x, num):
            """instance_norm -> style_mod(num) -> leaky_relu."""
            if self.use_pallas:
                from ladder_tpu.ops.pallas_kernels import vmem_fits
                if vmem_fits(x.shape[1], x.shape[2], x.shape[3],
                             dtype=x.dtype):
                    return StyleMod(name=f"style_mod_{num}", dtype=dt,
                                    fuse_norm_lrelu=True)(x, dlatent)
            x = instance_norm(x)
            return leaky_relu(
                StyleMod(name=f"style_mod_{num}", dtype=dt)(x, dlatent))

        def up_conv(x, feats, name):
            """[2x TF1 bilinear resize -> SAME 3x3 conv]."""
            if self.fuse_upsample:
                return UpConvTF1(feats, dtype=dt, name=name)(x)
            x = resize_bilinear_tf1(x, 2 * x.shape[1], 2 * x.shape[2])
            return Conv(feats, 3, name=name, dtype=dt)(x)

        # 8-layer dlatent mapping network (models.py:505-510)
        dlatent = encoded
        for i in range(8):
            dlatent = leaky_relu(Dense(h, name=f"dlatent_{i}", dtype=dt)(dlatent))

        # decoded_1: 1x1 conv on the reshaped code, resize to 2x2
        x = encoded.reshape(-1, 1, 1, h)
        x = Conv(h, 1, name="Conv_0", dtype=dt)(x)
        x = resize_bilinear_tf1(x, 2, 2)
        # decoded_2: 2x2, instance_norm + style mod 0
        x = in_style(Conv(h, 3, name="Conv_1", dtype=dt)(x), 0)
        # decoded_3: -> 8 -> conv -> 16
        x = in_style(Conv(h, 3, name="Conv_2", dtype=dt)(x), 1)
        x = resize_bilinear_tf1(x, 8, 8)
        x = leaky_relu(Conv(h, 3, name="Conv_3", dtype=dt)(x))
        # decoded_4: -> 32 -> conv -> 64
        x = in_style(up_conv(x, h // 2, "Conv_4"), 2)
        x = leaky_relu(up_conv(x, h // 2, "Conv_5"))
        # decoded_5: -> 128 -> conv
        x = in_style(up_conv(x, h // 4, "Conv_6"), 3)
        x = up_conv(x, h // 4, "Conv_7")
        if trunk_only:
            return x
        x = leaky_relu(x)
        # decoded_6: 1x1 conv to 3 channels, linear (fp32 output)
        x = Conv(3, 1, name="Conv_8", dtype=dt)(x)
        return x.astype(jnp.float32)
