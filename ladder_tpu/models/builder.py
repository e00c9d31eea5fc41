"""LadderModel: bundles the outer VAE, inner VAE and prior modules for one
dataset into pure functions over a grouped parameter pytree.

Parameter groups mirror the reference's variable-scope partitioning
(/root/reference/codes/base.py:415-455): 'encoder', 'decoder', 'sigma',
'prior' (inner VAE nets + vamp pseudo-inputs), 'inner_sigma'. The same
granularity drives the per-group optimisers (base.py:457-512) and the
two-saver checkpoint layout (vae-model = encoder+decoder+sigma,
prior-model = prior+inner_sigma; base.py:37-48).

Model dispatch on config['exp_name'] matches train.py:44-49.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from ladder_tpu.models.celeba import CelebADecoder, CelebAEncoder
from ladder_tpu.models.inner_vae import InnerDecoder, InnerEncoder, VampPseudoInputs
from ladder_tpu.models.mnist import (
    DigitDecoder,
    DigitEncoder,
    FashionDecoder,
    FashionEncoder,
)

PRIORS_WITH_INNER_VAE = ("ours", "hierarchical")
PRIORS_WITH_PRIOR_MODEL = ("ours", "hierarchical", "vampPrior")
PRIORS_WITH_GM = ("ours", "GMM")


@dataclass
class LadderModel:
    config: dict
    encoder: Any = field(init=False)
    decoder: Any = field(init=False)
    inner_encoder: Any = field(init=False, default=None)
    inner_decoder: Any = field(init=False, default=None)
    vamp: Any = field(init=False, default=None)
    fused_output: bool = field(init=False, default=False)

    def __post_init__(self):
        cfg = self.config
        h = cfg["num_hidden_units"]
        exp = cfg["exp_name"]
        lvp = cfg["latent_variance_precision"]
        # compute dtype: 'bfloat16' runs the conv/dense stacks on the MXU at
        # bf16 with fp32 params and fp32 loss math; 'float32' (default) is
        # bit-faithful to the reference.
        dt = {"float32": None, "bfloat16": jnp.bfloat16,
              None: None}[cfg.get("dtype", "float32")]
        self.dtype = dt
        if exp == "mnist_digit":
            self.encoder = DigitEncoder(h, cfg["code_size"], cfg["kernel_size"],
                                        lvp, dtype=dt)
            self.decoder = DigitDecoder(h, dtype=dt)
        elif exp == "mnist_fashion":
            self.encoder = FashionEncoder(h, cfg["code_size"], lvp, dtype=dt)
            self.decoder = FashionDecoder(h, dtype=dt)
        elif exp == "celeba":
            # bn_mode='frozen' (serving only): BN layers normalise with
            # fixed population statistics supplied via set_bn_stats()
            # instead of batch statistics — per-row-deterministic inference
            # (training always uses batch stats: reference models.py:471)
            self.encoder = CelebAEncoder(h, cfg["code_size"], cfg["kernel_size"],
                                         lvp, dtype=dt,
                                         bn_frozen=cfg.get("bn_mode")
                                         == "frozen")
            self.decoder = CelebADecoder(
                h, dtype=dt,
                use_pallas=bool(cfg.get("use_pallas", 0)),
                fuse_upsample=bool(cfg.get("fuse_upsample_conv", 1)))
            # fused leaky->Conv_8->loss-sums output stage (Pallas; TPU or
            # interpret mode). The loss checks availability at trace time.
            self.fused_output = bool(cfg.get("fused_output_stage", 0))
        else:
            raise ValueError(f"unknown exp_name: {exp}")

        if cfg["prior"] in PRIORS_WITH_INNER_VAE:
            self.inner_encoder = InnerEncoder(
                cfg["num_hidden_units_inner_VAE"],
                cfg["representation_size"],
                cfg["n_layers_inner_VAE"],
                cfg["inner_activation"],
                lvp,
                dtype=dt,
            )
            self.inner_decoder = InnerDecoder(
                cfg["num_hidden_units_inner_VAE"],
                cfg["code_size"],
                cfg["n_layers_inner_VAE"],
                cfg["inner_activation"],
                bool(cfg["TRAIN_decoded_z_std"]),
                dtype=dt,
            )
        elif cfg["prior"] == "vampPrior":
            self.vamp = VampPseudoInputs(
                cfg["n_mixtures"], cfg["dim_input_x"], cfg["dim_input_y"],
                cfg["dim_input_channel"],
            )

    # ---- init ---------------------------------------------------------
    def init(self, rng):
        """Build the grouped parameter pytree."""
        cfg = self.config
        x = jnp.zeros(
            (1, cfg["dim_input_x"], cfg["dim_input_y"], cfg["dim_input_channel"]),
            dtype=jnp.float32,
        )
        r_enc, r_dec, r_inner_e, r_inner_d, r_vamp = jax.random.split(rng, 5)
        enc_vars = self.encoder.init(r_enc, x)
        z = jnp.zeros((1, cfg["code_size"]), dtype=jnp.float32)
        dec_vars = self.decoder.init(r_dec, z)
        params = {
            "encoder": enc_vars["params"],
            "decoder": dec_vars["params"],
            # sigma = sqrt(square(var)) = |var| in the reference
            # (models.py:152-155); store the raw scalar.
            "sigma": {"sigma": jnp.asarray(cfg["sigma"], dtype=jnp.float32)},
        }
        prior_group = {}
        if self.inner_encoder is not None:
            t = jnp.zeros((1, cfg["representation_size"]), dtype=jnp.float32)
            prior_group["inner_encoder"] = self.inner_encoder.init(r_inner_e, z)["params"]
            prior_group["inner_decoder"] = self.inner_decoder.init(r_inner_d, t)["params"]
            params["inner_sigma"] = {
                "inner_sigma": jnp.asarray(cfg["inner_sigma"], dtype=jnp.float32)
            }
        if self.vamp is not None:
            prior_group["vamp"] = self.vamp.init(r_vamp)["params"]
        if prior_group:
            params["prior"] = prior_group
        return params

    # ---- pure forward functions --------------------------------------
    def set_bn_stats(self, stats):
        """Attach estimated population BN statistics (bn_mode='frozen'):
        {'BatchNormTrain_i': {'mean': [c], 'var': [c]}} per encoder BN layer
        (ladder_tpu.serving.bn_freeze.estimate_bn_stats)."""
        self.bn_stats = stats

    def encode(self, params, x):
        if getattr(self.encoder, "bn_frozen", False):
            stats = getattr(self, "bn_stats", None)
            if stats is None:
                raise ValueError(
                    "bn_mode='frozen' needs population statistics: call "
                    "set_bn_stats() with the output of "
                    "ladder_tpu.serving.bn_freeze.estimate_bn_stats "
                    "(or load bn_stats.npz)")
            return self.encoder.apply(
                {"params": params["encoder"], "bn_stats": stats}, x)
        return self.encoder.apply({"params": params["encoder"]}, x)

    def decode(self, params, z):
        return self.decoder.apply({"params": params["decoder"]}, z)

    def decode_trunk(self, params, z):
        """CelebA only: the decoder up to (not including) the final
        leaky_relu -> Conv_8 output stage — the input of the fused
        output-stage kernel (ops/pallas_output.py)."""
        return self.decoder.apply({"params": params["decoder"]}, z,
                                  trunk_only=True)

    def output_stage_params(self, params):
        """(kernel [1,1,C,Co], bias [Co]) of the CelebA Conv_8 head."""
        p = params["decoder"]["Conv_8"]
        return p["kernel"], p["bias"]

    def inner_encode(self, params, z):
        return self.inner_encoder.apply(
            {"params": params["prior"]["inner_encoder"]}, z)

    def inner_decode(self, params, t):
        return self.inner_decoder.apply(
            {"params": params["prior"]["inner_decoder"]}, t)

    def pseudo_inputs(self, params):
        return self.vamp.apply({"params": params["prior"]["vamp"]})

    def sigma_value(self, params):
        """|sigma_var| (models.py:153-155); the max-with-pixel-error floor is
        applied in the loss where the batch error is known."""
        return jnp.abs(params["sigma"]["sigma"])

    def inner_sigma_value(self, params):
        """|inner_sigma| clamped to [lb, ub] when trained (base.py:204-213)."""
        s = jnp.abs(params["inner_sigma"]["inner_sigma"])
        if self.config["TRAIN_inner_sigma"] == 1:
            s = jnp.clip(s, self.config["inner_sigma_lb"],
                         self.config["inner_sigma_ub"])
        return s

    def count_params(self):
        """Per-group trainable parameter counts, mirroring
        count_trainable_variables (utils.py:96-113). Shape-level only:
        eval_shape traces init without allocating or initialising a second
        parameter set."""
        params = jax.eval_shape(self.init, jax.random.PRNGKey(0))
        def count(tree):
            return sum(x.size for x in jax.tree.leaves(tree))
        n_enc = count(params["encoder"])
        n_dec = count(params["decoder"])
        n_sigma = count(params["sigma"])
        n_prior = count(params.get("prior", {}))
        n_inner_sigma = count(params.get("inner_sigma", {}))
        return [n_enc, n_dec, n_sigma, n_prior, n_inner_sigma]


def make_model(config) -> LadderModel:
    return LadderModel(config)
