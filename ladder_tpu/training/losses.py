"""ELBO assembly for all five prior modes.

Faithful re-expression of /root/reference/codes/base.py:257-413 (define_loss)
as a pure, jittable function. Every term keeps the reference's exact formula,
including its quirks:

  * "entropy" terms are E_q[log q] (negative differential entropy) with the
    reference's sign convention (base.py:269-272, 302-305).
  * the hierarchical entropy_t hardcodes dimension 2 regardless of
    representation_size (base.py:345-346) — reproduced literally.
  * the sigma observation scale is floored by the current batch's mean
    absolute pixel error, sigma = max(|sigma_var|, mean_pixel_error)
    (models.py:159); under data parallelism the error is a global mean, which
    XLA computes with an ICI all-reduce when the batch is sharded.
  * the "ours" code-reconstruction mask zeroes the error where the posterior
    std exceeds 1 (base.py:288-291).
  * MC cross-entropy terms draw L=n_MC_samples reparameterised samples and
    average log p_prior over them (base.py:308-313, 323-329, 362-370).

The TF1 tf.cond switches (use_standard_gaussian_prior, use_mask) become
traced booleans via jnp.where so phase changes never trigger recompilation.

The reference computes its losses in a TF1 graph over 3-4 sess.run calls per
batch; here one call produces every scalar the trainers record, and the
fused train step differentiates it once per optimiser group.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ladder_tpu.ops.distributions import (
    LOG_2PI,
    diag_mixture_logpdf,
    gmm_logpdf,
    sample_diag_gaussian,
)


def _use_fused_output(model):
    """The fused leaky->Conv_8->loss-sums output stage applies when the
    model opts in and the backend can run the Pallas kernel (TPU, or CPU
    interpret mode in tests)."""
    if not getattr(model, "fused_output", False):
        return False
    from ladder_tpu.ops import pallas_output
    return pallas_output._INTERPRET or jax.default_backend() == "tpu"


def compute_loss(model, params, x, rng, gm=None, flags=None):
    """Full ELBO and metric set for one batch.

    gm: dict(weights [K], means [K,D], chols [K,D,D]) — the fitted GM
        hyper-prior re-injected each epoch (base.py:885-895). Required for
        'ours'/'GMM'; ignored otherwise.
    flags: dict(use_sg_prior: bool scalar, use_mask: bool scalar).
    Returns (loss_ae, metrics) where metrics also contains loss_prior.
    """
    cfg = model.config
    prior = cfg["prior"]
    # uint8 batches are normalised on device (the reference's /255 happens on
    # the host pipeline, models.py:369-371; doing it here keeps host->HBM
    # traffic at 1 byte/pixel and fuses the scale into the first conv).
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) * (1.0 / 255.0)
    flags = flags or {}
    use_sg = jnp.asarray(flags.get("use_sg_prior", False))
    use_mask = jnp.asarray(flags.get("use_mask", False))

    rng_z, rng_t, rng_mc = jax.random.split(rng, 3)

    code_mean, code_std = model.encode(params, x)
    z = sample_diag_gaussian(rng_z, code_mean, code_std)
    l1_sum = l2_sum = None
    if _use_fused_output(model):
        # one-pass output stage: decoded + reconstruction sums, with a
        # single-pass custom backward (ops/pallas_output.py)
        from ladder_tpu.ops.pallas_output import fused_output_recon
        u = model.decode_trunk(params, z)
        k8, b8 = model.output_stage_params(params)
        decoded, l1_sum, l2_sum = fused_output_recon(u, k8, b8, x)
    else:
        decoded = model.decode(params, z)
    code_size = cfg["code_size"]

    metrics = {}
    metrics["std_dev_code"] = jnp.mean(code_std, axis=0)

    # part I: E_q[log q(z|x)] (base.py:269-272)
    entropy_z = (-0.5 * code_size * LOG_2PI - 0.5 * code_size
                 - jnp.sum(jnp.log(code_std), axis=1))
    entropy_z = jnp.mean(entropy_z)
    metrics["entropy_z"] = entropy_z

    # part II: cross-entropy vs standard gaussian (base.py:277-282)
    ce_sg = (-0.5 * code_size * LOG_2PI
             - 0.5 * (jnp.sum(jnp.square(code_mean), axis=1)
                      + jnp.sum(jnp.square(code_std), axis=1)))
    ce_sg = jnp.mean(ce_sg)
    metrics["crossEntropy_prior_sg"] = ce_sg

    loss_prior = None
    L = cfg["n_MC_samples"]

    if prior == "standard_gaussian":
        crossEntropy_prior = ce_sg

    elif prior in ("ours", "hierarchical"):
        inner_sigma = model.inner_sigma_value(params)
        t_mean, t_std = model.inner_encode(params, z)
        t = sample_diag_gaussian(rng_t, t_mean, t_std)
        decoded_code, decoded_code_std = model.inner_decode(params, t)
        metrics["std_dev_representation"] = jnp.mean(t_std, axis=0)
        metrics["inner_sigma"] = inner_sigma
        metrics["representation_mean"] = t_mean
        metrics["representation_sample"] = t
        metrics["mean_code_error"] = jnp.mean(jnp.abs(decoded_code - z))

        recons_error = jnp.square(z - decoded_code)
        if prior == "ours":
            masked = jnp.where(code_std > 1.0, 0.0, recons_error)
            code_recons_error = jnp.where(use_mask, masked, recons_error)
        else:
            code_recons_error = recons_error
        code_recon_lik = -jnp.mean(
            jnp.sum(code_recons_error / (2.0 * jnp.square(inner_sigma)), axis=1))
        code_l1 = jnp.mean(jnp.sum(jnp.sqrt(code_recons_error), axis=1))
        metrics["code_reconstruction_likelihood"] = code_recon_lik
        metrics["code_l1_reconstruction_error"] = code_l1

        representation_regularisor = (-code_size * jnp.log(inner_sigma)
                                      - 0.5 * code_size * LOG_2PI)
        metrics["representation_regularisor"] = representation_regularisor

        if prior == "ours":
            rs = cfg["representation_size"]
            entropy_t = jnp.mean(-0.5 * rs * LOG_2PI - 0.5 * rs
                                 - jnp.sum(jnp.log(t_std), axis=1))
            samples = sample_diag_gaussian(
                rng_mc,
                jnp.broadcast_to(t_mean, (L,) + t_mean.shape),
                jnp.broadcast_to(t_std, (L,) + t_std.shape))
            ce_t = jnp.mean(gmm_logpdf(samples, gm["weights"], gm["means"],
                                       gm["chols"]))
        else:
            # hierarchical: the reference hardcodes dim 2 in entropy_t
            # (base.py:345-346) — kept literally for parity.
            entropy_t = jnp.mean(-0.5 * 2.0 * LOG_2PI - 0.5 * 2.0
                                 - jnp.sum(jnp.log(t_std), axis=1))
            rs = cfg["representation_size"]
            ce_t = jnp.mean(-0.5 * rs * LOG_2PI
                            - 0.5 * (jnp.sum(jnp.square(t_mean), axis=1)
                                     + jnp.sum(jnp.square(t_std), axis=1)))
        metrics["entropy_t"] = entropy_t
        metrics["crossEntropy_representation"] = ce_t

        elbo_prior = (code_recon_lik + representation_regularisor
                      - entropy_t + ce_t)
        metrics["elbo_prior"] = elbo_prior
        crossEntropy_prior = jnp.where(use_sg, ce_sg, elbo_prior)
        loss_prior = -elbo_prior

        if decoded_code_std is not None:
            # The reference references decoded_z_std_loss without defining it
            # (base.py:496 — broken when TRAIN_decoded_z_std=1). We define it
            # as the Gaussian NLL of z under N(decoded_code, exp(head)^2),
            # with the head read as log-std.
            log_std = decoded_code_std
            z_sg = jax.lax.stop_gradient(z)
            nll = jnp.sum(log_std + 0.5 * jnp.square(
                (z_sg - jax.lax.stop_gradient(decoded_code))
                * jnp.exp(-log_std)), axis=1)
            metrics["decoded_z_std_loss"] = jnp.mean(nll)

    elif prior == "GMM":
        samples = sample_diag_gaussian(
            rng_mc,
            jnp.broadcast_to(code_mean, (L,) + code_mean.shape),
            jnp.broadcast_to(code_std, (L,) + code_std.shape))
        crossEntropy_prior = jnp.mean(
            gmm_logpdf(samples, gm["weights"], gm["means"], gm["chols"]))

    elif prior == "vampPrior":
        pseudo = model.pseudo_inputs(params)
        pseudo_mean, pseudo_std = model.encode(params, pseudo)
        metrics["code_mean_prior"] = pseudo_mean
        metrics["code_std_dev_prior"] = pseudo_std
        samples = sample_diag_gaussian(
            rng_mc,
            jnp.broadcast_to(code_mean, (L,) + code_mean.shape),
            jnp.broadcast_to(code_std, (L,) + code_std.shape))
        weights = jnp.full((cfg["n_mixtures"],), 1.0 / cfg["n_mixtures"])
        ce_vamp = jnp.mean(
            diag_mixture_logpdf(samples, weights, pseudo_mean, pseudo_std))
        crossEntropy_prior = jnp.where(use_sg, ce_sg, ce_vamp)

    else:
        raise ValueError(f"unknown prior: {prior}")

    metrics["crossEntropy_prior"] = crossEntropy_prior

    # reconstruction terms (base.py:372-396)
    if l1_sum is not None:
        # sums come from the fused output-stage kernel; apply the
        # reference's per-batch/per-element scalings
        bsz = x.shape[0]
        n_el = bsz * x.shape[1] * x.shape[2] * x.shape[3]
        metrics["l2_reconstruction_error"] = l2_sum / bsz
        l1 = l1_sum / bsz
        metrics["l1_reconstruction_error"] = l1
        mean_pixel_error = l1_sum / n_el
    else:
        diff = x - decoded
        metrics["l2_reconstruction_error"] = jnp.mean(
            jnp.sum(jnp.square(diff), axis=(1, 2, 3)))
        l1 = jnp.mean(jnp.sum(jnp.abs(diff), axis=(1, 2, 3)))
        metrics["l1_reconstruction_error"] = l1
        mean_pixel_error = jnp.mean(jnp.abs(diff))
    metrics["mean_pixel_error"] = mean_pixel_error
    sigma = model.sigma_value(params)
    if cfg["TRAIN_sigma"] == 1 or cfg["exp_name"] == "celeba":
        # models.py:159 / :597 — celebA floors unconditionally.
        sigma = jnp.maximum(sigma, mean_pixel_error)
    metrics["sigma"] = sigma

    reconstruction_likelihood = -l1 / sigma
    metrics["reconstruction_likelihood"] = reconstruction_likelihood

    input_dim = cfg["dim_input_x"] * cfg["dim_input_y"] * cfg["dim_input_channel"]
    sigma_regularisor = -input_dim * jnp.log(2.0 * sigma)
    metrics["sigma_regularisor"] = sigma_regularisor

    elbo = (reconstruction_likelihood + sigma_regularisor
            - entropy_z + crossEntropy_prior)
    metrics["elbo"] = elbo
    loss_ae = -elbo
    metrics["loss_ae"] = loss_ae
    metrics["decoded"] = decoded
    metrics["code_mean"] = code_mean
    metrics["code_std_dev"] = code_std
    metrics["code_sample"] = z

    if prior == "vampPrior":
        loss_prior = loss_ae  # base.py:408-409
    if loss_prior is not None:
        metrics["loss_prior"] = loss_prior

    return loss_ae, metrics


def identity_gm(n_mixtures, n_dims, dtype=jnp.float32):
    """Uniform-weight standard-normal mixture used while pretraining
    (base.py:869-883) and as the GMM first-epoch feed (base.py:913-923)."""
    return dict(
        weights=jnp.full((n_mixtures,), 1.0 / n_mixtures, dtype=dtype),
        means=jnp.zeros((n_mixtures, n_dims), dtype=dtype),
        chols=jnp.broadcast_to(jnp.eye(n_dims, dtype=dtype),
                               (n_mixtures, n_dims, n_dims)),
    )
