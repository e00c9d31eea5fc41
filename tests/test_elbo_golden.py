"""Golden-value test: the complete 'ours' ELBO recomputed independently in
numpy/scipy from the model's intermediate tensors must match compute_loss
term by term (the parity yardstick of SURVEY.md §4 — every formula from
reference base.py:257-413 re-derived outside our loss code)."""

import numpy as np
import scipy.stats

import jax
import jax.numpy as jnp

from ladder_tpu.models.builder import make_model
from ladder_tpu.ops.distributions import sample_diag_gaussian
from ladder_tpu.training.losses import compute_loss
from tests.conftest import make_config


def test_ours_elbo_matches_numpy_reimplementation():
    cfg = make_config(prior="ours", n_MC_samples=16, n_mixtures=3,
                      num_hidden_units=64, num_hidden_units_inner_VAE=16,
                      n_layers_inner_VAE=2, batch_size=8)
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).uniform(0, 1, (8, 28, 28, 1)).astype(
        np.float32)

    # a non-trivial GM prior
    rng_np = np.random.default_rng(1)
    K = cfg["n_mixtures"]
    gm_w = rng_np.dirichlet(np.ones(K)).astype(np.float32)
    gm_m = rng_np.standard_normal((K, 2)).astype(np.float32)
    gm_K = np.stack([np.eye(2) * s for s in [0.5, 1.0, 2.0]]).astype(
        np.float32)
    gm = dict(weights=jnp.asarray(gm_w), means=jnp.asarray(gm_m),
              chols=jnp.linalg.cholesky(jnp.asarray(gm_K)))

    rng = jax.random.PRNGKey(7)
    flags = {"use_sg_prior": jnp.asarray(False),
             "use_mask": jnp.asarray(False)}
    loss, m = compute_loss(model, params, jnp.asarray(x), rng, gm, flags)

    # ---- recompute everything in numpy from the intermediates ----------
    rng_z, rng_t, rng_mc = jax.random.split(rng, 3)
    code_mean = np.asarray(m["code_mean"])
    code_std = np.asarray(m["code_std_dev"])
    z = np.asarray(m["code_sample"])
    decoded = np.asarray(m["decoded"])
    t_mean, t_std = [np.asarray(a) for a in model.inner_encode(params, jnp.asarray(z))]
    decoded_code = np.asarray(model.inner_decode(params, jnp.asarray(
        np.asarray(m["representation_sample"])))[0])
    inner_sigma = float(model.inner_sigma_value(params))
    D = cfg["code_size"]
    Dt = cfg["representation_size"]
    log2pi = np.log(2 * np.pi)

    # z sample correctness: z = mean + std*eps with the rng_z draw
    z_check = np.asarray(sample_diag_gaussian(rng_z, jnp.asarray(code_mean),
                                              jnp.asarray(code_std)))
    np.testing.assert_allclose(z, z_check, rtol=1e-5)

    # entropy_z (base.py:269-272)
    entropy_z = np.mean(-0.5 * D * log2pi - 0.5 * D
                        - np.sum(np.log(code_std), 1))
    np.testing.assert_allclose(float(m["entropy_z"]), entropy_z, rtol=1e-4)

    # inner VAE terms (base.py:285-315)
    recons_error = (z - decoded_code) ** 2
    code_recon_lik = -np.mean(np.sum(recons_error / (2 * inner_sigma ** 2), 1))
    np.testing.assert_allclose(float(m["code_reconstruction_likelihood"]),
                               code_recon_lik, rtol=1e-3)
    repr_reg = -D * np.log(inner_sigma) - 0.5 * D * log2pi
    np.testing.assert_allclose(float(m["representation_regularisor"]),
                               repr_reg, rtol=1e-4)
    entropy_t = np.mean(-0.5 * Dt * log2pi - 0.5 * Dt
                        - np.sum(np.log(t_std), 1))
    np.testing.assert_allclose(float(m["entropy_t"]), entropy_t, rtol=1e-4)

    # MC cross-entropy: same sample draw, scipy mixture logpdf
    L = cfg["n_MC_samples"]
    samples = np.asarray(sample_diag_gaussian(
        rng_mc,
        jnp.broadcast_to(jnp.asarray(t_mean), (L,) + t_mean.shape),
        jnp.broadcast_to(jnp.asarray(t_std), (L,) + t_std.shape)))
    pdf = sum(gm_w[i] * scipy.stats.multivariate_normal(
        gm_m[i], gm_K[i]).pdf(samples.reshape(-1, 2)) for i in range(K))
    ce_t = np.mean(np.log(pdf))
    np.testing.assert_allclose(float(m["crossEntropy_representation"]),
                               ce_t, rtol=1e-3)

    elbo_prior = code_recon_lik + repr_reg - entropy_t + ce_t
    np.testing.assert_allclose(float(m["elbo_prior"]), elbo_prior, rtol=1e-3)

    # reconstruction terms (base.py:372-396)
    l1 = np.mean(np.sum(np.abs(x - decoded), axis=(1, 2, 3)))
    np.testing.assert_allclose(float(m["l1_reconstruction_error"]), l1,
                               rtol=1e-4)
    mpe = np.mean(np.abs(x - decoded))
    sigma = max(abs(float(params["sigma"]["sigma"])), mpe)
    np.testing.assert_allclose(float(m["sigma"]), sigma, rtol=1e-5)
    recon_lik = -l1 / sigma
    sigma_reg = -(28 * 28) * np.log(2 * sigma)

    elbo = recon_lik + sigma_reg - entropy_z + elbo_prior
    np.testing.assert_allclose(float(m["elbo"]), elbo, rtol=1e-3)
    np.testing.assert_allclose(float(loss), -elbo, rtol=1e-3)
