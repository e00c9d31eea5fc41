"""Distribution primitives used by the ELBO: diagonal Gaussians (sampling +
closed-form entropy/cross-entropy) and full-covariance Gaussian mixtures
(batched Cholesky log-prob + logsumexp).

These replace the reference's tensorflow_probability usage
(/root/reference/codes/base.py:108-124, models.py:97-100) with pure-JAX,
jit/vmap-friendly functions. The mixture log-prob is the hot inner op of the
"ours"/"GMM" cross-entropy MC estimate (base.py:308-313, 323-329): it is a
(L*B, K) batched quadratic form that XLA maps straight onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_2PI = jnp.log(2.0 * jnp.pi)


def sample_diag_gaussian(rng, mean, std):
    """Reparameterised sample from N(mean, diag(std^2))."""
    eps = jax.random.normal(rng, mean.shape, dtype=mean.dtype)
    return mean + std * eps


def diag_gaussian_logpdf(x, mean, std):
    """log N(x; mean, diag(std^2)) summed over the last axis."""
    z = (x - mean) / std
    return -0.5 * jnp.sum(z * z + 2.0 * jnp.log(std) + LOG_2PI, axis=-1)


def diag_gaussian_entropy(std):
    """Closed-form entropy of N(mu, diag(std^2)): 0.5*D*(1+log 2pi) + sum log std."""
    d = std.shape[-1]
    return 0.5 * d * (1.0 + LOG_2PI) + jnp.sum(jnp.log(std), axis=-1)


def mvn_full_logpdf(x, mean, chol):
    """log N(x; mean, LL^T) with precomputed Cholesky factor `chol` [D,D].

    x: [..., D]; mean: [D]; returns [...].
    """
    d = mean.shape[-1]
    diff = x - mean
    # Solve L y = diff (lower-triangular); flatten batch dims to one matmul-
    # shaped solve [D, N] so XLA emits a single triangular solve.
    batch_shape = diff.shape[:-1]
    flat = diff.reshape(-1, d).T                       # [D, N]
    y = jax.scipy.linalg.solve_triangular(chol, flat, lower=True)
    y = y.T.reshape(batch_shape + (d,))
    logdet = jnp.sum(jnp.log(jnp.diagonal(chol)))
    return -0.5 * jnp.sum(y * y, axis=-1) - logdet - 0.5 * d * LOG_2PI


def gmm_cholesky(covs, jitter=0.0):
    """Batched Cholesky of mixture covariances [K,D,D] (+ optional jitter*I)."""
    d = covs.shape[-1]
    if jitter:
        covs = covs + jitter * jnp.eye(d, dtype=covs.dtype)
    return jnp.linalg.cholesky(covs)


def gmm_logpdf(x, weights, means, chols):
    """log p(x) under a full-covariance Gaussian mixture.

    x: [..., D]; weights: [K]; means: [K,D]; chols: [K,D,D].
    Matches the reference's tfd.Mixture(MultivariateNormalFullCovariance)
    log_prob (base.py:108-124). Computed as logsumexp_k(log w_k + log N_k(x)).
    Zero-weight components are masked to -inf rather than dropped so shapes
    stay static under jit.
    """
    comp = jax.vmap(lambda m, c: mvn_full_logpdf(x, m, c))(means, chols)  # [K, ...]
    logw = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, 1e-38)), -jnp.inf)
    logw = logw.reshape((-1,) + (1,) * (comp.ndim - 1))
    return jax.nn.logsumexp(comp + logw, axis=0)


def gmm_logpdf_from_cov(x, weights, means, covs, jitter=0.0):
    return gmm_logpdf(x, weights, means, gmm_cholesky(covs, jitter))


def diag_mixture_logpdf(x, weights, means, stds):
    """log p(x) under a mixture of diagonal Gaussians (vampPrior pseudo
    mixture, base.py:240-254). means/stds: [K,D]; x: [..., D]."""
    comp = jax.vmap(lambda m, s: diag_gaussian_logpdf(x, m, s))(means, stds)
    logw = jnp.log(weights).reshape((-1,) + (1,) * (comp.ndim - 1))
    return jax.nn.logsumexp(comp + logw, axis=0)


def sample_gmm(rng, weights, means, chols, n):
    """Draw n samples from a full-covariance mixture (for prior sampling,
    base.py:1074-1087). Returns [n, D]."""
    k_rng, g_rng = jax.random.split(rng)
    comps = jax.random.categorical(k_rng, jnp.log(jnp.maximum(weights, 1e-38)),
                                   shape=(n,))
    eps = jax.random.normal(g_rng, (n, means.shape[-1]), dtype=means.dtype)
    sel_means = means[comps]                      # [n, D]
    sel_chols = chols[comps]                      # [n, D, D]
    return sel_means + jnp.einsum("nij,nj->ni", sel_chols, eps)
