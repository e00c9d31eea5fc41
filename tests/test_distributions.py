"""Distribution ops vs scipy (SURVEY.md §4 unit-test strategy)."""

import numpy as np
import scipy.stats

import jax
import jax.numpy as jnp

from ladder_tpu.ops.distributions import (
    diag_gaussian_entropy,
    diag_gaussian_logpdf,
    diag_mixture_logpdf,
    gmm_cholesky,
    gmm_logpdf,
    mvn_full_logpdf,
    sample_diag_gaussian,
    sample_gmm,
)


def _random_spd(rng, d):
    a = rng.standard_normal((d, d))
    return a @ a.T + d * np.eye(d)


def test_diag_gaussian_logpdf_vs_scipy():
    rng = np.random.default_rng(0)
    mean = rng.standard_normal(5).astype(np.float32)
    std = rng.uniform(0.5, 2.0, 5).astype(np.float32)
    x = rng.standard_normal((7, 5)).astype(np.float32)
    got = diag_gaussian_logpdf(jnp.array(x), jnp.array(mean), jnp.array(std))
    want = scipy.stats.multivariate_normal(mean, np.diag(std**2)).logpdf(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_diag_gaussian_entropy_analytic():
    std = np.array([0.5, 1.0, 2.0], dtype=np.float32)
    got = diag_gaussian_entropy(jnp.array(std))
    want = scipy.stats.multivariate_normal(np.zeros(3), np.diag(std**2)).entropy()
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_mvn_full_logpdf_vs_scipy():
    rng = np.random.default_rng(1)
    d = 4
    cov = _random_spd(rng, d)
    mean = rng.standard_normal(d)
    x = rng.standard_normal((10, d))
    chol = np.linalg.cholesky(cov)
    got = mvn_full_logpdf(jnp.array(x, dtype=jnp.float64),
                          jnp.array(mean, dtype=jnp.float64),
                          jnp.array(chol, dtype=jnp.float64))
    want = scipy.stats.multivariate_normal(mean, cov).logpdf(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_gmm_logpdf_vs_scipy_mixture():
    rng = np.random.default_rng(2)
    k, d = 3, 2
    w = rng.dirichlet(np.ones(k))
    means = rng.standard_normal((k, d))
    covs = np.stack([_random_spd(rng, d) for _ in range(k)])
    x = rng.standard_normal((20, d))
    chols = gmm_cholesky(jnp.array(covs))
    got = gmm_logpdf(jnp.array(x, dtype=jnp.float32), jnp.array(w, dtype=jnp.float32),
                     jnp.array(means, dtype=jnp.float32), chols.astype(jnp.float32))
    want = np.log(sum(
        w[i] * scipy.stats.multivariate_normal(means[i], covs[i]).pdf(x)
        for i in range(k)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_gmm_logpdf_zero_weight_masked():
    w = jnp.array([0.0, 1.0])
    means = jnp.zeros((2, 2))
    covs = jnp.stack([jnp.eye(2), jnp.eye(2)])
    x = jnp.zeros((1, 2))
    got = gmm_logpdf(x, w, means, gmm_cholesky(covs))
    want = scipy.stats.multivariate_normal(np.zeros(2), np.eye(2)).logpdf([0, 0])
    np.testing.assert_allclose(float(got[0]), want, rtol=1e-4)


def test_diag_mixture_logpdf():
    rng = np.random.default_rng(3)
    k, d = 4, 3
    w = np.full(k, 1 / k)
    means = rng.standard_normal((k, d)).astype(np.float32)
    stds = rng.uniform(0.5, 1.5, (k, d)).astype(np.float32)
    x = rng.standard_normal((5, d)).astype(np.float32)
    got = diag_mixture_logpdf(jnp.array(x), jnp.array(w, dtype=jnp.float32),
                              jnp.array(means), jnp.array(stds))
    want = np.log(sum(
        w[i] * scipy.stats.multivariate_normal(means[i], np.diag(stds[i]**2)).pdf(x)
        for i in range(k)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_reparameterised_sample_stats_and_gradflow():
    key = jax.random.PRNGKey(0)
    mean = jnp.array([1.0, -2.0])
    std = jnp.array([0.5, 1.5])
    samples = sample_diag_gaussian(
        key, jnp.broadcast_to(mean, (20000, 2)), jnp.broadcast_to(std, (20000, 2)))
    np.testing.assert_allclose(np.asarray(samples.mean(0)), [1.0, -2.0], atol=0.05)
    np.testing.assert_allclose(np.asarray(samples.std(0)), [0.5, 1.5], atol=0.05)

    # gradient flows through the reparameterisation to mean and std
    g = jax.grad(lambda m, s: jnp.sum(sample_diag_gaussian(key, m, s) ** 2),
                 argnums=(0, 1))(mean, std)
    assert all(np.all(np.asarray(x) != 0) for x in g)


def test_sample_gmm_moments():
    key = jax.random.PRNGKey(1)
    w = jnp.array([0.3, 0.7])
    means = jnp.array([[0.0, 0.0], [4.0, 4.0]])
    covs = jnp.stack([jnp.eye(2) * 0.25, jnp.eye(2) * 0.25])
    s = sample_gmm(key, w, means, gmm_cholesky(covs), 20000)
    want_mean = 0.3 * means[0] + 0.7 * means[1]
    np.testing.assert_allclose(np.asarray(s.mean(0)), np.asarray(want_mean),
                               atol=0.1)
