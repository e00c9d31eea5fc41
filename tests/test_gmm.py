"""On-device GMM fitter tests: recovery of known mixtures, agreement with
sklearn, DP pruning behaviour (base.py:681-789 semantics)."""

import numpy as np

import jax
import jax.numpy as jnp

from ladder_tpu.ops.gmm import fit_bgmm, fit_bgmm_restarts, fit_em, kmeans


def three_blob_data(n_per=200, seed=0):
    rng = np.random.default_rng(seed)
    centers = np.array([[-4.0, 0.0], [4.0, 0.0], [0.0, 5.0]])
    x = np.concatenate([
        c + 0.5 * rng.standard_normal((n_per, 2)) for c in centers])
    return x.astype(np.float32), centers


def _match_means(fitted, true, weights=None, w_floor=0.05):
    """Greedy-match active fitted means to the true centers; return the max
    distance over true centers to their closest active fitted mean."""
    fitted = np.asarray(fitted)
    if weights is not None:
        fitted = fitted[np.asarray(weights) >= w_floor]
    return max(np.min(np.linalg.norm(fitted - t, axis=1)) for t in true)


def test_kmeans_recovers_blobs():
    x, centers = three_blob_data()
    c, labels = kmeans(jax.random.PRNGKey(0), jnp.asarray(x), 3)
    assert _match_means(c, centers) < 0.5
    assert len(np.unique(np.asarray(labels))) == 3


def test_fit_em_recovers_mixture():
    x, centers = three_blob_data()
    fit = fit_em(jax.random.PRNGKey(0), jnp.asarray(x), 3)
    assert bool(fit.converged)
    np.testing.assert_allclose(np.asarray(fit.weights).sum(), 1.0, rtol=1e-5)
    assert _match_means(fit.means, centers) < 0.3
    # covariances near 0.25*I
    assert np.all(np.abs(np.asarray(fit.covariances)
                         - 0.25 * np.eye(2)) < 0.15)


def test_fit_em_matches_sklearn_loglik():
    from sklearn.mixture import GaussianMixture
    x, _ = three_blob_data(seed=1)
    fit = fit_em(jax.random.PRNGKey(1), jnp.asarray(x), 3)
    sk = GaussianMixture(3, covariance_type="full", random_state=0).fit(x)
    ours = float(fit.lower_bound)                    # mean log-lik
    theirs = sk.score(x)
    assert abs(ours - theirs) < 0.05


def test_fit_em_warm_start():
    x, centers = three_blob_data(seed=2)
    fit = fit_em(jax.random.PRNGKey(0), jnp.asarray(x), 3)
    warm = fit_em(jax.random.PRNGKey(0), jnp.asarray(x), 3,
                  init_weights=fit.weights, init_means=fit.means,
                  init_covs=fit.covariances)
    # warm start from the optimum converges immediately
    assert int(warm.n_iter) <= 3
    assert _match_means(warm.means, centers) < 0.3


def test_fit_bgmm_dirichlet_distribution():
    x, centers = three_blob_data(seed=3)
    fit, resp = fit_bgmm(jax.random.PRNGKey(0), jnp.asarray(x), 10,
                         weight_concentration_prior=0.1)
    w = np.asarray(fit.weights)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
    active = w >= 1e-2
    # the sparse Dirichlet prior should keep roughly the true 3 components
    assert 3 <= active.sum() <= 6
    assert _match_means(fit.means, centers, weights=w) < 0.5


def test_fit_bgmm_dirichlet_process_prunes():
    x, centers = three_blob_data(seed=4)
    fit, _ = fit_bgmm(jax.random.PRNGKey(0), jnp.asarray(x), 15,
                      weight_concentration_prior=0.1,
                      dirichlet_process=True, max_iter=2000)
    w = np.asarray(fit.weights)
    active = w >= 1e-2
    assert 3 <= active.sum() <= 6
    assert _match_means(fit.means, centers, weights=w) < 0.5
    # DP weights heavily concentrated on the active sticks
    assert w[active].sum() > 0.95


def test_fit_bgmm_matches_sklearn_active_structure():
    from sklearn.mixture import BayesianGaussianMixture
    x, centers = three_blob_data(seed=5)
    fit, _ = fit_bgmm(jax.random.PRNGKey(0), jnp.asarray(x), 8,
                      weight_concentration_prior=0.1)
    sk = BayesianGaussianMixture(
        n_components=8, covariance_type="full", max_iter=1000,
        weight_concentration_prior_type="dirichlet_distribution",
        weight_concentration_prior=0.1, random_state=0).fit(x)
    ours_active = (np.asarray(fit.weights) >= 1e-2).sum()
    sk_active = (sk.weights_ >= 1e-2).sum()
    assert abs(int(ours_active) - int(sk_active)) <= 1
    # matched active means agree with sklearn's
    assert _match_means(fit.means, sk.means_[sk.weights_ >= 1e-2],
                        weights=fit.weights) < 0.5


def test_fit_bgmm_warm_start_resp():
    x, _ = three_blob_data(seed=6)
    fit, resp = fit_bgmm(jax.random.PRNGKey(0), jnp.asarray(x), 6)
    fit2, _ = fit_bgmm(jax.random.PRNGKey(0), jnp.asarray(x), 6,
                       init_resp=resp)
    # continuing from the previous responsibilities converges and does not
    # regress the lower bound (tol-convergence is not a fixed point, so the
    # warm fit may legitimately take further improving iterations)
    assert bool(fit2.converged)
    assert float(fit2.lower_bound) >= float(fit.lower_bound) - 1e-3


def test_fit_bgmm_restarts_picks_best():
    x, _ = three_blob_data(seed=7)
    fit, _ = fit_bgmm_restarts(jax.random.PRNGKey(0), jnp.asarray(x), 6,
                               n_init=2, dirichlet_process=True)
    assert np.isfinite(float(fit.lower_bound))
