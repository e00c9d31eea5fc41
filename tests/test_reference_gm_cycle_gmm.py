"""Composed GM-cycle parity for the 'GMM' prior family (z-space).

test_reference_gm_cycle.py proves the 'ours' rhythm (t-space VI-BGMM);
this module closes the other fit path the trainer dispatches
(training/trainer.py:512-545): epoch-1 identity-GM steps -> encode ~2k
z-samples via the reference's own code_sample protocol
(/root/reference/codes/base.py:699-709) -> the reference's own warm-start
GaussianMixture ML-EM fit (define_GM_prior, base.py:101-106) -> epoch-2
steps feeding the fit + the 0.01*I covariance jitter of base.py:925-933.

Our side: the sklearn backend (ops/gmm.py:sklearn_fit space_prior='ml')
for exactness, and the jax fit_em backend for distributional closeness —
both feeding their own fit into the next epoch.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_reference_train_parity import (
    COMMON_KEYS, _family_config, _make_data)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

S_SG, S_GM = 10, 10
S = S_SG + S_GM
B, CODE, L, K = 16, 8, 4, 5
FIT_SEED = 0
JITTER = 0.01  # base.py:925-933


@pytest.fixture(scope="module")
def cycle(tmp_path_factory):
    pytest.importorskip("tensorflow")
    from tests.conftest import make_config
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.ops.gmm import fit_em, sklearn_fit
    from ladder_tpu.training import losses
    from ladder_tpu.training.step import init_state, make_train_step
    from ladder_tpu.utils import tf1_import

    scratch = tmp_path_factory.mktemp("refexec_gmm_cycle")
    cfg = _family_config("GMM", make_config)
    cfg["checkpoint_dir"] = str(scratch / "ck")
    model = make_model(cfg)
    params0 = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(7)))
    tf1_import.export_reference_checkpoint(params0, cfg,
                                           cfg["checkpoint_dir"])

    rng = np.random.default_rng(5)
    data = _make_data("GMM", rng)
    F = 2000 // B + 1
    data["fit_batches"] = rng.random((F, B, 28, 28, 1)).astype(np.float32)
    data["eps_fit_z"] = rng.standard_normal((F, B, CODE)).astype(np.float32)
    data["fit_seed"] = np.asarray(FIT_SEED)
    np.savez(scratch / "data.npz", **data)
    (scratch / "cfg.json").write_text(json.dumps(cfg))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tests", "refexec_train_driver.py"),
         "--config", str(scratch / "cfg.json"),
         "--data", str(scratch / "data.npz"),
         "--out", str(scratch / "ref_out.npz")],
        capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-3000:]
    ref = dict(np.load(scratch / "ref_out.npz"))

    # ---- our side: eps queue in driver order (n_sub=2, sites z, mc)
    def queue_for(steps):
        q = []
        for s in steps:
            for i in range(2):
                q += [data["eps_z"][s, i], data["eps_mc"][s, i]]
        return q

    idx, queue = [0], []

    def fed_sample(rng_, mean, std):
        eps = queue[idx[0]]
        idx[0] += 1
        assert eps.shape == tuple(mean.shape), (eps.shape, mean.shape)
        return mean + std * jnp.asarray(eps)

    def set_queue(q):
        queue[:] = q
        idx[0] = 0

    def run_steps(step_fn, state, steps, gm, in_sg):
        traj = {}
        for s in steps:
            e = 1 if in_sg else 2  # GMM: phase 1 IS epoch 1
            lrs = {
                "ae": cfg["learning_rate_ae"] * 0.99 ** (e - 1),
                "sigma": cfg["learning_rate_sigma"] * 0.99 ** (e - 1),
                "prior": cfg["learning_rate_prior"] * 1.01 ** (e - 1),
                "inner_sigma": (cfg["learning_rate_inner_sigma"]
                                * 1.01 ** (e - 1)),
            }
            flags = {"use_sg_prior": jnp.asarray(in_sg),
                     "use_mask": jnp.asarray(False)}
            state, out = step_fn(state, jnp.asarray(data["batches"][s]),
                                 jax.random.PRNGKey(0), gm, flags, lrs,
                                 do_prior=True)
            rec = {**{k: out["ae"][k] for k in (
                       "loss_ae", "elbo", "l1_reconstruction_error",
                       "entropy_z", "crossEntropy_prior",
                       "sigma_regularisor")},
                   "sigma": out["sigma"]["sigma"]}
            for k, v in rec.items():
                traj.setdefault(k, []).append(float(v))
        return state, {k: np.asarray(v) for k, v in traj.items()}

    def gm_of(weights, means, covs):
        covs = np.asarray(covs, np.float64) + JITTER * np.eye(CODE)
        return dict(weights=jnp.asarray(np.asarray(weights, np.float32)),
                    means=jnp.asarray(np.asarray(means, np.float32)),
                    chols=jnp.asarray(
                        np.linalg.cholesky(covs).astype(np.float32)))

    orig = losses.sample_diag_gaussian
    losses.sample_diag_gaussian = fed_sample
    try:
        step_fn = make_train_step(model, jit=False)
        state = init_state(model, jax.random.PRNGKey(7))
        gm_id = losses.identity_gm(K, CODE)

        set_queue(queue_for(range(S_SG)))
        state, _ = run_steps(step_fn, state, range(S_SG), gm_id, in_sg=True)
        assert idx[0] == len(queue)
        snapshot = jax.tree.map(lambda a: jnp.array(a, copy=True), state)

        # our code_sample protocol (trainer._collect_samples space='z')
        chunks = []
        for i in range(data["fit_batches"].shape[0]):
            mean, std = model.encode(
                state["params"], jnp.asarray(data["fit_batches"][i]))
            chunks.append(mean + std * jnp.asarray(data["eps_fit_z"][i]))
        samples = jnp.concatenate(chunks, axis=0)

        np.random.seed(FIT_SEED)
        fit_skl, _ = sklearn_fit(np.asarray(samples), K, mode="fast",
                                 space_prior="ml", warm_model=None)
        fit_jax = fit_em(jax.random.PRNGKey(11), samples, K, max_iter=1000)

        set_queue(queue_for(range(S_SG, S)))
        _, traj_skl = run_steps(
            step_fn, state, range(S_SG, S),
            gm_of(fit_skl.weights, fit_skl.means, fit_skl.covariances),
            in_sg=False)
        assert idx[0] == len(queue)

        set_queue(queue_for(range(S_SG, S)))
        _, traj_jax = run_steps(
            step_fn, snapshot, range(S_SG, S),
            gm_of(fit_jax.weights, fit_jax.means, fit_jax.covariances),
            in_sg=False)
    finally:
        losses.sample_diag_gaussian = orig

    return dict(ref=ref, traj_skl=traj_skl, traj_jax=traj_jax,
                samples=np.asarray(samples), fit_skl=fit_skl,
                fit_jax=fit_jax)


def test_fit_samples_match_reference(cycle):
    ref_s = cycle["ref"]["fit_samples"]
    assert ref_s.shape == cycle["samples"].shape == (2016, CODE)
    np.testing.assert_allclose(cycle["samples"], ref_s,
                               rtol=1e-3, atol=2e-3)


def test_sklearn_cycle_fit_matches_reference(cycle):
    """Same ML-EM hyperparameters (base.py:101-106), seeded kmeans init,
    near-identical z samples -> near-identical fit."""
    ref, fit = cycle["ref"], cycle["fit_skl"]
    np.testing.assert_allclose(np.asarray(fit.weights), ref["fit_w"],
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fit.means), ref["fit_m"],
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(fit.covariances), ref["fit_K"],
                               rtol=2e-2, atol=1e-3)


def test_sklearn_cycle_trajectories_match_reference(cycle):
    ref = cycle["ref"]
    for key in COMMON_KEYS:
        np.testing.assert_allclose(cycle["traj_skl"][key], ref[key][S_SG:],
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"gmm-cycle:{key}")


def test_jax_em_fit_close_to_reference(cycle):
    """fit_em inits differently: assert distributional closeness — mean
    log-density over the fitted samples (the MC-estimate quantity,
    base.py:323-329) and mixture moments."""
    from ladder_tpu.ops.distributions import gmm_logpdf

    ref, fit = cycle["ref"], cycle["fit_jax"]
    x = jnp.asarray(cycle["samples"])

    def moments(w, m, covs):
        w = np.asarray(w, np.float64)
        m = np.asarray(m, np.float64)
        covs = np.asarray(covs, np.float64)
        mu = (w[:, None] * m).sum(0)
        dif = m - mu
        cov = ((w[:, None, None] * covs).sum(0)
               + (w[:, None, None] * dif[:, :, None] * dif[:, None, :])
               .sum(0))
        return mu, cov

    mu_r, cov_r = moments(ref["fit_w"], ref["fit_m"], ref["fit_K"])
    mu_j, cov_j = moments(fit.weights, fit.means, fit.covariances)
    scale = np.sqrt(np.diag(cov_r)).max()
    np.testing.assert_allclose(mu_j, mu_r, atol=0.05 * scale)
    np.testing.assert_allclose(cov_j, cov_r, rtol=0.15, atol=0.02 * scale**2)

    def chols(covs):
        return jnp.asarray(np.linalg.cholesky(
            np.asarray(covs, np.float64)).astype(np.float32))

    lp_ref = gmm_logpdf(x, jnp.asarray(ref["fit_w"].astype(np.float32)),
                        jnp.asarray(ref["fit_m"].astype(np.float32)),
                        chols(ref["fit_K"]))
    lp_jax = gmm_logpdf(x, fit.weights, fit.means, chols(fit.covariances))
    assert abs(float(lp_ref.mean() - lp_jax.mean())) < 0.05


def test_jax_cycle_trajectories_track_reference(cycle):
    """GM enters the GMM-prior ELBO only through the z-space MC estimate
    (base.py:323-329): curves track the reference within a band sized by
    the fits' log-density gap."""
    ref = cycle["ref"]
    for key in ("entropy_z", "sigma", "sigma_regularisor",
                "l1_reconstruction_error"):
        np.testing.assert_allclose(cycle["traj_jax"][key], ref[key][S_SG:],
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"jax-gmm-cycle:{key}")
    for key in ("loss_ae", "elbo", "crossEntropy_prior"):
        a, b = cycle["traj_jax"][key], ref[key][S_SG:]
        denom = np.maximum(np.abs(b), 1.0)
        assert np.max(np.abs(a - b) / denom) < 0.05, (key, a, b)
