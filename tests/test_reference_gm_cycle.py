"""COMPOSED GM-cycle parity with the reference (VERDICT r4 item 3).

test_reference_train_parity.py proves train-op trajectories with FIXED GM
feeds; this module executes the signature LaDDer rhythm END-TO-END on both
sides: sg-phase training -> encode ~2k samples -> fit the mixture -> feed
the OWN fit into the next epoch's steps
(/root/reference/codes/base.py:681-748 + 885-895, trainers.py:47-48).

Reference side (refexec_train_driver.py cycle mode): its own graph encodes
its own representation_sample batches, its own sklearn
BayesianGaussianMixture (the define_GM_prior object, base.py:88-106) fits
them, and compute_feeddict re-injects .means_/.covariances_/.weights_.

Our side, twice:
  - gmm_backend='sklearn' semantics (ops/gmm.py:sklearn_fit — the exact
    call training/trainer.py:514 makes): fitted-GM equality and phase-2
    trajectory parity at near-fixed-feed tolerances.
  - the jax VI-BGMM backend (ops/gmm.py:fit_bgmm — trainer.py:534): a
    DIFFERENT initialisation, so closeness is asserted distributionally
    (mixture moments + mean log-density over the fitted samples) plus
    phase-2 trajectory agreement at correspondingly looser tolerances.

Noise identity: as in test_reference_train_parity — every reference sample
site reads eps from placeholders; our side consumes the identical stream,
so any divergence is framework math (and, for the jax backend, the fit
initialisation), not noise.
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
    COMMON_KEYS, INNER_KEYS, _family_config, _make_data)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

S_SG, S_GM = 10, 10
S = S_SG + S_GM
B, CODE, REP, L, K = 16, 8, 2, 4, 5
FIT_SEED = 0


def _cycle_data(rng):
    """Train-step data (test_reference_train_parity layout) + the fit
    batches/eps for the composed cycle. F follows the reference's fast-fit
    count: 2000//batch_size + 1 batches (base.py:683)."""
    data = _make_data("ours", rng)
    F = 2000 // B + 1
    data["fit_batches"] = rng.random((F, B, 28, 28, 1)).astype(np.float32)
    data["eps_fit_z"] = rng.standard_normal((F, B, CODE)).astype(np.float32)
    data["eps_fit_t"] = rng.standard_normal((F, B, REP)).astype(np.float32)
    data["fit_seed"] = np.asarray(FIT_SEED)
    return data


@pytest.fixture(scope="module")
def cycle(tmp_path_factory):
    """Run both sides of the composed cycle once; share across tests."""
    pytest.importorskip("tensorflow")
    from tests.conftest import make_config
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.ops.gmm import fit_bgmm, sklearn_fit
    from ladder_tpu.training import losses
    from ladder_tpu.training.step import init_state, make_train_step
    from ladder_tpu.utils import tf1_import

    scratch = tmp_path_factory.mktemp("refexec_gm_cycle")
    cfg = _family_config("ours", make_config)
    cfg["checkpoint_dir"] = str(scratch / "ck")
    model = make_model(cfg)
    params0 = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(7)))
    tf1_import.export_reference_checkpoint(params0, cfg,
                                           cfg["checkpoint_dir"])

    data = _cycle_data(np.random.default_rng(3))
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
    assert "REFEXEC_TRAIN_OK" in proc.stdout
    ref = dict(np.load(scratch / "ref_out.npz"))

    # ---- our side ---------------------------------------------------
    # eps queue in the driver's exact (step, sub-step, site) order
    def queue_for(steps):
        q = []
        for s in steps:
            for i in range(4):
                q += [data["eps_z"][s, i], data["eps_t"][s, i],
                      data["eps_mc"][s, i]]
        return q

    idx = [0]
    queue = []

    def fed_sample(rng, mean, std):
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
            e = cfg["sg_pretraining"] + (0 if in_sg else 1)
            lrs = {
                "ae": cfg["learning_rate_ae"] * 0.99 ** (e - 1),
                "sigma": cfg["learning_rate_sigma"] * 0.99 ** (e - 1),
                "prior": cfg["learning_rate_prior"] * 1.01 ** (e - 1),
                "inner_sigma": (cfg["learning_rate_inner_sigma"]
                                * 1.01 ** (e - 1)),
            }
            flags = {"use_sg_prior": jnp.asarray(in_sg),
                     "use_mask": jnp.asarray(e >= cfg["use_mask_start"])}
            state, out = step_fn(state, jnp.asarray(data["batches"][s]),
                                 jax.random.PRNGKey(0), gm, flags, lrs,
                                 do_prior=True)
            rec = {**{k: out["ae"][k] for k in (
                       "loss_ae", "elbo", "l1_reconstruction_error",
                       "entropy_z", "crossEntropy_prior",
                       "sigma_regularisor")},
                   "sigma": out["sigma"]["sigma"]}
            rec.update({k: out["prior"][k] for k in INNER_KEYS})
            for k, v in rec.items():
                traj.setdefault(k, []).append(float(v))
        return state, {k: np.asarray(v) for k, v in traj.items()}

    def encode_fit_samples(params):
        """Our representation_sample protocol (training/step.py:376-384 /
        trainer._collect_samples) with the driver's eps stream."""
        chunks = []
        for i in range(data["fit_batches"].shape[0]):
            mean, std = model.encode(params,
                                     jnp.asarray(data["fit_batches"][i]))
            z = mean + std * jnp.asarray(data["eps_fit_z"][i])
            tm, ts = model.inner_encode(params, z)
            chunks.append(tm + ts * jnp.asarray(data["eps_fit_t"][i]))
        return jnp.concatenate(chunks, axis=0)

    def gm_of(weights, means, covs):
        return dict(weights=jnp.asarray(np.asarray(weights, np.float32)),
                    means=jnp.asarray(np.asarray(means, np.float32)),
                    chols=jnp.asarray(np.linalg.cholesky(
                        np.asarray(covs, np.float64)).astype(np.float32)))

    orig = losses.sample_diag_gaussian
    losses.sample_diag_gaussian = fed_sample
    try:
        step_fn = make_train_step(model, jit=False)
        state = init_state(model, jax.random.PRNGKey(7))
        gm_id = losses.identity_gm(K, REP)

        set_queue(queue_for(range(S_SG)))
        state, traj_sg = run_steps(step_fn, state, range(S_SG), gm_id,
                                   in_sg=True)
        assert idx[0] == len(queue)
        snapshot = jax.tree.map(lambda a: jnp.array(a, copy=True), state)

        samples = encode_fit_samples(state["params"])

        # sklearn-backend fit: the exact trainer call (trainer.py:514),
        # global-RNG-seeded like the driver so both inits match
        np.random.seed(FIT_SEED)
        fit_skl, _ = sklearn_fit(np.asarray(samples), K, mode="fast",
                                 space_prior="dirichlet_distribution",
                                 warm_model=None)
        # jax-backend fit: the device VI-BGMM (trainer.py:534-541)
        fit_jax, _ = fit_bgmm(jax.random.PRNGKey(11), samples, K,
                              max_iter=1000, weight_concentration_prior=0.1,
                              dirichlet_process=False, init_resp=None)

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

    return dict(ref=ref, traj_sg=traj_sg, traj_skl=traj_skl,
                traj_jax=traj_jax, samples=np.asarray(samples),
                fit_skl=fit_skl, fit_jax=fit_jax)


def test_fit_samples_match_reference(cycle):
    """The ~2k encodings both fits consume are the same points: identical
    eps through both frameworks' encoder+inner-encoder after 10 identical
    train steps."""
    ref_s = cycle["ref"]["fit_samples"]
    assert ref_s.shape == cycle["samples"].shape == (2016, REP)
    np.testing.assert_allclose(cycle["samples"], ref_s,
                               rtol=1e-3, atol=2e-3)


def test_sklearn_cycle_fit_matches_reference(cycle):
    """Our sklearn-backend fit of our encodings equals the reference's own
    BayesianGaussianMixture fit of its encodings — same hyperparameters
    (base.py:93-99), same seeded init, near-identical samples."""
    ref, fit = cycle["ref"], cycle["fit_skl"]
    np.testing.assert_allclose(np.asarray(fit.weights), ref["fit_w"],
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fit.means), ref["fit_m"],
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(fit.covariances), ref["fit_K"],
                               rtol=2e-2, atol=1e-4)


def test_sklearn_cycle_trajectories_match_reference(cycle):
    """Next-epoch (post-fit) trajectory agreement, the composed-cycle
    endpoint: every loss/sigma curve of the 10 post-fit steps tracks the
    reference's at near-fixed-feed tolerances (the residual fitted-GM
    delta enters only through the t-space mixture log-density)."""
    ref = cycle["ref"]
    for key in COMMON_KEYS + INNER_KEYS:
        ref_phase2 = ref[key][S_SG:]
        np.testing.assert_allclose(cycle["traj_skl"][key], ref_phase2,
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"cycle:{key}")


def test_jax_backend_fit_close_to_reference(cycle):
    """The device VI-BGMM starts from a different initialisation, so assert
    DISTRIBUTIONAL closeness to the reference's fit on the fitted samples:
    mixture moments and mean log-density (the quantity the ELBO consumes,
    base.py:308-313)."""
    from ladder_tpu.ops.distributions import gmm_logpdf

    ref = cycle["ref"]
    fit = cycle["fit_jax"]
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
    scale = np.sqrt(np.diag(cov_r))
    np.testing.assert_allclose(mu_j, mu_r, atol=0.05 * scale.max())
    np.testing.assert_allclose(cov_j, cov_r, rtol=0.1,
                               atol=0.02 * scale.max() ** 2)

    def chols(covs):
        return jnp.asarray(np.linalg.cholesky(
            np.asarray(covs, np.float64)).astype(np.float32))

    lp_ref = gmm_logpdf(x, jnp.asarray(ref["fit_w"].astype(np.float32)),
                        jnp.asarray(ref["fit_m"].astype(np.float32)),
                        chols(ref["fit_K"]))
    lp_jax = gmm_logpdf(x, fit.weights, fit.means, chols(fit.covariances))
    assert abs(float(lp_ref.mean() - lp_jax.mean())) < 0.05, (
        float(lp_ref.mean()), float(lp_jax.mean()))


def test_jax_cycle_trajectories_track_reference(cycle):
    """Next-epoch trajectories with the jax fit feeding the steps: the GM
    enters the ELBO only through E_q(t)[log p_GM(t)], so curves must track
    the reference within a band sized by the fits' log-density gap (loose
    where the GM term dominates, tight elsewhere)."""
    ref = cycle["ref"]
    # keys the GM term does not touch at all within one step
    for key in ("entropy_z", "sigma", "inner_sigma", "entropy_t"):
        np.testing.assert_allclose(cycle["traj_jax"][key], ref[key][S_SG:],
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"jax-cycle:{key}")
    # GM-bearing curves: bounded relative band
    for key in ("loss_ae", "elbo", "crossEntropy_prior", "elbo_prior",
                "l1_reconstruction_error"):
        a = cycle["traj_jax"][key]
        b = ref[key][S_SG:]
        denom = np.maximum(np.abs(b), 1.0)
        assert np.max(np.abs(a - b) / denom) < 0.05, (
            key, a, b)


def test_cycle_phases_actually_differ(cycle):
    """Guard against vacuous parity: the fit must CHANGE the training
    signal — the post-fit cross-entropy regime differs from the sg phase
    on both sides."""
    ref = cycle["ref"]
    assert not np.allclose(ref["crossEntropy_prior"][:S_SG].mean(),
                           ref["crossEntropy_prior"][S_SG:].mean())
    assert not np.allclose(
        np.mean(cycle["traj_sg"]["crossEntropy_prior"]),
        np.mean(cycle["traj_skl"]["crossEntropy_prior"]))
