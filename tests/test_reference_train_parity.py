"""TRAINING-DYNAMICS parity with the reference's executing TF1 graph.

test_reference_execution.py proves forward/head/loss/gradient equality at a
single parameter point. This test runs the reference's own TRAIN OPS — its
tf.train.AdamOptimizer(beta1=0.9, beta2=0.95) instances, ClipIfNotNone, the
4-group sequential update protocol and the lr schedules, built verbatim by
/root/reference/codes/base.py:457-517,583-641 — for 20 steps from identical
weights, batches and noise, and asserts our fused_train_step=1 path tracks
the step-by-step loss/sigma trajectories and the FINAL WEIGHTS at f32
tolerance.

Noise identity: the reference graph has exactly three reparameterised
sample sites ('ours': z models.py:100, t base.py:167, MC base.py:311); the
driver feeds each from precomputed eps arrays, and this side monkeypatches
losses.sample_diag_gaussian to consume the identical stream — one eps
triple per (step, sub-step). Every sub-step re-executes the graph with
fresh noise on both sides, exactly the reference's sess.run protocol.

Phase coverage: 10 steps at cur_epoch == sg_pretraining (the sg-overlap
epoch: standard-gaussian feeds with prior training already active,
trainers.py:39 vs base.py:868) + 10 steps at sg_pretraining+1 with a fitted
(here: fixed random SPD) GM hyper-prior and the std>1 reconstruction mask
on — so all four optimisers, both tf.cond phases, and the mask gradient
path are exercised.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

S_SG, S_GM = 10, 10
S = S_SG + S_GM
B, CODE, REP, L, K = 16, 8, 2, 4, 5


def _make_data(cfg, rng):
    """Batches, eps stream and GM for both frameworks, in one npz."""
    data = dict(
        batches=rng.random((S, B, 28, 28, 1)).astype(np.float32),
        eps_z=rng.standard_normal((S, 4, B, CODE)).astype(np.float32),
        eps_t=rng.standard_normal((S, 4, B, REP)).astype(np.float32),
        eps_mc=rng.standard_normal((S, 4, L, B, REP)).astype(np.float32),
        steps_sg=np.asarray(S_SG),
    )
    a = rng.standard_normal((K, REP, REP)).astype(np.float32)
    data["gm_cov"] = (a @ a.transpose(0, 2, 1) / REP
                      + 0.5 * np.eye(REP, dtype=np.float32))
    data["gm_means"] = rng.standard_normal((K, REP)).astype(np.float32)
    w = rng.random(K).astype(np.float32) + 0.5
    data["gm_weights"] = w / w.sum()
    return data


@pytest.fixture(scope="module")
def train_parity(tmp_path_factory):
    pytest.importorskip("tensorflow")
    from tests.conftest import make_config
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training import losses
    from ladder_tpu.training.step import init_state, make_train_step
    from ladder_tpu.utils import tf1_import

    scratch = tmp_path_factory.mktemp("refexec_train")
    cfg = make_config(num_hidden_units=64, code_size=CODE, batch_size=B,
                      n_MC_samples=L, n_mixtures=K, representation_size=REP,
                      num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2,
                      sg_pretraining=1, use_mask_start=2)
    cfg["checkpoint_dir"] = str(scratch / "ck")
    model = make_model(cfg)
    params0 = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(7)))
    tf1_import.export_reference_checkpoint(params0, cfg,
                                           cfg["checkpoint_dir"])

    data = _make_data(cfg, np.random.default_rng(3))
    np.savez(scratch / "data.npz", **data)
    (scratch / "cfg.json").write_text(json.dumps(cfg))

    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tests", "refexec_train_driver.py"),
         "--config", str(scratch / "cfg.json"),
         "--data", str(scratch / "data.npz"),
         "--out", str(scratch / "ref_out.npz")],
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "REFEXEC_TRAIN_OK" in proc.stdout
    ref = dict(np.load(scratch / "ref_out.npz"))

    # ---- our side: fused sequential step, eps injected in the identical
    # (step, sub-step, site) order the driver feeds
    queue = []
    for s in range(S):
        for i in range(4):
            queue += [data["eps_z"][s, i], data["eps_t"][s, i],
                      data["eps_mc"][s, i]]
    idx = [0]

    def fed_sample(rng, mean, std):
        eps = queue[idx[0]]
        idx[0] += 1
        assert eps.shape == tuple(mean.shape), (eps.shape, mean.shape)
        return mean + std * jnp.asarray(eps)

    orig = losses.sample_diag_gaussian
    losses.sample_diag_gaussian = fed_sample
    try:
        step_fn = make_train_step(model, jit=False)
        state = init_state(model, jax.random.PRNGKey(7))
        gm_fit = dict(weights=jnp.asarray(data["gm_weights"]),
                      means=jnp.asarray(data["gm_means"]),
                      chols=jnp.asarray(np.linalg.cholesky(
                          data["gm_cov"].astype(np.float64)).astype(
                              np.float32)))
        ours = {}
        for s in range(S):
            in_sg = s < S_SG
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
            gm = (losses.identity_gm(K, REP) if in_sg else gm_fit)
            state, out = step_fn(state, jnp.asarray(data["batches"][s]),
                                 jax.random.PRNGKey(0), gm, flags, lrs,
                                 do_prior=True)
            rec = {**{k: out["ae"][k] for k in (
                       "loss_ae", "elbo", "l1_reconstruction_error",
                       "entropy_z", "crossEntropy_prior",
                       "sigma_regularisor")},
                   "sigma": out["sigma"]["sigma"],
                   **{k: out["prior"][k] for k in (
                       "elbo_prior", "code_l1_reconstruction_error",
                       "code_reconstruction_likelihood", "entropy_t",
                       "crossEntropy_representation", "inner_sigma")}}
            for k, v in rec.items():
                ours.setdefault(k, []).append(float(v))
        assert idx[0] == len(queue), "eps stream not fully consumed"
        ours = {k: np.asarray(v) for k, v in ours.items()}
        final_params = jax.tree.map(np.asarray, state["params"])
    finally:
        losses.sample_diag_gaussian = orig

    return cfg, ref, ours, final_params


# f32 drift budget: single-point parity is ~3e-5 (conv accumulation order,
# TF-CPU oneDNN vs XLA); 20 steps x 4 Adam updates compound it. Measured
# (this harness, rtol=atol=1e-6 probe): max |abs| deviation 8.4e-4, max
# |rel| 1.0e-2 — the latter only on small-magnitude trajectories where the
# atol term governs. Bounds sized ~4x the measured abs drift.
TRAJ_TOL = dict(rtol=2e-3, atol=3e-3)

TRAJ_KEYS = (
    "loss_ae", "elbo", "l1_reconstruction_error", "entropy_z",
    "crossEntropy_prior", "sigma_regularisor", "sigma", "elbo_prior",
    "code_l1_reconstruction_error", "code_reconstruction_likelihood",
    "entropy_t", "crossEntropy_representation", "inner_sigma")


@pytest.mark.parametrize("key", TRAJ_KEYS)
def test_trajectory_matches_reference(train_parity, key):
    cfg, ref, ours, _ = train_parity
    assert ref[key].shape == (S,)
    np.testing.assert_allclose(ours[key], ref[key], err_msg=key, **TRAJ_TOL)


def test_trajectories_actually_move(train_parity):
    """Guard against vacuous parity: training must change the losses and
    sigma across the 20 steps on both sides."""
    cfg, ref, ours, _ = train_parity
    for tr in (ref, ours):
        assert np.std(tr["loss_ae"]) > 1e-3
        assert np.std(tr["sigma"]) > 1e-6
    # the two phases differ (sg vs GM cross-entropy switches the loss)
    assert not np.allclose(ref["crossEntropy_prior"][:S_SG].mean(),
                           ref["crossEntropy_prior"][S_SG:].mean())


def test_final_weights_match_reference(train_parity):
    """After 20 steps x 4 sequential Adam updates, every trainable leaf of
    the reference's graph equals ours — the strongest trajectory endpoint:
    any divergence in gradients, clipping, update order or lr schedule
    accumulates here."""
    from ladder_tpu.utils import tf1_import

    cfg, ref, ours, final_params = train_parity
    name_map = tf1_import.reference_name_map(final_params, cfg)
    ref_vars = {k[len("var::"):]: v for k, v in ref.items()
                if k.startswith("var::")}
    assert set(ref_vars) == set(name_map), "trainable variable sets differ"
    for name, val in ref_vars.items():
        leaf = final_params
        for key in name_map[name]:
            leaf = leaf[key]
        np.testing.assert_allclose(
            np.asarray(leaf, np.float64), np.asarray(val, np.float64),
            rtol=2e-3, atol=2e-4, err_msg=f"final weight mismatch: {name}")


# ---------------------------------------------------------------------------
# vampPrior family: same harness, the reference's OTHER gradient-trained
# prior. Sub-steps per batch are ae, sigma, prior (loss_prior =
# negative_elbo over the pseudo-input variable, base.py:408-412, 481-482;
# no inner-sigma step, base.py:509-511), and the graph has two sample
# sites (z + the L-sample MC estimate, base.py:364-366). The pseudo-input
# encoder reuse (base.py:228-238) additionally exercises the shim's
# reuse-correct default layer naming.
# ---------------------------------------------------------------------------

SV = 3  # vamp sub-steps per step


def _make_data_vamp(cfg, rng):
    data = dict(
        batches=rng.random((S, B, 28, 28, 1)).astype(np.float32),
        eps_z=rng.standard_normal((S, SV, B, CODE)).astype(np.float32),
        eps_mc=rng.standard_normal((S, SV, L, B, CODE)).astype(np.float32),
        steps_sg=np.asarray(S_SG),
        # unused by the vamp branches; the driver reads their shapes
        gm_means=np.zeros((K, REP), np.float32),
        gm_cov=np.tile(np.eye(REP, dtype=np.float32), (K, 1, 1)),
        gm_weights=np.full((K,), 1.0 / K, np.float32),
    )
    return data


@pytest.fixture(scope="module")
def train_parity_vamp(tmp_path_factory):
    pytest.importorskip("tensorflow")
    from tests.conftest import make_config
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training import losses
    from ladder_tpu.training.step import init_state, make_train_step
    from ladder_tpu.utils import tf1_import

    scratch = tmp_path_factory.mktemp("refexec_train_vamp")
    cfg = make_config(prior="vampPrior", num_hidden_units=64,
                      code_size=CODE, batch_size=B, n_MC_samples=L,
                      n_mixtures=K, sg_pretraining=1)
    cfg["checkpoint_dir"] = str(scratch / "ck")
    model = make_model(cfg)
    params0 = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(7)))
    tf1_import.export_reference_checkpoint(params0, cfg,
                                           cfg["checkpoint_dir"])

    data = _make_data_vamp(cfg, np.random.default_rng(5))
    np.savez(scratch / "data.npz", **data)
    (scratch / "cfg.json").write_text(json.dumps(cfg))

    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tests", "refexec_train_driver.py"),
         "--config", str(scratch / "cfg.json"),
         "--data", str(scratch / "data.npz"),
         "--out", str(scratch / "ref_out.npz")],
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "REFEXEC_TRAIN_OK" in proc.stdout
    ref = dict(np.load(scratch / "ref_out.npz"))

    # our side: eps queue in (step, sub-step, site) order — two sites
    queue = []
    for s in range(S):
        for i in range(SV):
            queue += [data["eps_z"][s, i], data["eps_mc"][s, i]]
    idx = [0]

    def fed_sample(rng, mean, std):
        eps = queue[idx[0]]
        idx[0] += 1
        assert eps.shape == tuple(mean.shape), (eps.shape, mean.shape)
        return mean + std * jnp.asarray(eps)

    orig = losses.sample_diag_gaussian
    losses.sample_diag_gaussian = fed_sample
    try:
        step_fn = make_train_step(model, jit=False)
        state = init_state(model, jax.random.PRNGKey(7))
        ours = {}
        for s in range(S):
            in_sg = s < S_SG
            e = cfg["sg_pretraining"] + (0 if in_sg else 1)
            lrs = {
                "ae": cfg["learning_rate_ae"] * 0.99 ** (e - 1),
                "sigma": cfg["learning_rate_sigma"] * 0.99 ** (e - 1),
                "prior": cfg["learning_rate_prior"] * 1.01 ** (e - 1),
                "inner_sigma": (cfg["learning_rate_inner_sigma"]
                                * 1.01 ** (e - 1)),
            }
            flags = {"use_sg_prior": jnp.asarray(in_sg),
                     "use_mask": jnp.asarray(False)}
            gm = losses.identity_gm(K, REP)
            state, out = step_fn(state, jnp.asarray(data["batches"][s]),
                                 jax.random.PRNGKey(0), gm, flags, lrs,
                                 do_prior=True)
            rec = {**{k: out["ae"][k] for k in (
                       "loss_ae", "elbo", "l1_reconstruction_error",
                       "entropy_z", "crossEntropy_prior",
                       "sigma_regularisor")},
                   "sigma": out["sigma"]["sigma"],
                   "loss_prior": out["prior"]["loss_prior"],
                   "crossEntropy_prior_substep":
                       out["prior"]["crossEntropy_prior"]}
            for k, v in rec.items():
                ours.setdefault(k, []).append(float(v))
        assert idx[0] == len(queue), "eps stream not fully consumed"
        ours = {k: np.asarray(v) for k, v in ours.items()}
        final_params = jax.tree.map(np.asarray, state["params"])
    finally:
        losses.sample_diag_gaussian = orig

    return cfg, ref, ours, final_params


VAMP_TRAJ_KEYS = (
    "loss_ae", "elbo", "l1_reconstruction_error", "entropy_z",
    "crossEntropy_prior", "sigma_regularisor", "sigma", "loss_prior",
    "crossEntropy_prior_substep")


@pytest.mark.parametrize("key", VAMP_TRAJ_KEYS)
def test_vamp_trajectory_matches_reference(train_parity_vamp, key):
    cfg, ref, ours, _ = train_parity_vamp
    assert ref[key].shape == (S,)
    np.testing.assert_allclose(ours[key], ref[key], err_msg=key, **TRAJ_TOL)


def test_vamp_trajectories_actually_move(train_parity_vamp):
    cfg, ref, ours, _ = train_parity_vamp
    for tr in (ref, ours):
        assert np.std(tr["loss_ae"]) > 1e-3
        assert np.std(tr["sigma"]) > 1e-6
    # the pseudo-prior CE only becomes live after the sg phase
    assert not np.allclose(ref["crossEntropy_prior"][:S_SG].mean(),
                           ref["crossEntropy_prior"][S_SG:].mean())


def test_vamp_final_weights_match_reference(train_parity_vamp):
    """20 steps x 3 sequential Adam updates: every trainable variable of
    the reference's vamp graph — encoder/decoder/sigma AND the pseudo-input
    tensor ('prior/Variable') — must equal ours."""
    from ladder_tpu.utils import tf1_import

    cfg, ref, ours, final_params = train_parity_vamp
    name_map = tf1_import.reference_name_map(final_params, cfg)
    ref_vars = {k[len("var::"):]: v for k, v in ref.items()
                if k.startswith("var::")}
    assert set(ref_vars) == set(name_map), "trainable variable sets differ"
    assert "prior/Variable" in ref_vars
    # atol 1e-3 (vs 2e-4 for 'ours'): vamp's loss runs the encoder TWICE
    # per forward (pseudo-input reuse), doubling the f32 conv accumulation
    # drift; measured max deviation 4.9e-4 on 2/9216 elements of one
    # kernel, everything else inside the 'ours' bound
    for name, val in ref_vars.items():
        leaf = final_params
        for key in name_map[name]:
            leaf = leaf[key]
        np.testing.assert_allclose(
            np.asarray(leaf, np.float64), np.asarray(val, np.float64),
            rtol=2e-3, atol=1e-3, err_msg=f"final weight mismatch: {name}")
