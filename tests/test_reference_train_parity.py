"""TRAINING-DYNAMICS parity with the reference's executing TF1 graph,
for EVERY prior family.

test_reference_execution.py proves forward/head/loss/gradient equality at a
single parameter point. These tests run the reference's own TRAIN OPS — its
tf.train.AdamOptimizer(beta1=0.9, beta2=0.95) instances, ClipIfNotNone, the
sequential update protocol and the lr schedules, built verbatim by
/root/reference/codes/base.py:457-517,583-641 — for 20 steps from identical
weights, batches and noise, and assert our fused_train_step=1 path tracks
the step-by-step loss/sigma trajectories and the FINAL WEIGHTS at f32
tolerance. Family coverage (sub-steps / sample sites):

  ours               ae, sigma, prior, inner_sigma   z, t, MC(t)
  hierarchical       ae, sigma, prior, inner_sigma   z, t
  vampPrior          ae, sigma, prior                z, MC(z)
  GMM                ae, sigma                       z, MC(z)
  standard_gaussian  ae, sigma                       z
  celeba_ours        the 'ours' protocol through the reference's CelebA
                     graph (BN-conv encoder, style decoder, resize+conv
                     pairs vs our fused-upconv custom VJP), CPU-sized

Noise identity: the driver feeds every reference sample site from
precomputed eps arrays, and this side monkeypatches
losses.sample_diag_gaussian to consume the identical stream — one eps
tuple per (step, sub-step). Every sub-step re-executes the graph with
fresh noise on both sides, exactly the reference's sess.run protocol.

Phase coverage: 10 steps in the first phase (ours/hierarchical/vampPrior:
the sg-overlap epoch — standard-gaussian feeds with prior training already
active, trainers.py:39 vs base.py:868; GMM: epoch 1 with the identity GM
feed of base.py:913-921) + 10 steps one epoch later with a fitted (here:
fixed random SPD) GM / the learned prior and, for 'ours', the std>1
reconstruction mask on — so every optimiser, both tf.cond phases, and the
mask gradient path are exercised.
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

COMMON_KEYS = ("loss_ae", "elbo", "l1_reconstruction_error", "entropy_z",
               "crossEntropy_prior", "sigma_regularisor", "sigma")
INNER_KEYS = ("elbo_prior", "code_l1_reconstruction_error",
              "code_reconstruction_likelihood", "entropy_t",
              "crossEntropy_representation", "inner_sigma")
VAMP_KEYS = ("loss_prior", "crossEntropy_prior_substep")

FAMILIES = {
    # n_sub: reference sub-steps per batch; sites: eps sample sites in
    # consumption order; mc_dim: the MC estimate's event dim; gm_dim: the
    # GM feed's space ('ours': t-space, 'GMM': z-space). Optional keys:
    # prior (defaults to the entry name), exp_name/img/batch/steps/cfg
    # (model-family overrides — the celeba entry runs the SAME 'ours'
    # protocol through the reference's CelebA graph: BN-conv encoder,
    # style decoder, resize+conv pairs vs our fused-upconv custom VJP).
    "ours": dict(n_sub=4, sites=("z", "t", "mc"), mc_dim=REP, gm_dim=REP,
                 keys=COMMON_KEYS + INNER_KEYS),
    "hierarchical": dict(n_sub=4, sites=("z", "t"), mc_dim=None, gm_dim=REP,
                         keys=COMMON_KEYS + INNER_KEYS),
    "vampPrior": dict(n_sub=3, sites=("z", "mc"), mc_dim=CODE, gm_dim=REP,
                      keys=COMMON_KEYS + VAMP_KEYS),
    "GMM": dict(n_sub=2, sites=("z", "mc"), mc_dim=CODE, gm_dim=CODE,
                keys=COMMON_KEYS),
    "standard_gaussian": dict(n_sub=2, sites=("z",), mc_dim=None, gm_dim=REP,
                              keys=COMMON_KEYS),
    "celeba_ours": dict(
        n_sub=4, sites=("z", "t", "mc"), mc_dim=REP, gm_dim=REP,
        keys=COMMON_KEYS + INNER_KEYS, prior="ours",
        img=(128, 128, 3), batch=4, steps=(3, 3),   # CPU-sized
        cfg=dict(exp_name="celeba", dim_input_x=128, dim_input_y=128,
                 dim_input_channel=3, num_hidden_units=32,
                 use_mask_start=1000)),              # celeba never masks
}


def _fam_shape(fam):
    """(steps_sg, steps_total, batch, img_shape) with mnist defaults."""
    s_sg, s_gm = fam.get("steps", (S_SG, S_GM))
    return s_sg, s_sg + s_gm, fam.get("batch", B), fam.get("img", (28, 28, 1))


def _make_data(family, rng):
    fam = FAMILIES[family]
    n_sub = fam["n_sub"]
    s_sg, s_all, b, img = _fam_shape(fam)
    data = dict(
        batches=rng.random((s_all, b) + img).astype(np.float32),
        eps_z=rng.standard_normal((s_all, n_sub, b, CODE)).astype(np.float32),
        steps_sg=np.asarray(s_sg),
    )
    if "t" in fam["sites"]:
        data["eps_t"] = rng.standard_normal(
            (s_all, n_sub, b, REP)).astype(np.float32)
    if "mc" in fam["sites"]:
        data["eps_mc"] = rng.standard_normal(
            (s_all, n_sub, L, b, fam["mc_dim"])).astype(np.float32)
    d = fam["gm_dim"]
    a = rng.standard_normal((K, d, d)).astype(np.float32)
    data["gm_cov"] = (a @ a.transpose(0, 2, 1) / d
                      + 0.5 * np.eye(d, dtype=np.float32))
    data["gm_means"] = rng.standard_normal((K, d)).astype(np.float32)
    w = rng.random(K).astype(np.float32) + 0.5
    data["gm_weights"] = w / w.sum()
    return data


def _family_config(family, make_config):
    fam = FAMILIES[family]
    prior = fam.get("prior", family)
    _, _, b, _ = _fam_shape(fam)
    kw = dict(prior=prior, num_hidden_units=64, code_size=CODE,
              batch_size=b, n_MC_samples=L, n_mixtures=K, sg_pretraining=1)
    if prior in ("ours", "hierarchical"):
        kw.update(representation_size=REP, num_hidden_units_inner_VAE=16,
                  n_layers_inner_VAE=2)
    if prior == "ours":
        kw.update(use_mask_start=2)
    kw.update(fam.get("cfg", {}))
    return make_config(**kw)


def _run_parity(family, scratch):
    """Run the reference's train ops and our fused sequential step from
    identical weights/batches/noise; return (cfg, ref, ours, final_params)."""
    pytest.importorskip("tensorflow")
    from tests.conftest import make_config
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training import losses
    from ladder_tpu.training.step import init_state, make_train_step
    from ladder_tpu.utils import tf1_import

    fam = FAMILIES[family]
    prior = fam.get("prior", family)
    s_sg, s_all, _, _ = _fam_shape(fam)
    cfg = _family_config(family, make_config)
    cfg["checkpoint_dir"] = str(scratch / "ck")
    model = make_model(cfg)
    params0 = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(7)))
    tf1_import.export_reference_checkpoint(params0, cfg,
                                           cfg["checkpoint_dir"])

    data = _make_data(family, np.random.default_rng(3))
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
    for s in range(s_all):
        for i in range(fam["n_sub"]):
            queue += [data[f"eps_{site}"][s, i] for site in fam["sites"]]
    idx = [0]

    def fed_sample(rng, mean, std):
        eps = queue[idx[0]]
        idx[0] += 1
        assert eps.shape == tuple(mean.shape), (eps.shape, mean.shape)
        return mean + std * jnp.asarray(eps)

    def gm_of(cov, means, weights):
        return dict(weights=jnp.asarray(weights), means=jnp.asarray(means),
                    chols=jnp.asarray(np.linalg.cholesky(
                        cov.astype(np.float64)).astype(np.float32)))

    orig = losses.sample_diag_gaussian
    losses.sample_diag_gaussian = fed_sample
    try:
        step_fn = make_train_step(model, jit=False)
        state = init_state(model, jax.random.PRNGKey(7))
        gm_fit = gm_of(data["gm_cov"], data["gm_means"], data["gm_weights"])
        gm_id = losses.identity_gm(K, fam["gm_dim"])
        ours = {}
        for s in range(s_all):
            in_sg = s < s_sg
            e = (1 if in_sg else 2) if prior == "GMM" else \
                cfg["sg_pretraining"] + (0 if in_sg else 1)
            lrs = {
                "ae": cfg["learning_rate_ae"] * 0.99 ** (e - 1),
                "sigma": cfg["learning_rate_sigma"] * 0.99 ** (e - 1),
                "prior": cfg["learning_rate_prior"] * 1.01 ** (e - 1),
                "inner_sigma": (cfg["learning_rate_inner_sigma"]
                                * 1.01 ** (e - 1)),
            }
            flags = {"use_sg_prior": jnp.asarray(in_sg),
                     "use_mask": jnp.asarray(
                         prior == "ours"
                         and e >= cfg["use_mask_start"])}
            gm = gm_id if in_sg else gm_fit
            state, out = step_fn(state, jnp.asarray(data["batches"][s]),
                                 jax.random.PRNGKey(0), gm, flags, lrs,
                                 do_prior=True)
            rec = {**{k: out["ae"][k] for k in (
                       "loss_ae", "elbo", "l1_reconstruction_error",
                       "entropy_z", "crossEntropy_prior",
                       "sigma_regularisor")},
                   "sigma": out["sigma"]["sigma"]}
            if prior in ("ours", "hierarchical"):
                rec.update({k: out["prior"][k] for k in INNER_KEYS})
            elif prior == "vampPrior":
                rec["loss_prior"] = out["prior"]["loss_prior"]
                rec["crossEntropy_prior_substep"] = \
                    out["prior"]["crossEntropy_prior"]
            for k, v in rec.items():
                ours.setdefault(k, []).append(float(v))
        assert idx[0] == len(queue), "eps stream not fully consumed"
        ours = {k: np.asarray(v) for k, v in ours.items()}
        final_params = jax.tree.map(np.asarray, state["params"])
    finally:
        losses.sample_diag_gaussian = orig

    return cfg, ref, ours, final_params


@pytest.fixture(scope="module")
def parity(tmp_path_factory):
    """Lazy per-family cache: each family's side-by-side run executes once
    per session, shared by its trajectory/movement/weights tests."""
    cache = {}

    def run(prior):
        if prior not in cache:
            cache[prior] = _run_parity(
                prior, tmp_path_factory.mktemp(f"refexec_train_{prior}"))
        return cache[prior]

    return run


# f32 drift budget: single-point parity is ~3e-5 (conv accumulation order,
# TF-CPU oneDNN vs XLA); 20 steps x 2-4 Adam updates compound it. Measured
# ('ours' harness, rtol=atol=1e-6 probe): max |abs| deviation 8.4e-4, max
# |rel| 1.0e-2 — the latter only on small-magnitude trajectories where the
# atol term governs. Bounds sized ~4x the measured abs drift.
TRAJ_TOL = dict(rtol=2e-3, atol=3e-3)

# final-weight atol: 'ours' measured well inside 2e-4; vampPrior runs the
# encoder TWICE per forward (pseudo-input reuse), doubling the f32 conv
# accumulation drift — measured max deviation 4.9e-4 on 2/9216 elements of
# one kernel. celeba's batch-stat BN divides by moments reduced over
# 65k elements, amplifying TF-vs-XLA f32 reduction-order noise in the
# gradient — measured 4.1e-4 on 1/216 elements of the first kernel.
WEIGHT_ATOL = {"vampPrior": 1e-3, "celeba_ours": 1e-3}


@pytest.mark.parametrize("prior", list(FAMILIES))
def test_trajectories_match_reference(parity, prior):
    cfg, ref, ours, _ = parity(prior)
    _, s_all, _, _ = _fam_shape(FAMILIES[prior])
    for key in FAMILIES[prior]["keys"]:
        assert ref[key].shape == (s_all,), key
        np.testing.assert_allclose(ours[key], ref[key],
                                   err_msg=f"{prior}:{key}", **TRAJ_TOL)


@pytest.mark.parametrize("prior", list(FAMILIES))
def test_trajectories_actually_move(parity, prior):
    """Guard against vacuous parity: training must change the losses and
    sigma across the 20 steps on both sides, and the two phases must
    differ where the family has a phase switch."""
    cfg, ref, ours, _ = parity(prior)
    for tr in (ref, ours):
        assert np.std(tr["loss_ae"]) > 1e-3
        assert np.std(tr["sigma"]) > 1e-6
    if prior != "standard_gaussian":
        # sg->GM (or identity->fitted GM) switches the cross-entropy
        s_sg, _, _, _ = _fam_shape(FAMILIES[prior])
        assert not np.allclose(ref["crossEntropy_prior"][:s_sg].mean(),
                               ref["crossEntropy_prior"][s_sg:].mean())


@pytest.mark.parametrize("prior", list(FAMILIES))
def test_final_weights_match_reference(parity, prior):
    """After 20 steps of sequential Adam updates, every trainable leaf of
    the reference's graph equals ours — the strongest trajectory endpoint:
    any divergence in gradients, clipping, update order or lr schedule
    accumulates here."""
    from ladder_tpu.utils import tf1_import

    cfg, ref, ours, final_params = parity(prior)
    name_map = tf1_import.reference_name_map(final_params, cfg)
    ref_vars = {k[len("var::"):]: v for k, v in ref.items()
                if k.startswith("var::")}
    assert set(ref_vars) == set(name_map), "trainable variable sets differ"
    if prior == "vampPrior":
        assert "prior/Variable" in ref_vars  # the pseudo-input tensor
    atol = WEIGHT_ATOL.get(prior, 2e-4)
    s_sg, s_all, _, _ = _fam_shape(FAMILIES[prior])
    # Parameters feeding a mean/variance normaliser have exact gradient
    # degeneracies: BN/instance-norm subtracts the mean (conv BIAS inert)
    # and divides by the std (per-output-channel KERNEL SCALE inert). The
    # true gradient along those directions is 0, so Adam normalises f32
    # cancellation residue into full lr-scale steps, in noise-determined
    # directions, on BOTH frameworks. For those layers: compare the
    # per-channel kernel DIRECTION strictly, and bound the inert
    # components by the maximum Adam displacement (~lr per step per side,
    # x(1-b2)^-1/2 transient headroom).
    norm_fed = set()
    if cfg["exp_name"] == "celeba":
        norm_fed = ({f"encoder/conv2d{'' if i == 0 else f'_{i}'}"
                     for i in range(6)}                       # 6x conv-BN
                    | {"decoder/conv2d_1", "decoder/conv2d_2",
                       "decoder/conv2d_4", "decoder/conv2d_6"})  # instnorm
    drift_bound = 4.0 * s_all * cfg["learning_rate_ae"]
    for name, val in ref_vars.items():
        leaf = final_params
        for key in name_map[name]:
            leaf = leaf[key]
        a, b = np.asarray(leaf, np.float64), np.asarray(val, np.float64)
        scope, kind = name.rsplit("/", 1)
        if scope in norm_fed:
            assert np.max(np.abs(a - b)) < drift_bound, (
                f"degenerate-direction drift beyond the Adam bound "
                f"({prior}): {name}")
            if kind == "kernel":
                flat_a = a.reshape(-1, a.shape[-1])
                flat_b = b.reshape(-1, b.shape[-1])
                col_norm = np.linalg.norm(flat_b, axis=0)
                na = flat_a / np.linalg.norm(flat_a, axis=0)
                nb = flat_b / col_norm
                # An inert-direction displacement of up to drift_bound per
                # element (each side) perturbs the NORMALISED column by
                # <= ~2*drift_bound/||col|| per element (delta(a_i/||a||)
                # = da_i/||a|| - a_i (a.da)/||a||^3, both terms <= that when
                # the residue concentrates on few elements — measured:
                # 411/9216 elements at <= 3.1e-3 vs this bound ~1.1e-2).
                dir_tol = 1e-3 + 2.0 * drift_bound / col_norm
                bad = np.abs(na - nb) > dir_tol
                assert not bad.any(), (
                    f"kernel direction mismatch ({prior}): {name} — "
                    f"{bad.sum()}/{bad.size} elements beyond the inert-"
                    f"noise bound, max {np.max(np.abs(na - nb)):.2e}")
            continue
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=atol,
            err_msg=f"final weight mismatch ({prior}): {name}")
