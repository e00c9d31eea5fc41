"""Correctness tests for the performance modes: single-pass fused step
(fused_train_step=2) and bfloat16 compute."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ladder_tpu.models.builder import make_model
from ladder_tpu.training.losses import compute_loss, identity_gm
from ladder_tpu.training.optim import adam_init, adam_update, clip_grads
from ladder_tpu.training.step import init_state, make_train_step
from tests.conftest import make_config


def _setup(prior="ours", **overrides):
    cfg = make_config(prior=prior, n_MC_samples=4, n_mixtures=3,
                      num_hidden_units=64, num_hidden_units_inner_VAE=16,
                      n_layers_inner_VAE=2, **overrides)
    model = make_model(cfg)
    state = init_state(model, jax.random.PRNGKey(0))
    batch = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (8, 28, 28, 1)),
                        dtype=jnp.float32)
    gm = identity_gm(cfg["n_mixtures"], cfg["representation_size"])
    flags = {"use_sg_prior": jnp.asarray(False), "use_mask": jnp.asarray(False)}
    lrs = {k: jnp.asarray(1e-3) for k in ["ae", "sigma", "prior", "inner_sigma"]}
    return cfg, model, state, batch, gm, flags, lrs


def test_single_pass_grads_are_exact():
    """The single-pass update must equal per-group grads of the matching
    sub-losses at the same parameter point with the same rng."""
    cfg, model, state, batch, gm, flags, lrs = _setup(fused_train_step=2)
    step = make_train_step(model, jit=False)
    rng = jax.random.PRNGKey(9)
    new_state, out = step(dict(params=dict(state["params"]),
                               opt=jax.tree.map(jnp.copy, state["opt"]),
                               step=state["step"]),
                          batch, rng, gm, flags, lrs, True)

    # manual: one grad of loss_ae wrt each group at the ORIGINAL params.
    # The step derives its sample stream as fold_in(rng, step) on device;
    # replicate that here (step counter starts at 0).
    params = state["params"]
    step_rng = jax.random.fold_in(rng, state["step"])

    def loss_ae(sub, keys):
        p = {**params, **{k: sub[k] for k in keys}}
        return compute_loss(model, p, batch, step_rng, gm, flags)[0]

    for gname, keys in [("ae", ("encoder", "decoder")), ("sigma", ("sigma",)),
                        ("prior", ("prior",)),
                        ("inner_sigma", ("inner_sigma",))]:
        sub = {k: params[k] for k in keys}
        grads = jax.grad(lambda s: loss_ae(s, keys))(sub)
        grads = clip_grads(grads)
        upd, _ = adam_update(grads, adam_init(sub), sub, lrs[gname])
        for k in keys:
            for a, b in zip(jax.tree.leaves(upd[k]),
                            jax.tree.leaves(new_state["params"][k])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-7)


def test_single_pass_loss_prior_equivalence():
    """grad(loss_ae, prior) == grad(loss_prior, prior) — the identity the
    single-pass mode relies on (base.py:318-320, 399-412)."""
    cfg, model, state, batch, gm, flags, _ = _setup()
    params = state["params"]
    rng = jax.random.PRNGKey(3)

    def via_ae(prior_group):
        p = {**params, "prior": prior_group}
        return compute_loss(model, p, batch, rng, gm, flags)[0]

    def via_prior(prior_group):
        p = {**params, "prior": prior_group}
        return compute_loss(model, p, batch, rng, gm, flags)[1]["loss_prior"]

    g1 = jax.grad(via_ae)(params["prior"])
    g2 = jax.grad(via_prior)(params["prior"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_single_pass_rejects_z_std():
    cfg = make_config(prior="ours", fused_train_step=2, TRAIN_decoded_z_std=1)
    model = make_model(cfg)
    with pytest.raises(ValueError):
        make_train_step(model)


def test_bf16_loss_close_to_fp32():
    cfg32, model32, state32, batch, gm, flags, _ = _setup()
    cfg16 = make_config(prior="ours", n_MC_samples=4, n_mixtures=3,
                        num_hidden_units=64, num_hidden_units_inner_VAE=16,
                        n_layers_inner_VAE=2, dtype="bfloat16")
    model16 = make_model(cfg16)
    # same params (bf16 model stores fp32 params)
    params = state32["params"]
    rng = jax.random.PRNGKey(4)
    l32, m32 = compute_loss(model32, params, batch, rng, gm, flags)
    l16, m16 = compute_loss(model16, params, batch, rng, gm, flags)
    # heads are fp32; loss should agree to bf16 activation precision
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)
    assert np.isfinite(float(l16))


def test_bf16_trains():
    cfg, model, state, batch, gm, flags, lrs = _setup(dtype="bfloat16",
                                                      fused_train_step=2)
    step = make_train_step(model, jit=False)
    rng = jax.random.PRNGKey(5)
    losses = []
    for i in range(5):
        rng, r = jax.random.split(rng)
        state, out = step(state, batch, r, gm, flags, lrs, True)
        losses.append(float(out["ae"]["loss_ae"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # params stayed fp32
    for leaf in jax.tree.leaves(state["params"]):
        assert leaf.dtype == jnp.float32


def test_uint8_batch_normalised_on_device():
    cfg, model, state, batch, gm, flags, _ = _setup()
    u8 = jnp.asarray((np.asarray(batch) * 255).astype(np.uint8))
    rng = jax.random.PRNGKey(6)
    l_f, _ = compute_loss(model, state["params"], batch, rng, gm, flags)
    l_u, _ = compute_loss(model, state["params"],
                          u8, rng, gm, flags)
    # u8/255 differs from the float batch only by quantisation
    np.testing.assert_allclose(float(l_u), float(l_f), rtol=0.02)


def test_skip_nonfinite_guard():
    """A NaN gradient leaves the group untouched when the guard is on."""
    import jax.numpy as jnp

    from ladder_tpu.training.optim import adam_init, adam_update

    params = {"w": jnp.ones(4)}
    state = adam_init(params)
    bad = {"w": jnp.array([1.0, jnp.nan, 0.0, 0.0])}
    good = {"w": jnp.ones(4)}

    p1, s1 = adam_update(bad, state, params, 0.1, skip_nonfinite=True)
    np.testing.assert_array_equal(np.asarray(p1["w"]), np.ones(4))
    assert int(s1["t"]) == 0

    p2, s2 = adam_update(good, s1, p1, 0.1, skip_nonfinite=True)
    assert not np.allclose(np.asarray(p2["w"]), np.ones(4))
    assert int(s2["t"]) == 1

    # without the guard the NaN propagates (documenting the default)
    p3, _ = adam_update(bad, state, params, 0.1)
    assert np.isnan(np.asarray(p3["w"])).any()


def test_single_pass_sg_overlap_epoch_trains_prior():
    """At the sg/prior overlap epoch (use_sg=True, do_prior=True) the prior
    group must still receive loss_prior gradients in single-pass mode."""
    cfg, model, state, batch, gm, flags, lrs = _setup(fused_train_step=2)
    step = make_train_step(model, jit=False)
    overlap_flags = {"use_sg_prior": jnp.asarray(True),
                     "use_mask": jnp.asarray(False)}
    before = np.concatenate([np.asarray(x).ravel() for x in
                             jax.tree.leaves(state["params"]["prior"])])
    new_state, out = step(state, batch, jax.random.PRNGKey(0), gm,
                          overlap_flags, lrs, True, sg_overlap=True)
    after = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree.leaves(new_state["params"]["prior"])])
    assert not np.allclose(before, after), "prior params did not update"
    # and the crossEntropy used for the ae update was the sg one
    np.testing.assert_allclose(float(out["ae"]["crossEntropy_prior"]),
                               float(out["ae"]["crossEntropy_prior_sg"]),
                               rtol=1e-6)


def test_single_pass_without_overlap_flag_misses_prior():
    """Documents the hazard the overlap flag fixes: with use_sg=True and
    sg_overlap=False, the single backward carries no prior gradient."""
    cfg, model, state, batch, gm, flags, lrs = _setup(fused_train_step=2)
    step = make_train_step(model, jit=False)
    overlap_flags = {"use_sg_prior": jnp.asarray(True),
                     "use_mask": jnp.asarray(False)}
    before = np.concatenate([np.asarray(x).ravel() for x in
                             jax.tree.leaves(state["params"]["prior"])])
    new_state, _ = step(state, batch, jax.random.PRNGKey(0), gm,
                        overlap_flags, lrs, True, sg_overlap=False)
    after = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree.leaves(new_state["params"]["prior"])])
    np.testing.assert_allclose(before, after)


def test_multi_step_scan_matches_single_steps():
    """make_train_multi_step(K) produces bit-identical state evolution to K
    sequential single steps (same fold_in(rng, step) streams)."""
    import jax
    import jax.numpy as jnp

    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.losses import identity_gm
    from ladder_tpu.training.step import (
        init_state, make_train_multi_step, make_train_step)
    from tests.conftest import make_config

    cfg = make_config(prior="ours", batch_size=8, n_MC_samples=4,
                      n_mixtures=3, num_hidden_units=64,
                      num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2)
    model = make_model(cfg)
    state_a = init_state(model, jax.random.PRNGKey(0))
    state_b = init_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model)
    multi = make_train_multi_step(model)
    gm = identity_gm(cfg["n_mixtures"], cfg["representation_size"])
    lrs = {k: jnp.asarray(3e-4) for k in
           ["ae", "sigma", "prior", "inner_sigma"]}
    flags = {"use_sg_prior": jnp.asarray(False),
             "use_mask": jnp.asarray(False)}
    rng = jax.random.PRNGKey(5)
    K = 3
    batches = np.random.default_rng(0).uniform(
        0, 1, (K, 8, 28, 28, 1)).astype(np.float32)

    outs_single = []
    for i in range(K):
        state_a, out = step(state_a, jnp.asarray(batches[i]), rng, gm,
                            flags, lrs, True)
        outs_single.append(out)
    state_b, outs_multi = multi(state_b, jnp.asarray(batches), rng, gm,
                                flags, lrs, True)

    # identical rng streams and update math; tolerances only absorb XLA's
    # scanned-vs-unrolled fusion reassociation
    for a, b in zip(jax.tree.leaves(state_a["params"]),
                    jax.tree.leaves(state_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)
    for i in range(K):
        np.testing.assert_allclose(
            float(outs_single[i]["ae"]["loss_ae"]),
            float(np.asarray(outs_multi["ae"]["loss_ae"])[i]), rtol=1e-5)


def test_trainer_steps_per_call_matches_single(tmp_path, monkeypatch):
    """A full trainer epoch with steps_per_call=4 (incl. a remainder batch)
    produces the same metric curves as steps_per_call=1."""
    monkeypatch.chdir(tmp_path)
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs
    from tests.conftest import make_config

    losses = {}
    for spc in (1, 4):
        cfg = make_config(num_epochs=1, prior="standard_gaussian",
                          synthetic_n_train=384,  # 6 batches: 4 + 2 remainder
                          synthetic_n_test=128, num_hidden_units=64,
                          enable_plots=0, steps_per_call=spc, seed=3)
        cfg["result_dir"] = str(tmp_path / f"r{spc}") + "/"
        cfg["checkpoint_dir"] = str(tmp_path / f"c{spc}") + "/"
        create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
        t = MNISTTrainer(make_model(cfg), DataGenerator(cfg), cfg)
        t.train()
        losses[spc] = list(t.metrics.train_loss)
    assert len(losses[1]) == len(losses[4]) == 6
    # scanned-vs-unrolled XLA reassociation only
    np.testing.assert_allclose(losses[1], losses[4], rtol=1e-4)


def test_multi_step_unroll_matches_unroll1():
    """config['scan_unroll'] > 1 is a pure schedule hint: the K-step scan
    with unroll=2 evolves state identically to unroll=1 (same fold_in rng
    streams, same update math; tolerances absorb XLA fusion
    reassociation between the rolled and unrolled loop bodies)."""
    import jax
    import jax.numpy as jnp

    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.losses import identity_gm
    from ladder_tpu.training.step import init_state, make_train_multi_step
    from tests.conftest import make_config

    gm = None
    results = {}
    for unroll in (1, 2):
        cfg = make_config(prior="ours", batch_size=8, n_MC_samples=4,
                          n_mixtures=3, num_hidden_units=64,
                          num_hidden_units_inner_VAE=16,
                          n_layers_inner_VAE=2)
        cfg["scan_unroll"] = unroll
        model = make_model(cfg)
        state = init_state(model, jax.random.PRNGKey(0))
        multi = make_train_multi_step(model)
        if gm is None:
            gm = identity_gm(cfg["n_mixtures"], cfg["representation_size"])
        lrs = {k: jnp.asarray(3e-4) for k in
               ["ae", "sigma", "prior", "inner_sigma"]}
        flags = {"use_sg_prior": jnp.asarray(False),
                 "use_mask": jnp.asarray(False)}
        batches = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (4, 8, 28, 28, 1)).astype(np.float32))
        state, outs = multi(state, batches, jax.random.PRNGKey(5), gm,
                            flags, lrs, True)
        results[unroll] = (state, np.asarray(outs["ae"]["loss_ae"]))

    np.testing.assert_allclose(results[1][1], results[2][1], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(results[1][0]["params"]),
                    jax.tree.leaves(results[2][0]["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)


def test_multi_step_donate_batch_stack():
    """config['donate_batch_stack'] donates the [K,B,...] input; results are
    identical and the trainer-style fresh-stack-per-call pattern works (on
    CPU donation is advisory — XLA may ignore it — so this pins semantics,
    not buffer reuse)."""
    import jax
    import jax.numpy as jnp

    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.losses import identity_gm
    from ladder_tpu.training.step import init_state, make_train_multi_step
    from tests.conftest import make_config

    losses = {}
    for donate in (0, 1):
        cfg = make_config(prior="ours", batch_size=8, n_MC_samples=4,
                          n_mixtures=3, num_hidden_units=64,
                          num_hidden_units_inner_VAE=16,
                          n_layers_inner_VAE=2)
        cfg["donate_batch_stack"] = donate
        model = make_model(cfg)
        state = init_state(model, jax.random.PRNGKey(0))
        multi = make_train_multi_step(model)
        gm = identity_gm(cfg["n_mixtures"], cfg["representation_size"])
        lrs = {k: jnp.asarray(3e-4) for k in
               ["ae", "sigma", "prior", "inner_sigma"]}
        flags = {"use_sg_prior": jnp.asarray(False),
                 "use_mask": jnp.asarray(False)}
        host = np.random.default_rng(0).uniform(
            0, 1, (3, 8, 28, 28, 1)).astype(np.float32)
        traj = []
        for _ in range(2):  # fresh stack per call, as the trainer does
            stack = jnp.asarray(host)
            state, outs = multi(state, stack, jax.random.PRNGKey(5), gm,
                                flags, lrs, True)
            traj.append(np.asarray(outs["ae"]["loss_ae"]))
        losses[donate] = np.concatenate(traj)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
