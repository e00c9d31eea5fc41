"""End-to-end training tests: multi-epoch runs on tiny synthetic data for
each prior mode; loss decreases, artifacts produced, checkpoints round-trip
(SURVEY.md §4 integration-test strategy)."""

import os

import numpy as np
import pytest

from tests.conftest import make_config


def _train(tmp_path, monkeypatch, **overrides):
    monkeypatch.chdir(tmp_path)
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    cfg = make_config(
        num_epochs=2, sg_pretraining=1, accurate_fit=2,
        synthetic_n_train=512, synthetic_n_test=128,
        num_hidden_units=64, num_hidden_units_inner_VAE=16,
        n_layers_inner_VAE=2, n_MC_samples=4, n_mixtures=4,
        enable_plots=0, **overrides)
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    cfg["checkpoint_dir"] = str(tmp_path / "checkpoint") + "/"
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])

    data = DataGenerator(cfg)
    model = make_model(cfg)
    trainer = MNISTTrainer(model, data, cfg)
    trainer.train()
    return cfg, trainer


def test_e2e_standard_gaussian(tmp_path, monkeypatch):
    cfg, trainer = _train(tmp_path, monkeypatch, prior="standard_gaussian")
    losses = trainer.metrics.train_loss_ave_epoch
    assert len(losses) == 2
    assert losses[1] < losses[0], f"loss did not decrease: {losses}"
    # result npz with reference keys
    r = np.load(os.path.join(cfg["result_dir"], "mnist_digit-result.npz"))
    for key in ["train_loss", "elbo_train", "val_loss", "elbo_val",
                "recons_loss_train", "entropy_z_train",
                "crossentropy_z_train", "sigma_regularisor_train",
                "num_para_VAE", "sigma"]:
        assert key in r, f"missing npz key {key}"
    assert len(r["train_loss"]) == 2 * (512 // 64)
    # checkpoints written
    assert os.path.isfile(os.path.join(cfg["checkpoint_dir"],
                                       "vae-model.msgpack"))


def test_e2e_ours_full_rhythm(tmp_path, monkeypatch):
    cfg, trainer = _train(tmp_path, monkeypatch, prior="ours")
    # GM was fitted (fast each post-pretrain epoch, accurate on epoch 2)
    assert trainer.gm_fast is not None
    assert trainer.gm_final is not None
    w = np.asarray(trainer.gm_fast[0])
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-4)
    # accurate fit persisted
    gm_info = np.load(os.path.join(cfg["result_dir"], "GM_prior_info.npz"))
    assert set(gm_info.files) == {"w_active", "m_active", "K_active",
                                  "w_full", "m_full", "K_full"}
    # prior model checkpoint written
    assert os.path.isfile(os.path.join(cfg["checkpoint_dir"],
                                       "prior-model.msgpack"))
    # inner-VAE metrics recorded
    assert len(trainer.metrics.code_elbo_train) > 0
    assert len(trainer.metrics.code_inner_sigma_train) > 0
    # inner sigma respected its clamp
    s = np.asarray(trainer.metrics.code_inner_sigma_train)
    assert np.all(s >= cfg["inner_sigma_lb"] - 1e-6)
    assert np.all(s <= cfg["inner_sigma_ub"] + 1e-6)


@pytest.mark.parametrize("prior", ["GMM", "hierarchical", "vampPrior"])
def test_e2e_other_priors(tmp_path, monkeypatch, prior):
    cfg, trainer = _train(tmp_path, monkeypatch, prior=prior)
    losses = trainer.metrics.train_loss_ave_epoch
    assert len(losses) == 2
    assert np.all(np.isfinite(losses))
    if prior == "GMM":
        assert trainer.gm_fast is not None
    if prior == "vampPrior":
        assert len(trainer.metrics.vampPrior_crossEntropy_prior_train) > 0


def test_checkpoint_roundtrip_resume(tmp_path, monkeypatch):
    cfg, trainer = _train(tmp_path, monkeypatch, prior="ours")
    import jax

    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.trainer import MNISTTrainer

    model2 = make_model(cfg)
    data2 = DataGenerator(cfg)
    t2 = MNISTTrainer(model2, data2, cfg)
    t2.restore()
    # resumed at the right epoch with identical params
    assert t2.cur_epoch == 2
    for k in trainer.state["params"]:
        a = jax.tree.leaves(trainer.state["params"][k])
        b = jax.tree.leaves(t2.state["params"][k])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # optimiser moments restored too (full-state extension)
    assert int(t2.state["opt"]["ae"]["t"]) == int(trainer.state["opt"]["ae"]["t"])
    # GM state restored
    assert t2.gm_fast is not None
    np.testing.assert_allclose(np.asarray(t2.gm_fast[0]),
                               np.asarray(trainer.gm_fast[0]), rtol=1e-6)


def test_sklearn_backend_artifact_parity(tmp_path, monkeypatch):
    """VERDICT r1 item 5: gmm_backend='sklearn' produces the exact same
    artifact set as the default on-device backend — in particular
    GM_prior_info.npz on accurate fits (base.py:769-777)."""
    (tmp_path / "sk").mkdir()
    (tmp_path / "jx").mkdir()
    cfg_sk, t_sk = _train(tmp_path / "sk", monkeypatch, prior="ours",
                          gmm_backend="sklearn")
    cfg_jx, t_jx = _train(tmp_path / "jx", monkeypatch, prior="ours")
    files_sk = sorted(os.listdir(cfg_sk["result_dir"]))
    files_jx = sorted(os.listdir(cfg_jx["result_dir"]))
    assert files_sk == files_jx
    assert "GM_prior_info.npz" in files_sk
    # same npz key sets inside the artifacts too
    for name in files_sk:
        if name.endswith(".npz"):
            a = np.load(os.path.join(cfg_sk["result_dir"], name))
            b = np.load(os.path.join(cfg_jx["result_dir"], name))
            assert set(a.files) == set(b.files), name


def test_sigterm_preemption_saves_and_resumes(tmp_path, monkeypatch):
    """SIGTERM during training: the current epoch finishes, the per-epoch
    checkpoint + full state are saved, train() returns cleanly, and
    rerunning resumes to exactly num_epochs total (graceful-preemption
    path in trainer.train; the kill -9 crash path is tested below)."""
    import signal as _signal

    monkeypatch.chdir(tmp_path)
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    cfg = make_config(
        num_epochs=4, sg_pretraining=1, accurate_fit=10,
        synthetic_n_train=256, synthetic_n_test=128,
        num_hidden_units=64, num_hidden_units_inner_VAE=16,
        n_layers_inner_VAE=2, n_MC_samples=4, n_mixtures=4,
        enable_plots=0, prior="standard_gaussian")
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    cfg["checkpoint_dir"] = str(tmp_path / "checkpoint") + "/"
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])

    t1 = MNISTTrainer(make_model(cfg), DataGenerator(cfg), cfg)
    orig_epoch = t1.train_epoch

    def epoch_then_preempt():
        orig_epoch()
        if t1.cur_epoch == 2:  # scheduler preempts mid-run
            os.kill(os.getpid(), _signal.SIGTERM)

    t1.train_epoch = epoch_then_preempt
    t1.train()  # returns cleanly instead of dying
    assert t1.cur_epoch == 2
    assert t1._stop_requested
    assert os.path.isfile(os.path.join(cfg["checkpoint_dir"],
                                       "train-state.msgpack"))
    # the original handler is restored on exit
    assert _signal.getsignal(_signal.SIGTERM) == _signal.SIG_DFL

    t2 = MNISTTrainer(make_model(cfg), DataGenerator(cfg), cfg)
    t2.restore()
    assert t2.cur_epoch == 2
    t2.train()
    assert t2.cur_epoch == 4
    n_step_epoch = 256 // 64
    assert len(t2.metrics.train_loss) == 4 * n_step_epoch


def test_resume_trains_remaining_epochs(tmp_path, monkeypatch):
    """Crash at epoch 2 of 4, restore, train(): exactly 2 more epochs run
    (num_epochs total, not num_epochs more) and the npz metric curves from
    the resumed run concatenate seamlessly with the pre-crash epochs
    (reference per-epoch save semantics, base.py:848-860)."""
    monkeypatch.chdir(tmp_path)
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    cfg = make_config(
        num_epochs=4, sg_pretraining=1, accurate_fit=2,
        synthetic_n_train=512, synthetic_n_test=128,
        num_hidden_units=64, num_hidden_units_inner_VAE=16,
        n_layers_inner_VAE=2, n_MC_samples=4, n_mixtures=4,
        enable_plots=0, prior="standard_gaussian")
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    cfg["checkpoint_dir"] = str(tmp_path / "checkpoint") + "/"
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])

    # run 2 of the 4 epochs, checkpointing per epoch (simulated crash after)
    t1 = MNISTTrainer(make_model(cfg), DataGenerator(cfg), cfg)
    for _ in range(2):
        t1.train_epoch()
        t1.ckpt.save(t1.state, model="VAE")
        t1.save_full_state()
    n_step_epoch = 512 // 64
    pre_crash_losses = list(t1.metrics.train_loss)
    assert len(pre_crash_losses) == 2 * n_step_epoch

    t2 = MNISTTrainer(make_model(cfg), DataGenerator(cfg), cfg)
    t2.restore()
    assert t2.cur_epoch == 2
    t2.train()
    # exactly num_epochs total across crash + resume
    assert t2.cur_epoch == 4
    assert len(t2.metrics.train_loss) == 4 * n_step_epoch
    # pre-crash curve restored verbatim, resumed curve appended after it
    np.testing.assert_allclose(t2.metrics.train_loss[:2 * n_step_epoch],
                               pre_crash_losses, rtol=1e-6)
    r = np.load(os.path.join(cfg["result_dir"], "mnist_digit-result.npz"))
    assert len(r["train_loss"]) == 4 * n_step_epoch
    assert len(r["sigma"]) == 4
    # a second restore-of-the-finished-run trains zero further epochs
    t3 = MNISTTrainer(make_model(cfg), DataGenerator(cfg), cfg)
    t3.restore()
    t3.train()
    assert t3.cur_epoch == 4


def test_two_saver_independent_load(tmp_path, monkeypatch):
    """vae-model and prior-model load independently (base.py:68-85)."""
    cfg, trainer = _train(tmp_path, monkeypatch, prior="ours")
    import jax

    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.step import init_state
    from ladder_tpu.utils.checkpoint import CheckpointManager

    model2 = make_model(cfg)
    state2 = init_state(model2, jax.random.PRNGKey(123))
    ck = CheckpointManager(cfg)
    state2 = ck.load(state2, model="VAE")
    # encoder matches trained, prior params still fresh
    t_enc = jax.tree.leaves(trainer.state["params"]["encoder"])
    l_enc = jax.tree.leaves(state2["params"]["encoder"])
    for x, y in zip(t_enc, l_enc):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    t_pr = np.concatenate([np.asarray(x).ravel() for x in
                           jax.tree.leaves(trainer.state["params"]["prior"])])
    l_pr = np.concatenate([np.asarray(x).ravel() for x in
                           jax.tree.leaves(state2["params"]["prior"])])
    assert not np.allclose(t_pr, l_pr)


def test_missing_checkpoint_soft_fail(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import jax

    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.step import init_state
    from ladder_tpu.utils.checkpoint import CheckpointManager

    cfg = make_config(prior="ours")
    cfg["checkpoint_dir"] = str(tmp_path / "nonexistent") + "/"
    os.makedirs(cfg["checkpoint_dir"], exist_ok=True)
    model = make_model(cfg)
    state = init_state(model, jax.random.PRNGKey(0))
    ck = CheckpointManager(cfg)
    state2 = ck.load(state, model="VAE")  # must not raise
    assert state2 is not None


def test_e2e_fashion(tmp_path, monkeypatch):
    """MNIST-fashion model family end-to-end (4-conv encoder variant)."""
    cfg, trainer = _train(tmp_path, monkeypatch, prior="standard_gaussian",
                          exp_name="mnist_fashion")
    losses = trainer.metrics.train_loss_ave_epoch
    assert len(losses) == 2
    assert losses[1] < losses[0]
    r = np.load(os.path.join(cfg["result_dir"],
                             "mnist_fashion-result.npz"))
    assert len(r["train_loss"]) == 2 * (512 // 64)


def test_orbax_checkpoint_backend(tmp_path, monkeypatch):
    """Full-state save/restore through the orbax backend."""
    cfg, trainer = _train(tmp_path, monkeypatch, prior="standard_gaussian",
                          checkpoint_backend="orbax")
    import jax

    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.trainer import MNISTTrainer

    t2 = MNISTTrainer(make_model(cfg), DataGenerator(cfg), cfg)
    t2.restore()
    assert t2.cur_epoch == 2
    for a, b in zip(jax.tree.leaves(trainer.state["params"]),
                    jax.tree.leaves(t2.state["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scalar_summaries_written(tmp_path, monkeypatch):
    cfg, trainer = _train(tmp_path, monkeypatch, prior="standard_gaussian",
                          summary_dir=str(tmp_path / "summary") + "/")
    import json as _json
    path = os.path.join(cfg["summary_dir"], "scalars.jsonl")
    assert os.path.isfile(path)
    rows = [_json.loads(l) for l in open(path)]
    assert len(rows) == 2
    assert rows[0]["epoch"] == 1
    assert np.isfinite(rows[1]["train_loss"])
    assert rows[1]["val_loss"] is not None
    assert "timing_step_ms" in rows[0]


def test_async_checkpoint_e2e_and_resume(tmp_path, monkeypatch):
    """config['async_checkpoint']=1: per-epoch saves run on the writer
    thread while training continues; train() drains them, and a fresh
    trainer restores the identical state (params, moments, GM, epoch)."""
    cfg, trainer = _train(tmp_path, monkeypatch, prior="ours",
                          async_checkpoint=1)
    import jax

    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.training.trainer import MNISTTrainer

    for name in ("vae-model.msgpack", "prior-model.msgpack",
                 "train-state.msgpack"):
        assert os.path.isfile(os.path.join(cfg["checkpoint_dir"], name))
    assert not [f for f in os.listdir(cfg["checkpoint_dir"])
                if f.endswith(".tmp")]

    t2 = MNISTTrainer(make_model(cfg), DataGenerator(cfg), cfg)
    t2.restore()
    assert t2.cur_epoch == 2
    for x, y in zip(jax.tree.leaves(trainer.state),
                    jax.tree.leaves(t2.state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_allclose(np.asarray(t2.gm_fast[0]),
                               np.asarray(trainer.gm_fast[0]), rtol=1e-6)


def test_async_checkpoint_donation_safety(tmp_path):
    """The snapshot must be taken before the training thread donates the
    state buffers: save, then invalidate the ORIGINAL arrays via a donating
    jitted call, then flush — the written checkpoint holds the pre-donation
    values."""
    import jax
    import jax.numpy as jnp

    from ladder_tpu.utils.checkpoint import CheckpointManager

    cfg = {"checkpoint_dir": str(tmp_path) + "/", "prior": "ours",
           "TRAIN_VAE": 1, "TRAIN_prior": 1, "async_checkpoint": 1}
    ck = CheckpointManager(cfg)
    state = {"w": jnp.arange(8, dtype=jnp.float32)}
    ck.save_full(state)

    donate = jax.jit(lambda x: x + 1.0, donate_argnums=(0,))
    _ = donate(state["w"])  # invalidates the original buffer
    ck.flush()
    restored, _extra = ck.load_full({"w": jnp.zeros(8, jnp.float32)})
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(8, dtype=np.float32))


def test_async_checkpoint_error_propagation(tmp_path):
    """A failing disk must not be silent: the worker's exception re-raises
    on flush()."""
    import jax.numpy as jnp
    import pytest

    from ladder_tpu.utils.checkpoint import CheckpointManager

    cfg = {"checkpoint_dir": str(tmp_path / "missing" / "deeper") + "/",
           "prior": "ours", "TRAIN_VAE": 1, "TRAIN_prior": 1,
           "async_checkpoint": 1}
    ck = CheckpointManager(cfg)
    ck.save_full({"w": jnp.zeros(4)})
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        ck.flush()
    # STICKY: the error must not clear itself — a later flush() returning
    # success would claim disk state the failed write never produced
    with pytest.raises(RuntimeError, match="sticky"):
        ck.flush()
    with pytest.raises(RuntimeError, match="sticky"):
        ck.save_full({"w": jnp.zeros(4)})
    # explicit acknowledgement resumes the stream
    ck._writer.reset_error()
    os.makedirs(cfg["checkpoint_dir"], exist_ok=True)
    ck.save_full({"w": jnp.ones(4)})
    ck.flush()
    restored, _ = ck.load_full({"w": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones(4))
