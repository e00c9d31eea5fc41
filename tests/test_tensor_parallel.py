"""Tensor-parallel (2-D data x model mesh) correctness on the 8-device
virtual CPU mesh: parameter/Adam-moment sharding rules, train-step parity
with single-device, the production (fused=2, bf16) configuration, and the
trainer wired through config['mesh_shape']=[n_data, n_model]. The reference
is single-device (SURVEY.md §2 component 31); this axis is new capability.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ladder_tpu.models.builder import make_model
from ladder_tpu.parallel.mesh import make_mesh, replicate, shard_batch, \
    shard_state
from ladder_tpu.parallel.tp import leaf_spec, make_mesh_2d, \
    model_axis_size, shard_params_tp
from ladder_tpu.training.step import init_state, make_train_step
from tests.conftest import make_config


@pytest.fixture(scope="module")
def mesh2d():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    return make_mesh_2d(n_data=4, n_model=2)


def test_leaf_spec_rules():
    # conv HWIO kernel: shard output channels (last axis)
    assert leaf_spec((3, 3, 16, 32), 2) == P(None, None, None, "model")
    # dense [in, out]: shard output features
    assert leaf_spec((64, 128), 4) == P(None, "model")
    # bias: shard the channel axis
    assert leaf_spec((32,), 2) == P("model")
    # last axis indivisible -> falls back to an earlier divisible axis
    assert leaf_spec((16, 3), 2) == P("model", None)
    # scalar / indivisible / degenerate: replicate
    assert leaf_spec((), 2) == P()
    assert leaf_spec((3, 5), 2) == P()
    assert leaf_spec((1, 1), 2) == P()
    # n_model 1 (or a 1-D mesh) never shards
    assert leaf_spec((64, 128), 1) == P()


def test_leaf_spec_never_shards_conv_spatial_axes():
    """ADVICE r3: a conv kernel's 3-wide spatial axis must never shard even
    when it is the only divisible axis (n_model=3, channels indivisible)."""
    assert leaf_spec((3, 3, 16, 31), 3) == P()
    assert leaf_spec((3, 3, 16, 32), 3) == P()
    # input channels (second-to-last) remain a legitimate fallback
    assert leaf_spec((3, 3, 15, 32), 3) == P(None, None, "model", None)
    # 5-D (e.g. stacked kernels): same trailing-two-axes rule
    assert leaf_spec((4, 3, 3, 8, 31), 4) == P(None, None, None, "model",
                                               None)


def test_make_mesh_rejects_3d_shape():
    """ADVICE r3: a [2,2,2] mesh_shape must fail loudly, not silently
    flatten to 1-D data parallelism."""
    with pytest.raises(ValueError, match="mesh_shape"):
        make_mesh({"mesh_shape": [2, 2, 2]})


def test_mesh_axis_introspection(mesh2d):
    assert model_axis_size(mesh2d) == 2
    assert model_axis_size(make_mesh()) == 0
    assert mesh2d.axis_names == ("data", "model")


def test_state_sharding_layout(mesh2d):
    """Params AND Adam moments land model-sharded; scalars replicated."""
    cfg = make_config(prior="standard_gaussian", batch_size=16)
    model = make_model(cfg)
    state = shard_state(init_state(model, jax.random.PRNGKey(0)), mesh2d)

    def shards(x):
        return {s.data.shape for s in x.addressable_shards}

    k = state["params"]["encoder"]["Conv_2"]["kernel"]
    assert k.shape[-1] % 2 == 0
    # each device holds half the output channels, on all 8 devices
    assert shards(k) == {k.shape[:-1] + (k.shape[-1] // 2,)}
    assert len(k.sharding.device_set) == 8
    # Adam moments follow the identical layout
    m = state["opt"]["ae"]["m"]["encoder"]["Conv_2"]["kernel"]
    assert m.sharding == k.sharding
    # scalars (step counter, Adam t) replicated
    assert state["step"].sharding.is_fully_replicated
    assert state["opt"]["ae"]["t"].sharding.is_fully_replicated


def test_tp_train_step_matches_single_device(mesh2d):
    """One fused train step with params/moments sharded over the model axis
    and the batch over the data axis == the single-device step (GSPMD
    collective insertion end-to-end through 2 optimiser groups)."""
    cfg = make_config(prior="standard_gaussian", batch_size=16)
    model = make_model(cfg)
    rng0 = jax.random.PRNGKey(0)
    state_a = init_state(model, rng0)
    state_b = init_state(model, rng0)
    step = make_train_step(model)
    batch = np.random.default_rng(2).uniform(
        0, 1, (16, 28, 28, 1)).astype(np.float32)
    rng = jax.random.PRNGKey(5)
    lrs = {k: jnp.asarray(3e-4) for k in
           ["ae", "sigma", "prior", "inner_sigma"]}
    flags = {"use_sg_prior": jnp.asarray(False),
             "use_mask": jnp.asarray(False)}

    new_a, out_a = step(state_a, jnp.asarray(batch), rng, None, flags, lrs,
                        False)
    new_b, out_b = step(shard_state(state_b, mesh2d),
                        shard_batch(batch, mesh2d), rng, None, flags, lrs,
                        False)
    np.testing.assert_allclose(float(out_a["ae"]["loss_ae"]),
                               float(out_b["ae"]["loss_ae"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_a["params"]),
                    jax.tree.leaves(new_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_tp_production_config_matches_single(mesh2d):
    """The benchmark configuration — CelebA, fused_train_step=2, bf16,
    'ours' — over the 2-D mesh matches single-device."""
    from ladder_tpu.training.losses import identity_gm

    cfg = make_config(
        exp_name="celeba", prior="ours", batch_size=16,
        dim_input_x=128, dim_input_y=128, dim_input_channel=3,
        code_size=8, num_hidden_units=16, num_hidden_units_inner_VAE=16,
        n_layers_inner_VAE=2, n_MC_samples=4, n_mixtures=3,
        fused_train_step=2, dtype="bfloat16")
    model = make_model(cfg)
    rng0 = jax.random.PRNGKey(0)
    state_a = init_state(model, rng0)
    state_b = init_state(model, rng0)
    step = make_train_step(model)
    batch = np.random.default_rng(3).integers(
        0, 256, (16, 128, 128, 3)).astype(np.uint8)
    rng = jax.random.PRNGKey(5)
    gm = identity_gm(cfg["n_mixtures"], cfg["representation_size"])
    lrs = {k: jnp.asarray(3e-4) for k in
           ["ae", "sigma", "prior", "inner_sigma"]}
    flags = {"use_sg_prior": jnp.asarray(False),
             "use_mask": jnp.asarray(False)}

    new_a, out_a = step(state_a, jnp.asarray(batch), rng, gm, flags, lrs,
                        True)
    new_b, out_b = step(shard_state(state_b, mesh2d),
                        shard_batch(batch, mesh2d), rng,
                        replicate(gm, mesh2d), flags, lrs, True)
    np.testing.assert_allclose(float(out_a["ae"]["loss_ae"]),
                               float(out_b["ae"]["loss_ae"]), rtol=2e-2)
    assert np.isfinite(float(out_b["ae"]["loss_ae"]))
    for a, b in zip(jax.tree.leaves(new_a["params"]),
                    jax.tree.leaves(new_b["params"])):
        np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                                   np.asarray(b, dtype=np.float32),
                                   rtol=5e-2, atol=5e-3)


def test_tp_multi_step_stack_matches_single(mesh2d):
    """The production dispatch layout under TP: K-step lax.scan over a
    [K, B, ...] stack sharded P(None, data) with params/moments sharded
    over the model axis — matches the single-device K-scan (the TP
    counterpart of test_parallel.py's K-stack case)."""
    from jax.sharding import NamedSharding

    from ladder_tpu.training.losses import identity_gm
    from ladder_tpu.training.step import make_train_multi_step

    cfg = make_config(prior="ours", batch_size=16, n_MC_samples=4,
                      n_mixtures=3, num_hidden_units=64,
                      num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2,
                      fused_train_step=2)
    model = make_model(cfg)
    state_a = init_state(model, jax.random.PRNGKey(0))
    state_b = init_state(model, jax.random.PRNGKey(0))
    multi = make_train_multi_step(model)
    K = 2
    stack_host = np.random.default_rng(8).uniform(
        0, 1, (K, 16, 28, 28, 1)).astype(np.float32)
    gm = identity_gm(cfg["n_mixtures"], cfg["representation_size"])
    lrs = {k: jnp.asarray(3e-4) for k in
           ["ae", "sigma", "prior", "inner_sigma"]}
    flags = {"use_sg_prior": jnp.asarray(False),
             "use_mask": jnp.asarray(False)}
    rng = jax.random.PRNGKey(11)

    new_a, outs_a = multi(state_a, jnp.asarray(stack_host), rng, gm, flags,
                          lrs, True)
    stack = jax.device_put(
        stack_host, NamedSharding(mesh2d, P(None, "data")))
    new_b, outs_b = multi(shard_state(state_b, mesh2d), stack, rng,
                          replicate(gm, mesh2d), flags, lrs, True)
    np.testing.assert_allclose(np.asarray(outs_a["ae"]["loss_ae"]),
                               np.asarray(outs_b["ae"]["loss_ae"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_a["params"]),
                    jax.tree.leaves(new_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_tp_memory_per_device_halves(mesh2d):
    """The ZeRO-style memory claim as a measured invariant (VERDICT r3 item
    4): on the 4x2 mesh the sum of addressable shard bytes PER DEVICE for
    params + Adam m/v equals the leaf_spec prediction exactly, and is well
    under the replicated total (the slack is the indivisible leaves that
    replicate)."""
    cfg = make_config(prior="ours", batch_size=16, n_MC_samples=4,
                      n_mixtures=3, num_hidden_units=64,
                      num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2)
    model = make_model(cfg)
    state = init_state(model, jax.random.PRNGKey(0))
    memory_trees = [state["params"]] + \
        [state["opt"][g][k] for g in state["opt"] for k in ("m", "v")]
    replicated_bytes = sum(
        np.asarray(leaf).nbytes
        for t in memory_trees for leaf in jax.tree.leaves(t))
    expected = 0
    for t in memory_trees:
        for leaf in jax.tree.leaves(t):
            nb = np.asarray(leaf).nbytes
            expected += nb // 2 if leaf_spec(np.shape(leaf), 2) != P() \
                else nb
    sharded = shard_state(state, mesh2d)
    dev0 = mesh2d.devices.flat[0]
    sharded_trees = [sharded["params"]] + \
        [sharded["opt"][g][k] for g in sharded["opt"] for k in ("m", "v")]
    per_device = 0
    for t in sharded_trees:
        for leaf in jax.tree.leaves(t):
            shard = [s for s in leaf.addressable_shards
                     if s.device == dev0][0]
            per_device += int(np.prod(shard.data.shape)) * \
                leaf.dtype.itemsize
    assert per_device == expected
    # the claim: close to half; indivisible-leaf slack stays small
    assert per_device <= 0.55 * replicated_bytes, \
        (per_device, replicated_bytes)


def test_tp_full_state_checkpoint_roundtrip(tmp_path, monkeypatch):
    """TP-sharded full-state save -> restore -> resume (VERDICT r3 item 4 +
    ADVICE r3 restore fix): the resumed trainer re-applies the TP layout
    (model-sharded params/moments, not host/replicated) and trains another
    epoch to finite losses."""
    monkeypatch.chdir(tmp_path)
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    def build(num_epochs):
        cfg = make_config(prior="ours", num_epochs=num_epochs,
                          sg_pretraining=0, accurate_fit=5, n_MC_samples=4,
                          n_mixtures=3, num_hidden_units=64,
                          num_hidden_units_inner_VAE=16,
                          n_layers_inner_VAE=2, enable_plots=0,
                          synthetic_n_train=128, synthetic_n_test=64,
                          batch_size=32, mesh_shape=[4, 2])
        cfg["result_dir"] = str(tmp_path / "result") + "/"
        cfg["checkpoint_dir"] = str(tmp_path / "ckpt") + "/"
        create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
        mesh = make_mesh(cfg)
        model = make_model(cfg)
        return MNISTTrainer(model, DataGenerator(cfg), cfg, mesh=mesh)

    t1 = build(num_epochs=1)
    t1.train()
    k1 = t1.state["params"]["encoder"]["Conv_2"]["kernel"]
    assert not k1.sharding.is_fully_replicated  # TP layout in effect

    t2 = build(num_epochs=2)
    t2.restore()
    assert t2.cur_epoch == 1
    k2 = t2.state["params"]["encoder"]["Conv_2"]["kernel"]
    assert isinstance(k2, jax.Array)
    assert k2.sharding == k1.sharding  # layout survived the round trip
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k1))
    m2 = t2.state["opt"]["ae"]["m"]["encoder"]["Conv_2"]["kernel"]
    assert m2.sharding == k1.sharding  # Adam moments too
    t2.train()  # one more epoch from the restored, re-sharded state
    assert t2.cur_epoch == 2
    assert np.all(np.isfinite(t2.metrics.train_loss))


def test_trainer_with_2d_mesh_e2e(tmp_path, monkeypatch):
    """Full trainer epoch with config['mesh_shape']=[4, 2]: make_mesh builds
    the 2-D mesh, shard_state applies the TP layout, and the epoch runs to
    finite losses with a GM fit."""
    monkeypatch.chdir(tmp_path)
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    cfg = make_config(prior="ours", num_epochs=1, sg_pretraining=0,
                      accurate_fit=5, n_MC_samples=4, n_mixtures=3,
                      num_hidden_units=64, num_hidden_units_inner_VAE=16,
                      n_layers_inner_VAE=2, enable_plots=0,
                      synthetic_n_train=256, synthetic_n_test=128,
                      batch_size=64, mesh_shape=[4, 2])
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt") + "/"
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
    mesh = make_mesh(cfg)
    assert model_axis_size(mesh) == 2
    model = make_model(cfg)
    data = DataGenerator(cfg)
    trainer = MNISTTrainer(model, data, cfg, mesh=mesh)
    trainer.train()
    assert len(trainer.metrics.train_loss) == 256 // 64
    assert np.all(np.isfinite(trainer.metrics.train_loss))
    assert trainer.gm_fast is not None
