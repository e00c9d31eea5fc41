"""Data-parallel correctness on the 8-device virtual CPU mesh (SURVEY.md §4):
sharded-batch loss/grads match single-device, and the full train step runs
under sharding with identical results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ladder_tpu.models.builder import make_model
from ladder_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from ladder_tpu.training.losses import compute_loss
from ladder_tpu.training.step import init_state, make_train_step
from tests.conftest import make_config


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    return make_mesh()


def test_sharded_loss_matches_single_device(mesh):
    cfg = make_config(prior="standard_gaussian", batch_size=16)
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = np.random.default_rng(0).uniform(
        0, 1, (16, 28, 28, 1)).astype(np.float32)
    rng = jax.random.PRNGKey(7)

    def loss_fn(p, x):
        return compute_loss(model, p, x, rng)[0]

    jitted = jax.jit(loss_fn)
    single = float(jitted(params, jnp.asarray(batch)))

    p_repl = replicate(params, mesh)
    x_shard = shard_batch(batch, mesh)
    sharded = float(jitted(p_repl, x_shard))
    np.testing.assert_allclose(sharded, single, rtol=1e-5)


def test_sharded_grads_match_single_device(mesh):
    cfg = make_config(prior="standard_gaussian", batch_size=16)
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    batch = np.random.default_rng(1).uniform(
        0, 1, (16, 28, 28, 1)).astype(np.float32)
    rng = jax.random.PRNGKey(3)

    grad_fn = jax.jit(jax.grad(
        lambda p, x: compute_loss(model, p, x, rng)[0]))
    g_single = grad_fn(params, jnp.asarray(batch))
    g_shard = grad_fn(replicate(params, mesh), shard_batch(batch, mesh))
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_shard)):
        # float32 cross-shard reduction order shifts the big L1 sums slightly
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_sharded_train_step_matches_single(mesh):
    """One fused train step under the mesh == single-device step (psum
    correctness end-to-end through 2 optimiser groups)."""
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
    new_b, out_b = step(replicate(state_b, mesh), shard_batch(batch, mesh),
                        rng, None, flags, lrs, False)
    np.testing.assert_allclose(float(out_a["ae"]["loss_ae"]),
                               float(out_b["ae"]["loss_ae"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_a["params"]),
                    jax.tree.leaves(new_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_batch_sharding_layout(mesh):
    batch = np.zeros((16, 28, 28, 1), dtype=np.float32)
    x = shard_batch(batch, mesh)
    # 8 devices, 16 rows -> 2 rows per device
    assert len(x.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(2, 28, 28, 1)}


@pytest.mark.parametrize("steps_per_call", [1, 2])
def test_trainer_with_mesh_e2e(mesh, tmp_path, monkeypatch, steps_per_call):
    """Full trainer epoch with the data-parallel mesh wired in (the
    config['mesh_shape'] CLI path) — including the production K-step
    dispatch (steps_per_call>1: the [K, B, ...] stack sharded
    P(None, data))."""
    monkeypatch.chdir(tmp_path)
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    cfg = make_config(prior="ours", num_epochs=1, sg_pretraining=0,
                      accurate_fit=5, n_MC_samples=4, n_mixtures=3,
                      num_hidden_units=64, num_hidden_units_inner_VAE=16,
                      n_layers_inner_VAE=2, enable_plots=0,
                      synthetic_n_train=256, synthetic_n_test=128,
                      batch_size=64, steps_per_call=steps_per_call)
    cfg["result_dir"] = str(tmp_path / "result") + "/"
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt") + "/"
    create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
    model = make_model(cfg)
    data = DataGenerator(cfg)
    trainer = MNISTTrainer(model, data, cfg, mesh=mesh)
    trainer.train()
    assert len(trainer.metrics.train_loss) == 256 // 64
    assert np.all(np.isfinite(trainer.metrics.train_loss))
    assert trainer.gm_fast is not None


def test_production_config_sharded_matches_single(mesh):
    """VERDICT r1 item 3: the exact benchmark configuration — CelebA model,
    fused_train_step=2 (single-pass), dtype=bfloat16, prior='ours' — runs
    one step sharded over the mesh and matches the single-device step."""
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
    new_b, out_b = step(replicate(state_b, mesh), shard_batch(batch, mesh),
                        rng, replicate(gm, mesh), flags, lrs, True)
    # bf16 forward + float32 cross-shard reductions: modest tolerances
    np.testing.assert_allclose(float(out_a["ae"]["loss_ae"]),
                               float(out_b["ae"]["loss_ae"]), rtol=2e-2)
    np.testing.assert_allclose(float(out_a["prior"]["elbo_prior"]),
                               float(out_b["prior"]["elbo_prior"]),
                               rtol=2e-2, atol=1e-2)
    assert np.isfinite(float(out_b["ae"]["loss_ae"]))
    for a, b in zip(jax.tree.leaves(new_a["params"]),
                    jax.tree.leaves(new_b["params"])):
        np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                                   np.asarray(b, dtype=np.float32),
                                   rtol=5e-2, atol=5e-3)


def test_single_pass_mode_sharded_matches_sequential_quality(mesh):
    """Mode 2 under the mesh is bit-identical to mode 2 single-device on the
    MNIST family too (regression for the fused=2 + mesh interaction)."""
    cfg = make_config(prior="ours", batch_size=16, n_MC_samples=4,
                      n_mixtures=3, num_hidden_units=64,
                      num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2,
                      fused_train_step=2)
    from ladder_tpu.training.losses import identity_gm
    model = make_model(cfg)
    state_a = init_state(model, jax.random.PRNGKey(0))
    state_b = init_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model)
    batch = np.random.default_rng(4).uniform(
        0, 1, (16, 28, 28, 1)).astype(np.float32)
    gm = identity_gm(cfg["n_mixtures"], cfg["representation_size"])
    lrs = {k: jnp.asarray(3e-4) for k in
           ["ae", "sigma", "prior", "inner_sigma"]}
    flags = {"use_sg_prior": jnp.asarray(False),
             "use_mask": jnp.asarray(False)}
    rng = jax.random.PRNGKey(9)
    new_a, out_a = step(state_a, jnp.asarray(batch), rng, gm, flags, lrs,
                        True)
    new_b, out_b = step(replicate(state_b, mesh), shard_batch(batch, mesh),
                        rng, replicate(gm, mesh), flags, lrs, True)
    np.testing.assert_allclose(float(out_a["ae"]["loss_ae"]),
                               float(out_b["ae"]["loss_ae"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_a["params"]),
                    jax.tree.leaves(new_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_multi_step_sharded_stack_matches_single(mesh):
    """VERDICT r2 item 5: the production dispatch layout — K-step lax.scan
    over a [K, B, ...] stack sharded P(None, data) (the trainer's
    _place_stack layout, trainer.py:134-145) with the benchmark config
    (fused=2, bf16, 'ours') — matches the single-device K-scan."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ladder_tpu.training.losses import identity_gm
    from ladder_tpu.training.step import make_train_multi_step

    cfg = make_config(
        exp_name="celeba", prior="ours", batch_size=16,
        dim_input_x=128, dim_input_y=128, dim_input_channel=3,
        code_size=8, num_hidden_units=16, num_hidden_units_inner_VAE=16,
        n_layers_inner_VAE=2, n_MC_samples=4, n_mixtures=3,
        fused_train_step=2, dtype="bfloat16")
    model = make_model(cfg)
    state_a = init_state(model, jax.random.PRNGKey(0))
    state_b = init_state(model, jax.random.PRNGKey(0))
    multi = make_train_multi_step(model)
    K = 3
    stack_host = np.random.default_rng(8).integers(
        0, 256, (K, 16, 128, 128, 3)).astype(np.uint8)
    gm = identity_gm(cfg["n_mixtures"], cfg["representation_size"])
    lrs = {k: jnp.asarray(3e-4) for k in
           ["ae", "sigma", "prior", "inner_sigma"]}
    flags = {"use_sg_prior": jnp.asarray(False),
             "use_mask": jnp.asarray(False)}
    rng = jax.random.PRNGKey(11)

    new_a, outs_a = multi(state_a, jnp.asarray(stack_host), rng, gm, flags,
                          lrs, True)

    stack = jax.device_put(
        stack_host, NamedSharding(mesh, P(None, mesh.axis_names[0])))
    assert len(stack.sharding.device_set) == 8
    # step axis replicated, batch axis sharded 16/8 = 2 rows per device
    assert {s.data.shape for s in stack.addressable_shards} == \
        {(K, 2, 128, 128, 3)}
    new_b, outs_b = multi(replicate(state_b, mesh), stack, rng,
                          replicate(gm, mesh), flags, lrs, True)

    # per-step loss curves track (bf16 forward + cross-shard reductions)
    np.testing.assert_allclose(np.asarray(outs_a["ae"]["loss_ae"]),
                               np.asarray(outs_b["ae"]["loss_ae"]),
                               rtol=2e-2)
    for a, b in zip(jax.tree.leaves(new_a["params"]),
                    jax.tree.leaves(new_b["params"])):
        np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                                   np.asarray(b, dtype=np.float32),
                                   rtol=5e-2, atol=5e-3)


def test_multi_epoch_curve_equivalence_sharded_vs_single(mesh, tmp_path,
                                                         monkeypatch):
    """VERDICT r2 item 4: data parallelism preserves the RECIPE, not just
    one step — train the MNIST 'ours' configuration 8 epochs on the
    8-device mesh and single-device with the same seed and assert the
    per-epoch loss/sigma curves track (epoch semantics: base.py:848-860)."""
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    def run(tag, use_mesh):
        monkeypatch.chdir(tmp_path)
        cfg = make_config(prior="ours", num_epochs=8, sg_pretraining=2,
                          use_mask_start=5, accurate_fit=4, n_MC_samples=4,
                          n_mixtures=3, num_hidden_units=64,
                          num_hidden_units_inner_VAE=16,
                          n_layers_inner_VAE=2, enable_plots=0,
                          synthetic_n_train=256, synthetic_n_test=128,
                          batch_size=64, seed=7)
        cfg["result_dir"] = str(tmp_path / tag / "result") + "/"
        cfg["checkpoint_dir"] = str(tmp_path / tag / "ckpt") + "/"
        create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
        trainer = MNISTTrainer(make_model(cfg), DataGenerator(cfg), cfg,
                               mesh=mesh if use_mesh else None)
        trainer.train()
        m = trainer.metrics
        loss = np.asarray(m.train_loss, np.float64).reshape(8, -1).mean(1)
        return loss, np.asarray(m.sigma_train, np.float64), \
            np.asarray(m.val_loss_ave_epoch, np.float64)

    loss_s, sigma_s, val_s = run("single", False)
    loss_m, sigma_m, val_m = run("mesh", True)
    assert loss_s.shape == loss_m.shape == (8,)
    # same program, same rng stream; only cross-shard reduction order
    # differs — the curves must track tightly across all 8 epochs
    np.testing.assert_allclose(loss_m, loss_s, rtol=2e-3)
    np.testing.assert_allclose(val_m, val_s, rtol=2e-3)
    np.testing.assert_allclose(sigma_m, sigma_s, rtol=2e-3)
    # and the recipe actually trained (loss falls over the run)
    assert loss_s[-1] < loss_s[0]


def test_global_batch_from_local_single_process(mesh):
    from ladder_tpu.parallel.mesh import global_batch_from_local

    batch = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    x = global_batch_from_local(batch, mesh)
    assert x.shape == (16, 4)
    np.testing.assert_array_equal(np.asarray(x), batch)
    assert len(x.sharding.device_set) == 8


def test_place_global_batch_rejects_indivisible(mesh, monkeypatch):
    """Multi-process placement must fail loudly when the global batch does
    not divide across processes: the floor-division slicing would silently
    drop rows AND assemble a global array smaller than the compiled
    program's batch axis."""
    from ladder_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 3)
    batch = np.zeros((16, 4), np.float32)
    with pytest.raises(ValueError, match="does not divide"):
        mesh_mod.place_global_batch(batch, mesh)
    stack = np.zeros((2, 16, 4), np.float32)
    with pytest.raises(ValueError, match="does not divide"):
        mesh_mod.place_global_stack(stack, mesh)
