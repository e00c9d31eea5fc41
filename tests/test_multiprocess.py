"""Multi-process input sharding: drive global_batch_from_local's
process_count()>1 branch (jax.make_array_from_process_local_data) with a
real 2-process jax.distributed CPU cluster, each process contributing its
local slice of the global batch (SURVEY.md §5 distributed-backend design;
VERDICT r1 item 4)."""

import json
import os
import subprocess
import sys
import socket

import numpy as np

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

coord = sys.argv[1]
pid = int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())   # 4 local x 2 processes

sys.path.insert(0, os.environ["LADDER_REPO"])
from ladder_tpu.parallel.mesh import global_batch_from_local, make_mesh

mesh = make_mesh()
# global batch 16: process 0 holds rows 0..7, process 1 rows 8..15
local = (np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
         + 32.0 * pid)
x = global_batch_from_local(local, mesh)
assert x.shape == (16, 4), x.shape
assert len(x.sharding.device_set) == 8
# each process addresses only its own 4 shards, each (2, 4)
shards = x.addressable_shards
assert len(shards) == 4, len(shards)
assert {s.data.shape for s in shards} == {(2, 4)}
# the local data landed in this process's slice of the global array
got = np.concatenate([np.asarray(s.data) for s in
                      sorted(shards, key=lambda s: s.index[0].start)])
np.testing.assert_array_equal(got, local)
# a jitted global reduction over the distributed array (XLA inserts the
# cross-process collective)
total = float(jax.jit(lambda a: a.sum())(x))
expect = float(np.arange(32, dtype=np.float32).sum()
               + (np.arange(32, dtype=np.float32) + 32.0).sum())
assert abs(total - expect) < 1e-3, (total, expect)
print(f"proc{pid}: ok total={total}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


TRAINER_WORKER = r"""
import os, sys, json
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

coord, pid, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8
sys.path.insert(0, os.environ["LADDER_REPO"])
os.chdir(workdir)

from tests.conftest import make_config
from ladder_tpu.data.mnist import DataGenerator
from ladder_tpu.models.builder import make_model
from ladder_tpu.parallel.mesh import make_mesh
from ladder_tpu.training.trainer import MNISTTrainer
from ladder_tpu.utils.config import create_dirs

cfg = json.loads(open(os.path.join(workdir, "cfg.json")).read())
create_dirs([cfg["result_dir"], cfg["checkpoint_dir"]])
trainer = MNISTTrainer(make_model(cfg), DataGenerator(cfg), cfg,
                       mesh=make_mesh(cfg))
assert trainer.is_lead == (pid == 0)
if cfg.get("mesh_shape") and len(cfg["mesh_shape"]) == 2:
    # tensor-parallel under jax.distributed: params/Adam moments shard
    # over the model axis AND replicate over the cross-process data axis,
    # so TP leaves are neither fully replicated nor fully addressable —
    # every checkpoint save exercises the collective process_allgather
    leaves = jax.tree.leaves(trainer.state["params"])
    assert any(not l.sharding.is_fully_replicated for l in leaves)
    assert any(not l.is_fully_addressable for l in leaves)
trainer.train()
m = trainer.metrics
np.savez(os.path.join(workdir, f"curves_{pid}.npz"),
         train_loss=np.asarray(m.train_loss, np.float64),
         sigma=np.asarray(m.sigma_train, np.float64),
         val=np.asarray(m.val_loss_ave_epoch, np.float64))
print(f"proc{pid}: trainer ok")
"""


def _trainer_config(make_config, workdir):
    cfg = make_config(prior="ours", num_epochs=2, sg_pretraining=1,
                      use_mask_start=2, accurate_fit=2, n_MC_samples=4,
                      n_mixtures=3, num_hidden_units=64,
                      num_hidden_units_inner_VAE=16, n_layers_inner_VAE=2,
                      enable_plots=0, synthetic_n_train=128,
                      synthetic_n_test=64, batch_size=32, seed=7)
    cfg["result_dir"] = os.path.join(workdir, "result") + "/"
    cfg["checkpoint_dir"] = os.path.join(workdir, "ckpt") + "/"
    cfg["summary_dir"] = os.path.join(workdir, "summary") + "/"
    return cfg


def _run_two_process_trainer(tmp_path, cfg_extra=None):
    """Launch the TRAINER_WORKER twice under one jax.distributed cluster,
    assert the single-writer artifact discipline, and return the two
    processes' recorded curves."""
    from tests.conftest import make_config

    workdir = tmp_path / "shared"
    workdir.mkdir()
    cfg = _trainer_config(make_config, str(workdir))
    cfg.update(cfg_extra or {})
    (workdir / "cfg.json").write_text(json.dumps(cfg))
    script = tmp_path / "trainer_worker.py"
    script.write_text(TRAINER_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["LADDER_REPO"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i), str(workdir)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-4000:]}"
        assert f"proc{i}: trainer ok" in out, out[-2000:]

    # single-writer discipline: one line per epoch, not one per process
    scalars = (workdir / "summary" / "scalars.jsonl").read_text().splitlines()
    assert len(scalars) == 2, scalars
    # the accurate fit (epoch 2 == num_epochs) persisted once, cleanly
    gm_info = np.load(workdir / "result" / "GM_prior_info.npz")
    assert np.isfinite(gm_info["w_full"]).all()
    # no leftover tmp files from checkpoint write races
    assert not list((workdir / "ckpt").glob("*.tmp"))
    for name in ("vae-model.msgpack", "prior-model.msgpack",
                 "train-state.msgpack"):
        assert (workdir / "ckpt" / name).is_file(), name

    # both processes recorded identical curves (replicated metrics)
    c0 = np.load(workdir / "curves_0.npz")
    c1 = np.load(workdir / "curves_1.npz")
    np.testing.assert_allclose(c0["train_loss"], c1["train_loss"], rtol=1e-6)
    np.testing.assert_allclose(c0["sigma"], c1["sigma"], rtol=1e-6)
    return cfg, c0


def _single_process_curves(tmp_path, cfg_extra=None):
    """Run the identical global program single-process on this pytest
    process's 8-virtual-device mesh and return its metrics."""
    from tests.conftest import make_config
    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.parallel.mesh import make_mesh
    from ladder_tpu.training.trainer import MNISTTrainer
    from ladder_tpu.utils.config import create_dirs

    sdir = tmp_path / "single"
    sdir.mkdir()
    scfg = _trainer_config(make_config, str(sdir))
    scfg.update(cfg_extra or {})
    create_dirs([scfg["result_dir"], scfg["checkpoint_dir"]])
    cwd = os.getcwd()
    try:
        os.chdir(sdir)
        trainer = MNISTTrainer(make_model(scfg), DataGenerator(scfg), scfg,
                               mesh=make_mesh(scfg))
        trainer.train()
    finally:
        os.chdir(cwd)
    return trainer.metrics


def _assert_curves_match(c0, m):
    assert c0["train_loss"].shape == (2 * 128 // 32,)
    np.testing.assert_allclose(c0["train_loss"],
                               np.asarray(m.train_loss, np.float64),
                               rtol=2e-3)
    np.testing.assert_allclose(c0["sigma"],
                               np.asarray(m.sigma_train, np.float64),
                               rtol=2e-3)
    np.testing.assert_allclose(c0["val"],
                               np.asarray(m.val_loss_ave_epoch, np.float64),
                               rtol=2e-3)


def test_two_process_trainer_e2e(tmp_path):
    """VERDICT r3 item 2: the FULL JointTrainer under jax.distributed — two
    processes sharing one experiment directory train 2 epochs (sg phase +
    GM-fit phase). Every file artifact is written exactly once (process-0
    gating: no scalars.jsonl duplication, no checkpoint/tmp races), both
    processes agree on the curves, and the curves equal a single-process
    run of the identical global program.

    steps_per_call=2 (ADVICE r4): the MNIST trainer prefetches batches as
    global jax.Arrays, so K>1 drives _place_stack's array branch — eager
    jnp.stack of non-fully-addressable global arrays + the cross-process
    device_put reshard to the [K, B] scan layout — under a real 2-process
    cluster (trainer.py:157-165)."""
    extra = {"steps_per_call": 2}
    cfg, c0 = _run_two_process_trainer(tmp_path, extra)
    _assert_curves_match(c0, _single_process_curves(tmp_path, extra))


def test_two_process_tp_trainer_e2e(tmp_path):
    """Tensor parallelism ACROSS processes: the full trainer on a 2-process
    jax.distributed cluster with config['mesh_shape']=[4, 2] — params and
    Adam moments shard over the model axis while replicating over the
    cross-process data axis, so every checkpoint/GM/plot gather goes
    through the collective process_allgather path (utils/checkpoint.py
    _to_host). Curves must agree across processes and with the
    single-process run of the same 4x2 global program."""
    cfg, c0 = _run_two_process_trainer(tmp_path, {"mesh_shape": [4, 2]})
    _assert_curves_match(
        c0, _single_process_curves(tmp_path, {"mesh_shape": [4, 2]}))


def test_two_process_global_batch(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["LADDER_REPO"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i}: ok" in out, out
