"""SPMD data parallelism over a jax.sharding.Mesh.

The reference is single-process, single-device (train.py:2-3, SURVEY.md §2
component 31). The TPU-native scaling story is GSPMD: a 1-D device mesh
('data',), parameters and optimiser state replicated, the batch sharded on
its leading axis. The fused train step is an ordinary jitted global-batch
function — XLA partitions it and inserts the gradient all-reduce (psum over
ICI) automatically from the input shardings; no NCCL/MPI analogue, no
per-device code.

Batch-statistic subtleties (SURVEY.md §7 hard parts): all loss reductions —
including the sigma floor's mean-pixel-error — are written as global means,
so under sharding XLA emits the cross-replica reduction and the floor sees
the global batch error (the TF1 reference, being single-device, is the
degenerate case). The CelebA encoder's BatchNorm statistics are likewise
global-batch under GSPMD (XLA inserts the collective), matching the
reference's full-batch semantics; in shard_map contexts pass
CelebAEncoder(bn_axis_name=...) to psum them explicitly.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(config=None, devices=None, axis_name=None):
    """1-D data-parallel mesh over all (or the given) devices. The axis
    name comes from config['data_axis'] when a config is given, so the knob
    threads through consistently (shard_batch defaults to the mesh's own
    axis). A 2-element config['mesh_shape'] [n_data, n_model] builds the
    2-D (data, model) tensor-parallel mesh instead (parallel/tp.py)."""
    devices = devices if devices is not None else jax.devices()
    if config is not None:
        shape = config.get("mesh_shape")
        if shape and len(shape) == 2:
            from ladder_tpu.parallel.tp import MODEL_AXIS, make_mesh_2d
            return make_mesh_2d(
                int(shape[0]), int(shape[1]), devices=devices,
                axis_names=(axis_name or config.get("data_axis") or "data",
                            MODEL_AXIS))
        if shape and len(shape) > 2:
            raise ValueError(
                f"mesh_shape {list(shape)} has {len(shape)} axes; supported "
                "are [n_data] (data parallel) and [n_data, n_model] (tensor "
                "parallel) — a 3-D mesh would silently flatten to 1-D data "
                "parallelism, so fail loudly instead")
        if shape:
            n = int(np.prod(shape))
            devices = devices[:n]
        axis_name = axis_name or config.get("data_axis")
    return Mesh(np.asarray(devices), (axis_name or "data",))


def replicate(tree, mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_state(state, mesh):
    """Place the train state on the mesh. On a 1-D data mesh everything is
    replicated: params and Adam moments are identical on every device, and
    XLA keeps them in sync because the psum'd gradients are. On a 2-D
    (data, model) mesh, parameters and Adam moments shard over the model
    axis (parallel/tp.py — tensor-parallel compute + ZeRO-style sharded
    optimiser state); GSPMD inserts the implied collectives."""
    from ladder_tpu.parallel.tp import model_axis_size, shard_params_tp
    if model_axis_size(mesh) > 1:
        return shard_params_tp(state, mesh)
    return replicate(state, mesh)


def shard_batch(batch, mesh, axis_name=None):
    """Shard the batch's leading axis across the mesh (over the mesh's own
    axis by default, so a custom data_axis threads through automatically)."""
    sharding = NamedSharding(mesh, P(axis_name or mesh.axis_names[0]))
    return jax.device_put(batch, sharding)


def global_batch_from_local(local_batch, mesh, axis_name=None):
    """Multi-process input sharding: each process contributes its local
    slice of the global batch (jax.make_array_from_process_local_data —
    SURVEY.md §5 distributed-backend design). Single-process falls back to
    shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh, axis_name)
    sharding = NamedSharding(mesh, P(axis_name or mesh.axis_names[0]))
    return jax.make_array_from_process_local_data(sharding, local_batch)


def place_global_batch(batch, mesh, axis_name=None):
    """Place one logical GLOBAL batch on the mesh from any process count.

    Single-process: shard_batch. Multi-process (jax.distributed): every
    process constructs the same logical batch (the data pipelines are
    seed-deterministic), slices out its own contiguous row range, and the
    slices assemble into the distributed global array — each process only
    ever materialises 1/process_count of the batch on its devices."""
    n_proc = jax.process_count()
    if n_proc == 1:
        return shard_batch(batch, mesh, axis_name)
    batch = np.asarray(batch)
    if batch.shape[0] % n_proc:
        raise ValueError(
            f"global batch of {batch.shape[0]} rows does not divide across "
            f"{n_proc} processes — rows would silently drop and the "
            "assembled global shape would no longer match the compiled "
            "program's batch size; pick batch_size % process_count == 0")
    per = batch.shape[0] // n_proc
    i = jax.process_index()
    return global_batch_from_local(batch[i * per:(i + 1) * per], mesh,
                                   axis_name)


def place_global_stack(stack, mesh, axis_name=None):
    """place_global_batch for a [K, B, ...] multi-step stack: the batch
    axis (axis 1) shards over the mesh's data axis, the step axis is
    replicated (training/step.py make_train_multi_step's layout)."""
    sharding = NamedSharding(mesh, P(None, axis_name or mesh.axis_names[0]))
    n_proc = jax.process_count()
    if n_proc == 1:
        return jax.device_put(stack, sharding)
    stack = np.asarray(stack)
    if stack.shape[1] % n_proc:
        raise ValueError(
            f"stack batch axis of {stack.shape[1]} rows does not divide "
            f"across {n_proc} processes (see place_global_batch)")
    per = stack.shape[1] // n_proc
    i = jax.process_index()
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(stack[:, i * per:(i + 1) * per]))


def pad_to_multiple(batch, multiple):
    """Pad the leading axis up to a device-count multiple by tiling the
    batch, and return (padded, real_count) so callers can unweight. Handles
    batches smaller than the multiple (e.g. a final val batch of 5 on an
    8-device mesh)."""
    n = batch.shape[0]
    rem = n % multiple
    if rem == 0:
        return batch, n
    pad = multiple - rem
    tiles = [batch] + [batch[:min(n, pad - i * n)]
                       for i in range(-(-pad // n))]
    return np.concatenate(tiles, axis=0), n
