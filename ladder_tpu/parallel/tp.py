"""Tensor/FSDP-style parameter sharding over a 2-D (data, model) mesh.

The reference is single-device (SURVEY.md §2 component 31), so every scaling
axis here is new design, not translation. Data parallelism (mesh.py) shards
the batch; this module adds the second mesh axis: parameters — and their
Adam moments — are sharded over the 'model' axis, GSPMD-style. For the
conv pyramids that dominate LaDDer's FLOPs the natural partition is the
output-channel dimension (each device owns a channel slice of every kernel,
producing a channel-sharded activation); for the dense dlatent/inner-VAE
stacks it is the output-feature dimension. XLA's SPMD partitioner inserts
the all-gathers / reduce-scatters implied by the annotations, and they ride
ICI — no hand-written collectives, no per-device code.

This doubles as sharded optimiser state (ZeRO-/FSDP-like memory scaling):
Adam's m/v leaves follow the same shape-based rule as their parameters, so
an n_model-way mesh holds 1/n_model of the moment bytes per device.

Placement is purely shape-driven (`leaf_spec`): shard the last divisible
axis (output channels/features for both conv HWIO and dense [in, out]
kernels), fall back to any divisible axis, replicate scalars and
indivisible leaves. Because params and Adam moments share shapes, the rule
gives them identical layouts without threading a sharding tree around.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh_2d(n_data=None, n_model=2, devices=None,
                 axis_names=(DATA_AXIS, MODEL_AXIS)):
    """A (data, model) mesh. n_data defaults to len(devices) // n_model."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, axis_names)


def model_axis_size(mesh, model_axis=MODEL_AXIS):
    """Size of the model axis, or 0 when the mesh has none (1-D data mesh)."""
    try:
        return mesh.shape[model_axis]
    except KeyError:
        return 0


def leaf_spec(shape, n_model, model_axis=MODEL_AXIS):
    """PartitionSpec for one array: shard the LAST axis divisible by n_model
    over the model axis (output channels for conv HWIO kernels, output
    features for dense [in, out] kernels, the channel axis for biases),
    otherwise replicate. Shape-only, so parameters and their Adam moments
    land on identical layouts.

    For conv-like leaves (ndim >= 3) only the trailing two (input/output
    channel) axes are candidates: a 3-wide spatial axis must never shard
    (e.g. n_model=3 with channel dims indivisible by 3 would otherwise
    pick it — a GSPMD-correct but pathological layout)."""
    if n_model <= 1 or not shape:
        return P()
    lo = max(len(shape) - 2, 0) if len(shape) >= 3 else 0
    for ax in range(len(shape) - 1, lo - 1, -1):
        if shape[ax] % n_model == 0 and shape[ax] >= n_model:
            spec = [None] * len(shape)
            spec[ax] = model_axis
            return P(*spec)
    return P()


def shard_params_tp(tree, mesh, model_axis=MODEL_AXIS):
    """Place a parameter-like pytree (params, Adam m/v, full train state)
    with each leaf sharded per leaf_spec over the mesh's model axis."""
    n_model = model_axis_size(mesh, model_axis)

    def place(x):
        x = np.asarray(x) if not hasattr(x, "shape") else x
        return jax.device_put(
            x, NamedSharding(mesh, leaf_spec(x.shape, n_model, model_axis)))

    return jax.tree.map(place, tree)
