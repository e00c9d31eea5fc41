"""Population BN statistics for per-row-deterministic CelebA serving.

The reference's CelebA encoder always normalises with BATCH statistics
(`training=True` is a graph constant, /root/reference/codes/models.py:471),
and its checkpoints carry no moving averages (the Savers save trainables
only, base.py:37-48) — so a served encoding depends on everything else in
the compiled batch, including pad rows. Training keeps that behaviour for
parity; serving can opt out:

  1. estimate_bn_stats(): one pass over training batches with the normal
     batch-stat forward, capturing each BN layer's INPUT (its preceding
     conv's output) and accumulating exact per-channel population
     mean/variance — "precise BN" recalibration. Because the forward is
     the batch-stat one, layer k's captured inputs are exactly what layer
     k saw during training.
  2. bn_mode='frozen' + LadderModel.set_bn_stats(): every BatchNormTrain
     normalises with those fixed statistics, so each output row depends
     only on its own input row (models/layers.py).

Exactness property (tested): if the statistics are estimated from a single
batch, the frozen forward reproduces the batch-stat forward on that batch
bit-for-bit-close — layer 1's population stats ARE its batch stats, making
its outputs identical, hence layer 2's inputs identical, and so on.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp


def _norm(x):
    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) * (1.0 / 255.0)
    return x


def estimate_bn_stats(config, params, batches):
    """One recalibration pass: {'BatchNormTrain_i': {'mean','var'}} per
    encoder BN layer, from per-channel sums over every batch in `batches`
    (uint8 or [0,1] float images; typically one training epoch, or fewer —
    a handful of batches is usually enough to stabilise 512 channels)."""
    from ladder_tpu.models.builder import make_model

    cfg = dict(config)
    cfg["bn_mode"] = "batch"  # the capture pass must see training behaviour
    model = make_model(cfg)
    if cfg.get("exp_name") != "celeba":
        raise ValueError("BN freezing applies to the CelebA encoder only "
                         f"(exp_name={cfg.get('exp_name')!r} has no BN)")

    acc = {}  # name -> [count, sum, sumsq]
    n_batches = 0
    for batch in batches:
        _, inter = model.encoder.apply(
            {"params": params["encoder"]}, _norm(batch),
            capture_intermediates=lambda mdl, _:
                (mdl.name or "").startswith("Conv_"),
            mutable=["intermediates"])
        n_batches += 1
        for conv_name, sub in inter["intermediates"].items():
            out = np.asarray(sub["__call__"][0], np.float64)
            bn_name = "BatchNormTrain_" + conv_name[len("Conv_"):]
            flat = out.reshape(-1, out.shape[-1])
            entry = acc.setdefault(
                bn_name, [0, np.zeros(out.shape[-1]), np.zeros(out.shape[-1])])
            entry[0] += flat.shape[0]
            entry[1] += flat.sum(axis=0)
            entry[2] += (flat * flat).sum(axis=0)
    if not n_batches:
        raise ValueError("estimate_bn_stats needs at least one batch")

    stats = {}
    for name, (count, s, ss) in acc.items():
        mean = s / count
        var = np.maximum(ss / count - mean * mean, 0.0)  # population (biased)
        stats[name] = {"mean": jnp.asarray(mean, jnp.float32),
                       "var": jnp.asarray(var, jnp.float32)}
    return stats


def save_bn_stats(path, stats):
    """Flat npz: 'BatchNormTrain_i/mean', 'BatchNormTrain_i/var'."""
    flat = {}
    for name, mv in stats.items():
        flat[f"{name}/mean"] = np.asarray(mv["mean"])
        flat[f"{name}/var"] = np.asarray(mv["var"])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)
    return path


def load_bn_stats(path):
    z = np.load(path)
    stats = {}
    for key in z.files:
        name, leaf = key.rsplit("/", 1)
        stats.setdefault(name, {})[leaf] = jnp.asarray(z[key], jnp.float32)
    for name, mv in stats.items():
        if set(mv) != {"mean", "var"}:
            raise ValueError(f"malformed bn_stats file {path}: {name} has "
                             f"{sorted(mv)}")
    return stats
