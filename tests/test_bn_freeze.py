"""Frozen-BN serving: population-statistic estimation and the
per-row-deterministic CelebA inference mode (serving/bn_freeze.py).

Training always uses batch statistics (reference parity,
/root/reference/codes/models.py:471); these tests pin the serving opt-out:

* single-batch exactness: stats estimated from one batch reproduce the
  batch-stat forward on that batch (layer-by-layer induction)
* per-row determinism: a frozen encoding is identical no matter what else
  shares the batch — exactly what batch-stat BN violates
* npz round-trip, engine integration, and the guard rails
"""

import numpy as np
import pytest

import jax

from ladder_tpu.models.builder import make_model
from ladder_tpu.serving.bn_freeze import (
    estimate_bn_stats,
    load_bn_stats,
    save_bn_stats,
)
from tests.conftest import make_config


def _celeba_cfg(**overrides):
    # 128x128 is the encoder's minimum viable input (5 stride-2 convs then
    # a VALID 3x3); h=16 keeps the CPU compile fast (as test_serving does)
    cfg = make_config(
        exp_name="celeba", prior="standard_gaussian", dim_input_x=128,
        dim_input_y=128, dim_input_channel=3, num_hidden_units=16,
        code_size=8, batch_size=4, synthetic_n_train=16,
        synthetic_n_test=4, synthetic_n_val=4)
    cfg.update(overrides)
    return cfg


def _params_and_batch(cfg, n=4, seed=0):
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(seed)
    x = rng.random((n, cfg["dim_input_x"], cfg["dim_input_y"],
                    cfg["dim_input_channel"])).astype(np.float32)
    return model, params, x


def test_single_batch_estimate_reproduces_batch_forward():
    cfg = _celeba_cfg()
    model, params, x = _params_and_batch(cfg)
    mean_b, std_b = model.encode(params, x)

    stats = estimate_bn_stats(cfg, params, [x])
    assert sorted(stats) == [f"BatchNormTrain_{i}" for i in range(6)]

    frozen = make_model(dict(cfg, bn_mode="frozen"))
    frozen.set_bn_stats(stats)
    mean_f, std_f = frozen.encode(params, x)
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(std_f), np.asarray(std_b),
                               rtol=1e-4, atol=1e-4)


def test_frozen_is_per_row_deterministic_where_batch_bn_is_not():
    cfg = _celeba_cfg()
    model, params, x = _params_and_batch(cfg)
    stats = estimate_bn_stats(cfg, params, [x])

    frozen = make_model(dict(cfg, bn_mode="frozen"))
    frozen.set_bn_stats(stats)

    rng = np.random.default_rng(1)
    other = rng.random(x.shape).astype(np.float32)
    alone = np.asarray(frozen.encode(params, x[:1])[0])
    mixed = np.asarray(frozen.encode(
        params, np.concatenate([x[:1], other[1:]], axis=0))[0])[:1]
    np.testing.assert_allclose(alone, mixed, rtol=1e-5, atol=1e-5)

    # the batch-stat forward does NOT have this property (the quirk the
    # frozen mode exists to remove)
    alone_b = np.asarray(model.encode(params, x[:1])[0])
    mixed_b = np.asarray(model.encode(
        params, np.concatenate([x[:1], other[1:]], axis=0))[0])[:1]
    assert np.abs(alone_b - mixed_b).max() > 1e-4


def test_multi_batch_estimate_and_npz_roundtrip(tmp_path):
    cfg = _celeba_cfg()
    model, params, x = _params_and_batch(cfg, n=12)
    batches = [x[:4], x[4:8], x[8:]]
    stats = estimate_bn_stats(cfg, params, batches)

    path = str(tmp_path / "bn_stats.npz")
    save_bn_stats(path, stats)
    loaded = load_bn_stats(path)
    assert sorted(loaded) == sorted(stats)
    for name in stats:
        np.testing.assert_allclose(np.asarray(loaded[name]["mean"]),
                                   np.asarray(stats[name]["mean"]))
        np.testing.assert_allclose(np.asarray(loaded[name]["var"]),
                                   np.asarray(stats[name]["var"]))
    # first-layer stats are the exact pooled moments of the conv output
    # over all batches: estimating from the concatenation must agree
    pooled = estimate_bn_stats(cfg, params, [x])
    np.testing.assert_allclose(
        np.asarray(stats["BatchNormTrain_0"]["mean"]),
        np.asarray(pooled["BatchNormTrain_0"]["mean"]), rtol=1e-5,
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(stats["BatchNormTrain_0"]["var"]),
        np.asarray(pooled["BatchNormTrain_0"]["var"]), rtol=1e-5, atol=1e-6)


def test_engine_frozen_bn_bucket_invariance(tmp_path):
    """End-to-end: an engine with bn_stats_path gives the SAME encoding for
    a request regardless of which bucket/pad composition serves it."""
    import os

    from ladder_tpu.serving.engine import InferenceEngine
    from ladder_tpu.utils.checkpoint import CheckpointManager

    cfg = _celeba_cfg()
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt") + "/"
    os.makedirs(cfg["checkpoint_dir"], exist_ok=True)
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    CheckpointManager(cfg).save({"params": params}, model="VAE")

    rng = np.random.default_rng(2)
    x = rng.random((4, 128, 128, 3)).astype(np.float32)
    stats = estimate_bn_stats(cfg, params, [x])
    path = save_bn_stats(str(tmp_path / "bn_stats.npz"), stats)

    eng = InferenceEngine(cfg, serve_batch=4, buckets=(2,),
                          bn_stats_path=path)
    one = eng.encode(x[:1])[0]
    many = eng.encode(x)[0][:1]  # different bucket, different pad rows
    np.testing.assert_allclose(one, many, rtol=1e-5, atol=1e-5)


def test_guard_rails(tmp_path):
    cfg = _celeba_cfg()
    model, params, x = _params_and_batch(cfg)

    # frozen model without stats: actionable error
    frozen = make_model(dict(cfg, bn_mode="frozen"))
    with pytest.raises(ValueError, match="set_bn_stats"):
        frozen.encode(params, x)

    # estimation refuses BN-free families and empty streams
    mnist = make_config(prior="standard_gaussian")
    with pytest.raises(ValueError, match="CelebA"):
        estimate_bn_stats(mnist, params, [x])
    with pytest.raises(ValueError, match="at least one batch"):
        estimate_bn_stats(cfg, params, [])

    # engine rejects bn_stats for BN-free families
    from ladder_tpu.serving.engine import InferenceEngine
    stats = estimate_bn_stats(cfg, params, [x])
    path = save_bn_stats(str(tmp_path / "s.npz"), stats)
    with pytest.raises(ValueError, match="CelebA"):
        InferenceEngine(mnist, bn_stats_path=path,
                        allow_uninitialized=True)


def test_export_with_frozen_bn(tmp_path):
    """jax.export bakes the frozen statistics into the artifact: the
    exported encode path reproduces the frozen engine (and is therefore
    per-row-deterministic) without any side files."""
    import os

    from ladder_tpu.serving import export_inference, load_exported
    from ladder_tpu.serving.engine import InferenceEngine
    from ladder_tpu.utils.checkpoint import CheckpointManager

    cfg = _celeba_cfg()
    cfg["checkpoint_dir"] = str(tmp_path / "ckpt") + "/"
    os.makedirs(cfg["checkpoint_dir"], exist_ok=True)
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    CheckpointManager(cfg).save({"params": params}, model="VAE")

    rng = np.random.default_rng(3)
    x = rng.random((4, 128, 128, 3)).astype(np.float32)
    stats = estimate_bn_stats(cfg, params, [x])
    path = save_bn_stats(str(tmp_path / "bn_stats.npz"), stats)

    eng = InferenceEngine(cfg, serve_batch=4, buckets=(),
                          bn_stats_path=path)
    written = export_inference(eng, str(tmp_path / "exp"),
                               names=("encode",))
    mean_direct = eng.encode(x)[0]
    mean_exported = np.asarray(load_exported(written["encode"])(x)[0])
    np.testing.assert_allclose(mean_exported, mean_direct, rtol=1e-5,
                               atol=1e-5)
