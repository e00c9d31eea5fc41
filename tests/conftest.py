"""Test harness: force CPU with 8 virtual devices so sharding/mesh tests run
without TPU hardware (SURVEY.md §4 distributed-test strategy). Must run
before jax is imported anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly so the
# 8-virtual-device mesh is what tests see.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs skip recompiling the
# e2e train steps (the dominant cost of the suite).
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            "/tmp/ladder_tpu_jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---- pallas_parity guard (VERDICT r3 item 8) --------------------------
# The opt-in Pallas paths (use_pallas / fused_adam / fused_output_stage)
# are ~900 LoC of measured-negative, default-off code whose exact-parity
# tests are the only thing keeping them from rotting. Every test marked
# pallas_parity MUST execute: if any of them skips, the session fails.
_pallas_skips = []


def pytest_runtest_logreport(report):
    if report.skipped and "pallas_parity" in report.keywords:
        _pallas_skips.append(report.nodeid)


def pytest_sessionfinish(session, exitstatus):
    if _pallas_skips:
        print("\nERROR: pallas_parity tests may not skip (they guard the "
              "opt-in Pallas kernels against rot):")
        for nodeid in _pallas_skips:
            print(f"  SKIPPED {nodeid}")
        session.exitstatus = 1


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)


def make_config(**overrides):
    """A small mnist_digit 'ours' config for fast tests."""
    from ladder_tpu.utils.config import apply_defaults

    cfg = {
        "exp_name": "mnist_digit",
        "loss_function": "ELBO",
        "prior": "ours",
        "inner_activation": "leaky_relu",
        "n_mixtures": 5,
        "GM_fit_restart": 1,
        "n_MC_samples": 8,
        "load_model": 0,
        "load_dir": "default",
        "num_epochs": 2,
        "use_mask_start": 50,
        "sg_pretraining": 1,
        "num_iter_to_plot": 2,
        "accurate_fit": 10,
        "kernel_size": 3,
        "learning_rate_ae": 3e-4,
        "learning_rate_sigma": 5e-4,
        "learning_rate_prior": 3e-4,
        "learning_rate_inner_sigma": 2e-4,
        "batch_size": 64,
        "max_to_keep": 1,
        "dim_input_x": 28,
        "dim_input_y": 28,
        "dim_input_channel": 1,
        "code_size": 8,
        "representation_size": 2,
        "TRAIN_VAE": 1,
        "TRAIN_sigma": 1,
        "TRAIN_prior": 1,
        "TRAIN_inner_sigma": 1,
        "TRAIN_decoded_z_std": 0,
        "sigma": 0.5,
        "inner_sigma": 0.1,
        "inner_sigma_ub": 0.1,
        "inner_sigma_lb": 0.05,
        "latent_variance_precision": 1e-3,
        "num_hidden_units": 64,
        "num_hidden_units_inner_VAE": 32,
        "n_layers_inner_VAE": 2,
        "synthetic_data": 1,
        "synthetic_n_train": 512,
        "synthetic_n_test": 256,
    }
    cfg.update(overrides)
    return apply_defaults(cfg)


@pytest.fixture
def small_config():
    return make_config()


@pytest.fixture
def batch():
    rng_np = np.random.default_rng(0)
    return rng_np.uniform(0, 1, size=(64, 28, 28, 1)).astype(np.float32)
