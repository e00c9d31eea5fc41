"""Profiling utilities: timer statistics and trace context."""

import os

import jax.numpy as jnp

from ladder_tpu.utils.profiling import StepTimer, trace


def test_step_timer_summary():
    t = StepTimer(batch_size=32)
    import time
    for _ in range(5):
        t.start()
        time.sleep(0.002)
        t.stop(sync_on=jnp.ones(2))
    s = t.summary()
    assert s["steps"] == 5
    assert s["mean_ms"] >= 2.0
    assert s["images_per_sec"] > 0
    assert t.report("x: ")  # prints and returns the summary


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must not raise


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        _ = jnp.sum(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    found = []
    for root, _, files in os.walk(d):
        found += [f for f in files if f.endswith(".xplane.pb")]
    assert found, "no trace artifact written"
