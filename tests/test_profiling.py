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
    assert s["dispatch_mean_ms"] >= 2.0
    assert s["step_ms"] >= 2.0  # sync timing: dispatch IS device time
    assert s["images_per_sec"] > 0
    assert t.report("x: ")  # prints and returns the summary


def test_step_timer_wall_throughput():
    """Async dispatch: wall-based throughput, not enqueue rate."""
    t = StepTimer(batch_size=10)
    import time
    t.wall_start()
    for _ in range(4):
        t.start()
        t.stop()          # no sync: dispatch times are ~0
    time.sleep(0.04)      # the "device" draining the queue
    t.wall_stop()
    s = t.summary()
    assert s["wall_s"] >= 0.04
    # 40 images over >=40 ms -> <= 1000 img/s; enqueue rate would be huge
    assert s["images_per_sec"] <= 1000.0
    assert s["step_ms"] >= 10.0


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
