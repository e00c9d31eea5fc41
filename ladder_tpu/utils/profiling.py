"""Tracing and per-step timing.

The reference's only instrumentation is wall-clock epoch timing
(/root/reference/codes/base.py:572-581). The TPU build adds:

  * StepTimer — per-step device-synchronised timings with percentile
    summaries (throughput in images/sec falls out of batch size)
  * trace(...) — context manager around jax.profiler for XLA-level traces
    viewable in XProf/TensorBoard; config key 'profile_dir' arms it for the
    first epoch of training.

Timing a jitted step correctly requires a device sync; StepTimer.stop blocks
on the given array, so call it with something small (a scalar metric).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax


class StepTimer:
    def __init__(self, batch_size=None):
        self.batch_size = batch_size
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None, n_steps=1):
        """n_steps>1: the timed dispatch covered several fused steps (the
        multi-step scan); record the per-step average for each."""
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        self.times.extend([dt / n_steps] * n_steps)
        return dt

    def summary(self):
        if not self.times:
            return {}
        t = np.asarray(self.times[1:] or self.times)  # drop compile step
        out = dict(
            steps=len(self.times),
            mean_ms=float(t.mean() * 1000),
            p50_ms=float(np.percentile(t, 50) * 1000),
            p99_ms=float(np.percentile(t, 99) * 1000),
        )
        if self.batch_size:
            out["images_per_sec"] = float(self.batch_size / t.mean())
        return out

    def report(self, prefix=""):
        s = self.summary()
        if s:
            msg = (f"{prefix}step {s['mean_ms']:.2f} ms "
                   f"(p50 {s['p50_ms']:.2f}, p99 {s['p99_ms']:.2f})")
            if "images_per_sec" in s:
                msg += f", {s['images_per_sec']:.0f} images/sec"
            print(msg)
        return s


@contextlib.contextmanager
def trace(profile_dir=None):
    """XLA-level profiler trace; no-op when profile_dir is falsy."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {profile_dir}")
