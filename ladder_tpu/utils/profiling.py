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
    """Two views of the training loop's speed:

    * per-dispatch times (start/stop around each step call) — with async
      dispatch these measure ENQUEUE latency, not device time, so they are
      reported as dispatch percentiles, useful for spotting host stalls;
    * epoch wall (wall_start before the loop, wall_stop after the final
      block_until_ready) — the honest throughput number, since the device
      runs the queued steps back-to-back behind the async dispatches.
    """

    def __init__(self, batch_size=None):
        self.batch_size = batch_size
        self.times = []
        self._t0 = None
        self.wall = None
        self._w0 = None

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

    def wall_start(self):
        self._w0 = time.perf_counter()

    def wall_stop(self):
        if self._w0 is not None:
            self.wall = time.perf_counter() - self._w0
        return self.wall

    def summary(self):
        if not self.times:
            return {}
        t = np.asarray(self.times[1:] or self.times)  # drop compile step
        out = dict(
            steps=len(self.times),
            dispatch_mean_ms=float(t.mean() * 1000),
            p50_ms=float(np.percentile(t, 50) * 1000),
            p99_ms=float(np.percentile(t, 99) * 1000),
        )
        if self.wall:
            out["wall_s"] = float(self.wall)
            out["step_ms"] = float(self.wall / len(self.times) * 1000)
            if self.batch_size:
                out["images_per_sec"] = float(
                    len(self.times) * self.batch_size / self.wall)
        elif self.batch_size:
            # synchronous timing: dispatch times ARE device times
            out["step_ms"] = out["dispatch_mean_ms"]
            out["images_per_sec"] = float(self.batch_size / t.mean())
        return out

    def report(self, prefix=""):
        s = self.summary()
        if s:
            if "step_ms" in s:
                msg = f"{prefix}step {s['step_ms']:.2f} ms"
                if "images_per_sec" in s:
                    msg += f", {s['images_per_sec']:.0f} images/sec"
                msg += (f" (dispatch p50 {s['p50_ms']:.2f}, "
                        f"p99 {s['p99_ms']:.2f} ms)")
            else:
                msg = (f"{prefix}dispatch {s['dispatch_mean_ms']:.2f} ms "
                       f"(p50 {s['p50_ms']:.2f}, p99 {s['p99_ms']:.2f})")
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
