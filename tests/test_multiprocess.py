"""Multi-process input sharding: drive global_batch_from_local's
process_count()>1 branch (jax.make_array_from_process_local_data) with a
real 2-process jax.distributed CPU cluster, each process contributing its
local slice of the global batch (SURVEY.md §5 distributed-backend design;
VERDICT r1 item 4)."""

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
