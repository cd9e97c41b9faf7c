"""Multi-host (multi-process) posture: make_host_array + collectives.

SURVEY.md §2.7 claims the DP design extends to multi-host slices via
``jax.distributed.initialize()`` + per-host shard assembly with
``make_host_array``. This test actually runs that path: two OS processes,
each owning half the global devices, assemble a globally-sharded batch from
process-local data and run a jitted global mean (lowering to a cross-process
all-reduce). CPU processes use jax's distributed service exactly like
multi-host TPU jobs do.

Heavy-ish (spawns 2 python processes); marked slow.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); coord = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ffwm_tpu.parallel import make_host_array, make_mesh

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes
mesh = make_mesh()

# each process contributes a distinct half of the global batch
local = np.full((2, 3), float(proc_id + 1), np.float32)
global_arr = make_host_array((4, 3), mesh, local)
assert global_arr.shape == (4, 3)

total = jax.jit(lambda x: x.sum())(global_arr)  # cross-process all-reduce
val = float(jax.device_get(total))
expected = (1.0 + 2.0) * 2 * 3
assert abs(val - expected) < 1e-6, (val, expected)
print(f"proc {proc_id} OK sum={val}")
"""


@pytest.mark.slow
def test_two_process_host_array_and_allreduce(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), coord],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              cwd=repo, env=env, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out
