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

from ffwm_tpu.data.synthetic import make_synthetic_multipie


@pytest.fixture(scope="module")
def dataroot(tmp_path_factory):
    root = tmp_path_factory.mktemp("mhdata")
    # 16 items/epoch after the mirror-double; 8 per host at global b=8
    make_synthetic_multipie(str(root), n_ids=4, cameras=("051", "050", "090"),
                            size=64)
    return str(root)


WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); coord = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
import numpy as np
# repo imports resolve via PYTHONPATH (the launcher sets it; this script
# is written to a tmp dir, so __file__-relative paths would be junk)
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


TRAIN_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); coord = sys.argv[2]
dataroot = sys.argv[3]; ckpt = sys.argv[4]; cache = sys.argv[5]
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4"
    # single-core box: the peer may be tracing/compiling for minutes --
    # don't let a stuck collective terminate before it arrives
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
# repo imports resolve via PYTHONPATH (the launcher sets it; this script
# is written to a tmp dir, so __file__-relative paths would be junk)
# Establish the cross-process gloo communicator NOW, while both processes
# are still in sync (just past import): the communicator rendezvous has a
# hard 30s key-value timeout that single-core compile/trace skew would
# blow. It is cached per global-device set, so it must be created with the
# SAME 8-device data mesh the train step uses (a sync_global_devices
# barrier builds a different communicator and does not help -- measured).
import numpy as np
from ffwm_tpu.parallel import make_host_array, make_mesh
_mesh = make_mesh()
_warm = make_host_array((8, 1), _mesh, np.ones((4, 1), np.float32))
_s = float(jax.device_get(jax.jit(lambda x: x.sum())(_warm)))
assert _s == 8.0, _s
print(f"proc {proc_id} gloo communicator warm")
import train_flow
sys.argv = ["train_flow.py", "--dataroot", dataroot, "--name", "mh",
            "--checkpoints_dir", ckpt, "--batch_size", "8",
            "--load_size", "64", "--niter", "1", "--niter_decay", "0",
            "--max_dataset_size", "16", "--seed", "0", "--print_freq", "8"]
train_flow.main()
print(f"proc {proc_id} TRAIN OK")
"""


FFWM_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); coord = sys.argv[2]
dataroot = sys.argv[3]; ckpt = sys.argv[4]; cache = sys.argv[5]; pre = sys.argv[6]
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    " --xla_cpu_collective_call_terminate_timeout_seconds=3000")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
# warm the cross-process gloo communicator on the SAME 8-device mesh the
# train step will use (see TRAIN_WORKER for the measured rationale)
import numpy as np
from ffwm_tpu.parallel import make_host_array, make_mesh
_mesh = make_mesh()
_warm = make_host_array((8, 1), _mesh, np.ones((4, 1), np.float32))
assert float(jax.device_get(jax.jit(lambda x: x.sum())(_warm))) == 8.0
print(f"proc {proc_id} gloo communicator warm")
import train_ffwm
args = ["train_ffwm.py", "--dataroot", dataroot, "--name", "mhffwm",
        "--checkpoints_dir", ckpt, "--batch_size", "8",
        "--load_size", "64", "--niter", "1", "--niter_decay", "0",
        "--save_epoch_freq", "1", "--max_dataset_size", "8",
        "--seed", "0", "--print_freq", "8",
        "--flownetf", os.path.join(pre, "flownetf", "4_net_flowNet"),
        "--flownetb", os.path.join(pre, "flownetb.pth")]
sys.argv = list(args)
train_ffwm.main()
print(f"proc {proc_id} TRAIN OK")
# resume across BOTH processes: full-state restore (titers preserved) from
# the collectively-written orbax checkpoint
sys.argv = list(args) + ["--continue_train", "--epoch", "latest"]
train_ffwm.main()
print(f"proc {proc_id} RESUME OK")
"""


@pytest.mark.slow
def test_two_process_ffwm_training_cli(tmp_path, dataroot):
    """The flagship GAN trainer end-to-end across two OS processes
    (VERDICT r3 #2): 4 nets + frozen extractors replicated across
    processes, pretrained flownet loading on every host, gradient
    all-reduce of the D-then-G step, orbax full-state save as a
    cross-process collective, chief-gated logs/.pth, and a
    --continue_train resume executed by both processes."""
    import jax

    from ffwm_tpu.engine import create_flow_train_state, save_pth, save_tree

    pre = str(tmp_path / "pretrained")
    _, fstate, _ = create_flow_train_state(jax.random.PRNGKey(3), image_size=64)
    host_vars = jax.device_get(fstate.net.variables)
    save_tree(pre, "flownetf", "4_net_flowNet", host_vars)
    save_pth(host_vars, "flownet", os.path.join(pre, "flownetb.pth"))

    worker = tmp_path / "ffwm_worker.py"
    worker.write_text(FFWM_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from ffwm_tpu.hostcache import host_fingerprint

    cache = os.path.join(repo, ".jax_cache", "host-" + host_fingerprint())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo
    ckpt = str(tmp_path / "ck")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), coord, dataroot, ckpt, cache, pre],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=repo, env=env, text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=3300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i} TRAIN OK" in out, out[-2000:]
        assert f"proc {i} RESUME OK" in out, out[-2000:]
        assert f"multi-host: 2 processes, rank {i}, 4 images/host" in out
        # pretrained flownets loaded on every host (orbax AND .pth branches)
        assert "loading flowNetF from" in out
        assert "loading flowNetB from" in out
        # the resume restored the collectively-saved full state on BOTH
        # hosts, preserving the warm-up counter (1 epoch x global batch 8)
        assert "resumed full train state from latest_state (titers=8)" in out
    # chief-gated epoch log and loss log
    assert "End of epoch" in outs[0]
    assert "End of epoch" not in outs[1]
    base = os.path.join(ckpt, "mhffwm")
    assert os.path.exists(os.path.join(base, "train_loss_log.txt"))
    # collective orbax saves: 4 per-net trees + full state + epoch state
    for tag in ("netG", "netD", "flowNetF", "flowNetB"):
        assert os.path.isdir(os.path.join(base, f"latest_net_{tag}.ckpt")), tag
    assert os.path.isdir(os.path.join(base, "latest_state.ckpt"))
    assert os.path.isdir(os.path.join(base, "1_state.ckpt"))
    # chief-only .pth exports
    assert os.path.exists(os.path.join(base, "1_net_netG.pth"))
    assert os.path.exists(os.path.join(base, "1_net_flowNetF.pth"))


FINETUNE_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); coord = sys.argv[2]
dataroot = sys.argv[3]; save = sys.argv[4]; cache = sys.argv[5]
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
# warm the cross-process gloo communicator on the SAME 8-device mesh the
# train step will use (see TRAIN_WORKER for the measured rationale)
import numpy as np
from ffwm_tpu.parallel import make_host_array, make_mesh
_mesh = make_mesh()
_warm = make_host_array((8, 1), _mesh, np.ones((4, 1), np.float32))
assert float(jax.device_get(jax.jit(lambda x: x.sum())(_warm))) == 8.0
print(f"proc {proc_id} gloo communicator warm")
import finetune_lightcnn
sys.argv = ["finetune_lightcnn.py", "--dataroot", dataroot,
            "--save_path", save, "--batch-size", "8", "--epochs", "1",
            "--num_classes", "8", "--load_size", "64", "--print-freq", "8",
            "--seed", "0"]
finetune_lightcnn.main()
print(f"proc {proc_id} FINETUNE OK")
"""


@pytest.mark.slow
def test_two_process_finetune_lightcnn_cli(tmp_path, dataroot):
    """finetune_lightcnn.py across two OS processes (VERDICT r3 #6): the
    train epoch is process-sharded and globally batched like the main
    trainers; validation runs host-locally on every process with chief-only
    printing; orbax saves are cross-process collectives, .pth chief-only."""
    worker = tmp_path / "finetune_worker.py"
    worker.write_text(FINETUNE_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from ffwm_tpu.hostcache import host_fingerprint

    cache = os.path.join(repo, ".jax_cache", "host-" + host_fingerprint())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo
    save = str(tmp_path / "lcnn_mh")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), coord, dataroot, save, cache],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=repo, env=env, text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i} FINETUNE OK" in out, out[-2000:]
    assert "multi-host: 2 processes, 4 images/host" in outs[0]
    # chief-only validation printout (per-camera rank-1 lines)
    assert "090: [" in outs[0]
    assert "090: [" not in outs[1]
    # collective orbax saves landed; .pth exported once by the chief
    assert os.path.isdir(os.path.join(save, "lightCNN_1_checkpoint.ckpt"))
    assert os.path.exists(os.path.join(save, "lightCNN_1_checkpoint.pth"))


@pytest.mark.slow
def test_two_process_flow_training_cli(tmp_path, dataroot):
    """The REAL multi-host path end-to-end: train_flow.py in two OS
    processes (4 virtual CPU devices each -> one 8-device global mesh),
    global batch 8 = 4 images/host from disjoint epoch slices, gradient
    all-reduce across processes, chief-only checkpointing. This is the
    production pattern for TPU pods (--multihost; here the workers call
    jax.distributed.initialize with an explicit coordinator because there
    is no pod metadata service on CPU)."""
    worker = tmp_path / "train_worker.py"
    worker.write_text(TRAIN_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from ffwm_tpu.hostcache import host_fingerprint  # same host-scoped cache

    cache = os.path.join(repo, ".jax_cache", "host-" + host_fingerprint())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo
    ckpt = str(tmp_path / "ck")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), coord, dataroot, ckpt, cache],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=repo, env=env, text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i} TRAIN OK" in out, out[-2000:]
        assert "multi-host: 2 processes" in out, out[-2000:]
    # chief-only checkpointing: the loss log and checkpoints exist once
    assert os.path.isdir(os.path.join(ckpt, "mh", "latest_net_flowNet.ckpt"))
    assert os.path.isdir(os.path.join(ckpt, "mh", "latest_state.ckpt"))
    # rank-1 printed per-epoch summary only on the chief
    assert "End of epoch" in outs[0]
    assert "End of epoch" not in outs[1]
