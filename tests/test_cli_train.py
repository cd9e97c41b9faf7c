"""Train-CLI smoke tests on synthetic data (tiny configs, 64px).

Covers the epoch loop, lr scheduling, checkpoint saving (orbax + .pth
export) and the batch adapters — the glue the unit tests don't touch.
"""

import os
import sys

import numpy as np
import pytest

from ffwm_tpu.data.synthetic import make_synthetic_multipie


@pytest.fixture(scope="module")
def dataroot(tmp_path_factory):
    root = tmp_path_factory.mktemp("traindata")
    # enough profiles for one full batch of 8 on the 8-device test mesh
    # (batch_size must be a multiple of the mesh: check_batch_divisible)
    make_synthetic_multipie(str(root), n_ids=4, cameras=("051", "050", "090"),
                            size=64)
    return str(root)


def test_train_flow_cli(dataroot, tmp_path, monkeypatch):
    import train_flow

    ckpt = str(tmp_path / "ckpt")
    monkeypatch.setattr(sys, "argv", [
        "train_flow.py", "--dataroot", dataroot, "--name", "flowsmoke",
        "--checkpoints_dir", ckpt, "--batch_size", "8", "--load_size", "64",
        "--niter", "1", "--niter_decay", "0", "--save_epoch_freq", "1",
        "--print_freq", "8", "--max_dataset_size", "8", "--aug",
    ])
    train_flow.main()
    base = os.path.join(ckpt, "flowsmoke")
    assert os.path.isdir(os.path.join(base, "latest_net_flowNet.ckpt"))
    assert os.path.isdir(os.path.join(base, "1_state.ckpt"))
    assert os.path.exists(os.path.join(base, "1_net_flowNet.pth"))
    assert os.path.exists(os.path.join(base, "train_opt.txt"))

    # resume path: --continue_train restores the saved state
    monkeypatch.setattr(sys, "argv", [
        "train_flow.py", "--dataroot", dataroot, "--name", "flowsmoke",
        "--checkpoints_dir", ckpt, "--batch_size", "8", "--load_size", "64",
        "--niter", "1", "--niter_decay", "0", "--max_dataset_size", "8",
        "--continue_train", "--epoch", "latest",
    ])
    train_flow.main()


def test_exported_pth_reloads(dataroot, tmp_path, monkeypatch):
    """The .pth written by the trainer round-trips through the converter."""
    import jax

    from ffwm_tpu.engine import create_flow_train_state
    from ffwm_tpu.engine.checkpoint import save_pth
    from ffwm_tpu.utils.convert import load_pth

    _, state, _ = create_flow_train_state(jax.random.PRNGKey(0), image_size=64)
    path = str(tmp_path / "net.pth")
    save_pth(state.net.variables, "flownet", path)
    loaded = load_pth(path, "flownet", state.net.variables)
    a = jax.tree.leaves(loaded["params"])
    b = jax.tree.leaves(jax.tree.map(np.asarray, state.net.variables["params"]))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
