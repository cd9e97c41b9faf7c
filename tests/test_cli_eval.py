"""End-to-end eval CLI (the reference's test_ffwm.py flow) on synthetic data.

This is SURVEY.md §7 step 3 — the "minimum end-to-end slice": checkpoint
loading, jitted flowF -> generator -> guided-filter inference, LightCNN
gallery features, rank-1 metric, image saving.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffwm_tpu.data.synthetic import make_synthetic_lfw, make_synthetic_multipie
from ffwm_tpu.engine import build_models, save_tree


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    dataroot = root / "dataset"
    ckpt = root / "checkpoints"
    make_synthetic_multipie(str(dataroot), n_ids=2, cameras=("051", "050"),
                            n_test_ids=2)
    make_synthetic_lfw(str(dataroot), n=2)

    models = build_models()
    s = 128
    x = jnp.zeros((1, s, s, 3), jnp.float32)
    flows0 = tuple(jnp.zeros((1, t, t, 2)) for t in (32, 64, 128))
    # jitted inits: one cacheable program per net instead of hundreds of
    # eagerly-dispatched op compiles (~70 s of this fixture's setup on CPU)
    flow_vars = jax.jit(lambda k: models.flownet.init(k, x, train=False))(
        jax.random.PRNGKey(0))
    gen_vars = jax.jit(lambda k: models.gen.init(k, x, flows0, train=False))(
        jax.random.PRNGKey(1))
    save_tree(str(ckpt), "ffwm", "latest_net_flowNetF", flow_vars)
    save_tree(str(ckpt), "ffwm", "latest_net_netG", gen_vars)
    return {"dataroot": str(dataroot), "ckpt": str(ckpt)}


def _run_cli(argv, monkeypatch):
    import test_ffwm

    monkeypatch.setattr(sys, "argv", ["test_ffwm.py"] + argv)
    test_ffwm.main()


@pytest.mark.heavy
def test_eval_multipie(env, monkeypatch, capsys):
    _run_cli([
        "--dataroot", env["dataroot"], "--name", "ffwm",
        "--checkpoints_dir", env["ckpt"], "--batch_size", "2",
        "--save_image",
    ], monkeypatch)
    out = capsys.readouterr().out
    assert "img/s" in out
    # rank-1 lines per camera + pose buckets
    assert "050:" in out
    test_dir = os.path.join(env["ckpt"], "ffwm", "test", "multipie")
    files = os.listdir(test_dir)
    assert any(f.endswith("_fake_F128.png") for f in files)
    assert any(f.endswith("_img_S.png") for f in files)


@pytest.mark.heavy
def test_eval_lfw(env, monkeypatch):
    _run_cli([
        "--dataroot", env["dataroot"], "--name", "ffwm",
        "--checkpoints_dir", env["ckpt"], "--batch_size", "2",
        "--datamode", "lfw", "--save_image",
    ], monkeypatch)
    test_dir = os.path.join(env["ckpt"], "ffwm", "test", "lfw")
    files = os.listdir(test_dir)
    assert any(f.startswith("person_") and f.endswith("_fake_F128.png")
               for f in files)
