"""Registry, generic transforms, DeConvBlock, metrics, visualizer, flow viz."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_registry():
    from ffwm_tpu.engine.registry import create_model

    for name in ("ffwm", "flownet", "lightcnn"):
        entry = create_model(name)
        assert callable(entry.create_state)
    with pytest.raises(KeyError):
        create_model("nope")


def test_transforms(rng):
    from ffwm_tpu.data.transforms import get_params, get_transform

    img = rng.randint(0, 256, (300, 200, 3), np.uint8)
    params = get_params("resize_and_crop", 286, 256, img.shape[:2],
                        np.random.RandomState(0))
    t = get_transform("resize_and_crop", 286, 256, params)
    out = t(img)
    assert out.shape == (256, 256, 3)
    assert -1.0 <= out.min() and out.max() <= 1.0

    t2 = get_transform("none", normalize=False)
    out2 = t2(img)
    assert out2.shape[0] % 4 == 0 and out2.shape[1] % 4 == 0


def test_deconv_block(rng):
    from ffwm_tpu.nn.blocks import DeConvBlock

    blk = DeConvBlock(8, 16, 4, 2, 1, res=1)
    x = jnp.asarray(rng.rand(1, 8, 8, 8), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x, True)
    y, _ = blk.apply(variables, x, True, mutable=["batch_stats"])
    assert y.shape == (1, 16, 16, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_rank1_meter():
    from ffwm_tpu.utils.metrics import Rank1Meter

    meter = Rank1Meter()
    gallery = np.eye(4, 8, dtype=np.float32)  # 4 identities
    keys = ["001", "002", "003", "004"]
    feas = gallery[[0, 1, 2]] + 0.01  # close to their own gallery entries
    names = ["001_01_01_050_06.png", "002_01_01_050_06.png",
             "003_01_01_110_06.png"]
    meter.update(feas, names, gallery, keys)
    acc = meter.accuracy_by_angle()
    assert acc["15"] == 1.0 and acc["90"] == 1.0
    assert meter.overall() == 1.0
    s = str(meter)
    assert "15:" in s and "|" in s


def test_visualizer_and_flow_viz(tmp_path, rng):
    from ffwm_tpu.utils.visualizer import (
        HTMLIndex, Visualizer, tensor2att, tensor2flow, tensor2im, tensor2mask)

    vis = Visualizer("viz", str(tmp_path), phase="train")
    visuals = {
        "img": rng.rand(1, 16, 16, 3).astype(np.float32),
        "gray": rng.rand(1, 16, 16, 1).astype(np.float32),
    }
    vis.display_current_results(visuals, epoch=1)
    assert os.path.exists(tmp_path / "viz" / "web" / "index.html")
    assert os.path.exists(tmp_path / "viz" / "web" / "images" / "epoch001_img.png")
    msg = vis.print_current_losses(1, 10, {"loss_G": 1.2345}, 0.1, 0.05)
    assert "loss_G: 1.23" in msg

    flow = (rng.rand(1, 16, 16, 2).astype(np.float32) * 2) - 1
    assert tensor2flow(flow).shape == (16, 16, 3)
    att = rng.rand(1, 16, 16, 1).astype(np.float32)
    assert tensor2att(att).shape == (16, 16, 3)
    assert tensor2mask(visuals["gray"]).shape == (16, 16, 3)
    assert tensor2im(visuals["gray"]).dtype == np.uint8


def test_profiling_utils():
    from ffwm_tpu.utils.profiling import StepTimer, ThroughputMeter, device_trace

    t = StepTimer()
    t.data_done()
    t.step_done()
    assert t.t_data >= 0 and t.t_comp >= 0
    m = ThroughputMeter()
    assert m.update(10, 1.0) == 10.0
    with device_trace(None):
        pass
