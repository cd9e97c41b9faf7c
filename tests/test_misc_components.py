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


def test_blocks_norm_registry(rng):
    """norm='in' must actually select InstanceNorm2d (reference get_norm,
    base_networks.py:200-206) — it used to be silently ignored; unknown
    names raise like the reference."""
    from ffwm_tpu.nn.blocks import ConvBlock

    blk = ConvBlock(8, 16, 3, 1, 1, norm="in")
    x = jnp.asarray(rng.rand(2, 8, 8, 8), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x, True)
    # InstanceNorm2d is stat-free and affine-free: no batch_stats collection
    assert "batch_stats" not in variables
    y = blk.apply(variables, x, True)
    assert np.isfinite(np.asarray(y)).all()

    blk_bad = ConvBlock(8, 16, 3, 1, 1, norm="group")
    with pytest.raises(NotImplementedError, match="group"):
        blk_bad.init(jax.random.PRNGKey(0), x, True)


def test_convtranspose_init_uses_torch_fan():
    """torch computes ConvTranspose2d fan_in from the OUT channel (weight
    (I,O,kh,kw) -> O*kh*kw, torch nn.init._calculate_fan_in_and_fan_out);
    the reference's initialize_msra kaiming_normal_ therefore scales FlowNet
    deconvs by 1/sqrt(O*kh*kw), not 1/sqrt(I*kh*kw). Pin our from-scratch
    init std against torch's on an asymmetric (I=128, O=32) deconv."""
    import torch

    from ffwm_tpu.nn.layers import ConvTranspose2d, kaiming_normal_msra

    i, o, k = 128, 32, 4
    # torch oracle: kaiming_normal_ default (fan_in, relu gain)
    w = torch.empty(i, o, k, k)
    torch.nn.init.kaiming_normal_(w)
    torch_std = float(w.std())

    deconv = ConvTranspose2d(o, k, 2, 1, kernel_init=kaiming_normal_msra)
    v = deconv.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, i)))
    ours = float(np.asarray(v["params"]["kernel"]).std())
    assert ours == pytest.approx(torch_std, rel=0.05), (ours, torch_std)

    # default init: torch kaiming_uniform(a=sqrt(5)) with the same O-fan
    wu = torch.empty(i, o, k, k)
    torch.nn.init.kaiming_uniform_(wu, a=5 ** 0.5)
    deconv2 = ConvTranspose2d(o, k, 2, 1)
    v2 = deconv2.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, i)))
    ours2 = float(np.asarray(v2["params"]["kernel"]).std())
    assert ours2 == pytest.approx(float(wu.std()), rel=0.05), ours2


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


def test_checkpoint_num_classes(rng):
    """v2-style heads are bias-free (reference lightcnn/light_cnn.py:131-174)
    — the helper must fall back to the kernel's output dim instead of
    KeyError-ing (ADVICE r4), and must name the checkpoint when fc2 is
    missing entirely."""
    from ffwm_tpu.models.lightcnn import checkpoint_num_classes

    k = rng.rand(256, 79077).astype(np.float32)
    with_bias = {"params": {"fc2": {"kernel": k, "bias": np.zeros(79077)}}}
    assert checkpoint_num_classes(with_bias) == 79077
    bias_free = {"params": {"fc2": {"kernel": k}}}
    assert checkpoint_num_classes(bias_free) == 79077
    with pytest.raises(ValueError, match="my_ckpt.pth"):
        checkpoint_num_classes({"params": {"conv1": {}}}, what="my_ckpt.pth")
    # non-mapping checkpoints (torch.load of a raw tensor/list) must still
    # produce the diagnostic ValueError, not an AttributeError inside it
    with pytest.raises(ValueError, match="list"):
        checkpoint_num_classes([k], what="raw.pth")
    with pytest.raises(ValueError, match="raw2.pth"):
        checkpoint_num_classes({"params": {"fc2": k}}, what="raw2.pth")
