"""End-to-end network parity vs the reference PyTorch implementation.

Loads /root/reference's network definitions read-only as a *test oracle*
(skipped when unavailable): random-initialized torch state_dicts are
converted with ffwm_tpu.utils.convert and both frameworks run the same
input; outputs must agree to fp32 tolerance. This is the strongest
checkpoint-convertibility check available without the released weights
(<1e-3 parity gate, BASELINE.md).
"""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = [
    pytest.mark.reference,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ffwm_tpu.models import (  # noqa: E402
    FFWM,
    FlowNet,
    LightCNN29,
    MSDiscriminator,
    VGG19Features,
)
from ffwm_tpu.utils.convert import (  # noqa: E402
    convert_state_dict,
    export_state_dict,
    validate_converted,
)


def _load_ref(path, name):
    if not hasattr(np, "int"):  # numpy 2.x shim for the 2020-era reference
        np.int = int  # type: ignore[attr-defined]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_nets():
    return _load_ref(f"{REF}/models/base_networks.py", "ref_base_networks")


@pytest.fixture(scope="module")
def ref_lcnn():
    return _load_ref(f"{REF}/lightcnn/light_cnn.py", "ref_light_cnn")


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2))))


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_flownet_parity(ref_nets, rng):
    torch.manual_seed(0)
    tnet = ref_nets.FlowNet(64).eval()
    variables = convert_state_dict(tnet.state_dict(), "flownet")

    net = FlowNet()
    x = rng.rand(1, 128, 128, 3).astype(np.float32)
    init_vars = net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    validate_converted(variables, init_vars, "flownet")

    f0, f1, f2 = net.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        t0, t1, t2 = tnet(_nchw(x))
    np.testing.assert_allclose(np.asarray(f0), _nhwc(t0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(f1), _nhwc(t1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(f2), _nhwc(t2), atol=2e-5)


def test_flownet_export_roundtrip(ref_nets):
    torch.manual_seed(1)
    tnet = ref_nets.FlowNet(64).eval()
    variables = convert_state_dict(tnet.state_dict(), "flownet")
    sd = export_state_dict(variables, "flownet")
    live = {k: v for k, v in tnet.state_dict().items()
            if "inter_conv_occ" not in k and "num_batches_tracked" not in k}
    assert set(live) <= set(sd)
    for k in live:
        np.testing.assert_allclose(sd[k], live[k].numpy(), atol=0, err_msg=k)

    # The dead occ branch is synthesized on export so the reference's
    # load_state_dict — strict by default (models/base_model.py:207-229) —
    # accepts a round-tripped checkpoint, and the loaded net matches the
    # original bit-for-bit on the live path.
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    occ_shapes = {k: tuple(v.shape) for k, v in tnet.state_dict().items()
                  if "inter_conv_occ" in k and "num_batches_tracked" not in k}
    for k, shape in occ_shapes.items():
        assert tuple(tsd[k].shape) == shape, k
    tnet2 = ref_nets.FlowNet(64)
    tnet2.load_state_dict(tsd)  # strict
    tnet2.eval()
    with torch.no_grad():
        x = torch.rand(2, 3, 128, 128)
        for ta, tb in zip(tnet(x), tnet2(x)):
            np.testing.assert_array_equal(ta.numpy(), tb.numpy())


def test_ffwm_parity(ref_nets, rng):
    torch.manual_seed(2)
    tnet = ref_nets.FFWM(sn=True).eval()
    variables = convert_state_dict(tnet.state_dict(), "ffwm")

    net = FFWM(sn=True)
    x = rng.rand(1, 128, 128, 3).astype(np.float32)
    flows = [
        (rng.rand(1, s, s, 2).astype(np.float32) * 2 - 1) for s in (32, 64, 128)
    ]
    init_vars = net.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         tuple(jnp.asarray(f) for f in flows), train=False)
    validate_converted(variables, init_vars, "ffwm")

    o32, o64, o128 = net.apply(variables, jnp.asarray(x),
                               tuple(jnp.asarray(f) for f in flows), train=False)
    with torch.no_grad():
        t32, t64, t128 = tnet(
            _nchw(x), flow=[_nchw(f) for f in flows])
    np.testing.assert_allclose(np.asarray(o32), _nhwc(t32), atol=5e-5)
    np.testing.assert_allclose(np.asarray(o64), _nhwc(t64), atol=5e-5)
    np.testing.assert_allclose(np.asarray(o128), _nhwc(t128), atol=5e-5)


def test_discriminator_parity(ref_nets, rng):
    torch.manual_seed(3)
    tnet = ref_nets.MSDiscriminator(128, sigmoid=False).eval()
    variables = convert_state_dict(tnet.state_dict(), "discriminator")

    net = MSDiscriminator(128, sigmoid=False)
    x = rng.rand(2, 128, 128, 3).astype(np.float32)
    init_vars = net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    validate_converted(variables, init_vars, "discriminator")

    out = net.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        tout = tnet(_nchw(x))
    # random-init SN+BN stacks produce |out| ~ 1e5; compare relatively
    np.testing.assert_allclose(np.asarray(out), _nhwc(tout), rtol=2e-3, atol=1e-3)


def test_lightcnn_parity(ref_lcnn, rng):
    torch.manual_seed(4)
    tnet = ref_lcnn.LightCNN_29Layers().eval()
    # torch 2.x ceil-mode MaxPool can return non-contiguous outputs, which
    # breaks the 2020-era `.view` in the reference forward — force contiguity
    tnet.pool4.register_forward_hook(lambda m, i, o: o.contiguous())
    variables = convert_state_dict(tnet.state_dict(), "lightcnn")

    net = LightCNN29()
    x = rng.rand(2, 128, 128, 1).astype(np.float32)
    init_vars = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    validate_converted(variables, init_vars, "lightcnn")

    logits, fc, pool = net.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        tlogits, tfc, tpool = tnet(_nchw(x))
    np.testing.assert_allclose(np.asarray(fc), tfc.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), tlogits.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pool), _nhwc(tpool), atol=2e-5)


def test_full_inference_parity(ref_nets, rng):
    """The BASELINE.md <1e-3 gate, end to end: flowNetF -> netG -> guided
    filter on the same input, reference torch vs converted ffwm_tpu
    (reference test_forward, models/ffwm_model.py:183-189)."""
    torch.manual_seed(7)
    t_flow = ref_nets.FlowNet(64).eval()
    t_gen = ref_nets.FFWM(sn=True)
    # a couple of train-mode forwards converge the spectral-norm power
    # iteration (fresh random u/v give degenerate sigmas -> NaN in both
    # frameworks; released checkpoints carry converged u/v)
    with torch.no_grad():
        for _ in range(8):
            t_gen(torch.rand(1, 3, 128, 128),
                  flow=[torch.rand(1, 2, s, s) * 2 - 1 for s in (32, 64, 128)])
    t_gen = t_gen.eval()
    ref_ext = _load_ref(f"{REF}/models/external_function.py", "ref_external")
    t_gf = ref_ext.GuidedFilter(32)

    from ffwm_tpu.engine import build_models, make_ffwm_inference

    models = build_models()
    flow_vars = convert_state_dict(t_flow.state_dict(), "flownet")
    gen_vars = convert_state_dict(t_gen.state_dict(), "ffwm")
    infer = make_ffwm_inference(models)

    img_s = rng.rand(1, 128, 128, 3).astype(np.float32)
    img_f = rng.rand(1, 128, 128, 3).astype(np.float32)
    out = infer(flow_vars, gen_vars, jnp.asarray(img_s), jnp.asarray(img_f))

    with torch.no_grad():
        f128, f64, f32 = t_flow(_nchw(img_s))
        _, _, fake128, att = t_gen(_nchw(img_s), flow=[f32, f64, f128],
                                   return_att=True)
        gf128 = t_gf(fake128, _nchw(img_f))

    fake_diff = np.abs(np.asarray(out["fake_F128"]) - _nhwc(fake128))
    gf_diff = np.abs(np.asarray(out["img_GF128"]) - _nhwc(gf128))
    assert fake_diff.mean() < 1e-3, fake_diff.mean()   # the parity gate
    assert fake_diff.max() < 1e-3, fake_diff.max()
    assert gf_diff.mean() < 1e-3, gf_diff.mean()
    att_ref = torch.mean(att[:, :64], dim=1, keepdim=True)
    np.testing.assert_allclose(np.asarray(out["att"]), _nhwc(att_ref), atol=1e-4)


def _torch_vgg19_features():
    """torchvision vgg19().features layout rebuilt from public torch.nn
    modules (torchvision itself is unavailable offline); the canonical VGG19
    'E' configuration: 2x64, 2x128, 4x256, 4x512, 4x512 convs with maxpools."""
    import torch.nn as tnn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.ReLU(inplace=False)]
            in_ch = v
    return tnn.Sequential(*layers)


def test_vgg19_parity(rng):
    torch.manual_seed(5)
    feats = _torch_vgg19_features().eval()
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    variables = convert_state_dict(sd, "vgg19")

    net = VGG19Features()
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    init_vars = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    validate_converted(variables, init_vars, "vgg19")

    ours = net.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        t = _nchw(x)
        taps = {}
        names = {1: "relu1_1", 3: "relu1_2", 6: "relu2_1", 8: "relu2_2",
                 11: "relu3_1", 13: "relu3_2", 15: "relu3_3", 17: "relu3_4",
                 20: "relu4_1", 22: "relu4_2", 24: "relu4_3", 26: "relu4_4",
                 29: "relu5_1", 31: "relu5_2", 33: "relu5_3", 35: "relu5_4"}
        for i, layer in enumerate(feats):
            t = layer(t)
            if i in names:
                taps[names[i]] = _nhwc(t)
    for name in ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"):
        np.testing.assert_allclose(np.asarray(ours[name]), taps[name],
                                   atol=1e-4, err_msg=name)
