"""Debug: per-loss-term gradient parity, torch reference vs ffwm_tpu (flow model)."""
import importlib
import sys
import types
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import conftest  # noqa: F401  (forces CPU jax config)
import torch

from test_train_step_parity import (
    _install_torchvision_stub, _torch_block_extractor,
    _torch_local_attn_reshape, _flow_np_batch, _flow_torch_input, _nchw,
    _vgg_variables, B, FS,
)

if not hasattr(np, "int"):
    np.int = int
sys.path.append("/root/reference")
vgg_feats = _install_torchvision_stub()
external = importlib.import_module("models.external_function")
external.BlockExtractor.forward = (
    lambda self, source, flow: _torch_block_extractor(source, flow, self.kernel_size))
external.LocalAttnReshape.forward = (
    lambda self, inputs, kernel_size=3: _torch_local_attn_reshape(inputs, kernel_size))
ref_losses_mod = importlib.import_module("models.losses")


def _ld_forward(self, flows, lm_S, lm_F, gate):
    loss = 0
    for i, flow in enumerate(flows):
        scale = self.img_size // flow.size(3)
        loss = loss + self.weights[i] * self.criterionLD(
            flow, torch.div(lm_S, scale, rounding_mode="floor"),
            torch.div(lm_F, scale, rounding_mode="floor"), gate)
    return loss


ref_losses_mod.MultiScaleLDLoss.forward = _ld_forward
base_networks = importlib.import_module("models.base_networks")

import jax
import jax.numpy as jnp
import optax

from ffwm_tpu.engine.common import NetState, apply_mutable
from ffwm_tpu.losses import (correctness_loss, multi_affine_regularization_loss,
                             multiscale_landmark_loss)
from ffwm_tpu.models import FlowNet, VGG19Features
from ffwm_tpu.ops.warp import disable_mosaic_warp
from ffwm_tpu.utils.convert import convert_state_dict

torch.manual_seed(60)
tnet = base_networks.FlowNet(64)
sd = tnet.state_dict()
warp_net = base_networks.WarpNet()
cor = ref_losses_mod.PerceptualCorrectness()
reg = ref_losses_mod.MultiAffineRegularizationLoss(kz_dic={1: 7, 2: 5, 3: 3})
ld = ref_losses_mod.MultiScaleLDLoss()

batch = _flow_np_batch(201)
ti = _flow_torch_input(batch)
img_S, img_F = ti["img_S"], ti["img_F"]
lm_S, lm_F = ti["lm_S"], ti["lm_F"]
mask = ti["mask_F"]
gate = torch.cat((ti["gate"], ti["gate"]), 2)

model = FlowNet()
variables = convert_state_dict(sd, "flownet")
net = NetState.from_variables(variables)
vgg = VGG19Features(max_layer="relu3_1")
full = _vgg_variables(vgg_feats)
tmpl = vgg.init(jax.random.PRNGKey(1), jnp.zeros((1, FS, FS, 3)))
vgg_vars = {"params": {k: full["params"][k] for k in tmpl["params"]}}

jb = {
    "img_S": jnp.asarray(batch["img_S"]), "img_F": jnp.asarray(batch["img_F"]),
    "lm_S": jnp.asarray(batch["lm_S"]), "lm_F": jnp.asarray(batch["lm_F"]),
    "mask": jnp.asarray(batch["mask_F"]),
    "gate": jnp.asarray(np.concatenate([batch["gate"], batch["gate"]], 2).astype(np.float32)),
}

TERMS = ["cor", "reg", "lm"]


def jax_term_grads(term):
    def loss_fn(params):
        nn = NetState(params=params, extra=net.extra)
        (f128, f64, f32), _ = apply_mutable(model, nn, jb["img_S"], train=True)
        feats = lambda img: vgg.apply(vgg_vars, img)
        if term == "cor":
            return correctness_loss(feats, jb["img_F"], jb["img_S"],
                                    [f32, f64, f128], [2, 1, 0],
                                    norm_mask=jb["mask"]) * 20.0
        if term == "reg":
            return multi_affine_regularization_loss([f32, f64, f128]) * 0.01
        return multiscale_landmark_loss([f128, f64, f32], jb["lm_S"],
                                        jb["lm_F"], jb["gate"])

    with disable_mosaic_warp():
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(net.params)
    return float(loss), grads


def torch_term_loss(term):
    flow, flow64, flow32 = tnet(img_S)
    flows = [flow, flow64, flow32]
    if term == "cor":
        return cor(img_F, img_S, flows[::-1], [2, 1, 0], norm_mask=mask) * 20
    if term == "reg":
        return reg(flows[::-1]) * 0.01
    return ld(flows, lm_S, lm_F, gate)


for term in TERMS:
    tnet.zero_grad()
    tl = torch_term_loss(term)
    tl.backward()
    tgn = sum(float((p.grad.double() ** 2).sum()) for p in tnet.parameters()
              if p.grad is not None) ** 0.5
    jl, grads = jax_term_grads(term)
    jgn = float(optax.global_norm(grads))
    print(f"{term}: loss torch={float(tl):.6f} jax={jl:.6f} "
          f"| gradnorm torch={tgn:.4f} jax={jgn:.4f} rel={abs(jgn-tgn)/tgn:.2e}")
    # per-layer top mismatches
    tg = {n: p.grad.detach().numpy() for n, p in tnet.named_parameters()
          if p.grad is not None}
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    jn = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    tn_by_layer = {n: float(np.sqrt((g.astype(np.float64) ** 2).sum()))
                   for n, g in tg.items()}
    jn_by_layer = {n: float(np.sqrt((g.astype(np.float64) ** 2).sum()))
                   for n, g in jn.items()}
    # match by sorted norms (layouts differ); print top-8 torch layers with rel diff vs closest jax
    top = sorted(tn_by_layer.items(), key=lambda kv: -kv[1])[:6]
    jtop = sorted(jn_by_layer.items(), key=lambda kv: -kv[1])[:6]
    for (a, av), (b, bv) in zip(top, jtop):
        print(f"    torch {a:45s} {av:12.3f} | jax {b:60s} {bv:12.3f}")
