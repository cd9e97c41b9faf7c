"""PyTorch <-> JAX checkpoint conversion.

Loads the reference's released ``.pth`` state_dicts (README.md:62-67:
``latest_net_{netG,flowNetF,flowNetB,netD}.pth``, ``{n}_net_flowNet.pth``,
``lightCNN_10_checkpoint.pth``, torchvision ``vgg19``) into this framework's
flax variable trees, and exports back.

Layout rules:
  * Conv2d weight  (O, I, kh, kw)  -> kernel (kh, kw, I, O)
  * ConvTranspose2d weight (I, O, kh, kw) -> forward-equivalent kernel:
    spatial flip + transpose -> (kh, kw, I, O)  (see nn.layers.ConvTranspose2d)
  * Linear weight  (out, in)       -> kernel (in, out)
  * BatchNorm weight/bias/running_mean/running_var
        -> params scale/bias + batch_stats mean/var
  * spectral_norm weight_orig/weight_u/weight_v
        -> params kernel + spectral sn/{u,v}
  * FlowNet's dead occlusion branch (inter_conv_occ*, never called by the
    reference forward — models/base_networks.py:92-97) is skipped on import
    and synthesized (zero conv / unit BN) on export so the reference's
    strict ``load_state_dict`` accepts round-tripped files.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor / array -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _convT_kernel(w: np.ndarray) -> np.ndarray:
    # (I, O, kh, kw) -> flip spatial -> (kh, kw, I, O)
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


_FLOWNET_CONVT = re.compile(r"^(deconv\d|upsampled_flow\d_to_\d)$")


def _is_transposed_conv(kind: str, path: Tuple[str, ...]) -> bool:
    return kind == "flownet" and bool(_FLOWNET_CONVT.match(path[0]))


def convert_state_dict(
    state_dict: Mapping[str, Any], kind: str
) -> Dict[str, Dict]:
    """Convert a torch state_dict to flax variables.

    kind: 'flownet' | 'ffwm' | 'discriminator' | 'lightcnn' | 'vgg19'.
    Returns {'params': ..., 'batch_stats': ..., 'spectral': ...} with empty
    collections removed.
    """
    params: Dict = {}
    batch_stats: Dict = {}
    spectral: Dict = {}

    for key, value in state_dict.items():
        v = _np(value)
        parts = key.split(".")

        if kind == "discriminator" and parts[0] == "nets":
            # torch ModuleList path 'nets.{i}' is a single flax child name
            parts = [f"nets.{parts[1]}"] + parts[2:]

        if kind == "vgg19":
            # torchvision keys: features.{idx}.weight/bias
            if parts[0] == "features":
                parts = parts[1:]
            elif parts[0] == "classifier":
                continue  # perceptual losses never use the classifier head

        if kind == "flownet" and parts[0].startswith("inter_conv_occ"):
            continue  # dead occlusion branch
        if parts[-1] == "num_batches_tracked":
            continue

        leaf = parts[-1]
        path = tuple(parts[:-1])
        # The bare ConvTranspose2d flow upsamplers gain a 'conv' level here.
        if kind == "flownet" and path and path[0].startswith("upsampled_flow"):
            path = path + ("conv",)

        if leaf == "weight":
            if v.ndim == 4:
                k = _convT_kernel(v) if _is_transposed_conv(kind, path) else _conv_kernel(v)
                _set(params, path + ("kernel",), k)
            elif v.ndim == 2:
                _set(params, path + ("kernel",), _linear_kernel(v))
            elif v.ndim == 1:  # BatchNorm affine
                _set(params, path + ("scale",), v)
            else:
                raise ValueError(f"unhandled weight ndim for {key}: {v.shape}")
        elif leaf == "bias":
            _set(params, path + ("bias",), v)
        elif leaf == "running_mean":
            _set(batch_stats, path + ("mean",), v)
        elif leaf == "running_var":
            _set(batch_stats, path + ("var",), v)
        elif leaf == "weight_orig":
            if v.ndim == 4:
                _set(params, path + ("kernel",), _conv_kernel(v))
            else:
                _set(params, path + ("kernel",), _linear_kernel(v))
        elif leaf == "weight_u":
            _set(spectral, path + ("sn", "u"), v)
        elif leaf == "weight_v":
            _set(spectral, path + ("sn", "v"), v)
        else:
            raise ValueError(f"unhandled state_dict key: {key}")

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    if spectral:
        out["spectral"] = spectral
    return out


def export_state_dict(variables: Mapping[str, Any], kind: str) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_state_dict` (for saving .pth-compatible
    checkpoints).

    FlowNet exports synthesize the dead occlusion branch
    (``inter_conv_occ*``, reference models/base_networks.py:92-97): the
    reference's ``load_state_dict`` is strict by default
    (models/base_model.py:207-229) and its real checkpoints carry those
    never-used tensors, so a round-trippable export must too. They get
    identity-ish defaults (zero conv, unit BN) — the reference forward never
    touches them."""
    out: Dict[str, np.ndarray] = {}
    sn_mods = _spectral_paths(variables)  # once, not per kernel leaf

    def walk(node, path, collection):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, path + (k,), collection)
            return
        v = np.asarray(node)
        leaf = path[-1]
        mpath = path[:-1]
        if collection == "spectral":
            # path ends with ('sn', 'u'|'v'); torch key drops the 'sn'
            tkey = ".".join(mpath[:-1]) + (".weight_u" if leaf == "u" else ".weight_v")
            out[tkey] = v
            return
        if collection == "batch_stats":
            name = "running_mean" if leaf == "mean" else "running_var"
            out[".".join(mpath) + "." + name] = v
            return
        # params
        if kind == "flownet" and mpath and mpath[0].startswith("upsampled_flow"):
            mpath = mpath[:-1]  # drop the synthetic 'conv' level
        key = ".".join(mpath)
        if leaf == "kernel":
            if v.ndim == 4:
                if _is_transposed_conv(kind, mpath):
                    w = np.transpose(v, (2, 3, 0, 1))[:, :, ::-1, ::-1].copy()
                else:
                    w = np.transpose(v, (3, 2, 0, 1))
            else:
                w = np.transpose(v, (1, 0))
            # spectral-normed kernels export as weight_orig
            name = "weight_orig" if tuple(path[:-1]) in sn_mods else "weight"
            out[key + "." + name] = w
        elif leaf == "scale":
            out[key + ".weight"] = v
        elif leaf == "bias":
            out[key + ".bias"] = v
        else:
            raise ValueError(f"unhandled param leaf {path}")

    for coll in ("params", "batch_stats", "spectral"):
        if coll in variables:
            walk(variables[coll], (), coll)

    if kind == "flownet":
        g = out["conv0.0.weight"].shape[0]  # ngf
        # i_conv(in, out) channel table, reference base_networks.py:92-97
        occ = {5: (16 * g + 1, 8 * g), 4: (12 * g + 1, 4 * g),
               3: (6 * g + 1, 2 * g), 2: (g + 1, g),
               1: (g // 2 + 1, g // 2), 0: (g // 4 + 1, g // 4)}
        for i, (cin, cout) in occ.items():
            pre = f"inter_conv_occ{i}"
            out[f"{pre}.0.weight"] = np.zeros((cout, cin, 3, 3), np.float32)
            out[f"{pre}.0.bias"] = np.zeros((cout,), np.float32)
            out[f"{pre}.1.weight"] = np.ones((cout,), np.float32)
            out[f"{pre}.1.bias"] = np.zeros((cout,), np.float32)
            out[f"{pre}.1.running_mean"] = np.zeros((cout,), np.float32)
            out[f"{pre}.1.running_var"] = np.ones((cout,), np.float32)
            out[f"{pre}.1.num_batches_tracked"] = np.zeros((), np.int64)
    return out


def _spectral_paths(variables) -> set:
    mods = set()

    def collect(node, path):
        if isinstance(node, Mapping):
            if "sn" in node and isinstance(node["sn"], Mapping):
                mods.add(path)
            for k, v in node.items():
                collect(v, path + (k,))

    if "spectral" in variables:
        collect(variables["spectral"], ())
    return mods


def tree_shapes(tree) -> Dict[str, tuple]:
    """Flatten a variable tree into {'a/b/c': shape} for structural checks."""
    out = {}

    def walk(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            out["/".join(path)] = tuple(np.shape(node))

    walk(tree, ())
    return out


def validate_converted(converted: Mapping, initialized: Mapping, name: str = "") -> None:
    """Raise if the converted tree doesn't structurally match an init tree."""
    a = tree_shapes(converted)
    b = tree_shapes(initialized)
    missing = sorted(set(b) - set(a))
    extra = sorted(set(a) - set(b))
    bad = [k for k in set(a) & set(b) if a[k] != b[k]]
    msgs = []
    if missing:
        msgs.append(f"missing from checkpoint: {missing[:8]}{'...' if len(missing) > 8 else ''}")
    if extra:
        msgs.append(f"unexpected in checkpoint: {extra[:8]}{'...' if len(extra) > 8 else ''}")
    if bad:
        msgs.append(f"shape mismatch: {[(k, a[k], b[k]) for k in bad[:8]]}")
    if msgs:
        raise ValueError(f"convert_state_dict({name}): " + "; ".join(msgs))


def load_pth(path: str, kind: str, target_variables=None):
    """Load a torch .pth file and convert. Requires torch (CPU) available."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, Mapping) and "state_dict" in sd:
        # lightCNN finetune checkpoints wrap the state_dict and may carry a
        # 'module.' DataParallel prefix (lightcnn/finetune.py:279-280).
        sd = sd["state_dict"]
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in dict(sd).items() }
    conv = convert_state_dict(sd, kind)
    if target_variables is not None:
        validate_converted(conv, target_variables, kind)
    return conv
