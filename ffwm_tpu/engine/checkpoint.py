"""Checkpointing — Orbax for native state, .pth interop for the reference.

Improves on the reference's save/load (models/base_model.py:172-229, which
drops optimizer/scheduler/iteration state — SURVEY.md §5): full train states
(params + batch_stats + spectral + optimizer moments + step/titers) are
saved, so resume is exact (including the 20k-image warm-up gate, which the
reference re-arms on resume).

Layout mirrors the reference's conventions so CLIs feel identical:
    checkpoints/{name}/{epoch}_net_{net}.ckpt/   (orbax dir per net)
    checkpoints/{name}/{epoch}_state.ckpt/       (full train state)
plus .pth import/export via ffwm_tpu.utils.convert.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(checkpoints_dir: str, name: str, tag: str) -> str:
    return os.path.abspath(os.path.join(checkpoints_dir, name, tag))


def save_tree(checkpoints_dir: str, name: str, tag: str, tree: Any) -> str:
    """Save an arbitrary pytree (e.g. '{epoch}_net_netG')."""
    path = _path(checkpoints_dir, name, tag + ".ckpt")
    ckptr = ocp.StandardCheckpointer()
    tree = jax.tree.map(np.asarray, tree)
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def restore_tree(checkpoints_dir: str, name: str, tag: str,
                 target: Optional[Any] = None) -> Any:
    path = _path(checkpoints_dir, name, tag + ".ckpt")
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        target = jax.tree.map(np.asarray, target)
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)


def exists(checkpoints_dir: str, name: str, tag: str) -> bool:
    return os.path.isdir(_path(checkpoints_dir, name, tag + ".ckpt"))


def save_pth(variables: Any, kind: str, path: str) -> None:
    """Export flax variables as a reference-compatible torch state_dict."""
    import torch

    from ffwm_tpu.utils.convert import export_state_dict

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(variables, kind).items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(sd, path)


def load_pth(path: str, kind: str, target_variables: Optional[Any] = None) -> Any:
    from ffwm_tpu.utils import convert

    return convert.load_pth(path, kind, target_variables)
