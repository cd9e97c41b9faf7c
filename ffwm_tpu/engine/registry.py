"""Model/trainer registry — create_model-style entry.

Rebuild of the reference's name-based factories (models/__init__.py:25-67,
data/__init__.py:20-47) without the import-by-string machinery: an explicit
registry mapping model names to their builder bundles. Third parties extend
it with ``register_model``.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple


class ModelEntry(NamedTuple):
    create_state: Callable  # (rng, **kw) -> (model(s), state, optimizer(s))
    make_train_step: Callable
    make_inference: Callable


_REGISTRY: Dict[str, ModelEntry] = {}


def register_model(name: str, entry: ModelEntry) -> None:
    _REGISTRY[name.lower()] = entry


def create_model(name: str) -> ModelEntry:
    """Look up a model bundle by CLI name ('ffwm', 'flownet', 'lightcnn')."""
    key = name.lower()
    if key not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[key]


def _init_builtin():
    from ffwm_tpu.engine import ffwm_model as fm
    from ffwm_tpu.engine import flownet_model as fl
    from ffwm_tpu.engine import lightcnn_finetune as lc

    def ffwm_create(rng, **kw):
        models = fm.build_models()
        state, txs = fm.create_ffwm_train_state(rng, models, **kw)
        return models, state, txs

    register_model("ffwm", ModelEntry(
        create_state=ffwm_create,
        make_train_step=fm.make_ffwm_train_step,
        make_inference=fm.make_ffwm_inference,
    ))
    register_model("flownet", ModelEntry(
        create_state=lambda rng, **kw: fl.create_flow_train_state(rng, **kw),
        make_train_step=fl.make_flow_train_step,
        make_inference=lambda model, **kw: fl.make_flow_eval_step(model),
    ))
    register_model("lightcnn", ModelEntry(
        create_state=lambda rng, **kw: lc.create_lightcnn_train_state(rng, **kw),
        make_train_step=lc.make_lightcnn_train_step,
        make_inference=lambda model, **kw: lc.make_lightcnn_feature_fn(model),
    ))


_init_builtin()
