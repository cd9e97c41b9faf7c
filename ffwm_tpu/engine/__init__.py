"""Training/eval engine: jitted steps, states, schedules, checkpointing."""

from ffwm_tpu.engine.checkpoint import (
    exists,
    load_pth,
    restore_tree,
    save_pth,
    save_tree,
)
from ffwm_tpu.engine.common import NetState, adam, apply_mutable, set_lr
from ffwm_tpu.engine.ffwm_model import (
    FFWMModels,
    FFWMTrainState,
    build_models,
    create_ffwm_train_state,
    make_ffwm_inference,
    make_ffwm_train_step,
    make_identity_feature_fn,
)
from ffwm_tpu.engine.flownet_model import (
    FlowTrainState,
    create_flow_train_state,
    make_flow_eval_step,
    make_flow_train_step,
)
from ffwm_tpu.engine.schedule import PlateauTracker, get_lr

__all__ = [
    "FFWMModels",
    "FFWMTrainState",
    "FlowTrainState",
    "NetState",
    "PlateauTracker",
    "adam",
    "apply_mutable",
    "build_models",
    "create_ffwm_train_state",
    "create_flow_train_state",
    "exists",
    "get_lr",
    "load_pth",
    "make_ffwm_inference",
    "make_ffwm_train_step",
    "make_flow_eval_step",
    "make_flow_train_step",
    "make_identity_feature_fn",
    "restore_tree",
    "save_pth",
    "save_tree",
    "set_lr",
]
