"""Shared train-state plumbing for the jitted trainers."""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import flax
import jax
import optax


@flax.struct.dataclass
class NetState:
    """Parameters + non-param collections (batch_stats / spectral) of one net."""

    params: Any
    extra: Any  # dict of extra variable collections (may be empty)

    @property
    def variables(self) -> Dict:
        return {"params": self.params, **self.extra}

    @classmethod
    def from_variables(cls, variables: Mapping) -> "NetState":
        extra = {k: v for k, v in variables.items() if k != "params"}
        return cls(params=variables["params"], extra=extra)


def apply_mutable(model, net: NetState, *args, **kwargs) -> Tuple[Any, NetState]:
    """Apply with all extra collections mutable; returns (out, new NetState)."""
    mutable = list(net.extra.keys())
    if not mutable:
        return model.apply(net.variables, *args, **kwargs), net
    out, updates = model.apply(net.variables, *args, mutable=mutable, **kwargs)
    return out, NetState(params=net.params, extra=dict(updates))


def adam(lr: float, b1: float = 0.5, b2: float = 0.999) -> optax.GradientTransformation:
    """Adam with the reference betas (0.5, 0.999) and injectable lr (for the
    per-epoch schedules, models/base_model.py:145-154)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=b1, b2=b2)


def set_lr(opt_state, lr: float):
    """Update the injected learning rate in an inject_hyperparams state."""
    opt_state.hyperparams["learning_rate"] = jax.numpy.asarray(lr, dtype=jax.numpy.float32)
    return opt_state
