"""Profiling & step timing.

The reference's tracing is wall-clock only (per-iter compute/data seconds in
the train loops — SURVEY.md §5). Here: the same step timers plus real device
profiling via jax.profiler (trace files viewable in TensorBoard/Perfetto/
xprof), enabled with --profile on the training CLIs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax.profiler trace over the enclosed block (no-op if logdir falsy)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Tracks compute/data time per iteration (reference t_comp/t_data)."""

    def __init__(self):
        self.t_data = 0.0
        self.t_comp = 0.0
        self._mark = time.perf_counter()

    def data_done(self):
        now = time.perf_counter()
        self.t_data = now - self._mark
        self._mark = now

    def step_done(self):
        now = time.perf_counter()
        self.t_comp = now - self._mark
        self._mark = now


class ThroughputMeter:
    """EMA images/sec."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ips = 0.0

    def update(self, n_images: int, seconds: float) -> float:
        inst = n_images / max(seconds, 1e-9)
        self.ips = inst if self.ips == 0 else (
            (1 - self.alpha) * self.ips + self.alpha * inst)
        return self.ips


def count_params(params) -> int:
    """Total parameter count of a params pytree."""
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def print_networks(named_params: Dict[str, object], verbose: bool = False) -> None:
    """Per-network parameter counts (reference BaseModel.print_networks,
    models/base_model.py:231-247)."""
    print("---------- Networks initialized -------------")
    for name, params in named_params.items():
        n = count_params(params)
        print(f"[Network {name}] Total number of parameters : {n / 1e6:.3f} M")
    print("-----------------------------------------------")


def diagnose_gradients(grads, name: str = "network") -> float:
    """Mean of mean-abs gradients per leaf (reference diagnose_network,
    util/util.py:73-89) — a quick vanishing/exploding-gradient probe."""
    import jax.numpy as jnp

    leaves = jax.tree.leaves(grads)
    if not leaves:
        return 0.0
    mean = float(sum(jnp.mean(jnp.abs(g)) for g in leaves) / len(leaves))
    print(f"{name}: mean |grad| = {mean:.3e}")
    return mean


def summarize_memory() -> Dict[str, float]:
    """Per-device live-buffer bytes (when the backend exposes stats)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = stats.get("bytes_in_use", 0) / 1e6
        except Exception:
            pass
    return out
