"""Learning-rate schedules (per-epoch, host-side).

Rebuild of the reference's scheduler surface (models/networks.py:36-64
get_scheduler + options/train_options.py:35-36): policies 'step' (default,
gamma 0.5 every ``lr_decay_iters`` epochs), 'linear', 'cosine', 'plateau'.
The trainer injects lr via optax.inject_hyperparams, mirroring the
reference's epoch-end ``update_learning_rate`` call
(models/base_model.py:145-154).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


def step_lr(base_lr: float, epoch: int, decay_epochs: int = 3, gamma: float = 0.5) -> float:
    return base_lr * (gamma ** (epoch // decay_epochs))


def linear_lr(base_lr: float, epoch: int, niter: int, niter_decay: int,
              epoch_count: int = 1) -> float:
    """Constant for ``niter`` epochs then linear decay to 0 over
    ``niter_decay`` (reference lambda_rule, models/networks.py:47-50).

    ``epoch`` counts epochs trained in THIS process (torch's scheduler
    last_epoch restarts at 0 on --continue_train); ``epoch_count`` is the
    reference's resume offset — callers MUST pass it so resumed runs
    continue the decay instead of restarting it."""
    lr_l = 1.0 - max(0, epoch + epoch_count - niter) / float(niter_decay + 1)
    return base_lr * max(lr_l, 0.0)


def cosine_lr(base_lr: float, epoch: int, t_max: int) -> float:
    """CosineAnnealingLR(T_max, eta_min=0) closed form. The reference uses
    T_max = opt.niter (models/networks.py:57), NOT niter + niter_decay —
    lr hits 0 at epoch niter and (like torch) climbs back up afterwards."""
    return base_lr * 0.5 * (1 + math.cos(math.pi * epoch / max(t_max, 1)))


@dataclass
class PlateauTracker:
    """ReduceLROnPlateau(mode=min, factor=0.2, patience=5) host-side."""

    base_lr: float
    factor: float = 0.2
    patience: int = 5
    threshold: float = 1e-2
    lr: float = field(default=0.0)
    best: float = field(default=math.inf)
    bad_epochs: int = 0

    def __post_init__(self):
        self.lr = self.base_lr

    def update(self, metric: float) -> float:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr


def get_lr(policy: str, base_lr: float, epoch: int, *, decay_epochs: int = 3,
           gamma: float = 0.5, niter: int = 20, niter_decay: int = 20,
           epoch_count: int = 1) -> float:
    if policy == "step":
        return step_lr(base_lr, epoch, decay_epochs, gamma)
    if policy == "linear":
        return linear_lr(base_lr, epoch, niter, niter_decay, epoch_count)
    if policy == "cosine":
        return cosine_lr(base_lr, epoch, niter)
    raise NotImplementedError(f"lr policy {policy!r} (plateau uses PlateauTracker)")
