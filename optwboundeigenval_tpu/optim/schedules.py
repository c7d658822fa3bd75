"""Host-side learning-rate schedulers with torch-scheduler semantics.

The reference steps its scheduler once per epoch, feeding the train
loss to ReduceLROnPlateau (opt.py:760-763).  Here schedulers are small
host objects; each epoch the trainer calls ``step(metric)`` and writes
the returned lr into the optimizer's injected hyperparams
(optim/api.py).  Keeping this on host matches the reference semantics
exactly and keeps the jitted step free of control flow.
"""

from __future__ import annotations

from typing import Callable, Optional


class Scheduler:
    def __init__(self, base_lr: float):
        self.base_lr = float(base_lr)
        self.epoch = 0
        self.lr = float(base_lr)

    def step(self, metric: Optional[float] = None) -> float:
        self.epoch += 1
        self.lr = self._compute(self.epoch, metric)
        return self.lr

    def _compute(self, epoch: int, metric) -> float:
        return self.lr


class LambdaLR(Scheduler):
    """lr = base_lr * fn(epoch) — torch.optim.lr_scheduler.LambdaLR
    (used e.g. by params/forest_lobpcg.py beta(k)=1/(1+k))."""

    def __init__(self, base_lr: float, lr_lambda: Callable[[int], float]):
        super().__init__(base_lr)
        self.fn = lr_lambda
        self.lr = self.base_lr * float(self.fn(0))

    def _compute(self, epoch, metric):
        return self.base_lr * float(self.fn(epoch))


class ExponentialLR(Scheduler):
    def __init__(self, base_lr: float, gamma: float):
        super().__init__(base_lr)
        self.gamma = gamma

    def _compute(self, epoch, metric):
        return self.base_lr * self.gamma**epoch


class CosineAnnealingLR(Scheduler):
    def __init__(self, base_lr: float, T_max: int, eta_min: float = 0.0):
        super().__init__(base_lr)
        self.T_max = T_max
        self.eta_min = eta_min

    def _compute(self, epoch, metric):
        import math

        # no clamp at T_max: torch's CosineAnnealingLR continues the
        # cosine wave past T_max (the lr rises again), and the parity
        # test pins that behavior
        return (
            self.eta_min
            + (self.base_lr - self.eta_min)
            * (1 + math.cos(math.pi * epoch / self.T_max))
            / 2
        )


class ReduceLROnPlateau(Scheduler):
    """Reduce lr by ``factor`` after ``patience`` epochs without
    improvement of the metric (the reference feeds train loss ``f``,
    opt.py:760-761)."""

    def __init__(
        self,
        base_lr: float,
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
        mode: str = "min",
    ):
        super().__init__(base_lr)
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.mode = mode
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def _compute(self, epoch, metric):
        if metric is None:
            return self.lr
        better = (
            self.best is None
            or (self.mode == "min" and metric < self.best * (1 - self.threshold))
            or (self.mode == "max" and metric > self.best * (1 + self.threshold))
        )
        if better:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.bad_epochs = 0
                return max(self.lr * self.factor, self.min_lr)
        return self.lr
