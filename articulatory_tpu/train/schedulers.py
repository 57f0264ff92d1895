"""Host-side LR schedulers mirroring torch.optim.lr_scheduler semantics.

The reference resolves scheduler classes by name from YAML (train.py:
1770-1779) and steps them once per train step, special-casing
ReduceLROnPlateau to receive the loss (train.py:378-383). These are plain
Python objects; the trainer reads ``.lr`` each step and feeds it to the
jitted update, so metric-driven schedules need no retracing.
"""

from __future__ import annotations

from typing import Sequence


class _Scheduler:
    def __init__(self, base_lr: float):
        self.base_lr = base_lr
        self.lr = base_lr
        self.step_count = 0

    def step(self, metric: float | None = None) -> None:
        self.step_count += 1
        self._update(metric)

    def _update(self, metric):
        raise NotImplementedError

    def state_dict(self) -> dict:
        # exclude non-serializable members (torch parity: LambdaLR.state_dict
        # excludes lr_lambda) — checkpoints are msgpack-serialized
        return {k: v for k, v in self.__dict__.items() if not callable(v)}

    def load_state_dict(self, state: dict) -> None:
        self.__dict__.update(state)


class ConstantLR(_Scheduler):
    def _update(self, metric):
        pass


class MultiStepLR(_Scheduler):
    def __init__(self, base_lr: float, milestones: Sequence[int], gamma: float = 0.1):
        super().__init__(base_lr)
        self.milestones = sorted(milestones)
        self.gamma = gamma

    def _update(self, metric):
        n = sum(1 for m in self.milestones if self.step_count >= m)
        self.lr = self.base_lr * (self.gamma ** n)


class StepLR(_Scheduler):
    def __init__(self, base_lr: float, step_size: int, gamma: float = 0.1):
        super().__init__(base_lr)
        self.step_size = step_size
        self.gamma = gamma

    def _update(self, metric):
        self.lr = self.base_lr * (self.gamma ** (self.step_count // self.step_size))


class ExponentialLR(_Scheduler):
    def __init__(self, base_lr: float, gamma: float):
        super().__init__(base_lr)
        self.gamma = gamma

    def _update(self, metric):
        self.lr = self.base_lr * (self.gamma ** self.step_count)


class LambdaLR(_Scheduler):
    def __init__(self, base_lr: float, lr_lambda):
        super().__init__(base_lr)
        self.lr_lambda = lr_lambda

    def _update(self, metric):
        self.lr = self.base_lr * self.lr_lambda(self.step_count)


class ReduceLROnPlateau(_Scheduler):
    """torch semantics: shrink lr by ``factor`` after ``patience`` steps
    without improvement beyond ``threshold``."""

    def __init__(self, base_lr: float, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0,
                 min_lr: float = 0.0):
        super().__init__(base_lr)
        assert mode in ("min", "max")
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.best = float("inf") if mode == "min" else -float("inf")
        self.num_bad = 0
        self.cooldown_counter = 0

    def _is_better(self, metric: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return metric < self.best * (1.0 - self.threshold)
            return metric < self.best - self.threshold
        if self.threshold_mode == "rel":
            return metric > self.best * (1.0 + self.threshold)
        return metric > self.best + self.threshold

    def _update(self, metric):
        if metric is None:
            return
        metric = float(metric)
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.cooldown_counter = self.cooldown
                self.num_bad = 0


def build_scheduler(name: str, base_lr: float, params: dict | None = None):
    params = dict(params or {})
    params.pop("optimizer", None)
    registry = {
        "MultiStepLR": MultiStepLR,
        "StepLR": StepLR,
        "ExponentialLR": ExponentialLR,
        "LambdaLR": LambdaLR,
        "ReduceLROnPlateau": ReduceLROnPlateau,
        "ConstantLR": ConstantLR,
    }
    if name not in registry:
        raise ValueError(f"Unsupported scheduler: {name}")
    if name == "ConstantLR":
        return ConstantLR(base_lr)
    return registry[name](base_lr, **params)
