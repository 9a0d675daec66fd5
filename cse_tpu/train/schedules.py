"""Learning-rate schedules matching the reference ``src/lr_scheduler.py``.

Multiplier functions (applied to the base lr, reference ``lr_scheduler.py:11-30``):
* cosine_warmup: linear 0->1 over ``warmup`` steps, then cosine 1->0 over the
  remaining ``total - warmup`` steps.
* linear_warmup: linear 0->1 over ``warmup`` steps, then constant 1.
* ReduceLROnPlateau(mode='max', factor=0.5, patience=5, threshold=1e-4) —
  host-side state, stepped on validation SI-SNR
  (reference ``train_ContSep.py:244,461-462``).

Note torch LambdaLR initializes lr to base*f(0) and calls scheduler.step()
AFTER optimizer.step(), so the k-th update (1-based) runs at multiplier
f(k-1) — the very first update uses f(0)=0. optax passes the 0-based count
of prior updates, which is exactly k-1: the multiplier is f(count), no
offset.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp


def cosine_warmup_schedule(base_lr: float, total_steps: int, warmup_steps: int):
    def schedule(count):
        it = count
        warm = it / max(warmup_steps, 1)
        prog = (it - warmup_steps) / max(total_steps - warmup_steps, 1)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * prog))
        return base_lr * jnp.where(it <= warmup_steps, warm, cos)

    return schedule


def linear_warmup_schedule(base_lr: float, warmup_steps: int):
    def schedule(count):
        return base_lr * jnp.minimum(count / max(warmup_steps, 1), 1.0)

    return schedule


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch semantics, mode='max')."""

    factor: float = 0.5
    patience: int = 5
    threshold: float = 1e-4
    best: float = -float("inf")
    num_bad: int = 0
    scale: float = 1.0

    def step(self, metric: float) -> float:
        # torch rel-threshold rule for mode='max': a > best * (1 + threshold)
        better = (
            metric > self.best * (1.0 + self.threshold)
            if math.isfinite(self.best)
            else True
        )
        if better:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale *= self.factor
                self.num_bad = 0
        return self.scale

    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    def load_state_dict(self, d: dict):
        for k, v in d.items():
            setattr(self, k, v)
