"""Optimizer stack matching the reference trainers.

Reference recipe (``train_ContSep.py:233,402-419``): AdamW(amsgrad=True,
weight_decay=1e-6), global grad-norm clip at 5.0, skip the update when the
grad norm is non-finite, LR from a warmup schedule. Gradient accumulation
(``--update_frequency``) maps to optax.MultiSteps.

On TPU we train in bf16 compute with fp32 params — no GradScaler; the
non-finite skip is kept as a safety net (optax.apply_if_finite).
"""

from __future__ import annotations

from typing import Callable

import optax


def build_optimizer(
    schedule: Callable | float,
    weight_decay: float = 1e-6,
    clip_norm: float = 5.0,
    update_frequency: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.scale_by_amsgrad(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(schedule),
    )
    # skip-on-nonfinite: mirrors the reference's grad-norm guard
    tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    if update_frequency > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=update_frequency)
    return tx
