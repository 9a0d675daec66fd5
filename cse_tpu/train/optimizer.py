"""Optimizer stack matching the reference trainers.

Reference recipe (``train_ContSep.py:233,402-419``): AdamW(amsgrad=True,
weight_decay=1e-6), global grad-norm clip at 5.0, skip the update when the
grad norm is non-finite, LR from a warmup schedule. Gradient accumulation
(``--update_frequency``) maps to optax.MultiSteps.

On TPU we train in bf16 compute with fp32 params — no GradScaler; the
non-finite skip is kept as a safety net (optax.apply_if_finite).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class PlateauScaleState(NamedTuple):
    """Host-updatable lr multiplier for ReduceLROnPlateau.

    The schedule itself is traced into the jitted step, so a Python-side
    scale would be baked in at compile time; carrying the scale in the
    optimizer STATE makes it a runtime input the host can overwrite when
    the plateau scheduler fires (reference ``train_ContSep.py:244-251,461-462``
    — torch mutates param_group lr in place; this is the SPMD equivalent).
    """

    scale: jax.Array


def scale_by_plateau() -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return PlateauScaleState(scale=jnp.ones((), jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda u: u * state.scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def set_plateau_scale(opt_state, scale: float):
    """Return ``opt_state`` with every PlateauScaleState replaced by ``scale``
    (works through apply_if_finite / MultiSteps wrappers)."""
    is_ps = lambda x: isinstance(x, PlateauScaleState)
    return jax.tree.map(
        lambda x: PlateauScaleState(jnp.asarray(scale, jnp.float32)) if is_ps(x) else x,
        opt_state,
        is_leaf=is_ps,
    )


def get_plateau_scale(opt_state) -> float:
    """Read the current plateau scale out of the optimizer state."""
    is_ps = lambda x: isinstance(x, PlateauScaleState)
    found = [
        float(x.scale)
        for x in jax.tree.leaves(opt_state, is_leaf=is_ps)
        if is_ps(x)
    ]
    return found[0] if found else 1.0


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
        scale_by_plateau(),
    )
    # skip-on-nonfinite: mirrors the reference's grad-norm guard, which
    # ALWAYS skips (a low threshold would eventually apply a NaN update and
    # destroy the params; a stall is diagnosable, a silent NaN-out is not)
    tx = optax.apply_if_finite(tx, max_consecutive_errors=10**8)
    if update_frequency > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=update_frequency)
    return tx
