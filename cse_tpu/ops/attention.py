"""Fused (flash-style) multi-head self-attention as a Pallas TPU kernel.

Why: the dual-path transformers run attention over huge batches of short
sequences (intra: [B*S, K+ctx<=256]; inter: [B*K, S+ctx~130]). The XLA path
materializes softmax probabilities [BH, L, L] in HBM — at B=16 that alone is
>4 GB/layer and OOMs a v5e core (the reference leans on flash-attention CUDA
kernels for the same reason, ``train_ContSep.py:383``). Here each (batch, head)
tile computes scores, softmax, and the value contraction entirely in VMEM and
writes only [L, dh] outputs (+ per-row logsumexp for the backward pass), so
HBM traffic is O(L*dh) instead of O(L^2).

Sequences are short enough that one program holds the full [Lp, Lp] score
tile in VMEM (Lp <= 512 -> <= 1 MB fp32), so no streaming inner loop is
needed — simpler and faster than a generic flash kernel at these shapes.
A custom VJP recomputes probabilities in VMEM for dq/dk/dv: residuals are
only (q, k, v, o, lse).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, L: int, scale: float, H: int):
    # one program per sequence; static loop over heads amortizes grid overhead
    for h in range(H):
        q = q_ref[0, h].astype(jnp.float32)
        k = k_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [Lp, Lp]
        mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < L
        s = jnp.where(mask, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        o = jnp.dot(
            (p / denom).astype(v_ref.dtype), v_ref[0, h],
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = o.astype(o_ref.dtype)
        lse_ref[0, h] = (m + jnp.log(denom)).astype(jnp.float32)


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, L: int, scale: float, H: int,
):
    for h in range(H):
        q = q_ref[0, h].astype(jnp.float32)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        o = o_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)
        lse = lse_ref[0, h]  # [Lp, 1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < L
        s = jnp.where(mask, s, -1e30)
        p = jnp.exp(s - lse)  # softmax probabilities, recomputed in VMEM
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(do * o, axis=1, keepdims=True)  # rowwise <do, o>
        ds = p * (dp - delta) * scale
        dq_ref[0, h] = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(
            dq_ref.dtype
        )
        dk_ref[0, h] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)
        dv_ref[0, h] = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)


def _tile_specs(H: int, Lp: int, dh: int):
    spec = pl.BlockSpec((1, H, Lp, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec(
        (1, H, Lp, 1), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return spec, lse_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, L):
    o, _ = _flash_fwd_impl(q, k, v, L)
    return o


def _flash_fwd_impl(q, k, v, L):
    B, H, Lp, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    spec, lse_spec = _tile_specs(H, Lp, dh)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, L=L, scale=scale, H=H),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, H, Lp, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(q, k, v)
    return o, lse


def _flash_fwd(q, k, v, L):
    o, lse = _flash_fwd_impl(q, k, v, L)
    return o, (q, k, v, o, lse)


def _flash_bwd(L, res, do):
    q, k, v, o, lse = res
    B, H, Lp, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    spec, lse_spec = _tile_specs(H, Lp, dh)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, L=L, scale=scale, H=H),
        grid=(B,),
        in_specs=[spec, spec, spec, spec, lse_spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=_interpret(),
    )(q, k, v, o, lse, do)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_mhsa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused self-attention. q/k/v: [B, H, L, dh] -> [B, H, L, dh].

    Pads L to a lane-friendly multiple (queries at padded rows produce garbage
    that is sliced away; padded keys are masked inside the kernel).
    """
    B, H, L, dh = q.shape
    Lp = _round_up(L, 128)
    pad = [(0, 0), (0, 0), (0, Lp - L), (0, 0)]
    o = _flash(jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad), L)
    return o[:, :, :L]
