"""Fused transformer-stack Pallas kernel: a whole 8-layer intra/inter pass
per grid step, weights resident in VMEM.

Motivation (PERF.md): the dual-path transformers are memory-bound under XLA —
every layer round-trips [B*S, L, 256] activations and [B*S, 8, L, L]
attention probs through HBM. Sequences are short (L <= 256) and the whole
stack's weights fit VMEM in bf16 (~12.6 MB), so one program can push a
sequence through ALL layers (LN -> packed-QKV attention -> LN -> FFN, pre-LN
residuals, final LN) touching HBM only for the sequence itself. Weight blocks
use constant index maps, so Mosaic keeps them resident across grid steps
instead of re-fetching.

Inference-only for now (the training path keeps the XLA implementation +
remat); used by the eval/serving stack via ``SepformerConfig.fused_inference``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln(x, scale, bias):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-6) * scale + bias


def _stack_kernel(
    x_ref, qkv_w, qkv_b, out_w, out_b, ln1_s, ln1_b, ln2_s, ln2_b,
    f1_w, f1_b, f2_w, f2_b, fn_s, fn_b, o_ref,
    *, n_layers: int, nhead: int, L: int, compute_dtype,
):
    Lp, D = x_ref.shape[1], x_ref.shape[2]
    hd = D // nhead
    scale = 1.0 / math.sqrt(hd)
    x = x_ref[0].astype(jnp.float32)  # [Lp, D] fp32 residual stream
    kmask = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1) < L

    for li in range(n_layers):
        h = _ln(x, ln1_s[li].astype(jnp.float32), ln1_b[li].astype(jnp.float32))
        qkv = (
            jnp.dot(h.astype(compute_dtype), qkv_w[li], preferred_element_type=jnp.float32)
            + qkv_b[li].astype(jnp.float32)
        )  # [Lp, 3D]
        # stage-split over heads (scores -> softmaxes -> PVs) so the scheduler
        # overlaps VPU softmax with MXU matmuls across heads; the 1/sqrt(hd)
        # scale folds into q and the softmax division past PV (both [Lp, hd])
        ss = []
        for hh in range(nhead):
            q = qkv[:, hh * hd : (hh + 1) * hd] * scale
            k = qkv[:, D + hh * hd : D + (hh + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ss.append(jnp.where(kmask, s, -1e30))
        ps, zs = [], []
        for hh in range(nhead):
            m = jnp.max(ss[hh], axis=1, keepdims=True)
            p = jnp.exp(ss[hh] - m)
            ps.append(p)
            zs.append(jnp.sum(p, axis=1, keepdims=True))
        attn_cols = []
        for hh in range(nhead):
            v = qkv[:, 2 * D + hh * hd : 2 * D + (hh + 1) * hd]
            pv = jnp.dot(
                ps[hh].astype(compute_dtype), v.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            attn_cols.append(pv / zs[hh])
        attn = jnp.concatenate(attn_cols, axis=-1)  # [Lp, D]
        x = x + (
            jnp.dot(attn.astype(compute_dtype), out_w[li], preferred_element_type=jnp.float32)
            + out_b[li].astype(jnp.float32)
        )
        h = _ln(x, ln2_s[li].astype(jnp.float32), ln2_b[li].astype(jnp.float32))
        h = (
            jnp.dot(h.astype(compute_dtype), f1_w[li], preferred_element_type=jnp.float32)
            + f1_b[li].astype(jnp.float32)
        )
        h = jnp.maximum(h, 0.0)
        x = x + (
            jnp.dot(h.astype(compute_dtype), f2_w[li], preferred_element_type=jnp.float32)
            + f2_b[li].astype(jnp.float32)
        )
    x = _ln(x, fn_s[0].astype(jnp.float32), fn_b[0].astype(jnp.float32))
    o_ref[0] = x.astype(o_ref.dtype)


def fused_stack_apply(
    x: jnp.ndarray,
    stack_params: dict,
    nhead: int = 8,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Run a TransformerStack forward as one fused kernel.

    x: [G, L, D] sequences; ``stack_params`` is the flax param subtree of
    :class:`cse_tpu.models.sepformer.TransformerStack` (layer_{i}/self_att...,
    norm). Positional encoding must already be added. Returns [G, L, D].
    """
    G, L, D = x.shape
    Lp = ((L + 127) // 128) * 128
    layers = sorted(
        (k for k in stack_params if k.startswith("layer_")),
        key=lambda s: int(s.split("_")[1]),
    )
    n_layers = len(layers)
    cd = compute_dtype

    def stk(get):
        return jnp.stack([jnp.asarray(get(stack_params[k]), cd) for k in layers])

    qkv_w = stk(lambda p: p["self_att"]["in_proj_kernel"])
    qkv_b = stk(lambda p: p["self_att"]["in_proj_bias"])
    out_w = stk(lambda p: p["self_att"]["out_proj_kernel"])
    out_b = stk(lambda p: p["self_att"]["out_proj_bias"])
    ln1_s = stk(lambda p: p["norm1"]["scale"])
    ln1_b = stk(lambda p: p["norm1"]["bias"])
    ln2_s = stk(lambda p: p["norm2"]["scale"])
    ln2_b = stk(lambda p: p["norm2"]["bias"])
    f1_w = stk(lambda p: p["ffn_1"]["kernel"])
    f1_b = stk(lambda p: p["ffn_1"]["bias"])
    f2_w = stk(lambda p: p["ffn_2"]["kernel"])
    f2_b = stk(lambda p: p["ffn_2"]["bias"])
    fn_s = jnp.asarray(stack_params["norm"]["scale"], cd)[None]
    fn_b = jnp.asarray(stack_params["norm"]["bias"], cd)[None]

    xp = jnp.pad(x.astype(cd), ((0, 0), (0, Lp - L), (0, 0)))

    def wspec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec((1, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    weights = [qkv_w, qkv_b, out_w, out_b, ln1_s, ln1_b, ln2_s, ln2_b,
               f1_w, f1_b, f2_w, f2_b, fn_s, fn_b]

    out = pl.pallas_call(
        functools.partial(
            _stack_kernel, n_layers=n_layers, nhead=nhead, L=L, compute_dtype=cd
        ),
        grid=(G,),
        in_specs=[xspec] + [wspec(w) for w in weights],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((G, Lp, D), x.dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(xp, *weights)
    return out[:, :L]
