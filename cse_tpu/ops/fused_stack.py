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


def _attention(qkv, nhead: int, D: int, kmask, compute_dtype, gb: int = 1):
    """Stage-split self-attention (scores -> softmaxes -> PVs) so the
    scheduler overlaps VPU softmax with MXU matmuls across heads; the
    1/sqrt(hd) scale folds into q and the softmax division past PV (both
    [Lp, hd]). Score/PV matmuls contract in ``compute_dtype`` (matching the
    XLA layer path) with fp32 accumulation. qkv: [gb*Lp, 3D] fp32 ->
    [gb*Lp, D]; attention itself stays per-sequence (the kmask is square in
    Lp), so the gb sequences of a grid block are looped here."""
    hd = D // nhead
    Lp = qkv.shape[0] // gb
    scale = 1.0 / math.sqrt(hd)
    rows = []
    for i in range(gb):
        r0 = i * Lp
        ss = []
        for hh in range(nhead):
            q = (qkv[r0 : r0 + Lp, hh * hd : (hh + 1) * hd] * scale).astype(compute_dtype)
            k = qkv[r0 : r0 + Lp, D + hh * hd : D + (hh + 1) * hd].astype(compute_dtype)
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
            v = qkv[r0 : r0 + Lp, 2 * D + hh * hd : 2 * D + (hh + 1) * hd]
            pv = jnp.dot(
                ps[hh].astype(compute_dtype), v.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            attn_cols.append(pv / zs[hh])
        rows.append(jnp.concatenate(attn_cols, axis=-1))
    return jnp.concatenate(rows, axis=0)  # [gb*Lp, D]


def _stack_kernel(
    x_ref, qkv_w, qkv_b, out_w, out_b, ln1_s, ln1_b, ln2_s, ln2_b,
    f1_w, f1_b, f2_w, f2_b, fn_s, fn_b, o_ref,
    *, n_layers: int, nhead: int, L: int, compute_dtype,
):
    gb, Lp, D = x_ref.shape
    # [gb*Lp, D] fp32 residual stream — position-wise matmuls batch the
    # block's sequences; attention loops them (see _attention)
    x = x_ref[...].astype(jnp.float32).reshape(gb * Lp, D)
    kmask = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1) < L

    for li in range(n_layers):
        h = _ln(x, ln1_s[li].astype(jnp.float32), ln1_b[li].astype(jnp.float32))
        qkv = (
            jnp.dot(h.astype(compute_dtype), qkv_w[li], preferred_element_type=jnp.float32)
            + qkv_b[li].astype(jnp.float32)
        )  # [gb*Lp, 3D]
        attn = _attention(qkv, nhead, D, kmask, compute_dtype, gb)
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
    o_ref[...] = x.reshape(gb, Lp, D).astype(o_ref.dtype)


def _qdot(h, w8, s):
    """w8a8 matmul: quantize each fp32 row of ``h`` to symmetric int8 with its
    own scale (|h|/sa <= 127 by construction, so round() cannot leave the int8
    range), contract int8 x int8 -> int32 on the MXU double-rate path, then
    apply both scales to the accumulator. w8: [din, dout] int8; s: [1, dout]
    fp32 per-output-channel weight scale. Same math as the frozen Llama's
    ``models/llama.py::_mm_w8a8``."""
    sa = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-12) / 127.0
    hq = jnp.round(h / sa).astype(jnp.int8)
    acc = jax.lax.dot_general(
        hq, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * sa * s


def _stack_kernel_w8a8(
    x_ref, qkv_w, qkv_s, qkv_b, out_w, out_s, out_b,
    ln1_s, ln1_b, ln2_s, ln2_b,
    f1_w, f1_s, f1_b, f2_w, f2_s, f2_b, fn_s, fn_b, o_ref,
    *, n_layers: int, nhead: int, L: int, compute_dtype,
):
    """w8a8 variant of :func:`_stack_kernel`: the four projection matmuls per
    layer run int8 x int8 -> int32 (per-output-channel weight scales, dynamic
    per-row activation scales); LN, softmax, residuals stay fp32 and the
    attention score/PV matmuls stay ``compute_dtype`` (they contract over
    hd=32 / probabilities, where int8 buys nothing). Inference-only — the
    separator is frozen at serving time, so like the frozen Llama encoder
    the quantization error has no gradient path to corrupt."""
    gb, Lp, D = x_ref.shape
    x = x_ref[...].astype(jnp.float32).reshape(gb * Lp, D)
    kmask = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1) < L

    for li in range(n_layers):
        h = _ln(x, ln1_s[li].astype(jnp.float32), ln1_b[li].astype(jnp.float32))
        qkv = _qdot(h, qkv_w[li], qkv_s[li]) + qkv_b[li].astype(jnp.float32)
        attn = _attention(qkv, nhead, D, kmask, compute_dtype, gb)
        x = x + _qdot(attn, out_w[li], out_s[li]) + out_b[li].astype(jnp.float32)
        h = _ln(x, ln2_s[li].astype(jnp.float32), ln2_b[li].astype(jnp.float32))
        h = jnp.maximum(_qdot(h, f1_w[li], f1_s[li]) + f1_b[li].astype(jnp.float32), 0.0)
        x = x + _qdot(h, f2_w[li], f2_s[li]) + f2_b[li].astype(jnp.float32)
    x = _ln(x, fn_s[0].astype(jnp.float32), fn_b[0].astype(jnp.float32))
    o_ref[...] = x.reshape(gb, Lp, D).astype(o_ref.dtype)


def _quantize_stacked(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 for a stacked [n_layers, din, dout]
    weight -> (int8 payload, fp32 scale [n_layers, 1, dout]). Same scheme as
    ``models/llama.py::quantize_llama_params``; runs on device at trace time
    (the weights are jit arguments), a few microseconds against the stack's
    ~50 ms forward."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=1, keepdims=True), 1e-12) / 127.0
    q = jnp.round(wf / s).astype(jnp.int8)
    return q, s


def fused_stack_apply(
    x: jnp.ndarray,
    stack_params: dict,
    nhead: int = 8,
    compute_dtype=jnp.bfloat16,
    quant: str | None = None,
    gb: int | None = None,
) -> jnp.ndarray:
    """Run a TransformerStack forward as one fused kernel.

    x: [G, L, D] sequences; ``stack_params`` is the flax param subtree of
    :class:`cse_tpu.models.sepformer.TransformerStack` (layer_{i}/self_att...,
    norm). Positional encoding must already be added. Returns [G, L, D].

    ``quant="w8a8"`` quantizes the four projection matrices per layer to
    per-output-channel int8 and runs their matmuls on the MXU's double-rate
    int8 path with dynamic per-row activation scales (inference-only; see
    :func:`_stack_kernel_w8a8`).

    ``gb`` = sequences per grid step (None → the measured per-length default,
    mirroring the train kernels' _default_gb: 4 at the paper-dim Lp<=256,
    1 for longer; scripts/bench_fused.py --serving sweeps it).
    """
    G, L, D = x.shape
    Lp = ((L + 127) // 128) * 128
    if gb is None:
        gb = 4 if Lp <= 256 else 1
    Gp = ((G + gb - 1) // gb) * gb
    layers = sorted(
        (k for k in stack_params if k.startswith("layer_")),
        key=lambda s: int(s.split("_")[1]),
    )
    n_layers = len(layers)
    cd = compute_dtype

    # projection matrices keep full precision when quantizing (int8 scales
    # derive from the original fp32 params, not a bf16-rounded copy)
    wd = jnp.float32 if quant == "w8a8" else cd

    def stk(get, dt=None):
        dt = cd if dt is None else dt
        return jnp.stack([jnp.asarray(get(stack_params[k]), dt) for k in layers])

    qkv_w = stk(lambda p: p["self_att"]["in_proj_kernel"], wd)
    qkv_b = stk(lambda p: p["self_att"]["in_proj_bias"])
    out_w = stk(lambda p: p["self_att"]["out_proj_kernel"], wd)
    out_b = stk(lambda p: p["self_att"]["out_proj_bias"])
    ln1_s = stk(lambda p: p["norm1"]["scale"])
    ln1_b = stk(lambda p: p["norm1"]["bias"])
    ln2_s = stk(lambda p: p["norm2"]["scale"])
    ln2_b = stk(lambda p: p["norm2"]["bias"])
    f1_w = stk(lambda p: p["ffn_1"]["kernel"], wd)
    f1_b = stk(lambda p: p["ffn_1"]["bias"])
    f2_w = stk(lambda p: p["ffn_2"]["kernel"], wd)
    f2_b = stk(lambda p: p["ffn_2"]["bias"])
    fn_s = jnp.asarray(stack_params["norm"]["scale"], cd)[None]
    fn_b = jnp.asarray(stack_params["norm"]["bias"], cd)[None]

    xp = jnp.pad(x.astype(cd), ((0, Gp - G), (0, Lp - L), (0, 0)))

    if quant == "w8a8":
        kernel = _stack_kernel_w8a8
        qkv_q, qkv_sc = _quantize_stacked(qkv_w)
        out_q, out_sc = _quantize_stacked(out_w)
        f1_q, f1_sc = _quantize_stacked(f1_w)
        f2_q, f2_sc = _quantize_stacked(f2_w)
        weights = [qkv_q, qkv_sc, qkv_b, out_q, out_sc, out_b,
                   ln1_s, ln1_b, ln2_s, ln2_b,
                   f1_q, f1_sc, f1_b, f2_q, f2_sc, f2_b, fn_s, fn_b]
    elif quant is None:
        kernel = _stack_kernel
        weights = [qkv_w, qkv_b, out_w, out_b, ln1_s, ln1_b, ln2_s, ln2_b,
                   f1_w, f1_b, f2_w, f2_b, fn_s, fn_b]
    else:
        raise ValueError(f"unknown quant mode {quant!r} (None or 'w8a8')")

    def wspec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    xspec = pl.BlockSpec((gb, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            kernel, n_layers=n_layers, nhead=nhead, L=L, compute_dtype=cd
        ),
        grid=(Gp // gb,),
        in_specs=[xspec] + [wspec(w) for w in weights],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((Gp, Lp, D), x.dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(xp, *weights)
    return out[:G, :L]
