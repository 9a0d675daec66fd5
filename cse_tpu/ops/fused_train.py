"""Fused transformer layers with a hand-written Pallas backward (training).

Extends the inference-only fused stack (ops/fused_stack.py) to training: a
chunk of pre-LN layers runs as ONE kernel in both directions. Forward saves
only the chunk input; backward replays the chunk in VMEM and produces dx plus
weight gradients, accumulated across the (sequential) TPU grid into
constant-index output blocks. HBM traffic per chunk is O(L*D) activations
instead of per-layer round-trips of activations and [L, L] attention probs —
the dominant cost of the XLA+remat path (PERF.md).

Grid blocking: each grid step processes ``gb`` sequences at once. The
position-wise matmuls (QKV / out-proj / FFN) and every weight-gradient
contraction run on [gb*Lp, D] operands instead of [Lp, D] — 4-8x larger M/K
dims keep the MXU pipeline full — and the grid shrinks by gb, amortizing
per-step DMA/control overhead. Only the attention score/PV matmuls stay
per-sequence (they are ~14% of layer FLOPs).

Layer math matches cse_tpu.models.sepformer.TransformerEncoderLayer exactly:
  x += Wo @ MHSA(LN1(x));  x += W2 @ relu(W1 @ LN2(x))
with fp32 residual stream/LN/softmax and bf16 matmuls.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6

# Sequences per grid step. The r2/r3 sweeps only tried wide blocks
# ((8,8)/(16,4)) at chunk=2 and concluded gb=1; the r4 chunk=1 sweep
# (scripts/bench_fused.py, v5e, both B=8 and B=16 shapes) shows moderate
# blocking wins, and the optimum depends on the padded sequence length:
#   Lp=256 (intra, L=251): gb_f=4,gb_b=4  → 141.2/276.0 ms vs 149.4/291.8 at
#                          gb=1 (B=8/B=16), −5.5%
#   Lp=128 (inter, L=127): gb_f=4,gb_b=8  → 127.3/248.8 ms vs 143.2/281.4,
#                          −11.1%/−11.6%
# Wider ((8,16)/(16,16)) fails Mosaic compile at Lp=256 and regresses at
# Lp=128. ``None`` selects per-length defaults via _default_gb at call time.
FWD_GB = None
BWD_GB = None


def _default_gb(Lp: int, gb, bwd: bool = False) -> int:
    """Resolve measured per-sequence-length grid-block defaults (see above).

    Only the measured paper-dim lengths (Lp=128 inter, Lp=256 intra) get
    blocks >1; longer sequences keep gb=1 — the bwd kernel holds
    O(gb * nhead * Lp^2) attention probs in VMEM, so e.g. Lp=1280 at gb=4
    exceeds the 128 MB window (verified: tiny-model CLI smoke OOMs)."""
    if gb is not None:
        return gb
    if Lp <= 128:
        return 8 if bwd else 4
    if Lp <= 256:
        return 4
    return 1


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln_fwd(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x - mu) * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(dy, xhat, inv, scale):
    """Returns (dx, dscale, dbias) for y = xhat*scale + bias."""
    dscale = jnp.sum(dy * xhat, axis=0)
    dbias = jnp.sum(dy, axis=0)
    dxhat = dy * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = inv * (dxhat - m1 - xhat * m2)
    return dx, dscale, dbias


def _attn_block_fwd(qkv, nhead, D, gb, Lp, kmask, cd, keep_probs=True):
    """qkv [gb*Lp, 3D] fp32 -> (attn [gb*Lp, D] fp32, probs[item][head]).

    Stage-split over heads (all scores -> all softmaxes -> all PVs) so the
    scheduler can overlap head h's VPU softmax with head h+1's MXU matmul
    instead of serializing MXU->VPU->MXU per head. The 1/sqrt(hd) scale is
    folded into q ([Lp, hd] multiply, not [Lp, Lp]), and the softmax division
    moves past PV onto the [Lp, hd] output — probs are kept UNNORMALIZED.
    With ``keep_probs=True`` each probs entry is ``(p_unnorm, invz)``; the
    backward folds ``invz`` into row-scaled ops instead of ever materializing
    the [Lp, Lp] normalized matrix.
    """
    hd = D // nhead
    scale = 1.0 / math.sqrt(hd)
    rows, probs = [], []
    for i in range(gb):
        r0 = i * Lp
        ss = []
        for h in range(nhead):
            # score matmul contracts in cd (fp32 accumulate) — matches the
            # XLA layer path's dtype and runs the MXU at full rate; at
            # cd=fp32 configs this is a no-op cast (parity tests unchanged)
            q = (qkv[r0 : r0 + Lp, h * hd : (h + 1) * hd] * scale).astype(cd)
            k = qkv[r0 : r0 + Lp, D + h * hd : D + (h + 1) * hd].astype(cd)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ss.append(jnp.where(kmask, s, -1e30))
        ps, invzs = [], []
        for h in range(nhead):
            m = jnp.max(ss[h], axis=1, keepdims=True)
            p = jnp.exp(ss[h] - m)
            invzs.append(1.0 / jnp.sum(p, axis=1, keepdims=True))
            ps.append(p)
        cols = []
        for h in range(nhead):
            v = qkv[r0 : r0 + Lp, 2 * D + h * hd : 2 * D + (h + 1) * hd]
            pv = jnp.dot(ps[h].astype(cd), v.astype(cd), preferred_element_type=jnp.float32)
            cols.append(pv * invzs[h])
        probs.append(list(zip(ps, invzs)) if keep_probs else None)
        rows.append(jnp.concatenate(cols, axis=-1))
    return jnp.concatenate(rows, axis=0), probs


def _layer_fwd(x, w, li, nhead, D, gb, Lp, kmask, cd, keep_probs=True):
    """One pre-LN layer forward on [gb*Lp, D]. Returns (x_out, internals)."""
    h1, xhat1, inv1 = _ln_fwd(x, w["ln1_s"][li].astype(jnp.float32),
                              w["ln1_b"][li].astype(jnp.float32))
    qkv = jnp.dot(h1.astype(cd), w["qkv_w"][li], preferred_element_type=jnp.float32)
    qkv = qkv + w["qkv_b"][li].astype(jnp.float32)
    attn, probs = _attn_block_fwd(qkv, nhead, D, gb, Lp, kmask, cd, keep_probs)
    ao = jnp.dot(attn.astype(cd), w["out_w"][li], preferred_element_type=jnp.float32)
    x1 = x + ao + w["out_b"][li].astype(jnp.float32)
    h2, xhat2, inv2 = _ln_fwd(x1, w["ln2_s"][li].astype(jnp.float32),
                              w["ln2_b"][li].astype(jnp.float32))
    pre = jnp.dot(h2.astype(cd), w["f1_w"][li], preferred_element_type=jnp.float32)
    pre = pre + w["f1_b"][li].astype(jnp.float32)
    hrelu = jnp.maximum(pre, 0.0)
    fo = jnp.dot(hrelu.astype(cd), w["f2_w"][li], preferred_element_type=jnp.float32)
    x2 = x1 + fo + w["f2_b"][li].astype(jnp.float32)
    saved = dict(h1=h1, xhat1=xhat1, inv1=inv1, qkv=qkv, probs=probs, attn=attn,
                 x1=x1, h2=h2, xhat2=xhat2, inv2=inv2, hrelu=hrelu)
    return x2, saved


W_NAMES = ("qkv_w", "qkv_b", "out_w", "out_b", "ln1_s", "ln1_b",
           "ln2_s", "ln2_b", "f1_w", "f1_b", "f2_w", "f2_b")


def _fwd_kernel(x_ref, *refs, n_layers, nhead, L, cd):
    w = dict(zip(W_NAMES, refs[:-1]))
    o_ref = refs[-1]
    gb, Lp, D = x_ref.shape
    kmask = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1) < L
    x = x_ref[...].astype(jnp.float32).reshape(gb * Lp, D)
    for li in range(n_layers):
        x, _ = _layer_fwd(x, w, li, nhead, D, gb, Lp, kmask, cd, keep_probs=False)
    o_ref[...] = x.reshape(gb, Lp, D).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, *refs, n_layers, nhead, L, cd):
    w = dict(zip(W_NAMES, refs[: len(W_NAMES)]))
    dx_ref = refs[len(W_NAMES)]
    dw_refs = dict(zip(W_NAMES, refs[len(W_NAMES) + 1 :]))
    gb, Lp, D = x_ref.shape
    hd = D // nhead
    scale = 1.0 / math.sqrt(hd)
    kmask = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1) < L

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs.values():
            r[...] = jnp.zeros(r.shape, r.dtype)

    # replay forward, keeping each layer's internals in VMEM (n_layers small)
    x = x_ref[...].astype(jnp.float32).reshape(gb * Lp, D)
    saves = []
    for li in range(n_layers):
        x, saved = _layer_fwd(x, w, li, nhead, D, gb, Lp, kmask, cd)
        saves.append(saved)

    g = g_ref[...].astype(jnp.float32).reshape(gb * Lp, D)
    for li in reversed(range(n_layers)):
        s = saves[li]
        # ---- FFN bwd: x2 = x1 + f2(relu(f1(h2))) + b2
        dfo = g
        dw_refs["f2_b"][li] += jnp.sum(dfo, axis=0)
        dw_refs["f2_w"][li] += jax.lax.dot_general(
            s["hrelu"].astype(cd), dfo.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dw_refs["f2_w"].dtype)
        dhrelu = jnp.dot(
            dfo.astype(cd), w["f2_w"][li].T, preferred_element_type=jnp.float32
        )
        dpre = jnp.where(s["hrelu"] > 0, dhrelu, 0.0)
        dw_refs["f1_b"][li] += jnp.sum(dpre, axis=0)
        dw_refs["f1_w"][li] += jax.lax.dot_general(
            s["h2"].astype(cd), dpre.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dw_refs["f1_w"].dtype)
        dh2 = jnp.dot(
            dpre.astype(cd), w["f1_w"][li].T, preferred_element_type=jnp.float32
        )
        dx1_ln, dls2, dlb2 = _ln_bwd(
            dh2, s["xhat2"], s["inv2"], w["ln2_s"][li].astype(jnp.float32)
        )
        dw_refs["ln2_s"][li] += dls2
        dw_refs["ln2_b"][li] += dlb2
        g1 = g + dx1_ln  # d x1

        # ---- attention bwd: x1 = x0 + attn@Wo + bo
        dw_refs["out_b"][li] += jnp.sum(g1, axis=0)
        dw_refs["out_w"][li] += jax.lax.dot_general(
            s["attn"].astype(cd), g1.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dw_refs["out_w"].dtype)
        dattn = jnp.dot(
            g1.astype(cd), w["out_w"][li].T, preferred_element_type=jnp.float32
        )
        # stage-split over heads (like _attn_block_fwd): MXU batches (dv, dp)
        # -> VPU batch (softmax-grad ds) -> MXU batches (dq, dk), letting the
        # scheduler overlap vector and matrix work across heads
        item_rows = []
        for i in range(gb):
            r0 = i * Lp
            dps, dvs = [], []
            for h in range(nhead):
                v = s["qkv"][r0 : r0 + Lp, 2 * D + h * hd : 2 * D + (h + 1) * hd]
                p, invz = s["probs"][i][h]
                do = dattn[r0 : r0 + Lp, h * hd : (h + 1) * hd]
                # p is unnormalized; 1/z folds onto the [Lp, hd] do instead of
                # a [Lp, Lp] division (p_norm^T @ do == p^T @ (do * invz))
                dvs.append(jax.lax.dot_general(
                    p.astype(cd), (do * invz).astype(cd), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
                dps.append(jax.lax.dot_general(
                    do.astype(cd), v.astype(cd), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
            # ds here is the grad of the UNSCALED scores s' = q@k^T; the
            # 1/sqrt(hd) factor lands on the [Lp, hd] outputs instead of the
            # [Lp, Lp] ds, and the softmax 1/z rides the same fused
            # elementwise pass (ds = p*(dp - delta)*invz, one extra multiply)
            dss = []
            for h in range(nhead):
                p, invz = s["probs"][i][h]
                delta = jnp.sum(dps[h] * p, axis=1, keepdims=True) * invz
                dss.append(p * (dps[h] - delta) * invz)
            dqs, dks = [], []
            for h in range(nhead):
                q = s["qkv"][r0 : r0 + Lp, h * hd : (h + 1) * hd]
                k = s["qkv"][r0 : r0 + Lp, D + h * hd : D + (h + 1) * hd]
                dqs.append(scale * jnp.dot(
                    dss[h].astype(cd), k.astype(cd), preferred_element_type=jnp.float32
                ))
                dks.append(jax.lax.dot_general(
                    dss[h].astype(cd), (scale * q).astype(cd), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
            item_rows.append(jnp.concatenate(dqs + dks + dvs, axis=-1))
        dqkv = jnp.concatenate(item_rows, axis=0)  # [gb*Lp, 3D]
        dw_refs["qkv_b"][li] += jnp.sum(dqkv, axis=0)
        dw_refs["qkv_w"][li] += jax.lax.dot_general(
            s["h1"].astype(cd), dqkv.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dw_refs["qkv_w"].dtype)
        dh1 = jnp.dot(
            dqkv.astype(cd), w["qkv_w"][li].T, preferred_element_type=jnp.float32
        )
        dx0_ln, dls1, dlb1 = _ln_bwd(
            dh1, s["xhat1"], s["inv1"], w["ln1_s"][li].astype(jnp.float32)
        )
        dw_refs["ln1_s"][li] += dls1
        dw_refs["ln1_b"][li] += dlb1
        g = g1 + dx0_ln  # d x0 -> grad into previous layer

    dx_ref[...] = g.reshape(gb, Lp, D).astype(dx_ref.dtype)


def _weight_specs(weights):
    specs = []
    for wname in W_NAMES:
        arr = weights[wname]
        nd = arr.ndim
        specs.append(
            pl.BlockSpec(arr.shape, lambda i, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM)
        )
    return specs


def _pad_rows(x, gb):
    """Pad axis 0 of [G, Lp, D] up to a multiple of gb (zeros)."""
    G = x.shape[0]
    Gp = ((G + gb - 1) // gb) * gb
    if Gp != G:
        x = jnp.pad(x, ((0, Gp - G), (0, 0), (0, 0)))
    return x, Gp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_layers(x, weights, n_layers, nhead, L, gb_f=FWD_GB, gb_b=BWD_GB):
    return _fused_fwd_impl(x, weights, n_layers, nhead, L, gb_f)


def _fused_fwd_impl(x, weights, n_layers, nhead, L, gb):
    G, Lp, D = x.shape
    gb = _default_gb(Lp, gb)
    cd = weights["qkv_w"].dtype
    xp, Gp = _pad_rows(x, gb)
    xspec = pl.BlockSpec((gb, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers=n_layers, nhead=nhead, L=L, cd=cd),
        grid=(Gp // gb,),
        in_specs=[xspec] + _weight_specs(weights),
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((Gp, Lp, D), x.dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
    )(xp, *[weights[k] for k in W_NAMES])
    return out[:G]


def _fused_fwd(x, weights, n_layers, nhead, L, gb_f, gb_b):
    y = _fused_fwd_impl(x, weights, n_layers, nhead, L, gb_f)
    return y, (x, weights)


def _fused_bwd(n_layers, nhead, L, gb_f, gb_b, res, gy):
    x, weights = res
    G, Lp, D = x.shape
    cd = weights["qkv_w"].dtype
    gb = _default_gb(Lp, gb_b, bwd=True)
    # zero-padded rows carry zero cotangents, so their dw contributions vanish
    xp, Gp = _pad_rows(x, gb)
    gp, _ = _pad_rows(gy, gb)
    xspec = pl.BlockSpec((gb, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    dw_shapes = tuple(
        jax.ShapeDtypeStruct(weights[k].shape, jnp.float32) for k in W_NAMES
    )
    dw_specs = []
    for k in W_NAMES:
        nd = weights[k].ndim
        dw_specs.append(
            pl.BlockSpec(weights[k].shape, lambda i, _nd=nd: (0,) * _nd,
                         memory_space=pltpu.VMEM)
        )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers=n_layers, nhead=nhead, L=L, cd=cd),
        grid=(Gp // gb,),
        in_specs=[xspec, xspec] + _weight_specs(weights),
        out_specs=tuple([xspec] + dw_specs),
        out_shape=tuple([jax.ShapeDtypeStruct((Gp, Lp, D), x.dtype)] + list(dw_shapes)),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
    )(xp, gp, *[weights[k] for k in W_NAMES])
    dx = outs[0][:G]
    dw = {k: outs[1 + i].astype(weights[k].dtype) for i, k in enumerate(W_NAMES)}
    return dx, dw


fused_layers.defvjp(_fused_fwd, _fused_bwd)


def fused_stack_train(
    x: jnp.ndarray,
    stack_params: dict,
    nhead: int = 8,
    chunk: int = 1,
    compute_dtype=jnp.bfloat16,
    gb_f: int = FWD_GB,
    gb_b: int = BWD_GB,
) -> jnp.ndarray:
    """Differentiable TransformerStack forward using fused fwd+bwd kernels.

    x: [G, L, D] with positional encoding already added; ``stack_params`` is
    the flax TransformerStack subtree (layer_{i}/..., norm). Per-layer params
    are stacked with jnp.stack (differentiable, so flax gradients flow back
    to the original tree), run through ``fused_layers`` in chunks, and the
    stack's final LayerNorm runs in plain jnp.

    chunk=1 default: after the score matmuls moved to compute_dtype the
    1-layer chunk measures fastest on v5e (146.1/141.9 ms intra/inter vs
    149.5/143.6 at chunk=2, scripts/bench_fused.py; full step 13.1 vs 12.9
    mixtures/s/chip) and B=16 still fits HBM with the doubled chunk-input
    saves.

    gb_f/gb_b=None selects the measured per-length grid blocks (module
    header): (4,4) for intra-length stacks, (4,8) for inter-length ones —
    an ~8% full-step win over the r3 gb=1 default.
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
        return jnp.stack([get(stack_params[k]).astype(cd) for k in layers])

    w = {
        "qkv_w": stk(lambda p: p["self_att"]["in_proj_kernel"]),
        "qkv_b": stk(lambda p: p["self_att"]["in_proj_bias"]),
        "out_w": stk(lambda p: p["self_att"]["out_proj_kernel"]),
        "out_b": stk(lambda p: p["self_att"]["out_proj_bias"]),
        "ln1_s": stk(lambda p: p["norm1"]["scale"]),
        "ln1_b": stk(lambda p: p["norm1"]["bias"]),
        "ln2_s": stk(lambda p: p["norm2"]["scale"]),
        "ln2_b": stk(lambda p: p["norm2"]["bias"]),
        "f1_w": stk(lambda p: p["ffn_1"]["kernel"]),
        "f1_b": stk(lambda p: p["ffn_1"]["bias"]),
        "f2_w": stk(lambda p: p["ffn_2"]["kernel"]),
        "f2_b": stk(lambda p: p["ffn_2"]["bias"]),
    }
    y = jnp.pad(x.astype(cd), ((0, 0), (0, Lp - L), (0, 0)))
    for c0 in range(0, n_layers, chunk):
        n = min(chunk, n_layers - c0)
        wc = {k: jax.lax.dynamic_slice_in_dim(w[k], c0, n, 0) for k in W_NAMES}
        y = fused_layers(y, wc, n, nhead, L, gb_f, gb_b)
    y = y[:, :L].astype(jnp.float32)
    # final stack LayerNorm (fp32, eps 1e-6)
    mu = y.mean(-1, keepdims=True)
    var = ((y - mu) ** 2).mean(-1, keepdims=True)
    return (y - mu) * jax.lax.rsqrt(var + LN_EPS) * stack_params["norm"][
        "scale"
    ] + stack_params["norm"]["bias"]
