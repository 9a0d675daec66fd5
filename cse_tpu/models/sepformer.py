"""Sepformer dual-path separator and its CSE variants, TPU-first.

One configurable model covers the reference's four copy-pasted variants
(``src/models/sepformer.py``, ``src/models/ContSep.py``,
``src/models/ContExt.py`` in the reference repo):

* ``variant='base'``     — plain 2/3-source separation (pretraining stage)
* ``variant='contsep'``  — separate all sources + selector head over the
  context token (reference ``ContSep.py:516-517``)
* ``variant='context'``  — extract ONE stream conditioned on context
  (reference ``ContExt.py:113-119``); with ``add_se=True`` this is H-ContExt
  (ECAPA speaker-cue path with stochastic cue dropout, ``ContExt.py:96-111``).

Architecture (hyperparameters from ``ContSep.py:10-40``): Conv1d(k=16,s=8)
encoder -> dual-path mask net (2 blocks; intra/inter = 8-layer pre-LN
transformers, d_model 256, 8 heads, ffn 1024, sinusoidal PE; chunk K=250 with
50% overlap) -> gated mask output -> ConvTranspose decoder. The projected LLM
context vector is prepended as a prompt token to every intra chunk sequence
and every inter sequence (``ContSep.py:477-518``).

TPU-first design decisions (vs. the reference's torch layout):
* channels-last ``[B, T]->[B, L, N]`` everywhere: N=256 rides the 128-lane
  axis, every Dense hits the MXU without relayout; the reference's
  [B,N,L]<->[B,N,K,S] permute dance disappears.
* all shapes static per (T, ctx_len) bucket — one compile.
* LayerNorm/GroupNorm/softmax in fp32, matmuls in ``param_dtype``-vs-
  ``compute_dtype`` (bf16) mixed precision; no loss scaling needed.
* attention is a fused jnp path today with a Pallas flash kernel switch for
  the hot (B*S, K+ctx) intra batch (see cse_tpu.ops.attention).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from cse_tpu.ops.segmentation import overlap_add, segment


@dataclasses.dataclass(frozen=True)
class SepformerConfig:
    num_spks: int = 2
    variant: str = "base"  # 'base' | 'contsep' | 'context'
    add_se: bool = False  # H-ContExt speaker-embedding cue (variant='context')
    ce: bool = True  # selector head: CE over spks vs BCE single logit
    enc_channels: int = 256
    enc_kernel: int = 16
    enc_stride: int = 8
    d_model: int = 256
    nhead: int = 8
    d_ffn: int = 1024
    num_tf_layers: int = 8
    num_dp_layers: int = 2
    chunk_size: int = 250
    llm_dim: int = 4096
    se_dim: int = 192
    pe_max_len: int = 2500
    compute_dtype: Any = jnp.float32
    use_flash_attention: bool = False
    # softmax accumulation dtype: fp32 (default, safest) or bf16 (faster,
    # slightly lossy attention weights)
    softmax_dtype: Any = jnp.float32
    # rematerialization granularity: False/None, 'block' (dual block),
    # 'layer' (each transformer layer), or 'nested' (block AND layer —
    # smallest HBM peak: only block inputs persist, layer inputs are
    # transient during one block's backward)
    remat: Any = False

    @property
    def add_ctx(self) -> bool:
        return self.variant in ("contsep", "context")


def sinusoidal_pe(length: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal positional encoding table [length, d_model].

    pe[p, 2i] = sin(p * exp(-2i ln(1e4)/d)), pe[p, 2i+1] = cos(...) — the
    speechbrain convention used by the reference transformer blocks.
    """
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((length, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


class MultiHeadSelfAttention(nn.Module):
    """Packed-QKV multi-head self-attention (torch nn.MultiheadAttention layout).

    Params mirror the torch packed layout so released checkpoints map 1:1:
    ``in_proj`` kernel [D, 3D] (q|k|v concatenated), ``out_proj`` [D, D].
    """

    d_model: int
    nhead: int
    compute_dtype: Any = jnp.float32
    use_flash: bool = False
    softmax_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        D, H = self.d_model, self.nhead
        hd = D // H
        in_proj = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (D, 3 * D), jnp.float32
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * D,), jnp.float32)
        out_proj = self.param(
            "out_proj_kernel", nn.initializers.xavier_uniform(), (D, D), jnp.float32
        )
        out_bias = self.param("out_proj_bias", nn.initializers.zeros, (D,), jnp.float32)

        cd = self.compute_dtype
        B, L, _ = x.shape
        qkv = jnp.dot(x.astype(cd), in_proj.astype(cd)) + in_bias.astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)

        if self.use_flash:
            from cse_tpu.ops.attention import flash_mhsa

            out = flash_mhsa(q, k, v)
        else:
            scale = 1.0 / math.sqrt(hd)
            sd = self.softmax_dtype
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(sd) * jnp.asarray(
                scale, sd
            )
            probs = jax.nn.softmax(logits, axis=-1).astype(cd)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return jnp.dot(out, out_proj.astype(cd)) + out_bias.astype(cd)


class TransformerEncoderLayer(nn.Module):
    """Pre-LN encoder layer: LN->MHA->+res, LN->FFN(relu)->+res (eps 1e-6)."""

    d_model: int
    nhead: int
    d_ffn: int
    compute_dtype: Any = jnp.float32
    use_flash: bool = False
    softmax_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cd = self.compute_dtype
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        x = x + MultiHeadSelfAttention(
            self.d_model, self.nhead, cd, self.use_flash, self.softmax_dtype,
            name="self_att",
        )(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(self.d_ffn, dtype=cd, name="ffn_1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=cd, name="ffn_2")(h)
        return x + h


class TransformerStack(nn.Module):
    """PE + N pre-LN layers + final LayerNorm (the reference's
    SBTransformerBlock_CSE, ``CSE_transformer.py:11-106,109-250``)."""

    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int
    pe_max_len: int = 2500
    compute_dtype: Any = jnp.float32
    use_flash: bool = False
    remat_layers: bool = False
    softmax_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        L = x.shape[1]
        pe = sinusoidal_pe(self.pe_max_len, self.d_model)[:L]
        x = x + pe[None, :, :].astype(x.dtype)
        layer_cls = (
            nn.remat(TransformerEncoderLayer)
            if self.remat_layers
            else TransformerEncoderLayer
        )
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model,
                self.nhead,
                self.d_ffn,
                self.compute_dtype,
                self.use_flash,
                self.softmax_dtype,
                name=f"layer_{i}",
            )(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)


class GroupNorm1(nn.Module):
    """GroupNorm with a single group, eps 1e-8: per-sample stats over all
    non-batch dims, per-channel affine (the reference's select_norm('ln'))."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-8)
        return (y * scale + bias).astype(x.dtype)


class DualComputationBlock(nn.Module):
    """One dual-path block: intra-chunk transformer (+skip) then inter-chunk.

    Context prompt tokens are prepended to both sequence views and stripped
    after the transformer; the inter output at the context position, mean-
    pooled over chunk index, feeds the ContSep selector
    (reference ``ContSep.py:453-532``).
    """

    cfg: SepformerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, ctx: jnp.ndarray | None):
        cfg = self.cfg
        B, S, K, N = x.shape
        tf_kw = dict(
            num_layers=cfg.num_tf_layers,
            d_model=cfg.d_model,
            nhead=cfg.nhead,
            d_ffn=cfg.d_ffn,
            pe_max_len=cfg.pe_max_len,
            compute_dtype=cfg.compute_dtype,
            softmax_dtype=cfg.softmax_dtype,
            use_flash=cfg.use_flash_attention,
            remat_layers=cfg.remat in ("layer", "nested"),
        )
        Tc = 0 if ctx is None else ctx.shape[1]

        # ---- intra: sequences within each chunk -> [B*S, Tc+K, N]
        intra = x.reshape(B * S, K, N)
        if ctx is not None:
            c = nn.Dense(cfg.d_model, dtype=cfg.compute_dtype, name="intra_context_mapper")(
                ctx.astype(cfg.compute_dtype)
            )  # [B, Tc, N]
            c = jnp.broadcast_to(c[:, None], (B, S, Tc, N)).reshape(B * S, Tc, N)
            intra = jnp.concatenate([c, intra.astype(c.dtype)], axis=1)
        intra = TransformerStack(name="intra_mdl", **tf_kw)(intra)
        intra = intra[:, Tc:].reshape(B, S, K, N)
        intra = GroupNorm1(cfg.d_model, name="intra_norm")(intra)
        intra = intra + x  # skip_around_intra=True

        # ---- inter: sequences across chunks -> [B*K, Tc+S, N]
        inter = intra.transpose(0, 2, 1, 3).reshape(B * K, S, N)
        if ctx is not None:
            c = nn.Dense(cfg.d_model, dtype=cfg.compute_dtype, name="inter_context_mapper")(
                ctx.astype(cfg.compute_dtype)
            )
            c = jnp.broadcast_to(c[:, None], (B, K, Tc, N)).reshape(B * K, Tc, N)
            inter = jnp.concatenate([c, inter.astype(c.dtype)], axis=1)
        inter = TransformerStack(name="inter_mdl", **tf_kw)(inter)
        # selector feature: output at position 0 (the ctx token), mean over K
        pred_head = inter[:, 0].reshape(B, K, N).mean(axis=1)
        inter = inter[:, Tc:].reshape(B, K, S, N).transpose(0, 2, 1, 3)
        inter = GroupNorm1(cfg.d_model, name="inter_norm")(inter)
        return inter + intra, pred_head


class DualPathModel(nn.Module):
    """Mask network: norm -> 1x1 -> segment -> dual blocks -> mask heads.

    Returns (masks [B, spk, L, N], pred_head [B, N]). Mirrors the reference
    ``Dual_Path_Model_CSE.forward`` (``ContSep.py:205-268``) in channels-last.
    """

    cfg: SepformerConfig

    @nn.compact
    def __call__(self, w: jnp.ndarray, ctx: jnp.ndarray | None):
        cfg = self.cfg
        B, L, N = w.shape
        x = GroupNorm1(N, name="norm")(w)
        x = nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.compute_dtype, name="conv1d")(
            x.astype(cfg.compute_dtype)
        )
        x, gap = segment(x, cfg.chunk_size)  # [B, S, K, N]
        pred_head = None
        block_cls = (
            nn.remat(DualComputationBlock)
            if cfg.remat in (True, "block", "nested")
            else DualComputationBlock
        )
        for i in range(cfg.num_dp_layers):
            x, pred_head = block_cls(cfg, name=f"dual_mdl_{i}")(x, ctx)
        # PReLU (single shared slope, torch default init 0.25)
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (1,), jnp.float32)
        x = jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
        x = nn.Dense(cfg.d_model * cfg.num_spks, dtype=cfg.compute_dtype, name="conv2d")(x)
        B_, S, K, _ = x.shape
        # [B, S, K, spk, N] -> [B*spk, S, K, N]
        x = x.reshape(B, S, K, cfg.num_spks, cfg.d_model)
        x = x.transpose(0, 3, 1, 2, 4).reshape(B * cfg.num_spks, S, K, cfg.d_model)
        x = overlap_add(x, gap)  # [B*spk, L, N]
        gate_in = x
        x = jnp.tanh(nn.Dense(cfg.d_model, dtype=cfg.compute_dtype, name="output")(gate_in))
        x = x * jax.nn.sigmoid(
            nn.Dense(cfg.d_model, dtype=cfg.compute_dtype, name="output_gate")(gate_in)
        )
        x = nn.Dense(N, use_bias=False, dtype=cfg.compute_dtype, name="end_conv1x1")(x)
        x = nn.relu(x)
        masks = x.reshape(B, cfg.num_spks, L, N)
        return masks, pred_head


class Sepformer(nn.Module):
    """Full separator. Input mix [B, T]; see variant table in module docstring.

    Returns:
      base:     est_source [B, T, spk]
      contsep:  (est_source [B, T, spk], ctx_logits [B, 1|spk])
      context:  est_source [B, T, 1]
    """

    cfg: SepformerConfig

    @nn.compact
    def __call__(
        self,
        mix: jnp.ndarray,
        ctx: jnp.ndarray | None = None,
        se: jnp.ndarray | None = None,
        cue_index: jnp.ndarray | None = None,
    ):
        cfg = self.cfg
        B, T = mix.shape
        cd = cfg.compute_dtype

        # ---- encoder: Conv1d(1->N, k=16, s=8, no bias) + ReLU
        w = nn.Conv(
            cfg.enc_channels,
            (cfg.enc_kernel,),
            strides=(cfg.enc_stride,),
            padding="VALID",
            use_bias=False,
            dtype=cd,
            name="encoder",
        )(mix[:, :, None].astype(cd))
        w = nn.relu(w)  # [B, L, N]
        L = w.shape[1]

        # ---- H-ContExt cue fusion (reference ContExt.py:96-111)
        if cfg.add_se and ctx is not None:
            assert se is not None and cue_index is not None
            se_emb = nn.Dense(cfg.llm_dim, dtype=cd, name="se_embedding")(
                se.astype(cd)
            )  # [B, 1, llm_dim]
            joint = jnp.concatenate([ctx.astype(cd), se_emb], axis=1)
            history = jnp.concatenate([ctx.astype(cd), jnp.zeros_like(ctx, cd)], axis=1)
            voice = jnp.concatenate([jnp.zeros_like(se_emb), se_emb], axis=1)
            opts = jnp.stack([joint, history, voice])  # [3, B, 2, llm_dim]
            ctx = opts[cue_index] if cue_index.ndim == 0 else jnp.take_along_axis(
                opts, cue_index[None, :, None, None], axis=0
            )[0]

        masks, pred_head = DualPathModel(cfg, name="masknet")(
            w, ctx if cfg.add_ctx else None
        )

        if cfg.variant == "context":
            streams = [0]  # extraction: only est_mask[0] is decoded
        else:
            streams = list(range(cfg.num_spks))

        dec = nn.ConvTranspose(
            1,
            (cfg.enc_kernel,),
            strides=(cfg.enc_stride,),
            padding="VALID",
            use_bias=False,
            dtype=cd,
            name="decoder",
        )
        outs = []
        for s in streams:
            sep_h = w * masks[:, s]
            outs.append(dec(sep_h)[:, :, 0])
        est = jnp.stack(outs, axis=-1)  # [B, T', n_streams]

        # length fix (reference ContSep.py:90-95)
        T_est = est.shape[1]
        if T > T_est:
            est = jnp.pad(est, ((0, 0), (0, T - T_est), (0, 0)))
        else:
            est = est[:, :T]
        est = est.astype(jnp.float32)

        if cfg.variant == "contsep":
            n_out = 1 if (cfg.num_spks == 2 and not cfg.ce) else cfg.num_spks
            logits = nn.Dense(n_out, dtype=jnp.float32, name="context_selector")(
                pred_head.astype(jnp.float32)
            )
            return est, logits
        return est


def build_sepformer(
    variant: str = "base",
    num_spks: int = 2,
    ce: bool = True,
    add_se: bool = False,
    compute_dtype=jnp.float32,
    use_flash_attention: bool = False,
    **overrides,
) -> Sepformer:
    cfg = SepformerConfig(
        num_spks=num_spks,
        variant=variant,
        ce=ce,
        add_se=add_se,
        compute_dtype=compute_dtype,
        use_flash_attention=use_flash_attention,
        **overrides,
    )
    return Sepformer(cfg)
