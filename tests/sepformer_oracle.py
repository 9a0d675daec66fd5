"""Compact torch Sepformer oracle with reference checkpoint key names.

An independent torch implementation of the documented architecture
(SURVEY.md §3.2, reference ``src/models/ContSep.py`` / ``ContExt.py``),
parameterizable from tiny test dims up to the full released-checkpoint
hyperparameters (``src/models/ContSep.py:10-40``: enc 256/k16/s8, d_model
256, 8 heads, ffn 1024, 8 TF layers, 2 DP blocks, K=250, llm_dim 4096).
Its ``state_dict()`` uses the reference key names, so running it against
``cse_tpu.compat.torch_import`` validates model math and checkpoint
import/export in one shot.
"""

from __future__ import annotations

import dataclasses
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


@dataclasses.dataclass(frozen=True)
class OracleDims:
    d_model: int = 16
    nhead: int = 4
    d_ffn: int = 32
    num_tf_layers: int = 2
    num_dp_layers: int = 2
    chunk: int = 10
    enc_kernel: int = 8
    enc_stride: int = 4
    ctx_dim: int = 24
    se_dim: int = 12


TINY = OracleDims()

# the released checkpoints' hyperparameters (reference src/models/ContSep.py:10-40)
FULL = OracleDims(
    d_model=256, nhead=8, d_ffn=1024, num_tf_layers=8, num_dp_layers=2,
    chunk=250, enc_kernel=16, enc_stride=8, ctx_dim=4096, se_dim=192,
)


class _Wrap(nn.Module):
    """Single-child wrapper to reproduce nested reference key names."""

    def __init__(self, name, mod):
        super().__init__()
        setattr(self, name, mod)
        self._n = name

    def forward(self, *a, **k):
        return getattr(self, self._n)(*a, **k)


def torch_pe(length, d):
    pos = torch.arange(length, dtype=torch.float32)[:, None]
    div = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
    pe = torch.zeros(length, d)
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    return pe


class OracleLayer(nn.Module):
    def __init__(self, dm: OracleDims):
        super().__init__()
        D, H, FFN = dm.d_model, dm.nhead, dm.d_ffn
        self.self_att = _Wrap("att", nn.MultiheadAttention(D, H, batch_first=True))
        self.norm1 = _Wrap("norm", nn.LayerNorm(D, eps=1e-6))
        self.norm2 = _Wrap("norm", nn.LayerNorm(D, eps=1e-6))
        self.pos_ffn = _Wrap(
            "ffn",
            nn.Sequential(nn.Linear(D, FFN), nn.ReLU(), nn.Dropout(0.0), nn.Linear(FFN, D)),
        )

    def forward(self, x):
        h = self.norm1(x)
        a, _ = self.self_att.att(h, h, h, need_weights=False)
        x = x + a
        return x + self.pos_ffn(self.norm2(x))


class OracleStack(nn.Module):
    """Keys: mdl.layers.{j}.*, mdl.norm.norm.*  (pos enc is parameter-free)."""

    def __init__(self, dm: OracleDims):
        super().__init__()
        inner = nn.Module()
        inner.layers = nn.ModuleList([OracleLayer(dm) for _ in range(dm.num_tf_layers)])
        inner.norm = _Wrap("norm", nn.LayerNorm(dm.d_model, eps=1e-6))
        self.mdl = inner
        self._d = dm.d_model

    def forward(self, x):
        x = x + torch_pe(x.shape[1], self._d)[None]
        for layer in self.mdl.layers:
            x = layer(x)
        return self.mdl.norm(x)


class OracleDualBlock(nn.Module):
    def __init__(self, dm: OracleDims, with_ctx):
        super().__init__()
        D = dm.d_model
        self.intra_mdl = OracleStack(dm)
        self.inter_mdl = OracleStack(dm)
        self.intra_norm = nn.GroupNorm(1, D, eps=1e-8)
        self.inter_norm = nn.GroupNorm(1, D, eps=1e-8)
        if with_ctx:
            self.intra_context_mapper = nn.Linear(dm.ctx_dim, D)
            self.inter_context_mapper = nn.Linear(dm.ctx_dim, D)

    def forward(self, x, ctx):  # x: [B, N, K, S]
        B, N, Kc, S = x.shape
        Tc = 0 if ctx is None else ctx.shape[1]
        intra = x.permute(0, 3, 2, 1).reshape(B * S, Kc, N)
        if ctx is not None:
            c = self.intra_context_mapper(ctx)
            intra = torch.cat(
                [c[:, None].expand(B, S, Tc, N).reshape(B * S, Tc, N), intra], 1
            )
        intra = self.intra_mdl(intra)[:, Tc:]
        intra = intra.reshape(B, S, Kc, N).permute(0, 3, 2, 1)
        intra = self.intra_norm(intra) + x

        inter = intra.permute(0, 2, 3, 1).reshape(B * Kc, S, N)
        if ctx is not None:
            c = self.inter_context_mapper(ctx)
            inter = torch.cat(
                [c[:, None].expand(B, Kc, Tc, N).reshape(B * Kc, Tc, N), inter], 1
            )
        inter = self.inter_mdl(inter)
        pred_head = inter[:, 0].reshape(B, Kc, N).mean(1)
        inter = inter[:, Tc:].reshape(B, Kc, S, N).permute(0, 3, 1, 2)
        return self.inter_norm(inter) + intra, pred_head


class OracleMaskNet(nn.Module):
    def __init__(self, dm: OracleDims, num_spks, with_ctx):
        super().__init__()
        D, K = dm.d_model, dm.chunk
        self.num_spks = num_spks
        self._k = K
        self.norm = nn.GroupNorm(1, D, eps=1e-8)
        self.conv1d = nn.Conv1d(D, D, 1, bias=False)
        self.dual_mdl = nn.ModuleList(
            [OracleDualBlock(dm, with_ctx) for _ in range(dm.num_dp_layers)]
        )
        self.conv2d = nn.Conv2d(D, D * num_spks, 1)
        self.prelu = nn.PReLU()
        self.output = nn.Sequential(nn.Conv1d(D, D, 1))
        self.output_gate = nn.Sequential(nn.Conv1d(D, D, 1))
        self.end_conv1x1 = nn.Conv1d(D, D, 1, bias=False)

    def forward(self, w, ctx):  # w: [B, N, L]
        B, N, L = w.shape
        K = self._k
        x = self.conv1d(self.norm(w))
        # segmentation via sliding windows (hop P) of the padded signal
        P = K // 2
        gap = K - (P + L % K) % K
        x = F.pad(x, (P, gap + P))
        x = x.unfold(2, K, P)  # [B, N, S, K]
        x = x.permute(0, 1, 3, 2)  # [B, N, K, S]
        for blk in self.dual_mdl:
            x, pred_head = blk(x, ctx)
        x = self.prelu(x)
        x = self.conv2d(x)  # [B, N*spk, K, S]
        B_, _, Kc, S = x.shape
        x = x.reshape(B * self.num_spks, N, Kc, S)
        # overlap-add via fold
        Lp = L + gap + 2 * P
        x = F.fold(
            x.permute(0, 1, 2, 3).reshape(B * self.num_spks, N * K, S),
            output_size=(1, Lp),
            kernel_size=(1, K),
            stride=(1, P),
        ).reshape(B * self.num_spks, N, Lp)
        x = x[:, :, P : P + L]
        x = torch.tanh(self.output(x)) * torch.sigmoid(self.output_gate(x))
        x = F.relu(self.end_conv1x1(x)).reshape(B, self.num_spks, N, L)
        return x, pred_head


class OracleSepformer(nn.Module):
    def __init__(self, dm: OracleDims = TINY, num_spks=2, variant="base",
                 ce=True, add_se=False):
        super().__init__()
        self.dm = dm
        self.variant, self.num_spks, self.ce, self.add_se = variant, num_spks, ce, add_se
        D = dm.d_model
        enc = nn.Module()
        enc.conv1d = nn.Conv1d(1, D, dm.enc_kernel, stride=dm.enc_stride, bias=False)
        self.encoder = enc
        self.masknet = OracleMaskNet(dm, num_spks, variant != "base")
        self.decoder = nn.ConvTranspose1d(D, 1, dm.enc_kernel, stride=dm.enc_stride, bias=False)
        if variant == "contsep":
            self.context_selector = nn.Linear(D, 1 if (num_spks == 2 and not ce) else num_spks)
        if add_se:
            self.se_embedding = nn.Linear(dm.se_dim, dm.ctx_dim)

    def forward(self, mix, ctx=None, se=None, cue="joint"):
        w = F.relu(self.encoder.conv1d(mix[:, None]))  # [B, N, L]
        if self.add_se and ctx is not None:
            se_e = self.se_embedding(se)
            if cue == "joint":
                ctx = torch.cat([ctx, se_e], 1)
            elif cue == "history":
                ctx = torch.cat([ctx, torch.zeros_like(ctx)], 1)
            else:
                ctx = torch.cat([torch.zeros_like(se_e), se_e], 1)
        masks, pred_head = self.masknet(w, ctx if self.variant != "base" else None)
        streams = [0] if self.variant == "context" else list(range(self.num_spks))
        outs = [self.decoder(w * masks[:, s]).squeeze(1) for s in streams]
        est = torch.stack(outs, -1)
        T = mix.shape[1]
        est = F.pad(est, (0, 0, 0, max(0, T - est.shape[1])))[:, :T]
        if self.variant == "contsep":
            return est, self.context_selector(pred_head)
        return est
