"""Numerical parity: cse_tpu Sepformer vs a torch oracle with reference keys.

The oracle below is an independent, compact torch implementation of the
documented architecture (SURVEY.md §3.2), wired so its ``state_dict()`` uses
the *reference checkpoint key names*. Importing that state_dict through
``cse_tpu.compat.torch_import`` and matching outputs end-to-end validates both
the model math and the released-checkpoint import path at once.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from cse_tpu.compat.torch_import import (
    infer_reference_config,
    sepformer_from_state_dict,
)
from cse_tpu.models.sepformer import Sepformer, SepformerConfig, sinusoidal_pe

torch.manual_seed(0)

# ---- tiny hyperparams for fast tests -------------------------------------
D, H, FFN, NTF, NDP, K = 16, 4, 32, 2, 2, 10
ENC_K, ENC_S = 8, 4
CTX_DIM, SE_DIM = 24, 12


class _Wrap(nn.Module):
    """Single-child wrapper to reproduce nested reference key names."""

    def __init__(self, name, mod):
        super().__init__()
        setattr(self, name, mod)
        self._n = name

    def forward(self, *a, **k):
        return getattr(self, self._n)(*a, **k)


def _pe(length, d):
    pos = torch.arange(length, dtype=torch.float32)[:, None]
    div = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
    pe = torch.zeros(length, d)
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    return pe


class OracleLayer(nn.Module):
    def __init__(self):
        super().__init__()
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

    def __init__(self):
        super().__init__()
        inner = nn.Module()
        inner.layers = nn.ModuleList([OracleLayer() for _ in range(NTF)])
        inner.norm = _Wrap("norm", nn.LayerNorm(D, eps=1e-6))
        self.mdl = inner

    def forward(self, x):
        x = x + _pe(x.shape[1], D)[None]
        for layer in self.mdl.layers:
            x = layer(x)
        return self.mdl.norm(x)


class OracleDualBlock(nn.Module):
    def __init__(self, with_ctx):
        super().__init__()
        self.intra_mdl = OracleStack()
        self.inter_mdl = OracleStack()
        self.intra_norm = nn.GroupNorm(1, D, eps=1e-8)
        self.inter_norm = nn.GroupNorm(1, D, eps=1e-8)
        if with_ctx:
            self.intra_context_mapper = nn.Linear(CTX_DIM, D)
            self.inter_context_mapper = nn.Linear(CTX_DIM, D)

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
    def __init__(self, num_spks, with_ctx):
        super().__init__()
        self.num_spks = num_spks
        self.norm = nn.GroupNorm(1, D, eps=1e-8)
        self.conv1d = nn.Conv1d(D, D, 1, bias=False)
        self.dual_mdl = nn.ModuleList([OracleDualBlock(with_ctx) for _ in range(NDP)])
        self.conv2d = nn.Conv2d(D, D * num_spks, 1)
        self.prelu = nn.PReLU()
        self.output = nn.Sequential(nn.Conv1d(D, D, 1))
        self.output_gate = nn.Sequential(nn.Conv1d(D, D, 1))
        self.end_conv1x1 = nn.Conv1d(D, D, 1, bias=False)

    def forward(self, w, ctx):  # w: [B, N, L]
        B, N, L = w.shape
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
    def __init__(self, num_spks=2, variant="base", ce=True, add_se=False):
        super().__init__()
        self.variant, self.num_spks, self.ce, self.add_se = variant, num_spks, ce, add_se
        enc = nn.Module()
        enc.conv1d = nn.Conv1d(1, D, ENC_K, stride=ENC_S, bias=False)
        self.encoder = enc
        self.masknet = OracleMaskNet(num_spks, variant != "base")
        self.decoder = nn.ConvTranspose1d(D, 1, ENC_K, stride=ENC_S, bias=False)
        if variant == "contsep":
            self.context_selector = nn.Linear(D, 1 if (num_spks == 2 and not ce) else num_spks)
        if add_se:
            self.se_embedding = nn.Linear(SE_DIM, CTX_DIM)

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


def _cfg(**kw):
    return SepformerConfig(
        enc_channels=D,
        enc_kernel=ENC_K,
        enc_stride=ENC_S,
        d_model=D,
        nhead=H,
        d_ffn=FFN,
        num_tf_layers=NTF,
        num_dp_layers=NDP,
        chunk_size=K,
        llm_dim=CTX_DIM,
        se_dim=SE_DIM,
        pe_max_len=512,
        **kw,
    )


def _run_pair(oracle, cfg, mix, ctx=None, se=None, cue="joint", cue_index=None):
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = sepformer_from_state_dict(
        sd, num_dp_layers=cfg.num_dp_layers, num_tf_layers=cfg.num_tf_layers
    )
    model = Sepformer(cfg)
    args = dict(
        ctx=None if ctx is None else jnp.asarray(ctx.numpy()),
        se=None if se is None else jnp.asarray(se.numpy()),
        cue_index=cue_index,
    )
    ours = model.apply(params, jnp.asarray(mix.numpy()), **args)
    with torch.no_grad():
        ref = oracle(mix, ctx, se, cue)
    return ours, ref


def test_pe_matches():
    ours = np.asarray(sinusoidal_pe(64, D))
    ref = _pe(64, D).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_base_parity():
    torch.manual_seed(1)
    oracle = OracleSepformer(num_spks=2, variant="base").eval()
    mix = torch.randn(2, 200)
    ours, ref = _run_pair(oracle, _cfg(num_spks=2, variant="base"), mix)
    assert ours.shape == (2, 200, 2)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ce,num_spks", [(False, 2), (True, 2), (True, 3)])
def test_contsep_parity(ce, num_spks):
    torch.manual_seed(2)
    oracle = OracleSepformer(num_spks=num_spks, variant="contsep", ce=ce).eval()
    mix = torch.randn(2, 200)
    ctx = torch.randn(2, 1, CTX_DIM)
    (ours, logits), (ref, ref_logits) = _run_pair(
        oracle, _cfg(num_spks=num_spks, variant="contsep", ce=ce), mix, ctx
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), rtol=1e-4, atol=1e-5)


def test_context_parity():
    torch.manual_seed(3)
    oracle = OracleSepformer(num_spks=2, variant="context").eval()
    mix = torch.randn(2, 200)
    ctx = torch.randn(2, 2, CTX_DIM)  # multi-token ctx (--ctx_length > 1)
    ours, ref = _run_pair(oracle, _cfg(num_spks=2, variant="context"), mix, ctx)
    assert ours.shape == (2, 200, 1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cue,idx", [("joint", 0), ("history", 1), ("voice", 2)])
def test_hcontext_cue_parity(cue, idx):
    torch.manual_seed(4)
    oracle = OracleSepformer(num_spks=2, variant="context", add_se=True).eval()
    mix = torch.randn(1, 200)
    ctx = torch.randn(1, 1, CTX_DIM)
    se = torch.randn(1, 1, SE_DIM)
    ours, ref = _run_pair(
        oracle,
        _cfg(num_spks=2, variant="context", add_se=True),
        mix,
        ctx,
        se,
        cue,
        cue_index=jnp.asarray(idx),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_infer_reference_config():
    oracle = OracleSepformer(num_spks=3, variant="contsep", ce=True)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    cfg = infer_reference_config(sd)
    assert cfg == dict(
        num_spks=3, num_dp_layers=NDP, num_tf_layers=NTF,
        variant="contsep", ce=True, add_se=False,
    )
