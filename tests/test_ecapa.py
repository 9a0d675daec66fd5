"""ECAPA-TDNN: numerical parity vs a compact torch oracle (speechbrain
architecture + key layout, reference ``train_HContExt.py:165-171``), plus
shape/invariant tests and importer key-mapping roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from cse_tpu.models.ecapa import (
    EcapaEncoder,
    ecapa_forward,
    ecapa_from_state_dict,
    log_mel_fbank,
    random_ecapa_params,
)

# ---------------------------------------------------------------------------
# compact torch oracle: speechbrain Fbank + ECAPA_TDNN semantics and key names
# (same methodology as the Sepformer oracle in test_model_parity.py)
# ---------------------------------------------------------------------------


def _torch_fbank(wav: torch.Tensor, n_mels: int = 80) -> torch.Tensor:
    """speechbrain Fbank: centered constant-pad STFT (periodic hamming,
    25/10 ms), power spectrum, symmetric mel triangles (speechbrain
    Filterbank's slope construction), 10*log10 amin=1e-10, top_db=80,
    then sentence mean-norm (InputNormalization, std off)."""
    stft = torch.stft(
        wav, n_fft=400, hop_length=160, win_length=400,
        window=torch.hamming_window(400), center=True, pad_mode="constant",
        normalized=False, onesided=True, return_complex=True,
    )
    power = (stft.real**2 + stft.imag**2).transpose(1, 2)  # [B, frames, freq]

    all_freqs = torch.linspace(0, 8000, 201)
    to_mel = lambda hz: 2595 * torch.log10(1 + hz / 700)
    to_hz = lambda mel: 700 * (10 ** (mel / 2595) - 1)
    mel = torch.linspace(to_mel(torch.tensor(0.0)), to_mel(torch.tensor(8000.0)), n_mels + 2)
    hz = to_hz(mel)
    band = (hz[1:] - hz[:-1])[:-1]
    f_central = hz[1:-1]
    slope = (all_freqs[None, :] - f_central[:, None]) / band[:, None]
    fb = torch.clamp(torch.min(slope + 1.0, 1.0 - slope), min=0.0)  # [mel, freq]

    x = power @ fb.T
    x_db = 10.0 * torch.log10(torch.clamp(x, min=1e-10))
    x_db = torch.max(x_db, x_db.amax(dim=(1, 2), keepdim=True) - 80.0)
    return x_db - x_db.mean(dim=1, keepdim=True)


class _Conv(nn.Module):  # speechbrain Conv1d wrapper -> ".conv" child
    def __init__(self, cin, cout, k, dilation=1):
        super().__init__()
        self.conv = nn.Conv1d(cin, cout, k, dilation=dilation,
                              padding=(k - 1) * dilation // 2)


class _BN(nn.Module):  # speechbrain BatchNorm1d wrapper -> ".norm" child
    def __init__(self, c):
        super().__init__()
        self.norm = nn.BatchNorm1d(c)


class _TDNN(nn.Module):  # speechbrain TDNNBlock: conv -> ReLU -> BN
    def __init__(self, cin, cout, k, dilation=1):
        super().__init__()
        self.conv = _Conv(cin, cout, k, dilation)
        self.norm = _BN(cout)

    def forward(self, x):
        return self.norm.norm(F.relu(self.conv.conv(x)))


class _Res2Net(nn.Module):
    def __init__(self, C, scale, k, dilation):
        super().__init__()
        h = C // scale
        self.blocks = nn.ModuleList(
            [_TDNN(h, h, k, dilation) for _ in range(scale - 1)]
        )
        self.scale = scale

    def forward(self, x):
        y = []
        for i, xi in enumerate(torch.chunk(x, self.scale, dim=1)):
            if i == 0:
                yi = xi
            elif i == 1:
                yi = self.blocks[i - 1](xi)
            else:
                yi = self.blocks[i - 1](xi + yi)
            y.append(yi)
        return torch.cat(y, dim=1)


class _SE(nn.Module):
    def __init__(self, C, att):
        super().__init__()
        self.conv1 = _Conv(C, att, 1)
        self.conv2 = _Conv(att, C, 1)

    def forward(self, x):
        s = x.mean(dim=2, keepdim=True)
        s = torch.sigmoid(self.conv2.conv(F.relu(self.conv1.conv(s))))
        return x * s


class _SERes2Net(nn.Module):
    def __init__(self, C, scale, att, dilation):
        super().__init__()
        self.tdnn1 = _TDNN(C, C, 1)
        self.res2net_block = _Res2Net(C, scale, 3, dilation)
        self.tdnn2 = _TDNN(C, C, 1)
        self.se_block = _SE(C, att)

    def forward(self, x):
        r = x
        x = self.tdnn1(x)
        x = self.res2net_block(x)
        x = self.tdnn2(x)
        return self.se_block(x) + r


class _ASP(nn.Module):  # AttentiveStatisticsPooling, global_context=True
    def __init__(self, C, att, eps=1e-12):
        super().__init__()
        self.tdnn = _TDNN(C * 3, att, 1)
        self.conv = _Conv(att, C, 1)
        self.eps = eps

    def forward(self, x):  # [B, C, T]
        mean = x.mean(dim=2, keepdim=True)
        std = torch.sqrt(torch.clamp(x.var(dim=2, keepdim=True, unbiased=False), min=self.eps))
        glob = torch.cat([x, mean.expand_as(x), std.expand_as(x)], dim=1)
        a = self.conv.conv(torch.tanh(self.tdnn(glob)))
        a = torch.softmax(a, dim=2)
        mu = (a * x).sum(dim=2)
        sg = torch.sqrt(torch.clamp((a * x * x).sum(dim=2) - mu**2, min=self.eps))
        return torch.cat([mu, sg], dim=1).unsqueeze(2)  # [B, 2C, 1]


class _TorchEcapa(nn.Module):
    """speechbrain ECAPA_TDNN with the released checkpoint's key layout."""

    def __init__(self, n_mels=80, C=64, scale=8, att=32, emb=16):
        super().__init__()
        self.blocks = nn.ModuleList(
            [_TDNN(n_mels, C, 5)]
            + [_SERes2Net(C, scale, att, d) for d in (2, 3, 4)]
        )
        self.mfa = _TDNN(3 * C, 3 * C, 1)
        self.asp = _ASP(3 * C, att)
        self.asp_bn = _BN(6 * C)
        self.fc = _Conv(6 * C, emb, 1)

    def forward(self, feats):  # [B, T, n_mels]
        x = feats.transpose(1, 2)
        x = self.blocks[0](x)
        outs = []
        for blk in self.blocks[1:]:
            x = blk(x)
            outs.append(x)
        x = self.mfa(torch.cat(outs, dim=1))
        x = self.asp(x)
        x = self.asp_bn.norm(x)
        return self.fc.conv(x)[:, :, 0]  # [B, emb]


def _randomize_bn(model: nn.Module, g: torch.Generator):
    """Give BN layers non-trivial stats/affine so parity actually tests them."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm1d):
            c = m.num_features
            m.running_mean.copy_(torch.randn(c, generator=g) * 0.2)
            m.running_var.copy_(torch.rand(c, generator=g) * 0.5 + 0.5)
            m.weight.data.copy_(torch.rand(c, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(c, generator=g) * 0.1)


def test_fbank_matches_torch_oracle(rng):
    wav = (rng.standard_normal((2, 12000)) * 0.3).astype(np.float32)
    ours = np.asarray(log_mel_fbank(jnp.asarray(wav)))
    ref = _torch_fbank(torch.from_numpy(wav)).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_ecapa_matches_torch_oracle(rng):
    """Full chain wav -> fbank -> embedding vs the torch oracle <= 1e-4
    (VERDICT missing #4: same compact-oracle methodology as the Sepformer)."""
    torch.manual_seed(0)
    g = torch.Generator().manual_seed(1)
    model = _TorchEcapa()
    _randomize_bn(model, g)
    model.eval()

    wav = (rng.standard_normal((2, 12000)) * 0.3).astype(np.float32)
    with torch.no_grad():
        feats = _torch_fbank(torch.from_numpy(wav))
        ref = model(feats).numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, ecapa_from_state_dict(sd))
    ours = np.asarray(ecapa_forward(params, jnp.asarray(wav)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_fbank_shape_and_norm(rng):
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    f = log_mel_fbank(wav)
    # centered STFT: 1 + T//hop frames (speechbrain semantics)
    assert f.shape == (2, 1 + 16000 // 160, 80)
    np.testing.assert_allclose(np.asarray(f).mean(axis=1), 0.0, atol=1e-4)


def test_forward_shapes_small(rng):
    # scaled-down config for CPU speed
    params = random_ecapa_params(None, channels=64, emb=16)
    wav = jnp.asarray(rng.standard_normal((3, 8000)).astype(np.float32))
    emb = ecapa_forward(jax.tree.map(jnp.asarray, params), wav)
    assert emb.shape == (3, 16)
    assert np.isfinite(np.asarray(emb)).all()


def test_embedding_discriminative(rng):
    """Same-signal crops should be closer than different signals."""
    params = jax.tree.map(jnp.asarray, random_ecapa_params(None, channels=64, emb=16))
    t = np.arange(24000) / 16000
    a = np.sin(2 * np.pi * 120 * t).astype(np.float32)
    b = rng.standard_normal(24000).astype(np.float32)
    batch = jnp.asarray(np.stack([a[:16000], a[8000:24000], b[:16000]]))
    e = np.asarray(ecapa_forward(params, batch))
    e = e / np.linalg.norm(e, axis=-1, keepdims=True)
    same = float(e[0] @ e[1])
    diff = float(e[0] @ e[2])
    assert same > diff


def test_importer_roundtrip_shapes():
    """A synthetic speechbrain-style state_dict maps onto the param tree."""
    C, n_mels, emb, scale, att = 64, 80, 16, 8, 32
    hidden = C // scale
    sd = {}

    def add_tdnn(prefix, k, cin, cout):
        sd[f"{prefix}.conv.conv.weight"] = np.random.randn(cout, cin, k).astype(np.float32)
        sd[f"{prefix}.conv.conv.bias"] = np.zeros(cout, np.float32)
        for stat, val in (
            ("weight", np.ones(cout)), ("bias", np.zeros(cout)),
            ("running_mean", np.zeros(cout)), ("running_var", np.ones(cout)),
        ):
            sd[f"{prefix}.norm.norm.{stat}"] = val.astype(np.float32)

    add_tdnn("blocks.0", 5, n_mels, C)
    for li in range(1, 4):
        add_tdnn(f"blocks.{li}.tdnn1", 1, C, C)
        add_tdnn(f"blocks.{li}.tdnn2", 1, C, C)
        for i in range(scale - 1):
            add_tdnn(f"blocks.{li}.res2net_block.blocks.{i}", 3, hidden, hidden)
        sd[f"blocks.{li}.se_block.conv1.conv.weight"] = np.random.randn(att, C, 1).astype(np.float32)
        sd[f"blocks.{li}.se_block.conv1.conv.bias"] = np.zeros(att, np.float32)
        sd[f"blocks.{li}.se_block.conv2.conv.weight"] = np.random.randn(C, att, 1).astype(np.float32)
        sd[f"blocks.{li}.se_block.conv2.conv.bias"] = np.zeros(C, np.float32)
    cat = 3 * C
    add_tdnn("mfa", 1, cat, cat)
    add_tdnn("asp.tdnn", 1, cat * 3, att)
    sd["asp.conv.conv.weight"] = np.random.randn(cat, att, 1).astype(np.float32)
    sd["asp.conv.conv.bias"] = np.zeros(cat, np.float32)
    for stat, val in (
        ("weight", np.ones(cat * 2)), ("bias", np.zeros(cat * 2)),
        ("running_mean", np.zeros(cat * 2)), ("running_var", np.ones(cat * 2)),
    ):
        sd[f"asp_bn.norm.{stat}"] = val.astype(np.float32)
    sd["fc.conv.weight"] = np.random.randn(emb, cat * 2, 1).astype(np.float32)
    sd["fc.conv.bias"] = np.zeros(emb, np.float32)

    params = ecapa_from_state_dict(sd)
    enc = EcapaEncoder(params=params)
    out = enc(jnp.zeros((1, 8000)))
    assert out.shape == (1, 1, emb)


def test_length_masking_padding_invariance(rng):
    """With lengths given, the embedding of an utterance must be (nearly)
    independent of trailing zero-padding — the reference passes wav_lens to
    encode_batch (train_HContExt.py:367). Without lengths, padding visibly
    shifts the embedding (the bug this masking fixes)."""
    params = jax.tree.map(jnp.asarray, random_ecapa_params(None, channels=64, emb=16))
    n = 48000  # 3 s enrollment in the 5 s crop buffer (the train shape)
    wav = (rng.standard_normal(n) * 0.3).astype(np.float32)
    short = jnp.asarray(wav[None])
    padded = jnp.asarray(np.pad(wav, (0, 80000 - n))[None])

    e_ref = np.asarray(ecapa_forward(params, short, jnp.asarray([n])))[0]
    e_mask = np.asarray(ecapa_forward(params, padded, jnp.asarray([n])))[0]
    e_nomask = np.asarray(ecapa_forward(params, padded))[0]

    cos = lambda a, b: float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    d_masked = np.linalg.norm(e_mask - e_ref)
    d_unmasked = np.linalg.norm(e_nomask - e_ref)
    # residual boundary bleed comes from the (unmasked, as in speechbrain)
    # convs seeing silence frames; pooled stats must no longer depend on pad
    assert cos(e_mask, e_ref) > cos(e_nomask, e_ref)
    assert d_masked < 0.1 * d_unmasked, (d_masked, d_unmasked)


def test_configure_speaker_encoder_uses_real_ecapa(tmp_path, rng):
    """--ecapa_path wiring: a speechbrain-layout .ckpt routes encode_speaker
    through the real ECAPA port instead of the spectral stub."""
    from cse_tpu.models import speaker_encoder as se

    torch.manual_seed(0)
    model = _TorchEcapa()
    model.eval()
    path = str(tmp_path / "embedding_model.ckpt")
    torch.save(model.state_dict(), path)

    wav = jnp.asarray((rng.standard_normal((1, 8000)) * 0.3).astype(np.float32))
    lens = np.asarray([8000], np.int32)
    try:
        se.configure_speaker_encoder(path)
        got = np.asarray(se.encode_speaker(wav, lens))[:, 0]
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = jax.tree.map(jnp.asarray, ecapa_from_state_dict(sd))
        want = np.asarray(ecapa_forward(params, wav, jnp.asarray(lens)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    finally:
        se.configure_speaker_encoder(None)  # restore the stub for other tests
