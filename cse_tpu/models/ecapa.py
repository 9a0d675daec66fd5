"""ECAPA-TDNN speaker encoder in JAX (H-ContExt's enrollment-cue network).

The reference uses a frozen speechbrain ``EncoderClassifier``
(``spkrec-ecapa-voxceleb``) producing 192-d speaker embeddings
(``train_HContExt.py:165-171,367``). This is a from-scratch JAX
implementation of that published architecture (Desplanques et al. 2020):

  fbank(80 mel, 25 ms / 10 ms) -> per-utterance mean norm
  -> TDNN(k5, 1024) -> 3x SE-Res2Net blocks (k3, dil 2/3/4, scale 8)
  -> concat -> TDNN(k1, 3072) -> attentive statistics pooling (global ctx)
  -> BN -> linear 6144 -> 192

Inference-only (the cue network is frozen); channels-last, bf16-able. A
weight importer maps the released speechbrain ``embedding_model.ckpt``
torch state_dict onto this tree; without those weights the framework falls
back to the spectral stub in cse_tpu.models.speaker_encoder.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# features: 80-mel log filterbank, 25 ms window / 10 ms hop @ 16 kHz
# ---------------------------------------------------------------------------


@lru_cache(maxsize=4)
def _mel_matrix(n_mels=80, n_fft=400, sr=16000, f_min=0.0, f_max=8000.0):
    """speechbrain-style triangular filterbank [n_fft//2+1, n_mels].

    speechbrain's Filterbank builds SYMMETRIC triangles: filter m is centered
    at hz[m+1] with HALF-WIDTH band[m] = hz[m+1]-hz[m] on BOTH sides (the
    left mel gap), peak 1.0, no area normalization — distinct from the
    classic asymmetric HTK triangle and from librosa's slaney filters.
    """

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    all_freqs = np.linspace(0.0, sr // 2, n_fft // 2 + 1)
    hz = mel_to_hz(np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2))
    f_central = hz[1:-1]  # [n_mels]
    band = (hz[1:] - hz[:-1])[:n_mels]  # left gap per filter
    slope = (all_freqs[None, :] - f_central[:, None]) / band[:, None]
    fb = np.maximum(0.0, np.minimum(slope + 1.0, 1.0 - slope))
    return fb.T.astype(np.float32)  # [freq, n_mels]


ECAPA_HOP = 160


def frame_mask(n_frames: int, lengths: jnp.ndarray | None) -> jnp.ndarray | None:
    """[B, n_frames, 1] validity mask from sample lengths (None = all valid)."""
    if lengths is None:
        return None
    valid = jnp.minimum(1 + lengths // ECAPA_HOP, n_frames)  # frames per row
    return (jnp.arange(n_frames)[None, :] < valid[:, None])[..., None]


def _masked_mean(x, mask, axis=1, keepdims=True, eps=1e-12):
    if mask is None:
        return x.mean(axis=axis, keepdims=keepdims)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis, keepdims=keepdims) / jnp.maximum(
        jnp.sum(m, axis=axis, keepdims=keepdims), eps
    )


def log_mel_fbank(
    wav: jnp.ndarray, n_mels: int = 80, top_db: float = 80.0,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B, T] @16k -> [B, 1+T//hop, n_mels] log-mel features, mean-normed.

    Reproduces the speechbrain Fbank -> InputNormalization(sentence, no std)
    chain the reference's EncoderClassifier runs before the ECAPA net
    (``train_HContExt.py:165-171``): centered STFT (constant pad, periodic
    hamming window, 25 ms / 10 ms), power spectrum, symmetric mel triangles,
    10*log10 with amin=1e-10, per-utterance top_db clamp, then sentence-level
    mean subtraction over the VALID frames (the reference passes ``wav_lens``
    to ``encode_batch``, so padding must not shift the mean).
    """
    win, hop, n_fft = 400, ECAPA_HOP, 400
    B, T = wav.shape
    n_frames = 1 + T // hop
    wav = jnp.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)))  # center, constant
    idx = jnp.arange(win)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = wav[:, idx]  # [B, F, win]
    window = jnp.asarray(np.hamming(win + 1)[:-1].astype(np.float32))  # periodic
    spec = jnp.fft.rfft(frames * window[None, None, :], n=n_fft, axis=-1)
    power = (spec.real**2 + spec.imag**2).astype(jnp.float32)
    mel = power @ jnp.asarray(_mel_matrix(n_mels, n_fft))
    logmel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    logmel = jnp.maximum(
        logmel, logmel.max(axis=(1, 2), keepdims=True) - top_db
    )
    # per-utterance mean normalization (speechbrain mean_var_norm, std off)
    return logmel - _masked_mean(logmel, frame_mask(n_frames, lengths))


# ---------------------------------------------------------------------------
# blocks (params are plain dicts for a clean torch-importer mapping)
# ---------------------------------------------------------------------------


def _conv1d(x, w, b=None, dilation=1):
    """x [B, T, Cin], w [k, Cin, Cout] 'same'-padded dilated conv."""
    k = w.shape[0]
    pad = (k - 1) * dilation // 2
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out + b if b is not None else out


def _bn(x, p):
    inv = jax.lax.rsqrt(p["var"] + 1e-5)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _tdnn(x, p, dilation=1):
    return _bn(jax.nn.relu(_conv1d(x, p["w"], p["b"], dilation)), p["bn"])


def _se(x, p, mask=None):
    s = _masked_mean(x, mask)  # [B, 1, C] over valid frames (speechbrain SE)
    s = jax.nn.relu(_conv1d(s, p["w1"], p["b1"]))
    s = jax.nn.sigmoid(_conv1d(s, p["w2"], p["b2"]))
    return x * s


def _res2net(x, p, scale, dilation):
    chunks = jnp.split(x, scale, axis=-1)
    outs = [chunks[0]]
    y = None
    for i in range(1, scale):
        xi = chunks[i] if y is None else chunks[i] + y
        y = _tdnn(xi, p[f"block_{i-1}"], dilation)
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def _se_res2net(x, p, scale, dilation, mask=None):
    r = x
    x = _tdnn(x, p["tdnn1"], 1)
    x = _res2net(x, p["res2net"], scale, dilation)
    x = _tdnn(x, p["tdnn2"], 1)
    x = _se(x, p["se"], mask)
    return x + r


def _asp(x, p, mask=None, eps=1e-12):
    """Attentive statistics pooling with global context. x: [B, T, C].

    speechbrain AttentiveStatisticsPooling semantics (global_context=True,
    eps=1e-12): biased time stats, TDNN->tanh->conv attention, softmax over
    time (masked to the valid frames), attention-weighted mean/std.
    """
    B, T, C = x.shape
    mean = _masked_mean(x, mask)
    var = _masked_mean((x - mean) ** 2, mask)
    std = jnp.sqrt(jnp.clip(var, eps))
    glob = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], -1
    )
    a = jnp.tanh(_bn(jax.nn.relu(_conv1d(glob, p["tdnn"]["w"], p["tdnn"]["b"])), p["tdnn"]["bn"]))
    a = _conv1d(a, p["w"], p["b"])  # [B, T, C]
    if mask is not None:
        a = jnp.where(mask, a, -jnp.inf)
    a = jax.nn.softmax(a, axis=1)
    mu = jnp.sum(a * x, axis=1)
    sg = jnp.sqrt(jnp.clip(jnp.sum(a * x * x, axis=1) - mu * mu, eps))
    return jnp.concatenate([mu, sg], axis=-1)  # [B, 2C]


def ecapa_forward(
    params: dict, wav: jnp.ndarray, lengths: jnp.ndarray | None = None
) -> jnp.ndarray:
    """[B, T] 16 kHz waveform (+ per-row valid sample counts) -> [B, 192].

    ``lengths`` mirrors the reference's ``encode_batch(..., wav_lens=...)``
    (``train_HContExt.py:367``): zero-padded tails are excluded from the
    fbank mean-norm, SE means, and attentive-statistics pooling so the
    embedding of an utterance does not depend on how much it was padded.
    """
    feats = log_mel_fbank(wav, lengths=lengths)
    mask = frame_mask(feats.shape[1], lengths)
    x = _tdnn(feats, params["layer1"], 1)
    outs = []
    for i, dil in enumerate((2, 3, 4)):
        x = _se_res2net(x, params[f"layer{i+2}"], scale=8, dilation=dil, mask=mask)
        outs.append(x)
    x = jnp.concatenate(outs, axis=-1)  # MFA concat [B, T, 3072]
    x = _tdnn(x, params["mfa"], 1)  # full TDNN block: conv + ReLU + BN
    x = _asp(x, params["asp"], mask)
    x = _bn(x[:, None, :], params["asp_bn"])[:, 0]
    emb = (x[:, None, :] @ params["fc"]["w"])[:, 0] + params["fc"]["b"]
    return emb


# ---------------------------------------------------------------------------
# speechbrain checkpoint importer
# ---------------------------------------------------------------------------


def _cv(w):  # torch conv [out, in, k] -> [k, in, out]
    return np.asarray(w, np.float32).transpose(2, 1, 0)


def _bn_params(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }


def _tdnn_params(sd, prefix):
    return {
        "w": _cv(sd[f"{prefix}.conv.conv.weight"]),
        "b": np.asarray(sd[f"{prefix}.conv.conv.bias"], np.float32),
        "bn": _bn_params(sd, f"{prefix}.norm.norm"),
    }


def ecapa_from_state_dict(sd: dict) -> dict:
    """Map the released speechbrain ECAPA ``embedding_model.ckpt`` state_dict
    (blocks.0..4 + mfa/asp/fc layout of speechbrain.lobes.models.ECAPA_TDNN)
    onto this module's param tree."""
    p: dict = {"layer1": _tdnn_params(sd, "blocks.0")}
    for li in range(3):
        bp = f"blocks.{li+1}"
        layer = {
            "tdnn1": _tdnn_params(sd, f"{bp}.tdnn1"),
            "tdnn2": _tdnn_params(sd, f"{bp}.tdnn2"),
            "se": {
                "w1": _cv(sd[f"{bp}.se_block.conv1.conv.weight"]),
                "b1": np.asarray(sd[f"{bp}.se_block.conv1.conv.bias"], np.float32),
                "w2": _cv(sd[f"{bp}.se_block.conv2.conv.weight"]),
                "b2": np.asarray(sd[f"{bp}.se_block.conv2.conv.bias"], np.float32),
            },
            "res2net": {
                f"block_{i}": _tdnn_params(sd, f"{bp}.res2net_block.blocks.{i}")
                for i in range(7)
            },
        }
        p[f"layer{li+2}"] = layer
    p["mfa"] = _tdnn_params(sd, "mfa")  # conv + ReLU + BN (speechbrain TDNNBlock)
    p["asp"] = {
        "tdnn": _tdnn_params(sd, "asp.tdnn"),
        "w": _cv(sd["asp.conv.conv.weight"]),
        "b": np.asarray(sd["asp.conv.conv.bias"], np.float32),
    }
    p["asp_bn"] = _bn_params(sd, "asp_bn.norm")
    # fc is a bare speechbrain Conv1d (keys fc.conv.*, unlike the TDNN blocks'
    # fc.conv.conv.*): k=1 conv [192, 6144, 1] -> dense [6144, 192] (+ bias)
    p["fc"] = {
        "w": np.asarray(sd["fc.conv.weight"], np.float32)[:, :, 0].T,
        "b": np.asarray(sd["fc.conv.bias"], np.float32),
    }
    return p


def random_ecapa_params(key, channels=1024, n_mels=80, emb=192, scale=8) -> dict:
    """Random-init params (for tests / smoke; real use imports the ckpt)."""
    rng = np.random.default_rng(0)

    def conv(k, cin, cout):
        return {
            "w": (rng.standard_normal((k, cin, cout)) * (1 / math.sqrt(k * cin))).astype(np.float32),
            "b": np.zeros(cout, np.float32),
            "bn": {
                "scale": np.ones(cout, np.float32),
                "bias": np.zeros(cout, np.float32),
                "mean": np.zeros(cout, np.float32),
                "var": np.ones(cout, np.float32),
            },
        }

    def se(c, sc=128):
        return {
            "w1": (rng.standard_normal((1, c, sc)) * 0.03).astype(np.float32),
            "b1": np.zeros(sc, np.float32),
            "w2": (rng.standard_normal((1, sc, c)) * 0.03).astype(np.float32),
            "b2": np.zeros(c, np.float32),
        }

    hidden = channels // scale
    p = {"layer1": conv(5, n_mels, channels)}
    for li in range(3):
        p[f"layer{li+2}"] = {
            "tdnn1": conv(1, channels, channels),
            "tdnn2": conv(1, channels, channels),
            "se": se(channels),
            "res2net": {f"block_{i}": conv(3, hidden, hidden) for i in range(scale - 1)},
        }
    cat = channels * 3
    p["mfa"] = conv(1, cat, cat)
    p["asp"] = {
        "tdnn": conv(1, cat * 3, 128),
        "w": (rng.standard_normal((1, 128, cat)) * 0.05).astype(np.float32),
        "b": np.zeros(cat, np.float32),
    }
    p["asp_bn"] = {
        "scale": np.ones(cat * 2, np.float32),
        "bias": np.zeros(cat * 2, np.float32),
        "mean": np.zeros(cat * 2, np.float32),
        "var": np.ones(cat * 2, np.float32),
    }
    p["fc"] = {
        "w": (rng.standard_normal((cat * 2, emb)) * 0.01).astype(np.float32),
        "b": np.zeros(emb, np.float32),
    }
    return p


class EcapaEncoder:
    """Frozen ECAPA wrapper: wav [B, T] -> [B, 1, 192]."""

    def __init__(self, weights_path: str | None = None, params: dict | None = None):
        if params is None:
            import torch

            sd = torch.load(weights_path, map_location="cpu")
            sd = {k: v.numpy() for k, v in sd.items()}
            params = ecapa_from_state_dict(sd)
        self.params = jax.tree.map(jnp.asarray, params)
        self._fwd = jax.jit(ecapa_forward)

    def __call__(self, wav: jnp.ndarray, lengths=None) -> jnp.ndarray:
        if lengths is not None:
            lengths = jnp.asarray(lengths)
        return self._fwd(self.params, wav, lengths)[:, None, :]
