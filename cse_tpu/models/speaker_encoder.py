"""Speaker (enrollment) encoders producing 192-d embeddings for H-ContExt.

The reference uses a frozen speechbrain ECAPA-TDNN
(``train_HContExt.py:165-171,367``; 192-d per ``ContExt.py:52``). The real
JAX ECAPA port lives in :mod:`cse_tpu.models.ecapa` and is used when its
pretrained weights are available; ``encode_speaker`` falls back to a
deterministic spectral-statistics embedding (mel-band energy moments, fixed
random projection) so the H-ContExt pipeline runs end-to-end without the
checkpoint. The fallback is speaker-discriminative enough for smoke training
but NOT checkpoint-compatible — selection of the real encoder happens in
``build_speaker_encoder``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(2, 3))
def _spectral_embedding(wav: jnp.ndarray, lengths=None, dim: int = 192, seed: int = 0):
    """[B, T] -> [B, 1, dim]: frame log-energy spectrum moments, projected.
    Frames past ``lengths`` (valid sample counts) are excluded from the
    moments so padding does not change the embedding."""
    B, T = wav.shape
    frame = 400
    n = max(T // frame, 1)
    x = wav[:, : n * frame].reshape(B, n, frame)
    win = jnp.hanning(frame)
    spec = jnp.abs(jnp.fft.rfft(x * win[None, None, :], axis=-1))  # [B, n, F]
    logspec = jnp.log(spec + 1e-6)
    if lengths is not None:
        valid = jnp.maximum(lengths // frame, 1)
        m = (jnp.arange(n)[None, :] < valid[:, None]).astype(logspec.dtype)[..., None]
        denom = jnp.maximum(m.sum(axis=1), 1.0)
        mu = (logspec * m).sum(axis=1) / denom
        sd = jnp.sqrt(((logspec - mu[:, None, :]) ** 2 * m).sum(axis=1) / denom)
    else:
        mu = logspec.mean(axis=1)
        sd = logspec.std(axis=1)
    feat = jnp.concatenate([mu, sd], axis=-1)  # [B, 2F]
    key = jax.random.key(seed)
    W = jax.random.normal(key, (feat.shape[-1], dim)) / jnp.sqrt(feat.shape[-1])
    emb = feat @ W
    emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-6)
    return emb[:, None, :]


def encode_speaker(wav: jnp.ndarray, lengths=None, dim: int = 192) -> jnp.ndarray:
    """Best-available speaker embedding of enrollment audio [B, T] -> [B, 1, dim].

    ``lengths``: optional per-row valid sample counts (zero-padded buffers),
    forwarded to the encoder — the reference passes ``wav_lens`` to
    speechbrain's ``encode_batch`` (``train_HContExt.py:367``)."""
    enc = _get_default()
    if lengths is not None:
        lengths = jnp.asarray(lengths)
    return enc(wav, lengths)


_DEFAULT = None


def _get_default():
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = build_speaker_encoder()
    return _DEFAULT


def configure_speaker_encoder(ecapa_weights: str | None = None) -> None:
    """Select the process-wide encoder ``encode_speaker`` uses.

    CLIs call this with ``--ecapa_path`` so the real ECAPA port (and not the
    smoke-test stub) embeds enrollments when the released speechbrain
    ``embedding_model.ckpt`` is available."""
    global _DEFAULT
    _DEFAULT = build_speaker_encoder(ecapa_weights)


def build_speaker_encoder(ecapa_weights: str | None = None):
    """Return a callable (wav [B,T]@16k, lengths|None) -> [B,1,192]."""
    if ecapa_weights:
        from cse_tpu.models.ecapa import EcapaEncoder

        return EcapaEncoder(ecapa_weights)
    return lambda wav, lengths=None: _spectral_embedding(wav, lengths)
