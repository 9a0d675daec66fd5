"""On-device batched mixture synthesis.

The reference synthesizes mixtures per-sample in CPU DataLoader workers
(reference ``src/data/dataset_train_CSE.py:167-415`` and ``mix_aud.py:3-96``).
Here the same math runs as batched jnp over ``[B, T]`` buffers with explicit
per-sample length arrays, so the whole augmentation chain executes on-device
under one jit — the host only decodes bytes.

Faithful details preserved:
* 2-spk mixing uses energy-preserving (a, b) weights; 3-spk applies raw gains
  (``dataset_train_CSE.py:436-442`` vs ``:484-496``).
* signal/noise energies are means over each signal's own (pre-padding) length,
  with the noise first truncated to the signal length.
* the final mixture (and scaled stems) are peak-normalized to 0.9.
* DEMAND noise addition follows torchaudio ``F.add_noise`` semantics: the
  noise is scaled so the resulting SNR equals the requested value
  (``dataset_train_CSE.py:298``).
* random shift is circular (``torch.roll``, ``dataset_train_CSE.py:181``).
"""

from __future__ import annotations

import jax.numpy as jnp


def _length_mask(T: int, lengths: jnp.ndarray) -> jnp.ndarray:
    """[B, T] float mask of valid samples given [B] lengths."""
    return (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)


def peak_normalize(x: jnp.ndarray, target: float = 0.9, eps: float = 1e-12) -> jnp.ndarray:
    """Scale each waveform so its absolute peak is ``target``.

    ``x``: [..., T]. Zero-padding is harmless (zeros never set the max).
    """
    peak = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return x * (target / jnp.maximum(peak, eps))


def _masked_energy(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Mean energy over each signal's own valid length. x: [B, T] -> [B]."""
    mask = _length_mask(x.shape[-1], lengths)
    return jnp.sum(x * x * mask, axis=-1) / jnp.maximum(
        lengths.astype(jnp.float32), 1.0
    )


def mix_2spk(
    signal: jnp.ndarray,
    noise: jnp.ndarray,
    snr_db: jnp.ndarray,
    signal_len: jnp.ndarray,
    noise_len: jnp.ndarray,
):
    """Energy-preserving 2-speaker SNR mix (reference ``mix_audio``, pad=True).

    signal/noise: [B, T] zero-right-padded; snr_db/signal_len/noise_len: [B].
    Returns (mixed, signal_scaled, noise_scaled, mixed_len) with the mixture
    truncated to the signal's length and peak-normalized to 0.9 (all three
    outputs share the same scale, as in the reference).
    """
    T = signal.shape[-1]
    sig_mask = _length_mask(T, signal_len)
    # noise is truncated to the signal length before its energy is measured
    eff_noise_len = jnp.minimum(noise_len, signal_len)
    noise = noise * sig_mask
    sig_energy = _masked_energy(signal, signal_len)
    noise_energy = _masked_energy(noise, eff_noise_len)
    g = jnp.sqrt(10.0 ** (-snr_db / 10.0) * sig_energy / jnp.maximum(noise_energy, 1e-12))
    a = jnp.sqrt(1.0 / (1.0 + g * g))[:, None]
    b = jnp.sqrt(g * g / (1.0 + g * g))[:, None]
    signal = a * signal * sig_mask
    noise = b * noise
    mixed = signal + noise
    scale = 0.9 / jnp.maximum(jnp.max(jnp.abs(mixed), axis=-1, keepdims=True), 1e-12)
    return mixed * scale, signal * scale, noise * scale, signal_len


def mix_3spk(
    signal: jnp.ndarray,
    noise1: jnp.ndarray,
    noise2: jnp.ndarray,
    snr1_db: jnp.ndarray,
    snr2_db: jnp.ndarray,
    signal_len: jnp.ndarray,
    noise1_len: jnp.ndarray,
    noise2_len: jnp.ndarray,
):
    """3-speaker mix with raw per-noise gains (reference ``mix_audio_3spk``).

    Returns (mixed, signal, noise1, noise2, mixed_len); mixed_len is the max
    of the three lengths (pad=True branch), everything peak-normed to 0.9.
    """
    sig_energy = _masked_energy(signal, signal_len)
    n1_energy = _masked_energy(noise1, noise1_len)
    n2_energy = _masked_energy(noise2, noise2_len)
    g1 = jnp.sqrt(10.0 ** (-snr1_db / 10.0) * sig_energy / jnp.maximum(n1_energy, 1e-12))[:, None]
    g2 = jnp.sqrt(10.0 ** (-snr2_db / 10.0) * sig_energy / jnp.maximum(n2_energy, 1e-12))[:, None]
    noise1 = g1 * noise1
    noise2 = g2 * noise2
    mixed = signal + noise1 + noise2
    scale = 0.9 / jnp.maximum(jnp.max(jnp.abs(mixed), axis=-1, keepdims=True), 1e-12)
    mixed_len = jnp.maximum(signal_len, jnp.maximum(noise1_len, noise2_len))
    return mixed * scale, signal * scale, noise1 * scale, noise2 * scale, mixed_len


def add_noise_snr(
    waveform: jnp.ndarray, noise: jnp.ndarray, snr_db: jnp.ndarray
) -> jnp.ndarray:
    """Add ``noise`` scaled so the result has the requested SNR.

    torchaudio ``F.add_noise`` semantics (reference ``dataset_train_CSE.py:298``):
    scale = 10 ** ((snr_current - snr_target) / 20) with L2 energies over the
    full buffer. waveform/noise: [B, T]; snr_db: [B].
    """
    e_sig = jnp.sum(waveform * waveform, axis=-1)
    e_noise = jnp.maximum(jnp.sum(noise * noise, axis=-1), 1e-12)
    snr_current = 10.0 * jnp.log10(jnp.maximum(e_sig, 1e-12) / e_noise)
    scale = 10.0 ** ((snr_current - snr_db) / 20.0)
    return waveform + scale[:, None] * noise


def circular_shift(
    x: jnp.ndarray, shifts: jnp.ndarray, lengths: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Per-sample circular shift along time (torch.roll equivalent).

    x: [B, T]; shifts: [B] ints (positive = shift right). The reference rolls
    the *unpadded* signal (``dataset_train_CSE.py:181``), so when ``lengths``
    is given the wrap happens modulo each sample's own valid length and the
    zero padding stays in place. Realized as a gather with modular indices —
    one fused XLA op, no host loop.
    """
    T = x.shape[-1]
    pos = jnp.arange(T)[None, :]
    if lengths is None:
        idx = (pos - shifts[:, None]) % T
        return jnp.take_along_axis(x, idx, axis=-1)
    L = jnp.maximum(lengths[:, None], 1)
    idx = (pos - shifts[:, None]) % L
    out = jnp.take_along_axis(x, idx, axis=-1)
    return jnp.where(pos < L, out, x)
