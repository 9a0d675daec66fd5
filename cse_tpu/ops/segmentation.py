"""Dual-path chunking: 50%-overlap segmentation and its overlap-add inverse.

The dual-path separator reshapes a long frame sequence ``[B, L, N]`` into
overlapped chunks ``[B, S, K, N]`` (chunk length K, hop K//2), runs
transformers within chunks (intra) and across chunks (inter), and folds back
with overlap-add. This mirrors the behavior of the reference's
``_Segmentation`` / ``_over_add`` (see ``src/models/ContSep.py:305-370`` in the
reference repo) but is written channels-last for TPU: the feature axis N=256 is
the fastest-varying (lane) dimension, so every reshape here is a free
relayout for XLA, and downstream matmuls hit the MXU directly.

All shapes are static: the pad amount ``gap`` is a Python int derived from L
and K at trace time, so the whole pipeline compiles once per bucket.
"""

from __future__ import annotations

import jax.numpy as jnp


def segment_shapes(L: int, K: int) -> tuple[int, int]:
    """Return (gap, S): trailing pad and chunk count for frame length L.

    Matches the reference padding rule (``ContSep.py:285-303``):
    ``gap = K - (P + L % K) % K`` with hop P = K // 2; the padded signal of
    length ``L + gap + 2P`` yields ``S = (L + gap) / P + 1`` chunks.
    """
    P = K // 2
    gap = K - (P + L % K) % K
    S = (L + gap) // P + 1
    return gap, S


def segment(x: jnp.ndarray, K: int) -> tuple[jnp.ndarray, int]:
    """Split ``x [B, L, N]`` into 50%-overlapped chunks ``[B, S, K, N]``.

    Chunk s covers padded frames ``[s*P, s*P + K)`` where the padded signal is
    ``[0_P, x, 0_(gap+P)]`` — identical windows to the reference's interleaved
    even/odd strided views (``ContSep.py:305-335``), realized here as two
    static reshapes plus a stack (XLA fuses these into a single relayout).
    """
    B, L, N = x.shape
    P = K // 2
    gap, S = segment_shapes(L, K)
    x = jnp.pad(x, ((0, 0), (P, gap + P), (0, 0)))
    Lp = L + gap + 2 * P
    # even chunks start at 0, K, 2K, ...; odd chunks start at P, P+K, ...
    even = x[:, : Lp - P].reshape(B, S // 2, K, N)
    odd = x[:, P:].reshape(B, S // 2, K, N)
    out = jnp.stack([even, odd], axis=2).reshape(B, S, K, N)
    return out, gap


def overlap_add(y: jnp.ndarray, gap: int) -> jnp.ndarray:
    """Inverse of :func:`segment`: fold ``[B, S, K, N]`` back to ``[B, L, N]``.

    Sums each chunk at its hop offset, then strips the leading P and trailing
    P + gap padding — exactly the reference ``_over_add`` (``ContSep.py:337-370``).
    """
    B, S, K, N = y.shape
    P = K // 2
    even = y[:, 0::2].reshape(B, (S // 2) * K, N)[:, P:]
    odd = y[:, 1::2].reshape(B, (S // 2) * K, N)[:, : (S // 2) * K - P]
    out = even + odd
    if gap > 0:
        out = out[:, :-gap]
    return out
