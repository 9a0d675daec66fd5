"""Lane-aligned shape buckets for the dual-path separator.

Profiling on v5e shows the dominant cost of a train step is memory-bound
attention fusions, and the inter-chunk tensors ``[B*K, S+ctx, S+ctx]`` pad
their minor dimension to the 128-lane boundary: at the reference's 16 s
bucket, S+ctx = 131 -> padded to 256, i.e. ~2x wasted HBM bandwidth on the
hottest tensors. Picking the largest bucket T' <= T whose chunk count S
satisfies S + ctx <= ceil128(S + ctx) with minimal padding recovers that
bandwidth (S is always even because segmentation interleaves even/odd
chunks, so the best reachable value is S + ctx = 127 at ctx = 1).
"""

from __future__ import annotations

from cse_tpu.ops.segmentation import segment_shapes


def frames_for_samples(T: int, kernel: int = 16, stride: int = 8) -> int:
    return (T - kernel) // stride + 1


def inter_len(T: int, K: int = 250, ctx: int = 1, kernel: int = 16, stride: int = 8) -> int:
    _, S = segment_shapes(frames_for_samples(T, kernel, stride), K)
    return S + ctx


def aligned_bucket(
    T: int, K: int = 250, ctx: int = 1, kernel: int = 16, stride: int = 8
) -> int:
    """Largest T' <= T whose inter sequence length fits the 128-lane tile.

    Returns T unchanged when it is already aligned or when no aligned bucket
    exists within 10% below T.
    """

    def pad_waste(t: int) -> int:
        il = inter_len(t, K, ctx, kernel, stride)
        return ((il + 127) // 128) * 128 - il

    if pad_waste(T) <= 1:
        return T
    t = T - stride
    floor = int(T * 0.9)
    while t >= floor:
        if pad_waste(t) <= 1:
            return t
        t -= stride
    return T
