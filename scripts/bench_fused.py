"""Sweep grid-block (gb) and chunk configs for the fused training kernels.

Measures one transformer stack's fwd+bwd (value_and_grad of a sum loss) at
the paper's intra/inter shapes on the real chip. Dev tool, not CI.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cse_tpu.models.sepformer import Sepformer, SepformerConfig
from cse_tpu.ops.fused_train import fused_stack_train


def bench_one(params_stack, x, nhead, chunk, gb_f, gb_b, iters=10):
    def loss(p, xx):
        return jnp.sum(
            fused_stack_train(xx, p, nhead=nhead, chunk=chunk, gb_f=gb_f, gb_b=gb_b)
        )

    f = jax.jit(jax.value_and_grad(loss))

    def sync(out):
        # block_until_ready is unreliable over the axon tunnel; a scalar
        # host transfer is the only dependable device sync (see bench.py)
        return float(out[0])

    sync(f(params_stack, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(params_stack, x)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    cfg = SepformerConfig(variant="context", compute_dtype=jnp.bfloat16)
    model = Sepformer(cfg)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 1, cfg.llm_dim)).astype(np.float32))
    params = model.init(jax.random.key(0), mix, ctx)
    stack = params["params"]["masknet"]["dual_mdl_0"]["intra_mdl"]

    shapes = {
        "intra [1040,251,256]": (1040, 251, 256),
        "inter [2000,127,256]": (2000, 127, 256),
    }
    for name, (G, L, D) in shapes.items():
        x = jnp.asarray(rng.standard_normal((G, L, D)).astype(np.float32))
        print(f"== {name}")
        for chunk, gb_f, gb_b in [
            (2, 1, 1),   # round-1 baseline
            (2, 4, 4),
            (2, 8, 4),
            (2, 8, 8),
            (1, 8, 8),
            (4, 8, 2),
            (2, 16, 4),
        ]:
            try:
                ms = bench_one(stack, x, cfg.nhead, chunk, gb_f, gb_b, args.iters)
                print(f"  chunk={chunk} gb_f={gb_f} gb_b={gb_b}: {ms:.1f} ms")
            except Exception as e:  # VMEM OOM etc.
                print(f"  chunk={chunk} gb_f={gb_f} gb_b={gb_b}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
