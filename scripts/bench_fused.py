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
from cse_tpu.ops.fused_stack import fused_stack_apply
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


def bench_serving(params_stack, x, nhead, gb, iters=10):
    f = jax.jit(
        lambda p, xx: jnp.sum(fused_stack_apply(xx, p, nhead=nhead, gb=gb))
    )
    float(f(params_stack, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(params_stack, x)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--gscale", type=int, default=1,
                    help="scale the G (sequences) axis: 1 = the B=8 full-step "
                         "shapes the r1-r3 sweeps used, 2 = the B=16 default")
    ap.add_argument("--serving", action="store_true",
                    help="sweep gb for the inference kernel "
                         "(fused_stack_apply) instead of the train fwd+bwd")
    ap.add_argument("--combos", type=str, default=None,
                    help="comma-separated chunk:gb_f:gb_b triples to sweep "
                         "instead of the built-in list (compile over the "
                         "tunnel costs ~4 min per config; trim accordingly)")
    args = ap.parse_args()

    cfg = SepformerConfig(variant="context", compute_dtype=jnp.bfloat16)
    model = Sepformer(cfg)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 1, cfg.llm_dim)).astype(np.float32))
    params = model.init(jax.random.key(0), mix, ctx)
    stack = params["params"]["masknet"]["dual_mdl_0"]["intra_mdl"]

    shapes = {
        "intra [%d,251,256]" % (1040 * args.gscale): (1040 * args.gscale, 251, 256),
        "inter [%d,127,256]" % (2000 * args.gscale): (2000 * args.gscale, 127, 256),
    }
    if args.serving:
        for name, (G, L, D) in shapes.items():
            x = jnp.asarray(rng.standard_normal((G, L, D)).astype(np.float32))
            print(f"== serving {name}")
            for gb in [1, 2, 4, 8, 16]:
                try:
                    ms = bench_serving(stack, x, cfg.nhead, gb, args.iters)
                    print(f"  gb={gb}: {ms:.1f} ms")
                except Exception as e:
                    print(f"  gb={gb}: FAIL {type(e).__name__}: {str(e)[:120]}")
        return

    combos = None
    if args.combos:
        combos = [tuple(int(v) for v in c.split(":"))
                  for c in args.combos.split(",")]
    for name, (G, L, D) in shapes.items():
        x = jnp.asarray(rng.standard_normal((G, L, D)).astype(np.float32))
        print(f"== {name}")
        for chunk, gb_f, gb_b in combos or [
            (1, 1, 1),   # r3 default (chunk=1, gb=1)
            (1, 2, 2),
            (1, 4, 4),   # r4 shipped default at Lp=256
            (1, 8, 4),
            (1, 4, 8),   # r4 shipped default at Lp=128
            (1, 8, 8),
            (1, 16, 8),
            (1, 8, 16),
            (1, 16, 16),
            (2, 1, 1),   # round-1 baseline
            # r5: chunk>1 was only ever swept at gb=1 (where chunk=1 won);
            # chunk cuts pallas_call count + halves saved chunk inputs, gb
            # fills the MXU — the combination is unexplored
            (2, 4, 4),
            (2, 4, 8),
            (2, 8, 4),
            (2, 2, 2),
            (4, 4, 4),
            (4, 4, 8),
        ]:
            try:
                ms = bench_one(stack, x, cfg.nhead, chunk, gb_f, gb_b, args.iters)
                print(f"  chunk={chunk} gb_f={gb_f} gb_b={gb_b}: {ms:.1f} ms")
            except Exception as e:  # VMEM OOM etc.
                print(f"  chunk={chunk} gb_f={gb_f} gb_b={gb_b}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
