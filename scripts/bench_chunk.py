"""Micro-bench one fused 2-layer chunk (fwd and fwd+bwd) at the paper's intra
shape. Fast iteration loop for kernel scheduling experiments. Dev tool.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cse_tpu.ops.fused_train import W_NAMES, fused_layers


def make_weights(n_layers=2, D=256, F=1024, seed=0, cd=jnp.bfloat16):
    rng = np.random.default_rng(seed)

    def w(*s):
        return jnp.asarray(rng.standard_normal(s) / np.sqrt(s[-2] if len(s) > 1 else 1), cd)

    return {
        "qkv_w": w(n_layers, D, 3 * D), "qkv_b": w(n_layers, 3 * D),
        "out_w": w(n_layers, D, D), "out_b": w(n_layers, D),
        "ln1_s": jnp.ones((n_layers, D), cd), "ln1_b": jnp.zeros((n_layers, D), cd),
        "ln2_s": jnp.ones((n_layers, D), cd), "ln2_b": jnp.zeros((n_layers, D), cd),
        "f1_w": w(n_layers, D, F), "f1_b": w(n_layers, F),
        "f2_w": w(n_layers, F, D), "f2_b": w(n_layers, D),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--G", type=int, default=1008)
    ap.add_argument("--Lp", type=int, default=256)
    ap.add_argument("--L", type=int, default=251)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    D, nl = 256, 2
    w = make_weights(nl)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((args.G, args.Lp, D)), jnp.bfloat16)

    fwd = jax.jit(lambda xx, ww: fused_layers(xx, ww, nl, 8, args.L))

    def loss(xx, ww):
        return jnp.sum(fused_layers(xx, ww, nl, 8, args.L).astype(jnp.float32))

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    def sync(v):
        return float(jnp.sum(jnp.asarray(v).astype(jnp.float32)))

    y = fwd(x, w); sync(y)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        y = fwd(x, w)
    sync(y)
    tf = (time.perf_counter() - t0) / args.iters * 1e3

    out = vg(x, w); sync(out[0])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = vg(x, w)
    sync(out[0])
    tb = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"G={args.G} Lp={args.Lp}: fwd {tf:.2f} ms   fwd+bwd {tb:.2f} ms")


if __name__ == "__main__":
    main()
