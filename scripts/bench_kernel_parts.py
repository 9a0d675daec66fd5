"""Isolate where fused-kernel time goes: MXU matmuls vs VPU softmax/LN.

Runs stripped-down variants of the 2-layer fused forward at the intra shape
so each subsystem's cost is visible. Also tests MXU-offloaded lane reductions
(mean/sum along the 256-lane axis via a ones-matrix matmul) as candidate
replacements for VPU cross-lane reduces. Dev tool, not CI.
"""

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(mode, n_layers, nhead, D, cd):
    hd = D // nhead
    scale = 1.0 / math.sqrt(hd)

    def ln(x, ones_j):
        if mode in ("ln_matmul", "combined"):
            # lane reductions on the MXU: mean/meansq via x @ J/D
            mu = jnp.dot(x.astype(cd), ones_j, preferred_element_type=jnp.float32)[:, :1]
            m2 = jnp.dot((x * x).astype(cd), ones_j, preferred_element_type=jnp.float32)[:, :1]
            var = m2 - mu * mu
        elif mode == "combined_hp":
            # same, but fp32 operands at HIGHEST precision (exact reduction)
            jf = ones_j.astype(jnp.float32)
            mu = jax.lax.dot(x, jf, precision=jax.lax.Precision.HIGHEST)[:, :1]
            m2 = jax.lax.dot(x * x, jf, precision=jax.lax.Precision.HIGHEST)[:, :1]
            var = m2 - mu * mu
        elif mode == "combined_x2":
            # bf16x2 split: two bf16 matmuls recover ~fp32-exact row sums
            def lsum(v):
                vh = v.astype(cd)
                vl = (v - vh.astype(jnp.float32)).astype(cd)
                return (jnp.dot(vh, ones_j, preferred_element_type=jnp.float32)
                        + jnp.dot(vl, ones_j, preferred_element_type=jnp.float32))[:, :1]
            mu = lsum(x)
            m2 = lsum(x * x)
            var = m2 - mu * mu
        else:
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + 1e-6)
        return (x - mu) * inv

    def kernel(x_ref, w_ref, f1_ref, f2_ref, j_ref, o_ref):
        Lp = x_ref.shape[1]
        x = x_ref[0].astype(jnp.float32)
        ones_j = j_ref[...]
        lj = jnp.full((Lp, 8), 1.0, jnp.float32)
        for li in range(n_layers):
            if mode != "matmul_only":
                h = ln(x, ones_j)
            else:  # matmul_only
                h = x
            qkv = jnp.dot(h.astype(cd), w_ref[li], preferred_element_type=jnp.float32)
            ss = []
            for hh in range(nhead):
                q = qkv[:, hh * hd : (hh + 1) * hd] * scale
                k = qkv[:, D + hh * hd : D + (hh + 1) * hd]
                ss.append(jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32))
            ps = []
            for hh in range(nhead):
                if mode in ("matmul_only", "no_softmax"):
                    ps.append(ss[hh] * 1e-4)  # skip exp/max/sum entirely
                elif mode == "softmax_matmul" or mode == "combined":
                    # max still VPU; sum via MXU (p @ J)
                    m = jnp.max(ss[hh], axis=1, keepdims=True)
                    p = jnp.exp(ss[hh] - m)
                    z = jnp.dot(p.astype(cd), ones_j, preferred_element_type=jnp.float32)[:, :1]
                    ps.append(p / z)
                elif mode == "combined_hp":
                    m = jnp.max(ss[hh], axis=1, keepdims=True)
                    p = jnp.exp(ss[hh] - m)
                    z = jax.lax.dot(p, lj, precision=jax.lax.Precision.HIGHEST)[:, :1]
                    ps.append(p / z)
                elif mode == "combined_x2":
                    m = jnp.max(ss[hh], axis=1, keepdims=True)
                    p = jnp.exp(ss[hh] - m)
                    ph = p.astype(cd)
                    plo = (p - ph.astype(jnp.float32)).astype(cd)
                    z = (jnp.dot(ph, ones_j, preferred_element_type=jnp.float32)
                         + jnp.dot(plo, ones_j, preferred_element_type=jnp.float32))[:, :1]
                    ps.append(p * (1.0 / z))
                else:
                    m = jnp.max(ss[hh], axis=1, keepdims=True)
                    p = jnp.exp(ss[hh] - m)
                    ps.append(p / jnp.sum(p, axis=1, keepdims=True))
            cols = []
            for hh in range(nhead):
                v = qkv[:, 2 * D + hh * hd : 2 * D + (hh + 1) * hd]
                cols.append(jnp.dot(ps[hh].astype(cd), v.astype(cd),
                                    preferred_element_type=jnp.float32))
            attn = jnp.concatenate(cols, axis=-1)
            x = x + attn
            if mode != "matmul_only":
                h2 = ln(x, ones_j)
            else:
                h2 = x
            pre = jnp.dot(h2.astype(cd), f1_ref[li], preferred_element_type=jnp.float32)
            hr = jnp.maximum(pre, 0.0)
            x = x + jnp.dot(hr.astype(cd), f2_ref[li], preferred_element_type=jnp.float32)
        o_ref[0] = x.astype(o_ref.dtype)

    return kernel


def bench(mode, G, Lp, D, n_layers, nhead, iters):
    cd = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((G, Lp, D)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((n_layers, D, 3 * D)).astype(np.float32) * 0.05, cd)
    f1 = jnp.asarray(rng.standard_normal((n_layers, D, 4 * D)).astype(np.float32) * 0.05, cd)
    f2 = jnp.asarray(rng.standard_normal((n_layers, 4 * D, D)).astype(np.float32) * 0.05, cd)
    jmat = jnp.full((D, 128), 1.0 / D, cd)

    xspec = pl.BlockSpec((1, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    fullspec = lambda a: pl.BlockSpec(a.shape, lambda i, _n=a.ndim: (0,) * _n,
                                      memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        make_kernel(mode, n_layers, nhead, D, cd),
        grid=(G,),
        in_specs=[xspec, fullspec(w), fullspec(f1), fullspec(f2), fullspec(jmat)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((G, Lp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
    )
    f = jax.jit(functools.partial(f))
    args = (x, w, f1, f2, jmat)
    float(jnp.sum(f(*args)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--G", type=int, default=1008)
    ap.add_argument("--Lp", type=int, default=256)
    ap.add_argument("--D", type=int, default=256)
    ap.add_argument("--layers", type=int, default=2)
    args = ap.parse_args()

    flops = args.G * args.layers * (
        2 * args.D * args.D * args.Lp * 12 + 2 * args.Lp * args.Lp * args.D * 2
    )
    import sys
    modes = ("combined_x2", "full")
    for mode in modes:
        ms = bench(mode, args.G, args.Lp, args.D, args.layers, 8, args.iters)
        print(f"{mode:16s}: {ms:7.1f} ms   ({flops / ms / 1e9:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
