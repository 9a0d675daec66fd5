"""Capture a jax.profiler trace of the bench train step and print the
per-op time breakdown (grouped). Dev tool, not CI.

Usage: python scripts/profile_step.py [--batch 8]
"""

import argparse
import glob
import gzip
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=16.0)
    ap.add_argument("--outdir", default="/tmp/cse_profile")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    from cse_tpu.models import Sepformer, SepformerConfig
    from cse_tpu.ops.buckets import aligned_bucket
    from cse_tpu.train.optimizer import build_optimizer
    from cse_tpu.train.schedules import cosine_warmup_schedule
    from cse_tpu.train.step import TrainConfig, make_train_step

    cfg = SepformerConfig(variant="context", num_spks=2, compute_dtype=jnp.bfloat16)
    B, T = args.batch, aligned_bucket(int(args.seconds * 8000))
    model = Sepformer(cfg)
    rng = np.random.default_rng(0)
    gt = rng.standard_normal((B, T)).astype(np.float32)
    batch = {
        "mixed": jnp.asarray(0.7 * gt + 0.3 * rng.standard_normal((B, T)).astype(np.float32)),
        "gt": jnp.asarray(gt),
        "ctx_feat": jnp.asarray(rng.standard_normal((B, 1, cfg.llm_dim)).astype(np.float32)),
    }
    params = model.init(jax.random.key(0), batch["mixed"][:, :2000], batch["ctx_feat"])
    tx = build_optimizer(cosine_warmup_schedule(1.5e-4, 500000, 10000))
    opt_state = tx.init(params)
    step = make_train_step(model, tx, TrainConfig(variant="context"), fused=True)

    key = jax.random.key(1)
    for _ in range(3):
        key, sub = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, batch, sub)
    float(m["loss"])

    os.system(f"rm -rf {args.outdir}")
    jax.profiler.start_trace(args.outdir)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, batch, sub)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    jax.profiler.stop_trace()
    print(f"step time: {dt*1e3:.1f} ms")

    report(args.outdir, args.steps)


def report(outdir, n_steps):
    """Parse the xplane protobuf and print device-op time by name group."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        print("no xplane found")
        return
    xs = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        by_name = defaultdict(float)
        for line in plane.lines:
            # XLA Ops line carries per-HLO timings; TensorCore line has steps
            if line.name not in ("XLA Ops", "XLA Modules", "Steps") and "Op" not in line.name:
                continue
            for ev in line.events:
                name = emeta.get(ev.metadata_id, str(ev.metadata_id))
                by_name[(line.name, name)] += ev.duration_ps / 1e9  # ps->ms
        rows = sorted(by_name.items(), key=lambda kv: -kv[1])
        print(f"== plane {plane.name}: top events (ms over {n_steps} steps)")
        for (ln, name), ms in rows[:50]:
            print(f"  {ms:9.2f}  [{ln}] {name[:100]}")


if __name__ == "__main__":
    main()
