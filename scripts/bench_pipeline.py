"""Decompose sustained-trainer cost: host loader vs device synthesis vs step.

Times, on the real chip and the current host, the three serialized parts of
one training iteration (train/loop.py):

  host   -- TrainLoader.batches(): native decode of B*(1+spk-1[+noise])
            wavs + context tokenization (thread pool)
  synth  -- the jitted on-device mixture-synthesis program
            (device_batch: speed perturb / shift / mix / noise / resample)
  step   -- the fused train step (what bench.py's headline measures)

Usage: python scripts/bench_pipeline.py --corpus /tmp/cse_synth_XXX [--batch 16]
Dev tool, not CI (needs a synthetic corpus on disk; make one with
``train_ContExt.py --synthetic_smoke --synthetic_dialogs 120 ...`` or
``cse_tpu.data.synthetic.make_synthetic_corpus``).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="synthetic corpus root")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--no_augment", action="store_true")
    ap.add_argument("--skip_step", action="store_true",
                    help="skip the train-step timing (its ~5 min compile; "
                         "bench.py already measures it)")
    args = ap.parse_args()

    from cse_tpu.data import datasets as ds
    from cse_tpu.data.pipeline import PipelineConfig, TrainLoader
    from cse_tpu.data.tokenizer import ByteTokenizer

    paths = ds.CorpusPaths(
        dailytalk=os.path.join(args.corpus, "DailyTalk_processed_16k"),
        demand=os.path.join(args.corpus, "DEMAND"),
        lists_root=os.path.join(args.corpus, "data"),
    )
    files = ds.build_train_list(paths, "dailytalk")
    cfg = PipelineConfig(
        max_sp_len=16, sr=8000, num_max_mix=2,
        augmentation=not args.no_augment, noise_add=not args.no_augment,
        max_ctx_tokens=512, aligned_buckets=True,
    )
    loader = TrainLoader(
        files, cfg, ByteTokenizer(), "dailytalk", args.batch,
        demand_files=ds.demand_noise_list(paths) if not args.no_augment else None,
        seed=1, num_workers=args.workers,
    )

    # ---- host-only loader rate
    it = loader.batches(epoch=0)
    host = next(it)  # warm the pool
    t0 = time.perf_counter()
    for _ in range(args.iters):
        host = next(it)
    host_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"host loader: {host_ms:.1f} ms/batch (B={args.batch}, "
          f"{'augment+noise' if not args.no_augment else 'plain'})")

    # ---- device synthesis program
    def synth():
        b = loader.device_batch(host)
        return float(jnp.sum(b["mixed"][0, :8]))

    synth()  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        synth()
    synth_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"device synthesis: {synth_ms:.1f} ms/batch (includes one host sync)")

    # split transfer vs compute: same program on device-resident inputs
    from cse_tpu.data.pipeline import synthesize_batch

    synth_in = {k: v for k, v in host.items()
                if k not in ("context_ids", "context_mask")}
    dev_in = jax.device_put(synth_in)
    jax.block_until_ready(dev_in)

    def synth_dev():
        b = synthesize_batch(cfg, dev_in)
        return float(jnp.sum(b["mixed"][0, :8]))

    synth_dev()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        synth_dev()
    sd_ms = (time.perf_counter() - t0) / args.iters * 1e3
    nbytes = sum(np.asarray(v).nbytes for v in synth_in.values())
    t0 = time.perf_counter()
    for _ in range(args.iters):
        jax.block_until_ready(jax.device_put(synth_in))
    put_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"  synthesis compute (device-resident inputs): {sd_ms:.1f} ms")
    print(f"  host->device put of {nbytes / 1e6:.1f} MB inputs: {put_ms:.1f} ms "
          f"({nbytes / put_ms / 1e3:.0f} MB/s effective)")

    # ---- train step at the same shape (bench.py's configuration)
    if args.skip_step:
        loader.close()
        return
    from cse_tpu.models import Sepformer, SepformerConfig
    from cse_tpu.train.optimizer import build_optimizer
    from cse_tpu.train.schedules import cosine_warmup_schedule
    from cse_tpu.train.step import TrainConfig, make_train_step

    scfg = SepformerConfig(variant="context", num_spks=2,
                           compute_dtype=jnp.bfloat16)
    model = Sepformer(scfg)
    batch = loader.device_batch(host)
    batch = {k: v for k, v in batch.items()
             if k not in ("gt16k", "gt16k_len", "sp_len")}
    batch["ctx_feat"] = jnp.zeros((args.batch, 1, scfg.llm_dim), jnp.float32)
    batch.pop("context_ids", None)
    batch.pop("context_mask", None)
    params = model.init(jax.random.key(0), batch["mixed"][:2, :2000],
                        batch["ctx_feat"][:2])
    tx = build_optimizer(cosine_warmup_schedule(1.5e-4, 500000, 10000))
    opt_state = tx.init(params)
    step = make_train_step(model, tx, TrainConfig(variant="context"), fused=True)
    key = jax.random.key(1)
    params, opt_state, m = step(params, opt_state, batch, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, m = step(params, opt_state, batch, key)
    float(m["loss"])
    step_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"train step: {step_ms:.1f} ms/batch")
    tot = step_ms + synth_ms
    print(f"serialized device total (step+synth): {tot:.1f} ms -> "
          f"{args.batch / tot * 1e3:.2f} mixtures/s; host {host_ms:.1f} ms "
          f"{'HIDDEN' if host_ms < tot else 'BINDING'}")
    loader.close()


if __name__ == "__main__":
    main()
