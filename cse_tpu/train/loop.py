"""Generic trainer driving every CSE variant (the reference's L5 layer).

One ``train_net(args, variant)`` replaces the three copy-pasted 700-line
reference trainers (``train_ContSep.py`` / ``train_ContExt.py`` /
``train_HContExt.py``), preserving their operational behavior:

* smoke ``validate(fast_validate=True)`` before training ("debug the
  pipeline", reference ``train_ContSep.py:282``)
* per-100-iter wall-clock + lr prints; loss prints every 100 steps
* validation every ``--eval_step`` with checkpoint + rolling Best
* ``--tot_iters`` stop (clean exit here, not the reference's assert-crash)
* warm start from released PyTorch ckpts or resume from orbax state

and the TPU-native execution model: one jitted SPMD program per step (device
synthesis -> frozen ctx encoder -> fwd/bwd -> update), host threads only
decode and tokenize.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cse_tpu.compat.torch_import import sepformer_from_state_dict
from cse_tpu.core.banner import announce_assets
from cse_tpu.core.mesh import (
    distributed_init_if_needed, is_tpu_backend, make_mesh, shard_batch,
)
from cse_tpu.data import datasets as ds
from cse_tpu.data.pipeline import EvalLoader, PipelineConfig, TrainLoader, prefetch
from cse_tpu.data.tokenizer import load_tokenizer
from cse_tpu.models import Sepformer, SepformerConfig
from cse_tpu.models.context_encoder import build_context_encoder
from cse_tpu.ops.losses import si_snr
from cse_tpu.train import checkpoint as ckpt_lib
from cse_tpu.train.optimizer import (
    build_optimizer,
    set_plateau_scale,
)
from cse_tpu.train.schedules import (
    ReduceLROnPlateau,
    cosine_warmup_schedule,
    linear_warmup_schedule,
)
from cse_tpu.train.step import TrainConfig, make_eval_step, make_train_step
from cse_tpu.utils.logging import IterTimer, MetricLogger
from cse_tpu.utils.profiling import profile_dir_from_env, trace_if


def _corpus_paths(args) -> ds.CorpusPaths:
    return ds.CorpusPaths(
        dailytalk=args.dailytalk_data_path,
        spokenwoz=args.spokenwoz_data_path,
        tedlium=args.tedlium_data_path,
        demand=args.acoustic_noise_path,
        lists_root=getattr(args, "lists_root", "./data"),
    )


def setup_synthetic(args):
    """--synthetic_smoke: build a tiny corpus and retarget the flags at it."""
    import tempfile

    from cse_tpu.data.synthetic import make_synthetic_corpus

    assert args.train_data in ("dailytalk", "spokenwoz", "tedlium"), (
        f"--train_data {args.train_data!r}: unknown corpus"
    )
    root = tempfile.mkdtemp(prefix="cse_synth_")
    info = make_synthetic_corpus(
        root, num_test_mix=args.num_test_mix, corpus=args.train_data,
        n_dialogs=getattr(args, "synthetic_dialogs", 4),
        turns_per_dialog=getattr(args, "synthetic_turns", 8),
        seconds=tuple(getattr(args, "synthetic_seconds", (1.0, 3.0))),
    )
    corpus = args.train_data
    setattr(args, f"{corpus}_data_path", info[f"{corpus}_data_path"])
    args.acoustic_noise_path = info["acoustic_noise_path"]
    args.lists_root = info["lists_root"]
    args.llama_path = "__none__"  # force the stub encoder
    print(f"[cse_tpu] synthetic corpus at {root}")
    return args


def build_model(args, variant: str) -> tuple[Sepformer, TrainConfig]:
    if variant == "contsep" and args.train_data == "dailytalk":
        args.ce = False  # forced, reference train_ContSep.py:167-168
    use_ce = bool(args.ce) if variant == "contsep" else True
    tiny = {}
    if getattr(args, "debug_tiny_model", False):
        tiny = dict(
            enc_channels=32, enc_kernel=8, enc_stride=4, d_model=32, nhead=4,
            d_ffn=64, num_tf_layers=2, num_dp_layers=1, chunk_size=50,
            # stride 4 at 16 s/8 kHz gives ~1300 inter-chunk positions;
            # cover them (the full-size model's 2500 covers its own worst case)
            pe_max_len=2048,
        )
    cfg = SepformerConfig(
        num_spks=args.num_max_mix,
        variant="context" if variant == "hcontext" else variant,
        add_se=variant == "hcontext",
        ce=use_ce,
        compute_dtype=jnp.bfloat16 if (args.bf16 or args.fp16) else jnp.float32,
        remat=None if args.remat == "none" else args.remat,
        use_flash_attention=args.flash_attention,
        **tiny,
    )
    tcfg = TrainConfig(
        variant=variant,
        num_spks=args.num_max_mix,
        ctx_weight=args.ctx_weight,
        use_ce=use_ce,
    )
    return Sepformer(cfg), tcfg


def build_schedule(args):
    # plateau is EXCLUSIVE of warmup/cosine (reference scheduler selection,
    # train_ContSep.py:244-251: `if plateau: ... elif warmup: ...`) — the
    # base lr stays constant and only the plateau scale moves it
    if args.plateau:
        return args.lr
    if args.warmup:
        if args.tot_iters is not None:
            return cosine_warmup_schedule(args.lr, args.tot_iters, args.warmup_iteration)
        return linear_warmup_schedule(args.lr, args.warmup_iteration)
    return args.lr


def _pipeline_cfg(args, mode: str) -> PipelineConfig:
    # validation uses a 30 s bucket (reference train_ContSep.py:577) except in
    # synthetic smoke mode where the tiny corpus makes that pure padding
    val_len = args.max_sp_len if getattr(args, "synthetic_smoke", False) else 30
    return PipelineConfig(
        max_sp_len=args.max_sp_len if mode != "val" else val_len,
        sr=args.sr,
        num_max_mix=args.num_max_mix,
        augmentation=args.augmentation,
        speed_perturb_ratio=tuple(args.speed_perturb_ratio),
        shift_prob=args.shift_prob,
        max_shift_sec=args.max_shift_sec,
        noise_add=args.noise_add,
        max_context_train=args.max_context_train,
        context_length=args.context_length,
        max_ctx_tokens=args.max_ctx_tokens,
        ctx_buckets=tuple(getattr(args, "ctx_buckets", ()) or ()),
        # train-only; eval keeps the exact reference bucket (metric parity)
        aligned_buckets=(mode == "train") and getattr(args, "aligned_buckets", True),
    )


def train_net(args, variant: str):
    assert variant in ("base", "contsep", "context", "hcontext")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # multi-host rendezvous before any device use (the torchrun/idr_torch
    # replacement, reference train_ContSep.py:114-132)
    distributed_init_if_needed()
    if args.synthetic_smoke:
        args = setup_synthetic(args)

    paths = _corpus_paths(args)
    tokenizer = load_tokenizer(args.llama_path, args.llama_auth_token)
    if jax.process_count() > 1 and not args.mesh_data:
        # without a process-spanning mesh there is NO gradient sync: each
        # host would silently train its own model on its data shard
        raise SystemExit(
            f"multi-host run ({jax.process_count()} processes) requires "
            f"--mesh_data spanning all devices (e.g. --mesh_data "
            f"{jax.device_count()})"
        )
    mesh = make_mesh(args.mesh_data) if args.mesh_data else None
    llm = None
    if variant != "base":
        llm = build_context_encoder(
            args.llama_path,
            ctx_length=args.ctx_length if variant != "contsep" else 1,
            auth_token=args.llama_auth_token,
            mesh=mesh,
            quant=("w8a8" if getattr(args, "llama_w8a8", False)
                   else "int8" if getattr(args, "llama_int8", False) else None),
        )

    model, tcfg = build_model(args, variant)

    if variant == "hcontext" and getattr(args, "ecapa_path", ""):
        from cse_tpu.models.speaker_encoder import configure_speaker_encoder

        configure_speaker_encoder(args.ecapa_path)

    # loud real-vs-stub banner + train-on-stubs refusal (base variant uses
    # no external nets: the context column is loaded but never conditioned on)
    nets = {}
    if variant != "base":
        nets["tokenizer"] = tokenizer
        nets["llm"] = llm
    if variant == "hcontext":
        nets["ecapa_path"] = getattr(args, "ecapa_path", "")
    if nets:
        announce_assets("train", args, **nets)

    files = ds.build_train_list(paths, args.train_data)
    print(f"[cse_tpu] {len(files)} training utterances ({args.train_data})")
    train_loader = TrainLoader(
        files,
        _pipeline_cfg(args, "train"),
        tokenizer,
        args.train_data,
        args.batch_size,
        demand_files=ds.demand_noise_list(paths) if args.noise_add else None,
        seed=args.seed,
        num_workers=args.workers,
    )

    # ---- init params (shape-only forward on a short clip)
    B = args.batch_size
    dummy_mix = jnp.zeros((B, 4000), jnp.float32)
    dummy_ctx = jnp.zeros((B, 2 if variant == "hcontext" else args.ctx_length, 4096), jnp.float32)
    init_kw = {}
    if variant == "hcontext":
        init_kw = dict(se=jnp.zeros((B, 1, 192)), cue_index=jnp.asarray(0))
        dummy_ctx = jnp.zeros((B, args.ctx_length, 4096), jnp.float32)
    if variant == "base":
        params = model.init(jax.random.key(0), dummy_mix)
    else:
        params = model.init(jax.random.key(0), dummy_mix, dummy_ctx, **init_kw)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"[cse_tpu] Train # of params: {n_params:,}")

    # ---- optimizer
    tx = build_optimizer(
        build_schedule(args),
        weight_decay=args.weight_decay,
        update_frequency=args.update_frequency,
    )
    opt_state = tx.init(params)
    plateau = ReduceLROnPlateau() if args.plateau else None
    step_num, start_epoch = args.start_step, args.start_epoch
    best_val = 0.0

    # ---- resume / warm start (reference train_ContSep.py:179-214)
    if args.resume and args.checkpoint is None:
        args.checkpoint = ckpt_lib.latest_checkpoint(args.checkpoint_dir)
        if args.checkpoint:
            print(f"[cse_tpu] Resume with the latest checkpoint {args.checkpoint}")
    if args.checkpoint:
        print(f"[cse_tpu] Loading checkpoint: {args.checkpoint}")
        try:
            restored = ckpt_lib.restore_checkpoint(
                args.checkpoint,
                template=None if _is_torch(args.checkpoint) else {
                    "params": params, "opt_state": opt_state, "step": 0, "epoch": 0,
                    "best_val": 0.0,
                    "plateau": ReduceLROnPlateau().state_dict(),
                },
            )
        except Exception:
            # structurally older orbax checkpoint: raw-restore the weights and
            # counters; optimizer moments are re-initialized
            raw = ckpt_lib.restore_checkpoint(args.checkpoint, template=None)
            print("[cse_tpu] checkpoint predates the current optimizer state "
                  "layout; restoring weights/step only")
            restored = {
                "params": jax.tree.map(jnp.asarray, raw["params"]),
                "opt_state": None,
                "step": raw.get("step", 0), "epoch": raw.get("epoch", 0),
                "best_val": raw.get("best_val", 0.0),
                "plateau": raw.get("plateau"),
            }
            args.reset_optimizer = True
        if "state_dict" in restored:  # released PyTorch weights (warm start)
            params = sepformer_from_state_dict(restored["state_dict"])
            if args.from_ckpt:
                step_num = int(restored.get("step", 0))
                start_epoch = int(restored.get("epoch", 0))
            opt_state = tx.init(params)
        else:
            params = restored["params"]
            if args.from_ckpt:
                step_num = int(restored["step"])
                start_epoch = int(restored["epoch"])
                if args.reset_optimizer:
                    opt_state = tx.init(params)  # fresh moments, keep step/epoch
                else:
                    opt_state = restored["opt_state"]
                best_val = float(restored.get("best_val", 0.0))
                if plateau is not None and restored.get("plateau") is not None:
                    plateau.load_state_dict(
                        {k: v.item() if hasattr(v, "item") else v
                         for k, v in restored["plateau"].items()}
                    )
                    opt_state = set_plateau_scale(opt_state, plateau.scale)

    # fused Pallas train path: default ON for TPU backends (the benched
    # configuration IS the shipped default), OFF elsewhere; --fused_train /
    # --no_fused_train force either way
    fused_flag = getattr(args, "fused_train", None)
    fused = fused_flag if fused_flag is not None else is_tpu_backend()
    print(f"[cse_tpu] train path: {'fused-pallas' if fused else 'xla'}"
          + (" (auto)" if fused_flag is None else " (forced)"))
    # thread the frozen-LLM weights as jit ARGUMENTS (encoder.pure()), never
    # closure constants — see make_loss_fn's docstring for why
    llm_fn, llm_ps = llm.pure() if llm is not None else (None, None)
    train_step = make_train_step(
        model, tx, tcfg, mesh=mesh, llm_apply=llm_fn, llm_params=llm_ps,
        fused=fused,
    )
    eval_step = make_eval_step(model, tcfg, llm_apply=llm_fn, llm_params=llm_ps)

    schedule = build_schedule(args)
    # per-experiment dump dir (reference train_ContExt.py:131: temp_dir is
    # derived from the checkpoint dir so parallel runs never mix audio)
    if not args.temp_dir:
        args.temp_dir = os.path.join(
            "./tmp_eval", os.path.basename(os.path.normpath(args.checkpoint_dir))
        )
    writer = MetricLogger(
        args.checkpoint_dir, args.project,
        enabled=jax.process_index() == 0, config=vars(args),
    )
    profile_dir = profile_dir_from_env()

    def validate(params, fast_validate=True, epoch=0, step=0):
        # reference fast-val caps (inclusive break: cap+1 batches run,
        # train_ContSep.py:602-678). ContSep validates fast even at
        # eval_step; ContExt/H-ContExt run the full val set there.
        t_cap = (100 if variant == "contsep" else 5) + 1
        loader = EvalLoader(
            paths, args.train_data, "val", _pipeline_cfg(args, "val"),
            tokenizer, args.batch_size, num_test_mix=args.num_test_mix,
            num_workers=args.workers, seed=args.seed,
        )
        sisnrs, prevs, accs = [], [], []
        dumped = 0
        if args.generate_speech and jax.process_index() == 0:
            # stale dumps from earlier validations are cleared first
            # (reference train_ContExt.py:579-582)
            import shutil

            shutil.rmtree(os.path.join(args.temp_dir, "val"), ignore_errors=True)
        for bi, batch in enumerate(loader.batches(limit_batches=t_cap if fast_validate else None)):
            if variant == "hcontext":
                # eval enrollment rules (register wavs / 1 s crops), NOT the
                # train-time random 1-5 s crop (reference dataset :380-391)
                from cse_tpu.eval.enrollment import eval_enrollment_embeddings

                batch["se"] = eval_enrollment_embeddings(
                    batch, args.train_data, "val", paths,
                    num_test_mix=args.num_test_mix, seed=args.seed,
                )
            enhanced, aux = eval_step(params, _model_batch(batch))
            sisnrs.append(np.asarray(si_snr(enhanced, batch["gt"])))
            prevs.append(np.asarray(si_snr(batch["mixed"], batch["gt"])))
            if "ctx_label" in aux:
                accs.append(
                    np.asarray(aux["ctx_pred"]) == np.asarray(aux["ctx_label"])
                )
            # val audio dumps (reference train_ContSep.py:681-710)
            if (
                args.generate_speech
                and dumped < args.num_gen_speech
                and jax.process_index() == 0
            ):
                from cse_tpu.data.audio_io import write_wav

                lens = np.asarray(batch["sp_len"])
                for k, name in enumerate(batch["names"]):
                    if dumped >= args.num_gen_speech:
                        break
                    n = int(lens[k])
                    for sub, arr in (
                        ("gts", np.asarray(batch["gt"])),
                        ("preds", np.asarray(enhanced)),
                        ("mixed", np.asarray(batch["mixed"])),
                    ):
                        d = os.path.join(args.temp_dir, "val",
                                         args.train_data, sub)
                        os.makedirs(d, exist_ok=True)
                        x = arr[k, :n].astype(np.float32)
                        x = x / max(np.abs(x).max(), 1e-9) * 0.9
                        write_wav(os.path.join(d, name + ".wav"), x, args.sr)
                        # wandb audio for the first 3 val samples (reference
                        # train_ContSep.py:706-710)
                        if dumped < 3:
                            writer.audio(f"val_audio/{sub}_{dumped}", x,
                                         args.sr, step, caption=name)
                    dumped += 1
        loader.close()
        val = float(np.mean(np.concatenate(sisnrs))) if sisnrs else 0.0
        prev = float(np.mean(np.concatenate(prevs))) if prevs else 0.0
        print(f"## VALIDATION SI-SNR ({args.train_data}): {val:.4f} "
              f"(SI-SNR-i {val - prev:+.4f})")
        if accs:
            acc = float(np.mean(np.concatenate(accs)))
            print(f"## VALIDATION CTX ACC ({args.train_data}): {acc:.4f}")
            if step:
                writer.scalar(f"val_{args.train_data}/CTX_ACC", acc, step)
        if step:
            writer.scalar(f"val_{args.train_data}/SI-SNR", val, step)
            writer.scalar(f"val_{args.train_data}/SI-SNR-I", val - prev, step)
        return val

    def _model_batch(batch):
        keys = ("mixed", "gt", "noises", "context_ids", "context_mask", "se")
        return {k: batch[k] for k in keys if k in batch}

    def _enrollment_embeddings(batch, step=0):
        from cse_tpu.data.pipeline import crop_enrollment
        from cse_tpu.models.speaker_encoder import encode_speaker

        # random 1-5 s crop of the 16 kHz pre-mix gt (both loaders carry
        # gt16k; the speaker encoder requires 16 kHz input)
        wav, wav_len = crop_enrollment(
            jnp.asarray(batch["gt16k"]), jnp.asarray(batch["gt16k_len"]),
            jax.random.fold_in(jax.random.key(args.seed + 1), step),
        )
        return encode_speaker(wav, wav_len)

    # smoke validation before training (reference :282 "debug the pipeline")
    validate(params, fast_validate=True)

    print(f"[cse_tpu] starting at step {step_num}, epoch {start_epoch}")
    stop = False
    micro = 0  # global microbatch counter (checkpoints land on update
    # boundaries, so MultiSteps' restored mini_step is 0 — aligned)
    dispatch_idx = 0  # per-dispatch RNG stream for enrollment crops
    # sustained-throughput marks: (global microbatch, wall-clock) at every
    # log boundary; the end-of-run summary rates marks[1:] so the first
    # block (which contains the step compile) is excluded. Dispatch is async
    # (train_step returns device futures), so each mark first blocks on the
    # newest step's metrics — marks are true completion times, and the Iter
    # Time print stops reporting host dispatch rate when no logger backend
    # forces a per-step sync.
    sustained_marks: list[tuple[int, float]] = []
    last_metrics = None
    for epoch in range(start_epoch, args.epochs):
        if stop:
            break
        print(f"Epoch [{epoch}/{args.epochs}]")
        timer = IterTimer(args.log_every)

        def _prepare(host):
            # dispatches on-device synthesis + host->device transfers; called
            # one batch AHEAD of the blocking metric sync below so the next
            # batch's synthesis/copies overlap the in-flight train step
            # (double-buffered puts, PERF.md "input pipeline overlap")
            nonlocal dispatch_idx
            dispatch_idx += 1
            b = train_loader.device_batch(host)
            if variant == "hcontext":
                # enrollment embeddings must join the batch BEFORE global
                # assembly: on multi-host, every leaf the sharded step
                # consumes has to become a global array in shard_batch
                b["se"] = _enrollment_embeddings(b, dispatch_idx)
            b = {k: v for k, v in b.items()
                 if k not in ("gt16k", "gt16k_len", "sp_len")}
            if mesh is not None:
                b = shard_batch(b, mesh)
            return b

        host_iter = iter(prefetch(train_loader.batches(epoch)))
        nxt = next(host_iter, None)
        pending = _prepare(nxt) if nxt is not None else None
        i = -1
        while pending is not None:
            i += 1
            batch = pending
            if i % args.log_every == 0:
                if last_metrics is not None:
                    float(last_metrics["loss"])  # drain the device queue
                iter_time = timer.lap()
                sustained_marks.append((micro, time.time()))
                print(
                    "******** Training [%d / %d] : %d / %d, Iter Time : %.3f sec ********"
                    % (epoch, args.epochs, (i + 1) * B, len(files), iter_time)
                )
            with trace_if(profile_dir, step_num):
                params, opt_state, metrics = train_step(
                    params, opt_state, batch,
                    jax.random.fold_in(jax.random.key(args.seed), step_num * 1000 + i),
                )
            last_metrics = metrics
            # prefetch-dispatch batch i+1 while step i runs on device
            nxt = next(host_iter, None)
            pending = _prepare(nxt) if nxt is not None else None
            # step = optimizer updates, not microbatches (reference
            # train_ContSep.py:402-421 with --update_frequency). The counter
            # is GLOBAL (not per-epoch) so it stays aligned with
            # optax.MultiSteps' internal microbatch count across epoch
            # boundaries whose batch count isn't a multiple of
            # update_frequency.
            micro += 1
            if micro % args.update_frequency != 0:
                continue
            step_num += 1
            if writer.tb is not None or writer.wandb is not None:
                vals = {k: float(v) for k, v in metrics.items()}
                writer.scalars(vals, step_num, prefix="train/")
                writer.scalar("train/SI-SNR", -vals.get("snr_loss", 0.0), step_num)
                # the update just applied ran at count = step_num - 1
                lr = schedule(max(step_num - 1, 0)) if callable(schedule) else schedule
                if plateau is not None:
                    lr = lr * plateau.scale
                writer.scalar("lr/learning_rate", float(lr), step_num)
            if step_num % 100 == 0:
                print(
                    f"######## Step(Epoch): {step_num}({epoch}), "
                    f"Loss: {float(metrics['loss']):.4f} #########"
                )
            if (
                args.generate_speech
                and step_num % args.generate_step == 0
                and jax.process_index() == 0
            ):
                # train-batch audio dumps (reference train_ContSep.py:515-555)
                from cse_tpu.data.audio_io import write_wav

                enhanced, _ = eval_step(params, batch)
                for kk in range(min(args.num_gen_speech, enhanced.shape[0])):
                    for sub, arr in (
                        ("gts", np.asarray(batch["gt"])),
                        ("preds", np.asarray(enhanced)),
                        ("mixed", np.asarray(batch["mixed"])),
                    ):
                        d = os.path.join(args.temp_dir, "train", sub)
                        os.makedirs(d, exist_ok=True)
                        x = arr[kk].astype(np.float32)
                        x = x / max(np.abs(x).max(), 1e-9) * 0.9
                        write_wav(os.path.join(d, f"{kk}.wav"), x, args.sr)
                        # wandb audio for the first 3 train dumps (reference
                        # train_ContSep.py:540-552)
                        if kk < 3:
                            writer.audio(f"train_audio/{sub}_{kk}", x,
                                         args.sr, step_num)

            if step_num % args.eval_step == 0:
                # reference: ContSep validates fast (cap 100, :459); ContExt/
                # H-ContExt score the FULL val set every eval_step (:425/:417)
                val = validate(
                    params,
                    fast_validate=(variant in ("contsep", "base")),
                    epoch=epoch, step=step_num,
                )
                if plateau is not None and step_num >= args.no_reduce:
                    prev_scale = plateau.scale
                    plateau.step(val)
                    if plateau.scale != prev_scale:
                        # push the new lr scale into the optimizer state (the
                        # torch param_group-mutation equivalent)
                        opt_state = set_plateau_scale(opt_state, plateau.scale)
                        print(f"[cse_tpu] plateau: lr scale -> {plateau.scale:g}")
                best_val = max(best_val, val)
                state = {
                    "params": params, "opt_state": opt_state,
                    "step": step_num, "epoch": epoch,
                    "best_val": best_val,
                    "plateau": (plateau or ReduceLROnPlateau()).state_dict(),
                }
                print(f"Saving checkpoint for Epoch: {epoch}")
                ckpt_lib.save_checkpoint(
                    args.checkpoint_dir, epoch, step_num, val, state
                )
                if val >= best_val:
                    ckpt_lib.save_checkpoint(
                        args.checkpoint_dir, epoch, step_num, val, state, best=True
                    )
            if step_num - 1 == args.tot_iters:
                print("Total Iteration Reached")  # clean stop (vs assert 1==0)
                stop = True
                break
    print("Finishing training")
    if len(sustained_marks) >= 3:
        # end-to-end trainer throughput: host decode/tokenize/prefetch +
        # device synthesis + train step, measured over steady-state blocks
        # (marks[1:] skip the compile-bearing first block). This is the
        # number to hold next to bench.py's device-resident step rate.
        (m0, t0), (m1, t1) = sustained_marks[1], sustained_marks[-1]
        if m1 > m0 and t1 > t0:
            rate = (m1 - m0) * B / (t1 - t0)
            print(f"[cse_tpu] sustained end-to-end throughput: "
                  f"{rate:.3f} mixtures/s ({m1 - m0} microbatches x B={B} "
                  f"over {t1 - t0:.1f} s, steady state)")
    train_loader.close()
    writer.close()
    return params


def _is_torch(path: str) -> bool:
    from cse_tpu.train.checkpoint import _is_torch_ckpt

    return _is_torch_ckpt(path)
