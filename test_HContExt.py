"""Evaluate H-ContExt with cue ablations (--cue joint|history|voice).

TPU-native equivalent of the reference ``test_HContExt.py``: ContExt eval
plus enrollment speaker embeddings; the cue switch reproduces the paper's
history-only / voice-only ablations (reference ``test_HContExt.py:33,223``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from cse_tpu.compat.torch_import import sepformer_from_state_dict
from cse_tpu.core.flags import parse_test_args
from cse_tpu.data.pipeline import EvalLoader, PipelineConfig
from cse_tpu.data.tokenizer import load_tokenizer
from cse_tpu.eval.enrollment import eval_enrollment_embeddings
from cse_tpu.eval.evaluator import evaluate
from cse_tpu.models import Sepformer, SepformerConfig
from cse_tpu.core.banner import announce_assets
from cse_tpu.models.context_encoder import build_context_encoder
from cse_tpu.models.speaker_encoder import configure_speaker_encoder
from cse_tpu.train import checkpoint as ckpt_lib
from cse_tpu.train.loop import _corpus_paths, setup_synthetic
from cse_tpu.train.step import TrainConfig, make_eval_step


def main():
    args = parse_test_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.synthetic_smoke:
        setup_synthetic(args)
        args.test_dataset = args.train_data

    kw = dict(
        num_spks=args.num_max_mix, variant="context", add_se=True,
        compute_dtype=jnp.bfloat16 if (args.bf16 or args.fp16) else jnp.float32,
        use_flash_attention=args.flash_attention,
    )
    model = Sepformer(SepformerConfig(**kw))
    if args.checkpoint:
        restored = ckpt_lib.restore_checkpoint(args.checkpoint)
        if "state_dict" in restored:
            params = sepformer_from_state_dict(restored["state_dict"])
        else:
            params = restored["params"]
    elif args.synthetic_smoke:
        B = 1
        params = model.init(
            jax.random.key(0), jnp.zeros((B, 4000)), jnp.zeros((B, 1, 4096)),
            se=jnp.zeros((B, 1, 192)), cue_index=jnp.asarray(0),
        )
    else:
        raise SystemExit("Please specify checkpoint path (--checkpoint)")

    if args.ecapa_path:
        configure_speaker_encoder(args.ecapa_path)
    tokenizer = load_tokenizer(args.llama_path, args.llama_auth_token)
    llm = build_context_encoder(args.llama_path, ctx_length=args.ctx_length,
                                auth_token=args.llama_auth_token,
                                quant=("w8a8" if args.llama_w8a8 else
                                       "int8" if args.llama_int8 else None))
    announce_assets("test", args, tokenizer=tokenizer, llm=llm,
                    ecapa_path=args.ecapa_path)
    tcfg = TrainConfig(variant="hcontext", num_spks=args.num_max_mix)
    llm_fn, llm_ps = llm.pure()
    eval_step = make_eval_step(model, tcfg, llm_apply=llm_fn,
                               llm_params=llm_ps, cue=args.cue,
                               fused=args.fused_eval)

    paths = _corpus_paths(args)
    pcfg = PipelineConfig(
        max_sp_len=args.max_sp_len, sr=args.sr, num_max_mix=args.num_max_mix,
        context_length=args.context_length, max_ctx_tokens=args.max_ctx_tokens,
        ctx_buckets=tuple(getattr(args, 'ctx_buckets', ()) or ()),
    )
    loader = EvalLoader(
        paths, args.test_dataset, "test", pcfg, tokenizer, args.batch_size,
        num_test_mix=args.num_test_mix, num_workers=args.workers,
    )
    print(f"Num test files: {len(loader)}")

    def prepare_batch(batch):
        """Attach enrollment embeddings (reference rules, dataset :375-391)."""
        batch["se"] = eval_enrollment_embeddings(
            batch, args.test_dataset, "test", paths,
            num_test_mix=args.num_test_mix, seed=args.seed,
            one_sec=args.one_sec,
        )
        return batch

    ckpt_tag = (
        os.path.join(
            *os.path.normpath(os.path.splitext(args.checkpoint)[0]).split(os.sep)[-2:]
        )
        if args.checkpoint
        else "random_init"
    )
    dir_name = f"{args.num_test_mix}_speaker_{args.context_length}_ctx_{args.cue}"
    return evaluate(
        eval_step, params, loader, sr=args.sr,
        save_dir=os.path.join(args.save_dir, ckpt_tag), dir_name=dir_name,
        test_dataset=args.test_dataset, generate_speech=args.generate_speech,
        prepare_batch=prepare_batch,
        metric_workers=args.metric_workers,
        prev_cache_dir=(os.path.join(args.save_dir, "prev_metrics_cache")
                        if args.prev_cache else None),
    )


if __name__ == "__main__":
    main()
