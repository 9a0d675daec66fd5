"""Evaluate ContSep / ContExt on released premixed test sets.

TPU-native equivalent of the reference ``test.py`` (same flags): loads a
checkpoint (released PyTorch ``.ckpt`` or cse_tpu orbax), runs the full test
set, reports SI-SNR / SDR / improvements / stream-selection accuracy, and
writes ``test_results_{ds}.txt`` + ``acc_{ds}.txt`` under
``{save_dir}/{ckpt}/{num_test_mix}_speaker_{context_length}_ctx``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from cse_tpu.compat.torch_import import (
    infer_reference_config,
    sepformer_from_state_dict,
)
from cse_tpu.core.flags import parse_test_args
from cse_tpu.data.pipeline import EvalLoader, PipelineConfig
from cse_tpu.data.tokenizer import load_tokenizer
from cse_tpu.eval.evaluator import evaluate
from cse_tpu.models import Sepformer, SepformerConfig
from cse_tpu.core.banner import announce_assets
from cse_tpu.models.context_encoder import build_context_encoder
from cse_tpu.train import checkpoint as ckpt_lib
from cse_tpu.train.loop import _corpus_paths, setup_synthetic
from cse_tpu.train.step import TrainConfig, make_eval_step


def build_test_model(args):
    """Model + params from --checkpoint (config inferred for torch ckpts)."""
    assert args.test_model in ("ContExt", "ContSep")
    variant = "context" if args.test_model == "ContExt" else "contsep"
    ce = False if args.test_dataset == "dailytalk" else True
    kw = dict(
        num_spks=args.num_max_mix,
        variant=variant,
        ce=ce,
        compute_dtype=jnp.bfloat16 if (args.bf16 or args.fp16) else jnp.float32,
        use_flash_attention=args.flash_attention,
    )
    params = None
    if args.checkpoint:
        restored = ckpt_lib.restore_checkpoint(args.checkpoint)
        if "state_dict" in restored:
            inferred = infer_reference_config(restored["state_dict"])
            kw.update(
                num_spks=inferred["num_spks"], ce=inferred["ce"],
                variant=inferred["variant"],
            )
            params = sepformer_from_state_dict(restored["state_dict"])
        else:
            params = restored["params"]
    model = Sepformer(SepformerConfig(**kw))
    if params is None:
        if not args.synthetic_smoke:
            raise SystemExit("Please specify checkpoint path (--checkpoint)")
        B = 1
        ctx = jnp.zeros((B, 1, 4096))
        params = model.init(jax.random.key(0), jnp.zeros((B, 4000)), ctx)
    return model, params, model.cfg


def main():
    args = parse_test_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.synthetic_smoke:
        setup_synthetic(args)
        args.test_dataset = args.train_data
    assert args.mode == "test"

    model, params, mcfg = build_test_model(args)
    tokenizer = load_tokenizer(args.llama_path, args.llama_auth_token)
    # ContSep consumes the final hidden state only (reference test.py:226).
    # For ContExt we honor --ctx_length like training and test_HContExt do;
    # the reference's test.py hardcodes [:, -1:], which silently mis-evaluates
    # ctx_length>1 models (documented deviation; identical at the default 1).
    llm = build_context_encoder(
        args.llama_path,
        ctx_length=1 if mcfg.variant == "contsep" else args.ctx_length,
        auth_token=args.llama_auth_token,
        quant=("w8a8" if args.llama_w8a8
               else "int8" if args.llama_int8 else None),
    )
    announce_assets("test", args, tokenizer=tokenizer, llm=llm)
    tcfg = TrainConfig(
        variant="contsep" if mcfg.variant == "contsep" else "context",
        num_spks=mcfg.num_spks, use_ce=mcfg.ce,
    )
    llm_fn, llm_ps = llm.pure()
    eval_step = make_eval_step(model, tcfg, llm_apply=llm_fn,
                               llm_params=llm_ps, fused=args.fused_eval)

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

    if args.checkpoint:
        ckpt_tag = os.path.join(
            *os.path.normpath(os.path.splitext(args.checkpoint)[0]).split(os.sep)[-2:]
        )
    else:
        ckpt_tag = "random_init"
    save_dir = os.path.join(args.save_dir, ckpt_tag)
    dir_name = f"{args.num_test_mix}_speaker_{args.context_length}_ctx"

    results = evaluate(
        eval_step, params, loader, sr=args.sr,
        save_dir=save_dir, dir_name=dir_name, test_dataset=args.test_dataset,
        generate_speech=args.generate_speech,
        metric_workers=args.metric_workers,
        prev_cache_dir=(os.path.join(args.save_dir, "prev_metrics_cache")
                        if args.prev_cache else None),
    )
    return results


if __name__ == "__main__":
    main()
