"""Evaluate H-ContExt with cue ablations (--cue joint|history|voice).

TPU-native equivalent of the reference ``test_HContExt.py``: ContExt eval
plus enrollment speaker embeddings; the cue switch reproduces the paper's
history-only / voice-only ablations (reference ``test_HContExt.py:33,223``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from cse_tpu.compat.torch_import import sepformer_from_state_dict
from cse_tpu.core.flags import parse_test_args
from cse_tpu.data.audio_io import read_wav
from cse_tpu.data.pipeline import EvalLoader, PipelineConfig
from cse_tpu.data.tokenizer import load_tokenizer
from cse_tpu.data import datasets as ds
from cse_tpu.eval.evaluator import evaluate
from cse_tpu.models import Sepformer, SepformerConfig
from cse_tpu.models.context_encoder import build_context_encoder
from cse_tpu.models.speaker_encoder import configure_speaker_encoder, encode_speaker
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
                                auth_token=args.llama_auth_token)
    tcfg = TrainConfig(variant="hcontext", num_spks=args.num_max_mix)
    eval_step = make_eval_step(model, tcfg, llm_apply=llm, cue=args.cue)

    paths = _corpus_paths(args)
    pcfg = PipelineConfig(
        max_sp_len=args.max_sp_len, sr=args.sr, num_max_mix=args.num_max_mix,
        context_length=args.context_length, max_ctx_tokens=args.max_ctx_tokens,
    )
    loader = EvalLoader(
        paths, args.test_dataset, "test", pcfg, tokenizer, args.batch_size,
        num_test_mix=args.num_test_mix, num_workers=args.workers,
    )
    print(f"Num test files: {len(loader)}")

    def prepare_batch(batch):
        """Attach enrollment embeddings (reference rules, dataset :375-391)."""
        enroll = []
        rng = np.random.default_rng(args.seed)
        for k, name in enumerate(batch["names"]):
            wav16 = None
            if not args.one_sec and args.test_dataset in ("tedlium", "dailytalk"):
                p = ds.enrollment_path(
                    batch["paths"][k], args.test_dataset, "test", paths,
                    args.num_test_mix,
                )
                if p and os.path.exists(p):
                    wav16, _ = read_wav(p)
            if wav16 is None:
                # 1-second crop of the 16 kHz gt (spokenwoz / --one_sec rule;
                # ECAPA consumes 16 kHz, reference dataset :375-391)
                gt = np.asarray(batch["gt16k"][k])
                n = int(batch["gt16k_len"][k])
                seg = 16000
                st = int(rng.integers(0, max(n - seg, 1)))
                wav16 = gt[st : st + seg]
            enroll.append(wav16[: 5 * 16000])
        T = max(len(e) for e in enroll)
        buf = np.zeros((len(enroll), T), np.float32)
        lens = np.zeros(len(enroll), np.int32)
        for k, e in enumerate(enroll):
            buf[k, : len(e)] = e
            lens[k] = len(e)
        batch["se"] = encode_speaker(jnp.asarray(buf), lens)
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
    )


if __name__ == "__main__":
    main()
