"""Cascaded CSE evaluation: Sepformer -> Whisper ASR -> Llama LM selection.

TPU-native equivalent of the reference ``test_cascaded.py`` (same flags,
batch_size must be 1): a plain (non-contextual) Sepformer separates each test
mixture; every stream is transcribed and LM-scored against the dialog history
(mean of per-position max log-softmax — the reference's scoring rule,
``test_cascaded.py:230-231``); the argmax stream is evaluated with
SI-SNR/SDR(+i). Requires the released base-Sepformer checkpoint; Whisper/Llama
assets are used when present locally and stubbed (reported) otherwise.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from cse_tpu.compat.torch_import import (
    infer_reference_config,
    sepformer_from_state_dict,
)
from cse_tpu.core.banner import announce_assets
from cse_tpu.core.flags import parse_test_args
from cse_tpu.data.pipeline import EvalLoader, PipelineConfig, prefetch
from cse_tpu.data.tokenizer import load_tokenizer
from cse_tpu.eval.cascaded import build_cascaded
from cse_tpu.eval.metrics import SdrMetric, SiSnrMetric
from cse_tpu.models import Sepformer, SepformerConfig
from cse_tpu.train import checkpoint as ckpt_lib
from cse_tpu.train.loop import _corpus_paths, setup_synthetic


def main():

    args = parse_test_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.synthetic_smoke:
        setup_synthetic(args)
        args.test_dataset = args.train_data
    assert args.mode == "test"
    assert args.batch_size == 1, "cascaded eval runs at batch_size 1 (reference :103)"

    kw = dict(num_spks=args.num_max_mix, variant="base")
    params = None
    if args.checkpoint:
        restored = ckpt_lib.restore_checkpoint(args.checkpoint)
        if "state_dict" in restored:
            inferred = infer_reference_config(restored["state_dict"])
            kw["num_spks"] = inferred["num_spks"]
            params = sepformer_from_state_dict(restored["state_dict"])
        else:
            params = restored["params"]
    model = Sepformer(SepformerConfig(**kw))
    if params is None:
        if not args.synthetic_smoke:
            raise SystemExit("Please specify checkpoint path (--checkpoint)")
        params = model.init(jax.random.key(0), jnp.zeros((1, 4000)))

    separate = jax.jit(lambda p, mix: model.apply(p, mix))

    tokenizer = load_tokenizer(args.llama_path, args.llama_auth_token)
    whisper_path = getattr(args, "whisper_path", None) or os.environ.get("WHISPER_BASE_PT")
    temps = None
    if args.asr_temperature:
        temps = tuple(float(t) for t in args.asr_temperature.split(","))
    cascade = build_cascaded(
        args.llama_path, whisper_path, tokenizer, sr=args.sr,
        asr_temperatures=temps,
        llama_quant=("w8a8" if args.llama_w8a8 else
                     "int8" if args.llama_int8 else None),
        asr_best_of=args.asr_best_of,
    )
    print(f"[cse_tpu] cascaded stages: {cascade.describe()}")
    announce_assets(
        "test", args, tokenizer=tokenizer, whisper=cascade.asr,
        llm=SimpleNamespace(is_stub=cascade.scorer is None),
    )

    paths = _corpus_paths(args)
    pcfg = PipelineConfig(
        max_sp_len=args.max_sp_len, sr=args.sr, num_max_mix=args.num_max_mix,
        context_length=args.context_length, max_ctx_tokens=args.max_ctx_tokens,
        ctx_buckets=tuple(getattr(args, 'ctx_buckets', ()) or ()),
    )
    loader = EvalLoader(
        paths, args.test_dataset, "test", pcfg, tokenizer, batch_size=1,
        num_test_mix=args.num_test_mix, num_workers=args.workers,
    )
    print(f"Num test files: {len(loader)}")

    from cse_tpu.eval.pesq import PesqMetric

    m_sisnr, m_sdr = SiSnrMetric(), SdrMetric()
    m_sisnr_p, m_sdr_p = SiSnrMetric(), SdrMetric()
    m_pesq = PesqMetric(sr=args.sr)
    # decode of row N+1 overlaps the separator/ASR/scorer work of row N
    for i, batch in enumerate(prefetch(loader.batches(), depth=2)):
        mixed = batch["mixed"]
        est = separate(params, mixed)  # [1, T, spk]
        cands = np.asarray(est[0]).T  # [spk, T]
        idx, transcripts, scores = cascade.select(cands, batch["contexts"][0])
        enhanced = cands[None, idx]
        gt = np.asarray(batch["gt"], np.float64)
        m_sisnr.update(enhanced, gt)
        m_sdr.update(enhanced, gt)
        m_sisnr_p.update(np.asarray(mixed, np.float64), gt)
        m_sdr_p.update(np.asarray(mixed, np.float64), gt)
        m_pesq.update(enhanced, gt, lengths=batch.get("sp_len"))
        if i % 20 == 0:
            print(f"******** Test ({args.test_dataset}) : {i + 1} / {len(loader)} ********")

    res = {
        "si_snr": m_sisnr.compute(),
        "sdr": m_sdr.compute(),
        "si_snr_i": m_sisnr.compute() - m_sisnr_p.compute(),
        "sdr_i": m_sdr.compute() - m_sdr_p.compute(),
        "pesq": m_pesq.compute(),
        "n": m_sisnr.count,
    }
    print("## Test SI-SNR: ", res["si_snr"])
    print("## Test SDR: ", res["sdr"])
    print("## Test SI-SNR-i: ", res["si_snr_i"])
    print("## Test SDR-i: ", res["sdr_i"])
    print("## Test PESQ-p862: ", res["pesq"])

    ckpt_tag = (
        os.path.join(*os.path.normpath(os.path.splitext(args.checkpoint)[0]).split(os.sep)[-2:])
        if args.checkpoint else "random_init"
    )
    dir_name = f"Cascaded_{args.num_test_mix}_speaker_{args.context_length}_ctx_{args.test_dataset}"
    out = os.path.join(args.save_dir, ckpt_tag, dir_name)
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, f"test_results_{args.test_dataset}.txt"), "w") as f:
        f.write(f"Test SI-SNR: {res['si_snr']}\n")
        f.write(f"Test SDR: {res['sdr']}\n")
        f.write(f"Test SI-SNR-i: {res['si_snr_i']}\n")
        f.write(f"Test SDR-i: {res['sdr_i']}\n")
        f.write(f"Test PESQ-p862: {res['pesq']}\n")
    return res


if __name__ == "__main__":
    main()
