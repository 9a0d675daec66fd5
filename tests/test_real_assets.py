"""Asset-gated real-weight validation (VERDICT r2 'do this' #4).

Skipped (visibly, not silently) unless ``CSE_ASSETS_DIR`` points at the
layout ``scripts/fetch_assets.sh`` documents. The moment the released assets
exist on a machine, ONE command validates the north star
(BASELINE.json: consume released checkpoints, match the reference protocol):

    CSE_ASSETS_DIR=/path/to/assets python -m pytest tests/test_real_assets.py -v

Optionally set ``CSE_DATA_DIR`` (processed corpora root, reference
README.md:60-89 layout) to also run the full reference eval protocol on
DailyTalk 2-speaker through ``test.py``.

These tests run on whatever backend the session has (the conftest pins the
virtual CPU mesh); they validate LOADING + numerical sanity of every released
artifact through the same importers the CLIs use, which is exactly the
last-mile coverage the oracle-parity tests cannot provide.
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ASSETS = os.environ.get("CSE_ASSETS_DIR")
DATA = os.environ.get("CSE_DATA_DIR")
# tests/test_real_assets_selftest.py fabricates random-weight assets to prove
# this suite's MECHANICS; assertions that only hold for trained weights are
# gated off in that mode
_SELFTEST = os.environ.get("CSE_ASSETS_SELFTEST") == "1"

pytestmark = pytest.mark.skipif(
    not ASSETS, reason="CSE_ASSETS_DIR not set (released assets absent; "
    "see scripts/fetch_assets.sh)"
)


def _glob1(*parts):
    hits = sorted(glob.glob(os.path.join(ASSETS, *parts)))
    return hits


# ---- released Sepformer-family checkpoints --------------------------------


def test_released_sepformer_checkpoints_import_and_run():
    """Every released .ckpt imports through the reference-layout importer,
    reports a sane inferred config, and separates a waveform."""
    from cse_tpu.compat.torch_import import (
        infer_reference_config, sepformer_from_state_dict,
    )
    from cse_tpu.models import Sepformer, SepformerConfig
    from cse_tpu.train import checkpoint as ckpt_lib

    ckpts = _glob1("sepformer", "*.ckpt") + _glob1("sepformer", "*.pt")
    if not ckpts:
        pytest.skip("no sepformer/*.ckpt under CSE_ASSETS_DIR")
    for path in ckpts:
        restored = ckpt_lib.restore_checkpoint(path)
        assert "state_dict" in restored, f"{path}: not a reference torch ckpt"
        inferred = infer_reference_config(restored["state_dict"])
        assert inferred["num_spks"] in (2, 3), (path, inferred)
        assert inferred["variant"] in ("base", "contsep", "context"), (path, inferred)
        params = sepformer_from_state_dict(restored["state_dict"])
        model = Sepformer(SepformerConfig(
            num_spks=inferred["num_spks"], variant=inferred["variant"],
            ce=inferred.get("ce", True),
        ))
        mix = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8000)),
                          jnp.float32)
        if inferred["variant"] == "base":
            out = model.apply(params, mix)
        else:
            ctx = jnp.zeros((1, 1, 4096), jnp.float32)
            out = model.apply(params, mix, ctx)
            if inferred["variant"] == "contsep":
                out, logits = out
                assert np.isfinite(np.asarray(logits)).all(), path
        out = np.asarray(out)
        assert out.shape[1] == 8000 and np.isfinite(out).all(), path
        # a real separator must actually modify the mixture
        assert not np.allclose(out[:, :, 0], np.asarray(mix)), path


# ---- frozen external nets --------------------------------------------------


def test_real_ecapa_embeds_speech():
    from cse_tpu.models.ecapa import EcapaEncoder

    hits = _glob1("ecapa", "embedding_model.ckpt")
    if not hits:
        pytest.skip("no ecapa/embedding_model.ckpt under CSE_ASSETS_DIR")
    enc = EcapaEncoder(hits[0])
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 16000)), jnp.float32)
    emb = np.asarray(enc(wav, jnp.asarray([16000, 12000])))
    assert emb.shape == (2, 1, 192) and np.isfinite(emb).all()
    # real speaker embeddings of different signals must differ
    assert np.linalg.norm(emb[0] - emb[1]) > 1e-3


def test_real_whisper_transcribes_and_gates():
    from cse_tpu.eval.cascaded import _non_speech_ids
    from cse_tpu.models.whisper import WhisperASR

    pts = _glob1("whisper", "base.pt") or _glob1("whisper", "*.pt")
    if not pts:
        pytest.skip("no whisper/*.pt under CSE_ASSETS_DIR")
    wtok = None
    try:
        from transformers import WhisperTokenizer

        wtok = WhisperTokenizer.from_pretrained(os.path.dirname(pts[0]))
    except Exception:
        pass
    from cse_tpu.models.whisper import TRANSCRIBE_TEMPERATURES

    asr = WhisperASR(
        weights_path=pts[0], language=None,
        suppress_ids=_non_speech_ids(wtok),
        text_fn=(lambda ids: wtok.decode(ids)) if wtok else None,
        # fabricated selftest weights fail every quality gate, so the full
        # ladder burns 26 base-size decodes per seek iteration on one CPU
        # core for nothing; ladder mechanics are covered by the tiny-config
        # policy tests. Real assets keep the transcribe defaults.
        temperatures=(0.0,) if _SELFTEST else TRANSCRIBE_TEMPERATURES,
    )
    sr = 16000
    t = np.arange(3 * sr) / sr
    tone = (0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    silence = np.zeros(3 * sr, np.float32)
    # 48 tokens bounds the fabricated-weights selftest (random weights fail
    # every gate, so the FULL ladder runs: 26 base-size decodes on CPU);
    # ample for the real model's transcript of a 3 s tone/silence
    res = asr.transcribe_results(
        jnp.asarray(np.stack([tone, silence])), max_tokens=48
    )
    if not _SELFTEST:
        # the real model must recognize silence as nospeech w/ high probability
        assert res[1]["no_speech_prob"] > 0.3, res[1]
    for r in res:
        assert np.isfinite(r["avg_logprob"]) and r["compression_ratio"] > 0


def test_real_llama_loads_and_int8_matches():
    """Real safetensors through the importer; int8 quantization of the real
    weights stays within 1e-2 relative hidden-state error of bf16."""
    from cse_tpu.models.llama import llama_forward, load_llama_params

    d = os.path.join(ASSETS, "llama3-8b")
    if not os.path.exists(os.path.join(d, "config.json")):
        pytest.skip("no llama3-8b/ checkout under CSE_ASSETS_DIR")
    params, cfg = load_llama_params(d, dtype=jnp.float32)
    qparams, _ = load_llama_params(d, dtype=jnp.float32, quant="int8")
    ids = jnp.asarray([[128000, 9906, 1917, 11, 420, 374, 264, 1296]], jnp.int32)
    mask = jnp.ones_like(ids)
    full = np.asarray(llama_forward(params, ids, mask, cfg), np.float64)
    quant = np.asarray(llama_forward(qparams, ids, mask, cfg), np.float64)
    rel = np.linalg.norm(quant - full) / np.linalg.norm(full)
    assert rel < 1e-2, rel


def test_real_llama_tokenizer_loads():
    from cse_tpu.data.tokenizer import load_tokenizer

    d = os.path.join(ASSETS, "llama3-8b")
    if not os.path.exists(os.path.join(d, "tokenizer.json")) and not os.path.exists(
        os.path.join(d, "tokenizer_config.json")
    ):
        pytest.skip("no llama3-8b tokenizer files under CSE_ASSETS_DIR")
    tok = load_tokenizer(d, None)
    assert not getattr(tok, "is_fallback", False)
    ids = tok.encode("Speaker 0: hello there")
    assert len(ids) > 2


# ---- the full reference eval protocol (needs processed corpora too) --------


@pytest.mark.skipif(not DATA, reason="CSE_DATA_DIR not set (processed corpora absent)")
def test_reference_eval_protocol_dailytalk_2spk(tmp_path):
    """README.md:252-275's DailyTalk ContExt eval, end to end, on the real
    released checkpoint + corpora: must produce the result files with finite
    metrics (tolerance vs the paper's numbers is asserted loosely — exact
    replication also depends on the premixed test archives)."""
    import runpy
    import sys

    ckpts = _glob1("sepformer", "*ContExt*dailytalk*") or _glob1(
        "sepformer", "*ContExt*"
    )
    if not ckpts:
        pytest.skip("no released ContExt checkpoint under CSE_ASSETS_DIR")
    argv = [
        "test.py", "--mode", "test", "--test_model", "ContExt",
        "--train_data", "dailytalk", "--test_dataset", "dailytalk",
        "--data_dir", DATA, "--checkpoint", ckpts[0],
        "--llama_path", os.path.join(ASSETS, "llama3-8b"),
        "--num_test_mix", "2", "--batch_size", "1",
        "--save_dir", str(tmp_path),
    ]
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "test.py"),
                       run_name="__main__")
    finally:
        sys.argv = old
    hits = list(tmp_path.rglob("test_results_dailytalk.txt"))
    assert hits
    txt = hits[0].read_text()
    si_snr = float(txt.splitlines()[0].split(":")[1])
    assert np.isfinite(si_snr) and si_snr > 0  # a real model must separate
