"""Cascaded selector: scoring math (max-log-softmax quirk) with a real (tiny)
Llama scorer, stream selection, and stub fallbacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cse_tpu.data.tokenizer import ByteTokenizer
from cse_tpu.eval.cascaded import CascadedSelector
from cse_tpu.models.whisper import WhisperASR, WhisperConfig

TINY_WHISPER = WhisperConfig(
    n_mels=80, n_vocab=51865, n_audio_ctx=50, n_audio_state=64,
    n_audio_head=4, n_audio_layer=1, n_text_ctx=16, n_text_state=64,
    n_text_head=4, n_text_layer=1,
)


@pytest.fixture(scope="module")
def tiny_llama_scorer(tmp_path_factory):
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM
    import torch

    from cse_tpu.models.llama import LlamaContextEncoder

    torch.manual_seed(0)
    cfg = HFConfig(
        vocab_size=300, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    d = tmp_path_factory.mktemp("llama_sc")
    LlamaForCausalLM(cfg).save_pretrained(str(d), safe_serialization=True)
    enc = LlamaContextEncoder(str(d), dtype=jnp.float32)
    return enc


def test_lm_score_quirk(tiny_llama_scorer):
    """Score = mean over transcript positions of the per-position MAX
    log-softmax (not the realized token's log-prob)."""
    sel = CascadedSelector(
        WhisperASR(cfg=TINY_WHISPER), tiny_llama_scorer.score_logits, ByteTokenizer()
    )
    ctx, cand = "hello there", "hi"
    score = sel._lm_score(ctx, cand)
    # recompute by hand
    tok = ByteTokenizer()
    cand_ids = tok.encode(cand)[1:]
    ids = jnp.asarray([tok.encode(ctx) + cand_ids], jnp.int32)
    logits = tiny_llama_scorer.score_logits(ids, jnp.ones_like(ids))
    lp = jax.nn.log_softmax(logits[:, -len(cand_ids):], axis=-1)
    expect = float(jnp.max(lp, axis=-1).sum() / len(cand_ids))
    assert abs(score - expect) < 1e-5
    assert sel._lm_score(ctx, "") == -1e9  # empty transcript guard


def test_select_runs_end_to_end(tiny_llama_scorer, rng):
    sel = CascadedSelector(
        WhisperASR(cfg=TINY_WHISPER, temperatures=(0.0,)),
        tiny_llama_scorer.score_logits,
        ByteTokenizer(), sr=8000,
    )
    cands = rng.standard_normal((2, 8000)).astype(np.float32)
    idx, transcripts, scores = sel.select(cands, "Speaker 0: hello/nSpeaker 1: ")
    assert idx in (0, 1) and len(transcripts) == 2 and len(scores) == 2
    assert np.isfinite(scores).all()


def test_batched_scores_match_per_row(tiny_llama_scorer):
    """_lm_scores (one [n, L] scorer call per mixture) == sequential
    _lm_score per transcript: the shared max-length bucket must not change
    any row's score (padding-invariance contract) and empty rows keep the
    -1e9 floor without joining the batch."""
    sel = CascadedSelector(
        WhisperASR(cfg=TINY_WHISPER), tiny_llama_scorer.score_logits, ByteTokenizer()
    )
    ctx = "Speaker 0: how are you/nSpeaker 1: "
    transcripts = ["fine thanks and you", "", "what did you just say to me"]
    batch = sel._lm_scores(ctx, transcripts)
    seq = [sel._lm_score(ctx, t) for t in transcripts]
    assert batch[1] == -1e9
    np.testing.assert_allclose(batch, seq, rtol=1e-5, atol=1e-6)


def test_stub_scorer_deterministic(rng):
    sel = CascadedSelector(WhisperASR(cfg=TINY_WHISPER), None, ByteTokenizer())
    s1 = sel._lm_score("ctx", "some words here")
    s2 = sel._lm_score("ctx", "some words here")
    assert s1 == s2 and np.isfinite(s1)
    assert "llm=stub" in sel.describe()
