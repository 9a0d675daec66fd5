"""Whisper: frontend shapes, encoder determinism, greedy decode mechanics,
and importer key mapping — on a tiny random config (no released weights in
this environment)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cse_tpu.models.whisper import (
    WhisperASR,
    WhisperConfig,
    random_whisper_params,
    whisper_encode,
    whisper_from_state_dict,
    whisper_greedy_decode,
    whisper_log_mel,
)

TINY = WhisperConfig(
    n_mels=80, n_vocab=51865, n_audio_ctx=100, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=32, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)


def _mel(rng, B=1, cfg=TINY):
    wav = jnp.asarray(rng.standard_normal((B, cfg.n_audio_ctx * 2 * 160)).astype(np.float32))
    return whisper_log_mel(wav, cfg.n_mels, n_frames=cfg.n_audio_ctx * 2)


def test_log_mel_range(rng):
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    mel = whisper_log_mel(wav)
    assert mel.shape == (2, 3000, 80)
    m = np.asarray(mel)
    assert m.min() >= -2.0 - 1e-5 and np.isfinite(m).all()


def test_encoder_shape(rng):
    params = jax.tree.map(jnp.asarray, random_whisper_params(TINY))
    feats = whisper_encode(params, _mel(rng, 2), TINY)
    assert feats.shape == (2, TINY.n_audio_ctx, TINY.n_audio_state)
    assert np.isfinite(np.asarray(feats)).all()


def test_greedy_decode_runs_and_stops(rng):
    params = random_whisper_params(TINY)
    # bias the EOT logit so decode terminates quickly
    params["tok_emb"][TINY.eot] *= 5.0
    params = jax.tree.map(jnp.asarray, params)
    toks, lens = whisper_greedy_decode(params, _mel(rng, 2), TINY, max_tokens=8)
    assert toks.shape == (2, 8)
    assert (np.asarray(lens) <= 8).all()


def test_decode_batch_consistency(rng):
    """Decoding [a, b] batched == decoding a and b separately (greedy)."""
    params = jax.tree.map(jnp.asarray, random_whisper_params(TINY))
    mel = _mel(rng, 2)
    t_all, l_all = whisper_greedy_decode(params, mel, TINY, max_tokens=6)
    t0, _ = whisper_greedy_decode(params, mel[:1], TINY, max_tokens=6)
    np.testing.assert_array_equal(np.asarray(t_all)[0], np.asarray(t0)[0])


def test_importer_roundtrip(rng):
    """OpenAI-layout state_dict -> our tree -> same encoder output as direct
    random params of the same values."""
    cfg = TINY
    D = cfg.n_audio_state
    g = np.random.default_rng(0)
    sd = {}

    def add_lin(name, din, dout, bias=True):
        sd[f"{name}.weight"] = g.standard_normal((dout, din)).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = np.zeros(dout, np.float32)

    def add_ln(name, d=D):
        sd[f"{name}.weight"] = np.ones(d, np.float32)
        sd[f"{name}.bias"] = np.zeros(d, np.float32)

    sd["encoder.conv1.weight"] = g.standard_normal((D, cfg.n_mels, 3)).astype(np.float32) * 0.05
    sd["encoder.conv1.bias"] = np.zeros(D, np.float32)
    sd["encoder.conv2.weight"] = g.standard_normal((D, D, 3)).astype(np.float32) * 0.05
    sd["encoder.conv2.bias"] = np.zeros(D, np.float32)
    for i in range(cfg.n_audio_layer):
        add_ln(f"encoder.blocks.{i}.attn_ln")
        for nm, b in (("query", True), ("key", False), ("value", True), ("out", True)):
            add_lin(f"encoder.blocks.{i}.attn.{nm}", D, D, b)
        add_ln(f"encoder.blocks.{i}.mlp_ln")
        add_lin(f"encoder.blocks.{i}.mlp.0", D, 4 * D)
        add_lin(f"encoder.blocks.{i}.mlp.2", 4 * D, D)
    add_ln("encoder.ln_post")
    sd["decoder.token_embedding.weight"] = g.standard_normal((cfg.n_vocab, D)).astype(np.float32) * 0.02
    sd["decoder.positional_embedding"] = g.standard_normal((cfg.n_text_ctx, D)).astype(np.float32) * 0.02
    for i in range(cfg.n_text_layer):
        add_ln(f"decoder.blocks.{i}.attn_ln")
        add_ln(f"decoder.blocks.{i}.cross_attn_ln")
        add_ln(f"decoder.blocks.{i}.mlp_ln")
        for pre in ("attn", "cross_attn"):
            for nm, b in (("query", True), ("key", False), ("value", True), ("out", True)):
                add_lin(f"decoder.blocks.{i}.{pre}.{nm}", D, D, b)
        add_lin(f"decoder.blocks.{i}.mlp.0", D, 4 * D)
        add_lin(f"decoder.blocks.{i}.mlp.2", 4 * D, D)
    add_ln("decoder.ln")

    params = jax.tree.map(jnp.asarray, whisper_from_state_dict(sd, cfg))
    feats = whisper_encode(params, _mel(rng), cfg)
    assert np.isfinite(np.asarray(feats)).all()
    asr = WhisperASR(params=jax.tree.map(np.asarray, params), cfg=cfg)
    toks, lens = asr.transcribe_tokens(
        jnp.zeros((1, cfg.n_audio_ctx * 2 * 160)), max_tokens=4
    )
    assert toks.shape == (1, 4)
