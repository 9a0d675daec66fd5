"""Whisper: numerical parity vs oracles (HF WhisperFeatureExtractor for the
log-mel frontend; a compact torch Whisper in the OpenAI ``base.pt`` layout
for encoder/decoder, same methodology as the Sepformer oracle), plus decode
mechanics and importer key mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from cse_tpu.models.whisper import (
    WhisperASR,
    WhisperConfig,
    mel_filters_slaney,
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


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------


def test_mel_filters_match_slaney_oracle():
    """Our filterbank == librosa-semantics slaney filters (the matrix OpenAI
    whisper ships in mel_filters.npz), via transformers.audio_utils."""
    from transformers.audio_utils import mel_filter_bank

    ours = mel_filters_slaney(80, 400, 16000)
    ref = mel_filter_bank(
        num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_log_mel_matches_whisper_frontend(rng):
    """Full log-mel vs HF WhisperFeatureExtractor (which reproduces OpenAI
    whisper's pad/STFT/mel/clamp chain exactly) — VERDICT missing #3."""
    from transformers import WhisperFeatureExtractor

    wav = (rng.standard_normal(16000 * 3) * 0.2).astype(np.float32)
    fe = WhisperFeatureExtractor()
    ref = fe([wav], sampling_rate=16000, return_tensors="np")["input_features"][0]
    ours = np.asarray(whisper_log_mel(jnp.asarray(wav[None])))[0].T
    assert ours.shape == ref.shape == (80, 3000)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


class _TorchMHA(nn.Module):
    """OpenAI whisper MultiHeadAttention: q/k scaled by d_head**-0.25,
    key has no bias."""

    def __init__(self, D, H):
        super().__init__()
        self.query = nn.Linear(D, D)
        self.key = nn.Linear(D, D, bias=False)
        self.value = nn.Linear(D, D)
        self.out = nn.Linear(D, D)
        self.H = H

    def forward(self, x, xa=None, causal=False):
        src = x if xa is None else xa
        q, k, v = self.query(x), self.key(src), self.value(src)
        B, Tq, D = q.shape
        Tk = k.shape[1]
        hd = D // self.H
        scale = hd**-0.25
        q = q.view(B, Tq, self.H, hd).permute(0, 2, 1, 3) * scale
        k = k.view(B, Tk, self.H, hd).permute(0, 2, 1, 3) * scale
        v = v.view(B, Tk, self.H, hd).permute(0, 2, 1, 3)
        logits = q @ k.transpose(-1, -2)
        if causal:
            mask = torch.full((Tq, Tk), float("-inf")).triu(1)
            logits = logits + mask
        w = torch.softmax(logits.float(), dim=-1)
        out = (w @ v).permute(0, 2, 1, 3).reshape(B, Tq, D)
        return self.out(out)


class _TorchBlock(nn.Module):
    def __init__(self, D, H, cross=False):
        super().__init__()
        self.attn_ln = nn.LayerNorm(D)
        self.attn = _TorchMHA(D, H)
        if cross:
            self.cross_attn_ln = nn.LayerNorm(D)
            self.cross_attn = _TorchMHA(D, H)
        self.mlp_ln = nn.LayerNorm(D)
        self.mlp = nn.Sequential(nn.Linear(D, 4 * D), nn.GELU(), nn.Linear(4 * D, D))
        self.cross = cross

    def forward(self, x, xa=None, causal=False):
        x = x + self.attn(self.attn_ln(x), causal=causal)
        if self.cross:
            x = x + self.cross_attn(self.cross_attn_ln(x), xa=xa)
        return x + self.mlp(self.mlp_ln(x))


def _torch_sinusoids(length, channels):
    import math

    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv = torch.exp(-log_timescale * torch.arange(channels // 2))
    t = torch.arange(length)[:, None] * inv[None, :]
    return torch.cat([torch.sin(t), torch.cos(t)], dim=1)


class _TorchWhisper(nn.Module):
    """Compact torch Whisper (published architecture, OpenAI key layout)."""

    def __init__(self, cfg):
        super().__init__()
        D, cfgH = cfg.n_audio_state, cfg.n_audio_head
        enc = nn.Module()
        enc.conv1 = nn.Conv1d(cfg.n_mels, D, 3, padding=1)
        enc.conv2 = nn.Conv1d(D, D, 3, stride=2, padding=1)
        enc.blocks = nn.ModuleList(
            [_TorchBlock(D, cfgH) for _ in range(cfg.n_audio_layer)]
        )
        enc.ln_post = nn.LayerNorm(D)
        self.encoder = enc
        dec = nn.Module()
        dec.token_embedding = nn.Embedding(cfg.n_vocab, cfg.n_text_state)
        dec.positional_embedding = nn.Parameter(
            torch.randn(cfg.n_text_ctx, cfg.n_text_state) * 0.02
        )
        dec.blocks = nn.ModuleList(
            [_TorchBlock(cfg.n_text_state, cfg.n_text_head, cross=True)
             for _ in range(cfg.n_text_layer)]
        )
        dec.ln = nn.LayerNorm(cfg.n_text_state)
        self.decoder = dec
        self.cfg = cfg

    def encode(self, mel):  # [B, T, n_mels]
        x = F.gelu(self.encoder.conv1(mel.transpose(1, 2)))
        x = F.gelu(self.encoder.conv2(x)).transpose(1, 2)
        x = x + _torch_sinusoids(x.shape[1], x.shape[2])
        for blk in self.encoder.blocks:
            x = blk(x)
        return self.encoder.ln_post(x)

    def decode(self, tokens, audio):  # teacher-forced full-seq logits
        x = self.decoder.token_embedding(tokens)
        x = x + self.decoder.positional_embedding[: tokens.shape[1]]
        for blk in self.decoder.blocks:
            x = blk(x, xa=audio, causal=True)
        x = self.decoder.ln(x)
        return x @ self.decoder.token_embedding.weight.T


_ORACLE_CFG = WhisperConfig(
    n_mels=80, n_vocab=120, n_audio_ctx=50, n_audio_state=32,
    n_audio_head=4, n_audio_layer=2, n_text_ctx=16, n_text_state=32,
    n_text_head=4, n_text_layer=2,
)


def test_encoder_matches_torch_oracle(rng):
    torch.manual_seed(0)
    model = _TorchWhisper(_ORACLE_CFG).eval()
    mel = np.asarray(_mel(rng, 2, _ORACLE_CFG), np.float32)
    with torch.no_grad():
        ref = model.encode(torch.from_numpy(mel)).numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, whisper_from_state_dict(sd, _ORACLE_CFG))
    ours = np.asarray(whisper_encode(params, jnp.asarray(mel), _ORACLE_CFG))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_decoder_steps_match_torch_oracle(rng):
    """The production KV-cached _decoder_step, run position by position,
    must reproduce the torch oracle's teacher-forced logits."""
    from cse_tpu.models.whisper import _decoder_step

    cfg = _ORACLE_CFG
    torch.manual_seed(1)
    model = _TorchWhisper(cfg).eval()
    mel = np.asarray(_mel(rng, 2, cfg), np.float32)
    toks = np.asarray([[5, 17, 99, 3, 42], [7, 7, 1, 0, 100]], np.int32)
    with torch.no_grad():
        audio_t = model.encode(torch.from_numpy(mel))
        ref = model.decode(torch.from_numpy(toks.astype(np.int64)), audio_t).numpy()

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, whisper_from_state_dict(sd, cfg))
    audio = whisper_encode(params, jnp.asarray(mel), cfg)
    ak, av = [], []
    for li in range(cfg.n_text_layer):
        lp = jax.tree.map(lambda a: a[li], params["dec_layers"])
        ak.append(audio @ lp["cross"]["k_w"])
        av.append(audio @ lp["cross"]["v_w"] + lp["cross"]["v_b"])
    audio_kv = {"k": jnp.stack(ak), "v": jnp.stack(av)}
    kv = {
        "k": jnp.zeros((cfg.n_text_layer, 2, cfg.n_text_ctx, cfg.n_text_state)),
        "v": jnp.zeros((cfg.n_text_layer, 2, cfg.n_text_ctx, cfg.n_text_state)),
    }
    for pos in range(toks.shape[1]):
        logits, kv = _decoder_step(
            params, cfg, jnp.asarray(toks[:, pos]), jnp.asarray(pos), kv, audio_kv
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref[:, pos], rtol=1e-4, atol=1e-4
        )


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
    """EOT must actually terminate decoding early (lens < max_tokens).

    Deterministic construction: final-LN scale 0 makes the decoder output the
    LN bias vector b at every position, so logits are constant; tok_emb[eot]
    = 10*b then guarantees EOT wins argmax everywhere. SuppressBlank bars EOT
    at the first content position, so exactly ONE content token is emitted.
    """
    params = random_whisper_params(TINY)
    D = TINY.n_text_state
    b = np.linspace(0.5, 1.5, D).astype(np.float32)
    params["dec_ln"] = {"scale": np.zeros(D, np.float32), "bias": b}
    params["tok_emb"] = params["tok_emb"] * 0.01
    params["tok_emb"][TINY.eot] = 10.0 * b
    params = jax.tree.map(jnp.asarray, params)
    toks, lens = whisper_greedy_decode(params, _mel(rng, 2), TINY, max_tokens=8)
    assert toks.shape == (2, 8)
    lens = np.asarray(lens)
    assert (lens == 1).all(), lens  # stopped early, not at the cap
    assert (np.asarray(toks)[:, 0] != TINY.eot).all()  # SuppressBlank held


def test_decode_batch_consistency(rng):
    """Decoding [a, b] batched == decoding a and b separately (greedy) — for
    EVERY row, so KV-cache bugs on non-leading batch rows can't hide."""
    params = jax.tree.map(jnp.asarray, random_whisper_params(TINY))
    mel = _mel(rng, 2)
    t_all, l_all = whisper_greedy_decode(params, mel, TINY, max_tokens=6)
    t0, _ = whisper_greedy_decode(params, mel[:1], TINY, max_tokens=6)
    t1, _ = whisper_greedy_decode(params, mel[1:], TINY, max_tokens=6)
    np.testing.assert_array_equal(np.asarray(t_all)[0], np.asarray(t0)[0])
    np.testing.assert_array_equal(np.asarray(t_all)[1], np.asarray(t1)[0])


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


# ---------------------------------------------------------------------------
# whisper.transcribe default policy (temperature fallback / gates / language)
# ---------------------------------------------------------------------------


def _peaked_params(cfg=TINY, win_token=1234):
    """dec_ln scale 0 + dominant tok_emb row => every step emits win_token
    with near-certain probability (a degenerate repetition loop)."""
    params = random_whisper_params(cfg)
    D = cfg.n_text_state
    b = np.linspace(0.5, 1.5, D).astype(np.float32)
    params["dec_ln"] = {"scale": np.zeros(D, np.float32), "bias": b}
    params["tok_emb"] = params["tok_emb"] * 0.001
    params["tok_emb"][win_token] = 10.0 * b
    return jax.tree.map(jnp.asarray, params)


def test_sum_logprob_matches_teacher_forcing(rng):
    """In-loop sum_logprob == independent teacher-forced recomputation with
    the same suppression masks (including the terminating EOT's logprob)."""
    from cse_tpu.models.whisper import (
        _cross_kv, _decoder_step, _suppress_masks, whisper_decode,
        whisper_encode,
    )

    params = jax.tree.map(jnp.asarray, random_whisper_params(TINY))
    mel = _mel(rng, 2)
    toks, lens, slp, _ = whisper_decode(
        params, mel, TINY,
        jnp.full((2,), TINY.token_lang_en, jnp.int32),
        jnp.asarray(0.0), jax.random.PRNGKey(0), max_tokens=6,
    )
    toks, lens, slp = map(np.asarray, (toks, lens, slp))

    audio = whisper_encode(params, mel, TINY)
    audio_kv = _cross_kv(params, audio, TINY)
    never, first = _suppress_masks(TINY, ())
    kv = {
        "k": jnp.zeros((TINY.n_text_layer, 2, TINY.n_text_ctx, TINY.n_text_state)),
        "v": jnp.zeros((TINY.n_text_layer, 2, TINY.n_text_ctx, TINY.n_text_state)),
    }
    prompt = [TINY.sot, TINY.token_lang_en, TINY.token_transcribe, TINY.token_notimestamps]
    want = np.zeros(2)
    done = np.zeros(2, bool)
    seq = [np.full(2, p) for p in prompt] + [toks[:, j] for j in range(toks.shape[1])]
    for i in range(len(seq) - 1):
        logits, kv = _decoder_step(
            params, TINY, jnp.asarray(seq[i], jnp.int32), jnp.asarray(i), kv, audio_kv
        )
        logits = logits + never
        if i + 1 == len(prompt):
            logits = logits + first
        lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        if i + 1 >= len(prompt):
            nxt = seq[i + 1]
            for b in range(2):
                if not done[b]:
                    want[b] += lp[b, nxt[b]]
                    if nxt[b] == TINY.eot:
                        done[b] = True
    np.testing.assert_allclose(slp, want, rtol=1e-4, atol=1e-4)


def test_no_speech_prob_matches_first_step(rng):
    """no_speech_prob == softmax(RAW first-step logits)[<|nospeech|>]."""
    from cse_tpu.models.whisper import (
        _cross_kv, _decoder_step, whisper_decode, whisper_encode,
    )

    params = jax.tree.map(jnp.asarray, random_whisper_params(TINY))
    mel = _mel(rng, 2)
    _, _, _, nsp = whisper_decode(
        params, mel, TINY, jnp.full((2,), TINY.token_lang_en, jnp.int32),
        jnp.asarray(0.0), jax.random.PRNGKey(0), max_tokens=4,
    )
    audio = whisper_encode(params, mel, TINY)
    audio_kv = _cross_kv(params, audio, TINY)
    kv = {
        "k": jnp.zeros((TINY.n_text_layer, 2, TINY.n_text_ctx, TINY.n_text_state)),
        "v": jnp.zeros((TINY.n_text_layer, 2, TINY.n_text_ctx, TINY.n_text_state)),
    }
    logits, _ = _decoder_step(
        params, TINY, jnp.full((2,), TINY.sot, jnp.int32), jnp.asarray(0), kv, audio_kv
    )
    want = np.asarray(jax.nn.softmax(logits, axis=-1))[:, TINY.token_nospeech]
    np.testing.assert_allclose(np.asarray(nsp), want, rtol=1e-5, atol=1e-6)


def test_sampled_decode_deterministic_and_t0_limit(rng):
    """Same key => identical samples; temperature->0 recovers greedy."""
    from cse_tpu.models.whisper import whisper_decode

    params = jax.tree.map(jnp.asarray, random_whisper_params(TINY))
    mel = _mel(rng, 2)
    lang = jnp.full((2,), TINY.token_lang_en, jnp.int32)
    a = whisper_decode(params, mel, TINY, lang, jnp.asarray(1.0),
                       jax.random.PRNGKey(7), max_tokens=6)
    b = whisper_decode(params, mel, TINY, lang, jnp.asarray(1.0),
                       jax.random.PRNGKey(7), max_tokens=6)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    tiny_t = whisper_decode(params, mel, TINY, lang, jnp.asarray(1e-5),
                            jax.random.PRNGKey(7), max_tokens=6)
    greedy = whisper_decode(params, mel, TINY, lang, jnp.asarray(0.0),
                            jax.random.PRNGKey(7), max_tokens=6)
    np.testing.assert_array_equal(np.asarray(tiny_t[0]), np.asarray(greedy[0]))


def test_detect_language_restricted_and_argmax(rng):
    """detect_language only ever returns a language token, and returns the
    engineered winner when one language embedding dominates."""
    from cse_tpu.models.whisper import _N_LANGUAGES, whisper_detect_language

    win = TINY.token_lang_en + 11
    params = _peaked_params(win_token=win)
    lang, probs = whisper_detect_language(params, _mel(rng, 2), TINY)
    lang = np.asarray(lang)
    assert (lang == win).all(), lang
    assert (lang >= TINY.token_lang_en).all()
    assert (lang < TINY.token_lang_en + _N_LANGUAGES).all()
    p = np.asarray(probs)
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)
    assert p[:, : TINY.token_lang_en].max() == 0.0  # mass only on languages

    # random params: still restricted to the language range
    params2 = jax.tree.map(jnp.asarray, random_whisper_params(TINY))
    lang2, _ = whisper_detect_language(params2, _mel(rng, 1), TINY)
    assert TINY.token_lang_en <= int(lang2[0]) < TINY.token_lang_en + _N_LANGUAGES


# -- policy gates vs an independent oracle of whisper/transcribe.py ---------


def _oracle_transcribe_policy(candidates, crt=2.4, lpt=-1.0, nst=0.6):
    """Literal restatement of openai-whisper transcribe.py's
    decode_with_fallback + segment-skip control flow: iterate the temperature
    ladder, retry while too-repetitive or too-unlikely (silence exempt),
    then decide the skip flag from no_speech_prob with the logprob override.
    candidates: {temperature: (avg_logprob, compression_ratio, no_speech_prob)}.
    Returns (accepted_temperature, skipped)."""
    temps = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    decode_result = None
    for t in temps:
        decode_result = candidates[t]
        avg_logprob, cr, no_speech_prob = decode_result
        needs_fb = False
        if crt is not None and cr > crt:
            needs_fb = True
        if lpt is not None and avg_logprob < lpt:
            needs_fb = True
        if nst is not None and no_speech_prob > nst:
            needs_fb = False
        if not needs_fb:
            return t, _oracle_skip(avg_logprob, no_speech_prob, lpt, nst)
    avg_logprob, _, no_speech_prob = decode_result
    return temps[-1], _oracle_skip(avg_logprob, no_speech_prob, lpt, nst)


def _oracle_skip(avg_logprob, no_speech_prob, lpt, nst):
    should_skip = no_speech_prob > nst
    if lpt is not None and avg_logprob > lpt:
        should_skip = False
    return should_skip


def test_policy_gates_match_oracle():
    """needs_fallback/is_silent reproduce the oracle on a grid straddling
    every threshold (cr 2.4, avg_lp -1.0, nospeech 0.6)."""
    from cse_tpu.models.whisper import (
        TRANSCRIBE_TEMPERATURES, is_silent, needs_fallback,
    )

    grid_lp = [-3.0, -1.01, -1.0, -0.99, -0.2]
    grid_cr = [1.0, 2.39, 2.4, 2.41, 9.0]
    grid_ns = [0.0, 0.59, 0.6, 0.61, 0.99]
    rng = np.random.default_rng(0)
    for lp0 in grid_lp:
        for cr0 in grid_cr:
            for ns0 in grid_ns:
                # a random candidate per rung; rung 0 takes the grid point
                cands = {0.0: (lp0, cr0, ns0)}
                for t in TRANSCRIBE_TEMPERATURES[1:]:
                    cands[t] = (
                        float(rng.uniform(-3, 0)),
                        float(rng.uniform(1, 4)),
                        float(rng.uniform(0, 1)),
                    )
                want_t, want_skip = _oracle_transcribe_policy(cands)
                # drive our gate functions through the same ladder
                got_t = None
                for i, t in enumerate(TRANSCRIBE_TEMPERATURES):
                    lp, cr, ns = cands[t]
                    if not needs_fallback(lp, cr, ns) or i + 1 == len(
                        TRANSCRIBE_TEMPERATURES
                    ):
                        got_t = t
                        break
                lp, _, ns = cands[got_t]
                assert got_t == want_t, (lp0, cr0, ns0)
                assert is_silent(lp, ns) == want_skip, (lp0, cr0, ns0)


def test_fallback_fires_on_degenerate_repetition(rng):
    """A decoder stuck in a high-confidence repetition loop (cr >> 2.4 with
    avg_lp ~ 0) must trigger the temperature ladder; the accepted result
    carries temperature > 0 — VERDICT r2 'do this' #1's done-criterion."""
    params = _peaked_params(win_token=1234)
    asr = WhisperASR(params=jax.tree.map(np.asarray, params), cfg=TINY)
    wav = jnp.asarray(rng.standard_normal((1, TINY.n_audio_ctx * 2 * 160)).astype(np.float32))
    res = asr.transcribe_results(wav, max_tokens=24)[0]
    assert res["temperature"] > 0.0, res
    # and the greedy rung really was degenerate repetition
    toks0, lens0 = asr.transcribe_tokens(wav, max_tokens=24)
    assert (toks0[0, : int(lens0[0])] == 1234).all()


def test_silence_overrides_fallback(rng):
    """High <|nospeech|> probability + low avg logprob: no retries (silence
    is exempt from fallback) and the row is flagged silent, at t=0."""
    params = _peaked_params(win_token=TINY.token_nospeech)
    asr = WhisperASR(params=jax.tree.map(np.asarray, params), cfg=TINY)
    wav = jnp.asarray(rng.standard_normal((1, TINY.n_audio_ctx * 2 * 160)).astype(np.float32))
    res = asr.transcribe_results(wav, max_tokens=8)[0]
    assert res["no_speech_prob"] > 0.99
    assert res["temperature"] == 0.0  # never retried
    assert res["silent"] is True
    assert res["avg_logprob"] < -1.0


def test_asr_rejects_unsupported_pinned_language():
    """Only 'en' has a pinned prompt id; any other pin must raise instead of
    silently decoding with <|en|> (language=None auto-detects)."""
    with pytest.raises(ValueError, match="unsupported"):
        WhisperASR(params=jax.tree.map(np.asarray, random_whisper_params(TINY)),
                   cfg=TINY, language="fr")


def test_transcribe_rejects_over_window_input():
    asr = WhisperASR(params=jax.tree.map(np.asarray, random_whisper_params(TINY)), cfg=TINY)
    too_long = jnp.zeros((1, TINY.n_audio_ctx * 2 * 160 + 1))
    with pytest.raises(ValueError, match="single-window"):
        asr.transcribe_tokens(too_long)


def test_transcribe_results_long_form_windows(rng):
    """Rows longer than one window split into fixed windows whose merged
    result equals the per-window decodes (token concat over non-silent
    windows, (n+1)-weighted avg_logprob re-aggregation)."""
    params = jax.tree.map(np.asarray, random_whisper_params(TINY))
    # language pinned: with auto-detect the long-form path pins window 0's
    # detected language for ALL windows (upstream behavior, tested below),
    # so solo decodes of later windows would not be comparable
    asr = WhisperASR(params=params, cfg=TINY, temperatures=(0.0,), language="en")
    window = TINY.n_audio_ctx * 2 * 160
    w1 = rng.standard_normal((1, window)).astype(np.float32)
    w2 = rng.standard_normal((1, window)).astype(np.float32)
    long_wav = jnp.asarray(np.concatenate([w1, w2[:, : window // 2]], axis=1))

    res = asr.transcribe_results(long_wav, max_tokens=8)[0]
    assert len(res["windows"]) == 2
    # window decodes must match transcribing each window on its own (the
    # second window is zero-padded to full length, as _mel would)
    solo1 = asr.transcribe_results(jnp.asarray(w1), max_tokens=8)[0]
    pad2 = np.concatenate(
        [w2[:, : window // 2], np.zeros((1, window - window // 2), np.float32)], axis=1
    )
    solo2 = asr.transcribe_results(jnp.asarray(pad2), max_tokens=8)[0]
    for got, want in zip(res["windows"], (solo1, solo2)):
        np.testing.assert_array_equal(got["tokens"], want["tokens"])
        assert got["silent"] == want["silent"]
    voiced = [r for r in (solo1, solo2) if not r["silent"]]
    np.testing.assert_array_equal(
        res["tokens"],
        np.concatenate([r["tokens"] for r in voiced]) if voiced else np.zeros(0),
    )
    want_avg = (
        solo1["avg_logprob"] * (len(solo1["tokens"]) + 1)
        + solo2["avg_logprob"] * (len(solo2["tokens"]) + 1)
    ) / (len(solo1["tokens"]) + len(solo2["tokens"]) + 2)
    np.testing.assert_allclose(res["avg_logprob"], want_avg, rtol=1e-6)
    assert np.isfinite(res["compression_ratio"])


def test_long_form_detects_language_once(rng, monkeypatch):
    """With language=None, the long-form path detects on the FIRST window
    only and pins that token for every later window (upstream's single
    detect_language call before the seek loop) — never once per window."""
    import cse_tpu.models.whisper as W

    params = jax.tree.map(np.asarray, random_whisper_params(TINY))
    asr = WhisperASR(params=params, cfg=TINY, temperatures=(0.0,), language=None)
    window = TINY.n_audio_ctx * 2 * 160
    wav = jnp.asarray(rng.standard_normal((2, window * 2 + 50)).astype(np.float32))

    calls = []
    real = W.whisper_detect_language_audio

    def spy(params, audio, cfg):
        calls.append(int(audio.shape[0]))
        return real(params, audio, cfg)

    monkeypatch.setattr(W, "whisper_detect_language_audio", spy)
    res = asr.transcribe_results(wav, max_tokens=8)
    assert len(res) == 2 and len(res[0]["windows"]) == 3
    # exactly one detection, over the 2 first-window rows (not 2x3 windows)
    assert calls == [2], calls


def test_suppress_mask_bars_sot_lm():
    """whisper's SuppressTokens always bars <|startoflm|> (50360) — a sampled
    fallback rung must never be able to emit it."""
    from cse_tpu.models.whisper import _suppress_masks

    never, _ = _suppress_masks(TINY, ())
    assert float(never[TINY.token_sot_lm]) == float("-inf")
    assert float(never[TINY.token_sot_prev]) == float("-inf")


def test_cascaded_silent_stream_empty_transcript(rng):
    """CascadedSelector maps a silent stream to an empty transcript and a
    -1e9 LM score (whisper.transcribe emits no segment for silence)."""
    from cse_tpu.eval.cascaded import CascadedSelector

    params = _peaked_params(win_token=TINY.token_nospeech)
    asr = WhisperASR(params=jax.tree.map(np.asarray, params), cfg=TINY)

    class _ByteTok:
        is_fallback = True

        def encode(self, s):
            return [0] + [int(b) for b in s.encode()]

    sel = CascadedSelector(asr, None, _ByteTok(), sr=8000)
    cand = rng.standard_normal((2, 16000)).astype(np.float32)
    best, transcripts, scores = sel.select(cand, "hello there")
    assert transcripts == ["", ""]
    assert all(s == -1e9 for s in scores)
