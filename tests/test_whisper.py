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
pytestmark = pytest.mark.slow  # multi-minute on the 1-core box; excluded by -m 'not slow'

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
    # and the greedy rung really was degenerate repetition (the timestamped
    # decode opens with a timestamp token; every TEXT token is the loop)
    toks0, lens0 = asr.transcribe_tokens(wav, max_tokens=24)
    text = toks0[0, : int(lens0[0])]
    text = text[text < TINY.timestamp_begin]
    assert text.size > 0 and (text == 1234).all()


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


def _upstream_seek_logic(tokens, tb, segment_size):
    """Literal numpy transcription of whisper transcribe.py's seek/segment
    block (consecutive / single_timestamp_ending) for one non-silent window.
    Returns (advance_frames, [(lo, hi)] token-slice bounds)."""
    t = np.asarray(tokens)
    timestamp_tokens = t >= tb
    single = timestamp_tokens[-2:].tolist() == [False, True]
    consecutive = (
        np.where(timestamp_tokens[:-1] & timestamp_tokens[1:])[0] + 1
    ).tolist()
    if len(consecutive) > 0:
        slices = list(consecutive)
        if single:
            slices.append(len(t))
        bounds = list(zip([0] + slices[:-1], slices))
        if single:
            adv = segment_size
        else:
            adv = (int(t[slices[-1] - 1]) - tb) * 2
    else:
        bounds = [(0, len(t))]
        adv = segment_size
    return adv, bounds


def test_parse_seek_window_matches_upstream_logic(rng):
    """parse_seek_window == the upstream-literal seek/segment logic on
    grammar-valid sequences covering every branch: single-timestamp ending,
    pair ending (seek to the closing timestamp), no consecutive pair, and
    the 0.00-only fallback duration."""
    from cse_tpu.models.whisper import parse_seek_window

    tb = TINY.timestamp_begin

    def ts(k):
        return tb + k

    cases = [
        [ts(5), 11, ts(40), ts(40), 12, 13, ts(90)],   # single ending
        [ts(5), 11, ts(40), ts(40), 12, ts(90), ts(90)],  # pair ending
        [ts(5), 11, 12],                               # unfinished only
        [ts(0), 11],                                   # 0.00 + text
        [ts(5), 11, ts(40), ts(41), 12, ts(90), ts(92)],  # uneven pairs
    ]
    for _ in range(40):  # randomized grammar-valid sequences
        seq, k, open_seg = [], int(rng.integers(0, 30)), False
        seq.append(ts(k))
        while len(seq) < int(rng.integers(2, 14)):
            if open_seg and rng.random() < 0.4:
                seq += [ts(k), ts(k + int(rng.integers(1, 9)))]
                k = seq[-1] - tb
                open_seg = False
            else:
                seq.append(int(rng.integers(2, 1000)))
                open_seg = True
        if rng.random() < 0.3:
            seq.append(ts(k + 1))
        cases.append(seq)

    for seq in cases:
        has_pairs = any(a >= tb and b >= tb for a, b in zip(seq, seq[1:]))
        for seek0, size in ((0, 3000), (1234, 1766)):
            adv, segs = parse_seek_window(seq, False, seek0, size, TINY)
            want_adv, bounds = _upstream_seek_logic(seq, tb, size)
            assert adv == (want_adv if want_adv > 0 else size), seq
            assert len(segs) == len(bounds), seq
            for s, (lo, hi) in zip(segs, bounds):
                np.testing.assert_array_equal(s["tokens"], seq[lo:hi])
                if has_pairs:  # pair-cut segments carry timestamp times
                    np.testing.assert_allclose(
                        s["start"], seek0 * 0.01 + (seq[lo] - tb) * 0.02)
                else:  # unfinished window: upstream anchors at the offset
                    np.testing.assert_allclose(s["start"], seek0 * 0.01)
    # silent windows skip whole: no segments, full advance
    adv, segs = parse_seek_window([ts(3), 7], True, 0, 3000, TINY)
    assert adv == 3000 and segs == []


def test_transcribe_results_seek_long_form(rng):
    """>30 s rows run the seek loop: the first window's raw decode equals a
    solo decode of the first 30 s, seeks strictly increase, the merged
    tokens are the non-silent windows' SEGMENT tokens (the unfinished tail
    a seek re-decodes is excluded), and segments carry absolute times."""
    params = jax.tree.map(np.asarray, random_whisper_params(TINY))
    # language pinned so the solo decode is comparable to window 0
    asr = WhisperASR(params=params, cfg=TINY, temperatures=(0.0,), language="en")
    window = TINY.n_audio_ctx * 2 * 160
    w1 = rng.standard_normal((1, window)).astype(np.float32)
    w2 = rng.standard_normal((1, window // 2)).astype(np.float32)
    long_wav = jnp.asarray(np.concatenate([w1, w2], axis=1))
    total_s = long_wav.shape[1] / 16000

    res = asr.transcribe_results(long_wav, max_tokens=10)[0]
    assert len(res["windows"]) >= 1
    solo1 = asr.transcribe_results(jnp.asarray(w1), max_tokens=10)[0]
    np.testing.assert_array_equal(
        res["windows"][0]["decoded_tokens"],
        solo1["windows"][0]["decoded_tokens"])
    seeks = [w["seek"] for w in res["windows"]]
    assert seeks[0] == 0 and all(a < b for a, b in zip(seeks, seeks[1:]))
    voiced = [w for w in res["windows"] if not w["silent"]]
    np.testing.assert_array_equal(
        res["tokens"],
        np.concatenate([w["tokens"] for w in voiced])
        if voiced else np.zeros(0, np.int32),
    )
    # TINY's 2 s window is far shorter than the vocab's 30 s timestamp range,
    # so random weights can stamp segments anywhere inside [0, 30] — absolute
    # ordering across windows only holds at the real config; bound instead
    for s in res["segments"]:
        assert 0.0 <= s["start"] <= s["end"] <= total_s + 30.0
        assert set(s) >= {"start", "end", "text", "tokens", "temperature",
                          "avg_logprob", "compression_ratio", "no_speech_prob"}
    # window 0's segments == parse_seek_window applied to the solo decode
    from cse_tpu.models.whisper import parse_seek_window

    frames_w = TINY.n_audio_ctx * 2
    content = -(-long_wav.shape[1] // 160)
    w0 = solo1["windows"][0]
    _, segs0 = parse_seek_window(
        w0["decoded_tokens"], w0["silent"], 0, min(frames_w, content), TINY)
    assert len(segs0) >= 1
    for got, want in zip(res["segments"], segs0):
        np.testing.assert_array_equal(got["tokens"], want["tokens"])
        np.testing.assert_allclose(got["start"], want["start"])
        np.testing.assert_allclose(got["end"], want["end"])
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
    # seek advances at most one window per iteration: >= 3 windows here
    assert len(res) == 2 and len(res[0]["windows"]) >= 3
    # exactly one detection, over the 2 first-window rows — not per window
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


# ---------------------------------------------------------------------------
# timestamped decoding (whisper.transcribe default: without_timestamps=False)
# ---------------------------------------------------------------------------

def _upstream_timestamp_rules(logits, sampled, cfg, max_initial_idx=50):
    """Literal numpy transcription of whisper decoding.py ApplyTimestampRules
    for ONE row: per-row Python branches over the sampled sequence, applied
    to already-SuppressTokens/SuppressBlank-masked logits [V]."""
    tb = cfg.timestamp_begin
    lg = np.array(logits, np.float64)
    seq = list(sampled)
    last_was = len(seq) >= 1 and seq[-1] >= tb
    pen_was = len(seq) < 2 or seq[-2] >= tb
    if last_was:
        if pen_was:  # has to be non-timestamp
            lg[tb:] = -np.inf
        else:  # cannot be normal text tokens
            lg[: cfg.eot] = -np.inf
    ts = [t for t in seq if t >= tb]
    if ts:
        # timestamps shouldn't decrease; forbid smaller timestamp tokens,
        # and force a nonzero-length segment unless closing an open pair
        last_ts = ts[-1] if (last_was and not pen_was) else ts[-1] + 1
        lg[tb:last_ts] = -np.inf
    if len(seq) == 0:
        lg[:tb] = -np.inf
        lg[tb + max_initial_idx + 1:] = -np.inf
    # renormalized probabilities: force a timestamp when their total mass
    # beats every single text token
    x = lg - lg.max()
    lp = x - np.log(np.exp(x).sum())
    ts_lp = np.log(np.exp(lp[tb:]).sum()) if np.isfinite(lp[tb:]).any() else -np.inf
    if ts_lp > lp[:tb].max():
        lg[:tb] = -np.inf
    return lg


def test_timestamp_decode_matches_upstream_rule_oracle(rng):
    """Greedy timestamped decode == teacher-forced replay through the raw
    decoder logits with the upstream-literal numpy rule masks: at every
    sampled position the oracle's argmax is the token the in-graph
    while_loop chose (``whisper.transcribe`` without_timestamps=False,
    /root/reference/test_cascaded.py:224)."""
    from cse_tpu.models.whisper import (
        _cross_kv, _decoder_step, _suppress_masks, whisper_decode,
        whisper_encode,
    )

    params = jax.tree.map(jnp.asarray, random_whisper_params(TINY, seed=3))
    mel = _mel(rng, 2)
    toks, lens, _, _ = whisper_decode(
        params, mel, TINY,
        jnp.full((2,), TINY.token_lang_en, jnp.int32),
        jnp.asarray(0.0), jax.random.PRNGKey(0), max_tokens=10,
        timestamps=True,
    )
    toks, lens = np.asarray(toks), np.asarray(lens)

    audio = whisper_encode(params, mel, TINY)
    audio_kv = _cross_kv(params, audio, TINY)
    never, first = _suppress_masks(TINY, (), timestamps=True)
    never, first = np.asarray(never), np.asarray(first)
    kv = {
        "k": jnp.zeros((TINY.n_text_layer, 2, TINY.n_text_ctx, TINY.n_text_state)),
        "v": jnp.zeros((TINY.n_text_layer, 2, TINY.n_text_ctx, TINY.n_text_state)),
    }
    prompt = [TINY.sot, TINY.token_lang_en, TINY.token_transcribe]
    P = len(prompt)
    seq = [np.full(2, p) for p in prompt] + [toks[:, j] for j in range(toks.shape[1])]
    checked = 0
    done = np.zeros(2, bool)
    for i in range(len(seq) - 1):
        logits, kv = _decoder_step(
            params, TINY, jnp.asarray(seq[i], jnp.int32), jnp.asarray(i), kv, audio_kv
        )
        if i + 1 < P:
            continue
        base = np.asarray(logits, np.float64) + never
        if i + 1 == P:
            base = base + first
        for b in range(2):
            if done[b]:
                continue
            sampled = [int(seq[P + j][b]) for j in range(i + 1 - P)]
            want = int(np.argmax(_upstream_timestamp_rules(base[b], sampled, TINY)))
            got = int(seq[i + 1][b])
            assert got == want, (i, b, got, want)
            checked += 1
            if got == TINY.eot:
                done[b] = True
    assert checked >= 10  # the replay actually exercised sampled positions


def test_timestamp_decode_grammar(rng):
    """Decoded timestamp structure obeys the transcribe invariants: the first
    sampled token is a timestamp within max_initial_timestamp (1.0 s),
    timestamps never decrease, and never run three in a row."""
    params = jax.tree.map(jnp.asarray, random_whisper_params(TINY, seed=3))
    t = np.linspace(0, TINY.n_audio_ctx * 2 * 160 / 16000, TINY.n_audio_ctx * 2 * 160)
    rows = np.stack([
        rng.standard_normal(t.shape).astype(np.float32),
        np.sin(2 * np.pi * 440 * t).astype(np.float32),
    ])
    asr = WhisperASR(params=jax.tree.map(np.asarray, params), cfg=TINY,
                     temperatures=(0.0,))
    toks, lens = asr.transcribe_tokens(jnp.asarray(rows), max_tokens=16)
    tb = TINY.timestamp_begin
    for b in range(rows.shape[0]):
        seq = toks[b, : lens[b]].tolist()
        assert tb <= seq[0] <= tb + 50
        ts = [x for x in seq if x >= tb]
        assert all(x <= y for x, y in zip(ts, ts[1:]))
        run = 0
        for x in seq:
            run = run + 1 if x >= tb else 0
            assert run <= 2


def test_timestamp_text_and_policy_strip_specials(rng):
    """_text drops timestamp/special ids (>= EOT) before text_fn and the
    compression-ratio gate, like tokenizer.decode upstream; the raw tokens
    in the result dict keep them (DecodingResult.tokens does)."""
    params = jax.tree.map(jnp.asarray, random_whisper_params(TINY, seed=3))
    seen = []
    asr = WhisperASR(params=jax.tree.map(np.asarray, params), cfg=TINY,
                     temperatures=(0.0,),
                     text_fn=lambda ids: seen.append(np.asarray(ids))
                     or " ".join(str(int(t)) for t in ids))
    wav = jnp.asarray(rng.standard_normal((1, TINY.n_audio_ctx * 2 * 160)).astype(np.float32))
    res = asr.transcribe_results(wav, max_tokens=12)[0]
    assert (res["tokens"] >= TINY.timestamp_begin).any()  # raw keeps ts ids
    assert seen and all((s < TINY.eot).all() for s in seen)
    assert all(int(w) < TINY.eot for w in res["text"].split())


def test_without_timestamps_reverts_to_pinned_decode(rng):
    """WhisperASR(without_timestamps=True) reproduces the <|notimestamps|>
    program: no timestamp ids in the output."""
    params = jax.tree.map(jnp.asarray, random_whisper_params(TINY, seed=3))
    asr = WhisperASR(params=jax.tree.map(np.asarray, params), cfg=TINY,
                     temperatures=(0.0,), without_timestamps=True)
    wav = jnp.asarray(rng.standard_normal((1, TINY.n_audio_ctx * 2 * 160)).astype(np.float32))
    toks, lens = asr.transcribe_tokens(wav, max_tokens=12)
    assert (toks[0, : lens[0]] < TINY.timestamp_begin).all()


# ---------------------------------------------------------------------------
# condition_on_previous_text (whisper.transcribe default prompt carry-over)
# ---------------------------------------------------------------------------

def test_conditioned_decode_matches_unpadded_replay(rng):
    """The static-shape conditioned decode (right-aligned prompts, per-row
    position offsets, masked pad slots) must equal an eager per-row replay
    that feeds the TRUE variable-length prompt [<|startofprev|>, prev...,
    SOT, lang, transcribe] with positions from 0 and no padding — for a row
    WITH previous text and a row without, in the same batch."""
    from cse_tpu.models.whisper import (
        _cross_kv, _decoder_step, _suppress_masks, whisper_decode_audio,
        whisper_encode,
    )

    params = jax.tree.map(jnp.asarray, random_whisper_params(TINY, seed=3))
    mel = _mel(rng, 2)
    audio = whisper_encode(params, mel, TINY)
    K, max_tokens = 8, 6
    prev_row1 = [4242, 911, 17, 50412, 29000]  # mixed text + a timestamp id
    pt = np.zeros((2, K), np.int32)
    pt[1, K - len(prev_row1):] = prev_row1
    pl = np.asarray([0, len(prev_row1)], np.int32)

    toks, lens, slp, nsp = whisper_decode_audio(
        params, audio, TINY, jnp.full((2,), TINY.token_lang_en, jnp.int32),
        jnp.asarray(0.0), jax.random.PRNGKey(0), max_tokens=max_tokens,
        timestamps=True, prev_budget=K,
        prev_tokens=jnp.asarray(pt), prev_lens=jnp.asarray(pl),
    )
    toks, lens, slp, nsp = map(np.asarray, (toks, lens, slp, nsp))

    never, first = _suppress_masks(TINY, (), timestamps=True)
    never = np.asarray(never)
    base = [TINY.sot, TINY.token_lang_en, TINY.token_transcribe]
    for b, prev in ((0, []), (1, prev_row1)):
        prompt = ([TINY.token_sot_prev] + prev if prev else []) + base
        audio_b = audio[b:b + 1]
        audio_kv = _cross_kv(params, audio_b, TINY)
        kv = {
            "k": jnp.zeros((TINY.n_text_layer, 1, TINY.n_text_ctx,
                            TINY.n_text_state)),
            "v": jnp.zeros((TINY.n_text_layer, 1, TINY.n_text_ctx,
                            TINY.n_text_state)),
        }
        P = len(prompt)
        sot_idx = P - len(base)
        want_toks, want_slp, want_nsp = [], 0.0, None
        tok, sampled = prompt[0], []
        for i in range(P + max_tokens - 1):
            logits, kv = _decoder_step(
                params, TINY, jnp.asarray([tok], jnp.int32), jnp.asarray(i),
                kv, audio_kv)
            lg = np.asarray(logits, np.float64)[0]
            if i == sot_idx:
                e = np.exp(lg - lg.max())
                want_nsp = (e / e.sum())[TINY.token_nospeech]
            if i + 1 < P:
                tok = prompt[i + 1]
                continue
            lg = lg + never
            if i + 1 == P:
                lg = lg + np.asarray(first)
            lg = _upstream_timestamp_rules(lg, sampled, TINY)
            tok = int(np.argmax(lg))
            x = lg - lg.max()
            want_slp += (x - np.log(np.exp(x).sum()))[tok]
            sampled.append(tok)
            if tok == TINY.eot:
                break
        want_toks = sampled[:-1] if sampled and sampled[-1] == TINY.eot else sampled
        n = int(lens[b])
        assert toks[b, :n].tolist() == want_toks, (b, toks[b, :n], want_toks)
        np.testing.assert_allclose(slp[b], want_slp, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(nsp[b], want_nsp, rtol=1e-4, atol=1e-5)


def test_seek_conditions_on_previous_segments(rng, monkeypatch):
    """The seek loop hands every window after the first the accumulated
    segment tokens (right-aligned, cropped to n_text_ctx//2 - 1) and resets
    the prompt after a >0.5-temperature window; condition_on_previous_text=
    False passes no prompt at all."""
    params = jax.tree.map(np.asarray, random_whisper_params(TINY))
    window = TINY.n_audio_ctx * 2 * 160
    wav = jnp.asarray(rng.standard_normal((1, 2 * window)).astype(np.float32))
    K = TINY.n_text_ctx // 2

    captured = []
    orig = WhisperASR._decode_rungs

    def spy(self, audio, lang, max_tokens, active_rows=None, prev=None):
        captured.append(
            None if prev is None
            else (np.asarray(prev[0]).copy(), np.asarray(prev[1]).copy()))
        return orig(self, audio, lang, max_tokens, active_rows, prev)

    monkeypatch.setattr(WhisperASR, "_decode_rungs", spy)
    asr = WhisperASR(params=params, cfg=TINY, temperatures=(0.0,), language="en")
    res = asr.transcribe_results(wav, max_tokens=8)[0]
    assert len(captured) >= 2
    # first window: no previous text anywhere -> the CHEAP prev-less program
    assert captured[0] is None
    running = []
    for i, w in enumerate(res["windows"][:-1]):
        running.extend(int(t) for t in w["tokens"])
        if w["temperature"] > 0.5:
            running = []
        want = running[-(K - 1):]
        if not want:  # still nothing to condition on -> still prev-less
            assert captured[i + 1] is None
            continue
        pt, pl = captured[i + 1]
        assert pl[0] == len(want)
        assert pt[0, K - len(want):].tolist() == want

    captured.clear()
    asr_off = WhisperASR(params=params, cfg=TINY, temperatures=(0.0,),
                         language="en", condition_on_previous_text=False)
    asr_off.transcribe_results(wav, max_tokens=8)
    assert captured and all(c is None for c in captured)


def test_merge_windows_weights_by_decoded_length():
    """_merge_windows inverts each window's avg_logprob with its DECODED
    token count (the seek path rewrites 'tokens' to segment-only ids), so
    the merged avg_logprob reconstructs the true per-window sums."""
    asr = WhisperASR(params=jax.tree.map(np.asarray, random_whisper_params(TINY)),
                     cfg=TINY, temperatures=(0.0,))
    rs = [
        {"tokens": np.arange(12, dtype=np.int32),          # 12 kept of 20
         "decoded_tokens": np.arange(20, dtype=np.int32),
         "avg_logprob": -10.0 / 21, "compression_ratio": 1.0,
         "no_speech_prob": 0.1, "temperature": 0.0, "silent": False},
        {"tokens": np.zeros(0, np.int32),                  # silent, 5 decoded
         "decoded_tokens": np.arange(5, dtype=np.int32),
         "avg_logprob": -18.0 / 6, "compression_ratio": 1.0,
         "no_speech_prob": 0.9, "temperature": 0.2, "silent": True},
    ]
    m = asr._merge_windows(rs)
    # true sums: -10 and -18 over 20 and 5 decoded tokens -> (n+1) accounting
    np.testing.assert_allclose(m["avg_logprob"], (-10.0 - 18.0) / (25 + 2))
    np.testing.assert_array_equal(m["tokens"], np.arange(12))
    assert m["temperature"] == 0.2 and m["silent"] is False


def test_decode_rungs_inactive_rows_never_gate_retries(rng, monkeypatch):
    """active_rows excludes finished seek rows from the fallback gates: when
    only gate-failing rows are inactive, the ladder stops after the greedy
    rung instead of burning sampled rungs, and inactive results stay None."""
    import cse_tpu.models.whisper as W

    params = _peaked_params(win_token=1234)  # repetition loop -> cr gate fails
    asr = WhisperASR(params=jax.tree.map(np.asarray, params), cfg=TINY)
    wav = jnp.asarray(rng.standard_normal((2, TINY.n_audio_ctx * 2 * 160))
                      .astype(np.float32))
    audio = W.whisper_encode_jit(asr.params, asr._mel(wav), TINY)
    lang = jnp.full((2,), TINY.token_lang_en, jnp.int32)

    calls = []
    real = W.whisper_decode_audio

    def spy(*a, **k):
        calls.append(k.get("max_tokens"))
        return real(*a, **k)

    monkeypatch.setattr(W, "whisper_decode_audio", spy)
    res = asr._decode_rungs(audio, lang, 12, active_rows=np.asarray([False, False]))
    assert len(calls) == 1  # greedy rung only; nothing gated a retry
    assert res == [None, None]
    calls.clear()
    res = asr._decode_rungs(audio, lang, 12, active_rows=np.asarray([True, False]))
    assert len(calls) > 1   # the active failing row DOES escalate
    assert res[0] is not None and res[1] is None


def test_transcribe_results_empty_input():
    """Zero-length audio returns a well-formed empty/silent result (upstream
    yields empty text/segments) instead of crashing in the merge."""
    asr = WhisperASR(params=jax.tree.map(np.asarray, random_whisper_params(TINY)),
                     cfg=TINY, temperatures=(0.0,), language="en")
    res = asr.transcribe_results(jnp.zeros((1, 0)), max_tokens=8)[0]
    assert res["silent"] is True and res["tokens"].size == 0
    assert res["windows"] == [] and res["segments"] == []
    assert np.isfinite(res["avg_logprob"])


def test_best_of_defaults_to_upstream_programmatic_width(rng, monkeypatch):
    """The reference transcribes with ZERO options
    (/root/reference/test_cascaded.py:224); upstream's DecodingTask resolves
    ``n_group = beam_size or best_of or 1`` => ONE sample per t>0 fallback
    rung. The default-constructed ASR must decode exactly batch-B rows on a
    sampled rung (no best_of tiling); best_of=5 must tile to B*5 and pick
    per row by sum_logprob / length (MaximumLikelihoodRanker,
    length_penalty=None) — both widths checked against that oracle here."""
    import cse_tpu.models.whisper as W

    # upstream oracle: an option-free call's effective group size
    beam_size, best_of = None, None
    assert (beam_size or best_of or 1) == 1

    params = _peaked_params(win_token=1234)  # repetition -> cr gate retries
    B = 2
    wav = jnp.asarray(rng.standard_normal((B, TINY.n_audio_ctx * 2 * 160))
                      .astype(np.float32))

    calls = []
    real = W.whisper_decode_audio

    def spy(p, audio, *a, **k):
        out = real(p, audio, *a, **k)
        calls.append((int(audio.shape[0]), tuple(np.asarray(x) for x in out)))
        return out

    monkeypatch.setattr(W, "whisper_decode_audio", spy)

    asr = WhisperASR(params=jax.tree.map(np.asarray, params), cfg=TINY)
    assert asr.best_of == 1
    audio = W.whisper_encode_jit(asr.params, asr._mel(wav), TINY)
    lang = jnp.full((B,), TINY.token_lang_en, jnp.int32)
    asr._decode_rungs(audio, lang, 12)
    assert len(calls) > 1, "cr gate should have escalated past greedy"
    assert all(b == B for b, _ in calls), [b for b, _ in calls]

    calls.clear()
    asr5 = WhisperASR(params=jax.tree.map(np.asarray, params), cfg=TINY,
                      best_of=5)
    res5 = asr5._decode_rungs(audio, lang, 12)
    sampled = [(b, out) for b, out in calls[1:]]
    assert sampled and all(b == B * 5 for b, _ in sampled)
    # ranking oracle on the LAST sampled rung (the ladder exhausts on these
    # gate-failing peaked params, so the final rung's pick is the result)
    toks5, lens5, slp5, _ = sampled[-1][1]
    score = slp5 / np.maximum(lens5, 1)
    for b in range(B):
        want = int(score.reshape(B, 5)[b].argmax())
        got = res5[b]["tokens"]
        n = int(lens5[b * 5 + want])
        np.testing.assert_array_equal(got, toks5[b * 5 + want, :n])


def test_precompile_warms_every_decode_program(rng):
    """precompile=True: after the FIRST transcribe_results call (which warms
    the programs), later mixtures trigger ZERO new decode compilations —
    even ones that first hit the sampled best_of-tiled rung or the
    conditioned prev-prompt program (VERDICT r3 weak #6: lazy first-hit
    compiles otherwise land mid-eval)."""
    import cse_tpu.models.whisper as W

    params = _peaked_params(win_token=1234)  # cr gate fails -> sampled rungs
    asr = WhisperASR(params=jax.tree.map(np.asarray, params), cfg=TINY,
                     best_of=2, precompile=True)
    wav = jnp.asarray(rng.standard_normal((2, TINY.n_audio_ctx * 2 * 160))
                      .astype(np.float32))
    asr.transcribe_results(wav, max_tokens=8)
    n_compiled = W.whisper_decode_audio._cache_size()
    # warmup covered {B, B*best_of} x {no-prev, prev-budget} = 4 programs
    assert n_compiled >= 4, n_compiled
    # a second mixture of the same shape reuses the warmed programs
    wav2 = jnp.asarray(rng.standard_normal((2, TINY.n_audio_ctx * 2 * 160))
                       .astype(np.float32))
    asr.transcribe_results(wav2, max_tokens=8)
    assert W.whisper_decode_audio._cache_size() == n_compiled
    # and warmup is idempotent per (batch, max_tokens) shape
    asr.warmup(2, 8)
    assert W.whisper_decode_audio._cache_size() == n_compiled


def test_precompile_covers_the_live_prev_prompt_program(rng, monkeypatch):
    """The conditioned prev-prompt program warmed by one ASR's precompile is
    the SAME compiled program a live two-window transcription hits: a
    greedy-pinned ASR (so the prompt carries — temperature stays <= 0.5)
    driving a two-window wav must (a) actually pass a previous-text prompt to
    window 2 (spy-asserted, guarding against the warmup and live paths
    drifting to different static args) and (b) add ZERO compilations."""
    import cse_tpu.models.whisper as W

    params = jax.tree.map(np.asarray, _peaked_params(win_token=1234))
    warm = WhisperASR(params=params, cfg=TINY, best_of=2, precompile=True)
    warm.warmup(2, 8)
    n_compiled = W.whisper_decode_audio._cache_size()

    captured = []
    orig = WhisperASR._decode_rungs

    def spy(self, audio, lang, max_tokens, active_rows=None, prev=None):
        captured.append(prev is not None)
        return orig(self, audio, lang, max_tokens, active_rows, prev)

    monkeypatch.setattr(WhisperASR, "_decode_rungs", spy)
    # greedy-pinned: the peaked (repetitive) transcript would fail the cr
    # gate and escalate past 0.5, resetting the prompt before window 2
    live = WhisperASR(params=params, cfg=TINY, temperatures=(0.0,),
                      language="en", precompile=False)
    window = TINY.n_audio_ctx * 2 * 160
    wav = jnp.asarray(rng.standard_normal((2, 2 * window)).astype(np.float32))
    live.transcribe_results(wav, max_tokens=8)
    assert any(captured), "no window ever took the prev-prompt path"
    assert W.whisper_decode_audio._cache_size() == n_compiled, (
        "the live prev-prompt decode compiled a new program — warmup and "
        "live static args have drifted")
