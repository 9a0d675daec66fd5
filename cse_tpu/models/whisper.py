"""Whisper (base) ASR in JAX: encoder-decoder + scan-based greedy decode.

The reference's cascaded pipeline transcribes each separated stream with
``whisper.load_model("base").transcribe(...)`` (``test_cascaded.py:116,224``).
This is a from-scratch JAX implementation of the published Whisper
architecture (Radford et al. 2022):

  log-mel(80) -> Conv1d(k3,s1)+GELU -> Conv1d(k3,s2)+GELU -> +sin pos
  -> N pre-LN encoder layers -> LN
  decoder: tok emb + learned pos -> N pre-LN layers (causal self-attn +
  cross-attn) -> LN -> logits = emb^T

Decode runs as a single ``lax.while_loop`` with a preallocated KV cache —
static shapes, one compile, batch-friendly — and implements the FULL
``whisper.transcribe`` default policy (``transcribe.py`` defaults mirrored at
``test_cascaded.py:224``): greedy at temperature 0 first, then sampled
retries at T = 0.2, 0.4, 0.6, 0.8, 1.0 (``best_of`` sampled candidates,
ranked by sum-logprob / length; default 1 = upstream's PROGRAMMATIC width
for an option-free call) whenever the compression ratio exceeds 2.4 or the
average logprob falls below −1.0; segments whose ``<|nospeech|>`` probability
exceeds 0.6 while the avg logprob stays below −1.0 are treated as silence.
Language is auto-detected from the first decoder step when not pinned.
Temperature and the PRNG key are traced, so one compiled program covers the
whole temperature ladder. Weights import from the OpenAI ``base.pt`` layout;
without them the module runs with random weights for pipeline tests.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    n_vocab: int = 51865
    n_audio_ctx: int = 1500
    n_audio_state: int = 512
    n_audio_head: int = 8
    n_audio_layer: int = 6
    n_text_ctx: int = 448
    n_text_state: int = 512
    n_text_head: int = 8
    n_text_layer: int = 6

    # special tokens (multilingual vocab)
    @property
    def sot(self):
        return 50258

    @property
    def eot(self):
        return 50257

    @property
    def token_transcribe(self):
        return 50359

    @property
    def token_translate(self):
        return 50358

    @property
    def token_sot_lm(self):
        return 50360

    @property
    def token_sot_prev(self):
        return 50361

    @property
    def token_nospeech(self):
        return 50362

    @property
    def token_notimestamps(self):
        return 50363

    @property
    def timestamp_begin(self):
        return 50364

    @property
    def token_lang_en(self):
        return 50259


# ---- audio frontend -------------------------------------------------------

_WHISPER_N_FFT, _WHISPER_HOP = 400, 160


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_hz / f_sp + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
        f / f_sp,
    )


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel,
        min_log_hz * np.exp(logstep * (m - min_log_mel)),
        f_sp * m,
    )


@lru_cache(maxsize=4)
def mel_filters_slaney(n_mels: int = 80, n_fft: int = 400, sr: int = 16000) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank
    [n_fft//2+1, n_mels].

    Reproduces ``librosa.filters.mel(sr=16000, n_fft=400, n_mels=80)``
    semantics (slaney mel scale, area normalization) — the filterbank OpenAI
    whisper ships precomputed in ``mel_filters.npz`` and applies in its
    log-mel frontend (consumed by the reference at ``test_cascaded.py:224``).
    """
    fft_freqs = np.linspace(0.0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = _mel_to_hz_slaney(
        np.linspace(_hz_to_mel_slaney(0.0), _hz_to_mel_slaney(sr / 2.0), n_mels + 2)
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # slaney area norm: each filter integrates to ~2/bandwidth
    weights *= (2.0 / (mel_pts[2:] - mel_pts[:-2]))[:, None]
    return weights.T.astype(np.float32)


def whisper_log_mel(wav: jnp.ndarray, n_mels: int = 80, n_frames: int = 3000) -> jnp.ndarray:
    """[B, T]@16k (padded/trimmed to 30 s) -> [B, n_frames, n_mels].

    Whisper's frontend: pad_or_trim to ``n_frames*hop`` samples, centered
    hann-window STFT (reflect pad), drop of the final STFT frame, slaney mel,
    log10, per-utterance max-8dB clamp, (x+4)/4 scaling. With the input
    padded to an exact hop multiple, torch.stft(center=True) yields
    ``n_frames+1`` frames and whisper keeps ``[..., :-1]`` — i.e. exactly
    frames 0..n_frames-1, which is what the gather below computes.
    """
    T = n_frames * _WHISPER_HOP
    wav = jnp.pad(wav[:, :T], ((0, 0), (0, max(0, T - wav.shape[1]))))
    wav = jnp.pad(wav, ((0, 0), (_WHISPER_N_FFT // 2, _WHISPER_N_FFT // 2)), mode="reflect")
    idx = jnp.arange(_WHISPER_N_FFT)[None, :] + _WHISPER_HOP * jnp.arange(n_frames)[:, None]
    frames = wav[:, idx]
    window = jnp.asarray(np.hanning(_WHISPER_N_FFT + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(frames * window[None, None, :], axis=-1)
    power = (spec.real**2 + spec.imag**2).astype(jnp.float32)
    mel = power @ jnp.asarray(mel_filters_slaney(n_mels, _WHISPER_N_FFT, 16000))
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(
        log_spec, log_spec.max(axis=(1, 2), keepdims=True) - 8.0
    )
    return (log_spec + 4.0) / 4.0


# ---- transformer pieces ---------------------------------------------------


def _ln(x, p):
    xf = x.astype(jnp.float32)
    m = xf.mean(-1, keepdims=True)
    v = xf.var(-1, keepdims=True)
    return ((xf - m) * jax.lax.rsqrt(v + 1e-5) * p["scale"] + p["bias"]).astype(x.dtype)


def _attn(q, k, v, n_head, causal_bias=None):
    B, Tq, D = q.shape
    Tk = k.shape[1]
    hd = D // n_head
    q = q.reshape(B, Tq, n_head, hd).transpose(0, 2, 1, 3) * (hd**-0.25)
    k = k.reshape(B, Tk, n_head, hd).transpose(0, 2, 1, 3) * (hd**-0.25)
    v = v.reshape(B, Tk, n_head, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    if causal_bias is not None:
        logits = logits + causal_bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, D)


def _mha(x, p, n_head, kv=None, causal_bias=None):
    src = x if kv is None else kv
    q = x @ p["q_w"] + p["q_b"]
    k = src @ p["k_w"]
    v = src @ p["v_w"] + p["v_b"]
    out = _attn(q, k, v, n_head, causal_bias)
    return out @ p["o_w"] + p["o_b"]


def _mlp(x, p):
    return jax.nn.gelu(x @ p["w1"] + p["b1"], approximate=False) @ p["w2"] + p["b2"]


def _sinusoids(length: int, channels: int) -> np.ndarray:
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def whisper_encode(params: dict, mel: jnp.ndarray, cfg: WhisperConfig) -> jnp.ndarray:
    """mel [B, 3000, n_mels] -> audio features [B, 1500, D]."""
    x = jax.nn.gelu(
        jax.lax.conv_general_dilated(
            mel, params["conv1_w"], (1,), [(1, 1)], dimension_numbers=("NHC", "HIO", "NHC")
        )
        + params["conv1_b"],
        approximate=False,
    )
    x = jax.nn.gelu(
        jax.lax.conv_general_dilated(
            x, params["conv2_w"], (2,), [(1, 1)], dimension_numbers=("NHC", "HIO", "NHC")
        )
        + params["conv2_b"],
        approximate=False,
    )
    x = x + jnp.asarray(_sinusoids(cfg.n_audio_ctx, cfg.n_audio_state))

    def layer(x, lp):
        x = x + _mha(_ln(x, lp["ln1"]), lp["attn"], cfg.n_audio_head)
        x = x + _mlp(_ln(x, lp["ln2"]), lp["mlp"])
        return x, None

    x, _ = jax.lax.scan(layer, x, params["enc_layers"])
    return _ln(x, params["enc_ln_post"])


def _decoder_step(params, cfg, tokens, pos, kv_cache, audio_kv, offset=None):
    """One decoder position with cached self-attn K/V.

    tokens: [B] current token; pos: scalar cache SLOT; kv_cache: dict of
    [n_layer, B, n_text_ctx, D] K/V buffers; audio_kv: precomputed cross K/V.
    Returns (logits [B, V], new kv_cache).

    ``offset`` [B] (optional) supports RIGHT-ALIGNED prompts of per-row
    length in one static-shape program (condition_on_previous_text): row b's
    first real token lives at slot ``offset[b]``, its position embedding is
    ``pos - offset[b]`` (clamped for the left-pad slots, whose K/V are
    masked out of attention permanently), and slots below the offset never
    become visible.
    """
    B = tokens.shape[0]
    D, H = cfg.n_text_state, cfg.n_text_head
    emb_pos = pos if offset is None else jnp.maximum(pos - offset, 0)
    x = params["tok_emb"][tokens] + params["pos_emb"][emb_pos]  # [B, D]
    x = x[:, None, :]  # [B, 1, D]

    slots = jnp.arange(cfg.n_text_ctx)
    mask = (slots <= pos)[None, :]
    if offset is not None:
        mask = mask & (slots[None, :] >= offset[:, None])
    bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]

    new_k, new_v = [], []
    for li in range(cfg.n_text_layer):
        lp = jax.tree.map(lambda a: a[li], params["dec_layers"])
        h = _ln(x, lp["ln1"])
        q = h @ lp["attn"]["q_w"] + lp["attn"]["q_b"]
        k_new = h @ lp["attn"]["k_w"]
        v_new = h @ lp["attn"]["v_w"] + lp["attn"]["v_b"]
        k_buf = jax.lax.dynamic_update_slice(kv_cache["k"][li], k_new, (0, pos, 0))
        v_buf = jax.lax.dynamic_update_slice(kv_cache["v"][li], v_new, (0, pos, 0))
        new_k.append(k_buf)
        new_v.append(v_buf)
        attn = _attn_cached(q, k_buf, v_buf, H, bias)  # bias masks pad slots
        x = x + (attn @ lp["attn"]["o_w"] + lp["attn"]["o_b"])
        h = _ln(x, lp["ln2"])
        qc = h @ lp["cross"]["q_w"] + lp["cross"]["q_b"]
        ca = _attn_cached(qc, audio_kv["k"][li], audio_kv["v"][li], H, None)
        x = x + (ca @ lp["cross"]["o_w"] + lp["cross"]["o_b"])
        x = x + _mlp(_ln(x, lp["ln3"]), lp["mlp"])
    x = _ln(x, params["dec_ln"])
    logits = (x[:, 0] @ params["tok_emb"].T).astype(jnp.float32)
    return logits, {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}


def _attn_cached(q, k, v, n_head, bias):
    B, Tq, D = q.shape
    Tk = k.shape[1]
    hd = D // n_head
    qh = q.reshape(B, Tq, n_head, hd).transpose(0, 2, 1, 3) * (hd**-0.25)
    kh = k.reshape(B, Tk, n_head, hd).transpose(0, 2, 1, 3) * (hd**-0.25)
    vh = v.reshape(B, Tk, n_head, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, D)


# GPT-2-family single-token encoding of " " — whisper's SuppressBlank bars it
# (alongside EOT) at the first content position.
_SPACE_TOKEN = 220
# whisper multilingual tokenizers carry 99 language tokens, contiguous from
# <|en|> (50259) up to (but excluding) <|translate|> (50358)
_N_LANGUAGES = 99
# whisper.transcribe's max_initial_timestamp=1.0 s at 0.02 s/token precision
# (DecodingTask: round(max_initial_timestamp / precision))
MAX_INITIAL_TIMESTAMP_INDEX = 50


def _suppress_masks(cfg: WhisperConfig, suppress_ids: tuple,
                    timestamps: bool = False):
    """(never_mask, first_mask): whisper's SuppressTokens (control tokens +
    the caller's non-speech set) and SuppressBlank — the space token and EOT
    barred at the first content position. ``timestamps=False`` additionally
    bars the whole timestamp range (the prompt pins <|notimestamps|>);
    ``timestamps=True`` leaves it open for ApplyTimestampRules, which handles
    <|notimestamps|> itself (already in the control list here)."""
    never = np.zeros(cfg.n_vocab, np.float32)
    control = [cfg.sot, cfg.token_translate, cfg.token_transcribe,
               cfg.token_sot_lm, cfg.token_sot_prev, cfg.token_nospeech,
               cfg.token_notimestamps]
    never[[t for t in control if t < cfg.n_vocab]] = -np.inf
    if not timestamps and cfg.timestamp_begin < cfg.n_vocab:
        never[cfg.timestamp_begin:] = -np.inf
    for t in suppress_ids:
        if 0 <= t < cfg.n_vocab:
            never[t] = -np.inf
    first = np.zeros(cfg.n_vocab, np.float32)
    first[cfg.eot] = -np.inf
    if _SPACE_TOKEN < cfg.n_vocab:
        first[_SPACE_TOKEN] = -np.inf
    return jnp.asarray(never), jnp.asarray(first)


def _cross_kv(params: dict, audio: jnp.ndarray, cfg: WhisperConfig) -> dict:
    ak, av = [], []
    for li in range(cfg.n_text_layer):
        lp = jax.tree.map(lambda a: a[li], params["dec_layers"])
        ak.append(audio @ lp["cross"]["k_w"])
        av.append(audio @ lp["cross"]["v_w"] + lp["cross"]["v_b"])
    return {"k": jnp.stack(ak), "v": jnp.stack(av)}


@partial(jax.jit, static_argnames=("cfg",))
def whisper_encode_jit(params: dict, mel: jnp.ndarray, cfg: WhisperConfig):
    """Standalone jitted encoder pass [B, n_frames, n_mels] -> [B, 1500, D].

    The transcribe policy encodes each window ONCE and reuses the audio
    features across the greedy rung, every sampled rung (tiled best_of times
    AFTER encoding), and language detection — upstream whisper does the same
    (DecodingTask caches audio_features); re-encoding per rung would run the
    full encoder stack up to 1 + n_rungs*best_of times per batch."""
    return whisper_encode(params, mel, cfg)


def whisper_decode(
    params: dict,
    mel: jnp.ndarray,
    cfg: WhisperConfig,
    language_tokens: jnp.ndarray,
    temperature: jnp.ndarray,
    key: jnp.ndarray,
    max_tokens: int = 224,
    suppress_ids: tuple = (),
    timestamps: bool = False,
):
    """Encode + one decode pass (convenience wrapper over
    ``whisper_encode_jit`` -> ``whisper_decode_audio``)."""
    audio = whisper_encode_jit(params, mel, cfg)
    return whisper_decode_audio(
        params, audio, cfg, language_tokens, temperature, key,
        max_tokens=max_tokens, suppress_ids=suppress_ids,
        timestamps=timestamps,
    )


@partial(jax.jit,
         static_argnames=("cfg", "max_tokens", "suppress_ids", "timestamps",
                          "prev_budget"))
def whisper_decode_audio(
    params: dict,
    audio: jnp.ndarray,
    cfg: WhisperConfig,
    language_tokens: jnp.ndarray,
    temperature: jnp.ndarray,
    key: jnp.ndarray,
    max_tokens: int = 224,
    suppress_ids: tuple = (),
    timestamps: bool = False,
    prev_budget: int = 0,
    prev_tokens: jnp.ndarray | None = None,
    prev_lens: jnp.ndarray | None = None,
):
    """One decode pass at a (traced) temperature over PRE-ENCODED audio
    features [B, 1500, D] (``whisper_encode_jit``).

    ``timestamps=False``: prompt = [SOT, lang, transcribe, notimestamps] per
    row; the timestamp range is suppressed outright. ``timestamps=True``
    matches ``whisper.transcribe``'s default (``without_timestamps=False``,
    `/root/reference/test_cascaded.py:224`): prompt = [SOT, lang, transcribe]
    and whisper's ApplyTimestampRules run as in-graph logit masks each step —
    timestamps appear in pairs (after a lone timestamp only a timestamp/EOT
    may follow; after a closed pair the next token is text), never decrease
    (strictly increase across segments), the first sampled token must be a
    timestamp within ``max_initial_timestamp`` (1.0 s), and whenever the
    total timestamp probability beats every text token, text is masked so a
    timestamp is sampled. Returned ``tokens`` then interleave timestamp ids
    (>= ``cfg.timestamp_begin``) with text, exactly like
    ``DecodingResult.tokens``; stops at EOT either way.
    ``temperature == 0`` takes the argmax (whisper GreedyDecoder with t=0);
    ``temperature > 0`` samples from softmax(logits / t) — both live in one
    compiled program so the transcribe fallback ladder never recompiles.

    Returns (tokens [B, max_tokens], lengths [B], sum_logprob [B],
    no_speech_prob [B]):
    - ``sum_logprob`` accumulates log-softmax(filtered logits)[chosen] over
      the sampled tokens INCLUDING the terminating EOT, exactly whisper's
      ``sum_logprobs += current_logprobs * (tokens[:, -1] != eot)``;
      avg_logprob = sum_logprob / (length + 1) on the host.
    - ``no_speech_prob`` is softmax(raw logits at the SOT step)[<|nospeech|>]
      (whisper reads it at the SOT index of the initial forward).

    ``prev_budget > 0`` enables ``condition_on_previous_text``: the prompt
    becomes ``[<|startofprev|>, prev..., SOT, lang, transcribe(,
    notimestamps)]`` like upstream's prompt path. ``prev_tokens``
    [B, prev_budget] holds each row's previous-text tokens RIGHT-aligned
    (left cells = any filler) and ``prev_lens`` [B] their counts
    (``<= prev_budget - 1``; crop to ``n_text_ctx // 2 - 1`` like upstream).
    Rows differ in length inside ONE static-shape program: the left-pad
    slots are masked out of self-attention permanently and position
    embeddings start at 0 from each row's own <|startofprev|>; a row with
    ``prev_lens == 0`` sees no prefix at all (upstream omits the prompt
    entirely when it's empty).
    """
    B = audio.shape[0]
    never_mask, first_mask = _suppress_masks(cfg, suppress_ids, timestamps)
    audio_kv = _cross_kv(params, audio, cfg)

    cols = [
        jnp.full((B,), cfg.sot, jnp.int32),
        language_tokens.astype(jnp.int32),
        jnp.full((B,), cfg.token_transcribe, jnp.int32),
    ]
    if not timestamps:
        cols.append(jnp.full((B,), cfg.token_notimestamps, jnp.int32))
    base = jnp.stack(cols, axis=1)  # [B, base_P]
    if prev_budget > 0:
        prev_lens = prev_lens.astype(jnp.int32)
        pcols = jnp.arange(prev_budget)
        # the filler cell just left of each row's real tokens doubles as its
        # genuine <|startofprev|>; everything left of THAT stays masked
        prefix = jnp.where(
            pcols[None, :] >= prev_budget - prev_lens[:, None],
            prev_tokens.astype(jnp.int32), cfg.token_sot_prev)
        prompt = jnp.concatenate([prefix, base], axis=1)
        # rows with no previous text attend to nothing before SOT
        offset = jnp.where(
            prev_lens > 0, prev_budget - prev_lens - 1, prev_budget)
    else:
        prompt = base
        offset = None
    P = prompt.shape[1]
    sot_slot = P - base.shape[1]  # where <|nospeech|> is read (SOT input)
    # upstream stops sampling at n_text_ctx; clamp so the KV cache can never
    # wrap (dynamic_update_slice would silently clamp-overwrite slot T-1).
    # The returned token array keeps the requested width (EOT-filled tail).
    steps = min(max_tokens, cfg.n_text_ctx - P)
    assert steps >= 1, (
        f"prompt ({P}) leaves no sampling room in n_text_ctx "
        f"({cfg.n_text_ctx})"
    )

    D = cfg.n_text_state
    kv0 = {
        "k": jnp.zeros((cfg.n_text_layer, B, cfg.n_text_ctx, D), audio.dtype),
        "v": jnp.zeros((cfg.n_text_layer, B, cfg.n_text_ctx, D), audio.dtype),
    }
    out0 = jnp.full((B, max_tokens), cfg.eot, jnp.int32)
    temperature = jnp.asarray(temperature, jnp.float32)

    ts_begin = cfg.timestamp_begin
    vocab_ids = jnp.arange(cfg.n_vocab)

    def cond(state):
        i = state[0]
        done = state[4]
        return (i < P + steps - 1) & (~jnp.all(done))

    def _timestamp_rules(logits, i, tok, out, ts_last, has_ts):
        """whisper ApplyTimestampRules (decoding.py) as vector masks.

        ``s`` is the sampled-sequence length so far (the index about to be
        sampled); ``tok`` is the latest sampled token (when s >= 1) and
        ``out[:, s-2]`` the one before it. A sequence shorter than 2 counts
        its penultimate slot as a timestamp, exactly upstream's
        ``len(seq) < 2 or seq[-2] >= timestamp_begin``."""
        s = i + 1 - P
        neg = jnp.float32(-np.inf)
        is_ts_col = vocab_ids >= ts_begin  # [V]
        last_was_ts = (s >= 1) & (tok >= ts_begin)  # [B]
        pen = out[jnp.arange(B), jnp.maximum(s - 2, 0)]
        pen_was_ts = (s < 2) | (pen >= ts_begin)  # [B]
        # pairing: after a closed pair the next token is non-timestamp;
        # after a lone timestamp only a timestamp or EOT may follow
        logits = jnp.where(
            (last_was_ts & pen_was_ts)[:, None] & is_ts_col, neg, logits)
        logits = jnp.where(
            (last_was_ts & ~pen_was_ts)[:, None] & (vocab_ids < cfg.eot),
            neg, logits)
        # monotonic: bar timestamps below the last one seen (equal allowed
        # only when closing an open pair — upstream's timestamp_last vs +1)
        bound = jnp.where(last_was_ts & ~pen_was_ts, ts_last, ts_last + 1)
        logits = jnp.where(
            has_ts[:, None] & is_ts_col & (vocab_ids < bound[:, None]),
            neg, logits)
        # first sampled position: timestamps only, capped at 1.0 s
        init = s == 0
        logits = jnp.where(init & ~is_ts_col, neg, logits)
        logits = jnp.where(
            init & (vocab_ids > ts_begin + MAX_INITIAL_TIMESTAMP_INDEX),
            neg, logits)
        # if total timestamp probability beats every text token, force one
        lp = jax.nn.log_softmax(logits, axis=-1)
        ts_lp = jax.nn.logsumexp(
            jnp.where(is_ts_col, lp, neg), axis=-1)  # [B]
        max_text_lp = jnp.max(jnp.where(is_ts_col, neg, lp), axis=-1)
        logits = jnp.where(
            (ts_lp > max_text_lp)[:, None] & ~is_ts_col, neg, logits)
        return logits

    def body(state):
        i, tok, kv, out, done, sum_lp, nsp, ts_last, has_ts = state
        raw, kv = _decoder_step(params, cfg, tok, i, kv, audio_kv,
                                offset=offset)
        nsp = jnp.where(
            i == sot_slot,
            jax.nn.softmax(raw, axis=-1)[:, cfg.token_nospeech], nsp
        )
        logits = raw + never_mask
        logits = jnp.where(i + 1 == P, logits + first_mask, logits)
        if timestamps:
            logits = _timestamp_rules(logits, i, tok, out, ts_last, has_ts)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        sampled = jax.random.categorical(
            jax.random.fold_in(key, i), logits / jnp.maximum(temperature, 1e-6)
        ).astype(jnp.int32)
        nxt = jnp.where(temperature > 0, sampled, greedy)
        in_prompt = i + 1 < P
        nxt = jnp.where(in_prompt, prompt[:, jnp.minimum(i + 1, P - 1)], nxt)
        take = (~in_prompt) & (~done)
        nxt = jnp.where(done & ~in_prompt, cfg.eot, nxt)
        logp = jax.nn.log_softmax(logits, axis=-1)
        sum_lp = sum_lp + jnp.where(take, logp[jnp.arange(B), nxt], 0.0)
        out = jax.lax.cond(
            in_prompt,
            lambda o: o,
            lambda o: jax.lax.dynamic_update_slice(o, nxt[:, None], (0, i + 1 - P)),
            out,
        )
        done = done | (~in_prompt & (nxt == cfg.eot))
        new_ts = take & (nxt >= ts_begin)
        ts_last = jnp.where(new_ts, nxt, ts_last)
        has_ts = has_ts | new_ts
        return i + 1, nxt, kv, out, done, sum_lp, nsp, ts_last, has_ts

    state = (
        jnp.asarray(0),
        prompt[:, 0],  # == SOT when unconditioned (sot_slot 0)
        kv0,
        out0,
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.full((B,), ts_begin, jnp.int32),
        jnp.zeros((B,), bool),
    )
    _, _, _, out, _, sum_lp, nsp, _, _ = jax.lax.while_loop(cond, body, state)
    lengths = jnp.argmax(out == cfg.eot, axis=-1)
    lengths = jnp.where(jnp.any(out == cfg.eot, axis=-1), lengths, max_tokens)
    return out, lengths, sum_lp, nsp


def whisper_greedy_decode(
    params: dict,
    mel: jnp.ndarray,
    cfg: WhisperConfig,
    max_tokens: int = 224,
    language_token: int | None = None,
    suppress_ids: tuple = (),
):
    """Greedy transcription (temperature-0 first candidate of the transcribe
    policy). Returns (tokens [B, max_tokens], lengths [B])."""
    lang = cfg.token_lang_en if language_token is None else language_token
    toks, lens, _, _ = whisper_decode(
        params, mel, cfg,
        jnp.full((mel.shape[0],), lang, jnp.int32),
        jnp.asarray(0.0), jax.random.PRNGKey(0),
        max_tokens=max_tokens, suppress_ids=suppress_ids,
    )
    return toks, lens


def whisper_detect_language(params: dict, mel: jnp.ndarray, cfg: WhisperConfig):
    """Encode + language detection (wrapper over ``whisper_encode_jit`` ->
    ``whisper_detect_language_audio``)."""
    audio = whisper_encode_jit(params, mel, cfg)
    return whisper_detect_language_audio(params, audio, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def whisper_detect_language_audio(params: dict, audio: jnp.ndarray, cfg: WhisperConfig):
    """whisper's ``detect_language`` over pre-encoded audio features: one
    decoder step on [SOT], logits restricted to the 99 language tokens.
    Returns (lang_token [B], probs [B, n_vocab] softmax over the restricted
    logits)."""
    B = audio.shape[0]
    audio_kv = _cross_kv(params, audio, cfg)
    D = cfg.n_text_state
    kv0 = {
        "k": jnp.zeros((cfg.n_text_layer, B, cfg.n_text_ctx, D), audio.dtype),
        "v": jnp.zeros((cfg.n_text_layer, B, cfg.n_text_ctx, D), audio.dtype),
    }
    logits, _ = _decoder_step(
        params, cfg, jnp.full((B,), cfg.sot, jnp.int32), jnp.asarray(0), kv0, audio_kv
    )
    lang_lo = cfg.token_lang_en
    lang_hi = min(cfg.token_lang_en + _N_LANGUAGES, cfg.n_vocab)
    mask = np.full(cfg.n_vocab, -np.inf, np.float32)
    mask[lang_lo:lang_hi] = 0.0
    logits = logits + jnp.asarray(mask)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), jax.nn.softmax(logits, axis=-1)


# ---- weight import (OpenAI whisper checkpoint layout) ----------------------


def _lin(sd, name):
    w = np.asarray(sd[f"{name}.weight"], np.float32).T
    b = sd.get(f"{name}.bias")
    return w, (np.asarray(b, np.float32) if b is not None else None)


def whisper_from_state_dict(sd: dict, cfg: WhisperConfig) -> dict:
    """Map an OpenAI whisper ``base.pt`` model state_dict onto our tree."""

    def ln(name):
        return {
            "scale": np.asarray(sd[f"{name}.weight"], np.float32),
            "bias": np.asarray(sd[f"{name}.bias"], np.float32),
        }

    def attn(prefix):
        qw, qb = _lin(sd, f"{prefix}.query")
        kw, _ = _lin(sd, f"{prefix}.key")
        vw, vb = _lin(sd, f"{prefix}.value")
        ow, ob = _lin(sd, f"{prefix}.out")
        return {"q_w": qw, "q_b": qb, "k_w": kw, "v_w": vw, "v_b": vb, "o_w": ow, "o_b": ob}

    def mlp(prefix):
        w1, b1 = _lin(sd, f"{prefix}.0")
        w2, b2 = _lin(sd, f"{prefix}.2")
        return {"w1": w1, "b1": b1, "w2": w2, "b2": b2}

    def stack(items):
        return jax.tree.map(lambda *xs: np.stack(xs), *items)

    enc_layers = stack([
        {
            "ln1": ln(f"encoder.blocks.{i}.attn_ln"),
            "attn": attn(f"encoder.blocks.{i}.attn"),
            "ln2": ln(f"encoder.blocks.{i}.mlp_ln"),
            "mlp": mlp(f"encoder.blocks.{i}.mlp"),
        }
        for i in range(cfg.n_audio_layer)
    ])
    dec_layers = stack([
        {
            "ln1": ln(f"decoder.blocks.{i}.attn_ln"),
            "attn": attn(f"decoder.blocks.{i}.attn"),
            "ln2": ln(f"decoder.blocks.{i}.cross_attn_ln"),
            "cross": attn(f"decoder.blocks.{i}.cross_attn"),
            "ln3": ln(f"decoder.blocks.{i}.mlp_ln"),
            "mlp": mlp(f"decoder.blocks.{i}.mlp"),
        }
        for i in range(cfg.n_text_layer)
    ])
    return {
        "conv1_w": np.asarray(sd["encoder.conv1.weight"], np.float32).transpose(2, 1, 0),
        "conv1_b": np.asarray(sd["encoder.conv1.bias"], np.float32),
        "conv2_w": np.asarray(sd["encoder.conv2.weight"], np.float32).transpose(2, 1, 0),
        "conv2_b": np.asarray(sd["encoder.conv2.bias"], np.float32),
        "enc_layers": enc_layers,
        "enc_ln_post": ln("encoder.ln_post"),
        "tok_emb": np.asarray(sd["decoder.token_embedding.weight"], np.float32),
        "pos_emb": np.asarray(sd["decoder.positional_embedding"], np.float32),
        "dec_layers": dec_layers,
        "dec_ln": ln("decoder.ln"),
    }


def random_whisper_params(cfg: WhisperConfig, seed: int = 0) -> dict:
    """Random weights (pipeline tests without the released checkpoint)."""
    rng = np.random.default_rng(seed)

    def lin(din, dout, bias=True):
        return (
            (rng.standard_normal((din, dout)) / math.sqrt(din)).astype(np.float32),
            np.zeros(dout, np.float32) if bias else None,
        )

    def ln():
        return {"scale": np.ones(cfg.n_audio_state, np.float32),
                "bias": np.zeros(cfg.n_audio_state, np.float32)}

    D = cfg.n_audio_state

    def attn():
        qw, qb = lin(D, D)
        kw, _ = lin(D, D)
        vw, vb = lin(D, D)
        ow, ob = lin(D, D)
        return {"q_w": qw, "q_b": qb, "k_w": kw, "v_w": vw, "v_b": vb, "o_w": ow, "o_b": ob}

    def mlp():
        w1, b1 = lin(D, 4 * D)
        w2, b2 = lin(4 * D, D)
        return {"w1": w1, "b1": b1, "w2": w2, "b2": b2}

    def stack(n, f):
        return jax.tree.map(lambda *xs: np.stack(xs), *[f() for _ in range(n)])

    return {
        "conv1_w": (rng.standard_normal((3, cfg.n_mels, D)) * 0.05).astype(np.float32),
        "conv1_b": np.zeros(D, np.float32),
        "conv2_w": (rng.standard_normal((3, D, D)) * 0.05).astype(np.float32),
        "conv2_b": np.zeros(D, np.float32),
        "enc_layers": stack(cfg.n_audio_layer, lambda: {
            "ln1": ln(), "attn": attn(), "ln2": ln(), "mlp": mlp()}),
        "enc_ln_post": ln(),
        "tok_emb": (rng.standard_normal((cfg.n_vocab, D)) * 0.02).astype(np.float32),
        "pos_emb": (rng.standard_normal((cfg.n_text_ctx, D)) * 0.02).astype(np.float32),
        "dec_layers": stack(cfg.n_text_layer, lambda: {
            "ln1": ln(), "attn": attn(), "ln2": ln(), "cross": attn(),
            "ln3": ln(), "mlp": mlp()}),
        "dec_ln": ln(),
    }


# ---- transcribe policy (whisper.transcribe defaults) ----------------------

# whisper.transcribe PROGRAMMATIC defaults — what an option-free
# transcribe() call (the reference's usage, /root/reference/
# test_cascaded.py:224) actually runs: temperature=(0, .2, .4, .6, .8, 1.0),
# compression_ratio_threshold=2.4, logprob_threshold=-1.0,
# no_speech_threshold=0.6, and best_of=None, which DecodingTask resolves as
# ``n_group = beam_size or best_of or 1`` => ONE sample per t>0 rung. (The
# whisper *CLI* defaults best_of=5; rounds <=3 shipped that width — the
# COMPONENTS.md deviations table records the change.)
TRANSCRIBE_TEMPERATURES = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
COMPRESSION_RATIO_THRESHOLD = 2.4
LOGPROB_THRESHOLD = -1.0
NO_SPEECH_THRESHOLD = 0.6
BEST_OF = 1


def compression_ratio(text: str) -> float:
    """whisper.utils.compression_ratio: utf-8 bytes / zlib-compressed bytes.
    High values mean degenerate repetition loops."""
    import zlib

    data = text.encode("utf-8")
    return len(data) / len(zlib.compress(data))


def needs_fallback(avg_logprob: float, cr: float, no_speech_prob: float) -> bool:
    """whisper.transcribe's retry gate (transcribe.py decode_with_fallback):
    retry when too repetitive (cr > 2.4) or too unlikely (avg lp < -1.0),
    EXCEPT when the segment looks like silence (nospeech prob > 0.6 with the
    low logprob) — silence doesn't improve with temperature."""
    fb = False
    if cr > COMPRESSION_RATIO_THRESHOLD:
        fb = True
    if avg_logprob < LOGPROB_THRESHOLD:
        fb = True
    if no_speech_prob > NO_SPEECH_THRESHOLD:
        fb = False
    return fb


def is_silent(avg_logprob: float, no_speech_prob: float) -> bool:
    """whisper.transcribe's segment-skip rule: nospeech prob above threshold
    unless a confident logprob overrides it."""
    skip = no_speech_prob > NO_SPEECH_THRESHOLD
    if avg_logprob > LOGPROB_THRESHOLD:
        skip = False
    return skip


# seconds per mel frame (hop 160 @ 16 kHz) and per timestamp token (2 frames)
_FRAME_SECONDS = _WHISPER_HOP / 16000.0
_INPUT_STRIDE = 2
TIME_PRECISION = _FRAME_SECONDS * _INPUT_STRIDE  # 0.02 s


def parse_seek_window(tokens, silent: bool, seek: int, segment_size: int,
                      cfg: WhisperConfig):
    """whisper.transcribe's per-window seek/segment logic (transcribe.py's
    ``consecutive`` / ``single_timestamp_ending`` block).

    ``tokens`` is one window's sampled sequence (timestamp ids interleaved
    with text), ``seek`` the window's start and ``segment_size`` its extent,
    both in mel frames. Returns ``(advance_frames, segments)``:

    - a silent window is skipped whole (no segments, advance the full
      extent);
    - tokens are cut at every consecutive-timestamp pair into closed
      segments; if the window ends with a lone timestamp
      (``single_timestamp_ending``) there is no speech after it, so the
      trailing piece is a final closed segment and the seek advances the
      full extent; otherwise the unfinished trailing piece is DISCARDED and
      the seek advances to the last closed segment's end timestamp;
    - with no consecutive pair at all, all tokens form one segment whose end
      falls back to the last decoded timestamp (if any beyond 0.00), and the
      seek advances the full extent.

    Segment start/end are absolute seconds (``seek`` offset included). A
    non-positive computed advance (a window closing at its own 0.00 mark,
    which would stall upstream's loop too) falls back to the full extent.
    """
    tb = cfg.timestamp_begin
    time_offset = seek * _FRAME_SECONDS
    if silent:
        return segment_size, []
    toks = [int(t) for t in tokens]
    is_ts = [t >= tb for t in toks]
    single_ending = len(toks) >= 2 and (not is_ts[-2]) and is_ts[-1]
    consecutive = [i + 1 for i in range(len(toks) - 1)
                   if is_ts[i] and is_ts[i + 1]]
    segs = []
    if consecutive:
        slices = list(consecutive)
        if single_ending:
            slices.append(len(toks))
        last = 0
        for cur in slices:
            st = toks[last:cur]
            segs.append({
                "start": time_offset + (st[0] - tb) * TIME_PRECISION,
                "end": time_offset + (st[-1] - tb) * TIME_PRECISION,
                "tokens": np.asarray(st, np.int32),
            })
            last = cur
        if single_ending:
            advance = segment_size
        else:
            advance = (toks[last - 1] - tb) * _INPUT_STRIDE
    else:
        duration = segment_size * _FRAME_SECONDS
        ts = [t for t in toks if t >= tb]
        if ts and ts[-1] != tb:
            duration = (ts[-1] - tb) * TIME_PRECISION
        segs.append({
            "start": time_offset,
            "end": time_offset + duration,
            "tokens": np.asarray(toks, np.int32),
        })
        advance = segment_size
    if advance <= 0:
        advance = segment_size
    return advance, segs


class WhisperASR:
    """Batch transcriber: wav [B, T]@16k -> token ids / transcribe results.

    ``transcribe_tokens`` is the plain greedy pass; ``transcribe_results``
    runs the full whisper.transcribe default policy (timestamped decoding
    under ApplyTimestampRules, temperature fallback with ``best_of`` sampled
    candidates per rung — default 1, upstream's option-free width,
    silence skip, optional language detection) around the single compiled
    decode program. ``language=None`` auto-detects per row like
    ``whisper.load_model("base").transcribe(sample)`` at
    ``/root/reference/test_cascaded.py:224``; ``without_timestamps=True``
    reverts to the pinned-<|notimestamps|> program.
    """

    def __init__(self, weights_path: str | None = None, cfg: WhisperConfig | None = None,
                 params: dict | None = None, suppress_ids: tuple = (),
                 language: str | None = "en", text_fn=None, seed: int = 0,
                 temperatures: tuple = TRANSCRIBE_TEMPERATURES,
                 best_of: int = BEST_OF, without_timestamps: bool = False,
                 condition_on_previous_text: bool = True,
                 precompile: bool = False):
        self.cfg = cfg or WhisperConfig()
        # whisper.transcribe default: each long-form window's prompt carries
        # the previous windows' text (reset after a rung hotter than
        # prompt_reset_on_temperature=0.5). Single-window decodes have no
        # previous text, so this only shapes the seek path.
        self.condition_on_previous_text = bool(condition_on_previous_text)
        # whisper.transcribe's default is timestamped decoding
        # (without_timestamps=False): ApplyTimestampRules shape every step's
        # distribution, so even the TEXT of a transcript differs from a
        # <|notimestamps|> decode. True reverts to the pinned-notimestamps
        # program (e.g. token-level smoke tests).
        self.timestamps = not without_timestamps
        self.suppress_ids = tuple(sorted(set(int(t) for t in suppress_ids)))
        if language not in (None, "en"):
            # only 'en' ships a pinned prompt id; mapping other codes to
            # tokens needs tokenizer assets the cascade doesn't use. Refuse
            # rather than silently decoding with the <|en|> prompt.
            raise ValueError(
                f"language={language!r} unsupported: pass 'en' or None "
                "(None auto-detects per row like whisper.transcribe)"
            )
        self.language = language
        self.text_fn = text_fn  # token ids -> text, for compression ratio
        self.seed = seed
        # whisper.transcribe's `temperature` / `best_of` decode options —
        # (0.0,) pins greedy-only (what smoke tests use on stub weights)
        self.temperatures = tuple(float(t) for t in temperatures)
        self.best_of = int(best_of)
        if params is None and weights_path is not None:
            import torch

            blob = torch.load(weights_path, map_location="cpu", weights_only=False)
            sd = blob["model_state_dict"] if "model_state_dict" in blob else blob
            sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
            params = whisper_from_state_dict(sd, self.cfg)
        if params is None:
            params = random_whisper_params(self.cfg)
        self.params = jax.tree.map(jnp.asarray, params)
        # precompile=True: the first transcribe_results call for each
        # (batch, max_tokens) shape warms EVERY decode program the policy can
        # lazily reach (sampled best_of tiling, conditioned prev-prompt)
        # up front, so a 35k-mixture eval never absorbs a multi-second
        # compile stall mid-protocol when the first gate failure or the
        # first carried prompt lands hundreds of mixtures in. Off by default
        # (unit tests construct many ASRs and want lazy compiles).
        self.precompile = bool(precompile)
        self._warmed: set = set()

    def warmup(self, batch_size: int, max_tokens: int = 224) -> None:
        """Compile every decode program ``transcribe_results`` can reach at
        this (batch, max_tokens) shape, on zero audio.

        Temperature and the PRNG key are traced, so the greedy rung and the
        sampled rungs share one program per shape; the DISTINCT programs are
        the plain batch and the best_of-tiled batch, each with and without
        the conditioned-prompt budget (``prev_budget`` is a static argument),
        plus the encoder and (when auto-detecting) the language-detect
        program. Each warm run executes the full max_tokens decode loop once
        — a fixed construction-time cost traded for zero mid-eval stalls.
        """
        cfg = self.cfg
        B = int(batch_size)
        key = (B, int(max_tokens))
        if key in self._warmed:
            return
        wav = jnp.zeros((B, cfg.n_audio_ctx * 2 * _WHISPER_HOP), jnp.float32)
        audio = whisper_encode_jit(self.params, self._mel(wav), cfg)
        lang = self._language_for(audio)
        widths = [B]
        if any(t > 0 for t in self.temperatures) and self.best_of != 1:
            widths.append(B * self.best_of)
        K = cfg.n_text_ctx // 2
        for n in widths:
            a = audio if n == B else jnp.repeat(audio, self.best_of, axis=0)
            l_ = lang if n == B else jnp.repeat(lang, self.best_of, axis=0)
            prev_variants = [{}]
            if self.condition_on_previous_text:
                prev_variants.append({
                    "prev_budget": K,
                    "prev_tokens": jnp.zeros((n, K), jnp.int32),
                    "prev_lens": jnp.zeros((n,), jnp.int32),
                })
            for kw in prev_variants:
                out = whisper_decode_audio(
                    self.params, a, cfg, l_, jnp.asarray(0.0),
                    jax.random.PRNGKey(0), max_tokens=max_tokens,
                    suppress_ids=self.suppress_ids,
                    timestamps=self.timestamps, **kw,
                )
                jax.block_until_ready(out)
        self._warmed.add(key)

    def _mel(self, wav16k: jnp.ndarray) -> jnp.ndarray:
        window = self.cfg.n_audio_ctx * 2 * _WHISPER_HOP
        if wav16k.shape[-1] > window:
            raise ValueError(
                f"input of {wav16k.shape[-1]} samples exceeds the "
                f"{window}-sample ({window / 16000:.0f} s) single-window "
                "decode this transcriber implements; the reference eval "
                "protocol only produces <=30 s utterances"
            )
        return whisper_log_mel(wav16k, self.cfg.n_mels, n_frames=self.cfg.n_audio_ctx * 2)

    def _language_for(self, audio: jnp.ndarray) -> jnp.ndarray:
        if self.language is None:
            lang, _ = whisper_detect_language_audio(self.params, audio, self.cfg)
            return lang
        return jnp.full((audio.shape[0],), self.cfg.token_lang_en, jnp.int32)

    def transcribe_tokens(self, wav16k: jnp.ndarray, max_tokens: int = 224):
        audio = whisper_encode_jit(self.params, self._mel(wav16k), self.cfg)
        toks, lens, _, _ = whisper_decode_audio(
            self.params, audio, self.cfg, self._language_for(audio),
            jnp.asarray(0.0), jax.random.PRNGKey(self.seed),
            max_tokens=max_tokens, suppress_ids=self.suppress_ids,
            timestamps=self.timestamps,
        )
        return np.asarray(toks), np.asarray(lens)

    def _text(self, ids: np.ndarray) -> str:
        # text tokens only: upstream's tokenizer.decode drops specials and
        # timestamp ids (everything >= EOT) before the strip + cr gate
        ids = np.asarray(ids)
        ids = ids[ids < self.cfg.eot]
        # upstream strips the decoded text BEFORE the compression-ratio gate
        # (DecodingTask: texts = [tokenizer.decode(t).strip() ...])
        if self.text_fn is not None:
            return self.text_fn(ids).strip()
        # no tokenizer assets: a stable pseudo-text over ids preserves the
        # repetition structure zlib measures (documented approximation)
        return " ".join(f"w{int(t)}" for t in ids)

    def transcribe_results(self, wav16k: jnp.ndarray, max_tokens: int = 224):
        """Full whisper.transcribe default policy over a batch of rows.

        Returns a list of per-row dicts: ``tokens`` (np.int32, trimmed),
        ``text`` (via ``text_fn`` when provided), ``avg_logprob``,
        ``compression_ratio``, ``no_speech_prob``, ``temperature`` (the rung
        that produced the accepted result), and ``silent``. whisper retries
        each 30 s segment independently; rows here are independent segments,
        so re-decoding the batch and accepting per row is behaviorally
        identical per row.

        EVERY row runs upstream's SEEK loop (``_transcribe_seek``) — even a
        <=30 s utterance re-decodes its tail when the decode ends
        mid-segment after a closed timestamp pair, and the unfinished tail
        is dropped from the transcript, exactly like ``whisper.transcribe``
        (one iteration in the common case of a cleanly-ending window). Each
        window decodes under the full per-segment policy, is cut into
        timestamp-delimited segments, and the seek advances to the last
        closed segment's end timestamp (or the whole window when it ends
        cleanly) — the per-row dict carries ``windows`` (per-seek results)
        and ``segments`` (absolute-time upstream-style segment list).
        """
        if self.precompile:
            self.warmup(wav16k.shape[0], max_tokens)
        return self._transcribe_seek(wav16k, max_tokens)

    def _transcribe_seek(self, wav16k: jnp.ndarray, max_tokens: int):
        """whisper.transcribe's long-form seek loop (transcribe.py) over a
        batch of rows.

        Each iteration decodes ONE 30 s window per still-active row from its
        current seek offset (full temperature-ladder policy), cuts it into
        segments with ``parse_seek_window``, and advances that row's seek to
        the window's last closed timestamp (straddling speech re-decodes
        from the cut, exactly upstream's behavior). Language resolves ONCE
        from the first window (upstream's single detect_language call before
        the loop) and is pinned for every later window. Rows seek
        independently; finished rows ride along in the static-shape batch
        (their decode is discarded) so every iteration reuses one compiled
        program. Upstream slices a precomputed full-audio mel instead of
        re-STFTing from the window's first sample — identical frame math,
        boundary frames may differ in the last partial FFT window.

        A window result's ``tokens``/``text`` are its SEGMENT tokens — the
        discarded unfinished tail is NOT part of the transcript (it decodes
        again after the seek); the raw sample sequence stays in
        ``decoded_tokens``. ``condition_on_previous_text`` (default, like
        upstream): each window's prompt carries the accumulated segment
        tokens (cropped to ``n_text_ctx // 2 - 1``) as a
        ``<|startofprev|>`` prefix, reset whenever a window needed a rung
        hotter than 0.5 — rows of different prompt lengths share one
        static-shape decode program via right-aligned prompts with per-row
        position offsets and permanently masked pad slots.
        """
        cfg = self.cfg
        frames_w = cfg.n_audio_ctx * 2
        window = frames_w * _WHISPER_HOP
        wav = np.asarray(wav16k, np.float32)
        B, T = wav.shape
        content_frames = -(-T // _WHISPER_HOP)
        seek = np.zeros(B, np.int64)
        # stall budget: timestamp-sized advances are legitimate (straddling
        # speech) but degenerate decodes could crawl 2 frames at a time;
        # past ~2x the no-overlap window count a row advances whole windows
        # (upstream has no such guard and can crawl arbitrarily slowly)
        budget = 2 * (-(-content_frames // frames_w)) + 8
        n_win = np.zeros(B, np.int64)
        lang = None
        win_results: list[list[dict]] = [[] for _ in range(B)]
        segments: list[list[dict]] = [[] for _ in range(B)]
        # condition_on_previous_text: per-row prompt accumulator (segment
        # tokens only, like upstream's all_tokens) with the
        # prompt_reset_on_temperature=0.5 reset point
        K = cfg.n_text_ctx // 2  # 1 (<|startofprev|>) + upstream's crop
        prompt_toks: list[list[int]] = [[] for _ in range(B)]
        while (seek < content_frames).any():
            rows = np.zeros((B, window), np.float32)
            for b in range(B):
                chunk = wav[b, int(seek[b]) * _WHISPER_HOP:][:window]
                rows[b, : len(chunk)] = chunk
            audio = whisper_encode_jit(
                self.params, self._mel(jnp.asarray(rows)), cfg)
            if lang is None:
                lang = self._language_for(audio)
            prev = None
            # all-empty prompts (always true for the first window, hence for
            # EVERY <=30 s utterance) select the cheap prev_budget=0 program:
            # the conditioned program's while_loop walks K extra prompt slots
            # per rung for zero behavior change when nothing is conditioned on
            if self.condition_on_previous_text and any(prompt_toks):
                pt = np.zeros((B, K), np.int32)
                pl = np.zeros(B, np.int32)
                for b in range(B):
                    tail = prompt_toks[b][-(K - 1):]
                    pl[b] = len(tail)
                    if tail:
                        pt[b, K - len(tail):] = tail
                prev = (jnp.asarray(pt), jnp.asarray(pl))
            res = self._decode_rungs(
                audio, lang, max_tokens, active_rows=seek < content_frames,
                prev=prev)
            for b in range(B):
                if seek[b] >= content_frames:
                    continue
                segment_size = min(frames_w, content_frames - int(seek[b]))
                r = dict(res[b], seek=int(seek[b]))
                advance, segs = parse_seek_window(
                    r["tokens"], r["silent"], int(seek[b]), segment_size, cfg)
                n_win[b] += 1
                if n_win[b] > budget:
                    advance = segment_size
                # a decoded timestamp can't exceed the window at the real
                # config (1500 ts tokens == 3000 frames) — the clamp only
                # bites on shrunken test configs whose window is shorter
                # than the vocab's timestamp range
                advance = min(advance, segment_size)
                r["decoded_tokens"] = r["tokens"]
                r["tokens"] = (
                    np.concatenate([s["tokens"] for s in segs])
                    if segs else np.zeros(0, np.int32)
                )
                if self.text_fn is not None:
                    r["text"] = self._text(r["tokens"])
                for s in segs:
                    s["text"] = self._text(s["tokens"])
                    s.update(
                        temperature=r["temperature"],
                        avg_logprob=r["avg_logprob"],
                        compression_ratio=r["compression_ratio"],
                        no_speech_prob=r["no_speech_prob"],
                    )
                win_results[b].append(r)
                segments[b].extend(segs)
                seek[b] += advance
                # upstream: all_tokens extends with the segment tokens, THEN
                # a rung hotter than prompt_reset_on_temperature=0.5 moves
                # the reset point past them — text that needed high
                # temperature is a bad prompt, its own window included
                prompt_toks[b].extend(int(t) for t in r["tokens"])
                if r["temperature"] > 0.5:
                    prompt_toks[b] = []
        out = []
        for b in range(B):
            merged = self._merge_windows(win_results[b])
            merged["segments"] = segments[b]
            out.append(merged)
        return out

    def _decode_rungs(self, audio: jnp.ndarray, lang: jnp.ndarray,
                      max_tokens: int, active_rows=None,
                      prev=None) -> list[dict]:
        """The temperature ladder over pre-encoded audio features [B, .., D]
        (the policy engine shared by the single-window and long-form paths).

        ``active_rows`` (seek path): rows NOT listed ride along in the
        static-shape batch but never gate retries — otherwise one finished
        row's zero-padded window failing the quality gates would drag the
        whole batch through every sampled rung on every remaining iteration.
        Their results stay None.

        ``prev`` (seek path, condition_on_previous_text): a
        ``(prev_tokens [B, K], prev_lens [B])`` pair handed unchanged to
        every rung — upstream keeps the same prompt across a window's
        fallback attempts too."""
        B = audio.shape[0]
        audio_k = None  # best_of-tiled features, built on first sampled rung

        def pkw(rep: int = 1):  # prev-prompt kwargs, best_of-tiled on demand
            if prev is None:
                return {}
            pt, pl = prev
            if rep > 1:
                pt, pl = jnp.repeat(pt, rep, axis=0), jnp.repeat(pl, rep)
            return {"prev_budget": prev[0].shape[1],
                    "prev_tokens": pt, "prev_lens": pl}

        results: list[dict | None] = [None] * B
        pending = (list(range(B)) if active_rows is None
                   else [b for b in range(B) if active_rows[b]])
        temperatures = self.temperatures
        for ti, t in enumerate(temperatures):
            if t == 0.0:
                toks, lens, slp, nsp = whisper_decode_audio(
                    self.params, audio, self.cfg, lang,
                    jnp.asarray(0.0), jax.random.PRNGKey(self.seed),
                    max_tokens=max_tokens, suppress_ids=self.suppress_ids,
                    timestamps=self.timestamps, **pkw(),
                )
                toks, lens, slp, nsp = map(np.asarray, (toks, lens, slp, nsp))
            else:
                # best_of>1: tile rows, sample, rank by sum_logprob / length
                # (MaximumLikelihoodRanker with length_penalty=None); at the
                # default best_of=1 this degenerates to one sample per row —
                # same batch shape as the greedy program, no tiling cost
                k = self.best_of
                if audio_k is None:
                    audio_k = jnp.repeat(audio, k, axis=0)
                toks5, lens5, slp5, nsp5 = whisper_decode_audio(
                    self.params, audio_k, self.cfg, jnp.repeat(lang, k, axis=0),
                    jnp.asarray(t), jax.random.PRNGKey(self.seed * 1000 + ti),
                    max_tokens=max_tokens, suppress_ids=self.suppress_ids,
                    timestamps=self.timestamps, **pkw(k),
                )
                toks5, lens5, slp5, nsp5 = map(np.asarray, (toks5, lens5, slp5, nsp5))
                score = slp5 / np.maximum(lens5, 1)
                pick = score.reshape(B, k).argmax(axis=1) + np.arange(B) * k
                toks, lens, slp, nsp = toks5[pick], lens5[pick], slp5[pick], nsp5[pick]
            still = []
            for b in pending:
                n = int(lens[b])
                ids = toks[b, :n]
                avg_lp = float(slp[b]) / (n + 1)
                txt = self._text(ids)
                cr = compression_ratio(txt)
                res = {
                    "tokens": ids,
                    "text": txt if self.text_fn is not None else None,
                    "avg_logprob": avg_lp,
                    "compression_ratio": cr,
                    "no_speech_prob": float(nsp[b]),
                    "temperature": t,
                    "silent": is_silent(avg_lp, float(nsp[b])),
                }
                results[b] = res
                if needs_fallback(avg_lp, cr, float(nsp[b])) and ti + 1 < len(
                    temperatures
                ):
                    still.append(b)
            pending = still
            if not pending:
                break
        return results

    def _merge_windows(self, rs: list[dict]) -> dict:
        """Merge per-window transcribe results for one long-form row.

        Tokens/text concatenate over NON-silent windows (whisper skips silent
        segments without emitting); ``avg_logprob`` re-aggregates from the
        per-window sums with whisper's per-segment (n+1) accounting;
        ``compression_ratio`` is recomputed on the merged text;
        ``no_speech_prob`` reports the least-silent window (the row has
        speech if any window does); ``temperature`` the highest accepted
        rung; ``silent`` only when every window is."""
        if not rs:
            # zero-length audio: no windows at all (upstream returns empty
            # text/segments for empty input rather than crashing)
            return {
                "tokens": np.zeros(0, np.int32),
                "text": "" if self.text_fn is not None else None,
                "avg_logprob": 0.0,
                "compression_ratio": compression_ratio(""),
                "no_speech_prob": 1.0,
                "temperature": 0.0,
                "silent": True,
                "windows": [],
            }
        voiced = [r for r in rs if not r["silent"]]
        toks = (
            np.concatenate([r["tokens"] for r in voiced])
            if voiced
            else np.zeros(0, np.int32)
        )
        # avg_logprob inverts with the DECODED length (the seek path rewrote
        # ``tokens`` to segment-only ids; each window's sum_logprob was
        # accumulated over its raw sample sequence, kept in decoded_tokens)
        n_dec = [len(r.get("decoded_tokens", r["tokens"])) for r in rs]
        n_total = sum(n_dec)
        sum_lp = sum(r["avg_logprob"] * (n + 1) for r, n in zip(rs, n_dec))
        text = None
        if self.text_fn is not None:
            text = " ".join(t for t in (r["text"] for r in voiced) if t)
        return {
            "tokens": toks,
            "text": text,
            "avg_logprob": sum_lp / (n_total + len(rs)),
            "compression_ratio": compression_ratio(
                text if text is not None else self._text(toks)
            ),
            "no_speech_prob": min(r["no_speech_prob"] for r in rs),
            "temperature": max(r["temperature"] for r in rs),
            "silent": all(r["silent"] for r in rs),
            "windows": rs,
        }
