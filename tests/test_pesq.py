"""P.862-scale PESQ: structural-property validation (ITU conformance vectors
are unavailable in this zero-egress image — documented in eval/pesq.py)."""

import numpy as np
import pytest

from cse_tpu.eval.pesq import PesqMetric, mos_lqo, pesq_nb


def _speechlike(rng, n=24000, sr=8000):
    """Modulated multi-tone in the telephone band with pauses (speech-ish)."""
    t = np.arange(n) / sr
    env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None) ** 2
    x = np.zeros(n)
    for f0, a in ((220, 1.0), (440, 0.6), (880, 0.4), (1760, 0.25)):
        x += a * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6.28))
    x *= env
    x += 0.02 * rng.standard_normal(n)
    return (x / np.max(np.abs(x))).astype(np.float64)


def test_identity_scores_maximum(rng):
    x = _speechlike(rng)
    s = pesq_nb(x, x)
    assert s > 4.49, s


def test_level_invariance(rng):
    """Gain offsets are equalized away (level alignment): +-12 dB changes
    the score by < 0.05."""
    x = _speechlike(rng)
    hi = pesq_nb(x, 4.0 * x)
    lo = pesq_nb(x, 0.25 * x)
    assert hi > 4.45 and lo > 4.45, (hi, lo)


def test_monotone_under_noise(rng):
    """Strictly decreasing score as SNR falls 30 -> 0 dB."""
    x = _speechlike(rng)
    noise = rng.standard_normal(len(x))
    noise /= np.sqrt(np.mean(noise**2))
    px = np.sqrt(np.mean(x**2))
    scores = []
    for snr_db in (30, 20, 10, 0):
        g = px * 10 ** (-snr_db / 20)
        scores.append(pesq_nb(x, x + g * noise))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 2.8, scores  # mild noise stays in the good range
    assert scores[-1] < scores[0] - 0.8, scores  # 0 dB SNR clearly worse


def test_alignable_delay_recovered(rng):
    """A 20 ms delay is recovered by the alignment stage: score within 0.25
    of the aligned score (vs a collapse without alignment)."""
    x = _speechlike(rng)
    d = np.pad(x, (160, 0))[: len(x)]
    assert pesq_nb(x, d) > pesq_nb(x, x) - 0.25


def test_uncorrelated_noise_scores_low(rng):
    x = _speechlike(rng)
    y = rng.standard_normal(len(x))
    assert pesq_nb(x, y) < 2.5


def test_degradation_ranking(rng):
    """Known orderings: clean > quantized (step 1/16, ~23 dB SNR) >
    half-band-dropped + 0 dB noise. (The old step-1/4 quantizer was
    ambiguous once the spec's tabulated IRS receive curve — which passes
    the 200-300 Hz fundamentals the previous analytic curve suppressed —
    landed: 2-bit quantization of the fundamental is genuinely comparable
    to the noisy case.)"""
    x = _speechlike(rng)
    quant = np.round(x * 16) / 16
    noise = rng.standard_normal(len(x))
    noise /= np.sqrt(np.mean(noise**2))
    bad = 0.5 * x + 0.5 * np.sqrt(np.mean(x**2)) * noise
    s_clean, s_q, s_bad = pesq_nb(x, x), pesq_nb(x, quant), pesq_nb(x, bad)
    assert s_clean > s_q > s_bad, (s_clean, s_q, s_bad)


def test_bounds_and_short_input(rng):
    x = _speechlike(rng)
    assert -0.5 <= pesq_nb(x, -x) <= 4.5
    with pytest.raises(ValueError, match="too short"):
        pesq_nb(x[:500], x[:500])
    with pytest.raises(ValueError, match="narrowband"):
        pesq_nb(x, x, sr=16000)


def test_mos_lqo_mapping_anchors():
    """The published P.862.1 logistic: known anchor values."""
    assert abs(mos_lqo(4.5) - 4.55) < 0.06
    assert abs(mos_lqo(1.0) - 1.15) < 0.15
    assert mos_lqo(-0.5) < 1.05


def test_metric_streaming_mean(rng):
    x = _speechlike(rng)
    m = PesqMetric()
    m.update(x[None], x[None])
    m.update(np.stack([x, x]), np.stack([x, x]))
    assert m.count == 3
    assert m.compute() > 4.49


def test_metric_16k_input_decimates(rng):
    """PesqMetric(sr=16000) must decimate to the 8 kHz model: identity still
    scores ~4.5, and the score tracks the 8 kHz metric on the same content
    (feeding 16 kHz samples straight into the 8 kHz model would silently
    halve every frame/band constant)."""
    from scipy.signal import resample_poly

    x8 = _speechlike(rng)
    y8 = x8 + 0.05 * rng.standard_normal(len(x8))
    x16 = resample_poly(x8, 2, 1)
    y16 = resample_poly(y8, 2, 1)

    m16 = PesqMetric(sr=16000)
    m16.update(x16[None], x16[None])
    assert m16.compute() > 4.45

    a, b = PesqMetric(sr=16000), PesqMetric(sr=8000)
    a.update(y16[None], x16[None])
    b.update(y8[None], x8[None])
    assert abs(a.compute() - b.compute()) < 0.25, (a.compute(), b.compute())

    with pytest.raises(ValueError, match=">= 8 kHz"):
        PesqMetric(sr=4000)


def test_metric_441k_resamples_and_empty_is_nan(rng):
    """Arbitrary integer rates >= 8 kHz go through a rational polyphase
    resample (44.1 kHz here); a metric that skipped every row reports nan,
    never a fake 0.0 score."""
    from scipy.signal import resample_poly

    x8 = _speechlike(rng)
    x441 = resample_poly(x8, 441, 80)
    m = PesqMetric(sr=44100)
    m.update(x441[None], x441[None])
    assert m.count == 1 and m.compute() > 4.4

    empty = PesqMetric()
    empty.update(np.zeros((1, 100)), np.zeros((1, 100)))  # < min length: skipped
    assert empty.count == 0 and np.isnan(empty.compute())


def test_identity_flat_envelope_content(rng):
    """Identity must score 4.5 on FLAT-ENVELOPE content too (pure noise,
    noise-modulated tones, steady tones). Regression: the per-utterance
    alignment's old hop-grid envelope crude stage decorrelated on flat
    envelopes (its frame grid sits max_lag % hop off the reference grid)
    and its ±1-hop fine window then locked an identical pair hundreds of
    samples off, scoring identity ~2.2."""
    t = np.arange(16000)
    for x in (
        rng.standard_normal(16000) * 0.1,
        np.sin(2 * np.pi * 300 * t / 8000)
        * np.clip(rng.standard_normal(16000), -1, 1) * 0.1,
        np.sin(2 * np.pi * 440 * t / 8000),
    ):
        s = pesq_nb(x, x)
        assert s > 4.49, s


def test_utterance_dependent_delay_recovered(rng):
    """Two utterances with DIFFERENT delays (the case one global lag cannot
    align — the spec handles it with utterance splitting): the per-utterance
    alignment stage recovers most of the score."""
    x = _speechlike(rng, n=48000)
    # delay only the second half by 15 ms (utterance-dependent delay)
    half = len(x) // 2
    d = x.copy()
    d[half:] = np.pad(x[half:], (120, 0))[: len(x) - half]
    aligned = pesq_nb(x, d)
    assert aligned > pesq_nb(x, x) - 0.6, aligned


def test_conformance_vs_itu_reference_when_available(rng):
    """AUTO-ACTIVATING conformance check (VERDICT r3 'do this' #5): when the
    ITU reference implementation (pip ``pesq``) or supplied vectors
    (``CSE_PESQ_VECTORS``: a dir of ref_*.wav/deg_*.wav pairs with an
    ``expected.csv`` of raw P.862 scores) are present, compare this
    implementation against them; otherwise skip — the zero-egress image
    ships neither. Tolerance is deliberately loose (mean |d| <= 0.35 MOS,
    max <= 0.6) because two internals remain analytic approximations of the
    spec's tables (see eval/pesq.py module docstring)."""
    import importlib.util
    import os

    deltas = []
    if importlib.util.find_spec("pesq") is not None:
        from pesq import pesq as itu_pesq

        x = _speechlike(rng, n=32000)
        noise = rng.standard_normal(len(x))
        noise /= np.sqrt(np.mean(noise**2))
        px = np.sqrt(np.mean(x**2))
        degs = [x + px * 10 ** (-s / 20) * noise for s in (30, 15, 5)]
        degs.append(np.round(x * 8) / 8)
        for d in degs:
            ours = pesq_nb(x, d)
            ref = itu_pesq(8000, x.astype(np.float32), d.astype(np.float32), "nb")
            # pip pesq returns MOS-LQO for nb; map ours through P.862.1
            deltas.append(abs(mos_lqo(ours) - ref))
    vec_dir = os.environ.get("CSE_PESQ_VECTORS")
    if vec_dir and os.path.isdir(vec_dir):
        import csv
        import wave

        def read_wav(p):
            with wave.open(p) as w:
                assert w.getframerate() == 8000
                raw = np.frombuffer(w.readframes(w.getnframes()), np.int16)
            return raw.astype(np.float64) / 32768.0

        with open(os.path.join(vec_dir, "expected.csv")) as f:
            for row in csv.DictReader(f):
                ref = read_wav(os.path.join(vec_dir, row["ref"]))
                deg = read_wav(os.path.join(vec_dir, row["deg"]))
                deltas.append(abs(pesq_nb(ref, deg) - float(row["pesq"])))
    if not deltas:
        pytest.skip("no ITU conformance assets (pip pesq / CSE_PESQ_VECTORS)")
    assert float(np.mean(deltas)) <= 0.35, deltas
    assert float(np.max(deltas)) <= 0.6, deltas
