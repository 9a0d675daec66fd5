"""Unit tests for cse_tpu.ops: golden values vs numpy/scipy/torch references."""

import jax.numpy as jnp
import numpy as np
import pytest

from cse_tpu.ops import (
    add_noise_snr,
    circular_shift,
    mix_2spk,
    mix_3spk,
    overlap_add,
    peak_normalize,
    pit_si_snr_loss,
    resample,
    sdr,
    segment,
    segment_shapes,
    si_snr,
    speed_perturb,
)


class TestSegmentation:
    @pytest.mark.parametrize("L", [100, 250, 999, 2000, 123])
    @pytest.mark.parametrize("K", [250, 8])
    def test_roundtrip(self, rng, L, K):
        """overlap_add(segment(x)) == 2*x (each frame counted twice at hop K/2)."""
        x = rng.standard_normal((2, L, 4)).astype(np.float32)
        chunks, gap = segment(jnp.asarray(x), K)
        back = overlap_add(chunks, gap)
        np.testing.assert_allclose(np.asarray(back), 2.0 * x, rtol=1e-6, atol=1e-6)

    def test_shapes(self):
        gap, S = segment_shapes(999, 250)
        # reference formula: gap = K - (P + L % K) % K
        assert gap == 250 - (125 + 999 % 250) % 250
        x = jnp.zeros((1, 999, 3))
        chunks, g = segment(x, 250)
        assert g == gap and chunks.shape == (1, S, 250, 3)

    def test_window_placement(self, rng):
        """Chunk s must equal padded[s*P : s*P+K] (50% overlap framing)."""
        L, K = 777, 250
        P = K // 2
        x = rng.standard_normal((1, L, 2)).astype(np.float32)
        chunks, gap = segment(jnp.asarray(x), K)
        padded = np.pad(x, ((0, 0), (P, gap + P), (0, 0)))
        for s in range(chunks.shape[1]):
            np.testing.assert_allclose(
                np.asarray(chunks[0, s]), padded[0, s * P : s * P + K], atol=0
            )


class TestSiSnr:
    def test_perfect_and_scaled(self, rng):
        x = rng.standard_normal((3, 4000)).astype(np.float32)
        v = si_snr(jnp.asarray(x) * 3.7, jnp.asarray(x))
        assert np.all(np.asarray(v) > 70)  # scale-invariant: near-perfect

    def test_matches_manual(self, rng):
        pred = rng.standard_normal((4000,)).astype(np.float64)
        tgt = rng.standard_normal((4000,)).astype(np.float64)
        p, t = pred - pred.mean(), tgt - tgt.mean()
        proj = (p @ t) / (t @ t + 1e-8) * t
        expect = 10 * np.log10((proj @ proj) / ((p - proj) @ (p - proj) + 1e-8) + 1e-8)
        got = float(si_snr(jnp.asarray(pred, jnp.float32), jnp.asarray(tgt, jnp.float32)))
        assert abs(got - expect) < 1e-3

    def test_pit_picks_best_perm(self, rng):
        a = rng.standard_normal((1, 2000)).astype(np.float32)
        b = rng.standard_normal((1, 2000)).astype(np.float32)
        tgt = np.stack([a, b], axis=-1)  # [1, T, 2]
        est_swapped = np.stack([b, a], axis=-1)
        loss = pit_si_snr_loss(jnp.asarray(est_swapped), jnp.asarray(tgt))
        assert float(loss[0]) < -70  # perfect after permutation

    def test_pit_3spk(self, rng):
        srcs = rng.standard_normal((2, 1500, 3)).astype(np.float32)
        est = srcs[:, :, [2, 0, 1]] + 0.01 * rng.standard_normal((2, 1500, 3)).astype(
            np.float32
        )
        loss = pit_si_snr_loss(jnp.asarray(est), jnp.asarray(srcs))
        assert np.all(np.asarray(loss) < -25)


class TestSdr:
    def test_identity_high(self, rng):
        x = rng.standard_normal((2, 8000)).astype(np.float32)
        v = np.asarray(sdr(jnp.asarray(x), jnp.asarray(x)))
        assert np.all(v > 40)

    def test_filtered_target_recovered(self, rng):
        """SDR is invariant to short FIR filtering of the target."""
        t = rng.standard_normal((8000,)).astype(np.float32)
        h = rng.standard_normal((16,)).astype(np.float32) * 0.2
        pred = np.convolve(t, h)[:8000].astype(np.float32)
        v = float(sdr(jnp.asarray(pred)[None], jnp.asarray(t)[None])[0])
        noisy = pred + 0.5 * rng.standard_normal(8000).astype(np.float32)
        v2 = float(sdr(jnp.asarray(noisy)[None], jnp.asarray(t)[None])[0])
        assert v > 30 and v2 < 10

    def test_vs_torchmetrics_formula(self, rng):
        """Cross-check against an independent float64 numpy implementation."""
        from cse_tpu.eval.metrics import sdr_numpy

        pred = rng.standard_normal((4000,)) + 0.3
        tgt = 0.8 * pred + 0.2 * rng.standard_normal((4000,))
        ours = float(sdr(jnp.asarray(pred, jnp.float32)[None], jnp.asarray(tgt, jnp.float32)[None])[0])
        ref = sdr_numpy(pred[None], tgt[None])[0]
        assert abs(ours - ref) < 0.1


class TestMixing:
    def test_peak_normalize(self, rng):
        x = rng.standard_normal((3, 100)).astype(np.float32)
        y = np.asarray(peak_normalize(jnp.asarray(x)))
        np.testing.assert_allclose(np.abs(y).max(axis=-1), 0.9, rtol=1e-5)

    def _ref_mix2(self, signal, noise, snr):
        """Reference math from dataset_train_CSE.mix_audio (pad=True path)."""
        if len(signal) < len(noise):
            noise = noise[: len(signal)]
        se = np.mean(signal**2)
        ne = np.mean(noise**2)
        g = np.sqrt(10.0 ** (-snr / 10) * se / ne)
        a = np.sqrt(1 / (1 + g**2))
        b = np.sqrt(g**2 / (1 + g**2))
        if len(signal) > len(noise):
            noise = np.concatenate([noise, np.zeros(len(signal) - len(noise))], 0)
        signal, noise = a * signal, b * noise
        mixed = signal + noise
        scale = 1 / np.max(np.abs(mixed)) * 0.9
        return mixed * scale, signal * scale, noise * scale

    @pytest.mark.parametrize("ls,ln", [(4000, 4000), (4000, 2500), (2500, 4000)])
    def test_mix2_matches_reference_math(self, rng, ls, ln):
        T = 4096
        sig = np.zeros((1, T), np.float32)
        noi = np.zeros((1, T), np.float32)
        s = rng.standard_normal(ls).astype(np.float32)
        n = rng.standard_normal(ln).astype(np.float32)
        sig[0, :ls] = s
        noi[0, :ln] = n
        snr = 3.3
        mixed, sgt, nss, mlen = mix_2spk(
            jnp.asarray(sig), jnp.asarray(noi), jnp.asarray([snr]),
            jnp.asarray([ls]), jnp.asarray([ln]),
        )
        rm, rs, rn = self._ref_mix2(s.astype(np.float64), n.astype(np.float64), snr)
        assert int(mlen[0]) == ls
        np.testing.assert_allclose(np.asarray(mixed)[0, :ls], rm, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sgt)[0, :ls], rs, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(nss)[0, :ls], rn, rtol=1e-4, atol=1e-5)

    def test_mix3_snr_and_peak(self, rng):
        T = 4000
        s = rng.standard_normal((1, T)).astype(np.float32)
        n1 = rng.standard_normal((1, T)).astype(np.float32)
        n2 = rng.standard_normal((1, T)).astype(np.float32)
        lens = jnp.asarray([T])
        mixed, sg, g1n, g2n, ml = mix_3spk(
            jnp.asarray(s), jnp.asarray(n1), jnp.asarray(n2),
            jnp.asarray([2.0]), jnp.asarray([-1.0]), lens, lens, lens,
        )
        np.testing.assert_allclose(np.abs(np.asarray(mixed)).max(), 0.9, rtol=1e-5)
        # achieved SNRs must match the requested ones
        snr1 = 10 * np.log10(np.sum(np.asarray(sg) ** 2) / np.sum(np.asarray(g1n) ** 2))
        snr2 = 10 * np.log10(np.sum(np.asarray(sg) ** 2) / np.sum(np.asarray(g2n) ** 2))
        assert abs(snr1 - 2.0) < 1e-3 and abs(snr2 + 1.0) < 1e-3

    def test_add_noise_snr(self, rng):
        x = rng.standard_normal((2, 3000)).astype(np.float32)
        n = rng.standard_normal((2, 3000)).astype(np.float32)
        out = np.asarray(add_noise_snr(jnp.asarray(x), jnp.asarray(n), jnp.asarray([5.0, 0.0])))
        added = out - x
        achieved = 10 * np.log10((x**2).sum(-1) / (added**2).sum(-1))
        np.testing.assert_allclose(achieved, [5.0, 0.0], atol=1e-3)

    def test_circular_shift_respects_length(self):
        x = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 0.0, 0.0]])
        y = np.asarray(circular_shift(x, jnp.asarray([1]), jnp.asarray([4])))
        np.testing.assert_allclose(y[0], [4.0, 1.0, 2.0, 3.0, 0.0, 0.0])
        y2 = np.asarray(circular_shift(x, jnp.asarray([-1]), jnp.asarray([4])))
        np.testing.assert_allclose(y2[0], [2.0, 3.0, 4.0, 1.0, 0.0, 0.0])


class TestResample:
    def test_downsample_sine_preserved(self):
        sr, T = 16000, 16000
        t = np.arange(T) / sr
        x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None]
        y, nl = resample(jnp.asarray(x), 16000, 8000, lengths=jnp.asarray([T]))
        assert y.shape[-1] == 8000 and int(nl[0]) == 8000
        t8 = np.arange(8000) / 8000
        expect = np.sin(2 * np.pi * 440.0 * t8)
        err = np.abs(np.asarray(y)[0, 100:-100] - expect[100:-100]).max()
        assert err < 0.02

    def test_matches_scipy_resample_poly_energy(self, rng):
        """Statistical agreement with scipy's polyphase resampler."""
        from scipy.signal import resample_poly

        x = rng.standard_normal(16000).astype(np.float32)
        # band-limit so both filters are near-transparent
        from scipy.signal import butter, sosfilt

        sos = butter(8, 0.2, output="sos")
        x = sosfilt(sos, x).astype(np.float32)
        y, _ = resample(jnp.asarray(x)[None], 16000, 8000, lowpass_filter_width=64,
                        window="kaiser")
        ref = resample_poly(x.astype(np.float64), 1, 2)
        ours = np.asarray(y)[0]
        corr = np.corrcoef(ours[200:-200], ref[200:-200])[0, 1]
        assert corr > 0.999

    def test_upsample_length(self, rng):
        x = rng.standard_normal((2, 8000)).astype(np.float32)
        y, nl = resample(jnp.asarray(x), 8000, 16000, lengths=jnp.asarray([8000, 4000]))
        assert y.shape[-1] == 16000
        assert int(nl[0]) == 16000 and int(nl[1]) == 8000

    def test_speed_perturb_lengths(self, rng):
        T = 16000
        x = rng.standard_normal((3, T)).astype(np.float32)
        lens = jnp.asarray([T, 12000, 8000])
        y, nl = speed_perturb(jnp.asarray(x), lens, jnp.asarray([0, 1, 2]))
        assert y.shape[-1] == int(np.ceil(T / 0.9))
        # factor 0.9 lengthens, 1.0 identity, 1.1 shortens
        assert int(nl[0]) == int(np.ceil(T / 0.9))
        assert int(nl[1]) == 12000
        assert int(nl[2]) == int(np.ceil(8000 * 10 / 11))

    def test_speed_identity_branch(self, rng):
        x = rng.standard_normal((1, 4000)).astype(np.float32)
        y, nl = speed_perturb(jnp.asarray(x), jnp.asarray([4000]), jnp.asarray([1]))
        np.testing.assert_allclose(np.asarray(y)[0, :4000], x[0], atol=1e-6)

    def test_matches_torchaudio_kernel_against_torch_conv(self, rng):
        """Apply the same kernel with torch's conv1d and compare end-to-end."""
        import torch

        from cse_tpu.ops.resample import resample_poly_filter

        kernel, width, orig_r, new_r = resample_poly_filter(14400, 16000)
        x = rng.standard_normal(10000).astype(np.float32)
        xt = torch.nn.functional.pad(torch.tensor(x)[None], (width, width + orig_r))
        ref = torch.nn.functional.conv1d(
            xt[:, None], torch.tensor(np.asarray(kernel)), stride=orig_r
        )
        ref = ref.transpose(1, 2).reshape(1, -1)[:, : int(np.ceil(10000 * new_r / orig_r))]
        ours, _ = resample(jnp.asarray(x)[None], 14400, 16000)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


class TestBuckets:
    def test_aligned_bucket(self):
        from cse_tpu.ops.buckets import aligned_bucket, inter_len

        a = aligned_bucket(128000)
        assert a == 125000 and inter_len(a) == 127
        # already aligned or nothing better within 10%: unchanged
        assert aligned_bucket(125000) == 125000
        assert aligned_bucket(64000) == 64000
        # hcontext (2 ctx tokens) at the same bucket hits 128 exactly
        assert inter_len(125000, ctx=2) == 128


def test_sdr_numpy_silent_target_no_crash():
    """Silent gt rows must not abort the eval (regularized Toeplitz solve)."""
    from cse_tpu.eval.metrics import sdr_numpy

    rng = np.random.default_rng(0)
    pred = rng.standard_normal((2, 4000))
    target = np.stack([np.zeros(4000), rng.standard_normal(4000)])
    out = sdr_numpy(pred, target)
    assert out.shape == (2,) and np.isfinite(out[1])


def test_mean_metric_empty_is_nan():
    from cse_tpu.eval.metrics import MeanMetric

    m = MeanMetric()
    assert np.isnan(m.compute())
    m.update(np.asarray([1.0, 3.0]))
    assert m.compute() == 2.0


def test_si_snr_analytic_orthogonal_decomposition():
    """Independent oracle: for pred = a*t + b*n with zero-mean t ⊥ n,
    SI-SNR = 10 log10(a²‖t‖² / b²‖n‖²) by construction — no shared code with
    the implementations under test."""
    from cse_tpu.eval.metrics import si_snr_numpy
    from cse_tpu.ops.losses import si_snr as si_snr_jnp

    rng = np.random.default_rng(3)
    t = rng.standard_normal(4096)
    t -= t.mean()
    n = rng.standard_normal(4096)
    n -= n.mean()
    n -= (n @ t) / (t @ t) * t  # orthogonalize
    a, b = 1.7, 0.31
    pred = a * t + b * n
    want = 10 * np.log10((a**2 * (t @ t)) / (b**2 * (n @ n)))
    got_np = float(si_snr_numpy(pred[None], t[None])[0])
    got_jx = float(si_snr_jnp(jnp.asarray(pred[None]), jnp.asarray(t[None]))[0])
    assert abs(got_np - want) < 1e-6, (got_np, want)
    assert abs(got_jx - want) < 1e-3, (got_jx, want)


def test_sdr_against_lstsq_oracle():
    """Independent oracle for the filter-based SDR: explicitly build the
    [T, L] convolution design matrix of target shifts, least-squares fit the
    distortion filter, and compute 10log10(‖proj‖²/‖residual‖²) — the
    torchmetrics definition from first principles, sharing nothing with the
    FFT/Toeplitz implementations under test."""
    from cse_tpu.eval.metrics import sdr_numpy
    from cse_tpu.ops.losses import sdr as sdr_jnp

    rng = np.random.default_rng(5)
    T, L = 1500, 512
    t = rng.standard_normal(T)
    # pred: filtered target + noise, so the fit is nontrivial
    pred = np.convolve(t, [0.8, 0.15, -0.1], mode="full")[:T]
    pred += 0.05 * rng.standard_normal(T)

    tn = t / np.linalg.norm(t)
    pn = pred / np.linalg.norm(pred)
    # full linear-convolution design matrix (rows cover the filter tail too):
    # its exact normal equations are the Toeplitz autocorrelation system the
    # torchmetrics definition prescribes
    A = np.zeros((T + L - 1, L))
    for k in range(L):
        A[k : k + T, k] = tn
    pp = np.pad(pn, (0, L - 1))
    h, *_ = np.linalg.lstsq(A, pp, rcond=None)
    resid = pp - A @ h
    want = 10 * np.log10((pp @ pp - resid @ resid) / (resid @ resid))

    got_np = float(sdr_numpy(pred[None], t[None])[0])
    got_jx = float(sdr_jnp(jnp.asarray(pred[None]), jnp.asarray(t[None]))[0])
    assert abs(got_np - want) < 1e-3, (got_np, want)
    assert abs(got_jx - want) < 0.05, (got_jx, want)


def test_mix3_distinct_lengths_masked_energy():
    """3-spk gains must use each source's OWN valid length: with zero-padded
    tails of different lengths, the achieved in-band SNRs still match the
    requested ones (guards _masked_energy index mixups invisible at equal
    lengths)."""
    from cse_tpu.ops.mixing import mix_3spk

    rng = np.random.default_rng(11)
    T = 4000
    lens = np.asarray([3000, 2200, 1400], np.int32)
    sigs = np.zeros((3, 1, T), np.float32)
    for i, ln in enumerate(lens):
        sigs[i, 0, :ln] = rng.standard_normal(ln)
    snr1, snr2 = jnp.asarray([4.0]), jnp.asarray([-3.0])
    mixed, gt, s1, s2, mlen = mix_3spk(
        jnp.asarray(sigs[0]), jnp.asarray(sigs[1]), jnp.asarray(sigs[2]),
        snr1, snr2,
        jnp.asarray(lens[:1]), jnp.asarray(lens[1:2]), jnp.asarray(lens[2:]),
    )
    scale = np.abs(np.asarray(mixed)).max()  # peak-norm applied uniformly

    def e(x, ln):
        x = np.asarray(x)[0, :ln]
        return (x**2).mean()

    got1 = 10 * np.log10(e(gt, lens[0]) / e(s1, lens[1]))
    got2 = 10 * np.log10(e(gt, lens[0]) / e(s2, lens[2]))
    assert abs(got1 - 4.0) < 0.2, got1
    assert abs(got2 - (-3.0)) < 0.2, got2


def test_kaiser_resample_absolute_amplitude():
    """The kaiser-window branch must preserve absolute gain (the hann branch
    has a sine-amplitude check; correlation-only checks are scale-blind)."""
    from cse_tpu.ops.resample import resample

    t = np.arange(16000) / 16000.0
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    y, _ = resample(jnp.asarray(x[None]), 16000, 8000,
                    lowpass_filter_width=64, rolloff=0.9475937167399596,
                    window="kaiser")
    y = np.asarray(y)[0]
    mid = y[800:-800]  # skip filter edges
    amp = np.abs(mid).max()
    assert abs(amp - 0.5) < 0.01, amp
    # and it is still the same 440 Hz tone
    t8 = np.arange(len(y)) / 8000.0
    ref = 0.5 * np.sin(2 * np.pi * 440.0 * t8)
    corr = np.corrcoef(mid, ref[800 : 800 + len(mid)])[0, 1]
    assert corr > 0.999, corr
