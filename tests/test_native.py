"""Native C++ audio runtime: build, decode parity vs Python, batch loader."""

import numpy as np
import pytest

from cse_tpu.data.audio_io import _read_wav_py, write_wav
from cse_tpu.native import audio_native


@pytest.fixture(scope="module")
def built():
    if not audio_native.available():
        pytest.skip("native toolchain unavailable")
    return True


def _make_wavs(tmp_path, rng, n=4, sr=16000):
    paths = []
    for i in range(n):
        x = rng.uniform(-0.8, 0.8, 4000 + i * 500).astype(np.float32)
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, x, sr)
        paths.append(p)
    return paths


def test_native_read_matches_python(built, tmp_path, rng):
    paths = _make_wavs(tmp_path, rng, n=2)
    for p in paths:
        nx, nsr = audio_native.read_wav(p)
        px, psr = _read_wav_py(p)
        assert nsr == psr
        np.testing.assert_allclose(nx, px, atol=1e-7)


def test_native_write_read_roundtrip(built, tmp_path, rng):
    x = rng.uniform(-0.9, 0.9, 5000).astype(np.float32)
    p = str(tmp_path / "rt.wav")
    assert audio_native.write_wav(p, x, 8000)
    y, sr = _read_wav_py(p)
    assert sr == 8000
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_batch_load(built, tmp_path, rng):
    paths = _make_wavs(tmp_path, rng, n=6)
    buf = np.zeros((6, 4500), np.float32)
    lens, srs = audio_native.batch_load(paths, buf, peak_target=0.9, n_threads=3)
    assert (srs == 16000).all()
    expect = [min(4000 + i * 500, 4500) for i in range(6)]
    assert lens.tolist() == expect
    # peak-normalized rows
    for i in range(6):
        assert abs(np.abs(buf[i, : lens[i]]).max() - 0.9) < 1e-3
    # zero padding beyond length
    assert np.all(buf[0, lens[0]:] == 0)


def test_batch_load_missing_file(built, tmp_path, rng):
    paths = _make_wavs(tmp_path, rng, n=1) + [str(tmp_path / "nope.wav")]
    buf = np.zeros((2, 4000), np.float32)
    lens, srs = audio_native.batch_load(paths, buf)
    assert lens[0] > 0 and lens[1] == 0


def test_batch_load_rows_scatter(built, tmp_path, rng):
    """The scatter form decodes each file into its own destination row view —
    one call filling rows of SEVERAL arrays must match the contiguous form
    file-for-file (lengths, samples, failure zeroing)."""
    paths = _make_wavs(tmp_path, rng, n=4) + [str(tmp_path / "nope.wav")]
    a = np.zeros((3, 6000), np.float32)  # rows 0,2,4 land here
    b = np.zeros((2, 6000), np.float32)  # rows 1,3 land here
    views = [a[0], b[0], a[1], b[1], a[2]]
    lens, srs = audio_native.batch_load_rows(paths, views, peak_target=0.9,
                                             zero_tail=False)
    ref = np.zeros((5, 6000), np.float32)
    rlens, rsrs = audio_native.batch_load(paths, ref, peak_target=0.9)
    assert (lens == rlens).all() and (srs == rsrs).all()
    for i, v in enumerate(views):
        np.testing.assert_array_equal(v, ref[i], err_msg=f"row {i}")
    assert lens[4] == 0 and np.all(a[2] == 0)  # failed row fully zeroed


def test_batch_load_zero_tail_contract(built, tmp_path, rng):
    """zero_tail=True scrubs past each decoded length even in a dirty buffer;
    zero_tail=False leaves the tail untouched (only valid for fresh np.zeros
    destinations) but failed rows are ALWAYS fully zeroed; decoded samples
    are identical either way."""
    paths = _make_wavs(tmp_path, rng, n=2) + [str(tmp_path / "nope.wav")]
    dirty = np.full((3, 5000), 7.0, np.float32)
    lens, _ = audio_native.batch_load(paths, dirty.copy(), zero_tail=True)
    scrubbed = dirty.copy()
    lens2, _ = audio_native.batch_load(paths, scrubbed, zero_tail=True)
    assert (lens == lens2).all()
    for i in range(2):
        assert np.all(scrubbed[i, lens[i]:] == 0)
    assert np.all(scrubbed[2] == 0)  # failed row fully zeroed

    left = dirty.copy()
    lens3, _ = audio_native.batch_load(paths, left, zero_tail=False)
    assert (lens3 == lens).all()
    for i in range(2):
        np.testing.assert_array_equal(left[i, : lens[i]], scrubbed[i, : lens[i]])
        assert np.all(left[i, lens[i]:] == 7.0)  # tail untouched
    assert np.all(left[2] == 0)  # failed row still fully zeroed


def test_wav_info_data_chunk_before_fmt(built, tmp_path):
    """A legal WAV with the data chunk ahead of fmt must still probe: the
    scanner restores the stream position after measuring the data extent
    (ADVICE r2: the old EOF-measuring fseek broke the trailing fmt scan)."""
    import struct

    sr, n = 8000, 1234
    pcm = (np.zeros(n)).astype("<i2").tobytes()
    data = b"data" + struct.pack("<I", len(pcm)) + pcm
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
    body = data + fmt
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    p = str(tmp_path / "data_first.wav")
    with open(p, "wb") as f:
        f.write(blob)
    import ctypes

    lib = audio_native._load()
    got_sr = ctypes.c_int32(0)
    frames = lib.cse_wav_info(p.encode(), ctypes.byref(got_sr))
    assert got_sr.value == sr
    assert frames == n
    # and the full decode agrees
    x, rsr = audio_native.read_wav(p)
    assert rsr == sr and len(x) == n
