"""The reference's SHIPPED mixture lists drive our mixer + eval loader
end-to-end (VERDICT next-round #9): real lines from
``/root/reference/data/*/{val,test}_mix*.txt`` (2-spk ``pathA pathB snr``
and 3-spk 5-field formats), synthetic wavs at the listed paths, mix_aud ->
premixed tree -> build_eval_list -> EvalLoader batch.
"""

import os

import numpy as np
import pytest

from cse_tpu.data import datasets as ds
from cse_tpu.data.audio_io import read_wav, write_wav
from cse_tpu.data.pipeline import EvalLoader, PipelineConfig
from cse_tpu.data.tokenizer import ByteTokenizer
from mix_aud import mix_from_list

REF_DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data lists not present"
)


def _read_list_head(path, n=3):
    with open(path) as f:
        return [line.split() for line in f if line.strip()][:n]


def _synth_wavs(root, rel_paths, rng, seconds=1.0, sr=16000):
    for rel in rel_paths:
        p = os.path.join(root, rel.lstrip("/"))
        os.makedirs(os.path.dirname(p), exist_ok=True)
        if not os.path.exists(p):
            t = np.arange(int(seconds * sr)) / sr
            f0 = float(rng.uniform(80, 400))
            x = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(len(t))
            write_wav(p, x.astype(np.float32), sr)


def _write_contexts(mixed_dir, turns=6):
    """Premixed eval sets ship a dialog .txt per mixed wav; synthesize one
    (>=5 turns so the DailyTalk test-mode filter keeps it)."""
    for f in os.listdir(mixed_dir):
        if f.endswith(".wav"):
            with open(os.path.join(mixed_dir, f[:-4] + ".txt"), "w") as fh:
                fh.write("\n".join(f"hello turn {i}" for i in range(turns)))


def test_released_2spk_list_to_eval(tmp_path, rng):
    """DailyTalk test_mix.txt lines -> mix_aud -> EvalLoader."""
    lines = _read_list_head(os.path.join(REF_DATA, "DailyTalk", "test_mix.txt"))
    assert all(len(p) == 3 for p in lines), "released 2-spk format is 3 fields"
    wav_root = str(tmp_path / "wavs")
    _synth_wavs(wav_root, [p for l in lines for p in l[:2]], rng)
    lf = str(tmp_path / "list.txt")
    with open(lf, "w") as f:
        f.writelines(" ".join(l) + "\n" for l in lines)

    out = str(tmp_path / "corpus" / "test")
    n = mix_from_list(lf, out, num_spk=2, wav_root=wav_root)
    assert n == len(lines)

    # mixture linearity: mixed == gt + noise (post peak-norm scaling)
    mixed_dir = os.path.join(out, "mixed")
    name = sorted(os.listdir(mixed_dir))[0]
    m, _ = read_wav(os.path.join(mixed_dir, name))
    g, _ = read_wav(os.path.join(out, "gt", name))
    z, _ = read_wav(os.path.join(out, "noise", name))
    np.testing.assert_allclose(m, g + z, atol=2e-4)
    assert abs(np.abs(m).max() - 0.9) < 1e-2  # peak-norm to 0.9

    _write_contexts(mixed_dir)
    paths = ds.CorpusPaths(dailytalk=str(tmp_path / "corpus"))
    mix_paths, gt_paths = ds.build_eval_list(paths, "dailytalk", "test", 2)
    assert len(mix_paths) == len(lines)
    loader = EvalLoader(
        paths, "dailytalk", "test",
        PipelineConfig(max_sp_len=2, max_ctx_tokens=64),
        ByteTokenizer(), batch_size=len(lines), num_workers=2,
    )
    batch = next(iter(loader.batches()))
    loader.close()
    assert batch["mixed"].shape[0] == len(lines)
    assert batch["noises"].shape[-1] == 1
    assert np.isfinite(np.asarray(batch["mixed"])).all()
    # context assembled with the Speaker-prefix + '/n'-join semantics
    assert batch["contexts"][0].count("Speaker") >= 5


def test_released_3spk_list_to_eval(tmp_path, rng):
    """TEDLIUM test_mix_3speaker.txt (5-field) -> mix_aud -> EvalLoader."""
    lines = _read_list_head(
        os.path.join(REF_DATA, "TEDLIUM", "test_mix_3speaker.txt")
    )
    assert all(len(p) == 5 for p in lines), "released 3-spk format is 5 fields"
    wav_root = str(tmp_path / "wavs")
    _synth_wavs(wav_root, [p for l in lines for p in l[:3]], rng)
    lf = str(tmp_path / "list.txt")
    with open(lf, "w") as f:
        f.writelines(" ".join(l) + "\n" for l in lines)

    out = str(tmp_path / "corpus" / "test")
    n = mix_from_list(lf, out, num_spk=3, wav_root=wav_root)
    assert n == len(lines)
    mixed_dir = os.path.join(out, "mixed_3speaker")
    name = sorted(os.listdir(mixed_dir))[0]
    m, _ = read_wav(os.path.join(mixed_dir, name))
    g, _ = read_wav(os.path.join(out, "gt_3speaker", name))
    # noise dirs named per the reference's gt->noise_{1,2} path substitution
    n1, _ = read_wav(os.path.join(out, "noise_1_3speaker", name))
    n2, _ = read_wav(os.path.join(out, "noise_2_3speaker", name))
    np.testing.assert_allclose(m, g + n1 + n2, atol=2e-4)

    _write_contexts(mixed_dir, turns=11)  # TEDLIUM test filter: >=10 lines
    paths = ds.CorpusPaths(tedlium=str(tmp_path / "corpus"))
    mix_paths, _ = ds.build_eval_list(paths, "tedlium", "test", 3)
    assert len(mix_paths) == len(lines)
    loader = EvalLoader(
        paths, "tedlium", "test",
        PipelineConfig(max_sp_len=2, num_max_mix=3, max_ctx_tokens=64),
        ByteTokenizer(), batch_size=len(lines), num_test_mix=3, num_workers=2,
    )
    batch = next(iter(loader.batches()))
    loader.close()
    assert batch["noises"].shape[-1] == 2
    assert np.isfinite(np.asarray(batch["gt"])).all()


def test_all_released_lists_parse():
    """Every shipped list file parses into its documented field layout."""
    specs = [
        ("DailyTalk/test_mix.txt", 3), ("DailyTalk/val_mix.txt", 3),
        ("SpokenWoz/test_mix.txt", 3), ("SpokenWoz/val_mix.txt", 3),
        ("TEDLIUM/test_mix.txt", 3), ("TEDLIUM/val_mix.txt", 3),
        ("TEDLIUM/test_mix_3speaker.txt", 5), ("TEDLIUM/val_mix_3speaker.txt", 5),
    ]
    for rel, nf in specs:
        p = os.path.join(REF_DATA, rel)
        if not os.path.exists(p):
            continue
        for parts in _read_list_head(p, n=50):
            assert len(parts) == nf, (rel, parts)
            for snr in parts[nf - (1 if nf == 3 else 2):]:
                float(snr)
            for w in parts[: nf - (1 if nf == 3 else 2)]:
                assert w.endswith(".wav"), (rel, w)
