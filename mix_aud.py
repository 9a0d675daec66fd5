"""Standalone SNR mixer: build premixed eval sets from mixture list files.

TPU-native equivalent of the reference ``mix_aud.py``: 2-spk mixing with
energy-preserving (a, b) weights and 3-spk mixing with raw per-noise gains,
peak-normalized to 0.9 (reference ``mix_aud.py:56-96`` / ``:3-53``). Reads the
released list format (``pathA pathB snr`` or ``pathA pathB pathC snr1 snr2``)
and writes ``mixed/ gt/ noise[/noise_1,noise_2]`` wav trees.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from cse_tpu.data.audio_io import peak_normalize_np, read_wav, write_wav


def mix_audio(signal, noise, snr, pad=False):
    """Reference 2-spk math (energy-preserving weights, peak-norm 0.9)."""
    if not pad and len(signal) > len(noise):
        noise = noise[np.arange(len(signal)) % len(noise)]
    if len(signal) < len(noise):
        noise = noise[: len(signal)]
    signal = signal.astype(np.float32)
    noise = noise.astype(np.float32)
    g = np.sqrt(10.0 ** (-snr / 10) * np.mean(signal**2) / np.mean(noise**2))
    a = np.sqrt(1 / (1 + g**2))
    b = np.sqrt(g**2 / (1 + g**2))
    if pad and len(signal) > len(noise):
        noise = np.concatenate([noise, np.zeros(len(signal) - len(noise))], 0)
    signal, noise = a * signal, b * noise
    mixed = signal + noise
    scale = 1 / np.max(np.abs(mixed)) * 0.9
    return mixed * scale, signal * scale, noise * scale


def mix_audio_3spk(signal, noise1, noise2, snr1, snr2, pad=False):
    """Reference 3-spk math (raw gains, peak-norm 0.9)."""
    max_len = max(len(signal), len(noise1), len(noise2))
    arrs = [signal.astype(np.float32), noise1.astype(np.float32), noise2.astype(np.float32)]
    if not pad:
        arrs = [x[np.arange(max_len) % len(x)] if max_len > len(x) else x for x in arrs]
    signal, noise1, noise2 = arrs
    se = np.mean(signal**2)
    g1 = np.sqrt(10.0 ** (-snr1 / 10) * se / np.mean(noise1**2))
    g2 = np.sqrt(10.0 ** (-snr2 / 10) * se / np.mean(noise2**2))
    if pad:
        signal, noise1, noise2 = (
            np.concatenate([x, np.zeros(max_len - len(x))], 0) if max_len > len(x) else x
            for x in (signal, noise1, noise2)
        )
    noise1, noise2 = g1 * noise1, g2 * noise2
    mixed = signal + noise1 + noise2
    scale = 1 / np.max(np.abs(mixed)) * 0.9
    return mixed * scale, signal * scale, noise1 * scale, noise2 * scale


def _resolve(path: str, wav_root: str) -> str:
    """Released lists carry root-relative entries like ``/32/0_1_d32.wav``
    (``data/DailyTalk/test_mix.txt``); prefix them with the corpus wav root."""
    if wav_root:
        return os.path.join(wav_root, path.lstrip("/"))
    return path


def mix_from_list(list_file: str, out: str, num_spk: int = 2, wav_root: str = "") -> int:
    """Build a premixed eval tree from a released mixture list file.

    2-spk lines: ``pathA pathB snr``; 3-spk: ``pathA pathB pathC snr1 snr2``
    (the formats shipped under the reference's ``data/*/{val,test}_mix*.txt``).
    Returns the number of mixtures written.
    """
    # 3-spk dir names follow the reference's gt->noise path substitution
    # (dataset_train_CSE.py:329-332: gt_3speaker -> noise_{1,2}_3speaker)
    subs = (
        ["mixed", "gt", "noise"]
        if num_spk == 2
        else ["mixed_3speaker", "gt_3speaker", "noise_1_3speaker", "noise_2_3speaker"]
    )
    for s in subs:
        os.makedirs(os.path.join(out, s), exist_ok=True)

    with open(list_file) as f:
        lines = [l.split() for l in f if l.strip()]
    for parts in lines:
        if num_spk == 2:
            pa, pb, snr = parts[0], parts[1], float(parts[2])
            a, sra = read_wav(_resolve(pa, wav_root))
            b, _ = read_wav(_resolve(pb, wav_root))
            a, b = peak_normalize_np(a), peak_normalize_np(b)
            mixed, gt, noise = mix_audio(a, b, snr, pad=True)
            name = (
                os.path.splitext(os.path.basename(pa))[0]
                + "-" + os.path.splitext(os.path.basename(pb))[0]
                + f"-{snr:.4f}"
            )
            write_wav(os.path.join(out, "mixed", name + ".wav"), mixed, sra)
            write_wav(os.path.join(out, "gt", name + ".wav"), gt, sra)
            write_wav(os.path.join(out, "noise", name + ".wav"), noise, sra)
        else:
            pa, pb, pc, snr1, snr2 = (
                parts[0], parts[1], parts[2], float(parts[3]), float(parts[4])
            )
            a, sra = read_wav(_resolve(pa, wav_root))
            b, _ = read_wav(_resolve(pb, wav_root))
            c, _ = read_wav(_resolve(pc, wav_root))
            a, b, c = (peak_normalize_np(x) for x in (a, b, c))
            mixed, gt, n1, n2 = mix_audio_3spk(a, b, c, snr1, snr2, pad=True)
            name = "-".join(
                os.path.splitext(os.path.basename(p))[0] for p in (pa, pb, pc)
            ) + f"-{snr1:.2f}-{snr2:.2f}"
            write_wav(os.path.join(out, "mixed_3speaker", name + ".wav"), mixed, sra)
            write_wav(os.path.join(out, "gt_3speaker", name + ".wav"), gt, sra)
            write_wav(os.path.join(out, "noise_1_3speaker", name + ".wav"), n1, sra)
            write_wav(os.path.join(out, "noise_2_3speaker", name + ".wav"), n2, sra)
    return len(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", required=True, help="mixture list file")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--num_spk", type=int, default=2, choices=[2, 3])
    ap.add_argument("--wav_root", default="",
                    help="corpus root prefixed to the list's relative paths")
    args = ap.parse_args()
    n = mix_from_list(args.list, args.out, args.num_spk, args.wav_root)
    print(f"wrote {n} mixtures to {args.out}")


if __name__ == "__main__":
    main()
