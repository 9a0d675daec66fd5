"""Shared helpers for the offline corpus preprocessing CLIs.

These tools reproduce the reference's offline pipeline outputs
(``preprocessing/*.py`` in the reference repo): per-utterance 16 kHz PCM_16
wavs named ``{turn}_{spk}_{dialog}.wav`` with sibling ``.txt`` files holding
the cumulative dialog history (one previous turn per line). ffmpeg does all
transcoding (it also decodes NIST .sph), parallelized over a thread pool —
the reference runs serially.
"""

from __future__ import annotations

import os
import subprocess
from concurrent.futures import ThreadPoolExecutor


def ffmpeg_available() -> bool:
    try:
        subprocess.run(["ffmpeg", "-version"], capture_output=True, timeout=10)
        return True
    except Exception:
        return False


def ffmpeg_extract(
    src: str, dst: str, start: float | None = None, duration: float | None = None,
    sr: int = 16000,
):
    """Extract/resample a (segment of a) file to 16 kHz mono PCM_16 WAV."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    cmd = ["ffmpeg", "-loglevel", "panic", "-nostdin", "-y"]
    if start is not None:
        cmd += ["-ss", f"{start:.6f}"]
    cmd += ["-i", src]
    if duration is not None:
        cmd += ["-t", f"{duration:.6f}"]
    cmd += ["-acodec", "pcm_s16le", "-ar", str(sr), "-ac", "1", dst]
    subprocess.run(cmd, check=True)


def run_parallel(jobs, workers: int = 8, desc: str = ""):
    """Run a list of zero-arg callables on a thread pool with progress."""
    done = 0
    with ThreadPoolExecutor(workers) as pool:
        for _ in pool.map(lambda f: f(), jobs):
            done += 1
            if done % 200 == 0:
                print(f"[{desc}] {done}/{len(jobs)}")
    print(f"[{desc}] {done}/{len(jobs)} done")


def write_cumulative_contexts(turn_texts: list[tuple[str, str]], out_dir: str):
    """Given ordered (utterance_basename, transcript) pairs of one dialog,
    write ``{basename}.txt`` holding all PREVIOUS turns, one per line."""
    os.makedirs(out_dir, exist_ok=True)
    history: list[str] = []
    for base, text in turn_texts:
        with open(os.path.join(out_dir, base + ".txt"), "w") as f:
            f.write("".join(h + "\n" for h in history))
        history.append(text)
