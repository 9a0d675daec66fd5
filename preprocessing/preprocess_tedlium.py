"""TEDLIUM-3 preprocessing: espnet-recipe segmentation + speaker-adapt split.

Equivalent of the reference ``Preprocessing_TEDLIUM.py``: cuts each talk's
.sph recording into per-utterance 16 kHz wavs using the espnet ``segments``
files, attaches the ``text`` transcripts, restricts train to the
``speaker-adaptation/train.lst`` talks, and writes cumulative-history txts
(talks are monologues: history = all previous segments of the same talk).

Usage:
  python preprocessing/preprocess_tedlium.py \\
      --tedlium dir_to/TEDLIUM_release-3 --target dir_to/TEDLIUM_processed \\
      --segments_root data/TEDLIUM
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from preprocessing.common import ffmpeg_extract, run_parallel, write_cumulative_contexts


def load_recipe(segments_root: str, mode: str):
    seg_f = os.path.join(segments_root, f"{mode}.orig", "segments")
    txt_f = os.path.join(segments_root, f"{mode}.orig", "text")
    segs: dict[str, list[tuple[str, float, float]]] = {}
    with open(seg_f) as f:
        for line in f:
            tgt, src, st, en = line.split()
            segs.setdefault(src, []).append((tgt, float(st), float(en)))
    texts: dict[str, str] = {}
    with open(txt_f) as f:
        for line in f:
            tgt, *words = line.split()
            texts[tgt] = " ".join(words)
    return segs, texts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tedlium", required=True, help="TEDLIUM_release-3 root")
    ap.add_argument("--target", required=True, help="output root")
    ap.add_argument("--segments_root", default="data/TEDLIUM",
                    help="espnet-style segments/text lists")
    ap.add_argument("--modes", nargs="+", default=["train", "dev", "test"])
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    # talks allowed in train (speaker-adaptation split)
    train_lst = os.path.join(args.tedlium, "speaker-adaptation", "train.lst")
    train_talks = None
    if os.path.exists(train_lst):
        with open(train_lst) as f:
            train_talks = {l.strip() for l in f if l.strip()}

    for mode in args.modes:
        segs, texts = load_recipe(args.segments_root, mode)
        jobs = []
        for talk, entries in segs.items():
            if mode == "train" and train_talks is not None and talk not in train_talks:
                continue
            sph = os.path.join(args.tedlium, "legacy", mode, "sph", talk + ".sph")
            out_dir = os.path.join(args.target, mode, talk)
            for tgt, st, en in entries:
                dst = os.path.join(out_dir, tgt + ".wav")
                jobs.append(
                    lambda s=sph, d=dst, a=st, b=en: ffmpeg_extract(s, d, a, b - a)
                )
        run_parallel(jobs, args.workers, f"segment:{mode}")
        for talk, entries in segs.items():
            out_dir = os.path.join(args.target, mode, talk)
            if not os.path.isdir(out_dir):
                continue
            turns = [(tgt, texts.get(tgt, "")) for tgt, _, _ in sorted(entries)]
            write_cumulative_contexts(turns, out_dir)
        print(f"[{mode}] {len(segs)} talks")


if __name__ == "__main__":
    main()
