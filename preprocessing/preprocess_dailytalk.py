"""DailyTalk preprocessing: resample to 16 kHz + cumulative-context txts.

Equivalent of the reference ``Preprocessing_DailyTalk.py``: DailyTalk ships
per-utterance wavs named ``{turn}_{spk}_d{dialog}.wav`` with sibling
transcript txts; this resamples every training-dialog utterance to 16 kHz
PCM_16 under ``{target}/train/{dialog}/`` and writes the dialog-history txt
for each utterance (all previous turns, one per line).

Usage:
  python preprocessing/preprocess_dailytalk.py \\
      --dailytalk dir_to/DailyTalk/data --target dir_to/DailyTalk_processed_16k \\
      --dialog_list data/DailyTalk/train_dialog.txt
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from preprocessing.common import ffmpeg_extract, run_parallel, write_cumulative_contexts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dailytalk", required=True, help="DailyTalk data dir")
    ap.add_argument("--target", required=True, help="output root")
    ap.add_argument("--dialog_list", default="data/DailyTalk/train_dialog.txt")
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    with open(args.dialog_list) as f:
        dialogs = [l.strip() for l in f if l.strip()]

    jobs = []
    for dialog in dialogs:
        files = sorted(
            glob.glob(os.path.join(args.dailytalk, dialog, "*.wav")),
            key=lambda x: int(os.path.basename(x).split("_")[0]),
        )
        for src in files:
            dst = os.path.join(args.target, "train", dialog, os.path.basename(src))
            jobs.append(lambda s=src, d=dst: ffmpeg_extract(s, d))
    run_parallel(jobs, args.workers, "resample")

    for dialog in dialogs:
        txts = sorted(
            glob.glob(os.path.join(args.dailytalk, dialog, "*.txt")),
            key=lambda x: int(os.path.basename(x).split("_")[0]),
        )
        turns = []
        for t in txts:
            with open(t) as f:
                text = f.read().strip()
            turns.append((os.path.splitext(os.path.basename(t))[0], text))
        write_cumulative_contexts(turns, os.path.join(args.target, "train", dialog))
    print(f"wrote contexts for {len(dialogs)} dialogs")


if __name__ == "__main__":
    main()
