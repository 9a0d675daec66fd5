"""SpokenWoz preprocessing: word-timestamp segmentation + train split + contexts.

Equivalent of the reference ``Preprocessing_SpokenWoz.py``: cuts each dialog
wav into per-turn utterances using the word-level Begin/End times in
``data.json`` (ffmpeg), names them ``{turn}_{0|1}_{dialog}.wav``
(user=0/system=1), keeps non-val dialogs as the train split, and writes
cumulative-history txts.

Usage:
  python preprocessing/preprocess_spokenwoz.py \\
      --source dir_to/SpokenWoz --target dir_to/SpokenWoz_processed_16k
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from preprocessing.common import ffmpeg_extract, run_parallel, write_cumulative_contexts

TAGS = {"user": "0", "system": "1"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="SpokenWoz root")
    ap.add_argument("--target", required=True, help="output root")
    ap.add_argument("--modes", nargs="+", default=["train_dev", "test"])
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--blacklist", default=None,
                    help="optional file of broken dialog ids to skip")
    args = ap.parse_args()

    skip = set()
    if args.blacklist and os.path.exists(args.blacklist):
        with open(args.blacklist) as f:
            skip = {l.strip() for l in f if l.strip()}

    # val dialogs come from the released valListFile
    val_list = os.path.join(args.source, "text_5700_train_dev", "valListFile.json")
    val_dialogs = set()
    if os.path.exists(val_list):
        with open(val_list) as f:
            val_dialogs = {l.strip() for l in f if l.strip()}

    for mode in args.modes:
        with open(os.path.join(args.source, f"text_5700_{mode}", "data.json")) as f:
            data = json.load(f)
        jobs = []
        contexts: dict[str, list[tuple[str, str]]] = {}
        for dialog_id, entry in data.items():
            if dialog_id in skip:
                continue
            if mode == "train_dev":
                split = "val" if dialog_id in val_dialogs else "train"
            else:
                split = "test"
            src = os.path.join(args.source, f"audio_5700_{mode}", f"{dialog_id}.wav")
            turns = []
            for turn, log in enumerate(entry["log"]):
                words = log.get("words") or []
                if not words:
                    continue
                start = words[0]["BeginTime"] / 1000.0
                dur = (words[-1]["EndTime"] - words[0]["BeginTime"]) / 1000.0
                base = f"{turn}_{TAGS[log['tag']]}_{dialog_id}"
                dst = os.path.join(args.target, split, dialog_id, base + ".wav")
                jobs.append(lambda s=src, d=dst, st=start, du=dur: ffmpeg_extract(s, d, st, du))
                turns.append((base, log["text"].strip()))
            contexts[(split, dialog_id)] = turns
        run_parallel(jobs, args.workers, f"segment:{mode}")
        for (split, dialog_id), turns in contexts.items():
            write_cumulative_contexts(
                turns, os.path.join(args.target, split, dialog_id)
            )
        print(f"[{mode}] {len(contexts)} dialogs")


if __name__ == "__main__":
    main()
