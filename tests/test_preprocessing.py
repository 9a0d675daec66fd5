"""Offline preprocessing CLIs (SURVEY §2.1 row 14): segmentation planning,
split routing, and cumulative-context writing, with the ffmpeg transcode seam
stubbed (this image ships no ffmpeg; the real transcode is a fixed ffmpeg
argv exercised in production only)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(script):
    spec = importlib.util.spec_from_file_location(
        "prep_" + script, os.path.join(REPO, "preprocessing", script + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_extract(calls):
    def fake(src, dst, start=None, duration=None, sr=16000):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "wb") as f:
            f.write(b"RIFFfake")
        calls.append((src, dst, start, duration))
    return fake


def test_write_cumulative_contexts(tmp_path):
    from preprocessing.common import write_cumulative_contexts

    out = str(tmp_path / "d")
    write_cumulative_contexts(
        [("0_0_d1", "hi there"), ("1_1_d1", "hello"), ("2_0_d1", "bye")], out)
    assert open(os.path.join(out, "0_0_d1.txt")).read() == ""
    assert open(os.path.join(out, "1_1_d1.txt")).read() == "hi there\n"
    assert open(os.path.join(out, "2_0_d1.txt")).read() == "hi there\nhello\n"


def test_preprocess_dailytalk(tmp_path, monkeypatch):
    src = tmp_path / "DailyTalk" / "7"
    src.mkdir(parents=True)
    for t in range(3):
        (src / f"{t}_{t % 2}_d7.wav").write_bytes(b"RIFFx")
        (src / f"{t}_{t % 2}_d7.txt").write_text(f"turn {t} text")
    lst = tmp_path / "train_dialog.txt"
    lst.write_text("7\n")
    target = tmp_path / "out"

    mod = _load("preprocess_dailytalk")
    calls = []
    monkeypatch.setattr(mod, "ffmpeg_extract", _fake_extract(calls))
    monkeypatch.setattr(sys, "argv", [
        "x", "--dailytalk", str(tmp_path / "DailyTalk"), "--target", str(target),
        "--dialog_list", str(lst), "--workers", "2"])
    mod.main()

    assert len(calls) == 3
    d = target / "train" / "7"
    assert sorted(p.name for p in d.glob("*.wav")) == [
        "0_0_d7.wav", "1_1_d7.wav", "2_0_d7.wav"]
    # cumulative history: turn 2 sees turns 0 and 1
    assert (d / "2_0_d7.txt").read_text() == "turn 0 text\nturn 1 text\n"
    assert (d / "0_0_d7.txt").read_text() == ""


def test_preprocess_spokenwoz(tmp_path, monkeypatch):
    srcroot = tmp_path / "SpokenWoz"
    (srcroot / "text_5700_train_dev").mkdir(parents=True)
    (srcroot / "audio_5700_train_dev").mkdir()
    data = {
        "SNG01": {"log": [
            {"tag": "user", "text": "book a table",
             "words": [{"BeginTime": 0, "EndTime": 900}]},
            {"tag": "system", "text": "for how many",
             "words": [{"BeginTime": 1000, "EndTime": 2400}]},
        ]},
        "SNG02": {"log": [
            {"tag": "user", "text": "hi",
             "words": [{"BeginTime": 500, "EndTime": 800}]},
            {"tag": "system", "text": "", "words": []},  # empty turn skipped
        ]},
    }
    (srcroot / "text_5700_train_dev" / "data.json").write_text(json.dumps(data))
    (srcroot / "text_5700_train_dev" / "valListFile.json").write_text("SNG02\n")
    target = tmp_path / "out"

    mod = _load("preprocess_spokenwoz")
    calls = []
    monkeypatch.setattr(mod, "ffmpeg_extract", _fake_extract(calls))
    monkeypatch.setattr(sys, "argv", [
        "x", "--source", str(srcroot), "--target", str(target),
        "--modes", "train_dev", "--workers", "2"])
    mod.main()

    # SNG01 -> train (2 turns, user=0/system=1), SNG02 -> val (1 valid turn)
    assert (target / "train" / "SNG01" / "0_0_SNG01.wav").exists()
    assert (target / "train" / "SNG01" / "1_1_SNG01.wav").exists()
    assert (target / "val" / "SNG02" / "0_0_SNG02.wav").exists()
    # word-timestamp segmentation: start 1.0 s, duration 1.4 s
    seg = [c for c in calls if c[1].endswith("1_1_SNG01.wav")][0]
    assert seg[2] == pytest.approx(1.0) and seg[3] == pytest.approx(1.4)
    assert (target / "train" / "SNG01" / "1_1_SNG01.txt").read_text() == \
        "book a table\n"


def test_preprocess_tedlium(tmp_path, monkeypatch):
    seg_root = tmp_path / "lists" / "train.orig"
    seg_root.mkdir(parents=True)
    (seg_root / "segments").write_text(
        "TalkA-000-100 TalkA 0.0 1.0\n"
        "TalkA-100-250 TalkA 1.0 2.5\n"
        "TalkB-000-100 TalkB 0.0 1.0\n"
    )
    (seg_root / "text").write_text(
        "TalkA-000-100 hello world\nTalkA-100-250 again\nTalkB-000-100 other\n"
    )
    ted = tmp_path / "TEDLIUM_release-3"
    (ted / "speaker-adaptation").mkdir(parents=True)
    (ted / "speaker-adaptation" / "train.lst").write_text("TalkA\n")
    target = tmp_path / "out"

    mod = _load("preprocess_tedlium")
    calls = []
    monkeypatch.setattr(mod, "ffmpeg_extract", _fake_extract(calls))
    monkeypatch.setattr(sys, "argv", [
        "x", "--tedlium", str(ted), "--target", str(target),
        "--segments_root", str(tmp_path / "lists"), "--modes", "train",
        "--workers", "2"])
    mod.main()

    # TalkB excluded by the speaker-adaptation split
    assert not (target / "train" / "TalkB").exists()
    assert (target / "train" / "TalkA" / "TalkA-000-100.wav").exists()
    # duration = end - start for the second segment
    seg = [c for c in calls if c[1].endswith("TalkA-100-250.wav")][0]
    assert seg[2] == pytest.approx(1.0) and seg[3] == pytest.approx(1.5)
    assert (target / "train" / "TalkA" / "TalkA-100-250.txt").read_text() == \
        "hello world\n"
