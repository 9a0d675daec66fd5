"""End-to-end eval CLIs over the synthetic corpus (reference test.py /
test_HContExt.py / test_cascaded.py equivalents run as CI integration tests
— SURVEY.md §4's "evaluation scripts as integration tests" turned into
actual tests). Guards the CLI wiring (flag plumbing, loaders, result-file
writing) that unit tests of the underlying pieces don't touch."""

import importlib.util
import os
import sys

import pytest
pytestmark = pytest.mark.slow  # multi-minute on the 1-core box; excluded by -m 'not slow'


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(module_name, argv, monkeypatch):
    """Load the repo-root CLI by path (tests/test_cascaded.py shadows the
    module name on sys.path) and run its main() with patched argv."""
    monkeypatch.setattr(sys, "argv", [module_name + ".py"] + argv)
    spec = importlib.util.spec_from_file_location(
        "cli_" + module_name, os.path.join(REPO, module_name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.main()


COMMON = [
    "--synthetic_smoke", "--platform", "cpu", "--mode", "test",
    "--train_data", "dailytalk",
    "--max_sp_len", "2", "--max_ctx_tokens", "16", "--workers", "2",
]


def _check(res, n_min=1):
    """The eval must have processed real items and produced finite metrics —
    an empty loader would still write result files (vacuous-pass guard)."""
    import numpy as np

    assert res is not None and res["n"] >= n_min, res
    assert np.isfinite(res["si_snr"]) and np.isfinite(res["sdr"]), res


def test_eval_cli_contexct(tmp_path, monkeypatch):
    res = _run_cli(
        "test",
        COMMON + ["--test_model", "ContExt", "--batch_size", "2",
                  "--save_dir", str(tmp_path)],
        monkeypatch,
    )
    _check(res)
    out = tmp_path / "random_init" / "2_speaker_0_ctx"
    assert (out / "test_results_dailytalk.txt").exists()
    assert (out / "acc_dailytalk.txt").exists()


def test_eval_cli_contsep(tmp_path, monkeypatch):
    res = _run_cli(
        "test",
        COMMON + ["--test_model", "ContSep", "--batch_size", "2",
                  "--save_dir", str(tmp_path)],
        monkeypatch,
    )
    _check(res)
    out = tmp_path / "random_init" / "2_speaker_0_ctx"
    assert (out / "test_results_dailytalk.txt").exists()
    txt = (out / "test_results_dailytalk.txt").read_text()
    assert "Test PESQ-p862:" in txt  # PESQ column present (VERDICT r2 #6)


@pytest.mark.parametrize("cue", ["joint", "voice"])
def test_eval_cli_hcontext(tmp_path, monkeypatch, cue):
    res = _run_cli(
        "test_HContExt",
        COMMON + ["--batch_size", "2", "--cue", cue,
                  "--save_dir", str(tmp_path)],
        monkeypatch,
    )
    _check(res)
    out = tmp_path / "random_init" / f"2_speaker_0_ctx_{cue}"
    assert (out / "test_results_dailytalk.txt").exists()


def test_eval_cli_cascaded(tmp_path, monkeypatch):
    res = _run_cli(
        "test_cascaded",
        COMMON + ["--batch_size", "1", "--num_test_mix", "2",
                  "--asr_temperature", "0",  # greedy rung only: the full
                  # fallback ladder on random stub weights retries every row
                  "--save_dir", str(tmp_path)],
        monkeypatch,
    )
    _check(res)
    hits = list(tmp_path.rglob("test_results_dailytalk.txt"))
    assert hits, "cascaded eval wrote no result file"
    assert "Test PESQ-p862:" in hits[0].read_text()


def test_eval_cli_hcontext_tedlium(tmp_path, monkeypatch):
    """TEDLIUM: no-Speaker-prefix contexts + enrollment register paths
    resolved from the gt dir (reference test_HContExt.py + dataset :380-391)."""
    res = _run_cli(
        "test_HContExt",
        ["--synthetic_smoke", "--platform", "cpu", "--mode", "test",
         "--train_data", "tedlium", "--max_sp_len", "2",
         "--max_ctx_tokens", "16", "--workers", "2", "--batch_size", "2",
         "--cue", "joint", "--save_dir", str(tmp_path)],
        monkeypatch,
    )
    _check(res)
    out = tmp_path / "random_init" / "2_speaker_0_ctx_joint"
    assert (out / "test_results_tedlium.txt").exists()


def test_eval_cli_context_spokenwoz(tmp_path, monkeypatch):
    res = _run_cli(
        "test",
        ["--synthetic_smoke", "--platform", "cpu", "--mode", "test",
         "--train_data", "spokenwoz", "--max_sp_len", "2",
         "--max_ctx_tokens", "16", "--workers", "2", "--batch_size", "2",
         "--test_model", "ContExt", "--save_dir", str(tmp_path)],
        monkeypatch,
    )
    _check(res)
    out = tmp_path / "random_init" / "2_speaker_0_ctx"
    assert (out / "test_results_spokenwoz.txt").exists()


def test_eval_cli_contsep_3spk(tmp_path, monkeypatch):
    """3-speaker eval: mixed_3speaker/gt_3speaker/noise_{1,2}_3speaker dirs,
    5-field mixing, CE selector over 3 streams (reference test.py protocol)."""
    res = _run_cli(
        "test",
        COMMON + ["--test_model", "ContSep", "--batch_size", "2",
                  "--num_max_mix", "3", "--num_test_mix", "3",
                  "--save_dir", str(tmp_path)],
        monkeypatch,
    )
    _check(res)
    out = tmp_path / "random_init" / "3_speaker_0_ctx"
    assert (out / "test_results_dailytalk.txt").exists()
