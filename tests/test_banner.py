"""Real-vs-stub startup banner + train-on-stubs refusal (VERDICT r2 #8)."""

import argparse

import pytest

from cse_tpu.core.banner import announce_assets, asset_status


class _Real:
    is_fallback = False
    is_stub = False


class _StubTok:
    is_fallback = True


class _StubLlm:
    is_stub = True


def _args(**kw):
    ns = argparse.Namespace(synthetic_smoke=False, allow_stub_nets=False)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_status_line_names_each_net():
    line, stubs = asset_status(
        tokenizer=_StubTok(), llm=_Real(), ecapa_path="", whisper=_StubLlm()
    )
    assert line == "tokenizer=STUB, llm=real, ecapa=STUB, whisper=STUB"
    assert stubs == ["tokenizer", "ecapa", "whisper"]


def test_omitted_nets_not_reported():
    line, stubs = asset_status(tokenizer=_Real(), llm=_Real())
    assert "ecapa" not in line and "whisper" not in line
    assert stubs == []


def test_train_refuses_stubs(capsys):
    with pytest.raises(SystemExit, match=r"refusing to TRAIN.*\(llm\)"):
        announce_assets("train", _args(), tokenizer=_Real(), llm=_StubLlm())
    assert "llm=STUB" in capsys.readouterr().out


@pytest.mark.parametrize("override", ["synthetic_smoke", "allow_stub_nets"])
def test_train_overrides_allow_stubs(override, capsys):
    announce_assets("train", _args(**{override: True}),
                    tokenizer=_StubTok(), llm=_StubLlm())
    assert "tokenizer=STUB" in capsys.readouterr().out


def test_eval_mode_never_refuses(capsys):
    announce_assets("test", _args(), tokenizer=_StubTok(), llm=_StubLlm())
    assert "STUB" in capsys.readouterr().out


def test_all_real_train_proceeds(capsys):
    announce_assets("train", _args(), tokenizer=_Real(), llm=_Real(),
                    ecapa_path="/some/ckpt")
    out = capsys.readouterr().out
    assert "tokenizer=real, llm=real, ecapa=real" in out
