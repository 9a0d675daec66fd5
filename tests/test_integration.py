"""End-to-end integration: real train_net over the synthetic corpus (tiny
model, CPU), including the 8-way data-parallel mesh path through the CLI
layer — the fast_validate smoke of SURVEY.md §4 turned into CI."""

import numpy as np
import pytest

from cse_tpu.core.flags import parse_train_args
from cse_tpu.train.loop import train_net
pytestmark = pytest.mark.slow  # multi-minute on the 1-core box; excluded by -m 'not slow'



def _args(extra):
    base = [
        "--synthetic_smoke", "--platform", "cpu", "--debug_tiny_model",
        "--train_data", "dailytalk",
        "--tot_iters", "3", "--batch_size", "2", "--eval_step", "2",
        "--max_sp_len", "2", "--max_ctx_tokens", "16", "--workers", "2",
        "--log_every", "10",
    ]
    return parse_train_args(base + extra)


@pytest.mark.parametrize("variant", ["context", "contsep", "hcontext", "base"])
def test_train_net_variants(tmp_path, variant):
    args = _args(["--checkpoint_dir", str(tmp_path / variant)])
    params = train_net(args, variant=variant)
    assert all(np.isfinite(np.asarray(x)).all() for x in
               __import__("jax").tree.leaves(params))
    ckpts = list((tmp_path / variant).glob("*.ckpt"))
    assert ckpts, "eval_step checkpoint missing"


def test_train_net_mesh_dp(tmp_path):
    """CLI-level data parallelism over the virtual 8-device mesh."""
    args = _args([
        "--checkpoint_dir", str(tmp_path / "dp"), "--mesh_data", "8",
        "--batch_size", "8",
    ])
    params = train_net(args, variant="context")
    assert params is not None


def test_resume_from_ckpt_continues(tmp_path):
    """--resume --from_ckpt restores step/epoch/opt state and keeps training
    (reference train_ContSep.py:179-211 semantics) through the CLI layer."""
    from cse_tpu.train import checkpoint as ckpt_lib

    d = str(tmp_path / "run")
    args = _args(["--checkpoint_dir", d, "--tot_iters", "2"])
    train_net(args, variant="context")
    first = ckpt_lib.latest_checkpoint(d)
    assert first is not None
    s1 = int(ckpt_lib.restore_checkpoint(first)["step"])

    args2 = _args(["--checkpoint_dir", d, "--tot_iters", "4",
                   "--resume", "--from_ckpt"])
    train_net(args2, variant="context")
    second = ckpt_lib.latest_checkpoint(d)
    s2 = int(ckpt_lib.restore_checkpoint(second)["step"])
    assert s2 > s1, (s1, s2)
