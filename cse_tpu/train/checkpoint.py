"""Checkpoint save/restore with reference-compatible naming and semantics.

Mirrors the reference checkpoint contract (``train_ContSep.py:179-211,458-513``):
* files named ``Epoch_%04d_%05d_%.2f.ckpt`` (epoch, step, val SI-SNR) plus a
  single rolling ``Best_*.ckpt`` (previous best deleted);
* ``--resume`` picks the newest checkpoint by the step parsed from the name;
* weights-only warm start vs full restore (``--from_ckpt``) of optimizer/
  scheduler/step/epoch.

Storage is orbax (each ``.ckpt`` is a directory); released PyTorch ``.ckpt``
files are detected by magic and routed through cse_tpu.compat.torch_import,
so both formats are consumable by the same flag.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer() -> ocp.Checkpointer:
    """An orbax checkpointer scoped to THIS process only.

    The trainer saves on rank 0 alone after its own barrier (reference
    ``train_ContSep.py:466-513``); the default orbax ``Checkpointer`` runs a
    GLOBAL ``sync_global_processes`` inside save when ``jax.distributed`` is
    initialized, which deadlocks (or name-mismatches against unrelated
    barriers) when the other ranks never enter save — exactly the failure
    ``tests/test_multihost.py`` reproduces. The state saved here is always
    host-replicated numpy (``save_checkpoint`` materializes it), so a
    single-process barrier scope is correct."""
    me = jax.process_index()
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me},
            barrier_sync_key_prefix=f"cse{me}",
        ),
    )


def _is_torch_ckpt(path: str) -> bool:
    if os.path.isdir(path):
        return False
    with open(path, "rb") as f:
        magic = f.read(4)
    return magic[:2] == b"PK" or magic[0:1] == b"\x80"  # zipfile or legacy pickle


def save_checkpoint(
    checkpoint_dir: str,
    epoch: int,
    step: int,
    val_sisnr: float,
    state: dict[str, Any],
    best: bool = False,
) -> str:
    """Write ``state`` (params/opt_state/sched_state/step/epoch) to
    ``Epoch_%04d_%05d_%.2f.ckpt`` (or rolling ``Best_*``)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    prefix = "Best" if best else "Epoch"
    name = f"{prefix}_{epoch:04d}_{step:05d}_{val_sisnr:.2f}.ckpt"
    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    prev_best = [
        p for p in glob.glob(os.path.join(checkpoint_dir, "Best_*.ckpt"))
        if os.path.abspath(p) != path  # glob may yield relative paths
    ] if best else []
    if os.path.exists(path):
        shutil.rmtree(path, ignore_errors=True)
    with _checkpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, state))
    # roll the previous Best only AFTER the new one is fully written — a
    # crash mid-save must never leave the run without a best checkpoint
    for prev in prev_best:
        shutil.rmtree(prev, ignore_errors=True)
    return path


def latest_checkpoint(checkpoint_dir: str) -> str | None:
    """Newest checkpoint by step number parsed from the filename
    (reference ``train_ContSep.py:179-187``)."""
    ckpts = glob.glob(os.path.join(checkpoint_dir, "*.ckpt"))
    if not ckpts:
        return None

    def step_of(p):
        m = re.match(r".*_(\d+)_(\d+)_.*\.ckpt$", os.path.basename(p))
        return int(m.group(2)) if m else -1

    return max(ckpts, key=step_of)


def restore_checkpoint(path: str, template: dict[str, Any] | None = None) -> dict[str, Any]:
    """Load an orbax checkpoint (or a released PyTorch .ckpt).

    Torch checkpoints come back as
    ``{'state_dict': {...numpy...}, 'step': ..., 'epoch': ...}`` for the
    caller to route through compat.torch_import; orbax ones as the saved tree.
    """
    if _is_torch_ckpt(path):
        from cse_tpu.compat.torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path)
    with _checkpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, item=jax.tree.map(np.asarray, template))
        return ckptr.restore(path)
