"""Eval-time enrollment embeddings for H-ContExt (shared by test_HContExt.py
and the trainer's validation loop).

Reference rules (``dataset_train_CSE.py:375-391``, mode != 'train'):
* dailytalk: fixed per-speaker register wavs from the test gt set
* tedlium:   first gt wav of the same speaker in the current mode
* spokenwoz / ``--one_sec``: a random 1 s crop of the gt itself
The full register/candidate wav is encoded (no truncation), with its true
length passed to the speaker encoder's masking.
"""

from __future__ import annotations

import os
import zlib

import jax.numpy as jnp
import numpy as np

from cse_tpu.data import datasets as ds
from cse_tpu.data.audio_io import read_wav
from cse_tpu.models.speaker_encoder import encode_speaker


def eval_enrollment_embeddings(
    batch: dict,
    corpus: str,
    mode: str,
    paths: ds.CorpusPaths,
    num_test_mix: int = 2,
    seed: int = 0,
    one_sec: bool = False,
) -> jnp.ndarray:
    """[B] eval batch -> speaker embeddings [B, 1, 192]."""
    enroll: list[np.ndarray] = []
    for k in range(len(batch["names"])):
        wav16 = None
        if not one_sec and corpus in ("tedlium", "dailytalk"):
            p = ds.enrollment_path(
                batch["paths"][k], corpus, mode, paths, num_test_mix
            )
            if p and os.path.exists(p):
                wav16, _ = read_wav(p)
        if wav16 is None:
            # 1-second crop of the 16 kHz gt (spokenwoz / --one_sec rule);
            # the crop may not run into the zero-padded tail of the buffer,
            # so its VALID extent is bounded by the gt's true length.
            # Crop offsets are seeded per ITEM (utterance name folded into
            # the seed), so every item draws a distinct-but-reproducible
            # offset instead of batch row k replaying one global sequence
            rng = np.random.default_rng(
                (seed, zlib.crc32(str(batch["names"][k]).encode()))
            )
            gt = np.asarray(batch["gt16k"][k])
            n = int(batch["gt16k_len"][k])
            st = int(rng.integers(0, max(n - 16000, 0) + 1))
            wav16 = gt[st : min(st + 16000, max(n, 1))]
        enroll.append(np.asarray(wav16, np.float32))
    T = max(len(e) for e in enroll)
    buf = np.zeros((len(enroll), T), np.float32)
    lens = np.zeros(len(enroll), np.int32)
    for k, e in enumerate(enroll):
        buf[k, : len(e)] = e
        lens[k] = len(e)
    return encode_speaker(jnp.asarray(buf), lens)
