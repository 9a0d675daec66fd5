"""Context tokenization with static shapes.

The reference tokenizes dialog histories with the Llama-3 BPE tokenizer,
left-padded and left-truncated (``dataset_train_CSE.py:106-109,572``). On TPU
the token budget is fixed per bucket so the LLM prefill compiles once:
``encode_batch`` left-truncates to ``max_tokens`` and left-pads to exactly
that length.

When the Llama tokenizer files aren't available locally (zero-egress
environments), ``ByteTokenizer`` provides a deterministic fallback with the
same interface so the full pipeline stays runnable end-to-end; it is NOT
checkpoint-compatible with Llama conditioning and says so loudly.
"""

from __future__ import annotations

import numpy as np


class ByteTokenizer:
    """UTF-8 byte fallback tokenizer (ids 2..257; bos=1, pad=0)."""

    pad_token_id = 0
    bos_token_id = 1
    vocab_size = 258
    is_fallback = True

    def encode(self, text: str, add_bos: bool = True) -> list[int]:
        ids = [b + 2 for b in text.encode("utf-8")]
        return ([self.bos_token_id] + ids) if add_bos else ids

    def decode(self, ids) -> str:
        return bytes(i - 2 for i in ids if i >= 2).decode("utf-8", errors="replace")


class HFTokenizer:
    """transformers AutoTokenizer wrapper with the reference's settings."""

    is_fallback = False

    def __init__(self, path: str, auth_token: str | None = None):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path, token=auth_token or None)
        self.tok.pad_token_id = self.tok.eos_token_id
        self.tok.padding_side = "left"
        self.tok.truncation_side = "left"
        self.pad_token_id = self.tok.pad_token_id
        self.bos_token_id = self.tok.bos_token_id
        self.vocab_size = len(self.tok)

    def encode(self, text: str, add_bos: bool = True) -> list[int]:
        return self.tok(text, add_special_tokens=add_bos).input_ids

    def decode(self, ids) -> str:
        return self.tok.decode(ids, skip_special_tokens=True)


def load_tokenizer(path: str, auth_token: str | None = None, allow_fallback: bool = True):
    import os

    os.environ.setdefault("HF_HUB_OFFLINE", "1")  # zero-egress: never retry hub
    try:
        if not os.path.isdir(path):
            raise FileNotFoundError(f"tokenizer path {path!r} is not a local directory")
        return HFTokenizer(path, auth_token)
    except Exception as e:
        if not allow_fallback:
            raise
        import sys

        print(
            f"[cse_tpu] WARNING: could not load tokenizer from {path!r} ({e}); "
            "using ByteTokenizer fallback — NOT compatible with released "
            "Llama-conditioned checkpoints.",
            file=sys.stderr,
        )
        return ByteTokenizer()


def encode_batch(
    tokenizer, texts: list[str], max_tokens: int
) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize -> (ids [B, max_tokens], mask [B, max_tokens]) int32.

    Left-truncated to ``max_tokens``, left-padded with pad_token_id — the
    reference's padding_side/truncation_side='left' with a static budget.
    """
    B = len(texts)
    ids = np.full((B, max_tokens), tokenizer.pad_token_id, np.int32)
    mask = np.zeros((B, max_tokens), np.int32)
    for i, t in enumerate(texts):
        toks = tokenizer.encode(t)[-max_tokens:]
        ids[i, max_tokens - len(toks):] = toks
        mask[i, max_tokens - len(toks):] = 1
    return ids, mask
