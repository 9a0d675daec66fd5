"""Context encoders: frozen LLM wrappers producing the 4096-d cue vectors.

The reference conditions the separator on ``LlamaModel(...).last_hidden_state
[:, -ctx_length:]`` of the tokenized dialog history (``train_ContSep.py:379-380``,
``train_ContExt.py:362``). Here the encoder is an interchangeable callable
``(ids [B,T], mask [B,T]) -> [B, ctx_length, dim]``:

* ``LlamaContextEncoder`` — the real thing (cse_tpu.models.llama), used when
  Llama-3 weights are available locally; bf16, optionally sharded over the
  ``model`` mesh axis.
* ``HashProjectionEncoder`` — a deterministic, parameter-free stand-in for
  zero-egress environments: fixed random-feature token embeddings, masked
  positional readout. It exercises the identical conditioning plumbing
  (shapes, dtypes, jit boundaries) but is NOT compatible with released
  checkpoints — construction warns loudly.
"""

from __future__ import annotations

import os
import sys
from functools import partial

import jax
import jax.numpy as jnp


class HashProjectionEncoder:
    """Deterministic random-feature embedding of token ids (llm stand-in)."""

    is_stub = True

    def __init__(self, dim: int = 4096, ctx_length: int = 1, seed: int = 0):
        self.dim = dim
        self.ctx_length = ctx_length
        self.seed = seed
        print(
            "[cse_tpu] WARNING: using HashProjectionEncoder — dialog-history "
            "conditioning is a deterministic stand-in, NOT Llama-3; released "
            "checkpoints will not be meaningful.",
            file=sys.stderr,
        )

    def __call__(self, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        return _hash_encode(ids, mask, self.dim, self.ctx_length, self.seed)

    def pure(self):
        """(apply(params, ids, mask), params) for jit-argument threading.

        The stand-in is parameter-free; params is the empty pytree so the
        train/eval steps can thread one uniform signature either way.
        """
        dim, ctx_length, seed = self.dim, self.ctx_length, self.seed

        def apply(params, ids, mask):
            del params
            return _hash_encode(ids, mask, dim, ctx_length, seed)

        return apply, ()


@partial(jax.jit, static_argnums=(2, 3, 4))
def _hash_encode(ids, mask, dim, ctx_length, seed):
    key = jax.random.key(seed)
    w = jax.random.normal(key, (1, 1, dim)) * 0.02
    p = jax.random.uniform(jax.random.fold_in(key, 1), (1, 1, dim)) * 6.283
    emb = jnp.sin(ids[:, :, None].astype(jnp.float32) * w + p)  # [B, T, dim]
    emb = emb * mask[:, :, None].astype(jnp.float32)
    # cumulative context summary at each position (causal mean), then read the
    # last ctx_length positions (left padding puts real tokens at the right)
    csum = jnp.cumsum(emb, axis=1)
    cnt = jnp.maximum(jnp.cumsum(mask, axis=1), 1)[:, :, None].astype(jnp.float32)
    feat = csum / cnt
    return feat[:, -ctx_length:, :]


def llama_weights_available(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, "config.json"))


def build_context_encoder(
    llama_path: str,
    ctx_length: int = 1,
    dim: int = 4096,
    auth_token: str | None = None,
    mesh=None,
    force_stub: bool = False,
    quant: str | None = None,
):
    """Return the best available encoder callable (Llama if local, else stub)."""
    if not force_stub and llama_weights_available(llama_path):
        from cse_tpu.models.llama import LlamaContextEncoder

        return LlamaContextEncoder(llama_path, ctx_length=ctx_length, mesh=mesh,
                                   quant=quant)
    return HashProjectionEncoder(dim=dim, ctx_length=ctx_length)
