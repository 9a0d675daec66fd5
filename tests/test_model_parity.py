"""Numerical parity: cse_tpu Sepformer vs a torch oracle with reference keys.

The oracle (tests/sepformer_oracle.py) is an independent, compact torch
implementation of the documented architecture (SURVEY.md §3.2), wired so its
``state_dict()`` uses the *reference checkpoint key names*. Importing that
state_dict through ``cse_tpu.compat.torch_import`` and matching outputs
end-to-end validates both the model math and the released-checkpoint import
path at once. Tiny dims here; full released-checkpoint hyperparams in
tests/test_fullsize_parity.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cse_tpu.compat.torch_import import (
    infer_reference_config,
    sepformer_from_state_dict,
)
from cse_tpu.models.sepformer import Sepformer, SepformerConfig, sinusoidal_pe
from sepformer_oracle import TINY, OracleSepformer, torch_pe

torch.manual_seed(0)

D, CTX_DIM, SE_DIM = TINY.d_model, TINY.ctx_dim, TINY.se_dim


def _cfg(**kw):
    return SepformerConfig(
        enc_channels=TINY.d_model,
        enc_kernel=TINY.enc_kernel,
        enc_stride=TINY.enc_stride,
        d_model=TINY.d_model,
        nhead=TINY.nhead,
        d_ffn=TINY.d_ffn,
        num_tf_layers=TINY.num_tf_layers,
        num_dp_layers=TINY.num_dp_layers,
        chunk_size=TINY.chunk,
        llm_dim=TINY.ctx_dim,
        se_dim=TINY.se_dim,
        pe_max_len=512,
        **kw,
    )


def _run_pair(oracle, cfg, mix, ctx=None, se=None, cue="joint", cue_index=None):
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = sepformer_from_state_dict(
        sd, num_dp_layers=cfg.num_dp_layers, num_tf_layers=cfg.num_tf_layers
    )
    model = Sepformer(cfg)
    args = dict(
        ctx=None if ctx is None else jnp.asarray(ctx.numpy()),
        se=None if se is None else jnp.asarray(se.numpy()),
        cue_index=cue_index,
    )
    ours = model.apply(params, jnp.asarray(mix.numpy()), **args)
    with torch.no_grad():
        ref = oracle(mix, ctx, se, cue)
    return ours, ref


def test_pe_matches():
    ours = np.asarray(sinusoidal_pe(64, D))
    ref = torch_pe(64, D).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_base_parity():
    torch.manual_seed(1)
    oracle = OracleSepformer(TINY, num_spks=2, variant="base").eval()
    mix = torch.randn(2, 200)
    ours, ref = _run_pair(oracle, _cfg(num_spks=2, variant="base"), mix)
    assert ours.shape == (2, 200, 2)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ce,num_spks", [(False, 2), (True, 2), (True, 3)])
def test_contsep_parity(ce, num_spks):
    torch.manual_seed(2)
    oracle = OracleSepformer(TINY, num_spks=num_spks, variant="contsep", ce=ce).eval()
    mix = torch.randn(2, 200)
    ctx = torch.randn(2, 1, CTX_DIM)
    (ours, logits), (ref, ref_logits) = _run_pair(
        oracle, _cfg(num_spks=num_spks, variant="contsep", ce=ce), mix, ctx
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), rtol=1e-4, atol=1e-5)


def test_context_parity():
    torch.manual_seed(3)
    oracle = OracleSepformer(TINY, num_spks=2, variant="context").eval()
    mix = torch.randn(2, 200)
    ctx = torch.randn(2, 2, CTX_DIM)  # multi-token ctx (--ctx_length > 1)
    ours, ref = _run_pair(oracle, _cfg(num_spks=2, variant="context"), mix, ctx)
    assert ours.shape == (2, 200, 1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cue,idx", [("joint", 0), ("history", 1), ("voice", 2)])
def test_hcontext_cue_parity(cue, idx):
    torch.manual_seed(4)
    oracle = OracleSepformer(TINY, num_spks=2, variant="context", add_se=True).eval()
    mix = torch.randn(1, 200)
    ctx = torch.randn(1, 1, CTX_DIM)
    se = torch.randn(1, 1, SE_DIM)
    ours, ref = _run_pair(
        oracle,
        _cfg(num_spks=2, variant="context", add_se=True),
        mix,
        ctx,
        se,
        cue,
        cue_index=jnp.asarray(idx),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_infer_reference_config():
    oracle = OracleSepformer(TINY, num_spks=3, variant="contsep", ce=True)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    cfg = infer_reference_config(sd)
    assert cfg == dict(
        num_spks=3, num_dp_layers=TINY.num_dp_layers,
        num_tf_layers=TINY.num_tf_layers,
        variant="contsep", ce=True, add_se=False,
    )
