"""Full-size checkpoint parity (VERDICT missing #2): the torch oracle at the
released checkpoints' hyperparameters (reference ``src/models/ContSep.py:10-40``:
enc 256/k16/s8, d_model 256, 8 heads, ffn 1024, 8 TF layers, 2 DP blocks,
K=250, llm_dim 4096), import -> apply AND export -> torch-load -> apply, fp32
waveform parity <= 1e-4 on a 2 s input. One test per variant. Slow (~1 min
each on the 1-core CPU host) but runs in the default suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cse_tpu.compat.torch_export import sepformer_to_state_dict
from cse_tpu.compat.torch_import import (
    infer_reference_config,
    sepformer_from_state_dict,
)
from cse_tpu.models.sepformer import Sepformer, SepformerConfig
from sepformer_oracle import FULL, OracleSepformer
pytestmark = pytest.mark.slow  # multi-minute on the 1-core box; excluded by -m 'not slow'


SR = 8000
T = 2 * SR  # 2 s


def _cfg(**kw):
    # SepformerConfig defaults ARE the full reference hyperparams; pin the
    # oracle-coupled ones explicitly so a default drift can't silently
    # weaken this test.
    return SepformerConfig(
        enc_channels=FULL.d_model, enc_kernel=FULL.enc_kernel,
        enc_stride=FULL.enc_stride, d_model=FULL.d_model, nhead=FULL.nhead,
        d_ffn=FULL.d_ffn, num_tf_layers=FULL.num_tf_layers,
        num_dp_layers=FULL.num_dp_layers, chunk_size=FULL.chunk,
        llm_dim=FULL.ctx_dim, se_dim=FULL.se_dim, pe_max_len=2500, **kw,
    )


def _import_and_compare(oracle, cfg, mix, ctx=None, se=None, cue="joint",
                        cue_index=None):
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    # config inference must recover the full-size architecture from the keys
    inferred = infer_reference_config(sd)
    assert inferred["num_tf_layers"] == FULL.num_tf_layers
    assert inferred["num_dp_layers"] == FULL.num_dp_layers
    params = sepformer_from_state_dict(sd)
    model = Sepformer(cfg)
    kwargs = dict(
        ctx=None if ctx is None else jnp.asarray(ctx.numpy()),
        se=None if se is None else jnp.asarray(se.numpy()),
        cue_index=cue_index,
    )
    ours = model.apply(params, jnp.asarray(mix.numpy()), **kwargs)
    with torch.no_grad():
        ref = oracle(mix, ctx, se, cue)
    return params, ours, ref


def test_fullsize_contsep_2spk_bidirectional():
    """DailyTalk config (2-spk, BCE selector): import parity AND export ->
    torch-load -> parity (both checkpoint directions at full size)."""
    torch.manual_seed(10)
    oracle = OracleSepformer(FULL, num_spks=2, variant="contsep", ce=False).eval()
    mix = torch.randn(1, T)
    ctx = torch.randn(1, 1, FULL.ctx_dim)
    cfg = _cfg(num_spks=2, variant="contsep", ce=False)
    params, (ours, logits), (ref, ref_logits) = _import_and_compare(
        oracle, cfg, mix, ctx
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), rtol=1e-4, atol=1e-4
    )

    # export direction: our params -> reference state_dict -> torch oracle
    sd_out = sepformer_to_state_dict(params)
    oracle2 = OracleSepformer(FULL, num_spks=2, variant="contsep", ce=False)
    oracle2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_out.items()},
        strict=True,
    )
    with torch.no_grad():
        ref2, ref2_logits = oracle2.eval()(mix, ctx)
    np.testing.assert_allclose(np.asarray(ours), ref2.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logits), ref2_logits.numpy(), rtol=1e-4, atol=1e-4
    )


def test_fullsize_contsep_3spk():
    torch.manual_seed(11)
    oracle = OracleSepformer(FULL, num_spks=3, variant="contsep", ce=True).eval()
    mix = torch.randn(1, T)
    ctx = torch.randn(1, 1, FULL.ctx_dim)
    _, (ours, logits), (ref, ref_logits) = _import_and_compare(
        oracle, _cfg(num_spks=3, variant="contsep", ce=True), mix, ctx
    )
    assert ours.shape == (1, T, 3) and logits.shape == (1, 3)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), rtol=1e-4, atol=1e-4
    )


def test_fullsize_context():
    torch.manual_seed(12)
    oracle = OracleSepformer(FULL, num_spks=2, variant="context").eval()
    mix = torch.randn(1, T)
    ctx = torch.randn(1, 1, FULL.ctx_dim)
    _, ours, ref = _import_and_compare(
        oracle, _cfg(num_spks=2, variant="context"), mix, ctx
    )
    assert ours.shape == (1, T, 1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_fullsize_hcontext():
    torch.manual_seed(13)
    oracle = OracleSepformer(
        FULL, num_spks=2, variant="context", add_se=True
    ).eval()
    mix = torch.randn(1, T)
    ctx = torch.randn(1, 1, FULL.ctx_dim)
    se = torch.randn(1, 1, FULL.se_dim)
    _, ours, ref = _import_and_compare(
        oracle, _cfg(num_spks=2, variant="context", add_se=True), mix, ctx, se,
        cue="joint", cue_index=jnp.asarray(0),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_fullsize_30s_bucket_edges():
    """The real 30 s validation bucket (reference train_ContSep.py:577) at
    full hyperparams: stresses the pe_max_len=2500 bound and odd chunk-count
    padding (VERDICT weak #8). JAX-only finiteness/shape check."""
    cfg = _cfg(num_spks=2, variant="context")
    model = Sepformer(cfg)
    rng = np.random.default_rng(0)
    mix = jnp.asarray(rng.standard_normal((1, 30 * SR)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 1, FULL.ctx_dim)).astype(np.float32))
    params = model.init(jax.random.key(0), mix[:, : 2 * SR], ctx)
    out = model.apply(params, mix, ctx)
    assert out.shape == (1, 30 * SR, 1)
    assert np.isfinite(np.asarray(out)).all()
