"""ServingEngine (fused kernels) vs Sepformer.apply parity on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cse_tpu.models import Sepformer, SepformerConfig
from cse_tpu.serving import ServingEngine, sepformer_fused_forward
pytestmark = pytest.mark.slow  # multi-minute on the 1-core box; excluded by -m 'not slow'


TINY = dict(
    enc_channels=16, enc_kernel=8, enc_stride=4, d_model=16, nhead=4, d_ffn=32,
    num_tf_layers=2, num_dp_layers=2, chunk_size=10, llm_dim=24, se_dim=12,
    pe_max_len=256, compute_dtype=jnp.float32,
)


@pytest.mark.parametrize("variant", ["base", "context", "contsep"])
def test_fused_matches_apply(rng, variant):
    cfg = SepformerConfig(variant=variant, ce=True, **TINY)
    model = Sepformer(cfg)
    mix = jnp.asarray(rng.standard_normal((2, 300)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 1, 24)).astype(np.float32))
    args = [mix] if variant == "base" else [mix, ctx]
    params = model.init(jax.random.key(0), *args)
    ref = model.apply(params, *args)
    got = sepformer_fused_forward(
        params, cfg, mix, ctx=None if variant == "base" else ctx
    )
    if variant == "contsep":
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), rtol=2e-4, atol=2e-4)
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_hcontext_fused(rng):
    cfg = SepformerConfig(variant="context", add_se=True, **TINY)
    model = Sepformer(cfg)
    mix = jnp.asarray(rng.standard_normal((1, 300)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 1, 24)).astype(np.float32))
    se = jnp.asarray(rng.standard_normal((1, 1, 12)).astype(np.float32))
    params = model.init(jax.random.key(0), mix, ctx, se=se, cue_index=jnp.asarray(0))
    ref = model.apply(params, mix, ctx, se=se, cue_index=jnp.asarray(2))
    got = sepformer_fused_forward(params, cfg, mix, ctx=ctx, se=se,
                                  cue_index=jnp.asarray(2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_engine_wrapper(rng):
    cfg = SepformerConfig(variant="context", **TINY)
    model = Sepformer(cfg)
    mix = jnp.asarray(rng.standard_normal((1, 200)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 1, 24)).astype(np.float32))
    params = model.init(jax.random.key(0), mix, ctx)
    engine = ServingEngine(cfg, params)
    out = engine(mix, ctx)
    assert out.shape == (1, 200, 1) and np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("variant", ["contsep", "context"])
def test_fused_eval_step_matches_xla(rng, variant):
    """make_eval_step(fused=True) — the `--fused_eval` CLI path — reproduces
    the XLA eval step's enhanced output and aux (VERDICT r2 'do this' #7)."""
    from cse_tpu.train.step import TrainConfig, make_eval_step

    cfg = SepformerConfig(variant=variant, ce=True, **TINY)
    model = Sepformer(cfg)
    mix = jnp.asarray(rng.standard_normal((2, 300)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 1, 24)).astype(np.float32))
    gt = jnp.asarray(rng.standard_normal((2, 300)).astype(np.float32))
    params = model.init(jax.random.key(0), mix, ctx)
    tcfg = TrainConfig(variant=variant, num_spks=2, use_ce=True)
    batch = {"mixed": mix, "ctx_feat": ctx, "gt": gt}
    ref_out, ref_aux = make_eval_step(model, tcfg)(params, batch)
    got_out, got_aux = make_eval_step(model, tcfg, fused=True)(params, batch)
    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(ref_out), rtol=2e-4, atol=2e-4
    )
    for k in ref_aux:
        np.testing.assert_array_equal(np.asarray(got_aux[k]), np.asarray(ref_aux[k]))


def test_fused_eval_step_hcontext(rng):
    from cse_tpu.train.step import TrainConfig, make_eval_step

    cfg = SepformerConfig(variant="context", add_se=True, **TINY)
    model = Sepformer(cfg)
    mix = jnp.asarray(rng.standard_normal((1, 300)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 1, 24)).astype(np.float32))
    se = jnp.asarray(rng.standard_normal((1, 1, 12)).astype(np.float32))
    params = model.init(jax.random.key(0), mix, ctx, se=se, cue_index=jnp.asarray(0))
    tcfg = TrainConfig(variant="hcontext")
    batch = {"mixed": mix, "ctx_feat": ctx, "se": se}
    ref, _ = make_eval_step(model, tcfg, cue="voice")(params, batch)
    got, _ = make_eval_step(model, tcfg, cue="voice", fused=True)(params, batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_w8a8_qdot_matches_numpy_oracle(rng):
    """_qdot (the w8a8 serving matmul) == the same quantization written out
    in numpy: per-row symmetric activation int8, int matmul, both scales on
    the accumulator. Same oracle style as tests/test_llama.py's _mm_w8a8."""
    from cse_tpu.ops.fused_stack import _qdot

    h = (rng.standard_normal((6, 16)) * 3.0).astype(np.float32)
    w8 = rng.integers(-127, 128, (16, 8)).astype(np.int8)
    s = ((rng.random((1, 8)) + 0.1) / 100.0).astype(np.float32)
    sa = np.maximum(np.max(np.abs(h), axis=-1, keepdims=True), 1e-12) / 127.0
    hq = np.round(h / sa).astype(np.int8)
    want = (hq.astype(np.int64) @ w8.astype(np.int64)) * sa.astype(np.float64) * s
    got = np.asarray(_qdot(jnp.asarray(h), jnp.asarray(w8), jnp.asarray(s)))
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5, atol=1e-7)


def test_w8a8_quantize_stacked_oracle(rng):
    """Per-output-channel scales: max|w| over the CONTRACTION axis (axis 1)."""
    from cse_tpu.ops.fused_stack import _quantize_stacked

    w = rng.standard_normal((3, 8, 5)).astype(np.float32)
    q, s = (np.asarray(a) for a in _quantize_stacked(jnp.asarray(w)))
    want_s = np.maximum(np.max(np.abs(w), axis=1, keepdims=True), 1e-12) / 127.0
    np.testing.assert_allclose(s, want_s, rtol=1e-6)
    np.testing.assert_array_equal(q, np.round(w / want_s).astype(np.int8))
    assert q.dtype == np.int8 and int(np.abs(q).max()) <= 127


@pytest.mark.parametrize("variant", ["context", "contsep"])
def test_w8a8_engine_close_to_exact(rng, variant):
    """quant='w8a8' serving stays within ~1e-2-order of the exact fp32 engine
    (same order as bf16 serving) and keeps each variant's output contract."""
    cfg = SepformerConfig(variant=variant, ce=True, **TINY)
    model = Sepformer(cfg)
    mix = jnp.asarray(rng.standard_normal((2, 300)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 1, 24)).astype(np.float32))
    params = model.init(jax.random.key(0), mix, ctx)
    e0 = ServingEngine(cfg, params)
    e8 = ServingEngine(cfg, params, quant="w8a8")
    ref, got = e0(mix, ctx), e8(mix, ctx)
    outs = zip(ref, got) if variant == "contsep" else [(ref, got)]
    for r, g in outs:
        r, g = np.asarray(r), np.asarray(g)
        assert np.isfinite(g).all()
        rel = np.linalg.norm(g - r) / max(np.linalg.norm(r), 1e-12)
        assert rel < 5e-2, rel


def test_w8a8_refuses_training(rng):
    cfg = SepformerConfig(variant="context", **TINY)
    model = Sepformer(cfg)
    mix = jnp.asarray(rng.standard_normal((1, 300)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 1, 24)).astype(np.float32))
    params = model.init(jax.random.key(0), mix, ctx)
    with pytest.raises(AssertionError):
        sepformer_fused_forward(params, cfg, mix, ctx=ctx, train=True,
                                quant="w8a8")
