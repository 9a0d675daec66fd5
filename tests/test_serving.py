"""ServingEngine (fused kernels) vs Sepformer.apply parity on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cse_tpu.models import Sepformer, SepformerConfig
from cse_tpu.serving import ServingEngine, sepformer_fused_forward

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
