"""Flash attention kernel vs plain XLA attention: forward and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cse_tpu.ops.attention import flash_mhsa
pytestmark = pytest.mark.slow  # multi-minute on the 1-core box; excluded by -m 'not slow'



def _ref_attention(q, k, v):
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(dh).astype(q.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("L", [17, 128, 130])
def test_forward_matches_xla(rng, L):
    B, H, dh = 2, 2, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, L, dh)).astype(np.float32))
        for _ in range(3)
    )
    ours = flash_mhsa(q, k, v)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_grads_match_xla(rng):
    B, H, L, dh = 1, 2, 30, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, L, dh)).astype(np.float32))
        for _ in range(3)
    )

    def f_ours(q, k, v):
        return jnp.sum(flash_mhsa(q, k, v) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v) ** 2)

    g_ours = jax.grad(f_ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_model_flash_flag_matches(rng):
    """Sepformer with use_flash_attention=True == plain path."""
    from cse_tpu.models import Sepformer, SepformerConfig

    kw = dict(
        enc_channels=16, enc_kernel=8, enc_stride=4, d_model=16, nhead=4,
        d_ffn=32, num_tf_layers=1, num_dp_layers=1, chunk_size=10,
        llm_dim=24, pe_max_len=256, variant="context",
    )
    mix = jnp.asarray(rng.standard_normal((2, 300)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 1, 24)).astype(np.float32))
    m1 = Sepformer(SepformerConfig(**kw))
    params = m1.init(jax.random.key(0), mix, ctx)
    m2 = Sepformer(SepformerConfig(**kw, use_flash_attention=True))
    out1 = m1.apply(params, mix, ctx)
    out2 = m2.apply(params, mix, ctx)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5)


def test_flash_flag_actually_routes_to_kernel(rng, monkeypatch):
    """use_flash_attention must dispatch the Pallas kernel — an A==A output
    comparison passes even if the flag is silently dropped."""
    import cse_tpu.models.sepformer as sf
    from cse_tpu.models import Sepformer, SepformerConfig
    from cse_tpu.ops import attention as att

    calls = {"n": 0}
    real = att.flash_mhsa

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(att, "flash_mhsa", counting)
    monkeypatch.setattr(sf, "flash_mhsa", counting, raising=False)

    kw = dict(
        enc_channels=16, enc_kernel=8, enc_stride=4, d_model=16, nhead=4,
        d_ffn=32, num_tf_layers=1, num_dp_layers=1, chunk_size=10,
        llm_dim=24, pe_max_len=256, variant="context",
        use_flash_attention=True,
    )
    mix = jnp.asarray(rng.standard_normal((1, 300)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 1, 24)).astype(np.float32))
    m = Sepformer(SepformerConfig(**kw))
    params = m.init(jax.random.key(0), mix, ctx)
    m.apply(params, mix, ctx)
    assert calls["n"] > 0, "flash path never invoked despite use_flash_attention"
