"""Llama-3 JAX forward vs transformers (torch CPU) on a tiny random model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cse_tpu.models.llama import LlamaContextEncoder, llama_forward, load_llama_params


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = HFConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = LlamaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("llama")
    model.save_pretrained(str(d), safe_serialization=True)
    return model, str(d)


def _inputs():
    ids = np.array(
        [[1, 5, 9, 17, 33, 64], [0, 0, 1, 7, 21, 99]], dtype=np.int32
    )
    mask = np.array([[1, 1, 1, 1, 1, 1], [0, 0, 1, 1, 1, 1]], dtype=np.int32)
    return ids, mask


def test_hidden_state_parity(tiny_llama):
    model, path = tiny_llama
    params, cfg = load_llama_params(path, dtype=jnp.float32)
    ids, mask = _inputs()
    ours = np.asarray(llama_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    with torch.no_grad():
        ref = model.model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    # compare only valid (non-pad) positions
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], ref[m], rtol=2e-4, atol=2e-4)


def test_logits_parity(tiny_llama):
    model, path = tiny_llama
    params, cfg = load_llama_params(path, dtype=jnp.float32)
    ids, mask = _inputs()
    ours = np.asarray(
        llama_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg, return_logits=True)
    )
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).logits.numpy()
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], ref[m], rtol=3e-4, atol=3e-4)


def test_context_encoder_interface(tiny_llama):
    _, path = tiny_llama
    enc = LlamaContextEncoder(path, ctx_length=2, dtype=jnp.float32)
    ids, mask = _inputs()
    out = enc(jnp.asarray(ids), jnp.asarray(mask))
    assert out.shape == (2, 2, 32) and out.dtype == jnp.float32


def test_tensor_parallel_matches_single(tiny_llama):
    """TP-sharded forward over a 4-way model mesh == unsharded forward."""
    _, path = tiny_llama
    from cse_tpu.core.mesh import make_mesh

    params, cfg = load_llama_params(path, dtype=jnp.float32)
    ids, mask = _inputs()
    ref = np.asarray(llama_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg))

    mesh = make_mesh(n_data=2, n_model=4)
    params_tp, _ = load_llama_params(path, dtype=jnp.float32, mesh=mesh)
    out = np.asarray(
        jax.jit(lambda p, i, m: llama_forward(p, i, m, cfg))(
            params_tp, jnp.asarray(ids), jnp.asarray(mask)
        )
    )
    m = mask.astype(bool)
    np.testing.assert_allclose(out[m], ref[m], rtol=1e-4, atol=1e-4)


def test_int8_tensor_parallel_matches_single(tiny_llama):
    """int8 + TP mesh: the per-channel scales must shard along the OUTPUT
    axis only (replicated for row-sharded o/down whose shards hold partial
    sums over full dout) — device_put would reject the parent matrix spec."""
    _, path = tiny_llama
    from cse_tpu.core.mesh import make_mesh

    qparams, cfg = load_llama_params(path, dtype=jnp.float32, quant="int8")
    ids, mask = _inputs()
    ref = np.asarray(llama_forward(qparams, jnp.asarray(ids), jnp.asarray(mask), cfg))

    mesh = make_mesh(n_data=2, n_model=4)
    qparams_tp, _ = load_llama_params(path, dtype=jnp.float32, mesh=mesh, quant="int8")
    out = np.asarray(
        jax.jit(lambda p, i, m: llama_forward(p, i, m, cfg))(
            qparams_tp, jnp.asarray(ids), jnp.asarray(mask)
        )
    )
    m = mask.astype(bool)
    np.testing.assert_allclose(out[m], ref[m], rtol=1e-4, atol=1e-4)


def test_int8_quantized_hidden_states_close(tiny_llama):
    """int8 weight-only vs full-precision: hidden-state relative error < 1e-2
    on valid positions (VERDICT r2 'do this' #2's done-criterion), and the
    int8 leaves really are int8 with f32 per-output-channel scales."""
    _, path = tiny_llama
    params, cfg = load_llama_params(path, dtype=jnp.float32)
    qparams, _ = load_llama_params(path, dtype=jnp.float32, quant="int8")
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        leaf = qparams["layers"][name]
        assert leaf["w"].dtype == jnp.int8
        assert leaf["s"].dtype == jnp.float32
        assert leaf["s"].shape == (leaf["w"].shape[0], 1, leaf["w"].shape[2])
    assert qparams["embed"].dtype == jnp.float32  # embed/head not quantized

    ids, mask = _inputs()
    full = np.asarray(llama_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    q = np.asarray(llama_forward(qparams, jnp.asarray(ids), jnp.asarray(mask), cfg))
    m = mask.astype(bool)
    rel = np.linalg.norm(q[m] - full[m]) / np.linalg.norm(full[m])
    assert rel < 1e-2, rel


def test_int8_matches_explicit_dequant(tiny_llama):
    """Dequant-in-matmul == forward with explicitly dequantized (w*s) float
    weights: the fused form must be algebra, not approximation."""
    _, path = tiny_llama
    qparams, cfg = load_llama_params(path, dtype=jnp.float32, quant="int8")
    deq = dict(qparams)
    deq["layers"] = {
        k: (
            np.asarray(v["w"], np.float32) * np.asarray(v["s"])
            if isinstance(v, dict)
            else v
        )
        for k, v in qparams["layers"].items()
    }
    deq["layers"] = jax.tree.map(jnp.asarray, deq["layers"])
    ids, mask = _inputs()
    a = np.asarray(llama_forward(qparams, jnp.asarray(ids), jnp.asarray(mask), cfg))
    b = np.asarray(llama_forward(deq, jnp.asarray(ids), jnp.asarray(mask), cfg))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_int8_context_encoder_and_scorer(tiny_llama):
    """The encoder/scorer surfaces accept quant='int8' end to end."""
    _, path = tiny_llama
    enc = LlamaContextEncoder(path, ctx_length=2, dtype=jnp.float32, quant="int8")
    ids, mask = _inputs()
    out = enc(jnp.asarray(ids), jnp.asarray(mask))
    assert out.shape == (2, 2, 32)
    logits = enc.score_logits(jnp.asarray(ids), jnp.asarray(mask))
    assert logits.shape == (2, 6, 128)
    assert np.isfinite(np.asarray(logits)).all()


def test_w8a8_hidden_states_close(tiny_llama):
    """w8a8 (dynamic activation quant + int8 MXU matmul) vs full precision:
    the added activation error stays within the same 1e-2 relative bound on
    the tiny parity model, leaves carry the "w8" key that switches _mm to
    the int8 dot path, and scale shapes match the weight-only layout."""
    _, path = tiny_llama
    params, cfg = load_llama_params(path, dtype=jnp.float32)
    qparams, _ = load_llama_params(path, dtype=jnp.float32, quant="w8a8")
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        leaf = qparams["layers"][name]
        assert set(leaf) == {"w8", "s"}
        assert leaf["w8"].dtype == jnp.int8
        assert leaf["s"].shape == (leaf["w8"].shape[0], 1, leaf["w8"].shape[2])

    ids, mask = _inputs()
    full = np.asarray(llama_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    q = np.asarray(llama_forward(qparams, jnp.asarray(ids), jnp.asarray(mask), cfg))
    m = mask.astype(bool)
    rel = np.linalg.norm(q[m] - full[m]) / np.linalg.norm(full[m])
    assert rel < 1e-2, rel


def test_w8a8_mm_matches_numpy_oracle():
    """_mm_w8a8 == the same quantization written out in numpy float64:
    per-token symmetric max-scaling, int32 accumulation, two-scale dequant.
    The fused op must be exactly this algebra (one rounding), nothing more."""
    from cse_tpu.models.llama import _mm_w8a8

    rng = np.random.default_rng(3)
    h = rng.standard_normal((5, 16)).astype(np.float32)
    h[2] = 0.0  # all-zero token row: sa floor must not produce nan/inf
    w8 = rng.integers(-127, 128, (16, 24), dtype=np.int8)
    s = (rng.uniform(0.5, 2.0, (1, 24)) / 100).astype(np.float32)

    sa = np.maximum(np.max(np.abs(h), axis=-1, keepdims=True), 1e-12) / 127.0
    hq = np.round(h.astype(np.float64) / sa)
    assert np.abs(hq).max() <= 127  # no clip needed by construction
    expect = (hq @ w8.astype(np.float64)) * sa * s

    got = np.asarray(_mm_w8a8(jnp.asarray(h), jnp.asarray(w8), jnp.asarray(s)))
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)
    assert np.isfinite(got).all()


def test_w8a8_tensor_parallel_matches_single(tiny_llama):
    """w8a8 + TP mesh: the activation row-max crosses the sharded axis for
    the o/down inputs (GSPMD must reduce it globally) and the int32
    accumulators of contraction-sharded matmuls must all-reduce — sharded
    output == single-device output."""
    _, path = tiny_llama
    from cse_tpu.core.mesh import make_mesh

    qparams, cfg = load_llama_params(path, dtype=jnp.float32, quant="w8a8")
    ids, mask = _inputs()
    ref = np.asarray(llama_forward(qparams, jnp.asarray(ids), jnp.asarray(mask), cfg))

    mesh = make_mesh(n_data=2, n_model=4)
    qparams_tp, _ = load_llama_params(path, dtype=jnp.float32, mesh=mesh, quant="w8a8")
    out = np.asarray(
        jax.jit(lambda p, i, m: llama_forward(p, i, m, cfg))(
            qparams_tp, jnp.asarray(ids), jnp.asarray(mask)
        )
    )
    m = mask.astype(bool)
    np.testing.assert_allclose(out[m], ref[m], rtol=1e-4, atol=1e-4)


def test_w8a8_encoder_scorer_and_random_params(tiny_llama):
    """Surfaces accept quant='w8a8' end to end; random_llama_params emits the
    w8 layout directly (what bench --with_llm --llama_quant w8a8 stands up)."""
    _, path = tiny_llama
    enc = LlamaContextEncoder(path, ctx_length=2, dtype=jnp.float32, quant="w8a8")
    ids, mask = _inputs()
    out = enc(jnp.asarray(ids), jnp.asarray(mask))
    assert out.shape == (2, 2, 32)
    logits = enc.score_logits(jnp.asarray(ids), jnp.asarray(mask))
    assert np.isfinite(np.asarray(logits)).all()

    from cse_tpu.models.llama import LlamaConfig, random_llama_params

    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2)
    rp = random_llama_params(cfg, quant="w8a8", with_lm_head=False)
    assert set(rp["layers"]["q"]) == {"w8", "s"}
    h = llama_forward(rp, jnp.asarray(ids % 64), jnp.asarray(mask), cfg)
    assert np.isfinite(np.asarray(h)).all()
