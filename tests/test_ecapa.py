"""ECAPA-TDNN: shape/invariant tests + importer key-mapping roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

from cse_tpu.models.ecapa import (
    EcapaEncoder,
    ecapa_forward,
    ecapa_from_state_dict,
    log_mel_fbank,
    random_ecapa_params,
)


def test_fbank_shape_and_norm(rng):
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    f = log_mel_fbank(wav)
    assert f.shape == (2, 1 + (16000 - 400) // 160, 80)
    np.testing.assert_allclose(np.asarray(f).mean(axis=1), 0.0, atol=1e-4)


def test_forward_shapes_small(rng):
    # scaled-down config for CPU speed
    params = random_ecapa_params(None, channels=64, emb=16)
    wav = jnp.asarray(rng.standard_normal((3, 8000)).astype(np.float32))
    emb = ecapa_forward(jax.tree.map(jnp.asarray, params), wav)
    assert emb.shape == (3, 16)
    assert np.isfinite(np.asarray(emb)).all()


def test_embedding_discriminative(rng):
    """Same-signal crops should be closer than different signals."""
    params = jax.tree.map(jnp.asarray, random_ecapa_params(None, channels=64, emb=16))
    t = np.arange(24000) / 16000
    a = np.sin(2 * np.pi * 120 * t).astype(np.float32)
    b = rng.standard_normal(24000).astype(np.float32)
    batch = jnp.asarray(np.stack([a[:16000], a[8000:24000], b[:16000]]))
    e = np.asarray(ecapa_forward(params, batch))
    e = e / np.linalg.norm(e, axis=-1, keepdims=True)
    same = float(e[0] @ e[1])
    diff = float(e[0] @ e[2])
    assert same > diff


def test_importer_roundtrip_shapes():
    """A synthetic speechbrain-style state_dict maps onto the param tree."""
    C, n_mels, emb, scale, att = 64, 80, 16, 8, 32
    hidden = C // scale
    sd = {}

    def add_tdnn(prefix, k, cin, cout):
        sd[f"{prefix}.conv.conv.weight"] = np.random.randn(cout, cin, k).astype(np.float32)
        sd[f"{prefix}.conv.conv.bias"] = np.zeros(cout, np.float32)
        for stat, val in (
            ("weight", np.ones(cout)), ("bias", np.zeros(cout)),
            ("running_mean", np.zeros(cout)), ("running_var", np.ones(cout)),
        ):
            sd[f"{prefix}.norm.norm.{stat}"] = val.astype(np.float32)

    add_tdnn("blocks.0", 5, n_mels, C)
    for li in range(1, 4):
        add_tdnn(f"blocks.{li}.tdnn1", 1, C, C)
        add_tdnn(f"blocks.{li}.tdnn2", 1, C, C)
        for i in range(scale - 1):
            add_tdnn(f"blocks.{li}.res2net_block.blocks.{i}", 3, hidden, hidden)
        sd[f"blocks.{li}.se_block.conv1.conv.weight"] = np.random.randn(att, C, 1).astype(np.float32)
        sd[f"blocks.{li}.se_block.conv1.conv.bias"] = np.zeros(att, np.float32)
        sd[f"blocks.{li}.se_block.conv2.conv.weight"] = np.random.randn(C, att, 1).astype(np.float32)
        sd[f"blocks.{li}.se_block.conv2.conv.bias"] = np.zeros(C, np.float32)
    cat = 3 * C
    sd["mfa.conv.conv.weight"] = np.random.randn(cat, cat, 1).astype(np.float32)
    sd["mfa.conv.conv.bias"] = np.zeros(cat, np.float32)
    add_tdnn("asp.tdnn", 1, cat * 3, att)
    sd["asp.conv.conv.weight"] = np.random.randn(cat, att, 1).astype(np.float32)
    sd["asp.conv.conv.bias"] = np.zeros(cat, np.float32)
    for stat, val in (
        ("weight", np.ones(cat * 2)), ("bias", np.zeros(cat * 2)),
        ("running_mean", np.zeros(cat * 2)), ("running_var", np.ones(cat * 2)),
    ):
        sd[f"asp_bn.norm.{stat}"] = val.astype(np.float32)
    sd["fc.conv.conv.weight"] = np.random.randn(emb, cat * 2, 1).astype(np.float32)

    params = ecapa_from_state_dict(sd)
    enc = EcapaEncoder(params=params)
    out = enc(jnp.zeros((1, 8000)))
    assert out.shape == (1, 1, emb)
