"""Mechanics check for the asset-gated suite: fabricate the
``scripts/fetch_assets.sh`` layout with RANDOM weights in the released
formats, point ``test_real_assets`` at it, and run every gated test. The day
real assets appear, the suite is known-good — it cannot fail for plumbing
reasons, only for genuine weight/protocol mismatches.

(Trained-weights-only assertions are relaxed via CSE_ASSETS_SELFTEST=1,
see ``test_real_assets._SELFTEST``.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def fake_assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("assets")
    for sub in ("sepformer", "llama3-8b", "ecapa", "whisper"):
        os.makedirs(root / sub, exist_ok=True)

    # --- released-layout Sepformer ckpt: full-size base variant, exported
    # through our own reference-key exporter then torch.save'd like the
    # reference trainer does
    from cse_tpu.compat.torch_export import sepformer_to_state_dict
    from cse_tpu.models import Sepformer, SepformerConfig

    model = Sepformer(SepformerConfig(variant="base", num_spks=2))
    params = model.init(jax.random.key(0), jnp.zeros((1, 2000)))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          sepformer_to_state_dict(params).items()}
    torch.save({"state_dict": sd, "step": 0, "epoch": 0},
               root / "sepformer" / "Sepformer_dailytalk.ckpt")

    # --- tiny HF llama checkout (the importer only needs config + tensors)
    from transformers import LlamaConfig as HFConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(HFConfig(
        vocab_size=128320, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
        attn_implementation="eager",
    )).eval()
    hf.save_pretrained(str(root / "llama3-8b"), safe_serialization=True)

    # --- speechbrain-layout ECAPA at the released dims (C=1024, emb=192)
    from test_ecapa import _TorchEcapa, _randomize_bn

    g = torch.Generator().manual_seed(0)
    ecapa = _TorchEcapa(n_mels=80, C=1024, scale=8, att=128, emb=192).eval()
    _randomize_bn(ecapa, g)
    torch.save(ecapa.state_dict(), root / "ecapa" / "embedding_model.ckpt")

    # --- OpenAI-layout whisper sd at base dims (random weights)
    from cse_tpu.models.whisper import WhisperConfig

    cfg = WhisperConfig()
    rng = np.random.default_rng(0)
    sd = {}

    def lin(name, din, dout, bias=True):
        sd[f"{name}.weight"] = torch.from_numpy(
            (rng.standard_normal((dout, din)) * 0.02).astype(np.float32))
        if bias:
            sd[f"{name}.bias"] = torch.zeros(dout)

    def ln(name, d=cfg.n_audio_state):
        sd[f"{name}.weight"] = torch.ones(d)
        sd[f"{name}.bias"] = torch.zeros(d)

    D = cfg.n_audio_state
    sd["encoder.conv1.weight"] = torch.from_numpy(
        (rng.standard_normal((D, cfg.n_mels, 3)) * 0.02).astype(np.float32))
    sd["encoder.conv1.bias"] = torch.zeros(D)
    sd["encoder.conv2.weight"] = torch.from_numpy(
        (rng.standard_normal((D, D, 3)) * 0.02).astype(np.float32))
    sd["encoder.conv2.bias"] = torch.zeros(D)
    for i in range(cfg.n_audio_layer):
        ln(f"encoder.blocks.{i}.attn_ln")
        for nm, b in (("query", True), ("key", False), ("value", True), ("out", True)):
            lin(f"encoder.blocks.{i}.attn.{nm}", D, D, b)
        ln(f"encoder.blocks.{i}.mlp_ln")
        lin(f"encoder.blocks.{i}.mlp.0", D, 4 * D)
        lin(f"encoder.blocks.{i}.mlp.2", 4 * D, D)
    ln("encoder.ln_post")
    sd["decoder.token_embedding.weight"] = torch.from_numpy(
        (rng.standard_normal((cfg.n_vocab, D)) * 0.02).astype(np.float32))
    sd["decoder.positional_embedding"] = torch.from_numpy(
        (rng.standard_normal((cfg.n_text_ctx, D)) * 0.02).astype(np.float32))
    for i in range(cfg.n_text_layer):
        for pre in ("attn", "cross_attn"):
            ln(f"decoder.blocks.{i}.{pre}_ln")
            for nm, b in (("query", True), ("key", False), ("value", True), ("out", True)):
                lin(f"decoder.blocks.{i}.{pre}.{nm}", D, D, b)
        ln(f"decoder.blocks.{i}.mlp_ln")
        lin(f"decoder.blocks.{i}.mlp.0", D, 4 * D)
        lin(f"decoder.blocks.{i}.mlp.2", 4 * D, D)
    ln("decoder.ln")
    torch.save({"model_state_dict": sd, "dims": {}}, root / "whisper" / "base.pt")
    return str(root)


@pytest.mark.slow  # ~55 s incl. fixture on the 1-core box
def test_gated_suite_runs_on_fabricated_assets(fake_assets, monkeypatch):
    import test_real_assets as ra

    monkeypatch.setattr(ra, "ASSETS", fake_assets)
    monkeypatch.setattr(ra, "_SELFTEST", True)
    ra.test_released_sepformer_checkpoints_import_and_run()
    ra.test_real_ecapa_embeds_speech()
    ra.test_real_whisper_transcribes_and_gates()
    ra.test_real_llama_loads_and_int8_matches()
    # tokenizer files deliberately absent -> that test must SKIP, not crash
    with pytest.raises(pytest.skip.Exception):
        ra.test_real_llama_tokenizer_loads()
