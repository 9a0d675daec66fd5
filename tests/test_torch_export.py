"""Export -> import roundtrip: flax params -> torch .ckpt -> flax params."""

import jax
import jax.numpy as jnp
import numpy as np

from cse_tpu.compat.torch_export import save_torch_checkpoint, sepformer_to_state_dict
from cse_tpu.compat.torch_import import sepformer_from_state_dict
from cse_tpu.models import Sepformer, SepformerConfig

TINY = dict(
    enc_channels=16, enc_kernel=8, enc_stride=4, d_model=16, nhead=4, d_ffn=32,
    num_tf_layers=2, num_dp_layers=2, chunk_size=10, llm_dim=24, se_dim=12,
    pe_max_len=256,
)


def test_roundtrip_identity(rng):
    model = Sepformer(SepformerConfig(variant="contsep", ce=True, **TINY))
    mix = jnp.asarray(rng.standard_normal((1, 200)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 1, 24)).astype(np.float32))
    params = model.init(jax.random.key(0), mix, ctx)
    sd = sepformer_to_state_dict(params)
    back = sepformer_from_state_dict(sd, num_dp_layers=2, num_tf_layers=2)
    a_flat = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(params)}
    b_flat = {str(k): v for k, v in jax.tree_util.tree_leaves_with_path(back)}
    assert a_flat.keys() == b_flat.keys()
    for k in a_flat:
        np.testing.assert_allclose(
            np.asarray(a_flat[k]), np.asarray(b_flat[k]), atol=0, err_msg=k
        )
    # outputs identical too
    o1 = model.apply(params, mix, ctx)
    o2 = model.apply(back, mix, ctx)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]), atol=1e-6)


def test_torch_file_roundtrip(tmp_path, rng):
    import torch

    model = Sepformer(SepformerConfig(variant="context", add_se=True, **TINY))
    mix = jnp.asarray(rng.standard_normal((1, 200)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 1, 24)).astype(np.float32))
    se = jnp.asarray(rng.standard_normal((1, 1, 12)).astype(np.float32))
    params = model.init(jax.random.key(0), mix, ctx, se=se, cue_index=jnp.asarray(0))
    p = str(tmp_path / "export.ckpt")
    save_torch_checkpoint(p, params, step=42, epoch=3)
    blob = torch.load(p, weights_only=False)
    assert blob["step"] == 42 and "se_embedding.weight" in blob["state_dict"]
    from cse_tpu.train.checkpoint import restore_checkpoint

    restored = restore_checkpoint(p)
    back = sepformer_from_state_dict(restored["state_dict"], 2, 2)
    o1 = model.apply(params, mix, ctx, se=se, cue_index=jnp.asarray(0))
    o2 = model.apply(back, mix, ctx, se=se, cue_index=jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
