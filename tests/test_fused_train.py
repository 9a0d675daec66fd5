"""Fused training kernel: forward + hand-written backward vs jax autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cse_tpu.ops.fused_train import W_NAMES, fused_layers
pytestmark = pytest.mark.slow  # multi-minute on the 1-core box; excluded by -m 'not slow'


D, H, FFN, NL, L, G = 32, 4, 64, 2, 24, 3
Lp = 128  # padded


def _ref_layers(x, w, n_layers, nhead, L):
    """Pure-jnp replica of the fused kernel math (fp32)."""
    hd = D // nhead
    kmask = (jnp.arange(x.shape[1]) < L)[None, None, :]

    def ln(x, s, b):
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-6) * s + b

    for li in range(n_layers):
        h = ln(x, w["ln1_s"][li], w["ln1_b"][li])
        qkv = h @ w["qkv_w"][li] + w["qkv_b"][li]
        cols = []
        for hh in range(nhead):
            q = qkv[:, :, hh * hd : (hh + 1) * hd]
            k = qkv[:, :, D + hh * hd : D + (hh + 1) * hd]
            v = qkv[:, :, 2 * D + hh * hd : 2 * D + (hh + 1) * hd]
            s = jnp.einsum("gqd,gkd->gqk", q, k) / np.sqrt(hd)
            s = jnp.where(kmask, s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            cols.append(jnp.einsum("gqk,gkd->gqd", p, v))
        attn = jnp.concatenate(cols, -1)
        x = x + attn @ w["out_w"][li] + w["out_b"][li]
        h = ln(x, w["ln2_s"][li], w["ln2_b"][li])
        x = x + jnp.maximum(h @ w["f1_w"][li] + w["f1_b"][li], 0) @ w["f2_w"][li] + w["f2_b"][li]
    return x


@pytest.fixture
def setup(rng):
    w = {
        "qkv_w": rng.standard_normal((NL, D, 3 * D)) * 0.1,
        "qkv_b": rng.standard_normal((NL, 3 * D)) * 0.01,
        "out_w": rng.standard_normal((NL, D, D)) * 0.1,
        "out_b": rng.standard_normal((NL, D)) * 0.01,
        "ln1_s": np.ones((NL, D)) + 0.1 * rng.standard_normal((NL, D)),
        "ln1_b": 0.01 * rng.standard_normal((NL, D)),
        "ln2_s": np.ones((NL, D)) + 0.1 * rng.standard_normal((NL, D)),
        "ln2_b": 0.01 * rng.standard_normal((NL, D)),
        "f1_w": rng.standard_normal((NL, D, FFN)) * 0.1,
        "f1_b": 0.01 * rng.standard_normal((NL, FFN)),
        "f2_w": rng.standard_normal((NL, FFN, D)) * 0.1,
        "f2_b": 0.01 * rng.standard_normal((NL, D)),
    }
    w = {k: jnp.asarray(v, jnp.float32) for k, v in w.items()}
    x = jnp.asarray(
        np.pad(rng.standard_normal((G, L, D)), ((0, 0), (0, Lp - L), (0, 0))),
        jnp.float32,
    )
    return x, w


def test_forward_matches(setup):
    x, w = setup
    got = fused_layers(x, w, NL, H, L)
    ref = _ref_layers(x, w, NL, H, L)
    np.testing.assert_allclose(
        np.asarray(got)[:, :L], np.asarray(ref)[:, :L], rtol=1e-4, atol=1e-4
    )


def test_gradients_match(setup):
    x, w = setup
    mask = (jnp.arange(Lp) < L)[None, :, None]

    def loss_fused(x, w):
        y = fused_layers(x, w, NL, H, L) * mask
        return jnp.sum(y * jnp.sin(y))

    def loss_ref(x, w):
        y = _ref_layers(x, w, NL, H, L) * mask
        return jnp.sum(y * jnp.sin(y))

    (gx, gw) = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    (rx, rw) = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(gx)[:, :L], np.asarray(rx)[:, :L], rtol=2e-3, atol=2e-3
    )
    for k in W_NAMES:
        np.testing.assert_allclose(
            np.asarray(gw[k]), np.asarray(rw[k]), rtol=2e-3, atol=2e-3, err_msg=k
        )


def test_full_train_step_fused_matches_xla(rng):
    """Fused-kernel loss/grads == XLA model.apply loss/grads (ContExt, fp32)."""
    import jax
    from cse_tpu.models import Sepformer, SepformerConfig
    from cse_tpu.train.step import TrainConfig, make_loss_fn

    cfg = SepformerConfig(
        variant="context", num_spks=2, enc_channels=32, enc_kernel=8,
        enc_stride=4, d_model=32, nhead=4, d_ffn=64, num_tf_layers=2,
        num_dp_layers=1, chunk_size=16, llm_dim=24, pe_max_len=256,
        compute_dtype=jnp.float32,
    )
    model = Sepformer(cfg)
    B, T = 2, 400
    batch = {
        "mixed": jnp.asarray(rng.standard_normal((B, T)).astype(np.float32)),
        "gt": jnp.asarray(rng.standard_normal((B, T)).astype(np.float32)),
        "ctx_feat": jnp.asarray(rng.standard_normal((B, 1, 24)).astype(np.float32)),
    }
    params = model.init(jax.random.key(0), batch["mixed"], batch["ctx_feat"])
    tcfg = TrainConfig(variant="context")
    key = jax.random.key(1)
    for fused in (False, True):
        fn = make_loss_fn(model, tcfg, fused=fused)
        loss, _ = fn(params, batch, key)
        grads = jax.grad(lambda p: fn(p, batch, key)[0])(params)
        if fused:
            assert abs(float(loss) - ref_loss) < 1e-3, (float(loss), ref_loss)
            for (ka, a), (kb, b) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(grads), key=lambda t: str(t[0])),
                sorted(ref_grads, key=lambda t: str(t[0])),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4, err_msg=str(ka)
                )
        else:
            ref_loss = float(loss)
            ref_grads = jax.tree_util.tree_leaves_with_path(grads)


@pytest.mark.parametrize("variant", ["contsep", "hcontext"])
def test_fused_loss_other_variants(rng, variant):
    """Fused loss == XLA loss for the selector and speaker-cue variants."""
    import jax
    from cse_tpu.models import Sepformer, SepformerConfig
    from cse_tpu.train.step import TrainConfig, make_loss_fn

    cfg = SepformerConfig(
        variant="context" if variant == "hcontext" else variant,
        add_se=variant == "hcontext", num_spks=2, enc_channels=32,
        enc_kernel=8, enc_stride=4, d_model=32, nhead=4, d_ffn=64,
        num_tf_layers=1, num_dp_layers=1, chunk_size=16, llm_dim=24,
        se_dim=12, pe_max_len=256, compute_dtype=jnp.float32, ce=True,
    )
    model = Sepformer(cfg)
    B, T = 2, 400
    batch = {
        "mixed": jnp.asarray(rng.standard_normal((B, T)).astype(np.float32)),
        "gt": jnp.asarray(rng.standard_normal((B, T)).astype(np.float32)),
        "ctx_feat": jnp.asarray(rng.standard_normal((B, 1, 24)).astype(np.float32)),
    }
    init_kw = {}
    if variant == "contsep":
        batch["noises"] = jnp.asarray(rng.standard_normal((B, T, 1)).astype(np.float32))
    if variant == "hcontext":
        batch["se"] = jnp.asarray(rng.standard_normal((B, 1, 12)).astype(np.float32))
        init_kw = dict(se=batch["se"], cue_index=jnp.asarray(0))
    params = model.init(jax.random.key(0), batch["mixed"], batch["ctx_feat"], **init_kw)
    tcfg = TrainConfig(variant=variant, use_ce=True)
    key = jax.random.key(7)
    fn_ref = make_loss_fn(model, tcfg)
    fn_fused = make_loss_fn(model, tcfg, fused=True)
    l_ref, _ = fn_ref(params, batch, key)
    l_fused, _ = fn_fused(params, batch, key)
    assert abs(float(l_ref) - float(l_fused)) < 2e-3, (float(l_ref), float(l_fused))
    # gradient parity too: the selector head (pred_head -> context_selector)
    # and the se_embedding/cue-concat paths have fused-specific wiring that a
    # loss-only check cannot validate
    g_ref = jax.grad(lambda p: fn_ref(p, batch, key)[0])(params)
    g_fused = jax.grad(lambda p: fn_fused(p, batch, key)[0])(params)
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_fused), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g_ref), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4, err_msg=str(ka)
        )


def test_fused_vs_xla_loss_trajectory_50_steps(rng):
    """N-step (50) trajectory equivalence at bf16: full optimizer-in-the-loop
    training with the fused Pallas path tracks the XLA path step for step
    (max relative deviation < 5e-2) and both curves actually descend — the
    evidence required to ship fused as the default trainer (VERDICT r2
    'do this' #3)."""
    import jax
    from cse_tpu.models import Sepformer, SepformerConfig
    from cse_tpu.train.optimizer import build_optimizer
    from cse_tpu.train.schedules import cosine_warmup_schedule
    from cse_tpu.train.step import TrainConfig, make_train_step

    cfg = SepformerConfig(
        variant="context", num_spks=2, enc_channels=32, enc_kernel=8,
        enc_stride=4, d_model=32, nhead=4, d_ffn=64, num_tf_layers=2,
        num_dp_layers=1, chunk_size=16, llm_dim=24, pe_max_len=256,
        compute_dtype=jnp.bfloat16,
    )
    model = Sepformer(cfg)
    B, T, N = 2, 400, 50
    batch = {
        "mixed": jnp.asarray(rng.standard_normal((B, T)).astype(np.float32)),
        "gt": jnp.asarray(rng.standard_normal((B, T)).astype(np.float32)),
        "ctx_feat": jnp.asarray(rng.standard_normal((B, 1, 24)).astype(np.float32)),
    }
    params0 = model.init(jax.random.key(0), batch["mixed"], batch["ctx_feat"])
    tx = build_optimizer(cosine_warmup_schedule(1e-3, 1000, 10))
    curves = {}
    for fused in (False, True):
        step = make_train_step(model, tx, TrainConfig(variant="context"), fused=fused)
        p = jax.tree.map(lambda x: x.copy(), params0)  # steps donate their inputs
        opt = tx.init(p)
        losses = []
        for i in range(N):
            p, opt, m = step(p, opt, batch, jax.random.key(1 + i))
            losses.append(float(m["loss"]))
        curves[fused] = np.asarray(losses)
    xla, fus = curves[False], curves[True]
    assert np.isfinite(xla).all() and np.isfinite(fus).all()
    dev = np.abs(xla - fus) / (1.0 + np.abs(xla))
    assert dev.max() < 5e-2, (dev.max(), dev.argmax())
    # both curves must actually train (same single batch => loss collapses)
    assert xla[-5:].mean() < 0.5 * xla[:5].mean()
    assert fus[-5:].mean() < 0.5 * fus[:5].mean()
