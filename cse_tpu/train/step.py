"""Jitted train/eval steps for every CSE variant, data-parallel over a mesh.

One compiled SPMD program per variant contains: (optional) frozen-LLM context
prefill (stop_gradient), separator forward, loss, backward, clip, AdamW-amsgrad
update. Params/optimizer state are replicated; the batch is sharded over the
``data`` mesh axis; XLA inserts the gradient all-reduce from the sharding
annotations — the TPU-native replacement for the reference's DDP backward hook
(reference ``train_ContSep.py:276-280,396-419``).

Loss surface per variant (SURVEY.md §2.2):
* contsep:  ctx_weight * selector(BCE|CE vs SI-SNR-argmax label) + PIT SI-SNR
            (reference ``train_ContSep.py:346-394``)
* context:  -SI-SNR on stream 0 (reference ``train_ContExt.py:366-367``)
* hcontext: same, with ECAPA cue + stochastic cue dropout drawn per step
            (joint 0.3 / history 0.35 / voice 0.35, reference ``ContExt.py:96-111``)
* base:     PIT SI-SNR only (pretraining objective)

Non-finite guard: the reference skips updates on non-finite grad norms and
(ContExt) non-finite losses; here optax.apply_if_finite rejects any update
containing non-finite values, covering both.
"""

from __future__ import annotations

import dataclasses

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from cse_tpu.core import mesh as mesh_lib
from cse_tpu.ops.losses import ctx_selection_loss, pit_si_snr_loss, si_snr


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    variant: str = "context"  # 'base' | 'contsep' | 'context' | 'hcontext'
    num_spks: int = 2
    ctx_weight: float = 1.0
    use_ce: bool = True


def _sample_cue(rng: jax.Array) -> jax.Array:
    """H-ContExt per-step cue draw: two independent uniforms, as in the
    reference's double random.random() (joint 0.3 / history 0.35 / voice 0.35)."""
    r = jax.random.uniform(rng, (2,))
    return jnp.where(r[0] < 0.3, 0, jnp.where((r[1] >= 0.3) & (r[1] < 0.8), 1, 2))


def make_loss_fn(
    model, cfg: TrainConfig, llm_apply: Callable | None = None, fused: bool = False
):
    """Build loss(params, batch, rng, llm_params=None) -> (loss, metrics).

    ``batch`` keys: mixed [B,T], gt [B,T], noises [B,T,spk-1] (contsep/base),
    ctx_feat [B,Tc,llm_dim] (or context_ids/context_mask when llm_apply is
    given), se [B,1,192] (hcontext). With ``fused=True`` the separator runs
    through the fused-kernel forward (Pallas fwd+bwd stacks, ~2x faster on
    v5e) instead of model.apply — identical parameters and math.

    ``llm_apply`` is a PURE function ``(llm_params, ids, mask) -> feats``:
    the frozen-LLM weights arrive through ``llm_params`` (threaded as a real
    argument of the enclosing jit by make_train_step/make_eval_step), never
    as trace-captured closure constants — closing over the 8 GB int8 Llama
    would embed it into the lowered module (XLA "captured constants"),
    doubling its HBM footprint and stalling compilation.
    """
    if fused:
        from cse_tpu.serving import sepformer_fused_forward

        def apply_fn(params, mix, ctx=None, **kw):
            return sepformer_fused_forward(
                params, model.cfg, mix, ctx=ctx, train=True, **kw
            )
    else:
        def apply_fn(params, mix, ctx=None, **kw):
            if ctx is None:
                return model.apply(params, mix, **kw)
            return model.apply(params, mix, ctx, **kw)

    def get_ctx(batch, llm_params):
        if llm_apply is not None:
            feats = llm_apply(llm_params, batch["context_ids"],
                              batch["context_mask"])
            return jax.lax.stop_gradient(feats)
        return batch.get("ctx_feat")

    def loss_fn(params, batch, rng, llm_params=None):
        mixed, gt = batch["mixed"], batch["gt"]
        metrics: dict[str, Any] = {}

        if cfg.variant == "base":
            est = apply_fn(params, mixed)
            targets = jnp.concatenate([gt[:, :, None], batch["noises"]], axis=-1)
            loss = jnp.mean(pit_si_snr_loss(est, targets))
            metrics["snr_loss"] = loss
            return loss, metrics

        ctx = get_ctx(batch, llm_params)

        if cfg.variant == "contsep":
            est, logits = apply_fn(params, mixed, ctx)
            # selection label: stream with highest SI-SNR vs gt (no grad)
            stream_snr = jax.lax.stop_gradient(
                si_snr(est.transpose(0, 2, 1), gt[:, None, :])
            )  # [B, spk]
            label = jnp.argmax(stream_snr, axis=-1)
            ctx_loss = ctx_selection_loss(logits, label, cfg.use_ce)
            targets = jnp.concatenate([gt[:, :, None], batch["noises"]], axis=-1)
            snr_loss = jnp.mean(pit_si_snr_loss(est, targets))
            loss = cfg.ctx_weight * ctx_loss + snr_loss
            pred = (
                jnp.argmax(logits, axis=-1)
                if cfg.use_ce
                else (logits[:, 0] > 0).astype(jnp.int32)
            )
            metrics.update(
                snr_loss=snr_loss,
                ctx_loss=ctx_loss,
                ctx_acc=jnp.mean((pred == label).astype(jnp.float32)),
            )
            return loss, metrics

        # context / hcontext: extract stream 0
        kwargs = {}
        if cfg.variant == "hcontext":
            kwargs = dict(se=batch["se"], cue_index=_sample_cue(rng))
        est = apply_fn(params, mixed, ctx, **kwargs)
        loss = -jnp.mean(si_snr(est[:, :, 0], gt))
        metrics["snr_loss"] = loss
        return loss, metrics

    return loss_fn


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    cfg: TrainConfig,
    mesh=None,
    llm_apply: Callable | None = None,
    llm_params=None,
    fused: bool = False,
):
    """Compile the SPMD train step.

    Returns step(params, opt_state, batch, rng) -> (params, opt_state, metrics).
    With ``mesh``, the batch is consumed sharded over the data axis and
    params/opt state stay replicated (donated in-place).

    ``llm_params`` (the frozen-LLM weight pytree fed to ``llm_apply``) is
    threaded as a runtime argument of the jitted program — its sharding is
    inherited from the arrays themselves (TP over the ``model`` axis stays
    TP), and it is never baked into the executable as a captured constant.
    """
    loss_fn = make_loss_fn(model, cfg, llm_apply, fused=fused)

    def step(params, opt_state, batch, rng, llm_params):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng, llm_params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    if mesh is None:
        jitted = jax.jit(step, donate_argnums=(0, 1))
    else:
        repl = mesh_lib.replicated(mesh)
        data = mesh_lib.data_sharded(mesh)
        jitted = jax.jit(
            step,
            donate_argnums=(0, 1),
            # None: inherit the llm pytree's own (possibly TP) shardings
            in_shardings=(repl, repl, data, repl, None),
            out_shardings=(repl, repl, repl),
        )

    def wrapped(params, opt_state, batch, rng):
        return jitted(params, opt_state, batch, rng, llm_params)

    return wrapped


def make_eval_step(model, cfg: TrainConfig, llm_apply: Callable | None = None,
                   llm_params=None, cue: str = "joint", fused: bool = False):
    """Compiled inference step -> (enhanced [B, T], aux metrics).

    ContSep picks the stream via the selector head (sigmoid/softmax argmax,
    reference ``test.py:233-239``); context variants return stream 0.
    ``fused=True`` routes the separator forward through the fused-kernel
    serving path (``serving.sepformer_fused_forward``, ~1.5x on v5e,
    fp32-parity-tested) — metrics within tolerance of the XLA path.
    """
    cue_idx = {"joint": 0, "history": 1, "voice": 2}[cue]

    if fused:
        from cse_tpu.serving import sepformer_fused_forward

        def apply_fn(params, mix, *args, **kw):
            ctx = args[0] if args else kw.pop("ctx", None)
            if ctx is not None:
                kw["ctx"] = ctx
            return sepformer_fused_forward(params, model.cfg, mix, **kw)
    else:
        def apply_fn(params, mix, *args, **kw):
            return model.apply(params, mix, *args, **kw)

    def step(params, batch, llm_params):
        mixed = batch["mixed"]
        if cfg.variant == "base":
            est = apply_fn(params, mixed)  # [B, T, spk]
            aux = {}
            if "gt" in batch:
                # oracle-best stream (pretraining validation metric)
                stream_snr = si_snr(est.transpose(0, 2, 1), batch["gt"][:, None, :])
                best = jnp.argmax(stream_snr, axis=-1)
                return (
                    jnp.take_along_axis(est, best[:, None, None], axis=-1)[:, :, 0],
                    aux,
                )
            return est[:, :, 0], aux
        if llm_apply is not None:
            ctx = llm_apply(llm_params, batch["context_ids"],
                            batch["context_mask"])
        else:
            ctx = batch.get("ctx_feat")
        if cfg.variant == "contsep":
            est, logits = apply_fn(params, mixed, ctx)
            pred = (
                jnp.argmax(logits, axis=-1)
                if cfg.use_ce
                else (logits[:, 0] > 0).astype(jnp.int32)
            )
            enhanced = jnp.take_along_axis(est, pred[:, None, None], axis=-1)[:, :, 0]
            # oracle label: stream with highest SI-SNR vs gt (for ctx_acc logs)
            aux = {"ctx_pred": pred}
            if "gt" in batch:
                stream_snr = si_snr(est.transpose(0, 2, 1), batch["gt"][:, None, :])
                aux["ctx_label"] = jnp.argmax(stream_snr, axis=-1)
            return enhanced, aux
        kwargs = {}
        if cfg.variant == "hcontext":
            kwargs = dict(se=batch["se"], cue_index=jnp.asarray(cue_idx))
        est = apply_fn(params, mixed, ctx, **kwargs)
        return est[:, :, 0], {}

    jitted = jax.jit(step)

    def wrapped(params, batch):
        return jitted(params, batch, llm_params)

    return wrapped
