"""Import released PyTorch checkpoints into cse_tpu parameter pytrees.

The reference releases ``.ckpt`` files written by ``torch.save`` with a flat
``state_dict`` (reference ``train_ContSep.py:488-497``; key layout set by
``src/models/ContSep.py`` / ``ContExt.py`` + the speechbrain lobes they
instantiate). This module maps those keys onto the flax parameter tree of
:class:`cse_tpu.models.sepformer.Sepformer` so released weights run unchanged
on TPU — the "checkpoint formats stay consumable" requirement.

Layout conventions translated:
* torch Linear weight [out, in]        -> flax Dense kernel [in, out]
* torch Conv1d weight [out, in, k]     -> flax Conv kernel [k, in, out]
* torch ConvTranspose1d [in, out, k]   -> flax ConvTranspose kernel [k, in, out]
* torch packed MHA in_proj [3D, D]     -> [D, 3D]
* 1x1 convs (kernel dims squeezed)     -> Dense kernels
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w, dtype=np.float32))


def load_torch_checkpoint(path: str) -> dict[str, Any]:
    """torch.load a reference .ckpt and return its raw dict
    (state_dict / optimizer_state_dict / scheduler_state_dict / step / epoch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" not in ckpt:  # allow bare state_dicts too
        ckpt = {"state_dict": ckpt}
    ckpt["state_dict"] = {
        k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        for k, v in ckpt["state_dict"].items()
    }
    return ckpt


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _transformer_stack(sd: Mapping[str, np.ndarray], prefix: str, num_layers: int) -> dict:
    """Map one SBTransformerBlock_CSE (prefix like
    'masknet.dual_mdl.0.intra_mdl') to a TransformerStack param subtree."""
    out: dict = {}
    for j in range(num_layers):
        lp = f"{prefix}.mdl.layers.{j}"
        layer = {
            "self_att": {
                "in_proj_kernel": _t(sd[f"{lp}.self_att.att.in_proj_weight"]).T,
                "in_proj_bias": _t(sd[f"{lp}.self_att.att.in_proj_bias"]),
                "out_proj_kernel": _t(sd[f"{lp}.self_att.att.out_proj.weight"]).T,
                "out_proj_bias": _t(sd[f"{lp}.self_att.att.out_proj.bias"]),
            },
            "norm1": {
                "scale": _t(sd[f"{lp}.norm1.norm.weight"]),
                "bias": _t(sd[f"{lp}.norm1.norm.bias"]),
            },
            "norm2": {
                "scale": _t(sd[f"{lp}.norm2.norm.weight"]),
                "bias": _t(sd[f"{lp}.norm2.norm.bias"]),
            },
            "ffn_1": {
                "kernel": _t(sd[f"{lp}.pos_ffn.ffn.0.weight"]).T,
                "bias": _t(sd[f"{lp}.pos_ffn.ffn.0.bias"]),
            },
            "ffn_2": {
                "kernel": _t(sd[f"{lp}.pos_ffn.ffn.3.weight"]).T,
                "bias": _t(sd[f"{lp}.pos_ffn.ffn.3.bias"]),
            },
        }
        out[f"layer_{j}"] = layer
    out["norm"] = {
        "scale": _t(sd[f"{prefix}.mdl.norm.norm.weight"]),
        "bias": _t(sd[f"{prefix}.mdl.norm.norm.bias"]),
    }
    return out


def sepformer_from_state_dict(
    sd: Mapping[str, np.ndarray],
    num_dp_layers: int = 2,
    num_tf_layers: int = 8,
) -> dict:
    """Convert a reference Sepformer/ContSep/ContExt state_dict to flax params.

    Returns a ``{'params': ...}`` variables dict for
    :class:`cse_tpu.models.sepformer.Sepformer`. Presence of optional heads
    (context mappers, selector, se embedding) is auto-detected from the keys.
    """
    p: dict = {}

    _set(p, ["encoder", "kernel"], _t(sd["encoder.conv1d.weight"]).transpose(2, 1, 0))
    # flax ConvTranspose(transpose_kernel=False) cross-correlates the dilated
    # input, so the torch kernel must be flipped along the spatial axis.
    _set(
        p,
        ["decoder", "kernel"],
        _t(sd["decoder.weight"]).transpose(2, 0, 1)[::-1].copy(),
    )

    mn: dict = {}
    mn["norm"] = {"scale": _t(sd["masknet.norm.weight"]), "bias": _t(sd["masknet.norm.bias"])}
    mn["conv1d"] = {"kernel": _t(sd["masknet.conv1d.weight"])[:, :, 0].T}

    for i in range(num_dp_layers):
        dp = f"masknet.dual_mdl.{i}"
        blk: dict = {
            "intra_mdl": _transformer_stack(sd, f"{dp}.intra_mdl", num_tf_layers),
            "inter_mdl": _transformer_stack(sd, f"{dp}.inter_mdl", num_tf_layers),
            "intra_norm": {
                "scale": _t(sd[f"{dp}.intra_norm.weight"]),
                "bias": _t(sd[f"{dp}.intra_norm.bias"]),
            },
            "inter_norm": {
                "scale": _t(sd[f"{dp}.inter_norm.weight"]),
                "bias": _t(sd[f"{dp}.inter_norm.bias"]),
            },
        }
        if f"{dp}.intra_context_mapper.weight" in sd:
            blk["intra_context_mapper"] = {
                "kernel": _t(sd[f"{dp}.intra_context_mapper.weight"]).T,
                "bias": _t(sd[f"{dp}.intra_context_mapper.bias"]),
            }
            blk["inter_context_mapper"] = {
                "kernel": _t(sd[f"{dp}.inter_context_mapper.weight"]).T,
                "bias": _t(sd[f"{dp}.inter_context_mapper.bias"]),
            }
        mn[f"dual_mdl_{i}"] = blk

    mn["prelu_alpha"] = _t(sd["masknet.prelu.weight"])
    mn["conv2d"] = {
        "kernel": _t(sd["masknet.conv2d.weight"])[:, :, 0, 0].T,
        "bias": _t(sd["masknet.conv2d.bias"]),
    }
    mn["output"] = {
        "kernel": _t(sd["masknet.output.0.weight"])[:, :, 0].T,
        "bias": _t(sd["masknet.output.0.bias"]),
    }
    mn["output_gate"] = {
        "kernel": _t(sd["masknet.output_gate.0.weight"])[:, :, 0].T,
        "bias": _t(sd["masknet.output_gate.0.bias"]),
    }
    mn["end_conv1x1"] = {"kernel": _t(sd["masknet.end_conv1x1.weight"])[:, :, 0].T}
    p["masknet"] = mn

    if "context_selector.weight" in sd:
        p["context_selector"] = {
            "kernel": _t(sd["context_selector.weight"]).T,
            "bias": _t(sd["context_selector.bias"]),
        }
    if "se_embedding.weight" in sd:
        p["se_embedding"] = {
            "kernel": _t(sd["se_embedding.weight"]).T,
            "bias": _t(sd["se_embedding.bias"]),
        }
    return {"params": p}


def infer_reference_config(sd: Mapping[str, np.ndarray]) -> dict:
    """Infer (num_spks, variant flags, dp/tf layer counts) from key shapes."""
    d_model = sd["masknet.conv1d.weight"].shape[0]
    num_spks = sd["masknet.conv2d.weight"].shape[0] // d_model
    num_dp = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"masknet\.dual_mdl\.(\d+)\.", k))
    )
    num_tf = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.search(r"\.mdl\.layers\.(\d+)\.", k))
    )
    has_ctx = any("context_mapper" in k for k in sd)
    has_selector = "context_selector.weight" in sd
    has_se = "se_embedding.weight" in sd
    variant = "contsep" if has_selector else ("context" if has_ctx else "base")
    ce = not (has_selector and sd["context_selector.weight"].shape[0] == 1)
    return dict(
        num_spks=num_spks,
        num_dp_layers=num_dp,
        num_tf_layers=num_tf,
        variant=variant,
        ce=ce,
        add_se=has_se,
    )
