"""Export cse_tpu Sepformer params back to a reference-layout PyTorch .ckpt.

The inverse of :mod:`cse_tpu.compat.torch_import`: models trained on TPU can
be handed back to users of the reference implementation (same state_dict key
names and tensor layouts, loadable by the reference ``model.load_state_dict``
+ ``torch.load`` flow, ``train_ContSep.py:189-211``).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _stack_layers(tree: Mapping, prefix: str, sd: dict, num_tf_layers: int):
    for j in range(num_tf_layers):
        lp = tree[f"layer_{j}"]
        base = f"{prefix}.mdl.layers.{j}"
        sd[f"{base}.self_att.att.in_proj_weight"] = _np(lp["self_att"]["in_proj_kernel"]).T
        sd[f"{base}.self_att.att.in_proj_bias"] = _np(lp["self_att"]["in_proj_bias"])
        sd[f"{base}.self_att.att.out_proj.weight"] = _np(lp["self_att"]["out_proj_kernel"]).T
        sd[f"{base}.self_att.att.out_proj.bias"] = _np(lp["self_att"]["out_proj_bias"])
        sd[f"{base}.norm1.norm.weight"] = _np(lp["norm1"]["scale"])
        sd[f"{base}.norm1.norm.bias"] = _np(lp["norm1"]["bias"])
        sd[f"{base}.norm2.norm.weight"] = _np(lp["norm2"]["scale"])
        sd[f"{base}.norm2.norm.bias"] = _np(lp["norm2"]["bias"])
        sd[f"{base}.pos_ffn.ffn.0.weight"] = _np(lp["ffn_1"]["kernel"]).T
        sd[f"{base}.pos_ffn.ffn.0.bias"] = _np(lp["ffn_1"]["bias"])
        sd[f"{base}.pos_ffn.ffn.3.weight"] = _np(lp["ffn_2"]["kernel"]).T
        sd[f"{base}.pos_ffn.ffn.3.bias"] = _np(lp["ffn_2"]["bias"])
    sd[f"{prefix}.mdl.norm.norm.weight"] = _np(tree["norm"]["scale"])
    sd[f"{prefix}.mdl.norm.norm.bias"] = _np(tree["norm"]["bias"])


def sepformer_to_state_dict(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Flax variables -> flat reference-key numpy state_dict."""
    p = variables["params"] if "params" in variables else variables
    sd: dict[str, np.ndarray] = {}

    sd["encoder.conv1d.weight"] = _np(p["encoder"]["kernel"]).transpose(2, 1, 0)
    # undo the ConvTranspose spatial flip applied on import
    sd["decoder.weight"] = _np(p["decoder"]["kernel"])[::-1].transpose(1, 2, 0)

    mn = p["masknet"]
    sd["masknet.norm.weight"] = _np(mn["norm"]["scale"])
    sd["masknet.norm.bias"] = _np(mn["norm"]["bias"])
    sd["masknet.conv1d.weight"] = _np(mn["conv1d"]["kernel"]).T[:, :, None]

    num_dp = len([k for k in mn if k.startswith("dual_mdl_")])
    for i in range(num_dp):
        blk = mn[f"dual_mdl_{i}"]
        num_tf = len([k for k in blk["intra_mdl"] if k.startswith("layer_")])
        base = f"masknet.dual_mdl.{i}"
        _stack_layers(blk["intra_mdl"], f"{base}.intra_mdl", sd, num_tf)
        _stack_layers(blk["inter_mdl"], f"{base}.inter_mdl", sd, num_tf)
        sd[f"{base}.intra_norm.weight"] = _np(blk["intra_norm"]["scale"])
        sd[f"{base}.intra_norm.bias"] = _np(blk["intra_norm"]["bias"])
        sd[f"{base}.inter_norm.weight"] = _np(blk["inter_norm"]["scale"])
        sd[f"{base}.inter_norm.bias"] = _np(blk["inter_norm"]["bias"])
        if "intra_context_mapper" in blk:
            sd[f"{base}.intra_context_mapper.weight"] = _np(blk["intra_context_mapper"]["kernel"]).T
            sd[f"{base}.intra_context_mapper.bias"] = _np(blk["intra_context_mapper"]["bias"])
            sd[f"{base}.inter_context_mapper.weight"] = _np(blk["inter_context_mapper"]["kernel"]).T
            sd[f"{base}.inter_context_mapper.bias"] = _np(blk["inter_context_mapper"]["bias"])

    sd["masknet.prelu.weight"] = _np(mn["prelu_alpha"])
    sd["masknet.conv2d.weight"] = _np(mn["conv2d"]["kernel"]).T[:, :, None, None]
    sd["masknet.conv2d.bias"] = _np(mn["conv2d"]["bias"])
    sd["masknet.output.0.weight"] = _np(mn["output"]["kernel"]).T[:, :, None]
    sd["masknet.output.0.bias"] = _np(mn["output"]["bias"])
    sd["masknet.output_gate.0.weight"] = _np(mn["output_gate"]["kernel"]).T[:, :, None]
    sd["masknet.output_gate.0.bias"] = _np(mn["output_gate"]["bias"])
    sd["masknet.end_conv1x1.weight"] = _np(mn["end_conv1x1"]["kernel"]).T[:, :, None]

    if "context_selector" in p:
        sd["context_selector.weight"] = _np(p["context_selector"]["kernel"]).T
        sd["context_selector.bias"] = _np(p["context_selector"]["bias"])
    if "se_embedding" in p:
        sd["se_embedding.weight"] = _np(p["se_embedding"]["kernel"]).T
        sd["se_embedding.bias"] = _np(p["se_embedding"]["bias"])
    return sd


def save_torch_checkpoint(
    path: str, variables: Mapping[str, Any], step: int = 0, epoch: int = 0
):
    """Write a reference-loadable torch .ckpt (weights-only warm-start form)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          sepformer_to_state_dict(variables).items()}
    torch.save(
        {
            "state_dict": sd,
            "optimizer_state_dict": None,
            "scheduler_state_dict": None,
            "scaler": None,
            "step": step,
            "epoch": epoch,
        },
        path,
    )
