"""Torch checkpoint → Flax tree converter for the TCM codec.

Maps the reference TCM state dict (src/compress/models/TCM/tcm.py:310-626,
i.e. the public STF/TCM checkpoints) onto resdsic_tpu.models.tcm.TCM params.

Reference module → ours:
  ResidualBlockWithStride: conv1→Conv_0, conv2→Conv_1, gdn→GDN_0, skip→Conv_2
  ResidualBlockUpsample: subpel_conv→SubpelConv3x3_0, conv→Conv_0,
                         igdn→GDN_0, upsample→SubpelConv3x3_1
  ResidualBlock: conv1→Conv_0, conv2→Conv_1, skip→Conv_2
  ConvTransBlock: conv1_1/conv1_2/conv_block/trans_block (same names);
      Block: ln1/ln2 (weight→scale), msa (WMSA: embedding_layer/linear Dense
      transposed; relative_position_params copied — same (nh,2w-1,2w-1)
      layout), mlp.0→mlp_0, mlp.2→mlp_2
  SWAtten: in_conv/out_conv, non_local_block.block_{1,2},
      conv_a.{i}.conv.{0,2,4}→conv_a_{i}.Conv_{0,1,2},
      conv_b.{0..2}→conv_b_{0..2}, conv_b.3→conv_b_out
  cc/lrp transforms: Sequential conv indices preserved (…_{i}_{j}.conv)
  entropy_bottleneck: _matrixN/_biasN/_factorN/quantiles → matrix_N/…
  gaussian_conditional buffers skipped (rebuild via codec.update()).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

from .torch_convert import _conv_w, _linear_w, _set, rename_key

_SKIP = (
    "_quantized_cdf", "_offset", "_cdf_length", "scale_table",
    "scale_bound", ".target",
)


def _put_conv(out, base, leaf_is_weight, v, name="conv"):
    _set(out, base + [name, "kernel" if leaf_is_weight else "bias"],
         _conv_w(v) if leaf_is_weight else v)


def _convert_rbws(out, base, rest, v):
    sub, leaf = rest.split(".")
    name = {"conv1": "Conv_0", "conv2": "Conv_1", "skip": "Conv_2"}.get(sub)
    if name:
        _put_conv(out, base + [name], leaf == "weight", v)
    elif sub == "gdn":
        _set(out, base + ["GDN_0", leaf], v)  # beta | gamma, sqrt-space copy


def _convert_rbu(out, base, rest, v):
    parts = rest.split(".")
    if parts[0] == "subpel_conv":  # Sequential(conv, shuffle): .0.weight
        _put_conv(out, base + ["SubpelConv3x3_0", "conv"], parts[-1] == "weight", v)
    elif parts[0] == "upsample":
        _put_conv(out, base + ["SubpelConv3x3_1", "conv"], parts[-1] == "weight", v)
    elif parts[0] == "conv":
        _put_conv(out, base + ["Conv_0"], parts[-1] == "weight", v)
    elif parts[0] == "igdn":
        _set(out, base + ["GDN_0", parts[-1]], v)


def _convert_rb(out, base, rest, v):
    sub, leaf = rest.split(".")
    name = {"conv1": "Conv_0", "conv2": "Conv_1", "skip": "Conv_2"}[sub]
    _put_conv(out, base + [name], leaf == "weight", v)


def _convert_block(out, base, rest, v):
    """Swin Block: ln1/msa/ln2/mlp."""
    parts = rest.split(".")
    if parts[0] in ("ln1", "ln2"):
        _set(out, base + [parts[0], "scale" if parts[1] == "weight" else "bias"], v)
    elif parts[0] == "msa":
        if parts[1] == "relative_position_params":
            _set(out, base + ["msa", "relative_position_params"], v)
        elif parts[1] in ("embedding_layer", "linear"):
            name = "kernel" if parts[-1] == "weight" else "bias"
            _set(out, base + ["msa", parts[1], name],
                 _linear_w(v) if parts[-1] == "weight" else v)
    elif parts[0] == "mlp":
        idx = parts[1]  # 0 or 2
        name = "kernel" if parts[-1] == "weight" else "bias"
        _set(out, base + [f"mlp_{idx}", name],
             _linear_w(v) if parts[-1] == "weight" else v)


def _convert_ctb(out, base, rest, v):
    parts = rest.split(".")
    if parts[0] in ("conv1_1", "conv1_2"):
        _put_conv(out, base + [parts[0]], parts[-1] == "weight", v, name="conv")
    elif parts[0] == "conv_block":
        _convert_rb(out, base + ["conv_block"], ".".join(parts[1:]), v)
    elif parts[0] == "trans_block":
        _convert_block(out, base + ["trans_block"], ".".join(parts[1:]), v)


def _convert_ru_attn(out, base, rest, v):
    """CompressAI AttentionBlock residual unit: conv.{0,2,4}."""
    idx = {"0": "Conv_0", "2": "Conv_1", "4": "Conv_2"}[rest.split(".")[1]]
    _put_conv(out, base + [idx], rest.endswith("weight"), v)


def _convert_swatten(out, base, rest, v):
    parts = rest.split(".")
    if parts[0] in ("in_conv", "out_conv"):
        _put_conv(out, base + [parts[0]], parts[-1] == "weight", v, name="conv")
    elif parts[0] == "non_local_block":
        _convert_block(out, base + ["non_local_block", parts[1]],
                       ".".join(parts[2:]), v)
    elif parts[0] == "conv_a":
        _convert_ru_attn(out, base + [f"conv_a_{parts[1]}"],
                         ".".join(parts[2:]), v)
    elif parts[0] == "conv_b":
        if parts[1] == "3":  # final 1x1
            _put_conv(out, base + ["conv_b_out"], parts[-1] == "weight", v,
                      name="conv")
        else:
            _convert_ru_attn(out, base + [f"conv_b_{parts[1]}"],
                             ".".join(parts[2:]), v)


def convert_tcm_state_dict(
    state_dict: Dict[str, Any],
    config=(2, 2, 2, 2, 2, 2),
) -> Dict[str, Any]:
    """Convert a reference TCM torch state dict to our Flax param tree."""
    out: Dict[str, Any] = {}

    c = list(config)
    # per-Sequential layer-kind tables (index → kind), mirroring tcm.py
    def stage_kinds(pre_kind, stage_a, stage_b, stage_c, tail_kind):
        kinds = {0: pre_kind}
        i = 1
        for n, closer in ((stage_a, "rbws"), (stage_b, "rbws"), (stage_c, tail_kind)):
            for _ in range(n):
                kinds[i] = "ctb"; i += 1
            kinds[i] = closer; i += 1
        return kinds

    ga_kinds = stage_kinds("rbws", c[0], c[1], c[2], "conv")
    gs_kinds = {0: "rbu"}
    i = 1
    for n, closer in ((c[3], "rbu"), (c[4], "rbu"), (c[5], "subpel")):
        for _ in range(n):
            gs_kinds[i] = "ctb"; i += 1
        gs_kinds[i] = closer; i += 1
    ha_kinds = {0: "rbws"}
    for j in range(c[0]):
        ha_kinds[1 + j] = "ctb"
    ha_kinds[1 + c[0]] = "conv"
    hs_kinds = {0: "rbu"}
    for j in range(c[3]):
        hs_kinds[1 + j] = "ctb"
    hs_kinds[1 + c[3]] = "subpel"

    seq_tables = {
        "g_a": ga_kinds, "g_s": gs_kinds, "h_a": ha_kinds,
        "h_mean_s": hs_kinds, "h_scale_s": hs_kinds,
    }

    for key, val in state_dict.items():
        key = rename_key(key)
        if not key or any(s in key for s in _SKIP) or key == "target":
            continue
        v = np.asarray(
            val.detach().cpu().numpy() if hasattr(val, "detach") else val,
            dtype=np.float32,
        )
        parts = key.split(".")
        head = parts[0]

        if head in seq_tables:
            idx = int(parts[1])
            kind = seq_tables[head][idx]
            base = [f"{head}_{idx}"]
            rest = ".".join(parts[2:])
            if kind == "rbws":
                _convert_rbws(out, base, rest, v)
            elif kind == "rbu":
                _convert_rbu(out, base, rest, v)
            elif kind == "ctb":
                _convert_ctb(out, base, rest, v)
            elif kind == "conv":
                _put_conv(out, base, parts[-1] == "weight", v)
            elif kind == "subpel":
                # torch subpel_conv3x3: Sequential(conv, shuffle) → .0.weight
                _put_conv(out, base + ["conv"], parts[-1] == "weight", v)
        elif head in ("atten_mean", "atten_scale"):
            i = int(parts[1])
            # reference wraps SWAtten in a Sequential → extra ".0"
            rest = ".".join(parts[3:])
            _convert_swatten(out, [f"{head}_{i}"], rest, v)
        elif head in ("cc_mean_transforms", "cc_scale_transforms",
                      "lrp_transforms"):
            i, j = int(parts[1]), int(parts[2])
            _put_conv(out, [f"{head}_{i}_{j}"], parts[-1] == "weight", v)
        elif head == "entropy_bottleneck":
            leaf = parts[1]
            m = re.fullmatch(r"_matrix(\d+)", leaf)
            b = re.fullmatch(r"_bias(\d+)", leaf)
            f = re.fullmatch(r"_factor(\d+)", leaf)
            if m:
                _set(out, ["entropy_bottleneck", f"matrix_{m.group(1)}"], v)
            elif b:
                _set(out, ["entropy_bottleneck", f"bias_{b.group(1)}"], v)
            elif f:
                _set(out, ["entropy_bottleneck", f"factor_{f.group(1)}"], v)
            elif leaf == "quantiles":
                _set(out, ["entropy_bottleneck", "quantiles"], v)
        elif head == "gaussian_conditional":
            continue
        else:
            raise KeyError(f"Unmapped TCM reference key: {key}")
    return out
