"""Torch checkpoint → resdsic_tpu param-tree converter.

Converts reference WACNN `.pth.tar` state dicts (src/compress/models/WACNN/
cnn.py layout, incl. the published cnn_* checkpoints) into our Flax param
tree. Key facts:
  * torch Conv2d weight (O,I,kh,kw)      → HWIO transpose (2,3,1,0)
  * torch ConvTranspose2d weight (I,O,kh,kw) → spatial flip + (2,3,0,1)
    (our Deconv stores the correlation kernel of the equivalent
     input-dilated conv — see nn/conv.py)
  * torch Linear weight (O,I)            → kernel (I,O) transpose
  * GDN beta/gamma are sqrt-space reparam values on both sides → copy
  * EntropyBottleneck _matrixN/_biasN/_factorN/quantiles → matrix_N/... copy
  * GaussianConditional CDF buffers are NOT converted — rebuilt via update()
  * module indices match: our list-attribute naming g_a_0... mirrors torch
    Sequential indices because activation callables occupy list slots too.

Also applies the reference's key-renaming rules for upstream zoo checkpoints
(src/compress/zoo/pretrained.py:19-50): strip "module.", drop "h_s.",
"_biasN" double-underscore variants.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def rename_key(key: str) -> str:
    """Upstream-zoo key normalization (ref zoo/pretrained.py:19-43)."""
    if key.startswith("module."):
        key = key[7:]
    if key.startswith("h_s."):
        return ""  # dropped by the reference converter
    # _biases.N. → _bias_N etc. (older CompressAI layouts)
    key = re.sub(r"_biases\.(\d+)\.", r"_bias\1", key)
    key = re.sub(r"_matrices\.(\d+)\.", r"_matrix\1", key)
    key = re.sub(r"_factors\.(\d+)\.", r"_factor\1", key)
    return key


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _deconv_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(
        np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))
    )


def _linear_w(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _set(tree: dict, path: list, value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


_RU_CONV_IDX = {0: "Conv_0", 2: "Conv_1", 4: "Conv_2"}


def _convert_attention(prefix: str, rest: str, value, out: dict, base: list):
    """Win_noShift_Attention params (ref layers.py:45-89 ↔ nn/attention.py)."""
    parts = rest.split(".")
    if parts[0] == "conv_a":
        ru, layer = int(parts[1]), int(parts[3])
        path = base + [f"conv_a_{ru}", _RU_CONV_IDX[layer], "conv"]
        _set(out, path + ["kernel" if parts[-1] == "weight" else "bias"],
             _conv_w(value) if parts[-1] == "weight" else value)
    elif parts[0] == "conv_b":
        idx = int(parts[1])
        if idx == 0:  # WinBasedAttention
            sub = parts[2]
            if sub == "attn":
                leaf = parts[3]
                if leaf == "relative_position_bias_table":
                    _set(out, base + ["win_attn", "attn",
                                      "relative_position_bias_table"], value)
                elif leaf in ("qkv", "proj"):
                    name = "kernel" if parts[-1] == "weight" else "bias"
                    v = _linear_w(value) if parts[-1] == "weight" else value
                    _set(out, base + ["win_attn", "attn", leaf, name], v)
                # relative_position_index buffer: rebuilt statically — skip
        elif idx in (1, 2, 3):  # residual units
            layer = int(parts[3])
            path = base + [f"conv_b_{idx-1}", _RU_CONV_IDX[layer], "conv"]
            _set(out, path + ["kernel" if parts[-1] == "weight" else "bias"],
                 _conv_w(value) if parts[-1] == "weight" else value)
        elif idx == 4:  # final 1x1 conv
            _set(out, base + ["Conv_0", "conv",
                              "kernel" if parts[-1] == "weight" else "bias"],
                 _conv_w(value) if parts[-1] == "weight" else value)


# per-Sequential layer-kind tables for the default WACNN (cnn.py:31-129)
_GA_KINDS = {0: "conv", 1: "gdn", 2: "conv", 3: "gdn", 4: "attn",
             5: "conv", 6: "gdn", 7: "conv", 8: "attn"}
_GS_KINDS = {0: "attn", 1: "deconv", 2: "gdn", 3: "deconv", 4: "gdn",
             5: "attn", 6: "deconv", 7: "gdn", 8: "deconv"}
_HA_KINDS = {i: "conv" for i in (0, 2, 4, 6, 8)}
_HS_KINDS = {0: "conv", 2: "subpel", 4: "conv", 6: "subpel", 8: "conv"}


def _convert_sequential(seq_name, kinds, idx, rest, value, out):
    kind = kinds[idx]
    base = [f"{seq_name}_{idx}"]
    leaf = "kernel" if rest.endswith("weight") else "bias"
    if kind == "conv":
        _set(out, base + ["conv", leaf],
             _conv_w(value) if leaf == "kernel" else value)
    elif kind == "deconv":
        _set(out, base + [leaf],
             _deconv_w(value) if leaf == "kernel" else value)
    elif kind == "gdn":
        name = rest.split(".")[-1]  # beta | gamma
        _set(out, base + [name], value)
    elif kind == "subpel":
        # torch: h_mean_s.2.0.weight (Sequential(conv, PixelShuffle))
        _set(out, base + ["conv", "conv", leaf],
             _conv_w(value) if leaf == "kernel" else value)
    elif kind == "attn":
        _convert_attention(seq_name, rest, value, out, base)


def convert_wacnn_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference WACNN ("cnn") torch state dict to a Flax tree.

    Input values may be torch tensors or numpy arrays; CDF buffers and the
    scale table are skipped (rebuild with codec.update()).
    """
    out: Dict[str, Any] = {}
    skip_substrings = (
        "_quantized_cdf", "_offset", "_cdf_length", "scale_table",
        "scale_bound", "relative_position_index", ".target",
    )
    for key, val in state_dict.items():
        key = rename_key(key)
        if not key or any(s in key for s in skip_substrings):
            continue
        if key == "target":
            continue
        v = np.asarray(
            val.detach().cpu().numpy() if hasattr(val, "detach") else val,
            dtype=np.float32,
        )
        parts = key.split(".")
        head = parts[0]

        if head in ("g_a", "g_s", "h_a", "h_mean_s", "h_scale_s"):
            idx = int(parts[1])
            rest = ".".join(parts[2:])
            kinds = {"g_a": _GA_KINDS, "g_s": _GS_KINDS, "h_a": _HA_KINDS,
                     "h_mean_s": _HS_KINDS, "h_scale_s": _HS_KINDS}[head]
            _convert_sequential(head, kinds, idx, rest, v, out)
        elif head in ("cc_mean_transforms", "cc_scale_transforms",
                      "lrp_transforms"):
            i, j = int(parts[1]), int(parts[2])
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            _set(out, [f"{head}_{i}_{j}", "conv", leaf],
                 _conv_w(v) if leaf == "kernel" else v)
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
            continue  # buffers only — rebuilt
        else:
            raise KeyError(f"Unmapped reference key: {key}")
    return out


def load_torch_checkpoint(path: str, arch: str = "cnn") -> Dict[str, Any]:
    """Load a .pth.tar and return the converted Flax params tree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    if arch == "tcm":
        from .torch_convert_tcm import convert_tcm_state_dict

        return {"params": convert_tcm_state_dict(state_dict)}
    return {"params": convert_wacnn_state_dict(state_dict)}
