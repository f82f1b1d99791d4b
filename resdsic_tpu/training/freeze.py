"""Partial-freeze training (reference `freezer()` + --frozen_base).

In torch the reference flips requires_grad on module subsets
(shared.py:126-168, independent.py:228-277, single_decoder.py:315-338).
The functional JAX equivalent is a boolean trainable-mask pytree applied to
gradients inside the train step — no module state, jit-friendly.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _mask_from_prefixes(params, trainable_prefixes: Sequence[str]):
    """True where the top-level module name starts with any prefix."""

    def label(path, leaf):
        top = path[0].key if path else ""
        return any(top.startswith(p) for p in trainable_prefixes)

    return jax.tree_util.tree_map_with_path(label, params)


def freezer_mask(model, params) -> Any:
    """Trainable mask matching the reference freezer() semantics for the
    scalable family: freeze everything except the progressive branch, both
    entropy bottlenecks, (prog) hyper nets, (prog) cc transforms, the
    decoder(s), and the LRP stacks when lrp_prog
    (ref independent.py:228-277)."""
    trainable = [
        "g_a_progressive",
        "entropy_bottleneck",       # covers entropy_bottleneck_prog too
        "h_a_prog",
        "h_mean_s_prog",
        "h_scale_s_prog",
        "cc_mean_transforms_prog",
        "cc_scale_transforms_prog",
        "g_s",                      # covers g_s_multi too
        "masking",
        "gamma",
        "mask_conv",
    ]
    if getattr(model, "lrp_prog", True):
        trainable.append("lrp_transforms")
    if getattr(model, "independent_lrp", False):
        trainable.append("lrp_transforms_prog")
    return _mask_from_prefixes(params, trainable)


def apply_freeze(grads, mask):
    """Zero gradients of frozen leaves."""
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, mask
    )


def count_parameters(params) -> dict:
    """print_information equivalent (ref shared.py:90-115): per-top-level
    module parameter counts + total."""
    counts = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        top = path[0].key
        counts[top] = counts.get(top, 0) + int(np.prod(leaf.shape))
    counts["__total__"] = sum(v for k, v in counts.items() if k != "__total__")
    return counts


def print_information(params) -> int:
    counts = count_parameters(params)
    # group the per-slice stacks for readability
    grouped: dict = {}
    for k, v in counts.items():
        if k == "__total__":
            continue
        base = k.rstrip("0123456789_") or k
        grouped[base] = grouped.get(base, 0) + v
    for k in sorted(grouped):
        print(f" {k}: {grouped[k]}")
    print("*" * 74)
    print(f" trainable parameters: {counts['__total__']}")
    return counts["__total__"]
