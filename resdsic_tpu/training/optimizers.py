"""Optimizers: main Adam + auxiliary Adam on EB quantiles, plateau LR.

Parity: src/train.py:55-89 (configure_optimizers — Adam lr 1e-4 on all
non-quantile params, Adam lr 1e-3 on `quantiles` leaves for the aux loss)
and src/train.py:214 (ReduceLROnPlateau(min, factor 0.3, patience 4)).

TPU-first: gradients for both losses come from ONE backward pass (the aux
quantile loss is orthogonal by construction — the EB MLP is stop-gradiented
in aux, and quantiles receive zero gradient from the main loss), then two
Adam transforms update disjoint leaf sets. Learning rates are traced scalars
so the plateau scheduler changes them without recompilation.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def quantile_label_tree(params) -> Any:
    """'aux' for EB quantiles leaves, 'main' for everything else."""

    def label(path, leaf):
        if any(getattr(p, "key", None) == "quantiles" for p in path):
            return "aux"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def configure_optimizers(clip_max_norm: float = 1.0):
    """Returns (tx_main, tx_aux): direction-only transforms (lr applied
    separately as a traced scalar). Main chain includes global-norm clipping
    over main-labeled gradients only."""
    tx_main = optax.chain(
        optax.clip_by_global_norm(clip_max_norm), optax.scale_by_adam()
    )
    tx_aux = optax.scale_by_adam()
    return tx_main, tx_aux


def split_grads(grads, labels):
    """(main_grads, aux_grads) with the complementary leaves zeroed."""
    g_main = jax.tree_util.tree_map(
        lambda g, l: g if l == "main" else jnp.zeros_like(g), grads, labels
    )
    g_aux = jax.tree_util.tree_map(
        lambda g, l: g if l == "aux" else jnp.zeros_like(g), grads, labels
    )
    return g_main, g_aux


class ReduceLROnPlateau:
    """Host-side plateau scheduler, torch semantics (mode=min).

    factor 0.3, patience 4 match src/train.py:214.
    """

    def __init__(
        self,
        init_lr: float,
        factor: float = 0.3,
        patience: int = 4,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
    ):
        self.lr = float(init_lr)
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best: float | None = None
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if self.best is None or metric < self.best * (1 - self.threshold):
            self.best = float(metric)
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad = 0
        return self.lr
