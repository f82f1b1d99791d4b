"""pjit training / eval steps over a device mesh.

Replaces the reference's eager loop + nn.DataParallel
(src/compress/training/step.py:18-105, src/train.py:45-52): one compiled
step, batch sharded over the mesh's 'data' axis, params replicated, gradient
all-reduce inserted by XLA from the sharding constraints. Both the RD loss
and the aux quantile loss come from a single backward pass (see
optimizers.py); learning rates are traced scalars so plateau LR changes
never recompile.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .optimizers import configure_optimizers, quantile_label_tree, split_grads
from .state import TrainState


def make_train_step(
    model,
    criterion,
    mesh: Optional[Mesh] = None,
    clip_max_norm: float = 1.0,
    quality=None,
    donate: bool = True,
    trainable_mask=None,
):
    """Returns train_step(state, batch, rng, lr, aux_lr) -> (state, metrics).

    `model` may be WACNN (plain forward) or a scalable model (multi-quality
    forward); both are driven with training=True and a 'noise' rng stream.
    """
    tx_main, tx_aux = configure_optimizers(clip_max_norm)
    is_scalable = hasattr(model, "lmbda_list")

    def forward(params, batch, rng):
        kwargs = dict(training=True, rngs={"noise": rng})
        if is_scalable:
            return model.apply(params, batch, quality=quality, **kwargs)
        return model.apply(params, batch, **kwargs)

    def train_step(state: TrainState, batch, rng, lr, aux_lr):
        labels = quantile_label_tree(state.params["params"])

        def loss_fn(inner_params):
            params = {**state.params, "params": inner_params}
            out = forward(params, batch, rng)
            crit = criterion(out, batch)
            aux = model.apply(params, method="aux_loss")
            total = crit["loss"] + aux
            return total, (crit, aux)

        grads, (crit, aux) = jax.grad(loss_fn, has_aux=True)(
            state.params["params"]
        )
        if trainable_mask is not None:
            from .freeze import apply_freeze

            grads = apply_freeze(grads, trainable_mask)
        g_main, g_aux = split_grads(grads, labels)

        u_main, new_main = tx_main.update(
            g_main, state.opt_state_main, state.params["params"]
        )
        u_aux, new_aux = tx_aux.update(
            g_aux, state.opt_state_aux, state.params["params"]
        )
        updates = jax.tree_util.tree_map(
            lambda m, a: -lr * m - aux_lr * a, u_main, u_aux
        )
        new_inner = optax.apply_updates(state.params["params"], updates)

        metrics = {
            "loss": crit["loss"],
            "bpp_loss": crit["bpp_loss"],
            "mse_loss": jnp.mean(crit["mse_loss"]),
            "aux_loss": aux,
        }
        for k in ("bpp_base", "bpp_scalable"):
            if k in crit:
                metrics[k] = crit[k]

        new_state = TrainState(
            params={**state.params, "params": new_inner},
            opt_state_main=new_main,
            opt_state_aux=new_aux,
            step=state.step + 1,
        )
        return new_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        return jax.jit(
            train_step,
            in_shardings=(repl, data, repl, repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, criterion, mesh: Optional[Mesh] = None, quality=None):
    """Forward-only metrics step (valid/test epochs)."""
    is_scalable = hasattr(model, "lmbda_list")

    def eval_step(params, batch):
        if is_scalable:
            out = model.apply(params, batch, quality=quality, training=False)
            x_hat = out["x_hat"]
            target = jnp.broadcast_to(batch[None], x_hat.shape)
        else:
            out = model.apply(params, batch, training=False)
            x_hat = out["x_hat"]
            target = batch
        crit = criterion(out, batch)
        mse = jnp.mean(
            (jnp.clip(x_hat, 0, 1) - target) ** 2,
            axis=tuple(range(1, x_hat.ndim)) if is_scalable else None,
        )
        psnr = -10.0 * jnp.log10(mse)
        metrics = {
            "loss": crit["loss"],
            "bpp_loss": crit["bpp_loss"],
            "mse_loss": jnp.mean(crit["mse_loss"]),
            "psnr": psnr,
        }
        for k in ("bpp_base", "bpp_scalable"):
            if k in crit:
                metrics[k] = crit[k]
        return metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        return jax.jit(eval_step, in_shardings=(repl, data), out_shardings=repl)
    return jax.jit(eval_step)
