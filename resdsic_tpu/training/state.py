"""Train state: params + dual optimizer states, a pure pytree for pjit."""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct

from .optimizers import configure_optimizers, quantile_label_tree


@struct.dataclass
class TrainState:
    params: Any
    opt_state_main: Any
    opt_state_aux: Any
    step: jax.Array


def create_train_state(params, clip_max_norm: float = 1.0) -> TrainState:
    import jax.numpy as jnp

    tx_main, tx_aux = configure_optimizers(clip_max_norm)
    inner = params["params"] if "params" in params else params
    return TrainState(
        params=params,
        opt_state_main=tx_main.init(inner),
        opt_state_aux=tx_aux.init(inner),
        step=jnp.zeros((), jnp.int32),
    )
