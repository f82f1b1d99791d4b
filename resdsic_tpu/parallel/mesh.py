"""Device-mesh utilities — the TPU-native replacement for the reference's
`CustomDataParallel` (src/train.py:45-52, nn.DataParallel over CUDA).

Data-parallel training runs as one pjit-compiled step over a
jax.sharding.Mesh: the batch is sharded over the 'data' axis (ICI within a
pod slice, DCN across hosts), params are replicated, and XLA inserts the
gradient all-reduce (psum) automatically from the sharding constraints —
no hand-written collectives (SURVEY.md §2.11).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """1D data-parallel mesh by default; pass axis_names for more axes."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # fill trailing axes with 1 unless caller passes explicit devices grid
        shape = (n,) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along dim 0."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
