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
    axis_sizes: Optional[Sequence[int]] = None,
) -> Mesh:
    """Data-parallel mesh; pass axis_names (+ axis_sizes) for more axes."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if axis_sizes is not None:
        if len(axis_sizes) != len(axis_names):
            raise ValueError("axis_sizes must match axis_names")
        if int(np.prod(axis_sizes)) != n:
            raise ValueError(
                f"axis_sizes {tuple(axis_sizes)} != {n} devices"
            )
        shape = tuple(axis_sizes)
    elif len(axis_names) == 1:
        shape = (n,)
    else:
        raise ValueError("multi-axis mesh needs explicit axis_sizes")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def make_multihost_mesh(
    dcn_size: Optional[int] = None,
    devices=None,
    axis_names: Sequence[str] = ("data_dcn", "data_ici"),
) -> Mesh:
    """2-axis data mesh for pod-slice training: DCN (hosts) × ICI (chips).

    The batch is sharded over BOTH axes (see batch_spec); XLA then lowers
    the gradient all-reduce hierarchically — reduce over ICI inside each
    host's slice, then the much smaller cross-host reduce over DCN
    (SURVEY.md §2.11 "Mesh over ICI; DCN axis for multi-host").

    In a real multi-process run (jax.process_count() > 1) the device grid
    comes from mesh_utils.create_hybrid_device_mesh so DCN rows align with
    process boundaries. Single-process (tests, virtual CPU meshes) passes
    dcn_size explicitly and gets a contiguous reshape — the collectives and
    shardings compile identically.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dcn_size is None:
        dcn_size = jax.process_count()
    if n % dcn_size != 0:
        raise ValueError(f"{n} devices not divisible by dcn_size={dcn_size}")
    ici_size = n // dcn_size
    if jax.process_count() == dcn_size and dcn_size > 1:
        from jax.experimental import mesh_utils

        # process_is_granule: the DCN axis groups by host process. The
        # default (slice granules) breaks on a single pod slice spread
        # over several hosts — all devices share slice_index 0 — which is
        # exactly the GKE multihost topology (kube/train-v5e-multihost):
        # caught by tests/distributed_worker.py running this branch for
        # real with two processes.
        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, ici_size),
            dcn_mesh_shape=(dcn_size, 1),
            devices=devices,
            process_is_granule=True,
        )
    else:
        grid = np.asarray(devices).reshape(dcn_size, ici_size)
    return Mesh(grid, axis_names)


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding the leading (batch) dim over ALL mesh axes."""
    return P(tuple(mesh.axis_names))


def batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis/axes."""
    if axis is None:
        return NamedSharding(mesh, batch_spec(mesh))
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis=None):
    """Place a host batch onto the mesh, sharded along dim 0.

    Multi-host note: under a real multi-process runtime each host passes its
    LOCAL shard here; use jax.make_array_from_process_local_data for the
    global view (local_batch helper below covers the common case).
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def local_batch_slice(global_batch_size: int) -> slice:
    """This host's slice of a globally-indexed dataset batch."""
    per = global_batch_size // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
