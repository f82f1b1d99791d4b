"""Worker for the 2-process jax.distributed smoke test (test_training.py).

Each process owns 2 virtual CPU devices; the pair forms a (2 dcn, 2 ici)
hybrid mesh via make_multihost_mesh's create_hybrid_device_mesh branch —
the code path a real GKE multi-host slice runs (SURVEY §2.11) that
single-process tests cannot reach. One real sharded train step executes
and the final loss is printed for cross-process comparison.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    import jax.numpy as jnp

    from resdsic_tpu.models import WACNN
    from resdsic_tpu.parallel.mesh import batch_sharding, make_multihost_mesh
    from resdsic_tpu.training.loss import RateDistortionLoss
    from resdsic_tpu.training.state import create_train_state
    from resdsic_tpu.training.step import make_train_step

    mesh = make_multihost_mesh()  # dcn_size = process_count = 2
    assert mesh.devices.shape == (2, 2), mesh.devices.shape

    model = WACNN(N=8, M=16, num_slices=2, max_support_slices=1)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    state = create_train_state(params)
    step = make_train_step(model, RateDistortionLoss(lmbda=0.01), mesh=mesh)

    import numpy as np

    rng = np.random.default_rng(0)
    global_batch = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    sharding = batch_sharding(mesh)
    local = global_batch[pid * 2 : (pid + 1) * 2]
    batch = jax.make_array_from_process_local_data(
        sharding, local, global_shape=global_batch.shape
    )

    state, metrics = step(state, batch, jax.random.key(2), 1e-4, 1e-3)
    print(f"WORKER{pid} loss={float(metrics['loss']):.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
