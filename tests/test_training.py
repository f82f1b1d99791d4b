import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resdsic_tpu.models import WACNN, ResWACNNIndependentEntropy
from resdsic_tpu.parallel import make_mesh, shard_batch
from resdsic_tpu.training import (
    RateDistortionLoss,
    ReduceLROnPlateau,
    ScalableRateDistortionLoss,
    create_train_state,
    make_eval_step,
    make_train_step,
)


def test_rd_loss_values():
    crit = RateDistortionLoss(lmbda=0.01)
    x = jnp.zeros((1, 8, 8, 3))
    out = {
        "x_hat": jnp.full((1, 8, 8, 3), 0.1),
        "likelihoods": {"y": jnp.full((1, 2, 2, 4), 0.5)},
    }
    r = crit(out, x)
    # bpp: 16 symbols at 1 bit over 64 pixels = 0.25
    np.testing.assert_allclose(float(r["bpp_loss"]), 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(r["mse_loss"]), 0.01, rtol=1e-6)
    np.testing.assert_allclose(
        float(r["loss"]), 0.01 * 255**2 * 0.01 + 0.25, rtol=1e-6
    )


def test_scalable_rd_loss_decomposition():
    crit = ScalableRateDistortionLoss(lmbda_list=[0.0035, 0.065])
    x = jnp.zeros((2, 8, 8, 3))
    nl = 2
    out = {
        "x_hat": jnp.full((nl, 2, 8, 8, 3), 0.1),
        "likelihoods": {
            "y": jnp.full((1, 2, 2, 2, 4), 0.5),
            "z": jnp.full((2, 1, 1, 4), 0.5),
            "y_prog": jnp.full((1, 2, 2, 2, 4), 0.25),
            "z_prog": jnp.full((2, 1, 1, 4), 0.5),
        },
    }
    r = crit(out, x)
    num_pixels = 2 * 8 * 8
    np.testing.assert_allclose(
        float(r["bpp_main_base"]), 32 / num_pixels, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(r["bpp_main_scale"]), 64 / num_pixels, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(r["bpp_loss"]),
        float(r["bpp_scalable"] + nl * r["bpp_base"]),
        rtol=1e-6,
    )
    assert r["mse_loss"].shape == (nl,)


def test_plateau_scheduler():
    sched = ReduceLROnPlateau(1e-4, factor=0.3, patience=2)
    assert sched.step(1.0) == 1e-4
    for _ in range(2):
        assert sched.step(1.0) == 1e-4  # bad epochs within patience
    assert sched.step(1.0) == pytest.approx(3e-5)  # patience exceeded
    assert sched.step(0.5) == pytest.approx(3e-5)  # improvement resets


@pytest.mark.slow
def test_train_step_cnn_single_device():
    model = WACNN(N=32, M=64, num_slices=4, max_support_slices=2)
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    params = model.init({"params": jax.random.key(1), "noise": jax.random.key(2)}, x)
    state = create_train_state(params)
    crit = RateDistortionLoss(lmbda=0.01)
    step = make_train_step(model, crit, donate=False)

    s1, m1 = step(state, x, jax.random.key(3), 1e-4, 1e-3)
    s2, m2 = step(s1, x, jax.random.key(4), 1e-4, 1e-3)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert int(s2.step) == 2
    # params actually moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params, s2.params,
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0
    # quantiles moved too (aux optimizer)
    q0 = state.params["params"]["entropy_bottleneck"]["quantiles"]
    q2 = s2.params["params"]["entropy_bottleneck"]["quantiles"]
    assert float(jnp.max(jnp.abs(q0 - q2))) > 0


@pytest.mark.slow
def test_train_step_scalable_on_mesh():
    """Data-parallel train step over an 8-device CPU mesh."""
    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    model = ResWACNNIndependentEntropy(
        N=64, M=64, num_slices=2, max_support_slices=1,
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
    )
    x = jax.random.uniform(jax.random.key(0), (8, 64, 64, 3))
    params = model.init({"params": jax.random.key(1), "noise": jax.random.key(2)}, x[:1])
    state = create_train_state(params)
    crit = ScalableRateDistortionLoss(lmbda_list=[0.0035, 0.065])
    step = make_train_step(model, crit, mesh=mesh, donate=False)

    xb = shard_batch(x, mesh)
    s1, m1 = step(state, xb, jax.random.key(3), 1e-4, 1e-3)
    assert np.isfinite(float(m1["loss"]))
    assert "bpp_base" in m1 and "bpp_scalable" in m1

    ev = make_eval_step(model, crit, mesh=mesh, quality=None)
    em = ev(s1.params, xb)
    assert np.isfinite(float(em["psnr"].mean()))


@pytest.mark.slow
def test_train_step_on_2x4_multihost_mesh():
    """2-axis ('data_dcn','data_ici') mesh: the pod-slice layout (SURVEY
    §2.11). Batch shards over both axes; XLA lowers the grad all-reduce
    hierarchically (ICI first, then DCN)."""
    from resdsic_tpu.parallel import batch_spec, make_multihost_mesh

    assert jax.device_count() >= 8
    mesh = make_multihost_mesh(dcn_size=2, devices=jax.devices()[:8])
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data_dcn", "data_ici")
    assert batch_spec(mesh) == jax.sharding.PartitionSpec(
        ("data_dcn", "data_ici")
    )

    model = WACNN(N=32, M=64, num_slices=2, max_support_slices=1)
    x = jax.random.uniform(jax.random.key(0), (16, 64, 64, 3))
    params = model.init(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x[:1]
    )
    state = create_train_state(params)
    crit = RateDistortionLoss(lmbda=0.01)
    step = make_train_step(model, crit, mesh=mesh, donate=False)

    xb = shard_batch(x, mesh)
    # the batch is really split over all 8 devices (2 per device)
    assert {s.data.shape[0] for s in xb.addressable_shards} == {2}
    s1, m1 = step(state, xb, jax.random.key(3), 1e-4, 1e-3)
    assert np.isfinite(float(m1["loss"]))

    # per-device losses must have been averaged across BOTH axes: the same
    # step on a 1-device mesh over the same global batch agrees closely
    mesh1 = make_mesh(1)
    step1 = make_train_step(model, crit, mesh=mesh1, donate=False)
    s1b, m1b = step1(state, shard_batch(x, mesh1), jax.random.key(3), 1e-4, 1e-3)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m1b["loss"]), rtol=2e-4
    )


def test_local_batch_slice_single_process():
    from resdsic_tpu.parallel import local_batch_slice

    assert local_batch_slice(16) == slice(0, 16)


def test_freezer_mask_and_apply():
    import jax.numpy as jnp
    from resdsic_tpu.models import ResWACNNIndependentEntropy
    from resdsic_tpu.training.freeze import apply_freeze, count_parameters, freezer_mask

    model = ResWACNNIndependentEntropy(
        N=64, M=64, num_slices=2, max_support_slices=1,
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
    )
    params = jax.eval_shape(
        lambda k: model.init({"params": k, "noise": k}, jnp.zeros((1, 64, 64, 3))),
        jax.random.key(0),
    )["params"]
    mask = freezer_mask(model, params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    by_top = {}
    for path, v in flat:
        by_top.setdefault(path[0].key, set()).add(v)
    # base g_a frozen; progressive trainable
    assert by_top["g_a_0"] == {False}
    assert by_top["g_a_progressive_0"] == {True}
    assert by_top["h_a_prog_0"] == {True}
    assert by_top["h_a_0"] == {False}
    assert by_top["entropy_bottleneck"] == {True}
    assert by_top["g_s_0"] == {True}

    grads = jax.tree_util.tree_map(
        lambda l: jnp.ones(l.shape, jnp.float32), params
    )
    fg = apply_freeze(grads, mask)
    assert float(jnp.sum(jnp.abs(fg["g_a_0"]["conv"]["kernel"]))) == 0
    assert float(jnp.sum(jnp.abs(fg["g_a_progressive_0"]["conv"]["kernel"]))) > 0

    counts = count_parameters(params)
    assert counts["__total__"] > 0


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    """Spawn two real processes joined via jax.distributed: exercises the
    create_hybrid_device_mesh branch of make_multihost_mesh and a sharded
    train step with cross-process collectives (VERDICT r2 weak #7 — this
    branch was previously compile-validated only)."""
    import re
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    worker = str(Path(__file__).parent / "distributed_worker.py")

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(Path(__file__).parent.parent),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    losses = []
    for out in outs:
        m = re.search(r"WORKER\d loss=([0-9.]+)", out)
        assert m, out[-3000:]
        losses.append(float(m.group(1)))
    # the replicated loss must agree bit-for-bit across processes
    assert losses[0] == losses[1], losses


def test_partial_warm_start_npz(tmp_path):
    """utils.checkpoint.load_params_npz(partial=True): a WACNN artifact
    warm-starts a scalable model's shared base branch; progressive-branch
    keys keep their fresh init (tools/train_flagship.py --init-npz)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from resdsic_tpu.models import WACNN
    from resdsic_tpu.models.scalable import ResWACNNIndependentEntropy
    from resdsic_tpu.utils.checkpoint import load_params_npz, save_params_npz

    cnn = WACNN(N=64, M=64, num_slices=2, max_support_slices=1)
    p_cnn = jax.jit(cnn.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    art = tmp_path / "cnn.npz"
    save_params_npz(p_cnn, str(art), full_precision=True)

    ind = ResWACNNIndependentEntropy(
        N=64, M=64, num_slices=2, max_support_slices=1,
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
    )
    p_ind = jax.jit(ind.init)(
        {"params": jax.random.key(9), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    loaded = load_params_npz(str(art), p_ind, partial=True)

    # shared base modules take the artifact's values...
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["g_a_0"]["conv"]["kernel"]),
        np.asarray(p_cnn["params"]["g_a_0"]["conv"]["kernel"]),
    )
    # ...while progressive-branch keys keep the fresh init
    prog_keys = [k for k in p_ind["params"] if "prog" in k]
    assert prog_keys
    k0 = prog_keys[0]
    for leaf_orig, leaf_new in zip(
        jax.tree_util.tree_leaves(p_ind["params"][k0]),
        jax.tree_util.tree_leaves(loaded["params"][k0]),
    ):
        np.testing.assert_array_equal(
            np.asarray(leaf_orig), np.asarray(leaf_new)
        )
    # non-partial load of a mismatched tree raises with the key name
    with pytest.raises(KeyError):
        load_params_npz(str(art), p_ind)


def test_tail_penalty_loss():
    """TailPenaltyLoss (tools/train_flagship.py): only likelihoods priced
    above the bit threshold draw penalty."""
    import sys
    from pathlib import Path

    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from train_flagship import TailPenaltyLoss

    from resdsic_tpu.training.loss import RateDistortionLoss

    target = jnp.zeros((1, 4, 4, 3))
    base_out = {
        "x_hat": jnp.zeros((1, 4, 4, 3)),
        "likelihoods": {"y": jnp.full((1, 2, 2, 4), 0.5)},  # 1 bit/el
    }
    crit = TailPenaltyLoss(RateDistortionLoss(lmbda=0.01), w=1.0, thresh=14.0)
    out = crit(base_out, target)
    assert float(out["tail_penalty"]) == 0.0

    tail_out = {
        "x_hat": jnp.zeros((1, 4, 4, 3)),
        # 20 bits/element: 6 bits over the 14-bit threshold
        "likelihoods": {"y": jnp.full((1, 2, 2, 4), 2.0 ** -20)},
    }
    out2 = crit(tail_out, target)
    assert float(out2["tail_penalty"]) > 0
    expected = 6.0 * 16 / 16  # 6 bits over x 16 elements / 16 pixels
    assert abs(float(out2["tail_penalty"]) - expected) < 1e-3
    assert float(out2["loss"]) > float(
        RateDistortionLoss(lmbda=0.01)(tail_out, target)["loss"]
    )
