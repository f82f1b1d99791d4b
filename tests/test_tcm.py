import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resdsic_tpu.models import TCM, WACNNCodec


@pytest.fixture(scope="module")
def tcm_small():
    """Tiny TCM: N=32, M=64, 2 slices of 32, 1 block per stage."""
    model = TCM(
        N=32, M=64, num_slices=2, max_support_slices=1,
        config=(1, 1, 1, 1, 1, 1), head_dim=(8, 8, 8, 8, 8, 8),
        window_size=4, hyper_ch=48,
    )
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
    )
    return model, params


@pytest.mark.slow
def test_tcm_forward(tcm_small):
    model, params = tcm_small
    x = jax.random.uniform(jax.random.key(2), (2, 128, 128, 3))
    out = model.apply(params, x, training=True, rngs={"noise": jax.random.key(3)})
    assert out["x_hat"].shape == (2, 128, 128, 3)
    assert out["likelihoods"]["y"].shape == (2, 8, 8, 64)
    assert out["likelihoods"]["z"].shape == (2, 2, 2, 48)
    for l in out["likelihoods"].values():
        assert np.all(np.asarray(l) > 0)


@pytest.mark.slow
def test_tcm_grads(tcm_small):
    model, params = tcm_small
    x = jax.random.uniform(jax.random.key(2), (1, 128, 128, 3))

    def loss(p):
        out = model.apply(p, x, training=True, rngs={"noise": jax.random.key(4)})
        return (
            jnp.mean((out["x_hat"] - x) ** 2) * 255**2 * 0.01
            + sum(-jnp.log2(l).sum() for l in out["likelihoods"].values()) / 16384
        )

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


@pytest.mark.slow
def test_tcm_codec_roundtrip(tcm_small):
    model, params = tcm_small
    x = jax.random.uniform(jax.random.key(5), (1, 128, 128, 3))
    codec = WACNNCodec(model, params)
    codec.update()
    out = codec.compress(x, return_debug=True)
    rec = codec.decompress(out["strings"], out["shape"], return_debug=True)
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
    )
    assert rec["x_hat"].shape == (1, 128, 128, 3)


def test_tcm_default_dims():
    m = TCM()
    assert m.N == 128 and m.M == 320 and m.num_slices == 5
    assert m.slice_ch == 64 and m.hyper_ch == 192
    assert m.config == (2, 2, 2, 2, 2, 2)


@pytest.mark.slow
def test_scalable_tcm_forward_and_roundtrip():
    from resdsic_tpu.models import ScalableCodec, ScalableTCM

    model = ScalableTCM(
        N=64, M=64, num_slices=2, max_support_slices=1,
        config=(1, 1, 1, 1, 1, 1), head_dim=(8, 8, 8, 8, 8, 8),
        window_size=4, hyper_ch=48,
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
    )
    x = jax.random.uniform(jax.random.key(0), (1, 128, 128, 3))
    params = model.init(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x
    )
    out = model.apply(params, x, training=False)
    assert out["x_hat"].shape == (2, 1, 128, 128, 3)
    assert "h_a_prog_0" in params["params"]

    codec = ScalableCodec(model, params)
    codec.update()
    enc = codec.compress(x, quality=1, return_debug=True)
    rec = codec.decompress(enc["strings"], enc["shape"], quality=1, return_debug=True)
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(enc["y_hat"])
    )


def test_shared_tcm_builds():
    from resdsic_tpu.models import SharedTCM

    model = SharedTCM(
        N=64, M=64, num_slices=2, max_support_slices=1,
        config=(1, 1, 1, 1, 1, 1), head_dim=(8, 8, 8, 8, 8, 8),
        window_size=4, hyper_ch=48,
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
    )
    x = jax.random.uniform(jax.random.key(0), (1, 128, 128, 3))
    params = model.init(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x
    )
    # shared variant: no independent prog hyperprior
    assert "h_a_prog_0" not in params["params"]
    assert "g_a_progressive_0" in params["params"]
    out = model.apply(params, x, quality=1, training=False)
    assert out["x_hat"].shape == (1, 1, 128, 128, 3)
