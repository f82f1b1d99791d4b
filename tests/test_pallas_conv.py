"""Deterministic Pallas 3x3 conv vs the XLA formulation (interpret mode).

The kernel exists for cross-program bit-identity of the codec's
decoder-side parameter path (ops/pallas_conv.py docstring); these tests
pin value agreement with the XLA conv, the H-tiling path, gradients, and
the Conv module routing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from resdsic_tpu.nn.conv import Conv
from resdsic_tpu.ops import pallas_conv as pc


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
        * scale
    )


def test_pallas_conv_matches_xla():
    x = _rand((2, 12, 10, 24), 0)
    w = _rand((3, 3, 24, 16), 1, 0.1)
    b = _rand((16,), 2, 0.1)
    out = pc.det_conv3x3(x, w, b, jnp.float32, True)
    ref = pc._conv3x3_xla(x, w, b, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_conv_tiled_matches_untiled():
    """Force H-tiling and check the tiled result equals the XLA conv."""
    x = _rand((1, 37, 10, 8), 3)  # odd H -> uneven last tile
    w = _rand((3, 3, 8, 8), 4, 0.1)
    b = _rand((8,), 5, 0.1)
    old = pc._VMEM_BUDGET
    pc._VMEM_BUDGET = 60_000  # force multiple H tiles at this shape
    try:
        tiles = pc._tile_heights(37, 10, 8, 8, 4)
        assert len(tiles) > 1 and sum(tiles) == 37
        out = pc.det_conv3x3(x, w, b, jnp.float32, True)
    finally:
        pc._VMEM_BUDGET = old
    ref = pc._conv3x3_xla(x, w, b, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_conv_gradients_match_xla():
    x = _rand((1, 6, 6, 8), 6)
    w = _rand((3, 3, 8, 4), 7, 0.1)
    b = _rand((4,), 8, 0.1)

    g1 = jax.grad(lambda w_: (pc.det_conv3x3(x, w_, b, jnp.float32, True) ** 2).sum())(w)
    g2 = jax.grad(lambda w_: (pc._conv3x3_xla(x, w_, b, compute_dtype=jnp.float32) ** 2).sum())(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_conv_module_param_layout_unchanged():
    """3x3/s1 Conv keeps nn.Conv's param names/shapes (checkpoint compat)
    and its XLA fallback equals the original nn.Conv formulation."""
    from flax import linen as nn

    m = Conv(16, kernel_size=3, stride=1)
    x = _rand((2, 8, 6, 4), 9)
    p = m.init(jax.random.key(0), x)
    assert p["params"]["conv"]["kernel"].shape == (3, 3, 4, 16)
    assert p["params"]["conv"]["bias"].shape == (16,)

    y = m.apply(p, x)
    ref = nn.Conv(
        16, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
        param_dtype=jnp.float32, name="conv",
    ).apply({"params": p["params"]["conv"]}, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
