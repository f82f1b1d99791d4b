"""Deterministic Pallas matmul / LayerNorm vs the XLA formulations
(interpret mode).

These kernels back TCM's decode-relevant 1x1 convs, Swin MLP Dense
layers and LayerNorms (ops/pallas_matmul.py docstring) — the pieces
whose XLA lowering diverged between the fused encoder and the decode
programs on TPU v5e and desynced the TCM rANS stream. Tests pin value
agreement with XLA, the row-tiling/padding path, gradients, and the
module routing (param-tree compatibility with nn.Conv/nn.Dense/
nn.LayerNorm).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from resdsic_tpu.ops import pallas_matmul as pm


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
        * scale
    )


def test_det_matmul_matches_xla():
    x = _rand((37, 24), 0)  # odd rows -> padded tile
    w = _rand((24, 16), 1, 0.1)
    b = _rand((16,), 2, 0.1)
    out = pm.det_matmul(x, w, b, jnp.float32, True)
    ref = pm._matmul_xla(x, w, b, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_det_matmul_tiled():
    """Force multiple row tiles; result still matches XLA."""
    x = _rand((100, 8), 3)
    w = _rand((8, 8), 4, 0.1)
    b = _rand((8,), 5, 0.1)
    old = pm._VMEM_BUDGET
    pm._VMEM_BUDGET = 4000  # tiny budget -> several tiles
    try:
        tr = pm._row_tile(100, 8, 8, 4)
        assert tr < 100
        out = pm.det_matmul(x, w, b, jnp.float32, True)
    finally:
        pm._VMEM_BUDGET = old
    ref = pm._matmul_xla(x, w, b, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_det_matmul_grad_matches_xla():
    x = _rand((10, 6), 6)
    w = _rand((6, 4), 7, 0.1)
    b = _rand((4,), 8, 0.1)

    def f_pallas(x_, w_, b_):
        return jnp.sum(pm.det_matmul(x_, w_, b_, jnp.float32, True) ** 2)

    def f_xla(x_, w_, b_):
        return jnp.sum(
            pm._matmul_xla(x_, w_, b_, compute_dtype=jnp.float32) ** 2
        )

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_det_layernorm_matches_flax():
    """Values must match flax nn.LayerNorm (the module it replaces) —
    f32 statistics, fast-variance form, eps 1e-6."""
    x = _rand((33, 48), 9)
    scale = _rand((48,), 10, 0.3) + 1.0
    bias = _rand((48,), 11, 0.1)
    out = pm.det_layernorm(x, scale, bias, 1e-6, jnp.float32, True)
    ln = nn.LayerNorm(epsilon=1e-6)
    ref = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_det_layernorm_grad():
    x = _rand((8, 16), 12)
    scale = jnp.ones((16,))
    bias = jnp.zeros((16,))

    def f_pallas(x_):
        return jnp.sum(
            pm.det_layernorm(x_, scale, bias, 1e-6, jnp.float32, True) ** 2
        )

    def f_xla(x_):
        return jnp.sum(
            pm._ln_xla(x_, scale, bias, eps=1e-6, out_dtype=jnp.float32) ** 2
        )

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_pallas)(x)), np.asarray(jax.grad(f_xla)(x)),
        rtol=1e-4, atol=1e-5,
    )


def test_conv1x1_module_routing(monkeypatch):
    """Conv(k=1, s=1) keeps nn.Conv's param tree and routes through the
    deterministic path; forced-on interpret kernel equals the XLA path."""
    from resdsic_tpu.nn.conv import Conv

    x = _rand((2, 6, 5, 12), 13)
    m = Conv(7, kernel_size=1, stride=1)
    p = m.init(jax.random.key(0), x)
    k = p["params"]["conv"]["kernel"]
    assert k.shape == (1, 1, 12, 7)  # nn.Conv-compatible layout
    ref = m.apply(p, x)

    import sys

    conv_mod = sys.modules["resdsic_tpu.nn.conv"]
    monkeypatch.setenv("RESDSIC_DET_CONV", "1")
    monkeypatch.setattr(conv_mod, "det_matmul",
                        lambda a, w, b, dt: pm._matmul_pallas_raw(
                            a, w, b, compute_dtype=dt, interpret=True))
    out = m.apply(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_swin_block_det_modules_param_tree():
    """DetLayerNorm/DetDense keep the nn.LayerNorm/nn.Dense param names
    the torch converter maps (ln1/ln2 {scale,bias}, mlp_0/mlp_2
    {kernel,bias})."""
    from resdsic_tpu.nn.swin import SwinTransformerBlock

    x = _rand((1, 8, 8, 16), 14)
    m = SwinTransformerBlock(16, 16, 8, 4)
    p = m.init(jax.random.key(0), x)
    t = p["params"]
    assert set(t["ln1"]) == {"scale", "bias"}
    assert set(t["ln2"]) == {"scale", "bias"}
    assert t["mlp_0"]["kernel"].shape == (16, 64)
    assert t["mlp_2"]["kernel"].shape == (64, 16)
    out = m.apply(p, x)
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))
