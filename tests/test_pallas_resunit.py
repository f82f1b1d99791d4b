"""Fused ResidualUnit kernel vs the unfused XLA chain (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from resdsic_tpu.ops.pallas_resunit import (
    _resunit_xla,
    fused_residual_unit,
)


def _weights(rng, c):
    c2 = c // 2
    return (
        jnp.asarray(rng.normal(size=(c, c2)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(c2,)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(3, 3, c2, c2)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(c2,)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(c2, c)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1),
    )


def test_fused_resunit_matches_xla():
    rng = np.random.default_rng(0)
    c = 64
    x = jnp.asarray(rng.normal(size=(2, 12, 16, c)).astype(np.float32))
    w = _weights(rng, c)

    got = fused_residual_unit(x, *w, jnp.float32, True)
    want = _resunit_xla(x, *w, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_fused_resunit_tiled_halo():
    """Force multi-tile H so the halo row masking is exercised: results at
    every row (esp. tile seams and image borders) must match the SAME-pad
    unfused conv."""
    import resdsic_tpu.ops.pallas_resunit as m

    rng = np.random.default_rng(1)
    c = 32
    x = jnp.asarray(rng.normal(size=(1, 16, 8, c)).astype(np.float32))
    w = _weights(rng, c)

    orig = m._VMEM_BUDGET
    m._VMEM_BUDGET = 48 * 1024  # force TH < H
    try:
        tiles = m._tile_heights(16, 8, c, c // 2, 4)
        assert len(tiles) > 1, tiles
        got = fused_residual_unit(x, *w, jnp.float32, True)
    finally:
        m._VMEM_BUDGET = orig
    want = _resunit_xla(x, *w, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_fused_resunit_gradient_matches_xla():
    rng = np.random.default_rng(2)
    c = 32
    x = jnp.asarray(rng.normal(size=(1, 8, 8, c)).astype(np.float32))
    w = _weights(rng, c)

    def f_pallas(x, *w_):
        return jnp.sum(fused_residual_unit(x, *w_, jnp.float32, True) ** 2)

    def f_xla(x, *w_):
        return jnp.sum(_resunit_xla(x, *w_, compute_dtype=jnp.float32) ** 2)

    g1 = jax.grad(f_pallas, argnums=tuple(range(7)))(x, *w)
    g2 = jax.grad(f_xla, argnums=tuple(range(7)))(x, *w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_resunit_module_param_tree_stable(monkeypatch):
    """The module creates the identical param tree whether or not the fused
    path is selected, so checkpoints are interchangeable."""
    from resdsic_tpu.nn.attention import ResidualUnit

    x = jnp.zeros((1, 8, 8, 16), jnp.float32)
    p_off = ResidualUnit(16, use_pallas=False).init(jax.random.key(0), x)
    tree_off = jax.tree_util.tree_structure(p_off)

    # fused=True init must build the same tree (kernel itself runs in
    # interpret mode only on TPU; init is eval_shape-free here so use
    # interpret via env is unnecessary — init traces fused_residual_unit,
    # which works under interpret=False tracing on CPU only through
    # jax.eval_shape; guard with init-only trace).
    shapes = jax.eval_shape(
        ResidualUnit(16, use_pallas=True).init, jax.random.key(0), x
    )
    tree_on = jax.tree_util.tree_structure(shapes)
    assert tree_on == tree_off


def test_fused_resunit_disabled_by_default(monkeypatch):
    from resdsic_tpu.ops.pallas_resunit import fused_resunit_enabled

    monkeypatch.delenv("RESDSIC_FUSED_RU", raising=False)
    assert not fused_resunit_enabled()
    monkeypatch.setenv("RESDSIC_FUSED_RU", "1")
    assert fused_resunit_enabled()
