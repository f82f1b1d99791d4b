"""Fused Pallas GDN vs the XLA formulation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from resdsic_tpu.ops.pallas_gdn import gdn_pallas


def test_pallas_gdn_matches_xla():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 128)).astype(np.float32)
    gamma = (0.05 * np.eye(128) + 0.001 * rng.uniform(size=(128, 128))).astype(
        np.float32
    )
    beta = rng.uniform(0.5, 1.5, 128).astype(np.float32)

    out = gdn_pallas(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
                     False, True)
    expected = x / np.sqrt(beta + (x**2) @ gamma)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5, atol=1e-6)

    out_inv = gdn_pallas(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
                         True, True)
    np.testing.assert_allclose(
        np.asarray(out_inv), x * np.sqrt(beta + (x**2) @ gamma),
        rtol=2e-5, atol=1e-6,
    )


def test_pallas_gdn_gradient_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 128)).astype(np.float32))
    gamma = jnp.asarray(
        (0.05 * np.eye(128) + 0.001 * rng.uniform(size=(128, 128))).astype(
            np.float32
        )
    )
    beta = jnp.asarray(rng.uniform(0.5, 1.5, 128).astype(np.float32))

    def f_pallas(x, gamma, beta):
        return jnp.sum(gdn_pallas(x, gamma, beta, False, True) ** 2)

    def f_xla(x, gamma, beta):
        y = x / jnp.sqrt(beta + (x**2).reshape(-1, 128) @ gamma).reshape(x.shape)
        return jnp.sum(y**2)

    g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(x, gamma, beta)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_gdn_module_pallas_flag():
    from resdsic_tpu.nn import GDN

    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 8, 16, 128)).astype(np.float32)
    )
    m_x = GDN()
    p = m_x.init(jax.random.key(0), x)
    ref = m_x.apply(p, x)
    # interpret-mode pallas path off-device: patch via interpret through env
    # (on TPU use_pallas=True compiles the real kernel)
    from resdsic_tpu.ops import pallas_gdn as pg

    orig = pg.gdn_pallas

    import functools

    def interp(xv, g, b, inverse=False, interpret=False):
        return orig(xv, g, b, inverse, True)

    pg_backup = pg.gdn_pallas
    try:
        pg.gdn_pallas = interp
        m_p = GDN(use_pallas=True)
        out = m_p.apply(p, x)
    finally:
        pg.gdn_pallas = pg_backup
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=1e-6)
