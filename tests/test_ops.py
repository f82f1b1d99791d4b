import jax
import jax.numpy as jnp
import numpy as np

from resdsic_tpu.ops import (
    LowerBound,
    NonNegativeParametrizer,
    compute_padding,
    lower_bound,
    ste_round,
)
from resdsic_tpu.ops.math import pad_image, unpad_image


def test_ste_round_values_and_grad():
    x = jnp.array([-1.6, -0.4, 0.4, 1.5, 2.5])
    np.testing.assert_allclose(ste_round(x), np.round(x))
    g = jax.grad(lambda v: jnp.sum(ste_round(v) * jnp.arange(5.0)))(x)
    np.testing.assert_allclose(g, np.arange(5.0))


def test_lower_bound_forward():
    x = jnp.array([-1.0, 0.5, 2.0])
    np.testing.assert_allclose(lower_bound(x, jnp.float32(1.0)), [1.0, 1.0, 2.0])


def test_lower_bound_gradient_gating():
    # Reference rule (bound_ops.py:25-27): grad passes iff x >= bound or g < 0.
    bound = jnp.float32(1.0)

    def f(x):
        return jnp.sum(lower_bound(x, bound))

    g = jax.grad(f)(jnp.array([0.5, 2.0]))
    # upstream g = +1 everywhere: blocked below bound, passes above
    np.testing.assert_allclose(g, [0.0, 1.0])

    def f_neg(x):
        return -jnp.sum(lower_bound(x, bound))

    g = jax.grad(f_neg)(jnp.array([0.5, 2.0]))
    # upstream g = -1: passes everywhere
    np.testing.assert_allclose(g, [-1.0, -1.0])


def test_nonneg_parametrizer_roundtrip():
    p = NonNegativeParametrizer(minimum=1e-6)
    target = jnp.array([1.0, 0.1, 2.0])
    raw = p.init(target)
    out = p(raw)
    np.testing.assert_allclose(out, target, rtol=1e-5, atol=1e-7)
    # Clamps at minimum for tiny raw params
    tiny = p(jnp.zeros(3))
    assert np.all(np.asarray(tiny) >= 0)


def test_lowerbound_module():
    lb = LowerBound(0.11)
    np.testing.assert_allclose(lb(jnp.array([0.05, 0.5])), [0.11, 0.5])


def test_compute_padding_and_pad_unpad():
    pad, unpad = compute_padding(500, 700, min_div=64)
    assert (500 + pad[2] + pad[3]) % 64 == 0
    assert (700 + pad[0] + pad[1]) % 64 == 0
    x = jnp.arange(500 * 700 * 3, dtype=jnp.float32).reshape(1, 500, 700, 3)
    xp = pad_image(x, pad)
    assert xp.shape == (1, 512, 704, 3)
    xu = unpad_image(xp, unpad)
    np.testing.assert_array_equal(xu, x)


def test_bucket_dim():
    """Bucketed padded dims keep <=2 significant bits of 64-units: CLIC's
    varied 2K shapes map to O(log) distinct geometries (SURVEY §7 hard
    part 5)."""
    from resdsic_tpu.ops.math import bucket_dim

    assert bucket_dim(64) == 64
    assert bucket_dim(256) == 256
    assert bucket_dim(257) == 320  # 5 units (small counts stay exact)
    assert bucket_dim(768) == 768  # 12 units ok
    assert bucket_dim(769) == 896  # 13 -> 14 units
    assert bucket_dim(1365) == 1536  # 22 -> 24 units
    assert bucket_dim(2048) == 2048
    for n in range(1, 4096, 37):
        b = bucket_dim(n)
        assert b >= n and b % 64 == 0
        assert b * 3 <= ((n + 63) // 64) * 64 * 4  # <= 4/3 of the x64 pad
    # all CLIC-ish sizes collapse to few buckets
    dims = {bucket_dim(n) for n in range(1200, 2200)}
    assert len(dims) <= 6


def test_compute_bucketed_padding_roundtrip():
    import numpy as np

    from resdsic_tpu.ops.math import compute_bucketed_padding, unpad_image

    pad, unpad = compute_bucketed_padding(100, 200, min_div=64)
    x = np.arange(100 * 200 * 3, dtype=np.float32).reshape(1, 100, 200, 3)
    xp = np.pad(x, ((0, 0), (pad[2], pad[3]), (pad[0], pad[1]), (0, 0)))
    assert xp.shape[1] % 64 == 0 and xp.shape[2] % 64 == 0
    np.testing.assert_array_equal(unpad_image(xp, unpad), x)
