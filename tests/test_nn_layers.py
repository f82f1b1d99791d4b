import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from resdsic_tpu.nn import (
    GDN,
    Conv,
    Deconv,
    SubpelConv3x3,
    WinBasedAttention,
    WinNoShiftAttention,
    pixel_shuffle,
    window_partition,
    window_reverse,
)


def test_conv_shapes_match_torch():
    x = jnp.zeros((1, 64, 48, 3))
    for k, s in [(5, 2), (3, 1), (3, 2), (1, 1)]:
        m = Conv(16, kernel_size=k, stride=s)
        y, _ = m.init_with_output(jax.random.key(0), x)
        tref = torch.nn.Conv2d(3, 16, k, stride=s, padding=k // 2)
        tout = tref(torch.zeros(1, 3, 64, 48))
        assert y.shape == (1, tout.shape[2], tout.shape[3], 16), (k, s)


def test_deconv_matches_torch_exactly():
    """Value-level parity of Deconv vs torch ConvTranspose2d."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 9, 4)).astype(np.float32)
    w = rng.normal(size=(4, 6, 5, 5)).astype(np.float32) * 0.1  # (in,out,kh,kw)
    b = rng.normal(size=(6,)).astype(np.float32)

    tref = torch.nn.ConvTranspose2d(4, 6, 5, stride=2, output_padding=1, padding=2)
    with torch.no_grad():
        tref.weight.copy_(torch.from_numpy(w))
        tref.bias.copy_(torch.from_numpy(b))
    tout = tref(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()

    m = Deconv(6, kernel_size=5, stride=2)
    params = m.init(jax.random.key(0), jnp.asarray(x))
    # torch ConvTranspose weight (in,out,kh,kw) → our HWIO correlation kernel
    # of the flipped filter: flip spatial dims, then transpose to (kh,kw,in,out)
    kernel = np.flip(w, axis=(2, 3)).transpose(2, 3, 0, 1)
    params = {"params": {"kernel": jnp.asarray(kernel.copy()), "bias": jnp.asarray(b)}}
    y = m.apply(params, jnp.asarray(x))

    assert y.shape == (2, 14, 18, 6)
    np.testing.assert_allclose(np.asarray(y), tout.transpose(0, 2, 3, 1), atol=1e-4)


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 5, 12)).astype(np.float32)  # C*r^2 = 12, r=2 → C=3
    y = pixel_shuffle(jnp.asarray(x), 2)
    tout = torch.pixel_shuffle(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2).numpy()
    np.testing.assert_allclose(np.asarray(y), tout.transpose(0, 2, 3, 1), atol=1e-6)


def test_subpel_conv_shape():
    m = SubpelConv3x3(8, r=2)
    y, _ = m.init_with_output(jax.random.key(0), jnp.zeros((1, 16, 16, 4)))
    assert y.shape == (1, 32, 32, 8)


def test_gdn_matches_formula_and_inverse():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 6, 6, 5)).astype(np.float32)
    m = GDN()
    params = m.init(jax.random.key(0), jnp.asarray(x))
    y = m.apply(params, jnp.asarray(x))
    # freshly-initialized GDN: beta=1, gamma=0.1*I
    expected = x / np.sqrt(1.0 + 0.1 * x**2)
    np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)

    mi = GDN(inverse=True)
    pi = mi.init(jax.random.key(0), jnp.asarray(x))
    yi = mi.apply(pi, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yi), x * np.sqrt(1.0 + 0.1 * x**2), atol=1e-5)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 16 * 24 * 3, dtype=jnp.float32).reshape(2, 16, 24, 3)
    w = window_partition(x, 8)
    assert w.shape == (2 * 2 * 3, 64, 3)
    back = window_reverse(w, 8, 16, 24)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_win_based_attention_shapes_and_jit():
    m = WinBasedAttention(dim=32, num_heads=4, window_size=8, shift_size=4)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 32))
    params = m.init(jax.random.key(1), x)
    y = jax.jit(lambda p, v: m.apply(p, v))(params, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.slow
def test_win_noshift_attention_block():
    m = WinNoShiftAttention(dim=32, num_heads=8, window_size=8, shift_size=4)
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 32))
    params = m.init(jax.random.key(1), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    # gradient flows
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_shifted_window_mask_matches_torch_reference():
    """Mask construction parity with the reference's torch loop."""
    from resdsic_tpu.nn.attention import make_shift_attn_mask

    H, W, ws, shift = 16, 24, 8, 4
    ours = make_shift_attn_mask(H, W, ws, shift)

    img_mask = torch.zeros((1, H, W, 1))
    h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for h in h_slices:
        for w in h_slices:
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = img_mask.view(1, H // ws, ws, W // ws, ws, 1)
    mw = mw.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0).masked_fill(
        attn_mask == 0, 0.0
    )
    np.testing.assert_allclose(ours, attn_mask.numpy(), atol=0)
