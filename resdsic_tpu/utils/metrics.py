"""Image quality metrics in pure JAX (PSNR, MS-SSIM).

MS-SSIM follows Wang et al. 2003 with the standard 5-scale weights and an
11-tap gaussian window (sigma 1.5) — the same formulation as pytorch_msssim
used by the reference (src/compress/training/step.py:5,14-15). NHWC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise valid-mode 2D filter, NHWC."""
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None], kernel.shape + (1, c))
    # depthwise: feature_group_count = C with HWIO (kh, kw, 1, C)
    return jax.lax.conv_general_dilated(
        x,
        k.reshape(kernel.shape + (1, c)),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _ssim_components(x, y, data_range=1.0, win_size=11, sigma=1.5):
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = jnp.asarray(_gaussian_kernel(win_size, sigma))

    mu_x = _filter2d(x, kernel)
    mu_y = _filter2d(y, kernel)
    sigma_x = _filter2d(x * x, kernel) - mu_x**2
    sigma_y = _filter2d(y * y, kernel) - mu_y**2
    sigma_xy = _filter2d(x * y, kernel) - mu_x * mu_y

    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)) * cs
    return jnp.mean(ssim_map, axis=(1, 2, 3)), jnp.mean(cs, axis=(1, 2, 3))


def _avg_pool2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


@functools.partial(jax.jit, static_argnames=("data_range",))
def ms_ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Multi-scale SSIM over the batch, returns (B,) values in [0, 1].

    Uses the standard 5 scales when the image is large enough; smaller
    images drop scales (weights renormalized) instead of producing NaNs.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    win = 11
    # number of scales the spatial size supports (filter is VALID-mode)
    levels = 1
    m = min(x.shape[1], x.shape[2])
    while levels < len(_MSSSIM_WEIGHTS) and (m // 2) >= win:
        levels += 1
        m //= 2
    weights = np.asarray(_MSSSIM_WEIGHTS[:levels], np.float32)
    weights = weights / weights.sum()

    mcs = []
    ssim_val = None
    for i in range(levels):
        ssim_val, cs = _ssim_components(x, y, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _avg_pool2(x)
            y = _avg_pool2(y)
    w = jnp.asarray(weights)
    result = jax.nn.relu(ssim_val) ** w[-1]
    if mcs:
        mcs_stack = jnp.stack(mcs, axis=0)  # (levels-1, B)
        result = result * jnp.prod(mcs_stack ** w[:-1, None], axis=0)
    return result
