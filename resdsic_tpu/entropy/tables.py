"""Host-side integer CDF table construction (model `update()` capability).

Builds the exact integer tables consumed by the native rANS runtime from
entropy-model parameters. Mirrors:
  - EntropyBottleneck.update  (ref entropy_models.py:356-394)
  - GaussianConditional.update (ref entropy_models.py:599-625)
  - get_scale_table            (ref models/WACNN/cnn.py:19-20)

This is deliberate host/numpy code: the tables are ragged integer state used
only at the Python↔C++ coding boundary, never inside jit.
"""

from __future__ import annotations

import numpy as np
import scipy.special
import scipy.stats

from ..coding import CdfTable, pmf_to_quantized_cdf_batch

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def get_scale_table(
    minimum: float = SCALES_MIN,
    maximum: float = SCALES_MAX,
    levels: int = SCALES_LEVELS,
) -> np.ndarray:
    """Log-spaced scale grid (Ballé): exp(linspace(log min, log max))."""
    return np.exp(
        np.linspace(np.log(minimum), np.log(maximum), levels, dtype=np.float32)
    ).astype(np.float32)


def _logits_cumulative_np(params: dict, x: np.ndarray) -> np.ndarray:
    """Numpy mirror of EntropyBottleneck._logits_cumulative; x is (C,1,L) f32."""
    n_layers = sum(1 for k in params if k.startswith("matrix_"))
    logits = x.astype(np.float32)
    for i in range(n_layers):
        m = np.logaddexp(0.0, np.asarray(params[f"matrix_{i}"], np.float32))
        logits = np.einsum("cof,cfl->col", m, logits)
        logits = logits + np.asarray(params[f"bias_{i}"], np.float32)
        if f"factor_{i}" in params:
            f = np.asarray(params[f"factor_{i}"], np.float32)
            logits = logits + np.tanh(f) * np.tanh(logits)
    return logits


def eb_medians(eb_params: dict) -> np.ndarray:
    """Per-channel medians (C,) from the quantiles parameter."""
    q = np.asarray(eb_params["quantiles"], np.float32)
    return q[:, 0, 1]


def build_eb_table(eb_params: dict, precision: int = 16) -> CdfTable:
    """Integer CDFs for an EntropyBottleneck from its param dict.

    Follows ref entropy_models.py:356-394: per-channel pmf over
    [median - minima, median + maxima] with tail mass from both sigmoid tails.
    """
    q = np.asarray(eb_params["quantiles"], np.float32)  # (C,1,3)
    medians = q[:, 0, 1]
    minima = np.clip(np.ceil(medians - q[:, 0, 0]).astype(np.int32), 0, None)
    maxima = np.clip(np.ceil(q[:, 0, 2] - medians).astype(np.int32), 0, None)

    pmf_start = medians - minima
    pmf_length = (maxima + minima + 1).astype(np.int32)
    max_length = int(pmf_length.max())

    samples = np.arange(max_length, dtype=np.float32)[None, :] + pmf_start[:, None]
    samples = samples[:, None, :]  # (C, 1, L)

    lower = _logits_cumulative_np(eb_params, samples - 0.5)
    upper = _logits_cumulative_np(eb_params, samples + 0.5)
    sign = -np.sign(lower + upper)
    pmf = np.abs(
        scipy.special.expit(sign * upper) - scipy.special.expit(sign * lower)
    )[:, 0, :]
    tail_mass = (
        scipy.special.expit(lower[:, 0, :1]) + scipy.special.expit(-upper[:, 0, -1:])
    ).ravel()

    table = pmf_to_quantized_cdf_batch(pmf, tail_mass, pmf_length, precision)
    return CdfTable(cdf=table.cdf, cdf_length=table.cdf_length, offset=-minima)


def build_gc_table(
    scale_table: np.ndarray, tail_mass: float = 1e-9, precision: int = 16
) -> CdfTable:
    """Integer CDFs for a GaussianConditional over a discrete scale grid.

    Follows ref entropy_models.py:599-625.
    """
    scales = np.asarray(scale_table, np.float64).ravel()
    multiplier = -scipy.stats.norm.ppf(tail_mass / 2)
    pmf_center = np.ceil(scales * multiplier).astype(np.int32)
    pmf_length = (2 * pmf_center + 1).astype(np.int32)
    max_length = int(pmf_length.max())

    samples = np.abs(
        np.arange(max_length, dtype=np.int32)[None, :] - pmf_center[:, None]
    ).astype(np.float32)
    s = scales.astype(np.float32)[:, None]
    upper = 0.5 * scipy.special.erfc(-(2**-0.5) * ((0.5 - samples) / s))
    lower = 0.5 * scipy.special.erfc(-(2**-0.5) * ((-0.5 - samples) / s))
    pmf = (upper - lower).astype(np.float32)
    tail = (2 * lower[:, :1]).astype(np.float32).ravel()

    table = pmf_to_quantized_cdf_batch(pmf, tail, pmf_length, precision)
    return CdfTable(cdf=table.cdf, cdf_length=table.cdf_length, offset=-pmf_center)


def eb_build_indexes(shape, channels: int) -> np.ndarray:
    """Channel-index pattern for an NHWC batch (B, H, W, C) flattened."""
    b, h, w, c = shape
    assert c == channels
    return np.broadcast_to(
        np.arange(c, dtype=np.int32), (b, h, w, c)
    )
