"""Entropy models as Flax modules — all likelihood math stays in XLA.

Behavioral parity targets (reference):
  - EntropyBottleneck:   src/compress/entropy_models/entropy_models.py:295-523
  - GaussianConditional: src/compress/entropy_models/entropy_models.py:526-668

Design notes (TPU-first):
  * forward() paths are pure jit-traceable functions of params — noise rng
    comes from flax's rng streams, no module mutation.
  * integer CDF tables (needed only for real coding) are built host-side from
    the same params by `resdsic_tpu.entropy.tables` and kept OUT of the param
    pytree (they are ragged integer state, not differentiable weights).
  * likelihood math is forced to float32 even under bfloat16 activations —
    erfc/sigmoid tail behavior matters for rate estimates.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.math import lower_bound

_LIKELIHOOD_BOUND = 1e-9


class EntropyBottleneck(nn.Module):
    """Ballé factorized prior (non-parametric, per-channel monotone MLP).

    Params mirror the reference layout: matrix_i (C, f_out, f_in),
    bias_i (C, f_out, 1), factor_i (C, f_out, 1), quantiles (C, 1, 3).
    """

    channels: int
    tail_mass: float = 1e-9
    init_scale: float = 10.0
    filters: Tuple[int, ...] = (3, 3, 3, 3)

    def setup(self):
        fs = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        C = self.channels

        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init_val = float(np.log(np.expm1(1 / scale / fs[i + 1])))
            matrices.append(
                self.param(
                    f"matrix_{i}",
                    lambda k, s, v=init_val: jnp.full(s, v, jnp.float32),
                    (C, fs[i + 1], fs[i]),
                )
            )
            biases.append(
                self.param(
                    f"bias_{i}",
                    lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.5, 0.5),
                    (C, fs[i + 1], 1),
                )
            )
            if i < len(self.filters):
                factors.append(
                    self.param(
                        f"factor_{i}",
                        lambda k, s: jnp.zeros(s, jnp.float32),
                        (C, fs[i + 1], 1),
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors

        self.quantiles = self.param(
            "quantiles",
            lambda k, s: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale], jnp.float32),
                (C, 1, 1),
            ),
            (C, 1, 3),
        )

    def _logits_cumulative(self, x: jax.Array, stop_gradient: bool) -> jax.Array:
        """Monotone per-channel MLP; x is (C, 1, L) float32."""
        logits = x
        for i in range(len(self.filters) + 1):
            m = self._matrices[i]
            b = self._biases[i]
            if stop_gradient:
                m = jax.lax.stop_gradient(m)
                b = jax.lax.stop_gradient(b)
            logits = jnp.einsum(
                "cof,cfl->col", jax.nn.softplus(m), logits,
                preferred_element_type=jnp.float32,
            )
            logits = logits + b
            if i < len(self.filters):
                f = self._factors[i]
                if stop_gradient:
                    f = jax.lax.stop_gradient(f)
                logits = logits + jnp.tanh(f) * jnp.tanh(logits)
        return logits

    def _likelihood(self, values: jax.Array) -> jax.Array:
        lower = self._logits_cumulative(values - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(values + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
        )

    def medians(self) -> jax.Array:
        """Per-channel medians, shape (C,)."""
        return self.quantiles[:, 0, 1]

    def aux_loss(self) -> jax.Array:
        """Quantile-fitting loss; gradients reach ONLY `quantiles`.

        ref: entropy_models.py:396-399 (stop_gradient=True on the MLP params).
        """
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = float(np.log(2 / self.tail_mass - 1))
        target = jnp.array([-t, 0.0, t], jnp.float32)
        return jnp.abs(logits - target).sum()

    def __call__(
        self, x: jax.Array, training: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (x_tilde, likelihoods); x is NHWC with C == self.channels."""
        C = self.channels
        in_shape = x.shape
        # (B, ..., C) -> (C, 1, B*spatial), float32 entropy math
        values = jnp.moveaxis(x, -1, 0).reshape(C, 1, -1).astype(jnp.float32)
        medians = self.quantiles[:, :, 1:2]  # (C, 1, 1)

        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), values.shape, jnp.float32, -0.5, 0.5
            )
            outputs = values + noise
        else:
            outputs = jnp.round(values - medians) + medians

        likelihood = self._likelihood(outputs)
        likelihood = lower_bound(likelihood, jnp.float32(_LIKELIHOOD_BOUND))

        outputs = jnp.moveaxis(
            outputs.reshape((C,) + in_shape[:-1]), 0, -1
        ).astype(x.dtype)
        likelihood = jnp.moveaxis(likelihood.reshape((C,) + in_shape[:-1]), 0, -1)
        return outputs, likelihood


def _standardized_cumulative(x: jax.Array) -> jax.Array:
    """Φ(x) via erfc for tail precision (ref: entropy_models.py:579-583)."""
    const = -(2**-0.5)
    return 0.5 * jax.lax.erfc(const * x)


class GaussianConditional(nn.Module):
    """Conditional gaussian entropy model (mean/scale from a hyperprior).

    Stateless apart from rng for training noise; the discrete scale table
    lives host-side (tables.build_gc_table) for real coding.
    """

    scale_bound: float = 0.11
    tail_mass: float = 1e-9

    @nn.compact
    def __call__(
        self,
        inputs: jax.Array,
        scales: jax.Array,
        means: Optional[jax.Array] = None,
        training: bool = False,
        mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        x = inputs.astype(jnp.float32)
        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), x.shape, jnp.float32, -0.5, 0.5
            )
            if mask is not None:
                # local reference modification: mask multiplies the noise
                # (entropy_models.py:134-135)
                noise = noise * mask
            outputs = x + noise
        else:
            if means is not None:
                outputs = jnp.round(x - means) + means
            else:
                outputs = jnp.round(x)

        likelihood = self._likelihood(outputs, scales, means)
        likelihood = lower_bound(likelihood, jnp.float32(_LIKELIHOOD_BOUND))
        return outputs.astype(inputs.dtype), likelihood

    def _likelihood(self, values, scales, means=None):
        if means is not None:
            values = values - means
        scales = lower_bound(
            scales.astype(jnp.float32), jnp.float32(self.scale_bound)
        )
        values = jnp.abs(values.astype(jnp.float32))
        upper = _standardized_cumulative((0.5 - values) / scales)
        lower = _standardized_cumulative((-0.5 - values) / scales)
        return upper - lower


def quantize_symbols(x: jax.Array, means: Optional[jax.Array] = None) -> jax.Array:
    """Quantize to integer symbols (ref quantize(..., "symbols", means)).

    Clamped to int16 range: symbols are small residuals in practice (the
    rANS bypass path covers the tails), and int16-width symbols halve the
    device→host transfer that dominates codec latency on tunneled TPUs.
    """
    if means is not None:
        x = x - means
    return jnp.clip(jnp.round(x), -32768, 32767).astype(jnp.int32)


def gc_build_indexes(
    scales: jax.Array, scale_table: jax.Array, scale_bound: float = 0.11
) -> jax.Array:
    """Map scales to scale-table bins.

    Equivalent to the reference 64-iteration threshold loop
    (entropy_models.py:663-668): index = #{s in table[:-1] : s < scale}.
    Computed as a broadcast compare-and-sum over the 63 thresholds — on TPU
    this is one fused VPU reduction, where jnp.searchsorted lowers to a
    serial while-loop that measured >100x slower inside the fused encoder.
    The two are exactly equal (tests/test_entropy_models.py pins it).
    """
    scales = lower_bound(
        scales.astype(jnp.float32), jnp.float32(scale_bound)
    )
    thresholds = scale_table[:-1].astype(jnp.float32)
    return jnp.sum(
        (thresholds < scales[..., None]).astype(jnp.int32), axis=-1
    )
