"""Generalized Divisive Normalization (ref: src/compress/layers/gdn.py:26-104).

y[i] = x[i] / sqrt(beta[i] + sum_j gamma[j,i] * x[j]^2)   (inverse: * sqrt)

TPU-first: the 1x1 "conv" is a single channel-mixing matmul (MXU) fused with
the square / rsqrt / multiply elementwise chain by XLA. Params are stored in
sqrt space via NonNegativeParametrizer, matching the reference so converted
checkpoints load directly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.math import NonNegativeParametrizer
from ..ops.pallas_conv import pallas_conv_enabled


class GDN(nn.Module):
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    dtype: jnp.dtype = jnp.float32
    #: None = auto: fused Pallas kernel on TPU (RESDSIC_DET_CONV overrides,
    #: the shared deterministic-parameter-path switch), XLA elsewhere.
    #: The GDN's channel reduction (conv of x^2 against gamma) is exactly
    #: the accumulation-order hazard that desyncs the codec across
    #: separately compiled programs — TCM's hyper synthesis runs GDNs
    #: inside the decode-relevant path (ResidualBlockUpsample), so the
    #: deterministic kernel is required there (see ops/pallas_matmul.py).
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        beta_reparam = NonNegativeParametrizer(minimum=self.beta_min)
        gamma_reparam = NonNegativeParametrizer()

        beta = self.param(
            "beta",
            lambda k, s: beta_reparam.init(jnp.ones(s, jnp.float32)),
            (c,),
        )
        gamma = self.param(
            "gamma",
            lambda k, s: gamma_reparam.init(
                self.gamma_init * jnp.eye(c, dtype=jnp.float32)
            ),
            (c, c),
        )

        beta_v = beta_reparam(beta).astype(self.dtype)
        gamma_v = gamma_reparam(gamma).astype(self.dtype)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = pallas_conv_enabled()
        if use_pallas:
            from ..ops.pallas_gdn import gdn_pallas

            # kernel consumes gamma as (C_in, C_out): torch/our einsum uses
            # γ[o,i] so transpose once here
            return gdn_pallas(
                x.astype(self.dtype), gamma_v.T, beta_v, self.inverse
            )

        xx = jnp.square(x.astype(self.dtype))
        # torch: conv2d(x^2, gamma.reshape(C,C,1,1)) → out[o] = Σ_i γ[o,i] x²[i]
        norm = (
            jnp.einsum("bhwi,oi->bhwo", xx, gamma_v,
                       preferred_element_type=self.dtype)
            + beta_v
        )
        if self.inverse:
            norm = jnp.sqrt(norm)
        else:
            norm = jax.lax.rsqrt(norm)
        return x * norm


class GDN1(nn.Module):
    """Simplified GDN: y = x / (beta + Σ gamma |x|) (ref gdn.py:78-104)."""

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        beta_reparam = NonNegativeParametrizer(minimum=self.beta_min)
        gamma_reparam = NonNegativeParametrizer()
        beta = self.param(
            "beta",
            lambda k, s: beta_reparam.init(jnp.ones(s, jnp.float32)),
            (c,),
        )
        gamma = self.param(
            "gamma",
            lambda k, s: gamma_reparam.init(
                self.gamma_init * jnp.eye(c, dtype=jnp.float32)
            ),
            (c, c),
        )
        beta_v = beta_reparam(beta).astype(self.dtype)
        gamma_v = gamma_reparam(gamma).astype(self.dtype)
        norm = (
            jnp.einsum("bhwi,oi->bhwo", jnp.abs(x.astype(self.dtype)), gamma_v,
                       preferred_element_type=self.dtype)
            + beta_v
        )
        if not self.inverse:
            norm = 1.0 / norm
        return x * norm
