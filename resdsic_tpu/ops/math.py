"""Core differentiable ops (jax.custom_vjp), TPU-first.

Behavioral parity targets (reference, PyTorch):
  - ste_round:             src/compress/ops/ops.py:20-34
  - LowerBound:            src/compress/ops/bound_ops.py:21-65
  - NonNegativeParametrizer: src/compress/ops/parametrizers.py:23-49
  - compute_padding:       compressai.ops (used at src/compress/training/step.py:7)

These are pure functions — no module state — so they trace cleanly under jit
and fuse into surrounding XLA computations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def ste_round(x: jax.Array) -> jax.Array:
    """Round with a straight-through (identity) gradient.

    Matches `round(x) - x.detach() + x` (ref: src/compress/ops/ops.py:20-34).
    """
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


@jax.custom_vjp
def lower_bound(x: jax.Array, bound: jax.Array) -> jax.Array:
    """max(x, bound) with gated gradient.

    Gradient passes through x iff (x >= bound) or (upstream grad pushes x up,
    i.e. g < 0 for a minimization step) — exactly the reference autograd rule
    (src/compress/ops/bound_ops.py:25-27: `pass_through = (x >= bound) | (g < 0)`).
    No gradient flows to `bound`.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), jnp.zeros_like(bound))


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


class LowerBound:
    """Callable wrapper mirroring the reference module form.

    ref: src/compress/ops/bound_ops.py:44-65.
    """

    def __init__(self, bound: float):
        self.bound = float(bound)

    def __call__(self, x: jax.Array) -> jax.Array:
        return lower_bound(x, jnp.asarray(self.bound, dtype=x.dtype))


class NonNegativeParametrizer:
    """Sqrt-space reparametrization keeping values >= minimum.

    Stored parameter lives in sqrt space; `init` maps a target value into
    parameter space, `__call__` maps back (ref: src/compress/ops/
    parametrizers.py:23-49; pedestal = 2**-36).
    """

    def __init__(self, minimum: float = 0.0, reparam_offset: float = 2**-18):
        self.minimum = float(minimum)
        self.reparam_offset = float(reparam_offset)
        self.pedestal = self.reparam_offset**2
        self.bound = (self.minimum + self.reparam_offset**2) ** 0.5

    def init(self, x: jax.Array) -> jax.Array:
        return jnp.sqrt(jnp.maximum(x + self.pedestal, self.pedestal))

    def __call__(self, x: jax.Array) -> jax.Array:
        out = lower_bound(x, jnp.asarray(self.bound, dtype=x.dtype))
        return out**2 - self.pedestal


def compute_padding(in_h: int, in_w: int, *, out_h=None, out_w=None, min_div=1):
    """Padding to make (in_h, in_w) a multiple of min_div (centered).

    Returns (pad, unpad) tuples usable with jnp.pad / slicing, laid out like
    torch.nn.functional.pad order (left, right, top, bottom) to mirror
    compressai.ops.compute_padding used at src/compress/training/step.py:237.
    """
    if out_h is None:
        out_h = (in_h + min_div - 1) // min_div * min_div
    if out_w is None:
        out_w = (in_w + min_div - 1) // min_div * min_div

    if out_h % min_div != 0 or out_w % min_div != 0:
        raise ValueError(f"Padded size must be divisible by {min_div}")

    left = (out_w - in_w) // 2
    right = out_w - in_w - left
    top = (out_h - in_h) // 2
    bottom = out_h - in_h - top

    pad = (left, right, top, bottom)
    unpad = (-left, -right, -top, -bottom)
    return pad, unpad


def bucket_dim(n: int, min_div: int = 64) -> int:
    """Round a padded dimension up to a bucketed size: a multiple of
    min_div whose unit count keeps 3 significant bits (1..8, 10, 12, 14,
    16, 20, 24, 28, 32, 40, ... units) — <= 4/3 overpad vs the plain x64
    pad, typically ~10%.

    Varied datasets (CLIC's 2K shapes — SURVEY §7 hard part 5) would
    otherwise trigger a fresh XLA compile per distinct padded shape; this
    bounds the distinct shapes to O(log) per dimension at <= 1/3 (typically
    ~10%) spatial overpad. Overpadded rows/cols still get entropy-coded
    (flat replicate-padding is cheap but not free), so bucketing trades a
    little bpp for bounded compiles — opt-in at eval (--bucket-shapes).
    """
    units = -(-n // min_div)
    if units > 8:
        step = 1 << (units.bit_length() - 3)
        units = -(-units // step) * step
    return units * min_div


def compute_bucketed_padding(in_h: int, in_w: int, *, min_div: int = 64):
    """compute_padding with bucketed target dims (see bucket_dim)."""
    return compute_padding(
        in_h, in_w,
        out_h=bucket_dim(in_h, min_div),
        out_w=bucket_dim(in_w, min_div),
        min_div=min_div,
    )


def pad_image(x: jax.Array, pad) -> jax.Array:
    """Replication-pad an NHWC image batch with (left, right, top, bottom)."""
    left, right, top, bottom = pad
    return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)), mode="edge")


def unpad_image(x: jax.Array, unpad) -> jax.Array:
    """Inverse of pad_image; unpad is (-left, -right, -top, -bottom)."""
    left, right, top, bottom = (-v for v in unpad)
    h, w = x.shape[1], x.shape[2]
    return x[:, top : h - bottom, left : w - right, :]
