"""resdsic_tpu — TPU-native scalable learned image compression framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the
AlbertoPresta/ResDSIC reference (PyTorch): two-layer (base + progressive)
scalable WACNN codecs, a TCM Swin codec, rate-distortion training, and real
rANS bitstreams produced by a native C++ entropy-coding runtime.

Layout:
    ops/      ste_round / LowerBound / parametrizers / padding (jax.custom_vjp)
    coding/   native C++ rANS coder + exact integer CDF quantization (ctypes)
    entropy/  EntropyBottleneck & GaussianConditional (Flax, XLA likelihoods)
    nn/       conv/deconv/GDN/window-attention building blocks (NHWC, MXU-friendly)
    models/   WACNN + scalable family + TCM, same registry keys as the reference
    parallel/ jax.sharding Mesh utilities (data-parallel pjit over ICI)
    training/ RD losses, pjit train step, optax optimizers, plateau LR schedule
    data/     image datasets (OpenImages-style folders, Kodak/CLIC)
    utils/    metrics (PSNR/MS-SSIM), checkpointing (orbax + torch converter)
    cli/      train / eval_model / test drivers mirroring the reference flags

Entropy-coder registry mirrors the reference `src/compress/__init__.py:22-62`.
"""

from __future__ import annotations

__version__ = "0.1.0"

_entropy_coder = "ans"
_available_entropy_coders = ["ans", "rangecoder"]


def set_entropy_coder(entropy_coder: str) -> None:
    """Select the default entropy coder (ref: src/compress/__init__.py:31-46)."""
    global _entropy_coder
    if entropy_coder not in _available_entropy_coders:
        raise ValueError(
            f'Invalid entropy coder "{entropy_coder}", choose from '
            f"({', '.join(_available_entropy_coders)})."
        )
    _entropy_coder = entropy_coder


def get_entropy_coder() -> str:
    """Return the name of the default entropy coder."""
    return _entropy_coder


def available_entropy_coders() -> list[str]:
    """List the available entropy coders."""
    return list(_available_entropy_coders)
