"""Model registry (parity with ref src/compress/models/__init__.py:22-63).

Registry keys:
    "cnn"  → WACNN                       (baseline single-layer codec)
    "ind"  → ResWACNNIndependentEntropy  (DEFAULT; scalable, independent prog hyperprior)
    "icd"  → ScalableICD                 (scalable, single decoder, Mask in coding)
    "imd"  → ScalableIMD                 (icd + 2 decoders)
    "cicd" → ConditionalScalableICD      (icd + joiner merge policies)
    "cimd" → ConditionalScalableIMD      (cicd + 2 decoders)
"""

from __future__ import annotations

from .codec import ScalableCodec, WACNNCodec
from .scalable import ResWACNNIndependentEntropy, ResWACNNSharedEntropy
from .wacnn import WACNN

models = {
    "cnn": WACNN,
    "ind": ResWACNNIndependentEntropy,
}


def get_model(name: str):
    if name not in models:
        raise ValueError(f"Unknown model '{name}' (available: {sorted(models)})")
    return models[name]


def configure_model(args):
    """Build a model from a parsed-args namespace (ref models/__init__.py:33-63)."""
    name = getattr(args, "model", "cnn")
    cls = get_model(name)
    kwargs = {}
    if hasattr(args, "N"):
        kwargs["N"] = args.N
    if hasattr(args, "M"):
        kwargs["M"] = args.M
    if name != "cnn":
        kwargs.update(_scalable_kwargs(args))
    return cls(**kwargs)


def _scalable_kwargs(args):
    kwargs = {}
    for src, dst in [
        ("lambda_list", "lmbda_list"),
        ("mask_policy", "mask_policy"),
        ("lrp_prog", "lrp_prog"),
        ("independent_lrp", "independent_lrp"),
        ("multiple_decoder", "multiple_decoder"),
        ("joiner_policy", "joiner_policy"),
    ]:
        if hasattr(args, src):
            kwargs[dst] = getattr(args, src)
    return kwargs


__all__ = [
    "models",
    "get_model",
    "configure_model",
    "WACNN",
    "WACNNCodec",
    "ScalableCodec",
    "ResWACNNSharedEntropy",
    "ResWACNNIndependentEntropy",
]
