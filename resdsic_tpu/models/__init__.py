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
from .pipeline import StreamingCodec
from .scalable import (
    ConditionalScalableICD,
    ConditionalScalableIMD,
    ResWACNNIndependentEntropy,
    ResWACNNSharedEntropy,
    ScalableICD,
    ScalableIMD,
)
from .tcm import TCM
from .tcm_scalable import ScalableTCM, SharedTCM
from .wacnn import WACNN

models = {
    "cnn": WACNN,
    "ind": ResWACNNIndependentEntropy,
    "icd": ScalableICD,
    "imd": ScalableIMD,
    "cicd": ConditionalScalableICD,
    "cimd": ConditionalScalableIMD,
    # present-but-unregistered in the reference (SURVEY.md §2.5); registered here
    "tcm": TCM,
    "tcm_shared": SharedTCM,
    "tcm_ind": ScalableTCM,
}


def get_model(name: str):
    if name not in models:
        raise ValueError(f"Unknown model '{name}' (available: {sorted(models)})")
    return models[name]


# registry keys whose classes take the scalable ctor surface
# (lmbda_list / mask_policy / lrp flags); "tcm" is single-layer like "cnn"
SCALABLE_MODELS = frozenset(
    ("ind", "icd", "imd", "cicd", "cimd", "tcm_shared", "tcm_ind")
)


def configure_model(args):
    """Build a model from a parsed-args namespace (ref models/__init__.py:33-63)."""
    name = getattr(args, "model", "cnn")
    cls = get_model(name)
    kwargs = {}
    if not name.startswith("tcm"):
        # TCM geometry (N=128, Swin config) is fixed by its class defaults;
        # the parser's --N/--M defaults describe the WACNN family only
        if hasattr(args, "N"):
            kwargs["N"] = args.N
        if hasattr(args, "M"):
            kwargs["M"] = args.M
    if name in SCALABLE_MODELS:
        kwargs.update(_scalable_kwargs(args))
    return cls(**kwargs)


def _scalable_kwargs(args):
    name = getattr(args, "model", "ind")
    fields = [
        ("lambda_list", "lmbda_list"),
        ("mask_policy", "mask_policy"),
        ("lrp_prog", "lrp_prog"),
        ("independent_lrp", "independent_lrp"),
    ]
    if name in ("ind", "tcm_ind"):
        fields.append(("multiple_decoder", "multiple_decoder"))
    if name in ("cicd", "cimd"):
        fields.append(("joiner_policy", "joiner_policy"))
    kwargs = {}
    for src, dst in fields:
        if hasattr(args, src):
            v = getattr(args, src)
            kwargs[dst] = tuple(v) if isinstance(v, list) else v
    return kwargs


__all__ = [
    "models",
    "get_model",
    "configure_model",
    "WACNN",
    "WACNNCodec",
    "ScalableCodec",
    "StreamingCodec",
    "ResWACNNSharedEntropy",
    "ResWACNNIndependentEntropy",
    "ScalableICD",
    "ScalableIMD",
    "ConditionalScalableICD",
    "ConditionalScalableIMD",
    "TCM",
    "SharedTCM",
    "ScalableTCM",
]
