from .entropy_models import (
    EntropyBottleneck,
    GaussianConditional,
    gc_build_indexes,
    quantize_symbols,
)
from .tables import (
    SCALES_LEVELS,
    SCALES_MAX,
    SCALES_MIN,
    build_eb_table,
    build_gc_table,
    eb_medians,
    get_scale_table,
)

__all__ = [
    "EntropyBottleneck",
    "GaussianConditional",
    "gc_build_indexes",
    "quantize_symbols",
    "build_eb_table",
    "build_gc_table",
    "eb_medians",
    "get_scale_table",
    "SCALES_MIN",
    "SCALES_MAX",
    "SCALES_LEVELS",
]
