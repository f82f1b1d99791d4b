from .math import (
    LowerBound,
    NonNegativeParametrizer,
    compute_padding,
    lower_bound,
    ste_round,
)

__all__ = [
    "ste_round",
    "lower_bound",
    "LowerBound",
    "NonNegativeParametrizer",
    "compute_padding",
]
