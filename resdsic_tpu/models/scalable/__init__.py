from .shared import ResWACNNSharedEntropy
from .independent import ResWACNNIndependentEntropy
from .single_decoder import ScalableICD
from .multiple_decoder import ScalableIMD
from .conditional_single_decoder import ConditionalScalableICD
from .conditional_multiple_decoder import ConditionalScalableIMD

__all__ = [
    "ResWACNNSharedEntropy",
    "ResWACNNIndependentEntropy",
    "ScalableICD",
    "ScalableIMD",
    "ConditionalScalableICD",
    "ConditionalScalableIMD",
]
