from .shared import ResWACNNSharedEntropy
from .independent import ResWACNNIndependentEntropy

__all__ = ["ResWACNNSharedEntropy", "ResWACNNIndependentEntropy"]
