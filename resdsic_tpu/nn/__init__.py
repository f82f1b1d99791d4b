from .attention import (
    ResidualUnit,
    WinBasedAttention,
    WindowAttention,
    WinNoShiftAttention,
    window_partition,
    window_reverse,
)
from .conv import (
    Conv,
    Deconv,
    Sequential,
    SubpelConv3x3,
    conv,
    conv1x1,
    conv3x3,
    deconv,
    gelu,
    pixel_shuffle,
    subpel_conv3x3,
)
from .gdn import GDN, GDN1

__all__ = [
    "Conv",
    "Deconv",
    "SubpelConv3x3",
    "Sequential",
    "conv",
    "deconv",
    "conv3x3",
    "conv1x1",
    "subpel_conv3x3",
    "pixel_shuffle",
    "gelu",
    "GDN",
    "GDN1",
    "WindowAttention",
    "WinBasedAttention",
    "WinNoShiftAttention",
    "ResidualUnit",
    "window_partition",
    "window_reverse",
]
