"""Host utilities (parity: src/compress/utils/functions.py:11-60)."""

from __future__ import annotations

import math
import os
import random
from pathlib import Path

import numpy as np


class AverageMeter:
    """Running average (ref functions.py:11-25)."""

    def __init__(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def read_image(filepath: str) -> np.ndarray:
    """Load an RGB image as float32 NHWC in [0,1] with batch dim 1."""
    from PIL import Image

    with Image.open(filepath) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    return arr[None]


def write_image(filepath: str, img: np.ndarray) -> None:
    from PIL import Image

    arr = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.ndim == 4:
        arr = arr[0]
    Image.fromarray(arr).save(filepath)


def set_seed(seed: int = 42) -> None:
    """Seed host-side RNGs (jax keys are passed explicitly)."""
    random.seed(seed)
    np.random.seed(seed)


def compute_psnr(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    return -10 * math.log10(mse)


def compute_msssim(a, b) -> float:
    from .metrics import ms_ssim

    return float(np.mean(np.asarray(ms_ssim(a, b))))


def create_savepath(base_path: str, epoch: int, very_best: bool = False):
    """Checkpoint path naming (ref functions.py:27-43: _very_best/_last)."""
    suffix = "_very_best" if very_best else "_last"
    p = Path(base_path)
    p.mkdir(parents=True, exist_ok=True)
    return str(p / f"{suffix.strip('_')}.ckpt")


def sec_to_hours(seconds: float) -> str:
    h = int(seconds // 3600)
    m = int((seconds % 3600) // 60)
    s = int(seconds % 60)
    return f"{h}h {m}m {s}s"
