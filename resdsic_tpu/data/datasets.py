"""Image datasets + host batching (parity: src/compress/datasets/utils.py).

NHWC float32 in [0, 1] throughout (TPU layout). The loader is a simple
double-buffered host pipeline: while the accelerator runs step N, the next
batch is assembled on the host thread pool — adequate for image-compression
batch shapes (16×256×256×3 ≈ 12 MB) where decode+crop dominates.
"""

from __future__ import annotations

import os
import threading
import queue as _queue
from pathlib import Path
from typing import Iterator, List, Optional, Sequence

import numpy as np

_IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".webp"}


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0


def random_crop(img: np.ndarray, size: int, rng: np.random.Generator) -> np.ndarray:
    h, w = img.shape[:2]
    if h < size or w < size:
        # pad reflect to reach crop size (reference would error; be lenient)
        img = np.pad(
            img,
            ((0, max(0, size - h)), (0, max(0, size - w)), (0, 0)),
            mode="reflect",
        )
        h, w = img.shape[:2]
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return img[top : top + size, left : left + size]


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return img[top : top + size, left : left + size]


class ImageFolder:
    """root/{split}/data/* layout with an image cap
    (ref datasets/utils.py:21-60)."""

    def __init__(
        self,
        root: str,
        split: str = "train",
        num_images: int = 300000,
        crop_size: Optional[int] = 256,
        train: bool = True,
        seed: int = 0,
    ):
        base = Path(root) / split / "data"
        if not base.is_dir():
            base = Path(root) / split
        if not base.is_dir():
            raise RuntimeError(f"Invalid directory: {base}")
        self.samples = sorted(
            str(p) for p in base.iterdir() if p.suffix.lower() in _IMG_EXTS
        )[:num_images]
        self.crop_size = crop_size
        self.train = train
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> np.ndarray:
        img = _load_image(self.samples[idx])
        if self.crop_size:
            if self.train:
                img = random_crop(img, self.crop_size, self._rng)
            else:
                img = center_crop(img, self.crop_size)
        return img


class TestKodakDataset:
    """Flat directory of test images; exposes image_path like the reference
    (datasets/utils.py:65-81)."""

    def __init__(self, data_dir: str, crop_size: Optional[int] = None):
        base = Path(data_dir)
        if not base.is_dir():
            raise RuntimeError(f"Invalid directory: {base}")
        self.image_path = sorted(
            str(p) for p in base.iterdir() if p.suffix.lower() in _IMG_EXTS
        )
        self.crop_size = crop_size

    def __len__(self) -> int:
        return len(self.image_path)

    def __getitem__(self, idx: int) -> np.ndarray:
        img = _load_image(self.image_path[idx])
        if self.crop_size:
            img = center_crop(img, self.crop_size)
        return img


class SyntheticImageDataset:
    """Deterministic synthetic images (tests/benchmarks without data)."""

    def __init__(self, n: int = 64, h: int = 256, w: int = 256, seed: int = 0):
        self.n, self.h, self.w = n, h, w
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + idx)
        # smooth random field — more image-like than white noise
        small = rng.uniform(0, 1, (self.h // 8, self.w // 8, 3)).astype(np.float32)
        img = np.kron(small, np.ones((8, 8, 1), np.float32))
        img += 0.05 * rng.standard_normal((self.h, self.w, 3)).astype(np.float32)
        return np.clip(img, 0.0, 1.0)


class DataLoader:
    """Minimal shuffling batch iterator with one-batch prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
            yield np.stack([self.dataset[int(i)] for i in sel])

    def __iter__(self) -> Iterator[np.ndarray]:
        if not self.prefetch:
            yield from self._batches()
            return
        q: _queue.Queue = _queue.Queue(maxsize=2)
        stop = object()

        def worker():
            try:
                for batch in self._batches():
                    q.put(batch)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
