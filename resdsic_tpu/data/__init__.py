from .datasets import (
    ImageFolder,
    TestKodakDataset,
    SyntheticImageDataset,
    DataLoader,
)

__all__ = [
    "ImageFolder",
    "TestKodakDataset",
    "SyntheticImageDataset",
    "DataLoader",
]
