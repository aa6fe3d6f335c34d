from infodiffusion_tpu.data.datasets import (
    ArrayDataset,
    ImageFolderDataset,
    LatentDataset,
    get_dataset,
)
from infodiffusion_tpu.data.loader import DataLoader

__all__ = [
    "ArrayDataset",
    "ImageFolderDataset",
    "LatentDataset",
    "get_dataset",
    "DataLoader",
]
