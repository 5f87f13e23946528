from .pipeline import (
    CamelsDataset,
    load_camels_dataset,
    normalize_maps,
    normalize_params,
    batch_iterator,
    train_test_split,
)
from .synthetic import synthetic_camels
from .map_dataset import MapDataset, verify_dataset

__all__ = [
    "MapDataset",
    "verify_dataset",
    "CamelsDataset",
    "load_camels_dataset",
    "normalize_maps",
    "normalize_params",
    "batch_iterator",
    "train_test_split",
    "synthetic_camels",
]
