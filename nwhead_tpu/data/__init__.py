from nwhead_tpu.data.datasets import (
    ArrayDataset,
    Cub200Dataset,
    FGVCAircraftDataset,
    Flowers102Dataset,
    ImageFileDataset,
    StanfordDogDataset,
    make_digits_dataset,
    make_synthetic_dataset,
)
from nwhead_tpu.data.embedding_cache import FeatureBankCache
from nwhead_tpu.data.pipeline import BatchLoader, EpisodicBatcher, prefetch_to_device
from nwhead_tpu.data import transforms

__all__ = [
    "ArrayDataset",
    "Cub200Dataset",
    "FGVCAircraftDataset",
    "Flowers102Dataset",
    "ImageFileDataset",
    "StanfordDogDataset",
    "make_digits_dataset",
    "make_synthetic_dataset",
    "FeatureBankCache",
    "BatchLoader",
    "EpisodicBatcher",
    "prefetch_to_device",
    "transforms",
]
