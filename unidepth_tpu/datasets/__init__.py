"""Data layer: declarative dataset registry + HDF5 readers + loader."""

from unidepth_tpu.datasets.base import HDF5Dataset, make_dataset
from unidepth_tpu.datasets.dummy import Dummy
from unidepth_tpu.datasets.loader import (
    Loader,
    ShapeSampler,
    WeightedConcat,
    collate,
    get_weights,
)
from unidepth_tpu.datasets.samplers import ShardedEvalSampler
from unidepth_tpu.datasets.sequence import SequenceHDF5Dataset, make_sequence_dataset
from unidepth_tpu.datasets.specs import SPECS, DatasetSpec

__all__ = [
    "HDF5Dataset",
    "SequenceHDF5Dataset",
    "Dummy",
    "Loader",
    "ShapeSampler",
    "WeightedConcat",
    "ShardedEvalSampler",
    "collate",
    "get_weights",
    "make_dataset",
    "make_sequence_dataset",
    "SPECS",
    "DatasetSpec",
]
