from crosstalk_tpu.data.index import (
    PairIndex,
    Sample,
    UnlabeledIndex,
    pair_unlabeled,
    split_samples,
)
from crosstalk_tpu.data.pipeline import (
    Batch,
    DeviceDataset,
    TileStore,
    device_prefetch,
    iterate_batches,
    load_tiles,
    num_batches,
)
from crosstalk_tpu.data.tiff import read_tile
from crosstalk_tpu.data.transforms import normalize_tile, paired_random_flips

__all__ = [
    "PairIndex",
    "Sample",
    "UnlabeledIndex",
    "pair_unlabeled",
    "split_samples",
    "read_tile",
    "normalize_tile",
    "paired_random_flips",
    "Batch",
    "TileStore",
    "DeviceDataset",
    "load_tiles",
    "iterate_batches",
    "num_batches",
    "device_prefetch",
]
