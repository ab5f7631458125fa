from crosstalk_tpu.data.index import PairIndex, Sample, split_samples
from crosstalk_tpu.data.tiff import read_tile
from crosstalk_tpu.data.transforms import normalize_tile, paired_random_flips

__all__ = [
    "PairIndex",
    "Sample",
    "split_samples",
    "read_tile",
    "normalize_tile",
    "paired_random_flips",
]
