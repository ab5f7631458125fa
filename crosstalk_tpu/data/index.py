"""Filename-pairing data index.

Reimplements the reference's dataset-discovery semantics (reference
train_model.py:97-154, duplicated at test-cross-talk-model.py:125-182 — here
implemented once) byte-for-byte:

  * files are matched by the regex ``image_(\\d+)_alpha_(\\d+\\.?\\d*)_(mixed|source)\\.tif``
    (train_model.py:105);
  * the alpha value from the filename is kept as a *string* in the pairing key
    to avoid float-comparison issues (train_model.py:108,118);
  * a mixed file in the mixed dir is joined to a source file in the source dir
    on the compound key ``(image_id, alpha_str)``; unpaired entries are dropped
    (train_model.py:133-141);
  * a ``ValueError`` is raised when no pairs are found (train_model.py:143-146);
  * samples are sorted by ``(image_id, scalar_label)`` — note image_id is a
    *string*, so the order is lexicographic on the id, exactly like the
    reference's sort (train_model.py:150) — which makes splits stable;
  * optional ``max_samples`` truncation after the sort (train_model.py:152-153).
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import List, Optional, Sequence

FILE_PATTERN = re.compile(r"image_(\d+)_alpha_(\d+\.?\d*)_(mixed|source)\.tif")


@dataclasses.dataclass(frozen=True)
class Sample:
    """One paired (mixed, source) tile with its alpha label."""

    image_id: str        # kept as a string (sort key + eval CSV Image_ID column)
    scalar_label: float  # alpha, parsed from the filename
    mixed_path: str
    source_path: str


def _scan_dir(directory: str, want_type: str) -> dict:
    """Map ``(image_id, alpha_str) -> filename`` for files of ``want_type``.

    Mirrors process_files_in_dir (train_model.py:112-126): only ``.tif`` files,
    only names matching the pattern, and only the type expected for the
    directory (a 'source' file sitting in the mixed dir is ignored).
    """
    found = {}
    for filename in os.listdir(directory):
        if not filename.endswith(".tif"):
            continue
        match = FILE_PATTERN.search(filename)
        if not match:
            continue
        image_id, alpha_str, file_type = match.groups()
        if file_type == want_type:
            found[(image_id, alpha_str)] = filename
    return found


class PairIndex:
    """The sorted list of paired samples for a (mixed_dir, source_dir) pair."""

    def __init__(
        self,
        mixed_dir: str,
        source_dir: str,
        max_samples: Optional[int] = None,
    ):
        self.mixed_dir = mixed_dir
        self.source_dir = source_dir

        mixed = _scan_dir(mixed_dir, "mixed")
        source = _scan_dir(source_dir, "source")

        samples: List[Sample] = []
        for key, mixed_file in mixed.items():
            source_file = source.get(key)
            if source_file is None:
                continue
            image_id, alpha_str = key
            samples.append(
                Sample(
                    image_id=image_id,
                    scalar_label=float(alpha_str),
                    mixed_path=os.path.join(mixed_dir, mixed_file),
                    source_path=os.path.join(source_dir, source_file),
                )
            )

        if not samples:
            raise ValueError(
                "No matching samples found. Ensure filenames adhere to "
                "'image_ID_alpha_VALUE_(mixed|source).tif' pattern and "
                "corresponding mixed/source files exist for each (ID, Alpha) pair."
            )

        # Stable, reference-identical order: lexicographic id, then float alpha.
        samples.sort(key=lambda s: (s.image_id, s.scalar_label))
        if max_samples:
            samples = samples[:max_samples]
        self.samples: List[Sample] = samples

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int) -> Sample:
        return self.samples[i]


def split_samples(
    samples: Sequence[Sample],
    train_ratio: float,
    val_ratio: float,
    seed: int = 43,
):
    """Deterministic 3-way split.

    The reference shuffles indices with ``torch.manual_seed(43);
    torch.randperm(N)`` (train_model.py:576-585). To keep splits *identical*
    to the reference (so per-split metrics are directly comparable), we use
    torch's CPU MT19937 permutation when torch is importable; otherwise we fall
    back to a seeded NumPy permutation (documented divergence: different
    permutation for the same seed).
    """
    n = len(samples)
    try:
        import torch  # dev-only dependency; baked into this image

        gen = torch.Generator()
        gen.manual_seed(seed)
        perm = torch.randperm(n, generator=gen).tolist()
    except ImportError:  # pragma: no cover - torch is available in CI
        import numpy as np

        perm = np.random.default_rng(seed).permutation(n).tolist()

    train_size = int(train_ratio * n)
    val_size = int(val_ratio * n)
    train = [samples[i] for i in perm[:train_size]]
    val = [samples[i] for i in perm[train_size : train_size + val_size]]
    test = [samples[i] for i in perm[train_size + val_size :]]
    return train, val, test
