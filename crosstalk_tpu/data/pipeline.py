"""Host -> HBM input pipeline.

The reference's throughput model is a ``torch.utils.data.DataLoader`` with
forked workers decoding one TIFF pair per ``__getitem__`` (train_model.py:
159-177, 607-632). On TPU the bottleneck budget is different: the chip consumes
thousands of tiles per second, so the host path here is

  1. a one-time threaded decode of the directory into a **packed float32
     cache** — a flat (N, H, W, 2) array, memory-mapped from disk so epochs
     after the first stream at page-cache speed and 40k-tile datasets don't
     need to fit in RAM (SURVEY.md §7 step 6);
  2. per-epoch shuffling by permuted *indices* into the packed array (no
     per-sample Python work in the loop);
  3. an async device-transfer prefetcher that keeps the next batch's H2D copy
     in flight while the current step computes.

Normalization and augmentation intentionally do NOT happen here — they are
jittable device ops (see transforms.py), so the cache stores raw decoded
pixels and stays valid for both train and eval consumers.
"""

from __future__ import annotations

import concurrent.futures as cf
import hashlib
import os
from typing import Iterator, List, NamedTuple, Optional, Sequence

import numpy as np

from crosstalk_tpu.data.index import Sample
from crosstalk_tpu.data.tiff import read_tile


class Batch(NamedTuple):
    """One host-side batch. ``mask`` flags real (non-padding) samples."""

    inputs: np.ndarray   # (B, H, W, 2) float32, raw (unnormalized) pixels
    labels: np.ndarray   # (B, 1) float32 alpha
    ids: np.ndarray      # (B,) int64 image ids
    mask: np.ndarray     # (B,) float32, 1.0 = real sample, 0.0 = padding


def _fingerprint(samples: Sequence[Sample]) -> str:
    """Cache key over the exact file set + mtimes + sizes."""
    h = hashlib.sha256()
    for s in samples:
        for p in (s.mixed_path, s.source_path):
            st = os.stat(p)
            h.update(p.encode())
            h.update(f":{st.st_mtime_ns}:{st.st_size};".encode())
    return h.hexdigest()[:16]


def load_tiles(
    samples: Sequence[Sample],
    jobs: int = 1,
    out: Optional[np.ndarray] = None,
    use_native: bool = True,
) -> np.ndarray:
    """Decode all tile pairs into a packed (N, H, W, 2) float32 array.

    The hot path is the native C++ decoder (crosstalk_tpu/native/tile_loader.cpp via
    crosstalk_tpu/data/native_loader.py) — a thread pool parsing the
    dataset's baseline-TIFF flavor straight into the packed buffer; exotic
    TIFFs or a missing toolchain fall back to the threaded Python decoder.
    """
    if not samples:
        raise ValueError("load_tiles() received no samples")
    first = read_tile(samples[0].mixed_path)
    h, w = first.shape
    n = len(samples)
    if out is None:
        out = np.empty((n, h, w, 2), dtype=np.float32)

    if use_native and isinstance(out, np.ndarray) and out.flags["C_CONTIGUOUS"]:
        from crosstalk_tpu.data.native_loader import load_pairs_native

        if load_pairs_native(
            [s.mixed_path for s in samples],
            [s.source_path for s in samples],
            out,
            threads=max(jobs, 1),
        ):
            return out

    def _load(i: int) -> None:
        for c, path in ((0, samples[i].mixed_path), (1, samples[i].source_path)):
            tile = read_tile(path)
            if tile.shape != (h, w):
                raise ValueError(
                    f"inconsistent tile size: '{path}' is {tile.shape}, "
                    f"expected {(h, w)} (set by the first tile, "
                    f"'{samples[0].mixed_path}') — all tiles in a dataset "
                    "must share one size"
                )
            out[i, :, :, c] = tile

    if jobs > 1:
        with cf.ThreadPoolExecutor(max_workers=jobs) as pool:
            list(pool.map(_load, range(n)))
    else:
        for i in range(n):
            _load(i)
    return out


class TileStore:
    """Packed decoded-tile storage for a sample list.

    With ``cache_dir`` set, the packed array lives in a memory-mapped ``.npy``
    keyed by the file set's fingerprint; otherwise it is held in RAM.
    Labels/ids are tiny and always in RAM.
    """

    def __init__(
        self,
        samples: Sequence[Sample],
        jobs: int = 1,
        cache_dir: Optional[str] = None,
    ):
        self.samples: List[Sample] = list(samples)
        self.labels = np.array(
            [[s.scalar_label] for s in self.samples], dtype=np.float32
        )
        self.ids = np.array([int(s.image_id) for s in self.samples], dtype=np.int64)

        if cache_dir is None:
            self.tiles = load_tiles(self.samples, jobs=jobs)
            return

        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, f"tiles_{_fingerprint(self.samples)}.npy")
        if not os.path.exists(path):
            first = read_tile(self.samples[0].mixed_path)
            shape = (len(self.samples), *first.shape, 2)
            # per-process tmp name: concurrent creators (multi-host training,
            # two CLI runs over one --cache_dir) must not truncate each
            # other's open memmap or race the final rename — each builds its
            # own file and the atomic replace makes the last writer win with
            # identical bytes (the cache is a pure function of the file set)
            tmp = f"{path}.tmp.{os.getpid()}"
            try:
                arr = np.lib.format.open_memmap(
                    tmp, mode="w+", dtype=np.float32, shape=shape
                )
                load_tiles(self.samples, jobs=jobs, out=arr)
                arr.flush()
                del arr
                os.replace(tmp, path)
            finally:
                if os.path.exists(tmp):  # failed build: no stale tmp litter
                    os.remove(tmp)
        self.tiles = np.load(path, mmap_mode="r")

    def __len__(self) -> int:
        return len(self.samples)


def _epoch_index_batches(n, batch_size, shuffle, drop_last, seed, epoch):
    """The ONE definition of epoch batch order: SeedSequence([seed, epoch])
    permutation, drop-last cut, index-0 zero-padding of the tail. Host-
    (``iterate_batches``) and device-resident (``DeviceDataset.batches``)
    training must walk identical sequences — asserted in
    tests/test_tiff_and_pipeline.py; keep this shared, never fork it.
    Yields ``(idx[batch_size], real_rows)``."""
    order = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        rng.shuffle(order)
    end = (n // batch_size) * batch_size if drop_last else n
    for start in range(0, end, batch_size):
        idx = order[start : start + batch_size]
        real = len(idx)
        if real < batch_size:  # pad-and-mask the tail (static shapes)
            pad = np.zeros(batch_size - real, dtype=idx.dtype)
            idx = np.concatenate([idx, pad])
        yield idx, real


def iterate_batches(
    store: TileStore,
    batch_size: int,
    shuffle: bool = False,
    drop_last: bool = False,
    seed: int = 0,
    epoch: int = 0,
    assembly_threads: int = 4,
    assemble_rows: Optional[slice] = None,
) -> Iterator[Batch]:
    """Yield host batches from a TileStore.

    The final partial batch is padded to ``batch_size`` with a zero ``mask``
    (static shapes: every batch compiles to the same XLA program) unless
    ``drop_last`` — the training-loop default, matching the reference's
    train loader (train_model.py:613). Unlike the reference we do NOT drop
    the last val/test batch (its drop_last=True on eval loaders silently
    discards entire small splits — train_model.py:622,631).

    Batch assembly strategy (measured on a 20k-pair / 10.5 GB memmapped
    cache, see PERF_NOTES "IDR-scale host pipeline"): rows are copied in
    SORTED-source order into their shuffled destination slots — identical
    output, but the memmap is walked monotonically, which turns random
    page-cache/disk access into sequential (~2.8x). ``assembly_threads``
    additionally overlaps page-fault stalls (another ~1.6x on one core;
    scales with cores on real hosts). Output is bit-identical to the naive
    row loop in all cases.

    ``assemble_rows`` (multi-host): copy only that row range of each
    batch's PIXELS — this process's ``process_row_slice`` — leaving the
    other rows zero (never read: device_prefetch uploads only the same
    slice). Decode/copy CPU and touched RAM per host then scale with
    1/num_processes. Labels/ids/mask are tiny and stay full.
    """
    pool = (
        cf.ThreadPoolExecutor(assembly_threads)
        if assembly_threads > 1 else None
    )
    try:
        for idx, real in _epoch_index_batches(
            len(store), batch_size, shuffle, drop_last, seed, epoch
        ):
            # row-wise copies (numpy fancy-indexing on a memmap degrades to
            # per-element gathers), walked in sorted-source order
            if assemble_rows is None:
                inputs = np.empty(
                    (batch_size, *store.tiles.shape[1:]), np.float32
                )
                dst = np.arange(batch_size)
            else:
                # zeros, not empty: unassembled rows must be deterministic
                inputs = np.zeros(
                    (batch_size, *store.tiles.shape[1:]), np.float32
                )
                dst = np.arange(batch_size)[assemble_rows]
            src_sorted = dst[np.argsort(idx[dst], kind="stable")]

            def copy_rows(dsts):
                for j in dsts:
                    inputs[j] = store.tiles[idx[j]]

            if pool is None:
                copy_rows(src_sorted)
            else:
                chunks = np.array_split(src_sorted, assembly_threads)
                list(pool.map(copy_rows, chunks))
            labels = store.labels[idx]
            ids = store.ids[idx]
            mask = np.zeros(batch_size, dtype=np.float32)
            mask[:real] = 1.0
            yield Batch(inputs, labels, ids, mask)
    finally:
        if pool is not None:
            pool.shutdown(wait=False)


def num_batches(n: int, batch_size: int, drop_last: bool = False) -> int:
    return n // batch_size if drop_last else -(-n // batch_size)


class DeviceDataset:
    """HBM-resident dataset: one upload, then on-device per-batch gathers.

    The TPU-first alternative to the host memmap + prefetch path for datasets
    that fit in device memory (a 2k-pair 256px float32 set is ~1 GB; a v5e
    chip has 16 GB HBM): tiles and labels are transferred to the device ONCE,
    and every epoch's batches are jitted gathers that never touch the host —
    no per-step H2D traffic, no host CPU in the loop. This replaces the
    reference's DataLoader-worker model (train_model.py:607-632) outright for
    small/medium corpora; IDR-scale (40k-tile) runs keep the streaming path.

    Shuffle semantics are identical to ``iterate_batches`` (same SeedSequence
    permutation), so host- and device-resident training produce the same
    batch sequence — asserted in tests/test_tiff_and_pipeline.py.

    Single-device only: sharded multi-chip training keeps the host pipeline,
    where each process uploads exactly its shard of every batch.
    """

    def __init__(self, store: TileStore, device=None):
        import jax
        import jax.numpy as jnp

        self.n = len(store)
        self.tile_shape = tuple(store.tiles.shape[1:])
        if device is None:
            device = jax.devices()[0]
        self.tiles = jax.device_put(np.ascontiguousarray(store.tiles), device)
        self.labels = jax.device_put(store.labels, device)
        self.ids = store.ids  # host-side (only eval consumers need ids)
        self._gather = jax.jit(
            lambda tiles, labels, idx: (
                jnp.take(tiles, idx, axis=0),
                jnp.take(labels, idx, axis=0),
            )
        )

    def __len__(self) -> int:
        return self.n

    @staticmethod
    def nbytes(store: TileStore) -> int:
        """Device-memory footprint of residency for this store."""
        return int(store.tiles.nbytes) + int(store.labels.nbytes)

    def batches(
        self,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        epoch: int = 0,
    ) -> Iterator[Batch]:
        """Yield Batches whose inputs/labels are device arrays (async-ready).

        Same ordering/padding contract as ``iterate_batches``; ``mask``/
        ``ids`` stay host-side (tiny, and only the val/eval paths read them).
        """
        import jax.numpy as jnp

        for idx, real in _epoch_index_batches(
            self.n, batch_size, shuffle, drop_last, seed, epoch
        ):
            inputs, labels = self._gather(
                self.tiles, self.labels, jnp.asarray(idx)
            )
            mask = np.zeros(batch_size, dtype=np.float32)
            mask[:real] = 1.0
            yield Batch(inputs, labels, self.ids[idx], mask)


def device_prefetch(iterator, sharding=None, depth: int = 2):
    """Overlap H2D transfer with compute.

    Eagerly ``jax.device_put``s up to ``depth`` upcoming batches (optionally
    with a `NamedSharding` so each data-parallel shard lands directly on its
    device) and yields them in order. JAX transfers are async, so by the time
    the consumer blocks on batch k, batch k+1's copy is already streaming.

    Multi-host: when the sharded mesh spans processes, each process uploads
    only ITS row range of the host batch (mesh device order — see
    parallel/distributed.py) and the batches become global jax.Arrays.
    """
    import collections

    import jax

    queue = collections.deque()
    multihost = sharding is not None and jax.process_count() > 1
    if multihost:
        from crosstalk_tpu.parallel.distributed import (
            make_global_batch,
            process_row_slice,
        )

    def _put(batch: Batch):
        if sharding is None:
            return jax.device_put(batch)
        if multihost:
            rows = batch.inputs.shape[0]
            sl = process_row_slice(rows)
            return Batch(
                *(make_global_batch(sharding, x[sl], rows) for x in batch)
            )
        return Batch(*(jax.device_put(x, sharding) for x in batch))

    for batch in iterator:
        queue.append(_put(batch))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
