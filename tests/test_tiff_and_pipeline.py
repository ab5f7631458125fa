"""TIFF IO, transforms, and host-pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from crosstalk_tpu.data.index import PairIndex
from crosstalk_tpu.data.pipeline import (
    TileStore,
    device_prefetch,
    iterate_batches,
    load_tiles,
    num_batches,
)
from crosstalk_tpu.data.tiff import read_tile, write_tile
from crosstalk_tpu.data.transforms import (
    normalize_batch_nhwc,
    normalize_tile,
    paired_random_flips,
)


def test_tiff_roundtrip(tmp_path):
    for dtype in (np.float64, np.float32, np.uint16, np.uint8):
        img = (np.random.default_rng(0).random((16, 24)) * 100).astype(dtype)
        path = str(tmp_path / f"t_{np.dtype(dtype).name}.tif")
        write_tile(path, img)
        back = read_tile(path, dtype=dtype)
        np.testing.assert_array_equal(back, img)


@pytest.mark.filterwarnings("ignore::DeprecationWarning")  # imageio vendored tifffile
def test_fast_reader_matches_imageio_on_reference(reference_data_dirs):
    import glob
    import imageio.v3 as iio

    mixed_dir, _ = reference_data_dirs
    for path in sorted(glob.glob(f"{mixed_dir}/*.tif"))[:3]:
        ours = read_tile(path)
        theirs = iio.imread(path).astype(np.float32)
        np.testing.assert_array_equal(ours, theirs)
        assert ours.shape == (256, 256)


def test_normalize_matches_reference_semantics():
    rng = np.random.default_rng(1)
    img = (rng.random((32, 32)) * 7 + 3).astype(np.float32)
    out = np.asarray(normalize_tile(jnp.asarray(img)))
    expected = (img - img.min()) / (img.max() - img.min())
    np.testing.assert_allclose(out, expected, atol=1e-6)
    assert out.min() == 0.0 and out.max() == 1.0
    # constant tile passes through unchanged (train_model.py:213-216)
    const = np.full((8, 8), 3.5, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(normalize_tile(jnp.asarray(const))), const)


def test_normalize_batch_per_channel():
    rng = np.random.default_rng(2)
    batch = rng.random((4, 16, 16, 2)).astype(np.float32) * 10
    out = np.asarray(normalize_batch_nhwc(jnp.asarray(batch)))
    for b in range(4):
        for c in range(2):
            tile = batch[b, :, :, c]
            np.testing.assert_allclose(
                out[b, :, :, c],
                (tile - tile.min()) / (tile.max() - tile.min()),
                atol=1e-6,
            )


def test_paired_flips_keep_channels_aligned():
    rng = np.random.default_rng(3)
    batch = rng.random((64, 8, 8, 2)).astype(np.float32)
    out = np.asarray(paired_random_flips(jax.random.key(0), jnp.asarray(batch)))
    n_h = n_v = n_id = 0
    for b in range(64):
        x = batch[b]
        candidates = {
            "id": x,
            "h": x[:, ::-1, :],
            "v": x[::-1, :, :],
            "hv": x[::-1, ::-1, :],
        }
        matches = [k for k, v in candidates.items() if np.array_equal(out[b], v)]
        assert matches, "output must be one of the 4 flip variants of the input"
        n_h += "h" in matches[0]
        n_v += "v" in matches[0]
        n_id += matches[0] == "id"
    # with p=0.5 each over 64 samples, all variants should appear
    assert 0 < n_h < 64 and 0 < n_v < 64


def test_paired_flips_are_layout_invariant():
    """The flip drawn for a sample depends only on (key, global index) —
    splitting one global batch into shards with matching index offsets
    reproduces the unsharded draws exactly. This is the property the
    data-parallel train step relies on for 1-vs-N-device equivalence."""
    rng = np.random.default_rng(7)
    batch = rng.random((16, 8, 8, 2)).astype(np.float32)
    key = jax.random.key(11)
    whole = np.asarray(paired_random_flips(key, jnp.asarray(batch)))
    shard = 16 // 4
    parts = [
        np.asarray(
            paired_random_flips(
                key, jnp.asarray(batch[i * shard:(i + 1) * shard]),
                index_offset=i * shard,
            )
        )
        for i in range(4)
    ]
    np.testing.assert_array_equal(whole, np.concatenate(parts, axis=0))


def test_tilestore_and_batches(synthetic_data_dirs, tmp_path):
    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    store = TileStore(index.samples, jobs=2, cache_dir=str(tmp_path / "cache"))
    assert store.tiles.shape == (12, 32, 32, 2)

    # cached reopen gives identical content
    store2 = TileStore(index.samples, jobs=2, cache_dir=str(tmp_path / "cache"))
    np.testing.assert_array_equal(np.asarray(store.tiles), np.asarray(store2.tiles))

    # pad-and-mask: 12 samples at batch 5 -> 3 batches, last has 2 real
    batches = list(iterate_batches(store, batch_size=5))
    assert len(batches) == num_batches(12, 5, drop_last=False) == 3
    assert batches[-1].mask.sum() == 2
    assert all(b.inputs.shape == (5, 32, 32, 2) for b in batches)
    assert all(b.labels.shape == (5, 1) for b in batches)

    # drop_last: 2 batches
    assert len(list(iterate_batches(store, 5, drop_last=True))) == 2

    # shuffling is deterministic per (seed, epoch) and differs across epochs
    a = [b.ids.tolist() for b in iterate_batches(store, 5, shuffle=True, seed=7, epoch=0)]
    b_ = [b.ids.tolist() for b in iterate_batches(store, 5, shuffle=True, seed=7, epoch=0)]
    c = [b.ids.tolist() for b in iterate_batches(store, 5, shuffle=True, seed=7, epoch=1)]
    assert a == b_ and a != c

    # content correctness: batch rows match the store rows by id
    batch = batches[0]
    for j in range(5):
        i = int(np.where(store.ids == batch.ids[j])[0][0])
        np.testing.assert_array_equal(batch.inputs[j], np.asarray(store.tiles[i]))


def test_device_prefetch_order(synthetic_data_dirs):
    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    store = TileStore(index.samples, jobs=1)
    plain = list(iterate_batches(store, 4))
    fetched = list(device_prefetch(iterate_batches(store, 4)))
    assert len(plain) == len(fetched)
    for p, f in zip(plain, fetched):
        np.testing.assert_array_equal(p.inputs, np.asarray(f.inputs))
        np.testing.assert_array_equal(p.ids, np.asarray(f.ids))


def test_load_tiles_parallel_equals_serial(synthetic_data_dirs):
    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    serial = load_tiles(index.samples, jobs=1)
    parallel = load_tiles(index.samples, jobs=4)
    np.testing.assert_array_equal(serial, parallel)


def test_load_tiles_inconsistent_size_clear_error(tmp_path):
    """A valid TIFF of the wrong size must produce a clear ValueError naming
    the offending file (the native decoder rejects the size mismatch and the
    Python fallback must not surface a cryptic broadcast error)."""
    from crosstalk_tpu.data.index import Sample
    from crosstalk_tpu.data.tiff import write_tile

    paths = {}
    for name, size in (("a_mixed", 16), ("a_source", 16),
                       ("b_mixed", 32), ("b_source", 16)):
        p = str(tmp_path / f"{name}.tif")
        write_tile(p, np.zeros((size, size)) + 0.5)
        paths[name] = p
    samples = [
        Sample("a", 0.1, paths["a_mixed"], paths["a_source"]),
        Sample("b", 0.2, paths["b_mixed"], paths["b_source"]),
    ]
    for jobs in (1, 4):
        with pytest.raises(ValueError, match="inconsistent tile size.*b_mixed"):
            load_tiles(samples, jobs=jobs, use_native=False)


def test_parse_raw_tiff_malformed_returns_none(tmp_path):
    """Corrupt/truncated TIFF bytes must return None (-> imageio fallback),
    never raise struct.error/IndexError out of the cache build."""
    import struct

    from crosstalk_tpu.data.tiff import _parse_raw_tiff, write_tile

    good_path = str(tmp_path / "t.tif")
    write_tile(good_path, np.arange(64, dtype=np.float32).reshape(8, 8))
    with open(good_path, "rb") as f:
        blob = f.read()
    assert _parse_raw_tiff(blob) is not None

    cases = [
        blob[: len(blob) // 2],          # truncated mid-IFD
        blob[:-3],                        # truncated tag table
        blob[:4] + struct.pack("<I", 10**7) + blob[8:],  # IFD past EOF
        blob[:8],                         # header only
        bytes(200),                       # zeros (not a TIFF)
    ]
    rng = np.random.default_rng(3)
    for _ in range(100):                  # byte-mutation sweep
        mut = bytearray(blob)
        for _ in range(int(rng.integers(1, 5))):
            mut[int(rng.integers(0, len(mut)))] = int(rng.integers(0, 256))
        cases.append(bytes(mut))
    for i, case in enumerate(cases):
        try:
            _parse_raw_tiff(case)  # None or a parsed array — but never raise
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"case {i} raised {type(e).__name__}: {e}")


def test_device_dataset_matches_host_pipeline(synthetic_data_dirs):
    """DeviceDataset (HBM-resident batching) yields the exact same batch
    sequence — inputs, labels, ids, masks, shuffle permutation — as the host
    iterate_batches path, shuffled and unshuffled, padded and dropped."""
    from crosstalk_tpu.data.pipeline import DeviceDataset

    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    store = TileStore(index.samples, jobs=2)
    dev = DeviceDataset(store)
    assert DeviceDataset.nbytes(store) == store.tiles.nbytes + store.labels.nbytes

    for kwargs in (
        dict(batch_size=5),
        dict(batch_size=5, shuffle=True, seed=7, epoch=2),
        dict(batch_size=5, shuffle=True, drop_last=True, seed=7, epoch=3),
        dict(batch_size=4, drop_last=True),
    ):
        host = list(iterate_batches(store, **kwargs))
        devb = list(dev.batches(**kwargs))
        assert len(host) == len(devb)
        for hb, db in zip(host, devb):
            np.testing.assert_array_equal(hb.inputs, np.asarray(db.inputs))
            np.testing.assert_array_equal(hb.labels, np.asarray(db.labels))
            np.testing.assert_array_equal(hb.ids, np.asarray(db.ids))
            np.testing.assert_array_equal(hb.mask, np.asarray(db.mask))


def test_train_loop_device_data_equals_host(synthetic_data_dirs, tmp_path):
    """One epoch of train_model with device_data=True produces bit-identical
    losses to the host-pipeline run on the same init/data/seed."""
    import jax

    from crosstalk_tpu.config import ModelConfig, OptimConfig, TrainConfig
    from crosstalk_tpu.models import build_model, init_model
    from crosstalk_tpu.train.loop import train_model
    from crosstalk_tpu.train.steps import init_train_state, make_optimizer

    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    store = TileStore(index.samples[:8], jobs=1)
    val = TileStore(index.samples[8:], jobs=1)

    cfg = ModelConfig(variant="single", initial_filters=4, num_conv_blocks=2,
                      compute_dtype="f32")
    model = build_model(cfg)
    optim_cfg = OptimConfig(learning_rate=1e-3, scheduler="aggressive_plateau")
    train_cfg = TrainConfig(batch_size=4, num_epochs=2)

    results = {}
    for mode in ("host", "device"):
        variables = init_model(model, jax.random.key(0), image_size=32)
        tx = make_optimizer(optim_cfg)
        state = init_train_state(model, variables, tx)
        run_dir = str(tmp_path / f"run_{mode}")
        import os
        os.makedirs(run_dir, exist_ok=True)
        _, tl, vl = train_model(
            model, state, store, val, optim_cfg, train_cfg, run_dir,
            "ts", "single", tx, mesh=None, seed=3,
            device_data=(mode == "device"),
        )
        results[mode] = (tl, vl)
    assert results["host"] == results["device"]


def test_train_loop_device_data_rejects_mesh(synthetic_data_dirs, tmp_path):
    import jax
    import pytest as _pytest

    from crosstalk_tpu.config import ModelConfig, OptimConfig, TrainConfig
    from crosstalk_tpu.models import build_model, init_model
    from crosstalk_tpu.parallel.mesh import data_mesh
    from crosstalk_tpu.train.loop import train_model
    from crosstalk_tpu.train.steps import init_train_state, make_optimizer

    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    store = TileStore(index.samples, jobs=1)
    cfg = ModelConfig(variant="single", initial_filters=4, num_conv_blocks=2,
                      compute_dtype="f32")
    model = build_model(cfg)
    optim_cfg = OptimConfig()
    variables = init_model(model, jax.random.key(0), image_size=32)
    tx = make_optimizer(optim_cfg)
    state = init_train_state(model, variables, tx)
    with _pytest.raises(ValueError, match="single-device only"):
        train_model(
            model, state, store, store, optim_cfg,
            TrainConfig(batch_size=8, num_epochs=1), str(tmp_path), "ts",
            "single", tx, mesh=data_mesh(2), seed=3, device_data=True,
        )


def test_evaluate_device_dataset_matches_tilestore(synthetic_data_dirs):
    """eval/engine.evaluate over a DeviceDataset (HBM-resident batching)
    returns identical rows/loss to the TileStore host path, with and
    without the classical metrics."""
    import jax

    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.data.pipeline import DeviceDataset
    from crosstalk_tpu.eval.engine import evaluate
    from crosstalk_tpu.models import build_model, init_model

    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    store = TileStore(index.samples, jobs=1)
    cfg = ModelConfig(variant="single", initial_filters=4, num_conv_blocks=2,
                      compute_dtype="f32")
    model = build_model(cfg)
    variables = init_model(model, jax.random.key(0), image_size=32)

    for with_metrics in (False, True):
        rows_h, loss_h = evaluate(model, variables, store, batch_size=5,
                                  with_metrics=with_metrics)
        rows_d, loss_d = evaluate(model, variables, DeviceDataset(store),
                                  batch_size=5, with_metrics=with_metrics)
        assert loss_h == loss_d
        assert len(rows_h) == len(rows_d) == len(store)
        for rh, rd in zip(rows_h, rows_d):
            assert rh.keys() == rd.keys()
            for k in rh:
                np.testing.assert_array_equal(rh[k], rd[k], err_msg=k)


def test_train_loop_accepts_prebuilt_device_datasets(synthetic_data_dirs,
                                                     tmp_path, monkeypatch):
    """Passing pre-built (train, val) DeviceDatasets reuses them — no second
    HBM upload (the train CLI relies on this for its post-training eval)."""
    import os

    import jax

    from crosstalk_tpu.config import ModelConfig, OptimConfig, TrainConfig
    from crosstalk_tpu.data.pipeline import DeviceDataset
    from crosstalk_tpu.models import build_model, init_model
    from crosstalk_tpu.train import loop as loop_mod
    from crosstalk_tpu.train.steps import init_train_state, make_optimizer

    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    store = TileStore(index.samples[:8], jobs=1)
    val = TileStore(index.samples[8:], jobs=1)
    prebuilt = (DeviceDataset(store), DeviceDataset(val))

    def _no_new_uploads(*a, **k):
        raise AssertionError("train_model must reuse the pre-built datasets")

    monkeypatch.setattr(loop_mod, "DeviceDataset", _no_new_uploads)

    cfg = ModelConfig(variant="single", initial_filters=4, num_conv_blocks=2,
                      compute_dtype="f32")
    model = build_model(cfg)
    optim_cfg = OptimConfig(learning_rate=1e-3, scheduler="aggressive_plateau")
    tx = make_optimizer(optim_cfg)
    variables = init_model(model, jax.random.key(0), image_size=32)
    state = init_train_state(model, variables, tx)
    run_dir = str(tmp_path / "run_prebuilt")
    os.makedirs(run_dir, exist_ok=True)
    _, tl, vl = loop_mod.train_model(
        model, state, store, val, optim_cfg, TrainConfig(batch_size=4,
                                                         num_epochs=1),
        run_dir, "ts", "single", tx, mesh=None, seed=3, device_data=prebuilt,
    )
    assert len(tl) == 1 and len(vl) == 1


def test_parse_raw_tiff_multistrip_without_counts_falls_back():
    """A multi-strip TIFF with StripOffsets but no StripByteCounts must NOT
    silently decode from strip 0 plus inter-strip garbage (zip truncation —
    caught by the round-3 review): the parser returns None so read_tile
    reaches the authoritative imageio fallback. A 2-strip file WITH counts
    still decodes exactly."""
    import struct

    from crosstalk_tpu.data.tiff import _parse_raw_tiff

    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    half = img[:2].tobytes(), img[2:].tobytes()

    def build(with_counts, gap=b"\xff" * 8):
        # header | strip0 | gap | strip1 | IFD
        off0 = 8
        off1 = off0 + len(half[0]) + len(gap)
        ifd_off = off1 + len(half[1])
        entries = [
            (256, 4, 1, 4), (257, 4, 1, 4), (258, 3, 1, 32), (259, 3, 1, 1),
            (273, 4, 2, None),  # two LONG strip offsets, out of line
            (277, 3, 1, 1), (278, 4, 1, 2), (339, 3, 1, 3),
        ]
        if with_counts:
            entries.append((279, 4, 2, None))
        entries.sort()
        n = len(entries)
        arrays_off = ifd_off + 2 + 12 * n + 4
        ifd = struct.pack("<H", n)
        extra = b""
        for tag, typ, count, value in entries:
            if value is None:
                ifd += struct.pack("<HHII", tag, typ, count,
                                   arrays_off + len(extra))
                vals = (off0, off1) if tag == 273 else (32, 32)
                extra += struct.pack("<2I", *vals)
            elif typ == 3:
                ifd += struct.pack("<HHIH2x", tag, typ, count, value)
            else:
                ifd += struct.pack("<HHII", tag, typ, count, value)
        ifd += struct.pack("<I", 0)
        return (struct.pack("<2sHI", b"II", 42, ifd_off)
                + half[0] + gap + half[1] + ifd + extra)

    good = _parse_raw_tiff(build(with_counts=True))
    assert good is not None
    np.testing.assert_array_equal(good, img)

    # without counts: must refuse (None), not return rows 2-3 of garbage
    assert _parse_raw_tiff(build(with_counts=False)) is None


def test_iterate_batches_assemble_rows_partial(synthetic_data_dirs):
    """Multi-host per-rank assembly: with assemble_rows, only that row range
    of each batch's pixels is copied (others stay zero); labels/ids/mask are
    full, and the assembled rows are bit-identical to a full assembly."""
    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    store = TileStore(index.samples[:10], jobs=1)

    from crosstalk_tpu.data.pipeline import iterate_batches

    full = list(iterate_batches(store, 4, shuffle=True, seed=7, epoch=1))
    part = list(iterate_batches(store, 4, shuffle=True, seed=7, epoch=1,
                                assemble_rows=slice(1, 3)))
    assert len(full) == len(part)
    for f, p in zip(full, part):
        np.testing.assert_array_equal(p.inputs[1:3], f.inputs[1:3])
        assert not p.inputs[0].any() and not p.inputs[3].any()
        np.testing.assert_array_equal(p.labels, f.labels)
        np.testing.assert_array_equal(p.ids, f.ids)
        np.testing.assert_array_equal(p.mask, f.mask)


def test_synthetic_generates_any_size():
    """generate_pair must work for sizes that are not multiples of the blob
    block (round-4 review: the kron crop could only shrink, so size=100
    raised a broadcast error)."""
    from crosstalk_tpu.data.synthetic import generate_pair

    rng = np.random.default_rng(0)
    for size in (100, 7, 96, 65):
        mixed, source, alpha = generate_pair(rng, size)
        assert mixed.shape == (size, size) == source.shape
        assert 0.01 <= alpha <= 0.5
