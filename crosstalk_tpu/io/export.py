"""AOT serving-model export: serialize the serving forward as StableHLO.

`jax.export` lowers the jitted serving program ONCE — normalization
included, weights shipped alongside in the same file, a symbolic batch
dimension by default — into a version-stable StableHLO artifact that loads
and runs with NO model code, checkpoint file, or flax dependency at the
deployment site:

    tools/export_model.py -p model.pth --out model.ctkx        # export
    fn, meta = load_exported("model.ctkx"); alphas = fn(tiles)  # serve

This is the deployment story the reference cannot offer (its .pth needs
the full PyTorch model class at load time — test-cross-talk-model.py:
315-322); here the artifact is the compiler IR itself, portable across
hosts and lowered for multiple platforms at once (default: tpu + cpu).

File format: 8-byte magic, u32 little-endian JSON length, JSON metadata,
u64 little-endian weights length, an .npz of the flattened weight leaves,
then the serialized StableHLO module. Weights travel as ARGUMENTS of the
exported program, not baked constants: constant-laden modules compile
pathologically slowly on some toolchains (this environment's remote
compiler constant-folds them op-by-op), while argument weights are
device_put once at load and the module stays small.

The Pallas input-block kernel is deliberately NOT used in exported
programs: a Mosaic custom call would pin the artifact to one TPU
generation; the XLA-only serving path stays within ~15% of it
(PERF_NOTES.md) and is portable.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crosstalk_tpu.config import ModelConfig
from crosstalk_tpu.data.transforms import normalize_batch_nhwc

_MAGIC = b"CTKX0002"


def make_forward(model_cfg: ModelConfig, fast: bool = True,
                 use_pallas: bool = False, int8_scales=None):
    """-> fn(variables, raw (B,H,W,2) f32) -> (B,) f32: normalize + forward.

    The single definition of serving semantics — both the online predictor
    (serve/predictor.py) and the AOT export below build on it.
    ``int8_scales`` (from ``eval.calibrate_int8``) selects the opt-in int8
    MXU tier instead of the bf16 fast path — OUTSIDE the 1e-4 parity budget;
    see DEPLOY.md's parity map.
    """
    if int8_scales is not None:
        if not fast:
            raise ValueError("int8_scales requires the fast serving path")
        from crosstalk_tpu.eval.int8_forward import make_int8_forward

        forward = make_int8_forward(
            model_cfg, int8_scales, use_pallas=use_pallas
        )
    elif fast:
        from crosstalk_tpu.eval.fast_forward import make_fast_forward

        forward = make_fast_forward(model_cfg, use_pallas=use_pallas)
    else:
        from crosstalk_tpu.models import build_model

        model = build_model(model_cfg)

        def forward(v, batch):
            return model.apply(v, batch, train=False)

    def serve(variables, raw):
        return forward(variables, normalize_batch_nhwc(raw))[:, 0]

    return serve


def export_serving_model(
    variables,
    model_cfg: ModelConfig,
    batch_size: Optional[int] = None,
    image_size: int = 256,
    fast: bool = True,
    platforms: Sequence[str] = ("tpu", "cpu"),
    int8_scales=None,
) -> Tuple[bytes, bytes]:
    """-> (stablehlo blob, weights npz bytes) for ``platforms``
    (cross-lowering: no TPU needs to be attached to export for one).

    ``batch_size=None`` (the default) exports with a SYMBOLIC batch
    dimension — the artifact accepts any batch size, each distinct size
    compiling once at the deployment site; an int pins one static shape.

    ``int8_scales`` (from ``eval.calibrate_int8``) lowers the opt-in int8
    MXU tier instead of the bf16 serving path; the calibrated activation
    scales bake into the program, so the artifact needs no calibration
    data at the deployment site. OUTSIDE the 1e-4 parity budget — see
    DEPLOY.md's parity map.

    The weight leaves are flattened in jax.tree deterministic order and
    passed to the exported program as a tuple argument; the npz stores them
    under keys ``w0..wN`` in that order."""
    import io as _io

    from jax import export as jexport

    serve = make_forward(model_cfg, fast=fast, int8_scales=int8_scales)
    leaves, treedef = jax.tree_util.tree_flatten(variables)

    def serve_flat(leaf_tuple, raw):
        return serve(jax.tree_util.tree_unflatten(treedef, list(leaf_tuple)), raw)

    if batch_size is None:
        (batch_dim,) = jexport.symbolic_shape("b")
    else:
        batch_dim = batch_size
    exported = jexport.export(jax.jit(serve_flat), platforms=list(platforms))(
        tuple(jax.ShapeDtypeStruct(np.shape(l), np.asarray(l).dtype)
              for l in leaves),
        jax.ShapeDtypeStruct((batch_dim, image_size, image_size, 2),
                             jnp.float32),
    )
    buf = _io.BytesIO()
    np.savez_compressed(
        buf, **{f"w{i}": np.asarray(l) for i, l in enumerate(leaves)}
    )
    return exported.serialize(), buf.getvalue()


def save_exported(path: str, blob: bytes, weights: bytes, meta: Dict) -> None:
    payload = json.dumps(meta).encode()
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)
        f.write(struct.pack("<Q", len(weights)))
        f.write(weights)
        f.write(blob)
    os.replace(tmp, path)  # atomic: no truncated artifact at the final path


def read_exported(path: str) -> Tuple[bytes, bytes, Dict]:
    """-> (stablehlo blob, weights npz bytes, metadata).
    Raises ValueError on a bad file."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a crosstalk export (magic {magic!r})")
        header = f.read(4)
        if len(header) < 4:
            raise ValueError(f"{path}: truncated export header")
        (n,) = struct.unpack("<I", header)
        payload = f.read(n)
        if len(payload) < n:
            raise ValueError(f"{path}: truncated export metadata")
        try:
            meta = json.loads(payload.decode())
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise ValueError(f"{path}: corrupt export metadata: {e}")
        wheader = f.read(8)
        if len(wheader) < 8:
            raise ValueError(f"{path}: truncated weights header")
        (wn,) = struct.unpack("<Q", wheader)
        weights = f.read(wn)
        if len(weights) < wn:
            raise ValueError(f"{path}: truncated weights section")
        blob = f.read()
        if not blob:
            raise ValueError(f"{path}: export contains no StableHLO module")
    return blob, weights, meta


def load_exported(path: str):
    """-> (fn(raw (B,H,W,2) np/jnp) -> (B,) f32 np, metadata dict).

    Requires only jax + numpy — no crosstalk model code, no checkpoint.
    Weights are device_put once here; each call ships only the batch.
    """
    import io as _io

    from jax import export as jexport

    blob, weights, meta = read_exported(path)
    exported = jexport.deserialize(blob)
    import zipfile

    try:
        with np.load(_io.BytesIO(weights)) as npz:
            leaves = tuple(
                jax.device_put(npz[f"w{i}"]) for i in range(len(npz.files))
            )
    except (KeyError, zipfile.BadZipFile, OSError) as e:
        raise ValueError(f"{path}: corrupt weights section: {e}")

    def fn(raw) -> np.ndarray:
        return np.asarray(exported.call(leaves, jnp.asarray(raw, jnp.float32)))

    return fn, meta
