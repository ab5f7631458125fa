"""AOT serving-model export: serialize the serving forward as StableHLO.

`jax.export` lowers the jitted serving program ONCE — weights baked in as
constants, normalization included, fixed batch shape — into a
version-stable StableHLO artifact that loads and runs with NO model code,
checkpoint file, or flax dependency at the deployment site:

    tools/export_model.py -p model.pth --out model.ctkx        # export
    fn, meta = load_exported("model.ctkx"); alphas = fn(tiles)  # serve

This is the deployment story the reference cannot offer (its .pth needs
the full PyTorch model class at load time — test-cross-talk-model.py:
315-322); here the artifact is the compiler IR itself, portable across
hosts and lowered for multiple platforms at once (default: tpu + cpu).

File format: 8-byte magic, u32 little-endian JSON length, JSON metadata,
then the serialized StableHLO module.

The Pallas input-block kernel is deliberately NOT used in exported
programs: a Mosaic custom call would pin the artifact to one TPU
generation; the XLA-only serving path stays within ~15% of it
(PERF_NOTES.md) and is portable.
"""

from __future__ import annotations

import json
import struct
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crosstalk_tpu.config import ModelConfig
from crosstalk_tpu.data.transforms import normalize_batch_nhwc

_MAGIC = b"CTKX0001"


def make_forward(model_cfg: ModelConfig, fast: bool = True,
                 use_pallas: bool = False):
    """-> fn(variables, raw (B,H,W,2) f32) -> (B,) f32: normalize + forward.

    The single definition of serving semantics — both the online predictor
    (serve/predictor.py) and the AOT export below build on it.
    """
    if fast:
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


def make_serving_fn(variables, model_cfg: ModelConfig, fast: bool = True):
    """-> fn(raw (B,H,W,2) f32) -> (B,) f32 with the weights closed over."""
    serve = make_forward(model_cfg, fast=fast)
    return lambda raw: serve(variables, raw)


def export_serving_model(
    variables,
    model_cfg: ModelConfig,
    batch_size: int,
    image_size: int = 256,
    fast: bool = True,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> bytes:
    """Serialize the serving forward for ``platforms`` (cross-lowering: no
    TPU needs to be attached to export for one)."""
    from jax import export as jexport

    serve = make_serving_fn(variables, model_cfg, fast=fast)
    exported = jexport.export(jax.jit(serve), platforms=list(platforms))(
        jax.ShapeDtypeStruct((batch_size, image_size, image_size, 2),
                             jnp.float32)
    )
    return exported.serialize()


def save_exported(path: str, blob: bytes, meta: Dict) -> None:
    payload = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)
        f.write(blob)


def read_exported(path: str) -> Tuple[bytes, Dict]:
    """-> (stablehlo blob, metadata). Raises ValueError on a bad file."""
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
        blob = f.read()
        if not blob:
            raise ValueError(f"{path}: export contains no StableHLO module")
    return blob, meta


def load_exported(path: str):
    """-> (fn(raw (B,H,W,2) np/jnp) -> (B,) f32 np, metadata dict).

    Requires only jax + numpy — no crosstalk model code, no checkpoint.
    """
    from jax import export as jexport

    blob, meta = read_exported(path)
    exported = jexport.deserialize(blob)

    def fn(raw) -> np.ndarray:
        return np.asarray(exported.call(jnp.asarray(raw, jnp.float32)))

    return fn, meta
