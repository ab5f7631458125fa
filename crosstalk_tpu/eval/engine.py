"""Evaluation engine.

One implementation, parameterized, replacing the reference's two copy-pasted
``evaluate_and_save`` variants (train_model.py:27-93 predictions-only;
test-cross-talk-model.py:25-121 predictions + classical metrics).

TPU-first shape: inference AND the five classical metrics run as one jitted
program over padded fixed-size batches; the host only formats CSV rows.
(The reference runs inference at batch size 1 and computes each metric
per-sample on the CPU — that loop dominates its eval wall time.)

The reference divides its final loss by ``len(dataset)`` even when
``drop_last`` discarded samples (train_model.py:60, 445); we evaluate every
sample via pad-and-mask and divide by the number actually evaluated.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crosstalk_tpu.data.pipeline import (
    DeviceDataset,
    TileStore,
    device_prefetch,
    iterate_batches,
    num_batches,
)
from crosstalk_tpu.data.transforms import normalize_batch_nhwc
from crosstalk_tpu.ops.metrics import classical_metrics
from crosstalk_tpu.utils.progress import progress


@functools.partial(jax.jit, static_argnames=("apply_fn", "with_metrics"))
def _eval_step(apply_fn, variables, inputs, labels, mask, with_metrics: bool):
    """Normalize -> forward -> per-sample squared error (+ metrics)."""
    batch = normalize_batch_nhwc(inputs)
    preds = apply_fn(variables, batch)
    sq_err = jnp.square(preds - labels)[:, 0] * mask
    out = {"preds": preds[:, 0], "sq_err": sq_err}
    if with_metrics:
        # Zero the padding rows. Pad rows are index-0 duplicates
        # (pipeline.iterate_batches / DeviceDataset.batches), so their
        # metric values are real numbers that would otherwise be easy to
        # mistake for extra samples in downstream aggregation; zeroing
        # makes "never reaches the CSV" visible in the arrays themselves.
        # Real constant tiles keep their reference-semantics NaN (and under
        # --debug_nans abort on their REAL row, padded or not).
        out.update({
            k: jnp.where(mask > 0, v, 0.0)
            for k, v in classical_metrics(batch).items()
        })
    return out


@functools.lru_cache(maxsize=8)
def _default_forward(model):
    """Stable-identity eval forward per model, so repeated evaluate() calls
    (e.g. the three post-training splits) hit the jit cache instead of
    retracing a fresh lambda each time."""

    def forward(variables, batch):
        return model.apply(variables, batch, train=False)

    return forward


def evaluate(
    model,
    variables,
    store: TileStore,
    batch_size: int = 64,
    with_metrics: bool = True,
    forward_fn=None,
    mesh=None,
    desc: Optional[str] = None,
) -> Tuple[List[Dict], float]:
    """-> (per-sample rows in dataset order, mean MSE loss).

    Row schema matches the reference CSVs: the 8-column eval schema when
    ``with_metrics`` (test-cross-talk-model.py:39-41), else the 2-column
    train-side schema (train_model.py:68). Values are kept as float32
    scalars so CSV text matches the reference's numpy-repr formatting.

    ``forward_fn(variables, batch) -> (B, 1)`` overrides the model apply —
    used to route through the fast serving path (eval/fast_forward.py).

    ``mesh`` enables data-parallel evaluation: batches are sharded over the
    mesh's 'data' axis (variables replicated) and GSPMD partitions the
    forward + metrics across chips — per-sample outputs and CSV order are
    unchanged. ``batch_size`` is rounded to a multiple of the mesh size.

    ``store`` may be a ``DeviceDataset`` (HBM-resident): batches are then
    on-device gathers with no per-batch host->device transfer
    (single-device only — pass a TileStore when evaluating over a mesh).
    """
    apply_fn = forward_fn or _default_forward(model)

    rows: List[Dict] = []
    total_sq_err = 0.0
    total_n = 0
    batch_size = min(batch_size, max(1, len(store)))

    resident = isinstance(store, DeviceDataset)
    if resident and mesh is not None and mesh.size > 1:
        raise ValueError(
            "DeviceDataset evaluation is single-device; pass a TileStore "
            "for mesh-sharded evaluation"
        )

    sharding = None
    if mesh is not None and mesh.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_size = max((batch_size // mesh.size) * mesh.size, mesh.size)
        sharding = NamedSharding(mesh, P("data"))
        variables = jax.device_put(variables, NamedSharding(mesh, P()))

    multihost = jax.process_count() > 1 and sharding is not None
    if resident:
        batches = store.batches(batch_size)
    else:
        assemble = None
        if multihost:
            from crosstalk_tpu.parallel.distributed import process_row_slice

            assemble = process_row_slice(batch_size)
        batches = device_prefetch(
            iterate_batches(store, batch_size, assemble_rows=assemble),
            sharding=sharding,
        )
    if desc is not None:
        batches = progress(batches, desc=desc,
                           total=num_batches(len(store), batch_size))
    for batch in batches:
        out = _eval_step(
            apply_fn, variables, batch.inputs, batch.labels, batch.mask, with_metrics
        )
        if multihost:
            # every process holds only its shard of the outputs; gather so
            # all build the identical full row list (rank 0 writes the CSV)
            from crosstalk_tpu.parallel.distributed import allgather_to_host

            out, mask, labels, ids = allgather_to_host(
                (out, batch.mask, batch.labels, batch.ids)
            )
            labels = labels[:, 0]
        else:
            out = {k: np.asarray(v) for k, v in out.items()}
            mask = np.asarray(batch.mask)
            labels = np.asarray(batch.labels)[:, 0]
            ids = np.asarray(batch.ids)
        real = int(mask.sum())
        total_sq_err += float(out["sq_err"].sum())
        total_n += real
        for j in range(real):
            row = {
                "Actual_Label": np.float32(labels[j]),
                "Predicted_Label": np.float32(out["preds"][j]),
            }
            if with_metrics:
                row = {
                    "Image_ID": int(ids[j]),
                    **row,
                    "Root Mean Squared Error": np.float32(out["Root Mean Squared Error"][j]),
                    "Structural Similarity Index": np.float32(out["Structural Similarity Index"][j]),
                    "Histogram Correlation": np.float32(out["Histogram Correlation"][j]),
                    "Normalized Mutual Information": np.float32(out["Normalized Mutual Information"][j]),
                    "Pearsons Correlation": np.float32(out["Pearsons Correlation"][j]),
                }
            rows.append(row)

    loss = total_sq_err / max(total_n, 1)
    return rows, loss


def evaluate_and_save(
    model,
    variables,
    store: TileStore,
    dataset_name: str,
    output_dir: str,
    ts: str,
    batch_size: int = 64,
    with_metrics: bool = True,
    train_suffix: Optional[str] = None,
    forward_fn=None,
    mesh=None,
) -> float:
    """Full reference behavior: evaluate, write the predictions CSV, and
    render the plot(s). ``train_suffix`` ('{ts}_{bs}_{lr}') selects the
    train-side filename scheme (train_model.py:64-65); otherwise the
    eval-side scheme '{split}_predictions_{ts}.csv' is used."""
    import os

    from crosstalk_tpu.io import artifacts

    primary = jax.process_index() == 0
    rows, loss = evaluate(
        model, variables, store, batch_size, with_metrics,
        forward_fn=forward_fn, mesh=mesh,
        desc=(f"{dataset_name.capitalize()} Set Evaluation"
              if primary else None),
    )
    if not primary:  # rank 0 owns artifacts in multi-host runs
        return loss
    print(f"Final {dataset_name.capitalize()} Loss: {loss:.6f}")

    # suffix for artifact names: the training run's {ts}_{bs}_{lr} when
    # given, else the eval timestamp — never the literal string "None"
    suffix = train_suffix if train_suffix is not None else ts
    csv_name = f"{dataset_name}_predictions_{suffix}.csv"
    fieldnames = artifacts.EVAL_FIELDNAMES if with_metrics else artifacts.TRAIN_FIELDNAMES
    artifacts.write_predictions_csv(os.path.join(output_dir, csv_name), rows, fieldnames)

    if rows:
        if with_metrics:
            artifacts.plot_metric_scatters(output_dir, rows, dataset_name, ts)
        else:
            artifacts.plot_predictions_scatter(
                output_dir,
                rows,
                dataset_name,
                f"{dataset_name}_predictions_plot_{suffix}.png",
            )
    return loss
