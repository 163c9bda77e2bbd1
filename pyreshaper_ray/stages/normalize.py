"""Stateless normalization stage — `map_batches` over zero-copy Arrow.

Analog of PyReshaper's header-inspection + classification pass
(``reshaper.py::Slice2SeriesReshaper.__init__`` input-validation loop in the
public repo) plus the north_rule's derived metric columns. Runs as plain
tasks (no state), `batch_format="pyarrow"`, vectorized `pyarrow.compute`
kernels only.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.hashing import conv_bucket
from ..functions.normalize import normalize_batch
from ..fixtures import TRANSCRIPT_SCHEMA


def _check_schema(batch: pa.Table) -> None:
    """Fragment-schema check (M1): every block must carry the transcript
    columns with the expected types — fail fast like PyReshaper does on
    dimension/variable mismatch across input files."""
    for field in TRANSCRIPT_SCHEMA:
        got = batch.schema.field(field.name).type
        if got != field.type:
            raise ValueError(
                f"input schema mismatch for {field.name!r}: {got} != {field.type}"
            )


def make_normalize_fn(n_buckets: int | None = None):
    """Build the per-batch normalize fn; optionally append a stable
    `bucket` partition column (hash(conv_id) % n_buckets)."""

    def normalize(batch: pa.Table) -> pa.Table:
        from ..util import tune_worker_threads

        tune_worker_threads()
        _check_schema(batch)
        out = normalize_batch(batch)
        if n_buckets is not None:
            out = out.append_column("bucket", conv_bucket(batch["conv_id"], n_buckets))
        return out

    return normalize


def normalize_dataset(
    ds: "ray.data.Dataset", n_buckets: int | None = None
) -> "ray.data.Dataset":
    return ds.map_batches(
        make_normalize_fn(n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
