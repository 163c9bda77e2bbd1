"""Transcript source readers — the iobackend abstraction analog.

PyReshaper isolates file-format access behind ``iobackend.py`` (netCDF4 vs
PyNIO backends, public repo). Here the "backends" are Ray Data's parquet /
CSV / JSON readers plus a schema-cast stage that guarantees every downstream
operator sees the canonical transcript schema regardless of source format.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..fixtures import TRANSCRIPT_SCHEMA


def _cast_to_canonical(batch: pa.Table) -> pa.Table:
    cols = {}
    for field in TRANSCRIPT_SCHEMA:
        col = batch[field.name]
        if col.type != field.type:
            if field.name == "ts" and pa.types.is_string(col.type):
                col = pc.strptime(col, format="%Y-%m-%dT%H:%M:%S", unit="us")
            else:
                col = pc.cast(col, field.type)
        cols[field.name] = col
    return pa.table(cols)


def read_transcripts(path: str | list[str], format: str = "parquet") -> "ray.data.Dataset":
    """Read transcripts from parquet (default), csv, or json lines."""
    if format == "parquet":
        ds = ray.data.read_parquet(path, columns=list(TRANSCRIPT_SCHEMA.names))
    elif format == "csv":
        ds = ray.data.read_csv(path)
    elif format == "json":
        ds = ray.data.read_json(path)
    else:
        raise ValueError(f"unknown transcript format: {format!r}")
    if format != "parquet":
        ds = ds.map_batches(
            _cast_to_canonical, batch_format="pyarrow", zero_copy_batch=True
        )
    return ds
