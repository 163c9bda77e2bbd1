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


# non-ISO layouts tried (in order) when the vectorized ISO cast fails
_TS_FORMATS = (
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%m/%d/%Y %H:%M:%S",
    "%m/%d/%Y",
)


def _parse_ts_strings(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Parse timestamp strings: Arrow's ISO-8601 cast first (covers T/space
    separators, fractional seconds, date-only; a trailing Z is stripped),
    then a per-row first-format-wins coalesce over common non-ISO layouts.
    Unparseable rows raise, naming the offending value."""
    col = pc.replace_substring_regex(col, pattern="Z$", replacement="")
    try:
        return pc.cast(col, pa.timestamp("us"))
    except pa.ArrowInvalid:
        pass
    parsed = None
    for fmt in _TS_FORMATS:
        attempt = pc.strptime(col, format=fmt, unit="us", error_is_null=True)
        parsed = attempt if parsed is None else pc.coalesce(parsed, attempt)
    bad = pc.and_(pc.is_null(parsed), pc.is_valid(col))
    if pc.any(bad).as_py():
        example = col.filter(bad)[0].as_py()
        raise ValueError(
            f"unparseable timestamp string {example!r}; accepted: ISO-8601 "
            "variants or one of " + ", ".join(_TS_FORMATS)
        )
    return parsed


def _epoch_ints_to_us(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Epoch-integer timestamps: unit inferred from magnitude (s / ms / µs —
    the ranges are disjoint for any date between 1973 and 5000 CE)."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    v = col.to_numpy(zero_copy_only=False).astype(np.int64)
    mags = np.abs(v[v != 0])
    if len(mags) == 0 or mags.max() >= 10**14:  # already microseconds
        scale = 1
    elif mags.max() >= 10**11:  # milliseconds
        scale = 1_000
    else:  # seconds
        scale = 1_000_000
    return pa.array(v * scale, pa.timestamp("us"))


def _cast_to_canonical(batch: pa.Table) -> pa.Table:
    cols = {}
    for field in TRANSCRIPT_SCHEMA:
        col = batch[field.name]
        if col.type != field.type:
            if field.name == "ts" and pa.types.is_string(col.type):
                col = _parse_ts_strings(col)
            elif field.name == "ts" and pa.types.is_integer(col.type):
                col = _epoch_ints_to_us(col)
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
    elif format in ("ipc", "feather", "arrow"):
        # Ray 2.49 has no Arrow-IPC reader; one binary file per read task →
        # blocks stay 1:1 with files and the parse is a zero-copy
        # ``pa.ipc`` open inside map_batches (file format first, stream
        # format fallback — covers both feather v2 and raw streams)
        files = ray.data.read_binary_files(path)

        def parse_ipc(batch: pa.Table) -> pa.Table:
            tables = []
            for buf in batch["bytes"].to_pylist():
                reader_buf = pa.BufferReader(buf)
                try:
                    t = pa.ipc.open_file(reader_buf).read_all()
                except pa.ArrowInvalid:
                    reader_buf.seek(0)
                    t = pa.ipc.open_stream(reader_buf).read_all()
                tables.append(t.select(list(TRANSCRIPT_SCHEMA.names)))
            return pa.concat_tables(tables)

        ds = files.map_batches(parse_ipc, batch_format="pyarrow")
    else:
        raise ValueError(f"unknown transcript format: {format!r}")
    if format != "parquet":
        ds = ds.map_batches(
            _cast_to_canonical, batch_format="pyarrow", zero_copy_batch=True
        )
    return ds
