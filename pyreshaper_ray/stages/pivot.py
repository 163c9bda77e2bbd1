"""The pivot — PyReshaper's core transform, Ray-Data-first.

PyReshaper turns time-slice files into per-variable time-series files by a
rank-local read/write loop over statically-partitioned variables
(``reshaper.py::Slice2SeriesReshaper.convert`` in the public repo). Here the
same reshape is one ``groupby(conv_id)`` shuffle: Ray's sort-based exchange
co-locates each conversation, then a per-group Arrow kernel sorts by
``(turn_idx, ts)``, drops exact-duplicate turns keep-first (§2.7), and —
fused into the same pass so the corpus is shuffled ONCE — encodes the
conversation's series with delta-of-delta + Gorilla (the ``netcdf4c``
compression analog).

Scale notes:
  - the shuffle key is `conv_id` alone; every later stage reuses the same
    key, so no second all-to-all is needed for series encoding.
  - a group must fit in a worker's heap; giant conversations are handled by
    the segment-salted path in pipelines/flagship.py / pipelines/bucket.py
    (range salt = turn_idx // S, contiguous segments, tier-merged by
    (conv, window) and re-stitched in salt order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.codecs import dod_encode, gorilla_encode

# Union schema for the fused pivot+encode output: `kind` == "turn" rows carry
# the pivoted per-turn columns; `kind` == "series" rows carry one encoded
# record per conversation (the one-output-file-per-variable analog).
SERIES_COLUMNS = ["conv_id", "n_turns", "dod_ts", "gorilla_char_len"]


def sort_dedup_group(group: pa.Table) -> pa.Table:
    """Sort one conversation by (turn_idx, ts); dedup keep-first on turn_idx.

    The stable-ordering invariant (SURVEY.md §2.6 O3) that the per-turn
    `text`-equality contract depends on. Payload columns complete the sort
    key so the keep-first survivor is deterministic even for same-ts
    duplicates with differing payloads.
    """
    keys = [("turn_idx", "ascending"), ("ts", "ascending")] + [
        (c, "ascending") for c in ("role", "tool", "text") if c in group.column_names
    ]
    idx = pc.sort_indices(group, sort_keys=keys)
    group = group.take(idx)
    t = group["turn_idx"].to_numpy(zero_copy_only=False)
    keep = np.empty(len(t), dtype=bool)
    if len(t):
        keep[0] = True
        np.not_equal(t[1:], t[:-1], out=keep[1:])
    return group.filter(pa.array(keep))


def series_record(sorted_group: pa.Table) -> dict:
    """Encode one sorted conversation's series → one record."""
    ts = (
        sorted_group["ts"]
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype(np.int64)
    )
    vals = sorted_group["char_len"].to_numpy(zero_copy_only=False).astype(np.float64)
    return {
        "conv_id": sorted_group["conv_id"][0].as_py(),
        "n_turns": len(ts),
        "dod_ts": dod_encode(ts),
        "gorilla_char_len": gorilla_encode(vals),
    }


def _pivot_group(group: pa.Table) -> pa.Table:
    return sort_dedup_group(group)


def _pivot_encode_group(group: pa.Table) -> pa.Table:
    """Fused kernel: pivoted turn rows + one series row, union schema."""
    g = sort_dedup_group(group)
    n = g.num_rows
    rec = series_record(g)
    kind = pa.array(["turn"] * n + ["series"], pa.string())
    out: dict[str, pa.Array] = {"kind": kind}
    for name in g.column_names:
        col = g[name].combine_chunks()
        if name in ("conv_id", "bucket") and n > 0:
            # conversation-constant columns stay populated on the series row
            tail = col.slice(0, 1)
        else:
            tail = pa.nulls(1, col.type)
        out[name] = pa.concat_arrays([col, tail])
    out["n_turns"] = pa.array([None] * n + [rec["n_turns"]], pa.int64())
    out["dod_ts"] = pa.array([None] * n + [rec["dod_ts"]], pa.binary())
    out["gorilla_char_len"] = pa.array(
        [None] * n + [rec["gorilla_char_len"]], pa.binary()
    )
    return pa.table(out)


def pivot_turns(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """groupby(conv_id) → per-group sort+dedup. Turn rows only."""
    return ds.groupby("conv_id").map_groups(_pivot_group, batch_format="pyarrow")


def pivot_and_encode(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """One shuffle producing both the turns tier and the encoded series tier
    (filter on `kind` downstream; Parquet nulls cost ~nothing)."""
    return ds.groupby("conv_id").map_groups(
        _pivot_encode_group, batch_format="pyarrow"
    )


def decode_series_stats(ds_series: "ray.data.Dataset") -> "ray.data.Dataset":
    """Decode the compressed per-conversation series and re-derive stats —
    (n_turns, char_sum, first_ts, last_ts) PER CONVERSATION come back out of
    the DoD/Gorilla blobs, proving losslessness end-to-end at the Dataset
    level (the SQL oracle recomputes the same stats from the raw rows)."""
    from ..functions.codecs import dod_decode, gorilla_decode

    def decode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        n_turns = np.empty(n, dtype=np.int64)
        char_sum = np.empty(n, dtype=np.int64)
        first_ts = np.empty(n, dtype=np.int64)
        last_ts = np.empty(n, dtype=np.int64)
        dod = batch["dod_ts"].to_pylist()
        gor = batch["gorilla_char_len"].to_pylist()
        for i in range(n):
            ts = dod_decode(dod[i])
            vals = gorilla_decode(gor[i])
            n_turns[i] = len(ts)
            char_sum[i] = int(vals.sum())
            first_ts[i] = ts[0] if len(ts) else 0
            last_ts[i] = ts[-1] if len(ts) else 0
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "n_turns": pa.array(n_turns, pa.int64()),
                "char_sum": pa.array(char_sum, pa.int64()),
                "first_ts": pa.array(first_ts, pa.timestamp("us")),
                "last_ts": pa.array(last_ts, pa.timestamp("us")),
            }
        )

    return ds_series.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def encode_series(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Standalone series encoder (used when turns are already pivoted)."""

    def enc(group: pa.Table) -> pa.Table:
        g = sort_dedup_group(group)
        rec = series_record(g)
        return pa.table(
            {
                "conv_id": pa.array([rec["conv_id"]], pa.string()),
                "n_turns": pa.array([rec["n_turns"]], pa.int64()),
                "dod_ts": pa.array([rec["dod_ts"]], pa.binary()),
                "gorilla_char_len": pa.array([rec["gorilla_char_len"]], pa.binary()),
            }
        )

    return ds.groupby("conv_id").map_groups(enc, batch_format="pyarrow")
