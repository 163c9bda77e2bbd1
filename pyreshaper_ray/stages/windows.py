"""Window-function operators (LAG / running-total shapes).

PyReshaper has no relational window functions; the closest analog is its
per-variable time ordering inside the slice→series convert loop (public repo
``reshaper.py::convert``). A transcript engine needs the two canonical
window shapes over per-conversation ordered turns:

- ``turn_gaps``: LAG(ts) — per-conversation inter-turn gap statistics
  (response-latency analysis over streams).
- ``cumulative_chars``: SUM(x) OVER (PARTITION BY conv ORDER BY turn) — the
  running-total shape (context-length growth over a conversation).

Both run as vectorized per-group kernels inside
``groupby(conv_id).map_groups``: ONE hash shuffle on the partition key, then
numpy ``diff`` / ``cumsum`` over the turn-sorted group — state never crosses
conversations, so the operator scales with the number of conversations and
is skew-bound only by the largest single conversation (the segment-salting
path in ``pipelines/flagship.py`` covers the degenerate giant-conversation
case for the flagship; these analytics accept the per-group bound).

Gaps are emitted in integer microseconds (BIGINT) so the DuckDB oracle
(``epoch_us(ts) - epoch_us(LAG(ts) ...)``) matches bit-for-bit — no
float interval arithmetic anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _sorted_group(group: pa.Table, key: str = "turn_idx") -> pa.Table:
    return group.take(pc.sort_indices(group, sort_keys=[(key, "ascending")]))


def turn_gaps(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-conversation inter-turn gap stats in microseconds.

    Output: conv_id, n_gaps, sum_gap_us, max_gap_us (all BIGINT; the
    single-turn conversation emits n_gaps=0 with null sum/max, matching the
    SQL aggregate-over-empty-window semantics).
    """

    def gaps(group: pa.Table) -> pa.Table:
        g = _sorted_group(group)
        ts = (
            g["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        d = np.diff(ts)
        n = len(d)
        return pa.table(
            {
                "conv_id": pa.array([g["conv_id"][0].as_py()], pa.string()),
                "n_gaps": pa.array([n], pa.int64()),
                "sum_gap_us": pa.array(
                    [int(d.sum()) if n else None], pa.int64()
                ),
                "max_gap_us": pa.array(
                    [int(d.max()) if n else None], pa.int64()
                ),
            }
        )

    return ds_transcripts.groupby("conv_id").map_groups(
        gaps, batch_format="pyarrow"
    )


def cumulative_chars(ds_normalized: "ray.data.Dataset") -> "ray.data.Dataset":
    """Running char total per conversation ordered by turn_idx — the
    SUM() OVER (PARTITION BY conv_id ORDER BY turn_idx) shape.

    Output: one row per turn (conv_id, turn_idx, cum_chars BIGINT).
    ``turn_idx`` is unique within a conversation (adapter contract,
    ``sources/adapters.py``), so the frame is unambiguous.
    """

    def cum(group: pa.Table) -> pa.Table:
        g = _sorted_group(group)
        chars = g["char_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "turn_idx": g["turn_idx"],
                "cum_chars": pa.array(np.cumsum(chars), pa.int64()),
            }
        )

    return ds_normalized.groupby("conv_id").map_groups(
        cum, batch_format="pyarrow"
    )


def late_events(events_ds: "ray.data.Dataset", watermark_s: int = 1800) -> "ray.data.Dataset":
    """Streaming watermark shape: per user stream in ARRIVAL order
    (event_id), an event is late when its event time trails the stream's
    running high-water mark by more than ``watermark_s`` — the out-of-order
    ingestion detector every event-time pipeline needs.

    Vectorized per-group kernel: sort by event_id once, shifted
    ``np.maximum.accumulate`` gives the prior high-water mark, one compare
    flags late rows. State stays inside a user's stream → shuffle key is
    user_id, same partitioning rule as every other per-stream operator.

    Output: user_id, n_late (BIGINT), n_events (BIGINT).
    """
    wm_us = watermark_s * 1_000_000

    def flag(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(group, sort_keys=[("event_id", "ascending")])
        )
        ts = (
            g["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        n = len(ts)
        if n > 1:
            hwm_prev = np.maximum.accumulate(ts)[:-1]
            late = ts[1:] < hwm_prev - wm_us
            n_late = int(late.sum())
        else:
            n_late = 0
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "n_late": pa.array([n_late], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
            }
        )

    return events_ds.groupby("user_id").map_groups(flag, batch_format="pyarrow")


def session_windows(
    ds_transcripts: "ray.data.Dataset", gap_s: int = 1800
) -> "ray.data.Dataset":
    """Session-window assignment (the session analog of tumbling windows):
    a new session starts when the gap to the previous turn exceeds
    ``gap_s``; every turn gets a session index, then sessions aggregate.

    Extends ``analytics.sessionize`` (which only counts sessions) to
    first-class windows: per-group sort + diff + cumsum assigns ids fully
    vectorized; output one row per session.

    Output: conv_id, session_idx (BIGINT, 0-based), n_turns, start_ts,
    end_ts.
    """
    gap_us = gap_s * 1_000_000

    def assign(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("turn_idx", "ascending")]
            )
        )
        ts = (
            g["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        brk = np.concatenate(([0], (np.diff(ts) > gap_us).astype(np.int64)))
        sid = np.cumsum(brk)
        t = pa.table(
            {
                "conv_id": g["conv_id"],
                "session_idx": pa.array(sid, pa.int64()),
                "ts": g["ts"],
            }
        )
        agg = t.group_by(["conv_id", "session_idx"]).aggregate(
            [("ts", "count"), ("ts", "min"), ("ts", "max")]
        )
        return pa.table(
            {
                "conv_id": agg["conv_id"],
                "session_idx": agg["session_idx"],
                "n_turns": pc.cast(agg["ts_count"], pa.int64()),
                "start_ts": agg["ts_min"],
                "end_ts": agg["ts_max"],
            }
        )

    return ds_transcripts.groupby("conv_id").map_groups(
        assign, batch_format="pyarrow"
    )


def roles_concat(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Ordered group-concat (STRING_AGG ... ORDER BY turn_idx): the
    role sequence of each conversation as one comma-joined string — the
    collect-ordered-list shape used for sequence mining over streams.

    Output: conv_id, role_seq (string).
    """

    def cat(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(group, sort_keys=[("turn_idx", "ascending")])
        )
        return pa.table(
            {
                "conv_id": pa.array([g["conv_id"][0].as_py()], pa.string()),
                "role_seq": pa.array(
                    [",".join(g["role"].to_pylist())], pa.string()
                ),
            }
        )

    return ds_transcripts.groupby("conv_id").map_groups(
        cat, batch_format="pyarrow"
    )
