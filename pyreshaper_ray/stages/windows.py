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


def rank_convs_in_cohort(ds_normalized: "ray.data.Dataset") -> "ray.data.Dataset":
    """RANK() / DENSE_RANK() OVER (PARTITION BY cohort ORDER BY char_sum
    DESC) — the classic ranked-leaderboard window over per-conversation
    totals.

    Two stages, both scale-safe: a combiner pre-aggregates turns to one row
    per conversation (the only pass over raw data), then the rank kernel runs
    per cohort over conversation-sized rows inside
    ``groupby(cohort).map_groups`` — ties share a rank (no arbitrary
    tie-break is needed for RANK semantics), computed vectorized from the
    sorted runs.

    Output: cohort, conv_id, char_sum, rnk, dense_rnk (BIGINT).
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["conv_id"]).aggregate([("char_len", "sum")])
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "char_sum": pc.cast(g["char_len_sum"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    p = ds_normalized.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    totals = p.groupby("conv_id").aggregate(Sum("char_sum", alias_name="char_sum"))

    def add_cohort(batch: pa.Table) -> pa.Table:
        num = pc.cast(pc.utf8_slice_codeunits(batch["conv_id"], 1, 99), pa.int64())
        cohort = pc.if_else(
            pc.equal(pc.bit_wise_and(num, 1), 0),
            pa.scalar("even"),
            pa.scalar("odd"),
        )
        return batch.append_column("cohort", cohort)

    def rank_kernel(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("char_sum", "descending"), ("conv_id", "ascending")],
        )
        g = group.take(idx)
        v = g["char_sum"].to_numpy(zero_copy_only=False)
        n = len(v)
        # run starts: first occurrence of each distinct value in desc order
        change = np.concatenate(([True], v[1:] != v[:-1]))
        starts = np.flatnonzero(change)
        run_len = np.diff(np.append(starts, n))
        rnk = np.repeat(starts + 1, run_len)  # RANK: 1-based first index
        dense = np.repeat(np.arange(1, len(starts) + 1), run_len)
        return pa.table(
            {
                "cohort": g["cohort"],
                "conv_id": g["conv_id"],
                "char_sum": g["char_sum"],
                "rnk": pa.array(rnk, pa.int64()),
                "dense_rnk": pa.array(dense, pa.int64()),
            }
        )

    withc = totals.map_batches(
        add_cohort, batch_format="pyarrow", zero_copy_batch=True
    )
    return withc.groupby("cohort").map_groups(rank_kernel, batch_format="pyarrow")


def moving_sum_turns(
    ds_normalized: "ray.data.Dataset", frame: int = 3
) -> "ray.data.Dataset":
    """SUM(char_len) OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS
    BETWEEN ``frame``-1 PRECEDING AND CURRENT ROW) — the rows-frame moving
    window, integer-exact (a moving SUM, not AVG, so no float summation
    order to match). Vectorized as a cumsum difference per sorted group.

    Output: conv_id, turn_idx, win_chars (BIGINT).
    """

    def kernel(group: pa.Table) -> pa.Table:
        g = _sorted_group(group)
        x = g["char_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.cumsum(x)
        out = c.copy()
        if len(x) > frame - 1:
            out[frame:] = c[frame:] - c[:-frame]
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "turn_idx": g["turn_idx"],
                "win_chars": pa.array(out, pa.int64()),
            }
        )

    return ds_normalized.groupby("conv_id").map_groups(
        kernel, batch_format="pyarrow"
    )


def rolling_minmax_turns(
    ds_normalized: "ray.data.Dataset", frame: int = 3
) -> "ray.data.Dataset":
    """MIN/MAX(char_len) OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS
    BETWEEN ``frame``-1 PRECEDING AND CURRENT ROW) — the rolling-extrema
    frame window, integer-exact. Vectorized as ``frame``-1 shifted
    elementwise min/max passes per sorted group (O(frame·n); for large
    frames swap in a monotonic-deque kernel — same partitioning, same
    output contract).

    Output: conv_id, turn_idx, roll_min, roll_max (BIGINT).
    """

    def kernel(group: pa.Table) -> pa.Table:
        g = _sorted_group(group)
        x = g["char_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        mn = x.copy()
        mx = x.copy()
        for s in range(1, frame):
            if s >= len(x):
                break
            np.minimum(mn[s:], x[:-s], out=mn[s:])
            np.maximum(mx[s:], x[:-s], out=mx[s:])
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "turn_idx": g["turn_idx"],
                "roll_min": pa.array(mn, pa.int64()),
                "roll_max": pa.array(mx, pa.int64()),
            }
        )

    return ds_normalized.groupby("conv_id").map_groups(
        kernel, batch_format="pyarrow"
    )


def first_last_role(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """FIRST_VALUE / LAST_VALUE by turn order per conversation (the
    arg-min/arg-max shape: ``arg_min(role, turn_idx)`` in DuckDB terms),
    plus the stream's time bounds.

    Output: conv_id, first_role, last_role, first_ts, last_ts.
    """

    def kernel(group: pa.Table) -> pa.Table:
        g = _sorted_group(group)
        return pa.table(
            {
                "conv_id": pa.array([g["conv_id"][0].as_py()], pa.string()),
                "first_role": pa.array([g["role"][0].as_py()], pa.string()),
                "last_role": pa.array([g["role"][-1].as_py()], pa.string()),
                "first_ts": pa.array(
                    [g["ts"][0].as_py()], pa.timestamp("us")
                ),
                "last_ts": pa.array([g["ts"][-1].as_py()], pa.timestamp("us")),
            }
        )

    return ds_transcripts.groupby("conv_id").map_groups(
        kernel, batch_format="pyarrow"
    )


def mode_role_per_conv(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Most frequent role per conversation (grouped MODE) with a
    deterministic tie-break (count DESC, then role ASC) so the result is
    reproducible across engines — SQL MODE() leaves ties
    implementation-defined, so the oracle restates it as a ROW_NUMBER pick.

    Output: conv_id, mode_role, n_turns (count of that role, BIGINT).
    """

    def kernel(group: pa.Table) -> pa.Table:
        counts = group.group_by(["role"]).aggregate([("role", "count")])
        idx = pc.sort_indices(
            counts,
            sort_keys=[("role_count", "descending"), ("role", "ascending")],
        )
        top = counts.take(idx[:1])
        return pa.table(
            {
                "conv_id": pa.array([group["conv_id"][0].as_py()], pa.string()),
                "mode_role": top["role"],
                "n_turns": pc.cast(top["role_count"], pa.int64()),
            }
        )

    return ds_transcripts.groupby("conv_id").map_groups(
        kernel, batch_format="pyarrow"
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


def ntile_convs(ds_normalized: "ray.data.Dataset", k: int = 4) -> "ray.data.Dataset":
    """NTILE(k) OVER (ORDER BY char_sum, conv_id) — equal-height tile
    assignment over per-conversation totals (the quartile/decile bucketing
    shape).

    NTILE needs every row's exact global rank under a total order, so one
    distributed sort is irreducible — but it runs over the combiner-reduced
    one-row-per-conversation table, never raw turns. The sorted Dataset is
    materialized ONCE so both rank passes see identical block boundaries:
    pass 1 reduces each block to (first_key, n_rows); the driver prefix-sums
    those (block-count-sized, tiny) into per-block rank offsets keyed by the
    block's first row; pass 2 assigns rank = offset + arange(block) and the
    SQL NTILE split (first ``n % k`` tiles get one extra row) vectorized.

    The ordering key (char_sum, conv_id) is unique (conv_id is), so tiles
    are deterministic and the DuckDB oracle matches exactly.

    Output: conv_id, char_sum, tile (BIGINT, 1-based).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["conv_id"]).aggregate([("char_len", "sum")])
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "char_sum": pc.cast(g["char_len_sum"], pa.int64()),
            }
        )

    totals = (
        ds_normalized.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("conv_id")
        .aggregate(Sum("char_sum", alias_name="char_sum"))
    )
    # one-row-per-conversation table; materialize so both passes below see
    # the SAME block boundaries (a lazy re-execution may split differently)
    ordered = totals.sort(["char_sum", "conv_id"]).materialize()

    def block_head(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "char_sum": pa.array([], pa.int64()),
                    "conv_id": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "char_sum": batch["char_sum"][:1],
                "conv_id": batch["conv_id"][:1],
                "n": pa.array([batch.num_rows], pa.int64()),
            }
        )

    # batch_size=None ⇒ one batch per BLOCK — the offset bookkeeping below
    # is keyed by block-first rows, so row-count batching would break it
    heads = ordered.map_batches(
        block_head, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    heads.sort(key=lambda r: (r["char_sum"], r["conv_id"]))
    n_total = sum(r["n"] for r in heads)
    offsets: dict[tuple, int] = {}
    acc = 0
    for r in heads:
        offsets[(r["char_sum"], r["conv_id"])] = acc
        acc += r["n"]

    q, rem = divmod(n_total, k)
    cut = rem * (q + 1)  # ranks below this sit in the wider tiles

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "char_sum": pa.array([], pa.int64()),
                    "tile": pa.array([], pa.int64()),
                }
            )
        first = (batch["char_sum"][0].as_py(), batch["conv_id"][0].as_py())
        rank = offsets[first] + np.arange(batch.num_rows, dtype=np.int64)
        tile = np.where(
            rank < cut,
            rank // (q + 1),
            rem + (np.maximum(rank - cut, 0) // max(q, 1)),
        )
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "char_sum": batch["char_sum"],
                "tile": pa.array(tile + 1, pa.int64()),
            }
        )

    return ordered.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def rolling_range_sum_user(
    events_ds: "ray.data.Dataset", window_days: int = 7
) -> "ray.data.Dataset":
    """SUM(value) OVER (PARTITION BY user_id ORDER BY ts RANGE BETWEEN
    ``window_days`` PRECEDING AND CURRENT ROW) — the RANGE (time-interval)
    frame, as opposed to the ROWS frame of ``moving_sum_turns``: the frame
    holds every event in the trailing time window, however many rows that
    is, and timestamp PEERS (equal ts) are all included per the SQL
    standard.

    Per-user kernel inside ``groupby(user_id).map_groups``: sort by ts,
    one cumsum, then two vectorized ``searchsorted`` calls resolve each
    row's [ts - window, ts] frame — O(n log n) per user, no per-row loop.
    Values are exact integer cents.

    Output: user_id (BIGINT), ts (timestamp us), win_cents (BIGINT).
    """
    window_us = window_days * 86_400_000_000

    def kernel(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("ts", "ascending")])
        g = group.take(order)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        cents = (
            pc.cast(
                pc.round(pc.multiply(pc.cast(g["value"], pa.float64()), 100.0)),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        csum = np.cumsum(cents)
        lo = np.searchsorted(us, us - window_us, side="left")
        hi = np.searchsorted(us, us, side="right")
        out = csum[hi - 1] - np.where(lo > 0, csum[lo - 1], 0)
        return pa.table(
            {
                "user_id": g["user_id"],
                "ts": g["ts"],
                "win_cents": pa.array(out, pa.int64()),
            }
        )

    return events_ds.groupby("user_id").map_groups(
        kernel, batch_format="pyarrow"
    )


def debounce_events(
    events_ds: "ray.data.Dataset", gap_s: int = 600
) -> "ray.data.Dataset":
    """Debounce/throttle an event stream: keep an event iff it is the first
    for its (user_id, event_type) key or arrives more than ``gap_s``
    seconds after the key's PREVIOUS event (LAG semantics — each event
    compares to its immediate predecessor, so the filter is a pure window
    expression, SQL-replayable; a "previous KEPT" throttle would be a
    stateful scan with no SQL analog).

    One hash groupby on the composite key, then a vectorized sorted-diff
    kernel per group — the ingest-hygiene stage that strips
    double-fires/retries before counts are computed downstream.

    Output: event_id, user_id, event_type, ts.
    """
    gap_us = gap_s * 1_000_000

    def kernel(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        return g.filter(pa.array(keep)).select(
            ["event_id", "user_id", "event_type", "ts"]
        )

    return events_ds.groupby(["user_id", "event_type"]).map_groups(
        kernel, batch_format="pyarrow"
    )


def drop_repeated_turns(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Consecutive-duplicate compaction per conversation: keep a turn iff
    its text differs from the immediately preceding turn's (LAG semantics)
    — the retry/double-send scrub a transcript corpus runs before token
    counting, the text analog of ``debounce_events``.

    One hash groupby on the stream key; the per-group kernel compares
    adjacent Arrow string slices (vectorized, no Python per row). Emits the
    kept keys only — re-attach text downstream if needed, so the exchange
    after the scrub is key-sized.

    Output: conv_id, turn_idx.
    """

    def kernel(group: pa.Table) -> pa.Table:
        g = _sorted_group(group)
        txt = g["text"].combine_chunks()
        if len(txt) <= 1:
            keep = pa.array([True] * len(txt))
        else:
            neq = pc.not_equal(txt.slice(1), txt.slice(0, len(txt) - 1))
            keep = pa.array(np.r_[True, neq.to_numpy(zero_copy_only=False)])
        return g.filter(keep).select(["conv_id", "turn_idx"])

    return ds_transcripts.groupby("conv_id").map_groups(
        kernel, batch_format="pyarrow"
    )


def event_trigrams(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Second-order event-sequence mining: count each consecutive
    (a, b, c) event-type TRIPLE per user stream under the deterministic
    (ts, event_id) order, summed globally — ``event_transitions`` extended
    one step (the "what path led here" question funnels can't answer).

    Per-user kernel = one sort + three array slices + an Arrow group_by;
    each group reduces to <= |types|³ rows before the result-sized final
    aggregate.

    Output: a, b, c (STRING), n (BIGINT).
    """
    OUT = pa.schema(
        [
            ("a", pa.string()),
            ("b", pa.string()),
            ("c", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def triples(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        et = g["event_type"]
        if len(et) < 3:
            return OUT.empty_table()
        t = pa.table(
            {
                "a": et.slice(0, len(et) - 2).combine_chunks(),
                "b": et.slice(1, len(et) - 2).combine_chunks(),
                "c": et.slice(2).combine_chunks(),
            }
        )
        agg = t.group_by(["a", "b", "c"]).aggregate([("a", "count")])
        return pa.table(
            {
                "a": agg["a"],
                "b": agg["b"],
                "c": agg["c"],
                "n": pc.cast(agg["a_count"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        events_ds.groupby("user_id")
        .map_groups(triples, batch_format="pyarrow")
        .groupby(["a", "b", "c"])
        .aggregate(Sum("n", alias_name="n"))
    )


def user_gap_stats(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Inter-event gap distribution per user (burstiness analysis): count,
    sum, sum-of-squares, min and max of whole-second gaps between
    consecutive events under the deterministic (ts, event_id) order.

    All outputs are associative integer stats (gaps floor to whole seconds
    BEFORE squaring so Σgap² stays far inside int64), one hash groupby on
    the user key, vectorized diff kernel per group. Single-event users emit
    nothing (no gap exists).

    Output: user_id, n_gaps, sum_gap_s, sumsq_gap_s, min_gap_s, max_gap_s.
    """
    OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_gaps", pa.int64()),
            ("sum_gap_s", pa.int64()),
            ("sumsq_gap_s", pa.int64()),
            ("min_gap_s", pa.int64()),
            ("max_gap_s", pa.int64()),
        ]
    )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows < 2:
            return OUT.empty_table()
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        gap_s = (ts[1:] - ts[:-1]) // 1_000_000
        return pa.table(
            {
                "user_id": pc.cast(g["user_id"][:1], pa.int64()),
                "n_gaps": pa.array([len(gap_s)], pa.int64()),
                "sum_gap_s": pa.array([int(gap_s.sum())], pa.int64()),
                "sumsq_gap_s": pa.array([int((gap_s * gap_s).sum())], pa.int64()),
                "min_gap_s": pa.array([int(gap_s.min())], pa.int64()),
                "max_gap_s": pa.array([int(gap_s.max())], pa.int64()),
            }
        )

    return events_ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow")


def event_transitions(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """First-order event-sequence transitions (Markov-chain counts): per
    user, order events by (ts, event_id) and count each consecutive
    (from_type, to_type) pair — the LEAD() window restated as a per-stream
    kernel, then a tiny global count groupby.

    The per-user kernel is one sort + two array slices (no Python loop);
    each group reduces to <= |event_types|² rows before the final
    result-sized aggregate. The (ts, event_id) sort key makes the order —
    and therefore the counts — deterministic under timestamp ties, and is
    restated in the oracle's LEAD ... ORDER BY ts, event_id.

    Output: from_type (STRING), to_type (STRING), n (BIGINT).
    """

    def pairs(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        et = g["event_type"]
        if len(et) < 2:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "from_type": et.slice(0, len(et) - 1).combine_chunks(),
                "to_type": et.slice(1).combine_chunks(),
            }
        )
        agg = t.group_by(["from_type", "to_type"]).aggregate(
            [("from_type", "count")]
        )
        return pa.table(
            {
                "from_type": agg["from_type"],
                "to_type": agg["to_type"],
                "n": pc.cast(agg["from_type_count"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        events_ds.groupby("user_id")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def ewma_chars(ds_normalized: "ray.data.Dataset", k: int = 8) -> "ray.data.Dataset":
    """Truncated EWMA of char_len per conversation — the time-series
    smoothing kernel (alpha = 1/2, K = ``k`` lags, zero-padded before the
    first turn):

        ewma_i = Σ_{j=0..K-1}  2^-(j+1) · char_len_{i-j}

    Frame ordering is (ts, turn_idx) within the conversation. The dyadic
    weights make every term and every partial sum EXACTLY representable in
    float64 (char_len is a small integer, 2^-(j+1) a power of two), so the
    result is bit-identical to the DuckDB oracle regardless of summation
    order — the same integer-domain determinism rule the rollup tiers use,
    extended to fixed-point floats. A renormalized (divide-by-weight-sum)
    EWMA would lose that exactness; the zero-padding contract keeps it.

    Scale shape: one groupby(conv_id).map_groups — conversation-local,
    no cross-group state; the kernel is K shifted vectorized adds (O(K·n)).

    Output: conv_id, turn_idx, ewma (DOUBLE).
    """

    def kernel(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("turn_idx", "ascending")]
            )
        )
        x = g["char_len"].to_numpy(zero_copy_only=False).astype(np.float64)
        out = np.zeros(len(x), dtype=np.float64)
        for j in range(k):
            w = 2.0 ** -(j + 1)
            if j == 0:
                out += w * x
            elif j < len(x):
                out[j:] += w * x[:-j]
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "turn_idx": g["turn_idx"],
                "ewma": pa.array(out, pa.float64()),
            }
        )

    return ds_normalized.groupby("conv_id").map_groups(kernel, batch_format="pyarrow")


def role_runs(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Run-length encoding of each conversation's role sequence — collapse
    consecutive equal roles (ordered by turn_idx) into runs. The
    gaps-and-islands shape, and the discrete analog of the engine's
    value-compression codecs (a run is an RLE token).

    Per-conversation vectorized kernel (one sort + one shifted compare +
    ``np.flatnonzero`` bounds); state never crosses conversations.

    Output: conv_id, run_idx (BIGINT, 1-based), role, run_len (BIGINT).
    """

    def runs(group: pa.Table) -> pa.Table:
        g = _sorted_group(group)
        roles = g["role"].to_numpy(zero_copy_only=False)
        n = len(roles)
        starts = np.concatenate(
            ([0], np.flatnonzero(roles[1:] != roles[:-1]) + 1)
        )
        lens = np.diff(np.concatenate((starts, [n])))
        return pa.table(
            {
                "conv_id": pa.array(
                    [g["conv_id"][0].as_py()] * len(starts), pa.string()
                ),
                "run_idx": pa.array(
                    np.arange(1, len(starts) + 1, dtype=np.int64), pa.int64()
                ),
                "role": pa.array(roles[starts], pa.string()),
                "run_len": pa.array(lens, pa.int64()),
            }
        )

    return ds_transcripts.groupby("conv_id").map_groups(
        runs, batch_format="pyarrow"
    )


def longest_streak_days(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Longest run of CONSECUTIVE active days per user — the engagement
    streak (gaps-and-islands over the calendar).

    Per-block distinct (user, day) combiner shrinks the exchange to active
    cells; the per-user kernel dedups residual cross-block days
    (``np.unique``), then one diff over day ordinals finds the longest
    consecutive run.

    Output: user_id (BIGINT), longest_streak (BIGINT).
    """

    def distinct_block(b: pa.Table) -> pa.Table:
        days = pc.cast(
            pc.floor_temporal(b["ts"], unit="day"), pa.timestamp("us")
        )
        t = pa.table({"user_id": pc.cast(b["user_id"], pa.int64()), "day": days})
        return t.group_by(["user_id", "day"]).aggregate([])

    def streak(group: pa.Table) -> pa.Table:
        d = (
            group["day"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        d = np.unique(d)
        if len(d) == 1:
            best = 1
        else:
            # split where the day gap exceeds 1; the longest piece wins
            brk = np.flatnonzero(np.diff(d) != 1)
            bounds = np.concatenate(([0], brk + 1, [len(d)]))
            best = int(np.max(np.diff(bounds)))
        return pa.table(
            {
                "user_id": pa.array([group["user_id"][0].as_py()], pa.int64()),
                "longest_streak": pa.array([best], pa.int64()),
            }
        )

    return (
        events_ds.map_batches(
            distinct_block, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("user_id")
        .map_groups(streak, batch_format="pyarrow")
    )


def percent_rank_convs(ds_normalized: "ray.data.Dataset") -> "ray.data.Dataset":
    """PERCENT_RANK() and CUME_DIST() OVER (PARTITION BY cohort ORDER BY
    char_sum) — the normalized-rank pair completing the window-function
    family (RANK/DENSE_RANK/NTILE already exist).

    Same two-stage shape as ``rank_convs_in_cohort``: a combiner reduces
    turns to one row per conversation, the kernel runs per cohort. Both
    outputs are a SINGLE integer÷integer float64 division per row
    ((rank−1)/(n−1), peers_through/n) — bit-exact vs the SQL oracle.

    Output: cohort, conv_id, char_sum, pct_rank, cume (DOUBLE).
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["conv_id"]).aggregate([("char_len", "sum")])
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "char_sum": pc.cast(g["char_len_sum"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    totals = (
        ds_normalized.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("conv_id")
        .aggregate(Sum("char_sum", alias_name="char_sum"))
    )

    def add_cohort(batch: pa.Table) -> pa.Table:
        num = pc.cast(pc.utf8_slice_codeunits(batch["conv_id"], 1, 99), pa.int64())
        cohort = pc.if_else(
            pc.equal(pc.bit_wise_and(num, 1), 0),
            pa.scalar("even"),
            pa.scalar("odd"),
        )
        return batch.append_column("cohort", cohort)

    def kernel(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("char_sum", "ascending"), ("conv_id", "ascending")],
        )
        g = group.take(idx)
        v = g["char_sum"].to_numpy(zero_copy_only=False)
        n = len(v)
        change = np.concatenate(([True], v[1:] != v[:-1]))
        starts = np.flatnonzero(change)
        run_len = np.diff(np.append(starts, n))
        rnk = np.repeat(starts, run_len)  # 0-based RANK-1 (ties share)
        pct = rnk / (n - 1) if n > 1 else np.zeros(n)
        peers_through = np.repeat(starts + run_len, run_len)  # rows <= value
        cume = peers_through / n
        return pa.table(
            {
                "cohort": g["cohort"],
                "conv_id": g["conv_id"],
                "char_sum": g["char_sum"],
                "pct_rank": pa.array(pct, pa.float64()),
                "cume": pa.array(cume, pa.float64()),
            }
        )

    withc = totals.map_batches(
        add_cohort, batch_format="pyarrow", zero_copy_batch=True
    )
    return withc.groupby("cohort").map_groups(kernel, batch_format="pyarrow")


def dewma_chars(ds_normalized: "ray.data.Dataset", k: int = 8) -> "ray.data.Dataset":
    """Double EWMA (trend smoothing): the truncated dyadic EWMA applied to
    its own output — Holt's linear method's smoothing stage, kept in the
    exactly-representable domain (weights 2^-(j+1) twice ⇒ every value is a
    dyadic rational with denominator 2^16, still exact in float64, so the
    nested-window SQL oracle matches bit-for-bit).

    Output: conv_id, turn_idx, dewma (DOUBLE).
    """

    def kernel(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("turn_idx", "ascending")]
            )
        )
        x = g["char_len"].to_numpy(zero_copy_only=False).astype(np.float64)

        def smooth(v: np.ndarray) -> np.ndarray:
            out = np.zeros(len(v), dtype=np.float64)
            for j in range(k):
                w = 2.0 ** -(j + 1)
                if j == 0:
                    out += w * v
                elif j < len(v):
                    out[j:] += w * v[:-j]
            return out

        return pa.table(
            {
                "conv_id": g["conv_id"],
                "turn_idx": g["turn_idx"],
                "dewma": pa.array(smooth(smooth(x)), pa.float64()),
            }
        )

    return ds_normalized.groupby("conv_id").map_groups(kernel, batch_format="pyarrow")


def peak_rate_5m(events_ds: "ray.data.Dataset", window_s: int = 300) -> "ray.data.Dataset":
    """Per-user peak sliding-window event rate: the maximum number of the
    user's events inside ANY half-open event-time window (t − 5m, t]
    anchored at an event — the rate-limit / burst-detection census a
    streaming pipeline alerts on.

    Per-user kernel inside ``groupby(user_id).map_groups``: sort the user's
    timestamps once, then a vectorized two-pointer pass — for each event i,
    ``searchsorted`` finds the first event inside its window, and the count
    is ``i − first + 1``. O(n log n) per user, no per-row Python. The
    groupby exchange is the standard per-entity co-partition (user-sized,
    skew-bounded by the heaviest user, the same assumption as
    ``user_gap_stats``).
    """
    win_us = window_s * 1_000_000

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.sort(
            group["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        # first index whose ts > t_i - window  (half-open (t-w, t])
        first = np.searchsorted(ts, ts - win_us, side="right")
        counts = np.arange(1, len(ts) + 1) - first
        return pa.table(
            {
                "user_id": pa.array([group["user_id"][0].as_py()], pa.int64()),
                "peak_events": pa.array([int(counts.max())], pa.int64()),
            }
        )

    return events_ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def last_touch_attribution(
    events_ds: "ray.data.Dataset",
    touch_type: str = "click",
    conv_type: str = "purchase",
    horizon_s: int = 7 * 86400,
) -> "ray.data.Dataset":
    """Last-touch attribution: each conversion event is attributed to the
    SAME user's most recent ``touch_type`` event at or before it and within
    the horizon — the event-to-event AS-OF join (vs ``asof_last_order``'s
    table-to-table shape), the attribution pass every funnel/ads pipeline
    runs.

    Per-user sorted merge inside ``map_groups``: both event streams sort
    once, ``searchsorted`` pairs every conversion with its latest preceding
    touch, the horizon filters. Ties at the same timestamp attribute to the
    highest event_id (latest writer wins, deterministic). Only attributed
    conversions are emitted.
    """
    horizon_us = horizon_s * 1_000_000

    def project(batch: pa.Table) -> pa.Table:
        m = pc.is_in(
            batch["event_type"], value_set=pa.array([touch_type, conv_type])
        )
        t = batch.filter(m)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "is_conv": pc.equal(t["event_type"], conv_type),
                "ts": t["ts"],
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        uid = group["user_id"][0].as_py()
        is_conv = group["is_conv"].to_numpy(zero_copy_only=False)
        ts = (
            group["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t_ts, t_eid = ts[~is_conv], eid[~is_conv]
        c_ts, c_eid = ts[is_conv], eid[is_conv]
        if len(t_ts) == 0 or len(c_ts) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "conv_event_id": pa.array([], pa.int64()),
                    "touch_event_id": pa.array([], pa.int64()),
                    "lag_us": pa.array([], pa.int64()),
                }
            )
        # sort touches by (ts, event_id) so the last index at a given ts is
        # the highest event_id (deterministic tie rule)
        o = np.lexsort((t_eid, t_ts))
        t_ts, t_eid = t_ts[o], t_eid[o]
        pos = np.searchsorted(t_ts, c_ts, side="right") - 1
        ok = pos >= 0
        lag = np.where(ok, c_ts - t_ts[np.clip(pos, 0, None)], -1)
        ok &= (lag >= 0) & (lag <= horizon_us)
        return pa.table(
            {
                "user_id": pa.array(np.full(int(ok.sum()), uid), pa.int64()),
                "conv_event_id": pa.array(c_eid[ok], pa.int64()),
                "touch_event_id": pa.array(t_eid[np.clip(pos[ok], 0, None)], pa.int64()),
                "lag_us": pa.array(lag[ok], pa.int64()),
            }
        )

    p = events_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def cum_distinct_tools(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Running distinct-tool count per conversation turn — the cumulative
    COUNT(DISTINCT) window SQL engines can't express directly (DuckDB
    included: the oracle emulates it as a cumsum over first-occurrence
    flags, exactly like this kernel).

    Per-conversation kernel: sort by (turn_idx), mark each tool's first
    occurrence (vectorized via np.unique on (tool-id, position)), cumsum.
    Empty tools ('' = no tool call) don't count. Exchange: the standard
    conv co-partition groupby.
    """

    def per_conv(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("turn_idx", "ascending")])
        g = group.take(idx)
        tools = g["tool"].to_pylist()
        seen: set = set()
        first = np.zeros(len(tools), np.int64)
        for i, t in enumerate(tools):
            if t and t not in seen:
                seen.add(t)
                first[i] = 1
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "turn_idx": g["turn_idx"],
                "n_distinct_tools": pa.array(np.cumsum(first), pa.int64()),
            }
        )

    return ds_transcripts.groupby("conv_id").map_groups(
        per_conv, batch_format="pyarrow"
    )


def transition_latency_census(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Latency profile of event-type transitions: for every consecutive
    (from_type → to_type) pair in a user's (ts, event_id)-ordered stream,
    the pair count plus the sum / min / max of the gap in whole
    microseconds — ``event_transitions``' Markov counts upgraded with the
    timing distribution (how long users dwell between steps).

    Same distributed shape as the count version: one groupby(user_id)
    exchange, a vectorized per-group kernel that pre-reduces to at most
    |types|² rows, then a pair-domain-sized merge groupby (Sum/Min/Max are
    all associative). No Python loop touches rows.

    Output: from_type, to_type, n, gap_us_sum, gap_us_min, gap_us_max
    (all gaps BIGINT microseconds).
    """
    OUT = pa.schema(
        [
            ("from_type", pa.string()),
            ("to_type", pa.string()),
            ("n", pa.int64()),
            ("gap_us_sum", pa.int64()),
            ("gap_us_min", pa.int64()),
            ("gap_us_max", pa.int64()),
        ]
    )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows < 2:
            return OUT.empty_table()
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        et = g["event_type"]
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        gaps = ts[1:] - ts[:-1]
        t = pa.table(
            {
                "from_type": et.slice(0, len(et) - 1).combine_chunks(),
                "to_type": et.slice(1).combine_chunks(),
                "gap_us": pa.array(gaps, pa.int64()),
            }
        )
        agg = t.group_by(["from_type", "to_type"]).aggregate(
            [
                ("gap_us", "count"),
                ("gap_us", "sum"),
                ("gap_us", "min"),
                ("gap_us", "max"),
            ]
        )
        return pa.table(
            {
                "from_type": agg["from_type"],
                "to_type": agg["to_type"],
                "n": pc.cast(agg["gap_us_count"], pa.int64()),
                "gap_us_sum": agg["gap_us_sum"],
                "gap_us_min": agg["gap_us_min"],
                "gap_us_max": agg["gap_us_max"],
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    return (
        events_ds.groupby("user_id")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("gap_us_sum", alias_name="gap_us_sum"),
            Min("gap_us_min", alias_name="gap_us_min"),
            Max("gap_us_max", alias_name="gap_us_max"),
        )
    )


def window_corrections(
    events_ds: "ray.data.Dataset", lateness_s: int = 1800
) -> "ray.data.Dataset":
    """Streaming correction census: per (user, 1-minute event-time window),
    the final count plus how many of those events arrived AFTER the
    stream's watermark had passed the window — i.e. how many downstream
    re-emits ("corrections") an allowed-lateness streaming aggregator
    would have issued.

    Arrival order is ``event_id`` (the ingestion sequence); the watermark
    is the running max event time seen so far minus ``lateness_s``. An
    event is a correction when its own window end precedes the watermark
    at its arrival. One groupby(user) exchange, a vectorized
    ``np.maximum.accumulate`` kernel (no Python loop), per-group Arrow
    aggregate, then a window-domain-sized merge groupby.

    Output: user_id, window_start (TIMESTAMP), n (BIGINT), n_corrections
    (BIGINT).
    """
    late_us = lateness_s * 1_000_000
    MIN_US = 60_000_000

    OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("window_start", pa.timestamp("us")),
            ("n", pa.int64()),
            ("n_corrections", pa.int64()),
        ]
    )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return OUT.empty_table()
        g = group.take(
            pc.sort_indices(group, sort_keys=[("event_id", "ascending")])
        )
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        win = ts - ts % MIN_US
        hwm_prev = np.empty_like(ts)
        hwm_prev[0] = np.iinfo(np.int64).min
        if len(ts) > 1:
            hwm_prev[1:] = np.maximum.accumulate(ts)[:-1]
        # late_us moves to the LEFT side: int64.min - late_us would wrap
        corr = (win + MIN_US + late_us) <= hwm_prev
        t = pa.table(
            {
                "user_id": g["user_id"],
                "window_start": pa.array(win, pa.timestamp("us")),
                "corr": pa.array(corr.astype(np.int64)),
            }
        )
        agg = t.group_by(["user_id", "window_start"]).aggregate(
            [("corr", "count"), ("corr", "sum")]
        )
        return pa.table(
            {
                "user_id": agg["user_id"],
                "window_start": agg["window_start"],
                "n": pc.cast(agg["corr_count"], pa.int64()),
                "n_corrections": agg["corr_sum"],
            }
        )

    return events_ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow")


def arrival_disorder_census(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Out-of-order-ingestion census, per user: over the ARRIVAL order
    (``event_id``), how many adjacent steps went backwards in event time
    (``n_inversions``) and the worst single backstep in microseconds —
    the disorder profile that sizes a streaming pipeline's allowed
    lateness (companion to :func:`window_corrections`, which prices a
    GIVEN lateness).

    One groupby(user_id) exchange over (user, event_id, ts) fixed-width
    rows; the kernel is a vectorized diff (no Python loop).

    Output: user_id, n_events, n_inversions, max_backstep_us (BIGINT;
    0 when the stream is fully ordered).
    """
    OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_events", pa.int64()),
            ("n_inversions", pa.int64()),
            ("max_backstep_us", pa.int64()),
        ]
    )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return OUT.empty_table()
        g = group.take(
            pc.sort_indices(group, sort_keys=[("event_id", "ascending")])
        )
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        d = ts[1:] - ts[:-1] if len(ts) > 1 else np.array([], np.int64)
        back = d[d < 0]
        return pa.table(
            {
                "user_id": pc.cast(g["user_id"], pa.int64())[:1],
                "n_events": pa.array([g.num_rows], pa.int64()),
                "n_inversions": pa.array([int(len(back))], pa.int64()),
                "max_backstep_us": pa.array(
                    [int(-back.min()) if len(back) else 0], pa.int64()
                ),
            }
        )

    return events_ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow")


def response_latency(
    ds_transcripts: "ray.data.Dataset",
    from_role: str = "user",
    to_role: str = "assistant",
) -> "ray.data.Dataset":
    """Per-conversation response latency: for every ``from_role`` turn,
    the time to the NEXT ``to_role`` turn (by turn order) — the
    conversational-quality metric a transcript store reports per tier
    (user→assistant on chat transcripts; view→purchase on the events
    adapter).

    Kernel: within the sorted conversation, ``searchsorted`` maps each
    user turn's position to the first later assistant position — one
    vectorized pass, no per-row Python. User turns with no following
    assistant turn are excluded (matching the SQL inner join).

    Output: conv_id, n_responses, sum_latency_us, max_latency_us
    (BIGINTs; conversations with zero user→assistant transitions emit no
    row, like a SQL GROUP BY over the joined pairs).
    """

    def lat(group: pa.Table) -> pa.Table:
        g = _sorted_group(group)
        ts = (
            g["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        roles = g["role"].to_numpy(zero_copy_only=False)
        pos = np.arange(len(roles))
        a_pos = pos[roles == to_role]
        u_pos = pos[roles == from_role]
        if len(a_pos) == 0 or len(u_pos) == 0:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "n_responses": pa.array([], pa.int64()),
                    "sum_latency_us": pa.array([], pa.int64()),
                    "max_latency_us": pa.array([], pa.int64()),
                }
            )
        nxt = np.searchsorted(a_pos, u_pos, side="left")
        has = nxt < len(a_pos)
        if not has.any():
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "n_responses": pa.array([], pa.int64()),
                    "sum_latency_us": pa.array([], pa.int64()),
                    "max_latency_us": pa.array([], pa.int64()),
                }
            )
        d = ts[a_pos[nxt[has]]] - ts[u_pos[has]]
        return pa.table(
            {
                "conv_id": pa.array([g["conv_id"][0].as_py()], pa.string()),
                "n_responses": pa.array([int(has.sum())], pa.int64()),
                "sum_latency_us": pa.array([int(d.sum())], pa.int64()),
                "max_latency_us": pa.array([int(d.max())], pa.int64()),
            }
        )

    return ds_transcripts.groupby("conv_id").map_groups(
        lat, batch_format="pyarrow"
    )


def shape_census(ds_transcripts: "ray.data.Dataset", k: int = 20) -> "ray.data.Dataset":
    """Top-k conversation *shapes* — the exact turn-taking pattern
    (ordered role sequence) ranked by how many conversations share it.
    The behavioral-census a transcript pipeline runs to find dominant
    interaction patterns (user→assistant ping-pong vs tool-heavy loops).

    Built on the ordered group-concat (``roles_concat``): one per-conv
    reduction, then a combiner-first count over the shape strings. The
    exchange ships one (shape, count) row per distinct shape per block —
    shape-vocabulary-sized. Giant conversations make giant shape strings;
    at real scale, group on a shape *hash* and keep one exemplar string
    per bucket (same trade as the minhash verify prefilter).

    Output: shape (string), n_convs (BIGINT), top-k by (n_convs desc,
    shape asc).
    """
    from ray.data.aggregate import Sum as _Sum

    shapes = roles_concat(ds_transcripts)

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "shape": b["role_seq"],
                    "n_convs": pa.array(np.ones(b.num_rows, np.int64)),
                }
            )
            .group_by(["shape"])
            .aggregate([("n_convs", "sum")])
        )
        return pa.table({"shape": g["shape"], "n_convs": g["n_convs_sum"]})

    return (
        shapes.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shape")
        .aggregate(_Sum("n_convs", alias_name="n_convs"))
        .sort(["n_convs", "shape"], descending=[True, False])
        .limit(k)
    )


def interval_coverage(
    events_ds: "ray.data.Dataset", pad_s: int = 300
) -> "ray.data.Dataset":
    """Merged-interval time coverage per user (the classic gaps-and-islands
    interval union): every event opens a ``[ts, ts + pad_s)`` activity span;
    overlapping/adjacent spans merge, and the output reports how many merged
    spans remain and the total covered time — the "active seconds" metric
    session stitching and billing meters compute.

    Scale shape: ONE hash groupby on the user key, then a vectorized
    per-group kernel (sort + shifted running-max — no Python loop). All
    arithmetic is integer microseconds, so the result is bit-exact against
    the SQL window restatement (MAX(f) OVER preceding + island cumsum).
    A span that starts exactly where the running max ends (ts == max_end)
    is ADJACENT and merges — the half-open interval convention.

    Output: user_id, n_spans, covered_us (both BIGINT).
    """
    pad_us = int(pad_s) * 1_000_000
    OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_spans", pa.int64()),
            ("covered_us", pa.int64()),
        ]
    )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return OUT.empty_table()
        ts = np.sort(pc.cast(group["ts"], pa.int64()).to_numpy(zero_copy_only=False))
        end = ts + pad_us
        run_max = np.maximum.accumulate(end)
        # new island where this start exceeds every previous end
        new = np.r_[True, ts[1:] > run_max[:-1]]
        island = np.cumsum(new) - 1
        starts = ts[new]  # first start of each island (ts sorted)
        ends = np.maximum.reduceat(end, np.flatnonzero(new))
        covered = int((ends - starts).sum())
        return pa.table(
            {
                "user_id": pc.cast(group["user_id"][:1], pa.int64()),
                "n_spans": pa.array([int(new.sum())], pa.int64()),
                "covered_us": pa.array([covered], pa.int64()),
            }
        )

    return events_ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow")


def linear_attribution(
    events_ds: "ray.data.Dataset",
    touch_type: str = "click",
    conv_type: str = "purchase",
    horizon_s: int = 7 * 86400,
) -> "ray.data.Dataset":
    """Linear (equal-split) multi-touch attribution: every conversion
    splits 10⁶ ppm of credit equally over ALL of the same user's
    ``touch_type`` events inside ``[conv_ts − horizon, conv_ts]``
    (inclusive both ends), floor division — the multi-touch counterpart of
    :func:`last_touch_attribution`.

    Per-user kernel avoids the touches×conversions pair explosion: each
    conversion's touch set is a CONTIGUOUS range of the time-sorted touch
    array (two searchsorteds), so credit lands via a difference array +
    one cumsum — O(touches + conversions) per user, no per-pair rows
    anywhere (the SQL oracle pays the quadratic join; the engine never
    does). One user-keyed groupby is the only exchange.

    Output: user_id, touch_event_id, n_convs, credit_ppm (BIGINTs) for
    touches with at least one credit, sorted by (user_id, touch_event_id).
    """
    horizon_us = horizon_s * 1_000_000

    def project(batch: pa.Table) -> pa.Table:
        m = pc.is_in(
            batch["event_type"], value_set=pa.array([touch_type, conv_type])
        )
        t = batch.filter(m)
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "is_conv": pc.equal(t["event_type"], conv_type),
                "ts": t["ts"],
            }
        )

    OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("touch_event_id", pa.int64()),
            ("n_convs", pa.int64()),
            ("credit_ppm", pa.int64()),
        ]
    )

    def per_user(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return OUT.empty_table()
        uid = group["user_id"][0].as_py()
        is_conv = group["is_conv"].to_numpy(zero_copy_only=False)
        ts = (
            group["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t_ts, t_eid = ts[~is_conv], eid[~is_conv]
        c_ts = ts[is_conv]
        if len(t_ts) == 0 or len(c_ts) == 0:
            return OUT.empty_table()
        o = np.lexsort((t_eid, t_ts))
        t_ts, t_eid = t_ts[o], t_eid[o]
        lo = np.searchsorted(t_ts, c_ts - horizon_us, side="left")
        hi = np.searchsorted(t_ts, c_ts, side="right")
        k = hi - lo
        valid = k > 0
        lo, hi, k = lo[valid], hi[valid], k[valid]
        credit = 1_000_000 // k
        dc = np.zeros(len(t_ts) + 1, dtype=np.int64)
        dn = np.zeros(len(t_ts) + 1, dtype=np.int64)
        np.add.at(dc, lo, credit)
        np.add.at(dc, hi, -credit)
        np.add.at(dn, lo, 1)
        np.add.at(dn, hi, -1)
        per_touch_credit = np.cumsum(dc[:-1])
        per_touch_n = np.cumsum(dn[:-1])
        keep = per_touch_n > 0
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(int(keep.sum()), uid), pa.int64()
                ),
                "touch_event_id": pa.array(t_eid[keep], pa.int64()),
                "n_convs": pa.array(per_touch_n[keep], pa.int64()),
                "credit_ppm": pa.array(per_touch_credit[keep], pa.int64()),
            }
        )

    return (
        events_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .sort(["user_id", "touch_event_id"])
    )


def markov_backtest(events_ds: "ray.data.Dataset") -> pa.Table:
    """Backtest of the first-order Markov next-event predictor: train the
    transition argmax on the WHOLE stream (``predict(next | cur) = the
    most frequent to_type from cur``, ties to the lexicographically first),
    then score it on every consecutive pair — the simplest sequence-model
    fit census, the baseline every sequence model must beat.

    Two passes over the same exchange shape as
    :func:`event_transitions`: the transition census is ≤ |types|² rows
    (result-sized, collected + broadcast as a plain dict), and the scoring
    pass re-walks each user's (ts, event_id)-ordered stream comparing the
    argmax prediction to the realized next type — one user-keyed groupby
    each, all-Arrow kernels.

    Output: from_type, predicted, n_pairs, n_correct, accuracy_ppm
    (BIGINTs), one row per from_type, sorted.
    """
    import ray as _ray

    from ..util import collect_table

    trans = collect_table(event_transitions(events_ds))
    if trans.num_rows == 0:
        return pa.table(
            {
                "from_type": pa.array([], pa.string()),
                "predicted": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
                "n_correct": pa.array([], pa.int64()),
                "accuracy_ppm": pa.array([], pa.int64()),
            }
        )
    best: dict[str, tuple[int, str]] = {}
    for f, t, n in zip(
        trans["from_type"].to_pylist(),
        trans["to_type"].to_pylist(),
        trans["n"].to_pylist(),
    ):
        cur = best.get(f)
        # max count; tie -> lexicographically first to_type
        if cur is None or n > cur[0] or (n == cur[0] and t < cur[1]):
            best[f] = (n, t)
    pred = {f: t for f, (n, t) in best.items()}
    ref = _ray.put(pred)

    def per_user(group: pa.Table) -> pa.Table:
        p = _ray.get(ref)
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        et = g["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        if len(et) < 2:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                    "n_correct": pa.array([], pa.int64()),
                }
            )
        frm = et.slice(0, len(et) - 1)
        nxt = et.slice(1)
        keys = pa.array(list(p.keys()), pa.string())
        vals = pa.array(list(p.values()), pa.string())
        predicted = pc.take(vals, pc.index_in(frm, value_set=keys))
        correct = pc.cast(pc.equal(predicted, nxt), pa.int64())
        t = pa.table(
            {
                "from_type": frm,
                "n_pairs": pa.array(np.ones(len(frm), np.int64)),
                "n_correct": correct,
            }
        )
        agg = t.group_by(["from_type"]).aggregate(
            [("n_pairs", "sum"), ("n_correct", "sum")]
        )
        return pa.table(
            {
                "from_type": agg["from_type"],
                "n_pairs": pc.cast(agg["n_pairs_sum"], pa.int64()),
                "n_correct": pc.cast(agg["n_correct_sum"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    scored = collect_table(
        events_ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("from_type")
        .aggregate(
            _Sum("n_pairs", alias_name="n_pairs"),
            _Sum("n_correct", alias_name="n_correct"),
        )
    )
    f = scored["from_type"].to_pylist()
    npair = scored["n_pairs"].to_numpy(zero_copy_only=False).astype(np.int64)
    ncorr = scored["n_correct"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(np.array(f, dtype=object))
    f = [f[i] for i in order]
    npair, ncorr = npair[order], ncorr[order]
    return pa.table(
        {
            "from_type": pa.array(f, pa.string()),
            "predicted": pa.array([pred[x] for x in f], pa.string()),
            "n_pairs": pa.array(npair, pa.int64()),
            "n_correct": pa.array(ncorr, pa.int64()),
            "accuracy_ppm": pa.array(ncorr * 1_000_000 // npair, pa.int64()),
        }
    )


def skipgram_transitions(
    events_ds: "ray.data.Dataset", max_gap: int = 3
) -> "ray.data.Dataset":
    """Skip-gram event transitions (PrefixSpan-lite): per user, order
    events by (ts, event_id) and count every (from_type, to_type) pair at
    forward distance 1..``max_gap`` — the non-contiguous generalization of
    :func:`event_transitions` that surfaces "A is followed by B within a
    few steps" patterns a strict first-order chain misses.

    The per-user kernel is one sort + ``max_gap`` shifted slice pairs (no
    Python loop over rows); each group reduces to ≤ types²·max_gap rows
    before the result-sized final groupby.

    Output: from_type, to_type (STRING), gap (BIGINT 1..max_gap),
    n (BIGINT).
    """

    def pairs(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        et = g["event_type"].combine_chunks()
        n = len(et)
        parts = []
        for gap in range(1, max_gap + 1):
            if n <= gap:
                break
            parts.append(
                pa.table(
                    {
                        "from_type": et.slice(0, n - gap),
                        "to_type": et.slice(gap),
                        "gap": pa.array([gap] * (n - gap), pa.int64()),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "gap": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        t = pa.concat_tables(parts)
        agg = t.group_by(["from_type", "to_type", "gap"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "from_type": agg["from_type"],
                "to_type": agg["to_type"],
                "gap": agg["gap"],
                "n": pc.cast(agg["count_all"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        events_ds.groupby("user_id")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["from_type", "to_type", "gap"])
        .aggregate(Sum("n", alias_name="n"))
    )


def session_overlap_pairs(
    events_ds: "ray.data.Dataset", gap_s: int = 1800
) -> "ray.data.Dataset":
    """Interval-overlap join census: per start-day, how many PAIRS of
    user sessions overlap in time — the concurrency-pressure profile an
    autoscaler and a capacity planner read (the pairwise complement of
    ``calendarize_spans``'s sweep-line concurrency level).

    Sessions are the standard 30m-gap islands per user ((ts, event_id)
    order, same contract as ``sessionize_30m``); a pair counts once,
    ordered by (start, user, session) — restated in the oracle via
    ROW_NUMBER — and pairs are counted within the session's START-day
    bucket (the documented partitioning assumption: cross-day overlaps
    attribute to the earlier day's bucket only when both START that day).

    Shape: per-user session derivation in one groupby(user) map_groups
    (vectorized reduceat); then a day-bucketed map_groups whose kernel is
    one sort + one searchsorted (O(s log s) per day, no pair explosion —
    the count is Σᵢ #{j>i : start_j ≤ end_i}).

    Output: day (TIMESTAMP), n_sessions, n_overlap_pairs (BIGINTs).
    """

    def sessions(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        if len(ts) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "sess": pa.array([], pa.int64()),
                    "s_start": pa.array([], pa.int64()),
                    "s_end": pa.array([], pa.int64()),
                }
            )
        brk = np.r_[True, np.diff(ts) > gap_s * 1_000_000]
        starts = np.flatnonzero(brk)
        bounds = np.r_[starts, len(ts)]
        uid = int(group["user_id"][0].as_py())
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(len(starts), uid, np.int64), pa.int64()
                ),
                "sess": pa.array(np.arange(len(starts), dtype=np.int64), pa.int64()),
                "s_start": pa.array(ts[starts], pa.int64()),
                "s_end": pa.array(ts[bounds[1:] - 1], pa.int64()),
            }
        )

    sess = events_ds.groupby("user_id").map_groups(
        sessions, batch_format="pyarrow"
    )

    _US_PER_DAY = 86_400_000_000
    OUT = pa.schema(
        [
            ("day", pa.timestamp("us")),
            ("n_sessions", pa.int64()),
            ("n_overlap_pairs", pa.int64()),
        ]
    )

    def add_day(b: pa.Table) -> pa.Table:
        s = b["s_start"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "day", pa.array((s // _US_PER_DAY).astype(np.int64), pa.int64())
        )

    def count_pairs(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return OUT.empty_table()
        idx = pc.sort_indices(
            group,
            sort_keys=[
                ("s_start", "ascending"),
                ("user_id", "ascending"),
                ("sess", "ascending"),
            ],
        )
        g = group.take(idx)
        s = g["s_start"].to_numpy(zero_copy_only=False)
        e = g["s_end"].to_numpy(zero_copy_only=False)
        n = len(s)
        upto = np.searchsorted(s, e, side="right")
        pairs = int((upto - np.arange(1, n + 1)).sum())
        day_us = int(g["day"][0].as_py()) * _US_PER_DAY
        return pa.table(
            {
                "day": pa.array(
                    np.array([day_us], np.int64), pa.timestamp("us")
                ),
                "n_sessions": pa.array([n], pa.int64()),
                "n_overlap_pairs": pa.array([pairs], pa.int64()),
            }
        )

    return (
        sess.map_batches(add_day, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .map_groups(count_pairs, batch_format="pyarrow")
    )


def session_duration_median(
    events_ds: "ray.data.Dataset", gap_s: int = 1800
) -> pa.Table:
    """EXACT lower-median session duration (whole seconds) over all 30m-gap
    user sessions — the engagement headline stat. Sessions derive per user
    (one groupby(user) map_groups, vectorized reduceat); the median comes
    from the shared histogram-refinement selector
    (:func:`~.analytics._hist_select_ranks`) over the sessions-domain
    duration column — no distributed sort, no driver materialization of
    the sessions table.

    Output: one row — n_sessions, median_s (BIGINTs). No sessions → 0 rows.
    """
    from .analytics import _hist_select_ranks

    def durations(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        if len(ts) == 0:
            return pa.table({"dur_s": pa.array([], pa.int64())})
        brk = np.r_[True, np.diff(ts) > gap_s * 1_000_000]
        starts = np.flatnonzero(brk)
        bounds = np.r_[starts, len(ts)]
        dur = (ts[bounds[1:] - 1] - ts[starts]) // 1_000_000
        return pa.table({"dur_s": pa.array(dur.astype(np.int64), pa.int64())})

    sess = (
        events_ds.groupby("user_id")
        .map_groups(durations, batch_format="pyarrow")
        .materialize()
    )
    # Dataset.count(), not aggregate(Count()) — the latter reports 0 on
    # map_groups outputs whose first block is schema-less/empty (Ray 2.49)
    n = sess.count()
    OUT = pa.schema([("n_sessions", pa.int64()), ("median_s", pa.int64())])
    if n == 0:
        return OUT.empty_table()
    vals = _hist_select_ranks(
        sess,
        lambda b: b["dur_s"].to_numpy(zero_copy_only=False),
        [(n - 1) // 2],
    )
    return pa.table(
        {
            "n_sessions": pa.array([n], pa.int64()),
            "median_s": pa.array([int(vals[0])], pa.int64()),
        }
    )


def reply_latency_census(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Reply-latency census by role transition: for each conversation's
    adjacent turn pairs under (ts, turn_idx) order, the exact µs gap
    summed per (from_role, to_role) — "how fast does the assistant answer
    the user" and every other hand-off, as integer components (n_pairs,
    sum_gap_us; the mean is the caller's one division).

    Per-conversation kernel is two slices (the :func:`event_transitions`
    shape carrying the gap); the final groupby is roles²-sized.

    Output: from_role, to_role (STRING), n_pairs, sum_gap_us (BIGINTs).
    """
    from ray.data.aggregate import Sum as _Sum

    def pairs(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("turn_idx", "ascending")]
            )
        )
        role = g["role"]
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        if len(ts) < 2:
            return pa.table(
                {
                    "from_role": pa.array([], pa.string()),
                    "to_role": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                    "sum_gap_us": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "from_role": role.slice(0, len(ts) - 1).combine_chunks(),
                "to_role": role.slice(1).combine_chunks(),
                "gap": pa.array(np.diff(ts), pa.int64()),
            }
        )
        gg = t.group_by(["from_role", "to_role"]).aggregate(
            [("gap", "sum"), ("gap", "count")]
        )
        return pa.table(
            {
                "from_role": gg["from_role"],
                "to_role": gg["to_role"],
                "n_pairs": pc.cast(gg["gap_count"], pa.int64()),
                "sum_gap_us": pc.cast(gg["gap_sum"], pa.int64()),
            }
        )

    return (
        ds_transcripts.groupby("conv_id")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["from_role", "to_role"])
        .aggregate(
            _Sum("n_pairs", alias_name="n_pairs"),
            _Sum("sum_gap_us", alias_name="sum_gap_us"),
        )
    )


def nearest_event_join(
    events_ds: "ray.data.Dataset",
    left_type: str = "purchase",
    right_type: str = "click",
) -> "ray.data.Dataset":
    """Nearest-neighbor temporal join WITHIN user: for every ``left_type``
    event, the ``right_type`` event of the same user with the smallest
    |Δts| — either direction (the both-ways generalization of the as-of
    join; the shape behind "attach the closest telemetry sample to each
    incident"). Ties break toward the EARLIER right ts, then the lower
    right event_id. Left events of users with no right events are dropped
    (inner semantics).

    Distribution: one groupby(user) co-partition exchange; per group a
    vectorized ``searchsorted`` of left ts into the sorted right series
    picks the two bracketing candidates per left row — O((l+r) log r)
    per user, never l×r.

    Output: event_id, nn_event_id, dt_abs_us (BIGINTs).
    """

    def per_user(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "nn_event_id": pa.array([], pa.int64()),
                "dt_abs_us": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0 or g.num_columns == 0:
            return empty
        et = g["event_type"].to_numpy(zero_copy_only=False)
        is_l = et == left_type
        is_r = et == right_type
        if not is_l.any() or not is_r.any():
            return empty
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = pc.cast(g["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
        lts, lid = ts[is_l], eid[is_l]
        rts, rid = ts[is_r], eid[is_r]
        order = np.lexsort((rid, rts))  # ts asc, id asc — the tie order
        rts, rid = rts[order], rid[order]
        pos = np.searchsorted(rts, lts)
        lo = np.clip(pos - 1, 0, len(rts) - 1)
        hi = np.clip(pos, 0, len(rts) - 1)
        d_lo = np.abs(lts - rts[lo])
        d_hi = np.abs(lts - rts[hi])
        # prefer the smaller |dt|; on equal |dt| the EARLIER right ts (lo)
        take_lo = d_lo <= d_hi
        sel = np.where(take_lo, lo, hi)
        # equal-ts duplicate runs: pos-1 lands on the run's HIGHEST id —
        # re-resolve to the run head so the lowest event_id wins, matching
        # the oracle's ROW_NUMBER (abs_dt, ts, event_id)
        sel = np.searchsorted(rts, rts[sel], side="left")
        dt = np.where(take_lo, d_lo, d_hi).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(lid, pa.int64()),
                "nn_event_id": pa.array(rid[sel], pa.int64()),
                "dt_abs_us": pa.array(dt, pa.int64()),
            }
        )

    def prune(b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b["event_type"], value_set=pa.array([left_type, right_type])
        )
        return b.filter(keep)

    return (
        events_ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def adjacent_role_pairs(
    ds_transcripts: "ray.data.Dataset",
    role_a: str = "click",
    role_b: str = "purchase",
) -> "ray.data.Dataset":
    """Adjacent-turn role-pair extraction: per conversation (ordered by
    (ts, turn_idx)), every turn with role ``role_a`` whose IMMEDIATE
    successor has role ``role_b`` — the prompt→response pair miner a
    transcript pipeline uses to cut SFT training pairs out of raw streams
    (here: the click→purchase adjacency over the adapted corpus).

    Output: conv_id, a_turn_idx, b_turn_idx, a_chars, b_chars
    (conv_id string, rest BIGINT).
    """

    def per_conv(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "a_turn_idx": pa.array([], pa.int64()),
                "b_turn_idx": pa.array([], pa.int64()),
                "a_chars": pa.array([], pa.int64()),
                "b_chars": pa.array([], pa.int64()),
            }
        )
        if g.num_rows < 2 or g.num_columns == 0:
            return empty
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        ti = pc.cast(g["turn_idx"], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, ts))
        role = g["role"].to_numpy(zero_copy_only=False)[order]
        chars = (
            pc.utf8_length(pc.cast(g["text"], pa.string()))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[order]
        )
        ti = ti[order]
        hit = np.flatnonzero((role[:-1] == role_a) & (role[1:] == role_b))
        if not len(hit):
            return empty
        return pa.table(
            {
                "conv_id": pa.array(
                    [g["conv_id"][0].as_py()] * len(hit), pa.string()
                ),
                "a_turn_idx": pa.array(ti[hit], pa.int64()),
                "b_turn_idx": pa.array(ti[hit + 1], pa.int64()),
                "a_chars": pa.array(chars[hit], pa.int64()),
                "b_chars": pa.array(chars[hit + 1], pa.int64()),
            }
        )

    return ds_transcripts.groupby("conv_id").map_groups(
        per_conv, batch_format="pyarrow"
    )


def tool_chain_census(
    ds_transcripts: "ray.data.Dataset", top_n: int = 50
) -> "ray.data.Dataset":
    """Tool-call chain mining: each conversation's ordered sequence of
    non-empty ``tool`` values (by (ts, turn_idx)) joined with '>' is its
    chain fingerprint; the census counts conversations per chain — the
    "what tool workflows do agents actually run" summary. Top ``top_n``
    by (count desc, chain asc) for a result-sized output at any corpus
    size (the full chain census is distinct-chain-sized, potentially
    corpus-sized at 10^12 turns — the cap is the documented bound).

    Output: chain (string), n_convs (BIGINT).
    """
    from ray.data.aggregate import Sum

    def per_conv(g: pa.Table) -> pa.Table:
        tool = g["tool"].to_numpy(zero_copy_only=False)
        nz = tool != ""
        if not nz.any():
            return pa.table(
                {"chain": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        ti = pc.cast(g["turn_idx"], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ti, ts))
        seq = tool[order]
        chain = ">".join(s for s in seq if s != "")
        return pa.table(
            {
                "chain": pa.array([chain], pa.string()),
                "n": pa.array([1], pa.int64()),
            }
        )

    counts = (
        ds_transcripts.groupby("conv_id")
        .map_groups(per_conv, batch_format="pyarrow")
        .groupby("chain")
        .aggregate(Sum("n", alias_name="n_convs"))
    )
    return counts.sort(["n_convs", "chain"], descending=[True, False]).limit(
        top_n
    )


def conv_role_char_balance(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-conversation tooled-vs-plain character balance: Σ chars of
    turns with a tool call vs without, plus the exact ppm share — the
    conversation-quality feature ("how much of this dialog is tool
    traffic") computed combiner-first (per-block conv partials, one
    conv-keyed merge; no per-conv Python).

    Output: conv_id, tool_chars, plain_chars, tool_ppm (BIGINTs).
    """
    from ..util import hash_partitioned_agg

    def partial(b: pa.Table) -> pa.Table:
        chars = pc.cast(
            pc.utf8_length(pc.cast(b["text"], pa.string())), pa.int64()
        )
        tooled = pc.cast(
            pc.not_equal(pc.cast(b["tool"], pa.string()), ""), pa.int64()
        )
        t = pa.table(
            {
                "conv_id": b["conv_id"],
                "tool_chars": pc.multiply(chars, tooled),
                "plain_chars": pc.multiply(
                    chars, pc.subtract(pa.scalar(1, pa.int64()), tooled)
                ),
            }
        )
        g = t.group_by("conv_id").aggregate(
            [("tool_chars", "sum"), ("plain_chars", "sum")]
        )
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "tool_chars": pc.cast(g["tool_chars_sum"], pa.int64()),
                "plain_chars": pc.cast(g["plain_chars_sum"], pa.int64()),
            }
        )

    agg = hash_partitioned_agg(
        ds_transcripts.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["conv_id"],
        aggs=[
            ("tool_chars", "sum", "tool_chars"),
            ("plain_chars", "sum", "plain_chars"),
        ],
    )

    def finish(b: pa.Table) -> pa.Table:
        tc = b["tool_chars"].to_numpy(zero_copy_only=False)
        pl = b["plain_chars"].to_numpy(zero_copy_only=False)
        total = np.maximum(tc + pl, 1)
        return pa.table(
            {
                "conv_id": b["conv_id"],
                "tool_chars": pa.array(tc, pa.int64()),
                "plain_chars": pa.array(pl, pa.int64()),
                "tool_ppm": pa.array(tc * 1_000_000 // total, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def first_touch_attribution(
    events_ds: "ray.data.Dataset",
    touch_type: str = "click",
    conv_type: str = "purchase",
    horizon_s: int = 7 * 86400,
) -> "ray.data.Dataset":
    """First-touch attribution: each conversion is attributed to the SAME
    user's EARLIEST ``touch_type`` event within the horizon at or before
    it — the other canonical marketing attribution model next to
    :func:`last_touch_attribution` (which credits the latest touch).
    Ties at the earliest timestamp credit the LOWEST event_id. Only
    attributed conversions are emitted.

    Output: user_id, conv_event_id, touch_event_id, lead_us (BIGINTs) —
    lead_us = conversion ts − first-touch ts.
    """
    horizon_us = horizon_s * 1_000_000

    def project(batch: pa.Table) -> pa.Table:
        m = pc.is_in(
            batch["event_type"], value_set=pa.array([touch_type, conv_type])
        )
        t = batch.filter(m)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "is_conv": pc.equal(t["event_type"], conv_type),
                "ts": t["ts"],
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "conv_event_id": pa.array([], pa.int64()),
                "touch_event_id": pa.array([], pa.int64()),
                "lead_us": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or group.num_columns == 0:
            return empty
        uid = int(group["user_id"][0].as_py())
        is_conv = group["is_conv"].to_numpy(zero_copy_only=False)
        ts = pc.cast(group["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t_ts, t_eid = ts[~is_conv], eid[~is_conv]
        c_ts, c_eid = ts[is_conv], eid[is_conv]
        if len(t_ts) == 0 or len(c_ts) == 0:
            return empty
        order = np.lexsort((t_eid, t_ts))  # ts asc, id asc — the tie order
        t_ts, t_eid = t_ts[order], t_eid[order]
        lo = np.searchsorted(t_ts, c_ts - horizon_us, side="left")
        hi = np.searchsorted(t_ts, c_ts, side="right")
        ok = lo < hi  # at least one touch inside [c_ts - horizon, c_ts]
        if not ok.any():
            return empty
        sel = lo[ok]
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(int(ok.sum()), uid, np.int64), pa.int64()
                ),
                "conv_event_id": pa.array(c_eid[ok], pa.int64()),
                "touch_event_id": pa.array(t_eid[sel], pa.int64()),
                "lead_us": pa.array(c_ts[ok] - t_ts[sel], pa.int64()),
            }
        )

    return (
        events_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def session_count_histogram(
    events_ds: "ray.data.Dataset", gap_s: int = 1800
) -> "ray.data.Dataset":
    """Distribution of 30-minute-gap session counts per user: how many
    users had exactly n sessions — the engagement-shape summary next to
    :func:`session_windows` (which emits the sessions themselves). One
    groupby(user) co-partition exchange, then a census-sized histogram
    merge.

    Output: n_sessions, n_users (BIGINTs).
    """
    from ray.data.aggregate import Sum

    gap_us = gap_s * 1_000_000

    def per_user(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {"n_sessions": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts))
        ts = ts[order]
        n_sessions = 1 + int((np.diff(ts) > gap_us).sum())
        return pa.table(
            {
                "n_sessions": pa.array([n_sessions], pa.int64()),
                "n": pa.array([1], pa.int64()),
            }
        )

    return (
        events_ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("n_sessions")
        .aggregate(Sum("n", alias_name="n_users"))
    )


def daily_uniques_ratio(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per day: event count, DISTINCT active users, and the exact
    events-per-user ppm ratio — the DAU/intensity dashboard line.
    Additive count reduces combiner-first; the distinct measure runs its
    own per-block-distinct → global-distinct pipeline; both meet in a
    day-keyed zero-padded union merge (the `daily_dashboard` pattern, one
    level coarser).

    Output: window_start (day), n_events, n_users, events_per_user_ppm
    (BIGINTs).
    """
    from ray.data.aggregate import Sum

    def count_partial(b: pa.Table) -> pa.Table:
        d = pc.floor_temporal(b["ts"], unit="day")
        g = pa.table({"w": d}).group_by("w").aggregate([([], "count_all")])
        return pa.table(
            {
                "w": g["w"],
                "ne": pc.cast(g["count_all"], pa.int64()),
                "nu": pa.array(np.zeros(g.num_rows, np.int64), pa.int64()),
            }
        )

    def distinct_partial(b: pa.Table) -> pa.Table:
        d = pc.floor_temporal(b["ts"], unit="day")
        return (
            pa.table({"w": d, "user_id": pc.cast(b["user_id"], pa.int64())})
            .group_by(["w", "user_id"])
            .aggregate([])
        )

    users = (
        events_ds.map_batches(
            distinct_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["w", "user_id"])
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "w": b["w"],
                    "ne": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                    "nu": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    counts = events_ds.map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = counts.union(users).groupby("w").aggregate(
        Sum("ne", alias_name="ne"), Sum("nu", alias_name="nu")
    )

    def finish(b: pa.Table) -> pa.Table:
        ne = b["ne"].to_numpy(zero_copy_only=False)
        nu = b["nu"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "window_start": pc.cast(b["w"], pa.timestamp("us")),
                "n_events": pa.array(ne, pa.int64()),
                "n_users": pa.array(nu, pa.int64()),
                "events_per_user_ppm": pa.array(
                    ne * 1_000_000 // np.maximum(nu, 1), pa.int64()
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
