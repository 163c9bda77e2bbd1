"""General analytic operators over Datasets (SURVEY.md §2.5–§2.6).

All follow the combiner-first pattern: vectorized per-block partial
aggregation inside ``map_batches`` (Arrow ``group_by``), then a final
multi-key ``groupby().aggregate`` over the pre-reduced partials, so the
all-to-all exchange only moves one row per key per block. Monetary doubles
are aggregated as integer cents (``round(x*100)``) to keep sums bit-exact
under any combine order — the same integer-domain rule the rollup tiers use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..util import hash_partitioned_agg


def ts_range_filter(col: str, start: str, end: str):
    """Parquet predicate-pushdown expression for ``start <= col < end``
    (timestamp domain). Passed as ``read_parquet(filter=...)`` so row
    groups outside the range never leave storage — the "prune at the read"
    rule for selective date-windowed scans. Callers keep their exact
    in-kernel filter too (the pushdown is a superset prefilter; row-group
    stats only bound, never decide, membership).
    """
    import datetime as _dt

    import pyarrow.dataset as _pads

    lo = _dt.datetime.fromisoformat(start)
    hi = _dt.datetime.fromisoformat(end)
    return (_pads.field(col) >= _pads.scalar(lo)) & (
        _pads.field(col) < _pads.scalar(hi)
    )


def ts_before_filter(col: str, end: str):
    """One-sided pushdown: ``col < end`` (same contract as
    :func:`ts_range_filter` — superset prefilter, callers keep the exact
    in-kernel predicate)."""
    import datetime as _dt

    import pyarrow.dataset as _pads

    return _pads.field(col) < _pads.scalar(_dt.datetime.fromisoformat(end))


def ts_after_filter(col: str, start: str, inclusive: bool = True):
    """One-sided pushdown: ``col >= start`` (or strict ``>`` with
    ``inclusive=False``)."""
    import datetime as _dt

    import pyarrow.dataset as _pads

    lo = _pads.scalar(_dt.datetime.fromisoformat(start))
    f = _pads.field(col)
    return (f >= lo) if inclusive else (f > lo)


def to_cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Exact integer cents from a 2-decimal double column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    v = col.to_numpy(zero_copy_only=False)
    return pa.array(np.rint(v * 100).astype(np.int64), pa.int64())


def sessionize(
    ds_transcripts: "ray.data.Dataset", gap_s: int = 1800
) -> "ray.data.Dataset":
    """Per-conversation session count: a new session starts when the gap to
    the previous turn exceeds ``gap_s`` seconds. Stream-shaped windowing as
    per-group kernel over ts-sorted turns (ray_guide 'streaming-shaped')."""
    gap_us = gap_s * 1_000_000

    def count_sessions(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("turn_idx", "ascending")]
        )
        ts = (
            group["ts"]
            .take(idx)
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        n = 1 + int(np.count_nonzero(np.diff(ts) > gap_us)) if len(ts) else 0
        return pa.table(
            {
                "conv_id": pa.array([group["conv_id"][0].as_py()], pa.string()),
                "n_sessions": pa.array([n], pa.int64()),
            }
        )

    return ds_transcripts.groupby("conv_id").map_groups(
        count_sessions, batch_format="pyarrow"
    )


def distinct_tools_per_window(
    ds_normalized: "ray.data.Dataset", window_col: str = "w1m"
) -> "ray.data.Dataset":
    """COUNT(DISTINCT tool) per window — per-block pair dedup (combiner) →
    global pair dedup (shuffle on small pairs) → per-window count."""

    def pairs(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.not_equal(batch["tool"], ""))
        g = t.group_by([window_col, "tool"]).aggregate([])
        return pa.table({"window_start": g[window_col], "tool": g["tool"]})

    from ..util import hash_partitioned_agg

    p = ds_normalized.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    # both stages are window-domain-sized (~10^5 groups at sf0.1) —
    # hash-partitioned Arrow merges, not the per-group built-in reduce
    uniq = hash_partitioned_agg(
        p, keys=["window_start", "tool"], aggs=[(None, "count_all", "_n")]
    )
    out = hash_partitioned_agg(
        uniq, keys=["window_start"], aggs=[(None, "count_all", "n_tools")]
    )
    return out.select_columns(["window_start", "n_tools"])


def topk_convs_by_chars(
    ds_normalized: "ray.data.Dataset", k: int = 10
) -> "ray.data.Dataset":
    """Top-k conversations by total chars: combiner → groupby → sort+limit
    (the sort runs over one row per conversation, not raw turns)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["conv_id"]).aggregate([("char_len", "sum")])
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "char_sum": pc.cast(g["char_len_sum"], pa.int64()),
            }
        )

    p = ds_normalized.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = p.groupby("conv_id").aggregate(Sum("char_sum", alias_name="char_sum"))
    # deterministic tie-break: (char_sum desc, conv_id asc)
    return agg.sort(["char_sum", "conv_id"], descending=[True, False]).limit(k)


def conv_stats(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-conversation stream stats: n_turns, first_ts, last_ts, n_roles.

    Fully distributed (no driver-side merge): a per-block combiner reduces to
    one row per (conv_id, role); a groupby on that pair key makes the pairs
    globally unique while carrying the partial turn counts and ts extremes;
    a second combiner + groupby on conv_id then folds the (few) role rows per
    conversation into the final stats, counting each distinct role exactly
    once. Both shuffles move one row per key per block.
    """

    def per_role_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["conv_id", "role"]).aggregate(
            [("ts", "min"), ("ts", "max"), ("ts", "count")]
        )
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "role": g["role"],
                "first_ts": g["ts_min"],
                "last_ts": g["ts_max"],
                "n": pc.cast(g["ts_count"], pa.int64()),
            }
        )

    per_role = ds_transcripts.map_batches(
        per_role_partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["conv_id", "role"]).aggregate(
        Sum("n", alias_name="n"),
        Min("first_ts", alias_name="first_ts"),
        Max("last_ts", alias_name="last_ts"),
    )

    def per_conv_partial(batch: pa.Table) -> pa.Table:
        # rows are globally unique per (conv_id, role) here, so counting rows
        # per conv_id counts distinct roles
        g = batch.group_by(["conv_id"]).aggregate(
            [("n", "sum"), ("first_ts", "min"), ("last_ts", "max"), ("role", "count")]
        )
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "n_turns": g["n_sum"],
                "first_ts": g["first_ts_min"],
                "last_ts": g["last_ts_max"],
                "n_roles": pc.cast(g["role_count"], pa.int64()),
            }
        )

    return per_role.map_batches(
        per_conv_partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("conv_id").aggregate(
        Sum("n_turns", alias_name="n_turns"),
        Min("first_ts", alias_name="first_ts"),
        Max("last_ts", alias_name="last_ts"),
        Sum("n_roles", alias_name="n_roles"),
    )


def median_chars_per_conv(ds_normalized: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact order statistic per conversation: the lower median of char_len,
    defined deterministically as sorted[(n-1)//2] so the DuckDB oracle can
    restate it with list_sort + explicit indexing (no quantile-interpolation
    ambiguity). Per-group numpy partition — O(n) selection, no full sort."""

    def med(group: pa.Table) -> pa.Table:
        v = group["char_len"].to_numpy(zero_copy_only=False)
        k = (len(v) - 1) // 2
        m = int(np.partition(v, k)[k])
        return pa.table(
            {
                "conv_id": pa.array([group["conv_id"][0].as_py()], pa.string()),
                "median_char": pa.array([m], pa.int64()),
            }
        )

    return ds_normalized.groupby("conv_id").map_groups(med, batch_format="pyarrow")


def sliding_rollup(
    tier_ds: "ray.data.Dataset", window_minutes: int = 5
) -> "ray.data.Dataset":
    """Sliding-window aggregate over the 1m tier: for every existing window
    w, totals over (w − (window_minutes−1) minutes … w] of the SAME
    conversation. Per-conversation kernel: cumulative sums + searchsorted
    over the sorted minute series (no per-row Python), running inside
    ``groupby(conv_id).map_groups`` so state never crosses conversations.
    """
    lo_us = (window_minutes - 1) * 60_000_000

    def slide(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("window_start", "ascending")])
        g = group.take(idx)
        win = (
            g["window_start"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        tc = g["turn_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        cs = g["char_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        cum_tc = np.concatenate(([0], np.cumsum(tc)))
        cum_cs = np.concatenate(([0], np.cumsum(cs)))
        left = np.searchsorted(win, win - lo_us, side="left")
        n = len(win)
        pos = np.arange(1, n + 1)
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "window_start": g["window_start"],
                "turn_count_5m": pa.array(cum_tc[pos] - cum_tc[left], pa.int64()),
                "char_sum_5m": pa.array(cum_cs[pos] - cum_cs[left], pa.int64()),
            }
        )

    return tier_ds.groupby("conv_id").map_groups(slide, batch_format="pyarrow")


def asof_last_order(sf_dir: str) -> "ray.data.Dataset":
    """As-of join, fully distributed: for every event, the latest order
    date of the same customer with o_orderdate ≤ ts (null when none).

    Built on ``joins.asof_join_last`` — ONE union + groupby(key) hash
    exchange co-partitions each customer's events with their orders, and a
    per-group sorted ``searchsorted`` kernel resolves all of a customer's
    events at once. Both sides stream as facts; nothing is read or indexed
    on the driver (the round-2 version built a per-customer dict LUT from
    a driver-side ``pq.read_table`` — a scale-killer once orders is also a
    fact table).
    """
    import ray

    from .joins import asof_join_last

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    out = asof_join_last(
        events,
        orders,
        on="user_id",
        left_ts="ts",
        left_id="event_id",
        right_on="o_custkey",
        right_ts="o_orderdate",
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": b["lid"], "last_order_ts": b["asof_ts"]}
        )

    return out.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def q1_pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-shaped integer-exact pricing summary over lineitem."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty_c": to_cents(batch["l_quantity"]),
                "price_c": to_cents(batch["l_extendedprice"]),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("qty_c", "count")]
        )
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "qty_cents": g["qty_c_sum"],
                "price_cents": g["price_c_sum"],
                "n_rows": pc.cast(g["qty_c_count"], pa.int64()),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_cents", alias_name="qty_cents"),
        Sum("price_cents", alias_name="price_cents"),
        Sum("n_rows", alias_name="n_rows"),
    )


class SegmentLookup:
    """Broadcast-join actor: the small dimension side is shipped once via
    ``ray.put`` and resolved ONCE per actor in ``__init__`` (not per batch)."""

    def __init__(self, lookup_ref):
        import ray

        lut: dict[int, str] = ray.get(lookup_ref)
        keys = np.fromiter(lut.keys(), dtype=np.int64, count=len(lut))
        order = np.argsort(keys)
        self._keys = keys[order]
        self._vals = np.array(list(lut.values()), dtype=object)[order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self._keys, k)
        seg = self._vals[pos]
        return batch.append_column("c_mktsegment", pa.array(seg, pa.string()))


def orders_by_segment(sf_dir: str) -> "ray.data.Dataset":
    """Broadcast map-side join (J1 analog): orders ⋈ customer on custkey,
    aggregated per market segment. No shuffle join — customer is small."""
    import pyarrow.parquet as pq

    import ray

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    lut = dict(
        zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist())
    )
    ref = ray.put(lut)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    joined = orders.map_batches(
        SegmentLookup,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "price_c": to_cents(batch["o_totalprice"]),
            }
        )
        g = t.group_by(["c_mktsegment"]).aggregate(
            [("price_c", "sum"), ("price_c", "count")]
        )
        return pa.table(
            {
                "c_mktsegment": g["c_mktsegment"],
                "total_cents": g["price_c_sum"],
                "n_orders": pc.cast(g["price_c_count"], pa.int64()),
            }
        )

    p = joined.map_batches(partial, batch_format="pyarrow")
    return p.groupby("c_mktsegment").aggregate(
        Sum("total_cents", alias_name="total_cents"),
        Sum("n_orders", alias_name="n_orders"),
    )


def quantile_chars_per_conv(
    ds_normalized: "ray.data.Dataset", q: float = 0.95
) -> "ray.data.Dataset":
    """Exact per-conversation order statistic at quantile ``q``: defined
    deterministically as sorted[ceil(q*n)-1] so the DuckDB oracle can
    restate it with list_sort + explicit indexing. Per-group numpy
    partition — O(n) selection, no full sort."""
    import math

    def sel(group: pa.Table) -> pa.Table:
        v = group["char_len"].to_numpy(zero_copy_only=False)
        k = max(0, math.ceil(q * len(v)) - 1)
        m = int(np.partition(v, k)[k])
        return pa.table(
            {
                "conv_id": pa.array([group["conv_id"][0].as_py()], pa.string()),
                "p_char": pa.array([m], pa.int64()),
            }
        )

    return ds_normalized.groupby("conv_id").map_groups(sel, batch_format="pyarrow")


def windowed_quantile_chars(
    ds_normalized: "ray.data.Dataset", q: float = 0.95, unit: str = "hour"
) -> "ray.data.Dataset":
    """Exact order statistic at quantile ``q`` of char_len per tumbling
    time window — the per-WINDOW percentile band a latency/size monitor
    plots (``quantile_chars_per_conv``'s sorted[ceil(q·n)-1] rule, keyed by
    window instead of stream).

    An exact quantile cannot pre-reduce (the full per-window multiset must
    co-locate — use the DDSketch path when approximate is acceptable), so
    the exchange carries (window, value) pairs; the merge groups by a
    COARSE bucket of the window key and selects for MANY windows in one
    vectorized lexsort pass — no per-window Python call (the ``ohlc_bars``
    coarse-bucket rule).

    Output: window_start, p_chars, n_turns (BIGINTs).
    """
    import math

    _P = 256
    unit_us = {"minute": 60_000_000, "hour": 3_600_000_000, "day": 86_400_000_000}[
        unit
    ]

    def partial(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch["ts"], unit=unit)
        wk = pc.cast(pc.cast(w, pa.int64()), pa.int64())
        return pa.table(
            {
                "w": wk,
                "v": pc.cast(batch["char_len"], pa.int64()),
                "kb": pc.bit_wise_and(
                    pc.divide(wk, pa.scalar(unit_us, pa.int64())),
                    pa.scalar(_P - 1, pa.int64()),
                ),
            }
        )

    OUT = pa.schema(
        [
            ("window_start", pa.timestamp("us")),
            ("p_chars", pa.int64()),
            ("n_turns", pa.int64()),
        ]
    )

    def merge(block: pa.Table) -> pa.Table:
        if block.num_columns == 0 or block.num_rows == 0:
            return OUT.empty_table()
        w = block["w"].to_numpy(zero_copy_only=False)
        v = block["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, w))
        w, v = w[order], v[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        n = np.diff(np.r_[starts, len(w)])
        k = np.maximum(np.ceil(q * n).astype(np.int64) - 1, 0)
        return pa.table(
            {
                "window_start": pa.array(w[starts], pa.timestamp("us")),
                "p_chars": pa.array(v[starts + k], pa.int64()),
                "n_turns": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    p = ds_normalized.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("kb").map_groups(merge, batch_format="pyarrow")


def top_users_by_active_days(
    events_ds: "ray.data.Dataset", k: int = 10
) -> "ray.data.Dataset":
    """Engagement leaderboard: top-``k`` users by COUNT(DISTINCT active
    day). Two pre-reduced exchanges: per-block distinct (user, day) pairs
    (Arrow ``group_by``), a pair-key groupby that leaves one row per
    distinct pair, then a per-user count — so the shuffles move distinct
    pairs (bounded by users × days), never events. Result-sized sort with
    the (n DESC, user ASC) tie-break.

    Output: user_id, n_days (BIGINTs).
    """
    from ray.data.aggregate import Count, Sum

    def pairs(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.floor_temporal(batch["ts"], unit="day"), pa.int64()),
            pa.int64(),
        )
        t = pa.table(
            {"user_id": pc.cast(batch["user_id"], pa.int64()), "day": day}
        )
        g = t.group_by(["user_id", "day"]).aggregate([])
        return g

    from ..util import hash_partitioned_agg

    # (user, day)-domain output (~4·10^4 groups at sf0.1): partitioned merge
    distinct = hash_partitioned_agg(
        events_ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id", "day"],
        aggs=[(None, "count_all", "_n")],
    )

    def per_user(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id"]).aggregate([("user_id", "count")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "n_days": pc.cast(g["user_id_count"], pa.int64()),
            }
        )

    agg = (
        distinct.map_batches(per_user, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n_days", alias_name="n_days"))
    )
    return (
        agg.sort(["n_days", "user_id"], descending=[True, False])
        .limit(k)
        .select_columns(["user_id", "n_days"])
    )


def topk_turns_per_conv(
    ds_normalized: "ray.data.Dataset", k: int = 2
) -> "ray.data.Dataset":
    """Top-k LONGEST turns per conversation (the ROW_NUMBER()-window shape):
    per-group vectorized sort by (char_len desc, turn_idx asc) + head-k —
    state never crosses conversations, so the shuffle key stays conv_id."""

    def top(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("char_len", "descending"), ("turn_idx", "ascending")],
        )
        t = group.take(idx.slice(0, min(k, group.num_rows)))
        n = t.num_rows
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "char_len": pc.cast(t["char_len"], pa.int64()),
                "rank": pa.array(np.arange(1, n + 1), pa.int64()),
            }
        )

    return ds_normalized.groupby("conv_id").map_groups(top, batch_format="pyarrow")


def rollup_orders_cube(sf_dir: str) -> "ray.data.Dataset":
    """GROUP BY ROLLUP(o_orderstatus, o_orderpriority): order counts + exact
    total cents at three grouping levels — (status, priority), (status),
    and grand total — with NULL marking the rolled-up dimension, matching
    SQL ROLLUP output.

    Coarser levels are derived from the FINEST level's partials (sums of
    sums), so the base table is read and shuffled exactly once; the re-
    aggregation runs over the tiny finest-level result (|status|×|priority|
    rows), not over orders. This is the continuous-aggregate-cascade rule
    (rollup.py::cascade) applied to grouping sets.
    """
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderstatus": batch["o_orderstatus"],
                "o_orderpriority": batch["o_orderpriority"],
                "price_c": to_cents(batch["o_totalprice"]),
            }
        )
        g = t.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("price_c", "sum"), ("price_c", "count")]
        )
        return pa.table(
            {
                "o_orderstatus": g["o_orderstatus"],
                "o_orderpriority": g["o_orderpriority"],
                "total_cents": g["price_c_sum"],
                "n_orders": pc.cast(g["price_c_count"], pa.int64()),
            }
        )

    finest = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(
            Sum("total_cents", alias_name="total_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )
    from ..util import collect_table

    f = collect_table(finest)  # result-sized: |status| × |priority| rows
    by_status = f.group_by(["o_orderstatus"]).aggregate(
        [("total_cents", "sum"), ("n_orders", "sum")]
    )
    lvl1 = pa.table(
        {
            "o_orderstatus": by_status["o_orderstatus"],
            "o_orderpriority": pa.nulls(by_status.num_rows, pa.string()),
            "total_cents": by_status["total_cents_sum"],
            "n_orders": by_status["n_orders_sum"],
        }
    )
    lvl0 = pa.table(
        {
            "o_orderstatus": pa.nulls(1, pa.string()),
            "o_orderpriority": pa.nulls(1, pa.string()),
            "total_cents": pa.array(
                [pc.sum(f["total_cents"]).as_py()], pa.int64()
            ),
            "n_orders": pa.array([pc.sum(f["n_orders"]).as_py()], pa.int64()),
        }
    )
    out = pa.concat_tables(
        [f.select(lvl1.column_names).cast(lvl1.schema), lvl1, lvl0]
    )
    return ray.data.from_arrow(out)


def unpivot_tier(tier_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Melt the wide 1m-tier metric columns into long (metric, value) rows —
    the UNPIVOT shape. Pure per-batch reshape (concat of column-sliced
    views), no shuffle; output is 3 rows per input window row.
    """
    metrics = ("turn_count", "char_sum", "tool_calls")

    def melt(batch: pa.Table) -> pa.Table:
        parts = [
            pa.table(
                {
                    "conv_id": batch["conv_id"],
                    "window_start": batch["window_start"],
                    "metric": pa.array([m] * batch.num_rows, pa.string()),
                    "value": pc.cast(batch[m], pa.int64()),
                }
            )
            for m in metrics
        ]
        return pa.concat_tables(parts)

    return tier_ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def value_histogram(
    events_ds: "ray.data.Dataset", bin_width_cents: int = 500
) -> "ray.data.Dataset":
    """Fixed-width histogram of event values (cents domain): bin id =
    floor(value_cents / width). Combiner-first — each block reduces to one
    row per occupied bin, so the exchange moves O(bins), not O(rows).

    Output: bin (BIGINT, floor-division id), n (BIGINT), sum_cents (BIGINT).
    """

    def partial(batch: pa.Table) -> pa.Table:
        cents = to_cents(batch["value"]).to_numpy(zero_copy_only=False)
        bins = np.floor_divide(cents, bin_width_cents)
        t = pa.table(
            {
                "bin": pa.array(bins, pa.int64()),
                "c": pa.array(cents, pa.int64()),
            }
        )
        g = t.group_by(["bin"]).aggregate([("c", "sum"), ("c", "count")])
        return pa.table(
            {
                "bin": g["bin"],
                "n": pc.cast(g["c_count"], pa.int64()),
                "sum_cents": g["c_sum"],
            }
        )

    p = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("bin").aggregate(
        Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents")
    )


def pivot_roles_wide(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Long→wide pivot: per conversation, one column per role with its turn
    count (the PIVOT / FILTER-aggregate shape). Roles are the event-type
    vocabulary (fixed, small); the combiner emits the wide row directly so
    the shuffle carries one fixed-width row per conversation per block.
    """
    roles = ("view", "click", "purchase", "signup", "error")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["conv_id", "role"]).aggregate([("role", "count")])
        conv = g["conv_id"]
        role = g["role"].to_numpy(zero_copy_only=False)
        n = g["role_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        dict_arr = pc.dictionary_encode(conv.combine_chunks())
        idx = dict_arr.indices.to_numpy(zero_copy_only=False)
        ncv = len(dict_arr.dictionary)
        cols = {"conv_id": dict_arr.dictionary}
        for r in roles:
            acc = np.zeros(ncv, dtype=np.int64)
            m = role == r
            np.add.at(acc, idx[m], n[m])
            cols[f"n_{r}"] = pa.array(acc, pa.int64())
        return pa.table(cols)

    p = ds_transcripts.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return p.groupby("conv_id").aggregate(
        *[Sum(f"n_{r}", alias_name=f"n_{r}") for r in roles]
    )


def corr_components(sf_dir: str) -> "ray.data.Dataset":
    """Exact single-pass correlation components for (l_quantity,
    l_extendedprice) in the integer-cents domain: n, Σx, Σy, Σxy, Σx², Σy²
    as BIGINTs. All terms are associative integer sums, so the result is
    bit-exact under any block order — the distributed-correlation shape
    without float drift (the caller or SQL derives r from the components).
    """
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        x = to_cents(batch["l_quantity"]).to_numpy(zero_copy_only=False)
        y = to_cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),  # constant global-agg key
                "n": pa.array([len(x)], pa.int64()),
                "sum_x": pa.array([int(x.sum())], pa.int64()),
                "sum_y": pa.array([int(y.sum())], pa.int64()),
                "sum_xy": pa.array([int((x * y).sum())], pa.int64()),
                "sum_x2": pa.array([int((x * x).sum())], pa.int64()),
                "sum_y2": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = p.groupby("g").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_x", alias_name="sum_x"),
        Sum("sum_y", alias_name="sum_y"),
        Sum("sum_xy", alias_name="sum_xy"),
        Sum("sum_x2", alias_name="sum_x2"),
        Sum("sum_y2", alias_name="sum_y2"),
    )
    return agg.select_columns(
        ["n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]
    )


def conv_trend_components(ds_normalized: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-conversation least-squares trend (char_len vs turn_idx) as exact
    integer sufficient statistics: n, Σx, Σy, Σxy, Σx² per conv_id. The
    slope/intercept/r² are derivable by the consumer; keeping the output in
    the associative-integer domain makes the distributed result bit-exact
    under any block order (the same components rule as
    ``corr_components``). Fully combiner-first: Arrow ``group_by`` partials
    per block, then one Sum-merge groupby — one row per (block, conv)
    crosses the exchange, never a turn row.

    Output: conv_id, n, sum_x, sum_y, sum_xy, sum_x2 (BIGINTs).
    """

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch["turn_idx"], pa.int64())
        y = pc.cast(batch["char_len"], pa.int64())
        t = pa.table(
            {
                "conv_id": batch["conv_id"],
                "one": pa.array(np.ones(len(x), dtype=np.int64)),
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "x2": pc.multiply(x, x),
            }
        )
        g = t.group_by(["conv_id"]).aggregate(
            [("one", "sum"), ("x", "sum"), ("y", "sum"), ("xy", "sum"), ("x2", "sum")]
        )
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "n": pc.cast(g["one_sum"], pa.int64()),
                "sum_x": g["x_sum"],
                "sum_y": g["y_sum"],
                "sum_xy": g["xy_sum"],
                "sum_x2": g["x2_sum"],
            }
        )

    p = ds_normalized.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = p.groupby("conv_id").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_x", alias_name="sum_x"),
        Sum("sum_y", alias_name="sum_y"),
        Sum("sum_xy", alias_name="sum_xy"),
        Sum("sum_x2", alias_name="sum_x2"),
    )
    return agg.select_columns(["conv_id", "n", "sum_x", "sum_y", "sum_xy", "sum_x2"])


def latest_event_per_user(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Last-write-wins compaction: keep each user's newest event under the
    deterministic order (ts DESC, event_id DESC) — the upsert/SCD-compact
    shape an ingest pipeline runs before serving a keyed table.

    Combiner-first argmax: each block reduces to one candidate row per
    (block, user) in a vectorized sort + run-boundary take, so only
    candidates cross the exchange (at 100 TB the exchange is
    users × blocks-sized, never event-sized). The final merge groups by a
    coarse hash bucket of the key — hash partitioning co-locates each
    user's candidates while the kernel stays one vectorized run-merge over
    many users (the same coarse-bucket rule as ``ohlc_bars``).

    Output: user_id, ts, event_id, event_type, value_cents.
    """

    def first_per_user(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "descending"),
                ("event_id", "descending"),
            ],
        )
        t = t.take(idx)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        return t.take(pa.array(starts, pa.int64()))

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "ts": batch["ts"],
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "event_type": batch["event_type"],
                "value_cents": to_cents(batch["value"]),
            }
        )
        t = first_per_user(t)
        return t.append_column(
            "kb", pc.bit_wise_and(t["user_id"], pa.scalar(255, pa.int64()))
        )

    OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("value_cents", pa.int64()),
        ]
    )

    def merge(block: pa.Table) -> pa.Table:
        if block.num_columns == 0 or block.num_rows == 0:
            return OUT.empty_table()
        return first_per_user(block.drop_columns(["kb"]))

    p = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("kb").map_groups(merge, batch_format="pyarrow")


def row_fps(t: pa.Table) -> np.ndarray:
    """60-bit md5 digest of the canonical event row string
    ``event_id|epoch_us|user_id|value_cents`` — the row identity both
    fingerprint ops (``partition_fingerprint``, ``snapshot_diff``) and
    their SQL oracles share. String assembly is one Arrow kernel; the
    per-row digest is C-speed and inherent to a content checksum."""
    import hashlib

    s = pc.binary_join_element_wise(
        pc.cast(t["event_id"], pa.string()),
        pc.cast(pc.cast(t["ts"], pa.int64()), pa.string()),
        pc.cast(t["user_id"], pa.string()),
        pc.cast(t["value_cents"], pa.string()),
        "|",
    )
    return np.array(
        [int(hashlib.md5(x.encode()).hexdigest()[:15], 16) for x in s.to_pylist()],
        dtype=np.int64,
    )


def partition_fingerprint(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Order-insensitive partition checksum (anti-entropy / table-diff):
    per event_type partition, XOR over rows of the first 60 bits of
    md5(canonical row string) plus the row count. Verifying a replica or a
    migrated copy of a 100-TB table then costs one tiny row per partition —
    recompute both sides, compare (n_rows, fp).

    XOR is associative/commutative, so per-block partials merge exactly
    under any block order — the combiner-first rule with a constant-size
    exchange (one row per (block, partition)). md5 — not the repo's
    vectorized crc/xxhash family — because the oracle must replay the hash
    in SQL; the per-row digest is C-speed and inherent to a content
    checksum.

    Output: event_type, n_rows, fp (BIGINTs).
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "ts": batch["ts"],
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "value_cents": to_cents(batch["value"]),
            }
        )
        t = t.take(pc.sort_indices(t, sort_keys=[("event_type", "ascending")]))
        fp = row_fps(t)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        return pa.table(
            {
                "event_type": pa.array(et[starts], pa.string()),
                "n_rows": pa.array(
                    np.diff(np.r_[starts, len(et)]).astype(np.int64), pa.int64()
                ),
                "fp": pa.array(np.bitwise_xor.reduceat(fp, starts), pa.int64()),
            }
        )

    OUT = pa.schema(
        [("event_type", pa.string()), ("n_rows", pa.int64()), ("fp", pa.int64())]
    )

    def merge(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return OUT.empty_table()
        fp = group["fp"].to_numpy(zero_copy_only=False)
        n = group["n_rows"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": group["event_type"][:1],
                "n_rows": pa.array([int(n.sum())], pa.int64()),
                "fp": pa.array([int(np.bitwise_xor.reduce(fp))], pa.int64()),
            }
        )

    p = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("event_type").map_groups(merge, batch_format="pyarrow")


def snapshot_diff(
    ds_old: "ray.data.Dataset", ds_new: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Change-data-capture diff of two snapshots of a keyed event table:
    which keys were added, removed, or changed between them (identical rows
    are omitted). The table-migration/replication audit op — at 100 TB each
    side reduces to (key, 60-bit row digest) rows BEFORE the exchange, so
    the shuffle moves 16-byte rows, never payloads (the same slim-exchange
    rule as exact dedup).

    Shape: tag each side, union, one hash groupby on a coarse bucket of the
    key, then a vectorized run-merge per bucket — singleton key runs decide
    added/removed by their tag, two-row runs compare digests. No join
    operator needed, so the Ray 2.49 empty-block join edge can't bite.

    Output: event_id, change ∈ {'added','removed','changed'}.
    """

    def tagged(side: int):
        def prep(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "event_id": pc.cast(batch["event_id"], pa.int64()),
                    "ts": batch["ts"],
                    "user_id": pc.cast(batch["user_id"], pa.int64()),
                    "value_cents": to_cents(batch["value"]),
                }
            )
            fp = row_fps(t)
            eid = t["event_id"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "event_id": t["event_id"],
                    "h": pa.array(fp, pa.int64()),
                    "side": pa.array(
                        np.full(len(fp), side, dtype=np.int64), pa.int64()
                    ),
                    "kb": pa.array(eid & 1023, pa.int64()),
                }
            )

        return prep

    OUT = pa.schema([("event_id", pa.int64()), ("change", pa.string())])

    def merge(block: pa.Table) -> pa.Table:
        if block.num_columns == 0 or block.num_rows == 0:
            return OUT.empty_table()
        idx = pc.sort_indices(
            block, sort_keys=[("event_id", "ascending"), ("side", "ascending")]
        )
        t = block.take(idx)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, eid[1:] != eid[:-1]])
        lens = np.diff(np.r_[starts, len(eid)])
        out_id, out_chg = [], []
        singles = starts[lens == 1]
        out_id.append(eid[singles])
        out_chg.extend(
            "removed" if s == 0 else "added" for s in side[singles]
        )
        pairs = starts[lens == 2]
        diff = pairs[h[pairs] != h[pairs + 1]]
        out_id.append(eid[diff])
        out_chg.extend(["changed"] * len(diff))
        return pa.table(
            {
                "event_id": pa.array(np.concatenate(out_id), pa.int64()),
                "change": pa.array(out_chg, pa.string()),
            }
        )

    a = ds_old.map_batches(tagged(0), batch_format="pyarrow", zero_copy_batch=True)
    b = ds_new.map_batches(tagged(1), batch_format="pyarrow", zero_copy_batch=True)
    return a.union(b).groupby("kb").map_groups(merge, batch_format="pyarrow")


def revenue_by_region(sf_dir: str) -> "ray.data.Dataset":
    """Star-schema multi-join (TPC-H Q5 shape): lineitem ⋈ supplier ⋈
    nation ⋈ region, revenue per region in exact cents.

    The three dimension tables are PRE-JOINED ON THE DRIVER (they are
    result-sized) into one s_suppkey → r_name lookup, broadcast once — so
    the fact table crosses no shuffle at all: one map-side enrich + the
    combiner-first aggregate. This is the dimension-collapse rule for star
    joins: N broadcast joins against one fact scan, never N shuffles.
    """
    import pyarrow.parquet as pq

    import ray

    from .joins import broadcast_enrich

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    dim = (
        sup.join(nat, keys="s_nationkey", right_keys="n_nationkey")
        .join(reg, keys="n_regionkey", right_keys="r_regionkey")
        .select(["s_suppkey", "r_name"])
        .rename_columns(["l_suppkey", "r_name"])
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )
    enriched = broadcast_enrich(li, dim, key="l_suppkey", columns=["r_name"])

    def partial(batch: pa.Table) -> pa.Table:
        price = to_cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False)
        # discount has 2 decimals; revenue = price*(1-disc) is exact in the
        # cents×bp integer domain: price_c * (100 - disc_pct) with disc in %
        disc_pct = to_cents(batch["l_discount"]).to_numpy(zero_copy_only=False)
        rev = price * (100 - disc_pct)  # unit: cents × percent
        t = pa.table(
            {
                "r_name": batch["r_name"],
                "rev": pa.array(rev, pa.int64()),
                "one": pa.array(np.ones(len(rev), dtype=np.int64), pa.int64()),
            }
        )
        g = t.group_by(["r_name"]).aggregate([("rev", "sum"), ("one", "sum")])
        return pa.table(
            {
                "r_name": g["r_name"],
                "revenue_cents_pct": g["rev_sum"],
                "n_items": g["one_sum"],
            }
        )

    p = enriched.map_batches(partial, batch_format="pyarrow")
    return p.groupby("r_name").aggregate(
        Sum("revenue_cents_pct", alias_name="revenue_cents_pct"),
        Sum("n_items", alias_name="n_items"),
    )


def global_median_cents(
    events_ds: "ray.data.Dataset", rounds: int | None = None, bins: int = 1024
) -> "ray.data.Dataset":
    """EXACT global order statistic (lower median, sorted[(n-1)//2]) of the
    integer-cents value domain — WITHOUT a distributed sort.

    Distributed selection by histogram refinement: each round is one
    combiner-only pass (per-block counts into ``bins`` equal-width integer
    buckets over the current [lo, hi] range, summed on the driver — a few
    KiB per block, NO shuffle); the bucket containing the target rank
    becomes the next round's range. Integer domain ⇒ the range shrinks by
    ~bins× per round, so iteration runs until ``lo >= hi`` — naturally
    bounded by log_bins(range) passes (≤7 for a full 2^63 domain at
    bins=1024; ``rounds`` is only an optional explicit cap for tests).
    Empty input returns zero rows instead of crashing.
    This trades log_bins(domain) cheap scans for the all-to-all a
    ``ds.sort`` would cost — the right trade when the value column is a
    small slice of a huge corpus.

    Output: one row, median_cents (BIGINT).
    """
    import ray

    def count_pass(lo: int, hi: int) -> np.ndarray:
        width = max(1, (hi - lo + bins) // bins)

        def partial(batch: pa.Table) -> pa.Table:
            c = to_cents(batch["value"]).to_numpy(zero_copy_only=False)
            c = c[(c >= lo) & (c <= hi)]
            idx = np.minimum((c - lo) // width, bins - 1)
            counts = np.bincount(idx, minlength=bins).astype(np.int64)
            return pa.table({"h": pa.array([counts.tobytes()], pa.binary())})

        parts = events_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        acc = np.zeros(bins, dtype=np.int64)
        for row in parts.iter_rows():
            acc += np.frombuffer(row["h"], dtype=np.int64)
        return acc, width

    # bounds + rank from one min/max/count pass
    from ray.data.aggregate import Count, Max, Min

    def cents_col(batch: pa.Table) -> pa.Table:
        return pa.table({"c": to_cents(batch["value"])})

    stats = (
        events_ds.map_batches(cents_col, batch_format="pyarrow")
        .aggregate(Min("c"), Max("c"), Count())
    )
    if not stats or not stats.get("count()"):
        return ray.data.from_arrow(
            pa.table({"median_cents": pa.array([], pa.int64())})
        )
    lo, hi, n = int(stats["min(c)"]), int(stats["max(c)"]), int(stats["count()"])
    rank = (n - 1) // 2  # 0-based lower median
    below = 0
    # each pass shrinks [lo, hi] by ~bins×, so this terminates in
    # <= ceil(log_bins(hi - lo + 1)) + 1 passes; `rounds` is a test-only cap
    passes = 0
    while lo < hi and (rounds is None or passes < rounds):
        counts, width = count_pass(lo, hi)
        cum = np.cumsum(counts)
        j = int(np.searchsorted(cum, rank - below + 1, side="left"))
        if j > 0:
            below += int(cum[j - 1])
        lo = lo + j * width
        hi = min(hi, lo + width - 1)
        passes += 1
    return ray.data.from_arrow(
        pa.table({"median_cents": pa.array([lo], pa.int64())})
    )


def _hist_select_median(
    events_ds: "ray.data.Dataset", to_ints, bins: int = 1024
) -> int | None:
    """Lower median (sorted[(n-1)//2]) of ``to_ints(batch) -> int64 array``
    by the same shuffle-free histogram refinement as
    ``global_median_cents``, generalized over a derived integer column so
    second-pass statistics (e.g. MAD deviations) reuse it. Returns None on
    an empty column. Every pass is combiner-only: a few KiB of bucket
    counts per block, no exchange."""
    import ray
    from ray.data.aggregate import Count, Max, Min

    def col(batch: pa.Table) -> pa.Table:
        return pa.table({"c": pa.array(to_ints(batch), pa.int64())})

    stats = events_ds.map_batches(col, batch_format="pyarrow").aggregate(
        Min("c"), Max("c"), Count()
    )
    if not stats or not stats.get("count()"):
        return None
    lo, hi, n = int(stats["min(c)"]), int(stats["max(c)"]), int(stats["count()"])
    rank = (n - 1) // 2
    below = 0
    while lo < hi:
        width = max(1, (hi - lo + bins) // bins)

        def partial(batch: pa.Table, lo=lo, hi=hi, width=width) -> pa.Table:
            c = to_ints(batch)
            c = c[(c >= lo) & (c <= hi)]
            idx = np.minimum((c - lo) // width, bins - 1)
            counts = np.bincount(idx, minlength=bins).astype(np.int64)
            return pa.table({"h": pa.array([counts.tobytes()], pa.binary())})

        acc = np.zeros(bins, dtype=np.int64)
        for row in events_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_rows():
            acc += np.frombuffer(row["h"], dtype=np.int64)
        cum = np.cumsum(acc)
        j = int(np.searchsorted(cum, rank - below + 1, side="left"))
        if j > 0:
            below += int(cum[j - 1])
        lo = lo + j * width
        hi = min(hi, lo + width - 1)
    return lo


def value_mad_outliers(
    events_ds: "ray.data.Dataset", k: int = 5
) -> "ray.data.Dataset":
    """Robust outliers by median absolute deviation: flag events whose
    |value − median| exceeds ``k`` × MAD — the z-score detector's
    heavy-tail-safe sibling (one wild value cannot move the thresholds,
    unlike mean/stddev).

    Entirely in the exact integer-cents domain: two shuffle-free
    histogram-refinement selections (median of cents, then median of
    absolute deviations — each a few combiner-only passes, KiB per block),
    then one broadcast-scalar filter pass. No sort, no exchange anywhere.

    Output: event_id, value_cents, dev (BIGINTs) for flagged rows.
    """
    import ray

    def cents(batch: pa.Table) -> np.ndarray:
        return to_cents(batch["value"]).to_numpy(zero_copy_only=False)

    med = _hist_select_median(events_ds, cents)
    OUT = pa.schema(
        [("event_id", pa.int64()), ("value_cents", pa.int64()), ("dev", pa.int64())]
    )
    if med is None:
        return ray.data.from_arrow(OUT.empty_table())

    def devs(batch: pa.Table) -> np.ndarray:
        return np.abs(cents(batch) - med)

    mad = _hist_select_median(events_ds, devs)

    def flag(batch: pa.Table) -> pa.Table:
        c = cents(batch)
        d = np.abs(c - med)
        keep = d > k * mad
        return pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "value_cents": pa.array(c[keep], pa.int64()),
                "dev": pa.array(d[keep], pa.int64()),
            }
        )

    return events_ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def q3_unshipped_revenue(
    sf_dir: str, segment: str = "BUILDING", cutoff: str = "1998-06-01"
) -> "ray.data.Dataset":
    """TPC-H Q3 shape: top-10 orders by open revenue — customers in one
    segment, ordered before the cutoff, shipped after it.

    Scale plan: the segment filter makes customers a key-only semi-join
    build side (never payload); orders⋈lineitem is the one large-large
    hash exchange, both sides filter-pruned BEFORE it; revenue aggregates
    combiner-first per (orderkey, orderdate) inside map_batches so the
    final groupby moves one row per key per block; the sort input is
    group-sized, the limit result-sized. Revenue in exact integer units
    cents × (100 − discount%), ``promo_revenue_ppm``'s rule.

    Output: orderkey, orderdate, revenue_u (BIGINTs).
    """
    import ray

    from .joins import hash_join, semi_join

    cutoff_us = np.datetime64(cutoff, "us").astype(np.int64)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], segment)).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def orders_pred(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(b["o_orderdate"], pa.int64()), pa.int64())
        return b.filter(pc.less(ts, pa.scalar(cutoff_us, pa.int64())))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=ts_before_filter("o_orderdate", cutoff),
    ).map_batches(orders_pred, batch_format="pyarrow", zero_copy_batch=True)
    orders = semi_join(orders, cust, on="o_custkey", right_on="c_custkey")

    def line_pred(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(b["l_shipdate"], pa.int64()), pa.int64())
        b = b.filter(pc.greater(ts, pa.scalar(cutoff_us, pa.int64())))
        ext = to_cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc = to_cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        rev = ext * (100 - disc)
        return pa.table(
            {
                "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "rev": pa.array(rev, pa.int64()),
            }
        )

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=ts_after_filter("l_shipdate", cutoff, inclusive=False),
    ).map_batches(line_pred, batch_format="pyarrow", zero_copy_batch=True)

    j = hash_join(
        line,
        orders.select_columns(["o_orderkey", "o_orderdate"]),
        on="l_orderkey",
        right_on="o_orderkey",
    )

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey", "o_orderdate"]).aggregate([("rev", "sum")])
        return pa.table(
            {
                "orderkey": pc.cast(g["l_orderkey"], pa.int64()),
                "orderdate": g["o_orderdate"],
                "revenue_u": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    from ..util import hash_partitioned_agg

    # orderkey-domain output (~10^5 groups): hash-partitioned Arrow merge
    agg = hash_partitioned_agg(
        j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["orderkey", "orderdate"],
        aggs=[("revenue_u", "sum", "revenue_u")],
    )
    return (
        agg.sort(["revenue_u", "orderkey"], descending=[True, False])
        .limit(10)
        .select_columns(["orderkey", "orderdate", "revenue_u"])
    )


def user_day_membership(
    events_ds: "ray.data.Dataset",
    type_a: str = "purchase",
    type_b: str = "error",
    mode: str = "both",
) -> "ray.data.Dataset":
    """Set operations (INTERSECT / EXCEPT) over per-user-day activity:
    which (user, day) cells saw a ``type_a`` event AND a ``type_b`` event
    (``mode="both"`` - SQL INTERSECT) or ``type_a`` with NO ``type_b``
    (``mode="a_only"`` - SQL EXCEPT). The "converted without an error that
    day" funnel shape.

    Scale-safe restatement: instead of materializing two row sets and
    shuffling each through a distinct, a per-block combiner reduces every
    block to one row per (user, day) with two membership flags (Arrow
    ``group_by(...).max``), ONE groupby merges the flags, and the set
    operation is a pure per-batch filter. Days are integer epoch days
    (``epoch_us // 86.4e9``) so the oracle matches exactly.

    Output: user_id, day (BIGINT).
    """
    if mode not in ("both", "a_only"):
        raise ValueError(f"unknown mode {mode!r}")
    US_PER_DAY = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        day = pc.divide(us, US_PER_DAY)
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "day": day,
                "a": pc.cast(pc.equal(batch["event_type"], type_a), pa.int8()),
                "b": pc.cast(pc.equal(batch["event_type"], type_b), pa.int8()),
            }
        )
        g = t.group_by(["user_id", "day"]).aggregate(
            [("a", "max"), ("b", "max")]
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "day": g["day"],
                "a": g["a_max"],
                "b": g["b_max"],
            }
        )

    from ..util import hash_partitioned_agg

    merged = hash_partitioned_agg(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id", "day"],
        aggs=[("a", "max", "a"), ("b", "max", "b")],
    )

    def member(batch: pa.Table) -> pa.Table:
        has_a = pc.equal(batch["a"], 1)
        has_b = pc.equal(batch["b"], 1)
        mask = (
            pc.and_(has_a, has_b)
            if mode == "both"
            else pc.and_(has_a, pc.invert(has_b))
        )
        return batch.filter(mask).select(["user_id", "day"])

    return merged.map_batches(member, batch_format="pyarrow", zero_copy_batch=True)


def dow_hour_activity(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Activity heat-map cells: event count + exact cents sum per
    (day-of-week, hour-of-day) — the date-part extraction shape.

    Day-of-week is computed in pure integer math from epoch microseconds
    (``(days + 4) % 7`` — 1970-01-01 was a Thursday; Sunday = 0) so it
    matches DuckDB ``EXTRACT(dow ...)`` bit-for-bit with no timezone or
    calendar library in the hot path. Combiner-first: per-block group_by
    reduces to ≤168 cells before the one tiny shuffle.

    Output: dow, hour (BIGINT), n_events, sum_cents (BIGINT).
    """
    US_PER_DAY = 86_400_000_000
    US_PER_HOUR = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        days = us // US_PER_DAY
        dow = (days + 4) % 7
        hour = (us % US_PER_DAY) // US_PER_HOUR
        cents = to_cents(batch["value"])
        t = pa.table(
            {
                "dow": pa.array(dow, pa.int64()),
                "hour": pa.array(hour, pa.int64()),
                "cents": cents,
            }
        )
        g = t.group_by(["dow", "hour"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )
        return pa.table(
            {
                "dow": g["dow"],
                "hour": g["hour"],
                "n_events": pc.cast(g["cents_count"], pa.int64()),
                "sum_cents": g["cents_sum"],
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["dow", "hour"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_cents", alias_name="sum_cents"),
        )
    )


def monthly_revenue(sf_dir: str) -> "ray.data.Dataset":
    """Calendar-month rollup of orders: revenue + count per (year, month).

    Calendar windows are NON-uniform (28-31 days), so unlike the fixed-width
    tier windows (``w1m = ts - ts % 60s``) this uses Arrow's temporal
    ``pc.year`` / ``pc.month`` kernels — the shape PyReshaper's fixed
    time-slice loop cannot express. Combiner-first: each block reduces to
    <= n_distinct_months rows before the one tiny shuffle; sums are exact
    integer cents.

    Output: year (BIGINT), month (BIGINT), n_orders (BIGINT),
    revenue_cents (BIGINT).
    """
    import ray

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
                "month": pc.cast(pc.month(batch["o_orderdate"]), pa.int64()),
                "cents": to_cents(batch["o_totalprice"]),
            }
        )
        g = t.group_by(["year", "month"]).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )
        return pa.table(
            {
                "year": g["year"],
                "month": g["month"],
                "n_orders": pc.cast(g["cents_count"], pa.int64()),
                "revenue_cents": g["cents_sum"],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["year", "month"])
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
    )


def cohort_retention(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Cohort-retention matrix: users grouped by FIRST active day (the
    cohort), counted on each later day offset they were active.

    The classic product-analytics triangle, restated scale-safe:

    1. per-block combiner reduces raw events to distinct (user, day)
       pairs (Arrow group_by) — the only stage the full event stream
       crosses, and it exchanges two int64 columns;
    2. one groupby finishes the distinct;
    3. first day per user is a per-block min + groupby Min over the
       ALREADY-distinct pairs (no second scan of the input);
    4. a hash join (user -> first_day) tags every pair, offsets are
       vectorized, and the final groupby is result-sized
       (cohorts x offsets).

    Days are integer epoch days, so counts are oracle-exact.

    Output: cohort_day (BIGINT), offset_day (BIGINT), n_users (BIGINT).
    """
    from .joins import hash_join

    US_PER_DAY = 86_400_000_000

    def pairs_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.divide(pc.cast(batch["ts"], pa.int64()), US_PER_DAY),
            }
        )
        g = t.group_by(["user_id", "day"]).aggregate([])
        return g.select(["user_id", "day"])

    pairs = hash_partitioned_agg(
        events_ds.map_batches(
            pairs_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["user_id", "day"],
        aggs=[(None, "count_all", "_n")],
    ).select_columns(["user_id", "day"])

    def first_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id"]).aggregate([("day", "min")])
        return pa.table({"user_id": g["user_id"], "first_day": g["day_min"]})

    firsts = (
        pairs.map_batches(
            first_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("user_id")
        .aggregate(Min("first_day", alias_name="first_day"))
    )

    tagged = hash_join(pairs, firsts, on="user_id")

    def offset_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "cohort_day": batch["first_day"],
                "offset_day": pc.subtract(batch["day"], batch["first_day"]),
            }
        )
        g = t.group_by(["cohort_day", "offset_day"]).aggregate(
            [("offset_day", "count")]
        )
        return pa.table(
            {
                "cohort_day": g["cohort_day"],
                "offset_day": g["offset_day"],
                "n_users": pc.cast(g["offset_day_count"], pa.int64()),
            }
        )

    return (
        tagged.map_batches(
            offset_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["cohort_day", "offset_day"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def funnel_conversion(
    events_ds: "ray.data.Dataset",
    first_type: str = "signup",
    then_type: str = "purchase",
) -> "ray.data.Dataset":
    """Sequential-pattern funnel: users who did ``first_type`` and LATER
    (strictly greater timestamp) did ``then_type``.

    The order-dependent two-step funnel reduces to per-user extrema — no
    per-user event sort, no window function: a user converts iff
    ``max(ts | then_type) > min(ts | first_type)``. Per-block combiner
    computes both extrema with int64 sentinels (+inf for the min side,
    -inf for the max side, so Arrow's min/max need no null handling),
    ONE groupby merges, and the verdict is a vectorized per-batch
    comparison. Only users who performed ``first_type`` appear.

    Output: user_id (BIGINT), first_ts_us (BIGINT, min first_type ts),
    converted (BOOL).
    """
    SENT_MIN = (1 << 62)
    SENT_MAX = -(1 << 62)

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        is_a = pc.equal(batch["event_type"], first_type)
        is_b = pc.equal(batch["event_type"], then_type)
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "a_ts": pc.if_else(is_a, us, pa.scalar(SENT_MIN, pa.int64())),
                "b_ts": pc.if_else(is_b, us, pa.scalar(SENT_MAX, pa.int64())),
            }
        )
        g = t.group_by(["user_id"]).aggregate([("a_ts", "min"), ("b_ts", "max")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "a_min": g["a_ts_min"],
                "b_max": g["b_ts_max"],
            }
        )

    merged = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(
            Min("a_min", alias_name="a_min"),
            Max("b_max", alias_name="b_max"),
        )
    )

    def verdict(batch: pa.Table) -> pa.Table:
        has_a = pc.not_equal(batch["a_min"], pa.scalar(SENT_MIN, pa.int64()))
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "first_ts_us": batch["a_min"],
                "converted": pc.greater(batch["b_max"], batch["a_min"]),
            }
        ).filter(has_a)
        return t

    return merged.map_batches(verdict, batch_format="pyarrow", zero_copy_batch=True)


def daily_counts_full_outer(sf_dir: str) -> "ray.data.Dataset":
    """FULL OUTER join of two per-day aggregates: order count per day vs
    event count per day, null sides preserved and zero-filled. Exercises
    the one join type the engine had not yet surfaced; both inputs are
    combiner-reduced to one row per day BEFORE the join, so the exchange
    is result-sized regardless of fact-table scale.

    Output: day (BIGINT epoch days), n_orders (BIGINT), n_events (BIGINT).
    """
    import ray

    from .joins import hash_join

    US_PER_DAY = 86_400_000_000

    def day_counts(ds, ts_col, out_name):
        def partial(batch: pa.Table) -> pa.Table:
            day = pc.divide(pc.cast(batch[ts_col], pa.int64()), US_PER_DAY)
            g = pa.table({"day": day}).group_by(["day"]).aggregate(
                [("day", "count")]
            )
            return pa.table(
                {
                    "day": g["day"],
                    out_name: pc.cast(g["day_count"], pa.int64()),
                }
            )

        return (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("day")
            .aggregate(Sum(out_name, alias_name=out_name))
        )

    orders = day_counts(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate"]),
        "o_orderdate",
        "n_orders",
    )
    events = day_counts(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"]),
        "ts",
        "n_events",
    )
    # full_outer keeps unmatched days from BOTH sides; Ray coalesces the
    # equi-key into one `day` column, so only the payload sides need
    # zero-filling.
    joined = hash_join(orders, events, on="day", join_type="full_outer")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": batch["day"],
                "n_orders": pc.fill_null(
                    pc.cast(batch["n_orders"], pa.int64()), 0
                ),
                "n_events": pc.fill_null(
                    pc.cast(batch["n_events"], pa.int64()), 0
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def source_share_ppm(ds_docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Percent-of-total (RATIO_TO_REPORT window-over-aggregate shape): each
    document source's share of the corpus, in exact integer parts-per-
    million (``n * 1_000_000 // total`` — floor division, so no float and
    no rounding-rule mismatch with SQL).

    One combiner-first groupby produces the per-source counts; the grand
    total is the sum of that RESULT-SIZED table, computed in a final
    per-batch map after a single-partition repartition (the result is a
    handful of rows — this is the one place a full view of the aggregate
    is required and it is result-sized by construction).

    Output: source (STRING), n_docs (BIGINT), share_ppm (BIGINT).
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["source"]).aggregate([("source", "count")])
        return pa.table(
            {
                "source": g["source"],
                "n_docs": pc.cast(g["source_count"], pa.int64()),
            }
        )

    counts = (
        ds_docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .repartition(1)
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n.sum())
        share = (n * 1_000_000) // total if total else n * 0
        return pa.table(
            {
                "source": batch["source"],
                "n_docs": batch["n_docs"],
                "share_ppm": pa.array(share, pa.int64()),
            }
        )

    return counts.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def orders_above_customer_avg(sf_dir: str) -> "ray.data.Dataset":
    """Decorrelated correlated-subquery shape: orders strictly above their
    OWN customer's average order value.

    The subquery ``(SELECT AVG(o_totalprice) FROM orders o2 WHERE
    o2.o_custkey = o.o_custkey)`` decorrelates into a per-customer
    aggregate joined back to the fact table. The comparison stays in
    EXACT integer math by cross-multiplying instead of dividing:
    ``price > sum/n  <=>  price_cents * n > sum_cents`` — no float AVG on
    either side (the oracle uses the same inequality).

    Combiner-first per-customer (sum, count); hash join back; vectorized
    filter. Output: o_orderkey (BIGINT), o_custkey (BIGINT),
    price_cents (BIGINT).
    """
    import ray

    from .joins import hash_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def with_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "price_cents": to_cents(batch["o_totalprice"]),
            }
        )

    orders = ds.map_batches(with_cents, batch_format="pyarrow", zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_custkey"]).aggregate(
            [("price_cents", "sum"), ("price_cents", "count")]
        )
        return pa.table(
            {
                "cust": g["o_custkey"],
                "sum_cents": g["price_cents_sum"],
                "n_orders": pc.cast(g["price_cents_count"], pa.int64()),
            }
        )

    per_cust = (
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cust")
        .aggregate(
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )

    joined = hash_join(orders, per_cust, on="o_custkey", right_on="cust")

    def above(batch: pa.Table) -> pa.Table:
        lhs = pc.multiply(
            pc.cast(batch["price_cents"], pa.int64()), batch["n_orders"]
        )
        keep = pc.greater(lhs, batch["sum_cents"])
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "price_cents": batch["price_cents"],
            }
        ).filter(keep)

    return joined.map_batches(above, batch_format="pyarrow", zero_copy_batch=True)


def props_k_stats(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Semi-structured column handling: extract the integer field ``k``
    from the JSON ``props`` string with a vectorized RE2 kernel
    (``pc.extract_regex`` — no per-row json.loads), then a combiner-first
    aggregate per event_type.

    The pattern is restated verbatim in the DuckDB oracle's
    ``regexp_extract`` (both engines are RE2), so extraction semantics are
    bit-identical; rows whose props lack the field drop out of the
    aggregate on both sides.

    Output: event_type (STRING), n (BIGINT), sum_k (BIGINT),
    max_k (BIGINT).
    """

    def partial(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch["props"], pattern=r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        t = pa.table({"event_type": batch["event_type"], "k": k}).filter(
            pc.is_valid(k)
        )
        g = t.group_by(["event_type"]).aggregate(
            [("k", "count"), ("k", "sum"), ("k", "max")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": pc.cast(g["k_count"], pa.int64()),
                "sum_k": g["k_sum"],
                "max_k": g["k_max"],
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


def funnel_latency(
    events_ds: "ray.data.Dataset",
    first_type: str = "signup",
    then_type: str = "purchase",
) -> "ray.data.Dataset":
    """Time-to-convert: for every user who did ``first_type`` and later
    ``then_type``, the microseconds between the FIRST ``first_type`` event
    and the first ``then_type`` event STRICTLY after it.

    Unlike ``funnel_conversion`` (a pure per-user-extrema reduction), the
    latency needs the conditional minimum "first B after first A", which is
    not distributive — so it decomposes into two scale-safe stages: a
    combiner-first per-user min over A events, a hash join of only the B
    events against that result-sized table, then a second combiner-first
    min over the filtered B side. Raw events cross each shuffle once,
    pre-reduced per block.

    Output: user_id (BIGINT), signup_us (BIGINT), latency_us (BIGINT).
    """
    from .joins import hash_join

    def a_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["event_type"], first_type))
        g = t.group_by(["user_id"]).aggregate([("ts", "min")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "signup_us": pc.cast(g["ts_min"], pa.int64()),
            }
        )

    firsts = (
        events_ds.map_batches(a_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Min("signup_us", alias_name="signup_us"))
    )

    def b_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["event_type"], then_type))
        return pa.table(
            {
                "b_user": t["user_id"],
                "b_us": pc.cast(t["ts"], pa.int64()),
            }
        )

    b_events = events_ds.map_batches(
        b_only, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = hash_join(b_events, firsts, on="b_user", right_on="user_id")

    def after_partial(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch["b_us"], batch["signup_us"])
        t = batch.filter(keep)
        g = t.group_by(["b_user", "signup_us"]).aggregate([("b_us", "min")])
        return pa.table(
            {
                "user_id": g["b_user"],
                "signup_us": g["signup_us"],
                "conv_us": g["b_us_min"],
            }
        )

    conv = (
        joined.map_batches(after_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "signup_us"])
        .aggregate(Min("conv_us", alias_name="conv_us"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["user_id"],
                "signup_us": batch["signup_us"],
                "latency_us": pc.subtract(batch["conv_us"], batch["signup_us"]),
            }
        )

    return conv.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def rolling_distinct_users(
    events_ds: "ray.data.Dataset", window_days: int = 7
) -> "ray.data.Dataset":
    """Rolling distinct: for every day, how many DISTINCT users were active
    in the trailing ``window_days`` window — the sliding-window COUNT
    DISTINCT, which no single groupby can express because distinct sets
    don't sum.

    Restated as interval coverage so it stays one-pass and exact: reduce to
    distinct (user, day) pairs (combiner + one groupby — the only stage raw
    events cross), then each pair COVERS the days [day, day+window-1]; a
    vectorized repeat/tile expansion (bounded x window blowup of the
    already-tiny pair set), a second dedup, and a result-sized per-day
    count give the answer: user u counts for day d iff u was active in
    [d-window+1, d].

    Output: day (BIGINT epoch days), n_users (BIGINT).
    """
    US_PER_DAY = 86_400_000_000

    def pairs_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.divide(pc.cast(batch["ts"], pa.int64()), US_PER_DAY),
            }
        )
        g = t.group_by(["user_id", "day"]).aggregate([])
        return g.select(["user_id", "day"])

    pairs = hash_partitioned_agg(
        events_ds.map_batches(
            pairs_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["user_id", "day"],
        aggs=[(None, "count_all", "_n")],
    ).select_columns(["user_id", "day"])

    def expand(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        d = batch["day"].to_numpy(zero_copy_only=False)
        off = np.arange(window_days, dtype=np.int64)
        t = pa.table(
            {
                "user_id": pa.array(np.repeat(u, window_days), pa.int64()),
                "day": pa.array(
                    np.repeat(d, window_days) + np.tile(off, len(d)), pa.int64()
                ),
            }
        )
        # block-local dedup before the second shuffle
        g = t.group_by(["user_id", "day"]).aggregate([])
        return g.select(["user_id", "day"])

    covered = hash_partitioned_agg(
        pairs.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id", "day"],
        aggs=[(None, "count_all", "_n")],
    ).select_columns(["user_id", "day"])

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["day"]).aggregate([("day", "count")])
        return pa.table(
            {
                "day": g["day"],
                "n_users": pc.cast(g["day_count"], pa.int64()),
            }
        )

    return (
        covered.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def value_outliers(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-user z-score outliers WITHOUT any float statistics: flag events
    whose value deviates from their OWN user's mean by more than 3
    standard deviations, evaluated entirely in integer math.

    z² > 9 rewrites as (n·x − s)² > 9·(n·q − s²) with s = Σx, q = Σx²
    over the user's events in exact cents — both sides are integers, so
    the decision is bit-deterministic and the oracle states the identical
    inequality (in HUGEINT to be overflow-safe; the engine uses python
    ints inside the kernel for the same reason).

    Two scale-safe stages: a combiner-first per-user (n, s, q) aggregate,
    then one hash join back to the events and a vectorized filter.

    Output: event_id (BIGINT), user_id (BIGINT), value_cents (BIGINT).
    """
    from .joins import hash_join

    def with_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "value_cents": to_cents(batch["value"]),
            }
        )

    ev = events_ds.map_batches(with_cents, batch_format="pyarrow", zero_copy_batch=True)

    def moments_partial(batch: pa.Table) -> pa.Table:
        x = batch["value_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "u": batch["user_id"],
                "n1": pa.array(np.ones(len(x), np.int64), pa.int64()),
                "s1": pa.array(x, pa.int64()),
                "q1": pa.array(x * x, pa.int64()),
            }
        )
        g = t.group_by(["u"]).aggregate([("n1", "sum"), ("s1", "sum"), ("q1", "sum")])
        return pa.table(
            {
                "u": g["u"],
                "n": g["n1_sum"],
                "s": g["s1_sum"],
                "q": g["q1_sum"],
            }
        )

    moments = (
        ev.map_batches(moments_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("u")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("q", alias_name="q"),
        )
    )

    # left side is a mapped raw read (blocks always schema-bearing): only
    # the aggregate right side needs the empty-block coalesce guard
    joined = hash_join(ev, moments, on="user_id", right_on="u", coalesce="right")

    def flag(batch: pa.Table) -> pa.Table:
        # (n·x−s)² and 9(nq−s²) can exceed int64 at large n·cents, and the
        # oracle's HUGEINT math must be matched exactly. Vectorized float64
        # decides every row whose two sides differ by more than a few ulps
        # (products ≤ ~2^100 carry ~1e-16 relative error, so a 1e-9 gap is
        # decision-safe); only boundary-straddling rows — a vanishing
        # fraction — re-check in arbitrary-precision python ints.
        x = batch["value_cents"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        q = batch["q"].to_numpy(zero_copy_only=False).astype(np.float64)
        lhs = (n * x - s) ** 2
        rhs = 9.0 * (n * q - s * s)
        gap = np.abs(lhs - rhs)
        # float64 rounding error is proportional to the PRE-cancellation
        # intermediates ((n·x)², s², n·q) — not the cancelled lhs/rhs, which
        # can be tiny after subtraction while the absolute error stays
        # ~1e-16 × intermediate.  Scale the undecided band accordingly so a
        # boundary row always falls through to the exact-int recheck.
        inter = (n * x) ** 2 + s * s + n * q + 1.0
        decided = gap > 1e-12 * inter
        keep_np = lhs > rhs
        if not decided.all():
            xi = batch["value_cents"].to_numpy(zero_copy_only=False)
            ni = batch["n"].to_numpy(zero_copy_only=False)
            si = batch["s"].to_numpy(zero_copy_only=False)
            qi = batch["q"].to_numpy(zero_copy_only=False)
            for i in np.nonzero(~decided)[0]:
                a = (int(ni[i]) * int(xi[i]) - int(si[i])) ** 2
                b = 9 * (int(ni[i]) * int(qi[i]) - int(si[i]) ** 2)
                keep_np[i] = a > b
        keep = pa.array(keep_np, pa.bool_())
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "value_cents": batch["value_cents"],
            }
        ).filter(keep)

    return joined.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def promo_revenue_ppm(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q14 shape (promotion revenue share): the fraction of lineitem
    revenue coming from parts whose type starts with 'PROMO', as one exact
    integer parts-per-million row.

    The part dimension collapses on the driver to a boolean per partkey
    (result-sized), broadcast once; the fact scan then needs NO shuffle at
    all — a per-block combiner reduces to (promo_revenue, total_revenue)
    integer pairs in the cents×bp domain and one constant-key groupby sums
    them. share_ppm = promo·1e6 // total (floor division on both sides).

    Output: promo_rev (BIGINT), total_rev (BIGINT), share_ppm (BIGINT).
    """
    import pyarrow.parquet as pq

    import ray

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    promo_keys = part.filter(
        pc.starts_with(part["p_type"], "PROMO")
    )["p_partkey"].combine_chunks()
    ref = ray.put(promo_keys)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        from ..util import cached_get

        promo = cached_get(ref)
        price = to_cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc = (
            pc.cast(
                pc.round(pc.multiply(pc.cast(batch["l_discount"], pa.float64()), 100.0)),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        rev = price * (100 - disc)  # cents x bp, exact
        is_promo = pc.is_in(batch["l_partkey"], value_set=promo).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "promo_rev": pa.array([int(rev[is_promo].sum())], pa.int64()),
                "total_rev": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(
            Sum("promo_rev", alias_name="promo_rev"),
            Sum("total_rev", alias_name="total_rev"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        p = batch["promo_rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch["total_rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        share = np.where(t > 0, (p.astype(object) * 1_000_000 // t), 0)
        return pa.table(
            {
                "promo_rev": batch["promo_rev"],
                "total_rev": batch["total_rev"],
                "share_ppm": pa.array([int(x) for x in share], pa.int64()),
            }
        )

    return agg.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["promo_rev", "total_rev", "share_ppm"])


def monthly_revenue_change(sf_dir: str) -> "ray.data.Dataset":
    """Month-over-month revenue change — the LAG()-over-an-aggregate
    composition: the distributed calendar-month rollup feeds a result-sized
    ordered window on the driver (one row per month; at any scale the
    month count is bounded), emitting the delta and the change rate in
    exact integer ppm, TRUNCATED toward zero to match SQL's integer
    division semantics (DuckDB ``//`` truncates; Python ``//`` floors —
    negative deltas would differ by one ppm otherwise).

    Output: year, month (BIGINT), revenue_cents (BIGINT),
    prev_cents (BIGINT), change_ppm (BIGINT) — first month omitted (no
    LAG), like the SQL WHERE prev IS NOT NULL.
    """
    import ray

    monthly = monthly_revenue(sf_dir).to_pandas()
    monthly = monthly.sort_values(["year", "month"]).reset_index(drop=True)
    cur = monthly["revenue_cents"].to_numpy()
    prev = np.roll(cur, 1)
    out = pa.table(
        {
            "year": pa.array(monthly["year"][1:].to_numpy(), pa.int64()),
            "month": pa.array(monthly["month"][1:].to_numpy(), pa.int64()),
            "revenue_cents": pa.array(cur[1:], pa.int64()),
            "prev_cents": pa.array(prev[1:], pa.int64()),
            "change_ppm": pa.array(
                [
                    int(
                        abs(int(c) - int(p)) * 1_000_000 // int(p)
                        * (1 if int(c) >= int(p) else -1)
                    )
                    for c, p in zip(cur[1:], prev[1:])
                ],
                pa.int64(),
            ),
        }
    )
    return ray.data.from_arrow(out)


def q10_returned_revenue(
    sf_dir: str, start: str = "1995-01-01", end: str = "1996-01-01", k: int = 20
) -> "ray.data.Dataset":
    """TPC-H Q10 shape: top-``k`` customers by revenue lost to returned
    items ordered inside [``start``, ``end``).

    Scale plan mirrors ``q3_unshipped_revenue``: both fact sides are
    filter-pruned BEFORE the one large-large hash exchange
    (lineitem[returnflag='R'] ⋈ orders[date window]); revenue pre-reduces
    per custkey inside map_batches so the final groupby moves one row per
    customer per block; the customer name attaches via a broadcast dim
    lookup AFTER aggregation (result-sized left side, no second shuffle).
    Revenue in exact integer units cents × (100 − discount%).

    Output: custkey (BIGINT), c_name (VARCHAR), revenue_u (BIGINT).
    """
    import pyarrow.parquet as pq
    import ray

    from .joins import broadcast_enrich, hash_join

    lo = np.datetime64(start, "us").astype(np.int64)
    hi = np.datetime64(end, "us").astype(np.int64)

    def orders_pred(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(b["o_orderdate"], pa.int64()), pa.int64())
        keep = pc.and_(
            pc.greater_equal(ts, pa.scalar(lo, pa.int64())),
            pc.less(ts, pa.scalar(hi, pa.int64())),
        )
        return b.filter(keep).select(["o_orderkey", "o_custkey"])

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=ts_range_filter("o_orderdate", start, end),
    ).map_batches(orders_pred, batch_format="pyarrow", zero_copy_batch=True)

    def line_pred(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        ext = to_cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc = to_cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "rev": pa.array(ext * (100 - disc), pa.int64()),
            }
        )

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(line_pred, batch_format="pyarrow", zero_copy_batch=True)

    j = hash_join(line, orders, on="l_orderkey", right_on="o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_custkey"]).aggregate([("rev", "sum")])
        return pa.table(
            {
                "custkey": pc.cast(g["o_custkey"], pa.int64()),
                "revenue_u": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("custkey")
        .aggregate(Sum("revenue_u", alias_name="revenue_u"))
    )
    top = agg.sort(["revenue_u", "custkey"], descending=[True, False]).limit(k)
    names = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).rename_columns(["custkey", "c_name"])
    return broadcast_enrich(top, names, key="custkey").select_columns(
        ["custkey", "c_name", "revenue_u"]
    )


def event_type_user_overlap(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Pairwise Jaccard similarity of the USER SETS behind each event type —
    the audience-overlap / set-similarity matrix (which behaviors share
    users?).

    Scale plan: (1) per-block distinct (event_type, user_id) combiner, so
    the one hash exchange moves distinct pairs, not raw events; (2) a
    per-user map_groups emits its type-pair co-occurrence rows PLUS a
    (t, t) self row per type — pair cardinality is #types² per user, tiny
    because the type vocabulary is small (the operator contract; for
    unbounded vocabularies swap in MinHash over user sets); (3) one final
    type-pair groupby over pre-counted partials. Jaccard is a single
    integer÷integer float64 division — deterministic.

    Output (a < b only): type_a, type_b, n_both, n_a, n_b (BIGINTs),
    jaccard (DOUBLE).
    """

    def distinct_block(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type", "user_id"]).aggregate([])
        return g.select(["event_type", "user_id"])

    du = (
        events_ds.map_batches(
            distinct_block, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["event_type", "user_id"])
        .count()
        .select_columns(["event_type", "user_id"])
    )

    def pairs(group: pa.Table) -> pa.Table:
        types = sorted(set(group["event_type"].to_pylist()))
        ta, tb = [], []
        for i, a in enumerate(types):
            for b_ in types[i:]:  # includes the (t, t) self row
                ta.append(a)
                tb.append(b_)
        return pa.table(
            {
                "type_a": pa.array(ta, pa.string()),
                "type_b": pa.array(tb, pa.string()),
                "n": pa.array([1] * len(ta), pa.int64()),
            }
        )

    counts = (
        du.groupby("user_id")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n"))
    )

    # finalize on the driver: the pair matrix is #types² rows — result-sized
    from ..util import collect_table

    t = collect_table(counts)
    singles = {
        a: n
        for a, b, n in zip(
            t["type_a"].to_pylist(), t["type_b"].to_pylist(), t["n"].to_pylist()
        )
        if a == b
    }
    rows = [
        (a, b, n, singles[a], singles[b], n / (singles[a] + singles[b] - n))
        for a, b, n in zip(
            t["type_a"].to_pylist(), t["type_b"].to_pylist(), t["n"].to_pylist()
        )
        if a < b
    ]
    rows.sort()
    return pa.table(
        {
            "type_a": pa.array([r[0] for r in rows], pa.string()),
            "type_b": pa.array([r[1] for r in rows], pa.string()),
            "n_both": pa.array([r[2] for r in rows], pa.int64()),
            "n_a": pa.array([r[3] for r in rows], pa.int64()),
            "n_b": pa.array([r[4] for r in rows], pa.int64()),
            "jaccard": pa.array([r[5] for r in rows], pa.float64()),
        }
    )


def scd2_value_history(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Slowly-changing-dimension (type 2) history build from an event
    stream: each user's value-bearing events become validity intervals
    [valid_from, valid_to) where valid_to is the NEXT event's ts (null on
    the open current row) — the CDC-to-warehouse history shape.

    Per-user map_groups (sort by ts, event_id; one shifted take) — stream
    state never crosses users, so the operator scales with users and is
    skew-bound only by the busiest stream. Values carried as exact cents.

    Output: user_id (BIGINT), value_cents (BIGINT), valid_from,
    valid_to (timestamps, valid_to null on each user's last row).
    """

    def intervals(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        ts = g["ts"].combine_chunks()
        nxt = pa.concat_arrays([ts.slice(1), pa.array([None], ts.type)])
        return pa.table(
            {
                "user_id": pc.cast(g["user_id"], pa.int64()),
                "value_cents": to_cents(g["value"]),
                "valid_from": ts,
                "valid_to": nxt,
            }
        )

    return events_ds.groupby("user_id").map_groups(
        intervals, batch_format="pyarrow"
    )


def concurrent_convs(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset | pa.Table":
    """For every conversation: how many conversations (itself included)
    were ACTIVE at its start instant, where a conversation is active on its
    closed span [min ts, max ts] — the interval-overlap / concurrency-census
    operator (peak-load analysis over streams).

    A naive oracle is the O(n²) interval self-join; the engine runs the
    classic sweep-line instead, distributed in three scale-safe passes:

      1. spans: combiner-first per-conversation MIN/MAX(ts) (the only pass
         over raw turns — everything after is conversation-sized);
      2. each span emits three tagged boundary rows — (s, kind 0, +1) start,
         (s, kind 1, 0) query, (e, kind 2, −1) end — and ONE distributed
         sort by (ts, kind, conv_id) orders them so that at a tied instant
         starts land before queries before ends (closed-span semantics:
         b.s == a.s counts, b.e == a.s still counts);
      3. the global running sum of weights is reconstructed without any
         driver-side row scan by the block-offset technique
         (``windows.ntile_convs``): per-block (first_key, n, weight_sum)
         heads — block-count-sized — prefix-sum on the driver, then a
         second vectorized pass adds offset + in-block cumsum and keeps the
         kind-1 rows.

    Output: conv_id, n_active (BIGINT) — one row per conversation.
    """

    def span_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["conv_id"]).aggregate([("ts", "min"), ("ts", "max")])
        return pa.table(
            {"conv_id": g["conv_id"], "s": g["ts_min"], "e": g["ts_max"]}
        )

    spans = (
        ds_transcripts.map_batches(
            span_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("conv_id")
        .aggregate(Min("s", alias_name="s"), Max("e", alias_name="e"))
    )

    def tag(b: pa.Table) -> pa.Table:
        conv = b["conv_id"].combine_chunks()
        s = b["s"].combine_chunks()
        e = b["e"].combine_chunks()
        n = b.num_rows
        ones = np.ones(n, dtype=np.int64)
        parts = []
        for ts_col, kind, w in ((s, 0, ones), (s, 1, ones * 0), (e, 2, -ones)):
            parts.append(
                pa.table(
                    {
                        "ts": ts_col,
                        "kind": pa.array(np.full(n, kind, dtype=np.int64)),
                        "conv_id": conv,
                        "w": pa.array(w, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    ordered = (
        spans.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["ts", "kind", "conv_id"])
        .materialize()
    )

    def head(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "ts": pa.array([], pa.timestamp("us")),
                    "kind": pa.array([], pa.int64()),
                    "conv_id": pa.array([], pa.string()),
                    "wsum": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "ts": b["ts"][:1],
                "kind": b["kind"][:1],
                "conv_id": b["conv_id"][:1],
                "wsum": pa.array(
                    [int(pc.sum(b["w"]).as_py() or 0)], pa.int64()
                ),
            }
        )

    # batch_size=None ⇒ one batch per BLOCK (offset bookkeeping is keyed by
    # block-first rows)
    heads = ordered.map_batches(
        head, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    heads.sort(key=lambda r: (r["ts"], r["kind"], r["conv_id"]))
    offsets: dict[tuple, int] = {}
    acc = 0
    for r in heads:
        offsets[(r["ts"], r["kind"], r["conv_id"])] = acc
        acc += r["wsum"]

    def running(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "n_active": pa.array([], pa.int64()),
                }
            )
        first = (
            b["ts"][0].as_py(),
            b["kind"][0].as_py(),
            b["conv_id"][0].as_py(),
        )
        w = b["w"].to_numpy(zero_copy_only=False)
        run = offsets[first] + np.cumsum(w)
        keep = b["kind"].to_numpy(zero_copy_only=False) == 1
        return pa.table(
            {
                "conv_id": b["conv_id"].filter(pa.array(keep)),
                "n_active": pa.array(run[keep], pa.int64()),
            }
        )

    return ordered.map_batches(
        running, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _hist_select_ranks(
    events_like_ds: "ray.data.Dataset",
    to_ints,
    ranks: list[int],
    bins: int = 1024,
) -> list[int] | None:
    """EXACT values at several 0-based global ranks of an integer-derived
    column — the multi-quantile generalization of ``_hist_select_median``,
    still WITHOUT a distributed sort.

    All requested ranks share each refinement pass: one ``map_batches``
    histograms every still-active bracket (≤ len(ranks) bincounts per
    block, a few KiB each, combiner-only — no exchange), the driver sums
    them and narrows each rank's bracket independently. Total cost is
    log_bins(range) scans REGARDLESS of how many quantiles are asked for —
    the right trade vs one all-to-all sort when the value column is a thin
    slice of a huge corpus (the deciles of 10^12 rows cost ~4 counting
    passes, not a 10^12-row shuffle).

    Returns the rank values in input order, or None on an empty column.
    """
    from ray.data.aggregate import Count, Max, Min

    def col(batch: pa.Table) -> pa.Table:
        return pa.table({"c": pa.array(to_ints(batch), pa.int64())})

    stats = events_like_ds.map_batches(col, batch_format="pyarrow").aggregate(
        Min("c"), Max("c"), Count()
    )
    if not stats or not stats.get("count()"):
        return None
    glo, ghi = int(stats["min(c)"]), int(stats["max(c)"])
    # per-rank state: [lo, hi, rows_below_lo]
    state = [[glo, ghi, 0] for _ in ranks]

    while any(lo < hi for lo, hi, _ in state):
        brackets = sorted({(lo, hi) for lo, hi, _ in state if lo < hi})
        widths = [max(1, (hi - lo + bins) // bins) for lo, hi in brackets]

        def partial(
            batch: pa.Table, brackets=brackets, widths=widths
        ) -> pa.Table:
            c = to_ints(batch)
            hists = []
            for (lo, hi), width in zip(brackets, widths):
                cc = c[(c >= lo) & (c <= hi)]
                idx = np.minimum((cc - lo) // width, bins - 1)
                hists.append(np.bincount(idx, minlength=bins).astype(np.int64))
            return pa.table(
                {"h": pa.array([np.concatenate(hists).tobytes()], pa.binary())}
            )

        acc = np.zeros(bins * len(brackets), dtype=np.int64)
        for row in events_like_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_rows():
            acc += np.frombuffer(row["h"], dtype=np.int64)

        cums = {
            br: np.cumsum(acc[i * bins : (i + 1) * bins])
            for i, br in enumerate(brackets)
        }
        for k, (lo, hi, below) in enumerate(state):
            if lo >= hi:
                continue
            cum = cums[(lo, hi)]
            width = widths[brackets.index((lo, hi))]
            j = int(np.searchsorted(cum, ranks[k] - below + 1, side="left"))
            if j > 0:
                state[k][2] = below + int(cum[j - 1])
            state[k][0] = lo + j * width
            state[k][1] = min(hi, state[k][0] + width - 1)
    return [lo for lo, _, _ in state]


def value_deciles(events_ds: "ray.data.Dataset") -> pa.Table:
    """EXACT global deciles (d = 1..9) of the integer-cents value domain by
    shared-pass histogram selection (``_hist_select_ranks``) — all nine
    order statistics cost the same ~log_bins(range) combiner-only scans a
    single median does; no sort, no shuffle. Complements the mergeable
    DDSketch (``approx_value_quantiles``) as the exact path.

    Rank convention matches the list_sort oracle: 1-based index
    ceil(d·n/10), i.e. 0-based rank ceil(d·n/10) − 1.

    Output: decile (BIGINT 1..9), value_cents (BIGINT).
    """
    import math

    # NOTE: ray 2.49's bare Count() aggregate returns 0 on single-column
    # datasets; Dataset.count() is the reliable row count
    n = events_ds.count()
    if n == 0:
        return pa.table(
            {
                "decile": pa.array([], pa.int64()),
                "value_cents": pa.array([], pa.int64()),
            }
        )
    ranks = [max(math.ceil(d * n / 10), 1) - 1 for d in range(1, 10)]

    def to_ints(batch: pa.Table) -> np.ndarray:
        return to_cents(batch["value"]).to_numpy(zero_copy_only=False)

    vals = _hist_select_ranks(events_ds, to_ints, ranks)
    return pa.table(
        {
            "decile": pa.array(list(range(1, 10)), pa.int64()),
            "value_cents": pa.array(vals, pa.int64()),
        }
    )


def winsorized_value_stats(
    events_ds: "ray.data.Dataset", p_lo: float = 0.05, p_hi: float = 0.95
) -> "ray.data.Dataset":
    """Winsorized per-type value statistics — every value clipped into the
    EXACT global [p05, p95] band before aggregation (the outlier-robust
    hygiene pass training-data value columns need).

    Two shared histogram-selection passes find both clip bounds (no sort),
    then one combiner-first pass clips vectorized and pre-aggregates per
    event_type; the final groupby moves one row per type per block.

    Output: event_type, n (BIGINT), wsum_cents (BIGINT).
    """
    import math

    n = events_ds.count()
    if n == 0:
        import ray

        return ray.data.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "wsum_cents": pa.array([], pa.int64()),
                }
            )
        )
    ranks = [
        max(math.ceil(p_lo * n), 1) - 1,
        max(math.ceil(p_hi * n), 1) - 1,
    ]

    def to_ints(batch: pa.Table) -> np.ndarray:
        return to_cents(batch["value"]).to_numpy(zero_copy_only=False)

    lo_v, hi_v = _hist_select_ranks(events_ds, to_ints, ranks)

    def partial(batch: pa.Table) -> pa.Table:
        c = np.clip(to_ints(batch), lo_v, hi_v)
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "w": pa.array(c, pa.int64()),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("w", "count"), ("w", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": pc.cast(g["w_count"], pa.int64()),
                "wsum_cents": pc.cast(g["w_sum"], pa.int64()),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"), Sum("wsum_cents", alias_name="wsum_cents")
        )
    )


def median_value_per_type(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """EXACT lower median of value-cents PER event_type — the grouped
    order-statistic (group cardinality is small; each group's median is a
    single ``np.partition`` selection inside ``map_groups``, so the only
    exchange is the groupby hash shuffle of (type, cents) pairs).

    For huge single groups, swap the kernel for ``_hist_select_ranks``
    filtered to the group — same contract, no per-group materialization.

    Output: event_type, median_cents (BIGINT).
    """

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": batch["event_type"], "c": to_cents(batch["value"])}
        )

    def med(group: pa.Table) -> pa.Table:
        c = group["c"].to_numpy(zero_copy_only=False)
        k = (len(c) - 1) // 2  # 0-based lower median
        v = int(np.partition(c, k)[k])
        return pa.table(
            {
                "event_type": pa.array(
                    [group["event_type"][0].as_py()], pa.string()
                ),
                "median_cents": pa.array([v], pa.int64()),
            }
        )

    return (
        events_ds.map_batches(slim, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(med, batch_format="pyarrow")
    )


def wau_by_week(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Weekly active users — distinct user count per ISO week (the
    retention-adjacent engagement series the weekly tier feeds).

    Per-block distinct (week, user) combiner shrinks the exchange to
    active cells; the final distinct + count is one groupby.

    Output: week_start (timestamp), wau (BIGINT).
    """
    from ray.data.aggregate import Count

    def distinct_block(b: pa.Table) -> pa.Table:
        w = pc.cast(pc.floor_temporal(b["ts"], unit="week"), pa.timestamp("us"))
        t = pa.table(
            {"week_start": w, "user_id": pc.cast(b["user_id"], pa.int64())}
        )
        return t.group_by(["week_start", "user_id"]).aggregate([])

    distinct = (
        events_ds.map_batches(
            distinct_block, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["week_start", "user_id"])
        .count()
    )

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["week_start"]).aggregate([("user_id", "count")])
        return pa.table(
            {
                "week_start": g["week_start"],
                "wau": pc.cast(g["user_id_count"], pa.int64()),
            }
        )

    return (
        distinct.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("week_start")
        .aggregate(Sum("wau", alias_name="wau"))
    )


def doc_len_histogram(
    docs_ds: "ray.data.Dataset", bucket_chars: int = 100
) -> "ray.data.Dataset":
    """Document-length histogram per source — equi-width integer buckets
    (``len // bucket_chars``), the corpus-profiling pass any training-data
    intake runs first. Combiner-first: per-block (source, bucket) counts,
    one vocabulary-sized final groupby.

    Output: source, bucket (BIGINT), n (BIGINT).
    """

    def partial(b: pa.Table) -> pa.Table:
        ln = pc.cast(pc.utf8_length(b["text"]), pa.int64())
        bucket = pc.divide(ln, pa.scalar(bucket_chars, pa.int64()))
        t = pa.table({"source": b["source"], "bucket": bucket})
        g = t.group_by(["source", "bucket"]).aggregate([("bucket", "count")])
        return pa.table(
            {
                "source": g["source"],
                "bucket": g["bucket"],
                "n": pc.cast(g["bucket_count"], pa.int64()),
            }
        )

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
    )


def tier_consistency_check(
    ds_normalized: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """Continuous-aggregate INVARIANT audit: the cascaded 1h tier
    (1m → 1h) must equal the 1h rollup computed directly from raw turns —
    per (conv_id, window_start), every metric. Emits the violating keys;
    a healthy engine returns ZERO rows (PyReshaper's reshapertests
    equivalence idea turned into a first-class distributed operator).

    Runs as a signed union: cascade rows carry weight +1, direct rows −1,
    one groupby sums every metric — a mismatch leaves a nonzero residue.
    No join, no driver compare; the exchange moves two tier-sized inputs.

    Output: conv_id, window_start — EMPTY on a consistent engine.
    """
    from .rollup import cascade, rollup_1m, rollup_block

    casc = cascade(rollup_1m(ds_normalized), "1h")

    def hourly_direct(b: pa.Table) -> pa.Table:
        h = pc.floor_temporal(b["ts"], unit="hour")
        return rollup_block(b.append_column("w1h", h), "w1h")

    from ..util import hash_partitioned_agg

    # tier-sized outputs (~10^5 (conv, hour) groups at sf0.1): the built-in
    # groupby reduce pays ~70 µs/group of Python — hash-partitioned Arrow
    # group_by instead (exact: integer Sum/Min/Max are associative)
    direct = hash_partitioned_agg(
        ds_normalized.map_batches(
            hourly_direct, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["conv_id", "window_start"],
        aggs=[
            ("turn_count", "sum", "turn_count"),
            ("char_sum", "sum", "char_sum"),
            ("char_min", "min", "char_min"),
            ("char_max", "max", "char_max"),
            ("tok_est_sum", "sum", "tok_est_sum"),
            ("tool_calls", "sum", "tool_calls"),
        ],
    )

    metric_cols = [
        "turn_count",
        "char_sum",
        "char_min",
        "char_max",
        "tok_est_sum",
        "tool_calls",
    ]

    def signed(sign: int):
        def fn(b: pa.Table) -> pa.Table:
            cols = {
                "conv_id": b["conv_id"],
                "window_start": b["window_start"],
            }
            for c in metric_cols:
                v = pc.cast(b[c], pa.int64())
                cols[c] = pc.multiply(v, pa.scalar(sign, pa.int64()))
            return pa.table(cols)

        return fn

    both = casc.map_batches(signed(1), batch_format="pyarrow").union(
        direct.map_batches(signed(-1), batch_format="pyarrow")
    )
    residue = hash_partitioned_agg(
        both,
        keys=["conv_id", "window_start"],
        aggs=[(c, "sum", c) for c in metric_cols],
    )

    def violations(b: pa.Table) -> pa.Table:
        bad = np.zeros(b.num_rows, dtype=bool)
        for c in metric_cols:
            bad |= b[c].to_numpy(zero_copy_only=False) != 0
        keep = pa.array(bad)
        return pa.table(
            {
                "conv_id": b["conv_id"].filter(keep),
                "window_start": b["window_start"].filter(keep),
            }
        )

    return residue.map_batches(
        violations, batch_format="pyarrow", zero_copy_batch=True
    )


def referential_orphans(
    child_ds: "ray.data.Dataset",
    parent_ds: "ray.data.Dataset",
    on: str,
    right_on: str,
) -> pa.Table:
    """Referential-integrity audit: COUNT of child rows whose key has no
    parent (the FK orphan scan every warehouse intake runs). The anti-join
    exchange moves only key columns; the count is combiner-reduced.

    Output: one row, n_orphans (BIGINT).
    """
    from .joins import anti_join

    orphans = anti_join(
        child_ds.select_columns([on]),
        parent_ds.select_columns([right_on]),
        on=on,
        right_on=right_on,
    )
    return pa.table({"n_orphans": pa.array([orphans.count()], pa.int64())})


def calendarize_spans(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Split each conversation's active span across the calendar days it
    touches, attributing microseconds per day — the calendarization /
    proration operator (billing, capacity, SLA attribution).

    Spans reduce combiner-first (per-conversation MIN/MAX over raw turns);
    the day-splitting kernel is vectorized with ``np.repeat`` over per-span
    day counts — no per-day Python loop — and runs in plain map_batches
    (each span expands independently; no grouping needed after the span
    reduce). Integer-microsecond arithmetic end to end.

    Output: conv_id, day (timestamp, midnight), active_us (BIGINT; a
    point span contributes one day with 0).
    """
    DAY_US = 86_400_000_000

    def span_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["conv_id"]).aggregate([("ts", "min"), ("ts", "max")])
        return pa.table(
            {"conv_id": g["conv_id"], "s": g["ts_min"], "e": g["ts_max"]}
        )

    spans = (
        ds_transcripts.map_batches(
            span_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("conv_id")
        .aggregate(Min("s", alias_name="s"), Max("e", alias_name="e"))
    )

    def split(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        e = b["e"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        d0 = (s // DAY_US) * DAY_US
        d1 = (e // DAY_US) * DAY_US
        n_days = ((d1 - d0) // DAY_US + 1).astype(np.int64)
        total = int(n_days.sum())
        conv_idx = np.repeat(np.arange(len(s)), n_days)
        # offset of each emitted day within its span: 0..n_days-1
        day_off = np.arange(total) - np.repeat(
            np.cumsum(n_days) - n_days, n_days
        )
        day = d0[conv_idx] + day_off * DAY_US
        lo = np.maximum(s[conv_idx], day)
        hi = np.minimum(e[conv_idx], day + DAY_US)
        conv = b["conv_id"].combine_chunks() if isinstance(
            b["conv_id"], pa.ChunkedArray
        ) else b["conv_id"]
        return pa.table(
            {
                "conv_id": conv.take(pa.array(conv_idx, pa.int64())),
                "day": pa.array(day, pa.timestamp("us")),
                "active_us": pa.array(hi - lo, pa.int64()),
            }
        )

    return spans.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)


def cusum_shift_users(
    events_ds: "ray.data.Dataset", k_cents: int = 0, h_cents: int = 50_000
) -> "ray.data.Dataset":
    """One-sided CUSUM level-shift detector per user value stream:
    s_i = max(0, s_{i-1} + (x_i − median_ref − k)), alarm when s_i > h.
    The classic sequential change-point test, run per stream with the
    user's own first-half median as the reference level (self-calibrating,
    deterministic, integer cents end-to-end).

    Recursive state is stream-local → groupby(user).map_groups, the same
    partitioning rule as every stateful stream operator. The recursion
    VECTORIZES via the prefix-min identity
    s_i = c_i − min(0, min_{j≤i} c_j) with c = cumsum(x − ref − k), so the
    kernel is cumsum + minimum.accumulate — no per-element Python. No SQL
    analog (recursive max) → rows-only driver check; pytest plants a shift
    and cross-checks the identity against the textbook recursion.

    Output: user_id (BIGINT), alarm_idx (BIGINT, 0-based event index of the
    first alarm, -1 if none), max_cusum (BIGINT).
    """

    def kernel(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        x = to_cents(g["value"]).to_numpy(zero_copy_only=False)
        half = x[: max(1, len(x) // 2)]
        kth = (len(half) - 1) // 2
        ref = int(np.partition(half, kth)[kth])  # first-half lower median
        c = np.cumsum(x - ref - k_cents)
        s = c - np.minimum(np.minimum.accumulate(c), 0)
        over = s > h_cents
        alarm = int(np.argmax(over)) if over.any() else -1
        return pa.table(
            {
                "user_id": pa.array([int(g["user_id"][0].as_py())], pa.int64()),
                "alarm_idx": pa.array([alarm], pa.int64()),
                "max_cusum": pa.array([int(s.max()) if len(s) else 0], pa.int64()),
            }
        )

    return events_ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow")


def daily_dashboard(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """The daily ops dashboard cell: per (day, event_type) — event count,
    exact cents volume, and DISTINCT user count, in one operator.

    Additive measures reduce combiner-first; the distinct-user measure runs
    its own per-block-distinct → global-distinct → count pipeline (distinct
    is NOT additive, so it cannot share the first combiner); the two
    result-sized cell tables meet in one zero-padded UNION + cell-keyed
    groupby-sum — cheaper than a hash join and immune to Ray 2.49's
    empty-block join crash on degenerate (e.g. fully filtered) inputs.

    Output: day (timestamp), event_type, n_events, value_cents, n_users
    (BIGINTs).
    """

    def add_parts(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(b["ts"], unit="day"), pa.timestamp("us"))
        t = pa.table(
            {
                "day": day,
                "event_type": b["event_type"],
                "c": to_cents(b["value"]),
            }
        )
        g = t.group_by(["day", "event_type"]).aggregate(
            [("c", "count"), ("c", "sum")]
        )
        return pa.table(
            {
                "day": g["day"],
                "event_type": g["event_type"],
                "n_events": pc.cast(g["c_count"], pa.int64()),
                "value_cents": pc.cast(g["c_sum"], pa.int64()),
            }
        )

    adds = (
        events_ds.map_batches(add_parts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "event_type"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )

    def distinct_block(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(b["ts"], unit="day"), pa.timestamp("us"))
        t = pa.table(
            {
                "day": day,
                "event_type": b["event_type"],
                "user_id": pc.cast(b["user_id"], pa.int64()),
            }
        )
        return t.group_by(["day", "event_type", "user_id"]).aggregate([])

    cells = (
        events_ds.map_batches(
            distinct_block, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["day", "event_type", "user_id"])
        .count()
    )

    def count_users(b: pa.Table) -> pa.Table:
        g = b.group_by(["day", "event_type"]).aggregate([("user_id", "count")])
        return pa.table(
            {
                "day": g["day"],
                "event_type": g["event_type"],
                "n_users": pc.cast(g["user_id_count"], pa.int64()),
            }
        )

    users = (
        cells.map_batches(count_users, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "event_type"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )

    def pad_adds(b: pa.Table) -> pa.Table:
        zero = pa.array(np.zeros(b.num_rows, dtype=np.int64))
        return b.select(
            ["day", "event_type", "n_events", "value_cents"]
        ).append_column("n_users", zero)

    def pad_users(b: pa.Table) -> pa.Table:
        zero = pa.array(np.zeros(b.num_rows, dtype=np.int64))
        return pa.table(
            {
                "day": b["day"],
                "event_type": b["event_type"],
                "n_events": zero,
                "value_cents": zero,
                "n_users": pc.cast(b["n_users"], pa.int64()),
            }
        )

    both = adds.map_batches(pad_adds, batch_format="pyarrow").union(
        users.map_batches(pad_users, batch_format="pyarrow")
    )
    return both.groupby(["day", "event_type"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("value_cents", alias_name="value_cents"),
        Sum("n_users", alias_name="n_users"),
    )


def wau_retention(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Week-over-week retention: per week — active users, how many of them
    are also active the NEXT week, and the retained share in integer ppm
    (the engagement metric the weekly retention tier exists to feed).

    Distinct (week, user) cells reduce combiner-first; each user's sorted
    week set answers its own retention lookups inside one map_groups (a
    ``np.isin`` against the user's own weeks — stream-local, no self-join
    exchange); the final per-week groupby is calendar-sized.

    Output: week_start (timestamp), wau, retained, ret_ppm (BIGINTs).
    """
    WEEK_US = 604_800_000_000

    def distinct_block(b: pa.Table) -> pa.Table:
        w = pc.cast(pc.floor_temporal(b["ts"], unit="week"), pa.timestamp("us"))
        t = pa.table(
            {"user_id": pc.cast(b["user_id"], pa.int64()), "w": w}
        )
        return t.group_by(["user_id", "w"]).aggregate([])

    cells = (
        events_ds.map_batches(
            distinct_block, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["user_id", "w"])
        .count()
    )

    def per_user(group: pa.Table) -> pa.Table:
        w = np.unique(
            group["w"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        ret = np.isin(w + WEEK_US, w).astype(np.int64)
        return pa.table(
            {
                "week_start": pa.array(w, pa.timestamp("us")),
                "one": pa.array(np.ones(len(w), dtype=np.int64)),
                "ret": pa.array(ret, pa.int64()),
            }
        )

    per_week = (
        cells.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("week_start")
        .aggregate(
            Sum("one", alias_name="wau"), Sum("ret", alias_name="retained")
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        wau = b["wau"].to_numpy(zero_copy_only=False)
        ret = b["retained"].to_numpy(zero_copy_only=False)
        ppm = ret * 1_000_000 // np.maximum(wau, 1)
        return pa.table(
            {
                "week_start": b["week_start"],
                "wau": b["wau"],
                "retained": b["retained"],
                "ret_ppm": pa.array(ppm, pa.int64()),
            }
        )

    return per_week.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def ship_latency_by_priority(sf_dir: str) -> "ray.data.Dataset":
    """Order-to-ship latency profile per order priority — exact integer-day
    sums so AVG derives at read time. One large-large hash join (both sides
    column-pruned), per-priority combiner after it.

    Output: o_orderpriority, n_lines, sum_days, max_days (BIGINTs).
    """
    import ray

    from .joins import hash_join

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    j = hash_join(line, orders, on="l_orderkey", right_on="o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        order = b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        t = pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "days": pa.array(ship - order, pa.int64()),
            }
        )
        g = t.group_by(["o_orderpriority"]).aggregate(
            [("days", "count"), ("days", "sum"), ("days", "max")]
        )
        return pa.table(
            {
                "o_orderpriority": g["o_orderpriority"],
                "n_lines": pc.cast(g["days_count"], pa.int64()),
                "sum_days": pc.cast(g["days_sum"], pa.int64()),
                "max_days": pc.cast(g["days_max"], pa.int64()),
            }
        )

    return (
        j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_lines", alias_name="n_lines"),
            Sum("sum_days", alias_name="sum_days"),
            Max("max_days", alias_name="max_days"),
        )
    )


def benford_first_digit(orders_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Benford first-digit census over order totals (integer cents) — the
    classic fraud/data-quality screen. The digit extracts EXACTLY via
    decimal string slicing (no float log near power-of-ten boundaries);
    per-block 9-bucket combiner, digit-sized final groupby.

    Output: digit (BIGINT 1..9), n (BIGINT).
    """

    def partial(b: pa.Table) -> pa.Table:
        c = to_cents(b["o_totalprice"])
        d = pc.cast(
            pc.utf8_slice_codeunits(pc.cast(c, pa.string()), 0, 1), pa.int64()
        )
        g = pa.table({"digit": d}).group_by(["digit"]).aggregate(
            [("digit", "count")]
        )
        return pa.table(
            {
                "digit": g["digit"],
                "n": pc.cast(g["digit_count"], pa.int64()),
            }
        )

    return (
        orders_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
    )


def skew_census(
    events_ds: "ray.data.Dataset", key_col: str = "user_id"
) -> pa.Table:
    """Key-skew profile of a column: total rows, distinct keys, and the
    hottest key's row count/share (integer ppm) — the census that decides
    whether a downstream exchange needs salting (the engine's
    salt_threshold / skew-join hot-key machinery consumes exactly this
    signal; here it is exposed as a first-class profiling operator).

    Per-block (key, count) combiner → one key-keyed groupby → a
    three-number driver finalize over the key-count table (distinct-key
    sized, never row sized).

    Output: one row — n_rows, n_distinct, top1_n, top1_share_ppm (BIGINTs).
    """
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Sum as _Sum

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by([key_col]).aggregate([(key_col, "count")])
        return pa.table(
            {
                "k": g[key_col],
                "n": pc.cast(g[f"{key_col}_count"], pa.int64()),
            }
        )

    counts = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(_Sum("n", alias_name="n"))
    )
    n_distinct = counts.count()
    agg = counts.aggregate(_Sum("n"), _Max("n"))
    n_rows = int(agg["sum(n)"] or 0) if agg else 0
    top1 = int(agg["max(n)"] or 0) if agg else 0
    return pa.table(
        {
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_distinct": pa.array([n_distinct], pa.int64()),
            "top1_n": pa.array([top1], pa.int64()),
            "top1_share_ppm": pa.array(
                [top1 * 1_000_000 // max(n_rows, 1)], pa.int64()
            ),
        }
    )


def q5_local_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    start: str = "1996-01-01",
    end: str = "1997-01-01",
) -> "ray.data.Dataset":
    """TPC-H Q5 shape: per-nation revenue from lineitems whose CUSTOMER and
    SUPPLIER sit in the same nation, nation inside ``region``, order date in
    [``start``, ``end``).

    Scale plan: the ONLY large-large exchange is lineitem ⋈ orders on
    orderkey, with both fact sides filter-pruned first (orders by the date
    window; lineitem down to 3 fixed-width columns).  The three dimension
    hops (custkey→nation, suppkey→nation, nation∈region) never shuffle:
    customer and supplier key→nationkey maps are broadcast once via
    ``ray.put`` as SORTED int64 arrays and resolved per batch with
    ``np.searchsorted`` (two binary-search gathers per batch, no Python
    rows); the region's nation set is a tiny in-closure mask.  The same-
    nation predicate then reduces each joined batch to (nationkey, rev)
    partials, so the final groupby moves ≤ |nations| rows per block.
    Revenue is exact integer units cents × (100 − discount%), the
    bit-exact-under-any-combine-order rule every money path here uses.

    Output: n_name (VARCHAR), revenue_u (BIGINT), ordered revenue desc.
    """
    import pyarrow.parquet as pq
    import ray

    from .joins import hash_join

    lo = np.datetime64(start, "us").astype(np.int64)
    hi = np.datetime64(end, "us").astype(np.int64)

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    reg_key = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"]
    nat = nat.filter(pc.is_in(nat["n_regionkey"], value_set=reg_key.combine_chunks()))
    nation_keys = np.sort(nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64))
    nation_names = {
        int(k): v
        for k, v in zip(
            nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()
        )
    }

    def _sorted_lut(path: str, key: str, val: str) -> "ray.ObjectRef":
        t = pq.read_table(path, columns=[key, val])
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[val].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        return ray.put((k[order], v[order]))

    cust_ref = _sorted_lut(f"{sf_dir}/customer.parquet", "c_custkey", "c_nationkey")
    supp_ref = _sorted_lut(f"{sf_dir}/supplier.parquet", "s_suppkey", "s_nationkey")

    def orders_pred(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["o_orderdate"], pa.int64())
        keep = pc.and_(
            pc.greater_equal(ts, pa.scalar(lo, pa.int64())),
            pc.less(ts, pa.scalar(hi, pa.int64())),
        )
        return pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
            }
        ).filter(keep)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=ts_range_filter("o_orderdate", start, end),
    ).map_batches(orders_pred, batch_format="pyarrow", zero_copy_batch=True)

    def line_pred(b: pa.Table) -> pa.Table:
        ext = to_cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc = to_cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "l_suppkey": pc.cast(b["l_suppkey"], pa.int64()),
                "rev": pa.array(ext * (100 - disc), pa.int64()),
            }
        )

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_pred, batch_format="pyarrow", zero_copy_batch=True)

    j = hash_join(line, orders, on="l_orderkey", right_on="o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        from ..util import cached_get

        if b.num_rows == 0:
            return pa.table(
                {"nationkey": pa.array([], pa.int64()), "revenue_u": pa.array([], pa.int64())}
            )
        ck, cn = cached_get(cust_ref)
        sk, sn = cached_get(supp_ref)
        cust = b["o_custkey"].to_numpy(zero_copy_only=False)
        supp = b["l_suppkey"].to_numpy(zero_copy_only=False)
        cnat = cn[np.searchsorted(ck, cust)]
        snat = sn[np.searchsorted(sk, supp)]
        keep = (cnat == snat) & np.isin(cnat, nation_keys)
        t = pa.table(
            {
                "nationkey": pa.array(cnat[keep], pa.int64()),
                "rev": pa.array(
                    b["rev"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
            }
        )
        g = t.group_by(["nationkey"]).aggregate([("rev", "sum")])
        return pa.table(
            {
                "nationkey": g["nationkey"],
                "revenue_u": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("nationkey")
        .aggregate(Sum("revenue_u", alias_name="revenue_u"))
    )

    def name_it(b: pa.Table) -> pa.Table:
        names = [
            nation_names[int(k)] for k in b["nationkey"].to_pylist()
        ]  # ≤ |nations| rows — result-sized
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "revenue_u": pc.cast(b["revenue_u"], pa.int64()),
            }
        )

    return agg.map_batches(name_it, batch_format="pyarrow").sort(
        ["revenue_u", "n_name"], descending=[True, False]
    )


def q18_large_volume_customers(
    sf_dir: str, qty_threshold: int = 250, k: int = 100
) -> "ray.data.Dataset":
    """TPC-H Q18 shape: top-``k`` orders whose total lineitem quantity
    exceeds ``qty_threshold``, with their customer names.

    Scale plan: lineitem pre-reduces per orderkey inside map_batches
    (combiner), so the one groupby exchange moves ≤ one row per orderkey
    per block; the HAVING filter then shrinks the survivor set to
    result-size.  Orders attach via a hash join on the (already tiny)
    survivor side; the customer name attaches via a broadcast dim lookup
    AFTER the top-k, so only ``k`` rows are enriched.  Quantities and
    totalprice carry as exact integer hundredths (qty_u = qty×100).

    Output: c_custkey, c_name, o_orderkey, o_orderdate, totalprice_u,
    sum_qty_u — ordered totalprice_u desc, o_orderkey asc, limit ``k``.
    """
    import pyarrow.parquet as pq
    import ray

    from .joins import broadcast_enrich, hash_join

    thr_u = int(qty_threshold) * 100

    def line_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "qty_u": to_cents(b["l_quantity"]),
            }
        )
        g = t.group_by(["l_orderkey"]).aggregate([("qty_u", "sum")])
        return pa.table(
            {"l_orderkey": g["l_orderkey"], "qty_u": pc.cast(g["qty_u_sum"], pa.int64())}
        )

    per_order = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
        )
        .map_batches(line_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("qty_u", alias_name="sum_qty_u"))
        .filter(expr=f"sum_qty_u > {thr_u}")
    )

    def orders_prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "o_orderdate": b["o_orderdate"],
                "totalprice_u": to_cents(b["o_totalprice"]),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(orders_prep, batch_format="pyarrow", zero_copy_batch=True)

    j = hash_join(per_order, orders, on="l_orderkey", right_on="o_orderkey")
    top = j.sort(
        ["totalprice_u", "l_orderkey"], descending=[True, False]
    ).limit(k)

    names = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).rename_columns(["o_custkey", "c_name"])
    out = broadcast_enrich(top, names, key="o_custkey")

    def shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "c_name": b["c_name"],
                "o_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "o_orderdate": b["o_orderdate"],
                "totalprice_u": pc.cast(b["totalprice_u"], pa.int64()),
                "sum_qty_u": pc.cast(b["sum_qty_u"], pa.int64()),
            }
        )

    return out.map_batches(shape, batch_format="pyarrow")


def role_simpson_per_conv(ds_transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Role-diversity (Simpson concentration) components per conversation:
    n_turns = Σc and sum_c2 = Σc² over the conversation's per-role turn
    counts c. Simpson's diversity index is 1 − sum_c2/n_turns² — the caller
    derives the float; the engine ships only EXACT int64 components so the
    oracle matches bit-for-bit (same convention as ``corr_components``).

    Shape: per-block Arrow ``group_by(conv_id, role)`` partials (block
    reduces to its distinct pairs), one ``groupby(conv_id, role)`` exchange
    over the pre-reduced rows for exact per-pair counts, square in a
    map_batches, then a second pre-reduced ``groupby(conv_id)`` for the
    components — both exchanges move (conv × role)-domain rows, never turns.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"conv_id": batch["conv_id"], "role": batch["role"]})
            .group_by(["conv_id", "role"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "role": g["role"],
                "c": pc.cast(g["count_all"], pa.int64()),
            }
        )

    pair_counts = (
        ds_transcripts.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["conv_id", "role"])
        .sum("c")
    )

    def square(batch: pa.Table) -> pa.Table:
        c = batch["sum(c)"]
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "c": c,
                "c2": pc.multiply_checked(c, c),
            }
        )

    return (
        pair_counts.map_batches(square, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Sum("c", alias_name="n_turns"), Sum("c2", alias_name="sum_c2"))
    )


def theil_sen_daily_trend(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-user Theil–Sen robust activity trend: the (lower-)median of all
    pairwise slopes over the user's (day, daily event count) points, in
    integer parts-per-million events/day.

    Robust-regression counterpart to ``conv_trend_components`` (least
    squares): the median slope ignores up to ~29% outlier days. Exchanges
    are combiner-first (per-block (user, day) count partials, one
    pre-reduced ``groupby(user, day)``), then the O(days²) pair scan runs
    per user inside ``groupby(user).map_groups`` — days-per-user is bounded
    by the corpus span, never by event volume, so the kernel is ~span²/2
    int ops per user at any scale.

    Determinism/oracle contract: pairs (b.n − a.n, Δdays) over day-ordered
    points; total order (float slope, num, den); the lower median is rank
    ⌈cnt/2⌉ (1-based); slope_ppm = floor(1e6·num/den) evaluated in float64
    exactly as the SQL restatement. Users with a single active day are
    omitted (no pairs).
    """

    def partial(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch["ts"], unit="day")
        g = (
            pa.table({"user_id": batch["user_id"], "day": d})
            .group_by(["user_id", "day"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "day": g["day"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    daily = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "day"])
        .sum("n")
    )

    def per_user(group: pa.Table) -> pa.Table:
        import math

        uid = group["user_id"][0].as_py()
        idx = pc.sort_indices(group, sort_keys=[("day", "ascending")])
        g = group.take(idx)
        days = (
            g["day"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        )
        n = g["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(days)
        if k < 2:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_days": pa.array([], pa.int64()),
                    "slope_ppm": pa.array([], pa.int64()),
                }
            )
        iu, ju = np.triu_indices(k, 1)
        num = n[ju] - n[iu]
        den = days[ju] - days[iu]
        val = num.astype(np.float64) / den
        order = np.lexsort((den, num, val))
        mid = order[(len(order) - 1) // 2]  # lower median, rank ceil(cnt/2)
        slope_ppm = math.floor(1_000_000.0 * float(num[mid]) / float(den[mid]))
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_days": pa.array([k], pa.int64()),
                "slope_ppm": pa.array([slope_ppm], pa.int64()),
            }
        )

    return daily.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def bounce_rate_daily(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Daily bounce census: per day, the number of active users and how many
    of them produced exactly ONE event that day (the classic bounce-rate
    numerator/denominator, shipped as exact counts — the caller derives the
    rate).

    Combiner-first twice over pre-reduced rows: per-block (day, user)
    partial counts, one ``groupby(day, user)`` exchange for exact per-pair
    counts (user×day domain, never events), then a per-day aggregate of
    (1, n==1) flags — so no exchange moves event-sized data.
    """

    def partial(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch["ts"], unit="day")
        g = (
            pa.table({"day": d, "user_id": batch["user_id"]})
            .group_by(["day", "user_id"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "day": g["day"],
                "user_id": g["user_id"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    per_user_day = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "user_id"])
        .sum("n")
    )

    def flags(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": batch["day"],
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
                "bounce": pc.cast(
                    pc.equal(batch["sum(n)"], pa.scalar(1, pa.int64())), pa.int64()
                ),
            }
        )

    return (
        per_user_day.map_batches(flags, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("one", alias_name="n_users"), Sum("bounce", alias_name="n_bounce"))
    )


def q4_late_ship_priority(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q4 shape (order-priority checking) adapted to this corpus'
    lineitem (no commit/receipt dates): count Q1-1996 orders per priority
    having ANY lineitem shipped more than 90 days after the order date —
    the correlated-EXISTS query.

    Decorrelated Ray-Data-first: the EXISTS collapses to a combiner-first
    ``groupby(l_orderkey).max(l_shipdate)`` (exchange is orderkey-domain,
    one row per order, never lineitem-sized), hash-joined key-to-key with
    the date-pruned orders slice, filtered, then a tiny priority count.
    """
    import ray

    from .joins import hash_join

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1996-04-01", "us")

    def prune(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"]
        mask = pc.and_(
            pc.greater_equal(d, pa.scalar(lo.item(), pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi.item(), pa.timestamp("us"))),
        )
        return batch.filter(mask)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=ts_range_filter("o_orderdate", "1996-01-01", "1996-04-01"),
    ).map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    from ..util import hash_partitioned_agg

    def ship_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey"]).aggregate([("l_shipdate", "max")])
        return pa.table(
            {"l_orderkey": g["l_orderkey"], "max_ship": g["l_shipdate_max"]}
        )

    # per-block Arrow max partial, then hash-partitioned merge: the output
    # is orderkey-domain (~10^5 groups at sf0.1) where the built-in reduce
    # pays ~70 µs/group of Python
    # NOTE deliberately no date pushdown here: the lateness test needs the
    # TRUE max ship date per order — pruning l_shipdate would change the max
    max_ship = hash_partitioned_agg(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        ).map_batches(ship_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_orderkey"],
        aggs=[("max_ship", "max", "max_ship")],
    )
    joined = hash_join(
        orders, max_ship, on=("o_orderkey",), right_on=("l_orderkey",)
    )

    def late_flags(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        ms = batch["max_ship"].to_numpy(zero_copy_only=False)
        late = (ms - od) > np.timedelta64(90, "D")
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    np.asarray(batch["o_orderpriority"])[late]
                ),
                "one": pa.array(np.ones(int(late.sum()), np.int64)),
            }
        )

    return (
        joined.map_batches(late_flags, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("one", alias_name="order_count"))
    )


def q19_brand_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q19 shape (discounted revenue, disjunctive part/lineitem
    predicates): revenue in exact cents over lineitems whose part matches
    one of three (brand, size-range, quantity-range) arms.

    Ray-Data-first: the PART side is dimension-sized — the matching
    (p_partkey → arm) map is built combiner-first (per-block predicate
    filter reduces each block to its matching keys) and BROADCAST via
    ``ray.put``; lineitem then probes the map inside ``map_batches`` with
    ``pc.is_in`` — no all-to-all exchange at all, the canonical
    broadcast-join shape for dim⋈fact. Revenue is Σ round(price·100) ·
    (100 − round(disc·100)) in integer 10⁻⁴ currency units (exact under
    any block order); the SQL oracle restates the same integer domain.
    """
    import ray

    ARMS = (  # (brand, size_lo, size_hi, qty_lo, qty_hi)
        ("Brand#12", 1, 10, 1, 11),
        ("Brand#23", 1, 15, 10, 20),
        ("Brand#34", 1, 25, 20, 30),
    )

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )

    def match_keys(batch: pa.Table) -> pa.Table:
        keys, arms = [], []
        for arm_id, (brand, slo, shi, _, _) in enumerate(ARMS):
            m = pc.and_(
                pc.equal(batch["p_brand"], brand),
                pc.and_(
                    pc.greater_equal(batch["p_size"], slo),
                    pc.less_equal(batch["p_size"], shi),
                ),
            )
            k = batch["p_partkey"].filter(m)
            if isinstance(k, pa.ChunkedArray):
                k = k.combine_chunks()
            keys.append(pc.cast(k, pa.int64()))
            arms.append(pa.array(np.full(len(k), arm_id, np.int8())))
        return pa.table(
            {
                "p_partkey": pa.concat_arrays(keys),
                "arm": pa.concat_arrays(arms),
            }
        )

    from ..util import collect_table

    pm = collect_table(
        parts.map_batches(match_keys, batch_format="pyarrow", zero_copy_batch=True)
    )  # dimension-sized: one row per matching part
    key_np = pm["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    arm_np = pm["arm"].to_numpy(zero_copy_only=False).astype(np.int8)
    order = np.argsort(key_np)
    lut_ref = ray.put((key_np[order], arm_np[order]))
    qty_bounds = np.array([(a[3], a[4]) for a in ARMS], np.int64)

    def probe(batch: pa.Table) -> pa.Table:
        keys, arms = ray.get(lut_ref)
        lk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, lk)
        pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
        found = (keys[pos_c] == lk) if len(keys) else np.zeros(len(lk), bool)
        arm = np.where(found, arms[pos_c] if len(arms) else -1, -1).astype(np.int64)
        qty = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        in_qty = np.zeros(len(lk), bool)
        valid = arm >= 0
        in_qty[valid] = (qty[valid] >= qty_bounds[arm[valid], 0]) & (
            qty[valid] <= qty_bounds[arm[valid], 1]
        )
        sel = valid & in_qty
        price_c = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        disc_c = np.rint(
            batch["l_discount"].to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        rev = int((price_c * (100 - disc_c)).sum())
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "revenue_e4": pa.array([rev], pa.int64()),
                "n_items": pa.array([int(sel.sum())], pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    agg = (
        li.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(
            Sum("revenue_e4", alias_name="revenue_e4"),
            Sum("n_items", alias_name="n_items"),
        )
    )
    return agg.select_columns(["revenue_e4", "n_items"])


def encode_categorical(
    ds: "ray.data.Dataset", col: str, keep: tuple[str, ...]
) -> "ray.data.Dataset":
    """Global categorical feature encoder: build the corpus-wide sorted
    vocabulary of ``col`` (combiner-first per-block distinct → one
    domain-sized groupby), BROADCAST it once via ``ray.put``, and map every
    row to its dense 0-based id with vectorized ``pc.index_in`` — the
    dictionary-encode stage every feature pipeline runs before training.
    ids are assigned in lexicographic order (== DENSE_RANK − 1), so the
    SQL oracle restates it exactly.
    """
    import ray

    from ..util import collect_table

    def distinct_block(batch: pa.Table) -> pa.Table:
        g = pa.table({col: batch[col]}).group_by([col]).aggregate([])
        return g

    vocab_t = collect_table(
        ds.map_batches(distinct_block, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(col)
        .count()
    )
    vocab = pa.array(sorted(vocab_t[col].to_pylist()), pa.string())
    ref = ray.put(vocab)

    def encode(batch: pa.Table) -> pa.Table:
        import ray as _ray

        v = _ray.get(ref)
        ids = pc.cast(pc.index_in(batch[col], value_set=v), pa.int64())
        cols = {k: batch[k] for k in keep}
        cols[f"{col}_id"] = ids
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def profile_table(sf_dir: str, table: str, columns: list[str]) -> pa.Table:
    """Data-quality profile: per column, exact row count, null count and
    distinct count (non-null) — the audit every intake pipeline runs before
    trusting a new partition.

    n / n_null come from ONE pass (per-block partial sums, block-count rows
    to the driver). Distinct is exact and per column: per-block distinct
    (Arrow ``group_by``) then one domain-sized global groupby per column —
    each exchange carries the column's distinct values only, the same
    vocabulary-bounded shape as ``vocab_size``. Reads are column-pruned.
    """
    import ray

    from ..util import collect_table

    path = f"{sf_dir}/{table}.parquet"

    def counts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "column": pa.array(columns, pa.string()),
                "n": pa.array([batch.num_rows] * len(columns), pa.int64()),
                "n_null": pa.array(
                    [batch[c].null_count for c in columns], pa.int64()
                ),
            }
        )

    base = collect_table(
        ray.data.read_parquet(path, columns=columns)
        .map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("column")
        .aggregate(Sum("n", alias_name="n"), Sum("n_null", alias_name="n_null"))
    )
    n_map = dict(zip(base["column"].to_pylist(), base["n"].to_pylist()))
    null_map = dict(zip(base["column"].to_pylist(), base["n_null"].to_pylist()))

    distinct = {}
    for c in columns:
        # nulls are dropped BEFORE the exchange: COUNT(DISTINCT) excludes
        # them, and Ray's sort-partitioned groupby cannot order null keys
        d = (
            ray.data.read_parquet(path, columns=[c])
            .map_batches(
                lambda b, _c=c: pa.table(
                    {_c: b[_c].combine_chunks().drop_null()}
                )
                .group_by([_c])
                .aggregate([]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby(c)
            .count()
        )
        t = collect_table(d)
        distinct[c] = t.num_rows
    return pa.table(
        {
            "column": pa.array(columns, pa.string()),
            "n": pa.array([n_map[c] for c in columns], pa.int64()),
            "n_null": pa.array([null_map[c] for c in columns], pa.int64()),
            "n_distinct": pa.array([distinct[c] for c in columns], pa.int64()),
        }
    )


def scale_value_by_type(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-event-type min-max feature scaling of ``value`` — the
    normalization pass a feature pipeline runs before training, as exact
    integer ppm: scaled = floor(1e6·(v − min)/(max − min)) over integer
    cents (1_000_000 when max == min, the degenerate-range rule).

    Two-pass broadcast shape: per-type (min, max) cents come from a
    combiner-first aggregate (exchange is type-domain-sized), the tiny
    bounds table is ``ray.put``-broadcast, and the scaling map_batches
    probes it vectorized — no second exchange, rows never move.
    """
    import ray

    from ..util import collect_table

    def bounds_partial(batch: pa.Table) -> pa.Table:
        c = to_cents(batch["value"])
        g = (
            pa.table({"event_type": batch["event_type"], "c": c})
            .group_by(["event_type"])
            .aggregate([("c", "min"), ("c", "max")])
        )
        return pa.table(
            {"event_type": g["event_type"], "lo": g["c_min"], "hi": g["c_max"]}
        )

    b = collect_table(
        events_ds.map_batches(
            bounds_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("event_type")
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
    )
    types = sorted(b["event_type"].to_pylist())
    lut = {
        t: (lo, hi)
        for t, lo, hi in zip(
            b["event_type"].to_pylist(), b["lo"].to_pylist(), b["hi"].to_pylist()
        )
    }
    lo_arr = np.array([lut[t][0] for t in types], np.int64)
    hi_arr = np.array([lut[t][1] for t in types], np.int64)
    ref = ray.put((types, lo_arr, hi_arr))

    def scale(batch: pa.Table) -> pa.Table:
        import ray as _ray

        tps, lo_a, hi_a = _ray.get(ref)
        tid = pc.index_in(
            batch["event_type"], value_set=pa.array(tps, pa.string())
        ).to_numpy(zero_copy_only=False)
        c = to_cents(batch["value"]).to_numpy(zero_copy_only=False)
        lo, hi = lo_a[tid], hi_a[tid]
        span = hi - lo
        scaled = np.where(
            span > 0, (c - lo) * 1_000_000 // np.maximum(span, 1), 1_000_000
        )
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "scaled_ppm": pa.array(scaled, pa.int64()),
            }
        )

    return events_ds.map_batches(scale, batch_format="pyarrow", zero_copy_batch=True)


def assign_folds(ds_docs: "ray.data.Dataset", k: int = 5) -> "ray.data.Dataset":
    """Deterministic stratified k-fold assigner: within each ``source``
    stratum docs ordered by doc_id get fold = rank mod k, so every fold
    holds an equal (±1) share of each stratum — the train/eval split a
    data pipeline must reproduce bit-for-bit across reruns.

    Shape: per-stratum co-partition (``groupby(source)``), rank by doc_id
    inside the group. Output: doc_id, source, fold.
    """

    def per_source(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        g = group.take(idx)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "source": g["source"],
                "fold": pa.array(np.arange(g.num_rows, dtype=np.int64) % k),
            }
        )

    return ds_docs.groupby("source").map_groups(per_source, batch_format="pyarrow")


def event_features(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Composed single-pass feature build — the feature-store pipeline as
    ONE streaming map over the fact table: categorical id (global
    DENSE_RANK vocabulary), per-type min-max scaled value (integer ppm),
    and calendar features (dow 0=Sunday, hour), all from broadcast state.

    Scale story: two tiny combiner-first aggregates build the vocabulary
    and the per-type bounds (both type-domain-sized), both broadcast via
    ``ray.put`` ONCE; the fact table then streams through a single
    ``map_batches`` with zero exchanges — at 10^12 rows nothing but the
    output moves. Composes ``encode_categorical`` + ``scale_value_by_type``
    semantics; the SQL oracle restates the composition.
    """
    import ray

    from ..util import collect_table

    def bounds_partial(batch: pa.Table) -> pa.Table:
        c = to_cents(batch["value"])
        g = (
            pa.table({"event_type": batch["event_type"], "c": c})
            .group_by(["event_type"])
            .aggregate([("c", "min"), ("c", "max")])
        )
        return pa.table(
            {"event_type": g["event_type"], "lo": g["c_min"], "hi": g["c_max"]}
        )

    b = collect_table(
        events_ds.map_batches(
            bounds_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("event_type")
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
    )
    types = sorted(b["event_type"].to_pylist())
    lut = dict(zip(b["event_type"].to_pylist(), zip(b["lo"].to_pylist(), b["hi"].to_pylist())))
    lo_arr = np.array([lut[t][0] for t in types], np.int64)
    hi_arr = np.array([lut[t][1] for t in types], np.int64)
    ref = ray.put((types, lo_arr, hi_arr))

    def featurize(batch: pa.Table) -> pa.Table:
        import ray as _ray

        tps, lo_a, hi_a = _ray.get(ref)
        vset = pa.array(tps, pa.string())
        tid = pc.index_in(batch["event_type"], value_set=vset)
        tid_np = tid.to_numpy(zero_copy_only=False)
        c = to_cents(batch["value"]).to_numpy(zero_copy_only=False)
        lo, hi = lo_a[tid_np], hi_a[tid_np]
        span = hi - lo
        scaled = np.where(
            span > 0, (c - lo) * 1_000_000 // np.maximum(span, 1), 1_000_000
        )
        dow = pc.day_of_week(batch["ts"], count_from_zero=True, week_start=7)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "type_id": pc.cast(tid, pa.int64()),
                "scaled_ppm": pa.array(scaled, pa.int64()),
                "dow": pc.cast(dow, pa.int64()),
                "hour": pc.cast(pc.hour(batch["ts"]), pa.int64()),
            }
        )

    return events_ds.map_batches(
        featurize, batch_format="pyarrow", zero_copy_batch=True
    )


def k_anonymity_audit(events_ds: "ray.data.Dataset", k: int = 5) -> "ray.data.Dataset":
    """Privacy audit: quasi-identifier groups (event_type, day-of-week,
    hour) whose member count is below ``k`` — the k-anonymity check a
    release pipeline runs before publishing per-cell aggregates.

    Combiner-first per-block cell counts, one cell-domain-sized groupby
    (|types|×7×24 rows max), then a result-sized filter — never row-sized
    exchanges.
    """

    def partial(batch: pa.Table) -> pa.Table:
        dow = pc.cast(
            pc.day_of_week(batch["ts"], count_from_zero=True, week_start=7),
            pa.int64(),
        )
        hour = pc.cast(pc.hour(batch["ts"]), pa.int64())
        g = (
            pa.table({"event_type": batch["event_type"], "dow": dow, "hour": hour})
            .group_by(["event_type", "dow", "hour"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "dow": g["dow"],
                "hour": g["hour"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "dow", "hour"])
        .sum("n")
    )

    def below_k(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less(batch["sum(n)"], pa.scalar(k, pa.int64())))
        return pa.table(
            {
                "event_type": t["event_type"],
                "dow": t["dow"],
                "hour": t["hour"],
                "n": t["sum(n)"],
            }
        )

    return cells.map_batches(below_k, batch_format="pyarrow")


def quota_sample(ds_docs: "ray.data.Dataset", total_k: int = 100) -> "ray.data.Dataset":
    """Proportional-allocation sampler with LARGEST-REMAINDER rounding:
    ``total_k`` slots are split across ``source`` strata proportional to
    their sizes (floor shares first, leftover slots to the largest
    remainders, ties to the lexicographically smaller source), then each
    stratum deterministically contributes its lowest ``doc_id``s — the
    quota-sampling design surveys and eval-set builders use.

    Shape: combiner-first stratum counts (domain-sized), quota arithmetic
    on the driver over the strata table (result-sized), quotas broadcast,
    and per-stratum selection via ``groupby(source).map_groups`` rank
    filter. All-integer arithmetic (remainders compared as n·K mod total),
    restated exactly in the SQL oracle.
    """
    import ray

    from ..util import collect_table

    def cpartial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"source": batch["source"]})
            .group_by(["source"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"source": g["source"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    ct = collect_table(
        ds_docs.map_batches(cpartial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .sum("n")
    )
    srcs = ct["source"].to_pylist()
    ns = np.array(ct["sum(n)"].to_pylist(), np.int64)
    total = int(ns.sum())
    if total == 0:
        quotas = {}
    else:
        floor_q = ns * total_k // total
        rem = ns * total_k % total  # remainder numerators (denominator: total)
        left = total_k - int(floor_q.sum())
        # largest remainder, tie → lexicographically smaller source
        order = sorted(range(len(srcs)), key=lambda i: (-rem[i], srcs[i]))
        bonus = np.zeros(len(srcs), np.int64)
        for i in order[:left]:
            bonus[i] = 1
        # a stratum can't contribute more rows than it has
        q = np.minimum(floor_q + bonus, ns)
        quotas = dict(zip(srcs, q.tolist()))
    ref = ray.put(quotas)

    def per_source(group: pa.Table) -> pa.Table:
        import ray as _ray

        qmap = _ray.get(ref)
        src = group["source"][0].as_py()
        kq = int(qmap.get(src, 0))
        idx = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        g = group.take(idx).slice(0, kq)
        return pa.table({"doc_id": g["doc_id"], "source": g["source"]})

    return ds_docs.groupby("source").map_groups(per_source, batch_format="pyarrow")


def growth_accounting(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Daily growth accounting — the new / retained / resurrected / churned
    user census every product dashboard leads with:

    * **new** — the user's first-ever active day,
    * **retained** — active today AND yesterday,
    * **resurrected** — active today, previously seen, but NOT yesterday,
    * **churned** — attributed to day d+1 for every active day d whose next
      active day is not d+1 (including the day after the last activity), so
      retained(d) + churned(d) = active(d-1) holds exactly.

    Distributed shape: per-block DISTINCT (user, day) pairs (the only
    event-sized pass), one groupby(user) exchange over the user×day pair
    domain, a vectorized per-user timeline kernel emitting 0/1 status rows,
    then a per-block partial day aggregate feeding a day-domain-sized final
    groupby — no exchange ever moves event-sized data twice.

    Output: day (TIMESTAMP, midnight), n_new, n_retained, n_resurrected,
    n_churned (all BIGINT).
    """
    DAY_US = 86_400_000_000

    def pairs(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch["ts"], unit="day")
        g = (
            pa.table({"user_id": batch["user_id"], "day": d})
            .group_by(["user_id", "day"])
            .aggregate([])
        )
        return g

    OUT = pa.schema(
        [
            ("day", pa.timestamp("us")),
            ("n_new", pa.int64()),
            ("n_retained", pa.int64()),
            ("n_resurrected", pa.int64()),
            ("n_churned", pa.int64()),
        ]
    )

    def timeline(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return OUT.empty_table()
        # blocks may re-send the same (user, day) pair — dedup locally
        dus = np.unique(
            pc.cast(group["day"], pa.int64()).to_numpy(zero_copy_only=False)
        )
        prev_adjacent = np.zeros(len(dus), bool)
        prev_adjacent[1:] = (dus[1:] - dus[:-1]) == DAY_US
        new = np.zeros(len(dus), np.int64)
        new[0] = 1
        retained = prev_adjacent.astype(np.int64)
        resurrected = ((new == 0) & ~prev_adjacent).astype(np.int64)
        # churn fires at d + 1day whenever the next active day is not d+1
        next_gap = np.ones(len(dus), bool)
        next_gap[:-1] = (dus[1:] - dus[:-1]) != DAY_US
        churn_days = dus[next_gap] + DAY_US
        day = np.concatenate([dus, churn_days])
        z = np.zeros(len(churn_days), np.int64)
        return pa.table(
            {
                "day": pa.array(day, pa.timestamp("us")),
                "n_new": pa.array(np.concatenate([new, z])),
                "n_retained": pa.array(np.concatenate([retained, z])),
                "n_resurrected": pa.array(np.concatenate([resurrected, z])),
                "n_churned": pa.array(
                    np.concatenate([np.zeros(len(dus), np.int64), z + 1])
                ),
            }
        )

    def day_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["day"]).aggregate(
            [
                ("n_new", "sum"),
                ("n_retained", "sum"),
                ("n_resurrected", "sum"),
                ("n_churned", "sum"),
            ]
        )
        return pa.table(
            {
                "day": g["day"],
                "n_new": g["n_new_sum"],
                "n_retained": g["n_retained_sum"],
                "n_resurrected": g["n_resurrected_sum"],
                "n_churned": g["n_churned_sum"],
            }
        )

    return (
        events_ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(timeline, batch_format="pyarrow")
        .map_batches(day_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            Sum("n_new", alias_name="n_new"),
            Sum("n_retained", alias_name="n_retained"),
            Sum("n_resurrected", alias_name="n_resurrected"),
            Sum("n_churned", alias_name="n_churned"),
        )
    )


def contingency_margins(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Contingency table with margins and integer expected counts — the
    chi-square-prep crosstab (event_type × day-of-week): per observed cell,
    the count, both margin totals, and the independence-model expectation
    ``expected_ppm = n_row · n_col · 10⁶ // N`` (floor parts-per-million,
    exact integer arithmetic).

    Distributed shape: combiner-first per-block cell counts, one
    cell-domain-sized groupby (|types|×7 rows max), margins + expectation
    computed on the collected domain-sized table with PYTHON ints (the
    n_row·n_col·10⁶ product overflows int64 at 10¹²-row scale, so the
    finalize never trusts fixed-width multiply).

    Output: event_type, dow (Sunday=0), n, n_row, n_col, expected_ppm.
    """
    import ray

    from ..util import collect_table

    def partial(batch: pa.Table) -> pa.Table:
        dow = pc.cast(
            pc.day_of_week(batch["ts"], count_from_zero=True, week_start=7),
            pa.int64(),
        )
        g = (
            pa.table({"event_type": batch["event_type"], "dow": dow})
            .group_by(["event_type", "dow"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "dow": g["dow"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    OUT = pa.schema(
        [
            ("event_type", pa.string()),
            ("dow", pa.int64()),
            ("n", pa.int64()),
            ("n_row", pa.int64()),
            ("n_col", pa.int64()),
            ("expected_ppm", pa.int64()),
        ]
    )
    cells = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "dow"])
        .sum("n")
    )
    if cells.num_rows == 0 or "event_type" not in cells.column_names:
        return ray.data.from_arrow(OUT.empty_table())
    types = cells["event_type"].to_pylist()
    dows = cells["dow"].to_pylist()
    ns = cells["sum(n)"].to_pylist()
    row_tot: dict[str, int] = {}
    col_tot: dict[int, int] = {}
    for t, d, n in zip(types, dows, ns):
        row_tot[t] = row_tot.get(t, 0) + n
        col_tot[d] = col_tot.get(d, 0) + n
    total = sum(ns)
    out = pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "dow": pa.array(dows, pa.int64()),
            "n": pa.array(ns, pa.int64()),
            "n_row": pa.array([row_tot[t] for t in types], pa.int64()),
            "n_col": pa.array([col_tot[d] for d in dows], pa.int64()),
            "expected_ppm": pa.array(
                [
                    row_tot[t] * col_tot[d] * 1_000_000 // total
                    for t, d in zip(types, dows)
                ],
                pa.int64(),
            ),
        }
    )
    return ray.data.from_arrow(out)


def q7_bination_volume(
    sf_dir: str, start: str = "1996-01-01", end: str = "1998-01-01"
) -> "ray.data.Dataset":
    """TPC-H Q7 shape: cross-border shipping volume — revenue per
    (supplier nation → customer nation, order year) for every UNEQUAL
    nation pair, order date in [``start``, ``end``).

    Scale plan mirrors :func:`q5_local_supplier_volume`: the single
    large-large exchange is lineitem ⋈ orders on orderkey (both sides
    filter-pruned to fixed-width columns first); the customer / supplier
    key→nationkey maps are broadcast once via ``ray.put`` as sorted int64
    arrays and resolved with ``np.searchsorted`` per batch, so the three
    dimension hops never shuffle.  Each joined batch pre-reduces to
    (snat, cnat, year) partials — the final groupby moves at most
    |nations|² × |years| rows per block.  Revenue is the house exact
    integer unit, cents × (100 − discount%).

    Output: supp_nation, cust_nation, o_year, revenue_u — ordered by the
    three keys ascending.
    """
    import pyarrow.parquet as pq
    import ray

    from .joins import hash_join

    lo = np.datetime64(start, "us").astype(np.int64)
    hi = np.datetime64(end, "us").astype(np.int64)

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nation_names = {
        int(k): v for k, v in zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())
    }

    def _sorted_lut(path: str, key: str, val: str) -> "ray.ObjectRef":
        t = pq.read_table(path, columns=[key, val])
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[val].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        return ray.put((k[order], v[order]))

    cust_ref = _sorted_lut(f"{sf_dir}/customer.parquet", "c_custkey", "c_nationkey")
    supp_ref = _sorted_lut(f"{sf_dir}/supplier.parquet", "s_suppkey", "s_nationkey")

    def orders_pred(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["o_orderdate"], pa.int64())
        keep = pc.and_(
            pc.greater_equal(ts, pa.scalar(lo, pa.int64())),
            pc.less(ts, pa.scalar(hi, pa.int64())),
        )
        return pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
            }
        ).filter(keep)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=ts_range_filter("o_orderdate", start, end),
    ).map_batches(orders_pred, batch_format="pyarrow", zero_copy_batch=True)

    def line_pred(b: pa.Table) -> pa.Table:
        ext = to_cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc = to_cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "l_suppkey": pc.cast(b["l_suppkey"], pa.int64()),
                "rev": pa.array(ext * (100 - disc), pa.int64()),
            }
        )

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_pred, batch_format="pyarrow", zero_copy_batch=True)

    j = hash_join(line, orders, on="l_orderkey", right_on="o_orderkey")

    EMPTY = pa.schema(
        [
            ("snat", pa.int64()),
            ("cnat", pa.int64()),
            ("o_year", pa.int64()),
            ("revenue_u", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        from ..util import cached_get

        if b.num_rows == 0:
            return EMPTY.empty_table()
        ck, cn = cached_get(cust_ref)
        sk, sn = cached_get(supp_ref)
        cnat = cn[np.searchsorted(ck, b["o_custkey"].to_numpy(zero_copy_only=False))]
        snat = sn[np.searchsorted(sk, b["l_suppkey"].to_numpy(zero_copy_only=False))]
        keep = snat != cnat
        t = pa.table(
            {
                "snat": pa.array(snat[keep], pa.int64()),
                "cnat": pa.array(cnat[keep], pa.int64()),
                "o_year": b["o_year"].filter(pa.array(keep)),
                "rev": pa.array(
                    b["rev"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
            }
        )
        g = t.group_by(["snat", "cnat", "o_year"]).aggregate([("rev", "sum")])
        return pa.table(
            {
                "snat": g["snat"],
                "cnat": g["cnat"],
                "o_year": g["o_year"],
                "revenue_u": pc.cast(g["rev_sum"], pa.int64()),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["snat", "cnat", "o_year"])
        .aggregate(Sum("revenue_u", alias_name="revenue_u"))
    )

    def name_it(b: pa.Table) -> pa.Table:
        # result-sized: ≤ |nations|² × |years| rows
        return pa.table(
            {
                "supp_nation": pa.array(
                    [nation_names[int(k)] for k in b["snat"].to_pylist()], pa.string()
                ),
                "cust_nation": pa.array(
                    [nation_names[int(k)] for k in b["cnat"].to_pylist()], pa.string()
                ),
                "o_year": pc.cast(b["o_year"], pa.int64()),
                "revenue_u": pc.cast(b["revenue_u"], pa.int64()),
            }
        )

    return agg.map_batches(name_it, batch_format="pyarrow").sort(
        ["supp_nation", "cust_nation", "o_year"]
    )


def q6_forecast_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q6 (forecasting revenue change): Σ price·discount over 1996
    shipments with discount in [0.05, 0.07] and quantity < 24 — the
    canonical predicate-pushdown + global-sum query.

    Ray-Data-first: pure map-side work — each batch filters vectorized in
    the integer cents domain (disc_c ∈ [5,7], exact under float noise) and
    reduces to ONE partial-sum row; the global groupby moves |blocks| rows.
    Revenue is Σ round(price·100)·round(disc·100), integer 10⁻⁴ units —
    exact under any block order; the SQL oracle restates the same domain.

    Output: one row — revenue_e4, n_items (BIGINTs).
    """
    import ray

    lo = np.datetime64("1996-01-01", "us").item()
    hi = np.datetime64("1997-01-01", "us").item()

    def partial(batch: pa.Table) -> pa.Table:
        d = batch["l_shipdate"]
        disc_c = np.rint(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        qty = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        )
        in_date = pc.and_(
            pc.greater_equal(d, pa.scalar(lo, pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi, pa.timestamp("us"))),
        ).to_numpy(zero_copy_only=False)
        sel = in_date & (disc_c >= 5) & (disc_c <= 7) & (qty < 24)
        price_c = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        rev = int((price_c * disc_c[sel]).sum())
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "revenue_e4": pa.array([rev], pa.int64()),
                "n_items": pa.array([int(sel.sum())], pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=ts_range_filter("l_shipdate", "1996-01-01", "1997-01-01"),
    )
    return (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(
            Sum("revenue_e4", alias_name="revenue_e4"),
            Sum("n_items", alias_name="n_items"),
        )
        .select_columns(["revenue_e4", "n_items"])
    )


def q12_priority_by_status(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q12 shape (shipping-mode priority census) adapted to this
    corpus' lineitem (no shipmode/commit/receipt dates): per
    ``l_linestatus``, count 1996-shipped lineitems whose order is
    high-priority (1-URGENT / 2-HIGH) vs low — the fact⋈fact join whose
    join payload is a single census bit.

    Ray-Data-first: the priority bit rides a key-to-key hash join of the
    date-pruned lineitem slice (only l_orderkey + l_linestatus cross the
    exchange) against orders projected to (o_orderkey, is_high); the final
    groupby is |statuses|-sized.

    Output: l_linestatus, high_count, low_count (BIGINTs).
    """
    import ray

    from .joins import hash_join

    lo = np.datetime64("1996-01-01", "us").item()
    hi = np.datetime64("1997-01-01", "us").item()

    def prune_li(batch: pa.Table) -> pa.Table:
        d = batch["l_shipdate"]
        mask = pc.and_(
            pc.greater_equal(d, pa.scalar(lo, pa.timestamp("us"))),
            pc.less(d, pa.scalar(hi, pa.timestamp("us"))),
        )
        out = batch.filter(mask)
        return pa.table(
            {
                "l_orderkey": pc.cast(out["l_orderkey"], pa.int64()),
                "l_linestatus": out["l_linestatus"],
            }
        )

    def project_orders(batch: pa.Table) -> pa.Table:
        is_high = pc.is_in(
            batch["o_orderpriority"],
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        return pa.table(
            {
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
                "is_high": pc.cast(is_high, pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
        filter=ts_range_filter("l_shipdate", "1996-01-01", "1997-01-01"),
    ).map_batches(prune_li, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(project_orders, batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(li, orders, on=("l_orderkey",), right_on=("o_orderkey",))

    def census(batch: pa.Table) -> pa.Table:
        high = pc.cast(batch["is_high"], pa.int64())
        low = pc.subtract(pa.scalar(1, pa.int64()), high)
        t = pa.table(
            {"l_linestatus": batch["l_linestatus"], "h": high, "l": low}
        )
        g = t.group_by(["l_linestatus"]).aggregate([("h", "sum"), ("l", "sum")])
        return pa.table(
            {
                "l_linestatus": g["l_linestatus"],
                "high_count": pc.cast(g["h_sum"], pa.int64()),
                "low_count": pc.cast(g["l_sum"], pa.int64()),
            }
        )

    return (
        joined.map_batches(census, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(
            Sum("high_count", alias_name="high_count"),
            Sum("low_count", alias_name="low_count"),
        )
    )


def q13_customer_distribution(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q13 (customer order-count distribution): how many customers
    placed exactly k orders, INCLUDING the zero-order bucket the LEFT JOIN
    exists for.

    Ray-Data-first, join-free: per-customer order counts reduce
    combiner-first (exchange is customer-domain, one row per customer);
    the k-histogram is a second combiner-first groupby over that; the
    zero bucket needs only |customer| − Σ histogram — two scalar counts,
    appended as one driver-side row (result-sized by construction).

    Output: c_count, custdist (BIGINTs), the Q13 column names.
    """
    import ray

    per_cust = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .groupby("o_custkey")
        .count()
    )

    def hist_block(batch: pa.Table) -> pa.Table:
        g = (
            pa.table({"c_count": pc.cast(batch["count()"], pa.int64())})
            .group_by(["c_count"])
            .aggregate([("c_count", "count")])
        )
        return pa.table(
            {
                "c_count": g["c_count"],
                "custdist": pc.cast(g["c_count_count"], pa.int64()),
            }
        )

    hist = (
        per_cust.map_batches(hist_block, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
    )

    n_customers = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()

    from ..util import collect_table

    ht = collect_table(hist)  # histogram: one row per distinct order count
    n_with = int(pc.sum(ht["custdist"]).as_py() or 0)
    if n_customers > n_with:  # zero bucket only when zero-order customers exist
        zero_row = pa.table(
            {
                "c_count": pa.array([0], pa.int64()),
                "custdist": pa.array([n_customers - n_with], pa.int64()),
            }
        )
        ht = pa.concat_tables([ht, zero_row])
    return ray.data.from_arrow(ht)


def q17_small_quantity_revenue(
    sf_dir: str, brand: str = "Brand#23"
) -> "ray.data.Dataset":
    """TPC-H Q17 shape (small-quantity-order revenue) adapted to this
    corpus' part table (no container column): total revenue from ``brand``
    lineitems whose quantity is below 20% of that part's average quantity —
    the correlated scalar-subquery query.

    Decorrelated, shuffle-free: the brand's partkey set is dimension-sized
    and BROADCAST; pass 1 reduces brand lineitems combiner-first to
    per-part (Σqty, n) — itself brand-dimension-sized, so it is broadcast
    too; pass 2 re-scans brand lineitems map-side and keeps rows where
    ``5·qty·n < Σqty`` (the integer-exact restatement of qty < 0.2·avg).
    Two column-pruned fact scans, zero all-to-all exchanges.

    Output: one row — total_price_c, n_items (BIGINTs).
    """
    import ray

    from ..util import collect_table

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )

    def brand_keys(batch: pa.Table) -> pa.Table:
        k = batch.filter(pc.equal(batch["p_brand"], brand))["p_partkey"]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        return pa.table({"p_partkey": pc.cast(k, pa.int64())})

    keys_t = collect_table(
        parts.map_batches(brand_keys, batch_format="pyarrow", zero_copy_batch=True)
    )
    keys_np = np.sort(keys_t["p_partkey"].to_numpy(zero_copy_only=False))
    keys_ref = ray.put(keys_np)

    def li(columns: list[str]) -> "ray.data.Dataset":
        return ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=columns)

    def qty_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        lk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, lk)
        pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
        sel = (keys[pos_c] == lk) if len(keys) else np.zeros(len(lk), bool)
        qty = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)[sel]
        ).astype(np.int64)
        t = pa.table(
            {
                "p_partkey": pa.array(lk[sel], pa.int64()),
                "qty": pa.array(qty, pa.int64()),
                "one": pa.array(np.ones(int(sel.sum()), np.int64)),
            }
        )
        g = t.group_by(["p_partkey"]).aggregate([("qty", "sum"), ("one", "sum")])
        return pa.table(
            {
                "p_partkey": g["p_partkey"],
                "sum_qty": pc.cast(g["qty_sum"], pa.int64()),
                "n_li": pc.cast(g["one_sum"], pa.int64()),
            }
        )

    stats = collect_table(
        li(["l_partkey", "l_quantity"])
        .map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p_partkey")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("n_li", alias_name="n_li"))
    )  # brand-dimension-sized: one row per brand part
    sk = stats["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(sk)
    stats_ref = ray.put(
        (
            sk[order],
            stats["sum_qty"].to_numpy(zero_copy_only=False).astype(np.int64)[order],
            stats["n_li"].to_numpy(zero_copy_only=False).astype(np.int64)[order],
        )
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        keys, sum_qty, n_li = ray.get(stats_ref)
        lk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, lk)
        pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
        found = (keys[pos_c] == lk) if len(keys) else np.zeros(len(lk), bool)
        qty = np.rint(batch["l_quantity"].to_numpy(zero_copy_only=False)).astype(
            np.int64
        )
        sel = found & (5 * qty * n_li[pos_c] < sum_qty[pos_c])
        price_c = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "total_price_c": pa.array([int(price_c.sum())], pa.int64()),
                "n_items": pa.array([int(sel.sum())], pa.int64()),
            }
        )

    return (
        li(["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(
            Sum("total_price_c", alias_name="total_price_c"),
            Sum("n_items", alias_name="n_items"),
        )
        .select_columns(["total_price_c", "n_items"])
    )


def q22_idle_balance_census(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q22 shape (global-relation test) adapted to this corpus'
    customer table (no phone column — grouped by market segment instead;
    and since every synthetic customer has orders, the NOT EXISTS is
    against URGENT/HIGH-priority orders so the anti side is non-trivial):
    per segment, count and total balance of customers whose account balance
    exceeds the global average POSITIVE balance and who placed no
    high-priority orders.

    Ray-Data-first: the global average is two scalar partial sums (one
    combiner row per block); the above-average test is integer-exact
    (``n·bal_c > Σbal_c`` — no float division); the NOT EXISTS is this
    engine's hash anti-join, whose exchange carries only (custkey, segment,
    bal_c) for the above-average slice and the order-side distinct keys.

    Output: c_mktsegment, numcust, totacctbal_c (BIGINTs).
    """
    import ray

    from ..util import collect_table
    from .joins import anti_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )

    def pos_partial(batch: pa.Table) -> pa.Table:
        bal_c = np.rint(
            batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pos = bal_c[bal_c > 0]
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "s": pa.array([int(pos.sum())], pa.int64()),
                "n": pa.array([int(len(pos))], pa.int64()),
            }
        )

    tot = collect_table(
        cust.map_batches(pos_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )
    sum_c, n_pos = int(tot["s"][0].as_py()), int(tot["n"][0].as_py())

    def above_avg(batch: pa.Table) -> pa.Table:
        bal_c = np.rint(
            batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        sel = (n_pos * bal_c) > sum_c if n_pos else np.zeros(len(bal_c), bool)
        return pa.table(
            {
                "c_custkey": pc.cast(batch["c_custkey"], pa.int64()).filter(
                    pa.array(sel)
                ),
                "c_mktsegment": batch["c_mktsegment"].filter(pa.array(sel)),
                "bal_c": pa.array(bal_c[sel], pa.int64()),
            }
        )

    rich = cust.map_batches(above_avg, batch_format="pyarrow", zero_copy_batch=True)

    def high_prio(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch["o_orderpriority"], value_set=pa.array(["1-URGENT", "2-HIGH"])
        )
        return pa.table(
            {"o_custkey": pc.cast(batch["o_custkey"].filter(keep), pa.int64())}
        )

    order_keys = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
        )
        .map_batches(high_prio, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .count()
        .select_columns(["o_custkey"])
    )
    idle = anti_join(rich, order_keys, on=("c_custkey",), right_on=("o_custkey",))

    def census(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["c_mktsegment"]).aggregate(
            [("bal_c", "count"), ("bal_c", "sum")]
        )
        return pa.table(
            {
                "c_mktsegment": g["c_mktsegment"],
                "numcust": pc.cast(g["bal_c_count"], pa.int64()),
                "totacctbal_c": pc.cast(g["bal_c_sum"], pa.int64()),
            }
        )

    agg = (
        idle.map_batches(census, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("numcust", alias_name="numcust"),
            Sum("totacctbal_c", alias_name="totacctbal_c"),
        )
    )
    # segment-domain-sized finalize with a pinned schema so an empty result
    # still presents (c_mktsegment, numcust, totacctbal_c) to the driver
    out_schema = pa.schema(
        [
            ("c_mktsegment", pa.string()),
            ("numcust", pa.int64()),
            ("totacctbal_c", pa.int64()),
        ]
    )
    t = collect_table(agg, fallback_schema=out_schema)
    return ray.data.from_arrow(t.select(out_schema.names).cast(out_schema))


def q9_nation_year_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q9 shape (product-type profit) adapted to this corpus (no
    partsupp supplycost): discounted revenue per (supplier nation, order
    year) — the fact⋈fact⋈dim⋈dim join tree.

    Ray-Data-first: supplier→nationkey and nation→name are dimension-sized
    BROADCAST lookups applied map-side BEFORE the exchange, so the one
    hash join (lineitem⋈orders on orderkey) carries only (orderkey,
    nationkey, rev_e4) against (orderkey, year) — fixed-width columns,
    never names or prices; the final (nation, year) groupby is
    calendar×nation-sized, reduced combiner-first.

    Output: n_name, o_year, revenue_e4 (BIGINT 1e-4 units).
    """
    import ray

    from ..util import collect_table
    from .joins import hash_join

    supp = collect_table(
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
    )
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(sk)
    supp_ref = ray.put(
        (sk[order], supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)[order])
    )

    def li_project(batch: pa.Table) -> pa.Table:
        keys, nat = ray.get(supp_ref)
        lk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, lk)
        pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
        found = (keys[pos_c] == lk) if len(keys) else np.zeros(len(lk), bool)
        nationkey = np.where(found, nat[pos_c] if len(nat) else -1, -1)
        price_c = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.rint(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
                "nationkey": pa.array(nationkey, pa.int64()),
                "rev_e4": pa.array(price_c * (100 - disc_c), pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_project, batch_format="pyarrow", zero_copy_batch=True)

    def o_project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
                "o_year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(o_project, batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(li, orders, on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["nationkey", "o_year"]).aggregate([("rev_e4", "sum")])
        return pa.table(
            {
                "nationkey": pc.cast(g["nationkey"], pa.int64()),
                "o_year": pc.cast(g["o_year"], pa.int64()),
                "revenue_e4": pc.cast(g["rev_e4_sum"], pa.int64()),
            }
        )

    cells = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["nationkey", "o_year"])
        .aggregate(Sum("revenue_e4", alias_name="revenue_e4"))
    )

    nation = collect_table(
        ray.data.read_parquet(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
    )
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    norder = np.argsort(nk)
    names = nation["n_name"].take(pa.array(norder))
    nation_ref = ray.put((nk[norder], names))

    def add_name(batch: pa.Table) -> pa.Table:
        keys, nm = ray.get(nation_ref)
        bk = batch["nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, bk)
        pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
        return pa.table(
            {
                "n_name": pc.take(nm, pa.array(pos_c, pa.int64())),
                "o_year": batch["o_year"],
                "revenue_e4": batch["revenue_e4"],
            }
        )

    return cells.map_batches(add_name, batch_format="pyarrow")


def chi2_independence_cells(sf_dir: str) -> "ray.data.Dataset":
    """Chi-square independence audit for (event_type × day-of-week):
    per cell, the observed count plus its EXACT integer margins (row,
    column, grand totals — each ≤ N, so int64-safe at any row count,
    unlike a premultiplied (O·N − R·C)² which overflows near N ≈ 3·10⁹).
    The consumer computes χ² = Σ (O − R·C/N)² / (R·C/N) in one float pass
    over the |types|×7 result; the cells themselves are bit-exact under
    any blocking — the audit equivalent of the engine's cents-domain rule.

    Combiner-first: blocks reduce to per-(type, dow) partial counts; the
    margins are derived from the |types|×7 cell table on the driver
    (result-sized by construction).

    Output: event_type, dow, observed, row_total, col_total, grand_total
    (BIGINTs).
    """
    import ray

    from ..util import collect_table

    def cell_partial(batch: pa.Table) -> pa.Table:
        # 0=Sunday (DuckDB EXTRACT(dow) convention, as dow_hour_activity)
        dow = pc.day_of_week(batch["ts"], count_from_zero=True, week_start=7)
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "dow": pc.cast(dow, pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["event_type", "dow"]).aggregate([("one", "sum")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "dow": g["dow"],
                "observed": pc.cast(g["one_sum"], pa.int64()),
            }
        )

    cells = collect_table(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(cell_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "dow"])
        .aggregate(Sum("observed", alias_name="observed"))
    )
    et = cells["event_type"].to_pylist()
    dw = cells["dow"].to_numpy(zero_copy_only=False).astype(np.int64)
    ob = cells["observed"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(ob.sum())
    row_tot: dict[str, int] = {}
    col_tot: dict[int, int] = {}
    for e, d, o in zip(et, dw, ob):
        row_tot[e] = row_tot.get(e, 0) + int(o)
        col_tot[int(d)] = col_tot.get(int(d), 0) + int(o)
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(et, pa.string()),
                "dow": pa.array(dw, pa.int64()),
                "observed": pa.array(ob, pa.int64()),
                "row_total": pa.array(
                    [row_tot[e] for e in et], pa.int64()
                ),
                "col_total": pa.array(
                    [col_tot[int(d)] for d in dw], pa.int64()
                ),
                "grand_total": pa.array(np.full(len(et), n, np.int64)),
            }
        )
    )


def q8_market_share_ppm(
    sf_dir: str, nation: str = "JAPAN", region: str = "ASIA"
) -> "ray.data.Dataset":
    """TPC-H Q8 shape (national market share): per order year, the ppm
    share of discounted revenue supplied by ``nation`` among orders placed
    by customers in ``region``.

    Ray-Data-first: nation/region/supplier are dimension-sized broadcast
    lookups applied map-side; customer→regionkey is itself a broadcast
    (customer is dim-scale next to lineitem at TPC-H shape). The only
    exchange is lineitem⋈orders on orderkey carrying fixed-width
    (orderkey, rev_e4, is_target) vs (orderkey, year) — then a
    calendar-sized groupby. Share is integer ppm: ``10⁶·num // den``.

    Output: o_year, share_ppm, num_rev_e4, den_rev_e4 (BIGINTs).
    """
    import ray

    from ..util import collect_table
    from .joins import hash_join

    nation_t = collect_table(
        ray.data.read_parquet(
            f"{sf_dir}/nation.parquet",
            columns=["n_nationkey", "n_name", "n_regionkey"],
        )
    )
    region_t = collect_table(
        ray.data.read_parquet(
            f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
        )
    )
    region_keys = {
        int(k)
        for k, nm in zip(
            region_t["r_regionkey"].to_pylist(), region_t["r_name"].to_pylist()
        )
        if nm == region
    }
    target_nationkeys = {
        int(k)
        for k, nm in zip(
            nation_t["n_nationkey"].to_pylist(), nation_t["n_name"].to_pylist()
        )
        if nm == nation
    }
    region_nationkeys = {
        int(k)
        for k, rk in zip(
            nation_t["n_nationkey"].to_pylist(),
            nation_t["n_regionkey"].to_pylist(),
        )
        if int(rk) in region_keys
    }

    cust_t = collect_table(
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
    )
    ck = cust_t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cust_t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    in_region = np.isin(cn, np.array(sorted(region_nationkeys), np.int64))
    region_cust = np.sort(ck[in_region])
    cust_ref = ray.put(region_cust)

    supp_t = collect_table(
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
    )
    sk = supp_t["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = supp_t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    target_supp = np.sort(sk[np.isin(sn, np.array(sorted(target_nationkeys), np.int64))])
    supp_ref = ray.put(target_supp)

    def o_project(batch: pa.Table) -> pa.Table:
        keys = ray.get(cust_ref)
        okc = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, okc)
        pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
        sel = (keys[pos_c] == okc) if len(keys) else np.zeros(len(okc), bool)
        out = batch.filter(pa.array(sel))
        return pa.table(
            {
                "o_orderkey": pc.cast(out["o_orderkey"], pa.int64()),
                "o_year": pc.cast(pc.year(out["o_orderdate"]), pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(o_project, batch_format="pyarrow", zero_copy_batch=True)

    def li_project(batch: pa.Table) -> pa.Table:
        tsupp = ray.get(supp_ref)
        lk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(tsupp, lk)
        pos_c = np.clip(pos, 0, max(len(tsupp) - 1, 0))
        is_target = (tsupp[pos_c] == lk) if len(tsupp) else np.zeros(len(lk), bool)
        price_c = np.rint(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.rint(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
                "rev_e4": pa.array(price_c * (100 - disc_c), pa.int64()),
                "is_target": pa.array(is_target.astype(np.int64), pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_project, batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(li, orders, on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(batch: pa.Table) -> pa.Table:
        num = pc.multiply(batch["rev_e4"], batch["is_target"])
        t = pa.table(
            {
                "o_year": batch["o_year"],
                "num": num,
                "den": batch["rev_e4"],
            }
        )
        g = t.group_by(["o_year"]).aggregate([("num", "sum"), ("den", "sum")])
        return pa.table(
            {
                "o_year": pc.cast(g["o_year"], pa.int64()),
                "num_rev_e4": pc.cast(g["num_sum"], pa.int64()),
                "den_rev_e4": pc.cast(g["den_sum"], pa.int64()),
            }
        )

    years = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("num_rev_e4", alias_name="num_rev_e4"),
            Sum("den_rev_e4", alias_name="den_rev_e4"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        num = batch["num_rev_e4"].to_numpy(zero_copy_only=False)
        den = batch["den_rev_e4"].to_numpy(zero_copy_only=False)
        ppm = np.where(den > 0, (1_000_000 * num) // np.maximum(den, 1), 0)
        return pa.table(
            {
                "o_year": batch["o_year"],
                "share_ppm": pa.array(ppm, pa.int64()),
                "num_rev_e4": batch["num_rev_e4"],
                "den_rev_e4": batch["den_rev_e4"],
            }
        )

    return years.map_batches(finish, batch_format="pyarrow")


def q15_top_supplier(
    sf_dir: str, start: str = "1996-01-01", end: str = "1996-04-01"
) -> "ray.data.Dataset":
    """TPC-H Q15 shape (top supplier by quarterly revenue, ties kept): per-
    supplier discounted revenue over lineitems shipped in [start, end), then
    the supplier(s) whose total equals the global max, enriched with the
    supplier dimension.

    Scale plan: revenue is combiner-reduced per block BEFORE the one
    supplier-keyed groupby (exchange = suppliers × one int64, never
    lineitems); the max is an aggregate over the supplier-sized totals
    (materialized once so the max pass and the filter pass share the
    execution); the supplier name lookup is a broadcast dim join. Revenue in
    exact integer 1e-4 currency units (round(price·100)·(100−round(disc·100))).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum as _Sum

    lo = np.datetime64(start, "us").astype(np.int64)
    hi = np.datetime64(end, "us").astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        ts = b["l_shipdate"].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        m = (ts >= lo) & (ts < hi)
        if not m.any():
            return pa.table(
                {"l_suppkey": pa.array([], pa.int64()),
                 "rev_e4": pa.array([], pa.int64())}
            )
        t = b.filter(pa.array(m))
        price = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        g = pa.table(
            {
                "l_suppkey": t["l_suppkey"],
                "rev_e4": pa.array(price * (100 - disc), pa.int64()),
            }
        ).group_by(["l_suppkey"]).aggregate([("rev_e4", "sum")])
        return pa.table(
            {"l_suppkey": g["l_suppkey"], "rev_e4": g["rev_e4_sum"]}
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=ts_range_filter("l_shipdate", start, end),
    )
    totals = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_suppkey")
        .aggregate(_Sum("rev_e4", alias_name="total_rev_e4"))
        .materialize()  # supplier-sized; shared by the max pass + filter pass
    )
    best = totals.max("total_rev_e4")

    import pyarrow.parquet as _pq

    supp = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).combine_chunks()
    ref = ray.put(supp)

    def finish(batch: pa.Table) -> pa.Table:
        from ..util import cached_get

        keep = batch.filter(pc.equal(batch["total_rev_e4"], best))
        d: pa.Table = cached_get(ref)
        pos = pc.index_in(keep["l_suppkey"], value_set=d["s_suppkey"])
        return pa.table(
            {
                "s_suppkey": pc.cast(keep["l_suppkey"], pa.int64()),
                "s_name": pc.take(d["s_name"], pos),
                "total_rev_e4": keep["total_rev_e4"],
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow")


def gini_user_activity(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact Gini coefficient of per-user event counts — the activity-
    concentration audit (how unevenly traffic spreads over users).

    Gini = Σᵢ (2i − n − 1)·xᵢ / (n·Σx) over the ASCENDING-sorted per-user
    counts xᵢ (1-based rank i). The rank-weighted sum is invariant under
    tie order (equal x swap freely), so any stable total order works.

    Scale plan: raw events reduce combiner-first to one row per user; the
    irreducible distributed sort runs over that user-sized table; exact
    global ranks come from block-offset bookkeeping (pass 1 reduces each
    block to (first_key, n_rows) — block-count-sized on the driver — pass 2
    assigns rank = offset + arange), the same machinery as NTILE. Per-block
    partials accumulate as Python ints (products bounded by int64 —
    n_users·max_user_count < 2⁶³ — but their SUM is not at planet scale).

    Output: one row — n_users, total_events, gini_num (Σ(2i−n−1)xᵢ),
    gini_ppm (⌊1e6·num/(n·total)⌋). All BIGINT-exact.
    """
    import ray
    from ray.data.aggregate import Sum as _Sum

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["user_id"]).group_by(["user_id"]).aggregate(
            [("user_id", "count")]
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "n": pc.cast(g["user_id_count"], pa.int64()),
            }
        )

    counts = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(_Sum("n", alias_name="n"))
    )
    ordered = counts.sort(["n", "user_id"]).materialize()

    def block_head(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "rows": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "n": batch["n"][:1],
                "user_id": batch["user_id"][:1],
                "rows": pa.array([batch.num_rows], pa.int64()),
            }
        )

    heads = ordered.map_batches(
        block_head, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    heads.sort(key=lambda r: (r["n"], r["user_id"]))
    n_users = sum(r["rows"] for r in heads)
    offsets: dict[tuple, int] = {}
    acc = 0
    for r in heads:
        offsets[(r["n"], r["user_id"])] = acc
        acc += r["rows"]

    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"num": pa.array([], pa.int64()), "tot": pa.array([], pa.int64())}
            )
        first = (batch["n"][0].as_py(), batch["user_id"][0].as_py())
        rank0 = offsets[first] + np.arange(batch.num_rows, dtype=np.int64)
        x = batch["n"].to_numpy(zero_copy_only=False)
        coeff = 2 * rank0 + 1 - n_users  # (2i − n − 1) with i = rank0 + 1
        # products fit int64; their sum accumulates as a Python int
        num = int(np.add.reduce((coeff * x).astype(object))) if batch.num_rows else 0
        return pa.table(
            {
                "num": pa.array([num], pa.int64()),
                "tot": pa.array([int(x.sum())], pa.int64()),
            }
        )

    parts = ordered.map_batches(
        block_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    gini_num = sum(r["num"] for r in parts)
    total = sum(r["tot"] for r in parts)
    den = n_users * total
    return ray.data.from_arrow(
        pa.table(
            {
                "n_users": pa.array([n_users], pa.int64()),
                "total_events": pa.array([total], pa.int64()),
                "gini_num": pa.array([gini_num], pa.int64()),
                "gini_ppm": pa.array(
                    [(1_000_000 * gini_num) // den if den else 0], pa.int64()
                ),
            }
        )
    )


def mannwhitney_components(
    events_ds: "ray.data.Dataset",
    type_a: str = "purchase",
    type_b: str = "click",
) -> "ray.data.Dataset":
    """Exact Mann-Whitney rank-sum components comparing the ``value``
    distributions of two event types — the distribution-shift test a data
    pipeline runs between cohorts/sources. Midranks (the tie correction)
    stay integer by carrying 2× the rank sum.

    For each distinct cents value v with group-A count na(v) and total
    count cnt(v), the doubled tie-adjusted rank sum of A is
    Σ_v na(v)·(2·cum_before(v) + cnt(v) + 1) where cum_before is the count
    of strictly smaller values. U₂ (doubled U statistic) follows as
    ranksum2_a − n_a(n_a+1).

    Scale plan: events reduce combiner-first to one row per distinct cents
    value (na, cnt) — value-domain-sized, not event-sized; the sort +
    exact prefix counts reuse the block-offset machinery (driver holds one
    (first_key, block_count_sum) pair per block).

    Output: one row — n_a, n_b, ranksum2_a, u2_a. BIGINT-exact.
    """
    import ray
    from ray.data.aggregate import Sum as _Sum

    def partial(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"], value_set=pa.array([type_a, type_b]))
        t = b.filter(m)
        if t.num_rows == 0:
            return pa.table(
                {
                    "c": pa.array([], pa.int64()),
                    "na": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        cents = to_cents(t["value"])
        is_a = pc.cast(pc.equal(t["event_type"], type_a), pa.int64())
        g = pa.table({"c": cents, "na": is_a, "one": pa.array(
            np.ones(t.num_rows, np.int64))}).group_by(["c"]).aggregate(
            [("na", "sum"), ("one", "sum")]
        )
        return pa.table(
            {"c": g["c"], "na": g["na_sum"], "cnt": g["one_sum"]}
        )

    per_value = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c")
        .aggregate(_Sum("na", alias_name="na"), _Sum("cnt", alias_name="cnt"))
    )
    ordered = per_value.sort(["c"]).materialize()

    def block_head(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"c": pa.array([], pa.int64()), "rows_cnt": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "c": batch["c"][:1],
                "rows_cnt": pa.array(
                    [int(batch["cnt"].to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        )

    heads = ordered.map_batches(
        block_head, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    heads.sort(key=lambda r: r["c"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in heads:
        offsets[r["c"]] = acc
        acc += r["rows_cnt"]

    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "n_a": pa.array([], pa.int64()),
                    "n_b": pa.array([], pa.int64()),
                    "rs2": pa.array([], pa.int64()),
                }
            )
        na = batch["na"].to_numpy(zero_copy_only=False)
        cnt = batch["cnt"].to_numpy(zero_copy_only=False)
        cum_before = offsets[batch["c"][0].as_py()] + np.concatenate(
            ([0], np.cumsum(cnt)[:-1])
        )
        terms = (na * (2 * cum_before + cnt + 1)).astype(object)
        rs2 = int(np.add.reduce(terms)) if len(terms) else 0
        return pa.table(
            {
                "n_a": pa.array([int(na.sum())], pa.int64()),
                "n_b": pa.array([int((cnt - na).sum())], pa.int64()),
                "rs2": pa.array([rs2], pa.int64()),
            }
        )

    parts = ordered.map_batches(
        block_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    n_a = sum(r["n_a"] for r in parts)
    n_b = sum(r["n_b"] for r in parts)
    rs2 = sum(r["rs2"] for r in parts)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_a": pa.array([n_a], pa.int64()),
                "n_b": pa.array([n_b], pa.int64()),
                "ranksum2_a": pa.array([rs2], pa.int64()),
                "u2_a": pa.array([rs2 - n_a * (n_a + 1)], pa.int64()),
            }
        )
    )


def zorder_events(sf_dir: str, bits: int = 16) -> "ray.data.Dataset":
    """Z-order (Morton) clustering value for the events table on
    (user_id, day): interleave the low ``bits`` bits of both dimensions so
    rows close in BOTH user and time land close in the sort order — the
    multi-column data-layout trick (Delta/Iceberg OPTIMIZE ZORDER) that
    lets min/max zone maps prune scans filtered on EITHER column.

    The z-value is pure per-row vectorized bit math (no shuffle); writing
    the table sorted by it is one distributed sort. ``test_zorder_locality``
    checks the payoff: after z-sorting, equal-size blocks span strictly
    fewer distinct users AND fewer distinct days than the natural ts
    layout, so a zone-map pruned scan on either key touches fewer blocks.

    Output: event_id, user_id, day, zval (BIGINTs; zval = Σᵢ
    user_bit_i·4ⁱ·1 + day_bit_i·4ⁱ·2).
    """
    import ray
    import ray.data

    def zval(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[D]").astype(np.int64)
        um = u & ((1 << bits) - 1)
        dm = ts & ((1 << bits) - 1)
        z = np.zeros(len(u), np.int64)
        for i in range(bits):
            z |= ((um >> i) & 1) << (2 * i)
            z |= ((dm >> i) & 1) << (2 * i + 1)
        return pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "day": pa.array(ts, pa.int64()),
                "zval": pa.array(z, pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).map_batches(zval, batch_format="pyarrow", zero_copy_batch=True)


def equidepth_bin_events(
    events_ds: "ray.data.Dataset", k: int = 10
) -> "ray.data.Dataset":
    """Equi-depth (quantile) feature binning: assign every event's value to
    one of ``k`` population-balanced buckets — the standard ML
    preprocessing discretization (each bucket holds ≈ n/k rows instead of
    an equal value range).

    Two passes, no sort: pass 1 finds the k−1 EXACT bucket edges with the
    shared histogram-refinement selection (``_hist_select_ranks``,
    combiner-only scans); pass 2 broadcasts the tiny edge vector and maps
    every row to ``bucket = 1 + #edges strictly below its value`` with one
    vectorized ``searchsorted``. Ties sit in the LOWER bucket (edge values
    inclusive), matching the SQL restatement exactly.

    Output: event_id, value_cents, bucket (BIGINTs, bucket ∈ 1..k).
    """
    import math

    import ray

    n = events_ds.count()
    if n == 0:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "value_cents": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        )
    ranks = [max(math.ceil(d * n / k), 1) - 1 for d in range(1, k)]

    def to_ints(batch: pa.Table) -> np.ndarray:
        return to_cents(batch["value"]).to_numpy(zero_copy_only=False)

    edges = np.array(
        _hist_select_ranks(events_ds, to_ints, ranks), dtype=np.int64
    )

    def assign(batch: pa.Table) -> pa.Table:
        v = to_cents(batch["value"]).to_numpy(zero_copy_only=False)
        bucket = 1 + np.searchsorted(edges, v, side="left").astype(np.int64)
        return pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "value_cents": pa.array(v, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    return events_ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def event_type_venn(
    events_ds: "ray.data.Dataset",
    types: tuple[str, str, str] = ("view", "click", "purchase"),
) -> "ray.data.Dataset":
    """Three-set Venn census over USER-DAYS: for each of the 7 non-empty
    membership combinations of ``types`` (bit 0 = first type, …), how many
    (user, day) cells hold exactly that combination — the daily
    audience-overlap audit that generalizes the 2-set INTERSECT/EXCEPT
    ops (per-lifetime masks are degenerate on an active corpus: every
    user eventually touches everything).

    Scale plan: each block reduces to its DISTINCT (user, day, bit)
    triples (vectorized ``index_in`` + shift, Arrow group_by); one groupby
    deduplicates triples globally (exchange ≤ 3 rows per user-day); a
    per-cell sum of distinct bits IS the OR mask; the final census is ≤ 7
    rows.

    Output: mask (BIGINT 1..7), n_cells (BIGINT).
    """
    import ray
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    tarr = pa.array(list(types))

    def pairs_partial(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"], value_set=tarr)
        t = b.filter(m)
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "day": pa.array([], pa.int64()),
                    "bit": pa.array([], pa.int64()),
                }
            )
        pos = pc.index_in(t["event_type"], value_set=tarr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        day = t["ts"].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[D]").astype(np.int64)
        pairs = pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "day": pa.array(day, pa.int64()),
                "bit": pa.array(np.int64(1) << pos, pa.int64()),
            }
        )
        g = pairs.group_by(["user_id", "day", "bit"]).aggregate(
            [("bit", "count")]
        )
        return g.select(["user_id", "day", "bit"])

    pairs = (
        events_ds.map_batches(
            pairs_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["user_id", "day", "bit"])
        .aggregate(_Count(alias_name="_c"))
    )

    def fold(b: pa.Table) -> pa.Table:
        g = b.select(["user_id", "day", "bit"]).group_by(
            ["user_id", "day"]
        ).aggregate([("bit", "sum")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "day": g["day"],
                "mask": pc.cast(g["bit_sum"], pa.int64()),
            }
        )

    masks = (
        pairs.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "day"])
        .aggregate(_Sum("mask", alias_name="mask"))
    )

    def census(b: pa.Table) -> pa.Table:
        g = b.select(["mask"]).group_by(["mask"]).aggregate([("mask", "count")])
        return pa.table(
            {
                "mask": g["mask"],
                "n_cells": pc.cast(g["mask_count"], pa.int64()),
            }
        )

    return (
        masks.map_batches(census, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("mask")
        .aggregate(_Sum("n_cells", alias_name="n_cells"))
    )


def median2_value_per_type(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Interpolated (PERCENTILE_CONT-style) median of ``value`` per event
    type, kept integer-exact by emitting DOUBLED units: median2 = the sum
    of the two middle cents values for even group sizes, or 2× the middle
    value for odd — ⟨median⟩ = median2 / 2 without any float division.
    Complements ``median_value_per_type`` (the lower/discrete median).

    Scale plan: per-(type, cents) combiner counts (exchange is
    value-domain-sized), then per-type the two order statistics come from
    one cumulative pass over the type's sorted distinct values inside
    ``map_groups`` — group payload is that type's distinct cents, never
    its rows.

    Output: event_type, n, median2_cents (BIGINTs).
    """
    import ray
    from ray.data.aggregate import Sum as _Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b["event_type"],
                "c": to_cents(b["value"]),
            }
        )
        g = t.group_by(["event_type", "c"]).aggregate([("c", "count")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "c": g["c"],
                "n": pc.cast(g["c_count"], pa.int64()),
            }
        )

    counts = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "c"])
        .aggregate(_Sum("n", alias_name="n"))
    )

    def resolve(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("c", "ascending")])
        g = group.take(order)
        c = g["c"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        total = int(n.sum())
        cum = np.cumsum(n)
        # 1-based ranks of the two middles: (total+1)//2 and total//2 + 1
        lo_r, hi_r = (total + 1) // 2, total // 2 + 1
        lo_v = int(c[np.searchsorted(cum, lo_r)])
        hi_v = int(c[np.searchsorted(cum, hi_r)])
        return pa.table(
            {
                "event_type": g["event_type"][:1],
                "n": pa.array([total], pa.int64()),
                "median2_cents": pa.array([lo_v + hi_v], pa.int64()),
            }
        )

    return counts.groupby("event_type").map_groups(
        resolve, batch_format="pyarrow"
    )


def q16_supplier_census(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q16 shape restated over this corpus (no partsupp table):
    distinct-supplier count per (p_brand, p_size band) from lineitem
    part↔supplier co-occurrence, EXCLUDING "complaint" suppliers
    (s_acctbal < 0) via an anti-join-style broadcast blocklist.

    Scale plan: the complaint supplier set and the part attribute map are
    both dimension-sized broadcasts (``ray.put`` once); lineitem reduces
    per block to DISTINCT (brand, band, suppkey) triples before the one
    dedup groupby — exchange ∝ distinct triples, never lineitems.

    Output: p_brand, size_band (BIGINT p_size // 10), n_suppliers.
    """
    import pyarrow.parquet as _pq

    import ray
    from ray.data.aggregate import Count as _Count

    part = _pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    supp = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    )
    bad = supp.filter(pc.less(supp["s_acctbal"], 0.0))["s_suppkey"]
    part_ref = ray.put(
        pa.table(
            {
                "p_partkey": pc.cast(part["p_partkey"], pa.int64()),
                "p_brand": part["p_brand"],
                "band": pc.cast(
                    pc.divide(part["p_size"], 10), pa.int64()
                ),
            }
        ).combine_chunks()
    )
    bad_ref = ray.put(pc.cast(bad, pa.int64()).combine_chunks())

    def triples(b: pa.Table) -> pa.Table:
        from ..util import cached_get

        pmap: pa.Table = cached_get(part_ref)
        badk = cached_get(bad_ref)
        keep = pc.invert(
            pc.is_in(pc.cast(b["l_suppkey"], pa.int64()), value_set=badk)
        )
        t = b.filter(keep)
        pos = pc.index_in(
            pc.cast(t["l_partkey"], pa.int64()), value_set=pmap["p_partkey"]
        )
        tt = pa.table(
            {
                "p_brand": pc.take(pmap["p_brand"], pos),
                "size_band": pc.take(pmap["band"], pos),
                "s": pc.cast(t["l_suppkey"], pa.int64()),
            }
        )
        g = tt.group_by(["p_brand", "size_band", "s"]).aggregate(
            [("s", "count")]
        )
        return g.select(["p_brand", "size_band", "s"])

    import ray.data

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    distinct = (
        li.map_batches(triples, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["p_brand", "size_band", "s"])
        .aggregate(_Count(alias_name="_c"))
    )

    def census(b: pa.Table) -> pa.Table:
        g = b.select(["p_brand", "size_band", "s"]).group_by(
            ["p_brand", "size_band"]
        ).aggregate([("s", "count")])
        return pa.table(
            {
                "p_brand": g["p_brand"],
                "size_band": g["size_band"],
                "n_suppliers": pc.cast(g["s_count"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        distinct.map_batches(census, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["p_brand", "size_band"])
        .aggregate(_Sum("n_suppliers", alias_name="n_suppliers"))
    )


def q11_important_parts(sf_dir: str, fraction_ppm: int = 500) -> "ray.data.Dataset":
    """TPC-H Q11 shape (important stock) restated over lineitem: parts
    whose total extended-price value exceeds ``fraction_ppm`` parts-per-
    million of the GLOBAL total — the HAVING-against-a-scalar-subquery
    pattern, decided in exact integer cross-multiplication
    (10⁶ · part_value > fraction_ppm · total_value).

    Scale plan: one combiner-first per-part aggregate (exchange is
    part-domain-sized); the global total is a Sum over the same partials'
    dataset; the filter broadcasts just two scalars.

    Output: l_partkey, value_c, share_ppm (BIGINTs).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum as _Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": pc.cast(b["l_partkey"], pa.int64()),
                "v": to_cents(b["l_extendedprice"]),
            }
        )
        g = t.group_by(["l_partkey"]).aggregate([("v", "sum")])
        return pa.table({"l_partkey": g["l_partkey"], "v": g["v_sum"]})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    )
    per_part = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_partkey")
        .aggregate(_Sum("v", alias_name="value_c"))
        .materialize()  # part-sized; shared by the total pass + the filter
    )
    total = per_part.sum("value_c")

    def finish(b: pa.Table) -> pa.Table:
        v = b["value_c"].to_numpy(zero_copy_only=False)
        keep = 1_000_000 * v > fraction_ppm * total
        t = pa.table(
            {
                "l_partkey": b["l_partkey"],
                "value_c": b["value_c"],
                "share_ppm": pa.array(
                    (1_000_000 * v) // max(total, 1), pa.int64()
                ),
            }
        )
        return t.filter(pa.array(keep))

    return per_part.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def q20_dominant_suppliers(
    sf_dir: str, share_ppm: int = 200_000
) -> "ray.data.Dataset":
    """TPC-H Q20 shape restated over this corpus (no partsupp): suppliers
    who shipped MORE THAN ``share_ppm`` ppm (default 20%) of some part's total quantity
    — the two-level aggregate + ratio filter (per-(part, supplier) volume
    vs per-part volume), decided in exact integer cross-multiplication.

    Scale plan: one combiner pass reduces lineitem to (part, supplier)
    quantity partials; ONE groupby keyed on (part, supplier) finishes the
    fine level, and the part totals derive from the SAME reduced table
    with a map-side re-reduce + second small groupby — raw rows cross one
    exchange exactly once. The supplier name attaches via broadcast.

    Output: l_partkey, s_suppkey, s_name, qty, part_qty, share_ppm.
    """
    import pyarrow.parquet as _pq

    import ray
    import ray.data
    from ray.data.aggregate import Sum as _Sum

    def partial(b: pa.Table) -> pa.Table:
        q = np.rint(
            b["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        t = pa.table(
            {
                "l_partkey": pc.cast(b["l_partkey"], pa.int64()),
                "s_suppkey": pc.cast(b["l_suppkey"], pa.int64()),
                "qty": pa.array(q, pa.int64()),
            }
        )
        g = t.group_by(["l_partkey", "s_suppkey"]).aggregate([("qty", "sum")])
        return pa.table(
            {
                "l_partkey": g["l_partkey"],
                "s_suppkey": g["s_suppkey"],
                "qty": g["qty_sum"],
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    )
    fine = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_partkey", "s_suppkey"])
        .aggregate(_Sum("qty", alias_name="qty"))
        .materialize()  # (part, supplier)-sized; feeds both levels below
    )

    def part_partial(b: pa.Table) -> pa.Table:
        g = b.select(["l_partkey", "qty"]).group_by(["l_partkey"]).aggregate(
            [("qty", "sum")]
        )
        return pa.table(
            {"l_partkey": g["l_partkey"], "part_qty": g["qty_sum"]}
        )

    from ..util import collect_table

    totals = collect_table(
        fine.map_batches(
            part_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("l_partkey")
        .aggregate(_Sum("part_qty", alias_name="part_qty"))
    )
    supp = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).combine_chunks()
    tot_ref = ray.put(totals.combine_chunks())
    supp_ref = ray.put(supp)

    def finish(b: pa.Table) -> pa.Table:
        from ..util import cached_get

        tot: pa.Table = cached_get(tot_ref)
        sdim: pa.Table = cached_get(supp_ref)
        pos = pc.index_in(b["l_partkey"], value_set=tot["l_partkey"])
        part_qty = pc.take(tot["part_qty"], pos).to_numpy(
            zero_copy_only=False
        )
        qty = b["qty"].to_numpy(zero_copy_only=False)
        keep = 1_000_000 * qty > share_ppm * part_qty
        t = pa.table(
            {
                "l_partkey": b["l_partkey"],
                "s_suppkey": b["s_suppkey"],
                "qty": b["qty"],
                "part_qty": pa.array(part_qty, pa.int64()),
                "share_ppm": pa.array(
                    (1_000_000 * qty) // np.maximum(part_qty, 1), pa.int64()
                ),
            }
        ).filter(pa.array(keep))
        spos = pc.index_in(t["s_suppkey"], value_set=sdim["s_suppkey"])
        return t.append_column("s_name", pc.take(sdim["s_name"], spos))

    return fine.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q2_cheapest_supplier(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q2 shape restated over lineitem (no partsupp): per part, the
    supplier offering the LOWEST observed unit cost — the grouped-argmin-
    with-attribute-fetch pattern (min over a group, then the winning ROW's
    attributes, ties to the lowest suppkey).

    Unit cost compares as ⌊price_e4·100 / round(qty)⌋ (integer micro-units
    per unit; floor division restated identically in SQL), and the argmin
    packs (cost_micro, suppkey) into ONE int64 so a plain Min aggregate
    resolves both the value and the deterministic tie — no per-group sort,
    no row_number window. Combiner-first: each block pre-reduces to its
    per-part min before the single part-keyed groupby.

    Output: l_partkey, s_suppkey, s_name, cost_micro (BIGINTs).
    """
    import pyarrow.parquet as _pq

    import ray
    import ray.data
    from ray.data.aggregate import Min as _Min

    KEY_BITS = 20  # suppkey < 2^20 (10^6 suppliers per SF unit at SF~100)

    def partial(b: pa.Table) -> pa.Table:
        qty = np.rint(
            b["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        price_c = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        cost = (price_c * 10_000) // np.maximum(qty, 1)  # micro-$/unit
        packed = (cost << KEY_BITS) | b["l_suppkey"].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        t = pa.table(
            {
                "l_partkey": pc.cast(b["l_partkey"], pa.int64()),
                "packed": pa.array(packed, pa.int64()),
            }
        )
        g = t.group_by(["l_partkey"]).aggregate([("packed", "min")])
        return pa.table(
            {"l_partkey": g["l_partkey"], "packed": g["packed_min"]}
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"],
    )
    mins = (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_partkey")
        .aggregate(_Min("packed", alias_name="packed"))
    )
    supp = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).combine_chunks()
    ref = ray.put(supp)

    def finish(b: pa.Table) -> pa.Table:
        from ..util import cached_get

        sdim: pa.Table = cached_get(ref)
        packed = b["packed"].to_numpy(zero_copy_only=False)
        cost = packed >> KEY_BITS
        sk = packed & ((1 << KEY_BITS) - 1)
        pos = pc.index_in(pa.array(sk, pa.int64()), value_set=sdim["s_suppkey"])
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "s_suppkey": pa.array(sk, pa.int64()),
                "s_name": pc.take(sdim["s_name"], pos),
                "cost_micro": pa.array(cost, pa.int64()),
            }
        )

    return mins.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q21_last_to_ship(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """TPC-H Q21 shape restated on available columns (no commit/receipt
    dates): per supplier, the number of MULTI-supplier orders where that
    supplier was strictly the LAST to ship — the "who kept the order
    waiting" blame census.

    Two combiner-first exchanges, both over reduced keys: (1) per-
    (order, supplier) max ship DAY (pair-sized, lineitem never crosses),
    (2) per-order packed argmax reduction. Unique-argmax detection packs
    (ship_day << 20 | suppkey) and (ship_day << 20 | (MASK − suppkey))
    into two int64 Max aggregates: they name the same supplier iff the
    max ship day is held by exactly one supplier (a tie flips the two
    tie-break directions apart). Distinct-supplier counts per order are
    exact because pass-1 output is globally distinct pairs. ship_day
    (days since epoch, < 2^20 until year 4840) and suppkey < 2^20 share
    the packing budget, same contract as q2_cheapest_supplier.

    Output: s_suppkey, s_name, n_orders (BIGINT) — top-k by
    (n_orders DESC, s_suppkey).
    """
    import pyarrow.parquet as _pq

    import ray
    from ray.data.aggregate import Max as _Max

    KEY_BITS = 20
    MASK = (1 << KEY_BITS) - 1

    def pair_partial(b: pa.Table) -> pa.Table:
        day = (
            b["l_shipdate"]
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // 86_400_000_000
        )
        g = pa.table(
            {
                "okey": pc.cast(b["l_orderkey"], pa.int64()),
                "skey": pc.cast(b["l_suppkey"], pa.int64()),
                "ship_day": pa.array(day, pa.int64()),
            }
        ).group_by(["okey", "skey"]).aggregate([("ship_day", "max")])
        return pa.table(
            {"okey": g["okey"], "skey": g["skey"], "ship_day": g["ship_day_max"]}
        )

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        )
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["okey", "skey"])
        .aggregate(_Max("ship_day", alias_name="ship_day"))
    )

    def order_partial(b: pa.Table) -> pa.Table:
        sd = b["ship_day"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = b["skey"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "okey": b["okey"],
                "p_hi": pa.array((sd << KEY_BITS) | sk, pa.int64()),
                "p_lo": pa.array((sd << KEY_BITS) | (MASK - sk), pa.int64()),
                "n_supp": pa.array(np.ones(len(sd), np.int64)),
            }
        ).group_by(["okey"]).aggregate(
            [("p_hi", "max"), ("p_lo", "max"), ("n_supp", "sum")]
        )
        return pa.table(
            {
                "okey": t["okey"],
                "p_hi": t["p_hi_max"],
                "p_lo": t["p_lo_max"],
                "n_supp": t["n_supp_sum"],
            }
        )

    per_order = (
        pairs.map_batches(order_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("okey")
        .aggregate(
            _Max("p_hi", alias_name="p_hi"),
            _Max("p_lo", alias_name="p_lo"),
            Sum("n_supp", alias_name="n_supp"),
        )
    )

    def blame_partial(b: pa.Table) -> pa.Table:
        hi = b["p_hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = b["p_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n_supp"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_hi = hi & MASK
        s_lo = MASK - (lo & MASK)
        blamed = (n >= 2) & (s_hi == s_lo)
        sk = s_hi[blamed]
        if not len(sk):
            return pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        g = pa.table(
            {
                "s_suppkey": pa.array(sk, pa.int64()),
                "n_orders": pa.array(np.ones(len(sk), np.int64)),
            }
        ).group_by(["s_suppkey"]).aggregate([("n_orders", "sum")])
        return pa.table(
            {"s_suppkey": g["s_suppkey"], "n_orders": g["n_orders_sum"]}
        )

    counts = (
        per_order.map_batches(
            blame_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("s_suppkey")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )

    supp = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).combine_chunks()
    ref = ray.put(supp)

    def finish(b: pa.Table) -> pa.Table:
        from ..util import cached_get

        sdim: pa.Table = cached_get(ref)
        pos = pc.index_in(
            pc.cast(b["s_suppkey"], pa.int64()),
            value_set=pc.cast(sdim["s_suppkey"], pa.int64()),
        )
        return pa.table(
            {
                "s_suppkey": pc.cast(b["s_suppkey"], pa.int64()),
                "s_name": pc.take(sdim["s_name"], pos),
                "n_orders": b["n_orders"],
            }
        )

    return (
        counts.map_batches(finish, batch_format="pyarrow")
        .sort(["n_orders", "s_suppkey"], descending=[True, False])
        .limit(k)
    )


def ks_statistic(
    events_ds: "ray.data.Dataset",
    type_a: str = "purchase",
    type_b: str = "click",
) -> "ray.data.Dataset":
    """Exact two-sample Kolmogorov–Smirnov statistic between the value
    distributions of two event types — the distribution-drift audit a
    training-data pipeline runs between snapshots (did today's `purchase`
    value distribution shift vs `click`, or vs yesterday's?).

    KS = sup_v |F_a(v) − F_b(v)|. Everything stays in integers: with
    per-value counts c_a, c_b and totals n_a, n_b, the supremum of
    |cum_a/n_a − cum_b/n_b| equals max |cum_a·n_b − cum_b·n_a| / (n_a·n_b),
    so the reported ``ks_num`` is an exact BIGINT and ``ks_ppm`` its
    floor-scaled ratio — no float ever enters.

    Scale plan: raw events reduce combiner-first to one row per distinct
    cents value (two count columns) — the exchange is distinct-value-sized,
    never event-sized. The irreducible global cumulative runs over that
    sorted distinct table with the block-offset machinery (pass 1 reduces
    each block to its first key + per-block count sums — block-count-sized
    on the driver — pass 2 adds prefix offsets and takes a per-block max
    partial; a final tiny aggregate reduces the block partials).

    Output: one row — n_a, n_b, ks_num, ks_ppm (all BIGINT).
    """
    from ray.data.aggregate import Sum as _Sum

    OUT = pa.schema(
        [
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
            ("ks_num", pa.int64()),
            ("ks_ppm", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"], value_set=pa.array([type_a, type_b]))
        t = b.filter(m)
        if t.num_rows == 0:
            return pa.table(
                {
                    "v": pa.array([], pa.int64()),
                    "c_a": pa.array([], pa.int64()),
                    "c_b": pa.array([], pa.int64()),
                }
            )
        is_a = pc.equal(t["event_type"], type_a)
        g = pa.table(
            {
                "v": to_cents(t["value"]),
                "c_a": pc.cast(is_a, pa.int64()),
                "c_b": pc.cast(pc.invert(is_a), pa.int64()),
            }
        ).group_by(["v"]).aggregate([("c_a", "sum"), ("c_b", "sum")])
        return pa.table({"v": g["v"], "c_a": g["c_a_sum"], "c_b": g["c_b_sum"]})

    counts = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(_Sum("c_a", alias_name="c_a"), _Sum("c_b", alias_name="c_b"))
    )
    ordered = counts.sort("v").materialize()

    def block_head(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "v": pa.array([], pa.int64()),
                    "s_a": pa.array([], pa.int64()),
                    "s_b": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "v": batch["v"][:1],
                "s_a": pa.array([pc.sum(batch["c_a"]).as_py() or 0], pa.int64()),
                "s_b": pa.array([pc.sum(batch["c_b"]).as_py() or 0], pa.int64()),
            }
        )

    heads = ordered.map_batches(
        block_head, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()  # block-count-sized driver collect, same as NTILE/Gini
    heads.sort(key=lambda r: r["v"])
    n_a = sum(r["s_a"] for r in heads)
    n_b = sum(r["s_b"] for r in heads)
    if n_a == 0 or n_b == 0:
        return ray.data.from_arrow(OUT.empty_table())
    off: dict[int, tuple[int, int]] = {}
    acc_a = acc_b = 0
    for r in heads:
        off[r["v"]] = (acc_a, acc_b)
        acc_a += r["s_a"]
        acc_b += r["s_b"]

    def block_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"m": pa.array([], pa.int64())})
        o_a, o_b = off[batch["v"][0].as_py()]
        cum_a = o_a + np.cumsum(batch["c_a"].to_numpy(zero_copy_only=False))
        cum_b = o_b + np.cumsum(batch["c_b"].to_numpy(zero_copy_only=False))
        # int64 bound: cum ≤ n, so |cum_a·n_b − cum_b·n_a| ≤ 2·n_a·n_b —
        # fine to ~3e9 events per side; beyond that switch to object ints.
        d = np.abs(cum_a * n_b - cum_b * n_a)
        return pa.table({"m": pa.array([int(d.max())], pa.int64())})

    parts = ordered.map_batches(
        block_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return OUT.empty_table()
        ks = int(pc.max(b["m"]).as_py())
        return pa.table(
            {
                "n_a": pa.array([n_a], pa.int64()),
                "n_b": pa.array([n_b], pa.int64()),
                "ks_num": pa.array([ks], pa.int64()),
                "ks_ppm": pa.array([(1_000_000 * ks) // (n_a * n_b)], pa.int64()),
            }
        )

    # the block partials are block-count-sized: one repartition(1) + finish
    return parts.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def decayed_user_scores(
    events_ds: "ray.data.Dataset", w: int = 40, k: int = 20
) -> "ray.data.Dataset":
    """Exponentially time-decayed per-user activity score — the freshness-
    weighted leaderboard (a recency-biased heavy-hitter census: yesterday's
    burst outweighs last month's).

    Each event contributes ``2^(w − age_days)`` where ``age_days`` is whole
    days before the corpus' newest event; contributions older than ``w``
    days decay to exactly 0. Powers of two keep every weight and sum
    BIGINT-exact (no float decay drift), and the SQL oracle restates the
    same integers via ``POWER(2, …)`` — exactly representable doubles up
    to 2^53.

    Scale plan: one tiny aggregate finds the global max day (driver
    scalar), then a combiner-first per-(user, age) reduction inside each
    block multiplies counts by the shared weight table — the exchange is
    user-sized. Top-k by (score desc, user_id asc) bounds the result.

    Output: user_id, score, n_events (BIGINT), k rows.
    """
    from ray.data.aggregate import Max as _Max, Sum as _Sum

    DAY_US = 86_400_000_000

    def day_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64())})
        d = pc.cast(b["ts"], pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {"d": pa.array([pc.max(pc.divide(d, DAY_US)).as_py()], pa.int64())}
        )

    md_rows = (
        events_ds.map_batches(day_partial, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(_Max("d", alias_name="max_d"))
    )
    max_day = int(md_rows["max_d"])

    def partial(b: pa.Table) -> pa.Table:
        d = (
            pc.cast(b["ts"], pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // DAY_US
        )
        age = np.minimum(max_day - d, w + 1)
        wt = np.where(age <= w, np.int64(1) << (w - np.minimum(age, w)), 0)
        g = pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "score": pa.array(wt, pa.int64()),
                "n_events": pa.array(np.ones(len(wt), np.int64)),
            }
        ).group_by(["user_id"]).aggregate([("score", "sum"), ("n_events", "sum")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "score": g["score_sum"],
                "n_events": g["n_events_sum"],
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(_Sum("score", alias_name="score"), _Sum("n_events", alias_name="n_events"))
        .sort(["score", "user_id"], descending=[True, False])
        .limit(k)
    )


def skyline_users(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact 2-D Pareto skyline of users over (total spend, recency) — the
    classic dominance frontier: a user is ON the skyline when no other user
    has (total_cents >= , last_us >=) with at least one strict inequality.
    Equal points dominate neither direction, so exact (total, last)
    duplicates all survive.

    Scale shape: raw events reduce combiner-first to one row per user (the
    only data-sized exchange), the user census takes the irreducible
    distributed sort by (total DESC, last DESC, user ASC), and the frontier
    test is a per-block vectorized scan stitched with BLOCK-CARRY state —
    pass 1 reduces each sorted block to a 4-field summary (head key, tail
    total, tail-group max, pre-tail max), the driver folds the summaries in
    order into per-block carries (block-count-sized work, like the NTILE /
    Gini rank offsets), and pass 2 finishes each block locally. Nothing
    user-sized ever lands on the driver.

    Survivor rule under the sort (groups = equal-total runs, each group's
    max last is its head): keep a row iff its last equals its GROUP max
    (ties included) and strictly exceeds the running max over all
    STRICTLY-greater-total groups.

    Output: user_id, total_cents, last_us (BIGINTs), sorted by user_id.
    """
    import ray
    from ray.data.aggregate import Max as _Max, Sum as _Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "cents": to_cents(b["value"]),
                "ts_us": pc.cast(pc.cast(b["ts"], pa.int64()), pa.int64()),
            }
        )
        g = t.group_by(["user_id"]).aggregate([("cents", "sum"), ("ts_us", "max")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "total_cents": pc.cast(g["cents_sum"], pa.int64()),
                "last_us": pc.cast(g["ts_us_max"], pa.int64()),
            }
        )

    agg = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(
            _Sum("total_cents", alias_name="total_cents"),
            _Max("last_us", alias_name="last_us"),
        )
    )
    ordered = agg.sort(
        ["total_cents", "last_us", "user_id"], descending=[True, True, False]
    ).materialize()

    NEG = np.iinfo(np.int64).min

    def block_summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "h_total": pa.array([], pa.int64()),
                    "h_last": pa.array([], pa.int64()),
                    "h_user": pa.array([], pa.int64()),
                    "t_total": pa.array([], pa.int64()),
                    "tailgrp_max": pa.array([], pa.int64()),
                    "pretail_max": pa.array([], pa.int64()),
                }
            )
        t = b["total_cents"].to_numpy(zero_copy_only=False)
        l = b["last_us"].to_numpy(zero_copy_only=False)
        tail = t[-1]
        in_tail = t == tail
        # within a group last is descending, so a portion's max is its first
        # row; ACROSS groups last is not monotone, so the pre-tail max is the
        # max over the in-block group HEADS (first row of each equal-total
        # run), never just the first non-tail row
        tailgrp_max = int(l[in_tail][0])
        starts = np.r_[True, t[1:] != t[:-1]]
        pre = l[starts & ~in_tail]
        return pa.table(
            {
                "h_total": pa.array([int(t[0])], pa.int64()),
                "h_last": pa.array([int(l[0])], pa.int64()),
                "h_user": pc.cast(b["user_id"][:1], pa.int64()),
                "t_total": pa.array([int(tail)], pa.int64()),
                "tailgrp_max": pa.array([tailgrp_max], pa.int64()),
                "pretail_max": pa.array(
                    [int(pre.max()) if len(pre) else NEG], pa.int64()
                ),
            }
        )

    summaries = ordered.map_batches(
        block_summary, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()  # block-count-sized by construction
    # fold in global sort order (head key DESC total, DESC last, ASC user)
    summaries.sort(key=lambda r: (-r["h_total"], -r["h_last"], r["h_user"]))
    carries: dict[tuple, tuple] = {}
    strict_max = NEG  # max last over completed strictly-greater-total groups
    cur_total: int | None = None  # total of the group in progress
    cur_group_max = NEG
    for s in summaries:
        key = (s["h_total"], s["h_last"], s["h_user"])
        if cur_total is not None and s["h_total"] != cur_total:
            # group completed exactly at the previous block boundary
            strict_max = max(strict_max, cur_group_max)
            cur_total, cur_group_max = None, NEG
        carries[key] = (strict_max, cur_total, cur_group_max)
        # advance state through this block (invariant here: cur_total is
        # None or equals the block's head total)
        if s["h_total"] == s["t_total"]:
            # whole block is one group (fresh, or continuing the open one)
            cur_total = s["t_total"]
            cur_group_max = max(cur_group_max, s["tailgrp_max"])
        else:
            # the open group (if any) and every pre-tail group complete here
            strict_max = max(strict_max, cur_group_max, s["pretail_max"])
            cur_total = s["t_total"]
            cur_group_max = s["tailgrp_max"]

    car_ref = ray.put(carries)

    OUT = pa.schema(
        [("user_id", pa.int64()), ("total_cents", pa.int64()), ("last_us", pa.int64())]
    )

    def frontier(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return OUT.empty_table()
        cars = ray.get(car_ref)
        t = b["total_cents"].to_numpy(zero_copy_only=False)
        l = b["last_us"].to_numpy(zero_copy_only=False)
        u = b["user_id"].to_numpy(zero_copy_only=False)
        S, T, G = cars[(int(t[0]), int(l[0]), int(u[0]))]
        new_grp = np.r_[True, t[1:] != t[:-1]]
        gid = np.cumsum(new_grp) - 1
        # per-group in-block max last = value at group head (last desc in group)
        head_last = l[new_grp]
        grp_max = head_last.copy()
        if T is not None and t[0] == T:
            grp_max[0] = max(grp_max[0], G)
        # strict prefix max over groups BEFORE each group (carry + in-block)
        before = np.empty(len(grp_max), dtype=np.int64)
        before[0] = S
        if len(grp_max) > 1:
            before[1:] = np.maximum.accumulate(
                np.maximum(grp_max, S).astype(np.int64)
            )[:-1]
        keep = (l == grp_max[gid]) & (l > before[gid])
        return pa.table(
            {
                "user_id": pa.array(u[keep], pa.int64()),
                "total_cents": pa.array(t[keep], pa.int64()),
                "last_us": pa.array(l[keep], pa.int64()),
            }
        )

    return ordered.map_batches(
        frontier, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).sort("user_id")


def order_total_reconciliation(sf_dir: str) -> "ray.data.Dataset":
    """Financial reconciliation audit: does each order's header total match
    the sum of its line items' net charge? The line-side net rides the
    repo-wide integer domain — ``cents(extendedprice) ×
    (100 − pct(discount)) × (100 + pct(tax))`` (units of 10⁻⁴ cent·pct²)
    — so per-order sums are associative-exact under any combine order; the
    header total is scaled into the same unit (× 100 × 100) and the census
    reports how many orders match / overshoot / undershoot and the total
    absolute drift.

    Scale shape: the lineitem scan pre-reduces per block (Arrow group_by on
    l_orderkey) before ONE order-keyed groupby; the header side joins
    through the hash join (both sides order-count-sized); the final census
    is a 3-row groupby. int64 holds the drift sum to ~10³ orders × 10¹¹ —
    swap the final Sum for a Python-int fold past that (documented bound).

    Output: bucket (match|over|under), n_orders, abs_drift (BIGINT),
    sorted by bucket.
    """
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    from .joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def li_partial(b: pa.Table) -> pa.Table:
        ep = to_cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        d = to_cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        t = to_cents(b["l_tax"]).to_numpy(zero_copy_only=False)
        net = ep * (100 - d) * (100 + t)
        g = (
            pa.table(
                {
                    "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                    "net": pa.array(net, pa.int64()),
                }
            )
            .group_by(["l_orderkey"])
            .aggregate([("net", "sum")])
        )
        return pa.table(
            {"l_orderkey": g["l_orderkey"], "net": pc.cast(g["net_sum"], pa.int64())}
        )

    from ..util import hash_partitioned_agg

    # orderkey-domain output (~10^5 groups at sf0.1): hash-partitioned
    # Arrow merge, not the built-in per-group reduce (~70 µs/group)
    per_order = hash_partitioned_agg(
        li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_orderkey"],
        aggs=[("net", "sum", "net")],
    )
    j = hash_join(per_order, orders, on="l_orderkey", right_on="o_orderkey",
                  coalesce="left")

    def bucketize(b: pa.Table) -> pa.Table:
        net = b["net"].to_numpy(zero_copy_only=False)
        tp = to_cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)
        diff = net - tp * 10_000
        bucket = np.where(diff == 0, "match", np.where(diff > 0, "over", "under"))
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.string()),
                "n_orders": pa.array(np.ones(len(diff), np.int64)),
                "abs_drift": pa.array(np.abs(diff), pa.int64()),
            }
        ).group_by(["bucket"]).aggregate([("n_orders", "sum"), ("abs_drift", "sum")])

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": b["bucket"],
                "n_orders": pc.cast(b["n_orders_sum"], pa.int64()),
                "abs_drift": pc.cast(b["abs_drift_sum"], pa.int64()),
            }
        )

    return (
        j.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(_Sum("n_orders", alias_name="n_orders"),
                   _Sum("abs_drift", alias_name="abs_drift"))
        .sort("bucket")
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_daily_type_counts(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """PIVOT the (day, event_type) census into one WIDE row per day — the
    narrow→wide reshape (SQL ``COUNT(*) FILTER`` columns / Spark
    ``pivot()``), fixed type domain declared up front (``EVENT_TYPES``)
    exactly as SQL requires.

    Scale shape: the pivot happens INSIDE the per-block combiner (each
    block reduces to one wide row per day — conditional sums, no
    row-explosion), so the single day-keyed groupby exchanges ~5 int
    columns per day per block and unknown types are counted into ``other``
    rather than dropped (auditable, not silent).

    Output: day, click, error, purchase, signup, view, other, total
    (BIGINTs), sorted by day.
    """
    from ray.data.aggregate import Sum as _Sum

    cols = list(EVENT_TYPES)

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch["ts"], unit="day")
        et = batch["event_type"]
        data = {"day": day}
        known = None
        for c in cols:
            flag = pc.cast(pc.equal(et, c), pa.int64())
            data[c] = flag
            known = flag if known is None else pc.add(known, flag)
        data["other"] = pc.subtract(pa.scalar(1, pa.int64()), known)
        t = pa.table(data)
        return t.group_by(["day"]).aggregate([(c, "sum") for c in cols + ["other"]])

    agg = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(*[_Sum(f"{c}_sum", alias_name=c) for c in cols + ["other"]])
    )

    def finish(b: pa.Table) -> pa.Table:
        out = {"day": b["day"]}
        total = None
        for c in cols + ["other"]:
            v = pc.cast(b[c], pa.int64())
            out[c] = v
            total = v if total is None else pc.add(total, v)
        out["total"] = total
        return pa.table(out)

    return agg.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    ).sort("day")


def copurchase_part_pairs(
    lineitem_ds: "ray.data.Dataset", k: int = 20, max_order_parts: int = 64
) -> "ray.data.Dataset":
    """Top-``k`` co-purchased PART pairs across orders — the items-bought-
    together (frequent-itemset size 2) miner behind every recommender
    bootstrap, over the fact table instead of the text corpus (the
    vocabulary analog is :func:`~.text.term_pair_cooccurrence`).

    A pair counts once per order containing both parts. An order's
    lineitems can SPAN input blocks (Ray splits large map outputs at
    ``target_max_block_size``), so per-block pair expansion would silently
    drop cross-block pairs — the same hazard the tf-idf DF pass fixed.
    The kernel therefore hash-partitions rows by ``l_orderkey`` first
    (exchange = two int64 columns, never prices or names), making every
    order wholly local to one partition, then expands pairs fully
    vectorized: rows sorted by (order, part), per-order distinct parts
    capped at the ``max_order_parts`` smallest part keys (bounds the
    quadratic blow-up at cap²/2 rows per order — documented contract),
    lefts = ``np.repeat`` by per-row remaining-group counts, rights =
    left + within-run offset + 1. No Python loop over orders or rows.

    Partition-local pair counts are PARTIAL (a pair recurs across
    partitions), so one pair-keyed ``hash_partitioned_agg`` sum follows,
    then a result-sized sort+limit.

    Output: part_a, part_b (part_a < part_b, BIGINT), n (BIGINT).
    """
    import polars as pl

    from ..util import hash_partitioned_agg

    n_parts = 32

    def add_part(b: pa.Table) -> pa.Table:
        col = b["l_orderkey"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = pl.from_arrow(col).hash(seed=7).to_numpy()
        part = (h >> np.uint64(33)) % np.uint64(n_parts)
        return pa.table(
            {
                "okey": b["l_orderkey"],
                "pkey": b["l_partkey"],
                "__part": pa.array(part.astype(np.int64), pa.int64()),
            }
        )

    def pairs_local(g: pa.Table) -> pa.Table:
        d = (
            pa.table({"okey": g["okey"], "pkey": g["pkey"]})
            .group_by(["okey", "pkey"])
            .aggregate([])
        )
        ok = d["okey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = d["pkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        nrows = len(ok)
        if nrows == 0:
            return pa.table(
                {
                    "part_a": pa.array([], pa.int64()),
                    "part_b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # group boundaries over the sorted (order, part) rows
        new = np.concatenate(([True], ok[1:] != ok[:-1]))
        gid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate((starts, [nrows])))
        # cap: keep only the first max_order_parts rows of each group
        # (sorted by part key, so the cap set is deterministic)
        pos_in_group = np.arange(nrows) - starts[gid]
        keep = pos_in_group < max_order_parts
        ok, pk, gid = ok[keep], pk[keep], gid[keep]
        pos = pos_in_group[keep]
        csizes = np.minimum(sizes, max_order_parts)[gid]
        # each kept row is the LEFT of (group_size - pos - 1) pairs
        c = (csizes - pos - 1).astype(np.int64)
        total = int(c.sum())
        if total == 0:
            return pa.table(
                {
                    "part_a": pa.array([], pa.int64()),
                    "part_b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        lefts = np.repeat(np.arange(len(c)), c)
        run_start = np.repeat(np.concatenate(([0], np.cumsum(c)[:-1])), c)
        offset = np.arange(total) - run_start
        rights = lefts + offset + 1
        t = pa.table(
            {
                "part_a": pa.array(pk[lefts], pa.int64()),
                "part_b": pa.array(pk[rights], pa.int64()),
            }
        )
        gg = t.group_by(["part_a", "part_b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "part_a": gg["part_a"],
                "part_b": gg["part_b"],
                "n": pc.cast(gg["count_all"], pa.int64()),
            }
        )

    partial = (
        lineitem_ds.map_batches(
            add_part, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__part")
        .map_groups(pairs_local, batch_format="pyarrow")
    )
    counts = hash_partitioned_agg(
        partial, ["part_a", "part_b"], [("n", "sum", "n")]
    )
    return (
        counts.sort(["n", "part_a", "part_b"], descending=[True, False, False])
        .limit(k)
        .select_columns(["part_a", "part_b", "n"])
    )


def spend_decile_census(orders_ds: "ray.data.Dataset") -> pa.Table:
    """Customer-value decile census — how many customers and how much
    revenue sit in each exact spend decile — the whale-curve / LTV-band
    summary every monetization dashboard opens with.

    Three stages, none of which sorts the fact table:

    1. per-customer spend: one customer-keyed ``hash_partitioned_agg`` sum
       of exact order cents (the only all-to-all, two int64 columns);
    2. exact decile bounds of that customer-domain series via the shared-
       pass histogram selector (:func:`_hist_select_ranks` — all nine
       order statistics in ~log_bins(range) combiner-only scans, rank
       convention ``ceil(d·n/10) − 1`` as in :func:`value_deciles`);
    3. bucket every customer against the broadcast 9-value bound vector
       (``np.searchsorted`` side='left': decile = 1 + #bounds strictly
       below, ties land in the LOWER bucket — restated literally in the
       oracle as ``1 + Σ(spend > bound)``) and reduce to the ≤10-row
       census.

    Output: decile (1..10), n_customers, spend_cents — all BIGINT.
    """
    from ray.data.aggregate import Sum

    from ..util import collect_table, hash_partitioned_agg

    OUT = pa.schema(
        [
            ("decile", pa.int64()),
            ("n_customers", pa.int64()),
            ("spend_cents", pa.int64()),
        ]
    )

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": b["o_custkey"], "c": to_cents(b["o_totalprice"])}
        )

    # customer-domain-sized; materialized ONCE so the count, the
    # multi-pass selector, and the bucket stage don't each replay the
    # orderkey exchange
    spend = hash_partitioned_agg(
        orders_ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"],
        [("c", "sum", "spend")],
    ).materialize()
    import math

    n = spend.count()
    if n == 0:
        return OUT.empty_table()
    ranks = [max(math.ceil(d * n / 10), 1) - 1 for d in range(1, 10)]

    def to_ints(batch: pa.Table) -> np.ndarray:
        return batch["spend"].to_numpy(zero_copy_only=False)

    bounds = np.asarray(_hist_select_ranks(spend, to_ints, ranks), np.int64)

    def bucket(batch: pa.Table) -> pa.Table:
        s = batch["spend"].to_numpy(zero_copy_only=False)
        d = 1 + np.searchsorted(bounds, s, side="left")
        g = (
            pa.table(
                {
                    "decile": pa.array(d.astype(np.int64), pa.int64()),
                    "spend": batch["spend"],
                }
            )
            .group_by("decile")
            .aggregate([([], "count_all"), ("spend", "sum")])
        )
        return pa.table(
            {
                "decile": g["decile"],
                "n_customers": pc.cast(g["count_all"], pa.int64()),
                "spend_cents": pc.cast(g["spend_sum"], pa.int64()),
            }
        )

    census = collect_table(
        spend.map_batches(bucket, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("spend_cents", alias_name="spend_cents"),
        ),
        fallback_schema=OUT,
    )
    return census.select(["decile", "n_customers", "spend_cents"]).sort_by(
        "decile"
    )


def rfm_scores(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """RFM (recency / frequency / monetary) customer scoring over purchase
    events — the classic segmentation table: per user, days since last
    purchase (vs the corpus's latest purchase day), purchase count, exact
    cents spent, and a 1–4 quartile code per dimension.

    Distributed shape: one user-keyed :func:`~..util.hash_partitioned_agg`
    (max ts / count / sum cents — two thin int64 columns in the exchange),
    then the three quartile-bound triples come from the shared-pass
    histogram selector (:func:`_hist_select_ranks`, rank convention
    ``ceil(k·n/4) − 1`` — no sort), and every user is bucketed against the
    nine broadcast bounds (code = 1 + #bounds strictly below, ties in the
    LOWER bucket — the :func:`spend_decile_census` contract).

    Output: user_id, r_days, f_n, m_cents, r_code, f_code, m_code — all
    BIGINT, one row per purchasing user.
    """
    import math

    from ray.data.aggregate import Max

    from ..util import hash_partitioned_agg

    _US_PER_DAY = 86_400_000_000

    def cents_rows(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["event_type"], "purchase")
        t = b.filter(keep)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "c": to_cents(t["value"]),
            }
        )

    per_user = hash_partitioned_agg(
        events_ds.map_batches(cents_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        [("ts_us", "max", "last_us"), ("ts_us", "count", "f_n"), ("c", "sum", "m_cents")],
    ).materialize()
    n = per_user.count()
    if n == 0:
        # ADVICE r3: the intermediate per_user schema (last_us) is NOT the
        # documented output — return the empty seven-column BIGINT contract
        # so a purchase-free corpus still schema-matches the SQL oracle.
        # Returned as a pa.Table (an accepted queries() result type):
        # Dataset.to_pandas() on an empty dataset drops column names.
        return pa.table(
            {
                c: pa.array([], pa.int64())
                for c in (
                    "user_id", "r_days", "f_n", "m_cents",
                    "r_code", "f_code", "m_code",
                )
            }
        )

    ref = per_user.aggregate(Max("last_us"))["max(last_us)"]
    ref_day = int(ref) // _US_PER_DAY

    def with_r(b: pa.Table) -> pa.Table:
        last = b["last_us"].to_numpy(zero_copy_only=False)
        r = ref_day - last // _US_PER_DAY
        return pa.table(
            {
                "user_id": b["user_id"],
                "r_days": pa.array(r.astype(np.int64), pa.int64()),
                "f_n": pc.cast(b["f_n"], pa.int64()),
                "m_cents": pc.cast(b["m_cents"], pa.int64()),
            }
        )

    base = per_user.map_batches(
        with_r, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    ranks = [max(math.ceil(k * n / 4), 1) - 1 for k in (1, 2, 3)]
    bounds = {}
    for col in ("r_days", "f_n", "m_cents"):
        vals = _hist_select_ranks(
            base,
            lambda b, col=col: b[col].to_numpy(zero_copy_only=False),
            ranks,
        )
        bounds[col] = np.asarray(vals, np.int64)

    def code(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in ("user_id", "r_days", "f_n", "m_cents")}
        for c in ("r_days", "f_n", "m_cents"):
            v = b[c].to_numpy(zero_copy_only=False)
            cols[c[0] + "_code"] = pa.array(
                1 + np.searchsorted(bounds[c], v, side="left"), pa.int64()
            )
        return pa.table(cols)

    return base.map_batches(code, batch_format="pyarrow", zero_copy_batch=True)


def systematic_sample_events(
    events_ds: "ray.data.Dataset", step: int = 97
) -> "ray.data.Dataset":
    """Systematic (every ``step``-th) sample of the event stream under the
    deterministic global (ts, event_id) order — the fixed-rate probe a
    monitoring pipeline tails when hash sampling would decouple the sample
    from arrival order (grid coverage in TIME, not in key space; the
    complement of :func:`~.sketches.hash_sample`).

    Exact distributed ROW_NUMBER via the block-offset rank primitive
    (:func:`~.text._global_row_numbers` — one sort, block-count-sized
    driver fold, per-block ``offset + arange``); the filter
    ``(rank − 1) % step == 0`` then runs block-local. A prime default
    step avoids resonating with generator periodicities.

    Output: event_id, rank (BIGINTs), every ``step``-th event ascending.
    """
    from .text import _global_row_numbers

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                # score DESC in the primitive == ts ASC after negation
                "neg_ts": pc.negate_checked(pc.cast(b["ts"], pa.int64())),
            }
        )

    ranked = _global_row_numbers(
        events_ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True),
        "neg_ts",
        id_col="event_id",
    )

    def pick(b: pa.Table) -> pa.Table:
        r = b["rank"].to_numpy(zero_copy_only=False)
        keep = (r - 1) % step == 0
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "rank": pa.array(r[keep], pa.int64()),
            }
        )

    return ranked.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def asof_next_order(sf_dir: str) -> "ray.data.Dataset":
    """Forward as-of join: for every event, the EARLIEST order date of the
    same customer with o_orderdate ≥ ts (null when none) — "time to next
    purchase" enrichment, the mirror of :func:`asof_last_order` using the
    same co-partitioned large-large kernel with the searchsorted side
    flipped (``joins.asof_join_last(direction="forward")``).
    """
    import ray

    from .joins import asof_join_last

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    out = asof_join_last(
        events,
        orders,
        on="user_id",
        left_ts="ts",
        left_id="event_id",
        right_on="o_custkey",
        right_ts="o_orderdate",
        direction="forward",
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": b["lid"], "next_order_ts": b["asof_ts"]}
        )

    return out.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def fanout_histogram_lineitems(lineitem_ds: "ray.data.Dataset") -> pa.Table:
    """Referential fan-out histogram: how many orders have exactly k line
    items — the 1:N cardinality profile a join planner and a data-quality
    audit both read (a fat tail here predicts skewed joins; k is bounded
    by the schema at 7 in TPC-H-shaped data, so the histogram is tiny).

    Shape: one orderkey-keyed :func:`~..util.hash_partitioned_agg` count
    (the same exchange every orderkey census shares), then a combiner-first
    bincount over the counts — the k-domain is single-digit, so the final
    exchange is a handful of rows.

    Output: k, n_orders (BIGINTs), ascending k (orders present in
    lineitem only — k ≥ 1).
    """
    from ray.data.aggregate import Sum as _Sum

    from ..util import collect_table, hash_partitioned_agg

    per_order = hash_partitioned_agg(
        lineitem_ds.map_batches(
            lambda b: pa.table(
                {"l_orderkey": b["l_orderkey"]}
            ).append_column("one", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["l_orderkey"],
        [("one", "sum", "k")],
    )

    def census(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        g = pa.table({"k": pa.array(k, pa.int64())}).group_by("k").aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"k": g["k"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    t = collect_table(
        per_order.map_batches(census, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(_Sum("n", alias_name="n"))
    )
    order = pc.sort_indices(t, sort_keys=[("k", "ascending")])
    t = t.take(order)
    return pa.table(
        {
            "k": pc.cast(t["k"], pa.int64()),
            "n_orders": pc.cast(t["n"], pa.int64()),
        }
    )


def user_burstiness(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-user burstiness (index of dispersion) over their PRESENT-hour
    event counts: the variance-to-mean classification that separates
    Poisson-like steady users from bursty ones — exact integers via the
    cross-multiplied test

        overdispersed  ⇔  m·Q − S²  >  m·S     (var/mean > 1, both sides
                                                 × m·S; S > 0 always)

    with m = hours active, S = Σ counts, Q = Σ counts². Shape: per-block
    (user, hour) Arrow counts (combiner), ONE user-keyed exchange, and a
    per-user vectorized merge — the sufficient statistics travel, never
    the events.

    Output: user_id, m_hours, s_events, q_sumsq, overdispersed — BIGINTs.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "user_id": batch["user_id"],
                    "hr": pc.floor_temporal(batch["ts"], unit="hour"),
                }
            )
            .group_by(["user_id", "hr"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "hr": g["hr"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        # a user's (hour, partial-count) rows — merge duplicate hours
        # first (blocks overlap in hours), then reduce
        g = group.group_by(["user_id", "hr"]).aggregate([("n", "sum")])
        n = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(n)
        s = int(n.sum())
        q = int((n * n).sum())
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "m_hours": pa.array([m], pa.int64()),
                "s_events": pa.array([s], pa.int64()),
                "q_sumsq": pa.array([q], pa.int64()),
                "overdispersed": pa.array(
                    [int(m * q - s * s > m * s)], pa.int64()
                ),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(fold, batch_format="pyarrow")
    )


def funnel3_ordered(events_ds: "ray.data.Dataset") -> pa.Table:
    """Three-step ORDERED funnel (view → click → purchase): a user
    converts a step only with an event STRICTLY AFTER their previous
    step's conversion time — the sequential-funnel semantic (the 2-step
    :func:`~.windows.funnel` counts unordered presence; order is what
    distinguishes browsing-then-buying from buying-then-browsing).

    Per-user kernel: one sorted pass finding first 'view', then the first
    'click' after it, then the first 'purchase' after that; the global
    reduce sums four counters. Exact by construction (timestamps compared
    as int64 µs; ties broken by requiring strict >, restated identically
    in the SQL's chained MIN-after joins).

    Output: one row — n_users, n_view, n_view_click, n_full (BIGINTs).
    """
    from ray.data.aggregate import Sum as _Sum

    def flags(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        et = g["event_type"].to_pylist()
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        t1 = t2 = t3 = None
        for e, t in zip(et, ts):
            if t1 is None:
                if e == "view":
                    t1 = t
            elif t2 is None:
                if e == "click" and t > t1:
                    t2 = t
            elif t3 is None:
                if e == "purchase" and t > t2:
                    t3 = t
                    break
        return pa.table(
            {
                "u": pa.array([1], pa.int64()),
                "v": pa.array([int(t1 is not None)], pa.int64()),
                "vc": pa.array([int(t2 is not None)], pa.int64()),
                "f": pa.array([int(t3 is not None)], pa.int64()),
            }
        )

    agg = events_ds.groupby("user_id").map_groups(
        flags, batch_format="pyarrow"
    ).aggregate(
        _Sum("u", alias_name="u"),
        _Sum("v", alias_name="v"),
        _Sum("vc", alias_name="vc"),
        _Sum("f", alias_name="f"),
    )
    if not agg or agg.get("u") is None:
        agg = {"u": 0, "v": 0, "vc": 0, "f": 0}
    return pa.table(
        {
            "n_users": pa.array([int(agg["u"])], pa.int64()),
            "n_view": pa.array([int(agg["v"])], pa.int64()),
            "n_view_click": pa.array([int(agg["vc"])], pa.int64()),
            "n_full": pa.array([int(agg["f"])], pa.int64()),
        }
    )


def markov_entropy_rate(events_ds: "ray.data.Dataset") -> pa.Table:
    """Conditional entropy rate of the per-user event stream, in exact
    micro-nats: H(next | current) over the global first-order transition
    counts — the predictability score behind "is this traffic scriptable
    or organic" (0 ⇒ fully deterministic next-event; ln(K) ⇒ uniform).

    Same quantization contract as :func:`~.timeseries.mi_type_hod`:
    each ln(count) quantized once to micro-nats, then

        H_micro = trunc( Σ_{c,n} t_cn · (L(t_c·) − L(t_cn))  /  T )

    is pure integer arithmetic (t_c· = row marginal, T = total
    transitions; truncating division matches SQL ``//``).

    Shape: the transition census is :func:`~.windows.event_transitions`
    (per-user vectorized pairs, types²-sized exchange); the fold is a
    numpy pass over that domain-sized table.

    Output: one row — n_transitions, n_states, h_micro_nats (BIGINTs).
    Empty input → 0 rows.
    """
    from .windows import event_transitions
    from ..util import collect_table

    OUT = pa.schema(
        [
            ("n_transitions", pa.int64()),
            ("n_states", pa.int64()),
            ("h_micro_nats", pa.int64()),
        ]
    )
    t = collect_table(event_transitions(events_ds))
    if t.num_rows == 0:
        return OUT.empty_table()
    cur = t["from_type"].to_pylist()
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    states = sorted(set(cur))
    cix = np.array([states.index(c) for c in cur], dtype=np.int64)
    row = np.zeros(len(states), dtype=np.int64)
    np.add.at(row, cix, n)

    def L(v: np.ndarray) -> np.ndarray:
        return np.floor(np.log(v.astype(np.float64)) * 1_000_000 + 0.5).astype(
            np.int64
        )

    T = int(n.sum())
    num = int((n * (L(row)[cix] - L(n))).sum())
    h = -((-num) // T) if num < 0 else num // T
    return pa.table(
        {
            "n_transitions": pa.array([T], pa.int64()),
            "n_states": pa.array([len(states)], pa.int64()),
            "h_micro_nats": pa.array([h], pa.int64()),
        }
    )


def loo_source_word_deltas(docs_ds: "ray.data.Dataset") -> pa.Table:
    """Leave-one-source-out corpus statistic deltas: for each document
    source, the corpus mean words-per-doc WITHOUT that source vs the
    overall mean — the first-order data-valuation probe a curation
    pipeline ranks sources by ("dropping source X moves the corpus mean
    by Δ").

    Exact integers in micro-words: mean_micro = 1e6·ΣW // N (floor —
    counts nonnegative), computed per variant from per-source sufficient
    statistics (one tiny source-keyed exchange; word counts are a
    vectorized ``count_substring_regex(\\S+)`` per block — the same token
    definition as ``quality_documents``).

    Output: source, n_docs, sum_words, all_mean_micro, loo_mean_micro,
    delta_micro — BIGINTs (loo fields 0 when the source is the whole
    corpus).
    """
    from ray.data.aggregate import Sum as _Sum

    from ..util import collect_table

    OUT = pa.schema(
        [
            ("source", pa.string()),
            ("n_docs", pa.int64()),
            ("sum_words", pa.int64()),
            ("all_mean_micro", pa.int64()),
            ("loo_mean_micro", pa.int64()),
            ("delta_micro", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        w = pc.cast(
            pc.count_substring_regex(batch["text"], pattern=r"\S+"), pa.int64()
        )
        g = (
            pa.table({"source": batch["source"], "w": w})
            .group_by("source")
            .aggregate([("w", "sum"), ("w", "count")])
        )
        return pa.table(
            {
                "source": g["source"],
                "sum_words": pc.cast(g["w_sum"], pa.int64()),
                "n_docs": pc.cast(g["w_count"], pa.int64()),
            }
        )

    t = collect_table(
        docs_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            _Sum("sum_words", alias_name="sum_words"),
            _Sum("n_docs", alias_name="n_docs"),
        )
    )
    if t.num_rows == 0:
        return OUT.empty_table()
    src = t["source"].to_pylist()
    W = t["sum_words"].to_numpy(zero_copy_only=False).astype(np.int64)
    N = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
    Wt, Nt = int(W.sum()), int(N.sum())
    all_mean = 1_000_000 * Wt // Nt
    loo = np.zeros(len(src), dtype=np.int64)
    ok = (Nt - N) > 0
    loo[ok] = 1_000_000 * (Wt - W[ok]) // (Nt - N[ok])
    delta = np.where(ok, loo - all_mean, 0).astype(np.int64)
    order = np.argsort(np.array(src))
    return pa.table(
        {
            "source": pa.array([src[i] for i in order], pa.string()),
            "n_docs": pa.array(N[order], pa.int64()),
            "sum_words": pa.array(W[order], pa.int64()),
            "all_mean_micro": pa.array(
                np.full(len(src), all_mean, np.int64), pa.int64()
            ),
            "loo_mean_micro": pa.array(loo[order], pa.int64()),
            "delta_micro": pa.array(delta[order], pa.int64()),
        }
    )


def frequent_triples_parts(
    lineitem_ds: "ray.data.Dataset", k: int = 20, max_order_parts: int = 16
) -> "ray.data.Dataset":
    """Top-``k`` co-purchased part TRIPLES — the frequent-itemset size-3
    step (A-priori's next rung above :func:`copurchase_part_pairs`),
    counted once per order containing all three.

    Same scale contract as the pair miner: orderkey hash-partitioning
    makes each order wholly local (no cross-block loss), per-order
    distinct parts cap at the ``max_order_parts`` SMALLEST part keys
    (bounds the cubic blow-up at C(cap,3) per order — documented), and
    the triple expansion is a TWO-LEVEL vectorized repeat (pairs by
    remaining-count, then thirds by remaining-count again) — no Python
    loop over orders. Partition-local counts are partial; one
    triple-keyed ``hash_partitioned_agg`` sum finishes, then a
    result-sized sort+limit.

    Output: part_a < part_b < part_c (BIGINT), n (BIGINT).
    """
    import polars as pl

    from ..util import hash_partitioned_agg

    n_parts = 32
    EMPTY = pa.schema(
        [
            ("part_a", pa.int64()),
            ("part_b", pa.int64()),
            ("part_c", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def add_part(b: pa.Table) -> pa.Table:
        col = b["l_orderkey"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = pl.from_arrow(col).hash(seed=7).to_numpy()
        part = (h >> np.uint64(33)) % np.uint64(n_parts)
        return pa.table(
            {
                "okey": b["l_orderkey"],
                "pkey": b["l_partkey"],
                "__part": pa.array(part.astype(np.int64), pa.int64()),
            }
        )

    def triples_local(g: pa.Table) -> pa.Table:
        d = (
            pa.table({"okey": g["okey"], "pkey": g["pkey"]})
            .group_by(["okey", "pkey"])
            .aggregate([])
        )
        ok = d["okey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = d["pkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        nrows = len(ok)
        if nrows == 0:
            return EMPTY.empty_table()
        new = np.concatenate(([True], ok[1:] != ok[:-1]))
        gid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate((starts, [nrows])))
        pos_in_group = np.arange(nrows) - starts[gid]
        keep = pos_in_group < max_order_parts
        pk, gid = pk[keep], gid[keep]
        pos = pos_in_group[keep]
        csizes = np.minimum(sizes, max_order_parts)[gid]
        # level 1: pairs (i, j) with j > i inside the group
        c1 = (csizes - pos - 1).astype(np.int64)
        if int(c1.sum()) == 0:
            return EMPTY.empty_table()
        lefts = np.repeat(np.arange(len(c1)), c1)
        run = np.repeat(np.concatenate(([0], np.cumsum(c1)[:-1])), c1)
        rights = lefts + (np.arange(int(c1.sum())) - run) + 1
        # level 2: extend each pair by every k > j in the same group
        c2 = (csizes[rights] - pos[rights] - 1).astype(np.int64)
        total = int(c2.sum())
        if total == 0:
            return EMPTY.empty_table()
        pi = np.repeat(np.arange(len(c2)), c2)
        run2 = np.repeat(np.concatenate(([0], np.cumsum(c2)[:-1])), c2)
        thirds = rights[pi] + (np.arange(total) - run2) + 1
        t = pa.table(
            {
                "part_a": pa.array(pk[lefts[pi]], pa.int64()),
                "part_b": pa.array(pk[rights[pi]], pa.int64()),
                "part_c": pa.array(pk[thirds], pa.int64()),
            }
        )
        gg = t.group_by(["part_a", "part_b", "part_c"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "part_a": gg["part_a"],
                "part_b": gg["part_b"],
                "part_c": gg["part_c"],
                "n": pc.cast(gg["count_all"], pa.int64()),
            }
        )

    partial = (
        lineitem_ds.map_batches(
            add_part, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__part")
        .map_groups(triples_local, batch_format="pyarrow")
    )
    counts = hash_partitioned_agg(
        partial, ["part_a", "part_b", "part_c"], [("n", "sum", "n")]
    )
    return (
        counts.sort(
            ["n", "part_a", "part_b", "part_c"],
            descending=[True, False, False, False],
        )
        .limit(k)
        .select_columns(["part_a", "part_b", "part_c", "n"])
    )


def session_entry_conversion(
    events_ds: "ray.data.Dataset", gap_s: int = 1800
) -> "ray.data.Dataset":
    """Conversion rate by session ENTRY event type: sessions are the 30m
    islands per user; each session is attributed to its first event's
    type, and counts as converted when it contains a purchase — the
    landing-page-effectiveness census, stream-shaped.

    Per-user kernel: one sort, session ids by gap cumsum, entries at
    island starts, converted via ``np.logical_or.reduceat`` — all
    vectorized; the final groupby is entry-type-sized.

    Output: entry_type (STRING), n_sessions, n_converted (BIGINTs).
    """
    from ray.data.aggregate import Sum as _Sum

    gap_us = gap_s * 1_000_000

    def per_user(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        if len(ts) == 0:
            return pa.table(
                {
                    "entry_type": pa.array([], pa.string()),
                    "n_sessions": pa.array([], pa.int64()),
                    "n_converted": pa.array([], pa.int64()),
                }
            )
        et = g["event_type"]
        starts = np.flatnonzero(np.r_[True, np.diff(ts) > gap_us])
        is_purchase = pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
        conv = np.logical_or.reduceat(is_purchase, starts).astype(np.int64)
        t = pa.table(
            {
                "entry_type": et.take(pa.array(starts)),
                "conv": pa.array(conv, pa.int64()),
            }
        )
        gg = t.group_by("entry_type").aggregate(
            [("conv", "sum"), ("conv", "count")]
        )
        return pa.table(
            {
                "entry_type": gg["entry_type"],
                "n_sessions": pc.cast(gg["conv_count"], pa.int64()),
                "n_converted": pc.cast(gg["conv_sum"], pa.int64()),
            }
        )

    return (
        events_ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("entry_type")
        .aggregate(
            _Sum("n_sessions", alias_name="n_sessions"),
            _Sum("n_converted", alias_name="n_converted"),
        )
    )


def corr_disc_qty_by_brand(sf_dir: str) -> "ray.data.Dataset":
    """Per-brand exact correlation components between lineitem discount
    and quantity (both in integer cents): n, Σx, Σy, Σxy, Σx², Σy² as
    BIGINTs — the grouped version of :func:`corr_components`, with the
    part→brand attribution done by a BROADCAST dim lookup (``ray.put``
    the partkey→brand map once; the fact table never shuffles for the
    join).

    Output: p_brand, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2.
    """
    import pyarrow.parquet as pq

    import ray

    from ray.data.aggregate import Sum as _Sum

    from ..util import cached_get

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    lut_ref = ray.put(
        dict(
            zip(
                part["p_partkey"].to_pylist(),
                part["p_brand"].to_pylist(),
            )
        )
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_discount", "l_quantity"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        lut = cached_get(lut_ref)
        brands = pa.array(
            [lut.get(p) for p in batch["l_partkey"].to_pylist()], pa.string()
        )
        x = to_cents(batch["l_discount"]).to_numpy(zero_copy_only=False)
        y = to_cents(batch["l_quantity"]).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "p_brand": brands,
                "n": pa.array(np.ones(len(x), np.int64), pa.int64()),
                "sum_x": pa.array(x, pa.int64()),
                "sum_y": pa.array(y, pa.int64()),
                "sum_xy": pa.array(x * y, pa.int64()),
                "sum_x2": pa.array(x * x, pa.int64()),
                "sum_y2": pa.array(y * y, pa.int64()),
            }
        )
        return t.group_by("p_brand").aggregate(
            [(c, "sum") for c in ("n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2")]
        ).rename_columns(
            ["p_brand", "n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]
        )

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("p_brand").aggregate(
        *[
            _Sum(c, alias_name=c)
            for c in ("n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2")
        ]
    )


def transition_drift_fortnights(events_ds: "ray.data.Dataset") -> pa.Table:
    """Behavioral drift test: total-variation distance between the
    first-order transition distributions of the corpus's two fortnights
    (split at 2024-01-16, the fixed mid-corpus boundary) — "did the
    event-sequence dynamics change?", the Markov counterpart of the
    term-distribution drift (:func:`~.text.tv_distance`-family).

    EXACT cross-multiplied integers: with n1/n2 the per-(cur,next) counts
    and T1/T2 the totals,

        tv_num = Σ |n1·T2 − n2·T1|,     TV = tv_num / (2·T1·T2)

    so the statistic is carried as (tv_num, t1, t2) BIGINTs and the one
    float division is the caller's. Transitions are computed per user
    WITHIN each half (no pair spans the boundary — restated in SQL by
    filtering each half before the LEAD).

    Output: one row — t1, t2, n_cells, tv_num (BIGINTs). Empty halves →
    0 rows.
    """
    from .windows import event_transitions
    from ..util import collect_table

    OUT = pa.schema(
        [
            ("t1", pa.int64()),
            ("t2", pa.int64()),
            ("n_cells", pa.int64()),
            ("tv_num", pa.int64()),
        ]
    )
    split = np.datetime64("2024-01-16", "us")

    def half(ds, before: bool):
        def f(b: pa.Table) -> pa.Table:
            m = pc.less(b["ts"], pa.scalar(split.item(), pa.timestamp("us")))
            if not before:
                m = pc.invert(m)
            return b.filter(m)

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    t1 = collect_table(event_transitions(half(events_ds, True)))
    t2 = collect_table(event_transitions(half(events_ds, False)))
    if t1.num_rows == 0 or t2.num_rows == 0:
        return OUT.empty_table()

    def to_map(t):
        return {
            (f, x): int(n)
            for f, x, n in zip(
                t["from_type"].to_pylist(),
                t["to_type"].to_pylist(),
                t["n"].to_pylist(),
            )
        }

    m1, m2 = to_map(t1), to_map(t2)
    T1, T2 = sum(m1.values()), sum(m2.values())
    cells = sorted(set(m1) | set(m2))
    tv = sum(abs(m1.get(c, 0) * T2 - m2.get(c, 0) * T1) for c in cells)
    return pa.table(
        {
            "t1": pa.array([T1], pa.int64()),
            "t2": pa.array([T2], pa.int64()),
            "n_cells": pa.array([len(cells)], pa.int64()),
            "tv_num": pa.array([tv], pa.int64()),
        }
    )


def daily_median_value(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """EXACT lower median of value-cents per DAY — the robust central-
    tendency series a revenue dashboard plots next to the mean (the
    time-axis sibling of :func:`median_value_per_type`; same grouped
    order-statistic kernel, day-keyed).

    Exchange = (day, cents) pairs only; each day's median is one
    ``np.partition`` selection. Output: day (TIMESTAMP), n, median_cents
    (BIGINTs).
    """

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(batch["ts"], unit="day"),
                "c": to_cents(batch["value"]),
            }
        )

    def med(group: pa.Table) -> pa.Table:
        c = group["c"].to_numpy(zero_copy_only=False)
        k = (len(c) - 1) // 2
        v = int(np.partition(c, k)[k])
        return pa.table(
            {
                "day": pa.array([group["day"][0].as_py()], pa.timestamp("us")),
                "n": pa.array([len(c)], pa.int64()),
                "median_cents": pa.array([v], pa.int64()),
            }
        )

    return (
        events_ds.map_batches(slim, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .map_groups(med, batch_format="pyarrow")
    )


def weekday_weekend_lift(events_ds: "ray.data.Dataset") -> pa.Table:
    """Weekend-vs-weekday purchase lift in exact ppm: purchases per
    PRESENT day on weekends vs weekdays,

        lift_ppm = 1e6 · n_we · d_wd  //  (n_wd · d_we)

    (cross-multiplied — no rate is ever computed in float). Weekend =
    DuckDB ``dayofweek`` ∈ {0, 6}. Combiner-first daily purchase census;
    the fold is one boolean partition of the days-domain series.

    Output: one row — n_weekday, d_weekday, n_weekend, d_weekend,
    lift_ppm (BIGINTs; lift 0 when either denominator is 0).
    """
    from ray.data.aggregate import Sum as _Sum

    from ..util import collect_table

    OUT = pa.schema(
        [
            ("n_weekday", pa.int64()),
            ("d_weekday", pa.int64()),
            ("n_weekend", pa.int64()),
            ("d_weekend", pa.int64()),
            ("lift_ppm", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["event_type"], "purchase")
        d = pc.floor_temporal(pc.filter(batch["ts"], keep), unit="day")
        g = pa.table({"day": d}).group_by("day").aggregate([([], "count_all")])
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    t = collect_table(
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .sum("n")
    )
    if t.num_rows == 0:
        return OUT.empty_table()
    days = (
        t["day"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
    )
    n = t["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    dow = (days + 4) % 7  # DuckDB dayofweek: 0=Sunday..6=Saturday
    we = (dow == 0) | (dow == 6)
    n_we, d_we = int(n[we].sum()), int(we.sum())
    n_wd, d_wd = int(n[~we].sum()), int((~we).sum())
    lift = (
        1_000_000 * n_we * d_wd // (n_wd * d_we)
        if n_wd > 0 and d_we > 0
        else 0
    )
    return pa.table(
        {
            "n_weekday": pa.array([n_wd], pa.int64()),
            "d_weekday": pa.array([d_wd], pa.int64()),
            "n_weekend": pa.array([n_we], pa.int64()),
            "d_weekend": pa.array([d_we], pa.int64()),
            "lift_ppm": pa.array([lift], pa.int64()),
        }
    )


def conversion_latency_percentiles(events_ds: "ray.data.Dataset") -> pa.Table:
    """Exact p50/p90 of the view→purchase conversion latency: per user,
    seconds between the first view and the first purchase STRICTLY after
    it (the funnel-step-2 gap of :func:`funnel3_ordered`), then LOWER
    order statistics over the converted-user gaps — the latency SLA the
    growth team tracks, with no float percentile interpolation anywhere.

    Per-user kernel (one sorted pass) → user-domain gap list → one
    ``np.partition`` per rank (rank convention ``ceil(p·n/100) − 1``,
    0-based — the :func:`value_deciles` contract).

    Output: one row — n_converted, p50_s, p90_s (BIGINTs). No converted
    users → 0 rows.
    """
    import math

    from ..util import collect_table

    OUT = pa.schema(
        [
            ("n_converted", pa.int64()),
            ("p50_s", pa.int64()),
            ("p90_s", pa.int64()),
        ]
    )

    def per_user(group: pa.Table) -> pa.Table:
        g = group.take(
            pc.sort_indices(
                group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        et = g["event_type"].to_pylist()
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        t1 = t2 = None
        for e, t in zip(et, ts):
            if t1 is None:
                if e == "view":
                    t1 = t
            elif e == "purchase" and t > t1:
                t2 = t
                break
        if t2 is None:
            return pa.table({"gap_s": pa.array([], pa.int64())})
        return pa.table(
            {"gap_s": pa.array([int((t2 - t1) // 1_000_000)], pa.int64())}
        )

    t = collect_table(
        events_ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    )
    if t.num_rows == 0 or "gap_s" not in t.schema.names:
        return OUT.empty_table()
    gaps = t["gap_s"].to_numpy(zero_copy_only=False)
    n = len(gaps)
    out = {}
    for p, col in ((50, "p50_s"), (90, "p90_s")):
        k = max(math.ceil(p * n / 100), 1) - 1
        out[col] = int(np.partition(gaps, k)[k])
    return pa.table(
        {
            "n_converted": pa.array([n], pa.int64()),
            "p50_s": pa.array([out["p50_s"]], pa.int64()),
            "p90_s": pa.array([out["p90_s"]], pa.int64()),
        }
    )


def part_price_size_census(part_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Catalog census: per part SIZE, the count and exact retail-price
    cents aggregates (sum/min/max) — the price-band table a pricing
    dashboard groups the catalog by (covers the part table's p_size /
    p_retailprice surface). One size-keyed combiner-first exchange.

    Output: p_size, n_parts, price_cents, min_cents, max_cents (BIGINTs).
    """
    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    def partial(batch: pa.Table) -> pa.Table:
        c = to_cents(batch["p_retailprice"])
        t = pa.table(
            {"p_size": pc.cast(batch["p_size"], pa.int64()), "c": c}
        )
        g = t.group_by("p_size").aggregate(
            [("c", "sum"), ("c", "count"), ("c", "min"), ("c", "max")]
        )
        return pa.table(
            {
                "p_size": g["p_size"],
                "n_parts": pc.cast(g["c_count"], pa.int64()),
                "price_cents": pc.cast(g["c_sum"], pa.int64()),
                "min_cents": pc.cast(g["c_min"], pa.int64()),
                "max_cents": pc.cast(g["c_max"], pa.int64()),
            }
        )

    return (
        part_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p_size")
        .aggregate(
            _Sum("n_parts", alias_name="n_parts"),
            _Sum("price_cents", alias_name="price_cents"),
            _Min("min_cents", alias_name="min_cents"),
            _Max("max_cents", alias_name="max_cents"),
        )
    )


def supplier_nation_balance_census(sf_dir: str) -> "ray.data.Dataset":
    """Supplier account-balance census per NATION NAME: count and exact
    cents sum/min/max, the nation dim resolved by a broadcast lookup
    (25 rows — never a shuffle join). Covers the supplier table's
    s_acctbal surface alongside Q2/Q20's supplier joins.

    Output: n_name, n_suppliers, bal_cents, min_cents, max_cents.
    """
    import pyarrow.parquet as pq

    import ray

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    from ..util import cached_get

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    lut_ref = ray.put(
        dict(
            zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
        )
    )
    ds = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        lut = cached_get(lut_ref)
        names = pa.array(
            [lut.get(k) for k in batch["s_nationkey"].to_pylist()], pa.string()
        )
        c = to_cents(batch["s_acctbal"])
        t = pa.table({"n_name": names, "c": c})
        g = t.group_by("n_name").aggregate(
            [("c", "sum"), ("c", "count"), ("c", "min"), ("c", "max")]
        )
        return pa.table(
            {
                "n_name": g["n_name"],
                "n_suppliers": pc.cast(g["c_count"], pa.int64()),
                "bal_cents": pc.cast(g["c_sum"], pa.int64()),
                "min_cents": pc.cast(g["c_min"], pa.int64()),
                "max_cents": pc.cast(g["c_max"], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(
            _Sum("n_suppliers", alias_name="n_suppliers"),
            _Sum("bal_cents", alias_name="bal_cents"),
            _Min("min_cents", alias_name="min_cents"),
            _Max("max_cents", alias_name="max_cents"),
        )
    )


def revenue_pareto_share(events_ds: "ray.data.Dataset") -> pa.Table:
    """Pareto concentration check: what share of purchase revenue comes
    from the top 20% of purchasing users (k = ceil(n/5), exact
    (spend desc, user asc) ranking — the 80/20 audit next to
    :func:`gini_user_activity`'s Gini).

    Shape: combiner-first per-user cents census, exact distributed
    ranks via the block-offset ROW_NUMBER primitive
    (:func:`~.text._global_row_numbers` — one sort over the user-domain
    table), then two result-sized sums. share_ppm = 1e6·top // total.

    Output: one row — n_users, k_top, top_cents, total_cents, share_ppm
    (BIGINTs). No purchases → 0 rows.
    """
    import math

    from ray.data.aggregate import Count as _Count, Sum as _Sum

    from .text import _global_row_numbers

    def cents_rows(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["event_type"], "purchase")
        t = b.filter(keep)
        g = (
            pa.table({"user_id": t["user_id"], "c": to_cents(t["value"])})
            .group_by("user_id")
            .aggregate([("c", "sum")])
        )
        return pa.table(
            {"user_id": g["user_id"], "spend": pc.cast(g["c_sum"], pa.int64())}
        )

    per_user = (
        events_ds.map_batches(cents_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(_Sum("spend", alias_name="spend"))
        .materialize()
    )
    stats = per_user.aggregate(_Count(), _Sum("spend", alias_name="t"))
    n = int(stats.get("count()") or 0)
    if n == 0:
        return pa.schema(
            [
                ("n_users", pa.int64()),
                ("k_top", pa.int64()),
                ("top_cents", pa.int64()),
                ("total_cents", pa.int64()),
                ("share_ppm", pa.int64()),
            ]
        ).empty_table()
    total = int(stats["t"])
    k = math.ceil(n / 5)
    ranked = _global_row_numbers(per_user, "spend", id_col="user_id")

    def top_partial(b: pa.Table) -> pa.Table:
        r = b["rank"].to_numpy(zero_copy_only=False)
        s = b["spend"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"t": pa.array([int(s[r <= k].sum())], pa.int64())}
        )

    top = ranked.map_batches(
        top_partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(_Sum("t", alias_name="t"))
    top_cents = int(top["t"])
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "k_top": pa.array([k], pa.int64()),
            "top_cents": pa.array([top_cents], pa.int64()),
            "total_cents": pa.array([total], pa.int64()),
            "share_ppm": pa.array(
                [1_000_000 * top_cents // total], pa.int64()
            ),
        }
    )


def repeat_purchase_rate(events_ds: "ray.data.Dataset") -> pa.Table:
    """Repeat-purchase rate in exact ppm: of users with ≥ 1 purchase, the
    share with ≥ 2 — the one-number loyalty snapshot next to
    :func:`rfm_scores`' full segmentation. One user-keyed combiner census
    (hash-partitioned, so each user's count is wholly local); the fold is
    two partition-local counts summed on the driver.

    Output: one row — n_purchasers, n_repeat, repeat_ppm (BIGINTs).
    No purchasers → 0 rows.
    """
    from ..util import collect_table, hash_partitioned_agg

    def rows(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["event_type"], "purchase")
        t = b.filter(keep)
        return pa.table({"user_id": t["user_id"]}).append_column(
            "one", pa.array(np.ones(t.num_rows, np.int64))
        )

    per_user = hash_partitioned_agg(
        events_ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        [("one", "sum", "k")],
    )

    def census(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(k)], pa.int64()),
                "r": pa.array([int((k >= 2).sum())], pa.int64()),
            }
        )

    t = collect_table(
        per_user.map_batches(census, batch_format="pyarrow", zero_copy_batch=True)
    )
    OUT = pa.schema(
        [
            ("n_purchasers", pa.int64()),
            ("n_repeat", pa.int64()),
            ("repeat_ppm", pa.int64()),
        ]
    )
    if t.num_rows == 0:
        return OUT.empty_table()
    n = int(t["n"].to_numpy(zero_copy_only=False).sum())
    r = int(t["r"].to_numpy(zero_copy_only=False).sum())
    if n == 0:
        return OUT.empty_table()
    return pa.table(
        {
            "n_purchasers": pa.array([n], pa.int64()),
            "n_repeat": pa.array([r], pa.int64()),
            "repeat_ppm": pa.array([1_000_000 * r // n], pa.int64()),
        }
    )
