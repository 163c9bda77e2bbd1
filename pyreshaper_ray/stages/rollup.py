"""Tumbling-window rollups + continuous-aggregate cascade.

PyReshaper computes no value aggregates (its pivot is value-preserving); the
north_rule adds them. The scale pattern is combiner-first (SURVEY.md §2.5):

  1. partial aggregation INSIDE ``map_batches`` — per-block Arrow
     ``Table.group_by`` emits one row per (conv_id, window) per block, so the
     all-to-all exchange only moves pre-reduced partials, not raw turns;
  2. final ``ds.groupby([conv_id, window_start]).aggregate(...)`` merges
     partials — sums of sums, min of mins, max of maxs.

Everything stays in the INTEGER domain (counts, char/token sums, min/max),
so combine order cannot perturb results → bit-exact vs the single-process
oracle regardless of shuffle nondeterminism. Means are derived at read time
from (sum, count), mirroring the oracle.

Dedup note: rollups must see DEDUPED turns (F1-e3 duplicates). The flagship
therefore computes rollups from the pivot output; `rollup_tier` itself is
dedup-agnostic.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..functions.normalize import floor_window

ROLLUP_AGG_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("window_start", pa.timestamp("us")),
        ("turn_count", pa.int64()),
        ("char_sum", pa.int64()),
        ("char_min", pa.int32()),
        ("char_max", pa.int32()),
        ("tok_est_sum", pa.int64()),
        ("tool_calls", pa.int64()),
    ]
)


def rollup_block(batch: pa.Table, window_col: str = "w1m") -> pa.Table:
    """Arrow group_by rollup of one block of turn rows.

    Used both as the per-block combiner (partial rows, later merged by the
    final groupby) and as the complete rollup inside a bucket group, where
    the block holds every row of its conversations.
    """
    t = pa.table(
        {
            "conv_id": batch["conv_id"],
            "window_start": batch[window_col],
            "char_len": batch["char_len"],
            "tok_est": batch["tok_est"],
            "is_tool_i": pc.cast(batch["is_tool"], pa.int64()),
        }
    )
    g = t.group_by(["conv_id", "window_start"]).aggregate(
        [
            ("char_len", "count"),
            ("char_len", "sum"),
            ("char_len", "min"),
            ("char_len", "max"),
            ("tok_est", "sum"),
            ("is_tool_i", "sum"),
        ]
    )
    return pa.table(
        {
            "conv_id": g["conv_id"],
            "window_start": g["window_start"],
            "turn_count": pc.cast(g["char_len_count"], pa.int64()),
            "char_sum": pc.cast(g["char_len_sum"], pa.int64()),
            "char_min": g["char_len_min"],
            "char_max": g["char_len_max"],
            "tok_est_sum": g["tok_est_sum"],
            "tool_calls": g["is_tool_i_sum"],
        }
    )


def cascade_block(tier_block: pa.Table, to_tier: str) -> pa.Table:
    """Complete (or partial) downsample of one tier block to a coarser tier."""
    refloored = tier_block.set_column(
        tier_block.schema.get_field_index("window_start"),
        "window_start",
        floor_window(tier_block["window_start"], to_tier),
    )
    g = refloored.group_by(["conv_id", "window_start"]).aggregate(
        [
            ("turn_count", "sum"),
            ("char_sum", "sum"),
            ("char_min", "min"),
            ("char_max", "max"),
            ("tok_est_sum", "sum"),
            ("tool_calls", "sum"),
        ]
    )
    return pa.table(
        {
            "conv_id": g["conv_id"],
            "window_start": g["window_start"],
            "turn_count": g["turn_count_sum"],
            "char_sum": g["char_sum_sum"],
            "char_min": g["char_min_min"],
            "char_max": g["char_max_max"],
            "tok_est_sum": g["tok_est_sum_sum"],
            "tool_calls": g["tool_calls_sum"],
        }
    )


def _partial_rollup_fn(window_col: str):
    """Per-block combiner: raw turn rows → one partial row per key."""

    def partial(batch: pa.Table) -> pa.Table:
        return rollup_block(batch, window_col)

    return partial


_FINAL_AGGS = lambda: [  # noqa: E731 — tiny factory, Ray aggs are stateful
    Sum("turn_count", alias_name="turn_count"),
    Sum("char_sum", alias_name="char_sum"),
    Min("char_min", alias_name="char_min"),
    Max("char_max", alias_name="char_max"),
    Sum("tok_est_sum", alias_name="tok_est_sum"),
    Sum("tool_calls", alias_name="tool_calls"),
]


def _cast_canonical(batch: pa.Table) -> pa.Table:
    """Ray aggregate may widen int32 min/max; cast back to the tier schema."""
    return batch.select(ROLLUP_AGG_SCHEMA.names).cast(ROLLUP_AGG_SCHEMA)


def _merge_partials(partials: "ray.data.Dataset") -> "ray.data.Dataset":
    """Final per-(conv_id, window) merge of rollup partials — sums of sums,
    min of mins, max of maxs. Runs through ``hash_partitioned_agg`` (one
    hash exchange + vectorized Arrow group_by per partition) because the
    output is TIER-SIZED: the built-in groupby reduce pays ~70 µs of
    Python per output group, ~13 s on the ~10⁵-window 1m tier at sf0.1
    (integer Sum/Min/Max are associative, so the partition-local merge is
    exact and bit-identical)."""
    from ..util import hash_partitioned_agg

    out = hash_partitioned_agg(
        partials,
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
    return out.map_batches(_cast_canonical, batch_format="pyarrow")


def rollup_1m(ds_normalized: "ray.data.Dataset") -> "ray.data.Dataset":
    """1m tier from normalized (and deduped) turn rows."""
    partials = ds_normalized.map_batches(
        _partial_rollup_fn("w1m"), batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_partials(partials)


def cascade(tier_ds: "ray.data.Dataset", to_tier: str) -> "ray.data.Dataset":
    """Downsample a finer tier (1m→1h, 1h→1d) — computed FROM the previous
    tier, never from raw turns (continuous-aggregate contract §2.5)."""
    # pre-combine within each block (refloor + partial cascade) before the
    # (small) shuffle
    combined = tier_ds.map_batches(
        lambda b: cascade_block(b, to_tier), batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_partials(combined)


def merge_tiers(*tier_dss: "ray.data.Dataset") -> "ray.data.Dataset":
    """Merge independently-computed rollup tables of the SAME tier — the
    late-data / backfill / multi-region path: a tier computed from on-time
    rows and a tier computed later from stragglers combine into exactly the
    tier a single full pass would have produced, because every tier metric
    is mergeable (sum of sums, min of mins, max of maxs) and integer-domain.

    One union (no data movement — block concatenation) + one keyed groupby.
    This is what makes the retention cascade INCREMENTAL at 100 TB: late
    partitions re-roll only their own turns and merge, never re-reading the
    corpus.
    """
    u = tier_dss[0]
    for d in tier_dss[1:]:
        u = u.union(d)
    return _merge_partials(u)
