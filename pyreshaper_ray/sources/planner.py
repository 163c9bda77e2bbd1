"""Footer-metadata scan planning — the read-side task coalescer.

At 100 TB an engine never sizes read tasks by file count: small files and
small row groups are coalesced into ~target-sized scan tasks from footer
metadata alone (the rule Ray Data's `read_parquet` and Spark's
`maxPartitionBytes` both apply). This module makes that planning step an
inspectable, oracle-checkable operator: read ONLY the parquet footers
(driver-side, file-count-sized — never row data), list every row group in
deterministic (table, row_group) order, and assign each to a scan task by
cumulative target binning::

    task_id = bytes_before_this_row_group // target_bytes

so every task covers a contiguous run of row groups and holds ~target
bytes (uncompressed column-chunk sizes, the planner's proxy for in-memory
block size). DuckDB's ``parquet_metadata()`` exposes the same footer
numbers, which makes the whole plan SQL-restatable — the driver oracle
gate covers the planner bit-for-bit.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

PLAN_SCHEMA = pa.schema(
    [
        ("table_name", pa.string()),
        ("row_group", pa.int64()),
        ("n_rows", pa.int64()),
        ("n_bytes", pa.int64()),
        ("task_id", pa.int64()),
    ]
)


def scan_task_plan(sf_dir: str, target_bytes: int = 256 * 1024) -> pa.Table:
    """Plan scan tasks over every ``*.parquet`` table under ``sf_dir``.

    Footer-only: cost is O(files + row groups), independent of data size.
    Row groups are visited in (table_name asc, row_group asc) order;
    ``n_bytes`` is the sum of the row group's per-column
    ``total_uncompressed_size`` (matches DuckDB ``parquet_metadata``).
    """
    rows: list[tuple[str, int, int, int]] = []
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(path)[: -len(".parquet")]
        md = pq.ParquetFile(path).metadata
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            nbytes = sum(
                rg.column(c).total_uncompressed_size for c in range(rg.num_columns)
            )
            rows.append((name, g, rg.num_rows, nbytes))
    cum = 0
    names, rgs, nrows, nbytes_l, tasks = [], [], [], [], []
    for name, g, nr, nb in rows:
        names.append(name)
        rgs.append(g)
        nrows.append(nr)
        nbytes_l.append(nb)
        tasks.append(cum // target_bytes)
        cum += nb
    return pa.table(
        {
            "table_name": pa.array(names, pa.string()),
            "row_group": pa.array(rgs, pa.int64()),
            "n_rows": pa.array(nrows, pa.int64()),
            "n_bytes": pa.array(nbytes_l, pa.int64()),
            "task_id": pa.array(tasks, pa.int64()),
        }
    )


ZONE_SCHEMA = pa.schema(
    [
        ("table_name", pa.string()),
        ("row_group", pa.int64()),
        ("n_rows", pa.int64()),
        ("null_count", pa.int64()),
        ("min_v", pa.int64()),
        ("max_v", pa.int64()),
        ("skip", pa.bool_()),
    ]
)


def zone_skip_plan(
    path: str, column: str, lo: int, hi: int, table_name: str | None = None
) -> pa.Table:
    """Zone-map data skipping — decide from footer min/max statistics which
    row groups of ``path`` can NEVER contain a row with ``lo <= column <=
    hi`` (``skip`` = max < lo or min > hi). This is the planner half of
    predicate pushdown: `read_parquet(filter=...)` consumes the decision,
    this operator makes it inspectable and testable. Footer-only, integer
    columns (exact zone bounds, no min/max truncation ambiguity).
    """
    md = pq.ParquetFile(path).metadata
    name = table_name or os.path.basename(path).rsplit(".", 1)[0]
    col_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[column]
    rows = {k: [] for k in ("rg", "n", "nulls", "mn", "mx", "skip")}
    for g in range(md.num_row_groups):
        c = md.row_group(g).column(col_idx)
        st = c.statistics
        mn, mx = int(st.min), int(st.max)
        rows["rg"].append(g)
        rows["n"].append(md.row_group(g).num_rows)
        rows["nulls"].append(int(st.null_count))
        rows["mn"].append(mn)
        rows["mx"].append(mx)
        rows["skip"].append(mx < lo or mn > hi)
    return pa.table(
        {
            "table_name": pa.array([name] * md.num_row_groups, pa.string()),
            "row_group": pa.array(rows["rg"], pa.int64()),
            "n_rows": pa.array(rows["n"], pa.int64()),
            "null_count": pa.array(rows["nulls"], pa.int64()),
            "min_v": pa.array(rows["mn"], pa.int64()),
            "max_v": pa.array(rows["mx"], pa.int64()),
            "skip": pa.array(rows["skip"], pa.bool_()),
        }
    )


def lsh_parameter_plan(
    n_perm: int = 128, thresholds: tuple = (0.5, 0.6, 0.7, 0.8, 0.9)
) -> pa.Table:
    """MinHash-LSH banding auto-tuner: for each target Jaccard threshold,
    pick (bands, rows_per_band) with bands·rows == n_perm minimizing the
    false-positive + false-negative probability mass around the threshold
    (the standard integral criterion: FP = ∫₀ᵗ P(hit|s) ds, FN =
    ∫ₜ¹ 1−P(hit|s) ds with P(hit|s) = 1 − (1 − s^r)^b, trapezoid over
    1000 points — deterministic, so the plan is reproducible engine
    config, not a heuristic). Feeds `stages/dedup.py::minhash_neardup`'s
    (bands, rows) choice; pure metadata, no data touched.

    Output per threshold: bands, rows_per_band, fp_milli, fn_milli
    (probability mass × 1000, rounded — integer for oracle-free equality
    testing).
    """
    import numpy as np

    s = np.linspace(0.0, 1.0, 1001)
    out = {k: [] for k in ("t", "b", "r", "fp", "fn")}
    for t in thresholds:
        best = None
        for r in range(1, n_perm + 1):
            if n_perm % r:
                continue
            b = n_perm // r
            p_hit = 1.0 - (1.0 - s**r) ** b
            below = s <= t
            fp = float(np.trapz(p_hit[below], s[below]))
            fn = float(np.trapz(1.0 - p_hit[~below], s[~below]))
            key = (fp + fn, r)
            if best is None or key < best[0]:
                best = (key, b, r, fp, fn)
        _, b, r, fp, fn = best
        out["t"].append(int(round(t * 100)))
        out["b"].append(b)
        out["r"].append(r)
        out["fp"].append(int(round(fp * 1000)))
        out["fn"].append(int(round(fn * 1000)))
    return pa.table(
        {
            "threshold_pct": pa.array(out["t"], pa.int64()),
            "bands": pa.array(out["b"], pa.int64()),
            "rows_per_band": pa.array(out["r"], pa.int64()),
            "fp_milli": pa.array(out["fp"], pa.int64()),
            "fn_milli": pa.array(out["fn"], pa.int64()),
        }
    )


# tier resolutions (µs per point) and the default retention ladder the
# router consults — mirrors retention.DEFAULT_POLICY's tier vocabulary
_TIER_RES_US = {
    "1m": 60_000_000,
    "1h": 3_600_000_000,
    "1d": 86_400_000_000,
    "1w": 604_800_000_000,
}


def tier_route_plan(
    range_start_us: int,
    range_end_us: int,
    resolution_us: int,
    now_us: int,
    keep_us: dict[str, int | None] | None = None,
) -> pa.Table:
    """Continuous-aggregate query router: which rollup tier should serve a
    ``[range_start, range_end)`` window at a requested ``resolution``?
    The standard TSDB read path — route to the COARSEST tier whose
    resolution still satisfies the request AND whose retention window
    still covers the range start; fall through tier by tier otherwise.

    A tier qualifies when
        res(tier) <= resolution_us                      (fine enough)
        AND (keep[tier] is None                          (kept forever)
             OR range_start_us >= now_us - keep[tier])   (not yet pruned)
    and the plan picks the coarsest qualifying tier (fewest rows scanned).
    Estimated points = ceil(range / res) — the cost column a planner
    compares against the raw-turns scan.

    Pure footer-free planning (no I/O, no Ray) — same testable-decision
    contract as :func:`zone_skip_plan` / :func:`scan_task_plan`; the
    executor half is ``flagship.read_tier`` + a window filter.

    Output: one row per tier — tier, res_us, fine_enough, retained,
    chosen, est_points (BIGINT/bool). Exactly one row has chosen=True
    when any tier qualifies; zero when none (serve from raw turns).
    """
    keep = keep_us if keep_us is not None else {"1m": 7 * 86_400_000_000, "1h": 90 * 86_400_000_000, "1d": None, "1w": None}
    rows = {k: [] for k in ("tier", "res", "fine", "ret", "est")}
    for tier, res in sorted(_TIER_RES_US.items(), key=lambda kv: kv[1]):
        fine = res <= resolution_us
        ttl = keep.get(tier, None)
        ret = ttl is None or range_start_us >= now_us - ttl
        est = -(-(range_end_us - range_start_us) // res)
        rows["tier"].append(tier)
        rows["res"].append(res)
        rows["fine"].append(fine)
        rows["ret"].append(ret)
        rows["est"].append(est)
    qualifying = [
        i
        for i in range(len(rows["tier"]))
        if rows["fine"][i] and rows["ret"][i]
    ]
    chosen_i = max(qualifying, key=lambda i: rows["res"][i]) if qualifying else None
    return pa.table(
        {
            "tier": pa.array(rows["tier"], pa.string()),
            "res_us": pa.array(rows["res"], pa.int64()),
            "fine_enough": pa.array(rows["fine"], pa.bool_()),
            "retained": pa.array(rows["ret"], pa.bool_()),
            "chosen": pa.array(
                [i == chosen_i for i in range(len(rows["tier"]))], pa.bool_()
            ),
            "est_points": pa.array(rows["est"], pa.int64()),
        }
    )
