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
