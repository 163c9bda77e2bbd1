"""Retention-tier enforcement: prune aged rows from each rollup tier.

The "retention" half of the rollup + downsample + retention engine
(north_rule): a policy maps each tier to a maximum age — classic TSDB
shape: fine tiers short-lived, coarse tiers long-lived, e.g.::

    {"1m": 7 days, "1h": 90 days, "1d": None}   # None = keep forever

Enforcement is per-(tier, bucket-file): each Ray task reads one bucket
file, drops rows with ``window_start < now - max_age``, and atomically
rewrites (or removes) the file — the same atomic-replace discipline as the
bucket writer, so a crash mid-enforcement leaves every file either old or
new, never partial. A retention record (rows dropped per tier, cutoffs,
timestamp) is appended to the manifest directory for lineage.

``now`` is an explicit argument (deterministic, testable); at 100 TB the
per-file task list is exactly as parallel as the bucket layout.
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..pipelines.bucket import TIER_DIRS
from ..state.manifest import atomic_write_parquet, manifest_dir

TIER_KEYS = {"1m": "rollup_1m", "1h": "rollup_1h", "1d": "rollup_1d"}


def _prune_file(path: str, cutoff_us: int) -> tuple[int, int]:
    """Drop rows older than the cutoff; rewrite atomically. → (kept, dropped)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    cutoff = pa.scalar(
        np.datetime64(cutoff_us, "us").astype("datetime64[us]"), pa.timestamp("us")
    )
    keep = pc.greater_equal(t["window_start"], cutoff)
    kept = t.filter(keep)
    dropped = t.num_rows - kept.num_rows
    if dropped == 0:
        return t.num_rows, 0
    if kept.num_rows == 0:
        os.remove(path)
    else:
        atomic_write_parquet(kept, path)
    return kept.num_rows, dropped


def apply_retention(
    out_dir: str,
    policy: dict[str, int | None],
    now_us: int,
) -> dict:
    """Enforce ``policy`` (tier → max age in microseconds, None = forever)
    over a completed run's tier layouts. Ray-parallel per bucket file.
    Returns the retention record (also committed to the manifest dir)."""
    import ray

    tasks: list[tuple[str, str, int]] = []
    cutoffs: dict[str, int] = {}
    for tier, max_age in policy.items():
        if max_age is None:
            continue
        if tier not in TIER_KEYS:
            raise ValueError(f"unknown retention tier {tier!r}")
        cutoff = now_us - max_age
        cutoffs[tier] = cutoff
        for path in glob.glob(
            os.path.join(out_dir, TIER_DIRS[tier], "bucket=*", "*.parquet")
        ):
            tasks.append((tier, path, cutoff))

    @ray.remote(num_cpus=1)
    def prune(tier: str, path: str, cutoff: int):
        from ..util import tune_worker_threads

        tune_worker_threads()
        kept, dropped = _prune_file(path, cutoff)
        return tier, kept, dropped

    results = ray.get([prune.remote(*t) for t in tasks])
    stats: dict[str, dict[str, int]] = {}
    for tier, kept, dropped in results:
        s = stats.setdefault(tier, {"rows_kept": 0, "rows_dropped": 0})
        s["rows_kept"] += kept
        s["rows_dropped"] += dropped
    record = {
        "now_us": now_us,
        "cutoffs_us": cutoffs,
        "tiers": stats,
        "applied_at": time.time(),
    }
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    seq = len(glob.glob(os.path.join(manifest_dir(out_dir), "retention-*.json")))
    path = os.path.join(manifest_dir(out_dir), f"retention-{now_us}-{seq:04d}.json")
    with open(path + ".tmp", "w") as f:
        json.dump(record, f, indent=2)
    os.replace(path + ".tmp", path)
    return record


DAY_US = 86_400_000_000

DEFAULT_POLICY = {"1m": 7 * DAY_US, "1h": 90 * DAY_US, "1d": None}
