"""Tier compaction: coalesce a completed run's many per-bucket parquet
files into fewer, larger files — the TSDB "compaction" half of the
retention story (``retention.py`` demotes tiers by TTL; this shrinks the
file count of a frozen tier so cold storage and downstream scans stop
paying per-file overhead).

Layout contract: ``<out>/<tier>/bucket=NNNNN/part-000.parquet`` (one file
per bucket, ``bucket.py::make_bucket_writer``) becomes
``bucket=<span-start>`` dirs each holding the concatenation of ``group``
consecutive buckets in ascending bucket order — hive-style readers
(pyarrow.dataset over the tier dir: export, verify, retention, decode)
see IDENTICAL rows before and after *modulo the hive ``bucket`` partition
column*, whose value becomes the span id (rows from bucket 3 read back as
``bucket=0`` after a group-of-8 coalesce). Every in-repo reader drops the
hive column and uses the real ``window_start``/``bucket`` data columns;
consumers that need original per-row bucket ids must take them from the
file's columns, not the dir name.

Compaction FREEZES the tier: a ``_compacted.json`` marker records the
spans + row counts, and the flagship's wmode-'a' append path refuses to
touch a compacted output (an append would recreate original bucket dirs
next to coalesced spans and duplicate those buckets' rows). Re-run with
wmode 'o' to rebuild from scratch instead.

Distributed shape: one Ray Data task per OUTPUT span — each task
``pyarrow.dataset``-reads only its own bucket dirs (bucket-local, no
exchange — the same access pattern as phase B's per-bucket reads) and
atomically writes one file. The driver folds only the span metrics.
"""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa

from ..state.manifest import atomic_write_parquet
from .bucket import TIER_DIRS

MARKER = "_compacted.json"

_BUCKET_RE = re.compile(r"^bucket=(\d+)$")


def _list_buckets(tier_dir: str) -> list[tuple[int, str]]:
    out = []
    for name in os.listdir(tier_dir):
        m = _BUCKET_RE.match(name)
        if m and os.path.isdir(os.path.join(tier_dir, name)):
            out.append((int(m.group(1)), os.path.join(tier_dir, name)))
    out.sort()
    return out


def compact_tier(out_dir: str, tier: str, group: int = 8) -> dict:
    """Coalesce ``tier``'s bucket files into spans of ``group`` buckets.

    Returns the marker record (spans, rows, file counts). Raises if the
    tier dir is missing or already compacted (idempotence guard — a
    second compaction would mis-parse span dirs as original buckets).
    """
    import ray
    import ray.data

    sub = TIER_DIRS.get(tier, tier)
    tier_dir = os.path.join(out_dir, sub)
    if not os.path.isdir(tier_dir):
        raise FileNotFoundError(f"no such tier dir: {tier_dir}")
    if os.path.exists(os.path.join(tier_dir, MARKER)):
        raise RuntimeError(f"{tier_dir} is already compacted")
    buckets = _list_buckets(tier_dir)
    if not buckets:
        raise RuntimeError(f"{tier_dir} has no bucket dirs to compact")

    spans = [buckets[i : i + group] for i in range(0, len(buckets), group)]
    span_items = [
        {
            "start": span[0][0],
            "dirs": [d for _, d in span],
            "ids": [b for b, _ in span],
        }
        for span in spans
    ]

    def do_span(batch: dict) -> pa.Table:
        import shutil

        import pyarrow.parquet as pq

        from ..util import tune_worker_threads

        tune_worker_threads()
        rows_out, files_in, starts = [], [], []
        for start, dirs, ids in zip(
            batch["start"], batch["dirs"], batch["ids"]
        ):
            final = os.path.join(
                os.path.dirname(dirs[0]),
                f"bucket={int(start):05d}",
                "part-000.parquet",
            )
            # Idempotence: Ray retries failed tasks, and a crashed run may
            # re-enter with a regrouped span list. The merged span file is
            # self-describing — its pyreshaper_ray.bucket_span KV metadata
            # names every original bucket it already contains — so a retry
            # skips those dirs instead of re-reading them next to the merged
            # file and silently duplicating their rows.
            covered: set[int] = set()
            if os.path.exists(final):
                fmeta = pq.read_schema(final).metadata or {}
                span_kv = fmeta.get(b"pyreshaper_ray.bucket_span")
                if span_kv:
                    covered = {int(s) for s in span_kv.decode().split(",")}
            parts = []
            n_files = 0
            kv = None
            if covered:
                t = pq.read_table(final)
                kv = {
                    k.decode(): v.decode()
                    for k, v in (t.schema.metadata or {}).items()
                }
                parts.append(t.replace_schema_metadata(None))
                n_files += 1
            for bid, d in zip(ids, dirs):
                if int(bid) in covered:
                    # already inside the merged span file; drop the stale
                    # sibling dir a prior attempt failed to remove
                    if os.path.abspath(d) != os.path.abspath(
                        os.path.dirname(final)
                    ) and os.path.isdir(d):
                        shutil.rmtree(d)
                    continue
                if not os.path.isdir(d):
                    continue  # removed by a prior attempt after merging
                fs = sorted(
                    os.path.join(d, f)
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                )
                n_files += len(fs)
                for f in fs:
                    t = pq.read_table(f)
                    meta = t.schema.metadata or {}
                    if kv is None:
                        kv = {k.decode(): v.decode() for k, v in meta.items()}
                    # a member may itself be a prior span (re-run with a
                    # larger group): union its covered ids too
                    sub_span = meta.get(b"pyreshaper_ray.bucket_span")
                    if sub_span:
                        covered |= {int(s) for s in sub_span.decode().split(",")}
                    parts.append(t.replace_schema_metadata(None))
            merged = pa.concat_tables(parts, promote_options="default")
            kv = kv or {}
            kv["pyreshaper_ray.bucket_span"] = ",".join(
                str(i) for i in sorted(covered | {int(i) for i in ids})
            )
            # write the coalesced file FIRST (atomic), then drop the other
            # bucket dirs — a crash in between leaves the merged file's
            # bucket_span metadata as the recovery record, which the skip
            # logic above honors on the retry
            atomic_write_parquet(merged, final, kv_meta=kv)
            for d in dirs:
                if os.path.abspath(d) != os.path.abspath(
                    os.path.dirname(final)
                ) and os.path.isdir(d):
                    shutil.rmtree(d)
            # drop any extra parts in the surviving dir (final is the whole span)
            keep = os.path.basename(final)
            for f in os.listdir(os.path.dirname(final)):
                if f.endswith(".parquet") and f != keep:
                    os.remove(os.path.join(os.path.dirname(final), f))
            rows_out.append(merged.num_rows)
            files_in.append(n_files)
            starts.append(int(start))
        return pa.table(
            {
                "start": pa.array(starts, pa.int64()),
                "rows": pa.array(rows_out, pa.int64()),
                "files_in": pa.array(files_in, pa.int64()),
            }
        )

    metrics = (
        ray.data.from_items(span_items)
        .map_batches(do_span, batch_format="default", batch_size=1)
        .take_all()
    )
    record = {
        "tier": tier,
        "group": int(group),
        "n_buckets_in": len(buckets),
        "n_files_out": len(spans),
        "rows": int(sum(r["rows"] for r in metrics)),
        "files_in": int(sum(r["files_in"] for r in metrics)),
        "spans": sorted(int(r["start"]) for r in metrics),
    }
    tmp = os.path.join(tier_dir, MARKER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(record, f)
    os.replace(tmp, os.path.join(tier_dir, MARKER))
    return record


def any_compacted(out_dir: str) -> list[str]:
    """Tier dirs under ``out_dir`` carrying a compaction marker."""
    hits = []
    for sub in set(TIER_DIRS.values()):
        if os.path.exists(os.path.join(out_dir, sub, MARKER)):
            hits.append(sub)
    return sorted(hits)
