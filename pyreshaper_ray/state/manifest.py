"""Per-partition checkpoint manifest — the wmode + TimeKeeper analog.

PyReshaper's checkpointing is file existence (``create_reshaper(wmode=...)``
skip/overwrite/append in the public repo) and its diagnostics are per-rank
``asaptools.timekeeper`` timers + byte counters gathered to rank 0
(``reshaper.py::print_diagnostics``). Here both live in one place: each
output bucket commits a ``manifest/bucket-{K}.json`` record **after** its
parquet files are atomically in place (write temp → ``os.replace`` → append
manifest), carrying lineage (row counts, conv counts, ts range, content
checksum) and stage timings.

On restart with wmode 's', completed buckets are read from the manifest and
their rows are dropped right after the read — before the shuffle — so resume
cost is one input scan plus only the remaining buckets' work.
"""

from __future__ import annotations

import json
import os
import time


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def bucket_path(out_dir: str, bucket: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"bucket-{bucket:05d}.json")


def load_completed(out_dir: str) -> dict[int, dict]:
    """bucket id → manifest record for every committed bucket."""
    d = manifest_dir(out_dir)
    out: dict[int, dict] = {}
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        if name.startswith("bucket-") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                rec = json.load(f)
            out[int(rec["bucket"])] = rec
    return out


def commit_bucket(out_dir: str, record: dict) -> None:
    """Atomically append one bucket's record (temp + rename = commit point)."""
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = bucket_path(out_dir, record["bucket"])
    tmp = path + ".tmp"
    record = dict(record, committed_at=time.time())
    with open(tmp, "w") as f:
        json.dump(record, f, indent=2)
    os.replace(tmp, path)


def run_meta_path(out_dir: str) -> str:
    return os.path.join(manifest_dir(out_dir), "run-meta.json")


def save_run_meta(out_dir: str, meta: dict) -> None:
    """Atomically record run-level lineage: the resolved input file list with
    (size, mtime) and the heavy/segmented bucket assignments — what wmode 'a'
    needs to ingest ONLY new files into existing tiers."""
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = run_meta_path(out_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dict(meta, saved_at=time.time()), f, indent=2)
    os.replace(tmp, path)


def load_run_meta(out_dir: str) -> dict | None:
    path = run_meta_path(out_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def clear(out_dir: str) -> None:
    """wmode 'o': forget all completed buckets."""
    d = manifest_dir(out_dir)
    if os.path.isdir(d):
        for name in os.listdir(d):
            if name.startswith("bucket-") and name.endswith(".json"):
                os.remove(os.path.join(d, name))
    if os.path.exists(run_meta_path(out_dir)):
        os.remove(run_meta_path(out_dir))


def atomic_write_parquet(table, final_path: str, kv_meta: dict | None = None) -> None:
    """Write a parquet file so readers never observe partial output.

    ``kv_meta``: GLOBAL attributes carried as Parquet file key-value
    metadata — PyReshaper copies NetCDF global attributes verbatim into
    every output (public repo ``reshaper.py::convert`` attr loops /
    ``setncattr``); the Parquet analog is schema-level KV metadata, read
    back with ``read_global_attrs``. Values are stringified; existing table
    metadata is preserved (new keys win on collision)."""
    import pyarrow.parquet as pq

    if kv_meta:
        merged = dict(table.schema.metadata or {})
        merged.update(
            {str(k).encode(): str(v).encode() for k, v in kv_meta.items()}
        )
        table = table.replace_schema_metadata(merged)
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = final_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, final_path)


def read_global_attrs(path: str) -> dict[str, str]:
    """Global attributes of one output file (Parquet KV metadata) — footer
    read only, no data pages touched."""
    import pyarrow.parquet as pq

    md = pq.read_schema(path).metadata or {}
    out = {}
    for k, v in md.items():
        key = k.decode("utf-8", "replace")
        if key != "pandas":  # drop pandas' internal blob
            out[key] = v.decode("utf-8", "replace")
    return out


class SectionTimer:
    """TimeKeeper analog: named wall-clock sections within one bucket task."""

    def __init__(self) -> None:
        self.times: dict[str, float] = {}
        self._start: float | None = None
        self._name: str | None = None

    def start(self, name: str) -> None:
        self.stop()
        self._name = name
        self._start = time.perf_counter()

    def stop(self) -> None:
        if self._name is not None and self._start is not None:
            self.times[self._name] = self.times.get(self._name, 0.0) + (
                time.perf_counter() - self._start
            )
        self._name = None
        self._start = None
