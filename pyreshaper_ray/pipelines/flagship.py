"""Flagship pipeline: read → normalize → ONE shuffle → bucket-local everything.

The end-to-end ``s2srun`` analog (public repo ``scripts/s2srun`` →
``reshaper.create_reshaper(spec).convert()``):

    read_parquet(input, columns=transcript cols)        # S1, column-pruned
      → map_batches(normalize + bucket id)              # M-ops, stateless
      → [resume filter: drop manifest-completed buckets]# wmode 's'
      → groupby("bucket").map_groups(bucket kernel)     # THE shuffle
           sort+dedup pivot · rollup tiers · cascade ·
           gap-fill · DoD/Gorilla encode · atomic write · manifest commit
      → metrics rows (one per bucket) → driver reduce   # print_diagnostics

Scale properties: exactly one all-to-all exchange; the shuffle payload is the
normalized corpus (text projected through for the turns tier — drop it via
``JobSpec`` if only rollups are needed); writes fan out per bucket with
deterministic names, so a rerun skips committed buckets after one input scan.
Writes assume cluster-shared storage (true for any real multi-node target:
NFS / object store mount), the same assumption PyReshaper makes of GPFS.
"""

from __future__ import annotations

import dataclasses
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .. import TRANSCRIPT_COLUMNS
from ..stages.normalize import normalize_dataset
from ..state import manifest as mf
from .bucket import make_bucket_writer
from .spec import JobSpec


def _spec_dict(spec: JobSpec) -> dict:
    d = dataclasses.asdict(spec)
    d["tiers"] = tuple(d["tiers"])
    return d


def build_input(spec: JobSpec) -> "ray.data.Dataset":
    paths = spec.input
    return ray.data.read_parquet(paths, columns=TRANSCRIPT_COLUMNS)


def run_flagship(spec: JobSpec, ds: "ray.data.Dataset | None" = None) -> pa.Table:
    """Run the flagship conversion. Returns the per-bucket metrics table."""
    spec.validate()
    os.makedirs(spec.out_dir, exist_ok=True)
    if spec.wmode == "o":
        mf.clear(spec.out_dir)
    completed = set(mf.load_completed(spec.out_dir)) if spec.wmode == "s" else set()

    if ds is None:
        ds = build_input(spec)
    ds = normalize_dataset(ds, n_buckets=spec.n_buckets)

    if spec.exclude_roles:
        excl = list(spec.exclude_roles)

        def drop_roles(b: pa.Table) -> pa.Table:
            return b.filter(pc.invert(pc.is_in(b["role"], value_set=pa.array(excl))))

        ds = ds.map_batches(drop_roles, batch_format="pyarrow", zero_copy_batch=True)

    if spec.conv_subset is not None:
        subset = list(spec.conv_subset)

        def keep_convs(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b["conv_id"], value_set=pa.array(subset)))

        ds = ds.map_batches(keep_convs, batch_format="pyarrow", zero_copy_batch=True)

    if spec.output_limit is not None:
        limit = spec.output_limit  # debug subset: first N buckets (s2srun --limit)

        def keep_limit(b: pa.Table) -> pa.Table:
            return b.filter(pc.less(b["bucket"], limit))

        ds = ds.map_batches(keep_limit, batch_format="pyarrow", zero_copy_batch=True)

    if completed:
        done = pa.array(sorted(completed), pa.int32())

        def drop_done(b: pa.Table) -> pa.Table:
            return b.filter(pc.invert(pc.is_in(b["bucket"], value_set=done)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow", zero_copy_batch=True)

    writer = make_bucket_writer(_spec_dict(spec))
    metrics_ds = ds.groupby("bucket").map_groups(writer, batch_format="pyarrow")
    metrics = pa.Table.from_pandas(metrics_ds.to_pandas(), preserve_index=False)

    # once-file analog: the shared dimension table is written ONCE per run by
    # the driver, not replicated into every bucket (J2, SURVEY.md §2.4).
    if spec.conv_meta and spec.once:
        import pyarrow.parquet as pq

        meta = pq.read_table(spec.conv_meta)
        mf.atomic_write_parquet(meta, os.path.join(spec.out_dir, "conv_meta.parquet"))
    return metrics


def read_tier(out_dir: str, tier: str) -> "ray.data.Dataset":
    """Read one product of a completed run as a Dataset."""
    from .bucket import TIER_DIRS

    return ray.data.read_parquet(os.path.join(out_dir, TIER_DIRS[tier]))
