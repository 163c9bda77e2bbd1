"""Flagship pipeline: read → normalize → ONE shuffle → bucket-local everything.

The end-to-end ``s2srun`` analog (public repo ``scripts/s2srun`` →
``reshaper.create_reshaper(spec).convert()``):

    read_parquet(input, columns=transcript cols)        # S1, column-pruned
      → [heavy-conversation scan → bucket overrides]    # WeightBalanced analog
      → map_batches(normalize + bucket id)              # M-ops, stateless
      → exchange (spec.exchange, default "spill"):      # THE one all-to-all
           map-side hive-partitioned spill write → one task per remaining
           bucket reads ONLY its partition (see _execute_exchange for the
           "hash" and "groupby" alternatives)
      → bucket kernel per task:
           sort+dedup pivot · rollup tiers · cascade ·
           gap-fill · DoD/Gorilla encode · atomic write · manifest commit
      → metrics rows (one per bucket) → driver reduce   # print_diagnostics

Scale properties: exactly one all-to-all exchange; its payload is the
normalized corpus (text projected through for the turns tier — drop it via
``JobSpec`` if only rollups are needed); writes fan out per bucket with
deterministic names, so a rerun skips committed buckets after one input scan.
Writes assume cluster-shared storage (true for any real multi-node target:
NFS / object store mount), the same assumption PyReshaper makes of GPFS.
"""

from __future__ import annotations

import dataclasses
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

# wall-clock of the last run's phases (driver-side diagnostics, bench uses it)
PHASE_TIMES: dict[str, float] = {}

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


def _input_signature(input_paths: str | list[str]) -> tuple:
    """Resolved input file list with (size, mtime_ns) per file — the part of
    the spill fingerprint that detects input mutation. Unresolvable paths
    (e.g. the caller passed a pre-built Dataset and ``spec.input`` is only
    nominal) contribute their literal string, never an error."""
    import glob as _glob

    paths = [input_paths] if isinstance(input_paths, str) else list(input_paths)
    sig: list[tuple] = []
    for p in paths:
        if os.path.isdir(p):
            files = sorted(_glob.glob(os.path.join(p, "*.parquet")))
        elif "*" in p or "?" in p:
            files = sorted(_glob.glob(p))
        elif os.path.exists(p):
            files = [p]
        else:
            sig.append((p,))
            continue
        for f in files:
            st = os.stat(f)
            sig.append((f, st.st_size, st.st_mtime_ns))
    return tuple(sig)


def build_input(spec: JobSpec) -> "ray.data.Dataset":
    paths = spec.input
    return ray.data.read_parquet(paths, columns=TRANSCRIPT_COLUMNS)


def _execute_exchange(ds: "ray.data.Dataset", spec: JobSpec, completed: set[int]) -> pa.Table:
    """The one all-to-all, chosen by ``spec.exchange``:

    - ``"spill"`` (default): two-phase disk-mediated exchange, the classic
      map-side-partitioned-spill / reduce-side-read shuffle — and the direct
      Ray analog of PyReshaper's rank-local model (each rank touches only its
      own partition's data; shared storage is the exchange medium).
        phase A: ``write_parquet(spill, partition_cols=["bucket"])`` — an
                 embarrassingly parallel fan-out write (measured ≈0.9
                 scaling efficiency), committed with a marker file;
        phase B: one task per bucket batch reads ONLY its bucket's spill
                 files and runs the full bucket kernel + atomic write +
                 manifest commit. No object-store all-to-all at all, and a
                 crash between phases resumes without redoing phase A.
    - ``"hash"``: in-memory HASH_SHUFFLE ``repartition(keys=["bucket"])``
      (n_partitions bounded by CPUs — aggregators are actors).
    - ``"groupby"``: sort-based ``groupby("bucket").map_groups`` fallback.
    """
    import ray

    from .bucket import make_block_writer, make_bucket_writer

    spec_dict = _spec_dict(spec)

    if spec.exchange == "spill":
        from .bucket import make_spill_bucket_worker

        spill_dir = os.path.join(spec.out_dir, "_spill")
        marker = os.path.join(spill_dir, "_SPILL_COMPLETE")
        # the spill is only reusable for the same input + filters + bucketing;
        # the resolved file list (+ size/mtime) is folded in so a wmode-'s'
        # rerun never reuses a stale spill after input files change or a glob
        # matches newly-added files
        fingerprint = repr(
            (
                spec.input,
                _input_signature(spec.input),
                spec.n_buckets,
                spec.exclude_roles,
                spec.conv_subset,
                spec.salt_threshold,
                spec.include_turns,
            )
        )
        current = None
        if os.path.exists(marker):
            with open(marker) as f:
                current = f.read()
        if current != fingerprint:
            import shutil

            shutil.rmtree(spill_dir, ignore_errors=True)
            t0 = time.perf_counter()
            # coalesce to ~2 blocks/CPU first: the hive-partitioned write
            # creates one file per (block × bucket), and file-creation
            # metadata is the dominant fixed cost of the spill. (An Arrow-IPC
            # indexed spill variant was measured and LOST to this: the
            # per-bucket slice copies cost more than parquet's codec.)
            num_cpus = int(ray.cluster_resources().get("CPU", 8))
            ds.repartition(num_cpus * 2).write_parquet(
                spill_dir, partition_cols=["bucket"]
            )
            PHASE_TIMES["spill_write"] = time.perf_counter() - t0
            # atomic marker commit: a crash mid-write must not leave a
            # valid-looking marker over an incomplete spill
            with open(marker + ".tmp", "w") as f:
                f.write(fingerprint)
            os.replace(marker + ".tmp", marker)
        else:
            PHASE_TIMES["spill_write"] = 0.0
        todo = [
            {"bucket": b}
            for b in range(spec.n_buckets)
            if b not in completed
            and (spec.output_limit is None or b < spec.output_limit)
        ]
        if not todo:
            from .bucket import METRICS_SCHEMA

            return METRICS_SCHEMA.empty_table()
        t0 = time.perf_counter()
        # phase B is a task-parallel loop over bucket ids — no data flows
        # between buckets, each task reads only its own spill partition.
        # This is the one place the engine drops to raw Ray tasks: a
        # 128-element id list is a degenerate Dataset, and ray.data's
        # task-sizing heuristics (tuned for byte-sized inputs) measurably
        # under-parallelize it, while plain tasks scale with the CPU count.
        worker = make_spill_bucket_worker(spec_dict, spill_dir)
        one = ray.remote(num_cpus=1)(
            lambda b: worker(pa.table({"bucket": pa.array([b], pa.int32())}))
        )
        results = ray.get([one.remote(d["bucket"]) for d in todo])
        result = pa.concat_tables([r for r in results if r.num_rows >= 0])
        PHASE_TIMES["bucket_phase"] = time.perf_counter() - t0
        return result

    if spec.exchange == "hash":
        from ray.data.context import ShuffleStrategy

        num_cpus = int(ray.cluster_resources().get("CPU", 8))
        nparts = max(2, min(spec.n_buckets, num_cpus - 2 if num_cpus > 4 else 2))
        ctx = ray.data.DataContext.get_current()
        prev = ctx.shuffle_strategy
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # a Dataset captures its DataContext at creation — the already-built
        # input chain needs the strategy set on ITS context too
        ds_ctx = getattr(ds, "context", None)
        prev_ds = ds_ctx.shuffle_strategy if ds_ctx is not None else None
        if ds_ctx is not None:
            ds_ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            rp = ds.repartition(nparts, keys=["bucket"], sort=False)
            out = rp.map_batches(
                make_block_writer(spec_dict),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            )
            return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
        finally:
            ctx.shuffle_strategy = prev
            if ds_ctx is not None and prev_ds is not None:
                ds_ctx.shuffle_strategy = prev_ds

    metrics_ds = ds.groupby("bucket").map_groups(
        make_bucket_writer(spec_dict), batch_format="pyarrow"
    )
    return pa.Table.from_pandas(metrics_ds.to_pandas(), preserve_index=False)


def run_flagship(spec: JobSpec, ds: "ray.data.Dataset | None" = None) -> pa.Table:
    """Run the flagship conversion. Returns the per-bucket metrics table."""
    spec.validate()
    os.makedirs(spec.out_dir, exist_ok=True)
    if spec.wmode == "o":
        mf.clear(spec.out_dir)
        import shutil

        shutil.rmtree(os.path.join(spec.out_dir, "_spill"), ignore_errors=True)
        # drop stale tier outputs too: a rerun with fewer buckets / different
        # tiers must not leave old bucket=NNNNN files for read_tier to mix in
        from .bucket import TIER_DIRS

        for sub in set(TIER_DIRS.values()):
            shutil.rmtree(os.path.join(spec.out_dir, sub), ignore_errors=True)
    completed = set(mf.load_completed(spec.out_dir)) if spec.wmode == "s" else set()

    if ds is None:
        ds = build_input(spec)

    # WeightBalanced analog (SURVEY.md §4): detect conversations heavier
    # than salt_threshold turns with a cheap conv_id-only combiner pass and
    # pin each to its own bucket (round-robin), so a hot conversation never
    # stacks onto an already-full hash bucket. Costs one extra column-pruned
    # input scan; skip by setting salt_threshold=0.
    bucket_overrides: dict[str, int] | None = None
    if spec.salt_threshold:
        from ..stages.normalize import find_heavy_conversations

        heavy = find_heavy_conversations(ds, spec.salt_threshold)
        if heavy:
            bucket_overrides = {
                cid: i % spec.n_buckets for i, cid in enumerate(heavy)
            }

    ds = normalize_dataset(
        ds, n_buckets=spec.n_buckets, bucket_overrides=bucket_overrides
    )

    if not spec.include_turns:
        # metrics-only mode: the payload column never enters the exchange
        # (char_len/tok_est are already derived); the spill shrinks ~5×
        ds = ds.drop_columns(["text"])

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

    if spec.exchange != "spill":
        # spill mode handles limit/resume at the phase-B task list instead —
        # the spill itself is written once and shared by every resume
        if spec.output_limit is not None:
            limit = spec.output_limit  # debug subset: first N buckets

            def keep_limit(b: pa.Table) -> pa.Table:
                return b.filter(pc.less(b["bucket"], limit))

            ds = ds.map_batches(keep_limit, batch_format="pyarrow", zero_copy_batch=True)

        if completed:
            done = pa.array(sorted(completed), pa.int32())

            def drop_done(b: pa.Table) -> pa.Table:
                return b.filter(pc.invert(pc.is_in(b["bucket"], value_set=done)))

            ds = ds.map_batches(drop_done, batch_format="pyarrow", zero_copy_batch=True)

    metrics = _execute_exchange(ds, spec, completed)

    # once-file analog: the shared dimension table is written ONCE per run by
    # the driver, not replicated into every bucket (J2, SURVEY.md §2.4).
    if spec.conv_meta and spec.once:
        import pyarrow.parquet as pq

        meta = pq.read_table(spec.conv_meta)
        mf.atomic_write_parquet(meta, os.path.join(spec.out_dir, "conv_meta.parquet"))
    return metrics


def run_many(specs: list[JobSpec]) -> dict[str, pa.Table]:
    """Run several conversions in one session — the ``create_reshaper``
    multi-Specifier support analog (public repo ``reshaper.py``). Sequential
    by design: each job already saturates the cluster."""
    return {spec.out_dir: run_flagship(spec) for spec in specs}


def read_tier(out_dir: str, tier: str) -> "ray.data.Dataset":
    """Read one product of a completed run as a Dataset."""
    from .bucket import TIER_DIRS

    return ray.data.read_parquet(os.path.join(out_dir, TIER_DIRS[tier]))
