"""Flagship pipeline: read → normalize → ONE shuffle → bucket-local everything.

The end-to-end ``s2srun`` analog (public repo ``scripts/s2srun`` →
``reshaper.create_reshaper(spec).convert()``):

    read_parquet(input, columns=transcript cols)        # S1, column-pruned
      → [heavy-conversation scan (shuffle-free) →       # WeightBalanced analog:
         pinned buckets + giant-conv segmentation]      #  two weight classes
      → map_batches(bucket id [+ seg]; derived columns  # M-ops, stateless
         deferred to the kernel when text ships)        #  (spill slimming)
      → exchange (spec.exchange, default "spill"):      # THE one all-to-all
           map-side hive-partitioned spill write → one task per remaining
           bucket reads ONLY its partition (see _execute_exchange for the
           "hash" and "groupby" alternatives; wmode 'a' spills only NEW
           input files and recomputes only their buckets)
      → bucket kernel per task:
           sort+dedup pivot · rollup tiers · cascade ·
           gap-fill · DoD/Gorilla encode · atomic write · manifest commit
           (+ segment partials for giant conversations)
      → stitch per giant conversation:                  # pseudo bucket ids
           merge 1m partials · cascade · gap-fill · stream-encode series
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

import numpy as np
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


def _auto_buckets(spec: JobSpec, target_bucket_bytes: int = 64 << 20) -> int:
    """Resolve ``n_buckets=0`` (auto) from INPUT SIZE, not a constant: one
    bucket per ~64 MB of input (a bucket's working set must fit a worker
    heap), floored at 2 blocks per CPU so every core has work, capped at
    4096 so the per-bucket fixed cost (file create, manifest row) stays
    amortized. Uses the already-resolved input signature (file sizes from
    stat, no data read) — the same auto-sizing a 100-TB run needs, where a
    hand-picked constant is wrong at both ends.
    """
    sizes = [e[1] for e in _input_signature(spec.input) if len(e) > 1]
    total = sum(sizes)
    by_size = -(-total // target_bucket_bytes) if total else 1
    cpus = 8.0
    try:
        import ray as _ray

        if _ray.is_initialized():
            cpus = _ray.cluster_resources().get("CPU", 8.0)
    except Exception:
        pass
    return int(min(4096, max(16, int(cpus) * 2, by_size)))


def _spill_fingerprint(spec: JobSpec, signature: tuple | None = None) -> str:
    """Identity of a spill: input paths + resolved file (size, mtime) list +
    every field that changes bucketing or the spilled row set."""
    return repr(
        (
            "spill-v2",  # spill schema version (v2 = slimmed, no derived cols)
            spec.input,
            signature if signature is not None else _input_signature(spec.input),
            spec.n_buckets,
            spec.exclude_roles,
            spec.conv_subset,
            spec.salt_threshold,
            spec.segment_threshold,
            spec.segment_rows,
            spec.include_turns,
        )
    )


def _execute_exchange(
    ds: "ray.data.Dataset",
    spec: JobSpec,
    completed: set[int],
    append_delta: "ray.data.Dataset | None" = None,
) -> pa.Table:
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
        import glob as _glob

        from .bucket import make_spill_bucket_worker

        spill_dir = os.path.join(spec.out_dir, "_spill")
        marker = os.path.join(spill_dir, "_SPILL_COMPLETE")
        # the spill is only reusable for the same input + filters + bucketing;
        # the resolved file list (+ size/mtime) is folded in so a wmode-'s'
        # rerun never reuses a stale spill after input files change or a glob
        # matches newly-added files
        fingerprint = _spill_fingerprint(spec)
        current = None
        if os.path.exists(marker):
            with open(marker) as f:
                current = f.read()
        if append_delta is not None and current is not None:
            # wmode 'a' incremental: the existing spill is valid for the OLD
            # file set (run_flagship verified the marker); spill ONLY the new
            # files into the same hive layout, then adopt the new fingerprint.
            # The file-listing diff yields exactly the delta buckets — only
            # those rerun the kernel (against old + new rows).
            snapshot = set(
                _glob.glob(os.path.join(spill_dir, "bucket=*", "*.parquet"))
            )
            t0 = time.perf_counter()
            num_cpus = int(ray.cluster_resources().get("CPU", 8))
            append_delta.repartition(max(2, num_cpus)).write_parquet(
                spill_dir, partition_cols=["bucket"]
            )
            added = (
                set(_glob.glob(os.path.join(spill_dir, "bucket=*", "*.parquet")))
                - snapshot
            )
            delta_buckets = {
                int(os.path.basename(os.path.dirname(f)).split("=")[1])
                for f in added
            }
            PHASE_TIMES["spill_write"] = time.perf_counter() - t0
            with open(marker + ".tmp", "w") as f:
                f.write(fingerprint)
            os.replace(marker + ".tmp", marker)
            # shared set with run_flagship: the stitch phase sees this too
            completed.difference_update(delta_buckets)
        elif current != fingerprint:
            import shutil

            shutil.rmtree(spill_dir, ignore_errors=True)
            t0 = time.perf_counter()
            # coalesce to a FIXED block count first: the hive-partitioned
            # write creates one file per (block × bucket), and file-creation
            # metadata is the dominant fixed cost of the spill. A constant
            # count (not cpus×k) keeps the file fan-out — and therefore the
            # fixed cost — identical at every cluster size, which is what the
            # N→4N scaling contract needs. (An Arrow-IPC indexed spill
            # variant was measured and LOST to this: the per-bucket slice
            # copies cost more than parquet's codec.)
            num_cpus = int(ray.cluster_resources().get("CPU", 8))
            ds.repartition(max(64, num_cpus * 2)).write_parquet(
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
    if spec.n_buckets == 0:  # auto: size from input bytes + cluster CPUs
        spec.n_buckets = _auto_buckets(spec)
    os.makedirs(spec.out_dir, exist_ok=True)
    if spec.wmode == "o":
        mf.clear(spec.out_dir)
        import shutil

        shutil.rmtree(os.path.join(spec.out_dir, "_spill"), ignore_errors=True)
        shutil.rmtree(os.path.join(spec.out_dir, "_salt"), ignore_errors=True)
        # drop stale tier outputs too: a rerun with fewer buckets / different
        # tiers must not leave old bucket=NNNNN files for read_tier to mix in
        from .bucket import TIER_DIRS

        for sub in set(TIER_DIRS.values()):
            shutil.rmtree(os.path.join(spec.out_dir, sub), ignore_errors=True)
    if spec.wmode in ("s", "a"):
        # a compacted tier froze the bucket=NNNNN layout; an append/resume
        # would recreate original bucket dirs next to coalesced spans and
        # duplicate those buckets' rows — refuse loudly (rebuild with 'o')
        from .compact import any_compacted

        frozen = any_compacted(spec.out_dir)
        if frozen:
            raise RuntimeError(
                f"output has compacted tiers {frozen}; wmode '{spec.wmode}' "
                "would duplicate rows — rerun with wmode 'o' to rebuild"
            )
    completed = (
        set(mf.load_completed(spec.out_dir)) if spec.wmode in ("s", "a") else set()
    )

    ds_provided = ds is not None
    if ds is None:
        ds = build_input(spec)

    # WeightBalanced analog (SURVEY.md §4), two weight classes from ONE
    # cheap conv_id-only combiner pass:
    #   - heavy (≥ salt_threshold turns): pinned WHOLE to round-robin
    #     buckets so hot conversations never stack on one hash bucket;
    #   - giant (≥ segment_threshold turns): SPLIT into turn_idx-range
    #     segments spread across buckets (seg = turn_idx // segment_rows) —
    #     no task ever holds the whole conversation; tier partials merge in
    #     the stitch step below.
    bucket_overrides: dict[str, int] | None = None
    segmented: dict[str, int] | None = None
    scan_thresholds = [
        t for t in (spec.salt_threshold, spec.segment_threshold) if t
    ]
    if scan_thresholds:
        from ..stages.normalize import find_heavy_conversations

        # the scan is a pure function of the input files + threshold, so its
        # result is cached next to the outputs keyed by the same
        # signature the spill fingerprint uses — a wmode-'s' resume or an
        # identical-input rerun skips the extra input pass entirely
        import json as _json

        cache_path = os.path.join(spec.out_dir, "_heavy_scan.json")
        cache_key = repr(
            ("heavy-v1", spec.input, _input_signature(spec.input), min(scan_thresholds))
        )
        heavy = None
        try:
            with open(cache_path) as f:
                cached = _json.load(f)
            if cached.get("key") == cache_key:
                heavy = {str(k): int(v) for k, v in cached["heavy"].items()}
                PHASE_TIMES["heavy_scan"] = 0.0
        except (OSError, ValueError, KeyError):
            pass
        if heavy is None:
            t0 = time.perf_counter()
            heavy = find_heavy_conversations(ds, min(scan_thresholds))
            PHASE_TIMES["heavy_scan"] = time.perf_counter() - t0
            tmp = cache_path + ".tmp"
            with open(tmp, "w") as f:
                _json.dump({"key": cache_key, "heavy": heavy}, f)
            os.replace(tmp, cache_path)
        if heavy:
            pinned: dict[str, int] = {}
            seg_base: dict[str, int] = {}
            for cid, cnt in heavy.items():
                if spec.segment_threshold and cnt >= spec.segment_threshold:
                    seg_base[cid] = len(seg_base) % spec.n_buckets
                elif spec.salt_threshold and cnt >= spec.salt_threshold:
                    pinned[cid] = len(pinned) % spec.n_buckets
            bucket_overrides = pinned or None
            segmented = seg_base or None

    def _prep(dataset: "ray.data.Dataset") -> "ray.data.Dataset":
        """Normalize + filter pipeline — shared by the full input and the
        wmode-'a' delta so appended files get IDENTICAL treatment.

        Spill slimming (SURVEY §8.1): with the text payload in the exchange
        anyway, the derived metric columns are NOT shipped — the bucket
        kernel recomputes them locally (same vectorized kernel, zero extra
        passes). Metrics-only mode drops text instead, so there the derived
        columns must travel.
        """
        dataset = normalize_dataset(
            dataset,
            n_buckets=spec.n_buckets,
            bucket_overrides=bucket_overrides,
            segmented=segmented,
            segment_rows=spec.segment_rows,
            derive=not spec.include_turns,
        )
        if not spec.include_turns:
            # metrics-only mode: the payload column never enters the exchange
            # (char_len/tok_est are already derived); the spill shrinks ~5×
            dataset = dataset.drop_columns(["text"])
        if spec.exclude_roles:
            excl = list(spec.exclude_roles)

            def drop_roles(b: pa.Table) -> pa.Table:
                return b.filter(
                    pc.invert(pc.is_in(b["role"], value_set=pa.array(excl)))
                )

            dataset = dataset.map_batches(
                drop_roles, batch_format="pyarrow", zero_copy_batch=True
            )
        if spec.conv_subset is not None:
            subset = list(spec.conv_subset)

            def keep_convs(b: pa.Table) -> pa.Table:
                return b.filter(pc.is_in(b["conv_id"], value_set=pa.array(subset)))

            dataset = dataset.map_batches(
                keep_convs, batch_format="pyarrow", zero_copy_batch=True
            )
        return dataset

    ds = _prep(ds)

    # wmode 'a': diff the resolved input files against the last run's
    # run-meta. Unchanged old files + valid marker → ingest ONLY the new
    # files (delta spill / delta-bucket recompute). Anything else (files
    # mutated or removed, bucket assignments moved, crashed prior append)
    # → fall back to a FULL recompute, never a silently stale result.
    append_delta: "ray.data.Dataset | None" = None
    appended = False
    if spec.wmode == "a" and not ds_provided:
        meta = mf.load_run_meta(spec.out_dir)
        cur_sig = _input_signature(spec.input)
        resolvable = all(len(e) == 3 for e in cur_sig)
        if meta and meta.get("signature") and resolvable:
            old_sig = tuple(tuple(e) for e in meta["signature"])
            old_files = {e[0]: (e[1], e[2]) for e in old_sig}
            cur_files = {e[0]: (e[1], e[2]) for e in cur_sig}
            changed = any(
                p not in cur_files or cur_files[p] != v
                for p, v in old_files.items()
            )
            assign_moved = (
                meta.get("pinned", {}) != (bucket_overrides or {})
                or meta.get("segmented", {}) != (segmented or {})
                or meta.get("n_buckets") != spec.n_buckets
                or meta.get("segment_rows") != spec.segment_rows
            )
            marker_ok = True
            if spec.exchange == "spill":
                marker_path = os.path.join(spec.out_dir, "_spill", "_SPILL_COMPLETE")
                expected_old = _spill_fingerprint(spec, signature=old_sig)
                marker_ok = (
                    os.path.exists(marker_path)
                    and open(marker_path).read() == expected_old
                )
            new_files = [p for p in cur_files if p not in old_files]
            if changed or assign_moved or not marker_ok:
                # full recompute: forget completed work + stale partials
                import shutil

                mf.clear(spec.out_dir)
                completed = set()
                shutil.rmtree(os.path.join(spec.out_dir, "_salt"), ignore_errors=True)
            elif new_files:
                appended = True
                delta = _prep(
                    ray.data.read_parquet(new_files, columns=TRANSCRIPT_COLUMNS)
                )
                if spec.exchange == "spill":
                    append_delta = delta
                else:
                    # delta buckets from a pruned pass over the new files only
                    db = delta.select_columns(["bucket"]).map_batches(
                        lambda b: pa.table(
                            {"bucket": pc.unique(b["bucket"].combine_chunks())}
                        ),
                        batch_format="pyarrow",
                    )
                    delta_buckets = {
                        int(x)
                        for x in pc.unique(
                            pa.concat_tables(
                                [t for t in (ray.get(r)
                                             for r in db.materialize().to_arrow_refs())
                                 if t.num_columns]
                            )["bucket"].combine_chunks()
                        ).to_pylist()
                    }
                    completed.difference_update(delta_buckets)
        # else: no meta / unresolvable input — behave like wmode 's'
    if appended:
        # any new data → re-stitch segmented conversations (cheap, idempotent)
        completed = {b for b in completed if b < spec.n_buckets}

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

    metrics = _execute_exchange(ds, spec, completed, append_delta=append_delta)

    # stitch phase for segmented giant conversations: one task per
    # conversation merges the staged (bucket, seg) partials into its tier
    # rows and stream-encodes the series; outputs land under pseudo bucket
    # ids (n_buckets + index) with normal manifest records, so the stitch is
    # resumable exactly like a bucket. Skipped under output_limit (a debug
    # subset may not have produced every segment's partials).
    if segmented and spec.output_limit is None:
        from .bucket import stitch_salted_conversation

        spec_dict = _spec_dict(spec)
        todo = [
            (cid, spec.n_buckets + idx)
            for idx, cid in enumerate(sorted(segmented))
            if spec.n_buckets + idx not in completed
        ]
        if todo:
            t0 = time.perf_counter()
            stitch = ray.remote(num_cpus=1)(stitch_salted_conversation)
            rows = ray.get(
                [stitch.remote(spec_dict, cid, pseudo) for cid, pseudo in todo]
            )
            metrics = pa.concat_tables([metrics, *rows])
            PHASE_TIMES["stitch_phase"] = time.perf_counter() - t0

    # once-file analog: the shared dimension table is written ONCE per run by
    # the driver, not replicated into every bucket (J2, SURVEY.md §2.4).
    if spec.conv_meta and spec.once:
        import pyarrow.parquet as pq

        meta = pq.read_table(spec.conv_meta)
        mf.atomic_write_parquet(meta, os.path.join(spec.out_dir, "conv_meta.parquet"))

    # run-meta: the lineage record wmode 'a' diffs against next time —
    # resolved file signature + the bucket assignments this run used
    if not ds_provided:
        sig = _input_signature(spec.input)
        if sig and all(len(e) == 3 for e in sig):
            mf.save_run_meta(
                spec.out_dir,
                {
                    "signature": [list(e) for e in sig],
                    "pinned": bucket_overrides or {},
                    "segmented": segmented or {},
                    "n_buckets": spec.n_buckets,
                    "segment_rows": spec.segment_rows,
                },
            )
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


def tier_routed_rollup(
    out_dir: str,
    range_start_us: int,
    range_end_us: int,
    resolution_us: int,
    now_us: int,
    keep_us: dict | None = None,
    raw_ds_factory=None,
) -> "ray.data.Dataset":
    """EXECUTE a continuous-aggregate read through the tier router
    (``planner.tier_route_plan`` promoted from plan to execution — VERDICT
    r3 #9): the window aggregate (turn_count, char_sum, tool_calls per
    ``resolution_us`` bucket over ``[range_start, range_end)``) is served
    from the COARSEST retained fine-enough rollup tier; when retention has
    pruned every qualifying tier the query falls through to the raw turns
    (``raw_ds_factory()`` → a transcript Dataset with text/tool/ts).

    Additivity makes the answer tier-invariant: every tier's
    turn_count/char_sum/tool_calls are sums over disjoint conv×window
    cells, so re-summing them to a coarser grid is bit-identical to
    aggregating raw turns — the property the oracle SQL checks.

    Raw-fallback contract: the raw path aggregates the turns it is given
    verbatim — callers replaying duplicate (conv_id, turn_idx) rows must
    dedup first (the flagship normalize stage does) or tier-served and
    raw-served totals will differ by exactly the replayed rows.

    Output: window_start (timestamp us, epoch-floored to resolution),
    turn_count, char_sum, tool_calls (BIGINTs).
    """
    import pyarrow.compute as pc

    from ..sources.planner import tier_route_plan
    from ..util import hash_partitioned_agg

    plan = tier_route_plan(
        range_start_us, range_end_us, resolution_us, now_us, keep_us=keep_us
    )
    lo, hi, res = int(range_start_us), int(range_end_us), int(resolution_us)
    # Executor-side validation on top of the pure plan (ADVICE r4):
    # a tier can only serve the window bit-exactly when its windows nest
    # inside the requested grid (res(tier) divides res) AND the range
    # bounds are aligned to the tier's window width (a straddling tier
    # window would be wholly included/excluded, diverging from the raw
    # answer). A chosen tier whose directory was never built (run with a
    # pruned tier list) falls through to the next coarsest candidate,
    # then raw. Candidates = qualifying tiers, coarsest first (the
    # plan's own preference order).
    from ..sources.planner import _TIER_RES_US

    candidates = sorted(
        (
            t
            for t, f, r in zip(
                plan["tier"].to_pylist(),
                plan["fine_enough"].to_pylist(),
                plan["retained"].to_pylist(),
            )
            if f and r
        ),
        key=lambda t: -_TIER_RES_US[t],
    )
    chosen = []
    for t in candidates:
        tres = _TIER_RES_US[t]
        if res % tres != 0 or lo % tres != 0 or hi % tres != 0:
            continue  # tier windows would straddle the requested grid
        from .bucket import TIER_DIRS

        if not os.path.isdir(os.path.join(out_dir, TIER_DIRS[t])):
            continue  # run was built without this tier — fall through
        chosen = [t]
        break

    if chosen:
        def tier_parts(b: pa.Table) -> pa.Table:
            ws = pc.cast(b["window_start"], pa.int64())
            keep = pc.and_(
                pc.greater_equal(ws, pa.scalar(lo, pa.int64())),
                pc.less(ws, pa.scalar(hi, pa.int64())),
            )
            t = pa.table(
                {
                    "w": pc.multiply(
                        pc.divide(ws, pa.scalar(res, pa.int64())),
                        pa.scalar(res, pa.int64()),
                    ),
                    "turn_count": pc.cast(b["turn_count"], pa.int64()),
                    "char_sum": pc.cast(b["char_sum"], pa.int64()),
                    "tool_calls": pc.cast(b["tool_calls"], pa.int64()),
                }
            ).filter(keep)
            g = t.group_by(["w"]).aggregate(
                [("turn_count", "sum"), ("char_sum", "sum"), ("tool_calls", "sum")]
            )
            return pa.table(
                {
                    "w": g["w"],
                    "turn_count": pc.cast(g["turn_count_sum"], pa.int64()),
                    "char_sum": pc.cast(g["char_sum_sum"], pa.int64()),
                    "tool_calls": pc.cast(g["tool_calls_sum"], pa.int64()),
                }
            )

        src = read_tier(out_dir, chosen[0]).map_batches(
            tier_parts, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        if raw_ds_factory is None:
            raise ValueError(
                "no retained tier serves the window and no raw fallback "
                "was provided (raw_ds_factory)"
            )

        def raw_parts(b: pa.Table) -> pa.Table:
            ts = pc.cast(b["ts"], pa.int64())
            keep = pc.and_(
                pc.greater_equal(ts, pa.scalar(lo, pa.int64())),
                pc.less(ts, pa.scalar(hi, pa.int64())),
            )
            t = pa.table(
                {
                    "w": pc.multiply(
                        pc.divide(ts, pa.scalar(res, pa.int64())),
                        pa.scalar(res, pa.int64()),
                    ),
                    "n": pa.array(
                        np.ones(b.num_rows, dtype=np.int64), pa.int64()
                    ),
                    "chars": pc.cast(
                        pc.utf8_length(pc.cast(b["text"], pa.string())),
                        pa.int64(),
                    ),
                    "tool1": pc.cast(
                        pc.not_equal(pc.cast(b["tool"], pa.string()), ""),
                        pa.int64(),
                    ),
                }
            ).filter(keep)
            g = t.group_by(["w"]).aggregate(
                [("n", "sum"), ("chars", "sum"), ("tool1", "sum")]
            )
            return pa.table(
                {
                    "w": g["w"],
                    "turn_count": pc.cast(g["n_sum"], pa.int64()),
                    "char_sum": pc.cast(g["chars_sum"], pa.int64()),
                    "tool_calls": pc.cast(g["tool1_sum"], pa.int64()),
                }
            )

        src = raw_ds_factory().map_batches(
            raw_parts, batch_format="pyarrow", zero_copy_batch=True
        )

    merged = hash_partitioned_agg(
        src,
        keys=["w"],
        aggs=[
            ("turn_count", "sum", "turn_count"),
            ("char_sum", "sum", "char_sum"),
            ("tool_calls", "sum", "tool_calls"),
        ],
        n_parts=8,
    )
    return merged.map_batches(
        lambda b: pa.table(
            {
                "window_start": pc.cast(b["w"], pa.timestamp("us")),
                "turn_count": b["turn_count"],
                "char_sum": b["char_sum"],
                "tool_calls": b["tool_calls"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
