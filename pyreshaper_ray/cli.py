"""CLI — the ``s2smake`` / ``s2srun`` analog (public NCAR/PyReshaper repo
``scripts/``).

    python -m pyreshaper_ray.cli make --input DIR --out DIR [options] SPECFILE
    python -m pyreshaper_ray.cli run SPECFILE [--wmode s|o] [--limit N]
                                              [--serial] [--num-cpus N]

``make`` builds + validates a JobSpec and writes it as JSON (the pickled
Specifier analog, but human-readable). ``run`` loads it and executes the
flagship pipeline; ``--serial`` runs the single-process oracle instead (the
``s2srun --serial`` analog — and the correctness reference).

This module OWNS a Ray session (guarded init); library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def cmd_make(args: argparse.Namespace) -> int:
    from .pipelines.spec import create_spec

    spec = create_spec(
        input=args.input,
        out_dir=args.out,
        n_buckets=args.n_buckets,
        tiers=tuple(args.tiers.split(",")),
        include_turns=not args.no_turns,
        gapfill=not args.no_gapfill,
        gapfill_max_gap=args.max_gap,
        encode=not args.no_encode,
        wmode=args.wmode,
        conv_meta=args.conv_meta,
        once=not args.no_once,
        exclude_roles=tuple(args.exclude) if args.exclude else (),
        conv_subset=tuple(args.conv) if args.conv else None,
        salt_threshold=args.salt_threshold,
        segment_threshold=args.segment_threshold,
        segment_rows=args.segment_rows,
    )
    spec.write(args.specfile)
    print(f"wrote {args.specfile}")
    return 0


def cmd_run(args: argparse.Namespace) -> int:
    from .pipelines.spec import JobSpec

    spec = JobSpec.read(args.specfile)
    if args.wmode:
        spec.wmode = args.wmode
    if args.limit is not None:
        spec.output_limit = args.limit
    spec.validate()

    if args.serial:
        # serial mode = the oracle (single-process reference implementation)
        import glob

        import pyarrow as pa
        import pyarrow.parquet as pq

        from .oracle import oracle_full
        from .state.manifest import atomic_write_parquet

        paths = (
            sorted(glob.glob(os.path.join(spec.input, "*.parquet")))
            if isinstance(spec.input, str) and os.path.isdir(spec.input)
            else ([spec.input] if isinstance(spec.input, str) else spec.input)
        )
        t = pa.concat_tables([pq.read_table(p) for p in paths])
        out = oracle_full(t, tiers=spec.tiers)
        names = {"turns": "turns", "gapfill_1m": "gapfill_1m", "series": "series"}
        names.update({f"rollup_{tier}": f"rollup_{tier}" for tier in spec.tiers})
        for key, sub in names.items():
            atomic_write_parquet(
                out[key], os.path.join(spec.out_dir, sub, "serial", "part-000.parquet")
            )
        print(json.dumps({k: v.num_rows for k, v in out.items()}))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            # honor RAY_ADDRESS so `ray job submit` runs attach to the
            # cluster; bare local runs default to a private instance
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = args.verbosity > 0

    from .pipelines.flagship import run_flagship

    try:
        metrics = run_flagship(spec)
        import pyarrow.compute as pc

        summary = {
            "buckets": metrics.num_rows,
            "n_turns": int(pc.sum(metrics["n_turns"]).as_py() or 0),
            "n_convs": int(pc.sum(metrics["n_convs"]).as_py() or 0),
            "task_seconds": round(float(pc.sum(metrics["seconds"]).as_py() or 0), 2),
        }
        print(json.dumps(summary))
    finally:
        ray.shutdown()
    return 0


def cmd_retain(args: argparse.Namespace) -> int:
    """Enforce retention tiers over a completed run's output layout."""
    import numpy as np

    import ray

    from .pipelines.retention import DAY_US, DEFAULT_POLICY, apply_retention

    if args.keep:
        policy: dict[str, int | None] = {}
        for item in args.keep:
            tier, _, days = item.partition("=")
            policy[tier] = None if days in ("", "forever") else int(float(days) * DAY_US)
    else:
        # no --keep: enforce the standard TSDB ladder rather than a no-op
        policy = dict(DEFAULT_POLICY)
    now_us = (
        int(np.datetime64(args.now, "us").astype(np.int64))
        if args.now
        else int(np.datetime64("now", "us").astype(np.int64))
    )
    if not ray.is_initialized():
        ray.init(
            # honor RAY_ADDRESS so `ray job submit` runs attach to the
            # cluster; bare local runs default to a private instance
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        record = apply_retention(args.out, policy, now_us)
        print(json.dumps(record))
    finally:
        ray.shutdown()
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    """Export a tier to another sink format — the output-backend-selector
    analog of PyReshaper's ``ncfmt`` (netcdf/netcdf4/netcdf4c): the engine's
    products stay Parquet internally; ``export`` re-materializes a tier as
    csv/json/parquet for downstream consumers, streaming block-by-block
    (never a driver materialization)."""
    import ray

    from .pipelines.flagship import read_tier

    if not ray.is_initialized():
        ray.init(
            # honor RAY_ADDRESS so `ray job submit` runs attach to the
            # cluster; bare local runs default to a private instance
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        ds = read_tier(args.out, args.tier)
        if "bucket" in (ds.schema().names or []):
            ds = ds.drop_columns(["bucket"])
        if args.format == "ipc":
            # Ray Data has no IPC sink; stream one Arrow IPC file per block
            # (the mirror of the Arrow-IPC *source* backend) — each task
            # writes its own part file, nothing funnels through the driver.
            import uuid

            import pyarrow as pa
            import pyarrow.ipc as pipc

            dest = args.dest
            os.makedirs(dest, exist_ok=True)

            def write_block(b: "pa.Table") -> "pa.Table":
                if b.num_rows:
                    path = os.path.join(dest, f"part-{uuid.uuid4().hex}.arrow")
                    with pipc.new_file(path, b.schema) as w:
                        w.write_table(b)
                return pa.table({"rows": pa.array([b.num_rows], pa.int64())})

            ds.map_batches(
                write_block, batch_format="pyarrow", batch_size=None
            ).count()
        else:
            writer = {
                "csv": ds.write_csv,
                "json": ds.write_json,
                "parquet": ds.write_parquet,
            }[args.format]
            writer(args.dest)
        print(json.dumps({"tier": args.tier, "format": args.format,
                          "rows": ds.count(), "dest": args.dest}))
    finally:
        ray.shutdown()
    return 0


def cmd_verify(args: argparse.Namespace) -> int:
    """Run the DISTRIBUTED flagship and the SINGLE-PROCESS oracle on the
    same spec and compare every product tier bit-for-bit — the packaged
    reshaperTests equivalence check (PyReshaper's reshapertests /
    specificationtests), one command instead of two runs plus a manual
    diff. Exit 0 = every tier byte-equal under stable key order; exit 1
    lists the first divergence per tier."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray

    from .oracle import oracle_full
    from .pipelines.flagship import read_tier, run_flagship
    from .pipelines.spec import JobSpec

    spec = JobSpec.read(args.specfile)
    spec.validate()

    tier_keys = {"turns": ["conv_id", "turn_idx"], "series": ["conv_id"]}
    for t in spec.tiers:
        tier_keys[t] = ["conv_id", "window_start"]
    tier_keys["gapfill_1m"] = ["conv_id", "window_start"]
    oracle_key = {"turns": "turns", "gapfill_1m": "gapfill_1m", "series": "series"}
    oracle_key.update({t: f"rollup_{t}" for t in spec.tiers})

    paths = (
        sorted(_glob.glob(os.path.join(spec.input, "*.parquet")))
        if isinstance(spec.input, str) and os.path.isdir(spec.input)
        else ([spec.input] if isinstance(spec.input, str) else spec.input)
    )
    want = oracle_full(
        pa.concat_tables([pq.read_table(p) for p in paths]), tiers=spec.tiers
    )

    if not ray.is_initialized():
        ray.init(
            # honor RAY_ADDRESS so `ray job submit` runs attach to the
            # cluster; bare local runs default to a private instance
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    verdicts: dict[str, str] = {}
    try:
        run_flagship(spec)
        tiers = ["turns"] + list(spec.tiers) + (
            ["gapfill_1m"] if spec.gapfill else []
        ) + ["series"]
        if not spec.include_turns:
            tiers.remove("turns")
        for tier in tiers:
            keys = tier_keys[tier]
            refs = read_tier(spec.out_dir, tier).to_arrow_refs()
            got = pa.concat_tables(
                [t for t in (ray.get(r) for r in refs) if t.num_columns]
            )
            ref = want[oracle_key[tier]]
            got = got.select(ref.column_names)

            def canon(tbl: pa.Table) -> pa.Table:
                return tbl.take(
                    pc.sort_indices(
                        tbl, sort_keys=[(k, "ascending") for k in keys]
                    )
                )

            if canon(got).equals(canon(ref)):
                verdicts[tier] = f"equal ({got.num_rows} rows)"
            else:
                verdicts[tier] = (
                    f"MISMATCH (distributed {got.num_rows} rows, "
                    f"oracle {ref.num_rows})"
                )
    finally:
        ray.shutdown()
    ok = all(v.startswith("equal") for v in verdicts.values())
    print(json.dumps({"verdict": "equal" if ok else "MISMATCH", **verdicts}))
    return 0 if ok else 1


def cmd_explain(args: argparse.Namespace) -> int:
    """Describe the physical plan for a spec WITHOUT running it — the
    diagnostics/verbosity analog (PyReshaper's -v inspection), built from
    parquet footer statistics only (no data pages read, no Ray session):
    input size/rows, the resolved bucket count (including n_buckets=0
    auto-sizing), exchange strategy, what crosses it (text projected away
    under metrics-only), and the per-bucket working-set estimate the
    auto-sizer targets. Prints one JSON object.
    """
    from .pipelines.flagship import _auto_buckets, _input_signature
    from .pipelines.spec import JobSpec
    from .stages.joins import parquet_footer_stats

    spec = JobSpec.read(args.specfile)
    sig = _input_signature(spec.input)
    files = [e[0] for e in sig if len(e) > 1]
    total_bytes = sum(e[1] for e in sig if len(e) > 1)
    rows = 0
    for f in files:
        try:
            rows += parquet_footer_stats(f)["rows"]
        except Exception:
            rows = -1
            break
    n_buckets = spec.n_buckets if spec.n_buckets else _auto_buckets(spec)
    plan = {
        "input_files": len(files),
        "input_bytes": total_bytes,
        "input_rows": rows,
        "n_buckets": n_buckets,
        "n_buckets_mode": "auto" if spec.n_buckets == 0 else "explicit",
        "exchange": spec.exchange,
        "exchange_payload": (
            "turns+text" if spec.include_turns else "metrics only (text pruned)"
        ),
        "est_bucket_bytes": total_bytes // max(n_buckets, 1),
        "tiers": list(spec.tiers),
        "gapfill": spec.gapfill,
        "encode": spec.encode,
        "salt_threshold": spec.salt_threshold,
        "segment_threshold": spec.segment_threshold,
        "stages": [
            "read_parquet(columns pruned)",
            "normalize (map_batches, arrow)",
            f"{spec.exchange} exchange on hash(conv_id) % {n_buckets}",
            "bucket kernel: pivot sort + dedup"
            + (" + gapfill" if spec.gapfill else "")
            + (" + DoD/Gorilla encode" if spec.encode else ""),
            "tier cascade " + "→".join(spec.tiers),
            "partitioned parquet + manifest",
        ],
    }
    print(json.dumps(plan))
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    """Coalesce a completed run's per-bucket tier files into span files
    (``pipelines/compact.py``) — the TSDB compaction step for frozen
    tiers. One Ray Data task per output span; prints one JSON record per
    tier. Refuses already-compacted tiers; the flagship refuses
    wmode s/a appends on compacted outputs."""
    import ray

    from .pipelines.compact import compact_tier

    if not ray.is_initialized():
        ray.init(
            # honor RAY_ADDRESS so `ray job submit` runs attach to the
            # cluster; bare local runs default to a private instance
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        for tier in args.tier:
            record = compact_tier(args.out, tier, group=args.group)
            print(json.dumps(record))
    finally:
        ray.shutdown()
    return 0


def cmd_du(args: argparse.Namespace) -> int:
    """Storage census of a completed run: per tier — files, bytes, rows
    (parquet footers only, no data pages, no Ray) plus compaction state.
    The `du` every retention/compaction decision starts from."""
    import pyarrow.parquet as pq

    from .pipelines.bucket import TIER_DIRS
    from .pipelines.compact import MARKER

    report = []
    for tier, sub_dir in sorted(TIER_DIRS.items(), key=lambda kv: kv[1]):
        d = os.path.join(args.out, sub_dir)
        if not os.path.isdir(d):
            continue
        n_files = n_bytes = n_rows = 0
        for root, _dirs, files in os.walk(d):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                path = os.path.join(root, f)
                n_files += 1
                n_bytes += os.path.getsize(path)
                n_rows += pq.ParquetFile(path).metadata.num_rows
        report.append(
            {
                "tier": tier,
                "dir": sub_dir,
                "files": n_files,
                "bytes": n_bytes,
                "rows": n_rows,
                "compacted": os.path.exists(os.path.join(d, MARKER)),
            }
        )
    print(json.dumps(report))
    return 0


def cmd_route(args: argparse.Namespace) -> int:
    """Continuous-aggregate read through the tier router: serve a windowed
    rollup (turn_count / char_sum / tool_calls per resolution bucket) from
    the coarsest retained fine-enough tier of a completed run — the TSDB
    query path over this engine's tier layouts. ``--plan-only`` prints the
    routing decision table without executing."""
    import numpy as np

    from .sources.planner import tier_route_plan

    def us(v: str) -> int:
        return int(np.datetime64(v, "us").astype(np.int64))

    res = {"1m": 60, "1h": 3600, "1d": 86400, "1w": 604800}[args.resolution]
    res_us = res * 1_000_000
    now_us = us(args.now) if args.now else us(args.end)
    if args.plan_only:
        plan = tier_route_plan(us(args.start), us(args.end), res_us, now_us)
        print(json.dumps(plan.to_pylist()))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            # honor RAY_ADDRESS so `ray job submit` runs attach to the
            # cluster; bare local runs default to a private instance
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from .pipelines.flagship import tier_routed_rollup

    out = tier_routed_rollup(
        args.out, us(args.start), us(args.end), res_us, now_us
    )
    t = out.to_pandas().sort_values("window_start")
    print(t.to_json(orient="records", date_format="iso"))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pyreshaper_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    mk = sub.add_parser("make", help="build + validate a JobSpec (s2smake)")
    mk.add_argument("specfile")
    mk.add_argument("--input", required=True, help="parquet path/dir/glob")
    mk.add_argument("--out", required=True, help="output directory")
    mk.add_argument("--n-buckets", type=int, default=64)
    mk.add_argument("--tiers", default="1m,1h,1d")
    mk.add_argument("--no-turns", action="store_true",
                    help="metrics-only: do not move/emit the text payload")
    mk.add_argument("--no-gapfill", action="store_true")
    mk.add_argument("--max-gap", type=int, default=60)
    mk.add_argument("--no-encode", action="store_true")
    mk.add_argument("--wmode", choices=["s", "o", "a"], default="s")
    mk.add_argument("--conv-meta", default=None)
    mk.add_argument("--no-once", action="store_true")
    mk.add_argument("--exclude", action="append", help="role to exclude (repeatable)")
    mk.add_argument("--conv", action="append", help="explicit conv subset (repeatable)")
    mk.add_argument("--salt-threshold", type=int, default=100_000)
    mk.add_argument("--segment-threshold", type=int, default=1_000_000,
                    help="turns above which a conversation is SPLIT into "
                         "segments across buckets (0 = off)")
    mk.add_argument("--segment-rows", type=int, default=250_000,
                    help="turns per segment (seg = turn_idx // this)")
    mk.set_defaults(fn=cmd_make)

    rn = sub.add_parser("run", help="run the conversion (s2srun)")
    rn.add_argument("specfile")
    rn.add_argument("--wmode", choices=["s", "o", "a"], default=None)
    rn.add_argument("--limit", type=int, default=None, help="first N buckets only")
    rn.add_argument("--serial", action="store_true", help="single-process oracle")
    rn.add_argument("--num-cpus", type=int, default=8)
    rn.add_argument("--verbosity", type=int, default=0)
    rn.set_defaults(fn=cmd_run)

    rt = sub.add_parser("retain", help="enforce retention tiers on a run's output")
    rt.add_argument("--out", required=True, help="run output directory")
    rt.add_argument(
        "--keep",
        action="append",
        help="tier=days (repeatable), e.g. --keep 1m=7 --keep 1h=90 --keep 1d=forever",
    )
    rt.add_argument("--now", default=None, help="reference time (ISO); default: now")
    rt.add_argument("--num-cpus", type=int, default=8)
    rt.set_defaults(fn=cmd_retain)

    ex = sub.add_parser("export", help="re-materialize a tier as csv/json/parquet/ipc")
    ex.add_argument("--out", required=True, help="run output directory")
    ex.add_argument("--tier", default="1m", help="tier to export (1m/1h/1d/turns/series)")
    ex.add_argument("--format", default="csv", choices=("csv", "json", "parquet", "ipc"))
    ex.add_argument("--dest", required=True, help="destination directory")
    ex.add_argument("--num-cpus", type=int, default=8)
    ex.set_defaults(fn=cmd_export)

    vf = sub.add_parser(
        "verify", help="distributed vs single-process oracle, bit-for-bit"
    )
    vf.add_argument("specfile")
    vf.add_argument("--num-cpus", type=int, default=8)
    vf.set_defaults(fn=cmd_verify)

    cp = sub.add_parser(
        "compact", help="coalesce a tier's bucket files into span files"
    )
    cp.add_argument("out", help="run output directory")
    cp.add_argument(
        "--tier",
        action="append",
        required=True,
        help="tier name (repeatable): turns/series/1m/1h/1d/1w/gapfill_1m",
    )
    cp.add_argument("--group", type=int, default=8, help="buckets per output file")
    cp.add_argument("--num-cpus", type=int, default=8)
    cp.set_defaults(fn=cmd_compact)

    du = sub.add_parser("du", help="per-tier storage census (footers only)")
    du.add_argument("out", help="run output directory")
    du.set_defaults(fn=cmd_du)

    xp = sub.add_parser("explain", help="describe the physical plan (no run)")
    xp.add_argument("specfile")
    xp.set_defaults(fn=cmd_explain)

    ro = sub.add_parser(
        "route", help="serve a windowed rollup through the tier router"
    )
    ro.add_argument("out", help="run output directory")
    ro.add_argument("--start", required=True, help="window start (ISO)")
    ro.add_argument("--end", required=True, help="window end (ISO, exclusive)")
    ro.add_argument(
        "--resolution", default="1d", choices=("1m", "1h", "1d", "1w")
    )
    ro.add_argument(
        "--now", default=None, help="retention reference time (ISO; default=end)"
    )
    ro.add_argument("--plan-only", action="store_true")
    ro.add_argument("--num-cpus", type=int, default=8)
    ro.set_defaults(fn=cmd_route)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
