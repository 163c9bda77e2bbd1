"""wmode 'a' (append/incremental ingest): new input files roll into existing
tiers by recomputing only the buckets their rows hash into; the result is
bit-equal to a from-scratch run on the union (the create_reshaper wmode 'a'
analog, generalized to incremental continuous aggregates)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pyreshaper_ray.pipelines.flagship import read_tier, run_flagship
from pyreshaper_ray.pipelines.spec import create_spec
from pyreshaper_ray.state import manifest as mf

TIERS = ["turns", "1m", "1h", "1d", "gapfill_1m", "series"]
KEYS = {
    "turns": ["conv_id", "turn_idx"],
    "1m": ["conv_id", "window_start"],
    "1h": ["conv_id", "window_start"],
    "1d": ["conv_id", "window_start"],
    "gapfill_1m": ["conv_id", "window_start"],
    "series": ["conv_id"],
}


def _mk_table(conv_range, seed, t0=1_700_000_000_000_000):
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for c in conv_range:
        n = int(rng.integers(3, 30))
        base_turn = int(rng.integers(0, 50))
        for i in range(n):
            rows["conv_id"].append(f"c{c:04d}")
            rows["turn_idx"].append(base_turn + i)
            rows["role"].append("user" if i % 2 else "assistant")
            rows["text"].append("x" * int(rng.integers(1, 150)))
            rows["tool"].append("" if i % 3 else "search")
            rows["ts"].append(t0 + c * 10**9 + (base_turn + i) * 61_000_000)
    return pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "tool": pa.array(rows["tool"], pa.string()),
            "ts": pa.array(np.array(rows["ts"], np.int64), pa.timestamp("us")),
        }
    )


def _tier(ray, out, tier):
    refs = read_tier(out, tier).to_arrow_refs()
    t = pa.concat_tables([x for x in (ray.get(r) for r in refs) if x.num_columns])
    if "bucket" in t.column_names:
        t = t.drop_columns(["bucket"])
    keys = KEYS[tier]
    return t.take(
        pc.sort_indices(t, sort_keys=[(k, "ascending") for k in keys])
    ).select(sorted(t.column_names))


def test_append_matches_scratch_union(ray_session, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    day1 = _mk_table(range(0, 40), seed=1)
    pq.write_table(day1, str(src / "day1.parquet"))

    out_inc = str(tmp_path / "incremental")
    kw = dict(n_buckets=6)
    run_flagship(create_spec(input=str(src), out_dir=out_inc, **kw))
    done1 = mf.load_completed(out_inc)
    assert set(done1) == set(range(6))
    mtimes = {b: os.path.getmtime(rec["files"]["1m"]) for b, rec in done1.items()}

    # day 2 arrives: a few new convs + MORE TURNS for existing conversations
    # (small on purpose — most buckets must remain untouched)
    day2 = pa.concat_tables([_mk_table(range(38, 43), seed=2)])
    pq.write_table(day2, str(src / "day2.parquet"))

    m = run_flagship(create_spec(input=str(src), out_dir=out_inc, wmode="a", **kw))
    recomputed = set(m["bucket"].to_pylist())
    assert 0 < len(recomputed) <= 6

    # untouched buckets were NOT rewritten
    untouched = set(range(6)) - recomputed
    assert untouched, "test corpus should leave at least one bucket untouched"
    done2 = mf.load_completed(out_inc)
    for b in untouched:
        assert os.path.getmtime(done2[b]["files"]["1m"]) == mtimes[b]

    # from-scratch run on the union must match bit-for-bit on every tier
    out_scratch = str(tmp_path / "scratch")
    run_flagship(create_spec(input=str(src), out_dir=out_scratch, **kw))
    for tier in TIERS:
        a = _tier(ray_session, out_inc, tier)
        b = _tier(ray_session, out_scratch, tier)
        assert a.equals(b), f"tier {tier} append != scratch"


def test_append_with_no_new_files_is_noop(ray_session, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(_mk_table(range(0, 20), seed=3), str(src / "a.parquet"))
    out = str(tmp_path / "out")
    run_flagship(create_spec(input=str(src), out_dir=out, n_buckets=4))
    m = run_flagship(create_spec(input=str(src), out_dir=out, wmode="a", n_buckets=4))
    assert m.num_rows == 0


def test_append_falls_back_to_full_on_mutated_file(ray_session, tmp_path):
    """A previously-ingested file that CHANGED must trigger a full recompute
    (never a silently stale mix)."""
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(_mk_table(range(0, 20), seed=4), str(src / "a.parquet"))
    out = str(tmp_path / "out")
    kw = dict(n_buckets=4)
    run_flagship(create_spec(input=str(src), out_dir=out, **kw))

    # mutate file a in place (different rows)
    pq.write_table(_mk_table(range(0, 25), seed=5), str(src / "a.parquet"))
    m = run_flagship(create_spec(input=str(src), out_dir=out, wmode="a", **kw))
    assert set(m["bucket"].to_pylist()) == set(range(4))  # everything reran

    out_scratch = str(tmp_path / "scratch")
    run_flagship(create_spec(input=str(src), out_dir=out_scratch, **kw))
    for tier in TIERS:
        assert _tier(ray_session, out, tier).equals(
            _tier(ray_session, out_scratch, tier)
        ), tier


def test_append_with_segmented_conversation(ray_session, tmp_path):
    """Appending turns TO a giant (segmented) conversation re-runs only the
    touched segment buckets plus the stitch; result equals scratch."""
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(6)

    def giant_rows(turn_lo, turn_hi):
        n = turn_hi - turn_lo
        return pa.table(
            {
                "conv_id": pa.array(["giant"] * n, pa.string()),
                "turn_idx": pa.array(np.arange(turn_lo, turn_hi, dtype=np.int32)),
                "role": pa.array(["user"] * n, pa.string()),
                "text": pa.array(["g" * (1 + i % 53) for i in range(turn_lo, turn_hi)]),
                "tool": pa.array([""] * n, pa.string()),
                "ts": pa.array(
                    1_700_000_000_000_000
                    + np.arange(turn_lo, turn_hi, dtype=np.int64) * 45_000_000,
                    pa.timestamp("us"),
                ),
            }
        )

    pq.write_table(
        pa.concat_tables([_mk_table(range(0, 20), seed=7), giant_rows(0, 1500)]),
        str(src / "day1.parquet"),
    )
    out = str(tmp_path / "out")
    kw = dict(n_buckets=4, salt_threshold=0, segment_threshold=800, segment_rows=400)
    run_flagship(create_spec(input=str(src), out_dir=out, **kw))

    pq.write_table(giant_rows(1500, 2200), str(src / "day2.parquet"))
    m = run_flagship(create_spec(input=str(src), out_dir=out, wmode="a", **kw))
    assert m.num_rows > 0

    out_scratch = str(tmp_path / "scratch")
    run_flagship(create_spec(input=str(src), out_dir=out_scratch, **kw))
    for tier in TIERS:
        assert _tier(ray_session, out, tier).equals(
            _tier(ray_session, out_scratch, tier)
        ), tier
