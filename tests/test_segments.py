"""Segment salting: a conversation larger than the per-task budget is split
into turn_idx-range segments across buckets, yet every tier (turns, rollups,
gap-fill, encoded series) is BIT-IDENTICAL to the single-process oracle."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from pyreshaper_ray.oracle import oracle_full
from pyreshaper_ray.pipelines.flagship import read_tier, run_flagship
from pyreshaper_ray.pipelines.spec import create_spec

TIER_KEYS = {
    "turns": ["conv_id", "turn_idx"],
    "1m": ["conv_id", "window_start"],
    "1h": ["conv_id", "window_start"],
    "1d": ["conv_id", "window_start"],
    "gapfill_1m": ["conv_id", "window_start"],
    "series": ["conv_id"],
}
ORACLE_KEY = {
    "turns": "turns",
    "1m": "rollup_1m",
    "1h": "rollup_1h",
    "1d": "rollup_1d",
    "gapfill_1m": "gapfill_1m",
    "series": "series",
}


def _corpus(tmp_path):
    """~60 normal convs + one 'heavy' (pinned) + one GIANT conv (4000 turns,
    dup turns, gaps) — giant is >> segment_rows so it splits into many
    segments across buckets."""
    rng = np.random.default_rng(3)
    rows = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    t0 = 1_700_000_000_000_000

    def add(cid, turn, role, text, tool, ts):
        rows["conv_id"].append(cid)
        rows["turn_idx"].append(turn)
        rows["role"].append(role)
        rows["text"].append(text)
        rows["tool"].append(tool)
        rows["ts"].append(ts)

    for c in range(60):
        n = int(rng.integers(3, 40))
        for i in range(n):
            add(
                f"c{c:04d}", i, "user" if i % 2 == 0 else "assistant",
                "x" * int(rng.integers(1, 200)), "" if i % 5 else "search",
                t0 + c * 10**9 + i * int(rng.integers(1, 90)) * 1_000_000,
            )
    # heavy conv (pinned whole): 700 turns
    for i in range(700):
        add("heavy", i, "assistant", "h" * (1 + i % 97), "", t0 + i * 7_000_000)
    # GIANT conv: 4000 turns, some duplicated turn_idx, irregular gaps
    ts = t0
    for i in range(4000):
        ts += int(rng.integers(1, 180)) * 1_000_000
        add("giant", i, "user" if i % 3 else "tool", "g" * (1 + (i * 13) % 331),
            "python" if i % 4 == 0 else "", ts)
        if i % 500 == 0:  # duplicate rows (same turn_idx, later ts)
            add("giant", i, "user", "dupe" * 3, "", ts + 1_000)
    t = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "tool": pa.array(rows["tool"], pa.string()),
            "ts": pa.array(np.array(rows["ts"], dtype=np.int64), pa.timestamp("us")),
        }
    )
    src = tmp_path / "seg_src"
    src.mkdir()
    # shuffle row order so segments arrive interleaved
    perm = rng.permutation(t.num_rows)
    t = t.take(pa.array(perm))
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), str(src / "a.parquet"))
    pq.write_table(t.slice(half), str(src / "b.parquet"))
    return t, str(src)


def canon(tbl: pa.Table, keys: list[str]) -> pa.Table:
    return tbl.take(pc.sort_indices(tbl, sort_keys=[(k, "ascending") for k in keys]))


def read_tier_table(ray, out, tier):
    refs = read_tier(out, tier).to_arrow_refs()
    return pa.concat_tables([t for t in (ray.get(r) for r in refs) if t.num_columns])


@pytest.fixture(scope="module")
def seg_run(ray_session, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("seg")
    t, src = _corpus(tmp_path)
    out = str(tmp_path / "out")
    spec = create_spec(
        input=src,
        out_dir=out,
        n_buckets=5,
        salt_threshold=500,       # 'heavy' pinned whole
        segment_threshold=1000,   # 'giant' split
        segment_rows=300,         # → ~14 segments
    )
    metrics = run_flagship(spec)
    return t, out, spec, metrics


def test_segmented_run_bit_exact_vs_oracle(ray_session, seg_run):
    t, out, spec, metrics = seg_run
    o = oracle_full(t)
    assert int(pc.sum(metrics["n_turns"]).as_py()) == o["turns"].num_rows
    for tier, keys in TIER_KEYS.items():
        mine = read_tier_table(ray_session, out, tier)
        if "bucket" in mine.column_names:
            mine = mine.drop_columns(["bucket"])
        ref = o[ORACLE_KEY[tier]]
        a = canon(mine, keys).select(ref.column_names).cast(ref.schema)
        assert a.equals(canon(ref, keys)), f"tier {tier} not bit-exact"


def test_giant_conv_actually_segmented(ray_session, seg_run):
    """The giant conversation's turns must be spread over >1 bucket file —
    proof no single task held the whole conversation."""
    t, out, spec, metrics = seg_run
    holders = []
    for f in glob.glob(os.path.join(out, "turns", "bucket=*", "*.parquet")):
        tt = pq.read_table(f, columns=["conv_id"])
        if "giant" in set(pc.unique(tt["conv_id"]).to_pylist()):
            holders.append(f)
    assert len(holders) >= 2, holders
    # stitch outputs exist under the pseudo bucket and are manifest-committed
    from pyreshaper_ray.state import manifest as mf

    done = mf.load_completed(out)
    pseudo = [b for b in done if b >= spec.n_buckets]
    assert len(pseudo) == 1
    assert done[pseudo[0]]["salted_conv"] == "giant"


def test_segmented_resume_skips_everything(ray_session, seg_run):
    t, out, spec, metrics = seg_run
    import dataclasses

    spec2 = dataclasses.replace(spec)
    m2 = run_flagship(spec2)
    assert m2.num_rows == 0  # all buckets AND the stitch are committed


def test_stitch_resume_recomputes_only_stitch(ray_session, seg_run):
    """Losing the stitch's manifest record (crash between phase B and
    stitch) must make a wmode 's' rerun redo ONLY the stitch — bucket
    outputs untouched, stitched tiers restored bit-identically."""
    import dataclasses
    import json

    from pyreshaper_ray.state import manifest as mf

    t, out, spec, metrics = seg_run
    done = mf.load_completed(out)
    pseudo = [b for b in done if b >= spec.n_buckets][0]
    series_path = done[pseudo]["files"]["series"]
    before = pq.read_table(series_path)

    os.remove(mf.bucket_path(out, pseudo))
    os.remove(series_path)
    bucket_mtimes = {
        b: os.path.getmtime(rec["files"]["1m"])
        for b, rec in done.items()
        if b < spec.n_buckets
    }

    m2 = run_flagship(dataclasses.replace(spec))
    assert set(m2["bucket"].to_pylist()) == {pseudo}  # only the stitch reran
    done2 = mf.load_completed(out)
    for b, mt in bucket_mtimes.items():
        assert os.path.getmtime(done2[b]["files"]["1m"]) == mt
    after = pq.read_table(done2[pseudo]["files"]["series"])
    assert after.equals(before)  # byte-identical re-stitch
