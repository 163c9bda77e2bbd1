"""Tier compaction (pipelines/compact.py): content-preserving bucket-span
coalescing, the idempotence guard, and the append-freeze guard."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyreshaper_ray.pipelines.compact import any_compacted, compact_tier
from pyreshaper_ray.pipelines.flagship import read_tier, run_flagship
from pyreshaper_ray.pipelines.spec import create_spec


def _mk_table(conv_range, seed, t0=1_700_000_000_000_000):
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for c in conv_range:
        n = int(rng.integers(3, 20))
        for i in range(n):
            rows["conv_id"].append(f"c{c:04d}")
            rows["turn_idx"].append(i)
            rows["role"].append("user" if i % 2 else "assistant")
            rows["text"].append("x" * int(rng.integers(1, 100)))
            rows["tool"].append("" if i % 3 else "search")
            rows["ts"].append(t0 + c * 10**9 + i * 61_000_000)
    return pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": pa.array(rows["role"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "tool": pa.array(rows["tool"], pa.string()),
            "ts": pa.array(
                np.array(rows["ts"], dtype=np.int64), pa.timestamp("us")
            ),
        }
    )


def _sorted_pandas(ds, drop=("bucket",)):
    df = ds.to_pandas()
    df = df[[c for c in df.columns if c not in drop]]
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _parquet_count(path):
    return sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(path)
    )


def test_compact_preserves_content_and_freezes(ray_session, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(_mk_table(range(0, 50), seed=3), str(src / "d.parquet"))
    out = str(tmp_path / "out")
    spec = create_spec(input=str(src), out_dir=out, n_buckets=16)
    run_flagship(spec)

    before = {t: _sorted_pandas(read_tier(out, t)) for t in ("1m", "turns")}
    files_before = _parquet_count(os.path.join(out, "rollup_1m"))
    assert files_before == 16

    rec = compact_tier(out, "1m", group=4)
    assert rec["n_buckets_in"] == 16 and rec["n_files_out"] == 4
    assert rec["rows"] == len(before["1m"])
    rec2 = compact_tier(out, "turns", group=4)
    assert rec2["rows"] == len(before["turns"])

    # hive readers see identical rows; file count shrank
    assert _parquet_count(os.path.join(out, "rollup_1m")) == 4
    after = {t: _sorted_pandas(read_tier(out, t)) for t in ("1m", "turns")}
    for t in before:
        assert after[t].equals(before[t]), f"tier {t} changed"

    assert any_compacted(out) == ["rollup_1m", "turns"]

    # idempotence guard: a second compaction must refuse
    with pytest.raises(RuntimeError, match="already compacted"):
        compact_tier(out, "1m", group=4)

    # append-freeze guard: wmode 's'/'a' on a compacted output must refuse
    with pytest.raises(RuntimeError, match="compacted tiers"):
        run_flagship(
            create_spec(input=str(src), out_dir=out, n_buckets=16, wmode="a")
        )
    # wmode 'o' rebuilds from scratch and clears the frozen layout
    run_flagship(
        create_spec(input=str(src), out_dir=out, n_buckets=16, wmode="o")
    )
    assert any_compacted(out) == []
    rebuilt = _sorted_pandas(read_tier(out, "1m"))
    assert rebuilt.equals(before["1m"])

def test_compact_retry_skips_already_merged(ray_session, tmp_path):
    """ADVICE r3 (medium): a task retry (or crashed-run re-run) that lands
    after the atomic span write but before the sibling rmtree must not
    re-read the merged span file PLUS the still-present sibling dirs.
    The merged file's ``pyreshaper_ray.bucket_span`` KV metadata is the
    recovery record: covered dirs are skipped, rows stay exact."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(_mk_table(range(0, 40), seed=7), str(src / "d.parquet"))
    out = str(tmp_path / "out")
    run_flagship(create_spec(input=str(src), out_dir=out, n_buckets=8))

    before = _sorted_pandas(read_tier(out, "1m"))
    tier_dir = os.path.join(out, "rollup_1m")

    # stash the original bucket dirs so we can recreate the half-done state
    stash = tmp_path / "stash"
    shutil.copytree(tier_dir, str(stash))

    rec = compact_tier(out, "1m", group=4)
    assert rec["n_files_out"] == 2

    # simulate "crash between atomic write and rmtree": restore the merged
    # spans' sibling bucket dirs next to the span files and drop the marker
    for name in os.listdir(str(stash)):
        dst = os.path.join(tier_dir, name)
        if not os.path.exists(dst):
            shutil.copytree(os.path.join(str(stash), name), dst)
    os.remove(os.path.join(tier_dir, "_compacted.json"))

    # a naive re-run would duplicate 6 of 8 buckets; the span-metadata skip
    # must yield bit-identical rows instead
    rec2 = compact_tier(out, "1m", group=4)
    assert rec2["rows"] == len(before)
    after = _sorted_pandas(read_tier(out, "1m"))
    assert after.equals(before)

    # and spans absorbed into larger spans keep full coverage metadata
    os.remove(os.path.join(tier_dir, "_compacted.json"))
    rec3 = compact_tier(out, "1m", group=8)
    assert rec3["rows"] == len(before)
    meta = pq.read_schema(
        os.path.join(tier_dir, "bucket=00000", "part-000.parquet")
    ).metadata
    span = meta[b"pyreshaper_ray.bucket_span"].decode()
    assert span == ",".join(str(i) for i in range(8))
    assert _sorted_pandas(read_tier(out, "1m")).equals(before)
