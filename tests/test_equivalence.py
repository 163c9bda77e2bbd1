"""The reshaperTests analog: distributed flagship ≡ single-process oracle.

Runs the full Ray pipeline on the fixture at two partitioning levels and
asserts every product — pivoted turns, all rollup tiers, gap-fill, encoded
series — is BIT-FOR-BIT equal to the oracle, and that per-turn `text` is
byte-equal to the input under stable (conv_id, turn_idx) order.
"""

from __future__ import annotations

import glob
import os

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


def canon(tbl: pa.Table, keys: list[str]) -> pa.Table:
    return tbl.take(pc.sort_indices(tbl, sort_keys=[(k, "ascending") for k in keys]))


def read_tier_table(ray, out: str, tier: str) -> pa.Table:
    refs = read_tier(out, tier).to_arrow_refs()
    return pa.concat_tables([t for t in (ray.get(r) for r in refs) if t.num_columns])


@pytest.fixture(scope="module")
def oracle_out(fixture_dir):
    paths = sorted(glob.glob(os.path.join(fixture_dir, "transcripts", "*.parquet")))
    t = pa.concat_tables([pq.read_table(p) for p in paths])
    return t, oracle_full(t)


@pytest.mark.parametrize("n_buckets", [4, 17])
def test_flagship_bit_exact_vs_oracle(ray_session, fixture_dir, oracle_out, tmp_path, n_buckets):
    t, o = oracle_out
    out = str(tmp_path / f"out{n_buckets}")
    spec = create_spec(
        input=os.path.join(fixture_dir, "transcripts"),
        out_dir=out,
        n_buckets=n_buckets,
    )
    metrics = run_flagship(spec)
    assert metrics.num_rows <= n_buckets
    assert int(pc.sum(metrics["n_turns"]).as_py()) == o["turns"].num_rows
    for tier, keys in TIER_KEYS.items():
        mine = read_tier_table(ray_session, out, tier)
        ref = o[ORACLE_KEY[tier]]
        a = canon(mine, keys).select(ref.column_names).cast(ref.schema)
        b = canon(ref, keys)
        assert a.equals(b), f"tier {tier} not bit-exact (n_buckets={n_buckets})"


def test_per_turn_text_equality_vs_input(ray_session, fixture_dir, oracle_out, tmp_path):
    """input_hint contract: per-turn text equality under stable ordering."""
    t, _ = oracle_out
    out = str(tmp_path / "out_text")
    spec = create_spec(
        input=os.path.join(fixture_dir, "transcripts"), out_dir=out, n_buckets=8
    )
    run_flagship(spec)
    mine = canon(read_tier_table(ray_session, out, "turns"), ["conv_id", "turn_idx"])
    inp = t.to_pandas().drop_duplicates(subset=["conv_id", "turn_idx"], keep="first")
    inp = inp.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    assert inp["text"].tolist() == mine["text"].to_pylist()
    assert inp["ts"].tolist() == mine["ts"].to_pylist()


def test_exclude_and_subset_and_limit(ray_session, fixture_dir, tmp_path):
    base = os.path.join(fixture_dir, "transcripts")
    out = str(tmp_path / "out_excl")
    spec = create_spec(
        input=base,
        out_dir=out,
        n_buckets=8,
        exclude_roles=("system",),
        conv_subset=("conv000010", "conv000011"),
        gapfill=False,
        encode=False,
        tiers=("1m",),
    )
    run_flagship(spec)
    turns = read_tier_table(ray_session, out, "turns")
    assert set(turns["conv_id"].to_pylist()) == {"conv000010", "conv000011"}
    assert "system" not in set(turns["role"].to_pylist())
    # output_limit: only buckets < N are produced
    out2 = str(tmp_path / "out_limit")
    spec2 = create_spec(
        input=base, out_dir=out2, n_buckets=8, output_limit=2,
        gapfill=False, encode=False, tiers=("1m",),
    )
    m = run_flagship(spec2)
    assert set(m["bucket"].to_pylist()) <= {0, 1}


@pytest.mark.parametrize("seed", [1, 7])
def test_random_corpus_equivalence(ray_session, tmp_path, seed):
    """Randomized robustness: an adversarial random transcript table (dup
    turns, shuffled order, ragged conversations, weird gaps) must still be
    bit-exact between flagship and oracle."""
    import numpy as np
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n = 4000
    conv = rng.integers(0, 120, n)
    rows = {
        "conv_id": pa.array([f"c{int(i):04d}" for i in conv], pa.string()),
        "turn_idx": pa.array(rng.integers(0, 50, n).astype("int32"), pa.int32()),
        "role": pa.array(
            rng.choice(["user", "assistant", "tool", "system"], n).tolist(), pa.string()
        ),
        "text": pa.array(
            ["x" * int(k) + str(int(c)) for k, c in zip(rng.integers(0, 300, n), conv)],
            pa.string(),
        ),
        "tool": pa.array(rng.choice(["", "search", "python"], n).tolist(), pa.string()),
        "ts": pa.array(
            np.sort(rng.integers(1_700_000_000_000_000, 1_700_864_000_000_000, n)).astype(
                "int64"
            ),
            pa.timestamp("us"),
        ),
    }
    t = pa.table(rows)
    src = tmp_path / f"rand{seed}"
    src.mkdir()
    pq.write_table(t, str(src / "part.parquet"))

    from pyreshaper_ray.oracle import oracle_full

    o = oracle_full(t)
    out = str(tmp_path / f"out{seed}")
    run_flagship(create_spec(input=str(src), out_dir=out, n_buckets=7))
    for tier, keys in TIER_KEYS.items():
        mine = read_tier_table(ray_session, out, tier)
        if "bucket" in mine.column_names:
            mine = mine.drop_columns(["bucket"])
        ref = o[ORACLE_KEY[tier]]
        a = canon(mine, keys).select(ref.column_names).cast(ref.schema)
        assert a.equals(canon(ref, keys)), f"tier {tier} seed {seed}"
