"""Standalone Dataset-level stages (the general operators, vs oracle)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from pyreshaper_ray.oracle import (
    oracle_cascade,
    oracle_full,
    oracle_gapfill,
    oracle_normalize,
    oracle_pivot,
    oracle_rollup_1m,
)
from pyreshaper_ray.stages.gapfill import gapfill_tier
from pyreshaper_ray.stages.normalize import normalize_dataset
from pyreshaper_ray.stages.pivot import encode_series, pivot_and_encode, pivot_turns
from pyreshaper_ray.stages.rollup import cascade, rollup_1m


def canon(t: pa.Table, keys) -> pa.Table:
    return t.take(pc.sort_indices(t, sort_keys=[(k, "ascending") for k in keys]))


@pytest.fixture(scope="module")
def ds_and_oracle(ray_session, fixture_dir):
    import ray.data

    ds = ray.data.read_parquet(os.path.join(fixture_dir, "transcripts"))
    import glob

    import pyarrow.parquet as pq

    t = pa.concat_tables(
        pq.read_table(p)
        for p in sorted(glob.glob(os.path.join(fixture_dir, "transcripts", "*.parquet")))
    )
    return ds, t


def _collect(ds) -> pa.Table:
    from pyreshaper_ray.util import collect_table

    return collect_table(ds)


def test_normalize_stage(ds_and_oracle):
    ds, t = ds_and_oracle
    got = canon(_collect(normalize_dataset(ds, n_buckets=8)), ["conv_id", "turn_idx", "ts"])
    want = canon(oracle_normalize(t), ["conv_id", "turn_idx", "ts"])
    assert got.select(want.column_names).equals(want)
    assert pc.max(got["bucket"]).as_py() < 8 and pc.min(got["bucket"]).as_py() >= 0


def test_normalize_rejects_bad_schema(ray_session):
    import ray.data

    bad = ray.data.from_items([{"conv_id": "a", "turn_idx": 1}])
    with pytest.raises(Exception):
        normalize_dataset(bad).materialize()


def test_pivot_turns_stage(ds_and_oracle):
    ds, t = ds_and_oracle
    piv = _collect(pivot_turns(normalize_dataset(ds)))
    want = oracle_pivot(oracle_normalize(t))
    got = canon(piv, ["conv_id", "turn_idx"]).select(want.column_names)
    assert got.equals(canon(want, ["conv_id", "turn_idx"]))


def test_rollup_combiner_path(ds_and_oracle):
    """The partial-agg + final-groupby path (general operator) ≡ oracle."""
    ds, t = ds_and_oracle
    piv_ds = pivot_turns(normalize_dataset(ds))
    t1m = _collect(rollup_1m(piv_ds))
    want_1m = oracle_rollup_1m(oracle_pivot(oracle_normalize(t)))
    got = canon(t1m, ["conv_id", "window_start"])
    assert got.cast(want_1m.schema).equals(canon(want_1m, ["conv_id", "window_start"]))


def test_cascade_stage(ds_and_oracle, ray_session):
    import ray.data

    ds, t = ds_and_oracle
    want_1m = oracle_rollup_1m(oracle_pivot(oracle_normalize(t)))
    tier_ds = ray.data.from_arrow(want_1m)
    got_1h = canon(_collect(cascade(tier_ds, "1h")), ["conv_id", "window_start"])
    want_1h = canon(oracle_cascade(want_1m, "1h"), ["conv_id", "window_start"])
    assert got_1h.cast(want_1h.schema).equals(want_1h)


def test_gapfill_stage(ds_and_oracle, ray_session):
    import ray.data

    ds, t = ds_and_oracle
    want_1m = oracle_rollup_1m(oracle_pivot(oracle_normalize(t)))
    got = canon(
        _collect(gapfill_tier(ray.data.from_arrow(want_1m))),
        ["conv_id", "window_start"],
    )
    want = canon(oracle_gapfill(want_1m), ["conv_id", "window_start"])
    assert got.cast(want.schema).equals(want)


def test_encode_series_stage(ds_and_oracle):
    ds, t = ds_and_oracle
    got = canon(_collect(encode_series(normalize_dataset(ds))), ["conv_id"])
    o = oracle_full(t)
    want = canon(o["series"], ["conv_id"])
    assert got.cast(want.schema).equals(want)


def test_fused_pivot_and_encode(ds_and_oracle):
    ds, t = ds_and_oracle
    fused = _collect(pivot_and_encode(normalize_dataset(ds)))
    o = oracle_full(t)
    turns = fused.filter(pc.equal(fused["kind"], "turn"))
    series = fused.filter(pc.equal(fused["kind"], "series"))
    want_turns = o["turns"]
    got_turns = canon(turns, ["conv_id", "turn_idx"]).select(want_turns.column_names)
    assert got_turns.cast(want_turns.schema).equals(canon(want_turns, ["conv_id", "turn_idx"]))
    want_series = canon(o["series"], ["conv_id"])
    got_series = canon(series, ["conv_id"]).select(want_series.column_names)
    assert got_series.cast(want_series.schema).equals(want_series)
