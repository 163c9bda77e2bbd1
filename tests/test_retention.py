"""Retention enforcement: aged rows pruned per tier, atomically, idempotently."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyreshaper_ray.pipelines.flagship import read_tier, run_flagship
from pyreshaper_ray.pipelines.retention import DAY_US, apply_retention
from pyreshaper_ray.pipelines.spec import create_spec


def _tier(ray, out, tier):
    t = pa.concat_tables(
        [r for r in (ray.get(x) for x in read_tier(out, tier).to_arrow_refs()) if r.num_columns]
    )
    return t


def test_retention_prunes_by_tier(ray_session, fixture_dir, tmp_path):
    out = str(tmp_path / "out")
    run_flagship(
        create_spec(
            input=os.path.join(fixture_dir, "transcripts"),
            out_dir=out,
            n_buckets=4,
            gapfill=False,
            encode=False,
        )
    )
    t1m = _tier(ray_session, out, "1m")
    lo = min(t1m["window_start"].to_pylist())
    hi = max(t1m["window_start"].to_pylist())
    mid_us = int(np.datetime64(lo, "us").astype(np.int64)) + (
        int(np.datetime64(hi, "us").astype(np.int64))
        - int(np.datetime64(lo, "us").astype(np.int64))
    ) // 2
    now_us = int(np.datetime64(hi, "us").astype(np.int64)) + DAY_US

    # policy: 1m keeps only (now - mid) of age; 1h/1d keep forever
    max_age = now_us - mid_us
    before_1h = _tier(ray_session, out, "1h")
    rec = apply_retention(out, {"1m": max_age, "1h": None, "1d": None}, now_us)
    assert rec["tiers"]["1m"]["rows_dropped"] > 0

    after_1m = _tier(ray_session, out, "1m")
    cutoff = np.datetime64(now_us - max_age, "us")
    assert all(np.datetime64(w, "us") >= cutoff for w in after_1m["window_start"].to_pylist())
    # untouched tier identical
    after_1h = _tier(ray_session, out, "1h")
    assert after_1h.num_rows == before_1h.num_rows
    # dropped + kept == original
    assert (
        rec["tiers"]["1m"]["rows_kept"] + rec["tiers"]["1m"]["rows_dropped"]
        == t1m.num_rows
    )
    # idempotent: second application drops nothing
    rec2 = apply_retention(out, {"1m": max_age, "1h": None, "1d": None}, now_us)
    assert rec2["tiers"]["1m"]["rows_dropped"] == 0
    # manifest records present
    import glob

    assert len(glob.glob(os.path.join(out, "manifest", "retention-*.json"))) == 2
