"""Skew handling: heavy conversations get balanced bucket assignment and the
balanced path is bit-identical to the plain hash path (SURVEY.md §5 item 5)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from pyreshaper_ray.pipelines.flagship import read_tier, run_flagship
from pyreshaper_ray.pipelines.spec import create_spec
from pyreshaper_ray.state import manifest as mf


def _tier(ray, out, tier, keys):
    refs = read_tier(out, tier).to_arrow_refs()
    t = pa.concat_tables([r for r in (ray.get(x) for x in refs) if r.num_columns])
    if "bucket" in t.column_names:
        # the hive partition column legitimately differs under balancing
        t = t.drop_columns(["bucket"])
    return t.take(pc.sort_indices(t, sort_keys=[(k, "ascending") for k in keys]))


def test_heavy_detection_and_balancing(ray_session, fixture_dir, tmp_path):
    import ray.data

    from pyreshaper_ray.stages.normalize import find_heavy_conversations

    ds = ray.data.read_parquet(os.path.join(fixture_dir, "transcripts"))
    heavy = find_heavy_conversations(ds, threshold=500)
    # the 120-conv test fixture has one skew conv (conv000007, 600 turns);
    # conv000123 exists only at full fixture size
    assert set(heavy) == {"conv000007"}
    assert heavy["conv000007"] == 600


def test_salted_path_identical_to_unsalted(ray_session, fixture_dir, tmp_path):
    base = os.path.join(fixture_dir, "transcripts")
    out_plain = str(tmp_path / "plain")
    out_bal = str(tmp_path / "balanced")
    kw = dict(n_buckets=6, tiers=("1m",), gapfill=False)
    run_flagship(create_spec(input=base, out_dir=out_plain, salt_threshold=0, **kw))
    run_flagship(create_spec(input=base, out_dir=out_bal, salt_threshold=500, **kw))

    for tier, keys in (("turns", ["conv_id", "turn_idx"]), ("1m", ["conv_id", "window_start"]), ("series", ["conv_id"])):
        a = _tier(ray_session, out_plain, tier, keys)
        b = _tier(ray_session, out_bal, tier, keys)
        assert a.select(sorted(a.column_names)).equals(
            b.select(sorted(b.column_names))
        ), f"tier {tier} differs between salted and unsalted paths"

    # the heavy conv must land in its override bucket (first override → 0)
    done = mf.load_completed(out_bal)
    loc = {}
    for bk, rec in done.items():
        import pyarrow.parquet as pq

        f = rec["files"].get("turns")
        if not f:
            continue
        t = pq.read_table(f, columns=["conv_id"])
        if "conv000007" in set(t["conv_id"].to_pylist()):
            loc["conv000007"] = bk
    assert loc == {"conv000007": 0}
