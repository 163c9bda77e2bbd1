"""wmode analog: interrupted run resumes per-bucket; outputs identical.

Simulates a mid-run kill by running with ``output_limit`` (only some buckets
commit), then resuming without the limit: completed buckets must be skipped
(manifest-driven), and the final outputs must equal an uninterrupted run's.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from pyreshaper_ray.pipelines.flagship import read_tier, run_flagship
from pyreshaper_ray.pipelines.spec import create_spec
from pyreshaper_ray.state import manifest as mf


def _tier_table(ray, out, tier):
    refs = read_tier(out, tier).to_arrow_refs()
    t = pa.concat_tables([x for x in (ray.get(r) for r in refs) if x.num_columns])
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("window_start", "ascending")]
        )
    )


def test_resume_after_partial_run(ray_session, fixture_dir, tmp_path):
    base = os.path.join(fixture_dir, "transcripts")
    out_full = str(tmp_path / "full")
    out_resume = str(tmp_path / "resumed")
    kw = dict(n_buckets=6, gapfill=False, encode=False, tiers=("1m",))

    run_flagship(create_spec(input=base, out_dir=out_full, **kw))

    # phase 1: "crash" after 3 of 6 buckets
    run_flagship(create_spec(input=base, out_dir=out_resume, output_limit=3, **kw))
    done = mf.load_completed(out_resume)
    assert set(done) == {0, 1, 2}
    mtimes = {
        b: os.path.getmtime(rec["files"]["1m"]) for b, rec in done.items()
    }

    # phase 2: resume (wmode 's' default) — completed buckets untouched
    m2 = run_flagship(create_spec(input=base, out_dir=out_resume, **kw))
    assert set(m2["bucket"].to_pylist()) == {3, 4, 5}
    done2 = mf.load_completed(out_resume)
    assert set(done2) == {0, 1, 2, 3, 4, 5}
    for b, mt in mtimes.items():
        assert os.path.getmtime(done2[b]["files"]["1m"]) == mt  # not rewritten

    a = _tier_table(ray_session, out_full, "1m")
    b = _tier_table(ray_session, out_resume, "1m")
    assert a.equals(b)


def test_wmode_overwrite_reruns_everything(ray_session, fixture_dir, tmp_path):
    base = os.path.join(fixture_dir, "transcripts")
    out = str(tmp_path / "ow")
    kw = dict(n_buckets=4, gapfill=False, encode=False, tiers=("1m",))
    m1 = run_flagship(create_spec(input=base, out_dir=out, **kw))
    # wmode 's' rerun: nothing to do
    m2 = run_flagship(create_spec(input=base, out_dir=out, **kw))
    assert m2.num_rows == 0
    # wmode 'o': all buckets rerun
    m3 = run_flagship(create_spec(input=base, out_dir=out, wmode="o", **kw))
    assert sorted(m3["bucket"].to_pylist()) == sorted(m1["bucket"].to_pylist())


def test_resume_after_hard_kill(fixture_dir, tmp_path, ray_session):
    """SIGKILL the driver mid-run; a fresh run must resume from the manifest
    and produce outputs identical to an uninterrupted run."""
    import signal
    import subprocess
    import sys
    import time

    base = os.path.join(fixture_dir, "transcripts")
    out_kill = str(tmp_path / "killed")
    out_full = str(tmp_path / "uninterrupted")

    script = f"""
import ray, sys, time
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from pyreshaper_ray.pipelines.spec import create_spec
from pyreshaper_ray.pipelines.flagship import run_flagship

# slow the run down so the kill lands mid-phase-B
import pyreshaper_ray.pipelines.bucket as bucket
orig = bucket.process_bucket
def slow(t, spec_dict):
    time.sleep(0.35)
    return orig(t, spec_dict)
bucket.process_bucket = slow

spec = create_spec(input={base!r}, out_dir={out_kill!r}, n_buckets=12,
                   tiers=("1m",), gapfill=False, encode=False)
run_flagship(spec)
"""
    proc = subprocess.Popen([sys.executable, "-c", script])
    # wait until the spill is fully committed AND some buckets are done, so
    # the kill deterministically lands mid-phase-B (not mid-spill)
    marker = os.path.join(out_kill, "_spill", "_SPILL_COMPLETE")
    deadline = time.time() + 120
    while time.time() < deadline:
        done = mf.load_completed(out_kill)
        if os.path.exists(marker) and len(done) >= 2:
            break
        if proc.poll() is not None:
            break
        time.sleep(0.2)
    proc.send_signal(signal.SIGKILL)
    proc.wait()
    time.sleep(2)  # let the killed driver's orphaned workers abort
    done_after_kill = mf.load_completed(out_kill)
    assert 0 < len(done_after_kill) < 12, "kill must land mid-run"

    # resume in-process (the session fixture's cluster)
    run_flagship(
        create_spec(
            input=base, out_dir=out_kill, n_buckets=12,
            tiers=("1m",), gapfill=False, encode=False,
        )
    )
    assert set(mf.load_completed(out_kill)) == set(range(12))

    run_flagship(
        create_spec(
            input=base, out_dir=out_full, n_buckets=12,
            tiers=("1m",), gapfill=False, encode=False,
        )
    )
    a = _tier_table(ray_session, out_kill, "1m")
    b = _tier_table(ray_session, out_full, "1m")
    assert a.equals(b)
