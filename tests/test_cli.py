"""CLI argument→JobSpec mapping + end-to-end runs (s2smake/s2srunTests analog)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from pyreshaper_ray.cli import main
from pyreshaper_ray.pipelines.spec import JobSpec


def test_make_maps_args_to_spec(fixture_dir, tmp_path):
    specfile = str(tmp_path / "spec.json")
    rc = main(
        [
            "make", specfile,
            "--input", os.path.join(fixture_dir, "transcripts"),
            "--out", str(tmp_path / "out"),
            "--n-buckets", "5",
            "--tiers", "1m,1h",
            "--no-encode",
            "--max-gap", "10",
            "--exclude", "system",
            "--salt-threshold", "500",
            "--wmode", "o",
        ]
    )
    assert rc == 0
    spec = JobSpec.read(specfile)
    assert spec.n_buckets == 5
    assert spec.tiers == ("1m", "1h")
    assert spec.encode is False
    assert spec.gapfill_max_gap == 10
    assert spec.exclude_roles == ("system",)
    assert spec.salt_threshold == 500
    assert spec.wmode == "o"


def test_make_rejects_bad_args(tmp_path):
    with pytest.raises(ValueError):
        main(
            [
                "make", str(tmp_path / "s.json"),
                "--input", str(tmp_path),
                "--out", str(tmp_path / "o"),
                "--tiers", "1m,bogus",
            ]
        )


def test_run_serial_end_to_end(fixture_dir, tmp_path):
    """--serial is the oracle path; runs in-process without Ray."""
    specfile = str(tmp_path / "spec.json")
    out = str(tmp_path / "out")
    main(
        [
            "make", specfile,
            "--input", os.path.join(fixture_dir, "transcripts"),
            "--out", out,
        ]
    )
    rc = main(["run", specfile, "--serial"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "turns", "serial", "part-000.parquet"))
    assert os.path.exists(os.path.join(out, "rollup_1d", "serial", "part-000.parquet"))


def test_run_parallel_subprocess(fixture_dir, tmp_path):
    """Full CLI run in a fresh process (owns its own Ray session)."""
    specfile = str(tmp_path / "spec.json")
    out = str(tmp_path / "out")
    main(
        [
            "make", specfile,
            "--input", os.path.join(fixture_dir, "transcripts"),
            "--out", out,
            "--n-buckets", "4",
        ]
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "pyreshaper_ray.cli", "run", specfile,
         "--num-cpus", "2", "--limit", "2"],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["buckets"] <= 2 and summary["n_turns"] > 0
