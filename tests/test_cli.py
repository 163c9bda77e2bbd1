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


def test_cli_export_csv_roundtrip(tmp_path):
    """export re-materializes a tier; row counts and sums survive the trip."""
    import subprocess
    import sys

    import duckdb

    from pyreshaper_ray.fixtures import write_fixture

    fx = str(tmp_path / "fx")
    write_fixture(fx, n_conv=40, n_files=2, skew_turns=200)
    spec = str(tmp_path / "spec.json")
    out = str(tmp_path / "out")
    dest = str(tmp_path / "csv")
    env = None
    run = lambda *a: subprocess.run(
        [sys.executable, "-m", "pyreshaper_ray.cli", *a],
        check=True, capture_output=True, text=True, env=env,
    )
    run("make", spec, "--input", f"{fx}/transcripts", "--out", out,
        "--n-buckets", "4", "--tiers", "1m", "--no-gapfill", "--no-encode")
    run("run", spec, "--num-cpus", "4")
    r = run("export", "--out", out, "--tier", "1m", "--format", "csv",
            "--dest", dest, "--num-cpus", "4")
    import json as _json

    info = _json.loads(r.stdout.strip().splitlines()[-1])
    con = duckdb.connect()
    got = con.execute(
        f"SELECT COUNT(*), SUM(turn_count) FROM read_csv_auto('{dest}/*.csv')"
    ).fetchone()
    want = con.execute(
        f"SELECT COUNT(*), SUM(turn_count) FROM read_parquet('{out}/rollup_1m/**/*.parquet')"
    ).fetchone()
    assert got == want and info["rows"] == got[0]


def test_cli_explain_reports_plan(tmp_path, capsys):
    import json as _json

    from pyreshaper_ray.cli import main
    from pyreshaper_ray.fixtures import write_fixture

    write_fixture(str(tmp_path / "fx"), n_conv=20, n_files=2)
    spec = str(tmp_path / "spec.json")
    assert main([
        "make", spec,
        "--input", str(tmp_path / "fx" / "transcripts"),
        "--out", str(tmp_path / "out"),
        "--n-buckets", "0",
    ]) == 0
    capsys.readouterr()
    assert main(["explain", spec]) == 0
    plan = _json.loads(capsys.readouterr().out.strip())
    assert plan["input_files"] == 2 and plan["input_rows"] > 0
    assert plan["n_buckets_mode"] == "auto" and plan["n_buckets"] >= 16
    assert plan["exchange"] == "spill"
    assert any("exchange" in s for s in plan["stages"])


def test_cli_export_ipc_roundtrip(tmp_path):
    """ipc export writes per-block Arrow files that read back to the same
    rows as the tier (the mirror of the IPC source backend)."""
    import glob
    import json as _json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.ipc as pipc

    from pyreshaper_ray.fixtures import write_fixture

    fx = str(tmp_path / "fx")
    write_fixture(fx, n_conv=30, n_files=2, skew_turns=100)
    spec = str(tmp_path / "spec.json")
    out = str(tmp_path / "out")
    dest = str(tmp_path / "ipc")
    run = lambda *a: subprocess.run(
        [sys.executable, "-m", "pyreshaper_ray.cli", *a],
        check=True, capture_output=True, text=True,
    )
    run("make", spec, "--input", f"{fx}/transcripts", "--out", out,
        "--n-buckets", "4", "--tiers", "1m", "--no-gapfill", "--no-encode")
    run("run", spec, "--num-cpus", "4")
    r = run("export", "--out", out, "--tier", "1m", "--format", "ipc",
            "--dest", dest, "--num-cpus", "4")
    info = _json.loads(r.stdout.strip().splitlines()[-1])
    parts = sorted(glob.glob(f"{dest}/*.arrow"))
    assert parts
    back = pa.concat_tables([pipc.open_file(p).read_all() for p in parts])
    tier = pads.dataset(f"{out}/rollup_1m").to_table()
    assert back.num_rows == tier.num_rows == info["rows"]
    cols = [c for c in back.column_names]
    key = [(c, "ascending") for c in ("conv_id", "window_start")]
    assert back.select(cols).sort_by(key).equals(
        tier.select(cols).sort_by(key).combine_chunks()
    )


def test_cli_verify_equal(fixture_dir, tmp_path):
    """`verify` runs distributed + oracle and reports every tier equal."""
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
        [sys.executable, "-m", "pyreshaper_ray.cli", "verify", specfile,
         "--num-cpus", "2"],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    verdict = json.loads(r.stdout.strip().splitlines()[-1])
    assert verdict["verdict"] == "equal"
    assert verdict["turns"].startswith("equal")
    assert verdict["series"].startswith("equal")


def test_cli_du_reports_tiers(fixture_dir, tmp_path, capsys):
    """`du` reports per-tier files/bytes/rows from footers only."""
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
    main(["run", specfile, "--num-cpus", "2"])
    capsys.readouterr()
    main(["du", out])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    by_tier = {r["tier"]: r for r in report}
    assert by_tier["turns"]["files"] == 4
    assert by_tier["turns"]["rows"] > 0
    assert by_tier["turns"]["bytes"] > 0
    assert not by_tier["turns"]["compacted"]
    assert set(by_tier) >= {"turns", "series", "1m", "1h", "1d", "gapfill_1m"}


def test_cli_route_serves_from_tier(fixture_dir, tmp_path, capsys):
    """`route` serves a windowed rollup through the tier router; the
    answer equals a pandas aggregate of the raw fixture turns (additive
    tier measures), and --plan-only prints the decision table."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

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
    main(["run", specfile, "--num-cpus", "2"])

    # fixture ts range -> pick a [start, end) window covering some days
    import glob

    raw = pd.concat(
        pq.read_table(f).to_pandas()
        for f in glob.glob(os.path.join(fixture_dir, "transcripts", "*.parquet"))
    ).drop_duplicates(subset=["conv_id", "turn_idx"])
    day0 = raw.ts.min().floor("D")  # the fixture packs into one day
    day1 = day0 + pd.Timedelta(days=2)
    start, end = str(day0)[:19], str(day1)[:19]

    capsys.readouterr()
    rc = main(["route", out, "--start", start, "--end", end,
               "--resolution", "1d", "--plan-only"])
    assert rc == 0
    plan = json.loads(capsys.readouterr().out.strip())
    assert sum(1 for r in plan if r["chosen"]) == 1
    assert [r["tier"] for r in plan if r["chosen"]] == ["1d"]

    rc = main(["route", out, "--start", start, "--end", end,
               "--resolution", "1d", "--num-cpus", "2"])
    assert rc == 0
    served = pd.DataFrame(
        json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    )
    win = raw[(raw.ts >= day0) & (raw.ts < day1)].copy()
    win["day"] = win.ts.dt.floor("D")
    ref = win.groupby("day").agg(
        turn_count=("ts", "size"),
        char_sum=("text", lambda s: int(s.str.len().sum())),
        tool_calls=("tool", lambda s: int((s != "").sum())),
    ).reset_index()
    served = served.sort_values("window_start").reset_index(drop=True)
    ref = ref.sort_values("day").reset_index(drop=True)
    assert len(served) == len(ref) > 0
    assert list(served.turn_count) == list(ref.turn_count)
    assert list(served.char_sum) == list(ref.char_sum)
    assert list(served.tool_calls) == list(ref.tool_calls)
