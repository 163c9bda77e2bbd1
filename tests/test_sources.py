"""Multi-format transcript sources (iobackend abstraction analog)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.csv as pacsv

from pyreshaper_ray.fixtures import TRANSCRIPT_SCHEMA, generate_transcripts
from pyreshaper_ray.sources.transcripts import read_transcripts


def test_read_parquet_and_csv_equivalent(ray_session, tmp_path):
    t = generate_transcripts(n_conv=20, skew_turns=50)
    import pyarrow.parquet as pq

    pq.write_table(t, str(tmp_path / "t.parquet"))
    # CSV loses the timestamp type; write ISO strings
    import pyarrow.compute as pc

    t_csv = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        pc.strftime(t["ts"], format="%Y-%m-%dT%H:%M:%S"),
    )
    pacsv.write_csv(t_csv, str(tmp_path / "t.csv"))

    a = read_transcripts(str(tmp_path / "t.parquet")).to_pandas()
    b = read_transcripts(str(tmp_path / "t.csv"), format="csv").to_pandas()
    a = a.sort_values(["conv_id", "turn_idx", "ts"]).reset_index(drop=True)
    b = b.sort_values(["conv_id", "turn_idx", "ts"]).reset_index(drop=True)
    # fixture ts values are second-aligned, so the ISO roundtrip is lossless
    assert a[["conv_id", "turn_idx", "role", "text", "tool"]].equals(
        b[["conv_id", "turn_idx", "role", "text", "tool"]]
    )
    assert (a["ts"] == b["ts"]).all()


def test_reader_enforces_schema(ray_session, tmp_path):
    t = generate_transcripts(n_conv=5, skew_turns=10)
    import pyarrow.parquet as pq

    pq.write_table(t, str(tmp_path / "t.parquet"))
    ds = read_transcripts(str(tmp_path / "t.parquet"))
    assert [f.name for f in TRANSCRIPT_SCHEMA] == ds.schema().names


def test_unknown_format_rejected(ray_session, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        read_transcripts(str(tmp_path), format="netcdf")


def test_ts_string_format_variants(ray_session, tmp_path):
    """ISO variants (T/space separators, fractional seconds, Z, date-only)
    all parse; unparseable strings raise with the offending value."""
    import pyarrow as pa
    from pyreshaper_ray.sources.transcripts import _cast_to_canonical

    t = pa.table(
        {
            "conv_id": pa.array(["a"] * 5, pa.string()),
            "turn_idx": pa.array(range(5), pa.int32()),
            "role": pa.array(["user"] * 5, pa.string()),
            "text": pa.array(["x"] * 5, pa.string()),
            "tool": pa.array([""] * 5, pa.string()),
            "ts": pa.array(
                [
                    "2026-01-02T03:04:05",
                    "2026-01-02T03:04:05.123456",
                    "2026-01-02 03:04:05",
                    "2026-01-02T03:04:05Z",
                    "2026-01-02",
                ],
                pa.string(),
            ),
        }
    )
    out = _cast_to_canonical(t)
    vals = out["ts"].to_pylist()
    assert vals[0].hour == 3 and vals[1].microsecond == 123456
    assert vals[2].minute == 4 and vals[3].second == 5
    assert vals[4].hour == 0

    import pytest

    bad = t.set_column(5, "ts", pa.array(["not-a-time"] * 5, pa.string()))
    with pytest.raises(ValueError, match="not-a-time"):
        _cast_to_canonical(bad)


def test_ts_epoch_int_unit_inference(ray_session):
    import pyarrow as pa
    from pyreshaper_ray.sources.transcripts import _epoch_ints_to_us

    base_s = 1_700_000_000
    for mult, unit in ((1, "s"), (1_000, "ms"), (1_000_000, "us")):
        col = pa.array([base_s * mult, base_s * mult + mult], pa.int64())
        out = _epoch_ints_to_us(col)
        assert out.type == pa.timestamp("us")
        got = out.to_pylist()
        assert got[0].year == 2023, unit
        assert (got[1] - got[0]).total_seconds() == 1.0, unit
