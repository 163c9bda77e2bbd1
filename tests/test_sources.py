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
