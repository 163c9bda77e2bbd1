"""Fixture generator determinism + edge-case presence (FIXTURES.md F1)."""

from __future__ import annotations

import pyarrow.compute as pc
import pyarrow.parquet as pq

from pyreshaper_ray.fixtures import (
    TRANSCRIPT_SCHEMA,
    generate_conv_meta,
    generate_transcripts,
    n_turns,
    write_fixture,
)


def test_schema_matches_input_hint(small_transcripts):
    assert small_transcripts.schema.equals(TRANSCRIPT_SCHEMA)


def test_deterministic(small_transcripts):
    again = generate_transcripts(n_conv=120, skew_turns=600)
    assert again.equals(small_transcripts)


def test_globally_ts_sorted(small_transcripts):
    ts = small_transcripts["ts"].to_numpy(zero_copy_only=False)
    assert (ts[1:] >= ts[:-1]).all()  # F1-e2 interleaved arrival order


def test_skew_conversations(small_transcripts):
    t = small_transcripts
    skew = t.filter(pc.equal(t["conv_id"], "conv000007"))
    assert skew.num_rows == 600  # F1-e1


def test_duplicates_and_gaps(small_transcripts):
    t = small_transcripts
    c25 = t.filter(pc.equal(t["conv_id"], "conv000025"))
    idx = c25["turn_idx"].to_pylist()
    assert idx.count(3) == 2  # F1-e3 duplicate
    assert 5 not in idx  # F1-e3 gap
    n = n_turns(25)
    assert len(idx) == n  # n-1 (missing 5) + 1 (dup 3)


def test_singleton_conv(small_transcripts):
    t = small_transcripts
    c97 = t.filter(pc.equal(t["conv_id"], "conv000097"))
    assert c97.num_rows == 1  # F1-e4


def test_codec_stress_conv42(small_transcripts):
    t = small_transcripts
    c42 = t.filter(pc.equal(t["conv_id"], "conv000042"))
    ts = c42["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype("int64")
    ts.sort()
    gaps = set((ts[1:] - ts[:-1]).tolist())
    assert gaps == {60_000_000}  # F1-e5 exact 60s grid
    lens = set(pc.utf8_length(c42["text"]).to_pylist())
    assert lens == {100}  # constant metric


def test_tool_rows_have_tool_names(small_transcripts):
    t = small_transcripts
    tools = t.filter(pc.equal(t["role"], "tool"))
    assert tools.num_rows > 0
    assert "" not in set(tools["tool"].to_pylist())
    non_tools = t.filter(pc.not_equal(t["role"], "tool"))
    assert set(non_tools["tool"].to_pylist()) == {""}


def test_write_fixture_roundtrip(tmp_path, small_transcripts):
    paths = write_fixture(str(tmp_path), n_conv=120, n_files=4, skew_turns=600)
    tables = [pq.read_table(p) for p in paths]
    import pyarrow as pa

    combined = pa.concat_tables(tables)
    assert combined.equals(small_transcripts)
    # idempotent second call
    assert write_fixture(str(tmp_path), n_conv=120, n_files=4, skew_turns=600) == paths


def test_conv_meta():
    m = generate_conv_meta(6)
    assert m.num_rows == 6
    assert m.column_names == ["conv_id", "channel", "model"]
