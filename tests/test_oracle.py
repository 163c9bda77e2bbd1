"""Oracle unit tests on tiny hand-computed cases + fixture-level invariants."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyreshaper_ray.functions.codecs import dod_decode, gorilla_decode
from pyreshaper_ray.functions.gapfill import gapfill_conversation
from pyreshaper_ray.oracle import (
    oracle_cascade,
    oracle_encode_series,
    oracle_full,
    oracle_gapfill,
    oracle_normalize,
    oracle_pivot,
    oracle_rollup_1m,
)


def _ts(s: str) -> int:
    return np.datetime64(s, "us").astype(np.int64)


def _tiny() -> pa.Table:
    """Two conversations, hand-checkable: a dup, out-of-order arrival."""
    rows = [
        # (conv, turn, role, text, tool, ts)
        ("b", 1, "assistant", "xyzzy", "", "2026-01-01T00:01:10"),
        ("a", 0, "user", "hello", "", "2026-01-01T00:00:05"),
        ("a", 1, "tool", "123456789", "search", "2026-01-01T00:00:30"),
        ("a", 1, "tool", "123456789", "search", "2026-01-01T00:00:30"),  # dup
        ("b", 0, "user", "hi", "", "2026-01-01T00:00:59"),
        ("a", 2, "assistant", "ok!", "", "2026-01-01T00:02:30"),
    ]
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows]),
            "text": pa.array([r[3] for r in rows]),
            "tool": pa.array([r[4] for r in rows]),
            "ts": pa.array(
                np.array([_ts(r[5]) for r in rows], dtype=np.int64), pa.timestamp("us")
            ),
        }
    )


def test_pivot_orders_and_dedups():
    p = oracle_pivot(_tiny())
    assert p.num_rows == 5
    assert p["conv_id"].to_pylist() == ["a", "a", "a", "b", "b"]
    assert p["turn_idx"].to_pylist() == [0, 1, 2, 0, 1]
    assert p["text"].to_pylist() == ["hello", "123456789", "ok!", "hi", "xyzzy"]


def test_normalize_columns():
    n = oracle_normalize(_tiny())
    assert n["char_len"].to_pylist()[:4] == [5, 5, 9, 9]
    assert n["tok_est"].to_pylist()[:4] == [2, 2, 3, 3]  # (len+3)//4
    assert n["is_tool"].to_pylist() == [False, False, True, True, False, False]
    w = n["w1m"].to_pylist()
    assert w[1].second == 0 and w[1].minute == 0


def test_rollup_1m_hand_computed():
    p = oracle_pivot(oracle_normalize(_tiny()))
    r = oracle_rollup_1m(p)
    # conv a: minute 0 has turns 0,1 (len 5,9); minute 2 has turn 2 (len 3)
    # conv b: minute 0 has turn 0 (len 2); minute 1 has turn 1 (len 5)
    rows = {
        (c, str(w)): (tc, cs, mn, mx, te, tl)
        for c, w, tc, cs, mn, mx, te, tl in zip(
            r["conv_id"].to_pylist(),
            r["window_start"].to_pylist(),
            r["turn_count"].to_pylist(),
            r["char_sum"].to_pylist(),
            r["char_min"].to_pylist(),
            r["char_max"].to_pylist(),
            r["tok_est_sum"].to_pylist(),
            r["tool_calls"].to_pylist(),
        )
    }
    assert rows[("a", "2026-01-01 00:00:00")] == (2, 14, 5, 9, 5, 1)
    assert rows[("a", "2026-01-01 00:02:00")] == (1, 3, 3, 3, 1, 0)
    assert rows[("b", "2026-01-01 00:00:00")] == (1, 2, 2, 2, 1, 0)
    assert rows[("b", "2026-01-01 00:01:00")] == (1, 5, 5, 5, 2, 0)


def test_cascade_composes():
    p = oracle_pivot(oracle_normalize(_tiny()))
    t1m = oracle_rollup_1m(p)
    t1h = oracle_cascade(t1m, "1h")
    # everything lands in hour 0: conv a → 3 turns 17 chars; conv b → 2 turns 7
    assert t1h["turn_count"].to_pylist() == [3, 2]
    assert t1h["char_sum"].to_pylist() == [17, 7]
    assert t1h["char_min"].to_pylist() == [3, 2]
    assert t1h["char_max"].to_pylist() == [9, 5]
    t1d = oracle_cascade(t1h, "1d")
    assert t1d["turn_count"].to_pylist() == [3, 2]


def test_gapfill_kernel_hand_computed():
    # windows at t=0m, 3m with char_sum 10, 40 → gaps at 1m, 2m
    out = gapfill_conversation(
        np.array([0, 180_000_000], np.int64),
        np.array([2, 1], np.int64),
        np.array([10, 40], np.int64),
        np.array([4, 40], np.int32),
        np.array([6, 40], np.int32),
        np.array([3, 10], np.int64),
        np.array([1, 0], np.int64),
        60_000_000,
    )
    assert out["window_start"].tolist() == [0, 60_000_000, 120_000_000, 180_000_000]
    assert out["filled"].tolist() == [False, True, True, False]
    assert out["turn_count"].tolist() == [2, 0, 0, 1]
    assert out["char_sum_interp"].tolist() == [10.0, 20.0, 30.0, 40.0]
    assert out["locf_char_max"].tolist() == [6, 6, 6, 40]


def test_gapfill_on_fixture(small_transcripts):
    full = oracle_full(small_transcripts)
    gf = full["gapfill_1m"]
    # filled rows have zero counts and null min/max
    filled = gf.filter(pc.equal(gf["filled"], True))
    assert filled.num_rows > 0
    assert set(filled["turn_count"].to_pylist()) == {0}
    assert filled["char_min"].null_count == filled.num_rows
    # real rows reproduce the 1m tier exactly
    real = gf.filter(pc.equal(gf["filled"], False))
    assert real.num_rows == full["rollup_1m"].num_rows


def test_tiers_consistent_on_fixture(small_transcripts):
    full = oracle_full(small_transcripts)
    total = int(pc.sum(full["rollup_1m"]["turn_count"]).as_py())
    assert total == full["turns"].num_rows
    assert int(pc.sum(full["rollup_1h"]["turn_count"]).as_py()) == total
    assert int(pc.sum(full["rollup_1d"]["turn_count"]).as_py()) == total
    assert int(pc.sum(full["rollup_1d"]["char_sum"]).as_py()) == int(
        pc.sum(full["rollup_1m"]["char_sum"]).as_py()
    )


def test_encoded_series_roundtrip(small_transcripts):
    full = oracle_full(small_transcripts)
    series = full["series"]
    pivoted = full["turns"]
    # decode conv000007 (skew) and conv000042 (codec stress) and compare
    for cid in ("conv000007", "conv000042", "conv000097"):
        row = series.filter(pc.equal(series["conv_id"], cid))
        grp = pivoted.filter(pc.equal(pivoted["conv_id"], cid))
        ts = grp["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        lens = pc.utf8_length(grp["text"]).to_numpy(zero_copy_only=False).astype(np.float64)
        assert np.array_equal(dod_decode(row["dod_ts"][0].as_py()), ts)
        assert np.array_equal(gorilla_decode(row["gorilla_char_len"][0].as_py()), lens)
        assert row["n_turns"][0].as_py() == len(ts)


def test_per_turn_text_equality_vs_input(small_transcripts):
    """The PyReshaper bit-for-bit contract: pivot preserves every payload."""
    p = oracle_pivot(small_transcripts)
    # dedup drops exact duplicates only; every surviving (conv, turn) text
    # must byte-equal the input's first occurrence.
    inp = small_transcripts.to_pandas().drop_duplicates(
        subset=["conv_id", "turn_idx"], keep="first"
    )
    inp = inp.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    assert inp["text"].tolist() == p["text"].to_pylist()


def test_gapfill_bounded_max_gap():
    """A gap longer than max_gap windows is left as a break (no filled rows)."""
    win = np.array([0, 2 * 60_000_000, 100 * 60_000_000], np.int64)  # gaps: 1, 97
    args = (
        np.array([1, 1, 1], np.int64),
        np.array([10, 20, 30], np.int64),
        np.array([10, 20, 30], np.int32),
        np.array([10, 20, 30], np.int32),
        np.array([3, 5, 8], np.int64),
        np.array([0, 0, 0], np.int64),
    )
    out = gapfill_conversation(win, *args, 60_000_000, max_gap=60)
    assert len(out["window_start"]) == 4  # 3 real + 1 filled (the 1-window gap)
    assert out["filled"].tolist() == [False, True, False, False]
    # unbounded fills everything
    out2 = gapfill_conversation(win, *args, 60_000_000, max_gap=None)
    assert len(out2["window_start"]) == 101
    # interpolation across the small gap unchanged
    assert out["char_sum_interp"].tolist()[1] == 15.0
