"""Round-3 batch: sweep-line concurrency, SCD2 history, EWMA exactness,
user-set overlap, weekly tier — behaviors the sf corpus can't isolate
(crafted overlaps, tie instants, single-event streams)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

US = 1_000_000
BASE = 1_700_000_000 * US


def _transcripts(rows):
    """rows: list of (conv_id, turn_idx, ts_us)."""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array(
                np.array([r[2] for r in rows], dtype=np.int64), pa.timestamp("us")
            ),
        }
    )


def test_concurrent_convs_sweepline(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import concurrent_convs

    # spans: a=[0, 100], b=[50, 150], c=[150, 200], d=[300, 300]
    # at a.start (0): only a active -> 1
    # at b.start (50): a, b -> 2
    # at c.start (150): b ends AT 150 (closed span, still active), c -> 2
    # at d.start (300): only d (point span) -> 1
    rows = [
        ("a", 0, 0), ("a", 1, 100 * US),
        ("b", 0, 50 * US), ("b", 1, 150 * US),
        ("c", 0, 150 * US), ("c", 1, 200 * US),
        ("d", 0, 300 * US),
    ]
    out = {
        r["conv_id"]: r["n_active"]
        for r in concurrent_convs(ray.data.from_arrow(_transcripts(rows)))
        .take_all()
    }
    assert out == {"a": 1, "b": 2, "c": 2, "d": 1}


def test_concurrent_convs_tied_starts(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import concurrent_convs

    # three conversations all starting at the same instant: each sees all 3
    rows = [
        ("x", 0, 0), ("x", 1, 10 * US),
        ("y", 0, 0), ("y", 1, 20 * US),
        ("z", 0, 0),
    ]
    out = {
        r["conv_id"]: r["n_active"]
        for r in concurrent_convs(ray.data.from_arrow(_transcripts(rows)))
        .take_all()
    }
    assert out == {"x": 3, "y": 3, "z": 3}


def test_scd2_intervals_and_open_row(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import scd2_value_history

    t = pa.table(
        {
            "user_id": pa.array([7, 7, 7, 9], pa.int64()),
            "event_id": pa.array([2, 1, 3, 1], pa.int64()),
            # event 1 and 2 share user 7's first ts -> event_id breaks the tie
            "ts": pa.array(
                np.array([BASE, BASE, BASE + 60 * US, BASE], dtype=np.int64),
                pa.timestamp("us"),
            ),
            "value": pa.array([2.0, 1.0, 3.0, 9.5], pa.float64()),
        }
    )
    rows = scd2_value_history(ray.data.from_arrow(t)).take_all()
    u7 = sorted(
        [r for r in rows if r["user_id"] == 7],
        key=lambda r: (r["valid_from"], r["value_cents"]),
    )
    # ordered by (ts, event_id): values 1.0, 2.0, 3.0
    assert [r["value_cents"] for r in u7] == [100, 200, 300]
    assert u7[0]["valid_to"] == u7[1]["valid_from"]
    assert u7[2]["valid_to"] is None  # open current row
    (u9,) = [r for r in rows if r["user_id"] == 9]
    assert u9["value_cents"] == 950 and u9["valid_to"] is None


def test_ewma_dyadic_exactness(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import ewma_chars

    # 10 turns, char_len = 1..10 via text of that many chars
    n = 10
    t = pa.table(
        {
            "conv_id": pa.array(["c"] * n, pa.string()),
            "turn_idx": pa.array(range(n), pa.int32()),
            "ts": pa.array(
                np.arange(n, dtype=np.int64) * US + BASE, pa.timestamp("us")
            ),
            "char_len": pa.array(range(1, n + 1), pa.int32()),
        }
    )
    out = {
        r["turn_idx"]: r["ewma"]
        for r in ewma_chars(ray.data.from_arrow(t), k=8).take_all()
    }
    # closed-form check at a few indices (weights 2^-(j+1), zero-padded)
    def ref(i):
        return sum(
            2.0 ** -(j + 1) * (i - j + 1) for j in range(8) if i - j >= 0
        )

    for i in (0, 3, 9):
        assert out[i] == ref(i)  # EXACT equality — dyadic weights


def test_event_type_overlap_jaccard(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import event_type_user_overlap

    # users: 1 -> {p, q}, 2 -> {p}, 3 -> {q}, 4 -> {p, q}  (dup events too)
    t = pa.table(
        {
            "event_type": pa.array(
                ["p", "q", "p", "q", "p", "q", "p"], pa.string()
            ),
            "user_id": pa.array([1, 1, 2, 3, 4, 4, 4], pa.int64()),
        }
    )
    rows = event_type_user_overlap(ray.data.from_arrow(t)).to_pylist()
    assert len(rows) == 1
    r = rows[0]
    assert (r["type_a"], r["type_b"]) == ("p", "q")
    assert (r["n_both"], r["n_a"], r["n_b"]) == (2, 3, 3)
    assert r["jaccard"] == 2 / 4


def test_weekly_tier_cascade_boundaries(ray_session):
    import ray.data

    from pyreshaper_ray.stages.rollup import cascade, rollup_1m

    # two turns on Wed Jan 3 2024 and one on Tue Jan 9 -> weeks of Jan 1 / Jan 8
    ts = np.array(
        ["2024-01-03T05:00:00", "2024-01-03T23:59:00", "2024-01-09T00:00:01"],
        dtype="datetime64[us]",
    )
    t = pa.table(
        {
            "conv_id": pa.array(["c"] * 3, pa.string()),
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            "ts": pa.array(ts),
            "char_len": pa.array([10, 20, 30], pa.int32()),
            "tok_est": pa.array([3, 5, 8], pa.int64()),
            "is_tool": pa.array([False, True, False]),
            "w1m": pa.array(ts),  # already minute-aligned
        }
    )
    tier = cascade(
        cascade(cascade(rollup_1m(ray.data.from_arrow(t)), "1h"), "1d"), "1w"
    )
    rows = sorted(tier.take_all(), key=lambda r: r["window_start"])
    assert [str(r["window_start"]) for r in rows] == [
        "2024-01-01 00:00:00",
        "2024-01-08 00:00:00",
    ]
    assert rows[0]["turn_count"] == 2 and rows[0]["char_sum"] == 30
    assert rows[0]["char_min"] == 10 and rows[0]["char_max"] == 20
    assert rows[0]["tool_calls"] == 1
    assert rows[1]["turn_count"] == 1 and rows[1]["char_sum"] == 30


def test_value_deciles_exact(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import value_deciles

    # values 0.01 .. 1.00 -> cents 1..100; decile d -> rank d*10 -> d*10 cents
    t = pa.table({"value": pa.array([i / 100 for i in range(1, 101)])})
    out = {
        r["decile"]: r["value_cents"]
        for r in value_deciles(ray.data.from_arrow(t)).to_pylist()
    }
    assert out == {d: d * 10 for d in range(1, 10)}


def test_winsorized_clip_bounds(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import winsorized_value_stats

    vals = np.arange(1, 101)  # cents 1..100 -> p05 = 5, p95 = 95
    t = pa.table(
        {
            "event_type": pa.array(["e"] * 100, pa.string()),
            "value": pa.array(vals / 100),
        }
    )
    rows = winsorized_value_stats(ray.data.from_arrow(t)).take_all()
    assert len(rows) == 1
    want = int(np.clip(vals, 5, 95).sum())
    assert rows[0]["n"] == 100 and rows[0]["wsum_cents"] == want


def test_role_runs_rle(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import role_runs

    roles = ["a", "a", "b", "a", "a", "a", "c"]
    t = pa.table(
        {
            "conv_id": pa.array(["c1"] * 7, pa.string()),
            "turn_idx": pa.array(range(7), pa.int32()),
            "role": pa.array(roles, pa.string()),
        }
    )
    rows = sorted(
        role_runs(ray.data.from_arrow(t)).take_all(), key=lambda r: r["run_idx"]
    )
    assert [(r["run_idx"], r["role"], r["run_len"]) for r in rows] == [
        (1, "a", 2),
        (2, "b", 1),
        (3, "a", 3),
        (4, "c", 1),
    ]


def test_longest_streak_gap(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import longest_streak_days

    day = 86_400 * US
    # user 1: days 0,1,2, 5,6 (dup events on day 1) -> streak 3
    # user 2: single day -> 1
    ts = [0, day, day + 5, 2 * day, 5 * day, 6 * day, 10 * day]
    uid = [1, 1, 1, 1, 1, 1, 2]
    t = pa.table(
        {
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(
                np.array(ts, dtype=np.int64) + BASE, pa.timestamp("us")
            ),
        }
    )
    out = {
        r["user_id"]: r["longest_streak"]
        for r in longest_streak_days(ray.data.from_arrow(t)).take_all()
    }
    assert out == {1: 3, 2: 1}


def test_median_value_per_type_lower(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import median_value_per_type

    # even-count group -> LOWER median (index (n-1)//2 of the sorted values)
    t = pa.table(
        {
            "event_type": pa.array(["a", "a", "a", "a", "b"], pa.string()),
            "value": pa.array([0.04, 0.01, 0.03, 0.02, 9.99]),
        }
    )
    out = {
        r["event_type"]: r["median_cents"]
        for r in median_value_per_type(ray.data.from_arrow(t)).take_all()
    }
    assert out == {"a": 2, "b": 999}


def test_wau_distinct_and_week_alignment(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import wau_by_week

    ts = np.array(
        # Wed Jan 3 + Fri Jan 5 (same week, user 1 twice + user 2),
        # Tue Jan 9 (next week, user 1)
        ["2024-01-03T10:00:00", "2024-01-05T10:00:00",
         "2024-01-05T11:00:00", "2024-01-09T00:00:00"],
        dtype="datetime64[us]",
    )
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 1], pa.int64()),
            "ts": pa.array(ts),
        }
    )
    out = {
        str(r["week_start"]): r["wau"]
        for r in wau_by_week(ray.data.from_arrow(t)).take_all()
    }
    assert out == {"2024-01-01 00:00:00": 2, "2024-01-08 00:00:00": 1}


def test_tier_consistency_empty_on_healthy(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import tier_consistency_check

    n = 50
    ts = np.arange(n, dtype=np.int64) * 90 * US + BASE  # crosses minutes+hours
    t = pa.table(
        {
            "conv_id": pa.array(["c%d" % (i % 3) for i in range(n)], pa.string()),
            "turn_idx": pa.array(range(n), pa.int32()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "char_len": pa.array([(i * 7) % 50 + 1 for i in range(n)], pa.int32()),
            "tok_est": pa.array([(i % 13) + 1 for i in range(n)], pa.int64()),
            "is_tool": pa.array([i % 4 == 0 for i in range(n)]),
            "w1m": pa.array(
                (ts // (60 * US)) * (60 * US), pa.timestamp("us")
            ),
        }
    )
    out = tier_consistency_check(ray.data.from_arrow(t)).take_all()
    assert out == []


def test_merge_tiers_equals_single_pass(ray_session):
    import ray.data

    from pyreshaper_ray.stages.rollup import merge_tiers, rollup_1m

    n = 40
    ts = np.arange(n, dtype=np.int64) * 37 * US + BASE
    t = pa.table(
        {
            "conv_id": pa.array(["c%d" % (i % 2) for i in range(n)], pa.string()),
            "turn_idx": pa.array(range(n), pa.int32()),
            "char_len": pa.array([(i * 3) % 20 + 1 for i in range(n)], pa.int32()),
            "tok_est": pa.array([(i % 5) + 1 for i in range(n)], pa.int64()),
            "is_tool": pa.array([i % 3 == 0 for i in range(n)]),
            "w1m": pa.array((ts // (60 * US)) * (60 * US), pa.timestamp("us")),
        }
    )
    full = rollup_1m(ray.data.from_arrow(t))
    merged = merge_tiers(
        rollup_1m(ray.data.from_arrow(t.slice(0, 25))),
        rollup_1m(ray.data.from_arrow(t.slice(25))),
    )

    def key(rows):
        return sorted(
            (tuple(sorted(r.items())) for r in rows), key=lambda x: str(x)
        )

    assert key(full.take_all()) == key(merged.take_all())


def test_corpus_intake_gate_and_dedup(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import corpus_intake_counts

    good = "the quick brown fox jumps over a lazy dog again and again ok"
    t = pa.table(
        {
            "doc_id": pa.array([3, 1, 2, 4], pa.int64()),
            "source": pa.array(["s1", "s1", "s2", "s2"], pa.string()),
            # doc 3 and 1 identical (dup -> doc 1 kept, s1);
            # doc 2 passes; doc 4 too short
            "text": pa.array([good, good, good + " more", "tiny"], pa.string()),
        }
    )
    rows = {
        r["source"]: (r["n_docs_kept"], r["chars_kept"])
        for r in corpus_intake_counts(ray.data.from_arrow(t)).take_all()
    }
    assert rows == {
        "s1": (1, len(good)),
        "s2": (1, len(good) + 5),
    }


def test_percent_rank_ties(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import percent_rank_convs

    # conv u2, u4, u6 (even cohort): char sums 1, 1, 3 -> pct 0, 0, 1;
    # cume 2/3, 2/3, 1
    t = pa.table(
        {
            "conv_id": pa.array(["u2", "u4", "u6", "u6", "u6"], pa.string()),
            "char_len": pa.array([1, 1, 1, 1, 1], pa.int32()),
        }
    )
    rows = {
        r["conv_id"]: (r["pct_rank"], r["cume"])
        for r in percent_rank_convs(ray.data.from_arrow(t)).take_all()
    }
    assert rows["u2"] == (0.0, 2 / 3)
    assert rows["u4"] == (0.0, 2 / 3)
    assert rows["u6"] == (1.0, 1.0)


def test_calendarize_spans_boundaries(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import calendarize_spans

    day = 86_400 * US
    # conv a: 23:00 day0 -> 01:00 day2 (spans 3 days); conv b: point span
    rows = [
        ("a", 0, 23 * 3600 * US),
        ("a", 1, 2 * day + 3600 * US),
        ("b", 0, 12 * 3600 * US),
    ]
    t = _transcripts(rows)
    out = {
        (r["conv_id"], str(r["day"])): r["active_us"]
        for r in calendarize_spans(ray.data.from_arrow(t)).take_all()
    }
    assert out == {
        ("a", "1970-01-01 00:00:00"): 3600 * US,          # 23:00 -> 24:00
        ("a", "1970-01-02 00:00:00"): day,                 # full day
        ("a", "1970-01-03 00:00:00"): 3600 * US,           # 00:00 -> 01:00
        ("b", "1970-01-01 00:00:00"): 0,                   # point span
    }


def test_cusum_planted_shift_and_identity(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import cusum_shift_users

    # user 1: flat 10.00 for 10 events, then jumps to 60.00 -> alarm soon
    # after index 10 with h=100.00; user 2: flat, never alarms
    vals1 = [10.0] * 10 + [60.0] * 5
    vals2 = [10.0] * 15
    n = len(vals1)
    t = pa.table(
        {
            "user_id": pa.array([1] * n + [2] * n, pa.int64()),
            "event_id": pa.array(list(range(n)) * 2, pa.int64()),
            "ts": pa.array(
                np.concatenate([np.arange(n)] * 2) * US + BASE,
                pa.timestamp("us"),
            ),
            "value": pa.array(vals1 + vals2),
        }
    )
    out = {
        r["user_id"]: (r["alarm_idx"], r["max_cusum"])
        for r in cusum_shift_users(
            ray.data.from_arrow(t), h_cents=10_000
        ).take_all()
    }
    # textbook recursion cross-check for user 1 (ref = 1000 cents)
    s, alarm, peak = 0, -1, 0
    for i, v in enumerate(vals1):
        s = max(0, s + int(round(v * 100)) - 1000)
        peak = max(peak, s)
        if alarm < 0 and s > 10_000:
            alarm = i
    assert out[1] == (alarm, peak)
    assert out[2] == (-1, 0)


def test_ipc_backend_roundtrip(ray_session, tmp_path):
    import ray.data

    from pyreshaper_ray.sources.transcripts import read_transcripts

    t = _transcripts([("a", 0, 0), ("a", 1, US), ("b", 0, 2 * US)])
    t = t.append_column("role", pa.array(["u", "a", "u"], pa.string()))
    t = t.append_column("text", pa.array(["hi", "yo", "ok"], pa.string()))
    t = t.append_column("tool", pa.array(["", "", ""], pa.string()))
    p = str(tmp_path / "x.arrow")
    with pa.ipc.new_file(p, t.schema) as w:
        w.write_table(t)
    got = read_transcripts(p, format="ipc")
    rows = sorted(
        got.take_all(), key=lambda r: (r["conv_id"], r["turn_idx"])
    )
    assert [(r["conv_id"], r["turn_idx"], r["text"]) for r in rows] == [
        ("a", 0, "hi"), ("a", 1, "yo"), ("b", 0, "ok")
    ]


def test_wau_retention_week_pairs(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import wau_retention

    # weeks: 2024-01-01 (u1, u2), 2024-01-08 (u1), 2024-01-15 (u3)
    ts = np.array(
        ["2024-01-02T00:00:00", "2024-01-03T00:00:00", "2024-01-04T00:00:00",
         "2024-01-10T00:00:00", "2024-01-16T00:00:00"],
        dtype="datetime64[us]",
    )
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 1, 3], pa.int64()),
            "ts": pa.array(ts),
        }
    )
    out = {
        str(r["week_start"]): (r["wau"], r["retained"], r["ret_ppm"])
        for r in wau_retention(ray.data.from_arrow(t)).take_all()
    }
    assert out == {
        "2024-01-01 00:00:00": (2, 1, 500000),
        "2024-01-08 00:00:00": (1, 0, 0),
        "2024-01-15 00:00:00": (1, 0, 0),
    }


def test_benford_exact_digits(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import benford_first_digit

    # cents: 100, 999, 1000, 95 -> digits 1, 9, 1, 9
    t = pa.table({"o_totalprice": pa.array([1.00, 9.99, 10.00, 0.95])})
    out = {
        r["digit"]: r["n"]
        for r in benford_first_digit(ray.data.from_arrow(t)).take_all()
    }
    assert out == {1: 2, 9: 2}


def test_term_pairs_per_doc_once(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import term_pair_cooccurrence

    t = pa.table(
        {
            "text": pa.array(
                [
                    "alpha beta alpha",   # pair (alpha, beta) once
                    "beta alpha gamma",   # (alpha,beta) (alpha,gamma) (beta,gamma)
                    "alpha only alpha",   # (alpha, only)
                ],
                pa.string(),
            )
        }
    )
    rows = term_pair_cooccurrence(ray.data.from_arrow(t), k=10).take_all()
    d = {(r["term_a"], r["term_b"]): r["n"] for r in rows}
    assert d[("alpha", "beta")] == 2
    assert d[("alpha", "gamma")] == 1
    assert d[("beta", "gamma")] == 1
    assert d[("alpha", "only")] == 1


def test_ddsketch_daily_p95_error_bound(ray_session):
    import ray.data

    from pyreshaper_ray.stages.sketches import ddsketch_p95_daily

    rng = np.random.default_rng(7)
    day = 86_400 * US
    vals0 = rng.uniform(1, 1000, 2000)
    vals1 = rng.uniform(10, 50, 1500)
    ts = np.concatenate(
        [np.full(2000, BASE), np.full(1500, BASE + day)]
    ) + np.concatenate([np.arange(2000), np.arange(1500)]) * US
    t = pa.table(
        {
            "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
            "value": pa.array(np.concatenate([vals0, vals1])),
        }
    )
    out = sorted(
        ddsketch_p95_daily(ray.data.from_arrow(t)).take_all(),
        key=lambda r: r["day"],
    )
    assert [r["n"] for r in out] == [2000, 1500]
    for r, vals in zip(out, (vals0, vals1)):
        exact = np.quantile(vals, 0.95)
        assert abs(r["p95"] - exact) <= 0.03 * exact  # 1% sketch + rank slack


def test_empty_inputs_no_crash(ray_session):
    """Round-3 ops on EMPTY inputs: no crashes, zero rows (the degenerate
    partition every 100-TB run contains somewhere)."""
    import ray.data

    from pyreshaper_ray.stages.analytics import (
        calendarize_spans,
        concurrent_convs,
        daily_dashboard,
        scd2_value_history,
        value_deciles,
        wau_retention,
        winsorized_value_stats,
    )
    from pyreshaper_ray.stages.windows import ewma_chars, role_runs

    empty_events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
            }
        )
    )
    empty_turns = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "ts": pa.array([], pa.timestamp("us")),
                "role": pa.array([], pa.string()),
                "char_len": pa.array([], pa.int32()),
            }
        )
    )
    assert value_deciles(empty_events).num_rows == 0
    assert winsorized_value_stats(empty_events).count() == 0
    assert daily_dashboard(empty_events).count() == 0
    assert wau_retention(empty_events).count() == 0
    assert scd2_value_history(empty_events).count() == 0
    assert calendarize_spans(empty_turns).count() == 0
    assert concurrent_convs(empty_turns).count() == 0
    assert ewma_chars(empty_turns).count() == 0
    assert role_runs(empty_turns).count() == 0


def test_length_percentile_histogram_ranks(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import length_percentile_docs

    texts = ["a", "bb", "bb", "dddd"]  # lens 1,2,2,4 -> below: 0,1,1,3
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = {
        r["doc_id"]: r["pct_ppm"]
        for r in length_percentile_docs(ray.data.from_arrow(t)).take_all()
    }
    assert out == {1: 0, 2: 250000, 3: 250000, 4: 750000}


def test_vocab_size_distinct(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import vocab_size

    t = pa.table(
        {"text": pa.array(["a b c", "b c d!", "D?"], pa.string())}
    )
    assert vocab_size(ray.data.from_arrow(t))["n_terms"][0].as_py() == 4


def test_dewma_double_smooth_exact(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import dewma_chars

    n = 12
    t = pa.table(
        {
            "conv_id": pa.array(["c"] * n, pa.string()),
            "turn_idx": pa.array(range(n), pa.int32()),
            "ts": pa.array(
                np.arange(n, dtype=np.int64) * US + BASE, pa.timestamp("us")
            ),
            "char_len": pa.array(range(1, n + 1), pa.int32()),
        }
    )
    out = {
        r["turn_idx"]: r["dewma"]
        for r in dewma_chars(ray.data.from_arrow(t), k=8).take_all()
    }

    def smooth(v):
        return [
            sum(2.0 ** -(j + 1) * v[i - j] for j in range(8) if i - j >= 0)
            for i in range(len(v))
        ]

    ref = smooth(smooth(list(range(1, n + 1))))
    for i in (0, 5, 11):
        assert out[i] == ref[i]


def test_skew_census_hot_key(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import skew_census

    t = pa.table({"user_id": pa.array([1] * 7 + [2, 3, 4], pa.int64())})
    r = skew_census(ray.data.from_arrow(t)).to_pylist()[0]
    assert r == {
        "n_rows": 10,
        "n_distinct": 4,
        "top1_n": 7,
        "top1_share_ppm": 700000,
    }


def test_posting_stats_df_and_range(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import posting_stats

    t = pa.table(
        {
            "doc_id": pa.array([10, 20, 30], pa.int64()),
            "text": pa.array(["cat dog cat", "dog!", "CAT"], pa.string()),
        }
    )
    out = {
        r["term"]: (r["df"], r["min_doc"], r["max_doc"])
        for r in posting_stats(ray.data.from_arrow(t)).take_all()
    }
    assert out == {"cat": (2, 10, 30), "dog": (2, 10, 20)}


def test_flagship_1w_tier_bit_exact(ray_session, tmp_path):
    """Flagship with the weekly tier enabled: the distributed rollup_1w
    product is bit-for-bit the oracle's 1d tier cascaded to ISO weeks."""
    import glob
    import os

    import pyarrow.compute as _pc
    import pyarrow.parquet as pq

    from pyreshaper_ray.fixtures import write_fixture
    from pyreshaper_ray.oracle import oracle_cascade, oracle_full
    from pyreshaper_ray.pipelines.flagship import read_tier, run_flagship
    from pyreshaper_ray.pipelines.spec import create_spec

    fx = str(tmp_path / "fx")
    paths = write_fixture(fx, n_conv=40, n_files=3, skew_turns=120)
    t = pa.concat_tables([pq.read_table(p) for p in paths])
    want = oracle_cascade(oracle_full(t)["rollup_1d"], "1w")

    out = str(tmp_path / "out")
    spec = create_spec(
        input=os.path.join(fx, "transcripts"),
        out_dir=out,
        n_buckets=5,
        wmode="o",
        tiers=("1m", "1h", "1d", "1w"),
    )
    run_flagship(spec)
    import ray

    refs = read_tier(out, "1w").to_arrow_refs()
    got = pa.concat_tables(
        [x for x in (ray.get(r) for r in refs) if x.num_columns]
    ).select(want.column_names)

    def canon(tbl):
        return tbl.take(
            _pc.sort_indices(
                tbl,
                sort_keys=[("conv_id", "ascending"), ("window_start", "ascending")],
            )
        )

    assert canon(got).cast(want.schema).equals(canon(want))


def test_empty_inputs_no_crash_batch3(ray_session):
    """Session-25+ ops on EMPTY inputs: no crashes, zero rows."""
    import ray.data

    from pyreshaper_ray.stages.analytics import growth_accounting
    from pyreshaper_ray.stages.text import context_assembly, pack_sequences
    from pyreshaper_ray.stages.timeseries import paa_segments
    from pyreshaper_ray.stages.windows import (
        transition_latency_census,
        window_corrections,
    )

    empty_events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
            }
        )
    )
    empty_turns = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    empty_docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        )
    )
    from pyreshaper_ray.stages.analytics import contingency_margins
    from pyreshaper_ray.stages.dedup import cross_source_contamination
    from pyreshaper_ray.stages.timeseries import hourly_seasonality

    empty_typed = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "ts": pa.array([], pa.timestamp("us")),
            }
        )
    )
    empty_src_docs = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
            }
        )
    )
    assert contingency_margins(empty_typed).count() == 0
    assert hourly_seasonality(empty_typed).count() == 0
    assert cross_source_contamination(empty_src_docs).count() == 0
    assert growth_accounting(empty_events).count() == 0
    assert transition_latency_census(empty_events).count() == 0
    assert window_corrections(empty_events).count() == 0
    assert paa_segments(empty_events).count() == 0
    assert context_assembly(empty_turns).count() == 0
    assert pack_sequences(empty_docs).count() == 0


def test_empty_inputs_no_crash_batch4(ray_session):
    """Session-new ops on EMPTY inputs: no crashes, sane degenerate rows."""
    import ray.data

    from pyreshaper_ray.stages.analytics import (
        equidepth_bin_events,
        gini_user_activity,
        mannwhitney_components,
    )
    from pyreshaper_ray.stages.text import (
        dsir_importance_weights,
        source_mix_weights,
    )

    empty_events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
            }
        )
    )
    empty_docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    assert equidepth_bin_events(empty_events).count() == 0
    row = gini_user_activity(empty_events).take_all()[0]
    assert row["n_users"] == 0 and row["gini_ppm"] == 0
    row = mannwhitney_components(empty_events).take_all()[0]
    assert row["n_a"] == 0 and row["n_b"] == 0 and row["u2_a"] == 0
    assert source_mix_weights(empty_docs).count() == 0
    assert dsir_importance_weights(empty_docs).count() == 0
