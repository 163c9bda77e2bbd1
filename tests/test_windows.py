"""Window-operator kernels on synthetic streams (the oracle rehearsal in
test_queries covers SQL parity; this file proves behaviors the driver corpus
cannot show — out-of-order arrivals, single-turn edge cases)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_late_events_detects_disorder(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import late_events

    us = 1_000_000
    base = 1_700_000_000 * us
    # user 1: arrival order 0..4, event times jump back 2h at arrival 3
    # → hwm at arrival 3 is base+2h, 2h behind → late; arrival 4 recovers
    ts1 = [base, base + 3600 * us, base + 7200 * us, base, base + 7300 * us]
    # user 2: in order, never late
    ts2 = [base, base + 60 * us, base + 120 * us]
    t = pa.table(
        {
            "user_id": pa.array([1] * 5 + [2] * 3, pa.int64()),
            "event_id": pa.array(list(range(5)) + list(range(10, 13)), pa.int64()),
            "ts": pa.array(
                np.array(ts1 + ts2, dtype=np.int64), pa.timestamp("us")
            ),
        }
    )
    out = {
        r["user_id"]: (r["n_late"], r["n_events"])
        for r in late_events(ray.data.from_arrow(t), watermark_s=1800).take_all()
    }
    assert out == {1: (1, 5), 2: (0, 3)}


def test_turn_gaps_single_turn_conv(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import turn_gaps

    t = pa.table(
        {
            "conv_id": pa.array(["a", "b", "b"], pa.string()),
            "turn_idx": pa.array([0, 0, 1], pa.int32()),
            "ts": pa.array(
                np.array([0, 0, 5_000_000], dtype=np.int64), pa.timestamp("us")
            ),
        }
    )
    rows = {
        r["conv_id"]: r for r in turn_gaps(ray.data.from_arrow(t)).take_all()
    }
    assert rows["a"]["n_gaps"] == 0 and rows["a"]["sum_gap_us"] is None
    assert rows["b"]["n_gaps"] == 1 and rows["b"]["sum_gap_us"] == 5_000_000


def test_global_median_refinement_edge_cases(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import global_median_cents

    def med_of(vals):
        t = pa.table({"value": pa.array(vals, pa.float64())})
        out = global_median_cents(ray.data.from_arrow(t)).take_all()
        return out[0]["median_cents"]

    # all-equal collapses round 1
    assert med_of([7.00] * 9) == 700
    # two clusters: lower median of even count = sorted[(n-1)//2]
    assert med_of([1.00] * 5 + [100.00] * 5) == 100
    # adversarial: values straddling bucket boundaries
    vals = [x / 100 for x in range(1, 2050)]
    assert med_of(vals) == (len(vals) - 1) // 2 + 1
    # negative values
    assert med_of([-5.00, -1.00, 3.00]) == -100
    # empty input: zero rows, no crash (ADVICE r2)
    t = pa.table({"value": pa.array([], pa.float64())})
    assert global_median_cents(ray.data.from_arrow(t)).take_all() == []
    # wide domain (> bins^4): converges past the old fixed 4-round cap to
    # the exact order statistic, not a bucket lower bound
    wide = [0.00, 10_000_000_000_000.00, 20_000_000_000_000.37]
    assert med_of(wide) == 1_000_000_000_000_000


def test_rank_ties_share_rank_and_dense_has_no_gaps(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import rank_convs_in_cohort

    # all-even cohort (u2,u4,u6,u8): totals 50, 50, 30, 10
    # RANK: 1,1,3,4  DENSE_RANK: 1,1,2,3
    t = pa.table(
        {
            "conv_id": pa.array(
                ["u2", "u2", "u4", "u6", "u8"], pa.string()
            ),
            "char_len": pa.array([20, 30, 50, 30, 10], pa.int32()),
        }
    )
    out = {
        r["conv_id"]: (r["char_sum"], r["rnk"], r["dense_rnk"])
        for r in rank_convs_in_cohort(ray.data.from_arrow(t)).take_all()
    }
    assert out == {
        "u2": (50, 1, 1),
        "u4": (50, 1, 1),
        "u6": (30, 3, 2),
        "u8": (10, 4, 3),
    }


def test_moving_sum_frame_edges(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import moving_sum_turns

    # frame=3 over [1,2,3,4]: 1, 3, 6, 9; group shorter than frame: [7] -> 7
    t = pa.table(
        {
            "conv_id": pa.array(["a"] * 4 + ["b"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 3, 0], pa.int32()),
            "char_len": pa.array([1, 2, 3, 4, 7], pa.int32()),
        }
    )
    rows = moving_sum_turns(ray.data.from_arrow(t), frame=3).take_all()
    got = {(r["conv_id"], r["turn_idx"]): r["win_chars"] for r in rows}
    assert got == {
        ("a", 0): 1,
        ("a", 1): 3,
        ("a", 2): 6,
        ("a", 3): 9,
        ("b", 0): 7,
    }


def test_rolling_minmax_frame_edges(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import rolling_minmax_turns

    # frame=3 over [5,1,4,2]: min 5,1,1,1 / max 5,5,5,4; short group: [7]
    t = pa.table(
        {
            "conv_id": pa.array(["a"] * 4 + ["b"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 3, 0], pa.int32()),
            "char_len": pa.array([5, 1, 4, 2, 7], pa.int32()),
        }
    )
    rows = rolling_minmax_turns(ray.data.from_arrow(t), frame=3).take_all()
    got = {(r["conv_id"], r["turn_idx"]): (r["roll_min"], r["roll_max"]) for r in rows}
    assert got == {
        ("a", 0): (5, 5),
        ("a", 1): (1, 5),
        ("a", 2): (1, 5),
        ("a", 3): (1, 4),
        ("b", 0): (7, 7),
    }


def test_mode_role_tie_breaks_lexicographically(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import mode_role_per_conv

    base = 1_700_000_000_000_000
    t = pa.table(
        {
            "conv_id": pa.array(["c1"] * 4, pa.string()),
            "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
            "role": pa.array(["view", "click", "click", "view"], pa.string()),
            "ts": pa.array(
                np.array([base + i for i in range(4)], np.int64),
                pa.timestamp("us"),
            ),
        }
    )
    rows = mode_role_per_conv(ray.data.from_arrow(t)).take_all()
    assert rows[0]["mode_role"] == "click" and rows[0]["n_turns"] == 2


def test_user_day_membership_set_semantics(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import user_day_membership

    day_us = 86_400_000_000
    # user 1 day 0: purchase+error (both); user 1 day 1: purchase only
    # user 2 day 0: error only (neither set)
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                np.array([100, 200, day_us + 5, 300], np.int64),
                pa.timestamp("us"),
            ),
            "event_type": pa.array(
                ["purchase", "error", "purchase", "error"], pa.string()
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    both = {
        (r["user_id"], r["day"])
        for r in user_day_membership(ds, mode="both").take_all()
    }
    a_only = {
        (r["user_id"], r["day"])
        for r in user_day_membership(ds, mode="a_only").take_all()
    }
    assert both == {(1, 0)}
    assert a_only == {(1, 1)}


def test_ntile_uneven_split(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import ntile_convs

    # 10 rows, k=4 -> tiles of 3,3,2,2 (first n%k tiles get the extra row)
    t = pa.table(
        {
            "conv_id": pa.array([f"u{i}" for i in range(10)], pa.string()),
            "char_len": pa.array(list(range(10, 110, 10)), pa.int32()),
        }
    )
    rows = ntile_convs(ray.data.from_arrow(t), k=4).take_all()
    by_sum = {r["char_sum"]: r["tile"] for r in rows}
    want = {10:1, 20:1, 30:1, 40:2, 50:2, 60:2, 70:3, 80:3, 90:4, 100:4}
    assert by_sum == want


def test_debounce_keeps_first_and_spaced(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import debounce_events

    us = 1_000_000
    base = 1_700_000_000 * us
    # user 1 click: t=0 (keep), t=300s (drop), t=1000s (keep: 700s after prev)
    # user 1 view: t=5 (keep, different key)
    # user 2 click: same ts twice -> tie dropped
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(
                ["click", "click", "click", "view", "click", "click"]
            ),
            "ts": pa.array(
                np.array(
                    [base, base + 300 * us, base + 1000 * us, base + 5, base, base],
                    dtype=np.int64,
                ),
                pa.timestamp("us"),
            ),
        }
    )
    kept = sorted(
        r["event_id"]
        for r in debounce_events(ray.data.from_arrow(t), gap_s=600).take_all()
    )
    assert kept == [1, 3, 4, 5]


def test_user_gap_stats_singletons_emit_nothing(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import user_gap_stats

    us = 1_000_000
    base = 1_700_000_000 * us
    # user 1: gaps 2s and 5s -> n=2 sum=7 sumsq=29 min=2 max=5
    # user 2: single event -> no row
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                np.array(
                    [base, base + 2 * us, base + 7 * us, base], dtype=np.int64
                ),
                pa.timestamp("us"),
            ),
        }
    )
    rows = {r["user_id"]: r for r in user_gap_stats(ray.data.from_arrow(t)).take_all()}
    assert set(rows) == {1}
    r = rows[1]
    assert (r["n_gaps"], r["sum_gap_s"], r["sumsq_gap_s"], r["min_gap_s"], r["max_gap_s"]) == (2, 7, 29, 2, 5)


def test_event_trigrams_hand(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import event_trigrams

    us = 1_000_000
    base = 1_700_000_000 * us
    # user 1: A B A B -> (A,B,A), (B,A,B); user 2: only 2 events -> none
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["A", "B", "A", "B", "A", "B"]),
            "ts": pa.array(
                np.array([base + i * us for i in range(6)], dtype=np.int64),
                pa.timestamp("us"),
            ),
        }
    )
    rows = {
        (r["a"], r["b"], r["c"]): r["n"]
        for r in event_trigrams(ray.data.from_arrow(t)).take_all()
    }
    assert rows == {("A", "B", "A"): 1, ("B", "A", "B"): 1}


def test_drop_repeated_turns_lag_semantics(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import drop_repeated_turns

    # conv a: x, x (drop), y, x (keep again: only CONSECUTIVE dups drop)
    t = pa.table(
        {
            "conv_id": pa.array(["a"] * 4 + ["b"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 3, 0], pa.int32()),
            "text": pa.array(["x", "x", "y", "x", "z"]),
        }
    )
    kept = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in drop_repeated_turns(ray.data.from_arrow(t)).take_all()
    )
    assert kept == [("a", 0), ("a", 2), ("a", 3), ("b", 0)]


def test_peak_rate_5m_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.windows import peak_rate_5m

    # user 1: events at 0s, 100s, 250s, 600s — window (t-300, t]:
    #   at 250s → {0,100,250} = 3 (peak); at 600s → {600} only ((300,600])
    # user 2: two events at the SAME timestamp → peak 2
    rows = [
        (1, "2024-01-01T00:00:00"), (1, "2024-01-01T00:01:40"),
        (1, "2024-01-01T00:04:10"), (1, "2024-01-01T00:10:00"),
        (2, "2024-01-01T05:00:00"), (2, "2024-01-01T05:00:00"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")
            ),
        }
    )
    out = {
        r["user_id"]: r["peak_events"]
        for r in peak_rate_5m(ray.data.from_arrow(t).repartition(3)).take_all()
    }
    assert out[1] == 3 and out[2] == 2


def test_last_touch_attribution_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.windows import last_touch_attribution

    rows = [  # (event_id, user_id, type, ts)
        (1, 1, "click", "2024-01-01T00:00:00"),
        (2, 1, "click", "2024-01-02T00:00:00"),
        (3, 1, "purchase", "2024-01-02T12:00:00"),   # → click 2
        (4, 1, "purchase", "2024-01-20T00:00:00"),   # > 7d after click 2 → none
        (5, 2, "purchase", "2024-01-01T00:00:00"),   # no touch → none
        (6, 3, "click", "2024-01-01T00:00:00"),
        (7, 3, "click", "2024-01-01T00:00:00"),      # tie ts → highest id wins
        (8, 3, "purchase", "2024-01-01T00:00:00"),   # same-ts touch allowed
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array(
                [np.datetime64(r[3], "us") for r in rows], pa.timestamp("us")
            ),
        }
    )
    out = {
        r["conv_event_id"]: r
        for r in last_touch_attribution(
            ray.data.from_arrow(t).repartition(3)
        ).take_all()
    }
    assert set(out) == {3, 8}
    assert out[3]["touch_event_id"] == 2
    assert out[3]["lag_us"] == 12 * 3600 * 1_000_000
    assert out[8]["touch_event_id"] == 7 and out[8]["lag_us"] == 0


def test_cum_distinct_tools_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.windows import cum_distinct_tools

    rows = [  # (conv, turn, tool)
        ("c", 0, ""), ("c", 1, "click"), ("c", 2, "click"),
        ("c", 3, "purchase"), ("c", 4, ""),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "tool": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    out = sorted(
        cum_distinct_tools(ray.data.from_arrow(t).repartition(2)).take_all(),
        key=lambda r: r["turn_idx"],
    )
    assert [r["n_distinct_tools"] for r in out] == [0, 1, 1, 2, 2]


def test_transition_latency_census_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.windows import transition_latency_census

    # one user: a@0s → b@10s → a@25s → b@40s
    secs = [0, 10, 25, 40]
    types = ["a", "b", "a", "b"]
    t = pa.table(
        {
            "user_id": pa.array([1] * 4, pa.int64()),
            "event_id": pa.array(list(range(4)), pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "ts": pa.array(
                [np.datetime64("2024-01-01T00:00:00", "us") + np.timedelta64(s, "s")
                 for s in secs],
                pa.timestamp("us"),
            ),
        }
    )
    out = {
        (r["from_type"], r["to_type"]): r
        for r in transition_latency_census(
            ray.data.from_arrow(t).repartition(3)
        ).take_all()
    }
    ab = out[("a", "b")]
    assert ab["n"] == 2
    assert ab["gap_us_sum"] == 25_000_000
    assert ab["gap_us_min"] == 10_000_000 and ab["gap_us_max"] == 15_000_000
    ba = out[("b", "a")]
    assert ba["n"] == 1 and ba["gap_us_sum"] == 15_000_000


def test_window_corrections_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.windows import window_corrections

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # arrival order (event_id) deliberately disagrees with event time:
    #   e0 @ 00:00:30  -> window 00:00, watermark empty, on time
    #   e1 @ 02:00:00  -> window 02:00, on time (advances hwm to 02:00)
    #   e2 @ 00:05:10  -> window 00:05 closed at 00:06; wm = 02:00-30m =
    #                     01:30 > 00:06 -> CORRECTION
    #   e3 @ 01:45:00  -> window 01:45 closes 01:46; wm still 01:30 -> on time
    secs = [30, 7200, 310, 6300]
    t = pa.table(
        {
            "user_id": pa.array([7] * 4, pa.int64()),
            "event_id": pa.array(list(range(4)), pa.int64()),
            "ts": pa.array(
                [base + np.timedelta64(s, "s") for s in secs], pa.timestamp("us")
            ),
        }
    )
    out = {
        (r["window_start"].isoformat()[11:16]): r
        for r in window_corrections(
            ray.data.from_arrow(t).repartition(2), lateness_s=1800
        ).take_all()
    }
    assert out["00:00"]["n"] == 1 and out["00:00"]["n_corrections"] == 0
    assert out["02:00"]["n"] == 1 and out["02:00"]["n_corrections"] == 0
    assert out["00:05"]["n"] == 1 and out["00:05"]["n_corrections"] == 1
    assert out["01:45"]["n"] == 1 and out["01:45"]["n_corrections"] == 0


def test_arrival_disorder_census_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.windows import arrival_disorder_census

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # user 1 arrival order: t=100s, 50s (back 50s), 200s, 190s (back 10s)
    # user 2: fully ordered
    secs = [100, 50, 200, 190, 10, 20]
    users = [1, 1, 1, 1, 2, 2]
    t = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "event_id": pa.array(list(range(6)), pa.int64()),
            "ts": pa.array(
                [base + np.timedelta64(s, "s") for s in secs], pa.timestamp("us")
            ),
        }
    )
    out = {
        r["user_id"]: r
        for r in arrival_disorder_census(
            ray.data.from_arrow(t).repartition(2)
        ).take_all()
    }
    assert out[1]["n_events"] == 4 and out[1]["n_inversions"] == 2
    assert out[1]["max_backstep_us"] == 50_000_000
    assert out[2]["n_events"] == 2 and out[2]["n_inversions"] == 0
    assert out[2]["max_backstep_us"] == 0


def test_response_latency_hand_case(ray_session):
    """Each from-turn pairs with the FIRST later to-turn; unmatched
    from-turns drop; conversations without a transition emit nothing."""
    import ray.data

    from pyreshaper_ray.stages.windows import response_latency

    us = 1_000_000
    t = pa.table(
        {
            "conv_id": pa.array(["c1"] * 5 + ["c2"] * 2, pa.string()),
            "turn_idx": pa.array([0, 1, 2, 3, 4, 0, 1], pa.int32()),
            "role": pa.array(
                ["user", "user", "assistant", "user", "assistant",
                 "user", "user"]
            ),
            "ts": pa.array(
                np.array(
                    [0, 1 * us, 3 * us, 4 * us, 10 * us, 0, us],
                    np.int64,
                ),
                pa.timestamp("us"),
            ),
        }
    )
    rows = {r["conv_id"]: r for r in response_latency(
        ray.data.from_arrow(t)).take_all()}
    # c1: user@0 -> asst@3s (3s), user@1s -> asst@3s (2s), user@4s -> asst@10s (6s)
    assert rows["c1"]["n_responses"] == 3
    assert rows["c1"]["sum_latency_us"] == (3 + 2 + 6) * us
    assert rows["c1"]["max_latency_us"] == 6 * us
    assert "c2" not in rows  # no assistant turn at all


def test_shape_census_counts_and_ties(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import shape_census

    rows = [  # three convs share u,a; one is u,a,tool; tie order by shape
        ("c1", 0, "user"), ("c1", 1, "assistant"),
        ("c2", 0, "user"), ("c2", 1, "assistant"),
        ("c3", 1, "assistant"), ("c3", 0, "user"),  # out-of-order arrival
        ("c4", 0, "user"), ("c4", 1, "assistant"), ("c4", 2, "tool"),
    ]
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
    })
    out = shape_census(ray.data.from_arrow(t).repartition(3)).to_pandas()
    got = list(zip(out["shape"], out["n_convs"]))
    assert got == [("user,assistant", 3), ("user,assistant,tool", 1)]


def test_interval_coverage_hand_case(ray_session):
    """Overlap merges, exact adjacency merges (half-open), gaps split."""
    import ray.data

    from pyreshaper_ray.stages.windows import interval_coverage

    us = 1_000_000
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        # user 1: spans [0,300) [100,400) [400,700) merge into [0,700);
        # then [10000,10300) is its own island. user 2: one span.
        "ts": pa.array([0, 100 * us, 400 * us, 10_000 * us, 5 * us]).cast(
            pa.timestamp("us")
        ),
    })
    out = (
        interval_coverage(ray.data.from_arrow(t).repartition(2), pad_s=300)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.loc[1, "n_spans"] == 2
    assert out.loc[1, "covered_us"] == (700 + 300) * us
    assert out.loc[2, "n_spans"] == 1
    assert out.loc[2, "covered_us"] == 300 * us


def test_linear_attribution_hand_case(ray_session):
    """Conv with 2 touches splits 500000/500000; a touch shared by two
    convs accumulates; out-of-horizon and after-conv touches excluded."""
    import ray.data

    from pyreshaper_ray.stages.windows import linear_attribution

    us = 1_000_000
    rows = [
        # (event_id, user, type, ts_s)
        (1, 1, "click", 0),
        (2, 1, "click", 10),
        (3, 1, "purchase", 20),      # touches {1,2}: 500000 each
        (4, 1, "click", 30),
        (5, 1, "purchase", 40),      # touches {1,2,4}: 333333 each
        (6, 1, "click", 50),         # after all convs: no credit
        (7, 2, "click", 0),
        (8, 2, "purchase", 700 + 0), # 700s > horizon 600 -> no credit
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array(
            np.array([r[3] * us for r in rows], dtype=np.int64)
        ).cast(pa.timestamp("us")),
    })
    out = linear_attribution(
        ray.data.from_arrow(t).repartition(3), horizon_s=600
    ).to_pandas().set_index("touch_event_id")
    assert out.index.tolist() == [1, 2, 4]
    assert out.loc[1, "credit_ppm"] == 500_000 + 333_333
    assert out.loc[1, "n_convs"] == 2
    assert out.loc[4, "credit_ppm"] == 333_333
    assert 6 not in out.index and 7 not in out.index


def test_markov_backtest_hand_case(ray_session):
    """Stream a,b,a,b,a for one user: from a the argmax successor is b
    (2 of 2 correct); from b it is a (2 of 2)."""
    import ray.data

    from pyreshaper_ray.stages.windows import markov_backtest

    us = 1_000_000
    et = ["a", "b", "a", "b", "a"]
    t = pa.table({
        "user_id": pa.array([1] * 5, pa.int64()),
        "event_id": pa.array(list(range(5)), pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "ts": pa.array(
            np.arange(5, dtype=np.int64) * us
        ).cast(pa.timestamp("us")),
    })
    out = (
        markov_backtest(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("from_type")
    )
    assert out.loc["a", "predicted"] == "b"
    assert out.loc["a", "n_pairs"] == 2 and out.loc["a", "n_correct"] == 2
    assert out.loc["b", "accuracy_ppm"] == 1_000_000


def test_markov_backtest_tie_breaks_lexicographic(ray_session):
    """From 'x' successors split 1/1 between 'a' and 'b' -> predict 'a'."""
    import ray.data

    from pyreshaper_ray.stages.windows import markov_backtest

    us = 1_000_000
    et = ["x", "b", "x", "a"]
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "ts": pa.array(np.arange(4, dtype=np.int64) * us).cast(
            pa.timestamp("us")
        ),
    })
    out = (
        markov_backtest(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("from_type")
    )
    assert out.loc["x", "predicted"] == "a"
    assert out.loc["x", "n_correct"] == 1  # only the x->a pair matches


def test_skipgram_transitions_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import skipgram_transitions

    def ev(rows):
        return pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array(
                    [np.datetime64(r[3], "us") for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )

    # user 1 sequence a,b,a (ts order); user 2 sequence b alone (no pairs)
    ds = ray.data.from_arrow(
        ev(
            [
                (1, 1, "a", "2024-01-01T00:00:00"),
                (2, 1, "b", "2024-01-01T00:01:00"),
                (3, 1, "a", "2024-01-01T00:02:00"),
                (4, 2, "b", "2024-01-01T00:00:30"),
            ]
        )
    ).repartition(2)
    out = skipgram_transitions(ds, max_gap=3).to_pandas()
    got = {
        (r.from_type, r.to_type, r.gap): r.n for r in out.itertuples()
    }
    # gap 1: a->b, b->a; gap 2: a->a; nothing at gap 3
    assert got == {("a", "b", 1): 1, ("b", "a", 1): 1, ("a", "a", 2): 1}


def test_session_overlap_pairs_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import session_overlap_pairs

    def ev(rows):
        return pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [np.datetime64(r[1], "us") for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )

    # user 1: one session 10:00-10:40 (two events, gap 40m > 30m would
    # split — use 20m so it's ONE session); user 2: session 10:30-10:35
    # overlaps user 1's; user 3: session 12:00 alone (no overlap);
    # user 1 second session 13:00 (gap > 30m) -> 4 sessions, 1 pair
    rows = [
        (1, "2024-01-01T10:00:00"),
        (1, "2024-01-01T10:20:00"),
        (2, "2024-01-01T10:30:00"),
        (2, "2024-01-01T10:35:00"),
        (3, "2024-01-01T12:00:00"),
        (1, "2024-01-01T13:00:00"),
    ]
    out = session_overlap_pairs(
        ray.data.from_arrow(ev(rows)).repartition(2)
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n_sessions"] == 4
    # only (u1 s0 [10:00,10:20], u2 s0 [10:30,10:35])? 10:30 > 10:20 ->
    # NO overlap... u1's session END is its last event 10:20; u2 starts
    # 10:30 -> disjoint. Expect 0 pairs then.
    assert out.iloc[0]["n_overlap_pairs"] == 0


def test_session_overlap_pairs_counts_true_overlap(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import session_overlap_pairs

    def ev(rows):
        return pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [np.datetime64(r[1], "us") for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )

    # three sessions: u1 [10:00,11:00], u2 [10:30,10:45], u3 [10:50,10:55]
    # pairs: (u1,u2), (u1,u3) overlap; (u2,u3) disjoint (10:45 < 10:50)
    rows = [
        (1, "2024-01-01T10:00:00"),
        (1, "2024-01-01T10:25:00"),
        (1, "2024-01-01T10:50:00"),
        (1, "2024-01-01T11:00:00"),
        (2, "2024-01-01T10:30:00"),
        (2, "2024-01-01T10:45:00"),
        (3, "2024-01-01T10:50:00"),
        (3, "2024-01-01T10:55:00"),
    ]
    out = session_overlap_pairs(
        ray.data.from_arrow(ev(rows)).repartition(3)
    ).to_pandas()
    assert out.iloc[0]["n_sessions"] == 3
    assert out.iloc[0]["n_overlap_pairs"] == 2


def test_nearest_event_join_ties(ray_session):
    """Tie semantics: equal |dt| prefers the EARLIER right ts; duplicate
    right ts resolve to the lowest event_id; users without right events
    drop out."""
    import ray.data

    from pyreshaper_ray.stages.windows import nearest_event_join

    US = 1_000_000
    rows = [
        # user 1: purchase at t=10s; clicks at 5s and 15s -> tie -> 5s (id 100)
        (1, 1, "purchase", 10),
        (100, 1, "click", 5),
        (101, 1, "click", 15),
        # user 2: purchase at 10s; two clicks both at 8s (ids 201, 200)
        (2, 2, "purchase", 10),
        (201, 2, "click", 8),
        (200, 2, "click", 8),
        # user 3: purchase, no clicks -> dropped
        (3, 3, "purchase", 10),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array(
                np.array([r[3] * US for r in rows], np.int64), pa.timestamp("us")
            ),
        }
    )
    out = (
        nearest_event_join(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2]
    assert out.loc[1, "nn_event_id"] == 100 and out.loc[1, "dt_abs_us"] == 5 * US
    assert out.loc[2, "nn_event_id"] == 200 and out.loc[2, "dt_abs_us"] == 2 * US


def test_adjacent_role_pairs_hand(ray_session):
    """Pairs fire only on IMMEDIATE adjacency in (ts, turn_idx) order."""
    import ray.data

    from pyreshaper_ray.stages.windows import adjacent_role_pairs

    US = 1_000_000
    rows = [  # conv a: click(1) -> purchase(2) adjacent; then view breaks one
        ("a", 1, "click", "xx", 1),
        ("a", 2, "purchase", "yyy", 2),
        ("a", 3, "click", "z", 3),
        ("a", 4, "view", "q", 4),
        ("a", 5, "purchase", "r", 5),
        ("b", 1, "click", "mm", 1),  # conv b: click with no successor
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array(["" for _ in rows], pa.string()),
            "ts": pa.array(
                np.array([r[4] * US for r in rows], np.int64), pa.timestamp("us")
            ),
        }
    )
    out = adjacent_role_pairs(ray.data.from_arrow(t).repartition(2)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.conv_id, r.a_turn_idx, r.b_turn_idx, r.a_chars, r.b_chars) == (
        "a", 1, 2, 2, 3,
    )


def test_first_touch_attribution_hand(ray_session):
    """Earliest in-horizon touch wins; ties at the same ts credit the
    lowest event_id; out-of-horizon touches are invisible."""
    import ray.data

    from pyreshaper_ray.stages.windows import first_touch_attribution

    US = 1_000_000
    H = 100  # horizon seconds for the test
    rows = [
        # user 1: clicks at 5s (ids 11, 10 same ts), 20s; purchase 30s
        #  -> first in-horizon touch = ts 5s, lowest id 10
        (11, 1, "click", 5),
        (10, 1, "click", 5),
        (12, 1, "click", 20),
        (1, 1, "purchase", 30),
        # user 2: click far before horizon; purchase -> unattributed
        (20, 2, "click", 10),
        (2, 2, "purchase", 10 + H + 50),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array(
                np.array([r[3] * US for r in rows], np.int64), pa.timestamp("us")
            ),
        }
    )
    out = first_touch_attribution(
        ray.data.from_arrow(t).repartition(2), horizon_s=H
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.conv_event_id, r.touch_event_id, r.lead_us) == (1, 10, 25 * US)


def test_session_count_histogram_hand(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import session_count_histogram

    US = 1_000_000
    rows = [  # user 1: 2 sessions (gap 1h); users 2,3: 1 session each
        (1, 1, 0), (2, 1, 60), (3, 1, 3660),
        (4, 2, 0),
        (5, 3, 0), (6, 3, 100),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[2] * US for r in rows], np.int64), pa.timestamp("us")
            ),
        }
    )
    out = (
        session_count_histogram(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .set_index("n_sessions")["n_users"]
        .to_dict()
    )
    assert out == {1: 2, 2: 1}
