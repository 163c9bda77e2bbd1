"""Timeseries operators (stages/timeseries.py): OHLC combiner merge
semantics, time-weighted integers, and LTTB downsampling properties."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _events(rows):
    """rows: (event_id, user_id, ts_str, value)"""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                [np.datetime64(r[2], "us") for r in rows], pa.timestamp("us")
            ),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
        }
    )


def test_ohlc_open_close_tie_breaks(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import ohlc_bars

    # window 10:00: two events at the SAME opening timestamp (tie broken by
    # event_id) and a same-ts tie at the close
    ev = _events(
        [
            (5, 1, "2024-01-01T10:00:01", 3.00),   # open ts tie, higher id
            (2, 1, "2024-01-01T10:00:01", 7.00),   # open = 700 (lower id)
            (3, 1, "2024-01-01T10:00:30", 1.00),   # low
            (9, 1, "2024-01-01T10:00:59", 4.00),   # close = 400 (higher id)
            (8, 1, "2024-01-01T10:00:59", 9.00),   # high
            (1, 1, "2024-01-01T10:01:05", 5.00),   # next window
        ]
    )
    # split across blocks so the combiner merge path is exercised
    ds = ray.data.from_arrow(ev).repartition(3)
    out = {r["window_start"]: r for r in ohlc_bars(ds).take_all()}
    w = np.datetime64("2024-01-01T10:00:00", "us").item()
    bar = out[w]
    assert bar["open_cents"] == 700
    assert bar["close_cents"] == 400
    assert bar["high_cents"] == 900
    assert bar["low_cents"] == 100
    assert bar["n_events"] == 5
    w2 = np.datetime64("2024-01-01T10:01:00", "us").item()
    assert out[w2]["open_cents"] == out[w2]["close_cents"] == 500


def test_time_weighted_value_integers(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import time_weighted_value

    ev = _events(
        [
            (1, 1, "2024-01-01T00:00:00", 2.00),  # holds 10 s at 200c
            (2, 1, "2024-01-01T00:00:10", 4.00),  # holds 5 s at 400c
            (3, 1, "2024-01-01T00:00:15", 1.00),  # last: no interval
            (4, 2, "2024-01-01T00:00:00", 9.99),  # single event: no row
        ]
    )
    out = time_weighted_value(ray.data.from_arrow(ev).repartition(2)).take_all()
    rows = {r["user_id"]: r for r in out}
    assert set(rows) == {1}
    assert rows[1]["num_cents_s"] == 200 * 10 + 400 * 5
    assert rows[1]["den_s"] == 15


def test_lttb_properties(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import lttb_downsample, lttb_select

    # kernel properties on a synthetic series with one extreme spike
    rng = np.random.default_rng(3)
    x = np.arange(100, dtype=np.int64) * 1_000_000
    y = rng.integers(0, 50, size=100).astype(np.int64)
    y[37] = 10_000  # the spike LTTB must keep
    sel = lttb_select(x, y, 10)
    assert len(sel) == 10
    assert sel[0] == 0 and sel[-1] == 99
    assert (np.diff(sel) > 0).all()  # strictly increasing → points ⊆ input
    assert 37 in sel
    assert np.array_equal(sel, lttb_select(x, y, 10))  # deterministic
    # short series pass through unchanged
    assert np.array_equal(lttb_select(x[:4], y[:4], 10), np.arange(4))

    # end-to-end per-user via Ray
    rows = [(i, 1, f"2024-01-01T00:{i // 60:02d}:{i % 60:02d}", float(i % 7)) for i in range(40)]
    rows += [(100 + i, 2, f"2024-01-01T01:00:{i:02d}", 1.0) for i in range(3)]
    out = lttb_downsample(
        ray.data.from_arrow(_events(rows)).repartition(2), n_out=6
    ).take_all()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 6
    assert len(by_user[2]) == 3  # shorter than n_out → all points kept
    pts = sorted(by_user[1], key=lambda r: r["point_idx"])
    assert pts[0]["ts"] == np.datetime64("2024-01-01T00:00:00", "us").item()
    assert pts[-1]["ts"] == np.datetime64("2024-01-01T00:00:39", "us").item()


def _transcripts(rows):
    """rows: (conv_id, turn_idx, role, ts_str)"""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array(
                [np.datetime64(r[3], "us") for r in rows], pa.timestamp("us")
            ),
        }
    )


def test_acf_minute_counts_hand_computed(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import acf_minute_counts

    # minutes 0..4 with counts [2, 0, 1, 0, 3] (minute 1 and 3 are EMPTY —
    # the dense grid must zero-fill them)
    rows = (
        [("c1", i, "user", "2024-01-01T10:00:05") for i in range(2)]
        + [("c1", 10, "user", "2024-01-01T10:02:30")]
        + [("c2", i, "user", "2024-01-01T10:04:01") for i in range(3)]
    )
    out = acf_minute_counts(
        ray.data.from_arrow(_transcripts(rows)).repartition(3), lags=(1, 2)
    )
    d = {r["lag"]: r for r in out.to_pylist()}
    # series [2,0,1,0,3]; lag1 pairs x=[2,0,1,0] y=[0,1,0,3]
    assert d[1]["n"] == 4
    assert d[1]["sum_x"] == 3 and d[1]["sum_y"] == 4
    assert d[1]["sum_xy"] == 0  # 2*0 + 0*1 + 1*0 + 0*3
    assert d[1]["sum_x2"] == 5 and d[1]["sum_y2"] == 10
    # lag2 pairs x=[2,0,1] y=[1,0,3]
    assert d[2]["n"] == 3
    assert d[2]["sum_xy"] == 5  # 2*1 + 0 + 1*3
    # lag longer than the series → empty components
    out2 = acf_minute_counts(
        ray.data.from_arrow(_transcripts(rows[:1])), lags=(1,)
    ).to_pylist()
    assert out2[0]["n"] == 0 and out2[0]["sum_xy"] == 0


def test_hour_dod_delta_hand_computed(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import hour_dod_delta

    # day1 10:00 → 2 turns, day1 11:00 → 1; day2 10:00 → 5 (delta +3 vs
    # day1 10:00); day2 09:00 has no day-1 partner → not emitted
    rows = (
        [("a", i, "user", "2024-01-01T10:15:00") for i in range(2)]
        + [("a", 9, "user", "2024-01-01T11:30:00")]
        + [("b", i, "user", "2024-01-02T10:45:00") for i in range(5)]
        + [("b", 10, "user", "2024-01-02T09:00:00")]
    )
    out = hour_dod_delta(ray.data.from_arrow(_transcripts(rows)).repartition(2))
    got = {r["hour"]: r for r in out.to_pylist()}
    assert len(got) == 1
    k = np.datetime64("2024-01-02T10:00:00", "us").item()
    assert got[k]["n"] == 5 and got[k]["prev_n"] == 2 and got[k]["delta"] == 3

    # empty input → empty typed table
    empty = hour_dod_delta(
        ray.data.from_arrow(_transcripts([("z", 0, "user", "2024-01-01T00:00:00")]).slice(0, 0))
    )
    assert empty.num_rows == 0


def test_counter_increase_hand_computed(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import counter_increase_per_user

    # user 1 series: 1.00 → 3.00 (+200) → 0.50 (reset, +50) → 2.50 (+200)
    rows = [
        (1, 1, "2024-01-01T00:00:00", 1.00),
        (2, 1, "2024-01-01T01:00:00", 3.00),
        (3, 1, "2024-01-01T02:00:00", 0.50),
        (4, 1, "2024-01-01T03:00:00", 2.50),
        (5, 2, "2024-01-01T00:00:00", 9.00),   # single sample → 0
    ]
    out = {
        r["user_id"]: r
        for r in counter_increase_per_user(
            ray.data.from_arrow(_events(rows)).repartition(3)
        ).take_all()
    }
    assert out[1]["increase_cents"] == 450 and out[1]["n_resets"] == 1
    assert out[2]["increase_cents"] == 0 and out[2]["n_resets"] == 0


def test_gap_survival_census_hand_computed(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import gap_survival_census

    # user 1 gaps: 90s, 2h; user 2 gap: 30s → thresholds:
    #   >=1m: 2 (90s, 2h); >=5m: 1; >=1h: 1; >=1d: 0; n_gaps = 3
    rows = [
        (1, 1, "2024-01-01T00:00:00", 0),
        (2, 1, "2024-01-01T00:01:30", 0),
        (3, 1, "2024-01-01T02:01:30", 0),
        (4, 2, "2024-01-01T00:00:00", 0),
        (5, 2, "2024-01-01T00:00:30", 0),
    ]
    out = {
        r["threshold"]: r
        for r in gap_survival_census(
            ray.data.from_arrow(_events(rows)).repartition(2)
        ).to_pylist()
    }
    assert all(out[k]["n_gaps"] == 3 for k in out)
    assert out["1m"]["n_ge"] == 2
    assert out["5m"]["n_ge"] == 1
    assert out["1h"]["n_ge"] == 1
    assert out["1d"]["n_ge"] == 0


def test_paa_segments_ntile_allocation(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.timeseries import paa_segments

    # 6 rows, k=4 → NTILE sizes 2,2,1,1; values 1..6 dollars in ts order
    t = pa.table(
        {
            "user_id": pa.array([7] * 6, pa.int64()),
            "event_id": pa.array(list(range(6)), pa.int64()),
            "ts": pa.array(
                [np.datetime64("2024-01-01T00:00:00", "us") + np.timedelta64(i, "m")
                 for i in range(6)],
                pa.timestamp("us"),
            ),
            "value": pa.array([float(i + 1) for i in range(6)], pa.float64()),
        }
    )
    out = {
        r["seg_idx"]: r
        for r in paa_segments(ray.data.from_arrow(t).repartition(3), 4).take_all()
    }
    assert out[1]["n"] == 2 and out[1]["cents_sum"] == 300   # 1+2
    assert out[2]["n"] == 2 and out[2]["cents_sum"] == 700   # 3+4
    assert out[3]["n"] == 1 and out[3]["cents_sum"] == 500
    assert out[4]["n"] == 1 and out[4]["cents_sum"] == 600


def test_hourly_seasonality_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.timeseries import hourly_seasonality

    rows = [("a", 10)] * 3 + [("a", 11)] + [("b", 10)] * 2
    t = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array(
                [np.datetime64(f"2024-01-01T{r[1]:02d}:00:00", "us") for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    out = {
        (r["event_type"], r["hour"]): r
        for r in hourly_seasonality(ray.data.from_arrow(t).repartition(3)).take_all()
    }
    assert out[("a", 10)]["n"] == 3
    assert out[("a", 10)]["share_ppm"] == 3 * 1_000_000 // 4
    assert out[("a", 11)]["share_ppm"] == 1_000_000 // 4
    assert out[("b", 10)]["share_ppm"] == 1_000_000


def test_retention_policy_census_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.timeseries import retention_policy_census

    base = np.datetime64("2024-03-31T12:00:00", "us")
    # conv A: minutes at now, now-3d, now-10d; conv B: one minute at now-100d
    offs_days = [0, 3, 10, 100]
    convs = ["a", "a", "a", "b"]
    t = pa.table(
        {
            "conv_id": pa.array(convs, pa.string()),
            "ts": pa.array(
                [base - np.timedelta64(d * 86400, "s") for d in offs_days],
                pa.timestamp("us"),
            ),
        }
    )
    out = retention_policy_census(ray.data.from_arrow(t).repartition(2))
    rows = {
        out["tier"][i].as_py(): (
            out["horizon_days"][i].as_py(),
            out["n_keep"][i].as_py(),
            out["n_drop"][i].as_py(),
        )
        for i in range(out.num_rows)
    }
    # 1m tier: 4 windows; keep those within 7d of now -> now, now-3d
    assert rows["1m"] == (7, 2, 2)
    # 1h tier: 4 windows; within 90d -> all but now-100d
    assert rows["1h"] == (90, 3, 1)
    # 1d tier: unbounded -> keep all 4
    assert rows["1d"] == (0, 4, 0)


def test_lead_lag_daily_xcorr_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.timeseries import lead_lag_daily_xcorr

    base = np.datetime64("2024-01-10T00:00:00", "us")
    # clicks: day0 x2, day1 x3; purchases: day1 x5, day2 x7
    rows = [("click", 0), ("click", 0), ("click", 1), ("click", 1), ("click", 1),
            ("purchase", 1)] + [("purchase", 1)] * 4 + [("purchase", 2)] * 7
    t = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array(
                [base + np.timedelta64(r[1] * 86400, "s") for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    out = lead_lag_daily_xcorr(
        ray.data.from_arrow(t).repartition(2), max_lag_days=1
    )
    d = {out["lag_days"][i].as_py(): i for i in range(out.num_rows)}
    # lag 0: overlap day1 only -> xy = 3*5
    i = d[0]
    assert out["n_days"][i].as_py() == 1 and out["sum_xy"][i].as_py() == 15
    # lag +1 (y trails x): pairs (d0,d1): 2*5, (d1,d2): 3*7 -> 31
    i = d[1]
    assert out["n_days"][i].as_py() == 2 and out["sum_xy"][i].as_py() == 10 + 21
    assert out["sum_x"][i].as_py() == 5 and out["sum_y"][i].as_py() == 12
    # lag -1: pairs (d1,d0)? y at d0 absent; (d2,d1): x at d2 absent -> 0
    i = d[-1]
    assert out["n_days"][i].as_py() == 0 and out["sum_xy"][i].as_py() == 0


def test_haar_matches_numpy_reference(ray_session):
    """The distributed minute grid feeds a driver Haar transform; verify
    the full coefficient set against a direct numpy pyramid, and the
    top coefficient equals the grid total."""
    import ray.data

    from pyreshaper_ray.sources.adapters import read_events_as_transcripts
    from pyreshaper_ray.stages.timeseries import (
        _minute_counts_dense,
        haar_minute_counts,
    )

    sf = "/root/testdata/sf0.001"
    out = haar_minute_counts(read_events_as_transcripts(sf))
    dense = _minute_counts_dense(read_events_as_transcripts(sf))[:1024]
    n = 1
    while n < max(len(dense), 1):
        n *= 2
    x = np.zeros(n, np.int64)
    x[: len(dense)] = dense
    want = {}
    cur, level = x, 0
    while len(cur) > 1:
        a, b = cur[0::2], cur[1::2]
        for i, d in enumerate(a - b):
            want[(level, i)] = int(d)
        cur = a + b
        level += 1
    want[(level, 0)] = int(cur[0])
    got = {
        (l, i): c
        for l, i, c in zip(
            out["level"].to_pylist(), out["idx"].to_pylist(),
            out["coeff"].to_pylist()
        )
    }
    assert got == want
    assert got[(level, 0)] == int(x.sum())


def test_resample_uniform_lerp_and_single_point(ray_session):
    """Hand case: conv a (0us,1)→(10us,10)→(20us,0) on an 8-point grid;
    floor-division lerp incl. the negative slope; single-point conv b
    excluded; grid endpoints hit the exact first/last samples."""
    import ray.data

    from pyreshaper_ray.stages.timeseries import resample_uniform

    t = pa.table({
        "conv_id": pa.array(["a", "a", "a", "b"]),
        "turn_idx": pa.array([0, 1, 2, 0], pa.int32()),
        "ts": pa.array(np.array([0, 10, 20, 5], np.int64), pa.timestamp("us")),
        "char_len": pa.array([1, 10, 0, 2], pa.int32()),
    })
    out = resample_uniform(ray.data.from_arrow(t).repartition(2)).to_pandas()
    out = out.sort_values(["conv_id", "j"]).reset_index(drop=True)
    assert set(out["conv_id"]) == {"a"}
    assert list(out["value"]) == [1, 2, 5, 8, 9, 6, 3, 0]
    assert list(out["grid_ts"].astype("int64")) == [0, 2, 5, 8, 11, 14, 17, 20]


def test_seasonal_naive_error_hand_case(ray_session):
    """Type x: days 0..8 with counts 1..9 → 2 scored days (7 and 8):
    |8-1| + |9-2| = 14 total, max 7. Type y spans < 7 days → no rows."""
    import ray.data

    from pyreshaper_ray.stages.timeseries import seasonal_naive_error

    days, types, reps = [], [], []
    for d in range(9):
        days += [d]
        types += ["x"]
        reps += [d + 1]
    for d in range(3):
        days += [d]
        types += ["y"]
        reps += [2]
    ts, et = [], []
    for d, t, r in zip(days, types, reps):
        ts += [d * 86_400_000_000 + i for i in range(r)]
        et += [t] * r
    tab = pa.table({
        "ts": pa.array(np.array(ts, np.int64), pa.timestamp("us")),
        "event_type": pa.array(et),
    })
    out = seasonal_naive_error(
        ray.data.from_arrow(tab).repartition(3), season_days=7
    ).to_pandas()
    assert list(out["event_type"]) == ["x"]
    assert int(out["n_days"][0]) == 2
    assert int(out["total_abs_err"][0]) == 14
    assert int(out["max_abs_err"][0]) == 7
    assert int(out["total_actual"][0]) == 17
    assert int(out["total_forecast"][0]) == 3


def test_seasonal_naive_error_no_cross_type_bleed(ray_session):
    """A type-y cell exactly 7 days before a type-x cell must NOT serve as
    x's forecast (the composite-key gap guard)."""
    import ray.data

    from pyreshaper_ray.stages.timeseries import seasonal_naive_error

    tab = pa.table({
        "ts": pa.array(
            np.array([0, 7 * 86_400_000_000], np.int64), pa.timestamp("us")
        ),
        "event_type": pa.array(["y", "x"]),
    })
    out = seasonal_naive_error(ray.data.from_arrow(tab), season_days=7)
    assert out.num_rows == 0


def test_daily_type_entropy_exact(ray_session):
    """Uniform 2-type day → ln(2) micro-nats; single-type day → 0; the
    integer quantization matches the direct formula."""
    import ray.data

    from pyreshaper_ray.stages.timeseries import daily_type_entropy

    D = 86_400_000_000
    tab = pa.table({
        "ts": pa.array(np.array([0, 1, D, D + 1, D + 2, D + 3], np.int64),
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "a", "a", "a", "b"]),
    })
    out = (
        daily_type_entropy(ray.data.from_arrow(tab).repartition(2))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert list(out["n_events"]) == [2, 4]
    assert list(out["n_types"]) == [2, 2]
    # day 0: uniform over 2 types → exactly L(2) = round(ln(2)*1e6)
    L = lambda n: int(np.floor(np.log(n) * 1e6 + 0.5))
    assert int(out["entropy_micro_nats"][0]) == L(2)
    # day 1: 3×a + 1×b → (3*(L(4)-L(3)) + 1*(L(4)-L(1))) // 4
    assert int(out["entropy_micro_nats"][1]) == (3 * (L(4) - L(3)) + L(4)) // 4


def test_seasonal_decompose_hand_case(ray_session):
    """Flat series + one spike: trend smears the spike over the window,
    seasonal picks up the residual at the spike's hour-of-day."""
    import ray.data

    from pyreshaper_ray.stages.timeseries import seasonal_decompose_hourly

    us_h = 3_600_000_000
    # 49 hours, 1 event each, except hour 24 has 26 events (25 extra)
    ts = []
    for h in range(49):
        reps = 26 if h == 24 else 1
        ts.extend([h * us_h] * reps)
    t = pa.table({
        "ts": pa.array(np.array(ts, dtype=np.int64)).cast(pa.timestamp("us")),
    })
    out = seasonal_decompose_hourly(
        ray.data.from_arrow(t).repartition(3), window=25
    ).to_pandas().set_index("hod")
    # centers are hours 12..36 -> hods 12..23, 0..12 (hod 12 twice)
    # trend at every center = (24*1 + 26) // 25 = 2
    # detrended: -1 everywhere except center 24 (hod 0): 26 - 2 = 24
    assert out.loc[0, "n_obs"] == 1  # only hour 24 maps to hod 0 as a center
    assert out.loc[0, "seasonal"] == 24
    assert out.loc[5, "seasonal"] == -1
    assert out.loc[12, "n_obs"] == 2
    # trunc toward zero: (-1 + -1) // 2 = -1
    assert out.loc[12, "seasonal"] == -1


def test_seasonal_decompose_short_series_empty(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import seasonal_decompose_hourly

    t = pa.table({
        "ts": pa.array(np.array([0, 3_600_000_000], dtype=np.int64)).cast(
            pa.timestamp("us")
        ),
    })
    out = seasonal_decompose_hourly(ray.data.from_arrow(t), window=25)
    assert out.num_rows == 0


def test_changepoint_daily_planted_shift(ray_session):
    """10 days at 5/day then 10 days at 50/day: the split lands exactly at
    the level shift."""
    import ray.data

    from pyreshaper_ray.stages.timeseries import changepoint_daily

    day_us = 86_400_000_000
    ts = []
    for d in range(20):
        reps = 5 if d < 10 else 50
        ts.extend([d * day_us + i for i in range(reps)])
    t = pa.table({
        "ts": pa.array(np.array(ts, dtype=np.int64)).cast(pa.timestamp("us")),
    })
    out = changepoint_daily(ray.data.from_arrow(t).repartition(4)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["split_day"] == np.datetime64(10 * day_us, "us")
    assert (r["n_left"], r["n_right"]) == (10, 10)
    assert (r["sum_left"], r["sum_right"]) == (50, 500)


def test_changepoint_daily_single_day_empty(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import changepoint_daily

    t = pa.table({
        "ts": pa.array(np.array([1, 2, 3], dtype=np.int64)).cast(
            pa.timestamp("us")
        ),
    })
    assert changepoint_daily(ray.data.from_arrow(t)).num_rows == 0


def test_holt_winters_daily_planted(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import _tdiv, holt_winters_daily

    # truncating division matches DuckDB BIGINT '//' (toward zero)
    assert _tdiv(-7, 5) == -1 and _tdiv(7, 5) == 1 and _tdiv(-10, 5) == -2

    # 15 days, one event per (day, count): declining series with a GAP day
    # (day 9 missing -> densified to 0) so negative deviations exercise the
    # truncation branches
    base = np.datetime64("2024-03-01T00:00:00", "us")
    days, counts = [], []
    for d, c in enumerate([9, 8, 7, 9, 8, 7, 9, 5, 4, 0, 3, 2, 6, 1, 2]):
        if c == 0:
            continue  # leave a hole in the spine
        for _ in range(c):
            days.append(base + np.timedelta64(d, "D").astype("timedelta64[us]"))
            counts.append(1)
    t = pa.table(
        {
            "event_type": pa.array(["click"] * len(days), pa.string()),
            "ts": pa.array(days, pa.timestamp("us")),
        }
    )
    out = holt_winters_daily(
        ray.data.from_arrow(t).repartition(4)
    ).to_pandas()
    # reference recursion in plain ints
    y = [9, 8, 7, 9, 8, 7, 9, 5, 4, 0, 3, 2, 6, 1, 2]
    ym = [v * 1_000_000 for v in y]
    lev = _tdiv(sum(ym[:7]), 7)
    tr = 0
    s = [ym[i] - lev for i in range(7)]
    want = []
    for i in range(7, 15):
        f = lev + tr + s[0]
        err = ym[i] - f
        new_lev = _tdiv(ym[i] - s[0], 5) + _tdiv(4 * (lev + tr), 5)
        new_tr = _tdiv(new_lev - lev, 10) + _tdiv(9 * tr, 10)
        new_s = _tdiv(ym[i] - new_lev, 4) + _tdiv(3 * s[0], 4)
        s = s[1:] + [new_s]
        lev, tr = new_lev, new_tr
        want.append((y[i], f, err, lev, tr))
    assert len(out) == 8
    got = list(
        zip(out["y"], out["forecast_micro"], out["err_micro"],
            out["level_micro"], out["trend_micro"])
    )
    assert got == want
    # the gap day (index 9) was densified to y=0
    assert out["y"].tolist()[2] == 0

    # short series (< period+1 days) emits nothing
    short = holt_winters_daily(
        ray.data.from_arrow(t.slice(0, 20))
    ).to_pandas()
    assert len(short) == 0


def test_kaplan_meier_sessions_planted(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import kaplan_meier_sessions

    base = np.datetime64("2024-05-01T00:00:00", "us")
    M = np.timedelta64(60_000_000, "us")  # one minute

    def ev(user, minutes):
        return [(user, base + int(m) * M) for m in minutes]

    rows = []
    # user 1: session A 0..10 (dur 10, closed), session B 100..103 (dur 3, closed)
    rows += ev(1, [0, 5, 10]) + ev(1, [100, 103])
    # user 2: one 10-minute session, closed
    rows += ev(2, [0, 10])
    # user 3: session ending at the corpus max -> CENSORED (dur 5)
    rows += ev(3, [195, 200])
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    out = kaplan_meier_sessions(ray.data.from_arrow(t).repartition(3))
    got = {r["duration_min"]: r for r in out.to_pylist()}
    # durations: 10 (x2 closed), 3 (closed), 5 (censored)
    # t=3: risk 4, d=1 -> S = 750000
    # t=5: censored only -> no row; risk drops to 2 after
    # t=10: risk 2, d=2 -> S = 0
    assert set(got) == {3, 10}
    assert got[3]["n_risk"] == 4 and got[3]["n_events"] == 1
    assert got[3]["n_censored"] == 0 and got[3]["survival_ppm"] == 750_000
    assert got[10]["n_risk"] == 2 and got[10]["n_events"] == 2
    assert got[10]["survival_ppm"] == 0

    # without censoring support the curve would (wrongly) hit 0 via the
    # censored session too — assert the censored one never counts as death
    assert sum(r["n_events"] for r in got.values()) == 3


def test_dtw_event_type_pairs_vs_reference(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import dtw_event_type_pairs

    # planted: B is A phase-shifted by one day (DTW ~0 inside the band),
    # C is noise — plus a gap day densified to zero
    base = np.datetime64("2024-07-01T00:00:00", "us")
    D = np.timedelta64(86_400_000_000, "us")
    a = [5, 9, 2, 7, 7, 1, 8, 3, 6, 4]
    rows = []
    for d, c in enumerate(a):
        rows += [("A", base + d * D)] * c
        if d >= 1:
            rows += [("B", base + d * D)] * a[d - 1]  # shifted copy
        if d != 4:  # C has a hole on day 4
            rows += [("C", base + d * D)] * ((d * 7) % 5 + 1)
    t = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    out = dtw_event_type_pairs(ray.data.from_arrow(t).repartition(4))
    got = {(r["type_a"], r["type_b"]): (r["n_days"], r["dtw"]) for r in out.to_pylist()}

    # independent full-matrix banded DP (w=1)
    INF = 1 << 62

    def ref_dtw(x, y, w=1):
        n = len(x)
        Dm = [[INF] * n for _ in range(n)]
        for i in range(n):
            for j in range(max(0, i - w), min(n, i + w + 1)):
                c = abs(x[i] - y[j])
                if i == 0 and j == 0:
                    best = 0
                else:
                    cands = []
                    if i > 0 and abs(i - 1 - j) <= w:
                        cands.append(Dm[i - 1][j])
                    if j > 0 and abs(i - (j - 1)) <= w:
                        cands.append(Dm[i][j - 1])
                    if i > 0 and j > 0:
                        cands.append(Dm[i - 1][j - 1])
                    best = min(cands)
                Dm[i][j] = c + best
        return Dm[n - 1][n - 1]

    series = {"A": a, "B": [0] + a[:-1], "C": [(d * 7) % 5 + 1 if d != 4 else 0 for d in range(10)]}
    for (ta, tb), (nd, dtw) in got.items():
        assert nd == 10
        assert dtw == ref_dtw(series[ta], series[tb]), (ta, tb)
    # the one-day shift is absorbed by the band except at the edges
    assert got[("A", "B")][1] <= ref_dtw(series["A"], series["C"])
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}


def test_bollinger_daily_counts_planted_spike(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import bollinger_daily_counts

    # 10 flat days of 1 event, then a 50-event spike day: only the spike
    # day (full window, way past 2 sigma) is flagged; warm-up rows
    # (fewer than 7 predecessors) stay unflagged by contract
    rows = []
    eid = 0
    for d in range(10):
        eid += 1
        rows.append((eid, 1, f"2024-01-{d + 1:02d}T12:00:00", 1.0))
    for i in range(50):
        eid += 1
        rows.append((eid, 1, f"2024-01-11T0{i % 10}:00:0{i % 6}", 1.0))
    ds = ray.data.from_arrow(_events(rows)).repartition(4)
    out = bollinger_daily_counts(ds)
    assert out.num_rows == 11
    n = out["n"].to_pylist()
    flag = out["bollinger_flag"].to_pylist()
    assert n == [1] * 10 + [50]
    assert flag == [0] * 10 + [1]
    # window sums: day 11's trailing 7 days = 6x1 + 50
    assert out["win_sum"].to_pylist()[-1] == 56
    assert out["win_sumsq"].to_pylist()[-1] == 6 + 2500
    # warm-up partial sums still reported (rows-based over present days)
    assert out["win_sum"].to_pylist()[0] == 1


def test_bollinger_daily_counts_empty(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import bollinger_daily_counts

    ds = ray.data.from_arrow(_events([]))
    out = bollinger_daily_counts(ds)
    assert out.num_rows == 0
    assert out.schema.names == [
        "day",
        "n",
        "win_sum",
        "win_sumsq",
        "bollinger_flag",
    ]


def _hourly_events(counts, start="2024-01-01T00"):
    """One synthetic event per unit of count in consecutive hours."""
    rows = []
    eid = 0
    t0 = np.datetime64(start, "h")
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, 1, str(t0 + i) + ":00:00", 1.0))
            eid += 1
    return _events(rows)


def test_matrix_profile_known_answer(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import matrix_profile_hourly

    # period-3 repeating series, w=3: every window's exact repeat sits
    # 3 steps away -> nn_dist_sq == 0 with the SMALLEST admissible j
    counts = [1, 2, 3] * 4  # 12 hours, 10 windows of w=3
    ds = ray.data.from_arrow(_hourly_events(counts)).repartition(3)
    out = matrix_profile_hourly(ds, w=3).to_pydict()
    assert out["idx"] == list(range(10))
    assert all(d == 0 for d in out["nn_dist_sq"])
    # i=0 -> j=3 (first non-trivial exact repeat); i=4 -> j=1 (smaller side)
    assert out["nn_idx"][0] == 3
    assert out["nn_idx"][4] == 1


def test_matrix_profile_exclusion_and_empty(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import matrix_profile_hourly

    # too short for any pair outside the exclusion zone -> empty
    ds = ray.data.from_arrow(_hourly_events([1, 2, 3, 4]))
    assert matrix_profile_hourly(ds, w=3).num_rows == 0
    ds0 = ray.data.from_arrow(_hourly_events([]))
    assert matrix_profile_hourly(ds0, w=3).num_rows == 0


def test_rs_range_known_answer(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import rs_range_hourly

    # one full window of 4: x = [1,2,3,2]; S=8, Z = 4*csum - k*S
    # csum = [1,3,6,8] -> Z = [-4, -4, 0, 0]; R = 0-(-4) = 4
    # Q = 1+4+9+4 = 18; var_num = 4*18 - 64 = 8
    ds = ray.data.from_arrow(_hourly_events([1, 2, 3, 2, 9])).repartition(2)
    t = rs_range_hourly(ds, sizes=(4,)).to_pydict()
    assert t["win_n"] == [4] and t["win_idx"] == [0]
    assert t["s_sum"] == [8] and t["r_scaled"] == [4] and t["var_num"] == [8]


def test_pettitt_known_answer(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import pettitt_change_hourly

    # level shift 1,1,1 -> 5,5,5: U_3 = 3*3 = 9 (every left < every right)
    ds = ray.data.from_arrow(_hourly_events([1, 1, 1, 5, 5, 5])).repartition(2)
    t = pettitt_change_hourly(ds).to_pydict()
    assert t["k"] == [3] and t["u_stat"] == [-9] or t["u_stat"] == [9]
    # sign convention: U_k = sum sign(x_i - x_j), left smaller -> negative
    assert t["u_stat"] == [-9] and t["u_abs"] == [9] and t["m"] == [6]
    assert t["split_hour"][0] == np.datetime64("2024-01-01T03", "us").item()


def test_pettitt_empty_and_single(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import pettitt_change_hourly

    assert pettitt_change_hourly(
        ray.data.from_arrow(_hourly_events([7]))
    ).num_rows == 0


def test_sax_symbols_known_answer(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import sax_hourly_symbols

    # m=8, segments=4, alphabet=4: segments of 2 rows each
    # series: [1,1, 2,2, 3,3, 4,4]; sorted same; breakpoints at
    # ceil(k*8/4) = positions 2,4,6 -> values 1,2,3
    # seg means: 1,2,3,4 -> symbols = #breaks strictly below mean:
    # 1 -> 0; 2 -> 1 (1<2); 3 -> 2; 4 -> 3
    ds = ray.data.from_arrow(
        _hourly_events([1, 1, 2, 2, 3, 3, 4, 4])
    ).repartition(3)
    t = sax_hourly_symbols(ds, segments=4, alphabet=4).to_pydict()
    assert t["seg"] == [0, 1, 2, 3]
    assert t["paa_num"] == [2, 4, 6, 8] and t["paa_den"] == [2, 2, 2, 2]
    assert t["symbol"] == [0, 1, 2, 3]


def test_runs_test_known_answer(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import runs_test_hourly

    # series 1,5,1,5,3,3: sorted [1,1,3,3,5,5], lower median at
    # ceil(6/2)=3 -> 3; equals dropped -> signs of 1,5,1,5 = B,A,B,A
    # -> 4 runs, 2 above, 2 below
    ds = ray.data.from_arrow(_hourly_events([1, 5, 1, 5, 3, 3])).repartition(2)
    t = runs_test_hourly(ds).to_pydict()
    assert t["m"] == [6] and t["med"] == [3]
    assert t["n_above"] == [2] and t["n_below"] == [2] and t["n_runs"] == [4]


def test_runs_test_all_equal_and_empty(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import runs_test_hourly

    t = runs_test_hourly(
        ray.data.from_arrow(_hourly_events([4, 4, 4]))
    ).to_pydict()
    assert t["n_runs"] == [0] and t["n_above"] == [0] and t["n_below"] == [0]
    assert runs_test_hourly(
        ray.data.from_arrow(_hourly_events([]))
    ).num_rows == 0


def test_mi_type_hod_independent_and_dependent(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import mi_type_hod

    def ev(rows):
        return pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")
                ),
                "value": pa.array([1.0] * len(rows), pa.float64()),
            }
        )

    # perfectly dependent: type a only at hour 0, type b only at hour 1,
    # equal masses -> MI = ln 2 = 693147 micro-nats exactly
    dep = ev(
        [("a", "2024-01-01T00:10:00")] * 2 + [("b", "2024-01-01T01:10:00")] * 2
    )
    t = mi_type_hod(ray.data.from_arrow(dep).repartition(2)).to_pydict()
    assert t["n_events"] == [4] and t["n_types"] == [2] and t["n_hods"] == [2]
    assert t["mi_micro_nats"] == [693147]
    # perfectly independent uniform 2x2 -> every term ln1 = 0
    ind = ev(
        [
            ("a", "2024-01-01T00:10:00"),
            ("a", "2024-01-01T01:10:00"),
            ("b", "2024-01-01T00:20:00"),
            ("b", "2024-01-01T01:20:00"),
        ]
    )
    t2 = mi_type_hod(ray.data.from_arrow(ind)).to_pydict()
    assert t2["mi_num"] == [0] and t2["mi_micro_nats"] == [0]


def test_croston_recurrence_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import croston_daily

    def ev(day_counts):
        rows = []
        for day, c in day_counts:
            for i in range(c):
                rows.append(("purchase", f"2024-01-{day:02d}T08:0{i}:00"))
        # one non-purchase row that must be filtered out
        rows.append(("view", "2024-01-01T09:00:00"))
        return pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")
                ),
                "value": pa.array([1.0] * len(rows), pa.float64()),
            }
        )

    # demand days 1 (x=2), 4 (x=5, q=3), 5 (x=1, q=1)
    ds = ray.data.from_arrow(ev([(1, 2), (4, 5), (5, 1)])).repartition(2)
    t = croston_daily(ds).to_pydict()
    assert t["x"] == [2, 5, 1] and t["q"] == [1, 3, 1]
    # z: 2000 -> 2000 + (5000-2000)//8 = 2375 -> 2375 + (1000-2375)//8
    #    = 2375 + trunc(-171.875) = 2375 - 171 = 2204
    assert t["z_milli"] == [2000, 2375, 2204]
    # p: 1000 -> 1000 + (3000-1000)//8 = 1250 -> 1250 + (1000-1250)//8
    #    = 1250 - 31 = 1219
    assert t["p_milli"] == [1000, 1250, 1219]


def test_dow_adjusted_anomalies_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import dow_adjusted_anomalies

    # 15 consecutive days starting Mon 2024-01-01: Mondays at days 0,7,14
    # with counts 2,2,20 -> the 20 is > 1 sigma from its weekday's mean
    # (z^2 = 2 at m=3, the attainable maximum); constant weekdays never
    # flag (m*q == s*s exactly)
    counts = [3] * 15
    counts[0], counts[7], counts[14] = 2, 2, 20
    rows, eid = [], 0
    t0 = np.datetime64("2024-01-01", "D")
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, 1, str(t0 + i) + "T06:00:00", 1.0))
            eid += 1
    ds = ray.data.from_arrow(_events(rows)).repartition(3)
    out = dow_adjusted_anomalies(ds).to_pandas().sort_values("day")
    # 2024-01-01 is a Monday -> DuckDB dayofweek = 1
    assert list(out["dow"])[:2] == [1, 2]
    flagged = out[out["dow_flag"] == 1]
    assert list(flagged["n"]) == [20]
    # constant-count weekdays: m*q == s*s and m*n == s -> never flagged
    assert (out[out["n"] == 3]["dow_flag"] == 0).all()


def test_new_kernels_random_crosscheck(ray_session):
    """Randomized brute-force cross-checks: matrix profile pairwise scan,
    R/S direct formula, Pettitt O(m^2) double loop — seeded, 3 trials."""
    import ray.data

    from pyreshaper_ray.stages.timeseries import (
        matrix_profile_hourly,
        pettitt_change_hourly,
        rs_range_hourly,
    )

    rng = np.random.default_rng(42)
    for trial in range(3):
        m = int(rng.integers(20, 40))
        counts = rng.integers(1, 6, size=m).tolist()
        ds = ray.data.from_arrow(_hourly_events(counts)).repartition(3)
        x = np.array(counts, dtype=np.int64)

        # matrix profile w=5 brute force
        w = 5
        t = matrix_profile_hourly(ds, w=w).to_pydict()
        nwin = m - w + 1
        for i in range(nwin):
            best = None
            for j in range(nwin):
                if abs(i - j) < w:
                    continue
                d = int(((x[i : i + w] - x[j : j + w]) ** 2).sum())
                if best is None or (d, j) < best:
                    best = (d, j)
            assert t["nn_dist_sq"][i] == best[0], (trial, i)
            assert t["nn_idx"][i] == best[1], (trial, i)

        # R/S window 8 direct formula
        rs = rs_range_hourly(ds, sizes=(8,)).to_pydict()
        for gi in range(m // 8):
            xs = x[gi * 8 : (gi + 1) * 8]
            S = int(xs.sum())
            Z = [8 * int(xs[: k + 1].sum()) - (k + 1) * S for k in range(8)]
            assert rs["r_scaled"][gi] == max(Z) - min(Z)
            assert rs["var_num"][gi] == 8 * int((xs * xs).sum()) - S * S

        # Pettitt O(m^2)
        pt = pettitt_change_hourly(ds).to_pydict()
        us = []
        for k in range(1, m):
            u = 0
            for i in range(k):
                for j in range(k, m):
                    u += int(np.sign(x[i] - x[j]))
            us.append(u)
        best_k = int(np.argmax(np.abs(us)))
        assert pt["k"] == [best_k + 1]
        assert pt["u_stat"] == [us[best_k]]


def test_error_budget_burn_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import error_budget_burn

    def ev(rows):
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [np.datetime64(r[1], "us") for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )

    # day1: 1 error / 50 events = 20000 ppm -> over 10000
    # day2: 0 errors -> over 0; day3: 2/50 = 40000 -> over 30000
    rows = []
    for d, errs in (("01", 1), ("02", 0), ("03", 2)):
        for i in range(50):
            et = "error" if i < errs else "view"
            rows.append((et, f"2024-01-{d}T0{i % 9}:0{i % 6}:0{i % 10}"))
    out = (
        error_budget_burn(ray.data.from_arrow(ev(rows)).repartition(3))
        .to_pandas()
        .sort_values("day")
    )
    assert list(out["err_ppm"]) == [20000, 0, 40000]
    assert list(out["over_ppm"]) == [10000, 0, 30000]
    assert list(out["cum_over_ppm"]) == [10000, 10000, 40000]


def test_value_acf_daily_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.timeseries import value_acf_daily

    def ev(rows):
        return pa.table(
            {
                "ts": pa.array(
                    [np.datetime64(r[0], "us") for r in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array([float(r[1]) for r in rows], pa.float64()),
            }
        )

    # daily cents: day1=100, day2=200, day3=300
    rows = [
        ("2024-01-01T05:00:00", 1.00),
        ("2024-01-02T05:00:00", 2.00),
        ("2024-01-03T05:00:00", 3.00),
    ]
    t = (
        value_acf_daily(ray.data.from_arrow(ev(rows)).repartition(2), max_lag=2)
        .to_pandas()
        .set_index("lag")
    )
    assert t.loc[0, "n_pairs"] == 3 and t.loc[0, "sum_lag"] == 140000
    assert t.loc[0, "sum_head"] == 600
    # lag 1: (100*200 + 200*300) = 80000; head 300, tail 500
    assert t.loc[1, "n_pairs"] == 2 and t.loc[1, "sum_lag"] == 80000
    assert t.loc[1, "sum_head"] == 300 and t.loc[1, "sum_tail"] == 500
    # lag 2: 100*300 = 30000
    assert t.loc[2, "sum_lag"] == 30000


def test_rolling_zscore_days_hand(ray_session):
    """Hand case: flat series never flags; a spike after >=2 flat days
    flags; the zero-variance branch flags any deviation."""
    import ray.data

    from pyreshaper_ray.stages.timeseries import rolling_zscore_days

    DAY = 86_400_000_000
    t0 = 1_700_000_000_000_000 - (1_700_000_000_000_000 % DAY)
    # counts per day: 5,5,5,100 -> day 4 window {5,5,5} zero-variance, 100 != 5 -> flag
    ts = []
    for d, n in enumerate((5, 5, 5, 100)):
        ts.extend([t0 + d * DAY + i for i in range(n)])
    ds = ray.data.from_arrow(
        pa.table({"ts": pa.array(np.array(ts, np.int64), pa.timestamp("us"))})
    ).repartition(3)
    out = rolling_zscore_days(ds).to_pandas().sort_values("window_start")
    assert list(out.n_events) == [5, 5, 5, 100]
    assert list(out.flagged) == [0, 0, 0, 1]  # first: n=0; second: n=1; third: flat
