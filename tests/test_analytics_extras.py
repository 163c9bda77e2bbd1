"""Hand-computed unit tests for the session-14 operators: calendar-month
rollup, cohort retention, funnel conversion, full-outer day counts, and the
distributed Gram matrix."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ts(s: str):
    return np.datetime64(s, "us").astype("datetime64[us]")


def _events(rows):
    """rows: (user_id, ts_str, event_type)"""
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([_ts(r[1]) for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows]),
        }
    )


def test_cohort_retention_hand(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import cohort_retention

    # user 1: active day0, day2; user 2: active day0 only (two events same
    # day -> one distinct user-day); user 3: first seen day2.
    ev = _events(
        [
            (1, "2024-01-01T10:00:00", "view"),
            (1, "2024-01-03T10:00:00", "view"),
            (2, "2024-01-01T01:00:00", "view"),
            (2, "2024-01-01T23:00:00", "click"),
            (3, "2024-01-03T00:00:00", "view"),
        ]
    )
    out = cohort_retention(ray.data.from_arrow(ev)).to_pandas()
    got = {
        (r.cohort_day, r.offset_day): r.n_users for r in out.itertuples()
    }
    d0 = int(np.datetime64("2024-01-01").astype("datetime64[D]").astype(int))
    d2 = d0 + 2
    assert got == {(d0, 0): 2, (d0, 2): 1, (d2, 0): 1}


def test_funnel_strict_inequality(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import funnel_conversion

    ev = _events(
        [
            # user 1: signup then later purchase -> converted
            (1, "2024-01-01T00:00:00", "signup"),
            (1, "2024-01-02T00:00:00", "purchase"),
            # user 2: purchase BEFORE signup only -> not converted
            (2, "2024-01-02T00:00:00", "purchase"),
            (2, "2024-01-03T00:00:00", "signup"),
            # user 3: purchase at the EXACT signup ts -> strict > fails
            (3, "2024-01-01T05:00:00", "signup"),
            (3, "2024-01-01T05:00:00", "purchase"),
            # user 4: signup only
            (4, "2024-01-01T00:00:00", "signup"),
            # user 5: purchase only -> absent from output
            (5, "2024-01-01T00:00:00", "purchase"),
        ]
    )
    out = (
        funnel_conversion(ray.data.from_arrow(ev))
        .to_pandas()
        .set_index("user_id")
    )
    assert sorted(out.index) == [1, 2, 3, 4]
    assert bool(out.loc[1, "converted"]) is True
    assert bool(out.loc[2, "converted"]) is False
    assert bool(out.loc[3, "converted"]) is False
    assert bool(out.loc[4, "converted"]) is False


def test_daily_counts_full_outer_preserves_both_sides(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import daily_counts_full_outer

    # orders on days A, B; events on days B, C -> full outer keeps A and C.
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_orderdate": pa.array(
                [_ts("2024-01-01"), _ts("2024-01-01"), _ts("2024-01-02")],
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array([1.0, 2.0, 3.0]),
        }
    )
    events = _events(
        [
            (1, "2024-01-02T12:00:00", "view"),
            (2, "2024-01-05T00:00:00", "view"),
        ]
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(events, str(tmp_path / "events.parquet"))
    out = daily_counts_full_outer(str(tmp_path)).to_pandas()
    got = {r.day: (r.n_orders, r.n_events) for r in out.itertuples()}
    d0 = int(np.datetime64("2024-01-01").astype("datetime64[D]").astype(int))
    assert got == {d0: (2, 0), d0 + 1: (1, 1), d0 + 4: (0, 1)}


def test_gram_matrix_hand(ray_session):
    import ray.data

    from pyreshaper_ray.stages.similarity import gram_matrix

    vecs = np.array(
        [[0.5, -1.25, 2.0], [1.0, 0.0, -0.5]], dtype=np.float32
    )
    t = pa.table(
        {"embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32()))}
    )
    out = gram_matrix(ray.data.from_arrow(t)).to_pandas()
    m = np.floor(vecs.astype(np.float64) * 1000).astype(np.int64)
    want = m.T @ m
    assert len(out) == 9
    for r in out.itertuples():
        assert r.sum_prod == want[r.dim_i - 1, r.dim_j - 1]
    # symmetry
    piv = out.pivot(index="dim_i", columns="dim_j", values="sum_prod").values
    assert (piv == piv.T).all()


def test_monthly_revenue_calendar_boundaries(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import monthly_revenue

    orders = pa.table(
        {
            "o_orderdate": pa.array(
                [
                    _ts("1997-01-31T23:59:59"),
                    _ts("1997-02-01T00:00:00"),
                    _ts("1997-02-28T12:00:00"),
                    _ts("1998-02-01T00:00:00"),
                ],
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array([10.01, 20.02, 0.03, 5.0]),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = monthly_revenue(str(tmp_path)).to_pandas()
    got = {(r.year, r.month): (r.n_orders, r.revenue_cents) for r in out.itertuples()}
    assert got == {
        (1997, 1): (1, 1001),
        (1997, 2): (2, 2005),
        (1998, 2): (1, 500),
    }


def test_rolling_range_includes_ts_peers(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import rolling_range_sum_user

    ev = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1], pa.int64()),
            "ts": pa.array(
                np.array(
                    [
                        np.datetime64("2024-01-01T00:00:00", "us"),
                        np.datetime64("2024-01-05T00:00:00", "us"),
                        np.datetime64("2024-01-05T00:00:00", "us"),  # peer
                        np.datetime64("2024-01-09T00:00:00", "us"),
                    ]
                ),
                pa.timestamp("us"),
            ),
            "value": pa.array([1.0, 2.0, 4.0, 8.0]),
        }
    )
    out = (
        rolling_range_sum_user(ray.data.from_arrow(ev), window_days=7)
        .to_pandas()
        .sort_values(["ts", "win_cents"])
        .reset_index(drop=True)
    )
    # RANGE frame: both Jan-5 peers see 100+200+400; Jan-9 row's window
    # [Jan-2, Jan-9] drops the Jan-1 event.
    assert out["win_cents"].tolist() == [100, 700, 700, 1400]


def test_kmeans_matches_numpy_reference(ray_session):
    """The distributed k-means must equal a single-process numpy
    implementation of the same algorithm EXACTLY (micro-int sums make the
    distributed accumulation order-independent)."""
    from pyreshaper_ray.stages.similarity import kmeans_embeddings

    sf_dir = "/root/testdata/sf0.001"
    k, iters = 8, 3
    got = (
        kmeans_embeddings(sf_dir, k=k, n_iters=iters)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = np.asarray(t["vec_id"].to_pylist())
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(vid, kind="stable")
    cents = m[order[:k]].copy()

    def assign(m, c):
        scores = -2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
        return np.argmin(scores, axis=1)

    for _ in range(iters):
        lab = assign(m, cents)
        mi = np.floor(m * 1e6).astype(np.int64)
        for c in range(k):
            sel = lab == c
            n = int(sel.sum())
            if n:
                cents[c] = mi[sel].sum(axis=0).astype(np.float64) / 1e6 / n
    lab = assign(m, cents)

    want = {int(v): int(l) for v, l in zip(vid, lab)}
    assert len(got) == len(vid)
    for v, c in zip(got["vec_id"], got["cluster"]):
        assert want[int(v)] == int(c)
    # sanity: uses more than one cluster
    assert got["cluster"].nunique() > 1


def test_skew_join_equals_hash_join(ray_session):
    """The hybrid skew join must return exactly the plain hash join's rows,
    with the hot path genuinely exercised (threshold below max key freq)."""
    import ray.data

    from pyreshaper_ray.stages.joins import hash_join, skew_join

    sf = "/root/testdata/sf0.001"
    ev = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_id", "user_id"])
    cust = ray.data.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    plain = (
        hash_join(ev, cust, on="user_id", right_on="c_custkey")
        .select_columns(["event_id", "user_id", "c_mktsegment"])
        .to_pandas()
        .sort_values(["event_id"])
        .reset_index(drop=True)
    )
    # pick a threshold that is exceeded by at least one key
    freq = plain["user_id"].value_counts()
    thr = max(2, int(freq.iloc[0]) // 2)
    assert freq.iloc[0] >= thr, "fixture must exercise the hot path"
    hybrid = (
        skew_join(ev, cust, on="user_id", right_on="c_custkey", hot_threshold=thr)
        .select_columns(["event_id", "user_id", "c_mktsegment"])
        .to_pandas()
        .sort_values(["event_id"])
        .reset_index(drop=True)
    )
    assert plain.equals(hybrid)


def test_adaptive_join_plan_selection():
    """Footer-metadata planner: the small part side broadcasts under the
    default threshold; a tiny threshold forces the hash-shuffle plan."""
    from pyreshaper_ray.stages.joins import plan_equi_join

    sf = "/root/testdata/sf0.001"
    plan = plan_equi_join(
        f"{sf}/lineitem.parquet",
        f"{sf}/part.parquet",
        left_columns=["l_partkey", "l_extendedprice"],
        right_columns=["p_partkey", "p_brand"],
    )
    assert plan["strategy"] == "broadcast_right"
    assert plan["right"]["rows"] > 0 and plan["right"]["projected_bytes"] > 0
    # projected bytes must be a strict subset of the full table's bytes
    assert plan["left"]["projected_bytes"] < plan["left"]["total_bytes"]
    forced = plan_equi_join(
        f"{sf}/lineitem.parquet",
        f"{sf}/part.parquet",
        left_columns=["l_partkey", "l_extendedprice"],
        right_columns=["p_partkey", "p_brand"],
        broadcast_threshold_bytes=1,
    )
    assert forced["strategy"] == "hash_shuffle"
    # asymmetric case: swap sides -> broadcast_left
    swapped = plan_equi_join(
        f"{sf}/part.parquet",
        f"{sf}/lineitem.parquet",
        left_columns=["p_partkey", "p_brand"],
        right_columns=["l_partkey", "l_extendedprice"],
    )
    assert swapped["strategy"] in ("broadcast_left", "broadcast_right")


def test_adaptive_join_plan_invariant_rows(ray_session):
    """Both physical plans (broadcast vs hash) must return identical rows."""
    from pyreshaper_ray.stages.joins import adaptive_join

    sf = "/root/testdata/sf0.001"
    kw = dict(
        on="l_partkey",
        right_on="p_partkey",
        left_columns=["l_partkey", "l_extendedprice"],
        right_columns=["p_partkey", "p_brand"],
    )
    bcast = (
        adaptive_join(f"{sf}/lineitem.parquet", f"{sf}/part.parquet", **kw)
        .to_pandas()
        .sort_values(["l_partkey", "l_extendedprice", "p_brand"])
        .reset_index(drop=True)
    )
    hashp = (
        adaptive_join(
            f"{sf}/lineitem.parquet",
            f"{sf}/part.parquet",
            broadcast_threshold_bytes=1,
            **kw,
        )
        .to_pandas()
        .sort_values(["l_partkey", "l_extendedprice", "p_brand"])
        .reset_index(drop=True)
    )
    assert list(bcast.columns) == sorted(bcast.columns, key=list(bcast.columns).index)
    assert bcast[sorted(bcast.columns)].equals(hashp[sorted(hashp.columns)])
    assert len(bcast) > 0


def test_props_k_stats_missing_field_rows_drop(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import props_k_stats

    ev = pa.table(
        {
            "event_type": pa.array(["a", "a", "b", "b"]),
            "props": pa.array(
                ['{"k": 3}', '{"x": 9}', '{"k": 10}', "not json"]
            ),
        }
    )
    out = props_k_stats(ray.data.from_arrow(ev)).to_pandas()
    got = {r.event_type: (r.n, r.sum_k, r.max_k) for r in out.itertuples()}
    assert got == {"a": (1, 3, 3), "b": (1, 10, 10)}


def test_event_transitions_hand(ray_session):
    import ray.data

    from pyreshaper_ray.stages.windows import event_transitions

    ev = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": pa.array(
                [
                    _ts("2024-01-01T00:00:00"),
                    _ts("2024-01-01T00:01:00"),
                    _ts("2024-01-01T00:02:00"),
                    _ts("2024-01-01T00:00:30"),
                    _ts("2024-01-01T00:00:30"),  # tie -> event_id order
                    _ts("2024-01-01T00:09:00"),  # single event, no pair
                ],
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["view", "click", "view", "view", "click", "view"]),
        }
    )
    out = event_transitions(ray.data.from_arrow(ev)).to_pandas()
    got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def test_funnel_latency_first_b_after_first_a(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import funnel_latency

    ev = _events(
        [
            # user 1: purchase before signup ignored; first after = +2h
            (1, "2024-01-01T00:00:00", "purchase"),
            (1, "2024-01-01T01:00:00", "signup"),
            (1, "2024-01-01T03:00:00", "purchase"),
            (1, "2024-01-01T04:00:00", "purchase"),
            # user 2: purchase exactly AT signup ts -> strict > excludes it
            (2, "2024-01-01T00:00:00", "signup"),
            (2, "2024-01-01T00:00:00", "purchase"),
            (2, "2024-01-01T00:00:05", "purchase"),
            # user 3: no purchase after signup -> absent
            (3, "2024-01-01T05:00:00", "signup"),
        ]
    )
    out = (
        funnel_latency(ray.data.from_arrow(ev))
        .to_pandas()
        .set_index("user_id")
    )
    assert sorted(out.index) == [1, 2]
    assert int(out.loc[1, "latency_us"]) == 2 * 3600 * 1_000_000
    assert int(out.loc[2, "latency_us"]) == 5 * 1_000_000


def test_rolling_distinct_users_hand(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import rolling_distinct_users

    # user 1 active day0 and day1; user 2 active day0 only.
    ev = _events(
        [
            (1, "2024-01-01T08:00:00", "view"),
            (1, "2024-01-02T08:00:00", "view"),
            (2, "2024-01-01T09:00:00", "view"),
        ]
    )
    out = rolling_distinct_users(ray.data.from_arrow(ev), window_days=3).to_pandas()
    d0 = int(np.datetime64("2024-01-01").astype("datetime64[D]").astype(int))
    got = dict(zip(out["day"], out["n_users"]))
    # day0: both; day1: both (window covers day0); day2: both; day3: only
    # user1 (active day1, window [day1..day3]).
    assert got == {d0: 2, d0 + 1: 2, d0 + 2: 2, d0 + 3: 1}


def test_centroid_similarity_components_hand(ray_session):
    import ray.data

    from pyreshaper_ray.stages.similarity import centroid_similarity_components

    t = pa.table(
        {
            "label": pa.array([0, 0, 1], pa.int32()),
            "embedding": pa.array(
                [[1.0, 0.0], [1.0, 2.0], [0.0, 1.0]], pa.list_(pa.float32())
            ),
        }
    )
    out = centroid_similarity_components(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # label 0 sum vector (micro): (2e6, 2e6); label 1: (0, 1e6)
    assert (r.label_a, r.label_b, r.n_a, r.n_b) == (0, 1, 2, 1)
    assert r.dot_num == float(2_000_000 * 0 + 2_000_000 * 1_000_000)
    assert r.norm_a_sq == float(2_000_000**2 + 2_000_000**2)
    assert r.norm_b_sq == float(1_000_000**2)


def test_value_outliers_hand(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import value_outliers

    # user 1: seventeen 1.00s and one 100.00 — a single outlier among n-1
    # identical values has z² = n-1, so n must exceed 10 for z² > 9 (with
    # exactly ten points the inequality lands precisely ON the boundary
    # and strict > excludes it — verified against the oracle).
    # user 2: two identical values -> zero variance, no outliers.
    rows = [(1, float(1.0)) for _ in range(17)] + [(1, 100.0), (2, 5.0), (2, 5.0)]
    ev = pa.table(
        {
            "event_id": pa.array(list(range(len(rows))), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "value": pa.array([r[1] for r in rows]),
        }
    )
    out = value_outliers(ray.data.from_arrow(ev)).to_pandas()
    assert out["event_id"].tolist() == [17]
    assert out["value_cents"].tolist() == [10000]


def test_promo_revenue_share_hand(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import promo_revenue_ppm

    part = pa.table(
        {
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_type": pa.array(["PROMO BRUSHED", "STANDARD POLISHED"]),
        }
    )
    li = pa.table(
        {
            "l_partkey": pa.array([1, 2], pa.int64()),
            "l_extendedprice": pa.array([10.0, 30.0]),
            "l_discount": pa.array([0.0, 0.0]),
        }
    )
    pq.write_table(part, str(tmp_path / "part.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    out = promo_revenue_ppm(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert (r.promo_rev, r.total_rev, r.share_ppm) == (
        1000 * 100,
        4000 * 100,
        250_000,
    )


def test_asof_join_last_semantics(ray_session):
    """Distributed as-of join edge cases: key with no right rows, right rows
    all AFTER the left row, an exact timestamp tie (inclusive), several left
    rows per key."""
    import ray.data

    from pyreshaper_ray.stages.joins import asof_join_last

    left = pa.table(
        {
            "k": pa.array([1, 1, 2, 3], pa.int64()),
            "ts": pa.array(
                [
                    _ts("2024-01-01T00:00:10"),
                    _ts("2024-01-01T00:00:05"),
                    _ts("2024-01-01T00:00:07"),
                    _ts("2024-01-01T00:00:04"),
                ],
                pa.timestamp("us"),
            ),
            "id": pa.array([100, 101, 102, 103], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, 3], pa.int64()),
            "rts": pa.array(
                [
                    _ts("2024-01-01T00:00:05"),
                    _ts("2024-01-01T00:00:08"),
                    _ts("2024-01-01T00:00:09"),
                ],
                pa.timestamp("us"),
            ),
        }
    )
    out = asof_join_last(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        on="k",
        left_ts="ts",
        left_id="id",
        right_on="k",
        right_ts="rts",
    ).take_all()
    by_id = {r["lid"]: r["asof_ts"] for r in out}
    assert len(by_id) == 4
    assert by_id[100] == _ts("2024-01-01T00:00:08").astype("datetime64[us]").item()
    # exact tie: right_ts == left_ts counts (<=)
    assert by_id[101] == _ts("2024-01-01T00:00:05").astype("datetime64[us]").item()
    assert by_id[102] is None  # key 2 has no right rows
    assert by_id[103] is None  # key 3's only right row is later


def test_asof_last_order_at_16_cpus():
    """The Ray hash/sort exchanges have parallelism-dependent empty-block
    edges (see hash_join docstring); run the full as-of query in a FRESH
    16-CPU Ray process and value-check it against DuckDB."""
    import subprocess
    import sys

    script = r"""
import ray, sys
sys.path.insert(0, "/root/repo")
ray.init(address="local", num_cpus=16, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
import __ray_entry__ as e
import duckdb
sfd = "/root/testdata/sf0.001"
df = e.q_asof_last_order(sfd).to_pandas().sort_values("event_id").reset_index(drop=True)
con = duckdb.connect()
for t in ("events", "orders"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfd}/{t}.parquet')")
o = con.execute(e.oracle_sql()["asof_last_order"]).df().sort_values("event_id").reset_index(drop=True)
assert len(df) == len(o) and len(df) > 0
assert (df["event_id"].to_numpy() == o["event_id"].to_numpy()).all()
assert (df["last_order_ts"].isna() == o["last_order_ts"].isna()).all()
assert (df["last_order_ts"].dropna().to_numpy() == o["last_order_ts"].dropna().to_numpy()).all()
ray.shutdown()
print("OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_conv_trend_components_hand(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import conv_trend_components

    # conv a: (x,y) = (0,10),(1,20),(2,40) -> n=3 Σx=3 Σy=70 Σxy=100 Σx²=5
    t = pa.table(
        {
            "conv_id": pa.array(["a", "a", "a", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, 2, 0], pa.int32()),
            "char_len": pa.array([10, 20, 40, 7], pa.int32()),
        }
    )
    rows = {
        r["conv_id"]: r
        for r in conv_trend_components(ray.data.from_arrow(t)).take_all()
    }
    a = rows["a"]
    assert (a["n"], a["sum_x"], a["sum_y"], a["sum_xy"], a["sum_x2"]) == (
        3, 3, 70, 100, 5,
    )
    b = rows["b"]
    assert (b["n"], b["sum_x"], b["sum_y"], b["sum_xy"], b["sum_x2"]) == (
        1, 0, 7, 0, 0,
    )


def test_latest_event_per_user_tiebreak(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import latest_event_per_user

    base = 1_700_000_000_000_000
    # user 1: two events at the SAME ts -> higher event_id wins;
    # user 2: later ts wins regardless of event_id order
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "ts": pa.array(
                np.array([base, base, base + 5, base + 9], dtype=np.int64),
                pa.timestamp("us"),
            ),
            "event_id": pa.array([11, 12, 99, 3], pa.int64()),
            "event_type": pa.array(["a", "b", "c", "d"]),
            "value": pa.array([1.25, 2.50, 3.75, 4.00], pa.float64()),
        }
    )
    rows = {
        r["user_id"]: r
        for r in latest_event_per_user(ray.data.from_arrow(t)).take_all()
    }
    assert len(rows) == 2
    assert (rows[1]["event_id"], rows[1]["event_type"], rows[1]["value_cents"]) == (
        12, "b", 250,
    )
    assert (rows[2]["event_id"], rows[2]["event_type"], rows[2]["value_cents"]) == (
        3, "d", 400,
    )


def test_partition_fingerprint_block_invariance(ray_session):
    import hashlib

    import ray.data

    from pyreshaper_ray.stages.analytics import partition_fingerprint

    base = 1_700_000_000_000_000
    rows = [
        (i, base + i * 7, i % 3, "ab"[i % 2], float(i) + 0.25) for i in range(40)
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype=np.int64), pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )

    def expected():
        out = {}
        for eid, ts, uid, et, v in rows:
            cents = round(v * 100)
            s = f"{eid}|{ts}|{uid}|{cents}"
            fp = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            n, x = out.get(et, (0, 0))
            out[et] = (n + 1, x ^ fp)
        return out

    want = expected()
    # 1 block vs 8 blocks must agree exactly (XOR merge is order-free)
    for nblocks in (1, 8):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        got = {
            r["event_type"]: (r["n_rows"], r["fp"])
            for r in partition_fingerprint(ds).take_all()
        }
        assert got == want, nblocks


def test_snapshot_diff_three_change_types(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import snapshot_diff

    base = 1_700_000_000_000_000

    def snap(rows):
        return pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    np.array([base + r[0] for r in rows], dtype=np.int64),
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([7] * len(rows), pa.int64()),
                "value": pa.array([r[1] for r in rows], pa.float64()),
            }
        )

    # key 1 identical, key 2 changed value, key 3 only in old (removed),
    # key 4 only in new (added)
    old = snap([(1, 1.00), (2, 2.00), (3, 3.00)])
    new = snap([(1, 1.00), (2, 2.50), (4, 4.00)])
    for nblocks in (1, 4):
        got = {
            r["event_id"]: r["change"]
            for r in snapshot_diff(
                ray.data.from_arrow(old).repartition(nblocks),
                ray.data.from_arrow(new).repartition(nblocks),
            ).take_all()
        }
        assert got == {2: "changed", 3: "removed", 4: "added"}, nblocks


def test_value_mad_outliers_robust_to_wild_value(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import value_mad_outliers

    # values: nine near 10.00, one wild 10000.00
    # median=10.00=1000c; devs: nine <= 3c, wild 999000c; MAD = 1c (lower
    # median of [0,0,0,1,1,2,2,3,3,999000] -> 1); k=5 -> threshold 5c
    vals = [10.00, 10.01, 9.99, 10.02, 9.98, 10.03, 9.97, 10.00, 10.01, 10000.00]
    t = pa.table(
        {
            "event_id": pa.array(list(range(10)), pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    rows = value_mad_outliers(ray.data.from_arrow(t), k=5).take_all()
    assert [(r["event_id"], r["value_cents"]) for r in rows] == [(9, 1000000)]
    # empty input: no crash, no rows
    empty = pa.table(
        {"event_id": pa.array([], pa.int64()), "value": pa.array([], pa.float64())}
    )
    assert value_mad_outliers(ray.data.from_arrow(empty)).take_all() == []


def test_windowed_quantile_chars_hand(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import windowed_quantile_chars

    us = 1_000_000
    h0 = (1_700_000_000 // 3600) * 3600 * us  # an exact hour boundary
    h1 = h0 + 3600 * us
    # hour0: [10,20,30,40] -> ceil(.95*4)-1 = 3 -> 40; hour1: [7] -> 7
    t = pa.table(
        {
            "ts": pa.array(
                np.array([h0, h0 + 1, h0 + 2, h0 + 3, h1 + 5], dtype=np.int64),
                pa.timestamp("us"),
            ),
            "char_len": pa.array([40, 10, 30, 20, 7], pa.int32()),
        }
    )
    for nblocks in (1, 3):
        rows = {
            r["window_start"]: (r["p_chars"], r["n_turns"])
            for r in windowed_quantile_chars(
                ray.data.from_arrow(t).repartition(nblocks), q=0.95, unit="hour"
            ).take_all()
        }
        vals = sorted(rows.items())
        assert vals[0][1] == (40, 4), nblocks
        assert vals[1][1] == (7, 1), nblocks


def test_top_users_by_active_days_distinct(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import top_users_by_active_days

    day = 86_400_000_000
    # user 1: 3 events on 2 distinct days; user 2: 1 day; user 3: 3 days
    ts = [0, 5, day + 1, 0, 0, day, 2 * day]
    uid = [1, 1, 1, 2, 3, 3, 3]
    t = pa.table(
        {
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64), pa.timestamp("us")),
        }
    )
    rows = [
        (r["user_id"], r["n_days"])
        for r in top_users_by_active_days(
            ray.data.from_arrow(t).repartition(3), k=10
        ).take_all()
    ]
    assert rows == [(3, 3), (1, 2), (2, 1)]


def test_q5_local_supplier_volume_hand(ray_session, tmp_path):
    """Q5 semantics: revenue counted only when customer and supplier share a
    nation, the nation is in the target region, and the order date is in
    the window; excluded rows cover each predicate independently."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import q5_local_supplier_volume

    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int32()),
                "r_name": pa.array(["ASIA", "EUROPE"]),
            }
        ),
        str(tmp_path / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([10, 11, 20], pa.int32()),
                "n_name": pa.array(["JAPAN", "INDIA", "FRANCE"]),
                "n_regionkey": pa.array([0, 0, 1], pa.int32()),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_nationkey": pa.array([10, 11, 20], pa.int32()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([5, 6, 7], pa.int64()),
                "s_nationkey": pa.array([10, 11, 20], pa.int32()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    ts = pa.array(
        [
            np.datetime64("1996-06-01", "us"),
            np.datetime64("1996-06-01", "us"),
            np.datetime64("1995-06-01", "us"),  # outside window
            np.datetime64("1996-06-01", "us"),
        ],
        pa.timestamp("us"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 101, 102, 103], pa.int64()),
                "o_custkey": pa.array([1, 2, 1, 3], pa.int64()),
                "o_orderdate": ts,
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                # 100: JAPAN cust + JAPAN supp -> counted (10.00 * (100-5))
                # 100 again, different-nation supp -> excluded
                # 101: INDIA cust + INDIA supp -> counted (20.00 * 100)
                # 102: date-excluded order
                # 103: FRANCE (EUROPE) same-nation -> region-excluded
                "l_orderkey": pa.array([100, 100, 101, 102, 103], pa.int64()),
                "l_suppkey": pa.array([5, 6, 6, 5, 7], pa.int64()),
                "l_extendedprice": pa.array([10.0, 99.0, 20.0, 50.0, 70.0]),
                "l_discount": pa.array([0.05, 0.0, 0.0, 0.0, 0.0]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = q5_local_supplier_volume(str(tmp_path)).to_pandas()
    got = list(zip(out.n_name, out.revenue_u))
    assert got == [("INDIA", 2000 * 100), ("JAPAN", 1000 * 95)]


def test_q18_large_volume_customers_hand(ray_session, tmp_path):
    """Q18 semantics: only orders whose summed quantity exceeds the
    threshold survive; strict inequality at the boundary; output ordered by
    totalprice desc with the customer name attached."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import q18_large_volume_customers

    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_name": pa.array(["alice", "bob"]),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    ts = pa.array([np.datetime64("1996-01-01", "us")] * 3, pa.timestamp("us"))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 101, 102], pa.int64()),
                "o_custkey": pa.array([1, 2, 1], pa.int64()),
                "o_orderdate": ts,
                "o_totalprice": pa.array([500.0, 900.0, 100.0]),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                # 100: 150+151 = 301 > 300 -> in; 101: exactly 300 -> out
                # (strict >); 102: 299 -> out
                "l_orderkey": pa.array([100, 100, 101, 102], pa.int64()),
                "l_quantity": pa.array([150.0, 151.0, 300.0, 299.0]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = q18_large_volume_customers(str(tmp_path), qty_threshold=300).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.c_custkey, r.c_name, r.o_orderkey, r.totalprice_u, r.sum_qty_u) == (
        1,
        "alice",
        100,
        50000,
        30100,
    )


def test_role_simpson_per_conv_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.analytics import role_simpson_per_conv

    rows = [
        ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "user"),
        ("c2", 0, "user"),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array(
                [np.datetime64("2024-01-01T00:00:00", "us")] * len(rows),
                pa.timestamp("us"),
            ),
        }
    )
    out = {
        r["conv_id"]: r
        for r in role_simpson_per_conv(
            ray.data.from_arrow(t).repartition(3)
        ).take_all()
    }
    # c1: roles {user:2, assistant:1} → n=3, sum_c2 = 4+1 = 5
    assert out["c1"]["n_turns"] == 3 and out["c1"]["sum_c2"] == 5
    # c2: single role → maximal concentration, sum_c2 == n²
    assert out["c2"]["n_turns"] == 1 and out["c2"]["sum_c2"] == 1


def test_theil_sen_daily_trend_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.analytics import theil_sen_daily_trend

    # user 1: days 0,1,2 with counts 1,5,3
    #   pairs: (0,1): +4/1 ; (0,2): +2/2=+1 ; (1,2): -2/1
    #   sorted slopes: -2, 1, 4 -> median 1 -> 1_000_000 ppm
    # user 2: one day only -> omitted
    # user 3: days 0,2 counts 3,2 -> slope -1/2 -> floor(-500000.0)
    rows = []
    def add(uid, day, k):
        for i in range(k):
            rows.append((uid, f"2024-01-0{day + 1}T10:00:00"))
    add(1, 0, 1); add(1, 1, 5); add(1, 2, 3)
    add(2, 0, 4)
    add(3, 0, 3); add(3, 2, 2)
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")
            ),
        }
    )
    out = {
        r["user_id"]: r
        for r in theil_sen_daily_trend(
            ray.data.from_arrow(t).repartition(4)
        ).take_all()
    }
    assert set(out) == {1, 3}
    assert out[1]["n_days"] == 3 and out[1]["slope_ppm"] == 1_000_000
    assert out[3]["n_days"] == 2 and out[3]["slope_ppm"] == -500_000


def test_bounce_rate_daily_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.analytics import bounce_rate_daily

    # day 1: u1 x2 (not bounce), u2 x1 (bounce); day 2: u1 x1 (bounce)
    rows = [
        (1, "2024-01-01T09:00:00"), (1, "2024-01-01T17:00:00"),
        (2, "2024-01-01T12:00:00"),
        (1, "2024-01-02T08:00:00"),
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
        str(r["day"])[:10]: r
        for r in bounce_rate_daily(ray.data.from_arrow(t).repartition(3)).take_all()
    }
    assert out["2024-01-01"]["n_users"] == 2 and out["2024-01-01"]["n_bounce"] == 1
    assert out["2024-01-02"]["n_users"] == 1 and out["2024-01-02"]["n_bounce"] == 1


def test_encode_categorical_dense_rank_order(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.analytics import encode_categorical

    t = pa.table(
        {
            "conv_id": pa.array(["a", "a", "b", "b"], pa.string()),
            "turn_idx": pa.array([0, 1, 0, 1], pa.int32()),
            "role": pa.array(["user", "assistant", "tool", "user"], pa.string()),
        }
    )
    out = encode_categorical(
        ray.data.from_arrow(t).repartition(2), col="role", keep=("conv_id", "turn_idx")
    ).take_all()
    ids = {(r["conv_id"], r["turn_idx"]): r["role_id"] for r in out}
    # lexicographic vocab: assistant=0, tool=1, user=2
    assert ids[("a", 0)] == 2 and ids[("a", 1)] == 0
    assert ids[("b", 0)] == 1 and ids[("b", 1)] == 2


def test_profile_table_with_nulls(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import profile_table

    t = pa.table(
        {
            "a": pa.array([1, 1, 2, None], pa.int64()),
            "b": pa.array(["x", None, None, "x"], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "mini.parquet")
    out = profile_table(str(tmp_path), "mini", ["a", "b"])
    rows = {r["column"]: r for r in out.to_pylist()}
    assert rows["a"]["n"] == 4 and rows["a"]["n_null"] == 1 and rows["a"]["n_distinct"] == 2
    assert rows["b"]["n"] == 4 and rows["b"]["n_null"] == 2 and rows["b"]["n_distinct"] == 1


def test_q19_probe_kernel_empty_lut():
    # the probe path must not crash when no part matches any arm
    import numpy as np

    keys = np.array([], np.int64)
    lk = np.array([5, 7], np.int64)
    pos = np.searchsorted(keys, lk)
    pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
    found = (keys[pos_c] == lk) if len(keys) else np.zeros(len(lk), bool)
    assert not found.any()


def test_scale_value_by_type_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.analytics import scale_value_by_type

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
            "value": pa.array([1.00, 2.00, 3.00, 9.99], pa.float64()),
        }
    )
    out = {
        r["event_id"]: r["scaled_ppm"]
        for r in scale_value_by_type(
            ray.data.from_arrow(t).repartition(2)
        ).take_all()
    }
    assert out[1] == 0 and out[3] == 1_000_000
    assert out[2] == 500_000
    assert out[4] == 1_000_000  # degenerate single-value stratum


def test_assign_folds_stratified_balanced(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.analytics import assign_folds

    t = pa.table(
        {
            "doc_id": pa.array(list(range(12)), pa.int64()),
            "source": pa.array(["w"] * 7 + ["x"] * 5, pa.string()),
        }
    )
    out = assign_folds(ray.data.from_arrow(t).repartition(3), k=3).take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["doc_id"], r["fold"]))
    for src, rows in by_src.items():
        rows.sort()
        folds = [f for _, f in rows]
        assert folds == [i % 3 for i in range(len(rows))]  # rank order by id
        # balanced ±1 within stratum
        from collections import Counter
        c = Counter(folds)
        assert max(c.values()) - min(c.values()) <= 1


def test_event_features_composition(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.analytics import event_features

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "event_type": pa.array(["b", "a", "b"], pa.string()),
            "value": pa.array([1.00, 5.00, 3.00], pa.float64()),
            "ts": pa.array(
                [
                    np.datetime64("2024-01-07T13:30:00", "us"),  # a Sunday
                    np.datetime64("2024-01-08T00:00:00", "us"),  # a Monday
                    np.datetime64("2024-01-09T23:59:59", "us"),
                ],
                pa.timestamp("us"),
            ),
        }
    )
    out = {
        r["event_id"]: r
        for r in event_features(ray.data.from_arrow(t).repartition(2)).take_all()
    }
    # vocab sorted: a=0, b=1
    assert out[2]["type_id"] == 0 and out[1]["type_id"] == 1
    # type b bounds [100, 300] cents → 1.00→0, 3.00→1e6; singleton a → 1e6
    assert out[1]["scaled_ppm"] == 0 and out[3]["scaled_ppm"] == 1_000_000
    assert out[2]["scaled_ppm"] == 1_000_000
    assert out[1]["dow"] == 0 and out[1]["hour"] == 13   # Sunday=0
    assert out[2]["dow"] == 1 and out[2]["hour"] == 0


def test_k_anonymity_audit_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.analytics import k_anonymity_audit

    # cell (a, Monday, 10h) has 5 members (safe at k=5); (b, Monday, 10h)
    # has 2 (flagged)
    rows = [("a", "2024-01-08T10:00:00")] * 5 + [("b", "2024-01-08T10:30:00")] * 2
    t = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array(
                [np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")
            ),
        }
    )
    out = k_anonymity_audit(ray.data.from_arrow(t).repartition(3), k=5).take_all()
    assert len(out) == 1
    r = out[0]
    assert r["event_type"] == "b" and r["dow"] == 1 and r["hour"] == 10 and r["n"] == 2


def test_quota_sample_largest_remainder(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.analytics import quota_sample

    # strata sizes 6 / 3 / 1, K=5 → exact shares 3.0 / 1.5 / 0.5; floors
    # 3/1/0, leftover 1 goes to the larger remainder; tie (rem .5 = .5)
    # breaks to the lexicographically smaller source 'b' → quotas 3/2/0
    t = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "source": pa.array(["a"] * 6 + ["b"] * 3 + ["c"], pa.string()),
        }
    )
    out = quota_sample(ray.data.from_arrow(t).repartition(3), total_k=5).take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert sorted(by_src.get("a", [])) == [0, 1, 2]
    assert sorted(by_src.get("b", [])) == [6, 7]
    assert "c" not in by_src
    assert sum(len(v) for v in by_src.values()) == 5


def test_growth_accounting_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.analytics import growth_accounting

    # u1 active Jan 1, 2, 4; u2 active Jan 2 only
    rows = [
        (1, "2024-01-01T08:00:00"),
        (1, "2024-01-01T09:00:00"),  # same day twice → still one active day
        (1, "2024-01-02T08:00:00"),
        (1, "2024-01-04T08:00:00"),
        (2, "2024-01-02T12:00:00"),
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
        str(r["day"])[:10]: r
        for r in growth_accounting(ray.data.from_arrow(t).repartition(3)).take_all()
    }
    assert out["2024-01-01"]["n_new"] == 1 and out["2024-01-01"]["n_churned"] == 0
    assert out["2024-01-02"]["n_new"] == 1  # u2
    assert out["2024-01-02"]["n_retained"] == 1  # u1
    assert out["2024-01-03"]["n_churned"] == 2  # u1 gap + u2 exit
    assert out["2024-01-04"]["n_resurrected"] == 1  # u1 returns after gap
    assert out["2024-01-05"]["n_churned"] == 1  # u1 final exit
    # invariant: retained(d) + churned(d) = active(d-1)
    active = {"2024-01-01": 1, "2024-01-02": 2, "2024-01-04": 1}
    for day, prev in [
        ("2024-01-02", "2024-01-01"),
        ("2024-01-03", "2024-01-02"),
        ("2024-01-05", "2024-01-04"),
    ]:
        r = out.get(day)
        got = (r["n_retained"] if r else 0) + (r["n_churned"] if r else 0)
        assert got == active[prev]


def test_contingency_margins_hand_computed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.analytics import contingency_margins

    # Mon 2024-01-08 (dow=1), Tue 2024-01-09 (dow=2)
    rows = [("a", "2024-01-08")] * 3 + [("b", "2024-01-08")] + [("b", "2024-01-09")] * 2
    t = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array(
                [np.datetime64(r[1] + "T10:00:00", "us") for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    out = {
        (r["event_type"], r["dow"]): r
        for r in contingency_margins(ray.data.from_arrow(t).repartition(3)).take_all()
    }
    assert out[("a", 1)]["n"] == 3 and out[("a", 1)]["n_row"] == 3
    assert out[("a", 1)]["n_col"] == 4
    assert out[("a", 1)]["expected_ppm"] == 3 * 4 * 1_000_000 // 6
    assert out[("b", 2)]["n"] == 2 and out[("b", 2)]["n_row"] == 3
    assert out[("b", 2)]["n_col"] == 2
    assert out[("b", 2)]["expected_ppm"] == 3 * 2 * 1_000_000 // 6


def test_q7_bination_volume_hand(ray_session, tmp_path):
    """Q7 semantics: only UNEQUAL (supplier nation, customer nation) pairs
    inside the date window count; both directions of a pair are distinct
    rows, grouped by order year."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import q7_bination_volume

    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([10, 11], pa.int32()),
                "n_name": pa.array(["JAPAN", "INDIA"]),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_nationkey": pa.array([10, 11], pa.int32()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([5, 6], pa.int64()),
                "s_nationkey": pa.array([10, 11], pa.int32()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    ts = pa.array(
        [
            np.datetime64("1996-06-01", "us"),
            np.datetime64("1997-06-01", "us"),
            np.datetime64("1995-06-01", "us"),  # outside window
        ],
        pa.timestamp("us"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 101, 102], pa.int64()),
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
                "o_orderdate": ts,
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                # 100: INDIA supp -> JAPAN cust, 1996 (counted, 10.00*(100-5))
                # 100: JAPAN supp -> JAPAN cust (same nation, excluded)
                # 101: INDIA supp -> JAPAN cust, 1997 (counted, 20.00*100)
                # 102: date-excluded
                "l_orderkey": pa.array([100, 100, 101, 102], pa.int64()),
                "l_suppkey": pa.array([6, 5, 6, 5], pa.int64()),
                "l_extendedprice": pa.array([10.0, 99.0, 20.0, 50.0]),
                "l_discount": pa.array([0.05, 0.0, 0.0, 0.0]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = q7_bination_volume(str(tmp_path)).to_pandas()
    got = list(zip(out.supp_nation, out.cust_nation, out.o_year, out.revenue_u))
    assert got == [
        ("INDIA", "JAPAN", 1996, 1000 * 95),
        ("INDIA", "JAPAN", 1997, 2000 * 100),
    ]


def test_q6_forecast_revenue_hand(ray_session, tmp_path):
    """Q6 semantics: each predicate (date window, discount band, quantity
    cap) excludes a row independently; revenue is exact 1e-4 units."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import q6_forecast_revenue

    d96 = np.datetime64("1996-06-01", "us")
    d95 = np.datetime64("1995-06-01", "us")
    pq.write_table(
        pa.table(
            {
                "l_shipdate": pa.array([d96, d95, d96, d96, d96], pa.timestamp("us")),
                "l_discount": pa.array([0.06, 0.06, 0.04, 0.06, 0.07]),
                "l_quantity": pa.array([10.0, 10.0, 10.0, 30.0, 23.0]),
                "l_extendedprice": pa.array([100.0, 100.0, 100.0, 100.0, 50.0]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = q6_forecast_revenue(str(tmp_path)).to_pandas()
    # kept: row0 (10000c * 6) and row4 (5000c * 7)
    assert list(out.revenue_e4) == [10000 * 6 + 5000 * 7]
    assert list(out.n_items) == [2]


def test_q12_priority_by_status_hand(ray_session, tmp_path):
    """Q12 shape: high/low priority census per linestatus over the 1996
    ship window, priority carried through the key-to-key join."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import q12_priority_by_status

    d96 = np.datetime64("1996-06-01", "us")
    d97 = np.datetime64("1997-06-01", "us")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3, 2], pa.int64()),
                "l_linestatus": pa.array(["O", "F", "O", "O", "O"]),
                "l_shipdate": pa.array([d96, d96, d96, d97, d96], pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderpriority": pa.array(["1-URGENT", "5-LOW", "2-HIGH"]),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = q12_priority_by_status(str(tmp_path)).to_pandas()
    rows = {r.l_linestatus: (r.high_count, r.low_count) for r in out.itertuples()}
    # O: order1 high (1) + order2 low (x2); order3 is date-excluded
    assert rows["O"] == (1, 2)
    assert rows["F"] == (1, 0)


def test_q13_customer_distribution_hand(ray_session, tmp_path):
    """Q13 semantics: zero-order customers form the k=0 bucket; the bucket
    is absent when every customer ordered."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import q13_customer_distribution

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({"o_custkey": pa.array([1, 1, 1, 2], pa.int64())}),
        str(tmp_path / "orders.parquet"),
    )
    out = q13_customer_distribution(str(tmp_path)).to_pandas()
    dist = dict(zip(out.c_count, out.custdist))
    assert dist == {3: 1, 1: 1, 0: 2}


def test_q17_small_quantity_revenue_hand(ray_session, tmp_path):
    """Q17 semantics: only lineitems of the target brand below 20% of their
    part's average quantity count; the threshold is strict and per-part."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import q17_small_quantity_revenue

    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_brand": pa.array(["Brand#23", "Brand#23", "Brand#11"]),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    # part 1: qties 1, 20, 30 -> avg 17, 0.2*avg = 3.4 -> only qty 1 kept
    # part 2: qties 10, 10 -> 0.2*avg = 2 -> none kept
    # part 3: wrong brand, tiny qty -> excluded
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                "l_quantity": pa.array([1.0, 20.0, 30.0, 10.0, 10.0, 1.0]),
                "l_extendedprice": pa.array([7.5, 100.0, 100.0, 50.0, 50.0, 9.0]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = q17_small_quantity_revenue(str(tmp_path)).to_pandas()
    assert list(out.total_price_c) == [750]
    assert list(out.n_items) == [1]


def test_q22_idle_balance_census_hand(ray_session, tmp_path):
    """Q22 semantics: above the positive-only global average AND orderless."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import q22_idle_balance_census

    # positive balances: 100, 300, 500, 200 -> avg 275
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "c_mktsegment": pa.array(["A", "A", "B", "B", "A"]),
                "c_acctbal": pa.array([1.0, 3.0, 5.0, 2.0, -4.0]),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    # cust 3 (500 > 275) has a high-priority order -> excluded;
    # cust 2 (300) has only a LOW order -> still "idle", kept
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([3, 3, 2], pa.int64()),
                "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "5-LOW"]),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = q22_idle_balance_census(str(tmp_path)).to_pandas()
    rows = {r.c_mktsegment: (r.numcust, r.totacctbal_c) for r in out.itertuples()}
    assert rows == {"A": (1, 300)}


def test_q9_nation_year_revenue_hand(ray_session, tmp_path):
    """Q9 shape: revenue attributed to (supplier nation, order year)."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import q9_nation_year_revenue

    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([1, 2], pa.int32()),
                "n_name": pa.array(["JAPAN", "FRANCE"]),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([10, 11], pa.int64()),
                "s_nationkey": pa.array([1, 2], pa.int32()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 101], pa.int64()),
                "o_orderdate": pa.array(
                    [
                        np.datetime64("1996-03-01", "us"),
                        np.datetime64("1997-03-01", "us"),
                    ],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([100, 100, 101], pa.int64()),
                "l_suppkey": pa.array([10, 11, 10], pa.int64()),
                "l_extendedprice": pa.array([10.0, 20.0, 30.0]),
                "l_discount": pa.array([0.05, 0.0, 0.1]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = q9_nation_year_revenue(str(tmp_path)).to_pandas()
    rows = {(r.n_name, r.o_year): r.revenue_e4 for r in out.itertuples()}
    assert rows == {
        ("JAPAN", 1996): 1000 * 95,
        ("FRANCE", 1996): 2000 * 100,
        ("JAPAN", 1997): 3000 * 90,
    }


def test_chi2_independence_cells_hand(ray_session, tmp_path):
    """Margins are exact and consistent: row/col/grand totals recompose."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import chi2_independence_cells

    # Mon 2024-01-01, Tue 2024-01-02 (dow: Mon=1, Tue=2 in EXTRACT(dow))
    ts = pa.array(
        [
            np.datetime64("2024-01-01 10:00", "us"),
            np.datetime64("2024-01-01 11:00", "us"),
            np.datetime64("2024-01-02 10:00", "us"),
            np.datetime64("2024-01-02 11:00", "us"),
            np.datetime64("2024-01-02 12:00", "us"),
        ],
        pa.timestamp("us"),
    )
    pq.write_table(
        pa.table(
            {
                "ts": ts,
                "event_type": pa.array(["a", "b", "a", "a", "b"]),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = chi2_independence_cells(str(tmp_path)).to_pandas()
    cells = {
        (r.event_type, r.dow): (r.observed, r.row_total, r.col_total, r.grand_total)
        for r in out.itertuples()
    }
    assert cells[("a", 1)] == (1, 3, 2, 5)
    assert cells[("a", 2)] == (2, 3, 3, 5)
    assert cells[("b", 1)] == (1, 2, 2, 5)
    assert cells[("b", 2)] == (1, 2, 3, 5)


def test_q8_market_share_hand(ray_session, tmp_path):
    """Share counts only target-nation supplier revenue within region-
    customer orders; out-of-region customers drop entirely."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import q8_market_share_ppm

    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int32()),
                "r_name": pa.array(["ASIA", "EUROPE"]),
            }
        ),
        str(tmp_path / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([1, 2, 3], pa.int32()),
                "n_name": pa.array(["JAPAN", "INDIA", "FRANCE"]),
                "n_regionkey": pa.array([0, 0, 1], pa.int32()),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_nationkey": pa.array([2, 3], pa.int32()),  # INDIA, FRANCE
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([10, 11], pa.int64()),
                "s_nationkey": pa.array([1, 2], pa.int32()),  # JAPAN, INDIA
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 101], pa.int64()),
                "o_custkey": pa.array([1, 2], pa.int64()),
                "o_orderdate": pa.array(
                    [np.datetime64("1996-03-01", "us")] * 2, pa.timestamp("us")
                ),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                # order 100 (ASIA cust): JAPAN supp 10.00, INDIA supp 30.00
                # order 101 (EUROPE cust): JAPAN supp 99.00 -> dropped
                "l_orderkey": pa.array([100, 100, 101], pa.int64()),
                "l_suppkey": pa.array([10, 11, 10], pa.int64()),
                "l_extendedprice": pa.array([10.0, 30.0, 99.0]),
                "l_discount": pa.array([0.0, 0.0, 0.0]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = q8_market_share_ppm(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.o_year == 1996
    assert r.num_rev_e4 == 1000 * 100
    assert r.den_rev_e4 == 4000 * 100
    assert r.share_ppm == 250000


def test_gini_user_activity_hand_values(ray_session):
    """Uniform counts → gini 0; a hand-computed skewed case is exact."""
    import ray.data

    from pyreshaper_ray.stages.analytics import gini_user_activity

    uniform = pa.table({"user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64())})
    row = gini_user_activity(ray.data.from_arrow(uniform)).take_all()[0]
    assert row["n_users"] == 3 and row["total_events"] == 6
    assert row["gini_num"] == 0 and row["gini_ppm"] == 0

    # counts x = [1, 2, 5] ascending; n=3, total=8
    # num = (2*1-4)*1 + (2*2-4)*2 + (2*3-4)*5 = -2 + 0 + 10 = 8
    # gini = 8 / (3*8) = 1/3
    skew = pa.table(
        {"user_id": pa.array([7] * 5 + [8] * 2 + [9], pa.int64())}
    )
    row = gini_user_activity(ray.data.from_arrow(skew)).take_all()[0]
    assert row["n_users"] == 3 and row["total_events"] == 8
    assert row["gini_num"] == 8
    assert row["gini_ppm"] == 1_000_000 * 8 // 24


def test_mannwhitney_hand_values(ray_session):
    """Tied values use midranks: hand case A={1,3,3}, B={2,3}."""
    import ray.data

    from pyreshaper_ray.stages.analytics import mannwhitney_components

    ev = pa.table(
        {
            "event_type": pa.array(
                ["purchase", "purchase", "purchase", "click", "click"]
            ),
            "value": pa.array([0.01, 0.03, 0.03, 0.02, 0.03], pa.float64()),
        }
    )
    row = mannwhitney_components(ray.data.from_arrow(ev)).take_all()[0]
    # sorted cents: 1(A) 2(B) 3 3 3 (A,A,B share midrank (3+4+5)/3 = 4)
    # ranksum_A = 1 + 4 + 4 = 9 → doubled 18; U2 = 18 − 3·4 = 6 (U = 3)
    assert row["n_a"] == 3 and row["n_b"] == 2
    assert row["ranksum2_a"] == 18
    assert row["u2_a"] == 6


def test_zorder_locality_beats_time_layout(ray_session):
    """Sorting by the Morton value must reduce per-block distinct-key
    spread on BOTH dimensions vs the natural time layout — the zone-map
    pruning payoff. Also cross-checks the bit interleave on hand values."""
    from pyreshaper_ray.stages.analytics import zorder_events

    df = (
        zorder_events("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # hand-check the interleave on one row
    r = df.iloc[0]
    z = 0
    for i in range(16):
        z |= ((int(r.user_id) >> i) & 1) << (2 * i)
        z |= ((int(r.day) >> i) & 1) << (2 * i + 1)
    assert z == int(r.zval)

    def mean_block_distinct(frame, key, block=100):
        vals = frame[key].to_numpy()
        return np.mean(
            [len(np.unique(vals[i:i + block]))
             for i in range(0, len(vals), block)]
        )

    by_time = df.sort_values(["day", "event_id"]).reset_index(drop=True)
    by_z = df.sort_values(["zval", "event_id"]).reset_index(drop=True)
    # time layout: each block spans ~all users; z layout: strictly fewer
    assert mean_block_distinct(by_z, "user_id") < mean_block_distinct(
        by_time, "user_id"
    )
    # and day locality stays: far better than a user-sorted layout
    by_user = df.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert mean_block_distinct(by_z, "day") < mean_block_distinct(
        by_user, "day"
    )


def test_equidepth_bins_are_balanced(ray_session):
    """Every bucket 1..10 holds between floor and ceil of n/10 rows (up to
    tie mass), and bin assignment matches a numpy reference."""
    import ray.data

    from pyreshaper_ray.stages.analytics import equidepth_bin_events

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/events.parquet", columns=["event_id", "value"]
    )
    df = equidepth_bin_events(ds).to_pandas()
    n = len(df)
    assert set(df["bucket"].unique()) <= set(range(1, 11))
    # numpy reference: edges at ceil(d*n/10)-1 of the sorted cents
    v = np.sort(df["value_cents"].to_numpy())
    edges = np.array(
        [v[max(-(-d * n // 10), 1) - 1] for d in range(1, 10)], np.int64
    )
    ref = 1 + np.searchsorted(edges, df["value_cents"].to_numpy(), side="left")
    assert (df["bucket"].to_numpy() == ref).all()
    # balance: no bucket exceeds n/10 by more than the largest tie run
    counts = df["bucket"].value_counts()
    _, tie_counts = np.unique(v, return_counts=True)
    assert counts.max() <= n // 10 + tie_counts.max() + 1


def test_event_type_venn_hand_case(ray_session):
    """OR-mask semantics per (user, day): repeats never double-count, the
    same user on two days contributes two cells."""
    import ray.data

    from pyreshaper_ray.stages.analytics import event_type_venn

    d0 = np.datetime64("2024-01-01T10:00", "us").item()
    d1 = np.datetime64("2024-01-02T10:00", "us").item()
    ev = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
            "ts": pa.array([d0, d0, d0, d1, d0, d0, d0], pa.timestamp("us")),
            "event_type": pa.array(
                ["view", "view", "click", "purchase",
                 "purchase", "purchase", "view"]
            ),
        }
    )
    rows = {r["mask"]: r["n_cells"]
            for r in event_type_venn(ray.data.from_arrow(ev)).take_all()}
    # user1@d0: view+click=3; user1@d1: purchase=4; user2@d0: 4; user3@d0: 1
    assert rows == {3: 1, 4: 2, 1: 1}


def test_median2_interpolated_semantics(ray_session):
    """Even group: sum of the two middles; odd group: twice the middle."""
    import ray.data

    from pyreshaper_ray.stages.analytics import median2_value_per_type

    ev = pa.table(
        {
            "event_type": pa.array(["a"] * 4 + ["b"] * 3),
            "value": pa.array([0.10, 0.20, 0.30, 0.40, 0.05, 0.07, 0.09]),
        }
    )
    rows = {r["event_type"]: r
            for r in median2_value_per_type(
                ray.data.from_arrow(ev)).take_all()}
    assert rows["a"]["median2_cents"] == 20 + 30  # (0.20+0.30)/2 doubled
    assert rows["b"]["median2_cents"] == 2 * 7
    assert rows["a"]["n"] == 4 and rows["b"]["n"] == 3


def _write(tmp_path, name, table):
    import pyarrow.parquet as pq

    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def test_q21_unique_last_shipper_only(ray_session, tmp_path):
    """Blame needs >=2 suppliers AND a strict (untied) last ship day; the
    per-supplier max is over that supplier's own lines."""
    from pyreshaper_ray.stages.analytics import q21_last_to_ship

    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s3"]),
    }))
    _write(tmp_path, "lineitem", pa.table({
        # order 100: supp 1 ships last (day 3 vs 2) -> blame supp 1
        # order 200: supp 1 and 2 TIE on last day -> nobody blamed
        # order 300: single supplier -> not a multi-supplier order
        # order 400: supp 2 last (two own lines, max day 9) -> blame supp 2
        "l_orderkey": pa.array(
            [100, 100, 200, 200, 300, 400, 400, 400], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 2, 3, 2, 2, 1], pa.int64()),
        "l_shipdate": pa.array([
            _ts("2020-01-03T00:00:00"), _ts("2020-01-02T00:00:00"),
            _ts("2020-01-05T00:00:00"), _ts("2020-01-05T23:00:00"),
            _ts("2020-01-01T00:00:00"),
            _ts("2020-01-09T00:00:00"), _ts("2020-01-04T00:00:00"),
            _ts("2020-01-08T00:00:00"),
        ], pa.timestamp("us")),
    }))
    out = q21_last_to_ship(str(tmp_path)).to_pandas()
    got = dict(zip(out["s_suppkey"], out["n_orders"]))
    assert got == {1: 1, 2: 1}
    assert list(out["s_suppkey"]) == [1, 2]  # n ties -> suppkey ascending


def test_ks_statistic_hand_case(ray_session):
    """a=[1,2,3], b=[2,3,3,4] → sup|F_a−F_b| at v=2: |2/3 − 1/4| = 5/12."""
    import ray

    from pyreshaper_ray.stages.analytics import ks_statistic

    vals = [1.0, 2.0, 3.0, 2.0, 3.0, 3.0, 4.0]
    types = ["purchase"] * 3 + ["click"] * 4
    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(types),
        "value": pa.array(vals, pa.float64()),
    }))
    out = ks_statistic(ds).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_a"], r["n_b"], r["ks_num"]) == (3, 4, 5)
    assert r["ks_ppm"] == (1_000_000 * 5) // 12


def test_ks_statistic_one_side_empty(ray_session):
    import ray

    from pyreshaper_ray.stages.analytics import ks_statistic

    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["purchase", "view"]),
        "value": pa.array([1.0, 2.0], pa.float64()),
    }))
    assert ks_statistic(ds).count() == 0


def test_decayed_user_scores_weights_and_cutoff(ray_session):
    """Weight 2^(40−age), hard 0 beyond 40 days; ties break by user_id."""
    import ray

    from pyreshaper_ray.stages.analytics import decayed_user_scores

    day = 86_400_000_000
    base = int(_ts("2026-03-01T12:00:00").astype(np.int64))
    rows = [  # (user, days_old)
        (1, 0), (1, 1),          # 2^40 + 2^39
        (2, 40), (2, 41),        # 1 + 0
        (3, 0),                  # 2^40  (tie-breaks after nobody)
    ]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array(
            np.array([base - a * day for _, a in rows], np.int64),
            pa.timestamp("us"),
        ),
    }))
    out = decayed_user_scores(ds).to_pandas()
    got = list(zip(out["user_id"], out["score"], out["n_events"]))
    assert got == [
        (1, (1 << 40) + (1 << 39), 2),
        (3, 1 << 40, 1),
        (2, 1, 2),
    ]


def test_scan_task_plan_matches_duckdb_footers(tmp_path):
    """Plan rows equal DuckDB parquet_metadata; task binning is the
    cumulative-target rule and tasks cover contiguous row-group runs."""
    import duckdb
    import pyarrow.parquet as pq

    from pyreshaper_ray.sources.planner import scan_task_plan

    rng = np.random.default_rng(3)
    for name, n in [("alpha", 5000), ("beta", 1200), ("gamma", 10)]:
        t = pa.table({
            "k": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "txt": pa.array(["x" * int(v) for v in rng.integers(1, 80, n)]),
        })
        pq.write_table(t, str(tmp_path / f"{name}.parquet"), row_group_size=1000)

    target = 64 * 1024
    plan = scan_task_plan(str(tmp_path), target_bytes=target)

    con = duckdb.connect()
    ref = con.execute(f"""
        SELECT regexp_extract(file_name, '([a-z]+)[.]parquet$', 1) AS table_name,
               CAST(row_group_id AS BIGINT) AS row_group,
               CAST(MAX(row_group_num_rows) AS BIGINT) AS n_rows,
               CAST(SUM(total_uncompressed_size) AS BIGINT) AS n_bytes
        FROM parquet_metadata('{tmp_path}/*.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
    """).arrow()
    assert plan.select(["table_name", "row_group", "n_rows", "n_bytes"]).equals(
        ref.combine_chunks()
    )
    # cumulative-target binning: task = bytes_before // target, nondecreasing
    nb = plan["n_bytes"].to_numpy(zero_copy_only=False)
    before = np.concatenate([[0], np.cumsum(nb)[:-1]])
    assert (plan["task_id"].to_numpy(zero_copy_only=False) == before // target).all()


def test_zone_skip_plan_flags_and_duckdb_parity(tmp_path):
    """Key-sorted multi-row-group file: groups wholly outside [lo, hi] are
    skippable, boundary-straddling groups are not; footer numbers match
    DuckDB parquet_metadata."""
    import duckdb
    import pyarrow.parquet as pq

    from pyreshaper_ray.sources.planner import zone_skip_plan

    t = pa.table({"k": pa.array(range(1000), pa.int64())})
    p = str(tmp_path / "ev.parquet")
    pq.write_table(t, p, row_group_size=250)  # zones [0,249] ... [750,999]

    plan = zone_skip_plan(p, "k", lo=300, hi=520)
    assert plan["skip"].to_pylist() == [True, False, False, True]
    assert plan["min_v"].to_pylist() == [0, 250, 500, 750]
    assert plan["max_v"].to_pylist() == [249, 499, 749, 999]

    con = duckdb.connect()
    ref = con.execute(f"""
        SELECT CAST(row_group_id AS BIGINT) rg,
               CAST(row_group_num_rows AS BIGINT) n,
               CAST(stats_min_value AS BIGINT) mn,
               CAST(stats_max_value AS BIGINT) mx,
               CAST(stats_null_count AS BIGINT) AS nullcnt
        FROM parquet_metadata('{p}') WHERE path_in_schema = 'k'
        ORDER BY 1
    """).fetchall()
    got = list(zip(plan["row_group"].to_pylist(), plan["n_rows"].to_pylist(),
                   plan["min_v"].to_pylist(), plan["max_v"].to_pylist(),
                   plan["null_count"].to_pylist()))
    assert got == ref


def test_lsh_parameter_plan_properties():
    """bands·rows == n_perm; rows/band grows with threshold; the implied
    S-curve midpoint (1/b)^(1/r) tracks the target threshold."""
    from pyreshaper_ray.sources.planner import lsh_parameter_plan

    plan = lsh_parameter_plan(n_perm=128).to_pydict()
    rs = plan["rows_per_band"]
    for b, r in zip(plan["bands"], rs):
        assert b * r == 128
    assert rs == sorted(rs)
    for t_pct, b, r in zip(plan["threshold_pct"], plan["bands"], rs):
        mid = (1.0 / b) ** (1.0 / r)
        assert abs(mid - t_pct / 100.0) < 0.17, (t_pct, b, r, mid)
    # deterministic
    again = lsh_parameter_plan(n_perm=128).to_pydict()
    assert again == plan


def _skyline_brute(pts):
    """Brute-force 2-D skyline: (total, last) pairs, >= / strict-on-one."""
    keep = []
    for i, (t1, l1) in enumerate(pts):
        dom = any(
            (t2 >= t1 and l2 >= l1 and (t2 > t1 or l2 > l1))
            for j, (t2, l2) in enumerate(pts)
            if j != i
        )
        if not dom:
            keep.append(i)
    return keep


def test_skyline_users_hand_case(ray_session):
    """Ties on total, ties on last, an exact duplicate pair, and a clearly
    dominated interior point — forced across several blocks."""
    import ray.data

    from pyreshaper_ray.stages.analytics import skyline_users

    us = 1_000_000
    # user -> (events summing to total cents, last ts)
    # u1 (300, t=50)  skyline
    # u2 (300, t=40)  dominated by u1 (equal total, smaller last)
    # u3 (200, t=90)  skyline (worse total, better recency)
    # u4 (200, t=90)  exact duplicate of u3 -> BOTH survive
    # u5 (100, t=60)  dominated by u3/u4
    # u6 (400, t=10)  skyline (best total)
    rows = [
        (1, 3.00, 50), (2, 1.00, 40), (2, 2.00, 30), (3, 2.00, 90),
        (4, 2.00, 90), (5, 1.00, 60), (6, 4.00, 10),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "value": pa.array([r[1] for r in rows], pa.float64()),
        "ts": pa.array(
            np.array([r[2] * us for r in rows], dtype=np.int64)
        ).cast(pa.timestamp("us")),
    })
    out = (
        skyline_users(ray.data.from_arrow(t).repartition(4))
        .to_pandas()
        .set_index("user_id")
    )
    assert sorted(out.index.tolist()) == [1, 3, 4, 6]
    assert out.loc[3, "total_cents"] == 200 and out.loc[3, "last_us"] == 90 * us


def test_skyline_users_random_vs_brute(ray_session):
    """Randomized cross-check vs the O(n²) reference, heavy total ties so
    equal-total group runs span sorted-block boundaries."""
    import ray.data

    from pyreshaper_ray.stages.analytics import skyline_users

    rng = np.random.default_rng(7)
    n = 400
    users = np.arange(1, n + 1, dtype=np.int64)
    # few distinct totals (ties!) and few distinct ts values
    cents = rng.integers(1, 8, n) * 100
    ts = rng.integers(1, 9, n) * 1_000_000
    t = pa.table({
        "user_id": pa.array(users),
        "value": pa.array(cents / 100.0, pa.float64()),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
    })
    out = skyline_users(ray.data.from_arrow(t).repartition(16)).to_pandas()
    keep = _skyline_brute(list(zip(cents.tolist(), ts.tolist())))
    want = sorted(users[keep].tolist())
    assert out["user_id"].tolist() == want


def test_skyline_users_distinct_totals_vs_brute(ray_session):
    """Mostly-unique totals with anti-correlated recency: multi-group
    blocks where `last` jumps UP between groups — the pre-tail-max
    regression case (first non-tail row is not the pre-tail max)."""
    import ray.data

    from pyreshaper_ray.stages.analytics import skyline_users

    rng = np.random.default_rng(11)
    n = 500
    users = np.arange(1, n + 1, dtype=np.int64)
    cents = rng.permutation(n).astype(np.int64) * 100 + 100
    # recency loosely anti-correlated with total + noise
    ts = ((n - cents // 100) * 10 + rng.integers(0, 25, n)) * 1_000_000
    t = pa.table({
        "user_id": pa.array(users),
        "value": pa.array(cents / 100.0, pa.float64()),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
    })
    out = skyline_users(ray.data.from_arrow(t).repartition(16)).to_pandas()
    keep = _skyline_brute(list(zip(cents.tolist(), ts.tolist())))
    assert out["user_id"].tolist() == sorted(users[keep].tolist())


def test_order_total_reconciliation_hand_case(ray_session, tmp_path):
    """One exact match, one overshoot by a known drift, one undershoot."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.analytics import order_total_reconciliation

    # order 1: ep=100.00, d=0, t=0 -> net = 10000*100*100 = 1e8
    #          header 100.00 -> 10000*10000 = 1e8  (match)
    # order 2: same line, header 99.99 -> over by 10000 (1 cent * 1e4)
    # order 3: same line, header 100.01 -> under by 10000
    li = pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([100.0, 100.0, 100.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
        "l_tax": pa.array([0.0, 0.0, 0.0], pa.float64()),
    })
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([100.0, 99.99, 100.01], pa.float64()),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = (
        order_total_reconciliation(str(tmp_path)).to_pandas().set_index("bucket")
    )
    assert out.loc["match", "n_orders"] == 1
    assert out.loc["match", "abs_drift"] == 0
    assert out.loc["over", "abs_drift"] == 10_000
    assert out.loc["under", "abs_drift"] == 10_000


def test_pivot_daily_type_counts_hand_case(ray_session):
    """Known mix on one day incl. an unknown type -> 'other'; totals add."""
    import ray.data

    from pyreshaper_ray.stages.analytics import pivot_daily_type_counts

    day = 86_400_000_000
    t = pa.table({
        "ts": pa.array(
            np.array([0, 1, 2, 3, day, day + 1], dtype=np.int64)
        ).cast(pa.timestamp("us")),
        "event_type": pa.array(
            ["click", "click", "weird", "view", "purchase", "purchase"],
            pa.string(),
        ),
    })
    out = (
        pivot_daily_type_counts(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
    )
    assert len(out) == 2
    d0 = out.iloc[0]
    assert (d0["click"], d0["view"], d0["other"], d0["total"]) == (2, 1, 1, 4)
    d1 = out.iloc[1]
    assert (d1["purchase"], d1["total"]) == (2, 2)


def test_copurchase_pairs_cross_block_order(ray_session):
    """An order whose lineitems span input blocks must still produce its
    pairs — the hash-partition-by-orderkey stage is what guarantees it."""
    import ray.data

    from pyreshaper_ray.stages.analytics import copurchase_part_pairs

    # order 1 has parts {10, 20, 30} scattered across blocks (plus a
    # duplicate 10 to exercise the per-order distinct); order 2 repeats
    # the (10, 20) pair; order 3 is a singleton
    t = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
            "l_partkey": pa.array([10, 20, 30, 10, 20, 10, 99], pa.int64()),
        }
    )
    out = (
        copurchase_part_pairs(ray.data.from_arrow(t).repartition(7))
        .to_pandas()
        .sort_values(["n", "part_a", "part_b"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    got = list(out.itertuples(index=False, name=None))
    assert got == [(10, 20, 2), (10, 30, 1), (20, 30, 1)]


def test_copurchase_pairs_cap_keeps_smallest_parts(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import copurchase_part_pairs

    # one order with 5 parts, cap 3: only pairs among the 3 smallest keys
    t = pa.table(
        {
            "l_orderkey": pa.array([1] * 5, pa.int64()),
            "l_partkey": pa.array([5, 4, 3, 2, 1], pa.int64()),
        }
    )
    out = copurchase_part_pairs(
        ray.data.from_arrow(t).repartition(2), max_order_parts=3
    ).to_pandas()
    pairs = {(a, b) for a, b, _ in out.itertuples(index=False, name=None)}
    assert pairs == {(1, 2), (1, 3), (2, 3)}


def test_spend_decile_census_hand(ray_session):
    """20 customers spending 1..20 dollars: each decile holds exactly two
    customers; ties at a bound land in the LOWER bucket."""
    import ray.data

    from pyreshaper_ray.stages.analytics import spend_decile_census

    t = pa.table(
        {
            "o_custkey": pa.array(list(range(1, 21)), pa.int64()),
            "o_totalprice": pa.array(
                [float(i) for i in range(1, 21)], pa.float64()
            ),
        }
    )
    out = spend_decile_census(ray.data.from_arrow(t).repartition(4))
    assert out["decile"].to_pylist() == list(range(1, 11))
    assert out["n_customers"].to_pylist() == [2] * 10
    # decile d holds spends (2d-1, 2d) dollars -> cents
    assert out["spend_cents"].to_pylist() == [
        (2 * d - 1 + 2 * d) * 100 for d in range(1, 11)
    ]


def test_spend_decile_census_empty(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import spend_decile_census

    t = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "o_totalprice": pa.array([], pa.float64()),
        }
    )
    out = spend_decile_census(ray.data.from_arrow(t))
    assert out.num_rows == 0


def test_rfm_scores_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import rfm_scores

    def ev(rows):
        return pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    [np.datetime64(r[2], "us") for r in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            }
        )

    # 4 purchasers; user 9's view event must be ignored entirely
    rows = [
        (1, "purchase", "2024-01-10T12:00:00", 10.00),   # r=0d f=1 m=1000
        (2, "purchase", "2024-01-09T12:00:00", 5.00),
        (2, "purchase", "2024-01-08T12:00:00", 5.00),    # r=1d f=2 m=1000
        (3, "purchase", "2024-01-05T12:00:00", 20.00),   # r=5d f=1 m=2000
        (4, "purchase", "2024-01-01T12:00:00", 1.00),    # r=9d f=1 m=100
        (9, "view", "2024-01-10T23:00:00", 99.0),
    ]
    out = (
        rfm_scores(ray.data.from_arrow(ev(rows)).repartition(3))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3, 4]
    assert out.loc[1, "r_days"] == 0 and out.loc[4, "r_days"] == 9
    assert out.loc[2, "f_n"] == 2 and out.loc[2, "m_cents"] == 1000
    # n=4 -> quartile bound positions ceil(k·4/4)=1,2,3 (1-based)
    # r_days sorted [0,1,5,9] -> bounds 0,1,5: codes r: u1->1, u2->2, u3->3, u4->4
    assert list(out["r_code"]) == [1, 2, 3, 4]
    # f_n sorted [1,1,1,2] -> bounds 1,1,1: f codes: 1 for f=1, 4 for f=2
    assert list(out["f_code"]) == [1, 4, 1, 1]
    # m_cents sorted [100,1000,1000,2000] -> bounds 100,1000,1000
    # codes: 1000->2, 1000->2, 2000->4, 100->1
    assert list(out["m_code"]) == [2, 2, 4, 1]


def test_systematic_sample_every_step(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import systematic_sample_events

    rows = []
    t0 = np.datetime64("2024-01-01T00:00:00", "s")
    for i in range(25):
        rows.append((100 - i, 1, "x", str(t0 + i * 60), 1.0))  # ids descend
    ev = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array(
                [np.datetime64(r[3], "us") for r in rows], pa.timestamp("us")
            ),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    ds = ray.data.from_arrow(ev).repartition(4)
    out = (
        systematic_sample_events(ds, step=7)
        .to_pandas()
        .sort_values("rank")
    )
    # ranks 1, 8, 15, 22 under ts order; ids descend with time
    assert list(out["rank"]) == [1, 8, 15, 22]
    assert list(out["event_id"]) == [100, 93, 86, 79]


def test_asof_join_forward_semantics(ray_session):
    """Forward direction: earliest right >= left; exact tie inclusive;
    null when the key's right rows are all EARLIER or absent."""
    import ray.data

    from pyreshaper_ray.stages.joins import asof_join_last

    left = pa.table(
        {
            "k": pa.array([1, 1, 2, 3], pa.int64()),
            "ts": pa.array(
                [
                    _ts("2024-01-01T00:00:10"),
                    _ts("2024-01-01T00:00:05"),
                    _ts("2024-01-01T00:00:07"),
                    _ts("2024-01-01T00:00:11"),
                ],
                pa.timestamp("us"),
            ),
            "id": pa.array([100, 101, 102, 103], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, 3], pa.int64()),
            "rts": pa.array(
                [
                    _ts("2024-01-01T00:00:05"),
                    _ts("2024-01-01T00:00:08"),
                    _ts("2024-01-01T00:00:09"),
                ],
                pa.timestamp("us"),
            ),
        }
    )
    out = asof_join_last(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        on="k",
        left_ts="ts",
        left_id="id",
        right_on="k",
        right_ts="rts",
        direction="forward",
    ).take_all()
    by_id = {r["lid"]: r["asof_ts"] for r in out}
    assert by_id[100] is None  # both right rows earlier than 00:10
    # exact tie counts (>=)
    assert by_id[101] == _ts("2024-01-01T00:00:05").astype("datetime64[us]").item()
    assert by_id[102] is None  # no right rows for key 2
    assert by_id[103] is None  # key 3's only right row is earlier


def test_fanout_histogram_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import fanout_histogram_lineitems

    li = pa.table(
        {
            "l_orderkey": pa.array(
                [1, 1, 1, 2, 3, 3, 4, 5, 5, 5], pa.int64()
            )
        }
    )
    out = fanout_histogram_lineitems(
        ray.data.from_arrow(li).repartition(3)
    ).to_pydict()
    # counts: order1=3, order2=1, order3=2, order4=1, order5=3
    assert out["k"] == [1, 2, 3]
    assert out["n_orders"] == [2, 1, 2]


def test_user_burstiness_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import user_burstiness

    def ev(rows):
        return pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [np.datetime64(r[1], "us") for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )

    # user 1: hours [1,1,1,1] -> var 0 <= mean -> steady
    # user 2: hours [1,7] -> m=2 S=8 Q=50: mQ-S^2=36 > mS=16 -> bursty
    rows = []
    for h in range(4):
        rows.append((1, f"2024-01-01T0{h}:15:00"))
    rows.append((2, "2024-01-01T00:10:00"))
    for i in range(7):
        rows.append((2, f"2024-01-01T05:0{i}:00"))
    out = (
        user_burstiness(ray.data.from_arrow(ev(rows)).repartition(3))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.loc[1, "overdispersed"] == 0 and out.loc[1, "m_hours"] == 4
    assert out.loc[2, "overdispersed"] == 1
    assert out.loc[2, "s_events"] == 8 and out.loc[2, "q_sumsq"] == 50


def test_funnel3_ordered_semantics(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import funnel3_ordered

    def ev(rows):
        return pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    [np.datetime64(r[2], "us") for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )

    rows = [
        # user 1 full ordered funnel
        (1, "view", "2024-01-01T10:00:00"),
        (1, "click", "2024-01-01T10:05:00"),
        (1, "purchase", "2024-01-01T10:10:00"),
        # user 2 WRONG ORDER: purchase before click -> stops at view+click
        (2, "view", "2024-01-01T10:00:00"),
        (2, "purchase", "2024-01-01T10:02:00"),
        (2, "click", "2024-01-01T10:04:00"),
        # user 3: click before any view -> only counted as user
        (3, "click", "2024-01-01T09:00:00"),
        # user 4: view only
        (4, "view", "2024-01-01T08:00:00"),
    ]
    out = funnel3_ordered(
        ray.data.from_arrow(ev(rows)).repartition(3)
    ).to_pydict()
    assert out["n_users"] == [4]
    assert out["n_view"] == [3]        # users 1, 2, 4
    assert out["n_view_click"] == [2]  # users 1, 2
    assert out["n_full"] == [1]        # user 1 only


def test_markov_entropy_rate_deterministic_vs_uniform(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import markov_entropy_rate

    def ev(rows):
        return pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    [np.datetime64(r[2], "us") for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )

    # deterministic a->b->a->b: every state has ONE successor -> H = 0
    rows = [
        (1, "a", "2024-01-01T00:00:00"),
        (1, "b", "2024-01-01T00:01:00"),
        (1, "a", "2024-01-01T00:02:00"),
        (1, "b", "2024-01-01T00:03:00"),
    ]
    t = markov_entropy_rate(ray.data.from_arrow(ev(rows))).to_pydict()
    assert t["h_micro_nats"] == [0] and t["n_transitions"] == [3]
    # a splits 50/50 to b and c -> H = ln 2 from a's 2 transitions out of
    # 2 total-from-a; overall stream: a->b, a->c only -> H = ln2 = 693147
    rows2 = [
        (1, "a", "2024-01-01T00:00:00"),
        (1, "b", "2024-01-01T00:01:00"),
        (2, "a", "2024-01-01T00:00:00"),
        (2, "c", "2024-01-01T00:01:00"),
    ]
    t2 = markov_entropy_rate(ray.data.from_arrow(ev(rows2)).repartition(2)).to_pydict()
    assert t2["h_micro_nats"] == [693147]


def test_loo_source_deltas_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import loo_source_word_deltas

    docs = pa.table(
        {
            "source": pa.array(["s0", "s0", "s1"], pa.string()),
            "text": pa.array(
                ["one two", "three four five six", "w"], pa.string()
            ),
        }
    )
    out = (
        loo_source_word_deltas(ray.data.from_arrow(docs).repartition(2))
        .to_pandas()
        .set_index("source")
    )
    # totals: 7 words / 3 docs -> all_mean = 2333333
    assert (out["all_mean_micro"] == 2333333).all()
    # drop s0 -> 1/1 = 1000000; drop s1 -> 6/2 = 3000000
    assert out.loc["s0", "loo_mean_micro"] == 1000000
    assert out.loc["s1", "loo_mean_micro"] == 3000000
    assert out.loc["s1", "delta_micro"] == 3000000 - 2333333


def test_tier_route_plan_decisions():
    from pyreshaper_ray.sources.planner import tier_route_plan

    DAY = 86_400_000_000
    now = 100 * DAY
    # recent range, minute resolution -> 1m is the only fine-enough tier
    t = tier_route_plan(99 * DAY, 100 * DAY, 60_000_000, now).to_pandas()
    assert list(t[t["chosen"]]["tier"]) == ["1m"]
    # hourly request on a recent range -> coarsest qualifying is 1h
    t = tier_route_plan(99 * DAY, 100 * DAY, 3_600_000_000, now).to_pandas()
    assert list(t[t["chosen"]]["tier"]) == ["1h"]
    # old range (beyond 1m's 7d AND 1h's 90d TTLs... use 95d old), minute
    # resolution -> nothing fine enough is retained -> no tier chosen
    t = tier_route_plan(2 * DAY, 3 * DAY, 60_000_000, now).to_pandas()
    assert not t["chosen"].any()
    # same old range, DAILY resolution -> 1d kept forever, chosen
    t = tier_route_plan(2 * DAY, 3 * DAY, DAY, now).to_pandas()
    assert list(t[t["chosen"]]["tier"]) == ["1d"]
    # custom keep: everything forever -> hourly request picks 1h even old
    keep = {"1m": None, "1h": None, "1d": None, "1w": None}
    t = tier_route_plan(2 * DAY, 3 * DAY, 3_600_000_000, now, keep_us=keep).to_pandas()
    assert list(t[t["chosen"]]["tier"]) == ["1h"]
    # est_points is ceil(range/res)
    row_1m = t.set_index("tier").loc["1m"]
    assert row_1m["est_points"] == DAY // 60_000_000


def test_frequent_triples_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import frequent_triples_parts

    # orders: {1,2,3} x3, {1,2,4} x1 -> top triple (1,2,3) n=3; duplicate
    # lineitems of the same part within an order must count once
    rows_ok, rows_pk = [], []
    oid = 0
    for _ in range(3):
        oid += 1
        for p in (3, 1, 2, 2):  # unsorted + dup
            rows_ok.append(oid)
            rows_pk.append(p)
    oid += 1
    for p in (1, 2, 4):
        rows_ok.append(oid)
        rows_pk.append(p)
    li = pa.table(
        {
            "l_orderkey": pa.array(rows_ok, pa.int64()),
            "l_partkey": pa.array(rows_pk, pa.int64()),
        }
    )
    out = frequent_triples_parts(
        ray.data.from_arrow(li).repartition(3), k=5
    ).to_pandas()
    assert list(out.iloc[0][["part_a", "part_b", "part_c", "n"]]) == [1, 2, 3, 3]
    assert list(out.iloc[1][["part_a", "part_b", "part_c", "n"]]) == [1, 2, 4, 1]
    assert len(out) == 2


def test_session_entry_conversion_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import session_entry_conversion

    def ev(rows):
        return pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    [np.datetime64(r[2], "us") for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )

    rows = [
        # user 1 session A: entry view, contains purchase -> converted
        (1, "view", "2024-01-01T10:00:00"),
        (1, "purchase", "2024-01-01T10:10:00"),
        # user 1 session B (gap > 30m): entry view, no purchase
        (1, "view", "2024-01-01T12:00:00"),
        # user 2 session: entry click, no purchase
        (2, "click", "2024-01-01T09:00:00"),
    ]
    out = (
        session_entry_conversion(ray.data.from_arrow(ev(rows)).repartition(2))
        .to_pandas()
        .set_index("entry_type")
    )
    assert out.loc["view", "n_sessions"] == 2
    assert out.loc["view", "n_converted"] == 1
    assert out.loc["click", "n_sessions"] == 1
    assert out.loc["click", "n_converted"] == 0


def test_daily_median_value_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import daily_median_value

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

    rows = [
        ("2024-01-01T01:00:00", 1.00),
        ("2024-01-01T02:00:00", 9.00),
        ("2024-01-01T03:00:00", 5.00),   # day1 odd: median 500
        ("2024-01-02T01:00:00", 2.00),
        ("2024-01-02T02:00:00", 4.00),   # day2 even: LOWER median 200
    ]
    out = (
        daily_median_value(ray.data.from_arrow(ev(rows)).repartition(2))
        .to_pandas()
        .sort_values("day")
    )
    assert list(out["median_cents"]) == [500, 200]
    assert list(out["n"]) == [3, 2]


def test_conversion_latency_percentiles_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import conversion_latency_percentiles

    def ev(rows):
        return pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array(
                    [np.datetime64(r[2], "us") for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )

    # converted users with gaps 10s, 20s, 30s, 40s; one non-converter
    rows = []
    for u, gap in ((1, 10), (2, 20), (3, 30), (4, 40)):
        rows.append((u, "view", "2024-01-01T10:00:00"))
        rows.append((u, "purchase", f"2024-01-01T10:00:{gap:02d}"))
    rows.append((9, "view", "2024-01-01T10:00:00"))
    t = conversion_latency_percentiles(
        ray.data.from_arrow(ev(rows)).repartition(3)
    ).to_pydict()
    # n=4: p50 rank ceil(200/100)=2 -> 20; p90 rank ceil(360/100)=4 -> 40
    assert t["n_converted"] == [4]
    assert t["p50_s"] == [20] and t["p90_s"] == [40]


def test_conversion_latency_no_converters(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import conversion_latency_percentiles

    ev = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["view"], pa.string()),
            "ts": pa.array(
                [np.datetime64("2024-01-01T00:00:00", "us")], pa.timestamp("us")
            ),
        }
    )
    assert conversion_latency_percentiles(
        ray.data.from_arrow(ev)
    ).num_rows == 0


def test_revenue_pareto_share_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.analytics import revenue_pareto_share

    def ev(rows):
        return pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([float(r[2]) for r in rows], pa.float64()),
            }
        )

    # 5 purchasers: spends 80, 5, 5, 5, 5 -> top 20% = 1 user with 80
    # of total 100 -> share 800000 ppm; a view row must be ignored
    rows = [(1, "purchase", 80.0)]
    rows += [(u, "purchase", 5.0) for u in (2, 3, 4, 5)]
    rows.append((9, "view", 999.0))
    t = revenue_pareto_share(
        ray.data.from_arrow(ev(rows)).repartition(3)
    ).to_pydict()
    assert t["n_users"] == [5] and t["k_top"] == [1]
    assert t["top_cents"] == [8000] and t["total_cents"] == [10000]
    assert t["share_ppm"] == [800000]


def test_rfm_scores_empty_input_schema(ray_session):
    """ADVICE r3: a purchase-free corpus must still return the documented
    seven-column BIGINT schema, not the intermediate per_user columns."""
    import ray.data

    from pyreshaper_ray.stages.analytics import rfm_scores

    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us")),
            "value": pa.array([], pa.float64()),
        }
    )
    res = rfm_scores(ray.data.from_arrow(empty))
    out = res.to_pandas()
    assert len(out) == 0
    assert list(out.columns) == [
        "user_id", "r_days", "f_n", "m_cents", "r_code", "f_code", "m_code",
    ]


def test_hash_join_key_type_normalization(ray_session):
    """The task-based join's type-normalized key hashing must co-partition
    equal keys even when the two sides carry them with different physical
    types/nullability: int32 vs int64, date32 vs timestamp-cast days,
    nullable vs non-nullable, plus SQL null-key semantics and a
    two-column key."""
    import numpy as np
    import ray.data

    from pyreshaper_ray.stages.joins import hash_join

    # int32 keys vs int64 keys — same logical values must meet
    L = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, None, 4], pa.int32()), "a": ["w", "x", "y", "z"]})
    )
    R = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 4, None], pa.int64()), "b": [20, 40, 99]})
    )
    j = hash_join(L, R, on="k", join_type="inner", num_partitions=7).to_pandas()
    assert sorted(zip(j.k, j.b)) == [(2, 20), (4, 40)]  # nulls never match

    # date32 on both sides
    import datetime

    d = pa.array(
        [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)], pa.date32()
    )
    L2 = ray.data.from_arrow(pa.table({"d": d, "v": [1, 2]}))
    R2 = ray.data.from_arrow(pa.table({"d": d.slice(1, 1), "w": [9]}))
    j2 = hash_join(L2, R2, on="d", join_type="left_outer", num_partitions=5).to_pandas()
    assert len(j2) == 2 and sorted(j2.w.fillna(-1)) == [-1, 9]

    # two-column key
    L3 = ray.data.from_arrow(
        pa.table({"x": [1, 1, 2], "y": ["a", "b", "a"], "v": [10, 11, 12]})
    )
    R3 = ray.data.from_arrow(pa.table({"x": [1, 2], "y": ["b", "a"], "u": [5, 6]}))
    j3 = hash_join(L3, R3, on=("x", "y"), join_type="inner", num_partitions=3).to_pandas()
    assert sorted(zip(j3.v, j3.u)) == [(11, 5), (12, 6)]
