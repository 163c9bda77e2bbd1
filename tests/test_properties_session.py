"""Property-based gates for the session's exact kernels: random inputs vs
direct single-process references (the reshaperTests strategy: distributed
result == recomputed expectation, bit for bit)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(counts=st.lists(st.integers(1, 40), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_gini_property(ray_session, counts):
    import ray.data

    from pyreshaper_ray.stages.analytics import gini_user_activity

    users = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    t = pa.table({"user_id": pa.array(users, pa.int64())})
    row = gini_user_activity(
        ray.data.from_arrow(t).repartition(3)
    ).take_all()[0]
    x = np.sort(np.array(counts, np.int64))
    n = len(x)
    want = int(((2 * np.arange(1, n + 1) - n - 1) * x).sum())
    assert row["n_users"] == n
    assert row["total_events"] == int(x.sum())
    assert row["gini_num"] == want


@given(
    a=st.lists(st.integers(0, 8), min_size=1, max_size=25),
    b=st.lists(st.integers(0, 8), min_size=1, max_size=25),
)
@settings(**_SETTINGS)
def test_mannwhitney_property(ray_session, a, b):
    import ray.data

    from pyreshaper_ray.stages.analytics import mannwhitney_components

    vals = [v / 100 for v in a] + [v / 100 for v in b]
    types = ["purchase"] * len(a) + ["click"] * len(b)
    t = pa.table(
        {
            "event_type": pa.array(types),
            "value": pa.array(vals, pa.float64()),
        }
    )
    row = mannwhitney_components(
        ray.data.from_arrow(t).repartition(3)
    ).take_all()[0]
    # direct doubled midrank sum over group A
    allv = np.array(a + b, np.int64)
    ranks2 = np.empty(len(allv), np.int64)
    order = np.argsort(allv, kind="stable")
    sorted_v = allv[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        # doubled midrank of the tie run [i, j): (i+1) + j over 1-based
        ranks2[order[i:j]] = (i + 1) + j
        i = j
    want_rs2 = int(ranks2[: len(a)].sum())
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["ranksum2_a"] == want_rs2
    assert row["u2_a"] == want_rs2 - len(a) * (len(a) + 1)


@given(vals=st.lists(st.integers(0, 500), min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_equidepth_property(ray_session, vals):
    import ray.data

    from pyreshaper_ray.stages.analytics import equidepth_bin_events

    t = pa.table(
        {
            "event_id": pa.array(range(len(vals)), pa.int64()),
            "value": pa.array([v / 100 for v in vals], pa.float64()),
        }
    )
    df = (
        equidepth_bin_events(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    v = np.sort(np.array(vals, np.int64))
    n = len(v)
    edges = np.array(
        [v[max(-(-d * n // 10), 1) - 1] for d in range(1, 10)], np.int64
    )
    ref = 1 + np.searchsorted(edges, np.array(vals, np.int64), side="left")
    assert (df["bucket"].to_numpy() == ref).all()


@given(vals=st.lists(st.integers(0, 300), min_size=1, max_size=50))
@settings(**_SETTINGS)
def test_median2_property(ray_session, vals):
    import ray.data

    from pyreshaper_ray.stages.analytics import median2_value_per_type

    t = pa.table(
        {
            "event_type": pa.array(["x"] * len(vals)),
            "value": pa.array([v / 100 for v in vals], pa.float64()),
        }
    )
    row = median2_value_per_type(
        ray.data.from_arrow(t).repartition(2)
    ).take_all()[0]
    s = np.sort(np.array(vals, np.int64))
    n = len(s)
    want = int(s[(n + 1) // 2 - 1] + s[n // 2])
    assert row["n"] == n
    assert row["median2_cents"] == want
