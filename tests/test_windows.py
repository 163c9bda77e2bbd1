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
