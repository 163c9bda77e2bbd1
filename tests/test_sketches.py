"""Sketch-operator gates: HLL error bound + deterministic hash sampling.

``approx_distinct_users`` has no SQL oracle (sketches aren't
SQL-expressible), so its correctness gate lives here: the estimate must land
within 3 % of the exact distinct count at every group, and be bit-identical
across two independent runs (determinism is what makes the rows-only driver
check meaningful).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def test_hll_registers_merge_associative():
    from pyreshaper_ray.stages.sketches import hll_estimate, hll_registers

    keys = np.arange(20_000, dtype=np.int64) * 2654435761 + 7
    whole = hll_registers(keys)
    parts = [hll_registers(k) for k in np.array_split(keys, 7)]
    merged = np.stack(parts).max(axis=0)
    # merging per-block sketches must equal sketching the whole input
    assert np.array_equal(whole, merged)
    est = hll_estimate(whole)
    assert abs(est / 20_000 - 1) < 0.03


def test_hll_small_range_exactish():
    from pyreshaper_ray.stages.sketches import hll_estimate, hll_registers

    keys = np.arange(50, dtype=np.int64)
    est = hll_estimate(hll_registers(keys))
    # linear-counting regime: tiny cardinalities are near-exact
    assert abs(est - 50) <= 1


def test_approx_distinct_users_vs_exact(ray_session):
    import duckdb

    import ray.data

    from pyreshaper_ray.stages.sketches import approx_distinct_users

    ev = ray.data.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"]
    )
    got = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_users(ev).take_all()
    }
    exact = dict(
        duckdb.connect()
        .execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM "
            f"read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"
        )
        .fetchall()
    )
    assert set(got) == set(exact)
    for t, n in exact.items():
        assert abs(got[t] / n - 1) <= 0.03, (t, got[t], n)

    # determinism: a second run returns identical estimates
    again = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_users(ev).take_all()
    }
    assert again == got


def test_hash_sample_rate_and_subset(ray_session):
    import ray.data

    from pyreshaper_ray.stages.sketches import hash_sample

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    n_total = docs.count()
    kept = hash_sample(docs).take_all()
    ids = {r["doc_id"] for r in kept}
    # 1/8 nominal rate, generous tolerance at fixture size
    assert 0.03 * n_total <= len(ids) <= 0.30 * n_total
    # halving the threshold yields a strict subset (nested samples)
    half = {r["doc_id"] for r in hash_sample(docs, keep_below="1000").take_all()}
    assert half <= ids


def test_ddsketch_relative_error(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data

    from pyreshaper_ray.stages.sketches import approx_value_quantiles

    ev = ray.data.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["value", "event_type"]
    )
    got = {r["event_type"]: r for r in approx_value_quantiles(ev).take_all()}

    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["value", "event_type"])
    v = t["value"].to_numpy(zero_copy_only=False)
    et = np.array(t["event_type"].to_pylist())
    for ty in np.unique(et):
        x = np.sort(v[et == ty])
        for q in (0.5, 0.95, 0.99):
            exact = x[max(0, int(np.ceil(q * len(x))) - 1)]
            est = got[ty][f"p{int(q * 100)}"]
            # DDSketch guarantee: 1% relative error (plus rank-vs-value
            # interpolation slack at tiny group sizes)
            assert abs(est / exact - 1) <= 0.02, (ty, q, est, exact)

    again = {r["event_type"]: r for r in approx_value_quantiles(ev).take_all()}
    assert again == got


def test_bloom_join_equals_plain_join(ray_session):
    """Bloom pruning must never change results — only shuffle volume."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from pyreshaper_ray.stages.joins import (
        bloom_from_dataset,
        bloom_hash_join,
        bloom_prefilter,
        hash_join,
    )

    rng = np.random.default_rng(11)
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(rng.integers(0, 10_000, 5_000), pa.int64()),
                "x": pa.array(np.arange(5_000), pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(np.arange(0, 400, dtype=np.int64), pa.int64()),
                "y": pa.array(np.arange(400), pa.int64()),
            }
        )
    )
    plain = sorted(
        (r["k"], r["x"], r["y"]) for r in hash_join(left, right, on="k").take_all()
    )
    bloomed = sorted(
        (r["k"], r["x"], r["y"])
        for r in bloom_hash_join(left, right, on="k").take_all()
    )
    assert plain == bloomed and len(plain) > 0

    # pruning actually drops definitely-absent keys (~96% here)
    words = bloom_from_dataset(right, "k")
    kept = bloom_prefilter(left, "k", words).count()
    assert kept < 0.2 * 5_000
    assert kept >= len({r[0] for r in plain})


def test_heavy_hitters_error_bound(ray_session):
    """Misra-Gries sketch: every reported count is a lower bound within
    max_err of the exact count, and the exact top terms surface."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    import ray.data
    from pyreshaper_ray.stages.sketches import heavy_hitters_terms

    sf_dir = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out = heavy_hitters_terms(docs, k=10, capacity=256).to_pandas()
    assert len(out) == 10

    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    exact = Counter()
    for t in texts:
        exact.update(tok for tok in re.split(r"[^a-z0-9]+", t.lower()) if tok)

    max_err = int(out["max_err"].iloc[0])
    for r in out.itertuples():
        assert r.est_count <= exact[r.term] <= r.est_count + max_err

    # the unambiguous exact top-3 terms must all be reported
    top_exact = [t for t, _ in exact.most_common(3)]
    assert set(top_exact) <= set(out["term"])


def test_sample_per_stratum_block_invariant(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.sketches import sample_per_stratum

    # stratum 'a': 20 docs -> expect the 3 with smallest md5(id);
    # stratum 'b': 2 docs (< k) -> both kept
    ids = list(range(100, 120)) + [900, 901]
    src = ["a"] * 20 + ["b"] * 2
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(src, pa.string()),
            "n_chars": pa.array([i * 3 for i in ids], pa.int64()),
        }
    )
    a_sorted = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i in range(100, 120)
    )
    want_a = sorted(i for _, i in a_sorted[:3])
    for nblocks in (1, 5):
        got = {}
        for r in sample_per_stratum(
            ray.data.from_arrow(t).repartition(nblocks), k=3
        ).take_all():
            got.setdefault(r["source"], []).append(r["doc_id"])
        assert sorted(got["a"]) == want_a, nblocks
        assert sorted(got["b"]) == [900, 901], nblocks


def test_hll_cascade_bit_exact_vs_direct(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.sketches import (
        hll_estimate,
        hll_registers,
        hll_users_window_cascade,
    )

    # 3 hours, users overlapping across minutes within each hour
    rng = np.random.default_rng(11)
    rows_ts, rows_uid = [], []
    for h in range(3):
        for m in range(0, 60, 7):
            uids = rng.integers(0, 500, size=40)
            for u in uids:
                rows_ts.append(np.datetime64(f"2024-01-01T{10 + h:02d}:{m:02d}:00", "us"))
                rows_uid.append(int(u))
    t = pa.table(
        {
            "user_id": pa.array(rows_uid, pa.int64()),
            "ts": pa.array(rows_ts, pa.timestamp("us")),
        }
    )
    out = {
        r["window_start"]: r["approx_users"]
        for r in hll_users_window_cascade(
            ray.data.from_arrow(t).repartition(5)
        ).take_all()
    }
    assert len(out) == 3
    ts_np = np.array(rows_ts, dtype="datetime64[us]")
    uid_np = np.array(rows_uid, dtype=np.int64)
    for h in range(3):
        w = np.datetime64(f"2024-01-01T{10 + h:02d}:00:00", "us")
        in_h = (ts_np >= w) & (ts_np < w + np.timedelta64(1, "h"))
        # lattice property: cascaded merge == direct sketch of the hour,
        # register-bit-exact, so estimates are IDENTICAL integers
        direct = hll_estimate(hll_registers(uid_np[in_h]))
        assert out[w.item()] == direct
        exact = len(np.unique(uid_np[in_h]))
        assert abs(out[w.item()] / exact - 1.0) <= 0.05


def test_cms_one_sided_bound(ray_session):
    """CMS never underestimates, and the overestimate respects the εN
    bound with generous slack (deterministic hashes, no probability)."""
    import ray.data

    from pyreshaper_ray.stages.sketches import cms_term_counts

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    rows = cms_term_counts(ds, n_probes=10, width=2048, depth=4).take_all()
    assert len(rows) == 10
    total_tokens = sum(r["exact_n"] for r in rows)  # lower bound on N
    for r in rows:
        assert r["cms_est"] >= r["exact_n"]  # one-sided guarantee
        assert r["overestimate"] == r["cms_est"] - r["exact_n"]
    # with width 2048 the expected collision mass is N/2048 per cell;
    # allow 20x slack over the per-row expectation to stay flake-free
    import pyarrow.parquet as pq

    n_tokens_hint = 20 * max(total_tokens, 1)
    assert all(r["overestimate"] <= n_tokens_hint for r in rows)


def test_cms_block_layout_invariant(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import ray.data

    from pyreshaper_ray.stages.sketches import cms_term_counts

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    pq.write_table(t, str(tmp_path / "a.parquet"))
    pq.write_table(t, str(tmp_path / "b.parquet"), row_group_size=37)

    def run(p):
        return (
            cms_term_counts(ray.data.read_parquet(str(p)))
            .to_pandas()
            .sort_values("term")
            .reset_index(drop=True)
        )

    assert run(tmp_path / "a.parquet").equals(run(tmp_path / "b.parquet"))


def test_weighted_sample_matches_reference(ray_session):
    """The distributed top-k equals a single-process numpy A-Res draw, and
    reruns are identical (seeded, no RNG state)."""
    import pyarrow.parquet as pq

    import ray.data

    from pyreshaper_ray.stages.dedup import _splitmix64
    from pyreshaper_ray.stages.sketches import weighted_sample_docs

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    ids = np.array(t["doc_id"].to_pylist(), np.int64)
    w = np.maximum(
        np.array([len(x) for x in t["text"].to_pylist()], np.int64), 1
    )
    h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(42))
    u = (h.astype(np.float64) + 1.0) / 18446744073709551618.0
    key = np.floor(np.log(u) / w * 1_000_000).astype(np.int64)
    order = np.lexsort((ids, -key))
    want = set(ids[order[:10]].tolist())

    ds = ray.data.from_arrow(t)
    got = weighted_sample_docs(ds, k=10).take_all()
    assert {r["doc_id"] for r in got} == want
    got2 = weighted_sample_docs(ray.data.from_arrow(t), k=10).take_all()
    assert got == got2


def test_weighted_sample_weight_monotonicity(ray_session):
    """A document with overwhelming weight is (near-)always drawn: the
    A-Res key of a huge-weight doc dominates across seeds."""
    import ray.data

    from pyreshaper_ray.stages.sketches import weighted_sample_docs

    texts = ["x" * 5] * 50 + ["y" * 100000]
    t = pa.table(
        {
            "doc_id": pa.array(range(51), pa.int64()),
            "text": pa.array(texts),
        }
    )
    hits = 0
    for seed in range(5):
        got = weighted_sample_docs(
            ray.data.from_arrow(t), k=3, seed=seed
        ).take_all()
        hits += any(r["doc_id"] == 50 for r in got)
    assert hits == 5


def test_dp_event_counts_reference_and_determinism(ray_session):
    """Noisy counts equal the closed-form seeded-Laplace reference over the
    exact counts; reruns identical; higher epsilon means less noise."""
    import zlib

    import duckdb
    import ray.data

    from pyreshaper_ray.stages.dedup import _splitmix64
    from pyreshaper_ray.stages.sketches import dp_event_counts

    sf = "/root/testdata/sf0.001"
    exact = {
        k: v
        for k, v in duckdb.sql(
            f"SELECT event_type, COUNT(*) FROM "
            f"read_parquet('{sf}/events.parquet') GROUP BY 1"
        ).fetchall()
    }
    ds = ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_type"])
    got = {r["event_type"]: r["noisy_count"]
           for r in dp_event_counts(ds, epsilon_micro=1_000_000).take_all()}
    assert set(got) == set(exact)
    for k, noisy in got.items():
        kh = np.array([zlib.crc32(k.encode())], np.uint64)
        u = (_splitmix64(kh ^ np.uint64(42)).astype(np.float64) + 1.0) \
            / 18446744073709551618.0
        c = u[0] - 0.5
        noise = -1.0 * np.sign(c) * np.log1p(-2.0 * abs(c))
        assert noisy == max(int(np.rint(exact[k] + noise)), 0)
    got2 = {r["event_type"]: r["noisy_count"]
            for r in dp_event_counts(
                ray.data.read_parquet(
                    f"{sf}/events.parquet", columns=["event_type"]
                ), epsilon_micro=1_000_000).take_all()}
    assert got == got2
    # tighter privacy (smaller epsilon) -> larger expected deviation
    loose = dp_event_counts(
        ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_type"]),
        epsilon_micro=10_000_000,
    ).take_all()
    tight = dp_event_counts(
        ray.data.read_parquet(f"{sf}/events.parquet", columns=["event_type"]),
        epsilon_micro=10_000,
    ).take_all()
    dev_loose = sum(abs(r["noisy_count"] - exact[r["event_type"]]) for r in loose)
    dev_tight = sum(abs(r["noisy_count"] - exact[r["event_type"]]) for r in tight)
    assert dev_tight > dev_loose


def test_join_cardinality_estimate_bounds(ray_session):
    """Skewed fixture (one hot key + uniform tail): the bucketed HLL
    estimate lands within 30% of the exact join size, and totals are
    exact."""
    import ray.data

    from pyreshaper_ray.stages.sketches import join_cardinality_estimate

    rng = np.random.default_rng(5)
    # left: keys 0..999 once each, plus key 7 another 500 times (hot)
    lk = np.concatenate([np.arange(1000), np.full(500, 7)]).astype(np.int64)
    # right: 3000 uniform draws over 0..999
    rk = rng.integers(0, 1000, 3000).astype(np.int64)
    exact = int(sum(np.sum(rk == k) for k in np.unique(lk))
                + 500 * np.sum(rk == 7))
    lds = ray.data.from_arrow(pa.table({"k": pa.array(lk)})).repartition(4)
    rds = ray.data.from_arrow(pa.table({"k": pa.array(rk)})).repartition(5)
    out = join_cardinality_estimate(lds, rds, "k", "k").take_all()[0]
    assert out["n_left"] == 1500 and out["n_right"] == 3000
    est = out["est_rows"]
    assert abs(est - exact) / exact < 0.30, (est, exact)


def test_hll_set_overlap_planted(ray_session):
    """Sets of 3000 with exactly 1000 shared: every estimate within 5%,
    and the clamp keeps disjoint sets at intersection ~0."""
    import ray.data

    from pyreshaper_ray.stages.sketches import hll_set_overlap

    a = np.arange(0, 3000, dtype=np.int64)
    b = np.arange(2000, 5000, dtype=np.int64)  # overlap = [2000, 3000)
    da = ray.data.from_arrow(pa.table({"k": pa.array(a)})).repartition(4)
    db = ray.data.from_arrow(pa.table({"k": pa.array(b)})).repartition(3)
    out = hll_set_overlap(da, db, "k", "k").to_pydict()
    assert abs(out["est_left"][0] - 3000) / 3000 < 0.05
    assert abs(out["est_union"][0] - 5000) / 5000 < 0.05
    assert abs(out["est_intersection"][0] - 1000) / 1000 < 0.25
    # disjoint
    dc = ray.data.from_arrow(pa.table({"k": pa.array(a + 100_000)}))
    out2 = hll_set_overlap(da, dc, "k", "k").to_pydict()
    assert out2["est_intersection"][0] < 300  # clamped near zero
