"""Distributed connected components (stages/graph.py) vs the driver
union-find: identical labels on chains (pointer-jumping's worst case),
stars, multi-component graphs, and a seed-fixed random graph."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _edges_ds(pairs):
    import ray.data

    t = pa.table(
        {
            "a": pa.array([p[0] for p in pairs], pa.int64()),
            "b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    return ray.data.from_arrow(t)


def _run(pairs):
    from pyreshaper_ray.stages.graph import components_distributed
    from pyreshaper_ray.util import bounded_union_find

    out = components_distributed(_edges_ds(pairs)).take_all()
    got = {r["node"]: r["label"] for r in out}
    want = bounded_union_find([p[0] for p in pairs], [p[1] for p in pairs])
    return got, want


def test_components_chain_and_star(ray_session):
    # chain 0-1-2-...-40: diameter 40 — converges via pointer jumping
    chain = [(i, i + 1) for i in range(40)]
    got, want = _run(chain)
    assert got == want
    assert set(got.values()) == {0}

    # star + separate 2-cycle + isolated edge
    pairs = [(100, i) for i in range(101, 110)] + [(5, 6), (6, 5), (7, 8)]
    got, want = _run(pairs)
    assert got == want
    assert got[109] == 100 and got[6] == 5 and got[8] == 7


def test_components_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(7)
    n = 300
    pairs = [
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(400, 2))
        if a != b
    ]
    got, want = _run(pairs)
    assert got == want


def test_pagerank_fixed_hand_path(ray_session):
    """Undirected 3-path 1-2-3: center gets the mass; values match a pure
    Python big-int restatement of the fixed-point recurrence."""
    import ray.data

    from pyreshaper_ray.stages.graph import pagerank_fixed

    edges = pa.table({
        "src": pa.array([1, 2, 2, 3], pa.int64()),
        "dst": pa.array([2, 1, 3, 2], pa.int64()),
    })
    out = pagerank_fixed(
        ray.data.from_arrow(edges).repartition(2), n_iters=3, top_n=10
    )
    got = list(zip(out["node"].to_pylist(), out["rank_pico"].to_pylist()))
    MASS, N = 10**12, 3
    r = {v: MASS // N for v in (1, 2, 3)}
    deg = {1: 1, 2: 2, 3: 1}
    E = [(1, 2), (2, 1), (2, 3), (3, 2)]
    for _ in range(3):
        q = {u: r[u] // deg[u] for u in r}
        s = {v: 0 for v in r}
        for u, v in E:
            s[v] += q[u]
        base = (MASS * 3) // (20 * N)
        r = {v: base + (17 * s[v]) // 20 for v in r}
    want = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == want
    assert got[0][0] == 2  # the center dominates


def test_pagerank_fixed_ring_uniform(ray_session):
    """A directed ring is perfectly symmetric: every node keeps exactly
    the same rank, and total mass is conserved up to floor loss."""
    import ray.data

    from pyreshaper_ray.stages.graph import pagerank_fixed

    n = 12
    edges = pa.table({
        "src": pa.array(list(range(n)), pa.int64()),
        "dst": pa.array([(i + 1) % n for i in range(n)], pa.int64()),
    })
    out = pagerank_fixed(
        ray.data.from_arrow(edges).repartition(3), n_iters=4, top_n=n
    )
    ranks = out["rank_pico"].to_pylist()
    assert len(set(ranks)) == 1  # symmetry
    assert abs(sum(ranks) - 10**12) < n * 20  # mass conserved mod floors


def test_triangle_count_hand_graph(ray_session):
    """K4 minus one edge has exactly 2 triangles; each is found once."""
    import ray.data

    from pyreshaper_ray.stages.graph import triangle_count

    # K4 on {0,1,2,3} minus edge (2,3): triangles {0,1,2} and {0,1,3}
    edges = pa.table({
        "a": pa.array([0, 0, 0, 1, 1], pa.int64()),
        "b": pa.array([1, 2, 3, 2, 3], pa.int64()),
    })
    out = triangle_count(ray.data.from_arrow(edges).repartition(2)).to_pandas()
    got = sorted(map(tuple, out.values.tolist()))
    assert got == [(0, 1, 2), (0, 1, 3)]


def test_triangle_count_string_nodes(ray_session):
    """String node ids survive the dictionary encode/decode round trip."""
    import ray.data

    from pyreshaper_ray.stages.graph import triangle_count

    edges = pa.table({
        "a": pa.array(["x", "x", "y"], pa.string()),
        "b": pa.array(["y", "z", "z"], pa.string()),
    })
    out = triangle_count(ray.data.from_arrow(edges)).to_pandas()
    assert sorted(map(tuple, out.values.tolist())) == [("x", "y", "z")]


def test_triangle_count_no_triangles(ray_session):
    import ray.data

    from pyreshaper_ray.stages.graph import triangle_count

    edges = pa.table({
        "a": pa.array([0, 1, 2], pa.int64()),
        "b": pa.array([1, 2, 3], pa.int64()),
    })
    out = triangle_count(ray.data.from_arrow(edges)).to_pandas()
    assert len(out) == 0


def _both_dirs_table(pairs):
    import numpy as np

    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    return pa.table({
        "src": pa.array(np.concatenate([a, b])),
        "dst": pa.array(np.concatenate([b, a])),
    })


def test_kcore_cascade_peel(ray_session):
    """Triangle {0,1,2} + pendant path 2-3-4: the 2-core is the triangle;
    removing 4 (deg 1) drops 3 to deg 1 — the cascade needs >1 round."""
    import ray.data

    from pyreshaper_ray.stages.graph import kcore_rounds

    t = _both_dirs_table([(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)])
    out = (
        kcore_rounds(ray.data.from_arrow(t).repartition(3), k=2, n_rounds=8)
        .to_pandas()
    )
    assert out["node"].tolist() == [0, 1, 2]
    assert out["deg"].tolist() == [2, 2, 2]


def test_kcore_round_bound_is_the_contract(ray_session):
    """With n_rounds=1 the cascade is cut short: only node 4 is peeled, 3
    survives with its then-degree — the bounded-round semantics the SQL
    restates."""
    import ray.data

    from pyreshaper_ray.stages.graph import kcore_rounds

    t = _both_dirs_table([(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)])
    out = (
        kcore_rounds(ray.data.from_arrow(t), k=2, n_rounds=1)
        .to_pandas()
        .set_index("node")
    )
    assert out.index.tolist() == [0, 1, 2, 3]
    assert out.loc[3, "deg"] == 1


def test_kcore_empty_core(ray_session):
    """A path graph has no 2-core — everything peels away."""
    import ray.data

    from pyreshaper_ray.stages.graph import kcore_rounds

    t = _both_dirs_table([(0, 1), (1, 2), (2, 3)])
    out = kcore_rounds(ray.data.from_arrow(t), k=2, n_rounds=8).to_pandas()
    assert len(out) == 0


def test_pagerank_weighted_vs_bigint_reference(ray_session):
    """3-node weighted line graph checked against a Python big-int
    recurrence of the exact same floor semantics."""
    import ray.data

    from pyreshaper_ray.stages.graph import pagerank_weighted

    # undirected weighted edges: (0-1, w=3), (1-2, w=1)
    pairs = [(0, 1, 3), (1, 2, 1)]
    src, dst, w = [], [], []
    for a, b, ww in pairs:
        src += [a, b]; dst += [b, a]; w += [ww, ww]
    t = pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "w": pa.array(w, pa.int64()),
    })
    out = pagerank_weighted(
        ray.data.from_arrow(t).repartition(2), n_iters=3, top_n=10
    ).to_pandas().set_index("node")["rank_pico"]

    MASS = 10**12
    nodes = [0, 1, 2]
    wd = {0: 3, 1: 4, 2: 1}
    nbrs = {0: [(1, 3)], 1: [(0, 3), (2, 1)], 2: [(1, 1)]}
    r = {v: MASS // 3 for v in nodes}
    base = (MASS * 3) // (20 * 3)
    for _ in range(3):
        s = {v: 0 for v in nodes}
        for u in nodes:
            for v, ww in nbrs[u]:
                s[v] += (r[u] * ww) // wd[u]
        r = {v: base + (17 * s[v]) // 20 for v in nodes}
    for v in nodes:
        assert out.loc[v] == r[v], (v, out.loc[v], r[v])


def test_pagerank_weighted_uniform_equals_unweighted(ray_session):
    """All weights equal -> identical ranks to the unweighted kernel."""
    import ray.data

    from pyreshaper_ray.stages.graph import pagerank_fixed, pagerank_weighted

    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    src = [a for a, b in pairs] + [b for a, b in pairs]
    dst = [b for a, b in pairs] + [a for a, b in pairs]
    tu = pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
    })
    tw = tu.append_column("w", pa.array([7] * len(src), pa.int64()))
    ru = pagerank_fixed(ray.data.from_arrow(tu), n_iters=3, top_n=10)
    rw = pagerank_weighted(ray.data.from_arrow(tw), n_iters=3, top_n=10)
    assert ru.to_pydict() == rw.to_pydict()


def test_link_predict_bipartite_planted(ray_session):
    import ray.data

    from pyreshaper_ray.stages.graph import link_predict_bipartite

    # customers 1..4; suppliers 100,200,300.
    # N(100)={1,2,3}, N(200)={1,2,4}, N(300)={4}
    rows = [
        (1, 100), (2, 100), (3, 100),
        (1, 200), (2, 200), (4, 200),
        (4, 300),
        (1, 100),  # duplicate edge must not double-count
    ]
    t = pa.table(
        {
            "c": pa.array([r[0] for r in rows], pa.int64()),
            "s": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    out = link_predict_bipartite(
        ray.data.from_arrow(t).repartition(3), top_k=10
    ).to_pandas()
    got = {
        (r.supplier_a, r.supplier_b): (
            r.common_customers, r.deg_a, r.deg_b, r.jaccard_ppm
        )
        for r in out.itertuples()
    }
    # |{1,2}| = 2 common, union = 4 -> 500000 ppm
    assert got[(100, 200)] == (2, 3, 3, 500_000)
    # 200 & 300 share customer 4: union = 3 -> 333333 ppm
    assert got[(200, 300)] == (1, 3, 1, 333_333)
    assert (100, 300) not in got  # no common customer
    # ranked by jaccard desc
    assert list(out["jaccard_ppm"]) == sorted(out["jaccard_ppm"], reverse=True)

    # hot-node skip: max_degree=2 removes every wedge through customers 1,2
    # (degree 3 is impossible here; degrees are 2,2,1,2) — cap at 1 kills all
    capped = link_predict_bipartite(
        ray.data.from_arrow(t), top_k=10, max_degree=1
    ).to_pandas()
    assert len(capped) == 0


def test_degree_assortativity_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.graph import degree_assortativity_components

    # path graph 1-2-3 (both directions): degs 1:1, 2:2, 3:1
    # directed edges: (1,2),(2,1),(2,3),(3,2)
    # x deg pairs: (1,2),(2,1),(2,1),(1,2) -> m=4
    # sum_x = 1+2+2+1 = 6 = sum_y; sum_xy = 2+2+2+2 = 8
    # sum_x2 = 1+4+4+1 = 10 = sum_y2
    e = pa.table(
        {
            "src": pa.array([1, 2, 2, 3], pa.int64()),
            "dst": pa.array([2, 1, 3, 2], pa.int64()),
        }
    )
    t = degree_assortativity_components(
        ray.data.from_arrow(e).repartition(2)
    ).to_pydict()
    assert t["m"] == [4]
    assert t["sum_x"] == [6] and t["sum_y"] == [6]
    assert t["sum_xy"] == [8]
    assert t["sum_x2"] == [10] and t["sum_y2"] == [10]


def test_pagerank_copartitioned_at_16_cpus():
    """VERDICT r3 #2 gate: the co-partitioned iteration (masses-as-dataset,
    hash-partition-by-src stamp, groupby(dst) merge) must stay bit-exact vs
    the DuckDB chained-CTE oracle in a FRESH 16-CPU Ray process — the
    parallelism where Ray's exchange empty-block edges bite."""
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
con = duckdb.connect()
for t in ("orders", "lineitem"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfd}/{t}.parquet')")
for qname in ("pagerank_trade_graph", "kcore_trade_graph"):
    df = e.queries()[qname](sfd).to_pandas()
    o = con.execute(e.oracle_sql()[qname]).df()
    assert len(df) == len(o) and len(df) > 0, qname
    df = df[sorted(df.columns)].sort_values(list(sorted(df.columns))).reset_index(drop=True)
    o = o[sorted(o.columns)].sort_values(list(sorted(o.columns))).reset_index(drop=True)
    for c in df.columns:
        assert (df[c].to_numpy() == o[c].to_numpy()).all(), (qname, c)
ray.shutdown()
print("OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=600
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_partitioners_tolerate_schemaless_empty_blocks(ray_session):
    """Datasets downstream of hash-partitioned aggregates can hand the
    graph partitioners EMPTY blocks with an EMPTY schema (seen at 32 CPUs
    on the trade-pair census); both partitioners must substitute
    schema-bearing empties instead of KeyError'ing."""
    import ray
    import ray.data

    from pyreshaper_ray.stages.graph import (
        _partition_edges_by_src,
        _partition_nodes,
    )

    edges_tbl = pa.table(
        {
            "src": pa.array([1, 2], pa.int64()),
            "dst": pa.array([2, 1], pa.int64()),
        }
    )
    empty = pa.table({})  # schema-less empty block
    ds = ray.data.from_arrow_refs([ray.put(edges_tbl), ray.put(empty)])
    parts = _partition_edges_by_src(ds, 2)
    got = pa.concat_tables(ray.get(parts))
    assert sorted(got["src"].to_pylist()) == [1, 2]

    nodes_tbl = pa.table(
        {
            "node": pa.array([1, 2, 3], pa.int64()),
            "deg": pa.array([1, 1, 0], pa.int64()),
        }
    )
    ds2 = ray.data.from_arrow_refs([ray.put(nodes_tbl), ray.put(empty)])
    nparts = _partition_nodes(ds2, 2, ["node", "deg"])
    got2 = pa.concat_tables(ray.get(nparts))
    assert sorted(got2["node"].to_pylist()) == [1, 2, 3]
