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
