"""Small driver-side helpers + per-worker broadcast cache."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BROADCAST_CACHE: dict[str, object] = {}
_THREADS_TUNED = False


def tune_worker_threads() -> None:
    """Pin pyarrow's intra-op thread pools to 1 inside Ray workers.

    Arrow defaults its CPU pool to the machine's core count PER PROCESS;
    with 32 Ray workers that is 32×32 threads fighting over 32 cores —
    measured 7× task-time inflation on the bucket kernel. Ray already
    parallelizes across processes, so each worker should be single-threaded.
    Call at the top of every worker fn (idempotent, guarded)."""
    global _THREADS_TUNED
    if _THREADS_TUNED:
        return
    import pyarrow as pa

    try:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
    except Exception:
        pass
    _THREADS_TUNED = True


def cached_get(ref):
    """``ray.get`` with a per-worker-process cache keyed by object id.

    For broadcast lookup structures used by stateless-task stages: the first
    batch in each worker pays the deserialization; later batches reuse it.
    (Actor pools get the same effect via ``__init__``; plain tasks need this
    because a task has no persistent state of its own.) Lets small stateful
    stages stay elastic tasks instead of reserving actor-pool CPUs — on tiny
    clusters several stacked pools can starve the task operators entirely.
    """
    import ray

    key = ref.hex()
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def bounded_union_find(
    a_ids, b_ids, max_pairs: int = 10_000_000, what: str = "pair list"
) -> dict[int, int]:
    """Driver-side union-find over an edge list, with an EXPLICIT size bound.

    The near-dup group closures (dedup_canonical, neardup_groups) assume the
    verified pair list is result-sized; the LSH star-pair cap keeps it
    linear in the duplicate count even on an all-duplicates corpus (gated by
    tests/test_dedup.py::test_dup_heavy_corpus_pairs_stay_linear). This
    bound turns a violated assumption into a loud, actionable error instead
    of an OOM-killed driver. At cluster scale, raise ``max_pairs`` or swap
    the closure for the distributed alternating-doubling (pointer-jumping)
    iteration: groupby(node).min(neighbor rep) repeated O(log diameter)
    times — the pair list then never leaves the object store.

    Returns the parent map after full path compression: parent[x] is x's
    component representative (min id in the component).
    """
    n = len(a_ids)
    if n > max_pairs:
        raise RuntimeError(
            f"{what} has {n} edges (> max_pairs={max_pairs}); the driver "
            "closure assumes a result-sized pair list. Raise max_pairs or "
            "use the distributed pointer-jumping closure (see "
            "bounded_union_find docstring)."
        )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(a_ids, b_ids):
        for v in (a, b):
            parent.setdefault(v, v)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    for v in list(parent):
        parent[v] = find(v)
    return parent


def collect_table(ds, fallback_schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a (small, result-sized) Dataset as one Arrow table.

    Ray Data can emit schema-less zero-column blocks for empty partitions
    (e.g. after a sort/groupby whose range got no rows); drop those before
    concatenation so the result keeps the real schema. Only for small
    results — aggregates, per-key summaries, test outputs.

    ``materialize()`` first: calling ``to_arrow_refs()`` on a LAZY dataset
    in Ray 2.49 executes the plan TWICE (an internal limit-1 schema fetch,
    then the real run) — measured as a full extra LSH pass in the minhash
    pipeline. On a materialized dataset both are free.
    """
    import ray

    tables = [ray.get(r) for r in ds.materialize().to_arrow_refs()]
    tables = [t for t in tables if t.num_columns > 0]
    if not tables:
        return fallback_schema.empty_table() if fallback_schema else pa.table({})
    return pa.concat_tables(tables)


def hash_partitioned_agg(
    ds,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_parts: int = 32,
):
    """``groupby(keys).aggregate(...)`` for MANY-GROUP censuses: Ray Data's
    built-in aggregate pays ~70 µs of per-group Python in its reduce
    (measured: 6.4M rows / 1M groups Sum = 70 s at 32 CPUs); this helper
    hash-partitions rows by key (the SAME one all-to-all exchange) and runs
    a vectorized Arrow ``group_by`` inside each of ``n_parts`` partitions
    instead (same input: 0.5 s). Because every key lands wholly in one
    partition, the local group_by result IS the global result for the
    associative ops supported here.

    Use it when the aggregate OUTPUT is itself large (pair censuses,
    n-gram counts, per-entity rollups with 10^5+ groups); for few-group
    aggregates the built-in reduce is fine and avoids the extra stage.

    aggs: list of (in_col, op, out_name), op in Arrow group_by's
    vocabulary ("sum", "min", "max", "count", "mean", ...) — must be
    associative for the partition-local evaluation to be exact (all of the
    above except mean; mean of disjoint groups is fine too since each key
    is wholly local). in_col=None with op="count_all" emits the per-key
    row count (needed when the thing to count IS a key column — Arrow
    group_by refuses to aggregate keys).
    """
    import polars as pl
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_part(b: pa.Table) -> pa.Table:
        h = np.zeros(b.num_rows, np.uint64)
        for k in keys:
            col = b[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            h = h * np.uint64(0x9E3779B97F4A7C15) + pl.from_arrow(
                col
            ).hash(seed=7).to_numpy()
        part = (h >> np.uint64(33)) % np.uint64(n_parts)
        return b.append_column(
            "__part", pa.array(part.astype(np.int64), pa.int64())
        )

    def local_agg(g: pa.Table) -> pa.Table:
        gg = g.drop_columns(["__part"]).group_by(keys).aggregate(
            [(c if c is not None else [], op) for c, op, _ in aggs]
        )
        cols = {k: gg[k] for k in keys}
        for c, op, out in aggs:
            src = f"{c}_{op}" if c is not None else "count_all"
            v = gg[src]
            if "count" in op:
                v = pc.cast(v, pa.int64())  # Arrow counts come back narrower
            cols[out] = v
        return pa.table(cols)

    return (
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(local_agg, batch_format="pyarrow")
    )
