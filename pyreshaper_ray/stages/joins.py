"""Join operators (SURVEY.md §2.4).

PyReshaper's only join-like operation is metadata replication (ti-metadata
copied into every output; tv-metadata per slice — public repo
``reshaper.py::convert`` metadata loops). The general relational forms the
new engine adds:

- ``broadcast_enrich``: small-side broadcast join (J1) — the dimension table
  ships once via ``ray.put`` and is merged into every batch with a
  vectorized dictionary take. No shuffle.
- ``hash_join``: both-sides-large equi-join via ``Dataset.join`` (Ray ≥2.46
  hash-partitions both sides on the key); partition count bounded by CPUs
  because the join aggregators are actors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def broadcast_enrich(
    ds: "ray.data.Dataset",
    dim_table: pa.Table,
    key: str,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Left-join a SMALL dimension table onto every batch, broadcast once.

    Lookup is vectorized: batch keys are matched with ``pc.index_in``
    against the broadcast key array; misses become nulls (left join).
    """
    import ray

    if columns is None:
        columns = [c for c in dim_table.column_names if c != key]
    ref = ray.put(dim_table.select([key] + columns).combine_chunks())

    def enrich(batch: pa.Table) -> pa.Table:
        from ..util import cached_get

        dim: pa.Table = cached_get(ref)
        pos = pc.index_in(batch[key], value_set=dim[key])
        out = batch
        for c in columns:
            out = out.append_column(c, pc.take(dim[c], pos))
        return out

    return ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple[str, ...] | str,
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Large⋈large equi-join: Ray's hash-partitioned ``Dataset.join``.

    Partition count defaults to half the CPUs (join aggregators are actors,
    one CPU each; more partitions than CPUs starves downstream operators).
    """
    import ray

    if isinstance(on, str):
        on = (on,)
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 2)
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
    )
