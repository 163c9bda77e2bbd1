"""Deterministic, process-stable hashing helpers.

Python's builtin ``hash`` is salted per process (PYTHONHASHSEED) and must
never be used for partitioning — bucket assignment has to be identical across
workers, runs, and the resume path (the manifest keys on bucket ids, the
wmode-'s' analog; SURVEY.md §4).

``conv_bucket`` exploits low per-batch cardinality: conv_ids are
dictionary-encoded per batch and only the (few) uniques are hashed in Python,
then scattered back with a vectorized take — no per-row Python on the hot path.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def stable_hash32(s: str) -> int:
    """crc32 of utf-8 bytes — stable across processes and runs."""
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def conv_bucket(
    conv_ids: pa.ChunkedArray | pa.Array,
    n_buckets: int,
    overrides: dict[str, int] | None = None,
) -> pa.Array:
    """Vectorized bucket id for a string key column.

    Hashes only the per-batch dictionary (unique values), then takes.
    ``overrides`` pins specific keys to explicit buckets — the
    WeightBalanced analog for heavy conversations (SURVEY.md §4): the hash
    spreads the mass, the override list spreads the known-heavy keys so no
    two of them collide in one partition.
    """
    if isinstance(conv_ids, pa.ChunkedArray):
        conv_ids = conv_ids.combine_chunks()
    dict_arr = pc.dictionary_encode(conv_ids)
    uniques = dict_arr.dictionary.to_pylist()
    if overrides:
        lut = np.array(
            [
                overrides.get(u, stable_hash32(u) % n_buckets)
                for u in uniques
            ],
            dtype=np.int32,
        )
    else:
        lut = np.array([stable_hash32(u) % n_buckets for u in uniques], dtype=np.int32)
    indices = dict_arr.indices.to_numpy(zero_copy_only=False)
    return pa.array(lut[indices], pa.int32())


def content_hash(texts: list[str] | pa.Array) -> list[str]:
    """blake2b-64 hex digest per text — exact-dedup key.

    Per-row Python, but hashing is C-speed and this column is computed once
    per document at ingest, not in a hot inner stage.
    """
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = texts.to_pylist()
    return [
        hashlib.blake2b(t.encode("utf-8"), digest_size=8).hexdigest() for t in texts
    ]
