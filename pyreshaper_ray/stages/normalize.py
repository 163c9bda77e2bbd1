"""Stateless normalization stage — `map_batches` over zero-copy Arrow.

Analog of PyReshaper's header-inspection + classification pass
(``reshaper.py::Slice2SeriesReshaper.__init__`` input-validation loop in the
public repo) plus the north_rule's derived metric columns. Runs as plain
tasks (no state), `batch_format="pyarrow"`, vectorized `pyarrow.compute`
kernels only.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.hashing import conv_bucket
from ..functions.normalize import normalize_batch
from ..fixtures import TRANSCRIPT_SCHEMA


def _check_schema(batch: pa.Table) -> None:
    """Fragment-schema check (M1): every block must carry the transcript
    columns with the expected types — fail fast like PyReshaper does on
    dimension/variable mismatch across input files."""
    for field in TRANSCRIPT_SCHEMA:
        got = batch.schema.field(field.name).type
        if got != field.type:
            raise ValueError(
                f"input schema mismatch for {field.name!r}: {got} != {field.type}"
            )


def make_normalize_fn(
    n_buckets: int | None = None,
    bucket_overrides: dict[str, int] | None = None,
    segmented: dict[str, int] | None = None,
    segment_rows: int = 250_000,
    derive: bool = True,
):
    """Build the per-batch normalize fn; optionally append a stable
    `bucket` partition column (hash(conv_id) % n_buckets, with explicit
    overrides for heavy conversations — the WeightBalanced analog).

    ``segmented`` maps GIANT conversations (≥ spec.segment_threshold turns)
    to a base bucket: their rows are range-salted into contiguous segments
    (``seg = turn_idx // segment_rows``) and each segment goes to bucket
    ``(base + seg) % n_buckets`` — no single task ever holds the whole
    conversation. A ``seg`` column (-1 for unsegmented rows) rides along so
    the bucket kernel can route segment partials to the stitch step.

    ``derive=False`` skips the derived metric columns (char_len / tok_est /
    is_tool / w1m) — the spill-slimming lever: when the text payload travels
    through the exchange anyway, the bucket kernel can recompute the derived
    columns locally for free, so shipping them only inflates the exchange
    (~21 B/row). Metrics-only mode (text dropped) must keep derive=True.
    """
    import numpy as np

    def normalize(batch: pa.Table) -> pa.Table:
        from ..util import tune_worker_threads

        tune_worker_threads()
        _check_schema(batch)
        out = normalize_batch(batch) if derive else batch
        if n_buckets is not None:
            bucket = conv_bucket(batch["conv_id"], n_buckets, bucket_overrides)
            if segmented:
                import pyarrow.compute as pc

                conv = batch["conv_id"]
                if isinstance(conv, pa.ChunkedArray):
                    conv = conv.combine_chunks()
                dict_arr = pc.dictionary_encode(conv)
                uniques = dict_arr.dictionary.to_pylist()
                base_lut = np.array(
                    [segmented.get(u, -1) for u in uniques], dtype=np.int64
                )
                base = base_lut[dict_arr.indices.to_numpy(zero_copy_only=False)]
                mask = base >= 0
                seg = np.full(len(base), -1, dtype=np.int32)
                if mask.any():
                    turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
                    seg[mask] = (turn[mask] // segment_rows).astype(np.int32)
                    b = bucket.to_numpy(zero_copy_only=False).copy()
                    b[mask] = (base[mask] + seg[mask]) % n_buckets
                    bucket = pa.array(b, pa.int32())
                out = out.append_column("bucket", bucket)
                out = out.append_column("seg", pa.array(seg, pa.int32()))
            else:
                out = out.append_column("bucket", bucket)
        return out

    return normalize


def normalize_dataset(
    ds: "ray.data.Dataset",
    n_buckets: int | None = None,
    bucket_overrides: dict[str, int] | None = None,
    segmented: dict[str, int] | None = None,
    segment_rows: int = 250_000,
    derive: bool = True,
) -> "ray.data.Dataset":
    return ds.map_batches(
        make_normalize_fn(n_buckets, bucket_overrides, segmented, segment_rows, derive),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def find_heavy_conversations(
    ds: "ray.data.Dataset", threshold: int
) -> dict[str, int]:
    """Turn counts per conversation above ``threshold`` — shuffle-free.

    Per-block combiner counts (one row per conv per block) are pre-filtered
    to partials ≥ threshold/1024 and merged on the driver with one Arrow
    ``group_by`` — no all-to-all exchange at all. Conversations are laid out
    near-contiguously in any real ingest, so the merged partial set is
    ~O(n_convs) rows; the pre-filter bounds it even under adversarial
    scatter. Detection bound (documented trade): a conversation smeared so
    thin that EVERY per-block partial is below threshold/1024 (i.e. spread
    over >1024 blocks with no local mass) is missed — acceptable because
    heavy detection steers load balance / segmentation only, never result
    correctness (hash bucketing remains the fallback, outputs are
    bit-identical either way), and a conversation that thin exerts no local
    pressure on any single bucket."""
    import pyarrow.compute as pc

    floor = max(1, threshold // 1024)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["conv_id"]).aggregate([("conv_id", "count")])
        out = pa.table(
            {
                "conv_id": g["conv_id"],
                "n": pc.cast(g["conv_id_count"], pa.int64()),
            }
        )
        return out.filter(pc.greater_equal(out["n"], floor))

    parts = ds.select_columns(["conv_id"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    from ..util import collect_table

    merged = collect_table(
        parts, pa.schema([("conv_id", pa.string()), ("n", pa.int64())])
    )
    if merged.num_rows == 0:
        return {}
    g = merged.group_by(["conv_id"]).aggregate([("n", "sum")])
    g = g.filter(pc.greater_equal(g["n_sum"], threshold))
    if g.num_rows == 0:
        return {}
    idx = pc.sort_indices(
        g, sort_keys=[("n_sum", "descending"), ("conv_id", "ascending")]
    )
    g = g.take(idx)
    ns = g["n_sum"].to_numpy(zero_copy_only=False)
    return {
        cid: int(n) for cid, n in zip(g["conv_id"].to_pylist(), ns)
    }
