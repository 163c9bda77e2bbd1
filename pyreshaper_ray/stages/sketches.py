"""Mergeable-sketch operators: approximate distinct counting + deterministic
hash sampling.

At 10^12-turn scale an exact COUNT(DISTINCT) per group is itself a shuffle
of every distinct key (``distinct_tools_per_window`` does it exactly for
low-cardinality keys); for high-cardinality keys (users, documents) the
standard big-data answer is a MERGEABLE SKETCH: each block reduces to a
fixed-size register array, registers merge by elementwise max, and ONLY
sketches cross the wire — the shuffle payload is O(groups × 4 KiB)
regardless of input size.

- ``approx_distinct_users``: HyperLogLog (Flajolet et al. 2007, the public
  HLL paper) with p=12 (4096 registers, ~1.6 % standard error), splitmix64
  bit-mixed hashes, linear-counting small-range correction. Deterministic:
  same input → same registers → same estimate, on any cluster shape.
- ``hash_sample``: deterministic Bernoulli sampling by md5(doc_id) prefix —
  the reproducible "sample 1/2^k of the corpus" primitive (same rows on
  every run/cluster, SQL-restatable, unlike seeded RNG sampling which
  depends on block layout).

No PyReshaper analog (it has no approximate operators); these are the
training-data-pipeline additions the engine spec calls for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dedup import _splitmix64

_P = 12  # HLL precision: m = 2^p registers
_M = 1 << _P


def _clz_rest(h: np.ndarray) -> np.ndarray:
    """rho = leading-zero count of the low (64-p) bits + 1, vectorized.

    Counts via 6 constant-time binary-search steps on uint64 — no float
    log2 (which rounds above 2^53) and no per-row Python.
    """
    w = (h << np.uint64(_P)).astype(np.uint64)  # drop the register-index bits
    rho = np.ones(len(w), dtype=np.int64)
    shift = 32
    probe = w.copy()
    while shift >= 1:
        top = probe >> np.uint64(64 - shift)
        zero_top = top == 0
        rho[zero_top] += shift
        probe = np.where(zero_top, probe << np.uint64(shift), probe)
        shift //= 2
    # all-zero w ⇒ every one of the 64 probed bits was zero ⇒ rho capped at
    # the max meaningful value (64 - p + 1)
    return np.minimum(rho, 64 - _P + 1)


def hll_registers(keys: np.ndarray) -> np.ndarray:
    """4096-register uint8 HLL sketch of an int64 key array."""
    h = _splitmix64(keys.astype(np.uint64))
    idx = (h >> np.uint64(64 - _P)).astype(np.int64)
    rho = _clz_rest(h)
    reg = np.zeros(_M, dtype=np.uint8)
    np.maximum.at(reg, idx, rho.astype(np.uint8))
    return reg


def hll_estimate(reg: np.ndarray) -> int:
    """Standard HLL estimator with linear-counting small-range correction."""
    m = float(_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -reg.astype(np.float64)).sum()
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return int(round(est))


def approx_distinct_users(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Approximate distinct user_id per event_type.

    Combiner-first: each block emits ONE (event_type, 4096-byte sketch) row
    per type present; ``groupby(event_type)`` then merges sketches by
    elementwise max and finalizes the estimate. The exchange never carries
    user ids — only sketches.

    Output: event_type, approx_users (BIGINT). Deterministic, but not
    SQL-expressible → rows-only driver check; the error-bound gate
    (|approx/exact − 1| ≤ 3 %) lives in tests/test_sketches.py.
    """

    def partial(batch: pa.Table) -> pa.Table:
        users = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        etype = batch["event_type"]
        dict_arr = pc.dictionary_encode(etype.combine_chunks())
        idx = dict_arr.indices.to_numpy(zero_copy_only=False)
        types, regs = [], []
        for j, t in enumerate(dict_arr.dictionary.to_pylist()):
            types.append(t)
            regs.append(hll_registers(users[idx == j]).tobytes())
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "sketch": pa.array(regs, pa.binary()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        regs = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in group["sketch"].to_pylist()]
        )
        est = hll_estimate(regs.max(axis=0))
        return pa.table(
            {
                "event_type": pa.array(
                    [group["event_type"][0].as_py()], pa.string()
                ),
                "approx_users": pa.array([est], pa.int64()),
            }
        )

    p = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("event_type").map_groups(merge, batch_format="pyarrow")


def hash_sample(
    ds_docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    keep_below: str = "2000",
    columns: tuple[str, ...] = ("doc_id", "n_chars"),
) -> "ray.data.Dataset":
    """Deterministic Bernoulli sample: keep rows whose md5(CAST(id AS
    VARCHAR)) 4-hex-char prefix sorts below ``keep_below`` ('2000' ⇒ 1/8).

    md5 is uniform over the prefix, so this is an unbiased fixed-rate sample
    that is REPRODUCIBLE across runs, engines and cluster shapes — and
    SQL-restatable (DuckDB ``md5()``), unlike RNG sampling. Embarrassingly
    parallel: pure per-batch filter, no shuffle.
    """
    import hashlib

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        pref = [
            hashlib.md5(str(i).encode("ascii")).hexdigest()[:4] for i in ids
        ]
        mask = pa.array([p < keep_below for p in pref], pa.bool_())
        return batch.filter(mask).select(list(columns))

    return ds_docs.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def sample_per_stratum(
    ds_docs: "ray.data.Dataset",
    k: int = 5,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    columns: tuple[str, ...] = ("doc_id", "n_chars"),
) -> "ray.data.Dataset":
    """Deterministic fixed-size sample of ``k`` rows PER STRATUM: order each
    stratum by md5(id) (uniform ⇒ unbiased, reproducible across runs,
    engines and cluster shapes — ``hash_sample``'s rule applied per group)
    and keep the first ``k``, tie-broken by id.

    Combiner-first top-k: each block reduces to <= k candidate rows per
    (block, stratum) BEFORE the exchange, then one groupby(stratum) merge
    re-applies the same order — so the shuffle carries k x strata x blocks
    rows, never the corpus, and the result equals a global sort's.

    Output: stratum_col + ``columns``.
    """
    import hashlib

    out_cols = [stratum_col, *columns]

    def ranked(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = pa.array(
            [hashlib.md5(str(i).encode("ascii")).hexdigest() for i in ids],
            pa.string(),
        )
        t = batch.select(out_cols).append_column("h", h)
        idx = pc.sort_indices(
            t,
            sort_keys=[
                (stratum_col, "ascending"),
                ("h", "ascending"),
                (id_col, "ascending"),
            ],
        )
        t = t.take(idx)
        s = t[stratum_col].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        ends = np.r_[starts[1:], len(s)]
        keep = np.concatenate(
            [np.arange(a, min(a + k, b)) for a, b in zip(starts, ends)]
        )
        return t.take(pa.array(keep, pa.int64()))

    def merge(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return group
        idx = pc.sort_indices(
            group, sort_keys=[("h", "ascending"), (id_col, "ascending")]
        )
        return group.take(idx[:k]).select(out_cols)

    p = ds_docs.map_batches(ranked, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(stratum_col).map_groups(merge, batch_format="pyarrow")


# ------------------------------------------------------------------ DDSketch

_DD_ALPHA = 0.01  # 1% relative-error guarantee
_DD_GAMMA = (1 + _DD_ALPHA) / (1 - _DD_ALPHA)
_DD_LOG_GAMMA = np.log(_DD_GAMMA)
_DD_MIN = 1e-9  # values below this collapse into the zero bucket


def dd_bucket_ids(x: np.ndarray) -> np.ndarray:
    """DDSketch bucket index: ceil(log_gamma(x)) for x > _DD_MIN.

    Public DDSketch scheme (Masson, Rim & Lee, VLDB 2019): exponentially
    spaced buckets give a uniform RELATIVE error of alpha at every quantile.
    """
    return np.ceil(np.log(x) / _DD_LOG_GAMMA).astype(np.int64)


def dd_quantile(ids: np.ndarray, counts: np.ndarray, zero_n: int, q: float) -> float:
    """Quantile from merged (bucket id, count) pairs + the zero-bucket count.

    Returns the bucket midpoint 2*gamma^i/(gamma+1) — within alpha of the
    true value. Bucket ids must be sorted ascending.
    """
    total = int(counts.sum()) + zero_n
    rank = max(0, min(total - 1, int(np.ceil(q * total)) - 1))
    if rank < zero_n:
        return 0.0
    cum = zero_n + np.cumsum(counts)
    j = int(np.searchsorted(cum, rank + 1, side="left"))
    return float(2.0 * np.power(_DD_GAMMA, ids[j]) / (_DD_GAMMA + 1))


def approx_value_quantiles(
    events_ds: "ray.data.Dataset", qs: tuple[float, ...] = (0.5, 0.95, 0.99)
) -> "ray.data.Dataset":
    """DDSketch approximate quantiles of event ``value`` per event_type.

    Mergeable like the HLL: each block reduces to its occupied (event_type,
    bucket, count) rows — a few hundred buckets regardless of row count —
    then one groupby sums counts per bucket and a per-type finalize walks
    the cumulative counts. Guarantee: each reported quantile is within
    ``_DD_ALPHA`` (1 %) RELATIVE error of an exact quantile; the gate in
    tests/test_sketches.py checks exactly that against numpy.

    Output: event_type, p50, p95, p99 (DOUBLE). Deterministic → rows-only
    driver check.
    """

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        etype = batch["event_type"]
        dict_arr = pc.dictionary_encode(etype.combine_chunks())
        idx = dict_arr.indices.to_numpy(zero_copy_only=False)
        types, buckets, counts = [], [], []
        for j, t in enumerate(dict_arr.dictionary.to_pylist()):
            x = v[idx == j]
            zero = x <= _DD_MIN
            nz = x[~zero]
            ids = dd_bucket_ids(nz) if len(nz) else np.empty(0, np.int64)
            u, c = np.unique(ids, return_counts=True)
            if zero.any():  # zero bucket rides along as id = INT64_MIN
                u = np.concatenate(([np.iinfo(np.int64).min], u))
                c = np.concatenate(([int(zero.sum())], c))
            types.extend([t] * len(u))
            buckets.append(u)
            counts.append(c)
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "bucket": pa.array(
                    np.concatenate(buckets) if buckets else [], pa.int64()
                ),
                "n": pa.array(
                    np.concatenate(counts).astype(np.int64) if counts else [],
                    pa.int64(),
                ),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        ids = group["bucket"].to_numpy(zero_copy_only=False)
        ns = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, ns = ids[order], ns[order]
        zmark = np.iinfo(np.int64).min
        zero_n = int(ns[ids == zmark].sum())
        nz = ids != zmark
        cols: dict = {
            "event_type": pa.array([group["event_type"][0].as_py()], pa.string())
        }
        for q in qs:
            cols[f"p{int(q * 100)}"] = pa.array(
                [dd_quantile(ids[nz], ns[nz], zero_n, q)], pa.float64()
            )
        return pa.table(cols)

    p = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Sum as _Sum

    merged = p.groupby(["event_type", "bucket"]).aggregate(
        _Sum("n", alias_name="n")
    )
    return merged.groupby("event_type").map_groups(
        finalize, batch_format="pyarrow"
    )


def stratified_sample(
    ds_docs: "ray.data.Dataset",
    strata_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 5,
) -> "ray.data.Dataset":
    """Deterministic stratified sample: the ``k`` rows per stratum whose
    ``md5(CAST(id AS VARCHAR))`` sorts lowest (ties broken by id) — i.e.
    ``ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY md5(id), id) <= k``
    restated as a reproducible hash order, the per-group analog of
    ``hash_sample``.

    Combiner-first top-k: each block keeps only its own k smallest
    (stratum, md5) rows, so the shuffle moves ≤ k rows per (block, stratum),
    and the final per-stratum selection runs over ≤ k×n_blocks rows per
    group — never the corpus. Unbiased within a stratum (md5 is uniform),
    stable across runs, engines and cluster shapes.

    Output: strata_col, id_col, md5h (string).
    """
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = pa.array(
            [hashlib.md5(str(i).encode("ascii")).hexdigest() for i in ids],
            pa.string(),
        )
        t = pa.table(
            {
                strata_col: batch[strata_col],
                id_col: batch[id_col],
                "md5h": h,
            }
        )
        idx = pc.sort_indices(
            t,
            sort_keys=[
                (strata_col, "ascending"),
                ("md5h", "ascending"),
                (id_col, "ascending"),
            ],
        )
        t = t.take(idx)
        # keep each stratum's first k rows within this block
        import numpy as np

        strata = t[strata_col].to_pylist()
        keep = []
        prev, cnt = None, 0
        for i, s in enumerate(strata):
            if s != prev:
                prev, cnt = s, 0
            if cnt < k:
                keep.append(i)
            cnt += 1
        return t.take(pa.array(keep, pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("md5h", "ascending"), (id_col, "ascending")],
        )
        return group.take(idx[:k])

    p = ds_docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(strata_col).map_groups(final, batch_format="pyarrow")


def heavy_hitters_terms(
    ds_docs: "ray.data.Dataset",
    k: int = 10,
    capacity: int = 256,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Misra-Gries / Space-Saving heavy hitters over corpus terms — the
    mergeable frequent-items sketch (third of the sketch family after
    HyperLogLog and DDSketch).

    Each block tokenizes with the same RE2 split as ``text.top_terms``,
    counts exactly within the block, then TRUNCATES to a Misra-Gries
    summary of ``capacity`` counters: subtract the (capacity+1)-th largest
    count ``d`` from every counter and drop the non-positive ones. The
    block's deficit ``d`` rides along as a special row, so after the
    groupby-sum merge every surviving term carries a LOWER-BOUND count
    ``est_count`` and the summed deficits give a global error bound
    ``max_err`` (true_count <= est_count + max_err; MG guarantees
    sum-of-deficits <= n_tokens / (capacity+1)). The exchange moves at most
    ``capacity + 1`` rows per block, independent of block vocabulary.

    Output: term (STRING), est_count (BIGINT), max_err (BIGINT) — the k
    largest estimates. Approximate by nature → rows-only driver entry; the
    error-bound + planted-heavy-term gates live in tests/test_sketches.py.
    """
    from ray.data.aggregate import Sum as _Sum

    DEFICIT_KEY = "\x00__mg_deficit__"

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch[text_col]), pattern="[^a-z0-9]+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"term": flat}).group_by(["term"]).aggregate(
            [("term", "count")]
        )
        counts = pc.cast(g["term_count"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        terms = g["term"].to_pylist()
        if len(counts) > capacity:
            order = np.argsort(-counts, kind="stable")
            d = int(counts[order[capacity]])
            keep_idx = [
                i for i in order[:capacity] if counts[i] - d > 0
            ]
            out_terms = [terms[i] for i in keep_idx] + [DEFICIT_KEY]
            out_counts = [int(counts[i]) - d for i in keep_idx] + [d]
        else:
            out_terms = terms
            out_counts = [int(c) for c in counts]
        return pa.table(
            {
                "term": pa.array(out_terms, pa.string()),
                "n": pa.array(out_counts, pa.int64()),
            }
        )

    merged = (
        ds_docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(_Sum("n", alias_name="n"))
    )

    # result-sized finalize on the driver: split off the deficit row, rank.
    t = merged.to_pandas()
    deficit = int(t.loc[t["term"] == DEFICIT_KEY, "n"].sum())
    t = t[t["term"] != DEFICIT_KEY]
    t = t.sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
    t = t.head(k).reset_index(drop=True)
    out = pa.table(
        {
            "term": pa.array(t["term"].tolist(), pa.string()),
            "est_count": pa.array(t["n"].tolist(), pa.int64()),
            "max_err": pa.array([deficit] * len(t), pa.int64()),
        }
    )
    import ray.data as _rd

    return _rd.from_arrow(out)


def ddsketch_p95_daily(events_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """WINDOWED mergeable sketch: DDSketch p95 of event value PER DAY —
    the per-window flavor of ``approx_value_quantiles`` proving sketches
    compose with time windows exactly like the rollup tiers do: each block
    reduces to its occupied (day, bucket, count) rows, one groupby merges
    registers per window, a per-day finalize walks the cumulative counts.
    Exchange volume ∝ windows × occupied buckets (~hundreds per day),
    independent of row count. Same 1 % relative-error guarantee
    (tests/test_sketches gate vs numpy exact).

    Output: day (timestamp), n (BIGINT), p95 (DOUBLE). Deterministic →
    rows-only driver check (the sketch answer is not the exact quantile).
    """
    from ray.data.aggregate import Sum as _Sum

    zmark = np.iinfo(np.int64).min

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(batch["ts"], unit="day"), pa.timestamp("us")
        ).combine_chunks()
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        dict_arr = pc.dictionary_encode(day)
        idx = dict_arr.indices.to_numpy(zero_copy_only=False)
        days, buckets, counts = [], [], []
        for j, d in enumerate(dict_arr.dictionary.to_pylist()):
            x = v[idx == j]
            zero = x <= _DD_MIN
            nz = x[~zero]
            ids = dd_bucket_ids(nz) if len(nz) else np.empty(0, np.int64)
            u, c = np.unique(ids, return_counts=True)
            if zero.any():
                u = np.concatenate(([zmark], u))
                c = np.concatenate(([int(zero.sum())], c))
            days.extend([d] * len(u))
            buckets.append(u)
            counts.append(c)
        return pa.table(
            {
                "day": pa.array(days, pa.timestamp("us")),
                "bucket": pa.array(
                    np.concatenate(buckets) if buckets else [], pa.int64()
                ),
                "n": pa.array(
                    np.concatenate(counts).astype(np.int64) if counts else [],
                    pa.int64(),
                ),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        ids = group["bucket"].to_numpy(zero_copy_only=False)
        ns = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, ns = ids[order], ns[order]
        zero_n = int(ns[ids == zmark].sum())
        nz = ids != zmark
        p95 = dd_quantile(ids[nz], ns[nz], zero_n, 0.95)
        return pa.table(
            {
                "day": group["day"][:1],
                "n": pa.array([int(ns.sum())], pa.int64()),
                "p95": pa.array([p95], pa.float64()),
            }
        )

    merged = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "bucket"])
        .aggregate(_Sum("n", alias_name="n"))
    )
    return merged.groupby("day").map_groups(finalize, batch_format="pyarrow")


def hll_users_window_cascade(
    events_ds: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """Continuous-aggregate DISTINCT: approximate distinct users per 1-hour
    window, computed by MERGING the per-1-minute HLL sketches — the
    mergeable-sketch cascade that makes windowed COUNT(DISTINCT) a
    downsample instead of a re-scan (the TimescaleDB continuous-aggregate
    story, and the reason the retention tiers can keep distinct counts at
    every granularity from one fine pass).

    Shape: per-block (minute, sketch) partials → ``groupby(minute)`` max-
    merge (exchange carries 4 KiB sketches, never user ids) → minute rows
    re-key to their hour → second max-merge → estimate. By HLL's lattice
    property (register-wise max is associative/commutative/idempotent) the
    cascaded 1h registers are IDENTICAL to a direct 1h sketch — the
    bit-exactness gate in tests/test_sketches.py.

    Output: window_start (hour), approx_users, one row per active hour.
    """

    def partial(batch: pa.Table) -> pa.Table:
        users = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        minute = pc.floor_temporal(batch["ts"], unit="minute")
        dict_arr = pc.dictionary_encode(minute.combine_chunks())
        idx = dict_arr.indices.to_numpy(zero_copy_only=False)
        mins, regs = [], []
        for j, m in enumerate(dict_arr.dictionary.to_pylist()):
            mins.append(m)
            regs.append(hll_registers(users[idx == j]).tobytes())
        return pa.table(
            {
                "minute": pa.array(mins, pa.timestamp("us")),
                "sketch": pa.array(regs, pa.binary()),
            }
        )

    def merge_sketches(group: pa.Table, key: str) -> pa.Table:
        regs = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in group["sketch"].to_pylist()]
        )
        return pa.table(
            {
                key: pa.array([group[key][0].as_py()], pa.timestamp("us")),
                "sketch": pa.array([regs.max(axis=0).tobytes()], pa.binary()),
            }
        )

    minute_sketches = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("minute")
        .map_groups(lambda g: merge_sketches(g, "minute"), batch_format="pyarrow")
    )

    def rekey(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.floor_temporal(batch["minute"], unit="hour"),
                "sketch": batch["sketch"],
            }
        )

    hour_sketches = (
        minute_sketches.map_batches(rekey, batch_format="pyarrow")
        .groupby("hour")
        .map_groups(lambda g: merge_sketches(g, "hour"), batch_format="pyarrow")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        ests = [
            hll_estimate(np.frombuffer(b, dtype=np.uint8))
            for b in batch["sketch"].to_pylist()
        ]
        return pa.table(
            {
                "window_start": batch["hour"],
                "approx_users": pa.array(ests, pa.int64()),
            }
        )

    return hour_sketches.map_batches(finalize, batch_format="pyarrow")


def cms_term_counts(
    ds_documents: "ray.data.Dataset",
    n_probes: int = 10,
    width: int = 2048,
    depth: int = 4,
) -> "ray.data.Dataset":
    """Count-min sketch over the corpus term stream (Cormode &
    Muthukrishnan 2005) — the fourth mergeable sketch, complementing HLL
    (distinct), DDSketch (quantiles) and Misra-Gries (top-k): it answers
    ARBITRARY point-frequency queries with a one-sided guarantee
    est ≥ true and est ≤ true + εN w.h.p. (ε = e/width per row, error
    shrinks with min over ``depth`` independent rows).

    Scale plan: each block bincounts its token hashes into the depth×width
    counter grid (``_splitmix64`` re-mixed with a per-row seed) and emits
    only NONZERO cells; one groupby reduces cells (exchange ≤ blocks ×
    depth·width int64 triplets, independent of corpus size); the driver
    materializes the ≤ depth·width grid. Probes are the exact top
    ``n_probes`` terms (one extra combiner-first pass), so the output
    exhibits the guarantee against ground truth.

    Output: term, exact_n, cms_est, overestimate (= est − exact, ≥ 0).
    Rows-only by nature; the bound is pytest-gated.
    """
    import ray
    from ray.data.aggregate import Sum as _Sum

    from .dedup import _token_hashes_column

    seeds = np.array(
        [(0x9E3779B97F4A7C15 * (j + 1)) & 0xFFFFFFFFFFFFFFFF
         for j in range(depth)],
        dtype=np.uint64,
    )

    def cells_partial(b: pa.Table) -> pa.Table:
        hashes, _ = _token_hashes_column(b["text"])
        if hashes.size == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        rows = []
        for j in range(depth):
            col = (_splitmix64(hashes ^ seeds[j]) % np.uint64(width)).astype(
                np.int64
            )
            cnt = np.bincount(col, minlength=width)
            nz = cnt.nonzero()[0]
            rows.append(
                pa.table(
                    {
                        "cell": pa.array(j * width + nz, pa.int64()),
                        "n": pa.array(cnt[nz], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(rows)

    grid_t = (
        ds_documents.map_batches(
            cells_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("cell")
        .aggregate(_Sum("n", alias_name="n"))
    )
    from ..util import collect_table

    gt = collect_table(grid_t)
    grid = np.zeros(depth * width, np.int64)
    if gt.num_rows:
        grid[gt["cell"].to_numpy(zero_copy_only=False)] = gt["n"].to_numpy(
            zero_copy_only=False
        )
    grid = grid.reshape(depth, width)

    # exact probe pass: top-n terms by true count (combiner-first vocab)
    def term_partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.utf8_split_whitespace(pc.utf8_lower(b["text"]))
        )
        t = pa.table({"term": toks})
        t = t.filter(pc.not_equal(t["term"], ""))
        g = t.group_by(["term"]).aggregate([("term", "count")])
        return pa.table(
            {"term": g["term"], "n": pc.cast(g["term_count"], pa.int64())}
        )

    vocab = (
        ds_documents.map_batches(
            term_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("term")
        .aggregate(_Sum("n", alias_name="n"))
        .sort(["n", "term"], descending=[True, False])
        .limit(n_probes)
    )
    vt = collect_table(vocab)
    terms = vt["term"].to_pylist()
    exact = vt["n"].to_numpy(zero_copy_only=False)

    import zlib

    th = np.array(
        [zlib.crc32(t.encode()) for t in terms], dtype=np.uint64
    )
    ests = np.empty(len(terms), np.int64)
    for i in range(len(terms)):
        cols = [
            int(_splitmix64(np.array([th[i] ^ seeds[j]], np.uint64))[0]
                % np.uint64(width))
            for j in range(depth)
        ]
        ests[i] = min(grid[j, c] for j, c in enumerate(cols))
    return ray.data.from_arrow(
        pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "exact_n": pa.array(exact, pa.int64()),
                "cms_est": pa.array(ests, pa.int64()),
                "overestimate": pa.array(ests - exact, pa.int64()),
            }
        )
    )


def weighted_sample_docs(
    ds_documents: "ray.data.Dataset", k: int = 10, seed: int = 42
) -> "ray.data.Dataset":
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res,
    2006): each document draws key = u^(1/w) from a deterministic uniform
    u = splitmix64(doc_id ⊕ seed)/2⁶⁴ with weight w = max(char_len, 1); the
    k largest keys ARE an exact weighted sample — longer (weight ∝ size)
    documents are proportionally likelier, and the whole draw is
    reproducible from the seed (the property a distributed corpus sampler
    needs: no coordination, no RNG state).

    Scale plan: keys are pure per-row math; each block keeps only its
    local top-k (combiner), the driver merges ≤ k·blocks candidate rows.
    log-domain keys (ln u / w) avoid underflow for huge weights.

    Output: doc_id, weight, key_micro (BIGINT, ⌊10⁶·ln(u)/w⌋ — larger is
    better) for the k winners.
    """
    import ray

    from .dedup import _splitmix64

    def candidates(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.int64()),
                    "key_micro": pa.array([], pa.int64()),
                }
            )
        w = pc.utf8_length(b["text"]).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        w = np.maximum(w, 1)
        h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
        # u in (0,1): (h + 1) / (2^64 + 2) keeps both endpoints open
        u = (h.astype(np.float64) + 1.0) / 18446744073709551618.0
        key = np.log(u) / w  # monotone transform of u^(1/w); larger wins
        key_micro = np.floor(key * 1_000_000).astype(np.int64)
        top = np.argsort(key_micro, kind="stable")[::-1][:k]
        top = np.sort(top)  # deterministic row order within the block
        return pa.table(
            {
                "doc_id": pa.array(ids[top], pa.int64()),
                "weight": pa.array(w[top], pa.int64()),
                "key_micro": pa.array(key_micro[top], pa.int64()),
            }
        )

    cand = ds_documents.map_batches(
        candidates, batch_format="pyarrow", zero_copy_batch=True
    )
    from ..util import collect_table

    t = collect_table(
        cand,
        fallback_schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("weight", pa.int64()),
                ("key_micro", pa.int64()),
            ]
        ),
    )
    order = pc.sort_indices(
        t,
        sort_keys=[("key_micro", "descending"), ("doc_id", "ascending")],
    )
    return ray.data.from_arrow(t.take(order[:k]))


def dp_event_counts(
    events_ds: "ray.data.Dataset", epsilon_micro: int = 1_000_000, seed: int = 42
) -> "ray.data.Dataset":
    """Differentially-private event-type counts: exact combiner counts plus
    seeded Laplace(1/ε) noise — the ε-DP histogram release (sensitivity 1
    per event for count queries). Noise is DETERMINISTIC given the seed:
    u = splitmix64(crc32(key) ⊕ seed)/2⁶⁴ through the Laplace inverse CDF,
    so releases are reproducible across runs and cluster shapes (the
    property an auditable DP pipeline needs; rotate the seed per release).

    Scale plan: the count is the standard combiner-first groupby; noise is
    O(groups) driver math on the result-sized table.

    Output: event_type, noisy_count (BIGINT, clamped ≥ 0), epsilon_micro.
    Rows-only by nature; reference-formula + determinism gates in tests.
    """
    import zlib

    import ray
    from ray.data.aggregate import Sum as _Sum

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["event_type"]).group_by(["event_type"]).aggregate(
            [("event_type", "count")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": pc.cast(g["event_type_count"], pa.int64()),
            }
        )

    counts = (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(_Sum("n", alias_name="n"))
    )
    from ..util import collect_table

    t = collect_table(
        counts,
        fallback_schema=pa.schema(
            [("event_type", pa.string()), ("n", pa.int64())]
        ),
    )
    keys = t["event_type"].to_pylist()
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    kh = np.array([zlib.crc32(k.encode()) for k in keys], np.uint64)
    u = (
        _splitmix64(kh ^ np.uint64(seed)).astype(np.float64) + 1.0
    ) / 18446744073709551618.0
    b_scale = 1_000_000.0 / max(epsilon_micro, 1)
    centered = u - 0.5
    noise = -b_scale * np.sign(centered) * np.log1p(-2.0 * np.abs(centered))
    noisy = np.maximum(np.rint(n + noise), 0).astype(np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(keys, pa.string()),
                "noisy_count": pa.array(noisy, pa.int64()),
                "epsilon_micro": pa.array(
                    np.full(len(keys), epsilon_micro, np.int64), pa.int64()
                ),
            }
        )
    )


def join_cardinality_estimate(
    left_ds: "ray.data.Dataset",
    right_ds: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Sketch-based equi-join output-size estimate — the cost model the
    adaptive join planner (stages/joins.py::plan_equi_join) is missing:
    footer stats give row counts, this gives the *output* cardinality
    before any shuffle is paid for.

    Per side, each block reduces to one row per hash bucket of the join
    key: (bucket, n_rows, 4096-register HLL). Bucket sketches merge
    register-wise max (one tiny groupby over ≤ n_buckets·blocks rows —
    never row-sized). The estimate applies the textbook containment bound
    per bucket and sums::

        |A ⋈ B| ≈ Σ_b  n_l(b) · n_r(b) / max(d_l(b), d_r(b))

    Bucketing (same splitmix64 hash family, disjoint from the register
    hash) localizes skew: a hot key inflates only its own bucket's ratio
    instead of averaging away. Approximate by nature → rows-only driver
    entry; the pytest gate plants skewed fixtures and bounds the relative
    error against the exact join count.

    Output: one row — est_rows, n_left, n_right, n_buckets (BIGINT).
    """

    def side_partials(ds: "ray.data.Dataset", key: str) -> list[dict]:
        def partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {
                        "bucket": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "reg": pa.array([], pa.binary()),
                    }
                )
            k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
            # disjoint hash for bucketing (salted so it never correlates
            # with the HLL register hash on the same key)
            bk = (
                _splitmix64((k + np.int64(0x9E37)).astype(np.uint64))
                % np.uint64(n_buckets)
            ).astype(np.int64)
            out = {"bucket": [], "n": [], "reg": []}
            order = np.argsort(bk, kind="stable")
            sb, sk = bk[order], k[order]
            starts = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
            bounds = np.r_[starts, len(sb)]
            for i in range(len(starts)):
                lo, hi = bounds[i], bounds[i + 1]
                out["bucket"].append(int(sb[lo]))
                out["n"].append(int(hi - lo))
                out["reg"].append(hll_registers(sk[lo:hi]).tobytes())
            return pa.table(
                {
                    "bucket": pa.array(out["bucket"], pa.int64()),
                    "n": pa.array(out["n"], pa.int64()),
                    "reg": pa.array(out["reg"], pa.binary()),
                }
            )

        rows = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()  # ≤ n_buckets·blocks rows — sketch-sized, not data-sized
        merged: dict[int, dict] = {}
        for r in rows:
            m = merged.setdefault(
                r["bucket"], {"n": 0, "reg": np.zeros(_M, np.uint8)}
            )
            m["n"] += r["n"]
            np.maximum(m["reg"], np.frombuffer(r["reg"], np.uint8), out=m["reg"])
        return merged

    left = side_partials(left_ds, left_key)
    right = side_partials(right_ds, right_key)
    n_left = sum(v["n"] for v in left.values())
    n_right = sum(v["n"] for v in right.values())
    est = 0
    for b, lv in left.items():
        rv = right.get(b)
        if rv is None:
            continue
        d = max(hll_estimate(lv["reg"]), hll_estimate(rv["reg"]), 1)
        est += (lv["n"] * rv["n"]) // d
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "est_rows": pa.array([est], pa.int64()),
                "n_left": pa.array([n_left], pa.int64()),
                "n_right": pa.array([n_right], pa.int64()),
                "n_buckets": pa.array([n_buckets], pa.int64()),
            }
        )
    )


def hll_set_overlap(
    left_ds: "ray.data.Dataset",
    right_ds: "ray.data.Dataset",
    left_key: str,
    right_key: str,
) -> pa.Table:
    """Sketch-based set-overlap estimate between two key columns —
    inclusion–exclusion over HyperLogLog registers (the theta-sketch use
    case on the sketch family already in the engine): ``|A∩B| ≈ |A| + |B|
    − |A∪B|`` where the union sketch is the register-wise max of the two
    sides' sketches (exactly mergeable, so each side reduces map-side to
    one 4096-register sketch per block and the driver folds bytes, never
    keys).

    Approximate by nature → rows-only driver entry; the pytest gate plants
    known overlaps and bounds the relative error. Intersection is clamped
    at ≥ 0 (inclusion–exclusion can go negative at tiny overlaps — the
    standard caveat, documented rather than hidden).

    Output: one row — est_left, est_right, est_union, est_intersection,
    jaccard_ppm (BIGINTs).
    """

    def side_sketch(ds: "ray.data.Dataset", key: str) -> np.ndarray:
        def partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"reg": pa.array([], pa.binary())})
            k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"reg": pa.array([hll_registers(k).tobytes()], pa.binary())}
            )

        rows = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()  # one 4 KiB sketch per block
        reg = np.zeros(_M, np.uint8)
        for r in rows:
            np.maximum(reg, np.frombuffer(r["reg"], np.uint8), out=reg)
        return reg

    ra = side_sketch(left_ds, left_key)
    rb = side_sketch(right_ds, right_key)
    a = hll_estimate(ra)
    b = hll_estimate(rb)
    u = hll_estimate(np.maximum(ra, rb))
    inter = max(0, a + b - u)
    jac = inter * 1_000_000 // u if u else 0
    return pa.table(
        {
            "est_left": pa.array([a], pa.int64()),
            "est_right": pa.array([b], pa.int64()),
            "est_union": pa.array([u], pa.int64()),
            "est_intersection": pa.array([inter], pa.int64()),
            "jaccard_ppm": pa.array([jac], pa.int64()),
        }
    )
