"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).

Every implemented operator from SURVEY.md §2 (plus the training-data ops)
has an entry here; non-SQL-expressible ones (codecs, gap-fill grid, LSH
candidate generation, language-ID heuristics) have no ``oracle_sql`` entry
and get the driver's rows-only check — their correctness gates live in
``tests/`` instead (bit-exact vs the single-process oracle).

Ray is initialised by the driver BEFORE this module is imported: nothing in
this module or the library calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyarrow as pa
import pyarrow.compute as pc

from pyreshaper_ray.sources.adapters import (
    EVENTS_AS_TRANSCRIPTS_SQL,
    read_events_as_transcripts,
)
from pyreshaper_ray.stages.normalize import normalize_dataset
from pyreshaper_ray.stages.pivot import pivot_turns

_T = EVENTS_AS_TRANSCRIPTS_SQL  # the adapter, restated in SQL


def _int64_rollup(ds) -> pa.Table:
    """Collect a rollup Dataset and cast the int32 min/max to BIGINT so the
    schema matches DuckDB's aggregate output types."""
    from pyreshaper_ray.util import collect_table

    t = collect_table(ds)
    cols = {}
    for name in t.column_names:
        if name == "bucket":  # hive partition column from tier layouts
            continue
        col = t[name]
        cols[name] = pc.cast(col, pa.int64()) if col.type == pa.int32() else col
    return pa.table(cols)


def _norm_ds(sf_dir: str):
    return normalize_dataset(read_events_as_transcripts(sf_dir))


# ---------------------------------------------------------------- queries


def q_pivot_turns(sf_dir: str):
    return pivot_turns(_norm_ds(sf_dir)).select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def q_rollup_1m(sf_dir: str):
    from pyreshaper_ray.stages.rollup import rollup_1m

    return _int64_rollup(rollup_1m(_norm_ds(sf_dir)))


def q_rollup_1h(sf_dir: str):
    from pyreshaper_ray.stages.rollup import cascade, rollup_1m

    return _int64_rollup(cascade(rollup_1m(_norm_ds(sf_dir)), "1h"))


def q_rollup_1d(sf_dir: str):
    from pyreshaper_ray.stages.rollup import cascade, rollup_1m

    return _int64_rollup(cascade(cascade(rollup_1m(_norm_ds(sf_dir)), "1h"), "1d"))


def q_gapfill_1m(sf_dir: str):
    """Gap-fill the 1m tier, then summarize per conversation (full grid size
    + number of filled windows) — SQL-checkable and driver-sized."""
    from ray.data.aggregate import Sum

    from pyreshaper_ray.stages.gapfill import gapfill_tier
    from pyreshaper_ray.stages.rollup import rollup_1m

    gf = gapfill_tier(rollup_1m(_norm_ds(sf_dir)))

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"conv_id": b["conv_id"], "filled_i": pc.cast(b["filled"], pa.int64())}
        )
        g = t.group_by(["conv_id"]).aggregate(
            [("filled_i", "sum"), ("filled_i", "count")]
        )
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "n_filled": g["filled_i_sum"],
                "n_windows": pc.cast(g["filled_i_count"], pa.int64()),
            }
        )

    p = gf.map_batches(partial, batch_format="pyarrow")
    return p.groupby("conv_id").aggregate(
        Sum("n_filled", alias_name="n_filled"),
        Sum("n_windows", alias_name="n_windows"),
    )


def q_series_encode(sf_dir: str):
    from pyreshaper_ray.stages.pivot import encode_series
    from pyreshaper_ray.util import collect_table

    ds = encode_series(_norm_ds(sf_dir))
    t = collect_table(ds)
    return pa.table(
        {
            "conv_id": t["conv_id"],
            "n_turns": t["n_turns"],
            "dod_bytes": pc.cast(pc.binary_length(t["dod_ts"]), pa.int64()),
            "gorilla_bytes": pc.cast(
                pc.binary_length(t["gorilla_char_len"]), pa.int64()
            ),
        }
    )


def q_series_roundtrip(sf_dir: str):
    """Encode → decode round trip at the Dataset level: per-conversation
    stats re-derived FROM the DoD/Gorilla blobs must equal SQL aggregates of
    the raw rows — the lossless-compression contract, oracle-checked."""
    from pyreshaper_ray.stages.pivot import decode_series_stats, encode_series

    return decode_series_stats(encode_series(_norm_ds(sf_dir)))


def q_distinct_tools_1m(sf_dir: str):
    from pyreshaper_ray.stages.analytics import distinct_tools_per_window

    return distinct_tools_per_window(_norm_ds(sf_dir), "w1m")


def q_topk_convs(sf_dir: str):
    from pyreshaper_ray.stages.analytics import topk_convs_by_chars

    return topk_convs_by_chars(_norm_ds(sf_dir), k=10)


def q_sessionize(sf_dir: str):
    from pyreshaper_ray.stages.analytics import sessionize

    return sessionize(read_events_as_transcripts(sf_dir), gap_s=1800)


def q_conv_stats(sf_dir: str):
    from pyreshaper_ray.stages.analytics import conv_stats

    return conv_stats(read_events_as_transcripts(sf_dir))


def q_q1(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q1_pricing_summary

    return q1_pricing_summary(sf_dir)


def q_orders_by_segment(sf_dir: str):
    from pyreshaper_ray.stages.analytics import orders_by_segment

    return orders_by_segment(sf_dir)


def q_dedup_exact(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.dedup import dedup_exact

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup_exact(ds)


def q_token_count(sf_dir: str):
    from pyreshaper_ray.stages.text import run_text_stage, token_count_batch

    return run_text_stage(sf_dir, token_count_batch)


def q_quality(sf_dir: str):
    from pyreshaper_ray.stages.text import quality_batch, run_text_stage

    return run_text_stage(sf_dir, quality_batch)


def q_content_hash(sf_dir: str):
    from pyreshaper_ray.stages.text import content_hash_batch, run_text_stage

    return run_text_stage(sf_dir, content_hash_batch)


def q_fingerprint(sf_dir: str):
    from pyreshaper_ray.stages.text import fingerprint_batch, run_text_stage

    return run_text_stage(sf_dir, fingerprint_batch)


def q_winnow(sf_dir: str):
    """Winnowing (MOSS) local fingerprints; rows-only (no SQL analog — the
    shared-substring guarantee is pytest-gated in tests/test_text.py)."""
    from pyreshaper_ray.stages.text import winnow_documents

    return winnow_documents(sf_dir).select_columns(["doc_id", "n_fingerprints"])


def q_lang_id(sf_dir: str):
    from pyreshaper_ray.stages.text import lang_id_documents

    return lang_id_documents(sf_dir)


def q_simhash(sf_dir: str):
    from pyreshaper_ray.stages.dedup import simhash_documents

    return simhash_documents(sf_dir)


def q_minhash_neardup(sf_dir: str):
    """MinHash+LSH near-dup pairs, exact-Jaccard-verified at θ=0.8.

    VALUE-CHECKED (VERDICT r4 #5, upgraded from rows-only): the verify
    stage emits exactly the candidate pairs whose true word-3-shingle
    Jaccard ≥ 0.8, and at that threshold every true pair collides in at
    least one of the 32 bands on the driver corpora (equality vs the
    exhaustive pair set confirmed at sf0.001 AND sf0.01 — LSH banding is
    seed-fixed, so the result is deterministic per input). The oracle SQL
    replays the exhaustive truth: tokenize (lower + whitespace split),
    build word-3-gram shingle sets (<3 tokens → token set; empty → a
    sentinel singleton, mirroring ``dedup.shingle_hashes``), and join on
    shingles for exact |∩|/|∪|."""
    from pyreshaper_ray.stages.dedup import minhash_dedup

    return minhash_dedup(sf_dir, threshold=0.8)


def q_dup_span_extract(sf_dir: str):
    """ExactSubstr-style duplicated-passage cut list (Lee et al. 2022):
    maximal runs of >= 3 consecutive duplicated 5-gram windows as
    (doc_id, tok_start, tok_end) spans. Value-checked: the SQL oracle
    replays the string-gram truth (the engine's 64-bit gram hashes are
    collision-free on the driver corpora, same argument as the coverage
    sibling)."""
    import ray.data

    from pyreshaper_ray.stages.dedup import dup_span_extract

    return dup_span_extract(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        n=5,
        min_run=3,
    )


def q_knn(sf_dir: str):
    from pyreshaper_ray.stages.similarity import knn_bruteforce

    return knn_bruteforce(sf_dir, n_queries=5, k=5)


def q_neardup_groups_distributed(sf_dir: str):
    """Connected components over the exact near-dup pair graph via the
    DISTRIBUTED propagate + pointer-jump closure (stages/graph.py) instead
    of the driver union-find — same output and recursive-CTE oracle as
    ``neardup_groups``, but the edge list and label table never leave the
    object store (the 10^12-doc path)."""
    from pyreshaper_ray.stages.graph import components_distributed
    from pyreshaper_ray.stages.similarity import neardup_pairs

    pairs = neardup_pairs(sf_dir, threshold=0.4)
    edges = pairs.map_batches(
        lambda b: pa.table({"a": b["vec_a"], "b": b["vec_b"]}),
        batch_format="pyarrow",
    )
    return components_distributed(edges).map_batches(
        lambda b: pa.table({"vec_id": b["node"], "rep_id": b["label"]}),
        batch_format="pyarrow",
    )


def q_ohlc_1m(sf_dir: str):
    """OHLC candles per minute over the events value stream — combiner-first
    argmin/argmax partials (deciding keys travel with the values), exchange
    is windows×blocks-sized."""
    import ray.data

    from pyreshaper_ray.stages.timeseries import ohlc_bars

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "value"]
    )
    return ohlc_bars(ev, unit="minute")


def q_time_weighted_value(sf_dir: str):
    """Per-user time-weighted value components over irregular samples
    (LOCF weighting, exact cents × whole-second integers)."""
    import ray.data

    from pyreshaper_ray.stages.timeseries import time_weighted_value

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    return time_weighted_value(ev)


def q_lttb_downsample(sf_dir: str):
    """LTTB visual downsample of each user's value series to ≤8 points
    (rows-only: the representative-point choice is algorithmic, not
    SQL-expressible; property-gated in tests/test_timeseries.py)."""
    import ray.data

    from pyreshaper_ray.stages.timeseries import lttb_downsample

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    return lttb_downsample(ev, n_out=8)


def q_text_embed_knn(sf_dir: str):
    """Embedding PRODUCER chain (rows-only): actor-pool text encoder
    (seed-fixed hashing-trick model loaded per actor in __init__) feeding
    brute-force cosine top-k over the produced vectors. Semantics gated by
    tests/test_embed.py (planted near-dup must be the top neighbor)."""
    from pyreshaper_ray.stages.embed import text_embed_knn

    return text_embed_knn(sf_dir, n_queries=5, k=5)


def q_conv_trend(sf_dir: str):
    """Per-conversation least-squares trend components (char_len vs
    turn_idx) as exact integer sufficient statistics — combiner-first, one
    partial row per (block, conv) crosses the exchange."""
    from pyreshaper_ray.stages.analytics import conv_trend_components

    return conv_trend_components(_norm_ds(sf_dir))


def q_latest_event_per_user(sf_dir: str):
    """Last-write-wins compaction: newest event per user under
    (ts DESC, event_id DESC) — per-block argmax partials, coarse-bucket
    merge; only candidate rows cross the exchange."""
    import ray.data

    from pyreshaper_ray.stages.analytics import latest_event_per_user

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    return latest_event_per_user(ev)


def q_rolling_minmax(sf_dir: str):
    """Rolling MIN/MAX(char_len) over a 3-turn frame per conversation —
    integer-exact shifted-extrema kernel inside groupby(conv).map_groups."""
    from pyreshaper_ray.stages.windows import rolling_minmax_turns

    return rolling_minmax_turns(_norm_ds(sf_dir), frame=3)


def q_ngram_jaccard_neighbors(sf_dir: str):
    """Exact char-3-gram Jaccard (ppm) for deterministic neighbor pairs
    (doc_id, doc_id+1) — the n-gram-Jaccard dedup verification kernel run
    distributed with a SQL-replayable pair rule."""
    import ray.data

    from pyreshaper_ray.stages.dedup import ngram_jaccard_neighbors

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ngram_jaccard_neighbors(ds, k=3)


def q_trending_terms(sf_dir: str):
    """Top-3 terms per day over the transcript stream — windowed word
    count, combiner-first (window, term) partials, result-sized per-window
    top-k."""
    from pyreshaper_ray.stages.text import trending_terms

    return trending_terms(_norm_ds(sf_dir), k=3, unit="day")


def q_partition_fingerprint(sf_dir: str):
    """Anti-entropy table checksum: per-partition XOR of 60-bit md5 row
    digests + row count (replica/migration verification at constant
    exchange size)."""
    import ray.data

    from pyreshaper_ray.stages.analytics import partition_fingerprint

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    return partition_fingerprint(ev)


def q_snapshot_diff(sf_dir: str):
    """CDC diff between two deterministic synthetic snapshots of events
    (old = ids % 89 ≠ 0; new = ids % 97 ≠ 0 with a +1.00 value bump where
    id % 101 = 0) — added/removed/changed per key; each side reduces to
    (key, digest) before the exchange."""
    import numpy as np
    import ray.data

    from pyreshaper_ray.stages.analytics import snapshot_diff

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def old_side(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(eid % 89 != 0))

    def new_side(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(eid % 97 != 0))
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False)
        bumped = v + (eid % 101 == 0).astype(np.float64)
        return b.set_column(
            b.schema.get_field_index("value"), "value", pa.array(bumped)
        )

    old = ev.map_batches(old_side, batch_format="pyarrow", zero_copy_batch=True)
    new = ev.map_batches(new_side, batch_format="pyarrow", zero_copy_batch=True)
    return snapshot_diff(old, new)


def q_debounce_events(sf_dir: str):
    """Debounce the event stream per (user, type): keep first-of-key or
    events > 10 min after the key's previous event (LAG semantics)."""
    import ray.data

    from pyreshaper_ray.stages.windows import debounce_events

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return debounce_events(ev, gap_s=600)


def q_clean_text(sf_dir: str):
    """Whitespace-normalization hygiene pass (Arrow RE2 kernels, byte-exact
    vs the oracle's identical pattern)."""
    import ray.data

    from pyreshaper_ray.stages.text import clean_text

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return clean_text(ds)


def q_redact_pii(sf_dir: str):
    """PII redaction (emails then phones) with per-doc audit counts —
    vectorized RE2 substitution, byte-exact vs the oracle."""
    import ray.data

    from pyreshaper_ray.stages.text import redact_pii

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return redact_pii(ds)


def q_user_gap_stats(sf_dir: str):
    """Per-user inter-event gap distribution (integer whole-second
    sufficient statistics, deterministic (ts, event_id) order)."""
    import ray.data

    from pyreshaper_ray.stages.windows import user_gap_stats

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return user_gap_stats(ev)


def q_embedding_dim_stats(sf_dir: str):
    """Per-dimension moment stats over the embedding column (floor-milli
    integer quantization, bit-exact under any block order)."""
    import ray.data

    from pyreshaper_ray.stages.similarity import embedding_dim_stats

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )
    return embedding_dim_stats(ds)


def q_sample_per_source(sf_dir: str):
    """Deterministic 5-per-stratum sample of documents by md5(doc_id) order
    — combiner-first per-group top-k, k×strata×blocks exchange."""
    import ray.data

    from pyreshaper_ray.stages.sketches import sample_per_stratum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return sample_per_stratum(ds, k=5).select_columns(
        ["source", "doc_id", "n_chars"]
    )


def q_event_trigrams(sf_dir: str):
    """Global (a, b, c) event-type trigram counts over per-user ordered
    streams — sequence mining one step past the Markov transitions."""
    import ray.data

    from pyreshaper_ray.stages.windows import event_trigrams

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    return event_trigrams(ev)


def q_value_mad_outliers(sf_dir: str):
    """Robust MAD outliers over event values — two shuffle-free
    histogram-refinement medians (value, then |dev|) + one broadcast-scalar
    filter pass, all in exact integer cents."""
    import ray.data

    from pyreshaper_ray.stages.analytics import value_mad_outliers

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    return value_mad_outliers(ev, k=5)


def q_drop_repeated_turns(sf_dir: str):
    """Consecutive-duplicate turn compaction per conversation (LAG text
    comparison) — the retry scrub, emitting kept keys only."""
    from pyreshaper_ray.stages.windows import drop_repeated_turns

    return drop_repeated_turns(_norm_ds(sf_dir))


def q_q3_unshipped(sf_dir: str):
    """TPC-H Q3 shape: top-10 open-revenue orders (segment semi-join,
    pruned orders⋈lineitem hash join, combiner-first revenue)."""
    from pyreshaper_ray.stages.analytics import q3_unshipped_revenue

    return q3_unshipped_revenue(sf_dir)


def q_p95_chars_1h(sf_dir: str):
    """Exact p95 of char_len per 1-hour window — coarse-bucket vectorized
    multi-window selection (full multiset co-location is inherent to an
    exact quantile; DDSketch is the approximate path)."""
    from pyreshaper_ray.stages.analytics import windowed_quantile_chars

    return windowed_quantile_chars(_norm_ds(sf_dir), q=0.95, unit="hour")


def q_top_users_by_active_days(sf_dir: str):
    """Top-10 users by COUNT(DISTINCT active day) — distinct-pair
    combiner, pair-key groupby, per-user count; shuffles move distinct
    pairs, never events."""
    import ray.data

    from pyreshaper_ray.stages.analytics import top_users_by_active_days

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return top_users_by_active_days(ev, k=10)


def q_knn_lsh(sf_dir: str):
    """Approximate ANN (sign-LSH buckets, per-bucket top-k via map_groups).
    No SQL oracle by design (approximate); the recall-vs-bruteforce gate
    lives in tests/test_similarity.py."""
    from pyreshaper_ray.stages.similarity import knn_lsh

    return knn_lsh(sf_dir, n_queries=5, k=5, n_bits=4)


def q_knn_ivf(sf_dir: str):
    """IVF ANN (centroid cells + n_probe nearest-cell scan). Rows-only by
    design (approximate); recall gate in tests/test_similarity.py."""
    from pyreshaper_ray.stages.similarity import knn_ivf

    return knn_ivf(sf_dir, n_queries=5, k=5)


def q_knn_ivf_full_probe(sf_dir: str):
    """IVF ANN probing EVERY cell (n_probe = n_cells) — mathematically
    equal to the exact brute-force top-k, whatever the centroids, so the
    whole IVF machinery (kmeans training, cell assignment, per-cell
    top-k, candidate merge, tie-breaks) is VALUE-CHECKED against the
    exact-cosine SQL oracle (VERDICT r4 #5: upgrade rows-only ANN to a
    value-checked row). ``knn_ivf_top5`` keeps the honest approximate
    configuration alongside."""
    from pyreshaper_ray.stages.similarity import knn_ivf

    return knn_ivf(sf_dir, n_queries=5, k=5, n_cells=32, n_probe=32)


def q_embedding_neardup_lsh(sf_dir: str):
    """Approximate near-dup pairs (multi-table sign-LSH + in-bucket exact
    cosine). Rows-only by design; recall gate in tests/test_similarity.py."""
    from pyreshaper_ray.stages.similarity import neardup_lsh
    from pyreshaper_ray.util import collect_table

    schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
    return collect_table(neardup_lsh(sf_dir, threshold=0.4), schema)


def q_neardup_groups(sf_dir: str):
    """Connected-component near-dup grouping (vec → min-id representative),
    oracle-checked against a recursive-CTE reachability closure."""
    from pyreshaper_ray.stages.similarity import neardup_groups

    return neardup_groups(sf_dir, threshold=0.4)


def q_embedding_neardup(sf_dir: str):
    from pyreshaper_ray.stages.similarity import neardup_pairs
    from pyreshaper_ray.util import collect_table

    # the synthetic embeddings' max pairwise cosine is ~0.51 — 0.4 selects a
    # small but non-empty near-dup set
    schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
    return collect_table(neardup_pairs(sf_dir, threshold=0.4), schema)


def q_lineitem_orders_join(sf_dir: str):
    """Large⋈large hash join (Dataset.join) + combiner aggregate."""
    import ray.data
    from ray.data.aggregate import Sum

    from pyreshaper_ray.stages.analytics import to_cents
    from pyreshaper_ray.stages.joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    )
    li = li.map_batches(
        lambda b: pa.table(
            {"o_orderkey": b["l_orderkey"], "price_c": to_cents(b["l_extendedprice"])}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # both sides are (mapped) raw parquet reads — every block schema-bearing,
    # so the empty-block coalesce guard is unnecessary overhead here
    joined = hash_join(li, orders, on="o_orderkey", coalesce="none")

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_orderstatus"]).aggregate(
            [("price_c", "sum"), ("price_c", "count")]
        )
        return pa.table(
            {
                "o_orderstatus": g["o_orderstatus"],
                "price_cents": g["price_c_sum"],
                "n_items": pc.cast(g["price_c_count"], pa.int64()),
            }
        )

    return joined.map_batches(partial, batch_format="pyarrow").groupby(
        "o_orderstatus"
    ).aggregate(
        Sum("price_cents", alias_name="price_cents"),
        Sum("n_items", alias_name="n_items"),
    )


def q_enrich_conv_channel(sf_dir: str):
    """Broadcast-enrich (J1 analog): per-turn rows enriched with a
    conversation-level attribute from a small dimension side, aggregated."""
    import pyarrow.parquet as pq

    import ray.data
    from ray.data.aggregate import Sum

    from pyreshaper_ray.stages.joins import broadcast_enrich

    # dimension side: per-user segment from customer-like mapping — derive a
    # deterministic conv attribute from user_id parity (SQL-restatable)
    ds = read_events_as_transcripts(sf_dir)
    events = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    users = sorted(set(events["user_id"].to_pylist()))
    dim = pa.table(
        {
            "conv_id": pa.array([f"u{u}" for u in users], pa.string()),
            "cohort": pa.array(
                ["even" if u % 2 == 0 else "odd" for u in users], pa.string()
            ),
        }
    )
    enriched = broadcast_enrich(ds, dim, key="conv_id")

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "cohort": b["cohort"],
                "chars": pc.cast(pc.utf8_length(b["text"]), pa.int64()),
            }
        )
        g = t.group_by(["cohort"]).aggregate([("chars", "sum"), ("chars", "count")])
        return pa.table(
            {
                "cohort": g["cohort"],
                "char_sum": g["chars_sum"],
                "n_turns": pc.cast(g["chars_count"], pa.int64()),
            }
        )

    return enriched.map_batches(partial, batch_format="pyarrow").groupby(
        "cohort"
    ).aggregate(Sum("char_sum", alias_name="char_sum"), Sum("n_turns", alias_name="n_turns"))


def q_p95_chars(sf_dir: str):
    from pyreshaper_ray.stages.analytics import quantile_chars_per_conv

    return quantile_chars_per_conv(_norm_ds(sf_dir), q=0.95)


def q_top2_turns(sf_dir: str):
    from pyreshaper_ray.stages.analytics import topk_turns_per_conv

    return topk_turns_per_conv(_norm_ds(sf_dir), k=2)


def q_median_chars(sf_dir: str):
    from pyreshaper_ray.stages.analytics import median_chars_per_conv

    return median_chars_per_conv(_norm_ds(sf_dir))


def q_sliding_5m(sf_dir: str):
    from pyreshaper_ray.stages.analytics import sliding_rollup
    from pyreshaper_ray.stages.rollup import rollup_1m

    return sliding_rollup(rollup_1m(_norm_ds(sf_dir)), window_minutes=5)


def q_asof_last_order(sf_dir: str):
    from pyreshaper_ray.stages.analytics import asof_last_order

    return asof_last_order(sf_dir)


def q_audio_stub(sf_dir: str):
    from pyreshaper_ray.stages.multimodal import decode_documents_as_audio

    return decode_documents_as_audio(sf_dir)


def q_multimodal(sf_dir: str):
    from pyreshaper_ray.stages.multimodal import decode_documents_as_images

    return decode_documents_as_images(sf_dir).select_columns(
        ["doc_id", "width", "height", "n_bytes"]
    )


def q_image_header_census(sf_dir: str):
    """REAL image decode in the driver (VERDICT r4 #6): spec-valid PNGs
    planted with width/height formulas of documents.n_chars, parsed by
    the real stdlib header backend (not the stub) in an actor pool; the
    oracle restates the planted dimensions."""
    from pyreshaper_ray.stages.multimodal import image_header_census

    return image_header_census(sf_dir)


def q_audio_wav_census(sf_dir: str):
    """REAL audio decode in the driver (VERDICT r4 #6): genuine RIFF/WAV
    containers planted with n_samples = n_chars % 1000 + 1 @ 8 kHz,
    parsed by the stdlib ``wave`` backend in an actor pool."""
    from pyreshaper_ray.stages.multimodal import audio_wav_census

    return audio_wav_census(sf_dir)


def q_video_sample(sf_dir: str):
    """Video frame-sample probe (stub backend): scalar metadata columns are
    pure functions of the payload byte length, so the oracle can restate
    them; the list-typed sampled_idx column is pytest-gated instead."""
    from pyreshaper_ray.stages.multimodal import sample_documents_as_video

    return sample_documents_as_video(sf_dir).select_columns(
        ["doc_id", "width", "height", "n_frames", "duration_ms", "n_sampled"]
    )


def q_pca_embeddings(sf_dir: str):
    """Top-4 PCA projection (rows-only: float list output; pytest gates
    numpy agreement + blocking-invariant determinism)."""
    import ray.data

    from pyreshaper_ray.stages.similarity import pca_project

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return pca_project(ds, k=4)


def q_quantize_embeddings(sf_dir: str):
    """Int8 embedding quantization (rows-only: float-derived list output;
    pytest gates the dequantization error bound)."""
    import ray.data

    from pyreshaper_ray.stages.similarity import quantize_embeddings_int8

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return quantize_embeddings_int8(ds)


def q_flagship_rollup_1m(sf_dir: str):
    """The FLAGSHIP itself under the oracle gate: full run (normalize →
    exchange → bucket kernel → atomic writes → manifest) into a temp dir,
    then the 1m tier read back and compared against the window-aggregate
    SQL. Exercises the whole engine, not just the standalone rollup stage."""
    from pyreshaper_ray.pipelines.flagship import read_tier, run_flagship
    from pyreshaper_ray.pipelines.spec import create_spec

    out = tempfile.mkdtemp(prefix="pyreshaper_ray_q_flagship_")
    spec = create_spec(
        input=f"{sf_dir}/events.parquet",
        out_dir=out,
        n_buckets=16,
        wmode="o",
        gapfill=False,
        encode=False,
        tiers=("1m",),
    )
    run_flagship(spec, ds=read_events_as_transcripts(sf_dir))
    return _int64_rollup(read_tier(out, "1m"))


def q_pivot_turns_exclude(sf_dir: str):
    """M5 exclusion filter under the oracle gate: pivot with a role dropped."""
    from pyreshaper_ray.stages.pivot import pivot_turns

    ds = _norm_ds(sf_dir)
    excl = pa.array(["view"])

    def drop(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.is_in(b["role"], value_set=excl)))

    filtered = ds.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)
    return pivot_turns(filtered).select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def q_retention_1m(sf_dir: str):
    """Retention enforcement under the oracle gate: run the flagship, prune
    the 1m tier at a fixed cutoff, read back what survived."""
    from pyreshaper_ray.pipelines.flagship import read_tier, run_flagship
    from pyreshaper_ray.pipelines.retention import apply_retention
    from pyreshaper_ray.pipelines.spec import create_spec

    out = tempfile.mkdtemp(prefix="pyreshaper_ray_q_retain_")
    spec = create_spec(
        input=f"{sf_dir}/events.parquet",
        out_dir=out,
        n_buckets=16,
        wmode="o",
        gapfill=False,
        encode=False,
        tiers=("1m",),
    )
    run_flagship(spec, ds=read_events_as_transcripts(sf_dir))
    # keep the trailing 30 days before now=2024-02-14 → cutoff 2024-01-15,
    # mid-corpus (the driver tables span 2024-01-01..30), so the prune
    # genuinely drops and keeps rows
    day_us = 86_400_000_000
    now_us = 1_707_868_800_000_000  # 2024-02-14T00:00:00Z
    apply_retention(out, {"1m": 30 * day_us}, now_us)
    return _int64_rollup(read_tier(out, "1m"))


def q_turn_gaps(sf_dir: str):
    from pyreshaper_ray.stages.windows import turn_gaps

    return turn_gaps(read_events_as_transcripts(sf_dir))


def q_cumsum_chars(sf_dir: str):
    from pyreshaper_ray.stages.windows import cumulative_chars

    return cumulative_chars(_norm_ds(sf_dir))


def _customer_events_existence(sf_dir: str, anti: bool):
    import ray.data

    from pyreshaper_ray.stages.joins import anti_join, semi_join
    from ray.data.aggregate import Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    fn = anti_join if anti else semi_join
    j = fn(cust, ev, on="c_custkey", right_on="user_id")

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["c_mktsegment"]).aggregate([("c_custkey", "count")])
        return pa.table(
            {
                "c_mktsegment": g["c_mktsegment"],
                "n_customers": pc.cast(g["c_custkey_count"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _S

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(_S("n_customers", alias_name="n_customers"))
    )


def q_customers_with_events(sf_dir: str):
    """Semi join (EXISTS): customers having >=1 event, counted per segment."""
    return _customer_events_existence(sf_dir, anti=False)


def q_customers_without_events(sf_dir: str):
    """Anti join (NOT EXISTS): customers with no events, per segment."""
    return _customer_events_existence(sf_dir, anti=True)


def q_orders_events_range_7d(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.joins import range_join_events

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return range_join_events(orders, events, window_days=7)


def q_rollup_orders_cube(sf_dir: str):
    from pyreshaper_ray.stages.analytics import rollup_orders_cube

    return rollup_orders_cube(sf_dir)


def q_unpivot_rollup_1m(sf_dir: str):
    from pyreshaper_ray.stages.analytics import unpivot_tier
    from pyreshaper_ray.stages.rollup import rollup_1m

    return unpivot_tier(rollup_1m(_norm_ds(sf_dir)))


def q_top_terms(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import top_terms

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return top_terms(docs, k=20)


def q_hash_sample(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.sketches import hash_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return hash_sample(docs)


def q_approx_distinct_users(sf_dir: str):
    """HLL sketch count-distinct — deterministic but not SQL-expressible
    (rows-only driver check; the 3% error gate is tests/test_sketches.py)."""
    import ray.data

    from pyreshaper_ray.stages.sketches import approx_distinct_users

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return approx_distinct_users(ev)


def q_value_histogram(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import value_histogram

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return value_histogram(ev, bin_width_cents=500)


def q_pivot_roles_wide(sf_dir: str):
    from pyreshaper_ray.stages.analytics import pivot_roles_wide

    return pivot_roles_wide(read_events_as_transcripts(sf_dir))


def q_corr_qty_price(sf_dir: str):
    from pyreshaper_ray.stages.analytics import corr_components

    return corr_components(sf_dir)


def q_approx_value_quantiles(sf_dir: str):
    """DDSketch quantiles — deterministic, not SQL-expressible (rows-only
    driver check; the 1% relative-error gate is tests/test_sketches.py)."""
    import ray.data

    from pyreshaper_ray.stages.sketches import approx_value_quantiles

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value", "event_type"]
    )
    return approx_value_quantiles(ev)


def q_tfidf_top_term(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import tfidf_top_term

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return tfidf_top_term(docs, n_docs=docs.count())


def q_bloom_join_urgent(sf_dir: str):
    """Bloom-pruned hash join: events ⋈ (urgent early orders). The bitmap of
    the small build side's keys prunes probe rows BEFORE the join shuffle;
    false positives die in the join, so results equal the plain join."""
    import pyarrow.dataset as pads

    import ray.data
    from ray.data.aggregate import Max, Sum

    from pyreshaper_ray.stages.joins import bloom_hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_orderdate"],
        filter=(
            (pads.field("o_orderpriority") == "1-URGENT")
            & (pads.field("o_orderdate") < pa.scalar(
                __import__("datetime").datetime(2024, 1, 4)))
        ),
    ).select_columns(["o_custkey"])
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )
    j = bloom_hash_join(events, orders, on="user_id", right_on="o_custkey")

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["event_type"]).aggregate(
            [("value", "count"), ("value", "max")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": pc.cast(g["value_count"], pa.int64()),
                "max_value": g["value_max"],
            }
        )

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"), Max("max_value", alias_name="max_value")
        )
    )


def q_revenue_by_region(sf_dir: str):
    from pyreshaper_ray.stages.analytics import revenue_by_region

    return revenue_by_region(sf_dir)


def q_late_events(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.windows import late_events

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    return late_events(ev, watermark_s=1800)


def q_session_windows(sf_dir: str):
    from pyreshaper_ray.stages.windows import session_windows

    return session_windows(read_events_as_transcripts(sf_dir), gap_s=1800)


def q_roles_concat(sf_dir: str):
    from pyreshaper_ray.stages.windows import roles_concat

    return roles_concat(read_events_as_transcripts(sf_dir))


def q_global_median_value(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import global_median_cents

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return global_median_cents(ev)


def q_rank_convs_in_cohort(sf_dir: str):
    from pyreshaper_ray.stages.windows import rank_convs_in_cohort

    return rank_convs_in_cohort(_norm_ds(sf_dir))


def q_moving_sum_3(sf_dir: str):
    from pyreshaper_ray.stages.windows import moving_sum_turns

    return moving_sum_turns(_norm_ds(sf_dir), frame=3)


def q_first_last_role(sf_dir: str):
    from pyreshaper_ray.stages.windows import first_last_role

    return first_last_role(read_events_as_transcripts(sf_dir))


def q_mode_role(sf_dir: str):
    from pyreshaper_ray.stages.windows import mode_role_per_conv

    return mode_role_per_conv(read_events_as_transcripts(sf_dir))


def q_userdays_both_types(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import user_day_membership

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    return user_day_membership(ev, mode="both")


def q_userdays_purchase_no_error(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import user_day_membership

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    return user_day_membership(ev, mode="a_only")


def q_dow_hour_activity(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import dow_hour_activity

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    return dow_hour_activity(ev)


def q_regex_extract(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import regex_extract_counts

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return regex_extract_counts(docs)


def q_label_vector_sums(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.similarity import label_vector_sums

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return label_vector_sums(emb)


def q_customer_event_counts_left(sf_dir: str):
    """LEFT OUTER join: every customer with their event count (0 when the
    customer never produced an event — the preserved-null side is the point
    of the query). The fact side is combiner-reduced to one row per user
    BEFORE the join, so the exchange moves counts, not events."""
    import ray.data
    from ray.data.aggregate import Sum

    from pyreshaper_ray.stages.joins import hash_join

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id"]).aggregate([("user_id", "count")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "n_events": pc.cast(g["user_id_count"], pa.int64()),
            }
        )

    counts = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("n_events", alias_name="n_events"))
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    joined = hash_join(
        cust, counts, on="c_custkey", right_on="user_id", join_type="left_outer"
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(batch["n_events"], pa.int64()), 0)
        return pa.table({"c_custkey": batch["c_custkey"], "n_events": n})

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_power_users(sf_dir: str):
    """GROUP BY ... HAVING shape: users with >= 70 events."""
    import ray.data
    from ray.data.aggregate import Sum

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id"]).aggregate([("user_id", "count")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "n_events": pc.cast(g["user_id_count"], pa.int64()),
            }
        )

    counts = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("n_events", alias_name="n_events"))
    )

    def having(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["n_events"], 70))

    return counts.map_batches(having, batch_format="pyarrow", zero_copy_batch=True)


def q_ntile_quartiles(sf_dir: str):
    from pyreshaper_ray.stages.windows import ntile_convs

    return ntile_convs(_norm_ds(sf_dir), k=4)


def q_stratified_sample(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.sketches import stratified_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return stratified_sample(docs, strata_col="lang", id_col="doc_id", k=5)


def q_monthly_revenue(sf_dir: str):
    from pyreshaper_ray.stages.analytics import monthly_revenue

    return monthly_revenue(sf_dir)


def q_cohort_retention(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import cohort_retention

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return cohort_retention(ev)


def q_funnel_signup_purchase(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import funnel_conversion

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    return funnel_conversion(ev, first_type="signup", then_type="purchase")


def q_daily_counts_full_outer(sf_dir: str):
    from pyreshaper_ray.stages.analytics import daily_counts_full_outer

    return daily_counts_full_outer(sf_dir)


def q_monthly_revenue_change(sf_dir: str):
    from pyreshaper_ray.stages.analytics import monthly_revenue_change

    return monthly_revenue_change(sf_dir)


def q_dedup_canonical(sf_dir: str):
    from pyreshaper_ray.stages.dedup import dedup_canonical

    return dedup_canonical(sf_dir, threshold=0.8)


def q_value_outliers(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import value_outliers

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    return value_outliers(ev)


def q_promo_revenue_ppm(sf_dir: str):
    from pyreshaper_ray.stages.analytics import promo_revenue_ppm

    return promo_revenue_ppm(sf_dir)


def q_rolling_7d_distinct_users(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import rolling_distinct_users

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return rolling_distinct_users(ev, window_days=7)


def q_centroid_similarity(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.similarity import centroid_similarity_components

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return centroid_similarity_components(emb)


def q_event_transitions(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.windows import event_transitions

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    )
    return event_transitions(ev)


def q_funnel_latency(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import funnel_latency

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    return funnel_latency(ev)


def q_props_k_stats(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import props_k_stats

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )
    return props_k_stats(ev)


def q_skew_join_events_customers(sf_dir: str):
    """Inner join events⋈customer through the skew-aware hybrid plan: keys
    above the hot threshold join via broadcast (no shuffle of their rows),
    the cold tail through the hash join — results identical to a plain
    join (the oracle checks against the straightforward SQL INNER JOIN)."""
    import ray.data

    from pyreshaper_ray.stages.joins import skew_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    joined = skew_join(ev, cust, on="user_id", right_on="c_custkey",
                       hot_threshold=50)
    return joined.select_columns(["event_id", "user_id", "c_mktsegment"])


def q_source_share_ppm(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import source_share_ppm

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    return source_share_ppm(docs)


def q_orders_above_customer_avg(sf_dir: str):
    from pyreshaper_ray.stages.analytics import orders_above_customer_avg

    return orders_above_customer_avg(sf_dir)


def q_heavy_hitters_terms(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.sketches import heavy_hitters_terms

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return heavy_hitters_terms(docs, k=10, capacity=256)


def q_rolling_7d_user_value(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.windows import rolling_range_sum_user

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return rolling_range_sum_user(ev, window_days=7)


def q_kmeans_embeddings(sf_dir: str):
    from pyreshaper_ray.stages.similarity import kmeans_embeddings

    return kmeans_embeddings(sf_dir, k=8, n_iters=3)


def q_pq_encode_embeddings(sf_dir: str):
    """Product-quantization codes + exact reconstruction distortion
    (rows-only: iterative codebook training is SQL-inexpressible; pytest
    gates determinism and planted-cluster agreement)."""
    from pyreshaper_ray.stages.similarity import pq_train_encode

    return pq_train_encode(sf_dir, m_subspaces=8, k=16, n_iters=3)


def q_gram_matrix(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.similarity import gram_matrix

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return gram_matrix(emb)


def entry() -> Any:
    """Flagship pipeline (read → normalize → bucket shuffle → pivot + rollup
    tiers + gap-fill + codecs → partitioned parquet + manifest) on the
    sf0.001 events stream adapted to the transcript schema."""
    from pyreshaper_ray.pipelines.flagship import read_tier, run_flagship
    from pyreshaper_ray.pipelines.spec import create_spec

    sf_dir = "/root/testdata/sf0.001"
    out = tempfile.mkdtemp(prefix="pyreshaper_ray_entry_")
    spec = create_spec(
        input=f"{sf_dir}/events.parquet", out_dir=out, n_buckets=8, wmode="o"
    )
    ds = read_events_as_transcripts(sf_dir)
    run_flagship(spec, ds=ds)
    return read_tier(out, "1m")


def q_rollup_1w(sf_dir: str):
    """Weekly retention tier — cascaded 1m→1h→1d→1w, never from raw turns
    (continuous-aggregate contract, SURVEY.md §2.5)."""
    from pyreshaper_ray.stages.rollup import cascade, rollup_1m

    d = cascade(cascade(rollup_1m(_norm_ds(sf_dir)), "1h"), "1d")
    return _int64_rollup(cascade(d, "1w"))


def q_ewma_chars(sf_dir: str):
    from pyreshaper_ray.stages.windows import ewma_chars

    return ewma_chars(_norm_ds(sf_dir))


def q_q10_returned(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q10_returned_revenue

    return q10_returned_revenue(sf_dir)


def q_event_type_overlap(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import event_type_user_overlap

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return event_type_user_overlap(ds)


def q_scd2_value_history(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import scd2_value_history

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    )
    return scd2_value_history(ds)


def q_concurrent_convs(sf_dir: str):
    from pyreshaper_ray.stages.analytics import concurrent_convs

    return concurrent_convs(read_events_as_transcripts(sf_dir))


def _events_value_ds(sf_dir: str, cols: list[str]):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=cols)


def q_value_deciles(sf_dir: str):
    from pyreshaper_ray.stages.analytics import value_deciles

    return value_deciles(_events_value_ds(sf_dir, ["value"]))


def q_winsorized_value_stats(sf_dir: str):
    from pyreshaper_ray.stages.analytics import winsorized_value_stats

    return winsorized_value_stats(
        _events_value_ds(sf_dir, ["event_type", "value"])
    )


def q_role_runs(sf_dir: str):
    from pyreshaper_ray.stages.windows import role_runs

    return role_runs(read_events_as_transcripts(sf_dir))


def q_longest_streak(sf_dir: str):
    from pyreshaper_ray.stages.windows import longest_streak_days

    return longest_streak_days(_events_value_ds(sf_dir, ["user_id", "ts"]))


def q_median_value_per_type(sf_dir: str):
    from pyreshaper_ray.stages.analytics import median_value_per_type

    return median_value_per_type(
        _events_value_ds(sf_dir, ["event_type", "value"])
    )


def q_wau_by_week(sf_dir: str):
    from pyreshaper_ray.stages.analytics import wau_by_week

    return wau_by_week(_events_value_ds(sf_dir, ["user_id", "ts"]))


def q_doc_len_histogram(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import doc_len_histogram

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    return doc_len_histogram(ds)


def q_tier_upsert_late(sf_dir: str):
    """Late-data merge audit: split turns deterministically (turn_idx
    parity) into an 'on-time' and a 'late' batch, roll each up
    independently, merge the two tier tables — the result must equal the
    single-pass 1m rollup bit-for-bit (oracle: the plain rollup SQL)."""
    import pyarrow.compute as _pc

    from pyreshaper_ray.stages.rollup import merge_tiers, rollup_1m

    ds = _norm_ds(sf_dir)
    even = ds.map_batches(
        lambda b: b.filter(
            _pc.equal(_pc.bit_wise_and(_pc.cast(b["turn_idx"], pa.int64()), 1), 0)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    odd = ds.map_batches(
        lambda b: b.filter(
            _pc.equal(_pc.bit_wise_and(_pc.cast(b["turn_idx"], pa.int64()), 1), 1)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _int64_rollup(merge_tiers(rollup_1m(even), rollup_1m(odd)))


def q_orphan_lineitems(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import referential_orphans

    child = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    )
    parent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    )
    return referential_orphans(child, parent, on="l_orderkey", right_on="o_orderkey")


def q_dewma_chars(sf_dir: str):
    from pyreshaper_ray.stages.windows import dewma_chars

    return dewma_chars(_norm_ds(sf_dir))


def q_posting_stats(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import posting_stats

    return posting_stats(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    )


def q_skew_census(sf_dir: str):
    from pyreshaper_ray.stages.analytics import skew_census

    return skew_census(_events_value_ds(sf_dir, ["user_id"]))


def q_q5_local_supplier(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q5_local_supplier_volume

    return q5_local_supplier_volume(sf_dir)


def q_q18_large_volume(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q18_large_volume_customers

    return q18_large_volume_customers(sf_dir)


def q_vocab_size(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import vocab_size

    return vocab_size(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    )


def q_length_percentile(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import length_percentile_docs

    return length_percentile_docs(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    )


def q_term_pairs(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import term_pair_cooccurrence

    return term_pair_cooccurrence(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    )


def q_ddsketch_p95_daily(sf_dir: str):
    from pyreshaper_ray.stages.sketches import ddsketch_p95_daily

    return ddsketch_p95_daily(_events_value_ds(sf_dir, ["ts", "value"]))


def q_daily_dashboard(sf_dir: str):
    from pyreshaper_ray.stages.analytics import daily_dashboard

    return daily_dashboard(
        _events_value_ds(sf_dir, ["ts", "event_type", "user_id", "value"])
    )


def q_wau_retention(sf_dir: str):
    from pyreshaper_ray.stages.analytics import wau_retention

    return wau_retention(_events_value_ds(sf_dir, ["user_id", "ts"]))


def q_ship_latency(sf_dir: str):
    from pyreshaper_ray.stages.analytics import ship_latency_by_priority

    return ship_latency_by_priority(sf_dir)


def q_benford(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import benford_first_digit

    return benford_first_digit(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    )


def q_calendarize_spans(sf_dir: str):
    from pyreshaper_ray.stages.analytics import calendarize_spans

    return calendarize_spans(read_events_as_transcripts(sf_dir))


def q_cusum_shift(sf_dir: str):
    from pyreshaper_ray.stages.analytics import cusum_shift_users

    return cusum_shift_users(
        _events_value_ds(sf_dir, ["user_id", "event_id", "ts", "value"])
    )


def q_pivot_turns_ipc(sf_dir: str):
    """Backend-selector parity: the events stream exported once to Arrow
    IPC, read back through format='ipc', pivoted — must equal the parquet
    pivot (oracle: the same _T adapter SQL)."""
    import tempfile

    import pyarrow.ipc

    from pyreshaper_ray.sources.transcripts import read_transcripts
    from pyreshaper_ray.stages.pivot import pivot_turns
    from pyreshaper_ray.util import collect_table

    ds = read_events_as_transcripts(sf_dir)
    src = collect_table(ds)  # fixture-export step, not the operator
    d = tempfile.mkdtemp(prefix="pyreshaper_ipc_")
    path = f"{d}/transcripts.arrow"
    with pa.ipc.new_file(path, src.schema) as w:
        w.write_table(src)
    from pyreshaper_ray.stages.normalize import normalize_dataset

    return pivot_turns(
        normalize_dataset(read_transcripts(path, format="ipc"))
    ).select_columns(["conv_id", "turn_idx", "role", "text", "tool", "ts"])


def q_corpus_intake(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import corpus_intake_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    return corpus_intake_counts(ds)


def q_curation_funnel(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import curation_funnel

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    return curation_funnel(ds)


def q_percent_rank_convs(sf_dir: str):
    from pyreshaper_ray.stages.windows import percent_rank_convs

    return percent_rank_convs(_norm_ds(sf_dir))


def q_tier_consistency(sf_dir: str):
    from pyreshaper_ray.stages.analytics import tier_consistency_check
    from pyreshaper_ray.util import collect_table

    # the healthy result is EMPTY — collect with an explicit schema so the
    # zero-row frame still carries (conv_id, window_start) columns
    return collect_table(
        tier_consistency_check(_norm_ds(sf_dir)),
        fallback_schema=pa.schema(
            [("conv_id", pa.string()), ("window_start", pa.timestamp("us"))]
        ),
    )


def q_acf_minute_counts(sf_dir: str):
    from pyreshaper_ray.stages.timeseries import acf_minute_counts

    return acf_minute_counts(read_events_as_transcripts(sf_dir), lags=(1, 2, 3))


def q_hour_dod_delta(sf_dir: str):
    from pyreshaper_ray.stages.timeseries import hour_dod_delta

    return hour_dod_delta(read_events_as_transcripts(sf_dir))


def q_role_simpson(sf_dir: str):
    from pyreshaper_ray.stages.analytics import role_simpson_per_conv

    return role_simpson_per_conv(read_events_as_transcripts(sf_dir))


def q_typo_term_pairs(sf_dir: str):
    """Typo-pair mining over the combined token stream: documents.text plus
    the transcript payloads (events.props). The documents vocabulary alone
    is a fixed 31-word set with no distance-1 neighbors, so the union keeps
    the driver check non-trivial (numeric payload tokens have real
    edit-distance-1 pairs)."""
    import ray.data

    from pyreshaper_ray.stages.text import typo_term_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    props = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["props"]
    ).rename_columns({"props": "text"})
    return typo_term_pairs(docs.union(props), top_n=200)


def q_dtw_event_types(sf_dir: str):
    """Banded (w=1) DTW distance between every pair of event types' daily
    count series, exact integer costs; recursive-CTE oracle with the
    intra-row dl→dm→dr chain unrolled through nested subqueries."""
    from pyreshaper_ray.stages.timeseries import dtw_event_type_pairs

    return dtw_event_type_pairs(_events_value_ds(sf_dir, ["event_type", "ts"]))


def q_kaplan_meier_sessions(sf_dir: str):
    """Kaplan-Meier survival curve of 30m-gap session durations with
    right censoring at the corpus edge; recursive-CTE oracle mirrors the
    truncating-division product chain."""
    from pyreshaper_ray.stages.timeseries import kaplan_meier_sessions

    return kaplan_meier_sessions(_events_value_ds(sf_dir, ["user_id", "ts"]))


def q_bollinger_daily_counts(sf_dir: str):
    """Bollinger-band anomaly flags on the daily event-count series via the
    exact cross-multiplied integer variance test (w=7, k=2); SQL window
    restatement with ROWS BETWEEN 6 PRECEDING."""
    from pyreshaper_ray.stages.timeseries import bollinger_daily_counts

    return bollinger_daily_counts(_events_value_ds(sf_dir, ["ts"]))


def q_matrix_profile_hourly(sf_dir: str):
    """Matrix profile (w=24) of the hourly event-count series — exact
    integer squared-distance nearest non-trivial neighbor per window;
    SQL self-join restatement with the |i−j|≥w exclusion zone."""
    from pyreshaper_ray.stages.timeseries import matrix_profile_hourly

    return matrix_profile_hourly(_events_value_ds(sf_dir, ["ts"]))


def q_rs_range_hourly(sf_dir: str):
    """Rescaled-range (Hurst R/S) census over tumbling 24h/48h windows of
    the hourly series — n-scaled cumulative-deviation range and variance
    numerator as exact BIGINTs; SQL window-function restatement."""
    from pyreshaper_ray.stages.timeseries import rs_range_hourly

    return rs_range_hourly(_events_value_ds(sf_dir, ["ts"]))


def q_pettitt_change_hourly(sf_dir: str):
    """Pettitt rank-based change-point on the hourly series via the
    U_k = U_{k-1} + V_k recurrence (searchsorted sign census); SQL
    restatement with a pairwise sign join + running sum."""
    from pyreshaper_ray.stages.timeseries import pettitt_change_hourly

    return pettitt_change_hourly(_events_value_ds(sf_dir, ["ts"]))


def q_sax_hourly_symbols(sf_dir: str):
    """SAX symbolization of the hourly series: integer-split PAA segments
    symbolized against exact equi-depth order-statistic breakpoints,
    cross-multiplied comparisons end to end."""
    from pyreshaper_ray.stages.timeseries import sax_hourly_symbols

    return sax_hourly_symbols(_events_value_ds(sf_dir, ["ts"]))


def q_runs_test_hourly(sf_dir: str):
    """Wald–Wolfowitz runs test on the hourly series: order-statistic
    median dichotomy, equal values discarded, exact run count; SQL
    restatement with LAG over the kept rows."""
    from pyreshaper_ray.stages.timeseries import runs_test_hourly

    return runs_test_hourly(_events_value_ds(sf_dir, ["ts"]))


def q_mi_type_hod(sf_dir: str):
    """Mutual information between event type and hour-of-day in exact
    micro-nats (per-count ln quantized once, truncating final division);
    SQL restatement with the same quantization."""
    from pyreshaper_ray.stages.timeseries import mi_type_hod

    return mi_type_hod(_events_value_ds(sf_dir, ["event_type", "ts"]))


def q_croston_daily(sf_dir: str):
    """Croston intermittent-demand smoothing of daily purchase counts —
    milli-unit integer EWMA of demand size and inter-demand interval;
    recursive-CTE oracle shares the trunc-division recurrence."""
    from pyreshaper_ray.stages.timeseries import croston_daily

    return croston_daily(_events_value_ds(sf_dir, ["event_type", "ts"]))


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining: per query vector (vec_id < 10), top-3 most
    cosine-similar OTHER-label vectors — broadcast query matrix, per-block
    partial top-k, IDs-only compare like knn_cosine_top5."""
    from pyreshaper_ray.stages.similarity import hard_negatives

    return hard_negatives(sf_dir, n_queries=10, k=3)


def q_skipgram_transitions(sf_dir: str):
    """Skip-gram event transitions (forward distance 1..3 per user,
    (ts, event_id) order): counts per (from_type, to_type, gap); SQL
    restatement with three LEAD offsets."""
    from pyreshaper_ray.stages.windows import skipgram_transitions

    return skipgram_transitions(
        _events_value_ds(sf_dir, ["user_id", "event_type", "ts", "event_id"])
    )


def q_rfm_scores(sf_dir: str):
    """RFM segmentation of purchasing users: exact recency/frequency/
    monetary metrics plus 1-4 quartile codes from order-statistic bounds
    (spend_decile bucket contract)."""
    from pyreshaper_ray.stages.analytics import rfm_scores

    return rfm_scores(
        _events_value_ds(sf_dir, ["user_id", "event_type", "ts", "value"])
    )


def q_heaps_law(sf_dir: str):
    """Heaps-law vocabulary growth at power-of-two doc-id thresholds —
    per-term MIN(doc_id) hash-partitioned agg + broadcast-threshold
    bincount; SQL restatement with the shared tokenizer."""
    import ray.data

    from pyreshaper_ray.stages.text import heaps_law_documents

    return heaps_law_documents(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    )


def q_dow_adjusted_anomalies(sf_dir: str):
    """Day-of-week-adjusted anomaly flags: exact cross-multiplied k-sigma
    test against each weekday's own mean (k=1 — see the stage docstring's
    m-1 bound); SQL window restatement partitioned by dayofweek."""
    from pyreshaper_ray.stages.timeseries import dow_adjusted_anomalies

    return dow_adjusted_anomalies(_events_value_ds(sf_dir, ["ts"]))


def q_systematic_sample(sf_dir: str):
    """Every-97th event under exact global (ts, event_id) ROW_NUMBER
    (block-offset rank primitive); SQL restatement with the same order
    and modulus."""
    from pyreshaper_ray.stages.analytics import systematic_sample_events

    return systematic_sample_events(
        _events_value_ds(sf_dir, ["event_id", "ts"])
    )


def q_asof_next_order(sf_dir: str):
    """Forward as-of join (earliest order with o_orderdate >= event ts per
    customer) — the distributed co-partitioned kernel with the
    searchsorted side flipped; SQL restatement with MIN + FILTER."""
    from pyreshaper_ray.stages.analytics import asof_next_order

    return asof_next_order(sf_dir)


def q_fanout_histogram(sf_dir: str):
    """Orders-per-lineitem-count fan-out histogram (1:N cardinality
    profile): orderkey-partitioned count + tiny bincount census."""
    import ray.data

    from pyreshaper_ray.stages.analytics import fanout_histogram_lineitems

    return fanout_histogram_lineitems(
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    )


def q_neardup_cluster_sizes(sf_dir: str):
    """Near-dup cluster-size census over the exact cosine pair graph —
    two-level bincount over the neardup_groups closure; recursive-CTE
    oracle wrapped with the same census."""
    from pyreshaper_ray.stages.similarity import neardup_cluster_sizes

    return neardup_cluster_sizes(sf_dir, threshold=0.4)


def q_error_budget_burn(sf_dir: str):
    """SLO error-budget burn: exact daily error ppm vs a 1% budget with a
    running overage; SQL window restatement with the same floor/clamp."""
    from pyreshaper_ray.stages.timeseries import error_budget_burn

    return error_budget_burn(_events_value_ds(sf_dir, ["event_type", "ts"]))


def q_session_overlap_pairs(sf_dir: str):
    """Interval-overlap census: per start-day, pairs of 30m-gap user
    sessions that overlap in time — searchsorted sweep per day; SQL
    restatement via islands + ROW_NUMBER self-join."""
    from pyreshaper_ray.stages.windows import session_overlap_pairs

    return session_overlap_pairs(
        _events_value_ds(sf_dir, ["user_id", "ts", "event_id"])
    )


def q_user_burstiness(sf_dir: str):
    """Per-user hourly-count dispersion: exact sufficient stats + the
    cross-multiplied var/mean>1 flag; SQL two-level census restatement."""
    from pyreshaper_ray.stages.analytics import user_burstiness

    return user_burstiness(_events_value_ds(sf_dir, ["user_id", "ts"]))


def q_funnel3_ordered(sf_dir: str):
    """Three-step ORDERED funnel view→click→purchase (strictly-after
    chaining); SQL restatement with chained MIN-after joins."""
    from pyreshaper_ray.stages.analytics import funnel3_ordered

    return funnel3_ordered(
        _events_value_ds(sf_dir, ["user_id", "event_type", "ts", "event_id"])
    )


def q_markov_entropy_rate(sf_dir: str):
    """Conditional entropy rate H(next|current) of the event stream in
    exact micro-nats over the global transition census; SQL restatement
    with the shared ln quantization."""
    from pyreshaper_ray.stages.analytics import markov_entropy_rate

    return markov_entropy_rate(
        _events_value_ds(sf_dir, ["user_id", "event_type", "ts", "event_id"])
    )


def q_loo_source_deltas(sf_dir: str):
    """Leave-one-source-out mean words-per-doc deltas in exact
    micro-words (data-valuation probe); SQL restatement with the same
    token regex and floor division."""
    import ray.data

    from pyreshaper_ray.stages.analytics import loo_source_word_deltas

    return loo_source_word_deltas(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
    )


_ROUTE_RUN_MEMO: dict = {}


def q_tier_routed_daily(sf_dir: str):
    """Tier routing EXECUTED (VERDICT r3 #9): the daily dashboard window
    [2024-01-05, 2024-01-12) at 1-day resolution is served from the
    coarsest retained fine-enough rollup tier (default retention: the 1m
    tier is already pruned at now=2024-02-15, so the router picks 1d) —
    the answer is bit-identical to aggregating raw turns because the tier
    measures are additive, which is exactly what the SQL oracle restates.
    TTL fall-through (no tier retained → raw serve) is pytest-gated."""
    import numpy as np

    from pyreshaper_ray.pipelines.flagship import (
        read_tier,
        run_flagship,
        tier_routed_rollup,
    )
    from pyreshaper_ray.pipelines.spec import create_spec

    # memoized per sf_dir (ADVICE r4: bench.py re-runs this query; a fresh
    # mkdtemp per call leaked full flagship output trees in TMPDIR) — the
    # returned Dataset reads lazily from the run dir, so the dir must
    # outlive the call; reusing one build per sf_dir both fixes the leak
    # and skips redundant rebuilds
    out = _ROUTE_RUN_MEMO.get(sf_dir)
    if out is None or not os.path.isdir(out):
        out = tempfile.mkdtemp(prefix="pyreshaper_ray_q_route_")
        spec = create_spec(
            input=f"{sf_dir}/events.parquet",
            out_dir=out,
            n_buckets=16,
            wmode="o",
            gapfill=False,
            encode=False,
            tiers=("1m", "1h", "1d"),
            include_turns=False,
        )
        run_flagship(spec, ds=read_events_as_transcripts(sf_dir))
        _ROUTE_RUN_MEMO[sf_dir] = out
    t0 = int(np.datetime64("2024-01-05", "us").astype(np.int64))
    t1 = int(np.datetime64("2024-01-12", "us").astype(np.int64))
    now = int(np.datetime64("2024-02-15", "us").astype(np.int64))
    return tier_routed_rollup(
        out,
        t0,
        t1,
        86_400_000_000,
        now,
        raw_ds_factory=lambda: read_events_as_transcripts(sf_dir),
    )


def q_first_touch_attribution(sf_dir: str):
    """First-touch attribution: each purchase credited to the user's
    EARLIEST click within the 7-day horizon (ties -> lowest event_id)."""
    import ray.data

    from pyreshaper_ray.stages.windows import first_touch_attribution

    return first_touch_attribution(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "event_type", "ts"],
        )
    )


def q_session_count_histogram(sf_dir: str):
    """Users-per-session-count histogram (30m gap sessions)."""
    import ray.data

    from pyreshaper_ray.stages.windows import session_count_histogram

    return session_count_histogram(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
        )
    )


def q_daily_uniques_ratio(sf_dir: str):
    """Per day: events, distinct users, exact events-per-user ppm."""
    import ray.data

    from pyreshaper_ray.stages.windows import daily_uniques_ratio

    return daily_uniques_ratio(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
    )


def q_rolling_zscore_days(sf_dir: str):
    """Integer-exact 3σ rolling z-score flags on the daily count series
    (trailing 7-row window, cross-multiplied decision — no floats)."""
    import ray.data

    from pyreshaper_ray.stages.timeseries import rolling_zscore_days

    return rolling_zscore_days(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    )


def q_vwap_ship_daily(sf_dir: str):
    """Volume-weighted average price per ship day (exact integer
    numerator/denominator components + floored vwap_cents)."""
    from pyreshaper_ray.stages.timeseries import vwap_ship_daily

    return vwap_ship_daily(sf_dir)


def q_nearest_click_per_purchase(sf_dir: str):
    """Both-ways nearest temporal join within user: closest click to each
    purchase by |Δts| (tie → earlier click ts, then lower event_id)."""
    import ray.data

    from pyreshaper_ray.stages.windows import nearest_event_join

    return nearest_event_join(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "event_type", "ts"],
        )
    )


def q_click_purchase_pairs(sf_dir: str):
    """Adjacent-turn role-pair miner (the SFT prompt→response cutter):
    click turns whose immediate successor is a purchase."""
    from pyreshaper_ray.stages.windows import adjacent_role_pairs

    return adjacent_role_pairs(read_events_as_transcripts(sf_dir))


def q_tool_chain_census(sf_dir: str):
    """Per-conversation ordered tool-call chain census, top-50 by
    (count desc, chain asc)."""
    from pyreshaper_ray.stages.windows import tool_chain_census

    return tool_chain_census(read_events_as_transcripts(sf_dir))


def q_conv_tool_char_balance(sf_dir: str):
    """Per-conversation tooled-vs-plain character balance with exact ppm
    share (combiner-first conv census)."""
    from pyreshaper_ray.stages.windows import conv_role_char_balance

    return conv_role_char_balance(read_events_as_transcripts(sf_dir))


def q_tier_route_plan(sf_dir: str):
    """Continuous-aggregate read router: coarsest tier that is fine
    enough AND still retained serves the window — pure-plan operator
    (rows-only; decision table pytest-gated like scan/zone plans)."""
    import numpy as np

    from pyreshaper_ray.sources.planner import tier_route_plan

    t0 = int(np.datetime64("2024-01-05", "us").astype(np.int64))
    t1 = int(np.datetime64("2024-01-12", "us").astype(np.int64))
    now = int(np.datetime64("2024-02-15", "us").astype(np.int64))
    return tier_route_plan(t0, t1, 3_600_000_000, now)


def q_hist2d_len_words(sf_dir: str):
    """Joint (byte-length, word-count) 2-D histogram of documents —
    combiner-first cell census; SQL restatement with the same floor
    bucketing."""
    import ray.data

    from pyreshaper_ray.stages.text import hist2d_len_words

    return hist2d_len_words(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    )


def q_frequent_triples(sf_dir: str):
    """Top-20 co-purchased part triples — two-level vectorized repeat over
    orderkey-partitioned capped itemsets; SQL 3-way QUALIFY-capped join."""
    import ray.data

    from pyreshaper_ray.stages.analytics import frequent_triples_parts

    return frequent_triples_parts(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        )
    )


def q_session_entry_conversion(sf_dir: str):
    """Session conversion by entry event type (30m islands, reduceat
    any-purchase); SQL islands + FIRST_VALUE restatement."""
    from pyreshaper_ray.stages.analytics import session_entry_conversion

    return session_entry_conversion(
        _events_value_ds(sf_dir, ["user_id", "event_type", "ts", "event_id"])
    )


def q_corr_by_brand(sf_dir: str):
    """Per-brand exact discount-quantity correlation components (broadcast
    part dim, integer cents); SQL grouped sums."""
    from pyreshaper_ray.stages.analytics import corr_disc_qty_by_brand

    return corr_disc_qty_by_brand(sf_dir)


def q_transition_drift(sf_dir: str):
    """TV distance between the two fortnights' transition distributions,
    cross-multiplied exact (tv_num, t1, t2); SQL restatement with
    per-half LEAD censuses and a FULL OUTER cell join."""
    from pyreshaper_ray.stages.analytics import transition_drift_fortnights

    return transition_drift_fortnights(
        _events_value_ds(sf_dir, ["user_id", "event_type", "ts", "event_id"])
    )


def q_daily_median_value(sf_dir: str):
    """Exact per-day lower median of value cents (grouped order-statistic
    kernel); SQL explicit-selection restatement."""
    from pyreshaper_ray.stages.analytics import daily_median_value

    return daily_median_value(_events_value_ds(sf_dir, ["ts", "value"]))


def q_casing_census(sf_dir: str):
    """Per-document upper/lower/Title-Case counts — RE2 counts shared
    verbatim with the SQL oracle."""
    import ray.data

    from pyreshaper_ray.stages.text import casing_census

    return casing_census(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    )


def q_exact_dup_cluster_sizes(sf_dir: str):
    """Exact-duplicate cluster-size census (content-hash exchange, text
    never moves); runs over documents.text UNION events.props so the
    census is non-trivial (documents are all distinct in the fixture;
    props repeat heavily). SQL groups by the text itself."""
    import ray.data

    from pyreshaper_ray.stages.dedup import exact_dup_cluster_sizes

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    props = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["props"]
    ).rename_columns({"props": "text"})
    return exact_dup_cluster_sizes(docs.union(props))


def q_weekday_weekend_lift(sf_dir: str):
    """Weekend-vs-weekday purchase lift in exact ppm (cross-multiplied,
    present-day denominators); SQL restatement with dayofweek."""
    from pyreshaper_ray.stages.analytics import weekday_weekend_lift

    return weekday_weekend_lift(_events_value_ds(sf_dir, ["event_type", "ts"]))


def q_conversion_latency_pcts(sf_dir: str):
    """Exact p50/p90 of first-view to first-after purchase latency in
    whole seconds (no float interpolation); SQL explicit rank selection."""
    from pyreshaper_ray.stages.analytics import conversion_latency_percentiles

    return conversion_latency_percentiles(
        _events_value_ds(sf_dir, ["user_id", "event_type", "ts", "event_id"])
    )


def q_part_price_size_census(sf_dir: str):
    """Per-size catalog price census (exact cents sum/min/max); SQL
    grouped aggregates."""
    import ray.data

    from pyreshaper_ray.stages.analytics import part_price_size_census

    return part_price_size_census(
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_size", "p_retailprice"]
        )
    )


def q_langid_confusion(sf_dir: str):
    """Language-ID confusion census vs the ground-truth lang column —
    the classifier evaluation gate (rows-only: the classifier is not
    SQL-expressible; pytest gates planted-language accuracy)."""
    from pyreshaper_ray.stages.text import langid_confusion

    return langid_confusion(sf_dir)


def q_supplier_nation_balance(sf_dir: str):
    """Supplier balance census per nation name (broadcast 25-row dim,
    exact cents); SQL grouped aggregates over the join."""
    from pyreshaper_ray.stages.analytics import supplier_nation_balance_census

    return supplier_nation_balance_census(sf_dir)


def q_top_terms_by_lang(sf_dir: str):
    """Top-5 terms per language (grouped word count, deterministic
    ties); SQL QUALIFY restatement with the shared tokenizer."""
    import ray.data

    from pyreshaper_ray.stages.text import top_terms_by_lang

    return top_terms_by_lang(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "text"]
        )
    )


def q_degree_assortativity(sf_dir: str):
    """Newman degree-assortativity sufficient statistics of the trade
    graph (exact BIGINT correlation components over endpoint degrees;
    reuses the memoized edge list); SQL two-join restatement."""
    from pyreshaper_ray.stages.graph import degree_assortativity_components

    return degree_assortativity_components(_trade_graph_edges(sf_dir))


def q_value_acf_daily(sf_dir: str):
    """Daily-revenue autocovariance components at lags 0..7 (exact
    BIGINTs); SQL self-join-at-offset restatement."""
    from pyreshaper_ray.stages.timeseries import value_acf_daily

    return value_acf_daily(_events_value_ds(sf_dir, ["ts", "value"]))


def q_daily_new_terms(sf_dir: str):
    """Per-day first-arrival term counts over events.props (vocabulary
    novelty curve); SQL per-term MIN(day) + day census."""
    from pyreshaper_ray.stages.text import daily_new_terms

    return daily_new_terms(_events_value_ds(sf_dir, ["props", "ts"]))


def q_max_quiet_gap(sf_dir: str):
    """Longest gap between consecutive present hours (ingestion-stall
    alarm, earliest tie wins); SQL LAG restatement."""
    from pyreshaper_ray.stages.timeseries import max_quiet_gap_hourly

    return max_quiet_gap_hourly(_events_value_ds(sf_dir, ["ts"]))


def q_revenue_pareto_share(sf_dir: str):
    """80/20 audit: exact revenue share of the top-20% purchasing users
    (block-offset ranking over the user-domain spend census); SQL
    ROW_NUMBER restatement."""
    from pyreshaper_ray.stages.analytics import revenue_pareto_share

    return revenue_pareto_share(
        _events_value_ds(sf_dir, ["user_id", "event_type", "value"])
    )


def q_session_duration_median(sf_dir: str):
    """Exact lower-median 30m-gap session duration via the shared
    histogram-refinement selector (no sort); SQL islands + rank
    selection."""
    from pyreshaper_ray.stages.windows import session_duration_median

    return session_duration_median(
        _events_value_ds(sf_dir, ["user_id", "ts", "event_id"])
    )


def q_daily_peak_trough(sf_dir: str):
    """Per-day hourly peak/trough with cross-multiplied ratio ppm; SQL
    two-level census restatement."""
    from pyreshaper_ray.stages.timeseries import daily_peak_trough

    return daily_peak_trough(_events_value_ds(sf_dir, ["ts"]))


def q_reply_latency_census(sf_dir: str):
    """Reply-latency components per role transition over the transcripts
    adapter ((ts, turn_idx) order, exact µs gaps); SQL LEAD restatement
    over the shared adapter CTE."""
    from pyreshaper_ray.sources.adapters import read_events_as_transcripts
    from pyreshaper_ray.stages.windows import reply_latency_census

    return reply_latency_census(read_events_as_transcripts(sf_dir))


def q_repeat_purchase_rate(sf_dir: str):
    """Share of purchasers with >= 2 purchases in exact ppm; SQL grouped
    census restatement."""
    from pyreshaper_ray.stages.analytics import repeat_purchase_rate

    return repeat_purchase_rate(
        _events_value_ds(sf_dir, ["user_id", "event_type"])
    )


def q_copurchase_part_pairs(sf_dir: str):
    """Top-20 co-purchased part pairs (market-basket size 2 over orders):
    orderkey-partitioned vectorized pair expansion, pair-keyed
    hash-partitioned sum, result-sized top-k."""
    import ray.data

    from pyreshaper_ray.stages.analytics import copurchase_part_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return copurchase_part_pairs(ds)


def q_charclass_census(sf_dir: str):
    """Per-document ASCII letter/digit/whitespace/other byte census —
    numpy LUT over raw Arrow buffers, prefix-sum differences at value
    offsets; no exchange."""
    import ray.data

    from pyreshaper_ray.stages.text import charclass_census

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return charclass_census(ds)


def q_spend_decile_census(sf_dir: str):
    """Customer spend-decile census: per-customer exact cents sum, shared-
    pass exact decile bounds (no sort), broadcast-bounds bucketing to a
    10-row census."""
    import ray.data

    from pyreshaper_ray.stages.analytics import spend_decile_census

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    return spend_decile_census(ds)


def q_holt_winters_daily(sf_dir: str):
    """Holt-Winters additive smoothing of each event type's daily counts,
    exact integer micro-units, recursive-CTE oracle."""
    from pyreshaper_ray.stages.timeseries import holt_winters_daily

    return holt_winters_daily(_events_value_ds(sf_dir, ["event_type", "ts"]))


def q_fastss_edit1_pairs(sf_dir: str):
    """Vocabulary-wide Levenshtein-1 self-join via FastSS deletion-
    neighborhood blocking. The corpus unions four text sources so the
    vocabulary carries both word typo structure and zero-padded numeric ID
    tokens (customer names) — sequential IDs are dense in distance-1
    substitution pairs, exercising the bucket verify step for real."""
    import ray.data

    from pyreshaper_ray.stages.text import fastss_edit1_join

    # these are dimension-sized single-column reads: without
    # override_num_blocks each fans out to 64 blocks and the 256-block
    # union pays ~8 s of pure scheduling at sf0.1 (measured)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"], override_num_blocks=4
    )
    props = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["props"], override_num_blocks=8
    ).rename_columns({"props": "text"})
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_name"], override_num_blocks=2
    ).rename_columns({"c_name": "text"})
    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"], override_num_blocks=2
    ).rename_columns({"p_name": "text"})
    return fastss_edit1_join(docs.union(props).union(cust).union(parts))


def q_theil_sen_trend(sf_dir: str):
    from pyreshaper_ray.stages.analytics import theil_sen_daily_trend

    return theil_sen_daily_trend(_events_value_ds(sf_dir, ["user_id", "ts"]))


def q_bounce_rate_daily(sf_dir: str):
    from pyreshaper_ray.stages.analytics import bounce_rate_daily

    return bounce_rate_daily(_events_value_ds(sf_dir, ["user_id", "ts"]))


def q_sentence_stats(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import sentence_stats_batch

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(sentence_stats_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_k_anonymity(sf_dir: str):
    from pyreshaper_ray.stages.analytics import k_anonymity_audit

    return k_anonymity_audit(_events_value_ds(sf_dir, ["event_type", "ts"]), k=5)


def q_quota_sample(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import quota_sample

    return quota_sample(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        ),
        total_k=100,
    )


def q_counter_increase(sf_dir: str):
    from pyreshaper_ray.stages.timeseries import counter_increase_per_user

    return counter_increase_per_user(
        _events_value_ds(sf_dir, ["event_id", "user_id", "value", "ts"])
    )


def q_gap_survival(sf_dir: str):
    from pyreshaper_ray.stages.timeseries import gap_survival_census

    return gap_survival_census(
        _events_value_ds(sf_dir, ["event_id", "user_id", "ts"])
    )


def q_event_features(sf_dir: str):
    from pyreshaper_ray.stages.analytics import event_features

    return event_features(
        _events_value_ds(sf_dir, ["event_id", "event_type", "value", "ts"])
    )


def q_growth_accounting(sf_dir: str):
    from pyreshaper_ray.stages.analytics import growth_accounting

    return growth_accounting(_events_value_ds(sf_dir, ["user_id", "ts"]))


def q_contingency_margins(sf_dir: str):
    from pyreshaper_ray.stages.analytics import contingency_margins

    return contingency_margins(_events_value_ds(sf_dir, ["event_type", "ts"]))


def q_transition_latency(sf_dir: str):
    from pyreshaper_ray.stages.windows import transition_latency_census

    return transition_latency_census(
        _events_value_ds(sf_dir, ["user_id", "event_id", "event_type", "ts"])
    )


def q_paa_segments(sf_dir: str):
    from pyreshaper_ray.stages.timeseries import paa_segments

    return paa_segments(
        _events_value_ds(sf_dir, ["user_id", "event_id", "ts", "value"]), n_segments=4
    )


def q_hourly_seasonality(sf_dir: str):
    from pyreshaper_ray.stages.timeseries import hourly_seasonality

    return hourly_seasonality(_events_value_ds(sf_dir, ["event_type", "ts"]))


def q_cross_source_contamination(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.dedup import cross_source_contamination

    return cross_source_contamination(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text", "source"]
        ),
        prefix_len=32,
    )


def q_context_assembly(sf_dir: str):
    from pyreshaper_ray.stages.text import context_assembly

    return context_assembly(read_events_as_transcripts(sf_dir))


def q_pack_sequences(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import pack_sequences

    return pack_sequences(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        ),
        budget=512,
    )


def q_window_corrections(sf_dir: str):
    from pyreshaper_ray.stages.windows import window_corrections

    return window_corrections(
        _events_value_ds(sf_dir, ["user_id", "event_id", "ts"]), lateness_s=1800
    )


def q_rag_chunks(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import rag_chunks

    return rag_chunks(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        chunk_chars=512,
        stride=448,
    )


def q_gopher_repetition(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import gopher_repetition

    return gopher_repetition(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )


def q_q7_bination_volume(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q7_bination_volume

    return q7_bination_volume(sf_dir)


def q_retention_policy(sf_dir: str):
    import pyarrow as _pa
    import pyarrow.compute as _pc

    import ray.data

    from pyreshaper_ray.stages.timeseries import retention_policy_census

    def to_conv(b):
        return _pa.table(
            {
                "conv_id": _pc.binary_join_element_wise(
                    "u", _pc.cast(b["user_id"], _pa.string()), ""
                ),
                "ts": b["ts"],
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(to_conv, batch_format="pyarrow", zero_copy_batch=True)
    return retention_policy_census(ds)


def q_arrival_disorder(sf_dir: str):
    from pyreshaper_ray.stages.windows import arrival_disorder_census

    return arrival_disorder_census(
        _events_value_ds(sf_dir, ["user_id", "event_id", "ts"])
    )


def q_chunk_dedup(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.dedup import chunk_dedup_exact

    return chunk_dedup_exact(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )


def q_dedup_normalized(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.dedup import dedup_normalized

    return dedup_normalized(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )


def q_pack_sequences_ffd(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import pack_sequences_ffd

    return pack_sequences_ffd(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        ),
        budget=512,
    )


def q_lead_lag_xcorr(sf_dir: str):
    from pyreshaper_ray.stages.timeseries import lead_lag_daily_xcorr

    return lead_lag_daily_xcorr(_events_value_ds(sf_dir, ["event_type", "ts"]))


def q_cum_distinct_tools(sf_dir: str):
    from pyreshaper_ray.stages.windows import cum_distinct_tools

    return cum_distinct_tools(read_events_as_transcripts(sf_dir))


def q_scale_value_by_type(sf_dir: str):
    from pyreshaper_ray.stages.analytics import scale_value_by_type

    return scale_value_by_type(
        _events_value_ds(sf_dir, ["event_id", "event_type", "value"])
    )


def q_assign_folds(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.analytics import assign_folds

    return assign_folds(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        ),
        k=5,
    )


def q_peak_rate_5m(sf_dir: str):
    from pyreshaper_ray.stages.windows import peak_rate_5m

    return peak_rate_5m(_events_value_ds(sf_dir, ["user_id", "ts"]))


def q_last_touch(sf_dir: str):
    from pyreshaper_ray.stages.windows import last_touch_attribution

    return last_touch_attribution(
        _events_value_ds(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    )


def q_snm_multipass(sf_dir: str):
    """Two-key SNM (prefix + reversed-suffix blocking) — rows-only like the
    single-pass variant; the pass-2 recall gate is in tests/test_dedup.py."""
    import ray.data

    from pyreshaper_ray.stages.dedup import snm_neardup_multipass

    return snm_neardup_multipass(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    )


def q_q19_brand_revenue(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q19_brand_revenue

    return q19_brand_revenue(sf_dir)


def q_encode_roles(sf_dir: str):
    from pyreshaper_ray.stages.analytics import encode_categorical

    return encode_categorical(
        read_events_as_transcripts(sf_dir), col="role", keep=("conv_id", "turn_idx")
    )


def q_profile_events(sf_dir: str):
    from pyreshaper_ray.stages.analytics import profile_table

    return profile_table(
        sf_dir, "events", ["event_id", "user_id", "event_type", "value", "props"]
    )


def q_snm_neardup(sf_dir: str):
    """Sorted-neighborhood near-dup candidates — algorithmic pair choice
    (prefix blocking + window scan) → rows-only; planted-dup recall gates
    in tests/test_dedup.py."""
    import ray.data

    from pyreshaper_ray.stages.dedup import snm_neardup_pairs

    return snm_neardup_pairs(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    )


def q_hll_users_cascade(sf_dir: str):
    """Mergeable-sketch continuous aggregate (1m HLL → 1h merge) — sketch
    estimate, rows-only; register bit-exactness gate in test_sketches."""
    from pyreshaper_ray.stages.sketches import hll_users_window_cascade

    return hll_users_window_cascade(_events_value_ds(sf_dir, ["user_id", "ts"]))


def q_q4_late_ship(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q4_late_ship_priority

    return q4_late_ship_priority(sf_dir)


def q_chi2_cells(sf_dir: str):
    from pyreshaper_ray.stages.analytics import chi2_independence_cells

    return chi2_independence_cells(sf_dir)


def q_q8_market_share(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q8_market_share_ppm

    return q8_market_share_ppm(sf_dir)


def q_lexical_diversity(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import lexical_diversity_by_source

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    return lexical_diversity_by_source(ds)


def q_adaptive_join_container_revenue(sf_dir: str):
    """Cost-based adaptive join: the planner reads ONLY parquet footer
    metadata (rows + projected compressed bytes of the pruned column set)
    and picks broadcast vs hash-shuffle per join — at this sf the part side
    fits the broadcast threshold, so the lineitem fact scan crosses NO
    shuffle; at 100 TB the same call flips to the hash plan automatically.
    Result rows are plan-invariant (equality-gated in tests)."""
    from ray.data.aggregate import Sum

    from pyreshaper_ray.stages.analytics import to_cents
    from pyreshaper_ray.stages.joins import adaptive_join

    joined = adaptive_join(
        f"{sf_dir}/lineitem.parquet",
        f"{sf_dir}/part.parquet",
        on="l_partkey",
        right_on="p_partkey",
        left_columns=["l_partkey", "l_extendedprice"],
        right_columns=["p_partkey", "p_brand"],
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"p_brand": b["p_brand"], "c": to_cents(b["l_extendedprice"])}
        )
        g = t.group_by(["p_brand"]).aggregate([("c", "sum"), ("c", "count")])
        return pa.table(
            {
                "p_brand": g["p_brand"],
                "revenue_c": g["c_sum"],
                "n_items": pc.cast(g["c_count"], pa.int64()),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p_brand")
        .aggregate(
            Sum("revenue_c", alias_name="revenue_c"),
            Sum("n_items", alias_name="n_items"),
        )
    )


def q_dp_event_counts(sf_dir: str):
    """ε-DP noisy event-type histogram (seeded Laplace) — noise is not
    SQL-restatable, rows-only; reference-formula + determinism gates in
    tests/test_sketches.py."""
    from pyreshaper_ray.stages.sketches import dp_event_counts

    return dp_event_counts(_events_value_ds(sf_dir, ["event_type"]))


def q_q2_cheapest_supplier(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q2_cheapest_supplier

    return q2_cheapest_supplier(sf_dir)


def q_codeblock_census(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import codeblock_census

    return codeblock_census(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
    )


def q_response_latency(sf_dir: str):
    from pyreshaper_ray.stages.windows import response_latency

    return response_latency(
        read_events_as_transcripts(sf_dir), from_role="view", to_role="purchase"
    )


def q_knn_int8(sf_dir: str):
    """SQ8 quantized ANN (integer dot products over int8 vectors) —
    algorithmic quantized ranking, rows-only; recall-vs-float gate in
    tests/test_similarity.py."""
    from pyreshaper_ray.stages.similarity import knn_int8_top5

    return knn_int8_top5(sf_dir)


def q_q20_dominant_suppliers(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q20_dominant_suppliers

    return q20_dominant_suppliers(sf_dir)


def q_haar_minute_counts(sf_dir: str):
    """Haar wavelet energy profile of the minute-count series —
    numpy-reference-gated in tests/test_timeseries.py, rows-only (the
    transform is not practically SQL-restatable)."""
    from pyreshaper_ray.stages.timeseries import haar_minute_counts

    return haar_minute_counts(read_events_as_transcripts(sf_dir))


def q_q16_supplier_census(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q16_supplier_census

    return q16_supplier_census(sf_dir)


def q_q11_important_parts(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q11_important_parts

    return q11_important_parts(sf_dir)


def q_boilerplate_census(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import boilerplate_line_census

    return boilerplate_line_census(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        )
    )


def q_event_type_venn(sf_dir: str):
    from pyreshaper_ray.stages.analytics import event_type_venn

    return event_type_venn(
        _events_value_ds(sf_dir, ["user_id", "ts", "event_type"])
    )


def q_median2_value_per_type(sf_dir: str):
    from pyreshaper_ray.stages.analytics import median2_value_per_type

    return median2_value_per_type(
        _events_value_ds(sf_dir, ["event_type", "value"])
    )


def q_equidepth_bins(sf_dir: str):
    from pyreshaper_ray.stages.analytics import equidepth_bin_events

    return equidepth_bin_events(_events_value_ds(sf_dir, ["event_id", "value"]))


def q_weighted_sample_docs(sf_dir: str):
    """Efraimidis-Spirakis weighted sample (k=10, weight = char length) —
    algorithmic seeded draw, rows-only; reference-equality and determinism
    gates in tests/test_sketches.py."""
    import ray.data

    from pyreshaper_ray.stages.sketches import weighted_sample_docs

    return weighted_sample_docs(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    )


def q_cms_term_counts(sf_dir: str):
    """Count-min sketch point-frequency estimates for the exact top-10
    terms — sketch estimate, rows-only; one-sided-bound gates in
    tests/test_sketches.py."""
    import ray.data

    from pyreshaper_ray.stages.sketches import cms_term_counts

    return cms_term_counts(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    )


def q_label_centroid_distance(sf_dir: str):
    from pyreshaper_ray.stages.similarity import label_centroid_distance

    return label_centroid_distance(sf_dir)


def q_zorder_events(sf_dir: str):
    from pyreshaper_ray.stages.analytics import zorder_events

    return zorder_events(sf_dir)


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights vs the src0 target domain — hash-model
    scoring, rows-only; planted-domain + layout-invariance gates in
    tests/test_text.py."""
    import ray.data

    from pyreshaper_ray.stages.text import dsir_importance_weights

    return dsir_importance_weights(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        )
    )


def q_semdedup_embeddings(sf_dir: str):
    """SemDeDup semantic near-dup pruning (cluster → within-cell greedy
    cosine drop) — algorithmic keep choice, rows-only; planted-dup and
    determinism gates in tests/test_similarity.py."""
    from pyreshaper_ray.stages.similarity import semdedup_embeddings

    return semdedup_embeddings(sf_dir)


def q_semdedup_one_cell(sf_dir: str):
    """SemDeDup with ONE cell at θ=0.45 — the kept set no longer depends
    on centroid placement, only on the greedy ascending-vec_id rule
    ("drop when cosine to an already-kept member exceeds θ"), which a
    recursive CTE restates exactly — so the greedy kernel itself is
    VALUE-CHECKED (VERDICT r4 #5; θ=0.45 sits inside the corpus' cosine
    range, so real drops occur — 14 at sf0.01). ``semdedup_embeddings``
    keeps the honest multi-cell configuration alongside."""
    from pyreshaper_ray.stages.similarity import semdedup_embeddings

    return semdedup_embeddings(sf_dir, n_cells=1, threshold=0.45)


def q_q15_top_supplier(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q15_top_supplier

    return q15_top_supplier(sf_dir)


def q_q21_last_to_ship(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q21_last_to_ship

    return q21_last_to_ship(sf_dir)


def q_join_cardinality_estimate(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.sketches import join_cardinality_estimate

    left = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    )
    right = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    )
    return join_cardinality_estimate(left, right, "o_orderkey", "l_orderkey")


_TRADE_EDGE_MEMO: dict[str, Any] = {}


def _trade_graph_pairs(sf_dir: str):
    """Weighted pair census of the undirected customer↔supplier
    co-transaction graph: one row per distinct (custkey, suppkey) with
    ``w`` = the co-transaction multiplicity (join-row count). The ONE
    shared build behind every trade-graph query — the unweighted edge
    list is exactly these pairs with ``w`` dropped, the weighted one
    keeps it — memoized per sf_dir within a Ray session (pure cache of a
    deterministic intermediate). The orders⋈lineitem step goes through
    the cost-based adaptive join (footer stats pick the orders-side
    broadcast at these scales — the fact side never shuffles for the
    join; measured 15.4 s → ~2 s at sf0.1/32cpu)."""
    memo_key = ("pairs", sf_dir)
    if memo_key in _TRADE_EDGE_MEMO:
        return _TRADE_EDGE_MEMO[memo_key]
    from pyreshaper_ray.stages.joins import adaptive_join
    from pyreshaper_ray.util import hash_partitioned_agg

    j = adaptive_join(
        f"{sf_dir}/orders.parquet",
        f"{sf_dir}/lineitem.parquet",
        on="o_orderkey",
        right_on="l_orderkey",
        left_columns=["o_orderkey", "o_custkey"],
        right_columns=["l_orderkey", "l_suppkey"],
    )

    def pair_partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table({"c": b["o_custkey"], "s": b["l_suppkey"]})
            .group_by(["c", "s"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"c": g["c"], "s": g["s"], "w": pc.cast(g["count_all"], pa.int64())}
        )

    # many-group pair census → hash_partitioned_agg (the sort-based
    # groupby.Sum spent ~5 of the build's 6.7 s at sf0.1/32; the hash
    # exchange + per-partition Arrow group_by does it in ~0.7 s, exact)
    pairs = hash_partitioned_agg(
        j.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["c", "s"],
        aggs=[("w", "sum", "w")],
        n_parts=16,
    ).materialize()
    _TRADE_EDGE_MEMO[memo_key] = pairs
    return pairs


def _trade_graph_edges(sf_dir: str):
    """Directed-both-ways UNWEIGHTED edge list (distinct pairs, supplier
    ids offset by 10^9 into a shared id space) — derived from the shared
    :func:`_trade_graph_pairs` census; identical edge SET to the historic
    private build, so PageRank/k-core/assortativity results are
    bit-unchanged."""
    if sf_dir in _TRADE_EDGE_MEMO:
        return _TRADE_EDGE_MEMO[sf_dir]
    pairs = _trade_graph_pairs(sf_dir)

    def both_dirs(b: pa.Table) -> pa.Table:
        import numpy as np

        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b["s"].to_numpy(zero_copy_only=False).astype(np.int64) + 1_000_000_000
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, s]), pa.int64()),
                "dst": pa.array(np.concatenate([s, c]), pa.int64()),
            }
        )

    edges = pairs.map_batches(
        both_dirs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    _TRADE_EDGE_MEMO[sf_dir] = edges
    return edges


def q_pagerank_trade_graph(sf_dir: str):
    """Integer-exact PageRank (3 iterations, damping 17/20) over the
    customer↔supplier trade graph."""
    from pyreshaper_ray.stages.graph import pagerank_fixed

    return pagerank_fixed(_trade_graph_edges(sf_dir), n_iters=3, top_n=20)


def q_kcore_trade_graph(sf_dir: str):
    """4-core of the customer↔supplier trade graph: 8-round iterative
    peel (early-exit at the fixed point is bit-equivalent)."""
    from pyreshaper_ray.stages.graph import kcore_rounds

    return kcore_rounds(_trade_graph_edges(sf_dir), k=4, n_rounds=8)


def q_link_predict_suppliers(sf_dir: str):
    """Supplier-supplier link prediction by common-customer count + exact
    integer Jaccard, wedges enumerated through the low-degree customer
    side. Reuses the memoized trade-graph edge list (c→s rows are the
    src < 10^9 half; the supplier offset is subtracted back out)."""
    from pyreshaper_ray.stages.graph import link_predict_bipartite

    edges = _trade_graph_edges(sf_dir)

    def cs_half(b: pa.Table) -> pa.Table:
        keep = pc.less(b["src"], 1_000_000_000)
        t = b.filter(keep)
        return pa.table(
            {
                "c": t["src"],
                "s": pc.subtract(t["dst"], 1_000_000_000),
            }
        )

    cs = edges.map_batches(cs_half, batch_format="pyarrow", zero_copy_batch=True)
    return link_predict_bipartite(cs, top_k=50)


def q_bm25_rank(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import bm25_rank

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bm25_rank(docs, query_terms=("data", "model", "system"), top_n=10)


def q_seasonal_naive_error(sf_dir: str):
    from pyreshaper_ray.stages.timeseries import seasonal_naive_error

    return seasonal_naive_error(
        _events_value_ds(sf_dir, ["event_type", "ts"]), season_days=7
    )


def q_daily_type_entropy(sf_dir: str):
    from pyreshaper_ray.stages.timeseries import daily_type_entropy

    return daily_type_entropy(_events_value_ds(sf_dir, ["event_type", "ts"]))


def q_zone_skip_plan(sf_dir: str):
    from pyreshaper_ray.sources.planner import zone_skip_plan

    return zone_skip_plan(
        f"{sf_dir}/events.parquet", "event_id", lo=0, hi=10_000
    )


def q_lsh_parameter_plan(sf_dir: str):
    from pyreshaper_ray.sources.planner import lsh_parameter_plan

    return lsh_parameter_plan()


def q_shape_census(sf_dir: str):
    from pyreshaper_ray.stages.windows import shape_census

    return shape_census(read_events_as_transcripts(sf_dir))


def q_resample_uniform(sf_dir: str):
    from pyreshaper_ray.stages.timeseries import resample_uniform

    return resample_uniform(_norm_ds(sf_dir))


def q_ks_purchase_click(sf_dir: str):
    from pyreshaper_ray.stages.analytics import ks_statistic

    return ks_statistic(_events_value_ds(sf_dir, ["event_type", "value"]))


def q_decayed_user_scores(sf_dir: str):
    from pyreshaper_ray.stages.analytics import decayed_user_scores

    return decayed_user_scores(_events_value_ds(sf_dir, ["user_id", "ts"]))


def q_scan_task_plan(sf_dir: str):
    from pyreshaper_ray.sources.planner import scan_task_plan

    return scan_task_plan(sf_dir)


def q_gini_user_activity(sf_dir: str):
    from pyreshaper_ray.stages.analytics import gini_user_activity

    return gini_user_activity(_events_value_ds(sf_dir, ["user_id"]))


def q_mannwhitney_value(sf_dir: str):
    from pyreshaper_ray.stages.analytics import mannwhitney_components

    return mannwhitney_components(
        _events_value_ds(sf_dir, ["event_type", "value"])
    )


def q_source_mix_weights(sf_dir: str):
    import ray.data

    from pyreshaper_ray.stages.text import source_mix_weights

    return source_mix_weights(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    )


def q_q17_small_quantity(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q17_small_quantity_revenue

    return q17_small_quantity_revenue(sf_dir)


def q_q22_idle_balance(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q22_idle_balance_census

    return q22_idle_balance_census(sf_dir)


def q_q9_nation_year(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q9_nation_year_revenue

    return q9_nation_year_revenue(sf_dir)


def q_q6_forecast_revenue(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q6_forecast_revenue

    return q6_forecast_revenue(sf_dir)


def q_q12_priority_by_status(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q12_priority_by_status

    return q12_priority_by_status(sf_dir)


def q_q13_customer_distribution(sf_dir: str):
    from pyreshaper_ray.stages.analytics import q13_customer_distribution

    return q13_customer_distribution(sf_dir)


def q_compress_ratio(sf_dir: str):
    """zlib ratio per doc: deterministic but not SQL-expressible (DuckDB has
    no zlib) — rows-only driver check; ordering/determinism gates live in
    tests/test_text.py."""
    import ray.data

    from pyreshaper_ray.stages.text import compress_ratio_batch

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(compress_ratio_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_bigram_lm_scores(sf_dir: str):
    """Two-pass char-bigram LM quality score (train combiner-first, score
    via broadcast model) — model scoring, rows-only by nature."""
    import ray.data

    from pyreshaper_ray.stages.text import bigram_lm_scores

    return bigram_lm_scores(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
    )


def q_interval_coverage(sf_dir: str):
    """Merged-interval active time per user: each event opens a 5-minute
    activity span; overlapping/adjacent spans union (gaps-and-islands)."""
    from pyreshaper_ray.stages.windows import interval_coverage

    return interval_coverage(_events_value_ds(sf_dir, ["user_id", "ts"]), pad_s=300)


def q_dup_ngram_coverage(sf_dir: str):
    """ExactSubstr-style duplicated 5-gram span coverage per document."""
    import ray.data

    from pyreshaper_ray.stages.dedup import dup_ngram_coverage

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dup_ngram_coverage(docs, n=5)


def q_triangle_terms(sf_dir: str):
    """Triangle enumeration over the support-thresholded term
    co-occurrence graph (edges = term pairs sharing >= 2% of documents,
    per-doc distinct terms capped at the engine-wide 64)."""
    import ray.data

    from pyreshaper_ray.stages.graph import triangle_count
    from pyreshaper_ray.stages.text import cooccurrence_edges

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()
    edges = cooccurrence_edges(docs, n_docs=n_docs, support_ppm=20_000)
    return triangle_count(edges, max_triangles=5000)


def q_association_rules(sf_dir: str):
    """Size-2 association rules (exact integer support/confidence/lift)
    over the 2%-support term pairs, per-doc distinct terms capped at 64."""
    import ray.data

    from pyreshaper_ray.stages.text import association_rules

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()
    return association_rules(docs, n_docs=n_docs, support_ppm=20_000)


def q_tv_distance(sf_dir: str):
    """Total-variation drift between src0 and src1 term distributions
    over the global top-100 vocabulary (+other), integer ppm."""
    import ray.data

    from pyreshaper_ray.stages.text import tv_distance_sources

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    return tv_distance_sources(docs, "src0", "src1", top_v=100)


def q_markov_backtest(sf_dir: str):
    """First-order Markov next-event argmax backtest (train on the whole
    stream, score every consecutive pair; ties to the lexicographically
    first successor)."""
    from pyreshaper_ray.stages.windows import markov_backtest

    return markov_backtest(
        _events_value_ds(sf_dir, ["user_id", "event_id", "event_type", "ts"])
    )


def q_contamination_flags(sf_dir: str):
    """8-gram train/test decontamination flags (test split = doc_id % 50
    == 0); broadcast test-gram set, per-block membership count."""
    import ray.data

    from pyreshaper_ray.stages.dedup import contamination_flags

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return contamination_flags(docs, test_mod=50, n=8)


def q_linear_attribution(sf_dir: str):
    """Linear multi-touch attribution (equal ppm split over the 7-day
    window; diff-array kernel — no pair explosion in the engine)."""
    from pyreshaper_ray.stages.windows import linear_attribution

    return linear_attribution(
        _events_value_ds(sf_dir, ["user_id", "event_id", "event_type", "ts"])
    )


def q_hll_overlap(sf_dir: str):
    """HLL inclusion-exclusion overlap estimate between the click and
    purchase user sets (rows-only; pytest bounds the error)."""
    import ray.data

    from pyreshaper_ray.stages.sketches import hll_set_overlap

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    clicks = ev.filter(expr="event_type == 'click'")
    purchases = ev.filter(expr="event_type == 'purchase'")
    return hll_set_overlap(clicks, purchases, "user_id", "user_id")


def q_flesch(sf_dir: str):
    """Flesch reading-ease in integer milli-points (RE2 word/sentence/
    vowel-group counts shared verbatim with the oracle)."""
    import ray.data

    from pyreshaper_ray.stages.text import flesch_readability

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return flesch_readability(docs).sort("doc_id")


def q_pagerank_weighted(sf_dir: str):
    """Weighted PageRank over the trade graph: edge weight = customer-
    supplier co-transaction multiplicity; mass splits proportionally with
    per-edge floors (bit-exact vs the chained-CTE SQL). The weighted edge
    build (join + pair census) is memoized per sf_dir within a session,
    same pure-cache rationale as ``_trade_graph_edges``."""
    from pyreshaper_ray.stages.graph import pagerank_weighted

    memo_key = ("weighted", sf_dir)
    if memo_key in _TRADE_EDGE_MEMO:
        return pagerank_weighted(_TRADE_EDGE_MEMO[memo_key], n_iters=3, top_n=20)

    pairs = _trade_graph_pairs(sf_dir)

    def both_dirs(b: pa.Table) -> pa.Table:
        import numpy as np

        c = b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b["s"].to_numpy(zero_copy_only=False).astype(np.int64) + 1_000_000_000
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, s]), pa.int64()),
                "dst": pa.array(np.concatenate([s, c]), pa.int64()),
                "w": pa.array(np.concatenate([w, w]), pa.int64()),
            }
        )

    edges = pairs.map_batches(
        both_dirs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    _TRADE_EDGE_MEMO[memo_key] = edges
    return pagerank_weighted(edges, n_iters=3, top_n=20)


def q_changepoint_daily(sf_dir: str):
    """Binary-segmentation change point on the daily event-count series
    (variance-reduction argmax, integer outputs)."""
    from pyreshaper_ray.stages.timeseries import changepoint_daily

    return changepoint_daily(_events_value_ds(sf_dir, ["ts"]))


def q_pivot_daily_types(sf_dir: str):
    """Narrow→wide PIVOT: one row per day with per-event-type count
    columns (combiner-side pivot, no row explosion in the exchange)."""
    from pyreshaper_ray.stages.analytics import pivot_daily_type_counts

    return pivot_daily_type_counts(
        _events_value_ds(sf_dir, ["ts", "event_type"])
    )


def q_audio_features(sf_dir: str):
    """Real PCM feature extraction (integer RMS + zero crossings) in an
    actor pool over synthesized binary payloads — rows-only (no SQL PCM);
    the wave-backend path is pytest-gated with genuine WAV bytes."""
    from pyreshaper_ray.stages.multimodal import audio_features_documents

    return audio_features_documents(sf_dir)


def q_order_reconciliation(sf_dir: str):
    """Header-vs-lineitem financial reconciliation census (integer
    cents×pct² domain; match/over/under + total absolute drift)."""
    from pyreshaper_ray.stages.analytics import order_total_reconciliation

    return order_total_reconciliation(sf_dir)


def q_zipf_slope(sf_dir: str):
    """Zipf rank-frequency slope over the top-200 corpus terms (micro-nat
    quantized ln, big-int least squares)."""
    import ray.data

    from pyreshaper_ray.stages.text import zipf_slope

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return zipf_slope(docs, top_v=200)


def q_mmr_select(sf_dir: str):
    """MMR diversified top-5 for query vector 0 over a 50-candidate
    cosine pool (lam=0.7, mu=0.3 — literals shared with the oracle)."""
    import ray.data

    from pyreshaper_ray.stages.similarity import mmr_select

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return mmr_select(emb, query_id=0, k=5, pool=50, lam=0.7, mu=0.3)


def q_seasonal_decompose(sf_dir: str):
    """Centered-MA seasonal decomposition of the hourly event series
    (25-hour trend window, per-hour-of-day truncated-mean seasonal)."""
    from pyreshaper_ray.stages.timeseries import seasonal_decompose_hourly

    return seasonal_decompose_hourly(
        _events_value_ds(sf_dir, ["ts"]), window=25
    )


def q_bpe_merge_token_count(sf_dir: str):
    """EXACT BPE token count per document: merge table trained on the
    corpus's lowest-doc_id slice (deterministic), counting through an
    actor pool that builds the rank table once per actor in __init__.
    Rows-only (the merge loop is not SQL-expressible); hand-verified-merge
    pytest in tests/test_text.py. Keeps ``bpe_token_count`` (below) as the
    pretokenizer baseline."""
    from pyreshaper_ray.stages.text import bpe_merge_token_count

    return bpe_merge_token_count(sf_dir, n_merges=256, train_docs=256)


def q_bpe_token_count(sf_dir: str):
    """GPT-2-style pretokenizer count per document (lookahead-free RE2,
    shared verbatim with the oracle)."""
    import ray.data

    from pyreshaper_ray.stages.text import bpe_token_count_batch

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        bpe_token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


def q_rrf_fuse(sf_dir: str):
    """Reciprocal-rank fusion of the length and lexical-richness rankings
    (exact global ROW_NUMBERs via block-offset ranks, hash-joined)."""
    import ray.data

    from pyreshaper_ray.stages.text import rrf_fuse_documents

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    return rrf_fuse_documents(docs, k=60, top_n=20)


def q_skyline_users(sf_dir: str):
    """Exact 2-D Pareto skyline of users over (total spend, recency):
    block-carry frontier scan after the distributed sort — nothing
    user-sized lands on the driver."""
    from pyreshaper_ray.stages.analytics import skyline_users

    return skyline_users(_events_value_ds(sf_dir, ["user_id", "ts", "value"]))


# Round-5 driver-prefix rotation (SURVEY §11 staging, VERDICT r4 #2):
# 10 round-4 additions, then 40 never-driver-checked SQL-oracled queries.
_R5_PREFIX = [
    "tier_routed_daily",
    "rolling_zscore_days",
    "vwap_ship_daily",
    "nearest_click_per_purchase",
    "click_purchase_pairs",
    "tool_chain_census",
    "conv_tool_char_balance",
    "first_touch_attribution",
    "session_count_histogram",
    "daily_uniques_ratio",
    "typo_term_pairs",
    "fastss_edit1_pairs",
    "link_predict_suppliers",
    "holt_winters_daily",
    "kaplan_meier_sessions",
    "dtw_event_types",
    "bollinger_daily_counts",
    "copurchase_part_pairs",
    "charclass_census_documents",
    "spend_decile_census",
    "theil_sen_daily_trend",
    "bounce_rate_daily",
    "bm25_rank_documents",
    "seasonal_naive_error_7d",
    "daily_type_entropy",
    "interval_coverage_5m",
    "q4_late_ship_priority",
    "q19_brand_revenue",
    "encode_roles",
    "profile_events",
    "peak_rate_5m",
    "last_touch_attribution",
    "dup_ngram_coverage_5",
    "cum_distinct_tools",
    "scale_value_by_type",
    "assign_folds_documents",
    "counter_increase_per_user",
    "gap_survival_census",
    "event_features",
    "sentence_stats_documents",
    "k_anonymity_audit",
    "quota_sample_documents",
    "growth_accounting_daily",
    "contingency_margins",
    "transition_latency_census",
    "paa_segments_4",
    "hourly_seasonality",
    "cross_source_contamination",
    "context_assembly",
    "pack_sequences_512",
]
_R5_PREFIX_SET = frozenset(_R5_PREFIX)


def queries() -> dict[str, Callable[[str], Any]]:
    # Ordering contract: the correctness driver oracles a 50-query PREFIX of
    # this dict.  Rounds 1-4 cumulatively hash-checked 133 distinct queries;
    # round 5 rotates the prefix EXACTLY as staged in SURVEY §11 / VERDICT
    # r4 item #2: the 10 round-4 additions lead (driver-checking last
    # round's new operators first), then 40 SQL-oracled queries that have
    # never had a driver row, continuing in queries() order.  Several
    # prefix rows (q4/q19, link_predict, copurchase) route through the
    # round-5 task-based hash join, doubling as rewritten-code canaries.
    # The dict literal below keeps its historical (round-4) order; the
    # prefix is applied by reordering at the end of this function.
    d = {
        # --- 4 hash-green canaries (CORRECTNESS_r03) ---
        "pivot_turns": q_pivot_turns,
        "flagship_rollup_1m": q_flagship_rollup_1m,
        "dedup_exact_documents": q_dedup_exact,
        "asof_next_order": q_asof_next_order,
        # --- 46 never-driver-checked SQL-oracled queries (rotated in r4) ---
        "conv_trend": q_conv_trend,
        "rolling_minmax_3_turns": q_rolling_minmax,
        "ngram_jaccard_neighbors": q_ngram_jaccard_neighbors,
        "trending_terms_daily": q_trending_terms,
        "partition_fingerprint": q_partition_fingerprint,
        "snapshot_diff_events": q_snapshot_diff,
        "debounce_events_10m": q_debounce_events,
        "clean_text_documents": q_clean_text,
        "redact_pii_documents": q_redact_pii,
        "user_gap_stats": q_user_gap_stats,
        "embedding_dim_stats": q_embedding_dim_stats,
        "sample_per_source_5": q_sample_per_source,
        "event_trigrams": q_event_trigrams,
        "value_mad_outliers": q_value_mad_outliers,
        "drop_repeated_turns": q_drop_repeated_turns,
        "q3_unshipped_revenue": q_q3_unshipped,
        "p95_chars_1h": q_p95_chars_1h,
        "top_users_by_active_days": q_top_users_by_active_days,
        "rollup_1w_cascade": q_rollup_1w,
        "ewma_chars_8": q_ewma_chars,
        "q10_returned_top20": q_q10_returned,
        "event_type_user_overlap": q_event_type_overlap,
        "scd2_value_history": q_scd2_value_history,
        "concurrent_convs_at_start": q_concurrent_convs,
        "value_deciles": q_value_deciles,
        "winsorized_value_stats": q_winsorized_value_stats,
        "role_runs": q_role_runs,
        "longest_streak_days": q_longest_streak,
        "median_value_per_type": q_median_value_per_type,
        "wau_by_week": q_wau_by_week,
        "doc_len_histogram": q_doc_len_histogram,
        "tier_consistency_1h": q_tier_consistency,
        "tier_upsert_late": q_tier_upsert_late,
        "orphan_lineitems": q_orphan_lineitems,
        "corpus_intake_counts": q_corpus_intake,
        "percent_rank_convs": q_percent_rank_convs,
        "calendarize_spans": q_calendarize_spans,
        "pivot_turns_ipc": q_pivot_turns_ipc,
        "daily_dashboard": q_daily_dashboard,
        "wau_retention": q_wau_retention,
        "ship_latency_by_priority": q_ship_latency,
        "benford_first_digit": q_benford,
        "term_pair_cooccurrence": q_term_pairs,
        "pagerank_trade_graph": q_pagerank_trade_graph,
        "kcore_trade_graph": q_kcore_trade_graph,
        "pagerank_weighted_trade": q_pagerank_weighted,
        # ---------------- past the 50-entry driver prefix ----------------
        # (previously-green rounds-1..3 queries + rows-only entries, prior
        #  order; new round-4 oracled additions lead so the next prefix
        #  rotation picks them up first)
        "tier_routed_daily": q_tier_routed_daily,
        "rolling_zscore_days": q_rolling_zscore_days,
        "vwap_ship_daily": q_vwap_ship_daily,
        "nearest_click_per_purchase": q_nearest_click_per_purchase,
        "click_purchase_pairs": q_click_purchase_pairs,
        "tool_chain_census": q_tool_chain_census,
        "conv_tool_char_balance": q_conv_tool_char_balance,
        "first_touch_attribution": q_first_touch_attribution,
        "session_count_histogram": q_session_count_histogram,
        "daily_uniques_ratio": q_daily_uniques_ratio,
        "matrix_profile_hourly": q_matrix_profile_hourly,
        "rs_range_hourly": q_rs_range_hourly,
        "pettitt_change_hourly": q_pettitt_change_hourly,
        "sax_hourly_symbols": q_sax_hourly_symbols,
        "runs_test_hourly": q_runs_test_hourly,
        "mi_type_hod": q_mi_type_hod,
        "croston_daily": q_croston_daily,
        "hard_negatives_top3": q_hard_negatives,
        "skipgram_transitions_w3": q_skipgram_transitions,
        "rfm_scores": q_rfm_scores,
        "heaps_law_documents": q_heaps_law,
        "dow_adjusted_anomalies": q_dow_adjusted_anomalies,
        "systematic_sample_events": q_systematic_sample,
        "fanout_histogram_lineitems": q_fanout_histogram,
        "neardup_cluster_sizes": q_neardup_cluster_sizes,
        "error_budget_burn": q_error_budget_burn,
        "session_overlap_pairs": q_session_overlap_pairs,
        "user_burstiness": q_user_burstiness,
        "funnel3_ordered": q_funnel3_ordered,
        "markov_entropy_rate": q_markov_entropy_rate,
        "loo_source_word_deltas": q_loo_source_deltas,
        "hist2d_len_words": q_hist2d_len_words,
        "frequent_triples_parts": q_frequent_triples,
        "session_entry_conversion": q_session_entry_conversion,
        "corr_disc_qty_by_brand": q_corr_by_brand,
        "transition_drift_fortnights": q_transition_drift,
        "daily_median_value": q_daily_median_value,
        "casing_census_documents": q_casing_census,
        "exact_dup_cluster_sizes": q_exact_dup_cluster_sizes,
        "weekday_weekend_lift": q_weekday_weekend_lift,
        "conversion_latency_percentiles": q_conversion_latency_pcts,
        "part_price_size_census": q_part_price_size_census,
        "supplier_nation_balance": q_supplier_nation_balance,
        "top_terms_by_lang": q_top_terms_by_lang,
        "degree_assortativity_trade": q_degree_assortativity,
        "value_acf_daily": q_value_acf_daily,
        "daily_new_terms": q_daily_new_terms,
        "max_quiet_gap_hourly": q_max_quiet_gap,
        "revenue_pareto_share": q_revenue_pareto_share,
        "session_duration_median": q_session_duration_median,
        "daily_peak_trough": q_daily_peak_trough,
        "reply_latency_census": q_reply_latency_census,
        "repeat_purchase_rate": q_repeat_purchase_rate,
        "acf_minute_counts": q_acf_minute_counts,
        "hour_dod_delta": q_hour_dod_delta,
        "role_simpson_per_conv": q_role_simpson,
        "typo_term_pairs": q_typo_term_pairs,
        "fastss_edit1_pairs": q_fastss_edit1_pairs,
        "link_predict_suppliers": q_link_predict_suppliers,
        "holt_winters_daily": q_holt_winters_daily,
        "kaplan_meier_sessions": q_kaplan_meier_sessions,
        "dtw_event_types": q_dtw_event_types,
        "bollinger_daily_counts": q_bollinger_daily_counts,
        "copurchase_part_pairs": q_copurchase_part_pairs,
        "charclass_census_documents": q_charclass_census,
        "spend_decile_census": q_spend_decile_census,
        "theil_sen_daily_trend": q_theil_sen_trend,
        "bounce_rate_daily": q_bounce_rate_daily,
        "bm25_rank_documents": q_bm25_rank,
        "seasonal_naive_error_7d": q_seasonal_naive_error,
        "daily_type_entropy": q_daily_type_entropy,
        "interval_coverage_5m": q_interval_coverage,
        "q4_late_ship_priority": q_q4_late_ship,
        "q19_brand_revenue": q_q19_brand_revenue,
        "encode_roles": q_encode_roles,
        "profile_events": q_profile_events,
        "peak_rate_5m": q_peak_rate_5m,
        "last_touch_attribution": q_last_touch,
        "dup_ngram_coverage_5": q_dup_ngram_coverage,
        "dup_span_extract_5": q_dup_span_extract,
        "cum_distinct_tools": q_cum_distinct_tools,
        "scale_value_by_type": q_scale_value_by_type,
        "assign_folds_documents": q_assign_folds,
        "counter_increase_per_user": q_counter_increase,
        "gap_survival_census": q_gap_survival,
        "event_features": q_event_features,
        "sentence_stats_documents": q_sentence_stats,
        "k_anonymity_audit": q_k_anonymity,
        "quota_sample_documents": q_quota_sample,
        "growth_accounting_daily": q_growth_accounting,
        "contingency_margins": q_contingency_margins,
        "transition_latency_census": q_transition_latency,
        "paa_segments_4": q_paa_segments,
        "hourly_seasonality": q_hourly_seasonality,
        "cross_source_contamination": q_cross_source_contamination,
        "context_assembly": q_context_assembly,
        "pack_sequences_512": q_pack_sequences,
        "window_corrections_30m": q_window_corrections,
        "rag_chunks_512_448": q_rag_chunks,
        "gopher_repetition_documents": q_gopher_repetition,
        "q7_bination_volume": q_q7_bination_volume,
        "retention_policy_census": q_retention_policy,
        "arrival_disorder_census": q_arrival_disorder,
        "chunk_dedup_exact": q_chunk_dedup,
        "dedup_normalized_documents": q_dedup_normalized,
        "triangle_terms": q_triangle_terms,
        "lead_lag_daily_xcorr": q_lead_lag_xcorr,
        "q9_nation_year_revenue": q_q9_nation_year,
        "chi2_independence_cells": q_chi2_cells,
        "lexical_diversity_by_source": q_lexical_diversity,
        "adaptive_join_container_revenue": q_adaptive_join_container_revenue,
        "q15_top_supplier": q_q15_top_supplier,
        "snm_neardup_documents": q_snm_neardup,
        "snm_neardup_multipass": q_snm_multipass,
        "pack_sequences_ffd": q_pack_sequences_ffd,
        "compress_ratio_documents": q_compress_ratio,
        "bigram_lm_scores_documents": q_bigram_lm_scores,
        "hll_users_1h_cascade": q_hll_users_cascade,
        "gini_user_activity": q_gini_user_activity,
        "mannwhitney_value_purchase_click": q_mannwhitney_value,
        "source_mix_weights": q_source_mix_weights,
        "zorder_events": q_zorder_events,
        "equidepth_bins_events": q_equidepth_bins,
        "event_type_venn": q_event_type_venn,
        "median2_value_per_type": q_median2_value_per_type,
        "q16_supplier_census": q_q16_supplier_census,
        "q11_important_parts": q_q11_important_parts,
        "boilerplate_line_census": q_boilerplate_census,
        "q20_dominant_suppliers": q_q20_dominant_suppliers,
        "haar_minute_counts": q_haar_minute_counts,
        "response_latency_view_purchase": q_response_latency,
        "knn_int8_top5": q_knn_int8,
        "q2_cheapest_supplier": q_q2_cheapest_supplier,
        "codeblock_census": q_codeblock_census,
        "dp_event_counts": q_dp_event_counts,
        "label_centroid_distance": q_label_centroid_distance,
        "cms_term_counts": q_cms_term_counts,
        "weighted_sample_documents": q_weighted_sample_docs,
        "semdedup_embeddings": q_semdedup_embeddings,
        "dsir_weights_documents": q_dsir_weights,
        "curation_funnel": q_curation_funnel,
        "q13_customer_distribution": q_q13_customer_distribution,
        "q8_market_share_ppm": q_q8_market_share,
        "q6_forecast_revenue": q_q6_forecast_revenue,
        "q12_priority_by_status": q_q12_priority_by_status,
        "q17_small_quantity_revenue": q_q17_small_quantity,
        "q22_idle_balance_census": q_q22_idle_balance,
        "value_histogram": q_value_histogram,
        "pivot_roles_wide": q_pivot_roles_wide,
        "corr_qty_price": q_corr_qty_price,
        "approx_value_quantiles": q_approx_value_quantiles,
        "tfidf_top_term_documents": q_tfidf_top_term,
        "bloom_join_urgent": q_bloom_join_urgent,
        "revenue_by_region": q_revenue_by_region,
        "late_events_30m": q_late_events,
        "session_windows_30m": q_session_windows,
        "roles_concat": q_roles_concat,
        "global_median_value": q_global_median_value,
        "rank_convs_in_cohort": q_rank_convs_in_cohort,
        "moving_sum_3_turns": q_moving_sum_3,
        "first_last_role_per_conv": q_first_last_role,
        "mode_role_per_conv": q_mode_role,
        "userdays_both_types": q_userdays_both_types,
        "userdays_purchase_no_error": q_userdays_purchase_no_error,
        "dow_hour_activity": q_dow_hour_activity,
        "regex_extract_documents": q_regex_extract,
        "ntile_quartiles_convs": q_ntile_quartiles,
        "customer_event_counts_left": q_customer_event_counts_left,
        "power_users_70": q_power_users,
        "label_vector_sums": q_label_vector_sums,
        "stratified_sample_documents": q_stratified_sample,
        "monthly_revenue": q_monthly_revenue,
        "cohort_retention": q_cohort_retention,
        "funnel_signup_purchase": q_funnel_signup_purchase,
        "daily_counts_full_outer": q_daily_counts_full_outer,
        "gram_matrix_embeddings": q_gram_matrix,
        "rolling_7d_user_value": q_rolling_7d_user_value,
        "kmeans_embeddings": q_kmeans_embeddings,
        "pq_encode_embeddings": q_pq_encode_embeddings,
        "source_share_ppm": q_source_share_ppm,
        "orders_above_customer_avg": q_orders_above_customer_avg,
        "heavy_hitters_terms": q_heavy_hitters_terms,
        "props_k_stats": q_props_k_stats,
        "skew_join_events_customers": q_skew_join_events_customers,
        "event_transitions": q_event_transitions,
        "funnel_latency": q_funnel_latency,
        "rolling_7d_distinct_users": q_rolling_7d_distinct_users,
        "centroid_similarity_components": q_centroid_similarity,
        "value_outliers": q_value_outliers,
        "promo_revenue_ppm": q_promo_revenue_ppm,
        "monthly_revenue_change": q_monthly_revenue_change,
        "dedup_canonical_documents": q_dedup_canonical,
        "neardup_groups_distributed": q_neardup_groups_distributed,
        "ohlc_1m": q_ohlc_1m,
        "time_weighted_value": q_time_weighted_value,
        "latest_event_per_user": q_latest_event_per_user,
        "asof_last_order": q_asof_last_order,
        "text_embed_knn5": q_text_embed_knn,
        "lttb_downsample_8": q_lttb_downsample,
        "cusum_shift_users": q_cusum_shift,
        "ddsketch_p95_daily": q_ddsketch_p95_daily,
        "vocab_size_documents": q_vocab_size,
        "length_percentile_documents": q_length_percentile,
        "dewma_chars_8": q_dewma_chars,
        "posting_stats_documents": q_posting_stats,
        "skew_census_events": q_skew_census,
        "q5_local_supplier_volume": q_q5_local_supplier,
        "q18_large_volume_customers": q_q18_large_volume,
        "rollup_1m": q_rollup_1m,
        "knn_cosine_top5": q_knn,
        "pivot_turns_exclude": q_pivot_turns_exclude,
        "retention_1m": q_retention_1m,
        "rollup_1h_cascade": q_rollup_1h,
        "rollup_1d_cascade": q_rollup_1d,
        "gapfill_1m": q_gapfill_1m,
        "series_encode": q_series_encode,
        "series_decode_roundtrip": q_series_roundtrip,
        "distinct_tools_1m": q_distinct_tools_1m,
        "topk_convs_by_chars": q_topk_convs,
        "sessionize_30m": q_sessionize,
        "conv_stats": q_conv_stats,
        "q1_pricing_summary": q_q1,
        "orders_by_segment": q_orders_by_segment,
        "token_count_documents": q_token_count,
        "quality_documents": q_quality,
        "content_hash_documents": q_content_hash,
        "fingerprint_documents": q_fingerprint,
        "winnow_documents": q_winnow,
        "lang_id_documents": q_lang_id,
        "simhash_documents": q_simhash,
        "minhash_neardup_documents": q_minhash_neardup,
        "knn_lsh_top5": q_knn_lsh,
        "knn_ivf_top5": q_knn_ivf,
        "knn_ivf_full_probe": q_knn_ivf_full_probe,
        "semdedup_one_cell": q_semdedup_one_cell,
        "embedding_neardup_pairs": q_embedding_neardup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "neardup_groups": q_neardup_groups,
        "multimodal_decode_stub": q_multimodal,
        "image_header_census": q_image_header_census,
        "audio_wav_census": q_audio_wav_census,
        "audio_decode_stub": q_audio_stub,
        "video_frame_probe": q_video_sample,
        "quantize_embeddings_int8": q_quantize_embeddings,
        "pca_embeddings_top4": q_pca_embeddings,
        "lineitem_orders_join": q_lineitem_orders_join,
        "enrich_conv_cohort": q_enrich_conv_channel,
        "sliding_rollup_5m": q_sliding_5m,
        "median_chars_per_conv": q_median_chars,
        "p95_chars_per_conv": q_p95_chars,
        "top2_turns_per_conv": q_top2_turns,
        "turn_gaps_per_conv": q_turn_gaps,
        "cumsum_chars_per_conv": q_cumsum_chars,
        "customers_with_events": q_customers_with_events,
        "customers_without_events": q_customers_without_events,
        "orders_events_range_7d": q_orders_events_range_7d,
        "rollup_orders_cube": q_rollup_orders_cube,
        "unpivot_rollup_1m": q_unpivot_rollup_1m,
        "top_terms_documents": q_top_terms,
        "hash_sample_documents": q_hash_sample,
        "approx_distinct_users": q_approx_distinct_users,
        "q21_last_to_ship": q_q21_last_to_ship,
        "ks_value_purchase_click": q_ks_purchase_click,
        "decayed_user_scores": q_decayed_user_scores,
        "scan_task_plan": q_scan_task_plan,
        "tier_route_plan": q_tier_route_plan,
        "langid_confusion": q_langid_confusion,
        "shape_census": q_shape_census,
        "resample_uniform_8": q_resample_uniform,
        "zone_skip_plan": q_zone_skip_plan,
        "lsh_parameter_plan": q_lsh_parameter_plan,
        "join_cardinality_estimate": q_join_cardinality_estimate,
        "skyline_users": q_skyline_users,
        "association_rules_terms": q_association_rules,
        "rrf_fuse_documents": q_rrf_fuse,
        "bpe_token_count": q_bpe_token_count,
        "bpe_merge_token_count": q_bpe_merge_token_count,
        "seasonal_decompose_hourly": q_seasonal_decompose,
        "mmr_select_top5": q_mmr_select,
        "zipf_slope_documents": q_zipf_slope,
        "order_total_reconciliation": q_order_reconciliation,
        "audio_features_documents": q_audio_features,
        "pivot_daily_type_counts": q_pivot_daily_types,
        "changepoint_daily": q_changepoint_daily,
        "flesch_documents": q_flesch,
        "hll_user_overlap": q_hll_overlap,
        "linear_attribution": q_linear_attribution,
        "contamination_flags_8gram": q_contamination_flags,
        "markov_backtest": q_markov_backtest,
        "tv_distance_src0_src1": q_tv_distance,
    }
    prefix = _R5_PREFIX
    assert all(k in d for k in prefix), [k for k in prefix if k not in d]
    return {k: d[k] for k in prefix} | {
        k: v for k, v in d.items() if k not in _R5_PREFIX_SET
    }


_ROLLUP_SQL = f"""
WITH t AS ({_T})
SELECT conv_id,
       date_trunc('minute', ts) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS turn_count,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS char_sum,
       CAST(MIN(LENGTH(text)) AS BIGINT) AS char_min,
       CAST(MAX(LENGTH(text)) AS BIGINT) AS char_max,
       CAST(SUM((LENGTH(text) + 3) // 4) AS BIGINT) AS tok_est_sum,
       CAST(SUM(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS BIGINT) AS tool_calls
FROM t
GROUP BY 1, 2
"""


def _rollup_sql(unit: str) -> str:
    return _ROLLUP_SQL.replace("date_trunc('minute', ts)", f"date_trunc('{unit}', ts)")


def oracle_sql() -> dict[str, str]:
    out = {
        "pivot_turns": _T,
        "pivot_turns_exclude": f"SELECT * FROM ({_T}) WHERE role <> 'view'",
        "flagship_rollup_1m": _ROLLUP_SQL,
        "retention_1m": f"""
            SELECT * FROM ({_ROLLUP_SQL})
            WHERE window_start >= TIMESTAMP '2024-01-15 00:00:00'
        """,
        "rollup_1m": _ROLLUP_SQL,
        "rolling_zscore_days": """
            WITH d AS (
              SELECT date_trunc('day', ts) w, CAST(COUNT(*) AS BIGINT) x
              FROM events GROUP BY 1
            ),
            r AS (
              SELECT w, x,
                     CAST(COUNT(x) OVER win AS BIGINT) n,
                     CAST(COALESCE(SUM(x) OVER win, 0) AS BIGINT) s,
                     CAST(COALESCE(SUM(x*x) OVER win, 0) AS BIGINT) q
              FROM d
              WINDOW win AS (ORDER BY w ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
            )
            SELECT CAST(w AS TIMESTAMP) AS window_start,
                   x AS n_events,
                   CAST(CASE
                     WHEN n < 2 THEN 0
                     WHEN n*q - s*s > 0 THEN
                       CASE WHEN (n*x - s)*(n*x - s)*4 > 36*(n*q - s*s)
                            THEN 1 ELSE 0 END
                     ELSE CASE WHEN n*x <> s THEN 1 ELSE 0 END
                   END AS BIGINT) AS flagged
            FROM r
        """,
        "vwap_ship_daily": """
            WITH l AS (
              SELECT date_trunc('day', l_shipdate) w,
                     CAST(ROUND(l_extendedprice*100) AS BIGINT)
                       * CAST(l_quantity AS BIGINT) AS num,
                     CAST(l_quantity AS BIGINT) AS q
              FROM lineitem
            )
            SELECT CAST(w AS TIMESTAMP) AS window_start,
                   CAST(SUM(num) AS BIGINT) AS num_u,
                   CAST(SUM(q) AS BIGINT) AS qty_sum,
                   CAST(SUM(num) // GREATEST(SUM(q), 1) AS BIGINT) AS vwap_cents
            FROM l GROUP BY 1
        """,
        "first_touch_attribution": """
            WITH t AS (SELECT user_id, event_id tid, ts tts FROM events
                       WHERE event_type = 'click'),
                 c AS (SELECT user_id, event_id cid, ts cts FROM events
                       WHERE event_type = 'purchase'),
                 j AS (SELECT c.user_id, c.cid, t.tid,
                              epoch_us(c.cts) - epoch_us(t.tts) AS lag
                       FROM c JOIN t ON c.user_id = t.user_id
                        AND t.tts <= c.cts
                        AND epoch_us(t.tts) >= epoch_us(c.cts) - 604800000000)
            SELECT user_id, cid AS conv_event_id, tid AS touch_event_id,
                   CAST(lag AS BIGINT) AS lead_us
            FROM j
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY cid ORDER BY lag DESC, tid) = 1
        """,
        "session_count_histogram": """
            WITH e AS (
              SELECT user_id,
                     CASE WHEN LAG(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                             > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (SELECT user_id, CAST(SUM(brk) AS BIGINT) n_sessions
                  FROM e GROUP BY user_id)
            SELECT n_sessions, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM s GROUP BY 1
        """,
        "daily_uniques_ratio": """
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(COUNT(*) * 1000000
                        // GREATEST(COUNT(DISTINCT user_id), 1) AS BIGINT)
                       AS events_per_user_ppm
            FROM events GROUP BY 1
        """,
        "nearest_click_per_purchase": """
            WITH p AS (SELECT user_id, event_id pid, ts pts FROM events
                       WHERE event_type = 'purchase'),
                 c AS (SELECT user_id, event_id cid, ts cts FROM events
                       WHERE event_type = 'click'),
                 j AS (SELECT p.pid, c.cid,
                              ABS(epoch_us(p.pts) - epoch_us(c.cts)) ad,
                              epoch_us(c.cts) cts_us
                       FROM p JOIN c ON p.user_id = c.user_id)
            SELECT pid AS event_id, cid AS nn_event_id,
                   CAST(ad AS BIGINT) AS dt_abs_us
            FROM j
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY pid ORDER BY ad, cts_us, cid) = 1
        """,
        "click_purchase_pairs": f"""
            WITH t AS ({_T}),
            o AS (
              SELECT conv_id, CAST(turn_idx AS BIGINT) ti, role,
                     CAST(LENGTH(text) AS BIGINT) ch,
                     LEAD(role) OVER w AS nr,
                     LEAD(CAST(LENGTH(text) AS BIGINT)) OVER w AS nch,
                     LEAD(CAST(turn_idx AS BIGINT)) OVER w AS nti
              FROM t
              WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
            )
            SELECT conv_id, ti AS a_turn_idx, nti AS b_turn_idx,
                   ch AS a_chars, nch AS b_chars
            FROM o WHERE role = 'click' AND nr = 'purchase'
        """,
        "tool_chain_census": f"""
            WITH t AS ({_T}),
            ch AS (
              SELECT conv_id,
                     STRING_AGG(tool, '>' ORDER BY ts, turn_idx) AS chain
              FROM t WHERE tool <> '' GROUP BY conv_id
            ),
            cc AS (SELECT chain, CAST(COUNT(*) AS BIGINT) n_convs
                   FROM ch GROUP BY chain)
            SELECT chain, n_convs FROM cc
            QUALIFY ROW_NUMBER() OVER (ORDER BY n_convs DESC, chain) <= 50
        """,
        "conv_tool_char_balance": f"""
            WITH t AS ({_T})
            SELECT conv_id,
              CAST(SUM(CASE WHEN tool <> '' THEN LENGTH(text) ELSE 0 END)
                   AS BIGINT) AS tool_chars,
              CAST(SUM(CASE WHEN tool = '' THEN LENGTH(text) ELSE 0 END)
                   AS BIGINT) AS plain_chars,
              CAST(SUM(CASE WHEN tool <> '' THEN LENGTH(text) ELSE 0 END)
                   * 1000000 // GREATEST(SUM(LENGTH(text)), 1)
                   AS BIGINT) AS tool_ppm
            FROM t GROUP BY conv_id
        """,
        # tier-routed execution: additivity makes the routed answer equal
        # to the raw daily aggregate over the window — restated directly
        "tier_routed_daily": f"""
            WITH t AS ({_T})
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
                   CAST(COUNT(*) AS BIGINT) AS turn_count,
                   CAST(SUM(LENGTH(text)) AS BIGINT) AS char_sum,
                   CAST(SUM(CASE WHEN tool <> '' THEN 1 ELSE 0 END) AS BIGINT)
                       AS tool_calls
            FROM t
            WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
              AND ts <  TIMESTAMP '2024-01-12 00:00:00'
            GROUP BY 1
        """,
        "rollup_1h_cascade": _rollup_sql("hour"),
        "rollup_1d_cascade": _rollup_sql("day"),
        # bounded gap-fill (max_gap = 60 windows, the engine default): a gap
        # of g missing minutes is filled only when 1 <= g <= 60
        "gapfill_1m": f"""
            WITH t AS ({_T}),
            w AS (SELECT DISTINCT conv_id, date_trunc('minute', ts) AS w FROM t),
            d AS (
                SELECT conv_id,
                       date_diff('minute',
                                 LAG(w) OVER (PARTITION BY conv_id ORDER BY w),
                                 w) - 1 AS g
                FROM w
            )
            SELECT conv_id,
                   CAST(COALESCE(SUM(CASE WHEN g BETWEEN 1 AND 60
                                          THEN g ELSE 0 END), 0) AS BIGINT)
                       AS n_filled,
                   CAST(COUNT(*)
                        + COALESCE(SUM(CASE WHEN g BETWEEN 1 AND 60
                                            THEN g ELSE 0 END), 0) AS BIGINT)
                       AS n_windows
            FROM d GROUP BY 1
        """,
        "series_decode_roundtrip": f"""
            WITH t AS ({_T})
            SELECT conv_id,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(SUM(LENGTH(text)) AS BIGINT) AS char_sum,
                   MIN(ts) AS first_ts,
                   MAX(ts) AS last_ts
            FROM t GROUP BY 1
        """,
        "distinct_tools_1m": f"""
            WITH t AS ({_T})
            SELECT date_trunc('minute', ts) AS window_start,
                   CAST(COUNT(DISTINCT tool) AS BIGINT) AS n_tools
            FROM t WHERE tool <> '' GROUP BY 1
        """,
        "topk_convs_by_chars": f"""
            WITH t AS ({_T})
            SELECT conv_id, CAST(SUM(LENGTH(text)) AS BIGINT) AS char_sum
            FROM t GROUP BY 1
            ORDER BY char_sum DESC, conv_id ASC LIMIT 10
        """,
        "sessionize_30m": f"""
            WITH t AS ({_T}),
            d AS (
                SELECT conv_id,
                       CASE WHEN epoch_us(ts) - epoch_us(
                                LAG(ts) OVER (PARTITION BY conv_id
                                              ORDER BY ts, turn_idx)
                            ) > 1800000000 THEN 1 ELSE 0 END AS brk
                FROM t
            )
            SELECT conv_id, CAST(1 + COALESCE(SUM(brk), 0) AS BIGINT) AS n_sessions
            FROM d GROUP BY 1
        """,
        "conv_stats": f"""
            WITH t AS ({_T})
            SELECT conv_id,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   MIN(ts) AS first_ts,
                   MAX(ts) AS last_ts,
                   CAST(COUNT(DISTINCT role) AS BIGINT) AS n_roles
            FROM t GROUP BY 1
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY 1, 2
        """,
        "orders_by_segment": """
            SELECT c.c_mktsegment,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "dedup_exact_documents": """
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY text
        """,
        "token_count_documents": r"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "quality_documents": r"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(LENGTH(text) AS BIGINT) AS n_chars,
                   CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
                   CAST(LEN(regexp_extract_all(LOWER(text), '\b(the|a|and|of|to|in|is)\b')) AS BIGINT) AS n_stopwords,
                   CAST(LEN(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
                   CAST(LEN(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
            FROM documents
        """,
        "content_hash_documents": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(text) AS md5
            FROM documents
        """,
        "knn_cosine_top5": """
            WITH q AS (
                SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
                FROM embeddings WHERE vec_id < 5
            ),
            s AS (
                SELECT q.qid, e.vec_id AS nid,
                       list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS sim
                FROM embeddings e, q WHERE e.vec_id <> q.qid
            ),
            r AS (
                SELECT qid, nid,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY sim DESC, nid ASC) AS rn
                FROM s
            )
            SELECT CAST(qid AS BIGINT) AS query_id, CAST(nid AS BIGINT) AS neighbor_id
            FROM r WHERE rn <= 5
        """,
        # full-probe IVF ≡ exact brute force (probing every cell makes the
        # candidate set the whole corpus), so the same exact-cosine top-k
        # truth checks the IVF path end to end
        "knn_ivf_full_probe": """
            WITH q AS (
                SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
                FROM embeddings WHERE vec_id < 5
            ),
            s AS (
                SELECT q.qid, e.vec_id AS nid,
                       list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS sim
                FROM embeddings e, q WHERE e.vec_id <> q.qid
            ),
            r AS (
                SELECT qid, nid,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY sim DESC, nid ASC) AS rn
                FROM s
            )
            SELECT CAST(qid AS BIGINT) AS query_id, CAST(nid AS BIGINT) AS neighbor_id
            FROM r WHERE rn <= 5
        """,
        # one-cell SemDeDup: the greedy ascending-id keep rule, replayed
        # sequentially by a recursive CTE carrying the kept-id list
        "semdedup_one_cell": """
            WITH RECURSIVE ordered AS (
                SELECT vec_id, embedding::DOUBLE[] AS e,
                       ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
                FROM embeddings
            ),
            step(rn, kept_ids) AS (
                SELECT 0, CAST([] AS BIGINT[])
                UNION ALL
                SELECT o.rn,
                       CASE WHEN NOT EXISTS (
                           SELECT 1 FROM ordered k
                           WHERE list_contains(s.kept_ids, k.vec_id)
                             AND list_cosine_similarity(k.e, o.e) > 0.45
                       )
                       THEN list_append(s.kept_ids, CAST(o.vec_id AS BIGINT))
                       ELSE s.kept_ids END
                FROM step s JOIN ordered o ON o.rn = s.rn + 1
            ),
            final AS (SELECT kept_ids FROM step ORDER BY rn DESC LIMIT 1)
            SELECT CAST(o.vec_id AS BIGINT) AS vec_id,
                   CAST(0 AS BIGINT) AS cell,
                   CAST(list_contains(f.kept_ids, o.vec_id) AS BIGINT) AS kept
            FROM ordered o, final f
        """,
        # exhaustive word-3-shingle Jaccard truth for the MinHash+LSH
        # pipeline: tokenization mirrors dedup.shingle_hashes (lower +
        # whitespace split; <3 tokens -> token set; empty -> sentinel)
        "minhash_neardup_documents": """
            WITH toks AS (
                SELECT doc_id, tok, i
                FROM (
                    SELECT doc_id,
                           UNNEST(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                              x -> len(x) > 0)) AS tok,
                           UNNEST(range(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                                        x -> len(x) > 0)))) AS i
                    FROM documents
                )
            ),
            ntok AS (
                SELECT d.doc_id, COALESCE(t.n, 0) AS n
                FROM documents d
                LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id) t
                USING (doc_id)
            ),
            shing AS (
                SELECT DISTINCT a.doc_id, a.tok || chr(1) || b.tok || chr(1) || c.tok AS sh
                FROM toks a
                JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2
                UNION ALL
                SELECT DISTINCT t.doc_id, t.tok AS sh
                FROM toks t JOIN ntok USING (doc_id) WHERE ntok.n < 3
                UNION ALL
                SELECT doc_id, chr(2) AS sh FROM ntok WHERE n = 0
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shing GROUP BY doc_id),
            inter AS (
                SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS i
                FROM shing x JOIN shing y ON x.sh = y.sh AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            )
            SELECT CAST(doc_a AS BIGINT) AS doc_a,
                   CAST(doc_b AS BIGINT) AS doc_b,
                   i * 1.0 / (sa.sz + sb.sz - i) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.8
        """,
        "embedding_neardup_pairs": """
            SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.4
        """,
        "neardup_groups": """
            WITH RECURSIVE pairs AS (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM embeddings a, embeddings b
                WHERE a.vec_id < b.vec_id
                  AND list_cosine_similarity(a.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]) > 0.4
            ),
            edges AS (
                SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs
            ),
            reach (vec_id, r) AS (
                SELECT u, u FROM (SELECT DISTINCT u FROM edges)
                UNION
                SELECT e.u, reach.r FROM edges e JOIN reach ON reach.vec_id = e.v
            )
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(MIN(r) AS BIGINT) AS rep_id
            FROM reach GROUP BY vec_id
        """,
        "multimodal_decode_stub": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
                   CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        """,
        # planted-truth real decode: the Ray side parses GENUINE PNG/WAV
        # container bytes; the oracle replays the planting formulas
        "image_header_census": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars % 64 + 1 AS BIGINT) AS width,
                   CAST(n_chars * 7 % 48 + 1 AS BIGINT) AS height
            FROM documents
        """,
        "audio_wav_census": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars % 1000 + 1 AS BIGINT) AS n_samples,
                   CAST((n_chars % 1000 + 1) * 1000 // 8000 AS BIGINT) AS duration_ms,
                   CAST((n_chars % 1000) // 512 + 1 AS BIGINT) AS n_frames
            FROM documents
        """,
        "video_frame_probe": """
            WITH s AS (
                SELECT doc_id, octet_length(encode(text)) AS n,
                       octet_length(encode(text)) // 64 AS nf
                FROM documents
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n % 1280 AS BIGINT) AS width,
                   CAST((n * 3) % 720 AS BIGINT) AS height,
                   CAST(nf AS BIGINT) AS n_frames,
                   CAST(nf * 40000 // 1000 AS BIGINT) AS duration_ms,
                   CAST((nf + 7) // 8 AS BIGINT) AS n_sampled
            FROM s
        """,
        "audio_decode_stub": """
            WITH s AS (
                SELECT doc_id, octet_length(encode(text)) // 2 AS n_samples
                FROM documents
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_samples AS BIGINT) AS n_samples,
                   CAST(n_samples * 1000 // 16000 AS BIGINT) AS duration_ms,
                   CAST(CASE WHEN n_samples = 0 THEN 0
                             ELSE (n_samples - 1) // 512 + 1 END AS BIGINT) AS n_frames
            FROM s
        """,
        "median_chars_per_conv": f"""
            WITH t AS ({_T}),
            s AS (
                SELECT conv_id,
                       list_sort(list(LENGTH(text))) AS l,
                       COUNT(*) AS n
                FROM t GROUP BY 1
            )
            SELECT conv_id,
                   CAST(l[CAST((n - 1) // 2 AS BIGINT) + 1] AS BIGINT) AS median_char
            FROM s
        """,
        "p95_chars_per_conv": f"""
            WITH t AS ({_T}),
            s AS (
                SELECT conv_id,
                       list_sort(list(LENGTH(text))) AS l,
                       COUNT(*) AS n
                FROM t GROUP BY 1
            )
            SELECT conv_id,
                   CAST(l[GREATEST(CAST(CEIL(0.95 * n) AS BIGINT), 1)] AS BIGINT)
                       AS p_char
            FROM s
        """,
        "top2_turns_per_conv": f"""
            WITH t AS ({_T}),
            r AS (
                SELECT conv_id, turn_idx,
                       CAST(LENGTH(text) AS BIGINT) AS char_len,
                       ROW_NUMBER() OVER (
                           PARTITION BY conv_id
                           ORDER BY LENGTH(text) DESC, turn_idx ASC
                       ) AS rank
                FROM t
            )
            SELECT conv_id, turn_idx, char_len, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 2
        """,
        "sliding_rollup_5m": f"""
            WITH t AS ({_T}),
            m AS (
                SELECT conv_id, date_trunc('minute', ts) AS window_start,
                       CAST(COUNT(*) AS BIGINT) AS turn_count,
                       CAST(SUM(LENGTH(text)) AS BIGINT) AS char_sum
                FROM t GROUP BY 1, 2
            )
            SELECT conv_id, window_start,
                   CAST(SUM(turn_count) OVER w AS BIGINT) AS turn_count_5m,
                   CAST(SUM(char_sum) OVER w AS BIGINT) AS char_sum_5m
            FROM m
            WINDOW w AS (PARTITION BY conv_id ORDER BY window_start
                         RANGE BETWEEN INTERVAL 4 MINUTE PRECEDING
                                   AND CURRENT ROW)
        """,
        "asof_last_order": """
            SELECT e.event_id,
                   MAX(o.o_orderdate) AS last_order_ts
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            GROUP BY e.event_id
        """,
        "lineitem_orders_join": """
            SELECT o.o_orderstatus,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS price_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        "enrich_conv_cohort": f"""
            WITH t AS ({_T})
            SELECT CASE WHEN CAST(SUBSTR(conv_id, 2) AS BIGINT) % 2 = 0
                        THEN 'even' ELSE 'odd' END AS cohort,
                   CAST(SUM(LENGTH(text)) AS BIGINT) AS char_sum,
                   CAST(COUNT(*) AS BIGINT) AS n_turns
            FROM t GROUP BY 1
        """,
        "turn_gaps_per_conv": f"""
            WITH t AS ({_T}),
            d AS (
                SELECT conv_id,
                       epoch_us(ts) - epoch_us(
                           LAG(ts) OVER (PARTITION BY conv_id
                                         ORDER BY turn_idx)) AS g
                FROM t
            )
            SELECT conv_id,
                   CAST(COUNT(g) AS BIGINT) AS n_gaps,
                   CAST(SUM(g) AS BIGINT) AS sum_gap_us,
                   CAST(MAX(g) AS BIGINT) AS max_gap_us
            FROM d GROUP BY 1
        """,
        "cumsum_chars_per_conv": f"""
            WITH t AS ({_T})
            SELECT conv_id, turn_idx,
                   CAST(SUM(LENGTH(text)) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx
                   ) AS BIGINT) AS cum_chars
            FROM t
        """,
        "customers_with_events": """
            SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
            GROUP BY 1
        """,
        "customers_without_events": """
            SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
            GROUP BY 1
        """,
        "orders_events_range_7d": """
            SELECT o.o_orderkey,
                   CAST(COUNT(e.user_id) AS BIGINT) AS n_events,
                   MAX(e.value) AS max_value
            FROM orders o LEFT JOIN events e
              ON e.user_id = o.o_custkey
             AND e.ts >= o.o_orderdate
             AND e.ts < o.o_orderdate + INTERVAL 7 DAY
            GROUP BY 1
        """,
        "rollup_orders_cube": """
            SELECT o_orderstatus, o_orderpriority,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS total_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "unpivot_rollup_1m": f"""
            WITH r AS ({_ROLLUP_SQL})
            SELECT conv_id, window_start, 'turn_count' AS metric,
                   turn_count AS value FROM r
            UNION ALL
            SELECT conv_id, window_start, 'char_sum', char_sum FROM r
            UNION ALL
            SELECT conv_id, window_start, 'tool_calls', tool_calls FROM r
        """,
        "top_terms_documents": """
            SELECT term, CAST(COUNT(*) AS BIGINT) AS n
            FROM (
                SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                           AS term
                FROM documents
            )
            WHERE term <> ''
            GROUP BY 1 ORDER BY n DESC, term ASC LIMIT 20
        """,
        "hash_sample_documents": """
            SELECT doc_id, n_chars FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '2000'
        """,
        "value_histogram": """
            WITH c AS (
                SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
            )
            SELECT CAST(FLOOR(cents / 500.0) AS BIGINT) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents
            FROM c GROUP BY 1
        """,
        "pivot_roles_wide": f"""
            WITH t AS ({_T})
            SELECT conv_id,
                   CAST(COUNT(*) FILTER (WHERE role = 'view') AS BIGINT) AS n_view,
                   CAST(COUNT(*) FILTER (WHERE role = 'click') AS BIGINT) AS n_click,
                   CAST(COUNT(*) FILTER (WHERE role = 'purchase') AS BIGINT) AS n_purchase,
                   CAST(COUNT(*) FILTER (WHERE role = 'signup') AS BIGINT) AS n_signup,
                   CAST(COUNT(*) FILTER (WHERE role = 'error') AS BIGINT) AS n_error
            FROM t GROUP BY 1
        """,
        "tfidf_top_term_documents": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                           AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                FROM toks WHERE term <> '' GROUP BY 1, 2
            ), df AS (
                SELECT term, COUNT(DISTINCT doc_id) AS df
                FROM toks WHERE term <> '' GROUP BY 1
            ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.term,
                       tf.tf * CAST(FLOOR(ln((SELECT n_docs FROM n) / df.df)
                                          * 1000000 + 0.5) AS BIGINT) AS score
                FROM tf JOIN df USING (term)
            ), ranked AS (
                SELECT doc_id, term, score,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, term ASC) AS rn
                FROM scored
            )
            SELECT doc_id, term AS top_term, score FROM ranked WHERE rn = 1
        """,
        "bloom_join_urgent": """
            SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   MAX(e.value) AS max_value
            FROM events e JOIN orders o ON o.o_custkey = e.user_id
            WHERE o.o_orderpriority = '1-URGENT'
              AND o.o_orderdate < TIMESTAMP '2024-01-04'
            GROUP BY 1
        """,
        "revenue_by_region": """
            SELECT r_name,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS revenue_cents_pct,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1
        """,
        "late_events_30m": """
            WITH a AS (
                SELECT user_id, event_id, ts,
                       MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) AS hwm
                FROM events
            )
            SELECT user_id,
                   CAST(COALESCE(SUM(CASE WHEN ts < hwm - INTERVAL 30 MINUTE
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_late,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM a GROUP BY 1
        """,
        "session_windows_30m": f"""
            WITH t AS ({_T}),
            d AS (
                SELECT conv_id, ts, turn_idx,
                       CASE WHEN epoch_us(ts) - epoch_us(
                                LAG(ts) OVER (PARTITION BY conv_id
                                              ORDER BY ts, turn_idx)
                            ) > 1800000000 THEN 1 ELSE 0 END AS brk
                FROM t
            ),
            s AS (
                SELECT conv_id, ts,
                       SUM(brk) OVER (PARTITION BY conv_id
                                      ORDER BY ts, turn_idx
                                      ROWS UNBOUNDED PRECEDING) AS session_idx
                FROM d
            )
            SELECT conv_id, CAST(session_idx AS BIGINT) AS session_idx,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   MIN(ts) AS start_ts, MAX(ts) AS end_ts
            FROM s GROUP BY 1, 2
        """,
        "roles_concat": f"""
            WITH t AS ({_T})
            SELECT conv_id,
                   string_agg(role, ',' ORDER BY turn_idx) AS role_seq
            FROM t GROUP BY 1
        """,
        "global_median_value": """
            WITH c AS (
                SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
            )
            SELECT c AS median_cents FROM c ORDER BY c
            LIMIT 1 OFFSET (SELECT (COUNT(*) - 1) // 2 FROM c)
        """,
        "rank_convs_in_cohort": f"""
            WITH t AS ({_T}),
            s AS (
                SELECT conv_id, CAST(SUM(LENGTH(text)) AS BIGINT) AS char_sum
                FROM t GROUP BY 1
            ),
            c AS (
                SELECT CASE WHEN CAST(SUBSTR(conv_id, 2) AS BIGINT) % 2 = 0
                            THEN 'even' ELSE 'odd' END AS cohort,
                       conv_id, char_sum
                FROM s
            )
            SELECT cohort, conv_id, char_sum,
                   CAST(RANK() OVER (
                       PARTITION BY cohort ORDER BY char_sum DESC
                   ) AS BIGINT) AS rnk,
                   CAST(DENSE_RANK() OVER (
                       PARTITION BY cohort ORDER BY char_sum DESC
                   ) AS BIGINT) AS dense_rnk
            FROM c
        """,
        "moving_sum_3_turns": f"""
            WITH t AS ({_T})
            SELECT conv_id, turn_idx,
                   CAST(SUM(LENGTH(text)) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS win_chars
            FROM t
        """,
        "first_last_role_per_conv": f"""
            WITH t AS ({_T})
            SELECT conv_id,
                   arg_min(role, turn_idx) AS first_role,
                   arg_max(role, turn_idx) AS last_role,
                   arg_min(ts, turn_idx) AS first_ts,
                   arg_max(ts, turn_idx) AS last_ts
            FROM t GROUP BY 1
        """,
        "mode_role_per_conv": f"""
            WITH t AS ({_T}),
            c AS (
                SELECT conv_id, role, COUNT(*) AS n FROM t GROUP BY 1, 2
            ),
            r AS (
                SELECT conv_id, role, n,
                       ROW_NUMBER() OVER (
                           PARTITION BY conv_id ORDER BY n DESC, role
                       ) AS rn
                FROM c
            )
            SELECT conv_id, role AS mode_role, CAST(n AS BIGINT) AS n_turns
            FROM r WHERE rn = 1
        """,
        "userdays_both_types": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type
                FROM events
            )
            SELECT user_id, day FROM e WHERE event_type = 'purchase'
            INTERSECT
            SELECT user_id, day FROM e WHERE event_type = 'error'
        """,
        "userdays_purchase_no_error": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type
                FROM events
            )
            SELECT user_id, day FROM e WHERE event_type = 'purchase'
            EXCEPT
            SELECT user_id, day FROM e WHERE event_type = 'error'
        """,
        "dow_hour_activity": """
            SELECT CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
                   CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS sum_cents
            FROM events GROUP BY 1, 2
        """,
        "regex_extract_documents": """
            WITH m AS (
                SELECT regexp_extract(text, '([a-z]{6,})', 1) AS tok
                FROM documents
                WHERE regexp_matches(text, '[a-z]{6,}')
            )
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM m GROUP BY 1
        """,
        "label_vector_sums": """
            WITH u AS (
                SELECT label, UNNEST(embedding) AS e,
                       UNNEST(range(1, len(embedding) + 1)) AS dim_idx
                FROM embeddings
            )
            SELECT label, CAST(dim_idx AS BIGINT) AS dim_idx,
                   CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT)
                       AS sum_micro
            FROM u GROUP BY 1, 2
        """,
        "customer_event_counts_left": """
            SELECT c.c_custkey,
                   CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events
            FROM customer c
            LEFT JOIN (
                SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
            ) e ON e.user_id = c.c_custkey
        """,
        "power_users_70": """
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1 HAVING COUNT(*) >= 70
        """,
        "ntile_quartiles_convs": f"""
            WITH t AS ({_T}),
            s AS (
                SELECT conv_id, CAST(SUM(LENGTH(text)) AS BIGINT) AS char_sum
                FROM t GROUP BY 1
            )
            SELECT conv_id, char_sum,
                   CAST(NTILE(4) OVER (ORDER BY char_sum, conv_id)
                        AS BIGINT) AS tile
            FROM s
        """,
        "stratified_sample_documents": """
            WITH r AS (
                SELECT lang, doc_id,
                       md5(CAST(doc_id AS VARCHAR)) AS md5h,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rn
                FROM documents
            )
            SELECT lang, doc_id, md5h FROM r WHERE rn <= 5
        """,
        "corr_qty_price": """
            WITH c AS (
                SELECT CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
                       CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
                FROM lineitem
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sum_x,
                   CAST(SUM(y) AS BIGINT) AS sum_y,
                   CAST(SUM(x * y) AS BIGINT) AS sum_xy,
                   CAST(SUM(x * x) AS BIGINT) AS sum_x2,
                   CAST(SUM(y * y) AS BIGINT) AS sum_y2
            FROM c
        """,
        "monthly_revenue": """
            SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS year,
                   CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS month,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM orders GROUP BY 1, 2
        """,
        "cohort_retention": """
            WITH pairs AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS day
                FROM events
            ),
            firsts AS (
                SELECT user_id, MIN(day) AS first_day FROM pairs GROUP BY 1
            )
            SELECT f.first_day AS cohort_day,
                   p.day - f.first_day AS offset_day,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM pairs p JOIN firsts f USING (user_id)
            GROUP BY 1, 2
        """,
        "funnel_signup_purchase": """
            WITH agg AS (
                SELECT user_id,
                       MIN(CASE WHEN event_type = 'signup'
                                THEN epoch_us(ts) END) AS a_min,
                       MAX(CASE WHEN event_type = 'purchase'
                                THEN epoch_us(ts) END) AS b_max
                FROM events GROUP BY 1
            )
            SELECT user_id,
                   CAST(a_min AS BIGINT) AS first_ts_us,
                   COALESCE(b_max > a_min, FALSE) AS converted
            FROM agg WHERE a_min IS NOT NULL
        """,
        "daily_counts_full_outer": """
            WITH o AS (
                SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                       CAST(COUNT(*) AS BIGINT) AS n_orders
                FROM orders GROUP BY 1
            ),
            e AS (
                SELECT epoch_us(ts) // 86400000000 AS day,
                       CAST(COUNT(*) AS BIGINT) AS n_events
                FROM events GROUP BY 1
            )
            SELECT COALESCE(o.day, e.day) AS day,
                   COALESCE(o.n_orders, 0) AS n_orders,
                   COALESCE(e.n_events, 0) AS n_events
            FROM o FULL OUTER JOIN e ON o.day = e.day
        """,
        "gram_matrix_embeddings": """
            WITH u AS (
                SELECT vec_id,
                       UNNEST(embedding) AS e,
                       UNNEST(range(1, len(embedding) + 1)) AS d
                FROM embeddings
            ),
            m AS (
                SELECT vec_id, d,
                       CAST(FLOOR(CAST(e AS DOUBLE) * 1000) AS BIGINT) AS v
                FROM u
            )
            SELECT a.d AS dim_i, b.d AS dim_j,
                   CAST(SUM(a.v * b.v) AS BIGINT) AS sum_prod
            FROM m a JOIN m b USING (vec_id)
            GROUP BY 1, 2
        """,
        "rolling_7d_user_value": """
            SELECT user_id, ts,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 7 DAY PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS win_cents
            FROM events
        """,
        "source_share_ppm": """
            WITH c AS (
                SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
                FROM documents GROUP BY 1
            )
            SELECT source, n_docs,
                   CAST(n_docs * 1000000 // SUM(n_docs) OVER ()
                        AS BIGINT) AS share_ppm
            FROM c
        """,
        "orders_above_customer_avg": """
            WITH o AS (
                SELECT o_orderkey, o_custkey,
                       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
                FROM orders
            ),
            a AS (
                SELECT o_custkey, SUM(price_cents) AS sum_cents,
                       CAST(COUNT(*) AS BIGINT) AS n_orders
                FROM o GROUP BY 1
            )
            SELECT o.o_orderkey, o.o_custkey, o.price_cents
            FROM o JOIN a USING (o_custkey)
            WHERE o.price_cents * a.n_orders > a.sum_cents
        """,
        "props_k_stats": """
            WITH x AS (
                SELECT event_type,
                       CAST(regexp_extract(props, '"k": (\\d+)', 1)
                            AS BIGINT) AS k
                FROM events
                WHERE regexp_matches(props, '"k": (\\d+)')
            )
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   CAST(MAX(k) AS BIGINT) AS max_k
            FROM x GROUP BY 1
        """,
        "skew_join_events_customers": """
            SELECT e.event_id, e.user_id, c.c_mktsegment
            FROM events e JOIN customer c ON c.c_custkey = e.user_id
        """,
        "event_transitions": """
            WITH s AS (
                SELECT event_type,
                       LEAD(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS next_type
                FROM events
            )
            SELECT event_type AS from_type, next_type AS to_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM s WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        """,
        "funnel_latency": """
            WITH s AS (
                SELECT user_id,
                       CAST(MIN(epoch_us(ts)) AS BIGINT) AS signup_us
                FROM events WHERE event_type = 'signup' GROUP BY 1
            ),
            p AS (
                SELECT e.user_id,
                       CAST(MIN(epoch_us(e.ts)) AS BIGINT) AS conv_us
                FROM events e JOIN s USING (user_id)
                WHERE e.event_type = 'purchase'
                  AND epoch_us(e.ts) > s.signup_us
                GROUP BY 1
            )
            SELECT s.user_id, s.signup_us,
                   CAST(p.conv_us - s.signup_us AS BIGINT) AS latency_us
            FROM s JOIN p USING (user_id)
        """,
        "rolling_7d_distinct_users": """
            WITH pairs AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS day
                FROM events
            ),
            cov AS (
                SELECT DISTINCT user_id, day + o AS day
                FROM pairs, range(0, 7) t(o)
            )
            SELECT day, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM cov GROUP BY 1
        """,
        "centroid_similarity_components": """
            WITH u AS (
                SELECT label, UNNEST(embedding) AS e,
                       UNNEST(range(1, len(embedding) + 1)) AS dim_idx
                FROM embeddings
            ),
            s AS (
                SELECT label, dim_idx,
                       SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT))
                           AS sm
                FROM u GROUP BY 1, 2
            ),
            n AS (
                SELECT label, CAST(COUNT(*) AS BIGINT) AS n
                FROM embeddings GROUP BY 1
            )
            SELECT a.label AS label_a, b.label AS label_b,
                   na.n AS n_a, nb.n AS n_b,
                   CAST(SUM(CAST(a.sm AS HUGEINT) * b.sm) AS DOUBLE)
                       AS dot_num,
                   CAST(SUM(CAST(a.sm AS HUGEINT) * a.sm) AS DOUBLE)
                       AS norm_a_sq,
                   CAST(SUM(CAST(b.sm AS HUGEINT) * b.sm) AS DOUBLE)
                       AS norm_b_sq
            FROM s a
            JOIN s b ON a.dim_idx = b.dim_idx AND a.label < b.label
            JOIN n na ON na.label = a.label
            JOIN n nb ON nb.label = b.label
            GROUP BY 1, 2, 3, 4
        """,
        "value_outliers": """
            WITH e AS (
                SELECT event_id, user_id,
                       CAST(ROUND(value * 100) AS BIGINT) AS value_cents
                FROM events
            ),
            m AS (
                SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                       SUM(value_cents) AS s,
                       SUM(CAST(value_cents AS HUGEINT) * value_cents) AS q
                FROM e GROUP BY 1
            )
            SELECT e.event_id, e.user_id, e.value_cents
            FROM e JOIN m USING (user_id)
            WHERE (CAST(m.n AS HUGEINT) * e.value_cents - m.s)
                  * (CAST(m.n AS HUGEINT) * e.value_cents - m.s)
                  > 9 * (CAST(m.n AS HUGEINT) * m.q
                         - CAST(m.s AS HUGEINT) * m.s)
        """,
        "promo_revenue_ppm": """
            WITH r AS (
                SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                           AS rev,
                       p.p_type LIKE 'PROMO%' AS is_promo
                FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            )
            SELECT CAST(SUM(CASE WHEN is_promo THEN rev ELSE 0 END)
                        AS BIGINT) AS promo_rev,
                   CAST(SUM(rev) AS BIGINT) AS total_rev,
                   CAST(CAST(SUM(CASE WHEN is_promo THEN rev ELSE 0 END)
                             AS HUGEINT) * 1000000
                        // SUM(rev) AS BIGINT) AS share_ppm
            FROM r
        """,
        "monthly_revenue_change": """
            WITH m AS (
                SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS year,
                       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS month,
                       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                            AS BIGINT) AS revenue_cents
                FROM orders GROUP BY 1, 2
            ),
            w AS (
                SELECT year, month, revenue_cents,
                       LAG(revenue_cents) OVER (ORDER BY year, month)
                           AS prev_cents
                FROM m
            )
            SELECT year, month, revenue_cents, prev_cents,
                   CAST((revenue_cents - prev_cents) * 1000000
                        // prev_cents AS BIGINT) AS change_ppm
            FROM w WHERE prev_cents IS NOT NULL
        """,
    }
    # the distributed propagate+pointer-jump closure computes the SAME
    # relation as the driver union-find version — one oracle serves both
    out["neardup_groups_distributed"] = out["neardup_groups"]
    out["ohlc_1m"] = """
        WITH e AS (
            SELECT date_trunc('minute', ts) AS w, ts, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS v
            FROM events
        ),
        r AS (
            SELECT w, v,
                   ROW_NUMBER() OVER (PARTITION BY w
                                      ORDER BY ts, event_id) AS rn_a,
                   ROW_NUMBER() OVER (PARTITION BY w
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM e
        )
        SELECT w AS window_start,
               CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS BIGINT) AS open_cents,
               CAST(MAX(v) AS BIGINT) AS high_cents,
               CAST(MIN(v) AS BIGINT) AS low_cents,
               CAST(MAX(CASE WHEN rn_d = 1 THEN v END) AS BIGINT) AS close_cents,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM r GROUP BY 1
    """
    out["time_weighted_value"] = """
        WITH e AS (
            SELECT user_id, ts, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS v
            FROM events
        ),
        d AS (
            SELECT user_id, v,
                   (epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id))
                    - epoch_us(ts)) // 1000000 AS dt_s
            FROM e
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(SUM(v * dt_s) AS BIGINT) AS num_cents_s,
               CAST(SUM(dt_s) AS BIGINT) AS den_s
        FROM d WHERE dt_s IS NOT NULL GROUP BY 1
    """
    out["latest_event_per_user"] = """
        SELECT CAST(user_id AS BIGINT) AS user_id, ts,
               CAST(event_id AS BIGINT) AS event_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS value_cents
        FROM events
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) = 1
    """
    out["conv_trend"] = f"""
        WITH t AS ({_T})
        SELECT conv_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(turn_idx) AS BIGINT) AS sum_x,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_y,
               CAST(SUM(turn_idx * LENGTH(text)) AS BIGINT) AS sum_xy,
               CAST(SUM(turn_idx * turn_idx) AS BIGINT) AS sum_x2
        FROM t GROUP BY 1
    """
    out["rolling_minmax_3_turns"] = f"""
        WITH t AS ({_T})
        SELECT conv_id, turn_idx,
               CAST(MIN(LENGTH(text)) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS roll_min,
               CAST(MAX(LENGTH(text)) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS roll_max
        FROM t
    """
    out["ngram_jaccard_neighbors"] = """
        WITH sh AS (
            SELECT DISTINCT d.doc_id,
                   substring(d.text, CAST(g.i AS INT), 3) AS s
            FROM documents d,
                 LATERAL (SELECT UNNEST(range(1, length(d.text) - 1)) AS i) g
            WHERE length(d.text) >= 3
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS doc_a, COUNT(*) AS ni
            FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1 AND b.s = a.s
            GROUP BY 1
        )
        SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
               CAST((COALESCE(i.ni, 0) * 1000000)
                    // (sa.n + sb.n - COALESCE(i.ni, 0)) AS BIGINT)
                   AS jaccard_ppm
        FROM sizes sa
        JOIN sizes sb ON sb.doc_id = sa.doc_id + 1
        LEFT JOIN inter i ON i.doc_a = sa.doc_id
    """
    out["trending_terms_daily"] = f"""
        WITH t AS ({_T}),
        tok AS (
            SELECT date_trunc('day', ts) AS day,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM t
        ),
        c AS (
            SELECT day, term, COUNT(*) AS n
            FROM tok WHERE term <> '' GROUP BY 1, 2
        )
        SELECT day, term, CAST(n AS BIGINT) AS n
        FROM c
        QUALIFY ROW_NUMBER() OVER (PARTITION BY day
                                   ORDER BY n DESC, term ASC) <= 3
    """
    out["partition_fingerprint"] = """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               BIT_XOR(CAST(('0x' || SUBSTRING(md5(CONCAT_WS('|',
                   CAST(event_id AS VARCHAR),
                   CAST(epoch_us(ts) AS VARCHAR),
                   CAST(user_id AS VARCHAR),
                   CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR)
               )), 1, 15)) AS BIGINT)) AS fp
        FROM events GROUP BY 1
    """
    out["snapshot_diff_events"] = """
        WITH a AS (
            SELECT event_id,
                   SUBSTRING(md5(CONCAT_WS('|',
                       CAST(event_id AS VARCHAR),
                       CAST(epoch_us(ts) AS VARCHAR),
                       CAST(user_id AS VARCHAR),
                       CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR)
                   )), 1, 15) AS h
            FROM events WHERE event_id % 89 <> 0
        ),
        b AS (
            SELECT event_id,
                   SUBSTRING(md5(CONCAT_WS('|',
                       CAST(event_id AS VARCHAR),
                       CAST(epoch_us(ts) AS VARCHAR),
                       CAST(user_id AS VARCHAR),
                       CAST(CAST(ROUND(value * 100) AS BIGINT)
                            + CASE WHEN event_id % 101 = 0
                                   THEN 100 ELSE 0 END AS VARCHAR)
                   )), 1, 15) AS h
            FROM events WHERE event_id % 97 <> 0
        )
        SELECT CAST(COALESCE(a.event_id, b.event_id) AS BIGINT) AS event_id,
               CASE WHEN a.event_id IS NULL THEN 'added'
                    WHEN b.event_id IS NULL THEN 'removed'
                    ELSE 'changed' END AS change
        FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
        WHERE a.event_id IS NULL OR b.event_id IS NULL OR a.h <> b.h
    """
    out["debounce_events_10m"] = """
        SELECT event_id, CAST(user_id AS BIGINT) AS user_id, event_type, ts
        FROM (
            SELECT event_id, user_id, event_type, ts,
                   epoch_us(ts) - epoch_us(LAG(ts) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id)) AS gap
            FROM events
        )
        WHERE gap IS NULL OR gap > 600000000
    """
    out["clean_text_documents"] = r"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               trim(regexp_replace(text, '\s+', ' ', 'g')) AS clean,
               CAST(LENGTH(trim(regexp_replace(text, '\s+', ' ', 'g')))
                    AS BIGINT) AS n_chars_clean
        FROM documents
    """
    out["redact_pii_documents"] = r"""
        WITH e AS (
            SELECT doc_id, text,
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '[EMAIL]', 'g') AS t1
            FROM documents
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               regexp_replace(t1, '\b\d{3}[- ]\d{3}[- ]\d{4}\b',
                              '[PHONE]', 'g') AS red_text,
               CAST(len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                   AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t1,
                   '\b\d{3}[- ]\d{3}[- ]\d{4}\b')) AS BIGINT) AS n_phones
        FROM e
    """
    out["user_gap_stats"] = """
        WITH g AS (
            SELECT user_id,
                   (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)))
                       // 1000000 AS gap_s
            FROM events
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
               CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s,
               CAST(SUM(gap_s * gap_s) AS BIGINT) AS sumsq_gap_s,
               CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
               CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
        FROM g WHERE gap_s IS NOT NULL GROUP BY 1
    """
    out["embedding_dim_stats"] = """
        WITH q AS (
            SELECT CAST(g.i AS BIGINT) - 1 AS dim,
                   CAST(FLOOR(CAST(list_extract(e.embedding, CAST(g.i AS INT))
                       AS DOUBLE) * 1000) AS BIGINT) AS qv
            FROM embeddings e,
                 LATERAL (SELECT UNNEST(range(1, 65)) AS i) g
        )
        SELECT dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qv) AS BIGINT) AS sum_q,
               CAST(SUM(qv * qv) AS BIGINT) AS sumsq_q,
               CAST(MIN(qv) AS BIGINT) AS min_q,
               CAST(MAX(qv) AS BIGINT) AS max_q
        FROM q GROUP BY 1
    """
    out["sample_per_source_5"] = """
        SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
               CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        ) <= 5
    """
    out["event_trigrams"] = """
        WITH s AS (
            SELECT event_type AS a,
                   LEAD(event_type, 1) OVER w AS b,
                   LEAD(event_type, 2) OVER w AS c
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n
        FROM s WHERE c IS NOT NULL GROUP BY 1, 2, 3
    """
    out["value_mad_outliers"] = """
        WITH c AS (
            SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS v
            FROM events
        ),
        m AS (SELECT quantile_disc(v, 0.5) AS med FROM c),
        d AS (SELECT c.event_id, c.v, ABS(c.v - m.med) AS dev FROM c, m),
        md AS (SELECT quantile_disc(dev, 0.5) AS mad FROM d)
        SELECT CAST(d.event_id AS BIGINT) AS event_id,
               CAST(d.v AS BIGINT) AS value_cents,
               CAST(d.dev AS BIGINT) AS dev
        FROM d, md WHERE d.dev > 5 * md.mad
    """
    out["drop_repeated_turns"] = f"""
        WITH t AS ({_T})
        SELECT conv_id, turn_idx FROM (
            SELECT conv_id, turn_idx, text,
                   LAG(text) OVER (PARTITION BY conv_id
                                   ORDER BY turn_idx) AS prev
            FROM t
        )
        WHERE prev IS NULL OR text <> prev
    """
    out["q3_unshipped_revenue"] = """
        WITH r AS (
            SELECT l.l_orderkey AS orderkey, o.o_orderdate AS orderdate,
                   SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                       AS revenue_u
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-01'
              AND l.l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY 1, 2
        )
        SELECT CAST(orderkey AS BIGINT) AS orderkey, orderdate,
               CAST(revenue_u AS BIGINT) AS revenue_u
        FROM r ORDER BY revenue_u DESC, orderkey ASC LIMIT 10
    """
    out["p95_chars_1h"] = f"""
        WITH t AS ({_T}),
        s AS (
            SELECT date_trunc('hour', ts) AS w,
                   list_sort(list(LENGTH(text))) AS l,
                   COUNT(*) AS n
            FROM t GROUP BY 1
        )
        SELECT w AS window_start,
               CAST(l[GREATEST(CAST(CEIL(0.95 * n) AS BIGINT), 1)] AS BIGINT)
                   AS p_chars,
               CAST(n AS BIGINT) AS n_turns
        FROM s
    """
    out["top_users_by_active_days"] = """
        WITH d AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM d GROUP BY 1 ORDER BY n_days DESC, user_id ASC LIMIT 10
    """
    out["rollup_1w_cascade"] = _rollup_sql("week")
    # dyadic truncated EWMA (alpha=1/2, K=8, zero-padded): every term and
    # partial sum is exactly representable in float64, so the engine's numpy
    # shifted-add kernel matches this expression bit-for-bit
    out["ewma_chars_8"] = f"""
        WITH t AS ({_T})
        SELECT conv_id, turn_idx,
               0.5        * LENGTH(text)
             + 0.25       * COALESCE(LAG(LENGTH(text), 1) OVER w, 0)
             + 0.125      * COALESCE(LAG(LENGTH(text), 2) OVER w, 0)
             + 0.0625     * COALESCE(LAG(LENGTH(text), 3) OVER w, 0)
             + 0.03125    * COALESCE(LAG(LENGTH(text), 4) OVER w, 0)
             + 0.015625   * COALESCE(LAG(LENGTH(text), 5) OVER w, 0)
             + 0.0078125  * COALESCE(LAG(LENGTH(text), 6) OVER w, 0)
             + 0.00390625 * COALESCE(LAG(LENGTH(text), 7) OVER w, 0) AS ewma
        FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
    """
    out["q10_returned_top20"] = """
        SELECT CAST(c.c_custkey AS BIGINT) AS custkey, c.c_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_u
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1996-01-01'
        GROUP BY 1, 2
        ORDER BY revenue_u DESC, custkey ASC LIMIT 20
    """
    out["event_type_user_overlap"] = """
        WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        c AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY 1),
        p AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS n_both
            FROM du a JOIN du b USING (user_id)
            WHERE a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b,
               CAST(n_both AS BIGINT) AS n_both,
               CAST(ca.n AS BIGINT) AS n_a,
               CAST(cb.n AS BIGINT) AS n_b,
               CAST(n_both AS DOUBLE) / (ca.n + cb.n - n_both) AS jaccard
        FROM p
        JOIN c ca ON ca.event_type = type_a
        JOIN c cb ON cb.event_type = type_b
        ORDER BY type_a, type_b
    """
    out["scd2_value_history"] = """
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
               ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM events
    """
    out["concurrent_convs_at_start"] = f"""
        WITH t AS ({_T}),
        spans AS (SELECT conv_id, MIN(ts) AS s, MAX(ts) AS e FROM t GROUP BY 1)
        SELECT a.conv_id, CAST(COUNT(*) AS BIGINT) AS n_active
        FROM spans a JOIN spans b ON b.s <= a.s AND a.s <= b.e
        GROUP BY 1
    """
    # rank convention: 1-based sorted index ceil(d*n/10) (clamped to >= 1)
    out["value_deciles"] = """
        WITH v AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
        b AS (SELECT list_sort(list(c)) AS l, COUNT(*) AS n FROM v)
        SELECT CAST(d AS BIGINT) AS decile,
               l[GREATEST(CAST(CEIL(d * n / 10.0) AS BIGINT), 1)] AS value_cents
        FROM b, (SELECT UNNEST(range(1, 10)) AS d)
    """
    out["winsorized_value_stats"] = """
        WITH v AS (SELECT event_type,
                          CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
        b AS (SELECT list_sort(list(c)) AS l, COUNT(*) AS n FROM v),
        lim AS (SELECT l[GREATEST(CAST(CEIL(0.05 * n) AS BIGINT), 1)] AS lo,
                       l[GREATEST(CAST(CEIL(0.95 * n) AS BIGINT), 1)] AS hi
                FROM b)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(LEAST(GREATEST(c, lo), hi)) AS BIGINT) AS wsum_cents
        FROM v, lim GROUP BY 1
    """
    out["role_runs"] = f"""
        WITH t AS ({_T}),
        x AS (
            SELECT conv_id, role,
                   ROW_NUMBER() OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx) AS rn,
                   ROW_NUMBER() OVER (PARTITION BY conv_id, role
                                      ORDER BY turn_idx) AS rr
            FROM t
        ),
        g AS (
            SELECT conv_id, role, rn - rr AS grp,
                   COUNT(*) AS run_len, MIN(rn) AS first_rn
            FROM x GROUP BY 1, 2, 3
        )
        SELECT conv_id,
               ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY first_rn)
                   AS run_idx,
               role,
               CAST(run_len AS BIGINT) AS run_len
        FROM g
    """
    # the merged late+on-time tier must equal the single-pass rollup
    out["tier_upsert_late"] = _ROLLUP_SQL
    out["curation_funnel"] = r"""
        WITH q AS (
            SELECT doc_id, source, text,
                   CAST(LENGTH(text) AS BIGINT) AS n_chars,
                   LEN(regexp_extract_all(text, '\S+')) AS n_words,
                   LEN(regexp_extract_all(LOWER(text),
                       '\b(the|a|and|of|to|in|is)\b')) AS n_stop
            FROM documents
        ),
        k AS (SELECT * FROM q
              WHERE n_chars >= 50 AND n_words >= 10 AND n_stop >= 1),
        d AS (SELECT source FROM k
              QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1),
        kc AS (SELECT source, COUNT(*) AS n_kept FROM d GROUP BY 1)
        SELECT q.source,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN n_chars >= 50 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_len_ok,
               CAST(SUM(CASE WHEN n_chars >= 50 AND n_words >= 10
                              AND n_stop >= 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_qual_ok,
               CAST(COALESCE(ANY_VALUE(kc.n_kept), 0) AS BIGINT) AS n_kept
        FROM q LEFT JOIN kc ON q.source = kc.source
        GROUP BY 1
    """
    out["corpus_intake_counts"] = r"""
        WITH q AS (
            SELECT doc_id, source, text,
                   CAST(LENGTH(text) AS BIGINT) AS n_chars,
                   LEN(regexp_extract_all(text, '\S+')) AS n_words,
                   LEN(regexp_extract_all(LOWER(text),
                       '\b(the|a|and|of|to|in|is)\b')) AS n_stop
            FROM documents
        ),
        k AS (SELECT * FROM q
              WHERE n_chars >= 50 AND n_words >= 10 AND n_stop >= 1),
        d AS (SELECT * FROM k
              QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
               CAST(SUM(n_chars) AS BIGINT) AS chars_kept
        FROM d GROUP BY 1
    """
    # ddsketch_p95_daily: sketch answer, not the exact quantile -> rows-only
    _EWMA_TERMS = """0.5        * {c}
             + 0.25       * COALESCE(LAG({c}, 1) OVER {w}, 0)
             + 0.125      * COALESCE(LAG({c}, 2) OVER {w}, 0)
             + 0.0625     * COALESCE(LAG({c}, 3) OVER {w}, 0)
             + 0.03125    * COALESCE(LAG({c}, 4) OVER {w}, 0)
             + 0.015625   * COALESCE(LAG({c}, 5) OVER {w}, 0)
             + 0.0078125  * COALESCE(LAG({c}, 6) OVER {w}, 0)
             + 0.00390625 * COALESCE(LAG({c}, 7) OVER {w}, 0)"""
    out["dewma_chars_8"] = f"""
        WITH t AS ({_T}),
        e AS (
            SELECT conv_id, turn_idx, ts,
                   {_EWMA_TERMS.format(c="LENGTH(text)", w="w")} AS ewma
            FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
        )
        SELECT conv_id, turn_idx,
               {_EWMA_TERMS.format(c="ewma", w="w2")} AS dewma
        FROM e WINDOW w2 AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
    """
    out["posting_stats_documents"] = """
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents
        ),
        d AS (SELECT DISTINCT term, doc_id FROM tok WHERE term <> '')
        SELECT term,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc,
               CAST(MAX(doc_id) AS BIGINT) AS max_doc
        FROM d GROUP BY 1
    """
    out["skew_census_events"] = """
        WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1)
        SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(MAX(n) AS BIGINT) AS top1_n,
               CAST(MAX(n) * 1000000 // SUM(n) AS BIGINT) AS top1_share_ppm
        FROM c
    """
    out["q5_local_supplier_volume"] = """
        SELECT n.n_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_u
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE s.s_nationkey = c.c_nationkey
          AND r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1
        ORDER BY revenue_u DESC, n_name ASC
    """
    out["q18_large_volume_customers"] = """
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
                       AS sum_qty_u
            FROM lineitem GROUP BY 1
            HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 25000
        )
        SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,
               CAST(o.o_orderkey AS BIGINT) AS o_orderkey, o.o_orderdate,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS totalprice_u,
               big.sum_qty_u
        FROM big
        JOIN orders o ON big.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY totalprice_u DESC, o_orderkey ASC LIMIT 100
    """
    out["vocab_size_documents"] = """
        SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms
        FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents
        )
        WHERE term <> ''
    """
    out["length_percentile_documents"] = """
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(LENGTH(text) AS BIGINT) AS n_chars,
               CAST((RANK() OVER (ORDER BY LENGTH(text)) - 1) * 1000000
                    // COUNT(*) OVER () AS BIGINT) AS pct_ppm
        FROM documents
    """
    out["term_pair_cooccurrence"] = """
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents
        ),
        d AS (SELECT DISTINCT doc_id, term FROM tok WHERE term <> ''),
        capped AS (
            SELECT doc_id, term FROM d
            QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY term) <= 64
        ),
        p AS (
            SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS n
            FROM capped a
            JOIN capped b ON a.doc_id = b.doc_id AND a.term < b.term
            GROUP BY 1, 2
        )
        SELECT term_a, term_b, CAST(n AS BIGINT) AS n
        FROM p ORDER BY n DESC, term_a ASC, term_b ASC LIMIT 20
    """
    out["daily_dashboard"] = """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1, 2
    """
    out["wau_retention"] = """
        WITH c AS (
            SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP) AS w,
                   user_id
            FROM events
        )
        SELECT a.w AS week_start,
               CAST(COUNT(*) AS BIGINT) AS wau,
               CAST(SUM(CASE WHEN b.user_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS retained,
               CAST(SUM(CASE WHEN b.user_id IS NOT NULL
                             THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS ret_ppm
        FROM c a
        LEFT JOIN c b
          ON b.user_id = a.user_id AND b.w = a.w + INTERVAL 7 DAY
        GROUP BY 1
    """
    out["ship_latency_by_priority"] = """
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(date_diff('day', o.o_orderdate, l.l_shipdate))
                    AS BIGINT) AS sum_days,
               CAST(MAX(date_diff('day', o.o_orderdate, l.l_shipdate))
                    AS BIGINT) AS max_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    """
    out["benford_first_digit"] = """
        SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    """
    out["calendarize_spans"] = f"""
        WITH t AS ({_T}),
        spans AS (SELECT conv_id, MIN(ts) AS s, MAX(ts) AS e FROM t GROUP BY 1),
        days AS (
            SELECT conv_id, s, e,
                   UNNEST(generate_series(date_trunc('day', s),
                                          date_trunc('day', e),
                                          INTERVAL 1 DAY)) AS day
            FROM spans
        )
        SELECT conv_id,
               CAST(day AS TIMESTAMP) AS day,
               CAST(epoch_us(LEAST(e, CAST(day AS TIMESTAMP) + INTERVAL 1 DAY))
                    - epoch_us(GREATEST(s, CAST(day AS TIMESTAMP))) AS BIGINT)
                   AS active_us
        FROM days
    """
    # cusum_shift_users: recursive max has no SQL analog -> rows-only
    out["pivot_turns_ipc"] = _T
    out["percent_rank_convs"] = f"""
        WITH t AS ({_T}),
        s AS (
            SELECT conv_id, CAST(SUM(LENGTH(text)) AS BIGINT) AS char_sum
            FROM t GROUP BY 1
        ),
        c AS (
            SELECT CASE WHEN CAST(SUBSTR(conv_id, 2) AS BIGINT) % 2 = 0
                        THEN 'even' ELSE 'odd' END AS cohort,
                   conv_id, char_sum
            FROM s
        )
        SELECT cohort, conv_id, char_sum,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM c WINDOW w AS (PARTITION BY cohort ORDER BY char_sum)
    """
    out["orphan_lineitems"] = """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans
        FROM lineitem l
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
        )
    """
    out["median_value_per_type"] = """
        WITH v AS (SELECT event_type,
                          CAST(ROUND(value * 100) AS BIGINT) AS c FROM events),
        s AS (SELECT event_type, list_sort(list(c)) AS l, COUNT(*) AS n
              FROM v GROUP BY 1)
        SELECT event_type,
               l[CAST(CEIL(n / 2.0) AS BIGINT)] AS median_cents
        FROM s
    """
    out["wau_by_week"] = """
        WITH d AS (
            SELECT DISTINCT date_trunc('week', ts) AS week_start, user_id
            FROM events
        )
        SELECT CAST(week_start AS TIMESTAMP) AS week_start,
               CAST(COUNT(*) AS BIGINT) AS wau
        FROM d GROUP BY 1
    """
    out["doc_len_histogram"] = """
        SELECT source,
               CAST(LENGTH(text) // 100 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    """
    # continuous-aggregate invariant: hourly-from-raw EXCEPT hourly-from-
    # minutely is empty iff the cascade preserves every metric — the SQL
    # restatement of the engine's signed-union residue audit
    out["tier_consistency_1h"] = f"""
        WITH t AS ({_T}),
        a AS (
            SELECT conv_id, date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n, SUM(LENGTH(text)) AS s
            FROM t GROUP BY 1, 2
        ),
        m AS (
            SELECT conv_id, date_trunc('minute', ts) AS wm,
                   date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n, SUM(LENGTH(text)) AS s
            FROM t GROUP BY 1, 2, 3
        ),
        b AS (
            SELECT conv_id, window_start, SUM(n) AS n, SUM(s) AS s
            FROM m GROUP BY 1, 2
        )
        SELECT conv_id, window_start
        FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    """
    out["longest_streak_days"] = """
        WITH d AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events
        ),
        x AS (
            SELECT user_id, day,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
            FROM d
        ),
        g AS (
            SELECT user_id, COUNT(*) AS cnt
            FROM x GROUP BY user_id, day - CAST(rn AS INTEGER)
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(MAX(cnt) AS BIGINT) AS longest_streak
        FROM g GROUP BY 1
    """
    # ACF of the dense zero-filled minute-count series: integer Pearson
    # components per lag (see stages/timeseries.acf_minute_counts).
    out["acf_minute_counts"] = f"""
        WITH t AS ({_T}),
        c AS (SELECT date_trunc('minute', ts) AS m, COUNT(*) AS n
              FROM t GROUP BY 1),
        grid AS (
            SELECT UNNEST(generate_series((SELECT MIN(m) FROM c),
                                          (SELECT MAX(m) FROM c),
                                          INTERVAL 1 MINUTE)) AS m
        ),
        dense AS (
            SELECT grid.m, COALESCE(c.n, 0) AS n
            FROM grid LEFT JOIN c ON grid.m = c.m
        ),
        lags AS (SELECT UNNEST([1, 2, 3]) AS lag),
        pairs AS (
            SELECT l.lag, a.n AS x, b.n AS y
            FROM lags l
            JOIN dense a ON TRUE
            JOIN dense b ON b.m = a.m + l.lag * INTERVAL 1 MINUTE
        )
        SELECT lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sum_x,
               CAST(SUM(y) AS BIGINT) AS sum_y,
               CAST(SUM(x * y) AS BIGINT) AS sum_xy,
               CAST(SUM(x * x) AS BIGINT) AS sum_x2,
               CAST(SUM(y * y) AS BIGINT) AS sum_y2
        FROM pairs GROUP BY 1
    """
    out["hour_dod_delta"] = f"""
        WITH t AS ({_T}),
        c AS (SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
              FROM t GROUP BY 1)
        SELECT a.hour,
               CAST(a.n AS BIGINT) AS n,
               CAST(b.n AS BIGINT) AS prev_n,
               CAST(a.n - b.n AS BIGINT) AS delta
        FROM c a JOIN c b ON b.hour = a.hour - INTERVAL 24 HOUR
    """
    out["role_simpson_per_conv"] = f"""
        WITH t AS ({_T}),
        rc AS (SELECT conv_id, role, COUNT(*) AS c FROM t GROUP BY 1, 2)
        SELECT conv_id,
               CAST(SUM(c) AS BIGINT) AS n_turns,
               CAST(SUM(c * c) AS BIGINT) AS sum_c2
        FROM rc GROUP BY 1
    """
    # top-200 terms (n DESC, term ASC — the engine's exact tie-break), then
    # every pair at levenshtein distance exactly 1
    out["typo_term_pairs"] = """
        WITH corpus AS (
            SELECT text FROM documents
            UNION ALL SELECT props AS text FROM events
        ),
        tok AS (
            SELECT UNNEST(regexp_split_to_array(LOWER(text), '[^a-z0-9]+')) AS term
            FROM corpus
        ),
        tf AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tok
            WHERE term <> '' GROUP BY 1
            ORDER BY n DESC, term ASC LIMIT 200
        )
        SELECT a.term AS term_a, b.term AS term_b, a.n AS n_a, b.n AS n_b
        FROM tf a JOIN tf b ON a.term < b.term
        WHERE levenshtein(a.term, b.term) = 1
    """
    # Holt-Winters: BIGINT '//' in DuckDB truncates toward zero; the Ray
    # kernel uses the same truncating division (_tdiv), so every smoothing
    # step is bit-identical. The seasonal state rides the recursion as a
    # rotating 7-element LIST.
    out["dtw_event_types"] = """
        WITH RECURSIVE counts AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        spine AS (
            SELECT CAST(UNNEST(generate_series(
                       CAST((SELECT MIN(day) FROM counts) AS TIMESTAMP),
                       CAST((SELECT MAX(day) FROM counts) AS TIMESTAMP),
                       INTERVAL 1 DAY)) AS DATE) AS day
        ),
        types AS (SELECT DISTINCT event_type FROM counts),
        grid AS (
            SELECT t.event_type, s.day,
                   ROW_NUMBER() OVER (PARTITION BY t.event_type
                                      ORDER BY s.day) - 1 AS i,
                   COALESCE(c.n, 0) AS n
            FROM types t CROSS JOIN spine s
            LEFT JOIN counts c
              ON c.event_type = t.event_type AND c.day = s.day
        ),
        prs AS (
            SELECT a.event_type AS ta, b.event_type AS tb
            FROM types a JOIN types b ON a.event_type < b.event_type
        ),
        yy AS (
            SELECT p.ta, p.tb, ga.i, ga.n AS av, gb.n AS bv,
                   LAG(gb.n) OVER w AS bprev,
                   LEAD(gb.n) OVER w AS bnext
            FROM prs p
            JOIN grid ga ON ga.event_type = p.ta
            JOIN grid gb ON gb.event_type = p.tb AND gb.i = ga.i
            WINDOW w AS (PARTITION BY p.ta, p.tb ORDER BY ga.i)
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM spine),
        rec AS (
            SELECT ta, tb, CAST(0 AS BIGINT) AS i,
                   CAST(4611686018427387904 AS BIGINT) AS dl,
                   ABS(av - bv) AS dm,
                   CASE WHEN bnext IS NULL
                        THEN CAST(4611686018427387904 AS BIGINT)
                        ELSE ABS(av - bnext) + ABS(av - bv) END AS dr
            FROM yy WHERE i = 0
            UNION ALL
            SELECT ta, tb, i, dl, dm,
                   CASE WHEN bnext IS NULL
                        THEN CAST(4611686018427387904 AS BIGINT)
                        ELSE ABS(av - bnext) + LEAST(pdr, dm) END AS dr
            FROM (
                SELECT ta, tb, i, av, bnext, dl, pdr,
                       ABS(av - bv) + LEAST(pdm, pdr, dl) AS dm
                FROM (
                    SELECT y.ta, y.tb, y.i, y.av, y.bv, y.bnext,
                           r.dm AS pdm, r.dr AS pdr,
                           ABS(y.av - y.bprev) + LEAST(r.dl, r.dm) AS dl
                    FROM rec r JOIN yy y
                      ON y.ta = r.ta AND y.tb = r.tb AND y.i = r.i + 1
                )
            )
        )
        SELECT r.ta AS type_a, r.tb AS type_b,
               nn.n AS n_days, r.dm AS dtw
        FROM rec r, nn
        WHERE r.i = nn.n - 1
        ORDER BY 1, 2
    """
    out["kaplan_meier_sessions"] = """
        WITH RECURSIVE e AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, ts,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
            FROM e
        ),
        sess AS (
            SELECT user_id, sid, MIN(ts) AS f, MAX(ts) AS l
            FROM s GROUP BY 1, 2
        ),
        mx AS (SELECT MAX(ts) AS m FROM events),
        durs AS (
            SELECT (epoch_us(l) - epoch_us(f)) // 60000000 AS t,
                   (epoch_us((SELECT m FROM mx)) - epoch_us(l)) < 1800000000
                       AS censored
            FROM sess
        ),
        census AS (
            SELECT t,
                   CAST(SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d,
                   CAST(SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS c
            FROM durs GROUP BY 1
        ),
        ordered AS (
            SELECT t, d, c, ROW_NUMBER() OVER (ORDER BY t) AS rn,
                   (SELECT COUNT(*) FROM durs)
                     - COALESCE(SUM(d + c) OVER (
                           ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS n_risk
            FROM census
        ),
        rec AS (
            SELECT CAST(0 AS BIGINT) AS rn, CAST(1000000 AS BIGINT) AS s
            UNION ALL
            SELECT o.rn,
                   CASE WHEN o.d > 0
                        THEN (r.s * (o.n_risk - o.d)) // o.n_risk
                        ELSE r.s END
            FROM rec r JOIN ordered o ON o.rn = r.rn + 1
        )
        SELECT o.t AS duration_min,
               CAST(o.n_risk AS BIGINT) AS n_risk,
               o.d AS n_events,
               o.c AS n_censored,
               r.s AS survival_ppm
        FROM ordered o JOIN rec r ON r.rn = o.rn
        WHERE o.d > 0
        ORDER BY 1
    """
    out["holt_winters_daily"] = """
        WITH RECURSIVE counts AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        spine AS (
            SELECT event_type,
                   CAST(UNNEST(generate_series(CAST(mn AS TIMESTAMP),
                                               CAST(mx AS TIMESTAMP),
                                               INTERVAL 1 DAY)) AS DATE) AS day
            FROM (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
                  FROM counts GROUP BY 1)
        ),
        y AS (
            SELECT s.event_type, s.day,
                   ROW_NUMBER() OVER (PARTITION BY s.event_type
                                      ORDER BY s.day) - 1 AS t,
                   COALESCE(c.n, 0) AS n,
                   COALESCE(c.n, 0) * 1000000 AS ym
            FROM spine s LEFT JOIN counts c
              ON c.event_type = s.event_type AND c.day = s.day
        ),
        init AS (
            SELECT event_type,
                   SUM(CASE WHEN t < 7 THEN ym ELSE 0 END) // 7 AS l0,
                   COUNT(*) AS n_days
            FROM y GROUP BY 1 HAVING COUNT(*) >= 8
        ),
        s0 AS (
            SELECT y.event_type, LIST(y.ym - i.l0 ORDER BY y.t) AS s
            FROM y JOIN init i ON y.event_type = i.event_type
            WHERE y.t < 7 GROUP BY 1
        ),
        rec AS (
            SELECT i.event_type, CAST(6 AS BIGINT) AS t, i.l0 AS lev,
                   CAST(0 AS BIGINT) AS tr, s0.s AS s,
                   CAST(NULL AS BIGINT) AS f, CAST(NULL AS BIGINT) AS err
            FROM init i JOIN s0 ON i.event_type = s0.event_type
            UNION ALL
            SELECT event_type, t, lev,
                   (lev - plev) // 10 + (9 * ptr) // 10 AS tr,
                   list_append(ps[2:], (ym - lev) // 4 + (3 * ps[1]) // 4) AS s,
                   f, ym - f AS err
            FROM (
                SELECT r.event_type, r.t + 1 AS t,
                       (q.ym - r.s[1]) // 5 + (4 * (r.lev + r.tr)) // 5 AS lev,
                       r.lev AS plev, r.tr AS ptr, r.s AS ps,
                       r.lev + r.tr + r.s[1] AS f, q.ym AS ym
                FROM rec r JOIN y q
                  ON q.event_type = r.event_type AND q.t = r.t + 1
            )
        )
        SELECT r.event_type,
               CAST(q.day AS TIMESTAMP) AS day,
               q.n AS y,
               r.f AS forecast_micro,
               r.err AS err_micro,
               r.lev AS level_micro,
               r.tr AS trend_micro
        FROM rec r JOIN y q ON q.event_type = r.event_type AND q.t = r.t
        WHERE r.t >= 7
        ORDER BY 1, 2
    """
    out["fastss_edit1_pairs"] = """
        WITH corpus AS (
            SELECT text FROM documents
            UNION ALL SELECT props AS text FROM events
            UNION ALL SELECT c_name AS text FROM customer
            UNION ALL SELECT p_name AS text FROM part
        ),
        tok AS (
            SELECT UNNEST(regexp_split_to_array(LOWER(text), '[^a-z0-9]+')) AS term
            FROM corpus
        ),
        tf AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tok
            WHERE term <> '' GROUP BY 1
        )
        SELECT a.term AS term_a, b.term AS term_b, a.n AS n_a, b.n AS n_b
        FROM tf a JOIN tf b
          ON a.term < b.term
         AND ABS(LENGTH(a.term) - LENGTH(b.term)) <= 1
        WHERE LENGTH(a.term) <= 16 AND LENGTH(b.term) <= 16
          AND levenshtein(a.term, b.term) = 1
        ORDER BY term_a, term_b
    """
    out["link_predict_suppliers"] = """
        WITH e AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ),
        deg AS (
            SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1
        ),
        w AS (
            SELECT a.s AS sa, b.s AS sb, CAST(COUNT(*) AS BIGINT) AS cn
            FROM e a JOIN e b ON a.c = b.c AND a.s < b.s
            GROUP BY 1, 2
        )
        SELECT CAST(w.sa AS BIGINT) AS supplier_a,
               CAST(w.sb AS BIGINT) AS supplier_b,
               w.cn AS common_customers,
               da.d AS deg_a,
               db.d AS deg_b,
               (w.cn * 1000000) // (da.d + db.d - w.cn) AS jaccard_ppm
        FROM w JOIN deg da ON w.sa = da.s JOIN deg db ON w.sb = db.s
        ORDER BY jaccard_ppm DESC, common_customers DESC,
                 supplier_a ASC, supplier_b ASC
        LIMIT 50
    """
    out["theil_sen_daily_trend"] = """
        WITH d AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        p AS (
            SELECT a.user_id, b.n - a.n AS num,
                   CAST(date_diff('day', a.day, b.day) AS BIGINT) AS den
            FROM d a JOIN d b ON a.user_id = b.user_id AND b.day > a.day
        ),
        r AS (
            SELECT user_id, num, den,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(num AS DOUBLE) / den, num, den) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS cnt
            FROM p
        ),
        nd AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days FROM d GROUP BY 1)
        SELECT CAST(r.user_id AS BIGINT) AS user_id,
               nd.n_days,
               CAST(FLOOR(1000000.0 * num / den) AS BIGINT) AS slope_ppm
        FROM r JOIN nd ON r.user_id = nd.user_id
        WHERE rn = (cnt + 1) // 2
    """
    out["q4_late_ship_priority"] = """
        WITH ms AS (
            SELECT l_orderkey, MAX(l_shipdate) AS max_ship
            FROM lineitem GROUP BY 1
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o JOIN ms ON o.o_orderkey = ms.l_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
          AND ms.max_ship > o.o_orderdate + INTERVAL 90 DAY
        GROUP BY 1
    """
    # Q6: integer 1e-4-currency revenue (price_cents × disc_cents)
    out["q6_forecast_revenue"] = """
        SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                                 * CAST(ROUND(l_discount * 100) AS BIGINT)), 0)
                    AS BIGINT) AS revenue_e4,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
          AND CAST(ROUND(l_quantity) AS BIGINT) < 24
    """
    out["q12_priority_by_status"] = """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    """
    out["q13_customer_distribution"] = """
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY 1
        )
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(COUNT(*) AS BIGINT) AS custdist
        FROM per_cust GROUP BY 1
    """
    out["chi2_independence_cells"] = """
        WITH cells AS (
            SELECT event_type,
                   CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
                   CAST(COUNT(*) AS BIGINT) AS observed
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, dow, observed,
               CAST(SUM(observed) OVER (PARTITION BY event_type) AS BIGINT)
                   AS row_total,
               CAST(SUM(observed) OVER (PARTITION BY dow) AS BIGINT)
                   AS col_total,
               CAST(SUM(observed) OVER () AS BIGINT) AS grand_total
        FROM cells
    """
    out["q8_market_share_ppm"] = """
        WITH rn AS (
            SELECT n_nationkey FROM nation
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        ),
        j AS (
            SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                       AS rev_e4,
                   CASE WHEN s.s_nationkey IN
                        (SELECT n_nationkey FROM nation WHERE n_name = 'JAPAN')
                        THEN 1 ELSE 0 END AS is_target
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            WHERE c.c_nationkey IN (SELECT n_nationkey FROM rn)
        )
        SELECT o_year,
               CAST(1000000 * SUM(rev_e4 * is_target) // SUM(rev_e4) AS BIGINT)
                   AS share_ppm,
               CAST(SUM(rev_e4 * is_target) AS BIGINT) AS num_rev_e4,
               CAST(SUM(rev_e4) AS BIGINT) AS den_rev_e4
        FROM j GROUP BY 1
    """
    out["adaptive_join_container_revenue"] = """
        SELECT p.p_brand AS p_brand,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_c,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
    """
    out["q15_top_supplier"] = """
        WITH rev AS (
            SELECT l_suppkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                       AS total_rev_e4
            FROM lineitem
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1996-04-01'
            GROUP BY 1
        )
        SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey,
               s.s_name AS s_name,
               CAST(r.total_rev_e4 AS BIGINT) AS total_rev_e4
        FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.total_rev_e4 = (SELECT MAX(total_rev_e4) FROM rev)
    """
    _z_terms = " + ".join(
        f"(((u >> {i}) & 1) << {2 * i}) + (((d >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    )
    out["zorder_events"] = f"""
        WITH b AS (
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   CAST(user_id AS BIGINT) AS user_id,
                   CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
            FROM events
        ),
        m AS (
            SELECT event_id, user_id, day,
                   user_id & 65535 AS u, day & 65535 AS d
            FROM b
        )
        SELECT event_id, user_id, day,
               CAST({_z_terms} AS BIGINT) AS zval
        FROM m
    """
    out["q2_cheapest_supplier"] = """
        WITH c AS (
            SELECT l_partkey, l_suppkey,
                   (CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 10000)
                       // GREATEST(CAST(ROUND(l_quantity) AS BIGINT), 1)
                       AS cost_micro
            FROM lineitem
        ),
        w AS (
            SELECT l_partkey, l_suppkey, MIN(cost_micro) AS cost_micro
            FROM c GROUP BY 1, 2
        )
        SELECT CAST(w.l_partkey AS BIGINT) AS l_partkey,
               CAST(w.l_suppkey AS BIGINT) AS s_suppkey,
               s.s_name AS s_name,
               CAST(w.cost_micro AS BIGINT) AS cost_micro
        FROM w
        JOIN supplier s ON w.l_suppkey = s.s_suppkey
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY w.l_partkey ORDER BY w.cost_micro, w.l_suppkey
        ) = 1
    """
    out["codeblock_census"] = """
        WITH d AS (
            SELECT source,
                   (LENGTH(text) - LENGTH(REPLACE(text, '```', ''))) // 3
                       AS fences,
                   LENGTH(text) - LENGTH(REPLACE(text, '`', '')) AS ticks
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN fences >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_with_code,
               CAST(SUM(fences) AS BIGINT) AS total_fences,
               CAST(SUM(fences // 2) AS BIGINT) AS total_blocks,
               CAST(SUM(ticks - 3 * fences) AS BIGINT) AS total_inline_ticks
        FROM d GROUP BY 1
    """
    out["response_latency_view_purchase"] = f"""
        WITH t AS ({_T}),
        w AS (
            SELECT conv_id, turn_idx, role, ts,
                   MIN(CASE WHEN role = 'purchase' THEN turn_idx END)
                       OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN 1 FOLLOWING
                             AND UNBOUNDED FOLLOWING) AS na
            FROM t
        ),
        p AS (
            SELECT w.conv_id,
                   epoch_us(a.ts) - epoch_us(w.ts) AS lat
            FROM w JOIN t a
              ON a.conv_id = w.conv_id AND a.turn_idx = w.na
            WHERE w.role = 'view'
        )
        SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_responses,
               CAST(SUM(lat) AS BIGINT) AS sum_latency_us,
               CAST(MAX(lat) AS BIGINT) AS max_latency_us
        FROM p GROUP BY 1
    """
    out["q20_dominant_suppliers"] = """
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
            FROM lineitem GROUP BY 1, 2
        ),
        pt AS (
            SELECT l_partkey, SUM(qty) AS part_qty FROM ps GROUP BY 1
        )
        SELECT CAST(ps.l_partkey AS BIGINT) AS l_partkey,
               CAST(ps.l_suppkey AS BIGINT) AS s_suppkey,
               s.s_name AS s_name,
               CAST(ps.qty AS BIGINT) AS qty,
               CAST(pt.part_qty AS BIGINT) AS part_qty,
               CAST(1000000 * ps.qty // pt.part_qty AS BIGINT) AS share_ppm
        FROM ps
        JOIN pt ON ps.l_partkey = pt.l_partkey
        JOIN supplier s ON ps.l_suppkey = s.s_suppkey
        WHERE 1000000 * ps.qty > 200000 * pt.part_qty
    """
    out["q16_supplier_census"] = """
        WITH t AS (
            SELECT DISTINCT p.p_brand, p.p_size // 10 AS size_band,
                            l.l_suppkey
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
            )
        )
        SELECT p_brand, CAST(size_band AS BIGINT) AS size_band,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM t GROUP BY 1, 2
    """
    out["q11_important_parts"] = """
        WITH pp AS (
            SELECT l_partkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS v
            FROM lineitem GROUP BY 1
        ),
        tot AS (SELECT SUM(v) AS t FROM pp)
        SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
               CAST(v AS BIGINT) AS value_c,
               CAST(1000000 * v // t AS BIGINT) AS share_ppm
        FROM pp, tot
        WHERE 1000000 * v > 500 * t
    """
    out["boilerplate_line_census"] = """
        WITH l AS (
            SELECT source, doc_id,
                   TRIM(UNNEST(string_split(text, chr(10)))) AS line
            FROM documents
        ),
        nz AS (
            SELECT DISTINCT source, doc_id, line FROM l WHERE line <> ''
        ),
        df AS (
            SELECT source, line, CAST(COUNT(*) AS BIGINT) AS df
            FROM nz GROUP BY 1, 2
        ),
        nd AS (
            SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM documents GROUP BY 1
        )
        SELECT nd.source, nd.n_docs,
               CAST(COUNT(df.line) AS BIGINT) AS n_distinct_lines,
               CAST(COALESCE(SUM(CASE WHEN 1000000 * df.df
                    > 200000 * nd.n_docs THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_boilerplate_lines,
               CAST(COALESCE(SUM(CASE WHEN 1000000 * df.df
                    > 200000 * nd.n_docs THEN df.df ELSE 0 END), 0) AS BIGINT)
                   AS boilerplate_doc_hits
        FROM nd LEFT JOIN df ON nd.source = df.source
        GROUP BY 1, 2
    """
    out["event_type_venn"] = """
        WITH m AS (
            SELECT user_id, CAST(ts AS DATE) AS d,
                   CAST(SUM(DISTINCT CASE event_type
                       WHEN 'view' THEN 1
                       WHEN 'click' THEN 2
                       WHEN 'purchase' THEN 4 END) AS BIGINT) AS mask
            FROM events
            WHERE event_type IN ('view', 'click', 'purchase')
            GROUP BY 1, 2
        )
        SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM m GROUP BY 1
    """
    out["median2_value_per_type"] = """
        WITH v AS (
            SELECT event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
        ),
        s AS (
            SELECT event_type, LIST(c ORDER BY c) AS l,
                   COUNT(*) AS n
            FROM v GROUP BY 1
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(l[(n + 1) // 2] + l[n // 2 + 1] AS BIGINT)
                   AS median2_cents
        FROM s
    """
    out["equidepth_bins_events"] = """
        WITH v AS (
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
        ),
        s AS (SELECT LIST(c ORDER BY c) AS l, COUNT(*) AS n FROM v),
        ed AS (
            SELECT l[GREATEST((d * n + 9) // 10, 1)] AS edge
            FROM s, UNNEST(range(1, 10)) AS t(d)
        )
        SELECT v.event_id, v.c AS value_cents,
               CAST(1 + SUM(CASE WHEN v.c > ed.edge THEN 1 ELSE 0 END)
                    AS BIGINT) AS bucket
        FROM v CROSS JOIN ed
        GROUP BY 1, 2
    """
    out["label_centroid_distance"] = """
        WITH q AS (
            SELECT vec_id, label, dim_idx,
                   CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT) AS x
            FROM (
                SELECT vec_id, label, UNNEST(embedding) AS e,
                       UNNEST(range(1, len(embedding) + 1)) AS dim_idx
                FROM embeddings
            )
        ),
        s AS (
            SELECT label, dim_idx, CAST(SUM(x) AS BIGINT) AS sv,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM q GROUP BY 1, 2
        )
        SELECT CAST(q.vec_id AS BIGINT) AS vec_id,
               CAST(q.label AS BIGINT) AS label,
               CAST(MAX(s.n) AS BIGINT) AS n_label,
               CAST(SUM((s.n * q.x - s.sv) * (s.n * q.x - s.sv))
                    AS BIGINT) AS d2n2
        FROM q JOIN s ON q.label = s.label AND q.dim_idx = s.dim_idx
        GROUP BY 1, 2
    """
    out["gini_user_activity"] = """
        WITH c AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        r AS (
            SELECT n,
                   ROW_NUMBER() OVER (ORDER BY n, user_id) AS i,
                   COUNT(*) OVER () AS k,
                   SUM(n) OVER () AS tot
            FROM c
        )
        SELECT CAST(MAX(k) AS BIGINT) AS n_users,
               CAST(MAX(tot) AS BIGINT) AS total_events,
               CAST(SUM((2 * i - k - 1) * n) AS BIGINT) AS gini_num,
               CAST(1000000 * SUM((2 * i - k - 1) * n)
                    // (MAX(k) * MAX(tot)) AS BIGINT) AS gini_ppm
        FROM r
    """
    out["mannwhitney_value_purchase_click"] = """
        WITH v AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
            FROM events WHERE event_type IN ('purchase', 'click')
        ),
        g AS (
            SELECT c, SUM(a) AS na, COUNT(*) AS cnt FROM v GROUP BY 1
        ),
        r AS (
            SELECT na, cnt,
                   COALESCE(SUM(cnt) OVER (ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cb
            FROM g
        )
        SELECT CAST(SUM(na) AS BIGINT) AS n_a,
               CAST(SUM(cnt - na) AS BIGINT) AS n_b,
               CAST(SUM(na * (2 * cb + cnt + 1)) AS BIGINT) AS ranksum2_a,
               CAST(SUM(na * (2 * cb + cnt + 1))
                    - SUM(na) * (SUM(na) + 1) AS BIGINT) AS u2_a
        FROM r
    """
    out["source_mix_weights"] = """
        WITH c AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY 1
        )
        SELECT source, n_docs,
               CAST(300000 // COUNT(*) OVER ()
                    + (700000 * n_docs) // SUM(n_docs) OVER () AS BIGINT)
                   AS weight_ppm
        FROM c
    """
    out["lexical_diversity_by_source"] = """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents
        ),
        per_doc AS (
            SELECT doc_id, COUNT(*) AS tok, COUNT(DISTINCT term) AS dis
            FROM toks WHERE term <> '' GROUP BY 1
        ),
        base AS (
            SELECT d.source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COALESCE(SUM(p.dis), 0) AS BIGINT)
                       AS sum_distinct_terms,
                   CAST(COALESCE(SUM(p.tok), 0) AS BIGINT) AS sum_tokens
            FROM documents d
            LEFT JOIN per_doc p ON d.doc_id = p.doc_id
            GROUP BY 1
        )
        SELECT source, n_docs, sum_distinct_terms, sum_tokens,
               CAST(CASE WHEN sum_tokens > 0
                         THEN 1000000 * sum_distinct_terms // sum_tokens
                         ELSE 0 END AS BIGINT) AS ttr_ppm
        FROM base
    """
    # Q17 shape: strict integer restatement of qty < 0.2·avg(qty) per part
    out["q17_small_quantity_revenue"] = """
        WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
        st AS (
            SELECT l_partkey,
                   SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS sum_qty,
                   COUNT(*) AS n_li
            FROM lineitem JOIN pk ON l_partkey = p_partkey
            GROUP BY 1
        )
        SELECT CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)), 0)
                    AS BIGINT) AS total_price_c,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN st ON l.l_partkey = st.l_partkey
        WHERE 5 * CAST(ROUND(l.l_quantity) AS BIGINT) * st.n_li < st.sum_qty
    """
    out["q22_idle_balance_census"] = """
        WITH g AS (
            SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s,
                   COUNT(*) AS n
            FROM customer WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > 0
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS totacctbal_c
        FROM customer, g
        WHERE g.n * CAST(ROUND(c_acctbal * 100) AS BIGINT) > g.s
          AND c_custkey NOT IN (
              SELECT o_custkey FROM orders
              WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
        GROUP BY 1
    """
    out["q9_nation_year_revenue"] = """
        SELECT n.n_name,
               CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_e4
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2
    """
    # Q19 shape: integer 1e-4-currency revenue (price_cents × (100−disc_cents))
    out["q19_brand_revenue"] = """
        SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_e4,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
               AND CAST(ROUND(l.l_quantity) AS BIGINT) BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 15
               AND CAST(ROUND(l.l_quantity) AS BIGINT) BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 25
               AND CAST(ROUND(l.l_quantity) AS BIGINT) BETWEEN 20 AND 30)
    """
    out["encode_roles"] = f"""
        WITH t AS ({_T}),
        v AS (SELECT role, DENSE_RANK() OVER (ORDER BY role) - 1 AS role_id
              FROM (SELECT DISTINCT role FROM t))
        SELECT t.conv_id, t.turn_idx, CAST(v.role_id AS BIGINT) AS role_id
        FROM t JOIN v ON t.role = v.role
    """
    out["profile_events"] = """
        SELECT 'event_id' AS column, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct FROM events
        UNION ALL
        SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
        UNION ALL
        SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM events
        UNION ALL
        SELECT 'value', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT value) AS BIGINT) FROM events
        UNION ALL
        SELECT 'props', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT props) AS BIGINT) FROM events
    """
    out["sentence_stats_documents"] = """
        WITH s AS (
            SELECT doc_id,
                   list_filter(
                       list_transform(regexp_split_to_array(text, '[.!?]+'),
                                      x -> trim(x)),
                       x -> x <> '') AS segs
            FROM documents
        )
        SELECT doc_id,
               CAST(len(segs) AS BIGINT) AS n_sentences,
               CAST(COALESCE(list_sum(list_transform(segs, x -> length(x))), 0)
                    AS BIGINT) AS sentence_chars
        FROM s
    """
    out["k_anonymity_audit"] = """
        WITH cells AS (
            SELECT event_type,
                   CAST(dayofweek(ts) AS BIGINT) AS dow,
                   CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2, 3
        )
        SELECT event_type, dow, hour, CAST(n AS BIGINT) AS n
        FROM cells WHERE n < 5
    """
    # growth accounting: per-user distinct active days; new on the first
    # day, retained when yesterday was active, resurrected otherwise;
    # churn attributed to d+1 for every active day without an adjacent
    # successor (so retained(d) + churned(d) = active(d-1) exactly)
    out["growth_accounting_daily"] = """
        WITH du AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
            FROM events
        ),
        t AS (
            SELECT user_id, day,
                   MIN(day) OVER (PARTITION BY user_id) AS first_day,
                   LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
                   LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
            FROM du
        ),
        status AS (
            SELECT day,
                   CASE WHEN day = first_day THEN 1 ELSE 0 END AS n_new,
                   CASE WHEN prev_day = day - INTERVAL 1 DAY THEN 1 ELSE 0 END
                       AS n_retained,
                   CASE WHEN day <> first_day
                             AND (prev_day IS NULL
                                  OR prev_day <> day - INTERVAL 1 DAY)
                        THEN 1 ELSE 0 END AS n_resurrected,
                   0 AS n_churned
            FROM t
            UNION ALL
            SELECT day + INTERVAL 1 DAY, 0, 0, 0, 1
            FROM t
            WHERE next_day IS NULL OR next_day <> day + INTERVAL 1 DAY
        )
        SELECT day,
               CAST(SUM(n_new) AS BIGINT) AS n_new,
               CAST(SUM(n_retained) AS BIGINT) AS n_retained,
               CAST(SUM(n_resurrected) AS BIGINT) AS n_resurrected,
               CAST(SUM(n_churned) AS BIGINT) AS n_churned
        FROM status GROUP BY day
    """
    # chi-square-prep crosstab: HUGEINT keeps n_row*n_col*1e6 exact before
    # the floor divide (the engine uses Python ints for the same reason)
    out["contingency_margins"] = """
        WITH cells AS (
            SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        m AS (
            SELECT event_type, dow, n,
                   SUM(n) OVER (PARTITION BY event_type) AS n_row,
                   SUM(n) OVER (PARTITION BY dow) AS n_col,
                   SUM(n) OVER () AS total
            FROM cells
        )
        SELECT event_type, dow, CAST(n AS BIGINT) AS n,
               CAST(n_row AS BIGINT) AS n_row,
               CAST(n_col AS BIGINT) AS n_col,
               CAST(CAST(n_row AS HUGEINT) * n_col * 1000000 // total
                    AS BIGINT) AS expected_ppm
        FROM m
    """
    out["transition_latency_census"] = """
        WITH s AS (
            SELECT event_type,
                   LAG(event_type) OVER w AS from_type,
                   epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT from_type, event_type AS to_type,
               COUNT(*) AS n,
               CAST(SUM(gap_us) AS BIGINT) AS gap_us_sum,
               CAST(MIN(gap_us) AS BIGINT) AS gap_us_min,
               CAST(MAX(gap_us) AS BIGINT) AS gap_us_max
        FROM s WHERE from_type IS NOT NULL
        GROUP BY 1, 2
    """
    # NTILE allocation: first len%k segments take the extra row — the
    # engine's numpy repeat reproduces exactly this split
    out["paa_segments_4"] = """
        WITH s AS (
            SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   NTILE(4) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS seg_idx
            FROM events
        )
        SELECT user_id, CAST(seg_idx AS BIGINT) AS seg_idx,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS cents_sum
        FROM s GROUP BY 1, 2
    """
    out["hourly_seasonality"] = """
        WITH cells AS (
            SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hour,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        m AS (
            SELECT event_type, hour, n,
                   SUM(n) OVER (PARTITION BY event_type) AS tot
            FROM cells
        )
        SELECT event_type, hour, CAST(n AS BIGINT) AS n,
               CAST(CAST(n AS HUGEINT) * 1000000 // tot AS BIGINT) AS share_ppm
        FROM m
    """
    out["cross_source_contamination"] = """
        WITH k AS (
            SELECT DISTINCT substr(lower(text), 1, 32) AS key, source
            FROM documents
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared_keys
        FROM k a JOIN k b ON a.key = b.key AND a.source < b.source
        GROUP BY 1, 2
    """
    # SFT context assembly: per-conversation ordered concat; chr(10) is the
    # engine's sep="\n"; DuckDB length() counts characters like utf8_length
    out["context_assembly"] = f"""
        WITH t AS ({_T})
        SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
               CAST(length(string_agg(text, chr(10) ORDER BY turn_idx))
                    AS BIGINT) AS context_chars,
               string_agg(text, chr(10) ORDER BY turn_idx) AS context_text
        FROM t GROUP BY conv_id
    """
    # concat-then-cut packing: prefix-sum of the standard tok_est within a
    # source (doc_id order); a doc lands at bin prefix//B offset prefix%B
    # and spans through (prefix + max(tok,1) - 1)//B
    out["pack_sequences_512"] = """
        WITH d AS (
            SELECT doc_id, source,
                   CAST((n_chars + 3) // 4 AS BIGINT) AS tok_est
            FROM documents
        ),
        p AS (
            SELECT doc_id, source, tok_est,
                   COALESCE(SUM(tok_est) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS prefix
            FROM d
        )
        SELECT doc_id, source, tok_est,
               CAST(prefix // 512 AS BIGINT) AS bin_id,
               CAST(prefix % 512 AS BIGINT) AS bin_offset,
               CAST((prefix + GREATEST(tok_est, 1) - 1) // 512
                    - prefix // 512 + 1 AS BIGINT) AS n_bins_spanned
        FROM p
    """
    # streaming correction census: watermark = running max event time over
    # PRIOR arrivals (event_id order) minus 30 min; an event is a correction
    # when its 1-minute window already closed at its arrival
    out["window_corrections_30m"] = """
        WITH s AS (
            SELECT user_id, epoch_us(ts) AS tus,
                   MAX(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS hwm_prev
            FROM events
        ),
        w AS (
            SELECT user_id, tus - tus % 60000000 AS win_us,
                   CASE WHEN hwm_prev IS NOT NULL
                             AND tus - tus % 60000000 + 60000000
                                 <= hwm_prev - 1800000000
                        THEN 1 ELSE 0 END AS corr
            FROM s
        )
        SELECT user_id, make_timestamp(win_us) AS window_start,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(corr) AS BIGINT) AS n_corrections
        FROM w GROUP BY 1, 2
    """
    # overlapping character windows: integer chunk-count rule
    # 1 + ceil((n-512)/448) (one chunk when n <= 512, incl. empty docs);
    # substr is codepoint-based like the engine's utf8_slice_codeunits
    out["rag_chunks_512_448"] = """
        WITH d AS (
            SELECT doc_id, text,
                   CASE WHEN length(text) <= 512 THEN 1
                        ELSE 1 + (length(text) - 512 + 447) // 448 END AS nc
            FROM documents
        )
        , x AS (
            SELECT doc_id, text, unnest(range(0, nc)) AS i FROM d
        )
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
               CAST(i * 448 AS BIGINT) AS chunk_start,
               substr(text, i * 448 + 1, 512) AS chunk_text,
               CAST(length(substr(text, i * 448 + 1, 512)) AS BIGINT)
                   AS chunk_chars
        FROM x
    """
    # Gopher repetition screen: engine-standard tokenization (lower, split
    # [^a-z0-9]+, drop empties); zero-word docs emit all-zero rows
    out["gopher_repetition_documents"] = """
        WITH toks AS (
            SELECT doc_id, t.tok
            FROM documents,
                 unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(tok)
            WHERE t.tok <> ''
        ),
        cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        agg AS (
            SELECT doc_id, SUM(c) AS nw, COUNT(*) AS nd, MAX(c) AS topn
            FROM cnt GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(COALESCE(a.nw, 0) AS BIGINT) AS n_words,
               CAST(COALESCE(a.nd, 0) AS BIGINT) AS n_distinct_words,
               CAST(COALESCE(a.topn, 0) AS BIGINT) AS top_word_n,
               CAST(CASE WHEN COALESCE(a.nw, 0) = 0 THEN 0
                         ELSE (a.nw - a.nd) * 1000000 // a.nw END AS BIGINT)
                   AS dup_word_ppm
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """
    out["q7_bination_volume"] = """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_u
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE s.s_nationkey <> c.c_nationkey
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """
    # retention dry run: tiers are the DISTINCT (conv, floor) window sets;
    # now = newest 1m window; 1m kept 7d, 1h kept 90d, 1d unbounded
    out["retention_policy_census"] = f"""
        WITH m AS (
            SELECT conv_id, date_trunc('minute', ts) AS window_start
            FROM ({_T}) GROUP BY 1, 2
        ),
        h AS (
            SELECT DISTINCT conv_id,
                   date_trunc('hour', window_start) AS window_start FROM m
        ),
        d AS (
            SELECT DISTINCT conv_id,
                   date_trunc('day', window_start) AS window_start FROM m
        ),
        nowt AS (SELECT MAX(window_start) AS now FROM m)
        SELECT '1m' AS tier, CAST(7 AS BIGINT) AS horizon_days,
               CAST(COALESCE(SUM(CASE WHEN m.window_start >=
                   nowt.now - INTERVAL 7 DAY THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_keep,
               CAST(COALESCE(SUM(CASE WHEN m.window_start >=
                   nowt.now - INTERVAL 7 DAY THEN 0 ELSE 1 END), 0) AS BIGINT)
                   AS n_drop
        FROM m, nowt
        UNION ALL
        SELECT '1h', 90,
               CAST(COALESCE(SUM(CASE WHEN h.window_start >=
                   nowt.now - INTERVAL 90 DAY THEN 1 ELSE 0 END), 0) AS BIGINT),
               CAST(COALESCE(SUM(CASE WHEN h.window_start >=
                   nowt.now - INTERVAL 90 DAY THEN 0 ELSE 1 END), 0) AS BIGINT)
        FROM h, nowt
        UNION ALL
        SELECT '1d', 0, CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT) FROM d
    """
    out["arrival_disorder_census"] = """
        WITH s AS (
            SELECT user_id,
                   epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS d
            FROM events
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_inversions,
               CAST(COALESCE(MAX(CASE WHEN d < 0 THEN -d END), 0) AS BIGINT)
                   AS max_backstep_us
        FROM s GROUP BY 1
    """
    # chunker rule identical to rag_chunks_512_448; each distinct chunk
    # text keeps its lexicographically-first (doc_id, chunk_idx) owner
    out["chunk_dedup_exact"] = """
        WITH dd AS (
            SELECT doc_id, text,
                   CASE WHEN length(text) <= 512 THEN 1
                        ELSE 1 + (length(text) - 512 + 447) // 448 END AS nc
            FROM documents
        ),
        x AS (SELECT doc_id, text, unnest(range(0, nc)) AS i FROM dd),
        c AS (
            SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                   substr(text, i * 448 + 1, 512) AS chunk_text
            FROM x
        ),
        r AS (
            SELECT doc_id, chunk_idx,
                   ROW_NUMBER() OVER (PARTITION BY chunk_text
                       ORDER BY doc_id, chunk_idx) AS rn,
                   COUNT(*) OVER (PARTITION BY chunk_text) AS n_copies
            FROM c
        )
        SELECT doc_id, chunk_idx, CAST(n_copies AS BIGINT) AS n_copies
        FROM r WHERE rn = 1
    """
    # near-exact dedup: case/whitespace-normalized text as the grouping key
    out["dedup_normalized_documents"] = r"""
        WITH n AS (
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
            FROM documents
        )
        SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM n GROUP BY t
    """
    # pack_sequences_ffd: first-fit-decreasing is sequential state — no
    # closed-form SQL; rows-only driver check, property-gated in pytest
    # lead-lag: per lag l, sums over days where BOTH series have a row at
    # (d, d+l); all 2·max_lag+1 lags emit rows even with zero overlap
    out["lead_lag_daily_xcorr"] = """
        WITH x AS (
            SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
            FROM events WHERE event_type = 'click' GROUP BY 1
        ),
        y AS (
            SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        l AS (SELECT unnest(range(-3, 4)) AS lag_days)
        SELECT CAST(l.lag_days AS BIGINT) AS lag_days,
               CAST(COUNT(y.d) AS BIGINT) AS n_days,
               CAST(COALESCE(SUM(x.c * y.c), 0) AS BIGINT) AS sum_xy,
               CAST(COALESCE(SUM(CASE WHEN y.d IS NOT NULL THEN x.c END), 0)
                    AS BIGINT) AS sum_x,
               CAST(COALESCE(SUM(y.c), 0) AS BIGINT) AS sum_y
        FROM l
        LEFT JOIN x ON TRUE
        LEFT JOIN y ON y.d = x.d + l.lag_days * INTERVAL 1 DAY
        GROUP BY 1
    """
    # largest-remainder quota allocation (integer arithmetic: remainders are
    # n*K mod total; ties to the lexicographically smaller source), quotas
    # capped at stratum size, lowest doc_ids win per stratum
    out["quota_sample_documents"] = """
        WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
        t AS (SELECT SUM(n) AS total FROM c),
        q0 AS (SELECT source, n, n * 100 // total AS fq, n * 100 % total AS rem
               FROM c, t),
        lo AS (SELECT 100 - SUM(fq) AS leftover FROM q0),
        r AS (SELECT source, n, fq, rem,
                     ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rk
              FROM q0),
        q AS (SELECT source,
                     LEAST(fq + CASE WHEN rk <= (SELECT leftover FROM lo)
                                     THEN 1 ELSE 0 END, n) AS quota
              FROM r),
        d AS (SELECT doc_id, source,
                     ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
              FROM documents)
        SELECT d.doc_id, d.source
        FROM d JOIN q ON d.source = q.source
        WHERE d.rn <= q.quota
    """
    # PromQL increase(): non-negative deltas sum; a drop (reset) contributes
    # the post-reset value. Order (ts, event_id); first sample contributes 0.
    out["counter_increase_per_user"] = """
        WITH c AS (
            SELECT user_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS v,
                   LAG(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS pv
            FROM events
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(COALESCE(SUM(CASE WHEN pv IS NULL THEN 0
                                      WHEN v >= pv THEN v - pv
                                      ELSE v END), 0) AS BIGINT) AS increase_cents,
               CAST(SUM(CASE WHEN pv IS NOT NULL AND v < pv THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_resets
        FROM c GROUP BY 1
    """
    out["gap_survival_census"] = """
        WITH g AS (
            SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events
        ),
        s AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL),
        th AS (SELECT * FROM (VALUES ('1m', 60000000), ('5m', 300000000),
                                     ('1h', 3600000000), ('1d', 86400000000))
                    AS t(threshold, us))
        SELECT th.threshold,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_gaps,
               CAST(SUM(CASE WHEN s.gap_us >= th.us THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ge
        FROM th LEFT JOIN s ON TRUE
        GROUP BY th.threshold
    """
    # composed feature build: DENSE_RANK type id + per-type min-max ppm +
    # calendar (dow 0=Sunday, hour)
    out["event_features"] = """
        WITH c AS (
            SELECT event_id, event_type, ts,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        b AS (SELECT event_type, MIN(cents) AS lo, MAX(cents) AS hi
              FROM c GROUP BY 1),
        v AS (SELECT event_type,
                     DENSE_RANK() OVER (ORDER BY event_type) - 1 AS type_id
              FROM (SELECT DISTINCT event_type FROM c))
        SELECT c.event_id,
               CAST(v.type_id AS BIGINT) AS type_id,
               CAST(CASE WHEN b.hi > b.lo
                         THEN (c.cents - b.lo) * 1000000 // (b.hi - b.lo)
                         ELSE 1000000 END AS BIGINT) AS scaled_ppm,
               CAST(dayofweek(c.ts) AS BIGINT) AS dow,
               CAST(EXTRACT(HOUR FROM c.ts) AS BIGINT) AS hour
        FROM c JOIN b ON c.event_type = b.event_type
               JOIN v ON c.event_type = v.event_type
    """
    # cumulative COUNT(DISTINCT) emulated as cumsum over first-occurrence
    # flags ('' tools never count) — same rule as the engine kernel
    out["cum_distinct_tools"] = f"""
        WITH t AS ({_T}),
        f AS (
            SELECT conv_id, turn_idx,
                   CASE WHEN tool <> '' AND ROW_NUMBER() OVER (
                            PARTITION BY conv_id, tool ORDER BY turn_idx) = 1
                        THEN 1 ELSE 0 END AS first_occ
            FROM t
        )
        SELECT conv_id, turn_idx,
               CAST(SUM(first_occ) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_tools
        FROM f
    """
    out["scale_value_by_type"] = """
        WITH c AS (
            SELECT event_id, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        b AS (
            SELECT event_type, MIN(cents) AS lo, MAX(cents) AS hi
            FROM c GROUP BY 1
        )
        SELECT c.event_id, c.event_type,
               CAST(CASE WHEN b.hi > b.lo
                         THEN (c.cents - b.lo) * 1000000 // (b.hi - b.lo)
                         ELSE 1000000 END AS BIGINT) AS scaled_ppm
        FROM c JOIN b ON c.event_type = b.event_type
    """
    out["assign_folds_documents"] = """
        SELECT doc_id, source,
               CAST((ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY doc_id) - 1) % 5
                    AS BIGINT) AS fold
        FROM documents
    """
    out["peak_rate_5m"] = """
        WITH e AS (SELECT user_id, ts FROM events),
        c AS (
            SELECT a.user_id, a.ts, COUNT(*) AS n
            FROM e a JOIN e b ON a.user_id = b.user_id
                 AND b.ts > a.ts - INTERVAL 5 MINUTE AND b.ts <= a.ts
            GROUP BY 1, 2
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(MAX(n) AS BIGINT) AS peak_events
        FROM c GROUP BY 1
    """
    out["last_touch_attribution"] = """
        WITH c AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        t AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'),
        j AS (
            SELECT c.user_id, c.event_id AS conv_event_id,
                   t.event_id AS touch_event_id,
                   epoch_us(c.ts) - epoch_us(t.ts) AS lag_us,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.event_id
                       ORDER BY t.ts DESC, t.event_id DESC) AS rn
            FROM c JOIN t ON c.user_id = t.user_id
                 AND t.ts <= c.ts AND t.ts >= c.ts - INTERVAL 7 DAY
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(conv_event_id AS BIGINT) AS conv_event_id,
               CAST(touch_event_id AS BIGINT) AS touch_event_id,
               CAST(lag_us AS BIGINT) AS lag_us
        FROM j WHERE rn = 1
    """
    out["bounce_rate_daily"] = """
        WITH ud AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce
        FROM ud GROUP BY 1
    """
    out["q21_last_to_ship"] = """
        WITH pair AS (
            SELECT l_orderkey AS okey, l_suppkey AS skey,
                   MAX(CAST(l_shipdate AS DATE)) AS mship
            FROM lineitem GROUP BY 1, 2
        ),
        ord AS (
            SELECT okey, COUNT(*) AS n_supp, MAX(mship) AS omax
            FROM pair GROUP BY 1
        ),
        blamed AS (
            SELECT p.okey, MIN(p.skey) AS skey
            FROM pair p JOIN ord o
              ON p.okey = o.okey AND p.mship = o.omax
            WHERE o.n_supp >= 2
            GROUP BY p.okey
            HAVING COUNT(*) = 1
        )
        SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM blamed b JOIN supplier s ON b.skey = s.s_suppkey
        GROUP BY 1, 2
        ORDER BY n_orders DESC, s_suppkey
        LIMIT 20
    """
    out["ks_value_purchase_click"] = """
        WITH e AS (
            SELECT CAST(ROUND(value * 100) AS BIGINT) AS v, event_type
            FROM events WHERE event_type IN ('purchase', 'click')
        ),
        g AS (
            SELECT v,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c_a,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c_b
            FROM e GROUP BY v
        ),
        t AS (
            SELECT CAST(SUM(c_a) AS BIGINT) AS n_a, CAST(SUM(c_b) AS BIGINT) AS n_b
            FROM g
        ),
        c AS (
            SELECT SUM(c_a) OVER (ORDER BY v) AS f_a,
                   SUM(c_b) OVER (ORDER BY v) AS f_b
            FROM g
        )
        SELECT n_a, n_b,
               CAST(MAX(ABS(f_a * n_b - f_b * n_a)) AS BIGINT) AS ks_num,
               CAST((1000000 * MAX(ABS(f_a * n_b - f_b * n_a))) // (n_a * n_b)
                    AS BIGINT) AS ks_ppm
        FROM c, t
        WHERE n_a > 0 AND n_b > 0
        GROUP BY n_a, n_b
    """
    out["decayed_user_scores"] = """
        WITH m AS (
            SELECT MAX(CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT)) AS md FROM events
        ),
        e AS (
            SELECT user_id, CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS d FROM events
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(SUM(CASE WHEN md - d <= 40
                             THEN CAST(POWER(2, 40 - (md - d)) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS score,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM e, m
        GROUP BY 1
        ORDER BY score DESC, user_id
        LIMIT 20
    """
    out["shape_census"] = f"""
        WITH t AS ({_T}),
        s AS (
            SELECT conv_id, string_agg(role, ',' ORDER BY turn_idx) AS shape
            FROM t GROUP BY 1
        )
        SELECT shape, CAST(COUNT(*) AS BIGINT) AS n_convs
        FROM s GROUP BY 1
        ORDER BY n_convs DESC, shape
        LIMIT 20
    """
    out["resample_uniform_8"] = f"""
        WITH t AS ({_T}),
        s0 AS (
            SELECT conv_id, epoch_us(ts) AS tu,
                   CAST(LENGTH(text) AS BIGINT) AS v,
                   ROW_NUMBER() OVER (
                       PARTITION BY conv_id ORDER BY ts, turn_idx) AS rn
            FROM t
        ),
        s AS (
            SELECT conv_id, tu, v, LEAD(tu) OVER w AS ntu, LEAD(v) OVER w AS nv
            FROM s0 WINDOW w AS (PARTITION BY conv_id ORDER BY tu, rn)
        ),
        b AS (
            SELECT conv_id, MIN(tu) AS t0, MAX(tu) AS t1
            FROM s0 GROUP BY 1 HAVING MAX(tu) > MIN(tu)
        ),
        g AS (
            SELECT b.conv_id, j, t0 + (j * (t1 - t0)) // 7 AS gt
            FROM b CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS j) js
        )
        SELECT g.conv_id, CAST(j AS BIGINT) AS j,
               make_timestamp(gt) AS grid_ts,
               CAST(CASE WHEN s.ntu IS NULL THEN s.v
                    ELSE s.v + ((s.nv - s.v) * (g.gt - s.tu)) // (s.ntu - s.tu)
                    END AS BIGINT) AS value
        FROM g JOIN s ON g.conv_id = s.conv_id
         AND s.tu <= g.gt AND (s.ntu IS NULL OR g.gt < s.ntu)
    """
    out["pagerank_trade_graph"] = """
        WITH pairs AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ),
        edges AS (
            SELECT c AS src, s + 1000000000 AS dst FROM pairs
            UNION ALL
            SELECT s + 1000000000 AS src, c AS dst FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
                FROM edges GROUP BY 1),
        r0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS r
               FROM nodes),
        s1 AS (SELECT e.dst AS node, SUM(r0.r // deg.deg) AS s
               FROM edges e
               JOIN r0 ON r0.node = e.src JOIN deg ON deg.src = e.src
               GROUP BY 1),
        r1 AS (SELECT nodes.node,
                      (1000000000000 * 3) // (20 * (SELECT n FROM nn))
                      + (17 * COALESCE(s1.s, 0)) // 20 AS r
               FROM nodes LEFT JOIN s1 USING (node)),
        s2 AS (SELECT e.dst AS node, SUM(r1.r // deg.deg) AS s
               FROM edges e
               JOIN r1 ON r1.node = e.src JOIN deg ON deg.src = e.src
               GROUP BY 1),
        r2 AS (SELECT nodes.node,
                      (1000000000000 * 3) // (20 * (SELECT n FROM nn))
                      + (17 * COALESCE(s2.s, 0)) // 20 AS r
               FROM nodes LEFT JOIN s2 USING (node)),
        s3 AS (SELECT e.dst AS node, SUM(r2.r // deg.deg) AS s
               FROM edges e
               JOIN r2 ON r2.node = e.src JOIN deg ON deg.src = e.src
               GROUP BY 1),
        r3 AS (SELECT nodes.node,
                      (1000000000000 * 3) // (20 * (SELECT n FROM nn))
                      + (17 * COALESCE(s3.s, 0)) // 20 AS r
               FROM nodes LEFT JOIN s3 USING (node))
        SELECT node, CAST(r AS BIGINT) AS rank_pico FROM r3
        ORDER BY rank_pico DESC, node ASC
        LIMIT 20
    """
    out["bm25_rank_documents"] = """
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents
        ), tk AS (SELECT doc_id, term FROM toks WHERE term <> ''),
        dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tk GROUP BY 1),
        st AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                      CAST(SUM(dl) AS HUGEINT) AS t FROM dl),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tk
               WHERE term IN ('data', 'model', 'system') GROUP BY 1, 2),
        df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
               FROM tf GROUP BY 1),
        scored AS (
            SELECT tf.doc_id,
                   (CAST(FLOOR(ln(CAST(st.n AS DOUBLE) / df.df) * 1000000
                               + 0.5) AS HUGEINT)
                    * tf.tf * 22 * st.t)
                   // (10 * tf.tf * st.t + 3 * st.t
                       + 9 * CAST(dl.dl AS HUGEINT) * st.n) AS s
            FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
            CROSS JOIN st
        )
        SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score
        FROM scored GROUP BY 1
        ORDER BY score DESC, doc_id ASC
        LIMIT 10
    """
    out["seasonal_naive_error_7d"] = """
        WITH c AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT a.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(ABS(a.n - p.n)) AS BIGINT) AS total_abs_err,
               CAST(MAX(ABS(a.n - p.n)) AS BIGINT) AS max_abs_err,
               CAST(SUM(a.n) AS BIGINT) AS total_actual,
               CAST(SUM(p.n) AS BIGINT) AS total_forecast
        FROM c a
        JOIN c p ON p.event_type = a.event_type
                AND p.day = a.day - INTERVAL 7 DAY
        GROUP BY 1
    """
    out["daily_type_entropy"] = """
        WITH c AS (
            SELECT date_trunc('day', ts) AS day, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT day, CAST(SUM(n) AS BIGINT) AS n_events,
                   CAST(COUNT(*) AS BIGINT) AS n_types
            FROM c GROUP BY 1
        ),
        num AS (
            SELECT c.day,
                   SUM(c.n * (CAST(FLOOR(ln(t.n_events) * 1000000 + 0.5)
                                   AS BIGINT)
                              - CAST(FLOOR(ln(c.n) * 1000000 + 0.5)
                                     AS BIGINT))) AS h_num
            FROM c JOIN tot t USING (day) GROUP BY 1
        )
        SELECT t.day, t.n_events, t.n_types,
               CAST(n.h_num // t.n_events AS BIGINT) AS entropy_micro_nats
        FROM tot t JOIN num n USING (day)
    """
    # gaps-and-islands interval union — identical intervals deduped first so
    # the window order (s strictly increasing per user) is deterministic;
    # merging duplicates never changes island membership or coverage
    out["interval_coverage_5m"] = """
        WITH e AS (
            SELECT DISTINCT user_id, epoch_us(ts) AS s,
                   epoch_us(ts) + 300000000 AS f
            FROM events
        ),
        m AS (
            SELECT user_id, s, f,
                   CASE WHEN s > COALESCE(MAX(f) OVER (
                            PARTITION BY user_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS new_island
            FROM e
        ),
        g AS (
            SELECT user_id, s, f,
                   SUM(new_island) OVER (
                       PARTITION BY user_id ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS isl
            FROM m
        ),
        i AS (SELECT user_id, isl, MIN(s) AS s0, MAX(f) AS f1
              FROM g GROUP BY 1, 2)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(f1 - s0) AS BIGINT) AS covered_us
        FROM i GROUP BY 1 ORDER BY user_id
    """
    # duplicated 5-gram coverage: gram = space-join of 5 consecutive engine
    # tokens; duplicated when seen in >= 2 distinct docs; covered tokens are
    # the union of the 5-wide windows at duplicated positions
    # ExactSubstr cut list: runs of >= 3 consecutive duplicated 5-gram
    # windows (1-based SQL positions mapped to the engine's 0-based)
    out["dup_span_extract_5"] = """
        WITH tl AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS l
            FROM documents
        ),
        base AS (SELECT doc_id, l, len(l) AS nt FROM tl),
        pos AS (
            SELECT doc_id, l, unnest(range(1, nt - 3)) AS pos
            FROM base WHERE nt >= 5
        ),
        grams AS (
            SELECT doc_id, pos,
                   array_to_string(l[pos:pos+4], ' ') AS g
            FROM pos
        ),
        dup AS (SELECT g FROM grams GROUP BY g
                HAVING COUNT(DISTINCT doc_id) >= 2),
        dg AS (SELECT doc_id, pos FROM grams
               WHERE g IN (SELECT g FROM dup)),
        runs AS (
            SELECT doc_id, pos,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS grp
            FROM dg
        ),
        spans AS (
            SELECT doc_id, MIN(pos) AS p0, COUNT(*) AS len
            FROM runs GROUP BY doc_id, grp
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(p0 - 1 AS BIGINT) AS tok_start,
               CAST(p0 - 1 + len + 3 AS BIGINT) AS tok_end,
               CAST(len AS BIGINT) AS n_windows
        FROM spans WHERE len >= 3
    """
    out["dup_ngram_coverage_5"] = """
        WITH tl AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS l
            FROM documents
        ),
        base AS (SELECT doc_id, l, len(l) AS nt FROM tl),
        pos AS (
            SELECT doc_id, l, unnest(range(1, nt - 3)) AS pos
            FROM base WHERE nt >= 5
        ),
        grams AS (
            SELECT doc_id, pos,
                   array_to_string(l[pos:pos+4], ' ') AS g
            FROM pos
        ),
        dup AS (SELECT g FROM grams GROUP BY g
                HAVING COUNT(DISTINCT doc_id) >= 2),
        dg AS (SELECT doc_id, pos FROM grams
               WHERE g IN (SELECT g FROM dup)),
        dcnt AS (SELECT doc_id, COUNT(*) AS dup_grams FROM dg GROUP BY 1),
        cov AS (
            SELECT doc_id, COUNT(DISTINCT pos + o) AS covered
            FROM dg, (SELECT unnest(range(0, 5)) AS o)
            GROUP BY 1
        )
        SELECT b.doc_id,
               CAST(b.nt AS BIGINT) AS n_tokens,
               CAST(CASE WHEN b.nt >= 5 THEN b.nt - 4 ELSE 0 END
                    AS BIGINT) AS n_grams,
               CAST(COALESCE(d.dup_grams, 0) AS BIGINT) AS dup_grams,
               CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_tokens,
               CAST(CASE WHEN b.nt = 0 THEN 0
                         ELSE COALESCE(c.covered, 0) * 1000000 // b.nt END
                    AS BIGINT) AS covered_ppm
        FROM base b
        LEFT JOIN dcnt d USING (doc_id)
        LEFT JOIN cov c USING (doc_id)
        ORDER BY b.doc_id
    """
    # triangle enumeration over the 2%-support term co-occurrence graph;
    # per-doc distinct terms capped at the 64 lexicographically-first (the
    # engine-wide pair-miner cap), edges oriented term_a < term_b
    out["triangle_terms"] = """
        WITH dt AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, tok,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY tok) AS rn
                FROM (
                    SELECT DISTINCT doc_id, t.tok
                    FROM documents,
                         unnest(string_split_regex(lower(text),
                                                   '[^a-z0-9]+')) AS t(tok)
                    WHERE t.tok <> ''
                )
            ) WHERE rn <= 64
        ),
        edges AS (
            SELECT a.tok AS ta, b.tok AS tb
            FROM dt a JOIN dt b
              ON a.doc_id = b.doc_id AND a.tok < b.tok
            GROUP BY 1, 2
            HAVING COUNT(*) * 1000000 >=
                   20000 * (SELECT COUNT(*) FROM documents)
        )
        SELECT e1.ta AS node_a, e1.tb AS node_b, e2.tb AS node_c
        FROM edges e1
        JOIN edges e2 ON e2.ta = e1.tb
        JOIN edges e3 ON e3.ta = e1.ta AND e3.tb = e2.tb
        ORDER BY 1, 2, 3
        LIMIT 5000
    """
    # 2-D Pareto skyline with >= / strict-on-one dominance; exact (total,
    # last) duplicates survive (neither dominates the other)
    out["skyline_users"] = """
        WITH agg AS (
            SELECT user_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS total_cents,
                   CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
            FROM events GROUP BY 1
        )
        SELECT a.user_id, a.total_cents, a.last_us
        FROM agg a
        WHERE NOT EXISTS (
            SELECT 1 FROM agg o
            WHERE o.total_cents >= a.total_cents
              AND o.last_us >= a.last_us
              AND (o.total_cents > a.total_cents OR o.last_us > a.last_us)
        )
        ORDER BY user_id
    """
    # size-2 association rules under the SAME 64-term per-doc cap as the
    # engine (numerators and denominators share one itemset definition)
    out["association_rules_terms"] = """
        WITH dt AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id, tok,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY tok) AS rn
                FROM (
                    SELECT DISTINCT doc_id, t.tok
                    FROM documents,
                         unnest(string_split_regex(lower(text),
                                                   '[^a-z0-9]+')) AS t(tok)
                    WHERE t.tok <> ''
                )
            ) WHERE rn <= 64
        ),
        tc AS (SELECT tok, COUNT(*) AS n FROM dt GROUP BY 1),
        pr AS (
            SELECT a.tok AS ta, b.tok AS tb, COUNT(*) AS n_ab
            FROM dt a JOIN dt b
              ON a.doc_id = b.doc_id AND a.tok < b.tok
            GROUP BY 1, 2
            HAVING COUNT(*) * 1000000 >=
                   20000 * (SELECT COUNT(*) FROM documents)
        ),
        nd AS (SELECT COUNT(*) AS n FROM documents)
        SELECT pr.ta AS term_a, pr.tb AS term_b,
               CAST(pr.n_ab AS BIGINT) AS n_ab,
               CAST(ca.n AS BIGINT) AS n_a,
               CAST(cb.n AS BIGINT) AS n_b,
               CAST(pr.n_ab * 1000000 // nd.n AS BIGINT) AS support_ppm,
               CAST(pr.n_ab * 1000000 // ca.n AS BIGINT) AS conf_ab_ppm,
               CAST(pr.n_ab * 1000000 // cb.n AS BIGINT) AS conf_ba_ppm,
               CAST(pr.n_ab * nd.n * 1000000 // (ca.n * cb.n) AS BIGINT)
                   AS lift_ppm
        FROM pr
        JOIN tc ca ON ca.tok = pr.ta
        JOIN tc cb ON cb.tok = pr.tb
        CROSS JOIN nd
        ORDER BY 1, 2
    """
    # 8-round k=4 peel as chained CTEs — generated mechanically; the
    # engine's early-exit at the fixed point is bit-equivalent because
    # post-convergence rounds remove nothing
    _kcore_rounds = 8
    _kcore_k = 4
    # AS MATERIALIZED: each e{r} is referenced 3× by round r+1 — without it
    # DuckDB inlines the whole chain and re-opens the parquet inputs
    # exponentially many times (observed: fd exhaustion at 8 rounds)
    _cte = [
        """p AS MATERIALIZED (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                 FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           e0 AS MATERIALIZED (SELECT c AS src, s + 1000000000 AS dst FROM p
                  UNION ALL
                  SELECT s + 1000000000 AS src, c AS dst FROM p)"""
    ]
    for _r in range(1, _kcore_rounds + 1):
        _cte.append(
            f"""x{_r} AS MATERIALIZED (SELECT src FROM e{_r - 1}
                          GROUP BY src HAVING COUNT(*) < {_kcore_k}),
                e{_r} AS MATERIALIZED (SELECT e.src, e.dst FROM e{_r - 1} e
                          WHERE e.src NOT IN (SELECT src FROM x{_r})
                            AND e.dst NOT IN (SELECT src FROM x{_r}))"""
        )
    # TV distance over top-100 vocab + other; HUGEINT cross products
    out["tv_distance_src0_src1"] = """
        WITH tok AS (
            SELECT source, t.tok AS term
            FROM documents,
                 unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(tok)
            WHERE t.tok <> ''
        ),
        top AS (
            SELECT term FROM (
                SELECT term, COUNT(*) AS n FROM tok GROUP BY 1
                ORDER BY n DESC, term LIMIT 100
            )
        ),
        ab AS (
            SELECT source,
                   CASE WHEN term IN (SELECT term FROM top) THEN term
                        ELSE chr(1) || 'other' END AS term,
                   COUNT(*) AS n
            FROM tok WHERE source IN ('src0', 'src1')
            GROUP BY 1, 2
        ),
        w AS (
            SELECT term,
                   SUM(CASE WHEN source = 'src0' THEN n ELSE 0 END) AS a,
                   SUM(CASE WHEN source = 'src1' THEN n ELSE 0 END) AS b
            FROM ab GROUP BY 1
        ),
        tot AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM w)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(tot.ta AS BIGINT) AS tokens_a,
               CAST(tot.tb AS BIGINT) AS tokens_b,
               CAST(SUM(ABS(w.a * tot.tb - w.b * tot.ta)) * 1000000
                    // (2 * tot.ta * tot.tb) AS BIGINT) AS tv_ppm
        FROM w CROSS JOIN tot GROUP BY tot.ta, tot.tb
    """
    # Markov argmax backtest; prediction ties to the lexicographically
    # first successor on both sides
    out["markov_backtest"] = """
        WITH seq AS (
            SELECT event_type AS f,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS t
            FROM events
        ),
        pairs AS (SELECT f, t FROM seq WHERE t IS NOT NULL),
        census AS (SELECT f, t, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
        pred AS (
            SELECT f, t AS predicted FROM (
                SELECT f, t,
                       ROW_NUMBER() OVER (PARTITION BY f
                                          ORDER BY n DESC, t ASC) AS rn
                FROM census
            ) WHERE rn = 1
        )
        SELECT p.f AS from_type, pr.predicted,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN p.t = pr.predicted THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct,
               CAST(SUM(CASE WHEN p.t = pr.predicted THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS accuracy_ppm
        FROM pairs p JOIN pred pr USING (f)
        GROUP BY 1, 2 ORDER BY 1
    """
    # decontamination: string-gram restatement of the 8-gram screen
    out["contamination_flags_8gram"] = """
        WITH tl AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS l
            FROM documents
        ),
        base AS (SELECT doc_id, l, len(l) AS nt FROM tl),
        pos AS (
            SELECT doc_id, l, unnest(range(1, nt - 6)) AS pos
            FROM base WHERE nt >= 8
        ),
        grams AS (
            SELECT doc_id, pos, array_to_string(l[pos:pos+7], ' ') AS g
            FROM pos
        ),
        testg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
        hits AS (
            SELECT doc_id, COUNT(*) AS h FROM grams
            WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM testg)
            GROUP BY 1
        )
        SELECT b.doc_id,
               CAST(CASE WHEN b.nt >= 8 THEN b.nt - 7 ELSE 0 END
                    AS BIGINT) AS n_grams,
               CAST(COALESCE(h.h, 0) AS BIGINT) AS test_grams,
               CAST(CASE WHEN COALESCE(h.h, 0) > 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS contaminated
        FROM base b LEFT JOIN hits h USING (doc_id)
        WHERE b.doc_id % 50 <> 0
        ORDER BY b.doc_id
    """
    # linear attribution: the oracle pays the quadratic pair join the
    # engine's diff-array kernel avoids; inclusive window both ends
    out["linear_attribution"] = """
        WITH t AS (
            SELECT user_id, event_id, epoch_us(ts) AS us
            FROM events WHERE event_type = 'click'
        ),
        c AS (
            SELECT user_id, event_id, epoch_us(ts) AS us
            FROM events WHERE event_type = 'purchase'
        ),
        pairs AS (
            SELECT c.user_id, c.event_id AS conv_id, t.event_id AS touch_id
            FROM c JOIN t ON t.user_id = c.user_id
             AND t.us <= c.us AND t.us >= c.us - 604800000000
        ),
        k AS (SELECT conv_id, COUNT(*) AS k FROM pairs GROUP BY 1),
        credit AS (
            SELECT p.user_id, p.touch_id, 1000000 // k.k AS ppm
            FROM pairs p JOIN k USING (conv_id)
        )
        SELECT user_id, touch_id AS touch_event_id,
               CAST(COUNT(*) AS BIGINT) AS n_convs,
               CAST(SUM(ppm) AS BIGINT) AS credit_ppm
        FROM credit GROUP BY 1, 2 ORDER BY 1, 2
    """
    # Flesch with floor divisions; sentence floor GREATEST(s,1); zero-word
    # docs emit the base constant
    out["flesch_documents"] = r"""
        WITH c AS (
            SELECT doc_id,
                   LEN(regexp_extract_all(text, '\S+')) AS w,
                   GREATEST(LEN(regexp_extract_all(text, '[.!?]+')), 1) AS s,
                   LEN(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
            FROM documents
        )
        SELECT doc_id,
               CAST(w AS BIGINT) AS n_words,
               CAST(s AS BIGINT) AS n_sentences,
               CAST(syl AS BIGINT) AS n_syllables,
               CAST(CASE WHEN w = 0 THEN 206835
                         ELSE 206835 - (1015 * w * 1000) // s
                                     - (84600 * syl * 1000) // w
                    END AS BIGINT) AS flesch_milli
        FROM c ORDER BY doc_id
    """
    # weighted PageRank: per-edge (r*w)//W floors, generated 3-iteration
    # chain (same skeleton as the unweighted oracle)
    _wpr = ["""p AS MATERIALIZED (
            SELECT o.o_custkey AS c, l.l_suppkey AS s, COUNT(*) AS w
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
        ),
        edges AS MATERIALIZED (
            SELECT c AS src, s + 1000000000 AS dst, w FROM p
            UNION ALL
            SELECT s + 1000000000 AS src, c AS dst, w FROM p
        ),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
        wdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wd
                 FROM edges GROUP BY 1),
        r0 AS (SELECT node, 1000000000000 // (SELECT n FROM nn) AS r
               FROM nodes)"""]
    for _i in range(1, 4):
        _wpr.append(
            f"""s{_i} AS (SELECT e.dst AS node,
                                SUM((r{_i - 1}.r * e.w) // wdeg.wd) AS s
                         FROM edges e
                         JOIN r{_i - 1} ON r{_i - 1}.node = e.src
                         JOIN wdeg ON wdeg.src = e.src
                         GROUP BY 1),
               r{_i} AS (SELECT nodes.node,
                              (1000000000000 * 3) // (20 * (SELECT n FROM nn))
                              + (17 * COALESCE(s{_i}.s, 0)) // 20 AS r
                       FROM nodes LEFT JOIN s{_i} USING (node))"""
        )
    out["pagerank_weighted_trade"] = (
        "WITH "
        + ",\n".join(_wpr)
        + """
        SELECT node, CAST(r AS BIGINT) AS rank_pico FROM r3
        ORDER BY rank_pico DESC, node ASC
        LIMIT 20
    """
    )
    # binary-segmentation split: score ordered in float64 with identical
    # operand order (one int->double cast + one division per term); output
    # integers only; ties -> earliest day
    out["changepoint_daily"] = """
        WITH dc AS (
            SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
            FROM events GROUP BY 1
        ),
        o AS (
            SELECT day, n,
                   ROW_NUMBER() OVER (ORDER BY day) AS i,
                   SUM(n) OVER (ORDER BY day) AS sl,
                   COUNT(*) OVER () AS m,
                   SUM(n) OVER () AS tot
            FROM dc
        ),
        s AS (
            SELECT day, i, sl, m, tot,
                   CAST(sl * sl AS DOUBLE) / i
                   + CAST((tot - sl) * (tot - sl) AS DOUBLE) / (m - i)
                       AS score,
                   LEAD(day) OVER (ORDER BY day) AS next_day
            FROM o WHERE i < m
        )
        SELECT next_day AS split_day,
               CAST(i AS BIGINT) AS n_left,
               CAST(m - i AS BIGINT) AS n_right,
               CAST(sl AS BIGINT) AS sum_left,
               CAST(tot - sl AS BIGINT) AS sum_right
        FROM s ORDER BY score DESC, day ASC LIMIT 1
    """
    # narrow->wide pivot with the same declared type domain
    out["pivot_daily_type_counts"] = """
        SELECT date_trunc('day', ts) AS day,
               CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
               CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
                   AS purchase,
               CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
               CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
               CAST(COUNT(*) FILTER (event_type NOT IN
                    ('click','error','purchase','signup','view'))
                    AS BIGINT) AS other,
               CAST(COUNT(*) AS BIGINT) AS total
        FROM events GROUP BY 1 ORDER BY 1
    """
    # reconciliation in the integer cents×pct² domain end to end
    out["order_total_reconciliation"] = """
        WITH per AS (
            SELECT l_orderkey,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                       * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS net
            FROM lineitem GROUP BY 1
        ),
        d AS (
            SELECT p.net - CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                       * 10000 AS diff
            FROM per p JOIN orders o ON o.o_orderkey = p.l_orderkey
        )
        SELECT CASE WHEN diff = 0 THEN 'match'
                    WHEN diff > 0 THEN 'over' ELSE 'under' END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(ABS(diff)) AS BIGINT) AS abs_drift
        FROM d GROUP BY 1 ORDER BY 1
    """
    # Zipf fit: ln quantized once to micro-nats on both sides, then pure
    # (HUGE)int least squares; slope // truncates toward zero
    out["zipf_slope_documents"] = """
        WITH tf AS (
            SELECT t.tok AS term, COUNT(*) AS f
            FROM documents,
                 unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(tok)
            WHERE t.tok <> ''
            GROUP BY 1
        ),
        top AS (
            SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term) AS r
            FROM tf ORDER BY f DESC, term LIMIT 200
        ),
        q AS (
            SELECT CAST(FLOOR(LN(r) * 1000000 + 0.5) AS BIGINT) AS x,
                   CAST(FLOOR(LN(f) * 1000000 + 0.5) AS BIGINT) AS y,
                   f, r
            FROM top
        ),
        s AS (
            SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx,
                   MAX(CASE WHEN r = 1 THEN f END) AS f1
            FROM q
        )
        SELECT CAST(n AS BIGINT) AS n_terms,
               CAST(f1 AS BIGINT) AS top_freq,
               CAST((1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
                    AS BIGINT) AS slope_micro
        FROM s
    """
    # MMR greedy as generated chained CTEs (one pick per step); float
    # literals 0.7/0.3 shared verbatim with the engine so the score
    # arithmetic is bit-identical; IDs-only output (no float hashing)
    _mmr_k = 5
    _mmr_cte = [
        """q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
                 WHERE vec_id = 0),
           cand AS MATERIALIZED (
               SELECT e.vec_id AS nid,
                      list_cosine_similarity(e.embedding::DOUBLE[], q.qe)
                          AS rel,
                      e.embedding::DOUBLE[] AS emb
               FROM embeddings e, q WHERE e.vec_id <> 0
               ORDER BY rel DESC, nid LIMIT 50),
           ps AS MATERIALIZED (
               SELECT a.nid AS x, b.nid AS y,
                      list_cosine_similarity(a.emb, b.emb) AS sim
               FROM cand a JOIN cand b ON a.nid <> b.nid),
           sel1 AS MATERIALIZED (
               SELECT nid FROM cand ORDER BY rel DESC, nid LIMIT 1)"""
    ]
    for _i in range(2, _mmr_k + 1):
        _mmr_cte.append(
            f"""pick{_i} AS MATERIALIZED (
                SELECT c.nid FROM cand c
                WHERE c.nid NOT IN (SELECT nid FROM sel{_i - 1})
                ORDER BY 0.7 * c.rel - 0.3 * (
                             SELECT MAX(s.sim) FROM ps s
                             WHERE s.x = c.nid
                               AND s.y IN (SELECT nid FROM sel{_i - 1})
                         ) DESC,
                         c.nid
                LIMIT 1),
            sel{_i} AS MATERIALIZED (
                SELECT nid FROM sel{_i - 1}
                UNION ALL SELECT nid FROM pick{_i})"""
        )
    _mmr_final = " UNION ALL ".join(
        ["SELECT 1 AS r, nid FROM sel1"]
        + [f"SELECT {_i} AS r, nid FROM pick{_i}" for _i in range(2, _mmr_k + 1)]
    )
    out["mmr_select_top5"] = (
        "WITH "
        + ",\n".join(_mmr_cte)
        + f"""
        SELECT CAST(r AS BIGINT) AS sel_rank, CAST(nid AS BIGINT) AS vec_id
        FROM ({_mmr_final}) ORDER BY r
    """
    )
    # centered-MA decomposition; trend floor (counts >= 0) and seasonal
    # trunc division both restate SQL // semantics exactly
    out["seasonal_decompose_hourly"] = """
        WITH hc AS (
            SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
            FROM events GROUP BY 1
        ),
        b AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM hc),
        grid AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM b
        ),
        dense AS (
            SELECT g.h, COALESCE(hc.n, 0) AS n,
                   ROW_NUMBER() OVER (ORDER BY g.h) - 1 AS i
            FROM grid g LEFT JOIN hc ON hc.h = g.h
        ),
        tr AS (
            SELECT h, n, i,
                   SUM(n) OVER (ORDER BY i
                                ROWS BETWEEN 12 PRECEDING
                                         AND 12 FOLLOWING) AS wsum
            FROM dense
        ),
        det AS (
            SELECT hour(h) AS hod, n - wsum // 25 AS dt
            FROM tr
            WHERE i >= 12 AND i <= (SELECT MAX(i) FROM dense) - 12
        )
        SELECT CAST(hod AS BIGINT) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               CAST(SUM(dt) // COUNT(*) AS BIGINT) AS seasonal
        FROM det GROUP BY 1 ORDER BY 1
    """
    # same RE2 pattern verbatim (Arrow and DuckDB share the engine);
    # single quotes doubled for the SQL literal
    from pyreshaper_ray.stages.text import BPE_PRETOKEN_REGEX as _BPE_RE

    out["bpe_token_count"] = f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}'))
                    AS BIGINT) AS n_pretokens
        FROM documents ORDER BY doc_id
    """
    # RRF over two exact ROW_NUMBER rankings; integer // keeps the fused
    # score hash-exact
    out["rrf_fuse_documents"] = """
        WITH sig AS (
            SELECT doc_id, n_chars,
                   len(list_distinct(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> ''))) AS n_terms
            FROM documents
        ),
        ra AS (SELECT doc_id,
                      ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r
               FROM sig),
        rb AS (SELECT doc_id,
                      ROW_NUMBER() OVER (ORDER BY n_terms DESC, doc_id) AS r
               FROM sig)
        SELECT s.doc_id,
               CAST(ra.r AS BIGINT) AS rank_chars,
               CAST(rb.r AS BIGINT) AS rank_terms,
               CAST(1000000 // (60 + ra.r) + 1000000 // (60 + rb.r)
                    AS BIGINT) AS rrf_micro
        FROM sig s JOIN ra USING (doc_id) JOIN rb USING (doc_id)
        ORDER BY rrf_micro DESC, s.doc_id
        LIMIT 20
    """
    out["kcore_trade_graph"] = (
        "WITH "
        + ",\n".join(_cte)
        + f"""
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM e{_kcore_rounds} GROUP BY 1 ORDER BY 1
    """
    )
    # Bollinger flags: ROWS-based 7-day trailing window over PRESENT days;
    # flag is the exact cross-multiplied test (7x-S)^2 > 4(7Q-S^2), full
    # windows only — integer arithmetic end to end.
    out["bollinger_daily_counts"] = """
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        w AS (
            SELECT day, n,
                   SUM(n) OVER (ORDER BY day
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s,
                   SUM(n * n) OVER (ORDER BY day
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS q,
                   COUNT(*) OVER (ORDER BY day
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS m
            FROM d
        )
        SELECT day, n,
               CAST(s AS BIGINT) AS win_sum,
               CAST(q AS BIGINT) AS win_sumsq,
               CAST(CASE WHEN m = 7
                          AND (7 * n - s) * (7 * n - s) > 4 * (7 * q - s * s)
                         THEN 1 ELSE 0 END AS BIGINT) AS bollinger_flag
        FROM w
    """
    # matrix profile: exact integer squared distance between every pair of
    # 24-row windows over the present-hour series (exclusion |i-j| >= 24);
    # nearest neighbor ties break on (distance, smaller j)
    out["matrix_profile_hourly"] = """
        WITH h AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT hr, n,
                   CAST(ROW_NUMBER() OVER (ORDER BY hr) - 1 AS BIGINT) AS rn
            FROM h
        ),
        mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM s),
        win AS (SELECT rn AS i, hr FROM s, mm WHERE rn <= m - 24),
        dist AS (
            SELECT wi.i AS i, wj.i AS j,
                   CAST(SUM((a.n - b.n) * (a.n - b.n)) AS BIGINT) AS d2
            FROM win wi
            JOIN win wj ON abs(wi.i - wj.i) >= 24
            JOIN s a ON a.rn >= wi.i AND a.rn < wi.i + 24
            JOIN s b ON b.rn = wj.i + (a.rn - wi.i)
            GROUP BY 1, 2
        )
        SELECT d.i AS idx, wi.hr AS window_start,
               d.j AS nn_idx, d.d2 AS nn_dist_sq
        FROM dist d JOIN win wi ON wi.i = d.i
        QUALIFY ROW_NUMBER() OVER (PARTITION BY d.i
                                   ORDER BY d.d2 ASC, d.j ASC) = 1
    """
    # rescaled-range census: Z_k = wn*csum_k - k*S per full tumbling window
    # (all n-scaled BIGINTs; Z_wn = 0 puts zero in the range set)
    out["rs_range_hourly"] = """
        WITH h AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT hr, n,
                   CAST(ROW_NUMBER() OVER (ORDER BY hr) - 1 AS BIGINT) AS rn
            FROM h
        ),
        sz AS (SELECT CAST(wn AS BIGINT) AS wn
               FROM (VALUES (24), (48)) t(wn)),
        g AS (
            SELECT z.wn, s.rn // z.wn AS gidx, s.n,
                   CAST(ROW_NUMBER() OVER (PARTITION BY z.wn, s.rn // z.wn
                                           ORDER BY s.rn) AS BIGINT) AS k,
                   SUM(s.n) OVER (PARTITION BY z.wn, s.rn // z.wn
                                  ORDER BY s.rn) AS csum,
                   SUM(s.n) OVER (PARTITION BY z.wn, s.rn // z.wn) AS ssum,
                   SUM(s.n * s.n) OVER (PARTITION BY z.wn, s.rn // z.wn) AS qsum,
                   COUNT(*) OVER (PARTITION BY z.wn, s.rn // z.wn) AS cnt,
                   MIN(s.hr) OVER (PARTITION BY z.wn, s.rn // z.wn) AS ws
            FROM s CROSS JOIN sz z
        )
        SELECT wn AS win_n, CAST(gidx AS BIGINT) AS win_idx,
               ws AS window_start,
               CAST(MAX(ssum) AS BIGINT) AS s_sum,
               CAST(MAX(wn * csum - k * ssum)
                    - MIN(wn * csum - k * ssum) AS BIGINT) AS r_scaled,
               CAST(MAX(wn * qsum - ssum * ssum) AS BIGINT) AS var_num
        FROM g WHERE cnt = wn
        GROUP BY wn, gidx, ws
    """
    # Pettitt change point: V_k pairwise sign census + running sum; the
    # earliest k wins |U| ties
    out["pettitt_change_hourly"] = """
        WITH h AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT hr, n,
                   CAST(ROW_NUMBER() OVER (ORDER BY hr) AS BIGINT) AS rn
            FROM h
        ),
        mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM s),
        v AS (
            SELECT a.rn AS k,
                   CAST(SUM(CASE WHEN a.n > b.n THEN 1
                                 WHEN a.n < b.n THEN -1 ELSE 0 END)
                        AS BIGINT) AS vk
            FROM s a JOIN s b ON a.rn <> b.rn
            GROUP BY 1
        ),
        u AS (
            SELECT k, CAST(SUM(vk) OVER (ORDER BY k) AS BIGINT) AS uk FROM v
        ),
        best AS (
            SELECT k, uk FROM u, mm WHERE k < m
            QUALIFY ROW_NUMBER() OVER (ORDER BY abs(uk) DESC, k ASC) = 1
        )
        SELECT b.k AS k, s2.hr AS split_hour, b.uk AS u_stat,
               CAST(abs(b.uk) AS BIGINT) AS u_abs, mm.m AS m
        FROM best b CROSS JOIN mm JOIN s s2 ON s2.rn = b.k + 1
    """
    # SAX: integer-split PAA segments + equi-depth order-statistic
    # breakpoints, all comparisons cross-multiplied
    out["sax_hourly_symbols"] = """
        WITH h AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT n,
                   CAST(ROW_NUMBER() OVER (ORDER BY hr) - 1 AS BIGINT) AS rn
            FROM h
        ),
        mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM s),
        paa AS (
            SELECT s.rn * 8 // mm.m AS seg,
                   CAST(COUNT(*) AS BIGINT) AS den,
                   CAST(SUM(s.n) AS BIGINT) AS num
            FROM s, mm GROUP BY 1
        ),
        ranked AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS r FROM s),
        br AS (
            SELECT ks.k, r2.n AS bval
            FROM (VALUES (1), (2), (3)) ks(k)
            CROSS JOIN mm
            JOIN ranked r2 ON r2.r = (ks.k * mm.m + 3) // 4
        )
        SELECT CAST(p.seg AS BIGINT) AS seg, p.den AS n_rows,
               p.num AS paa_num, p.den AS paa_den,
               CAST(SUM(CASE WHEN b.bval * p.den < p.num
                             THEN 1 ELSE 0 END) AS BIGINT) AS symbol
        FROM paa p CROSS JOIN br b
        GROUP BY 1, 2, 3, 4
    """
    # runs test: lower-median dichotomy (order statistic at ceil(m/2)),
    # median-equal hours dropped, runs = 1 + sign changes in hour order
    out["runs_test_hourly"] = """
        WITH h AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT hr, n,
                   CAST(ROW_NUMBER() OVER (ORDER BY hr) AS BIGINT) AS rn
            FROM h
        ),
        mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM s),
        med AS (
            SELECT n AS med FROM (
                SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS r FROM s
            ), mm WHERE r = (m + 1) // 2
        ),
        kept AS (
            SELECT s.rn, CASE WHEN s.n > med.med THEN 1 ELSE 0 END AS sg
            FROM s, med WHERE s.n <> med.med
        ),
        chg AS (SELECT sg, LAG(sg) OVER (ORDER BY rn) AS prev FROM kept)
        SELECT mm.m AS m, CAST(med.med AS BIGINT) AS med,
               CAST((SELECT COUNT(*) FROM kept WHERE sg = 1) AS BIGINT)
                   AS n_above,
               CAST((SELECT COUNT(*) FROM kept WHERE sg = 0) AS BIGINT)
                   AS n_below,
               CAST((SELECT CASE WHEN COUNT(*) = 0 THEN 0
                                 ELSE 1 + SUM(CASE WHEN prev IS NOT NULL
                                                    AND sg <> prev
                                              THEN 1 ELSE 0 END) END
                     FROM chg) AS BIGINT) AS n_runs
        FROM mm CROSS JOIN med
    """
    # MI(type, hour-of-day) in micro-nats: each ln(count) quantized once,
    # truncating final division (same idiom as daily_type_entropy)
    out["mi_type_hod"] = """
        WITH c AS (
            SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        tm AS (SELECT event_type, SUM(n) AS nt FROM c GROUP BY 1),
        hm AS (SELECT hod, SUM(n) AS nh FROM c GROUP BY 1),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS N FROM c),
        num AS (
            SELECT CAST(SUM(c.n * (
                       CAST(FLOOR(LN(c.n) * 1000000 + 0.5) AS BIGINT)
                     + CAST(FLOOR(LN(tot.N) * 1000000 + 0.5) AS BIGINT)
                     - CAST(FLOOR(LN(tm.nt) * 1000000 + 0.5) AS BIGINT)
                     - CAST(FLOOR(LN(hm.nh) * 1000000 + 0.5) AS BIGINT)
                   )) AS BIGINT) AS mi_num
            FROM c
            JOIN tm ON tm.event_type = c.event_type
            JOIN hm ON hm.hod = c.hod
            CROSS JOIN tot
        )
        SELECT tot.N AS n_events,
               CAST((SELECT COUNT(*) FROM tm) AS BIGINT) AS n_types,
               CAST((SELECT COUNT(*) FROM hm) AS BIGINT) AS n_hods,
               num.mi_num AS mi_num,
               CAST(num.mi_num // tot.N AS BIGINT) AS mi_micro_nats
        FROM tot CROSS JOIN num
    """
    # Croston: recursive CTE over demand days; z/p in milli-units with
    # DuckDB's truncating // matching the engine's _tdiv
    out["croston_daily"] = """
        WITH RECURSIVE d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        s AS (
            SELECT day, x,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k,
                   CAST(COALESCE(date_diff('day',
                        LAG(day) OVER (ORDER BY day), day), 1) AS BIGINT) AS q
            FROM d
        ),
        rec AS (
            SELECT k, day, x, q,
                   CAST(1000 * x AS BIGINT) AS z,
                   CAST(1000 * q AS BIGINT) AS p
            FROM s WHERE k = 1
            UNION ALL
            SELECT s.k, s.day, s.x, s.q,
                   CAST(rec.z + (1000 * s.x - rec.z) // 8 AS BIGINT),
                   CAST(rec.p + (1000 * s.q - rec.p) // 8 AS BIGINT)
            FROM rec JOIN s ON s.k = rec.k + 1
        )
        SELECT day, x, q, z AS z_milli, p AS p_milli FROM rec
    """
    # hard negatives: knn restatement with the other-label filter; IDs only
    out["hard_negatives_top3"] = """
        WITH q AS (
            SELECT vec_id AS qid, label AS ql, embedding::DOUBLE[] AS qe
            FROM embeddings WHERE vec_id < 10
        ),
        s AS (
            SELECT q.qid, e.vec_id AS nid,
                   list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS sim
            FROM embeddings e, q WHERE e.label <> q.ql
        ),
        r AS (
            SELECT qid, nid,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY sim DESC, nid ASC) AS rn
            FROM s
        )
        SELECT CAST(qid AS BIGINT) AS query_id,
               CAST(nid AS BIGINT) AS neighbor_id
        FROM r WHERE rn <= 3
    """
    # skip-gram transitions: LEAD at offsets 1..3 under (ts, event_id)
    out["skipgram_transitions_w3"] = """
        WITH l AS (
            SELECT event_type AS from_type,
                   LEAD(event_type, 1) OVER w AS t1,
                   LEAD(event_type, 2) OVER w AS t2,
                   LEAD(event_type, 3) OVER w AS t3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        u AS (
            SELECT from_type, t1 AS to_type, 1 AS gap FROM l
            WHERE t1 IS NOT NULL
            UNION ALL
            SELECT from_type, t2, 2 FROM l WHERE t2 IS NOT NULL
            UNION ALL
            SELECT from_type, t3, 3 FROM l WHERE t3 IS NOT NULL
        )
        SELECT from_type, to_type, CAST(gap AS BIGINT) AS gap,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM u GROUP BY 1, 2, 3
    """
    # RFM: recency vs the latest purchase day, order-statistic quartile
    # bounds at ceil(k*n/4), code = 1 + #bounds strictly below
    out["rfm_scores"] = """
        WITH p AS (
            SELECT user_id,
                   MAX(ts) AS last_ts,
                   CAST(COUNT(*) AS BIGINT) AS f_n,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                        AS BIGINT) AS m_cents
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        rr AS (
            SELECT user_id,
                   CAST(date_diff('day', date_trunc('day', last_ts),
                        (SELECT date_trunc('day', MAX(last_ts)) FROM p))
                        AS BIGINT) AS r_days,
                   f_n, m_cents
            FROM p
        ),
        b AS (
            SELECT list_sort(list(r_days)) AS lr,
                   list_sort(list(f_n)) AS lf,
                   list_sort(list(m_cents)) AS lm,
                   COUNT(*) AS n
            FROM rr
        ),
        bounds AS (
            SELECT t.k,
                   b.lr[CAST(CEIL(t.k * b.n / 4.0) AS BIGINT)] AS br,
                   b.lf[CAST(CEIL(t.k * b.n / 4.0) AS BIGINT)] AS bf,
                   b.lm[CAST(CEIL(t.k * b.n / 4.0) AS BIGINT)] AS bm
            FROM b, range(1, 4) t(k)
        )
        SELECT rr.user_id, rr.r_days, rr.f_n, rr.m_cents,
               CAST(1 + SUM(CASE WHEN bo.br < rr.r_days THEN 1 ELSE 0 END)
                    AS BIGINT) AS r_code,
               CAST(1 + SUM(CASE WHEN bo.bf < rr.f_n THEN 1 ELSE 0 END)
                    AS BIGINT) AS f_code,
               CAST(1 + SUM(CASE WHEN bo.bm < rr.m_cents THEN 1 ELSE 0 END)
                    AS BIGINT) AS m_code
        FROM rr CROSS JOIN bounds bo
        GROUP BY 1, 2, 3, 4
    """
    # Heaps law: per-term first-arrival doc id, counts below power-of-two
    # thresholds (last threshold covers the corpus); shared tokenizer
    out["heaps_law_documents"] = """
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents
        ),
        ft AS (
            SELECT term, MIN(doc_id) AS fd FROM tok
            WHERE term <> '' GROUP BY 1
        ),
        mx AS (SELECT MAX(doc_id) AS mid FROM documents),
        js AS (
            SELECT CAST(t.j AS BIGINT) AS j,
                   CAST(POWER(2, t.j) AS BIGINT) AS threshold
            FROM range(0, 63) t(j), mx
            WHERE CAST(POWER(2, t.j) AS BIGINT) // 2 <= mid
        )
        SELECT js.j, js.threshold,
               CAST((SELECT COUNT(*) FROM documents d
                     WHERE d.doc_id < js.threshold) AS BIGINT) AS n_docs,
               CAST((SELECT COUNT(*) FROM ft
                     WHERE ft.fd < js.threshold) AS BIGINT) AS vocab
        FROM js
    """
    # dow-adjusted anomalies: cross-multiplied k=1 sigma test against the
    # day's own weekday population (own value included; z^2 <= m-1 bounds
    # what any k can see on small weekday populations)
    out["dow_adjusted_anomalies"] = """
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        w AS (
            SELECT day, n, CAST(dayofweek(day) AS BIGINT) AS dow,
                   SUM(n) OVER (PARTITION BY dayofweek(day)) AS s,
                   SUM(n * n) OVER (PARTITION BY dayofweek(day)) AS q,
                   COUNT(*) OVER (PARTITION BY dayofweek(day)) AS m
            FROM d
        )
        SELECT day, n, dow,
               CAST(CASE WHEN m >= 2
                          AND (m * n - s) * (m * n - s) > 1 * (m * q - s * s)
                         THEN 1 ELSE 0 END AS BIGINT) AS dow_flag
        FROM w
    """
    # systematic sample: every 97th event under (ts, event_id) order
    out["systematic_sample_events"] = """
        WITH r AS (
            SELECT event_id,
                   ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rank
            FROM events
        )
        SELECT CAST(event_id AS BIGINT) AS event_id,
               CAST(rank AS BIGINT) AS rank
        FROM r WHERE (rank - 1) % 97 = 0
    """
    # forward as-of: earliest same-customer order at/after the event
    out["asof_next_order"] = """
        SELECT e.event_id,
               (SELECT MIN(o.o_orderdate) FROM orders o
                WHERE o.o_custkey = e.user_id
                  AND o.o_orderdate >= e.ts) AS next_order_ts
        FROM events e
    """
    # fan-out histogram: orders by exact lineitem count (k >= 1)
    out["fanout_histogram_lineitems"] = """
        WITH c AS (
            SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k
            FROM lineitem GROUP BY 1
        )
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM c GROUP BY 1
    """
    # near-dup cluster sizes: the neardup_groups closure + size census
    out["neardup_cluster_sizes"] = """
        WITH RECURSIVE pairs AS (
            SELECT a.vec_id AS u, b.vec_id AS v
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) > 0.4
        ),
        edges AS (
            SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs
        ),
        reach (vec_id, r) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON reach.vec_id = e.v
        ),
        grp AS (
            SELECT vec_id, MIN(r) AS rep FROM reach GROUP BY vec_id
        ),
        sz AS (SELECT rep, CAST(COUNT(*) AS BIGINT) AS size FROM grp GROUP BY 1)
        SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters
        FROM sz GROUP BY 1
    """
    # error budget: daily err ppm (floor), clamp overage, running sum
    out["error_budget_burn"] = """
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_tot,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_err
            FROM events GROUP BY 1
        ),
        w AS (
            SELECT day, n_tot, n_err,
                   CAST(1000000 * n_err // n_tot AS BIGINT) AS err_ppm
            FROM d
        )
        SELECT day, n_tot, n_err, err_ppm,
               CAST(GREATEST(err_ppm - 10000, 0) AS BIGINT) AS over_ppm,
               CAST(SUM(GREATEST(err_ppm - 10000, 0))
                    OVER (ORDER BY day) AS BIGINT) AS cum_over_ppm
        FROM w
    """
    # session overlap pairs: 30m-gap islands per user, pairs once by
    # (start, user, sess) ROW_NUMBER within the start-day bucket
    out["session_overlap_pairs"] = """
        WITH d AS (
            SELECT user_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(
                            LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                        ) > 1800000000 THEN 1 ELSE 0 END AS brk
            FROM events
        ),
        s AS (
            SELECT user_id, ts,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sess
            FROM d
        ),
        sess AS (
            SELECT user_id, sess,
                   MIN(ts) AS s_start, MAX(ts) AS s_end
            FROM s GROUP BY 1, 2
        ),
        r AS (
            SELECT user_id, sess, s_start, s_end,
                   CAST(date_trunc('day', s_start) AS TIMESTAMP) AS day,
                   ROW_NUMBER() OVER (
                       PARTITION BY date_trunc('day', s_start)
                       ORDER BY s_start, user_id, sess) AS rn
            FROM sess
        ),
        p AS (
            SELECT a.day, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM r a JOIN r b
              ON a.day = b.day AND a.rn < b.rn AND b.s_start <= a.s_end
            GROUP BY 1
        )
        SELECT r.day, CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(COALESCE(MAX(p.n_pairs), 0) AS BIGINT) AS n_overlap_pairs
        FROM r LEFT JOIN p ON p.day = r.day
        GROUP BY 1
    """
    # burstiness: (user,hour) census -> per-user sufficient stats +
    # cross-multiplied dispersion flag
    out["user_burstiness"] = """
        WITH h AS (
            SELECT user_id, date_trunc('hour', ts) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS m_hours,
               CAST(SUM(n) AS BIGINT) AS s_events,
               CAST(SUM(n * n) AS BIGINT) AS q_sumsq,
               CAST(CASE WHEN COUNT(*) * SUM(n * n) - SUM(n) * SUM(n)
                              > COUNT(*) * SUM(n)
                         THEN 1 ELSE 0 END AS BIGINT) AS overdispersed
        FROM h GROUP BY 1
    """
    # ordered 3-step funnel: chained strictly-after MINs
    out["funnel3_ordered"] = """
        WITH v AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
            WHERE e.event_type = 'click' GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
            WHERE e.event_type = 'purchase' GROUP BY 1
        )
        SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT)
                   AS n_users,
               CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
               CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
               CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full
    """
    # Markov entropy rate: transition census + micro-nat ln quantization,
    # truncating final division
    out["markov_entropy_rate"] = """
        WITH s AS (
            SELECT event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ),
        c AS (
            SELECT event_type AS cur, next_type AS nxt,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
        ),
        r AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS rn FROM c GROUP BY 1),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS T FROM c),
        num AS (
            SELECT CAST(SUM(c.n * (
                     CAST(FLOOR(LN(r.rn) * 1000000 + 0.5) AS BIGINT)
                   - CAST(FLOOR(LN(c.n) * 1000000 + 0.5) AS BIGINT)
                   )) AS BIGINT) AS h_num
            FROM c JOIN r ON r.cur = c.cur
        )
        SELECT tot.T AS n_transitions,
               CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_states,
               CAST(num.h_num // tot.T AS BIGINT) AS h_micro_nats
        FROM tot CROSS JOIN num
    """
    # LOO source deltas: per-source word sums, floor micro-means
    out["loo_source_word_deltas"] = """
        WITH w AS (
            SELECT source,
                   CAST(LEN(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nw
            FROM documents
        ),
        s AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(nw) AS BIGINT) AS sum_words
            FROM w GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(n_docs) AS BIGINT) AS nt,
                   CAST(SUM(sum_words) AS BIGINT) AS wt
            FROM s
        )
        SELECT s.source, s.n_docs, s.sum_words,
               CAST(1000000 * tot.wt // tot.nt AS BIGINT) AS all_mean_micro,
               CAST(CASE WHEN tot.nt - s.n_docs > 0
                         THEN 1000000 * (tot.wt - s.sum_words)
                              // (tot.nt - s.n_docs)
                         ELSE 0 END AS BIGINT) AS loo_mean_micro,
               CAST(CASE WHEN tot.nt - s.n_docs > 0
                         THEN 1000000 * (tot.wt - s.sum_words)
                              // (tot.nt - s.n_docs)
                              - 1000000 * tot.wt // tot.nt
                         ELSE 0 END AS BIGINT) AS delta_micro
        FROM s CROSS JOIN tot
    """
    # 2-D histogram: byte length x \S+ word count, floor buckets
    out["hist2d_len_words"] = """
        SELECT CAST(strlen(text) // 256 AS BIGINT) AS char_bucket,
               CAST(LEN(regexp_extract_all(text, '\\S+')) // 32 AS BIGINT)
                   AS word_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1, 2
    """
    # frequent triples: same cap contract as pairs (16 smallest part keys
    # per order), 3-way join, once per order
    out["frequent_triples_parts"] = """
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        capped AS (
            SELECT l_orderkey, l_partkey FROM d
            QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                       ORDER BY l_partkey) <= 16
        ),
        t AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   c.l_partkey AS part_c, COUNT(*) AS n
            FROM capped a
            JOIN capped b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
            JOIN capped c ON b.l_orderkey = c.l_orderkey
                         AND b.l_partkey < c.l_partkey
            GROUP BY 1, 2, 3
        )
        SELECT part_a, part_b, part_c, CAST(n AS BIGINT) AS n
        FROM t ORDER BY n DESC, part_a, part_b, part_c LIMIT 20
    """
    # session entry conversion: islands, FIRST_VALUE entry, any-purchase
    out["session_entry_conversion"] = """
        WITH d AS (
            SELECT user_id, event_type, ts, event_id,
                   CASE WHEN epoch_us(ts) - epoch_us(
                            LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                        ) > 1800000000 THEN 1 ELSE 0 END AS brk
            FROM events
        ),
        s AS (
            SELECT user_id, event_type, ts, event_id,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sess
            FROM d
        ),
        per AS (
            SELECT user_id, sess,
                   FIRST_VALUE(event_type) OVER (
                       PARTITION BY user_id, sess
                       ORDER BY ts, event_id) AS entry_type,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id, sess) AS conv
            FROM s
        ),
        one AS (
            SELECT DISTINCT user_id, sess, entry_type, conv FROM per
        )
        SELECT entry_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(conv) AS BIGINT) AS n_converted
        FROM one GROUP BY 1
    """
    # grouped correlation components: integer cents, broadcast dim join
    out["corr_disc_qty_by_brand"] = """
        SELECT p.p_brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(l.l_discount * 100) AS BIGINT))
                    AS BIGINT) AS sum_x,
               CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT))
                    AS BIGINT) AS sum_y,
               CAST(SUM(CAST(ROUND(l.l_discount * 100) AS BIGINT)
                      * CAST(ROUND(l.l_quantity * 100) AS BIGINT))
                    AS BIGINT) AS sum_xy,
               CAST(SUM(CAST(ROUND(l.l_discount * 100) AS BIGINT)
                      * CAST(ROUND(l.l_discount * 100) AS BIGINT))
                    AS BIGINT) AS sum_x2,
               CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)
                      * CAST(ROUND(l.l_quantity * 100) AS BIGINT))
                    AS BIGINT) AS sum_y2
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1
    """
    # transition drift: per-half LEAD censuses (halves filtered BEFORE the
    # LEAD so no pair spans the boundary), cross-multiplied TV numerator
    out["transition_drift_fortnights"] = """
        WITH h1 AS (
            SELECT event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events WHERE ts < TIMESTAMP '2024-01-16'
        ),
        h2 AS (
            SELECT event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events WHERE ts >= TIMESTAMP '2024-01-16'
        ),
        c1 AS (
            SELECT event_type AS f, next_type AS x,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM h1 WHERE next_type IS NOT NULL GROUP BY 1, 2
        ),
        c2 AS (
            SELECT event_type AS f, next_type AS x,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM h2 WHERE next_type IS NOT NULL GROUP BY 1, 2
        ),
        tot AS (
            SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM c1) AS t1,
                   (SELECT CAST(SUM(n) AS BIGINT) FROM c2) AS t2
        ),
        cells AS (
            SELECT COALESCE(c1.f, c2.f) AS f, COALESCE(c1.x, c2.x) AS x,
                   COALESCE(c1.n, 0) AS n1, COALESCE(c2.n, 0) AS n2
            FROM c1 FULL OUTER JOIN c2 ON c1.f = c2.f AND c1.x = c2.x
        )
        SELECT tot.t1, tot.t2,
               CAST((SELECT COUNT(*) FROM cells) AS BIGINT) AS n_cells,
               CAST((SELECT SUM(abs(n1 * tot.t2 - n2 * tot.t1)) FROM cells)
                    AS BIGINT) AS tv_num
        FROM tot
    """
    # daily exact lower median: explicit order-statistic selection
    out["daily_median_value"] = """
        WITH v AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(ROUND(value * 100) AS BIGINT) AS c
            FROM events
        ),
        r AS (
            SELECT day, c,
                   ROW_NUMBER() OVER (PARTITION BY day ORDER BY c) AS rn,
                   COUNT(*) OVER (PARTITION BY day) AS n
            FROM v
        )
        SELECT day, CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN c END) AS BIGINT)
                   AS median_cents
        FROM r GROUP BY 1
    """
    # casing census: RE2 class counts shared with the engine
    out["casing_census_documents"] = """
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(LEN(regexp_extract_all(text, '[A-Z]')) AS BIGINT)
                   AS n_upper,
               CAST(LEN(regexp_extract_all(text, '[a-z]')) AS BIGINT)
                   AS n_lower,
               CAST(LEN(regexp_extract_all(text, '(^|\\s)[A-Z][a-z]'))
                    AS BIGINT) AS n_title_words
        FROM documents
    """
    # exact-dup cluster sizes: group by text, size census over s >= 2
    out["exact_dup_cluster_sizes"] = """
        WITH u AS (
            SELECT text FROM documents
            UNION ALL SELECT props AS text FROM events
        ),
        g AS (
            SELECT text, CAST(COUNT(*) AS BIGINT) AS size
            FROM u GROUP BY 1 HAVING COUNT(*) >= 2
        )
        SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters
        FROM g GROUP BY 1
    """
    # weekday/weekend lift: cross-multiplied ppm over present days
    out["weekday_weekend_lift"] = """
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        s AS (
            SELECT CASE WHEN dayofweek(day) IN (0, 6) THEN 1 ELSE 0 END
                       AS we, n
            FROM d
        ),
        a AS (
            SELECT CAST(SUM(CASE WHEN we = 0 THEN n ELSE 0 END) AS BIGINT)
                       AS n_wd,
                   CAST(SUM(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS d_wd,
                   CAST(SUM(CASE WHEN we = 1 THEN n ELSE 0 END) AS BIGINT)
                       AS n_we,
                   CAST(SUM(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS d_we
            FROM s
        )
        SELECT n_wd AS n_weekday, d_wd AS d_weekday,
               n_we AS n_weekend, d_we AS d_weekend,
               CAST(CASE WHEN n_wd > 0 AND d_we > 0
                         THEN 1000000 * n_we * d_wd // (n_wd * d_we)
                         ELSE 0 END AS BIGINT) AS lift_ppm
        FROM a
    """
    # conversion latency percentiles: chained MIN-after gap per user,
    # LOWER order statistics at ceil(p*n/100)
    out["conversion_latency_percentiles"] = """
        WITH v AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
            WHERE e.event_type = 'purchase' GROUP BY 1
        ),
        g AS (
            SELECT (epoch_us(p.t2) - epoch_us(v.t1)) // 1000000 AS gap_s
            FROM p JOIN v ON v.user_id = p.user_id
        ),
        r AS (
            SELECT gap_s, ROW_NUMBER() OVER (ORDER BY gap_s) AS rn,
                   COUNT(*) OVER () AS n
            FROM g
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
               CAST(MAX(CASE WHEN rn = GREATEST((50 * n + 99) // 100, 1)
                             THEN gap_s END) AS BIGINT) AS p50_s,
               CAST(MAX(CASE WHEN rn = GREATEST((90 * n + 99) // 100, 1)
                             THEN gap_s END) AS BIGINT) AS p90_s
        FROM r
    """
    # part price census by size: exact cents aggregates
    out["part_price_size_census"] = """
        SELECT CAST(p_size AS BIGINT) AS p_size,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT))
                    AS BIGINT) AS price_cents,
               CAST(MIN(CAST(ROUND(p_retailprice * 100) AS BIGINT))
                    AS BIGINT) AS min_cents,
               CAST(MAX(CAST(ROUND(p_retailprice * 100) AS BIGINT))
                    AS BIGINT) AS max_cents
        FROM part GROUP BY 1
    """
    # supplier balance census per nation (broadcast dim restated as join)
    out["supplier_nation_balance"] = """
        SELECT n.n_name,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT))
                    AS BIGINT) AS bal_cents,
               CAST(MIN(CAST(ROUND(s.s_acctbal * 100) AS BIGINT))
                    AS BIGINT) AS min_cents,
               CAST(MAX(CAST(ROUND(s.s_acctbal * 100) AS BIGINT))
                    AS BIGINT) AS max_cents
        FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY 1
    """
    # top terms per language: shared tokenizer, QUALIFY grouped top-k
    out["top_terms_by_lang"] = """
        WITH tok AS (
            SELECT lang,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents
        ),
        c AS (
            SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS n
            FROM tok WHERE term <> '' GROUP BY 1, 2
        )
        SELECT lang, term, n FROM c
        QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY n DESC, term ASC) <= 5
    """
    # degree assortativity: endpoint-degree correlation components over
    # the both-directions trade edge list
    out["degree_assortativity_trade"] = """
        WITH pairs AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ),
        edges AS (
            SELECT c AS src, s + 1000000000 AS dst FROM pairs
            UNION ALL
            SELECT s + 1000000000 AS src, c AS dst FROM pairs
        ),
        deg AS (
            SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
            FROM edges GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(dx.deg) AS BIGINT) AS sum_x,
               CAST(SUM(dy.deg) AS BIGINT) AS sum_y,
               CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sum_xy,
               CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sum_x2,
               CAST(SUM(dy.deg * dy.deg) AS BIGINT) AS sum_y2
        FROM edges e
        JOIN deg dx ON dx.src = e.src
        JOIN deg dy ON dy.src = e.dst
    """
    # daily revenue ACF components: self-join at each lag offset; lag 0
    # carries (m, Q, S, S)
    out["value_acf_daily"] = """
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS c
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn
            FROM d
        ),
        mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM s),
        lags AS (
            SELECT CAST(t.l AS BIGINT) AS lag FROM range(1, 8) t(l), mm
            WHERE t.l <= m - 1
        ),
        lagged AS (
            SELECT lg.lag,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(a.c * b.c) AS BIGINT) AS sum_lag,
                   CAST(SUM(a.c) AS BIGINT) AS sum_head,
                   CAST(SUM(b.c) AS BIGINT) AS sum_tail
            FROM lags lg
            JOIN s a ON TRUE
            JOIN s b ON b.rn = a.rn + lg.lag
            GROUP BY 1
        ),
        zero AS (
            SELECT CAST(0 AS BIGINT) AS lag, mm.m AS n_pairs,
                   CAST((SELECT SUM(c * c) FROM s) AS BIGINT) AS sum_lag,
                   CAST((SELECT SUM(c) FROM s) AS BIGINT) AS sum_head,
                   CAST((SELECT SUM(c) FROM s) AS BIGINT) AS sum_tail
            FROM mm
        )
        SELECT * FROM zero UNION ALL SELECT * FROM lagged
    """
    # daily new terms: per-term first day over props tokens + day census
    out["daily_new_terms"] = """
        WITH tok AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   unnest(regexp_split_to_array(lower(props), '[^a-z0-9]+'))
                       AS term
            FROM events
        ),
        ft AS (
            SELECT term, MIN(day) AS fd FROM tok
            WHERE term <> '' GROUP BY 1
        )
        SELECT fd AS day, CAST(COUNT(*) AS BIGINT) AS new_terms
        FROM ft GROUP BY 1
    """
    # max quiet gap: LAG over present hours, earliest max
    out["max_quiet_gap_hourly"] = """
        WITH h AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr
            FROM events GROUP BY 1
        ),
        g AS (
            SELECT hr AS gap_end,
                   LAG(hr) OVER (ORDER BY hr) AS gap_start,
                   CAST((epoch_us(hr) - epoch_us(LAG(hr) OVER (ORDER BY hr)))
                        // 3600000000 AS BIGINT) AS gap_hours
            FROM h
        )
        SELECT gap_hours, gap_start, gap_end
        FROM g WHERE gap_start IS NOT NULL
        QUALIFY ROW_NUMBER() OVER (ORDER BY gap_hours DESC, gap_start ASC) = 1
    """
    # Pareto share: exact (spend desc, user asc) ranks, top ceil(n/5)
    out["revenue_pareto_share"] = """
        WITH s AS (
            SELECT user_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS spend
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        r AS (
            SELECT spend,
                   ROW_NUMBER() OVER (ORDER BY spend DESC, user_id ASC)
                       AS rn,
                   COUNT(*) OVER () AS n,
                   SUM(spend) OVER () AS total
            FROM s
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_users,
               CAST((MAX(n) + 4) // 5 AS BIGINT) AS k_top,
               CAST(SUM(CASE WHEN rn <= (n + 4) // 5 THEN spend ELSE 0 END)
                    AS BIGINT) AS top_cents,
               CAST(MAX(total) AS BIGINT) AS total_cents,
               CAST(1000000 * SUM(CASE WHEN rn <= (n + 4) // 5
                                       THEN spend ELSE 0 END)
                    // MAX(total) AS BIGINT) AS share_ppm
        FROM r
    """
    # median session duration: islands + explicit rank selection
    out["session_duration_median"] = """
        WITH d AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN epoch_us(ts) - epoch_us(
                            LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                        ) > 1800000000 THEN 1 ELSE 0 END AS brk
            FROM events
        ),
        s AS (
            SELECT user_id, ts,
                   SUM(brk) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sess
            FROM d
        ),
        dur AS (
            SELECT (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
                       AS dur_s
            FROM s GROUP BY user_id, sess
        ),
        r AS (
            SELECT dur_s, ROW_NUMBER() OVER (ORDER BY dur_s) AS rn,
                   COUNT(*) OVER () AS n
            FROM dur
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_sessions,
               CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN dur_s END)
                    AS BIGINT) AS median_s
        FROM r
    """
    # daily peak/trough: (day, hour) census, min/max per day, ratio ppm
    out["daily_peak_trough"] = """
        WITH h AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   date_trunc('hour', ts) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n_hours,
               CAST(MAX(n) AS BIGINT) AS peak,
               CAST(MIN(n) AS BIGINT) AS trough,
               CAST(1000000 * MAX(n) // MIN(n) AS BIGINT) AS ratio_ppm
        FROM h GROUP BY 1
    """
    # reply latency: adapter CTE + LEAD under (ts, turn_idx)
    out["reply_latency_census"] = """
        WITH t AS (
            SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
                   CAST(event_id AS INTEGER)       AS turn_idx,
                   event_type                      AS role,
                   ts
            FROM events
        ),
        l AS (
            SELECT role AS from_role,
                   LEAD(role) OVER w AS to_role,
                   epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS gap
            FROM t
            WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
        )
        SELECT from_role, to_role,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(gap) AS BIGINT) AS sum_gap_us
        FROM l WHERE to_role IS NOT NULL
        GROUP BY 1, 2
    """
    # repeat purchase rate: per-user purchase counts, >= 2 share in ppm
    out["repeat_purchase_rate"] = """
        WITH c AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_purchasers,
               CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_repeat,
               CAST(1000000 * SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END)
                    // COUNT(*) AS BIGINT) AS repeat_ppm
        FROM c
    """
    # co-purchase pairs: once per order containing both parts; per-order
    # distinct parts capped at the 64 SMALLEST part keys (the engine's
    # lexicographic-cap contract, restated via QUALIFY row_number)
    out["copurchase_part_pairs"] = """
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        capped AS (
            SELECT l_orderkey, l_partkey FROM d
            QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                       ORDER BY l_partkey) <= 64
        ),
        p AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS n
            FROM capped a
            JOIN capped b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        )
        SELECT part_a, part_b, CAST(n AS BIGINT) AS n
        FROM p ORDER BY n DESC, part_a ASC, part_b ASC LIMIT 20
    """
    # charclass census: the three named classes are 1-byte ASCII sets so
    # character counts equal byte counts; n_other closes against strlen
    # (BYTES), keeping the identity exact on multi-byte text too
    out["charclass_census_documents"] = """
        SELECT doc_id,
               CAST(length(text)
                    - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
                    AS BIGINT) AS n_alpha,
               CAST(length(text)
                    - length(regexp_replace(text, '[0-9]', '', 'g'))
                    AS BIGINT) AS n_digit,
               CAST(length(text)
                    - length(regexp_replace(text, '[\\t\\n\\v\\f\\r ]', '', 'g'))
                    AS BIGINT) AS n_space,
               CAST(strlen(text)
                    - (length(text)
                       - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
                    - (length(text)
                       - length(regexp_replace(text, '[0-9]', '', 'g')))
                    - (length(text)
                       - length(regexp_replace(text, '[\\t\\n\\v\\f\\r ]', '', 'g')))
                    AS BIGINT) AS n_other
        FROM documents
    """
    # spend deciles: bounds at 1-based rank ceil(d*n/10) of the sorted
    # per-customer spend; ties land in the LOWER bucket (spend > bound)
    out["spend_decile_census"] = """
        WITH s AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS spend
            FROM orders GROUP BY 1
        ),
        b AS (SELECT list_sort(list(spend)) AS l, COUNT(*) AS n FROM s),
        bounds AS (
            SELECT t.d AS d,
                   b.l[CAST(CEIL(t.d * b.n / 10.0) AS BIGINT)] AS v
            FROM b, range(1, 10) t(d)
        ),
        deciled AS (
            SELECT s.o_custkey, s.spend,
                   1 + SUM(CASE WHEN s.spend > bo.v THEN 1 ELSE 0 END)
                       AS decile
            FROM s CROSS JOIN bounds bo
            GROUP BY 1, 2
        )
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(spend) AS BIGINT) AS spend_cents
        FROM deciled GROUP BY 1
    """
    return out
