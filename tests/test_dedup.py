"""Dedup operators: exact, MinHash+LSH near-dup, SimHash — planted dups."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from pyreshaper_ray.stages.dedup import (
    MinHasher,
    exact_jaccard,
    shingle_hashes,
    simhash64,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the "
    "warm windowsill and the birds sing in the garden under a blue sky"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-word change
FAR = (
    "completely different content about database systems and distributed "
    "query processing engines with columnar storage and vectorized execution"
)


def _docs_table():
    texts = [BASE, NEAR, FAR, BASE, "tiny", ""]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_shingles_and_exact_jaccard():
    assert exact_jaccard(BASE, BASE) == 1.0
    j_near = exact_jaccard(BASE, NEAR)
    j_far = exact_jaccard(BASE, FAR)
    assert 0.7 < j_near < 1.0
    assert j_far < 0.05
    # degenerate: shorter than k tokens
    assert len(shingle_hashes("one two", 3)) > 0
    assert exact_jaccard("", "", 3) == 1.0


def test_minhash_estimates_jaccard():
    mh = MinHasher(n_perm=256)
    sa, sb = mh.signature(BASE), mh.signature(NEAR)
    est = float(np.mean(sa == sb))
    true = exact_jaccard(BASE, NEAR)
    assert abs(est - true) < 0.15
    sf = mh.signature(FAR)
    assert float(np.mean(sa == sf)) < 0.1
    # determinism across instances (seed-fixed)
    assert np.array_equal(MinHasher(n_perm=256).signature(BASE), sa)


def test_simhash_hamming_tracks_similarity():
    h_base, h_near, h_far = simhash64(BASE), simhash64(NEAR), simhash64(FAR)
    assert h_base == simhash64(BASE)  # deterministic
    d_near = bin(h_base ^ h_near).count("1")
    d_far = bin(h_base ^ h_far).count("1")
    assert d_near < d_far
    assert d_near <= 16
    assert simhash64("") == 0


def test_dedup_exact_stage(ray_session):
    import ray.data

    from pyreshaper_ray.stages.dedup import dedup_exact
    from pyreshaper_ray.util import collect_table

    out = collect_table(dedup_exact(ray.data.from_arrow(_docs_table())))
    rows = dict(zip(out["doc_id"].to_pylist(), out["n_copies"].to_pylist()))
    assert rows[0] == 2  # BASE appears at ids 0 and 3 → min id kept
    assert 3 not in rows
    assert rows[1] == 1 and rows[2] == 1


def test_minhash_lsh_finds_planted_neardup(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.dedup import minhash_dedup

    pq.write_table(_docs_table(), str(tmp_path / "documents.parquet"))
    verified = minhash_dedup(str(tmp_path), threshold=0.6).to_pandas()
    pairs = set(zip(verified["doc_a"], verified["doc_b"]))
    assert (0, 3) in pairs  # exact dup
    assert (0, 1) in pairs or (1, 3) in pairs  # near dup found via LSH
    assert all(j >= 0.6 for j in verified["jaccard"])
    # FAR must not pair with BASE
    assert (0, 2) not in pairs and (2, 3) not in pairs


def test_dedup_canonical_keeps_longest(ray_session, tmp_path):
    """Survivorship: within a planted near-dup cluster, the member with
    the most characters becomes canonical and is the only keeper."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.dedup import dedup_canonical

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet field toward the distant river bank every day"
    )
    longer = base + " until sunset falls"
    unrelated = (
        "completely different content about databases and distributed "
        "systems with nothing in common with the animal sentence at all"
    )
    docs = pa.table(
        {
            "doc_id": pa.array([10, 20, 30], pa.int64()),
            "text": pa.array([base, longer, unrelated]),
            "n_chars": pa.array(
                [len(base), len(longer), len(unrelated)], pa.int64()
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (
        dedup_canonical(str(tmp_path), threshold=0.5)
        .to_pandas()
        .set_index("doc_id")
    )
    assert sorted(out.index) == [10, 20]  # unrelated doc not in any group
    assert int(out.loc[10, "canonical_id"]) == 20
    assert int(out.loc[20, "canonical_id"]) == 20
    assert bool(out.loc[20, "keep"]) and not bool(out.loc[10, "keep"])


def test_dup_heavy_corpus_pairs_stay_linear(ray_session, tmp_path):
    """Adversarial all-duplicates corpus: N near-identical documents used to
    be an O(N²) pair blowup risk for the driver closure. The LSH star-pair
    cap keeps the VERIFIED pair list linear in N, the bounded union-find
    accepts it, and every copy lands in one canonical cluster."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.dedup import dedup_canonical, minhash_dedup

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet field toward the distant river bank every day"
    )
    n = 600  # all-pairs would be ~180k pairs; bucket size n > max_bucket
    # (256) trips the star cap, so the pair list stays linear
    texts = [base for _ in range(n)]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(1, n + 1)), pa.int64()),
            "text": pa.array(texts),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    pairs = minhash_dedup(str(tmp_path), threshold=0.5).to_pandas()
    # linear, not quadratic: the star cap bounds pairs per degenerate bucket
    assert 0 < len(pairs) < 20 * n

    out = dedup_canonical(str(tmp_path), threshold=0.5).to_pandas()
    assert len(out) == n  # every copy is a member of some group
    assert out["canonical_id"].nunique() == 1  # one cluster
    assert int(out["keep"].sum()) == 1


def test_bounded_union_find_raises_on_oversized_pair_list():
    import pytest as _pytest

    from pyreshaper_ray.util import bounded_union_find

    with _pytest.raises(RuntimeError, match="max_pairs"):
        bounded_union_find([1, 2, 3], [4, 5, 6], max_pairs=2)
    # under the bound: full compression to min-id representatives
    parent = bounded_union_find([1, 2], [2, 3])
    assert parent == {1: 1, 2: 1, 3: 1}


def test_ngram_jaccard_neighbors_hand(ray_session):
    import ray.data

    from pyreshaper_ray.stages.dedup import ngram_jaccard_neighbors

    # docs 0/1 identical -> 1e6 ppm; 1/2 disjoint trigrams -> 0 ppm;
    # doc 3 is shorter than k -> pairs (2,3) and (3,4) are skipped
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(["abcd", "abcd", "wxyz", "zz", "abcd"]),
        }
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r["jaccard_ppm"]
        for r in ngram_jaccard_neighbors(ray.data.from_arrow(t), k=3).take_all()
    }
    assert rows == {(0, 1): 1_000_000, (1, 2): 0}


def test_snm_neardup_planted(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.dedup import snm_neardup_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = [
        (1, base),
        (2, base + " today"),                     # near-dup, same prefix
        (3, base.replace("river", "ocean")),      # near-dup, same prefix
        (4, "completely different text about query engines and shuffles"),
        (5, "zzz unrelated filler words padding the corpus out"),
        # same prefix as base but mostly different tokens → below threshold
        (6, "the quick brown bear eats honey and sleeps all winter long"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }
    )
    out = snm_neardup_pairs(
        ray.data.from_arrow(t).repartition(3), threshold_ppm=500_000
    ).take_all()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard_ppm"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 500_000
    assert (1, 3) in pairs
    assert all(a < b for a, b in pairs)
    assert not any(4 in p or 5 in p for p in pairs)
    assert not any(6 in p for p in pairs)  # same block, below threshold

    # documented blocking limitation: a dup whose FIRST prefix_len chars
    # differ is not a candidate (multi-pass with another key is the answer)
    docs2 = [(1, base), (2, "xx " + base)]
    t2 = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs2], pa.int64()),
            "text": pa.array([d[1] for d in docs2], pa.string()),
        }
    )
    out2 = snm_neardup_pairs(ray.data.from_arrow(t2)).take_all()
    assert out2 == []


def test_snm_multipass_catches_prefix_divergent_dup(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.dedup import snm_neardup_multipass, snm_neardup_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = [
        (1, base),
        (2, "xx " + base),   # differs in the first chars → pass-1 blind spot
        (3, "totally unrelated filler text about engines"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    assert snm_neardup_pairs(ds).take_all() == []  # single-pass misses it
    out = snm_neardup_multipass(ds).take_all()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (1, 2) in pairs  # suffix pass blocks them together


def test_cross_source_contamination_planted(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.dedup import cross_source_contamination

    shared = "The Quick Brown Fox Jumps Over The Lazy Dog And Keeps Running"
    other = "completely different opening line that shares no prefix at all"
    t = pa.table(
        {
            "text": pa.array(
                [shared + " v1", shared + " v2", shared.lower() + " v3",
                 other, other + "!"],
                pa.string(),
            ),
            "source": pa.array(["s1", "s2", "s3", "s1", "s1"], pa.string()),
        }
    )
    out = {
        (r["source_a"], r["source_b"]): r["n_shared_keys"]
        for r in cross_source_contamination(
            ray.data.from_arrow(t).repartition(3), prefix_len=32
        ).take_all()
    }
    # the lowercased 32-char prefix unifies all three shared docs; the two
    # 'other' docs live in one source only → no pair
    assert out == {("s1", "s2"): 1, ("s1", "s3"): 1, ("s2", "s3"): 1}


def test_chunk_dedup_exact_planted(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.dedup import chunk_dedup_exact

    # chunk=5, stride=5 (no overlap): doc1 "aaaaabbbbb" -> chunks aaaaa,bbbbb
    # doc2 "aaaaa" duplicates doc1's first chunk; doc3 unique
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["aaaaabbbbb", "aaaaa", "zzzzz"], pa.string()),
        }
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): r["n_copies"]
        for r in chunk_dedup_exact(
            ray.data.from_arrow(t).repartition(2), chunk_chars=5, stride=5
        ).take_all()
    }
    assert out[(1, 0)] == 2  # aaaaa owned by (1,0), copied in doc2
    assert out[(1, 1)] == 1
    assert out[(3, 0)] == 1
    assert (2, 0) not in out


def test_dedup_normalized_collapses_case_and_whitespace(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.dedup import dedup_normalized

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["Hello  World", "hello world", "  HELLO\tWORLD \n", "other"],
                pa.string(),
            ),
        }
    )
    out = {
        r["doc_id"]: r["n_copies"]
        for r in dedup_normalized(ray.data.from_arrow(t).repartition(2)).take_all()
    }
    assert out == {1: 3, 4: 1}


def test_dup_ngram_coverage_planted(ray_session):
    """Two docs share one exact 5-gram; a third is untouched."""
    import ray.data

    from pyreshaper_ray.stages.dedup import dup_ngram_coverage

    shared = "alpha beta gamma delta epsilon"
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"intro {shared} outro one",          # 8 tokens
            f"{shared} completely different tail", # 8 tokens
            "nothing here repeats at all ever",    # 6 tokens
        ], pa.string()),
    })
    out = (
        dup_ngram_coverage(ray.data.from_arrow(t).repartition(2), n=5)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1: tokens 8, grams 4, the shared gram at pos 1 covers tokens 1-5
    assert out.loc[1, "n_tokens"] == 8
    assert out.loc[1, "n_grams"] == 4
    assert out.loc[1, "dup_grams"] == 1
    assert out.loc[1, "covered_tokens"] == 5
    # doc 2: shared gram at pos 0
    assert out.loc[2, "dup_grams"] == 1
    assert out.loc[2, "covered_tokens"] == 5
    # doc 3: clean
    assert out.loc[3, "dup_grams"] == 0
    assert out.loc[3, "covered_tokens"] == 0
    assert out.loc[3, "covered_ppm"] == 0


def test_dup_ngram_coverage_within_doc_repeat_not_dup(ray_session):
    """A gram repeated WITHIN one doc only is not cross-doc duplicated."""
    import ray.data

    from pyreshaper_ray.stages.dedup import dup_ngram_coverage

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([
            "a b c d e a b c d e",  # same 5-gram twice, same doc
            "totally unrelated words in this document",
        ], pa.string()),
    })
    out = dup_ngram_coverage(ray.data.from_arrow(t), n=5).to_pandas()
    assert int(out["dup_grams"].sum()) == 0
    assert int(out["covered_tokens"].sum()) == 0


def test_contamination_flags_planted(ray_session):
    """Training doc 1 shares an 8-gram with test doc 50; doc 2 is clean;
    test docs themselves are excluded from the output."""
    import ray.data

    from pyreshaper_ray.stages.dedup import contamination_flags

    shared = "one two three four five six seven eight"
    t = pa.table({
        "doc_id": pa.array([1, 2, 50], pa.int64()),
        "text": pa.array([
            f"prefix {shared} suffix",
            "totally clean document with nothing shared at all here",
            f"{shared} test doc tail",
        ], pa.string()),
    })
    out = (
        contamination_flags(
            ray.data.from_arrow(t).repartition(2), test_mod=50, n=8
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.index.tolist() == [1, 2]
    assert out.loc[1, "contaminated"] == 1 and out.loc[1, "test_grams"] == 1
    assert out.loc[2, "contaminated"] == 0 and out.loc[2, "test_grams"] == 0


def test_dup_span_extract_planted_passage(ray_session):
    """A passage shared verbatim by two documents must come back as one
    maximal span in each (0-based token indices, end inclusive); unique
    text around it must not extend the span; a shorter shared n-gram run
    below min_run must be dropped."""
    import ray.data

    from pyreshaper_ray.stages.dedup import dup_span_extract

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    short = "one two three four five"  # 5 tokens → exactly 1 window
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    f"unique0 prelude {shared} coda0 endx",
                    f"{shared} tail1 tail2 {short}",
                    f"intro2 {short} outro2a outro2b outro2c",
                ],
                pa.string(),
            ),
        }
    )
    out = (
        dup_span_extract(ray.data.from_arrow(docs), n=5, min_run=3)
        .to_pandas()
        .sort_values(["doc_id", "tok_start"])
        .reset_index(drop=True)
    )
    rows = list(map(tuple, out.values.tolist()))
    # shared = 8 tokens → 4 windows of 5, run length 4 >= 3.
    # doc0: tokens 2..9 → windows start 2..5; doc1: tokens 0..7 → 0..3.
    # `short` gives runs of 1 window (< min_run) in docs 1 and 2 → dropped.
    assert rows == [(0, 2, 9, 4), (1, 0, 7, 4)], rows
