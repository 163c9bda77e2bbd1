"""Text-analysis stages: token count, quality, hashing, language ID."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from pyreshaper_ray.stages.text import (
    LangId,
    content_hash_batch,
    fingerprint_batch,
    quality_batch,
    token_count_batch,
)


def _batch(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_token_count():
    out = token_count_batch(_batch(["a b  c", "", "  x ", "one"]))
    assert out["n_tokens"].to_pylist() == [3, 0, 1, 1]


def test_quality_signals():
    out = quality_batch(_batch(["The cat, the dog! 42 times?", ""]))
    row = {k: out[k][0].as_py() for k in out.column_names}
    assert row["n_chars"] == 27
    assert row["n_words"] == 6
    assert row["n_stopwords"] == 2  # 'the' twice (lowercased)
    assert row["n_punct"] == 3  # , ! ?
    assert row["n_digits"] == 2
    assert out["n_chars"][1].as_py() == 0


def test_content_hash_matches_md5():
    out = content_hash_batch(_batch(["hello", ""]))
    assert out["md5"][0].as_py() == hashlib.md5(b"hello").hexdigest()


def test_fingerprint_rolling_property():
    """Base-256 polynomial mod 2^61-1: verify against direct computation."""
    MOD = (1 << 61) - 1
    out = fingerprint_batch(_batch(["abc", ""]))
    expect = int.from_bytes(b"abc", "big") % MOD
    assert out["fingerprint"][0].as_py() == expect
    assert out["fingerprint"][1].as_py() == 0


def test_lang_id_on_real_sentences():
    samples = {
        "en": "the cat is on the table and it is sleeping in the sun",
        "fr": "le chat est sur la table et il dort dans le jardin pour un moment",
        "de": "die katze ist auf dem tisch und sie schläft mit den kindern im haus",
        "es": "el gato está en la mesa y duerme con los niños en una casa",
        "zh": "猫在桌子上睡觉，孩子们在房子里玩耍，天气很好，阳光明媚",
    }
    out = LangId()(_batch(list(samples.values())))
    preds = out["lang_pred"].to_pylist()
    assert preds == list(samples.keys())


def test_winnowing_substring_guarantee(ray_session):
    """Winnowing's defining property: documents sharing a substring of
    length >= w+k-1 MUST share a fingerprint; unrelated docs share ~none."""
    import numpy as np
    import pyarrow as pa

    from pyreshaper_ray.stages.text import winnow_batch

    rng = np.random.default_rng(5)
    alphabet = list("abcdefghijklmnopqrstuvwxyz ")
    def rand_text(n):
        return "".join(rng.choice(alphabet, n))

    shared = rand_text(40)  # >> w+k-1 = 13
    a = rand_text(300) + shared + rand_text(300)
    b = rand_text(250) + shared + rand_text(350)
    c = rand_text(900)  # unrelated
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([a, b, c], pa.string()),
        }
    )
    out = winnow_batch(t)
    fa, fb, fc = (set(x) for x in out["fingerprints"].to_pylist())
    assert fa & fb, "shared substring must share a fingerprint"
    assert len(fa & fc) <= 2  # random 61-bit collisions only
    # deterministic across calls
    out2 = winnow_batch(t)
    assert out["fingerprints"].to_pylist() == out2["fingerprints"].to_pylist()
    # short docs (< k chars) yield no fingerprints, not errors
    short = pa.table(
        {"doc_id": pa.array([9], pa.int64()), "text": pa.array(["hi"], pa.string())}
    )
    assert winnow_batch(short)["n_fingerprints"][0].as_py() == 0


def test_trending_terms_per_day_topk(ray_session):
    import numpy as np
    import ray.data

    from pyreshaper_ray.stages.text import trending_terms

    us = 1_000_000
    d1 = (1_700_006_400 // 86_400) * 86_400 * us  # a UTC midnight
    d2 = d1 + 86_400 * us
    t = pa.table(
        {
            "ts": pa.array(
                np.array([d1 + 5, d1 + 9, d2 + 1, d2 + 2], dtype=np.int64),
                pa.timestamp("us"),
            ),
            # day1: aa x3, bb x2, cc x1 -> top3 aa,bb,cc
            # day2: zz x2, aa x2 (tie -> aa first), yy x1
            "text": pa.array(
                ["aa bb aa. cc", "aa, bb", "zz aa yy", "aa zz"]
            ),
        }
    )
    rows = trending_terms(ray.data.from_arrow(t), k=3, unit="day").take_all()
    got = [(r["ts"] if "ts" in r else r["day"], r["term"], r["n"]) for r in rows]
    by_day = {}
    for day, term, n in got:
        by_day.setdefault(day, []).append((term, n))
    days = sorted(by_day)
    assert [t_ for t_, _ in by_day[days[0]]] == ["aa", "bb", "cc"]
    assert by_day[days[0]] == [("aa", 3), ("bb", 2), ("cc", 1)]
    assert by_day[days[1]] == [("aa", 2), ("zz", 2), ("yy", 1)]


def test_clean_text_collapses_and_trims(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import clean_text

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["  a\t\tb\n\nc  ", "x"]),
        }
    )
    rows = {r["doc_id"]: r for r in clean_text(ray.data.from_arrow(t)).take_all()}
    assert rows[1]["clean"] == "a b c" and rows[1]["n_chars_clean"] == 5
    assert rows[2]["clean"] == "x"


def test_redact_pii_planted(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import redact_pii

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "mail me at jo.doe+x@ex-ample.co.uk or call 415-555-1234.",
                    "two mails a@b.io c@d.org, phone 555 123 4567 ok",
                    "nothing here",
                ]
            ),
        }
    )
    rows = {r["doc_id"]: r for r in redact_pii(ray.data.from_arrow(t)).take_all()}
    assert rows[1]["red_text"] == "mail me at [EMAIL] or call [PHONE]."
    assert (rows[1]["n_emails"], rows[1]["n_phones"]) == (1, 1)
    assert rows[2]["red_text"] == "two mails [EMAIL] [EMAIL], phone [PHONE] ok"
    assert (rows[2]["n_emails"], rows[2]["n_phones"]) == (2, 1)
    assert rows[3]["red_text"] == "nothing here"
    assert (rows[3]["n_emails"], rows[3]["n_phones"]) == (0, 0)


def test_typo_term_pairs_planted(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import _edit_distance_is_1, typo_term_pairs

    # band check vs a tiny reference DP
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    words = ["cat", "cut", "cats", "scat", "dog", "dig", "dodge", "a", "at", ""]
    for x in words:
        for y in words:
            assert _edit_distance_is_1(x, y) == (lev(x, y) == 1), (x, y)

    # planted typo cluster: "batch"/"botch" (sub) and "merge"/"merg" (del)
    texts = (
        ["batch merge sort" for _ in range(5)]
        + ["botch merg sort" for _ in range(3)]
        + ["unrelated words here" for _ in range(2)]
    )
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(3)
    out = typo_term_pairs(ds, top_n=50)
    pairs = {(a, b) for a, b in zip(out["term_a"].to_pylist(), out["term_b"].to_pylist())}
    assert ("batch", "botch") in pairs
    assert ("merg", "merge") in pairs
    assert all(a < b for a, b in pairs)
    # counts travel with the pair
    d = {(a, b): (na, nb) for a, b, na, nb in zip(
        out["term_a"].to_pylist(), out["term_b"].to_pylist(),
        out["n_a"].to_pylist(), out["n_b"].to_pylist())}
    assert d[("batch", "botch")] == (5, 3)


def test_compress_ratio_orders_entropy():
    from pyreshaper_ray.stages.text import compress_ratio_batch

    import random

    rng = random.Random(7)
    noisy = "".join(chr(rng.randrange(33, 127)) for _ in range(2000))
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["abc " * 500, noisy, ""], pa.string()),
        }
    )
    out = compress_ratio_batch(batch)
    r = dict(zip(out["doc_id"].to_pylist(), out["ratio_ppm"].to_pylist()))
    assert r[1] < 100_000          # boilerplate compresses hard
    assert r[2] > 700_000          # random text barely compresses
    assert r[3] == 0               # empty doc
    # deterministic
    out2 = compress_ratio_batch(batch)
    assert out.equals(out2)


def test_bigram_lm_scores_planted(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import (
        BigramLmScore,
        bigram_lm_scores,
        train_char_bigram_lm,
    )

    natural = [
        "the quick brown fox jumps over the lazy dog",
        "the engine rolls up the transcript turns",
        "the table holds the ordered turns of the chat",
    ] * 5
    gibberish = ["zq xv jk qz vx kj zzqq xxvv" for _ in range(2)]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(natural) + len(gibberish))), pa.int64()),
            "text": pa.array(natural + gibberish, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    model = train_char_bigram_lm(ds)
    assert model["counts"].sum() == sum(len(s.encode()) - 1 for s in natural + gibberish)

    scored = {r["doc_id"]: r for r in bigram_lm_scores(ds, model=model).take_all()}
    nat_scores = [scored[i]["avg_neglog2_milli"] for i in range(len(natural))]
    gib_scores = [
        scored[i]["avg_neglog2_milli"]
        for i in range(len(natural), len(natural) + len(gibberish))
    ]
    # natural text scores better (lower neg-logprob) than gibberish
    assert max(nat_scores) < min(gib_scores)
    # block-count invariance: training on 1 block == 3 blocks
    model1 = train_char_bigram_lm(ray.data.from_arrow(t).repartition(1))
    assert (model1["counts"] == model["counts"]).all()
    # scoring determinism through the actor path
    again = {r["doc_id"]: r for r in bigram_lm_scores(ds, model=model).take_all()}
    assert all(again[k]["avg_neglog2_milli"] == v["avg_neglog2_milli"] for k, v in scored.items())
    # short doc edge: < 2 bytes → zero bigrams, zero score
    one = BigramLmScore(model)(
        pa.table({"doc_id": pa.array([9], pa.int64()), "text": pa.array(["x"], pa.string())})
    )
    assert one["n_bigrams"][0].as_py() == 0 and one["avg_neglog2_milli"][0].as_py() == 0


def test_sentence_stats_hand_computed():
    from pyreshaper_ray.stages.text import sentence_stats_batch

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "Hello world. How are you?  Fine!",
                    "no terminal punctuation here",
                    "...",
                    "",
                ],
                pa.string(),
            ),
        }
    )
    out = {r["doc_id"]: r for r in sentence_stats_batch(batch).to_pylist()}
    assert out[1]["n_sentences"] == 3
    # "Hello world" 11 + "How are you" 11 + "Fine" 4
    assert out[1]["sentence_chars"] == 26
    assert out[2]["n_sentences"] == 1
    assert out[3]["n_sentences"] == 0 and out[3]["sentence_chars"] == 0
    assert out[4]["n_sentences"] == 0


def test_context_assembly_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.text import context_assembly

    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c2", "c1", "c1"], pa.string()),
            "turn_idx": pa.array([2, 0, 0, 1], pa.int32()),
            "text": pa.array(["end", "solo", "hi", "mid"], pa.string()),
        }
    )
    out = {
        r["conv_id"]: r
        for r in context_assembly(
            ray.data.from_arrow(t).repartition(2)
        ).take_all()
    }
    assert out["c1"]["context_text"] == "hi\nmid\nend"
    assert out["c1"]["n_turns"] == 3
    assert out["c1"]["context_chars"] == len("hi\nmid\nend")
    assert out["c2"]["context_text"] == "solo" and out["c2"]["n_turns"] == 1


def test_pack_sequences_straddle_and_order(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.text import pack_sequences

    # tok_est = (n_chars+3)//4: 300 -> 75, 1000 -> 250, 4000 -> 1000
    t = pa.table(
        {
            "doc_id": pa.array([3, 1, 2, 10], pa.int64()),
            "source": pa.array(["s", "s", "s", "z"], pa.string()),
            "n_chars": pa.array([1000, 300, 4000, 0], pa.int64()),
        }
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            ray.data.from_arrow(t).repartition(2), budget=512
        ).take_all()
    }
    # source s packs in doc_id order: d1 (75 tok @ 0), d2 (1000 tok @ 75),
    # d3 (250 tok @ 1075)
    assert out[1]["bin_id"] == 0 and out[1]["bin_offset"] == 0
    assert out[1]["n_bins_spanned"] == 1
    assert out[2]["bin_id"] == 0 and out[2]["bin_offset"] == 75
    # doc 2 covers tokens 75..1074 -> bins 0,1,2
    assert out[2]["n_bins_spanned"] == 3
    assert out[3]["bin_id"] == 2 and out[3]["bin_offset"] == 1075 - 2 * 512
    # empty doc still occupies its slot in its own bin
    assert out[10]["tok_est"] == 0 and out[10]["n_bins_spanned"] == 1


def test_rag_chunks_straddle_empty_and_unicode(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.text import rag_chunks

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            # doc1: 10 chars -> chunks "abcde"(0), "defgh"(3), "ghij"(6)
            # doc2: empty -> one empty chunk
            # doc3: non-ASCII, 6 codepoints -> "héllø"(0), "llø—"(2)... see asserts
            "text": pa.array(["abcdefghij", "", "héllø—"], pa.string()),
        }
    )
    out = sorted(
        rag_chunks(
            ray.data.from_arrow(t).repartition(2), chunk_chars=5, stride=3
        ).take_all(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    d1 = [r for r in out if r["doc_id"] == 1]
    assert [r["chunk_text"] for r in d1] == ["abcde", "defgh", "ghij"]
    assert [r["chunk_start"] for r in d1] == [0, 3, 6]
    assert d1[-1]["chunk_chars"] == 4
    d2 = [r for r in out if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "" and d2[0]["chunk_chars"] == 0
    # codepoint (not byte) slicing: "héllø—" has 6 codepoints
    d3 = [r for r in out if r["doc_id"] == 3]
    assert [r["chunk_text"] for r in d3] == ["héllø", "lø—"]
    assert [r["chunk_chars"] for r in d3] == [5, 3]


def test_gopher_repetition_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.text import gopher_repetition

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the cat the dog THE bird",  # the x3, cat, dog, bird
                    "",  # zero words
                    "unique words only here",  # no repetition
                ],
                pa.string(),
            ),
        }
    )
    out = {
        r["doc_id"]: r
        for r in gopher_repetition(ray.data.from_arrow(t).repartition(2)).take_all()
    }
    assert out[1]["n_words"] == 6 and out[1]["n_distinct_words"] == 4
    assert out[1]["top_word_n"] == 3
    assert out[1]["dup_word_ppm"] == (6 - 4) * 1_000_000 // 6
    assert out[2]["n_words"] == 0 and out[2]["dup_word_ppm"] == 0
    assert out[3]["dup_word_ppm"] == 0 and out[3]["top_word_n"] == 1


def test_pack_sequences_ffd_properties(ray_session):
    import pyarrow as pa
    import ray.data

    from pyreshaper_ray.stages.text import pack_sequences_ffd

    # tok_est: 400, 300, 200, 100, 600(oversize), all one source
    n_chars = [1597, 1197, 797, 397, 2397]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "source": pa.array(["s"] * 5, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    rows = pack_sequences_ffd(
        ray.data.from_arrow(t).repartition(2), budget=512
    ).take_all()
    by_doc = {r["doc_id"]: r for r in rows}
    assert len(rows) == 5  # every doc placed exactly once
    # FFD order: 600(oversize bin0), 400(bin1), 300(bin2), 200(bin2? free=212
    # -> no, 300 leaves 212 so 200 doesn't fit -> bin1 free=112? no ->
    # walk it: bins after 600:[0], 400:[0,112], 300:[0,112,212],
    # 200 -> first fit is bin2 (212) -> free 12; 100 -> bin1 (112) -> 12
    assert by_doc[5]["bin_id"] == 0
    assert by_doc[1]["bin_id"] == 1
    assert by_doc[2]["bin_id"] == 2
    assert by_doc[3]["bin_id"] == 2
    assert by_doc[4]["bin_id"] == 1
    # capacity respected for non-oversize bins
    import collections

    fill = collections.Counter()
    for r in rows:
        fill[r["bin_id"]] += r["tok_est"]
    assert fill[1] <= 512 and fill[2] <= 512
    # deterministic across runs
    rows2 = pack_sequences_ffd(
        ray.data.from_arrow(t).repartition(3), budget=512
    ).take_all()
    assert sorted((r["doc_id"], r["bin_id"]) for r in rows2) == sorted(
        (r["doc_id"], r["bin_id"]) for r in rows
    )


def test_curation_funnel_hand_computed(ray_session):
    """Per-source attrition: total → length gate → quality gate → dedup."""
    import ray.data

    from pyreshaper_ray.stages.text import curation_funnel

    good = "the quick brown fox jumps over the lazy dog in a meadow of green grass today"
    assert len(good) >= 50
    texts = [
        (0, "a", good),                       # kept
        (1, "a", good),                       # qual-ok but dup of doc 0
        (2, "a", "short"),                    # fails length
        (3, "a", "x " * 30),                  # long, 30 words, no stopwords
        (4, "b", good + " again"),            # kept (source b)
        (5, "b", "the of to in is and a " * 2),  # 14 words < 10? no: 14 words, stopwords ok, len 44 < 50 -> fails length
    ]
    t = pa.table(
        {
            "doc_id": pa.array([x[0] for x in texts], pa.int64()),
            "source": pa.array([x[1] for x in texts], pa.string()),
            "text": pa.array([x[2] for x in texts], pa.string()),
        }
    )
    rows = {
        r["source"]: r
        for r in curation_funnel(ray.data.from_arrow(t).repartition(3)).take_all()
    }
    a, b = rows["a"], rows["b"]
    assert (a["n_total"], a["n_len_ok"], a["n_qual_ok"], a["n_kept"]) == (4, 3, 2, 1)
    assert (b["n_total"], b["n_len_ok"], b["n_qual_ok"], b["n_kept"]) == (2, 1, 1, 1)


def test_curation_funnel_monotone_on_corpus(ray_session):
    """On the real table the funnel is monotone non-increasing per source
    and kept never exceeds qual_ok."""
    import ray.data

    from pyreshaper_ray.stages.text import curation_funnel

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "source", "text"],
    )
    for r in curation_funnel(ds).take_all():
        assert r["n_total"] >= r["n_len_ok"] >= r["n_qual_ok"] >= r["n_kept"] >= 0


def test_lexical_diversity_hand(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import lexical_diversity_by_source

    t = pa.table(
        {
            "source": pa.array(["a", "a", "b"]),
            "text": pa.array(
                [
                    "the cat the cat runs",  # tok 5, dis 3
                    "dog!",                  # tok 1, dis 1
                    "",                      # tok 0, dis 0
                ]
            ),
        }
    )
    rows = {
        r["source"]: r
        for r in lexical_diversity_by_source(
            ray.data.from_arrow(t).repartition(2)
        ).take_all()
    }
    a, b = rows["a"], rows["b"]
    assert (a["n_docs"], a["sum_distinct_terms"], a["sum_tokens"]) == (2, 4, 6)
    assert a["ttr_ppm"] == 1_000_000 * 4 // 6
    assert (b["n_docs"], b["sum_distinct_terms"], b["sum_tokens"], b["ttr_ppm"]) == (
        1, 0, 0, 0,
    )


def test_source_mix_weights_degenerate_and_blend(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import source_mix_weights

    one = pa.table({"source": pa.array(["web"] * 4)})
    row = source_mix_weights(ray.data.from_arrow(one)).take_all()[0]
    assert row["n_docs"] == 4 and row["weight_ppm"] == 1_000_000

    two = pa.table({"source": pa.array(["web"] * 3 + ["book"])})
    rows = {r["source"]: r for r in
            source_mix_weights(ray.data.from_arrow(two)).take_all()}
    # λ=0.3: uniform share 150000 each; proportional 700000·3/4 and ·1/4
    assert rows["web"]["weight_ppm"] == 150_000 + 525_000
    assert rows["book"]["weight_ppm"] == 150_000 + 175_000


def test_dsir_weights_prefer_target_domain(ray_session):
    """Docs written in the target domain's vocabulary must outscore docs
    in the raw-only vocabulary; empty docs score 0."""
    import ray.data

    from pyreshaper_ray.stages.text import dsir_importance_weights

    target_docs = ["quantum flux entangles qubit lattices"] * 6
    raw_docs = ["market futures rally on cheap crude oil"] * 6
    probe_target = "qubit lattices entangles flux"
    probe_raw = "crude oil futures market"
    t = pa.table(
        {
            "doc_id": pa.array(range(14), pa.int64()),
            "source": pa.array(
                ["tgt"] * 6 + ["raw"] * 6 + ["probe", "probe"]
            ),
            "text": pa.array(
                target_docs + raw_docs + [probe_target, probe_raw]
            ),
        }
    )
    out = {
        r["doc_id"]: r["weight_unat"]
        for r in dsir_importance_weights(
            ray.data.from_arrow(t), target_source="tgt"
        ).take_all()
    }
    assert out[12] > 0 > out[13]

    empty = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "source": pa.array(["x"]),
            "text": pa.array([""]),
        }
    )
    row = dsir_importance_weights(
        ray.data.from_arrow(empty), target_source="x"
    ).take_all()[0]
    assert row["n_tokens"] == 0 and row["weight_unat"] == 0


def test_dsir_weights_block_layout_invariant(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import ray.data

    from pyreshaper_ray.stages.text import dsir_importance_weights

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rng = np.random.default_rng(3)
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 12)))
        for _ in range(40)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "source": pa.array(["src0" if i % 3 == 0 else "srcX"
                                for i in range(40)]),
            "text": pa.array(texts),
        }
    )
    a_path, b_path = tmp_path / "a.parquet", tmp_path / "b.parquet"
    pq.write_table(t, str(a_path))
    pq.write_table(t, str(b_path), row_group_size=7)

    def run(p):
        return (
            dsir_importance_weights(
                ray.data.read_parquet(str(p)), target_source="src0"
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    assert run(a_path).equals(run(b_path))


def test_boilerplate_census_planted_lines(ray_session):
    """A line planted in >20% of a source's docs counts as boilerplate;
    rare lines do not; repeats within one doc count once toward DF."""
    import ray.data

    from pyreshaper_ray.stages.text import boilerplate_line_census

    footer = "(c) example corp"
    docs = []
    for i in range(10):
        body = f"unique line {i}"
        text = body + "\n" + footer if i < 3 else body
        if i == 0:
            text += "\n" + footer  # repeat within the same doc: DF += 1 only
        docs.append(text)
    t = pa.table(
        {
            "doc_id": pa.array(range(10), pa.int64()),
            "source": pa.array(["web"] * 10),
            "text": pa.array(docs),
        }
    )
    row = boilerplate_line_census(
        ray.data.from_arrow(t), min_doc_frac_ppm=200_000
    ).take_all()[0]
    assert row["n_docs"] == 10
    # 10 unique body lines + the footer
    assert row["n_distinct_lines"] == 11
    assert row["n_boilerplate_lines"] == 1  # footer in 3/10 docs > 20%
    assert row["boilerplate_doc_hits"] == 3


def test_bm25_rank_hand_case(ray_session):
    """3 docs; query hits 2 of them; BM25 fixed-point floors verified
    against a direct big-int restatement of the rational form."""
    import ray.data

    from pyreshaper_ray.stages.text import bm25_rank

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "data data pipelines move data",      # dl=5, tf(data)=3
            "a model trains on data",             # dl=5, tf(data)=1, tf(model)=1
            "nothing relevant here at all",       # dl=5
        ]),
    })
    out = bm25_rank(
        ray.data.from_arrow(docs).repartition(2),
        query_terms=("data", "model"),
        top_n=10,
    )
    got = dict(zip(out["doc_id"].to_pylist(), out["score"].to_pylist()))
    N, T = 3, 15

    def score(tf, dl, df):
        idf = int(np.floor(np.log(N / df) * 1e6 + 0.5))
        return (idf * tf * 22 * T) // (10 * tf * T + 3 * T + 9 * dl * N)

    want = {
        1: score(3, 5, 2),
        2: score(1, 5, 2) + score(1, 5, 1),
    }
    assert got == want
    # ranking order: higher score first, doc_id tiebreak
    ranked = out["doc_id"].to_pylist()
    scores = out["score"].to_pylist()
    assert scores == sorted(scores, reverse=True)
    assert len(ranked) == 2


def test_bm25_rank_empty_and_no_hits(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import bm25_rank

    docs = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["completely unrelated words"]),
    })
    out = bm25_rank(ray.data.from_arrow(docs), query_terms=("zzz",))
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "score"]


def test_association_rules_hand_case(ray_session):
    """4 docs: {x,y} in 3 docs, x in 4, y in 3 -> exact metrics."""
    import ray.data

    from pyreshaper_ray.stages.text import association_rules

    t = pa.table({
        "text": pa.array([
            "x y", "x y", "x y", "x z",
        ], pa.string()),
    })
    out = association_rules(
        ray.data.from_arrow(t).repartition(2), n_docs=4, support_ppm=500_000
    ).to_pandas()
    # pairs above 50% support: (x,y) n=3 (75%); (x,z) n=1 (25%) filtered
    assert out["term_a"].tolist() == ["x"] and out["term_b"].tolist() == ["y"]
    r = out.iloc[0]
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (3, 4, 3)
    assert r["support_ppm"] == 750_000
    assert r["conf_ab_ppm"] == 750_000      # 3/4
    assert r["conf_ba_ppm"] == 1_000_000    # 3/3
    assert r["lift_ppm"] == 1_000_000       # 3*4/(4*3)


def test_association_rules_respects_term_cap(ray_session):
    """The per-doc cap applies to BOTH the pair and the term census."""
    import ray.data

    from pyreshaper_ray.stages.text import association_rules

    # cap=2 keeps only the 2 lexicographically-first distinct terms: doc1
    # {a,b} (c dropped), doc2 {a,b}
    t = pa.table({"text": pa.array(["a b c", "b a"], pa.string())})
    out = association_rules(
        ray.data.from_arrow(t), n_docs=2, support_ppm=500_000, max_doc_terms=2
    ).to_pandas()
    assert out["term_a"].tolist() == ["a"]
    assert out["n_a"].tolist() == [2] and out["n_b"].tolist() == [2]
    assert "c" not in set(out["term_b"])


def test_rrf_fuse_hand_case(ray_session):
    """Doc best on one signal and mid on the other beats docs that are
    top-1 on a single signal only when the reciprocal sums say so —
    checked against a hand-computed fusion table."""
    import ray.data

    from pyreshaper_ray.stages.text import rrf_fuse_documents

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        # chars: d1=30, d2=20, d3=10 -> rank_chars 1,2,3
        # terms: d1=1 ('aaa'), d2=3, d3=2 -> rank_terms 3,1,2
        "text": pa.array(["aaa aaa", "a b c", "x y x"], pa.string()),
        "n_chars": pa.array([30, 20, 10], pa.int64()),
    })
    out = (
        rrf_fuse_documents(ray.data.from_arrow(t).repartition(2), k=60, top_n=3)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "rank_chars"] == 1 and out.loc[1, "rank_terms"] == 3
    assert out.loc[2, "rank_chars"] == 2 and out.loc[2, "rank_terms"] == 1
    assert out.loc[3, "rank_terms"] == 2
    m = 1_000_000
    assert out.loc[1, "rrf_micro"] == m // 61 + m // 63
    assert out.loc[2, "rrf_micro"] == m // 62 + m // 61
    # d2 (16393+16129) beats d1 (16393+15873)
    assert out.index.tolist()[0] == 2


def test_global_row_numbers_ties_break_on_id(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import _global_row_numbers

    t = pa.table({
        "doc_id": pa.array([5, 1, 9, 3], pa.int64()),
        "s": pa.array([7, 7, 7, 2], pa.int64()),
    })
    out = (
        _global_row_numbers(ray.data.from_arrow(t).repartition(3), "s")
        .to_pandas()
        .set_index("doc_id")["rank"]
    )
    assert out.loc[1] == 1 and out.loc[5] == 2 and out.loc[9] == 3
    assert out.loc[3] == 4


def test_bpe_token_count_hand_case(ray_session):
    """Contractions split, space attaches to the following run, symbol
    runs separate from letters."""
    import ray.data

    from pyreshaper_ray.stages.text import bpe_token_count_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            # "it" + "'s" + " ok" -> 3
            "it's ok",
            # "Hello" + "," + " world" + "!!" -> 4
            "Hello, world!!",
            # "a1b": "a" + "1" + "b" -> 3
            "a1b",
        ], pa.string()),
    })
    out = bpe_token_count_batch(t)
    assert out["n_pretokens"].to_pylist() == [3, 4, 3]


def test_zipf_slope_exact_power_law(ray_session):
    """A corpus engineered to exact f_r = 64 >> (r-1) gives slope ln2-exact:
    b = -ln(2)/ln(2)? No — freqs 64,32,16,8 over ranks 1..4; the micro-nat
    LS slope is hand-checkable against the closed-form big-int fold."""
    import ray.data

    from pyreshaper_ray.stages.text import zipf_slope

    # build a tiny corpus with exact term frequencies: a×64 b×32 c×16 d×8
    words = ["aa"] * 64 + ["bb"] * 32 + ["cc"] * 16 + ["dd"] * 8
    t = pa.table({"text": pa.array([" ".join(words)], pa.string())})
    out = zipf_slope(ray.data.from_arrow(t), top_v=4).to_pandas()
    assert out["n_terms"].tolist() == [4]
    assert out["top_freq"].tolist() == [64]
    # reference fold in python ints
    import numpy as np

    r = np.arange(1, 5)
    f = np.array([64, 32, 16, 8])
    x = np.floor(np.log(r) * 1e6 + 0.5).astype(int)
    y = np.floor(np.log(f) * 1e6 + 0.5).astype(int)
    n = 4
    num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    den = n * int((x * x).sum()) - int(x.sum()) ** 2
    want = (1 if num >= 0 else -1) * (abs(1_000_000 * num) // abs(den))
    assert out["slope_micro"].tolist() == [want]
    assert want < -1_050_000  # steeper than -1 (halving per rank)


def test_zipf_slope_short_vocab_empty(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import zipf_slope

    t = pa.table({"text": pa.array(["solo solo solo"], pa.string())})
    assert zipf_slope(ray.data.from_arrow(t)).num_rows == 0


def test_flesch_hand_case(ray_session):
    """'The cat sat. It ran!' -> 5 words, 2 sentences, 5 vowel groups."""
    import ray.data

    from pyreshaper_ray.stages.text import flesch_readability

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["The cat sat. It ran!", ""], pa.string()),
    })
    out = (
        flesch_readability(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
    )
    r = out.loc[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 5)
    want = 206_835 - (1015 * 5 * 1000) // 2 - (84_600 * 5 * 1000) // 5
    assert r["flesch_milli"] == want
    # zero-word doc: base constant, sentence floor 1
    z = out.loc[2]
    assert (z["n_words"], z["n_sentences"], z["flesch_milli"]) == (0, 1, 206_835)


def test_tv_distance_hand_cases(ray_session):
    """Identical distributions -> 0; disjoint vocabularies -> 1e6."""
    import ray.data

    from pyreshaper_ray.stages.text import tv_distance_sources

    same = pa.table({
        "source": pa.array(["src0", "src1"], pa.string()),
        "text": pa.array(["aa bb aa", "aa bb aa"], pa.string()),
    })
    out = tv_distance_sources(ray.data.from_arrow(same), "src0", "src1").to_pydict()
    assert out["tv_ppm"] == [0]
    disjoint = pa.table({
        "source": pa.array(["src0", "src1"], pa.string()),
        "text": pa.array(["aa aa aa", "bb bb bb"], pa.string()),
    })
    out2 = tv_distance_sources(
        ray.data.from_arrow(disjoint), "src0", "src1"
    ).to_pydict()
    assert out2["tv_ppm"] == [1_000_000]
    # half overlap: a = {x:1, y:1}, b = {x:2} -> TV = 1/2
    half = pa.table({
        "source": pa.array(["src0", "src1"], pa.string()),
        "text": pa.array(["x y", "x x"], pa.string()),
    })
    out3 = tv_distance_sources(ray.data.from_arrow(half), "src0", "src1").to_pydict()
    assert out3["tv_ppm"] == [500_000]


def test_fastss_edit1_join_planted(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import fastss_edit1_join

    # full-vocabulary coverage: pairs OUTSIDE any top-N cut, plus a
    # transposition ("form"/"from", shares deletion keys but distance 2 —
    # the verify step must reject it)
    texts = (
        ["batch merge sort once" for _ in range(3)]
        + ["botch merg sort from"]
        + ["form 00123 00124 10123 zz"]
    )
    ds = ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(3)
    out = fastss_edit1_join(ds).to_pandas()
    pairs = set(zip(out["term_a"], out["term_b"]))
    assert ("batch", "botch") in pairs  # substitution
    assert ("merg", "merge") in pairs  # deletion/insertion
    assert ("00123", "00124") in pairs  # numeric-ID substitution
    assert ("00123", "10123") in pairs
    assert ("form", "from") not in pairs  # transposition = distance 2
    assert ("00124", "10123") not in pairs  # distance 2
    # orientation + counts travel with the pair
    assert all(a < b for a, b in pairs)
    d = {(a, b): (na, nb) for a, b, na, nb in zip(
        out["term_a"], out["term_b"], out["n_a"], out["n_b"])}
    assert d[("batch", "botch")] == (3, 1)
    # agrees with the brute-force top-N miner on its own slice
    from pyreshaper_ray.stages.text import typo_term_pairs

    brute = typo_term_pairs(ds, top_n=1000)
    assert set(zip(brute["term_a"].to_pylist(), brute["term_b"].to_pylist())) == pairs


def test_charclass_census_classes_and_bytes(ray_session):
    """Hand strings: class counts per document, empty doc handled exactly
    (the reduceat-vs-prefix-sum edge), non-ASCII counted as OTHER bytes."""
    import ray.data

    from pyreshaper_ray.stages.text import charclass_census

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "Ab1 \t\nz",   # 3 alpha, 1 digit, 3 space
                    "",             # empty document
                    "1234!?",       # 4 digit, 2 other
                    "café",    # 3 alpha + 2 UTF-8 bytes of é = other
                ],
                pa.string(),
            ),
        }
    )
    out = (
        charclass_census(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rows = list(
        out[["n_alpha", "n_digit", "n_space", "n_other"]].itertuples(
            index=False, name=None
        )
    )
    assert rows == [(3, 1, 3, 0), (0, 0, 0, 0), (0, 4, 0, 2), (3, 0, 0, 2)]


def test_heaps_law_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import heaps_law_documents

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 5], pa.int64()),
            "text": pa.array(
                ["a b", "b c", "c d e", "a f"], pa.string()
            ),
        }
    )
    out = (
        heaps_law_documents(ray.data.from_arrow(docs).repartition(2))
        .to_pandas()
        .set_index("j")
    )
    # max doc_id = 5 -> thresholds 1,2,4,8 (j=0..3; 8//2=4 <= 5, 16//2 > 5)
    assert list(out["threshold"]) == [1, 2, 4, 8]
    # vocab below T: T=1 -> doc0 only {a,b}=2; T=2 -> +{c}=3; T=4 -> +{d,e}=5
    # T=8 -> +{f}=6; docs below: 1,2,3,4
    assert list(out["n_docs"]) == [1, 2, 3, 4]
    assert list(out["vocab"]) == [2, 3, 5, 6]


def test_casing_census_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import casing_census

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "The Quick brown Fox",  # 3 title words (The, Quick, Fox)
                    "ALL CAPS HERE",        # uppercase only, no title words
                    "no caps at all",
                ],
                pa.string(),
            ),
        }
    )
    out = (
        casing_census(ray.data.from_arrow(docs).repartition(2))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_title_words"] == 3
    assert out.loc[0, "n_upper"] == 3
    assert out.loc[1, "n_upper"] == 11 and out.loc[1, "n_title_words"] == 0
    assert out.loc[2, "n_upper"] == 0 and out.loc[2, "n_lower"] == 11


def test_langid_confusion_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.text import langid_confusion

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "lang": pa.array(["en", "de", "es", "fr"], pa.string()),
            "text": pa.array(
                [
                    "the cat and the dog are in the house with a ball",
                    "der Hund und die Katze sind nicht in das Haus und der Garten",
                    "el perro y la casa que no está en los árboles de la ciudad",
                    "le chien et la maison que je ne vois pas dans les arbres",
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = langid_confusion(str(tmp_path)).to_pandas()
    diag = out[out.true_lang == out.pred_lang]["n"].sum()
    assert diag == 4, out.to_string()  # perfect on planted stopword text


def test_daily_new_terms_hand_case(ray_session):
    import ray.data

    from pyreshaper_ray.stages.text import daily_new_terms

    ev = pa.table(
        {
            "props": pa.array(
                ["alpha beta", "beta gamma", "delta", "alpha"], pa.string()
            ),
            "ts": pa.array(
                [
                    np.datetime64("2024-01-01T10:00:00", "us"),
                    np.datetime64("2024-01-02T10:00:00", "us"),
                    np.datetime64("2024-01-02T11:00:00", "us"),
                    np.datetime64("2024-01-03T10:00:00", "us"),
                ],
                pa.timestamp("us"),
            ),
        }
    )
    out = (
        daily_new_terms(ray.data.from_arrow(ev).repartition(2))
        .to_pandas()
        .sort_values("day")
    )
    # day1: alpha, beta new (2); day2: gamma, delta new (2); day3: none
    assert list(out["new_terms"]) == [2, 2]
    assert len(out) == 2


def test_train_bpe_merges_hand_case():
    """Hand-verified merge sequence (Sennrich-style, GPT-2 pretokens):
    corpus 'low low low lower lowest' + 'newest newest widest'.
    Pretokens: 'low'x1, ' low'x2, ' lower'x1, ' lowest'x1 (leading-space
    variants), 'newest'x1, ' newest'x1, ' widest'x1.
    Pair counts round 1: ('l','o')=5, ('o','w')=5, (' ','l')=4, ('e','s')=4,
    ('s','t')=4, ... -> tie ('l','o') vs ('o','w') breaks lexicographically
    to ('l','o')."""
    from pyreshaper_ray.stages.text import BpeTokenCountStage, train_bpe_merges

    m = train_bpe_merges(
        ["low low low lower lowest", "newest newest widest"], n_merges=6
    )
    assert m == [
        ("l", "o"),      # 5 occurrences, lexicographic winner of the tie
        ("lo", "w"),     # 5
        (" ", "low"),    # 4
        ("e", "s"),      # 4 (beats (' ','low')? no: equal 4, ' ' < 'e' -> after)
        ("es", "t"),     # 4
        ("e", "w"),      # 2
    ]
    st = BpeTokenCountStage(m)
    # ' low' fully merges to one token; ' lower' = ' low'+'e'+'r';
    # ' lowest' = ' low'+'est'; 'newest' = 'n'+'ew'+'est'
    assert st._n_pieces(" low") == 1
    assert st._n_pieces(" lower") == 3
    assert st._n_pieces(" lowest") == 2
    assert st._n_pieces("newest") == 3
    # unseen word falls back toward characters (only trained merges apply)
    assert st._n_pieces("zzz") == 3


def test_bpe_merge_token_count_stage(ray_session):
    """Batch counting: identical texts get identical counts, counts are
    bounded above by the pretoken-character total and below by the
    pretoken count; determinism across runs."""
    from pyreshaper_ray.stages.text import (
        BpeTokenCountStage,
        train_bpe_merges,
    )

    texts = ["the cat sat on the mat", "the cat sat on the mat", "xyzzy"]
    merges = train_bpe_merges(texts, n_merges=16)
    st = BpeTokenCountStage(merges)
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = st(batch).to_pydict()
    assert out["n_tokens"][0] == out["n_tokens"][1]
    assert 0 < out["n_tokens"][2] <= len("xyzzy")
    out2 = BpeTokenCountStage(merges)(batch).to_pydict()
    assert out == out2


def test_bpe_merge_token_count_pipeline(ray_session):
    """End-to-end actor-pool run over the testdata documents table: every
    doc gets a count, exact counts <= pretoken-regex character mass, and
    merged counts <= pretoken counts (merges only ever shrink)."""
    import __ray_entry__ as e

    sfd = "/root/testdata/sf0.001"
    merged = (
        e.queries()["bpe_merge_token_count"](sfd)
        .to_pandas()
        .set_index("doc_id")["n_tokens"]
    )
    pre = (
        e.queries()["bpe_token_count"](sfd)
        .to_pandas()
        .set_index("doc_id")
        .iloc[:, 0]
    )
    assert len(merged) == len(pre) and len(merged) > 0
    # BPE starts from characters and merges within pretokens: each pretoken
    # contributes >= 1 token, so the exact count never drops below the
    # pretoken count
    assert (merged.loc[pre.index] >= pre).all()
