"""Text-analysis stages for training-data pipelines over `documents`.

Language-ID (stopword-profile heuristic), quality scoring, token counting,
content hashing, and rolling-hash fingerprinting — each a vectorized
``map_batches`` stage; the language profiles and compiled regexes live in an
actor (``__init__`` once per actor, not per batch).

Regex semantics note: both pyarrow and DuckDB use RE2, so the oracle SQL in
``__ray_entry__`` can restate `\\S+` / `\\b(...)\\b` counts exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

STOPWORD_REGEX = r"\b(the|a|and|of|to|in|is)\b"

# tiny public-knowledge stopword profiles; zh detected by CJK codepoints
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for on with as are was".split()),
    "fr": frozenset("le la les de des du et en un une est que pour dans".split()),
    "de": frozenset("der die das und ist von zu mit den ein eine nicht im".split()),
    "es": frozenset("el la los las de y en un una es que por para con".split()),
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens = number of maximal non-whitespace runs (RE2 `\\S+`)."""
    n = pc.count_substring_regex(batch[text_col], pattern=r"\S+")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(n, pa.int64()),
        }
    )


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality signals, integer-domain: chars, words, stopword hits,
    punctuation marks (.,!?;:), digit chars."""
    text = batch[text_col]
    lower = pc.utf8_lower(text)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_words": pc.cast(pc.count_substring_regex(text, pattern=r"\S+"), pa.int64()),
            "n_stopwords": pc.cast(
                pc.count_substring_regex(lower, pattern=STOPWORD_REGEX), pa.int64()
            ),
            "n_punct": pc.cast(
                pc.count_substring_regex(text, pattern=r"[.,!?;:]"), pa.int64()
            ),
            "n_digits": pc.cast(
                pc.count_substring_regex(text, pattern=r"[0-9]"), pa.int64()
            ),
        }
    )


def content_hash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 hex digest per document (DuckDB ``md5()`` oracle-checkable)."""
    texts = batch[text_col].to_pylist()
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.table(
        {"doc_id": batch["doc_id"], "md5": pa.array(digests, pa.string())}
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic 61-bit polynomial rolling-hash document fingerprint.

    h = sum(byte[i] * 256^(n-1-i)) mod 2^61-1 — i.e. the base-256 polynomial
    hash, computed as one big-int ``int.from_bytes`` mod p per document
    (C-speed; no per-byte Python). No SQL analog → rows-only driver check.
    """
    MOD = (1 << 61) - 1
    out = np.empty(batch.num_rows, dtype=np.int64)
    for i, t in enumerate(batch[text_col].to_pylist()):
        out[i] = int.from_bytes(t.encode("utf-8"), "big") % MOD
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(out, pa.int64())}
    )


class LangId:
    """Stopword-profile language classifier (n-gram-free heuristic) —
    fully vectorized: per-language stopword-occurrence counts come from one
    RE2 pass each (patterns compiled once per actor in ``__init__``), the
    winner is an argmax over the score matrix (first language wins ties, in
    profile order), and a CJK-codepoint count shortcuts to zh. No per-row
    Python anywhere."""

    CJK_PATTERN = r"[一-鿿]"

    def __init__(self) -> None:
        self.langs = list(_LANG_PROFILES)
        self.patterns = {
            lang: r"\b(" + "|".join(sorted(words)) + r")\b"
            for lang, words in _LANG_PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch["text"])
        prefix = pc.utf8_slice_codeunits(lower, start=0, stop=200)
        cjk = pc.count_substring_regex(prefix, pattern=self.CJK_PATTERN).to_numpy(
            zero_copy_only=False
        )
        scores = np.stack(
            [
                pc.count_substring_regex(lower, pattern=self.patterns[lang]).to_numpy(
                    zero_copy_only=False
                )
                for lang in self.langs
            ]
        )  # (n_langs, n_docs)
        best = np.array(self.langs, dtype=object)[np.argmax(scores, axis=0)]
        langs = np.where(cjk > 5, "zh", best)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(langs.tolist(), pa.string()),
            }
        )


def run_text_stage(sf_dir: str, fn, columns=("doc_id", "text")) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def lang_id_documents(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=2)
