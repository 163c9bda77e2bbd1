"""Text-embedding producer stage (stages/embed.py): determinism, the
actor-pool plumbing, and the chained produce → ANN consumer."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_embed_stage_deterministic_and_normalized(ray_session):
    from pyreshaper_ray.stages.embed import TextEmbedStage

    texts = ["alpha beta gamma", "alpha beta gamma", "totally different words", ""]
    out1 = TextEmbedStage()( _docs(texts))
    out2 = TextEmbedStage()( _docs(texts))
    m1 = np.array(out1["embedding"].to_pylist(), dtype=np.float32)
    m2 = np.array(out2["embedding"].to_pylist(), dtype=np.float32)
    assert np.array_equal(m1, m2)  # seed-fixed model, stable tokenizer
    assert np.array_equal(m1[0], m1[1])  # identical text → identical vector
    # L2-normalized (except the zero-token doc, which stays zero)
    norms = np.linalg.norm(m1, axis=1)
    assert np.allclose(norms[:3], 1.0, atol=1e-5)
    assert norms[3] == 0.0


def test_embed_then_knn_chain(ray_session, tmp_path):
    """Produce → consume: planted near-identical documents must come out as
    each other's top neighbor through the full Ray chain (actor-pool encode
    → broadcast-query matmul top-k)."""
    import pyarrow.parquet as pq

    from pyreshaper_ray.stages.embed import text_embed_knn

    base = (
        "distributed dataframes stream arrow batches through an object "
        "store with backpressure and spill to disk under memory pressure"
    )
    texts = [
        base,  # doc 0 (query)
        "cooking pasta requires salted boiling water and fresh basil",  # 1
        base + " extra tail words",  # 2: near-dup of 0
        "orbital mechanics of small satellites in low earth orbit decay",  # 3
        "gradient descent updates model weights along the loss surface",  # 4
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = text_embed_knn(str(tmp_path), n_queries=1, k=2).to_pandas()
    top = out[out["qid"] == 0].iloc[0]
    assert int(top["nid"]) == 2  # the planted near-dup wins
    assert float(top["sim"]) > 0.8
