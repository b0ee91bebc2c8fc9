"""X20 plumbing tests: batching, determinism, normalization, composition
with the similarity operators (model itself is the documented stub)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from clinical_trial_searchengine_spark.functions.embedder import (
    encode_texts,
    stub_model,
)


def _vecs(df):
    return {r["id"]: np.asarray(r["embedding"]) for r in df.collect()}


def test_encode_shape_determinism_and_norm(spark):
    rows = [(i, f"document text number {i % 7}") for i in range(50)]
    df = spark.createDataFrame(rows, "id int, t string")
    out = encode_texts(df, "t", ["id"], dim=16, batch_size=8)
    got = _vecs(out)
    assert len(got) == 50 and got[0].shape == (16,)
    # unit L2 norm
    for v in got.values():
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    # same text -> same vector (ids 0 and 7 share text)
    assert np.allclose(got[0], got[7])
    assert not np.allclose(got[0], got[1])
    # determinism across runs and across batch sizes (batch boundary must
    # not leak into results)
    got2 = _vecs(encode_texts(df, "t", ["id"], dim=16, batch_size=64))
    for k in got:
        assert np.allclose(got[k], got2[k])


def test_pluggable_model_and_null_text(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], "id int, t string")

    def toy(texts):
        return np.array([[len(t), 1.0] for t in texts], dtype=np.float32)

    got = _vecs(encode_texts(df, "t", ["id"], dim=2, model=toy))
    # null handled as '' -> [0, 1] normalized
    assert np.allclose(got[1], [0.0, 1.0])
    v2 = np.array([1.0, 1.0]) / np.sqrt(2)
    assert np.allclose(got[2], v2, atol=1e-6)


def test_composes_with_cosine_topk(spark):
    from clinical_trial_searchengine_spark.operators.similarity import (
        cosine_topk,
    )

    rows = [(i, f"text {i}") for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id int, t string")
    emb = encode_texts(df, "t", ["vec_id"], dim=8)
    q = stub_model(8)(["text 3"])[0]
    q = (q / np.linalg.norm(q)).tolist()
    top = cosine_topk(emb, q, k=1).collect()
    # the query IS doc 3's embedding -> cosine 1.0 with itself
    assert top[0]["vec_id"] == 3
    assert abs(top[0]["cosine"] - 1.0) < 1e-4
