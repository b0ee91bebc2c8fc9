"""Batched text-embedding plumbing (reference X20) with a pluggable model.

The reference encodes trial text with S-PubMedBert in batches of 64 and
L2-normalizes before FAISS indexing (reference: backend/vector_search/
build_faiss_index.py:195-211, query side vector_search.py:63-73).  This
container has no model runtime, so the MODEL is pluggable: any callable
``batch_texts -> np.ndarray[n, dim]`` drops in (exactly the shape
``predict_batch_udf`` would wrap on a GPU cluster).  The default model is a
DETERMINISTIC STUB — a content-hash-seeded Gaussian projection — so the
Spark-side plumbing (mapInPandas batching, Arrow schema, batch-size
handling, L2 normalization) is real and tested while the model call is an
honest fake.

At scale this is the canonical inference shape: one Python worker per
executor core streams Arrow batches, the model weights load once per
worker (lazy module global), and output is a flat ``array<float>`` column
ready for the similarity operators (`operators/similarity.py`).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType


def stub_model(dim: int) -> Callable[[list[str]], np.ndarray]:
    """Deterministic fake encoder: sha256(text) seeds a Gaussian vector.

    Same text -> same vector on every worker and every run; no model
    libraries needed.  Replace with a real `model.encode(batch)` for
    production use.
    """

    def encode(texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(
                hashlib.sha256((t or "").encode()).digest()[:8], "little"
            )
            out[i] = np.random.default_rng(seed).standard_normal(dim)
        return out

    return encode


def encode_texts(
    df: DataFrame,
    text_col: str,
    id_cols: list[str],
    out_col: str = "embedding",
    dim: int = 64,
    batch_size: int = 64,
    model: Callable[[list[str]], np.ndarray] | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Add an L2-normalized ``array<float>`` embedding column.

    Partition-preserving mapInPandas: each Arrow batch is re-chunked to
    ``batch_size`` (the model's optimal batch, reference uses 64) and fed
    to ``model``; rows never cross partitions, so this composes with any
    upstream partitioning (e.g. the IVF list column).
    """
    fields = [df.schema[c] for c in id_cols]
    schema = StructType(
        list(fields) + [StructField(out_col, ArrayType(FloatType()), False)]
    )
    mk_model = model

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = mk_model or stub_model(dim)
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            chunks = []
            for s in range(0, len(texts), batch_size):
                vecs = np.asarray(
                    enc(texts[s : s + batch_size]), dtype=np.float32
                )
                if normalize:
                    n = np.linalg.norm(vecs, axis=1, keepdims=True)
                    vecs = vecs / np.maximum(n, 1e-12)
                chunks.append(vecs)
            allv = (
                np.concatenate(chunks)
                if chunks
                else np.empty((0, dim), dtype=np.float32)
            )
            out = pdf[id_cols].copy()
            out[out_col] = list(allv)
            yield out

    return df.mapInPandas(run, schema=schema)
