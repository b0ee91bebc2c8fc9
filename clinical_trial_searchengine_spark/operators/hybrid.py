"""Composed hybrid retrieval pipeline — the reference's `/rank` endpoint
lifecycle in one call (reference: backend/api/main.py:427-829):

    sparse (BM25) leg top-N  ─┐
                              ├─ RRF fusion (docs absent from the sparse/
    dense (cosine) leg top-M ─┘  filtered leg are dropped, main.py:488-500)
    -> min-max normalize fused score (main.py:503-514)
    -> blend with the normalized dense score (feasibility-blend shape,
       main.py:606-616)
    -> global top-k with the engine tie-break.

Every stage is an already-gated operator (rank_column / rrf_fuse /
minmax_normalize / blend_scores); this module only wires them.  All stages
are DataFrame ops over candidate pools of <= N+M rows, so the fused part is
driver-cheap at any corpus scale — the heavy lifting stays in the two legs
(segment-engine BM25 scan + distributed cosine top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_trial_searchengine_spark.operators.topk import (
    blend_scores,
    minmax_normalize,
    rank_column,
    rrf_fuse,
    topk,
)


def hybrid_rank(
    sparse: DataFrame,
    dense: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    blend_weight: float = 0.3,
    sparse_score_col: str = "score",
    dense_score_col: str = "cosine",
    id_col: str = "doc_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Fuse two pre-limited candidate pools into a final ranking.

    ``sparse``: (doc_id, score) — the BM25/filtered leg (its membership
    wins: docs absent from it are dropped, reference drop rule).
    ``dense``: (doc_id, cosine) — the embedding leg.
    Returns (doc_id, final_score) top-k.
    """
    s_ranked = rank_column(sparse, sparse_score_col, id_col)
    d_ranked = rank_column(dense, dense_score_col, id_col)
    fused = rrf_fuse(
        [s_ranked, d_ranked], id_col=id_col, k=rrf_k, keep_only_first=True
    )
    normed = minmax_normalize(fused, "rrf_score")
    d_norm = minmax_normalize(
        d_ranked.select(id_col, dense_score_col), dense_score_col, "sec_norm"
    ).select(id_col, "sec_norm")
    joined = normed.join(d_norm, id_col, "left").withColumn(
        "sec_norm", F.coalesce(F.col("sec_norm"), F.lit(0.0))
    )
    blended = blend_scores(joined, "norm_score", "sec_norm", blend_weight)
    final = F.col("final_score")
    if round_to is not None:
        final = F.round(final, round_to)
    return topk(
        blended.select(F.col(id_col), final.alias("final_score")),
        "final_score", k, id_col,
    )


def dense_only_rank(
    dense: DataFrame,
    k: int = 10,
    dense_score_col: str = "cosine",
    id_col: str = "doc_id",
    filter_doc_ids: DataFrame | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """The reference's dense-only fallback ranking: min-max normalize the
    dense scores and serve them as final_score (reference:
    backend/api/main.py:832-933, `dense_only_fallback`).

    Filters are honored with a semi-join on the candidate pool (J2 shape) —
    the dense leg is <= dense_n rows, so the semi-join is broadcast-cheap at
    any corpus scale."""
    if filter_doc_ids is not None:
        dense = dense.join(
            filter_doc_ids.selectExpr(f"doc_id as {id_col}"),
            id_col,
            "left_semi",
        )
    normed = minmax_normalize(
        dense.select(id_col, dense_score_col), dense_score_col, "final_score"
    )
    final = F.col("final_score")
    if round_to is not None:
        final = F.round(final, round_to)
    return topk(
        normed.select(F.col(id_col), final.alias("final_score")),
        "final_score", k, id_col,
    )


def hybrid_search(
    engine,
    query_text: str,
    emb: DataFrame | None,
    query_vec: list[float],
    k: int = 10,
    sparse_n: int = 50,
    dense_n: int = 150,
    rrf_k: int = 60,
    blend_weight: float = 0.3,
    filter_doc_ids: DataFrame | None = None,
    id_col: str = "vec_id",
    ivf_index_dir: str | None = None,
    n_probe: int = 4,
    dense_round_to: int | None = None,
) -> DataFrame:
    """End-to-end hybrid query: segment-engine BM25 leg (optionally
    filtered — the filter context wins through the RRF drop rule) + dense
    cosine leg, fused with :func:`hybrid_rank`.

    Dense leg source (mirroring the reference's persistent-FAISS leg,
    reference: backend/api/main.py:777-784): with ``ivf_index_dir`` set, the
    leg queries the MATERIALIZED IVF index via :func:`ivf_search` — only the
    ``n_probe`` probed list partitions are scanned, the corpus-scale path.
    Otherwise it brute-forces ``emb`` exactly (the correctness baseline; the
    reference's FlatIP is exact too).

    ``emb``/the IVF index's ``id_col`` must be in the same id space as the
    engine's doc_ids.  The reference fetches BM25 size*3 then CANDIDATE_POOL
    dense hits (main.py:447-471); sparse_n/dense_n mirror that over-fetch.
    """
    from clinical_trial_searchengine_spark.operators.similarity import (
        cosine_topk,
        ivf_search,
    )

    if emb is None and ivf_index_dir is None:
        raise ValueError(
            "hybrid_search needs a dense leg: provide emb or ivf_index_dir"
        )
    sparse_df = engine.search(
        query_text, k=sparse_n, filter_doc_ids=filter_doc_ids
    )
    # Materialize the (<= sparse_n row) candidate pool ONCE, on the
    # driver: the emptiness probe below becomes free and the fused
    # ranking re-reads a tiny local relation (Spark broadcasts it)
    # instead of re-running BM25.  A localCheckpoint would also work but
    # leaks executor storage across calls in a long-lived serving loop —
    # collected rows are GC'd with the plan.
    sparse_rows = sparse_df.collect()
    sparse = engine.spark.createDataFrame(sparse_rows, sparse_df.schema)
    rkw = {} if dense_round_to is None else {"round_to": dense_round_to}
    if ivf_index_dir is not None:
        dense = ivf_search(
            engine.spark, ivf_index_dir, query_vec, k=dense_n,
            n_probe=n_probe, **rkw,
        )
        dense_id = dense.columns[0]
        dense = dense.select(F.col(dense_id).alias("doc_id"), "cosine")
    else:
        dense = cosine_topk(
            emb, query_vec, k=dense_n, id_col=id_col, **rkw
        ).select(F.col(id_col).alias("doc_id"), "cosine")
    if not sparse_rows:
        # BM25 leg empty (e.g. out-of-vocabulary query): the RRF drop rule
        # would annihilate the result set, so serve the dense-only ranking
        # instead — matching the reference's fallback (backend/api/
        # main.py:764-774).  The sparse leg already honored the filter; the
        # fallback re-applies it to the dense pool via semi-join.
        return dense_only_rank(
            dense, k=k, filter_doc_ids=filter_doc_ids
        )
    return hybrid_rank(
        sparse, dense, k=k, rrf_k=rrf_k, blend_weight=blend_weight
    )
