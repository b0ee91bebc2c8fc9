"""Ranking operators: top-k with explicit tie-break, RRF fusion, min-max
normalization, pagination — the reference's post-retrieval surface
re-expressed as pure DataFrame ops (SURVEY.md §2.3-J3, §2.4-A3/A4, §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, score_col: str, k: int, id_col: str = "doc_id") -> DataFrame:
    """orderBy(score desc, id asc).limit(k) — compiles to Catalyst
    TakeOrderedAndProject: bounded per-partition heap + driver merge (T1/T6,
    reference delegates to OpenSearch `size`, backend/api/main.py:680-710)."""
    return df.orderBy(F.desc(score_col), F.asc(id_col)).limit(k)


def rank_column(df: DataFrame, score_col: str, id_col: str = "doc_id") -> DataFrame:
    """1-based dense ranking with the engine tie-break. Global window — use
    only on already-limited candidate pools (the reference ranks <= 1500
    candidates, never the corpus; backend/api/main.py:777-799)."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return df.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    ranked_lists: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    keep_only_first: bool = True,
) -> DataFrame:
    """Reciprocal-rank fusion: score(doc) = sum over lists of 1/(k+rank+1).

    ``keep_only_first=True`` reproduces the reference's drop rule: docs absent
    from the FIRST (BM25/filtered) list are dropped — the filter context wins
    (reference: backend/api/main.py:488-500,792-795).
    """
    contribs = [
        df.select(
            F.col(id_col),
            (1.0 / (F.lit(k) + F.col(rank_col) + 1)).alias("_rrf"),
        )
        for df in ranked_lists
    ]
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    fused = unioned.groupBy(id_col).agg(F.sum("_rrf").alias("rrf_score"))
    if keep_only_first and len(ranked_lists) > 1:
        fused = fused.join(
            ranked_lists[0].select(id_col), id_col, "left_semi"
        )
    return fused


def minmax_normalize(
    df: DataFrame, score_col: str, out_col: str = "norm_score"
) -> DataFrame:
    """Normalize scores to [0,1]; degenerate (constant) case -> 1.0
    (A3, reference: backend/api/main.py:503-514).  Two-pass: tiny global agg
    then a broadcast-joined projection — no single-partition window."""
    bounds = df.agg(
        F.min(score_col).alias("_mn"), F.max(score_col).alias("_mx")
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            out_col,
            F.when(F.col("_mx") == F.col("_mn"), F.lit(1.0)).otherwise(
                (F.col(score_col) - F.col("_mn")) / (F.col("_mx") - F.col("_mn"))
            ),
        )
        .drop("_mn", "_mx")
    )


def paginate(
    df: DataFrame, score_col: str, page: int, size: int, id_col: str = "doc_id"
) -> DataFrame:
    """Page/size slice after ranking (T3, reference:
    backend/api/main.py:650-653,920-921). Validates like the reference."""
    if page < 1 or not (1 <= size <= 100):
        raise ValueError("page must be >= 1 and 1 <= size <= 100")
    ranked = rank_column(df, score_col, id_col)
    start = (page - 1) * size
    return ranked.where(
        (F.col("rank") > start) & (F.col("rank") <= start + size)
    )


def blend_scores(
    df: DataFrame,
    retrieval_col: str,
    secondary_col: str,
    weight: float,
    out_col: str = "final_score",
) -> DataFrame:
    """final = (1-w)*retrieval + w*secondary — the reference's
    feasibility blend shape (backend/api/main.py:606-616)."""
    return df.withColumn(
        out_col,
        (1.0 - weight) * F.col(retrieval_col) + weight * F.col(secondary_col),
    )
