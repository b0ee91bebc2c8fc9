"""BM25 as a pure DataFrame composition (no custom segments).

This is option (a) for custom operators — express the semantics with built-in
ops and let Catalyst plan it.  It scores a corpus DataFrame directly:
tokenize (JVM regexp), tf/df/dl/avgdl via two-phase hash aggregates, score,
TakeOrderedAndProject top-k.  Used for:

* the driver's DuckDB-oracle correctness gate (every step is ANSI-SQL),
* ad-hoc queries over corpora that have no prebuilt segment index,
* a readable spec of exactly what the segment engine (plans/build.py +
  plans/query.py) must reproduce.

The segment engine is the scale path (index built once, queries touch only
their terms); this full-scan path re-tokenizes per query — fine for one-off
analytics, wrong for a query service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75

TOKENS_EXPR = "regexp_extract_all(lower({col}), '[a-z0-9]+', 0)"


def tokens_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(TOKENS_EXPR.format(col=text_col))).alias("term"),
    )


# One-pass conditional aggregation handles query term-sets up to this
# size; beyond it (unbounded expression width) the join plan takes over.
_ONEPASS_MAX_TERMS = 32


def bm25_score_all(
    docs: DataFrame,
    query_terms: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Score every matching doc for {term: qtf}. Returns (doc_id, score).

    Default plan (round 6) is ONE aggregation: the exploded token stream
    groups by doc_id once, computing dl plus a conditional-sum tf column
    per query term; (n, avgdl, per-term df) then come from one tiny agg
    over that relation (broadcast back), and the score is a fixed-order
    sum of per-term contribution expressions.  vs the old
    tf/dl/dfreq/join cascade this removes the second tokenize+explode
    pass and three shuffles (the (doc, term)-keyed tf exchange, the
    tf⋈dl sort-merge join, the dfreq agg) — measured 4.0 -> 1.0 s on the
    50k-doc single-file table.  Per-doc scores are identical: the same
    contributions summed in a fixed term order instead of hash-agg order
    (a <=1e-15 relative difference washed out by the caller's rounding,
    exactly as the DuckDB oracle's own sum order already is).  Queries
    wider than ``_ONEPASS_MAX_TERMS`` keep the join plan, whose cost does
    not grow with expression width."""
    from clinical_trial_searchengine_spark.partitioning import (
        spread_for_compute,
    )

    spark = docs.sparkSession
    # tokenize+explode is the expensive stage; spread single-row-group
    # scans so it parallelizes (guide §2.5 — no-op on real multi-split
    # inputs)
    docs = spread_for_compute(docs)
    tok = tokens_df(docs, text_col, id_col)
    terms = sorted(query_terms)
    if 0 < len(terms) <= _ONEPASS_MAX_TERMS:
        aggs = [F.count("*").cast("double").alias("dl")] + [
            F.sum(F.when(F.col("term") == t, 1).otherwise(0))
            .cast("double").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ]
        per_doc = tok.groupBy("doc_id").agg(*aggs)
        stat_aggs = [
            F.count("*").cast("double").alias("n"),
            F.avg("dl").alias("avgdl"),
        ] + [
            F.sum(F.when(F.col(f"_tf{i}") > 0, 1).otherwise(0))
            .cast("double").alias(f"_df{i}")
            for i in range(len(terms))
        ]
        stats = per_doc.agg(*stat_aggs)
        contrib = None
        match = None
        for i, t in enumerate(terms):
            c = (
                F.lit(float(query_terms[t]))
                * F.log(
                    1.0
                    + (F.col("n") - F.col(f"_df{i}") + 0.5)
                    / (F.col(f"_df{i}") + 0.5)
                )
                * F.col(f"_tf{i}")
                / (
                    F.col(f"_tf{i}")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            )
            contrib = c if contrib is None else contrib + c
            m = F.col(f"_tf{i}") > 0
            match = m if match is None else match | m
        return (
            per_doc.crossJoin(F.broadcast(stats))
            .where(match)
            .select("doc_id", contrib.alias("score"))
        )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("tf"))
    # dl = total token count per doc == sum of per-term tfs: deriving it
    # from tf instead of re-aggregating `tok` removes the SECOND full
    # tokenize+explode pass over the corpus (the tf/dl subtrees don't
    # share an exchange, so each reference re-ran the scan+regex).
    # Integer-exact: sum(tf) and count(*) are the same number.
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    q = spark.createDataFrame(
        [(t, float(w)) for t, w in sorted(query_terms.items())],
        "term string, qtf double",
    )
    dfreq = tf.join(F.broadcast(q), "term", "left_semi").groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )
    return (
        tf.join(F.broadcast(q), "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("qtf")
                * F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * F.col("tf")
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("score")
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: dict[str, float],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    boost: DataFrame | None = None,
    filter_df: DataFrame | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Top-k with the engine tie-break; scores rounded so a DuckDB oracle
    computing the identical formula hashes equal (float sum order differs at
    ~1e-16 between engines).

    ``boost``: optional (doc_id, _boost) DataFrame — multiplicative
    function-score (B3 shape, reference: backend/api/main.py:293-314).
    ``filter_df``: optional (doc_id) DataFrame — filter context (B4):
    membership only, scores untouched, applied BEFORE the limit."""
    scored = bm25_score_all(docs, query_terms, text_col, id_col)
    if boost is not None:
        scored = scored.join(boost, "doc_id", "left").withColumn(
            "score", F.col("score") * F.coalesce(F.col("_boost"), F.lit(1.0))
        ).drop("_boost")
    if filter_df is not None:
        scored = scored.join(filter_df.select("doc_id"), "doc_id", "left_semi")
    return (
        scored.withColumn("score", F.round("score", round_to))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_oracle_sql(
    query_terms: dict[str, float],
    k: int = 10,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    where: str = "",
    boost_case: str = "",
    round_to: int = 4,
) -> str:
    """DuckDB SQL computing the identical BM25 — the driver's oracle."""
    values = ", ".join(
        f"('{t}', {float(w)!r})" for t, w in sorted(query_terms.items())
    )
    filt = f"WHERE {where}" if where else ""
    boost = boost_case or "1.0"
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+')) AS term
  FROM {table}
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
q(term, qtf) AS (VALUES {values}),
dfreq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM q) GROUP BY 1
),
scored AS (
  SELECT tf.doc_id,
         sum(q.qtf * ln(1 + (s.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl))) AS raw
  FROM tf
  JOIN q USING (term)
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
  GROUP BY 1
),
boosted AS (
  SELECT d.doc_id, round(s.raw * {boost}, {round_to}) AS score
  FROM scored s JOIN {table} d ON d.{id_col} = s.doc_id
  {filt}
)
SELECT doc_id, score FROM boosted
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_multifield_topk(
    docs: DataFrame,
    query_terms: dict[str, float],
    fields: list[tuple[str, float]],
    k: int = 10,
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """B2: `multi_match best_fields` with field boosts (dis_max,
    tie_breaker=0): per field compute full BM25 with that FIELD's own
    df/dl/avgdl stats (Lucene semantics), multiply by the boost, and take
    the per-doc MAX across fields (reference: backend/api/main.py:213-232,
    boosts at :216-225).

    ``fields``: [(sql_expr_deriving_field_text, boost), ...].
    """
    scored = None
    for i, (expr, boost) in enumerate(fields):
        d = docs.select(
            F.col(id_col).alias("doc_id"), F.expr(expr).alias("_ftext")
        )
        s = bm25_score_all(d, query_terms, text_col="_ftext").select(
            "doc_id", (F.col("score") * F.lit(float(boost))).alias(f"_s{i}")
        )
        scored = s if scored is None else scored.join(s, "doc_id", "full")
    best = F.greatest(
        *[F.coalesce(F.col(f"_s{i}"), F.lit(0.0)) for i in range(len(fields))]
    )
    return (
        scored.withColumn("score", F.round(best, round_to))
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_multifield_oracle_sql(
    query_terms: dict[str, float],
    fields: list[tuple[str, float]],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    round_to: int = 4,
) -> str:
    """DuckDB oracle for :func:`bm25_multifield_topk` (same per-field stats,
    same dis_max)."""
    values = ", ".join(
        f"('{t}', {float(w)!r})" for t, w in sorted(query_terms.items())
    )
    ctes = [f"q(term, qtf) AS (VALUES {values})"]
    score_cols = []
    for i, (expr, boost) in enumerate(fields):
        ctes.append(f"""
tok{i} AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({expr}), '[a-z0-9]+')) AS term
  FROM {table}
),
tf{i} AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok{i} GROUP BY 1, 2),
dl{i} AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok{i} GROUP BY 1),
stats{i} AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl{i}),
dfreq{i} AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf{i}
  WHERE term IN (SELECT term FROM q) GROUP BY 1
),
scored{i} AS (
  SELECT tf.doc_id,
         {float(boost)!r} * sum(q.qtf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl))) AS s{i}
  FROM tf{i} tf
  JOIN q USING (term)
  JOIN dfreq{i} d USING (term)
  JOIN dl{i} dl USING (doc_id)
  CROSS JOIN stats{i} s
  GROUP BY 1
)""")
        score_cols.append(f"coalesce(s{i}, 0)")
    joins = "scored0 s0"
    for i in range(1, len(fields)):
        joins += f" FULL JOIN scored{i} s{i} USING (doc_id)"
    return f"""
WITH {', '.join(ctes)}
SELECT doc_id, round(greatest({', '.join(score_cols)}), {round_to}) AS score
FROM {joins}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
