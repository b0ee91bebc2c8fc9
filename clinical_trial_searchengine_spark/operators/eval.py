"""Batch IR evaluation metrics over (run ⋈ qrels) as pure DataFrame aggs.

The reference's primary quality loop runs its TREC-style topic set through
ranx and four custom metrics (reference: backend/evaluation/
evaluation_pipeline.py:122-146, backend/evaluation/custom_metrics.py:137-197).
This module is the distributed equivalent: a *run* (query_id, doc_id, rank)
joined with *qrels* (query_id, doc_id, rel) and reduced to per-query metrics
with window + hash aggregates — one shuffle on query_id, no UDFs, scales to
any number of queries/docs.

Metric definitions (standard trec_eval semantics; rel > 0 is relevant,
rel = 0 rows in qrels are JUDGED non-relevant, absent rows are unjudged):

  precision@k = |relevant ∩ top-k| / k
  recall@k    = |relevant ∩ top-k| / R          (R = total relevant in qrels)
  hit_rate@k  = 1 if any relevant in top-k else 0
  mrr@k       = 1 / rank of first relevant in top-k   (0 if none)
  ap@k (map)  = Σ_{i≤k, rel_i>0} P@i / R
  ndcg@k      = DCG@k / IDCG@k,  DCG = Σ (2^rel_i - 1) / log2(i + 1),
                IDCG from qrels' ideal ordering (rel desc, doc_id asc)
  bpref       = (1/R) Σ_{r ∈ relevant retrieved} (1 - min(n_r, R)/min(R, N))
                n_r = judged non-relevant ranked above r, N = |judged nonrel|
                (term = 1 when min(R, N) = 0)

Queries with no relevant qrels are excluded (trec_eval behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

METRIC_COLS = [
    "precision", "recall", "hit_rate", "mrr", "ap", "ndcg", "bpref",
]


def rank_run(scored: DataFrame, k: int | None = None) -> DataFrame:
    """(query_id, doc_id, score) -> (query_id, doc_id, rank) with the
    engine tie-break (score desc, doc_id asc)."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    out = scored.withColumn("rank", F.row_number().over(w))
    return out.where(F.col("rank") <= k) if k else out


def ir_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-query metrics: (query_id, precision, recall, hit_rate, mrr, ap,
    ndcg, bpref), one row per query that has >= 1 relevant qrel.

    ``run``: (query_id, doc_id, rank) — rank 1-based, unique per query.
    ``qrels``: (query_id, doc_id, rel) — integer grades, 0 = judged nonrel.
    """
    rel_qrels = qrels.where(F.col("rel") > 0)

    # per-query qrel totals: R, N, IDCG@k
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    idcg = (
        rel_qrels.withColumn("irank", F.row_number().over(w_ideal))
        .where(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("irank") + 1.0)
            ).alias("idcg")
        )
    )
    totals = qrels.groupBy("query_id").agg(
        F.sum((F.col("rel") > 0).cast("int")).alias("R"),
        F.sum((F.col("rel") == 0).cast("int")).alias("N"),
    ).where(F.col("R") > 0)

    j = (
        run.where(F.col("rank") <= k)
        .join(qrels.withColumnRenamed("rel", "_rel"),
              ["query_id", "doc_id"], "left")
        .withColumn("judged", F.col("_rel").isNotNull())
        .withColumn("rel", F.coalesce(F.col("_rel"), F.lit(0)))
        .withColumn("rel_bin", (F.col("rel") > 0).cast("int"))
        .withColumn(
            "judged_nonrel",
            (F.col("judged") & (F.col("rel") == 0)).cast("int"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy("rank")
    j = (
        j.withColumn("cum_rel", F.sum("rel_bin").over(w_rank))
        .withColumn(
            "nonrel_above",
            F.sum("judged_nonrel").over(w_rank) - F.col("judged_nonrel"),
        )
    )
    per_q = j.groupBy("query_id").agg(
        F.sum("rel_bin").alias("n_rel_ret"),
        F.min(F.when(F.col("rel_bin") == 1, F.col("rank"))).alias("first_rel"),
        F.sum(
            F.when(F.col("rel_bin") == 1, F.col("cum_rel") / F.col("rank"))
        ).alias("sum_prec_at_rel"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
            / F.log2(F.col("rank") + 1.0)
        ).alias("dcg"),
    )
    # bpref's per-row min(n_r, R) term needs R and N at row level, so it
    # aggregates over a (tiny, broadcast) totals join instead of per_q.
    pre = j.join(F.broadcast(totals), "query_id")
    bpref = pre.groupBy("query_id").agg(
        F.sum(
            F.when(
                F.col("rel_bin") == 1,
                F.when(F.least("R", "N") == 0, F.lit(1.0)).otherwise(
                    1.0
                    - F.least(F.col("nonrel_above"), F.col("R"))
                    / F.least("R", "N")
                ),
            )
        ).alias("bpref_sum")
    )

    out = (
        totals.join(per_q, "query_id", "left")
        .join(idcg, "query_id", "left")
        .join(bpref, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce("n_rel_ret", F.lit(0)) / F.lit(float(k))).alias(
                "precision"
            ),
            (F.coalesce("n_rel_ret", F.lit(0)) / F.col("R")).alias("recall"),
            F.when(F.coalesce("n_rel_ret", F.lit(0)) > 0, 1.0)
            .otherwise(0.0)
            .alias("hit_rate"),
            F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)).alias("mrr"),
            (F.coalesce("sum_prec_at_rel", F.lit(0.0)) / F.col("R")).alias(
                "ap"
            ),
            F.when(
                F.coalesce("idcg", F.lit(0.0)) > 0,
                F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"),
            )
            .otherwise(0.0)
            .alias("ndcg"),
            (F.coalesce("bpref_sum", F.lit(0.0)) / F.col("R")).alias("bpref"),
        )
    )
    if round_to is not None:
        out = out.select(
            "query_id",
            *[F.round(c, round_to).alias(c) for c in METRIC_COLS],
        )
    return out


def ir_metrics_mean(
    run: DataFrame, qrels: DataFrame, k: int = 10, round_to: int | None = 6
) -> DataFrame:
    """Macro-averaged metrics over all evaluated queries — the headline
    numbers (the reference reports e.g. MRR@10 = 0.48 over its topic set).

    Per-query values are rounded BEFORE averaging (when round_to is set) so
    an oracle averaging its own rounded per-query table lands on the same
    6th decimal."""
    per_q = ir_metrics(run, qrels, k, round_to=round_to)
    aggs = [F.avg(c).alias(f"mean_{c}") for c in METRIC_COLS] + [
        F.count("*").alias("n_queries")
    ]
    out = per_q.agg(*aggs)
    if round_to is not None:
        out = out.select(
            *[F.round(f"mean_{c}", round_to).alias(f"mean_{c}")
              for c in METRIC_COLS],
            "n_queries",
        )
    return out


FEAS_METRIC_COLS = [
    "precision_feasible_10", "recall_feasible_20", "violation_5", "reach_10",
]


def feasibility_metrics(
    run: DataFrame,
    qrels: DataFrame,
    feasible: DataFrame,
    round_to: int | None = 6,
) -> DataFrame:
    """The reference's 4 custom feasibility-quality metrics, per query
    (reference: backend/evaluation/custom_metrics.py:137-197):

      precision_feasible@10 = |top-10 ∩ relevant ∩ feasible| / 10
      recall_feasible@20    = |top-20 ∩ relevant ∩ feasible| / R  (0 if R = 0)
      violation@5           = |top-5 ∩ NOT feasible| / 5
      reach@10              = recall_feasible@10 (the reference's reach_at_k
                              literally calls recall_feasible_at_k with K=10)

    Unlike :func:`ir_metrics` (trec_eval: queries without relevant qrels are
    excluded), the reference iterates EVERY query in the run and returns 0.0
    for the recall-style metrics when R = 0 — reproduced here.

    ``run``: (query_id, doc_id, rank); ``qrels``: (query_id, doc_id, rel);
    ``feasible``: (query_id, doc_id, is_feasible) — the per-hit feasibility
    flag the reference carries in hit_metadata (profile-dependent, so keyed
    by query AND doc).  Hits absent from ``feasible`` count as infeasible.

    One shuffle on query_id over candidate pools of <= max-k rows/query —
    corpus-scale work stays in the retrieval that produced ``run``.
    """
    j = (
        run.where(F.col("rank") <= 20)
        .join(qrels.withColumnRenamed("rel", "_rel"),
              ["query_id", "doc_id"], "left")
        .join(feasible.withColumnRenamed("is_feasible", "_feas"),
              ["query_id", "doc_id"], "left")
        .withColumn("rel_bin", (F.coalesce("_rel", F.lit(0)) > 0).cast("int"))
        .withColumn("feas", F.coalesce("_feas", F.lit(False)).cast("int"))
    )
    totals = qrels.groupBy("query_id").agg(
        F.sum((F.col("rel") > 0).cast("int")).alias("R")
    )
    per_q = j.groupBy("query_id").agg(
        F.sum(
            F.when((F.col("rank") <= 10) & (F.col("rel_bin") == 1),
                   F.col("feas")).otherwise(0)
        ).alias("n_pf10"),
        F.sum(
            F.when(F.col("rel_bin") == 1, F.col("feas")).otherwise(0)
        ).alias("n_rf20"),
        F.sum(
            F.when(F.col("rank") <= 5, 1 - F.col("feas")).otherwise(0)
        ).alias("n_viol5"),
    )
    out = per_q.join(totals, "query_id", "left").select(
        "query_id",
        (F.col("n_pf10") / 10.0).alias("precision_feasible_10"),
        F.when(
            F.coalesce("R", F.lit(0)) > 0, F.col("n_rf20") / F.col("R")
        ).otherwise(0.0).alias("recall_feasible_20"),
        (F.col("n_viol5") / 5.0).alias("violation_5"),
        F.when(
            F.coalesce("R", F.lit(0)) > 0, F.col("n_pf10") / F.col("R")
        ).otherwise(0.0).alias("reach_10"),
    )
    if round_to is not None:
        out = out.select(
            "query_id",
            *[F.round(c, round_to).alias(c) for c in FEAS_METRIC_COLS],
        )
    return out


def feasibility_metrics_mean(
    run: DataFrame,
    qrels: DataFrame,
    feasible: DataFrame,
    round_to: int | None = 6,
) -> DataFrame:
    """Means over every query in the run — the reference's
    compute_all_feasibility_metrics return value
    (reference: backend/evaluation/custom_metrics.py:174-197)."""
    per_q = feasibility_metrics(run, qrels, feasible, round_to=round_to)
    out = per_q.agg(
        *[F.avg(c).alias(f"mean_{c}") for c in FEAS_METRIC_COLS],
        F.count("*").alias("n_queries"),
    )
    if round_to is not None:
        out = out.select(
            *[F.round(f"mean_{c}", round_to).alias(f"mean_{c}")
              for c in FEAS_METRIC_COLS],
            "n_queries",
        )
    return out


def evaluate_search(
    engine,
    query_texts: dict[str, str],
    qrels: DataFrame,
    k: int = 10,
    round_to: int | None = 6,
) -> DataFrame:
    """End-to-end: run the whole query set through the segment engine in ONE
    distributed job (search_many), rank, join qrels, reduce to per-query
    metrics — the reference's evaluation-pipeline lifecycle
    (reference: backend/evaluation/evaluation_pipeline.py:122-150)."""
    run = engine.search_many(query_texts, k=k).select(
        "query_id", "doc_id", "rank"
    )
    return ir_metrics(run, qrels, k=k, round_to=round_to)


def export_metrics_report(
    per_query: DataFrame,
    out_dir: str,
    k: int = 10,
    charts: bool = True,
) -> dict:
    """Write the reference's evaluation artifacts from a per-query metrics
    DataFrame (the :func:`ir_metrics` / :func:`feasibility_metrics` shape:
    one row per query_id plus metric columns).

    The reference emits metrics_report.csv ("metric,value" rows of the
    aggregate means), metrics_report.json (the same dict) and bar charts
    per metric group (reference:
    backend/evaluation/evaluation_pipeline.py:159-213).  This twin writes:

    - ``metrics_report.csv`` / ``metrics_report.json`` — the macro means,
      reference shape, metric names suffixed ``@k``
    - ``per_query_metrics.csv`` — the full per-query table (the driver
      side of one collect over Q tiny rows)
    - ``metrics_charts/metrics.svg`` — a dependency-free SVG bar chart
      (the container has no matplotlib; if it is importable a PNG is
      written too, matching the reference's output format)

    Returns the aggregate dict.  The collect is bounded: Q rows of
    ~10 doubles."""
    import csv
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    pdf = per_query.toPandas()
    metric_cols = [
        c for c in pdf.columns
        if c != "query_id" and pdf[c].dtype.kind in "fi"
    ]
    # drop a pre-aggregated mean row if the caller's table carries one
    per_rows = pdf[pdf["query_id"] != "__mean__"] if "query_id" in pdf \
        else pdf
    means = {
        f"{c}@{k}": float(per_rows[c].mean()) for c in metric_cols
    }
    per_rows.to_csv(
        os.path.join(out_dir, "per_query_metrics.csv"), index=False
    )
    with open(os.path.join(out_dir, "metrics_report.csv"), "w",
              newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["metric", "value"])
        for m, v in means.items():
            w.writerow([m, v])
    with open(os.path.join(out_dir, "metrics_report.json"), "w",
              encoding="utf-8") as f:
        json.dump(means, f, indent=4)
    if charts and means:
        cdir = os.path.join(out_dir, "metrics_charts")
        os.makedirs(cdir, exist_ok=True)
        _write_svg_bar_chart(
            os.path.join(cdir, "metrics.svg"),
            f"Ranking metrics (mean over {len(per_rows)} queries)",
            means,
        )
        try:  # matching the reference's PNG output when available
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure(figsize=(10, 6))
            plt.bar(list(means), list(means.values()))
            plt.xticks(rotation=45, ha="right")
            plt.title("Ranking metrics")
            plt.tight_layout()
            plt.savefig(os.path.join(cdir, "metrics.png"))
            plt.close()
        except ImportError:
            pass
    return means


def _write_svg_bar_chart(path: str, title: str, values: dict) -> None:
    """Minimal dependency-free SVG bar chart (deterministic output)."""
    W, H, PAD, TITLE_H = 760, 420, 56, 36
    n = max(len(values), 1)
    vmax = max([abs(v) for v in values.values()] + [1e-12])
    slot = (W - 2 * PAD) / n
    bw = slot * 0.64
    plot_h = H - PAD - TITLE_H
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
        f'viewBox="0 0 {W} {H}" font-family="sans-serif">',
        f'<rect width="{W}" height="{H}" fill="white"/>',
        f'<text x="{W/2:.1f}" y="24" text-anchor="middle" '
        f'font-size="16">{title}</text>',
        f'<line x1="{PAD}" y1="{H-PAD}" x2="{W-PAD}" y2="{H-PAD}" '
        'stroke="#333"/>',
    ]
    for i, (name, v) in enumerate(values.items()):
        h = (abs(v) / vmax) * (plot_h - TITLE_H)
        x = PAD + i * slot + (slot - bw) / 2
        y = H - PAD - h
        parts.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bw:.1f}" '
            f'height="{h:.1f}" fill="#4878a8"/>'
        )
        parts.append(
            f'<text x="{x + bw/2:.1f}" y="{y - 6:.1f}" text-anchor="middle" '
            f'font-size="11">{v:.3f}</text>'
        )
        parts.append(
            f'<text x="{x + bw/2:.1f}" y="{H-PAD+14:.1f}" '
            f'text-anchor="middle" font-size="10" '
            f'transform="rotate(30 {x + bw/2:.1f} {H-PAD+14:.1f})">'
            f"{name}</text>"
        )
    parts.append("</svg>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
