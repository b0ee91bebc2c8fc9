"""IR metric semantics anchored to a hand-computed example, plus the
end-to-end evaluate_search lifecycle (run = search_many output)."""

from __future__ import annotations

import math

import pytest

from clinical_trial_searchengine_spark.operators.eval import (
    evaluate_search,
    ir_metrics,
    ir_metrics_mean,
)

TOL = 1e-9


@pytest.fixture(scope="module")
def hand_case(spark):
    # q1: ranked d1(rel2) d4(unjudged) d3(judged nonrel) d2(rel1) d5(unjudged)
    # qrels also hold d9(rel1) never retrieved -> R=3, N=1
    run = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 4, 2), ("q1", 3, 3), ("q1", 2, 4), ("q1", 5, 5)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 1, 2), ("q1", 2, 1), ("q1", 3, 0), ("q1", 9, 1)],
        "query_id string, doc_id long, rel int",
    )
    return run, qrels


def test_ir_metrics_hand_computed(hand_case):
    run, qrels = hand_case
    row = ir_metrics(run, qrels, k=5, round_to=None).collect()[0]
    assert abs(row["precision"] - 2 / 5) <= TOL
    assert abs(row["recall"] - 2 / 3) <= TOL
    assert row["hit_rate"] == 1.0
    assert abs(row["mrr"] - 1.0) <= TOL
    # AP@5 = (P@1 + P@4)/R = (1 + 0.5)/3
    assert abs(row["ap"] - 0.5) <= TOL
    dcg = 3 / math.log2(2) + 1 / math.log2(5)
    idcg = 3 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(row["ndcg"] - dcg / idcg) <= TOL
    # bpref: d1 term 1 - 0/min(3,1)=1; d2 term 1 - min(1,3)/min(3,1)=0
    assert abs(row["bpref"] - (1 + 0) / 3) <= TOL


def test_ir_metrics_no_relevant_query_excluded(spark, hand_case):
    run, qrels = hand_case
    # q2 has only a judged-nonrel qrel -> not evaluated
    run2 = run.union(
        spark.createDataFrame([("q2", 7, 1)], run.schema)
    )
    qrels2 = qrels.union(
        spark.createDataFrame([("q2", 7, 0)], qrels.schema)
    )
    out = ir_metrics(run2, qrels2, k=5)
    assert [r["query_id"] for r in out.collect()] == ["q1"]
    mean = ir_metrics_mean(run2, qrels2, k=5).collect()[0]
    assert mean["n_queries"] == 1


def test_ir_metrics_zero_when_nothing_relevant_retrieved(spark):
    run = spark.createDataFrame(
        [("q1", 4, 1), ("q1", 5, 2)], "query_id string, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [("q1", 1, 1)], "query_id string, doc_id long, rel int"
    )
    row = ir_metrics(run, qrels, k=5, round_to=None).collect()[0]
    for m in ["precision", "recall", "hit_rate", "mrr", "ap", "ndcg", "bpref"]:
        assert row[m] == 0.0, m


def test_evaluate_search_end_to_end(built_index, spark):
    """Metrics over the real engine: qrels derived from the engine's own
    exhaustive scoring (top-3 scored docs per query are 'relevant'), so the
    batch run must achieve perfect precision-ish metrics at k=3."""
    from clinical_trial_searchengine_spark.sources.corpus import (
        reference_queries,
    )

    qs = {q["query_id"]: q["text"] for q in reference_queries()[:4]}
    qrels_rows = []
    for qid, text in qs.items():
        for d, _ in built_index.search_topk_rows(text, 3):
            qrels_rows.append((qid, d, 1))
    qrels = spark.createDataFrame(
        qrels_rows, "query_id string, doc_id long, rel int"
    )
    out = evaluate_search(built_index, qs, qrels, k=3, round_to=None)
    rows = {r["query_id"]: r for r in out.collect()}
    with_qrels = {qid for qid, _, _ in qrels_rows}
    assert with_qrels, "no query produced hits"
    assert set(rows) == with_qrels
    for qid, r in rows.items():
        assert abs(r["precision"] - 1.0) <= TOL, qid
        assert abs(r["recall"] - 1.0) <= TOL, qid
        assert abs(r["mrr"] - 1.0) <= TOL, qid
        assert abs(r["ndcg"] - 1.0) <= TOL, qid


def test_feasibility_metrics_hand_computed(spark):
    """Worked example mirroring the reference's python loops
    (reference: backend/evaluation/custom_metrics.py:137-197)."""
    from clinical_trial_searchengine_spark.operators.eval import (
        feasibility_metrics,
        feasibility_metrics_mean,
    )

    # q1: 12 ranked docs; relevant = {1,2,3,9} (9 never retrieved, R=4);
    # feasible = odd doc_ids (doc 11 missing from the flags table -> counts
    # infeasible).  q2: no relevant qrels at all -> recall/reach are 0.0 but
    # violation still counts (reference iterates every query in the run).
    run = spark.createDataFrame(
        [("q1", d, r + 1) for r, d in enumerate(
            [1, 4, 3, 2, 5, 6, 7, 8, 10, 12, 13, 11])]
        + [("q2", d, r + 1) for r, d in enumerate([20, 21, 22])],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 1, 2), ("q1", 2, 1), ("q1", 3, 1), ("q1", 9, 1),
         ("q1", 4, 0), ("q2", 20, 0)],
        "query_id string, doc_id long, rel int",
    )
    feasible = spark.createDataFrame(
        [("q1", d, d % 2 == 1) for d in [1, 4, 3, 2, 5, 6, 7, 8, 10, 12, 13]]
        + [("q2", 20, True), ("q2", 21, False), ("q2", 22, True)],
        "query_id string, doc_id long, is_feasible boolean",
    )
    rows = {
        r["query_id"]: r
        for r in feasibility_metrics(
            run, qrels, feasible, round_to=None
        ).collect()
    }
    # q1 top-10 relevant∩feasible = {1, 3} -> pf10 = 2/10, reach = 2/4
    # top-20 (all 12) adds no feasible relevant -> rf20 = 2/4
    # top-5 infeasible = {4, 2} -> violation = 2/5
    q1 = rows["q1"]
    assert abs(q1["precision_feasible_10"] - 0.2) <= TOL
    assert abs(q1["recall_feasible_20"] - 0.5) <= TOL
    assert abs(q1["violation_5"] - 0.4) <= TOL
    assert abs(q1["reach_10"] - 0.5) <= TOL
    # q2: R=0 -> recall-style metrics 0.0; top-5 infeasible = {21} -> 1/5
    q2 = rows["q2"]
    assert q2["precision_feasible_10"] == 0.0
    assert q2["recall_feasible_20"] == 0.0
    assert abs(q2["violation_5"] - 0.2) <= TOL
    assert q2["reach_10"] == 0.0

    means = feasibility_metrics_mean(
        run, qrels, feasible, round_to=None
    ).collect()[0]
    assert means["n_queries"] == 2
    assert abs(means["mean_precision_feasible_10"] - 0.1) <= TOL
    assert abs(means["mean_violation_5"] - 0.3) <= TOL


def test_export_metrics_report(spark, tmp_path):
    """Artifact export twin of the reference's evaluation pipeline output
    (metrics_report.csv/json + chart dir; reference:
    backend/evaluation/evaluation_pipeline.py:159-213)."""
    import csv
    import json
    import os

    from clinical_trial_searchengine_spark.operators.eval import (
        export_metrics_report,
    )

    per_q = spark.createDataFrame(
        [("q1", 0.5, 0.25, 1.0), ("q2", 0.1, 0.05, 0.0),
         ("__mean__", 0.3, 0.15, 0.5)],
        "query_id string, precision double, recall double, hit_rate double",
    )
    out = str(tmp_path / "report")
    means = export_metrics_report(per_q, out, k=10)
    # pre-aggregated __mean__ row must be excluded from the recomputed means
    assert means == {
        "precision@10": 0.3, "recall@10": 0.15, "hit_rate@10": 0.5,
    }
    with open(os.path.join(out, "metrics_report.json")) as f:
        assert json.load(f) == means
    with open(os.path.join(out, "metrics_report.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["metric", "value"]
    assert {r[0] for r in rows[1:]} == set(means)
    with open(os.path.join(out, "per_query_metrics.csv")) as f:
        pq_rows = list(csv.reader(f))
    assert len(pq_rows) == 3  # header + 2 queries, no __mean__
    svg = os.path.join(out, "metrics_charts", "metrics.svg")
    assert os.path.exists(svg)
    body = open(svg).read()
    assert body.startswith("<svg")
    assert "precision@10" in body  # bar labels present
    assert "<rect" in body and "0.300" in body
