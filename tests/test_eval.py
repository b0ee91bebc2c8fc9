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
