"""BatchingSearchServer: batched results must be IDENTICAL to the
per-query path (batching changes throughput, never results), and the
dispatcher must actually batch under concurrency."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from clinical_trial_searchengine_spark.serving import BatchingSearchServer
from clinical_trial_searchengine_spark.sources.corpus import (
    reference_queries,
)


@pytest.fixture(scope="module")
def server(built_index):
    built_index.warm(postings=True)
    with BatchingSearchServer(built_index, max_batch=16) as srv:
        yield srv


def test_concurrent_results_identical_to_per_query(built_index, server):
    qs = reference_queries()
    expected = {
        q["query_id"]: built_index.search_topk_rows(q["text"], k=q["k"])
        for q in qs
    }
    with ThreadPoolExecutor(max_workers=12) as ex:
        futs = {
            q["query_id"]: ex.submit(server.search, q["text"], q["k"])
            for q in qs
        }
        got = {key: f.result(timeout=120) for key, f in futs.items()}
    assert got == expected


def test_batches_form_under_concurrency(server):
    qs = reference_queries()
    before = server.batches_run
    with ThreadPoolExecutor(max_workers=12) as ex:
        list(ex.map(lambda q: server.search(q["text"], q["k"]), qs * 2))
    ran = server.batches_run - before
    # 40 queries through a busy dispatcher must fold into far fewer jobs
    assert ran < 2 * len(qs)
    assert server.queries_served >= 2 * len(qs)


def test_mixed_k_and_duplicate_texts(built_index, server):
    text = "def license"
    with ThreadPoolExecutor(max_workers=4) as ex:
        f3 = ex.submit(server.search, text, 3)
        f7 = ex.submit(server.search, text, 7)
        fz = ex.submit(server.search, "zzznohit qqqmissing", 5)
        got3, got7, gotz = f3.result(60), f7.result(60), fz.result(60)
    assert got3 == built_index.search_topk_rows(text, k=3)
    assert got7 == built_index.search_topk_rows(text, k=7)
    assert got3 == got7[:3]
    assert gotz == []


def test_search_many_rows_identical_to_search_many(built_index):
    """Driver-merge twin == Window-rank batch == per-query path."""
    qs = reference_queries()
    texts = {q["query_id"]: q["text"] for q in qs}
    kmax = max(q["k"] for q in qs)
    rows = built_index.search_many_rows(texts, k=kmax)
    df = {
        qid: [] for qid in texts
    }
    for r in built_index.search_many(texts, k=kmax).orderBy(
        "query_id", "rank"
    ).collect():
        df[r["query_id"]].append((r["doc_id"], r["score"]))
    assert rows == df
    for q in qs:
        assert rows[q["query_id"]][: q["k"]] == built_index.search_topk_rows(
            q["text"], k=q["k"]
        )


def test_submit_after_close_raises(built_index):
    srv = BatchingSearchServer(built_index)
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit("def", 5)
