"""Idempotent incremental indexing (batch, manifest-driven).

v1 semantics: detect rows not yet indexed via an anti-join on the stable doc
key; if any exist, rebuild the index over the full corpus (exact global
stats require it — df/avgdl shift with every new doc, and BM25 with stale
stats would silently diverge from the oracle).  The detection itself is the
scalable part; generation-based delta segments with stats refresh are the
planned v2 (requires a query-time segment-generation merge).

Reference analogue: the scraper's resumable page_token upsert loop
(reference: backend/db/scrape_clinical_trials.py:464-557) — new pages are
merged into Postgres and a later full reindex refreshes OpenSearch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clinical_trial_searchengine_spark.plans import segments as seg
from clinical_trial_searchengine_spark.plans.build import build_index


def incremental_index(
    spark: SparkSession, corpus: DataFrame, index_dir: str, **build_kwargs
) -> dict:
    import os

    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        out = build_index(spark, corpus, index_dir, **build_kwargs)
        out["new_docs"] = out["num_docs"]
        return out
    doc_meta = spark.read.parquet(seg.path_of(index_dir, seg.DOC_META))
    new = corpus.join(
        doc_meta.select("repo", "path", "commit"),
        ["repo", "path", "commit"],
        "left_anti",
    )
    n_new = new.count()
    meta = seg.read_meta(index_dir)
    if n_new == 0:
        meta["new_docs"] = 0
        return meta
    # exact-stats rebuild (see module docstring); manifest is reset because
    # doc_ids shift when the key set changes
    import shutil

    shutil.rmtree(index_dir)
    out = build_index(spark, corpus, index_dir, **build_kwargs)
    out["new_docs"] = n_new
    return out
