"""Emit .explain("formatted") for every query path round 6 touched.

Usage: python gen_round_plans.py <repo_root> <out_dir> <suffix>
Runs against whichever tree is first on sys.path, so the same script
produces the _before (round-start worktree) and _after (current tree)
plan files committed under plans/r06/.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = sys.argv[1]
OUT = sys.argv[2]
SUFFIX = sys.argv[3]
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, REPO)


def explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    import hashlib

    from pyspark.sql import functions as F

    from clinical_trial_searchengine_spark.engine import SearchEngine
    from clinical_trial_searchengine_spark.operators.dedup import (
        minhash_lsh_duplicates,
        ngram_jaccard_pairs,
        simhash_duplicates,
    )
    from clinical_trial_searchengine_spark.operators.similarity import (
        cosine_knn_join,
        cosine_topk,
    )
    from clinical_trial_searchengine_spark.plans.dataframe_bm25 import (
        bm25_topk,
    )
    from clinical_trial_searchengine_spark.session import get_spark
    from clinical_trial_searchengine_spark.sources.tables import (
        documents_as_corpus,
    )

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark(
        master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding")
        .collect()[0][0]
    ]
    import pandas as pd

    tag = hashlib.md5((sf_dir + SUFFIX).encode()).hexdigest()[:8]
    index_dir = f"/tmp/ctse_plan_idx_{tag}"
    eng = SearchEngine(spark, index_dir)
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        eng.build(documents_as_corpus(spark, sf_dir), shard_size=2048,
                  hot_df_threshold=1000)
    eng.warm(postings=True)

    plans = {
        "engine_warmed_query": lambda: eng.search("merge join filter", k=10),
        "engine_warmed_query_hot": lambda: eng.search(
            "merge join filter", k=10
        ),  # second build: plan-cache hit returns the same DataFrame
        "bm25_documents_topk": lambda: bm25_topk(
            docs, {"merge": 1.0, "join": 1.0, "filter": 1.0}, k=10
        ),
        "minhash_lsh_dedup": lambda: minhash_lsh_duplicates(
            docs, threshold=0.8
        ),
        "simhash_pairs": lambda: simhash_duplicates(docs, max_hamming=3),
        "ngram_jaccard_pairs": lambda: ngram_jaccard_pairs(
            docs, threshold=0.8
        ),
        "ann_cosine_topk": lambda: cosine_topk(emb, qvec, k=10),
        "ann_knn_join": lambda: cosine_knn_join(
            emb,
            pd.DataFrame({"query_id": ["q0"], "vec": [qvec]}),
            k=5,
        ),
    }
    for name, fn in plans.items():
        try:
            df = fn()
            # execute once so AQE final plans render where applicable
            try:
                df.collect()
            except Exception:
                pass
            txt = explain(df)
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building plan: {e}\n"
        with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as fh:
            fh.write(txt)
        print("wrote", name, SUFFIX)
    spark.stop()


if __name__ == "__main__":
    main()
