"""Round-6 probe: decompose minhash_lsh_dedup / bm25_documents_topk wall
time at a given SF (guide §1: measure first; noop-sink isolation §1.4).

Stages timed for minhash (steady-state, after one warm pass):
  sig_only      signature UDF + banding, noop sink
  cand_only     candidate pairs (no verify), count
  full          full operator count (bench cell shape)
For bm25: tokens-scan once vs the full op.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cell(spark, name, fn, n=3):
    spark.sparkContext.setJobDescription(name)
    fn()
    v = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        v.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    return {"min_s": round(min(v), 3), "p50_s": round(statistics.median(v), 3)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    from pyspark.sql import functions as F

    from clinical_trial_searchengine_spark.operators.dedup import (
        minhash_lsh_duplicates,
        minhash_signature_udf,
        shingle_expr,
    )
    from clinical_trial_searchengine_spark.plans.dataframe_bm25 import (
        bm25_topk,
        tokens_df,
    )
    from clinical_trial_searchengine_spark.session import get_spark

    spark = get_spark(
        app_name="ctse-probe-ops", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    sig = docs.select(
        F.col("doc_id").alias("id"),
        minhash_signature_udf(128, 3)(F.col("text")).alias("sig"),
    )
    out["minhash_sig_noop"] = cell(spark, "minhash:sig", lambda: noop(sig))
    cand = minhash_lsh_duplicates(docs, threshold=0.8, verify=False)
    out["minhash_cand_count"] = cell(
        spark, "minhash:cand", lambda: cand.count()
    )
    out["minhash_full_count"] = cell(
        spark, "minhash:full",
        lambda: minhash_lsh_duplicates(docs, threshold=0.8).count(),
    )
    sh = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.expr(shingle_expr("text", 3))).alias("sh"),
    )
    out["shingle_explode_noop"] = cell(spark, "minhash:shingles",
                                       lambda: noop(sh))

    tok = tokens_df(docs, "text", "doc_id")
    out["bm25_tokens_noop"] = cell(spark, "bm25:tokens", lambda: noop(tok))
    q = {"merge": 1.0, "join": 1.0, "filter": 1.0}
    out["bm25_topk_collect"] = cell(
        spark, "bm25:full", lambda: bm25_topk(docs, q, k=10).collect()
    )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
