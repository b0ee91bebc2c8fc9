"""Index build: corpus -> compressed doc-sharded segments.

Single logical DAG (SURVEY.md §3.4), all vectorized:

  read corpus -> sha256 invariant check -> deterministic doc_id assignment
  -> analyzer pandas UDF (per-doc sorted (term, tf) + doc_len)
  -> doc_meta + global stats + GLOBAL per-term df/cf
  -> salted shuffle: groupBy(shard, term, salt) -> encode kernel
     (delta + varint + block-max metadata, functions/codec.py)
  -> merge salted runs per (shard, term) -> join global term stats
  -> write postings (partitioned by shard), norms, manifest, metrics.

Scale notes (the part that matters at 10^12 docs):
* doc_id = global rank under (repo, path, commit) — computed with a range
  repartition + per-partition row_number + tiny collected offset table, never
  a global single-partition window.  Rank is independent of partition
  boundaries, so resume/rerun always reassigns identical ids.
* tf is counted INSIDE the analyzer UDF, so the big shuffle moves one row per
  (doc, distinct term), not per token (~50x fewer rows).
* Hot terms ('def', 'the', ...; the reference-domain analogues are 'patient',
  'trial') are salted into contiguous doc_id sub-ranges before the encode
  shuffle; salted runs re-merge to byte-identical lists (property-tested).
* Per-term df/cf are computed globally BEFORE sharding and joined onto every
  shard's rows — per-shard stats would silently change BM25 (SURVEY.md
  §2.8-B5: the reference's single shard makes stats exact; ours must too).
* Resume: stage-grained manifest + per-shard-group postings writes, each
  group directory overwritten atomically (idempotent).  Reference analogue:
  page_token checkpoint (backend/db/scrape_clinical_trials.py:483-543).
"""

from __future__ import annotations

import math
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from clinical_trial_searchengine_spark.functions.analysis import make_analyze_udf
from clinical_trial_searchengine_spark.functions.codec import encode_postings
from clinical_trial_searchengine_spark.plans import segments as seg

DEFAULT_SHARD_SIZE = 100_000  # docs per shard; ~10-50M on a real cluster
DEFAULT_NORM_CHUNK = 65_536   # doc_lens per norms row (256 KiB int32 cells)


# ---------------------------------------------------------------------------
# doc_id assignment
# ---------------------------------------------------------------------------


def assign_doc_ids(corpus: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Dense doc_id = global rank under (repo, path, commit).

    Range-repartition by the key, row_number within each partition, then add
    the per-partition offsets (a tiny collected table — one row per
    partition).  Avoids a global Window (single-reducer) at scale
    (SURVEY.md §7 step 3).
    """
    spark = corpus.sparkSession
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = corpus.repartitionByRange(num_partitions, "repo", "path", "commit")
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy("repo", "path", "commit")
    local = with_pid.withColumn(
        "_local", F.row_number().over(w).cast("long") - 1
    ).persist(StorageLevel.MEMORY_AND_DISK)

    counts = {r["_pid"]: r["cnt"] for r in
              local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
        )
    )
    return (
        local.join(off_df, "_pid")
        .withColumn("doc_id", F.col("_off") + F.col("_local"))
        .drop("_pid", "_local", "_off")
    )


# ---------------------------------------------------------------------------
# encode / merge kernels (grouped-map pandas UDFs)
# ---------------------------------------------------------------------------


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id")
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.uint64)
    tfs = pdf["tf"].to_numpy(dtype=np.uint64)
    buf, n_blocks = encode_postings(doc_ids, tfs)
    return pd.DataFrame(
        {
            "shard": [int(pdf["shard"].iloc[0])],
            "term": [pdf["term"].iloc[0]],
            "salt": [int(pdf["salt"].iloc[0])],
            "df_part": [len(doc_ids)],
            "cf_part": [int(tfs.sum())],
            "n_blocks": [n_blocks],
            "postings": [buf],
        }
    )


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from clinical_trial_searchengine_spark.functions.codec import decode_postings

    if len(pdf) == 1:
        row = pdf.iloc[0]
        return pd.DataFrame(
            {
                "shard": [int(row["shard"])],
                "term": [row["term"]],
                "n_blocks": [int(row["n_blocks"])],
                "postings": [row["postings"]],
                "df_shard": [int(row["df_part"])],
                "cf_shard": [int(row["cf_part"])],
            }
        )
    pdf = pdf.sort_values("salt")
    ids_parts, tf_parts = [], []
    for buf in pdf["postings"]:
        d, t = decode_postings(bytes(buf))
        ids_parts.append(d)
        tf_parts.append(t)
    doc_ids = np.concatenate(ids_parts)
    tfs = np.concatenate(tf_parts).astype(np.uint64)
    buf, n_blocks = encode_postings(doc_ids, tfs)
    return pd.DataFrame(
        {
            "shard": [int(pdf["shard"].iloc[0])],
            "term": [pdf["term"].iloc[0]],
            "n_blocks": [n_blocks],
            "postings": [buf],
            "df_shard": [len(doc_ids)],
            "cf_shard": [int(tfs.sum())],
        }
    )


def _pack_norms(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id")
    lens = pdf["doc_len"].to_numpy(dtype="<i4")
    return pd.DataFrame(
        {
            "shard": [int(pdf["shard"].iloc[0])],
            "chunk": [int(pdf["chunk"].iloc[0])],
            "first_doc_id": [int(pdf["doc_id"].iloc[0])],
            "n": [len(lens)],
            "doc_lens": [lens.tobytes()],
        }
    )


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    mode: str = "standard",
    shard_size: int = DEFAULT_SHARD_SIZE,
    hot_df_threshold: int = 100_000,
    max_salts: int = 32,
    n_resume_groups: int = 4,
    norm_chunk: int = DEFAULT_NORM_CHUNK,
    k1: float = 1.2,
    b: float = 0.75,
    verify_sha: bool = True,
) -> dict:
    """Build (or resume) the full index. Returns build metrics dict."""
    t0 = time.time()
    done = seg.manifest_done(spark, index_dir)

    # -- invariant: content sha256 must equal the source column (input_hint) --
    sha_ok = True
    if verify_sha and "content_sha256" in corpus.columns:
        if ("verify_sha", 0) not in done:
            start = time.time()
            mismatches = corpus.where(
                F.sha2(F.col("content"), 256) != F.col("content_sha256")
            ).count()
            sha_ok = mismatches == 0
            seg.manifest_append(
                spark, index_dir, "verify_sha", 0,
                "done" if sha_ok else "failed",
                rows_in=mismatches, sha_ok=sha_ok, started_at=start,
            )
            if not sha_ok:
                raise ValueError(
                    f"content_sha256 invariant violated for {mismatches} rows"
                )

    docs = assign_doc_ids(corpus)
    analyzed = docs.select(
        "doc_id", "repo", "path", "commit", "lang",
        *(["content_sha256"] if "content_sha256" in corpus.columns else []),
        make_analyze_udf(mode)(F.col("content")).alias("_a"),
    ).select(
        "doc_id", "repo", "path", "commit", "lang",
        *(["content_sha256"] if "content_sha256" in corpus.columns else []),
        F.col("_a.terms").alias("terms"),
        F.col("_a.doc_len").alias("doc_len"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # -- doc_meta + stats --
    if ("doc_meta", 0) not in done:
        start = time.time()
        analyzed.drop("terms").write.mode("overwrite").parquet(
            seg.path_of(index_dir, seg.DOC_META)
        )
        seg.manifest_append(
            spark, index_dir, "doc_meta", 0, "done", started_at=start
        )
    stats_row = (
        spark.read.parquet(seg.path_of(index_dir, seg.DOC_META))
        .agg(
            F.count("*").alias("num_docs"),
            F.avg("doc_len").alias("avg_doc_len"),
            F.sum("doc_len").alias("total_terms"),
        )
        .collect()[0]
    )
    num_docs = stats_row["num_docs"]
    if ("stats", 0) not in done:
        start = time.time()
        spark.createDataFrame(
            [stats_row.asDict()],
            "num_docs long, avg_doc_len double, total_terms long",
        ).coalesce(1).write.mode("overwrite").parquet(
            seg.path_of(index_dir, seg.STATS)
        )
        seg.manifest_append(
            spark, index_dir, "stats", 0, "done",
            rows_in=num_docs, started_at=start,
        )

    # -- pairs + GLOBAL term stats (exact df/cf; map-side combine kills skew) --
    pairs = analyzed.select(
        "doc_id", F.explode("terms").alias("_t")
    ).select(
        "doc_id", F.col("_t.term").alias("term"), F.col("_t.tf").alias("tf")
    )
    if ("term_stats", 0) not in done:
        start = time.time()
        pairs.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf")
        ).write.mode("overwrite").parquet(seg.path_of(index_dir, seg.TERM_STATS))
        seg.manifest_append(
            spark, index_dir, "term_stats", 0, "done", started_at=start
        )
    term_stats = spark.read.parquet(seg.path_of(index_dir, seg.TERM_STATS))

    # -- hot-term salt plan (explicit + logged, SURVEY.md §4.2) --
    hot = term_stats.where(F.col("df") > hot_df_threshold).select(
        "term", F.least(
            F.lit(max_salts),
            F.ceil(F.col("df") / F.lit(hot_df_threshold)).cast("int"),
        ).alias("n_salts"),
    )
    hot_rows = hot.collect()
    hot_df = spark.createDataFrame(
        [(r["term"], r["n_salts"]) for r in hot_rows] or [("", 1)],
        "term string, n_salts int",
    )
    seg.metrics_append(
        spark, index_dir, [("salt_plan", 0, "hot_terms", float(len(hot_rows)))]
    )

    # -- salted encode shuffle --
    n_shards = max(1, math.ceil(num_docs / shard_size))
    salted = (
        pairs.join(F.broadcast(hot_df), "term", "left")
        .withColumn("n_salts", F.coalesce("n_salts", F.lit(1)))
        .withColumn("shard", (F.col("doc_id") / shard_size).cast("int"))
        .withColumn(
            "salt",
            (
                (F.col("doc_id") % shard_size) * F.col("n_salts") / shard_size
            ).cast("int"),
        )
    )
    enc_schema = (
        "shard int, term string, salt int, df_part long, cf_part long, "
        "n_blocks int, postings binary"
    )
    encoded = salted.groupBy("shard", "term", "salt").applyInPandas(
        _encode_group, enc_schema
    )
    merge_schema = (
        "shard int, term string, n_blocks int, postings binary, "
        "df_shard long, cf_shard long"
    )
    merged = encoded.groupBy("shard", "term").applyInPandas(
        _merge_group, merge_schema
    )
    final = (
        merged.join(term_stats, "term")
        .select("shard", "term", "df", "cf", "n_blocks", "postings")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # -- postings written per shard-group (resume granularity) --
    n_groups = max(1, min(n_resume_groups, n_shards))
    for g in range(n_groups):
        if ("postings", g) in done:
            continue
        start = time.time()
        part = final.where(F.col("shard") % n_groups == g)
        (
            part.repartition("shard")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(seg.path_of(index_dir, seg.POSTINGS) + f"/group={g}")
        )
        n_terms = part.count()
        seg.manifest_append(
            spark, index_dir, "postings", g, "done",
            terms_out=n_terms, started_at=start,
        )
        seg.metrics_append(
            spark, index_dir, [("postings", g, "rows", float(n_terms))]
        )
    final.unpersist()

    # -- norms (doc_len arrays per shard chunk) --
    if ("norms", 0) not in done:
        start = time.time()
        norms_schema = (
            "shard int, chunk int, first_doc_id long, n int, doc_lens binary"
        )
        (
            analyzed.select("doc_id", "doc_len")
            .withColumn("shard", (F.col("doc_id") / shard_size).cast("int"))
            .withColumn(
                "chunk", ((F.col("doc_id") % shard_size) / norm_chunk).cast("int")
            )
            .groupBy("shard", "chunk")
            .applyInPandas(_pack_norms, norms_schema)
            .write.mode("overwrite")
            .parquet(seg.path_of(index_dir, seg.NORMS))
        )
        seg.manifest_append(spark, index_dir, "norms", 0, "done", started_at=start)

    analyzed.unpersist()

    meta = {
        "format_version": 1,
        "mode": mode,
        "shard_size": shard_size,
        "n_shards": n_shards,
        "num_docs": int(num_docs),
        "avg_doc_len": float(stats_row["avg_doc_len"] or 0.0),
        "total_terms": int(stats_row["total_terms"] or 0),
        "k1": k1,
        "b": b,
        "norm_chunk": norm_chunk,
        "hot_df_threshold": hot_df_threshold,
        "max_salts": max_salts,
        "n_resume_groups": n_groups,
    }
    seg.write_meta(index_dir, meta)
    meta["build_seconds"] = time.time() - t0
    return meta
