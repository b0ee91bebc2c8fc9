"""Structured Streaming ingest: new corpus files -> index.

Spark-idiomatic analogue of the reference's resumable paged scraper
(reference: backend/db/scrape_clinical_trials.py:464-557 — fetch page,
upsert, checkpoint page_token, later reindex): here the "pages" are files
landing in a directory, the checkpoint is Structured Streaming's own
file-source checkpoint (exactly-once file tracking), and the upsert is an
idempotent per-batch staging write followed by a manifest-driven
incremental index pass.

Two entry points:

* :func:`stream_corpus_to_index` — file-source stream of north-rule corpus
  rows; each micro-batch lands in ``staging_dir/batch=<id>`` (overwrite =
  idempotent on retry, so the pipeline is exactly-once end-to-end), then
  the incremental indexer folds staged rows into the segment index.
  ``availableNow`` trigger: drains everything currently in the source and
  stops — the batch-resumable shape the reference has, expressed in
  Structured Streaming so a continuous trigger is a one-line change.
* :func:`stream_windowed_event_counts` — watermarked tumbling-window
  aggregation (the standard late-data-tolerant streaming agg shape), used
  by tests against the equivalent batch query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STREAM_CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, content_sha256 string"
)


def stream_corpus_to_index(
    spark: SparkSession,
    source_dir: str,
    staging_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str = STREAM_CORPUS_SCHEMA,
    max_files_per_trigger: int | None = None,
    **build_kwargs,
) -> dict:
    """Drain all new files from ``source_dir`` into the index; returns the
    final build meta (with ``new_docs``).  Re-running is a no-op until new
    files land (file-source checkpoint skips processed files; staging
    writes are per-batch overwrites; the index build is manifest-resumable).
    """
    from clinical_trial_searchengine_spark.streaming.incremental import (
        incremental_index,
    )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def _stage(batch_df: DataFrame, batch_id: int) -> None:
        # overwrite => retry-idempotent; directory name = batch id lineage
        batch_df.write.mode("overwrite").parquet(
            f"{staging_dir}/batch={batch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(_stage)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    import os

    from pyspark.sql.types import StructType
    from pyspark.sql.utils import AnalysisException

    cols = StructType.fromDDL(schema).fieldNames()
    try:
        # probe via the reader, not os.path.exists: staging_dir may be a
        # non-driver-local URI (hdfs://, s3a://) where exists() is always
        # False and drained batches would silently never be indexed
        # `batch` is the partition column of the staging layout; keep it so
        # re-staged keys (re-export / backfill landing the same
        # (repo, path, commit) in a later batch) dedup to the LATEST version
        # instead of being indexed twice (upsert-by-key semantics, matching
        # the reference scraper's ON CONFLICT DO UPDATE,
        # reference: backend/db/scrape_clinical_trials.py:332-462).
        staged_raw = spark.read.option("basePath", staging_dir).parquet(
            staging_dir
        )
        staged_raw.schema  # force analysis (PATH_NOT_FOUND surfaces here)
        w_latest = (
            staged_raw.groupBy("repo", "path", "commit")
            .agg(F.max("batch").alias("batch"))
        )
        staged = staged_raw.join(
            w_latest, ["repo", "path", "commit", "batch"], "left_semi"
        ).select(*cols)
    except AnalysisException:
        # nothing has ever been drained: no batch ran, nothing to index
        if os.path.exists(os.path.join(index_dir, "meta.json")):
            from clinical_trial_searchengine_spark.plans.segments import (
                read_meta,
            )

            meta = read_meta(index_dir)
            meta["new_docs"] = 0
            return meta
        return {"num_docs": 0, "new_docs": 0}
    return incremental_index(spark, staged, index_dir, **build_kwargs)


def stream_windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    schema: str = "event_id long, ts timestamp, event_type string, value double, props string",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window count/avg per event_type.

    Streaming twin of the batch `events_hourly` query
    (`__spark_entry__._q_events_hourly`); with an `availableNow` drain the
    two produce identical rows, which is exactly what tests assert.  The
    watermark bounds state: events later than `watermark` behind the max
    seen timestamp are dropped instead of growing state forever.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "avg_value",
        )
    )
