"""Scan-parallelism guard for compute-heavy operators (guide §2.5).

A parquet scan's task count is bounded by its files' row-group layout: a
single large row group is unsplittable, so a table written as one fat file
feeds exactly ONE task no matter how many cores exist.  Every
compute-heavy operator over such a scan (MinHash signatures, tokenize +
explode, shingling, dot products) then runs serially — measured here: the
sf1.0 `documents` table is one 50k-row row group, and the MinHash
signature kernel spent 4.9 s on one core of 32.

:func:`spread_for_compute` repartitions ONLY when the scan underfills the
cluster (partition count below half the default parallelism).  At real
scale the input is thousands of splits and this is a no-op — the check is
against the live scan layout, not a constant — so the extra exchange is
paid exactly when the alternative is serial execution, and what it
shuffles there is by definition a small input (few splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(
    df: DataFrame, min_fill: float = 0.5, min_bytes: int = 0
) -> DataFrame:
    """Round-robin repartition ``df`` to the cluster's default parallelism
    when its current partition count is below ``min_fill`` of it; no-op
    otherwise (the at-scale case).  Row-level semantics are unchanged —
    callers are aggregations/joins that do not depend on row order.

    ``min_bytes``: additionally skip the spread when the optimizer's
    size estimate is below this — for operators whose per-byte compute
    is cheap (e.g. dot products), the repartition shuffle of a tiny
    input costs more than the serial scan it parallelizes (measured:
    +40 ms on a 0.5 MB embeddings table vs -90 ms on the 12 MB one).
    Heavy-per-byte operators (signatures, shingling) pass 0."""
    sc = df.sparkSession.sparkContext
    target = max(1, int(sc.defaultParallelism))
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= max(1, int(target * min_fill)):
        return df
    if min_bytes > 0:
        try:
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats()
                .sizeInBytes()
            )
            if est < min_bytes:
                return df
        except Exception:
            pass
    return df.repartition(target)
