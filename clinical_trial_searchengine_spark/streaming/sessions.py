"""Custom stateful streaming operator: per-user event sessionization.

The one UDF shape the engine had not yet exercised —
``applyInPandasWithState`` — demonstrated on an arbitrary per-key state
machine: gap-based sessionization (a session = consecutive events of
one user with inter-event gaps below a threshold; a quiet gap closes it).
The reference has no streaming at all (SURVEY.md §2.9); this is part of
the training-data-pipeline surface (session aggregates are a standard
feature/label input), built the way it must work at 100 TB:

* state is partitioned by the group key (``user_id``) — a shuffle on the
  key, then O(1) state per live user, never per event;
* the event-time watermark bounds state: users idle past
  ``watermark`` + ``gap`` are closed by EventTimeTimeout, so state size
  tracks ACTIVE users, not historical ones;
* emitted rows are append-only closed sessions — safe to sink to parquet.

A batch twin (:func:`sessionize_events_batch`, classic gaps-and-islands
over a window) defines the exact semantics; the streaming operator is
property-tested against it (tests/test_streaming.py) and the batch twin
is driver-gated against a DuckDB oracle (gate: ``sessionize_events``).

Scope note: for a PLAIN session aggregate, Spark's built-in
``F.session_window`` groupBy is the first choice (it also merges
fully-disordered late data within the watermark).  This operator exists
for the general shape — an arbitrary per-key state machine — and assumes
micro-batches arrive in event-time order at SESSION granularity (file /
Kafka arrival order); an in-horizon out-of-order event still joins the
open session (monotonic session end), but an event older than an
already-emitted session cannot reopen it, by design of eager emission.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
# state: open session as primitive micros/accumulators (timestamps kept as
# int64 so state encoding is engine-version-proof)
_STATE_SCHEMA = "start_us long, last_us long, n_events long, sum_value double"


def sessionize_events_batch(events: DataFrame, gap_minutes: int = 360) -> DataFrame:
    """Gaps-and-islands sessionization (batch twin, defines the semantics).

    One window pass: ``lag(ts)`` marks session breaks (null or gap >
    ``gap_minutes``), a running sum of breaks numbers each user's sessions,
    then one hash aggregation per (user, session).  ONE shuffle total
    (plan-audited): both windows share one user_id sort, and the groupBy's
    ClusteredDistribution(user_id, session_no) is satisfied by the
    window's hashpartitioning(user_id) subset, so no second exchange —
    the plan holds at any event count; per-user window state is one row.
    """
    gap_us = int(gap_minutes) * 60_000_000
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = events.select(
        "user_id", "ts", "value", "event_id",
        # tz-independent micros (works for TIMESTAMP and TIMESTAMP_NTZ)
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            " ts)"
        ).alias("us"),
    )
    brk = (
        F.col("prev").isNull() | ((F.col("us") - F.col("prev")) > gap_us)
    ).cast("int")
    return (
        e.withColumn("prev", F.lag("us").over(w))
        .withColumn("brk", brk)
        .withColumn("session_no", F.sum("brk").over(w))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def sessionize_oracle_sql(gap_minutes: int = 360) -> str:
    """DuckDB equivalent of :func:`sessionize_events_batch` (same column
    names; driver gate)."""
    gap_us = int(gap_minutes) * 60_000_000
    return f"""
WITH e AS (
  SELECT user_id, ts, value, event_id, epoch_us(ts) AS us FROM events
),
m AS (
  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
  FROM e
),
f AS (
  SELECT *, CASE WHEN prev IS NULL OR us - prev > {gap_us} THEN 1 ELSE 0 END
         AS brk
  FROM m
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM f
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, session_no
"""


def _make_session_func(gap_minutes: int):
    gap_us = gap_minutes * 60_000_000

    def func(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]

        def emit(start_us, last_us, n, sv):
            return pd.DataFrame(
                {
                    "user_id": pd.array([user_id], dtype="int64"),
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": pd.array([n], dtype="int64"),
                    "sum_value": [round(float(sv), 6)],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n, sv = state.get
            state.remove()
            yield emit(start_us, last_us, n, sv)
            return

        pdf = pd.concat(list(pdfs), ignore_index=True)
        # event-time order within the micro-batch; across micro-batches the
        # watermark guarantees no event older than (max_ts - watermark)
        # arrives, and state carries the open session between batches
        pdf = pdf.sort_values(["ts", "event_id"], kind="stable")
        # unit-proof micros: pandas may hand datetime64[ns] or [us]
        us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        vals = pdf["value"].to_numpy()

        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us, last_us, n, sv = None, None, 0, 0.0

        for ts_us, v in zip(us, vals):
            if start_us is None:
                start_us, last_us, n, sv = int(ts_us), int(ts_us), 1, float(v)
            elif ts_us - last_us > gap_us:
                yield emit(start_us, last_us, n, sv)
                start_us, last_us, n, sv = int(ts_us), int(ts_us), 1, float(v)
            else:
                # min()/max(): an out-of-order event inside the watermark
                # horizon joins the open session without dragging its end
                # backwards, and extends session_start backwards if it
                # predates it (even by more than the gap — once it reached
                # this branch it belongs to the open session; cross-batch
                # splits on such stragglers are impossible to reconstruct
                # from O(1) state, so fold-in is the documented semantic)
                start_us, last_us, n, sv = (
                    min(int(ts_us), start_us),
                    max(int(ts_us), last_us),
                    n + 1,
                    sv + float(v),
                )

        state.update((int(start_us), int(last_us), int(n), float(sv)))
        # close the open session if the user stays quiet past the gap
        # (event-time clock: watermark must pass last_us + gap); Spark
        # requires the timeout to sit beyond the current watermark
        to_ms = (int(last_us) + gap_us) // 1_000
        state.setTimeoutTimestamp(max(to_ms, state.getCurrentWatermarkMs() + 1))

    return func


def sessionize_events_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    gap_minutes: int = 360,
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming sessionizer: drains ``source_dir`` (availableNow), emits
    CLOSED sessions to ``output_dir`` (append-only parquet), returns them.

    Sessions still open when the stream drains stay in state (or are closed
    by event-time timeout once the watermark passes their gap horizon) —
    the streaming contract: a session is only emitted once it can no longer
    grow.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = spark.read.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        # several micro-batches per drain: exercises open-session state
        # carried across batches (availableNow still bounds the run)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    # Spark's event-time machinery requires TIMESTAMP (not NTZ); the cast
    # reinterprets under the session timezone, which cancels out — the
    # kernel works on gap DIFFERENCES and emits wall-clock-identical values
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_func(gap_minutes),
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(output_dir)
