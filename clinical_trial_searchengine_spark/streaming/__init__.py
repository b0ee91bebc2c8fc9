"""Streaming surface.

The reference has NO streaming operators (SURVEY.md §2.9): its closest
analogues are resumable paged ingestion and restartable batch enrichment,
which map to the build manifest (plans/segments.py).  Two layers here:

* :func:`incremental_index` — idempotent batch: index only docs not yet in
  doc_meta (anti-join on the stable key), exact-stats rebuild.
* :mod:`ingest` — Structured Streaming on top of it:
  :func:`stream_corpus_to_index` (file-source stream -> exactly-once
  staging -> incremental index; availableNow trigger = the reference's
  resumable drain) and :func:`stream_windowed_event_counts`
  (watermarked tumbling-window agg).
"""

from clinical_trial_searchengine_spark.streaming.incremental import (  # noqa: F401
    incremental_index,
)
from clinical_trial_searchengine_spark.streaming.ingest import (  # noqa: F401
    stream_corpus_to_index,
    stream_windowed_event_counts,
)
