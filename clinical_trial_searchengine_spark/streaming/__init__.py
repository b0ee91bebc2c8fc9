"""Streaming surface.

The reference has NO streaming operators (SURVEY.md §2.9): its closest
analogues are resumable paged ingestion and restartable batch enrichment,
which map to the build manifest (plans/segments.py), not to Structured
Streaming.  :func:`incremental_index` covers the "new rows arrived" case as
idempotent batch: index only docs not yet in doc_meta, as a new segment
generation.
"""

from clinical_trial_searchengine_spark.streaming.incremental import (  # noqa: F401
    incremental_index,
)
