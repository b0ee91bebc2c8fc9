"""Stateful section/bullet splitter (X3) — the reference's eligibility-
criteria parser re-expressed as a vectorized UDTF shape.

Observable semantics match `split_criteria`
(reference: backend/db/scrape_clinical_trials.py:133-181), implemented from
scratch: a line scanner where

* a line containing 'inclusion criteria' / 'exclusion criteria' switches the
  current section type (and flushes any buffered continuation) without
  emitting itself,
* a bullet line (-, *, •, ·) flushes the buffer and emits one row
  immediately,
* any other line is buffered; consecutive buffered lines are joined with
  ' ' and emitted as their OWN row when the next header/bullet/end flushes
  them (the reference does not append them to the preceding bullet).

Rows are (type ∈ {inclusion, exclusion, other}, seq, text) with ``seq``
1-based per (document, type) in emission order — the reference's
(trial_id, type, sequence_no, text) child-table shape
(reference: backend/db/schema.sql:79-85).

Spark surface: a pandas UDF producing array<struct<type,seq,text>> plus
``explode_sections`` — Arrow-batched kernel, one explode, no per-row Python
UDF registration.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_BULLETS = ("-", "*", "•", "·")


def split_sections(raw_text: str | None) -> list[tuple[str, int, str]]:
    """Pure kernel: one criteria blob -> [(type, seq, text), ...]."""
    if not raw_text:
        return []
    rows: list[tuple[str, int, str]] = []
    seq: dict[str, int] = {}
    current = "other"
    buffer: list[str] = []

    def emit(text: str) -> None:
        text = text.strip()
        if not text:
            return
        seq[current] = seq.get(current, 0) + 1
        rows.append((current, seq[current], text))

    def flush() -> None:
        nonlocal buffer
        if buffer:
            emit(" ".join(buffer))
            buffer = []

    for line in (ln.strip() for ln in raw_text.splitlines()):
        lower = line.lower()
        if "inclusion criteria" in lower:
            flush()
            current = "inclusion"
            continue
        if "exclusion criteria" in lower:
            flush()
            current = "exclusion"
            continue
        if line.startswith(_BULLETS):
            flush()
            emit(line.lstrip("".join(_BULLETS) + " "))
        else:
            if line:
                buffer.append(line)
    flush()
    return rows


_SECTION_SCHEMA = ArrayType(
    StructType(
        [
            StructField("type", StringType()),
            StructField("seq", IntegerType()),
            StructField("text", StringType()),
        ]
    )
)


def split_sections_udf():
    """text -> array<struct<type,seq,text>> (Arrow-batched)."""

    @F.pandas_udf(_SECTION_SCHEMA)
    def _split(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [
                    {"type": t, "seq": s, "text": x}
                    for t, s, x in split_sections(v)
                ]
                for v in texts
            ]
        )

    return _split


def explode_sections(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, blob) -> one row per parsed section entry:
    (id, type, seq, text).  The UDTF shape: kernel builds the nested array,
    a single explode flattens it — the child rows land co-partitioned with
    their parent, no shuffle."""
    return df.select(
        F.col(id_col),
        F.explode(split_sections_udf()(F.col(text_col))).alias("_s"),
    ).select(
        id_col,
        F.col("_s.type").alias("type"),
        F.col("_s.seq").alias("seq"),
        F.col("_s.text").alias("text"),
    )
