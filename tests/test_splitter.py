"""Golden tests for the stateful criteria splitter (X3) — semantics match
the reference parser (reference: backend/db/scrape_clinical_trials.py:133-181)
on headers, bullets, continuations, and flush order."""

from __future__ import annotations

from clinical_trial_searchengine_spark.functions.splitter import (
    explode_sections,
    split_sections,
)

GOLDEN_BLOB = """
Eligibility overview text
that spans two lines.

Inclusion Criteria:

- Age 18 years or older
- Confirmed diagnosis of the
  condition under study
* Signed informed consent

Exclusion Criteria:

• Prior treatment with the drug
trailing continuation of the bullet
- Pregnant or nursing
"""


def test_split_sections_golden():
    # reference semantics: bullet lines emit IMMEDIATELY; non-bullet lines
    # buffer (joined with ' ') and flush as their OWN row at the next
    # header/bullet/end (reference: scrape_clinical_trials.py:155-181)
    got = split_sections(GOLDEN_BLOB)
    assert got == [
        ("other", 1, "Eligibility overview text that spans two lines."),
        ("inclusion", 1, "Age 18 years or older"),
        ("inclusion", 2, "Confirmed diagnosis of the"),
        ("inclusion", 3, "condition under study"),
        ("inclusion", 4, "Signed informed consent"),
        ("exclusion", 1, "Prior treatment with the drug"),
        ("exclusion", 2, "trailing continuation of the bullet"),
        ("exclusion", 3, "Pregnant or nursing"),
    ]


def test_split_sections_edges():
    assert split_sections(None) == []
    assert split_sections("") == []
    assert split_sections("Inclusion Criteria:\n\n") == []
    # bullet chars and surrounding spaces are stripped, empty bullets dropped
    assert split_sections("- \n-  x ") == [("other", 1, "x")]
    # buffered text before any header is 'other'
    assert split_sections("just prose\nover lines") == [
        ("other", 1, "just prose over lines")
    ]


def test_explode_sections_distributed(spark):
    df = spark.createDataFrame(
        [(1, GOLDEN_BLOB), (2, "- a\n- b"), (3, None)],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["type"], r["seq"], r["text"])
        for r in explode_sections(df).collect()
    )
    exp = sorted(
        [(1, t, s, x) for t, s, x in split_sections(GOLDEN_BLOB)]
        + [(2, "other", 1, "a"), (2, "other", 2, "b")]
    )
    assert rows == exp
