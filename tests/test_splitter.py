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


def test_sql_twin_equals_udf_kernel(spark):
    """The pure-JVM gaps-and-islands splitter must be row-identical to
    the pandas-UDF scanner (the executable spec) on randomized structured
    blobs plus the scanner's edge cases: header-containing continuation
    lines, compound bullets, whitespace-only lines, blank-line-spanning
    buffers, \\r / \\x0b line breaks, empty and NULL docs."""
    import random

    from clinical_trial_searchengine_spark.functions.splitter import (
        explode_sections,
    )

    rng = random.Random(7)
    words = ["alpha", "beta", "ecog", "age", "18", "prior", "therapy"]

    def rand_doc():
        lines = []
        for _ in range(rng.randint(0, 20)):
            r = rng.random()
            if r < 0.12:
                lines.append(rng.choice(
                    ["Inclusion Criteria:", "  EXCLUSION CRITERIA",
                     "notes on inclusion criteria here"]))
            elif r < 0.35:
                lines.append(
                    rng.choice(["- ", "-", "* ", "• ", "· ", "-- ", "-* "])
                    + " ".join(rng.sample(words, rng.randint(0, 3))))
            elif r < 0.5:
                lines.append("")
            elif r < 0.6:
                lines.append("   \t  ")
            else:
                lines.append(
                    "  " + " ".join(rng.sample(words, rng.randint(1, 4)))
                    + "  ")
        return "\n".join(lines)

    docs = [(i, rand_doc()) for i in range(80)]
    docs += [
        (1000, ""), (1001, None), (1002, "- only bullet"),
        (1003, "plain tail"), (1005, "-"), (1006, "- \n- \nx"),
        (1007, "a\r\nb\rc\x0bd"),
        (1004, "Inclusion criteria:\n\n- a\ncont1\ncont2\n- b\n"
               "Exclusion Criteria\n- c\ntail one\n\ntail two"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    key = lambda r: (r["doc_id"], r["type"], r["seq"], r["text"])  # noqa: E731
    ref = sorted(map(key, explode_sections(df, engine="udf").collect()))
    got = sorted(map(key, explode_sections(df, engine="sql").collect()))
    assert ref == got and ref


def test_sql_twin_plan_has_no_python(spark):
    """X3 default path is JVM-only: no Arrow/Python eval in the plan."""
    from clinical_trial_searchengine_spark.functions.splitter import (
        explode_sections,
    )

    df = spark.createDataFrame([(1, "a\n- b")], "doc_id long, text string")
    plan = (
        explode_sections(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "InPandas" not in plan
