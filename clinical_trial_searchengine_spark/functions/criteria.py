"""Eligibility-criteria parsers (reference X5-X13) as JVM Column expressions.

The reference parses eligibility free text with per-row Python regexes
(reference: backend/nlp/criteria_parser.py:60-276).  Here every parser is a
composable pyspark Column expression — regexp_extract / rlike / when chains
that stay inside whole-stage codegen — so parsing 10^12 rows is a single
projection with no Python worker anywhere.  Dictionary-driven extractors
(X7 conditions/biomarkers, X9 labs, X13 normalizer) take a small synonym
DataFrame and use a broadcast join (dict side is KBs; stream side scans
once), see :mod:`.synonyms`.

All patterns avoid lookaround so Java regex (Spark) and RE2 (DuckDB — the
correctness oracle) agree; every gate in __spark_entry__ cross-checks that.

Divergence from the reference, by design:
* the reference's condition extractor treats ``*_Count`` lab keys as
  conditions (``criteria_parser.py:95`` skips only ``_Gene/_Receptor/
  _Level``); we classify suffixes uniformly (labs = ``_Level/_Count``,
  biomarkers = ``_Gene/_Receptor/_Marker/_Status/_Mutation/_Score``,
  everything else a condition).
* the reference's biomarker normalizer never word-bounds its patterns (a
  latent bug: ``"\\b"`` written in a non-raw string,
  ``biomarker_normalizer.py:63``); we use real word boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# X5 — age range (reference: backend/nlp/criteria_parser.py:69-82)
_AGE_MIN_PAT = r"(?:≥|>=|at least|age|>\s*)\s*:?\s*(\d{1,3})\s*(?:years|yrs|y\.o\.|yo)"
_AGE_MAX_PAT = r"(?:≤|<=|up to|younger than)\s*:?\s*(\d{1,3})\s*(?:years|yrs|y\.o\.|yo)"


def age_range(text: Column) -> Column:
    """struct<min_age:int, max_age:int> from free text.

    Defaults (0, 100); values over 120 are treated as parse noise and reset;
    an inverted range keeps min and resets max (reference semantics).
    """
    t = F.lower(text)
    raw_min = F.regexp_extract(t, _AGE_MIN_PAT, 1)
    raw_max = F.regexp_extract(t, _AGE_MAX_PAT, 1)
    min_a = F.when(raw_min == "", F.lit(0)).otherwise(
        raw_min.cast("int")
    )
    max_a = F.when(raw_max == "", F.lit(100)).otherwise(
        raw_max.cast("int")
    )
    min_a = F.when(min_a > 120, F.lit(0)).otherwise(min_a)
    max_a = F.when(max_a > 120, F.lit(100)).otherwise(max_a)
    max_a = F.when(min_a > max_a, F.lit(100)).otherwise(max_a)
    return F.struct(min_a.alias("min_age"), max_a.alias("max_age"))


# X6 — gender (reference: criteria_parser.py:84-89)
_FEMALE_PAT = r"\b(women|female|females)\b"
_MALE_PAT = r"\b(men|male|males)\b"


def gender(text: Column) -> Column:
    """'Female' | 'Male' | 'All' (both or neither mentioned -> 'All')."""
    t = F.lower(text)
    has_f = t.rlike(_FEMALE_PAT)
    has_m = t.rlike(_MALE_PAT)
    return (
        F.when(has_f & ~has_m, F.lit("Female"))
        .when(has_m & ~has_f, F.lit("Male"))
        .otherwise(F.lit("All"))
    )


# X8 — ECOG allowed-score set (reference: criteria_parser.py:120-137)
_ECOG_RANGE_PAT = r"(?:ecog|zubrod|who).*?status.*?(\d)\s*(?:-|to)\s*(\d)"
_ECOG_LTE_PAT = r"(?:ecog|zubrod|who).*?(?:≤|<=|up to|less than).*?(\d)"
_ECOG_SIMPLE_PAT = r"(?:ecog|zubrod|who).*?(\d)(?:\s*or\s*|\s*,\s*)(\d)"


def ecog_allowed(text: Column) -> Column:
    """Sorted array<int> of allowed ECOG scores (empty when unstated).

    Union of a range pattern ("status 0-2") and an upper-bound pattern
    ("ecog <= 1"); a plain "0 or 1" enumeration only when both miss.
    """
    t = F.lower(text)
    r1 = F.regexp_extract(t, _ECOG_RANGE_PAT, 1)
    r2 = F.regexp_extract(t, _ECOG_RANGE_PAT, 2)
    rng = F.when(
        (r1 != "") & (r1.cast("int") <= r2.cast("int"))
        & (r2.cast("int") <= 5),
        F.sequence(r1.cast("int"), r2.cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    lim = F.regexp_extract(t, _ECOG_LTE_PAT, 1)
    lte = F.when(
        (lim != "") & (lim.cast("int") <= 5),
        F.sequence(F.lit(0), lim.cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    merged = F.array_sort(F.array_union(rng, lte))
    s1 = F.regexp_extract(t, _ECOG_SIMPLE_PAT, 1)
    s2 = F.regexp_extract(t, _ECOG_SIMPLE_PAT, 2)
    simple = F.when(
        s1 != "",
        F.array_sort(
            F.array_distinct(
                F.array(s1.cast("int"), s2.cast("int"))
            )
        ),
    ).otherwise(F.array().cast("array<int>"))
    return F.when(F.size(merged) > 0, merged).otherwise(simple)


# X10 — washout periods in days (reference: criteria_parser.py:166-192)
_CHEMO_WASH_PAT = r"(\d+)\s*(day|week|month)s?.*?since.*?(chemo|treatment|therapy)"
_SURG_WASH_PAT = r"(\d+)\s*(day|week|month)s?.*?since.*?(surger|operation)"


def _to_days(val: Column, unit: Column) -> Column:
    return (
        F.when(unit == "week", val * 7)
        .when(unit == "month", val * 30)
        .otherwise(val)
    )


def washouts(text: Column) -> Column:
    """struct<chemo_washout:int, surgery_washout:int>, nulls when absent."""
    t = F.lower(text)
    out = []
    for pat, name in (
        (_CHEMO_WASH_PAT, "chemo_washout"),
        (_SURG_WASH_PAT, "surgery_washout"),
    ):
        v = F.regexp_extract(t, pat, 1)
        u = F.regexp_extract(t, pat, 2)
        out.append(
            F.when(v != "", _to_days(v.cast("int"), u))
            .otherwise(F.lit(None).cast("int"))
            .alias(name)
        )
    return F.struct(*out)


# X11 — lines of prior therapy (reference: criteria_parser.py:195-217)
_NAIVE_PAT = r"\b(treatment|chemo|therapy)\s*(naïve|naive|free)\b"
_LINES_MIN_PAT = r"(?:received|at least|>=)\s*(\d+)\s*(?:prior)?\s*(?:lines|regimens|therapies)"
_LINES_MAX_PAT = r"(?:no more than|up to|<=)\s*(\d+)\s*(?:prior)?\s*(?:lines|regimens|therapies)"


def lines_of_therapy(text: Column) -> Column:
    """struct<min_lines:int, max_lines:int>; 'treatment naive' -> (0, 0)."""
    t = F.lower(text)
    naive = t.rlike(_NAIVE_PAT)
    raw_min = F.regexp_extract(t, _LINES_MIN_PAT, 1)
    raw_max = F.regexp_extract(t, _LINES_MAX_PAT, 1)
    min_l = F.when(naive, F.lit(0)).when(
        raw_min != "", raw_min.cast("int")
    ).otherwise(F.lit(0))
    max_l = F.when(naive, F.lit(0)).when(
        raw_max != "", raw_max.cast("int")
    ).otherwise(F.lit(100))
    return F.struct(min_l.alias("min_lines"), max_l.alias("max_lines"))


# X12 — hard-exclusion categories (reference: criteria_parser.py:220-276)
EXCLUSION_PATTERNS: tuple[tuple[str, str], ...] = (
    ("CNS_Mets", r"(brain|cns|central nervous system)\s*(metastas|mets|tumor|disease)"),
    ("HIV", r"\b(hiv|human immunodeficiency virus|aids)\b"),
    ("Hepatitis", r"\b(hepatitis|hbv|hcv|hepatitis b|hepatitis c)\b"),
    ("Pregnancy", r"\b(pregnant|pregnancy|lactating|nursing|breastfeeding|childbearing potential)\b"),
    ("Prior_Malignancy", r"(prior|history of|other|second|concurrent)\s*(primary )?(malignan|cancer|tumor|neoplasm)"),
    ("Cardiac_Dysfunction", r"(cardiac|heart|myocardial)\s*(dysfunction|failure|insufficiency|infarction|disease)|\b(nyha class|ejection fraction|lvef)\b"),
    ("Renal_Dysfunction", r"(renal|kidney)\s*(failure|insufficiency|dysfunction|impairment)"),
    ("Hepatic_Dysfunction", r"(hepatic|liver)\s*(failure|insufficiency|dysfunction|cirrhosis|impairment)"),
    ("Pulmonary_Dysfunction", r"(pulmonary|respiratory|lung)\s*(failure|insufficiency|dysfunction)"),
    ("Autoimmune_Disease", r"\b(autoimmune|lupus|rheumatoid arthritis|crohn|colitis|inflammatory bowel)\b"),
    ("Active_Infection", r"(active|uncontrolled|ongoing)\s*(infection|sepsis|abscess)"),
    ("Bleeding_Disorder", r"(bleeding|coagulation|clotting)\s*(disorder|diathesis|abnormality)|\b(hemophilia|von willebrand)\b"),
    ("Seizure_Disorder", r"\b(seizure|epilepsy|convulsion)\b"),
)


def hard_exclusions(text: Column) -> Column:
    """array<string> of triggered exclusion categories, reference order."""
    t = F.lower(text)
    hits = F.array(
        *[
            F.when(t.rlike(pat), F.lit(name))
            for name, pat in EXCLUSION_PATTERNS
        ]
    )
    return F.filter(hits, lambda x: x.isNotNull())


def parse_criteria(text: Column) -> Column:
    """X5+X6+X8+X10+X11+X12 in one struct — the regex-only part of the
    reference's ``CriteriaParser.parse`` (dictionary extractors are
    DataFrame-level joins, see :func:`match_dictionary` / :func:`extract_labs`).
    """
    return F.struct(
        age_range(text).alias("age_range"),
        gender(text).alias("gender"),
        ecog_allowed(text).alias("ecog"),
        washouts(text).alias("temporal"),
        lines_of_therapy(text).alias("lines_of_therapy"),
        hard_exclusions(text).alias("exclusions"),
    )


# ---------------------------------------------------------------------------
# Dictionary-driven extractors (broadcast join, not per-row Python dicts)
# ---------------------------------------------------------------------------


def match_dictionary(
    df: DataFrame,
    text_col: str,
    syn_df: DataFrame,
    kind: str,
    out_col: str | None = None,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """X7 — entity match against a synonym table (reference:
    criteria_parser.py:91-118).

    ``syn_df`` has (key, kind, term, pos) — see synonyms.synonyms_df.
    Adds ``out_col`` (default ``<kind>s``): the DISTINCT keys of ``kind``
    whose any synonym word-bounded-matches the text, sorted for determinism.
    Biomarker keys are emitted with their suffix stripped (reference
    semantics).  Plan shape: broadcast nested-loop join on rlike (dict side
    is KBs), hit rows reduced to (id, key) BEFORE the aggregation shuffle —
    the document text crosses no exchange — then the per-id key arrays join
    back onto the input.  ``id_cols`` defaults to the first input column
    (which must uniquely key ``df``).
    """
    out_col = out_col or f"{kind}s"
    id_cols = id_cols or [df.columns[0]]
    syn = syn_df.where(F.col("kind") == kind).select(
        F.col("clean_key").alias("_k"),
        F.concat(F.lit(r"\b"), F.col("term_re"), F.lit(r"\b")).alias("_pat"),
    )
    t = F.lower(F.col(text_col))
    hits = (
        df.join(F.broadcast(syn), F.regexp_like(t, F.col("_pat")), "inner")
        .select(*id_cols, "_k")
        .groupBy(*id_cols)
        .agg(F.array_sort(F.collect_set("_k")).alias(out_col))
    )
    return df.join(hits, id_cols, "left").withColumn(
        out_col,
        F.coalesce(F.col(out_col), F.array().cast("array<string>")),
    )


_LAB_OP_PAT = r"(>=|<=|>|<|≥|≤|greater than|less than|equals|up to)\s*(\d+(?:\.\d+)?)\s*([a-z/%µ]+)?"


def extract_labs(
    df: DataFrame, text_col: str, syn_df: DataFrame, id_cols: list[str]
) -> DataFrame:
    """X9 — lab thresholds near a lab-name mention (reference:
    criteria_parser.py:139-163).

    Returns one row per (doc, lab) with (lab, operator, value, unit); the
    first matching synonym (dictionary order = pos) wins, like the
    reference's ``break``.  Operators are normalized: anything 'greater'/
    '>'/'≥' -> '>', 'less'/'<'/'≤'/'up to' -> '<', 'equals' -> '='.
    Broadcast join + window, no Python.
    """
    labs = syn_df.where(F.col("kind") == "lab").select(
        F.col("clean_key").alias("lab"),
        F.col("pos").alias("_pos"),
        F.concat(
            F.lit(r"\b"), F.col("term_re"), F.lit(r"\b.{0,30}?"),
            F.lit(_LAB_OP_PAT),
        ).alias("_pat"),
    )
    t = F.lower(F.col(text_col))
    hit = df.join(F.broadcast(labs), F.regexp_like(t, F.col("_pat")), "inner")
    # per-row pattern column: only the SQL form of regexp_extract takes a
    # non-literal pattern
    def _ex(idx: int):
        return F.expr(f"regexp_extract(lower(`{text_col}`), _pat, {idx})")

    raw_op = _ex(1)
    op = (
        F.when(
            raw_op.contains("greater") | raw_op.contains(">")
            | raw_op.contains("≥"),
            F.lit(">"),
        )
        .when(
            raw_op.contains("less") | raw_op.contains("<")
            | raw_op.contains("≤") | (raw_op == "up to"),
            F.lit("<"),
        )
        .when(raw_op.contains("equals"), F.lit("="))
        .otherwise(raw_op)
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(*id_cols, "lab").orderBy("_pos")
    return (
        hit.withColumn("operator", op)
        .withColumn("value", _ex(2).cast("double"))
        .withColumn("unit", F.trim(_ex(3)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*id_cols, "lab", "operator", "value", "unit")
    )


def normalize_conditions(
    df: DataFrame, cond_col: str, syn_df: DataFrame, id_cols: list[str]
) -> DataFrame:
    """X13 — free-text condition -> canonical key (reference:
    backend/nlp/condition_normalizer.py:22-57).

    Three tiers, first hit wins: exact synonym equality, word-bounded
    synonym inside the input, word-bounded input inside a synonym.  One
    broadcast join per tier (condition dictionary only), coalesced in tier
    order.  Adds ``normalized`` (nullable string).
    """
    syn = syn_df.where(F.col("kind") == "condition").select(
        F.col("clean_key").alias("_k"),
        F.lower(F.col("term")).alias("_term"),
        F.col("term_re").alias("_term_re"),
        F.col("pos").alias("_pos"),
    )
    c = F.lower(F.trim(F.col(cond_col)))
    from pyspark.sql.window import Window

    w = Window.partitionBy(*id_cols).orderBy("_tier", "_pos")
    tiers = []
    for tier, cond in (
        (0, c == F.col("_term")),
        (1, F.regexp_like(c, F.concat(F.lit(r"\b"), F.col("_term_re"), F.lit(r"\b")))),
        (2, F.regexp_like(F.col("_term"),
            F.concat(
                F.lit(r"\b"),
                F.regexp_replace(
                    c, r"([\\.\[\]\{\}\(\)\*\+\?\^\$\|])", r"\\$1"
                ),
                F.lit(r"\b"),
            )
        )),
    ):
        tiers.append(
            df.join(F.broadcast(syn), cond, "inner")
            .withColumn("_tier", F.lit(tier))
        )
    hits = tiers[0].unionByName(tiers[1]).unionByName(tiers[2])
    best = (
        hits.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*id_cols, F.col("_k").alias("normalized"))
    )
    return df.join(best, id_cols, "left")
