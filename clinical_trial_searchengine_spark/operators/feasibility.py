"""Patient-profile × trial feasibility scoring (reference J6) and the
feasibility hard filter (reference F8), as one JVM projection.

The reference scores each hit in a per-row Python loop on the API server
(reference: backend/nlp/feasibility_scorer.py:43-305, applied per hit in
backend/api/main.py:575-624, filter at main.py:621-624).  Here ONE patient
profile becomes literals inside a single ``when``-chain Column expression
over the parsed-criteria columns, so scoring 10^12 candidate rows is a
stage-local projection with no shuffle and no Python — the profile is the
broadcast side of the reference's conceptual profile×trial join.

Replicated reference semantics, including its quirks:
* a normalized '=' lab operator can never pass (the pass check only handles
  > >= < <=, feasibility_scorer.py:204-209) — kept, documented;
* prior-lines is checked TWICE (a raw-text regex block scoring +-10 each for
  min and max, then the parsed lines-range rule scoring +10,
  feasibility_scorer.py:233-303) — kept;
* condition matching is case-insensitive substring containment either way
  between patient condition strings and trial condition KEYS.

UMLS CUI matching (X19) is a declared non-goal (heavyweight model); the
reference's string-containment fallback path is what runs here — identical
behavior to the reference with its UMLS linker disabled.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.criteria import (
    extract_labs,
    match_dictionary,
    parse_criteria,
)

# raw-text prior-lines block (reference: feasibility_scorer.py:238-243)
_RAW_LINES_MIN = r"(?i)(?:received|at least|>=?)\s*(\d+)\s*(?:prior|previous)\s*lines?"
_RAW_LINES_MAX = r"(?i)(?:no more than|up to|<=?)\s*(\d+)\s*(?:prior|previous)\s*lines?"


def parse_trials(
    df: DataFrame,
    text_col: str,
    syn_df: DataFrame,
    id_cols: list[str],
) -> DataFrame:
    """Materialize every parsed-criteria column the scorer consumes.

    Regex parsers are a projection; dictionary extractors are broadcast
    joins; labs are re-aggregated to one array column per row.
    """
    out = df.withColumn("parsed", parse_criteria(F.col(text_col)))
    out = match_dictionary(out, text_col, syn_df, "condition", "conditions")
    out = match_dictionary(out, text_col, syn_df, "biomarker", "biomarkers")
    labs = extract_labs(df, text_col, syn_df, id_cols)
    labs_arr = labs.groupBy(*id_cols).agg(
        F.array_sort(
            F.collect_list(F.struct("lab", "operator", "value", "unit"))
        ).alias("labs")
    )
    out = out.join(labs_arr, id_cols, "left").withColumn(
        "labs",
        F.coalesce(
            F.col("labs"),
            F.array().cast(
                "array<struct<lab:string,operator:string,"
                "value:double,unit:string>>"
            ),
        ),
    )
    return out


def _any_true(cols: list[Column]) -> Column:
    return reduce(lambda a, b: a | b, cols, F.lit(False))


def feasibility_score(
    parsed: DataFrame, profile: dict, text_col: str = "criteria_text"
) -> DataFrame:
    """Add feasibility_score / is_feasible / feasibility_reasons columns.

    ``parsed`` must carry the columns from :func:`parse_trials`; ``profile``
    mirrors the reference's patient dict: age, gender, ecog, conditions,
    biomarkers, history, labs (name -> value), prior_lines,
    days_since_last_treatment — all optional.
    """
    p_conditions = [c.lower() for c in profile.get("conditions", [])]
    p_issues = sorted(
        set(profile.get("conditions", [])) | set(profile.get("history", []))
    )
    p_bios = sorted(set(profile.get("biomarkers", [])))
    p_labs: dict[str, float] = {
        k: v for k, v in profile.get("labs", {}).items() if v is not None
    }
    p_age = profile.get("age")
    p_gender = profile.get("gender")
    p_ecog = profile.get("ecog")
    p_lines = profile.get("prior_lines")
    p_washout = profile.get("days_since_last_treatment")

    parsed_c = F.col("parsed")
    reasons: list[Column] = []
    score = F.lit(0)
    feasible = F.lit(True)

    # 1. hard exclusions (feasibility_scorer.py:100-108)
    hard = (
        F.arrays_overlap(
            parsed_c["exclusions"],
            F.array(*[F.lit(x) for x in p_issues]),
        )
        if p_issues
        else F.lit(False)
    )

    # 2. condition matching (:112-167)
    if not p_conditions:
        score = score + 5
        reasons.append(F.lit("no patient conditions provided"))
    else:
        cond_match = F.exists(
            F.col("conditions"),
            lambda t: _any_true(
                [
                    F.lower(t).contains(pc) | F.lit(pc).contains(F.lower(t))
                    for pc in p_conditions
                ]
            ),
        )
        score = score + F.when(cond_match, 40).otherwise(0)
        feasible = feasible & cond_match
        reasons.append(
            F.when(cond_match, F.lit("condition match"))
            .otherwise(F.lit("condition mismatch"))
        )

    # 3. biomarkers (:169-177)
    if p_bios:
        bio_match = F.arrays_overlap(
            F.col("biomarkers"), F.array(*[F.lit(b) for b in p_bios])
        )
        score = score + F.when(bio_match, 25).otherwise(0)
        reasons.append(F.when(bio_match, F.lit("biomarker match")))

    # 4. ECOG (:179-187)
    if p_ecog is not None:
        has_rule = F.size(parsed_c["ecog"]) > 0
        ok = F.array_contains(parsed_c["ecog"], p_ecog)
        score = score + F.when(has_rule & ok, 15).otherwise(0)
        feasible = feasible & (~has_rule | ok)
        reasons.append(
            F.when(has_rule & ok, F.lit(f"ecog {p_ecog} allowed"))
            .when(has_rule & ~ok, F.lit(f"ecog {p_ecog} excluded"))
        )

    # 5. labs (:189-222); normalized '=' never passes (reference quirk)
    if p_labs:
        def _pval(lab: Column) -> Column:
            expr = F.lit(None).cast("double")
            for name, val in p_labs.items():
                expr = F.when(lab == name, F.lit(float(val))).otherwise(expr)
            return expr

        def _passes(x: Column) -> Column:
            v = _pval(x["lab"])
            return (
                F.when((x["operator"] == ">") & (v > x["value"]), True)
                .when((x["operator"] == ">=") & (v >= x["value"]), True)
                .when((x["operator"] == "<") & (v < x["value"]), True)
                .when((x["operator"] == "<=") & (v <= x["value"]), True)
                .otherwise(False)
            )

        considered = F.filter(
            F.col("labs"), lambda x: _pval(x["lab"]).isNotNull()
        )
        n_pass = F.size(F.filter(considered, _passes))
        n_fail = F.size(considered) - n_pass
        score = score + F.least(n_pass * 5, F.lit(15))
        feasible = feasible & (n_fail == 0)
        reasons.append(
            F.when(n_fail > 0, F.lit("critical lab(s) failed"))
            .when(n_pass > 0, F.lit("labs passed"))
        )

    # 6. age (:224-232)
    if p_age is not None:
        age_ok = (parsed_c["age_range"]["min_age"] <= p_age) & (
            p_age <= parsed_c["age_range"]["max_age"]
        )
        score = score + F.when(age_ok, 5).otherwise(0)
        feasible = feasible & age_ok
        reasons.append(
            F.when(age_ok, F.lit(f"age {p_age} matched"))
            .otherwise(F.lit(f"age {p_age} outside range"))
        )

    # 7a. raw-text prior-lines block (:233-262)
    if p_lines is not None:
        t = F.col(text_col)
        raw_min = F.regexp_extract(t, _RAW_LINES_MIN, 1)
        raw_max = F.regexp_extract(t, _RAW_LINES_MAX, 1)
        min_ok = raw_min.cast("int") <= p_lines
        max_ok = F.lit(p_lines) <= raw_max.cast("int")
        score = (
            score
            + F.when((raw_min != "") & min_ok, 10).otherwise(0)
            + F.when((raw_max != "") & max_ok, 10).otherwise(0)
        )
        feasible = (
            feasible
            & ((raw_min == "") | min_ok)
            & ((raw_max == "") | max_ok)
        )

    # 7b. gender (:264-277)
    if p_gender:
        pg = p_gender.capitalize()
        tg = parsed_c["gender"]
        g_ok = (tg == "All") | (tg == pg)
        score = score + F.when(g_ok, 5).otherwise(0)
        feasible = feasible & g_ok
        reasons.append(
            F.when(g_ok, F.lit("gender matched"))
            .otherwise(F.lit("gender mismatch"))
        )

    # 8. chemo washout (:279-290)
    if p_washout is not None:
        tw = parsed_c["temporal"]["chemo_washout"]
        w_ok = F.lit(p_washout) >= tw
        score = score + F.when(tw.isNotNull() & w_ok, 5).otherwise(0)
        feasible = feasible & (tw.isNull() | w_ok)
        reasons.append(
            F.when(tw.isNotNull() & w_ok, F.lit("washout cleared"))
            .when(tw.isNotNull() & ~w_ok, F.lit("washout fail"))
        )

    # 9. parsed lines-of-therapy rule (:292-303)
    if p_lines is not None:
        lr = parsed_c["lines_of_therapy"]
        l_ok = (lr["min_lines"] <= p_lines) & (
            F.lit(p_lines) <= lr["max_lines"]
        )
        score = score + F.when(l_ok, 10).otherwise(0)
        feasible = feasible & l_ok
        reasons.append(
            F.when(l_ok, F.lit("lines of therapy allowed"))
            .otherwise(F.lit("lines of therapy fail"))
        )

    # compile (:305-331): hard exclusion short-circuits everything
    final_score = (
        F.when(hard, F.lit(0))
        .when(feasible, F.least(score, F.lit(100)))
        .otherwise(F.lit(0))
    )
    final_feasible = F.when(hard, F.lit(False)).otherwise(feasible)
    reason_arr = F.filter(
        F.array(
            F.when(hard, F.lit("hard exclusion")), *reasons
        ),
        lambda x: x.isNotNull(),
    )
    return (
        parsed.withColumn("feasibility_score", final_score)
        .withColumn("is_feasible", final_feasible)
        .withColumn("feasibility_reasons", reason_arr)
    )


def feasibility_filter(df: DataFrame) -> DataFrame:
    """F8 — drop rows explicitly marked infeasible, keep unassessed (NULL)
    and feasible ones (reference: backend/api/main.py:621-624)."""
    return df.where(
        F.col("is_feasible").isNull() | F.col("is_feasible")
    )


def rank_with_feasibility(
    scored: DataFrame,
    retrieval_col: str = "score",
    feasibility_weight: float = 0.4,
    by: list[str] | None = None,
) -> DataFrame:
    """Blend min-max-normalized retrieval with feasibility/100 and apply the
    hard filter (reference: backend/api/main.py:575-624).

    blended = (1-w) * minmax(retrieval) + w * feasibility/100, sorted desc;
    rows with is_feasible == false are dropped after scoring.
    ``by``: optional partition keys (e.g. ["query_id"]) — normalization is
    then per group, the batch-evaluation shape."""
    part = Window.partitionBy(*by) if by else Window.partitionBy()
    lo = F.min(retrieval_col).over(part)
    hi = F.max(retrieval_col).over(part)
    norm = F.when(hi > lo, (F.col(retrieval_col) - lo) / (hi - lo)).otherwise(
        F.lit(0.5)
    )
    feas = F.coalesce(F.col("feasibility_score") / 100.0, F.lit(0.0))
    blended = (1.0 - feasibility_weight) * norm + feasibility_weight * feas
    return feasibility_filter(
        scored.withColumn("blended_score", blended)
    ).orderBy(F.desc("blended_score"))
