"""Worked-example tests for the feasibility path (X5-X13, F8, J6).

Expected values are hand-derived from the reference's parser/scorer rules
(backend/nlp/criteria_parser.py:60-276, feasibility_scorer.py:43-305),
including its quirks: leftmost washout match crossing sentence boundaries,
'>=' normalizing to '>', and the hard-exclusion short-circuit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_trial_searchengine_spark.functions import criteria as C
from clinical_trial_searchengine_spark.functions.synonyms import synonyms_df
from clinical_trial_searchengine_spark.operators.feasibility import (
    feasibility_filter,
    feasibility_score,
    parse_trials,
)

TEXTS = [
    (1, "Inclusion: age 18 years or older, up to 75 years. Women and men. "
        "ECOG performance status 0-2."),
    (2, "Eligible: at least 21 years. Female patients only. ECOG <= 1. "
        "Treatment naive patients."),
    (3, "males with ecog who status 3 or 4. at least 2 prior lines of "
        "therapy. no more than 4 prior regimens"),
    (4, "age 200 years (typo), up to 130 years. 28 days since last "
        "chemotherapy. 6 weeks since surgery."),
    (5, "patients with brain metastases excluded. active infection. "
        "hemoglobin >= 9.0 g/dl and platelet count > 100 k/ul"),
    (6, "no patterns here at all"),
    (7, "age 70 years and up to 40 years inverted. pregnant or nursing "
        "women excluded. creatinine less than 1.5 mg/dl"),
]


@pytest.fixture(scope="module")
def parsed_rows(spark):
    df = spark.createDataFrame(TEXTS, "id int, t string")
    t = F.col("t")
    out = df.select(
        "id",
        C.age_range(t).alias("age"),
        C.gender(t).alias("g"),
        C.ecog_allowed(t).alias("ecog"),
        C.washouts(t).alias("wash"),
        C.lines_of_therapy(t).alias("lines"),
        C.hard_exclusions(t).alias("excl"),
    ).orderBy("id")
    return {r["id"]: r for r in out.collect()}


def test_age_range(parsed_rows):
    assert (parsed_rows[1]["age"]["min_age"], parsed_rows[1]["age"]["max_age"]) == (18, 75)
    assert (parsed_rows[2]["age"]["min_age"], parsed_rows[2]["age"]["max_age"]) == (21, 100)
    # >120 values are parse noise -> defaults (reference clamp)
    assert (parsed_rows[4]["age"]["min_age"], parsed_rows[4]["age"]["max_age"]) == (0, 100)
    # inverted range keeps min, resets max
    assert (parsed_rows[7]["age"]["min_age"], parsed_rows[7]["age"]["max_age"]) == (70, 100)


def test_gender(parsed_rows):
    assert parsed_rows[1]["g"] == "All"      # both mentioned
    assert parsed_rows[2]["g"] == "Female"
    assert parsed_rows[3]["g"] == "Male"
    assert parsed_rows[6]["g"] == "All"      # neither mentioned
    assert parsed_rows[7]["g"] == "Female"   # 'women' in exclusion text


def test_ecog(parsed_rows):
    assert parsed_rows[1]["ecog"] == [0, 1, 2]   # range pattern
    assert parsed_rows[2]["ecog"] == [0, 1]      # <= pattern
    assert parsed_rows[3]["ecog"] == [3, 4]      # 'x or y' fallback
    assert parsed_rows[6]["ecog"] == []


def test_washouts(parsed_rows):
    w = parsed_rows[4]["wash"]
    assert w["chemo_washout"] == 28
    # leftmost-match quirk shared with Python re.search: '28 days ... since
    # ... surgery' wins over '6 weeks since surgery'
    assert w["surgery_washout"] == 28
    assert parsed_rows[1]["wash"]["chemo_washout"] is None


def test_lines_of_therapy(parsed_rows):
    assert tuple(parsed_rows[2]["lines"]) == (0, 0)    # treatment naive
    assert tuple(parsed_rows[3]["lines"]) == (2, 4)
    assert tuple(parsed_rows[6]["lines"]) == (0, 100)  # defaults


def test_exclusions(parsed_rows):
    assert parsed_rows[5]["excl"] == ["CNS_Mets", "Active_Infection"]
    assert parsed_rows[7]["excl"] == ["Pregnancy"]
    assert parsed_rows[6]["excl"] == []


def test_lab_extraction(spark):
    df = spark.createDataFrame(TEXTS, "id int, t string")
    syn = synonyms_df(spark)
    labs = {
        (r["id"], r["lab"]): r
        for r in C.extract_labs(df, "t", syn, ["id"]).collect()
    }
    hgb = labs[(5, "Hemoglobin")]
    # '>=' normalizes to '>' (reference: criteria_parser.py:150-153)
    assert (hgb["operator"], hgb["value"], hgb["unit"]) == (">", 9.0, "g/dl")
    plt = labs[(5, "Platelet")]
    assert (plt["operator"], plt["value"], plt["unit"]) == (">", 100.0, "k/ul")
    cre = labs[(7, "Creatinine")]
    assert (cre["operator"], cre["value"], cre["unit"]) == ("<", 1.5, "mg/dl")
    assert (1, "Hemoglobin") not in labs


def test_condition_normalizer_tiers(spark):
    conds = spark.createDataFrame(
        [(1, "NSCLC"), (2, "metastatic colon cancer"), (3, "lung"),
         (4, "totally unknown")],
        "id int, c string",
    )
    syn = synonyms_df(spark)
    got = {
        r["id"]: r["normalized"]
        for r in C.normalize_conditions(conds, "c", syn, ["id"]).collect()
    }
    assert got[1] == "Lung_Cancer"          # tier 0: exact synonym
    assert got[2] == "Colorectal_Cancer"    # tier 1: synonym inside input
    assert got[3] == "Lung_Cancer"          # tier 2: input inside synonym
    assert got[4] is None


TRIALS = [
    (1, "patients with non-small cell lung cancer and egfr mutation. "
        "age 18 years or older, up to 75 years. ecog performance status "
        "0-2. hemoglobin >= 9 g/dl. received at least 1 prior line of "
        "therapy. women and men."),
    (2, "lung cancer patients. no hiv positive subjects."),
    (3, "breast cancer, female patients, age 18 years or older yrs."),
    (4, "lung carcinoma. serum creatinine less than 1.0 mg/dl."),
    (5, "open label study of an investigational agent."),
]

PROFILE = {
    "age": 64, "gender": "female", "ecog": 1,
    "conditions": ["Lung_Cancer"], "biomarkers": ["EGFR"],
    "history": ["HIV"], "labs": {"Hemoglobin": 10.1, "Creatinine": 1.2},
    "prior_lines": 2, "days_since_last_treatment": 30,
}


def test_feasibility_worked_example(spark):
    """Hand-computed vs feasibility_scorer.py rules:

    t1: cond +40, bio +25, ecog +15, lab +5, age +5, raw-lines-min +10,
        gender +5, parsed-lines +10 = 115 -> capped 100, feasible.
    t2: hard exclusion (patient history HIV) -> 0 / infeasible.
    t3: condition mismatch -> infeasible -> 0.
    t4: creatinine 1.2 NOT < 1.0 -> lab failure -> infeasible -> 0.
    t5: no trial conditions parsed -> condition mismatch -> 0.
    """
    df = spark.createDataFrame(TRIALS, "trial_id int, criteria_text string")
    syn = synonyms_df(spark)
    parsed = parse_trials(df, "criteria_text", syn, ["trial_id"])
    scored = feasibility_score(parsed, PROFILE)
    got = {
        r["trial_id"]: (r["feasibility_score"], r["is_feasible"])
        for r in scored.collect()
    }
    assert got[1] == (100, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    assert got[4] == (0, False)
    assert got[5] == (0, False)
    kept = feasibility_filter(scored).select("trial_id").collect()
    assert [r["trial_id"] for r in kept] == [1]


def test_rank_with_feasibility_blend(spark):
    """Blend = 0.6*minmax(retrieval) + 0.4*feasibility/100, infeasible rows
    dropped after scoring (reference: main.py:575-624)."""
    from clinical_trial_searchengine_spark.operators.feasibility import (
        rank_with_feasibility,
    )

    rows = [
        # (id, retrieval score, feas score, is_feasible)
        (1, 10.0, 50, True),
        (2, 20.0, 100, True),
        (3, 30.0, 0, False),    # dropped
        (4, 15.0, None, None),  # unassessed: kept, feas leg 0
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, score double, feasibility_score int, "
        "is_feasible boolean",
    )
    got = rank_with_feasibility(df, feasibility_weight=0.4).collect()
    assert [r["doc_id"] for r in got] == [2, 1, 4]
    by_id = {r["doc_id"]: r["blended_score"] for r in got}
    # minmax over ALL rows (norm before filter): min=10, max=30
    assert abs(by_id[2] - (0.6 * 0.5 + 0.4 * 1.0)) < 1e-9
    assert abs(by_id[1] - (0.6 * 0.0 + 0.4 * 0.5)) < 1e-9
    assert abs(by_id[4] - (0.6 * 0.25 + 0.4 * 0.0)) < 1e-9


def test_gate_matches_duckdb_oracle(spark, tmp_path):
    """End-to-end parity of the generated oracle SQL for the most complex
    gate (feasibility_rank) on a synthetic documents table."""
    import duckdb

    from clinical_trial_searchengine_spark.operators import (
        feasibility_gates as G,
    )

    docs = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    p = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(p)
    sdf = (
        G.q_feasibility_rank(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{p}/*.parquet')"
    )
    odf = (
        con.execute(G.gate_oracles()["feasibility_rank"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(sdf) == len(odf) > 0
    assert list(sdf["doc_id"]) == list(odf["doc_id"])
    assert list(sdf["feasibility_score"]) == list(odf["feasibility_score"])


def test_profile_query_text_and_synonym_expansion():
    """X14 compose + U3 query-side synonym expansion (reference:
    backend/api/main.py:322-383) — worked example, expansion OFF by
    default like the reference's shipped configuration."""
    from clinical_trial_searchengine_spark.functions.profile_query import (
        expand_condition_synonyms,
        profile_query_text,
        profile_query_text_expanded,
    )

    profile = {
        "age": 60,
        "gender": "female",
        "ecog": 1,
        "conditions": ["Lung_Cancer"],
        "biomarkers": ["EGFR"],
        "history": ["HIV"],
        "prior_lines": 2,
        "days_since_last_treatment": 21,
    }
    text = profile_query_text(profile)
    assert text == (
        "Patient with Lung_Cancer. 60 year old. female. ECOG 1. "
        "Biomarkers: EGFR. History of HIV. "
        "2 prior lines of systemic therapy. 21 days since last treatment"
    )
    # default: no expansion (reference disables it — query drift)
    assert profile_query_text_expanded(profile) == text

    # expansion rule: first 3 synonyms per key, dedup, cap 8
    got = expand_condition_synonyms(["Lung_Cancer", "Leukemia"])
    assert got == [
        "lung cancer", "nsclc", "non-small cell lung cancer",
        "leukemia", "aml", "cll",
    ]
    capped = expand_condition_synonyms(
        ["Lung_Cancer", "Leukemia", "Breast_Cancer"], max_terms=4
    )
    assert len(capped) == 4
    expanded = profile_query_text_expanded(profile, expand=True)
    assert expanded.endswith("lung cancer, nsclc, non-small cell lung cancer")

    # empty profile fields are skipped without separators
    assert profile_query_text({"age": 70}) == "70 year old"


def test_expand_query_synonyms_df_matches_driver_rule(spark):
    """The distributed batch expansion (one broadcast join + one shuffle)
    is row-for-row identical to the driver-side reference rule
    (main.py:366-383) across duplicate keys, unknown keys, blank lists,
    non-condition keys, and the max_terms cap."""
    from clinical_trial_searchengine_spark.functions.profile_query import (
        expand_condition_synonyms,
        expand_query_synonyms_df,
    )
    from clinical_trial_searchengine_spark.functions.synonyms import (
        demo_synonyms,
        synonyms_df,
    )

    keys = sorted(demo_synonyms())
    cases: list[tuple[int, list[str]]] = []
    for i in range(40):
        lst = [keys[i % len(keys)], keys[(i * 7 + 2) % len(keys)]]
        if i % 3 == 0:
            lst.append(keys[i % len(keys)])  # duplicate key
        if i % 4 == 0:
            lst.append("No_Such_Key")
        if i % 5 == 0:
            lst.append(keys[(i * 11 + 5) % len(keys)])
        cases.append((i, lst))
    cases.append((100, []))  # empty key list -> no rows
    cases.append((101, ["No_Such_Key"]))  # all-unknown -> no rows

    for max_terms, max_per in ((7, 3), (4, 2)):
        sdf = expand_query_synonyms_df(
            spark.createDataFrame(
                cases, "pid int, keys array<string>"
            ),
            "keys",
            synonyms_df(spark),
            ["pid"],
            max_terms=max_terms,
            max_per_condition=max_per,
        )
        got: dict[int, list[str]] = {}
        for r in sdf.orderBy("pid", "rank").collect():
            got.setdefault(r.pid, []).append(r.term)
        for pid, lst in cases:
            want = expand_condition_synonyms(
                lst, max_terms=max_terms, max_per_condition=max_per
            )
            assert got.get(pid, []) == want, (pid, lst, max_terms, max_per)


def test_expand_query_synonyms_df_mixed_case_dictionary(spark):
    """User dictionaries are arbitrary-case: the reference rule emits
    terms AS WRITTEN (dedup key is the lowered form) — the distributed
    twin must too, including cross-key case-insensitive dedup."""
    from clinical_trial_searchengine_spark.functions.profile_query import (
        expand_condition_synonyms,
        expand_query_synonyms_df,
    )
    from clinical_trial_searchengine_spark.functions.synonyms import (
        synonyms_df,
    )

    mapping = {
        "Lung_Cancer": ["NSCLC", "Lung Cancer", "lung carcinoma"],
        "Breast_Cancer": ["nsclc", "TNBC"],  # dup of NSCLC, lowered
        "Parkinsons": ["Parkinson's disease", "PD"],
    }
    lst = ["Lung_Cancer", "Breast_Cancer", "Parkinsons"]
    want = expand_condition_synonyms(lst, mapping, max_terms=6)
    assert want[0] == "NSCLC" and "nsclc" not in want  # original case kept
    got = [
        r.term
        for r in expand_query_synonyms_df(
            spark.createDataFrame([(1, lst)], "pid int, keys array<string>"),
            "keys",
            synonyms_df(spark, mapping),
            ["pid"],
            max_terms=6,
        ).orderBy("rank").collect()
    ]
    assert got == want
