"""Driver-contract gates for the feasibility path (X5-X13, F8, J6).

Each gate synthesizes a deterministic eligibility-criteria text column from
``documents.doc_id`` with ONE SQL expression string (:data:`CRIT_SQL`) that
parses identically in Spark SQL and DuckDB, runs the library parsers on the
Spark side, and re-derives the expected result in pure DuckDB SQL built from
the SAME regex constants (single-sourced from functions/criteria.py) on the
oracle side.  No external data; everything derives from doc_id.

The oracle SQL is generated, not hand-maintained: pattern drift between the
engine and the oracle is structurally impossible for the regex parsers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import criteria as C
from ..functions.synonyms import demo_synonyms, synonyms_df, synonyms_rows

# ---------------------------------------------------------------------------
# deterministic criteria-text synthesis (dialect-shared SQL)
# ---------------------------------------------------------------------------

CRIT_SQL = (
    "case when doc_id % 4 = 0 then 'age ' || cast(18 + doc_id % 13 as varchar(8)) || ' years or older. ' else '' end || "
    "case when doc_id % 5 = 0 then 'up to ' || cast(55 + doc_id % 70 as varchar(8)) || ' years. ' else '' end || "
    "case when doc_id % 3 = 0 then 'female patients. ' when doc_id % 3 = 1 then 'male patients. ' else 'women and men. ' end || "
    "case when doc_id % 6 = 0 then 'ecog performance status 0 to ' || cast(doc_id % 4 as varchar(8)) || '. ' "
    "when doc_id % 6 = 1 then 'ecog <= ' || cast(doc_id % 3 as varchar(8)) || '. ' "
    "when doc_id % 6 = 2 then 'zubrod 1 or 2. ' else '' end || "
    "case when doc_id % 7 = 0 then 'treatment naive. ' "
    "when doc_id % 7 = 1 then 'received at least ' || cast(1 + doc_id % 3 as varchar(8)) || ' prior lines. ' "
    "when doc_id % 7 = 2 then 'no more than ' || cast(2 + doc_id % 3 as varchar(8)) || ' prior regimens. ' else '' end || "
    "case when doc_id % 8 = 0 then cast(7 + doc_id % 60 as varchar(8)) || ' days since last chemotherapy. ' "
    "when doc_id % 8 = 1 then cast(2 + doc_id % 8 as varchar(8)) || ' weeks since surgery. ' else '' end || "
    "case when doc_id % 9 = 0 then 'patients with brain metastases excluded. ' "
    "when doc_id % 9 = 1 then 'no hiv. active infection excluded. ' "
    "when doc_id % 9 = 2 then 'pregnant or nursing subjects excluded. ' else '' end || "
    "case when doc_id % 10 = 0 then 'non-small cell lung cancer. egfr mutation required. hemoglobin >= 9.0 g/dl. ' "
    "when doc_id % 10 = 1 then 'breast cancer with her2 positive. platelet count > 100 k/ul. ' "
    "when doc_id % 10 = 2 then 'colon cancer. serum creatinine less than 1.5 mg/dl. ' else '' end"
)

COND_SQL = (
    "case doc_id % 6 when 0 then 'NSCLC' when 1 then 'metastatic colon cancer' "
    "when 2 then 'Melanoma' when 3 then 'lung' when 4 then 'cll' "
    "else 'completely unknown ailment' end"
)

PROFILE = {
    "age": 60,
    "gender": "female",
    "ecog": 1,
    "conditions": ["Lung_Cancer"],
    "biomarkers": ["EGFR"],
    "history": ["HIV"],
    "labs": {"Hemoglobin": 10.0, "Creatinine": 1.2, "Platelet": 80.0},
    "prior_lines": 2,
    "days_since_last_treatment": 21,
}


def _crit_df(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", F.expr(CRIT_SQL).alias("criteria_text"))


# ---------------------------------------------------------------------------
# oracle SQL builders (DuckDB dialect, single-sourced regex constants)
# ---------------------------------------------------------------------------


def _sq(pat: str) -> str:
    """Embed a regex in a single-quoted DuckDB string literal."""
    return "'" + pat.replace("'", "''") + "'"


def _oracle_parsed_cte() -> str:
    """CTE chain: documents -> crit text -> all regex-parsed fields."""
    age_min, age_max = _sq(C._AGE_MIN_PAT), _sq(C._AGE_MAX_PAT)
    fem, male = _sq(C._FEMALE_PAT), _sq(C._MALE_PAT)
    e_rng, e_lte, e_sim = (
        _sq(C._ECOG_RANGE_PAT), _sq(C._ECOG_LTE_PAT), _sq(C._ECOG_SIMPLE_PAT)
    )
    chemo, surg = _sq(C._CHEMO_WASH_PAT), _sq(C._SURG_WASH_PAT)
    naive, l_min, l_max = (
        _sq(C._NAIVE_PAT), _sq(C._LINES_MIN_PAT), _sq(C._LINES_MAX_PAT)
    )
    excl_items = ", ".join(
        f"case when regexp_matches(t, {_sq(pat)}) then '{name}' end"
        for name, pat in C.EXCLUSION_PATTERNS
    )
    return f"""
with c as (
  select doc_id, {CRIT_SQL} as crit from documents
), t as (
  select doc_id, lower(crit) as t from c
), raw as (
  select doc_id, t,
    regexp_extract(t, {age_min}, 1) as r_min,
    regexp_extract(t, {age_max}, 1) as r_max,
    regexp_matches(t, {fem}) as has_f,
    regexp_matches(t, {male}) as has_m,
    regexp_extract(t, {e_rng}, 1) as er1,
    regexp_extract(t, {e_rng}, 2) as er2,
    regexp_extract(t, {e_lte}, 1) as el,
    regexp_extract(t, {e_sim}, 1) as es1,
    regexp_extract(t, {e_sim}, 2) as es2,
    regexp_extract(t, {chemo}, 1) as cw_v,
    regexp_extract(t, {chemo}, 2) as cw_u,
    regexp_extract(t, {surg}, 1) as sw_v,
    regexp_extract(t, {surg}, 2) as sw_u,
    regexp_matches(t, {naive}) as naive,
    regexp_extract(t, {l_min}, 1) as lmin,
    regexp_extract(t, {l_max}, 1) as lmax
  from t
), clamp as (
  select *,
    case when r_min = '' then 0 else cast(r_min as int) end as a_min0,
    case when r_max = '' then 100 else cast(r_max as int) end as a_max0
  from raw
), clamp2 as (
  select *,
    case when a_min0 > 120 then 0 else a_min0 end as a_min1,
    case when a_max0 > 120 then 100 else a_max0 end as a_max1
  from clamp
), parsed as (
  select doc_id, t,
    a_min1 as min_age,
    case when a_min1 > a_max1 then 100 else a_max1 end as max_age,
    case when has_f and not has_m then 'Female'
         when has_m and not has_f then 'Male' else 'All' end as gender,
    case when len(mrg) > 0 then mrg
         when es1 <> '' then list_sort(list_distinct(
             [cast(es1 as int), cast(es2 as int)]))
         else []::int[] end as ecog,
    case when cw_v = '' then null
         when cw_u = 'week' then cast(cw_v as int) * 7
         when cw_u = 'month' then cast(cw_v as int) * 30
         else cast(cw_v as int) end as chemo_washout,
    case when sw_v = '' then null
         when sw_u = 'week' then cast(sw_v as int) * 7
         when sw_u = 'month' then cast(sw_v as int) * 30
         else cast(sw_v as int) end as surgery_washout,
    case when naive then 0
         when lmin <> '' then cast(lmin as int) else 0 end as min_lines,
    case when naive then 0
         when lmax <> '' then cast(lmax as int) else 100 end as max_lines,
    list_filter([{excl_items}], x -> x is not null) as exclusions
  from (
    select *,
      list_sort(list_distinct(flatten([
        case when er1 <> '' and cast(er1 as int) <= cast(er2 as int)
                  and cast(er2 as int) <= 5
             then cast(range(cast(er1 as int), cast(er2 as int) + 1) as int[])
             else []::int[] end,
        case when el <> '' and cast(el as int) <= 5
             then cast(range(0, cast(el as int) + 1) as int[])
             else []::int[] end
      ]))) as mrg
    from clamp2
  )
)"""


def _oracle_syn_cte() -> str:
    rows = synonyms_rows(demo_synonyms())
    vals = ", ".join(
        f"('{k}', '{ck}', '{kd}', '{t}', {_sq(tre)}, {pos})"
        for (k, ck, kd, t, tre, pos, _orig) in rows
    )
    return (
        "syn(key, clean_key, kind, term, term_re, pos) as (select * from "
        f"(values {vals}))"
    )


def criteria_parse_oracle() -> str:
    return (
        _oracle_parsed_cte()
        + """
select doc_id, min_age, max_age, gender,
       coalesce(array_to_string(ecog, ','), '') as ecog_str,
       coalesce(chemo_washout, -1) as chemo_washout,
       coalesce(surgery_washout, -1) as surgery_washout,
       min_lines, max_lines,
       coalesce(array_to_string(exclusions, ','), '') as exclusions_str
from parsed order by doc_id"""
    )


def criteria_entities_oracle() -> str:
    return f"""
with c as (
  select doc_id, lower({CRIT_SQL}) as t from documents
), {_oracle_syn_cte()},
hits as (
  select c.doc_id, s.kind, s.clean_key
  from c join syn s
    on regexp_matches(c.t, '\\b' || s.term_re || '\\b')
)
select c.doc_id,
  coalesce((select array_to_string(list_sort(list_distinct(list(h.clean_key))), ',')
            from hits h where h.doc_id = c.doc_id and h.kind = 'condition'), '')
    as conditions_str,
  coalesce((select array_to_string(list_sort(list_distinct(list(h.clean_key))), ',')
            from hits h where h.doc_id = c.doc_id and h.kind = 'biomarker'), '')
    as biomarkers_str
from c order by c.doc_id"""


def criteria_labs_oracle() -> str:
    op_pat = C._LAB_OP_PAT
    return f"""
with c as (
  select doc_id, lower({CRIT_SQL}) as t from documents
), {_oracle_syn_cte()},
hit as (
  select c.doc_id, s.clean_key as lab, s.pos,
    '\\b' || s.term_re || '\\b.{{0,30}}?' || {_sq(op_pat)} as pat, c.t
  from c join syn s on s.kind = 'lab'
   and regexp_matches(c.t, '\\b' || s.term_re || '\\b.{{0,30}}?' || {_sq(op_pat)})
), ex as (
  select doc_id, lab, pos,
    regexp_extract(t, pat, 1) as raw_op,
    cast(regexp_extract(t, pat, 2) as double) as value,
    trim(regexp_extract(t, pat, 3)) as unit,
    row_number() over (partition by doc_id, lab order by pos) as rn
  from hit
)
select doc_id, lab,
  case when raw_op like '%greater%' or raw_op like '%>%' or raw_op like '%≥%' then '>'
       when raw_op like '%less%' or raw_op like '%<%' or raw_op like '%≤%'
            or raw_op = 'up to' then '<'
       when raw_op like '%equals%' then '=' else raw_op end as operator,
  value, unit
from ex where rn = 1 order by doc_id, lab"""


def condition_normalize_oracle() -> str:
    return f"""
with x as (
  select doc_id, {COND_SQL} as cond from documents
), {_oracle_syn_cte()},
cs as (select * from syn where kind = 'condition'),
hits as (
  select x.doc_id, s.clean_key, s.pos, 0 as tier
    from x join cs s on lower(trim(x.cond)) = s.term
  union all
  select x.doc_id, s.clean_key, s.pos, 1
    from x join cs s
    on regexp_matches(lower(trim(x.cond)), '\\b' || s.term_re || '\\b')
  union all
  select x.doc_id, s.clean_key, s.pos, 2
    from x join cs s
    on regexp_matches(s.term, '\\b' || lower(trim(x.cond)) || '\\b')
), best as (
  select doc_id, clean_key,
    row_number() over (partition by doc_id order by tier, pos) as rn
  from hits
)
select x.doc_id, x.cond,
  coalesce((select b.clean_key from best b
            where b.doc_id = x.doc_id and b.rn = 1), '') as normalized
from x order by x.doc_id"""


def feasibility_oracle() -> str:
    """Full J6 scoring + F8 filter in DuckDB, mirroring
    operators/feasibility.py step-for-step with PROFILE inlined."""
    return (
        feasibility_calc_cte()
        + """
select doc_id,
  case when hard then 0 when ok then least(score, 100) else 0 end
    as feasibility_score,
  (case when hard then false else ok end) as is_feasible
from calc
where (case when hard then false else ok end)
order by doc_id"""
    )


def feasibility_calc_cte() -> str:
    """The scoring CTE chain up to ``calc`` (doc_id, hard, score, ok) —
    shared between the feasibility_rank oracle and the end-to-end
    rank-eval oracle (which needs UNFILTERED per-doc scores)."""
    p = PROFILE
    p_conds = [c.lower() for c in p["conditions"]]
    cond_terms = " or ".join(
        f"(contains(lower(h.clean_key), '{pc}') or contains('{pc}', lower(h.clean_key)))"
        for pc in p_conds
    )
    bio_list = ", ".join(f"'{b}'" for b in p["biomarkers"])
    issues = sorted(set(p["conditions"]) | set(p["history"]))
    issues_list = ", ".join(f"'{x}'" for x in issues)
    lab_val = " ".join(
        f"when '{k}' then {float(v)}" for k, v in p["labs"].items()
    )
    raw_min = _sq(feas_raw_lines()[0])
    raw_max = _sq(feas_raw_lines()[1])
    return (
        _oracle_parsed_cte()
        + f""",
{_oracle_syn_cte()},
ent as (
  select p.doc_id,
    coalesce((select bool_or({cond_terms}) from (
        select s.clean_key from syn s where s.kind = 'condition'
          and regexp_matches(p.t, '\\b' || s.term_re || '\\b')) h), false)
      as cond_match,
    coalesce((select bool_or(h.clean_key in ({bio_list})) from (
        select s.clean_key from syn s where s.kind = 'biomarker'
          and regexp_matches(p.t, '\\b' || s.term_re || '\\b')) h), false)
      as bio_match
  from parsed p
), labstats as (
  select e.doc_id,
    count(*) filter (where e.passed) as n_pass,
    count(*) filter (where not e.passed) as n_fail
  from (
    select l.doc_id,
      case l.operator
        when '>' then pv > l.value
        when '>=' then pv >= l.value
        when '<' then pv < l.value
        when '<=' then pv <= l.value
        else false end as passed
    from ({_labs_inner()}) l,
      lateral (select case l.lab {lab_val} else null end as pv)
    where pv is not null
  ) e group by e.doc_id
), scored as (
  select p.doc_id,
    list_has_any(p.exclusions, [{issues_list}]) as hard,
    ent.cond_match, ent.bio_match,
    coalesce(ls.n_pass, 0) as n_pass, coalesce(ls.n_fail, 0) as n_fail,
    regexp_extract(p.t, {raw_min}, 1) as rlmin,
    regexp_extract(p.t, {raw_max}, 1) as rlmax,
    p.min_age, p.max_age, p.gender, p.ecog, p.chemo_washout,
    p.min_lines, p.max_lines
  from parsed p
  join ent on ent.doc_id = p.doc_id
  left join labstats ls on ls.doc_id = p.doc_id
), calc as (
  select doc_id, hard,
    (case when cond_match then 40 else 0 end)
    + (case when bio_match then 25 else 0 end)
    + (case when len(ecog) > 0 and list_contains(ecog, {p["ecog"]})
            then 15 else 0 end)
    + least(n_pass * 5, 15)
    + (case when min_age <= {p["age"]} and {p["age"]} <= max_age
            then 5 else 0 end)
    + (case when rlmin <> '' and try_cast(rlmin as int) <= {p["prior_lines"]}
            then 10 else 0 end)
    + (case when rlmax <> '' and {p["prior_lines"]} <= try_cast(rlmax as int)
            then 10 else 0 end)
    + (case when gender = 'All' or gender = '{p["gender"].capitalize()}'
            then 5 else 0 end)
    + (case when chemo_washout is not null
             and {p["days_since_last_treatment"]} >= chemo_washout
            then 5 else 0 end)
    + (case when min_lines <= {p["prior_lines"]}
             and {p["prior_lines"]} <= max_lines then 10 else 0 end)
      as score,
    cond_match
    and (len(ecog) = 0 or list_contains(ecog, {p["ecog"]}))
    and n_fail = 0
    and (min_age <= {p["age"]} and {p["age"]} <= max_age)
    and (rlmin = '' or try_cast(rlmin as int) <= {p["prior_lines"]})
    and (rlmax = '' or {p["prior_lines"]} <= try_cast(rlmax as int))
    and (gender = 'All' or gender = '{p["gender"].capitalize()}')
    and (chemo_washout is null
         or {p["days_since_last_treatment"]} >= chemo_washout)
    and (min_lines <= {p["prior_lines"]}
         and {p["prior_lines"]} <= max_lines)
      as ok
  from scored
)"""
    )


def _labs_inner() -> str:
    """Shared labs-per-doc subquery (same logic as criteria_labs_oracle)."""
    op_pat = C._LAB_OP_PAT
    return f"""
    select doc_id, lab,
      case when raw_op like '%greater%' or raw_op like '%>%' or raw_op like '%≥%' then '>'
           when raw_op like '%less%' or raw_op like '%<%' or raw_op like '%≤%'
                or raw_op = 'up to' then '<'
           when raw_op like '%equals%' then '=' else raw_op end as operator,
      value
    from (
      select h.doc_id, h.lab, h.pos,
        regexp_extract(h.t, h.pat, 1) as raw_op,
        cast(regexp_extract(h.t, h.pat, 2) as double) as value,
        row_number() over (partition by h.doc_id, h.lab order by h.pos) as rn
      from (
        select p2.doc_id, s.clean_key as lab, s.pos,
          '\\b' || s.term_re || '\\b.{{0,30}}?' || {_sq(op_pat)} as pat, p2.t
        from parsed p2 join syn s on s.kind = 'lab'
         and regexp_matches(p2.t,
             '\\b' || s.term_re || '\\b.{{0,30}}?' || {_sq(op_pat)})
      ) h
    ) where rn = 1"""


def feas_raw_lines() -> tuple[str, str]:
    from . import feasibility as FE

    return FE._RAW_LINES_MIN, FE._RAW_LINES_MAX


# ---------------------------------------------------------------------------
# Spark-side gate callables
# ---------------------------------------------------------------------------


def q_criteria_parse(spark, sf_dir):
    """X5/X6/X8/X10/X11/X12 regex parsers, flattened to scalars."""
    c = _crit_df(spark, sf_dir)
    t = F.col("criteria_text")
    return c.select(
        "doc_id",
        C.age_range(t)["min_age"].alias("min_age"),
        C.age_range(t)["max_age"].alias("max_age"),
        C.gender(t).alias("gender"),
        F.array_join(C.ecog_allowed(t), ",").alias("ecog_str"),
        F.coalesce(C.washouts(t)["chemo_washout"], F.lit(-1)).alias(
            "chemo_washout"
        ),
        F.coalesce(C.washouts(t)["surgery_washout"], F.lit(-1)).alias(
            "surgery_washout"
        ),
        C.lines_of_therapy(t)["min_lines"].alias("min_lines"),
        C.lines_of_therapy(t)["max_lines"].alias("max_lines"),
        F.array_join(C.hard_exclusions(t), ",").alias("exclusions_str"),
    ).orderBy("doc_id")


def q_criteria_entities(spark, sf_dir):
    """X7 dictionary entity match (conditions + biomarkers)."""
    c = _crit_df(spark, sf_dir)
    syn = synonyms_df(spark)
    out = C.match_dictionary(c, "criteria_text", syn, "condition")
    out = C.match_dictionary(out, "criteria_text", syn, "biomarker")
    return out.select(
        "doc_id",
        F.array_join("conditions", ",").alias("conditions_str"),
        F.array_join("biomarkers", ",").alias("biomarkers_str"),
    ).orderBy("doc_id")


def q_criteria_labs(spark, sf_dir):
    """X9 lab-threshold extraction near lab-name mentions."""
    c = _crit_df(spark, sf_dir)
    syn = synonyms_df(spark)
    return C.extract_labs(c, "criteria_text", syn, ["doc_id"]).orderBy(
        "doc_id", "lab"
    )


def q_condition_normalize(spark, sf_dir):
    """X13 three-tier condition normalizer."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    x = docs.select("doc_id", F.expr(COND_SQL).alias("cond"))
    syn = synonyms_df(spark)
    return C.normalize_conditions(x, "cond", syn, ["doc_id"]).select(
        "doc_id", "cond", F.coalesce("normalized", F.lit("")).alias("normalized")
    ).orderBy("doc_id")


def q_feasibility_rank(spark, sf_dir):
    """J6 profile×trial scoring + F8 hard filter."""
    from .feasibility import (
        feasibility_filter,
        feasibility_score,
        parse_trials,
    )

    c = _crit_df(spark, sf_dir)
    syn = synonyms_df(spark)
    parsed = parse_trials(c, "criteria_text", syn, ["doc_id"])
    scored = feasibility_score(parsed, PROFILE, text_col="criteria_text")
    return feasibility_filter(scored).select(
        "doc_id", "feasibility_score", "is_feasible"
    ).orderBy("doc_id")


GATES = {
    "criteria_parse": q_criteria_parse,
    "criteria_entities": q_criteria_entities,
    "criteria_labs": q_criteria_labs,
    "condition_normalize": q_condition_normalize,
    "feasibility_rank": q_feasibility_rank,
}


def gate_oracles() -> dict[str, str]:
    return {
        "criteria_parse": criteria_parse_oracle(),
        "criteria_entities": criteria_entities_oracle(),
        "criteria_labs": criteria_labs_oracle(),
        "condition_normalize": condition_normalize_oracle(),
        "feasibility_rank": feasibility_oracle(),
    }
