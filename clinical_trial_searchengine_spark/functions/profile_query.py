"""Profile -> query-text composition (X14) + optional condition-synonym
expansion (U3 query side).

The reference converts a structured patient profile into a compact natural-
language query before retrieval (reference: backend/api/main.py:322-363,
``_profile_to_query_text``) and ships — but deliberately DISABLES — query-
time condition-synonym expansion ("query drift",
reference: backend/api/main.py:366-383,
``_expand_condition_synonyms_for_query``).  Both are driver-side query prep
(a few strings) for single-query serving; the expansion draws from the same
user-supplied synonym dictionary the criteria extractors broadcast
(functions/synonyms.py).

:func:`expand_query_synonyms_df` is the distributed twin for BATCHES of
profiles (e.g. expanding a whole query log or an evaluation set in one
job): same rule, expressed as one broadcast join + one shuffle —
posexplode the per-row key lists, broadcast-join the synonym table, then a
single groupBy whose higher-order ``aggregate`` fold does the ordered
case-insensitive dedup and the ``max_terms`` cap entirely JVM-side (no
Python UDF, no window cascade, no second exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_trial_searchengine_spark.functions.synonyms import (
    demo_synonyms,
)


def profile_query_text(profile: dict) -> str:
    """Compose the retrieval query from a structured profile — same field
    order and phrasing shape as the reference (main.py:322-363)."""
    parts: list[str] = []
    conds = profile.get("conditions") or []
    if conds:
        parts.append("Patient with " + ", ".join(conds))
    if profile.get("age") is not None:
        parts.append(f"{profile['age']} year old")
    if profile.get("gender"):
        parts.append(str(profile["gender"]))
    if profile.get("ecog") is not None:
        parts.append(f"ECOG {profile['ecog']}")
    bios = profile.get("biomarkers") or []
    if bios:
        parts.append("Biomarkers: " + ", ".join(bios))
    hist = profile.get("history") or []
    if hist:
        parts.append("History of " + ", ".join(hist))
    if profile.get("prior_lines") is not None:
        parts.append(
            f"{profile['prior_lines']} prior lines of systemic therapy"
        )
    if profile.get("days_since_last_treatment") is not None:
        parts.append(
            f"{profile['days_since_last_treatment']} days since last "
            "treatment"
        )
    return ". ".join(parts)


def expand_condition_synonyms(
    normalized_conditions: list[str],
    synonyms: dict[str, list[str]] | None = None,
    max_terms: int = 8,
    max_per_condition: int = 3,
) -> list[str]:
    """First ``max_per_condition`` synonyms per normalized condition key,
    deduplicated case-insensitively, capped at ``max_terms`` — the
    reference's expansion rule verbatim (main.py:366-383).  OFF by default
    at every call site, matching the reference's shipped configuration
    (it measured query drift and disabled it)."""
    mapping = synonyms or demo_synonyms()
    expanded: list[str] = []
    seen: set[str] = set()
    for key in normalized_conditions:
        for t in mapping.get(key, [])[:max_per_condition]:
            tl = t.lower().strip()
            if tl and tl not in seen and len(expanded) < max_terms:
                expanded.append(t)
                seen.add(tl)
        if len(expanded) >= max_terms:
            break
    return expanded


def profile_query_text_expanded(
    profile: dict,
    synonyms: dict[str, list[str]] | None = None,
    expand: bool = False,
    max_terms: int = 8,
) -> str:
    """X14 + optional U3 expansion in one call: the composed query text,
    with the expansion terms appended when ``expand=True``."""
    text = profile_query_text(profile)
    if not expand:
        return text
    extra = expand_condition_synonyms(
        profile.get("normalized_conditions")
        or profile.get("conditions")
        or [],
        synonyms,
        max_terms=max_terms,
    )
    return text + (". " + ", ".join(extra) if extra else "")


def expand_query_synonyms_df(
    df: DataFrame,
    keys_col: str,
    syn_df: DataFrame,
    id_cols: list[str],
    max_terms: int = 8,
    max_per_condition: int = 3,
) -> DataFrame:
    """U3 query-side synonym expansion over a DataFrame of key lists —
    the distributed twin of :func:`expand_condition_synonyms`, applying
    the reference rule (main.py:366-383) row-wise: for each key in list
    order take the first ``max_per_condition`` dictionary synonyms, drop
    blank terms, deduplicate case-insensitively keeping the FIRST
    occurrence, and cap the surviving sequence at ``max_terms``.

    Returns (*id_cols, rank, term) with rank 1..max_terms in expansion
    order; rows whose keys have no dictionary entry produce no output
    (the reference returns ``[]``).

    Scale shape: exactly one shuffle.  ``syn_df`` (a dictionary, ~1e2-1e5
    rows) is broadcast; the posexploded keys join map-side; the single
    groupBy(*id_cols) collects a sorted (cond_pos, pos) struct array per
    row, and a higher-order ``aggregate`` fold performs the ordered dedup
    + cap JVM-side.  Dedup-then-cap commutes with the reference's
    accumulate-with-early-exit loop because removing duplicates never
    reorders the survivors.
    """
    keys = df.select(
        *id_cols, F.posexplode(F.col(keys_col)).alias("_cond_pos", "_key")
    )
    # emit term_orig (the dictionary's original case — the reference rule
    # appends terms AS WRITTEN, deduplicating only on the lowered form);
    # fall back to the lowered term column for pre-term_orig tables
    term_col = (
        "term_orig" if "term_orig" in syn_df.columns else "term"
    )
    syn = (
        syn_df.where(F.col("pos") < max_per_condition)
        .select(
            F.col("key").alias("_key"),
            F.col(term_col).alias("term"),
            # regexp trim, not F.trim: Spark trim strips only ' ' while the
            # driver rule (expand_query's t.lower().strip()) strips all
            # whitespace — \s covers the ASCII classes (tab/newline/CR/FF);
            # non-ASCII unicode whitespace in a dictionary term remains a
            # documented divergence (out of scope for the shipped dicts)
            F.lower(
                F.regexp_replace(F.col(term_col), r"^\s+|\s+$", "")
            ).alias("_tl"),
            F.col("pos").alias("_pos"),
        )
        .where(F.length("_tl") > 0)
    )
    acc0 = F.expr("cast(array() as array<struct<tl:string,term:string>>)")
    folded = (
        keys.join(F.broadcast(syn), "_key", "inner")
        .groupBy(*id_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_cond_pos", "_pos", "_tl", "term"))
            ).alias("_seq")
        )
        .select(
            *id_cols,
            F.aggregate(
                "_seq",
                acc0,
                lambda acc, s: F.when(
                    (F.size(acc) < F.lit(max_terms))
                    & ~F.exists(acc, lambda e: e["tl"] == s["_tl"]),
                    F.concat(
                        acc,
                        F.array(
                            F.struct(
                                s["_tl"].alias("tl"), s["term"].alias("term")
                            )
                        ),
                    ),
                ).otherwise(acc),
            ).alias("_kept"),
        )
    )
    return folded.select(
        *id_cols,
        F.posexplode(F.transform("_kept", lambda e: e["term"])).alias(
            "_r0", "term"
        ),
    ).select(
        *id_cols, (F.col("_r0") + F.lit(1)).cast("int").alias("rank"), "term"
    )
