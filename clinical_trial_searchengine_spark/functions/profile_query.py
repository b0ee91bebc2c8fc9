"""Profile -> query-text composition (X14) + optional condition-synonym
expansion (U3 query side).

The reference converts a structured patient profile into a compact natural-
language query before retrieval (reference: backend/api/main.py:322-363,
``_profile_to_query_text``) and ships — but deliberately DISABLES — query-
time condition-synonym expansion ("query drift",
reference: backend/api/main.py:366-383,
``_expand_condition_synonyms_for_query``).  Both are driver-side query prep
(a few strings), never distributed work; the expansion draws from the same
user-supplied synonym dictionary the criteria extractors broadcast
(functions/synonyms.py).
"""

from __future__ import annotations

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
