"""Synonym dictionary plumbing for the criteria extractors (X7/X9/X13).

The reference ships a 225-key curated dictionary
(backend/nlp/clinical_synonyms.json, built by backend/nlp/fetch_synonyms.py);
the engine treats the dictionary as USER DATA: any ``{key: [synonym, ...]}``
mapping loads through :func:`synonyms_df` into the broadcastable shape the
extractors join against.  :func:`demo_synonyms` is a small self-contained
dictionary (written for this repo's tests/gates — not copied from the
reference data) exercising every key class.

Key classification by suffix (see criteria.py module docstring for the one
deliberate divergence from the reference):
* ``_Level`` / ``_Count``                                  -> kind 'lab'
* ``_Gene`` / ``_Receptor`` / ``_Marker`` / ``_Status`` /
  ``_Mutation`` / ``_Score``                               -> kind 'biomarker'
* anything else                                            -> kind 'condition'
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_LAB_SUFFIXES = ("_Level", "_Count")
_BIO_SUFFIXES = (
    "_Gene", "_Receptor", "_Marker", "_Status", "_Mutation", "_Score"
)


def demo_synonyms() -> dict[str, list[str]]:
    """Compact dictionary covering conditions, biomarkers and labs."""
    return {
        "Lung_Cancer": [
            "lung cancer", "nsclc", "non-small cell lung cancer",
            "lung carcinoma",
        ],
        "Breast_Cancer": ["breast cancer", "breast carcinoma", "tnbc"],
        "Colorectal_Cancer": [
            "colorectal cancer", "colon cancer", "rectal cancer", "crc",
        ],
        "Melanoma": ["melanoma", "malignant melanoma"],
        "Leukemia": ["leukemia", "aml", "cll"],
        "Diabetes": ["diabetes", "diabetes mellitus", "t2dm"],
        "Hypertension": ["hypertension", "high blood pressure"],
        "EGFR_Gene": ["egfr", "egfr mutation", "epidermal growth factor receptor"],
        "ALK_Gene": ["alk", "alk rearrangement", "alk fusion"],
        "KRAS_Mutation": ["kras", "kras g12c"],
        "HER2_Receptor": ["her2", "her2 positive", "erbb2"],
        "PDL1_Marker": ["pd-l1", "pdl1", "pd l1 expression"],
        "Hemoglobin_Level": ["hemoglobin", "hgb", "hb"],
        "Creatinine_Level": ["creatinine", "serum creatinine"],
        "Bilirubin_Level": ["bilirubin", "total bilirubin"],
        "Platelet_Count": ["platelet count", "platelets", "plt"],
        "Neutrophil_Count": ["neutrophil count", "anc", "absolute neutrophil count"],
    }


def classify_key(key: str) -> tuple[str, str]:
    """(kind, clean_key) for a dictionary key."""
    for suf in _LAB_SUFFIXES:
        if key.endswith(suf):
            return "lab", key[: -len(suf)]
    for suf in _BIO_SUFFIXES:
        if key.endswith(suf):
            return "biomarker", key[: -len(suf)]
    return "condition", key


def synonyms_rows(
    mapping: dict[str, list[str]],
) -> list[tuple[str, str, str, str, str, int, str]]:
    """Flatten a mapping to (key, clean_key, kind, term, term_re, pos,
    term_orig).  ``term`` is lowercased (the matching surfaces compare
    lowercased text); ``term_orig`` keeps the dictionary's original case —
    the query-expansion rule (main.py:366-383) emits terms AS WRITTEN in
    the user dictionary, deduplicating only on the lowered form."""
    rows = []
    for key, terms in mapping.items():
        kind, clean = classify_key(key)
        for pos, term in enumerate(terms):
            rows.append(
                (key, clean, kind, term.lower(), re.escape(term.lower()),
                 pos, term)
            )
    return rows


def synonyms_df(
    spark: SparkSession, mapping: dict[str, list[str]] | None = None
) -> DataFrame:
    """Broadcastable synonym table for the criteria extractors."""
    rows = synonyms_rows(mapping or demo_synonyms())
    return spark.createDataFrame(
        rows, "key string, clean_key string, kind string, term string, "
        "term_re string, pos int, term_orig string",
    )
