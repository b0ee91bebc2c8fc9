"""Analyzer-chain unit tests: tokenizer goldens + published Porter vectors
(FIXTURES.md §6)."""

from __future__ import annotations

import pandas as pd

from clinical_trial_searchengine_spark.functions.analysis import (
    STOPWORDS,
    analyze_batch,
    porter_stem,
    term_counts,
    tokenize_text,
)

# Published Porter test vectors (from the original algorithm paper / the
# canonical voc.txt/output.txt distribution).
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file", "happy": "happi",
    "sky": "sky", "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_vectors():
    bad = {
        w: (e, porter_stem(w))
        for w, e in PORTER_VECTORS.items()
        if porter_stem(w) != e
    }
    assert not bad, bad


def test_standard_tokenizer_golden():
    # Matches the reference's english_text analyzer of type `standard`
    # (tokenize + lowercase ONLY; reference: backend/search/mapping.json:9-13)
    assert tokenize_text("The Patients were RUNNING trials!", "standard") == [
        "the", "patients", "were", "running", "trials",
    ]
    assert tokenize_text("a1-b2_c3  x;y", "standard") == ["a1", "b2", "c3", "x", "y"]
    assert tokenize_text("", "standard") == []
    assert tokenize_text(None, "standard") == []


def test_porter_chain_golden():
    assert tokenize_text("The Patients were RUNNING trials; efficiently!", "porter") == [
        "patient", "were", "run", "trial", "effici",
    ]
    # stopword-only input -> empty
    assert tokenize_text("the of and is to", "porter") == []
    assert "the" in STOPWORDS


def test_term_counts_sorted():
    tc = term_counts(["b", "a", "b", "c", "a", "b"])
    assert tc == [("a", 2), ("b", 3), ("c", 1)]


def test_analyze_batch_matches_single():
    texts = pd.Series(["The cat sat", "running RUNS ran", None, ""])
    for mode in ("standard", "porter"):
        pairs, lens = analyze_batch(texts, mode)
        for i, t in enumerate(texts):
            toks = tokenize_text(t, mode)
            assert lens[i] == len(toks)
            assert pairs[i] == term_counts(toks)


def test_analyze_udf_roundtrip(spark):
    from clinical_trial_searchengine_spark.functions.analysis import (
        make_analyze_udf,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("running runs",)], "content string"
    )
    out = df.select(make_analyze_udf("standard")(F.col("content")).alias("a")).collect()
    row = out[0]["a"]
    assert row["doc_len"] == 6
    terms = {t["term"]: t["tf"] for t in row["terms"]}
    assert terms == {"the": 2, "cat": 1, "sat": 1, "on": 1, "mat": 1}
    # terms arrive term-sorted (fixed summation order downstream)
    assert [t["term"] for t in row["terms"]] == sorted(terms)
