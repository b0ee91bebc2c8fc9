"""Deterministic synthetic source-code corpus (FIXTURES.md §1-2).

Shape is exactly the north-rule input_hint:
``(repo, path, commit, lang, content)`` + ``content_sha256`` invariant column.
Mirrors the reference's `trials` corpus (reference:
backend/db/schema.sql:1-40) transposed to code.

Everything is a pure function of (seed, i): generation is distributed with
``mapInPandas`` over ``spark.range`` and independent of partitioning, so the
same (seed, n) always yields byte-identical rows — required for the resume
test (byte-identical segments after kill/rerun).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VOCAB_SIZE = 5000
HOT_TERMS = ["def", "return", "import", "license", "the"]
# English-ish words so the Porter chain has real work to do.
ENGLISH_WORDS = [
    "running", "runs", "relational", "relations", "relating", "conditional",
    "conditions", "effective", "effectiveness", "adjustment", "adjustable",
    "hopeful", "hopefulness", "formalize", "formality", "operator",
    "operation", "operational", "activate", "activation", "generalization",
    "generalizing", "dependent", "dependency", "iterator", "iterating",
    "allocation", "allocating", "serialize", "serializer", "optimization",
    "optimizer", "connection", "connected", "connecting", "validation",
    "validator", "tokenizer", "tokenizing", "normalization", "normalized",
    "partitioned", "partitioning", "clustered", "clustering", "indexing",
    "indexed", "compression", "compressed", "streaming",
]
LANGS = ["python", "java", "js", "go", "md"]
_LANG_P = [0.4, 0.2, 0.15, 0.15, 0.1]
_EXT = {"python": "py", "java": "java", "js": "js", "go": "go", "md": "md"}


def _vocab() -> list[str]:
    v = list(HOT_TERMS) + list(ENGLISH_WORDS)
    v += [f"v{k:04d}" for k in range(VOCAB_SIZE - len(v))]
    return v


_VOCAB = _vocab()
# Zipf(s=1.1) over vocab ranks — hot terms get the head, exercising salting.
_ZIPF_P = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), 1.1)
_ZIPF_P /= _ZIPF_P.sum()
_ZIPF_CDF = np.cumsum(_ZIPF_P)


def _gen_row(seed: int, i: int) -> dict:
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(1_000_003) + np.uint64(i))
    repo = f"org{i % 7}/repo{i % 97}"
    lang = LANGS[int(rng.choice(len(LANGS), p=_LANG_P))]
    path = f"src/m{i % 13}/file{i}.{_EXT[lang]}"
    commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]
    n_tok = int(np.clip(rng.lognormal(np.log(200.0), 0.6), 10, 2000))
    idx = np.searchsorted(_ZIPF_CDF, rng.random(n_tok))
    toks = [_VOCAB[j] for j in idx]
    toks.append(f"uid{i}doc")  # per-doc unique token -> discriminative top-k
    content = " ".join(toks)
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
        "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
    }


def generate_corpus_pandas(n: int, seed: int = 42) -> pd.DataFrame:
    rows = [_gen_row(seed, i) for i in range(n)]
    return pd.DataFrame(rows)


CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, content_sha256 string"
)


def generate_corpus_df(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic generation over spark.range."""
    partitions = partitions or max(1, min(64, n // 2000))
    rng_df = spark.range(0, n, 1, partitions)

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [_gen_row(seed, int(i)) for i in pdf["id"].to_numpy()]
            )

    return rng_df.mapInPandas(gen, CORPUS_SCHEMA)


def reference_queries() -> list[dict]:
    """The 20-query reference set (FIXTURES.md §2) — analogue of the
    reference's 75-topic TREC CSV (reference: backend/evaluation/queries.csv).
    """
    qs = [
        ("q001", "def", 10),
        ("q002", "license import", 10),
        ("q003", "def license", 10),                      # hot-term pair
        ("q004", "v4321 v4900", 10),                      # rare terms
        ("q005", "uid123doc", 10),                        # unique-hit
        ("q006", "zzznohit qqqmissing", 10),              # no-hit
        ("q007", "the of and is to", 10),                 # stopword-only (porter mode -> empty)
        ("q008", "relational relations relating", 10),    # same Porter root
        ("q009", "v0100", 10),                            # tie-break exercise
        ("q010", "def return import license the v0042", 10),
        ("q011", "optimization optimizer", 10),
        ("q012", "streaming compression indexed", 10),
        ("q013", "v1500 def", 10),
        ("q014", "partitioned clustering", 10),
        ("q015", "tokenizer normalization validation", 10),
        ("q016", "v2500 v2501 v2502", 10),
        ("q017", "the the the def", 10),                  # repeated query terms (qtf weighting)
        ("q018", "connection connected connecting", 10),
        ("q019", "return v0300", 10),
        ("q020", "def the license return import", 100),   # k=100
    ]
    return [{"query_id": q, "text": t, "k": k} for q, t, k in qs]
