"""Index build: corpus -> compressed doc-sharded segments.

Single logical DAG (SURVEY.md §3.4), all vectorized:

  read corpus -> sha256 invariant check -> deterministic doc_id assignment
  -> tokenizer mapInArrow kernel emitting FLAT (doc_id, term, tf) rows
  -> doc_meta + global stats + GLOBAL per-term df/cf
  -> salted shuffle: groupBy(shard, term_bucket, salt) -> bucket encode
     kernel (delta + varint + block-max metadata, functions/codec.py)
  -> shard shuffle + (shard, term, salt) sort -> inline salted-run merge
     in the SAME task -> write postings (partitioned by shard), norms,
     manifest, metrics.  ONE streaming pass from encode to parquet: no
     persist of the encoded relation, no second read, no hot-term shuffle.

Scale + performance notes (the part that matters at 10^12 docs):
* doc_id = global rank under (repo, path, commit): ONE range shuffle +
  in-partition sort + monotonically_increasing_id, then a tiny collected
  per-partition offset table.  Rank is independent of partition boundaries,
  so resume/rerun reassigns identical ids; no global window, no second
  exchange.
* The tokenizer emits flat columns (one row per (doc, distinct term)), never
  nested array<struct> — Arrow-friendly, and ~50x fewer rows than exploding
  raw tokens (tf is counted inside the kernel, A8).
* The encode kernel processes a whole (shard, term_bucket, salt) group and
  encodes each term with NumPy inside — thousands of terms per group
  amortize the per-group Arrow/pandas overhead that a per-term grouping
  would pay 10^8 times at scale.  term_buckets caps group memory.
* Hot terms ('def', 'the', ...; reference-domain analogues 'patient',
  'trial') are salted into contiguous doc_id sub-ranges before the encode
  shuffle; only salted runs go through the merge kernel, everything else
  bypasses it.  Salted == unsalted output byte-identically (property-tested).
* Per-term df/cf are EXACT GLOBAL sums of the encode kernels' partial counts,
  stored in the term_stats dictionary (never per-shard — per-shard stats
  would silently change BM25, SURVEY.md §2.8-B5; the reference's single
  shard makes stats exact, ours must too).  Postings rows don't repeat them:
  query-time idf reads term_stats pruned to the query terms.
* Resume: stage-grained manifest + per-shard-group postings writes, each
  group directory overwritten atomically (idempotent).  Reference analogue:
  page_token checkpoint (backend/db/scrape_clinical_trials.py:483-543).
* persist_input: local corpora (and benchmarks) persist the ASSIGNED join
  (corpus + doc_id) because it is consumed by 2 content passes (tokenize,
  doc_meta/sha); the raw corpus itself is never persisted — the assign key
  scan stays column-pruned and content is cached exactly once.  On a real
  cluster reading Iceberg, leave False and let the scans re-read.
"""

from __future__ import annotations

import contextlib
import itertools
import math
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from clinical_trial_searchengine_spark.functions.analysis import (
    analyze_batch,
    analyze_flat,
)
from clinical_trial_searchengine_spark.functions.codec import (
    encode_postings,
    encode_postings_group,
)
from clinical_trial_searchengine_spark.plans import segments as seg

DEFAULT_SHARD_SIZE = 100_000  # docs per shard; ~10-50M on a real cluster
DEFAULT_NORM_CHUNK = 65_536   # doc_lens per norms row (256 KiB int32 cells)

_MID_MASK = (1 << 33) - 1  # monotonically_increasing_id: pid << 33 | row


# ---------------------------------------------------------------------------
# doc_id assignment
# ---------------------------------------------------------------------------


# Above this many docs the key->doc_id mapping stops being broadcastable
# (~80 B/key -> ~320 MB at the cap) and assignment falls back to the full
# range shuffle; at that corpus size the build's encode shuffle dominates
# and a second content shuffle is the lesser cost vs a multi-GB broadcast.
_BROADCAST_MAP_CAP = 4_000_000

_KEYS = ("repo", "path", "commit")


def _ranked_keys(df: DataFrame, num_partitions: int):
    """Range-shuffle + in-partition sort + per-partition offsets -> global
    rank, persisted so the offset collection and every downstream consumer
    see the SAME materialized partitioning (range-partitioner sampling is
    not re-run).  Returns (persisted ranged df with _pid/_local, offsets,
    total rows)."""
    ranged = (
        df.repartitionByRange(num_partitions, *_KEYS)
        .sortWithinPartitions(*_KEYS)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", (F.col("_mid") / (_MID_MASK + 1)).cast("int"))
        .withColumn("_local", F.col("_mid").bitwiseAND(F.lit(_MID_MASK)))
        .drop("_mid")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    return ranged, offsets, acc


def _with_offsets(ranged: DataFrame, offsets: dict) -> DataFrame:
    off_df = F.broadcast(
        ranged.sparkSession.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
        )
    )
    return (
        ranged.join(off_df, "_pid")
        .withColumn("doc_id", F.col("_off") + F.col("_local"))
        .drop("_pid", "_local", "_off")
    )


class _CacheHandle:
    """Unpersist handle covering every relation a caller must release."""

    def __init__(self, dfs):
        self._dfs = dfs

    def unpersist(self):
        for d in self._dfs:
            d.unpersist()


def assign_doc_ids(
    corpus: DataFrame,
    num_partitions: int | None = None,
    persist_output: bool = False,
) -> DataFrame:
    """Dense doc_id = global rank under (repo, path, commit).

    The rank is computed over the KEY COLUMNS ONLY (one range shuffle +
    in-partition sort of ~100-byte rows + a tiny collected offset table —
    no global Window, SURVEY.md §7 step 3), then broadcast-hash-joined back
    to the corpus: the content bytes never move for doc_id assignment, and
    the poorly-scaling serial fraction of the old full-row range shuffle
    (sort + persist of every content byte before a single token is cut)
    disappears from the critical path.  Above ``_BROADCAST_MAP_CAP`` docs
    the mapping stops being broadcastable and assignment falls back to the
    full-row range shuffle (v1 path) — at that scale the encode shuffle
    dominates the build and Catalyst would pick a sort-merge join anyway.

    doc_id is the same deterministic rank on both paths (resume/rerun
    reassigns identical ids; property: tests/test_build_invariants.py).

    ``persist_output``: materialize the joined (corpus + doc_id) relation
    once (MEMORY_AND_DISK) so the multiple downstream content passes
    (tokenize, doc_meta/sha) read the cache instead of re-paying the source
    scan + broadcast probe per action — the small/medium-scale fast path
    (build_index passes its persist_input flag through).  At 100 TB leave
    it False: re-scanning Iceberg twice beats persisting the corpus.
    """
    spark = corpus.sparkSession
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged_keys, offsets, total = _ranked_keys(
        corpus.select(*_KEYS), num_partitions
    )
    if total > _BROADCAST_MAP_CAP:
        ranged_keys.unpersist()
        ranged, offsets, _ = _ranked_keys(corpus, num_partitions)
        out = _with_offsets(ranged, offsets)
        out._ctse_persisted = ranged
        return out
    # (repo, path, commit) is the document identity everywhere (manifest,
    # upsert, tombstones); a duplicated key would m×n-explode the mapping
    # join and hand multiple rows one doc_id — corrupt silently.  The
    # check is one agg over the persisted ~100-byte key rows (≤ cap).
    if ranged_keys.select(*_KEYS).distinct().count() != total:
        ranged_keys.unpersist()
        raise ValueError(
            "duplicate (repo, path, commit) keys in corpus — the key is "
            "the document identity; dedupe upstream (ingest/upsert do)"
        )
    mapping = _with_offsets(ranged_keys, offsets).select(*_KEYS, "doc_id")
    # null-safe equi-join: a NULL key column must not silently drop the
    # row from the index (inner equi-join semantics) — it ranked and got
    # a doc_id like any other row.
    cond = None
    for c in _KEYS:
        e = corpus[c].eqNullSafe(mapping[c])
        cond = e if cond is None else cond & e
    out = corpus.join(F.broadcast(mapping), cond).drop(
        *[mapping[c] for c in _KEYS]
    )
    if persist_output:
        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        out._ctse_persisted = _CacheHandle([out, ranged_keys])
    else:
        out._ctse_persisted = ranged_keys
    return out


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _make_doc_len_col(mode: str):
    """doc_len = analyzed token count.  standard mode is a pure JVM
    expression; porter needs the Python kernel (stopword filter changes the
    count).  Both match analyze_batch exactly."""
    if mode == "standard":
        # token count WITHOUT materializing tokens: count maximal alnum
        # runs directly.  regexp_count never builds an output string
        # (the previous collapse-to-marker + translate form emitted a
        # full rewritten copy of the content per row — measured 2.2x
        # slower on the 500k-doc pass; the even older regexp_extract_all
        # form materialized a java.lang.String per token, ~1.6 ms/doc).
        # Values are identical: both count maximal case-insensitive
        # [a-z0-9]+ runs (verified 0 mismatches over the bench corpus).
        return F.regexp_count(
            F.col("content"), F.lit(r"(?i)[a-z0-9]+")
        ).cast("int")

    @F.pandas_udf("int")
    def _dl(texts: pd.Series) -> pd.Series:
        _, lens = analyze_batch(texts, mode)
        return pd.Series(lens, dtype="int32")

    return _dl(F.col("content"))


def make_tokenize_pairs_kernel(mode: str, emit_doc_len: bool = False):
    """mapInPandas kernel: (doc_id, content) batches -> flat
    (doc_id, term, tf) rows, tf counted in-kernel, terms sorted per doc.

    With ``emit_doc_len`` each doc additionally yields ONE sentinel row
    ``(doc_id, term=NULL, tf=doc_len)`` — doc lengths then ride out of the
    single tokenize pass for free instead of needing a groupBy(doc_id)
    shuffle over every (doc, term) pair (A7/A8, SURVEY.md §2.4)."""

    def kernel(batches):
        for pdf in batches:
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            row_idx, terms, tfs, lens = analyze_flat(pdf["content"], mode)
            out = pd.DataFrame(
                {
                    "doc_id": doc_ids[row_idx],
                    "term": terms,
                    "tf": tfs.astype(np.int32),
                }
            )
            if emit_doc_len:
                sentinels = pd.DataFrame(
                    {
                        "doc_id": doc_ids,
                        "term": pd.array([None] * len(doc_ids), dtype=object),
                        "tf": lens.astype(np.int32),
                    }
                )
                out = pd.concat([out, sentinels], ignore_index=True)
            yield out

    return kernel


def make_tokenize_pairs_kernel_arrow(mode: str, emit_doc_len: bool = False):
    """mapInArrow twin of :func:`make_tokenize_pairs_kernel` — the default
    build tokenize path.

    Runs :func:`analyze_flat_arrow` straight on the Arrow batch: byte-LUT /
    Arrow-kernel tokenize + dictionary encode, no pandas Series, no
    per-token Python string.  Output rows are identical (property-tested via
    analyze_flat_arrow == analyze_flat); measured 2.1-2.4x faster per
    thread and — the scaling-efficiency point — allocation-free per token,
    so 32 workers sharing one socket stop fighting the allocator and the
    memory bus for PyObject traffic."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from clinical_trial_searchengine_spark.functions.analysis import (
        analyze_flat_arrow,
    )

    def kernel(batches):
        for batch in batches:
            names = batch.schema.names
            doc_ids = (
                batch.column(names.index("doc_id"))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            row_idx, dict_idx, dictionary, tfs, lens = analyze_flat_arrow(
                batch.column(names.index("content")), mode
            )
            out_doc = pa.array(doc_ids[row_idx], type=pa.int64())
            out_term = pc.take(dictionary, pa.array(dict_idx, type=pa.int64()))
            out_tf = pa.array(tfs.astype(np.int32), type=pa.int32())
            if emit_doc_len:
                out_doc = pa.concat_arrays(
                    [out_doc, pa.array(doc_ids, type=pa.int64())]
                )
                out_term = pa.concat_arrays(
                    [out_term, pa.nulls(len(doc_ids), type=pa.string())]
                )
                out_tf = pa.concat_arrays(
                    [out_tf, pa.array(lens.astype(np.int32), type=pa.int32())]
                )
            yield pa.RecordBatch.from_arrays(
                [out_doc, out_term, out_tf], names=["doc_id", "term", "tf"]
            )

    return kernel


def _encode_bucket_group(pdf: pd.DataFrame,
                         codec: str = "varint") -> pd.DataFrame:
    """Encode every term inside one (shard, term_bucket, salt) group.

    Sort once by (term, doc_id), then slice per term — NumPy throughout.
    Terms are factorized to int codes first: lexsort on two int arrays is
    several times cheaper (and far lighter on memory bandwidth) than a
    pandas string sort, which matters when many workers share one socket."""
    shard = int(pdf["shard"].iloc[0])
    salt = int(pdf["salt"].iloc[0])
    codes, uniques = pd.factorize(pdf["term"], sort=True)
    order = np.lexsort((pdf["doc_id"].to_numpy(), codes))
    codes = codes[order]
    terms = uniques.to_numpy()
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.uint64)[order]
    tfs = pdf["tf"].to_numpy(dtype=np.uint64)[order]
    # term boundaries on the sorted code column
    change = np.flatnonzero(np.concatenate(([True], codes[1:] != codes[:-1])))
    bounds = np.concatenate((change, [len(codes)]))
    # whole-group batch encode: one varint pass over every term's postings
    # (byte-identical to per-term encode_postings — property-tested in
    # tests/test_codec.py; measured 6x faster than the per-term loop, which
    # pays small-array numpy overhead once per term)
    out_post, out_nb = encode_postings_group(doc_ids, tfs, bounds,
                                             codec=codec)
    return pd.DataFrame(
        {
            "shard": np.full(len(change), shard, dtype=np.int32),
            "term": terms[codes[change]],
            "salt": np.full(len(change), salt, dtype=np.int32),
            "n_postings": np.diff(bounds),
            "cf_local": np.add.reduceat(tfs, change).astype(np.int64),
            "n_blocks": out_nb.astype(np.int32),
            "postings": list(out_post),
        }
    )


def _encode_term_arrays(shard, salt, term_array, doc_ids, tfs,
                        codec: str = "varint"):
    """Shared encode body: one group's (term StringArray, doc_ids uint64,
    tfs uint64) -> encoded per-term rows (term-ascending), the single
    source of truth for both the pair-row encode path and the packed
    shuffle path (byte identity between them is by construction)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    denc = pc.dictionary_encode(term_array)
    codes = denc.indices.to_numpy().astype(np.int64)
    dic = denc.dictionary
    # rank codes under lexicographic term order == factorize(sort=True)
    sorter = pc.array_sort_indices(dic).to_numpy().astype(np.int64)
    rank = np.empty(len(dic), dtype=np.int64)
    rank[sorter] = np.arange(len(dic))
    ranked = rank[codes]
    order = np.lexsort((doc_ids, ranked))
    ranked, doc_ids, tfs = ranked[order], doc_ids[order], tfs[order]
    change = np.flatnonzero(
        np.concatenate(([True], ranked[1:] != ranked[:-1]))
    )
    bounds = np.concatenate((change, [len(ranked)]))
    out_post, out_nb = encode_postings_group(doc_ids, tfs, bounds,
                                             codec=codec)
    n_out = len(change)
    return pa.table(
        {
            "shard": pa.array(np.full(n_out, shard, np.int32), pa.int32()),
            "term": pc.take(dic, pa.array(sorter[ranked[change]])),
            "salt": pa.array(np.full(n_out, salt, np.int32), pa.int32()),
            "n_postings": pa.array(np.diff(bounds), pa.int64()),
            "cf_local": pa.array(
                np.add.reduceat(tfs, change).astype(np.int64), pa.int64()
            ),
            "n_blocks": pa.array(out_nb.astype(np.int32), pa.int32()),
            "postings": pa.array(list(out_post), type=pa.binary()),
        }
    )


def _encode_bucket_group_arrow(table, codec: str = "varint"):
    """applyInArrow twin of :func:`_encode_bucket_group` — the pair-row
    encode path (non-fused builds).  Same output rows in the same
    (term-ascending) order, property-tested; the win is that the group's
    term column never becomes a pandas object array (one PyObject per
    (doc, term) pair), it stays an Arrow buffer dictionary-encoded in
    C++.  Like the Arrow tokenizer this removes per-row allocator/
    memory-bus traffic, which is what limits multi-executor build scaling
    on one socket."""
    shard = table.column("shard")[0].as_py()
    salt = table.column("salt")[0].as_py()
    doc_ids = (
        table.column("doc_id").combine_chunks()
        .to_numpy(zero_copy_only=False).astype(np.uint64)
    )
    tfs = (
        table.column("tf").combine_chunks()
        .to_numpy(zero_copy_only=False).astype(np.uint64)
    )
    return _encode_term_arrays(
        shard, salt, table.column("term").combine_chunks(), doc_ids, tfs,
        codec,
    )


def _make_encode_bucket_group_arrow(codec: str = "varint"):
    """Closure wrapper for applyInArrow (which introspects the callable, so
    a functools.partial won't do)."""

    def _encode(table):
        return _encode_bucket_group_arrow(table, codec)

    return _encode


# ---------------------------------------------------------------------------
# packed encode shuffle (fused standard builds)
# ---------------------------------------------------------------------------

# One row per (map task, shard, term_bucket, salt): all of that group's
# pairs as four flat binary columns.  The encode exchange then moves
# ~10^5 fat rows instead of one row per (doc, term) pair — same bytes,
# ~500x fewer rows — which removes the per-row UnsafeRow serialize/
# deserialize + sort + Arrow-conversion costs that dominated the build's
# shuffle stages (guide §2.3 / §8: shuffle few fat rows, not many small
# ones, when the grouping is already decided).
_PACK_SCHEMA = (
    "shard int, bucket int, salt int, term_lens binary, term_data binary, "
    "doc_ids binary, tfs binary"
)


def _string_array_parts(arr):
    """(data uint8[], starts int64[], lens int64[]) of a utf8 pa.Array."""
    import pyarrow as pa  # noqa: F401

    arr = arr.combine_chunks() if hasattr(arr, "combine_chunks") else arr
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return data, offs[:-1], np.diff(offs)


def make_tokenize_pack_kernel_arrow(
    mode: str, shard_size: int, term_buckets: int,
    n_docs: int, hot_df_threshold: int, max_salts: int,
):
    """mapInArrow kernel: (doc_id, content) batches -> packed group rows.

    Tokenizes like :func:`make_tokenize_pairs_kernel_arrow`, then — instead
    of emitting one row per (doc, term) pair into the exchange — assigns
    each pair its (shard, term_bucket, salt) key IN the kernel (bucket =
    crc32(term) % buckets via the vectorized dictionary hash) and packs
    each group's pairs into one row of flat buffers.  Term strings stay
    Arrow buffers end to end (per-pair materialization is a C++
    ``pc.take`` + slice).

    Hot-term salting is decided PER BATCH from local density: est_df =
    batch term count x (n_docs / batch docs); n_salts = clamp(ceil(est /
    hot_df_threshold), 1, max_salts); salt = the same int64-product /
    float64-divide / truncate expression as the driver plan.  This
    replaces the driver's sampled salt-plan pre-pass (a whole extra
    tokenize job per build) — it CAN disagree across batches for
    borderline terms, which is free: salting only decides grouping, and
    the write-pass merge kernel already reconciles ARBITRARY runs of a
    (shard, term) into byte-identical postings (argsort by unique
    doc_ids — the same property that makes salted == unsalted).

    The bucket function differs from the pair-row path's xxhash64 — it
    only decides GROUPING, never bytes: every pair of a term keeps one
    bucket, the write pass re-buckets encoded rows with the JVM hash as
    before.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from clinical_trial_searchengine_spark.functions.analysis import (
        analyze_flat_arrow,
    )
    from clinical_trial_searchengine_spark.functions.vechash import (
        crc32_many,
    )

    def kernel(batches):
        term_parts = []
        did_parts, tf_parts = [], []
        shard_parts, bucket_parts, salt_parts = [], [], []
        for batch in batches:
            names = batch.schema.names
            doc_ids = (
                batch.column(names.index("doc_id"))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            row_idx, dict_idx, dictionary, tfs, _ = analyze_flat_arrow(
                batch.column(names.index("content")), mode
            )
            if len(dict_idx) == 0:
                continue
            dict_idx = np.asarray(dict_idx, dtype=np.int64)
            # per-TERM bucket + n_salts, computed once per batch vocab
            data, starts, lens = _string_array_parts(dictionary)
            b_term = (
                crc32_many(data, starts, lens).astype(np.int64)
                % term_buckets
            ).astype(np.int32)
            # local-density salt estimate (see docstring): df_est =
            # batch df x corpus/batch doc ratio.  Uses per-batch DISTINCT
            # doc count per term == bincount of the (doc, term) pairs.
            n_batch_docs = max(1, len(doc_ids))
            cnt = np.bincount(dict_idx, minlength=len(dictionary))
            est = cnt * (float(n_docs) / n_batch_docs)
            ns_term = np.ones(len(dictionary), dtype=np.int64)
            hot = est > hot_df_threshold
            if hot.any():
                ns_term[hot] = np.minimum(
                    max_salts,
                    np.ceil(est[hot] / hot_df_threshold).astype(np.int64),
                )
            dids = doc_ids[row_idx]
            local = dids % shard_size
            ns = ns_term[dict_idx]
            term_parts.append(
                pc.take(dictionary, pa.array(dict_idx, type=pa.int64()))
            )
            did_parts.append(dids)
            tf_parts.append(np.asarray(tfs, dtype=np.int32))
            shard_parts.append((dids // shard_size).astype(np.int32))
            bucket_parts.append(b_term[dict_idx])
            salt_parts.append(
                ((local * ns).astype(np.float64) / shard_size).astype(
                    np.int32
                )
            )
        if not did_parts:
            return
        terms = pa.concat_arrays(
            [t.combine_chunks() if hasattr(t, "combine_chunks") else t
             for t in term_parts]
        )
        dids = np.concatenate(did_parts)
        tfs = np.concatenate(tf_parts)
        shards = np.concatenate(shard_parts)
        buckets = np.concatenate(bucket_parts)
        salts = np.concatenate(salt_parts)
        order = np.lexsort((salts, buckets, shards))
        terms = pc.take(terms, pa.array(order))
        dids, tfs = dids[order], tfs[order]
        shards, buckets, salts = shards[order], buckets[order], salts[order]
        key = (
            shards.astype(np.int64) << 40
        ) | (buckets.astype(np.int64) << 20) | salts.astype(np.int64)
        change = np.flatnonzero(
            np.concatenate(([True], key[1:] != key[:-1]))
        )
        bounds = np.append(change, len(key))
        t_data, t_starts, t_lens = _string_array_parts(terms)
        rows = {
            "shard": [], "bucket": [], "salt": [], "term_lens": [],
            "term_data": [], "doc_ids": [], "tfs": [],
        }
        for gi in range(len(change)):
            s, e = int(bounds[gi]), int(bounds[gi + 1])
            rows["shard"].append(int(shards[s]))
            rows["bucket"].append(int(buckets[s]))
            rows["salt"].append(int(salts[s]))
            rows["term_lens"].append(
                t_lens[s:e].astype(np.int32).tobytes()
            )
            b0 = int(t_starts[s])
            b1 = int(t_starts[e - 1] + t_lens[e - 1]) if e > s else b0
            rows["term_data"].append(t_data[b0:b1].tobytes())
            rows["doc_ids"].append(dids[s:e].tobytes())
            rows["tfs"].append(tfs[s:e].tobytes())
        yield pa.RecordBatch.from_pydict(
            {
                "shard": pa.array(rows["shard"], pa.int32()),
                "bucket": pa.array(rows["bucket"], pa.int32()),
                "salt": pa.array(rows["salt"], pa.int32()),
                "term_lens": pa.array(rows["term_lens"], pa.binary()),
                "term_data": pa.array(rows["term_data"], pa.binary()),
                "doc_ids": pa.array(rows["doc_ids"], pa.binary()),
                "tfs": pa.array(rows["tfs"], pa.binary()),
            }
        )

    return kernel


def _make_unpack_encode_arrow(codec: str = "varint"):
    """applyInArrow kernel over (shard, bucket, salt) groups of PACKED
    rows: rebuild each row's term StringArray zero-copy from its
    (term_lens, term_data) buffers, concatenate the group's pairs, and
    encode via the same :func:`_encode_term_arrays` body as the pair-row
    path — identical output rows by construction."""
    import pyarrow as pa

    def _encode(table):
        shard = table.column("shard")[0].as_py()
        salt = table.column("salt")[0].as_py()
        t_arrays, did_parts, tf_parts = [], [], []
        tl_col = table.column("term_lens")
        td_col = table.column("term_data")
        di_col = table.column("doc_ids")
        tf_col = table.column("tfs")
        for i in range(table.num_rows):
            lens = np.frombuffer(tl_col[i].as_py(), dtype=np.int32)
            n = len(lens)
            offs = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(lens, out=offs[1:])
            t_arrays.append(
                pa.Array.from_buffers(
                    pa.utf8(), n,
                    [None, pa.py_buffer(offs.tobytes()),
                     pa.py_buffer(td_col[i].as_py())],
                )
            )
            did_parts.append(
                np.frombuffer(di_col[i].as_py(), dtype=np.int64)
            )
            tf_parts.append(np.frombuffer(tf_col[i].as_py(), dtype=np.int32))
        terms = pa.concat_arrays(t_arrays)
        doc_ids = np.concatenate(did_parts).astype(np.uint64)
        tfs = np.concatenate(tf_parts).astype(np.uint64)
        return _encode_term_arrays(shard, salt, terms, doc_ids, tfs, codec)

    return _encode


def _make_merge_runs_kernel(codec: str = "varint"):
    """mapInArrow kernel that merges salted runs INLINE in the write pass.

    Input rows (shard, term, salt, n_postings, cf_local, n_blocks, postings)
    arrive sorted by (shard, term) within the partition; adjacent rows
    sharing (shard, term) are runs of one term — explicit hot-term salt
    sub-ranges and/or map-side per-partition runs — and are merged: decode
    all, argsort the concatenated doc_ids (unique per term, so the order is
    total and deterministic), re-encode; byte-identical to an unsalted
    single encode (same property the retired pandas merge path tested,
    and independent of how the runs were produced).  Everything else — the
    overwhelming majority — passes through as ZERO-COPY Arrow table slices:
    run boundaries are found with vectorized ``pyarrow.compute`` adjacent
    equality, and only the rows of an actual multi-salt run are ever
    materialized as Python objects.  (A mapInPandas version of this kernel
    converted every binary postings blob and term string to a per-row
    Python object; measured as a 2.5x postings_write regression on 1-core
    executors.)  Output preserves the term-sorted row order the parquet
    row-group pruning relies on (a merged row is emitted at its run's
    position).  Runs never span partitions (the write exchange hashes on
    (shard, term-bucket)) but may span Arrow batches, so each batch's
    trailing (shard, term) run is carried into the next."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from clinical_trial_searchengine_spark.functions.codec import (
        decode_postings,
    )

    out_cols = [
        "shard", "term", "n_postings", "cf_local", "n_blocks", "postings",
    ]

    def _flush(tbl):
        """Yield output tables for one chunk whose runs are all whole."""
        n = len(tbl)
        shard = tbl.column("shard").to_numpy()
        term = tbl.column("term").chunk(0)
        new = np.ones(n, dtype=bool)
        if n > 1:
            same_term = pc.equal(
                term.slice(1), term.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
            new[1:] = (shard[1:] != shard[:-1]) | ~same_term
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, n))
        out_tbl = tbl.select(out_cols)
        multi = lens > 1
        if not multi.any():
            yield out_tbl
            return
        npost = tbl.column("n_postings").to_numpy()
        cfloc = tbl.column("cf_local").to_numpy()
        posts = tbl.column("postings").chunk(0)
        pos = 0
        for s, ln in zip(starts[multi], lens[multi]):
            if s > pos:
                yield out_tbl.slice(pos, s - pos)
            idx = np.arange(s, s + ln)
            # k-way merge by GLOBAL doc_id order: runs may be explicit
            # salt sub-ranges (disjoint, ordered — argsort degenerates to
            # concatenation) or map-side per-partition runs (arbitrary
            # interleaved doc ranges); doc_ids are unique per term, so the
            # argsort is a deterministic total order and the merged bytes
            # are identical no matter how the runs were produced — the
            # salted == unsalted byte-identity property holds unchanged.
            ids_parts, tf_parts = [], []
            for j in idx:
                d, t = decode_postings(posts[j].as_py())
                ids_parts.append(d)
                tf_parts.append(t)
            ids_all = np.concatenate(ids_parts)
            tf_all = np.concatenate(tf_parts).astype(np.uint64)
            morder = np.argsort(ids_all)
            buf, n_blocks = encode_postings(
                ids_all[morder], tf_all[morder], codec=codec
            )
            # cast to the pass-through slices' exact schema — mapInArrow
            # requires every yielded batch to share one schema
            yield pa.table(
                {
                    "shard": pa.array([int(shard[s])], pa.int32()),
                    "term": pa.array([term[s].as_py()], pa.string()),
                    "n_postings": pa.array([int(npost[idx].sum())], pa.int64()),
                    "cf_local": pa.array([int(cfloc[idx].sum())], pa.int64()),
                    "n_blocks": pa.array([int(n_blocks)], pa.int32()),
                    "postings": pa.array([buf], pa.binary()),
                }
            ).cast(out_tbl.schema)
            pos = s + ln
        if pos < n:
            yield out_tbl.slice(pos, n - pos)

    def kernel(batches):
        carry = None
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            if carry is not None and len(carry):
                tbl = pa.concat_tables([carry, tbl])
            tbl = tbl.combine_chunks()
            n = len(tbl)
            if n == 0:
                continue
            # cut off the trailing (shard, term) run — it may continue in
            # the next batch.  Sorted input => rows equal to the last
            # (shard, term) are exactly the trailing contiguous block.
            shard = tbl.column("shard").to_numpy()
            term = tbl.column("term").chunk(0)
            tail = (shard == shard[-1]) & pc.equal(
                term, term[n - 1]
            ).to_numpy(zero_copy_only=False)
            nz = np.flatnonzero(~tail)
            cut = (nz[-1] + 1) if len(nz) else 0
            carry = tbl.slice(cut)
            if cut > 0:
                for out in _flush(tbl.slice(0, cut)):
                    yield from out.to_batches()
        if carry is not None and len(carry):
            for out in _flush(carry):
                yield from out.to_batches()

    return kernel


def _pack_norms(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id")
    lens = pdf["doc_len"].to_numpy(dtype="<i4")
    return pd.DataFrame(
        {
            "shard": [int(pdf["shard"].iloc[0])],
            "chunk": [int(pdf["chunk"].iloc[0])],
            "first_doc_id": [int(pdf["doc_id"].iloc[0])],
            "n": [len(lens)],
            "doc_lens": [lens.tobytes()],
        }
    )


# ---------------------------------------------------------------------------
# build
# ---------------------------------------------------------------------------


@contextlib.contextmanager
def _coarse_splits(spark: SparkSession,
                   max_bytes: int = 128 << 20,
                   open_cost: int = 4 << 20):
    """Temporarily widen scan-split sizing for the post-write stats reads.

    The session's 8 MB splits are sized for the CONTENT pass (where the
    scan split count is the build's parallelism).  Split planning counts
    FULL file sizes, so those same 8 MB splits shatter the blob-heavy
    written postings into dozens of tiny column-pruned tasks per stats
    job — pure per-task scheduler/RPC overhead that grows with corpus
    size and (on 1-core executor JVMs) with executor count.  Stats reads
    prune to a few small integer columns; coarse splits give them a
    handful of real tasks instead.
    """
    keys = {
        "spark.sql.files.maxPartitionBytes": str(max_bytes),
        "spark.sql.files.openCostInBytes": str(open_cost),
    }
    old: dict[str, str | None] = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    mode: str = "standard",
    shard_size: int = DEFAULT_SHARD_SIZE,
    hot_df_threshold: int = 100_000,
    max_salts: int = 32,
    n_resume_groups: int = 4,
    norm_chunk: int = DEFAULT_NORM_CHUNK,
    term_buckets: int | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    verify_sha: bool = True,
    persist_input: bool = True,
    pre_assigned: bool = False,
    pre_tokenized: DataFrame | None = None,
    pairs_storage: str = "none",
    postings_codec: str = "pfor",
) -> dict:
    """Build (or resume) the full index. Returns build metrics dict.

    ``postings_codec``: "pfor" (default; wire v2, NewPFD patched
    bit-packing — functions/pfor.py), "varint" (wire v1), or "adaptive"
    (per-term routing: varint below codec.ADAPTIVE_PFOR_MIN postings,
    pfor above — smallest bytes, measured ~4% under pure pfor on a
    singleton-heavy vocabulary, at ~30% slower encode; pick it for
    storage-bound deployments).  Query-side decode auto-detects the
    version per buffer, so generations built with different codecs
    coexist; the choice is recorded in meta.json and incremental appends
    inherit it.  Measured at sf0.1/local[32]: pfor postings are 15%
    smaller and the postings_write stage 18% faster (8.1 -> 6.6 s) than
    varint, with query latency unchanged-or-better (smaller scans;
    steady-state decode is served by the contribution cache either way).

    Pass structure (minimal — each pass over the corpus is a real cost at
    10^12 docs):
      1. range shuffle for doc_id assignment (+ range-sampling scan),
      2. ONE tokenize pass (mapInPandas, persisted): flat (doc_id, term, tf)
         pairs + a per-doc NULL-term sentinel carrying doc_len — doc lengths
         never need their own shuffle,
      3. doc_meta scan: metadata + sha256 invariant column computed in the
         same projection (no separate verification pass); doc_len joined
         from the sentinel rows (tiny join, no content),
      4. hot-term salt plan from a SAMPLE of the cached pairs (salting is
         performance-only; salted==unsalted is property-tested),
      5. the big shuffle + write: salted (shard, term_bucket, salt) encode
         -> hot-term merge -> shard layout -> parquet, ONE job
         (dynamic-overwriting only the resume groups still todo;
         group=g/shard=k layout unchanged),
      6. EXACT global term_stats (df = Σ per-shard posting counts, cf = Σ
         per-shard tf sums) aggregated from the WRITTEN postings with
         column pruning — a terms-level read replacing v1's full
         groupBy(term) shuffle over every pair.  Postings rows carry only
         per-shard partials (format v2): query-time idf reads the term
         dictionary, the Lucene term-metadata/posting-data split.

    ``pairs_storage`` — how the tokenized (doc_id, term, tf) relation is
    held between pass 2 and pass 5:
      * "none" (default, standard mode): NOT held at all — the tokenizer
        streams straight into the salted encode shuffle (one fused stage),
        doc_len comes from a pure-JVM expression in the doc_meta scan, and
        the salt plan tokenizes a Bernoulli doc sample.  Byte-identical
        output (property-tested) with no pairs-sized materialization —
        the 100 TB shape, and measurably better multi-executor scaling
        (the cache builders were the build's dominant page-allocator load).
      * "disk_only": UnsafeRow-serialized executor-local spill.
      * "memory_and_disk": Spark's columnar in-memory cache (v1 behavior;
        pays a row-at-a-time column builder per pair).
    Porter mode always materializes (its stopword-filtered doc_len needs
    the Python kernel's sentinel rows).
    """
    t0 = time.time()
    stage_sec: dict[str, float] = {}

    def _tick(name: str, t_from: float) -> float:
        now = time.time()
        stage_sec[name] = round(now - t_from, 2)
        return now

    done = seg.manifest_done(spark, index_dir)
    t_cur = _tick("manifest_read", t0)
    # NOTE: the raw corpus is deliberately NOT persisted.  persist_input
    # caches the ASSIGNED join (assign_doc_ids persist_output) — the one
    # content-sized cache every downstream pass reads.  Persisting the raw
    # corpus too (pre-r4 behavior) cached the content TWICE: the keys-only
    # assign scan materialized the full-column corpus cache (event-log:
    # 14.8s taskSum for what a column-pruned parquet key read does in
    # ~2s), and the tokenize job then wrote a second content-sized cache
    # for the join output.  Unpersisted, the key scan stays column-pruned
    # and content is decoded+cached exactly once, at the join.

    has_sha = verify_sha and "content_sha256" in corpus.columns

    if pre_assigned:
        # caller already ran assign_doc_ids (e.g. multifield builds share
        # ONE range shuffle of the corpus across all field sub-indexes)
        docs = corpus
    else:
        docs = assign_doc_ids(corpus, persist_output=persist_input)
    t_cur = _tick("assign_doc_ids", t_cur)

    # -- ONE tokenize pass: pairs + doc_len sentinels, persisted ------------
    # (``pre_tokenized``: the caller already produced — and persisted — the
    # (doc_id, term, tf) + NULL-term-sentinel relation, e.g. the multifield
    # build's single fused tokenize scan shared across field sub-indexes.)
    own_tokenize = pre_tokenized is None
    if own_tokenize:
        kernel_schema = "doc_id long, term string, tf int"
        # pairs cache level: "disk_only" serializes UnsafeRows to executor-
        # local disk; "memory_and_disk" builds Spark's columnar in-memory
        # cache.  The columnar path pays a row-at-a-time
        # CompressibleColumnBuilder.appendFrom per pair (jstack-profiled:
        # the dominant JVM cost of the tokenize stage, and the per-row
        # allocation churn contends across executors sharing a socket —
        # multi-executor cells measured the stage's task CPU inflating
        # ~4x at 4 one-core executors).  DISK_ONLY streams the rows out
        # with the cheap UnsafeRow serializer; both downstream consumers
        # (salt-plan sample, salted encode) read it sequentially once, and
        # at 100 TB a pairs relation would never fit a memory cache anyway.
        fuse = pairs_storage == "none" and mode == "standard"
        if fuse:
            # "none": NO pairs materialization anywhere.  The tokenize
            # kernel streams straight into the encode shuffle's map side
            # (ONE fused stage: scan -> doc_id join -> tokenize -> salted
            # repartition write), doc_len comes from the pure-JVM
            # _make_doc_len_col expression inside the doc_meta scan (it
            # matches the kernel token count exactly — property-tested),
            # and the salt plan estimates df from a tokenized CORPUS
            # sample instead of a pairs-cache sample.  This is the
            # 100 TB shape: a pairs relation is ~10x the corpus and
            # restreaming one extra tokenize of a 0.1% sample beats
            # materializing it (measured here: the pairs cache write was
            # the build's largest page-allocator load, and kernel-side
            # page zeroing is what contends across co-located executors).
            # Porter mode keeps the sentinel path: its doc_len (stopword-
            # filtered) needs the Python kernel anyway.
            tokenized = docs.select("doc_id", "content").mapInArrow(
                make_tokenize_pairs_kernel_arrow(mode, emit_doc_len=False),
                kernel_schema,
            )
            pairs = tokenized
            doc_len_df = None
        else:
            pairs_level = (
                StorageLevel.DISK_ONLY
                if pairs_storage == "disk_only"
                else StorageLevel.MEMORY_AND_DISK
            )
            tokenized = (
                docs.select("doc_id", "content")
                .mapInArrow(
                    make_tokenize_pairs_kernel_arrow(mode, emit_doc_len=True),
                    kernel_schema,
                )
                .persist(pairs_level)
            )
            tokenized.count()  # materialize the tokenize persist once
            pairs = tokenized.where(F.col("term").isNotNull())
            doc_len_df = tokenized.where(F.col("term").isNull()).select(
                "doc_id", F.col("tf").alias("doc_len")
            )
    else:
        tokenized = pre_tokenized
        fuse = False
        pairs = tokenized.where(F.col("term").isNotNull())
        doc_len_df = tokenized.where(F.col("term").isNull()).select(
            "doc_id", F.col("tf").alias("doc_len")
        )
    t_cur = _tick("tokenize", t_cur)

    _released = []

    def _release_caches() -> None:
        """Drop the assigned-join / ranged-keys / pairs caches (idempotent)
        — called as soon as every remaining stage reads only written
        parquet.  (The raw corpus is never persisted — see the note at
        build start.)"""
        if _released:
            return
        _released.append(True)
        if own_tokenize and not fuse:
            tokenized.unpersist()
        if hasattr(docs, "_ctse_persisted"):
            docs._ctse_persisted.unpersist()

    # -- doc_meta: metadata + sha256 invariant in one scan; doc_len joined
    # from the cached sentinel rows (no content, no pair-level shuffle) ----
    meta_cols = ["doc_id", "repo", "path", "commit", "lang"] + (
        ["content_sha256"] if "content_sha256" in corpus.columns else []
    )
    dm_written_this_run = False
    if ("doc_meta", 0) not in done:
        dm_written_this_run = True
        start = time.time()
        sha_col = (
            (F.sha2(F.col("content"), 256) == F.col("content_sha256"))
            if has_sha
            else F.lit(True)
        ).alias("sha_ok")
        if doc_len_df is None:
            # fused path: doc_len is the pure-JVM token-count expression,
            # computed inside the same content scan as the sha — no
            # sentinel join, no second content pass
            dm = docs.select(
                *meta_cols,
                sha_col,
                F.coalesce(_make_doc_len_col(mode), F.lit(0)).alias(
                    "doc_len"
                ),
            )
        else:
            dm = docs.select(*meta_cols, sha_col).join(
                doc_len_df, "doc_id", "left"
            ).withColumn("doc_len", F.coalesce("doc_len", F.lit(0)))
        dm.write.mode("overwrite").parquet(seg.path_of(index_dir, seg.DOC_META))
        # sha_ok flag on THIS row records whether the persisted sha_ok column
        # was actually computed (vs the verify_sha=False lit(True)
        # placeholder) — verify_sha on a resumed run checks it before
        # trusting the column.
        seg.manifest_append(
            spark, index_dir, "doc_meta", 0, "done",
            sha_ok=has_sha, started_at=start,
        )
    t_cur = _tick("doc_meta", t_cur)

    # -- stats + sha verification in ONE tiny agg over doc_meta --
    dm_read = spark.read.parquet(seg.path_of(index_dir, seg.DOC_META))
    # indexes written before the fused-sha format lack sha_ok: treat as ok
    sha_ok_col = (
        F.col("sha_ok") if "sha_ok" in dm_read.columns else F.lit(True)
    )
    stats_row = dm_read.agg(
        F.count("*").alias("num_docs"),
        F.avg("doc_len").alias("avg_doc_len"),
        F.sum("doc_len").alias("total_terms"),
        F.sum(F.when(sha_ok_col, 0).otherwise(1)).alias("mismatches"),
    ).collect()[0]
    num_docs = stats_row["num_docs"]
    if has_sha and ("verify_sha", 0) not in done:
        start = time.time()
        if dm_written_this_run:
            # doc_meta was just written with a computed sha_ok column —
            # no manifest probe needed (saves a job on the common path)
            sha_was_computed = True
        else:
            dm_flags = seg.manifest_latest(spark, index_dir).get(
                ("doc_meta", 0)
            )
            sha_was_computed = (
                "sha_ok" in dm_read.columns
                and dm_flags is not None
                and bool(dm_flags["sha_ok"])
            )
        if sha_was_computed:
            mismatches = int(stats_row["mismatches"] or 0)
        else:
            # doc_meta was persisted by a verify_sha=False (or pre-sha-format)
            # run: its sha_ok column is a lit(True) placeholder and trusting
            # it would mark the invariant verified without any hash ever
            # being computed.  Recompute sha2(content) from the live corpus.
            mismatches = docs.where(
                F.sha2(F.col("content"), 256) != F.col("content_sha256")
            ).count()
        seg.manifest_append(
            spark, index_dir, "verify_sha", 0,
            "done" if mismatches == 0 else "failed",
            rows_in=mismatches, sha_ok=mismatches == 0, started_at=start,
        )
        if mismatches:
            # un-mark the stages derived from the corrupt corpus so a rerun
            # (after the input is fixed) recomputes them from live data
            # instead of reading the stale persisted sha_ok rows forever
            for stage in ("doc_meta", "term_stats", "stats"):
                seg.manifest_append(
                    spark, index_dir, stage, 0, "failed",
                    sha_ok=False, started_at=start,
                )
            raise ValueError(
                f"content_sha256 invariant violated for {mismatches} rows"
            )
    if ("stats", 0) not in done:
        start = time.time()
        # pyarrow source, NOT a python-list row: writing a pickled-RDD-
        # backed DataFrame runs a plain python worker whose per-task
        # setup cost dominates (measured 4+ s for this one row pre-
        # fastdaemon; the Arrow path plans as a local table, ~0.1 s).
        # pa.array keeps None as a true NULL (a pandas NaN would not).
        import pyarrow as pa

        spark.createDataFrame(
            pa.table(
                {
                    "num_docs": pa.array([int(num_docs)], pa.int64()),
                    "avg_doc_len": pa.array(
                        [stats_row["avg_doc_len"]], pa.float64()
                    ),
                    "total_terms": pa.array(
                        [stats_row["total_terms"]], pa.int64()
                    ),
                }
            ),
            "num_docs long, avg_doc_len double, total_terms long",
        ).coalesce(1).write.mode("overwrite").parquet(
            seg.path_of(index_dir, seg.STATS)
        )
        seg.manifest_append(
            spark, index_dir, "stats", 0, "done",
            rows_in=num_docs, started_at=start,
        )
    t_cur = _tick("stats_verify", t_cur)

    n_shards = max(1, math.ceil(num_docs / shard_size))
    n_groups = max(1, min(n_resume_groups, n_shards))
    todo = [g for g in range(n_groups) if ("postings", g) not in done]
    need_term_stats = ("term_stats", 0) not in done
    term_buckets = term_buckets or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )

    if todo or need_term_stats:
        stats_src: DataFrame | None = None  # shared written-postings scan
        # -- hot-term salt plan (explicit + logged, SURVEY.md §4.2) from a
        # SAMPLE of the pairs.  Salting is performance-only (salted ==
        # unsalted byte-identically, property-tested), so estimated df is
        # enough — this replaces round-1's full groupBy(term) pre-pass over
        # every pair (a whole extra shuffle of the corpus-sized relation).
        # Exact df/cf now fall out of the encode output below (B5 unchanged).
        if fuse:
            # packed path (round 6): salting is decided inside the pack
            # kernel from per-batch local density (see
            # make_tokenize_pack_kernel_arrow) — no driver pre-pass, no
            # sample job.  The merge kernel reconciles arbitrary runs
            # byte-identically, so per-batch disagreement is free.
            hot_df = None
            seg.metrics_append(
                spark, index_dir,
                [("salt_plan", 0, "in_kernel", 1.0)],
            )
        else:
            frac = min(1.0, 1000.0 / max(hot_df_threshold, 1))
            sampled = pairs if frac >= 1.0 else pairs.sample(
                fraction=frac, seed=42
            )
            hot_rows = (
                sampled.groupBy("term")
                .agg((F.count("*") / F.lit(frac)).alias("df_est"))
                .where(F.col("df_est") > hot_df_threshold)
                .select(
                    "term",
                    F.least(
                        F.lit(max_salts),
                        F.ceil(
                            F.col("df_est") / F.lit(hot_df_threshold)
                        ).cast("int"),
                    ).alias("n_salts"),
                )
                .collect()
            )
            hot_df = spark.createDataFrame(
                [(r["term"], r["n_salts"]) for r in hot_rows] or [("", 1)],
                "term string, n_salts int",
            )
            seg.metrics_append(
                spark, index_dir,
                [("salt_plan", 0, "hot_terms", float(len(hot_rows)))],
            )
        t_cur = _tick("salt_plan", t_cur)

        # -- THE shuffle: cached pairs -> salted (shard, term_bucket, salt)
        # encode --
        # (A map-side SPIMI-style combiner — encode per-partition runs
        # BEFORE the exchange, shuffle compact runs instead of raw pairs —
        # was A/B-measured here and REJECTED: it cuts shuffle bytes ~5x,
        # but it turns every term into a multi-run merge at the write
        # pass, so the merge kernel's per-run Python path runs for ~150k
        # terms x ~25 runs instead of only rare salted hot terms;
        # postings_write went 56s -> 105s at 1 executor.  Shuffling raw
        # pairs keeps the merge's zero-copy single-run fast path for
        # 99.9% of terms.)
        salted = None if fuse else (
            pairs.join(F.broadcast(hot_df), "term", "left")
            .withColumn("n_salts", F.coalesce("n_salts", F.lit(1)))
            .withColumn("shard", (F.col("doc_id") / shard_size).cast("int"))
            .withColumn(
                "salt",
                (
                    (F.col("doc_id") % shard_size) * F.col("n_salts") / shard_size
                ).cast("int"),
            )
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)))
        )
        enc_schema = (
            "shard int, term string, salt int, n_postings long, "
            "cf_local long, n_blocks int, postings binary"
        )
        # No persist: the encode output streams straight into the shard
        # shuffle below — its ONLY consumer — so the old DISK_ONLY persist
        # (which existed because the hot/cold branch split read it twice)
        # would now be a pure extra disk round-trip of the whole postings
        # relation.
        # EXPLICIT fine-grained partitioning for the encode shuffle: a bare
        # groupBy leaves the partition count to AQE, whose parallelism-first
        # coalescing targets ~total-core-count tasks (measured: 5 tasks of
        # ~60MB at 4 executors, one 49s straggler dominating the stage, with
        # the pre-applyInArrow sort spilling per fat task).  Repartitioning
        # on the grouping keys with an explicit count gives Catalyst a
        # HashPartitioning that already satisfies the groupBy's required
        # distribution — no second exchange — and many small sorts + encode
        # kernels that pack tightly onto however many cores exist.
        n_encode_parts = max(
            32, 4 * int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        )
        if fuse:
            # PACKED encode shuffle (round 6): the tokenize kernel assigns
            # (shard, bucket, salt) itself and emits ONE row per group per
            # map task (flat term/doc/tf buffers) instead of one row per
            # pair.  Same shuffled bytes, ~500x fewer rows: the per-row
            # UnsafeRow serialize/deserialize, the reduce-side sort of
            # every pair, and the per-pair Arrow conversion — measured as
            # ~5/6 of the two shuffle stages' 900 task-seconds, vs ~145
            # task-seconds of actual tokenize+encode python — collapse to
            # per-group costs.  Output rows are byte-identical: the
            # unpack kernel feeds the same _encode_term_arrays body.
            packed = docs.select("doc_id", "content").mapInArrow(
                make_tokenize_pack_kernel_arrow(
                    mode, shard_size, term_buckets,
                    int(num_docs), hot_df_threshold, max_salts,
                ),
                _PACK_SCHEMA,
            )
            encoded = (
                packed.repartition(
                    n_encode_parts, "shard", "bucket", "salt"
                )
                .groupBy("shard", "bucket", "salt")
                .applyInArrow(
                    _make_unpack_encode_arrow(postings_codec), enc_schema
                )
            )
        else:
            encoded = (
                salted.repartition(n_encode_parts, "shard", "bucket", "salt")
                .groupBy("shard", "bucket", "salt")
                .applyInArrow(
                    _make_encode_bucket_group_arrow(postings_codec),
                    enc_schema,
                )
            )

        merge_schema = (
            "shard int, term string, n_postings long, cf_local long, "
            "n_blocks int, postings binary"
        )
        if todo:
            # -- postings: ONE job end-to-end (pairs -> salted encode ->
            # shard shuffle -> sorted inline salted-run merge -> parquet),
            # dynamic-overwriting only todo groups (resume granularity:
            # group=g/shard=k).  The (shard, term, salt) sort makes salted
            # runs adjacent, so merging is a streaming pass in the SAME
            # task that writes the shard — no second read of the encode
            # output, no separate hot-term shuffle.  Every downstream
            # statistic is derived from the WRITTEN files below with
            # column pruning (the postings blobs are never re-read).
            start = time.time()
            (
                encoded.where((F.col("shard") % n_groups).isin(todo))
                # (shard, bucket) — NOT bare shard: all salts of a term
                # share (shard, bucket), so salted runs stay whole, but
                # write parallelism is n_shards * term_buckets tasks
                # instead of n_shards.  With shard-only partitioning a
                # small-shard-count build (e.g. 4 shards on 4 executors)
                # serialized the entire sort+merge+parquet pass into 4
                # tasks and capped marginal scaling at ~1.4x.  partitionBy
                # below splits by column value regardless of task layout,
                # so each task just writes one term-sorted file per shard
                # dir it holds; query-side row-group pruning is per-file
                # min/max and is indifferent to the file count.
                # EXPLICIT partition count: repartition(cols) with no count
                # is advisory under AQE, and coalescePartitions folds this
                # exchange to ~64MB-sized tasks — measured serializing the
                # whole sort+merge+write onto 2-3 cores at 200k docs.
                .repartition(
                    int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
                    F.col("shard"),
                    F.pmod(F.xxhash64("term"), F.lit(term_buckets)),
                )
                .sortWithinPartitions("shard", "term", "salt")
                .mapInArrow(
                    _make_merge_runs_kernel(postings_codec), merge_schema
                )
                .withColumn("group", F.col("shard") % n_groups)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("group", "shard")
                .parquet(seg.path_of(index_dir, seg.POSTINGS))
            )
            # caches are dead the moment the postings land; release before
            # the group-counts job below or it runs on a full old-gen
            # (measured 13.1s GC on a 14.4s 4-task count job)
            _release_caches()
            # ONE column-pruned, coarse-split scan of the written postings
            # serves BOTH the per-group manifest counts here and the global
            # term_stats agg below (it was two full re-plans before; the
            # 8 MB content-pass splits made each one dozens of tiny tasks —
            # measured as term_stats marginal-gap anti-scaling, 0.46 s ->
            # 1.12 s going 1 -> 4 one-core executors at 150k marginal docs).
            with _coarse_splits(spark):
                stats_src = (
                    spark.read.parquet(seg.path_of(index_dir, seg.POSTINGS))
                    .select("group", "term", "n_postings", "cf_local")
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                group_counts = {
                    r["group"]: r["n"]
                    for r in stats_src.where(F.col("group").isin(todo))
                    .groupBy("group").agg(F.count("*").alias("n")).collect()
                }
            for g in todo:
                n_terms = int(group_counts.get(g, 0))
                seg.manifest_append(
                    spark, index_dir, "postings", g, "done",
                    terms_out=n_terms, started_at=start,
                )
                seg.metrics_append(
                    spark, index_dir, [("postings", g, "rows", float(n_terms))]
                )
        t_cur = _tick("postings_write", t_cur)

        # -- release the build caches NOW: everything below reads only the
        # WRITTEN parquet (postings, doc_meta), and the corpus + ranged +
        # 48M-row pairs caches otherwise sit on the executor heaps through
        # the tail stages — measured as GC-dominated (12.8s GC on a 16.4s
        # stage) on 14g executors at 200k docs.
        _release_caches()

        # -- EXACT global term stats (df = Σ per-shard posting counts, cf =
        # Σ per-shard tf sums) aggregated from the WRITTEN postings with
        # column pruning — a terms-level read (reusing the shared
        # stats_src scan when this build just wrote postings), no
        # pair-level shuffle.  Covers ALL groups on disk, so a resumed
        # build that crashed between postings and term_stats recovers here.
        # Format v2: postings carry only per-shard partials; query-time idf
        # reads this term dictionary (Lucene's term-metadata/posting split).
        if need_term_stats:
            start = time.time()
            with _coarse_splits(spark):
                src = stats_src if stats_src is not None else (
                    spark.read.parquet(seg.path_of(index_dir, seg.POSTINGS))
                    .select("term", "n_postings", "cf_local")
                )
                (
                    src.groupBy("term")
                    .agg(
                        F.sum("n_postings").alias("df"),
                        F.sum("cf_local").alias("cf"),
                    )
                    .write.mode("overwrite")
                    .parquet(seg.path_of(index_dir, seg.TERM_STATS))
                )
            seg.manifest_append(
                spark, index_dir, "term_stats", 0, "done", started_at=start
            )
        if stats_src is not None:
            stats_src.unpersist()
    t_cur = _tick("term_stats", t_cur)

    # -- norms (doc_len arrays per shard chunk) --
    if ("norms", 0) not in done:
        start = time.time()
        norms_schema = (
            "shard int, chunk int, first_doc_id long, n int, doc_lens binary"
        )
        (
            spark.read.parquet(seg.path_of(index_dir, seg.DOC_META))
            .select("doc_id", "doc_len")
            .withColumn("shard", (F.col("doc_id") / shard_size).cast("int"))
            .withColumn(
                "chunk", ((F.col("doc_id") % shard_size) / norm_chunk).cast("int")
            )
            .groupBy("shard", "chunk")
            .applyInPandas(_pack_norms, norms_schema)
            .write.mode("overwrite")
            .parquet(seg.path_of(index_dir, seg.NORMS))
        )
        seg.manifest_append(spark, index_dir, "norms", 0, "done", started_at=start)

    t_cur = _tick("norms", t_cur)
    _release_caches()  # no-op unless the postings block was skipped (resume)

    meta = {
        "format_version": 2,  # v2: postings carry no df/cf; idf reads term_stats
        "mode": mode,
        "shard_size": shard_size,
        "n_shards": n_shards,
        "num_docs": int(num_docs),
        "avg_doc_len": float(stats_row["avg_doc_len"] or 0.0),
        "total_terms": int(stats_row["total_terms"] or 0),
        "k1": k1,
        "b": b,
        "norm_chunk": norm_chunk,
        "hot_df_threshold": hot_df_threshold,
        "max_salts": max_salts,
        "n_resume_groups": n_groups,
        "term_buckets": term_buckets,
        "postings_codec": postings_codec,
    }
    seg.write_meta(index_dir, meta)
    meta["build_seconds"] = time.time() - t0
    meta["stage_seconds"] = stage_sec
    return meta
