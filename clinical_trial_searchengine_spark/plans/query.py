"""Query-time BM25 top-k over the doc-sharded segment layout.

Lifecycle (SURVEY.md §3.1 steps 4-9, Spark-first):

  analyze query text with the SAME kernel as indexing (driver-side, tiny)
  -> broadcast query terms + exact global stats (N, avgdl, per-term df)
  -> parquet scan of postings pruned to the query terms (predicate pushdown;
     files are sorted by term so row-group min/max skips almost everything)
  -> cogroup(postings, norms) by shard -> per-shard scoring kernel:
     decode -> BM25 (k1=1.2, b=0.75) -> bounded top-k heap per shard
     (df-adaptive default: vectorized block-max 'pruned' vs 'exhaustive';
     the doc-at-a-time Python WAND is a demoted test-only oracle
     'wand_ref' — equivalence property-tested)
  -> global top-k merge: orderBy(score desc, doc_id asc).limit(k)
     (Catalyst TakeOrderedAndProject = per-partition heap + driver merge).

Score reproducibility: per-doc contributions are accumulated in term-sorted
order in float64, matching tests/oracle.py bit-for-bit (SURVEY.md §7(a)).
Tie-break is explicit: (score desc, doc_id asc) — T6, required because
Lucene breaks ties by internal doc order.

BM25 formula (reference defaults — no similarity override in
reference: backend/search/mapping.json):
    idf  = ln(1 + (N - df + 0.5)/(df + 0.5))
    s    = qtf * idf * tf / (tf + k1*(1 - b + b*dl/avgdl))
"""

from __future__ import annotations

import heapq
import math
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_trial_searchengine_spark.functions.analysis import tokenize_text
from clinical_trial_searchengine_spark.functions.codec import (
    decode_block,
    decode_blocks,
    decode_directory,
    decode_postings,
)
from clinical_trial_searchengine_spark.plans import segments as seg

_RESULT_SCHEMA = "doc_id long, score double"


def _idf(N: int, df: int) -> float:
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def _norms_dl(norms_pdf: pd.DataFrame) -> np.ndarray:
    norms_pdf = norms_pdf.sort_values("chunk")
    return np.concatenate(
        [np.frombuffer(b, dtype="<i4") for b in norms_pdf["doc_lens"]]
    ).astype(np.float64)


def _topk_from_scores(acc, base, k):
    nz = np.flatnonzero(acc)
    if nz.size == 0:
        return pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": "int64", "score": "float64"}
        )
    scores = acc[nz]
    if nz.size > k:
        sel = np.argpartition(-scores, k - 1)[:k]
        # re-sort the k selected by (score desc, doc_id asc)
        order = np.lexsort((nz[sel], -scores[sel]))
        sel = sel[order]
    else:
        sel = np.lexsort((nz, -scores))
    return pd.DataFrame(
        {"doc_id": (base + nz[sel]).astype("int64"), "score": scores[sel]}
    )


def _empty_result() -> pd.DataFrame:
    return pd.DataFrame({"doc_id": [], "score": []}).astype(
        {"doc_id": "int64", "score": "float64"}
    )


def _empty_batch_result() -> pd.DataFrame:
    return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
        {"query_id": "str", "doc_id": "int64", "score": "float64"}
    )


# one row per (gen, shard, term) the pruned kernel touched — the evidence
# trail for "did block skipping fire" (profile_query below)
_PROFILE_SCHEMA = (
    "gen int, shard int, term string, weight double, df long, "
    "n_blocks long, blocks_decoded long, decode_mode string, "
    "alive_docs long, theta double"
)
_PROFILE_COLS = [
    "gen", "shard", "term", "weight", "df", "n_blocks", "blocks_decoded",
    "decode_mode", "alive_docs", "theta",
]


def _profile_pdf(stats: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(stats, columns=_PROFILE_COLS).astype(
        {"gen": "int32", "shard": "int32", "weight": "float64",
         "df": "int64", "n_blocks": "int64", "blocks_decoded": "int64",
         "alive_docs": "int64", "theta": "float64"}
    )


def _empty_profile() -> pd.DataFrame:
    return _profile_pdf([])


def _tomb_local(tombs: np.ndarray, gbase: int, nd: int) -> np.ndarray:
    """Shard-local offsets of tombstoned GLOBAL doc_ids (``tombs`` sorted).

    Tombstones mask superseded/deleted docs out of results between
    compactions (Lucene deleted-docs semantics — see streaming/incremental
    .upsert_index); global stats intentionally keep counting them until the
    next compaction."""
    lo = int(np.searchsorted(tombs, gbase))
    hi = int(np.searchsorted(tombs, gbase + nd))
    return (tombs[lo:hi] - gbase).astype(np.int64)


# ---------------------------------------------------------------------------
# Cross-query contribution cache (per Python-worker process).
#
# A query service hits the same hot terms over and over; decoding a hot
# posting list (df ~ num_docs) plus recomputing its length normalization is
# the dominant per-query kernel cost at corpus scale — and it is IDENTICAL
# across queries: (doc offsets, tf/(tf+K_d)) depend only on the posting
# bytes, the shard's doc lengths, and (avgdl, k1, b).  The per-query parts
# (qtf, idf) are scalar multipliers applied afterwards.  Lucene solves this
# with its LRU query cache; here the cache lives in each executor's
# long-lived Python worker.  Keys hash the posting BYTES and the shard's
# doc-length bytes, so a rebuilt index can never serve stale entries
# (rank-identity tests pass with the cache hot or cold).  Bounded: when the
# cap is reached the cache is cleared wholesale (simple, GC-friendly).
# ---------------------------------------------------------------------------

_CONTRIB_CACHE: dict = {}
_CONTRIB_CACHE_BYTES = 0
_CONTRIB_CACHE_CAP = 256 * 1024 * 1024


def _dl_token(dl: np.ndarray) -> bytes:
    import hashlib

    return hashlib.md5(dl.tobytes()).digest()


def _contrib_cached(buf: bytes, base: int, dl, avgdl, k1, b, dl_tok):
    """(local offsets, tf/(tf+Kd)) for one posting list — decoded once per
    worker process, reused across queries."""
    global _CONTRIB_CACHE_BYTES
    import hashlib

    key = (hashlib.md5(buf).digest(), dl_tok, base, avgdl, k1, b)
    ent = _CONTRIB_CACHE.get(key)
    if ent is None:
        ids, tfs = decode_postings(buf)
        off = (ids - np.uint64(base)).astype(np.int64)
        Kd = k1 * (1.0 - b + b * dl[off] / avgdl)
        norm = tfs.astype(np.float64) / (tfs + Kd)
        sz = off.nbytes + norm.nbytes
        if _CONTRIB_CACHE_BYTES + sz > _CONTRIB_CACHE_CAP:
            _CONTRIB_CACHE.clear()
            _CONTRIB_CACHE_BYTES = 0
        _CONTRIB_CACHE[key] = ent = (off, norm)
        _CONTRIB_CACHE_BYTES += sz
    return ent


def _postings_by_term(p_pdf: pd.DataFrame, need_df: bool) -> dict:
    """{term: (postings_bytes, df_or_None)} via .values arrays —
    pd.itertuples has a ~1.4 ms fixed cost per call (profiled), paid once
    per (gen, shard) group at query time."""
    terms = p_pdf["term"].values
    posts = p_pdf["postings"].values
    if need_df:
        dfs_col = p_pdf["df"].values
        return {t: (p, int(d)) for t, p, d in zip(terms, posts, dfs_col)}
    return {t: (p, None) for t, p in zip(terms, posts)}


def _make_exhaustive_kernel(qtf, N, avgdl, k1, b, shard_size, k,
                            bases=None, dfs=None, tombs=None, allow=None,
                            boost=None):
    """Vectorized per-(gen, shard) kernel: decode-all, accumulate, bounded
    top-k.  Takes ``(key, p_pdf, dl)`` with ``dl`` the shard's doc-length
    float64 array — supplied either from the cogrouped norms relation or
    from the warmed driver-side norms broadcast (see :func:`_apply_kernel`).

    O(total postings) numpy work; no per-posting Python.  This is the default
    because vectorized exhaustive scoring beats pointer-chasing WAND in
    Python for all but extremely selective queries.

    ``bases``: {gen: global doc_id offset} for delta-generation indexes
    (gen-local ids are globalized as base + local).  ``dfs``: {term: GLOBAL
    df} — required for multi-generation indexes where the per-generation
    postings row df is stale; None -> use the row's df (single-gen exact).
    ``boost``: optional (sorted global doc_ids int64, multipliers float64)
    pair — pushed function-score (B3): multipliers are applied to the full
    accumulated scores BEFORE the per-shard heap, so the heap holds the
    top-k of the BOOSTED order directly (exact: every match's boosted score
    is materialized here, exhaustively — no pruning bound has to account
    for the multiplier).
    """
    terms_sorted = sorted(qtf)
    bases = bases or {0: 0}

    def kernel(key, p_pdf: pd.DataFrame, dl: np.ndarray) -> pd.DataFrame:
        gen, shard = int(key[0]), int(key[1])
        base = shard * shard_size  # gen-LOCAL shard base (norms/postings ids)
        dl_tok = _dl_token(dl)
        acc = np.zeros(dl.size, dtype=np.float64)
        by_term = _postings_by_term(p_pdf, need_df=dfs is None)
        for term in terms_sorted:  # fixed summation order == oracle
            row = by_term.get(term)
            if row is None:
                continue
            df = dfs[term] if dfs is not None else row[1]
            off, norm = _contrib_cached(
                bytes(row[0]), base, dl, avgdl, k1, b, dl_tok
            )
            acc[off] += (qtf[term] * _idf(N, df)) * norm
        if tombs is not None and tombs.size:
            acc[_tomb_local(tombs, base + bases[gen], dl.size)] = 0.0
        if allow is not None:
            keep = np.zeros(dl.size, dtype=bool)
            keep[_tomb_local(allow, base + bases[gen], dl.size)] = True
            acc[~keep] = 0.0
        if boost is not None:
            bids, bvals = boost
            gb = base + bases[gen]
            lo = int(np.searchsorted(bids, gb))
            hi = int(np.searchsorted(bids, gb + dl.size))
            if hi > lo:
                acc[(bids[lo:hi] - gb).astype(np.int64)] *= bvals[lo:hi]
        return _topk_from_scores(acc, base + bases[gen], k)

    return kernel


def _make_pruned_kernel(qtf, N, avgdl, k1, b, shard_size, k,
                        bases=None, dfs=None, tombs=None, allow=None,
                        profile=False):
    """Vectorized ITERATIVE block-max pruned kernel: WAND-grade block
    skipping with no per-posting Python (the scale answer to 'exhaustive
    decodes every posting of every hot term'; complements §2.8-B6's
    doc-at-a-time WAND).

    Term-at-a-time in DESCENDING weight (w = qtf*idf) order, all numpy:

      * The heaviest term is decoded fully (it is its own best seed).
      * Before each remaining term t: theta = k-th largest of the working
        partial-score array.  working(d) <= final(d) pointwise (it sums a
        subset of d's contributions), and order statistics are monotone
        under pointwise domination, so theta is a LOWER bound on the true
        k-th best final score — pruning strictly below theta can never
        evict a true top-k doc, and ties survive (a pruned doc's final
        score is STRICTLY below theta).
      * Per undecoded term, per block, the contribution upper bound
        ub = w * max_tf / (max_tf + k1*(1-b)) (dl -> 0: above any
        achievable value) is painted onto the shard's doc space as a step
        function (np.add.at + cumsum — one piecewise-constant profile
        U(d) over ALL still-undecoded terms, t included).  Doc d stays
        alive iff working(d) + U(d) >= theta.  A block of t is decoded iff
        its doc range contains ANY alive doc (prefix-sum lookup);
        :func:`decode_blocks` batch-decodes the survivors.  Decoded
        contributions then join the working array, so theta TIGHTENS for
        every later term (the single-seed theta of the first cut of this
        kernel left hot multi-term queries with 100% block survival —
        measured; the iterative refinement is what makes skipping fire).
      * A top-k doc stays alive at every step by induction: alive docs
        receive ALL contributions of the current term (their blocks
        contain an alive doc — themselves), so their working score stays
        exact, and working(d) + U(d) >= final(d) >= theta for them.
        A doc pruned at any step is strictly below the final k-th score
        and its (possibly understated) accumulated score can never
        displace a true top-k doc.

    Per-term contribution arrays are computed ONCE and cached; the final
    accumulate replays them in term-sorted order — bit-identical float
    summation order to the exhaustive kernel and the SQL oracle.  Worst
    case (nothing prunable) this decodes exactly what exhaustive decodes,
    plus only directory/profile/theta overhead that is O(num_blocks +
    shard_docs) per term — independent of posting count.

    ``profile=True`` turns the kernel into its own introspection twin: the
    SAME control flow runs, but the output is one row per (gen, shard,
    term) describing what the pruning actually did (blocks decoded vs
    total, decode mode, alive-doc count, theta at decision time) instead
    of top-k rows — the per-shard evidence for "did block skipping fire on
    this query" that tail-latency tuning needs (VERDICT r3 task #5).
    """
    terms_sorted = sorted(qtf)
    bases = bases or {0: 0}

    def kernel(key, p_pdf: pd.DataFrame, dl: np.ndarray) -> pd.DataFrame:
        gen, shard = int(key[0]), int(key[1])
        base = shard * shard_size
        nd = dl.size
        by_term = _postings_by_term(p_pdf, need_df=dfs is None)
        # tombstone/filter mask applied at contribution time so the working
        # array (and thus theta) never counts dead docs — an inflated theta
        # could otherwise prune a live doc that belongs in the live top-k.
        # ``allow`` (pushed filter context, B4) is the same mask inverted:
        # docs OUTSIDE the allowed set are dead.
        dead = None
        if allow is not None:
            dead = np.ones(nd, dtype=bool)
            al = _tomb_local(allow, base + bases[gen], nd)
            if al.size:
                dead[al] = False
        if tombs is not None and tombs.size:
            tl = _tomb_local(tombs, base + bases[gen], nd)
            if tl.size:
                if dead is None:
                    dead = np.zeros(nd, dtype=bool)
                dead[tl] = True

        # directories + weights + per-term block upper-bound step profiles
        dirs, steps = {}, {}
        for term in terms_sorted:
            row = by_term.get(term)
            if row is None:
                continue
            df = dfs[term] if dfs is not None else row[1]
            buf = bytes(row[0])
            n, firsts, max_tfs, nb, offs = decode_directory(buf)
            if not n:
                continue
            w = qtf[term] * _idf(N, df)
            dirs[term] = (w, buf, n, firsts, max_tfs, nb, offs, int(df))
            mt = max_tfs.astype(np.float64)
            starts = np.clip(
                (firsts - np.uint64(base)).astype(np.int64), 0, nd
            )
            ends = np.empty_like(starts)
            ends[:-1] = starts[1:]  # next block's first bounds the range
            ends[-1] = nd
            steps[term] = (starts, ends, w * mt / (mt + k1 * (1.0 - b)))
        if not dirs:
            return _empty_profile() if profile else _empty_result()

        dl_tok = _dl_token(dl)
        stats: list[tuple] = []  # profile rows: one per term processed

        def contrib_of(term, ids_t, tfs_t):
            off = (ids_t - np.uint64(base)).astype(np.int64)
            if dead is not None:
                keep = ~dead[off]
                off, tfs_t = off[keep], tfs_t[keep]
            Kd = k1 * (1.0 - b + b * dl[off] / avgdl)
            return off, dirs[term][0] * (
                tfs_t.astype(np.float64) / (tfs_t + Kd)
            )

        def full_contrib(term):
            """Full-decode contribution via the cross-query cache (hot
            terms decode once per worker; per-query w is a scalar)."""
            off, norm = _contrib_cached(
                dirs[term][1], base, dl, avgdl, k1, b, dl_tok
            )
            if dead is not None:
                keep = ~dead[off]
                off, norm = off[keep], norm[keep]
            return off, dirs[term][0] * norm

        order = sorted(dirs, key=lambda t: (-dirs[t][0], t))
        contribs = {}

        t0 = order[0]
        off0, c0 = full_contrib(t0)
        contribs[t0] = (off0, c0)
        if profile:
            nb0 = len(dirs[t0][3])
            stats.append((gen, shard, t0, dirs[t0][0], dirs[t0][7],
                          nb0, nb0, "seed", nd, float("nan")))
        if len(order) == 1:
            if profile:
                return _profile_pdf(stats)
            acc = np.zeros(nd, dtype=np.float64)
            acc[off0] = c0
            return _topk_from_scores(acc, base + bases[gen], k)

        working = np.zeros(nd, dtype=np.float64)
        working[off0] += c0
        for i in range(1, len(order)):
            t = order[i]
            w, buf, n, firsts, max_tfs, nb, offs, t_df = dirs[t]
            theta = (
                float(np.partition(working, nd - k)[nd - k])
                if nd > k else -math.inf
            )
            # upper-bound profile over ALL still-undecoded terms (t incl.)
            diff = np.zeros(nd + 1, dtype=np.float64)
            for u in order[i:]:
                starts, ends, ub = steps[u]
                np.add.at(diff, starts, ub)
                np.add.at(diff, ends, -ub)
            alive = working + np.cumsum(diff[:-1]) >= theta
            alive_prefix = np.concatenate(
                ([0], np.cumsum(alive, dtype=np.int64))
            )
            starts, ends, _ = steps[t]
            keep = np.flatnonzero(
                alive_prefix[ends] - alive_prefix[starts] > 0
            )
            if keep.size > 0.5 * len(firsts):
                # little to skip: one full-pass decode beats the
                # per-block selective loop (adaptive, measured) — and the
                # full decode is served by the cross-query cache
                off_t, c_t = full_contrib(t)
                mode, n_dec = "full", len(firsts)
            else:
                ids_t, tfs_t = decode_blocks(buf, keep, n, firsts, nb, offs)
                off_t, c_t = contrib_of(t, ids_t, tfs_t)
                mode, n_dec = "selective", int(keep.size)
            if profile:
                stats.append((gen, shard, t, w, t_df, len(firsts), n_dec,
                              mode, int(alive.sum()), float(theta)))
            contribs[t] = (off_t, c_t)
            if i + 1 < len(order):  # last term: no further theta needed
                working[off_t] += c_t

        if profile:
            return _profile_pdf(stats)
        # final accumulate in term-sorted order == oracle summation order
        acc = np.zeros(nd, dtype=np.float64)
        for term in terms_sorted:
            d = contribs.get(term)
            if d is None or not len(d[0]):
                continue
            acc[d[0]] += d[1]
        return _topk_from_scores(acc, base + bases[gen], k)

    return kernel


def _make_wand_kernel(qtf, N, avgdl, k1, b, shard_size, k,
                      bases=None, dfs=None, tombs=None, allow=None):
    """Block-max WAND per-shard kernel (north rule; SURVEY.md §2.8-B6).

    Term upper bound uses dl->0, which is STRICTLY above any achievable
    contribution for b<1 and dl>=1, so pruning at sum_ub <= theta can never
    drop a doc that ties theta — tie-break exactness is preserved.
    Blocks are skipped via the directory (first_doc_id per block) without
    decoding; per-block max_tf refines the bound.
    """
    terms_sorted = sorted(qtf)
    bases = bases or {0: 0}

    class TermState:
        __slots__ = (
            "term", "w", "buf", "n", "firsts", "max_tfs", "nbytes",
            "offsets", "bidx", "ids", "tfs", "ptr", "ub",
        )

        def __init__(self, term, w, buf):
            self.term, self.w, self.buf = term, w, buf
            self.n, self.firsts, self.max_tfs, self.nbytes, self.offsets = (
                decode_directory(buf)
            )
            self.bidx = -1
            self.ids = self.tfs = None
            self.ptr = 0
            self.ub = w / (1.0 + k1 * (1.0 - b))  # tf=1 lower bound refined below

        def _load_block(self, bi):
            self.bidx = bi
            self.ids, self.tfs = decode_block(
                self.buf, bi, self.n, self.firsts, self.nbytes, self.offsets
            )
            self.ptr = 0

        def cur_doc(self):
            if self.bidx == -2:
                return None
            if self.bidx == -1:
                self._load_block(0)
            return int(self.ids[self.ptr])

        def cur_tf(self):
            return int(self.tfs[self.ptr])

        def advance(self):
            self.ptr += 1
            if self.ptr >= len(self.ids):
                if self.bidx + 1 < len(self.firsts):
                    self._load_block(self.bidx + 1)
                else:
                    self.bidx = -2

        def seek(self, target):
            """Advance to first doc >= target, skipping blocks via directory."""
            if self.bidx == -2:
                return
            if self.bidx == -1:
                self._load_block(0)
            if int(self.ids[-1]) < target:
                bi = int(np.searchsorted(self.firsts, target, side="right")) - 1
                bi = max(bi, self.bidx + 1)
                if bi >= len(self.firsts):
                    self.bidx = -2
                    return
                self._load_block(bi)
                while int(self.ids[-1]) < target:
                    if self.bidx + 1 >= len(self.firsts):
                        self.bidx = -2
                        return
                    self._load_block(self.bidx + 1)
            self.ptr = int(np.searchsorted(self.ids, target))
            if self.ptr >= len(self.ids):
                self.advance()

    def kernel(key, p_pdf: pd.DataFrame, dl: np.ndarray) -> pd.DataFrame:
        gen, shard = int(key[0]), int(key[1])
        base = shard * shard_size
        # dead docs are scored (states must advance past them) but never
        # pushed, so theta stays the k-th best LIVE score — a valid (never
        # inflated) pruning bound for the live top-k
        dead: set[int] = set()
        if tombs is not None and tombs.size:
            dead = set(
                (base + _tomb_local(tombs, base + bases[gen], dl.size))
                .tolist()
            )
        allowed: set[int] | None = None
        if allow is not None:
            allowed = set(
                (base + _tomb_local(allow, base + bases[gen], dl.size))
                .tolist()
            )

        states = []
        by_term = _postings_by_term(p_pdf, need_df=dfs is None)
        for term in terms_sorted:
            row = by_term.get(term)
            if row is None:
                continue
            w = qtf[term] * _idf(N, dfs[term] if dfs is not None else row[1])
            st = TermState(term, w, bytes(row[0]))
            if st.n:
                # strict UB: dl -> 0 (never achieved; dl >= 1 for matches)
                mt = float(max(st.max_tfs.max(), 1))
                st.ub = w * mt / (mt + k1 * (1.0 - b))
                states.append(st)
        if not states:
            return _empty_result()

        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
        theta = -math.inf

        def score_doc(doc):
            s = 0.0
            for st in sorted(
                (t for t in states if t.cur_doc() == doc), key=lambda t: t.term
            ):
                tf = float(st.cur_tf())
                Kd = k1 * (1.0 - b + b * dl[doc - base] / avgdl)
                s += st.w * (tf / (tf + Kd))
                st.advance()
            return s

        while True:
            live = [st for st in states if st.cur_doc() is not None]
            if not live:
                break
            live.sort(key=lambda st: st.cur_doc())
            ub_sum, pivot_i = 0.0, -1
            for i, st in enumerate(live):
                ub_sum += st.ub
                if len(heap) < k or ub_sum > theta:
                    pivot_i = i
                    break
            if pivot_i < 0:
                break
            pivot_doc = live[pivot_i].cur_doc()
            if live[0].cur_doc() == pivot_doc:
                s = score_doc(pivot_doc)
                if pivot_doc in dead or (
                    allowed is not None and pivot_doc not in allowed
                ):
                    continue  # advance happened in score_doc; never push
                entry = (s, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, entry)
                    if len(heap) == k:
                        theta = heap[0][0]
                elif entry > heap[0]:
                    heapq.heapreplace(heap, entry)
                    theta = heap[0][0]
            else:
                for st in live[:pivot_i]:
                    st.seek(pivot_doc)

        if not heap:
            return _empty_result()
        out = sorted(heap, key=lambda e: (-e[0], -e[1]))
        return pd.DataFrame(
            {
                "doc_id": [bases[gen] - d for _, d in out],
                "score": [s for s, _ in out],
            }
        ).astype({"doc_id": "int64", "score": "float64"})

    return kernel


def analyze_query(query_text: str, mode: str) -> Counter:
    """Query analysis with the indexing chain; repeated terms -> qtf weight."""
    return Counter(tokenize_text(query_text, mode))


class IndexHandle:
    """Opened index: meta + lazily-read postings/norms DataFrames, shared
    across queries.  ``warm()`` persists both (norms are small; postings fit
    memory at sandbox scale — on a cluster, warm only norms).

    Delta generations: when ``generations.json`` exists, postings/norms are
    the union of every generation's segments tagged with a ``gen`` column,
    meta's num_docs/avg_doc_len come from the MERGED stats table, and
    per-term GLOBAL df is looked up in the merged term_stats (pruned to the
    query terms — a tiny parquet scan).  Scores are then exactly the scores
    a full rebuild would produce; only internal doc_id assignment (and thus
    score-tie order) differs."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.meta = seg.read_meta(index_dir)
        gens = seg.read_generations(index_dir)
        self.multi_gen = bool(gens) and len(gens) > 1
        if self.multi_gen:
            self.bases = {int(g["gen"]): int(g["base"]) for g in gens}
            p_parts, n_parts = [], []
            for g in gens:
                d = seg.gen_dir(index_dir, int(g["gen"]))
                tag = F.lit(int(g["gen"])).alias("gen")
                p_parts.append(
                    spark.read.parquet(seg.path_of(d, seg.POSTINGS))
                    .withColumn("gen", tag)
                )
                n_parts.append(
                    spark.read.parquet(seg.path_of(d, seg.NORMS))
                    .withColumn("gen", tag)
                )
            self.postings = p_parts[0]
            self.norms = n_parts[0]
            for p, n in zip(p_parts[1:], n_parts[1:]):
                self.postings = self.postings.unionByName(p)
                self.norms = self.norms.unionByName(n)
            merged = spark.read.parquet(
                seg.path_of(index_dir, seg.STATS_MERGED)
            ).collect()[0]
            self.meta = {
                **self.meta,
                "num_docs": int(merged["num_docs"]),
                "avg_doc_len": float(merged["avg_doc_len"] or 0.0),
                "total_terms": int(merged["total_terms"] or 0),
            }
            self._gens = gens
        else:
            self.bases = {0: 0}
            self._gens = None
            self.postings = spark.read.parquet(
                seg.path_of(index_dir, seg.POSTINGS)
            ).withColumn("gen", F.lit(0))
            self.norms = spark.read.parquet(
                seg.path_of(index_dir, seg.NORMS)
            ).withColumn("gen", F.lit(0))
        self.warmed = False
        self._df_cache: dict[str, int] = {}
        self._df_preloaded = False
        # driver-resident norms (pyspark Broadcast of {(gen, shard): dl
        # float64 array}) — set by warm() below the preload cap; enables
        # the single-input kernel plan in _apply_kernel.
        self._norms_bcast = None
        # analyzed-plan cache: (qtf items, k, kernel) -> top-k DataFrame.
        # A query service sees the same query texts repeatedly; rebuilding
        # + re-analyzing the identical cogroup plan cost ~45 ms/query
        # (profiled round 6).  The cache holds PLANS, never results —
        # every collect re-executes against the live relations — and dies
        # with the handle (engine.build/upsert/delete reset the handle).
        self._plan_cache: dict = {}
        # upsert/delete tombstones (GLOBAL doc_ids, sorted) — masked inside
        # the kernels; empty for indexes that never upserted (the common
        # case: zero overhead).  Stats keep counting tombstoned docs until
        # compaction (Lucene deleted-docs parity, see incremental.py).
        self.tombstones = np.array(
            seg.read_tombstones(index_dir), dtype=np.int64
        )

    def _term_stats_path(self) -> str:
        return seg.path_of(
            self.index_dir,
            seg.TERM_STATS_MERGED if self.multi_gen else seg.TERM_STATS,
        )

    def global_dfs(self, terms) -> dict[str, int]:
        """{term: GLOBAL df} from the term dictionary (format v2: postings
        carry no df — like Lucene's term-metadata/posting-data split).
        Missing terms get df=0 entries so repeated no-hit terms don't re-pay
        the lookup.  The lookup is a term-pruned scan of the terms-level
        table (In(term) pushdown) and is cached per handle; ``warm()``
        preloads the whole dictionary when it is small enough."""
        missing = [t for t in terms if t not in self._df_cache]
        if missing and not self._df_preloaded:
            rows = (
                self.spark.read.parquet(self._term_stats_path())
                .where(F.col("term").isin(missing))
                .select("term", "df")
                .collect()
            )
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_cache[t] = found.get(t, 0)
        return {t: self._df_cache.get(t, 0) for t in terms}

    def doc_meta_df(self) -> DataFrame:
        """doc_meta across generations with GLOBAL doc_ids; tombstoned
        (superseded/deleted) docs are filtered out — invisible everywhere."""
        if not self.multi_gen:
            return self._drop_tombstoned(
                self.spark.read.parquet(
                    seg.path_of(self.index_dir, seg.DOC_META)
                )
            )
        parts = []
        for g in self._gens:
            d = seg.gen_dir(self.index_dir, int(g["gen"]))
            parts.append(
                self.spark.read.parquet(seg.path_of(d, seg.DOC_META))
                .withColumn(
                    "doc_id", F.col("doc_id") + F.lit(int(g["base"]))
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return self._drop_tombstoned(out)

    def _drop_tombstoned(self, df: DataFrame) -> DataFrame:
        if not self.tombstones.size:
            return df
        return df.where(
            ~F.col("doc_id").isin([int(x) for x in self.tombstones])
        )

    def warm(
        self, postings: bool = True, preload_terms_cap: int = 2_000_000,
        preload_norms_docs_cap: int = 16_000_000,
    ) -> "IndexHandle":
        """Persist both sides CO-PARTITIONED by (gen, shard): the per-query
        cogroup then reuses the cached partitioning and runs with zero
        exchanges — the query job is scan(filter terms) -> kernel -> top-k.

        Also preloads the term dictionary (term -> global df) into the
        driver when it has <= ``preload_terms_cap`` entries, eliminating the
        per-query df-lookup job; at web-scale vocabularies the cap keeps the
        driver safe and lookups stay per-query term-pruned scans.

        When the corpus has <= ``preload_norms_docs_cap`` docs (int32 doc
        lengths: 16M docs = 128 MB of float64 arrays, the same order as a
        large broadcast join side), the norms additionally load into a
        driver-side broadcast keyed by (gen, shard), switching every query
        to the single-input kernel plan (_apply_kernel): norm bytes then
        cross the JVM->Python boundary once per worker instead of once per
        query per task.  Past the cap — the 100 TB case — queries keep the
        cogrouped distributed-norms plan unchanged."""
        # plans built pre-warm reference the unpersisted relations /
        # cogroup path; correct but slow — rebuild them against the
        # warmed layout
        self._plan_cache.clear()
        ts = self.spark.read.parquet(self._term_stats_path())
        if ts.count() <= preload_terms_cap:
            self._df_cache = {
                r["term"]: int(r["df"])
                for r in ts.select("term", "df").collect()
            }
            self._df_preloaded = True
        n = max(1, int(self.meta["n_shards"])) * max(1, len(self.bases))
        self.norms = self.norms.repartition(n, "gen", "shard").persist()
        self.norms.count()
        if int(self.meta.get("num_docs", 0)) * max(1, len(self.bases)) <= (
            preload_norms_docs_cap
        ):
            chunks: dict[tuple[int, int], list] = {}
            for r in self.norms.select(
                "gen", "shard", "chunk", "doc_lens"
            ).collect():
                chunks.setdefault((int(r["gen"]), int(r["shard"])), []).append(
                    (int(r["chunk"]), r["doc_lens"])
                )
            norms_data = {
                gs: np.concatenate(
                    [
                        np.frombuffer(b, dtype="<i4")
                        for _, b in sorted(rows)
                    ]
                ).astype(np.float64)
                for gs, rows in chunks.items()
            }
            # identical layout to _norms_dl (chunk-sorted concat, float64),
            # so scores and the worker contribution-cache keys are
            # bit-identical to the cogroup path
            self._norms_bcast = self.spark.sparkContext.broadcast(norms_data)
        if postings:
            if self._norms_bcast is not None:
                # single-input plan: FlatMapGroupsInPandas requires only
                # ClusteredDistribution(gen, shard), which a shard-keyed
                # RangePartitioning satisfies (ordering exprs ⊆
                # clustering exprs) — keying on the gen column would NOT:
                # single-generation relations carry gen as a literal, the
                # cached partitioning canonicalizes to hash(0, shard) /
                # range(0, shard), and the satisfies-check then fails,
                # putting an Exchange (+ AQE coalescing the tiny filtered
                # shuffle to ONE task — every shard kernel then ran
                # serially in one worker, measured 3.6x on heavy kernels)
                # back into every query.  Range > hash here: n distinct
                # shard values over n partitions land exactly one shard
                # per task (hash collisions at n keys / n partitions left
                # ~25% of tasks holding 2 serial kernels).
                self.postings = self.postings.repartitionByRange(
                    n, "shard"
                ).persist()
            else:
                # cogroup plan (past-cap corpora): both sides must stay
                # co-partitioned on the exact grouping keys
                self.postings = self.postings.repartition(
                    n, "gen", "shard"
                ).persist()
            self.postings.count()
            self.warmed = True
        return self

    def close(self) -> None:
        self.norms.unpersist()
        self.postings.unpersist()
        if self._norms_bcast is not None:
            self._norms_bcast.destroy()
            self._norms_bcast = None
        self._plan_cache.clear()


_KERNELS = {
    "exhaustive": _make_exhaustive_kernel,
    "wand_ref": _make_wand_kernel,
    "pruned": _make_pruned_kernel,
}

# DEMOTED (VERDICT r3 task #6): the doc-at-a-time Python WAND kernel is a
# TEST-ONLY ORACLE of the vectorized block-max kernels ('wand_ref' —
# per-posting Python pointer chasing, measured 3.5x slower than exhaustive
# at sf1.0, never a production win).  The public 'wand'/use_wand surface now
# resolves to 'pruned', the vectorized term-at-a-time block-max pruning
# kernel — same block-skip idea, same exactness guarantees, no Python loop.
_KERNEL_ALIASES = {"wand": "pruned"}

# Filter-context pushdown (B4): survivor sets up to this many doc_ids ship
# inside the kernel closure as a sorted int64 allow-mask (~2 MB at the cap —
# Spark broadcasts large task binaries once per executor).  Beyond the cap
# the score-everything + semi-join path is the better plan anyway: a filter
# keeping >256k docs is not selective.
_FILTER_PUSH_CAP = 1 << 18

# Function-score pushdown (B3): boost maps up to this many (doc_id, value)
# pairs ship inside the kernel closure as a sorted-id pair of int64/float64
# arrays (~2 MB at the cap).  Beyond it — a per-doc boost over a large
# corpus (recency over everything) — the score-everything + join path is
# the right plan: the boost table itself is distributed data there.
_BOOST_PUSH_CAP = 1 << 17


def _scored_df(
    handle: IndexHandle, qtf: dict, k: int, use_wand: bool,
    kernel_name: str | None = None,
    allow: np.ndarray | None = None,
    boost_arrs: tuple[np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    meta = handle.meta
    dfs = handle.global_dfs(qtf)
    n_cand = sum(dfs.get(t, 0) for t in qtf)
    if boost_arrs is not None:
        # a multiplier >1 can promote a doc past any unboosted block-max
        # upper bound, so pruning is inadmissible under pushed boost —
        # the exhaustive kernel scores every match and stays exact.
        kernel_name = "exhaustive"
    elif kernel_name is None and not use_wand:
        # adaptive default (all kernels are rank-identical, so this is a
        # pure cost choice): block-skip bookkeeping only pays once the
        # candidate pool dwarfs k — rare-term/no-hit queries never fill
        # the heap threshold, so every block stays competitive and the
        # per-block upper-bound pass is pure overhead
        kernel_name = "pruned" if n_cand > 16 * k else "exhaustive"
    kernel_name = kernel_name or ("wand" if use_wand else "exhaustive")
    make = _KERNELS[_KERNEL_ALIASES.get(kernel_name, kernel_name)]
    if allow is not None and allow.size == 0:
        return handle.spark.createDataFrame([], _RESULT_SCHEMA)
    extra = {"boost": boost_arrs} if boost_arrs is not None else {}
    kernel = make(
        dict(qtf), meta["num_docs"], meta["avg_doc_len"] or 1.0,
        meta["k1"], meta["b"], meta["shard_size"], k,
        bases=handle.bases, dfs=dfs,
        tombs=handle.tombstones if handle.tombstones.size else None,
        allow=allow, **extra,
    )
    # Execution-width choice (driver-side, from the same dfs the kernel
    # choice uses): a cache-served light query's whole kernel pass costs
    # less than one python-task round trip per shard, so running all
    # shard groups in ONE task (coalesce of the cached scan — a narrow
    # dependency, no shuffle) beats an n_shards-task wave; past the cap
    # the per-shard kernels are the cost and must run in parallel.
    # wand_ref bypasses the contribution cache (decode every time), so it
    # always spreads.
    resolved = _KERNEL_ALIASES.get(kernel_name, kernel_name)
    one_task = resolved != "wand_ref" and n_cand <= _COALESCE_CAP
    return _apply_kernel(
        handle, qtf, kernel, _RESULT_SCHEMA, one_task=one_task,
        wide=resolved == "wand_ref",
    )


# Candidate-postings volume below which a single-task kernel pass beats
# an n_shards-wide task wave (cache-served accumulate ~80 ns/posting vs
# ~10 ms/python-task dispatch: break-even around a million postings; set
# conservatively).  Driver-side estimate from exact global dfs.
_COALESCE_CAP = 1 << 19


def _apply_kernel(
    handle: IndexHandle, qtf: dict, kernel, schema, empty_fn=_empty_result,
    one_task: bool = False, wide: bool = False,
) -> DataFrame:
    """Run a per-(gen, shard) kernel over the term-pruned postings scan —
    shared by scoring, batching and profiling.

    Warmed handles with a driver-resident norms broadcast take the
    SINGLE-INPUT path: ``groupby(gen, shard).applyInPandas`` over postings
    only, with the shard's doc-length array fetched from the broadcast
    inside the task.  vs the cogroup plan this ships one Arrow stream per
    task instead of two (norm bytes stop crossing the JVM->Python boundary
    on every query), drops the second grouped sort, and needs no norms
    scan at all (guide §4: pass only the columns the function needs).
    The doc-length arrays are built with the exact `_norms_dl` layout, so
    kernel math and the cross-query contribution-cache keys are unchanged
    bit-for-bit.

    Handles without the broadcast (cold, or corpora past the warm()
    preload cap — the 100 TB case, where per-executor norm chunks must
    stay distributed) keep the cogroup plan: persisted+co-partitioned when
    warmed, semi-join-pruned norms when cold."""
    postings = handle.postings.where(F.col("term").isin(list(qtf)))
    bcast = handle._norms_bcast
    if bcast is not None:
        # Explicit kernel-stage width (REPARTITION_BY_NUM — AQE respects
        # it): the term-pruned rows are tiny (<= |terms| x shards posting
        # buffers), so this exchange costs ~nothing, while keeping the
        # SCAN+filter parallel across the cached partitions.  Width 1 for
        # cache-light queries (one python-task round trip instead of a
        # task per shard: the whole kernel pass is cheaper than the
        # wave); the group count for heavy ones (hash collisions then
        # occasionally co-locate two shard kernels, which is cheap when
        # they are contribution-cache-served — width n beat 4n by ~15%
        # on the cache-hot heavy suite); 4x the group count for ``wide``
        # kernels (wand_ref, which decodes every time: a collision there
        # serializes two 0.4 s kernels, so collision-freeness wins).
        # A coalesce(1) instead would serialize the scan itself
        # (measured +20 ms) — the narrow dependency folds the filter
        # into the single task.
        n_groups = max(1, int(handle.meta["n_shards"])) * len(handle.bases)
        w = 1 if one_task else (4 * n_groups if wide else n_groups)
        postings = postings.repartition(w, "gen", "shard")

        def run_bcast(key, p_pdf):
            dl = bcast.value.get((int(key[0]), int(key[1])))
            if p_pdf.empty or dl is None:
                return empty_fn()
            return kernel(key, p_pdf, dl)

        return postings.groupby("gen", "shard").applyInPandas(
            run_bcast, schema
        )

    def run_cogroup(key, p_pdf, n_pdf):
        if p_pdf.empty or n_pdf.empty:
            return empty_fn()
        return kernel(key, p_pdf, _norms_dl(n_pdf))

    if handle.warmed:
        # norms are cached + co-partitioned: scanning non-hit shards is free
        # and skipping the semi-join saves one broadcast job per query.
        norms = handle.norms
    else:
        # cold path (cluster scale): prune norm chunks to shards with hits
        hit_shards = postings.select("gen", "shard").distinct()
        norms = handle.norms.join(
            F.broadcast(hit_shards), ["gen", "shard"], "left_semi"
        )
    return (
        postings.groupby("gen", "shard")
        .cogroup(norms.groupby("gen", "shard"))
        .applyInPandas(run_cogroup, schema)
    )


def profile_query(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    k: int = 10,
    handle: IndexHandle | None = None,
) -> tuple[dict, DataFrame]:
    """Kernel introspection for one query: what would the default search
    path DO, and did block-max pruning fire?

    Returns ``(decision, stats_df)``:

    * ``decision`` — the driver-side adaptive-kernel choice replayed with
      its inputs: {kernel, n_candidates, threshold, k, terms: {term: df}}.
    * ``stats_df`` — the pruned kernel run in profile mode: one row per
      (gen, shard, term) with n_blocks / blocks_decoded / decode_mode
      ('seed' = heaviest term, full decode; 'full' = >50% blocks alive so
      cache-served full decode; 'selective' = block-skip fired) plus the
      alive-doc count and theta at decision time.  The stats run IS the
      real kernel (same closure, profile flag) — no simulation drift.

    This is the tuning loop for tail queries: a hot multi-term query whose
    rows all say decode_mode='full', alive_docs≈shard size has no skippable
    work (raise theta seeding / reorder terms); one that says 'selective'
    with small blocks_decoded is already pruned and its cost is elsewhere.
    """
    handle = handle or IndexHandle(spark, index_dir)
    meta = handle.meta
    qtf = analyze_query(query_text, meta["mode"])
    if not qtf:
        return (
            {"kernel": None, "n_candidates": 0,
             "threshold": 16 * k, "k": k, "terms": {}},
            spark.createDataFrame([], _PROFILE_SCHEMA),
        )
    dfs = handle.global_dfs(qtf)
    n_cand = sum(dfs.get(t, 0) for t in qtf)
    decision = {
        "kernel": "pruned" if n_cand > 16 * k else "exhaustive",
        "n_candidates": int(n_cand),
        "threshold": 16 * k,
        "k": k,
        "terms": {t: int(dfs.get(t, 0)) for t in qtf},
    }
    kernel = _make_pruned_kernel(
        dict(qtf), meta["num_docs"], meta["avg_doc_len"] or 1.0,
        meta["k1"], meta["b"], meta["shard_size"], k,
        bases=handle.bases, dfs=dfs,
        tombs=handle.tombstones if handle.tombstones.size else None,
        profile=True,
    )
    return decision, _apply_kernel(
        handle, qtf, kernel, _PROFILE_SCHEMA, empty_fn=_empty_profile
    )


def search(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    k: int = 10,
    use_wand: bool = False,
    include_meta: bool = False,
    filter_doc_ids: DataFrame | None = None,
    boost: DataFrame | None = None,
    handle: IndexHandle | None = None,
    kernel: str | None = None,
    _no_push: bool = False,
) -> DataFrame:
    """Top-k BM25. Returns DataFrame (doc_id, score [, repo/path/...]).

    ``_no_push`` (internal): skip the pushdown attempt and take the exact
    score-then-join path directly — used by the batch path for queries
    :func:`_prepare_pushdowns` already decided against, so the deciding
    collect is not paid twice.

    ``kernel``: None (default) picks adaptively by global df — 'pruned'
    (vectorized block-max skip) once the candidate pool dwarfs k, else
    'exhaustive' (decode-everything; rare-term queries never fill the heap
    threshold, so skip bookkeeping is pure overhead there).  'wand' (and
    ``use_wand=True``) is an alias of 'pruned': the doc-at-a-time Python
    WAND is demoted to the test-only oracle 'wand_ref' (per-posting Python
    — correct but never a production win; kept for its equivalence
    property).  All kernels are rank-identical (equivalence-tested), so
    the choice is cost-only.
    Filter paths push survivor sets <= _FILTER_PUSH_CAP into the kernel as
    an allow-mask (top-k of the filtered set directly, exact); boost maps
    <= _BOOST_PUSH_CAP with clean values (finite, nonzero, unique ids) push
    as a multiplier array applied inside the exhaustive kernel before its
    heap (exact: every match's boosted score is materialized).  Larger
    sets — and boost tables with duplicate ids / zero / non-finite values,
    whose edge semantics belong to the join — fall back to
    score-everything + join.

    ``boost``: optional (doc_id, _boost) DataFrame — multiplicative
    function-score applied AFTER BM25, exact either way: a per-doc
    multiplier can promote a doc past the unboosted per-shard heap cut, so
    boosted scoring is never pruned (B3 on the segment path, reference:
    backend/api/main.py:293-314).
    ``filter_doc_ids``: optional (doc_id) DataFrame — exact filter context
    (B4): membership only, never affects scores, applied before the limit.
    """
    handle = handle or IndexHandle(spark, index_dir)
    qtf = analyze_query(query_text, handle.meta["mode"])
    if not qtf:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    scored = None
    if filter_doc_ids is not None or boost is not None:
        # Pushdown: if the filter survivor set / boost map is small enough
        # to ship in the task closure, push it INTO the kernel — the
        # allow-mask is the tombstone mechanism inverted, the boost map a
        # multiplier array applied before the per-shard heap — so the heap
        # holds the top-k of the filtered/boosted set directly (exact),
        # instead of scoring every match with k = shard_size and
        # joining afterwards.  At 100 TB a selective filter (lang, repo,
        # date range) or a small promotion table turns a score-everything
        # pass into a top-k pass.  Oversized inputs (and boost edge values
        # whose semantics belong to the join) fall back to the exhaustive
        # score-then-join path below.
        if _no_push:
            allows, boost_arrs_m, fallback = {}, {}, {"q"}
        else:
            allows, boost_arrs_m, fallback = _prepare_pushdowns(
                {"q": filter_doc_ids} if filter_doc_ids is not None else {},
                {"q": boost} if boost is not None else {},
            )
        if not fallback:
            scored = _scored_df(
                handle, qtf, k, use_wand=False,
                allow=allows.get("q"), boost_arrs=boost_arrs_m.get("q"),
            )
    if scored is not None:
        pass
    elif filter_doc_ids is not None or boost is not None:
        # exactness requires scoring all matches (per-shard heaps can't know
        # the filter survivors / post-multiplier order).
        scored = _scored_df(
            handle, qtf, handle.meta["shard_size"], use_wand=False
        )
        if boost is not None:
            scored = (
                # no broadcast hint: boost tables range from tiny (a handful
                # of promoted docs) to per-doc (recency) — let AQE pick.
                scored.join(boost.select("doc_id", "_boost"), "doc_id", "left")
                .withColumn(
                    "score",
                    F.col("score") * F.coalesce(F.col("_boost"), F.lit(1.0)),
                )
                .drop("_boost")
            )
        if filter_doc_ids is not None:
            scored = scored.join(
                filter_doc_ids.select("doc_id"), "doc_id", "left_semi"
            )
    else:
        # Plan-skeleton cache (prepared-statement shape): a query service
        # sees the same texts repeatedly, and rebuilding + re-analyzing
        # the identical plan costs ~45 ms/query (build_df ~31 ms py4j +
        # first-collect Catalyst work, scripts/probe_query_phases.py).
        # Cached per handle and keyed on everything the plan closes over
        # — (qtf, k, kernel choice); dfs/tombstones/meta are fixed per
        # handle, and every index mutation replaces the handle.  Each
        # collect on the cached DataFrame re-executes the plan against
        # the live relations: plans are cached, results never.
        ck = (
            tuple(sorted(qtf.items())), k,
            kernel or ("wand" if use_wand else None), bool(use_wand),
        )
        cached = handle._plan_cache.get(ck)
        if cached is not None:
            return _with_meta(handle, cached, k) if include_meta else cached
        scored = _scored_df(
            handle, qtf, k, use_wand,
            kernel_name=kernel or ("wand" if use_wand else None),
        )
        topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if len(handle._plan_cache) >= 512:  # bounded: wholesale clear
            handle._plan_cache.clear()
        handle._plan_cache[ck] = topk
        return _with_meta(handle, topk, k) if include_meta else topk
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    if include_meta:
        topk = _with_meta(handle, topk, k)
    return topk


def _with_meta(handle: IndexHandle, topk: DataFrame, k: int) -> DataFrame:
    dm = handle.doc_meta_df()
    return (
        dm.join(F.broadcast(topk), "doc_id")
        .select("doc_id", "score", "repo", "path", "commit", "lang")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def search_all(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    handle: IndexHandle | None = None,
) -> DataFrame:
    """Score ALL matching docs (no limit) — used for exact filtered search
    and for oracle comparisons. Same kernels with k = shard_size."""
    handle = handle or IndexHandle(spark, index_dir)
    qtf = analyze_query(query_text, handle.meta["mode"])
    if not qtf:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    return _scored_df(handle, qtf, handle.meta["shard_size"], use_wand=False)


def _prepare_pushdowns(
    filters: dict[str, DataFrame],
    boosts: dict[str, DataFrame],
) -> tuple[dict, dict, set]:
    """Collect per-query filter/boost tables into kernel-pushable arrays.

    Returns (allows, boost_arrs, fallback_qids): ``allows[qid]`` is the
    sorted int64 allow-mask, ``boost_arrs[qid]`` the sorted (ids, vals)
    multiplier pair — same caps and edge rules as the single-query
    pushdown in :func:`search`; any query whose table is oversized or
    edge-valued lands in ``fallback_qids`` and must be served by the
    exact single-query join path instead."""
    allows: dict = {}
    boost_arrs: dict = {}
    fallback: set = set()
    # NULL doc_ids are dropped up front on BOTH paths' behalf: a NULL key
    # never matches on the join path either (left-semi / left join on
    # doc_id), so the pushed plan stays row-identical.
    for qid, fdf in filters.items():
        ids = [
            r[0] for r in fdf.select("doc_id")
            .where(F.col("doc_id").isNotNull())
            .limit(_FILTER_PUSH_CAP + 1).collect()
        ]
        if len(ids) <= _FILTER_PUSH_CAP:
            allows[qid] = np.unique(np.asarray(ids, dtype=np.int64))
        else:
            fallback.add(qid)
    for qid, bdf in boosts.items():
        if qid in fallback:
            continue
        rows = (
            bdf.select("doc_id", "_boost")
            .where(F.col("doc_id").isNotNull())
            .limit(_BOOST_PUSH_CAP + 1).collect()
        )
        if len(rows) > _BOOST_PUSH_CAP:
            fallback.add(qid)
            continue
        bids = np.asarray([r[0] for r in rows], dtype=np.int64)
        bvals = np.asarray(
            [1.0 if r[1] is None else float(r[1]) for r in rows],
            dtype=np.float64,
        )
        order = np.argsort(bids, kind="stable")
        bids, bvals = bids[order], bvals[order]
        if bids.size and (
            np.unique(bids).size != bids.size
            or not np.isfinite(bvals).all()
            or (bvals == 0.0).any()
        ):
            fallback.add(qid)
        else:
            boost_arrs[qid] = (bids, bvals)
    return allows, boost_arrs, fallback


def _make_batch_kernel(queries: dict, N: int, avgdl: float, k1: float,
                       b: float, shard_size: int, k: int,
                       bases=None, dfs=None, tombs=None,
                       allows=None, boosts=None):
    """Multi-query per-shard kernel: decode each needed posting list ONCE,
    accumulate into one score vector per query, bounded top-k per query.

    This is the eval-pipeline shape (reference runs 75 TREC topics per run,
    reference: backend/evaluation/evaluation_pipeline.py:122-150): one Spark
    job for the whole query set amortizes scheduling + scan over all
    queries instead of paying it per query.

    ``allows``/``boosts``: per-query pushed filter masks / boost
    multiplier pairs from :func:`_prepare_pushdowns` — each applied to its
    query's score vector before that query's per-shard heap (same
    exactness argument as the single-query kernel: the batch kernel is
    exhaustive, every match's final score is materialized)."""
    # term -> [(query_id, qtf*idf placeholder computed with df later)]
    all_terms = sorted({t for q in queries.values() for t in q})
    bases = bases or {0: 0}
    allows = allows or {}
    boosts = boosts or {}

    def kernel(key, p_pdf: pd.DataFrame, dl: np.ndarray) -> pd.DataFrame:
        empty = _empty_batch_result()
        gen, shard = int(key[0]), int(key[1])
        base = shard * shard_size
        by_term = _postings_by_term(p_pdf, need_df=dfs is None)
        tl = (
            _tomb_local(tombs, base + bases[gen], dl.size)
            if tombs is not None and tombs.size
            else None
        )
        # decode + per-term normalized contribution, shared across queries
        # (and across batch invocations via the worker contribution cache)
        dl_tok = _dl_token(dl)
        contrib: dict[str, tuple[np.ndarray, np.ndarray, float]] = {}
        for term in all_terms:
            row = by_term.get(term)
            if row is None:
                continue
            off, norm = _contrib_cached(
                bytes(row[0]), base, dl, avgdl, k1, b, dl_tok
            )
            contrib[term] = (
                off, norm,
                _idf(N, dfs[term] if dfs is not None else row[1]),
            )
        frames = []
        for qid, qtf in queries.items():
            acc = np.zeros(dl.size, dtype=np.float64)
            for term in sorted(qtf):  # fixed order == oracle
                c = contrib.get(term)
                if c is None:
                    continue
                off, norm_tf, idf = c
                acc[off] += (qtf[term] * idf) * norm_tf
            if tl is not None and tl.size:
                acc[tl] = 0.0
            al = allows.get(qid)
            if al is not None:
                keep = np.zeros(dl.size, dtype=bool)
                keep[_tomb_local(al, base + bases[gen], dl.size)] = True
                acc[~keep] = 0.0
            bst = boosts.get(qid)
            if bst is not None:
                bids, bvals = bst
                gb = base + bases[gen]
                lo = int(np.searchsorted(bids, gb))
                hi = int(np.searchsorted(bids, gb + dl.size))
                if hi > lo:
                    acc[(bids[lo:hi] - gb).astype(np.int64)] *= bvals[lo:hi]
            top = _topk_from_scores(acc, base + bases[gen], k)
            if len(top):
                top.insert(0, "query_id", qid)
                frames.append(top)
        return pd.concat(frames, ignore_index=True) if frames else empty

    return kernel


def _scored_many(
    spark: SparkSession,
    index_dir: str,
    query_texts: dict[str, str],
    k: int,
    handle: IndexHandle | None,
    allows: dict | None = None,
    boost_arrs: dict | None = None,
) -> DataFrame | None:
    """Shared body of :func:`search_many` / :func:`search_many_rows`:
    per-(gen, shard) batch-kernel scoring — one postings scan for the
    union of all query terms, each posting list decoded once per shard
    for the whole batch — with per-shard per-query top-k output
    (query_id, doc_id, score).  None when no query has tokens."""
    handle = handle or IndexHandle(spark, index_dir)
    meta = handle.meta
    queries = {
        qid: dict(analyze_query(text, meta["mode"]))
        for qid, text in query_texts.items()
    }
    queries = {qid: q for qid, q in queries.items() if q}
    if not queries:
        return None
    terms = sorted({t for q in queries.values() for t in q})
    kernel = _make_batch_kernel(
        queries, meta["num_docs"], meta["avg_doc_len"] or 1.0,
        meta["k1"], meta["b"], meta["shard_size"], k,
        bases=handle.bases, dfs=handle.global_dfs(terms),
        tombs=handle.tombstones if handle.tombstones.size else None,
        allows=allows, boosts=boost_arrs,
    )
    return _apply_kernel(
        handle, {t: 1 for t in terms}, kernel,
        "query_id string, doc_id long, score double",
        empty_fn=_empty_batch_result,
    )


def _fallback_topk_df(
    spark: SparkSession,
    index_dir: str,
    fb_qids: list[str],
    query_texts: dict[str, str],
    k: int,
    handle: IndexHandle,
    filters: dict[str, DataFrame] | None,
    boosts: dict[str, DataFrame] | None,
) -> DataFrame | None:
    """Exact score-then-join path for the whole FALLBACK set (queries
    whose filter/boost tables exceeded the push caps or carry
    join-defined edge values) as ONE Spark job.

    Round-4 verdict #3: the per-query ``search(..., _no_push=True)``
    driver loop made a batch with Q oversized-table queries degrade to Q
    sequential jobs.  Here the batch kernel scores ALL matches for every
    fallback query in one pass (k = shard_size, the exactness bound the
    single-query path uses), the per-query boost/filter tables are
    unioned with a ``query_id`` key and joined once, and the per-query
    top-k is one Window.  Row-identical to the old loop: the same left
    boost join (duplicate ids duplicate rows, NULL multipliers coalesce
    to 1.0), the same left-semi filter, the same (score desc, doc_id
    asc) order.  Returns (query_id, doc_id, score, rank) or None when no
    fallback query has tokens."""
    from functools import reduce

    from pyspark.sql import Window

    fb_q = {qid: query_texts[qid] for qid in fb_qids}
    scored = _scored_many(
        spark, index_dir, fb_q, handle.meta["shard_size"], handle
    )
    if scored is None:
        return None
    b_parts = [
        boosts[qid].select(
            F.lit(qid).alias("query_id"), "doc_id", "_boost"
        )
        for qid in fb_qids
        if boosts and qid in boosts
    ]
    if b_parts:
        ball = reduce(DataFrame.unionByName, b_parts)
        scored = (
            scored.join(ball, ["query_id", "doc_id"], "left")
            .withColumn(
                "score",
                F.col("score") * F.coalesce(F.col("_boost"), F.lit(1.0)),
            )
            .drop("_boost")
        )
    f_parts = [
        filters[qid].select(F.lit(qid).alias("query_id"), "doc_id")
        for qid in fb_qids
        if filters and qid in filters
    ]
    if f_parts:
        # queries WITHOUT a filter table must keep all their rows, but a
        # where/union split would re-evaluate the kernel subtree once per
        # branch (two postings passes — caught by the EXPLAIN audit).
        # One left join against the DISTINCT allow-lists (distinct ==
        # left-semi row semantics) + a keep predicate costs one pass.
        fall = reduce(DataFrame.unionByName, f_parts).distinct()
        has_f = sorted(
            {qid for qid in fb_qids if filters and qid in filters}
        )
        scored = (
            scored.join(
                fall.withColumn("_allow", F.lit(True)),
                ["query_id", "doc_id"], "left",
            )
            .where(
                F.col("_allow").isNotNull()
                | ~F.col("query_id").isin(has_f)
            )
            .drop("_allow")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def search_many(
    spark: SparkSession,
    index_dir: str,
    query_texts: dict[str, str],
    k: int = 10,
    handle: IndexHandle | None = None,
    filters: dict[str, DataFrame] | None = None,
    boosts: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Top-k for a SET of queries in one distributed job.

    Returns DataFrame (query_id, doc_id, score, rank), rank-identical per
    query to :func:`search`.  Postings are scanned once for the union of
    all query terms; per-shard work decodes each posting list once and
    reuses the normalized tf vector across queries.

    ``filters``/``boosts``: optional per-query filter-context / boost
    tables keyed by query_id (B4/B3 on the batch path — the filtered-eval
    shape: 75 topics, each against its own cohort).  Pushable tables ride
    the batch kernel (per-query allow-mask / multiplier array, exact);
    queries whose tables exceed the push caps or carry join-defined edge
    values are served by the exact single-query path and unioned back in."""
    from pyspark.sql import Window

    handle = handle or IndexHandle(spark, index_dir)
    allows, boost_arrs, fallback = _prepare_pushdowns(
        filters or {}, boosts or {}
    )
    batch_q = {q: t for q, t in query_texts.items() if q not in fallback}
    scored = _scored_many(
        spark, index_dir, batch_q, k, handle, allows, boost_arrs
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    if scored is None:
        out = spark.createDataFrame(
            [], "query_id string, doc_id long, score double, rank int"
        )
    else:
        out = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
    fb = sorted(fallback & set(query_texts))
    if fb:
        fb_out = _fallback_topk_df(
            spark, index_dir, fb, query_texts, k, handle, filters, boosts
        )
        if fb_out is not None:
            out = out.unionByName(fb_out)
    return out


def search_many_rows(
    spark: SparkSession,
    index_dir: str,
    query_texts: dict[str, str],
    k: int = 10,
    handle: IndexHandle | None = None,
    filters: dict[str, DataFrame] | None = None,
    boosts: dict[str, DataFrame] | None = None,
) -> dict[str, list[tuple[int, float]]]:
    """Serving-shape twin of :func:`search_many`: same single batch-kernel
    job, but the global per-query top-k merge runs on the DRIVER over the
    collected per-shard candidates instead of a Window exchange.

    The kernel output is bounded — ≤ k rows per (gen, shard, query) — so
    the collect is ≤ n_shards · n_gens · n_queries · k tiny rows (the
    Lucene/OpenSearch coordinating-node merge shape: shards return their
    local top-k, the coordinator heap-merges).  Cutting the exchange +
    window stage roughly halves the per-batch fixed cost, which is the
    Amdahl term that caps concurrent-serving executor scaling.

    Returns {query_id: [(doc_id, score)]} ordered by (score desc, doc_id
    asc), rank-identical to :func:`search_many` (property-tested).
    ``filters``/``boosts``: per-query pushdowns, same contract as
    :func:`search_many`."""
    handle = handle or IndexHandle(spark, index_dir)
    allows, boost_arrs, fallback = _prepare_pushdowns(
        filters or {}, boosts or {}
    )
    out: dict[str, list[tuple[int, float]]] = {q: [] for q in query_texts}
    fb = sorted(fallback & set(query_texts))
    if fb:
        # one distributed job for the whole fallback set (not Q serial
        # jobs); its output is already per-query top-k, so the collect
        # stays bounded at |fb| * k rows
        fb_df = _fallback_topk_df(
            spark, index_dir, fb, query_texts, k, handle, filters, boosts
        )
        if fb_df is not None:
            fb_pdf = (
                fb_df.select("query_id", "doc_id", "score", "rank")
                .toArrow().to_pandas()
                .sort_values(["query_id", "rank"])
            )
            for qid, doc_id, score, _rank in fb_pdf.itertuples(index=False):
                out[qid].append((int(doc_id), float(score)))
    batch_q = {q: t for q, t in query_texts.items() if q not in fallback}
    scored = _scored_many(
        spark, index_dir, batch_q, k, handle, allows, boost_arrs
    )
    if scored is None:
        return out
    # Arrow collect + one vectorized sort: at Q queries the candidate set
    # is Q · n_shards · k rows — per-Row python objects would put a
    # Q-linear serial term right back on the driver.
    pdf = scored.toArrow().to_pandas()
    pdf = pdf.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True],
        kind="mergesort",
    ).groupby("query_id", sort=False).head(k)
    for qid, doc_id, score in pdf.itertuples(index=False):
        out[qid].append((int(doc_id), float(score)))
    return out
