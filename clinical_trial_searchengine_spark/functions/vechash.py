"""Vectorized batch hashing kernels for the dedup / text-analysis UDFs.

Round-4 verdict: the MinHash/SimHash/lang-id signature UDFs were the last
per-row Python on any hot path — each looped docs in Python and hashed
shingles/tokens one `str` object at a time.  At 100 TB the MinHash
signature pass is the dedup bottleneck, so these kernels re-express the
same math as numpy passes over the raw Arrow UTF-8 buffers:

- :func:`crc32_many` — zlib-compatible CRC32 of MANY byte slices in
  lockstep (one table-lookup pass per byte POSITION, rows sorted by
  length so total work is O(total bytes), long-tail rows punted to
  zlib.crc32 directly).
- :func:`split_ascii_lower_ws` — `text.lower().split()` for all-ASCII
  rows as LUT/boundary passes over the concatenated buffer (the twin of
  ``analysis._tokenize_ascii_bytes``, which handles the `[a-z0-9]+`
  regex tokenizer the same way), dictionary-encoded so downstream
  per-token work is vocabulary-sized.
- batch kernels for MinHash signatures, SimHash fingerprints, language
  ID and the winnowing fingerprint that are BIT-IDENTICAL to the
  original per-doc loops (asserted in tests/test_analysis.py) — the
  per-doc loops survive only as `*_ref` fallbacks for non-ASCII rows.

Everything here is occurrence- or vocabulary-sized numpy; no per-row
Python runs for ASCII batches (the synthetic corpus and any source-code
corpus are ASCII-dominated; non-ASCII rows fall back row-wise, not
batch-wise, so one emoji doc does not de-vectorize its neighbours).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# CRC32 (zlib polynomial), vectorized across many strings
# ---------------------------------------------------------------------------

_CRC_TABLE: np.ndarray | None = None
# rows longer than this leave the lockstep loop (each extra byte position
# costs a Python-level iteration; a single 100 KB token string would
# otherwise serialize the whole batch) and hash via zlib directly
_LOCKSTEP_MAX_LEN = 512


def _crc_table() -> np.ndarray:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        t = np.empty(256, dtype=np.uint32)
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ (0xEDB88320 if (c & 1) else 0)
            t[i] = c
        _CRC_TABLE = t
    return _CRC_TABLE


def crc32_many(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """CRC32 (== ``zlib.crc32``) of ``data[starts[i]:starts[i]+lens[i]]``
    for every i, vectorized: rows are sorted by length descending and the
    CRC state of all still-active rows advances one byte position per
    numpy pass, so total work is O(sum(lens)) table gathers."""
    table = _crc_table()
    n = len(starts)
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    out = np.empty(n, dtype=np.uint32)

    long_rows = np.flatnonzero(lens > _LOCKSTEP_MAX_LEN)
    if len(long_rows):
        mem = data if isinstance(data, memoryview) else memoryview(data)
        for i in long_rows:
            s = int(starts[i])
            out[i] = zlib.crc32(mem[s : s + int(lens[i])])
        keep = lens <= _LOCKSTEP_MAX_LEN
        short_idx = np.flatnonzero(keep)
        starts, lens = starts[short_idx], lens[short_idx]
    else:
        short_idx = None

    order = np.argsort(-lens, kind="stable")
    s_sorted = starts[order]
    l_sorted = lens[order]
    m = len(order)
    crc = np.full(m, 0xFFFFFFFF, dtype=np.uint32)
    if m:
        asc = l_sorted[::-1]  # ascending
        maxlen = int(l_sorted[0])
        for j in range(maxlen):
            # rows still holding a byte at position j (sorted desc => prefix)
            a = m - int(np.searchsorted(asc, j, side="right"))
            if a == 0:
                break
            b = data[s_sorted[:a] + j]
            crc[:a] = table[(crc[:a] ^ b) & 0xFF] ^ (crc[:a] >> 8)
    crc ^= np.uint32(0xFFFFFFFF)
    res = np.empty(m, dtype=np.uint32)
    res[order] = crc
    if short_idx is None:
        out[:] = res
    else:
        out[short_idx] = res
    return out


# ---------------------------------------------------------------------------
# ASCII `lower().split()` batch tokenizer (Python str.split semantics)
# ---------------------------------------------------------------------------

# Python str.split() whitespace within ASCII: chr(i).isspace()
_PY_WS = (9, 10, 11, 12, 13, 28, 29, 30, 31, 32)
_WS_LUTS: tuple[np.ndarray, np.ndarray] | None = None


def _ws_luts() -> tuple[np.ndarray, np.ndarray]:
    global _WS_LUTS
    if _WS_LUTS is None:
        lower = np.arange(256, dtype=np.uint8)
        lower[ord("A") : ord("Z") + 1] += 32
        tokchar = np.ones(256, dtype=bool)
        tokchar[list(_PY_WS)] = False
        _WS_LUTS = (lower, tokchar)
    return _WS_LUTS


def ascii_row_mask(strings) -> np.ndarray:
    """Boolean mask of rows whose UTF-8 bytes are pure ASCII (vectorized
    over the shared data buffer; no per-row scan)."""
    import pyarrow as pa

    n = len(strings)
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    bufs = strings.buffers()
    off_all = np.frombuffer(bufs[1], dtype=np.int32)
    off = off_all[strings.offset : strings.offset + n + 1].astype(np.int64)
    data_all = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    data = data_all[off[0] : off[-1]]
    mask = np.ones(n, dtype=bool)
    bad = np.flatnonzero(data >= 0x80)
    if len(bad):
        rows = np.searchsorted(off - off[0], bad, side="right") - 1
        mask[np.unique(rows)] = False
    return mask


def split_ascii_lower_ws(strings):
    """``text.lower().split()`` for an all-ASCII, null-free Arrow
    StringArray, as vectorized buffer passes.  Returns
    ``(doc_idx, codes, dictionary, doc_tok_counts)`` with the token stream
    dictionary-encoded (caller does per-token work at vocabulary size), or
    None when the batch has non-ASCII bytes (callers pre-filter with
    :func:`ascii_row_mask`, so None only means "caller did not")."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lower_lut, tok_lut = _ws_luts()
    n = len(strings)
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if strings.type != pa.string():
        strings = strings.cast(pa.string())
    bufs = strings.buffers()
    off_all = np.frombuffer(bufs[1], dtype=np.int32)
    off = off_all[strings.offset : strings.offset + n + 1].astype(np.int64)
    data_all = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    data = data_all[off[0] : off[-1]]
    if data.size and int(data.max()) >= 0x80:
        return None
    lowered = lower_lut[data]
    mask = tok_lut[lowered]
    d = np.diff(mask.view(np.int8), prepend=np.int8(0), append=np.int8(0))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    # force token breaks at document boundaries (same guard as
    # analysis._tokenize_ascii_bytes)
    bnd = (off - off[0])[1:-1]
    bnd = np.unique(bnd[(bnd > 0) & (bnd < data.size)])
    if bnd.size:
        crossing = bnd[mask[bnd - 1] & mask[bnd]]
        if crossing.size:
            starts = np.sort(np.concatenate((starts, crossing)))
            ends = np.sort(np.concatenate((ends, crossing)))
    if not len(starts):
        z = np.zeros(0, dtype=np.int64)
        return z, z, pa.array([], type=pa.string()), np.zeros(n, np.int64)
    tok_lens = ends - starts
    tok_data = lowered[mask]
    tok_off = np.zeros(len(starts) + 1, dtype=np.int32)
    np.cumsum(tok_lens, out=tok_off[1:])
    tok_arr = pa.StringArray.from_buffers(
        len(starts),
        pa.py_buffer(tok_off.tobytes()),
        pa.py_buffer(tok_data.tobytes()),
    )
    doc_idx = np.searchsorted(off - off[0], starts, side="right") - 1
    doc_idx = doc_idx.astype(np.int64)
    denc = pc.dictionary_encode(tok_arr)
    counts = np.bincount(doc_idx, minlength=n).astype(np.int64)
    return doc_idx, denc.indices.to_numpy().astype(np.int64), denc.dictionary, counts


def dict_bytes(dictionary) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(data, starts, lens) byte view of an Arrow string dictionary."""
    import pyarrow as pa

    if isinstance(dictionary, pa.ChunkedArray):
        dictionary = dictionary.combine_chunks()
    bufs = dictionary.buffers()
    off_all = np.frombuffer(bufs[1], dtype=np.int32)
    off = off_all[
        dictionary.offset : dictionary.offset + len(dictionary) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return data, off[:-1], np.diff(off)


# ---------------------------------------------------------------------------
# MinHash signatures (bit-identical to the per-doc reference loop)
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)
# sub-chunk bound: peak transient is ~SHINGLE_CHUNK x PERM_CHUNK x 8 bytes
_SHINGLE_CHUNK = 262_144
_PERM_CHUNK = 32


def minhash_signatures_ascii(
    strings, a: np.ndarray, b: np.ndarray, n: int
) -> np.ndarray | None:
    """MinHash signature matrix (n_docs x num_hashes int64) for an
    all-ASCII batch; None on non-ASCII (caller pre-filters rows).

    Same values as the reference loop: shingle = n consecutive
    `[a-z0-9]+` tokens joined by ' ', h = crc32(shingle utf-8),
    sig_k = min over shingles of (a_k*h + b_k) mod (2^61-1) in wrapping
    uint64, all-zeros when a doc has < n tokens.  Shingle strings are
    never materialized: every shingle is a contiguous slice of the doc's
    space-joined token stream, so hashing is :func:`crc32_many` over one
    rebuilt buffer.  Duplicate shingles need no dedup — the min is
    unaffected — which removes the reference's per-doc set() entirely."""
    from clinical_trial_searchengine_spark.functions.analysis import (
        _tokenize_ascii_bytes,
    )

    n_docs = len(strings)
    num_hashes = len(a)
    sig = np.zeros((n_docs, num_hashes), dtype=np.int64)
    tok = _tokenize_ascii_bytes(strings)
    if tok is None:
        return None
    doc_idx, codes, dictionary = tok
    if not len(codes):
        return sig
    ddata, dstarts, dlens = dict_bytes(dictionary)
    tok_lens = dlens[codes]
    # rebuild the space-joined token stream: tokens back-to-back, one
    # trailing space each (shingles never include the final space)
    out_start = np.zeros(len(codes) + 1, dtype=np.int64)
    np.cumsum(tok_lens + 1, out=out_start[1:])
    total = int(out_start[-1])
    stream = np.full(total, ord(" "), dtype=np.uint8)
    cum = np.zeros(len(codes) + 1, dtype=np.int64)
    np.cumsum(tok_lens, out=cum[1:])
    # within-token byte offset for every token byte in the stream
    within = np.arange(int(cum[-1]), dtype=np.int64) - np.repeat(
        cum[:-1], tok_lens
    )
    dst = np.repeat(out_start[:-1], tok_lens) + within
    src = np.repeat(dstarts[codes], tok_lens) + within
    stream[dst] = ddata[src]
    # shingle start tokens: t where token t..t+n-1 all in the same doc
    if len(codes) < n:
        return sig
    ok = doc_idx[: len(codes) - n + 1] == doc_idx[n - 1 :]
    t0 = np.flatnonzero(ok)
    if not len(t0):
        return sig
    sh_start = out_start[t0]
    sh_len = out_start[t0 + n - 1] + tok_lens[t0 + n - 1] - sh_start
    sh_doc = doc_idx[t0]
    hs = crc32_many(stream, sh_start, sh_len).astype(np.uint64)
    # dedup twice before the expensive permutation math: (doc, hash)
    # pairs (the reference's per-doc set()), then GLOBAL unique hashes —
    # (a*h+b) mod M runs once per distinct crc in the whole batch, and
    # per-doc mins gather from that table.  Repetitive corpora (tiny
    # vocabularies, boilerplate) collapse by orders of magnitude.
    combo = (sh_doc << np.int64(32)) | hs.astype(np.int64)
    u = np.unique(combo)
    u_doc = (u >> np.int64(32)).astype(np.int64)
    u_hash = (u & np.int64(0xFFFFFFFF)).astype(np.uint64)
    n_pairs = len(u_hash)
    # Repetitive corpora (boilerplate, tiny vocabularies) repeat the same
    # shingle across MANY docs: when globally-unique hashes are <=1/4 of
    # the (doc, hash) pairs and the permuted table chunk fits in cache,
    # compute the permutations once per unique hash and GATHER per-doc
    # values from the table (measured 2.6x on a 12-word-vocab corpus).
    # Otherwise gathers into a >cache table lose to streaming arithmetic
    # and the fold path below wins (measured 8x on an all-unique corpus).
    g_hash = np.unique(u_hash)
    if len(g_hash) * 4 <= n_pairs and len(g_hash) <= 131072:
        inv = np.searchsorted(g_hash, u_hash)
        return _minhash_from_unique(
            sig, g_hash, inv, u_doc, a, b, num_hashes
        )
    # perms x pairs layout, doubly blocked: every op streams
    # contiguously, pair blocks keep the ~3 working buffers inside L3
    # (measured 2x vs one full-width pass), and all arithmetic is
    # in-place into preallocated buffers (measured 2.3x vs expression
    # temporaries).  The per-doc min reduces along the contiguous axis.
    cap = min(_SHINGLE_CHUNK // 4, max(n_pairs, 1))
    Y = np.empty((_PERM_CHUNK, cap), np.uint64)
    Sh = np.empty((_PERM_CHUNK, cap), np.uint64)
    Mk = np.empty((_PERM_CHUNK, cap), bool)
    lo = 0
    while lo < n_pairs:
        hi = min(lo + cap, n_pairs)
        while hi < n_pairs and u_doc[hi] == u_doc[hi - 1]:
            hi += 1  # never split a doc across blocks
        w = hi - lo
        if w > Y.shape[1]:  # one giant doc outgrew the block
            Y = np.empty((_PERM_CHUNK, w), np.uint64)
            Sh = np.empty((_PERM_CHUNK, w), np.uint64)
            Mk = np.empty((_PERM_CHUNK, w), bool)
        h_c = u_hash[lo:hi][None, :]
        d_c = u_doc[lo:hi]
        grp = np.flatnonzero(np.diff(d_c, prepend=np.int64(-1)) != 0)
        gd = d_c[grp]
        for p in range(0, num_hashes, _PERM_CHUNK):
            q = min(p + _PERM_CHUNK, num_hashes)
            k = q - p
            Yv, Sv, Mv = Y[:k, :w], Sh[:k, :w], Mk[:k, :w]
            np.multiply(h_c, a[p:q, None], out=Yv)
            np.add(Yv, b[p:q, None], out=Yv)
            # exact y % (2^61-1) via the Mersenne fold: y = hi*2^61+lo
            # == hi + lo (mod M); one conditional subtract finishes it
            np.right_shift(Yv, np.uint64(61), out=Sv)
            np.bitwise_and(Yv, _MERSENNE, out=Yv)
            np.add(Yv, Sv, out=Yv)
            np.greater_equal(Yv, _MERSENNE, out=Mv)
            np.subtract(Yv, _MERSENNE, out=Yv, where=Mv)
            mins = np.minimum.reduceat(Yv, grp, axis=1)
            sig[gd, p:q] = mins.T.astype(np.int64)
        lo = hi
    return sig


def _minhash_from_unique(
    sig: np.ndarray,
    g_hash: np.ndarray,
    inv: np.ndarray,
    u_doc: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    num_hashes: int,
) -> np.ndarray:
    """Gather-path core: permute each globally-unique hash once, then
    per-doc mins gather from the (perm-chunk x unique) table."""
    n_pairs = len(inv)
    U = len(g_hash)
    T = np.empty((_PERM_CHUNK, U), np.uint64)
    Sv = np.empty((_PERM_CHUNK, U), np.uint64)
    Mv = np.empty((_PERM_CHUNK, U), bool)
    blk = min(_SHINGLE_CHUNK // 4, max(n_pairs, 1))
    G = np.empty((_PERM_CHUNK, blk), np.uint64)
    for p in range(0, num_hashes, _PERM_CHUNK):
        q = min(p + _PERM_CHUNK, num_hashes)
        k = q - p
        Tk = T[:k]
        np.multiply(g_hash[None, :], a[p:q, None], out=Tk)
        np.add(Tk, b[p:q, None], out=Tk)
        np.right_shift(Tk, np.uint64(61), out=Sv[:k])
        np.bitwise_and(Tk, _MERSENNE, out=Tk)
        np.add(Tk, Sv[:k], out=Tk)
        np.greater_equal(Tk, _MERSENNE, out=Mv[:k])
        np.subtract(Tk, _MERSENNE, out=Tk, where=Mv[:k])
        lo = 0
        while lo < n_pairs:
            hi = min(lo + blk, n_pairs)
            while hi < n_pairs and u_doc[hi] == u_doc[hi - 1]:
                hi += 1
            w = hi - lo
            if w > G.shape[1]:
                G = np.empty((_PERM_CHUNK, w), np.uint64)
            d_c = u_doc[lo:hi]
            grp = np.flatnonzero(np.diff(d_c, prepend=np.int64(-1)) != 0)
            np.take(Tk, inv[lo:hi], axis=1, out=G[:k, :w])
            mins = np.minimum.reduceat(G[:k, :w], grp, axis=1)
            sig[d_c[grp], p:q] = mins.T.astype(np.int64)
            lo = hi
    return sig


# ---------------------------------------------------------------------------
# SimHash fingerprints
# ---------------------------------------------------------------------------

_OCC_CHUNK = 262_144


def simhash_ascii(strings, md5_cache: dict) -> np.ndarray | None:
    """64-bit SimHash per doc (int64 array) for an all-ASCII batch; None
    on non-ASCII.  Identical to the reference loop: token = lower().split()
    word, token hash = first 8 md5 bytes little-endian, votes accumulate
    tf*(2*bit-1) — summed per OCCURRENCE here (tf-weighting and
    per-occurrence summing are the same integer sum).  md5 runs once per
    vocabulary entry (cached across batches), not per occurrence."""
    import hashlib

    split = split_ascii_lower_ws(strings)
    if split is None:
        return None
    doc_idx, codes, dictionary, _counts = split
    n_docs = len(strings)
    out = np.zeros(n_docs, dtype=np.int64)
    if not len(codes):
        return out
    vocab = dictionary.to_pylist()
    hvals = np.empty(len(vocab), dtype=np.uint64)
    for i, w in enumerate(vocab):  # vocabulary-sized, cached
        v = md5_cache.get(w)
        if v is None:
            v = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
            md5_cache[w] = v
        hvals[i] = v
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hvals[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
        np.uint8
    )  # vocab x 64
    votes = np.zeros((n_docs, 64), dtype=np.int64)
    occ_n = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    lo = 0
    while lo < len(codes):
        hi = min(lo + _OCC_CHUNK, len(codes))
        while hi < len(codes) and doc_idx[hi] == doc_idx[hi - 1]:
            hi += 1
        d_c = doc_idx[lo:hi]
        grp = np.flatnonzero(np.diff(d_c, prepend=np.int64(-1)) != 0)
        ones = np.add.reduceat(
            bits[codes[lo:hi]].astype(np.int32), grp, axis=0
        )
        votes[d_c[grp]] += ones
        lo = hi
    votes = 2 * votes - occ_n[:, None]
    h64 = np.packbits(
        (votes > 0).astype(np.uint8), axis=1, bitorder="little"
    ).view(np.uint64)[:, 0]
    nonempty = occ_n > 0
    out[nonempty] = h64[nonempty].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# Language ID
# ---------------------------------------------------------------------------


def lang_id_ascii(strings, profiles: dict[str, set]) -> list[str] | None:
    """Heuristic language id per doc for an all-ASCII batch; None on
    non-ASCII.  Identical to the reference loop: distinct words among the
    FIRST 200 whitespace tokens, hit count per sorted-language profile,
    strict-argmax with 'und' when nothing matches."""
    split = split_ascii_lower_ws(strings)
    if split is None:
        return None
    doc_idx, codes, dictionary, counts = split
    n_docs = len(strings)
    langs = sorted(profiles)
    if not len(codes):
        return ["und"] * n_docs
    # position within doc, keep first 200 tokens
    doc_start = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=doc_start[1:])
    pos = np.arange(len(codes), dtype=np.int64) - doc_start[doc_idx]
    keep = pos < 200
    d_k, c_k = doc_idx[keep], codes[keep]
    # distinct (doc, token)
    combo = d_k * np.int64(len(dictionary)) + c_k
    uniq = np.unique(combo)
    u_doc = uniq // np.int64(len(dictionary))
    u_code = uniq % np.int64(len(dictionary))
    vocab = dictionary.to_pylist()
    lang_mask = np.zeros((len(vocab), len(langs)), dtype=bool)
    for li, lang in enumerate(langs):
        prof = profiles[lang]
        for vi, w in enumerate(vocab):
            if w in prof:
                lang_mask[vi, li] = True
    hits = np.zeros((n_docs, len(langs)), dtype=np.int64)
    for li in range(len(langs)):
        sel = lang_mask[u_code, li]
        if sel.any():
            hits[:, li] = np.bincount(u_doc[sel], minlength=n_docs)
    best = np.argmax(hits, axis=1)  # first max == sorted-order tie-break
    best_n = hits[np.arange(n_docs), best]
    return [
        langs[b] if bn > 0 else "und" for b, bn in zip(best, best_n)
    ]


# ---------------------------------------------------------------------------
# Winnowing fingerprint (rolling Rabin-Karp over word hashes)
# ---------------------------------------------------------------------------


def rolling_fingerprint_ascii(strings, window: int) -> np.ndarray | None:
    """Winnowing-style fingerprint per doc for an all-ASCII batch; None on
    non-ASCII.  Identical to the reference loop: word hash = crc32 (here
    once per vocabulary entry via :func:`crc32_many`), polynomial rolling
    hash over `window`-grams in wrapping uint64 masked to 61 bits, min per
    doc; short docs sum their word hashes, empty docs are 0."""
    B = np.uint64(1000003)
    MOD_MASK = np.uint64((1 << 61) - 1)
    split = split_ascii_lower_ws(strings)
    if split is None:
        return None
    doc_idx, codes, dictionary, counts = split
    n_docs = len(strings)
    out = np.zeros(n_docs, dtype=np.int64)
    if not len(codes):
        return out
    ddata, dstarts, dlens = dict_bytes(dictionary)
    crc_dict = crc32_many(ddata, dstarts, dlens).astype(np.uint64)
    hs = crc_dict[codes]
    # short docs (0 < len < window): sum of word hashes, masked.  float64
    # weights are exact here: < window crc32 values sum below 2^53
    short = (counts > 0) & (counts < window)
    if short.any():
        sel = short[doc_idx]
        sums = np.bincount(
            doc_idx[sel], weights=hs[sel].astype(np.float64),
            minlength=n_docs,
        )
        out[short] = (
            sums[short].astype(np.uint64) & MOD_MASK
        ).astype(np.int64)
    # rolling windows for docs with len >= window
    if (counts >= window).any():
        n_tok = len(codes)
        if n_tok >= window:
            ok = doc_idx[: n_tok - window + 1] == doc_idx[window - 1 :]
            w0 = np.flatnonzero(ok)
            if len(w0):
                acc = np.zeros(len(w0), dtype=np.uint64)
                for j in range(window):
                    acc = (acc * B + hs[w0 + j]) & MOD_MASK
                w_doc = doc_idx[w0]
                grp = np.flatnonzero(
                    np.diff(w_doc, prepend=np.int64(-1)) != 0
                )
                mins = np.minimum.reduceat(acc, grp)
                out[w_doc[grp]] = mins.astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# shared driver: vectorized ASCII path + row-wise fallback
# ---------------------------------------------------------------------------


def apply_ascii_vectorized(texts: pd.Series, fast, slow_row):
    """Run `fast(arrow_string_array) -> sequence|ndarray` on the pure-ASCII
    rows of `texts` (nulls filled with '') and `slow_row(str) -> value` on
    the rest; returns a python list in input order.  One non-ASCII row
    costs only itself, not the batch."""
    import pyarrow as pa

    arr = pa.Array.from_pandas(texts)
    if arr.type != pa.string():
        arr = arr.cast(pa.string())
    import pyarrow.compute as pc

    arr = pc.fill_null(arr, "")
    mask = ascii_row_mask(arr)
    n = len(arr)
    out: list = [None] * n
    if mask.all():
        res = fast(arr)
        if res is not None:
            return list(res)
        mask = np.zeros(n, dtype=bool)  # unexpected: full fallback
    else:
        idx = np.flatnonzero(mask)
        if len(idx):
            sub = arr.take(pa.array(idx))
            res = fast(sub)
            if res is None:
                mask = np.zeros(n, dtype=bool)
            else:
                for k, i in enumerate(idx):
                    out[i] = res[k]
    for i in np.flatnonzero(~mask):
        out[i] = slow_row(arr[i].as_py())
    return out
