"""Cross-query contribution cache: correctness of the cache key (content-
hashed posting bytes + doc-length bytes) — a rebuilt index with different
doc lengths or postings must MISS, identical inputs must HIT and return
the exact same arrays.  No Spark needed (pure kernel surface)."""

from __future__ import annotations

import numpy as np

from clinical_trial_searchengine_spark.functions.codec import encode_postings
from clinical_trial_searchengine_spark.plans import query as Q


def _contrib_direct(buf, base, dl, avgdl, k1, b):
    from clinical_trial_searchengine_spark.functions.codec import (
        decode_postings,
    )

    ids, tfs = decode_postings(buf)
    off = (ids - np.uint64(base)).astype(np.int64)
    Kd = k1 * (1.0 - b + b * dl[off] / avgdl)
    return off, tfs.astype(np.float64) / (tfs + Kd)


def test_cache_hit_exact_and_stale_safe():
    Q._CONTRIB_CACHE.clear()
    ids = np.array([3, 7, 10, 25], dtype=np.uint64)
    tfs = np.array([1, 4, 2, 9], dtype=np.uint64)
    buf, _ = encode_postings(ids, tfs)
    dl = np.arange(1, 33, dtype=np.float64)
    tok = Q._dl_token(dl)

    off1, n1 = Q._contrib_cached(buf, 0, dl, 10.0, 1.2, 0.75, tok)
    exp_off, exp_n = _contrib_direct(buf, 0, dl, 10.0, 1.2, 0.75)
    assert (off1 == exp_off).all() and np.allclose(n1, exp_n)

    # hit: same inputs return the SAME cached arrays (no recompute)
    off2, n2 = Q._contrib_cached(buf, 0, dl, 10.0, 1.2, 0.75, tok)
    assert off2 is off1 and n2 is n1

    # a rebuilt index with changed doc lengths MISSES (stale-safety)
    dl2 = dl.copy()
    dl2[7] = 99.0
    tok2 = Q._dl_token(dl2)
    assert tok2 != tok
    off3, n3 = Q._contrib_cached(buf, 0, dl2, 10.0, 1.2, 0.75, tok2)
    assert off3 is not off1
    exp_off3, exp_n3 = _contrib_direct(buf, 0, dl2, 10.0, 1.2, 0.75)
    assert np.allclose(n3, exp_n3) and not np.allclose(n3, n1)

    # changed avgdl / bm25 params also miss
    off4, n4 = Q._contrib_cached(buf, 0, dl, 12.0, 1.2, 0.75, tok)
    assert n4 is not n1 and not np.allclose(n4, n1)

    # changed posting bytes miss
    buf2, _ = encode_postings(ids, tfs + np.uint64(1))
    off5, n5 = Q._contrib_cached(buf2, 0, dl, 10.0, 1.2, 0.75, tok)
    assert not np.allclose(n5, n1)


def test_cache_cap_eviction():
    Q._CONTRIB_CACHE.clear()
    Q._CONTRIB_CACHE_BYTES = 0
    old_cap = Q._CONTRIB_CACHE_CAP
    try:
        Q._CONTRIB_CACHE_CAP = 2_000  # tiny: force wholesale clears
        dl = np.arange(1, 200, dtype=np.float64)
        tok = Q._dl_token(dl)
        for i in range(50):
            ids = np.arange(i, i + 40, dtype=np.uint64)
            tfs = np.ones(40, dtype=np.uint64)
            buf, _ = encode_postings(ids, tfs)
            Q._contrib_cached(buf, 0, dl, 10.0, 1.2, 0.75, tok)
            assert Q._CONTRIB_CACHE_BYTES <= Q._CONTRIB_CACHE_CAP + 40 * 16
        assert len(Q._CONTRIB_CACHE) < 50  # clears happened
    finally:
        Q._CONTRIB_CACHE_CAP = old_cap
        Q._CONTRIB_CACHE.clear()
        Q._CONTRIB_CACHE_BYTES = 0
