"""Similarity search over embedding columns (array<float>).

The reference's dense leg is a single-node FAISS IndexFlatIP (exact cosine on
L2-normalized vectors, reference: backend/search/build_faiss_index.py:192,
backend/search/vector_search.py:75-96).  Here:

* :func:`cosine_topk` — exact brute-force cosine top-k, pure built-ins
  (zip_with + aggregate = JVM-side dot product), the correctness baseline.
* :func:`cosine_knn_join` — exact top-k for MANY queries at once: broadcast
  query matrix + mapInPandas numpy matmul with per-partition partial top-k,
  then a global merge.  This is the 100 TB shape: O(docs) scan, no crossJoin
  row explosion, partial top-k pushed into each partition.
* :func:`cosine_topk_lsh` — random-hyperplane LSH bucketing: candidates from
  matching buckets only, exact re-rank on candidates. The approximate scale
  path (IVF-style recall/latency trade).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_expr(vec_col: str, q: list[float]) -> F.Column:
    arr = ", ".join(f"{float(x)!r}D" for x in q)
    return F.expr(
        f"aggregate(zip_with({vec_col}, array({arr}), (x, y) -> cast(x as double) * y), "
        f"0D, (acc, v) -> acc + v)"
    )


def _norm_expr(vec_col: str) -> F.Column:
    return F.sqrt(
        F.expr(
            f"aggregate({vec_col}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))"
        )
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k for one query vector. All-JVM expressions:
    the scan stays in whole-stage codegen; top-k is TakeOrderedAndProject.
    Ordering uses the ROUNDED score + id tie-break so an oracle computing
    the same rounded value picks identical boundary rows."""
    from clinical_trial_searchengine_spark.partitioning import (
        spread_for_compute,
    )

    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    # dot products over a single-row-group scan run on one core (guide
    # §2.5); spread is a no-op on real multi-split inputs, and skipped
    # for tiny tables where the shuffle costs more than the serial scan
    emb = spread_for_compute(emb, min_bytes=4 << 20)
    return (
        emb.select(
            F.col(id_col),
            F.round(
                _dot_expr(vec_col, query_vec)
                / (F.greatest(_norm_expr(vec_col), F.lit(1e-30)) * F.lit(qn or 1e-30)),
                round_to,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_knn_join(
    emb: DataFrame,
    queries: pd.DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "vec",
) -> DataFrame:
    """Exact top-k neighbors for a batch of query vectors.

    Queries (driver pandas, small) are closed over into a mapInPandas kernel;
    each partition computes a numpy matmul + partial top-k per query
    (k rows/query/partition), then a global window-free merge:
    groupBy is avoided — the final exact top-k per query is taken with
    TakeOrderedAndProject per query id via row_number over a small relation
    (n_queries * k * n_partitions rows).
    """
    qids = queries[query_id_col].tolist()
    Q = np.vstack(queries[query_vec_col].to_numpy()).astype(np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)

    def part(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
            S = Qn @ M.T  # n_queries x n_docs
            kk = min(k, S.shape[1])
            sel = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            rows = {
                query_id_col: np.repeat(qids, kk),
                id_col: ids[sel].ravel(),
                "cosine": np.round(
                    np.take_along_axis(S, sel, axis=1).ravel(), 6
                ),
            }
            yield pd.DataFrame(rows)

    from clinical_trial_searchengine_spark.partitioning import (
        spread_for_compute,
    )

    partial = spread_for_compute(
        emb.select(id_col, vec_col), min_bytes=4 << 20
    ).mapInPandas(
        part, f"{query_id_col} string, {id_col} long, cosine double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_planes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    """Deterministic hash-derived hyperplane directions, uniform in
    [-1, 1): ``w[p][d] = int(md5(f"{seed}_{p}_{d}")[:8], 16) / 2^32 * 2 - 1``.

    Every step in deriving the WEIGHTS is EXACT in IEEE double (uint32 ->
    double, divide by a power of two, scale, shift), so any engine with
    md5 reproduces the plane weights bit-for-bit — the driver's DuckDB
    oracle recomputes them in SQL
    (``('0x' || substr(md5(...), 1, 8))::UBIGINT``) and verifies the
    whole bucket -> multiprobe -> re-rank pipeline against Spark.  The
    sign BUCKETS are one further step removed: they come from dot
    products whose summation order differs between NumPy matmul and a
    SQL SUM aggregate, so a projection within a few ulps of zero could
    in principle flip a bit between the two engines.  The gate corpus is
    guarded against that (tests assert min |projection| over the test
    embeddings is orders of magnitude above ulp scale), which is what
    makes the end-to-end oracle stable in practice.  Uniform
    cube directions are a standard sign-random-projection family (bucket
    collision probability still monotone in angular similarity); the
    recall property test is unchanged.
    """
    import hashlib

    w = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = int(
                hashlib.md5(f"{seed}_{p}_{d}".encode()).hexdigest()[:8], 16
            )
            w[p, d] = h / 4294967296.0 * 2.0 - 1.0
    return w


def hyperplane_bucket_udf(dim: int, n_planes: int = 12, seed: int = 42):
    """vec -> LSH bucket id from sign pattern against fixed hash-derived
    planes (:func:`lsh_planes`)."""
    planes = lsh_planes(dim, n_planes, seed)

    @F.pandas_udf("long")
    def _bucket(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy()).astype(np.float64)
        bits = (M @ planes.T) > 0
        vals = (bits * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.Series(vals.astype(np.int64))

    return _bucket


def cosine_topk_lsh(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe_hamming: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane bucket + multiprobe
    (buckets within hamming distance of the query's bucket), exact re-rank
    on candidates.  At 100 TB the bucket column is precomputed + partitioned
    on, so a query scans only matching partitions.  Planes are the
    hash-derived :func:`lsh_planes` family, so the whole pipeline is
    engine-reproducible (DuckDB-oracled in the driver gate)."""
    dim = len(query_vec)
    planes = lsh_planes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qbits = (planes @ q) > 0
    qbucket = int((qbits * (1 << np.arange(n_planes))).sum())
    probe = [qbucket]
    if multiprobe_hamming >= 1:
        probe += [qbucket ^ (1 << i) for i in range(n_planes)]
    bucketed = emb.withColumn(
        "_bucket", hyperplane_bucket_udf(dim, n_planes, seed)(F.col(vec_col))
    )
    cands = bucketed.where(F.col("_bucket").isin(probe))
    return cosine_topk(cands, query_vec, k, id_col, vec_col, round_to)


def build_lsh_index(
    emb: DataFrame,
    index_dir: str,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> dict:
    """Materialize hyperplane-LSH buckets: vectors written PARTITIONED BY
    their sign-pattern bucket, plane seed/count in a JSON sidecar.

    The 100 TB counterpart of :func:`cosine_topk_lsh`: bucket assignment is
    paid ONCE at index time; :func:`lsh_search` reads only the probed
    ``_bucket=`` directories (Catalyst partition pruning — asserted in
    scripts/explain_audit.py) instead of recomputing the bucket UDF over
    every row per query.  Mirrors :func:`build_ivf_index`'s layout.
    """
    import json
    import os

    dim = len(emb.select(vec_col).first()[0])
    (
        emb.withColumn(
            "_bucket",
            hyperplane_bucket_udf(dim, n_planes, seed)(F.col(vec_col)),
        )
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(os.path.join(index_dir, "buckets"))
    )
    os.makedirs(index_dir, exist_ok=True)
    meta = {
        "n_planes": int(n_planes),
        "dim": int(dim),
        "seed": int(seed),
        "id_col": id_col,
        "vec_col": vec_col,
    }
    tmp = os.path.join(index_dir, "lsh_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "lsh_meta.json"))
    return meta


def lsh_probe_buckets(
    meta: dict, query_vec: list[float], multiprobe_hamming: int = 1
) -> list[int]:
    """Bucket ids to scan for a query: its own bucket + all within the given
    hamming distance (same probe set as :func:`cosine_topk_lsh`)."""
    n_planes = int(meta["n_planes"])
    planes = lsh_planes(int(meta["dim"]), n_planes, int(meta["seed"]))
    q = np.asarray(query_vec, dtype=np.float64)
    qbits = (planes @ q) > 0
    qbucket = int((qbits * (1 << np.arange(n_planes))).sum())
    probe = [qbucket]
    if multiprobe_hamming >= 1:
        probe += [qbucket ^ (1 << i) for i in range(n_planes)]
    return probe


def lsh_search(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    multiprobe_hamming: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Query a materialized LSH index: scan ONLY the probed bucket
    partitions (pruned at planning time), exact cosine re-rank inside."""
    import json
    import os

    with open(os.path.join(index_dir, "lsh_meta.json")) as f:
        meta = json.load(f)
    probe = lsh_probe_buckets(meta, query_vec, multiprobe_hamming)
    cands = spark.read.parquet(os.path.join(index_dir, "buckets")).where(
        F.col("_bucket").isin(probe)
    )
    return cosine_topk(
        cands, query_vec, k, meta["id_col"], meta["vec_col"], round_to
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + probed exact re-rank
# ---------------------------------------------------------------------------


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer trained driver-side on a bounded sample (classic
    IVF recipe: the codebook is tiny and global; training data volume adds
    nothing past a few thousand points per centroid).  Deterministic:
    seeded init, fixed iteration count, spherical (cosine) updates."""
    pdf = emb.select(vec_col).limit(sample_rows).toPandas()
    X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            pts = X[assign == j]
            if len(pts):
                c = pts.mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-30)
    return C


def kmeans_centroids_distributed(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Exact distributed Lloyd iterations — no bounded sample: EVERY row
    votes every iteration, so the codebook reflects the full distribution
    (the driver-side :func:`kmeans_centroids` trains on a ``limit()``
    sample, which is the classic IVF recipe but a scale nit).

    Scale shape: each iteration is one mapInPandas pass emitting
    per-partition partial sums (a k×dim matrix + k counts per partition —
    the k-means sufficient statistics), and the driver reduces only those
    tiny partials (num_partitions × k rows).  No shuffle, no collect of
    vector data; the broadcast codebook is k×dim.  Init is deterministic
    and distributed too: the k rows with the smallest seeded xxhash64(id)
    (a uniform draw any engine can reproduce).  Spherical (cosine)
    updates, fixed iteration count.
    """
    # persist once: the seed job + every Lloyd pass re-reads these blocks
    # instead of recomputing the upstream lineage iters+1 times
    proj = emb.select(id_col, vec_col).persist()
    try:
        return _kmeans_lloyd(proj, n_centroids, vec_col, id_col, iters, seed)
    finally:
        proj.unpersist()


def _kmeans_lloyd(emb, n_centroids, vec_col, id_col, iters, seed):
    seeds = (
        emb.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(n_centroids)
        .collect()
    )
    C = np.vstack([np.asarray(r[0], dtype=np.float64) for r in seeds])
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    vecs = emb.select(vec_col)
    schema = "j int, cnt long, sums array<double>"
    for _ in range(iters):
        Cb = C.copy()

        def partials(batches, _C=Cb, _col=vec_col):
            k, d = _C.shape
            S = np.zeros((k, d))
            n = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                M = np.vstack(pdf[_col].to_numpy()).astype(np.float64)
                M /= np.maximum(
                    np.linalg.norm(M, axis=1, keepdims=True), 1e-30
                )
                a = np.argmax(M @ _C.T, axis=1)
                np.add.at(n, a, 1)
                np.add.at(S, a, M)
            nz = np.flatnonzero(n)
            if nz.size:
                yield pd.DataFrame(
                    {"j": nz.astype("int32"), "cnt": n[nz],
                     "sums": [S[j] for j in nz]}
                )

        S = np.zeros_like(C)
        n = np.zeros(len(C), dtype=np.int64)
        for r in vecs.mapInPandas(partials, schema).collect():
            S[r["j"]] += np.asarray(r["sums"], dtype=np.float64)
            n[r["j"]] += r["cnt"]
        live = np.flatnonzero(n)
        C[live] = S[live] / n[live, None]
        C[live] /= np.maximum(
            np.linalg.norm(C[live], axis=1, keepdims=True), 1e-30
        )
    return C


def ivf_assign_udf(centroids: np.ndarray):
    """vec -> nearest-centroid list id (the IVF partition key; at 100 TB
    the table is written partitioned/bucketed by this column so a query
    scans only the probed lists)."""
    C = centroids

    @F.pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    return _assign


def build_ivf_index(
    emb: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_rows: int = 10_000,
    iters: int = 10,
    train: str = "distributed",
) -> dict:
    """Materialize an IVF index: vectors written PARTITIONED BY their
    nearest-centroid list id, centroids in a JSON sidecar.

    This is the 100 TB shape for :func:`cosine_topk_ivf`: the list
    assignment is paid ONCE at index time; a query reads only the probed
    ``_list=`` partitions (partition pruning — asserted in
    scripts/explain_audit.py), instead of re-assigning every row per query.
    Analogue of FAISS's train+add persistence
    (reference: backend/search/build_faiss_index.py:215-231).

    ``train``: 'distributed' (default — full-data Lloyd via per-partition
    sufficient statistics, :func:`kmeans_centroids_distributed`) or
    'sample' (driver-side bounded-sample training, one Spark job fewer per
    iteration — fine when a few thousand points per centroid suffice).
    """
    import json
    import os

    if train == "distributed":
        C = kmeans_centroids_distributed(
            emb, n_centroids, vec_col, id_col, iters, seed
        )
    else:
        C = kmeans_centroids(emb, n_centroids, vec_col, sample_rows, iters,
                             seed)
    (
        emb.withColumn("_list", ivf_assign_udf(C)(F.col(vec_col)))
        .write.mode("overwrite")
        .partitionBy("_list")
        .parquet(os.path.join(index_dir, "lists"))
    )
    os.makedirs(index_dir, exist_ok=True)
    meta = {
        "n_centroids": int(len(C)),
        "dim": int(C.shape[1]),
        "id_col": id_col,
        "vec_col": vec_col,
        "centroids": [[float(x) for x in row] for row in C],
    }
    tmp = os.path.join(index_dir, "ivf_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "ivf_meta.json"))
    return meta


def ivf_probed_lists(index_dir: str, query_vec: list[float], n_probe: int):
    """(probe list ids, centroid matrix) for a query against a built index."""
    import json
    import os

    with open(os.path.join(index_dir, "ivf_meta.json")) as f:
        meta = json.load(f)
    C = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-30)
    probe = np.argsort(-(C @ qn))[: min(n_probe, len(C))]
    return [int(p) for p in probe], meta


def ivf_search(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Query a materialized IVF index: scan ONLY the probed list partitions
    (``_list`` is a partition column -> Catalyst prunes non-probed
    directories at planning time), exact cosine re-rank inside them."""
    import os

    probe, meta = ivf_probed_lists(index_dir, query_vec, n_probe)
    cands = spark.read.parquet(os.path.join(index_dir, "lists")).where(
        F.col("_list").isin(probe)
    )
    return cosine_topk(
        cands, query_vec, k, meta["id_col"], meta["vec_col"], round_to
    )


def cosine_topk_ivf(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k: probe the ``n_probe`` nearest inverted
    lists, exact re-rank inside them (reference's dense leg is exact FlatIP,
    reference: backend/search/build_faiss_index.py:192 — IVF is its standard
    scale-out; with n_probe == n_centroids this is exact).
    """
    C = centroids if centroids is not None else kmeans_centroids(
        emb, n_centroids, vec_col, seed=seed
    )
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-30)
    probe = np.argsort(-(C @ qn))[: min(n_probe, len(C))]
    cands = emb.withColumn(
        "_list", ivf_assign_udf(C)(F.col(vec_col))
    ).where(F.col("_list").isin([int(p) for p in probe]))
    return cosine_topk(cands, query_vec, k, id_col, vec_col)
