"""Similarity search over embedding columns (array<float>).

Fixed-point quantization discipline: vectors are quantized to integer
milli-units before any arithmetic, so dot products are exact integers and
rankings are engine-independent (the DuckDB oracles hash-match bit-for-bit;
summation order cannot matter). The ranking key ``dot*|dot|/(na*nb)`` is
monotone in cosine, avoids sqrt, and stays in deterministic integer->
double territory.

* brute_force_topk -- exact top-k (broadcast queries x corpus); the
  correctness baseline and the right plan when |queries| is small.
* lsh_topk         -- random-hyperplane (sign) LSH bucketing: corpus is
  hashed once into 2^n_planes buckets, queries probe their own bucket
  (plus optional 1-bit flips); candidate sets shrink by ~2^n_planes.
  The scale path: the corpus side is a narrow pre-bucketed table, the
  per-query work is a bucket lookup instead of a full scan.
* cosine_near_duplicates -- all pairs above a similarity threshold
  (embedding-based near-dup detection for training corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000


def quantized(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    q = F.transform(vec_col, lambda x: F.round(x.cast("double") * QUANT).cast("long"))
    base = df.select(F.col(id_col).alias("vec_id"), q.alias("q"))
    nrm = F.aggregate(
        F.zip_with("q", "q", lambda u, v: u * v),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return base.withColumn("nrm", nrm)


def _sim(dot, na, nb):
    return (dot * F.abs(dot)).cast("double") / (na * nb).cast("double")


def brute_force_topk(
    emb: DataFrame,
    query_ids,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    base = quantized(emb, vec_col, id_col)
    queries = base.where(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"), F.col("nrm").alias("qn")
    )
    pairs = F.broadcast(queries).crossJoin(
        base.select(F.col("vec_id").alias("neighbor_id"), "q", "nrm")
    ).where(F.col("query_id") != F.col("neighbor_id"))
    dot = F.aggregate(
        F.zip_with("qq", "q", lambda u, v: u * v),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        "query_id", "neighbor_id", _sim(dot, F.col("qn"), F.col("nrm")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def hyperplane_values(plane: int, dim: int) -> list[int]:
    """Deterministic pseudo-random hyperplane components: integers in
    [-500, 500] derived from md5, so the construction is reproducible in
    any engine. This Python form computes EXACTLY what the SQL form
    ``('0x' || substring(md5('hp{p}:' || i), 1, 15))::BIGINT % 1001 - 500``
    computes (15 hex digits < 2^60, always positive, so %% == pmod) --
    the DuckDB oracles re-derive the same planes from the formula."""
    import hashlib

    return [
        int(hashlib.md5(f"hp{plane}:{i}".encode()).hexdigest()[:15], 16) % 1001 - 500
        for i in range(dim)
    ]


def _hyperplane(plane: int, dim: int):
    """Dot product with a hyperplane, as a Spark column function. The
    plane components are driver-computed constants folded into the plan
    as an array literal -- NOT per-row md5 expressions, which would
    recompute dim x n_planes hashes for every corpus row."""
    hvals = hyperplane_values(plane, dim)
    harr = F.array(*[F.lit(v) for v in hvals])
    return lambda q: F.aggregate(
        F.zip_with(q, harr, lambda u, h: u * h),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def add_lsh_bucket(
    qdf: DataFrame, n_planes: int = 6, dim: int = 64, q_col: str = "q"
) -> DataFrame:
    bucket = None
    for p in range(n_planes):
        dot = _hyperplane(p, dim)(F.col(q_col))
        bit = F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return qdf.withColumn("bucket", bucket.cast("int"))


def lsh_topk(
    emb: DataFrame,
    query_ids,
    k: int = 10,
    n_planes: int | None = None,
    dim: int = 64,
    multi_probe: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    plus (multi_probe) every bucket at hamming distance 1 -- the standard
    recall lever that avoids building more tables. Recall/latency tradeoff
    via n_planes; same quantized scoring as brute force so results are
    directly comparable.

    ``n_planes=None`` sizes planes from the corpus (planes_for_corpus, one
    count() job) the way cosine_near_duplicates does: the round-3 sweep
    (BENCH/BASELINE.md) showed a fixed plane count over-partitions small
    corpora (recall 0.29 at 6 planes / 8k vectors vs 0.48 at 4) and
    under-partitions large ones (quadratic candidate growth)."""
    if n_planes is None:
        n_planes = planes_for_corpus(emb.count())
    base = add_lsh_bucket(quantized(emb, vec_col, id_col), n_planes, dim)
    queries = base.where(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << p)).cast("int")
                for p in range(n_planes)
            ],
        )
        queries = queries.withColumn("bucket", F.explode(probes))
    cands = base.select(
        F.col("vec_id").alias("neighbor_id"), "q", "nrm", "bucket"
    )
    pairs = F.broadcast(queries).join(cands, "bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    dot = F.aggregate(
        F.zip_with("qq", "q", lambda u, v: u * v),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        "query_id", "neighbor_id", _sim(dot, F.col("qn"), F.col("nrm")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _sample_filter(id_col: str, seed: int):
    """Deterministic ~1/3 sample predicate built from md5 arithmetic so it
    is reproducible in any engine (the DuckDB oracle re-derives the same
    sample; same construction as :func:`_hyperplane`)."""
    return (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"kmsample{seed}:"), F.col(id_col).cast("string")
                        ).cast("binary")
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(97),
        )
        < F.lit(32)
    )


def kmeans_centroids(
    emb: DataFrame,
    n_clusters: int = 16,
    n_iter: int = 8,
    sample: int = 4096,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Driver-side Lloyd iterations over a deterministic sample -- the IVF
    coarse quantizer. The sample (and therefore the codebook) is tiny and
    driver-sized by design; assignment of the full corpus is distributed
    (see :func:`ivf_topk`).

    Exact-integer discipline: the sample is quantized to milli-units,
    distances are int64 squared-L2 sums (order-independent), centroid
    updates are floor-division integer means, argmin tie-breaks are
    first-index. Every step is therefore bit-reproducible in any engine
    -- the DuckDB oracle unrolls the same iterations in SQL. Returns a
    (n_clusters, dim) int64 ndarray in milli-units."""
    import numpy as np

    rows = (
        emb.select(id_col, vec_col)
        .where(_sample_filter(id_col, seed))
        .orderBy(id_col)
        .limit(sample)
        .collect()
    )
    X = np.round(np.array([list(r[1]) for r in rows], dtype=np.float64) * QUANT).astype(
        np.int64
    )
    if len(X) < n_clusters:
        raise ValueError(f"sample too small for {n_clusters} clusters")
    # deterministic init: the n_clusters lowest-id sampled vectors
    C = X[:n_clusters].copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # first-index tie-break
        for c in range(n_clusters):
            members = X[assign == c]
            if len(members):
                C[c] = members.sum(axis=0) // len(members)  # floor division
    return C


def _assign_cluster(qdf: DataFrame, centroids, q_col: str = "q") -> DataFrame:
    """Distributed nearest-centroid assignment: centroids (already int64
    milli-units) folded into the plan as literals (tiny codebook), squared
    L2 on the quantized ints; array_position(min) = first-index tie-break."""
    import numpy as np

    Cq = np.asarray(centroids, dtype=np.int64)
    dists = []
    for c in range(Cq.shape[0]):
        cvec = F.array(*[F.lit(int(v)) for v in Cq[c]])
        d2 = F.aggregate(
            F.zip_with(q_col, cvec, lambda u, v: (u - v) * (u - v)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        dists.append(d2)
    arr = F.array(*dists)
    return qdf.withColumn(
        "cluster", F.array_position(arr, F.array_min(arr)).cast("int") - 1
    )


def save_codebook(centroids, path: str) -> None:
    """Persist an IVF codebook (int64 milli-unit centroids) as JSON --
    tiny (n_clusters x dim ints), engine-portable, diff-able."""
    import json
    import os

    import numpy as np

    C = np.asarray(centroids, dtype=np.int64)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"quant": QUANT, "centroids": C.tolist()}, f)


def load_codebook(path: str):
    """Load a codebook written by :func:`save_codebook`; refuses a file
    quantized at a different milli-unit scale (scores would be wrong)."""
    import json

    import numpy as np

    with open(path) as f:
        obj = json.load(f)
    if obj.get("quant") != QUANT:
        raise ValueError(
            f"codebook quant={obj.get('quant')} != engine QUANT={QUANT}"
        )
    return np.asarray(obj["centroids"], dtype=np.int64)


def ivf_topk(
    emb: DataFrame,
    query_ids,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebook=None,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer, corpus bucketed by
    nearest centroid once, queries probe their ``n_probe`` nearest cells.
    The scale path for *clustered* embeddings (real-model vectors): cells
    carve the space by density, unlike data-oblivious LSH planes.

    ``codebook`` (int64 milli-unit centroid matrix, e.g. from
    :func:`kmeans_centroids` or :func:`load_codebook`) skips the per-call
    k-means training -- train once, assign many. The round-3 IVF sweep
    showed codebook cost dominating small-corpus latency; at 100 TB the
    codebook is a build artifact, not a per-query job. When provided,
    ``n_clusters`` is ignored (the codebook's row count wins)."""
    import numpy as np

    if codebook is not None:
        C = np.asarray(codebook, dtype=np.int64)
    else:
        C = kmeans_centroids(
            emb, n_clusters=n_clusters, vec_col=vec_col, id_col=id_col
        )
    base = quantized(emb, vec_col, id_col)
    corpus = _assign_cluster(base, C)

    # query probes: n_probe nearest centroids, exploded
    Cq = np.asarray(C, dtype=np.int64)  # already milli-units
    qrows = base.where(F.col("vec_id").isin(list(query_ids))).collect()
    probe_rows = []
    for r in qrows:
        qv = np.array(r.q, dtype=np.int64)
        d2 = ((Cq - qv[None, :]) ** 2).sum(axis=1)
        for c in np.argsort(d2, kind="stable")[:n_probe]:
            probe_rows.append((int(r.vec_id), list(r.q), int(r.nrm), int(c)))
    spark = emb.sparkSession
    queries = spark.createDataFrame(
        probe_rows, "query_id long, qq array<long>, qn long, cluster int"
    )
    pairs = F.broadcast(queries).join(
        corpus.select(F.col("vec_id").alias("neighbor_id"), "q", "nrm", "cluster"),
        "cluster",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    dot = F.aggregate(
        F.zip_with("qq", "q", lambda u, v: u * v),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        "query_id", "neighbor_id", _sim(dot, F.col("qn"), F.col("nrm")).alias("sim")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


TARGET_BUCKET_OCCUPANCY = 256


def planes_for_corpus(n_rows: int, target: int = TARGET_BUCKET_OCCUPANCY) -> int:
    """Number of LSH planes that bounds EXPECTED bucket occupancy at
    ``target`` rows: 2^planes >= n/target. Candidate pairs then scale as
    n * target / 2 instead of n^2 / 2^planes with a fixed plane count --
    the difference between linear and quadratic at 10^9 vectors. Clamped
    to [4, 24] (beyond 24 planes sign-LSH recall for near-dup thresholds
    degrades faster than occupancy improves; shard the corpus instead)."""
    import math

    if n_rows <= target:
        return 4
    return max(4, min(24, math.ceil(math.log2(n_rows / target))))


def cosine_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """All pairs with quantized signed-cosine >= threshold, LSH-blocked
    (same-bucket pairs only) to stay subquadratic at corpus scale.

    ``n_planes=None`` (default) sizes the bucket count from the corpus:
    one cheap count() job, then enough planes that expected occupancy is
    ~TARGET_BUCKET_OCCUPANCY -- a fixed small plane count is quadratic-
    in-expectation and becomes the scale killer on a full corpus. The
    recall tradeoff (each extra plane halves the chance a true near-dup
    pair shares a bucket; at cos >= 0.9 a plane splits a pair with
    p = acos(0.9)/pi ~ 0.14) is the caller's lever: pass an explicit
    ``n_planes`` to pin it."""
    if n_planes is None:
        n_planes = planes_for_corpus(emb.count())
    base = add_lsh_bucket(quantized(emb, vec_col, id_col), n_planes, dim)
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"),
        F.col("nrm").alias("na"), "bucket",
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    pairs = a.join(b, "bucket").where(F.col("vec_a") < F.col("vec_b"))
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda u, v: u * v),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        pairs.select("vec_a", "vec_b", _sim(dot, F.col("na"), F.col("nb")).alias("sim"))
        .where(F.col("sim") >= threshold)
    )
