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


P_FLIP_COS09 = 0.14358  # acos(0.9)/pi: P(one random plane splits a cos=0.9 pair)


def lsh_auto_config(
    *, target_recall: float = 0.9, p_flip: float = P_FLIP_COS09
) -> tuple[int, int]:
    """Recall-aware (n_planes, probe_bits) for top-k LSH. Depends only on
    the recall target and the assumed neighbor similarity -- NOT on corpus
    size (the modeled recall/scan-fraction tradeoff is row-count-free), so
    callers never need a count() job to configure it.

    Model: a true neighbor at cos ~= 0.9 lands within hamming distance h
    of the query's bucket with probability
    ``sum_{i<=h} C(n,i) p^i (1-p)^(n-i)`` where ``p = acos(0.9)/pi``.
    Among configs whose modeled recall clears ``target_recall``, pick the
    one scanning the smallest expected corpus fraction
    ``sum_{i<=h} C(n,i) / 2^n``; if none clears it (tiny corpora), pick
    the max-recall config. The model is conservative in practice -- at
    1M synthetic vectors it predicts 0.79 for planes=6/h=1 where the
    measured recall@10 is 0.8875 (BENCH/ann_sweep_1m.jsonl) -- so the
    chosen config's measured recall lands above target.

    This replaces the round-3 occupancy-targeted default
    (:func:`planes_for_corpus`), which the round-4 1M-vector sweep
    falsified for top-k: occupancy targeting picked 12 planes -> recall
    0.625, while fixed 6 planes measured 0.8875 faster. Occupancy is the
    right objective for near-dup *pair enumeration* (candidate pairs
    scale with occupancy); top-k recall needs the probe set to keep
    covering the neighbor's bucket as planes grow, which 1-bit probing
    stops doing past ~8 planes."""
    from math import comb

    best = None  # (scan_frac, -recall, planes, bits)
    fallback = None
    for planes in range(4, 17):
        for bits in (1, 2):
            recall = sum(
                comb(planes, i) * p_flip**i * (1 - p_flip) ** (planes - i)
                for i in range(bits + 1)
            )
            scan = sum(comb(planes, i) for i in range(bits + 1)) / 2**planes
            cand = (scan, -recall, planes, bits)
            if fallback is None or -cand[1] > -fallback[1]:
                fallback = cand
            if recall >= target_recall and (best is None or cand < best):
                best = cand
    _, _, planes, bits = best if best is not None else fallback
    return planes, bits


def _probe_set(n_planes: int, probe_bits: int):
    """All hamming-<=probe_bits flip masks (excluding 0), as ints, in
    ascending hamming order (depth h grows the probe set combinatorially:
    C(n_planes, h) buckets per level -- callers asking for deep probes get
    exactly what they asked for, never a silent cap)."""
    from itertools import combinations

    flips = []
    for h in range(1, probe_bits + 1):
        for combo in combinations(range(n_planes), h):
            m = 0
            for p in combo:
                m |= 1 << p
            flips.append(m)
    return flips


def lsh_topk(
    emb: DataFrame,
    query_ids,
    k: int = 10,
    n_planes: int | None = None,
    dim: int = 64,
    multi_probe: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_bits: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    plus every bucket within hamming distance ``probe_bits`` (multi-probe,
    the standard recall lever that avoids building more tables).
    Recall/latency tradeoff via n_planes; same quantized scoring as brute
    force so results are directly comparable.

    ``probe_bits=None`` -> 1 if ``multi_probe`` else 0 (back-compat).

    ``n_planes=None`` picks (planes, probe_bits) via
    :func:`lsh_auto_config` -- the recall-aware default, corpus-size-free
    (no count() job). Round 4's 1M-vector sweep showed the earlier
    occupancy-targeted default (12 planes, 1-bit probe) lands at recall@10
    0.625 where fixed 6 planes gets 0.8875 -- occupancy is the near-dup
    objective, not the top-k one (see lsh_auto_config). An explicit
    ``multi_probe=False`` still means single-bucket lookup here
    (probe_bits 0), overriding the auto probe depth."""
    if n_planes is None:
        auto_planes, auto_bits = lsh_auto_config()
        n_planes = auto_planes
        if probe_bits is None:
            probe_bits = auto_bits if multi_probe else 0
    if probe_bits is None:
        probe_bits = 1 if multi_probe else 0
    base = add_lsh_bucket(quantized(emb, vec_col, id_col), n_planes, dim)
    queries = base.where(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    flips = _probe_set(n_planes, probe_bits)
    if flips:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(m)).cast("int") for m in flips],
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
    """Distributed nearest-centroid assignment, vectorized: one int64
    NumPy matmul per Arrow batch inside ``mapInPandas``.

    Why not a Catalyst expression: the previous form built one
    ``aggregate(zip_with(...))`` higher-order expression per centroid;
    Spark interprets lambda functions (they never enter codegen), so at
    1M rows x 256 cells x 64 dims that is ~16e9 interpreted ops --
    measured 282-774 s where exact brute force over the same corpus takes
    16 s (BENCH/ann_sweep_1m.jsonl, round 4). One matmul per Arrow batch
    does the same arithmetic in BLAS.

    Exact-integer semantics are preserved bit-for-bit (the DuckDB oracle
    is unchanged): vectors and centroids are int64 milli-units;
    ``argmin_c ||x - c||^2 == argmin_c (||c||^2 - 2 x.c)`` because
    ``||x||^2`` is constant per row; ``np.argmin`` takes the first index
    on ties, identical to ``array_position(arr, array_min(arr))``."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    C = np.ascontiguousarray(np.asarray(centroids, dtype=np.int64))
    cn = (C * C).sum(axis=1)
    # fresh StructType: StructType.add MUTATES the DataFrame's cached
    # schema object, which corrupts qdf.columns for the mapInPandas call
    out_schema = StructType(
        list(qdf.schema.fields) + [StructField("cluster", IntegerType())]
    )

    def assign(batches):
        for pdf in batches:
            out = pdf.copy()
            if len(pdf) == 0:
                out["cluster"] = np.array([], dtype="int32")
            else:
                X = np.array(pdf[q_col].tolist(), dtype=np.int64)
                out["cluster"] = (cn[None, :] - 2 * (X @ C.T)).argmin(axis=1).astype(
                    "int32"
                )
            yield out

    return qdf.mapInPandas(assign, out_schema)


def assign_ivf(
    emb: DataFrame,
    codebook,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Build-once IVF index: quantize and assign every corpus vector to
    its nearest codebook centroid. Returns ``(vec_id, q, nrm, cluster)``;
    persist it (or write parquet, partitioned by ``cluster``) and pass to
    :func:`ivf_topk` via ``index=`` so assignment is paid once per corpus,
    not once per query batch. At 100 TB this is the index-build job; the
    per-query work is then a probe-cell scan."""
    return _assign_cluster(quantized(emb, vec_col, id_col), codebook)


def codebook_fingerprint(centroids) -> str:
    """Content hash of an IVF codebook (shape + int64 milli-unit values).
    Persisted next to a saved index so a query can detect the
    index/codebook mismatch that would otherwise silently probe the wrong
    cells (same pattern as stage manifests recording n_buckets)."""
    import hashlib

    import numpy as np

    C = np.ascontiguousarray(np.asarray(centroids, dtype=np.int64))
    h = hashlib.sha256()
    h.update(str(C.shape).encode())
    h.update(C.tobytes())
    return h.hexdigest()


def save_ivf_index(index: DataFrame, path: str, codebook=None) -> None:
    """Persist an :func:`assign_ivf` index as parquet PARTITIONED BY
    cluster: :func:`ivf_topk`'s probed-cell ``isin`` filter then becomes
    partition pruning -- a query reads its ``n_probe`` cell directories,
    not the corpus. At 100 TB this pair (build job writes the
    partitioned index, queries prune to cells) is the production
    layout.

    ``codebook`` (the centroids the index was assigned with) additionally
    writes a fingerprint sidecar; :func:`load_ivf_index` then verifies the
    query-time codebook matches the build-time one."""
    import json
    import os

    index.write.mode("overwrite").partitionBy("cluster").parquet(path)
    if codebook is not None:
        with open(os.path.join(path, "_codebook.json"), "w") as f:
            json.dump({"fingerprint": codebook_fingerprint(codebook)}, f)


def load_ivf_index(spark, path: str, codebook=None) -> DataFrame:
    """Read an index written by :func:`save_ivf_index`, restoring the
    (vec_id, q, nrm, cluster) shape assign_ivf produces (partitionBy
    moves `cluster` to a directory key; reorder and retype it).

    ``codebook`` -> verify it against the fingerprint the index was saved
    with (raises on mismatch -- probing with foreign centroids silently
    returns wrong/low-recall neighbors). Indexes saved without a
    fingerprint load as before."""
    import json
    import os

    if codebook is not None:
        fp_path = os.path.join(path, "_codebook.json")
        if os.path.exists(fp_path):
            with open(fp_path) as f:
                saved = json.load(f).get("fingerprint")
            got = codebook_fingerprint(codebook)
            if saved != got:
                raise ValueError(
                    f"codebook mismatch for IVF index at {path}: saved "
                    f"fingerprint {saved[:12]}.. != query codebook "
                    f"{got[:12]}.. -- rebuild the index (assign_ivf) or "
                    "load the codebook it was built with"
                )
    return spark.read.parquet(path).select(
        "vec_id", "q", "nrm", F.col("cluster").cast("int").alias("cluster")
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
    index: DataFrame | None = None,
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
    ``n_clusters`` is ignored (the codebook's row count wins).

    ``index`` (the ``(vec_id, q, nrm, cluster)`` DataFrame from
    :func:`assign_ivf`, typically persisted or parquet-backed) skips
    corpus assignment too -- the remaining per-call work is just the
    probe-cell join. Requires ``codebook`` (probe selection needs the
    centroids); ``emb`` is then ignored and may be None."""
    import numpy as np

    if index is not None and codebook is None:
        raise ValueError("index= requires codebook= (probe selection needs centroids)")
    if codebook is not None:
        C = np.asarray(codebook, dtype=np.int64)
    else:
        C = kmeans_centroids(
            emb, n_clusters=n_clusters, vec_col=vec_col, id_col=id_col
        )
    if index is not None:
        corpus = index
        qsource = index.select("vec_id", "q", "nrm")
    else:
        base = quantized(emb, vec_col, id_col)
        corpus = _assign_cluster(base, C)
        qsource = base

    # query probes: n_probe nearest centroids, exploded
    Cq = np.asarray(C, dtype=np.int64)  # already milli-units
    qrows = qsource.where(F.col("vec_id").isin(list(query_ids))).collect()
    probe_rows = []
    for r in qrows:
        qv = np.array(r.q, dtype=np.int64)
        d2 = ((Cq - qv[None, :]) ** 2).sum(axis=1)
        for c in np.argsort(d2, kind="stable")[:n_probe]:
            probe_rows.append((int(r.vec_id), list(r.q), int(r.nrm), int(c)))
    spark = (emb if index is None else index).sparkSession
    from ..session import local_df

    queries = local_df(
        spark, probe_rows, "query_id long, qq array<long>, qn long, cluster int"
    )
    # the probed cells are known driver-side: filter BEFORE the join so
    # the predicate reaches the scan -- with an index stored partitioned
    # by `cluster` this is real partition pruning (read n_probe cells,
    # not the corpus); the join alone would not prune
    probed_cells = sorted({c for *_, c in probe_rows})
    pairs = F.broadcast(queries).join(
        corpus.where(F.col("cluster").isin(probed_cells)).select(
            F.col("vec_id").alias("neighbor_id"), "q", "nrm", "cluster"
        ),
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
    degrades faster than occupancy improves; shard the corpus instead).

    Scope: this is the NEAR-DUP PAIR-ENUMERATION knob
    (:func:`cosine_near_duplicates`), where the objective is bounding
    candidate pairs. It is NOT a top-k recall knob -- the round-4
    1M-vector sweep measured recall@10 0.625 when this default was used
    for :func:`lsh_topk` (12 planes) vs 0.8875 at fixed 6 planes
    (BENCH/ann_sweep_1m.jsonl). Top-k uses :func:`lsh_auto_config`."""
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
