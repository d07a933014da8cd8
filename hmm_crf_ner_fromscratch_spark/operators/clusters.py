"""Brown-style word clusters as a Spark aggregation + driver bisecting
k-means (the round-3 CRF quality lever: cluster features generalize to
unseen entities the way lexical templates cannot).

Pipeline (all public-knowledge machinery -- Brown et al. 1992 class
LMs, PPMI context vectors per Turney&Pantel 2010, bisecting k-means per
Steinbach et al. 2000, cluster-feature CRF templates per Koo et al.
2008 / Turian et al. 2010):

1. DISTRIBUTED: count (word, direction, context-word) co-occurrences
   over the token stream, contexts restricted to the top-C frequent
   words plus BOS/EOS (one explode + one hash agg with map-side
   combine; a single shuffle keyed by the pair).
2. DRIVER: assemble the V x (2C+2) count matrix (bounded collect, same
   pattern and rationale as train_hmm model assembly -- the cluster map
   must end up driver-side for broadcast anyway), PPMI-transform, L2
   normalize, then recursively bisect with deterministic 2-means to
   ``depth`` levels. Each word's cluster id is its root-to-leaf bit
   path, so PREFIXES of the id are coarser clusters -- exactly the
   hierarchy Brown-cluster CRF features consume at multiple
   granularities.

Determinism: counts are exact integers; rows are processed in a pinned
(count desc, word) order; 2-means seeds are the farthest-point pair
from the cluster mean with first-index tie-breaks; fixed iteration
count. Two runs on the same corpus produce identical bitstrings.

At 100 TB: step 1 scales like any word-count (shuffle on (word, ctx)
pairs, combiner-reduced); step 2 is vocab-sized, not corpus-sized --
raise ``min_count`` to keep V within the driver budget, and the
``max_rows`` guard refuses loudly instead of OOMing (cf.
operators/hmm.py::train_hmm).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_CONTEXT = 200
DEPTH = 10
KMEANS_ITERS = 10


def context_counts(
    sentences: DataFrame,
    n_context: int = N_CONTEXT,
    min_count: int = 1,
    max_rows: int = 50_000_000,
    max_vocab: int = 5_000_000,
):
    """Distributed part: (word, dir, ctx) -> count rows plus the word and
    context-word frequency tables. Returns (pair_rows, word_counts,
    context_words) as driver-side lists; everything upstream of the
    bounded collects is hash-aggregated Spark.

    Both driver collects are bounded: the vocab collect via ``max_vocab``
    and the pair collect via ``max_rows`` -- each a ``limit(cap + 1)`` so
    an open-vocabulary corpus refuses loudly instead of OOMing the driver
    (same contract as ``train_hmm(max_model_rows=...)``)."""
    toks = sentences.where(F.size("tokens") > 0).select(
        F.col("tokens").alias("t")
    )
    words = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    ).persist()
    ctx_words = [
        r.w
        for r in words.orderBy(F.desc("cnt"), F.asc("w")).limit(n_context).collect()
    ]
    vocab_rows = (
        words.where(F.col("cnt") >= min_count).limit(max_vocab + 1).collect()
    )
    words.unpersist()
    if len(vocab_rows) > max_vocab:
        raise ValueError(
            f"cluster vocab exceeds max_vocab={max_vocab}; raise min_count "
            "to shrink the vocabulary before the driver-side collect"
        )

    pair_rows = context_pair_counts(toks, ctx_words).limit(max_rows + 1).collect()
    if len(pair_rows) > max_rows:
        raise ValueError(
            f"context-count collect exceeds max_rows={max_rows}; raise "
            "min_count / lower n_context to shrink the vocab-side table"
        )
    return pair_rows, vocab_rows, ctx_words


def context_pair_counts(toks: DataFrame, ctx_words: list[str]) -> DataFrame:
    """The distributed core: (w, d, c, cnt) directional co-occurrence
    counts with contexts restricted to ``ctx_words`` + BOS/EOS. One
    explode + one hash aggregate (map-side combined); oracle-checkable
    SQL semantics (entry query ``cluster_context_counts``)."""
    ex = toks.select("t", F.posexplode("t").alias("i", "w"))
    pairs = ex.select(
        "w",
        # element_at is 1-based: prev = t[i-1] (0-based) = element_at(t, i)
        F.when(F.col("i") == 0, "BOS")
        .otherwise(F.element_at("t", F.col("i")))
        .alias("prev"),
        F.when(F.col("i") == F.size("t") - 1, "EOS")
        .otherwise(F.element_at("t", F.col("i") + 2))
        .alias("next"),
    )
    ctx_set = sorted(set(ctx_words) | {"BOS", "EOS"})
    return (
        pairs.select("w", F.lit("L").alias("d"), F.col("prev").alias("c"))
        .unionByName(
            pairs.select("w", F.lit("R").alias("d"), F.col("next").alias("c"))
        )
        # isin over a few hundred literals compiles to an O(1) hash InSet
        .where(F.col("c").isin(ctx_set))
        .groupBy("w", "d", "c")
        .agg(F.count("*").alias("cnt"))
    )


def _ppmi_matrix(pair_rows, vocab, ctx_index):
    """V x D PPMI matrix, L2-normalized rows (float64, deterministic)."""
    widx = {w: i for i, w in enumerate(vocab)}
    M = np.zeros((len(vocab), len(ctx_index)), dtype=np.float64)
    for r in pair_rows:
        wi = widx.get(r.w)
        ci = ctx_index.get((r.d, r.c))
        if wi is not None and ci is not None:
            M[wi, ci] = r.cnt
    total = M.sum()
    if total == 0:
        return M
    row = M.sum(axis=1, keepdims=True)
    col = M.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log((M * total) / (row * col))
    pmi[~np.isfinite(pmi)] = 0.0
    np.maximum(pmi, 0.0, out=pmi)
    norms = np.linalg.norm(pmi, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return pmi / norms


def _bisect(X: np.ndarray, idxs: np.ndarray, depth: int, bits: list[str]):
    """Recursive deterministic 2-means; appends one bit per level to each
    member's bitstring. Seeds: (a) the member farthest from the cluster
    mean, (b) the member farthest from (a); ties -> lowest index."""
    if depth == 0 or len(idxs) < 2:
        return
    sub = X[idxs]
    mean = sub.mean(axis=0)
    d_mean = ((sub - mean) ** 2).sum(axis=1)
    a = int(np.argmax(d_mean))
    d_a = ((sub - sub[a]) ** 2).sum(axis=1)
    b = int(np.argmax(d_a))
    c0, c1 = sub[a].copy(), sub[b].copy()
    assign = None
    for _ in range(KMEANS_ITERS):
        d0 = ((sub - c0) ** 2).sum(axis=1)
        d1 = ((sub - c1) ** 2).sum(axis=1)
        new_assign = (d1 < d0).astype(np.int8)  # tie -> cluster 0
        if assign is not None and np.array_equal(new_assign, assign):
            break
        assign = new_assign
        if assign.all() or not assign.any():
            break
        c0 = sub[assign == 0].mean(axis=0)
        c1 = sub[assign == 1].mean(axis=0)
    if assign is None or assign.all() or not assign.any():
        # degenerate split (identical rows): stop refining this branch
        return
    for local, bit in enumerate(assign):
        bits[idxs[local]] += str(int(bit))
    _bisect(X, idxs[assign == 0], depth - 1, bits)
    _bisect(X, idxs[assign == 1], depth - 1, bits)


def train_word_clusters(
    sentences: DataFrame,
    n_context: int = N_CONTEXT,
    min_count: int = 1,
    depth: int = DEPTH,
    max_rows: int = 50_000_000,
    max_vocab: int = 5_000_000,
) -> dict[str, str]:
    """word -> hierarchical bitstring ('' for words whose context vector
    never separated). Prefixes of the bitstring are coarser clusters."""
    pair_rows, vocab_rows, ctx_words = context_counts(
        sentences,
        n_context=n_context,
        min_count=min_count,
        max_rows=max_rows,
        max_vocab=max_vocab,
    )
    # pinned processing order: frequency desc then lexicographic
    vocab = [r.w for r in sorted(vocab_rows, key=lambda r: (-r.cnt, r.w))]
    ctx_index = {}
    for d in ("L", "R"):
        for c in ctx_words + ["BOS", "EOS"]:
            ctx_index.setdefault((d, c), len(ctx_index))
    X = _ppmi_matrix(pair_rows, vocab, ctx_index)
    bits = ["" for _ in vocab]
    _bisect(X, np.arange(len(vocab)), depth, bits)
    return dict(zip(vocab, bits))


def prefix_maps(
    bits_map: dict[str, str], lengths: tuple[int, ...] = (4, 6, 10)
) -> dict[str, dict[str, str]]:
    """Per-granularity maps {'c4': {word: bits[:4]}, ...} for
    cluster_u_templates; short bitstrings are used whole."""
    return {
        f"c{n}": {w: b[:n] for w, b in bits_map.items()} for n in lengths
    }
