"""K5/K6: entity-link candidate blocking + similarity scoring.

Input: the mentions table. Output: undirected link edges between distinct
(entity_type, surface) candidate entities whose similarity clears a
threshold -- the input to connected-components canonicalization (K7).

Blocking (K5) avoids the O(n^2) all-pairs comparison: candidates are only
compared inside blocks. Two complementary deterministic blocking keys:

  B1: (entity_type, normalized-prefix) -- catches shared-prefix variants.
  B2: (entity_type, token) for each normalized token -- catches reordered /
      partially overlapping multi-token names regardless of prefix.

Within a block, pairs are generated with an ordered self-join and scored.
A ``max_block`` guard drops degenerate blocks (stopword-like tokens) whose
pair count would explode -- standard set-similarity-join practice
(prefix-filtering literature, cf. PAPERS.md).

Scoring (K6) is pure Spark SQL: token-set Jaccard and character-3-gram
Jaccard over the normalized surfaces, combined as their max (a surface
pair is linkable if either view of it is similar). No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_THRESHOLD = 0.72
DEFAULT_MAX_BLOCK = 256


def normalize_surface(col):
    """Lowercase, punctuation-stripped, space-collapsed surface form --
    the single normalization used by blocking, scoring, and the
    incremental candidate state."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), r"[^\p{L}\p{Nd} ]", ""), r"\s+", " "
        )
    )


def candidate_entities(mentions: DataFrame) -> DataFrame:
    """Distinct (entity_type, surface) candidates with mention counts and a
    normalized form."""
    return (
        mentions.groupBy("entity_type", "surface")
        .agg(F.count("*").alias("n_mentions"))
        .withColumn("normalized", normalize_surface(F.col("surface")))
        .where(F.col("normalized") != "")
    )


def _char_ngrams(col, n: int = 3):
    """Character n-gram array of a string column (padded variant not needed:
    short strings fall back to the whole string)."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    length = F.length(padded)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(length - (n - 1), F.lit(1))),
        lambda i: padded.substr(i, F.lit(n)),
    )


def candidate_features(cands: DataFrame) -> DataFrame:
    """Per-candidate static features for blocking/scoring: key, token set,
    char-3-gram set. Pure functions of (entity_type, surface) -- a
    candidate's features never change across ingests, which is what makes
    block-scoped incremental linking exact."""
    return cands.select(
        F.concat_ws("|", "entity_type", "surface").alias("key"),
        "entity_type",
        "surface",
        "normalized",
        F.array_distinct(F.split("normalized", " ")).alias("toks"),
        F.array_distinct(_char_ngrams(F.col("normalized"))).alias("grams"),
    )


def blocked_candidates(base: DataFrame, prefix_len: int = 4) -> DataFrame:
    """(block, candidate-features) rows: B1 prefix blocks + B2 per-token
    blocks. Block membership is a pure function of the candidate."""
    prefix_block = base.withColumn(
        "block", F.concat_ws("#", "entity_type", F.substring("normalized", 1, prefix_len))
    )
    token_block = base.withColumn("tok", F.explode("toks")).withColumn(
        "block", F.concat_ws("#", "entity_type", F.lit("t"), "tok")
    ).drop("tok")
    return prefix_block.unionByName(token_block)


def score_block_pairs(
    blocked: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    max_block: int = DEFAULT_MAX_BLOCK,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Within-block ordered pairs scored by max(token-Jaccard,
    3-gram-Jaccard, exact-normalized) and thresholded; emits
    (block, src_key, dst_key, score) WITHOUT cross-block dedup so the
    result is a pure per-block function (the incremental path unions
    per-block rows and dedups at consumption). ``sizes`` lets a caller
    apply the explosion guard against FULL block sizes while scoring only
    a subset of blocks."""
    if sizes is None:
        sizes = blocked.groupBy("block").agg(F.count("*").alias("bn"))
    guarded = blocked.join(
        sizes.where(F.col("bn") <= max_block).select("block"), "block"
    )
    a = guarded.alias("a")
    b = guarded.alias("b")
    # No within-block dedup: blocked_candidates emits each (block, key)
    # at most once by construction (B1 is one row per candidate, B2 one
    # row per array_distinct token, and the two block namespaces are
    # disjoint), so the equality self-join already yields each
    # (block, src, dst) exactly once -- the dropDuplicates this carried
    # through round 6 was a whole redundant exchange + aggregate in every
    # graph build. Cross-block dedup stays at the consumers
    # (link_edges / the incremental link_pairs read).
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.block") == F.col("b.block"),
                F.col("a.key") < F.col("b.key"),
            ],
        )
        .where(F.col("a.entity_type") == F.col("b.entity_type"))
        .select(
            F.col("a.block").alias("block"),
            F.col("a.key").alias("src_key"),
            F.col("b.key").alias("dst_key"),
            F.col("a.toks").alias("toks_a"),
            F.col("b.toks").alias("toks_b"),
            F.col("a.grams").alias("grams_a"),
            F.col("b.grams").alias("grams_b"),
            F.col("a.normalized").alias("norm_a"),
            F.col("b.normalized").alias("norm_b"),
        )
    )

    # size-filter pruning (exact): Jaccard(A,B) <= min/max, so a pair can
    # only clear the threshold via a metric whose set sizes have ratio
    # >= threshold (or via exact normalized equality). Integer size
    # comparisons drop most pairs before any array intersection runs.
    def ratio_ok(na, nb):
        return F.least(na, nb) >= F.lit(threshold) * F.greatest(na, nb)

    pairs = pairs.where(
        ratio_ok(F.size("toks_a"), F.size("toks_b"))
        | ratio_ok(F.size("grams_a"), F.size("grams_b"))
        | (F.col("norm_a") == F.col("norm_b"))
    )

    tok_inter = F.size(F.array_intersect("toks_a", "toks_b"))
    tok_union = F.size(F.array_union("toks_a", "toks_b"))
    gram_inter = F.size(F.array_intersect("grams_a", "grams_b"))
    gram_union = F.size(F.array_union("grams_a", "grams_b"))
    scored = pairs.select(
        "block",
        "src_key",
        "dst_key",
        F.greatest(
            tok_inter / F.greatest(tok_union, F.lit(1)),
            gram_inter / F.greatest(gram_union, F.lit(1)),
            # exact normalized equality always links (case/punct variants)
            F.when(F.col("norm_a") == F.col("norm_b"), F.lit(1.0)).otherwise(0.0),
        ).alias("score"),
    )
    return scored.where(F.col("score") >= threshold)


def link_edges(
    cands: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    max_block: int = DEFAULT_MAX_BLOCK,
    prefix_len: int = 4,
) -> DataFrame:
    """Score blocked candidate pairs; emit edges (src_key, dst_key, score)
    with ``src_key < dst_key`` (node key = entity_type || '|' || surface)."""
    blocked = blocked_candidates(candidate_features(cands), prefix_len)
    scored = score_block_pairs(blocked, threshold=threshold, max_block=max_block)
    return scored.select("src_key", "dst_key", "score").dropDuplicates(
        ["src_key", "dst_key"]
    )


def tfidf_link_scores(
    cands: DataFrame,
    threshold: float = 0.6,
    max_block: int = DEFAULT_MAX_BLOCK,
    prefix_len: int = 4,
) -> DataFrame:
    """K6 alternative scorer: character-3-gram TF-IDF cosine over the same
    blocked candidate pairs (north_star: "TF-IDF/Jaccard entity-link
    scoring"). Corpus statistics (document frequency) come from a
    groupBy(gram) aggregate; the pair score is a gram-equality join --
    everything stays in native Spark aggregates, no UDFs.
    """
    base = cands.select(
        F.concat_ws("|", "entity_type", "surface").alias("key"),
        "entity_type",
        "normalized",
    )
    grams = base.select(
        "key", "entity_type", F.explode(_char_ngrams(F.col("normalized"))).alias("g")
    ).groupBy("key", "entity_type", "g").agg(F.count("*").alias("tf"))

    n_docs = base.count()
    df_ = grams.groupBy("g").agg(F.countDistinct("key").alias("df"))
    weighted = grams.join(F.broadcast(df_), "g").select(
        "key",
        "entity_type",
        "g",
        (F.col("tf") * F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1))).alias("w"),
    )
    norms = weighted.groupBy("key").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )

    # same blocking discipline as link_edges: prefix block only (cheap)
    blocked = base.withColumn(
        "block",
        F.concat_ws("#", "entity_type", F.substring("normalized", 1, prefix_len)),
    )
    sizes = blocked.groupBy("block").agg(F.count("*").alias("bn"))
    blocked = blocked.join(sizes.where(F.col("bn") <= max_block).select("block"), "block")
    pairs = (
        blocked.alias("a")
        .join(
            blocked.alias("b"),
            [F.col("a.block") == F.col("b.block"), F.col("a.key") < F.col("b.key")],
        )
        .select(F.col("a.key").alias("ka"), F.col("b.key").alias("kb"))
        .distinct()
    )
    wa = weighted.select(F.col("key").alias("ka"), "g", F.col("w").alias("wa"))
    wb = weighted.select(F.col("key").alias("kb"), "g", F.col("w").alias("wb"))
    dots = (
        pairs.join(wa, "ka")
        .join(wb, ["kb", "g"])
        .groupBy("ka", "kb")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("key").alias("ka"), F.col("norm").alias("na"))
    nb = norms.select(F.col("key").alias("kb"), F.col("norm").alias("nb"))
    return (
        dots.join(na, "ka")
        .join(nb, "kb")
        .select(
            F.col("ka").alias("src_key"),
            F.col("kb").alias("dst_key"),
            (F.col("dot") / (F.col("na") * F.col("nb"))).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )
