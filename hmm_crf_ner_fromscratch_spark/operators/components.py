"""K7: connected-components canonicalization via iterative DataFrame
self-joins (min-label propagation).

Each candidate entity is a vertex (string key); link edges (K6) connect
variants of the same real-world entity. The component representative --
the lexicographically smallest key -- becomes the canonical entity.

Algorithm: iterative min-label propagation. Every round, each vertex
adopts the minimum label among itself and its neighbors; converged when no
label changes. Rounds = O(component diameter); name-similarity graphs have
tiny diameters, so a handful of rounds suffice. This is the DataFrame
rendition of the map-reduce CC algorithms (large-star/small-star family,
Kiveris et al.) -- per SURVEY.md SS2.6 K7.

Scale guards (the two failure modes of naive iterative DataFrames):
  * lineage blowup -> ``localCheckpoint()`` every iteration truncates the
    plan, keeping each round's job constant-size;
  * convergence detection -> a single ``count`` of changed labels per
    round (cheap agg on the checkpointed frame), hard max_iter backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components_star(
    edges: DataFrame,
    src: str = "src_key",
    dst: str = "dst_key",
    max_iter: int = 30,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond") -- O(log n)
    rounds, the right algorithm for adversarial (long-path / high-
    diameter) graphs where min-label propagation needs O(diameter).

    large-star: per node u, attach every strictly-larger neighbor to the
    minimum of N(u) ∪ {u}. small-star: orient edges large->small, attach
    u and its (smaller) neighbors to the minimum. Converged when the
    small-star output is a fixpoint; the edge set is then (node -> root).
    Same contract as :func:`connected_components`.
    """
    spark = edges.sparkSession

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.select(F.col("u"), F.col("v")).unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("u", "mn").alias("m"))
        return (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient large -> small
        oriented = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = oriented.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("u", "mn").alias("m"))
        joined = oriented.join(m, "u")
        out = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        return out

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iter):
        e = small_star(large_star(e)).localCheckpoint()
        sig = e.agg(
            F.count("*").alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
        ).first()
        if prev_sig == (sig.n, sig.h):
            break
        prev_sig = (sig.n, sig.h)

    roots = e.select(F.col("v").alias("key")).distinct().withColumn(
        "component", F.col("key")
    )
    return e.select(F.col("u").alias("key"), F.col("v").alias("component")).unionByName(
        roots
    ).distinct()


def _local_components(pairs: list) -> list:
    """Driver-side union-find with min-key labels; same contract as the
    distributed loop."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in pairs:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # min key becomes the root -> label is the component minimum
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return [(k, find(k)) for k in parent]


def connected_components(
    edges: DataFrame,
    src: str = "src_key",
    dst: str = "dst_key",
    max_iter: int = 25,
    local_threshold: int = 500_000,
    seed: DataFrame | None = None,
) -> DataFrame:
    """Returns ``DataFrame[key, component]`` for every vertex appearing in
    ``edges``; ``component`` is the minimum key in the vertex's component.

    Vertices not present in ``edges`` are their own components -- callers
    union isolated vertices back in afterwards (left join + coalesce).

    Adaptive execution, same shape as Spark's broadcast-join selection:
    the deduped edge count is known for free once the symmetrized frame
    is checkpointed; below ``local_threshold`` edges the component
    structure is solved with driver-side union-find (one job instead of
    ~4 jobs x O(diameter) rounds -- the iteration overhead dominates for
    small link graphs), above it the distributed min-label loop runs.
    Both paths produce identical (key, min-key-of-component) rows --
    property-tested equivalent.

    ``seed`` (``DataFrame[key, component]``, e.g. the previous snapshot's
    assignment) warm-starts the distributed loop: labels initialize to
    the seed instead of each vertex's own key, so regions whose component
    structure did not change converge in one round instead of
    O(diameter). SOUNDNESS CAVEAT: a seed label must name a vertex in
    the SAME component under the current edge set -- true when edges only
    GROW between snapshots (a component can merge but never split; the
    old min is still a member). If edges may have been removed (e.g.
    incremental ingest with conversation deletion), do NOT seed --
    recompute cold, as plans/incremental.py does. The local union-find
    path ignores the seed (it is one-shot anyway).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    # empty edge set (common for sparse/clean corpora): every vertex is
    # its own component -- skip the propagation loop entirely (the count
    # is free: sym is already materialized by the checkpoint)
    n_sym = sym.count()
    if n_sym == 0:
        return sym.select(F.col("u").alias("key")).withColumn(
            "component", F.col("key")
        )
    if n_sym <= local_threshold:
        import pandas as pd

        spark = edges.sparkSession
        rows = _local_components([(r.u, r.v) for r in sym.collect()])
        schema = sym.select(
            F.col("u").alias("key"), F.col("v").alias("component")
        ).schema
        # pandas -> Arrow LocalTableScan: createDataFrame on a plain list
        # builds a pickled python RDD with defaultParallelism partitions,
        # which every downstream consumer pays python-worker roundtrips to
        # scan (and which coalesce(1) turns into ~4 s of sequential drains)
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["key", "component"]), schema
        )
    labels = sym.select(F.col("u").alias("key")).distinct().withColumn(
        "component", F.col("key")
    )
    if seed is not None:
        labels = (
            labels.join(
                seed.select("key", F.col("component").alias("_seed")),
                "key",
                "left",
            )
            # least() guards a malformed seed (label > key can never be a
            # component min); coalesce covers vertices new since the seed
            .select(
                "key",
                F.least(
                    F.coalesce("_seed", F.col("key")), F.col("key")
                ).alias("component"),
            )
        )
    labels = labels.localCheckpoint()

    for _ in range(max_iter):
        # neighbor labels: for vertex u, min label among neighbors v
        nbr = (
            sym.join(labels, sym["v"] == labels["key"])
            .select(F.col("u").alias("key"), "component")
            .groupBy("key")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, "key", "left")
            .select(
                "key",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                F.col("component").alias("_old"),
            )
            .localCheckpoint()
        )
        changed = new_labels.where(F.col("component") != F.col("_old")).count()
        labels = new_labels.drop("_old")
        if changed == 0:
            break
    return labels
