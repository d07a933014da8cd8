"""Round-7 scale validation of the curation operators at 1M docs
(round-6 verdict ask #1; precedent: the round-4 1M-vector ANN sweep
falsified two defaults sf0.1 had hidden).

Builds a deterministic 1M-doc corpus IN SPARK (md5-derived token
sequences; every 100th doc is a planted near-duplicate of its
predecessor), then measures:

  1. dedup pair pipeline at 1M: minhash candidate/confirmed pair counts,
     wall time, and which connected-components path (driver union-find
     vs distributed star) the pair count lands in.
  2. contamination: broadcast-side size at benchmark scales 10^5..10^6+
     distinct n-grams, wall time per strategy (broadcast vs shuffle
     join), to set the broadcast cap.
  3. pack_sequences: shard-count sweep (4 .. 1024) -- the n_shards=4
     default serializes the cumulative windows at scale.

Results -> stdout JSON lines; summarized in BENCH/curation_1m_r7.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DUP_EVERY = 100  # doc i with i % DUP_EVERY == 1 near-duplicates doc i-1


def log(**kw):
    print(json.dumps(kw), flush=True)


def synth_docs(spark, n):
    """Deterministic 1M-doc corpus: ~40 tokens/doc drawn from a 50k-word
    md5-derived vocabulary; every DUP_EVERY-th doc repeats its
    predecessor's token stream with one token appended (a >0.9-jaccard
    planted near-duplicate)."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    # content seed: duplicates reuse the predecessor's seed
    seed = F.when(
        (F.col("doc_id") % DUP_EVERY == 1) & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    n_tok = (F.pmod(F.xxhash64(seed), F.lit(21)) + 30).cast("int")
    tok = lambda i: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(F.xxhash64(seed * F.lit(1000003) + i), F.lit(50_000)).cast("string"),
    )
    toks = F.transform(F.sequence(F.lit(0), n_tok - 1), tok)
    toks = F.when(
        (F.col("doc_id") % DUP_EVERY == 1) & (F.col("doc_id") > 0),
        F.concat(toks, F.array(F.lit("extra"))),
    ).otherwise(toks)
    return base.select(
        "doc_id", F.array_join(toks, " ").alias("text")
    )


def main():
    from hmm_crf_ner_fromscratch_spark.operators.components import (
        connected_components,
    )
    from hmm_crf_ner_fromscratch_spark.operators.curation import pack_sequences
    from hmm_crf_ner_fromscratch_spark.operators.dedup import (
        minhash_near_duplicates, shingle_sets,
    )
    from hmm_crf_ner_fromscratch_spark.session import get_spark

    spark = get_spark(app_name="curation-scale-r07")
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_docs(spark, N_DOCS).repartition(64).persist()
    t0 = time.time()
    n = docs.count()
    log(step="synth", n_docs=n, sec=round(time.time() - t0, 1))

    # ---- 1. dedup pairs + CC at 1M ----
    spark.sparkContext.setJobDescription("curation1m: minhash pairs")
    t0 = time.time()
    pairs = minhash_near_duplicates(docs, threshold=0.7).persist()
    n_pairs = pairs.count()
    t_pairs = round(time.time() - t0, 1)
    planted = N_DOCS // DUP_EVERY
    log(step="minhash_pairs", n_pairs=n_pairs, planted=planted,
        sec=t_pairs, cc_path="driver" if 2 * n_pairs <= 500_000 else "star")
    t0 = time.time()
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    n_comp = comp.select("component").distinct().count()
    log(step="connected_components", n_vertices=comp.count(),
        n_components=n_comp, sec=round(time.time() - t0, 1))
    pairs.unpersist()

    # ---- 2. contamination: broadcast vs shuffle at benchmark scales ----
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import CONTAM_NGRAM

    toks = docs.withColumn("toks", F.split("text", " "))
    nsz = F.size("toks")
    grams = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(nsz - (CONTAM_NGRAM - 1), F.lit(1))),
                    lambda i: F.array_join(F.slice(F.col("toks"), i, F.lit(CONTAM_NGRAM)), " "),
                )
            )
        ).alias("g"),
    )
    for mod in (1000, 100, 33):
        bench = grams.where(F.col("doc_id") % mod == 0).select("g").distinct().persist()
        nb = bench.count()
        for strat in ("broadcast", "shuffle"):
            side = F.broadcast(bench) if strat == "broadcast" else bench
            spark.sparkContext.setJobDescription(f"contam mod={mod} {strat}")
            t0 = time.time()
            hits = (
                grams.where(F.col("doc_id") % mod != 0)
                .join(side, "g")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_hits"))
                .count()
            )
            log(step="contamination", bench_mod=mod, bench_ngrams=nb,
                strategy=strat, hit_docs=hits, sec=round(time.time() - t0, 1))
        bench.unpersist()

    # ---- 3. pack_sequences shard sweep ----
    for shards in (4, 32, 256, 1024):
        spark.sparkContext.setJobDescription(f"pack n_shards={shards}")
        t0 = time.time()
        pack_sequences(docs, capacity=512, n_shards=shards).write.format(
            "noop"
        ).mode("overwrite").save()
        log(step="pack_sequences", n_shards=shards, sec=round(time.time() - t0, 1))

    docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
