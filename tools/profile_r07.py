"""Round-7 stage-level profiler: isolates each expensive query's internal
stages with the noop sink (guide SS1.4) so the optimization targets the
computation, not the sink. NOT part of the frozen bench contract
(bench.py); numbers land in OPTIMIZATION_r07.md.

Usage: python tools/profile_r07.py [kg|dedup|crf|transformer|incr] ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label:40s} {time.time() - t0:7.3f}s", flush=True)
    return out


def warm(spark):
    """Same JVM/python-worker warmup as bench.py."""
    import numpy as np

    from hmm_crf_ner_fromscratch_spark.operators.fused import decode_and_extract
    from hmm_crf_ner_fromscratch_spark.operators.hmm import HMMModel
    from pyspark.sql import Window as _W

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    warm_model = HMMModel(
        pi=np.zeros(2), A=np.zeros((2, 2)), B=np.log(np.full((2, 2), 0.5)),
        word_to_idx={"a": 0, "b": 1}, tag_to_idx={"O": 0, "B-X": 1},
        tag_counts={0: 1, 1: 1},
    )
    w = docs.limit(256).select(
        F.lit("w").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.split("text", " ").alias("tokens"),
    )
    decode_and_extract(w, warm_model, key_cols=("conv_id", "turn_idx")).count()
    tiny = docs.limit(256).select("doc_id", "lang", F.length("text").alias("n"))
    (
        tiny.join(tiny.groupBy("lang").agg(F.sum("n").alias("s")), "lang")
        .withColumn("r", F.row_number().over(_W.partitionBy("lang").orderBy("doc_id")))
        .groupBy("lang").agg(F.max("r"), F.sum("s")).count()
    )


def prof_kg(spark):
    from hmm_crf_ner_fromscratch_spark.operators.fused import decode_and_extract
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import (
        _kg_edges_from_mentions, _kg_model_and_test,
    )

    print("kg_pipeline stages:", flush=True)
    t0 = time.time()
    model, test = timed("train_hmm (collect)", lambda: _kg_model_and_test(spark, SF_DIR))
    mentions = timed(
        "decode_and_extract + localCheckpoint",
        lambda: decode_and_extract(test, model, key_cols=("conv_id", "turn_idx")).localCheckpoint(),
    )
    edges = timed("edges tail (build+count)", lambda: _kg_edges_from_mentions(mentions).count())
    print(f"  {'TOTAL':40s} {time.time() - t0:7.3f}s  rows={edges}", flush=True)

    # tail decomposition
    from hmm_crf_ner_fromscratch_spark.operators.graph import build_graph
    from hmm_crf_ner_fromscratch_spark.operators.linking import (
        candidate_entities, link_edges,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id", "turn_idx").orderBy("span_start")
    nxt = mentions.select(
        "conv_id", "turn_idx", "span_start", "span_end", "entity_type", "surface",
        F.lead("span_start").over(w).alias("b_start"),
        F.lead("entity_type").over(w).alias("b_type"),
        F.lead("surface").over(w).alias("b_surface"),
    ).where(F.col("b_start") == F.col("span_end"))
    triples = nxt.select(
        F.col("surface").alias("subj"), F.lit("p").alias("pred"),
        F.col("b_surface").alias("obj"), F.col("entity_type").alias("subj_type"),
        F.col("b_type").alias("obj_type"), "conv_id", "turn_idx",
    )
    print("kg tail decomposition:", flush=True)
    timed("triples window (noop)", lambda: noop(triples))
    cands = candidate_entities(mentions).persist()
    timed("cands materialize (count)", cands.count)
    le = link_edges(cands)
    timed("link_edges (noop)", lambda: noop(le))
    _, edges2 = build_graph(mentions, triples)
    timed("build_graph full (count)", edges2.count)
    cands.unpersist()
    # second full run: warm-plan cost
    t0 = time.time()
    model, test = _kg_model_and_test(spark, SF_DIR)
    m2 = decode_and_extract(test, model, key_cols=("conv_id", "turn_idx")).localCheckpoint()
    _kg_edges_from_mentions(m2).count()
    print(f"  {'FULL RERUN (warm)':40s} {time.time() - t0:7.3f}s", flush=True)


def prof_dedup(spark):
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import (
        _shingles, q_dedup_groups, q_dedup_minhash,
    )

    print("dedup stages:", flush=True)
    sh = _shingles(spark, SF_DIR)
    timed("shingles (noop)", lambda: noop(sh))
    timed("dedup_minhash full (count)", lambda: q_dedup_minhash(spark, SF_DIR).count())
    timed("dedup_minhash rerun (count)", lambda: q_dedup_minhash(spark, SF_DIR).count())
    timed("dedup_groups full (count)", lambda: q_dedup_groups(spark, SF_DIR).count())


def prof_crf(spark):
    import numpy as np

    from hmm_crf_ner_fromscratch_spark.operators.crf import build_registry, decode_crf
    from hmm_crf_ner_fromscratch_spark.operators.transformer import _md5_int
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import (
        OBJ_WORDS, OP_WORDS, _toks,
    )

    print("crf_decode_fixed stages:", flush=True)
    t0 = time.time()
    tagged = _toks(spark, SF_DIR).where(F.size("toks") <= 40).select(
        "doc_id",
        F.col("doc_id").alias("sent_id"),
        F.col("toks").alias("tokens"),
        F.transform(
            "toks",
            lambda w: F.when(w.isin(OP_WORDS), "B-OP")
            .when(w.isin(OBJ_WORDS), "B-OBJ")
            .otherwise("O"),
        ).alias("tags"),
    )
    train = tagged.where(F.col("doc_id") % 37 == 1)
    registry = timed("build_registry", lambda: build_registry(train))
    w = np.zeros(registry.n_features, dtype=np.float32)
    for key, fid in registry.feature_index.items():
        w[fid] = _md5_int(f"crfw42:{key}")
    registry.weights = w
    test = tagged.where(F.col("doc_id") % 37 == 0).select("doc_id", "tokens")
    timed("decode_crf (noop)", lambda: noop(decode_crf(test, registry)))
    print(f"  {'TOTAL':40s} {time.time() - t0:7.3f}s", flush=True)


def prof_transformer(spark):
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import q_transformer_decode

    print("transformer_decode:", flush=True)
    timed("full (count)", lambda: q_transformer_decode(spark, SF_DIR).count())
    timed("rerun (count)", lambda: q_transformer_decode(spark, SF_DIR).count())


def prof_incr(spark):
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import q_kg_incremental

    print("kg_incremental:", flush=True)
    timed("full (count)", lambda: q_kg_incremental(spark, SF_DIR).count())
    timed("rerun (count)", lambda: q_kg_incremental(spark, SF_DIR).count())


def main():
    from hmm_crf_ner_fromscratch_spark.session import get_spark

    which = sys.argv[1:] or ["kg", "dedup", "crf", "transformer", "incr"]
    spark = get_spark(app_name="profile_r07")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    for name in which:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        {
            "kg": prof_kg,
            "dedup": prof_dedup,
            "crf": prof_crf,
            "transformer": prof_transformer,
            "incr": prof_incr,
        }[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
