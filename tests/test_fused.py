"""Fused decode+extract must be row-equivalent to the checkpointed path."""

from __future__ import annotations

from pyspark.sql import functions as F

from hmm_crf_ner_fromscratch_spark.operators.fused import decode_and_extract
from hmm_crf_ner_fromscratch_spark.operators.hmm import decode_hmm, train_hmm
from hmm_crf_ner_fromscratch_spark.operators.mentions import extract_mentions
from hmm_crf_ner_fromscratch_spark.sources.conll import read_conll
from hmm_crf_ner_fromscratch_spark.sources.transcripts import (
    load_eval_sentences,
    synth_transcripts,
    tokenize_turns,
)


def test_fused_equals_unfused(spark, english_golden):
    sents = load_eval_sentences(english_golden["val"])[:300]
    turns = tokenize_turns(synth_transcripts(spark, 2000, seed=13, eval_sentences=sents))
    model = train_hmm(read_conll(spark, english_golden["train"], doc_id="t"))

    cols = ["conv_id", "turn_idx", "span_start", "span_end", "entity_type", "surface"]
    fused = {tuple(r) for r in decode_and_extract(turns, model).select(*cols).collect()}
    unfused = {
        tuple(r)
        for r in extract_mentions(decode_hmm(turns, model)).select(*cols).collect()
    }
    assert fused == unfused
    assert len(fused) > 300


def test_fused_crf_equals_unfused(spark):
    """CRF variant: fused decode+extract row-equivalent to chained
    decode_crf -> extract_mentions, on a small trained extended model."""
    from pyspark.sql import Row

    from hmm_crf_ner_fromscratch_spark.functions.crf import EXTENDED_U_TEMPLATES
    from hmm_crf_ner_fromscratch_spark.operators.crf import (
        build_registry,
        decode_crf,
        train_crf,
    )
    from hmm_crf_ner_fromscratch_spark.operators.fused import decode_and_extract_crf

    train = read_conll(spark, "/root/reference/English/train.txt", doc_id="t").where(
        F.col("sent_id") < 200
    ).persist()
    reg = build_registry(train, u_templates=EXTENDED_U_TEMPLATES)
    model, _ = train_crf(train, model=reg, epochs=2, lr=1.0, optimizer="adagrad")

    turns = spark.createDataFrame(
        [
            Row(conv_id="c1", turn_idx=i, tokens=list(r.tokens))
            for i, r in enumerate(train.limit(60).collect())
        ]
    )
    cols = ["conv_id", "turn_idx", "span_start", "span_end", "entity_type", "surface"]
    fused = {
        tuple(r)
        for r in decode_and_extract_crf(turns, model, key_cols=("conv_id", "turn_idx"))
        .select(*cols)
        .collect()
    }
    decoded = decode_crf(turns, model)
    unfused = {
        tuple(r)
        for r in extract_mentions(decoded).select(*cols).collect()
    }
    assert fused == unfused
    assert len(fused) > 20
    train.unpersist()
