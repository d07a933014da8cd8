"""Streaming gates: incremental decode equals batch decode; checkpoint
resume processes only new files; watermarked windowed aggregation runs."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from hmm_crf_ner_fromscratch_spark.operators.fused import decode_and_extract
from hmm_crf_ner_fromscratch_spark.operators.hmm import train_hmm
from hmm_crf_ner_fromscratch_spark.sources.conll import read_conll
from hmm_crf_ner_fromscratch_spark.sources.transcripts import (
    load_eval_sentences,
    synth_transcripts,
    tokenize_turns,
)
from hmm_crf_ner_fromscratch_spark.streaming.decode_stream import (
    read_transcript_stream,
    stream_decode_mentions,
    stream_mention_rates,
)

MENTION_KEY = ["conv_id", "turn_idx", "span_start", "span_end", "entity_type", "surface"]


def test_stream_decode_matches_batch_and_resumes(spark, english_golden, tmp_path):
    sents = load_eval_sentences(english_golden["val"])[:300]
    tx = synth_transcripts(spark, 500, seed=31, eval_sentences=sents).persist()
    model = train_hmm(read_conll(spark, english_golden["train"], doc_id="t"))

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # chunk 1 arrives
    chunk1 = tx.where(F.col("turn_idx") % 2 == 0)
    chunk1.write.mode("append").parquet(in_dir)
    q = stream_decode_mentions(
        read_transcript_stream(spark, in_dir), model, out_dir, ckpt
    )
    q.awaitTermination(300)
    got1 = {tuple(r) for r in spark.read.parquet(out_dir).select(*MENTION_KEY).collect()}
    want1 = {
        tuple(r)
        for r in decode_and_extract(tokenize_turns(chunk1), model)
        .select(*MENTION_KEY)
        .collect()
    }
    assert got1 == want1 and len(got1) > 100

    # chunk 2 arrives; restart from checkpoint -> only new files processed,
    # final output equals the full batch result (exactly-once, no dupes)
    tx.where(F.col("turn_idx") % 2 == 1).write.mode("append").parquet(in_dir)
    q2 = stream_decode_mentions(
        read_transcript_stream(spark, in_dir), model, out_dir, ckpt
    )
    q2.awaitTermination(300)
    got_all = {
        tuple(r) for r in spark.read.parquet(out_dir).select(*MENTION_KEY).collect()
    }
    want_all = {
        tuple(r)
        for r in decode_and_extract(tokenize_turns(tx), model)
        .select(*MENTION_KEY)
        .collect()
    }
    assert got_all == want_all
    assert len(spark.read.parquet(out_dir).collect()) == len(got_all), "duplicates"
    tx.unpersist()


def test_stream_windowed_mention_rates(spark, english_golden, tmp_path):
    sents = load_eval_sentences(english_golden["val"])[:150]
    tx = synth_transcripts(spark, 100, seed=41, eval_sentences=sents)
    model = train_hmm(read_conll(spark, english_golden["train"], doc_id="t"))
    in_dir = str(tmp_path / "in")
    tx.write.mode("append").parquet(in_dir)

    rates = stream_mention_rates(read_transcript_stream(spark, in_dir), model)
    q = (
        rates.writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from rates").collect()
    # append mode emits only watermark-closed windows; availableNow on a
    # finite input closes all but the last -> expect at least one window
    assert rows, "no closed windows emitted"
    for r in rows:
        assert r.n_mentions > 0 and r.window_end > r.window_start
