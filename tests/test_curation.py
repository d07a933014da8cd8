"""Corpus-curation operators: sequence packing + stratified sampling."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pack_sequences_semantics(spark):
    from hmm_crf_ner_fromscratch_spark.operators.curation import pack_sequences

    # shard 0 gets doc_ids 0,4 (n=3,5 tokens); shard 1 gets 1,5 (n=4,7)
    docs = spark.createDataFrame(
        [
            (0, "a b c"),
            (1, "a b c d"),
            (4, "a b c d e"),
            (5, "a b c d e f g"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in pack_sequences(docs, capacity=4, n_shards=4).collect()
    }
    # shard 0 stream: doc0 tokens 0..2 (bin 0), doc4 tokens 3..7 (bins 0..1)
    assert (out[0].start_bin, out[0].start_offset, out[0].end_bin) == (0, 0, 0)
    assert (out[4].start_bin, out[4].start_offset, out[4].end_bin) == (0, 3, 1)
    # shard 1 stream: doc1 tokens 0..3 (bin 0), doc5 tokens 4..10 (bins 1..2)
    assert (out[1].start_bin, out[1].start_offset, out[1].end_bin) == (0, 0, 0)
    assert (out[5].start_bin, out[5].start_offset, out[5].end_bin) == (1, 0, 2)
    assert all(r.n_tokens >= 1 for r in out.values())


def test_pack_sequences_stream_is_gapless(spark):
    """Within a shard, each doc starts exactly where the previous ended:
    concat-and-chunk wastes zero tokens."""
    from hmm_crf_ner_fromscratch_spark.operators.curation import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + (i * 7) % 11))) for i in range(40)],
        "doc_id long, text string",
    )
    cap = 8
    rows = pack_sequences(docs, capacity=cap, n_shards=3).collect()
    by_shard: dict = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        pos = by_shard.get(r.shard, 0)
        assert r.start_bin * cap + r.start_offset == pos, r
        assert r.end_bin == (pos + r.n_tokens - 1) // cap
        by_shard[r.shard] = pos + r.n_tokens


def test_stratified_sample_quota_and_determinism(spark):
    from hmm_crf_ner_fromscratch_spark.operators.curation import (
        stratified_sample,
    )

    docs = spark.createDataFrame(
        [(i, ["en", "zh", "fr"][i % 3]) for i in range(90)],
        "doc_id long, lang string",
    )
    s1 = stratified_sample(docs, quota=5).collect()
    s2 = stratified_sample(docs, quota=5).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))  # deterministic
    per = {}
    for r in s1:
        per.setdefault(r.lang, []).append(r.sample_rank)
    assert set(per) == {"en", "zh", "fr"}
    for ranks in per.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_dedup_groups_all_singletons(spark, tmp_path):
    """A corpus with no near-dups: every doc is its own canonical group
    of size 1 (the left join coalesces unpaired docs to themselves)."""
    import os

    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import (
        q_dedup_groups,
    )

    docs = spark.createDataFrame(
        [(i, f"totally unique{i} words{i} here{i} now{i}") for i in range(12)],
        "doc_id long, text string",
    )
    sf = str(tmp_path)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    rows = q_dedup_groups(spark, sf).collect()
    assert len(rows) == 12
    assert all(r.group_id == r.doc_id and r.is_canonical for r in rows)
    assert all(r.group_size == 1 for r in rows)


def test_contamination_empty_benchmark(spark, tmp_path):
    """No doc_id hits the benchmark modulus -> empty benchmark slice ->
    zero contaminated docs (and no error from the empty broadcast)."""
    import os

    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import (
        CONTAM_BENCH_MOD,
        q_contamination,
    )

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(1, 8)],  # no multiples of MOD
        "doc_id long, text string",
    )
    assert all(i % CONTAM_BENCH_MOD != 0 for i in range(1, 8))
    sf = str(tmp_path)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))
    assert q_contamination(spark, sf).count() == 0
