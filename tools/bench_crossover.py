"""Incremental-linking crossover measurement (round-3 item #4).

Round 2 argued (BENCH/BASELINE.md): the sandbox corpus has a BOUNDED
filler vocabulary, so the entity-link candidate set does not grow with
corpus size and full rescoring is corpus-independent -- on real
transcript corpora vocabulary grows with corpus size (Heaps' law) and
full rescoring grows while delta rescoring only touches changed blocks.
This tool turns that argument into a measured curve:

For each corpus size (default 1M/4M/8M turns) and each vocabulary
regime (bounded vs ``heaps_vocab=2.0``):

  1. build the transcript corpus, decode mentions with the CoNLL-trained
     HMM (fused decode+extract -- the real pipeline stage), derive
     candidate features;
  2. time FULL rescoring: ``score_block_pairs(blocked_candidates(C))``;
  3. time DELTA-SCOPED rescoring of a FIXED 100k-turn append: changed
     blocks = blocks containing any delta candidate; score only those
     against full block sizes (exactly plans/incremental.py's
     link-pair state update).

Expected shape: bounded-vocab full rescoring ~flat in corpus size
(the round-2 observation); Heaps full rescoring grows with corpus
size; delta rescoring ~flat in BOTH regimes. One JSON line per cell.

Usage: python tools/bench_crossover.py [sizes_csv] [delta_turns] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from hmm_crf_ner_fromscratch_spark.operators.fused import decode_and_extract
    from hmm_crf_ner_fromscratch_spark.operators.hmm import train_hmm
    from hmm_crf_ner_fromscratch_spark.operators.linking import (
        blocked_candidates,
        candidate_entities,
        candidate_features,
        score_block_pairs,
    )
    from hmm_crf_ner_fromscratch_spark.session import get_spark
    from hmm_crf_ner_fromscratch_spark.sources.conll import read_conll
    from hmm_crf_ner_fromscratch_spark.sources.transcripts import (
        synth_transcripts,
        tokenize_turns,
    )

    sizes = (
        [int(s) for s in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1_000_000, 4_000_000, 8_000_000]
    )
    delta_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    spark = get_spark(app_name="bench-crossover", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    model = train_hmm(
        read_conll(spark, "/root/reference/English/train.txt", doc_id="en")
    )

    def mention_candidates(tx):
        toks = tokenize_turns(tx).select(
            "conv_id", "turn_idx", "role", "tool", "tokens"
        )
        mentions = decode_and_extract(toks, model)
        return candidate_features(candidate_entities(mentions))

    for heaps in (0.0, 2.0):
        # fixed-size delta: fresh conversations, same vocabulary regime
        delta_tx = synth_transcripts(
            spark, delta_turns, seed=99, heaps_vocab=heaps
        ).withColumn("conv_id", F.concat(F.lit("new_"), F.col("conv_id")))
        delta_cands = mention_candidates(delta_tx).persist()
        n_delta_cands = delta_cands.count()
        changed = (
            blocked_candidates(delta_cands).select("block").distinct().persist()
        )
        n_changed = changed.count()

        for n in sizes:
            tx = synth_transcripts(spark, n, seed=5, heaps_vocab=heaps)
            cands = mention_candidates(tx).persist()
            n_cands = cands.count()

            blocked = blocked_candidates(cands)
            t0 = time.time()
            full_pairs = score_block_pairs(blocked).count()
            full_sec = round(time.time() - t0, 2)

            grown = cands.unionByName(delta_cands).dropDuplicates(["key"])
            grown_blocked = blocked_candidates(grown)
            t0 = time.time()
            # membership of changed blocks only; the semi-join keeps every
            # member of a changed block, so sizes computed from it ARE the
            # full block sizes the explosion guard needs. (The real
            # incremental pipeline additionally avoids the full-corpus
            # semi-join scan via block-hash bucket pruning of its
            # membership state -- plans/incremental.py.)
            scoped = grown_blocked.join(changed, "block", "left_semi")
            sizes_df = scoped.groupBy("block").agg(F.count(F.lit(1)).alias("bn"))
            delta_pairs = score_block_pairs(scoped, sizes=sizes_df).count()
            delta_sec = round(time.time() - t0, 2)

            print(
                json.dumps(
                    {
                        "heaps_vocab": heaps,
                        "n_turns": n,
                        "n_candidates": n_cands,
                        "full_rescore_sec": full_sec,
                        "full_pairs": full_pairs,
                        "delta_turns": delta_turns,
                        "delta_candidates": n_delta_cands,
                        "changed_blocks": n_changed,
                        "delta_rescore_sec": delta_sec,
                        "delta_pairs": delta_pairs,
                        "load_start": round(os.getloadavg()[0], 2),
                    }
                ),
                flush=True,
            )
            cands.unpersist()
        delta_cands.unpersist()
        changed.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
