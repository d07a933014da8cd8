"""Evaluate saved CRF checkpoints on a CoNLL validation file.

Scores each checkpoint dir (``CRFModel.save`` layout) with the same
validation metric as ``tools/train_crf_full.py`` (token accuracy +
entity micro-P/R/F1 with check.py semantics: labels exclude O), so a
training run that died between ``model_avg``'s save and its evaluation
can be adjudicated from the surviving artifact.

Usage: python tools/eval_crf_checkpoint.py <ckpt_dir> [<ckpt_dir> ...]
       [--corpus English] [--out /path/to/append.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    import argparse

    from hmm_crf_ner_fromscratch_spark.functions.crf import CRFModel
    from hmm_crf_ner_fromscratch_spark.operators.crf import decode_crf
    from hmm_crf_ner_fromscratch_spark.sources.conll import read_conll
    from hmm_crf_ner_fromscratch_spark.session import get_spark

    ap = argparse.ArgumentParser(
        description="Score saved CRF checkpoint dirs on a validation file"
    )
    ap.add_argument("checkpoints", nargs="+", help="CRFModel.save dirs")
    ap.add_argument("--corpus", default="English")
    ap.add_argument("--out", default=None, help="append results JSONL here")
    ns = ap.parse_args()
    args, corpus, out_path = ns.checkpoints, ns.corpus, ns.out

    spark = get_spark(app_name="crf-eval", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    val = read_conll(
        spark, f"/root/reference/{corpus}/validation.txt", doc_id="v"
    ).persist()
    val.count()

    for ckpt in args:
        t0 = time.time()
        model = CRFModel.load(ckpt)
        decoded = decode_crf(val.drop("tags"), model).select("sent_id", "tags_pred")
        j = decoded.join(val.select("sent_id", "tags"), "sent_id")
        pairs = j.select(
            F.explode(
                F.arrays_zip(F.col("tags_pred").alias("p"), F.col("tags").alias("g"))
            ).alias("x")
        ).select(F.col("x.p").alias("p"), F.col("x.g").alias("g"))
        agg = pairs.agg(
            F.avg((F.col("p") == F.col("g")).cast("double")).alias("acc"),
            F.sum(((F.col("p") == F.col("g")) & (F.col("g") != "O")).cast("long")).alias("tp"),
            F.sum(((F.col("p") != F.col("g")) & (F.col("p") != "O")).cast("long")).alias("fp"),
            F.sum(((F.col("p") != F.col("g")) & (F.col("g") != "O")).cast("long")).alias("fn"),
        ).first()
        prec = agg.tp / max(agg.tp + agg.fp, 1)
        rec = agg.tp / max(agg.tp + agg.fn, 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-12)
        res = {
            "ckpt": ckpt,
            "token_acc": agg.acc,
            "micro_p": prec,
            "micro_r": rec,
            "micro_f1": f1,
            "sec": round(time.time() - t0, 1),
        }
        print(json.dumps(res), flush=True)
        if out_path:
            with open(out_path, "a", encoding="utf-8") as f:
                f.write(json.dumps(res) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()


