"""A9: token-level tagging evaluation, check.py semantics.

Reference behavior (``check.py:19-41``): gold and predicted CoNLL files
aligned positionally, sklearn ``classification_report`` over the label
set EXCLUDING ``O`` (``check.py:38-40`` passes ``sort_labels[1:]``), i.e.
per-tag precision/recall/F1 plus micro/macro averages over entity tags
only. Re-expressed as a join + hash aggregates (fully SQL-expressible;
the dict-tagged variant is DuckDB-oracle-checked as ``eval_prf``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def token_pairs(gold: DataFrame, pred: DataFrame, key=("doc_id", "sent_id")) -> DataFrame:
    """Positionally aligned (gold_tag, pred_tag) pairs -- the J1 join.
    Inputs are sentence frames with ``tags`` / ``tags_pred`` arrays."""
    g = gold.select(*key, F.posexplode("tags").alias("pos", "gold"))
    p = pred.select(*key, F.posexplode("tags_pred").alias("pos", "pred"))
    return g.join(p, [*key, "pos"])


def evaluate_tagging(gold: DataFrame, pred: DataFrame, key=("doc_id", "sent_id")) -> DataFrame:
    """Per-tag + micro + macro P/R/F1 over non-O labels.

    Returns ``DataFrame[label, tp, fp, fn, precision, recall, f1]`` with
    extra rows ``label='micro_avg'`` and ``label='macro_avg'``.
    """
    pairs = token_pairs(gold, pred, key)
    per_gold = pairs.where(F.col("gold") != "O").groupBy(
        F.col("gold").alias("label")
    ).agg(
        F.sum((F.col("pred") == F.col("gold")).cast("long")).alias("tp"),
        F.sum((F.col("pred") != F.col("gold")).cast("long")).alias("fn"),
    )
    per_pred = pairs.where(F.col("pred") != "O").groupBy(
        F.col("pred").alias("label")
    ).agg(F.sum((F.col("pred") != F.col("gold")).cast("long")).alias("fp"))
    counts = per_gold.join(per_pred, "label", "full").na.fill(
        0, ["tp", "fn", "fp"]
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    per_label = counts.select(
        "label", "tp", "fp", "fn",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )
    micro = per_label.agg(
        F.lit("micro_avg").alias("label"),
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn"),
    ).select(
        "label", "tp", "fp", "fn",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )
    macro = per_label.agg(
        F.lit("macro_avg").alias("label"),
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn"),
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("f1").alias("f1"),
    )
    return per_label.unionByName(micro).unionByName(macro)
