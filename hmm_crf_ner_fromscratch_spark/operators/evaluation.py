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


def classification_report_pairs(pairs: DataFrame, labels: list[str]) -> DataFrame:
    """Full ``sklearn.metrics.classification_report`` semantics over a
    token-level ``(gold, pred)`` pairs frame with an explicit ordered
    label list -- the exact shape the reference's only evaluation
    artifact uses (``check.py:38-40``: ``labels=sort_labels[1:]``,
    per-label rows + micro/macro/weighted averages, ``digits=4`` is
    display-only).

    sklearn fixed-label-list semantics replicated precisely:

    * per-label P = tp/(tp+fp) with 0 on empty denominator (sklearn
      ``zero_division`` default), R = tp/(tp+fn), F1 = 2PR/(P+R) or 0;
      support = gold occurrences (tp+fn).
    * ``micro avg`` -- computed from summed counts over the label list
      (what sklearn prints instead of accuracy when ``labels`` is a
      proper subset).
    * ``macro avg`` -- unweighted mean over ALL listed labels,
      INCLUDING zero-support ones (a fixed list pins the denominator).
    * ``weighted avg`` -- support-weighted mean; 0 if total support 0.

    Numerics are engine-portable by construction: counts are exact
    longs, every ratio is a single IEEE division, and the macro /
    weighted sums are explicit left-associated expressions over the
    (compile-time) label list -- the DuckDB oracle mirrors the same
    expression trees, so values hash-match bit-for-bit.

    Returns ``DataFrame[label_idx, label, support, precision, recall,
    f1]`` with summary rows at label_idx = len(labels)..len(labels)+2.
    """
    from functools import reduce

    spark = pairs.sparkSession
    from ..session import local_df

    lab = local_df(
        spark, [(i, l) for i, l in enumerate(labels)], "label_idx int, label string"
    )
    per_gold = (
        pairs.where(F.col("gold").isin(labels))
        .groupBy(F.col("gold").alias("label"))
        .agg(
            F.sum((F.col("pred") == F.col("gold")).cast("long")).alias("tp"),
            F.sum((F.col("pred") != F.col("gold")).cast("long")).alias("fn"),
        )
    )
    per_pred = (
        pairs.where(F.col("pred").isin(labels))
        .groupBy(F.col("pred").alias("label"))
        .agg(F.sum((F.col("pred") != F.col("gold")).cast("long")).alias("fp"))
    )
    counts = (
        F.broadcast(lab)
        .join(per_gold, "label", "left")
        .join(per_pred, "label", "left")
        .na.fill(0, ["tp", "fn", "fp"])
        .localCheckpoint(eager=True)  # tiny (n_labels rows); reused 2x
    )

    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    per_label = counts.select(
        "label_idx",
        "label",
        (F.col("tp") + F.col("fn")).alias("support"),
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
    )

    # one-row pivot; summary expressions are built in explicit label-list
    # order so float addition order is pinned (and mirrored in SQL)
    piv = counts.agg(
        *[
            F.max(F.when(F.col("label") == l, F.col(c))).alias(f"{c}{i}")
            for i, l in enumerate(labels)
            for c in ("tp", "fp", "fn")
        ]
    )
    n = len(labels)

    def _lsum(cols):
        return reduce(lambda a, b: a + b, cols)

    def _p(i):
        return F.col(f"tp{i}") / F.greatest(F.col(f"tp{i}") + F.col(f"fp{i}"), F.lit(1))

    def _r(i):
        return F.col(f"tp{i}") / F.greatest(F.col(f"tp{i}") + F.col(f"fn{i}"), F.lit(1))

    def _f(i):
        p, r = _p(i), _r(i)
        return F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0)

    def _sup(i):
        return F.col(f"tp{i}") + F.col(f"fn{i}")

    tot_sup = _lsum([_sup(i) for i in range(n)])
    mic_tp = _lsum([F.col(f"tp{i}") for i in range(n)])
    mic_fp = _lsum([F.col(f"fp{i}") for i in range(n)])
    mic_fn = _lsum([F.col(f"fn{i}") for i in range(n)])
    mic_p = mic_tp / F.greatest(mic_tp + mic_fp, F.lit(1))
    mic_r = mic_tp / F.greatest(mic_tp + mic_fn, F.lit(1))
    mic_f = F.when(mic_p + mic_r > 0, 2 * mic_p * mic_r / (mic_p + mic_r)).otherwise(0.0)
    micro = piv.select(
        F.lit(n).alias("label_idx"), F.lit("micro_avg").alias("label"),
        tot_sup.alias("support"),
        mic_p.alias("precision"), mic_r.alias("recall"), mic_f.alias("f1"),
    )
    macro = piv.select(
        F.lit(n + 1).alias("label_idx"), F.lit("macro_avg").alias("label"),
        tot_sup.alias("support"),
        (_lsum([_p(i) for i in range(n)]) / n).alias("precision"),
        (_lsum([_r(i) for i in range(n)]) / n).alias("recall"),
        (_lsum([_f(i) for i in range(n)]) / n).alias("f1"),
    )
    wdiv = F.greatest(tot_sup, F.lit(1))
    weighted = piv.select(
        F.lit(n + 2).alias("label_idx"), F.lit("weighted_avg").alias("label"),
        tot_sup.alias("support"),
        (_lsum([_sup(i) * _p(i) for i in range(n)]) / wdiv).alias("precision"),
        (_lsum([_sup(i) * _r(i) for i in range(n)]) / wdiv).alias("recall"),
        (_lsum([_sup(i) * _f(i) for i in range(n)]) / wdiv).alias("f1"),
    )
    return per_label.unionByName(micro).unionByName(macro).unionByName(weighted)


def classification_report(
    gold: DataFrame,
    pred: DataFrame,
    labels: list[str],
    key=("doc_id", "sent_id"),
) -> DataFrame:
    """:func:`classification_report_pairs` over sentence frames (J1
    positional alignment first)."""
    return classification_report_pairs(token_pairs(gold, pred, key), labels)
