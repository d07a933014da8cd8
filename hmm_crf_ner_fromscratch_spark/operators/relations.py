"""K4: deterministic relation templating -- mentions -> (subj, pred, obj)
triples.

No reference implementation exists (the reference stops at per-token
tags); these rules are mandated by BASELINE.json ``north_star`` ("relation
templating into (subj, pred, obj) triples"). They are deliberately simple,
deterministic, and *shared* with the plain-Python oracle used by the e2e
P/R test, so P/R vs the reference extraction reduces to decode parity.

Rules:
  R1 (within-turn type pairs): for every ordered mention pair (a, b) in
     the same turn with ``a.span_end <= b.span_start`` and
     ``(a.entity_type, b.entity_type)`` in RULES, emit
     ``(a.surface, RULES[pair], b.surface)``.
  R2 (tool provenance): every mention in a ``role='tool'`` turn emits
     ``(tool, 'returned', surface)``.
  R3 (cross-turn co-occurrence, window w): mention a at turn t and mention
     b at turn t' with ``0 < t' - t <= w`` in the same conversation, both
     PER/NAME, emit ``(a.surface, 'co_mentioned_with', b.surface)``.

Physical notes: R1 is a self-join on (conv_id, turn_idx) -- turn-local, so
partition-pruned by the mentions table's layout and bounded by turn length.
R3 avoids an unbounded per-conv_id join (skew!) by bucketing turn_idx into
width-w blocks and joining each mention against its own and the previous
block: every candidate pair is matched exactly once, and join groups stay
bounded regardless of conversation length. The type-pair rule table is a
broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (subj_type, obj_type) -> predicate. English BIO types + Chinese BMES types.
RELATION_RULES: dict[tuple[str, str], str] = {
    ("PER", "ORG"): "affiliated_with",
    ("PER", "LOC"): "located_in",
    ("ORG", "LOC"): "based_in",
    ("PER", "PER"): "associated_with",
    ("ORG", "ORG"): "related_to",
    ("PER", "MISC"): "involved_in",
    ("ORG", "MISC"): "involved_in",
    # Chinese resume corpus types (Chinese/tag.txt)
    ("NAME", "ORG"): "affiliated_with",
    ("NAME", "TITLE"): "holds_title",
    ("NAME", "EDU"): "educated_as",
    ("NAME", "LOC"): "located_in",
    ("NAME", "PRO"): "works_in",
    ("TITLE", "ORG"): "title_at",
}

TRIPLE_COLUMNS = [
    "subj", "pred", "obj", "subj_type", "obj_type", "conv_id", "turn_idx",
]


def _rules_df(spark):
    from ..session import local_df

    return local_df(
        spark,
        [(s, o, p) for (s, o), p in RELATION_RULES.items()],
        "subj_type string, obj_type string, pred string",
    )


def template_triples(
    mentions: DataFrame, cross_turn_window: int = 0
) -> DataFrame:
    """Apply R1-R3 to a mentions table; returns the triples table.

    ``cross_turn_window`` <= 0 disables R3.
    """
    spark = mentions.sparkSession
    m = mentions.select(
        "conv_id", "turn_idx", "role", "tool", "span_start", "span_end",
        "entity_type", "surface",
    )

    # R1: within-turn ordered pairs, predicate via broadcast rule join.
    a = m.alias("a")
    b = m.alias("b")
    pairs = a.join(
        b,
        on=[
            F.col("a.conv_id") == F.col("b.conv_id"),
            F.col("a.turn_idx") == F.col("b.turn_idx"),
            F.col("a.span_end") <= F.col("b.span_start"),
        ],
    )
    r1 = pairs.join(
        F.broadcast(_rules_df(spark)),
        on=[
            F.col("a.entity_type") == F.col("subj_type"),
            F.col("b.entity_type") == F.col("obj_type"),
        ],
    ).select(
        F.col("a.surface").alias("subj"),
        F.col("pred"),
        F.col("b.surface").alias("obj"),
        F.col("subj_type"),
        F.col("obj_type"),
        F.col("a.conv_id").alias("conv_id"),
        F.col("a.turn_idx").alias("turn_idx"),
    )

    # R2: tool provenance.
    r2 = m.where((F.col("role") == "tool") & F.col("tool").isNotNull()).select(
        F.col("tool").alias("subj"),
        F.lit("returned").alias("pred"),
        F.col("surface").alias("obj"),
        F.lit("TOOL").alias("subj_type"),
        F.col("entity_type").alias("obj_type"),
        "conv_id",
        "turn_idx",
    )

    out = r1.unionByName(r2)

    if cross_turn_window > 0:
        w = cross_turn_window
        person = m.where(F.col("entity_type").isin("PER", "NAME"))
        left = person.select(
            "conv_id",
            F.col("turn_idx").alias("t_a"),
            F.col("surface").alias("subj"),
            F.col("entity_type").alias("subj_type"),
            F.explode(
                F.array(
                    (F.col("turn_idx") / w).cast("long"),
                    (F.col("turn_idx") / w).cast("long") + 1,
                )
            ).alias("blk"),
        )
        right = person.select(
            "conv_id",
            F.col("turn_idx").alias("t_b"),
            F.col("surface").alias("obj"),
            F.col("entity_type").alias("obj_type"),
            (F.col("turn_idx") / w).cast("long").alias("blk"),
        )
        r3 = (
            left.join(right, ["conv_id", "blk"])
            .where((F.col("t_b") > F.col("t_a")) & (F.col("t_b") - F.col("t_a") <= w))
            .select(
                "subj",
                F.lit("co_mentioned_with").alias("pred"),
                "obj",
                "subj_type",
                "obj_type",
                "conv_id",
                F.col("t_a").alias("turn_idx"),
            )
            .distinct()
        )
        out = out.unionByName(r3)
    return out
