"""Transcript table source: the pipeline's 10^12-turn-scale input.

Schema fixed by BASELINE.json ``input_hint``:
  ``conv_id string, turn_idx int, role string, text string, tool string,
  ts timestamp``

Two pieces:

* :func:`synth_transcripts` -- a deterministic, fully distributed synthetic
  generator (pure function of (seed, n_turns); built from ``spark.range``
  + hash-derived columns, so generating 10^9 turns never touches the
  driver). Conversation sizes follow a long-tailed distribution so a few
  conversations are huge -- this exercises the salting path. A designated
  eval slice embeds reference CoNLL validation sentences verbatim
  (one sentence per turn) so the per-turn text-equality invariant and the
  HMM bit-match goldens apply end-to-end through the transcript path.

* :func:`salted_turns` -- K1 ingest windowing: decode is per-turn, so a
  single million-turn conversation must not pin one task. We repartition by
  the composite key ``(conv_id, turn_idx // bucket)``: bounded task sizes,
  order restored downstream by ``(conv_id, turn_idx)`` sort keys carried on
  every row. (Windowed cross-turn operators later use bucket overlap +
  dedupe, see operators/relations.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "calculator", "browser", "sql", "python"]

# Word pool for filler turns; real tokens come from the eval slice. The
# capitalized entries are frequent CoNLL entity surfaces so that decoding
# filler turns with a CoNLL-trained model produces a realistic mention
# rate (benchmarks exercise the whole mentions->triples path).
_FILLER_WORDS = [
    "the", "a", "on", "in", "said", "to", "of", "and", "for", "with",
    "market", "team", "game", "report", "price", "week", "year", "city",
    "group", "bank", "match", "season", "court", "trade", "talks", "told",
    "first", "two", "new", "last", "percent", "million", "government",
    "president", "minister", "police", "company", "shares", "points",
    "Germany", "Clinton", "U.N.", "Russia", "England", "Michael", "Paris",
    "Reuters", "France", "Wall", "Street", "United", "States", "Iraq",
]


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    seed: int = 42,
    eval_sentences: list[str] | None = None,
    n_convs: int | None = None,
    heaps_vocab: float = 0.0,
) -> DataFrame:
    """Deterministic synthetic transcript table of exactly the input_hint
    shape, generated distributively.

    Conversation assignment is long-tailed: conversation ``c`` owns a
    contiguous block of turns whose size grows quadratically with rank, so
    conversation 0 holds ~2/n of all turns at any scale -- a reproducible
    skew fixture. ``eval_sentences`` (if given) are appended as dedicated
    eval conversations (250 turns each), text verbatim.

    ``heaps_vocab`` > 0 turns on Heaps-law vocabulary growth: roughly one
    word in four is replaced by an entity-like token ``Ent<id>`` drawn
    uniformly from an id range that grows with the absolute turn index as
    ``floor(heaps_vocab * (i+1)^0.7)`` -- so the number of DISTINCT
    surfaces in the corpus grows sublinearly with corpus size, the way
    real transcript corpora grow entity vocabulary (Heaps' law, beta ~
    0.7). The default 0.0 keeps the bounded filler vocabulary (round-2
    behavior). This is the fixture for the incremental-linking crossover
    measurement (tools/bench_crossover.py): bounded vocab makes full
    rescoring corpus-independent; Heaps vocab makes it grow while
    delta-scoped rescoring tracks only changed blocks.
    """
    if n_convs is None:
        n_convs = max(4, int(n_turns**0.5))

    base = spark.range(0, n_turns, 1).withColumnRenamed("id", "i")
    # Quartic block boundaries: conv c starts at n_turns * (c/n_convs)^4, so
    # conversation sizes grow cubically with rank -- the largest holds ~4x
    # the mean, a reproducible long-tail skew fixture at any scale.
    # Invert: c = floor(n_convs * (i / n_turns)^(1/4)).
    conv_rank = F.floor(
        F.lit(n_convs) * F.pow(F.col("i") / F.lit(n_turns), F.lit(0.25))
    )
    conv_rank = F.least(conv_rank, F.lit(n_convs - 1))
    h = F.xxhash64(F.col("i"), F.lit(seed))
    word_pool = F.array(*[F.lit(w) for w in _FILLER_WORDS])
    n_words = F.pmod(F.xxhash64(F.col("i"), F.lit(seed + 1)), F.lit(12)) + 3

    def word_at(k):
        filler = F.element_at(
            word_pool,
            (F.pmod(F.xxhash64(F.col("i"), F.lit(seed + 2), k), F.lit(len(_FILLER_WORDS)))
             + 1).cast("int"),
        )
        if heaps_vocab <= 0:
            return filler
        vocab_size = F.greatest(
            F.lit(1),
            F.floor(F.lit(heaps_vocab) * F.pow(F.col("i") + 1, F.lit(0.7))),
        )
        ent = F.concat(
            F.lit("Ent"),
            F.pmod(F.xxhash64(F.col("i"), F.lit(seed + 5), k), vocab_size),
        )
        return F.when(
            F.pmod(F.xxhash64(F.col("i"), F.lit(seed + 4), k), F.lit(4)) == 0, ent
        ).otherwise(filler)

    text = F.array_join(
        F.transform(F.sequence(F.lit(1), n_words), word_at),
        " ",
    )
    role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]),
        (F.pmod(h, F.lit(3)) + 1).cast("int"),
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.pmod(F.xxhash64(F.col("i"), F.lit(seed + 3)), F.lit(len(_TOOLS))) + 1).cast("int"),
        ),
    )
    from pyspark.sql import Window

    # Exact dense per-conv turn numbering (float inversion of the block
    # boundary is off-by-one at boundaries): row_number within conv. Groups
    # are bounded (max ~4 * n_turns/n_convs rows), so the window is safe.
    df = (
        base.select(
            F.format_string("conv_%08d", conv_rank).alias("conv_id"),
            F.col("i"),
            role.alias("role"),
            text.alias("text"),
            tool.alias("tool"),
            (
                F.to_timestamp(F.lit("2026-01-01 00:00:00"))
                + F.make_interval(secs=F.col("i") * 7 % 86_400)
            ).alias("ts"),
        )
        .withColumn(
            "turn_idx",
            (
                F.row_number().over(Window.partitionBy("conv_id").orderBy("i")) - 1
            ).cast("int"),
        )
        .select(*TRANSCRIPT_COLUMNS)
    )

    if eval_sentences:
        rows = []
        per_conv = 250
        for j, sent in enumerate(eval_sentences):
            rows.append(
                (
                    f"eval_{j // per_conv:06d}",
                    j % per_conv,
                    "user",
                    sent,
                    None,
                )
            )
        from ..session import local_df

        eval_df = local_df(
            spark,
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string",
        ).withColumn(
            "ts",
            F.to_timestamp(F.lit("2026-02-01 00:00:00"))
            + F.make_interval(secs=F.col("turn_idx")),
        )
        df = df.unionByName(eval_df)
    return df


def load_eval_sentences(path: str) -> list[str]:
    """Space-joined sentences from a CoNLL file (words = first field),
    preserving file order -- the per-turn-text-equality eval slice."""
    sents: list[str] = []
    cur: list[str] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                if cur:
                    sents.append(" ".join(cur))
                    cur = []
                continue
            cur.append(line.split()[0])
    if cur:
        sents.append(" ".join(cur))
    return sents


def tokenize_turns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """K2: whitespace tokenization, matching the reference's pre-tokenized
    CoNLL convention. Python's argless ``str.split()`` (``hmm_ner.py:30``)
    drops empty strings, so empty/whitespace-only turns must yield an empty
    token array, not [''] -- hence the filter after the regex split."""
    return df.withColumn(
        "tokens",
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != ""),
    )


def salted_turns(df: DataFrame, bucket: int = 4096, partitions: int | None = None) -> DataFrame:
    """K1 salting: repartition by (conv_id, turn_idx // bucket) so a
    pathologically long conversation spreads over ceil(len/bucket) tasks.
    Decode is per-turn, so correctness is unaffected; downstream per-conv
    operators re-sort by (conv_id, turn_idx)."""
    salted = df.withColumn("_salt", (F.col("turn_idx") / F.lit(bucket)).cast("long"))
    n = partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    return salted.repartition(n, "conv_id", "_salt").drop("_salt")
