"""CoNLL corpus source/sink as DataFrame plans.

Reference behavior being reproduced (semantics only, Spark-first design):
  * train reader: one ``word tag`` pair per line, blank line = sentence
    boundary, final sentence flushed without trailing blank
    (reference ``hmm_ner.py:22-35``, ``crf_ner.py:539-558``).
  * predict reader: word is the first whitespace field; any remaining
    fields ignored (``hmm_ner.py:146-147``, ``crf_ner.py:678-680``).
  * writer: ``"{word} {tag}"`` per token, blank line between sentences
    (``hmm_ner.py:151-160``).

Output schema (one row per sentence; token order held in array columns):
  ``doc_id string, sent_id long, tokens array<string>, tags array<string>``

Scale note: sentence assembly needs a running count of blank lines, i.e. a
global ordered window. CoNLL files are *model-training inputs* (bounded,
file-sized); the 10^12-row scale path is the transcripts source
(``sources/transcripts.py``) where one row is already one sentence and no
ordered window is needed. For multi-GB CoNLL corpora, pass a directory of
files: the window below is partitioned by file, so each file's sentence
assembly runs independently in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_conll(
    spark: SparkSession,
    path: str,
    doc_id: str | None = None,
    with_tags: bool = True,
) -> DataFrame:
    """Read a CoNLL file (or directory of files) into the sentence schema.

    ``sent_id`` is the 0-based order of appearance within each file, which
    matches the reference's list order. Words are ``split()[0]``; tags are
    the last whitespace field (matches the most permissive reference reader,
    ``crf_ner.py:552``; identical to ``hmm_ner.py:30`` on 2-field input).
    """
    lines = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("file"),
            F.monotonically_increasing_id().alias("line_no"),
            F.trim(F.col("value")).alias("line"),
        )
    )
    per_file = Window.partitionBy("file").orderBy("line_no")
    with_sent = lines.withColumn(
        "sent_id",
        F.sum(F.when(F.col("line") == "", 1).otherwise(0)).over(per_file)
        - F.when(F.col("line") == "", 1).otherwise(0),
    ).where(F.col("line") != "")

    parts = F.split(F.col("line"), r"\s+")
    tok_struct = [
        F.col("line_no"),
        parts.getItem(0).alias("word"),
    ]
    if with_tags:
        tok_struct.append(F.element_at(parts, -1).alias("tag"))

    grouped = (
        with_sent.groupBy("file", "sent_id")
        .agg(F.array_sort(F.collect_list(F.struct(*tok_struct))).alias("toks"))
    )
    # Re-densify sent_id to 0..n-1 per file (blank-line runs create gaps).
    dense = grouped.withColumn(
        "sent_id",
        F.row_number().over(Window.partitionBy("file").orderBy("sent_id")).cast("long")
        - 1,
    )
    cols = [
        (F.lit(doc_id) if doc_id is not None else F.col("file")).alias("doc_id"),
        F.col("sent_id"),
        F.col("toks.word").alias("tokens"),
    ]
    if with_tags:
        cols.append(F.col("toks.tag").alias("tags"))
    return dense.select(*cols)


def conll_lines(df: DataFrame, tag_col: str = "tags") -> DataFrame:
    """Explode sentence rows back to CoNLL text lines, ordered.

    Returns ``DataFrame[doc_id, sent_id, pos, line]`` where ``line`` is
    ``"{word} {tag}"``. The blank separator lines are added by
    :func:`write_conll_local` (they carry no data).
    """
    zipped = F.arrays_zip(F.col("tokens").alias("word"), F.col(tag_col).alias("tag"))
    return (
        df.select("doc_id", "sent_id", F.posexplode(zipped).alias("pos", "wt"))
        .select(
            "doc_id",
            "sent_id",
            "pos",
            F.concat_ws(" ", F.col("wt.word"), F.col("wt.tag")).alias("line"),
        )
    )


def write_conll_local(df: DataFrame, out_path: str, tag_col: str = "tags") -> None:
    """Serialize to a single local CoNLL file, byte-compatible with the
    reference writer (``hmm_ner.py:151-160``): sentence order preserved,
    blank line after every sentence including the last.

    Test/golden-file sink only -- collects to the driver. The production
    sink is a partitioned table write.
    """
    rows = (
        df.select("sent_id", "tokens", F.col(tag_col).alias("tags"))
        .orderBy("sent_id")
        .collect()
    )
    with open(out_path, "w", encoding="utf-8") as f:
        for row in rows:
            for word, tag in zip(row.tokens, row.tags):
                f.write(f"{word} {tag}\n")
            f.write("\n")


def write_conll_local_transformer(
    df: DataFrame,
    out_path: str,
    tag_col: str = "tags",
    pad_tag: str = "<PAD>",
    max_seq_len: int = 512,
) -> None:
    """Transformer-variant CoNLL writer (``transformer_ner.py:607-631``):
    ``<PAD>`` predictions emit as ``O``; tokens beyond ``max_seq_len`` (or
    beyond the prediction array) emit as ``O``; blank lines go BETWEEN
    sentences only -- no trailing blank line after the last one. Same
    test-only single-file contract as :func:`write_conll_local`."""
    rows = (
        df.select("sent_id", "tokens", F.col(tag_col).alias("tags"))
        .orderBy("sent_id")
        .collect()
    )
    with open(out_path, "w", encoding="utf-8") as f:
        for i, row in enumerate(rows):
            preds = row.tags or []
            for j, word in enumerate(row.tokens):
                if j < len(preds) and j < max_seq_len:
                    tag = preds[j]
                    if tag == pad_tag:
                        tag = "O"
                else:
                    tag = "O"
                f.write(f"{word} {tag}\n")
            if i < len(rows) - 1:
                f.write("\n")
