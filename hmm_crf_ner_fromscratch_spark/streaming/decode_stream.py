"""Structured Streaming variant of the decode pipeline.

The reference is pure batch (no streaming anywhere in it -- SURVEY SS1.3),
so this layer is an engine-completeness extension, not a parity target:
transcripts arriving as files (or Kafka on a real deployment) are decoded
incrementally with the same broadcast model + fused Arrow kernel as the
batch path -- decode is stateless per turn, so it composes with streaming
for free, and checkpointing gives exactly-once file-sink semantics.

Also provides a watermarked windowed aggregation (mentions per entity
type per time window) as the late-data-handling pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fused import decode_and_extract
from ..sources.transcripts import TRANSCRIPT_COLUMNS, tokenize_turns

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcript_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 32
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_decode_mentions(
    stream: DataFrame,
    model,
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Incrementally decode arriving turns into the mentions table.
    Returns the StreamingQuery (caller awaits termination)."""
    mentions = decode_and_extract(
        tokenize_turns(stream.select(*TRANSCRIPT_COLUMNS)), model
    )
    writer = (
        mentions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_mention_rates(
    stream: DataFrame,
    model,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window mention counts per entity type. Late
    rows beyond the watermark are dropped; state is bounded by
    (windows in watermark horizon) x (entity types)."""
    turns = tokenize_turns(stream.select(*TRANSCRIPT_COLUMNS))
    # the watermark is declared once, downstream of the UDF (ts survives
    # mapInPandas as a data column; redefining a watermark is disallowed)
    mentions = decode_and_extract(
        turns,
        model,
        key_cols=("conv_id", "turn_idx", "role", "tool", "ts"),
    )
    return (
        mentions.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "entity_type")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "entity_type",
            "n_mentions",
        )
    )
