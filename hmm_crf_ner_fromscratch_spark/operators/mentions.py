"""K3: mention table construction from decoded turns.

Input: the decoded transcript frame (one row per turn, ``tokens`` +
``tags_pred`` arrays plus key columns). Output: one row per mention:

  ``conv_id string, turn_idx int, role string, tool string,
    span_start int, span_end int, entity_type string, surface string``

Implemented as ``mapInPandas`` over Arrow batches with the flat-vectorized
span kernel (functions/mentions.py) -- no token-level shuffle is ever
introduced; the operator is embarrassingly parallel over the decode
output's partitioning.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MENTION_SCHEMA_SUFFIX = (
    "span_start int, span_end int, entity_type string, surface string"
)


def extract_mentions(
    decoded: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx", "role", "tool"),
    token_col: str = "tokens",
    tag_col: str = "tags_pred",
    scheme: str = "bio",
) -> DataFrame:
    """Explode decoded turns into a mentions table."""
    from ..functions.mentions import extract_spans_batch
    from .partitioning import fan_out

    key_cols = tuple(c for c in key_cols if c in decoded.columns)
    # fan the narrow projection out off unsplittable scans so the span
    # kernel uses the cores (no-op when the input is already parallel,
    # e.g. the fanned-out decode outputs)
    in_df = fan_out(decoded.select(*key_cols, token_col, tag_col))
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in in_df.schema.fields[: len(key_cols)]
    )
    out_schema = f"{key_schema}, {MENTION_SCHEMA_SUFFIX}" if key_schema else MENTION_SCHEMA_SUFFIX

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows, starts, ends, types, surfaces = extract_spans_batch(
                pdf[token_col].tolist(), pdf[tag_col].tolist(), scheme=scheme
            )
            out = pdf.iloc[rows][list(key_cols)].reset_index(drop=True)
            out["span_start"] = pd.Series(starts, dtype="int32")
            out["span_end"] = pd.Series(ends, dtype="int32")
            out["entity_type"] = pd.Series(types, dtype=object)
            out["surface"] = pd.Series(surfaces, dtype=object)
            yield out

    return in_df.mapInPandas(emit, schema=out_schema)
