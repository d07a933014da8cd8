"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-pipeline query (HMM train + batched
Viterbi decode + mention assembly + relation templating + entity linking +
connected components + edge aggregation) on /root/testdata/sf0.001.

``queries()`` / ``oracle_sql()`` expose every SURVEY.md SS2 operator with
a DuckDB oracle (validated locally with tools/validate_oracles.py) --
including the flagship KG pipeline and the HMM/CRF/transformer decodes,
whose oracles replay the model build and Viterbi DP as recursive CTEs
with pinned float semantics. As of round 4 every query has a value
oracle (38/38, ``gazetteer`` -- the CRF quality recipe's mining
aggregate -- joining in round 4): ``crf_decode_dict`` decodes with the committed
quantized Adagrad-trained weights (artifacts/crf_dict_model, built by
tools/make_crf_dict_artifact.py), so its oracle joins the same weight
parquet and replays the DP in int64 -- only the training *trajectory*
stays pytest-gated; ``kg_pipeline_crf`` runs that decode as the KG
mention-detection stage with the full edges tail mirrored in SQL; and
``cluster_context_counts`` oracles the distributed core of the
Brown-style word clustering. The deepest gate remains the bit-match
test suite against the reference implementation
(tests/test_hmm_parity.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import q_kg_pipeline

    return q_kg_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import ORACLES

    return dict(ORACLES)
