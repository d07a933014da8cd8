"""PySpark-native knowledge-graph construction pipeline.

A from-scratch Spark engine with the query/data-processing capabilities of
the reference NER codebase (``InfiniteLoopCoder/HMM-CRF-NER-FromScratch``):
HMM and linear-chain CRF sequence labelers (train + vectorized Viterbi
decode), CoNLL ingest/emit, token-level evaluation -- extended into the KG
construction pipeline mandated by BASELINE.json: transcript ingest, mention
assembly, relation templating, entity linking, connected-components
canonicalization, and graph materialization, plus large-scale training-data
operators (dedup, similarity search, text analysis).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, broadcast models, and Arrow-batched pandas UDFs for the sequence
DP kernels (never per-row Python UDFs).
"""

__version__ = "0.1.0"
