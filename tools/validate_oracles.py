"""Driver-compare rehearsal: run every QUERIES entry on Spark and its
ORACLES SQL on DuckDB over the same sf dir; compare row count, column
names, and order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/validate_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from hmm_crf_ner_fromscratch_spark.plans.entry_queries import (  # noqa: E402
    ORACLES,
    QUERIES,
)
from hmm_crf_ner_fromscratch_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return v


def frame_signature(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="validate-oracles")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        spark_pdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in ORACLES:
            print(f"[rows-only] {name}: {len(spark_pdf)} rows  ({t1-t0:.1f}s)")
            if len(spark_pdf) == 0:
                failures.append((name, "0 rows"))
            continue
        duck_pdf = con.sql(ORACLES[name]).df()
        sc, sr = frame_signature(spark_pdf)
        dc, dr = frame_signature(duck_pdf)
        status = "OK"
        if sc != dc:
            status = f"COLUMN MISMATCH spark={sc} duck={dc}"
        elif len(sr) != len(dr):
            status = f"ROWCOUNT MISMATCH spark={len(sr)} duck={len(dr)}"
        elif sr != dr:
            diffs = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            examples = [(sr[i], dr[i]) for i in diffs]
            status = f"VALUE MISMATCH at sorted rows {diffs}: {examples}"
        print(f"[{status[:160]}] {name}: {len(sr)} rows  ({t1-t0:.1f}s)")
        if status != "OK":
            failures.append((name, status[:400]))
    spark.stop()
    if failures:
        print("\nFAILURES:")
        for n, s in failures:
            print(f"  {n}: {s}")
        sys.exit(1)
    print("\nALL ORACLE CHECKS PASSED")


if __name__ == "__main__":
    main()
