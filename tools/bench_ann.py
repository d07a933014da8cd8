"""ANN recall/latency tradeoff sweep (round-3 item #7).

Sweeps LSH ``n_planes`` x multi-probe and IVF ``n_clusters`` x
``n_probe`` at a given sf dir, reporting recall@10 vs the brute-force
cosine baseline plus wall time per configuration. Emits one JSON line
per config to stdout and a markdown table to stderr for
BENCH/BASELINE.md.

Recall@10 = |approx top-10 ∩ exact top-10| / 10, averaged over the
query set (the standard ANN-benchmarks metric).

Usage: python tools/bench_ann.py [sf_dir] [n_queries]

``sf_dir`` may also be ``synth:N[:dim[:clusters]]`` (e.g. ``synth:1000000``):
a deterministic clustered corpus of N vectors is generated distributively
(spark.range + hash-derived floats, vector = centroid + 0.35*noise so
nearest-neighbor structure exists and recall@10 is a meaningful number;
uniform random vectors would make every method look equally bad) and
cached as parquet under /tmp. This is the round-4 scale validation of
``planes_for_corpus``: at >=100k vectors the sweep switches to the
large-corpus grid (fixed plane counts that bracket the adaptive choice,
plus ``planes=auto``) to show the occupancy-targeted default holds the
recall/latency knee where fixed counts degrade.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _synth_corpus(spark, spec: str):
    """``synth:N[:dim[:clusters]]`` -> cached parquet path of a clustered
    deterministic corpus with the embeddings.parquet schema."""
    from pyspark.sql import functions as F

    parts = spec.split(":")
    n = int(parts[1])
    dim = int(parts[2]) if len(parts) > 2 else 64
    n_clusters = int(parts[3]) if len(parts) > 3 else max(16, n // 1000)
    path = f"/tmp/ann_synth_{n}_{dim}_{n_clusters}"
    if not os.path.isdir(path):

        def hfloat(*cols):
            return (F.pmod(F.xxhash64(*cols), F.lit(2_000_001)) - 1_000_000) / 1e6

        base = spark.range(0, n)
        c = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_clusters))
        emb = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (hfloat(c, j, F.lit(2)) + 0.35 * hfloat(F.col("id"), j, F.lit(3))).cast(
                "float"
            ),
        )
        base.select(
            F.col("id").alias("vec_id"),
            emb.alias("embedding"),
            c.cast("int").alias("label"),
        ).write.parquet(path)
    return path


def main() -> None:
    from pyspark.sql import functions as F

    from hmm_crf_ner_fromscratch_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )
    from hmm_crf_ner_fromscratch_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = 10

    spark = get_spark(app_name="bench-ann")
    spark.sparkContext.setLogLevel("ERROR")
    if sf_dir.startswith("synth:"):
        emb_path = _synth_corpus(spark, sf_dir)
    else:
        emb_path = f"{sf_dir}/embeddings.parquet"
    emb = spark.read.parquet(emb_path).persist()
    n_vecs = emb.count()
    query_ids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").limit(n_queries).collect()]

    def truth():
        t0 = time.time()
        rows = brute_force_topk(emb, query_ids, k=k).collect()
        sec = time.time() - t0
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
        return by_q, sec

    exact, brute_sec = truth()
    # second run = steady-state latency (JIT/broadcast warm)
    _, brute_sec_warm = truth()

    def recall(rows) -> float:
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
        vals = [
            len(by_q.get(q, set()) & exact[q]) / len(exact[q]) for q in exact
        ]
        return sum(vals) / len(vals)

    results = []

    def run(label, params, fn):
        fn().count()  # warm (plan compile + broadcast); timing is 2nd run
        t0 = time.time()
        rows = fn().collect()
        sec = round(time.time() - t0, 2)
        rec = round(recall(rows), 4)
        results.append({"config": label, **params, "recall_at_10": rec, "sec": sec})
        print(json.dumps(results[-1]), flush=True)

    from hmm_crf_ner_fromscratch_spark.operators.similarity import (
        planes_for_corpus,
    )

    auto_planes = planes_for_corpus(n_vecs)
    if n_vecs >= 100_000:
        # large-corpus grid: fixed plane counts bracketing the adaptive
        # choice; multi-probe always (the small-corpus sweep settled that)
        lsh_grid = sorted({6, 8, auto_planes, auto_planes + 4})
        lsh_probe = (True,)
        ivf_grid = [(64, 1), (64, 4), (256, 1), (256, 4)]
    else:
        lsh_grid = (4, 6, 8, 10, 12)
        lsh_probe = (False, True)
        ivf_grid = [(c, p) for c in (8, 16, 32) for p in (1, 2, 4)]

    for n_planes in lsh_grid:
        for mp in lsh_probe:
            auto = " (auto)" if n_planes == auto_planes else ""
            run(
                f"lsh planes={n_planes}{auto} probe={'h1' if mp else 'exact-bucket'}",
                {"kind": "lsh", "n_planes": n_planes, "multi_probe": mp,
                 "is_auto": n_planes == auto_planes},
                lambda n_planes=n_planes, mp=mp: lsh_topk(
                    emb, query_ids, k=k, n_planes=n_planes, multi_probe=mp
                ),
            )
    for n_clusters, n_probe in ivf_grid:
        run(
            f"ivf cells={n_clusters} probe={n_probe}",
            {"kind": "ivf", "n_clusters": n_clusters, "n_probe": n_probe},
            lambda n_clusters=n_clusters, n_probe=n_probe: ivf_topk(
                emb, query_ids, k=k, n_clusters=n_clusters, n_probe=n_probe
            ),
        )

    hdr = {
        "n_vecs": n_vecs,
        "n_queries": n_queries,
        "k": k,
        "auto_planes": auto_planes,
        "brute_force_sec_cold": round(brute_sec, 2),
        "brute_force_sec_warm": round(brute_sec_warm, 2),
        "load_start": round(os.getloadavg()[0], 2),
    }
    print(json.dumps({"meta": hdr}), flush=True)

    print("\n| config | recall@10 | sec |", file=sys.stderr)
    print("|---|---|---|", file=sys.stderr)
    print(f"| brute force (exact) | 1.0 | {hdr['brute_force_sec_warm']} |", file=sys.stderr)
    for r in results:
        print(f"| {r['config']} | {r['recall_at_10']} | {r['sec']} |", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
