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
cached as parquet under /tmp.

History: the round-4 1M-vector sweep FALSIFIED the then-default
occupancy-targeted plane count for top-k (auto=12 planes: recall@10
0.625 vs fixed 6 planes at 0.8875 for similar latency) and exposed the
per-centroid Catalyst-lambda IVF assignment as a scale-killer (282-774 s
vs 16 s exact brute force). Round 5 replaced both: ``lsh_auto_config``
picks (planes, probe_bits) from a recall model, and IVF assignment is a
vectorized mapInPandas matmul with an optional prebuilt index
(``assign_ivf``). At >=100k vectors this sweep validates exactly those
two fixes: the auto LSH config vs fixed brackets (including the old
12-plane choice for contrast), and IVF with/without a prebuilt index,
with codebook-train and index-build times reported separately in meta.
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
    # read BEFORE any Spark work: a reading at the end reports the
    # sweep's own executor load, not box idleness (round-4 lesson)
    load_start = round(os.getloadavg()[0], 2)
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
        assign_ivf,
        kmeans_centroids,
        lsh_auto_config,
        planes_for_corpus,
    )

    auto_planes, auto_bits = lsh_auto_config()
    occ_planes = planes_for_corpus(n_vecs)  # the old (near-dup) default
    extra_meta = {}
    if n_vecs >= 100_000:
        # large-corpus grid: the auto config, fixed 1-bit brackets, and
        # the old occupancy-targeted choice for contrast
        lsh_grid = [(6, 1), (8, 1), (auto_planes, auto_bits), (occ_planes, 1)]
        seen = set()
        lsh_grid = [g for g in lsh_grid if not (g in seen or seen.add(g))]
        ivf_grid = [(64, 1), (64, 4), (256, 1), (256, 4)]
    else:
        lsh_grid = [(p, b) for p in (4, 6, 8, 10, 12) for b in (0, 1)]
        ivf_grid = [(c, p) for c in (8, 16, 32) for p in (1, 2, 4)]

    for n_planes, bits in lsh_grid:
        auto = " (auto)" if (n_planes, bits) == (auto_planes, auto_bits) else ""
        run(
            f"lsh planes={n_planes}{auto} probe=h{bits}",
            {"kind": "lsh", "n_planes": n_planes, "probe_bits": bits,
             "is_auto": (n_planes, bits) == (auto_planes, auto_bits)},
            lambda n_planes=n_planes, bits=bits: lsh_topk(
                emb, query_ids, k=k, n_planes=n_planes, probe_bits=bits
            ),
        )
    for n_clusters in sorted({c for c, _ in ivf_grid}):
        # train + build once per cell count (the 100 TB shape: codebook
        # and assignment are index-build artifacts, not per-query work)
        t0 = time.time()
        C = kmeans_centroids(emb, n_clusters=n_clusters)
        train_sec = round(time.time() - t0, 2)
        t0 = time.time()
        idx = assign_ivf(emb, C).persist()
        idx.count()
        build_sec = round(time.time() - t0, 2)
        extra_meta[f"ivf_cells{n_clusters}_train_sec"] = train_sec
        extra_meta[f"ivf_cells{n_clusters}_build_sec"] = build_sec
        for c, n_probe in ivf_grid:
            if c != n_clusters:
                continue
            run(
                f"ivf cells={n_clusters} probe={n_probe} (indexed)",
                {"kind": "ivf", "n_clusters": n_clusters, "n_probe": n_probe,
                 "indexed": True, "train_sec": train_sec,
                 "build_sec": build_sec},
                lambda C=C, idx=idx, n_probe=n_probe: ivf_topk(
                    None, query_ids, k=k, n_probe=n_probe, codebook=C, index=idx
                ),
            )
        idx.unpersist()
    # one unindexed row: per-call matmul assignment cost (the round-4
    # Catalyst-lambda form took 282-774 s here; the fix should be ~brute)
    run(
        "ivf cells=64 probe=4 (per-call assign)",
        {"kind": "ivf", "n_clusters": 64, "n_probe": 4, "indexed": False},
        lambda: ivf_topk(emb, query_ids, k=k, n_clusters=64, n_probe=4),
    )

    hdr = {
        "n_vecs": n_vecs,
        "n_queries": n_queries,
        "k": k,
        "auto_planes": auto_planes,
        "auto_probe_bits": auto_bits,
        "occupancy_planes": occ_planes,
        "brute_force_sec_cold": round(brute_sec, 2),
        "brute_force_sec_warm": round(brute_sec_warm, 2),
        "load_start": load_start,
        "load_end": round(os.getloadavg()[0], 2),
        **extra_meta,
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
