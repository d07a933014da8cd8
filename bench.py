"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "decode_tokens_per_sec": ...}

The headline is the flagship KG pipeline (train + Viterbi decode +
mentions + triples + linking + components + edges); supporting queries
cover dedup, similarity search, eval, and the relational operators.

Scaling-efficiency evidence (local[8] vs local[32]) lives in
tools/bench_scaling.py and BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

BENCH_QUERIES = [
    "kg_pipeline",
    "kg_pipeline_crf",
    "kg_incremental",
    "cluster_context_counts",
    "hmm_decode_dict",
    "crf_decode_fixed",
    "transformer_decode",
    "dedup_minhash",
    "dedup_groups",
    "pack_sequences",
    "stratified_sample",
    "sim_topk",
    "dict_mentions",
    "dict_triples",
    "eval_prf",
    "word_count",
    "pricing_summary",
    "sessionize",
]


LOAD_WARN = 2.0  # 1-min load above this at start -> numbers are suspect
LOAD_WAIT_SEC = 120  # grace window to let a transient spike drain
STEAL_WARN_PCT = 5.0  # hypervisor steal above this -> numbers are suspect


def _steal_probe(seconds: float = 2.0) -> float:
    """Percent CPU stolen by the hypervisor while this guest burns all
    cores -- the pollution loadavg CANNOT see (measured here: an idle
    guest on a busy host lost 15%+ to steal and benches degraded 2-3x
    while local load read 0.2). Burn briefly, read /proc/stat deltas."""
    import multiprocessing as mp

    def burn(stop_t):
        x = 0
        while time.time() < stop_t:
            x += 1

    try:
        before = open("/proc/stat").readline().split()[1:9]
        stop = time.time() + seconds
        procs = [
            mp.Process(target=burn, args=(stop,)) for _ in range(os.cpu_count())
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        after = open("/proc/stat").readline().split()[1:9]
        d = [int(y) - int(x) for x, y in zip(before, after)]
        return round(100.0 * d[7] / max(sum(d), 1), 1)
    except Exception:
        return -1.0


def _env_forensics(sf_dir: str) -> dict:
    """Environment snapshot recorded into the artifact so a driver-run
    bench that disagrees with an idle twin carries its own explanation
    (two rounds running, the driver artifact read ~1.6x slower than a
    same-code idle run at similar load_start -- uniformly across queries,
    including sub-second CPU-light ones, which implicates the CPU/host
    environment rather than any one plan)."""
    import shutil

    env: dict = {}
    # scheduling: can this process actually use all 32 cores?
    try:
        env["affinity_cores"] = len(os.sched_getaffinity(0))
    except Exception:
        env["affinity_cores"] = None
    try:  # cgroup v2 CPU quota ("max 100000" = unlimited)
        with open("/sys/fs/cgroup/cpu.max") as f:
            env["cgroup_cpu_max"] = f.read().strip()
    except Exception:
        env["cgroup_cpu_max"] = None
    # single-core compute probe: fixed numpy matmul, a direct "how fast is
    # one core right now" number independent of Spark and of I/O
    import numpy as np

    a = np.random.default_rng(0).random((1200, 1200))
    a @ a  # BLAS thread-pool warmup; untimed on both probes
    t0 = time.time()
    for _ in range(3):
        a @ a
    env["cpu_probe_matmul_sec"] = round(time.time() - t0, 3)
    # page-cache probe: read one input file twice; cold/warm ratio >> 1
    # means the corpus was not cached when the bench started
    probe = None
    try:
        import glob

        cands = sorted(glob.glob(os.path.join(sf_dir, "lineitem.parquet", "*.parquet")))
        if not cands:
            cands = sorted(glob.glob(os.path.join(sf_dir, "*.parquet")))
            cands = [c for c in cands if os.path.isfile(c)]
        if cands:
            probe = cands[0]
    except Exception:
        pass
    if probe:
        def _read(path):
            t = time.time()
            with open(path, "rb") as f:
                while f.read(1 << 22):
                    pass
            return round(time.time() - t, 4)

        env["input_read_cold_sec"] = _read(probe)
        env["input_read_warm_sec"] = _read(probe)
        env["input_probe_bytes"] = os.path.getsize(probe)
    # memory + scratch space
    try:
        mi = {}
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                mi[k] = v.strip()
        env["mem_available"] = mi.get("MemAvailable")
        env["mem_cached"] = mi.get("Cached")
    except Exception:
        pass
    try:
        env["tmp_free_gb"] = round(shutil.disk_usage("/tmp").free / 2**30, 1)
    except Exception:
        pass
    try:  # current effective clock (throttling shows up here)
        with open("/proc/cpuinfo") as f:
            mhz = [float(l.split(":")[1]) for l in f if l.startswith("cpu MHz")]
        env["cpu_mhz_mean"] = round(sum(mhz) / len(mhz), 0) if mhz else None
    except Exception:
        pass
    return env


def _wait_for_idle() -> float:
    """Return the 1-min load at (re)start; wait up to LOAD_WAIT_SEC for it
    to drop below LOAD_WARN so BENCH artifacts can't silently publish
    load-polluted numbers (BENCH_r02.json recorded a 10x-distorted
    decode_fused exactly this way). If the box never goes idle, proceed --
    the recorded load_start flags the artifact as suspect."""
    deadline = time.time() + LOAD_WAIT_SEC
    load1 = os.getloadavg()[0]
    while load1 > LOAD_WARN and time.time() < deadline:
        print(f"# WARNING: 1-min load {load1:.2f} > {LOAD_WARN}; waiting for idle box",
              file=sys.stderr)
        time.sleep(10)
        load1 = os.getloadavg()[0]
    if load1 > LOAD_WARN:
        print(f"# WARNING: benchmarking under external load {load1:.2f}; "
              "timings in this artifact are NOT trustworthy", file=sys.stderr)
    return load1


def main() -> None:
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import QUERIES
    from hmm_crf_ner_fromscratch_spark.session import get_spark

    load_start = _wait_for_idle()
    steal_pct = _steal_probe()
    sf_dir_early = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env_forensics = _env_forensics(sf_dir_early)
    if steal_pct > STEAL_WARN_PCT:
        print(f"# WARNING: hypervisor steal {steal_pct}% under load; timings "
              "are degraded by a noisy host neighbor", file=sys.stderr)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # session warm-up: boot python UDF workers + JIT paths on a tiny slice
    # so per-query timings measure the queries, not one-time session costs
    from hmm_crf_ner_fromscratch_spark.operators.fused import decode_and_extract
    from hmm_crf_ner_fromscratch_spark.operators.hmm import HMMModel
    import numpy as np

    warm_model = HMMModel(
        pi=np.zeros(2), A=np.zeros((2, 2)), B=np.log(np.full((2, 2), 0.5)),
        word_to_idx={"a": 0, "b": 1}, tag_to_idx={"O": 0, "B-X": 1},
        tag_counts={0: 1, 1: 1},
    )
    warm = docs.limit(256).select(
        F.lit("w").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.split("text", " ").alias("tokens"),
    )
    decode_and_extract(warm, warm_model, key_cols=("conv_id", "turn_idx")).count()

    # JVM warm-up: one tiny join+window+aggregate so whole-stage codegen /
    # JIT compilation is paid here, not inside the FIRST timed query
    # (kg_pipeline ran ~10.3 s cold vs 5.4 s on an identical warm rerun --
    # the delta is session warmup, not the query; same rationale as the
    # python-worker warm-up above). Round-over-round note: artifacts
    # before round 6 charged this cost to kg_pipeline.
    from pyspark.sql import Window as _W

    tiny = docs.limit(256).select("doc_id", "lang", F.length("text").alias("n"))
    (
        tiny.join(tiny.groupBy("lang").agg(F.sum("n").alias("s")), "lang")
        .withColumn(
            "r", F.row_number().over(_W.partitionBy("lang").orderBy("doc_id"))
        )
        .groupBy("lang")
        .agg(F.max("r"), F.sum("s"))
        .count()
    )

    timings: dict[str, float] = {}
    query_load: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        query_load[name] = round(os.getloadavg()[0], 2)
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    # repeat probe: re-run one cheap query; a large first/second gap under
    # equal load means the first run paid a cold cache, not a slow engine
    t0 = time.time()
    QUERIES["word_count"](spark, sf_dir).count()
    word_count_repeat = round(time.time() - t0, 3)

    # decode throughput proper: model trained untimed, fused decode timed
    from hmm_crf_ner_fromscratch_spark.operators.hmm import train_hmm
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import (
        OBJ_WORDS, OP_WORDS, _toks,
    )

    tagged = _toks(spark, sf_dir).select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.col("toks").alias("tokens"),
        F.transform(
            "toks",
            lambda w: F.when(w.isin(OP_WORDS), "B-OP")
            .when(w.isin(OBJ_WORDS), "B-OBJ")
            .otherwise("O"),
        ).alias("tags"),
    ).persist()
    dict_model = train_hmm(
        tagged.select(
            F.col("conv_id").alias("doc_id"),
            F.col("turn_idx").cast("long").alias("sent_id"),
            "tokens", "tags",
        )
    )
    all_tokens = tagged.select(F.sum(F.size("tokens"))).first()[0]
    t0 = time.time()
    decode_and_extract(tagged.drop("tags"), dict_model, key_cols=("conv_id", "turn_idx")).count()
    timings["decode_fused"] = round(time.time() - t0, 3)

    # CRF fused decode throughput: the committed trained artifact decoding
    # the FULL corpus (kg_pipeline_crf's oracle slice is 147 sentences --
    # correct but overhead-dominated; this measures the actual CRF Viterbi
    # + feature-extraction rate the KG CRF stage would sustain at scale)
    from hmm_crf_ner_fromscratch_spark.functions.crf import CRFModel
    from hmm_crf_ner_fromscratch_spark.operators.fused import decode_and_extract_crf
    from hmm_crf_ner_fromscratch_spark.plans.entry_queries import _CRF_ART_DIR

    crf_model = CRFModel.load(_CRF_ART_DIR)
    t0 = time.time()
    decode_and_extract_crf(
        tagged.drop("tags"), crf_model, key_cols=("conv_id", "turn_idx")
    ).count()
    timings["crf_decode_fused"] = round(time.time() - t0, 3)
    tagged.unpersist()

    # end-of-run CPU probe: if this reads much slower than the start probe,
    # the box slowed down DURING the bench (thermal / noisy neighbor)
    a = np.random.default_rng(0).random((1200, 1200))
    a @ a
    t0 = time.time()
    for _ in range(3):
        a @ a
    env_forensics["cpu_probe_end_sec"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    decode_tps = (
        round(all_tokens / timings["decode_fused"]) if timings.get("decode_fused") else None
    )
    crf_decode_tps = (
        round(all_tokens / timings["crf_decode_fused"])
        if timings.get("crf_decode_fused")
        else None
    )
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "kg_pipeline_bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "decode_tokens_per_sec": decode_tps,
                "crf_decode_tokens_per_sec": crf_decode_tps,
                # self-defending artifact: load>LOAD_WARN at start means the
                # numbers are polluted by external processes, not the engine
                "load_start": round(load_start, 2),
                "load_end": round(os.getloadavg()[0], 2),
                "steal_pct": steal_pct,
                "query_load": query_load,
                "word_count_repeat": word_count_repeat,
                "env": env_forensics,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
