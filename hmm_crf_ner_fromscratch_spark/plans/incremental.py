"""Incremental KG ingest: delta decode over changed conversations only.

At 100 TB the batch pipeline's invalidation rule ("any input change recomputes
everything", plans/pipeline.py) is the wrong contract for the common case --
an append-mostly transcript table where each ingest adds/edits a sliver of
conversations. This module processes exactly that sliver:

  1. per-conversation content digests (order-insensitive xxhash64 XOR over a
     conversation's turns) diffed against the digests recorded at the last
     commit -> changed / new / removed conversation sets;
  2. the expensive conversation-local stages (decode -> mentions -> triples)
     run ONLY over changed+new conversations (the Python DP never sees
     unchanged data);
  3. stage tables are partitioned by an ASSIGNED partition recorded per
     conversation in the digest state -- hash bucket at full load, a fresh
     GENERATION partition per append batch (a broad append writes exactly
     one new partition dir; hash-bucketing would scatter it across every
     bucket). Modifications/removals rewrite only the partitions recorded
     for the affected conversations (dynamic partition overwrite);
  4. the graph phase is delta-proportional too: a maintained candidates
     state advances by count arithmetic over the delta, per-block
     link-pair state rescores ONLY blocks whose membership changed
     (block keys/features are pure functions of the surface; rescoring
     runs against full block sizes so the explosion guard -- and thus
     convergence -- is exact), and a maintained triple-count state
     advances by the same count arithmetic so edge weights never rescan
     the triples table. What stays global: CC + canonicalization over
     the candidate set, and the final nodes/edges aggregates -- both
     bounded by DISTINCT entities/triple keys, not corpus size;
  5. snapshot ids stay content-defined through the per-bucket ledger
     (lineage.write_bucketed): a chain of incremental commits converges to
     the IDENTICAL stage snapshot ids a one-shot run over the final input
     produces -- which is also the property the tests pin, for every
     bucketed stage including candidates and link_pairs.

Maintenance: `compact()` (TableIO) merges small files within partitions;
`rebalance()` folds accumulated generations back into the hash layout --
both snapshot-preserving by construction, and enforced.

Scale notes: the digest diff is one hash-aggregate scan of the input plus a
join against the stored digest table on conv_id; the delta semi-join is a
broadcast when the changed set is small (the common case). On a real
deployment the input-side scan disappears too: table formats (Iceberg
changelog / CDC feeds) hand over the changed-row set directly, which slots
in as ``changed`` below without touching the rest of the flow.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.crf import CRFModel
from ..operators.crf import decode_crf
from ..operators.graph import (
    materialize_graph_from_counts,
    triple_counts_from_triples,
)
from ..operators.hmm import decode_hmm
from ..operators.linking import (
    DEFAULT_MAX_BLOCK,
    blocked_candidates,
    candidate_features,
    normalize_surface,
    score_block_pairs,
)
from ..operators.mentions import extract_mentions
from ..operators.relations import template_triples
from ..sources.transcripts import salted_turns, tokenize_turns
from .lineage import ParquetManifestTableIO, new_run_id
from .pipeline import _model_fingerprint, transcripts_snapshot

BUCKET_COL = "bucket"
DIGEST_COLS = ("conv_id", "turn_idx", "role", "text")
# triple-count state key + provenance sample bound (operators/graph.py)
_TRIPLE_KEY = ("subj_type", "subj", "pred", "obj_type", "obj")
_PROV_DDL = "array<struct<conv_id:string,turn_idx:int>>"
PROVENANCE_CAP = 20


def conv_digests(transcripts: DataFrame) -> DataFrame:
    """(conv_id, digest): order-insensitive content hash per conversation.
    Same hash family as transcripts_snapshot, restricted per conv."""
    return transcripts.groupBy("conv_id").agg(
        F.bit_xor(F.xxhash64(*DIGEST_COLS)).alias("digest"),
        F.count(F.lit(1)).alias("n_turns"),
    )


def _bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


@dataclass
class IncrementalResult:
    run_id: str
    full_load: bool
    n_changed: int = 0
    n_removed: int = 0
    affected_buckets: list = field(default_factory=list)
    executed: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    snapshots: dict = field(default_factory=dict)
    metrics: dict = field(default_factory=dict)


class IncrementalKGPipeline:
    """Same stage DAG and operators as KGPipeline, delta execution.

    ``n_buckets`` sizes the stage partitioning: pick so one bucket's decoded
    rows fit an executor write task comfortably (at 100 TB input and the
    default 1024 buckets that is ~100 GB of transcripts -> a few GB of
    decoded parquet per bucket; raise for bigger corpora).

    ``auto_rebalance_generations`` bounds append-chain state growth BY
    DEFAULT (round-6 verdict ask #3: the mitigation existed but was
    opt-in): every ``run_append`` batch adds one generation partition,
    and per-batch cost inherits every accumulated partition (file
    listings, manifests, digest reads), so an unbounded chain drifts
    forever. When the generation count reaches the threshold,
    ``run_append`` folds them back into the hash-bucket layout via
    :meth:`rebalance` -- a full rewrite whose snapshot ids are enforced
    unchanged, amortized O(state / threshold) per batch. Pass ``None``
    to opt out (e.g. when maintenance runs on a separate schedule).
    """

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        model,
        cross_turn_window: int = 2,
        link_threshold: float = 0.72,
        salt_bucket: int = 4096,
        scheme: str = "bio",
        n_buckets: int = 64,
        auto_rebalance_generations: int | None | str = "auto",
    ):
        self.spark = spark
        self.io = ParquetManifestTableIO(spark, work_dir)
        self.model = model
        self.cross_turn_window = cross_turn_window
        self.link_threshold = link_threshold
        self.salt_bucket = salt_bucket
        self.scheme = scheme
        self.n_buckets = n_buckets
        # "auto": fold once the generation partitions match the bucket
        # count (state layout has doubled its partition count); None
        # opts out entirely
        self.auto_rebalance_generations = (
            n_buckets
            if auto_rebalance_generations == "auto"
            else auto_rebalance_generations
        )

    def _generation_count(self) -> int:
        """Number of generation partitions currently in the decoded stage
        (ledger bucket ids at or past the hash-bucket range)."""
        m = self.io.manifest("decoded")
        if not (m and m.get("buckets")):
            return 0
        return sum(1 for b in m["buckets"] if int(b) >= self.n_buckets)

    # -- digest state --
    def _convs_dir(self) -> str:
        return os.path.join(self.io.base_dir, "_convs")

    def _prev_digests(self) -> DataFrame | None:
        d = self._convs_dir()
        if not os.path.isdir(d):
            return None
        # partitioned by the conversation's ASSIGNED data partition
        # (hash bucket at full load, generation id for appended convs),
        # so state reads/writes prune to the partitions a delta touches
        return self.spark.read.parquet(d).select(
            "conv_id", "digest", "n_turns", F.col(BUCKET_COL).cast("int").alias(BUCKET_COL)
        )

    def _alloc_generation(self, tx_snap: str) -> int:
        """Partition id for an ingest's NEW conversations: appended convs
        land in a FRESH partition (generation) instead of hash-scattering
        across every bucket -- a broad append therefore writes one new
        partition dir and touches nothing else. Keyed by the target input
        snapshot so a crash-resume of the same ingest reuses the same id
        (stage partition dirs are pre-deleted idempotently on rewrite).
        """
        import json

        path = os.path.join(self.io.base_dir, "_generations.json")
        data = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                data = json.load(f)
        if tx_snap in data:
            return int(data[tx_snap])
        floor = self.n_buckets - 1
        m = self.io.manifest("decoded")
        if m and m.get("buckets"):
            floor = max(floor, max(int(b) for b in m["buckets"]))
        gen = max([floor] + [int(v) for v in data.values()]) + 1
        data[tx_snap] = gen
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(data, f)
        os.replace(tmp, path)
        return gen

    def _plan_delta(self, changed, removed, prev, tx_snap):
        """(assignment, affected): target partition per changed conv --
        existing convs rewrite in place, new convs go to this ingest's
        generation partition -- plus the partitions a commit touches."""
        ch = changed.join(
            prev.select("conv_id", F.col(BUCKET_COL).alias("_old")),
            "conv_id",
            "left",
        ).persist()
        n_new = ch.where(F.col("_old").isNull()).count()
        gen = self._alloc_generation(tx_snap) if n_new else None
        assign = ch.select(
            "conv_id",
            F.coalesce("_old", F.lit(gen)).cast("int").alias(BUCKET_COL),
        ).persist()
        assign.count()
        old_b = {
            int(r._old)
            for r in ch.select("_old").where(F.col("_old").isNotNull())
            .distinct()
            .collect()
        }
        ch.unpersist()
        rm_b = set()
        if removed is not None:
            rm_b = {
                int(r.b)
                for r in removed.join(
                    prev.select("conv_id", F.col(BUCKET_COL).alias("b")),
                    "conv_id",
                )
                .select("b")
                .distinct()
                .collect()
            }
        affected = sorted(old_b | rm_b | ({gen} if gen is not None else set()))
        return assign, affected

    def _decode(self, turns: DataFrame) -> DataFrame:
        salted = salted_turns(tokenize_turns(turns), bucket=self.salt_bucket)
        if isinstance(self.model, CRFModel):
            return decode_crf(salted, self.model)
        return decode_hmm(salted, self.model)

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(BUCKET_COL, _bucket_expr(self.n_buckets))

    def _commit(
        self,
        res: IncrementalResult,
        stage: str,
        inputs: list[str],
        compute,
        affected: list[int] | None,
        bucketed: bool = True,
    ) -> str:
        if self.io.is_complete(stage, inputs):
            snap = self.io.snapshot_id(stage)
            res.skipped.append(stage)
            res.snapshots[stage] = snap
            return snap
        t0 = time.time()
        df = compute()
        if bucketed:
            snap = self.io.write_bucketed(
                stage, df, inputs, res.run_id, affected_buckets=affected,
                n_buckets=self.n_buckets,
            )
        else:
            snap = self.io.write(stage, df, inputs, res.run_id)
        res.metrics[stage] = {
            "sec": round(time.time() - t0, 2),
            "rows": self.io.manifest(stage)["row_count"],
        }
        res.executed.append(stage)
        res.snapshots[stage] = snap
        return snap

    def rebalance(self) -> dict:
        """Maintenance: fold accumulated generation partitions back into
        the hash-bucket layout (every append batch adds one partition, so
        a long append chain grows the partition count without bound; this
        is the partition-level counterpart of ``TableIO.compact``). Full
        rewrite of each bucketed stage with hash assignment plus a digest
        -state reassignment; snapshot ids are content-defined and
        layout-blind, so each stage MUST land on its unchanged snapshot
        -- enforced, same contract as compaction."""
        out = {}
        for stage in ("decoded", "mentions", "triples"):
            m = self.io.manifest(stage)
            if not (m and m.get("complete") and m.get("bucketed")):
                continue
            df = self._with_bucket(
                self.io.read(stage).drop(BUCKET_COL)
            ).localCheckpoint(eager=True)
            snap = self.io.write_bucketed(
                stage, df, m["inputs"], m["run_id"] + ".rebalance",
                n_buckets=self.n_buckets,
            )
            if snap != m["snapshot_id"]:
                raise RuntimeError(
                    f"rebalance changed content of {stage}: "
                    f"{m['snapshot_id']} -> {snap}"
                )
            out[stage] = snap
        prev = self._prev_digests()
        if prev is not None:
            state = self._with_bucket(
                prev.drop(BUCKET_COL)
            ).localCheckpoint(eager=True)
            state.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(
                self._convs_dir() + "__tmp"
            )
            import shutil

            shutil.rmtree(self._convs_dir())
            os.replace(self._convs_dir() + "__tmp", self._convs_dir())
        return out

    def resample_provenance(self) -> dict:
        """Maintenance: rebuild the triple-count state's provenance samples
        from the CURRENT triples table. The delta path's contract allows
        UNTOUCHED keys to retain provenance pointers into superseded turns
        of other conversations' edits (see the triple-count state note in
        ``run``); this compact-style resample clears them. Counts are
        exact by construction, so the re-aggregated ``n`` must equal the
        state's ``n`` key-for-key -- a mismatch means state corruption and
        the op refuses loudly instead of silently "fixing" it.

        Cost: one aggregate pass over the triples table (maintenance-tier,
        like ``rebalance``; the hot ingest path never does this). The
        rewritten content is exactly ``triple_counts_from_triples`` over
        live triples, i.e. what a one-shot run over the current input
        produces, so downstream stages are invalidated only if stale
        pointers actually existed."""
        io = self.io
        m = io.manifest("triple_counts")
        if not (m and m.get("complete") and m.get("bucketed")):
            raise ValueError("no complete bucketed triple_counts state to resample")
        stored = m.get("n_buckets")
        if stored is not None and stored != self.n_buckets:
            raise ValueError(
                f"triple_counts state is bucketed mod {stored} but this "
                f"pipeline was constructed with n_buckets={self.n_buckets}; "
                "resampling under a different modulus silently rebuckets the "
                "state and breaks read_buckets pruning -- construct the "
                "pipeline with the stored value (kg_admin derives it)"
            )
        key = list(_TRIPLE_KEY)
        fresh = triple_counts_from_triples(
            io.read("triples").drop(BUCKET_COL), PROVENANCE_CAP
        )
        state = io.read("triple_counts")
        mismatched = (
            fresh.select(*key, "n")
            .join(
                state.select(*key, F.col("n").alias("n_state")),
                key,
                "full_outer",
            )
            .where(~F.col("n").eqNullSafe(F.col("n_state")))
            .limit(5)
            .collect()
        )
        if mismatched:
            raise RuntimeError(
                "triple_counts counts disagree with a re-aggregate of the "
                f"triples table (state corruption): {mismatched}"
            )
        tc_bucket = F.pmod(F.xxhash64(*_TRIPLE_KEY), F.lit(self.n_buckets)).cast(
            "int"
        )
        df = (
            fresh.withColumn(BUCKET_COL, tc_bucket)
            .repartition(self.n_buckets, F.col(BUCKET_COL))
            .localCheckpoint(eager=True)
        )
        snap = io.write_bucketed(
            "triple_counts", df, m["inputs"], m["run_id"] + ".resample",
            n_buckets=self.n_buckets,
        )
        return {
            "stage": "triple_counts",
            "snapshot_before": m["snapshot_id"],
            "snapshot_after": snap,
            "rows": io.manifest("triple_counts")["row_count"],
        }

    def run_append(self, delta_tx: DataFrame) -> IncrementalResult:
        """CDC/micro-batch ingest: ``delta_tx`` holds the complete current
        turns of SOME conversations (new or updated); everything else is
        untouched. No full-input scan happens anywhere -- the cost is
        O(delta + affected buckets), which is what a foreachBatch sink or
        an Iceberg changelog feed needs at 100 TB.

        The input snapshot id stays EQUAL to what a full run() over the
        entire table would compute: transcripts_snapshot is an XOR over
        rows, so it is derivable from the per-conversation digest state
        (XOR of digests, sum of turn counts) without touching the table.
        Stage snapshots therefore converge to the one-shot ids -- pinned
        by test.
        """
        io = self.io
        prev = self._prev_digests()
        if prev is None:
            # first batch = first full load
            return self.run(delta_tx)

        digests_delta = conv_digests(delta_tx).persist()
        # ignore no-op re-deliveries (same conv content re-sent)
        changed = (
            digests_delta.alias("d")
            .join(prev.alias("p"), "conv_id", "left")
            .where(
                F.col("p.digest").isNull()
                | (F.col("d.digest") != F.col("p.digest"))
            )
            .select("conv_id")
            .persist()
        )
        merged_digests = (
            prev.select("conv_id", "digest", "n_turns")
            .join(digests_delta.select("conv_id"), "conv_id", "left_anti")
            .unionByName(digests_delta)
        )
        # full-input snapshot id WITHOUT a full-input scan of the
        # transcripts: the global row XOR is the XOR of per-conversation
        # digests (same hash family as transcripts_snapshot), the row
        # count is the sum of turn counts. The digest table itself is one
        # compact row per conversation -- the only O(#convs) touch.
        row = merged_digests.agg(
            F.bit_xor("digest").alias("h"), F.sum("n_turns").alias("n")
        ).first()
        tx_snap = f"tx:{row.h}:{row.n}"
        assign, affected = self._plan_delta(changed, None, prev, tx_snap)

        def commit_digests():
            # delta-scoped state update: only the partitions owning changed
            # conversations are rewritten (dynamic partition overwrite);
            # a crash mid-write self-heals -- re-delivery re-detects the
            # not-yet-recorded conversations and stages skip by manifest
            if not affected:
                return
            changed_digests = digests_delta.join(
                assign, "conv_id"
            ).select("conv_id", "digest", "n_turns", BUCKET_COL)
            retained = (
                self._prev_digests()
                .where(F.col(BUCKET_COL).isin(affected))
                .join(changed, "conv_id", "left_anti")
                .select("conv_id", "digest", "n_turns", BUCKET_COL)
            )
            new_content = retained.unionByName(changed_digests).localCheckpoint(
                eager=True
            )
            import shutil

            for b in affected:
                stale = os.path.join(self._convs_dir(), f"{BUCKET_COL}={b}")
                if os.path.isdir(stale):
                    shutil.rmtree(stale)
            conf = self.spark.conf
            prev_mode = conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                new_content.write.mode("overwrite").partitionBy(
                    BUCKET_COL
                ).parquet(self._convs_dir())
            finally:
                conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

        res = self._run_delta(
            delta_tx.join(changed, "conv_id", "left_semi"),
            changed,
            None,
            assign,
            affected,
            commit_digests,
            tx_snap,
        )
        digests_delta.unpersist()
        changed.unpersist()
        assign.unpersist()
        # default-on state bounding: fold accumulated generation
        # partitions back into the hash buckets once they reach the
        # threshold (amortized O(state/threshold) per batch; snapshot
        # ids are enforced unchanged by rebalance itself)
        if (
            self.auto_rebalance_generations is not None
            and self._generation_count() >= self.auto_rebalance_generations
        ):
            t0 = time.time()
            self.rebalance()
            res.metrics["auto_rebalance"] = {
                "sec": round(time.time() - t0, 2),
                "rows": self.io.manifest("decoded")["row_count"],
            }
        return res

    def run(self, transcripts: DataFrame) -> IncrementalResult:
        """Full-input ingest: diff the whole table's conversation digests
        against the recorded state; decode only the difference."""
        tx_snap = transcripts_snapshot(transcripts)
        digests_new = conv_digests(transcripts)
        prev = self._prev_digests()

        def full_state_write(state_df):
            # full rewrite, atomically swapped (tmp dir + rename)
            state_df.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(
                self._convs_dir() + "__tmp"
            )
            import shutil

            if os.path.isdir(self._convs_dir()):
                shutil.rmtree(self._convs_dir())
            os.replace(self._convs_dir() + "__tmp", self._convs_dir())

        if prev is None:
            return self._run_delta(
                transcripts,
                None,
                None,
                None,
                None,
                lambda: full_state_write(self._with_bucket(digests_new)),
                tx_snap,
            )

        joined = digests_new.alias("n").join(
            prev.alias("p"), "conv_id", "full_outer"
        )
        changed = joined.where(
            F.col("p.digest").isNull()
            | (F.col("n.digest") != F.col("p.digest"))
        ).select("conv_id").persist()
        removed = joined.where(F.col("n.digest").isNull()).select("conv_id")
        assign, affected = self._plan_delta(changed, removed, prev, tx_snap)

        def commit_digests():
            # unchanged convs keep their recorded partition; changed convs
            # take the planned assignment (in-place or this ingest's gen)
            state = (
                digests_new.join(
                    prev.select("conv_id", F.col(BUCKET_COL).alias("_pb")),
                    "conv_id",
                    "left",
                )
                .join(
                    assign.select("conv_id", F.col(BUCKET_COL).alias("_ab")),
                    "conv_id",
                    "left",
                )
                .select(
                    "conv_id",
                    "digest",
                    "n_turns",
                    F.coalesce("_ab", "_pb").cast("int").alias(BUCKET_COL),
                )
            )
            full_state_write(state)

        res = self._run_delta(
            # semi-join the input down to the changed conversations; AQE
            # turns this into a broadcast join for small deltas
            transcripts.join(changed, "conv_id", "left_semi"),
            changed,
            removed,
            assign,
            affected,
            commit_digests,
            tx_snap,
        )
        changed.unpersist()
        assign.unpersist()
        return res

    def _run_delta(
        self,
        delta_tx: DataFrame,
        changed: DataFrame | None,
        removed: DataFrame | None,
        assign: DataFrame | None,
        affected: list | None,
        commit_digests,
        tx_snap: str,
    ) -> IncrementalResult:
        io = self.io
        labeler = "labeler:" + _model_fingerprint(self.model)

        if changed is None:
            res = IncrementalResult(run_id=new_run_id(), full_load=True)
            affected_convs = None
        else:
            res = IncrementalResult(run_id=new_run_id(), full_load=False)
            affected_convs = (
                changed.unionByName(removed) if removed is not None else changed
            ).persist()
            res.n_changed = changed.count()
            res.n_removed = removed.count() if removed is not None else 0
            res.affected_buckets = list(affected)

        def attach_bucket(df: DataFrame) -> DataFrame:
            # full load: hash-spread across the base buckets; delta: the
            # planned per-conversation assignment (in-place for existing
            # convs, this ingest's generation partition for new ones)
            if assign is None:
                return self._with_bucket(df)
            return df.join(assign, "conv_id")

        def merged(stage: str, delta_df: DataFrame) -> DataFrame:
            """delta rows + retained rows of the affected partitions, i.e.
            the complete new content of exactly those partitions. A pure
            append (affected == [gen] with no prior rows there) has an
            empty retained side -- the commit writes only the delta.
            localCheckpoint cuts lineage to the stage's own files so the
            dynamic overwrite does not read from the path it writes (on a
            cluster: a reliable checkpoint or staging dir)."""
            delta_b = attach_bucket(delta_df)
            if affected is None:
                return delta_b
            retained = io.read_buckets(stage, affected).join(
                affected_convs, "conv_id", "left_anti"
            )
            cols = io.manifest(stage)["columns"] + [BUCKET_COL]
            return (
                retained.select(*cols)
                .unionByName(delta_b.select(*cols))
                .localCheckpoint(eager=True)
            )

        decoded_delta: dict = {}

        def compute_decoded():
            decoded_delta["df"] = self._decode(delta_tx).persist()
            return merged("decoded", decoded_delta["df"])

        s_dec = self._commit(
            res, "decoded", [tx_snap, labeler], compute_decoded, affected
        )
        if "df" in decoded_delta and not res.full_load:
            # cheap: the persisted delta was materialized by the commit
            res.metrics["decoded"]["delta_rows"] = decoded_delta["df"].count()

        def delta_decoded() -> DataFrame:
            # reuse the in-memory delta when this run decoded it; on a
            # crash-resume where 'decoded' was skipped, re-derive the delta
            # from the committed stage table instead of re-decoding (the
            # committed table already holds the NEW content, so the delta =
            # rows of affected conversations; removed convs have no rows)
            if "df" in decoded_delta:
                return decoded_delta["df"]
            base = io.read("decoded")
            if affected is None:
                return base
            return io.read_buckets("decoded", affected).join(
                affected_convs, "conv_id", "left_semi"
            )

        mentions_state: dict = {}

        def compute_mentions():
            # candidate-state arithmetic needs the counts of the affected
            # conversations' OLD mention rows, which exist only until this
            # stage's overwrite -- capture them eagerly first
            if affected is not None:
                mentions_state["old_counts"] = (
                    io.read_buckets("mentions", affected)
                    .join(affected_convs, "conv_id", "left_semi")
                    .groupBy("entity_type", "surface")
                    .agg(F.count(F.lit(1)).alias("n_old"))
                    .localCheckpoint(eager=True)
                )
            delta_m = extract_mentions(delta_decoded(), scheme=self.scheme)
            if affected is not None:
                delta_m = delta_m.persist()
                mentions_state["delta"] = delta_m
            return merged("mentions", delta_m)

        s_men = self._commit(
            res,
            "mentions",
            [s_dec, "scheme:" + self.scheme],
            compute_mentions,
            affected,
        )
        def delta_mentions() -> DataFrame:
            # triples are conversation-local: template only the changed
            # conversations' mentions (filter BEFORE the self-joins, reading
            # only the affected buckets)
            if affected is None:
                return io.read("mentions")
            return io.read_buckets("mentions", affected).join(
                affected_convs, "conv_id", "left_semi"
            )

        triples_state: dict = {}

        def compute_triples():
            # triple-count arithmetic needs the affected conversations' OLD
            # triple rows, which exist only until this stage's overwrite --
            # capture their per-key counts eagerly first (same pattern as
            # the mentions/candidates state)
            if affected is not None:
                triples_state["old_counts"] = (
                    io.read_buckets("triples", affected)
                    .join(affected_convs, "conv_id", "left_semi")
                    .groupBy(*_TRIPLE_KEY)
                    .agg(F.count(F.lit(1)).alias("n_old"))
                    .localCheckpoint(eager=True)
                )
            delta_t = template_triples(
                delta_mentions(), cross_turn_window=self.cross_turn_window
            )
            if affected is not None:
                delta_t = delta_t.persist()
                triples_state["delta"] = delta_t
            return merged("triples", delta_t)

        s_tri = self._commit(
            res,
            "triples",
            [s_men, f"w:{self.cross_turn_window}"],
            compute_triples,
            affected,
        )

        def one_file_per_bucket(df: DataFrame) -> DataFrame:
            # the maintained state tables (triple counts / candidates /
            # link pairs) are small relative to the corpus; one shuffle
            # partition per bucket keeps their file counts flat across
            # delta commits (read amplification on these hot tables
            # otherwise grows per ingest)
            return df.repartition(self.n_buckets, F.col(BUCKET_COL))

        # ---- triple-count state: (subj_type, subj, pred, obj_type, obj)
        # -> exact count + capped provenance sample, partitioned by key
        # hash. Maintained by count arithmetic over the delta (O(delta),
        # never a triples-table scan), so the graph tail below reads a
        # state table bounded by DISTINCT triple keys instead of rescanning
        # every triple ever ingested -- the stage that otherwise grows
        # linearly with corpus size under sustained appends (measured:
        # micro-batch latency 60 s -> 184 s across 10 x 50k-turn batches
        # before this state existed; see BENCH/BASELINE.md round 3).
        # Provenance contract: counts are exact; the per-key sample keeps
        # up to provenance_cap supporting turns, entries of replaced
        # conversations filtered for TOUCHED keys. Untouched keys may
        # retain pointers into superseded turns of OTHER conversations'
        # edits (refreshable via a compact-style resample); weights and
        # membership are unaffected.
        tc_bucket = F.pmod(
            F.xxhash64(*_TRIPLE_KEY), F.lit(self.n_buckets)
        ).cast("int")
        tc_plan: dict = {}
        tc_affected = None
        if (
            affected is not None
            and "delta" in triples_state
            and not io.is_complete("triple_counts", [s_tri])
        ):
            new_counts = (
                triples_state["delta"]
                .groupBy(*_TRIPLE_KEY)
                .agg(
                    F.count(F.lit(1)).alias("n_new"),
                    F.slice(
                        F.collect_list(F.struct("conv_id", "turn_idx")),
                        1,
                        PROVENANCE_CAP,
                    ).alias("prov_new"),
                )
            )
            touched = (
                new_counts.join(
                    triples_state["old_counts"], list(_TRIPLE_KEY), "full_outer"
                )
                .select(
                    *_TRIPLE_KEY,
                    (
                        F.coalesce("n_new", F.lit(0))
                        - F.coalesce("n_old", F.lit(0))
                    ).alias("d"),
                    F.coalesce(
                        "prov_new", F.expr(f"CAST(array() AS {_PROV_DDL})")
                    ).alias("prov_new"),
                )
                .localCheckpoint(eager=True)
            )
            tc_affected = sorted(
                int(r.b)
                for r in touched.select(tc_bucket.alias("b")).distinct().collect()
            )
            tc_plan["touched"] = touched

        def compute_triple_counts():
            if "touched" not in tc_plan:
                # full load / resume fallback: one aggregate pass
                return triple_counts_from_triples(
                    io.read("triples").drop(BUCKET_COL), PROVENANCE_CAP
                ).withColumn(BUCKET_COL, tc_bucket)
            state = io.read_buckets("triple_counts", tc_affected)
            key = list(_TRIPLE_KEY)
            touched = tc_plan["touched"]
            retained = state.join(touched.select(*key), key, "left_anti").select(
                *key, "n", "prov", BUCKET_COL
            )
            # retained provenance of touched keys, minus entries pointing
            # into the replaced conversations (explode-join: O(touched
            # keys x cap), no driver-side conv list)
            kept_prov = (
                state.join(touched.select(*key), key, "left_semi")
                .select(*key, F.explode("prov").alias("e"))
                .join(
                    affected_convs,
                    F.col("e.conv_id") == affected_convs["conv_id"],
                    "left_anti",
                )
                .groupBy(*key)
                .agg(F.collect_list("e").alias("prov_kept"))
            )
            empty = F.expr(f"CAST(array() AS {_PROV_DDL})")
            upd = (
                touched.join(
                    state.select(*key, F.col("n").alias("n_before")), key, "left"
                )
                .join(kept_prov, key, "left")
                .select(
                    *key,
                    (F.coalesce("n_before", F.lit(0)) + F.col("d")).alias("n"),
                    F.slice(
                        F.concat(
                            F.coalesce("prov_kept", empty),
                            F.col("prov_new"),
                        ),
                        1,
                        PROVENANCE_CAP,
                    ).alias("prov"),
                )
                .where(F.col("n") > 0)
                .withColumn(BUCKET_COL, tc_bucket)
            )
            return retained.unionByName(upd).localCheckpoint(eager=True)

        s_tc = self._commit(
            res,
            "triple_counts",
            [s_tri],
            lambda: one_file_per_bucket(compute_triple_counts()),
            tc_affected,
        )

        # ---- incremental entity linking ----
        # candidates state: (entity_type, surface, n_mentions), partitioned
        # by surface hash. Delta path: pure count arithmetic over the
        # affected conversations' old/new mentions -- O(delta), never a
        # corpus scan. Resume without the in-memory delta falls back to
        # the full aggregate (correct, one JVM pass).
        cand_bucket = F.pmod(
            F.xxhash64("entity_type", "surface"), F.lit(self.n_buckets)
        ).cast("int")
        cand_plan: dict = {}
        cand_affected = None
        if (
            affected is not None
            and "delta" in mentions_state
            and not io.is_complete("candidates", [s_men])
        ):
            new_counts = (
                mentions_state["delta"]
                .groupBy("entity_type", "surface")
                .agg(F.count(F.lit(1)).alias("n_new"))
            )
            delta_counts = (
                new_counts.join(
                    mentions_state["old_counts"],
                    ["entity_type", "surface"],
                    "full_outer",
                )
                .select(
                    "entity_type",
                    "surface",
                    (
                        F.coalesce("n_new", F.lit(0))
                        - F.coalesce("n_old", F.lit(0))
                    ).alias("d"),
                )
                .where(F.col("d") != 0)
                .persist()
            )
            cand_affected = sorted(
                int(r.b)
                for r in delta_counts.select(cand_bucket.alias("b"))
                .distinct()
                .collect()
            )
            cand_plan["delta_counts"] = delta_counts

        def compute_candidates():
            if "delta_counts" not in cand_plan:
                # full load / resume fallback: one aggregate pass
                return (
                    io.read("mentions")
                    .groupBy("entity_type", "surface")
                    .agg(F.count(F.lit(1)).alias("n_mentions"))
                    .withColumn(BUCKET_COL, cand_bucket)
                )
            state = io.read_buckets("candidates", cand_affected)
            # delta-keyed plan: only surfaces with a count delta -- state
            # rows without one stay in `retained` (and ONLY there)
            plan = (
                cand_plan["delta_counts"]
                .join(
                    state.select("entity_type", "surface", "n_mentions"),
                    ["entity_type", "surface"],
                    "left",
                )
                .select(
                    "entity_type",
                    "surface",
                    F.coalesce("n_mentions", F.lit(0)).alias("n_before"),
                    (
                        F.coalesce("n_mentions", F.lit(0)) + F.col("d")
                    ).alias("n_after"),
                )
                .localCheckpoint(eager=True)
            )
            cand_plan["membership"] = plan
            retained = state.join(
                cand_plan["delta_counts"].select("entity_type", "surface"),
                ["entity_type", "surface"],
                "left_anti",
            ).select("entity_type", "surface", "n_mentions", BUCKET_COL)
            updated = (
                plan.where(F.col("n_after") > 0)
                .select(
                    "entity_type",
                    "surface",
                    F.col("n_after").alias("n_mentions"),
                )
                .withColumn(BUCKET_COL, cand_bucket)
            )
            return retained.unionByName(updated).localCheckpoint(eager=True)

        s_cands = self._commit(
            res,
            "candidates",
            [s_men],
            lambda: one_file_per_bucket(compute_candidates()),
            cand_affected,
        )

        def state_candidates() -> DataFrame:
            """Candidate frame in candidate_entities shape, derived from
            the committed state (O(candidates), not O(mentions))."""
            return (
                io.read("candidates")
                .withColumn("normalized", normalize_surface(F.col("surface")))
                .where(F.col("normalized") != "")
                .select("entity_type", "surface", "n_mentions", "normalized")
            )

        # link-pairs state: per-block scored pairs, partitioned by block
        # hash. Pair sets are pure per-block functions of block MEMBERSHIP
        # (features are static per candidate; counts don't enter scoring),
        # so only blocks that gained or lost a member need rescoring --
        # recomputed against FULL block sizes so the explosion guard
        # behaves exactly as a from-scratch run.
        pair_bucket = F.pmod(F.xxhash64("block"), F.lit(self.n_buckets)).cast(
            "int"
        )
        pair_affected = None
        pair_plan: dict = {}
        if (
            "membership" in cand_plan
            and not io.is_complete("link_pairs", [s_cands])
        ):
            changed_keys = (
                cand_plan["membership"]
                .where((F.col("n_before") > 0) != (F.col("n_after") > 0))
                .select("entity_type", "surface")
                .withColumn("normalized", normalize_surface(F.col("surface")))
                .where(F.col("normalized") != "")
            )
            changed_blocks = (
                blocked_candidates(
                    candidate_features(
                        changed_keys.withColumn("n_mentions", F.lit(0))
                    )
                )
                .select("block")
                .distinct()
                .persist()
            )
            pair_affected = sorted(
                int(r.b)
                for r in changed_blocks.select(pair_bucket.alias("b"))
                .distinct()
                .collect()
            )
            pair_plan["changed_blocks"] = changed_blocks

        def compute_link_pairs():
            membership = blocked_candidates(
                candidate_features(state_candidates())
            )
            sizes = membership.groupBy("block").agg(F.count(F.lit(1)).alias("bn"))
            if "changed_blocks" not in pair_plan:
                scored = score_block_pairs(
                    membership,
                    threshold=self.link_threshold,
                    max_block=DEFAULT_MAX_BLOCK,
                    sizes=sizes,
                )
                return scored.withColumn(BUCKET_COL, pair_bucket)
            changed_blocks = pair_plan["changed_blocks"]
            rescored = score_block_pairs(
                membership.join(changed_blocks, "block", "left_semi"),
                threshold=self.link_threshold,
                max_block=DEFAULT_MAX_BLOCK,
                sizes=sizes,
            ).withColumn(BUCKET_COL, pair_bucket)
            retained = io.read_buckets("link_pairs", pair_affected).join(
                changed_blocks, "block", "left_anti"
            ).select("block", "src_key", "dst_key", "score", BUCKET_COL)
            return retained.unionByName(rescored).localCheckpoint(eager=True)

        s_pairs = self._commit(
            res,
            "link_pairs",
            [s_cands],
            lambda: one_file_per_bucket(compute_link_pairs()),
            pair_affected,
        )

        # graph materialization: CC + canonicalization over the maintained
        # states (cross-candidate by nature -- CC is adaptive and cheap
        # relative to pair scoring), edge weights aggregated from the
        # merged triples
        shared: dict = {}

        def graph(which: str):
            if "nodes" not in shared:
                edges_sim = (
                    io.read("link_pairs")
                    .select("src_key", "dst_key", "score")
                    .dropDuplicates(["src_key", "dst_key"])
                )
                # graph tail reads the triple-count STATE (bounded by
                # distinct triple keys), never the raw triples table
                shared["nodes"], shared["edges"] = materialize_graph_from_counts(
                    state_candidates(),
                    edges_sim,
                    io.read("triple_counts").drop(BUCKET_COL),
                    provenance_cap=PROVENANCE_CAP,
                )
            return shared[which]

        self._commit(
            res,
            "nodes",
            [s_pairs, s_cands, s_tc],
            lambda: graph("nodes"),
            None,
            bucketed=False,
        )
        self._commit(
            res,
            "edges",
            [s_pairs, s_cands, s_tc],
            lambda: graph("edges"),
            None,
            bucketed=False,
        )
        if "delta_counts" in cand_plan:
            cand_plan["delta_counts"].unpersist()
        if "changed_blocks" in pair_plan:
            pair_plan["changed_blocks"].unpersist()
        if "delta" in mentions_state:
            mentions_state["delta"].unpersist()
        if "delta" in triples_state:
            triples_state["delta"].unpersist()

        # digest state commits last: a crash before this point replays the
        # same delta on re-run (stages already committed skip via manifests)
        commit_digests()

        if "df" in decoded_delta:
            decoded_delta["df"].unpersist()
        if affected_convs is not None:
            affected_convs.unpersist()
        return res
