"""Iceberg table I/O — the production storage layer named by the north rule
("Iceberg tables of pre-tokenized training sequences"), with a transparent
Hive-layout-parquet fallback for environments without the Iceberg runtime
jar (this sandbox).

Design: all engine code talks to :class:`TableIO`, which resolves to real
Iceberg (``spark.read.table`` / ``writeTo(...).overwritePartitions()``)
when the catalog is live, else to path-based parquet with identical
partition semantics. The two backends share:

  * partition layout: ``PARTITIONED BY (source, days(ts))`` ↔
    ``partitionBy('source', 'ts_day')`` directory layout — partition
    pruning behaves identically for the engine's predicates;
  * idempotent per-partition overwrite: Iceberg ``overwritePartitions``
    (dynamic) ↔ parquet ``partitionOverwriteMode=dynamic`` — the
    checkpoint/resume contract (rollup/checkpoint.py) is backend-agnostic;
  * snapshot-ish metadata: Iceberg snapshot summary ↔ the JSONL manifest.

Reference parity: replaces the reference's format-sniffing file loader
(app/core/data_handler.py:113-171) as the *table* (vs file) ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        # py4j package access is lazy (never raises) — force a classload
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def configure_catalog(
    spark: SparkSession, name: str = "local", warehouse: str = "/tmp/iceberg_wh"
) -> bool:
    """Register a Hadoop-backed Iceberg catalog on a live session. Returns
    False (no-op) when the runtime jar is absent. On a production cluster
    these confs ship on the spark-submit line instead."""
    if not iceberg_available(spark):
        return False
    spark.conf.set(
        f"spark.sql.catalog.{name}", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set(f"spark.sql.catalog.{name}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{name}.warehouse", warehouse)
    return True


class TableIO:
    """Backend-resolving table reader/writer.

    ``ident`` is an Iceberg table identifier (``catalog.db.table``) when the
    catalog is live, else a filesystem path to Hive-layout parquet.
    """

    def __init__(self, spark: SparkSession, use_iceberg: bool | None = None):
        self.spark = spark
        self.use_iceberg = (
            iceberg_available(spark) if use_iceberg is None else use_iceberg
        )

    def _is_table(self, ident: str) -> bool:
        # jar presence alone must not route a filesystem PATH to
        # spark.read.table: shared cluster images often ship the Iceberg
        # runtime with no catalog configured, and a table identifier never
        # contains a path separator. Paths always take the parquet backend.
        return self.use_iceberg and "/" not in ident and "\\" not in ident

    def read(self, ident: str) -> DataFrame:
        if self._is_table(ident):
            return self.spark.read.table(ident)
        return self.spark.read.parquet(ident)

    def append(self, df: DataFrame, ident: str, partition_cols: list[str]):
        if self._is_table(ident):
            df.writeTo(ident).append()
            return
        df.write.mode("append").partitionBy(*partition_cols).parquet(ident)

    def overwrite_partitions(
        self, df: DataFrame, ident: str, partition_cols: list[str]
    ):
        """Idempotent dynamic partition overwrite — the checkpoint/resume
        write primitive: rewriting the same partitions yields an identical
        table (crash-safe replay)."""
        if self._is_table(ident):
            df.writeTo(ident).overwritePartitions()
            return
        # scope the dynamic mode to THIS write: left set globally, every
        # later plain partitioned overwrite on the session silently keeps
        # stale partitions it should have truncated
        before = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            df.write.mode("overwrite").partitionBy(*partition_cols).parquet(
                ident
            )
        finally:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", before
            )

    def snapshot_info(self, ident: str) -> dict:
        """Current snapshot metadata (Iceberg) or a file-listing digest
        (parquet) — the lineage anchor recorded by the manifest."""
        if self.use_iceberg:
            row = (
                self.spark.sql(f"SELECT * FROM {ident}.snapshots")
                .orderBy("committed_at", ascending=False)
                .limit(1)
                .collect()
            )
            return row[0].asDict() if row else {}
        import os

        n_files = 0
        total = 0
        for root, _, files in os.walk(ident):
            for f in files:
                if f.endswith(".parquet"):
                    n_files += 1
                    total += os.path.getsize(os.path.join(root, f))
        return {"files": n_files, "bytes": total}
