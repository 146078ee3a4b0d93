"""TableIO backend contract — in this sandbox the Iceberg runtime jar is
absent, so the fallback (Hive-layout parquet with dynamic partition
overwrite) carries the same partition semantics; the Iceberg branch is
exercised only for availability detection."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from preprocessor_spark.sources import TableIO, configure_catalog, iceberg_available


@pytest.fixture()
def small(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["a", "a", "b", "b"],
                "v": [1.0, 2.0, 3.0, 4.0],
            }
        )
    )


def test_detection_and_catalog_noop(spark):
    # sandbox has no Iceberg jar: detection is False and configure is a no-op
    assert iceberg_available(spark) is False
    assert configure_catalog(spark) is False


def test_parquet_fallback_roundtrip(spark, small, tmp_path):
    t = TableIO(spark)
    assert t.use_iceberg is False
    ident = str(tmp_path / "tbl")
    t.overwrite_partitions(small, ident, ["source"])
    got = t.read(ident)
    assert got.count() == 4
    assert set(got.columns) == {"source", "v"}
    info = t.snapshot_info(ident)
    assert info["files"] >= 1 and info["bytes"] > 0


def test_overwrite_partitions_is_idempotent_and_dynamic(spark, small, tmp_path):
    t = TableIO(spark)
    ident = str(tmp_path / "tbl")
    t.overwrite_partitions(small, ident, ["source"])
    # overwrite ONLY source=a with new values; source=b must survive
    newer = small.filter(F.col("source") == "a").withColumn(
        "v", F.col("v") * 10
    )
    t.overwrite_partitions(newer, ident, ["source"])
    got = t.read(ident).orderBy("source", "v")
    rows = [(r["source"], r["v"]) for r in got.collect()]
    assert rows == [("a", 10.0), ("a", 20.0), ("b", 3.0), ("b", 4.0)]
    # replaying the same overwrite yields the identical table (resume)
    t.overwrite_partitions(newer, ident, ["source"])
    assert t.read(ident).count() == 4


def test_append(spark, small, tmp_path):
    t = TableIO(spark)
    ident = str(tmp_path / "tbl")
    t.append(small, ident, ["source"])
    t.append(small.filter(F.col("source") == "a"), ident, ["source"])
    assert t.read(ident).count() == 6


def test_overwrite_partitions_restores_session_overwrite_mode(
    spark, small, tmp_path
):
    """The dynamic partitionOverwriteMode must be scoped to the one write:
    left set globally, every later plain partitioned overwrite in the
    session silently keeps stale partitions it should have truncated."""
    before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    t = TableIO(spark)
    t.overwrite_partitions(small, str(tmp_path / "tbl"), ["source"])
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        == before
    )


def test_paths_never_route_to_read_table(spark, small, tmp_path):
    """Jar presence alone must not send a filesystem PATH to
    spark.read.table (shared images ship the Iceberg runtime with no
    catalog configured): even with use_iceberg=True forced, a path ident
    takes the parquet backend."""
    p = str(tmp_path / "t")
    io = TableIO(spark, use_iceberg=True)
    io.append(small, p, ["source"])
    assert io.read(p).count() == small.count()
    io.overwrite_partitions(small, p, ["source"])
    assert io.read(p).count() == small.count()
