"""Warehouse table access: Iceberg when available, Parquet otherwise.

The north-rule deployment target is an Iceberg table of web pages.  Iceberg
support in Spark is a runtime jar (``iceberg-spark-runtime``) plus catalog
configuration — not a code change: every operator in this engine consumes
plain DataFrames, so the only Iceberg-specific surface is (a) catalog conf,
(b) ``spark.table``/``writeTo`` instead of path-based parquet IO.  This
container ships no Iceberg jar, so the helpers degrade to Parquet with the
same call shape; on a real cluster pass ``iceberg=True`` and a catalog name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CONF = {
    # documented cluster configuration (requires iceberg-spark-runtime jar):
    "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "spark.sql.catalog.warehouse": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.warehouse.type": "hadoop",
}


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, location: str, iceberg: bool | None = None) -> DataFrame:
    """Read the pages table from an Iceberg table name or a parquet path."""
    if iceberg is None:
        iceberg = "/" not in location and iceberg_available(spark)
    if iceberg:
        return spark.table(location)
    return spark.read.parquet(location)


def write_pages(df: DataFrame, location: str, iceberg: bool | None = None) -> None:
    """Write pages partitioned for scan locality: by lang (low cardinality,
    prunable) — at petabyte scale add a bucket transform on url for
    co-located joins (Iceberg ``bucket(N, url)``)."""
    if iceberg is None:
        iceberg = False
    if iceberg:
        df.writeTo(location).partitionedBy(df.lang).createOrReplace()
    else:
        df.write.mode("overwrite").partitionBy("lang").parquet(location)
