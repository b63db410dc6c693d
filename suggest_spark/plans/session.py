"""SparkSession factory with scale-oriented defaults.

Single place where execution-relevant configuration lives so tests, the
driver entry point, and the bench harness run identical plans:

* AQE on (runtime coalescing + skew-join splitting — the web-scale guard for
  hot n-gram blocks, cf. SURVEY.md §4 skew plan),
* Arrow for every pandas UDF boundary,
* modest shuffle partitions for local mode (cluster deployments override via
  spark-submit --conf; nothing here hard-codes local assumptions).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "suggest_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if os.environ.get("SPARK_GRAFT_ICEBERG") == "1":
        # opt-in Iceberg catalog (requires iceberg-spark-runtime on the
        # classpath — sources/tables.py documents the deployment).  Gated by
        # env so the same factory serves jar-less containers unchanged and
        # the Iceberg-gated tests become runnable the day the jar exists.
        from ..sources.tables import ICEBERG_CONF

        for k, v in ICEBERG_CONF.items():
            builder = builder.config(k, v)
        builder = builder.config(
            "spark.sql.catalog.warehouse.warehouse",
            os.environ.get("SPARK_GRAFT_ICEBERG_WAREHOUSE", "spark-warehouse/iceberg"),
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
