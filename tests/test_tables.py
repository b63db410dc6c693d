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
