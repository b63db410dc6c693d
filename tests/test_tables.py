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
