"""Explicit key salting for skewed aggregations and joins.

The rare-first prefix policy (blocking.py) keeps hot shingles out of
blocking keys and AQE splits residual skewed join partitions at runtime;
this module provides the third, explicit layer for operations that MUST
aggregate or join on a raw skewed key (e.g. the global gram document
frequency over a boilerplate-heavy web corpus where "$th"/"he " dominate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, salt_on: list[str] | None, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): hash of the ``salt_on`` columns
    MIXED WITH the input partition id — STABLE under task retry/speculation
    (a retried task re-reads the same input split, so the same row
    re-derives the same salt and results stay bit-reproducible for a fixed
    input layout).

    The partition id is load-bearing, not decoration: a hot key whose rows
    are BYTE-IDENTICAL (e.g. an exploded gram column alone) would hash to
    one salt from content only, collapsing the two-phase aggregation back
    into the very skew it exists to break.  Identical rows in the SAME
    partition sharing a salt is harmless — the map-side partial aggregate
    combines them before any shuffle; what must spread across reducers is
    the cross-partition mass, and partition ids do exactly that."""
    cols = salt_on if salt_on is not None else df.columns
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in cols], F.spark_partition_id()),
        F.lit(n_salts),
    )


def salted_count(
    df: DataFrame,
    key: str,
    n_salts: int = 16,
    count_col: str = "cnt",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-phase salted count: groupBy((key, salt)) partial counts, then
    groupBy(key) final sum.  The salt spreads a hot key over ``n_salts``
    reducers so no single task receives the full key's rows.

    (Spark's hash aggregate already does map-side partial aggregation, which
    makes plain counts skew-resistant; the explicit form matters for
    aggregations without partial pushdown — collect_list/collect_set
    accumulations, exact distinct counts — and as the general pattern.)
    """
    salted = df.withColumn("_salt", _salt_col(df, salt_on, n_salts))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").cast("long").alias(count_col))


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Skew-proof equi-join: replicate the small side across ``n_salts``
    salts and salt the big side's key, so one hot key's rows spread over
    ``n_salts`` tasks even without AQE.  The small side is broadcast, so the
    replication costs memory, not shuffle."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("_salt", _salt_col(big, salt_on, n_salts))
    out = big_salted.join(F.broadcast(small_rep), [key, "_salt"], "inner")
    return out.drop("_salt")
