"""Bucketed-table writes: shuffle-free co-located joins.

The engine's hottest recurring join is frontier x seen on the same key
every round (J1, engine.py); the catalog layer already repartitions
both tables on ``pmod(xxhash64(host), n_buckets)`` so the shuffle is
cheap, but plain parquet cannot tell Spark the layout, so an Exchange
still appears in every round's plan. Spark's bucketed tables
(``DataFrameWriter.bucketBy`` + ``saveAsTable``) persist that layout in
the catalog: two tables bucketed by the same key into the same bucket
count join with ZERO Exchange on either side — the join becomes a
per-bucket zip, which is exactly the storage-partitioned join a real
Iceberg deployment gives (SURVEY.md O12). This module is the plain
open-source-Spark demonstration of that contract.

Scale note (10^10 URLs): bucket count is a layout constant — pick it
once for the cluster (e.g. 4096) and every round's anti-join, as-of
re-join, and compaction reads co-located forever; no per-round shuffle
of the multi-TB seen table at all. ``sortBy`` within buckets
additionally lets the join run as a merge without sorting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) by ``key`` into ``n_buckets`` — the layout the co-located
    join reads back via ``spark.table(name)``.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-key same-bucket-count tables.

    With both sides bucketed on ``key`` the physical plan contains no
    Exchange (verified by tests/test_bucketed.py); broadcast is
    disabled for the join via hints so small test tables exercise the
    same plan shape production would use.
    """
    lt = spark.table(left_table).hint("shuffle_merge")
    rt = spark.table(right_table)
    return lt.join(rt, key, how)
