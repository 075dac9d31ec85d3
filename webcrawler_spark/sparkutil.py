"""Iterative-loop Spark utilities.

``DataFrame.localCheckpoint`` is the right tool for truncating lineage
in a driver round loop (SURVEY.md §7.0), but its cached blocks are
attached to the *internal checkpoint RDD*, which ``DataFrame.unpersist``
does NOT release (that API only talks to the SQL CacheManager). A
long-running crawl would therefore leak one cached RDD per checkpoint
per round until the JVM heap dies — verified empirically in this repo's
history. These helpers track the checkpoint RDD ids so rounds can free
exactly what they created.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _persistent_rdd_ids(spark: SparkSession) -> set[int]:
    out = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().toList().iterator()
    while it.hasNext():
        out.add(it.next()._1())
    return out


def checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint that remembers its cached RDD ids on the
    returned DataFrame (``_ckpt_rdd_ids``) for later release."""
    spark = df.sparkSession
    before = _persistent_rdd_ids(spark)
    out = df.localCheckpoint(eager=True)
    out._ckpt_rdd_ids = _persistent_rdd_ids(spark) - before  # type: ignore[attr-defined]
    return out


def checkpoint_lazy(df: DataFrame) -> DataFrame:
    """Lazy localCheckpoint: lineage truncates on the caller's NEXT
    action over the result, letting a loop fuse "materialize state"
    and "compute the round's scalar" (e.g. a convergence checksum)
    into ONE job instead of two. Call :func:`seal` after that action
    so :func:`free` can release the cached blocks later."""
    spark = df.sparkSession
    out = df.localCheckpoint(eager=False)
    out._ckpt_before_ids = _persistent_rdd_ids(spark)  # type: ignore[attr-defined]
    return out


def seal(df: DataFrame) -> None:
    """Record the RDD ids a :func:`checkpoint_lazy` materialized (must
    run after the action that computed it)."""
    before = getattr(df, "_ckpt_before_ids", None)
    if before is None:
        return
    df._ckpt_rdd_ids = _persistent_rdd_ids(df.sparkSession) - before  # type: ignore[attr-defined]
    df._ckpt_before_ids = None  # type: ignore[attr-defined]


def free(df: DataFrame | None) -> None:
    """Release the cached blocks of a :func:`checkpoint` result."""
    if df is None:
        return
    ids = getattr(df, "_ckpt_rdd_ids", None)
    if not ids:
        return
    jsc = df.sparkSession.sparkContext._jsc.sc()
    m = jsc.getPersistentRDDs()
    it = m.toList().iterator()
    while it.hasNext():
        t = it.next()
        if t._1() in ids:
            t._2().unpersist(False)
    df._ckpt_rdd_ids = set()  # type: ignore[attr-defined]
