"""Distributed global prefix-sum (A1/W5 exact budget landing).

An exact "first K in global order" needs a cumulative count in that
order. The naive plan — ``Window.orderBy(...)`` with no partitioning —
pulls the entire scan through ONE task (at production size, the final
crawl round is ~10^7 rows), which is the canonical single-task-window
scale bug. The distributed construction used by the engine's A1
truncation (engine.py run_round) and exposed here for reuse:

1. range-partition the rows on the global order keys (Spark samples
   the key distribution, so partitions are balanced);
2. sort within partitions and pin partition ids with an eager
   localCheckpoint (two passes below must see identical placement);
3. per-partition flag totals — one aggregate row per partition — are
   collected and turned into exclusive prefix offsets on the driver
   (P rows of work, not N);
4. a partition-LOCAL strictly-preceding window plus the broadcast
   offset yields the exact global cumulative count.

Every stage is either codegen or O(P) driver work; nothing funnels the
row set through one core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from webcrawler_spark.sparkutil import checkpoint


def attach_prefix_count(
    df: DataFrame, order_cols: list[str], flag_col: str, out_col: str = "_cumf"
) -> DataFrame:
    """Add ``out_col`` = number of ``flag_col``-true rows STRICTLY
    preceding each row in global ``order_cols`` order, without an
    un-partitioned window.

    The returned DataFrame carries the pinned checkpoint on
    ``._prefix_ckpt`` so iterative callers (the engine round loop) can
    ``free()`` its cached blocks once consumed."""
    ranged = checkpoint(
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    per_part = (
        ranged.groupBy("_pid")
        .agg(F.sum(F.col(flag_col).cast("long")).alias("_pf"))
        .collect()
    )
    acc, offs = 0, []
    for r in sorted(per_part, key=lambda r: r["_pid"]):
        offs.append((r["_pid"], acc))
        acc += int(r["_pf"] or 0)
    off_df = df.sparkSession.createDataFrame(offs, "_pid int, _off long")
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.col("_off") + F.coalesce(
        F.sum(F.col(flag_col).cast("long")).over(w_loc), F.lit(0)
    )
    out = (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, cum)
        .drop("_pid", "_off")
    )
    out._prefix_ckpt = ranged  # type: ignore[attr-defined]
    return out
