"""Mergeable sketches: HyperLogLog cardinality and Count-Min frequency.

At 100 TB, exact corpus statistics are shuffle-bound: ``COUNT(DISTINCT
url)`` moves every distinct URL across the wire once, and an exact
word-frequency table moves every token. A sketch caps the shuffled
bytes at the register width instead: register updates are commutative
monoids (MAX for HLL, SUM for CMS), so Spark's hash-aggregate
*partial* step builds the per-task sketch map-side and only ``(key,
register)`` rows — ``2^b`` per key for HLL, ``depth x width`` total
for CMS — ever cross the wire. Merging two sketches is element-wise
MAX/SUM of their registers, i.e. one more ``groupBy`` — this is how a
1000-executor cluster estimates per-host URL cardinality without
shuffling a single URL, and how shard sketches built on different days
union for free (tested in tests/test_sketches.py).

The md5-prefix 32-bit hash family is used (the same trick as
dedup.py's SimHash oracle tier) so a DuckDB ANSI-SQL oracle reproduces
every register bit-for-bit; production swaps in native xxhash64 for
JVM-codegen hashing (no md5 string round-trip) — registers then
differ from the oracle family but all laws are hash-agnostic.

Reference parity: the reference keeps an exact per-host crawled set
(Host.py:17, 136-145 `_crawledResources`, one Python set per host);
these sketches are the approximate tier that replaces exact
distinct-counting where exact sets stop being affordable.
Algorithms: Flajolet-Fusy-Gandouet-Meunier 2007 (HyperLogLog, incl.
the small-range linear-counting correction), Cormode-Muthukrishnan
2005 (Count-Min).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_B = 8  # 2^8 = 256 registers; standard error 1.04/sqrt(256) = 6.5%
CMS_DEPTH = 4
CMS_WIDTH = 256


def _h32(col: Column, salt: str) -> Column:
    """First 8 hex chars of salted md5 -> uint32 in a long (same bits
    in DuckDB via ('0x' || substr(md5(..), 1, 8))::UBIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(salt), col)), 1, 8), 16, 10
    ).cast("long")


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_registers(
    df: DataFrame,
    col: str,
    key: str | None = None,
    b: int = HLL_B,
    salt: str = "hll",
) -> DataFrame:
    """Per-``key`` HLL register table: (key?, bucket, rho).

    bucket = h mod 2^b; rho = 1 + trailing zeros of the remaining
    (32-b)-bit word (1 + 32-b when the word is 0). Registers whose
    bucket was never hit are simply absent (value 0 by convention);
    the estimator accounts for them. The groupBy MAX is the sketch
    build *and* the merge — unioning two register tables through the
    same groupBy yields the sketch of the unioned inputs.
    """
    h = _h32(F.col(col), salt)
    m = 1 << b
    w = F.shiftright(h, b)  # (32-b)-bit word
    # trailing zeros via log2(w & -w): w & -w isolates the lowest set
    # bit (an exact power of two, so log2 is exact in a double)
    rho = (
        F.when(w == 0, F.lit(32 - b + 1))
        .otherwise((F.log2(w.bitwiseAND(-w)) + F.lit(1.0)).cast("int"))
        .alias("rho")
    )
    keys = [F.col(key)] if key else []
    rows = df.select(*keys, F.pmod(h, F.lit(m)).alias("bucket"), rho)
    gb = ([key] if key else []) + ["bucket"]
    return rows.groupBy(*gb).agg(F.max("rho").alias("rho"))


# alpha_m * m^2 for m = 256, embedded as one decimal literal so Spark
# and the SQL oracle parse the identical double
_ALPHA_MM_256 = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0


def hll_estimate(
    registers: DataFrame, key: str | None = None, b: int = HLL_B
) -> DataFrame:
    """Cardinality estimate from a register table: (key?, n_hit,
    estimate). Applies the HLL small-range correction (linear
    counting ``m * ln(m/V)`` when raw <= 2.5m and empty registers
    exist). The harmonic sum's terms are exact powers of two, so the
    double-precision sum is order-independent — safe under any
    shuffle/merge order and bit-identical to the SQL oracle.
    """
    if b != HLL_B:
        raise ValueError("estimator constants are precomputed for b=8")
    m = float(1 << b)
    keys = [key] if key else []
    agg = registers.groupBy(*keys).agg(
        F.count("*").alias("n_hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
    )
    v = F.lit(m) - F.col("n_hit").cast("double")  # empty registers
    raw = F.lit(_ALPHA_MM_256) / (F.col("s") + v)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.lit(m) * F.log(F.lit(m) / v)
    ).otherwise(raw)
    return agg.select(
        *keys, "n_hit", F.round(est, 4).alias("estimate")
    )


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def _cms_cells(col: Column, depth: int, width: int, salt: str) -> Column:
    """array<struct<r,c>> of the item's register coordinates."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(_h32(col, f"{salt}{r}"), F.lit(width)).alias("c"),
            )
            for r in range(depth)
        ]
    )


def cms_registers(
    items: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Count-Min register table (r, c, cnt) over ``items[col]``.

    The explode emits ``depth`` rows per item, but the groupBy's
    map-side partial collapses each task's contribution to at most
    ``depth * width`` rows before the shuffle — the network cost is
    the sketch size, not the corpus size. Merging shard sketches is
    the same groupBy with SUM.
    """
    rows = items.select(
        F.explode(_cms_cells(F.col(col), depth, width, salt)).alias("rc")
    )
    return rows.groupBy(
        F.col("rc.r").alias("r"), F.col("rc.c").alias("c")
    ).agg(F.count("*").alias("cnt"))


def cms_lookup(
    registers: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for each probe item: min over the
    item's ``depth`` registers (the CMS estimate, an upper bound on
    the true count). The register table is at most depth*width rows,
    so the join side is broadcast.

    The join is a LEFT join with absent cells coalesced to 0: a
    register row the build never touched has count 0, so a probe item
    with any untouched cell estimates 0 (correct CMS semantics for
    never-seen items — an inner join would silently take the min over
    only the touched cells, or drop the item entirely)."""
    cells = probes.select(
        F.col(col),
        F.explode(_cms_cells(F.col(col), depth, width, salt)).alias("rc"),
    ).select(F.col(col), F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    return (
        cells.join(F.broadcast(registers), ["r", "c"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
