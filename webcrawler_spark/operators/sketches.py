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

Two hash tiers (``native_hash`` flag, same pattern as
dedup.duplicated_ngrams): the md5-prefix 32-bit family (default) is
the ORACLE tier — DuckDB reproduces every register bit-for-bit — and
``native_hash=True`` is the PRODUCTION tier: xxhash64 stays in JVM
whole-stage codegen (no hex-string round-trip) and, for HLL, widens
the rho word to 64-b bits. The width matters at frontier scale: a
32-bit hash space saturates a cardinality sketch around ~4·10^9
distinct keys (every register pinned at rho_max), so a 10^10-URL
frontier NEEDS the 64-bit tier; the md5 tier exists for the oracle
and small-corpus parity. All laws (merge = union-groupBy, CMS
one-sided error, HLL error bound) are hash-agnostic and tested on
both tiers.

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


def _h64(col: Column, salt: str) -> Column:
    """Salted xxhash64 (JVM codegen, full 64-bit space) — the
    production hash; not reproducible in DuckDB."""
    return F.xxhash64(F.lit(salt), col)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_registers(
    df: DataFrame,
    col: str,
    key: str | None = None,
    b: int = HLL_B,
    salt: str = "hll",
    native_hash: bool = False,
) -> DataFrame:
    """Per-``key`` HLL register table: (key?, bucket, rho).

    bucket = h mod 2^b; rho = 1 + trailing zeros of the remaining
    hash word (1 + word width when the word is 0). Registers whose
    bucket was never hit are simply absent (value 0 by convention);
    the estimator accounts for them. The groupBy MAX is the sketch
    build *and* the merge — unioning two register tables through the
    same groupBy yields the sketch of the unioned inputs.

    ``native_hash=True`` is the production tier: xxhash64 with a
    (64-b)-bit rho word — required at 10^10-key scale, where the
    32-bit md5-prefix space itself saturates. Default stays md5 so the
    DuckDB oracle reproduces the registers.
    """
    m = 1 << b
    if native_hash:
        h = _h64(F.col(col), salt)
        w = F.shiftrightunsigned(h, b)  # (64-b)-bit word, non-negative
        # trailing zeros exactly, no floats: (w & -w) - 1 has exactly
        # tz low bits set, so bit_count gives tz
        rho = (
            F.when(w == 0, F.lit(64 - b + 1))
            .otherwise(F.bit_count(w.bitwiseAND(-w) - F.lit(1)) + F.lit(1))
            .cast("int")
            .alias("rho")
        )
    else:
        h = _h32(F.col(col), salt)
        w = F.shiftright(h, b)  # (32-b)-bit word
        # trailing zeros via log2(w & -w): w & -w isolates the lowest
        # set bit (an exact power of two, so log2 is exact in a double)
        rho = (
            F.when(w == 0, F.lit(32 - b + 1))
            .otherwise((F.log2(w.bitwiseAND(-w)) + F.lit(1.0)).cast("int"))
            .alias("rho")
        )
    keys = [F.col(key)] if key else []
    rows = df.select(*keys, F.pmod(h, F.lit(m)).alias("bucket"), rho)
    gb = ([key] if key else []) + ["bucket"]
    return rows.groupBy(*gb).agg(F.max("rho").alias("rho"))


def hll_merge(registers: DataFrame, key: str | None = None) -> DataFrame:
    """Merge register tables (e.g. shard sketches built on different
    days, unioned): element-wise MAX per (key?, bucket). Output feeds
    ``hll_estimate`` like any single-build table."""
    gb = ([key] if key else []) + ["bucket"]
    return registers.groupBy(*gb).agg(F.max("rho").alias("rho"))


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


def _cms_cells(
    col: Column, depth: int, width: int, salt: str, native_hash: bool = False
) -> Column:
    """array<struct<r,c>> of the item's register coordinates."""
    hf = _h64 if native_hash else _h32
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(hf(col, f"{salt}{r}"), F.lit(width)).alias("c"),
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
    native_hash: bool = False,
) -> DataFrame:
    """Count-Min register table (r, c, cnt) over ``items[col]``.

    The explode emits ``depth`` rows per item, but the groupBy's
    map-side partial collapses each task's contribution to at most
    ``depth * width`` rows before the shuffle — the network cost is
    the sketch size, not the corpus size. Merging shard sketches is
    the same groupBy with SUM. ``native_hash=True`` selects the
    xxhash64 production family (lookups must pass the same flag).
    """
    rows = items.select(
        F.explode(
            _cms_cells(F.col(col), depth, width, salt, native_hash)
        ).alias("rc")
    )
    return rows.groupBy(
        F.col("rc.r").alias("r"), F.col("rc.c").alias("c")
    ).agg(F.count("*").alias("cnt"))


def cms_merge(registers: DataFrame) -> DataFrame:
    """Merge CMS register tables (union of shard sketches): element-
    wise SUM per (r, c). Estimates over the merged table bound the
    summed true counts — the property that lets per-day sketches
    answer all-time frequency queries without reprocessing."""
    return registers.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    registers: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms",
    native_hash: bool = False,
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
        F.explode(
            _cms_cells(F.col(col), depth, width, salt, native_hash)
        ).alias("rc"),
    ).select(F.col(col), F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    return (
        cells.join(F.broadcast(registers), ["r", "c"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# HDR-style log-linear histogram -> mergeable quantile sketch
# (Tene, HdrHistogram — the public log-linear bucketing design;
# the third mergeable monoid alongside HLL-MAX and CMS-SUM)
# ---------------------------------------------------------------------------

HDR_SUB_BITS = 4  # 16 sub-buckets per octave -> <= 1/16 relative error


def hdr_bucket(col: Column, sub_bits: int = HDR_SUB_BITS) -> Column:
    """Log-linear bucket id for a non-negative integer value
    (negatives clamp to 0). Values below 2^sub_bits get exact unit
    buckets; above, each power-of-two octave splits into 2^sub_bits
    equal sub-buckets, so the bucket's relative width — and therefore
    the quantile estimate's relative error — is bounded by
    1/2^sub_bits at any magnitude up to 2^63.

    Integer-only (binary digit count + shifts, no float log), so the
    DuckDB oracle reproduces every bucket id bit-for-bit.
    """
    v = F.greatest(col.cast("long"), F.lit(0).cast("long"))
    base = 1 << sub_bits
    e = (F.length(F.bin(v)) - 1).cast("int")
    msub = F.call_function("shiftright", v, (e - sub_bits).cast("int"))
    return (
        F.when(v < base, v)
        .otherwise((e - sub_bits + 1) * base + (msub - base))
        .cast("long")
    )


def hdr_lower_bound(bucket: Column, sub_bits: int = HDR_SUB_BITS) -> Column:
    """Smallest value mapping to ``bucket`` — the value a quantile
    read reports (a one-sided <=1/2^sub_bits underestimate)."""
    base = 1 << sub_bits
    k = F.shiftright(bucket, sub_bits).cast("int")
    r = bucket.bitwiseAND(F.lit(base - 1))
    return (
        F.when(bucket < base, bucket)
        .otherwise(F.call_function("shiftleft", (r + base).cast("long"), k - 1))
        .cast("long")
    )


def _hdr_keys(key: str | list[str] | None) -> list[str]:
    if key is None:
        return []
    return [key] if isinstance(key, str) else list(key)


def hdr_histogram(
    df: DataFrame,
    col: str,
    key: str | list[str] | None = None,
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """Build the histogram sketch: (key?, bucket, cnt).

    The monoid is SUM over a bounded key space (<= 64 * 2^sub_bits
    buckets, ~1 Ki rows at the default), so Spark's map-side partial
    aggregate builds the per-task histogram and only bucket rows ever
    shuffle — the same never-move-the-raw-values property as the HLL
    and CMS tiers, and the standard way a 1000-executor cluster takes
    a p99 over 100 TB without sorting anything.
    """
    keys = _hdr_keys(key)
    return (
        df.select(*keys, hdr_bucket(F.col(col), sub_bits).alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(hists: DataFrame, key: str | list[str] | None = None) -> DataFrame:
    """Merge histogram sketches (union of shard/day sketches):
    element-wise SUM per bucket — one groupBy, exact."""
    keys = _hdr_keys(key)
    return hists.groupBy(*keys, "bucket").agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(
    hist: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    key: str | list[str] | None = None,
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """Read quantiles off the sketch: (key?, q, est, n) with
    ``est`` = lower bound of the first bucket whose cumulative count
    reaches rank ``ceil(q * n)``.

    The rank is computed in INTEGER per-myriad arithmetic —
    ``(round(q*10000) * n + 9999) div 10000`` — never as float
    ``ceil(q * n)``: the float product sits within one ulp of an
    integer exactly at the ranks that matter (0.9 * 250 rounds to
    225.00000000000003, whose ceil is 226), and engines disagreeing
    by one rank at a bucket boundary would flip the estimate. Integer
    math makes the read bit-exact at any n up to 2^49.

    The cumulative walk is a codegen ``aggregate`` over the group's
    sorted bucket array — bounded by the bucket-space size, never by
    the data — so there is no global sort and no un-partitioned
    window anywhere in the plan (the anti-pattern key_skew_stats'
    docstring declines); per-key reads shuffle only bucket rows.
    """
    keys = _hdr_keys(key)
    row = hist.groupBy(*keys).agg(
        F.sum("cnt").alias("n"),
        F.sort_array(F.collect_list(F.struct("bucket", "cnt"))).alias("arr"),
    )

    def est_for(pm: int) -> Column:
        rank = F.greatest(
            F.expr(f"cast(({pm} * n + 9999) div 10000 as bigint)"),
            F.lit(1).cast("long"),
        )
        return F.aggregate(
            F.col("arr"),
            F.struct(
                F.lit(0).cast("long").alias("cum"), F.lit(-1).cast("long").alias("ans")
            ),
            lambda acc, x: F.struct(
                (acc["cum"] + x["cnt"]).alias("cum"),
                F.when(acc["ans"] >= 0, acc["ans"])
                .when(
                    acc["cum"] + x["cnt"] >= rank,
                    hdr_lower_bound(x["bucket"], sub_bits),
                )
                .otherwise(F.lit(-1).cast("long"))
                .alias("ans"),
            ),
            lambda acc: acc["ans"],
        )

    structs = []
    for q in qs:
        pm = int(round(q * 10000))
        structs.append(
            F.struct(F.lit(float(q)).alias("q"), est_for(pm).alias("est"))
        )
    qe = F.explode(F.array(*structs)).alias("qe")
    return row.select(*keys, "n", qe).select(
        *keys, F.col("qe.q").alias("q"), F.col("qe.est").alias("est"), "n"
    )


# ---------------------------------------------------------------------------
# Heavy hitters — exact two-pass frequent items via mergeable
# Misra-Gries candidate summaries (Misra & Gries 1982 "Finding
# repeated elements"; mergeability per Agarwal, Cormode, Huang,
# Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012; all public).
#
# The exact answer to "which items occur more than n/(k+1) times"
# normally costs a full groupBy over every item — at 100 TB of tokens
# that shuffle carries the whole corpus vocabulary. The two-pass form
# shuffles almost nothing:
#
#   pass 1  per-partition Misra-Gries summary with k counters
#           (vectorized pandas, O(k) state, no shuffle; each summary
#           undercounts by at most n_p/(k+1) of its partition's n_p
#           rows). Pigeonhole: an item with GLOBAL count > n/(k+1)
#           must exceed n_p/(k+1) in at least one partition, so the
#           union of partition summaries — at most k rows per
#           partition — contains every true heavy hitter.
#   pass 2  exact recount of the candidate union only: a broadcast
#           semi-join (candidates ≤ k·P rows, kilobytes) followed by
#           a map-side-combined count whose state is bounded by the
#           candidate set, not the vocabulary; then the exact filter
#           cnt·(k+1) > n.
#
# The output is therefore EXACT and partitioning-invariant (the
# candidate set may vary with partitioning; the recount + threshold
# make the survivors a pure function of the data), which is what lets
# a plain GROUP BY/HAVING oracle value-check it.
# ---------------------------------------------------------------------------


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate items as a 1-column
    ``(item)`` DataFrame (≤ k rows per input partition, duplicates
    across partitions possible). Vectorized: each Arrow batch folds in
    via ``value_counts``; pruning back to k counters subtracts the
    (k+1)-th largest counter from all (the batched MG decrement — the
    merge step of Agarwal et al. 2012, which preserves the
    undercount ≤ n_p/(k+1) bound)."""
    import pandas as pd

    def part(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf[col].value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                d = counters.nlargest(k + 1).iloc[-1]
                counters = counters[counters > d] - d
        if len(counters):
            yield pd.DataFrame({"item": counters.index})

    schema = df.select(F.col(col).alias("item")).schema
    return df.select(col).mapInPandas(part, schema)


def heavy_hitters(
    df: DataFrame, col: str, k: int, materialize: bool = True
) -> DataFrame:
    """Exact ``(item, cnt)`` for every item occurring MORE than
    n/(k+1) times in ``df[col]`` (n = total rows), without a
    vocabulary-sized shuffle: MG candidates → broadcast semi-join →
    bounded recount → exact threshold. See module comment for the
    guarantee chain; partitioning-invariance is property-tested.
    ``materialize=False`` skips the eager checkpoint (and so keeps the
    input cache pinned until the caller acts) — for plan inspection
    and composition into a larger lazy pipeline."""
    # NULL rows are excluded up front on BOTH passes (pandas
    # value_counts drops them silently, which would make a frequent
    # NULL a guaranteed miss while still counting toward n) — the
    # operator answers "which VALUES are frequent"; n is the non-null
    # row count, matching a WHERE col IS NOT NULL oracle
    # persist once: n, the MG pass, and the recount would otherwise
    # each re-execute the (often explode-heavy) upstream plan — the
    # count below materializes the cache, the other two passes read
    # it, and the tiny eager result lets the cache drop before return
    df = df.where(F.col(col).isNotNull()).persist()
    n = df.count()
    if n == 0:
        df.unpersist()
        return df.select(
            F.col(col).alias("item"), F.lit(0).cast("long").alias("cnt")
        ).limit(0)
    cand = mg_candidates(df, col, k).distinct()
    counts = (
        df.select(F.col(col).alias("item"))
        .join(F.broadcast(cand), "item")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
    )
    out = counts.filter(F.col("cnt") * (k + 1) > n)
    if materialize:
        out = out.localCheckpoint(eager=True)
        df.unpersist()
    return out


# ---------------------------------------------------------------------------
# KMV / bottom-k distinct sketch (Beyer, Haas, Reinwald, Sismanis,
# Gemulla — "On synopses for distinct-value estimation under multiset
# operations", SIGMOD 2007; public). The third cardinality tool beside
# exact distinct and HLL: like HLL it is a tiny mergeable summary, but
# its registers are actual hash VALUES, so two sketches support set
# INTERSECTION estimates (Jaccard of key sets, cross-source overlap)
# that HLL registers cannot express. md5 tier = DuckDB-replayable
# oracle; xxhash64 tier = production (same flag convention as
# hll_registers/cms_registers).
#
# Scale shape (the mg_candidates pattern): a per-partition pandas
# partial keeps only the k smallest distinct hashes per key (O(k·keys)
# state, no shuffle), so the final per-key merge receives ≤ k·P rows —
# never the key's full distinct stream. Merging shards = union the
# register rows and re-take bottom-k: one more groupBy, same as HLL.
# ---------------------------------------------------------------------------

KMV_K = 64


def _kmv_partials(df: DataFrame, col: str, keys: list[str], k: int, h) -> DataFrame:
    """≤ k smallest distinct hashes per key per PARTITION as (keys…, h)
    rows — the map-side combine the final bottom-k merge relies on."""
    import numpy as np
    import pandas as pd

    hashed = df.select(*keys, h.alias("h"))

    def part(batches):
        best: dict[tuple, "np.ndarray"] = {}

        def fold(kt: tuple, hs) -> None:
            cur = np.unique(hs.to_numpy(dtype=np.int64))
            prev = best.get(kt)
            if prev is not None:
                cur = np.unique(np.concatenate([prev, cur]))
            best[kt] = cur[:k]

        for pdf in batches:
            if not keys:
                fold((), pdf["h"])
            else:
                for kv, grp in pdf.groupby(keys, dropna=False, sort=False):
                    fold(kv if isinstance(kv, tuple) else (kv,), grp["h"])
        rows = [kt + (int(v),) for kt, arr in best.items() for v in arr]
        yield pd.DataFrame(rows, columns=[*keys, "h"])

    return hashed.mapInPandas(part, hashed.schema)


def kmv_registers(
    df: DataFrame,
    col: str,
    key: str | list[str] | None = None,
    k: int = KMV_K,
    native_hash: bool = False,
) -> DataFrame:
    """(keys…, h) rows: the k smallest distinct hash values of
    ``df[col]`` per key — the whole sketch, ≤ k rows per key. Merge =
    union rows and call :func:`kmv_merge` (tested merge law, like
    hll_merge). Hashes are non-negative longs (md5 tier: 32-bit)."""
    keys = [key] if isinstance(key, str) else list(key or [])
    h = (
        F.pmod(_h64(F.col(col), "#kmv"), F.lit(2**62)).cast("long")
        if native_hash
        else _h32(F.col(col), "#kmv")
    )
    partials = _kmv_partials(df, col, keys, k, h)
    return kmv_merge(partials, key=keys, k=k)


def kmv_merge(
    registers: DataFrame, key: str | list[str] | None = None, k: int = KMV_K
) -> DataFrame:
    """Union any number of per-shard register sets back into one
    bottom-k sketch per key (idempotent; = kmv_registers of the
    concatenated inputs, tested)."""
    keys = [key] if isinstance(key, str) else list(key or [])
    gb = registers.groupBy(*keys) if keys else registers.groupBy()
    agg = gb.agg(
        F.slice(F.array_sort(F.array_distinct(F.collect_list("h"))), 1, k).alias(
            "ks"
        )
    )
    return agg.select(*keys, F.explode("ks").alias("h"))


_KMV_SPACE = float(2**32)  # md5 tier hash space
_KMV_SPACE_NATIVE = float(2**62)  # native_hash tier (pmod-folded xxhash64)


def kmv_estimate(
    registers: DataFrame,
    key: str | list[str] | None = None,
    k: int = KMV_K,
    native_hash: bool = False,
    space: float | None = None,
) -> DataFrame:
    """(keys…, n_reg, est): distinct-count estimate per key. With
    fewer than k registers the count is EXACT (every distinct hash is
    present); at k registers the Beyer et al. unbiased estimator
    (k-1) / U_(k) applies, U_(k) = the k-th smallest hash scaled to
    (0, 1]. ``native_hash`` MUST match the kmv_registers call that
    built the sketch — the two tiers live in different hash spaces
    (2^32 vs 2^62) and scaling by the wrong one is silently ~2^30×
    off; ``space`` overrides both for custom hash families."""
    if space is None:
        space = _KMV_SPACE_NATIVE if native_hash else _KMV_SPACE
    keys = [key] if isinstance(key, str) else list(key or [])
    gb = registers.groupBy(*keys) if keys else registers.groupBy()
    agg = gb.agg(F.count("*").alias("n_reg"), F.max("h").alias("hk"))
    return agg.select(
        *keys,
        "n_reg",
        F.when(F.col("n_reg") < k, F.col("n_reg").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) / ((F.col("hk") + F.lit(1.0)) / F.lit(space))
        )
        .alias("est"),
    )


def kmv_intersection(
    reg_a: DataFrame,
    reg_b: DataFrame,
    k: int = KMV_K,
    native_hash: bool = False,
    space: float | None = None,
) -> DataFrame:
    """One-row (n_union_reg, matches, est_union, est_intersection)
    from two keyless register sets — the estimate HLL cannot give.
    Beyer et al. §5: K∪ = bottom-k of the register union; ρ = fraction
    of K∪ present in BOTH input sketches; D̂∩ = ρ · D̂∪. ``native_hash``
    must match the registers' build tier (see kmv_estimate)."""
    if space is None:
        space = _KMV_SPACE_NATIVE if native_hash else _KMV_SPACE
    u = kmv_merge(reg_a.unionByName(reg_b), key=None, k=k)
    both = reg_a.select("h").intersect(reg_b.select("h"))
    stats = (
        u.join(both.withColumn("m", F.lit(1)), "h", "left")
        .agg(
            F.count("*").alias("n_union_reg"),
            F.sum(F.coalesce(F.col("m"), F.lit(0))).alias("matches"),
            F.max("h").alias("hk"),
        )
    )
    est_u = (
        F.when(F.col("n_union_reg") < k, F.col("n_union_reg").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) / ((F.col("hk") + F.lit(1.0)) / F.lit(space))
        )
    )
    return stats.select(
        "n_union_reg",
        "matches",
        F.round(est_u, 6).alias("est_union"),
        F.round(
            (F.col("matches") / F.col("n_union_reg")) * est_u, 6
        ).alias("est_intersection"),
    )
