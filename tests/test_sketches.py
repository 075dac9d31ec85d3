"""HLL / Count-Min sketch laws: merge-is-a-groupBy, accuracy bounds,
CMS one-sided error, and cross-engine register parity with DuckDB."""

import duckdb
import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.sketches import (
    cms_lookup,
    cms_merge,
    cms_registers,
    hll_estimate,
    hll_merge,
    hll_registers,
)


@pytest.fixture(scope="module")
def items(spark):
    # 2000 rows over 700 distinct keys, deterministic, skewed:
    # key k_i repeats (i % 5) + 1 times-ish via modulo folding
    df = spark.range(2000).select(
        (F.col("id") % 700).cast("string").alias("k"),
        (F.col("id") % 2).alias("half"),
    )
    return df.persist()


def test_hll_merge_is_union_groupby(spark, items):
    whole = hll_registers(items, "k")
    h0 = hll_registers(items.where("half = 0"), "k")
    h1 = hll_registers(items.where("half = 1"), "k")
    merged = hll_merge(h0.unionByName(h1))
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_hll_estimate_accuracy(spark, items):
    est = hll_estimate(hll_registers(items, "k")).collect()[0]
    # b=8 -> standard error 6.5%; allow 3 sigma
    assert abs(est["estimate"] - 700) / 700 < 0.20


def test_hll_grouped_keys(spark, items):
    regs = hll_registers(items.withColumn("g", F.col("half")), "k", key="g")
    ests = {
        r["g"]: r["estimate"]
        for r in hll_estimate(regs, key="g").collect()
    }
    # each half holds 350 even/odd-id keys... both halves see ~350-700
    # distinct (ids 0..1999 mod 700 alternate halves per id); exact
    # per-half distincts computed below
    exact = {
        r["g"]: r["d"]
        for r in items.groupBy(F.col("half").alias("g"))
        .agg(F.countDistinct("k").alias("d"))
        .collect()
    }
    for g, e in ests.items():
        assert abs(e - exact[g]) / exact[g] < 0.25


def test_hll_registers_match_duckdb(spark, items):
    spark_rows = sorted(map(tuple, hll_registers(items, "k").collect()))
    pdf = items.select("k").toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.sql(
        """
        with h as (select cast(('0x' || substr(md5('hll' || '|' || k), 1, 8))
                        ::UBIGINT as bigint) as hv from t),
        br as (select hv % 256 as bucket, hv // 256 as w from h),
        rho as (select bucket,
                       case when w = 0 then 25
                            else cast(log2(w & -w) as int) + 1 end as rho
                from br)
        select bucket, max(rho) as rho from rho group by bucket
        """
    ).fetchall()
    assert spark_rows == sorted(map(tuple, oracle))


def test_cms_merge_and_one_sided_error(spark, items):
    whole = cms_registers(items, "k")
    c0 = cms_registers(items.where("half = 0"), "k")
    c1 = cms_registers(items.where("half = 1"), "k")
    merged = cms_merge(c0.unionByName(c1))
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # every register row count is >= 0 and the sketch total per row r
    # equals the item count (counts are conserved per hash row)
    n = items.count()
    per_row = whole.groupBy("r").agg(F.sum("cnt").alias("s")).collect()
    assert all(r["s"] == n for r in per_row)


def test_cms_lookup_upper_bounds_exact(spark, items):
    regs = cms_registers(items, "k")
    exact = items.groupBy("k").agg(F.count("*").alias("exact_cnt"))
    probes = exact.orderBy(F.desc("exact_cnt"), "k").limit(20)
    got = (
        cms_lookup(regs, probes.select("k"), "k")
        .join(exact, "k")
        .collect()
    )
    assert len(got) == 20
    for r in got:
        assert r["cms_est"] >= r["exact_cnt"]  # one-sided overcount


def test_cms_lookup_unseen_probe_reads_zero(spark):
    """CMS semantics for never-seen items: any untouched register cell
    reads 0, so the min is 0 — the lookup's left join must not drop
    absent cells (an inner join would min over touched cells only)."""
    import hashlib

    def h32(salt, v):
        return int(hashlib.md5(f"{salt}|{v}".encode()).hexdigest()[:8], 16)

    def cells(v):
        return {(r, h32(f"cms{r}", v) % 256) for r in range(4)}

    corpus = ["a", "b", "c"]
    built = set().union(*[cells(v) for v in corpus])
    probe = next(
        f"probe{i}" for i in range(1000) if not (cells(f"probe{i}") & built)
    )
    regs = cms_registers(
        spark.createDataFrame([(v,) for v in corpus], "k string"), "k"
    )
    got = cms_lookup(
        regs, spark.createDataFrame([(probe,)], "k string"), "k"
    ).collect()
    assert len(got) == 1 and got[0]["cms_est"] == 0


def test_hll_native_tier_laws_and_accuracy(spark, items):
    """Production xxhash64 tier: same merge-is-union-groupBy law and
    error bound as the oracle tier, with a (64-b)-bit rho word."""
    whole = hll_registers(items, "k", native_hash=True)
    h0 = hll_registers(items.where("half = 0"), "k", native_hash=True)
    h1 = hll_registers(items.where("half = 1"), "k", native_hash=True)
    merged = hll_merge(h0.unionByName(h1))
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    rhos = [r["rho"] for r in whole.collect()]
    assert all(1 <= r <= 64 - 8 + 1 for r in rhos)
    est = hll_estimate(whole).collect()[0]["estimate"]
    assert abs(est - 700) / 700 < 0.2  # 3x the 6.5% standard error


def test_cms_native_tier_one_sided(spark, items):
    regs = cms_registers(items, "k", native_hash=True)
    exact = items.groupBy("k").agg(F.count("*").alias("exact_cnt"))
    got = (
        cms_lookup(regs, exact.select("k"), "k", native_hash=True)
        .join(exact, "k")
        .collect()
    )
    assert len(got) == 700
    assert all(r["cms_est"] >= r["exact_cnt"] for r in got)


# ---------------------------------------------------------------------------
# HDR log-linear histogram quantiles
# ---------------------------------------------------------------------------

from webcrawler_spark.operators.sketches import (  # noqa: E402
    hdr_bucket,
    hdr_histogram,
    hdr_lower_bound,
    hdr_merge,
    hdr_quantiles,
)


def _py_bucket(v: int, m: int = 4) -> int:
    v = max(v, 0)
    if v < (1 << m):
        return v
    e = v.bit_length() - 1
    return (e - m + 1) * (1 << m) + ((v >> (e - m)) - (1 << m))


def _py_lb(i: int, m: int = 4) -> int:
    if i < (1 << m):
        return i
    return ((1 << m) + (i & ((1 << m) - 1))) << ((i >> m) - 1)


VALUES = [0, 1, 15, 16, 17, 31, 32, 63, 64, 100, 128, 306, 1000, 65535,
          10**6, 2**40 + 12345, -7]


def test_hdr_bucket_and_bound_hand_computed(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "v long")
    out = df.select(
        "v",
        hdr_bucket(F.col("v")).alias("b"),
        hdr_lower_bound(hdr_bucket(F.col("v"))).alias("lb"),
    ).collect()
    for r in out:
        assert r["b"] == _py_bucket(r["v"]), r
        assert r["lb"] == _py_lb(_py_bucket(r["v"])), r
        # lower bound never exceeds the value; relative width <= 1/16
        v = max(r["v"], 0)
        assert r["lb"] <= v
        assert v <= r["lb"] + max(r["lb"] // 16, 0) or v < 16


@pytest.fixture(scope="module")
def lengths(spark):
    # deterministic long-tailed lengths: quadratic spread over 3 keys
    return spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * F.col("id") % 91997).alias("v"),
    ).persist()


def test_hdr_merge_is_union_groupby(lengths):
    whole = hdr_histogram(lengths, "v")
    parts = hdr_merge(
        hdr_histogram(lengths.where("id % 2 = 0"), "v").unionByName(
            hdr_histogram(lengths.where("id % 2 = 1"), "v")
        )
    )
    a = sorted(map(tuple, whole.collect()))
    b = sorted(map(tuple, parts.collect()))
    assert a == b


def test_hdr_quantiles_error_bound_and_rank(lengths):
    rows = hdr_quantiles(hdr_histogram(lengths, "v", key="g"), key="g").collect()
    exact = {
        g: sorted(r["v"] for r in lengths.where(F.col("g") == g).collect())
        for g in ("0", "1", "2")
    }
    assert len(rows) == 9
    for r in rows:
        xs = exact[r["g"]]
        assert r["n"] == len(xs)
        pm = int(round(r["q"] * 10000))
        true = xs[max((pm * len(xs) + 9999) // 10000, 1) - 1]
        # one-sided: est <= true < est * (1 + 1/16) (+1 for unit buckets)
        assert r["est"] <= true
        assert true <= r["est"] + max(r["est"] // 16, 1)


def test_hdr_exact_below_base(spark):
    # values < 16 bucket exactly, so quantiles are exact order stats
    df = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]],
                               "v long")
    out = {r["q"]: r["est"] for r in hdr_quantiles(
        hdr_histogram(df, "v"), qs=(0.1, 0.5, 1.0)).collect()}
    assert out == {0.1: 1, 0.5: 5, 1.0: 10}


def test_hdr_partition_invariance(lengths):
    one = sorted(map(tuple, hdr_quantiles(
        hdr_histogram(lengths.coalesce(1), "v", key="g"), key="g").collect()))
    many = sorted(map(tuple, hdr_quantiles(
        hdr_histogram(lengths.repartition(17), "v", key="g"), key="g").collect()))
    assert one == many


def test_hdr_plan_is_partial_agg_no_window(lengths):
    plan = (
        hdr_quantiles(hdr_histogram(lengths, "v", key="g"), key="g")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "partial" in plan.lower()  # map-side combine on the bucket agg
