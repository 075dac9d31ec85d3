"""Corpus mixing & reporting: deterministic stratified sampling and
dataset-card rollups.

A training-data pipeline ends with *mixture construction*: given
per-stratum target rates (e.g. upsample low-resource languages,
downsample boilerplate-heavy sources), emit a reproducible sample.
Randomness must be a pure function of the row key — `rand()` changes
under retries, repartitions, and re-runs, which silently breaks
exactly-once semantics of incremental pipeline re-builds. The sampler
here derives a uniform in [0, 1) from the first 8 hex digits of
md5(key), the same construction DuckDB can evaluate, so the sample is
bit-reproducible across engines and cluster sizes.

Plan shape at scale: pure codegen projection + filter — zero shuffles,
filter pushes to the scan when the stratum column is a partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 2^32: the md5-prefix space; u = int(md5[:8], 16) / 2^32 is uniform
# in [0, 1) with 32-bit resolution — plenty for sampling rates.
_HASH_SPACE = float(1 << 32)


def uniform_hash_col(key: Column) -> Column:
    """Deterministic uniform [0, 1) from a key column.

    ``conv(substr(md5(key), 1, 8), 16, 10)`` is whole-stage-codegen
    JVM-side; the DuckDB twin is
    ``cast(('0x' || substring(md5(key), 1, 8)) as ubigint)``.
    """
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
            "double"
        )
        / F.lit(_HASH_SPACE)
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with probability ``rates[stratum]`` (else
    ``default_rate``), decided by the deterministic per-row hash.

    The decision depends only on (id, rate table): re-running at any
    parallelism, partitioning, or engine yields the same sample —
    the property that makes mixture re-builds reproducible at 100 TB.
    """
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(
            F.col(stratum_col) == stratum, F.lit(float(r))
        ).otherwise(rate)
    return df.where(uniform_hash_col(F.col(id_col)) < rate)


def temperature_rates(
    df: DataFrame,
    temperature: float = 2.0,
    target_frac: float = 0.5,
    source_col: str = "source",
) -> dict[str, float]:
    """Per-source keep rates for temperature-scaled sampling (the
    XLM-R / mT5 mixture law, Conneau et al. 2020 §3.1 public recipe):
    sample source s with probability p_s ∝ n_s^(1/T), i.e. T > 1
    up-weights small sources against the head-heavy web distribution.
    keep_rate_s = min(1, target_total · p_s / n_s) realizes the target
    corpus size in expectation.

    The rate table is driver model state (one row per source —
    centroid-sized at any corpus scale) computed from ONE tiny hash
    aggregate. Float determinism: the denominator is a left-to-right
    fold over sources in sorted order and every rate is rounded to 6
    decimals, so a SQL engine replaying the same recipe lands on the
    same doubles and the same keep decisions (mixture_sample's md5
    cut is already engine-exact)."""
    import math

    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values())
    alpha = 1.0 / float(temperature)
    # T=2 is the oracle tier: sqrt is IEEE-correctly-rounded everywhere,
    # pow(x, 0.5) need not be — keep the SQL-replayable path exact
    if alpha == 0.5:
        weights = {s: math.sqrt(float(n)) for s, n in counts.items()}
    else:
        weights = {s: math.pow(float(n), alpha) for s, n in counts.items()}
    denom = 0.0
    for s in sorted(weights):  # pinned fold order (oracle replays it)
        denom = denom + weights[s]
    target_total = float(target_frac) * total
    return {
        s: round(min(1.0, target_total * weights[s] / denom / counts[s]), 6)
        for s in counts
    }


def temperature_mixture(
    df: DataFrame,
    temperature: float = 2.0,
    target_frac: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled source sampling: rates derived from the
    observed source sizes (temperature_rates), applied as the
    deterministic md5 cut — bit-reproducible at any parallelism and
    across engines. Adds the applied ``rate`` column."""
    rates = temperature_rates(df, temperature, target_frac, source_col)
    rate = F.lit(0.0)
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == s, F.lit(float(r))).otherwise(rate)
    return df.withColumn("rate", rate).where(
        uniform_hash_col(F.col(id_col)) < F.col("rate")
    )


def source_report(
    df: DataFrame,
    source_col: str = "source",
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dataset-card rollup per (source, stratum): document count,
    token totals, mean length, and the exact-duplicate fraction
    (1 - distinct texts / docs).

    One hash aggregate on (source, stratum); the duplicate fraction
    rides the same aggregate via ``count(distinct md5(text))`` —
    hashing first keeps the distinct-agg state at 32 bytes/row
    instead of carrying full document text through the shuffle.
    """
    return (
        df.groupBy(
            F.col(source_col).alias("source"),
            F.col(stratum_col).alias("stratum"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.col(text_col), " "))).alias("total_tokens"),
            F.round(F.avg(F.length(F.col(text_col))), 6).alias("avg_chars"),
            F.countDistinct(F.md5(F.col(text_col))).alias("distinct_texts"),
        )
        .select(
            "source",
            "stratum",
            "n_docs",
            "total_tokens",
            "avg_chars",
            F.round(
                F.lit(1.0) - F.col("distinct_texts") / F.col("n_docs"), 6
            ).alias("exact_dup_frac"),
        )
    )


def quality_sample(
    scored: DataFrame,
    cuts: list[float],
    rates: list[float],
    score_col: str = "mean_log10_prob",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-stratified sampling: bucket each row by fixed score
    thresholds, keep with the bucket's rate (decided by the same
    deterministic per-row hash as :func:`mixture_sample`).

    ``cuts`` are ascending score cutoffs splitting the line into
    ``len(cuts) + 1`` buckets; ``rates[i]`` is the keep rate of bucket
    i (bucket 0 = score below ``cuts[0]``). This is the CCNet/Wenzek
    LM-bucketing mixture step with *fixed* thresholds rather than
    corpus quantiles — quantiles need a global sort or approxQuantile
    pre-pass, while fixed cuts keep the pass a pure codegen
    projection+filter, reproducible across corpus snapshots (a doc's
    fate never depends on what else is in the batch).

    Output: input rows that survive, plus ``bucket`` for the audit
    rollup.
    """
    if len(rates) != len(cuts) + 1:
        raise ValueError("need len(rates) == len(cuts) + 1")
    s = F.col(score_col)
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (s >= F.lit(float(c))).cast("int")
    rate = F.lit(float(rates[0]))
    for i, r in enumerate(rates[1:], start=1):
        rate = F.when(bucket == i, F.lit(float(r))).otherwise(rate)
    return scored.withColumn("bucket", bucket).where(
        uniform_hash_col(F.col(id_col)) < rate
    )


def domain_cap(
    df: DataFrame,
    host_col: str = "source",
    k: int = 10,
    score_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap (RefinedWeb-style host balancing): keep
    at most ``k`` documents per ``host_col``, preferring the highest
    ``score_col`` (ties and the no-score case broken by ``id_col`` so
    the kept set is a pure function of the data, reproducible at any
    parallelism).

    Why it exists: a handful of mega-hosts (forums, wikis, link farms)
    dominate any web crawl; capping per registered domain is the
    standard re-balancing pass before mixture construction.

    Output: the input columns plus ``host_rank`` (1-based within the
    host, in keep-preference order) for the audit trail.

    Scale notes (100 TB): the naive plan — one window partitioned by
    host — puts every row of a mega-host in ONE task (exactly the skew
    this operator is meant to fix). This uses the same two-level
    trick as ``cosine_topk``: each scan partition first keeps its local
    top-k per host with a window on (spark_partition_id, host) — the
    shuffle key includes the partition id, so a mega-host spreads over
    all tasks — then the exact window ranks the <= k * n_partitions
    survivors per host. Result is identical to the single-window plan
    because the keep order is total.
    """
    from pyspark.sql.window import Window

    order = (
        [F.col(score_col).desc(), F.col(id_col)]
        if score_col
        else [F.col(id_col)]
    )
    w_local = Window.partitionBy("__pid", host_col).orderBy(*order)
    survivors = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__pid", "__lr")
    )
    w = Window.partitionBy(host_col).orderBy(*order)
    return (
        survivors.withColumn("host_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("host_rank") <= k)
    )


def leakage_safe_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    n: int = 3,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Cluster-aware train/val/test assignment: (doc, component, split)
    where every member of a near-duplicate cluster lands in the SAME
    split.

    Splitting per-document leaks: a near-duplicate of a validation
    document sitting in train makes held-out loss look better than it
    is (the Lee et al. 2022 / Dolma motivation for dedup-aware splits).
    The fix is to split by duplicate-cluster id, not document id:
    near-dup clusters come from graph.duplicate_clusters (LSH→Jaccard
    pairs chained by connected components; singletons are their own
    cluster), then the cluster id hashes to a deterministic uniform
    (mixing.uniform_hash_col) cut against the cumulative split rates.

    Plan shape at scale: the clustering dominates (see
    duplicate_clusters — bounded bucket joins + O(log n) CC rounds);
    the split itself is one codegen projection on top, zero extra
    shuffles, and bit-reproducible across engines and cluster sizes.
    """
    from webcrawler_spark.operators.graph import duplicate_clusters

    rates = [float(r) for _, r in splits]
    if abs(sum(rates) - 1.0) > 1e-9:
        raise ValueError(f"split rates must sum to 1, got {sum(rates)}")
    clusters = duplicate_clusters(docs, id_col, text_col, n, bands, threshold)
    u = uniform_hash_col(F.col("component"))
    expr = F.lit(splits[-1][0])
    cum = 0.0
    cuts = []
    for name, rate in splits[:-1]:
        cum += float(rate)
        cuts.append((name, cum))
    for name, cut in reversed(cuts):
        expr = F.when(u < F.lit(cut), F.lit(name)).otherwise(expr)
    return clusters.select(id_col, "component", expr.alias("split"))


def keep_best_per_cluster(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "component",
    score_col: str = "score",
) -> DataFrame:
    """FineWeb-style near-duplicate survivor choice: per cluster keep
    the HIGHEST-scoring document (tie → smallest id) instead of the
    min-id canonical that ``duplicate_clusters`` defaults to — when a
    page exists in several near-identical variants, the pipeline
    should retain the best one (longest / highest quality), not the
    one that happened to be crawled first.

    Output: (id, cluster, score, keeper boolean) for every input doc.

    Scale shape: the argmax is ``max_by(id, struct(score, -id))`` — a
    MAX monoid, so Spark's partial aggregation resolves each cluster
    map-side and only one candidate row per (task, cluster) shuffles;
    a pathological million-doc cluster never concentrates its rows in
    one window partition (no row_number anywhere). One join to
    attach scores, one hash aggregate, one broadcast-or-hash join
    back; singleton clusters keep themselves by construction.
    """
    j = clusters.join(scores, id_col)
    keepers = j.groupBy(cluster_col).agg(
        F.max_by(
            F.col(id_col),
            F.struct(F.col(score_col), (-F.col(id_col)).cast("long")),
        ).alias("_keeper_id")
    )
    return (
        j.join(keepers, cluster_col)
        .select(
            F.col(id_col),
            F.col(cluster_col),
            F.col(score_col),
            (F.col(id_col) == F.col("_keeper_id")).alias("keeper"),
        )
    )
