"""Adaptive recrawl scheduling — per-URL change-rate estimation and
revisit prioritization (public: Cho & Garcia-Molina, "Estimating
Frequency of Change", ACM TOIT 2003; the refresh-policy literature a
production crawler schedules revisits with).

Input: a fetch-history table (url, round, digest) — exactly what the
rebuilt engine's snapshot catalog accumulates across rounds (every
`pages_fetched` delta carries url + content digest; the time-travel
catalog in tables.py replays any range of rounds).

1. **change detection** — one window pass per url ordered by round:
   a revisit counts as a *change* when its digest differs from the
   previous fetch's digest.
2. **rate estimation** — the paper's bias-corrected estimator for
   regular access intervals: with ``n`` revisit intervals, ``X`` of
   which showed a change, and mean interval ``I`` (in rounds),

       λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / I

   (the +0.5 Jeffreys correction keeps λ̂ finite when X = n).
3. **revisit priority** — Poisson staleness: the probability the page
   changed since its last fetch after ``age`` rounds,

       p_stale = 1 - exp(-λ̂ · age)

   A frontier orders revisits by p_stale (optionally × importance).

Plan shape at 10^10 URLs: one shuffle on url for the lag window (the
history table is already written partitioned by url-hash bucket, so
at cluster scale the window is partition-local), one hash aggregate
to per-url stats, then a pure projection. No joins, no collects.

Reference parity note: the reference crawler (Pendulun/WebCrawler)
never revisits a URL (its seen-set is permanent); recrawl scheduling
is the standard signal a freshness-aware production frontier adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def url_change_stats(
    history: DataFrame,
    url_col: str = "url",
    round_col: str = "round",
    digest_col: str = "digest",
) -> DataFrame:
    """Per-url revisit statistics from the fetch history:
    (url, n_fetches, n_intervals, n_changes, mean_interval,
    last_round). Rows with a single fetch have n_intervals = 0."""
    w = Window.partitionBy(url_col).orderBy(round_col)
    d = history.select(
        F.col(url_col).alias("url"),
        F.col(round_col).alias("round"),
        F.col(digest_col).alias("digest"),
    ).withColumn("prev_digest", F.lag("digest").over(w)).withColumn(
        "prev_round", F.lag("round").over(w)
    )
    return d.groupBy("url").agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.count("prev_digest").cast("long").alias("n_intervals"),
        F.sum(
            F.when(
                F.col("prev_digest").isNotNull()
                & (F.col("digest") != F.col("prev_digest")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_changes"),
        F.avg(F.col("round") - F.col("prev_round")).alias("mean_interval"),
        F.max("round").cast("long").alias("last_round"),
    )


def recrawl_priority(
    history: DataFrame,
    now_round: int,
    url_col: str = "url",
    round_col: str = "round",
    digest_col: str = "digest",
    default_rate: float = 0.1,
) -> DataFrame:
    """(url, change_rate, age, p_stale): Cho-Garcia-Molina λ̂ per url
    plus the Poisson staleness probability at ``now_round``. URLs with
    no revisit yet (n_intervals = 0) get ``default_rate`` — the
    explore-vs-exploit prior a scheduler would tune."""
    stats = url_change_stats(history, url_col, round_col, digest_col)
    lam = F.when(
        F.col("n_intervals") > 0,
        -F.log(
            (F.col("n_intervals") - F.col("n_changes") + F.lit(0.5))
            / (F.col("n_intervals") + F.lit(0.5))
        )
        / F.col("mean_interval"),
    ).otherwise(F.lit(float(default_rate)))
    age = F.lit(int(now_round)) - F.col("last_round")
    return stats.select(
        "url",
        lam.alias("change_rate"),
        age.cast("long").alias("age"),
        (F.lit(1.0) - F.exp(-lam * age)).alias("p_stale"),
    )
