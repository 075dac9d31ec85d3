"""Interpolated bigram language-model scoring — the context-aware
tier of CCNet's perplexity bucketing (Wenzek et al., "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data",
LREC 2020, public: documents scored by an LM trained on a clean
target corpus, then bucketed head/middle/tail). The production CCNet
model is a 5-gram KenLM; this sandbox analog is a Jelinek-Mercer
interpolated bigram model (Jelinek & Mercer 1980 — the classic
mixture smoothing), which already captures the context signal the
unigram tier (textstats.unigram_logprob) can't.

Model:

    p(w2 | w1) = λ · c(w1 w2)/c(w1)  +  (1-λ) · (c(w2)+1)/(N+V)

ML bigram conditional, interpolated with an add-1-smoothed unigram —
unseen bigrams (or unseen w1) fall back to the unigram term, unseen
w2 to the 1/(N+V) floor, so every score is finite. Document score =
mean log10 p over its bigram positions (docs with < 2 tokens are
absent — they have no bigram positions to score).

Plan shape at 100 TB: fit = one explode + two hash aggregates with
map-side partial combine (the bigram table scales with the corpus's
DISTINCT bigrams, not with vocab²; it stays a DataFrame and scoring
joins it by key — never collected). Scoring = explode to bigram
positions → shuffle join against the bigram counts on (w1, w2) →
join against the unigram counts (vocabulary-sized, broadcast) → one
per-doc hash aggregate. At cluster scale write the bigram table
bucketed by (w1, w2) so the scoring join is co-located.

Reference parity note: the reference crawler has no LM scoring; this
extends the rebuilt engine's cleaning tier (gopher_quality →
unigram_logprob → this) toward the full CCNet recipe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from webcrawler_spark.operators.textstats import words_col


def _bigrams(text: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs.

    Linear form (round-5 scale fix): the element_at-per-index lambda
    re-evaluates the un-bound words array per element (interpreted
    higher-order lambdas have no subexpression reuse) — O(n_tokens²)
    per doc. zip_with evaluates both input arrays ONCE and pairs
    element-wise; the ragged null tail is trimmed by one final
    slice."""
    w = words_col(text)
    n = F.size(w)
    shifted = F.slice(w, 2, F.greatest(n - 1, F.lit(0)))
    pairs = F.zip_with(
        w,
        shifted,
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return F.when(
        n < 2, F.array().cast("array<struct<w1:string,w2:string>>")
    ).otherwise(F.slice(pairs, 1, n - 1))


def fit_bigram_lm(
    train: DataFrame, col: str = "text"
) -> tuple[DataFrame, DataFrame, int, int]:
    """Count tables from the training slice: returns
    ``(bigram_counts(w1, w2, c12), unigram_counts(term, c), n_tokens,
    vocab_size)``. Both tables stay distributed; the two scalars are
    1-row aggregates."""
    words = train.select(F.explode(words_col(F.col(col))).alias("term"))
    uni = words.groupBy("term").agg(F.count("*").alias("c"))
    bi = (
        train.select(F.explode(_bigrams(F.col(col))).alias("b"))
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    totals = uni.agg(
        F.sum("c").alias("n_tokens"), F.count("*").alias("v")
    ).collect()[0]
    return bi, uni, int(totals["n_tokens"] or 0), int(totals["v"] or 0)


def bigram_logprob(
    df: DataFrame,
    bi: DataFrame,
    uni: DataFrame,
    n_tokens: int,
    vocab_size: int,
    col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
) -> DataFrame:
    """(id, n_bigrams, avg_logp): per-document mean log10 of the
    interpolated bigram probability. Docs with < 2 tokens are absent.

    Join order: positions ⋈ bigram counts on (w1, w2) [shuffle —
    the bigram table is corpus-sized], then ⋈ unigram counts twice
    (w1 context total, w2 unigram mass) [broadcast — vocabulary-
    sized], then one per-doc aggregate."""
    pos = df.select(
        F.col(id_col), F.explode(_bigrams(F.col(col))).alias("b")
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    denom = float(n_tokens + vocab_size)
    p = (
        F.lit(float(lam))
        * F.when(
            F.col("c1").isNotNull() & F.col("c12").isNotNull(),
            F.col("c12") / F.col("c1"),
        ).otherwise(F.lit(0.0))
        + F.lit(1.0 - float(lam))
        * ((F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0)) / F.lit(denom))
    )
    return (
        pos.join(bi, ["w1", "w2"], "left")
        .join(F.broadcast(c1), "w1", "left")
        .join(F.broadcast(c2), "w2", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg(F.log10(p)).alias("avg_logp"),
        )
    )


def bigram_logprob_self(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", lam: float = 0.7
) -> DataFrame:
    """Self-trained convenience wrapper (the corpus supplies its own
    model, like unigram_logprob): fit on ``df``, score ``df``."""
    bi, uni, n, v = fit_bigram_lm(df, col)
    return bigram_logprob(df, bi, uni, n, v, col, id_col, lam)


# ---------------------------------------------------------------------------
# CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3, public):
# the pipeline's actual output artifact — each document assigned to
# the best/middle/worst third of its language by LM score, so
# downstream training mixes can sample "head only" or re-weight tails.
# ---------------------------------------------------------------------------


def rank_buckets(
    scored: DataFrame,
    score_col: str = "score_q",
    key_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each row a ``bucket`` ∈ {head, middle, tail} by the
    per-``key_col`` thirds of an INTEGER ``score_col`` (higher =
    better). The integer rank rule (all comparisons in integer
    arithmetic, the HDR-quantile lesson — float ``q*n`` products sit
    one ulp off an integer exactly at common ranks):

        tail    3·c_le(s) ≤ n          (the worst third)
        head    3·c_lt(s) ≥ 2n         (the best third)
        middle  otherwise

    with c_le/c_lt = rows in the key scoring ≤ / < s, n = rows in the
    key. Ties share a bucket by construction (same s ⇒ same c_le/c_lt)
    and a tie-group straddling a boundary resolves tail-first — the
    rule is a pure function of the (key, score) multiset, so it is
    partitioning- and engine-reproducible.

    Plan shape at 100 TB: one map-side-combined count on (key, score)
    — the window below runs over DISTINCT quantized scores per key
    (bounded by score granularity, not by documents), never over the
    document table; assignment joins the ≤|distinct scores| bucket
    table back on (key, score). No un-partitioned window anywhere. At
    extreme granularity swap the exact cutoffs for hdr_quantiles —
    the rule is sketch-compatible because it only needs c_le/c_lt.
    """
    from pyspark.sql.window import Window

    counts = scored.groupBy(key_col, score_col).agg(F.count("*").alias("c"))
    w = Window.partitionBy(key_col).orderBy(score_col)
    wk = Window.partitionBy(key_col)
    marked = (
        counts.withColumn("c_le", F.sum("c").over(w))
        .withColumn("c_lt", F.col("c_le") - F.col("c"))
        .withColumn("n", F.sum("c").over(wk))
        .select(
            key_col,
            score_col,
            F.when(3 * F.col("c_le") <= F.col("n"), F.lit("tail"))
            .when(3 * F.col("c_lt") >= 2 * F.col("n"), F.lit("head"))
            .otherwise(F.lit("middle"))
            .alias("bucket"),
        )
    )
    return scored.join(marked, [key_col, score_col])


def ccnet_buckets(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    lam: float = 0.7,
) -> DataFrame:
    """(id, lang, score_q, bucket): the CCNet tiering composed from
    this module's pieces — self-trained interpolated-bigram score per
    document (bigram_logprob_self), quantized to integer micro-log10
    units (``round(avg_logp·10^6)`` — the same 6-dp granularity every
    float oracle in the repo compares at), then head/middle/tail by
    per-language thirds via rank_buckets. Docs with < 2 tokens have no
    LM score and are absent, as in bigram_logprob.

    CCNet buckets by PERPLEXITY ascending (lower ppl = head); mean
    log-probability is monotone-opposite, so higher score_q = head
    here — same tiering, sign-flipped scale."""
    scored = bigram_logprob_self(df, col=col, id_col=id_col, lam=lam)
    keyed = scored.join(df.select(id_col, lang_col), id_col).select(
        id_col,
        lang_col,
        F.round(F.col("avg_logp") * F.lit(1000000.0)).cast("long").alias("score_q"),
    )
    return rank_buckets(keyed, "score_q", lang_col, id_col)
