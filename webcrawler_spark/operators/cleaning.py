"""Corpus-cleaning operators: rule-based quality gating and
corpus-level segment (line/paragraph) deduplication.

These are the two passes every published web-text pipeline runs
between the crawl and training (Gopher's quality rules, CCNet-style
shared-paragraph removal). Both are pure native Catalyst expression —
whole-stage codegen, no Python — and oracle-exact (integer and string
ops only until the final ratio, which both engines compute as the same
double division).

Scale notes (100 TB corpus):
* ``gopher_quality_flags`` is a projection — zero shuffles, fully
  pushdown-friendly (only the text column is read).
* ``dedup_text_segments`` shuffles once on the segment string (the
  window over ``seg``); the reassembly is one hash aggregate on doc id.
  A hot segment (boilerplate that appears 10^9 times) is exactly the
  case AQE skew-split handles, and the count/keeper decision per
  segment is a single window pass, never a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from webcrawler_spark.operators.textstats import STOPWORDS, token_count, words_col


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, §A1.1 — the public
# rule set, re-parameterized; thresholds are arguments)
# ---------------------------------------------------------------------------


def gopher_quality_flags(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_hits: int = 2,
    max_dup_2gram_ratio: float = 0.3,
) -> DataFrame:
    """One row per doc with a boolean per rule plus the final ``keep``.

    Rules (each independently inspectable, so a pipeline can log WHY a
    doc was dropped — the drop-reason histogram is the first thing a
    corpus audit asks for):

    * ok_word_count    — min_words ≤ tokens ≤ max_words
    * ok_avg_word_len  — mean word length within [min, max]
    * ok_symbol_ratio  — (# '#' + # '...') / tokens ≤ max_symbol_ratio
    * ok_stopwords     — ≥ min_stopword_hits stopword occurrences
    * ok_repetition    — duplicate word-bigram fraction ≤ max ratio
    """
    t = F.col(col)
    words = words_col(t)
    n_tok = token_count(t)
    avg_len = (F.length(t) - n_tok + F.lit(1)) / n_tok

    n_hash = F.size(F.split(t, "#", -1)) - F.lit(1)
    n_ellipsis = F.size(F.split(t, "\\.\\.\\.", -1)) - F.lit(1)
    symbol_ratio = (n_hash + n_ellipsis) / n_tok

    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))

    n_bigrams = F.greatest(n_tok - F.lit(1), F.lit(0))
    bigrams = F.when(n_bigrams < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_bigrams),
            lambda i: F.array_join(F.slice(words, i, 2), " "),
        )
    )
    dup_ratio = F.when(n_bigrams < 1, F.lit(0.0)).otherwise(
        (n_bigrams - F.size(F.array_distinct(bigrams))) / n_bigrams
    )

    out = df.select(
        F.col(id_col),
        (n_tok.between(min_words, max_words)).alias("ok_word_count"),
        ((avg_len >= min_avg_word_len) & (avg_len <= max_avg_word_len)).alias(
            "ok_avg_word_len"
        ),
        (symbol_ratio <= max_symbol_ratio).alias("ok_symbol_ratio"),
        (stop_hits >= min_stopword_hits).alias("ok_stopwords"),
        (dup_ratio <= max_dup_2gram_ratio).alias("ok_repetition"),
    )
    return out.withColumn(
        "keep",
        F.col("ok_word_count")
        & F.col("ok_avg_word_len")
        & F.col("ok_symbol_ratio")
        & F.col("ok_stopwords")
        & F.col("ok_repetition"),
    )


def apply_gopher_filter(df: DataFrame, col: str = "text", id_col: str = "doc_id", **kw) -> DataFrame:
    """Keep only docs passing every rule (flags dropped)."""
    flags = gopher_quality_flags(df, col, id_col, **kw)
    return df.join(flags.where("keep").select(id_col), id_col, "left_semi")


# ---------------------------------------------------------------------------
# corpus-level segment dedup (CCNet-style shared-paragraph removal)
# ---------------------------------------------------------------------------


def dedup_text_segments(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    words_per_segment: int = 8,
    max_dupes: int = 1,
) -> DataFrame:
    """Remove segments duplicated across the CORPUS, keep first
    occurrence; reassemble each document in original order.

    Segments are fixed ``words_per_segment``-word blocks (a corpus with
    newlines would pass lines/paragraphs through the same machinery —
    the segmenter is the only corpus-specific piece). A segment
    occurring more than ``max_dupes`` times corpus-wide is dropped
    everywhere except its first occurrence (ordered by (doc, pos) —
    deterministic keeper).

    Output: (doc_id, clean_text, n_kept, n_total). Docs whose every
    segment was dropped survive with clean_text = ''.

    One shuffle on the segment string (count + keeper rank in a single
    window pass — no self-join), one reassembly aggregate on doc id.
    """
    t = F.col(col)
    words = words_col(t)
    n_seg = F.ceil(F.size(words) / F.lit(float(words_per_segment))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(1), F.greatest(n_seg, F.lit(1))),
        lambda i: F.array_join(
            F.slice(words, (i - F.lit(1)) * words_per_segment + F.lit(1), words_per_segment),
            " ",
        ),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(segs).alias("pos", "seg")
    )
    w_cnt = Window.partitionBy("seg")
    w_rank = Window.partitionBy("seg").orderBy(id_col, "pos")
    marked = exploded.select(
        id_col,
        "pos",
        "seg",
        F.count("*").over(w_cnt).alias("cnt"),
        F.row_number().over(w_rank).alias("rn"),
    )
    kept = marked.where((F.col("cnt") <= max_dupes) | (F.col("rn") == 1))
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col),
        F.greatest(
            F.ceil(F.size(words_col(t)) / F.lit(float(words_per_segment))).cast("int"),
            F.lit(1),
        ).cast("long").alias("n_total"),
    )
    return (
        totals.join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            "n_total",
        )
    )
