"""Text-analysis operators for training-data pipelines.

Beyond the reference's crawl surface, a 100 TB web-text pipeline needs
per-document quality/statistics passes. Everything here is pure native
Catalyst expression (whole-stage codegen, no Python), deliberately
written so an ANSI-SQL oracle (DuckDB) can reproduce every value
bit-for-bit — these operators are correctness-gated via
``__spark_entry__.oracle_sql``.

Operators (each df→df, composable):

* token_count        — whitespace tokens (P10-adjacent)
* text_stats         — chars, tokens, avg word length, stopword ratio
* quality_score      — deterministic [0,1] score from the stats
* lang_id            — marker-word n-gram heuristic language guess
* fingerprint        — normalized-text md5 (doc identity for dedup)
* first_n_words      — P10 as a reusable projection
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword list (shared verbatim with the oracle SQL)
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]

# marker words per language for the heuristic id — chosen to be
# reproducible in plain SQL (no model, no external data)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "de", "que"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
}


def words_col(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count (single-space-normalized corpora)."""
    return F.size(words_col(text))


def stopword_count(text: Column) -> Column:
    return F.size(F.filter(words_col(text), lambda w: w.isin(STOPWORDS)))


def with_text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """chars / tokens / avg_word_len / stopword_ratio projections."""
    t = F.col(col)
    n_tok = token_count(t)
    return (
        df.withColumn("n_chars_calc", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "avg_word_len",
            # tokens are single-space separated: total word chars =
            # length - (n_tokens - 1) separators
            (F.length(t) - n_tok + F.lit(1)) / n_tok,
        )
        .withColumn("stopword_ratio", stopword_count(t) / n_tok)
    )


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword
    presence. Integer/decimal arithmetic only → oracle-exact."""
    n_tok = token_count(text)
    length_component = F.least(n_tok, F.lit(40)) / F.lit(40.0)
    stop_component = F.least(
        stopword_count(text) * F.lit(4), n_tok
    ) / F.greatest(n_tok, F.lit(1))
    return F.round(length_component * 0.6 + stop_component * 0.4, 6)


def lang_id(text: Column) -> Column:
    """Marker-word language guess; ties broken by fixed language order.

    A real pipeline would plug a fastText-style model behind the same
    column contract; the heuristic keeps the operator oracle-checkable.
    """
    w = words_col(text)
    scores = {
        lang: F.size(F.filter(w, lambda x: x.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0)
    # fixed iteration order en→es→fr→de; strict > keeps first-wins ties
    for lang in ["en", "es", "fr", "de"]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized,
    lower-cased text — the exact-dedup key."""
    return F.md5(F.regexp_replace(F.lower(text), "\\s+", " "))


def first_n_words(text: Column, n: int = 20) -> Column:
    """P10 (Parser.py:48-55) as a reusable native projection."""
    return F.array_join(F.slice(F.split(text, "\\s+"), 1, n), " ")
