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
* bpe_token_count    — subword-pretokenizer token metering
* tfidf_top_terms    — per-doc top-k tf-idf terms (corpus statistics)
* winnow_fingerprints— local-similarity fingerprints (SIGMOD'03)
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


def sliding_ngrams(words: Column, n: int, sep: str = " ") -> Column:
    """Positional n-grams over any token array (``sep``-joined; " "
    for word grams, "" for char grams), length size(words)-n+1, in
    O(size · n) per row.

    The naive ``transform(sequence(1, cnt), i -> array_join(slice(
    words, i, n)))`` is O(size²): Catalyst's Slice copies per element,
    so every gram pays a fresh array copy — invisible on the 60-word
    sf docs, measured PATHOLOGICAL on 4k-word crawl pages (round-4
    scale-stress: gopher/minhash stages went from minutes to >25 min
    at 126k such docs). This builds n-1 shifted views (each ONE O(size)
    slice) and zips them: ``zip_with`` pads the shorter side with null
    and ``concat_ws`` skips nulls, so the ragged tail is trimmed by a
    single final slice. Output SEQUENCE is byte-identical to the naive
    form (same grams, same order — array_distinct keeps first
    occurrence, so distinct callers are unaffected too); short/empty
    input yields []."""
    count = F.size(words) - F.lit(n - 1)
    g = words
    for k in range(1, n):
        shifted = F.slice(
            words, k + 1, F.greatest(F.size(words) - k, F.lit(0))
        )
        g = F.zip_with(g, shifted, lambda a, b: F.concat_ws(sep, a, b))
    return F.when(count < 1, F.array().cast("array<string>")).otherwise(
        F.slice(g, 1, count)
    )


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


# BPE-style pretokenizer (the GPT-2 pattern's RE2/Java-portable subset:
# contractions, space-prefixed letter runs, digit runs, punctuation
# runs; no lookahead so Catalyst and any SQL oracle agree exactly)
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """Subword-tokenizer-grade token count: how many pretokens a
    BPE-family tokenizer would see. Native regexp (codegen); the usual
    ~N-subwords-per-pretoken scaling turns this into the token budget a
    training pipeline actually meters."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), 0))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by tf-idf: (doc_id, term, tfidf, rank).

    tf = term count / doc token count; idf = ln(N / docs-containing);
    ties broken by term ascending (deterministic). Plan shape at scale:
    one explode + two hash aggregates (term stats shuffle on term, doc
    stats on doc id), a broadcast-size doc-count, then a per-doc window
    rank — no self-joins, nothing global. tfidf is rounded to 6
    decimals; the last-ulp difference between the JVM's and a SQL
    oracle's ln() is ~1e-16 relative, far below the rounding quantum.
    """
    from pyspark.sql.window import Window

    words = df.select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("term")
    )
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("cnt"))
    doc_len = words.groupBy(id_col).agg(F.count("*").alias("len"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(doc_len, id_col)
        .join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            F.round(
                (F.col("cnt") / F.col("len"))
                * F.log(F.col("n") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )


def winnow_fingerprints(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): hash every k-char gram (rolling over the document),
    keep the minimum of each w-length window, emit the distinct
    selected hashes as (id, fp) rows.

    Guarantees (from the paper): any shared substring of length
    ≥ k + w - 1 between two documents yields at least one shared
    fingerprint — the local-similarity dual to MinHash's global
    Jaccard. Everything is a native array expression on one row (no
    shuffle until the final explode); the md5-prefix gram hash is
    reproducible in any SQL oracle.

    Linearity (round-5 scale fix): the obvious per-position lambdas
    are quadratic twice over — ``t.substr(i, k)`` SCANS to char i on
    UTF-8, and a lambda that references the un-bound gram expression
    re-evaluates it per element. Chars are split once, grams built by
    the shared linear sliding_ngrams pass, and the gram-hash array is
    BOUND AS A COLUMN between selects so the window-min lambda sees an
    attribute (O(w) slice per window), not a recomputed expression."""
    grams_txt = sliding_ngrams(F.split(F.col(col), ""), k, sep="")
    bound = df.select(
        F.col(id_col),
        F.transform(
            grams_txt,
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast(
                "long"
            ),
        ).alias("_grams"),
    )
    grams = F.col("_grams")
    n_wins = F.size(grams) - w + 1
    fps = F.when(
        n_wins >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_wins),
                lambda j: F.array_min(F.slice(grams, j, w)),
            )
        ),
    ).otherwise(  # short doc (< k+w-1 chars): one window = min of all
        F.filter(F.array(F.array_min(grams)), lambda x: x.isNotNull())
    )
    return bound.select(F.col(id_col), F.explode(fps).alias("fp"))


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean unigram log-probability: (doc_id, n_tokens,
    avg_logp) — the unigram tier of CCNet's LM quality bucketing
    (Wenzek et al. 2020: documents scored by an LM trained on a clean
    corpus; here the corpus itself supplies the unigram model, which is
    what the head/middle/tail split degenerates to without KenLM).

    avg_logp = mean over doc tokens of log10(count(w) / total_tokens).
    Lower (more negative) = rarer vocabulary. Plan shape at scale: one
    explode, one hash aggregate on term (the model — vocabulary-sized,
    so broadcast), a 1-row total, then a per-doc hash aggregate — no
    window, no self-join. The float is rounded to 6 decimals; the
    sum-order noise of an avg over one document's tokens is ~1e-15
    relative, far below the quantum.
    """
    words = df.select(
        F.col(id_col), F.explode(words_col(F.col(text_col))).alias("term")
    )
    # CCNet proper trains the LM on a separate clean corpus; pass
    # ``model_docs`` to score ``df`` under that corpus's unigram model
    # (tokens absent from the model vocabulary are skipped — the inner
    # join below — mirroring an OOV-dropping scorer). Default: the
    # corpus scores itself, the degenerate single-corpus tier.
    mwords = (
        words
        if model_docs is None
        else model_docs.select(
            F.explode(words_col(F.col(text_col))).alias("term")
        )
    )
    model = mwords.groupBy("term").agg(F.count("*").alias("cnt"))
    total = model.select(F.sum("cnt").alias("total"))
    return (
        words.join(F.broadcast(model), "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log10(F.col("cnt") / F.col("total"))), 6
            ).alias("avg_logp"),
        )
    )
