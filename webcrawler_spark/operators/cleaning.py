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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from webcrawler_spark.operators.textstats import (
    STOPWORDS,
    sliding_ngrams,
    token_count,
    words_col,
)


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
    # linear sliding construction — the slice-per-gram form is O(len²)
    # per doc (round-4 scale-stress finding; same fix as word_shingles)
    bigrams = sliding_ngrams(words, 2)
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


# ---------------------------------------------------------------------------
# intra-document repetition stats (Gopher §A1.1 repetition signals)
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 3,
) -> DataFrame:
    """Per-document repetition signals (Rae et al. 2021 §A1.1): the
    top-word frequency fraction and the duplicate word-n-gram
    fraction. Machine-generated / spammy pages score high on both;
    pipelines threshold these next to the Gopher gate.

    Per-doc metrics need NO cross-document data, so this is a pure
    projection — zero shuffles, whole-stage codegen, pushdown-friendly
    (reads only ``id_col`` and ``col``). The top-word count uses the
    sorted-array run-length trick (O(n log n) per doc, not the naive
    O(n·distinct) count-each-word scan):

        sorted = array_sort(words)
        starts = indices i where sorted[i] != sorted[i-1]
        run lengths = successive-start deltas; top count = max run

    Output: (id, n_words, top_word_cnt, top_word_frac, dup_ngram_frac)
    where dup_ngram_frac = (total n-grams − distinct) / total.
    """
    t = F.col(col)
    words = words_col(t)
    n_words = F.size(words)

    srt = F.array_sort(words)
    # i is 0-based; element_at is 1-based, so element_at(srt, i) is the
    # PREVIOUS element. The i == 0 case must short-circuit through CASE
    # (not `|`) or ANSI mode faults on array index 0.
    starts = F.filter(
        F.transform(
            srt,
            lambda x, i: F.when(i == 0, i).otherwise(
                F.when(F.element_at(srt, i) != x, i).otherwise(F.lit(-1))
            ),
        ),
        lambda v: v >= 0,
    )
    ends = F.concat(
        F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
        F.array(n_words),
    )
    top_cnt = F.array_max(F.zip_with(ends, starts, lambda e, s: e - s))

    n_g = F.greatest(n_words - F.lit(ngram_n - 1), F.lit(0))
    grams = sliding_ngrams(words, ngram_n)  # linear; see word_shingles
    dup_frac = F.when(n_g < 1, F.lit(0.0)).otherwise(
        (n_g - F.size(F.array_distinct(grams))).cast("double") / n_g
    )

    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        top_cnt.cast("long").alias("top_word_cnt"),
        (top_cnt.cast("double") / n_words).alias("top_word_frac"),
        dup_frac.alias(f"dup_{ngram_n}gram_frac"),
    )


def ngram_repetition_stats(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """The remaining two Gopher §A1.1 repetition families (Rae et al.
    2021): the char fraction of the single MOST FREQUENT ``top_n``-gram
    (count x gram length / total word chars; tie → lexicographically
    smallest gram, which the sorted-run scan yields for free), and the
    char fraction COVERED by duplicated ``dup_n``-grams — positions
    inside any occurrence of any gram appearing ≥2 times count once,
    however many overlapping duplicate grams touch them (the
    double-counting trap the paper's wording implies; coverage is an
    interval union over word positions, not a sum over grams).

    All-integer position/char arithmetic; the two fractions are the
    only divisions (same IEEE op both engines). Pure codegen array
    projection — zero shuffles; per-doc cost O(words · dup_n), bounded
    by the document.

    Output: (id, n_words, top_gram, top_gram_cnt, top_gram_char_frac,
    dup_gram_char_frac).
    """
    words = F.filter(F.split(F.col(col), " "), lambda w: w != "")
    n_words = F.size(words)
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )

    def grams_of(n: int):
        return sliding_ngrams(words, n)  # linear; see word_shingles

    # --- top_n: most frequent gram via sorted runs ---------------------
    g_top = grams_of(top_n)
    srt = F.array_sort(g_top)
    starts = F.filter(
        F.transform(
            srt,
            lambda x, i: F.when(i == 0, i).otherwise(
                F.when(F.element_at(srt, i) != x, i).otherwise(F.lit(-1))
            ),
        ),
        lambda v: v >= 0,
    )
    ends = F.concat(
        F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
        F.array(F.size(srt)),
    )
    runs = F.zip_with(starts, ends, lambda s, e: F.struct(
        (e - s).alias("cnt"), s.alias("at")))
    best = F.aggregate(
        runs,
        F.struct(F.lit(0).alias("cnt"), F.lit(-1).alias("at")),
        lambda acc, r: F.when(r["cnt"] > acc["cnt"], r).otherwise(acc),
    )
    top_gram = F.when(
        best["at"] >= 0, F.element_at(srt, best["at"] + 1)
    ).otherwise(F.lit(""))
    top_cnt = best["cnt"]
    top_frac = F.when(total_chars <= 0, F.lit(0.0)).otherwise(
        (top_cnt * F.length(top_gram)).cast("double") / total_chars
    )

    # --- dup_n: char coverage of duplicated grams ----------------------
    g_dup = grams_of(dup_n)
    sd = F.array_sort(g_dup)
    dup_set = F.array_distinct(
        F.filter(
            F.transform(
                sd,
                lambda x, i: F.when(i == 0, F.lit(None).cast("string")).otherwise(
                    F.when(F.element_at(sd, i) == x, x).otherwise(
                        F.lit(None).cast("string")
                    )
                ),
            ),
            lambda v: v.isNotNull(),
        )
    )
    hit_positions = F.array_distinct(
        F.flatten(
            F.filter(
                F.transform(
                    g_dup,
                    lambda g, i: F.when(
                        F.array_contains(dup_set, g),
                        F.sequence(i + 1, i + dup_n),
                    ).otherwise(F.array().cast("array<int>")),
                ),
                lambda a: F.size(a) > 0,
            )
        )
    )
    covered_chars = F.aggregate(
        hit_positions,
        F.lit(0).cast("long"),
        lambda a, p: a + F.length(F.element_at(words, p)),
    )
    dup_frac = F.when(total_chars <= 0, F.lit(0.0)).otherwise(
        covered_chars.cast("double") / total_chars
    )

    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        top_gram.alias("top_gram"),
        top_cnt.cast("long").alias("top_gram_cnt"),
        top_frac.alias("top_gram_char_frac"),
        dup_frac.alias("dup_gram_char_frac"),
    )


def line_repetition_stats(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """The segment-granularity half of Gopher's §A1.1 repetition
    signals (Rae et al. 2021): duplicate-LINE fraction and the
    fraction of characters sitting in repeated lines — the pair of
    rules that catches boilerplate headers/footers and templated spam
    that word-level stats miss. ``sep='\\n\\n'`` gives the paragraph
    variant of the same rules.

    * ``dup_line_frac``  = (n_lines − n_distinct) / n_lines — the
      fraction of line OCCURRENCES beyond each line's first.
    * ``dup_char_frac``  = Σ over distinct lines of
      (occurrences − 1)·len(line), divided by total line characters —
      the char mass those repeats contribute (repeated-first-occurrence
      chars are NOT counted, pinning the "beyond first" convention the
      fraction above uses).

    Pure projection over array lambdas — zero shuffles, codegen, reads
    only (``id_col``, ``col``). The per-doc occurrence count is
    O(lines²) in the worst case, bounded by lines-per-document —
    never by the corpus.
    """
    lines = F.split(F.col(col), sep)
    n_lines = F.size(lines)
    dist = F.array_distinct(lines)
    n_dist = F.size(dist)
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, l: acc + F.length(l)
    )
    dup_chars = F.aggregate(
        dist,
        F.lit(0).cast("long"),
        lambda acc, d: acc
        + (F.size(F.filter(lines, lambda l: l == d)) - 1).cast("long")
        * F.length(d),
    )
    return df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        n_dist.cast("long").alias("n_distinct"),
        ((n_lines - n_dist).cast("double") / n_lines).alias("dup_line_frac"),
        F.when(total_chars <= 0, F.lit(0.0))
        .otherwise(dup_chars.cast("double") / total_chars)
        .alias("dup_char_frac"),
    )


# ---------------------------------------------------------------------------
# train-test contamination check (n-gram collision decontamination,
# the GPT-3 appendix-C / Lee et al. 2022 procedure)
# ---------------------------------------------------------------------------


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-doc count of distinct lowercased word ``n``-grams shared
    with a benchmark/eval corpus — the standard decontamination pass a
    training pipeline runs before a corpus ships (flag or strip train
    docs that leak eval data).

    Scale shape: the benchmark side collapses to its DISTINCT gram set
    (eval suites are ~MBs, so it broadcasts — ``broadcast_bench=False``
    falls back to a shuffle semi-join for giant holdouts); the corpus
    side explodes per-doc **deduplicated** grams (bounded by doc
    length) into a left-semi join + one hash aggregate on ``id_col``.
    No cross product anywhere; corpus text is read once.

    ``hashed=True`` replaces gram strings with ``xxhash64`` before the
    join — the production tier at 100 TB (8-byte keys instead of ~100-
    byte strings through the shuffle); the string tier is the
    oracle-shareable one (pytest pins tier parity, collisions at
    10^12 grams are ~1e-7 per Birthday bound).
    """

    def gram_table(df: DataFrame, out_id: str) -> DataFrame:
        return _contamination_gram_table(df, out_id, n, text_col, id_col, hashed)

    bench_grams = gram_table(benchmark, "_bid").select("gram").distinct()
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    hits = (
        gram_table(docs, id_col)
        .join(bench_grams, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
        .withColumn("contaminated", F.col("n_contaminated") > 0)
    )


def _contamination_gram_table(
    df: DataFrame,
    out_id: str,
    n: int,
    text_col: str,
    id_col: str,
    hashed: bool,
) -> DataFrame:
    """(id, gram) rows: each document's DISTINCT lowercased word
    n-grams, exploded. Shared by the contamination family so the flag,
    attribution, and removal passes agree on gram semantics."""
    words = words_col(F.lower(F.col(text_col)))
    grams = sliding_ngrams(words, n)  # linear; see word_shingles
    g = df.select(
        F.col(id_col).alias(out_id),
        F.explode(F.array_distinct(grams)).alias("gram"),
    )
    if hashed:
        g = g.withColumn("gram", F.xxhash64("gram"))
    return g


def contamination_matches(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    hashed: bool = False,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-(document, benchmark-example) attribution: (doc_id,
    bench_id, shared_grams) for every corpus document sharing ≥ 1
    exact n-gram with a specific benchmark example.

    ``ngram_contamination`` answers "how contaminated is this doc";
    this answers "*which* eval example leaked into it" — what a
    pipeline needs to report per-benchmark leak rates or split a doc
    around the leaked span. ``shared_grams`` counts distinct shared
    grams (both sides gram-deduplicated), so it is symmetric and
    insensitive to in-document repetition.

    Scale shape: identical to ``ngram_contamination`` except the
    benchmark side keeps (bench_id, gram) pairs instead of collapsing
    to the gram set — still benchmark-sized, still broadcast; the
    corpus side explodes once and aggregates on (doc, bench). Zero
    corpus shuffles with ``broadcast_bench=True``.
    """
    bg = _contamination_gram_table(
        benchmark, bench_id_col, n, text_col, id_col, hashed
    )
    if broadcast_bench:
        bg = F.broadcast(bg)
    cg = _contamination_gram_table(docs, id_col, n, text_col, id_col, hashed)
    return (
        cg.join(bg, "gram")
        .groupBy(id_col, bench_id_col)
        .agg(F.count("*").alias("shared_grams"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
    broadcast_bench: bool = True,
) -> DataFrame:
    """The corpus minus every contaminated document — GPT-3's
    document-level removal (Brown et al. 2020, Appendix C dropped docs
    overlapping eval data by a 13-gram; PaLM §6 likewise).

    Plan: corpus grams left-semi-join the (broadcast) benchmark gram
    set → distinct flagged ids (tiny: at most the contaminated-doc
    count) → broadcast left-anti join back against the corpus. The
    corpus is scanned twice (gram pass + anti join) but never
    shuffled; at 100 TB the second scan prunes to (id_col) only.
    """
    bench_grams = (
        _contamination_gram_table(benchmark, "_bid", n, text_col, id_col, hashed)
        .select("gram")
        .distinct()
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    flagged = (
        _contamination_gram_table(docs, id_col, n, text_col, id_col, hashed)
        .join(bench_grams, "gram", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(F.broadcast(flagged), id_col, "left_anti")


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


# ---------------------------------------------------------------------------
# PII redaction (the pre-training scrub pass: emails, phone numbers,
# IPv4 addresses — the categories public pipelines redact by regex,
# e.g. the BigScience ROOTS / Dolma scrub steps)
# ---------------------------------------------------------------------------

# Patterns are kept to the regex subset Java's engine and RE2-style
# engines (DuckDB) interpret identically: no backrefs, no lookaround,
# character classes + bounded repetition only. Order matters: emails
# are redacted before phone numbers so digit runs inside an address
# never half-match.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}([ -]?\d{2,4}){2,3}\b", "<PHONE>"),
]


def redact_pii(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, redacted_text, n_email, n_ipv4, n_phone) — regex scrub with
    per-category hit counts for the dataset-card audit trail.

    Pure whole-stage-codegen projection: zero shuffles, only ``col`` and
    ``id_col`` read (column pruning reaches the scan). At 100 TB this is
    a map-only pass that pipelines into whatever sink follows; the
    per-category counts aggregate downstream like any other column.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(col), F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red = F.col(col)
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return df.select(F.col(id_col), red.alias("redacted_text"), *counts)


# ---------------------------------------------------------------------------
# C4-style line-level cleaning (Raffel et al. 2020, §2.2 — the public
# "colossal clean crawled corpus" heuristics, line tier)
# ---------------------------------------------------------------------------

C4_TERMINALS = (".", "!", "?", '"')


def c4_line_filter(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_kept_lines: int = 1,
    line_ban: tuple[str, ...] = ("javascript",),
    doc_ban: tuple[str, ...] = ("lorem ipsum", "{"),
) -> DataFrame:
    """C4's line-level cleaning pass (Raffel et al. 2020 §2.2): keep a
    line only if it ends in a terminal punctuation mark, has at least
    ``min_words`` words, and mentions none of ``line_ban``; drop the
    whole document if it contains any ``doc_ban`` phrase (C4 uses
    "lorem ipsum" and the code-smell brace) or if fewer than
    ``min_kept_lines`` lines survive.

    Output: (id, clean_text, n_lines, n_kept, keep) — keep is the
    doc-level verdict; clean_text joins the surviving lines with
    newlines so downstream tiers (Gopher doc gate, CCNet segment
    dedup) compose on the cleaned column.

    This is the third cleaning tier alongside ``gopher_quality_flags``
    (doc-level stats gate) and ``dedup_text_segments`` (corpus-level
    segment dedup): C4 works *within* the document at line granularity.

    Scale notes (100 TB): pure whole-stage-codegen projection over
    higher-order array functions — zero shuffles, zero Python; only
    ``col``/``id_col`` are read so column pruning reaches the scan.
    Reference parity note: the reference crawler has no cleaning pass
    (it stops at visible-text extraction, Parser.py:52-72); this tier
    is the training-pipeline extension the rebuild adds on top.
    """
    lines = F.split(F.col(col), "\n")

    def line_ok(l: Column) -> Column:
        ok = l.substr(-1, 1).isin(*C4_TERMINALS)
        ok = ok & (F.size(F.split(l, " ")) >= F.lit(min_words))
        low = F.lower(l)
        for b in line_ban:
            ok = ok & ~low.contains(b.lower())
        return ok

    kept = F.filter(lines, line_ok)
    low_doc = F.lower(F.col(col))
    banned = F.lit(False)
    for b in doc_ban:
        banned = banned | low_doc.contains(b.lower())
    n_kept = F.size(kept)
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        (~banned & (n_kept >= F.lit(min_kept_lines))).alias("keep"),
    )
