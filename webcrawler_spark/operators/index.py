"""Sharded positional inverted index + phrase search.

The search-side structure a crawled corpus feeds (Zobel & Moffat 2006,
"Inverted files for text search engines"): term → posting list of
(doc, positions). Built here the way a 1000-executor cluster has to
build it:

* **Postings shard by (term, doc-hash)** — ``n_shards`` sub-lists per
  term — so a stopword-grade hot term ("the": ~every doc) becomes
  ``n_shards`` bounded rows instead of one giant ``collect_list`` key.
  This is the index-build instance of the salted-join pattern
  (operators/skew.py): the shuffle key carries the salt, and no
  single reducer ever materializes a full hot-term posting list.
* Per-posting state is (doc_id, sorted position array) — bounded by
  the document, never the corpus.
* **Phrase search never touches the corpus**: it reads only the
  phrase words' posting shards (partition-prunable when the index is
  written partitioned by term), joins them on doc_id — an equi-join
  whose sides are one posting row per (doc, word) — and verifies
  adjacency with an array intersect in codegen
  (``arrays_overlap(transform(p1, x -> x + 1), p2)`` chained across
  the phrase). Document text is never re-read or re-tokenized.

The driver-contract oracle for this operator is NOT a replay: DuckDB
answers the same phrase query by direct word-boundary substring scan
over the corpus (a different algorithm entirely), so agreement checks
the index round-trip end to end — build, shard, join, adjacency.

Reference parity: no analog (the reference stops at link extraction,
Parser.py); this is the training/search-side extension tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INDEX_SHARDS = 16


def build_inverted_index(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = INDEX_SHARDS,
) -> DataFrame:
    """(term, shard, doc_id, positions) — one row per (term, doc);
    ``positions`` is the sorted 0-based word offsets of ``term`` in
    the doc. One posexplode + one hash aggregate on (term, doc); the
    ``shard`` column is xxhash64(doc)-derived so downstream per-term
    work (top-k, merges) fans out over ``n_shards`` keys per term.
    """
    words = F.filter(F.split(F.col(col), " "), lambda w: w != "")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words).alias("pos", "term"),
    )
    return (
        toks.groupBy("term", "doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
        .select(
            "term",
            F.pmod(F.xxhash64(F.lit("ix"), F.col("doc_id")), F.lit(n_shards))
            .cast("int")
            .alias("shard"),
            "doc_id",
            "positions",
        )
    )


def _advance(prev_pos: Column, cur_pos: Column) -> Column:
    """Positions in ``cur_pos`` that directly follow a position in
    ``prev_pos`` (phrase adjacency step), as a sorted array."""
    return F.filter(
        cur_pos, lambda p: F.array_contains(F.transform(prev_pos, lambda x: x + 1), p)
    )


def phrase_search(
    index: DataFrame, phrase: str, id_out: str = "doc_id"
) -> DataFrame:
    """Documents containing ``phrase`` as consecutive words, with the
    match count: (doc_id, n_matches).

    Plan: one posting-row equi-join per phrase word (each side
    pre-filtered to ONE term — partition-prunable), adjacency kept as
    a shrinking position array in codegen. No corpus access.
    """
    terms = [w for w in phrase.split(" ") if w]
    if not terms:
        raise ValueError("empty phrase")
    cur = (
        index.where(F.col("term") == terms[0])
        .select("doc_id", F.col("positions").alias("p"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = index.where(F.col("term") == t).select(
            "doc_id", F.col("positions").alias(f"p{i}")
        )
        cur = (
            cur.join(nxt, "doc_id")
            .select("doc_id", _advance(F.col("p"), F.col(f"p{i}")).alias("p"))
            .where(F.size("p") > 0)
        )
    return cur.select(
        F.col("doc_id").alias(id_out), F.size("p").cast("long").alias("n_matches")
    )


def term_doc_freqs(index: DataFrame) -> DataFrame:
    """Per-term document frequency and total occurrences off the
    index alone — the df/cf statistics a query planner ranks with.
    Shard-partial aggregation: the per-(term, shard) partials are
    bounded, and the final per-term rollup moves ``n_shards`` rows per
    term."""
    per_shard = index.groupBy("term", "shard").agg(
        F.count(F.lit(1)).alias("df_part"),
        F.sum(F.size("positions")).alias("cf_part"),
    )
    return per_shard.groupBy("term").agg(
        F.sum("df_part").cast("long").alias("doc_freq"),
        F.sum("cf_part").cast("long").alias("coll_freq"),
    )
