"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016 — the merge-learning algorithm behind GPT-2/RoBERTa-family
tokenizers). The reference crawler has no tokenizer tier; this
extends the rebuilt pipeline's token metering (textstats.
bpe_token_count pretokenizes, vocab.py counts whole words) with the
step every training pipeline actually runs: LEARNING the merge table
from the crawled corpus.

Why this is Spark-shaped: after ONE corpus pass the trainer state is
the distinct-pretoken frequency table (word, freq) — bounded by the
corpus's distinct pretokens, not its tokens — and every merge
iteration is one hash aggregate over that table (pair counts, with
map-side partial combine) plus a narrow map (applying the winning
merge). The 1-row top-pair collect per iteration is inherently
driver state, exactly like k-means centroids: the merge RULE is the
model being learned. At 100 TB: corpus pass = the only full scan;
state table ~10^8-10^9 rows distributed; per merge one shuffle whose
key space (symbol pairs) shrinks as training proceeds.

Symbol representation: a word's current segmentation is kept as a
single string ``SEP s1 SEP s2 ... SEP`` (SEP = U+001F, outside every
pretoken alphabet the GPT-2-style pretokenizer can emit). Applying a
merge (a, b) is then two chained literal ``replace`` calls of
``SEP a SEP b SEP`` → ``SEP ab SEP``:

* one replace pass is left-to-right and non-overlapping, which is
  exactly Sennrich's greedy occurrence order (``aaa`` + (a,a) →
  ``aa a``), but a replacement consumes the trailing SEP that the
  NEXT adjacent occurrence needs as its leading SEP (``abab`` would
  merge only the first ``ab``);
* after pass one, every missed occurrence is isolated (two remaining
  occurrences can't be adjacent — the second's leading SEP would
  have been intact, so pass one would have taken it), so a second
  identical pass completes the merge. Two passes ≡ merge-all.

Both passes are plain string ops available verbatim in any SQL
engine, so the whole trainer unrolls into a DuckDB oracle with
bit-identical semantics (see __spark_entry__._bpe_oracle_sql).

Determinism: the winning pair is ordered by (count DESC, left ASC,
right ASC) — counts are exact integers (no float ties), and the
string tiebreak is binary-stable for the ASCII pretoken alphabet.
Training is therefore bit-reproducible at any parallelism.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

from webcrawler_spark.operators.textstats import BPE_PRETOKEN_RE

SEP = "\x1f"

# Plan-size gate for the native merge-replay path: each merge adds two
# chained `replace` expression nodes per pass; past a few hundred the
# expression tree (and its codegen) outgrows any benefit, so encode()
# switches to the Arrow-batched per-distinct-word Python replay.
NATIVE_APPLY_MAX_MERGES = 128


def word_freqs(
    df: DataFrame,
    text_col: str = "text",
    pattern: str = BPE_PRETOKEN_RE,
) -> DataFrame:
    """(word, freq): the corpus's distinct GPT-2-style pretokens with
    occurrence counts — the whole trainer state, built in the single
    corpus pass (explode + one hash aggregate with map-side combine)."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def init_symbols(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Add ``syms``: the character-level segmentation as a SEP-joined
    string (``SEP c1 SEP c2 ... SEP``)."""
    w = F.col(word_col)
    chars = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1))
    )
    return words.withColumn(
        "syms", F.concat(F.lit(SEP), F.array_join(chars, SEP), F.lit(SEP))
    )


def _sym_array(syms: Column) -> Column:
    return F.filter(F.split(syms, SEP), lambda x: x != "")


def pair_counts(symdf: DataFrame, freq_col: str = "freq") -> DataFrame:
    """(left, right, cnt): every adjacent symbol pair, counted with
    occurrence multiplicity × word frequency — Sennrich's get_stats as
    one exploding projection + one hash aggregate."""
    arr = _sym_array(F.col("syms"))
    pairs = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.struct(
                F.element_at(arr, i).alias("left"),
                F.element_at(arr, i + 1).alias("right"),
            ),
        ),
    ).otherwise(F.array())
    return (
        symdf.select(F.col(freq_col).alias("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_expr(syms: Column, left: str, right: str) -> Column:
    pat = F.lit(SEP + left + SEP + right + SEP)
    rep = F.lit(SEP + left + right + SEP)
    return F.replace(F.replace(syms, pat, rep), pat, rep)


def apply_merge(symdf: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one learned merge to every word's segmentation (narrow
    map — no shuffle)."""
    return symdf.withColumn("syms", _merge_expr(F.col("syms"), left, right))


def train_bpe(
    word_freq_df: DataFrame,
    n_merges: int,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` merges; returns (merges, final symdf)
    where merges = [(rank, left, right, cnt)] in learned order.

    Per iteration: one shuffle (the pair-count aggregate), one 1-row
    collect (the winning pair — driver model state by nature), one
    narrow map. The loop state's lineage is localCheckpoint-truncated
    every ``checkpoint_every`` merges (the measured planning-cost
    lesson from operators/graph.py). Early-stops when no adjacent
    pairs remain (every word fully merged)."""
    symdf = init_symbols(word_freq_df).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            pair_counts(symdf)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((rank, left, right, cnt))
        symdf = apply_merge(symdf, left, right)
        if (rank + 1) % checkpoint_every == 0:
            symdf = symdf.localCheckpoint(eager=True)
    return merges, symdf


def merges_df(spark, merges: Sequence[tuple[int, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        list(merges), "rank int, left string, right string, cnt long"
    )


def apply_merges_native(
    words: DataFrame,
    merges: Sequence[tuple[int, str, str, int]],
    word_col: str = "word",
) -> DataFrame:
    """Segment ``word_col`` under a learned merge list by replaying the
    merges in rank order as chained literal replaces — pure codegen,
    right for merge lists up to ~10^2 (tests, probes). Adds ``syms``."""
    out = init_symbols(words, word_col)
    syms = F.col("syms")
    for _, left, right, _ in merges:
        syms = _merge_expr(syms, left, right)
    return out.withColumn("syms", syms)


def apply_merges_pandas(
    words: DataFrame,
    merges: Sequence[tuple[int, str, str, int]],
    word_col: str = "word",
) -> DataFrame:
    """Scale path for production-size merge tables (32k+): the same
    two-pass replace replay per DISTINCT word in an Arrow-batched
    mapInPandas (str.replace is LTR non-overlapping — bit-identical to
    the native path, asserted by tests). Python cost is per distinct
    word; callers re-attach the corpus with a broadcast join."""
    rules = [(m[1], m[2]) for m in merges]
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in words.schema.fields)

    def seg(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            syms = []
            for w in pdf[word_col]:
                s = SEP + SEP.join(w) + SEP
                for left, right in rules:
                    pat = SEP + left + SEP + right + SEP
                    rep = SEP + left + right + SEP
                    s = s.replace(pat, rep).replace(pat, rep)
                syms.append(s)
            out = pdf.copy()
            out["syms"] = syms
            yield out

    return words.mapInPandas(seg, schema=f"{fields}, syms string")


def vocab_from_merges(
    train_words: DataFrame,
    merges: Sequence[tuple[int, str, str, int]],
    word_col: str = "word",
) -> DataFrame:
    """(piece, id): the GPT-2-style vocabulary — the training corpus's
    base characters get ids 0..C-1 in lexicographic order, merge
    product k gets id C+k (vocab ids ARE the merge order, like the
    published GPT-2 vocab files). Duplicate piece strings (a merge
    product colliding with another) keep the MIN id, deterministically.
    The table is characters + merges — kilobytes at any corpus size,
    always broadcastable."""
    w = F.col(word_col)
    chars = sorted(
        r["piece"]
        for r in train_words.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length(w)),
                    lambda i: w.substr(i, F.lit(1)),
                )
            ).alias("piece")
        )
        .distinct()
        .collect()
    )
    # the vocab, like the merge list, is driver model state: alphabet
    # + n_merges rows, kilobytes at any corpus size
    rows = [(c, i) for i, c in enumerate(chars)] + [
        (left + right, len(chars) + rank) for rank, left, right, _ in merges
    ]
    spark = train_words.sparkSession
    return (
        spark.createDataFrame(rows, "piece string, id int")
        .groupBy("piece")
        .agg(F.min("id").cast("int").alias("id"))
    )


def encode_ids(
    df: DataFrame,
    merges: Sequence[tuple[int, str, str, int]],
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = BPE_PRETOKEN_RE,
    unk_id: int = -1,
) -> DataFrame:
    """(id, ids array<int>): the corpus as training-ready token-id
    sequences — the text→subword→id last mile feeding packing.
    Pieces absent from the vocabulary (held-out characters the trainer
    never saw) map to ``unk_id``. One corpus shuffle (the per-doc
    reassembly); the vocab join is a broadcast."""
    toks = encode(df, merges, text_col=text_col, id_col=id_col, pattern=pattern)
    return (
        toks.select(id_col, F.posexplode("tokens").alias("pos", "piece"))
        .join(F.broadcast(vocab), "piece", "left")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "id")))
            .id.alias("_ids")
        )
        .select(
            id_col,
            F.transform(
                F.col("_ids"),
                lambda x: F.coalesce(x, F.lit(unk_id)).cast("int"),
            ).alias("ids"),
        )
    )


def encode(
    df: DataFrame,
    merges: Sequence[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = BPE_PRETOKEN_RE,
) -> DataFrame:
    """(id, tokens array<string>) — the corpus tokenized under the
    learned merges. Segmentation runs once per DISTINCT pretoken (the
    word table is tiny next to the corpus) and rejoins the exploded
    corpus via a broadcast of that word→segments map, so the corpus
    itself shuffles only for the per-doc reassembly aggregate."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
        ).alias("pos", "word"),
    )
    words = toks.select("word").distinct()
    seg = (
        apply_merges_native(words, merges)
        if len(merges) <= NATIVE_APPLY_MAX_MERGES
        else apply_merges_pandas(words, merges)
    )
    seg = seg.select("word", _sym_array(F.col("syms")).alias("pieces"))
    return (
        toks.join(F.broadcast(seg), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "pieces"))
                ).pieces
            ).alias("tokens")
        )
    )
