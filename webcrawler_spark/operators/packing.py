"""Training-sequence packing: map a document corpus onto fixed-length
token sequences.

The last mile of a pretraining-data pipeline is turning documents of
wildly varying length into fixed-``seq_len`` training rows. Two
standard constructions, both implemented scale-first:

1. **Concat-then-chunk** (`pack_concat_chunks`) — the GPT-style
   packing: documents are concatenated in a deterministic global
   order and the stream is cut every ``seq_len`` tokens; documents
   may straddle sequence boundaries. The only global state is each
   document's *starting token offset* — an exclusive prefix sum of
   token counts in corpus order. The naive plan is an un-partitioned
   ``Window.orderBy``, the canonical single-task scale bug; here the
   offset comes from the engine's distributed prefix-sum
   (operators/prefix.py: range partition → partition-local cumsum →
   O(P) driver offsets), so a 10^10-document corpus packs with no
   single-task stage. Zero waste by construction (every sequence
   except the last is exactly full).

2. **Shard-local greedy packing** (`pack_greedy`) — the
   boundary-respecting variant (T5/"noam" style): a document never
   straddles sequences; a sequence is closed when the next document
   does not fit. Greedy packing is inherently sequential, so at
   scale it runs *per shard*: documents are routed to
   ``n_shards`` deterministic shards (``pmod(xxhash64(id),
   n_shards)``) and each shard packs its own documents in order
   inside one ``applyInPandas`` group — no cross-shard coordination,
   shard count scales with the cluster, and the result is
   bit-stable under any parallelism because shard assignment and
   intra-shard order are pure functions of the data. Documents
   longer than ``seq_len`` are truncated (flagged), matching common
   practice. The per-shard waste (< seq_len tokens per closed
   sequence) is reported by ``packing_stats``.

Reference parity: the reference crawler stops at extracted text
(Parser.py); packing is part of the "beyond the reference"
training-data tier. Both variants are deterministic cross-engine and
oracle-checked against DuckDB (window cumsum for #1, a recursive CTE
replaying the greedy recurrence for #2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from webcrawler_spark.operators.prefix import attach_prefix_count


def token_count_col(text_col: str = "text") -> Column:
    """Whitespace token count, identical in Spark and DuckDB
    (``regexp_extract_all(text, '\\S+')`` length in both)."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0))


def pack_concat_chunks(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Concat-then-chunk packing: per document, its token span in the
    concatenated stream and the training sequences it lands in.

    Output columns: ``id_col``, ``n_tokens``, ``tok_start`` (global
    exclusive offset), ``seq_first`` / ``seq_last`` (sequence ids the
    document touches), ``offset_in_seq`` (position within
    ``seq_first``), ``n_seqs`` (sequences spanned). Empty documents
    (0 tokens) are dropped — they occupy no span.
    """
    nonempty = docs.filter(F.col(token_col) > 0)
    tagged = attach_prefix_count(nonempty, [id_col], token_col, "tok_start")
    out = (
        tagged.withColumn("seq_first", (F.col("tok_start") / seq_len).cast("long"))
        .withColumn(
            "seq_last",
            ((F.col("tok_start") + F.col(token_col) - 1) / seq_len).cast("long"),
        )
        .withColumn("offset_in_seq", F.col("tok_start") % seq_len)
        .withColumn("n_seqs", F.col("seq_last") - F.col("seq_first") + 1)
        .select(
            id_col, token_col, "tok_start", "seq_first", "seq_last",
            "offset_in_seq", "n_seqs",
        )
    )
    # iterative callers can free() the pinned prefix checkpoint once
    # the result is materialized (same contract as attach_prefix_count)
    out._prefix_ckpt = tagged._prefix_ckpt  # type: ignore[attr-defined]
    return out


_GREEDY_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("doc_id", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("seq_in_shard", LongType(), False),
        StructField("offset_in_seq", LongType(), False),
        StructField("truncated", IntegerType(), False),
    ]
)


def pack_greedy(
    docs: DataFrame,
    seq_len: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    shard_expr: Column | None = None,
) -> DataFrame:
    """Boundary-respecting greedy packing, sharded.

    Each document goes to shard ``pmod(xxhash64(id), n_shards)``;
    within a shard, documents are visited in ``id_col`` order and
    appended to the current sequence, which closes when the next
    document does not fit. Documents with ``n_tokens > seq_len`` are
    truncated to ``seq_len`` (``truncated = 1``) and always occupy a
    fresh sequence. Output: one row per document with its shard,
    sequence number *within the shard*, offset inside that sequence,
    and the truncation flag. The global sequence id at write time is
    ``(shard, seq_in_shard)`` — no cross-shard state exists, so the
    operator scales with ``n_shards`` and is deterministic at any
    parallelism.

    ``shard_expr`` overrides the default ``pmod(xxhash64(id),
    n_shards)`` routing (e.g. an md5-derived shard when the result
    must be replayable by an engine without xxhash64).
    """

    cols = [
        "shard", "doc_id", "n_tokens", "seq_in_shard",
        "offset_in_seq", "truncated",
    ]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return _empty()
        pdf = pdf.sort_values(id_col, kind="mergesort")
        shard = int(pdf["_shard"].iloc[0])
        rows = []
        seq, used = 0, 0
        for did, nt in zip(pdf[id_col].to_numpy(), pdf["_nt"].to_numpy()):
            nt = int(nt)
            if nt <= 0:
                continue
            eff = min(nt, seq_len)
            trunc = 1 if nt > seq_len else 0
            if used > 0 and used + eff > seq_len:
                seq += 1
                used = 0
            rows.append((shard, int(did), nt, seq, used, trunc))
            used += eff
            if used >= seq_len:
                seq += 1
                used = 0
        if not rows:
            return _empty()
        return pd.DataFrame(rows, columns=cols)

    if shard_expr is None:
        shard_expr = F.pmod(
            F.xxhash64(F.col(id_col).cast("long")), F.lit(n_shards)
        )
    sharded = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(token_col).cast("long").alias("_nt"),
        shard_expr.cast("int").alias("_shard"),
    )
    return (
        sharded.groupBy("_shard")
        .applyInPandas(_pack, schema=_GREEDY_SCHEMA)
        .withColumnRenamed("doc_id", id_col)
        .withColumnRenamed("n_tokens", token_col)
    )


def packing_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Shard-level packing report for `pack_greedy` output: sequences
    used, tokens kept, waste fraction. One hash aggregate."""
    per_seq_capacity = F.lit(seq_len)
    return (
        packed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            (F.max("seq_in_shard") + 1).alias("n_seqs"),
            F.sum(F.least(F.col("n_tokens"), per_seq_capacity)).alias(
                "tokens_packed"
            ),
            F.sum("truncated").alias("n_truncated"),
        )
        .withColumn(
            "waste_frac",
            F.round(
                1.0
                - F.col("tokens_packed")
                / (F.col("n_seqs") * per_seq_capacity),
                6,
            ),
        )
    )
