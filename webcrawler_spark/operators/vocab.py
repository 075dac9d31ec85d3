"""Frequency vocabulary building + token-id encoding — the step
between cleaning and packing in a training-data pipeline (the
word-level analog of BPE vocab construction; textstats.bpe_token_count
meters tokens, packing.py packs the encoded ids into sequences).

* :func:`build_vocab` — the ``max_size`` most frequent terms, ids
  assigned by (count desc, term asc): id 0 is the most frequent term.
  One explode → one hash aggregate → TakeOrderedAndProject; the rank
  window then runs over the ALREADY-CAPPED table (≤ max_size rows —
  model-sized by construction, the one place a single-partition window
  is the scale-correct plan, same as the IVF centroid table).
* :func:`encode_docs` — each doc becomes its token-id sequence:
  posexplode → **broadcast** vocab join → one per-doc reassembly
  aggregate (array_sort(collect_list(struct(pos, id)))) — bounded by
  the doc's own length, the corpus never self-joins. Out-of-vocab
  terms encode as ``unk_id``.

Reference parity note: the reference crawler stops at visible-text
extraction (Parser.py); encoding is the downstream step a training
pipeline adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from webcrawler_spark.operators.textstats import words_col


def build_vocab(
    df: DataFrame,
    col: str = "text",
    max_size: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """(term, token_id, c) — ids 0..|V|-1 by (count desc, term asc)."""
    counts = (
        df.select(F.explode(words_col(F.col(col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= int(min_count))
        .orderBy(F.col("c").desc(), F.col("term"))
        .limit(int(max_size))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("term"))  # ≤ max_size rows
    return counts.select(
        "term", (F.row_number().over(w) - 1).cast("int").alias("token_id"), "c"
    )


def encode_docs(
    df: DataFrame,
    vocab: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = -1,
) -> DataFrame:
    """(id, n_tokens, n_unk, token_ids array<int>) in original token
    order; empty docs yield an empty array."""
    pos = df.select(
        F.col(id_col), F.posexplode(words_col(F.col(col))).alias("pos", "term")
    )
    enc = pos.join(F.broadcast(vocab.select("term", "token_id")), "term", "left")
    assembled = enc.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("token_id").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_unk"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pos"),
                        F.coalesce(F.col("token_id"), F.lit(int(unk_id))).alias("tid"),
                    )
                )
            ),
            lambda x: x["tid"],
        ).alias("token_ids"),
    )
    return df.select(F.col(id_col)).join(assembled, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.col("n_unk"), F.lit(0)).alias("n_unk"),
        F.coalesce(F.col("token_ids"), F.array().cast("array<int>")).alias(
            "token_ids"
        ),
    )
