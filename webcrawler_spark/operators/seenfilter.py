"""Shard-partitioned probe topology shared by the Bloom and cuckoo
URL-seen filters (north_star: "partitioned Bloom/cuckoo URL-seen filter
broadcast-merged per round"; reference semantics Host.py:190-194 /
Worker.py:110 — an exact in-memory ``set``).

Why this module exists: at 10^10 URLs a 1%-fpp Bloom filter is ~12 GiB
and a 16-bit cuckoo filter ~25 GiB — neither can live in one process or
ship as one Spark broadcast (8 GiB hard cap). The scale topology keeps
the filter as a ``(shard, state)`` DataFrame and probes it with a
cogrouped ``applyInPandas`` on the shard key:

* candidates compute ``shard = pmod(xxhash64(url), n_shards)`` natively
  (whole-stage codegen) and shuffle ONCE on that key;
* the shard-state side shuffles its n_shards rows (kilobytes each at
  the right shard count) to the same partitions;
* each cogroup task then sees exactly one shard's candidate rows plus
  that shard's filter state and probes with vectorized numpy.

No executor or the driver ever materializes the whole filter, and the
shard state is never row-duplicated the way a plain equi-join against
the candidates would duplicate it.

When the whole filter IS small (local tests, early crawl rounds), a
broadcast of all shards beats the candidate shuffle — callers size-gate
between the two modes with ``broadcast_cap_bytes`` (same O13 pattern as
the engine's size-gated wave join, engine.py).

Safety contract (both filters, SURVEY.md §7.4(4)): ``maybe_seen=False``
must imply *certainly never inserted* — the router below sends
maybe-seen rows to the exact anti-join (false positives die there) and
surely-new rows around it (no false negatives by construction).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

# Past this total filter size, ship shards by shuffle-on-shard-key
# instead of broadcasting the whole filter. 64 MiB is far below Spark's
# broadcast ceiling but already past the point where re-broadcasting
# every round beats one candidate shuffle.
DEFAULT_BROADCAST_CAP = 64 << 20

_H1, _H2, _SHARD = "__sf_h1", "__sf_h2", "__sf_shard"


def as_u64(s: pd.Series) -> np.ndarray:
    """Arrow int64 hash column -> uint64 bit pattern."""
    return s.to_numpy(dtype=np.int64).view(np.uint64)


def tag_maybe_seen_sharded(
    candidates: DataFrame,
    h1: Column,
    h2: Column,
    shard: Column,
    shards: DataFrame,
    shard_key: str,
    probe_shard: Callable[[pd.DataFrame, np.ndarray, np.ndarray], np.ndarray],
) -> DataFrame:
    """Add boolean ``maybe_seen`` via a cogrouped shard-key join.

    ``probe_shard(shard_state_rows, h1_u64, h2_u64) -> bool mask`` is
    the filter-specific membership test; it receives the (single-row)
    shard-state pandas frame and the candidate hash arrays for one
    shard. A shard with no state row (no key ever inserted there) tags
    every candidate surely-new.
    """
    cand_cols = list(candidates.columns)
    out_schema = StructType(
        [candidates.schema[c] for c in cand_cols]
        + [StructField("maybe_seen", BooleanType(), False)]
    )
    tagged_in = (
        candidates.withColumn(_H1, h1).withColumn(_H2, h2).withColumn(_SHARD, shard)
    )

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out = left[cand_cols].copy()
        if len(left) == 0:
            out["maybe_seen"] = np.zeros(0, dtype=bool)
            return out
        if len(right) == 0:
            out["maybe_seen"] = np.zeros(len(left), dtype=bool)
        else:
            out["maybe_seen"] = probe_shard(right, as_u64(left[_H1]), as_u64(left[_H2]))
        return out

    return (
        tagged_in.groupBy(_SHARD)
        .cogroup(shards.groupBy(shard_key))
        .applyInPandas(fn, out_schema)
    )


def route_with_exact_join(tagged: DataFrame, seen: DataFrame, col: str) -> DataFrame:
    """The J1 routing contract shared by both filters:

        maybe-seen  -> exact anti-join (false positives die there)
        surely-new  -> bypass the join (no false negatives)

    Semantically identical to ``candidates.join(seen, col, 'left_anti')``
    (property-tested in tests/test_bloom.py and tests/test_cuckoo.py).
    """
    surely_new = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    return surely_new.unionByName(maybe.join(seen.select(col), col, "left_anti"))
