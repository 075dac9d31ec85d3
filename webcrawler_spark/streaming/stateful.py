"""Custom stateful streaming operators (SURVEY.md §2.8 scale path).

Two crawl laws re-expressed as continuous operators over an unbounded
candidate stream with ``applyInPandasWithState`` (Arrow-batched state
machine per group key, checkpoint-durable across micro-batches):

* :func:`politeness_schedule_stream` — the W4 politeness law
  (Host.py:96-114 / engine.py native executor) as a per-host state
  machine: ``attempt_i = max(arrival_i, prev_attempt + delay)``; the
  per-host ``next_free`` clock lives in the state store. The batch
  engine computes the same law with window arithmetic because a round's
  arrivals share one timestamp; the streaming form handles arbitrary
  interleaved arrivals, which no single window expression can.
* :func:`first_seen_filter` — the F7/J1 URL-seen gate as emit-once
  state: the first occurrence of a key passes, every later one is
  dropped. State per key is a single flag, so the state store is the
  streaming analog of the partitioned seen table.

Both group by a hash-friendly key (host / url), so state shards across
executors exactly like the batch tables shard by bucket — no broadcast,
no global structure.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEDULE_OUT = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("arrival_ts", DoubleType()),
        StructField("attempt_ts", DoubleType()),
    ]
)
_SCHEDULE_STATE = StructType([StructField("next_free", DoubleType())])

SEEN_OUT = StructType(
    [
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("arrival_ts", DoubleType()),
    ]
)
_SEEN_STATE = StructType([StructField("seen", BooleanType())])


def _schedule_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (host,) = key
    next_free = state.get[0] if state.exists else None
    out: list[tuple[Any, ...]] = []
    for pdf in pdfs:
        # FIFO within the batch: stable (arrival, url) order, the same
        # tie-break the batch engine's per-host window uses
        pdf = pdf.sort_values(["arrival_ts", "url"])
        for row in pdf.itertuples(index=False):
            attempt = (
                row.arrival_ts
                if next_free is None
                else max(row.arrival_ts, next_free)
            )
            out.append((host, row.url, row.arrival_ts, attempt))
            next_free = attempt + row.delay
    state.update((next_free,))
    yield pd.DataFrame(out, columns=["host", "url", "arrival_ts", "attempt_ts"])


def politeness_schedule_stream(candidates: DataFrame) -> DataFrame:
    """W4 as a streaming state machine.

    ``candidates``: streaming DataFrame with columns
    (host string, url string, arrival_ts double, delay double).
    Emits (host, url, arrival_ts, attempt_ts); per-host ``next_free``
    survives micro-batch and restart boundaries via the state store.
    """
    return candidates.groupBy("host").applyInPandasWithState(
        _schedule_fn,
        outputStructType=SCHEDULE_OUT,
        stateStructType=_SCHEDULE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _first_seen_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (url,) = key
    if state.exists:
        yield pd.DataFrame(columns=["url", "host", "arrival_ts"])
        return
    first = None
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            cand = (url, row.host, float(row.arrival_ts))
            if first is None or cand[2] < first[2]:
                first = cand
    state.update((True,))
    yield pd.DataFrame([first], columns=["url", "host", "arrival_ts"])


def first_seen_filter(links: DataFrame) -> DataFrame:
    """F7/J1 as emit-once streaming state.

    ``links``: streaming DataFrame with (url string, host string,
    arrival_ts double). The first arrival of each url passes (earliest
    arrival_ts within the batch, the A5 tie-break); duplicates across
    all later micro-batches are dropped via the per-url state flag.
    """
    return links.groupBy("url").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=SEEN_OUT,
        stateStructType=_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming MinHash-LSH near-dup filter ---------------------------
# The dedup.incremental_lsh_matches law as a continuous operator: every
# (band_id, band_min) bucket is a state-store key holding the id of the
# FIRST document that claimed it (by arrival, then id — the A5
# tie-break); any later document hitting an owned bucket emits a
# collision row. State shards by bucket key exactly like the batch
# signature store shards by (band_id, band_min) — per-bucket state is
# one long, no broadcast, no global structure. Per-document verdicts
# (dup iff ANY band collides, attribution = min owner) are a stateless
# rollup of the collision stream.

COLLIDE_OUT = StructType(
    [
        StructField("band_id", StringType()),
        StructField("band_min", StringType()),
        StructField("doc_id", LongType()),
        StructField("owner_id", LongType()),
    ]
)
_BUCKET_STATE = StructType([StructField("owner", LongType())])


def _bucket_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    band_id, band_min = key
    rows = []
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            rows.append((float(r.arrival_ts), int(r.doc_id)))
    rows.sort()
    (owner,) = state.get if state.exists else (None,)
    out = []
    for _, doc in rows:
        if owner is None:
            owner = doc  # first claim — not a collision
        elif doc != owner:
            out.append((band_id, band_min, doc, owner))
    if owner is not None and (not state.exists or state.get[0] != owner):
        state.update((owner,))
    yield pd.DataFrame(out, columns=["band_id", "band_min", "doc_id", "owner_id"])


def lsh_collision_stream(signatures: DataFrame) -> DataFrame:
    """Streaming near-dup candidate detection over MinHash signatures.

    ``signatures``: streaming DataFrame with (band_id string,
    band_min string, doc_id long, arrival_ts double) — one row per
    (document, band), e.g. ``dedup.minhash_signatures`` applied to the
    incoming document stream (narrow native expressions, stream-safe).
    Emits one row per band collision: (band_id, band_min, doc_id,
    owner_id) where ``owner_id`` is the bucket's first claimant.
    Bucket ownership survives micro-batch and restart boundaries via
    the state store, so the operator is the streaming twin of the
    batch new×store signature join (incremental_lsh_matches): a
    document is a near-dup candidate iff it appears in any collision
    row, with deterministic attribution min(owner_id).
    """
    return signatures.groupBy("band_id", "band_min").applyInPandasWithState(
        _bucket_fn,
        outputStructType=COLLIDE_OUT,
        stateStructType=_BUCKET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
