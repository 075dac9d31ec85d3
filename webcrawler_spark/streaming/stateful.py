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
