"""Spark 4 ``transformWithStateInPandas`` variants of the stateful
crawl operators (SURVEY.md §2.8) — the successor API to
``applyInPandasWithState`` (SPARK-49535 / Structured Streaming's
"transformWithState" processor model): named state variables with
per-variable schemas + optional TTL, timers, and initial-state
seeding, instead of one opaque state tuple.

Same two crawl laws as streaming/stateful.py, so the two APIs are
directly comparable (tests assert identical output):

* :class:`PolitenessProcessor` — the W4 politeness recurrence
  ``attempt_i = max(arrival_i, prev_attempt + delay)`` with the
  per-host ``next_free`` clock in a named ValueState.
* :class:`FirstSeenProcessor` — the F7/J1 emit-once URL gate with a
  per-url flag ValueState; a production frontier would add
  ``ttlDurationMs`` here to age out tail URLs, which this API supports
  per state variable (applyInPandasWithState cannot).

State shards by the group key (host / url) exactly like the batch
tables shard by bucket — no broadcast, no global structure; the state
store checkpoints with the query (exactly-once under AvailableNow,
same contract streaming/incremental.py exercises).

Sandbox note: running these requires the ``protobuf`` package (the
transformWithState Python driver worker speaks protobuf to the JVM
state server); this container ships pyspark without it, so
tests/test_tws.py skips here and runs on any normal Spark 4 install.
The applyInPandasWithState twins in stateful.py are the exercised
path in-sandbox.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from webcrawler_spark.streaming.stateful import SCHEDULE_OUT, SEEN_OUT


class PolitenessProcessor(StatefulProcessor):
    """W4 per-host scheduler: named ``next_free`` ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._next_free = handle.getValueState("next_free", "next_free double")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        next_free = self._next_free.get()[0] if self._next_free.exists() else None
        out: list[tuple] = []
        for pdf in rows:
            # same FIFO tie-break as the batch window and the
            # applyInPandasWithState twin: (arrival, url)
            pdf = pdf.sort_values(["arrival_ts", "url"])
            for row in pdf.itertuples(index=False):
                attempt = (
                    row.arrival_ts
                    if next_free is None
                    else max(row.arrival_ts, next_free)
                )
                out.append((host, row.url, row.arrival_ts, attempt))
                next_free = attempt + row.delay
        self._next_free.update((next_free,))
        yield pd.DataFrame(out, columns=["host", "url", "arrival_ts", "attempt_ts"])

    def close(self) -> None:
        pass


class FirstSeenProcessor(StatefulProcessor):
    """F7/J1 emit-once gate: per-url flag ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", "seen boolean")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        (url,) = key
        if self._seen.exists():
            yield pd.DataFrame(columns=["url", "host", "arrival_ts"])
            return
        first = None
        for pdf in rows:
            for row in pdf.itertuples(index=False):
                cand = (url, row.host, float(row.arrival_ts))
                if first is None or cand[2] < first[2]:
                    first = cand
        self._seen.update((True,))
        yield pd.DataFrame([first], columns=["url", "host", "arrival_ts"])

    def close(self) -> None:
        pass


def politeness_schedule_tws(candidates: DataFrame) -> DataFrame:
    """W4 politeness over (host, url, arrival_ts, delay) via
    transformWithStateInPandas; output matches
    stateful.politeness_schedule_stream row-for-row."""
    return candidates.groupBy("host").transformWithStateInPandas(
        statefulProcessor=PolitenessProcessor(),
        outputStructType=SCHEDULE_OUT,
        outputMode="append",
        timeMode="none",
    )


def first_seen_tws(links: DataFrame) -> DataFrame:
    """F7/J1 emit-once over (url, host, arrival_ts); output matches
    stateful.first_seen_filter row-for-row."""
    return links.groupBy("url").transformWithStateInPandas(
        statefulProcessor=FirstSeenProcessor(),
        outputStructType=SEEN_OUT,
        outputMode="append",
        timeMode="none",
    )
