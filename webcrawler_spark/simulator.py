"""Pure-Python reference simulator — the crawl-order oracle.

Implements the reference crawler's *intended* scheduling semantics
(SURVEY.md §2.6 W1-W4, §5.2 layer 3, §5.3) with a virtual clock and a
single logical worker, over an offline ``pages`` mapping. This is an
independent, heap-based implementation — deliberately structured like
the reference's Worker loop (priority heap + per-host FIFO), NOT like
the Spark engine (window ranks over tables), so agreement between the
two is meaningful evidence.

Semantics per /root/reference/ citations:

* host min-heap ordered by (priority, host)        — Worker.py:49,227
* per-host FIFO of resources                       — Host.py:59-69
* priority: first host ever → 0                    — Worker.py:121-141
  new hosts → max(0,(currMax-currMin)/2)           — Worker.py:143-147
  re-queued hosts → now + crawl_delay              — Worker.py:127-134,197
* currMin updated at pop                           — Worker.py:183-184
  currMax updated at known-host enqueue            — Worker.py:131-132
* robots fetched lazily at first pop of the host   — Worker.py:189,234-236
* gate: robots ∧ extension ∧ HEAD(exists) ∧ html   — Worker.py:238-253
* politeness: wait until the host's priority ts    — Worker.py:193,209-216
* attempted URL marked seen unconditionally        — Worker.py:202
* budget stop                                      — WorkersPipeline.py:259-272

Intended-semantics fixes (documented in SURVEY.md §2.7 defect notes):
hosts leave the on-queue set when popped; a host with pending
resources stays schedulable after a skip; pending URLs are deduped at
enqueue; the budget lands exactly on `limit`.
"""

from __future__ import annotations

import heapq
from collections import deque
from dataclasses import dataclass, field

from webcrawler_spark.functions.htmltools import (
    decode_html_bytes,
    extract_hrefs,
    first_n_words,
    page_title,
    visible_text,
)
from webcrawler_spark.functions.robots import clamp_delay, parse_robots
from webcrawler_spark.functions.urltools import (
    format_link,
    host_of,
    normalize_url,
    passes_extension_filter,
    resource_of,
)

VIRTUAL_CLOCK_START = 1651968000.0  # 2022-05-08 00:00 UTC (FIXTURES.md §4)


@dataclass
class SimHost:
    fifo: deque = field(default_factory=deque)
    pending: set = field(default_factory=set)
    seen: set = field(default_factory=set)  # attempted resources
    robots_fetched: bool = False
    robots_rules: object = None
    robots_ok: bool = False
    delay: float = 0.1
    crawled_count: int = 0  # attempted (Worker.py:202 semantics)
    fetched_count: int = 0


@dataclass
class SimResult:
    attempt_order: list  # (url, virtual_ts, fetched: bool)
    fetch_order: list  # urls actually fetched+saved, in order
    seen: dict  # url -> fetched bool
    host_counts: dict  # host -> attempted count (A2 semantics)
    texts: dict  # url -> extracted visible text
    debug: list  # (url, title, first20, ts)


class ReferenceSimulator:
    """Single-worker virtual-clock crawl over an offline pages table."""

    def __init__(self, pages: dict[str, dict], limit: int | None = None):
        """pages: url -> {html: bytes, status: int, content_type: str}."""
        self.pages = pages
        self.limit = limit
        self.hosts: dict[str, SimHost] = {}
        self.heap: list[tuple[float, str]] = []
        self.on_queue: set[str] = set()
        self.curr_min = float("inf")
        self.curr_max = 0.0
        self.first_add = True
        self.t = VIRTUAL_CLOCK_START

    # -- enqueue path (Worker.addLinkToRequest, Worker.py:107-134) -----
    def add_link(self, link: str) -> None:
        url = normalize_url(link)
        host, resource = host_of(url), resource_of(url)
        if host == "":  # F8
            return
        h = self.hosts.get(host)
        first_time = h is None
        if h is None:
            h = self.hosts[host] = SimHost()
        if resource in h.seen or resource in h.pending:  # F7 + pending dedup
            return
        h.fifo.append(resource)
        h.pending.add(resource)

        if first_time or host not in self.on_queue:
            if first_time:
                if self.first_add:
                    self.first_add = False
                    self._push(host, 0.0)
                else:
                    medium = max(0.0, (self.curr_max - self.curr_min) / 2)
                    self._push(host, medium)
            else:
                ts = self.t + h.delay
                if ts > self.curr_max:
                    self.curr_max = ts
                self._push(host, ts)

    def _push(self, host: str, priority: float) -> None:
        if host not in self.on_queue:
            self.on_queue.add(host)
            heapq.heappush(self.heap, (priority, host))

    # -- robots (lazy, at first pop — Worker.py:189) --------------------
    def _fetch_robots(self, host: str, h: SimHost) -> None:
        h.robots_fetched = True
        row = self.pages.get(f"{host}/robots.txt")
        if row is None or not (200 <= row["status"] < 300):
            h.robots_ok = False
            h.delay = clamp_delay(None, False)
            return
        body = decode_html_bytes(row["html"])
        h.robots_ok = True
        h.robots_rules = parse_robots(body)
        h.delay = clamp_delay(h.robots_rules.crawl_delay, True)

    # -- main loop (Worker._crawlUntilItCan) -----------------------------
    def run(self, seeds: list[str]) -> SimResult:
        res = SimResult([], [], {}, {}, {}, [])
        for s in seeds:
            self.add_link(s)

        while self.heap:
            if self.limit is not None and len(res.fetch_order) >= self.limit:
                break
            prio, host = heapq.heappop(self.heap)
            self.on_queue.discard(host)  # intended semantics (defect note)
            if prio < self.curr_min:
                self.curr_min = prio

            h = self.hosts[host]
            resource = h.fifo.popleft()
            h.pending.discard(resource)
            # mark attempted-as-seen at pop (intended Revisitation
            # semantics: a page must never be attempted twice, even via
            # a self-link discovered during its own parse; the reference
            # marks late at Worker.py:202, which SURVEY.md §2.7 flags as
            # the double-fetch defect — not reproduced)
            h.seen.add(resource)
            url = host + resource

            if not h.robots_fetched:
                self._fetch_robots(host, h)

            row = self.pages.get(url)
            allowed = h.robots_rules.allowed(resource) if (h.robots_ok and h.robots_rules) else True
            heur = passes_extension_filter(url)
            head_ok = row is not None and "text/html" in (row["content_type"] or "")
            should_access = allowed and heur and head_ok

            fetched = False
            if should_access:
                if prio > self.t:  # politeness wait (virtual sleep)
                    self.t = prio
                if 200 <= row["status"] < 300:  # GET + 2xx∧html (F3/F4)
                    fetched = True
                    html = decode_html_bytes(row["html"])
                    text = visible_text(html)
                    links = sorted(
                        {
                            f
                            for raw in extract_hrefs(html)
                            if (f := format_link(raw, host))
                        }
                    )
                    for link in links:
                        self.add_link(link)
                    res.fetch_order.append(url)
                    res.texts[url] = text
                    res.debug.append(
                        (url, page_title(html), first_n_words(text, 20), self.t)
                    )
                # host becomes schedulable again after the politeness delay
                if h.fifo:
                    self._requeue_after_fetch(host, h)
            else:
                # intended semantics: skipped host stays schedulable at
                # its unchanged priority (reference would strand it)
                if h.fifo:
                    self._push(host, prio)

            # attempted counter (Worker.py:202 unconditional marking;
            # the seen-set insert itself moved to pop time, see above)
            h.crawled_count += 1
            if fetched:
                h.fetched_count += 1
            res.attempt_order.append((url, self.t, fetched))
            res.seen[url] = fetched

        res.host_counts = {
            host: h.crawled_count for host, h in self.hosts.items() if h.crawled_count
        }
        return res

    def _requeue_after_fetch(self, host: str, h: SimHost) -> None:
        # NB: the post-fetch re-push does NOT bump currMaxDelay — the
        # reference only bumps it on the revive path inside
        # addLinkToRequest (Worker.py:128-132); the re-push at
        # Worker.py:199-200 pushes without touching it.
        self._push(host, self.t + h.delay)


def pages_df_to_dict(pages_rows) -> dict[str, dict]:
    """Adapt collected pages rows to the simulator's mapping."""
    return {
        r["url"]: {
            "html": bytes(r["html"]) if r["html"] is not None else b"",
            "status": r["status"],
            "content_type": r["content_type"],
        }
        for r in pages_rows
    }
