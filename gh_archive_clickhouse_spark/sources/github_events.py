"""GitHub Events streaming source — the reference's ``gh-archived``
poll loop (cmd/gh-archived/main.go:100-212) as a PySpark 4 Python
``DataSource`` stream reader.

State machine replicated (with file:line provenance):

- **ETag conditional fetch** (internal/gh/gh.go:135-137, 160-163):
  ``If-None-Match`` on page 1; a 304 yields an empty micro-batch.
- **Auto-pagination** (main.go:122-170): fetch pages 1..max_pages+1 at
  per_page=100; stop as soon as a page contributes fewer new events
  than its full size (``len(new) < perPage*page`` — :163-168), or on
  422 (GitHub caps pagination depth — gh.go:165-167).
- **Seen-id frontier dedup** (main.go:107, 121, 152-162): events whose
  id appeared in the previous poll (``latestMet``) or earlier in this
  poll (``currentMet``) are dropped before they enter the batch.
- **Token rotation** (gh.go:27-41, 132-134): comma-separated tokens;
  the reference picks randomly per request, we rotate round-robin —
  deterministic, same budget-spreading effect.
- **Rate-limit pacing** (gh.go:58-84; main.go:180-210): parse
  ``X-RateLimit-*``; sleep ``time_until_reset/remaining`` between
  polls, and when remaining < 10 sleep through the reset. In Spark the
  sleep happens inside ``read()`` (self-paced source); the trigger
  interval is the floor.

Offsets are ``{"poll": n}``: a live HTTP feed is not replayable, so
exactly-once delivery into the stream relies on the Simple reader's
prefetch-cache contract (Spark persists read batches until commit) —
the same at-least-once-into-dedup posture the reference takes, which
then scrubs duplicates with ``dropDuplicatesWithinWatermark``
(streaming/pipeline.py).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

DEFAULT_API_URL = "https://api.github.com/events"
PER_PAGE = 100  # main.go:102
MAX_PAGES = 10  # main.go:103


@dataclass
class RateLimit:
    """Parsed X-RateLimit-* headers (gh.go:58-84)."""

    limit: int = 0
    remaining: int = 0
    reset: float = 0.0

    @classmethod
    def from_headers(cls, headers) -> "RateLimit":
        try:
            return cls(
                limit=int(headers.get("X-RateLimit-Limit", 0)),
                remaining=int(headers.get("X-RateLimit-Remaining", 0)),
                reset=float(headers.get("X-RateLimit-Reset", 0)),
            )
        except (TypeError, ValueError):
            return cls()

    def pacing_sleep(self, now: float) -> float:
        """Seconds to sleep before the next poll (main.go:183-194)."""
        if self.remaining <= 0 and self.reset <= 0:
            return 0.0  # no rate info at all: poll freely
        until_reset = max(self.reset - now, 0.0)
        if self.remaining < 10:  # main.go:190-193; includes remaining==0
            # budget (nearly) exhausted: sleep through the reset — the
            # one moment NOT to hammer the API.
            return until_reset + 1.0
        return until_reset / self.remaining


@dataclass
class PollResult:
    rows: list[tuple] = field(default_factory=list)
    status: int = 200
    etag: str | None = None
    rate: RateLimit = field(default_factory=RateLimit)


class GitHubEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.url = options.get("url", DEFAULT_API_URL)
        self.tokens = [
            t for t in options.get("tokens", "").split(",") if t.strip()
        ]
        self.per_page = int(options.get("per_page", PER_PAGE))
        self.max_pages = int(options.get("max_pages", MAX_PAGES))
        # pacing can be capped for tests / bounded triggers
        self.max_sleep = float(options.get("max_sleep_s", 2.0))
        self.pace = options.get("pace", "true").lower() == "true"
        self._etag: str | None = None
        self._latest_met: set[int] = set()
        self._request_count = 0
        self._next_sleep = 0.0

    # -- offset bookkeeping ------------------------------------------
    def initialOffset(self) -> dict:
        return {"poll": 0}

    # -- HTTP --------------------------------------------------------
    def _headers(self, page: int) -> dict:
        h = {
            "Accept": "application/vnd.github+json",
            "User-Agent": "gh-archive-clickhouse-spark",
        }
        if self.tokens:
            tok = self.tokens[self._request_count % len(self.tokens)]
            h["Authorization"] = f"Bearer {tok}"
        if page == 1 and self._etag:  # etag kept only for page 1
            h["If-None-Match"] = self._etag
        return h

    def _get_page(self, page: int) -> tuple[int, bytes, dict]:
        params = f"?per_page={self.per_page}&page={page}"
        req = urllib.request.Request(
            self.url + params, headers=self._headers(page)
        )
        self._request_count += 1
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, resp.read(), dict(resp.headers)
        except urllib.error.HTTPError as exc:
            return exc.code, b"", dict(exc.headers or {})

    # -- the poll state machine --------------------------------------
    def _poll_once(self) -> PollResult:
        result = PollResult()
        current_met: set[int] = set()
        for page in range(1, self.max_pages + 2):  # main.go:122
            status, body, headers = self._get_page(page)
            result.rate = RateLimit.from_headers(headers)
            if page == 1:
                if status == 304:  # ETag hit: nothing new (gh.go:160-163)
                    result.status = 304
                    return result
                result.etag = headers.get("ETag") or headers.get("Etag")
            if status == 422:  # pagination cut (gh.go:165-167)
                result.status = 422
                # the reference adopts the frontier after the paging
                # loop regardless of how it ended (main.go:207) — ids
                # seen before the cut must not re-emit next poll
                self._remember(current_met)
                return result
            if status != 200:
                result.status = status
                self._remember(current_met)
                return result
            events = json.loads(body or b"[]")
            for ev in events:
                try:
                    ev_id = int(ev["id"])
                except (KeyError, TypeError, ValueError):
                    continue
                if ev_id in current_met:
                    continue  # dup within this poll (main.go:152-156)
                # the frontier remembers every id SEEN this poll (not
                # just emitted ones) — otherwise an id re-served next
                # poll would age out and be emitted twice
                current_met.add(ev_id)
                if ev_id in self._latest_met:
                    continue  # seen in previous poll (main.go:157-162)
                created = ev.get("created_at")
                result.rows.append(
                    (ev_id, created, json.dumps(ev, separators=(",", ":")))
                )
            # stop paging unless EVERY event so far was new
            # (len(newEvents) < perPage*page — main.go:163-168)
            if len(result.rows) < self.per_page * page:
                break
            if len(events) < self.per_page:
                break
        self._remember(current_met)
        return result

    def _remember(self, ids: set[int]) -> None:
        """Adopt this poll's ids as the next poll's frontier.

        Memory is bounded structurally, not by an explicit cap: a poll
        sees at most per_page * (max_pages + 1) ids, and the frontier
        is REPLACED (not unioned) each poll — main.go:207 does the same.
        """
        if not ids:
            return
        self._latest_met = set(ids)

    # -- Spark contract ----------------------------------------------
    def read(self, start: dict) -> tuple:
        if self.pace and self._next_sleep > 0:
            time.sleep(min(self._next_sleep, self.max_sleep))
        result = self._poll_once()
        if result.etag:
            self._etag = result.etag
        self._next_sleep = result.rate.pacing_sleep(time.time())
        return iter(result.rows), {"poll": start.get("poll", 0) + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        # Live feed: replay between offsets is served by Spark's
        # prefetch cache; a cache miss means data loss windows are
        # empty (same recovery posture as the reference restarting).
        return iter([])

    def commit(self, end: dict) -> None:
        pass


class GitHubEventsDataSource(DataSource):
    """``spark.readStream.format("github_events")`` source.

    Options: url, tokens (comma-separated), per_page, max_pages,
    pace (true/false), max_sleep_s.
    """

    @classmethod
    def name(cls) -> str:
        return "github_events"

    def schema(self) -> str:
        return "id long, created_at string, raw string"

    def simpleStreamReader(self, schema: StructType):
        return GitHubEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(GitHubEventsDataSource)
