"""Poll-source state machine vs a hermetic mock GitHub API
(FIXTURES.md §6): pagination stop condition, cross-poll seen-id dedup,
ETag/304, 422 cut, rate-limit pacing, token rotation — mirroring the
behaviors at cmd/gh-archived/main.go:122-170 and internal/gh/gh.go.
"""

from __future__ import annotations

import http.server
import json
import threading
import urllib.parse

import pytest

from gh_archive_clickhouse_spark.sources.github_events import (
    GitHubEventsStreamReader,
    RateLimit,
)


def _events(ids):
    return [
        {
            "id": str(i),
            "type": "PushEvent",
            "actor": {"id": i, "login": f"u{i}"},
            "created_at": "2020-01-01T15:04:05Z",
        }
        for i in ids
    ]


class MockGitHub(http.server.BaseHTTPRequestHandler):
    """Scripted exchange. Class-level state shared across requests:

    poll 1: page1 ids 0..4 (full), page2 ids 3..7 (overlap within poll)
    poll 2: If-None-Match hit → 304
    poll 3: page1 ids 5..9 (3 seen in poll 1, 2 new) → stop after page 1
    """

    polls = 0
    auth_seen: list[str] = []
    requests_seen: list[tuple[int, int]] = []

    ETAG = '"etag-abc"'

    def do_GET(self):
        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        page = int(q.get("page", ["1"])[0])
        cls = type(self)
        cls.auth_seen.append(self.headers.get("Authorization", ""))
        if page == 1:
            cls.polls += 1
        cls.requests_seen.append((cls.polls, page))

        rate = {
            "X-RateLimit-Limit": "5000",
            "X-RateLimit-Remaining": "4990",
            "X-RateLimit-Reset": "0",
        }
        if cls.polls == 2 and page == 1:
            if self.headers.get("If-None-Match") == self.ETAG:
                self.send_response(304)
                for k, v in rate.items():
                    self.send_header(k, v)
                self.end_headers()
                return
        if cls.polls == 1:
            body = _events(range(0, 5)) if page == 1 else _events(range(3, 8))
        else:
            body = _events(range(5, 10))
        payload = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("ETag", self.ETAG)
        for k, v in rate.items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture()
def mock_server():
    MockGitHub.polls = 0
    MockGitHub.auth_seen = []
    MockGitHub.requests_seen = []
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), MockGitHub)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_port}/events"
    server.shutdown()


def _reader(url, **opts):
    options = {
        "url": url,
        "per_page": "5",
        "max_pages": "3",
        "pace": "false",
        "tokens": "tokA,tokB",
    }
    options.update(opts)
    return GitHubEventsStreamReader(options)


def test_poll_state_machine(mock_server):
    r = _reader(mock_server)

    # poll 1: page1 all new (5 = per_page*1 → continue), page2 adds
    # 5..7 (3 new; 3,4 dropped by current-poll dedup) → 8 rows, stop.
    rows, off = r.read(r.initialOffset())
    ids = sorted(int(t[0]) for t in rows)
    assert ids == [0, 1, 2, 3, 4, 5, 6, 7]
    assert off == {"poll": 1}

    # poll 2: ETag hit → 304 → empty batch
    rows, off = r.read(off)
    assert list(rows) == []
    assert off == {"poll": 2}

    # poll 3 (server returns 200 again): ids 5..9; 5,6,7 are in the
    # previous poll's frontier → only 8,9 emitted
    rows, off = r.read(off)
    ids = sorted(int(t[0]) for t in rows)
    assert ids == [8, 9]

    # poll 4: server re-serves 5..9; ALL were seen in poll 3 (even the
    # ones not emitted) → nothing re-emitted (frontier regression test)
    rows, off = r.read(off)
    assert list(rows) == []

    # pagination actually stopped early on polls 1 and 3
    pages = MockGitHub.requests_seen
    assert (1, 1) in pages and (1, 2) in pages and (1, 3) not in pages
    assert (3, 2) not in pages


def test_token_rotation(mock_server):
    r = _reader(mock_server)
    r.read(r.initialOffset())
    assert {"Bearer tokA", "Bearer tokB"} <= set(MockGitHub.auth_seen)


def test_rows_carry_raw_json(mock_server):
    r = _reader(mock_server)
    rows, _ = r.read(r.initialOffset())
    ev_id, created, raw = next(iter(rows))
    assert created == "2020-01-01T15:04:05Z"
    assert json.loads(raw)["id"] == str(ev_id)


class Mock422(MockGitHub):
    def do_GET(self):
        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        page = int(q.get("page", ["1"])[0])
        if page >= 3:
            self.send_response(422)
            self.end_headers()
            return
        # always-new full pages force deep pagination
        base = type(self).polls * 1000 + page * 100
        type(self).polls += page == 1
        payload = json.dumps(_events(range(base, base + 5))).encode()
        self.send_response(200)
        self.end_headers()
        self.wfile.write(payload)


def test_422_cuts_pagination():
    Mock422.polls = 0
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Mock422)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        r = _reader(f"http://127.0.0.1:{server.server_port}/events")
        rows, off = r.read(r.initialOffset())
        # two full pages collected, then 422 ended the poll cleanly
        assert len(list(rows)) == 10
        assert off == {"poll": 1}
    finally:
        server.shutdown()


class Mock422Repeat(MockGitHub):
    """Pages 1-2 serve FIXED ids every poll; page 3 is always 422."""

    def do_GET(self):
        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        page = int(q.get("page", ["1"])[0])
        if page >= 3:
            self.send_response(422)
            self.end_headers()
            return
        payload = json.dumps(
            _events(range(page * 100, page * 100 + 5))
        ).encode()
        self.send_response(200)
        self.end_headers()
        self.wfile.write(payload)


def test_frontier_survives_422_cut():
    """Ids seen before a 422 pagination cut must enter the seen-id
    frontier (the reference adopts it after the paging loop however it
    ended, main.go:207) — a repeat poll re-serving the same pages
    emits nothing."""
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Mock422Repeat)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        r = _reader(f"http://127.0.0.1:{server.server_port}/events")
        rows1, off1 = r.read(r.initialOffset())
        assert len(list(rows1)) == 10
        rows2, _ = r.read(off1)
        assert list(rows2) == []
    finally:
        server.shutdown()


def test_streaming_end_to_end(spark, mock_server, tmp_path):
    """Full Structured Streaming run: custom source → watermark dedup →
    memory sink, against the mock API."""
    import time as _time

    from gh_archive_clickhouse_spark.streaming.pipeline import (
        deduped_stream,
        poll_stream,
    )

    stream = deduped_stream(
        poll_stream(
            spark,
            url=mock_server,
            per_page="5",
            max_pages="3",
            pace="false",
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("gh_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = _time.time() + 45
        while _time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM gh_stream").first().c >= 10:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.sql("SELECT id, ts, raw FROM gh_stream").collect()
    assert sorted(r.id for r in rows) == list(range(10))
    assert all(r.ts is not None and r.raw for r in rows)


class MockArchiveFlow(http.server.BaseHTTPRequestHandler):
    """One scripted lifecycle exercising every protocol behavior in a
    single stream run:

    poll 1: page1 ids 0..4 (full) + page2 ids 3..7 (within-poll
            overlap) → emits 0..7
    poll 2: If-None-Match hit → 304 (empty batch)
    poll 3: page1 ids 5..9 (3 in poll-1's frontier) → emits 8,9
    poll 4: page1 ids 10..14 (all new, full) → page2 → 422 cut
    poll 5+: 304 forever
    """

    polls = 0
    requests_seen: list[tuple[int, int]] = []
    not_modified = 0
    ETAG = '"etag-flow"'

    def do_GET(self):
        q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        page = int(q.get("page", ["1"])[0])
        cls = type(self)
        if page == 1:
            cls.polls += 1
        cls.requests_seen.append((cls.polls, page))
        if page == 1 and (cls.polls == 2 or cls.polls >= 5):
            if self.headers.get("If-None-Match") == cls.ETAG:
                cls.not_modified += 1
                self.send_response(304)
                self.end_headers()
                return
        if cls.polls == 4 and page >= 2:
            self.send_response(422)
            self.end_headers()
            return
        if cls.polls == 1:
            ids = range(0, 5) if page == 1 else range(3, 8)
        elif cls.polls == 3:
            ids = range(5, 10)
        else:  # poll 4 page 1
            ids = range(10, 15)
        self.send_response(200)
        self.send_header("ETag", cls.ETAG)
        self.end_headers()
        self.wfile.write(json.dumps(_events(ids)).encode())

    def log_message(self, *a):
        pass


def test_archive_pipeline_end_to_end(spark, tmp_path):
    """The COMPLETE reference dataflow, hermetically: the production
    entrypoint ``start_archive`` (real spark.readStream
    format('github_events') → watermark dedup → partitioned parquet
    sink with checkpoint) against a scripted server covering
    pagination-with-overlap, ETag/304, frontier dedup across polls,
    and a 422 cut — the reference's one live-API test
    (internal/gh/gh_test.go:11-21) plus its main loop, end to end.
    Exact emitted-id set asserted across the overlapping polls."""
    import time as _time

    from gh_archive_clickhouse_spark.sources.sinks import (
        dedup_view,
        read_events,
    )
    from gh_archive_clickhouse_spark.streaming.pipeline import start_archive

    MockArchiveFlow.polls = 0
    MockArchiveFlow.requests_seen = []
    MockArchiveFlow.not_modified = 0
    server = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), MockArchiveFlow
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    out = str(tmp_path / "archive")
    q = start_archive(
        spark,
        out_path=out,
        checkpoint=str(tmp_path / "ckpt"),
        trigger_seconds=1,
        url=f"http://127.0.0.1:{server.server_port}/events",
        per_page="5",
        max_pages="3",
        pace="false",
    )
    try:
        deadline = _time.time() + 60
        want = set(range(15))
        got: set[int] = set()
        while _time.time() < deadline:
            try:
                got = {
                    r.id for r in read_events(spark, out).select("id").collect()
                }
            except Exception:
                got = set()
            if got >= want and MockArchiveFlow.not_modified >= 1:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
        server.shutdown()

    # exact id set: overlaps (3,4 within poll 1; 5-7 across polls 1/3;
    # 8,9 across polls 3/4) emitted exactly once
    stored = read_events(spark, out)
    assert {r.id for r in stored.select("id").collect()} == want
    assert stored.count() == len(want)
    # MergeTree layout contract: daily partition dirs, dedup_view clean
    assert (tmp_path / "archive" / "dt=20200101").is_dir()
    assert dedup_view(stored).count() == len(want)
    # protocol evidence: 304 taken at least once; 422 cut poll 4 at
    # page 2; pagination never ran past the scripted depth
    assert MockArchiveFlow.not_modified >= 1
    assert (4, 2) in MockArchiveFlow.requests_seen
    assert (1, 3) not in MockArchiveFlow.requests_seen
    assert (3, 2) not in MockArchiveFlow.requests_seen


def test_rate_limit_pacing_rules():
    now = 1000.0
    # healthy budget: spread requests until reset (main.go:187)
    assert RateLimit(5000, 100, now + 50).pacing_sleep(now) == 0.5
    # nearly exhausted: sleep through reset + 1s (main.go:190-193)
    assert RateLimit(5000, 5, now + 30).pacing_sleep(now) == 31.0
    # no headers → no pacing
    assert RateLimit().pacing_sleep(now) == 0.0


def test_poll_frontier_property_random_streams():
    """Randomized pin of the poll state machine against an INDEPENDENT
    Python model of the reference algorithm (main.go:122-170,207):
    per-poll page loop with the two stop rules (every-event-so-far-new
    and short page), within-poll dedup, cross-poll frontier dedup,
    seen-but-not-emitted ids still entering the frontier, frontier
    REPLACED per poll (an id absent for one whole poll may legally
    re-emit later — the reference's restart posture), and an empty
    poll leaving the frontier untouched. Small id domain + tiny pages
    force every collision class the scripted mock can't enumerate."""
    import json as _json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    PP, MP = 3, 2

    @given(
        polls=st.lists(
            st.lists(st.integers(0, 7), min_size=0, max_size=12),
            min_size=1,
            max_size=5,
        )
    )
    @settings(max_examples=40, deadline=None)
    def run(polls):
        reader = GitHubEventsStreamReader(
            {"per_page": str(PP), "max_pages": str(MP), "pace": "false"}
        )
        serving: list[int] = []

        def fake_get_page(page):
            body = _json.dumps(
                _events(serving[(page - 1) * PP : page * PP])
            ).encode()
            return 200, body, {}

        reader._get_page = fake_get_page

        latest: set[int] = set()
        for served in polls:
            serving = served
            got = [r[0] for r in reader._poll_once().rows]

            want: list[int] = []
            current: set[int] = set()
            for page in range(1, MP + 2):
                events = served[(page - 1) * PP : page * PP]
                for ev_id in events:
                    if ev_id in current:
                        continue
                    current.add(ev_id)
                    if ev_id in latest:
                        continue
                    want.append(ev_id)
                if len(want) < PP * page:
                    break
                if len(events) < PP:
                    break
            if current:
                latest = set(current)

            assert got == want, (served, got, want)

    run()
