"""checkpoints.release_checkpoint degradation contract — pure-Python
fakes, no Spark: the two failure causes (handle unreachable vs
unpersist refused) each get their own once-per-process warning, so a
transient unpersist hiccup cannot spend the API-capability slot (the
r11 review finding). The happy path is covered with a real session in
tests/test_operators.py::test_release_checkpoint_frees_blocks.
"""

from __future__ import annotations

import warnings

import pytest

from gh_archive_clickhouse_spark import checkpoints


class _RefusingHandle:
    def unpersist(self, blocking):
        raise RuntimeError("boom")


class _FakeQE:
    def __init__(self, handle):
        self._h = handle

    def queryExecution(self):
        return self

    def analyzed(self):
        return self

    def rdd(self):
        return self._h


class _FakeDf:
    """Shaped like a DataFrame down the _jdf.queryExecution() chain."""

    def __init__(self, handle):
        self._jdf = _FakeQE(handle)


@pytest.fixture(autouse=True)
def _fresh_warning_slots(monkeypatch):
    monkeypatch.setattr(checkpoints, "_WARNED_CAUSES", set())


def test_handle_unreachable_returns_none_and_false():
    assert checkpoints.checkpoint_rdd_handle(object()) is None
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert checkpoints.release_checkpoint(object()) is False
    assert len(w) == 1 and "not reachable" in str(w[0].message)


def test_unpersist_failure_warns_its_own_cause_not_the_api_gap():
    df = _FakeDf(_RefusingHandle())
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert checkpoints.release_checkpoint(df) is False
    assert len(w) == 1 and "unpersist failed" in str(w[0].message)
    assert "not reachable" not in str(w[0].message)


def test_each_cause_warns_once_and_slots_are_independent():
    df = _FakeDf(_RefusingHandle())
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        checkpoints.release_checkpoint(df)      # unpersist cause
        checkpoints.release_checkpoint(df)      # silent repeat
        checkpoints.release_checkpoint(object())  # handle cause: new slot
        checkpoints.release_checkpoint(object())  # silent repeat
    messages = [str(x.message) for x in w]
    assert len(messages) == 2
    assert any("unpersist failed" in m for m in messages)
    assert any("not reachable" in m for m in messages)


def test_successful_release_reports_true_and_never_warns():
    class _Handle:
        def __init__(self):
            self.calls = []

        def unpersist(self, blocking):
            self.calls.append(blocking)

    h = _Handle()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert checkpoints.release_checkpoint(_FakeDf(h)) is True
    assert h.calls == [False] and w == []
