"""Deterministic release of ``localCheckpoint`` block storage.

``df.localCheckpoint(eager=True)`` parks the frame's rows in the block
manager as a checkpointed RDD whose storage is reclaimed only when the
JVM ContextCleaner eventually notices the RDD become unreachable —
fine for a short-lived job, wrong for the two long-lived shapes this
engine runs:

* a RESIDENT QUERY SESSION re-invoking builders (bench, the driver's
  oracle gate) — handled by ``plans.common.snapshot_result``, which
  keys the previous result per query and releases it on re-invocation;
* a LONG-RUNNING INGEST STREAM whose epoch folds take one
  lineage-break checkpoint per fold for the stream's whole lifetime
  (``streaming.dedup_stream``: the major-fold rewrite and the
  cluster-label refresh) — those blocks are dead the moment the fold's
  overwrite commits, so they are released explicitly right there
  instead of accumulating between ContextCleaner GC cycles.

Both paths share this module's handle-fetch primitive. Leaf module by
design: it imports nothing from the package, so every layer (plans,
streaming, operators) can use it without cycles.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

# Warn-once per DISTINCT degradation cause: a transient unpersist
# failure must not spend the API-unreachable warning slot (or vice
# versa) — each misses for a different reason and each deserves its
# one visible report.
_WARNED_CAUSES: set[str] = set()


def checkpoint_rdd_handle(df: DataFrame):
    """The JVM handle of the checkpointed RDD backing an eagerly
    ``localCheckpoint``'ed frame (its analyzed plan is a LogicalRDD
    wrapping exactly that RDD), or ``None`` where the JVM internals
    aren't reachable (e.g. Spark Connect, where ``_jdf`` is absent).
    """
    try:
        return df._jdf.queryExecution().analyzed().rdd()
    except Exception:
        return None


def release_checkpoint(df: DataFrame) -> bool:
    """Free the block-manager storage behind an eager
    ``localCheckpoint`` NOW (non-blocking unpersist) instead of when
    the ContextCleaner gets around to it. Returns ``True`` when the
    blocks were handed to unpersist.

    The caller must be done with ``df``: any later action on the frame
    (or on a plan referencing it) fails with a missing-block error.
    The fold sites call this only after their overwrite committed —
    the next fold re-reads from disk, never from these blocks — or in
    a ``finally`` where a failed write is about to be recomputed from
    scratch by the stream's replay anyway.

    Degradation is VISIBLE (one RuntimeWarning per process per cause —
    handle-unreachable and unpersist-failed are distinct causes, so a
    transient unpersist hiccup cannot spend the API-capability
    warning's slot): on an API without the internal handle a
    long-lived stream would otherwise silently revert to cleaner-based
    accumulation, the exact behavior this function exists to remove.
    """
    handle = checkpoint_rdd_handle(df)
    if handle is None:
        _warn_once(
            "handle",
            "release_checkpoint: checkpointed-RDD handle not reachable "
            "on this Spark API; localCheckpoint blocks will accumulate "
            "until the JVM ContextCleaner reclaims them",
        )
        return False
    try:
        handle.unpersist(False)
        return True
    except Exception as ex:
        _warn_once(
            "unpersist",
            "release_checkpoint: unpersist failed "
            f"({type(ex).__name__}); this frame's localCheckpoint "
            "blocks are left to the JVM ContextCleaner",
        )
        return False


def _warn_once(cause: str, message: str) -> None:
    if cause in _WARNED_CAUSES:
        return
    _WARNED_CAUSES.add(cause)
    warnings.warn(message, RuntimeWarning, stacklevel=3)
