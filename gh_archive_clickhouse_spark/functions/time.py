"""Timestamp-type-agnostic time expressions.

Parquet files written without timezone annotation (``timestamp[us]``)
surface in Spark 4 as TIMESTAMP_NTZ, and ``F.unix_micros`` rejects NTZ
inputs outright.  With the session timezone pinned to UTC
(session.py), casting NTZ → TIMESTAMP_LTZ is a no-op reinterpretation,
so one helper gives identical epoch micros for both flavors — and
matches DuckDB's ``epoch_us`` on naive timestamps, which the oracle
comparisons rely on.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_micros(col: Column | str) -> Column:
    """Epoch microseconds from TIMESTAMP or TIMESTAMP_NTZ alike."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp_ltz"))
