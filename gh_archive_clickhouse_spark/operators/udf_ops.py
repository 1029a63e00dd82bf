"""The Python-UDF surface of the engine (SURVEY.md §2.4 last bullet):
pandas grouped-agg UDAF, ``applyInPandas`` grouped-map, and a Python
UDTF — each demonstrated on a deterministic, oracle-checkable shape.

UDFs are the engine's slow path by design (everything else in
``operators/`` is JVM-side); these exist for semantics Spark cannot
express natively — arbitrary per-group numpy/pandas logic — and they
follow the fast variants of that slow path: Arrow-batched pandas UDFs
and an Arrow-enabled UDTF, never row-at-a-time Python in a hot loop.

Determinism notes (the oracle hash-compares exact values):

- quantiles sort within the group first, so partition/arrival order
  cannot change the result (unlike a float sum, whose rounding depends
  on accumulation order);
- the grouped-map kernel emits integer ranks from a total order;
- the UDTF emits values computed per-row only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from gh_archive_clickhouse_spark.functions.text import tokens


@pandas_udf(DoubleType())
def _p25(v: pd.Series) -> float:  # pragma: no cover - executor-side
    return float(v.quantile(0.25))


@pandas_udf(DoubleType())
def _p50(v: pd.Series) -> float:  # pragma: no cover - executor-side
    return float(v.quantile(0.50))


@pandas_udf(DoubleType())
def _p75(v: pd.Series) -> float:  # pragma: no cover - executor-side
    return float(v.quantile(0.75))


def token_quantiles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language token-count quantiles via pandas grouped-agg UDAFs.

    ``pd.Series.quantile`` uses linear interpolation — the same formula
    as ANSI ``percentile_cont`` — so a SQL oracle reproduces it
    exactly. The physical plan is a normal hash aggregate with
    map-side partials... replaced by Arrow-batched group transfer:
    at scale the shuffle carries (lang, n_tokens) pairs only.
    """
    counted = docs.select(
        F.col("lang"), F.size(tokens(F.col(text_col))).alias("n_tokens")
    )
    g = counted.groupBy("lang")
    return g.agg(
        F.round(_p25(F.col("n_tokens")), 6).alias("p25_tokens"),
        F.round(_p50(F.col("n_tokens")), 6).alias("p50_tokens"),
        F.round(_p75(F.col("n_tokens")), 6).alias("p75_tokens"),
    )


def user_event_ranks(events: DataFrame, user_mod: int | None = None) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-user ordinal event ranks.

    Each user's events arrive as one pandas DataFrame; the kernel
    sorts by (ts, event_id, value) — a total order, so ranks are
    deterministic — and emits integer ranks. Equivalent to a window
    ``row_number``; implemented as grouped-map to exercise the
    arbitrary-python-per-group path with an exact oracle. Scale note:
    one shuffle on user_id, group-at-a-time Arrow transfer; a group
    must fit in one python worker's memory (true for per-user event
    histories; NOT for power-law keys — those need salting first).
    """

    def _rank(pdf: pd.DataFrame) -> pd.DataFrame:  # pragma: no cover
        pdf = pdf.sort_values(["ts", "event_id", "value"], kind="mergesort")
        pdf = pdf.reset_index(drop=True)
        pdf["user_rank"] = pdf.index + 1
        return pdf[["user_id", "event_id", "ts", "value", "user_rank"]]

    out_schema = (
        "user_id bigint, event_id bigint, ts timestamp, "
        "value double, user_rank bigint"
    )
    src = events
    if user_mod is not None:
        src = src.filter(F.col("user_id") % user_mod == 0)
    return (
        src.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_rank, schema=out_schema)
    )


@udtf(returnType="pos int, bigram string")
class BigramUDTF:  # pragma: no cover - executor-side
    """Python UDTF: word bigrams of a text, with 1-based positions."""

    def eval(self, text: str):
        words = [w for w in (text or "").split(" ") if w != ""]
        for i in range(len(words) - 1):
            yield i + 1, words[i] + " " + words[i + 1]


def doc_bigrams(docs: DataFrame, every_nth: int = 50) -> DataFrame:
    """Lateral-join the bigram UDTF against a document sample.

    UDTFs are the engine's table-function extension point (Spark 4
    Python UDTF, Arrow-batched). The sample keeps declared-query
    output bounded; the operator itself streams arbitrary volume.
    """
    spark = docs.sparkSession
    spark.udtf.register("doc_bigrams_udtf", BigramUDTF)
    sample = docs.filter(F.col("doc_id") % every_nth == 0)
    sample.createOrReplaceTempView("__bigram_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.bigram
        FROM __bigram_docs d, LATERAL doc_bigrams_udtf(d.text) t
        """
    )
