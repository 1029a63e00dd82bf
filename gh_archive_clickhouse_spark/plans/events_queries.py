"""Qe1–Qe7: the event-stream query surface (SURVEY.md §2.5).

These reproduce, over the driver's ``events`` fixture, the semantics
the reference's DDL contracts to ClickHouse (dedup view D1, daily
rollup D2, TTL D4 — /root/reference/README.md:9-17) plus the
JSON-projection path the Go parser implements row-wise
(internal/gh/gh.go:92-125 → here a codegen'd get_json_object).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gh_archive_clickhouse_spark.operators.dedup import latest_by_key_agg
from gh_archive_clickhouse_spark.operators.sessionize import (
    funnel_levels,
    sessionize,
)
from gh_archive_clickhouse_spark.plans.common import (
    Query,
    dec_avg,
    dec_sum,
    read,
    ts_fmt,
)

# Deterministic "last wins" total order for the ReplacingMergeTree-style
# dedup view: newest ts first, then value/user/type/props tie-breakers.
_DEDUP_ORDER_SQL = (
    "ts DESC, value DESC, user_id DESC, event_type DESC, props DESC"
)


def qe1_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read(spark, sf_dir, "events")
    deduped = latest_by_key_agg(
        ev,
        keys=["event_id"],
        order_cols=["ts", "value", "user_id", "event_type", "props"],
        payload_cols=["ts", "user_id", "event_type", "value"],
    )
    return deduped.select(
        "event_id",
        ts_fmt("ts").alias("ts_s"),
        "user_id",
        "event_type",
        "value",
    )


def qe2_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyyMMdd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def qe3_json_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id", k.alias("k"), "event_type"
    ).filter(F.col("k") > 50)


def qe4_hourly_type_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    return (
        ev.groupBy(hour.alias("hour_s"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_avg("value").alias("avg_value"),
            dec_sum("value").alias("sum_value"),
        )
    )


def qe5_ttl_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("__mx"))
    cutoff = F.col("__mx") - F.expr("INTERVAL 3 DAYS")
    return (
        ev.crossJoin(F.broadcast(mx))
        .agg(
            F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0)).alias(
                "n_survivors"
            ),
            F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0)).alias(
                "n_expired"
            ),
        )
    )


def qe6_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(10)
    )


def qe7_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read(spark, sf_dir, "events")
    return sessionize(ev, gap_minutes=30)


def qe11_json_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON function battery over the props column: typed from_json
    (schema-on-read, the raw-table pattern of SURVEY §1.2), string
    extraction, existence predicate, and to_json round-trip."""
    ev = read(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return (
        ev.select(
            "event_id",
            parsed.getField("k").alias("k_typed"),
            F.get_json_object("props", "$.k").alias("k_str"),
            parsed.getField("k").isNotNull().alias("has_k"),
            F.to_json(F.struct(parsed.getField("k").alias("k"))).alias(
                "roundtrip"
            ),
        )
        .filter(F.col("k_typed") % 3 == 0)
    )


def qe10_salted_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe totals over event_type — 5 distinct keys, the shape
    where a plain groupBy leaves 5 hot reducers at cluster scale."""
    from gh_archive_clickhouse_spark.operators.skew import salted_totals

    ev = read(spark, sf_dir, "events")
    return salted_totals(ev, key="event_type", value_col="value")



def qe12_variant_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT schema-on-read over the raw JSON column:
    ``parse_json`` once into a variant, typed extraction with
    ``try_variant_get``, then aggregate — the modern engine-native form
    of the reference's "store raw JSON, project at query time"
    contract (P1/D1 posture: internal/gh/gh.go:92-125 parses only the
    fields it needs). Variant's binary encoding makes repeated typed
    extractions cheaper than per-query string re-parsing at scale."""
    ev = read(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    staged = ev.select(
        F.try_variant_get(v, "$.k", "int").alias("k"), F.col("value")
    )
    return staged.groupBy((F.col("k") % 10).alias("k_mod")).agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value").alias("sum_value"),
        dec_avg("value").alias("avg_value"),
    )


def qe13_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel analog: per-user greedy view->click->purchase
    funnel within 3 days; histogram of levels reached
    (operators/sessionize.funnel_levels)."""
    ev = read(spark, sf_dir, "events")
    return funnel_levels(
        ev, ["view", "click", "purchase"], window_seconds=3 * 86400
    )


def qe14_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their
    first 'signup' event; for each (cohort week, weeks since), the
    number of distinct cohort members active that week.

    Shape: per-user min-aggregate for the cohort anchor (one shuffle on
    user_id), equi-joined back to the distinct weekly-activity table on
    user_id, then one count-distinct aggregate on the (cohort, offset)
    pair — no self-joins, no windows over the fact. The join carries NO
    broadcast hint: the cohort table is one row per signed-up user —
    O(users), unbounded at corpus scale — so forcing a broadcast would
    OOM the executors at 100 TB. AQE picks broadcast at runtime when
    the anchor side is actually small (it is at fixture scale) and
    falls back to a shuffled join when it isn't.
    """
    ev = read(spark, sf_dir, "events")
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    acts = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    joined = acts.join(cohorts, "user_id").filter(
        F.col("act_week") >= F.col("cohort_week")
    )
    weeks_since = (
        (
            F.unix_micros(F.col("act_week"))
            - F.unix_micros(F.col("cohort_week"))
        )
        / F.lit(7 * 86400 * 1_000_000)
    ).cast("int")
    return (
        joined.select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_w"),
            weeks_since.alias("weeks_since"),
            "user_id",
        )
        .groupBy("cohort_w", "weeks_since")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


def qe15_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly ANOMALY detection per event type — the monitoring query
    behind every ingestion dashboard: z-score each hour's count
    against its type's series mean/stddev and flag |z| >= 3.

    Engine-parity design: the statistics derive from EXACT integer
    sums (sum n, sum n² as longs — counts are integers, so the moment
    sums are order-independent), then ONE double division/sqrt per
    type — both engines compute identical IEEE doubles, unlike
    stddev_samp whose partial-merge order varies. Scale shape: the
    series is already aggregated (tiny); stats are a per-type
    aggregate broadcast-joined back.
    """
    from gh_archive_clickhouse_spark.plans.common import materialize

    ev = read(spark, sf_dir, "events")
    # Materialized: `hourly` feeds both the stats aggregate and the
    # join-back — un-checkpointed, the full events scan+aggregation
    # would plan twice.
    hourly = materialize(
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")),
        "qe15_hourly",
    )
    stats = hourly.groupBy("event_type").agg(
        F.sum("n").alias("__s"),
        F.sum(F.col("n") * F.col("n")).alias("__ss"),
        F.count(F.lit(1)).alias("__c"),
    )
    mean = F.col("__s") / F.col("__c").cast("double")
    var = (
        F.col("__ss") - F.col("__s") * F.col("__s") / F.col("__c").cast("double")
    ) / (F.col("__c") - 1).cast("double")
    z = F.when(
        (F.col("__c") > 1) & (F.sqrt(var) > 0),
        F.round((F.col("n") - mean) / F.sqrt(var), 6),
    )
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .select(
            ts_fmt("hour_start").alias("hour_s"),
            "event_type",
            "n",
            z.alias("z"),
            (F.abs(F.coalesce(z, F.lit(0.0))) >= 3.0).alias("is_anomaly"),
        )
    )


_ORACLE_QE15 = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour_start, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS s,
         CAST(sum(n * n) AS BIGINT) AS ss,
         count(*) AS c
  FROM hourly GROUP BY event_type
)
SELECT strftime(h.hour_start, '%Y-%m-%d %H:%M:%S.%f') AS hour_s,
       h.event_type, h.n,
       CASE WHEN st.c > 1 AND
            sqrt((st.ss - st.s * st.s / CAST(st.c AS DOUBLE))
                 / CAST(st.c - 1 AS DOUBLE)) > 0
       THEN round((h.n - st.s / CAST(st.c AS DOUBLE))
            / sqrt((st.ss - st.s * st.s / CAST(st.c AS DOUBLE))
                   / CAST(st.c - 1 AS DOUBLE)), 6)
       END AS z,
       (abs(COALESCE(CASE WHEN st.c > 1 AND
            sqrt((st.ss - st.s * st.s / CAST(st.c AS DOUBLE))
                 / CAST(st.c - 1 AS DOUBLE)) > 0
       THEN round((h.n - st.s / CAST(st.c AS DOUBLE))
            / sqrt((st.ss - st.s * st.s / CAST(st.c AS DOUBLE))
                   / CAST(st.c - 1 AS DOUBLE)), 6)
       END, 0.0)) >= 3.0) AS is_anomaly
FROM hourly h JOIN stats st USING (event_type)
"""


QUERIES = [
    Query(
        "qe11_json_battery",
        "JSON battery: from_json, get_json_object, existence, to_json",
        qe11_json_battery,
        """
        SELECT event_id,
               json_extract(props, '$.k')::INTEGER AS k_typed,
               json_extract_string(props, '$.k') AS k_str,
               json_extract(props, '$.k') IS NOT NULL AS has_k,
               to_json({'k': json_extract(props, '$.k')::INTEGER}) AS roundtrip
        FROM events
        WHERE json_extract(props, '$.k')::INTEGER % 3 = 0
        """,
        tags=("events", "json"),
    ),
    Query(
        "qe10_salted_type_totals",
        "salted two-stage aggregation over a 5-key (skewed) group key",
        qe10_salted_type_totals,
        """
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type
        """,
        tags=("events", "skew"),
    ),
    Query(
        "qe1_dedup_latest",
        "ReplacingMergeTree read semantics (D1): one row per event_id, "
        "newest wins under a deterministic total order",
        qe1_dedup_latest,
        f"""
        SELECT event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
               user_id, event_type, value
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY event_id ORDER BY {_DEDUP_ORDER_SQL}) AS rn
          FROM events
        ) WHERE rn = 1
        """,
        tags=("events", "dedup", "window"),
    ),
    Query(
        "qe2_daily_rollup",
        "daily partition rollup (D2): count/distinct-users/sum per day",
        qe2_daily_rollup,
        """
        SELECT strftime(ts, '%Y%m%d') AS day,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1
        """,
        tags=("events", "agg"),
    ),
    Query(
        "qe3_json_projection",
        "schema-on-read JSON projection (P1): extract props.k, filter",
        qe3_json_projection,
        """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               event_type
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
        """,
        tags=("events", "json"),
    ),
    Query(
        "qe4_hourly_type_series",
        "tumbling 1h time series per event_type",
        qe4_hourly_type_series,
        """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / count(value) AS avg_value,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS sum_value
        FROM events GROUP BY 1, 2
        """,
        tags=("events", "agg", "timeseries"),
    ),
    Query(
        "qe5_ttl_survivors",
        "TTL simulation (D4): rows surviving a 3-day event-time TTL "
        "anchored at max(ts)",
        qe5_ttl_survivors,
        """
        SELECT CAST(sum(CASE WHEN ts >= mx - INTERVAL 3 DAY THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_survivors,
               CAST(sum(CASE WHEN ts <  mx - INTERVAL 3 DAY THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_expired
        FROM events, (SELECT max(ts) AS mx FROM events)
        """,
        tags=("events", "ttl"),
    ),
    Query(
        "qe6_topk_users",
        "top-10 most active users (sort/limit with deterministic ties)",
        qe6_topk_users,
        """
        SELECT user_id, count(*) AS n
        FROM events GROUP BY user_id
        ORDER BY n DESC, user_id ASC LIMIT 10
        """,
        tags=("events", "topk"),
    ),
    Query(
        "qe7_sessionization",
        "gap-based sessionization (30 min) — batch analog of streaming "
        "session windows",
        qe7_sessionization,
        """
        WITH ordered AS (
          SELECT user_id, event_id, ts, epoch_us(ts) AS us,
                 lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
          FROM events
        ), flagged AS (
          SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                         THEN 1 ELSE 0 END AS new_sess
          FROM ordered
        ), sess AS (
          SELECT *, CAST(sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM flagged
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               max(us) - min(us) AS duration_us,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_s
        FROM sess GROUP BY user_id, session_id
        """,
        tags=("events", "session", "window"),
    ),
    Query(
        "qe12_variant_projection",
        "VARIANT schema-on-read: parse_json + typed variant_get + agg",
        qe12_variant_projection,
        """
        SELECT CAST(props::JSON->>'k' AS INTEGER) % 10 AS k_mod,
               count(*) AS n,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS sum_value,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / count(value) AS avg_value
        FROM events
        GROUP BY k_mod
        """,
        tags=("events", "json", "variant"),
    ),
    Query(
        "qe13_funnel",
        "windowFunnel analog: greedy view->click->purchase levels",
        qe13_funnel,
        """
        WITH s1 AS (
          SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        ), w1 AS (
          SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
                      OVER (PARTITION BY user_id) AS t1
          FROM s1
        ), w2 AS (
          SELECT *, min(CASE WHEN event_type = 'click' AND us >= t1
                             THEN us END)
                      OVER (PARTITION BY user_id) AS t2
          FROM w1
        ), w3 AS (
          SELECT *, min(CASE WHEN event_type = 'purchase' AND us >= t2
                             THEN us END)
                      OVER (PARTITION BY user_id) AS t3
          FROM w2
        ), lv AS (
          SELECT user_id, max(CASE
            WHEN t3 IS NOT NULL AND t3 - t1 <= 259200000000
                 AND t2 IS NOT NULL AND t2 - t1 <= 259200000000 THEN 3
            WHEN t2 IS NOT NULL AND t2 - t1 <= 259200000000 THEN 2
            WHEN t1 IS NOT NULL THEN 1
            ELSE 0 END) AS level
          FROM w3 GROUP BY user_id
        )
        SELECT CAST(level AS INTEGER) AS level,
               count(*) AS n_users
        FROM lv GROUP BY level
        """,
        tags=("events", "funnel", "window"),
    ),
    Query(
        "qe14_cohort_retention",
        "weekly cohort retention matrix (signup-anchored)",
        qe14_cohort_retention,
        """
        WITH cohorts AS (
          SELECT user_id,
                 date_trunc('week', min(ts)) AS cohort_week
          FROM events WHERE event_type = 'signup' GROUP BY user_id
        ), acts AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
          FROM events
        )
        SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_w,
               CAST((epoch_us(a.act_week) - epoch_us(c.cohort_week))
                    / 604800000000 AS INTEGER) AS weeks_since,
               count(DISTINCT a.user_id) AS n_active
        FROM acts a JOIN cohorts c USING (user_id)
        WHERE a.act_week >= c.cohort_week
        GROUP BY 1, 2
        """,
        tags=("events", "agg", "cohort"),
    ),
    Query(
        "qe15_hourly_anomaly",
        "hourly per-type anomaly z-scores from integer-exact moment "
        "sums (|z| >= 3 flag)",
        qe15_hourly_anomaly,
        _ORACLE_QE15,
        tags=("events", "monitoring"),
    ),
]
