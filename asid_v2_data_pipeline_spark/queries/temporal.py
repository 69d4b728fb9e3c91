"""Temporal / windowed queries over the events table (SURVEY.md §2.10 +
phase-4 streaming surface).  The window functions here are the *batch*
form of the streaming ops in ``streaming.ingest`` (Spark's ``window()`` /
``session_window()`` work identically in both modes), so the DuckDB oracle
checks the same semantics the streaming jobs use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.strings import scene_id, scene_timestamp
from ..operators.filters import day_of_year_filter
from ..schemas import load_table
from ..streaming.ingest import sessionize, sliding_event_avg, tumbling_event_counts


def _fmt(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def t_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    out = tumbling_event_counts(e, "1 hour")
    return out.select(
        _fmt("w_start").alias("w_start"),
        "event_type",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    ).orderBy("w_start", "event_type")


T_TUMBLING_SQL = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY w_start, event_type
"""


def t_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    out = sliding_event_avg(e, "1 hour", "30 minutes")
    return out.select(
        _fmt("w_start").alias("w_start"),
        F.round("avg_value", 6).alias("avg_value"),
        "n_events",
    ).orderBy("w_start")


T_SLIDING_SQL = """
WITH panes AS (
  SELECT value,
         time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS w_start
  FROM events, (VALUES (0), (1)) AS offs(k)
)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
       ROUND(AVG(value), 6) AS avg_value,
       COUNT(*) AS n_events
FROM panes
GROUP BY 1
ORDER BY w_start
"""


def t_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap) per user — Spark's session_window vs
    the classic gaps-and-islands SQL."""
    e = load_table(spark, sf_dir, "events")
    out = sessionize(e, "30 minutes")
    return out.select(
        _fmt("session_start").alias("session_start"),
        "user_id",
        "n_events",
    ).orderBy("user_id", "session_start")


T_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), islands AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS session_no
  FROM marked
)
SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       user_id,
       COUNT(*) AS n_events
FROM islands
GROUP BY user_id, session_no
ORDER BY user_id, session_start
"""


def f6_day_of_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/C10 — the reference's 0-based day-of-year selection
    (train_model.py:69-81, off-by-one pinned)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(day_of_year_filter(F.col("ts"), 5, 15))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("event_type")
    )


F6_SQL = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events
WHERE (dayofyear(ts) - 1) BETWEEN 5 AND 15
GROUP BY event_type
ORDER BY event_type
"""


def c9_scene_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5/C9 — scene-id parse + timestamp round-trip: format events ts as
    a reference-style filename, parse it back with the engine functions."""
    e = load_table(spark, sf_dir, "events")
    named = e.select(
        F.concat(
            F.date_format("ts", "yyyyMMdd'T'HHmmss"), F.lit("_S1B_AMSR2.nc")
        ).alias("name")
    )
    parsed = named.select(
        scene_id(F.col("name")).alias("scene"),
        _fmt(scene_timestamp(F.col("name"))).alias("scene_ts"),
    )
    return (
        parsed.select(F.substring("scene", 1, 8).alias("scene_date"), "scene_ts")
        .groupBy("scene_date")
        .agg(F.count(F.lit(1)).alias("n"), F.min("scene_ts").alias("first_ts"))
        .orderBy("scene_date")
    )


C9_SQL = """
WITH named AS (
  SELECT strftime(ts, '%Y%m%dT%H%M%S') || '_S1B_AMSR2.nc' AS name FROM events
), parsed AS (
  SELECT str_split(name, '_')[1] AS scene,
         strftime(strptime(str_split(name, '_')[1], '%Y%m%dT%H%M%S'),
                  '%Y-%m-%d %H:%M:%S') AS scene_ts
  FROM named
)
SELECT substr(scene, 1, 8) AS scene_date, COUNT(*) AS n, MIN(scene_ts) AS first_ts
FROM parsed
GROUP BY 1
ORDER BY scene_date
"""


def t_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution as-of join: every purchase matched to the same user's
    latest at-or-before click (union-window plan — one exchange on
    user_id, no range join; see operators/asof.py)."""
    from ..operators.asof import asof_join_backward

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join_backward(
        purchases, clicks, ["user_id"], "ts", ["event_id", "ts"], "event_id"
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("value"),
        F.col("asof_event_id").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("us_since_click"),
    ).orderBy("event_id")


# DuckDB has ASOF JOIN natively — a genuinely independent second
# implementation of the operator's semantics (inclusive backward match).
# Clicks are pre-deduped per (user, ts) by greatest event_id exactly as
# the engine does, so equal-timestamp ties are deterministic.
T_ASOF_SQL = """
WITH clicks AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'click'
  ) WHERE rn = 1
), purch AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, ROUND(p.value, 4) AS value,
       c.event_id AS click_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS us_since_click
FROM purch p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


def t_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: each signup matched (forward as-of) to the user's FIRST
    at-or-after purchase; microsecond-exact time-to-convert."""
    from ..operators.asof import asof_join_forward

    e = load_table(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join_forward(
        signups, purchases, ["user_id"], "ts", ["event_id", "ts"], "event_id"
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("purchase_id"),
        (F.unix_micros("asof_ts") - F.unix_micros("ts")).alias("us_to_convert"),
    ).orderBy("event_id")


# plain-SQL second implementation: per-signup rank over qualifying
# purchases (smallest ts >= signup ts, tie -> smallest event_id)
T_FUNNEL_SQL = """
WITH s AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
), p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), ranked AS (
  SELECT s.event_id, s.user_id, p.event_id AS purchase_id,
         epoch_us(p.ts) - epoch_us(s.ts) AS us_to_convert,
         row_number() OVER (PARTITION BY s.event_id
                            ORDER BY p.ts, p.event_id) AS rn
  FROM s JOIN p ON s.user_id = p.user_id AND p.ts >= s.ts
)
SELECT s.event_id, s.user_id, r.purchase_id,
       CAST(r.us_to_convert AS BIGINT) AS us_to_convert
FROM s LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
  ON s.event_id = r.event_id
ORDER BY s.event_id
"""


def t_rolling_user_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row rolling aggregate: each event's trailing-1-hour average
    value for its user (RANGE interval window — the per-row sibling of
    the tumbling/sliding aggs; one exchange on user_id)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.round(F.avg("value").over(w), 6).alias("rolling_avg"),
            F.count(F.lit(1)).over(w).alias("n_window"),
        )
        .orderBy("event_id")
    )


T_ROLLING_SQL = """
SELECT event_id, user_id,
       ROUND(AVG(value) OVER w, 6) AS rolling_avg,
       COUNT(*) OVER w AS n_window
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def t_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users grouped by first-activity week
    (cohort), counted in each subsequent activity week — two
    aggregations and a broadcastable first-week join; integer week
    arithmetic identical in both engines."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first = e.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    act = e.distinct().join(first, "user_id")
    return (
        act.groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff("wk", "cohort") / 7).cast("int").alias("week_idx"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_idx")
    )


T_RETENTION_SQL = """
WITH e AS (
  SELECT user_id, date_trunc('week', ts) AS wk FROM events
), f AS (
  SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id
), a AS (
  SELECT DISTINCT e.user_id, e.wk, f.cohort FROM e JOIN f USING (user_id)
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cohort, wk) // 7 AS INT) AS week_idx,
       COUNT(DISTINCT user_id) AS n_users
FROM a GROUP BY 1, 2 ORDER BY cohort_week, week_idx
"""


def t_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (the Markov matrix of a
    clickstream): ``lead`` over (user, ts) then a pair count — the
    lag/lead window surface.  One hash exchange on user_id for the
    window, one for the pair aggregate."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "next_type")
    )


T_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type, next_type, COUNT(*) AS n
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY event_type, next_type
"""


def t_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP ROLLUP over (event_type, day): detail rows + per-type
    subtotals + grand total in ONE pass (Catalyst's Expand operator —
    each input row fans out to its grouping sets before the single
    aggregate; no re-scan per level).  ``grouping_id`` disambiguates
    levels: 0 = detail, 1 = per-type subtotal, 3 = grand total."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    return (
        e.select("event_type", day.alias("d"), "value")
        .rollup("event_type", "d")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("gid", "event_type", "d")
    )


_ROLLUP_DAY = "strftime(date_trunc('day', ts), '%Y-%m-%d')"
T_ROLLUP_SQL = f"""
SELECT event_type, {_ROLLUP_DAY} AS d,
       CAST(GROUPING(event_type) * 2 + GROUPING({_ROLLUP_DAY}) AS INT) AS gid,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY ROLLUP (event_type, {_ROLLUP_DAY})
ORDER BY gid, event_type, d
"""


# ranking-window family (ntile / percent_rank): per-type value deciles.
# The tie-break on (value, event_id) makes both functions deterministic;
# identical SQL runs in both engines.
T_DECILES_SQL = """
WITH ranked AS (
  SELECT event_type, value,
         ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile,
         percent_rank() OVER (PARTITION BY event_type ORDER BY value, event_id) AS pr
  FROM events
)
SELECT event_type, decile, COUNT(*) AS n,
       ROUND(MIN(value), 4) AS lo, ROUND(MAX(value), 4) AS hi,
       ROUND(MAX(pr), 6) AS max_pr
FROM ranked GROUP BY event_type, decile
ORDER BY event_type, decile
"""


def t_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(10) + percent_rank per event type — the ranking-window
    surface (one hash exchange on event_type, per-type sort)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(T_DECILES_SQL)



def t_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers: events whose value deviates more than
    2.5σ from their event type's mean — the monitoring query every
    event pipeline runs.

    Broadcast-stats form (VERDICT r5 task 2): the per-type mean/σ are a
    tiny partial-aggregated table (one row per event type), broadcast
    back onto the stream — no ``Window.partitionBy(event_type)``, which
    would concentrate a hot event type's entire row set in one task at
    100 TB.  The scoring pass itself is embarrassingly parallel.

    σ = 0 guard (ADVICE r5): a type whose values are all equal (or a
    single event) has no outliers; without the guard z = 0/0 = NaN and
    NaN > 2.5 is TRUE in both engines' ordering, emitting every row of
    a constant stream as an "anomaly"."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("_mu"),
        F.stddev_pop("value").alias("_sd"),
    )
    z = (F.col("value") - F.col("_mu")) / F.col("_sd")
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter((F.col("_sd") > 0) & (F.abs(z) > 2.5))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(z, 6).alias("z"),
        )
        .orderBy("event_id")
    )


T_ZSCORE_SQL = """
WITH stats AS (
  SELECT event_type, AVG(value) AS mu, STDDEV_POP(value) AS sd
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, ROUND(e.value, 6) AS value,
       ROUND((e.value - s.mu) / s.sd, 6) AS z
FROM events e JOIN stats s USING (event_type)
WHERE s.sd > 0 AND ABS((e.value - s.mu) / s.sd) > 2.5
ORDER BY e.event_id
"""


def t_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded interval-containment join: every click landing inside a
    same-user "view" interval ``[ts, ts + floor(value)*600 seconds]``
    (scaled so intervals span hours–days; day-width buckets give a
    bounded fan-out of <= 4 replicas per interval).

    Spark plans a bare range predicate as a nested-loop join; the banded
    operator (operators/rangejoin.py) turns it into an ordinary shuffled
    equi-join on (user_id, time-bucket) — the oracle is the bare
    inequality join, so the hash match proves banding loses/dupes
    nothing."""
    from ..operators.rangejoin import interval_point_join

    e = load_table(spark, sf_dir, "events")
    iv = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.unix_micros("ts").alias("s_us"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value")).cast("long") * 600 * 1000000
        ).alias("e_us"),
    )
    pt = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("point_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    joined = interval_point_join(
        iv, pt, ["user_id"], "s_us", "e_us", "p_us",
        bucket_width=86_400_000_000
    )
    return (
        joined.groupBy("interval_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("point_id").alias("first_hit"),
        )
        .orderBy("interval_id")
    )


T_INTERVAL_SQL = """
WITH iv AS (
  SELECT event_id AS interval_id, user_id,
         epoch_us(ts) AS s_us,
         epoch_us(ts) + CAST(FLOOR(value) AS BIGINT) * 600 * 1000000 AS e_us
  FROM events WHERE event_type = 'view'
), pt AS (
  SELECT event_id AS point_id, user_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'click'
)
SELECT iv.interval_id, COUNT(*) AS n_hits, MIN(pt.point_id) AS first_hit
FROM iv JOIN pt
  ON iv.user_id = pt.user_id AND pt.p_us BETWEEN iv.s_us AND iv.e_us
GROUP BY iv.interval_id ORDER BY iv.interval_id
"""


def t_cube_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP CUBE over (event_type, hour-of-day): all four grouping sets —
    detail, each one-dimension marginal (the sets ROLLUP cannot express),
    and the grand total — in ONE pass through Catalyst's Expand operator;
    the scan is read once, each row fans out to its four grouping-set
    copies before a single hash aggregate."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_type", F.hour("ts").alias("h"), "value")
        .cube("event_type", "h")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("gid", "event_type", "h")
    )


T_CUBE_SQL = """
SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS h,
       CAST(GROUPING(event_type) * 2 + GROUPING(EXTRACT(hour FROM ts)) AS INT) AS gid,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value,
       ROUND(AVG(value), 6) AS avg_value
FROM events
GROUP BY CUBE (event_type, EXTRACT(hour FROM ts))
ORDER BY gid, event_type, h
"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def t_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational PIVOT: one row per day, one value-sum column per event
    type.  The type list is passed explicitly — with it, Spark skips the
    extra distinct-scan it otherwise runs to discover the columns, and
    the plan is a single groupBy with conditional aggregates (exactly the
    CASE-WHEN form the oracle spells out)."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    piv = (
        e.select(day.alias("d"), "event_type", "value")
        .groupBy("d")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.round(F.sum("value"), 4))
    )
    return piv.orderBy("d")


T_PIVOT_SQL = (
    "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,\n"
    + ",\n".join(
        f"       ROUND(SUM(CASE WHEN event_type = '{t}' THEN value END), 4) AS {t}"
        for t in _EVENT_TYPES
    )
    + "\nFROM events GROUP BY d ORDER BY d"
)


def t_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap filling: hourly buckets per event
    type over each type's own [min, max] range, empty hours materialized
    with n=0, plus last-observation-carried-forward of the hourly sum.

    Plan shape: one grouped aggregate builds the observed buckets; the
    per-type spine is a metadata-size range aggregate exploded through
    ``sequence`` (narrow — one row per type fans out to its hours, no
    driver loop); the fill join is per-type equi-join; LOCF is a
    partitioned running window.  Nothing global, nothing single-
    partition."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"), "value")
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("value").alias("_sv"))
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("_mn"), F.max("h").alias("_mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("_mn", "_mx", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    filled = spine.join(hourly, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm").alias("hour"),
        F.coalesce("_n", F.lit(0)).cast("long").alias("n"),
        F.round(F.coalesce("_sv", F.lit(0.0)), 4).alias("sum_value"),
        F.round(F.last("_sv", ignorenulls=True).over(w), 4).alias("locf_sum"),
    ).orderBy("event_type", "hour")


T_GAPFILL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         COUNT(*) AS n, SUM(value) AS sv
  FROM events GROUP BY 1, 2
), rng AS (
  SELECT event_type, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
  FROM rng
)
SELECT s.event_type,
       strftime(s.h, '%Y-%m-%d %H:%M') AS hour,
       CAST(COALESCE(hourly.n, 0) AS BIGINT) AS n,
       ROUND(COALESCE(hourly.sv, 0.0), 4) AS sum_value,
       ROUND(last_value(hourly.sv IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS locf_sum
FROM spine s LEFT JOIN hourly ON s.event_type = hourly.event_type AND s.h = hourly.h
ORDER BY s.event_type, hour
"""


REGISTRY = {
    "t_asof_attribution": (t_asof_attribution, T_ASOF_SQL),
    "t_cube_hourly": (t_cube_hourly, T_CUBE_SQL),
    "t_pivot_daily": (t_pivot_daily, T_PIVOT_SQL),
    "t_gapfill_hourly": (t_gapfill_hourly, T_GAPFILL_SQL),
    "t_interval_join": (t_interval_join, T_INTERVAL_SQL),
    "t_event_transitions": (t_event_transitions, T_TRANSITIONS_SQL),
    "t_rollup_daily": (t_rollup_daily, T_ROLLUP_SQL),
    "t_value_deciles": (t_value_deciles, T_DECILES_SQL),
    "t_anomaly_zscore": (t_anomaly_zscore, T_ZSCORE_SQL),
    "t_funnel_conversion": (t_funnel_conversion, T_FUNNEL_SQL),
    "t_rolling_user_avg": (t_rolling_user_avg, T_ROLLING_SQL),
    "t_retention_cohorts": (t_retention_cohorts, T_RETENTION_SQL),
    "t_tumbling_window": (t_tumbling_window, T_TUMBLING_SQL),
    "t_sliding_window": (t_sliding_window, T_SLIDING_SQL),
    "t_session_window": (t_session_window, T_SESSION_SQL),
    "f6_day_of_year": (f6_day_of_year, F6_SQL),
    "c9_scene_timestamp_roundtrip": (c9_scene_timestamp_roundtrip, C9_SQL),
}
