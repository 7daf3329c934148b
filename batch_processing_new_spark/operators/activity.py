"""User-activity analytics over event time: sliding-window distinct
counts (rolling WAU) and interval coalescing (gaps-and-islands over
validity intervals).

Both are everyday product-metric shapes with non-obvious distributed
forms:

- COUNT(DISTINCT) OVER a sliding RANGE window is not supported by
  Spark (or most engines) because distinct state can't slide. The
  scalable decomposition: collapse to the (user, day) activity grid
  first (one shuffle, tiny output), then FAN OUT each activity day to
  the <=7 window-days it contributes to — an in-row sequence(), no
  join — and count distinct users per window day. Shuffle volume is
  7x the activity grid, not 7x the event log.
- Interval coalescing (merge overlapping/adjacent validity intervals
  into episodes) is the gaps-and-islands pattern: a per-user window
  computes the running max of interval ends; a new episode starts
  exactly where the current start exceeds every previous end. One
  shuffle on user, sequential scan within partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table

_WAU_DAYS = 7
_HOLD_MIN = 30  # each event opens a 30-minute validity interval


@query(
    "q170_rolling_active_users",
    oracle=f"""
WITH act AS (
    SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS d FROM events
),
fan AS (
    SELECT a.user_id, a.d + g.i * INTERVAL 1 DAY AS wd
    FROM act a, generate_series(0, {_WAU_DAYS - 1}) g(i)
)
SELECT strftime(wd, '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS wau
FROM fan
WHERE wd::DATE IN (SELECT d FROM act)
GROUP BY wd
ORDER BY day
""",
)
def q170_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {_WAU_DAYS}-day active users per observed day (WAU):
    for each day, the number of distinct users active in [day-6, day].

    Decomposed for scale (see module doc): events collapse to the
    distinct (user, day) grid; each grid cell fans out IN-ROW to the
    window days it serves; count distinct per window day. The distinct
    and the fan-out both run on the grid (|users| x |active days|),
    never on raw events. Window days with no activity of their own are
    excluded (semi join against the observed-day set — broadcast, the
    day dimension is tiny at any scale).
    """
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    act = act.localCheckpoint(eager=False)  # grid feeds fan-out + spine
    fan = act.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), _WAU_DAYS - 1)
            )
        ).alias("day"),
    )
    days = act.select(F.col("d").alias("day")).distinct()
    return (
        fan.join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
        # dates stringify for the driver canonicalizer (pandas converts
        # DATE columns to midnight Timestamps asymmetrically between
        # engines — the q17/q124 date_format convention)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "wau"
        )
        .orderBy("day")
    )


@query(
    "q171_interval_coalesce",
    oracle=f"""
WITH iv AS (
    SELECT user_id, ts AS s, ts + INTERVAL {_HOLD_MIN} MINUTE AS e
    FROM events
),
flagged AS (
    SELECT user_id, s, e,
           CASE WHEN s > max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                OR max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                THEN 1 ELSE 0 END AS new_ep
    FROM iv
),
numbered AS (
    SELECT user_id, s, e,
           sum(new_ep) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ep
    FROM flagged
)
SELECT user_id, CAST(ep AS BIGINT) AS episode,
       min(s) AS episode_start,
       max(e) AS episode_end,
       count(*) AS n_intervals
FROM numbered
GROUP BY user_id, ep
ORDER BY user_id, episode
""",
)
def q171_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce each user's overlapping/adjacent {_HOLD_MIN}-minute
    event-validity intervals into maximal episodes (gaps-and-islands):
    per episode its span and how many intervals merged into it.

    The validity-interval maintenance primitive behind SCD2 compaction
    and session coverage. One shuffle (user), two sequential window
    passes within the partition; the running-max-of-ends comparison is
    what makes CONTAINED intervals (end earlier than a predecessor's)
    merge correctly — comparing against lag(e) alone does not.
    """
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {_HOLD_MIN} MINUTE")).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_ep",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), 1
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "ep",
        F.sum("new_ep").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", F.col("ep").alias("episode"))
        .agg(
            F.min("s").alias("episode_start"),
            F.max("e").alias("episode_end"),
            F.count("*").alias("n_intervals"),
        )
        .orderBy("user_id", "episode")
    )
