"""Grouped-map operators (``applyInPandas``): the UDAF-shaped extension
point (SURVEY.md §2B "UDF/UDAF surface").

Two queries cover the two cases:
- q62: recursive per-group state (EWMA) — genuinely inexpressible as a
  Spark window/agg without a UDF; the oracle expands the recursion into
  a closed-form weighted sum DuckDB can evaluate.
- q63: per-group linear regression — expressible JVM-side via the
  built-in ``regr_*`` aggregates, included to pin the boundary: when a
  built-in exists, the engine uses it; applyInPandas is reserved for
  real recursions (the EWMA), not for convenience.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table

ALPHA = 0.5  # EWMA smoothing


def ewma_per_user(events: DataFrame, alpha: float = ALPHA) -> DataFrame:
    """Final EWMA of ``value`` per user, events ordered by (ts, event_id).

    applyInPandas: one Arrow batch per user group, the recursion runs in
    pandas. Scale: state is O(1) per group and groups shuffle once on
    user_id — the same shape as any hash aggregate; a group's events
    must fit one worker's batch (bounded here; at 100 TB chunk by time
    and cascade the EWMA across chunks).
    """
    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        e = None
        for x in pdf["value"]:
            e = x if e is None else alpha * x + (1 - alpha) * e
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "ewma_value": [round(e, 6)],
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(run, schema="user_id bigint, n_events bigint, ewma_value double")
    )


@query(
    "q62_ewma_grouped_map",
    oracle=f"""
WITH ordered AS (
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
           count(*)    OVER (PARTITION BY user_id)                        AS n
    FROM events
)
SELECT user_id,
       n AS n_events,
       -- closed form of the recursion e_k = a*x_k + (1-a)*e_(k-1), e_1 = x_1:
       -- weight of x_i is a*(1-a)^(n-i) except x_1 which gets (1-a)^(n-1)
       round(sum(value * CASE WHEN i = 1 THEN power(1 - {ALPHA}, n - 1)
                              ELSE {ALPHA} * power(1 - {ALPHA}, n - i) END),
             6) AS ewma_value
FROM ordered
GROUP BY user_id, n
ORDER BY user_id
""",
)
def q62_ewma_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA via applyInPandas, oracle = closed-form expansion.

    Note the float subtlety: the Python side computes the literal
    recursion, the oracle the expanded weighted sum — with alpha = 0.5
    both are exact binary arithmetic on the same terms, so round(6)
    comparison is stable.
    """
    e = load_table(spark, sf_dir, "events")
    return ewma_per_user(e).orderBy("user_id")


@query(
    "q63_regression_agg",
    oracle="""
SELECT user_id,
       count(*)                                                   AS n_events,
       round(regr_slope(value, epoch(CAST(ts AS TIMESTAMP))), 6) + 0.0  AS slope,
       round(regr_intercept(value, epoch(CAST(ts AS TIMESTAMP))), 4) + 0.0 AS intercept,
       round(regr_r2(value, epoch(CAST(ts AS TIMESTAMP))), 6) + 0.0     AS r2
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def q63_regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of value over time via built-in regr_*
    aggregates — single-pass, constant state, no Python.

    The ``+ 0.0`` after each round normalizes IEEE negative zero, which
    the engines render differently ("-0" vs "0").
    """
    e = load_table(spark, sf_dir, "events")
    x = F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000.0
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.round(F.regr_slope(F.col("value"), x), 6) + 0.0).alias("slope"),
            (F.round(F.regr_intercept(F.col("value"), x), 4) + 0.0).alias("intercept"),
            (F.round(F.regr_r2(F.col("value"), x), 6) + 0.0).alias("r2"),
        )
        .orderBy("user_id")
    )
