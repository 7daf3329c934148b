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


import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.functions.timekit import epoch_micros
from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table, pin_before_sort

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
                # half-away-from-zero like DuckDB's round(): Python's
                # round is banker's, which splits from the oracle when
                # the EWMA lands exactly on a 0.5e-6 grid midpoint
                # (values are nonnegative, so +0.5-floor IS half-away)
                "ewma_value": [math.floor(e * 1e6 + 0.5) / 1e6],
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
    -- NULL-value events excluded on BOTH sides: a NaN poisons the
    -- Python recursion (math.floor(nan) raises) while SQL's weighted
    -- sum silently skips it but still counts its position — two
    -- different wrong answers (tools/poison_sweep.py finding); an
    -- unvalued event simply does not update the EWMA.
    SELECT user_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
           count(*)    OVER (PARTITION BY user_id)                        AS n
    FROM events WHERE value IS NOT NULL
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
    comparison is stable. NULL-value events are excluded on both sides
    (see the oracle comment).
    """
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    # pin the applyInPandas pass: range sampling would run it twice
    return pin_before_sort(ewma_per_user(e)).orderBy("user_id")


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
    # naive epoch (timekit): the oracle's epoch(CAST(ts AS TIMESTAMP))
    # is naive, and the INTERCEPT depends on the absolute x origin — a
    # session-zone epoch would shift it by the zone offset
    x = epoch_micros(F.col("ts")) / 1_000_000.0
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


# ------------------------------ co-grouped map (cogroup.applyInPandas)

@query(
    "q128_cogroup_order_lines",
    oracle="""
SELECT l.l_orderkey                                      AS orderkey,
       l.l_linenumber                                    AS linenumber,
       round(l.l_extendedprice * (1 - l.l_discount), 4)  AS line_revenue,
       round(sum(l.l_extendedprice * (1 - l.l_discount)) OVER (
                 PARTITION BY l.l_orderkey
                 ORDER BY l.l_linenumber, l.l_partkey, l.l_suppkey,
                          l.l_extendedprice, l.l_discount
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW), 4)           AS running_revenue,
       round(l.l_extendedprice * (1 - l.l_discount)
             / o.o_totalprice, 6)                        AS share_of_total
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_orderkey % 50 = 0
ORDER BY orderkey, linenumber
""",
)
def q128_cogroup_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order line enrichment via the CO-GROUPED map surface:
    ``orders.groupBy(key).cogroup(lineitem.groupBy(key)).applyInPandas``
    hands each order's header row AND its line rows to one pandas
    function — the third grouped-UDF shape next to applyInPandas (q62)
    and applyInPandasWithState (q78), and the natural home for per-key
    logic that needs BOTH sides materialized (reconciliation, per-entity
    model scoring, header/detail alignment).

    The arithmetic here (running revenue + share of the order total) is
    deliberately window-expressible so the oracle pins the transport
    exactly; the operator exists to verify the cogroup path. Scale: both
    sides shuffle once on the key — identical movement to the equivalent
    join — and a group pair must fit one worker's memory. The key COST
    lesson: cogroup dispatches one Python call per key, so it suits
    thousands of fat groups, not millions of tiny ones (all 15k orders
    at sf0.01 took 140 s where the window join takes <1 s — hence the
    deterministic orderkey % 50 subset here; per-row logic belongs in
    windows/joins, cogroup is for per-ENTITY programs).
    """
    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(spark)

    def merge(orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(orders_pdf) or not len(lines_pdf):
            return pd.DataFrame(
                columns=[
                    "orderkey",
                    "linenumber",
                    "line_revenue",
                    "running_revenue",
                    "share_of_total",
                ]
            )
        total = float(orders_pdf["o_totalprice"].iloc[0])
        # fixture linenumbers repeat within an order, so the running sum
        # needs a full deterministic sort key (mirrored in the oracle's
        # ROWS-frame window); full-key ties are identical rows, for
        # which any order yields the same multiset of partial sums
        lines = lines_pdf.sort_values(
            ["l_linenumber", "l_partkey", "l_suppkey",
             "l_extendedprice", "l_discount"]
        )
        rev = lines["l_extendedprice"] * (1 - lines["l_discount"])
        return pd.DataFrame(
            {
                "orderkey": lines["l_orderkey"],
                "linenumber": lines["l_linenumber"],
                "line_revenue": rev.round(4),
                "running_revenue": rev.cumsum().round(4),
                "share_of_total": (rev / total).round(6),
            }
        )

    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 50 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount",
        )
    )
    out = (
        o.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(
            merge,
            schema=(
                "orderkey bigint, linenumber int, line_revenue double, "
                "running_revenue double, share_of_total double"
            ),
        )
    )
    # pin the cogroup pass: range sampling would dispatch every
    # per-order Python call twice
    return pin_before_sort(out).orderBy("orderkey", "linenumber")
