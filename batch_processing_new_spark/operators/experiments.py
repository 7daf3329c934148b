"""Experiment analytics: hash-bucketed A/B assignment and a
two-proportion z-test computed in one aggregation pass.

The reference pipeline's product loop (enrich -> publish -> webhook,
SURVEY §2A ops 6/15) feeds product experiments; the analysis step the
North-Star surface implies is "did arm B move the metric?". This is
the canonical distributed shape for it:

- assignment is a PORTABLE seeded hash of the unit id (the q61/q89
  hash-gate discipline, functions/text_funcs.py::hash60) — the arm a
  user lands in is a pure function of the id, stable across runs,
  engines, and partitionings, which is what makes the experiment
  re-analyzable months later;
- the per-user conversion flag is a groupBy(user) max — one shuffle;
- the per-arm counts collapse via conditional aggregation into a
  SINGLE row — the second "shuffle" moves exactly two partial rows per
  task, i.e. nothing;
- the z statistic is scalar arithmetic on four exact integers, so the
  float math is a deterministic function of exact inputs (the same
  final-scalar discipline as q157's jackknife CI).

At 100 TB: the user-grain aggregate is the only real shuffle, it
carries one row per user, and partial aggregation collapses events
map-side. No driver data movement at any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.functions.text_funcs import hash60, hash60_sql
from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table

_AB_SEED = "ab-exp-1"
_Z_CRIT = 1.959963985  # two-sided 95%


def arm_of(user_id: Column) -> Column:
    """Deterministic 50/50 assignment: hash60(seed:user) % 2."""
    return (
        hash60(F.concat(F.lit(_AB_SEED + ":"), user_id.cast("string"))) % 2
    ).cast("int")


def _arm_sql(expr: str) -> str:
    preimage = f"'{_AB_SEED}:' || {expr}"
    return f"({hash60_sql(preimage)} % 2)::INT"


@query(
    "q163_ab_ztest",
    oracle=f"""
WITH per_user AS (
    SELECT user_id,
           {_arm_sql("user_id::VARCHAR")} AS arm,
           max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS conv
    FROM events
    GROUP BY user_id
),
arms AS (
    SELECT
        sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)    AS n_a,
        sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)    AS n_b,
        sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS conv_a,
        sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS conv_b
    FROM per_user
)
SELECT n_a, n_b, conv_a, conv_b,
       round(conv_a / n_a, 6) AS cvr_a,
       round(conv_b / n_b, 6) AS cvr_b,
       round(conv_b / n_b - conv_a / n_a, 6) AS lift,
       round((conv_b / n_b - conv_a / n_a)
             / sqrt(((conv_a + conv_b) / (n_a + n_b))
                    * (1 - (conv_a + conv_b) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score,
       abs((conv_b / n_b - conv_a / n_a)
           / sqrt(((conv_a + conv_b) / (n_a + n_b))
                  * (1 - (conv_a + conv_b) / (n_a + n_b))
                  * (1.0 / n_a + 1.0 / n_b))) > {_Z_CRIT} AS significant
FROM arms
""",
)
def q163_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a hash-assigned 50/50 experiment:
    unit = user, metric = converted (>=1 high-value purchase, value > 150), arms from
    the portable seeded hash. One row: per-arm exposure/conversion
    counts, rates, absolute lift, pooled z statistic, and the 95%
    two-sided significance verdict.

    Shapes: events -> groupBy(user_id) [the only data-scale shuffle]
    -> single-row conditional aggregate -> scalar math. The z math
    runs on four exact BIGINTs, so both engines compute bit-identical
    doubles.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when((F.col("event_type") == "purchase") & (F.col("value") > 150), 1).otherwise(0)
            ).alias("conv")
        )
        .withColumn("arm", arm_of(F.col("user_id")))
    )
    arms = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    cvr_a = F.col("conv_a") / F.col("n_a")
    cvr_b = F.col("conv_b") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    z = (cvr_b - cvr_a) / F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return arms.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(cvr_a, 6).alias("cvr_a"),
        F.round(cvr_b, 6).alias("cvr_b"),
        F.round(cvr_b - cvr_a, 6).alias("lift"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > _Z_CRIT).alias("significant"),
    )
