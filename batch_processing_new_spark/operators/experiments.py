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

from batch_processing_new_spark.functions.text_funcs import hash60_sql, salted_hash60
from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table

_AB_SEED = "ab-exp-1"
_Z_CRIT = 1.959963985  # two-sided 95%


def arm_of(user_id: Column) -> Column:
    """Deterministic 50/50 assignment: hash60(seed:user) % 2."""
    return (
        (salted_hash60(_AB_SEED, user_id) % 2)
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
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
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
    # nullif every arm-count denominator: with one arm empty (e.g. a
    # single-user relation) the rate is 0/0 — NULL in DuckDB, an ANSI
    # DIVIDE_BY_ZERO raise in Spark without the guard (integral `/`
    # is checked even though the result type is double)
    na = F.nullif(F.col("n_a"), F.lit(0))
    nb = F.nullif(F.col("n_b"), F.lit(0))
    cvr_a = F.col("conv_a") / na
    cvr_b = F.col("conv_b") / nb
    pooled = (F.col("conv_a") + F.col("conv_b")) / F.nullif(
        F.col("n_a") + F.col("n_b"), F.lit(0)
    )
    # outer nullif: a degenerate experiment (zero conversions in BOTH
    # arms, or everyone converting) has pooled variance 0 — z is
    # undefined, NULL in DuckDB, an ANSI raise in Spark unguarded
    z = (cvr_b - cvr_a) / F.nullif(
        F.sqrt(pooled * (1 - pooled) * (1.0 / na + 1.0 / nb)),
        F.lit(0.0),
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


_CUPED_CUTOFF = "2024-01-16"  # pre-period: events before this day


@query(
    "q172_cuped",
    oracle=f"""
WITH per_user AS (
    SELECT user_id,
           {_arm_sql("user_id::VARCHAR")} AS arm,
           CAST(CAST(sum(CASE WHEN ts <  TIMESTAMP '{_CUPED_CUTOFF}'
                         THEN CAST(value AS DECIMAL(30,8)) ELSE 0 END) AS VARCHAR) AS DOUBLE) AS pre,
           CAST(CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUTOFF}'
                          AND event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(30,8)) ELSE 0 END) AS VARCHAR) AS DOUBLE) AS post
    FROM events
    GROUP BY user_id
),
moments AS (
    SELECT count(*) AS n,
           CAST(CAST(sum(CAST(pre  AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sx,
           CAST(CAST(sum(CAST(post AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sy,
           CAST(CAST(sum(CAST(pre * post AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sxy,
           CAST(CAST(sum(CAST(pre * pre  AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sxx
    FROM per_user
),
theta AS (
    SELECT n, sx / n AS mx,
           (sxy - sx * sy / n) / (sxx - sx * sx / n) AS th
    FROM moments
),
adjusted AS (
    SELECT u.arm, u.post - t.th * (u.pre - t.mx) AS adj, u.post, t.th
    FROM per_user u CROSS JOIN theta t
)
SELECT arm,
       count(*) AS n_users,
       round(CAST(CAST(sum(CAST(post AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / count(*), 6) AS mean_post,
       round(CAST(CAST(sum(CAST(adj  AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) / count(*), 6) AS mean_adjusted,
       round(any_value(th), 6) AS theta
FROM adjusted
GROUP BY arm
ORDER BY arm
""",
)
def q172_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the q163 experiment: per-user
    pre-period covariate (all event value before {_CUPED_CUTOFF}) and
    post-period metric (purchase value after), theta =
    cov(pre, post)/var(pre) estimated once over ALL users (the
    standard assignment-independent estimator), adjusted metric
    post - theta*(pre - mean(pre)), reported per arm.

    Distributed shape: user-grain conditional aggregate (one shuffle),
    then a single-row moment aggregate — sums of pre, post, pre*post,
    pre^2 reduced under the DECIMAL(30,8) dsum discipline so theta is
    a deterministic scalar of exact sums (partition-order-independent,
    engine-identical); the adjustment is a broadcast of that 1-row
    theta back across users. The per-arm re-aggregate is the q163
    two-row collapse. Nothing driver-side at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(30,8)"
    cutoff = F.lit(_CUPED_CUTOFF).cast("timestamp_ntz")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("ts") < cutoff, F.col("value").cast(dec)
                ).otherwise(F.lit(0).cast(dec))
            )
            .cast("double")
            .alias("pre"),
            F.sum(
                F.when(
                    (F.col("ts") >= cutoff)
                    & (F.col("event_type") == "purchase"),
                    F.col("value").cast(dec),
                ).otherwise(F.lit(0).cast(dec))
            )
            .cast("double")
            .alias("post"),
        )
        .withColumn("arm", arm_of(F.col("user_id")))
    )
    per_user = per_user.localCheckpoint(eager=False)  # moments + adjust
    moments = per_user.agg(
        F.count("*").alias("n"),
        F.sum(F.col("pre").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("post").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("pre") * F.col("post")).cast(dec))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("pre") * F.col("pre")).cast(dec))
        .cast("double")
        .alias("sxx"),
    )
    theta = moments.select(
        (F.col("sx") / F.col("n")).alias("mx"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            # nullif: a degenerate pre-period (one user, or constant
            # covariate) has var(pre) = 0 — theta is undefined, NULL
            # in DuckDB, an ANSI raise in Spark without the guard
            / F.nullif(
                F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"),
                F.lit(0.0),
            )
        ).alias("th"),
    )
    adjusted = per_user.crossJoin(F.broadcast(theta)).select(
        "arm",
        "post",
        (F.col("post") - F.col("th") * (F.col("pre") - F.col("mx"))).alias(
            "adj"
        ),
        "th",
    )
    return (
        adjusted.groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.round(
                F.sum(F.col("post").cast(dec)).cast("double") / F.count("*"),
                6,
            ).alias("mean_post"),
            F.round(
                F.sum(F.col("adj").cast(dec)).cast("double") / F.count("*"),
                6,
            ).alias("mean_adjusted"),
            F.round(F.first("th"), 6).alias("theta"),
        )
        .orderBy("arm")
    )
