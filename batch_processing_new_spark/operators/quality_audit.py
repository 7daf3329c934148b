"""Data-quality gates: a declarative expectations audit (one scan,
all rules) and a referential-integrity (FK orphan) audit across the
star schema.

These are the checks a 100 TB ingest runs BEFORE publishing a corpus
version (sinks/writers.py::publish_versioned) — the Great-Expectations
/ dbt-test surface, re-expressed as Spark aggregates:

- expectations: every rule is a boolean expression evaluated in the
  SAME single pass over the table (conditional sums — one scan, one
  1-row shuffle, regardless of rule count). Adding a rule adds a
  column to the aggregate, not a job.
- FK orphans: each child->parent edge is a left-anti count. Parents
  broadcast when small (dimension tables); the two fact-fact edges
  shuffle on the key. The audit emits child/orphan counts per edge so
  the publish gate can assert orphans == 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_processing_new_spark.registry import query
from batch_processing_new_spark.sources.readers import load_table

# (rule_id, spark predicate, duckdb predicate) — predicate TRUE = pass.
# Most rules are ANSI expressions valid verbatim in both engines; the
# JSON rule names each engine's extractor (get_json_object vs
# json_extract) for the same path.
EVENT_RULES: list[tuple[str, str, str]] = [
    ("value_nonneg", "value >= 0", "value >= 0"),
    ("value_upper_bound", "value <= 1000", "value <= 1000"),
    (
        "event_type_domain",
        "event_type IN ('click','view','purchase','signup','error')",
        "event_type IN ('click','view','purchase','signup','error')",
    ),
    ("user_id_present", "user_id IS NOT NULL", "user_id IS NOT NULL"),
    (
        "ts_in_range",
        "ts >= TIMESTAMP '2020-01-01' AND ts < TIMESTAMP '2030-01-01'",
        "ts >= TIMESTAMP '2020-01-01' AND ts < TIMESTAMP '2030-01-01'",
    ),
    (
        # DuckDB's json_extract ERRORS on malformed JSON (the very rows
        # this rule exists to catch) — and a bare `json_valid(x) AND
        # json_extract(x)` does NOT protect it: SQL engines may evaluate
        # both conjuncts (DuckDB's vectorized executor does, caught by
        # tools/poison_sweep.py), so the gate must be a CASE branch.
        # Spark's get_json_object already returns NULL there.
        "props_has_k",
        "get_json_object(props, '$.k') IS NOT NULL",
        "CASE WHEN json_valid(props) "
        "THEN json_extract(props, '$.k') IS NOT NULL ELSE FALSE END",
    ),
]


def _rule_select_sql() -> str:
    parts = []
    for rid, _sp, _dp in EVENT_RULES:
        parts.append(
            f"SELECT '{rid}' AS rule_id, n, "
            f"n_{rid} AS n_violations, "
            f"round(n_{rid} / n, 6) AS violation_rate FROM agg"
        )
    return "\nUNION ALL\n".join(parts)


@query(
    "q173_expectations_audit",
    oracle=f"""
WITH agg AS (
    SELECT count(*)::BIGINT AS n,
           {", ".join(
               f"sum(CASE WHEN NOT coalesce(({dpred}), FALSE) THEN 1 ELSE 0 END)::BIGINT AS n_{rid}"
               for rid, _sp, dpred in EVENT_RULES
           )}
    FROM events
)
SELECT rule_id, n AS n_rows, n_violations, violation_rate FROM (
{_rule_select_sql()}
)
ORDER BY rule_id
""",
)
def q173_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations audit over events: every rule's
    violation count and rate, computed in ONE scan (conditional sums
    in a single aggregate — adding rules never adds passes over the
    data). A NULL predicate result counts as a violation (the
    expectations convention: unknown is not a pass).
    """
    ev = load_table(spark, sf_dir, "events")
    aggs = [F.count("*").alias("n")]
    for rid, pred, _dp in EVENT_RULES:
        ok = F.coalesce(F.expr(pred), F.lit(False))
        aggs.append(
            F.sum(F.when(~ok, 1).otherwise(0)).alias(f"n_{rid}")
        )
    agg = ev.agg(*aggs)
    per_rule = [
        agg.select(
            F.lit(rid).alias("rule_id"),
            F.col("n").alias("n_rows"),
            F.col(f"n_{rid}").alias("n_violations"),
            F.round(F.col(f"n_{rid}") / F.col("n"), 6).alias(
                "violation_rate"
            ),
        )
        for rid, _sp, _dp in EVENT_RULES
    ]
    out = per_rule[0]
    for df in per_rule[1:]:
        out = out.unionByName(df)
    return out.orderBy("rule_id")


# (edge name, child table, child fk, parent table, parent pk)
FK_EDGES: list[tuple[str, str, str, str, str]] = [
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation_region", "nation", "n_regionkey", "region", "r_regionkey"),
]


@query(
    "q174_fk_orphan_audit",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{name}' AS edge,
       (SELECT count(*) FROM {child})::BIGINT AS child_rows,
       (SELECT count(*) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                          WHERE p.{pk} = c.{fk}))::BIGINT AS orphan_rows"""
        for name, child, fk, parent, pk in FK_EDGES
    )
    + "\nORDER BY edge",
)
def q174_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the star
    schema: child row count and orphaned-child count (FK value with no
    parent) per edge — the publish gate asserts the orphan column is
    all zeros.

    Each edge is a left-anti join count; dimension parents broadcast,
    the fact-fact edges hash-shuffle on the key. Edges are independent
    jobs unioned at the end, so AQE sizes each join on its own stats.
    """
    frames = []
    for name, child, fk, parent, pk in FK_EDGES:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent)
        orphans = c.join(p, c[fk] == p[pk], "left_anti")
        frames.append(
            c.agg(F.count("*").alias("child_rows")).crossJoin(
                orphans.agg(F.count("*").alias("orphan_rows"))
            ).select(
                F.lit(name).alias("edge"), "child_rows", "orphan_rows"
            )
        )
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df)
    return out.orderBy("edge")
