"""Data-quality constraint checking (Deequ/dbt-test style): declared
expectations over the warehouse — primary-key uniqueness, referential
integrity, accepted values, ranges, null rates, partition completeness
— evaluated in bulk and emitted as a constraint report table.

This is the operational layer a 100 TB ingest pipeline runs after
every load: one pass per table computes ALL of that table's row-level
checks (a single conditional aggregation — adding a check adds an
expression, not a scan), plus one distinct-aggregate for key
uniqueness and one anti-join per foreign key.

All counts are exact integers; the report is engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kbrowse_spark.catalog import register
from kbrowse_spark.sources.tables import load

_ACCEPTED_STATUS = ("F", "O", "P")


@register(
    "data_quality_report",
    f"""
    WITH orders_scan AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
               AS pk_dup,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS null_cust,
             CAST(SUM(CASE WHEN o_orderstatus NOT IN
                        {_ACCEPTED_STATUS} THEN 1 ELSE 0 END)
                  AS BIGINT) AS bad_status,
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS bad_price
      FROM orders),
    li_fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_li,
             CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphan
      FROM lineitem l LEFT JOIN orders o
        ON o.o_orderkey = l.l_orderkey),
    ev_hours AS (
      SELECT CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT)
               AS present,
             CAST((epoch(date_trunc('hour', MAX(ts)))
                   - epoch(date_trunc('hour', MIN(ts)))) // 3600 + 1
                  AS BIGINT) AS expected
      FROM events),
    checks AS (
      SELECT 'orders_pk_unique' AS check_name, pk_dup AS n_violations,
             n_total FROM orders_scan
      UNION ALL
      SELECT 'orders_custkey_not_null', null_cust, n_total
      FROM orders_scan
      UNION ALL
      SELECT 'orders_status_accepted', bad_status, n_total
      FROM orders_scan
      UNION ALL
      SELECT 'orders_totalprice_positive', bad_price, n_total
      FROM orders_scan
      UNION ALL
      SELECT 'lineitem_fk_orders', n_orphan, n_li FROM li_fk
      UNION ALL
      SELECT 'events_hourly_complete', expected - present, expected
      FROM ev_hours)
    SELECT check_name, n_violations, n_total,
           CAST(n_violations = 0 AS INT) AS ok
    FROM checks
    ORDER BY check_name
    """,
    "quality",
    "pipeline",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk constraint validation over the warehouse, one report row
    per declared check: orders primary-key uniqueness, custkey
    completeness, accepted status values, positive totals, lineitem ->
    orders referential integrity, and events hourly-partition
    completeness (no missing ingest hours between min and max).

    Scale posture: the four orders row-checks share ONE conditional
    aggregation pass (count-distinct rides the same shuffle); the FK
    check is one LEFT join + null-flag aggregate — total AND orphan
    counts from a single scan, no second pass and no 1-row cross join
    (sound because the key side is PK-unique, which the report itself
    asserts); the completeness check is a 1-row min/max/distinct
    aggregate.  Each check's cost is one expression, not one scan:
    adding the next constraint is free.
    """
    o = load(spark, sf_dir, "orders")
    orders_scan = o.agg(
        F.count(F.lit(1)).alias("n_total"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_dup"),
        F.sum(
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
        ).alias("null_cust"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin(*_ACCEPTED_STATUS), 1).otherwise(0)
        ).alias("bad_status"),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("bad_price"),
    )
    li = load(spark, sf_dir, "lineitem")
    orphans = li.join(
        o.select("o_orderkey"),
        li["l_orderkey"] == o["o_orderkey"],
        "left",
    ).agg(
        F.count(F.lit(1)).alias("n_li"),
        F.sum(
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
        ).alias("n_orphan"),
    )
    ev = load(spark, sf_dir, "events")
    hours = ev.agg(
        F.countDistinct(F.date_trunc("hour", "ts")).alias("present"),
        (
            (
                F.unix_timestamp(F.date_trunc("hour", F.max("ts")))
                - F.unix_timestamp(F.date_trunc("hour", F.min("ts")))
            )
            / 3600
            + 1
        )
        .cast("long")
        .alias("expected"),
    )

    def row(name: str, viol, total) -> DataFrame:
        return F.lit(name).alias("check_name"), viol.cast("long").alias(
            "n_violations"
        ), total.cast("long").alias("n_total")

    checks = (
        orders_scan.select(*row("orders_pk_unique", F.col("pk_dup"), F.col("n_total")))
        .unionAll(
            orders_scan.select(
                *row("orders_custkey_not_null", F.col("null_cust"), F.col("n_total"))
            )
        )
        .unionAll(
            orders_scan.select(
                *row("orders_status_accepted", F.col("bad_status"), F.col("n_total"))
            )
        )
        .unionAll(
            orders_scan.select(
                *row(
                    "orders_totalprice_positive",
                    F.col("bad_price"),
                    F.col("n_total"),
                )
            )
        )
        .unionAll(
            orphans.select(
                *row("lineitem_fk_orders", F.col("n_orphan"), F.col("n_li"))
            )
        )
        .unionAll(
            hours.select(
                *row(
                    "events_hourly_complete",
                    F.col("expected") - F.col("present"),
                    F.col("expected"),
                )
            )
        )
    )
    return checks.select(
        "check_name",
        "n_violations",
        "n_total",
        (F.col("n_violations") == 0).cast("int").alias("ok"),
    ).orderBy("check_name")
