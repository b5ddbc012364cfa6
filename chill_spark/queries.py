"""Declared query inventory: the driver-facing demonstration queries.

Each entry exercises one (or more) operator(s) from SURVEY.md §2 over
the driver's synthetic tables. Every query here has a matching ANSI-SQL
oracle in ``ORACLE_SQL`` (DuckDB-runnable) unless genuinely
non-SQL-expressible, in which case it's listed in ``queries()`` only
and gets the driver's weaker rows-only check.

Column-name contract: every computed/aggregate column is aliased
identically in the Spark plan and the oracle SQL — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import load_tables

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query function and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_REGISTRY)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4 A1/A4 analogs) — hash agg w/ map-side combine
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                       AS sum_qty,
           sum(l_extendedprice)                                  AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity)                                       AS avg_qty,
           avg(l_extendedprice)                                  AS avg_price,
           avg(l_discount)                                       AS avg_disc,
           count(*)                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary.

    One wide scan -> filter (pushed to parquet) -> partial+final hash
    aggregate. The canonical PM-counter rollup shape (reference
    schedules these externally, HlxTools.py:658-725; here it's a
    single Catalyst hash aggregate with map-side combine).
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style semi-join (EXISTS): left_semi keeps the plan a
    single hash join with no duplicate-row explosion — at 100 TB the
    lineitem side is shuffle-pruned to (l_orderkey, l_shipdate) only.
    "Late shipment" = shipped >60 days after the order date (the
    synthetic lineitem has no commit/receipt dates)."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        t["orders"]
        .join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join. region/nation/supplier/customer are
    dims -> Catalyst broadcasts them (AQE confirms at runtime); only
    orders⋈lineitem shuffles, on orderkey."""
    t = load_tables(
        spark, sf_dir,
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    )
    return (
        t["region"].filter(F.col("r_name") == "ASIA")
        .join(t["nation"], F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t["supplier"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["customer"], F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            t["orders"],
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-01-01 00:00:00").cast("timestamp")),
        )
        .join(
            t["lineitem"],
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_suppkey") == F.col("s_suppkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT sum(l_extendedprice * l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style filter-heavy scan: every predicate reaches the
    parquet reader (PushedFilters) and only 4 columns are read
    (ReadSchema) — the pushdown/pruning showcase."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "q_customers_without_orders",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           sum(c_acctbal) AS sum_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (J4/J5 shape, TPC-H Q22 flavor): customers with no
    orders. left_anti against the distinct key projection keeps the
    build side minimal."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    return (
        t["customer"]
        .join(
            t["orders"].select(F.col("o_custkey").alias("c_custkey")).distinct(),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c_acctbal").alias("sum_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi distinct-aggregate: Catalyst plans an expand + two-phase
    aggregate (partial distinct on the mapper side before the
    shuffle)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_window_topn_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def q_window_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: top-3 orders per customer by price.

    row_number over (custkey) — Spark plans a single shuffle on
    o_custkey + in-partition sort; with AQE the post-shuffle partition
    count adapts to data volume. Deterministic tie-break on orderkey.
    """
    from pyspark.sql.window import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_rollup_grouping",
    oracle="""
    SELECT event_type, count(*) AS n_events, sum(value) AS sum_value
    FROM events
    GROUP BY ROLLUP(event_type)
    ORDER BY event_type NULLS FIRST
    """,
)
def q_rollup_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: per-type subtotals + grand total in one
    expand+aggregate pass (no second scan for the total row)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.rollup("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .orderBy(F.col("event_type").asc_nulls_first())
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_pivot_daily_events",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           sum(value) FILTER (event_type = 'click')    AS click,
           sum(value) FILTER (event_type = 'error')    AS error,
           sum(value) FILTER (event_type = 'purchase') AS purchase,
           sum(value) FILTER (event_type = 'signup')   AS signup,
           sum(value) FILTER (event_type = 'view')     AS view
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_pivot_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide rollup): explicit value list so the plan is a single
    aggregate — without it Spark runs an extra distinct-values job."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum("value"))
        .orderBy("day")
    )


@query(
    "q_json_props",
    oracle="""
    SELECT event_type,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: get_json_object stays JVM-side
    (Jackson), no Python; the JSON parse is fused into the scan
    stage's codegen."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object(F.col("props"), "$.k").cast("long")).alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# PM granularity-ladder rollups (A1), cfg-table derivation (A2),
# retention (SURVEY §2.7) — the reference's scheduled external jobs as
# declarative aggregates.
# ---------------------------------------------------------------------------

@query(
    "q_rollup_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS ts, event_type, sum(value) AS value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ladder level HR via the rollup operator (HlxTools.py:697-702
    analog): one partial+final hash aggregate."""
    from .operators.rollup import rollup as _rollup

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return _rollup(
        ev, keys=["event_type"], counters=["value"], granularity="HR",
        datetime_col="ts",
    ).orderBy("ts", "event_type")


@query(
    "q_rollup_ladder_daily",
    oracle="""
    SELECT date_trunc('day', ts) AS ts, event_type, sum(value) AS value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_rollup_ladder_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ladder derivation DY-from-HR (not from base): additive counters
    re-aggregate losslessly, so each level reads the (much smaller)
    previous level — the 100 TB-scale ladder strategy."""
    from .operators.rollup import rollup as _rollup

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    hourly = _rollup(ev, ["event_type"], ["value"], "HR", datetime_col="ts")
    return _rollup(hourly, ["event_type"], ["value"], "DY", datetime_col="ts").orderBy(
        "ts", "event_type"
    )


@query(
    "q_rollup_15m",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS ts,
           event_type, sum(value) AS value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_rollup_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-hour ladder level (15M): fixed tumbling window via
    F.window — epoch-aligned, identical buckets to DuckDB
    time_bucket."""
    from .operators.rollup import rollup as _rollup

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return _rollup(
        ev, ["event_type"], ["value"], "15M", datetime_col="ts"
    ).orderBy("ts", "event_type")


@query(
    "q_cfg_table_users",
    oracle="SELECT DISTINCT user_id FROM events ORDER BY user_id",
)
def q_cfg_table_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CfgTable dim derivation (A2, HlxTools.py:728-761): distinct
    entity keys from the fact stream."""
    from .operators.cfg_table import derive_cfg_table

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return derive_cfg_table(ev, ["user_id"]).orderBy("user_id")


@query(
    "q_retention_expired",
    oracle="""
    SELECT DISTINCT date_trunc('day', ts) AS day
    FROM events
    WHERE date_trunc('day', ts) <
          (SELECT max(date_trunc('day', ts)) FROM events) - INTERVAL 7 DAY
    ORDER BY day
    """,
)
def q_retention_expired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention/thinout planning (HlxTools.py:620-631): day partitions
    older than TTL relative to the newest data. The scalar max comes
    from a single-row broadcast join, not a driver collect."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    days = ev.select(F.date_trunc("day", F.col("ts")).alias("day"))
    mx = days.agg(F.max("day").alias("__mx"))
    return (
        days.distinct()
        .join(F.broadcast(mx))
        .filter(F.col("day") < F.col("__mx") - F.expr("INTERVAL 7 DAYS"))
        .select("day")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Reconciliation operators (Layer B, §3.3) — demonstrated on synthetic
# expected/actual splits of the orders table.
# ---------------------------------------------------------------------------

@query(
    "q_reconcile_missing_rows",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey % 7 = 0
    ORDER BY o_orderkey
    """,
)
def q_reconcile_missing_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """missing_rows (J4, HlxTools.py:885-891): expected-side rows whose
    key is absent from actual. Actual = orders minus every 7th key."""
    from .reconcile.compare import missing_rows

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    actual = o.filter(F.col("o_orderkey") % 7 != 0)
    return (
        missing_rows(o, actual, ["o_orderkey"])
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "q_reconcile_value_diff",
    oracle="""
    SELECT o_orderkey,
           'o_totalprice' AS counter,
           CAST(o_totalprice AS VARCHAR) AS rd,
           CAST(o_totalprice + 0.017 AS VARCHAR) AS db
    FROM orders WHERE o_orderkey % 50 = 0
    ORDER BY o_orderkey
    """,
)
def q_reconcile_value_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """value_diff (J3 + HlxTools.py:908-935): tolerant per-counter diff
    — numeric rule is equality of round(x,3), the reference's exact
    semantics. Actual = orders with every 50th totalprice nudged by
    0.017 (> the 0.0005 tolerance)."""
    from .reconcile.compare import value_diff

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = o.select("o_orderkey", "o_totalprice")
    actual = o.select(
        "o_orderkey",
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 50 == 0, F.lit(0.017)).otherwise(F.lit(0.0))
        ).alias("o_totalprice"),
    )
    return value_diff(expected, actual, ["o_orderkey"], ["o_totalprice"]).orderBy(
        "o_orderkey"
    )


@query(
    "q_reconcile_referential",
    oracle="""
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_custkey NOT IN
          (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
    ORDER BY o_custkey
    """,
)
def q_reconcile_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """referential_violations (J6, HlxTools.py:848-856): fact keys not
    covered by the (broadcast) dimension — here, customers in good
    standing."""
    from .reconcile.compare import referential_violations

    t = load_tables(spark, sf_dir, ["orders", "customer"])
    dim = (
        t["customer"].filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return referential_violations(t["orders"], dim, ["o_custkey"]).orderBy("o_custkey")


# ---------------------------------------------------------------------------
# DSL compiler (§4.3) — config templates compiled to native Columns.
# ---------------------------------------------------------------------------

@query(
    "q_dsl_derive",
    oracle="""
    SELECT c_custkey,
           substr(c_name, 10, 9) AS cust_num,
           CAST(substr(c_name, 10, 9) AS BIGINT) + 100 AS cust_num_plus
    FROM customer ORDER BY c_custkey
    """,
)
def q_dsl_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chill-DSL 'column' source (P5, Partrans.py:162-172): Python
    templates ``arg1[9:18]`` / ``int(arg1[9:18]) + 100`` tier-1-compiled
    to native Column exprs — zero Python at runtime."""
    from .dsl.compiler import arg_bindings, compile_template

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    b = arg_bindings(["c_name"])
    return c.select(
        "c_custkey",
        compile_template("arg1[9:18]", b).alias("cust_num"),
        compile_template("int(arg1[9:18]) + 100", b).alias("cust_num_plus"),
    ).orderBy("c_custkey")


@query(
    "q_dsl_lookup",
    oracle="""
    SELECT c.c_custkey, coalesce(n.n_name, 'UNKNOWN') AS nation_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    ORDER BY c.c_custkey
    """,
)
def q_dsl_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chill-DSL 'lookup' source (P6/J1, Partrans.py:174-201): the
    pandas boolean-indexing idiom parsed into a LookupPlan, executed
    as a broadcast left join + coalesce(default) — per-row probes
    become one join at any scale."""
    from .dsl.lookup import apply_lookup, parse_lookup_template

    t = load_tables(spark, sf_dir, ["customer", "nation"])
    plan = parse_lookup_template(
        "view[view['n_nationkey'] == arg1]['n_name'].values[0]"
    )
    return (
        apply_lookup(
            t["customer"], plan, t["nation"], "nation_name",
            inputs=["c_nationkey"], default="UNKNOWN",
        )
        .select("c_custkey", "nation_name")
        .orderBy("c_custkey")
    )


@query(
    "q3_top_orders",
    oracle="""
    SELECT l.l_orderkey AS l_orderkey,
           sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
           o.o_orderdate AS o_orderdate,
           o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dim filter -> join -> agg -> top-k.

    customer is small relative to lineitem: Catalyst/AQE broadcasts it;
    the orders⋈lineitem join shuffles on orderkey (the natural key —
    co-partitioned with the aggregation that follows, so the groupBy
    reuses the join's shuffle).
    """
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    return (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )
