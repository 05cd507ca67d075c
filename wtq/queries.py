"""Query registry: every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) → DataFrame callable, with a matching ANSI-SQL oracle
for DuckDB.  The driver compares row counts + schema + value hashes,
sorting columns by name — every computed column is aliased identically
on both sides, all doubles are explicitly rounded, arrays are emitted
as delimiter-joined strings, and timestamps as epoch seconds.

Each entry cites the reference operator it proves parity with
(SURVEY.md §2 row ids: P*, J*, A*, W*, U*, O*).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wtq.operators import classifier as CL
from wtq.operators import dedup as D
from wtq.operators import similarity as S
from wtq.operators import spatial as G
from wtq.operators import text as X
from wtq.rules import registry as R
from wtq.rules.lexicon import STOPWORDS


def _t(spark: SparkSession, sf_dir: str, name: str, rebalance: bool = True) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if not rebalance:
        # Join-heavy consumers pass rebalance=False: their first shuffle
        # (join exchange / broadcast collect) redistributes anyway, so a
        # round-robin pre-repartition is a pure extra pass over the
        # table (round-6: region_revenue measured 2.8× faster without
        # it + a SHUFFLE_HASH hint; see q_region_revenue).
        return df
    # The driver-provided parquet files are written as a SINGLE row
    # group, which Spark cannot split — every scan would run as one
    # task and serialize the whole query.  Rebalance undersized reads;
    # Catalyst still pushes filters and column pruning through
    # Repartition to the scan (asserted in tests/test_plan_shapes.py).
    # At cluster scale the source tables are properly partitioned and
    # this is a no-op.
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p // 2:
        df = df.repartition(p)
    return df


def _t_keyed(spark: SparkSession, sf_dir: str, name: str, *keys: str) -> DataFrame:
    """Read + repartition by the downstream window/aggregation key
    (round-6, guide §2.4): the single-row-group driver files still need
    one exchange for scan parallelism, but a KEY exchange doubles as
    the ClusteredDistribution the downstream window/groupBy requires —
    one exchange total, where the round-robin rebalance paid its own
    exchange (plus the mandatory sort-before-repartition) and then the
    operator's hash exchange on top (measured on latest_event_per_user
    at sf1.0: 1.80s round-robin → 0.64s keyed).  Pinning the partition
    count also keeps AQE from coalescing the small exchange into too
    few partitions for the compute-heavy operator above it."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    p = spark.sparkContext.defaultParallelism
    return df.repartition(p, *[F.col(k) for k in keys])


_STOP_SQL = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))


# ---------------------------------------------------------------------------
# Relational capability parity (TPC-H-ish tables)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """A1 multi-key agg + P1 projections (proccess_data.sql:72-76 analog)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)") * (1 - F.col("l_discount").cast("decimal(18,4)"))).cast("double"), 2).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_region_revenue(spark, sf_dir):
    """J5 multi-way join with broadcast dims (proccess_data.sql:459-461).

    Join strategy picked deliberately (guide §3.1, round-6): the
    lineitem⋈orders join is hinted SHUFFLE_HASH — orders is the one
    fact-sized side (1.5M rows at sf1.0) and building its whole
    HashedRelation as a broadcast was the query's dominant cost
    (measured 2.84s auto-broadcast → 1.04s SHJ at sf1.0); per-
    partition hash builds scale with shuffle partitions.  The three
    small dims stay broadcast.  Tables are read without the _t
    round-robin rebalance: the join exchange redistributes anyway."""
    c = _t(spark, sf_dir, "customer", rebalance=False)
    o = _t(spark, sf_dir, "orders", rebalance=False)
    li = _t(spark, sf_dir, "lineitem", rebalance=False)
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o.hint("SHUFFLE_HASH"), li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)") * (1 - F.col("l_discount").cast("decimal(18,4)"))).cast("double"), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


SQL_REGION_REVENUE = """
SELECT r_name, n_name,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_rollup_acctbal(spark, sf_dir):
    """Grouping-sets capability (SURVEY.md §2.4 'absent' row): ROLLUP."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double"), 2).alias("total_bal"), F.count("*").alias("n_cust"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "total_bal",
            "n_cust",
        )
    )


SQL_ROLLUP_ACCTBAL = """
SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_bal, count(*) AS n_cust
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_top_customer_per_nation(spark, sf_dir):
    """W1 DISTINCT ON / best-row-per-group (proccess_data.sql:372-381)."""
    c = _t_keyed(spark, sf_dir, "customer", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_custkey", F.round("c_acctbal", 2).alias("best_bal"))
    )


SQL_TOP_CUSTOMER_PER_NATION = """
SELECT n_name, c_custkey, round(c_acctbal, 2) AS best_bal
FROM (
  SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) c JOIN nation ON c_nationkey = n_nationkey
WHERE rn = 1
"""


def q_customers_without_orders(spark, sf_dir):
    """J7 left-anti (proccess_data.sql:482-488).  Anti-joined against
    the URGENT-priority subset: every customer in the fixture has SOME
    order, so the unfiltered anti-join was vacuously empty — this form
    returns real rows while exercising the same plan (LeftAnti,
    asserted in tests/test_plan_shapes.py)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q_segment_order_stats(spark, sf_dir):
    """Left-semi join (EXISTS) + agg."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_semi")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2).alias("total"))
    )


SQL_SEGMENT_ORDER_STATS = """
SELECT count(*) AS n_orders, round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total
FROM orders
WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
"""


def q_duplicate_part_supp(spark, sf_dir):
    """A6/J8 duplicate detection via having count>1 (proccess_data.sql:204-213)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines") > 1)
    )


SQL_DUPLICATE_PART_SUPP = """
SELECT l_partkey, l_suppkey, count(*) AS n_lines
FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
"""


def q_supplier_pairs_per_nation(spark, sf_dir):
    """J4 theta self-join with canonical id1<id2 (proccess_data.sql:243-248)."""
    s = _t(spark, sf_dir, "supplier")
    s1 = s.select(F.col("s_suppkey").alias("k1"), F.col("s_nationkey").alias("nk"))
    s2 = s.select(F.col("s_suppkey").alias("k2"), F.col("s_nationkey").alias("nk"))
    return (
        s1.join(s2, "nk")
        .filter(F.col("k1") < F.col("k2"))
        .groupBy(F.col("nk").alias("nationkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


SQL_SUPPLIER_PAIRS_PER_NATION = """
SELECT s1.s_nationkey AS nationkey, count(*) AS n_pairs
FROM supplier s1 JOIN supplier s2
  ON s1.s_nationkey = s2.s_nationkey AND s1.s_suppkey < s2.s_suppkey
GROUP BY 1
"""


def q_orders_array_membership(spark, sf_dir):
    """J1 array-membership join: build per-customer order arrays, join
    via array_contains (reference `= any(list)` proccess_data.sql:69-71),
    realized scale-safely as explode + equi-join."""
    o = _t_keyed(spark, sf_dir, "orders", "o_custkey")
    arrs = o.groupBy("o_custkey").agg(F.collect_list("o_orderkey").alias("order_keys"))
    # non-equi array_contains join against a probe set of orders
    probe = o.filter(F.col("o_orderkey") % 1000 == 0).select(F.col("o_orderkey").alias("probe_key"))
    exploded = arrs.select("o_custkey", F.explode("order_keys").alias("k"))
    return (
        exploded.join(F.broadcast(probe), exploded.k == probe.probe_key)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_probe_hits"))
    )


SQL_ORDERS_ARRAY_MEMBERSHIP = """
WITH arrs AS (SELECT o_custkey, list(o_orderkey) AS order_keys FROM orders GROUP BY 1),
probe AS (SELECT o_orderkey AS probe_key FROM orders WHERE o_orderkey % 1000 = 0)
SELECT o_custkey, count(*) AS n_probe_hits
FROM arrs JOIN probe ON list_contains(order_keys, probe_key)
GROUP BY o_custkey
"""


def q_event_pivot(spark, sf_dir):
    """A5 conditional-count pivot (proccess_data.sql:184-189)."""
    e = _t_keyed(spark, sf_dir, "events", "user_id")
    types = ["click", "error", "purchase", "signup", "view"]
    return e.groupBy("user_id").agg(
        *[F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}") for t in types],
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("total_value"),
    )


SQL_EVENT_PIVOT = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS n_click,
       count(*) FILTER (WHERE event_type = 'error') AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       count(*) FILTER (WHERE event_type = 'view') AS n_view,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
FROM events GROUP BY user_id
"""


def q_latest_event_per_user(spark, sf_dir):
    """W1/W2 window top-1 with deterministic tie-break; timestamps as
    epoch seconds for engine-neutral hashing."""
    e = _t_keyed(spark, sf_dir, "events", "user_id")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        )
    )


SQL_LATEST_EVENT_PER_USER = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       epoch_ms(ts) AS ts_ms
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_event_json_stats(spark, sf_dir):
    """P6-analog semi-structured access (`->>`): JSON prop extraction."""
    e = _t(spark, sf_dir, "events")
    # mean = exact decimal sum / count (partition-order independent)
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("decimal(18,6)"))
        .groupBy("event_type")
        .agg(
            F.round(F.sum("k").cast("double") / F.count("k"), 4).alias("avg_k"),
            F.count("*").alias("n"),
        )
    )


SQL_EVENT_JSON_STATS = """
SELECT event_type,
       round(CAST(sum(CAST(json_extract_string(props, '$.k') AS DECIMAL(18,6))) AS DOUBLE)
             / count(json_extract_string(props, '$.k')), 4) AS avg_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def q_sessionize_events(spark, sf_dir):
    """Window lag + running session assignment (gap > 30 min ⇒ new
    session) — ranking/lag capability (SURVEY.md §2.5 'absent' row)."""
    e = _t_keyed(spark, sf_dir, "events", "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_millis(F.col("ts").cast("timestamp")) - F.unix_millis(F.lag("ts").over(w).cast("timestamp"))
    sess = F.sum(F.when(gap.isNull() | (gap > 1800_000), 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("session_value"))
    )


SQL_SESSIONIZE_EVENTS = """
WITH gaps AS (
  SELECT user_id, value, ts, event_id,
         epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  -- CAST(... AS BIGINT): DuckDB window-sums BIGINT into HUGEINT, which
  -- reaches the comparison frame as float64 and hash-mismatches the
  -- Spark bigint (round-1 verdict bug #2)
  SELECT user_id, value,
         CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM gaps
)
SELECT user_id, session_id, count(*) AS n_events, round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS session_value
FROM sess GROUP BY user_id, session_id
"""


def q_event_value_quantiles(spark, sf_dir):
    """Exact discrete percentiles (p50/p90/p99) per event_type via
    deterministic rank selection — true percentile_disc semantics:
    the rank cutoff ceil(p·n) is computed in EXACT INTEGER arithmetic,
    (n·num + den − 1) DIV den, on both engines.  (An IEEE-double ceil
    is off-by-one whenever p·n is an exact integer — ceil(0.9·10) =
    ceil(9.000000000000002) = 10 — which both engines happened to
    reproduce identically, but diverged from percentile_disc itself;
    round-2 ADVICE.)"""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    def pick(num: int, den: int, name: str):
        cutoff = F.expr(f"(n * {num} + {den} - 1) div {den}")
        return F.round(F.max(F.when(F.col("rn") == cutoff, F.col("value"))), 4).alias(name)
    return ranked.groupBy("event_type").agg(
        pick(1, 2, "p50"), pick(9, 10, "p90"), pick(99, 100, "p99")
    )


SQL_EVENT_VALUE_QUANTILES = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       round(max(CASE WHEN rn = (n * 1 + 2 - 1) // 2 THEN value END), 4) AS p50,
       round(max(CASE WHEN rn = (n * 9 + 10 - 1) // 10 THEN value END), 4) AS p90,
       round(max(CASE WHEN rn = (n * 99 + 100 - 1) // 100 THEN value END), 4) AS p99
FROM ranked GROUP BY event_type
"""


def _deciles_base(spark, sf_dir):
    """Distributed total order + local ids, PRE-checkpoint: the plan
    here is what runs against the data (range repartition + in-task
    sort, never a global single-task sort) — plan-shape-tested
    directly since q_order_value_deciles truncates it behind a
    localCheckpoint."""
    o = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    parts = spark.sparkContext.defaultParallelism
    return (
        o.repartitionByRange(parts, "o_totalprice", "o_orderkey")
        .sortWithinPartitions("o_totalprice", "o_orderkey")
        .withColumn("mid", F.monotonically_increasing_id())
        .withColumn("pid", F.shiftright(F.col("mid"), 33))
        .withColumn("lidx", F.col("mid").bitwiseAND(F.lit((1 << 33) - 1)))
    )


def q_order_value_deciles(spark, sf_dir):
    """Global decile assignment + per-decile bounds and percent_rank
    extremes — the DISTRIBUTED form.  Round 2 shipped the direct
    `ntile(10) OVER (ORDER BY …)` window, which is a single-task global
    sort (flagged `weak` — dies at 100×); this is the documented
    scale-safe alternative, proven equivalent by the unchanged
    ntile/percent_rank oracle:

      1. range-repartition + sortWithinPartitions on the total order
         (value, unique key) — a distributed sort, every task bounded;
      2. local index from monotonically_increasing_id (narrow: pid in
         the high bits, in-partition row number in the low 33);
      3. global rank = local index + broadcast per-partition offsets
         (prefix sums over one ≤`defaultParallelism`-row aggregate —
         the only single-partition window runs on that tiny agg, never
         on the data);
      4. decile/percent_rank from (rank, n) in exact integer arithmetic
         reproducing ntile's fill semantics: the first n%10 tiles get
         one extra row."""
    base = _deciles_base(spark, sf_dir)
    # three consumers (ranks, per-partition counts, total) —
    # localCheckpoint so the distributed sort + id assignment
    # materializes ONCE and every consumer reads the same ids.  NOT
    # persist(): a registry query can't own unpersist(), and CacheManager
    # entries are never GC-reclaimed — repeated calls in a long session
    # (bench best-of-3, the test suite) would accumulate full cached
    # copies; localCheckpoint blocks are freed by the ContextCleaner
    # when the RDD is collected
    base = base.localCheckpoint(eager=True)
    counts = base.groupBy("pid").agg(F.count("*").alias("cnt"))
    w_ofs = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(w_ofs), F.lit(0)).alias("offset")
    )
    total = counts.agg(F.sum("cnt").alias("n"))
    ranked = (
        base.join(F.broadcast(offsets), "pid")
        .crossJoin(F.broadcast(total))
        .withColumn("rank", F.col("offset") + F.col("lidx") + 1)
    )
    # ntile(10): q = n div 10 rows per tile, first r = n % 10 tiles get
    # one extra; ceil-division in exact integers (cf. percentile fix)
    decile = F.expr(
        "CASE WHEN rank <= ((n div 10) + 1) * (n % 10) "
        "THEN (rank + (n div 10)) div ((n div 10) + 1) "
        "ELSE (n % 10) + (rank - ((n div 10) + 1) * (n % 10) + (n div 10) - 1) div (n div 10) END"
    )
    pr = F.when(F.col("n") > 1, (F.col("rank") - 1).cast("double") / (F.col("n") - 1)).otherwise(0.0)
    return (
        ranked.select("o_totalprice", decile.cast("int").alias("decile"), pr.alias("pr"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.max("pr"), 6).alias("max_pr"),
        )
    )


SQL_ORDER_VALUE_DECILES = """
WITH ranked AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile,
         percent_rank() OVER (ORDER BY o_totalprice, o_orderkey) AS pr
  FROM orders
)
SELECT decile, count(*) AS n, round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi, round(max(pr), 6) AS max_pr
FROM ranked GROUP BY decile
"""


def q_order_rule_rollup(spark, sf_dir):
    """U3/U4 + A8: per-record fired-rule rollup, the err_all pattern
    (proccess_data.sql:814-841) on orders."""
    o = _t(spark, sf_dir, "orders")
    r_a = o.filter(F.col("o_totalprice") > 300000).select("o_orderkey", F.lit("R-A").alias("code"))
    r_b = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", F.lit("R-B").alias("code"))
    r_c = o.filter(F.col("o_orderpriority").startswith("1")).select("o_orderkey", F.lit("R-C").alias("code"))
    fired = r_a.unionByName(r_b).unionByName(r_c)
    return fired.groupBy("o_orderkey").agg(
        F.array_join(F.array_sort(F.collect_list("code")), ",").alias("codes")
    )


SQL_ORDER_RULE_ROLLUP = """
SELECT o_orderkey, array_to_string(list_sort(list(code)), ',') AS codes
FROM (
  SELECT o_orderkey, 'R-A' AS code FROM orders WHERE o_totalprice > 300000
  UNION ALL
  SELECT o_orderkey, 'R-B' FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT o_orderkey, 'R-C' FROM orders WHERE o_orderpriority LIKE '1%'
) GROUP BY o_orderkey
"""


def q_priority_case_ladder(spark, sf_dir):
    """P10 CASE→code ladder (proccess_data.sql:532-535 style), plus
    the P2/P3/P4/P5 normalization chain folded in as a second group
    key (the tmp_wikidata stage analog, proccess_data.sql:13-27 —
    consolidated from the retired `normalize_parts` registry slot):
    replace → empty → nullif → NULL → coalesce actually FIRES on the
    '4-NOT SPECIFIED' rows, and the split/element_at/coalesce chain
    fires its NULL branch on the synthesized 'UNSPECIFIED' label."""
    o = _t(spark, sf_dir, "orders")
    cls = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "warm")
        .otherwise("cold")
    )
    label = F.coalesce(
        F.nullif(
            F.replace(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED"), F.lit("")),
            F.lit(""),
        ),
        F.lit("UNSPECIFIED"),
    )
    # try_element_at: the 'UNSPECIFIED' label has no '-', and ANSI
    # element_at throws on out-of-bounds instead of returning NULL
    word = F.coalesce(F.try_element_at(F.split(label, "-"), F.lit(2)), F.lit("NONE"))
    # mean as exact decimal sum / count (order-independent), divided
    # once in doubles on both engines
    return o.groupBy(cls.alias("priority_class"), word.alias("prio_word")).agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double") / F.count("*"),
            2,
        ).alias("avg_price"),
    )


SQL_PRIORITY_CASE_LADDER = """
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
            ELSE 'cold' END AS priority_class,
       coalesce(string_split(
           coalesce(nullif(replace(o_orderpriority, '4-NOT SPECIFIED', ''), ''), 'UNSPECIFIED'),
           '-')[2], 'NONE') AS prio_word,
       count(*) AS n,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 2) AS avg_price
FROM orders GROUP BY 1, 2
"""


def q_nation_segments(spark, sf_dir):
    """A9/A11 collect_set + ordered concat (GROUP_CONCAT analog,
    wikidata_watercources.rq:4), plus the A3 ordered-collect-with-
    computed-sort-key pattern (array_agg(x ORDER BY f(x)),
    proccess_data.sql:53-61 — consolidated from the retired
    `orders_concat_sorted` registry slot): the five lowest-balance
    customer keys per nation via collect_list(struct) + array_sort +
    transform + slice."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    by_bal = F.array_sort(F.collect_list(F.struct("c_acctbal", "c_custkey")))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ";").alias("segments"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.array_join(
                F.slice(F.transform(by_bal, lambda s: s["c_custkey"].cast("string")), 1, 5),
                ",",
            ).alias("poorest5"),
        )
    )


SQL_NATION_SEGMENTS = """
SELECT n_name, string_agg(DISTINCT c_mktsegment, ';' ORDER BY c_mktsegment) AS segments,
       count(DISTINCT c_mktsegment) AS n_segments,
       array_to_string((list(c_custkey ORDER BY c_acctbal, c_custkey))[1:5], ',') AS poorest5
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_top_words(spark, sf_dir):
    """P4/J12 split + explode (unnest analog, proccess_data.sql:821)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(20)
    )


SQL_TOP_WORDS = """
SELECT word, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word ORDER BY cnt DESC, word LIMIT 20
"""


# ---------------------------------------------------------------------------
# Quality-filter rules on the documents table (SQL-differential variants
# of the pipeline's rule battery)
# ---------------------------------------------------------------------------

def _doc_words(t):
    return F.filter(F.split(t, " "), lambda w: w != "")


def q_rule_metrics(spark, sf_dir):
    """The three per-document scalar quality rules (word-count bounds,
    stopword density, mean word length — the Gopher/C4 rule family) in
    ONE scan: each rule's metric plus its fired flag.  Consolidates the
    former rule_word_bounds / rule_stopword_density / rule_mean_word_len
    demos — same expressions, one projection, one driver row instead of
    three (the 50-entry driver registry cap).  rule_top_word stays
    separate: it is a different physical shape (explode + two-level
    agg), not a scalar projection."""
    d = _t(spark, sf_dir, "documents")
    words = _doc_words(F.col("text"))
    n = F.size(words)
    nw = F.greatest(n, F.lit(1))
    # isin → codegen InSet hash lookup (round-6; value-identical to the
    # interpreted array_contains scan, ~4× faster per word)
    stop_list = sorted(STOPWORDS)
    stop_frac = F.size(
        F.filter(words, lambda w: F.lower(w).isin(*stop_list))
    ).cast("double") / nw
    mean = F.aggregate(words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)).cast(
        "double"
    ) / nw
    return d.select(
        "doc_id",
        n.alias("n_words"),
        ((n < R.MIN_WORDS) | (n > R.MAX_WORDS)).alias("bounds_fired"),
        F.round(stop_frac, 6).alias("stopword_frac"),
        (stop_frac < R.STOPWORD_FRAC_MIN).alias("stop_fired"),
        F.round(mean, 6).alias("mean_word_len"),
        ((mean < R.MIN_MEAN_WORD_LEN) | (mean > R.MAX_MEAN_WORD_LEN)).alias("len_fired"),
    )


SQL_RULE_METRICS = f"""
WITH s AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n,
         CAST(len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''),
                              x -> list_contains([{_STOP_SQL}], lower(x)))) AS DOUBLE)
           / greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1) AS frac,
         CAST(coalesce(list_sum(list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                                               x -> length(x))), 0) AS DOUBLE)
           / greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1) AS mean
  FROM documents
)
SELECT doc_id,
       CAST(n AS INT) AS n_words,
       (n < {R.MIN_WORDS} OR n > {R.MAX_WORDS}) AS bounds_fired,
       round(frac, 6) AS stopword_frac,
       frac < {R.STOPWORD_FRAC_MIN} AS stop_fired,
       round(mean, 6) AS mean_word_len,
       (mean < {R.MIN_MEAN_WORD_LEN} OR mean > {R.MAX_MEAN_WORD_LEN}) AS len_fired
FROM s
"""


def q_rule_top_word(spark, sf_dir):
    """Per-doc mode via explode + two-level agg (the scalable form of
    the repeated-content rule — A6 pattern per document)."""
    d = _t(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(_doc_words(F.col("text"))).alias("word"))
    counts = w.groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    per_doc = counts.groupBy("doc_id").agg(
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("frac")
    )
    return per_doc.select(
        "doc_id", F.round("frac", 6).alias("top_word_frac"), (F.col("frac") > R.TOP_WORD_FRAC_MAX).alias("fired")
    )


SQL_RULE_TOP_WORD = f"""
WITH c AS (
  SELECT doc_id, word, count(*) AS cnt
  FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        FROM documents)
  GROUP BY doc_id, word
),
f AS (SELECT doc_id, CAST(max(cnt) AS DOUBLE) / sum(cnt) AS frac FROM c GROUP BY doc_id)
SELECT doc_id, round(frac, 6) AS top_word_frac, frac > {R.TOP_WORD_FRAC_MAX} AS fired FROM f
"""


def q_doc_decisions(spark, sf_dir):
    """Single-pass rule battery + err_all rollup on documents (U3 note:
    all CASEs evaluated in one scan, codes joined as one string)."""
    d = _t(spark, sf_dir, "documents")
    words = _doc_words(F.col("text"))
    n = F.size(words)
    nw = F.greatest(n, F.lit(1)).cast("double")
    stop_list = sorted(STOPWORDS)
    stop_frac = F.size(F.filter(words, lambda w: F.lower(w).isin(*stop_list))) / nw
    mean = F.aggregate(words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)) / nw
    codes = F.concat_ws(
        ",",
        F.when(n < R.MIN_WORDS, "Q-1"),
        F.when(n > R.MAX_WORDS, "Q-2"),
        F.when((mean < R.MIN_MEAN_WORD_LEN) | (mean > R.MAX_MEAN_WORD_LEN), "Q-3"),
        F.when(stop_frac < R.STOPWORD_FRAC_MIN, "Q-6"),
    )
    return d.select("doc_id", codes.alias("codes"), (codes == "").alias("keep"))


SQL_DOC_DECISIONS = f"""
WITH s AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n,
         CAST(len(list_filter(list_filter(string_split(text, ' '), x -> x <> ''),
                              x -> list_contains([{_STOP_SQL}], lower(x)))) AS DOUBLE)
           / greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1) AS stop_frac,
         CAST(coalesce(list_sum(list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                                               x -> length(x))), 0) AS DOUBLE)
           / greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1) AS mean
  FROM documents
)
SELECT doc_id,
       concat_ws(',',
         CASE WHEN n < {R.MIN_WORDS} THEN 'Q-1' END,
         CASE WHEN n > {R.MAX_WORDS} THEN 'Q-2' END,
         CASE WHEN mean < {R.MIN_MEAN_WORD_LEN} OR mean > {R.MAX_MEAN_WORD_LEN} THEN 'Q-3' END,
         CASE WHEN stop_frac < {R.STOPWORD_FRAC_MIN} THEN 'Q-6' END) AS codes,
       (concat_ws(',',
         CASE WHEN n < {R.MIN_WORDS} THEN 'Q-1' END,
         CASE WHEN n > {R.MAX_WORDS} THEN 'Q-2' END,
         CASE WHEN mean < {R.MIN_MEAN_WORD_LEN} OR mean > {R.MAX_MEAN_WORD_LEN} THEN 'Q-3' END,
         CASE WHEN stop_frac < {R.STOPWORD_FRAC_MIN} THEN 'Q-6' END) = '') AS keep
FROM s
"""


# ---------------------------------------------------------------------------
# Text analysis / dedup / similarity operators
# ---------------------------------------------------------------------------

def q_text_metrics(spark, sf_dir):
    """Token counts (whitespace + BPE-ish regex) + composite quality
    score + md5 content fingerprint in one scan — consolidates the
    former token_counts / quality_score / fingerprints driver rows."""
    return X.text_metrics(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_lang_markers(spark, sf_dir):
    return X.lang_markers(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_dedup_exact(spark, sf_dir):
    return D.exact_duplicates(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_dedup_minhash_lsh(spark, sf_dir):
    return D.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", rebalance=False
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_simhash(spark, sf_dir):
    return D.simhash(
        _t(spark, sf_dir, "documents"), "doc_id", "text", rebalance=False
    ).select(
        F.col("doc_id").alias("doc"), "simhash"
    )


def q_ann_bruteforce(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)


def q_ann_lsh_top1(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return S.lsh_top1(emb, emb.filter(F.col("vec_id") < 5))


def q_orders_concat_sorted(spark, sf_dir):
    """A3 ordered collect with computed sort key (array_agg(x ORDER BY
    f(x)), proccess_data.sql:53-61): collect_list(struct) + array_sort
    + transform."""
    o = _t(spark, sf_dir, "orders")
    arr = F.array_sort(F.collect_list(F.struct("o_orderdate", "o_orderkey")))
    return o.groupBy("o_custkey").agg(
        F.array_join(F.transform(arr, lambda s: s["o_orderkey"].cast("string")), ",").alias("orderkeys")
    )


SQL_ORDERS_CONCAT_SORTED = """
SELECT o_custkey,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderdate, o_orderkey) AS orderkeys
FROM orders GROUP BY o_custkey
"""


def q_cust_supp_nation_matrix(spark, sf_dir):
    """J6 double join of the same dim (role lookup for two sides,
    proccess_data.sql:282-286): nation joined once for the customer
    side and once for the supplier side of each lineitem."""
    # same deliberate strategy as q_region_revenue (guide §3.1,
    # round-6): SHUFFLE_HASH for the one fact-sized join side, no
    # round-robin pre-repartition ahead of the join exchanges
    li = _t(spark, sf_dir, "lineitem", rebalance=False)
    o = _t(spark, sf_dir, "orders", rebalance=False)
    c = _t(spark, sf_dir, "customer", rebalance=False)
    su = _t(spark, sf_dir, "supplier", rebalance=False)
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o.hint("SHUFFLE_HASH"), li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("cnk"))
        .join(F.broadcast(n2), su.s_nationkey == F.col("snk"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)") * (1 - F.col("l_discount").cast("decimal(18,4)"))).cast("double"), 2).alias("revenue"))
    )


SQL_CUST_SUPP_NATION_MATRIX = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY 1, 2
"""


def q_asof_view_before_purchase(spark, sf_dir):
    """As-of backward join (SURVEY.md §2.3 'absent' row): latest
    view-event value at or before each purchase, per user — union +
    running last_value, one shuffle (wtq/operators/asof.py)."""
    from wtq.operators.asof import asof_join_backward

    e = _t_keyed(spark, sf_dir, "events", "user_id")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("v"))
    )
    out = asof_join_backward(purchases, views, key="user_id", ts="ts", value_col="v", out_col="last_view_value")
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.round("last_view_value", 4).alias("last_view_value"),
    )


SQL_ASOF_VIEW_BEFORE_PURCHASE = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
views AS (
  SELECT user_id, ts, max_by(value, event_id) AS v
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms, round(v.v, 4) AS last_view_value
FROM purchases p ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def q_normalize_parts(spark, sf_dir):
    """P2 replace + P3 nullif + P4 split + P5 coalesce in one
    normalization pass (the tmp_wikidata stage analog,
    proccess_data.sql:13-27)."""
    p = _t(spark, sf_dir, "part")
    brand_num = F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit(""))
    first_type_word = F.element_at(F.split("p_type", " "), 1)
    return (
        p.select(
            brand_num.alias("brand_num"),
            F.coalesce(F.nullif(first_type_word, F.lit("")), F.lit("unknown")).alias("type_head"),
        )
        .groupBy("brand_num", "type_head")
        .agg(F.count("*").alias("n"))
    )


SQL_NORMALIZE_PARTS = """
SELECT replace(p_brand, 'Brand#', '') AS brand_num,
       coalesce(nullif(string_split(p_type, ' ')[1], ''), 'unknown') AS type_head,
       count(*) AS n
FROM part GROUP BY 1, 2
"""


def q_intersect_except(spark, sf_dir):
    """Set ops noted absent in the reference (SURVEY.md §2.7):
    INTERSECT and EXCEPT over customer key sets."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    # decimal-domain sum (DEVNOTES §9): a double sum's last ulp depends
    # on partition merge order, and this one feeds a > threshold that
    # flips MEMBERSHIP, not just a rounded digit
    big_spenders = (
        o.groupBy("o_custkey").agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s"))
        .filter(F.col("s") > 500000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    # global agg (not groupBy) so an empty set still yields its 0-count
    # row, matching the SQL scalar counts
    inter = building.intersect(big_spenders).agg(F.count("*").alias("n")).withColumn(
        "setop", F.lit("intersect")
    )
    exc = building.exceptAll(big_spenders).distinct().agg(F.count("*").alias("n")).withColumn(
        "setop", F.lit("except")
    )
    return inter.unionByName(exc).select("setop", "n")


SQL_INTERSECT_EXCEPT = """
WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
big AS (SELECT o_custkey AS c_custkey FROM orders GROUP BY 1
        HAVING sum(CAST(o_totalprice AS DECIMAL(18,4))) > 500000)
SELECT 'intersect' AS setop, count(*) AS n FROM (SELECT * FROM building INTERSECT SELECT * FROM big)
UNION ALL
SELECT 'except', count(*) FROM (SELECT * FROM building EXCEPT SELECT * FROM big)
"""


def q_props_keys(spark, sf_dir):
    """J12/P7 map-key surface + §2.7 set ops in ONE registry slot
    (consolidated from the retired `intersect_except` entry):

    * facet='key'      — JSON props → map, explode keys
      (jsonb_object_keys analog, proccess_data.sql:635), count per key;
    * facet='intersect'/'except' — the user_id sets of 'view' vs
      'purchase' events (restricted by map_contains_key, the `?`
      operator P7) compared with Spark intersect / exceptAll+distinct
      vs the SQL INTERSECT / EXCEPT — non-vacuous on the fixture
      (users overlap but neither set contains the other)."""
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    keyed = e.select("user_id", "event_type", m.alias("pm"))
    per_key = (
        keyed.select(F.explode(F.map_keys("pm")).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("n"))
        .select(F.lit("key").alias("facet"), "key", "n")
    )
    viewers = (
        keyed.filter((F.col("event_type") == "view") & F.map_contains_key("pm", "k"))
        .select("user_id")
        .distinct()
    )
    buyers = (
        keyed.filter((F.col("event_type") == "purchase") & F.map_contains_key("pm", "k"))
        .select("user_id")
        .distinct()
    )
    # global agg (not groupBy) so an empty set still yields its 0-count
    # row, matching the SQL scalar counts
    inter = viewers.intersect(buyers).agg(F.count("*").alias("n")).select(
        F.lit("intersect").alias("facet"), F.lit(None).cast("string").alias("key"), "n"
    )
    exc = viewers.exceptAll(buyers).distinct().agg(F.count("*").alias("n")).select(
        F.lit("except").alias("facet"), F.lit(None).cast("string").alias("key"), "n"
    )
    return per_key.unionByName(inter).unionByName(exc)


SQL_PROPS_KEYS = """
WITH viewers AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'view' AND list_contains(json_keys(props), 'k')
), buyers AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND list_contains(json_keys(props), 'k')
)
SELECT 'key' AS facet, key, count(*) AS n
FROM (SELECT unnest(json_keys(props)) AS key FROM events)
GROUP BY key
UNION ALL
SELECT 'intersect', NULL, count(*) FROM (SELECT * FROM viewers INTERSECT SELECT * FROM buyers)
UNION ALL
SELECT 'except', NULL, count(*) FROM (SELECT * FROM viewers EXCEPT SELECT * FROM buyers)
"""


def q_embedding_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup: SRP-bucketed candidates + exact
    cosine threshold.  Runs over the fixture augmented with planted
    clones (the raw fixture has no cosine ≥ 0.8 pair, which made the
    round-1 row vacuous); the oracle plants identically."""
    return S.embedding_dup_pairs(S.with_planted_dups(_t(spark, sf_dir, "embeddings")))


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: coarse-quantizer cell assignment (broadcast) +
    within-cell top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, emb.filter(F.col("vec_id") < 5))


def q_simhash_near_pairs(spark, sf_dir):
    """Banded Hamming join over SimHash signatures: candidates share a
    15-bit chunk (equi-join), exact distance via bit_count(xor)."""
    return D.simhash_near_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", rebalance=False
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER resolution (pairs under-delete transitive
    duplicates): connected components over the MinHash-LSH pair graph
    via iterative min-label propagation; oracle is a recursive-CTE
    transitive closure — an independent derivation."""
    return D.dedup_clusters(
        _t(spark, sf_dir, "documents"), "doc_id", "text", rebalance=False
    )


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def q_profile_orders(spark, sf_dir):
    """Data-profiling pass (quality telemetry a curation pipeline runs
    before training): per-column null and exact distinct counts in ONE
    aggregate over one scan, unpivoted to long form with stack()."""
    o = _t(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    wide = o.agg(*aggs)
    stack = "stack({}, {}) as (column, n_nulls, n_distinct)".format(
        len(_PROFILE_COLS),
        ", ".join(f"'{c}', {c}__nulls, {c}__distinct" for c in _PROFILE_COLS),
    )
    return wide.selectExpr(stack)


SQL_PROFILE_ORDERS = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS column, count(*) - count({c}) AS n_nulls, "
    f"count(DISTINCT {c}) AS n_distinct FROM orders"
    for c in _PROFILE_COLS
)


def q_dedup_apply(spark, sf_dir):
    """The deletion step that closes the dedup loop: resolve near-dup
    clusters (MinHash-LSH pairs → connected components), keep ONE
    representative per cluster (the min id), drop the rest, and report
    the corpus accounting.  Left-anti join against the non-
    representative member set — the keep-one contract a training-data
    pipeline actually executes."""
    d = _t(spark, sf_dir, "documents")
    cc = D.dedup_resolution(d, "doc_id", "text", rebalance=False)
    drop = cc.filter(F.col("node") != F.col("cluster")).select(
        F.col("node").alias("doc_id")
    )
    kept = d.join(drop, "doc_id", "left_anti")
    return kept.agg(
        F.count("*").alias("n_kept"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def sql_dedup_apply(table: str, id_col: str, text_col: str) -> str:
    return f"""
    WITH RECURSIVE {D._sql_dedup_labels(table, id_col, text_col)},
    dropped AS (SELECT node AS {id_col} FROM labels WHERE node <> cluster)
    SELECT count(*) AS n_kept, count(DISTINCT lang) AS n_langs,
           min({id_col}) AS min_doc, max({id_col}) AS max_doc
    FROM {table} WHERE {id_col} NOT IN (SELECT {id_col} FROM dropped)
    """


def q_dataset_split_counts(spark, sf_dir):
    """Deterministic train/val/test assignment (98/1/1) by content
    hash — the standard leakage-safe split: a document's split is a
    pure function of its id, stable across reruns, engines, and
    cluster sizes (rand()-based splits are none of those).  Bucket =
    md5-derived 60-bit int mod 1000, reproducible bit-for-bit in the
    oracle."""
    d = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
        % 1000
    )
    split = (
        F.when(bucket < 980, "train").when(bucket < 990, "val").otherwise("test")
    )
    return d.groupBy(split.alias("split")).agg(
        F.count("*").alias("n"),
        F.countDistinct("lang").alias("n_langs"),
    )


SQL_DATASET_SPLIT_COUNTS = """
WITH b AS (
  SELECT lang,
         (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000) AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 980 THEN 'train'
            WHEN bucket < 990 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n, count(DISTINCT lang) AS n_langs
FROM b GROUP BY 1
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (training-data subsetting):
    top-5 docs per lang ordered by md5(doc_id) — a content-hash
    pseudo-random order both engines reproduce exactly, unlike
    rand()/SAMPLE which never cross-engine-match."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "doc_id", F.col("rn").cast("int").alias("rank"))
    )


SQL_STRATIFIED_SAMPLE = """
SELECT lang, doc_id, CAST(rn AS INT) AS rank FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 5
"""


def q_tfidf_top_terms(spark, sf_dir):
    """TF-IDF top-3 terms per document (top 50 docs for output size):
    explode → per-doc TF → per-term DF → window top-k.  Classic
    corpus-statistics join shape: the doc-frequency side is a
    broadcast-sized aggregate at any corpus size relative to the token
    stream.  ln() domain kept integral-ratio so both engines emit
    bit-identical doubles."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # corpus size as a broadcast one-row aggregate, NOT a driver-side
    # d.count(): an eager action here would run a full scan job at
    # plan-construction time for every caller that only wants the plan
    n_docs = d.agg(F.count("*").cast("double").alias("n_docs"))
    df_ = tok.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", F.col("rn").cast("int").alias("rank"))
    )


SQL_TFIDF_TOP_TERMS = """
WITH d AS (SELECT * FROM documents WHERE doc_id < 50),
tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM d
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM d),
scored AS (
  SELECT doc_id, term,
         round(tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
) WHERE rank <= 3
"""


def q_nb_quality_scores(spark, sf_dir):
    """Model-based quality filter (the CCNet/GPT-3 classifier layer the
    reference's CASE-ladder rules lack, proccess_data.sql:244-420):
    closed-form Naive-Bayes log-odds trained on a seed slice (40% of
    docs, label = lang='en' as the curated-reference proxy), scored on
    the held-out complement.  Training is two aggregations over the
    seed; scoring is a zero-shuffle broadcast-map pass with an exact
    integer micro-unit score (order-independent — no float-summation
    nondeterminism; see wtq/operators/classifier.py)."""
    d = _t(spark, sf_dir, "documents")
    return CL.nb_quality_scores(
        d,
        seed_pred=F.col("doc_id") % 5 < 2,
        pos_pred=F.col("lang") == "en",
    )


SQL_NB_QUALITY_SCORES = CL.sql_nb_quality_scores(
    "documents",
    "doc_id",
    "text",
    seed_sql="doc_id % 5 < 2",
    pos_sql="lang = 'en'",
)


def q_nb_score_threshold(spark, sf_dir):
    """DCLM-style calibration on top of the model-based scores: the
    exact threshold keeping the top 20% of held-out docs.  Distributed
    k-th-largest via the order_value_deciles rank discipline (range
    repartition + broadcast prefix offsets — no global single-task
    sort, no whole-column percentile buffer); oracle = window
    row_number over the same scored set."""
    scored = q_nb_quality_scores(spark, sf_dir)
    return CL.score_threshold_for_keep_rate(scored, 1, 5)


SQL_NB_SCORE_THRESHOLD = f"""
WITH scored AS ({SQL_NB_QUALITY_SCORES}),
r AS (
  SELECT score_micro,
         row_number() OVER (ORDER BY score_micro DESC) AS rn,
         count(*) OVER () AS n
  FROM scored
)
SELECT score_micro AS threshold_micro,
       CAST(greatest(1, (n * 1) // 5) AS BIGINT) AS k,
       CAST(n AS BIGINT) AS n
FROM r WHERE rn = greatest(1, (n * 1) // 5)
"""


def q_spatial_radius_join(spark, sf_dir):
    """Spatial-predicate join (st_dwithin/st_intersects analog,
    proccess_data.sql:148-172, KNN `<->` :424-436): grid-cell bucketed
    candidate equi-join + exact distance filter.  The oracle is the
    NAIVE quadratic distance join, so the differential gate proves the
    grid join's recall is exact — not merely mirrored."""
    a = G.synth_points(_t(spark, sf_dir, "customer"), "c_custkey", 37, 91)
    b = G.synth_points(_t(spark, sf_dir, "supplier"), "s_suppkey", 53, 17)
    return G.grid_radius_join(a, b)


def q_multimodal_features(spark, sf_dir):
    """Binary-payload plumbing: mapInPandas feature extraction over an
    opaque blob column (decode stubbed — wtq/operators/multimodal.py)."""
    from wtq.operators.multimodal import multimodal_features

    return multimodal_features(_t(spark, sf_dir, "documents"))


def q_media_features(spark, sf_dir):
    """ALL THREE real decode paths in one mapInPandas pass — image
    (binary P6 PPM byte-level decode + block-mean resize + channel
    stats), audio (RIFF/PCM16 chunk-walk decode + RMS/zero-crossings),
    and video (multi-frame PPM stream walk, every-3rd-frame sampling).
    The oracle re-derives every feature in closed form from the
    synthetic formulas and joins the three modalities on doc_id, so a
    decoder bug in any path cannot self-confirm.  Consolidates the
    former image_features / audio_features / video_features rows."""
    from wtq.operators.multimodal import media_features

    return media_features(_t(spark, sf_dir, "documents"))


def q_stream_windowed_counts(spark, sf_dir):
    """Structured Streaming (Trigger.AvailableNow) windowed rollup with
    watermark — equals the batch time_bucket rollup on a static input."""
    import tempfile

    from wtq.streaming.ingest import windowed_event_counts

    return windowed_event_counts(spark, sf_dir, tempfile.mkdtemp(prefix="wtq_stream_ckpt_"))


def q_stream_dedup_join_counts(spark, sf_dir):
    """Streaming dedup (replayed-×2 input, dropDuplicates within a
    watermark) + stream-static broadcast join + rollup — the batch
    oracle counts each event once, so a dedup regression doubles n."""
    import tempfile

    from wtq.streaming.ingest import stream_dedup_join_counts

    return stream_dedup_join_counts(spark, sf_dir, tempfile.mkdtemp(prefix="wtq_sdedup_ckpt_"))


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Corpus-curation extras (wtq/operators/curation.py)
# ---------------------------------------------------------------------------

def q_decontaminate(spark, sf_dir):
    """Benchmark 13-gram decontamination (C4/GPT-3 protocol): flag
    corpus docs sharing any 13-gram with the self-contained benchmark
    set.  Broadcast semi-join on md5(gram) digests — J7/J11 shapes."""
    from wtq.operators import curation as C

    return C.decontaminate(_t(spark, sf_dir, "documents"))


def q_incremental_corpus_dedup(spark, sf_dir):
    """Crawl-vs-corpus incremental dedup: left-anti on content
    fingerprints (the J7 'already reported' filter) + min-id
    representative per novel fingerprint within the new batch."""
    from wtq.operators import curation as C

    return C.incremental_corpus_dedup(_t(spark, sf_dir, "documents"))


def q_token_budget_sample(spark, sf_dir):
    """Per-host token-budget sampling: hash-priority running sum
    (partitioned ROWS-frame window — never a global sort) cut at the
    budget.  The domain-quota step of a training-mix build."""
    from wtq.operators import curation as C

    return C.token_budget_sample(_t(spark, sf_dir, "documents"))


def q_source_quality_gate(spark, sf_dir):
    """Domain-level quality gate: per-host aggregate signals →
    keep/drop verdict per host (broadcast-sized output)."""
    from wtq.operators import curation as C

    return C.source_quality_gate(_t(spark, sf_dir, "documents"))


def q_strip_boilerplate(spark, sf_dir):
    """Corpus-wide boilerplate line removal (C4/CCNet pass): lines in
    more than BOILERPLATE_DF_CAP distinct docs are stripped and texts
    rebuilt in order.  The documents fixture is single-line, so both
    engines first chunk each text into 10-word pseudo-lines with the
    identical derivation; the operator itself runs on real newline
    lines (planted-case tests use the pages corpus shape)."""
    from wtq.operators import curation as C

    d = _t(spark, sf_dir, "documents")
    n = C.BOILERPLATE_CHUNK_WORDS
    ws = C._words(F.col("text"))  # the shared tokenization the oracle mirrors
    chunked = F.when(
        F.size(ws) > 0,
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.ceil(F.size(ws) / F.lit(float(n))).cast("int") - 1),
                lambda i: F.array_join(F.slice(ws, i * n + 1, n), " "),
            ),
            "\n",
        ),
    ).otherwise("")
    return C.strip_boilerplate_lines(
        d.select("doc_id", chunked.alias("text")), "doc_id", "text"
    )


# ---------------------------------------------------------------------------
# Round-5 additions: html→text extraction + url canonicalization.
# Both synthesize their messy inputs IN-QUERY from the `documents`
# table with byte-identical expressions on each engine — the driver's
# DuckDB side only has the ten pre-registered views, so the pages
# table's html column cannot be the demo input; the operator itself is
# input-agnostic (wtq/operators/text.py).
# ---------------------------------------------------------------------------

def q_html_to_text(spark, sf_dir):
    """Visible-text extraction from an HTML payload (the reference's
    per-record tag cleaning, water.lua:84-221, as a corpus operator):
    script/style/comment blocks dropped, tags counted + stripped,
    entities decoded, whitespace collapsed.  The synthesized wrapper
    plants every strip class: a script with quotes, a style block, a
    comment, double-encoded entities, and attribute-bearing tags."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>Doc "), did,
        F.lit('</title><script type="text/javascript">var t = track("'), did,
        F.lit('");</script><style>.m{color:#fff}</style></head><body>'
              "<!-- crawl artifact --><h1>R&amp;D &lt;notes&gt;</h1><p>"),
        F.col("text"),
        F.lit('</p><div class="footer">&quot;fin&quot;&nbsp;&#39;ok&#39;</div></body></html>'),
    )
    return X.html_to_text(
        d.select("doc_id", html.alias("html")), "doc_id", "html"
    )


_SQL_HTML_WRAP = (
    "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || "
    "'</title><script type=\"text/javascript\">var t = track(\"' || CAST(doc_id AS VARCHAR) || "
    "'\");</script><style>.m{color:#fff}</style></head><body>"
    "<!-- crawl artifact --><h1>R&amp;D &lt;notes&gt;</h1><p>' || text || "
    "'</p><div class=\"footer\">&quot;fin&quot;&nbsp;&#39;ok&#39;</div></body></html>'"
)

SQL_HTML_TO_TEXT = f"""
WITH h AS (SELECT doc_id, {_SQL_HTML_WRAP} AS html FROM documents)
{X.sql_html_to_text('h', 'doc_id', 'html')}
"""


def q_normalize_url(spark, sf_dir):
    """Url canonicalization ahead of re-crawl dedup (C4/RefinedWeb
    discipline): case-folded scheme+authority, default port dropped,
    fragment dropped, tracking params (utm_*/fbclid/gclid/ref)
    removed, survivors sorted, trailing slash stripped.  The
    synthesized urls plant every rule: mixed case, :443 on https, a
    conditional trailing slash, unsorted params with two trackers,
    and a fragment."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    url = F.concat(
        F.lit("HTTPS://WWW.Example"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM:443/Docs/"), did,
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&z=9&gclid=abc&a="), (F.col("doc_id") % 5).cast("string"),
        F.lit("#sec"), did,
    )
    return X.normalize_urls(d.select("doc_id", url.alias("u")), "doc_id", "u")


SQL_NORMALIZE_URL = f"""
WITH u AS (
  SELECT doc_id,
         'HTTPS://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM:443/Docs/' ||
         CAST(doc_id AS VARCHAR) || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
         '?utm_source=feed&z=9&gclid=abc&a=' || CAST(doc_id % 5 AS VARCHAR) ||
         '#sec' || CAST(doc_id AS VARCHAR) AS u
  FROM documents)
{X.sql_normalize_urls('u', 'doc_id', 'u')}
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pricing_summary": q_pricing_summary,
    "region_revenue": q_region_revenue,
    "rollup_acctbal": q_rollup_acctbal,
    "top_customer_per_nation": q_top_customer_per_nation,
    "customers_without_orders": q_customers_without_orders,
    "duplicate_part_supp": q_duplicate_part_supp,
    "supplier_pairs_per_nation": q_supplier_pairs_per_nation,
    "orders_array_membership": q_orders_array_membership,
    "event_pivot": q_event_pivot,
    "latest_event_per_user": q_latest_event_per_user,
    "event_json_stats": q_event_json_stats,
    "sessionize_events": q_sessionize_events,
    "order_rule_rollup": q_order_rule_rollup,
    "priority_case_ladder": q_priority_case_ladder,
    "nation_segments": q_nation_segments,
    "top_words": q_top_words,
    # round 5 (session 2): rule_metrics rotated to EXTRA — its three
    # scalar rule expressions are each exercised end-to-end by the
    # registered doc_decisions (full rule battery) and text_metrics
    # (token/quality scalars); slot freed for the model-based quality
    # classifier, a whole operator family (seed-trained scorer) the
    # registry did not yet witness
    "nb_quality_scores": q_nb_quality_scores,
    # round 5: rule_top_word rotated to EXTRA (its explode + two-level
    # agg shape is also witnessed by top_words/tfidf_top_terms) to free
    # the slot for html_to_text, which exercises a whole new input
    # class (the pages html payload's cleaning chain)
    "html_to_text": q_html_to_text,
    "doc_decisions": q_doc_decisions,
    "text_metrics": q_text_metrics,
    "lang_markers": q_lang_markers,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "simhash": q_simhash,
    "ann_bruteforce": q_ann_bruteforce,
    "ann_lsh_top1": q_ann_lsh_top1,
    "multimodal_features": q_multimodal_features,
    "stream_windowed_counts": q_stream_windowed_counts,
    "stream_dedup_join_counts": q_stream_dedup_join_counts,
    "order_value_deciles": q_order_value_deciles,
    "cust_supp_nation_matrix": q_cust_supp_nation_matrix,
    "asof_view_before_purchase": q_asof_view_before_purchase,
    "props_keys": q_props_keys,
    "simhash_near_pairs": q_simhash_near_pairs,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "ann_ivf_topk": q_ann_ivf_topk,
    "spatial_radius_join": q_spatial_radius_join,
    "dedup_clusters": q_dedup_clusters,
    "dedup_apply": q_dedup_apply,
    "stratified_sample": q_stratified_sample,
    "dataset_split_counts": q_dataset_split_counts,
    "profile_orders": q_profile_orders,
    "tfidf_top_terms": q_tfidf_top_terms,
    "media_features": q_media_features,
    # round-3 curation family, rotated INTO the driver registry in
    # round 4 (round-3 verdict "Next round" #1) in slots freed by
    # consolidating single-scalar-pattern demos into multi-witness
    # queries (see EXTRA_QUERIES below for the retired slots)
    "decontaminate": q_decontaminate,
    "incremental_corpus_dedup": q_incremental_corpus_dedup,
    "token_budget_sample": q_token_budget_sample,
    "source_quality_gate": q_source_quality_gate,
    "strip_boilerplate": q_strip_boilerplate,
}

ORACLE_SQL: dict[str, str] = {
    "pricing_summary": SQL_PRICING_SUMMARY,
    "region_revenue": SQL_REGION_REVENUE,
    "rollup_acctbal": SQL_ROLLUP_ACCTBAL,
    "top_customer_per_nation": SQL_TOP_CUSTOMER_PER_NATION,
    "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
    "duplicate_part_supp": SQL_DUPLICATE_PART_SUPP,
    "supplier_pairs_per_nation": SQL_SUPPLIER_PAIRS_PER_NATION,
    "orders_array_membership": SQL_ORDERS_ARRAY_MEMBERSHIP,
    "event_pivot": SQL_EVENT_PIVOT,
    "latest_event_per_user": SQL_LATEST_EVENT_PER_USER,
    "event_json_stats": SQL_EVENT_JSON_STATS,
    "sessionize_events": SQL_SESSIONIZE_EVENTS,
    "order_rule_rollup": SQL_ORDER_RULE_ROLLUP,
    "priority_case_ladder": SQL_PRIORITY_CASE_LADDER,
    "nation_segments": SQL_NATION_SEGMENTS,
    "top_words": SQL_TOP_WORDS,
    "nb_quality_scores": SQL_NB_QUALITY_SCORES,
    "html_to_text": SQL_HTML_TO_TEXT,
    "doc_decisions": SQL_DOC_DECISIONS,
    "text_metrics": X.sql_text_metrics("documents", "doc_id", "text"),
    "lang_markers": X.sql_lang_markers("documents", "doc_id", "text"),
    "dedup_exact": D.sql_exact_duplicates("documents", "doc_id", "text"),
    "dedup_minhash_lsh": D.sql_minhash_lsh_pairs("documents", "doc_id", "text"),
    "dedup_ngram_jaccard": D.sql_ngram_jaccard_pairs("documents", "doc_id", "text"),
    "simhash": D.sql_simhash("documents", "doc_id", "text"),
    "ann_bruteforce": S.sql_brute_force_topk("embeddings"),
    "ann_lsh_top1": S.sql_lsh_top1("embeddings"),
    "cust_supp_nation_matrix": SQL_CUST_SUPP_NATION_MATRIX,
    "asof_view_before_purchase": SQL_ASOF_VIEW_BEFORE_PURCHASE,
    "props_keys": SQL_PROPS_KEYS,
    "simhash_near_pairs": D.sql_simhash_near_pairs("documents", "doc_id", "text"),
    "embedding_dup_pairs": S.sql_embedding_dup_pairs("embeddings"),
    "ann_ivf_topk": S.sql_ivf_topk("embeddings"),
    "spatial_radius_join": G.sql_grid_radius_join(
        "customer", "c_custkey", 37, 91, "supplier", "s_suppkey", 53, 17
    ),
    "dedup_clusters": D.sql_dedup_clusters("documents", "doc_id", "text"),
    "dedup_apply": sql_dedup_apply("documents", "doc_id", "text"),
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "dataset_split_counts": SQL_DATASET_SPLIT_COUNTS,
    "profile_orders": SQL_PROFILE_ORDERS,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "order_value_deciles": SQL_ORDER_VALUE_DECILES,
}

# late imports to keep module import light
from wtq.operators.multimodal import sql_multimodal_features as _sql_mm  # noqa: E402
from wtq.streaming.ingest import SQL_WINDOWED_EVENT_COUNTS as _sql_stream  # noqa: E402

ORACLE_SQL["multimodal_features"] = _sql_mm("documents", "doc_id", "text")

from wtq.operators.multimodal import sql_media_features as _sql_media  # noqa: E402

ORACLE_SQL["media_features"] = _sql_media("documents")
ORACLE_SQL["stream_windowed_counts"] = _sql_stream

from wtq.streaming.ingest import SQL_STREAM_DEDUP_JOIN_COUNTS as _sql_sdedup  # noqa: E402

ORACLE_SQL["stream_dedup_join_counts"] = _sql_sdedup

from wtq.operators import curation as _C  # noqa: E402

ORACLE_SQL["decontaminate"] = _C.SQL_DECONTAMINATE
ORACLE_SQL["incremental_corpus_dedup"] = _C.SQL_INCREMENTAL_CORPUS_DEDUP
ORACLE_SQL["token_budget_sample"] = _C.SQL_TOKEN_BUDGET_SAMPLE
ORACLE_SQL["source_quality_gate"] = _C._sql_source_quality_gate(_STOP_SQL)
ORACLE_SQL["strip_boilerplate"] = _C.SQL_STRIP_BOILERPLATE

# ---------------------------------------------------------------------------
# EXTRA registry: ops beyond the 50-entry driver cap.  The external
# driver records CORRECTNESS rows for at most 50 queries() entries
# (round 2 registered 56, exactly 50 landed), so QUERIES is frozen at
# exactly 50.  Round 4 rotated the five curation operators INTO the
# driver registry (round-3 verdict, "Next round" #1); the slots were
# freed by consolidating single-scalar-pattern demos into retained
# multi-witness queries — each retired entry's §2 pattern is still
# witnessed by a registered query (COVERAGE.md has the mapping):
#   * segment_order_stats    → multi-agg single group ⊂ pricing_summary
#   * normalize_parts        → P2/P3/P4/P5 chain folded into
#                              priority_case_ladder's prio_word key
#   * orders_concat_sorted   → A3 ordered collect folded into
#                              nation_segments.poorest5
#   * intersect_except       → §2.7 set ops folded into props_keys
#                              facets
#   * event_value_quantiles  → exact quantiles witnessed by
#                              order_value_deciles (the distributed
#                              form)
#   * rule_top_word (round 5) → explode + two-level agg witnessed by
#                              top_words and tfidf_top_terms; slot
#                              freed for html_to_text
#   * rule_metrics (round 5, session 2) → three scalar rule exprs
#                              each witnessed end-to-end by
#                              doc_decisions (rule battery) and
#                              text_metrics; slot freed for
#                              nb_quality_scores (model-based filter)
# normalize_url (round 5) is EXTRA-only from birth: the registry is
# capped and the url-canonicalization differential is fully pinned by
# the pytest gate below.
# These extras keep the IDENTICAL DuckDB-oracle differential gate via
# pytest (tests/test_queries_oracle.py parametrizes QUERIES ∪ EXTRA).
# ---------------------------------------------------------------------------
EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "segment_order_stats": q_segment_order_stats,
    "normalize_parts": q_normalize_parts,
    "orders_concat_sorted": q_orders_concat_sorted,
    "intersect_except": q_intersect_except,
    "event_value_quantiles": q_event_value_quantiles,
    "rule_top_word": q_rule_top_word,
    "normalize_url": q_normalize_url,
    "rule_metrics": q_rule_metrics,
    "nb_score_threshold": q_nb_score_threshold,
}

EXTRA_ORACLE_SQL: dict[str, str] = {
    "segment_order_stats": SQL_SEGMENT_ORDER_STATS,
    "normalize_parts": SQL_NORMALIZE_PARTS,
    "orders_concat_sorted": SQL_ORDERS_CONCAT_SORTED,
    "intersect_except": SQL_INTERSECT_EXCEPT,
    "event_value_quantiles": SQL_EVENT_VALUE_QUANTILES,
    "rule_top_word": SQL_RULE_TOP_WORD,
    "normalize_url": SQL_NORMALIZE_URL,
    "rule_metrics": SQL_RULE_METRICS,
    "nb_score_threshold": SQL_NB_SCORE_THRESHOLD,
}

assert len(QUERIES) == 50, f"driver registry must stay at 50, got {len(QUERIES)}"
assert set(QUERIES) == set(ORACLE_SQL)
assert set(EXTRA_QUERIES) == set(EXTRA_ORACLE_SQL)
assert not set(EXTRA_QUERIES) & set(QUERIES)
