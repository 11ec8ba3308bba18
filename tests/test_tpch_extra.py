"""Extra TPC-H-shaped workload queries, differential against DuckDB.

Beyond the six driver-contract TPC-H queries — these run as pytest
differentials (adapted to the driver schema subset: no partsupp, no
ship/commit/receipt-mode columns beyond l_shipdate). Sums compare as
integer cents (the _dsum discipline) to keep float summation order out
of the assertion.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kafi_spark.session import read_table


def _cents(col):
    return F.sum(F.round(col * 100).cast("long"))


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "nation", "part"]:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


def test_q10_returned_items(spark, sf_dir, con):
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    got = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_cents(rev).alias("rev_c"))
        .orderBy(F.col("rev_c").desc(), "c_custkey")
        .limit(20)
    )
    want = con.sql(
        """
        SELECT c_custkey, c_name, n_name,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev_c
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY 1, 2, 3
        ORDER BY rev_c DESC, c_custkey LIMIT 20
        """
    ).fetchall()
    assert [tuple(r) for r in got.collect()] == want


def test_q14_promo_revenue(spark, sf_dir, con):
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    got = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0)).alias("promo_c"),
            F.sum(rev).alias("total_c"),
        )
        .collect()[0]
    )
    want = con.sql(
        """
        SELECT SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                   ELSE 0 END),
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        FROM lineitem JOIN part ON l_partkey = p_partkey
        """
    ).fetchone()
    assert (got["promo_c"], got["total_c"]) == want


def test_q19_bracketed_revenue(spark, sf_dir, con):
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30))
           & (F.col("l_quantity").between(10, 40)))
    )
    got = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(rev).alias("rev_c"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    want = con.sql(
        """
        SELECT SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)),
               COUNT(*)
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 40)
        """
    ).fetchone()
    assert (got["rev_c"], got["n"]) == want
