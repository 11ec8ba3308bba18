"""Shared Spark fixture for the test suite.

One session-scoped SparkSession at local[4] with 4 shuffle partitions —
small enough to keep the whole suite fast, identical configuration
otherwise to the production factory (AQE, UTC, Arrow).
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("KAFI_SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("KAFI_SPARK_DRIVER_MEM", "4g")
    from kafi_spark.session import get_spark

    s = get_spark("kafi_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"testdata dir {SF_DIR} not present")
    return SF_DIR


def rows(df, *cols):
    """Collect to a sorted list of plain tuples for order-free compare."""
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())
