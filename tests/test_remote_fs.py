"""Remote-FS re-rooting of the FS-topic suite (round-3 VERDICT item 4).

The `fsio.HadoopIO` routing is URI-generic; `file://` exercises the
same code path `s3a://` / `abfss://` / `hdfs://` take (test_sources::
test_file_uri_root). What has never run in this sandbox is a NON-file
scheme, because the bundled Spark (Hadoop 3.4.2 client) ships no cloud
connector jars and the sandbox has no object store. These tests close
the gap THE MOMENT the environment provides both:

* point ``KAFI_TEST_REMOTE_ROOT`` at a writable remote root, e.g.
  ``s3a://bucket/prefix`` against MinIO or ``abfss://c@acct.dfs.core.
  windows.net/prefix`` against Azurite;
* put the matching connector jars on the Spark classpath
  (``spark.jars`` / ``--jars``) — for Hadoop 3.4.2:
  ``hadoop-aws-3.4.2.jar`` + the AWS SDK v2 ``bundle-2.x.jar``
  (S3A), or ``hadoop-azure-3.4.2.jar`` (ABFS);
* pass endpoint/credential config the usual Hadoop way, e.g.
  ``spark.hadoop.fs.s3a.endpoint`` / ``...access.key`` /
  ``...secret.key`` — `kafi_spark.storage` S3/Azure constructors
  translate reference YAML configs to exactly these keys.

Without the env var the module SKIPS (the documented jar-availability
blocker, COVERAGE.md "Environment-gated claims"); with it, the core
FS-topic admin + data round-trip runs unchanged on the remote scheme —
the suite is the validation recipe named in the COVERAGE table.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

REMOTE_ROOT = os.environ.get("KAFI_TEST_REMOTE_ROOT")

pytestmark = pytest.mark.skipif(
    not REMOTE_ROOT,
    reason="KAFI_TEST_REMOTE_ROOT not set (no object store / connector "
    "jars in this environment — see COVERAGE.md environment-gated "
    "claims)",
)


@pytest.fixture()
def store(spark):
    from kafi_spark.storage import Local

    root = REMOTE_ROOT.rstrip("/") + "/kafi_remote_suite"
    s = Local(spark, root)
    yield s
    for t in s.topics():
        s.delete(t)


def _msgs(spark, *kv):
    return spark.createDataFrame(
        [(k.encode(), v.encode()) for k, v in kv], "key binary, value binary"
    )


def test_remote_admin_and_data_roundtrip(spark, store):
    store.create("rt", partitions=2)
    assert store.exists("rt")
    assert store.topics() == ["rt"]
    store.produce("rt", _msgs(spark, ("k1", "v1"), ("k2", "v2"),
                              ("k1", "v3")))
    out = store.consume("rt", commit=True, group="g1")
    assert sorted(bytes(r.value).decode() for r in out.collect()) == [
        "v1", "v2", "v3"]
    # watermarks + group offsets live as remote metadata
    wm = store.watermarks("rt")
    assert sum(hi - lo for lo, hi in wm.values()) == 3
    assert sum(store.lags("g1")["rt"].values()) == 0


def test_remote_compact_and_delete_records(spark, store):
    store.create("cd", partitions=1)
    store.produce("cd", _msgs(spark, ("a", "1"), ("a", "2"), ("b", "9")))
    compacted = store.compact("cd")
    assert compacted.count() == 2  # last-write-wins per key
    store.delete_records({"cd": {0: 2}})
    rest = store.consume("cd")
    assert rest.count() == 1
    assert bytes(rest.collect()[0].value) == b"9"


def test_remote_cp_between_topics(spark, store):
    store.create("src", partitions=1)
    store.create("dst", partitions=1)
    store.produce("src", _msgs(spark, ("k", "payload")))
    store.cp("src", store, "dst")
    got = store.consume("dst").select(F.col("value")).collect()
    assert [bytes(r.value) for r in got] == [b"payload"]
