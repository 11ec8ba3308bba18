"""Kafka admin extras: FS delete_records end-to-end + cluster admin
request construction against a fake transport (reference surface:
kafi/kafka/cluster/cluster_admin.py:22-120,292-315)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafi_spark.sources import FSTopicStorage
from kafi_spark.sources.kafka_admin import (
    OFFSET_END,
    KafkaClusterAdmin,
    normalize_acl,
)


@pytest.fixture()
def storage(spark, tmp_path):
    return FSTopicStorage(spark, str(tmp_path / "store"))


def msgs(spark, *kv):
    data = [(k.encode() if k else None, v.encode()) for k, v in kv]
    return spark.createDataFrame(data, "key binary, value binary")


# ---------------------------------------------------------------------------
# FS backend delete_records (real, testable)
# ---------------------------------------------------------------------------

def test_delete_records_partial_truncation(storage, spark):
    storage.create("t", partitions=1)
    storage.produce("t", msgs(spark, *[("k", f"v{i}") for i in range(6)]))
    applied = storage.delete_records({"t": {0: 4}})
    assert applied == {"t": {0: 4}}
    out = storage.consume("t")
    assert sorted(r.offset for r in out.collect()) == [4, 5]
    assert storage.watermarks("t")[0] == (4, 6)


def test_delete_records_full_truncation_preserves_hwm(storage, spark):
    storage.create("t", partitions=1)
    storage.produce("t", msgs(spark, ("k", "a"), ("k", "b"), ("k", "c")))
    storage.delete_records({"t": {0: OFFSET_END}})
    assert storage.consume("t").count() == 0
    # the high watermark survives a full purge, like a broker's log start
    assert storage.watermarks("t")[0] == (3, 3)
    # new produces continue from the preserved watermark, not from 0
    storage.produce("t", msgs(spark, ("k", "d")))
    assert [r.offset for r in storage.consume("t").collect()] == [3]


def test_delete_records_pattern_form_and_isolation(storage, spark):
    storage.create("keep", partitions=1)
    storage.create("purge_me", partitions=2)
    storage.produce("keep", msgs(spark, ("a", "x")))
    storage.produce("purge_me", msgs(spark, ("a", "1"), ("b", "2"), (None, "3")))
    applied = storage.delete_records("purge_*")
    assert set(applied) == {"purge_me"}
    assert storage.consume("purge_me").count() == 0
    assert storage.consume("keep").count() == 1  # untouched


def test_delete_records_only_rewrites_affected_partition(storage, spark):
    storage.create("t", partitions=2)
    df = spark.createDataFrame(
        [(b"k", f"v{i}".encode(), i % 2) for i in range(8)],
        "key binary, value binary, partition int")
    storage.produce("t", df, keep_partitions=True)
    storage.delete_records({"t": {0: 2}})
    out = storage.consume("t")
    p0 = sorted(r.offset for r in out.filter(F.col("partition") == 0).collect())
    p1 = sorted(r.offset for r in out.filter(F.col("partition") == 1).collect())
    assert p0 == [2, 3] and p1 == [0, 1, 2, 3]
    assert storage.watermarks("t") == {0: (2, 4), 1: (0, 4)}


def test_delete_records_cut_beyond_hwm_clamps(storage, spark):
    storage.create("t", partitions=1)
    storage.produce("t", msgs(spark, ("k", "a"), ("k", "b")))
    assert storage.delete_records({"t": {0: 99}}) == {"t": {0: 2}}
    assert storage.watermarks("t")[0] == (2, 2)


def test_delete_records_bad_partition_raises(storage, spark):
    storage.create("t", partitions=1)
    with pytest.raises(ValueError, match="partition 5 out of range"):
        storage.delete_records({"t": {5: 0}})


# ---------------------------------------------------------------------------
# Cluster admin request construction (fake transport)
# ---------------------------------------------------------------------------

class FakeTransport:
    def __init__(self, responses: dict | None = None):
        self.requests: list[dict] = []
        self.responses = responses or {}

    def __call__(self, request: dict):
        self.requests.append(request)
        return self.responses.get(request["op"])


_ACL = {
    "resource_type": "topic", "name": "orders", "pattern_type": "literal",
    "principal": "User:svc", "host": "*", "operation": "read",
    "permission_type": "allow",
}


def test_create_acl_requires_all_fields():
    t = FakeTransport()
    admin = KafkaClusterAdmin(t)
    assert admin.create_acl(_ACL) == _ACL
    assert t.requests == [{"op": "create_acls", "acls": [_ACL]}]
    with pytest.raises(ValueError, match="requires 'principal'"):
        admin.create_acl({k: v for k, v in _ACL.items() if k != "principal"})
    with pytest.raises(ValueError, match="unsupported operation"):
        admin.create_acl({**_ACL, "operation": "nope"})


def test_acl_filter_defaults_to_any():
    t = FakeTransport(responses={"describe_acls": []})
    KafkaClusterAdmin(t).acls({"resource_type": "topic"})
    f = t.requests[0]["filter"]
    assert f["resource_type"] == "topic"
    assert f["pattern_type"] == f["operation"] == f["permission_type"] == "any"
    assert f["name"] is f["principal"] is f["host"] is None


def test_brokers_glob_and_config_roundtrip():
    t = FakeTransport(responses={
        "list_brokers": {1: "b1:9092", 2: "b2:9092", 31: "b31:9092"},
        "describe_config": {"log.retention.ms": "604800000"},
    })
    admin = KafkaClusterAdmin(t)
    assert admin.brokers() == {1: "b1:9092", 2: "b2:9092", 31: "b31:9092"}
    assert admin.brokers(pattern="3*") == {31: "b31:9092"}
    cfg = admin.broker_config(pattern=1, config={"log.retention.ms": 1000}, test=True)
    assert cfg == {1: {"log.retention.ms": "604800000"}}
    alter = [r for r in t.requests if r["op"] == "alter_config"]
    assert alter == [{
        "op": "alter_config", "resource_type": "broker", "resource": "1",
        "config": {"log.retention.ms": "1000"}, "incremental": True,
        "validate_only": True,
    }]


def test_delete_records_pattern_fans_out_offset_end():
    t = FakeTransport(responses={"list_topics": ["a", "b"], "partitions": 2})
    tps = KafkaClusterAdmin(t).delete_records("*")
    assert tps == [("a", 0, OFFSET_END), ("a", 1, OFFSET_END),
                   ("b", 0, OFFSET_END), ("b", 1, OFFSET_END)]
    assert t.requests[-1] == {"op": "delete_records", "offsets": tps}


def test_delete_records_dict_passthrough():
    t = FakeTransport()
    tps = KafkaClusterAdmin(t).delete_records({"t": {0: 5, 1: OFFSET_END}})
    assert tps == [("t", 0, 5), ("t", 1, OFFSET_END)]
    assert t.requests == [{"op": "delete_records", "offsets": tps}]


def test_groups_glob_state_filter_and_delete():
    t = FakeTransport(responses={
        "list_groups": {"app-1": "STABLE", "app-2": "EMPTY", "etl": "STABLE"},
    })
    admin = KafkaClusterAdmin(t)
    assert admin.groups("app-*") == ["app-1", "app-2"]
    assert admin.groups("*", state_pattern="STABLE", state=True) == {
        "app-1": "STABLE", "etl": "STABLE"}
    assert admin.delete_groups("app-*", state_pattern="EMPTY") == ["app-2"]
    assert t.requests[-1] == {"op": "delete_groups", "groups": ["app-2"]}
    assert admin.delete_groups("nomatch-*") == []


def test_no_transport_raises_documented():
    with pytest.raises(NotImplementedError, match="no Kafka admin transport"):
        KafkaClusterAdmin().brokers()


def test_normalize_acl_is_pure():
    acl = dict(_ACL)
    normalize_acl(acl)
    assert acl == _ACL
