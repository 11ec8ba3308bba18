"""REST Proxy backend tests against a stub proxy HTTP server
(reference surface: kafi/kafka/restproxy/*)."""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from kafi_spark.sources.restproxy import (
    RestProxyClient,
    RestProxyError,
    read_restproxy,
    write_restproxy,
)


class _FakeProxy:
    def __init__(self):
        self.topics = {"snacks": 2}
        self.acls: list[dict] = []
        self.brokers = [{"broker_id": 1, "host": "b1", "port": 9092}]
        self.configs = {("topic", "snacks"): {"retention.ms": "100"}}
        self.groups = [{"consumer_group_id": "g1", "state": "STABLE"}]
        self.produced: list[dict] = []
        self.altered: list[dict] = []
        self.instances = 0
        self.records = [
            {"topic": "snacks", "partition": 0, "offset": 0,
             "key": base64.b64encode(b"k0").decode(),
             "value": base64.b64encode(b"v0").decode()},
            {"topic": "snacks", "partition": 1, "offset": 0,
             "key": None,
             "value": base64.b64encode(b"v1").decode()},
        ]
        self.committed: list[dict] = []
        self.deleted_instances: list[str] = []
        # per-partition record stores + instance assignments for the
        # executor-parallel scan (assignment-mode consumers); the legacy
        # subscription consumer keeps draining the global `records`
        self.part_records: dict[int, list[dict]] = {}
        self.assignments: dict[str, list[int]] = {}
        self.lock = threading.Lock()


def _make_server(state: _FakeProxy):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, obj, code=200):
            body = json.dumps(obj).encode() if obj is not None else b""
            self.send_response(code)
            self.send_header("Content-Type", "application/vnd.kafka.v2+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n)) if n else {}

        def do_GET(self):
            path, _, query = self.path.partition("?")
            p = path.strip("/").split("/")
            if p == ["v3", "clusters"]:
                return self._send({"data": [{"cluster_id": "ck-1"}]})
            if p[:3] == ["v3", "clusters", "ck-1"]:
                rest = p[3:]
                if rest == ["topics"]:
                    return self._send({"data": [{"topic_name": t} for t in state.topics]})
                if len(rest) == 3 and rest[0] == "topics" and rest[2] == "partitions":
                    n = state.topics[rest[1]]
                    return self._send({"data": [{"partition_id": i} for i in range(n)]})
                if rest == ["acls"]:
                    return self._send({"data": state.acls})
                if rest == ["brokers"]:
                    return self._send({"data": state.brokers})
                if len(rest) == 3 and rest[2] == "configs":
                    kind = "broker" if rest[0] == "brokers" else "topic"
                    cfg = state.configs.get((kind, rest[1]), {})
                    return self._send(
                        {"data": [{"name": k, "value": v} for k, v in cfg.items()]})
                if rest == ["consumer-groups"]:
                    return self._send({"data": state.groups})
                if len(rest) == 3 and rest[0] == "consumer-groups" and rest[2] == "consumers":
                    return self._send({"data": [{"consumer_id": "c-1"}]})
            if len(p) == 5 and p[0] == "topics" and p[4] == "offsets":
                return self._send({"beginning_offset": 0, "end_offset": 3})
            if len(p) == 5 and p[0] == "consumers" and p[4] == "records":
                iid = p[3]
                with state.lock:
                    if iid in state.assignments:
                        recs = []
                        for prt in state.assignments[iid]:
                            recs.extend(state.part_records.pop(prt, []))
                    else:
                        recs, state.records = state.records, []
                return self._send(recs)
            return self._send({"message": "nope"}, 404)

        def do_POST(self):
            p = self.path.partition("?")[0].strip("/").split("/")
            if p[:3] == ["v3", "clusters", "ck-1"]:
                rest = p[3:]
                if rest == ["topics"]:
                    b = self._body()
                    state.topics[b["topic_name"]] = b["partitions_count"]
                    return self._send({"topic_name": b["topic_name"]}, 201)
                if rest == ["acls"]:
                    state.acls.append(self._body())
                    return self._send(None, 201)
                if len(rest) == 3 and rest[2] == "configs:alter":
                    state.altered.append({"resource": rest[1],
                                          "kind": rest[0], **self._body()})
                    return self._send(None, 204)
                if rest == ["broker-configs:alter"]:
                    state.altered.append({"resource": "broker", **self._body()})
                    return self._send(None, 204)
                if len(rest) == 3 and rest[0] == "topics" and rest[2] == "records":
                    state.produced.append({"topic": rest[1], **self._body()})
                    return self._send({"error_code": 200})
            if len(p) == 2 and p[0] == "consumers":
                with state.lock:
                    state.instances += 1
                    iid = f"inst-{state.instances}"
                return self._send({"instance_id": iid,
                                   "base_uri": f"/consumers/{p[1]}/instances/{iid}"})
            if len(p) == 5 and p[0] == "consumers" and p[4] == "subscription":
                return self._send(None, 204)
            if len(p) == 5 and p[0] == "consumers" and p[4] == "assignments":
                with state.lock:
                    state.assignments[p[3]] = [
                        a["partition"] for a in self._body()["partitions"]]
                return self._send(None, 204)
            if (len(p) == 6 and p[0] == "consumers" and p[4] == "positions"
                    and p[5] == "beginning"):
                return self._send(None, 204)
            if len(p) == 5 and p[0] == "consumers" and p[4] == "offsets":
                state.committed.append(self._body())
                return self._send(None, 200)
            return self._send({"message": "nope"}, 404)

        def do_DELETE(self):
            path, _, query = self.path.partition("?")
            p = path.strip("/").split("/")
            if p[:3] == ["v3", "clusters", "ck-1"]:
                rest = p[3:]
                if len(rest) == 2 and rest[0] == "topics":
                    state.topics.pop(rest[1], None)
                    return self._send(None, 204)
                if rest == ["acls"]:
                    dropped, state.acls = state.acls, []
                    return self._send({"data": [
                        {"resource_type": a.get("resource_type", "TOPIC"),
                         "resource_name": a.get("resource_name", "t"),
                         "pattern_type": a.get("pattern_type", "LITERAL"),
                         "principal": a.get("principal", "User:x"),
                         "host": a.get("host", "*"),
                         "operation": a.get("operation", "READ"),
                         "permission": a.get("permission", "ALLOW")}
                        for a in dropped]})
            if len(p) == 4 and p[0] == "consumers":
                state.deleted_instances.append(p[3])
                return self._send(None, 204)
            return self._send({"message": "nope"}, 404)

    return ThreadingHTTPServer(("127.0.0.1", 0), Handler)


@pytest.fixture()
def proxy():
    state = _FakeProxy()
    server = _make_server(state)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", state
    finally:
        server.shutdown()


def test_cluster_id_cached_and_topic_admin(proxy):
    url, state = proxy
    c = RestProxyClient(url)
    assert c.cluster_id() == "ck-1"
    c.create_topic("fresh", partitions=3, config={"cleanup.policy": "compact"})
    assert state.topics["fresh"] == 3
    assert sorted(c.topics()) == ["fresh", "snacks"]
    assert c.partitions("snacks") == 2
    c.delete_topic("fresh")
    assert "fresh" not in state.topics
    assert c.watermarks("snacks") == {0: (0, 3), 1: (0, 3)}


def test_admin_transport_acls_brokers_groups(proxy):
    url, state = proxy
    admin = RestProxyClient(url).admin()
    acl = {"resource_type": "topic", "name": "snacks", "pattern_type": "literal",
           "principal": "User:svc", "host": "*", "operation": "read",
           "permission_type": "allow"}
    admin.create_acl(acl)
    assert state.acls == [{
        "resource_type": "TOPIC", "resource_name": "snacks",
        "pattern_type": "LITERAL", "principal": "User:svc", "host": "*",
        "operation": "READ", "permission": "ALLOW"}]
    dropped = admin.delete_acls({"resource_type": "topic"})
    assert dropped[0]["operation"] == "read" and state.acls == []
    assert admin.brokers() == {1: "b1:9092"}
    assert admin.topic_config("snacks") == {"retention.ms": "100"}
    admin.topic_config("snacks", config={"retention.ms": 500})
    assert state.altered[-1]["resource"] == "snacks"
    assert state.altered[-1]["kind"] == "topics"
    assert state.altered[-1]["data"] == [
        {"name": "retention.ms", "value": "500", "operation": "SET"}]
    # per-broker alter posts to THAT broker's configs:alter, not the
    # cluster-wide /broker-configs:alter default (round-8 review: a
    # change targeted at one broker silently altered them all)
    admin.broker_config(pattern=1, config={"log.cleaner.threads": 2})
    assert state.altered[-1]["resource"] == "1"
    assert state.altered[-1]["kind"] == "brokers"
    assert admin.groups() == ["g1"]
    assert admin.describe_groups("g1") == {"g1": ["c-1"]}
    with pytest.raises(NotImplementedError, match="no public endpoint"):
        admin.delete_groups("g1")


def test_consumer_scan_into_dataframe(proxy, spark):
    url, state = proxy
    df = read_restproxy(spark, url, "snacks", group="g", commit=True)
    rows = sorted(
        (((bytes(r.key).decode() if r.key else None),
          bytes(r.value).decode(), r.partition, r.offset)
         for r in df.collect()),
        key=lambda t: t[2])
    assert rows == [("k0", "v0", 0, 0), (None, "v1", 1, 0)]
    # instance torn down, offsets committed
    assert state.deleted_instances == ["inst-1"]
    assert state.committed[0]["offsets"][0]["topic"] == "snacks"


def test_producer_sink_posts_from_executors(proxy, spark):
    url, state = proxy
    df = spark.createDataFrame(
        [(b"k1", b"hello"), (None, b"world")], "key binary, value binary")
    write_restproxy(df, url, "snacks")
    assert len(state.produced) == 2
    datas = sorted(p["value"]["data"] for p in state.produced)
    assert [base64.b64decode(d) for d in datas] == [b"hello", b"world"]
    keyed = [p for p in state.produced if "key" in p]
    assert len(keyed) == 1 and base64.b64decode(keyed[0]["key"]["data"]) == b"k1"
    assert all(p["topic"] == "snacks" for p in state.produced)


def test_consumer_scan_parallel_per_partition(proxy, spark):
    """Executor-parallel scan (beyond-reference: the reference's proxy
    consumer is a single sticky instance, restproxy_consumer.py:104):
    one assignment-mode instance PER PARTITION inside mapInPandas. The
    stub's watermarks are (0, 3) per partition, so each task must drain
    its own partition's offsets 0..2 and drop the planted offset-3
    record (written "after" the snapshot watermark)."""
    from kafi_spark.sources.restproxy import read_restproxy_parallel

    url, state = proxy

    def rec(p, o, v):
        return {"topic": "snacks", "partition": p, "offset": o,
                "key": None, "value": base64.b64encode(v).decode()}

    state.part_records = {
        0: [rec(0, 0, b"a0"), rec(0, 1, b"a1"), rec(0, 2, b"a2"),
            rec(0, 3, b"late")],  # >= end watermark: must be dropped
        1: [rec(1, 0, b"b0"), rec(1, 1, b"b1"), rec(1, 2, b"b2")],
    }
    df = read_restproxy_parallel(spark, url, "snacks", group="gp")
    rows = sorted((r.partition, r.offset, bytes(r.value).decode())
                  for r in df.collect())
    assert rows == [(0, 0, "a0"), (0, 1, "a1"), (0, 2, "a2"),
                    (1, 0, "b0"), (1, 1, "b1"), (1, 2, "b2")]
    # one instance per partition, each assigned exactly its partition,
    # each torn down
    assert sorted(len(v) == 1 for v in state.assignments.values()) == [True, True]
    assert {v[0] for v in state.assignments.values()} == {0, 1}
    assert len(state.deleted_instances) == 2
    # no committed offsets: assignment+seek is idempotent by design
    assert state.committed == []


def test_consumer_scan_parallel_empty_topic(proxy, spark):
    from kafi_spark.sources.restproxy import read_restproxy_parallel

    url, state = proxy
    state.topics["void"] = 2
    # watermarks stub returns (0, 3) for every topic; point the scan at
    # partitions with no records — the empty-poll bound must end each
    # task instead of spinning forever, yielding an empty frame
    state.part_records = {}
    df = read_restproxy_parallel(spark, url, "snacks", group="gv",
                                 max_empty_polls=2)
    assert df.count() == 0


def test_http_error_surfaces(proxy):
    url, _ = proxy
    with pytest.raises(RestProxyError) as ei:
        RestProxyClient(url).request("GET", "/not/a/route")
    assert ei.value.status == 404
