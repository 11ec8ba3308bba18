"""Avro Object Container Files (kafi_spark.sources.avro_ocf): low-level
spec conformance (JVM avro library reads our bytes and vice versa), the
Python Data Source roundtrip, logical types, reader-schema resolution,
and files.py routing."""

from __future__ import annotations

import datetime as dt
import io
import json
import os
from decimal import Decimal

import pytest

from kafi_spark.sources import avro_ocf as AO

REC = {"type": "record", "name": "r", "fields": [
    {"name": "a", "type": "long"},
    {"name": "b", "type": ["null", "string"]},
]}


def _recs(n):
    return [{"a": i, "b": None if i % 3 == 0 else f"s{i}"} for i in range(n)]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_low_level_roundtrip_block_boundaries(codec):
    # 2500 records at block_records=1000 → 3 blocks, last one ragged
    recs = _recs(2500)
    buf = io.BytesIO()
    n = AO.write_ocf(recs, json.dumps(REC), buf, codec=codec)
    assert n == 2500
    assert list(AO.read_ocf(buf.getvalue())) == recs


def test_header_parse_and_bad_magic():
    buf = io.BytesIO()
    AO.write_ocf(_recs(1), json.dumps(REC), buf)
    sch, codec, sync, pos = AO.read_ocf_header(buf.getvalue())
    assert sch["type"] == "record" and codec == "deflate" and len(sync) == 16
    with pytest.raises(ValueError, match="magic"):
        list(AO.read_ocf(b"PAR1" + buf.getvalue()))


def test_deterministic_bytes():
    a, b = io.BytesIO(), io.BytesIO()
    AO.write_ocf(_recs(100), json.dumps(REC), a)
    AO.write_ocf(_recs(100), json.dumps(REC), b)
    assert a.getvalue() == b.getvalue()


def test_jvm_reads_our_file(spark, tmp_path):
    p = str(tmp_path / "ours.avro")
    with open(p, "wb") as f:
        AO.write_ocf(_recs(10), json.dumps(REC), f)
    jvm = spark._jvm
    dr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader())
    got = []
    while dr.hasNext():
        r = dr.next()
        got.append({"a": r.get("a"),
                    "b": None if r.get("b") is None else str(r.get("b"))})
    dr.close()
    assert got == _recs(10)


def test_we_read_jvm_file(spark, tmp_path):
    p = str(tmp_path / "theirs.avro")
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(REC))
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch))
    w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    w.create(sch, jvm.java.io.File(p))
    for rec in _recs(10):
        jr = jvm.org.apache.avro.generic.GenericData.Record(sch)
        jr.put("a", rec["a"])
        jr.put("b", rec["b"])
        w.append(jr)
    w.close()
    with open(p, "rb") as f:
        assert list(AO.read_ocf(f.read())) == _recs(10)


def test_datasource_roundtrip_and_inference(spark, tmp_path):
    AO.register(spark)
    df = spark.createDataFrame(
        [(i, f"t{i}", float(i) / 3, [i, i + 1], {"k": i}) for i in range(500)],
        "id long, name string, score double, xs array<int>, m map<string,int>")
    out = str(tmp_path / "ds")
    df.write.format("kafi_avro").mode("overwrite").save(out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = spark.read.format("kafi_avro").load(out)  # schema inferred
    assert back.schema.simpleString() == (
        "struct<id:bigint,name:string,score:double,"
        "xs:array<int>,m:map<string,int>>")
    assert sorted(df.collect()) == sorted(back.collect())


def test_datasource_logical_types(spark, tmp_path):
    AO.register(spark)
    df = spark.createDataFrame(
        [(dt.datetime(2024, 5, 1, 12, 30, 15, 123456),
          dt.date(2024, 5, 1), Decimal("123.45"))],
        "ts timestamp, d date, dec decimal(10,2)")
    out = str(tmp_path / "logical")
    df.write.format("kafi_avro").mode("overwrite").save(out)
    back = spark.read.format("kafi_avro").load(out)
    assert back.schema == df.schema
    assert back.collect() == df.collect()


def test_datasource_nested_struct(spark, tmp_path):
    AO.register(spark)
    df = spark.createDataFrame([(1, (2, "x")), (3, (4, None))],
                               "id long, s struct<n:long,t:string>")
    out = str(tmp_path / "nested")
    df.write.format("kafi_avro").mode("overwrite").save(out)
    back = spark.read.format("kafi_avro").load(out)
    assert sorted(df.collect()) == sorted(back.collect())


def test_reader_schema_resolution_promotion(spark, tmp_path):
    """Write with int field, read with a reader schema promoting to long
    (Avro spec resolution), through the data source option."""
    AO.register(spark)
    w_sch = {"type": "record", "name": "r",
             "fields": [{"name": "a", "type": "int"}]}
    p = str(tmp_path / "promo")
    os.makedirs(p)
    with open(os.path.join(p, "x.avro"), "wb") as f:
        AO.write_ocf([{"a": 1}, {"a": 2}], json.dumps(w_sch), f)
    r_sch = {"type": "record", "name": "r",
             "fields": [{"name": "a", "type": "long"}]}
    back = (spark.read.format("kafi_avro")
            .option("avro_schema", json.dumps(r_sch)).load(p))
    assert back.schema.simpleString() == "struct<a:bigint>"
    assert sorted(r.a for r in back.collect()) == [1, 2]


def test_overwrite_removes_stale_parts(spark, tmp_path):
    AO.register(spark)
    out = str(tmp_path / "ow")
    big = spark.range(100).selectExpr("id", "cast(id as string) name")
    big.repartition(8).write.format("kafi_avro").mode("overwrite").save(out)
    n_first = len([f for f in os.listdir(out) if f.endswith(".avro")])
    small = spark.range(5).selectExpr("id", "cast(id as string) name")
    small.repartition(1).write.format("kafi_avro").mode("overwrite").save(out)
    n_second = len([f for f in os.listdir(out) if f.endswith(".avro")])
    assert n_first == 8 and n_second == 1
    assert spark.read.format("kafi_avro").load(out).count() == 5


def test_spark_to_avro_rejects_nonstring_map_keys(spark):
    from pyspark.sql import types as T

    with pytest.raises(ValueError, match="string keys"):
        AO.spark_to_avro(T.StructType([
            T.StructField("m", T.MapType(T.LongType(), T.StringType()))]))


def test_files_py_routing(spark, tmp_path):
    from kafi_spark.sources.files import file_to_table, table_to_file

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    for fmt in ("avro", "orc"):
        p = str(tmp_path / f"t.{fmt}")
        table_to_file(df, p, fmt=fmt)
        back = file_to_table(spark, p, fmt=fmt)
        assert sorted(back.collect()) == sorted(df.collect())


def test_unsupported_codec_rejected():
    with pytest.raises(NotImplementedError):
        AO.write_ocf([], json.dumps(REC), io.BytesIO(), codec="snappy")


def test_orphan_tmp_invisible_and_cleaned(spark, tmp_path):
    """Task-retry atomicity: a leftover dot-prefixed .tmp (simulating a
    failed/speculative attempt that never committed) is (a) invisible to
    the reader glob, and (b) removed by the next overwrite."""
    AO.register(spark)
    out = str(tmp_path / "at")
    df = spark.range(10).selectExpr("id", "cast(id as string) name")
    df.repartition(1).write.format("kafi_avro").mode("overwrite").save(out)
    orphan = os.path.join(out, ".part-99999-deadbeef.avro.tmp")
    with open(orphan, "wb") as f:
        f.write(b"half-written garbage")
    # (a) invisible: read succeeds and sees only committed rows
    assert spark.read.format("kafi_avro").load(out).count() == 10
    # (b) cleaned: the next overwrite removes the orphan
    df.repartition(1).write.format("kafi_avro").mode("overwrite").save(out)
    assert not os.path.exists(orphan)
    assert spark.read.format("kafi_avro").load(out).count() == 10


def test_commit_renames_tmp_to_final(spark, tmp_path):
    """After a successful write no .tmp remains, every data file is a
    final part-*.avro, and _SUCCESS marks the commit."""
    AO.register(spark)
    out = str(tmp_path / "cm")
    df = spark.range(20).selectExpr("id", "cast(id as string) name")
    df.repartition(2).write.format("kafi_avro").mode("overwrite").save(out)
    names = os.listdir(out)
    assert not [n for n in names if n.endswith(".tmp")]
    parts = [n for n in names if n.endswith(".avro")]
    assert len(parts) == 2 and all(n.startswith("part-") for n in parts)
    assert "_SUCCESS" in names


def test_header_over_initial_read_doubles(tmp_path):
    """A header whose schema JSON exceeds the 1 MiB initial read must
    still parse via the truncation-driven doubling re-read."""
    wide = "f" + "x" * (2 << 20)  # one valid-but-huge field name
    big_schema = AO.parse_schema(json.dumps(
        {"type": "record", "name": "r",
         "fields": [{"name": wide, "type": "long"}]}))
    buf = io.BytesIO()
    AO.write_ocf([{wide: 1}, {wide: 2}], big_schema, buf, codec="null")
    p = str(tmp_path / "big.avro")
    with open(p, "wb") as f:
        f.write(buf.getvalue())
    sch, codec, sync, pos = AO._read_header_of(p)
    assert sch["fields"][0]["name"] == wide and codec == "null"
    assert pos > (1 << 20)  # the header genuinely exceeded the first read


def test_bad_magic_fails_fast_no_doubling(tmp_path):
    """A non-Avro file must raise immediately — the doubling loop no
    longer re-reads a possibly huge file for errors bytes can't fix."""
    p = str(tmp_path / "junk.avro")
    with open(p, "wb") as f:
        f.write(b"NOPE" + b"\x00" * (4 << 20))
    import time as _t

    t0 = _t.time()
    with pytest.raises(ValueError, match="bad magic"):
        AO._read_header_of(p)
    assert _t.time() - t0 < 1.0  # one 1 MiB read, not a doubling crawl
