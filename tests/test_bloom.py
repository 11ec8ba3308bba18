"""Bloom-filter incremental dedup (kafi_spark.functions.bloom)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kafi_spark.functions import bloom as bl


def test_bloom_params_math():
    m, k = bl.bloom_params(1000, 0.01)
    # textbook optimum: m ≈ 9.59 n, k ≈ 7 at 1% FP
    assert 9000 <= m <= 10000 and k == 7
    with pytest.raises(ValueError):
        bl.bloom_params(0)
    with pytest.raises(ValueError):
        bl.bloom_params(10, 1.5)


def test_no_false_negatives(spark):
    """Every inserted element MUST report probably_seen — the Bloom
    invariant, over 200 elements at a deliberately tiny (collision-
    heavy) filter."""
    hist = spark.range(200).select(F.concat(F.lit("v"), "id").alias("text"))
    filt = bl.bloom_build(hist, "text", num_bits=512, num_hashes=3)
    out = bl.bloom_contains(
        hist.withColumn("doc_id", F.monotonically_increasing_id()),
        filt, "text", num_bits=512, num_hashes=3)
    assert out.filter(~F.col("probably_seen")).count() == 0


def test_new_rows_pass_and_fp_rate_bounded(spark):
    m, k = bl.bloom_params(500, 0.01)
    hist = spark.range(500).select(F.concat(F.lit("old"), "id").alias("text"))
    batch = spark.range(500).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("new"), "id").alias("text"))
    filt = bl.bloom_build(hist, "text", m, k)
    new = bl.bloom_new(batch, filt, "text", m, k)
    n_new = new.count()
    # none of the genuinely-new rows is historical; allow ~5x the
    # configured 1% FP slack for a 500-row sample
    assert 475 <= n_new <= 500
    assert new.columns == ["doc_id", "text"]


def test_merge_filters_is_bitwise_or(spark):
    a = spark.createDataFrame([("x",), ("y",)], "text string")
    b = spark.createDataFrame([("z",)], "text string")
    fa = bl.bloom_build(a, "text", 256, 4)
    fb = bl.bloom_build(b, "text", 256, 4)
    merged = (fa.unionByName(fb).groupBy("word_idx")
              .agg(F.bit_or("bits").alias("bits")))
    both = bl.bloom_build(a.unionByName(b), "text", 256, 4)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, both.collect()))


def test_bloom_matches_duckdb_position_oracle(spark, sf_dir):
    """Differential: a Bloom hit ⇔ every probe position collides with
    some historical position — DuckDB replays the md5 positions and the
    set-membership semantics exactly (no bit array needed)."""
    m, k = 2048, 5
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    filt = bl.bloom_build(df.filter("doc_id < 250").select("text"), "text", m, k)
    got = {r.doc_id: r.probably_seen for r in bl.bloom_contains(
        df.filter("doc_id >= 250").select("doc_id", "text"), filt,
        "text", m, k).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = {r[0]: r[1] for r in con.sql(f"""
        WITH seeds AS (SELECT unnest(range({k})) AS i),
        hist AS (SELECT DISTINCT
                   ('0x'||substring(md5(CAST(s.i AS VARCHAR)||':'||d.text),1,15))::BIGINT
                     % {m} AS pos
                 FROM documents d, seeds s WHERE d.doc_id < 250),
        probes AS (SELECT d.doc_id,
                   ('0x'||substring(md5(CAST(s.i AS VARCHAR)||':'||d.text),1,15))::BIGINT
                     % {m} AS pos
                   FROM documents d, seeds s WHERE d.doc_id >= 250)
        SELECT p.doc_id,
               MIN(CASE WHEN h.pos IS NOT NULL THEN 1 ELSE 0 END) = 1
        FROM probes p LEFT JOIN hist h ON p.pos = h.pos GROUP BY p.doc_id
    """).fetchall()}
    assert got == want


def test_state_roundtrip_and_compact(spark, tmp_path):
    from pyspark.sql import functions as F

    state = str(tmp_path / "bloom_state")
    a = spark.createDataFrame([("x",), ("y",)], "text string")
    b = spark.createDataFrame([("z",)], "text string")
    # empty state dir → empty filter
    assert bl.bloom_load_state(spark, state).count() == 0
    bl.bloom_save_delta(bl.bloom_build(a, "text", 256, 4), state, 0)
    bl.bloom_save_delta(bl.bloom_build(b, "text", 256, 4), state, 1)
    merged = bl.bloom_load_state(spark, state)
    direct = bl.bloom_build(a.unionByName(b), "text", 256, 4)
    assert sorted(map(tuple, merged.select("word_idx", "bits").collect())) == \
        sorted(map(tuple, direct.collect()))
    # compaction folds deltas; filter value is unchanged
    bl.bloom_compact(spark, state, 2)
    after = bl.bloom_load_state(spark, state)
    assert sorted(map(tuple, after.select("word_idx", "bits").collect())) == \
        sorted(map(tuple, direct.collect()))


def test_load_state_reads_pre_widening_int32_deltas(spark, tmp_path):
    """State dirs persisted before the round-7 word_idx int→long
    widening hold int32 parquet files next to int64 ones; the pinned
    read schema must upcast the old files instead of failing or
    mis-typing on whichever footer Spark samples (round-8 ADVICE)."""
    from pyspark.sql import functions as F

    state = str(tmp_path / "bloom_state")
    new = bl.bloom_build(
        spark.createDataFrame([("x",), ("y",)], "text string"), "text", 256, 4)
    bl.bloom_save_delta(new, state, 0)
    # simulate a pre-widening delta: same rows, word_idx as int32
    old = new.select(
        F.col("word_idx").cast("int").alias("word_idx"), "bits")
    assert dict(old.dtypes)["word_idx"] == "int"
    bl.bloom_save_delta(old, state, 1)
    merged = bl.bloom_load_state(spark, state)
    assert dict(merged.dtypes)["word_idx"] == "bigint"
    # both deltas carry the same filter -> merge equals either one
    assert sorted(map(tuple, merged.select("word_idx", "bits").collect())) == \
        sorted(map(tuple, new.collect()))


def test_bloom_dedup_stream_across_batches_and_runs(spark, tmp_path):
    """Two availableNow runs over a file stream: duplicates are dropped
    across micro-batches AND across runs (the persisted-state property
    dropDuplicatesWithinWatermark cannot give across fresh queries)."""
    import json as _json
    import os as _os
    import time as _time

    from kafi_spark.streaming.stateful import bloom_dedup_stream

    src = str(tmp_path / "in")
    _os.makedirs(src)
    state = str(tmp_path / "state")
    out_rows = []

    def sink(df, epoch):
        out_rows.extend((r.doc_id, r.text) for r in df.collect())

    def write_batch(name, rows, order):
        p = _os.path.join(src, name)
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        t = _time.time() - 3600 + order * 60
        _os.utime(p, (t, t))

    write_batch("b0.json", [{"doc_id": 1, "text": "alpha"},
                            {"doc_id": 2, "text": "beta"},
                            {"doc_id": 3, "text": "alpha"}], 0)   # in-batch dup
    write_batch("b1.json", [{"doc_id": 4, "text": "beta"},        # cross-batch dup
                            {"doc_id": 5, "text": "gamma"}], 1)

    def run(prefix):
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1).json(src))
        q = (stream.writeStream
             .foreachBatch(bloom_dedup_stream(
                 "text", state, num_bits=4096, num_hashes=5, sink=sink,
                 version_prefix=prefix))
             .option("checkpointLocation", str(tmp_path / f"ckpt_{prefix}"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run("r1_")
    texts = sorted(t for _, t in out_rows)
    assert texts == ["alpha", "beta", "gamma"]

    # second RUN, fresh checkpoint: same files replay, everything is
    # already in the persisted filter → nothing new emitted
    out_rows.clear()
    run("r2_")
    assert out_rows == []


def test_bloom_dedup_stream_epoch_replay_is_idempotent(spark, tmp_path):
    """A replayed epoch (same epoch id, state already merged) must NOT
    erase its fingerprints: the delta is built from the batch, so the
    rewrite is a no-op and later duplicates still drop."""
    from kafi_spark.streaming.stateful import bloom_dedup_stream

    state = str(tmp_path / "state")
    emitted = []
    proc = bloom_dedup_stream("text", state, num_bits=4096, num_hashes=5,
                              sink=lambda df, e: emitted.extend(
                                  r.text for r in df.collect()))
    batch = spark.createDataFrame([("alpha",), ("beta",)], "text string")
    proc(batch, 0)
    assert sorted(emitted) == ["alpha", "beta"]
    # crash-before-commit replay of epoch 0: same batch, same epoch id
    emitted.clear()
    proc(batch, 0)
    # the loaded state excludes the epoch's own delta: the replay
    # re-emits the SAME new rows as attempt one (idempotent sinks can
    # re-commit the epoch)
    assert sorted(emitted) == ["alpha", "beta"]
    # the replay must not have wiped the epoch-0 delta
    later = spark.createDataFrame([("alpha",), ("gamma",)], "text string")
    emitted.clear()
    proc(later, 1)
    assert emitted == ["gamma"]


def test_bloom_merge_algebra_properties(spark):
    """Filter merge is commutative, associative, and idempotent over
    random element sets (hypothesis over small universes)."""
    from hypothesis import HealthCheck, given, settings, strategies as st
    from pyspark.sql import functions as F

    sets = st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4),
                    min_size=0, max_size=8)

    def build(elems):
        if not elems:
            return spark.createDataFrame([], "word_idx int, bits long")
        df = spark.createDataFrame([(e,) for e in elems], "text string")
        return bl.bloom_build(df, "text", 256, 3)

    def merge(a, b):
        return (a.unionByName(b).groupBy("word_idx")
                .agg(F.bit_or("bits").alias("bits")))

    def as_set(df):
        return set(map(tuple, df.collect()))

    @given(a=sets, b=sets)
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def prop(a, b):
        fa, fb = build(a), build(b)
        assert as_set(merge(fa, fb)) == as_set(merge(fb, fa))       # commut.
        assert as_set(merge(fa, fa)) == as_set(fa)                  # idemp.
        assert as_set(merge(fa, fb)) == as_set(build(a + b))        # = union

    prop()


def test_bloom_contains_keeps_duplicate_rows(spark):
    """Duplicate input rows each keep their own verdict row (round-3
    ADVICE: the old groupBy-all-columns silently collapsed them)."""
    hist = spark.createDataFrame([("a",)], "text string")
    filt = bl.bloom_build(hist, "text", 256, 3)
    dup = spark.createDataFrame([("a",), ("a",), ("b",)], "text string")
    out = bl.bloom_contains(dup, filt, "text", 256, 3).collect()
    assert len(out) == 3
    assert sorted((r.text, r.probably_seen) for r in out) == [
        ("a", True), ("a", True), ("b", False)]


def test_bloom_contains_tolerates_reserved_input_columns(spark):
    """Input columns named word_idx / bits no longer corrupt the probe
    join (the state frame's columns are renamed before joining)."""
    hist = spark.createDataFrame([("x",)], "text string")
    filt = bl.bloom_build(hist, "text", 256, 3)
    df = spark.createDataFrame(
        [("x", 99, 12345), ("y", 7, 0)],
        "text string, word_idx int, bits long")
    out = {(r.text): (r.probably_seen, r.word_idx, r.bits)
           for r in bl.bloom_contains(df, filt, "text", 256, 3).collect()}
    assert out["x"] == (True, 99, 12345)
    assert out["y"][0] is False and out["y"][1:] == (7, 0)


def test_bloom_contains_rejects_output_collisions(spark):
    hist = spark.createDataFrame([("x",)], "text string")
    filt = bl.bloom_build(hist, "text", 256, 3)
    bad = spark.createDataFrame([("x", 1)], "text string, __row_id int")
    with pytest.raises(ValueError, match="__row_id"):
        bl.bloom_contains(bad, filt, "text", 256, 3)
    bad2 = spark.createDataFrame([("x", True)],
                                 "text string, probably_seen boolean")
    with pytest.raises(ValueError, match="probably_seen"):
        bl.bloom_contains(bad2, filt, "text", 256, 3)


def test_bloom_contains_with_map_column(spark):
    """Round-6 review: grouping the probe verdict by payload columns
    made any MapType column an AnalysisException."""
    from kafi_spark.functions.bloom import bloom_build, bloom_contains

    hist = spark.createDataFrame([("a",), ("b",)], "k string")
    filt = bloom_build(hist, "k", 1 << 12, 5)
    df = spark.createDataFrame(
        [("a", {"m": "1"}), ("z", {"m": "2"})],
        "k string, meta map<string,string>")
    got = {r["k"]: r["probably_seen"]
           for r in bloom_contains(df, filt, "k", 1 << 12, 5).collect()}
    assert got == {"a": True, "z": False}


def test_compact_and_generic_paths_agree(spark):
    """The r12 compact probe (dense array<bigint> literal + forall/
    bit_get, zero exchanges) must return bit-identical verdicts to the
    generic explode+join+re-aggregate path (compact_max_words=0 forces
    it) — same rows, same probably_seen, including null values and
    duplicate rows. Also pins the array<bigint> cast: an inferred
    array<int> literal makes bit_get's position bound 32 and probes
    32..63 throw."""
    m, k = 4096, 5
    hist = spark.range(300).select(F.concat(F.lit("h"), "id").alias("text"))
    batch = spark.range(600).select(
        (F.col("id") % 400).alias("doc_id"),  # duplicates by design
        F.when(F.col("id") % 97 == 0, None)  # null texts ride along
        .otherwise(F.concat(F.lit("h"), (F.col("id") % 450).cast("string")))
        .alias("text"),
    )
    filt = bl.bloom_build(hist, "text", m, k)
    compact = bl.bloom_contains(batch, filt, "text", m, k)
    generic = bl.bloom_contains(batch, filt, "text", m, k,
                                compact_max_words=0)
    # the compact plan is narrow: no exchange anywhere
    import re

    assert not re.search(r"\bExchange\b",
                         compact._jdf.queryExecution().executedPlan().toString())
    key = lambda r: (r["doc_id"], r["text"] is None,  # noqa: E731
                     r["text"] or "", r["probably_seen"])
    assert sorted(map(key, compact.collect())) == sorted(
        map(key, generic.collect()))
