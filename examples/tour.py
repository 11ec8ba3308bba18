"""kafi_spark tour — the reference's demo notebook, Spark-first.

The reference front door is ``demo.ipynb`` / ``multiple_sinks.ipynb``
(kafi repo root): create a topic, produce, shell-verb around, copy with
a transform, run a streams topology, fan out to multiple sinks. This
script walks the same story on the bundled testdata plus the
beyond-reference curation pipeline, and is executed end-to-end by
``tests/test_tour.py`` so it can never rot.

Run it directly::

    python examples/tour.py            # uses /root/testdata/sf0.001

Every result is a lazy DataFrame until shown — the Spark-first
replacement for the reference's eager lists.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main(spark=None, workdir: str | None = None, sf_dir: str | None = None,
         show: bool = True) -> dict:
    """Run the whole tour; returns {section: row_count} for the smoke
    test. ``show=False`` silences the .show() output (test mode)."""
    from kafi_spark.session import get_spark

    spark = spark or get_spark("kafi_spark_tour")
    workdir = workdir or tempfile.mkdtemp(prefix="kafi_tour_")
    sf_dir = sf_dir or "/root/testdata/sf0.001"
    out: dict[str, int] = {}

    def _show(title: str, df, n: int = 5):
        if show:
            print(f"\n== {title} ==")
            df.show(n, truncate=60)

    # ------------------------------------------------------------------
    # 1. Topics: create / produce / list  (reference demo.ipynb cell 1-3)
    # ------------------------------------------------------------------
    from kafi_spark.storage import Local

    c = Local(spark, f"{workdir}/fs")
    c.create("snacks", partitions=3)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    msgs = docs.select(
        F.col("doc_id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct("doc_id", "lang", "source", "text"))
        .cast("binary").alias("value"),
    )
    c.produce("snacks", msgs)
    topics = c.l()  # topic -> message count, like the reference's `l()`
    if show:
        print("== topics ==", topics)
    out["topics"] = topics["snacks"]

    # ------------------------------------------------------------------
    # 2. Shell verbs on topic names: cat / head / grep / wc
    # ------------------------------------------------------------------
    head = c.head("snacks", n=3)
    _show("head(snacks, 3)", head)
    out["head"] = head.count()
    hits = c.grep("snacks", '"lang":"en"')
    out["grep"] = hits.count()
    wc = c.wc("snacks")
    _show("wc(snacks)", wc)
    out["wc"] = wc.count()

    # ------------------------------------------------------------------
    # 3. cp with a transform (reference: functional verbs + *_to)
    # ------------------------------------------------------------------
    c.create("snacks_upper", partitions=3)
    c.cp("snacks", c, "snacks_upper",
         transform=lambda df: df.withColumn(
             "value", F.upper(F.col("value").cast("string")).cast("binary")))
    out["cp"] = c.l()["snacks_upper"]

    # ------------------------------------------------------------------
    # 4. Streams topology, batch AND streaming off the same graph
    #    (reference: multiple_sinks.ipynb — one source, two sinks)
    # ------------------------------------------------------------------
    from kafi_spark.streaming.runner import await_all, run_streaming
    from kafi_spark.streaming.topology import Topology

    t = Topology()
    lines = t.source("lines")
    words = (
        lines.flatmap(F.split(F.lower(F.col("line")), r"\s+"), "word",
                      keep=("ts",))
        .filter(F.length("word") > 0)
    )
    # windowed per-minute counts through the NATIVE window node: its
    # grouping contains window(ts), so the stream leg below — whose
    # source carries a watermark — runs with bounded state (closed
    # windows are evicted). An unwindowed group_by_count would keep one
    # state entry per word forever and trip the runner's unbounded-
    # state advisory; the front door models the discipline instead.
    from kafi_spark.streaming.topology import wcount

    words.window_tumbling_native(
        "ts", "1 minute", ["word"], wcount().alias("n")).sink("counts")
    words.filter(F.col("word").startswith("s")).sink("s_words")
    if show:
        print("\n== topology ==\n" + t.term())

    batch_lines = docs.select(
        F.col("text").alias("line"),
        F.timestamp_seconds(F.col("doc_id")).alias("ts"))
    batch_out = t.build_batch({"lines": batch_lines})
    _show("wordcount (batch)", batch_out["counts"].orderBy(F.desc("n")))
    out["topology_batch"] = batch_out["counts"].count()

    # the SAME topology as a stream: json files in, two sinks out.
    # The source feed is WATERMARKED (the streams.windows.
    # streaming_tumbling pairing: withWatermark + the window grouping
    # inside the topology) — late data past 10s is dropped and closed
    # windows' state is freed.
    src = f"{workdir}/stream_in"
    os.makedirs(src)
    with open(f"{src}/chunk.json", "w") as fh:
        for r in docs.limit(20).collect():
            fh.write(json.dumps({"line": r["text"],
                                 "ts": int(r["doc_id"])}) + "\n")
    stream = (
        spark.readStream.schema("line string, ts long").json(src)
        .withColumn("ts", F.timestamp_seconds(F.col("ts")))
        .withWatermark("ts", "10 seconds")
    )
    counted: list = []
    qs = run_streaming(
        t,
        {"lines": stream},
        {"counts": lambda df, epoch: counted.extend(df.collect()),
         "s_words": f"{workdir}/s_words_out"},
        checkpoint_root=f"{workdir}/ckpt",
        trigger_available_now=True,
    )
    await_all(qs, timeout_s=120)
    out["topology_stream"] = len(counted)
    s_words = spark.read.parquet(f"{workdir}/s_words_out")
    out["topology_stream_sink2"] = s_words.count()

    # ------------------------------------------------------------------
    # 5. Beyond the reference: LLM curation pipeline + corpus report
    # ------------------------------------------------------------------
    from kafi_spark.functions.pipeline import curate_documents
    from kafi_spark.functions.profile import corpus_report
    from kafi_spark.functions.text import text_stats

    stats = text_stats(docs.select("doc_id", "text"))
    _show("text_stats", stats)
    out["text_stats"] = stats.count()

    curated = curate_documents(
        docs.select("doc_id", "text"), min_quality=0.3, near_dup="minhash")
    out["curated"] = curated.count()
    if show:
        print(f"\n== curation == {docs.count()} docs -> "
              f"{out['curated']} survivors")

    report = corpus_report(docs.select("doc_id", "text"))
    _show("corpus_report", report, n=10)
    out["report"] = report.count()

    # ------------------------------------------------------------------
    # 6. Similarity search over the embeddings table
    # ------------------------------------------------------------------
    from kafi_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    hits = cosine_topk(emb, queries, k=3)
    _show("cosine_topk", hits, n=9)
    out["ann"] = hits.count()

    if show:
        print("\n== tour done ==", out)
    return out


if __name__ == "__main__":
    main()
