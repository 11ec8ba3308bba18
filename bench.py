"""Per-round benchmark: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query's plan is forced end-to-end with the noop sink (full execution,
no driver-side materialization cost). One warm-up query runs first so JVM/
codegen startup isn't attributed to the first headline query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q13",
    "shell_grep",
    "addon_compact",
    "join_equi_agg",
    "join_asof",
    "join_range",
    "group_by_agg",
    "window_aligned",
    "window_sliding",
    "window_session",
    "wordcount",
    "cdc_debezium_apply",
    # LLM-pipeline operators
    "text_stats",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_ngram_capped",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_cosine_topk_lsh",
    "ann_cosine_topk_quantized",
    "emb_neardup",
    "analytic_topn",
    "rollup_agg",
    "zset_ops",
    "cdc_debezium_encode",
    "wire_roundtrip",
    "pipeline_curate",
    "pipeline_curate_minhash",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from kafi_spark.session import get_spark

    spark = get_spark("kafi_spark_bench")
    qs = entry_mod.queries()
    # bench-only twins: scale-default configs (no oracle, so not part of
    # the 50-query driver contract). The driver queries run the exact
    # (oracle-checkable) configs; these time the 100 TB-safe defaults.
    qs["pipeline_curate_minhash"] = entry_mod.q_pipeline_curate_minhash

    def q_dedup_ngram_capped(spark, sf_dir):
        from kafi_spark.functions.dedup import ngram_jaccard_pairs
        from kafi_spark.session import read_table

        d = read_table(spark, sf_dir, "documents")
        return ngram_jaccard_pairs(d, "text", "doc_id", k=3, threshold=0.7,
                                   max_df=1000)

    qs["dedup_ngram_capped"] = q_dedup_ngram_capped

    def q_ann_quantized(spark, sf_dir):
        from pyspark.sql import functions as F

        from kafi_spark.functions.similarity import cosine_topk_quantized
        from kafi_spark.session import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        queries_df = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        corpus = emb.filter(F.col("vec_id") >= 10)
        return cosine_topk_quantized(corpus, queries_df, k=5)

    qs["ann_cosine_topk_quantized"] = q_ann_quantized

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-up: exercise scan + shuffle + codegen paths once
    run(qs["scalar_stats"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        # best of 3: the box shows hypervisor steal-time spikes (noisy
        # neighbors, 2-3x swings on identical plans); the min is the
        # engine's time, the max is the host's
        best = None
        for _ in range(3):
            t0 = time.time()
            run(qs[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            # drop cache entries a query pinned; keeps timings independent
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
