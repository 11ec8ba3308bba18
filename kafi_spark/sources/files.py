"""File interchange: topic/table <-> csv/json/parquet/orc/avro/xlsx/xml.

Reference: ``kafi/files.py`` (topic_to_file 15-56, file_to_topic 58-85)
routes through pandas for every format. Spark-first: csv/json/parquet/orc
are native distributed readers/writers; avro container files go through
the repo's OCF Python data source (:mod:`.avro_ocf` — distributed, built
on the from-scratch codec, since pip PySpark lacks the spark-avro module
jar); xlsx/xml fall back to pandas at the driver (they are driver-side in
the reference too) gated behind import-try.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

_SPARK_FORMATS = {"csv", "json", "parquet", "orc"}


def _fmt_of(path: str, fmt: str | None) -> str:
    # lowercase EITHER source: an explicit fmt="CSV" raised while the
    # extension ".CSV" worked (review r7)
    return (fmt or os.path.splitext(path)[1].lstrip(".")).lower()


def table_to_file(df: DataFrame, path: str, fmt: str | None = None, header: bool = True) -> None:
    """Export (kafi/files.py:15-56). Distributed for csv/json/parquet —
    writes a directory of part files (the scalable contract); xlsx/xml
    collect to the driver via pandas (small-result paths)."""
    fmt = _fmt_of(path, fmt)
    if fmt in _SPARK_FORMATS:
        w = df.write.mode("overwrite")
        if fmt == "csv":
            w.option("header", str(header).lower()).csv(path)
        elif fmt == "json":
            w.json(path)
        elif fmt == "orc":
            w.orc(path)
        else:
            w.parquet(path)
        return
    if fmt == "avro":
        # pip PySpark has no spark-avro module jar; route through the
        # repo's OCF Python data source (kafi_spark/sources/avro_ocf.py)
        from .avro_ocf import register

        register(df.sparkSession)
        df.write.format("kafi_avro").mode("overwrite").save(path)
        return
    if fmt in ("xlsx", "xml"):
        pdf = df.toPandas()
        try:
            if fmt == "xlsx":
                pdf.to_excel(path, index=False)
            else:
                pdf.to_xml(path, index=False)
        except ImportError as e:  # openpyxl / lxml not in this container
            raise NotImplementedError(f"{fmt} export needs an optional library: {e}") from e
        return
    if fmt == "bytes":
        # kafi/files.py bytes export: concatenated raw message values
        # (small-result driver path, like xlsx/xml)
        col = "value" if "value" in df.columns else df.columns[0]
        with open(path, "wb") as f:
            for r in df.select(col).toLocalIterator():
                v = r[0]
                if v is None:
                    continue
                f.write(v if isinstance(v, (bytes, bytearray)) else str(v).encode())
        return
    raise ValueError(f"unsupported format: {fmt}")


def file_to_table(spark: SparkSession, path: str, fmt: str | None = None,
                  schema=None, header: bool = True) -> DataFrame:
    """Import (kafi/files.py:58-85)."""
    fmt = _fmt_of(path, fmt)
    if fmt == "csv":
        r = spark.read.option("header", str(header).lower())
        return (r.schema(schema) if schema else r.option("inferSchema", "true")).csv(path)
    if fmt == "json":
        r = spark.read
        return (r.schema(schema) if schema else r).json(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "avro":
        from .avro_ocf import register

        register(spark)
        r = spark.read.format("kafi_avro")
        return (r.schema(schema) if schema else r).load(path)
    if fmt in ("xlsx", "xml"):
        import pandas as pd

        try:
            pdf = pd.read_excel(path) if fmt == "xlsx" else pd.read_xml(path)
        except ImportError as e:
            raise NotImplementedError(f"{fmt} import needs an optional library: {e}") from e
        return spark.createDataFrame(pdf)
    if fmt == "bytes":
        with open(path, "rb") as f:
            return spark.createDataFrame([(f.read(),)], "value binary")
    raise ValueError(f"unsupported format: {fmt}")


# -- pandas bridge (kafi/pandas.py:13-46) -----------------------------------

def table_to_pandas(df: DataFrame, n: int | None = None):
    """topic -> pd.DataFrame (kafi/pandas.py:13-28). Arrow-accelerated
    ``toPandas``; ``n`` caps the driver transfer."""
    return (df.limit(n) if n is not None else df).toPandas()


def pandas_to_table(spark: SparkSession, pdf) -> DataFrame:
    """pd.DataFrame -> topic-able DataFrame (kafi/pandas.py:30-46)."""
    return spark.createDataFrame(pdf)


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_by: str,
    fmt: str = "parquet",
) -> DataFrame:
    """Deterministic sharded export for training dataloaders: rows land in
    shard ``pmod(xxhash64(shard_by), n_shards)`` — stable across runs and
    cluster sizes (unlike ``repartition(n)``'s round-robin, which depends
    on input partitioning), so shard membership is reproducible and
    downstream loaders can address shards independently.

    Writes ``path/shard=K/`` directories (one directory-partition per
    shard; each holds that shard's rows regardless of upstream layout —
    one shuffle on the shard id). Returns a (shard, rows) manifest
    DataFrame computed from the written data.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    out = df.withColumn(
        "shard",
        F.pmod(F.xxhash64(F.col(shard_by).cast("string")), F.lit(n_shards)).cast("int"),
    ).repartition("shard")
    out.write.mode("overwrite").partitionBy("shard").format(fmt).save(path)
    spark = df.sparkSession
    written = spark.read.format(fmt).load(path)
    counts = written.groupBy("shard").agg(F.count(F.lit(1)).alias("rows"))
    # every shard id gets a manifest row, rows=0 for empty ones (review
    # r7): with fewer distinct keys than shards, some shard=K dirs don't
    # exist — a loader iterating 0..n_shards-1 could not tell "empty
    # shard" from "failed export" without these rows
    all_ids = spark.range(n_shards).select(F.col("id").cast("int").alias("shard"))
    return (
        all_ids.join(counts, "shard", "left")
        .select("shard", F.coalesce("rows", F.lit(0)).cast("long").alias("rows"))
    )
