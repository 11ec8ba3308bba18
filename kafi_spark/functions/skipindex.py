"""File-level bloom skip-index: point lookups without the full scan.

``layout.zorder_write`` makes RANGE predicates prunable from parquet
footer min/max stats, but a point lookup on an unclustered
high-cardinality key ("fetch these 5 doc_ids out of 100 TB") defeats
min/max: every file's [min, max] spans the whole key space, so every
file is a candidate and the scan is full. The standard fix (Parquet
bloom filters help only at row-group grain inside files Spark already
opened; external data-skipping indexes as in Delta/Iceberg work at FILE
grain) is a per-file bloom over the indexed column: the reader probes
the index first and hands Spark only the files that can contain the
keys.

Design points, all chosen for the 1000-executor case:

- **The index IS a parquet table** (``<data>/_kafi_skip_index/``) built
  by one distributed scan — per-file bloom words are aggregated with
  ``bit_or`` inside Spark and written straight out; NOTHING is
  collected to the driver at build time, so index build scales with the
  cluster exactly like any aggregation. The underscore prefix keeps
  Spark's own directory listing from reading the index as data.
- **Probes read the index with pushdown**: a lookup needs exactly the
  k bloom words per (file, value), and the probe filters the index on
  ``word_idx IN (...)`` — parquet min/max on the sorted index prunes
  the index read itself. Only those few words reach the driver, which
  then evaluates membership and returns the candidate file list.
- **No false negatives by construction**: build and probe share one
  hash family (``xxhash64(value, seed)``, JVM-side), and a bloom
  admits every inserted key. False positives only cost extra files
  scanned — the result is re-filtered, so correctness never depends on
  the index.
- **Min/max rides along**: the index stores per-file (min, max, rows)
  too, so range-clustered layouts prune on stats before blooms are even
  consulted.

Sizing: ``num_bits`` is per file; m ≈ 14.4 × n_distinct gives ~1% false
positives with the default k=7 (larger m only costs index bytes, never
correctness). The index is static — rebuild after rewriting data files
(``build_skip_index`` overwrites atomically per Spark's normal commit).

Reference scope note: the reference engine has no skipping index; this
is part of the beyond-reference 100 TB layout/efficiency layer, a
sibling of ``layout.py``'s z-order clustering.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

_INDEX_DIR = "_kafi_skip_index"
_DEFAULT_NUM_BITS = 1 << 20  # 128 KiB of bloom per file per column
_DEFAULT_K = 7


def _bit_cols(col: str, num_bits: int, k: int):
    """The k bloom bit positions of a value — one Column per seed.
    xxhash64 is signed; the double-mod folds negatives into [0, m)."""
    m = F.lit(num_bits).cast("long")
    return [
        ((F.xxhash64(F.col(col), F.lit(seed)) % m) + m) % m
        for seed in range(1, k + 1)
    ]


def index_path_of(data_path: str) -> str:
    return f"{data_path.rstrip('/')}/{_INDEX_DIR}"


def build_skip_index(
    spark,
    data_path: str,
    cols: Sequence[str],
    num_bits: int = _DEFAULT_NUM_BITS,
    k: int = _DEFAULT_K,
) -> None:
    """Build (or rebuild) the skip index for ``cols`` under
    ``data_path/_kafi_skip_index``.

    One distributed scan of the indexed columns: explode each value
    into its k bit positions, fold to 64-bit words with map-side
    ``bit_or``, and write ``(col, file, word_idx, word)`` range-
    clustered by ``(col, word_idx)`` so probe-time ``word_idx`` filters
    prune files AND row groups. Nulls are not indexed (a bloom can't
    represent null; probe for nulls with an ordinary scan).
    """
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    df = spark.read.option("basePath", data_path).parquet(data_path)
    indexed_files = sorted(df.inputFiles())
    # crash ordering (review r7): retire the OLD manifest before the
    # bloom overwrite. The manifest pins the hash geometry; a rebuild
    # with different num_bits/k that dies between the bloom overwrite
    # and the manifest write would otherwise leave probes hashing with
    # the old modulus against the new blooms — silent FALSE NEGATIVES,
    # the one thing the index contracts away. With the manifest gone
    # the index reads as absent for the whole window: callers degrade
    # to full scans (correct, just unpruned), same as the documented
    # drift story. skip_index_append keeps its own append-then-fence
    # ordering (geometry unchanged there).
    jvm = spark._jvm
    man_dir = jvm.org.apache.hadoop.fs.Path(
        f"{index_path_of(data_path)}/manifest")
    man_dir.getFileSystem(spark._jsc.hadoopConfiguration()).delete(
        man_dir, True)
    _write_index_delta(df, data_path, cols, num_bits, k, mode="overwrite")
    _write_manifest(spark, data_path, cols, num_bits, k, indexed_files,
                    {c: df.schema[c].dataType.simpleString() for c in cols})


def _write_index_delta(
    df: DataFrame, data_path: str, cols: Sequence[str],
    num_bits: int, k: int, mode: str,
) -> None:
    """Build the (bloom, minmax) index rows for ``df``'s files and write
    them — the shared body of :func:`build_skip_index` (overwrite) and
    :func:`skip_index_append` (append of new files only)."""
    blooms = []
    metas = []
    for col in cols:
        base = df.select(
            F.input_file_name().alias("file"), F.col(col).alias("__v")
        ).filter(F.col("__v").isNotNull())
        bits = F.array(*_bit_cols("__v", num_bits, k))
        words = (
            base.select("file", F.explode(bits).alias("__bit"))
            .select(
                "file",
                F.shiftright(F.col("__bit"), 6).cast("int").alias("word_idx"),
                # shiftleft with a column-valued amount needs the SQL
                # form (the DSL's numBits is a Python int only)
                F.expr("shiftleft(1L, int(__bit % 64))").alias("__mask"),
            )
            .groupBy("file", "word_idx")
            .agg(F.bit_or("__mask").alias("word"))
            .select(F.lit(col).alias("col"), "file", "word_idx", "word")
        )
        blooms.append(words)
        metas.append(
            base.groupBy("file").agg(
                F.min("__v").cast("string").alias("min_v"),
                F.max("__v").cast("string").alias("max_v"),
                F.count(F.lit(1)).alias("rows"),
            ).select(F.lit(col).alias("col"), "file", "min_v", "max_v", "rows")
        )
    root = index_path_of(data_path)
    all_blooms = blooms[0]
    for b in blooms[1:]:
        all_blooms = all_blooms.unionByName(b)
    # layout serves the PROBE's access path (filter on word_idx via
    # isin pushdown; file is never a filter): range-partition and sort
    # by (col, word_idx) so each output file / row group covers a
    # NARROW word_idx band and probe scans prune to ~k·|values| bands.
    # The old repartition("col") hashed on the column NAME — at 2
    # indexed columns that funneled the whole index through 2 tasks
    # (single-task sort of every bloom row at 10^5-10^6 data files),
    # and its (col, file, word_idx) sort cycled word_idx 0..16383
    # within every file run, voiding the very pushdown the layout
    # claimed (review r7).
    (
        all_blooms.repartitionByRange("col", "word_idx")
        .sortWithinPartitions("col", "word_idx", "file")
        .write.mode(mode)
        .parquet(f"{root}/bloom")
    )
    all_meta = metas[0]
    for m_ in metas[1:]:
        all_meta = all_meta.unionByName(m_)
    all_meta.coalesce(1).write.mode(mode).parquet(f"{root}/minmax")


def _write_manifest(spark, data_path, cols, num_bits, k, files, dtypes):
    # manifest pins the hash geometry the probes must reuse, plus the
    # SNAPSHOT of files the index covers — probes treat files appended
    # after the build as unindexed (always scanned) and files deleted
    # since as gone, so drift degrades pruning, never correctness
    import json

    manifest = spark.createDataFrame(
        [(json.dumps({
            "num_bits": num_bits, "k": k, "cols": list(cols),
            "files": sorted(files), "dtypes": dtypes,
        }),)],
        "manifest string",
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        f"{index_path_of(data_path)}/manifest")


def skip_index_append(spark, data_path: str) -> list[str]:
    """Index the data files APPENDED since the last build/append —
    the daily-ingest path (the drift story's missing half: probes
    already treat post-build files as always-scan; this restores their
    pruning without re-scanning the indexed corpus). Geometry
    (cols/num_bits/k/dtypes) comes from the manifest, so appended rows
    hash identically to the build's. Returns the newly indexed file
    URIs (empty when the index is current).

    Crash-safe by ordering + probe construction: bloom/minmax rows are
    APPENDED first, the manifest (the read fence) is atomically
    overwritten last. A crash in between leaves the new files listed as
    unindexed (always scanned — correct, just unpruned), and a RETRIED
    append may duplicate their bloom rows — harmless, because the probe
    verdict counts DISTINCT matched words per (file, value), never raw
    joined rows."""
    man = _load_manifest(spark, data_path)
    df = spark.read.option("basePath", data_path).parquet(data_path)
    current = {_norm_uri(f): f for f in df.inputFiles()}
    indexed = {_norm_uri(f) for f in man.get("files", [])}
    new_raw = [raw for norm, raw in sorted(current.items())
               if norm not in indexed]
    if not new_raw:
        return []
    new_df = spark.read.option("basePath", data_path).parquet(*new_raw)
    _write_index_delta(
        new_df, data_path, man["cols"], man["num_bits"], man["k"],
        mode="append",
    )
    # surviving manifest entries: still-present old files + the new ones
    # (deleted files drop out so the manifest never re-grows stale names)
    kept_old = [f for f in man.get("files", []) if _norm_uri(f) in current]
    _write_manifest(
        spark, data_path, man["cols"], man["num_bits"], man["k"],
        kept_old + new_raw, man.get("dtypes", {}),
    )
    return new_raw


def _load_manifest(spark, data_path: str) -> dict:
    import json

    row = spark.read.parquet(
        f"{index_path_of(data_path)}/manifest"
    ).first()
    return json.loads(row["manifest"])


def _probe_frame(spark, values, num_bits: int, k: int,
                 dtype: str | None = None) -> DataFrame:
    """Tiny probe frame ``(__vid, __v, word_idx, mask)`` — per probe
    value, the bloom words it needs and the required bit mask within
    each word (bits landing in the same word fold into one mask row via
    ``bit_or``, ≤ k rows per value). Bit positions are computed with the
    SAME JVM xxhash64 expressions as the build — INCLUDING the column's
    Spark type: xxhash64 hashes an int and a bigint of equal value
    differently, so a probe literal inferred as bigint against an
    int-column index would silently miss every row (false negatives).
    ``dtype`` is the indexed column's type from the manifest; probe
    values are cast to it before hashing."""
    vdf = spark.createDataFrame(list(enumerate(values)), ["__vid", "__v"])
    hashed = vdf.withColumn(
        "__h", F.col("__v").cast(dtype) if dtype else F.col("__v"))
    return (
        hashed.select(
            "__vid", "__v",
            F.explode(F.array(*_bit_cols("__h", num_bits, k))).alias("__bit"),
        )
        .select(
            "__vid", "__v",
            F.shiftright(F.col("__bit"), 6).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, int(__bit % 64))").alias("__m"),
        )
        .groupBy("__vid", "__v", "word_idx")
        .agg(F.bit_or("__m").alias("mask"))
    )


def _norm_uri(u: str) -> str:
    """Canonicalize 'file:/p', 'file:///p', '/p' to one form so file
    identities from ``input_file_name()`` (build) and ``inputFiles()``
    (probe) always compare equal."""
    import re as _re

    return _re.sub(r"^file:/+", "/", u)


def skip_index_candidates(
    spark, data_path: str, col: str, values: Sequence
) -> list[str]:
    """Files that MAY contain any of ``values`` in ``col`` — every file
    that truly contains one is returned (no false negatives); a small
    false-positive tail is expected and harmless.

    The verdict is computed DISTRIBUTED, as a join/aggregation over the
    index tables: the tiny probe frame (≤ k·|values| (word, mask) rows)
    broadcast-joins the bloom table on ``word_idx`` (``isin`` pushdown
    prunes the index scan), a per-(file, value) aggregate checks that
    every needed word is present with all mask bits set, and only the
    SURVIVING file names are collected. Driver-side rows are bounded by
    |candidates| + |unindexed| + k·|values| — never O(indexed files),
    which at 100 TB (10⁵–10⁶ files) is the difference between a probe
    and a metadata full-scan. A value outside a (string) file's
    [min, max] is discarded before the bloom verdict.

    Drift-safe against append-only layouts (e.g. FS topics): the
    manifest records the file snapshot the index covers, so files
    APPENDED since the build are returned unconditionally (unindexed ⇒
    must be scanned — pruning degrades, correctness doesn't) and files
    DELETED since are dropped. Rebuild the index to restore pruning
    after heavy drift.
    """
    if not values:
        return []
    if any(v is None for v in values):
        raise ValueError("cannot probe the skip index for NULL")
    man = _load_manifest(spark, data_path)
    if col not in man["cols"]:
        raise ValueError(
            f"column {col!r} not indexed (have {man['cols']})")
    num_bits, k = man["num_bits"], man["k"]
    dtype = man.get("dtypes", {}).get(col)
    current = {
        _norm_uri(f)
        for f in spark.read.option("basePath", data_path)
        .parquet(data_path).inputFiles()
    }
    indexed = {_norm_uri(f) for f in man.get("files", [])}
    unindexed = [n for n in current if n not in indexed]
    probe = _probe_frame(spark, list(dict.fromkeys(values)), num_bits, k,
                         dtype=dtype)
    root = index_path_of(data_path)
    # the needed word indexes ARE collected (≤ k·|values| ints, probe-
    # sized) — they form the isin() filter that lets parquet min/max on
    # the sorted index prune the bloom read itself
    needed = sorted(
        r["word_idx"] for r in probe.select("word_idx").distinct().collect()
    )
    words = (
        spark.read.parquet(f"{root}/bloom")
        .filter((F.col("col") == col) & F.col("word_idx").isin(needed))
    )
    # a value hits a file iff EVERY one of its needed words exists in the
    # file's bloom with all mask bits set: inner-join then require
    # n_matched == n_needed (a missing word row yields fewer joined rows,
    # so absent words fail the equality exactly like an all-zero word).
    # count_distinct — not count — so a duplicated bloom row (a crashed
    # skip_index_append retried, leaving two copies of a file's words)
    # can never push n_ok past n_need and turn the equality into a
    # FALSE NEGATIVE; duplicates are harmless either way.
    per_file = (
        words.join(F.broadcast(probe), "word_idx")
        .groupBy("file", "__vid", "__v")
        .agg(
            F.count_distinct(
                F.when(
                    F.col("word").bitwiseAND(F.col("mask")) == F.col("mask"),
                    F.col("word_idx"),
                )
            ).alias("n_ok")
        )
    )
    n_need = probe.groupBy("__vid").agg(F.count(F.lit(1)).alias("n_need"))
    hits = per_file.join(F.broadcast(n_need), "__vid").filter(
        F.col("n_ok") == F.col("n_need")
    )
    if dtype == "string" and all(isinstance(v, str) for v in values):
        # min/max are stored as strings; the range guard applies only
        # when the column AND the probe values are strings (a non-string
        # probe value would coerce against the string bounds and could
        # drop a true hit) — otherwise the bloom alone decides (stats
        # stay advisory, never a correctness risk)
        meta = (
            spark.read.parquet(f"{root}/minmax")
            .filter(F.col("col") == col)
            .select("file", "min_v", "max_v")
        )
        hits = hits.join(meta, "file", "left").filter(
            F.col("min_v").isNull()
            | ((F.col("min_v") <= F.col("__v")) & (F.col("__v") <= F.col("max_v")))
        )
    cand = [r["file"] for r in hits.select("file").distinct().collect()]
    out = list(unindexed) + [
        _norm_uri(f) for f in cand if _norm_uri(f) in current
    ]
    return sorted(set(out))


def pruned_point_read(
    spark, data_path: str, col: str, values: Sequence
) -> DataFrame:
    """``SELECT * FROM data WHERE col IN (values)`` scanning only the
    skip-index candidate files. The filter is re-applied on the pruned
    scan, so bloom false positives cannot leak rows; an empty candidate
    list returns an empty frame with the data's schema without reading
    any data file. ``basePath`` keeps hive-partition directory columns
    (e.g. an FS topic's ``partition=N``) in the pruned scan's schema."""
    full = spark.read.option("basePath", data_path).parquet(data_path)
    cands = skip_index_candidates(spark, data_path, col, values)
    if not cands:
        return spark.createDataFrame([], full.schema)
    return (
        spark.read.option("basePath", data_path)
        .parquet(*cands)
        .filter(F.col(col).isin(list(values)))
    )
