"""Byte-pair encoding: train on a word histogram, encode distributed.

``text.bpe_token_estimate`` is a regex heuristic; this module is the
real thing, in the shape production BPE trainers use (Sennrich et al.
2016 / GPT-2): training never touches the corpus row-by-row — it runs
on the WORD HISTOGRAM, which one aggregate pass produces and which is
tiny relative to the corpus (distinct words, Zipf-bounded; capped at
``max_words`` by frequency for a hard driver-memory bound). Merge
learning is a driver-side loop over that compact histogram (the
classic algorithm is inherently sequential — each merge depends on the
last — so distributing it would serialize anyway); encoding broadcasts
the learned merge ranks and maps the corpus once with Arrow batches.

Scale shape: one shuffle for the histogram (map-side combined word
counts), zero shuffles to encode. The merge table is ≤ vocab_size
entries — kilobytes — broadcast once.

Determinism: ties in pair frequency break lexicographically, so the
merge list is a pure function of (histogram, vocab_size); the
histogram cap keeps it independent of partitioning (ties inside the
cap boundary break by word).

Reference scope: beyond-reference LLM-pipeline layer (token counting /
packing support).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, functions as F

from .text import ws_tokens as _ws_tokens

#: marks end-of-word so merges never cross word boundaries
_EOW = "▁"


def word_histogram(
    df: DataFrame, text_col: str = "text", max_words: int = 100_000
) -> list[tuple[str, int]]:
    """(word, count) pairs from one aggregate pass, capped to the
    ``max_words`` most frequent (ties broken by word for determinism).
    The cap bounds driver memory; dropping the Zipf tail barely moves
    merge statistics — exactly the trade production tokenizers make."""
    counts = (
        df.select(F.explode(_ws_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
    )
    return [(r.w, r.c) for r in counts.collect()]


def train_bpe(
    histogram: list[tuple[str, int]], vocab_size: int = 1000
) -> list[tuple[str, str]]:
    """Learn BPE merges from a word histogram (driver-side — the
    algorithm is sequential by nature and the histogram is compact).

    Starts from characters (+ end-of-word mark on the final char),
    repeatedly merges the most frequent adjacent symbol pair (ties:
    lexicographic) until the symbol inventory reaches ``vocab_size`` or
    no pair repeats. Returns the ordered merge list."""
    words: list[tuple[list[str], int]] = []
    symbols: set[str] = set()
    for w, c in histogram:
        chars = list(w)
        if not chars:
            continue
        chars[-1] = chars[-1] + _EOW
        words.append((chars, c))
        symbols.update(chars)
    merges: list[tuple[str, str]] = []
    while len(symbols) < vocab_size:
        pairs: Counter = Counter()
        for chars, c in words:
            for a, b in zip(chars, chars[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best_n = max(pairs.values())
        if best_n < 2:
            break
        best = min(p for p, n in pairs.items() if n == best_n)
        merges.append(best)
        merged = best[0] + best[1]
        symbols.add(merged)
        a, b = best
        for chars, _ in words:
            i = 0
            while i < len(chars) - 1:
                if chars[i] == a and chars[i + 1] == b:
                    chars[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    chars = list(word)
    if not chars:
        return []
    chars[-1] = chars[-1] + _EOW
    while len(chars) > 1:
        best_i, best_r = -1, None
        for i, pair in enumerate(zip(chars, chars[1:])):
            r = ranks.get(pair)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        chars[best_i : best_i + 2] = [chars[best_i] + chars[best_i + 1]]
    return chars


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize every document with the learned merges:
    ``(id, tokens array<string>, n_tokens)``. One Arrow-batched map —
    merge ranks broadcast, per-word results memoized within each batch
    (Zipf makes the cache hit rate high)."""
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast({p: i for i, p in enumerate(merges)})

    # SAME word framing as training: Java's \s (word_histogram's split)
    # is the ASCII class only — Python str.split() also breaks on NBSP/
    # unicode spaces, so merges learned over 'foo\u00a0bar' would never
    # have applied at encode time (silent train/encode divergence)
    _ws = __import__("re").compile(r"[ \t\n\x0b\f\r]+")

    def op(batches):
        ranks = bc.value
        for pdf in batches:
            # memoized WITHIN each batch, as documented — a per-partition
            # dict grew without bound on high-distinct-word partitions
            cache: dict[str, list[str]] = {}
            toks_col, n_col = [], []
            for t in pdf["__text"]:
                toks: list[str] = []
                for w in _ws.split(t or ""):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    toks.extend(got)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {"__id": pdf["__id"].values, out_col: toks_col,
                 "n_tokens": pd.Series(n_col, dtype="int64")}
            )

    id_t = df.schema[id_col].dataType.simpleString()
    return (
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
        .mapInPandas(op, f"__id {id_t}, {out_col} array<string>, n_tokens long")
        .withColumnRenamed("__id", id_col)
    )


def save_bpe(merges: list[tuple[str, str]], path: str) -> None:
    """Persist an ordered merge list as JSON (atomic: tmp + rename —
    a crashed save never leaves a truncated artifact a later
    :func:`load_bpe` would half-read). The merge list IS the tokenizer:
    rank = list position, so order must survive the round trip."""
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"format": "kafi-bpe-merges", "version": 1,
                   "merges": [[a, b] for a, b in merges]}, f)
        f.flush()
        os.fsync(f.fileno())   # rename durability needs the DATA synced
    os.replace(tmp, path)


def load_bpe(path: str) -> list[tuple[str, str]]:
    """Reload merges saved by :func:`save_bpe` (order preserved)."""
    import json

    with open(path, encoding="utf-8") as f:
        obj = json.load(f)
    if obj.get("format") != "kafi-bpe-merges":
        raise ValueError(f"{path} is not a kafi BPE merge file")
    return [(a, b) for a, b in obj["merges"]]
