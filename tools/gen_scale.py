"""Deterministic sf1 twins of the scale-sensitive driver tables.

The round driver ships testdata at sf0.001/0.01/0.1 (TESTDATA.md); the
100 TB story needs at least one measurement a decade above the bench
tier. The driver's generator itself isn't in the repo, so this twin is
SHAPE-MATCHED rather than byte-matched: every distribution that the
scale-probed queries are sensitive to is measured from the sf0.1
parquet and reproduced at 10x rows under one numpy seed —

- ``documents``: vocabulary = the sf0.1 token set; token-count range
  measured from sf0.1; language/source mix preserved; near-duplicate
  CHAINS on consecutive doc_ids at the measured ~4.5% rate with 1-2
  token mutations (what MinHash/SimHash/substring dedup key on); a
  small exact-dup rate. Dup RATES are held constant across sf — per-row
  dedup cost comparisons stay like-for-like.
- ``embeddings``: 64-dim unit-normalized vectors in 10 label clusters
  (random centers + noise, renormalized), 10x rows.
- ``events``: timestamps monotone in event_id across the same 30-day
  window, uniform event_type over 5 values, exponential-ish value
  (mean 50, 2dp), uniform users scaled 10x (per-user event count held
  ~constant — grouping cardinality scales, group size doesn't), JSON
  props.

Output: ``var/sf1/{documents,embeddings,events}.parquet`` (gitignored;
regenerate with ``python tools/gen_scale.py``). Pure
numpy+pyarrow — no Spark needed to build ~70 MB of parquet.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
SF01 = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "var", "sf1")
SCALE = 10

N_DOCS = 5_000 * SCALE
N_EMB = 2_000 * SCALE
N_EVENTS = 100_000 * SCALE

LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]  # measured sf0.1 mix
NEAR_DUP_P = 0.045   # measured: 228 shared-prefix chains / 5000 docs
EXACT_DUP_P = 0.0016  # measured: 8 exact pairs / 5000 docs


def _vocab() -> list[str]:
    import duckdb

    rows = duckdb.sql(
        f"select distinct unnest(string_split(text, ' ')) w "
        f"from '{SF01}/documents.parquet' order by 1"
    ).fetchall()
    return [r[0] for r in rows if r[0]]


def gen_documents(rng: np.random.Generator) -> pa.Table:
    vocab = np.array(_vocab())
    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    i = 0
    while i < N_DOCS:
        n_tok = int(rng.integers(10, 101))
        toks = vocab[rng.integers(0, len(vocab), n_tok)]
        text = " ".join(toks)
        lang = LANGS[rng.choice(len(LANGS), p=LANG_W)]
        src = f"src{int(rng.integers(0, 20))}"
        texts.append(text)
        langs.append(lang)
        sources.append(src)
        i += 1
        # near-dup chain: consecutive ids, 1-2 token mutations (the
        # structure the sf0.1 generator exhibits)
        while i < N_DOCS and rng.random() < NEAR_DUP_P:
            mut = toks.copy()
            for _ in range(int(rng.integers(1, 3))):
                mut[int(rng.integers(0, len(mut)))] = vocab[
                    int(rng.integers(0, len(vocab)))]
            toks = mut
            text = " ".join(toks)
            texts.append(text)
            langs.append(lang)
            sources.append(f"src{int(rng.integers(0, 20))}")
            i += 1
        if i < N_DOCS and rng.random() < EXACT_DUP_P:
            texts.append(text)
            langs.append(lang)
            sources.append(src)
            i += 1
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(rng: np.random.Generator) -> pa.Table:
    dim, n_labels = 64, 10
    centers = rng.standard_normal((n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_labels, N_EMB)
    vecs = centers[labels] + 0.5 * rng.standard_normal((N_EMB, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    flat = pa.array(vecs.astype("float32").ravel(), pa.float32())
    return pa.table({
        "vec_id": pa.array(range(N_EMB), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(flat, dim).cast(
            pa.list_(pa.float32())),
        "label": pa.array(labels.astype("int32"), pa.int32()),
    })


def gen_events(rng: np.random.Generator) -> pa.Table:
    start = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    end = np.datetime64("2024-01-31T00:00:00", "us").astype("int64")
    ts = np.sort(rng.integers(start, end, N_EVENTS))
    types = np.array(["view", "click", "signup", "purchase", "error"])
    etype = types[rng.integers(0, 5, N_EVENTS)]
    value = np.round(np.minimum(rng.exponential(50.0, N_EVENTS), 560.0), 2)
    users = rng.integers(0, 1_500 * SCALE, N_EVENTS)
    props = [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, N_EVENTS)]
    return pa.table({
        "event_id": pa.array(range(N_EVENTS), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(etype, pa.string()),
        "value": pa.array(value, pa.float64()),
        "props": pa.array(props, pa.string()),
    })


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for idx, (name, fn) in enumerate((("documents", gen_documents),
                                      ("embeddings", gen_embeddings),
                                      ("events", gen_events))):
        path = os.path.join(OUT, f"{name}.parquet")
        if os.path.exists(path) and "--force" not in sys.argv:
            print(f"exists: {path}")
            continue
        # per-table RNG stream: skip-if-exists would otherwise leave one
        # shared sequential stream in a different position depending on
        # which tables were regenerated, breaking the determinism the
        # scale probe's reproducibility rests on
        t = fn(np.random.default_rng([SEED, idx]))
        pq.write_table(t, path, compression="snappy")
        print(f"wrote {path}: {t.num_rows} rows")


if __name__ == "__main__":
    main()
