"""Embedding plumbing: chunk → embed → pool, with the MODEL stubbed.

No embedding model ships in this container, so the embedder itself is
a clearly-labeled deterministic stand-in — but everything AROUND it is
the real production plumbing: chunking provenance, batch shapes,
schema, pooling, and hand-off into the ANN/near-dup operators, all
exercised end-to-end by tests. Swap :func:`hash_embedding_col` for a
real model via :func:`model_embedder` (gated on the transformers
library, mirroring ``classify.transformers_scorer``) and nothing else
changes.

The stand-in is an md5-derived unit vector — a pure Column expression
(JVM-side, zero Python) that is deterministic, dimension-parametric,
and DuckDB-replayable, which also makes it a legitimate FEATURE HASHING
embedder (random-projection-like: equal texts collide exactly, which is
precisely what the dedup/retrieval plumbing tests need).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .portable import H_RANGE, md5_long


def hash_embedding_col(text: Column, dim: int = 64) -> Column:
    """Deterministic pseudo-embedding: ``dim`` md5-derived floats in
    [-1, 1], L2-normalized — ``array<float>`` from pure Column
    expressions. STUB for a learned model (equal texts ⇒ identical
    vectors; no semantic structure beyond equality)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            md5_long(F.concat_ws(":", i.cast("string"), text)) / F.lit(H_RANGE)
        )
        * 2.0
        - 1.0,
    )
    norm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    safe = F.when(norm > 0, norm).otherwise(F.lit(1.0))
    return F.transform(raw, lambda x: (x / safe).cast("float"))


def embed_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
    stride: int | None = None,
    dim: int = 64,
    embedder: Column | None = None,
) -> DataFrame:
    """Chunk documents and embed every chunk:
    ``(id, chunk_id, start_token, embedding)`` — the retrieval-indexing
    front half; pool with :func:`similarity.mean_pool_embeddings` or
    feed chunk vectors straight to ``cosine_topk``/ANN.

    ``embedder`` defaults to the hash stub; pass any Column expression
    over the ``chunk`` column (e.g. a pandas-UDF model wrapper from
    :func:`model_embedder`) to swap in a real model."""
    from .spans import chunk_text

    chunks = chunk_text(df, text_col, id_col, max_tokens, stride)
    emb = embedder if embedder is not None else hash_embedding_col(
        F.col("chunk"), dim
    )
    return chunks.select(
        F.col(id_col), "chunk_id", "start_token", emb.alias("embedding")
    )


#: per-worker-process pipeline cache: the model mounts ONCE per python
#: worker (keyed by model name), not once per Arrow batch — reloading
#: weights per batch would dominate inference time
_PIPELINE_CACHE: dict = {}


def _load_pipeline(model_name: str):
    """Lazy per-process singleton for a transformers feature-extraction
    pipeline. Runs on the EXECUTOR inside the UDF closure; the cache is
    module-level so every task in the same worker process reuses one
    mounted model."""
    pipe = _PIPELINE_CACHE.get(model_name)
    if pipe is None:
        from transformers import pipeline

        pipe = pipeline("feature-extraction", model=model_name)
        _PIPELINE_CACHE[model_name] = pipe
    return pipe


def _embed_batch(pipe, texts, dim: int) -> list:
    """Pure extraction logic: first-token embedding per text, truncated
    to ``dim`` floats. Split out so the gate's behavior is unit-testable
    with a fake pipeline (no model download needed)."""
    return [[float(x) for x in pipe(t or "")[0][0][:dim]] for t in texts]


def model_embedder(model_name: str, dim: int):
    """Factory for a REAL transformers-backed embedding pandas UDF —
    gated: raises ImportError if the library is absent (this container
    ships none; the hash stub covers the plumbing). Returns a callable
    usable as ``embedder=model_embedder(...)(F.col("chunk"))``.

    Iterator-of-batches form: the pipeline is resolved ONCE per task
    (and cached per worker process via :func:`_load_pipeline`) before
    the batch loop — never per Arrow batch."""
    try:
        import transformers  # noqa: F401
    except ImportError as ex:
        raise ImportError(
            "transformers is not available in this environment; use the "
            "hash_embedding_col stub (default) for plumbing, or install "
            "an embedding model runtime"
        ) from ex
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        pipe = _load_pipeline(model_name)
        for s in it:
            yield pd.Series(_embed_batch(pipe, list(s), dim))

    return embed
