"""Text classification / scoring — the reference's enrichment pattern.

The reference ships classification as an example flow (classify.py:1-27):
consume a JSON topic, score each document with a transformer sentiment
model (negative-probability → integer "fear index" 0-100), attach the
score, produce to a protobuf topic. The MODEL is an external dependency
(HuggingFace transformers, absent here); the PATTERN — batch text →
per-document scores attached as a typed column — is engine surface and
is implemented for real:

* ``score_text`` runs any batch scorer (``list[str] -> list[int]``)
  through an Arrow-batched pandas UDF — partition-parallel, one Python
  crossing per batch, exactly how a transformers pipeline would be
  mounted (load the model once per executor inside the closure).
* ``lexicon_fear_index`` is the dependency-free default scorer: the
  negative-word ratio scaled to 0-100 — deterministic, so the flow is
  testable end-to-end (and SQL-oracle-checkable) without model weights.
* A model-backed scorer plugs in with the same signature; see the
  docstring of :func:`transformers_scorer` for the gated construction.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

#: default negative-sentiment lexicon for the dependency-free scorer
FEAR_WORDS = (
    "crash", "fear", "loss", "panic", "drop", "fail", "risk", "down",
    "bad", "crisis",
)


def lexicon_fear_index(texts: Sequence[str | None]) -> list[int]:
    """Deterministic 0-100 'fear index': 100 * negative-word fraction,
    capped. Null/empty texts score 0 (reference behavior: classify.py:8
    scores falsy text as 0)."""
    out = []
    for t in texts:
        if not t:
            out.append(0)
            continue
        words = t.lower().split()
        neg = sum(w.strip(".,!?;:") in FEAR_WORDS for w in words)
        out.append(min(100, int(100 * neg / max(len(words), 1))))
    return out


def score_text(
    df: DataFrame,
    text_col: str,
    scorer: Callable[[Sequence[str | None]], list[int]] | None = None,
    out_col: str = "score",
) -> DataFrame:
    """Attach an integer score column computed by ``scorer`` over Arrow
    batches of the text column (reference flow: classify.py:16-19 maps
    get_fear_index over every message value).

    ``scorer`` takes a sequence of texts (possibly None) and returns one
    int per text. Heavy models should be constructed lazily INSIDE the
    scorer closure so each executor loads them once.
    """
    scorer = scorer or lexicon_fear_index

    @F.pandas_udf("int")
    def _score(s: pd.Series) -> pd.Series:
        return pd.Series(scorer(list(s)), dtype="int32")

    return df.withColumn(out_col, _score(F.col(text_col)))


def fear_index_col(text: Column) -> Column:
    """The default lexicon scorer as a PURE Column expression (zero
    Python): same semantics as :func:`lexicon_fear_index`, for when the
    scorer is simple enough to stay in whole-stage codegen — and for the
    SQL oracle to replay."""
    # Python str.split() splits on ANY whitespace run (UNICODE — NBSP
    # included) and never yields empty tokens; Java's bare \s is the
    # ASCII class only, so 'fear panic' scored 0 here and 100 in
    # the Python twin (round-8 review). (?U) turns on Java's
    # UNICODE_CHARACTER_CLASS — the one residual divergence is
    # \x1c-\x1f, which Python's isspace() accepts against the Unicode
    # White_Space property. Empties dropped explicitly: F.trim strips
    # only spaces, so leading/trailing newlines over-counted words.
    words = F.filter(
        F.split(F.lower(text), r"(?U)\s+"), lambda w: F.length(w) > 0
    )
    neg = F.size(
        F.filter(
            F.transform(words, lambda w: F.regexp_replace(w, r"^[.,!?;:]+|[.,!?;:]+$", "")),
            lambda w: w.isin(*FEAR_WORDS),
        )
    )
    n = F.greatest(F.size(words), F.lit(1))
    raw = F.floor(F.lit(100) * neg / n).cast("int")
    empty = text.isNull() | (F.size(words) == 0)
    return F.when(empty, F.lit(0)).otherwise(F.least(F.lit(100), raw)).cast("int")


def transformers_scorer(model_name: str) -> Callable[[Sequence[str | None]], list[int]]:
    """Factory for a transformers-backed scorer with the reference's
    semantics (classify.py:4-14: negative-class probability × 100).
    Gated: raises if the transformers library is absent (this container
    ships no model stack); the returned closure loads the pipeline
    lazily once per executor process.
    """
    try:
        import transformers  # noqa: F401
    except Exception as e:  # noqa: BLE001
        raise NotImplementedError(
            "transformers not available in this environment; use "
            "lexicon_fear_index or any scorer(list[str]) -> list[int]"
        ) from e

    def scorer(texts: Sequence[str | None]) -> list[int]:
        pipe = _load_classifier(model_name)
        out = []
        for t in texts:
            if not t:
                out.append(0)
                continue
            score = 0
            for d in pipe(t)[0]:
                if d["label"] == "negative":
                    score = int(d["score"] * 100)
                    break
            out.append(score)
        return out

    return scorer


#: per-worker-process classifier cache — a closure-level dict would be
#: re-created each time the serialized closure deserializes (per task);
#: a module-level cache survives for the worker process lifetime
_CLASSIFIER_CACHE: dict = {}


def _load_classifier(model_name: str):
    """Lazy per-process singleton for the text-classification pipeline
    (runs executor-side inside the scorer closure)."""
    pipe = _CLASSIFIER_CACHE.get(model_name)
    if pipe is None:
        from transformers import pipeline

        pipe = pipeline(
            "text-classification", model=model_name, return_all_scores=True
        )
        _CLASSIFIER_CACHE[model_name] = pipe
    return pipe
