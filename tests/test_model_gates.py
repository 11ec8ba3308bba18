"""Gated model factories — exercise the gate code itself with a fake
``transformers`` module (round-3 VERDICT item 5: the import/validation
logic had never executed under test, only the raise-on-absent path).

Driver-side tests monkeypatch ``sys.modules['transformers']`` and assert
the per-process pipeline caches mount the model ONCE across repeated
calls; the end-to-end test ships the same fake to executors via
``addPyFile`` and runs the real pandas-UDF path through Spark.
"""

from __future__ import annotations

import os
import sys
import types

import pytest

FAKE_TRANSFORMERS_SRC = '''\
"""Fake transformers module for gate tests (deterministic, no weights)."""
CONSTRUCTIONS = []


def pipeline(task, model=None, **kw):
    CONSTRUCTIONS.append((task, model))
    if task == "feature-extraction":
        def pipe(text):
            h = sum(ord(c) for c in (text or "")) % 97
            # transformers shape: [batch][token][hidden]
            return [[[float((h + i) % 7) for i in range(16)]]]
        return pipe
    def clf(text):
        h = sum(ord(c) for c in (text or "")) % 101
        return [[{"label": "negative", "score": h / 100.0},
                 {"label": "positive", "score": 1.0 - h / 100.0}]]
    return clf
'''


@pytest.fixture()
def fake_transformers(monkeypatch, tmp_path):
    """Importable fake transformers, installed driver-side."""
    path = tmp_path / "transformers.py"
    path.write_text(FAKE_TRANSFORMERS_SRC)
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.delitem(sys.modules, "transformers", raising=False)
    import transformers  # noqa: F401 — now resolves to the fake

    yield sys.modules["transformers"]
    # plain pop — monkeypatch.delitem here would REGISTER an undo that
    # restores the fake at teardown, leaking it into later gate tests
    sys.modules.pop("transformers", None)


def test_classifier_cache_mounts_once(fake_transformers):
    from kafi_spark.functions import classify

    classify._CLASSIFIER_CACHE.clear()
    scorer = classify.transformers_scorer("fake-model")
    out1 = scorer(["bad crash", None, ""])
    out2 = scorer(["more text"])
    # negative-probability × 100, falsy text scores 0 without inference
    assert len(out1) == 3 and out1[1] == 0 and out1[2] == 0
    assert all(isinstance(x, int) and 0 <= x <= 100 for x in out1 + out2)
    # the pipeline mounted exactly once across both scorer calls
    assert fake_transformers.CONSTRUCTIONS == [
        ("text-classification", "fake-model")
    ]
    classify._CLASSIFIER_CACHE.clear()


def test_embed_pipeline_cache_mounts_once(fake_transformers):
    from kafi_spark.functions import embed

    embed._PIPELINE_CACHE.clear()
    p1 = embed._load_pipeline("fake-embedder")
    p2 = embed._load_pipeline("fake-embedder")
    assert p1 is p2
    assert fake_transformers.CONSTRUCTIONS == [
        ("feature-extraction", "fake-embedder")
    ]
    vecs = embed._embed_batch(p1, ["hello", None], dim=8)
    assert [len(v) for v in vecs] == [8, 8]
    assert all(isinstance(x, float) for v in vecs for x in v)
    embed._PIPELINE_CACHE.clear()


def test_model_embedder_constructs_udf(spark, fake_transformers):
    from kafi_spark.functions import embed

    udf = embed.model_embedder("fake-embedder", dim=8)
    assert callable(udf)


def test_model_embedder_end_to_end_on_executors(
    spark, fake_transformers, tmp_path
):
    """The full Spark path: chunk → model-backed pandas UDF → vectors,
    with the fake transformers shipped to executors via addPyFile."""
    from pyspark.sql import functions as F

    from kafi_spark.functions import embed

    fake_py = os.path.join(str(tmp_path), "transformers.py")
    pre_path = list(sys.path)
    spark.sparkContext.addPyFile(fake_py)
    embed._PIPELINE_CACHE.clear()

    try:
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "delta"), (3, None)],
            "doc_id int, text string",
        )
        out = embed.embed_chunks(
            df,
            max_tokens=4,
            embedder=embed.model_embedder("fake-embedder", dim=8)(
                F.col("chunk")
            ),
        ).collect()
    finally:
        # addPyFile copies into the SparkFiles root, which local mode
        # puts on the DRIVER's sys.path at session init — delete the
        # copy (and restore sys.path) so the raise-on-absent gate tests
        # still see no transformers
        sys.path[:] = pre_path
        from pyspark import SparkFiles

        copied = os.path.join(SparkFiles.getRootDirectory(),
                              "transformers.py")
        if os.path.exists(copied):
            os.remove(copied)
    by_id = {(r.doc_id, r.chunk_id): r.embedding for r in out}
    assert len(by_id) >= 2  # null text yields no chunks

    def expect(text):
        h = sum(ord(c) for c in text) % 97
        return [float((h + i) % 7) for i in range(8)]

    assert by_id[(1, 0)] == expect("alpha beta gamma")
    assert by_id[(2, 0)] == expect("delta")


def test_gates_raise_without_transformers(monkeypatch):
    """The raise-on-absent direction still holds when the library is
    genuinely missing."""
    monkeypatch.setitem(sys.modules, "transformers", None)
    from kafi_spark.functions import classify, embed

    with pytest.raises(NotImplementedError):
        classify.transformers_scorer("any")
    with pytest.raises(ImportError):
        embed.model_embedder("any", dim=4)
