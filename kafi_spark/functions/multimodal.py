"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Design: a multimodal asset is a ``binary`` payload column + a typed
metadata struct (format, n_bytes, dims/duration when known). All heavy
per-asset work (decode, resize, frame-sample, feature-extract) runs as
Arrow-batched ``mapInPandas`` stages — partition-parallel, no driver
involvement, batch-shaped for vectorized decoders.

The decode step itself is STUBBED in this environment (no image/audio
libraries in the container): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless the optional library import succeeds, while
``binary_features`` demonstrates the full real plumbing (schema contract,
Arrow binary transfer, batched Python compute) with a deterministic
extractor (byte length + sha256) that any SQL engine can verify.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

try:  # optional: real decoders if ever present
    import PIL.Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except Exception:  # noqa: BLE001
    _HAVE_PIL = False


def attach_metadata(df: DataFrame, binary_col: str, fmt: str = "unknown") -> DataFrame:
    """Add the typed metadata struct for an opaque binary column."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(fmt).alias("format"),
            F.octet_length(F.col(binary_col)).cast("long").alias("n_bytes"),
        ),
    )


def binary_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    extractor: Callable[[bytes], dict] | None = None,
    feature_schema: str = "n_bytes long, sha_hex string",
) -> DataFrame:
    """Per-asset feature extraction through the real distributed path:
    Arrow-batched mapInPandas over (id, binary) partitions.

    Default extractor is deterministic (length + sha256) so the plumbing is
    testable without media libraries; swap in a real decoder with the same
    signature for images/audio (batch shape and schema contract unchanged).
    """
    extractor = extractor or (
        lambda b: {"n_bytes": len(b), "sha_hex": hashlib.sha256(b).hexdigest()}
    )
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, {feature_schema}"

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [extractor(b) for b in pdf[binary_col]]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, binary_col).mapInPandas(op, out_schema)


def decode_image(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Decode images to (width, height, mode). Requires an image library —
    STUB in this environment (the Spark plumbing is ``binary_features``
    with a PIL-based extractor)."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL/pillow (not in this container); "
            "the distributed plumbing is binary_features(), which this "
            "function wraps with a real decoder when available"
        )
    import io

    def extract(b: bytes) -> dict:
        img = PIL.Image.open(io.BytesIO(b))
        return {"width": img.width, "height": img.height, "mode": img.mode}

    return binary_features(df, binary_col, id_col, extract, "width long, height long, mode string")


def decode_audio(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Decode audio to (sample_rate, n_channels, duration_ms) — STUB (no
    audio library in this container); the distributed plumbing is
    ``binary_features`` with a soundfile/librosa-based extractor."""
    raise NotImplementedError(
        "audio decoding requires an audio library (not in this container); "
        "contract: binary_features(df, binary_col, id_col, decoder, "
        "'sample_rate long, n_channels long, duration_ms long')"
    )


def resize_image(
    df: DataFrame, binary_col: str, id_col: str, width: int, height: int
) -> DataFrame:
    """Image resize — STUB unless PIL is present; contract: one output row
    per asset with the re-encoded binary payload (same id), via the same
    Arrow-batched mapInPandas path as :func:`binary_features`."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image resize requires PIL/pillow (not in this container); "
            "contract: mapInPandas emitting (id, resized binary) rows"
        )
    import io

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_bytes = []
            for b in pdf[binary_col]:
                img = PIL.Image.open(io.BytesIO(b)).resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format=img.format or "PNG")
                out_bytes.append(buf.getvalue())
            yield pd.DataFrame({id_col: pdf[id_col].values, binary_col: out_bytes})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, binary_col).mapInPandas(
        op, f"{id_col} {id_type}, {binary_col} binary"
    )


def frame_sample(df: DataFrame, binary_col: str, id_col: str, every_n: int = 10) -> DataFrame:
    """Video frame sampling — STUB (no video lib); contract: one output row
    per sampled frame with a frame_idx column and a binary frame payload."""
    raise NotImplementedError(
        "video decoding not available in this container; contract: "
        "mapInPandas emitting (id, frame_idx long, frame binary) rows"
    )
