from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kafi_spark.functions import multimodal as mm
from tests.conftest import rows


@pytest.fixture(scope="module")
def assets(spark):
    data = [(1, b"\x89PNG fake"), (2, b"RIFF fake wav"), (3, b"")]
    return spark.createDataFrame(data, "asset_id long, payload binary")


def test_attach_metadata(assets):
    out = mm.attach_metadata(assets, "payload", fmt="png")
    r = {x.asset_id: x.payload_meta for x in out.collect()}
    assert r[1].format == "png" and r[1].n_bytes == 9
    assert r[3].n_bytes == 0


def test_binary_features_default_extractor(assets):
    out = mm.binary_features(assets, "payload", "asset_id")
    r = {x.asset_id: x for x in out.collect()}
    assert r[1].n_bytes == 9
    assert r[1].sha_hex == hashlib.sha256(b"\x89PNG fake").hexdigest()
    assert r[3].sha_hex == hashlib.sha256(b"").hexdigest()


def test_binary_features_custom_extractor(assets):
    out = mm.binary_features(
        assets, "payload", "asset_id",
        extractor=lambda b: {"first_byte": b[0] if b else -1},
        feature_schema="first_byte long",
    )
    got = dict(rows(out))
    assert got[1] == 0x89 and got[3] == -1


def test_binary_features_string_id(spark):
    """Non-long id columns pass through with their own type (the output
    schema is derived from the input, not hardcoded)."""
    df = spark.createDataFrame(
        [("doc-a", b"xy"), ("doc-b", b"z")], "asset_id string, payload binary")
    out = mm.binary_features(df, "payload", "asset_id")
    assert out.schema["asset_id"].dataType.simpleString() == "string"
    r = {x.asset_id: x.n_bytes for x in out.collect()}
    assert r == {"doc-a": 2, "doc-b": 1}


def test_decode_image_stub_raises(assets):
    if mm._HAVE_PIL:
        pytest.skip("PIL present; stub not active")
    with pytest.raises(NotImplementedError):
        mm.decode_image(assets, "payload", "asset_id")


def test_frame_sample_stub_raises(assets):
    with pytest.raises(NotImplementedError):
        mm.frame_sample(assets, "payload", "asset_id")
