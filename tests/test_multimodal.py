from __future__ import annotations

import hashlib
import struct

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
        mm.resize_image(assets, "payload", "asset_id", 8, 8)


def _animated_gif(n_frames, w=2, h=2, delay_cs=5):
    """Minimal spec-valid animated GIF: header + 2-color global palette +
    per frame a graphics control extension and an image block with fake
    (never decoded) LZW sub-blocks."""
    out = b"GIF89a" + struct.pack("<HH", w, h) + b"\x80\x00\x00"  # GCT flag, size 0
    out += b"\x00\x00\x00\xff\xff\xff"  # 2-color global color table
    for i in range(n_frames):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"  # descriptor
        out += b"\x02" + bytes([3, i, 0x51, 0x00]) + b"\x00"  # lzw min + sub-block
    return out + b"\x3b"


def test_frame_sample_gif(spark):
    df = spark.createDataFrame(
        [(1, _animated_gif(5)), (2, _animated_gif(1)), (3, b"not a gif"),
         (4, None)],
        "asset_id long, payload binary",
    )
    out = mm.frame_sample(df, "payload", "asset_id", every_n=2).collect()
    got = sorted((r.asset_id, r.frame_idx) for r in out)
    # 5 frames sampled every 2nd -> 0,2,4; single frame -> 0; non-gif/null -> none
    assert got == [(1, 0), (1, 2), (1, 4), (2, 0)]
    # each sampled payload is itself a standalone single-frame GIF
    for r in out:
        frame = bytes(r.frame)
        assert frame[:6] == b"GIF89a" and frame[-1:] == b"\x3b"
        walked = mm._gif_block_walk(frame)
        assert walked is not None and len(walked[1]) == 1


def test_decode_video_gif_info(spark):
    df = spark.createDataFrame(
        [(1, _animated_gif(4, delay_cs=10)), (2, b"\x00\x01")],
        "asset_id long, payload binary",
    )
    got = {r.asset_id: (r.n_frames, r.duration_ms)
           for r in mm.decode_video(df, "payload", "asset_id").collect()}
    assert got[1] == (4, 400)  # 4 frames x 100 ms
    assert got[2] == (None, None)


# -- header-based decoders (dependency-free, public format specs) ------------

def _png(w, h):
    ihdr = struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
    return b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _bmp(w, h, topdown=False):
    return (b"BM" + b"\x00" * 16
            + struct.pack("<ii", w, -h if topdown else h) + b"\x00" * 8)


def _jpeg(w, h):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _wav(rate=44100, channels=2, seconds=2, bits=16):
    byte_rate = rate * channels * bits // 8
    data = b"\x00" * (byte_rate * seconds)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate,
                      channels * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_detect_format_column_expr(spark):
    payloads = [(1, _png(2, 3)), (2, _jpeg(4, 5)), (3, _gif(6, 7)),
                (4, _bmp(8, 9)), (5, _wav()), (6, b"garbage!!")]
    df = spark.createDataFrame(payloads, "id long, payload binary")
    got = dict(rows(df.select("id", mm.detect_format("payload").alias("f"))))
    assert got == {1: "png", 2: "jpeg", 3: "gif", 4: "bmp", 5: "wav", 6: "unknown"}


def test_decode_image_header_parsers(spark):
    df = spark.createDataFrame(
        [(1, _png(640, 480)), (2, _jpeg(1920, 1080)), (3, _gif(16, 8)),
         (4, _bmp(32, 64, topdown=True)), (5, b"\x89PNG truncated"),
         (6, b"not an image")],
        "asset_id long, payload binary")
    out = {r.asset_id: (r.format, r.width, r.height)
           for r in mm.decode_image(df, "payload", "asset_id").collect()}
    assert out[1] == ("png", 640, 480)
    assert out[2] == ("jpeg", 1920, 1080)
    assert out[3] == ("gif", 16, 8)
    assert out[4] == ("bmp", 32, 64)  # top-down height normalized
    assert out[5] == (None, None, None)  # corrupt -> nulls, no task failure
    assert out[6] == (None, None, None)


def test_decode_audio_wav(spark):
    df = spark.createDataFrame(
        [(1, _wav(rate=8000, channels=1, seconds=3)), (2, b"RIFFxxxx????"),
         (3, _png(2, 2))],
        "asset_id long, payload binary")
    out = {r.asset_id: (r.sample_rate, r.n_channels, r.duration_ms)
           for r in mm.decode_audio(df, "payload", "asset_id").collect()}
    assert out[1] == (8000, 1, 3000)
    assert out[2] == (None, None, None)
    assert out[3] == (None, None, None)


def test_attach_metadata_sniffs_format(spark):
    df = spark.createDataFrame([(1, _gif(2, 2)), (2, b"??")],
                               "id long, payload binary")
    got = {r.id: r.payload_meta.format
           for r in mm.attach_metadata(df, "payload").collect()}
    assert got == {1: "gif", 2: "unknown"}


def test_wav_signal_stats(spark):
    import math
    import struct as st

    import numpy as np

    from kafi_spark.functions.multimodal import audio_signal_features

    def wav_bytes(samples):
        pcm = np.asarray(samples)
        data = (np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes()
        fmt = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        riff = (b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
                + b"data" + st.pack("<I", len(data)) + data)
        return b"RIFF" + st.pack("<I", len(riff)) + riff

    t = np.linspace(0, 1, 8000, endpoint=False)
    sine = 0.5 * np.sin(2 * math.pi * 440 * t)       # rms ≈ 0.3536
    silent = np.zeros(8000)
    half = np.concatenate([0.5 * np.sin(2 * math.pi * 440 * t[:4000]),
                           np.zeros(4000)])
    df = spark.createDataFrame(
        [(1, wav_bytes(sine)), (2, wav_bytes(silent)), (3, wav_bytes(half)),
         (4, b"not audio at all")],
        "doc_id long, payload binary")
    got = {r.doc_id: r for r in
           audio_signal_features(df, "payload", "doc_id").collect()}
    assert got[1].rms == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)
    assert got[1].peak == pytest.approx(0.5, rel=1e-3)
    assert got[1].silence_frac < 0.05
    assert got[2].rms == pytest.approx(0.0, abs=1e-9)
    assert got[2].silence_frac == pytest.approx(1.0)
    assert got[3].silence_frac == pytest.approx(0.5, abs=0.05)
    assert got[4].rms is None and got[4].peak is None


def _bmp_bytes(px):
    """Minimal bottom-up 24-bit BMP from an (h, w, 3) RGB uint8 array."""
    import struct as st

    import numpy as np

    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    body = b""
    for row in px[::-1]:                       # bottom-up storage
        body += row[:, ::-1].astype(np.uint8).tobytes() + b"\x00" * pad
    header = (b"BM" + st.pack("<IHHI", 54 + len(body), 0, 0, 54)
              + st.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                        2835, 2835, 0, 0))
    return header + body


def test_image_dhash_perceptual_similarity(spark):
    import numpy as np

    from kafi_spark.functions.multimodal import image_perceptual_hash

    rng = np.random.RandomState(5)
    base = rng.randint(0, 256, size=(32, 48, 3), dtype=np.uint8)
    near = base.copy().astype(np.int16)
    near[:4, :4] += 12                          # small local edit
    near = np.clip(near, 0, 255).astype(np.uint8)
    far = rng.randint(0, 256, size=(32, 48, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, _bmp_bytes(base)), (2, _bmp_bytes(near)), (3, _bmp_bytes(far)),
         (4, b"\x89PNG\r\n\x1a\nnotdecodable")],
        "doc_id long, payload binary")
    got = {r.doc_id: r.dhash
           for r in image_perceptual_hash(df, "payload", "doc_id").collect()}
    assert got[4] is None                       # compressed format -> null
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(got[1], got[2]) <= 6             # near-identical images
    assert ham(got[1], got[3]) > 16             # unrelated images
    # deterministic
    again = {r.doc_id: r.dhash
             for r in image_perceptual_hash(df, "payload", "doc_id").collect()}
    assert again == got


def test_image_dhash_resolution_robustness(spark):
    """dHash should survive RESCALING (the hash works on an 8x9 area
    average): the same image at 2x resolution lands within a small
    Hamming distance (integer grid-boundary truncation shifts cell
    borders slightly, so exact equality is not the contract)."""
    import numpy as np

    from kafi_spark.functions.multimodal import image_perceptual_hash

    rng = np.random.RandomState(9)
    small = rng.randint(0, 256, size=(16, 24, 3), dtype=np.uint8)
    big = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)
    df = spark.createDataFrame(
        [(1, _bmp_bytes(small)), (2, _bmp_bytes(big))],
        "doc_id long, payload binary")
    got = {r.doc_id: r.dhash
           for r in image_perceptual_hash(df, "payload", "doc_id").collect()}
    d = bin((got[1] ^ got[2]) & ((1 << 64) - 1)).count("1")
    assert d <= 4


def test_image_neardup_via_hamming_pairs(spark):
    """End-to-end image near-dup: perceptual dHash + the generic
    Hamming banding — near-identical BMPs pair up, unrelated ones and
    undecodable payloads don't."""
    import numpy as np

    from kafi_spark.functions.dedup import hamming_pairs
    from kafi_spark.functions.multimodal import image_perceptual_hash

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, size=(32, 48, 3), dtype=np.uint8)
    near = np.clip(base.astype(np.int16) + 3, 0, 255).astype(np.uint8)
    far = rng.randint(0, 256, size=(32, 48, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, _bmp_bytes(base)), (2, _bmp_bytes(near)), (3, _bmp_bytes(far)),
         (4, b"junk")],
        "doc_id long, payload binary")
    sigs = image_perceptual_hash(df, "payload", "doc_id")
    pairs = {(r.id_1, r.id_2)
             for r in hamming_pairs(sigs, "doc_id", "dhash",
                                    max_hamming=6).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p and 4 not in p for p in pairs)


def test_binary_features_null_payload_yields_null_fields(spark):
    """Round-6 review: the default extractor crashed on NULL payloads,
    against the module's no-task-failure contract."""
    from kafi_spark.functions.multimodal import binary_features

    df = spark.createDataFrame(
        [(1, b"abc"), (2, None)], "doc_id long, payload binary")
    got = {r["doc_id"]: (r["n_bytes"], r["sha_hex"])
           for r in binary_features(df, "payload", "doc_id").collect()}
    assert got[1][0] == 3 and got[1][1] is not None
    assert got[2] == (None, None)


def test_detect_format_mp3_sync_variants_and_jpeg_fill_bytes(spark):
    """Round-8 review: only the \xff\xfb sync word matched, so
    MPEG2/2.5 layer-3 and CRC'd MPEG1 files classified 'unknown'; and
    the JPEG dim walk aborted on legal 0xFF fill bytes (ITU T.81
    B.1.1.2), nulling the dims of valid padded files."""
    payloads = [(i, b"\xff" + bytes([b2]) + b"\x90\x44" * 8)
                for i, b2 in enumerate((0xFB, 0xFA, 0xF3, 0xF2, 0xE3, 0xE2))]
    payloads.append((6, b"\xff\xc0junk"))   # sync bits NOT all set
    df = spark.createDataFrame(payloads, "id long, payload binary")
    got = dict(rows(df.select("id", mm.detect_format("payload").alias("f"))))
    assert got == {i: "mp3" for i in range(6)} | {6: "unknown"}

    # fill-byte padded JPEG: 0xFF between segments is legal padding
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 33, 44) + b"\x01\x11\x00")
    padded = b"\xff\xd8" + b"\xff" + app0 + b"\xff\xff" + sof0 + b"\xff\xd9"
    dims = mm.image_dims(padded)
    assert (dims["width"], dims["height"]) == (44, 33)


def test_frame_sample_validates_every_n(spark):
    df = spark.createDataFrame([(1, b"GIF89a")], "id long, v binary")
    for bad in (0, -1):
        with pytest.raises(ValueError, match="every_n"):
            mm.frame_sample(df, "v", "id", every_n=bad)
