"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Design: a multimodal asset is a ``binary`` payload column + a typed
metadata struct (format, n_bytes, dims/duration when known). All heavy
per-asset work (decode, resize, frame-sample, feature-extract) runs as
Arrow-batched ``mapInPandas``/pandas-UDF stages — partition-parallel, no
driver involvement, batch-shaped for vectorized decoders.

No media libraries ship in this container, but the curation-relevant
subset of "decode" doesn't need them: container formats put their
metadata in fixed headers. ``detect_format`` sniffs magic bytes as pure
Column expressions (JVM-side, zero Python), ``decode_image`` reads
dimensions from PNG/GIF/BMP headers and the JPEG SOF segment walk,
``decode_audio`` parses WAV RIFF chunks for sample rate / channels /
duration, and ``frame_sample``/``decode_video`` walk the GIF block
structure to split animated GIFs into standalone per-frame payloads —
all against the public format specs, no pixel/LZW decode. Full
pixel/sample decoding and codec-video (mp4/webm) frame extraction
genuinely need codecs: ``resize_image`` gates on PIL and codec
containers degrade to zero frame rows. Malformed payloads yield null
fields (or no rows), not task failures — at 10^9 assets some WILL be
corrupt.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

try:  # optional: real pixel codecs if ever present (resize path)
    import PIL.Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except Exception:  # noqa: BLE001
    _HAVE_PIL = False


def detect_format(col: Column | str) -> Column:
    """Container format from magic bytes, as a pure Column expression —
    whole-stage-codegen'd prefix compares, no Python crossing. Covers the
    formats a curation pipeline meets: png/jpeg/gif/bmp/webp/wav/mp3/mp4.
    """
    c = F.col(col) if isinstance(col, str) else col
    pre = lambda off, n: F.substring(c, off, n)  # noqa: E731  1-based
    return (
        F.when(pre(1, 8) == F.lit(b"\x89PNG\r\n\x1a\n"), "png")
        .when(pre(1, 3) == F.lit(b"\xff\xd8\xff"), "jpeg")
        .when((pre(1, 6) == F.lit(b"GIF87a")) | (pre(1, 6) == F.lit(b"GIF89a")), "gif")
        .when((pre(1, 4) == F.lit(b"RIFF")) & (pre(9, 4) == F.lit(b"WAVE")), "wav")
        .when((pre(1, 4) == F.lit(b"RIFF")) & (pre(9, 4) == F.lit(b"WEBP")), "webp")
        .when(pre(1, 2) == F.lit(b"BM"), "bmp")
        # mp3 without an ID3 tag starts at an MPEG audio frame sync:
        # 0xFF then a byte whose top 3 bits are set; Layer III across
        # MPEG1/2/2.5 with/without CRC gives these six second bytes
        # (round-8 review: matching only \xff\xfb mislabeled
        # MPEG2/2.5 speech-rate files and CRC'd streams 'unknown')
        .when(
            (pre(1, 3) == F.lit(b"ID3"))
            | (
                (pre(1, 1) == F.lit(b"\xff"))
                & pre(2, 1).isin(
                    [bytes([x]) for x in (0xFB, 0xFA, 0xF3, 0xF2, 0xE3, 0xE2)]
                )
            ),
            "mp3",
        )
        .when(pre(5, 4) == F.lit(b"ftyp"), "mp4")
        .otherwise("unknown")
    )


def attach_metadata(df: DataFrame, binary_col: str, fmt: str | None = None) -> DataFrame:
    """Add the typed metadata struct for an opaque binary column; format
    is sniffed from magic bytes unless pinned by the caller."""
    fmt_col = F.lit(fmt) if fmt is not None else detect_format(binary_col)
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            fmt_col.alias("format"),
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
        # None-safe like every custom extractor in this module: a null
        # payload yields null fields, never a task failure
        lambda b: {"n_bytes": None, "sha_hex": None} if b is None else
        {"n_bytes": len(b), "sha_hex": hashlib.sha256(b).hexdigest()}
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


#: JPEG start-of-frame markers carrying dimensions (baseline, progressive,
#: lossless, arithmetic variants — the public marker table)
_JPEG_SOF = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def image_dims(b: bytes) -> dict:
    """(format, width, height) from container headers: PNG IHDR, GIF
    logical screen descriptor, BMP info header, JPEG SOFn segment walk.
    Unknown/corrupt input -> null fields (never raises)."""
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            w, h = struct.unpack(">II", b[16:24])
            return {"format": "png", "width": w, "height": h}
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return {"format": "gif", "width": w, "height": h}
        if b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return {"format": "bmp", "width": w, "height": abs(h)}  # h<0 = top-down rows
        if b[:3] == b"\xff\xd8\xff":
            i = 2
            while i + 9 <= len(b) and b[i] == 0xFF:
                if b[i + 1] == 0xFF:
                    # ITU T.81 B.1.1.2: any number of 0xFF FILL bytes may
                    # precede a marker; treating one as a length-bearing
                    # segment jumped to garbage and nulled the dims of
                    # valid padded JPEGs (round-8 review)
                    i += 1
                    continue
                marker = b[i + 1]
                if marker in _JPEG_SOF:
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    return {"format": "jpeg", "width": w, "height": h}
                if 0xD0 <= marker <= 0xD9:  # standalone RSTn/SOI/EOI
                    i += 2
                    continue
                i += 2 + struct.unpack(">H", b[i + 2:i + 4])[0]
            return {"format": "jpeg", "width": None, "height": None}
    except Exception:  # noqa: BLE001 — corrupt header
        pass
    return {"format": None, "width": None, "height": None}


def _riff_chunks(b: bytes):
    """THE RIFF/WAVE chunk walker (word-aligned sizes, public spec):
    yields ``(chunk_id, size, payload_offset)``. One definition —
    :func:`wav_info` and :func:`wav_signal_stats` used to carry
    verbatim copies of this loop, so a walker fix (corrupt size guard,
    WAVE_FORMAT_EXTENSIBLE) had to land twice or the two WAV parsers
    silently disagreed on the same payload (round-8 review). Yields
    nothing for non-WAV payloads."""
    if not (b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
        return
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        yield cid, size, i + 8
        i += 8 + size + (size & 1)  # chunks are word-aligned


def wav_info(b: bytes) -> dict:
    """(sample_rate, n_channels, duration_ms) from the WAV RIFF chunk
    list (fmt + data chunks, public WAVE spec). Non-WAV/corrupt -> nulls."""
    out = {"sample_rate": None, "n_channels": None, "duration_ms": None}
    try:
        byte_rate, data_size = None, None
        for cid, size, off in _riff_chunks(b):
            if cid == b"fmt " and size >= 16:
                n_ch, rate, brate = struct.unpack("<HII", b[off + 2:off + 12])
                out["n_channels"], out["sample_rate"] = n_ch, rate
                byte_rate = brate or None
            elif cid == b"data":
                data_size = size
        if byte_rate and data_size is not None:
            out["duration_ms"] = data_size * 1000 // byte_rate
    except Exception:  # noqa: BLE001
        pass
    return out


def decode_image(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Image metadata decode — real, dependency-free: dimensions parsed
    from PNG/GIF/BMP/JPEG headers executor-side through the
    ``binary_features`` Arrow path. Pixel data stays untouched (that's
    ``resize_image``'s codec-gated job)."""
    return binary_features(
        df, binary_col, id_col, image_dims,
        "format string, width long, height long",
    )


def decode_audio(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Audio metadata decode — real for WAV (RIFF chunk parse); compressed
    codecs (mp3/aac) would need an audio library and surface as nulls."""
    return binary_features(
        df, binary_col, id_col, wav_info,
        "sample_rate long, n_channels long, duration_ms long",
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
            ids, out_bytes = [], []
            for rid, b in zip(pdf[id_col], pdf[binary_col]):
                # module contract: malformed payloads yield no rows,
                # never task failures (round-8 review: a single null or
                # truncated image killed the job via PIL here while
                # every other extractor guarded)
                try:
                    opened = PIL.Image.open(io.BytesIO(b))
                    # capture BEFORE resize: PIL sets .format only in
                    # open(), so the resized copy's is always None —
                    # every JPEG used to come back silently re-encoded
                    # as PNG
                    fmt = opened.format or "PNG"
                    img = opened.resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format=fmt)
                except Exception:  # noqa: BLE001 — corrupt/null payload
                    continue
                ids.append(rid)
                out_bytes.append(buf.getvalue())
            yield pd.DataFrame({id_col: ids, binary_col: out_bytes})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, binary_col).mapInPandas(
        op, f"{id_col} {id_type}, {binary_col} binary"
    )


def _gif_block_walk(b: bytes):
    """Walk a GIF's block structure (public GIF89a spec): returns
    (header_bytes, frames) where header covers signature + logical screen
    descriptor + global color table, and each frame is (gce_bytes,
    image_block_bytes, delay_ms). Pure byte arithmetic — the LZW pixel
    data rides along as opaque sub-blocks, never decoded. Returns None
    for non-GIF/corrupt input."""
    try:
        if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
            return None
        packed = b[10]
        gct = (2 ** ((packed & 7) + 1)) * 3 if packed & 0x80 else 0
        hdr_end = 13 + gct
        header = b[:hdr_end]
        frames = []
        pending_gce, delay = b"", 0
        i = hdr_end
        while i < len(b):
            c = b[i]
            if c == 0x3B:  # trailer
                break
            if c == 0x21:  # extension block
                label = b[i + 1]
                j = i + 2
                while j < len(b) and b[j] != 0:
                    j += 1 + b[j]
                j += 1  # block terminator
                if label == 0xF9 and j - i >= 7:
                    pending_gce = b[i:j]
                    delay = struct.unpack("<H", b[i + 4:i + 6])[0] * 10
                i = j
            elif c == 0x2C:  # image descriptor -> one frame
                j = i + 10
                ipacked = b[i + 9]
                if ipacked & 0x80:
                    j += (2 ** ((ipacked & 7) + 1)) * 3  # local color table
                j += 1  # LZW minimum code size
                while j < len(b) and b[j] != 0:
                    j += 1 + b[j]
                j += 1
                frames.append((pending_gce, b[i:j], delay))
                pending_gce, delay = b"", 0
                i = j
            else:
                return None  # corrupt block stream
        return header, frames
    except Exception:  # noqa: BLE001
        return None


def gif_video_info(b: bytes) -> dict:
    """(n_frames, duration_ms) for animated GIFs via the block walk;
    non-GIF/corrupt -> nulls (codec formats would need a video lib)."""
    walked = _gif_block_walk(bytes(b)) if b is not None else None
    if walked is None:
        return {"n_frames": None, "duration_ms": None}
    _, frames = walked
    return {
        "n_frames": len(frames),
        "duration_ms": sum(d for _, _, d in frames),
    }


def decode_video(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Video metadata decode — real for animated GIF (container block
    walk); codec containers (mp4/webm) surface as nulls without a
    decoder library."""
    return binary_features(
        df, binary_col, id_col, gif_video_info,
        "n_frames long, duration_ms long",
    )


def frame_sample(
    df: DataFrame, binary_col: str, id_col: str, every_n: int = 10
) -> DataFrame:
    """Video frame sampling — REAL for animated GIF, the one video
    container parseable without codec libraries: every ``every_n``-th
    frame is re-wrapped as a standalone single-frame GIF (original
    header + palette + that frame's control extension + image block +
    trailer), so each sampled payload is independently decodable
    downstream. Pixel data is never decoded — pure block arithmetic over
    the public spec, executor-side through the Arrow ``mapInPandas``
    path. Codec containers (mp4/webm) and corrupt payloads emit ZERO
    rows for that asset (documented degradation — a mixed corpus flows;
    a real deployment plugs a decoder into the same batch contract).

    Output: one row per sampled frame — (id, frame_idx long,
    frame binary).

    ``every_n`` must be >= 1 (round-8 review: 0 crashed every executor
    task in range(); a negative silently emitted zero rows for ALL
    assets — indistinguishable from the corrupt-payload degradation).
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    id_type = df.schema[id_col].dataType.simpleString()

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, payloads = [], [], []
            for rid, b in zip(pdf[id_col], pdf[binary_col]):
                walked = _gif_block_walk(bytes(b)) if b is not None else None
                if walked is None:
                    continue
                header, frames = walked
                for k in range(0, len(frames), every_n):
                    gce, img, _ = frames[k]
                    ids.append(rid)
                    idxs.append(k)
                    payloads.append(header + gce + img + b"\x3b")
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": payloads}
            )

    return df.select(id_col, binary_col).mapInPandas(
        op, f"{id_col} {id_type}, frame_idx long, frame binary"
    )


def wav_signal_stats(b: bytes) -> dict:
    """REAL signal statistics from 16-bit PCM WAV payload bytes —
    dependency-free numpy over the data chunk: RMS level (normalized to
    [0,1] of full scale), peak level, and the silent fraction (samples
    under 1% of full scale) — the audio-quality trio a curation
    pipeline filters on (clipped/silent/dead recordings). Non-WAV,
    non-PCM16, or corrupt payloads -> nulls, never task failures."""
    out = {"rms": None, "peak": None, "silence_frac": None}
    try:
        fmt_code, bits, data = None, None, None
        for cid, size, off in _riff_chunks(b):
            if cid == b"fmt " and size >= 16:
                fmt_code = struct.unpack("<H", b[off:off + 2])[0]
                bits = struct.unpack("<H", b[off + 14:off + 16])[0]
            elif cid == b"data":
                data = b[off:off + size]
        if fmt_code != 1 or bits != 16 or not data:
            return out  # only uncompressed PCM16 is decodable here
        x = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(
            np.float64
        ) / 32768.0
        if len(x) == 0:
            return out
        out["rms"] = float(np.sqrt(np.mean(x * x)))
        out["peak"] = float(np.abs(x).max())
        out["silence_frac"] = float((np.abs(x) < 0.01).mean())
    except Exception:  # noqa: BLE001
        pass
    return out


def audio_signal_features(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """PCM WAV signal features through the Arrow ``binary_features``
    path: (rms, peak, silence_frac) per row."""
    return binary_features(
        df, binary_col, id_col, wav_signal_stats,
        "rms double, peak double, silence_frac double",
    )


def _bmp_pixels(b: bytes):
    """(h, w, 3) uint8 array from an uncompressed 24-bit BMP, or None.
    Handles bottom-up (positive height) and top-down rows and the
    4-byte row padding of the format; anything else (compressed,
    paletted, other depths) -> None."""
    try:
        if b[:2] != b"BM" or len(b) < 54:
            return None
        data_off = struct.unpack("<I", b[10:14])[0]
        w, h = struct.unpack("<ii", b[18:26])
        planes, bpp = struct.unpack("<HH", b[26:30])
        compression = struct.unpack("<I", b[30:34])[0]
        if bpp != 24 or compression != 0 or w <= 0 or h == 0:
            return None
        top_down = h < 0
        h = abs(h)
        row_bytes = (w * 3 + 3) & ~3
        need = data_off + row_bytes * h
        if len(b) < need:
            return None
        a = np.frombuffer(b, dtype=np.uint8, count=row_bytes * h, offset=data_off)
        a = a.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            a = a[::-1]
        return a[..., ::-1]  # BGR -> RGB
    except Exception:  # noqa: BLE001
        return None


def image_dhash(b: bytes) -> dict:
    """64-bit difference hash (dHash) from REAL pixels — codec-free for
    uncompressed 24-bit BMP: grayscale, area-average to a 9×8 grid,
    hash = sign of horizontal neighbor differences. Perceptually near-
    identical images differ in few bits, so Hamming banding
    (:func:`kafi_spark.functions.dedup.simhash_pairs`' pigeonhole
    machinery) finds image near-dups exactly like text SimHash.
    Compressed formats (png/jpeg/gif) need a codec → null."""
    px = _bmp_pixels(b)
    if px is None:
        return {"dhash": None}
    g = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = g.shape
    # area-average downsample to 8 rows × 9 cols via split indices
    rows = np.linspace(0, h, 9).astype(int)
    cols = np.linspace(0, w, 10).astype(int)
    grid = np.empty((8, 9))
    for i in range(8):
        for j in range(9):
            cell = g[rows[i]:max(rows[i + 1], rows[i] + 1),
                     cols[j]:max(cols[j + 1], cols[j] + 1)]
            grid[i, j] = cell.mean()
    bits = (grid[:, 1:] > grid[:, :-1]).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    # two's-complement into signed 64-bit (Spark long)
    if v >= 1 << 63:
        v -= 1 << 64
    return {"dhash": v}


def image_perceptual_hash(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Per-row perceptual hash column (``dhash`` long, null for
    undecodable payloads) through the Arrow ``binary_features`` path —
    feed the result to SimHash-style Hamming banding for image
    near-dup detection."""
    return binary_features(df, binary_col, id_col, image_dhash, "dhash long")
