"""Multimodal column plumbing (north-star op, BASELINE.json).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, processed by Arrow-batched ``mapInPandas``
pipelines — the canonical Spark pattern for media feature extraction:

    media table (id, payload binary, meta struct)
      -> mapInPandas(decode_and_extract, schema)   # per-batch Python
      -> typed feature columns (JVM side again)

Decoder status: binary PPM (P6) decode and nearest-neighbor resize are
REAL — numpy-only, fully functional in this container (``decode_ppm``,
``ppm_decoder``, ``resize_ppm``). Codec-library formats (JPEG/PNG,
audio, video) need PIL/librosa/ffmpeg, absent here, so ``decode_image``
raises NotImplementedError behind a clearly-marked gate and
``fake_decode_features`` provides a deterministic stand-in; the
``pil_decoder`` adapter + contract test prove a codec decoder drops
into the same seam without touching the Spark plumbing.

Scale notes: payloads never pass through Python row-by-row; Arrow moves
columnar batches. ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds batch memory (media payloads are big — set it low, e.g. 64, in
a real deployment). Feature extraction is embarrassingly parallel; no
shuffle until the downstream aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = (
    "media_id LONG, kind STRING, n_bytes INT, checksum LONG, "
    "width INT, height INT, duration_s DOUBLE"
)

_HAVE_REAL_DECODERS = False  # PIL / librosa / ffmpeg not in this container


def decode_image(payload: bytes) -> dict:
    """Real decoder gate. Replace the body when PIL is available."""
    if not _HAVE_REAL_DECODERS:
        raise NotImplementedError(
            "image decoding requires PIL/pillow, not present in this "
            "environment; use fake_decode_features for plumbing tests"
        )


def _ppm_header(payload: bytes) -> tuple[list[bytes], int]:
    """Parse a PPM header: 4 whitespace-separated tokens (magic, width,
    height, maxval) with '#' comments to end-of-line, followed by
    EXACTLY one whitespace byte before pixel data (the Netpbm spec).
    Returns (tokens, pixel_data_offset)."""
    n = len(payload)
    pos = 0
    tokens: list[bytes] = []
    ws = b" \t\r\n"
    while len(tokens) < 4:
        while pos < n and payload[pos] in ws:
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos] not in b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and payload[pos] not in ws:
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(payload[start:pos])
    return tokens, pos + 1  # single whitespace separator


def decode_ppm(payload: bytes):
    """REAL image decode for binary PPM (P6, 8-bit): returns
    (width, height, uint8 ndarray of shape (h, w, 3)). PPM is the one
    raster format decodable with numpy alone — no codec library — so
    this path is fully functional in this container; PIL remains the
    seam for compressed formats (pil_decoder)."""
    import numpy as np

    tokens, off = _ppm_header(payload)
    if tokens[0] != b"P6":
        raise ValueError(f"not a binary PPM (magic {tokens[0]!r})")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    need = 3 * w * h
    if len(payload) - off < need:
        raise ValueError("truncated PPM pixel data")
    arr = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return w, h, arr.reshape(h, w, 3)


def ppm_decoder(payload: bytes, kind: str) -> dict:
    """Decoder-contract implementation backed by the REAL PPM parser:
    width/height from the header, checksum = exact pixel-byte sum.
    Drop-in for ``extract_media_features(..., decoder=ppm_decoder)``."""
    w, h, arr = decode_ppm(bytes(payload))
    return {
        "n_bytes": len(payload),
        "checksum": int(arr.sum(dtype="int64")),
        "width": w,
        "height": h,
        "duration_s": None,
    }


def resize_ppm(payload: bytes, target_width: int, target_height: int) -> bytes:
    """REAL nearest-neighbor resize of a P6 payload via numpy index
    selection; returns a valid P6 payload at the target dimensions."""
    import numpy as np

    w, h, arr = decode_ppm(bytes(payload))
    rows = (np.arange(target_height) * h) // target_height
    cols = (np.arange(target_width) * w) // target_width
    out = arr[rows][:, cols]
    header = f"P6\n{target_width} {target_height}\n255\n".encode()
    return header + out.tobytes()


def decode_wav(payload: bytes):
    """REAL audio decode for RIFF/WAVE 8-bit mono PCM: walks the chunk
    list (fmt / data, skipping unknown chunks with the odd-size pad
    rule), validates the format words, and returns (sample_rate,
    uint8 sample ndarray). Like PPM, WAV is decodable with numpy +
    struct alone — no codec library."""
    import struct

    import numpy as np

    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid in (b"fmt ", b"data") and len(body) != size:
            # a truncated chunk would otherwise be silently sliced
            # short -> wrong checksum/duration (decode_ppm's truncated-
            # pixel check is the precedent: corrupt input must raise)
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, sample_rate = struct.unpack("<HHI", fmt[0:8])
    (bits,) = struct.unpack("<H", fmt[14:16])
    if audio_fmt != 1 or channels != 1 or bits != 8:
        raise ValueError("only 8-bit mono PCM supported")
    return sample_rate, np.frombuffer(data, dtype=np.uint8)


def wav_decoder(payload: bytes, kind: str) -> dict:
    """Decoder-contract implementation backed by the REAL WAV parser:
    duration from the sample count and rate, checksum = exact sample
    byte sum."""
    sr, samples = decode_wav(bytes(payload))
    return {
        "n_bytes": len(payload),
        "checksum": int(samples.sum(dtype="int64")),
        "width": None,
        "height": None,
        "duration_s": len(samples) / sr,
    }


def sniff_decoder(payload: bytes, kind: str) -> dict:
    """Production-shaped dispatch: route each payload to the right REAL
    decoder by its magic bytes (P6 -> PPM image, RIFF -> WAV audio) —
    one mapInPandas stage handles a mixed-modality media table. Codec
    formats raise through the decode_image gate."""
    head = bytes(payload[:4])
    if head[:2] == b"P6":
        return ppm_decoder(payload, kind)
    if head == b"RIFF":
        return wav_decoder(payload, kind)
    return decode_image(bytes(payload))


def pil_decoder(pil_image_module):
    """Adapter from a PIL-shaped module (``Image.open(BytesIO).size``)
    to the decoder contract ``(payload, kind) -> feature dict``. This is
    the production seam: ``extract_media_features(media,
    decoder=pil_decoder(PIL.Image))`` when the environment has codecs.
    The adapter is what the contract test injects (with a stub module),
    proving a real decoder drops in without touching the Spark plumbing.
    """
    import io

    def decode(payload: bytes, kind: str) -> dict:
        img = pil_image_module.open(io.BytesIO(payload))
        w, h = img.size
        return {
            "n_bytes": len(payload),
            "checksum": 0,
            "width": w if kind == "image" else None,
            "height": h if kind == "image" else None,
            "duration_s": None,
        }

    return decode


def fake_decode_features(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for decode+feature-extract: derives
    pseudo width/height/duration from a byte checksum. Same signature
    and output schema as a real decoder would produce."""
    checksum = 0
    for b in payload:
        checksum = (checksum * 131 + b) % 1_000_000_007
    return {
        "n_bytes": len(payload),
        "checksum": checksum,
        "width": 16 + checksum % 1024 if kind == "image" else None,
        "height": 16 + (checksum // 7) % 1024 if kind == "image" else None,
        "duration_s": round((checksum % 36000) / 100.0, 2) if kind in ("audio", "video") else None,
    }


def extract_media_features(media: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas pipeline over (media_id, kind, payload) -> features.

    The per-batch function works on pandas DataFrames (Arrow transfer);
    output conforms to MEDIA_FEATURES_SCHEMA so downstream stays typed
    and JVM-side.

    ``decoder`` is the swappable seam: any picklable
    ``(payload, kind) -> dict`` with keys n_bytes/checksum/width/
    height/duration_s (see ``pil_decoder`` for the PIL adapter).
    Defaults to the deterministic ``fake_decode_features`` stand-in.
    """
    decode = decoder or fake_decode_features

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                    "width": pd.array([f["width"] for f in feats], dtype="Int32"),
                    "height": pd.array([f["height"] for f in feats], dtype="Int32"),
                    "duration_s": pd.array(
                        [f["duration_s"] for f in feats], dtype="float64"
                    ),
                }
            )
            yield out

    return media.mapInPandas(process, MEDIA_FEATURES_SCHEMA)


def documents_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Test fixture builder: wraps document text bytes as fake media
    payloads (deterministic), preserving the real media-table shape."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


RESIZED_SCHEMA = (
    "media_id LONG, kind STRING, width INT, height INT, payload BINARY"
)


def resize_images(
    media: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    resizer=None,
) -> DataFrame:
    """Image resize as a mapInPandas stage: (media_id, kind, payload) ->
    resized payload + new dims. ``resizer`` is the swappable pixel seam
    ``(payload, tw, th) -> bytes`` — pass ``resize_ppm`` for the REAL
    numpy nearest-neighbor path on P6 payloads (works in this
    container), or a PIL `Image.resize` adapter for compressed formats.
    Defaults to a deterministic fake (payload truncated/padded to a
    size proportional to the target area) so plumbing tests need no
    decodable payloads. Output stays a binary column so further stages
    chain.
    """
    fake_len = max(16, (target_width * target_height) // 64)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resizer is not None:
                resized = [
                    resizer(bytes(p), target_width, target_height)
                    for p in pdf["payload"]
                ]
            else:
                resized = [
                    bytes(p[:fake_len]).ljust(fake_len, b"\0")
                    for p in pdf["payload"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "width": pd.array([target_width] * len(pdf), dtype="Int32"),
                    "height": pd.array([target_height] * len(pdf), dtype="Int32"),
                    "payload": resized,
                }
            )

    return media.mapInPandas(process, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset.

    The frame OFFSETS and fan-out are pure DataFrame plumbing (explode
    of an offset sequence — J3, JVM-side); only the frame decode would
    touch Python, and it is stubbed to a deterministic byte-slice here
    (a real body runs ffmpeg/PyAV inside a mapInPandas over this
    exploded frame table). Duration comes from the feature extractor.
    """
    feats = extract_media_features(media).where(F.col("kind") == "video")
    with_offsets = feats.join(
        media.select("media_id", "payload"), "media_id"
    ).select(
        "media_id",
        "duration_s",
        "payload",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_frames - 1)),
                lambda i: F.round(
                    i * F.col("duration_s") / F.lit(n_frames), 2
                ),
            )
        ).alias("frame_ts"),
    )
    # stubbed per-frame decode: a deterministic 32-byte slice keyed by
    # the frame timestamp (real impl: mapInPandas seek+decode here)
    return with_offsets.select(
        "media_id",
        "frame_ts",
        F.substring(
            "payload",
            F.lit(1) + (F.col("frame_ts") * 10).cast("int") % 32,
            32,
        ).alias("frame_bytes"),
    )
