"""Unit tests for the REAL media decoders (operators/multimodal.py).

The registered query `multimodal_decode` value-checks the decoders
against a DuckDB oracle end-to-end; these tests pin the parsers on
hand-built payloads (including ones NOT produced by build_media —
comments in PPM headers, extra RIFF chunks) and on corrupt input, so
the decode is demonstrably a parser, not a lookup keyed to the demo
generator.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from hubspot_neo4j_pipeline_spark.operators.multimodal import (
    build_media,
    decode_ppm,
    decode_wav,
    extract_media_features,
)


def _wav(samples, rate=8000, channels=1, extra_chunk=False):
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # e.g. a LIST/INFO chunk a real encoder emits
        chunks += b"LIST" + struct.pack("<I", 4) + b"INFO"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_ppm_hand_built():
    raster = bytes(range(2 * 2 * 3))
    d = decode_ppm(b"P6\n2 2\n255\n" + raster)
    assert (d["width"], d["height"], d["maxval"]) == (2, 2, 255)
    assert d["n_units"] == 12 and d["unit_sum"] == sum(range(12))


def test_decode_ppm_with_comment_and_wide_maxval():
    d = decode_ppm(b"P6\n# made by hand\n1 1\n255\n\x10\x20\x30")
    assert (d["width"], d["height"]) == (1, 1)
    assert d["unit_sum"] == 0x10 + 0x20 + 0x30


@pytest.mark.parametrize(
    "payload",
    [
        b"P5\n1 1\n255\n\x00",  # wrong magic (PGM)
        b"P6\n2 2\n255\n\x00\x00",  # truncated raster
        b"P6\nx y\n255\n",  # non-numeric header
        b"P6\n1 1\n0\n\x00\x00\x00",  # maxval out of range
    ],
)
def test_decode_ppm_rejects_corrupt(payload):
    with pytest.raises(ValueError):
        decode_ppm(payload)


def test_decode_wav_hand_built():
    d = decode_wav(_wav([100, -200, 32767, -32768], rate=8000))
    assert d["sample_rate"] == 8000 and d["channels"] == 1
    assert d["n_units"] == 4
    assert d["unit_sum"] == 100 - 200 + 32767 - 32768


def test_decode_wav_walks_extra_chunks():
    d = decode_wav(_wav([1, 2, 3], rate=44100, extra_chunk=True))
    assert d["sample_rate"] == 44100 and d["n_units"] == 3 and d["unit_sum"] == 6


@pytest.mark.parametrize(
    "payload",
    [
        b"RIFX" + b"\x00" * 40,  # wrong magic
        _wav([1, 2])[:-1],  # RIFF size mismatch (truncated)
        b"RIFF" + struct.pack("<I", 4) + b"WAVE",  # no fmt/data
    ],
)
def test_decode_wav_rejects_corrupt(payload):
    with pytest.raises(ValueError):
        decode_wav(payload)


def test_decode_wav_rejects_non_pcm16():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)  # 8-bit
    body = b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 0)
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError):
        decode_wav(payload)


def test_built_payloads_are_genuine_media(spark, sf_dir):
    """The JVM-built payload bytes must parse with the pure-Python
    decoders outside Spark — i.e. they are real PPM/WAV files."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(6)
    rows = build_media(docs).collect()
    assert rows
    for r in rows:
        b = bytes(r.payload)
        if r.doc_id % 2 == 0:
            d = decode_ppm(b)
            assert d["width"] == r.doc_id % 5 + 2
            assert d["height"] == r.doc_id % 3 + 2
        else:
            d = decode_wav(b)
            assert d["n_units"] == r.doc_id % 32 + 8
            assert d["sample_rate"] == 40


def test_extract_media_features_roundtrip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = extract_media_features(build_media(docs))
    got = {r.doc_id: r for r in feats.collect()}
    assert len(got) == docs.count()
    some_img = next(k for k in got if k % 2 == 0)
    r = got[some_img]
    assert r.width == some_img % 5 + 2 and r.height == some_img % 3 + 2
    assert r.n_units == 3 * r.width * r.height
    assert r.unit_sum == sum(
        (some_img * 7 + i) % 95 + 32 for i in range(r.n_units)
    )
    some_wav = next(k for k in got if k % 2 == 1)
    r = got[some_wav]
    assert r.sample_rate == 40 and r.width is None
    assert r.n_units == some_wav % 32 + 8
    assert r.unit_sum == sum(
        (some_wav * 11 + i * 3) % 95 + 32 for i in range(r.n_units)
    )


def test_media_meta_filter_is_map_side(spark, sf_dir):
    """Filtering on mime before decode keeps the plan a single
    map-only stage — no shuffle, no decode of filtered-out rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    imgs = build_media(docs).where(F.col("mime").startswith("image/"))
    plan = imgs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
