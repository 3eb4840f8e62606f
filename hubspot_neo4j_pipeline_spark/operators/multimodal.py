"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
iterators (mapInPandas).

The decode step (image/audio libraries) is STUBBED — the container has
no codec libs — behind ``decode_payload``, which raises
NotImplementedError unless ``fake=True`` (deterministic fake used by
tests and the registered demo query). Everything Spark-side is real:
binary schema, metadata struct, Arrow batch transfer, batch-shaped
feature extraction.
"""

from __future__ import annotations

import hashlib
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


def decode_payload(payload: bytes, mime: str, fake: bool = False) -> bytes:
    """Decode an opaque media payload.

    Real decode requires image/audio codecs not present in this
    container; the Spark plumbing around it (schema, batching,
    partitioning) is real and tested with the deterministic fake.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs unavailable in this environment; pass fake=True "
            "for the deterministic test double"
        )
    return payload  # identity "decode" — deterministic


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


def extract_features(docs: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams record batches through Python once; per-batch
    vectorized work (no per-row Python loops beyond the byte ops that
    a real codec would replace).
    """
    payloads = attach_payload(docs)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [
                decode_payload(p, m, fake=True)
                for p, m in zip(pdf["payload"], pdf["meta"].map(lambda s: s["mime"]))
            ]
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
