"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference stores images as content-addressed binary blobs on NFS
with a hash->text OCR side table (consumer/consumer.py:82-89,
ocr/ocr.py:98-124). At engine level that pattern is: a ``binary``
column + deterministic content hash + a ``mapInPandas`` feature
extractor. The *decode* step (real image/audio libs) is STUBBED —
not available in this container — but the Spark-side plumbing
(schema, Arrow batch shape, partitioning, content addressing) is real
and tested.

``extract_media_features`` dispatches per kind:
- ``kind="fake"`` — deterministic pseudo-decoder (byte stats standing
  in for width/height/duration), used by tests and the driver query;
- any real kind (``image``, ``audio``, ``video``) raises
  ``NotImplementedError`` with the library it would need.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURE_SCHEMA = (
    "media_hash string, n_bytes long, width int, height int, channels int"
)


def content_hash(data_col, kb_col) -> "F.Column":
    """Reference image content hash: sha256(hex(bytes) + str(kb))."""
    return F.sha2(F.concat(F.lower(F.hex(data_col)), kb_col.cast("string")), 256)


def _fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: dims derived from
    content bytes, so tests are stable and SQL-reproducible."""
    n = len(blob)
    width = 64 + (n % 512)
    height = 64 + ((n * 7) % 512)
    return width, height, 3


def extract_media_features(media: DataFrame, kind: str = "fake") -> DataFrame:
    """binary payloads -> typed feature rows via Arrow-batched mapInPandas.

    Input schema: (media_hash string, payload binary). Runs
    per-partition over Arrow batches — the shape a real decoder
    (PIL/ffmpeg/torchaudio) drops into without plan changes.
    """
    if kind not in ("fake",):
        raise NotImplementedError(
            f"decoder for kind={kind!r} needs an image/audio library not present "
            "in this environment; plug it into _fake_decode's slot"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["payload"].map(bytes)
            dims = blobs.map(_fake_decode)
            yield pd.DataFrame(
                {
                    "media_hash": pdf["media_hash"],
                    "n_bytes": blobs.map(len),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "channels": dims.map(lambda d: d[2]),
                }
            )

    return media.mapInPandas(op, schema=MEDIA_FEATURE_SCHEMA)


def media_features(spark, sf_dir: str) -> DataFrame:
    """Driver query: treat each document's utf-8 bytes as an opaque
    payload, content-address it, extract (stubbed) features."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.sha2(F.col("text"), 256).alias("media_hash"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return extract_media_features(media, kind="fake").orderBy("media_hash")


MEDIA_FEATURES_SQL = """
SELECT sha256(text) AS media_hash,
       octet_length(encode(text)) AS n_bytes,
       (64 + octet_length(encode(text)) % 512)::INT AS width,
       (64 + (octet_length(encode(text)) * 7) % 512)::INT AS height,
       3::INT AS channels
FROM documents ORDER BY media_hash
"""

QUERIES = {
    "media_features": (media_features, MEDIA_FEATURES_SQL),
}
