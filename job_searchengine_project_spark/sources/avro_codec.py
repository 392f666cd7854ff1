"""Avro binary codec for the reference's Kafka ``JobHeader`` record.

The reference's ingestion spine ships crawl headers through Kafka as
Schema-Registry Avro (reference: common/kafka_hook.py:25-94, schema
``schema/kafka/job_header.avsc`` — record JobHeader with five string
fields domain/href/company/title/msgid). The sandbox has neither a
broker nor the spark-avro connector jar, so this module implements the
record's wire format directly from the public Avro 1.x spec:

- record  = concatenation of its field encodings in schema order
- string  = long(byte_length) + utf8 bytes
- long    = zigzag(n) as a little-endian base-128 varint
  (zigzag: n -> (n << 1) ^ (n >> 63), so small magnitudes stay short)

and the Confluent Schema-Registry wire framing the reference's
AvroProducer actually emits on the topic:

    0x00 magic byte | 4-byte big-endian schema id | avro payload

The Spark surface is a pair of Arrow-batched pandas UDFs
(``to_jobheader_avro`` / ``from_jobheader_avro``); the per-batch loop
is plain bytes assembly — no JVM round-trips, no per-row Python UDFs.
Round-trip identity (including multibyte Korean utf8) is gated by a
driver query against the DuckDB oracle and by golden-bytes unit tests
hand-computed from the spec.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

JOBHEADER_FIELDS = ("domain", "href", "company", "title", "msgid")

JOBHEADER_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), False) for f in JOBHEADER_FIELDS]
)

MAGIC = b"\x00"
DEFAULT_SCHEMA_ID = 1


def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then little-endian base-128 varint."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    """Returns (value, next_pos)."""
    z = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def encode_jobheader_py(
    domain: str, href: str, company: str, title: str, msgid: str,
    schema_id: int = DEFAULT_SCHEMA_ID,
) -> bytes:
    """One JobHeader record in Confluent wire framing."""
    out = bytearray(MAGIC)
    out += schema_id.to_bytes(4, "big")
    for s in (domain, href, company, title, msgid):
        b = s.encode("utf-8")
        out += zigzag_encode(len(b))
        out += b
    return bytes(out)


def decode_jobheader_py(payload: bytes) -> tuple[str, str, str, str, str]:
    if payload[0:1] != MAGIC:
        raise ValueError(f"bad magic byte {payload[0]:#x}")
    pos = 5  # skip magic + schema id
    vals = []
    for _ in JOBHEADER_FIELDS:
        n, pos = zigzag_decode(payload, pos)
        vals.append(payload[pos : pos + n].decode("utf-8"))
        pos += n
    if pos != len(payload):
        raise ValueError(f"{len(payload) - pos} trailing bytes")
    return tuple(vals)


@pandas_udf(T.BinaryType())
def to_jobheader_avro(
    domain: pd.Series, href: pd.Series, company: pd.Series,
    title: pd.Series, msgid: pd.Series,
) -> pd.Series:
    return pd.Series(
        [
            encode_jobheader_py(d, h, c, t, m)
            for d, h, c, t, m in zip(domain, href, company, title, msgid)
        ]
    )


@pandas_udf(JOBHEADER_SCHEMA)
def from_jobheader_avro(payload: pd.Series) -> pd.DataFrame:
    rows = [decode_jobheader_py(bytes(p)) for p in payload]
    return pd.DataFrame(rows, columns=list(JOBHEADER_FIELDS))


def avro_roundtrip(spark, sf_dir: str):
    """Driver query: derive JobHeader fields from the documents table,
    encode to Confluent-framed Avro binary, decode back, and project
    the decoded fields — the oracle is the pre-encode projection, so
    any codec defect (varint, utf8, framing) breaks the value hash."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hdr = docs.select(
        "doc_id",
        F.col("source").alias("domain"),
        F.concat(F.lit("https://"), F.col("source"), F.lit("/"), F.col("doc_id")).alias("href"),
        F.col("lang").alias("company"),
        F.substring("text", 1, 40).alias("title"),
        F.sha2(F.concat(F.col("source"), F.col("text")), 256).alias("msgid"),
    )
    enc = hdr.select(
        "doc_id",
        to_jobheader_avro("domain", "href", "company", "title", "msgid").alias("value"),
    )
    dec = enc.select(
        "doc_id", F.length("value").alias("wire_bytes"), from_jobheader_avro("value").alias("r")
    )
    return dec.select(
        "doc_id", "r.domain", "r.href", "r.company", "r.title", "r.msgid", "wire_bytes"
    ).orderBy("doc_id")


# Oracle: the same field derivation plus the wire length computed from
# the spec — 5 framing bytes + per-field (varint(len) + len). All
# derived strings here are ASCII except title (substr of text, which
# can be multibyte): the varint length is 1 byte for utf8 lengths < 64
# and 2 bytes for < 8192, which covers every field this query emits
# (title <= 40 chars * 3 bytes utf8 = 120, msgid = 64, href < 8192).
_VARLEN = "(CASE WHEN strlen({f}) < 64 THEN 1 ELSE 2 END + strlen({f}))"  # strlen = utf8 BYTES in DuckDB

AVRO_ROUNDTRIP_SQL = f"""
WITH hdr AS (
  SELECT doc_id,
         source AS domain,
         'https://' || source || '/' || doc_id AS href,
         lang AS company,
         substr(text, 1, 40) AS title,
         sha256(source || text) AS msgid
  FROM documents
)
SELECT doc_id, domain, href, company, title, msgid,
       (5 + {_VARLEN.format(f="domain")} + {_VARLEN.format(f="href")}
          + {_VARLEN.format(f="company")} + {_VARLEN.format(f="title")}
          + {_VARLEN.format(f="msgid")})::INT AS wire_bytes
FROM hdr ORDER BY doc_id
"""


QUERIES = {
    "avro_roundtrip": (avro_roundtrip, AVRO_ROUNDTRIP_SQL),
}
