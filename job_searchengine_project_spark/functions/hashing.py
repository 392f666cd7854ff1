"""Deterministic identity / content hashing (JVM-side).

The reference derives every identity from content hashes:
``msgid = sha256(href + title)`` (collector/collector.py:149-152,
common/job_class.py:113-118) and image content hashes
``sha256(hex(bytes) + kb)`` (consumer/consumer.py:83). Those give the
whole pipeline its idempotency. Here the same design, as codegen'd
Column expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha256_col(col: Column) -> Column:
    """sha256 hexdigest of a string column (reference ``_hash``)."""
    return F.sha2(col, 256)


def msgid(href: Column, title: Column) -> Column:
    """Document identity: sha256(href + title)."""
    return F.sha2(F.concat(href, title), 256)


def doc_uid(url: Column) -> Column:
    """Web-page identity for the input table (url is unique per hint)."""
    return F.sha2(url, 256)


def content_hash_binary(data: Column, size_kb: Column) -> Column:
    """Binary content hash: sha256(hex(bytes) + str(kb))."""
    return F.sha2(F.concat(F.lower(F.hex(data)), size_kb.cast("string")), 256)


def shard_prefix(h: Column) -> Column:
    """Two-level fanout prefix (reference: hash[0:2]/hash[2:4])."""
    return F.concat_ws("/", F.substring(h, 1, 2), F.substring(h, 3, 2))
