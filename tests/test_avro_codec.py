"""Avro JobHeader wire-format conformance (public Avro 1.x spec +
Confluent framing) — golden bytes hand-computed from the spec."""

from __future__ import annotations

import pytest

from job_searchengine_project_spark.sources.avro_codec import (
    decode_jobheader_py,
    encode_jobheader_py,
    from_jobheader_avro,
    to_jobheader_avro,
    zigzag_decode,
    zigzag_encode,
)


def test_zigzag_varint_spec_values():
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04, 63->7e, 64->80 01
    assert zigzag_encode(0) == b"\x00"
    assert zigzag_encode(-1) == b"\x01"
    assert zigzag_encode(1) == b"\x02"
    assert zigzag_encode(-2) == b"\x03"
    assert zigzag_encode(63) == b"\x7e"
    assert zigzag_encode(64) == b"\x80\x01"
    assert zigzag_encode(100) == b"\xc8\x01"
    for n in (0, 1, -1, 63, 64, 8191, 8192, 2**31, -(2**31)):
        v, pos = zigzag_decode(zigzag_encode(n), 0)
        assert (v, pos) == (n, len(zigzag_encode(n)))


def test_jobheader_golden_bytes():
    """domain='a', href='', company='bc', title='한' (3 utf8 bytes),
    msgid='xy' — framing 00 + schema id 1, then per-field
    varint(len)+utf8."""
    b = encode_jobheader_py("a", "", "bc", "한", "xy", schema_id=1)
    expect = (
        b"\x00\x00\x00\x00\x01"  # magic + schema id 1 (big-endian)
        b"\x02a"                 # len 1 -> zigzag 2
        b"\x00"                  # len 0
        b"\x04bc"                # len 2 -> zigzag 4
        b"\x06" + "한".encode()  # len 3 -> zigzag 6
        + b"\x04xy"
    )
    assert b == expect
    assert decode_jobheader_py(b) == ("a", "", "bc", "한", "xy")


def test_jobheader_long_field_two_byte_varint():
    title = "x" * 100  # zigzag(100) = 200 -> varint c8 01
    b = encode_jobheader_py("d", "h", "c", title, "m")
    assert b"\xc8\x01" + title.encode() in b
    assert decode_jobheader_py(b)[3] == title


def test_decode_rejects_bad_frames():
    good = encode_jobheader_py("d", "h", "c", "t", "m")
    with pytest.raises(ValueError, match="magic"):
        decode_jobheader_py(b"\x01" + good[1:])
    with pytest.raises(ValueError, match="trailing"):
        decode_jobheader_py(good + b"\x00")


def test_spark_roundtrip_multibyte(spark):
    rows = [
        ("잡코리아", "https://예시.test/잡", "회사", "데이터 엔지니어 채용", "m1"),
        ("", "", "", "", ""),
    ]
    df = spark.createDataFrame(rows, "domain string, href string, company string, title string, msgid string")
    dec = (
        df.select(to_jobheader_avro("domain", "href", "company", "title", "msgid").alias("v"))
        .select(from_jobheader_avro("v").alias("r"))
        .select("r.*")
    )
    assert [tuple(r) for r in dec.collect()] == rows
