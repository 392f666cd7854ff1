"""M3: codec round-trip identity + merge-by-concat properties."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from job_searchengine_project_spark.index.codec import (
    concat_encoded,
    decode_postings,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**52 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert list(varbyte_decode(varbyte_encode(arr))) == values


def test_varbyte_compression_is_real():
    deltas = np.ones(10_000, dtype=np.uint64)  # dense postings: 1 byte each
    assert len(varbyte_encode(deltas)) == 10_000  # vs 80_000 raw


def test_varbyte_rejects_out_of_range():
    with pytest.raises(ValueError):
        varbyte_encode(np.array([2**53], dtype=np.uint64))
    with pytest.raises(ValueError):
        varbyte_decode(b"\x01\x02")  # no terminator


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=0, max_size=700, unique=True),
    st.integers(min_value=1, max_value=300),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(doc_ids, block_size):
    docs = np.array(sorted(doc_ids), dtype=np.int64)
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, 1000, size=docs.size).astype(np.int64)
    tfn = rng.random(docs.size)
    enc = encode_postings(docs, tfs, tfn, block_size=block_size)
    d, t = decode_postings(enc)
    assert (d == docs).all() and (t == tfs).all()
    assert enc.count == docs.size
    # block-max is an upper bound on every posting's tfnorm in the block
    if docs.size:
        start = 0
        for i, n in enumerate(enc.block_n):
            assert enc.block_max_tfnorm[i] >= tfn[start : start + n].max() - 1e-15
            assert enc.block_last_doc[i] == docs[start + n - 1]
            start += n


def test_encode_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(
            np.array([5, 3], dtype=np.int64),
            np.array([1, 1], dtype=np.int64),
            np.array([0.1, 0.1]),
        )


def test_concat_equals_whole_encode():
    rng = np.random.default_rng(1)
    docs = np.sort(rng.choice(10**9, size=1000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=1000).astype(np.int64)
    tfn = rng.random(1000)
    cut1, cut2 = 400, 777
    parts = [
        encode_postings(docs[s:e], tfs[s:e], tfn[s:e])
        for s, e in [(0, cut1), (cut1, cut2), (cut2, 1000)]
    ]
    merged = concat_encoded(parts)
    d, t = decode_postings(merged)
    assert (d == docs).all() and (t == tfs).all()
    assert merged.count == 1000


def test_concat_rejects_overlap():
    a = encode_postings(np.array([1, 5], np.int64), np.array([1, 1], np.int64), np.array([0.1, 0.1]))
    b = encode_postings(np.array([4, 9], np.int64), np.array([1, 1], np.int64), np.array([0.1, 0.1]))
    with pytest.raises(ValueError):
        concat_encoded([a, b])


def test_positions_roundtrip_and_concat():
    """Positional blobs: round-trip identity and doc-range concat parity
    (the same merge-by-concatenation invariant as docs/tfs)."""
    import numpy as np

    from job_searchengine_project_spark.index import codec

    rng = np.random.default_rng(11)
    docs = np.unique(rng.integers(0, 50_000, 2_000)).astype(np.int64)
    tfs = rng.integers(1, 6, docs.size).astype(np.int64)
    pos = np.concatenate(
        [np.sort(rng.choice(4_000, size=t, replace=False)) for t in tfs]
    ).astype(np.int64)
    tfn = tfs / (tfs + 1.0)
    enc = codec.encode_postings(docs, tfs, tfn, block_size=64, positions=pos)
    assert enc.has_positions
    d2, t2 = codec.decode_postings(enc)
    assert np.array_equal(codec.decode_positions(enc, t2), pos)

    m = docs.size // 3
    poff = np.concatenate([[0], np.cumsum(tfs)])
    parts = [
        codec.encode_postings(docs[:m], tfs[:m], tfn[:m], 64, positions=pos[: poff[m]]),
        codec.encode_postings(docs[m:], tfs[m:], tfn[m:], 64, positions=pos[poff[m] :]),
    ]
    cc = codec.concat_encoded(parts)
    d3, t3 = codec.decode_postings(cc)
    assert np.array_equal(d3, docs)
    assert np.array_equal(codec.decode_positions(cc, t3), pos)


def test_positions_size_mismatch_rejected():
    import numpy as np

    import pytest

    from job_searchengine_project_spark.index import codec

    docs = np.array([1, 5], dtype=np.int64)
    tfs = np.array([2, 1], dtype=np.int64)
    with pytest.raises(ValueError, match="positions"):
        codec.encode_postings(docs, tfs, tfs / 2.0, positions=np.array([0, 1]))


def test_concat_rejects_mixed_positional():
    import numpy as np

    import pytest

    from job_searchengine_project_spark.index import codec

    docs = np.array([1], dtype=np.int64)
    tfs = np.array([1], dtype=np.int64)
    a = codec.encode_postings(docs, tfs, tfs / 2.0, positions=np.array([3]))
    b = codec.encode_postings(docs + 10, tfs, tfs / 2.0)
    with pytest.raises(ValueError, match="mixed"):
        codec.concat_encoded([a, b])
