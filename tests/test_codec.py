"""Unit + property tests for the varint/delta posting codec (B6)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xsearch_spark.functions.codec import (
    decode_doc_ids,
    decode_varints,
    encode_doc_ids,
    encode_varints,
)


def test_empty():
    assert encode_varints(np.array([], dtype=np.uint64)) == b""
    assert decode_varints(b"").size == 0
    assert encode_doc_ids(np.array([], dtype=np.uint64)) == b""


def test_known_leb128_bytes():
    # classic LEB128 vectors
    assert encode_varints(np.array([0], dtype=np.uint64)) == b"\x00"
    assert encode_varints(np.array([1], dtype=np.uint64)) == b"\x01"
    assert encode_varints(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varints(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert encode_varints(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert encode_varints(np.array([624485], dtype=np.uint64)) == b"\xe5\x8e\x26"


def test_single_and_extremes():
    vals = np.array([0, 1, 127, 128, 2**31, 2**63 - 1, 2**64 - 1], dtype=np.uint64)
    assert np.array_equal(decode_varints(encode_varints(vals)), vals)


def test_doc_id_roundtrip_sorted():
    ids = np.array([0, 1, 5, 1000, 10**12, 2**62], dtype=np.uint64)
    assert np.array_equal(decode_doc_ids(encode_doc_ids(ids)), ids)


def test_truncated_raises():
    import pytest

    with pytest.raises(ValueError):
        decode_varints(b"\x80")  # continuation bit set on final byte


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varint_roundtrip_property(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(decode_varints(encode_varints(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=500, unique=True
    )
)
def test_docid_roundtrip_property(xs):
    arr = np.array(sorted(xs), dtype=np.uint64)
    assert np.array_equal(decode_doc_ids(encode_doc_ids(arr)), arr)
