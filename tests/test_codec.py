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


# ---------------------------------------------------------------------------
# round-5 segmented encoders (one pass per flush instead of one codec
# call per posting run — byte identity with the per-group form is the
# whole contract)

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(seed=st.integers(0, 100_000), n=st.integers(0, 400), g=st.integers(1, 12))
def test_segmented_varints_byte_identical(seed, n, g):
    import numpy as np

    from xsearch_spark.functions import codec

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
    cuts = np.sort(rng.integers(0, n + 1, size=g - 1)) if n else np.zeros(g - 1, int)
    starts = np.concatenate([[0], cuts]).astype(np.int64)  # may repeat: empty groups
    got = codec.encode_varints_segmented(vals, starts)
    ends = np.append(starts[1:], n)
    want = [codec.encode_varints(vals[s:e]) for s, e in zip(starts, ends)]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(seed=st.integers(0, 100_000), g=st.integers(1, 10))
def test_segmented_doc_ids_byte_identical_and_roundtrip(seed, g):
    import numpy as np

    from xsearch_spark.functions import codec

    rng = np.random.default_rng(seed)
    groups = [
        np.sort(
            rng.choice(1 << 40, size=rng.integers(1, 200), replace=False)
        ).astype(np.uint64)
        for _ in range(g)
    ]
    flat = np.concatenate(groups)
    lens = np.array([a.size for a in groups])
    starts = (np.cumsum(lens) - lens).astype(np.int64)
    got = codec.encode_doc_ids_segmented(flat, starts)
    want = [codec.encode_doc_ids(a) for a in groups]
    assert got == want
    for b, a in zip(got, groups):
        assert np.array_equal(codec.decode_doc_ids(b), a)
