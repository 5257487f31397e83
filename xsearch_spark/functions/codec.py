"""Posting-list codec: delta + LEB128 varint, fully vectorized NumPy.

Format (FIXTURES.md §3.4, pinned by BASELINE.json:6 "delta-encoded
varint-style posting compression"):

  * docIDs: sorted ascending, unique. Delta-encoded — first value kept
    absolute, subsequent values as diffs — then each value LEB128 varint
    encoded (7 bits/byte, little-endian, high bit = continuation) and
    concatenated into one ``bytes``.
  * tfs: plain varint stream (no delta), position-aligned with docIDs.

Reference parity: xsearch stores compressed posting blobs in a local KV
store (component-level [R], SURVEY.md §2.3 B6 — no file:line possible,
the reference checkout is empty). Here the blobs are ``BinaryType``
columns in segment DataFrames.

Vectorization: no per-integer Python loop anywhere. Encode builds an
(n, 10) byte matrix in <=10 vector ops; decode uses
``np.bitwise_or.reduceat`` over continuation-bit run boundaries. This is
what makes the codec usable inside Arrow-batched pandas UDFs at 100 TB
scale — the Python worker cost is O(vector ops), not O(postings).
"""

from __future__ import annotations

import numpy as np

_U64_7 = np.uint64(7)
_U64_0x7F = np.uint64(0x7F)
_MAX_VARINT_BYTES = 10  # ceil(64 / 7)


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints into one bytes blob."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    mat = np.zeros((n, _MAX_VARINT_BYTES), dtype=np.uint8)
    mask = np.zeros((n, _MAX_VARINT_BYTES), dtype=bool)
    rem = v.copy()
    active = np.ones(n, dtype=bool)
    for i in range(_MAX_VARINT_BYTES):
        if not active.any():
            break
        mat[active, i] = (rem[active] & _U64_0x7F).astype(np.uint8)
        mask[active, i] = True
        rem = rem >> _U64_7
        active = rem > 0
    counts = mask.sum(axis=1)
    cont = mask.copy()
    cont[np.arange(n), counts - 1] = False  # last byte of each value: no cont bit
    mat[cont] |= 0x80
    # C-order boolean selection flattens row-by-row -> per-value byte order kept
    return mat[mask].tobytes()


def decode_varints(buf: bytes) -> np.ndarray:
    """Decode a LEB128 blob back into a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    if ends.size == 0 or ends[-1] != b.size - 1:
        raise ValueError("truncated varint stream")
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # byte position within its value
    val_id = np.zeros(b.size, dtype=np.int64)
    val_id[starts[1:]] = 1
    val_id = np.cumsum(val_id)
    pos = (np.arange(b.size) - starts[val_id]).astype(np.uint64)
    contrib = (b.astype(np.uint64) & _U64_0x7F) << (_U64_7 * pos)
    # per-value bits are disjoint -> OR == sum; reduceat segments by starts
    return np.bitwise_or.reduceat(contrib, starts)


def encode_varints_segmented(values: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """Per-group LEB128 blobs for CONTIGUOUS groups of ``values`` (group
    g = values[starts[g] : starts[g+1]], last group runs to the end) —
    byte-identical to calling :func:`encode_varints` once per group, but
    ONE vectorized pass over the whole batch plus a cheap bytes-slice
    per group. This is what makes packing ~10^6 posting runs per task
    O(vector ops + memcpy), not 10^6 codec invocations (round-5: the
    per-run overhead, not tokenization, dominated the build wall)."""
    starts = np.asarray(starts, dtype=np.int64)
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return [b""] * starts.size
    mat = np.zeros((n, _MAX_VARINT_BYTES), dtype=np.uint8)
    mask = np.zeros((n, _MAX_VARINT_BYTES), dtype=bool)
    rem = v.copy()
    active = np.ones(n, dtype=bool)
    for i in range(_MAX_VARINT_BYTES):
        if not active.any():
            break
        mat[active, i] = (rem[active] & _U64_0x7F).astype(np.uint8)
        mask[active, i] = True
        rem = rem >> _U64_7
        active = rem > 0
    counts = mask.sum(axis=1)
    cont = mask.copy()
    cont[np.arange(n), counts - 1] = False
    mat[cont] |= 0x80
    flat = mat[mask].tobytes()
    byte_cum = np.concatenate([[0], np.cumsum(counts)])
    ends = np.append(starts[1:], n)
    bs = byte_cum[starts]
    be = byte_cum[ends]
    return [flat[s:e] for s, e in zip(bs.tolist(), be.tolist())]


def encode_doc_ids_segmented(doc_ids: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """Segmented twin of :func:`encode_doc_ids`: per-group delta (first
    value of EACH group kept absolute) + varint, one pass."""
    starts = np.asarray(starts, dtype=np.int64)
    d = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    if d.size == 0:
        return [b""] * starts.size
    deltas = d.copy()
    deltas[1:] -= d[:-1]
    valid = starts[starts < d.size]
    deltas[valid] = d[valid]  # reset to absolute at every group start
    return encode_varints_segmented(deltas, starts)


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Delta(+first-absolute) then varint encode a sorted unique run."""
    d = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    if d.size == 0:
        return b""
    deltas = np.empty_like(d)
    deltas[0] = d[0]
    np.subtract(d[1:], d[:-1], out=deltas[1:])
    return encode_varints(deltas)


def decode_doc_ids(buf: bytes) -> np.ndarray:
    deltas = decode_varints(buf)
    if deltas.size == 0:
        return deltas
    return np.cumsum(deltas, dtype=np.uint64)


def encode_tfs(tfs: np.ndarray) -> bytes:
    return encode_varints(tfs)


def decode_tfs(buf: bytes) -> np.ndarray:
    return decode_varints(buf)
