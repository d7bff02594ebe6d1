"""Vectorized LEB128 varint codec (numpy, no per-element Python loops).

The posting-list storage format (operators/postings.py) delta-encodes
doc ids and varint-compresses the delta/tf/doclen streams — the engine's
native analog of Lucene's FOR/vint posting blocks (SURVEY.md §4, codec
row; reference behavior provided by the Lucene codec, not repo code).

Encode is O(10) vectorized passes (one per possible varint byte slot);
decode is a single pass of masked numpy ops. Both are exact for values
< 2**53 (decode accumulates through float64 bincount weights; doc ids at
10^12-turn scale are < 2**41, tf/doclen far smaller).
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # ceil(64/7)


def varint_encode(values: np.ndarray) -> bytes:
    """uint64-compatible 1-D array -> LEB128 byte stream."""
    return varint_encode_with_sizes(values)[0]


def varint_encode_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode and also return bytes-per-value (int64 array), so a
    caller encoding the CONCATENATION of many streams can split the
    output buffer back into per-stream blobs (the batch-encode dual of
    varint_decode_counts)."""
    v = np.asarray(values).astype(np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    # bytes needed per value: max(1, ceil(bit_length / 7))
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 7
        tmp = tmp >> np.uint64(7)
    nbytes = np.maximum(nbits // 7, 1)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    pos = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    for j in range(_MAX_BYTES):
        sel = nbytes > j
        if not sel.any():
            break
        byte = ((v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(
            np.uint8
        )
        more = (nbytes[sel] - 1) > j
        out[pos[sel] + j] = byte | (more.astype(np.uint8) << 7)
    return out.tobytes(), nbytes


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """LEB128 byte stream -> int64 array."""
    d = np.frombuffer(buf, dtype=np.uint8)
    if d.size == 0:
        return np.zeros(0, dtype=np.int64)
    ends = (d & 0x80) == 0
    gid = np.zeros(d.size, dtype=np.int64)
    np.cumsum(ends[:-1], out=gid[1:])
    start_pos = np.flatnonzero(np.concatenate(([True], ends[:-1])))
    offs = np.arange(d.size, dtype=np.int64) - start_pos[gid]
    low7 = (d & 0x7F).astype(np.float64)
    vals = np.bincount(gid, weights=low7 * np.exp2(7.0 * offs))
    out = vals.astype(np.int64)
    if count is not None and out.size != count:
        raise ValueError(f"decoded {out.size} values, expected {count}")
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int array -> first value + successive gaps."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.int64))


def delta_encode_segmented(
    sorted_ids: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Per-stream delta encode over concatenated streams (lengths
    ``counts``): successive gaps within each stream, absolute first
    value at every stream boundary. Inverse of delta_decode_segmented."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    n = np.asarray(counts, dtype=np.int64)
    n = n[n > 0]
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[1:] = a[1:] - a[:-1]
    starts = np.concatenate(([0], np.cumsum(n)[:-1]))
    out[starts] = a[starts]
    return out


def varint_decode_counts(buf: bytes, counts: np.ndarray) -> np.ndarray:
    """Decode the CONCATENATION of many varint streams in one vectorized
    pass. LEB128 is self-delimiting, so the concatenated buffer decodes
    to the concatenation of the per-stream values; ``counts`` (values per
    stream) only validates the total and lets callers split the result.

    This is the batch fast path for blob-at-a-time posting decodes: one
    decode of N small blobs costs ~N x the numpy fixed overhead, while
    one decode of their concatenation costs it once (measured 3.1s ->
    ~0.3s over 54k blobs in the segmented BMW scorer)."""
    out = varint_decode(buf)
    total = int(np.asarray(counts, dtype=np.int64).sum())
    if out.size != total:
        raise ValueError(f"decoded {out.size} values, expected {total}")
    return out


def delta_decode_segmented(deltas: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-stream delta decode over concatenated streams: within each
    stream (lengths ``counts``) the first value is absolute and the rest
    are gaps — i.e. a cumsum that restarts at every stream boundary,
    computed as one global cumsum minus the per-stream prefix."""
    d = np.asarray(deltas, dtype=np.int64)
    n = np.asarray(counts, dtype=np.int64)
    n = n[n > 0]
    if d.size == 0:
        return d
    c = np.cumsum(d)
    starts = np.concatenate(([0], np.cumsum(n)[:-1]))
    prefix = np.concatenate(([0], c[starts[1:] - 1]))
    return c - np.repeat(prefix, n)
