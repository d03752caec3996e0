"""Delta + variable-byte codecs for position lists and doc-id lists.

The reference keeps positions as ``Vector<Integer>`` (InvList.java:67, no
compression). Per the scale target we store ascending integer lists as
**delta-encoded varbyte** ``binary`` payloads: each gap is written
little-endian 7 bits per byte, high bit set on the last byte of each value
(classic Lucene/varint framing). Encoding/decoding happens inside Arrow
pandas UDFs, vectorized over record batches with numpy.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "vb_encode",
    "vb_decode",
    "encode_positions",
    "decode_positions",
]


def vb_encode(values) -> bytes:
    """Varbyte-encode a sequence of non-negative ints (no delta)."""
    out = bytearray()
    for v in values:
        v = int(v)
        if v < 0:
            raise ValueError("varbyte requires non-negative ints")
        while v >= 128:
            out.append(v & 0x7F)
            v >>= 7
        out.append(v | 0x80)
    return bytes(out)


def vb_decode(data: bytes) -> np.ndarray:
    """Decode a varbyte stream back to an int64 numpy array."""
    if not data:
        return np.empty(0, dtype=np.int64)
    buf = np.frombuffer(data, dtype=np.uint8)
    # terminator bytes have the high bit set
    ends = (buf & 0x80) != 0
    n = int(ends.sum())
    out = np.empty(n, dtype=np.int64)
    val = 0
    shift = 0
    i = 0
    for b in buf:
        if b & 0x80:
            out[i] = val | (int(b & 0x7F) << shift)
            i += 1
            val = 0
            shift = 0
        else:
            val |= int(b) << shift
            shift += 7
    return out


def encode_positions(positions) -> bytes:
    """Delta+varbyte encode an ascending position list."""
    arr = np.asarray(positions, dtype=np.int64)
    if arr.size == 0:
        return b""
    deltas = np.empty_like(arr)
    deltas[0] = arr[0]
    if arr.size > 1:
        deltas[1:] = arr[1:] - arr[:-1]
    if (deltas < 0).any():
        raise ValueError("positions must be ascending")
    return vb_encode(deltas)


def decode_positions(data: bytes) -> np.ndarray:
    """Decode delta+varbyte back to absolute ascending positions."""
    deltas = vb_decode(data)
    if deltas.size == 0:
        return deltas
    return np.cumsum(deltas)
