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
    "decode_positions_many",
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
    """Decode a varbyte stream back to an int64 numpy array.

    Fully vectorized: the single-byte fast path (every value < 128 —
    virtually all position GAPS) is one mask+cast; the general path
    groups payload bytes by terminator with cumsum and accumulates the
    7-bit limbs with ``np.add.at``. A Python byte loop here was the
    positional-query bottleneck at 400k pages (head-term posting lists
    decode millions of bytes per query).
    """
    if not data:
        return np.empty(0, dtype=np.int64)
    buf = np.frombuffer(data, dtype=np.uint8)
    # terminator bytes have the high bit set
    ends = (buf & 0x80) != 0
    if ends.all():  # every value fit in 7 bits
        return (buf & 0x7F).astype(np.int64)
    n = int(ends.sum())
    idx = np.arange(buf.size, dtype=np.int64)
    end_idx = idx[ends]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = end_idx[:-1] + 1
    grp = np.cumsum(ends) - ends  # terminators strictly before byte
    keep = grp < n  # ignore a trailing incomplete value, like the old loop
    within = idx - starts[np.minimum(grp, n - 1)]
    vals = ((buf & 0x7F).astype(np.int64) << (7 * within))[keep]
    out = np.zeros(n, dtype=np.int64)
    np.add.at(out, grp[keep], vals)
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


def decode_positions_many(blobs) -> list[np.ndarray]:
    """Decode a whole batch of position blobs with ONE vectorized pass.

    Per-blob ``decode_positions`` pays ~10µs of numpy call overhead per
    row; an Arrow batch of 10k posting rows pays it 10k times. Here the
    blobs concatenate into one buffer (each blob ends on a terminator
    byte, so values never span blob boundaries), decode in one shot,
    and the absolute positions come from a global cumsum re-based per
    blob. Returns one int64 array per input blob (None/b"" -> empty).
    """
    n_blobs = len(blobs)
    if n_blobs == 0:
        return []
    lens = np.fromiter(
        (len(b) if b else 0 for b in blobs), dtype=np.int64, count=n_blobs
    )
    data = b"".join(b for b in blobs if b)
    if not data:
        return [np.empty(0, dtype=np.int64)] * n_blobs
    buf = np.frombuffer(data, dtype=np.uint8)
    ends = (buf & 0x80) != 0
    if ends.all():
        vals = (buf & 0x7F).astype(np.int64)
    else:
        n = int(ends.sum())
        idx = np.arange(buf.size, dtype=np.int64)
        end_idx = idx[ends]
        starts = np.empty(n, dtype=np.int64)
        starts[0] = 0
        starts[1:] = end_idx[:-1] + 1
        grp = np.cumsum(ends) - ends
        within = idx - starts[np.minimum(grp, n - 1)]
        limbs = (buf & 0x7F).astype(np.int64) << (7 * within)
        vals = np.zeros(n, dtype=np.int64)
        np.add.at(vals, grp, limbs)
    # values per blob = terminators inside each blob's byte range
    cum_ends = np.cumsum(ends)
    bounds = np.cumsum(lens)
    cum_at = np.where(bounds > 0, cum_ends[np.maximum(bounds, 1) - 1], 0)
    counts = np.diff(np.concatenate([[0], cum_at]))
    # absolute positions: global delta cumsum minus each blob's base
    cs = np.cumsum(vals)
    seg_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    bases = np.where(seg_starts > 0, cs[seg_starts - 1], 0)
    abs_pos = cs - np.repeat(bases, counts)
    return np.split(abs_pos, np.cumsum(counts)[:-1])
