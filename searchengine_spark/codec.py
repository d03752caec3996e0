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


def encode_positions_many(pos_lists) -> list[bytes]:
    """Delta+varbyte encode a whole batch of position lists in ONE pass.

    The per-list ``encode_positions`` pays ~8µs of numpy call overhead
    per posting — at index-build time that was 63% of the tokenize
    kernel (measured: 0.72s of 1.13s per 4000 sf0.1 docs). Here all
    lists concatenate into one int64 array; deltas, varbyte limb
    widths, byte offsets, and terminator bits are computed globally
    (one vectorized pass per limb, max 10 for int64); the result
    splits back into per-list ``bytes`` with C-level slices.

    Bit-identical to ``[encode_positions(p) for p in pos_lists]``
    (pinned by tests/test_codec.py).
    """
    n_lists = len(pos_lists)
    if n_lists == 0:
        return []
    counts = np.fromiter((len(p) for p in pos_lists), dtype=np.int64, count=n_lists)
    total = int(counts.sum())
    if total == 0:
        return [b""] * n_lists
    vals = np.empty(total, dtype=np.int64)
    o = 0
    for p in pos_lists:
        ln = len(p)
        if ln:
            vals[o : o + ln] = p
            o += ln
    seg_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])[counts > 0]
    deltas = np.empty(total, dtype=np.int64)
    deltas[0] = vals[0]
    if total > 1:
        deltas[1:] = vals[1:] - vals[:-1]
    deltas[seg_starts] = vals[seg_starts]
    if (deltas < 0).any():
        raise ValueError("positions must be ascending")
    # bytes per value: 1 limb per 7 bits (0 -> 1 byte)
    nb = np.ones(total, dtype=np.int64)
    rest = deltas >> 7
    while rest.any():
        nb += rest != 0
        rest >>= 7
    byte_ends = np.cumsum(nb)
    byte_starts = byte_ends - nb
    out = np.empty(int(byte_ends[-1]), dtype=np.uint8)
    todo = np.arange(total, dtype=np.int64)
    limb = 0
    while todo.size:
        sel = deltas[todo] >> (7 * limb)
        byte = (sel & 0x7F).astype(np.uint8)
        last = nb[todo] == limb + 1
        byte[last] |= 0x80
        out[byte_starts[todo] + limb] = byte
        todo = todo[~last]
        limb += 1
    buf = out.tobytes()
    # per-list byte spans from the per-value spans
    list_val_ends = np.cumsum(counts)
    list_byte_ends = np.where(list_val_ends > 0, byte_ends[np.maximum(list_val_ends, 1) - 1], 0)
    # an empty list inherits its predecessor's end offset on BOTH sides
    # (cumsum is flat there), so its slice is zero-length by construction
    list_byte_starts = np.concatenate([[0], list_byte_ends[:-1]])
    return [
        buf[a:b] if b > a else b""
        for a, b in zip(list_byte_starts.tolist(), list_byte_ends.tolist())
    ]


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
    # Every well-formed blob ends on a terminator byte (high bit set).
    # A blob truncated mid-value would otherwise either IndexError at
    # np.add.at (grp == n) or silently merge its partial limbs into the
    # NEXT blob's first value once concatenated — fail loudly instead.
    blob_last = np.cumsum(lens) - 1
    blob_last = blob_last[lens > 0]
    if blob_last.size and not ends[blob_last].all():
        raise ValueError("truncated varbyte blob (missing terminator byte)")
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
