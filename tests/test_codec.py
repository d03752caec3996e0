import numpy as np
from hypothesis import given, settings, strategies as st

from searchengine_spark.codec import (
    decode_positions,
    encode_positions,
    encode_positions_many,
    vb_decode,
    vb_encode,
)


def test_roundtrip_basic():
    pos = [0, 1, 5, 130, 16384, 16385]
    assert decode_positions(encode_positions(pos)).tolist() == pos


def test_empty():
    assert encode_positions([]) == b""
    assert decode_positions(b"").size == 0


def test_single_large():
    v = [2**40]
    assert decode_positions(encode_positions(v)).tolist() == v


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31), min_size=0, max_size=50))
def test_vb_roundtrip(values):
    assert vb_decode(vb_encode(values)).tolist() == values


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=100))
def test_positions_roundtrip(gaps):
    pos = np.cumsum(np.asarray(gaps, dtype=np.int64)).tolist()
    assert decode_positions(encode_positions(pos)).tolist() == pos


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=30),
        min_size=0,
        max_size=40,
    )
)
def test_encode_many_matches_per_list(gap_lists):
    """The whole-batch encoder is bit-identical to per-list encode."""
    pos_lists = [np.cumsum(np.asarray(g, dtype=np.int64)).tolist() for g in gap_lists]
    assert encode_positions_many(pos_lists) == [encode_positions(p) for p in pos_lists]


def test_encode_many_edges():
    assert encode_positions_many([]) == []
    assert encode_positions_many([[], (), []]) == [b"", b"", b""]
    mixed = [[], [0], [], [0, 127, 128, 16383, 16384, 2**21, 2**40], []]
    assert encode_positions_many(mixed) == [encode_positions(p) for p in mixed]
    # numpy-array inputs (the #SYN merge path)
    arrs = [np.array([1, 5, 9], dtype=np.int64), np.empty(0, dtype=np.int64)]
    assert encode_positions_many(arrs) == [encode_positions(p) for p in arrs]


def test_encode_many_rejects_descending():
    import pytest

    with pytest.raises(ValueError):
        encode_positions_many([[0, 2], [3, 1]])


def test_decode_many_truncated_blob_raises():
    """A blob truncated mid-value (no terminator on its last byte) must
    fail loudly: concatenated decoding would otherwise either IndexError
    or silently merge the partial limbs into the NEXT blob's first value."""
    import pytest

    good = encode_positions([5, 300, 9000])
    bad = good[:-1]  # drop the final terminator byte
    from searchengine_spark.codec import decode_positions_many

    with pytest.raises(ValueError, match="truncated"):
        decode_positions_many([bad])
    with pytest.raises(ValueError, match="truncated"):
        decode_positions_many([good, bad, good])


def test_decode_many_matches_per_blob():
    from searchengine_spark.codec import decode_positions_many

    lists = [[0, 1, 2], [], [130, 131, 40000], [7], list(range(0, 5000, 13))]
    blobs = [encode_positions(p) for p in lists]
    out = decode_positions_many(blobs + [None, b""])
    for got, want in zip(out, lists + [[], []]):
        assert got.tolist() == list(want)
