import numpy as np
from hypothesis import given, settings, strategies as st

from searchengine_spark.codec import decode_positions, encode_positions, vb_decode, vb_encode


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
