import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bright_spark.index import codec
from bright_spark.query.scorer import tf_norm


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert codec.varint_decode(codec.varint_encode(arr)).tolist() == values


def test_varint_rejects_negative():
    with pytest.raises(ValueError):
        codec.varint_encode(np.array([-1], dtype=np.int64))


@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=500),
       st.integers(min_value=1, max_value=64))
@settings(max_examples=50, deadline=None)
def test_block_roundtrip(doc_set, block_size):
    rng = np.random.default_rng(7)
    doc_ids = np.sort(np.array(sorted(doc_set), dtype=np.int64))
    tfs = rng.integers(1, 100, doc_ids.size)
    dls = rng.integers(1, 5000, doc_ids.size)
    blocks = codec.encode_blocks(doc_ids, tfs, dls, block_size)
    d, t, l = codec.decode_all_blocks(blocks)
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)
    # invariants: per-block metadata sound (SURVEY.md §5)
    for i in range(len(blocks["n"])):
        bd, bt, bl = codec.decode_block(blocks["first_doc"][i], blocks["docs"][i],
                                        blocks["tfs"][i], blocks["dls"][i])
        assert bd[0] == blocks["first_doc"][i]
        assert bd[-1] == blocks["max_doc"][i]
        assert (np.diff(bd) > 0).all()
        assert bt.max() == blocks["max_tf"][i]
        assert bl.min() == blocks["min_dl"][i]
        # block-max bound dominates every member score for any params
        for avgdl, k1, b in ((100.0, 1.2, 0.75), (3.0, 0.9, 0.4)):
            ub = tf_norm(blocks["max_tf"][i], blocks["min_dl"][i], avgdl, k1, b)
            assert (tf_norm(bt, bl, avgdl, k1, b) <= ub + 1e-12).all()


def test_encode_rejects_unsorted():
    with pytest.raises(ValueError):
        codec.encode_blocks(np.array([3, 2]), np.array([1, 1]), np.array([1, 1]))
    with pytest.raises(ValueError):
        codec.encode_blocks(np.array([2, 2]), np.array([1, 1]), np.array([1, 1]))


def test_empty():
    assert codec.varint_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0
    d, t, l = codec.decode_all_blocks({"first_doc": [], "docs": [], "tfs": [], "dls": []})
    assert d.size == 0
