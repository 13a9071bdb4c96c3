"""Parity pins for the flat-pair tokenize path (round-5 build-kernel
rework): count_terms_flat / count_terms_batch must agree with the
per-doc reference implementation (count_terms + sorted items,
tokenize_with_positions) on every edge the rework touched — integer
ragged gather, combined-key radix sort, unique-level truncation."""
import numpy as np
import pytest

from bright_spark.analysis.tokenizer import (MAX_TOKEN_LEN, count_terms,
                                             count_terms_batch,
                                             count_terms_flat,
                                             tokenize_with_positions)

TRICKY = [
    "getUserId setUserId getUserId",          # shared sub-tokens across bases
    "",                                        # empty doc
    None,                                      # null doc
    "a b a c b a",                             # interleaved repeats
    "x" * (MAX_TOKEN_LEN + 9) + " short",      # over-long base token
    "the quick the THE",                       # case folding + repeats
    "snake_case camelCase SCREAMING_SNAKE x9",
    "solo",
]


@pytest.mark.parametrize("mode", ["code", "simple"])
def test_batch_matches_per_doc_reference(mode):
    term_arrs, tf_arrs, dls = count_terms_batch(TRICKY, mode, None, False)
    for i, text in enumerate(TRICKY):
        counts, dl = count_terms(text or "", mode, None, False)
        want = sorted(counts.items())
        got = list(zip(term_arrs[i].tolist(), tf_arrs[i].tolist()))
        assert got == want, (i, text)
        assert dls[i] == dl


@pytest.mark.parametrize("mode", ["code", "simple"])
def test_positions_match_reference(mode):
    _, tf_arrs, _, pos_arrs = count_terms_batch(
        TRICKY, mode, None, False, positions=True)
    term_arrs, _, _ = count_terms_batch(TRICKY, mode, None, False)
    for i, text in enumerate(TRICKY):
        ref = tokenize_with_positions(text or "", mode, None, False)
        want = {}
        for t, p in ref:
            want.setdefault(t, []).append(p)
        # per-pair segments of the flat array, term-ascending
        segs, off = {}, 0
        for t, tf in zip(term_arrs[i].tolist(), tf_arrs[i].tolist()):
            segs[t] = pos_arrs[i][off:off + tf].tolist()
            off += tf
        assert segs == want, (i, text)
        for seg in segs.values():  # ascending within every pair
            assert seg == sorted(seg)


def test_truncation_collapse_at_unique_level():
    # two DISTINCT over-long tokens sharing the 64-char prefix must
    # collapse into one term with tf=2 (the unique-level remap path)
    a = "y" * MAX_TOKEN_LEN + "tailone"
    b = "y" * MAX_TOKEN_LEN + "differenttail"
    term_arrs, tf_arrs, dls = count_terms_batch([f"{a} {b}"], "code")
    terms = term_arrs[0].tolist()
    assert terms == ["y" * MAX_TOKEN_LEN]
    assert tf_arrs[0].tolist() == [2]
    assert dls[0] == 2


def test_flat_pair_order_and_alignment():
    (pair_doc, pair_tid, tdict, pair_tf, doc_len,
     flat_pos) = count_terms_flat(TRICKY, "code", None, False,
                                  positions=True)
    # pairs grouped by doc ascending; terms lexicographic within doc
    assert (np.diff(pair_doc) >= 0).all()
    terms = tdict[pair_tid]
    for d in np.unique(pair_doc):
        m = pair_doc == d
        tl = terms[m].tolist()
        assert tl == sorted(tl)
    # per-doc emitted token counts: sum of pair tfs == doc_len
    assert doc_len.sum() == pair_tf.sum() == flat_pos.size
    got = np.bincount(pair_doc, weights=pair_tf,
                      minlength=len(TRICKY)).astype(np.int64)
    assert (got == doc_len).all()


def test_stopword_filter_flat_matches_batch():
    texts = ["the parser returns the result", "le parser le"]
    langs = ["en", "fr"]
    term_arrs, tf_arrs, dls = count_terms_batch(
        texts, "code", langs, filter_stopwords=True)
    for i, text in enumerate(texts):
        counts, dl = count_terms(text, "code", langs[i],
                                 filter_stopwords=True)
        assert list(zip(term_arrs[i].tolist(),
                        tf_arrs[i].tolist())) == sorted(counts.items())
        assert dls[i] == dl
