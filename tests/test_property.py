"""Property-based tests (hypothesis) for the tokenizer/shingle kernels."""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datasketches_rust_spark.sigkit.kmv import MAX_THETA63, jaccard_estimate
from datasketches_rust_spark.sigkit.tokenize import (
    concat_docs,
    shingle_hashes,
    token_hash_stream_buf,
)
from datasketches_rust_spark.sigkit.xxhash import xxh64_str_list

_RX = re.compile("[A-Za-z0-9_]+")

doc = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
    max_size=200,
)


@settings(max_examples=80, deadline=None)
@given(st.lists(doc, max_size=8))
def test_tokenizer_matches_regex_on_arbitrary_batches(texts):
    """Buffer-based tokenization == per-doc regex, for any batch layout."""
    buf, offs = concat_docs(texts)
    hashes, tok_off = token_hash_stream_buf(buf, offs, 9001)
    for i, t in enumerate(texts):
        toks = [tok for tok in _RX.findall(t) if tok.isascii()]
        # non-ASCII identifier codepoints split byte-level; restrict the
        # oracle to ASCII-only tokens by re-tokenizing the ASCII projection
        ascii_t = "".join(c if c.isascii() else "\x00" for c in t)
        toks = _RX.findall(ascii_t)
        got = hashes[tok_off[i] : tok_off[i + 1]]
        assert len(got) == len(toks), (t, toks)
        if toks:
            assert np.array_equal(got, xxh64_str_list(toks, 9001))


@settings(max_examples=40, deadline=None)
@given(st.lists(doc, min_size=1, max_size=6), st.integers(1, 7))
def test_shingles_deterministic_and_self_jaccard(texts, width):
    v1, o1 = shingle_hashes(texts, width, 9001)
    v2, o2 = shingle_hashes(list(texts), width, 9001)
    assert np.array_equal(v1, v2) and np.array_equal(o1, o2)
    for i in range(len(texts)):
        s = v1[o1[i] : o1[i + 1]]
        assert np.all(np.diff(s.astype(np.int64)) > 0)  # sorted distinct
        assert jaccard_estimate(s, MAX_THETA63, s, MAX_THETA63) == 1.0
