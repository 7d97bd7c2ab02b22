"""Property-based tests (hypothesis) for the pure-Python spec helpers —
no SparkSession needed, so these run in milliseconds."""

import hashlib

from hypothesis import given, settings, strategies as st

from pyrdf2vec_spark.embed import compute_ngrams_bytes, ft_hash_bytes, ft_ngram_buckets
from pyrdf2vec_spark.extract import link_surface
from pyrdf2vec_spark.sources.transcripts import _turn_fields


@given(st.text(min_size=1, max_size=40))
@settings(max_examples=200)
def test_link_surface_deterministic_and_idempotent(s):
    c1, score1 = link_surface(s)
    c2, score2 = link_surface(s)
    assert (c1, score1) == (c2, score2)
    assert 0.0 <= score1 <= 1.0
    # linking a canonical id is a fixed point
    c3, _ = link_surface(c1)
    assert c3 == c1


@given(st.integers(0, 10_000), st.integers(0, 20), st.integers(0, 99))
@settings(max_examples=200)
def test_turn_fields_shape(conv, turn, seed):
    conv_id, turn_idx, role, text, tool, ts, triple = _turn_fields(conv, turn, seed)
    assert conv_id == f"conv{conv:08d}"
    assert turn_idx == turn
    assert role in ("user", "assistant", "tool")
    assert (tool == "") == (role != "tool")
    assert text
    if triple is not None:
        s, p, o = triple
        assert "_" in s and "_" in o
        assert p in ("works_at", "lives_in", "knows", "based_in")


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=200)
def test_ft_hash_matches_manual_fnv(b):
    h = 2166136261
    for byte in b:
        h = (h ^ byte) * 16777619
    assert ft_hash_bytes(b) == h


@given(st.text(min_size=1, max_size=60))
@settings(max_examples=200)
def test_ngram_buckets_in_range(s):
    for bkt in ft_ngram_buckets(s, 1000):
        assert 0 <= bkt < 1000
    segs = compute_ngrams_bytes(s)
    assert segs  # never empty for non-empty input
    if "http" not in s:
        assert segs == [s.encode()]


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=1000), max_size=30))
@settings(max_examples=100)
def test_md5_repr_spec(s):
    # the Python spec the SQL expression is golden-tested against
    from pyrdf2vec_spark.walks import _md5_repr
    r = _md5_repr(s, 8)
    assert r == str(hashlib.md5(s.encode()).digest()[:8])


# redact_pii spec mirror: the patterns are portable regex (same
# semantics in Java's engine and Python's re for these constructs), so
# the masking-chain invariants can be property-tested without a session
def _py_mask(text):
    import re

    from pyrdf2vec_spark.functions.text import _REDACT_PATTERNS

    for k, pat in _REDACT_PATTERNS.items():
        text = re.sub(pat, f"<{k.upper()}>", text)
    return text


_pii_atoms = st.sampled_from([
    "bob@example.com", "x.y+z@sub.dom.org", "https://ex.com/a?b=1&c=2",
    "http://localhost:8080/p", "+1 (555) 123-4567", "555-123-4567",
    "4111-1111-1111-1111", "4111 1111 1111 1111", "plain words",
    "numbers 42 here", "comma, dot.", "", "  ", "<URL>", "a@b", "5551234",
])


@given(st.lists(_pii_atoms, min_size=0, max_size=6))
@settings(max_examples=300)
def test_redact_masking_chain_idempotent(parts):
    text = " ".join(parts)
    once = _py_mask(text)
    assert _py_mask(once) == once  # placeholders are fixed points


@given(st.lists(_pii_atoms, min_size=0, max_size=6))
@settings(max_examples=300)
def test_redact_removes_every_span(parts):
    import re

    from pyrdf2vec_spark.functions.text import _REDACT_PATTERNS

    out = _py_mask(" ".join(parts))
    for pat in _REDACT_PATTERNS.values():
        assert re.search(pat, out) is None, (out, pat)
