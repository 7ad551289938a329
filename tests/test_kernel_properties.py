"""Property-based invariants of the parity kernels (pure Python, fast)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from corpus_dedup_spark import kernel

any_bytes = st.binary(max_size=400)
texty = st.text(max_size=300).map(lambda s: s.encode("utf-8"))


@given(any_bytes)
@settings(max_examples=300)
def test_squash_preserves_length_and_kills_newlines(data):
    out = kernel.squash_newlines(data)
    assert len(out) == len(data)
    assert b"\n" not in out and b"\r" not in out


@given(any_bytes)
@settings(max_examples=300)
def test_sentence_spans_are_disjoint_ordered_in_bounds(data):
    sq = kernel.squash_newlines(data)
    spans = kernel.split_sentences(sq)
    prev_end = 0
    for start, ln in spans:
        assert ln > 0
        assert 0 <= start and start + ln <= len(sq)
        assert start >= prev_end  # ordered, non-overlapping
        prev_end = start + ln


@given(any_bytes)
@settings(max_examples=300)
def test_spans_cover_all_non_whitespace(data):
    """Every byte > 0x20 (and every non-whitespace codepoint) lands in some span —
    the splitter never drops content, only inter-sentence whitespace."""
    sq = kernel.squash_newlines(data)
    spans = kernel.split_sentences(sq)
    covered = bytearray(len(sq))
    for s, ln in spans:
        covered[s:s + ln] = b"\x01" * ln
    for i, b in enumerate(sq):
        if b > 0x20 and b < 0x80:
            assert covered[i], (i, sq)


@given(any_bytes)
@settings(max_examples=300)
def test_normalize_idempotent_and_bounded(data):
    once = kernel.normalize_unit(data)
    assert kernel.normalize_unit(once) == once
    assert len(once) <= len(data)
    if once:
        assert once[0] > 0x20 and once[-1] > 0x20
        assert b"  " not in once


@given(any_bytes, st.integers(min_value=1, max_value=50))
@settings(max_examples=200)
def test_truncation_is_prefix(data, maxlen):
    full = kernel.normalize_unit(data)
    cut = kernel.normalize_unit(data, max_length=maxlen)
    assert cut == full[:maxlen]


@given(texty)
@settings(max_examples=200)
def test_extract_units_deterministic_and_normalized(data):
    a = kernel.extract_units(data)
    b = kernel.extract_units(data)
    assert a == b
    for u in a:
        assert u == kernel.normalize_unit(u)  # already normalized
        assert u != b""


@given(st.lists(st.binary(max_size=60), max_size=30))
@settings(max_examples=150)
def test_fnv_vectorized_matches_scalar(units):
    vec = kernel.fnv1a_many(units)
    assert [int(v) for v in vec] == [kernel.fnv1a(u) for u in units]


@given(texty, st.integers(min_value=0, max_value=200), st.integers(min_value=0, max_value=200))
@settings(max_examples=150)
def test_window_hash_equals_direct_horner(data, a, b):
    cps = kernel.utf8_decode_buffer(data)
    n = len(cps)
    if n == 0:
        return
    s, e = sorted((a % (n + 1), b % (n + 1)))
    prefix, pow_ = kernel.rolling_prefix(cps, kernel.BLOCK_HASH_BASE)
    direct = 0
    for c in cps[s:e]:
        direct = (direct * 31 + int(c)) % (1 << 64)
    assert kernel.window_hash(prefix, pow_, s, e) == direct
