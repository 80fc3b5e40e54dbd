"""Property / metamorphic tests (SURVEY §5.4) via hypothesis."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dataguards_ray import measures, spec, textproc

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_scrub_idempotent_and_deterministic(t):
    once = spec.scrub_text(t)
    assert spec.scrub_text(t) == once  # deterministic
    again, pii, tox = spec.scrub_text(once[0])
    assert again == once[0]  # idempotent bytes


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_normalize_idempotent(t):
    once = textproc.normalize_text_one(t)
    assert textproc.normalize_text_one(once) == once


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_measures_total_functions(t):
    """Measures are defined for arbitrary unicode and stay in range."""
    m = measures.doc_measures(t)
    for ratio in ("symbol_ratio", "bullet_ratio", "ellipsis_ratio",
                  "alpha_word_ratio", "dup_line_frac", "tox_ratio"):
        assert m[ratio] >= 0.0
    for frac in ("bullet_ratio", "ellipsis_ratio", "alpha_word_ratio",
                 "dup_line_frac"):
        assert m[frac] <= 1.0 + 1e-9
    assert m["word_count"] >= 0 and m["sentence_count"] >= 0


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=10**19))
def test_luhn_check_digit_roundtrip(n):
    digits = str(n).zfill(15)[:15]
    total = 0
    for i, c in enumerate(reversed(digits)):
        d = int(c)
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    full = digits + str((10 - total % 10) % 10)
    assert spec.luhn_ok(full)
    # flipping any digit breaks the checksum
    flipped = full[:-1] + str((int(full[-1]) + 1) % 10)
    assert not spec.luhn_ok(flipped)


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="ab cd", min_size=30, max_size=200),
       st.text(alphabet="ab cd", min_size=0, max_size=30))
def test_minhash_estimate_tracks_jaccard(base, suffix):
    """Estimated Jaccard from minhash signatures ≈ exact shingle Jaccard
    (±0.35 at 128 perms — coarse bound, catches broken hashing)."""
    from dataguards_ray.neardup import minhash_signature, ngram_jaccard

    a, b = base, base + suffix
    sa, sb = minhash_signature(a), minhash_signature(b)
    est = float((sa == sb).mean())
    exact = ngram_jaccard(a, b)
    assert abs(est - exact) <= 0.35


def test_langid_empty_and_whitespace():
    import numpy as np

    from dataguards_ray import langid

    W = langid.load_model()
    langs, scores = langid.score_batch(["", "   ", None], W)
    assert langs[0] == langid.UND and scores[0] == np.float32(0.0)
    assert langs[2] == langid.UND
