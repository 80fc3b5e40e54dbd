"""Frozen per-document quality measurements + §2.9 rule evaluation.

Semantics follow Gopher (Rae et al. 2021, App. A), C4 (Raffel et al.
2020 §2.2) and CCNet (Wenzek et al. 2020) as catalogued in SURVEY.md
§2.9.  This module is shared by the vectorized Ray stages AND the scalar
oracle — the *orchestration* (batching, shuffles, dedup, stats, resume)
is what the two-implementation strategy (SURVEY.md §5.1) tests
independently; the per-doc measure/rule semantics are deliberately a
single frozen implementation so they cannot drift.

Per-doc cost is one compiled-regex tokenization plus counter passes —
C-speed scans; the Ray quality stage loops docs inside a batch (strings
are Python objects; there is no meaningful vectorization for these
mixed regex/counter measures) and returns numpy arrays to Arrow.
"""

from __future__ import annotations

from collections import Counter

import re as _re

from . import spec

ELLIPSIS_RE = _re.compile(r"\.\.\.|…")

# Union of all languages' stopword sets (language-independent hit count —
# the stopword gate runs before language ID is trusted).
_STOP_UNION: frozenset[str] = frozenset().union(*spec.STOPWORDS.values())

MEASURE_FIELDS: tuple[str, ...] = (
    "word_count",
    "mean_word_len",
    "symbol_ratio",
    "bullet_ratio",
    "ellipsis_ratio",
    "alpha_word_ratio",
    "stopword_hits",
    "sentence_count",
    "dup_line_frac",
    "top2gram_frac",
    "tox_ratio",
)


def _word_has_alpha(w: str) -> bool:
    # fast paths are C-level; the genexpr handles mixed words only
    if w.isalpha():
        return True
    if w.isdigit():
        return False
    return any(c.isalpha() for c in w)


def doc_measures(text: str) -> dict:
    """All row-local quality measures of a (normalized, pre-scrub) doc."""
    words = spec.WORD_RE.findall(text)
    wc = len(words)
    wc1 = max(wc, 1)
    char_sum = sum(map(len, words))
    mean_len = char_sum / wc if wc else 0.0

    n_sym = text.count("#") + len(ELLIPSIS_RE.findall(text))

    lines = [ln for ln in text.split("\n") if ln]
    n_lines = max(len(lines), 1)
    n_bullet = sum(1 for ln in lines if ln.startswith(spec.BULLET_PREFIXES))
    n_ell_end = sum(1 for ln in lines if ln.endswith(spec.ELLIPSIS_SUFFIXES))

    n_alpha_words = sum(map(_word_has_alpha, words))

    # frozen definition: lowered tokens = tokenization of text.lower()
    # (one C-level lower of the whole doc instead of one per word)
    lowered = spec.WORD_RE.findall(text.lower())
    stop_hits = sum(map(_STOP_UNION.__contains__, lowered))
    tox_hits = sum(map(spec.BADWORDS_SET.__contains__, lowered))

    n_sent = len(spec.SENTENCE_END_RE.findall(text))

    # duplicate-line char fraction: chars in occurrences beyond the first
    line_chars = sum(len(ln) for ln in lines)
    seen: Counter[str] = Counter(lines)
    dup_chars = sum(len(ln) * (k - 1) for ln, k in seen.items() if k > 1)
    dup_frac = dup_chars / line_chars if line_chars else 0.0

    # most frequent word 2-gram char fraction
    top2 = 0.0
    if wc >= 2 and char_sum:
        grams: Counter[tuple[str, str]] = Counter(zip(lowered, lowered[1:]))
        (g, k) = max(grams.items(), key=lambda kv: (kv[1], kv[0]))
        if k > 1:
            top2 = k * (len(g[0]) + len(g[1])) / char_sum

    return {
        "word_count": wc,
        "mean_word_len": mean_len,
        "symbol_ratio": n_sym / wc1,
        "bullet_ratio": n_bullet / n_lines,
        "ellipsis_ratio": n_ell_end / n_lines,
        "alpha_word_ratio": n_alpha_words / wc1,
        "stopword_hits": stop_hits,
        "sentence_count": n_sent,
        "dup_line_frac": dup_frac,
        "top2gram_frac": top2,
        "tox_ratio": tox_hits / wc1,
    }


def has_bad_marker(text: str) -> bool:
    low = text.lower()
    return any(m in low for m in spec.BAD_MARKERS_LOWER) or any(
        c in text for c in spec.BAD_MARKER_CHARS
    )


def evaluate_rules(
    m: dict,
    *,
    valid: bool,
    bad_marker: bool,
    lang_id: str,
    lang_score: float,
    ppl: float,
    pii_count: int,
) -> list[str]:
    """All violated §2.9 rules in canonical spec.RULE_ORDER."""
    wc1 = max(m["word_count"], 1)
    checks = {
        "schema.valid": valid,
        "len.word_count": spec.MIN_WORDS <= m["word_count"] <= spec.MAX_WORDS,
        "len.mean_word_len": (
            lang_id in spec.MEAN_WORD_LEN_EXEMPT_LANGS
            or spec.MIN_MEAN_WORD_LEN <= m["mean_word_len"] <= spec.MAX_MEAN_WORD_LEN
        ),
        "sym.hash_ellipsis": m["symbol_ratio"] <= spec.MAX_SYMBOL_RATIO,
        "line.bullet_ratio": m["bullet_ratio"] <= spec.MAX_BULLET_RATIO,
        "line.ellipsis_ratio": m["ellipsis_ratio"] <= spec.MAX_ELLIPSIS_RATIO,
        "word.alpha_ratio": m["alpha_word_ratio"] >= spec.MIN_ALPHA_WORD_RATIO,
        "word.stopwords": m["stopword_hits"] >= spec.MIN_STOPWORD_HITS,
        "c4.min_sentences": m["sentence_count"] >= spec.MIN_SENTENCES,
        "c4.bad_markers": not bad_marker,
        "rep.dup_lines": (
            m["dup_line_frac"] <= spec.MAX_DUP_LINE_CHAR_FRAC
            and m["top2gram_frac"] <= spec.MAX_TOP2GRAM_CHAR_FRAC
        ),
        "lang.confidence": (
            lang_score >= spec.MIN_LANG_SCORE and lang_id in spec.ALLOWED_LANGS
        ),
        "ppl.max": ppl <= spec.PPL_THRESHOLDS.get(lang_id, spec.PPL_DEFAULT_THRESHOLD),
        "tox.max_ratio": m["tox_ratio"] <= spec.MAX_TOX_RATIO,
        "pii.not_dominated": pii_count / wc1 <= spec.MAX_PII_RATIO,
    }
    return [r for r in spec.RULE_ORDER if not checks[r]]
