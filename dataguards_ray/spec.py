"""FROZEN specification for the DataGuards-Ray quality-filter pipeline.

This module is the single source of truth for every constant, threshold,
regex (incl. order and flags), tokenizer, hash function and rule list that
the pipeline AND the scalar oracle (oracle/) both implement against
(SURVEY.md §2.5, §2.9).  Anything here is part of the byte-determinism
contract: changing a value changes golden labels, so tests assert this
file's SHA-256 (tests/test_spec_freeze.py).

Provenance: BASELINE.json:6/14/15 (rule list and scrub semantics); threshold
values follow Rae et al. 2021 (Gopher, App. A), Raffel et al. 2020 (C4 §2.2)
and Wenzek et al. 2020 (CCNet) as catalogued in SURVEY.md §2.9.  The
reference checkout is empty (SURVEY.md §0), so no reference file citations
exist; the spec below *is* the normative behavior.
"""

from __future__ import annotations

import re as _re

# --------------------------------------------------------------------------
# Languages
# --------------------------------------------------------------------------

LANGS: tuple[str, ...] = ("en", "de", "fr", "es", "zh")
ALLOWED_LANGS: frozenset[str] = frozenset(LANGS)

# --------------------------------------------------------------------------
# Hashing (all deterministic, process-independent — never Python hash())
# --------------------------------------------------------------------------

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
U64 = (1 << 64) - 1


def fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit hash. Used for part_id and deterministic sampling."""
    h = FNV_OFFSET
    for b in data:
        h = ((h ^ b) * FNV_PRIME) & U64
    return h


def part_id_of(url: str, num_parts: int) -> int:
    return fnv1a64(url.encode("utf-8")) % num_parts


# Char-n-gram feature hashing for langid (polynomial rolling hash).
LANGID_MAX_CHARS = 1000
LANGID_NGRAM_ORDERS = (1, 2, 3, 4)
LANGID_HASH_BASE = 0x100000001B3  # FNV prime reused as polynomial base
LANGID_DIM = 8192  # feature buckets

# --------------------------------------------------------------------------
# Tokenization (frozen — no ICU, no version-floating behavior)
# --------------------------------------------------------------------------

# LM / stopword / toxicity tokens: maximal runs of word characters.
# Engine frozen to stdlib `re` (sre): C-speed scans, stable semantics.
WORD_RE = _re.compile(r"\w+")

# Terminal-punctuation sentence boundary (C4 §2.2 style; incl. CJK 。！？).
SENTENCE_END_RE = _re.compile(r"[.!?…。！？](?=[\s\"')\]]|$)")

BULLET_PREFIXES: tuple[str, ...] = ("- ", "* ", "• ", "· ")
ELLIPSIS_SUFFIXES: tuple[str, ...] = ("…", "...")


def lm_tokens(text: str) -> list[str]:
    """Lowercased word tokens for LM scoring / stopword / badword counting."""
    return WORD_RE.findall(text.lower())


# --------------------------------------------------------------------------
# Quality-rule thresholds (§2.9 — canonical order = this list's order;
# drop_rule is the FIRST violated rule in this order)
# --------------------------------------------------------------------------

MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
# Gopher's mean-word-length gate is alphabetic-script-centric; zh tokens
# (pre-segmented words, 1-2 chars) are exempt (rule auto-passes, keyed on
# the pipeline's OWN lang_id, not the crawler hint).
MEAN_WORD_LEN_EXEMPT_LANGS = frozenset({"zh"})
MAX_SYMBOL_RATIO = 0.1
MAX_BULLET_RATIO = 0.90
MAX_ELLIPSIS_RATIO = 0.30
MIN_ALPHA_WORD_RATIO = 0.80
MIN_STOPWORD_HITS = 2
MIN_SENTENCES = 3
MAX_DUP_LINE_CHAR_FRAC = 0.30
MAX_TOP2GRAM_CHAR_FRAC = 0.20
# Calibrated once on seed=42 synthetic corpora (models/train_models.py):
# clean-doc score min ≈ 0.60, mixed-language max ≈ 0.45 → 0.52 separates.
MIN_LANG_SCORE = 0.52
MAX_TOX_RATIO = 0.02
MAX_PII_RATIO = 0.2

# Canonical rule order (SURVEY.md §2.9 table order).
RULE_ORDER: tuple[str, ...] = (
    "schema.valid",
    "len.word_count",
    "len.mean_word_len",
    "sym.hash_ellipsis",
    "line.bullet_ratio",
    "line.ellipsis_ratio",
    "word.alpha_ratio",
    "word.stopwords",
    "c4.min_sentences",
    "c4.bad_markers",
    "rep.dup_lines",
    "lang.confidence",
    "ppl.max",
    "tox.max_ratio",
    "pii.not_dominated",
)

BAD_MARKERS_LOWER: tuple[str, ...] = ("lorem ipsum", "javascript must be enabled")
BAD_MARKER_CHARS: tuple[str, ...] = ("{",)

# Per-language perplexity cutoffs (CCNet-style head/middle split).  Values
# frozen from a one-time calibration over clean seed=42 synthetic docs
# (models/calibrate_ppl.py); ~2/3 of clean docs pass.  DO NOT recompute.
PPL_THRESHOLDS: dict[str, float] = {
    "en": 178.6,
    "de": 172.0,
    "fr": 184.2,
    "es": 183.8,
    "zh": 173.3,
}
PPL_DEFAULT_THRESHOLD = 180.0  # lang_id outside table (defensive; unreachable)
PPL_EMPTY_DOC = 1.0e9  # perplexity assigned to docs with zero LM tokens

# --------------------------------------------------------------------------
# Stopwords (frozen per-language snapshots — subsets of common words)
# --------------------------------------------------------------------------

STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in a is that it was for on are with as his they at be "
        "this have from or by one had not but what all were when we there can".split()
    ),
    "de": frozenset(
        "der die das und in den von zu mit sich des auf ist im dem nicht ein "
        "eine als auch es an werden aus er hat dass sie nach wird bei um".split()
    ),
    "fr": frozenset(
        "de la le et les des en un du une que est pour qui dans a par plus "
        "pas au sur ne se ce il sont la mais avec son ses comme tout nous".split()
    ),
    "es": frozenset(
        "de la que el en y a los del se las por un para con no una su al es "
        "lo como mas pero sus le ya o este si porque esta entre cuando muy".split()
    ),
    "zh": frozenset(
        "的 了 和 是 在 我 有 他 这 中 大 来 上 国 个 到 说 们 为 子 和 你 "
        "地 出 道 也 时 年 得 就 那 要 下 以 生 会".split()
    ),
}

# --------------------------------------------------------------------------
# Toxicity wordlist (frozen in-repo snapshot; C4 §2.2 blocklist analog —
# deliberately mild/synthetic terms, sufficient for the density rule)
# --------------------------------------------------------------------------

BADWORDS: tuple[str, ...] = (
    "damn", "dammit", "hell", "crap", "idiot", "stupid", "moron", "jerk",
    "scum", "filth", "bastard", "loser", "trash", "garbage", "frakking",
    "shazbot", "dreck", "imbecile", "nitwit", "dolt",
)
BADWORDS_SET: frozenset[str] = frozenset(BADWORDS)

# --------------------------------------------------------------------------
# PII / toxicity scrub (§2.5) — ONE fused alternation, fixed order, V1 flags.
# Replacement tokens are pure functions of the matched category; the CARD
# category additionally requires a Luhn checksum pass (else text unchanged).
# --------------------------------------------------------------------------

SCRUB_TOKENS: dict[str, str] = {
    "EMAIL": "<EMAIL>",
    "IPV6": "<IP>",
    "IPV4": "<IP>",
    "CARD": "<ID>",
    "SSN": "<ID>",
    "IBAN": "<ID>",
    "PHONE": "<PHONE>",
    "TOX": "<TOX>",
}

# Category patterns, in frozen alternation order (leftmost-alternative wins
# at equal start position; scan is left-to-right non-overlapping).
_SCRUB_PARTS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("IPV6", r"\b(?:[0-9A-Fa-f]{1,4}:){3,7}[0-9A-Fa-f]{1,4}\b"),
    ("IPV4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("CARD", r"\b\d(?:[ \-]?\d){12,18}\b"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("IBAN", r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b"),
    (
        "PHONE",
        r"\+\d{1,3}[ .\-]?\(?\d{1,4}\)?(?:[ .\-]\d{2,4}){2,4}"
        r"|\(\d{3}\)[ .\-]?\d{3}[ .\-]\d{4}"
        r"|\b\d{3}[.\-]\d{3}[.\-]\d{4}\b",
    ),
    ("TOX", r"(?i:\b(?:" + "|".join(BADWORDS) + r")\b)"),
)

SCRUB_RE = _re.compile("|".join(f"(?P<{name}>{pat})" for name, pat in _SCRUB_PARTS))

PII_CATEGORIES: tuple[str, ...] = ("EMAIL", "IPV6", "IPV4", "CARD", "SSN", "IBAN", "PHONE")

# Fast-path trigger: every PII category requires a digit, '@' or ':'
# (EMAIL→@, IPV6→:, IPV4/CARD/SSN/IBAN/PHONE→digit), and TOX requires a
# badword substring.  A doc with neither cannot match SCRUB_RE at all,
# so skipping the full scan is byte-exact (asserted in tests).
_SCRUB_TRIGGER_RE = _re.compile(r"[0-9@:]")


def luhn_ok(digits: str) -> bool:
    """Luhn checksum over the digit characters of a candidate card number."""
    ds = [int(c) for c in digits if c.isdigit()]
    if not 13 <= len(ds) <= 19:
        return False
    total = 0
    for i, d in enumerate(reversed(ds)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def scrub_text(text: str) -> tuple[str, int, int]:
    """Apply the fused scrub scan.  Returns (scrubbed, pii_count, tox_count).

    Byte-deterministic: single left-to-right pass of SCRUB_RE; a CARD match
    failing Luhn is emitted unchanged (and not re-scanned).
    """
    if _SCRUB_TRIGGER_RE.search(text) is None:
        low = text.lower()
        if not any(w in low for w in BADWORDS):
            return text, 0, 0
    pii = 0
    tox = 0
    out: list[str] = []
    last = 0
    for m in SCRUB_RE.finditer(text):
        cat = m.lastgroup
        if cat == "CARD" and not luhn_ok(m.group()):
            continue  # leave bytes as-is
        out.append(text[last:m.start()])
        out.append(SCRUB_TOKENS[cat])
        last = m.end()
        if cat == "TOX":
            tox += 1
        else:
            pii += 1
    out.append(text[last:])
    return "".join(out), pii, tox


# --------------------------------------------------------------------------
# Perplexity model constants ([KENLM]/[CCNET]; Stupid Backoff, frozen)
# --------------------------------------------------------------------------

LM_ORDER = 3
LM_BACKOFF_ALPHA = 0.4
LM_UNK_ID = 0  # id 0 reserved for unknown words

# --------------------------------------------------------------------------
# Output partitioning
# --------------------------------------------------------------------------

DEFAULT_NUM_PARTS = 64
