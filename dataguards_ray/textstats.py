"""Text-analysis operators for training-data pipelines (task brief):
token counting, quality scoring, document fingerprinting, heuristic
language guessing — all over the ``documents`` test table or any text
column.

Token semantics note: these SQL-checkable operators use pyarrow's RE2
``\\w`` (ASCII word chars), matching DuckDB's RE2 — deliberately distinct
from the flagship's frozen Python-regex Unicode tokenizer (spec.lm_tokens).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from . import spec

WORD_RE2 = r"\w+"
CHAR_RE2 = r"\w"


def add_token_count(ds: Dataset, col: str = "text", out: str = "n_tokens") -> Dataset:
    """Vectorized RE2 token count (zero-copy Arrow kernel)."""

    def f(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column(col), WORD_RE2)
        return batch.append_column(out, pc.cast(n, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def add_quality_scores(ds: Dataset, col: str = "text") -> Dataset:
    """Length/word-shape quality measures, fully vectorized:
    n_tokens, word_chars, mean_word_len, upper_ratio."""

    def f(batch: pa.Table) -> pa.Table:
        c = batch.column(col)
        n_tok = pc.cast(pc.count_substring_regex(c, WORD_RE2), pa.int64())
        n_wchar = pc.cast(pc.count_substring_regex(c, CHAR_RE2), pa.int64())
        denom = pc.max_element_wise(n_tok, 1)
        mean_len = pc.divide(pc.cast(n_wchar, pa.float64()), pc.cast(denom, pa.float64()))
        return (
            batch.append_column("n_tokens", n_tok)
            .append_column("word_chars", n_wchar)
            .append_column("mean_word_len", mean_len)
        )

    return ds.map_batches(f, batch_format="pyarrow")


def md5_hex(texts) -> list:
    """Per-text MD5 hex (None-safe) — THE content-fingerprint kernel.
    Single definition shared by add_fingerprint and the exact-dedup
    loser flag so the two passes can never silently diverge."""
    return [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
        for t in texts
    ]


def add_fingerprint(ds: Dataset, col: str = "text", out: str = "fingerprint") -> Dataset:
    """MD5 content fingerprint (hex) — SQL-checkable (DuckDB md5())."""

    def f(batch: pa.Table) -> pa.Table:
        fps = md5_hex(batch.column(col).to_pylist())
        return batch.append_column(out, pa.array(fps, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def add_rolling_fingerprints(
    ds: Dataset, col: str = "text", out: str = "shingle_min", k: int = 16
) -> Dataset:
    """Rolling-hash document fingerprint: min FNV-ish hash over all
    k-char shingles (a 1-perm minhash; deterministic)."""

    def f(batch: pa.Table) -> pa.Table:
        outs = []
        for t in batch.column(col).to_pylist():
            if not t or len(t) < k:
                outs.append(0)
                continue
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
            with np.errstate(over="ignore"):
                h = np.zeros(len(cp) - k + 1, dtype=np.uint64)
                for j in range(k):
                    h = h * np.uint64(spec.LANGID_HASH_BASE) + (cp[j : len(cp) - k + 1 + j] + np.uint64(1))
            outs.append(int(h.min()))
        return batch.append_column(out, pa.array(outs, type=pa.uint64()))

    return ds.map_batches(f, batch_format="pyarrow")


def add_lang_guess(ds: Dataset, col: str = "text", out: str = "lang_guess") -> Dataset:
    """Heuristic stopword-vote language guess (n-gram-free fallback;
    the real model is langid.py).  Ties → first language in spec.LANGS."""
    stops = {lg: spec.STOPWORDS[lg] for lg in spec.LANGS}

    def f(batch: pa.Table) -> pa.Table:
        guesses = []
        for t in batch.column(col).to_pylist():
            toks = spec.lm_tokens(t or "")
            best, best_n = "und", 0
            for lg in spec.LANGS:
                n = sum(1 for w in toks if w in stops[lg])
                if n > best_n:
                    best, best_n = lg, n
            guesses.append(best)
        return batch.append_column(out, pa.array(guesses, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def compression_ratios(
    ds, *, text_col: str = "text", id_col: str = "doc_id", level: int = 6,
):
    """Gopher/MassiveText-style repetition signal: zlib(level)-compressed
    size over raw UTF-8 size per doc.  Boilerplate/template pages
    compress far below prose (~0.3 vs ~0.6) — a standard web-filter
    gate.  Deterministic (zlib output is stable for fixed level/input);
    per-doc loop is C-speed zlib, same cost class as the fingerprint
    pass.  Empty docs get a NULL ratio."""
    import zlib

    import pyarrow as pa

    def f(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column(text_col).to_pylist():
            raw = (t or "").encode("utf-8")
            out.append(len(zlib.compress(raw, level)) / len(raw)
                       if raw else None)
        return pa.table(
            {id_col: batch.column(id_col),
             "compression_ratio": pa.array(out, type=pa.float64())}
        )

    return ds.map_batches(f, batch_format="pyarrow")
