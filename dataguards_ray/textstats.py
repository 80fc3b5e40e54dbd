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


def md5_hex_column(col: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Vectorized md5 hexdigest of a string column (null → null) —
    bit-identical to the scalar ``md5_hex`` helper, but hashing Arrow
    buffer slices (hashutil.md5_digest_matrix): the exact-dedup and
    decontaminate fingerprint passes run with no per-row Python."""
    import pyarrow.compute as pc

    from .hashutil import md5_digest_matrix, md5_hex_array

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    hexes = md5_hex_array(md5_digest_matrix(col))
    if col.null_count:
        hexes = pc.if_else(col.is_valid(), hexes,
                           pa.scalar(None, pa.string()))
    return hexes


def add_fingerprint(ds: Dataset, col: str = "text", out: str = "fingerprint") -> Dataset:
    """MD5 content fingerprint (hex) — SQL-checkable (DuckDB md5())."""

    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column(out, md5_hex_column(batch.column(col)))

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


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets (Wenzek et al., LREC 2020 §4.3): split
# each language's corpus into head/middle/tail by perplexity tertiles.
# ---------------------------------------------------------------------------

#: fixed log10 histogram range for perplexity sketching: LM perplexities
#: live in [1, 1e6); the spec sentinel (1e9, unscored) is excluded
#: upstream.  A FIXED range needs no min/max pre-pass, so the sketch is
#: one thin streaming pass; quantile error is one log-bin
#: (multiplicative 10^(span/bins) ≈ 0.17% at 8192 bins).
_PPL_LOG_LO, _PPL_LOG_HI = 0.0, 6.0

_LANG_PPL_MODELS = None


def _score_lang_ppl(batch: pa.Table, text_col: str) -> "tuple[list, np.ndarray]":
    """(lang_id list, ppl float32 array) via the frozen model kernels
    (per-worker-process singletons, same contract as the flagship's
    fused annotate)."""
    global _LANG_PPL_MODELS
    if _LANG_PPL_MODELS is None:
        from . import langid as _lid
        from . import perplexity as _ppl

        _LANG_PPL_MODELS = (_lid.load_model(), _ppl.load_models())
    from . import langid as _lid
    from . import perplexity as _ppl

    W, lms = _LANG_PPL_MODELS
    texts = batch.column(text_col).to_pylist()
    langs, _scores = _lid.score_batch(texts, W)
    n = len(texts)
    ppl = np.full(n, spec.PPL_EMPTY_DOC, dtype=np.float32)
    by_lang: dict = {}
    for i, lg in enumerate(langs):
        if lg in lms:
            by_lang.setdefault(lg, []).append(i)
    for lg, idxs in by_lang.items():
        toks = [spec.lm_tokens(texts[i]) for i in idxs]
        ppl[np.array(idxs)] = _ppl.ppl_batch(toks, lms[lg])
    return langs, ppl


def ppl_bucket_tags(
    ds: Dataset,
    *,
    text_col: str = "text",
    lang_col: "str | None" = None,
    ppl_col: "str | None" = None,
    n_buckets: int = 8192,
    qs: "tuple[float, ...]" = (1 / 3, 2 / 3),
    labels: "tuple[str, ...]" = ("head", "middle", "tail"),
) -> Dataset:
    """+ ``ppl_bucket`` ∈ labels: CCNet corpus partitioning — per
    LANGUAGE, rank docs by perplexity and split at the ``qs`` quantiles
    (defaults: tertiles → head = cleanest third).  Unscored docs (no LM
    for the language / empty) get bucket 'und'.

    Scale shape: pass 1 streams thin pre-aggregated (lang, log-bin, n)
    histogram partials (≤ n_langs × n_buckets rows total — the fixed
    log range needs no min/max pre-pass); the driver merges them and
    broadcasts per-lang boundary perplexities; pass 2 tags each row.
    Nothing corpus-sized is pinned or driver-bound.  When ``lang_col``/
    ``ppl_col`` name existing columns (e.g. the flagship's annotated
    output) both passes are model-free; otherwise each pass scores with
    the frozen langid/LM kernels (compute traded for zero pins, like
    span dedup's streaming discovery).  Deterministic and
    partition-invariant; boundaries use upper-bin-edge (quantile_disc
    ≤-rank) semantics, so bucket proportions are exact to one log-bin.
    """
    import ray

    from .steps.dedup import get_broadcast

    have_cols = lang_col is not None and ppl_col is not None
    width = (_PPL_LOG_HI - _PPL_LOG_LO) / n_buckets

    def lang_ppl(batch: pa.Table) -> "tuple[list, np.ndarray]":
        if have_cols:
            langs = batch.column(lang_col).to_pylist()
            ppl = batch.column(ppl_col).to_numpy(zero_copy_only=False).astype(
                np.float64)
            return langs, ppl
        return _score_lang_ppl(batch, text_col)

    def partials(batch: pa.Table) -> pa.Table:
        langs, ppl = lang_ppl(batch)
        scored = ppl < spec.PPL_EMPTY_DOC
        lg = np.asarray(langs, dtype=object)[scored]
        lp = np.log10(np.clip(ppl[scored], 1.0, None))
        bins = np.clip(((lp - _PPL_LOG_LO) / width).astype(np.int64),
                       0, n_buckets - 1)
        if len(lg) == 0:
            return pa.table({"lang": pa.array([], type=pa.string()),
                             "bin": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        key = pa.table({"lang": pa.array(list(lg), type=pa.string()),
                        "bin": pa.array(bins, type=pa.int64())})
        g = key.group_by(["lang", "bin"]).aggregate([("bin", "count")])
        return g.rename_columns(["lang", "bin", "n"])

    from .aggregates import _fallback_group_merge, driver_merge_or_none

    # partial ROWS scale with batch count (≤ langs × n_buckets per
    # batch); only the MERGED result is bounded — merge on the driver
    # under the generic cap, else one distributed groupby of thin
    # partials (same shape as sample_by_token_budget's merge)
    table, mat = driver_merge_or_none(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["lang", "bin"], [("n", "sum", "n")],
    )
    if table is None:
        merged = _fallback_group_merge(
            mat, ["lang", "bin"], [("n", "sum", "n")]).take_all()
        table = pa.table({
            "lang": pa.array([r["lang"] for r in merged], type=pa.string()),
            "bin": pa.array([r["bin"] for r in merged], type=pa.int64()),
            "n": pa.array([r["n"] for r in merged], type=pa.int64()),
        })

    bounds: dict[str, list[float]] = {}
    if table.num_rows:
        import pandas as pd

        df = table.to_pandas()
        for lg, grp in df.groupby("lang"):
            grp = grp.sort_values("bin")
            cum = grp["n"].cumsum().to_numpy()
            total = int(cum[-1])
            edges = []
            for q in qs:
                k = int(np.ceil(q * total))
                i = int(np.searchsorted(cum, k, side="left"))
                b = int(grp["bin"].to_numpy()[min(i, len(cum) - 1)])
                edges.append(10 ** (_PPL_LOG_LO + (b + 1) * width))
            bounds[str(lg)] = edges
    ref = ray.put(bounds)

    def tag(batch: pa.Table) -> pa.Table:
        bd = get_broadcast(ref)
        langs, ppl = lang_ppl(batch)
        out = []
        for lg, p in zip(langs, ppl):
            e = bd.get(lg)
            if e is None or p >= spec.PPL_EMPTY_DOC:
                out.append("und")
                continue
            i = int(np.searchsorted(np.asarray(e), p, side="left"))
            out.append(labels[min(i, len(labels) - 1)])
        cols = {name: batch.column(name) for name in batch.schema.names}
        if not have_cols:
            cols["lang_id"] = pa.array(langs, type=pa.string())
            cols["ppl"] = pa.array(np.asarray(ppl, dtype=np.float32),
                                   type=pa.float32())
        cols["ppl_bucket"] = pa.array(out, type=pa.string())
        return pa.table(cols)

    return ds.map_batches(tag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Benchmark decontamination (GPT-3 Appendix C / PaLM-style): remove or
# flag training docs sharing any n-token n-gram with an eval benchmark.
# ---------------------------------------------------------------------------

_DECON_B = np.uint64(1099511628211)  # FNV prime as the poly base


def _token_ngram_hashes(text: "str | None", n: int) -> np.ndarray:
    """uint64 hashes of every n-token window (frozen tokenizer
    spec.lm_tokens, FNV-1a per token, polynomial combine).  Empty for
    docs with < n tokens."""
    toks = spec.lm_tokens(text or "")
    if len(toks) < n:
        return np.zeros(0, dtype=np.uint64)
    th = np.fromiter((spec.fnv1a64(t.encode()) for t in toks),
                     dtype=np.uint64, count=len(toks))
    m = len(th) - n + 1
    with np.errstate(over="ignore"):
        h = np.zeros(m, dtype=np.uint64)
        for j in range(n):
            h = h * _DECON_B + th[j:m + j]
    return h


def decontaminate(
    docs: Dataset,
    benchmark: Dataset,
    *,
    text_col: str = "text",
    bench_col: str = "text",
    n: int = 13,
    mode: str = "flag",
    max_bench_ngrams: int = 50_000_000,
) -> Dataset:
    """Benchmark decontamination: a training doc is CONTAMINATED iff it
    shares at least one n-token n-gram (frozen spec.lm_tokens tokens,
    so casing/punctuation differences don't mask overlap) with any
    benchmark doc — the GPT-3 (arXiv:2005.14165 App. C) / PaLM 13-gram
    rule.  ``mode="flag"`` appends (contaminated bool, n_contaminated
    int64 = matching windows); ``mode="drop"`` filters contaminated
    docs out.

    Scale shape: the benchmark side is the SMALL side by definition
    (eval sets, not corpora) — its distinct n-gram hashes are collected
    once (vectorized per-batch partial dedup, driver union capped at
    ``max_bench_ngrams`` ≈ 400 MB, assert above) and broadcast via
    ``ray.put``; the corpus side is one streaming map_batches doing a
    sorted-array membership probe (searchsorted) per doc.  No shuffle,
    nothing corpus-sized anywhere.  Hash collisions (FNV64 poly) are
    ~2⁻⁶⁴ per (window, benchmark) pair — the standard trade for not
    shipping the benchmark text itself."""
    import ray

    from .steps.dedup import get_broadcast

    if mode not in ("flag", "drop"):
        raise ValueError(f"mode {mode!r}: use 'flag' or 'drop'")

    def bench_partial(b: pa.Table) -> pa.Table:
        hs = [_token_ngram_hashes(t, n)
              for t in b.column(bench_col).to_pylist()]
        u = (np.unique(np.concatenate(hs)) if hs
             else np.zeros(0, dtype=np.uint64))
        return pa.table({"h": pa.array(u, type=pa.uint64())})

    # streaming pull with EARLY abort: the cap must bound what reaches
    # the driver, not just what survives afterwards (a corpus passed as
    # 'benchmark' by mistake aborts after one over-cap batch)
    chunks: "list[np.ndarray]" = []
    pulled = 0
    for b in benchmark.map_batches(
            bench_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        h = b.column("h").to_numpy(zero_copy_only=False)
        pulled += len(h)
        if pulled > 2 * max_bench_ngrams:
            raise ValueError(
                f"benchmark n-gram pull exceeded {2 * max_bench_ngrams} "
                "rows; is the 'benchmark' side actually a corpus?")
        chunks.append(h)
    bench_hashes = (np.unique(np.concatenate(chunks)) if chunks
                    else np.zeros(0, dtype=np.uint64))
    if len(bench_hashes) > max_bench_ngrams:
        raise ValueError(
            f"benchmark has {len(bench_hashes)} distinct {n}-gram hashes "
            f"> max_bench_ngrams={max_bench_ngrams}; is the 'benchmark' "
            "side actually a corpus?")
    ref = ray.put(bench_hashes)  # sorted by np.unique

    def probe(b: pa.Table) -> pa.Table:
        bh = get_broadcast(ref)
        n_hit = np.zeros(b.num_rows, dtype=np.int64)
        if len(bh):
            for i, t in enumerate(b.column(text_col).to_pylist()):
                h = _token_ngram_hashes(t, n)
                if len(h):
                    idx = np.searchsorted(bh, h)
                    idx[idx == len(bh)] = 0
                    n_hit[i] = int((bh[idx] == h).sum())
        if mode == "drop":
            return b.filter(pa.array(n_hit == 0))
        return b.append_column(
            "contaminated", pa.array(n_hit > 0)
        ).append_column("n_contaminated", pa.array(n_hit, type=pa.int64()))

    return docs.map_batches(probe, batch_format="pyarrow")
