"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over hashed n-gram features, Ray-Data-native.

Given a RAW corpus and a small TARGET corpus (the domain you want more
of — e.g. curated wiki/books text), fit two bag-of-hashed-n-gram
categorical distributions p_target and p_raw, score every raw doc with
the importance log-weight  log w(x) = Σ_f count_f(x)·(log p_t[f] −
log p_r[f]),  then resample k docs with deterministic Gumbel-top-k
(sampling without replacement proportional to w, Vieira 2014).

Feature space (paper §3.1): unigrams + bigrams of the frozen
``spec.lm_tokens`` word tokens, hashed into ``n_buckets`` (default
10 000, the paper's setting) by FNV-1a-64 with a polynomial bigram
combine; add-1 (Laplace) smoothing on both distributions.

Scale shape (100 TB):
- Fitting each distribution is a streaming ``map_batches`` emitting
  SPARSE (bucket, n) partials — per-batch rows ≤ n_buckets, DISTINCT
  keys globally ≤ n_buckets — merged by ``driver_merge_or_none``
  (driver Arrow merge under the partial-row cap, distributed thin
  groupby above it).  The driver holds two float64[n_buckets] vectors
  (~80 KB each) regardless of corpus size.
- The log-ratio vector broadcasts ONCE via ``ray.put``; scoring is one
  streaming map_batches (no shuffle, nothing corpus-sized anywhere).
- ``dsir_resample`` selects via the existing top-k partial machinery
  (per-batch top-k → final merge): driver sees k rows, not the corpus.

Determinism: per-doc weights are float64 sums over the doc's features
in token order (bit-identical across any parallelism — per-doc work is
order-free of batching); Gumbel noise is a pure function of
(seed, md5(text), id), so the selected set is parallelism-invariant
and reproducible.  Verified bit-exact against the scalar oracle in
tests/test_dsir.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from . import spec

FNV_PRIME = np.uint64(0x100000001B3)
FNV_OFFSET = np.uint64(0xCBF29CE484222325)
DSIR_BUCKETS = 10_000  # paper's hashed feature dimension


def _token_hashes(text: "str | None") -> np.ndarray:
    """uint64 FNV-1a hash per frozen lm_token (scalar reference path)."""
    toks = spec.lm_tokens(text or "")
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    return np.fromiter((spec.fnv1a64(t.encode("utf-8")) for t in toks),
                       dtype=np.uint64, count=len(toks))


def feature_buckets(text: "str | None", n_buckets: int) -> np.ndarray:
    """Hashed unigram+bigram feature bucket per occurrence (int64),
    in token order: all unigrams, then all bigrams.  Scalar reference
    path — the batch stages use ``batch_feature_buckets`` (bit-identical,
    tested)."""
    th = _token_hashes(text)
    if not len(th):
        return np.zeros(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        uni = th
        bi = th[:-1] * FNV_PRIME + th[1:]
    feats = np.concatenate([uni, bi]) if len(th) > 1 else uni
    return (feats % np.uint64(n_buckets)).astype(np.int64)


def batch_feature_buckets(texts, n_buckets: int) -> "list[np.ndarray]":
    """Per-doc feature-bucket arrays for a whole batch with NO
    per-byte Python hashing: tokenize per doc (C-speed regex), hash
    every token of the batch in one vectorized ``fnv1a64_array`` pass
    (hashutil's fused per-byte-position numpy kernel), then slice per
    doc.  Bit-identical to ``feature_buckets`` per doc (same token
    order, same uint64 wraparound — tested)."""
    from .hashutil import fnv1a64_array

    toks = [spec.lm_tokens(t or "") for t in texts]
    lens = np.fromiter((len(x) for x in toks), dtype=np.int64,
                       count=len(toks))
    flat = [w for tk in toks for w in tk]
    empty = np.zeros(0, dtype=np.int64)
    if not flat:
        return [empty] * len(toks)
    th = fnv1a64_array(pa.array(flat, type=pa.string()))
    offs = np.zeros(len(toks) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    B = np.uint64(n_buckets)
    out = []
    with np.errstate(over="ignore"):
        for i in range(len(toks)):
            h = th[offs[i]:offs[i + 1]]
            if not len(h):
                out.append(empty)
                continue
            feats = (np.concatenate([h, h[:-1] * FNV_PRIME + h[1:]])
                     if len(h) > 1 else h)
            out.append((feats % B).astype(np.int64))
    return out


def fit_hashed_ngram_dist(
    ds: Dataset,
    *,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> np.ndarray:
    """Laplace-smoothed categorical distribution over hashed n-gram
    buckets: float64[n_buckets], p[b] = (count[b]+1) / (total+n_buckets).
    Streaming sparse partials; the driver only ever holds ≤ n_buckets
    merged rows (see module docstring for the 100 TB shape)."""
    from .aggregates import _fallback_group_merge, driver_merge_or_none

    def partials(b: pa.Table) -> pa.Table:
        fbs = batch_feature_buckets(b.column(text_col).to_pylist(),
                                    n_buckets)
        allb = np.concatenate(fbs) if fbs else np.zeros(0, dtype=np.int64)
        cnt = np.bincount(allb, minlength=n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz, type=pa.int64()),
                         "n": pa.array(cnt[nz], type=pa.int64())})

    table, mat = driver_merge_or_none(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["bucket"], [("n", "sum", "n")],
    )
    if table is None:  # distinct keys ≤ n_buckets, so this stays thin
        merged = _fallback_group_merge(mat, ["bucket"],
                                       [("n", "sum", "n")]).take_all()
        buckets = np.asarray([r["bucket"] for r in merged], dtype=np.int64)
        ns = np.asarray([r["n"] for r in merged], dtype=np.int64)
    else:
        # astype: a ZERO-chunk Arrow int64 column comes back as an empty
        # float64 ndarray, which numpy rejects as a fancy index (empty
        # corpus found by CLI probing)
        buckets = table.column("bucket").to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        ns = table.column("n").to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
    cnt = np.zeros(n_buckets, dtype=np.int64)
    cnt[buckets] = ns
    return (cnt + 1.0) / float(cnt.sum() + n_buckets)


def dsir_log_weights(
    docs: Dataset,
    target: Dataset,
    *,
    text_col: str = "text",
    target_text_col: "str | None" = None,
    n_buckets: int = DSIR_BUCKETS,
    out: str = "dsir_logw",
) -> Dataset:
    """Append the DSIR importance log-weight column ``out`` (float64):
    log p_target(x) − log p_raw(x) under the two hashed-n-gram bag
    models.  Docs with no tokens (or NULL text) get weight 0.0 (equal
    mass under both models).  p_raw is fitted on ``docs`` itself."""
    import ray

    from .steps.dedup import get_broadcast

    p_t = fit_hashed_ngram_dist(
        target, text_col=target_text_col or text_col, n_buckets=n_buckets)
    p_r = fit_hashed_ngram_dist(docs, text_col=text_col, n_buckets=n_buckets)
    ref = ray.put(np.log(p_t) - np.log(p_r))  # float64[n_buckets], ~80 KB

    def score(b: pa.Table) -> pa.Table:
        lr = get_broadcast(ref)
        fbs = batch_feature_buckets(b.column(text_col).to_pylist(),
                                    n_buckets)
        # per-doc np pairwise sum over the doc's own feature array —
        # the reduction the scalar oracle pins bit-exactly
        w = np.fromiter(
            (float(lr[fb].sum()) if len(fb) else 0.0 for fb in fbs),
            dtype=np.float64, count=b.num_rows)
        return b.append_column(out, pa.array(w, type=pa.float64()))

    return docs.map_batches(score, batch_format="pyarrow")


def gumbel_key(text: "str | None", doc_id, seed: int) -> float:
    """Deterministic per-doc Gumbel(0,1) noise: a pure function of
    (seed, md5(text), id) — parallelism-invariant, reproducible."""
    payload = f"{seed}|{hashlib.md5((text or '').encode('utf-8')).hexdigest()}|{doc_id}"
    u = (spec.fnv1a64(payload.encode("utf-8")) + 1) / 18446744073709551618.0
    return float(-np.log(-np.log(u)))


def dsir_resample(
    docs: Dataset,
    target: Dataset,
    k: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_text_col: "str | None" = None,
    n_buckets: int = DSIR_BUCKETS,
    seed: int = 0,
) -> Dataset:
    """Select k docs by Gumbel-top-k over the DSIR log-weights —
    sampling WITHOUT replacement with P(x) ∝ w(x) (Vieira 2014),
    deterministic given ``seed``.  Returns the selected rows with the
    ``dsir_logw`` and ``dsir_key`` columns appended, exactly k rows
    (fewer iff the corpus is smaller).  Driver sees k rows only."""
    from .aggregates import topk

    scored = dsir_log_weights(
        docs, target, text_col=text_col,
        target_text_col=target_text_col, n_buckets=n_buckets)

    def add_key(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .hashutil import (fnv1a64_array, md5_digest_matrix,
                               md5_hex_array)

        w = b.column("dsir_logw").to_numpy(zero_copy_only=False)
        idt = b.schema.field(id_col).type
        idc = b.column(id_col)
        vec_ids = (pa.types.is_integer(idt) or pa.types.is_string(idt)
                   or pa.types.is_large_string(idt)) and idc.null_count == 0
        if vec_ids:
            # vectorized gumbel_key, bit-identical to the scalar
            # expression: Arrow payload build + FNV kernel; the +1 is
            # applied in uint64 BEFORE the float conversion (float(h)+1
            # ≠ float(h+1) near 2**64)
            col = b.column(text_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            hexes = md5_hex_array(md5_digest_matrix(col))
            payload = pc.binary_join_element_wise(
                pa.array([str(seed)] * b.num_rows, type=pa.string()),
                hexes, pc.cast(idc, pa.string()), "|")
            h = fnv1a64_array(payload)
            with np.errstate(over="ignore"):
                hu = h + np.uint64(1)
            f = hu.astype(np.float64)
            f[hu == 0] = 18446744073709551616.0  # h = 2**64-1 wrapped
            g = -np.log(-np.log(f / 18446744073709551618.0))
        else:  # exotic/null ids: the frozen scalar path
            texts = b.column(text_col).to_pylist()
            ids = idc.to_pylist()
            g = np.fromiter(
                (gumbel_key(t, i, seed) for t, i in zip(texts, ids)),
                dtype=np.float64, count=b.num_rows)
        return b.append_column("dsir_key", pa.array(w + g, type=pa.float64()))

    keyed = scored.map_batches(add_key, batch_format="pyarrow")
    return topk(keyed, [("dsir_key", True), (id_col, False)], k)
