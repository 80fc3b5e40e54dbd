"""C4-style duplicated-span dedup (task brief "deduplication";
C4 / T5 paper §2.2: "we removed any duplicated three-sentence span,
keeping one occurrence") + RefinedWeb-style exact line dedup.

Pipeline shape (three thin stages, adaptively shuffle-free):

1. ``map_batches`` per doc: split text into SEGMENTS (sentence segments
   at the frozen spec boundary, or lines — both concatenate back to the
   exact original text), slide an ``n_sent``-segment window, hash each
   window's NORMALIZED form (lowercased, whitespace-collapsed —
   formatting noise must not hide a duplicate).  Emits thin occurrence
   rows (h, doc_id, start).
2. Winner resolution: the global FIRST occurrence of each span hash
   (min (doc_id, start), encoded as an order-preserving rank string)
   wins; every other occurrence is a LOSER.  Fast path: per-batch
   (h, min-rank, count) partials driver-merge in Arrow C++ under
   ``max_driver_winners`` rows, the CONTESTED winner keys (only hashes
   seen ≥2×, typically a tiny fraction) broadcast, and losers fall out
   of one vectorized ``pc.is_in`` filter — no per-group Python over
   corpus-sized tiny groups (measured 10× on 100k spans).  Above the
   cap: ``groupby(h).map_groups`` fallback, zero driver state.
3. Span surgery: each losing span deletes its ``n_sent`` segments from
   its doc (overlapping losers delete the UNION of their segment
   indices); output text is the concatenation of surviving segments —
   byte-deterministic, no re-whitespacing.  Fast path: losers (usually
   few) broadcast as a {doc_id: [starts]} map and the surgery is one
   ``map_batches`` over the docs — ZERO shuffle.  Above
   ``max_broadcast_losers``: tagged-union cogroup by doc_id (docs ∪
   losers → ``groupby(doc_id).map_groups``), one doc-text shuffle.

Determinism: winner choice is a pure function of the corpus (no
randomness, no partition dependence); fast and fallback paths produce
identical results (tested).  Span matching uses a 128-bit blake2b
digest of the normalized span — collision odds are negligible even at
100 TB span counts (~2^80 spans for a 50% birthday bound).

Scale notes: stage-2 moves one thin partial row per distinct span per
batch (~50 B) — the same cost class as the MinHash band explode.  The
rank string orders int ids numerically (biased-uint64 zero-pad, the
latest_by_key trick) and other ids lexicographically.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from . import spec


def sentence_segments(text: str) -> list[str]:
    """Split into segments ending at the spec sentence boundary; the
    trailing unterminated remainder (if any) is a final segment.
    Invariant: ``"".join(sentence_segments(t)) == t``."""
    segs = []
    last = 0
    for m in spec.SENTENCE_END_RE.finditer(text):
        segs.append(text[last:m.end()])
        last = m.end()
    if last < len(text):
        segs.append(text[last:])
    return segs


def line_segments(text: str) -> list[str]:
    """Split into lines KEEPING the newline terminators, so the segments
    concatenate back to the exact original text."""
    return text.splitlines(keepends=True)


_TOKEN_SEG_RE = None


def token_segments(text: str) -> list[str]:
    """Split into whitespace tokens KEEPING each token's trailing
    whitespace (leading whitespace attaches to the first token), so the
    segments concatenate back to the exact original text.  The segment
    unit for exact substring dedup (Lee et al. 2022 granularity)."""
    global _TOKEN_SEG_RE
    if _TOKEN_SEG_RE is None:
        import re

        _TOKEN_SEG_RE = re.compile(r"\S+\s*")
    segs = _TOKEN_SEG_RE.findall(text)
    if not segs:
        return [text] if text else []
    lead = text[: len(text) - len(text.lstrip())]
    if lead:
        segs[0] = lead + segs[0]
    return segs


def _span_digest_norm(norm_segs: list[str], min_norm_chars: int = 1) -> str | None:
    """Hex of the 128-bit digest of the normalized span; None below
    ``min_norm_chars`` normalized chars (an empty/trivial key would
    cross-match unrelated docs — line dedup raises the floor so
    boilerplate one-worders like "Home" aren't nuked corpus-wide).
    Takes PRE-normalized segments (each = " ".join(s.split()).lower())
    so sliding windows don't re-normalize every segment n_sent times."""
    norm = " ".join(norm_segs).strip()
    if len(norm) < min_norm_chars:
        return None
    return hashlib.blake2b(norm.encode("utf-8"), digest_size=16).hexdigest()


def _span_digest(segs: list[str], min_norm_chars: int = 1) -> str | None:
    """Digest of RAW segments (normalizes first) — test/one-off helper."""
    return _span_digest_norm(
        [" ".join(s.split()).lower() for s in segs], min_norm_chars)


def span_occurrences(
    docs: Dataset, *, id_col: str = "doc_id", text_col: str = "text",
    n_sent: int = 3, segmenter=sentence_segments, min_norm_chars: int = 1,
) -> Dataset:
    """Stage 1: thin (h, doc_id, start) rows, one per n_sent-segment
    window.  Per-doc Python loop is inherent (regex segmentation), same
    cost class as the MinHash shingle pass."""
    tcol = pa.schema(docs.schema().base_schema).field(text_col).type
    if not (pa.types.is_string(tcol) or pa.types.is_large_string(tcol)):
        raise ValueError(
            f"span dedup needs a string {text_col!r} column, got {tcol} "
            f"(decode/extract binary payloads first)")

    def emit(batch: pa.Table) -> pa.Table:
        hs: list[str] = []
        ids: list = []
        starts: list[int] = []
        texts = batch.column(text_col).to_pylist()
        doc_ids = batch.column(id_col).to_pylist()
        for did, text in zip(doc_ids, texts):
            if not text:
                continue
            segs = segmenter(text)
            norm = [" ".join(s.split()).lower() for s in segs]
            for i in range(len(segs) - n_sent + 1):
                h = _span_digest_norm(norm[i:i + n_sent], min_norm_chars)
                if h is None:
                    continue
                hs.append(h)
                ids.append(did)
                starts.append(i)
        return pa.table(
            {"h": pa.array(hs, type=pa.string()),
             id_col: pa.array(ids, type=batch.schema.field(id_col).type),
             "start": pa.array(starts, type=pa.int64())}
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pyarrow"
    )


def _rank_expr(batch: pa.Table, id_col: str) -> pa.Array:
    """Order-preserving rank string for (doc_id, start): int ids get the
    biased-uint64 zero-pad (numeric order, negatives safe); other ids
    compare lexicographically (ids containing codepoints below 0x1f
    could perturb tie order against the composite separator — exotic,
    documented).  start is a window index ≥ 0 (12 digits)."""
    ids = batch.column(id_col)
    if pa.types.is_integer(ids.type):
        u = pc.add(pc.cast(pc.cast(ids, pa.int64()), pa.uint64(), safe=False),
                   pa.scalar(1 << 63, type=pa.uint64()))
        id_s = pc.utf8_lpad(pc.cast(u, pa.string()), 20, padding="0")
    else:
        id_s = pc.cast(ids, pa.string())
    st = pc.utf8_lpad(pc.cast(batch.column("start"), pa.string()), 12,
                      padding="0")
    out = pc.binary_join_element_wise(id_s, st, "\x1f")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _losing_spans_gb(occ: Dataset, id_col: str) -> Dataset:
    """Stage-2 fallback (zero driver state): per span hash, every
    occurrence EXCEPT the global first is a loser.

    Grouped by a HASH BUCKET of the span hash, not per hash — this path
    fires exactly above the broadcast caps (i.e. at corpus scale), where
    one Python map_groups call per distinct hash would be a per-token
    tax.  Within a bucket: sort by (h, rank), then a first-of-group mask
    over dictionary codes — no row loops."""
    from .hashutil import fnv1a64_array

    num_buckets = 64

    def bucket(b: pa.Table) -> pa.Table:
        h = b.column("h").combine_chunks() if isinstance(
            b.column("h"), pa.ChunkedArray) else b.column("h")
        return b.append_column("__b", pa.array(
            (fnv1a64_array(h) % np.uint64(num_buckets)).astype(np.int64)))

    def per_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows <= 1:
            return group.select([id_col, "start"]).slice(0, 0)
        t = group.append_column("__rk", _rank_expr(group, id_col))
        t = t.take(pc.sort_indices(
            t, sort_keys=[("h", "ascending"), ("__rk", "ascending")]))
        enc = pc.dictionary_encode(t.column("h"))
        codes = (enc.combine_chunks() if isinstance(enc, pa.ChunkedArray)
                 else enc).indices.to_numpy(zero_copy_only=False)
        loser = np.empty(len(codes), dtype=bool)
        loser[0] = False
        loser[1:] = codes[1:] == codes[:-1]
        return t.filter(pa.array(loser)).select([id_col, "start"])

    return occ.map_batches(bucket, batch_format="pyarrow").groupby(
        "__b").map_groups(per_bucket, batch_format="pyarrow")


def losing_spans(
    occ: Dataset, *, id_col: str = "doc_id",
    max_driver_winners: int = 2_000_000,
    id_type: "pa.DataType | None" = None,
    occ_factory=None,
) -> Dataset:
    """Stage 2 (adaptive): loser occurrences (doc_id, start).  See the
    module docstring for the fast/fallback split.  ``id_type`` types the
    empty result when the corpus has no occurrences at all (a fully
    empty materialized Dataset forgets its schema in Ray 2.49).

    The occurrence stream is consumed TWICE (winner-discovery partials,
    then the loser filter).  Default: pin it once in the object store
    (``materialize`` — spillable and distributed, but a ~corpus-sized
    pin for substring mode's one-row-per-token stream; consuming one
    lazy Dataset from two branches instead would deadlock Ray 2.49's
    executor).  Pass ``occ_factory`` (a zero-arg callable rebuilding the
    occurrence Dataset, e.g. re-running span_occurrences over the
    parquet read) to RECOMPUTE the stream per consumer instead — two
    independent lazy lineages, nothing pinned, the VERDICT r03
    recompute-twice streaming option.  The factory must be
    deterministic; both consumers run sequentially, never as a DAG
    branch."""
    from .aggregates import driver_merge_or_none
    from .steps.dedup import get_broadcast

    def prep(b: pa.Table) -> pa.Table:
        return b.append_column("r", _rank_expr(b, id_col))

    if occ_factory is not None:
        occ2 = occ_factory().map_batches(prep, batch_format="pyarrow")
        occ2_again = occ_factory().map_batches(prep, batch_format="pyarrow")
    else:
        occ2 = occ.map_batches(prep, batch_format="pyarrow").materialize()
        occ2_again = occ2

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["h", "r"]).group_by("h").aggregate(
            [("r", "min"), ("r", "count")])
        return g.rename_columns(["h", "lo", "n"])

    partials = occ2.map_batches(partial, batch_format="pyarrow")
    table, mat = driver_merge_or_none(
        partials, ["h"], [("lo", "min", "lo"), ("n", "sum", "n")],
        max_driver_rows=max_driver_winners,
    )
    if table is None:
        # distinct-span count exceeds the driver cap: merge with Ray's
        # NATIVE vectorized groupby-aggregate (hash shuffle of thin
        # partials — never per-group Python over corpus-sized tiny
        # groups), then keep only CONTESTED hashes, which collapse to
        # the duplicated-span count (tiny in practice).
        from ray.data.aggregate import Min as RMin
        from ray.data.aggregate import Sum as RSum

        contested_ds = (
            mat.groupby("h")
            .aggregate(RMin("lo", alias_name="lo"), RSum("n", alias_name="n"))
            .filter(expr="n > 1")
            .materialize()
        )
        if contested_ds.count() > max_driver_winners:
            # even the contested set exceeds the driver: stay fully
            # distributed (exact groupby fallback, zero driver state)
            return _losing_spans_gb(occ2_again, id_col)
        import pyarrow as _pa

        tables = [t for t in ray.get(contested_ds.to_arrow_refs())
                  if t.num_rows and t.schema.names]
        table = (_pa.concat_tables(tables, promote_options="default")
                 if tables else None)
        if table is None:
            table = pa.table({"h": pa.array([], type=pa.string()),
                              "lo": pa.array([], type=pa.string()),
                              "n": pa.array([], type=pa.int64())})

    contested = (table.filter(pc.greater(table.column("n"), 1))
                 if table.num_rows else table)
    if contested.num_rows == 0:
        # no duplicated span anywhere — typed empty losers (the merge's
        # empty-partials fallback is NULL-typed; never feed it onward)
        import ray.data as rd

        t = id_type
        if t is None:
            try:
                t = pa.schema(
                    occ2.schema(fetch_if_missing=False).base_schema
                ).field(id_col).type
            except Exception:
                t = pa.string()
        return rd.from_arrow(
            pa.schema([(id_col, t), ("start", pa.int64())]).empty_table())
    h_set = contested.column("h").combine_chunks()
    wk = pc.binary_join_element_wise(
        contested.column("h"), contested.column("lo"), "\x1f")
    wkeys = wk.combine_chunks() if isinstance(wk, pa.ChunkedArray) else wk
    ref = ray.put((h_set, wkeys))

    def filt(b: pa.Table) -> pa.Table:
        hs, wks = get_broadcast(ref)
        full = pc.binary_join_element_wise(b.column("h"), b.column("r"), "\x1f")
        mask = pc.and_(
            pc.is_in(b.column("h"), value_set=hs),
            pc.invert(pc.is_in(full, value_set=wks)),
        )
        return b.filter(mask).select([id_col, "start"])

    return occ2_again.map_batches(filt, batch_format="pyarrow")


# auto-streaming pivot (span_dedup streaming_discovery=None): estimated
# occurrence-stream bytes above this pin in the object store no more —
# recompute-twice instead.  ~a single node's comfortable pin budget; on
# a multi-node cluster materialize() distributes, but a 100 TB
# substring stream should never rely on that.
AUTO_STREAM_PIN_CAP = 32 << 30


def _input_file_bytes(ds: Dataset) -> "int | None":
    """Total bytes of the dataset's input files (parquet metadata only —
    nothing executes), or None when unknowable (in-memory datasets,
    remote paths this process can't stat)."""
    import os

    try:
        files = ds.input_files()
    except Exception:
        return None
    if not files:
        return None
    tot = 0
    for f in files:
        p = f[len("file://"):] if f.startswith("file://") else f
        if not os.path.isfile(p):
            return None
        tot += os.path.getsize(p)
    return tot


def span_dedup(
    docs: Dataset, *, id_col: str = "doc_id", text_col: str = "text",
    n_sent: int = 3, segmenter=sentence_segments, min_norm_chars: int = 1,
    max_driver_winners: int = 2_000_000, max_broadcast_losers: int = 2_000_000,
    streaming_discovery: "bool | None" = None,
    occ_bytes_factor: float = 2.0,
    prior_hashes: "Dataset | None" = None,
) -> Dataset:
    """Remove duplicated ``n_sent``-sentence spans corpus-wide, keeping
    the first occurrence.  Returns (id_col, text_col, n_spans_removed);
    docs losing no span pass through byte-identical.

    ``streaming_discovery=True`` trades compute for memory: the
    occurrence stream is recomputed for each of its two consumers
    instead of pinned once in the object store (see losing_spans).
    Identical output; pick it when the occurrence stream is
    corpus-sized — substring mode's one-row-per-token stream at 100 TB —
    and re-segmenting is cheaper than holding the pin.  Default
    ``None`` = AUTO (round-5): stream when input-file bytes ×
    ``occ_bytes_factor`` (the mode's occurrence-stream blowup — ~2× for
    span/line, ~20× for substring's row-per-token) exceeds
    ``AUTO_STREAM_PIN_CAP``; unknown sizes (in-memory inputs) pin.

    ``prior_hashes`` (round-5, incremental ``--against``): a Dataset
    with a string column ``h`` of span digests from PRIOR runs' INPUT
    corpora.  Every occurrence of a prior span in ``docs`` loses
    (prior occurrences outrank all new ones — exact single-shot
    equivalence needs INPUT-derived hashes: output-derived ones miss
    spans removed as surgery collateral and invent spans born at
    surgery seams).  Probed with a semi-join over the thin occurrence
    stream — no corpus-sized driver state."""
    losers = span_loser_starts(
        docs, id_col=id_col, text_col=text_col, n_sent=n_sent,
        segmenter=segmenter, min_norm_chars=min_norm_chars,
        max_driver_winners=max_driver_winners,
        streaming_discovery=streaming_discovery,
        occ_bytes_factor=occ_bytes_factor,
        prior_hashes=prior_hashes).materialize()
    return apply_span_surgery(
        docs, losers, id_col=id_col, text_col=text_col, n_sent=n_sent,
        segmenter=segmenter, max_broadcast_losers=max_broadcast_losers)


def span_loser_starts(
    docs: Dataset, *, id_col: str = "doc_id", text_col: str = "text",
    n_sent: int = 3, segmenter=sentence_segments, min_norm_chars: int = 1,
    max_driver_winners: int = 2_000_000,
    streaming_discovery: "bool | None" = None,
    occ_bytes_factor: float = 2.0,
    prior_hashes: "Dataset | None" = None,
) -> Dataset:
    """Discovery half of ``span_dedup``: the (id_col, start) rows of
    every LOSING span occurrence — a deterministic pure function of the
    input corpus (the dedup job checkpoints it for resume).  See
    ``span_dedup`` for parameter semantics."""
    if streaming_discovery is None:
        est = _input_file_bytes(docs)
        streaming_discovery = bool(
            est is not None and est * occ_bytes_factor > AUTO_STREAM_PIN_CAP)

    occ = span_occurrences(docs, id_col=id_col, text_col=text_col,
                           n_sent=n_sent, segmenter=segmenter,
                           min_norm_chars=min_norm_chars)
    occ_factory = None
    if streaming_discovery:
        def occ_factory():
            return span_occurrences(docs, id_col=id_col, text_col=text_col,
                                    n_sent=n_sent, segmenter=segmenter,
                                    min_norm_chars=min_norm_chars)
    id_type = pa.schema(docs.schema().base_schema).field(id_col).type
    losers_ds = losing_spans(occ, id_col=id_col,
                             max_driver_winners=max_driver_winners,
                             id_type=id_type,
                             occ_factory=occ_factory)
    if prior_hashes is not None:
        from .aggregates import distinct
        from .joins import semi_join

        probe = occ_factory() if occ_factory is not None else occ
        prior_l = semi_join(
            probe, prior_hashes, "h").select_columns([id_col, "start"])
        # distinct: a span both prior-losing and internally-losing must
        # count once in n_spans_removed
        losers_ds = distinct(losers_ds.union(prior_l), [id_col, "start"])
    return losers_ds


def apply_span_surgery(
    docs: Dataset, losers: Dataset, *, id_col: str = "doc_id",
    text_col: str = "text", n_sent: int = 3, segmenter=sentence_segments,
    max_broadcast_losers: int = 2_000_000,
) -> Dataset:
    """Surgery half of ``span_dedup``: given the (id_col, start) loser
    rows (``span_loser_starts`` output — materialized or
    parquet-backed, it is consumed twice), rewrite each doc with its
    losing spans removed.  Row-local per doc given the loser map: docs
    absent from ``docs`` simply keep their loser rows unmatched, which
    is what lets a resumed job run surgery on the unfinished
    partitions only."""
    from .steps.dedup import get_broadcast

    def _surgery(text, starts):
        segs = segmenter(text)
        drop = np.zeros(len(segs), dtype=bool)
        for s in starts:
            drop[s:s + n_sent] = True
        return "".join(seg for seg, d in zip(segs, drop) if not d)

    if losers.count() <= max_broadcast_losers:
        # ZERO-shuffle path: broadcast the (small) loser map and rewrite
        # affected docs inside one map_batches over the original docs.
        lmap: dict = {}
        for r in losers.take_all():
            lmap.setdefault(r[id_col], []).append(int(r["start"]))
        ref = ray.put(lmap)

        def rewrite(b: pa.Table) -> pa.Table:
            d = get_broadcast(ref)
            texts = b.column(text_col).to_pylist()
            ids = b.column(id_col).to_pylist()
            out_t, n_rm = [], []
            for did, text in zip(ids, texts):
                st = d.get(did)
                if not st or not text:
                    out_t.append(text)
                    n_rm.append(0)
                    continue
                out_t.append(_surgery(text, sorted(st)))
                n_rm.append(len(st))
            return pa.table(
                {id_col: b.column(id_col),
                 text_col: pa.array(out_t, type=pa.string()),
                 "n_spans_removed": pa.array(n_rm, type=pa.int64())}
            )

        return docs.select_columns([id_col, text_col]).map_batches(
            rewrite, batch_format="pyarrow")

    # Above the cap: tagged-union cogroup by doc_id (docs carry text
    # with start = -1, losers carry a start with null text) — one
    # doc-text shuffle, zero driver state.
    def tag_docs(b: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: b.column(id_col),
             "start": pa.array(np.full(b.num_rows, -1), type=pa.int64()),
             text_col: b.column(text_col)}
        )

    def tag_losers(b: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: b.column(id_col),
             "start": pc.cast(b.column("start"), pa.int64()),
             text_col: pa.nulls(b.num_rows, type=pa.string())}
        )

    tagged = docs.select_columns([id_col, text_col]).map_batches(
        tag_docs, batch_format="pyarrow"
    ).union(losers.map_batches(tag_losers, batch_format="pyarrow"))

    def rebuild(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gk"])
        starts = group.column("start").to_numpy(zero_copy_only=False)
        doc_rows = np.nonzero(starts == -1)[0]
        if len(doc_rows) == 0:  # loser rows for an absent doc (never
            return pa.table(    # happens from span_dedup itself)
                {id_col: group.column(id_col).slice(0, 0),
                 text_col: pa.array([], type=pa.string()),
                 "n_spans_removed": pa.array([], type=pa.int64())})
        lose_starts = sorted(int(s) for s in starts if s >= 0)
        # one output row PER doc row (a duplicated doc_id keeps all its
        # rows, each rewritten with the same loser starts) — mirrors the
        # broadcast fast path byte-for-byte, ADVICE r02 item #3
        out_t, n_rm = [], []
        for i in doc_rows:
            text = group.column(text_col)[i].as_py()
            if not lose_starts or not text:
                out_t.append(text)
                n_rm.append(0)
            else:
                out_t.append(_surgery(text, lose_starts))
                n_rm.append(len(lose_starts))
        return pa.table(
            {id_col: group.column(id_col).take(pa.array(doc_rows)),
             text_col: pa.array(out_t, type=pa.string()),
             "n_spans_removed": pa.array(n_rm, type=pa.int64())}
        )

    from .aggregates import keyed_map_groups

    return keyed_map_groups(tagged, [id_col], rebuild)


def substring_dedup(
    docs: Dataset, *, id_col: str = "doc_id", text_col: str = "text",
    window: int = 50, **kwargs,
) -> Dataset:
    """Exact duplicated-substring dedup à la Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): any substring of ``window`` tokens (normalized:
    lowercased, whitespace-collapsed) that occurs more than once
    corpus-wide is removed from every occurrence except the global
    first.  A shared region LONGER than the window is removed wholesale
    from later occurrences, because every one of its length-``window``
    sliding sub-windows loses to the first occurrence — this is how a
    fixed window yields arbitrary-length repeated-substring removal.

    Same machinery as ``span_dedup`` with token segments: one thin
    (h, doc_id, start) row per TOKEN (the honest Lee-et-al cost class —
    their suffix array is ~8 bytes/token; our occurrence row is ~50 B of
    pre-aggregated partials), first-occurrence winners, byte-exact
    union-of-losers surgery.  Within-doc overlapping repeats (period <
    window) delete the union of losing windows, which can clip into the
    first occurrence — the same frozen overlap rule as C4 span dedup.
    Returns (id_col, text_col, n_spans_removed) where the count is
    losing WINDOWS, not distinct regions."""
    kwargs.setdefault("occ_bytes_factor", 20.0)  # one occ row per TOKEN
    return span_dedup(docs, id_col=id_col, text_col=text_col, n_sent=window,
                      segmenter=token_segments, min_norm_chars=1, **kwargs)


def line_dedup(
    docs: Dataset, *, id_col: str = "doc_id", text_col: str = "text",
    min_norm_chars: int = 15, **kwargs,
) -> Dataset:
    """RefinedWeb-style corpus-wide exact LINE dedup: every duplicated
    line (normalized: lowercased, whitespace-collapsed) is removed from
    all but its first occurrence.  Lines under ``min_norm_chars``
    normalized chars are exempt — short navigation boilerplate ("Home",
    dates) would otherwise be deleted corpus-wide on the first page that
    carries it.  Same three-stage shape and cost as span_dedup."""
    return span_dedup(docs, id_col=id_col, text_col=text_col, n_sent=1,
                      segmenter=line_segments, min_norm_chars=min_norm_chars,
                      **kwargs)
