"""C4-style duplicated-span dedup (task brief "deduplication";
C4 / T5 paper §2.2: "we removed any duplicated three-sentence span,
keeping one occurrence").

Pipeline shape (three thin stages, one occurrence shuffle + one doc
cogroup — no driver-side state at any size):

1. ``map_batches`` per doc: split text into SENTENCE SEGMENTS at the
   frozen spec boundary (``spec.SENTENCE_END_RE`` match ends, so the
   segments concatenate back to the exact original text), slide a
   ``n_sent``-segment window, hash each window's NORMALIZED form
   (lowercased, whitespace-collapsed — formatting noise must not hide
   a duplicate).  Emits thin occurrence rows (h, doc_id, start).
2. ``groupby(h).map_groups``: all occurrences of one span hash land in
   one group; the global FIRST occurrence (min (doc_id, start)) wins,
   every other occurrence is emitted as a loser (doc_id, start).  Group
   payload is thin tuples; a span repeated k times costs O(k) rows.
3. Tagged-union cogroup by doc_id (docs ∪ losers →
   ``groupby(doc_id).map_groups``): each losing span deletes its
   ``n_sent`` segments from the doc (overlapping spans delete the
   UNION of their segment indices); output text is the concatenation
   of surviving segments — byte-deterministic, no re-whitespacing.

Determinism: winner choice is a pure function of the corpus (no
randomness, no partition dependence).  Span matching uses a 128-bit
blake2b digest of the normalized span — collision odds are negligible
even at 100 TB span counts (~2^80 spans for a 50% birthday bound).

Scale notes: stage-2 shuffles one thin row per span occurrence
(~40 B/row: 16 B digest + ints) — the same cost class as the MinHash
band explode.  Stage 3 shuffles the doc text once, like the flagship
partition write.  Docs with fewer than ``n_sent`` segments never emit
occurrences and pass through stage 3 untouched.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
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


def _span_digest(segs: list[str], min_norm_chars: int = 1) -> bytes | None:
    """128-bit digest of the normalized span; None below
    ``min_norm_chars`` normalized chars (an empty/trivial key would
    cross-match unrelated docs — line dedup raises the floor so
    boilerplate one-worders like "Home" aren't nuked corpus-wide)."""
    norm = " ".join(" ".join(s.split()).lower() for s in segs).strip()
    if len(norm) < min_norm_chars:
        return None
    return hashlib.blake2b(norm.encode("utf-8"), digest_size=16).digest()


def span_occurrences(
    docs: Dataset, *, id_col: str = "doc_id", text_col: str = "text",
    n_sent: int = 3, segmenter=sentence_segments, min_norm_chars: int = 1,
) -> Dataset:
    """Stage 1: thin (h, doc_id, start) rows, one per n_sent-segment
    window.  Per-doc Python loop is inherent (regex segmentation), same
    cost class as the MinHash shingle pass."""

    def emit(batch: pa.Table) -> pa.Table:
        hs: list[bytes] = []
        ids: list = []
        starts: list[int] = []
        texts = batch.column(text_col).to_pylist()
        doc_ids = batch.column(id_col).to_pylist()
        for did, text in zip(doc_ids, texts):
            if not text:
                continue
            segs = segmenter(text)
            for i in range(len(segs) - n_sent + 1):
                h = _span_digest(segs[i:i + n_sent], min_norm_chars)
                if h is None:
                    continue
                hs.append(h)
                ids.append(did)
                starts.append(i)
        return pa.table(
            {"h": pa.array(hs, type=pa.binary(16)),
             id_col: pa.array(ids, type=batch.schema.field(id_col).type),
             "start": pa.array(starts, type=pa.int64())}
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        emit, batch_format="pyarrow"
    )


def losing_spans(occ: Dataset, *, id_col: str = "doc_id") -> Dataset:
    """Stage 2: per span hash, every occurrence EXCEPT the global first
    (min (doc_id, start)) is a loser.  h is non-null binary — safe for
    Ray's sort groupby directly."""

    def per_hash(group: pa.Table) -> pa.Table:
        if group.num_rows <= 1:
            return group.select([id_col, "start"]).slice(0, 0)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        st = group.column("start").to_numpy(zero_copy_only=False)
        order = np.lexsort((st, ids))
        keep = order[1:]  # drop the winner
        return group.take(pa.array(keep, type=pa.int64())).select(
            [id_col, "start"])

    return occ.groupby("h").map_groups(per_hash, batch_format="pyarrow")


def span_dedup(
    docs: Dataset, *, id_col: str = "doc_id", text_col: str = "text",
    n_sent: int = 3, segmenter=sentence_segments, min_norm_chars: int = 1,
) -> Dataset:
    """Remove duplicated ``n_sent``-sentence spans corpus-wide, keeping
    the first occurrence.  Returns (id_col, text_col, n_spans_removed);
    docs losing no span pass through byte-identical."""
    occ = span_occurrences(docs, id_col=id_col, text_col=text_col,
                           n_sent=n_sent, segmenter=segmenter,
                           min_norm_chars=min_norm_chars)
    losers = losing_spans(occ, id_col=id_col)

    # Tagged union for the cogroup: docs carry text (start = -1),
    # losers carry a start (text = null).
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
        did = group.column(id_col)[0]
        text = group.column(text_col)[doc_rows[0]].as_py()
        lose_starts = sorted(int(s) for s in starts if s >= 0)
        if not lose_starts:
            out_text, n_removed = text, 0
        else:
            segs = segmenter(text)
            drop = np.zeros(len(segs), dtype=bool)
            for s in lose_starts:
                drop[s:s + n_sent] = True
            out_text = "".join(
                seg for seg, d in zip(segs, drop) if not d)
            n_removed = len(lose_starts)
        return pa.table(
            {id_col: pa.array([did.as_py()],
                              type=group.schema.field(id_col).type),
             text_col: pa.array([out_text], type=pa.string()),
             "n_spans_removed": pa.array([n_removed], type=pa.int64())}
        )

    from .aggregates import keyed_map_groups

    return keyed_map_groups(tagged, [id_col], rebuild)


def line_dedup(
    docs: Dataset, *, id_col: str = "doc_id", text_col: str = "text",
    min_norm_chars: int = 15,
) -> Dataset:
    """RefinedWeb-style corpus-wide exact LINE dedup: every duplicated
    line (normalized: lowercased, whitespace-collapsed) is removed from
    all but its first occurrence.  Lines under ``min_norm_chars``
    normalized chars are exempt — short navigation boilerplate ("Home",
    dates) would otherwise be deleted corpus-wide on the first page that
    carries it.  Same three-stage shape and cost as span_dedup."""
    return span_dedup(docs, id_col=id_col, text_col=text_col, n_sent=1,
                      segmenter=line_segments, min_norm_chars=min_norm_chars)
