"""Prepare stage (M1/M2/M7 in SURVEY §2.3): HTML→text extraction,
normalization, raw digest, url parsing — one stateless ``map_batches``.

Drops the wide ``html`` column immediately (SURVEY §4: wide rows must not
flow through the pipeline / shuffles).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .. import spec, textproc


def raw_digest_bytes(text: str | None, html: bytes | None) -> str:
    data = text.encode("utf-8") if text is not None else (html or b"")
    return hashlib.blake2b(data, digest_size=16).hexdigest()


def prepare_batch(batch: pa.Table, num_parts: int = spec.DEFAULT_NUM_PARTS) -> pa.Table:
    """(url, warc_ts, html, text, lang) → (url, warc_ts, lang, part_id,
    raw_digest, text_clean, valid).  Per-row loop: the HTML parser and
    normalizer are inherently per-document; regex/parser work is C-level
    scans.  part_id = fnv1a64(url) % num_parts (lineage / resume key,
    computed first so resume can skip finished partitions pre-compute)."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    texts = batch.column("text").to_pylist()
    n = len(urls)
    clean = [""] * n
    digests = [""] * n
    valid = np.zeros(n, dtype=bool)
    part_id = np.zeros(n, dtype=np.int32)
    for i in range(n):
        t, h = texts[i], htmls[i]
        digests[i] = raw_digest_bytes(t, h)
        if t is None and h is not None:
            t = textproc.extract_text_one(h)
        if t is not None and urls[i] is not None:
            valid[i] = True
            clean[i] = textproc.normalize_text_one(t)
        if urls[i] is not None:
            part_id[i] = spec.part_id_of(urls[i], num_parts)
    return pa.table(
        {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "part_id": pa.array(part_id, type=pa.int32()),
            "raw_digest": pa.array(digests, type=pa.string()),
            "text_clean": pa.array(clean, type=pa.string()),
            "valid": pa.array(valid),
        }
    )
