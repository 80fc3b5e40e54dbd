"""Adapters mapping driver test tables onto the pipeline's pages schema
(SURVEY §3 driver-contract paragraph; FIXTURES.md F2)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data import Dataset

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01


def documents_as_pages(sf_dir: str) -> Dataset:
    """documents(doc_id, text, lang, source, n_chars) → pages
    (url, warc_ts, html, text, lang):
      url = synth://{source}/{doc_id}, warc_ts = epoch + doc_id µs, html = NULL.
    """
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id")
        urls = pc.binary_join_element_wise(
            pa.array(["synth://"] * batch.num_rows),
            batch.column("source"),
            pa.array(["/"] * batch.num_rows),
            pc.cast(doc_id, pa.string()),
            "",
        )
        ts = pc.cast(pc.add(doc_id, EPOCH_US), pa.int64()).cast(pa.timestamp("us"))
        return pa.table(
            {
                "url": urls,
                "warc_ts": ts,
                "html": pa.nulls(batch.num_rows, type=pa.binary()),
                "text": batch.column("text"),
                "lang": batch.column("lang"),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")
