"""Sources / sinks (SURVEY §2.1): schema-validated Parquet reader,
partition-deterministic resumable writer, lineage manifests.

Resumable layout (SURVEY §3 E3, BASELINE.json:6 "resumes from checkpoint"):
one data file per deterministic ``part_id`` (``part-{pid:05d}.parquet``,
written atomically: tmp file + rename) plus one JSON lineage manifest per
partition under ``_lineage/``.  A rerun scans the manifests, skips every
finished partition BEFORE any heavy compute (part_id = fnv1a64(url) % P
is assigned in the prepare stage), and processes only the remainder.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data
from ray.data import Dataset

from . import spec
from .schema import PAGES_SCHEMA, validate_schema

# Columns of the filtered-corpus output files.
OUTPUT_COLUMNS = [
    "url", "warc_ts", "lang", "lang_id", "lang_score", "ppl",
    "text_scrubbed", "scrub_count", "digest", "part_id",
]


def read_pages(path: str, *, columns: list[str] | None = None) -> Dataset:
    """S1: Parquet reader for the §1.2 pages table, schema fail-fast."""
    ds = ray.data.read_parquet(path, columns=columns)
    expected = PAGES_SCHEMA if columns is None else pa.schema(
        [f for f in PAGES_SCHEMA if f.name in columns]
    )
    validate_schema(pa.schema(ds.schema().base_schema), expected)
    return ds


def read_table(sf_dir: str, name: str, *, columns: list[str] | None = None) -> Dataset:
    """S2: generic reader for the driver test tables."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _write_partition(group: pa.Table, out_dir: str) -> pa.Table:
    """Write one part_id's survivors + lineage manifest. Runs inside
    ``groupby('part_id').map_groups`` — each partition is one atomic file."""
    pid = int(group.column("part_id")[0].as_py())
    kept_mask = group.column("dedup_keep")
    kept = group.filter(kept_mask)
    n_in = group.num_rows
    n_kept = kept.num_rows

    rule_counts: dict[str, int] = {}
    for hits in group.column("rule_hits").to_pylist():
        for h in hits:
            rule_counts[h] = rule_counts.get(h, 0) + 1

    out_file = ""
    if n_kept:
        out_file = f"part-{pid:05d}.parquet"
        tmp = os.path.join(out_dir, f".tmp-{out_file}-{uuid.uuid4().hex}")
        pq.write_table(kept.select(OUTPUT_COLUMNS), tmp)
        os.replace(tmp, os.path.join(out_dir, out_file))

    manifest = {
        "part_id": pid,
        "input_rows": n_in,
        "kept_rows": n_kept,
        "dropped_rows": n_in - n_kept,
        "rule_counts": rule_counts,
        "output_file": out_file,
    }
    lin_dir = os.path.join(out_dir, "_lineage")
    tmpm = os.path.join(lin_dir, f".tmp-{pid:05d}-{uuid.uuid4().hex}")
    with open(tmpm, "w") as f:
        json.dump(manifest, f)
    os.replace(tmpm, os.path.join(lin_dir, f"part-{pid:05d}.json"))

    return pa.table(
        {
            "part_id": pa.array([pid], type=pa.int32()),
            "input_rows": pa.array([n_in], type=pa.int64()),
            "kept_rows": pa.array([n_kept], type=pa.int64()),
            "dropped_rows": pa.array([n_in - n_kept], type=pa.int64()),
            "rule_counts": pa.array(
                [[{"rule": r, "n": n} for r, n in sorted(rule_counts.items())]],
                type=pa.list_(pa.struct([("rule", pa.string()), ("n", pa.int64())])),
            ),
            "output_file": pa.array([out_file], type=pa.string()),
        }
    )


def write_filtered(ds: Dataset, out_dir: str) -> Dataset:
    """S3+S4: groupby(part_id) → one atomic file + manifest per partition.
    Returns the lineage Dataset (one row per partition present in `ds`)."""
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    return ds.groupby("part_id").map_groups(
        lambda g: _write_partition(g, out_dir), batch_format="pyarrow"
    )


def done_partitions(out_dir: str) -> set[int]:
    """part_ids with a manifest AND (if any rows were kept) their data file."""
    lin_dir = os.path.join(out_dir, "_lineage")
    done: set[int] = set()
    if not os.path.isdir(lin_dir):
        return done
    for name in os.listdir(lin_dir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        with open(os.path.join(lin_dir, name)) as f:
            m = json.load(f)
        if m["output_file"] and not os.path.exists(os.path.join(out_dir, m["output_file"])):
            continue  # manifest without data → not done
        done.add(int(m["part_id"]))
    return done


def read_lineage(out_dir: str) -> list[dict]:
    lin_dir = os.path.join(out_dir, "_lineage")
    out = []
    for name in sorted(os.listdir(lin_dir)) if os.path.isdir(lin_dir) else []:
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(lin_dir, name)) as f:
                out.append(json.load(f))
    return out


def read_filtered(out_dir: str) -> Dataset:
    """Read back a finished run's survivor corpus."""
    files = [
        os.path.join(out_dir, n)
        for n in sorted(os.listdir(out_dir))
        if n.startswith("part-") and n.endswith(".parquet")
    ]
    return ray.data.read_parquet(files)
