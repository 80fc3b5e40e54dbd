"""Aggregations at scale (SURVEY §2.7/§2.8 G1–G5, T1–T4).

Every grouped aggregate here PRE-AGGREGATES inside ``map_batches``
(vectorized ``pyarrow.Table.group_by`` per batch → one row per key per
batch) before the global Ray groupby, so the all-to-all moves partials,
not rows.  ``salted_groupby`` additionally splits hot keys across
``salt_n`` sub-keys in phase 1 (BASELINE.json:6 "salted groupby-aggregate
shuffles to handle domain/language skew").
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from . import spec

_MERGE = {"sum": Sum, "count": Sum, "min": Min, "max": Max}


def grouped_agg(
    ds: Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
) -> Dataset:
    """Pre-aggregated groupby.  ``aggs`` = [(col, fn, out_name)] with fn in
    sum/count/min/max.  count counts non-null values of col (SQL COUNT(col));
    use count with a never-null col for COUNT(*)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([(c, f) for c, f, _ in aggs])
        return g.rename_columns(keys + [out for _, _, out in aggs])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys if len(keys) > 1 else keys[0])
        .aggregate(*[_MERGE[f](out, alias_name=out) for _, f, out in aggs])
    )
    return merged


def salted_groupby(
    ds: Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    *,
    salt_n: int = 16,
    salt_source: str | None = None,
) -> Dataset:
    """G3: two-phase aggregate for skewed keys.  Phase 1 groups by
    (keys..., salt) where salt = fnv1a64(salt_source or row index-ish
    bytes) % salt_n so one hot key spreads over salt_n reducers; phase 2
    merges the per-salt partials with a groupby on the true keys."""

    def add_salt(batch: pa.Table) -> pa.Table:
        if salt_source is not None:
            src = batch.column(salt_source).to_pylist()
            salts = np.fromiter(
                (spec.fnv1a64(str(s).encode()) % salt_n for s in src),
                dtype=np.int64,
                count=len(src),
            )
        else:  # arbitrary but deterministic-enough spread for partials
            salts = np.arange(batch.num_rows, dtype=np.int64) % salt_n
        g = batch.append_column("__salt", pa.array(salts)).group_by(
            keys + ["__salt"]
        ).aggregate([(c, f) for c, f, _ in aggs])
        return g.rename_columns(keys + ["__salt"] + [out for _, _, out in aggs])

    phase1 = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby(keys + ["__salt"])
        .aggregate(*[_MERGE[f](out, alias_name=out) for _, f, out in aggs])
    )
    phase2 = phase1.groupby(keys if len(keys) > 1 else keys[0]).aggregate(
        *[_MERGE[f](out, alias_name=out) for _, f, out in aggs]
    )
    return phase2


def distinct(ds: Dataset, cols: list[str]) -> Dataset:
    """G4: exact distinct via pre-aggregated groupby (no raw-row shuffle)."""

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(cols).aggregate([(cols[0], "count")]).select(cols)

    part = ds.map_batches(partial, batch_format="pyarrow")
    out = part.groupby(cols if len(cols) > 1 else cols[0]).aggregate(
        Count(alias_name="__n")
    )
    return out.drop_columns(["__n"])


def topk(ds: Dataset, sort_cols: list[tuple[str, bool]], k: int) -> Dataset:
    """T2: global top-k via per-batch top-k partials + final sort-limit
    (avoids a full global sort).  sort_cols = [(col, descending)]."""

    pa_keys = [(c, "descending" if d else "ascending") for c, d in sort_cols]

    def partial(batch: pa.Table) -> pa.Table:
        return batch.sort_by(pa_keys).slice(0, k)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(partial, batch_format="pyarrow")
    )


def approx_top_k(ds: Dataset, col: str, k: int, *, per_batch: int = 256) -> list[tuple[str, int]]:
    """G5: heavy hitters — per-batch exact counts truncated to the top
    ``per_batch`` (a space-saving sketch: mergeable, may undercount keys
    that never enter a partial top), merged on the driver.  Exact
    fallback = grouped_agg + topk."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(col).aggregate([(col, "count")])
        g = g.rename_columns([col, "n"]).sort_by([("n", "descending")])
        return g.slice(0, per_batch)

    merged: dict[str, int] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged[row[col]] = merged.get(row[col], 0) + row["n"]
    return heapq.nlargest(k, merged.items(), key=lambda kv: (kv[1], kv[0]))
