"""Exact dedup (SURVEY §2.7 D1/D2, §2.6 J4) — collision-only shuffle.

A naive ``groupby(key).map_groups(pick_winner)`` shuffles the ENTIRE
corpus to deduplicate a few-percent collision set.  Instead (scale
design, SURVEY §4):

  phase 1: per-batch partial counts of `key` (vectorized pyarrow
           group_by) → tiny global groupby → keys with n > 1;
  phase 2: only rows whose key collides are shuffled
           (``groupby(key).map_groups`` over pyarrow tables, winner =
           lexicographic sort, exactly one row out); the other ≥95% of
           the corpus streams through a vectorized membership filter
           with NO all-to-all.

The collision key set is broadcast via ``ray.put`` (read once per
worker, SURVEY §2.6 J1).  At 10^12-doc scale the collision set itself
can be large; the documented scale path is to swap the exact set for a
Bloom filter (false positives only route extra rows into the shuffle —
semantics unchanged) or fall back to the full groupby.
"""

from __future__ import annotations

import ray
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

_VALUESET_CACHE: dict[str, pa.Array] = {}


def _cached_value_set(ref: ray.ObjectRef) -> pa.Array:
    key = ref.hex()
    arr = _VALUESET_CACHE.get(key)
    if arr is None:
        arr = pa.array(sorted(ray.get(ref)), type=pa.string())
        _VALUESET_CACHE.clear()  # hold at most one broadcast set per worker
        _VALUESET_CACHE[key] = arr
    return arr


def find_dup_keys(ds: Dataset, key: str) -> set[str]:
    """Keys occurring more than once — two-phase (partial counts, then a
    small groupby over one row per key per batch)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key]).group_by(key).aggregate([(key, "count")])
        return t.rename_columns([key, "n"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("n", alias_name="n"))
    )
    dup = counts.filter(expr="n > 1")
    return {r[key] for r in dup.take_all()}


def split_by_membership(
    ds: Dataset, col: str, keys: set[str]
) -> tuple[Dataset, Dataset]:
    """(rows with col ∉ keys, rows with col ∈ keys) — vectorized, no shuffle."""
    ref = ray.put(keys)

    def _filter(batch: pa.Table, invert: bool) -> pa.Table:
        vs = _cached_value_set(ref)
        mask = pc.is_in(batch.column(col), value_set=vs)
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask)

    out_nonmember = ds.map_batches(
        lambda b: _filter(b, True), batch_format="pyarrow"
    )
    member = ds.map_batches(lambda b: _filter(b, False), batch_format="pyarrow")
    return out_nonmember, member


def pick_winner_fn(sort_keys: list[tuple[str, str]]):
    """Per-group winner: lexicographic sort by sort_keys, first row."""

    def _winner(group: pa.Table) -> pa.Table:
        return group.sort_by(sort_keys).slice(0, 1)

    return _winner


def dedup_by_key(
    ds: Dataset,
    key: str,
    sort_keys: list[tuple[str, str]],
) -> Dataset:
    """One winner per `key` (winner = first row under sort_keys order).

    E.g. url-dedup (J4 newest-wins): key="url",
    sort_keys=[("warc_ts", "descending"), ("raw_digest", "ascending")].
    """
    dups = find_dup_keys(ds, key)
    if not dups:
        return ds
    uniq, collide = split_by_membership(ds, key, dups)
    winners = collide.groupby(key).map_groups(
        pick_winner_fn(sort_keys), batch_format="pyarrow"
    )
    return uniq.union(winners)


def flag_text_dedup(ds: Dataset) -> Dataset:
    """D1: append ``dedup_keep`` — keep==True minus exact-duplicate losers.

    Winner per `digest` among kept rows = (max warc_ts, tie → min url).
    Only (digest, url, warc_ts) metadata of colliding KEPT rows is
    shuffled; winners (small) are broadcast back as a digest→url dict.
    """

    def kept_meta(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("keep")).select(["digest", "url", "warc_ts"])

    meta = ds.map_batches(kept_meta, batch_format="pyarrow")
    dup_digests = find_dup_keys(meta, "digest")
    if not dup_digests:
        return ds.map_batches(
            lambda b: b.append_column("dedup_keep", b.column("keep")),
            batch_format="pyarrow",
        )
    ref = ray.put(dup_digests)
    _, collide = split_by_membership(meta, "digest", dup_digests)
    winners = collide.groupby("digest").map_groups(
        pick_winner_fn([("warc_ts", "descending"), ("url", "ascending")]),
        batch_format="pyarrow",
    )
    winner_map = {r["digest"]: r["url"] for r in winners.take_all()}
    wref = ray.put(winner_map)

    def _flag(batch: pa.Table) -> pa.Table:
        wm: dict[str, str] = ray.get(wref)
        keep = batch.column("keep").to_pylist()
        digests = batch.column("digest").to_pylist()
        urls = batch.column("url").to_pylist()
        out = [
            bool(k) and (d not in wm or wm[d] == u)
            for k, d, u in zip(keep, digests, urls)
        ]
        return batch.append_column("dedup_keep", pa.array(out, type=pa.bool_()))

    return ds.map_batches(_flag, batch_format="pyarrow")
