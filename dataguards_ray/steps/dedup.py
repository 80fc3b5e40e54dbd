"""Exact dedup primitives (SURVEY §2.7 D1/D2, §2.6 J4) — winner metadata
+ broadcast flags, never a second full-corpus shuffle, never a branched
Dataset DAG (a branch re-executes the upstream chain per consumer).

Frozen winner semantics:
  url-dedup (J4):  winner = max warc_ts.  Input contract: (url,
    warc_ts) is unique per corpus (a crawler cannot fetch the same url
    twice in the same microsecond); the oracle asserts this.
  text-dedup (D1): winner = lexicographic max of rank
    f"{warc_ts:020d}|{url}" (max ts, tie → max url; urls are unique
    after url-dedup so ranks are unique).

Where each runs in the flagship (pipeline.py):
  - url-dedup needs NO extra pass at all in run(): part_id =
    fnv1a64(url) % P co-locates every row of a url, so the partition
    writer resolves newest-wins in place.  annotate() (the in-memory
    test path) instead computes winners from the materialized scored
    metadata via ``url_max_ts`` + ``url_dedup_filter``.
  - text-dedup winners: the partition writer emits per-partition
    (digest, max rank, count) partials; a tiny ``groupby('digest')`` in
    the same execution yields contested winners (``contested_winners``
    is the standalone variant used on resume / in annotate()).  Losers
    are dropped by a vectorized broadcast flag (``flag_dedup_keep`` /
    finalize).

Scale note (10^12 docs): the driver-side winner dict covers only
*contested* keys.  If that set outgrows driver memory, swap the exact
dict for a Bloom filter (dataguards_ray.bloom) of contested keys —
false positives only send extra rows through a secondary exact check —
or fall back to a full hash-partitioned groupby; semantics unchanged.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Max, Sum

_BCAST_CACHE: dict[str, object] = {}


def get_broadcast(ref: ray.ObjectRef):
    """Worker-local cache for a small broadcast object (ray.get is cheap
    after first fetch, but we also avoid re-deserialization per batch).

    Bounded FIFO of 8 entries — a fused task chain commonly alternates
    between two or three broadcasts per batch (e.g. url-dedup winners
    then digest winners), and a single-slot cache would re-deserialize
    each of them on every batch."""
    key = ref.hex()
    if key not in _BCAST_CACHE:
        while len(_BCAST_CACHE) >= 8:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def rank_expr(ts: pa.ChunkedArray | pa.Array, url: pa.ChunkedArray | pa.Array) -> pa.Array:
    """rank = f"{biased_ts:020d}|{url}" — lexicographic max == (max ts,
    max url).  ts is biased int64→uint64 (x + 2^63 mod 2^64, order-
    preserving) so pre-1970 timestamps still zero-pad into sortable
    decimal; uint64 max is exactly 20 digits."""
    ts_u = pc.cast(pc.cast(ts, pa.int64()), pa.uint64(), safe=False)
    ts_b = pc.add(ts_u, pa.scalar(1 << 63, type=pa.uint64()))
    ts_str = pc.utf8_lpad(pc.cast(ts_b, pa.string()), 20, padding="0")
    return pc.binary_join_element_wise(ts_str, url, "|")


def contested_winners(
    meta: Dataset, key: str, rank_col: str
) -> dict[str, str]:
    """{key: winning rank} for keys with >1 row.  `meta` must have columns
    (key, rank_col) — thin!  Partial-aggregates per batch first so the
    global groupby shuffles ≤ one row per key per batch."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(key).aggregate([(rank_col, "max"), (rank_col, "count")])
        return g.rename_columns([key, "r", "n"])

    from ..aggregates import driver_merge_or_none

    partials = meta.map_batches(partial, batch_format="pyarrow", batch_size=16384)
    merged, mat = driver_merge_or_none(
        partials, [key], [("n", "sum", "n"), ("r", "max", "r")]
    )
    if merged is not None:  # thin partials → Arrow C++ merge on driver
        import pyarrow.compute as _pc

        bad = merged.filter(_pc.greater(merged.column("n"), 1))
        return dict(zip(bad.column(key).to_pylist(), bad.column("r").to_pylist()))
    agg = mat.groupby(key).aggregate(Sum("n", alias_name="n"), Max("r", alias_name="r"))
    out: dict[str, str] = {}
    for row in agg.filter(expr="n > 1").take_all():
        out[row[key]] = row["r"]
    return out


def contested_winners_dataset(meta: Dataset, key: str, rank_col: str) -> Dataset:
    """Distributed variant of ``contested_winners``: the (key, r) winner
    table for contested keys stays a Dataset (consumed by the Bloom
    broadcast path when the contested set outgrows a driver dict)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(key).aggregate([(rank_col, "max"), (rank_col, "count")])
        return g.rename_columns([key, "r", "n"])

    return (
        meta.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(key)
        .aggregate(Sum("n", alias_name="n"), Max("r", alias_name="r"))
        .filter(expr="n > 1")
        .select_columns([key, "r"])
    )


def url_max_ts(meta: Dataset) -> dict[str, int]:
    """{url: max warc_ts (µs int)} for urls appearing more than once.
    `meta` needs columns (url, warc_ts) only — read them pruned."""

    def partial(batch: pa.Table) -> pa.Table:
        # null urls are schema-invalid rows, not duplicates of each other
        # (NULL never equals NULL) — exclude them from dedup entirely
        batch = batch.filter(pc.is_valid(batch.column("url")))
        t = pa.table(
            {
                "url": batch.column("url"),
                "ts": pc.cast(batch.column("warc_ts"), pa.int64()),
            }
        )
        g = t.group_by("url").aggregate([("ts", "max"), ("ts", "count")])
        return g.rename_columns(["url", "ts", "n"])

    from ..aggregates import driver_merge_or_none

    partials = meta.map_batches(partial, batch_format="pyarrow", batch_size=16384)
    merged, mat = driver_merge_or_none(
        partials, ["url"], [("n", "sum", "n"), ("ts", "max", "ts")]
    )
    if merged is not None:
        import pyarrow.compute as _pc

        bad = merged.filter(_pc.greater(merged.column("n"), 1))
        return dict(zip(bad.column("url").to_pylist(), bad.column("ts").to_pylist()))
    agg = mat.groupby("url").aggregate(Sum("n", alias_name="n"), Max("ts", alias_name="ts"))
    return {row["url"]: row["ts"] for row in agg.filter(expr="n > 1").take_all()}


def url_dedup_filter(ds: Dataset, winners: dict[str, int]) -> Dataset:
    """Drop url-dup losers (row survives iff url uncontested or ts == max).
    Fully vectorized: two ``pc.is_in`` probes against value_sets built
    once on the driver (contested urls; winning "url|ts" keys)."""
    if not winners:
        return ds
    contested = pa.array(sorted(winners), type=pa.string())
    winner_keys = pa.array(
        sorted(f"{u}|{t}" for u, t in winners.items()), type=pa.string()
    )
    ref = ray.put((contested, winner_keys))

    def _filter(batch: pa.Table) -> pa.Table:
        c, wk = get_broadcast(ref)
        urls = batch.column("url")
        key = pc.binary_join_element_wise(
            urls, pc.cast(pc.cast(batch.column("warc_ts"), pa.int64()), pa.string()), "|"
        )
        mask = pc.or_(
            pc.invert(pc.is_in(urls, value_set=c)), pc.is_in(key, value_set=wk)
        )
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


def digest_winners(kept_meta: Dataset) -> dict[str, str]:
    """Winners among kept rows per text digest; `kept_meta` must have
    columns (digest, warc_ts, url) of KEPT rows only."""

    def add_rank(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "digest": batch.column("digest"),
                "rank": rank_expr(batch.column("warc_ts"), batch.column("url")),
            }
        )

    return contested_winners(
        kept_meta.map_batches(add_rank, batch_format="pyarrow"), "digest", "rank"
    )


def flag_dedup_keep(ds: Dataset, winners: dict[str, str]) -> Dataset:
    """Append ``dedup_keep`` = keep AND (digest uncontested or row is the
    winner).  Fully vectorized (two ``pc.is_in`` probes against driver-
    built value_sets); no shuffle."""
    contested = pa.array(sorted(winners), type=pa.string())
    winner_keys = pa.array(
        sorted(f"{d}\x1f{r}" for d, r in winners.items()), type=pa.string()
    )
    ref = ray.put((contested, winner_keys))

    def _flag(batch: pa.Table) -> pa.Table:
        c, wk = get_broadcast(ref)
        keep = pc.fill_null(pc.cast(batch.column("keep"), pa.bool_()), False)
        if len(c):
            digests = batch.column("digest")
            ranks = rank_expr(batch.column("warc_ts"), batch.column("url"))
            key = pc.binary_join_element_wise(digests, ranks, "\x1f")
            ok = pc.or_(
                pc.invert(pc.is_in(digests, value_set=c)), pc.is_in(key, value_set=wk)
            )
            out = pc.and_(keep, ok)
        else:
            out = keep
        return batch.append_column(
            "dedup_keep", out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
        )

    return ds.map_batches(_flag, batch_format="pyarrow")


def flag_dedup_keep_bloom(
    ds: Dataset,
    winners: Dataset,
    *,
    fp_rate: float = 0.001,
    num_partitions: int = 16,
) -> Dataset:
    """Scale path for ``flag_dedup_keep`` (the steps/dedup docstring's
    Bloom fallback, wired in round 2): when the contested-winner set
    outgrows a driver dict, broadcast a Bloom of contested digests
    instead.  Bloom-negative rows (the vast majority) are flagged
    locally; Bloom-positive rows (contested + ~fp_rate false positives)
    resolve their winner rank through a ``left_outer`` hash join against
    the winner Dataset.  Output is identical to the exact path.

    NOTE: consumes `ds` twice (negative + positive branches) — hand it a
    read or a materialized Dataset, not an expensive lazy chain."""
    from ..joins import _bloom_of, scrub_empty_blocks

    w = scrub_empty_blocks(winners.select_columns(["digest", "r"])).materialize()
    n = w.count()
    if n == 0:
        return flag_dedup_keep(ds, {})
    bref = ray.put(_bloom_of(w, "digest", n, fp_rate))

    out_cols = [f.name for f in pa.schema(ds.schema().base_schema)] + ["dedup_keep"]

    def _bloom_mask(batch: pa.Table):
        import numpy as np

        bf = get_broadcast(bref)
        return np.asarray(bf.contains_many(batch.column("digest").to_pylist()))

    def flag_negatives(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.array(~_bloom_mask(batch), type=pa.bool_()))
        keep = pc.fill_null(pc.cast(batch.column("keep"), pa.bool_()), False)
        keep = keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
        return batch.append_column("dedup_keep", keep).select(out_cols)

    def keep_positives(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(_bloom_mask(batch), type=pa.bool_()))

    negatives = ds.map_batches(flag_negatives, batch_format="pyarrow")
    positives = ds.map_batches(keep_positives, batch_format="pyarrow")
    joined = positives.join(
        w,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("digest",),
        right_on=("digest",),
    )

    def flag_positives(batch: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.cast(batch.column("keep"), pa.bool_()), False)
        rank = rank_expr(batch.column("warc_ts"), batch.column("url"))
        winner_r = batch.column("r")
        ok = pc.or_(pc.is_null(winner_r), pc.equal(rank, winner_r))
        out = pc.and_(keep, pc.fill_null(ok, True))
        out = out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
        return batch.append_column("dedup_keep", out).select(out_cols)

    return negatives.union(joined.map_batches(flag_positives, batch_format="pyarrow"))
