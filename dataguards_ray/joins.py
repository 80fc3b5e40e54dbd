"""Joins / lookups (SURVEY §2.6 J1–J4).

Broadcast-first design: small sides ship once via ``ray.put`` and join
map-side inside ``map_batches`` (no shuffle); only genuinely large-large
joins use ``Dataset.join`` (hash-partitioned, ray 2.49).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Max, Sum

from .steps.dedup import get_broadcast


def broadcast_lookup(
    ds: Dataset,
    small: dict,
    key: str,
    out_col: str,
    *,
    default=None,
    out_type: pa.DataType | None = None,
) -> Dataset:
    """J1: map-side hash join against a broadcast dict (blocklists,
    per-language thresholds...).  Appends ``out_col = small.get(row[key])``.

    Vectorized (round-5) when the dict is Arrow-shaped (uniform
    hashable keys, no None key/value): the probe is one
    ``pc.index_in`` + ``take`` per batch — no per-row Python over the
    corpus-sized side.  Exotic dicts (mixed types, None entries) keep
    the scalar path; per-batch type clashes fall back row-wise too."""
    vec = None
    try:
        if small and None not in small and not any(
                v is None for v in small.values()):
            vec = (pa.array(list(small.keys())),
                   pa.array(list(small.values()), type=out_type))
    except (TypeError, pa.ArrowInvalid, pa.ArrowTypeError,
            pa.ArrowNotImplementedError):
        vec = None
    ref = ray.put((small, vec))

    def _lookup(batch: pa.Table) -> pa.Table:
        d, v = get_broadcast(ref)
        col = batch.column(key)
        if v is not None:
            try:
                ks, vs = v
                got = pc.take(vs, pc.index_in(col, value_set=ks))
                if default is not None:
                    # absent keys (and null keys) → default, matching
                    # d.get(k, default); present-None values can't
                    # occur on this path (guarded above)
                    got = pc.fill_null(got, default)
                if out_type is not None and got.type != out_type:
                    got = pc.cast(got, out_type)
                if isinstance(got, pa.ChunkedArray):
                    got = got.combine_chunks()
                return batch.append_column(out_col, got)
            except (pa.ArrowInvalid, pa.ArrowTypeError,
                    pa.ArrowNotImplementedError, TypeError):
                pass  # this batch's key type fights the kernel → scalar
        vals = [d.get(k, default) for k in col.to_pylist()]
        arr = pa.array(vals, type=out_type) if out_type else pa.array(vals)
        return batch.append_column(out_col, arr)

    return ds.map_batches(_lookup, batch_format="pyarrow")


def scrub_empty_blocks(
    ds: Dataset, num_blocks: int = 8, *, schema: "pa.Schema | None" = None
) -> Dataset:
    """Work around a Ray Data 2.49 quirk: hash aggregates can emit 0-row
    blocks with an EMPTY schema.  Those blocks BYPASS map_batches (so no
    UDF can normalize them) and poison a downstream ``Dataset.join``
    ("No match ... for key field reference" at shuffle finalize).
    ``repartition`` coalesces blocks and drops the schemaless empties —
    apply to any aggregate output that feeds a join.  ``num_blocks``
    caps downstream parallelism for that dataset, so size it to the
    data (large key sets: pass the join's num_partitions or more).

    ``num_blocks`` is clamped to the row count: ``repartition(k)`` with
    k > n itself emits schemaless 0-row blocks (the exact poison this
    helper scrubs) — Ray splits evenly, so blocks are all non-empty iff
    n ≥ k ≥ 1.  A fully EMPTY input gets rebuilt as one typed empty
    block from the plan schema (repartition(1) of an empty dataset is
    still schemaless).  Caveat: a chain that FILTERS down to 0 rows
    loses its schema entirely in Ray 2.49 (the filter task emits a
    zero-COLUMN block and the plan forgets the pre-filter schema) — pass
    ``schema`` explicitly when the caller knows it, else the empty case
    degrades to a schemaless pass-through.  NOTE: this materializes
    `ds` at call time to learn n — hand it thin data (aggregate
    outputs, key sets), and expect any lazy upstream chain to execute
    here."""
    import ray.data as rd

    try:  # plan-level schema BEFORE executing: a fully-empty
        pre = ds.schema(fetch_if_missing=False)  # materialized dataset
    except Exception:  # forgets its schema entirely
        pre = None
    mat = ds.materialize()
    n = mat.count()
    if n == 0:
        s = pre or mat.schema(fetch_if_missing=True)
        if s is not None:
            s = pa.schema(s.base_schema)
            if len(s) == 0:  # filtered-to-empty zero-column block
                s = None
        if s is None:
            s = schema
        if s is None:  # no schema recoverable anywhere — pass through
            return mat
        return rd.from_arrow(s.empty_table())
    return mat.repartition(max(1, min(num_blocks, n)))


def hash_join(
    left: Dataset,
    right: Dataset,
    on: Sequence[str],
    *,
    how: str = "inner",
    num_partitions: int = 16,
    right_on: Sequence[str] | None = None,
    left_suffix: str | None = None,
    right_suffix: str | None = "_r",
) -> Dataset:
    """J2: large-large equi-join → ``Dataset.join`` (hash-partitioned
    shuffle of both sides — use broadcast_lookup when one side is small).

    Ray 2.49 PARTITION-COVERAGE caveat (beyond the scrub_empty_blocks
    block-level quirk): the join aggregator materializes each hash
    partition with an ArrowBlockBuilder, and a partition that receives
    ZERO blocks from one side builds a schemaless empty table —
    ``pa.Table.join`` then raises ``No match for key field reference``.
    Keep ``num_partitions`` well under the distinct-key count of the
    SMALLER side (or use ``outer_join_by_key`` / ``broadcast_lookup``
    for key-sparse sides).  Corollary: a fully EMPTY side always crashes
    (its 0-row blocks — typed or not — never reach the aggregator);
    callers must short-circuit the empty case themselves
    (``verify_pairs_jaccard`` shows the pattern)."""
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )


def _distinct_keys(ds: Dataset, key: str) -> Dataset:
    """Distinct non-null key values as a (key, n) Dataset: per-batch
    partial dedup (one row per key per batch) + a global groupby.  Null
    keys are dropped here — they never equi-match, and an (all-)null key
    column breaks Ray's sort-based groupby boundary sampling."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key]).filter(pc.is_valid(batch.column(key)))
        t = t.group_by(key).aggregate([(key, "count")])
        return t.rename_columns([key, "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("n", alias_name="n"))
    )


def _key_set(ds: Dataset, key: str) -> set:
    """Driver-side distinct keys (small sides only)."""
    return {r[key] for r in _distinct_keys(ds, key).take_all()}


def _bloom_of(keys_ds: Dataset, key: str, n: int, fp_rate: float):
    """Build a Bloom filter by STREAMING the distinct-key Dataset through
    the driver (O(bloom) memory, never an exact key set)."""
    from .bloom import BloomFilter

    bf = BloomFilter(n, fp_rate)
    for b in keys_ds.iter_batches(batch_format="pyarrow"):
        bf.update(b.column(key).to_pylist())
    return bf


def semi_join(
    left: Dataset,
    right: Dataset,
    key: str,
    *,
    right_key: str | None = None,
    max_broadcast_keys: int = 1_000_000,
    bloom_fp_rate: float = 0.001,
    num_partitions: int = 16,
) -> Dataset:
    """J3: rows of `left` WITH a match in `right`.

    Small right side (≤ max_broadcast_keys distinct keys): broadcast
    key-set membership filter — no shuffle of `left` at all.  Large
    right side (the SURVEY §2.6 scale path, wired in round 2): Bloom
    prefilter map-side (drops ~all non-matching rows for the cost of a
    broadcast bit array), then an exact ``left_semi`` join against the
    distinct-key Dataset re-checks the ~fp_rate false positives —
    results are identical to the exact path, only the shuffled volume
    changes."""
    rk = right_key or key
    keys_ds = scrub_empty_blocks(
        _distinct_keys(right, rk), num_blocks=max(num_partitions, 16)
    ).materialize()
    n = keys_ds.count()
    if n == 0:  # empty right side → no row can match
        return left.map_batches(lambda b: b.slice(0, 0), batch_format="pyarrow")

    if n <= max_broadcast_keys:
        vs = pa.array([r[rk] for r in keys_ds.take_all()])
        ref = ray.put(vs)

        def _filter(batch: pa.Table) -> pa.Table:
            hit = pc.fill_null(
                pc.is_in(batch.column(key), value_set=get_broadcast(ref)), False
            )
            return batch.filter(hit)

        return left.map_batches(_filter, batch_format="pyarrow")

    bref = ray.put(_bloom_of(keys_ds, rk, n, bloom_fp_rate))

    def prefilter(batch: pa.Table) -> pa.Table:
        bf = get_broadcast(bref)
        col = batch.column(key)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        mask = bf.contains_many(
            ["" if v is None else v for v in col.to_pylist()]
        ) & valid
        return batch.filter(pa.array(mask, type=pa.bool_()))

    pref = left.map_batches(prefilter, batch_format="pyarrow")
    return pref.join(
        keys_ds.select_columns([rk]),
        join_type="left_semi",
        num_partitions=num_partitions,
        on=(key,),
        right_on=(rk,),
    )


def anti_join(
    left: Dataset,
    right: Dataset,
    key: str,
    *,
    right_key: str | None = None,
    max_broadcast_keys: int = 1_000_000,
    bloom_fp_rate: float = 0.001,
    num_partitions: int = 16,
) -> Dataset:
    """J3: rows of `left` WITHOUT a match in `right` (null left keys
    kept: null never equals any right key).

    Large right side: Bloom-negative rows are definite keeps and skip
    the shuffle entirely; only Bloom-positive rows (matches + ~fp_rate
    false positives) go through an exact ``left_anti`` join.  NOTE: the
    Bloom path consumes `left` twice (negatives + positives), which
    re-executes its upstream chain per branch — hand it a read or a
    materialized Dataset, not an expensive lazy pipeline."""
    rk = right_key or key
    keys_ds = scrub_empty_blocks(
        _distinct_keys(right, rk), num_blocks=max(num_partitions, 16)
    ).materialize()
    n = keys_ds.count()
    if n == 0:  # empty right side → every left row survives
        return left

    if n <= max_broadcast_keys:
        vs = pa.array([r[rk] for r in keys_ds.take_all()])
        ref = ray.put(vs)

        def _filter(batch: pa.Table) -> pa.Table:
            hit = pc.fill_null(
                pc.is_in(batch.column(key), value_set=get_broadcast(ref)), False
            )
            return batch.filter(pc.invert(hit))

        return left.map_batches(_filter, batch_format="pyarrow")

    bref = ray.put(_bloom_of(keys_ds, rk, n, bloom_fp_rate))

    def _bloom_mask(batch: pa.Table) -> np.ndarray:
        bf = get_broadcast(bref)
        col = batch.column(key)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        return bf.contains_many(
            ["" if v is None else v for v in col.to_pylist()]
        ) & valid

    def keep_negatives(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(~_bloom_mask(batch), type=pa.bool_()))

    def keep_positives(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(_bloom_mask(batch), type=pa.bool_()))

    negatives = left.map_batches(keep_negatives, batch_format="pyarrow")
    positives = left.map_batches(keep_positives, batch_format="pyarrow")
    false_pos = positives.join(
        keys_ds.select_columns([rk]),
        join_type="left_anti",
        num_partitions=num_partitions,
        on=(key,),
        right_on=(rk,),
    )
    return negatives.union(false_pos)


def latest_by_key(
    ds: Dataset,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    *,
    strategy: str = "auto",
    max_broadcast_keys: int = 1_000_000,
) -> Dataset:
    """J4 (as-of newest analog): ONE winner row per key = max (ts, tiebreak).

    strategy="broadcast": thin winner pass (per-batch partial max-rank,
    tiny global groupby, winner value_set broadcast) then one vectorized
    filter — the dataset itself is never shuffled.  Holds one value_set
    entry per distinct key on the driver.

    strategy="shuffle": ``groupby(key).map_groups`` picks the winner
    inside each group — full-data shuffle, zero driver state; the scale
    path for very high key cardinality.

    strategy="auto" (default, round-2 verdict item #7): runs the thin
    partial aggregate, counts distinct keys, and broadcasts when they
    fit under ``max_broadcast_keys``, else falls back to the shuffle
    (the thin partial pass is the only wasted work).

    rank = (biased ts, biased tiebreak) must be unique per key (include
    a unique column as tiebreak)."""

    def _enc(col) -> pa.Array:
        # unambiguous key encoding: "v\x1f<str>" for valid keys, "n" for
        # null — a literal key value can never collide with the null
        # sentinel, and every groupby runs over this non-null string
        # (mixed null/value key columns break Ray's sort-based groupby
        # boundary sampling)
        s = pc.cast(col, pa.string())
        tagged = pc.binary_join_element_wise(pa.scalar("v"), pc.fill_null(s, ""), "\x1f")
        out = pc.if_else(pc.is_valid(s), tagged, pa.scalar("n"))
        return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out

    def _winner_shuffle() -> Dataset:
        def add_gk(batch: pa.Table) -> pa.Table:
            return batch.append_column("__gk", _enc(batch.column(key)))

        def pick(group: pa.Table) -> pa.Table:
            ts = pc.cast(group.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
            tb = pc.cast(group.column(tiebreak_col), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            order = np.lexsort((tb, ts))  # primary ts, then tiebreak
            return group.take(pa.array([int(order[-1])], type=pa.int64())).drop_columns(
                ["__gk"]
            )

        return ds.map_batches(add_gk, batch_format="pyarrow").groupby("__gk").map_groups(
            pick, batch_format="pyarrow"
        )

    if strategy == "shuffle":
        return _winner_shuffle()
    if strategy not in ("auto", "broadcast"):
        raise ValueError(f"unknown strategy {strategy!r}")

    def _biased(col) -> pa.Array:
        # order-preserving int64 → uint64 bias (x + 2^63 mod 2^64): negative
        # values (pre-1970 timestamps, negative ids) sort correctly after
        # zero-padding — uint64 max is exactly 20 decimal digits.
        u = pc.cast(pc.cast(col, pa.int64()), pa.uint64(), safe=False)
        return pc.add(u, pa.scalar(1 << 63, type=pa.uint64()))

    def rank_of(batch: pa.Table) -> pa.Array:
        ts = pc.utf8_lpad(pc.cast(_biased(batch.column(ts_col)), pa.string()), 20, padding="0")
        tb = pc.utf8_lpad(
            pc.cast(_biased(batch.column(tiebreak_col)), pa.string()), 20, padding="0"
        )
        return pc.binary_join_element_wise(ts, tb, "|")

    def partial(batch: pa.Table) -> pa.Table:
        # group on the ENCODED key so null keys form a group without
        # breaking the Ray sort groupby downstream
        t = pa.table({"__gk": _enc(batch.column(key)), "r": rank_of(batch)})
        return t.group_by("__gk").aggregate([("r", "max")]).rename_columns(["__gk", "r"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__gk")
        .aggregate(Max("r", alias_name="r"))
        .materialize()
    )
    if strategy == "auto" and agg.count() > max_broadcast_keys:
        return _winner_shuffle()
    rows = agg.take_all()
    if not rows:
        return ds

    # one "enc(key)\x1frank" value_set built on the driver; the filter is
    # a single vectorized pc.is_in probe (no per-row dict lookups)
    key_vals = pa.array([r["__gk"] for r in rows], type=pa.string())
    rank_vals = pa.array([r["r"] for r in rows], type=pa.string())
    winner_keys = pc.binary_join_element_wise(key_vals, rank_vals, "\x1f")
    ref = ray.put(winner_keys)

    def _filter(batch: pa.Table) -> pa.Table:
        wk = get_broadcast(ref)
        keyed = pc.binary_join_element_wise(_enc(batch.column(key)), rank_of(batch), "\x1f")
        return batch.filter(pc.is_in(keyed, value_set=wk))

    return ds.map_batches(_filter, batch_format="pyarrow")


def outer_join_by_key(
    left: Dataset,
    right: Dataset,
    key: str,
    *,
    right_key: str | None = None,
    how: str = "full",
    right_suffix: str = "_r",
    max_group_pairs: int = 10_000_000,
    num_buckets: int = 64,
) -> Dataset:
    """Equi-join (full / left / right / inner) as a tagged-union groupby —
    the engine's robust outer-join path: no Dataset.join, so neither the
    schemaless-empty-block quirk nor the partition-coverage caveat (see
    hash_join) applies, and null keys follow SQL semantics exactly (a
    null key never matches: its rows null-extend on their own side).

    Both sides shuffle once, hash-partitioned by the encoded key; each
    group emits the cross product of its left × right rows (guarded by
    ``max_group_pairs``), or null-extended singles when a side is absent
    (kept for "full", and for the present side's direction in
    "left"/"right"; "inner" emits matches only — prefer it over
    left+non-null-filter, which drags every unmatched row through the
    gather and a downstream filter).  Output = left columns + right
    columns (clashing
    names get ``right_suffix``; both key columns are kept, SQL-style —
    COALESCE downstream if you want one)."""
    if how not in ("full", "left", "right", "inner"):
        raise ValueError("how must be 'full', 'left', 'right' or 'inner'")
    rk = right_key or key

    l_cols = [f.name for f in pa.schema(left.schema().base_schema)]
    r_cols = [f.name for f in pa.schema(right.schema().base_schema)]
    out_r_cols = {c: (c + right_suffix if c in l_cols else c) for c in r_cols}
    # fail BEFORE the shuffle on output-name collisions (e.g. left has a
    # literal "v_r" while right's "v" suffixes to "v_r")
    clashes = [
        o for c, o in out_r_cols.items()
        if (o != c and o in l_cols) or list(out_r_cols.values()).count(o) > 1
    ]
    if clashes:
        raise ValueError(
            f"outer_join_by_key output column collision(s) {sorted(set(clashes))}; "
            f"rename the inputs or pick a different right_suffix"
        )

    from .aggregates import encoded_group_key

    def tag(side: int, key_col: str):
        def _tag(b: pa.Table) -> pa.Table:
            b = b.append_column("__side", pa.array([side] * b.num_rows, type=pa.int8()))
            # each side encodes ITS OWN key column; "n" = null-key group
            return b.append_column("__gk", encoded_group_key(b, [key_col]))

        return _tag

    l_tag = left.map_batches(tag(0, key), batch_format="pyarrow")
    r_tag = right.map_batches(tag(1, rk), batch_format="pyarrow")

    ls = pa.schema(left.schema().base_schema)
    rs = pa.schema(right.schema().base_schema)
    all_cols = (
        [(c, ls.field(c).type) for c in l_cols]
        + [(out_r_cols[c], rs.field(c).type) for c in r_cols]
        + [("__side", pa.int8()), ("__gk", pa.string())]
    )

    def widen_l(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                n: (b.column(n) if n in b.schema.names else pa.nulls(b.num_rows, type=t))
                for n, t in all_cols
            }
        )

    def widen_r(b: pa.Table) -> pa.Table:
        cols = {}
        back = {v: k for k, v in out_r_cols.items()}
        for n, t in all_cols:
            src = back.get(n) if n in back else (n if n in ("__side", "__gk") else None)
            cols[n] = b.column(src) if src is not None else pa.nulls(b.num_rows, type=t)
        return pa.table(cols)

    both = l_tag.map_batches(widen_l, batch_format="pyarrow").union(
        r_tag.map_batches(widen_r, batch_format="pyarrow")
    )
    out_names = l_cols + [out_r_cols[c] for c in r_cols]

    # Group by a HASH BUCKET of the key, not the key itself: one
    # vectorized kernel call per bucket instead of one Python call per
    # distinct key (the per-key version measured 4-8× slower on the
    # TPC-H Q7/Q8/Q21 shapes at sf0.1 and is a per-row Python tax at
    # corpus scale).  Within a bucket the equi-join is dictionary-encode
    # + argsort + searchsorted + a repeat/ramp gather — no row loops.
    # ``num_buckets`` bounds join parallelism — raise it toward the
    # cluster's core count for multi-node runs (64 ≈ 2× a 32-core box).
    from .hashutil import fnv1a64_array

    def bucket(b: pa.Table) -> pa.Table:
        h = fnv1a64_array(b.column("__gk").combine_chunks()
                          if isinstance(b.column("__gk"), pa.ChunkedArray)
                          else b.column("__gk"))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    def kernel(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        gk = group.column("__gk")
        side = group.column("__side").to_numpy(zero_copy_only=False)
        nullk = pc.equal(gk, "n").to_numpy(zero_copy_only=False)
        codes_arr = pc.dictionary_encode(gk)
        codes = (codes_arr.combine_chunks() if isinstance(
            codes_arr, pa.ChunkedArray) else codes_arr
        ).indices.to_numpy(zero_copy_only=False).astype(np.int64)

        l_idx = np.nonzero((side == 0) & ~nullk)[0]
        r_idx = np.nonzero((side == 1) & ~nullk)[0]
        l_codes = codes[l_idx]
        r_codes = codes[r_idx]
        order = np.argsort(r_codes, kind="stable")
        rs = r_codes[order]
        starts = np.searchsorted(rs, l_codes, "left")
        ends = np.searchsorted(rs, l_codes, "right")
        counts = ends - starts
        if len(l_codes):
            # per-KEY blowup guard (same contract as the per-key kernel)
            uniq, first = np.unique(l_codes, return_index=True)
            nl_u = np.bincount(
                np.searchsorted(uniq, l_codes), minlength=len(uniq))
            worst = int((nl_u * counts[first]).max()) if len(uniq) else 0
            if worst > max_group_pairs:
                raise ValueError(
                    f"outer_join_by_key group would emit {worst} pairs "
                    f"> max_group_pairs={max_group_pairs} (skewed key?)"
                )
        total = int(counts.sum())
        lt_m = np.repeat(l_idx, counts)
        base = np.repeat(starts, counts)
        ramp = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts)
        rt_m = r_idx[order[base + ramp]]

        lt_parts = [lt_m]
        lt_null = [np.zeros(total, dtype=bool)]
        rt_parts = [rt_m]
        rt_null = [np.zeros(total, dtype=bool)]
        if how in ("full", "left"):
            l_un = np.concatenate(
                [l_idx[counts == 0], np.nonzero((side == 0) & nullk)[0]])
            lt_parts.append(l_un)
            lt_null.append(np.zeros(len(l_un), dtype=bool))
            rt_parts.append(np.zeros(len(l_un), dtype=np.int64))
            rt_null.append(np.ones(len(l_un), dtype=bool))
        if how in ("full", "right"):
            r_un = np.concatenate(
                [r_idx[~np.isin(r_codes, l_codes)],
                 np.nonzero((side == 1) & nullk)[0]])
            lt_parts.append(np.zeros(len(r_un), dtype=np.int64))
            lt_null.append(np.ones(len(r_un), dtype=bool))
            rt_parts.append(r_un)
            rt_null.append(np.zeros(len(r_un), dtype=bool))
        lt = pa.array(np.concatenate(lt_parts),
                      mask=np.concatenate(lt_null), type=pa.int64())
        rt = pa.array(np.concatenate(rt_parts),
                      mask=np.concatenate(rt_null), type=pa.int64())
        cols: dict[str, pa.Array] = {}
        for c in l_cols:
            cols[c] = pc.take(group.column(c), lt)
        for c in r_cols:
            cols[out_r_cols[c]] = pc.take(group.column(out_r_cols[c]), rt)
        return pa.table(cols)

    keyed = both.map_batches(bucket, batch_format="pyarrow")
    # select via map_batches, not select_columns: a Project placed
    # directly on a map_groups output can surface the UNPROJECTED
    # schema to downstream schema() callers (seen chaining two joins at
    # tiny SFs), which breaks anything that plans columns from it
    return keyed.groupby("__b").map_groups(
        kernel, batch_format="pyarrow").map_batches(
        lambda b: b.select(out_names), batch_format="pyarrow")


def range_join(
    points: Dataset,
    intervals: Dataset,
    *,
    key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    right_suffix: str = "_r",
    bucket_us: int | None = None,
    max_span_buckets: int = 64,
) -> Dataset:
    """Point-in-interval range join (the J4 family's third member next
    to asof_join/latest_by_key): for each row of ``points``, every row
    of ``intervals`` with the same ``key`` and
    ``start_col <= ts <= end_col`` (inclusive both ends — SQL
    ``BETWEEN``).  Output = point columns + interval columns (clashing
    names get ``right_suffix``); inner semantics (unmatched points drop,
    null keys / null timestamps drop — they can never satisfy BETWEEN).

    Scale shape: time is cut into ``bucket_us`` buckets; each interval
    row is EXPLODED into every bucket it spans while each point lands in
    exactly one bucket, so a true (point, interval) pair meets in
    precisely the point's bucket — co-location without any dedup pass.
    Inside each ``groupby(key, bucket)`` group one searchsorted over the
    sorted point timestamps finds each interval's [lo, hi) match slice
    and the pairs are emitted by a vectorized arange-concat (no Python
    loop over rows).  The all-to-all moves points once and intervals
    ``span/bucket_us`` times — pick ``bucket_us`` ≈ the typical interval
    width (default: the max width, measured by a thin pre-pass), and cap
    degenerate spans with ``max_span_buckets``.
    """
    if bucket_us is None:
        # the auto-bucket pre-pass consumes `intervals` twice (span scan
        # + the join itself) — materialize first so a lazy upstream
        # chain isn't re-executed per consumer (§5.4 never-branch rule)
        intervals = intervals.materialize()

        # thin pre-pass: only (start, end) leave the interval side
        def span(b: pa.Table) -> pa.Table:
            s = pc.cast(b.column(start_col), pa.int64())
            e = pc.cast(b.column(end_col), pa.int64())
            w = pc.max(pc.subtract(e, s))
            return pa.table({"w": pa.array([w.as_py()], type=pa.int64())})

        spans = intervals.select_columns([start_col, end_col]).map_batches(
            span, batch_format="pyarrow"
        )
        widths = [r["w"] for r in spans.take_all() if r["w"] is not None]
        bucket_us = max(max(widths, default=0), 1)

    p_cols = [f.name for f in pa.schema(points.schema().base_schema)]
    i_cols = [f.name for f in pa.schema(intervals.schema().base_schema)]
    # the equi-key is SHARED (both sides' values are equal within a
    # group) — never suffix it, or interval rows lose their group key
    out_i_cols = {
        c: (c + right_suffix if (c in p_cols and c != key) else c) for c in i_cols
    }
    clashes = [
        o for c, o in out_i_cols.items()
        if (o != c and o in p_cols) or list(out_i_cols.values()).count(o) > 1
    ]
    if clashes:
        raise ValueError(
            f"range_join output column collision(s) {sorted(set(clashes))}; "
            f"rename the inputs or pick a different right_suffix"
        )

    def prep_points(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(pc.is_valid(b.column(key)), pc.is_valid(b.column(ts_col)))
        )
        ts = pc.cast(b.column(ts_col), pa.int64())
        b = b.append_column("__b", pc.cast(_floor_div(ts, bucket_us), pa.int64()))
        b = b.append_column("__side", pa.array([0] * b.num_rows, type=pa.int8()))
        return b

    def prep_intervals(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b.column(key)), pc.is_valid(b.column(start_col))),
                pc.is_valid(b.column(end_col)),
            )
        )
        s = pc.cast(b.column(start_col), pa.int64()).to_numpy(zero_copy_only=False)
        e = pc.cast(b.column(end_col), pa.int64()).to_numpy(zero_copy_only=False)
        b0 = np.floor_divide(s, bucket_us)
        b1 = np.floor_divide(e, bucket_us)
        nbk = np.maximum(b1 - b0 + 1, 0)  # end < start ⇒ empty interval, 0 buckets
        if nbk.size and nbk.max() > max_span_buckets:
            raise ValueError(
                f"interval spans {int(nbk.max())} buckets > max_span_buckets="
                f"{max_span_buckets}; widen bucket_us"
            )
        total = int(nbk.sum())
        row_take = np.repeat(np.arange(len(nbk)), nbk)
        # vectorized concat of aranges: bucket index within each row's span
        offs = np.arange(total) - np.repeat(np.cumsum(nbk) - nbk, nbk)
        t = b.take(pa.array(row_take, type=pa.int64()))
        t = t.append_column("__b", pa.array(b0[row_take] + offs, type=pa.int64()))
        return t.append_column("__side", pa.array([1] * t.num_rows, type=pa.int8()))

    p_tag = points.map_batches(prep_points, batch_format="pyarrow")
    i_tag = intervals.map_batches(prep_intervals, batch_format="pyarrow")

    # union needs one schema: null-extend each side with the other's columns
    ps = pa.schema(points.schema().base_schema)
    i_s = pa.schema(intervals.schema().base_schema)
    all_cols = (
        [(c, ps.field(c).type) for c in p_cols]
        + [(out_i_cols[c], i_s.field(c).type) for c in i_cols]
        + [("__b", pa.int64()), ("__side", pa.int8())]
    )

    def widen_p(b: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in all_cols:
            cols[name] = (
                b.column(name) if name in b.schema.names else pa.nulls(b.num_rows, type=typ)
            )
        return pa.table(cols)

    def widen_i(b: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in all_cols:
            src = None
            if name in (out_i_cols[c] for c in i_cols):
                src = next(c for c in i_cols if out_i_cols[c] == name)
            elif name in ("__b", "__side"):
                src = name
            cols[name] = (
                b.column(src) if src is not None else pa.nulls(b.num_rows, type=typ)
            )
        return pa.table(cols)

    both = p_tag.map_batches(widen_p, batch_format="pyarrow").union(
        i_tag.map_batches(widen_i, batch_format="pyarrow")
    )
    from .aggregates import encoded_group_key

    keyed = both.map_batches(
        lambda b: b.append_column(
            "__gk",
            pc.binary_join_element_wise(
                encoded_group_key(b, [key]),
                pc.cast(b.column("__b"), pa.string()),
                "\x1f",
            ),
        ),
        batch_format="pyarrow",
    )
    out_ts = ts_col  # point ts column name in the widened table
    out_start = out_i_cols[start_col]
    out_end = out_i_cols[end_col]

    def kernel(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gk", "__b"])
        side = group.column("__side").to_numpy(zero_copy_only=False)
        p_idx = np.nonzero(side == 0)[0]
        i_idx = np.nonzero(side == 1)[0]
        out_names = [c for c in p_cols] + [out_i_cols[c] for c in i_cols]
        if len(p_idx) == 0 or len(i_idx) == 0:
            empty = pa.array([], type=pa.int64())
            return pa.table({c: pc.take(group.column(c), empty) for c in out_names})
        # fill the other side's nulls BEFORE to_numpy: a nullable int64
        # converts to float64 (NaN), which silently rounds epoch-µs
        # values past 2^53.  The filled zeros are never indexed (each
        # side only reads its own rows).
        def _i64(col) -> np.ndarray:
            return pc.fill_null(pc.cast(col, pa.int64()), 0).to_numpy(
                zero_copy_only=False
            )

        ts = _i64(group.column(out_ts))
        s = _i64(group.column(out_start))
        e = _i64(group.column(out_end))
        order = p_idx[np.argsort(ts[p_idx], kind="stable")]
        pts = ts[order]
        lo = np.searchsorted(pts, s[i_idx], side="left")
        hi = np.searchsorted(pts, e[i_idx], side="right")
        cnt = np.maximum(hi - lo, 0)
        total = int(cnt.sum())
        i_take = np.repeat(i_idx, cnt)
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        p_take = order[np.repeat(lo, cnt) + offs]
        pt = pa.array(p_take.astype(np.int64), type=pa.int64())
        it = pa.array(i_take.astype(np.int64), type=pa.int64())
        cols: dict[str, pa.Array] = {}
        for c in p_cols:
            cols[c] = pc.take(group.column(c), pt)
        for c in i_cols:
            if out_i_cols[c] == key:
                continue  # shared equi-key: already taken from the point side
            cols[out_i_cols[c]] = pc.take(group.column(out_i_cols[c]), it)
        return pa.table(cols)

    return keyed.groupby("__gk").map_groups(kernel, batch_format="pyarrow")


def _floor_div(arr: pa.Array, d: int) -> pa.Array:
    """Arrow floor division for int64 (pc.divide truncates toward zero)."""
    import numpy as np

    v = (
        arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    ).to_numpy(zero_copy_only=False)
    return pa.array(np.floor_divide(v, d), type=pa.int64())


def asof_join(
    left: Dataset,
    right: Dataset,
    *,
    key: str,
    ts_col: str,
    right_suffix: str = "_r",
    bucket_us: int | None = None,
    max_summaries: int = 2_000_000,
    num_buckets: int = 256,
) -> Dataset:
    """J4 as-of join: for each left row, the LATEST right row of the same
    key with right.ts ≤ left.ts (backward, inclusive — DuckDB ASOF JOIN
    semantics).  Left rows with no match keep nulls.

    ``num_buckets`` (round-5): the default path groups by
    ``fnv1a64(key) % num_buckets`` instead of by raw key, and one
    vectorized kernel handles every key in the bucket (dictionary-
    encoded key codes + a rank-composite searchsorted) — a corpus with
    millions of keys pays ``num_buckets`` kernel calls, not millions.
    Size it so corpus/num_buckets fits a worker's heap (one bucket is
    materialized per kernel call); the per-key memory bound of the old
    path becomes a per-bucket bound here.

    Implementation (ray_guide as-of pattern): tag sides, union, one
    hash-partitioned ``groupby``; inside each group a numpy
    ``searchsorted`` over the sorted right timestamps picks the match —
    Arrow-native end to end (the round-1 pandas ``merge_asof`` kernel is
    gone, round-2 verdict item #8).

    ``bucket_us`` = the time-range SALT for skewed keys (round 2): rows
    co-locate by (key, floor(ts/bucket_us)) so one hot key's timeline
    spreads over many groups.  Exactness across bucket boundaries comes
    from CARRY-IN rows: a thin pre-pass keeps the latest right row per
    (key, bucket) (bounded groups), those summaries are broadcast, and
    each bucket group prepends its predecessor bucket's latest right row
    before the searchsorted — only the latest earlier row can ever win a
    backward join, so this is exact.  Summary count = hot keys ×
    buckets; capped by ``max_summaries`` (the salt targets few-hot-key
    skew).  Tie caveat (both paths): duplicate right (key, ts) rows make
    the matched row ambiguous — keep right (key, ts) unique."""
    l_tag = left.map_batches(
        lambda b: b.append_column("__side", pa.array([0] * b.num_rows, type=pa.int8())),
        batch_format="pyarrow",
    )
    # right rows with a null key can never equi-match — drop them here
    # (also keeps nulls out of the groupby; left null-key rows survive in
    # their own encoded group and null-extend, per SQL join semantics)
    def _tag_right(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(key)))
        return b.append_column("__side", pa.array([1] * b.num_rows, type=pa.int8()))

    r_tag = right.map_batches(_tag_right, batch_format="pyarrow")
    l_cols = [f.name for f in pa.schema(left.schema().base_schema)]
    r_cols = [f.name for f in pa.schema(right.schema().base_schema)]

    out_r_cols = {c: (c + right_suffix if c in l_cols else c) for c in r_cols}

    def _enc_key(b: pa.Table) -> pa.Array:
        s = pc.cast(b.column(key), pa.string())
        tagged = pc.binary_join_element_wise(pa.scalar("v"), pc.fill_null(s, ""), "\x1f")
        out = pc.if_else(pc.is_valid(s), tagged, pa.scalar("n"))
        return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out

    def kernel(group: pa.Table) -> pa.Table:
        if "__ak" in group.schema.names:
            group = group.drop_columns(["__ak"])
        side = group.column("__side").to_numpy(zero_copy_only=False)
        ts = pc.cast(group.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        l_idx = np.nonzero(side == 0)[0]
        r_idx = np.nonzero(side == 1)[0]
        l_order = l_idx[np.argsort(ts[l_idx], kind="stable")]
        r_order = r_idx[np.argsort(ts[r_idx], kind="stable")]
        # backward inclusive: last right row with rt ≤ lt (ties → last in
        # right sort order, matching merge_asof/ASOF JOIN)
        if len(r_order) == 0:  # no right rows for this key → all unmatched
            r_take = pa.nulls(len(l_order), type=pa.int64())
        else:
            pos = np.searchsorted(ts[r_order], ts[l_order], side="right") - 1
            matched = pos >= 0
            r_take = pa.array(
                np.where(matched, r_order[np.clip(pos, 0, None)], 0).astype(np.int64),
                mask=~matched,  # null index → null row
                type=pa.int64(),
            )
        l_take = pa.array(l_order.astype(np.int64), type=pa.int64())
        cols: dict[str, pa.Array] = {}
        for c in l_cols:
            cols[c] = pc.take(group.column(c), l_take)
        for c in r_cols:
            cols[out_r_cols[c]] = pc.take(group.column(c), r_take)
        return pa.table(cols)

    # union requires identical schemas → outer-join the tag columns first
    def widen(b: pa.Table, all_cols: list[tuple[str, pa.DataType]]) -> pa.Table:
        for name, typ in all_cols:
            if name not in b.schema.names:
                b = b.append_column(name, pa.nulls(b.num_rows, type=typ))
        return b.select([n for n, _ in all_cols])

    # derive schemas from the INPUTS + the known tag column: an EMPTY
    # side loses its schema after map_batches in Ray 2.49, and an empty
    # right side is legal (every left row null-extends)
    side_f = pa.field("__side", pa.int8())
    ls = pa.schema(list(pa.schema(left.schema().base_schema)) + [side_f])
    rs = pa.schema(list(pa.schema(right.schema().base_schema)) + [side_f])
    all_cols = [(f.name, f.type) for f in ls] + [
        (f.name, f.type) for f in rs if f.name not in ls.names
    ]
    both = l_tag.map_batches(
        lambda b: widen(b, all_cols), batch_format="pyarrow"
    ).union(r_tag.map_batches(lambda b: widen(b, all_cols), batch_format="pyarrow"))

    if bucket_us is None:
        from .hashutil import fnv1a64_array

        B = int(num_buckets)

        def add_hb(b: pa.Table) -> pa.Table:
            ak = _enc_key(b)
            hb = (fnv1a64_array(ak) % np.uint64(B)).astype(np.int64)
            return b.append_column("__ak", ak).append_column(
                "__hb", pa.array(hb, type=pa.int64()))

        def kernel_multi(group: pa.Table) -> pa.Table:
            """All keys of one hash bucket in one vectorized pass: sort
            both sides by (key code, ts rank) and one searchsorted over
            the composite rank finds each left row's backward match —
            exact per-key semantics, zero per-key Python."""
            ak = group.column("__ak")
            if isinstance(ak, pa.ChunkedArray):
                ak = ak.combine_chunks()
            codes = ak.dictionary_encode().indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            side = group.column("__side").to_numpy(zero_copy_only=False)
            ts = pc.cast(group.column(ts_col), pa.int64()).to_numpy(
                zero_copy_only=False)
            # composite = code * span + rank(ts): globally sorted by
            # (key, ts); rank-space keeps it overflow-safe (< n²) and
            # preserves ts ties exactly (equal rank ⇔ equal ts)
            uniq_ts = np.unique(ts)
            comb = codes * np.int64(len(uniq_ts) + 1) + np.searchsorted(
                uniq_ts, ts)
            l_idx = np.nonzero(side == 0)[0]
            r_idx = np.nonzero(side == 1)[0]
            l_sorted = l_idx[np.argsort(comb[l_idx], kind="stable")]
            r_sorted = r_idx[np.argsort(comb[r_idx], kind="stable")]
            if len(r_sorted) == 0:
                r_take = pa.nulls(len(l_sorted), type=pa.int64())
            else:
                pos = np.searchsorted(comb[r_sorted], comb[l_sorted],
                                      side="right") - 1
                safe = np.clip(pos, 0, None)
                # a hit must be the SAME key, not just an earlier code
                matched = (pos >= 0) & (
                    codes[r_sorted[safe]] == codes[l_sorted])
                r_take = pa.array(
                    np.where(matched, r_sorted[safe], 0).astype(np.int64),
                    mask=~matched, type=pa.int64())
            l_take = pa.array(l_sorted.astype(np.int64), type=pa.int64())
            cols: dict[str, pa.Array] = {}
            for c in l_cols:
                cols[c] = pc.take(group.column(c), l_take)
            for c in r_cols:
                cols[out_r_cols[c]] = pc.take(group.column(c), r_take)
            return pa.table(cols)

        both_k = both.map_batches(add_hb, batch_format="pyarrow")
        return both_k.groupby("__hb").map_groups(
            kernel_multi, batch_format="pyarrow")

    # --- time-range-salted path -------------------------------------------
    def add_bucket(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        return b.append_column(
            "__b", pa.array(ts // np.int64(bucket_us), type=pa.int64())
        )

    bucketed = both.map_batches(add_bucket, batch_format="pyarrow")

    # thin pre-pass: latest right row per (key, bucket) — bounded groups
    def bucket_summary(group: pa.Table) -> pa.Table:
        g = group.filter(pc.equal(group.column("__side"), 1))
        if g.num_rows == 0:
            return group.slice(0, 0)
        ts = pc.cast(g.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        return g.take(pa.array([int(np.argmax(ts))], type=pa.int64()))

    bucketed = bucketed.map_batches(
        lambda b: b.append_column("__ak", _enc_key(b)), batch_format="pyarrow"
    )
    summaries_ds = bucketed.groupby(["__ak", "__b"]).map_groups(
        bucket_summary, batch_format="pyarrow"
    ).materialize()
    n_sum = summaries_ds.count()
    if n_sum > max_summaries:
        raise ValueError(
            f"asof_join bucket summaries ({n_sum}) exceed max_summaries="
            f"{max_summaries}; widen bucket_us or drop the salt"
        )
    # carry structure: key → (sorted buckets, summary row per bucket)
    carry: dict = {}
    for row in summaries_ds.take_all():
        carry.setdefault(row[key], []).append((row["__b"], row))
    for k in carry:
        carry[k].sort(key=lambda t: t[0])
    cref = ray.put(carry)

    def kernel_with_carry(group: pa.Table) -> pa.Table:
        import bisect

        cmap = get_broadcast(cref)
        kval = group.column(key)[0].as_py()
        bval = group.column("__b")[0].as_py()
        entry = cmap.get(kval)
        if entry is not None:
            bks = [t[0] for t in entry]
            i = bisect.bisect_left(bks, bval) - 1
            if i >= 0:  # prepend the latest earlier right row (carry-in)
                row = entry[i][1]
                extra = pa.table(
                    {
                        n: (pa.array([bval], type=pa.int64()) if n == "__b"
                            else pa.array([row.get(n)], type=group.schema.field(n).type))
                        for n in group.schema.names
                    }
                )
                group = pa.concat_tables(
                    [group, extra.select(group.schema.names)], promote_options="default"
                )
        return kernel(group.drop_columns(["__b"]))

    return bucketed.groupby(["__ak", "__b"]).map_groups(
        kernel_with_carry, batch_format="pyarrow"
    )


def interval_join(
    left: Dataset,
    right: Dataset,
    *,
    key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    right_suffix: str = "_r",
    bucket_us: int | None = None,
    max_span_buckets: int = 64,
    max_group_pairs: int = 10_000_000,
) -> Dataset:
    """Interval-OVERLAP equi-join (the J4 family's fourth member): every
    (left, right) pair with the same ``key`` whose closed intervals
    intersect — SQL ``l.start <= r.end AND r.start <= l.end``.  Inner
    semantics; rows with a null key/bound or an INVERTED interval
    (end < start) drop — document the latter when mirroring in SQL.

    Scale shape: BOTH sides explode to every ``bucket_us`` time bucket
    their interval spans, so an overlapping pair shares one-or-more
    (key, bucket) groups; the pair is emitted ONLY in its CANONICAL
    bucket — the bucket containing ``max(l.start, r.start)``, which any
    overlapping pair provably shares (overlap ⇔ max-start ≤ min-end, so
    the max-start instant lies inside both intervals) — giving
    exactly-once output with no dedup pass.  Inside each group, rights
    are start-sorted; one searchsorted per left bounds the candidate
    slice (``r.start <= l.end``) and the remaining ``r.end >= l.start``
    + canonical-bucket tests are vectorized over the expansion.
    ``max_group_pairs`` guards the candidate expansion of a degenerate
    bucket (same role as outer_join_by_key's cap); ``bucket_us``
    defaults to the max interval width across both sides (span ≤ 2
    buckets), measured by thin pre-passes.
    """

    def _spans_max(ds: Dataset, s_col: str, e_col: str) -> int:
        def span(b: pa.Table) -> pa.Table:
            s = pc.cast(b.column(s_col), pa.int64())
            e = pc.cast(b.column(e_col), pa.int64())
            w = pc.max(pc.subtract(e, s))
            return pa.table({"w": pa.array([w.as_py()], type=pa.int64())})

        ws = ds.select_columns([s_col, e_col]).map_batches(
            span, batch_format="pyarrow")
        return max((r["w"] for r in ws.take_all() if r["w"] is not None),
                   default=0)

    if bucket_us is None:
        left = left.materialize()
        right = right.materialize()
        bucket_us = max(_spans_max(left, left_start, left_end),
                        _spans_max(right, right_start, right_end), 1)

    l_cols = [f.name for f in pa.schema(left.schema().base_schema)]
    r_cols = [f.name for f in pa.schema(right.schema().base_schema)]
    out_r_cols = {
        c: (c + right_suffix if (c in l_cols and c != key) else c)
        for c in r_cols
    }
    clashes = [
        o for c, o in out_r_cols.items()
        if (o != c and o in l_cols) or list(out_r_cols.values()).count(o) > 1
    ]
    if clashes:
        raise ValueError(
            f"interval_join output column collision(s) {sorted(set(clashes))}; "
            f"rename the inputs or pick a different right_suffix"
        )

    def _explode(side: int, s_col: str, e_col: str):
        def f(b: pa.Table) -> pa.Table:
            b = b.filter(
                pc.and_(
                    pc.and_(pc.is_valid(b.column(key)),
                            pc.is_valid(b.column(s_col))),
                    pc.is_valid(b.column(e_col)),
                )
            )
            s = pc.cast(b.column(s_col), pa.int64()).to_numpy(zero_copy_only=False)
            e = pc.cast(b.column(e_col), pa.int64()).to_numpy(zero_copy_only=False)
            ok = s <= e  # inverted intervals drop (documented)
            b = b.filter(pa.array(ok, type=pa.bool_()))
            s, e = s[ok], e[ok]
            b0 = np.floor_divide(s, bucket_us)
            b1 = np.floor_divide(e, bucket_us)
            nbk = b1 - b0 + 1
            if nbk.size and nbk.max() > max_span_buckets:
                raise ValueError(
                    f"interval spans {int(nbk.max())} buckets > "
                    f"max_span_buckets={max_span_buckets}; widen bucket_us"
                )
            total = int(nbk.sum())
            row_take = np.repeat(np.arange(len(nbk)), nbk)
            offs = np.arange(total) - np.repeat(np.cumsum(nbk) - nbk, nbk)
            t = b.take(pa.array(row_take, type=pa.int64()))
            t = t.append_column("__b", pa.array(b0[row_take] + offs, type=pa.int64()))
            return t.append_column("__side", pa.array([side] * t.num_rows, type=pa.int8()))

        return f

    l_tag = left.map_batches(_explode(0, left_start, left_end),
                             batch_format="pyarrow")
    r_tag = right.map_batches(_explode(1, right_start, right_end),
                              batch_format="pyarrow")

    ls = pa.schema(left.schema().base_schema)
    rs = pa.schema(right.schema().base_schema)
    all_cols = (
        [(c, ls.field(c).type) for c in l_cols]
        + [(out_r_cols[c], rs.field(c).type) for c in r_cols
           if out_r_cols[c] != key]
        + [("__b", pa.int64()), ("__side", pa.int8())]
    )

    def _widen(src_of: dict[str, str | None]):
        def f(b: pa.Table) -> pa.Table:
            cols = {}
            for name, typ in all_cols:
                src = src_of.get(name, name if name in ("__b", "__side") else None)
                cols[name] = (
                    b.column(src) if src is not None
                    else pa.nulls(b.num_rows, type=typ)
                )
            return pa.table(cols)

        return f

    both = l_tag.map_batches(
        _widen({c: c for c in l_cols}), batch_format="pyarrow"
    ).union(r_tag.map_batches(
        _widen({out_r_cols[c]: c for c in r_cols} | {key: key}),
        batch_format="pyarrow",
    ))

    from .aggregates import encoded_group_key

    keyed = both.map_batches(
        lambda b: b.append_column(
            "__gk",
            pc.binary_join_element_wise(
                encoded_group_key(b, [key]),
                pc.cast(b.column("__b"), pa.string()),
                "\x1f",
            ),
        ),
        batch_format="pyarrow",
    )
    o_ls, o_le = left_start, left_end
    o_rs, o_re = out_r_cols[right_start], out_r_cols[right_end]
    out_names = l_cols + [out_r_cols[c] for c in r_cols if out_r_cols[c] != key]

    def kernel(group: pa.Table) -> pa.Table:
        bkt = group.column("__b")[0].as_py()
        group = group.drop_columns(["__gk", "__b"])
        side = group.column("__side").to_numpy(zero_copy_only=False)
        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]
        if len(li) == 0 or len(ri) == 0:
            empty = pa.array([], type=pa.int64())
            return pa.table({c: pc.take(group.column(c), empty) for c in out_names})

        def _i64(col) -> np.ndarray:
            return pc.fill_null(pc.cast(col, pa.int64()), 0).to_numpy(
                zero_copy_only=False)

        sl = _i64(group.column(o_ls))
        el = _i64(group.column(o_le))
        sr = _i64(group.column(o_rs))
        er = _i64(group.column(o_re))
        order_r = ri[np.argsort(sr[ri], kind="stable")]
        srs = sr[order_r]
        hi = np.searchsorted(srs, el[li], side="right")  # r.start <= l.end
        total = int(hi.sum())
        if total > max_group_pairs:
            raise ValueError(
                f"interval_join group candidate expansion {total} > "
                f"max_group_pairs={max_group_pairs} (one hot (key, bucket) "
                f"group); shrink bucket_us or pre-split the key"
            )
        l_take = np.repeat(li, hi)
        offs = np.arange(total) - np.repeat(np.cumsum(hi) - hi, hi)
        r_take = order_r[offs]
        ms = np.maximum(sl[l_take], sr[r_take])
        keep = (er[r_take] >= sl[l_take]) & (np.floor_divide(ms, bucket_us) == bkt)
        lt = pa.array(l_take[keep].astype(np.int64), type=pa.int64())
        rt = pa.array(r_take[keep].astype(np.int64), type=pa.int64())
        cols: dict[str, pa.Array] = {}
        for c in l_cols:
            cols[c] = pc.take(group.column(c), lt)
        for c in r_cols:
            if out_r_cols[c] == key:
                continue  # shared equi-key: taken from the left side
            cols[out_r_cols[c]] = pc.take(group.column(out_r_cols[c]), rt)
        return pa.table(cols)

    return keyed.groupby("__gk").map_groups(kernel, batch_format="pyarrow")


def table_diff(
    left: Dataset,
    right: Dataset,
    key: str,
    *,
    compare_cols: "list[str] | None" = None,
    right_suffix: str = "_r",
) -> Dataset:
    """Dataset reconciliation (new-snapshot vs old-snapshot): one row
    per key present in either side whose row was added, removed, or
    changed — SQL ``FULL OUTER JOIN … WHERE l.k IS NULL OR r.k IS NULL
    OR any(c: l.c IS DISTINCT FROM r.c)``.  Equal rows drop.

    Returns (key, status) with status ∈ {added, removed, changed}
    ("added" = present only in ``right``).  ``compare_cols`` defaults to
    the non-key columns shared by both schemas.  Null keys never match
    (SQL): a null-key left row reports "removed", a null-key right row
    "added".  Rides outer_join_by_key's tagged-union cogroup — one
    shuffle of the PROJECTED (key + compare) columns per side, no
    driver state; keys must be near-unique per side (the cogroup emits
    the per-key cross product)."""
    ls = pa.schema(left.schema().base_schema)
    rs = pa.schema(right.schema().base_schema)
    if compare_cols is None:
        rnames = set(rs.names)
        compare_cols = [n for n in ls.names if n != key and n in rnames]
    def presence(flag: str):
        # presence must be tested via a never-null indicator, NOT key
        # nullness — a null-key row has null key columns on BOTH sides
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(flag, pa.array([1] * b.num_rows, type=pa.int8()))
        return f

    l2 = left.select_columns([key] + compare_cols).map_batches(
        presence("__lp"), batch_format="pyarrow")
    r2 = right.select_columns([key] + compare_cols).map_batches(
        presence("__rp"), batch_format="pyarrow")
    j = outer_join_by_key(l2, r2, key, how="full", right_suffix=right_suffix)
    rk_out = key + right_suffix

    def classify(b: pa.Table) -> pa.Table:
        lk, rk = b.column(key), b.column(rk_out)
        removed = pc.is_null(b.column("__rp"))
        added = pc.is_null(b.column("__lp"))
        changed = pa.array(np.zeros(b.num_rows, dtype=bool))
        for c in compare_cols:
            a, r = b.column(c), b.column(c + right_suffix)
            # IS DISTINCT FROM: null-ness differs, or both valid and !=
            d = pc.or_(
                pc.xor(pc.is_null(a), pc.is_null(r)),
                pc.fill_null(pc.not_equal(a, r), False),
            )
            changed = pc.or_(changed, d)
        status = pc.if_else(
            removed, pa.scalar("removed"),
            pc.if_else(added, pa.scalar("added"),
                       pc.if_else(changed, pa.scalar("changed"),
                                  pa.scalar(None, pa.string()))),
        )
        out = pa.table({key: pc.coalesce(lk, rk), "status": status})
        return out.filter(pc.is_valid(status))

    return j.map_batches(classify, batch_format="pyarrow")


def asof_join_forward(
    left: Dataset,
    right: Dataset,
    *,
    key: str,
    ts_col: str,
    right_suffix: str = "_r",
    **kw,
) -> Dataset:
    """Forward as-of join: for each left row, the EARLIEST right row of
    the same key with right.ts ≥ left.ts (inclusive) — DuckDB
    ``ASOF JOIN … ON l.ts <= r.ts``.  Implemented as the backward join
    on NEGATED epoch-µs timestamps (pure order reversal), so it
    inherits asof_join's salting / carry-in machinery and exactness
    proofs unchanged.  Both ts columns come back as positive epoch-µs
    int64 (the negation round-trips; unmatched rows keep null)."""

    def neg(ds: Dataset) -> Dataset:
        def f(b: pa.Table) -> pa.Table:
            ts = pc.multiply(pc.cast(b.column(ts_col), pa.int64()),
                             pa.scalar(-1, pa.int64()))
            return b.set_column(b.schema.get_field_index(ts_col), ts_col, ts)

        return ds.map_batches(f, batch_format="pyarrow")

    out = asof_join(neg(left), neg(right), key=key, ts_col=ts_col,
                    right_suffix=right_suffix, **kw)
    rts = ts_col + right_suffix

    def unneg(b: pa.Table) -> pa.Table:
        t = pc.multiply(pc.cast(b.column(ts_col), pa.int64()),
                        pa.scalar(-1, pa.int64()))
        b = b.set_column(b.schema.get_field_index(ts_col), ts_col, t)
        if rts in b.schema.names:
            r = pc.multiply(pc.cast(b.column(rts), pa.int64()),
                            pa.scalar(-1, pa.int64()))
            b = b.set_column(b.schema.get_field_index(rts), rts, r)
        return b

    return out.map_batches(unneg, batch_format="pyarrow")
