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


_MERGE_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def encoded_group_key(batch: pa.Table, keys: list[str]) -> pa.Array:
    """Composite non-null string group key: Ray's sort-based groupby
    cannot order mixed null/value keys, so every map_groups operator
    groups on this encoding and keeps the original key columns for
    output (SQL GROUP BY semantics: null keys form one group per
    distinct null pattern).

    Each component is LENGTH-PREFIXED ("v<len>:<str>", null → "n") and
    components concatenate with no separator — self-delimiting, so the
    encoding is injective even when key values contain any would-be
    separator bytes."""
    import pyarrow.compute as pc

    parts = []
    for c in keys:
        s = pc.cast(batch.column(c), pa.string())
        filled = pc.fill_null(s, "")
        ln = pc.cast(pc.utf8_length(filled), pa.string())
        tagged = pc.binary_join_element_wise(pa.scalar("v"), ln, pa.scalar(":"), filled, "")
        enc = pc.if_else(pc.is_valid(s), tagged, pa.scalar("n"))
        parts.append(enc)
    out = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def keyed_map_groups(ds: Dataset, keys: list[str], per_group) -> Dataset:
    """Shared tail of every map_groups operator: append the injective
    encoded ``__gk`` key (null-key-safe — Ray's sort groupby cannot
    order mixed null/value keys) and group on it.  ``per_group``
    receives the group WITH the ``__gk`` column and drops it itself."""
    keyed = ds.map_batches(
        lambda b: b.append_column("__gk", encoded_group_key(b, keys)),
        batch_format="pyarrow",
    )
    return keyed.groupby("__gk").map_groups(per_group, batch_format="pyarrow")


def grouped_agg(
    ds: Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
) -> Dataset:
    """Pre-aggregated groupby.  ``aggs`` = [(col, fn, out_name)] with fn in
    sum/count/min/max.  count counts non-null values of col (SQL COUNT(col));
    use count with a never-null col for COUNT(*).

    Final merge is adaptive (round 2): thin partials under the
    ``driver_merge_or_none`` row cap merge on the driver in Arrow C++
    (wrapped back into a Dataset — callers see no difference); larger
    partial sets take a distributed groupby over the ENCODED key (null
    group-key values are legal on both paths — pyarrow groups nulls on
    the driver, and the encoding keeps them out of Ray's null-intolerant
    sort groupby)."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([(c, f) for c, f, _ in aggs])
        return g.rename_columns(keys + [out for _, _, out in aggs])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    table, mat = driver_merge_or_none(
        partials, keys, [(out, _MERGE_FN[f], out) for _, f, out in aggs]
    )
    if table is not None:
        return rd.from_arrow(table)
    return _fallback_group_merge(mat, keys, aggs)


def _fallback_group_merge(
    partials: Dataset, keys: list[str], aggs: list[tuple[str, str, str]]
) -> Dataset:
    """Distributed final merge of pre-aggregated partials over the
    encoded group key (null-safe); original key columns travel with the
    partial rows and the first row of each group supplies them."""
    import pyarrow.compute as pc

    # group Ray-side by a HASH BUCKET of the encoded key (one vectorized
    # Arrow group_by per bucket), not per key — the per-key version is
    # one Python call per distinct key, a corpus-sized tax exactly when
    # this path fires (above the driver-merge cap)
    from .hashutil import fnv1a64_array

    num_buckets = 64

    def bucketed(b: pa.Table) -> pa.Table:
        gk = encoded_group_key(b, keys)
        h = fnv1a64_array(gk)
        return b.append_column("__gk", gk).append_column(
            "__b", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    keyed = partials.map_batches(bucketed, batch_format="pyarrow")
    out_names = keys + [out for _, _, out in aggs]

    def merge_bucket(g: pa.Table) -> pa.Table:
        # within one __gk group every original-key value is identical
        # (or all-null), so MIN reproduces "first" without an order dep
        merged = g.group_by("__gk").aggregate(
            [(out, _MERGE_FN[f]) for _, f, out in aggs]
            + [(k, "min") for k in keys])
        merged = merged.rename_columns(
            ["__gk"] + [out for _, _, out in aggs] + keys)
        return merged.select(out_names)

    return keyed.groupby("__b").map_groups(merge_bucket, batch_format="pyarrow")


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
    """G4: exact distinct via pre-aggregated groupby (no raw-row shuffle;
    adaptive final merge like ``grouped_agg``)."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(cols).aggregate([(cols[0], "count")]).select(cols)

    part = ds.map_batches(partial, batch_format="pyarrow")
    table, mat = driver_merge_or_none(part, cols, [])
    if table is not None:
        return rd.from_arrow(table)
    return _fallback_group_merge(mat, cols, [])


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


def driver_merge_or_none(
    partials: Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    *,
    max_driver_rows: int = 2_000_000,
):
    """Adaptive final merge for PRE-AGGREGATED partials (round 2,
    measured): Ray's sort-based groupby costs ~10 s on 580k thin partial
    rows where a single pyarrow ``Table.group_by`` on the driver costs
    0.2 s — at thin-partial scale the all-to-all machinery is pure
    overhead.  Materializes `partials`; when its row count fits
    ``max_driver_rows`` the merge runs on the driver in Arrow C++ and a
    ``pa.Table`` is returned, else ``None`` — the caller then runs the
    distributed groupby on the returned materialized Dataset (no
    recompute).  Returns ``(table_or_none, materialized_partials)``."""
    import ray as _ray

    mat = partials.materialize()
    if mat.count() > max_driver_rows:
        return None, mat
    tables = [
        t for t in _ray.get(mat.to_arrow_refs()) if t.num_rows and t.schema.names
    ]
    out_names = keys + [o for _, _, o in aggs]
    if not tables:
        try:  # preserve the partial schema's types for an empty result
            sch = pa.schema(mat.schema(fetch_if_missing=False).base_schema)
            return sch.empty_table().select(out_names), mat
        except Exception:
            return pa.table({k: pa.array([]) for k in out_names}), mat
    big = pa.concat_tables(tables, promote_options="default")
    g = big.group_by(keys).aggregate([(c, f) for c, f, _ in aggs])
    return g.rename_columns(out_names), mat


def grouped_quantile(
    ds: Dataset,
    keys: list[str],
    col: str,
    out: str,
    q: float = 0.5,
    *,
    max_group: int = 50_000_000,
) -> Dataset:
    """Exact per-group discrete quantile (DuckDB ``quantile_disc(col, q)``
    semantics: sorted[ceil(q·n)−1]; q=0.5 is the lower median).

    Exact quantiles are order statistics — they need each group's values
    co-located, so this is a ``groupby(keys).map_groups`` shuffle of the
    (keys, col) projection only (prune before calling).  ``max_group``
    guards pathological groups; for sketchy-but-bounded memory use a
    t-digest style approximation instead (not needed by the spec)."""
    if not (0.0 < q <= 1.0):
        raise ValueError("q must be in (0, 1]")

    def per_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gk"])
        if group.num_rows > max_group:
            raise ValueError(
                f"quantile group of {group.num_rows} rows exceeds max_group={max_group}"
            )
        # nulls are ignored (SQL/DuckDB quantile semantics); an all-null
        # group yields a null quantile
        vals = group.column(col).combine_chunks().drop_null()
        cols = {k: group.column(k).slice(0, 1) for k in keys}
        if len(vals) == 0:
            cols[out] = pa.nulls(1, type=group.schema.field(col).type)
        else:
            v = np.sort(vals.to_numpy(zero_copy_only=False))
            idx = max(0, int(np.ceil(q * len(v))) - 1)
            cols[out] = pa.array([v[idx]], type=group.schema.field(col).type)
        return pa.table(cols)

    return keyed_map_groups(ds.select_columns(keys + [col]), keys, per_group)


def grouped_median(
    ds: Dataset, keys: list[str], col: str, out: str, *, max_group: int = 50_000_000
) -> Dataset:
    """Exact per-group discrete (lower) median — ``grouped_quantile`` at
    q=0.5."""
    return grouped_quantile(ds, keys, col, out, 0.5, max_group=max_group)


def grouped_mode(
    ds: Dataset, keys: list[str], col: str, out: str
) -> Dataset:
    """Deterministic per-group MODE: the most frequent non-null value,
    ties broken by the SMALLEST value (SQL mode() leaves ties
    engine-defined, which is not reproducible distributed — the
    tiebreak makes it parallelism-invariant; mirror it in oracles with
    ``ROW_NUMBER() OVER (... ORDER BY cnt DESC, val)`` over rows
    pre-filtered to ``col IS NOT NULL``, or the SQL side counts the
    NULL group as a candidate).  An all-null group emits (keys, NULL)
    here — a full SQL mirror of THAT row needs a left join from the
    distinct keys, so oracle-check mode on columns with non-null values
    per group.

    Scale shape: per-batch (keys, value, count) partials collapse the
    input to value-cardinality-sized groups before the pick; no raw-row
    shuffle."""
    import pyarrow.compute as pc

    def partials(batch: pa.Table) -> pa.Table:
        cols = keys + [col]
        return batch.select(cols).group_by(cols).aggregate(
            [([], "count_all")]
        ).rename_columns(cols + ["__n"])

    counts = grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        keys + [col], [("__n", "sum", "__n")],
    )

    def pick(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__gk"])
        valid = g.filter(pc.is_valid(g.column(col)))
        cols = {k: g.column(k).slice(0, 1) for k in keys}
        if valid.num_rows == 0:
            cols[out] = pa.nulls(1, type=g.schema.field(col).type)
        else:
            best = valid.take(
                pc.sort_indices(
                    valid,
                    sort_keys=[("__n", "descending"), (col, "ascending")],
                )
            ).slice(0, 1)
            cols[out] = best.column(col)
        return pa.table(cols)

    return keyed_map_groups(counts, keys, pick)


def grouped_quantile_cont_scaled(
    ds: Dataset,
    keys: list[str],
    col: str,
    out: str,
    q_num: int,
    q_den: int,
    *,
    max_group: int = 50_000_000,
) -> Dataset:
    """Exact per-group INTERPOLATED quantile (DuckDB ``quantile_cont``,
    numpy 'linear'/type-7: position ``h = q·(n−1)``, value
    ``v[⌊h⌋]·(1−f) + v[⌊h⌋+1]·f``) over an INTEGER column, returned
    SCALED by ``q_den`` so it stays exact: with q = q_num/q_den the
    fraction f is always a multiple of 1/q_den, so
    ``out = v_lo·(q_den−m) + v_hi·m`` (``m = q_num·(n−1) mod q_den``)
    is an integer — no float in either engine's hot path.  The paired
    SQL is ``CAST(ROUND(q_den·quantile_cont(col, q)) AS BIGINT)``
    (double round-off stays ≪ 0.5 for int inputs below ~2^50/q_den).
    NULLs are ignored; an all-null group yields NULL."""
    if not (0 < q_num <= q_den):
        raise ValueError("need 0 < q_num <= q_den")

    def per_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["__gk"])
        if group.num_rows > max_group:
            raise ValueError(
                f"quantile group of {group.num_rows} rows exceeds max_group={max_group}"
            )
        vals = group.column(col).combine_chunks().drop_null()
        cols = {k: group.column(k).slice(0, 1) for k in keys}
        if len(vals) == 0:
            cols[out] = pa.nulls(1, type=pa.int64())
        else:
            v = np.sort(vals.to_numpy(zero_copy_only=False))
            lo, m = divmod(q_num * (len(v) - 1), q_den)
            hi = min(lo + 1, len(v) - 1)
            # python ints: v values × q_den can exceed int64 only past
            # ~2^63/q_den, and the explicit int() keeps the product exact
            cols[out] = pa.array(
                [int(v[lo]) * (q_den - m) + int(v[hi]) * m], type=pa.int64()
            )
        return pa.table(cols)

    return keyed_map_groups(ds.select_columns(keys + [col]), keys, per_group)


def grouped_count_distinct(
    ds: Dataset, keys: list[str], col: str, out: str
) -> Dataset:
    """Exact COUNT(DISTINCT col) per key group: two-level pre-aggregated
    pipeline — distinct (keys, col) pairs first (partials only shuffle),
    then a count per key.  No raw-row shuffle, no driver state beyond
    the adaptive merges."""
    pairs = distinct(ds.select_columns(keys + [col]), keys + [col])
    return grouped_agg(pairs, keys, [(col, "count", out)])


def grouping_sets(
    ds: Dataset,
    sets: list[list[str]],
    aggs: list[tuple[str, str, str]],
    *,
    all_keys: list[str] | None = None,
) -> Dataset:
    """SQL GROUPING SETS / ROLLUP: one pre-aggregated groupby per set,
    results unioned with nulls in the rolled-up key columns.

    NOTE: consumes `ds` once per grouping set (branches the DAG) — hand
    it a read or materialized Dataset.  Each pass moves partials only."""
    if all_keys is None:
        all_keys = []
        for s in sets:
            for k in s:
                if k not in all_keys:
                    all_keys.append(k)
    key_types: dict[str, pa.DataType] = {}
    schema = pa.schema(ds.schema().base_schema)
    for k in all_keys:
        key_types[k] = schema.field(k).type

    parts = []
    for s in sets:
        if s:
            g = grouped_agg(ds, s, aggs)
        else:  # grand total: constant key then drop
            def add_const(batch: pa.Table, aggs=aggs) -> pa.Table:
                return batch.append_column("__all", pa.array([0] * batch.num_rows, type=pa.int8()))

            g = grouped_agg(ds.map_batches(add_const, batch_format="pyarrow"), ["__all"], aggs)
            g = g.drop_columns(["__all"])

        def widen(batch: pa.Table, s=tuple(s)) -> pa.Table:
            cols = {}
            for k in all_keys:
                cols[k] = (
                    batch.column(k) if k in s
                    else pa.nulls(batch.num_rows, type=key_types[k])
                )
            for _, _, out in aggs:
                cols[out] = batch.column(out)
            return pa.table(cols)

        parts.append(g.map_batches(widen, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def pivot(
    ds: Dataset,
    row_keys: list[str],
    col_key: str,
    col_values: list,
    *,
    value_col: str | None = None,
    agg: str = "count",
    prefix: str | None = None,
) -> Dataset:
    """SQL PIVOT with an explicit value list (Spark ``pivot(col,
    values)`` semantics — the output schema must be static, so rows
    whose ``col_key`` is outside ``col_values`` contribute nowhere).
    ``agg="count"`` counts rows per cell (0 for empty cells, SQL COUNT
    semantics); ``agg="sum"`` sums ``value_col`` per cell and yields
    NULL for cells with no contributing non-null values — matching SQL
    ``SUM(CASE WHEN c = v THEN x END)`` and Spark ``pivot(...).sum()``.
    Output columns are named ``{prefix}{value}`` (prefix defaults to
    ``n_`` / ``sum_``).

    Cost shape: the pivot is just indicator columns + ``grouped_agg`` —
    per-batch pre-aggregation, partials-only shuffle, adaptive final
    merge.  No extra pass over the data vs a plain groupby."""
    import pyarrow.compute as pc

    if agg not in ("count", "sum"):
        raise ValueError("agg must be 'count' or 'sum'")
    if agg == "sum" and value_col is None:
        raise ValueError("agg='sum' needs value_col")
    pfx = prefix if prefix is not None else ("n_" if agg == "count" else "sum_")
    out_names = [f"{pfx}{v}" for v in col_values]

    def indicators(batch: pa.Table) -> pa.Table:
        cols = {k: batch.column(k) for k in row_keys}
        ck = batch.column(col_key)
        for v, out in zip(col_values, out_names):
            hit = pc.fill_null(pc.equal(ck, pa.scalar(v)), False)
            if agg == "sum":
                val = pc.cast(batch.column(value_col), pa.int64())
                contrib = pc.and_(hit, pc.is_valid(val))
                cols[out] = pc.if_else(
                    contrib, pc.fill_null(val, 0), pa.scalar(0, type=pa.int64())
                )
                # contributing-value count per cell → NULL empty cells
                cols["__c_" + out] = pc.cast(contrib, pa.int64())
            else:
                cols[out] = pc.cast(hit, pa.int64())
        return pa.table(cols)

    sum_cols = list(out_names)
    if agg == "sum":
        sum_cols += ["__c_" + o for o in out_names]
    agged = grouped_agg(
        ds.map_batches(indicators, batch_format="pyarrow"),
        row_keys,
        [(c, "sum", c) for c in sum_cols],
    )
    if agg == "count":
        return agged

    def nullify(batch: pa.Table) -> pa.Table:
        cols = {k: batch.column(k) for k in row_keys}
        for o in out_names:
            empty = pc.equal(batch.column("__c_" + o), pa.scalar(0, type=pa.int64()))
            cols[o] = pc.if_else(empty, pa.scalar(None, type=pa.int64()), batch.column(o))
        return pa.table(cols)

    return agged.map_batches(nullify, batch_format="pyarrow")


def grouped_var(
    ds: Dataset, keys: list[str], col: str, out: str
) -> Dataset:
    """Exact per-group sample-variance floor over an INTEGER column:
    ``out = (n·Σx² − (Σx)²) // (n·(n−1))`` for n>1, NULL otherwise
    (NULL values are skipped, SQL VAR_SAMP semantics).  All arithmetic
    is exact: int64 partials per batch/merge (bound: Σx² must fit int64
    — e.g. |x| ≤ 5·10⁵ holds to ~3·10⁷ rows per group; rescale the
    input units if the bound binds), then arbitrary-precision Python
    ints for the final n·Σx² − (Σx)² per group, so the result
    hash-matches DuckDB's HUGEINT evaluation of the same expression.
    Mean/stddev floats are deliberately not emitted (frozen
    float-determinism policy)."""
    import pyarrow.compute as pc

    def prep(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch.column(col), pa.int64())
        cols = {k: batch.column(k) for k in keys}
        cols["__x"] = x
        cols["__xx"] = pc.multiply_checked(x, x)  # raise, don't wrap, on overflow
        return pa.table(cols)

    partials = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys,
        [("__x", "count", "__n"), ("__x", "sum", "__s"),
         ("__xx", "sum", "__ss"), ("__xx", "max", "__mx")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        ns = batch.column("__n").to_pylist()
        ss = batch.column("__s").to_pylist()
        sss = batch.column("__ss").to_pylist()
        mxs = batch.column("__mx").to_pylist()
        # overflow guard: Σx² ≤ n·max(x²), so when n·max(x²) fits int64
        # the int64 partial sums cannot have wrapped; beyond that a wrap
        # is POSSIBLE and would be silent — raise instead (per-element
        # multiply_checked only protects each x·x, not the running sum)
        for n, mx in zip(ns, mxs):
            if n and mx is not None and n * mx > (1 << 63) - 1:
                raise ValueError(
                    f"grouped_var partial Σx² may exceed int64 (n={n}, "
                    f"max(x²)={mx}); rescale the input units"
                )
        # python ints: n·Σx² − (Σx)² exceeds int64 long before Σx² does
        vals = [
            (n * q - s * s) // (n * (n - 1)) if n and n > 1 else None
            for n, s, q in zip(ns, ss, sss)
        ]
        cols = {k: batch.column(k) for k in keys}
        cols[out] = pa.array(vals, type=pa.int64())
        return pa.table(cols)

    return partials.map_batches(finish, batch_format="pyarrow")


def grouped_covar(
    ds: Dataset, keys: list[str], x_col: str, y_col: str, out: str
) -> Dataset:
    """Exact per-group sample covariance over INTEGER columns:
    ``out = (n·Σxy − Σx·Σy) / (n·(n−1))`` with the division TRUNCATED
    toward zero — covariance can be negative, and SQL/DuckDB integer
    division truncates where Python's ``//`` floors — for n>1, NULL
    otherwise.  Rows where EITHER column is NULL are skipped (SQL
    COVAR_SAMP pairwise semantics).  Same exactness recipe as
    ``grouped_var``: int64 partials (per-element ``multiply_checked``
    plus an ``n·max|x|·max|y|`` wrap guard on the partial sums), then
    arbitrary-precision Python ints for the final combine, so the result
    hash-matches DuckDB's HUGEINT evaluation of the same expression."""
    import pyarrow.compute as pc

    def prep(batch: pa.Table) -> pa.Table:
        # pairwise nulling, NOT row filtering: a group whose every pair
        # is invalid must still emit (keys, NULL) like SQL COVAR_SAMP,
        # so its key rows have to survive to the groupby
        x = pc.cast(batch.column(x_col), pa.int64())
        y = pc.cast(batch.column(y_col), pa.int64())
        valid = pc.and_(pc.is_valid(x), pc.is_valid(y))
        x = pc.if_else(valid, x, pa.scalar(None, pa.int64()))
        y = pc.if_else(valid, y, pa.scalar(None, pa.int64()))
        cols = {k: batch.column(k) for k in keys}
        cols["__x"], cols["__y"] = x, y
        t = pa.table(cols)
        t = t.append_column("__xy", pc.multiply_checked(x, y))
        t = t.append_column("__ax", pc.abs(x))
        return t.append_column("__ay", pc.abs(y))

    partials = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys,
        [("__x", "count", "__n"), ("__x", "sum", "__sx"), ("__y", "sum", "__sy"),
         ("__xy", "sum", "__sxy"), ("__ax", "max", "__ma"), ("__ay", "max", "__mb")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        lim = (1 << 63) - 1
        ns = batch.column("__n").to_pylist()
        sxs = batch.column("__sx").to_pylist()
        sys_ = batch.column("__sy").to_pylist()
        sxys = batch.column("__sxy").to_pylist()
        mas = batch.column("__ma").to_pylist()
        mbs = batch.column("__mb").to_pylist()
        vals = []
        for n, sx, sy, sxy, ma, mb in zip(ns, sxs, sys_, sxys, mas, mbs):
            if not n or n <= 1:
                vals.append(None)
                continue
            # wrap guard: |Σx| ≤ n·max|x|, |Σy| ≤ n·max|y|, |Σxy| ≤
            # n·max|x|·max|y| — when those fit int64 no partial wrapped
            if n * ma > lim or n * mb > lim or n * ma * mb > lim:
                raise ValueError(
                    f"grouped_covar partial sums may exceed int64 (n={n}, "
                    f"max|x|={ma}, max|y|={mb}); rescale the input units"
                )
            num, den = n * sxy - sx * sy, n * (n - 1)
            vals.append(-((-num) // den) if num < 0 else num // den)
        cols = {k: batch.column(k) for k in keys}
        cols[out] = pa.array(vals, type=pa.int64())
        return pa.table(cols)

    return partials.map_batches(finish, batch_format="pyarrow")


def dense_rank_top(
    ds: Dataset,
    keys: list[str],
    val_col: str,
    k: int,
    *,
    descending: bool = True,
    out: str = "rnk",
) -> Dataset:
    """Rows whose ``DENSE_RANK() OVER (PARTITION BY keys ORDER BY
    val_col)`` ≤ k, with the rank attached (int64) — SQL tie semantics:
    every row of a tied value shares the rank and ALL are kept.

    Scale shape: a row's within-batch dense rank is ≤ its global rank
    (a batch sees a subset of the distinct values above it), so each
    batch pre-prunes to its own top-k distinct values before the
    shuffle — the groupby moves at most k distinct values' rows per
    (key, batch), not the corpus.  NULL ``val_col`` ranks last in
    descending order (SQL NULLS LAST) and is one tied value."""
    import pyarrow.compute as pc

    order = "descending" if descending else "ascending"
    sort_keys = [(val_col, order)]

    def ranks_of(sorted_vals: pa.Array) -> np.ndarray:
        """dense ranks of an already-sorted value column (null-safe:
        consecutive nulls are ONE tied value)."""
        valid = np.asarray(pc.is_valid(sorted_vals).to_numpy(zero_copy_only=False))
        if valid.any():
            fill_v = sorted_vals.filter(pc.is_valid(sorted_vals))[0].as_py()
            filled = pc.fill_null(sorted_vals, fill_v)
            vs = np.asarray(filled.to_numpy(zero_copy_only=False))
            change = np.empty(len(vs), dtype=bool)
            change[0] = True
            change[1:] = (vs[1:] != vs[:-1]) | (valid[1:] != valid[:-1])
        else:  # all-null group: one tied value
            change = np.zeros(len(valid), dtype=bool)
            change[0] = True
        return np.cumsum(change)

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        idx = pc.sort_indices(
            batch, sort_keys=[(kc, "ascending") for kc in keys] + sort_keys
        )
        b = batch.take(idx)
        # vectorized group-boundary scan (hot map-side path): iterate
        # over the few groups, not the rows
        gka = np.asarray(
            encoded_group_key(b, keys).to_numpy(zero_copy_only=False)
        )
        bounds = np.flatnonzero(np.r_[True, gka[1:] != gka[:-1]])
        bounds = np.append(bounds, b.num_rows)
        keep = np.zeros(b.num_rows, dtype=bool)
        for lo, hi in zip(bounds[:-1].tolist(), bounds[1:].tolist()):
            r = ranks_of(b.column(val_col).slice(lo, hi - lo).combine_chunks())
            keep[lo:hi] = r <= k
        return b.filter(pa.array(keep))

    def per_group(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__gk"])
        g = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        r = ranks_of(g.column(val_col).combine_chunks())
        keep = r <= k
        return g.filter(pa.array(keep)).append_column(
            out, pa.array(r[keep], type=pa.int64())
        )

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return keyed_map_groups(pruned, keys, per_group)


def grouped_string_agg(
    ds: Dataset, keys: list[str], col: str, out: str, *, sep: str = ","
) -> Dataset:
    """SQL ``string_agg(DISTINCT col, sep ORDER BY col)`` per group:
    the concatenation of each group's DISTINCT non-null values in
    ascending order.  Deterministic by construction (distinct + total
    order), so it is parallelism-invariant — unordered string_agg is
    not reproducible on any distributed engine and is deliberately not
    offered.  Scale shape: the ``distinct`` pre-pass shrinks the input
    to one row per (keys, value) BEFORE the group concat, so groups are
    value-cardinality-sized, not row-count-sized."""
    import pyarrow.compute as pc

    # NULL values ride through the distinct as one (keys, NULL) row so
    # an all-NULL group still emits (keys, NULL) like SQL string_agg —
    # they are skipped at concat time, not filtered out of existence
    pairs = distinct(ds.select_columns(keys + [col]), keys + [col])

    def per_group(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__gk"])
        v = g.column(col).combine_chunks().drop_null()
        if len(v):
            v = v.take(pc.sort_indices(v))
            joined = sep.join(pc.cast(v, pa.string()).to_pylist())
        else:
            joined = None
        cols = {k: g.column(k).slice(0, 1) for k in keys}
        cols[out] = pa.array([joined], type=pa.string())
        return pa.table(cols)

    return keyed_map_groups(pairs, keys, per_group)


def ntile(
    ds: Dataset,
    keys: list[str],
    n: int,
    order_by: list[tuple[str, bool]],
    *,
    out: str = "tile",
) -> Dataset:
    """SQL ``NTILE(n) OVER (PARTITION BY keys ORDER BY ...)``: rows of
    each group are split into ``n`` buckets 1..n whose sizes differ by
    at most one, larger buckets first (the standard formula: with
    ``nr`` rows, ``q = nr // n``, ``r = nr % n``, the first ``r``
    buckets hold ``q+1`` rows).

    ``order_by`` is ``[(col, descending), ...]`` and MUST end in a
    unique tiebreak column — NTILE assigns by row position, so without
    a total order the bucket of tied rows is engine-dependent and the
    result would not be parallelism-invariant.  NULL order values sort
    last (DuckDB's default NULLS LAST for both directions, matching
    Arrow's ``at_end``).

    Scale shape: one groupby keyed on the partition columns; each
    group is assigned in a single numpy pass inside ``map_groups``, so
    a group must fit one task — the operator is for key-partitioned
    window work (per-domain, per-language), not a global rank over the
    corpus."""
    import pyarrow.compute as pc

    if n < 1:
        raise ValueError(f"ntile bucket count must be >= 1, got {n}")
    sort_keys = [(c, "descending" if d else "ascending") for c, d in order_by]

    def per_group(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__gk"])
        g = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        nr = g.num_rows
        q, r = divmod(nr, n)
        pos = np.arange(nr, dtype=np.int64)
        cut = r * (q + 1)
        if q == 0:  # fewer rows than buckets: one row per bucket
            tiles = pos + 1
        else:
            tiles = np.where(pos < cut, pos // (q + 1), r + (pos - cut) // q) + 1
        return g.append_column(out, pa.array(tiles, type=pa.int64()))

    return keyed_map_groups(ds, keys, per_group)


def stratified_sample(
    ds: Dataset,
    key: str,
    n_per_group: int,
    order_cols: list[tuple[str, bool]],
) -> Dataset:
    """Deterministic per-group sample: the first ``n_per_group`` rows of
    each key group under ``order_cols`` (col, descending) — SQL
    ``row_number() OVER (PARTITION BY key ORDER BY ...) <= n``.
    Parallelism-invariant because the order is total (include a unique
    tiebreak column)."""
    pa_keys = [(c, "descending" if d else "ascending") for c, d in order_cols]

    def per_group(group: pa.Table) -> pa.Table:
        return group.drop_columns(["__gk"]).sort_by(pa_keys).slice(0, n_per_group)

    return keyed_map_groups(ds, [key], per_group)


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


def grouped_first_last(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    *,
    first_name: str = "first_val",
    last_name: str = "last_val",
) -> Dataset:
    """Grouped FIRST_VALUE / LAST_VALUE window — SQL
    ``FIRST_VALUE(v) OVER (PARTITION BY key ORDER BY order_cols)`` and
    the symmetric LAST_VALUE, one row per key.

    Scale shape: arg-min/arg-max as an ORDER-PRESERVING STRING ENCODING
    "rank\\x1ftagged-value" (rank = fixed-width biased-uint64 decimal of
    each int-castable order col, the latest_by_key trick), so the whole
    window collapses to a min + max aggregate: per-batch partials (one
    row per key per batch) → grouped_agg's adaptive thin merge →
    vectorized decode.  The dataset itself is never shuffled.

    Semantics: rows with a NULL in ANY order column are excluded
    (mirror with ``WHERE oc IS NOT NULL`` in SQL); NULL *values* are
    carried (tag "n") and decode back to NULL.  The value round-trips
    through its string cast — supply a string column or cast downstream.
    Order columns must be int-castable (ints / timestamps) and the
    composite (order_cols) must be unique per key for a deterministic
    result.
    """
    import pyarrow.compute as pc

    W = 21 * len(order_cols) - 1  # 20 digits per col + "|" separators
    BIAS = pa.scalar(1 << 63, type=pa.uint64())

    def _rank(batch: pa.Table) -> pa.Array:
        parts = []
        for c in order_cols:
            u = pc.add(pc.cast(pc.cast(batch.column(c), pa.int64()), pa.uint64(), safe=False), BIAS)
            parts.append(pc.utf8_lpad(pc.cast(u, pa.string()), 20, padding="0"))
        if len(parts) == 1:
            return parts[0]
        return pc.binary_join_element_wise(*parts, "|")

    def prep(batch: pa.Table) -> pa.Table:
        rank = _rank(batch)
        sval = pc.cast(batch.column(value_col), pa.string())
        tag = pc.if_else(
            pc.is_valid(sval),
            pc.binary_join_element_wise(pa.scalar("v"), pc.fill_null(sval, ""), ""),
            pa.scalar("n"),
        )
        enc = pc.binary_join_element_wise(rank, tag, "\x1f")
        t = pa.table({key: batch.column(key), "enc": enc})
        return t.filter(pc.is_valid(enc))  # null order col -> excluded

    agg = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        [key],
        [("enc", "min", "lo"), ("enc", "max", "hi")],
    )

    def decode(batch: pa.Table) -> pa.Table:
        def val_of(col):
            payload = pc.utf8_slice_codeunits(col, W + 1)
            tagch = pc.utf8_slice_codeunits(payload, 0, 1)
            return pc.if_else(
                pc.equal(tagch, "v"),
                pc.utf8_slice_codeunits(payload, 1),
                pa.scalar(None, pa.string()),
            )
        return pa.table(
            {
                key: batch.column(key),
                first_name: val_of(batch.column("lo")),
                last_name: val_of(batch.column("hi")),
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")


def global_row_number(
    ds: Dataset,
    order_cols: list[str],
    *,
    out_col: str = "rn",
    bucket_width: int | None = None,
    max_buckets: int = 4_000_000,
    max_bucket_frac: float = 0.5,
    guard_rows: int = 1_000_000,
    strict: bool = False,
) -> Dataset:
    """Global ROW_NUMBER() OVER (ORDER BY order_cols) — distributed
    enumeration without a global sort barrier.

    Scale shape: rows land in coarse RANGE buckets of the leading order
    column (``bucket_width`` units; default = span/1024 measured by a
    thin min/max pre-pass); a thin per-bucket count groupby + a driver
    cumsum give each bucket its global offset (one broadcast int per
    bucket — cap ``max_buckets``); each bucket then sorts locally in
    one ``map_groups`` and numbers its rows ``offset + 1..n``.  The
    dataset shuffles ONCE (the bucket groupby); nothing corpus-sized
    touches the driver.

    Rows with a NULL in any order column are excluded (mirror with
    ``WHERE ... IS NOT NULL``); order columns must be int-castable and
    the composite must be unique for a deterministic result.  Returns
    the input columns + ``out_col``.

    The LEADING order column must have spread: a constant or
    outlier-skewed lead collapses every row into one range bucket and
    a single ``map_groups`` task then sorts the whole dataset —
    silently defeating the no-global-sort design (ADVICE r02).  The
    per-bucket count pass guards this: when the largest bucket holds
    more than ``max_bucket_frac`` of the rows it logs a warning — a
    skewed lead is SLOW, not wrong, so the default keeps previously-
    correct calls working (ADVICE r03).  Pass ``strict=True`` to
    instead fail fast once the dataset exceeds ``guard_rows`` rows
    (where one task sorting nearly everything is a real stall) — the
    right setting for production 100 TB jobs."""
    import ray as _ray

    from .steps.dedup import get_broadcast

    lead = order_cols[0]
    if bucket_width is None:
        def mm(b: pa.Table) -> pa.Table:
            v = pa.compute.cast(b.column(lead), pa.int64())
            return pa.table({"lo": pa.array([pa.compute.min(v).as_py()], type=pa.int64()),
                             "hi": pa.array([pa.compute.max(v).as_py()], type=pa.int64())})

        parts = ds.select_columns([lead]).map_batches(mm, batch_format="pyarrow").take_all()
        los = [r["lo"] for r in parts if r["lo"] is not None]
        his = [r["hi"] for r in parts if r["hi"] is not None]
        if not los:
            return ds.map_batches(
                lambda b: b.slice(0, 0).append_column(
                    out_col, pa.array([], type=pa.int64())),
                batch_format="pyarrow")
        bucket_width = max((max(his) - min(los)) // 1024, 1)

    import pyarrow.compute as pc

    def prep(b: pa.Table) -> pa.Table:
        mask = None
        for c in order_cols:
            v = pc.is_valid(b.column(c))
            mask = v if mask is None else pc.and_(mask, v)
        b = b.filter(mask)
        v = pc.cast(b.column(lead), pa.int64())
        bkt = _np_floor_div(v, bucket_width)
        return b.append_column("__b", bkt)

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    counts = grouped_agg(prepped.select_columns(["__b"]),
                         ["__b"], [("__b", "count", "n")])
    rows = sorted((r["__b"], r["n"]) for r in counts.take_all())
    if len(rows) > max_buckets:
        raise ValueError(
            f"{len(rows)} row-number buckets > max_buckets={max_buckets}; "
            f"raise bucket_width")
    total_n = sum(n for _, n in rows)
    biggest = max((n for _, n in rows), default=0)
    # a constant lead yields exactly ONE bucket — that IS the degenerate
    # case, so the guard must not require multiple buckets; tiny inputs
    # (where one sort task is fine) stay quiet
    if total_n > 10_000 and biggest > max_bucket_frac * total_n:
        msg = (
            f"global_row_number: the hottest range bucket holds {biggest}/"
            f"{total_n} rows ({biggest / total_n:.0%}) — the leading order "
            f"column '{lead}' has too little spread for range bucketing; "
            "one task would sort (nearly) everything. Use a leading column "
            "with spread, or pass a smaller bucket_width."
        )
        if strict and total_n > guard_rows:
            raise ValueError(msg)
        import logging

        logging.getLogger(__name__).warning(msg)
    offsets: dict[int, int] = {}
    acc = 0
    for bkt, n in rows:
        offsets[bkt] = acc
        acc += n
    ref = _ray.put(offsets)

    sort_keys = [(c, "ascending") for c in order_cols]

    def number(group: pa.Table) -> pa.Table:
        bkt = group.column("__b")[0].as_py()
        g = group.drop_columns(["__b"]).sort_by(sort_keys)
        off = get_broadcast(ref)[bkt]
        rn = pa.array(np.arange(1, g.num_rows + 1) + off, type=pa.int64())
        return g.append_column(out_col, rn)

    return prepped.groupby("__b").map_groups(number, batch_format="pyarrow")


def _np_floor_div(arr: pa.Array, d: int) -> pa.Array:
    """Arrow floor division for int64 (pc.divide truncates toward zero)."""
    v = (
        arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    ).to_numpy(zero_copy_only=False)
    return pa.array(np.floor_divide(v, d), type=pa.int64())


def approx_quantile_hist(
    ds: Dataset,
    col: str,
    qs: list[float],
    *,
    n_buckets: int = 8192,
) -> list[float]:
    """Approximate quantiles via a fixed uniform histogram — the fourth
    mergeable sketch beside Bloom / HLL / approx_top_k.  Two thin
    passes: (1) global (min, max, null-aware) partials; (2) per-batch
    bucket counts pre-aggregated before a ≤``n_buckets``-row groupby.
    Nothing corpus-sized moves or lands on the driver.

    Returns the UPPER EDGE of the bucket holding each q-th value
    (quantile_disc rank semantics: k = ceil(q·n)), so the true
    quantile_disc value lies within one bucket width
    ``(max-min)/n_buckets`` — the caller-visible error bound, exact for
    q=1.  Deterministic (no sampling) and independent of partitioning.
    Null AND NaN values are ignored (NaN is a value to Arrow min/max
    and would poison the range); returns [] for an all-null/empty
    column."""
    import math

    import pyarrow.compute as pc

    def mm(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column(col), pa.float64())
        # drop NULLs and NaNs (NaN is a VALUE to Arrow min/max and would
        # poison the histogram range; is_finite(null) is null → dropped)
        v = v.filter(pc.fill_null(pc.is_finite(v), False))
        return pa.table(
            {"lo": pa.array([pc.min(v).as_py()], type=pa.float64()),
             "hi": pa.array([pc.max(v).as_py()], type=pa.float64()),
             "n": pa.array([len(v)], type=pa.int64())}
        )

    parts = ds.select_columns([col]).map_batches(mm, batch_format="pyarrow").take_all()
    los = [r["lo"] for r in parts if r["lo"] is not None]
    n_total = sum(r["n"] for r in parts)
    if not los or n_total == 0:
        return []
    lo = min(los)
    hi = max(r["hi"] for r in parts if r["hi"] is not None)
    width = (hi - lo) / n_buckets if hi > lo else 1.0

    def bucketize(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column(col), pa.float64())
        v = v.filter(pc.fill_null(pc.is_finite(v), False))
        idx = np.clip(
            np.floor((v.to_numpy(zero_copy_only=False) - lo) / width),
            0, n_buckets - 1,
        ).astype(np.int64)
        cnt = np.bincount(idx, minlength=1)
        nz = np.nonzero(cnt)[0]
        return pa.table({"b": pa.array(nz, type=pa.int64()),
                         "n": pa.array(cnt[nz], type=pa.int64())})

    counts = grouped_agg(
        ds.select_columns([col]).map_batches(bucketize, batch_format="pyarrow"),
        ["b"], [("n", "sum", "n")],
    )
    rows = sorted((r["b"], r["n"]) for r in counts.take_all())
    cum = 0
    cum_by_bucket: list[tuple[int, int]] = []
    for bkt, n in rows:
        cum += n
        cum_by_bucket.append((bkt, cum))
    out: list[float] = []
    for q in qs:
        k = max(1, math.ceil(q * n_total))
        bkt = next(b for b, c in cum_by_bucket if c >= k)
        out.append(min(lo + (bkt + 1) * width, hi))
    return out


def grouped_rank(
    ds: Dataset,
    keys: list[str],
    val_col: str,
    *,
    descending: bool = True,
    out: str = "rnk",
) -> Dataset:
    """Full RANK() window with gaps — SQL ``RANK() OVER (PARTITION BY
    keys ORDER BY val [DESC])`` with DuckDB's default NULLS LAST.  Ties
    share a rank; the next distinct value skips ahead (gaps) — unlike
    dense_rank_top this keeps every row and the SQL gap semantics.
    One co-location groupby of the (keys, val) projection; a sorted
    run-start scan per group."""
    import pyarrow.compute as pc

    order = "descending" if descending else "ascending"

    def per_group(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__gk"])
        idx = pc.sort_indices(g, sort_keys=[(val_col, order)],
                              null_placement="at_end")
        g = g.take(idx)
        n = g.num_rows
        change = np.ones(n, dtype=bool)
        if n > 1:
            # adjacent-inequality ARROW-side (no float cast: int64 past
            # 2^53 must not collide); null-run boundary via is_null xor
            s = g.column(val_col).combine_chunks()
            a, b = s.slice(1), s.slice(0, n - 1)
            diff = pc.or_(
                pc.xor(pc.is_null(a), pc.is_null(b)),
                pc.fill_null(pc.not_equal(a, b), False),
            )
            change[1:] = diff.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(change)
        rnk = np.repeat(starts + 1, np.diff(np.append(starts, n)))
        return g.append_column(out, pa.array(rnk, type=pa.int64()))

    return keyed_map_groups(ds, keys, per_group)


def grouped_mad(
    ds: Dataset,
    keys: list[str],
    col: str,
    out: str,
    *,
    max_broadcast_groups: int = 2_000_000,
    max_group: int = 50_000_000,
) -> Dataset:
    """Exact per-group MEDIAN ABSOLUTE DEVIATION (discrete-median
    semantics both passes): mad = median(|x − median(x)|) — the robust
    dispersion statistic.  Two passes: the per-group median shuffle,
    then the medians broadcast (one entry per group — capped) and a
    second median over the vectorized |x − med| column.  SQL mirror:
    CTE-join quantile_disc(|x − quantile_disc(x, .5)|, .5).  Rows of
    all-null groups yield a null mad; integer inputs stay integer."""
    import ray as _ray

    from .steps.dedup import get_broadcast

    meds = grouped_quantile(ds, keys, col, "__med", 0.5, max_group=max_group)
    rows = meds.take_all()
    if len(rows) > max_broadcast_groups:
        raise ValueError(
            f"{len(rows)} groups exceed max_broadcast_groups="
            f"{max_broadcast_groups}; shard by a key prefix")
    mmap = {tuple(r[k] for k in keys): r["__med"] for r in rows}
    ref = _ray.put(mmap)

    def absdev(b: pa.Table) -> pa.Table:
        m = get_broadcast(ref)
        kcols = [b.column(k).to_pylist() for k in keys]
        meds_col = pa.array(
            [m.get(t) for t in zip(*kcols)] if kcols else [],
            type=b.schema.field(col).type,
        )
        dev = pa.compute.abs(pa.compute.subtract(b.column(col), meds_col))
        return pa.table({k: b.column(k) for k in keys} | {col: dev})

    dev_ds = ds.select_columns(keys + [col]).map_batches(
        absdev, batch_format="pyarrow")
    return grouped_quantile(dev_ds, keys, col, out, 0.5, max_group=max_group)


def _check_sample_ids(col, fname: str) -> None:
    """Integer sampler ids must be non-negative (the zero-padded rank
    tiebreak assumes it) — one vectorized min probe per batch."""
    import pyarrow.compute as pc

    if pa.types.is_integer(col.type):
        mn = pc.min(col).as_py()
        if mn is not None and mn < 0:
            raise ValueError(f"{fname}: integer ids must be non-negative")


def _token_counts(col) -> pa.Array:
    """DuckDB-parity RE2 ``\\w+`` token count per row, vectorized."""
    import pyarrow.compute as pc

    return pc.cast(pc.count_substring_regex(
        pc.cast(col, pa.string()), r"\w+"), pa.int64())


def _text_digests(col, prefix_len: int):
    """(md5 digest matrix uint8[n,16], hex-prefix bucket int64[n]) for
    a text column — the samplers' per-row hash, all buffer-level (see
    hashutil.md5_digest_matrix)."""
    from .hashutil import hex_prefix_buckets, md5_digest_matrix

    dig = md5_digest_matrix(col)
    return dig, hex_prefix_buckets(dig, prefix_len)


def _text_buckets(col, prefix_len: int) -> np.ndarray:
    return _text_digests(col, prefix_len)[1]


def _rank_strings(dig: np.ndarray, idcol, fname: str) -> pa.Array:
    """``md5hex|paddedid`` rank strings for an already-FILTERED subset
    (digest rows + matching id column): SQL ``ORDER BY md5(text), id``
    as one lexicographic key.  Int ids zero-pad to 20 (non-negative
    checked); string ids join verbatim.  Arrow kernels end-to-end."""
    import pyarrow.compute as pc

    from .hashutil import md5_hex_array

    _check_sample_ids(idcol, fname)
    if isinstance(idcol, pa.ChunkedArray):
        idcol = idcol.combine_chunks()
    hexes = md5_hex_array(dig)
    if pa.types.is_integer(idcol.type):
        ids = pc.utf8_lpad(pc.cast(idcol, pa.string()), 20, "0")
    else:
        ids = pc.cast(idcol, pa.string())
    return pc.binary_join_element_wise(hexes, ids, "|")


def sample_by_token_budget(
    ds: Dataset,
    budget: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 3,
    max_boundary_rows: int = 2_000_000,
) -> Dataset:
    """Deterministic token-budget sample (training-data mixture
    building): walk docs in md5(text)-then-id order and keep every doc
    while the RUNNING token total (RE2 ``\\w+`` count, DuckDB-parity)
    stays ≤ ``budget`` — SQL ``SUM(n_tokens) OVER (ORDER BY md5(text),
    id) <= budget``.  NULL texts are excluded; ``id_col`` must be
    non-negative integers (the order tiebreak for duplicated texts).

    Scale shape: NO global sort and no windowed shuffle.  Pass 1
    streams thin (md5-prefix bucket, token-sum) partials (≤ 16^prefix_len
    rows total); the driver cumsum locates the single BOUNDARY bucket;
    only that bucket's rows (corpus/4096 for the default prefix —
    capped, assert above ``max_boundary_rows``) are pulled to resolve
    the exact cutoff rank; pass 2 is one broadcast-filter.  Everything
    is a pure function of (text, id), so the sample is
    parallelism-invariant and reproducible.

    Per-pass cost (round-5 rework): md5 runs as an OpenSSL loop over
    Arrow buffer slices (hashutil.md5_digest_matrix — no per-row Python
    strings), buckets/hex/token counts are numpy/Arrow kernels, rank
    strings are built ONLY for boundary-bucket rows, and the \\w+ token
    regex runs ONLY in pass 1 (and over the tiny boundary subset) —
    the final filter never tokenizes."""
    import pyarrow.compute as pc
    import ray as _ray

    from .steps.dedup import get_broadcast

    nonnull = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b.column(text_col))),
        batch_format="pyarrow")

    def partials(b: pa.Table) -> pa.Table:
        _check_sample_ids(b.column(id_col), "sample_by_token_budget")
        buckets = _text_buckets(b.column(text_col), prefix_len)
        ntok = _token_counts(b.column(text_col))
        t = pa.table({"bucket": pa.array(buckets, type=pa.int64()),
                      "n": ntok})
        g = t.group_by(["bucket"]).aggregate([("n", "sum")])
        return g.rename_columns(["bucket", "n"])

    # partial ROWS scale with batch count (≤ n_buckets per batch); the
    # MERGED result is bounded at n_buckets — merge on the driver under
    # the generic cap, else one distributed groupby of thin partials
    table, mat = driver_merge_or_none(
        nonnull.map_batches(partials, batch_format="pyarrow"),
        ["bucket"], [("n", "sum", "n")],
    )
    if table is None:
        merged = _fallback_group_merge(mat, ["bucket"],
                                       [("n", "sum", "n")]).take_all()
        rows = sorted((r["bucket"], r["n"]) for r in merged)
    else:
        rows = sorted(zip(table.column("bucket").to_pylist(),
                          table.column("n").to_pylist()))
    cum = 0
    boundary = None
    cum_before = 0
    for bkt, n in rows:
        if cum + n > budget:
            boundary = bkt
            cum_before = cum
            break
        cum += n
    if boundary is None:  # whole corpus fits the budget
        return nonnull

    def boundary_rows(b: pa.Table) -> pa.Table:
        dig, buckets = _text_digests(b.column(text_col), prefix_len)
        m = buckets == boundary
        f = b.filter(pa.array(m))
        return pa.table({
            "r": _rank_strings(dig[m], f.column(id_col),
                               "sample_by_token_budget"),
            "n": _token_counts(f.column(text_col))})

    # streaming pull with EARLY abort so the cap bounds driver intake
    bt: "list[dict]" = []
    for b in nonnull.map_batches(
            boundary_rows, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        bt.extend(b.to_pylist())
        if len(bt) > max_boundary_rows:
            raise ValueError(
                f"boundary bucket holds > {max_boundary_rows} rows; "
                "raise prefix_len for a finer bucket grid")
    bt.sort(key=lambda r: r["r"])
    cutoff = ""  # nothing from the boundary bucket
    run = cum_before
    for r in bt:
        if run + r["n"] > budget:
            break
        run += r["n"]
        cutoff = r["r"]
    ref = _ray.put((boundary, cutoff))

    def final(b: pa.Table) -> pa.Table:
        bd, co = get_broadcast(ref)
        _check_sample_ids(b.column(id_col), "sample_by_token_budget")
        dig, buckets = _text_digests(b.column(text_col), prefix_len)
        keep = buckets < bd
        eq = buckets == bd
        if co != "" and eq.any():
            ranks = _rank_strings(dig[eq], b.column(id_col).filter(
                pa.array(eq)), "sample_by_token_budget")
            keep[eq] = pc.less_equal(ranks, pa.scalar(co)).to_numpy(
                zero_copy_only=False)
        return b.filter(pa.array(keep))

    return nonnull.map_batches(final, batch_format="pyarrow")


def sample_mixture(
    ds: Dataset,
    budget: int,
    weights: "dict[str, float]",
    *,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 3,
    max_boundary_rows: int = 2_000_000,
) -> Dataset:
    """Training-data MIXTURE sampling: per-source token budgets.  Each
    source s in ``weights`` gets budget_s = floor(w_s/Σw · budget)
    tokens; within a source docs are taken in md5(text)-then-id order
    while the running token total stays ≤ budget_s — SQL
    ``SUM(n_tokens) OVER (PARTITION BY source ORDER BY md5(text), id)
    <= budget_s``.  Docs from sources NOT in ``weights`` (and NULL
    texts) are dropped.  This is the Pile/DoReMi-style mixture-building
    step: fix domain proportions, deterministic membership.

    Scale shape mirrors ``sample_by_token_budget``: pass 1 streams thin
    ((source, md5-prefix bucket), token-sum) partials — distinct keys
    ≤ n_sources × 16^prefix_len; the driver cumsums per source to find
    each source's single BOUNDARY bucket; only those buckets' rows are
    pulled (capped); pass 2 is one broadcast-filter.  Everything is a
    pure function of (source, text, id) → parallelism-invariant.

    Per-pass cost matches ``sample_by_token_budget``'s round-5 rework:
    buffer-level md5, numpy buckets, Arrow token counts; rank strings
    and the token regex only touch boundary-bucket subsets after
    pass 1."""
    import pyarrow.compute as pc
    import ray as _ray

    from .steps.dedup import get_broadcast

    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty dict of w >= 0")
    tot_w = float(sum(weights.values()))
    if tot_w <= 0:
        raise ValueError("weights must sum to > 0")
    budgets = {s: int(w / tot_w * budget) for s, w in weights.items()}
    sources = sorted(budgets)

    member = ds.map_batches(
        lambda b: b.filter(pc.and_(
            pc.is_valid(b.column(text_col)),
            pc.is_in(b.column(source_col),
                     value_set=pa.array(sources, type=pa.string())))),
        batch_format="pyarrow")

    def partials(b: pa.Table) -> pa.Table:
        _check_sample_ids(b.column(id_col), "sample_mixture")
        buckets = _text_buckets(b.column(text_col), prefix_len)
        t = pa.table({"src": pc.cast(b.column(source_col), pa.string()),
                      "bucket": pa.array(buckets, type=pa.int64()),
                      "n": _token_counts(b.column(text_col))})
        g = t.group_by(["src", "bucket"]).aggregate([("n", "sum")])
        return g.rename_columns(["src", "bucket", "n"])

    table, mat = driver_merge_or_none(
        member.map_batches(partials, batch_format="pyarrow"),
        ["src", "bucket"], [("n", "sum", "n")],
    )
    if table is None:
        merged = _fallback_group_merge(mat, ["src", "bucket"],
                                       [("n", "sum", "n")]).take_all()
        rows = sorted((r["src"], r["bucket"], r["n"]) for r in merged)
    else:
        rows = sorted(zip(table.column("src").to_pylist(),
                          table.column("bucket").to_pylist(),
                          table.column("n").to_pylist()))
    # per-source boundary bucket + tokens consumed before it
    boundary: "dict[str, int]" = {}
    cum_before: "dict[str, int]" = {}
    cum: "dict[str, int]" = {s: 0 for s in sources}
    for s, bkt, n in rows:
        if s in boundary:
            continue
        if cum[s] + n > budgets[s]:
            boundary[s] = bkt
            cum_before[s] = cum[s]
        else:
            cum[s] += n
    # sources with no boundary fit entirely: keep all their rows

    if boundary:
        bset = set(boundary.items())

        def boundary_rows(b: pa.Table) -> pa.Table:
            dig, buckets = _text_digests(b.column(text_col), prefix_len)
            src = pc.cast(b.column(source_col), pa.string())
            m = np.zeros(b.num_rows, dtype=bool)
            for s, bk in bset:  # |bset| ≤ n_sources: tiny
                m |= (pc.equal(src, pa.scalar(s)).to_numpy(
                    zero_copy_only=False) & (buckets == bk))
            f = b.filter(pa.array(m))
            return pa.table({
                "src": pc.cast(f.column(source_col), pa.string()),
                "r": _rank_strings(dig[m], f.column(id_col),
                                   "sample_mixture"),
                "n": _token_counts(f.column(text_col))})

        bt: "list[dict]" = []
        for b in member.map_batches(
                boundary_rows, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            bt.extend(b.to_pylist())
            if len(bt) > max_boundary_rows:
                raise ValueError(
                    f"boundary buckets hold > {max_boundary_rows} rows; "
                    "raise prefix_len for a finer bucket grid")
        cutoff = {s: "" for s in boundary}
        run = dict(cum_before)
        for r in sorted(bt, key=lambda r: (r["src"], r["r"])):
            s = r["src"]
            if run[s] + r["n"] > budgets[s]:
                run[s] = budgets[s] + 1  # source exhausted; skip rest
                continue
            run[s] += r["n"]
            cutoff[s] = r["r"]
    else:
        cutoff = {}

    ref = _ray.put({s: (boundary[s], cutoff[s]) for s in boundary})

    def final(b: pa.Table) -> pa.Table:
        cut = get_broadcast(ref)
        _check_sample_ids(b.column(id_col), "sample_mixture")
        dig, buckets = _text_digests(b.column(text_col), prefix_len)
        src = pc.cast(b.column(source_col), pa.string())
        # sources absent from cut fit their budget entirely: keep
        keep = np.ones(b.num_rows, dtype=bool)
        for s, (bd, co) in cut.items():  # |cut| ≤ n_sources: tiny
            ms = pc.equal(src, pa.scalar(s)).to_numpy(
                zero_copy_only=False)
            keep[ms & (buckets > bd)] = False
            eq = ms & (buckets == bd)
            if co == "":
                keep[eq] = False
            elif eq.any():
                ranks = _rank_strings(dig[eq], b.column(id_col).filter(
                    pa.array(eq)), "sample_mixture")
                keep[eq] = pc.less_equal(ranks, pa.scalar(co)).to_numpy(
                    zero_copy_only=False)
        return b.filter(pa.array(keep))

    return member.map_batches(final, batch_format="pyarrow")
