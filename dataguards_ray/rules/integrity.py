"""Integrity constraints beyond CFD/DC: inclusion dependencies
(referential integrity / foreign keys) and UNIQUE keys.

Both are shuffle rules in the DSL sense (``row_local = False``): a
row's verdict depends on other rows (UNIQUE) or another table (IND), so
they append their ``__viol_{name}`` flag in ``apply_shuffle``.  Both
follow the CFD mark recipe (rules/cfd.py:53): the discovered key set is
broadcast as an exact ``pc.is_in`` value_set up to
``max_broadcast_keys``, and above it the mark switches to an exact
``left_outer`` hash join against the key Dataset — unbounded key sets
never touch the driver.

Keys are the injective length-prefixed encoding of
``aggregates.encoded_group_key`` (NOT cfd's ``_sep_join``, whose
``<null>`` sentinel can collide with data): null handling is explicit —

- ``InclusionRule`` (ANSI FOREIGN KEY MATCH SIMPLE): a row with a NULL
  in ANY referencing component is exempt (cannot violate).
- ``UniqueRule`` (SQL UNIQUE): NULLs are pairwise distinct, so a key
  containing a NULL component never counts as a duplicate.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from ..aggregates import distinct, encoded_group_key, grouped_agg
from .dsl import Rule


def _valid_mask(batch: pa.Table, cols: list[str]):
    m = None
    for c in cols:
        v = pc.is_valid(batch.column(c))
        m = v if m is None else pc.and_(m, v)
    return m


def _mark_membership(
    ds: Dataset,
    cols: list[str],
    keys_ds: Dataset,
    flag_col: str,
    *,
    violation_is_membership: bool,
    max_broadcast_keys: int,
    num_partitions: int = 16,
) -> Dataset:
    """Append ``flag_col``: whether each row's (cols) key is in
    ``keys_ds`` (column ``k``), xor'd to violation polarity; rows with a
    NULL component are never violations."""
    reserved = {"k", "__k", "__hit"} & set(ds.schema().names)
    if reserved:
        raise ValueError(
            f"integrity mark: input columns {sorted(reserved)} collide with "
            "the rule's internal join columns — rename them first"
        )
    # materialize BEFORE branching: keys_ds is a lazy aggregate chain and
    # both count() and the subsequent broadcast/join would re-execute it
    # (it is thin — distinct keys — by construction)
    keys_ds = keys_ds.materialize()
    n_keys = keys_ds.count()

    if n_keys == 0:
        flag_all = violation_is_membership is False  # absent from empty set

        def mark_const(batch: pa.Table) -> pa.Table:
            flag = (
                pc.cast(_valid_mask(batch, cols), pa.bool_())
                if flag_all
                else pa.array([False] * batch.num_rows, type=pa.bool_())
            )
            return batch.append_column(flag_col, flag)

        return ds.map_batches(mark_const, batch_format="pyarrow")

    if n_keys <= max_broadcast_keys:
        key_arr = pa.array(
            [r["k"] for r in keys_ds.take_all()], type=pa.string()
        )
        ref = ray.put(key_arr)

        def mark(batch: pa.Table) -> pa.Table:
            from ..steps.dedup import get_broadcast

            inset = pc.is_in(encoded_group_key(batch, cols), value_set=get_broadcast(ref))
            bad = inset if violation_is_membership else pc.invert(inset)
            bad = pc.and_(bad, _valid_mask(batch, cols))
            return batch.append_column(flag_col, bad.combine_chunks())

        return ds.map_batches(mark, batch_format="pyarrow")

    # scale path: exact left_outer join-mark, key set stays distributed
    def add_k(batch: pa.Table) -> pa.Table:
        return batch.append_column("__k", encoded_group_key(batch, cols))

    def mark_joined(batch: pa.Table) -> pa.Table:
        hit = pc.fill_null(pc.equal(batch.column("__hit"), 1), False)
        bad = hit if violation_is_membership else pc.invert(hit)
        bad = pc.and_(bad, _valid_mask(batch, cols))
        batch = batch.append_column(flag_col, bad.combine_chunks())
        drop = [c for c in ("__k", "k", "__hit") if c in batch.schema.names]
        return batch.drop_columns(drop)

    from ..joins import scrub_empty_blocks

    keys_ds = scrub_empty_blocks(
        keys_ds,
        num_partitions,
        schema=pa.schema([("k", pa.string()), ("__hit", pa.int64())]),
    )
    joined = ds.map_batches(add_k, batch_format="pyarrow").join(
        keys_ds,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("__k",),
        right_on=("k",),
    )
    return joined.map_batches(mark_joined, batch_format="pyarrow")


@dataclass
class InclusionRule(Rule):
    """Inclusion dependency R[cols] ⊆ S[ref_cols] (referential
    integrity): a row violates when its key tuple is absent from the
    reference table's key set (SQL ``NOT EXISTS``); NULL components
    exempt the row (MATCH SIMPLE).

    Scale shape: the reference side is reduced to DISTINCT encoded keys
    tagged ``__hit=1`` (thin pre-aggregated rows) before either the
    broadcast or the join-mark — the reference's payload columns never
    move."""

    name: str
    cols: list[str]
    ref_ds: Dataset
    ref_cols: list[str]
    row_local: bool = False
    max_broadcast_keys: int = 1_000_000

    def apply_shuffle(self, ds: Dataset) -> Dataset:
        def ref_keys(batch: pa.Table) -> pa.Table:
            valid = _valid_mask(batch, self.ref_cols)
            t = batch.filter(valid)
            return pa.table({"k": encoded_group_key(t, self.ref_cols)})

        keys_ds = distinct(
            self.ref_ds.map_batches(ref_keys, batch_format="pyarrow"), ["k"]
        ).map_batches(
            lambda b: b.append_column(
                "__hit", pa.array([1] * b.num_rows, type=pa.int64())
            ),
            batch_format="pyarrow",
        )
        return _mark_membership(
            ds, self.cols, keys_ds, f"__viol_{self.name}",
            violation_is_membership=False,
            max_broadcast_keys=self.max_broadcast_keys,
        )


@dataclass
class UniqueRule(Rule):
    """UNIQUE(cols): every row of a key that occurs more than once is a
    violation (SQL ``... HAVING COUNT(*) > 1`` marks ALL copies); keys
    with a NULL component are exempt (SQL UNIQUE treats NULLs as
    pairwise distinct).

    Scale shape: per-batch (key, count) partials → adaptive merge →
    only the DUPLICATED keys (usually a tiny fraction) are broadcast or
    join-marked."""

    name: str
    cols: list[str]
    row_local: bool = False
    max_broadcast_keys: int = 1_000_000

    def apply_shuffle(self, ds: Dataset) -> Dataset:
        def key_partials(batch: pa.Table) -> pa.Table:
            valid = _valid_mask(batch, self.cols)
            t = batch.filter(valid)
            return pa.table(
                {"k": encoded_group_key(t, self.cols),
                 "__n": pa.array([1] * t.num_rows, type=pa.int64())}
            )

        counts = grouped_agg(
            ds.map_batches(key_partials, batch_format="pyarrow"),
            ["k"], [("__n", "sum", "__n")],
        )
        dups = counts.filter(expr="__n > 1").map_batches(
            lambda b: pa.table(
                {"k": b.column("k"),
                 "__hit": pa.array([1] * b.num_rows, type=pa.int64())}
            ),
            batch_format="pyarrow",
        )
        return _mark_membership(
            ds, self.cols, dups, f"__viol_{self.name}",
            violation_is_membership=True,
            max_broadcast_keys=self.max_broadcast_keys,
        )
