"""Denial constraints (SURVEY §2.2 R5; Chu, Ilyas, Papotti, VLDB 2013).

A DC forbids a conjunction of predicates: ¬∃ t (single-tuple) or
¬∃ t,t′, t≠t′ (two-tuple).  Compile targets:

  single-tuple → vectorized filter: violation = all atoms hold on the
    row (fused into the RuleSet map_batches stage).
  two-tuple → the equality atoms (t.x = t′.x, same attribute) form the
    groupby key (SURVEY §7 shuffle table: "two-tuple DC → its
    equality-atom key"); remaining atoms are checked pairwise inside
    each group with numpy outer comparisons.  A row is flagged if it
    participates in ANY witness pair (either role).  Group-local work is
    O(n²) — bounded by ``max_group`` with an explicit error on
    pathological groups (SURVEY §7 hard-parts); for larger groups add a
    salt attribute to the key or rewrite the DC.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .dsl import Predicate, Rule

_NP_OPS = {
    "==": np.equal,
    "!=": np.not_equal,
    "<": np.less,
    "<=": np.less_equal,
    ">": np.greater,
    ">=": np.greater_equal,
}


@dataclass(frozen=True)
class Atom:
    """t.left OP t′.right (two-tuple predicate)."""

    left: str
    op: str
    right: str


def _dominates_any(u1: np.ndarray, u2: np.ndarray, strict1: bool, strict2: bool) -> np.ndarray:
    """flag[i] = ∃ j≠i : u1_i >(=) u1_j ∧ u2_i >(=) u2_j (strictness per
    dimension).  One sort + a tie-grouped sweep with a running prefix
    min — O(n log n), the SURVEY §2.2 R5 sort-pruning promise for
    inequality atoms (round-1 verdict item #6).  Works on native dtypes
    (no float conversion, so int64 columns keep exact comparisons)."""
    n = len(u1)
    flags = np.zeros(n, dtype=bool)
    order = np.lexsort((u2, u1))
    has_prefix = False
    pmin = None  # min u2 over all rows with strictly smaller u1
    i = 0
    while i < n:
        j = i
        val = u1[order[i]]
        while j < n and u1[order[j]] == val:
            j += 1
        grp = order[i:j]
        g2 = u2[grp]
        if has_prefix:
            f = (pmin < g2) if strict2 else (pmin <= g2)
        else:
            f = np.zeros(len(grp), dtype=bool)
        if not strict1 and len(grp) > 1:
            # non-strict dim-1: same-u1 rows are candidates too (self
            # excluded via min/second-min bookkeeping)
            m = g2.min()
            if (g2 == m).sum() > 1:
                others_min = np.full(len(grp), m)
            else:
                m2 = np.partition(g2, 1)[1]
                others_min = np.where(g2 == m, m2, m)
            f = f | ((others_min < g2) if strict2 else (others_min <= g2))
        flags[grp] = f
        gmin = g2.min()
        pmin = gmin if not has_prefix else min(pmin, gmin)
        has_prefix = True
        i = j
    return flags


def two_atom_flags(group: pa.Table, a1: "Atom", a2: "Atom") -> np.ndarray | None:
    """O(n log n) witness flags for a two-inequality-atom DC where each
    atom compares one column against itself (t.c OP t′.c — the common DC
    shape).  Returns None when the atom shape isn't supported (callers
    fall back to the bounded O(n²) matrix).

    Normalization: ops < / <= flip sign so every atom reads "t-value >
    (or ≥) t′-value"; a row violates if it participates as t (dominance
    sweep) or as t′ (the same sweep over negated values)."""
    for a in (a1, a2):
        if a.left != a.right or a.op not in ("<", "<=", ">", ">="):
            return None

    def to_u(a: "Atom") -> tuple[np.ndarray, bool]:
        v = group.column(a.left).to_numpy(zero_copy_only=False)
        if v.dtype.kind == "M":  # timestamps: order-preserving int64 view
            v = v.view("int64")
            # NaT encodes as INT64_MIN — a false "-infinity" that would
            # diverge from the matrix path's NULL-is-never-comparable
            if (v == np.iinfo(np.int64).min).any():
                return None, False
        if v.dtype.kind not in ("i", "f"):  # object (nulls), unsigned, bool
            return None, False
        if v.dtype.kind == "f" and np.isnan(v).any():  # NaN poisons prefix-min
            return None, False
        u = v if a.op in (">", ">=") else -v
        return u, a.op in (">", "<")

    u1, s1 = to_u(a1)
    u2, s2 = to_u(a2)
    if u1 is None or u2 is None:
        return None
    as_t = _dominates_any(u1, u2, s1, s2)
    as_t_prime = _dominates_any(-u1, -u2, s1, s2)
    return as_t | as_t_prime


@dataclass
class DenialConstraint(Rule):
    name: str
    # single-tuple form: violation where ALL predicates hold
    single: list[Predicate] = field(default_factory=list)
    # two-tuple form: eq_keys = equality atoms (same attribute both sides)
    eq_keys: list[str] = field(default_factory=list)
    pair_atoms: list[Atom] = field(default_factory=list)
    max_group: int = 20_000
    row_local: bool = True

    def __post_init__(self):
        if self.pair_atoms and not self.eq_keys:
            raise ValueError("two-tuple DC needs at least one equality atom as groupby key")
        self.row_local = not self.pair_atoms

    def violations(self, batch: pa.Table) -> pa.Array:
        import pyarrow.compute as pc

        m = None
        for p in self.single:
            pm = p.mask(batch)
            m = pm if m is None else pc.and_(m, pm)
        if m is None:
            return pa.array([False] * batch.num_rows)
        return m if isinstance(m, pa.Array) else m.combine_chunks()

    def apply_shuffle(self, ds: Dataset) -> Dataset:
        flag_col = f"__viol_{self.name}"
        atoms = tuple(self.pair_atoms)
        max_group = self.max_group

        def single_atom_fast(group: pa.Table, a: Atom) -> np.ndarray | None:
            """O(n) evaluation for ONE comparison atom on a single column
            pair: a row participates in a witness pair iff it compares
            against the group's extreme OTHER value (top-2/bottom-2
            bookkeeping handles self-exclusion).  Returns None when the
            atom shape isn't supported (fall back to O(n²))."""
            if a.left != a.right or a.op not in ("<", "<=", ">", ">=", "!="):
                return None
            v = group.column(a.left).to_numpy(zero_copy_only=False)
            # same null/dtype guards as two_atom_flags: nulls (object /
            # NaN / NaT) must defer to the matrix path, where comparisons
            # against null are False (SQL semantics) — here they would
            # poison the extreme-value bookkeeping or crash argsort
            if v.dtype.kind == "M":
                v = v.view("int64")
                if (v == np.iinfo(np.int64).min).any():
                    return None
            if v.dtype.kind not in ("i", "f"):
                return None
            if v.dtype.kind == "f" and np.isnan(v).any():
                return None
            n = len(v)
            if a.op == "!=":
                return np.full(n, len(np.unique(v)) > 1)
            order = np.argsort(v, kind="stable")
            lo1, lo2 = v[order[0]], v[order[1]]
            hi1, hi2 = v[order[-1]], v[order[-2]]
            max_other = np.where(v == hi1, hi2, hi1)  # ties: another max exists
            if (v == hi1).sum() > 1:
                max_other = np.full(n, hi1)
            min_other = np.where(v == lo1, lo2, lo1)
            if (v == lo1).sum() > 1:
                min_other = np.full(n, lo1)
            op = _NP_OPS[a.op]
            flip = _NP_OPS[{"<": ">", "<=": ">=", ">": "<", ">=": "<="}[a.op]]
            # role t: ∃ t′: v_i OP v_j  ⟺  v_i OP extreme_other
            # role t′: ∃ t: v_j OP v_i  ⟺  v_i flip(OP) extreme_other
            ext = max_other if a.op in (">", ">=") else min_other
            ext2 = min_other if a.op in (">", ">=") else max_other
            return op(v, ext2) | flip(v, ext)

        def per_group(group: pa.Table) -> pa.Table:
            group = group.drop_columns(["__dc_gk"])
            n = group.num_rows
            if n < 2:
                return group.append_column(flag_col, pa.array([False] * n))
            if len(atoms) == 1:
                fast = single_atom_fast(group, atoms[0])
                if fast is not None:
                    return group.append_column(flag_col, pa.array(fast))
            if len(atoms) == 2:
                fast2 = two_atom_flags(group, atoms[0], atoms[1])
                if fast2 is not None:
                    return group.append_column(flag_col, pa.array(fast2))
            if n > max_group:
                raise ValueError(
                    f"DC {self.name}: group of {n} rows exceeds max_group="
                    f"{max_group}; salt the key or rewrite the constraint"
                )
            conj = np.ones((n, n), dtype=bool)
            for a in atoms:
                lv = group.column(a.left).to_numpy(zero_copy_only=False)
                rv = group.column(a.right).to_numpy(zero_copy_only=False)
                conj &= _NP_OPS[a.op](lv[:, None], rv[None, :])
            np.fill_diagonal(conj, False)  # t ≠ t′
            viol = conj.any(axis=1) | conj.any(axis=0)
            return group.append_column(flag_col, pa.array(viol))

        eq_keys = tuple(self.eq_keys)

        def add_group_key(batch: pa.Table) -> pa.Table:
            """Composite string group key (injective length-prefixed
            encoding shared with aggregates.encoded_group_key).  SQL
            equality semantics: NULL never equals anything, so a row with
            a null in ANY equality atom can never witness a pair — it
            gets a UNIQUE key (uuid) and lands in a singleton group (flag
            False).  This also keeps nulls out of Ray's sort-based
            groupby boundary sampling, which cannot order mixed
            null/value keys."""
            import uuid

            import pyarrow.compute as pc

            from ..aggregates import encoded_group_key

            valid = None
            for c in eq_keys:
                v = pc.is_valid(batch.column(c))
                valid = v if valid is None else pc.and_(valid, v)
            enc = encoded_group_key(batch, list(eq_keys))
            valid_np = valid.to_numpy(zero_copy_only=False)
            if valid_np.all():
                return batch.append_column("__dc_gk", enc)
            enc_py = enc.to_pylist()
            tag = uuid.uuid4().hex  # one uuid per batch; row offset disambiguates
            keys = [
                e if ok else f"u{tag}:{i}"
                for i, (e, ok) in enumerate(zip(enc_py, valid_np))
            ]
            return batch.append_column("__dc_gk", pa.array(keys, type=pa.string()))

        return ds.map_batches(add_group_key, batch_format="pyarrow").groupby(
            "__dc_gk"
        ).map_groups(per_group, batch_format="pyarrow")
