"""Rule DSL core (SURVEY §2.2 R1–R3, R6–R8).

A ``Rule`` produces a per-row boolean *violation* mask.  ``RuleSet``
compiles a rule list into:

  - ONE fused vectorized ``map_batches`` stage for all row-local rules
    (pyarrow.compute kernels, zero-copy Arrow), and
  - one groupby stage per FD-style / pairwise rule (CFD with variable
    tableau patterns, two-tuple denial constraints) — the only shuffles.

Canonical order = list order; ``drop_rule`` is the FIRST violated rule
(matching the flagship's frozen semantics, spec.RULE_ORDER).

Null semantics (data-quality convention): a predicate over a null value
does not *hold*; whether that is a violation depends on the rule
(``Predicate("c", "not_null")`` exists to check nulls explicitly).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

_OPS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}


@dataclass(frozen=True)
class Predicate:
    """R1 atom: column OP (constant | other column).  ``mask`` is True
    where the predicate HOLDS (nulls → False)."""

    col: str
    op: str
    value: Any = None
    col2: str | None = None

    def mask(self, batch: pa.Table) -> pa.Array:
        c = batch.column(self.col)

        def konst(v):
            # ISO-string constants against temporal columns (the JSON
            # rules-config spelling) cast once per batch
            if isinstance(v, str) and pa.types.is_temporal(c.type):
                return pa.scalar(v).cast(c.type)
            return v

        try:
            if self.op in _OPS:
                rhs = batch.column(self.col2) if self.col2 else konst(self.value)
                m = _OPS[self.op](c, rhs)
            elif self.op == "in":
                vs = pa.array(list(self.value))
                if pa.types.is_temporal(c.type) and pa.types.is_string(vs.type):
                    vs = vs.cast(c.type)
                m = pc.is_in(c, value_set=vs)
            elif self.op == "not_in":
                vs = pa.array(list(self.value))
                if pa.types.is_temporal(c.type) and pa.types.is_string(vs.type):
                    vs = vs.cast(c.type)
                m = pc.invert(pc.is_in(c, value_set=vs))
            elif self.op == "is_null":
                return pc.is_null(c).combine_chunks()
            elif self.op == "not_null":
                return pc.is_valid(c).combine_chunks()
            elif self.op == "between":
                lo, hi = self.value
                m = pc.and_(pc.greater_equal(c, konst(lo)),
                            pc.less_equal(c, konst(hi)))
            elif self.op == "matches":
                m = pc.match_substring_regex(c, self.value)
            elif self.op == "not_matches":
                m = pc.invert(pc.match_substring_regex(c, self.value))
            else:
                raise ValueError(f"unknown predicate op {self.op!r}")
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid) as e:
            raise ValueError(
                f"Predicate {self.col!r} {self.op} {self.value!r}: column "
                f"type {c.type} is not comparable with that value — use a "
                f"comparable constant (temporal columns accept ISO strings, "
                f"e.g. '2020-01-01')"
            ) from e
        return pc.fill_null(m, False).combine_chunks()


class Rule:
    """Base: named rule; row-local rules implement ``violations``."""

    name: str
    row_local: bool = True

    def violations(self, batch: pa.Table) -> pa.Array:  # pragma: no cover
        raise NotImplementedError

    def apply_shuffle(self, ds: Dataset) -> Dataset:  # pragma: no cover
        raise NotImplementedError


@dataclass
class PredicateRule(Rule):
    """Row must satisfy ALL predicates; violation = any fails."""

    name: str
    predicates: list[Predicate] = field(default_factory=list)
    row_local: bool = True

    def violations(self, batch: pa.Table) -> pa.Array:
        m = None
        for p in self.predicates:
            pm = p.mask(batch)
            m = pm if m is None else pc.and_(m, pm)
        if m is None:
            return pa.array([False] * batch.num_rows)
        return pc.invert(m)


@dataclass
class RangeRule(Rule):
    """R2: violated outside [lo, hi] (nulls violate)."""

    name: str
    col: str
    lo: Any = None
    hi: Any = None
    row_local: bool = True

    def violations(self, batch: pa.Table) -> pa.Array:
        c = batch.column(self.col)
        ok = pc.is_valid(c)

        def bound(v):
            # timestamp/date columns accept ISO-string bounds (the
            # natural spelling in a JSON rules config): cast the bound
            # to the column type once per batch, not the column per row
            if isinstance(v, str) and pa.types.is_temporal(c.type):
                return pa.scalar(v).cast(c.type)
            return v

        try:
            if self.lo is not None:
                ok = pc.and_(
                    ok, pc.fill_null(pc.greater_equal(c, bound(self.lo)), False))
            if self.hi is not None:
                ok = pc.and_(
                    ok, pc.fill_null(pc.less_equal(c, bound(self.hi)), False))
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid) as e:
            raise ValueError(
                f"RangeRule {self.name!r}: column {self.col!r} has type "
                f"{c.type} but bounds are lo={self.lo!r} hi={self.hi!r} — "
                f"use bounds of a comparable type (timestamp/date columns "
                f"accept ISO strings, e.g. '2020-01-01')"
            ) from e
        return pc.invert(ok).combine_chunks()


@dataclass
class RegexRule(Rule):
    """R3: violated when (not) matching `pattern` (RE2 via pyarrow;
    nulls violate when must_match, pass otherwise)."""

    name: str
    col: str
    pattern: str
    must_match: bool = True
    row_local: bool = True

    def violations(self, batch: pa.Table) -> pa.Array:
        m = pc.match_substring_regex(batch.column(self.col), self.pattern)
        if self.must_match:
            return pc.invert(pc.fill_null(m, False)).combine_chunks()
        return pc.fill_null(m, False).combine_chunks()


@dataclass
class DomainBlockRule(Rule):
    """UT1/RefinedWeb-style domain blocklist: violated when the url's
    registered domain OR full hostname (``match``: either|domain|host —
    UT1 lists mix both granularities; urltools dictionary-encoded
    kernels, only unique hosts touch Python) is on the list.  Null /
    unparseable urls PASS: a blocklist names known-bad hosts, absent
    urls are some other rule's business.

    Scale note: ``domains`` rides the fused-stage closure (shipped once
    per task); for UT1-sized lists (≈4M domains, a few MB as one Arrow
    string array) pass ``domains_ref`` (``ray.put`` of a
    ``pa.array(..., type=pa.string())``) so the list lives in the
    object store once per node instead."""

    name: str
    col: str = "url"
    domains: "frozenset[str] | set[str] | list[str]" = frozenset()
    domains_ref: Any = None
    match: str = "either"
    row_local: bool = True

    def _value_set(self) -> pa.Array:
        vs = getattr(self, "_vs", None)
        if vs is None:
            if self.domains_ref is not None:
                import pyarrow.compute as pc
                import ray

                # extracted domains/hosts are always lowercased, so a
                # mixed-case object-store list must be lowered too or
                # it silently never matches (the inline path lowers)
                vs = pc.utf8_lower(ray.get(self.domains_ref))
                if isinstance(vs, pa.ChunkedArray):
                    vs = vs.combine_chunks()
            else:
                vs = pa.array(sorted({d.lower() for d in self.domains}),
                              type=pa.string())
            self._vs = vs  # per-worker cache (plain dataclass, not frozen)
        return vs

    def violations(self, batch: pa.Table) -> pa.Array:
        from ..urltools import blocklist_hits

        return blocklist_hits(batch.column(self.col), self._value_set(),
                              match=self.match)


@dataclass
class RuleSet:
    """R6/R7: compile + evaluate.  ``evaluate`` appends per-rule flag
    columns, then rule_hits / keep / drop_rule, and drops the flags."""

    rules: list[Rule]

    def flag(self, ds: Dataset) -> Dataset:
        """Append one ``__viol_{name}`` bool column per rule (row-local
        rules fused into one map_batches; shuffle rules keyed) without
        deciding — composition point for callers that merge these flags
        into an existing decision (``merge_extra_rules``)."""
        row_local = [r for r in self.rules if r.row_local]
        shuffled = [r for r in self.rules if not r.row_local]

        if row_local:

            def fused(batch: pa.Table, rules=tuple(row_local)) -> pa.Table:
                for r in rules:
                    batch = batch.append_column(f"__viol_{r.name}", r.violations(batch))
                return batch

            ds = ds.map_batches(fused, batch_format="pyarrow")

        for r in shuffled:
            ds = r.apply_shuffle(ds)  # appends __viol_{r.name}
        return ds

    def evaluate(self, ds: Dataset) -> Dataset:
        ds = self.flag(ds)
        names = [r.name for r in self.rules]  # canonical order = list order

        def decide(batch: pa.Table, names=tuple(names)) -> pa.Table:
            viols = [batch.column(f"__viol_{n}").to_numpy(zero_copy_only=False) for n in names]
            n_rows = batch.num_rows
            hits: list[list[str]] = []
            first: list[str | None] = []
            for i in range(n_rows):
                h = [names[j] for j in range(len(names)) if viols[j][i]]
                hits.append(h)
                first.append(h[0] if h else None)
            keep = pa.array([not h for h in hits], type=pa.bool_())
            batch = batch.drop_columns([f"__viol_{n}" for n in names])
            return (
                batch.append_column("rule_hits", pa.array(hits, type=pa.list_(pa.string())))
                .append_column("keep", keep)
                .append_column("drop_rule", pa.array(first, type=pa.string()))
            )

        return ds.map_batches(decide, batch_format="pyarrow")


def corpus_group_rules(ruleset: RuleSet) -> list[Rule]:
    """The rules whose verdict depends on OTHER corpus rows (unique /
    variable-tableau CFD / pair DC) — the set that must not see dropped
    rows in merge_extra_rules and cannot resume over partial corpora.
    InclusionRule is shuffle-implemented but per-row against a static
    external reference, so it is NOT in this set."""
    from .integrity import InclusionRule

    return [r for r in ruleset.rules
            if not r.row_local and not isinstance(r, InclusionRule)]


def merge_extra_rules(ds: Dataset, ruleset: RuleSet) -> Dataset:
    """Merge a declarative RuleSet into an ALREADY-DECIDED dataset (one
    carrying rule_hits / keep / drop_rule, e.g. the flagship's annotate
    output): extra hits append to ``rule_hits``, ``keep`` becomes False
    on any extra hit, and ``drop_rule`` keeps the existing first-violated
    rule (spec rules precede user rules canonically) or takes the first
    extra rule when the row was previously clean.

    Extra rules gate only the SURVIVORS of the existing decision: rows
    already dropped keep their hits/drop_rule unchanged (chained-gates
    semantics).  This is load-bearing in the streaming flagship, where
    already-dropped rows have payload columns slimmed to "" before this
    stage — a user regex over text_scrubbed would otherwise 'fire' on
    every slimmed row and inflate the lineage counters.

    Group-wise rules (unique / variable CFD / pair DC) additionally must
    not let dropped rows contaminate survivors' GROUPS (a dropped row
    sharing a survivor's key would otherwise flag the survivor, and in
    the flagship the dropped row's slimmed "" columns would fabricate
    group values).  When the ruleset contains such rules the input is
    materialized once and they are evaluated over the keep==True subset
    only; per-row rules (and InclusionRule) stay on the streaming
    single-pass path."""
    grp = corpus_group_rules(ruleset)
    if grp:
        import pyarrow.compute as _pc

        ds = ds.materialize()  # split without re-executing the upstream chain

        def only_kept(b: pa.Table) -> pa.Table:
            return b.filter(b.column("keep"))

        def only_dropped(b: pa.Table) -> pa.Table:
            return b.filter(_pc.invert(b.column("keep")))

        survivors = ds.map_batches(only_kept, batch_format="pyarrow")
        dropped = ds.map_batches(only_dropped, batch_format="pyarrow")
        merged = _merge_single_pass(survivors, ruleset)
        # align the dropped passthrough rows to the decided column order
        in_names = [c for c in pa.schema(ds.schema().base_schema).names
                    if c not in ("rule_hits", "keep", "drop_rule")]
        order = in_names + ["rule_hits", "keep", "drop_rule"]

        def reorder(b: pa.Table, order=tuple(order)) -> pa.Table:
            return b.select(list(order))

        return merged.map_batches(
            reorder, batch_format="pyarrow"
        ).union(dropped.map_batches(reorder, batch_format="pyarrow"))

    return _merge_single_pass(ds, ruleset)


def _merge_single_pass(ds: Dataset, ruleset: RuleSet) -> Dataset:
    """merge_extra_rules' streaming body: flag every row, gate only rows
    whose existing rule_hits is empty (see merge_extra_rules for when
    this is safe for group-wise rules)."""
    flagged = ruleset.flag(ds)
    names = [r.name for r in ruleset.rules]

    def decide(batch: pa.Table, names=tuple(names)) -> pa.Table:
        viols = [batch.column(f"__viol_{n}").to_numpy(zero_copy_only=False)
                 for n in names]
        hits0 = batch.column("rule_hits").to_pylist()
        drop0 = batch.column("drop_rule").to_pylist()
        hits, first = [], []
        for i in range(batch.num_rows):
            extra = ([] if hits0[i] else
                     [names[j] for j in range(len(names)) if viols[j][i]])
            h = list(hits0[i]) + extra
            hits.append(h)
            first.append(drop0[i] if drop0[i] is not None
                         else (extra[0] if extra else None))
        keep = pa.array([not h for h in hits], type=pa.bool_())
        batch = batch.drop_columns(
            [f"__viol_{n}" for n in names] + ["rule_hits", "keep", "drop_rule"])
        return (
            batch.append_column("rule_hits", pa.array(hits, type=pa.list_(pa.string())))
            .append_column("keep", keep)
            .append_column("drop_rule", pa.array(first, type=pa.string()))
        )

    return flagged.map_batches(decide, batch_format="pyarrow")


def violation_report(ds: Dataset) -> Dataset:
    """R8/G1: per-rule violation counts, sorted desc — explode rule_hits
    via per-batch partial counts (pre-aggregation), then a tiny groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for hits in batch.column("rule_hits").to_pylist():
            for h in hits:
                counts[h] = counts.get(h, 0) + 1
        return pa.table(
            {
                "rule": pa.array(list(counts.keys()), type=pa.string()),
                "drops": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("rule")
        .aggregate(Sum("drops", alias_name="drops"))
        .sort("drops", descending=True)
    )
