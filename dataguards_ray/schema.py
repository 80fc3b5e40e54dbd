"""Declared Arrow schemas + fail-fast validation (SURVEY.md §1).

Schema validation is itself a guard: rule #0 ``schema.valid``.
"""

from __future__ import annotations

import pyarrow as pa

# §1.2 core table: Common-Crawl-style web pages (BASELINE.json:15 input_hint).
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# §1.4 lineage record (one per output partition; doubles as resume manifest).
LINEAGE_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("input_rows", pa.int64()),
        ("kept_rows", pa.int64()),
        ("dropped_rows", pa.int64()),
        ("rule_counts", pa.list_(pa.struct([("rule", pa.string()), ("n", pa.int64())]))),
        ("output_file", pa.string()),
    ]
)


class SchemaMismatch(ValueError):
    pass


def validate_schema(actual: pa.Schema, expected: pa.Schema, *, allow_extra: bool = True) -> None:
    """Fail fast if `actual` is missing a declared column or a type differs.

    Extra columns are tolerated by default (stages are schema-additive,
    SURVEY.md §1.3).
    """
    by_name = {f.name: f for f in actual}
    for field in expected:
        got = by_name.get(field.name)
        if got is None:
            raise SchemaMismatch(f"missing column {field.name!r}; have {actual.names}")
        if got.type != field.type:
            raise SchemaMismatch(
                f"column {field.name!r}: expected {field.type}, got {got.type}"
            )
    if not allow_extra:
        extra = set(by_name) - {f.name for f in expected}
        if extra:
            raise SchemaMismatch(f"unexpected columns: {sorted(extra)}")
