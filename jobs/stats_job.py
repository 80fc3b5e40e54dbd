"""`dg stats` — reporting over a finished filter run (SURVEY §3 E2).

Per-rule drop counts and per-language retention come straight from the
per-partition lineage manifests (counters persisted at write time —
BASELINE.json:6 "rule-hit counters persisted"); top-domain stats come
from a salted groupby over the survivor corpus (G3, domain skew).

  python jobs/stats_job.py OUT_DIR [--num-cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def lineage_stats(out_dir: str) -> dict:
    """Pure manifest merge — no Ray needed.  Handles BOTH manifest
    flavors: filter-run manifests (input_rows / rule_counts /
    lang_totals) and the generic partitioned-writer manifests that
    `dg dedup/sample/check/decontaminate --out` write (part_id /
    kept_rows / op params only) — stats on those reports row totals
    and the recorded op, with the rule/lang sections empty."""
    from dataguards_ray.io import read_lineage

    rule_drops: dict[str, int] = {}
    lang_tot: dict[str, int] = {}
    lang_kept: dict[str, int] = {}
    ops: set[str] = set()
    input_rows = kept_rows = n_manifests = 0
    saw_input = False
    for m in read_lineage(out_dir):
        n_manifests += 1
        if "input_rows" in m:
            saw_input = True
            input_rows += m["input_rows"]
        kept_rows += m.get("kept_rows", m.get("kept_pre_dedup", 0))
        for key in ("op", "spec"):
            if m.get(key):
                ops.add(str(m[key]))
        for r, n in m.get("rule_counts", {}).items():
            rule_drops[r] = rule_drops.get(r, 0) + n
        for lg, n in m.get("lang_totals", {}).items():
            lang_tot[lg] = lang_tot.get(lg, 0) + n
        for lg, n in m.get("lang_kept", {}).items():
            lang_kept[lg] = lang_kept.get(lg, 0) + n
    retention = {
        lg: {"total": lang_tot[lg], "kept": lang_kept.get(lg, 0),
             "retention": lang_kept.get(lg, 0) / lang_tot[lg]}
        for lg in sorted(lang_tot)
    }
    if not n_manifests:
        # manifest-less outputs: the embedding/semdedup dedup modes
        # write plain survivor parquet with no lineage — row totals
        # come from the parquet footers (metadata only, no Ray, no
        # data read; subdirs like _dedup_manifest/ are NOT survivors).
        # A truly empty finished run (no files at all) stays 0.
        import pyarrow.parquet as _pq

        files = sorted(
            os.path.join(out_dir, f) for f in os.listdir(out_dir)
            if f.endswith(".parquet")
            and os.path.isfile(os.path.join(out_dir, f))
        ) if os.path.isdir(out_dir) else []
        if files:
            kept_rows = sum(
                _pq.ParquetFile(f).metadata.num_rows for f in files)
            saw_input = False  # unknown without manifests → None below
            n_manifests = -1   # flag: report input_rows as unknown
    out = {
        # None when generic-writer manifests exist without the field,
        # or when a manifest-less survivor dir makes the input size
        # unknowable; an empty finished run (no manifests, no files)
        # reports 0
        "input_rows": (input_rows if saw_input or n_manifests == 0
                       else None),
        "kept_rows": kept_rows,
        "rule_drops": dict(sorted(rule_drops.items(), key=lambda kv: -kv[1])),
        "lang_retention": retention,
    }
    if ops:
        out["ops"] = sorted(ops)
    return out


def domain_stats(out_dir: str, k: int = 20) -> list[tuple[str, int]]:
    """Top survivor domains via salted groupby (Ray session required)."""
    import pyarrow as pa

    from dataguards_ray.aggregates import salted_groupby, topk
    from dataguards_ray.io import read_filtered
    from dataguards_ray.urltools import add_url_domain

    survivors = read_filtered(out_dir)
    if survivors.count() == 0:  # a run may legitimately keep 0 rows
        return []
    sch = survivors.schema()
    if sch is None or "url" not in sch.names:
        return []  # partitioned outputs of url-less tables: no domains
    ds = add_url_domain(survivors)
    counts = salted_groupby(ds, ["domain"], [("url", "count", "n")],
                            salt_n=16, salt_source="url")
    top = topk(counts, [("n", True), ("domain", False)], k)
    return [(r["domain"], r["n"]) for r in top.take_all()]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--top-domains", type=int, default=20)
    args = ap.parse_args()

    report = lineage_stats(args.out_dir)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # same perf knob as the sibling jobs (see bench.py): the per-operator
    # reservation allocator starves the dominant stage
    ctx.op_resource_reservation_enabled = False
    report["top_domains"] = domain_stats(args.out_dir, args.top_domains)
    print(json.dumps(report, indent=2))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
