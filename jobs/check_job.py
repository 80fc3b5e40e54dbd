"""`dg check` job: declarative data-quality checking over parquet —
the DataGuards core as a standalone runnable (rules as a JSON config,
compiled into vectorized stages / keyed shuffles, violations out).

  python -m dataguards_ray check INPUT --rules RULES.json
      [--out OUT_DIR] [--violations-only] [--num-cpus N]
  ray job submit --working-dir . -- python jobs/check_job.py IN --rules R

- RULES.json: see dataguards_ray/rules/config.py for the schema
  (range / regex / predicate / cfd / dc / unique / inclusion).
- --out: write the annotated table (each row + rule_hits / keep /
  drop_rule) as parquet shards; with --violations-only, only rows that
  violate at least one rule are written.
- stdout: ONE JSON line {"rows": N, "violations": V,
  "rule_drops": {rule: n, ...}} — rule_drops counts every rule hit
  (a row can hit several rules).

This script owns the Ray session (library code never calls ray.init);
``run_check_job`` is the importable core.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _cfg_token(cfg: "str | dict | list") -> str:
    """Stable identity of a rule config for resume validation: file
    configs hash their CONTENT (same path, edited rules → mismatch)."""
    import hashlib

    if isinstance(cfg, str):
        if os.path.isfile(cfg):
            with open(cfg, "rb") as f:
                return "md5:" + hashlib.md5(f.read()).hexdigest()
        return cfg
    return json.dumps(cfg, sort_keys=True)


def run_check_job(
    input_path: str,
    rules_cfg: "str | dict | list",
    *,
    out_dir: str | None = None,
    violations_only: bool = False,
    id_col: str | None = None,
    partitions: int = 64,
    resume: bool = False,
) -> dict:
    import pyarrow as pa
    import ray
    import ray.data

    from dataguards_ray.rules.config import rules_from_config
    from dataguards_ray.rules.dsl import violation_report

    assert ray.is_initialized(), "caller owns the Ray session"

    ruleset = rules_from_config(rules_cfg)
    ds = ray.data.read_parquet(input_path)

    def _annot(d: "ray.data.Dataset") -> "ray.data.Dataset":
        a = ruleset.evaluate(d)
        if violations_only:
            def only_bad(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return b.filter(pc.invert(b.column("keep")))

            a = a.map_batches(only_bad, batch_format="pyarrow")
        return a

    if out_dir:
        from dataguards_ray.io import (has_parquet_files,
                                       write_partitioned_resumable)

        schema_names = list(pa.schema(ds.schema().base_schema).names)
        idc = id_col or next(
            (c for c in ("doc_id", "id", "url") if c in schema_names), None)
        n_rows = ds.count()
        if idc is not None:
            # resumable partitioned write (round-5, VERDICT item #7).
            # Row-LOCAL rulesets evaluate inside the per-partition
            # transform, so a resume skips finished partitions' rule
            # compute too; corpus-global rules (unique / inclusion)
            # must see the whole corpus, so they evaluate upstream and
            # resume skips only the write.
            row_local_only = all(r.row_local for r in ruleset.rules)
            params = {"op": "check", "input": input_path,
                      "rules": _cfg_token(rules_cfg),
                      "violations_only": violations_only}
            if row_local_only:
                write_partitioned_resumable(
                    ds, out_dir, id_col=idc, partitions=partitions,
                    params=params, resume=resume, transform=_annot)
            else:
                write_partitioned_resumable(
                    _annot(ds), out_dir, id_col=idc, partitions=partitions,
                    params=params, resume=resume)
        else:
            # no id-shaped column to key partitions on: one-shot write
            if resume:
                raise ValueError(
                    "--resume needs an id column to key partitions "
                    "(pass --id-col)")
            if os.path.isdir(out_dir) and has_parquet_files(out_dir):
                raise ValueError(
                    f"out_dir {out_dir!r} already contains parquet files; "
                    "use a clean directory")
            _annot(ds).write_parquet(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        if not has_parquet_files(out_dir):
            # clean data + --violations-only: Ray writes NOTHING for an
            # all-filtered dataset (not even the directory) — the happy
            # path must report zero, not crash on the read-back
            return {"rows": n_rows, "violations": 0, "rule_drops": {}}
        # counters from what was written (no second evaluate execution)
        base = ray.data.read_parquet(out_dir)
        report = violation_report(base)
        n_viol = (base.count() if violations_only
                  else int(base.filter(expr="keep == False").count()))
    else:
        annotated = ruleset.evaluate(ds).materialize()
        report = violation_report(annotated)
        n_rows = annotated.count()
        n_viol = int(annotated.filter(expr="keep == False").count())

    drops = {r["rule"]: int(r["drops"]) for r in report.take_all()}
    return {"rows": n_rows, "violations": n_viol, "rule_drops": drops}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--rules", default=None,
                    help="path to the JSON rule config (or inline JSON)")
    ap.add_argument("--block-domains", default=None, metavar="FILE",
                    help="UT1-style blocklist file checked as rule "
                         "'url.blocklist' (shorthand for a domain_block "
                         "entry in --rules; either flag suffices)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--violations-only", action="store_true")
    ap.add_argument("--id-col", default=None,
                    help="partition-key column for the resumable --out "
                         "layout (auto: doc_id/id/url)")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--resume", action="store_true",
                    help="continue a killed --out run (same arguments)")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    rules_cfg = args.rules
    if args.block_domains:
        from dataguards_ray.rules.config import merge_block_domains

        rules_cfg = merge_block_domains(rules_cfg, args.block_domains)
    if rules_cfg is None:
        ap.error("one of --rules / --block-domains is required")

    t0 = time.time()
    res = run_check_job(args.input, rules_cfg, out_dir=args.out,
                        violations_only=args.violations_only,
                        id_col=args.id_col, partitions=args.partitions,
                        resume=args.resume)
    res["seconds"] = round(time.time() - t0, 2)
    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
