"""`dg filter` / `dg resume` job entry (SURVEY §3 E1/E3; BASELINE.json:6
"launched via ray job submit").

Runnable both directly and via job submission:

  python jobs/filter_job.py INPUT_PARQUET OUT_DIR [--resume] \
      [--num-parts 64] [--num-cpus 32] [--rules RULES.json]
  ray job submit --working-dir . -- python jobs/filter_job.py IN OUT

This script owns the Ray session (library code never calls ray.init).
On a real cluster, drop --num-cpus and `ray.init(address="auto")`
connects to the running cluster; OUT_DIR must then be shared storage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("out_dir")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-parts", type=int, default=64)
    ap.add_argument("--format", dest="input_format", default="parquet",
                    choices=("parquet", "warc"),
                    help="input format: parquet pages table or raw "
                         "WARC/WARC.gz archives")
    ap.add_argument("--rules", default=None,
                    help="extra declarative rules (JSON path/inline, "
                         "rules/config.py schema) merged into the gate")
    ap.add_argument("--block-domains", default=None, metavar="FILE",
                    help="UT1-style blocklist file (one domain/host per "
                         "line, '#'-comments) gated as extra rule "
                         "'url.blocklist' (shorthand for a domain_block "
                         "entry in --rules)")
    ap.add_argument("--quality-tau", type=float, default=None, nargs="?",
                    const=-1.0, metavar="TAU",
                    help="model-quality gate: drop rows with "
                         "quality_score < TAU (default TAU: "
                         "quality.DEFAULT_TAU) and record them under "
                         "rule 'quality.model'")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False

    from dataguards_ray.pipeline import run_filter_job

    tau = args.quality_tau
    if tau is not None and tau < 0:
        from dataguards_ray import quality

        tau = quality.DEFAULT_TAU

    rules_cfg = args.rules
    if args.block_domains:
        from dataguards_ray.rules.config import merge_block_domains

        rules_cfg = merge_block_domains(rules_cfg, args.block_domains)

    t0 = time.time()
    records = run_filter_job(
        args.input,
        args.out_dir,
        num_parts=args.num_parts,
        concurrency=max(2, args.num_cpus - 2),
        resume=args.resume,
        rules_config=rules_cfg,
        input_format=args.input_format,
        quality_tau=tau,
    )
    summary = {
        "partitions": len(records),
        "input_rows": sum(r["input_rows"] for r in records),
        "kept_rows": sum(r.get("kept_rows", 0) for r in records),
        "seconds": round(time.time() - t0, 2),
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
