"""`dg` CLI: python -m dataguards_ray <filter|resume|stats> ...

Thin dispatcher over jobs/ (which own the Ray session); keeps the
"user of the reference could run every pipeline" surface in one place.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(
            "usage: python -m dataguards_ray filter INPUT OUT_DIR [--num-parts N] [--num-cpus N]\n"
            "       python -m dataguards_ray resume INPUT OUT_DIR [...]\n"
            "       python -m dataguards_ray stats OUT_DIR [--top-domains K]\n"
            "       python -m dataguards_ray dedup INPUT OUT_DIR [--mode exact|minhash|simhash|span|line|substring|embedding|semdedup] [--against PRIOR_OUT] [--resume] [...]\n"
            "       python -m dataguards_ray check INPUT --rules RULES.json [--block-domains FILE] [--out DIR] [--violations-only]\n"
            "       python -m dataguards_ray sample INPUT OUT_DIR [--mode hash|budget|stratified|mixture|dsir] [...]\n"
            "       python -m dataguards_ray decontaminate INPUT OUT_DIR --bench BENCH.parquet [--ngram 13] [--drop]"
        )
        return 0
    cmd, rest = sys.argv[1], sys.argv[2:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    if cmd in ("filter", "resume"):
        from jobs.filter_job import main as job_main

        sys.argv = ["filter_job.py", *rest] + (["--resume"] if cmd == "resume" else [])
        return job_main()
    if cmd == "stats":
        from jobs.stats_job import main as stats_main

        sys.argv = ["stats_job.py", *rest]
        return stats_main()
    if cmd == "dedup":
        from jobs.dedup_job import main as dedup_main

        sys.argv = ["dedup_job.py", *rest]
        return dedup_main()
    if cmd == "sample":
        from jobs.sample_job import main as sample_main

        sys.argv = ["sample_job.py", *rest]
        return sample_main()
    if cmd == "decontaminate":
        from jobs.sample_job import main as sample_main

        rest = list(rest)
        if "--bench" in rest:
            i = rest.index("--bench")
            rest[i] = "--decontaminate"
        sys.argv = ["sample_job.py", *rest]
        return sample_main()
    if cmd == "check":
        from jobs.check_job import main as check_main

        sys.argv = ["check_job.py", *rest]
        return check_main()
    print(f"unknown command {cmd!r}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
