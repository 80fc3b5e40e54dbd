"""`dg sample` / `dg decontaminate` jobs: training-data mixture building
over parquet — deterministic sampling and benchmark decontamination as
runnable pipelines (SURVEY task-brief extras; the operators live in
dataguards_ray/aggregates.py and textstats.py).

  python jobs/sample_job.py INPUT OUT_DIR --mode hash --frac 0.2
  python jobs/sample_job.py INPUT OUT_DIR --mode budget --budget 1000000
  python jobs/sample_job.py INPUT OUT_DIR --mode stratified --key lang \
      --n-per-group 1000 --order-col warc_ts
  python jobs/sample_job.py INPUT OUT_DIR --mode mixture \
      --weights src0=0.5,src1=0.3,src2=0.2 --budget 1000000
  python jobs/sample_job.py INPUT OUT_DIR --mode dsir \
      --target TARGET.parquet --k 100000 [--seed 0]
  python jobs/sample_job.py INPUT OUT_DIR --decontaminate BENCH.parquet \
      [--ngram 13] [--drop] [--resume] [--partitions P]

All modes stream: read → operator → partitioned parquet write; nothing
corpus-sized on the driver.  Sampling is hash-deterministic
(parallelism- and rerun-invariant), never ds.random_sample.

Every mode writes through ``io.write_partitioned_resumable`` (round 5):
deterministic id-hash partition files + per-partition ``_lineage``
manifests, and ``--resume`` continues a killed run byte-equal to
single-shot.  Decontaminate additionally skips the n-gram PROBE for
finished partitions (membership is per-row); the samplers' membership
is a global function of the corpus, so a resume recomputes the eager
thin passes (bucket partials + boundary resolve — cheap) and skips
only the finished partitions' write
(test_decontaminate_job_kill_and_resume, test_sample_job_kill_and_resume).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_decontaminate_job(
    input_path: str,
    out_dir: str,
    bench_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 13,
    drop: bool = False,
    resume: bool = False,
    partitions: int = 64,
) -> dict:
    """Benchmark decontamination as a resumable job (module docstring).
    Returns {"op", "output_rows"}."""
    import ray.data

    from dataguards_ray.io import write_partitioned_resumable
    from dataguards_ray.textstats import decontaminate

    ds = ray.data.read_parquet(input_path)
    bench = ray.data.read_parquet(bench_path, columns=[text_col])
    mode = "drop" if drop else "flag"
    kept = write_partitioned_resumable(
        ds, out_dir,
        id_col=id_col,
        partitions=partitions,
        params={"op": "decontaminate", "input": input_path,
                "bench": bench_path, "ngram": ngram,
                "mode": mode, "text_col": text_col},
        resume=resume,
        transform=lambda d: decontaminate(
            d, bench, text_col=text_col, n=ngram, mode=mode),
    )
    return {"op": f"decontaminate(n={ngram}, {mode})", "output_rows": kept}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("out_dir")
    ap.add_argument("--mode",
                    choices=("hash", "budget", "stratified", "mixture",
                             "dsir"),
                    default="hash")
    ap.add_argument("--frac", type=float, default=0.1,
                    help="hash mode: kept fraction (md5(text) mod 1000)")
    ap.add_argument("--budget", type=int, default=1_000_000,
                    help="budget mode: max running RE2-token total")
    ap.add_argument("--key", default="lang",
                    help="stratified mode: group column")
    ap.add_argument("--n-per-group", type=int, default=1000)
    ap.add_argument("--order-col", default=None,
                    help="stratified mode: deterministic order column "
                         "(descending; id tiebreak added)")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--weights", default=None,
                    help="mixture mode: per-source weights, "
                         "'src0=0.5,src1=0.3' (unlisted sources dropped)")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--target", default=None, metavar="TARGET",
                    help="dsir mode: parquet of target-domain docs")
    ap.add_argument("--k", type=int, default=100_000,
                    help="dsir mode: docs to select (Gumbel-top-k)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--decontaminate", default=None, metavar="BENCH",
                    help="parquet of benchmark docs: flag (default) or "
                         "--drop docs sharing any --ngram token n-gram")
    ap.add_argument("--ngram", type=int, default=13)
    ap.add_argument("--drop", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="continue a killed run (same arguments): "
                         "finished partitions skip the write — and, for "
                         "decontaminate, the n-gram probe too")
    ap.add_argument("--partitions", type=int, default=64,
                    help="output partition count (resumable layout)")
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

    import ray.data

    t0 = time.time()
    ds = ray.data.read_parquet(args.input)
    n_in = ds.count()

    # column preflight: every mode fails up front with the flag to fix,
    # not with a KeyError deep inside a Ray task.  The partitioned
    # output layout always needs --id-col; each mode adds its own
    # required columns, and side tables (dsir --target, --decontaminate
    # BENCH) are schema-checked straight from their parquet footers.
    import pyarrow as _pa

    schema_names = _pa.schema(ds.schema().base_schema).names
    need = {"--id-col": args.id_col}
    if args.decontaminate is not None or args.mode in (
            "hash", "budget", "mixture", "dsir"):
        need["--text-col"] = args.text_col
    if args.decontaminate is None and args.mode == "mixture":
        need["--source-col"] = args.source_col
    if args.decontaminate is None and args.mode == "stratified":
        need["--key"] = args.key
        if args.order_col:
            need["--order-col"] = args.order_col
    for flag, col in need.items():
        if col not in schema_names:
            ap.error(f"{flag} {col!r} not in input columns "
                     f"{list(schema_names)}")

    def _check_side_table(path: str, what: str) -> None:
        import pyarrow.parquet as _pq

        f = path
        if os.path.isdir(path):
            pf = sorted(p for p in os.listdir(path)
                        if p.endswith(".parquet"))
            if not pf:
                ap.error(f"{what} {path!r} contains no parquet files")
            f = os.path.join(path, pf[0])
        names = _pq.read_schema(f).names
        if args.text_col not in names:
            ap.error(f"--text-col {args.text_col!r} not in {what} "
                     f"columns {list(names)}")

    if args.decontaminate is not None:
        _check_side_table(args.decontaminate, "--decontaminate BENCH")
    elif args.mode == "dsir" and args.target:
        _check_side_table(args.target, "--target")

    if args.decontaminate is not None:
        res = run_decontaminate_job(
            args.input, args.out_dir, args.decontaminate,
            text_col=args.text_col, id_col=args.id_col, ngram=args.ngram,
            drop=args.drop, resume=args.resume, partitions=args.partitions)
        print(json.dumps({"op": res["op"], "input_rows": n_in,
                          "output_rows": res["output_rows"],
                          "seconds": round(time.time() - t0, 2)}))
        ray.shutdown()
        return 0
    if args.mode == "hash":
        import numpy as np
        import pyarrow as pa

        thresh = int(args.frac * 1000)

        def f(b: pa.Table) -> pa.Table:
            # int(md5(text)[:8], 16) == big-endian uint32 of the first 4
            # digest bytes — buffer-level kernel, no per-row Python
            from dataguards_ray.hashutil import md5_digest_matrix

            col = b.column(args.text_col)
            dig = md5_digest_matrix(col)
            v = dig[:, :4].astype(np.uint64)
            h32 = (v[:, 0] << 24) | (v[:, 1] << 16) | (v[:, 2] << 8) | v[:, 3]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            valid = col.is_valid().to_numpy(zero_copy_only=False)
            mask = valid & ((h32 % 1000) < thresh)
            return b.filter(pa.array(mask, type=pa.bool_()))

        out = ds.map_batches(f, batch_format="pyarrow")
        op = f"hash(frac={args.frac})"
    elif args.mode == "budget":
        from dataguards_ray.aggregates import sample_by_token_budget

        out = sample_by_token_budget(ds, args.budget,
                                     text_col=args.text_col,
                                     id_col=args.id_col)
        op = f"budget({args.budget})"
    elif args.mode == "mixture":
        from dataguards_ray.aggregates import sample_mixture

        if not args.weights:
            ap.error("--mode mixture requires --weights src=w,src=w")
        weights = {}
        for kv in args.weights.split(","):
            s, _, w = kv.partition("=")
            weights[s.strip()] = float(w)
        out = sample_mixture(ds, args.budget, weights,
                             source_col=args.source_col,
                             text_col=args.text_col, id_col=args.id_col)
        op = f"mixture({args.budget}, {sorted(weights)})"
    elif args.mode == "dsir":
        from dataguards_ray.dsir import dsir_resample

        if not args.target:
            ap.error("--mode dsir requires --target TARGET.parquet")
        target = ray.data.read_parquet(args.target,
                                       columns=[args.text_col])
        out = dsir_resample(ds, target, args.k, text_col=args.text_col,
                            id_col=args.id_col, seed=args.seed)
        op = f"dsir(k={args.k}, seed={args.seed})"
    else:
        from dataguards_ray.aggregates import stratified_sample

        order = args.order_col or args.id_col
        out = stratified_sample(ds, args.key, args.n_per_group,
                                [(order, True), (args.id_col, True)])
        op = (f"stratified({args.key}, n={args.n_per_group}, "
              f"order={order})")

    # resumable partitioned write (round-5, VERDICT item #7).  Sample
    # MEMBERSHIP is a pure deterministic function of the full input
    # corpus (hash/rank/seeded-Gumbel — never random_sample), and the
    # samplers' global passes (bucket partials, boundary resolve) run
    # eagerly over the FULL corpus before this lazy write, so a resumed
    # run recomputes the same membership and skips only the finished
    # partitions' write — byte-equal to single-shot (tests).
    from dataguards_ray.io import write_partitioned_resumable

    n_out = write_partitioned_resumable(
        out, args.out_dir, id_col=args.id_col, partitions=args.partitions,
        params={"op": "sample", "input": args.input, "spec": op,
                "text_col": args.text_col, "id_col": args.id_col},
        resume=args.resume)
    print(json.dumps({"op": op, "input_rows": n_in, "output_rows": n_out,
                      "seconds": round(time.time() - t0, 2)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
