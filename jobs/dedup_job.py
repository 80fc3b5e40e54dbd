"""`dg dedup` job: standalone document-dedup pipeline over parquet
(task brief: dedup as a first-class runnable component, not just a
queries() entry).

  python -m dataguards_ray dedup INPUT OUT_DIR [--mode exact|minhash]
      [--threshold 0.8] [--text-col text] [--id-col doc_id]
      [--num-cpus N]
  ray job submit --working-dir . -- python jobs/dedup_job.py IN OUT ...

exact   : hash-partition exact dedup (min-id winner per text fingerprint)
minhash : MinHash+LSH near-dedup (distributed pair discovery + connected
          components; see dataguards_ray/neardup.py)
span    : C4-style duplicated-three-sentence-span removal — keeps every
          doc but deletes repeated spans from all but the first
          occurrence (dataguards_ray/spandedup.py); output columns are
          (id_col, text_col, n_spans_removed)
line    : RefinedWeb-style corpus-wide exact line dedup (same output
          shape as span; lines under 15 normalized chars exempt)

Writes survivor parquet shards to OUT_DIR and prints ONE JSON summary
line.  This script owns the Ray session (library code never calls
ray.init); ``run_dedup_job`` is the importable core for callers that
already hold a session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_dedup_job(
    input_path: str,
    out_dir: str,
    *,
    mode: str = "exact",
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    import ray
    import ray.data

    from dataguards_ray.neardup import (
        exact_dedup_filter,
        exact_dedup_filter_pruned,
        minhash_pair_candidates,
        drop_pair_losers,
        near_dedup_filter,
    )

    assert ray.is_initialized(), "caller owns the Ray session"
    if os.path.isdir(out_dir):
        debris = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
        if debris:
            raise ValueError(
                f"out_dir {out_dir!r} already contains {len(debris)} parquet "
                "file(s); a rerun would merge stale shards into the output "
                "and the kept_rows count — use a clean directory"
            )
    import pyarrow as pa

    ds = ray.data.read_parquet(input_path)
    n_in = ds.count()
    schema_names = list(pa.schema(ds.schema().base_schema).names)
    needed = [c for c in dict.fromkeys([id_col, text_col]) if c in schema_names]
    has_extra = any(c not in (id_col, text_col) for c in schema_names)
    if mode in ("span", "line") and has_extra:
        # span/line output is exactly (id, text, n_spans_removed) —
        # never haul the other columns off storage (VERDICT r02 #7)
        ds = ray.data.read_parquet(input_path, columns=needed)

    def _read_thin() -> "ray.data.Dataset":
        return ray.data.read_parquet(input_path, columns=needed)

    def _null_id_count() -> int:
        ids_only = ray.data.read_parquet(input_path, columns=[id_col])

        def nulls(b: pa.Table) -> pa.Table:
            return pa.table(
                {"n": pa.array([b.column(id_col).null_count], type=pa.int64())})

        return int(ids_only.map_batches(
            nulls, batch_format="pyarrow").sum("n") or 0)

    drop_cols: list[str] = []
    nid_needed = mode == "minhash" and not pa.types.is_integer(
        pa.schema(ds.schema().base_schema).field(id_col).type
    )
    if nid_needed:
        # the near-dup pair machinery keys on int64 ids; derive a stable
        # 64-bit hash id for string/other keys (collisions ~2^-64/pair)
        from dataguards_ray.spec import fnv1a64

        import uuid

        def add_nid(b: pa.Table, src_col: str = id_col) -> pa.Table:
            # null ids must NOT share one hash (nulls are never duplicates
            # of each other) — give each null row a unique per-batch id
            tag = uuid.uuid4().hex
            ids = [
                fnv1a64((f"v:{v}" if v is not None else f"n:{tag}:{i}").encode())
                - (1 << 63)
                for i, v in enumerate(b.column(src_col).to_pylist())
            ]
            return b.append_column("__nid", pa.array(ids, type=pa.int64()))

    # Column-pruned two-read path (VERDICT r02 #7): discovery over an
    # id+text-only read, loser drop as one vectorized filter over the
    # full read — payload columns never leave storage for discovery and
    # never enter a shuffle.  Needs non-null ids (losers are matched
    # back by id); with null ids, or when the input has no payload
    # columns anyway, the single-read in-memory path is used.
    pruned = (has_extra and mode in ("exact", "minhash")
              and _null_id_count() == 0)
    if mode == "exact":
        if pruned:
            out = exact_dedup_filter_pruned(
                _read_thin(), ds, text_col=text_col, id_col=id_col)
        else:
            out = exact_dedup_filter(ds, text_col=text_col, id_col=id_col)
    elif mode == "minhash":
        if pruned:
            thin = _read_thin()
            full = ds
            pair_id = id_col
            if nid_needed:
                # deterministic for non-null ids (guarded above), so the
                # thin and full reads derive identical __nid values
                thin = thin.map_batches(add_nid, batch_format="pyarrow")
                full = full.map_batches(add_nid, batch_format="pyarrow")
                pair_id = "__nid"
                drop_cols = ["__nid"]
            pairs = minhash_pair_candidates(
                thin, text_col=text_col, id_col=pair_id, threshold=threshold)
            out = drop_pair_losers(full, pairs, id_col=pair_id)
        else:
            if nid_needed:
                ds = ds.map_batches(add_nid, batch_format="pyarrow")
                id_col = "__nid"
                drop_cols = ["__nid"]
            out = near_dedup_filter(ds, text_col=text_col, id_col=id_col,
                                    threshold=threshold)
    elif mode == "span":
        from dataguards_ray.spandedup import span_dedup

        out = span_dedup(ds, text_col=text_col, id_col=id_col)
    elif mode == "line":
        from dataguards_ray.spandedup import line_dedup

        out = line_dedup(ds, text_col=text_col, id_col=id_col)
    else:
        raise ValueError(f"unknown dedup mode {mode!r}")
    if drop_cols:
        out = out.drop_columns(drop_cols)
    out.write_parquet(out_dir)
    written = ray.data.read_parquet(out_dir)
    n_out = written.count()
    res = {"mode": mode, "input_rows": n_in, "kept_rows": n_out,
           "dropped_rows": n_in - n_out}
    if mode in ("span", "line"):
        res["spans_removed"] = int(written.sum("n_spans_removed") or 0)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("out_dir")
    ap.add_argument("--mode", choices=("exact", "minhash", "span", "line"),
                    default="exact")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
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

    t0 = time.time()
    res = run_dedup_job(args.input, args.out_dir, mode=args.mode,
                        threshold=args.threshold, text_col=args.text_col,
                        id_col=args.id_col)
    res["seconds"] = round(time.time() - t0, 2)
    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
