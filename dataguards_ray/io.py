"""Sources / sinks (SURVEY §2.1): schema-validated Parquet reader,
two-phase partition-deterministic resumable writer, lineage manifests.

Resumable layout (SURVEY §3 E3, BASELINE.json:6 "resumes from checkpoint"),
one deterministic ``part_id = fnv1a64(url) % P`` per row (assigned in the
prepare stage so a resume can skip finished partitions BEFORE any heavy
compute):

  out_dir/
    kept-{pid:05d}.parquet    phase 1: annotated KEPT rows (pre-dedup)
    part-{pid:05d}.parquet    phase 2: final survivors (post text-dedup)
    _lineage/part-{pid:05d}.json   manifest: stage "annotated" → "final"

Every file is written atomically (tmp + os.replace).  Phase 2 (exact
text-dedup) only starts once phase 1 holds for ALL partitions; both
phases are deterministic functions of the input corpus, so a crashed run
resumed later converges to byte-identical output (tests/test_e2e.py).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data
from ray.data import Dataset

from .schema import PAGES_SCHEMA, validate_schema

# Columns persisted for kept rows (phase 1) and final output (phase 2).
OUTPUT_COLUMNS = [
    "url", "warc_ts", "lang", "lang_id", "lang_score", "ppl",
    "text_scrubbed", "scrub_count", "digest", "part_id",
]

#: annotation columns persisted IF the run produced them (opt-in stages)
OPTIONAL_OUTPUT_COLUMNS = ["quality_score"]


def read_pages(path: str, *, columns: list[str] | None = None) -> Dataset:
    """S1: Parquet reader for the §1.2 pages table, schema fail-fast."""
    ds = ray.data.read_parquet(path, columns=columns)
    expected = PAGES_SCHEMA if columns is None else pa.schema(
        [f for f in PAGES_SCHEMA if f.name in columns]
    )
    validate_schema(pa.schema(ds.schema().base_schema), expected)
    return ds


def read_table(sf_dir: str, name: str, *, columns: list[str] | None = None) -> Dataset:
    """S2: generic reader for the driver test tables.

    Small-input fast path: Ray's default parallelism floor (≥ 2×CPUs
    read tasks) turns a few-MB table into 64 near-empty blocks, and
    every downstream stage then pays 64 task launches for microseconds
    of work — measured ~2 s of pure scheduling on a 2 MB table at 32
    CPUs.  For inputs under 64 MB we size blocks at ~1 MB (floor 16 —
    keeps compute-heavy downstream stages parallel — cap 64); larger
    inputs keep Ray's own size-based splitting untouched, so the
    100 TB path is exactly stock Ray Data."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    kw: dict = {}
    try:
        sz = os.path.getsize(path) if os.path.isfile(path) else sum(
            os.path.getsize(os.path.join(path, f)) for f in os.listdir(path))
        if sz < 64 << 20:
            # floor 16 keeps compute-heavy downstream stages (minhash,
            # perplexity) parallel; 1 MB blocks cap the task count
            kw["override_num_blocks"] = min(64, max(16, sz >> 20))
    except OSError:
        pass
    return ray.data.read_parquet(path, columns=columns, **kw)


def _atomic_write_table(table: pa.Table, path: str) -> None:
    tmp = os.path.join(
        os.path.dirname(path), f".tmp-{os.path.basename(path)}-{uuid.uuid4().hex}"
    )
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _atomic_write_json(obj: dict, path: str) -> None:
    tmp = os.path.join(
        os.path.dirname(path), f".tmp-{os.path.basename(path)}-{uuid.uuid4().hex}"
    )
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "_lineage", f"part-{pid:05d}.json")


def kept_file(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"kept-{pid:05d}.parquet")


def final_file(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"part-{pid:05d}.parquet")


def write_annotated_partition(group: pa.Table, out_dir: str) -> pa.Table:
    """Phase 1 writer — runs inside groupby('part_id').map_groups.

    url-dedup happens HERE: part_id = fnv1a64(url) % P co-locates every
    row of a url in one partition group, so newest-wins needs no extra
    pass or shuffle (J4; input contract: (url, warc_ts) unique).  Then
    writes the partition's kept rows (pre text-dedup) + an 'annotated'
    manifest with input/rule counters.  Returns a one-row summary table.
    """
    pid = int(group.column("part_id")[0].as_py())
    n_raw = group.num_rows
    urls = group.column("url").to_pylist()
    # null urls are schema-invalid rows, never dup losers (NULL ≠ NULL)
    n_distinct = len({u for u in urls if u is not None}) + sum(u is None for u in urls)
    if n_distinct != n_raw:  # url-dup losers present (rare)
        ts = pa.compute.cast(group.column("warc_ts"), pa.int64()).to_pylist()
        best: dict[str, int] = {}
        for u, t in zip(urls, ts):
            if u is not None and (u not in best or t > best[u]):
                best[u] = t
        mask = [u is None or best[u] == t for u, t in zip(urls, ts)]
        group = group.filter(pa.array(mask, type=pa.bool_()))
    kept = group.filter(group.column("keep"))
    rule_counts: dict[str, int] = {}
    for hits in group.column("rule_hits").to_pylist():
        for h in hits:
            rule_counts[h] = rule_counts.get(h, 0) + 1
    # per-language totals/kept (E2 retention stats come from manifests alone)
    lang_totals: dict[str, int] = {}
    lang_kept: dict[str, int] = {}
    for lg, kp in zip(group.column("lang_id").to_pylist(), group.column("keep").to_pylist()):
        lang_totals[lg] = lang_totals.get(lg, 0) + 1
        if kp:
            lang_kept[lg] = lang_kept.get(lg, 0) + 1

    kf = ""
    if kept.num_rows:
        kf = f"kept-{pid:05d}.parquet"
        # OPTIONAL_OUTPUT_COLUMNS ride along when a run produced them
        # (e.g. quality_score under dg filter --quality-tau)
        cols = OUTPUT_COLUMNS + [
            c for c in OPTIONAL_OUTPUT_COLUMNS if c in kept.schema.names]
        _atomic_write_table(kept.select(cols), os.path.join(out_dir, kf))

    manifest = {
        "part_id": pid,
        "stage": "annotated",
        # input_rows counts post-url-dedup rows (the rows the rule stats
        # describe — frozen round-1 semantics shared with the oracle);
        # rows_read / url_dup_losers account for everything read.
        "rows_read": n_raw,
        "url_dup_losers": n_raw - group.num_rows,
        "input_rows": group.num_rows,
        "kept_pre_dedup": kept.num_rows,
        "rule_counts": rule_counts,
        "lang_totals": lang_totals,
        "lang_kept": lang_kept,
        "kept_file": kf,
    }
    _atomic_write_json(manifest, _manifest_path(out_dir, pid))

    # return this partition's text-dedup PARTIALS (one row per distinct
    # kept digest: count + max rank) — the caller's groupby('digest')
    # merges them in the SAME execution, so winner discovery costs no
    # second pass over the kept files.
    if kept.num_rows:
        from .steps.dedup import rank_expr

        t = pa.table(
            {
                "digest": kept.column("digest"),
                "r": rank_expr(kept.column("warc_ts"), kept.column("url")),
            }
        )
        g = t.group_by("digest").aggregate([("r", "max"), ("r", "count")])
        return g.rename_columns(["digest", "r", "n"])
    return pa.table(
        {
            "digest": pa.array([], type=pa.string()),
            "r": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )


def _atomic_link_or_copy(src: str, dst: str) -> None:
    """Publish src under dst without rewriting bytes (hardlink; copy as
    the cross-filesystem fallback) — atomic via tmp + os.replace."""
    tmp = os.path.join(
        os.path.dirname(dst), f".tmp-{os.path.basename(dst)}-{uuid.uuid4().hex}"
    )
    try:
        os.link(src, tmp)
    except OSError:
        import shutil

        shutil.copyfile(src, tmp)
    os.replace(tmp, dst)


def finalize_partition(pid: int, out_dir: str, winners: dict[str, str]) -> dict:
    """Phase 2 — pure per-partition task: drop text-dedup losers from the
    kept file, write the final survivor file, upgrade the manifest.

    Fast path (round 2): most partitions hold NO contested digest — a
    cheap digest-column probe decides, and untouched partitions publish
    the kept file as the final file via hardlink instead of a full
    parquet decode + re-encode (at 10^12 docs this halves phase-2 IO)."""
    from .steps.dedup import rank_expr  # local import: keep io deps minimal

    with open(_manifest_path(out_dir, pid)) as f:
        manifest = json.load(f)
    n_final = 0
    out_f = ""
    if manifest["kept_file"]:
        import pyarrow.compute as pc

        kept_path = os.path.join(out_dir, manifest["kept_file"])
        contested = pa.array(sorted(winners), type=pa.string()) if winners else None
        needs_rewrite = False
        if winners:
            dcol = pq.read_table(kept_path, columns=["digest"]).column("digest")
            hit = pc.fill_null(pc.is_in(dcol, value_set=contested), False)
            needs_rewrite = bool(pc.any(hit).as_py())
            n_final = len(dcol)
        else:
            n_final = pq.ParquetFile(kept_path).metadata.num_rows
        out_f = f"part-{pid:05d}.parquet"
        if needs_rewrite:
            t = pq.read_table(kept_path)
            winner_keys = pa.array(
                sorted(f"{d}\x1f{r}" for d, r in winners.items()), type=pa.string()
            )
            ranks = rank_expr(t.column("warc_ts"), t.column("url"))
            key = pc.binary_join_element_wise(t.column("digest"), ranks, "\x1f")
            mask = pc.or_(
                pc.invert(pc.is_in(t.column("digest"), value_set=contested)),
                pc.is_in(key, value_set=winner_keys),
            )
            t = t.filter(mask)
            n_final = t.num_rows
            if n_final:
                _atomic_write_table(t, os.path.join(out_dir, out_f))
            else:
                out_f = ""
        else:
            _atomic_link_or_copy(kept_path, os.path.join(out_dir, out_f))
    manifest.update(
        stage="final",
        kept_rows=n_final,
        dropped_rows=manifest["input_rows"] - n_final,
        output_file=out_f,
    )
    _atomic_write_json(manifest, _manifest_path(out_dir, pid))
    return manifest


def partitions_by_stage(out_dir: str) -> dict[str, set[int]]:
    """{'annotated': pids, 'final': pids} — manifests whose referenced data
    files actually exist (a manifest without its file is not done)."""
    lin_dir = os.path.join(out_dir, "_lineage")
    out: dict[str, set[int]] = {"annotated": set(), "final": set()}
    if not os.path.isdir(lin_dir):
        return out
    for name in os.listdir(lin_dir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        with open(os.path.join(lin_dir, name)) as f:
            m = json.load(f)
        pid = int(m["part_id"])
        if m["kept_file"] and not os.path.exists(os.path.join(out_dir, m["kept_file"])):
            continue
        out["annotated"].add(pid)
        if m["stage"] == "final":
            if m["output_file"] and not os.path.exists(
                os.path.join(out_dir, m["output_file"])
            ):
                continue
            out["final"].add(pid)
    return out


def has_parquet_files(d: str) -> bool:
    """True when ``d`` exists and holds at least one .parquet file.
    THE guard around Ray's write-nothing-for-an-empty-dataset behavior:
    ``Dataset.write_parquet`` of a fully-filtered dataset emits no files
    (and may not even create the directory), so every read-back of a
    just-written dir must check this first."""
    return os.path.isdir(d) and any(
        f.endswith(".parquet") for f in os.listdir(d))


def read_lineage(out_dir: str) -> list[dict]:
    lin_dir = os.path.join(out_dir, "_lineage")
    out = []
    for name in sorted(os.listdir(lin_dir)) if os.path.isdir(lin_dir) else []:
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(lin_dir, name)) as f:
                out.append(json.load(f))
    return out


def _read_parts(out_dir: str, prefix: str) -> Dataset:
    files = [
        os.path.join(out_dir, n)
        for n in sorted(os.listdir(out_dir))
        if n.startswith(prefix) and n.endswith(".parquet")
    ]
    if not files:  # a finished run that kept 0 rows writes no part files
        return ray.data.from_items([])
    return ray.data.read_parquet(files)


def read_filtered(out_dir: str) -> Dataset:
    """Read back a finished run's survivor corpus."""
    return _read_parts(out_dir, "part-")


def read_kept(out_dir: str, *, columns: list[str] | None = None) -> Dataset:
    """Read back phase-1 kept rows (annotated, pre-dedup)."""
    files = [
        os.path.join(out_dir, n)
        for n in sorted(os.listdir(out_dir))
        if n.startswith("kept-") and n.endswith(".parquet")
    ]
    if not files:
        return ray.data.from_items([])
    return ray.data.read_parquet(files, columns=columns)


def read_jsonl(path: str) -> Dataset:
    """S5: JSONL reader (golden fixtures / sidecar metadata)."""
    return ray.data.read_json(path)


def read_csv(path: str, **kwargs) -> Dataset:
    """S5b: CSV reader (interchange format; schema inferred — chain
    ``cast_schema`` for a declared schema)."""
    return ray.data.read_csv(path, **kwargs)


def cast_schema(ds: Dataset, schema: pa.Schema) -> Dataset:
    """M8: explicit cast to a declared schema (fail-fast on impossible
    casts; column order follows the target schema)."""

    def _cast(batch: pa.Table) -> pa.Table:
        return batch.select(schema.names).cast(schema)

    return ds.map_batches(_cast, batch_format="pyarrow")


def read_text(path: str, **kwargs) -> Dataset:
    """S5c: plain-text reader — one row per line, column ``text``
    (raw-corpus ingestion; chain parse/cast stages for structure)."""
    return ray.data.read_text(path, **kwargs)


def write_jsonl(ds: Dataset, out_dir: str, **kwargs) -> None:
    """JSONL sink (interchange exports — lineage samples, eval dumps).
    One file per block, same resumable-partition layout rules as the
    parquet writer: never one giant file."""
    ds.write_json(out_dir, **kwargs)


def read_partition_manifests(out_dir: str) -> "dict[int, dict]":
    """_lineage/part-*.json manifests keyed by part_id (finished
    partitions of any resumable partitioned write)."""
    out: dict[int, dict] = {}
    lin = os.path.join(out_dir, "_lineage")
    for name in sorted(os.listdir(lin)) if os.path.isdir(lin) else []:
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(lin, name)) as f:
                m = json.load(f)
            out[int(m["part_id"])] = m
    return out


def write_partitioned_resumable(
    ds: Dataset,
    out_dir: str,
    *,
    id_col: str,
    partitions: int,
    params: dict,
    resume: bool = False,
    transform=None,
) -> int:
    """Deterministic id-hash-partitioned parquet write with per-partition
    lineage manifests and kill-resume — the dedup job's two-phase
    survivor write (jobs/dedup_job.py) made generic for any job whose
    output is corpus-sized (e.g. decontaminate --drop at 10^12 docs).

    Rows are bucketed by ``fnv1a64(id) % partitions``; on ``resume``,
    rows of finished partitions are dropped BEFORE ``transform`` (the
    expensive per-row stage — a probe, a scorer) and before the write
    shuffle, so a resumed run pays only the unfinished partitions'
    compute.  Each partition file is written atomically (tmp +
    os.replace) inside its groupby task, rows sorted by ``id_col``, so
    a resumed run's partitions are byte-equal to the single-shot run's.
    ``params`` (the job's arguments) is embedded in every manifest and
    validated on resume — resuming with different arguments fails loudly
    instead of mixing incompatible partitions.

    Returns the total kept rows across all partitions (manifest sum).
    Requires non-null ``id_col`` values (string or int)."""
    from .hashutil import partition_ids

    P = int(partitions)
    if P <= 0:
        raise ValueError(f"partitions must be positive, got {partitions}")
    if has_parquet_files(out_dir) and not resume:
        raise ValueError(
            f"{out_dir!r} already contains run artifacts; pass resume=True "
            "to continue a killed run of the SAME arguments, or use a "
            "clean directory")
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)

    full_params = {**params, "partitions": P, "id_col": id_col}
    done = read_partition_manifests(out_dir) if resume else {}
    for m in done.values():
        prev = {k: m.get(k) for k in full_params}
        if prev != full_params:
            raise ValueError(
                f"resume mismatch: partition {m['part_id']} was written "
                f"with {prev} but this run has {full_params}")

    def add_part(b: pa.Table) -> pa.Table:
        # one shared partition function (vectorized + consistent scalar
        # fallback) for every resumable writer — hashutil.partition_ids
        return b.append_column("__part", partition_ids(b.column(id_col), P))

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    if done:
        done_arr = pa.array(sorted(done), type=pa.int64())

        def skip_done(b: pa.Table) -> pa.Table:
            return b.filter(pc.invert(
                pc.is_in(b.column("__part"), value_set=done_arr)))

        ds = ds.map_batches(skip_done, batch_format="pyarrow")
    if transform is not None:
        ds = transform(ds)

    def write_part(group: pa.Table) -> pa.Table:
        pid = int(group.column("__part")[0].as_py())
        g = group.drop_columns(["__part"])
        g = g.take(pc.sort_indices(g, sort_keys=[(id_col, "ascending")]))
        fname = f"part-{pid:05d}.parquet"
        _atomic_write_table(g, os.path.join(out_dir, fname))
        _atomic_write_json(
            {"part_id": pid, "kept_rows": g.num_rows, "output_file": fname,
             **full_params},
            _manifest_path(out_dir, pid))
        return pa.table({"part_id": pa.array([pid], type=pa.int64())})

    # the one payload-moving all-to-all; partition files are written
    # atomically inside the groupby tasks themselves
    try:
        ds.groupby("__part").map_groups(
            write_part, batch_format="pyarrow").count()
    except Exception as e:
        # Ray 2.49: a chain FILTERED to 0 rows loses its schema and the
        # groupby raises a column/schema error — legal only when no rows
        # remained (e.g. resume with every unfinished partition fully
        # dropped).  Any OTHER failure (disk full, permissions, a
        # transform bug) must surface immediately; only the
        # column-not-found shape pays the (pipeline-re-executing) count
        # probe that confirms the zero-row case.
        msg = str(e).lower()
        if not any(tok in msg for tok in ("__part", "schema", "column",
                                          "empty")):
            raise
        if ds.count() != 0:
            raise

    # A partition whose rows were ALL dropped (by the transform, or
    # absent from the input entirely) forms no group and writes no
    # manifest.  The write above completed, so every assigned partition
    # IS finished — mark the absent ones with zero-row manifests so a
    # resume of a completed run skips them instead of re-paying their
    # probe every time.
    present = read_partition_manifests(out_dir)
    for pid in range(P):
        if pid not in present:
            _atomic_write_json(
                {"part_id": pid, "kept_rows": 0, "output_file": None,
                 **full_params},
                _manifest_path(out_dir, pid))

    return sum(m["kept_rows"] for m in read_partition_manifests(
        out_dir).values())
