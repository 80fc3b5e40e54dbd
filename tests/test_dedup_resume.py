"""Round-4 verdict item #1: `dg dedup` kill-and-resume equivalence for
exact and minhash modes, plus the vectorized hash kernels they ride on
(hashutil.py).  The contract under test: a run killed after k
partitions, resumed with --resume and the same arguments, produces
output row-equal (and per-partition byte-equal) to the single-shot run.
"""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _corpus(n=120, dup_every=3, string_ids=False):
    def base(k):
        return f"the quick brown fox jumps over the lazy dog {k} " * 8

    rows = []
    for i in range(n):
        text = base(i // dup_every) if i % dup_every else base(i)
        rows.append({
            "doc_id": f"u-{i:04d}" if string_ids else i,
            "text": text,
            "payload": f"p{i}",
        })
    return pa.Table.from_pylist(rows)


def _sim_corpus(n=120, dup_every=3):
    """SimHash-meaningful corpus: _corpus's texts differ only by one
    number token, so they collapse into a single Hamming-3 component —
    here each base doc is a distinct random-word topic (pairwise far
    apart) and dups are exact text copies (hamming 0)."""
    import random

    rnd = random.Random(9)
    vocab = [f"word{j:04d}" for j in range(4000)]
    bases = {}

    def base(k):
        if k not in bases:
            bases[k] = " ".join(rnd.choices(vocab, k=60))
        return bases[k]

    rows = []
    for i in range(n):
        text = base(i // dup_every) if i % dup_every else base(i)
        rows.append({"doc_id": f"u-{i:04d}", "text": text,
                     "payload": f"p{i}"})
    return pa.Table.from_pylist(rows)


def _survivors(out_dir):
    import ray.data

    rows = ray.data.read_parquet(out_dir).take_all()
    return sorted((r["doc_id"], r["text"], r["payload"]) for r in rows)


def _kill_partitions(out_dir, fraction=0.5, drop_state=False):
    """Simulate a crash: delete a deterministic half of the finished
    partitions' files + manifests (optionally the discovery checkpoint
    too), as if the job died before writing them."""
    parts = sorted(f for f in os.listdir(out_dir)
                   if f.startswith("part-") and f.endswith(".parquet"))
    assert len(parts) >= 4, "need several partitions to make the test real"
    killed = parts[:max(2, int(len(parts) * fraction))]
    for f in killed:
        pid = f[len("part-"):-len(".parquet")]
        os.remove(os.path.join(out_dir, f))
        os.remove(os.path.join(out_dir, "_lineage", f"part-{pid}.json"))
    shutil.rmtree(os.path.join(out_dir, "_dedup_manifest"),
                  ignore_errors=True)  # final step also redone on resume
    if drop_state:
        shutil.rmtree(os.path.join(out_dir, "_dedup_state"))
    return len(killed)


@pytest.mark.parametrize("mode,string_ids,drop_state", [
    ("exact", False, False),
    ("exact", False, True),   # checkpoint lost → discovery recomputed
    ("minhash", True, False),  # string ids → vectorized __nid path
    ("simhash", True, False),
])
def test_dedup_job_kill_and_resume(tmp_path, ray_session, mode, string_ids,
                                   drop_state):
    from jobs.dedup_job import run_dedup_job

    t = _sim_corpus() if mode == "simhash" else _corpus(
        string_ids=string_ids)
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))

    kw = dict(mode=mode, threshold=0.5, partitions=8)
    out_s = str(tmp_path / "single")
    res_s = run_dedup_job(str(src), out_s, **kw)
    assert res_s["kept_rows"] < res_s["input_rows"]  # dups really dropped
    single = _survivors(out_s)

    out_k = str(tmp_path / "killed")
    run_dedup_job(str(src), out_k, **kw)
    n_killed = _kill_partitions(out_k, drop_state=drop_state)
    assert n_killed >= 2

    res_r = run_dedup_job(str(src), out_k, resume=True, **kw)
    assert res_r["kept_rows"] == res_s["kept_rows"]
    assert _survivors(out_k) == single

    # per-partition determinism: every file byte-equal to single-shot
    for f in sorted(os.listdir(out_s)):
        if f.startswith("part-") and f.endswith(".parquet"):
            with open(os.path.join(out_s, f), "rb") as a, \
                    open(os.path.join(out_k, f), "rb") as b:
                assert a.read() == b.read(), f

    # the cross-run manifest was rebuilt: chaining --against still works
    assert os.path.isdir(os.path.join(out_k, "_dedup_manifest", mode))


@pytest.mark.parametrize("mode", ["embedding", "semdedup"])
def test_vector_dedup_job_kill_and_resume(tmp_path, ray_session, mode):
    """Round 5: the two-phase checkpoint layout covers the vector modes
    too — kill half the partitions (+ the cross-run manifest), resume,
    and every partition file is byte-equal to the single-shot run."""
    from jobs.dedup_job import run_dedup_job

    rng = np.random.default_rng(5)
    base = rng.normal(size=(48, 8))
    vecs = []
    for i in range(60):
        v = (base[i % 48] + 0.0004 * rng.normal(size=8)
             if i >= 48 else base[i])
        vecs.append([float(x) for x in v])
    t = pa.table({
        "doc_id": pa.array([f"v-{i:04d}" for i in range(60)]),  # __nid path
        "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
        "payload": pa.array([f"p{i}" for i in range(60)]),
    })
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))

    kw = dict(mode=mode, threshold=0.98, partitions=8)
    if mode == "semdedup":
        kw["n_clusters"] = 4

    out_s = str(tmp_path / "single")
    res_s = run_dedup_job(str(src), out_s, **kw)
    assert res_s["kept_rows"] < res_s["input_rows"]  # dups really dropped
    assert "phase_walls" in res_s  # took the resumable path

    out_k = str(tmp_path / "killed")
    run_dedup_job(str(src), out_k, **kw)
    assert _kill_partitions(out_k) >= 2
    res_r = run_dedup_job(str(src), out_k, resume=True, **kw)
    assert res_r["kept_rows"] == res_s["kept_rows"]
    for f in sorted(os.listdir(out_s)):
        if f.startswith("part-") and f.endswith(".parquet"):
            with open(os.path.join(out_s, f), "rb") as a, \
                    open(os.path.join(out_k, f), "rb") as b:
                assert a.read() == b.read(), f

    # the cross-run manifest was rebuilt on resume: chaining works
    assert os.path.isdir(os.path.join(out_k, "_dedup_manifest", mode))
    if mode == "semdedup":
        assert os.path.isfile(os.path.join(
            out_k, "_dedup_manifest", "semdedup_centroids",
            "centroids.parquet"))
        # centroids are checkpointed beside the loser state (resume
        # skips the retrain), and a resume with a different cluster
        # count fails loudly instead of reusing stale losers
        assert os.path.isfile(os.path.join(
            out_k, "_dedup_state", "sem_centroids.parquet"))
        with pytest.raises(ValueError, match="resume mismatch"):
            run_dedup_job(str(src), out_k, resume=True, mode="semdedup",
                          threshold=0.98, partitions=8, n_clusters=5)
    src2 = tmp_path / "in2"  # fresh ids, near-dup vectors of the bases
    src2.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([f"w-{i:04d}" for i in range(48)]),
        "embedding": pa.array(
            [[float(x) for x in base[i] + 0.0004 * rng.normal(size=8)]
             for i in range(48)], type=pa.list_(pa.float64())),
        "payload": pa.array([f"q{i}" for i in range(48)]),
    }), str(src2 / "p.parquet"))
    out_chain = str(tmp_path / "chain")
    res_c = run_dedup_job(str(src2), out_chain, against=out_k, **kw)
    assert res_c["kept_rows"] == 0  # every doc duplicates the prior run


@pytest.mark.parametrize("mode", ["span", "substring"])
def test_span_dedup_job_kill_and_resume(tmp_path, ray_session, mode):
    """Round 5: the span family rides the two-phase layout too — the
    loser (id, start) discovery is checkpointed, surgery+write skips
    finished partitions, and the resumed output is byte-equal to the
    single-shot run."""
    import ray.data

    from jobs.dedup_job import run_dedup_job

    sents = [f"Sentence number {i} about topic {i % 7} hereby ends. "
             for i in range(40)]
    rows = []
    for i in range(60):
        # every 4th doc repeats doc (i-4)'s middle — duplicated spans
        body = "".join(sents[(i * 3 + j) % 40] for j in range(12))
        if i % 4 == 0 and i:
            body += "".join(sents[((i - 4) * 3 + j) % 40] for j in range(6))
        rows.append({"doc_id": f"u-{i:04d}", "text": body})
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(src / "p.parquet"))

    kw = dict(mode=mode, partitions=8)
    if mode == "substring":
        kw["window"] = 10

    out_s = str(tmp_path / "single")
    res_s = run_dedup_job(str(src), out_s, **kw)
    assert res_s["kept_rows"] == 60            # span modes keep every doc
    assert res_s["spans_removed"] > 0          # surgery really happened
    assert "phase_walls" in res_s              # took the resumable path

    out_k = str(tmp_path / "killed")
    run_dedup_job(str(src), out_k, **kw)
    assert _kill_partitions(out_k) >= 2
    res_r = run_dedup_job(str(src), out_k, resume=True, **kw)
    assert res_r["spans_removed"] == res_s["spans_removed"]
    for f in sorted(os.listdir(out_s)):
        if f.startswith("part-") and f.endswith(".parquet"):
            with open(os.path.join(out_s, f), "rb") as a, \
                    open(os.path.join(out_k, f), "rb") as b:
                assert a.read() == b.read(), f

    # window geometry is pinned in the checkpoint for substring
    if mode == "substring":
        with pytest.raises(ValueError, match="resume mismatch"):
            run_dedup_job(str(src), out_k, mode="substring", window=25,
                          partitions=8, resume=True)

    # the library single-shot path (null-id fallback equivalent) gives
    # the same texts: resumable ≡ library
    from dataguards_ray.spandedup import span_dedup, substring_dedup

    lib = (span_dedup(ray.data.read_parquet(str(src)))
           if mode == "span" else
           substring_dedup(ray.data.read_parquet(str(src)), window=10))
    lib_rows = {r["doc_id"]: r["text"] for r in lib.take_all()}
    got_rows = {r["doc_id"]: r["text"]
                for r in ray.data.read_parquet(out_s).take_all()}
    assert got_rows == lib_rows

    # incremental × resume: kill-and-resume an --against run too
    src_b = tmp_path / "in_b"
    src_b.mkdir()
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": f"w-{i:04d}",
          "text": rows[i]["text"] + " Fresh trailing sentence here. "}
         for i in range(20)]), str(src_b / "p.parquet"))
    kw_b = dict(against=out_s, **kw)
    out_bs = str(tmp_path / "b_single")
    res_bs = run_dedup_job(str(src_b), out_bs, **kw_b)
    assert res_bs["spans_removed"] > 0  # prior spans really lose
    out_bk = str(tmp_path / "b_killed")
    run_dedup_job(str(src_b), out_bk, **kw_b)
    _kill_partitions(out_bk)
    res_br = run_dedup_job(str(src_b), out_bk, resume=True, **kw_b)
    assert res_br["spans_removed"] == res_bs["spans_removed"]
    for f in sorted(os.listdir(out_bs)):
        if f.startswith("part-") and f.endswith(".parquet"):
            with open(os.path.join(out_bs, f), "rb") as a, \
                    open(os.path.join(out_bk, f), "rb") as b:
                assert a.read() == b.read(), f


def test_dedup_fully_dropped_partitions_marked_done(tmp_path, ray_session):
    """A partition whose rows were ALL dedup losers writes a zero-row
    manifest (output_file None), so a completed run's resume skips it
    (the io.py ADVICE-r04 fix applied to the dedup layout)."""
    from jobs.dedup_job import _read_part_manifests, run_dedup_job

    # one shared text → one survivor; rows scatter over 8 partitions
    t = pa.table({
        "doc_id": pa.array([f"u-{i:04d}" for i in range(64)]),
        "text": pa.array(["identical body of text " * 8] * 64),
    })
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    out = str(tmp_path / "out")
    res = run_dedup_job(str(src), out, mode="exact", partitions=8)
    assert res["kept_rows"] == 1

    done = _read_part_manifests(out)
    assert sorted(done) == list(range(8))  # ALL partitions marked done
    empties = [m for m in done.values() if m["output_file"] is None]
    assert len(empties) == 7 and all(m["kept_rows"] == 0 for m in empties)

    import ray.data

    res2 = run_dedup_job(str(src), out, mode="exact", partitions=8,
                         resume=True)
    assert res2["kept_rows"] == 1
    assert ray.data.read_parquet(out).count() == 1  # still readable


def test_dedup_resume_rejects_mismatched_args(tmp_path, ray_session):
    from jobs.dedup_job import run_dedup_job

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(_corpus(n=40), str(src / "p.parquet"))
    out = str(tmp_path / "out")
    run_dedup_job(str(src), out, mode="exact", partitions=8)
    with pytest.raises(ValueError, match="resume mismatch"):
        run_dedup_job(str(src), out, mode="exact", partitions=16, resume=True)
    # rerun WITHOUT --resume on a populated dir still fails loudly
    with pytest.raises(ValueError, match="clean directory"):
        run_dedup_job(str(src), out, mode="exact", partitions=8)


def test_dedup_resume_after_full_completion_is_noop(tmp_path, ray_session):
    from jobs.dedup_job import run_dedup_job

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(_corpus(n=60), str(src / "p.parquet"))
    out = str(tmp_path / "out")
    res1 = run_dedup_job(str(src), out, mode="exact", partitions=8)
    before = _survivors(out)
    res2 = run_dedup_job(str(src), out, mode="exact", partitions=8,
                         resume=True)
    assert res2["kept_rows"] == res1["kept_rows"]
    assert _survivors(out) == before


def test_fnv1a64_array_parity():
    """hashutil vectorized FNV-1a == the frozen scalar, incl. slices,
    large_string, binary, unicode, empty and null slots."""
    import random

    from dataguards_ray.hashutil import fnv1a64_array, nid64_array
    from dataguards_ray.spec import fnv1a64

    random.seed(7)
    vals = ["", "a", "hello world", "x" * 300, "héllo→ünicode", None] + [
        "".join(chr(random.randint(32, 0x2FFF))
                for _ in range(random.randint(0, 80)))
        for _ in range(200)
    ]
    exp = np.array([fnv1a64((v or "").encode()) for v in vals],
                   dtype=np.uint64)
    for typ in (pa.string(), pa.large_string()):
        arr = pa.array(vals, type=typ)
        assert (fnv1a64_array(arr) == exp).all()
        assert (fnv1a64_array(arr.slice(3, 100)) == exp[3:103]).all()
    ba = pa.array([b"", b"abc", bytes(range(256))], type=pa.binary())
    expb = np.array([fnv1a64(b""), fnv1a64(b"abc"),
                     fnv1a64(bytes(range(256)))], dtype=np.uint64)
    assert (fnv1a64_array(ba) == expb).all()

    # nid64: bit-identical to the scalar expression the round-3
    # _dedup_manifest rows froze, for string AND int ids
    sids = pa.array([f"doc-{i}" for i in range(50)])
    exp_n = np.array([fnv1a64(f"v:{v}".encode()) - (1 << 63)
                      for v in sids.to_pylist()], dtype=np.int64)
    assert (nid64_array(sids) == exp_n).all()
    iids = pa.array(list(range(-5, 45)), type=pa.int64())
    exp_i = np.array([fnv1a64(f"v:{v}".encode()) - (1 << 63)
                      for v in iids.to_pylist()], dtype=np.int64)
    assert (nid64_array(iids) == exp_i).all()


@pytest.mark.parametrize("drop", [True, False])
def test_decontaminate_job_kill_and_resume(tmp_path, ray_session, drop):
    """Corpus-sized decontaminate output rides the generic
    io.write_partitioned_resumable: killed-after-k-partitions + --resume
    is row- and byte-equal to single-shot, for drop and flag modes."""
    from jobs.sample_job import run_decontaminate_job

    t = _corpus(n=120)
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    # benchmark shares the repeated phrase of every 4th base text, so a
    # deterministic subset of docs is contaminated (13-gram overlap)
    bench = pa.Table.from_pylist(
        [{"text": t.column("text")[i].as_py()} for i in range(0, 120, 4)])
    bpath = tmp_path / "bench.parquet"
    pq.write_table(bench, str(bpath))

    kw = dict(ngram=13, drop=drop, partitions=8)
    out_s = str(tmp_path / "single")
    res_s = run_decontaminate_job(str(src), out_s, str(bpath), **kw)
    if drop:
        assert 0 < res_s["output_rows"] < 120  # some really dropped
    else:
        assert res_s["output_rows"] == 120  # flag mode keeps all rows

    out_k = str(tmp_path / "killed")
    run_decontaminate_job(str(src), out_k, str(bpath), **kw)
    assert _kill_partitions(out_k) >= 2

    res_r = run_decontaminate_job(str(src), out_k, str(bpath), resume=True,
                                  **kw)
    assert res_r["output_rows"] == res_s["output_rows"]
    for f in sorted(os.listdir(out_s)):
        if f.startswith("part-") and f.endswith(".parquet"):
            with open(os.path.join(out_s, f), "rb") as a, \
                    open(os.path.join(out_k, f), "rb") as b:
                assert a.read() == b.read(), f

    # resume with different arguments fails loudly
    with pytest.raises(ValueError, match="resume mismatch"):
        run_decontaminate_job(str(src), out_k, str(bpath), ngram=8,
                              drop=drop, partitions=8, resume=True)
    # rerun WITHOUT resume on a populated dir fails loudly
    with pytest.raises(ValueError, match="clean directory"):
        run_decontaminate_job(str(src), out_k, str(bpath), **kw)


def test_decontaminate_resume_rejects_changed_benchmark(tmp_path,
                                                        ray_session):
    """Resuming against a DIFFERENT benchmark must fail loudly — mixed
    partitions would have been probed against different n-gram sets."""
    from jobs.sample_job import run_decontaminate_job

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(_corpus(n=40), str(src / "p.parquet"))
    b1, b2 = tmp_path / "b1.parquet", tmp_path / "b2.parquet"
    pq.write_table(pa.table({"text": ["the quick brown fox " * 5]}), str(b1))
    pq.write_table(pa.table({"text": ["a different eval set " * 5]}), str(b2))

    out = str(tmp_path / "out")
    run_decontaminate_job(str(src), out, str(b1), drop=True, partitions=4)
    _kill_partitions(out, fraction=0.5)
    with pytest.raises(ValueError, match="resume mismatch"):
        run_decontaminate_job(str(src), out, str(b2), drop=True,
                              partitions=4, resume=True)


def test_decontaminate_resume_rejects_changed_input(tmp_path, ray_session):
    """Resuming against a DIFFERENT input corpus must fail loudly —
    finished partitions from the old corpus would silently mix with
    new-corpus partitions (ADVICE r04: input identity was unvalidated)."""
    from jobs.sample_job import run_decontaminate_job

    src1 = tmp_path / "in1"
    src1.mkdir()
    pq.write_table(_corpus(n=40), str(src1 / "p.parquet"))
    src2 = tmp_path / "in2"
    src2.mkdir()
    pq.write_table(_corpus(n=60), str(src2 / "p.parquet"))
    bpath = tmp_path / "b.parquet"
    pq.write_table(pa.table({"text": ["the quick brown fox " * 5]}),
                   str(bpath))

    out = str(tmp_path / "out")
    run_decontaminate_job(str(src1), out, str(bpath), drop=True,
                          partitions=4)
    _kill_partitions(out, fraction=0.5)
    with pytest.raises(ValueError, match="resume mismatch"):
        run_decontaminate_job(str(src2), out, str(bpath), drop=True,
                              partitions=4, resume=True)


def test_add_part_hash_paths_agree():
    """The partitioned writer's vectorized and scalar partition
    functions must implement the SAME mapping for every P, including
    non-powers-of-two (ADVICE r04: they used to disagree for P=7/100)."""
    from dataguards_ray.hashutil import nid64_array
    from dataguards_ray.spec import fnv1a64

    from dataguards_ray.hashutil import partition_ids

    ids = pa.array([f"doc-{i}" for i in range(300)])
    vals = ids.to_pylist()
    for P in (7, 100, 64, 1000):
        vec = (nid64_array(ids).view(np.uint64)
               % np.uint64(P)).astype(np.int64)
        scal = np.array(
            [(fnv1a64(f"v:{v}".encode()) - (1 << 63)) % (1 << 64) % P
             for v in vals], dtype=np.int64)
        assert (vec == scal).all(), P
        # the SHARED kernel both writers now call (io.py + dedup job)
        assert partition_ids(ids, P).to_numpy().tolist() == scal.tolist()

    # exotic id type → the kernel's scalar fallback must implement the
    # SAME mapping (this is the path that drifted in the dedup job)
    exotic = pa.array([float(i) + 0.5 for i in range(50)])
    with pytest.raises(TypeError):
        nid64_array(exotic)
    for P in (7, 100):
        got = partition_ids(exotic, P).to_pylist()
        exp = [(fnv1a64(f"v:{v}".encode()) - (1 << 63)) % (1 << 64) % P
               for v in exotic.to_pylist()]
        assert got == exp, P


def test_fully_dropped_partitions_marked_done(tmp_path, ray_session):
    """A partition whose rows are ALL dropped by the transform writes a
    zero-row manifest, so resuming a COMPLETED drop-heavy run skips it
    instead of re-paying its probe (ADVICE r04)."""
    import ray.data

    from dataguards_ray.io import (read_partition_manifests,
                                   write_partitioned_resumable)

    t = _corpus(n=40)
    P = 8
    params = {"op": "t"}

    def drop_all(d):
        import pyarrow.compute as pc

        return d.map_batches(
            lambda b: b.filter(pc.equal(b.column("doc_id"), -1)),
            batch_format="pyarrow")

    out = str(tmp_path / "out")
    kept = write_partitioned_resumable(
        ray.data.from_arrow(t), out, id_col="doc_id", partitions=P,
        params=params, transform=drop_all)
    assert kept == 0
    mans = read_partition_manifests(out)
    assert sorted(mans) == list(range(P))  # every pid marked done
    assert all(m["kept_rows"] == 0 for m in mans.values())

    # resume of the completed run: a no-op that still returns 0
    kept2 = write_partitioned_resumable(
        ray.data.from_arrow(t), out, id_col="doc_id", partitions=P,
        params=params, resume=True, transform=drop_all)
    assert kept2 == 0


def test_partitioned_write_propagates_transform_errors(tmp_path,
                                                       ray_session):
    """A failing transform (disk full, a bug) must surface — the
    zero-row schema-loss catch is narrowed to column/schema errors
    (ADVICE r04: the bare except swallowed everything at count 0)."""
    import ray.data

    from dataguards_ray.io import write_partitioned_resumable

    def boom(d):
        def f(b):
            raise OSError("disk exploded")

        return d.map_batches(f, batch_format="pyarrow")

    with pytest.raises(Exception, match="disk exploded"):
        write_partitioned_resumable(
            ray.data.from_arrow(_corpus(n=20)), str(tmp_path / "out"),
            id_col="doc_id", partitions=4, params={"op": "t"},
            transform=boom)


def test_sample_job_kill_and_resume(tmp_path, ray_session, monkeypatch):
    """Round-5 (VERDICT item #7): `dg sample` rides the resumable
    partitioned writer for every mode; kill-and-resume is byte-equal to
    single-shot (budget mode — membership is a global corpus function,
    recomputed deterministically on resume)."""
    import subprocess
    import sys as _sys

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(_corpus(n=120), str(src / "p.parquet"))

    def run(out, *extra):
        cmd = [_sys.executable, "jobs/sample_job.py", str(src), str(out),
               "--mode", "budget", "--budget", "2000",
               "--partitions", "8", "--num-cpus", "4", *extra]
        r = subprocess.run(cmd, capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        import json as _json

        return _json.loads(r.stdout.strip().splitlines()[-1])

    out_s = tmp_path / "single"
    res_s = run(out_s)
    assert 0 < res_s["output_rows"] < 120

    out_k = tmp_path / "killed"
    run(out_k)
    killed = _kill_partitions(str(out_k), fraction=0.5)
    assert killed >= 2
    res_r = run(out_k, "--resume")
    assert res_r["output_rows"] == res_s["output_rows"]
    for f in sorted(os.listdir(out_s)):
        if f.startswith("part-") and f.endswith(".parquet"):
            with open(os.path.join(out_s, f), "rb") as a, \
                    open(os.path.join(out_k, f), "rb") as b:
                assert a.read() == b.read(), f
    # different arguments on resume fail loudly
    r = subprocess.run(
        [_sys.executable, "jobs/sample_job.py", str(src), str(out_k),
         "--mode", "budget", "--budget", "3000", "--partitions", "8",
         "--num-cpus", "4", "--resume"],
        capture_output=True, text=True)
    assert r.returncode != 0 and "resume mismatch" in r.stderr


def test_check_job_kill_and_resume(tmp_path, ray_session):
    """Round-5: `dg check --out` rides the resumable partitioned
    writer; kill-and-resume byte-equal, changed rules rejected."""
    from jobs.check_job import run_check_job

    pq.write_table(_corpus(n=120), str(tmp_path / "in.parquet"))
    rules = {"rules": [{"type": "regex", "name": "t.fox", "col": "text",
                        "pattern": "fox"}]}

    out_s = str(tmp_path / "single")
    res_s = run_check_job(str(tmp_path / "in.parquet"), rules,
                          out_dir=out_s, partitions=8)
    assert res_s["rows"] == 120

    out_k = str(tmp_path / "killed")
    run_check_job(str(tmp_path / "in.parquet"), rules, out_dir=out_k,
                  partitions=8)
    assert _kill_partitions(out_k, fraction=0.5) >= 2
    res_r = run_check_job(str(tmp_path / "in.parquet"), rules,
                          out_dir=out_k, partitions=8, resume=True)
    assert res_r == res_s
    for f in sorted(os.listdir(out_s)):
        if f.startswith("part-") and f.endswith(".parquet"):
            with open(os.path.join(out_s, f), "rb") as a, \
                    open(os.path.join(out_k, f), "rb") as b:
                assert a.read() == b.read(), f

    # changed rule config on resume fails loudly (content identity is
    # part of the manifest params)
    rules2 = {"rules": [{"type": "regex", "name": "t.fox", "col": "text",
                         "pattern": "dog"}]}
    os.remove(os.path.join(out_k, sorted(
        f for f in os.listdir(out_k) if f.endswith(".parquet"))[0]))
    with pytest.raises(ValueError, match="resume mismatch"):
        run_check_job(str(tmp_path / "in.parquet"), rules2, out_dir=out_k,
                      partitions=8, resume=True)
    # rerun WITHOUT resume on a populated dir fails loudly too
    with pytest.raises(ValueError, match="clean directory"):
        run_check_job(str(tmp_path / "in.parquet"), rules, out_dir=out_k,
                      partitions=8)


def test_check_job_violations_only_clean_data(tmp_path, ray_session):
    """Clean data + --violations-only through the partitioned writer:
    every row drops, zero-row manifests mark all partitions done, the
    summary reports zero, and a resume converges as a no-op."""
    from dataguards_ray.io import read_partition_manifests
    from jobs.check_job import run_check_job

    pq.write_table(pa.table({"doc_id": list(range(20)), "x": [5] * 20}),
                   str(tmp_path / "in.parquet"))
    rules = {"rules": [{"type": "range", "name": "x.range", "col": "x",
                        "lo": 0, "hi": 10}]}
    out = str(tmp_path / "out")
    res = run_check_job(str(tmp_path / "in.parquet"), rules, out_dir=out,
                        violations_only=True, partitions=4)
    assert res == {"rows": 20, "violations": 0, "rule_drops": {}}
    mans = read_partition_manifests(out)
    assert sorted(mans) == [0, 1, 2, 3]
    assert all(m["kept_rows"] == 0 for m in mans.values())
    res2 = run_check_job(str(tmp_path / "in.parquet"), rules, out_dir=out,
                         violations_only=True, partitions=4, resume=True)
    assert res2 == res


def test_sample_job_column_preflight(tmp_path, ray_session):
    """Missing columns fail up front with the flag to fix (argparse
    error naming the column + available columns), never a KeyError
    inside a Ray task (found probing `dg sample --mode mixture` on the
    pages corpus, which has no `source` column)."""
    import subprocess
    import sys as _sys

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(_corpus(n=10), str(src / "p.parquet"))
    side = tmp_path / "side.parquet"
    pq.write_table(pa.table({"other": ["x"]}), str(side))

    cases = [
        (["--mode", "mixture", "--weights", "a=1"],
         "--source-col 'source' not in input columns"),
        (["--mode", "stratified", "--key", "nosuch"],
         "--key 'nosuch' not in input columns"),
        (["--mode", "hash", "--text-col", "nosuch"],
         "--text-col 'nosuch' not in input columns"),
        (["--mode", "dsir", "--target", str(side), "--k", "2"],
         "--text-col 'text' not in --target columns"),
    ]
    for extra, msg in cases:
        r = subprocess.run(
            [_sys.executable, "jobs/sample_job.py", str(src),
             str(tmp_path / "out"), "--num-cpus", "4", *extra],
            capture_output=True, text=True)
        assert r.returncode != 0, extra
        assert msg in r.stderr, (extra, r.stderr[-800:])
        assert "RayTaskError" not in r.stderr, extra


def test_dedup_job_column_preflight(tmp_path, ray_session):
    """`dg dedup` validates its column flags against the input schema
    up front — embedding mode on a corpus with no vector column used to
    die with a KeyError from inside a Ray task."""
    from jobs.dedup_job import run_dedup_job

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(_corpus(n=10), str(src / "p.parquet"))

    with pytest.raises(ValueError, match="--vec-col 'embedding' not in"):
        run_dedup_job(str(src), str(tmp_path / "o1"), mode="embedding")
    with pytest.raises(ValueError, match="--text-col 'nosuch' not in"):
        run_dedup_job(str(src), str(tmp_path / "o2"), mode="exact",
                      text_col="nosuch")
    with pytest.raises(ValueError, match="--id-col 'missing' not in"):
        run_dedup_job(str(src), str(tmp_path / "o3"), mode="span",
                      id_col="missing")


def test_stats_on_partitioned_writer_output(tmp_path, ray_session):
    """`dg stats` degrades gracefully on a dedup/sample-style output:
    generic partitioned-writer manifests carry no input_rows /
    rule_counts, so stats reports row totals + the recorded op (and
    skips domains for url-less tables) instead of KeyError."""
    import ray.data

    from dataguards_ray.io import write_partitioned_resumable
    from jobs.stats_job import domain_stats, lineage_stats

    out = str(tmp_path / "out")
    n = write_partitioned_resumable(
        ray.data.from_arrow(_corpus(n=30)), out,
        id_col="doc_id", partitions=4,
        params={"op": "sample", "spec": "hash(frac=1.0)"})
    assert n == 30

    rep = lineage_stats(out)
    assert rep["input_rows"] is None
    assert rep["kept_rows"] == 30
    assert rep["ops"] == ["hash(frac=1.0)", "sample"]
    assert domain_stats(out) == []  # _corpus has no url column


def test_stats_on_manifestless_survivor_output(tmp_path):
    """Embedding/semdedup dedup modes write plain survivor parquet with
    NO lineage manifests: stats reports the row total from the parquet
    footers (input unknown → None) instead of claiming 0 kept rows;
    manifest parquet in subdirs is not counted as survivors."""
    import pyarrow.parquet as pq

    from jobs.stats_job import lineage_stats

    out = tmp_path / "out"
    (out / "_dedup_manifest" / "semdedup").mkdir(parents=True)
    pq.write_table(pa.table({"doc_id": pa.array([1, 2, 3])}),
                   str(out / "a.parquet"))
    pq.write_table(pa.table({"doc_id": pa.array([4])}),
                   str(out / "b.parquet"))
    pq.write_table(pa.table({"doc_id": pa.array([9, 9])}),
                   str(out / "_dedup_manifest" / "semdedup" / "m.parquet"))

    rep = lineage_stats(str(out))
    assert rep["input_rows"] is None
    assert rep["kept_rows"] == 4

    # truly empty finished run: still reports 0, not None
    empty = tmp_path / "empty"
    empty.mkdir()
    rep0 = lineage_stats(str(empty))
    assert rep0["input_rows"] == 0 and rep0["kept_rows"] == 0
