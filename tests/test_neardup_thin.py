"""Thin-payload (digest) MinHash discovery — parity vs the full-sig path.

The ``payload="digest"`` path ships a 16-byte blake2b digest of the
signature through the bucket groupby instead of the 1 KB signature
itself (~26x less exchange payload; module comment in neardup.py) and
defers similarity verification to one pruned rep-doc re-read.  Its
contract is ROW-IDENTITY with the full-sig path — these tests pin it
for the driver-merge tail, the forced distributed tail, tiny caps
(star + rep-edge-only branches), a pathological all-identical bucket,
and a no-duplicate corpus.
"""

from __future__ import annotations

import random

import pytest


def _cluster_corpus(seed: int = 7, n_clusters: int = 12, n_unique: int = 25):
    rng = random.Random(seed)
    base = "the quick brown fox jumps over the lazy dog "
    rows = []
    i = 0
    for c in range(n_clusters):
        body = base * (10 + c) + f" cluster {c} " + " ".join(
            f"w{rng.randrange(50)}" for _ in range(30))
        for k in range(rng.randrange(1, 6)):
            txt = body if k % 2 == 0 else body + f" tail{k}"
            rows.append({"doc_id": i, "text": txt})
            i += 1
    for d in range(n_unique):
        rows.append({"doc_id": i, "text": " ".join(
            f"unique{d}token{j}x{rng.randrange(10**6)}" for j in range(60))})
        i += 1
    rng.shuffle(rows)
    return rows


def _pairs(tbl):
    return list(zip(tbl.column("id_a").to_pylist(),
                    tbl.column("id_b").to_pylist(),
                    tbl.column("est_jaccard").to_pylist()))


@pytest.mark.usefixtures("ray_session")
def test_thin_payload_parity_driver_and_distributed():
    import ray.data

    from dataguards_ray.neardup import minhash_near_dup_pairs

    ds = ray.data.from_items(_cluster_corpus()).repartition(5)
    full = minhash_near_dup_pairs(ds, threshold=0.5)
    assert full.num_rows > 0
    thin = minhash_near_dup_pairs(ds, threshold=0.5, payload="digest")
    assert _pairs(full) == _pairs(thin)
    # max_driver_pairs=0 forces the join-based distributed tail
    thin_d = minhash_near_dup_pairs(
        ds, threshold=0.5, payload="digest", max_driver_pairs=0)
    assert _pairs(full) == _pairs(thin_d)


@pytest.mark.usefixtures("ray_session")
def test_thin_payload_parity_under_tiny_caps():
    """max_clique=2 / max_expand=3 / max_bucket=4 exercise the star,
    rep-edge-only, and bucket-truncation branches on both paths."""
    import ray.data

    from dataguards_ray.neardup import minhash_near_dup_pairs

    ds = ray.data.from_items(_cluster_corpus()).repartition(5)
    caps = dict(max_clique=2, max_expand=3, max_bucket=4)
    full = minhash_near_dup_pairs(ds, threshold=0.5, **caps)
    assert full.num_rows > 0
    thin = minhash_near_dup_pairs(
        ds, threshold=0.5, payload="digest", **caps)
    assert _pairs(full) == _pairs(thin)
    thin_d = minhash_near_dup_pairs(
        ds, threshold=0.5, payload="digest", max_driver_pairs=0, **caps)
    assert _pairs(full) == _pairs(thin_d)


@pytest.mark.usefixtures("ray_session")
def test_thin_payload_pathological_bucket_stays_linear():
    """All-identical docs share one digest: the thin path must emit the
    same O(n) star (from the band-0 bucket only), not a clique."""
    import ray.data

    from dataguards_ray.neardup import minhash_near_dup_pairs

    text = "boilerplate terms of service apply to every page " * 10
    ds = ray.data.from_items(
        [{"doc_id": i, "text": text} for i in range(2000)])
    pairs = minhash_near_dup_pairs(ds, threshold=0.8, payload="digest")
    assert pairs.num_rows == 1999
    assert pairs.column("id_a").to_pylist()[:3] == [0, 0, 0]
    assert set(pairs.column("est_jaccard").to_pylist()) == {1.0}


@pytest.mark.usefixtures("ray_session")
def test_thin_payload_no_dup_corpus_empty():
    import ray.data

    from dataguards_ray.neardup import minhash_near_dup_pairs

    rng = random.Random(3)
    ds = ray.data.from_items(
        [{"doc_id": j, "text": " ".join(
            f"solo{j}w{q}z{rng.randrange(10**6)}" for q in range(40))}
         for j in range(10)])
    assert minhash_near_dup_pairs(
        ds, threshold=0.5, payload="digest").num_rows == 0
    # short / empty texts (no shingles) are skipped, not crashed on
    ds2 = ray.data.from_items(
        [{"doc_id": 0, "text": ""}, {"doc_id": 1, "text": "ab"},
         {"doc_id": 2, "text": None}])
    assert minhash_near_dup_pairs(
        ds2, threshold=0.5, payload="digest").num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_dedup_job_digest_payload_parity(tmp_path):
    """dg dedup --payload digest: survivors row-equal to the default
    full-sig run (same corpus, both through the resumable job path);
    digest with a non-minhash mode is rejected loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from jobs.dedup_job import run_dedup_job

    rows = [{"doc_id": i, **r} for i, r in enumerate(
        {"text": r["text"]} for r in _cluster_corpus(seed=11))]
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(src / "p.parquet"))

    res_sig = run_dedup_job(str(src), str(tmp_path / "sig"),
                            mode="minhash", threshold=0.5)
    res_dig = run_dedup_job(str(src), str(tmp_path / "dig"),
                            mode="minhash", threshold=0.5, payload="digest")
    assert res_dig["kept_rows"] == res_sig["kept_rows"] > 0
    ks = sorted(r["doc_id"] for r in
                ray.data.read_parquet(str(tmp_path / "sig")).take_all())
    kd = sorted(r["doc_id"] for r in
                ray.data.read_parquet(str(tmp_path / "dig")).take_all())
    assert ks == kd

    with pytest.raises(ValueError, match="mode minhash only"):
        run_dedup_job(str(src), str(tmp_path / "x"), mode="exact",
                      payload="digest")


@pytest.mark.usefixtures("ray_session")
def test_dedup_job_digest_incremental_against_parity(tmp_path):
    """Incremental digest dedup: a new crawl run --against a prior
    run's manifest under payload="digest" keeps exactly the docs the
    full-sig incremental run keeps (prior docs enter discovery via
    their STORED manifest sigs — prior text is never readable here
    because we delete it before the incremental runs)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from jobs.dedup_job import run_dedup_job

    rows1 = _cluster_corpus(seed=11)  # doc_id 0..N-1
    n1 = len(rows1)
    src1 = tmp_path / "in1"
    src1.mkdir()
    pq.write_table(pa.Table.from_pylist(rows1), str(src1 / "p.parquet"))
    run_dedup_job(str(src1), str(tmp_path / "run1"),
                  mode="minhash", threshold=0.5)

    # new crawl: near-copies of prior docs + fresh docs, ids disjoint
    rows2 = [{"doc_id": n1 + i, "text": r["text"] + " again"}
             for i, r in enumerate(rows1[:15])]
    rows2 += [{"doc_id": n1 + 100 + j, "text": " ".join(
        f"fresh{j}w{q}" for q in range(60))} for j in range(8)]
    src2 = tmp_path / "in2"
    src2.mkdir()
    pq.write_table(pa.Table.from_pylist(rows2), str(src2 / "p.parquet"))

    # prior text gone: only the manifest survives (the real crawl shape)
    shutil.rmtree(str(src1))

    r_sig = run_dedup_job(str(src2), str(tmp_path / "incr_sig"),
                          mode="minhash", threshold=0.5,
                          against=str(tmp_path / "run1"))
    r_dig = run_dedup_job(str(src2), str(tmp_path / "incr_dig"),
                          mode="minhash", threshold=0.5, payload="digest",
                          against=str(tmp_path / "run1"))
    assert r_dig["kept_rows"] == r_sig["kept_rows"]
    ks = sorted(r["doc_id"] for r in ray.data.read_parquet(
        str(tmp_path / "incr_sig")).take_all())
    kd = sorted(r["doc_id"] for r in ray.data.read_parquet(
        str(tmp_path / "incr_dig")).take_all())
    assert ks == kd
    # fresh docs survive; some near-copies of prior docs were dropped
    assert set(n1 + 100 + j for j in range(8)) <= set(ks)
    assert r_sig["kept_rows"] < len(rows2)


@pytest.mark.usefixtures("ray_session")
def test_thin_prior_cand_parity_both_tails():
    """Library-level incremental parity: digest discovery with
    prior_cand (manifest-shaped rows) equals the sig path's
    union-into-candidates composition — on the driver-merge tail AND
    the forced distributed tail."""
    import pyarrow as pa
    import ray.data

    from dataguards_ray.neardup import (
        minhash_candidates,
        minhash_pair_candidates,
        pairs_from_candidates,
    )

    prior_rows = _cluster_corpus(seed=5, n_clusters=6, n_unique=10)
    n1 = len(prior_rows)
    new_rows = [{"doc_id": n1 + i, "text": r["text"] + " tail9"}
                for i, r in enumerate(prior_rows[:10])]
    new_rows += [{"doc_id": n1 + 50 + j, "text": " ".join(
        f"newdoc{j}tok{q}" for q in range(60))} for j in range(5)]

    prior_ds = ray.data.from_items(prior_rows)
    new_ds = ray.data.from_items(new_rows).repartition(3)
    # manifest-shaped prior rows: (band, band_hash, doc_id, sig) —
    # written to parquet and read back, exactly like a real manifest
    # (a bare .union of a materialized dataset can surface Ray 2.49
    # schemaless empty blocks; the job always reads manifests from disk)
    import tempfile

    cols = ["band", "band_hash", "doc_id", "sig"]
    man_dir = tempfile.mkdtemp(prefix="thin_manifest_")
    minhash_candidates(prior_ds).select_columns(cols).write_parquet(man_dir)
    manifest = ray.data.read_parquet(man_dir)

    ref = pairs_from_candidates(
        minhash_candidates(new_ds).select_columns(cols).union(manifest),
        threshold=0.5)
    want = sorted(
        (r["id_a"], r["id_b"], r["est_jaccard"]) for r in ref.take_all())
    assert want

    for cap in (200_000, 0):  # driver tail, then forced distributed tail
        got_ds = minhash_pair_candidates(
            new_ds, threshold=0.5, payload="digest",
            max_driver_pairs=cap, prior_cand=manifest)
        got = sorted((r["id_a"], r["id_b"], r["est_jaccard"])
                     for r in got_ds.take_all())
        assert got == want, f"cap={cap}"

    # tiny caps × incremental: star/rep-edge/bucket-truncation branches
    # must stay parity-identical when prior docs sit in the buckets
    caps = dict(max_clique=2, max_expand=3, max_bucket=4)
    ref_c = pairs_from_candidates(
        minhash_candidates(new_ds).select_columns(cols).union(manifest),
        threshold=0.5, **caps)
    want_c = sorted(
        (r["id_a"], r["id_b"], r["est_jaccard"]) for r in ref_c.take_all())
    for cap in (200_000, 0):
        got_ds = minhash_pair_candidates(
            new_ds, threshold=0.5, payload="digest",
            max_driver_pairs=cap, prior_cand=manifest, **caps)
        got = sorted((r["id_a"], r["id_b"], r["est_jaccard"])
                     for r in got_ds.take_all())
        assert got == want_c, f"caps cap={cap}"
