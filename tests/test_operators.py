"""Operator tests: joins, aggregates, dedup, similarity, near-dup,
multimodal plumbing (SURVEY §2.6–§2.8 + task-brief extras)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


def test_broadcast_lookup():
    import ray.data

    from dataguards_ray.joins import broadcast_lookup

    ds = ray.data.from_items([{"k": 1}, {"k": 2}, {"k": 9}])
    out = broadcast_lookup(ds, {1: "a", 2: "b"}, "k", "v", out_type=pa.string())
    df = out.to_pandas().sort_values("k")
    assert list(df["v"]) == ["a", "b", None]


def test_semi_anti_join_partition():
    import ray.data

    from dataguards_ray.joins import anti_join, semi_join

    left = ray.data.from_items([{"k": i} for i in range(10)])
    right = ray.data.from_items([{"k": i} for i in range(0, 10, 2)])
    got_semi = sorted(r["k"] for r in semi_join(left, right, "k").take_all())
    got_anti = sorted(r["k"] for r in anti_join(left, right, "k").take_all())
    assert got_semi == [0, 2, 4, 6, 8]
    assert got_anti == [1, 3, 5, 7, 9]


def test_latest_by_key():
    import ray.data

    rows = [
        {"k": "a", "ts": 5, "id": 1, "v": "x"},
        {"k": "a", "ts": 9, "id": 2, "v": "y"},
        {"k": "a", "ts": 9, "id": 3, "v": "z"},  # tie → higher id wins
        {"k": "b", "ts": 1, "id": 4, "v": "w"},
    ]
    from dataguards_ray.joins import latest_by_key

    ds = ray.data.from_items(rows)
    out = {r["k"]: r for r in latest_by_key(ds, "k", "ts", "id").take_all()}
    assert out["a"]["id"] == 3 and out["b"]["id"] == 4


def test_semi_anti_join_empty_right():
    """ADVICE fix: an empty right side must yield no rows (semi) / all
    rows (anti) instead of raising ArrowTypeError on a null-typed set."""
    import ray.data

    from dataguards_ray.joins import anti_join, semi_join

    left = ray.data.from_items([{"k": "a"}, {"k": "b"}])
    right = ray.data.from_items([{"k": "zzz"}]).filter(lambda r: False)
    assert semi_join(left, right, "k").take_all() == []
    assert sorted(r["k"] for r in anti_join(left, right, "k").take_all()) == ["a", "b"]
    # null right keys never equi-match (and must not break the groupby)
    nulls = ray.data.from_items([{"k": None}, {"k": None}])
    assert semi_join(left, nulls, "k").take_all() == []
    assert sorted(r["k"] for r in anti_join(left, nulls, "k").take_all()) == ["a", "b"]


def test_latest_by_key_negative_values():
    """ADVICE fix: negative timestamps / tiebreaks (pre-1970) must rank
    correctly (biased uint64 zero-padding, not raw negative decimals)."""
    import ray.data

    from dataguards_ray.joins import latest_by_key

    rows = [
        {"k": "a", "ts": -50, "id": -7, "v": "old"},
        {"k": "a", "ts": -2, "id": -9, "v": "new"},
        {"k": "b", "ts": -2, "id": -3, "v": "lo"},
        {"k": "b", "ts": -2, "id": -1, "v": "hi"},  # ts tie → higher id wins
    ]
    out = {r["k"]: r for r in latest_by_key(ray.data.from_items(rows), "k", "ts", "id").take_all()}
    assert out["a"]["v"] == "new" and out["b"]["v"] == "hi"


def test_latest_by_key_shuffle_strategy_matches_broadcast():
    """Round-2 verdict item #7: the high-cardinality shuffle path and a
    forced auto-switch must agree with the broadcast path."""
    import random

    import ray.data

    from dataguards_ray.joins import latest_by_key

    rng = random.Random(5)
    rows = [
        {"k": f"u{rng.randrange(200)}", "ts": rng.randrange(10_000), "id": i, "v": i * 3}
        for i in range(2000)
    ]
    ds = ray.data.from_items(rows).materialize()
    want = {r["k"]: r["id"] for r in latest_by_key(ds, "k", "ts", "id",
                                                   strategy="broadcast").take_all()}
    got_shuffle = {r["k"]: r["id"] for r in latest_by_key(ds, "k", "ts", "id",
                                                          strategy="shuffle").take_all()}
    got_auto = {r["k"]: r["id"] for r in latest_by_key(ds, "k", "ts", "id",
                                                       max_broadcast_keys=10).take_all()}
    assert got_shuffle == want and got_auto == want and len(want) == 200


def test_asof_time_bucket_salt_matches_unsalted():
    """Round-2: time-range-salted asof (carry-in rows across bucket
    boundaries) must equal the unsalted join, including buckets with no
    in-bucket right rows."""
    import random

    import ray.data

    from dataguards_ray.joins import asof_join

    rng = random.Random(13)
    lefts, rights = [], []
    used = set()
    for i in range(600):
        k = f"u{i % 3}"  # few hot keys — the salt's target shape
        ts = rng.randrange(0, 10_000)
        lefts.append({"lid": i, "ts": ts, "k": k})
        rts = rng.randrange(0, 10_000)
        if (k, rts) not in used:  # unique right (key, ts) per docstring
            used.add((k, rts))
            rights.append({"rid": i, "ts": rts, "k": k})
    # starve some buckets of right rows: drop all right rows in [2000, 4000)
    rights = [r for r in rights if not (2000 <= r["ts"] < 4000)]
    lds = ray.data.from_items(lefts).repartition(4)
    rds = ray.data.from_items(rights).repartition(4)

    def res(bucket_us):
        out = asof_join(lds, rds, key="k", ts_col="ts", bucket_us=bucket_us)
        return sorted((r["lid"], r["rid"]) for r in out.take_all())

    base = res(None)
    assert res(500) == base
    assert res(3000) == base


def test_asof_null_keys_and_rightless_groups():
    """Code-review fix: null keys must not crash the groupby; null-key
    left rows null-extend (SQL: NULL never equi-matches), null-key right
    rows are ignored, and keys with zero right rows don't crash the
    kernel."""
    import ray.data

    from dataguards_ray.joins import asof_join

    lefts = [{"lid": i, "ts": i * 10, "k": (None if i % 5 == 0 else f"u{i % 3}")}
             for i in range(60)]
    rights = [{"rid": i, "ts": i * 7, "k": (None if i % 4 == 0 else f"u{i % 2}")}
              for i in range(40)]  # key u2 exists on the left only
    lds = ray.data.from_items(lefts).repartition(3)
    rds = ray.data.from_items(rights).repartition(3)
    out = asof_join(lds, rds, key="k", ts_col="ts").take_all()
    assert len(out) == 60
    assert all(r["rid"] is None for r in out if r["k"] is None)
    assert all(r["rid"] is None for r in out if r["k"] == "u2")  # rightless key
    # non-null keys match the brute-force backward join
    import collections

    rmap = collections.defaultdict(list)
    for r in rights:
        if r["k"] is not None:
            rmap[r["k"]].append(r)
    for r in out:
        if r["k"] is None:
            continue
        cands = [x for x in rmap[r["k"]] if x["ts"] <= r["ts"]]
        want = max(cands, key=lambda x: x["ts"])["rid"] if cands else None
        assert r["rid"] == want


def test_bloom_semi_anti_matches_exact():
    """Round-2 verdict item #4: the Bloom scale path (prefilter + exact
    join re-check) must produce output identical to the exact broadcast
    path when the right side exceeds the broadcast threshold."""
    import ray.data

    from dataguards_ray.joins import anti_join, semi_join

    left = ray.data.from_items([{"k": i} for i in range(4000)]).materialize()
    right = ray.data.from_items([{"k": i * 2} for i in range(1500)])  # evens < 3000

    exact_semi = sorted(r["k"] for r in semi_join(left, right, "k").take_all())
    bloom_semi = sorted(
        r["k"] for r in semi_join(left, right, "k", max_broadcast_keys=100).take_all()
    )
    assert bloom_semi == exact_semi and len(exact_semi) == 1500

    exact_anti = sorted(r["k"] for r in anti_join(left, right, "k").take_all())
    bloom_anti = sorted(
        r["k"] for r in anti_join(left, right, "k", max_broadcast_keys=100).take_all()
    )
    assert bloom_anti == exact_anti and len(exact_anti) == 2500


def test_flag_dedup_keep_bloom_matches_exact():
    import ray.data

    from dataguards_ray.steps.dedup import (contested_winners_dataset, digest_winners,
                                            flag_dedup_keep, flag_dedup_keep_bloom,
                                            rank_expr)

    rows = []
    for i in range(300):
        digest = f"d{i % 90}"  # digests d0..d89, most contested
        rows.append(
            {"url": f"u{i}", "warc_ts": 1000 + i, "digest": digest, "keep": i % 7 != 0}
        )
    ds = ray.data.from_items(rows).materialize()

    kept_meta = ds.map_batches(
        lambda b: b.filter(b.column("keep")).select(["digest", "warc_ts", "url"]),
        batch_format="pyarrow",
    )
    exact = {
        r["url"]: r["dedup_keep"]
        for r in flag_dedup_keep(ds, digest_winners(kept_meta)).take_all()
    }

    def add_rank(b: pa.Table) -> pa.Table:
        return pa.table(
            {"digest": b.column("digest"),
             "rank": rank_expr(b.column("warc_ts"), b.column("url"))}
        )

    winners_ds = contested_winners_dataset(
        kept_meta.map_batches(add_rank, batch_format="pyarrow"), "digest", "rank"
    )
    bloom = {
        r["url"]: r["dedup_keep"]
        for r in flag_dedup_keep_bloom(ds, winners_ds).take_all()
    }
    assert bloom == exact
    # exactly one winner per digest among kept rows
    assert sum(bloom.values()) == len({r["digest"] for r in rows if r["keep"]})


def test_latest_by_key_null_and_sentinel_keys():
    """Code-review fix: null keys form their own group (both strategies)
    and cannot collide with a literal key value."""
    import ray.data

    from dataguards_ray.joins import latest_by_key

    rows = [{"k": None, "ts": 5, "id": 1}, {"k": None, "ts": 9, "id": 2},
            {"k": "<null>", "ts": 9, "id": 2}, {"k": "<null>", "ts": 1, "id": 0}]
    ds = ray.data.from_items(rows).materialize()
    for strategy in ("broadcast", "shuffle"):
        got = sorted(((r["k"], r["id"]) for r in
                      latest_by_key(ds, "k", "ts", "id", strategy=strategy).take_all()),
                     key=str)
        assert got == [("<null>", 2), (None, 2)], (strategy, got)


def test_grouped_quantile_ignores_nulls():
    """Code-review fix: quantile skips nulls (DuckDB semantics); all-null
    groups yield a null quantile."""
    import ray.data

    from dataguards_ray.aggregates import grouped_quantile

    rows = [{"g": "a", "v": 1}, {"g": "a", "v": 2}, {"g": "a", "v": None},
            {"g": "b", "v": None}]
    ds = ray.data.from_items(rows)
    out = {r["g"]: r["m"] for r in grouped_quantile(ds, ["g"], "v", "m", 0.5).take_all()}
    assert out == {"a": 1, "b": None}
    out9 = {r["g"]: r["m"] for r in grouped_quantile(ds, ["g"], "v", "m", 0.9).take_all()}
    assert out9 == {"a": 2, "b": None}


def test_salted_vs_plain_groupby():
    from dataguards_ray.aggregates import grouped_agg, salted_groupby
    from dataguards_ray.io import read_table

    ds = read_table(SF, "lineitem", columns=["l_returnflag", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"l_returnflag": b.column("l_returnflag"),
             "q": pc.cast(b.column("l_quantity"), pa.int64())}
        )

    ds2 = ds.map_batches(prep, batch_format="pyarrow")
    a = grouped_agg(ds2, ["l_returnflag"], [("q", "sum", "s"), ("q", "count", "n")])
    b = salted_groupby(ds2, ["l_returnflag"], [("q", "sum", "s"), ("q", "count", "n")],
                       salt_n=4)
    da = a.to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    db = b.to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(da, db)


def test_topk_and_approx_topk():
    import ray.data

    from dataguards_ray.aggregates import approx_top_k, topk

    ds = ray.data.from_items(
        [{"k": f"k{i % 7}", "v": i} for i in range(100)]
    ).repartition(5)
    top = topk(ds, [("v", True), ("k", False)], 3).to_pandas()
    assert list(top["v"]) == [99, 98, 97]
    heavy = approx_top_k(ds, "k", 2)
    # k0 (i=0,7,..98) and k1 (i=1,8,..99) both occur 15x; tie broken by key
    assert heavy[0] == ("k1", 15) and heavy[1] == ("k0", 15)


def test_running_total_null_semantics():
    """SQL SUM OVER parity on nulls (verified against DuckDB): nulls are
    skipped, rows before the first non-null get a NULL total."""
    import ray.data

    from dataguards_ray.events import running_total

    rows = [
        {"event_id": 1, "ts": 10, "user_id": 1, "value": None},
        {"event_id": 2, "ts": 20, "user_id": 1, "value": 1.5},
        {"event_id": 3, "ts": 30, "user_id": 1, "value": None},
        {"event_id": 4, "ts": 40, "user_id": 1, "value": 2.0},
    ]
    got = sorted((r["event_id"], r["running_cents"])
                 for r in running_total(ray.data.from_items(rows)).take_all())
    assert got == [(1, None), (2, 150), (3, 150), (4, 350)]


def test_hopping_window_explode():
    import ray.data

    from dataguards_ray.events import hopping_window

    # one event at slot 7 (ts = 7 * hop) must appear in windows 4..7
    rows = [{"ts": 7 * 900_000_000, "event_type": "click", "value": 1.0}]
    out = hopping_window(ray.data.from_items(rows), ["event_type"])
    got = sorted((r["win"], r["n"], r["sum_value_cents"]) for r in out.take_all())
    assert got == [(4, 1, 100), (5, 1, 100), (6, 1, 100), (7, 1, 100)]


def test_grouped_median_and_grouping_sets():
    import ray.data

    from dataguards_ray.aggregates import grouped_median, grouping_sets

    rows = [{"g": "a", "v": x} for x in [5, 1, 3, 9]] + [
        {"g": "b", "v": x} for x in [10, 20, 30]
    ]
    ds = ray.data.from_items(rows).materialize()
    med = {r["g"]: r["m"] for r in grouped_median(ds, ["g"], "v", "m").take_all()}
    assert med == {"a": 3, "b": 20}  # lower median for even-sized group

    from dataguards_ray.aggregates import grouped_count_distinct, grouped_quantile

    p90 = {r["g"]: r["q"] for r in grouped_quantile(ds, ["g"], "v", "q", 0.9).take_all()}
    assert p90 == {"a": 9, "b": 30}  # ceil(0.9*4)-1=3 -> 9; ceil(0.9*3)-1=2 -> 30
    cd = {r["g"]: r["n"] for r in grouped_count_distinct(ds, ["g"], "v", "n").take_all()}
    assert cd == {"a": 4, "b": 3}

    gs = grouping_sets(ds, [["g"], []], [("v", "sum", "s"), ("v", "count", "n")])
    got = sorted([(r["g"], r["s"], r["n"]) for r in gs.take_all()],
                 key=lambda t: (t[0] is None, t))
    assert got == [("a", 18, 4), ("b", 60, 3), (None, 78, 7)]


def test_stratified_sample_deterministic():
    import ray.data

    from dataguards_ray.aggregates import stratified_sample

    rows = [{"g": f"g{i % 3}", "i": i} for i in range(30)]
    ds = ray.data.from_items(rows)
    out = stratified_sample(ds, "g", 2, [("i", True)])  # top-2 by i desc
    got = sorted((r["g"], r["i"]) for r in out.take_all())
    assert got == [("g0", 24), ("g0", 27), ("g1", 25), ("g1", 28), ("g2", 26), ("g2", 29)]


def test_new_ops_partition_invariance():
    """§5.4 guardrail extended to round-2 operators: identical results
    at 1 vs 7 blocks (hopping window, median, stratified sample,
    minhash pairs)."""
    import random

    import ray.data

    from dataguards_ray.aggregates import grouped_median, stratified_sample
    from dataguards_ray.events import hopping_window
    from dataguards_ray.neardup import minhash_near_dup_pairs

    rng = random.Random(11)
    ev = [{"ts": rng.randrange(0, 10**10), "event_type": f"t{i % 3}", "value": i / 7}
          for i in range(500)]
    docs = [{"g": f"g{i % 5}", "v": rng.randrange(100), "i": i} for i in range(400)]
    base = "the quick brown fox jumps over the lazy dog " * 20
    texts = [{"doc_id": i, "text": base + f" tail {i % 4}"} for i in range(40)]

    def at(blocks, rows):
        return ray.data.from_items(rows).repartition(blocks)

    blocks_a, blocks_b = 1, 7
    ha = sorted(map(tuple, (r.values() for r in hopping_window(at(blocks_a, ev), ["event_type"]).take_all())))
    hb = sorted(map(tuple, (r.values() for r in hopping_window(at(blocks_b, ev), ["event_type"]).take_all())))
    assert ha == hb
    ma = sorted((r["g"], r["m"]) for r in grouped_median(at(blocks_a, docs), ["g"], "v", "m").take_all())
    mb = sorted((r["g"], r["m"]) for r in grouped_median(at(blocks_b, docs), ["g"], "v", "m").take_all())
    assert ma == mb
    sa = sorted((r["g"], r["i"]) for r in stratified_sample(at(blocks_a, docs), "g", 3, [("v", True), ("i", False)]).take_all())
    sb = sorted((r["g"], r["i"]) for r in stratified_sample(at(blocks_b, docs), "g", 3, [("v", True), ("i", False)]).take_all())
    assert sa == sb
    pa_t = minhash_near_dup_pairs(at(blocks_a, texts), threshold=0.5)
    pb_t = minhash_near_dup_pairs(at(blocks_b, texts), threshold=0.5)
    assert pa_t.to_pylist() == pb_t.to_pylist()


def test_minhash_finds_near_dups():
    import ray.data

    from dataguards_ray.neardup import minhash_near_dup_pairs, ngram_jaccard

    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base + "and then some extra words"
    other = "completely different content about databases " * 20
    ds = ray.data.from_items(
        [{"doc_id": 1, "text": base}, {"doc_id": 2, "text": near},
         {"doc_id": 3, "text": other}]
    )
    pairs = minhash_near_dup_pairs(ds, threshold=0.5)
    got = set(zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()))
    assert got == {(1, 2)}
    # repeated base text has only ~44 unique shingles; the suffix adds ~25
    assert ngram_jaccard(base, near) > 0.5
    assert ngram_jaccard(base, other) < 0.05


def test_simhash_hamming():
    import ray.data

    from dataguards_ray.neardup import simhash_near_dup_pairs, simhash64

    # wide vocabulary -> per-bit majorities have big margins -> a one-word
    # edit moves few bits (8-word repeats would flip many near-zero margins)
    vocab = [f"word{i}making{i%7}text" for i in range(60)]
    a = " ".join(vocab * 3)
    b = a + " extraterm"
    assert bin(simhash64(a) ^ simhash64(b)).count("1") <= 3
    ds = ray.data.from_items(
        [{"doc_id": 1, "text": a}, {"doc_id": 2, "text": b},
         {"doc_id": 3, "text": "unrelated words entirely here " * 10}]
    )
    pairs = simhash_near_dup_pairs(ds, max_hamming=3)
    got = set(zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()))
    assert (1, 2) in got and not any(3 in p for p in got)


def test_knn_matches_bruteforce():
    import ray.data

    from dataguards_ray.similarity import knn_cosine

    rng = np.random.RandomState(0)
    m = rng.standard_normal((50, 16))
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": m[i].tolist()} for i in range(50)]
    ).repartition(4)
    out = knn_cosine(ds, m[:2], 5)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn[:2].T
    for q in range(2):
        want = list(np.argsort(-sims[:, q], kind="stable")[:5])
        got = [
            v for qq, v in zip(out.column("query_id").to_pylist(),
                               out.column("vec_id").to_pylist())
            if qq == q
        ]
        assert got == want


def test_ivf_knn_recall_and_exact_duplicates():
    import ray.data

    from dataguards_ray.similarity import ivf_assign, ivf_knn, ivf_train, knn_cosine

    rng = np.random.RandomState(1)
    # 4 well-separated clusters in 8-d
    centers = rng.standard_normal((4, 8)) * 5
    V = np.vstack([c + rng.standard_normal((100, 8)) * 0.3 for c in centers])
    tbl = pa.table(
        {"vec_id": np.arange(len(V), dtype=np.int64),
         "embedding": pa.array(V.tolist(), type=pa.list_(pa.float32()))}
    )
    ds = ray.data.from_arrow(tbl).repartition(4).materialize()
    cents = ivf_train(ds, 4)
    # assignment: every vector lands in some cell, cells are non-trivial
    cells = [r["cluster"] for r in ivf_assign(ds, cents).take_all()]
    assert len(set(cells)) == 4

    queries = V[[0, 100, 200, 300]]
    exact = knn_cosine(ds, queries, 5)
    approx = ivf_knn(ds, cents, queries, 5, nprobe=1)
    exact_set = set(zip(exact.column("query_id").to_pylist(), exact.column("vec_id").to_pylist()))
    approx_set = set(zip(approx.column("query_id").to_pylist(), approx.column("vec_id").to_pylist()))
    # clusters are well separated → even nprobe=1 recalls everything
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.95
    # rank-1 hit for each query is the query vector itself
    r1 = {(q, v) for q, v, r in zip(approx.column("query_id").to_pylist(),
                                    approx.column("vec_id").to_pylist(),
                                    approx.column("rank").to_pylist()) if r == 1}
    assert r1 == {(0, 0), (1, 100), (2, 200), (3, 300)}


def test_ivf_partitioned_index_prunes_read(tmp_path):
    """The cluster-partitioned index search must equal full-corpus
    ivf_knn while reading only the probed cells' files."""
    import os

    import ray.data

    from dataguards_ray.similarity import (ivf_knn, ivf_knn_partitioned, ivf_train,
                                           ivf_write_index)

    rng = np.random.RandomState(2)
    centers = rng.standard_normal((4, 8)) * 5
    V = np.vstack([c + rng.standard_normal((80, 8)) * 0.3 for c in centers])
    tbl = pa.table(
        {"vec_id": np.arange(len(V), dtype=np.int64),
         "embedding": pa.array(V.tolist(), type=pa.list_(pa.float32()))}
    )
    ds = ray.data.from_arrow(tbl).repartition(4).materialize()
    cents = ivf_train(ds, 4)
    idx = str(tmp_path / "ivf")
    ivf_write_index(ds, cents, idx)
    assert len([d for d in os.listdir(idx) if d.startswith("cluster=")]) == 4

    queries = V[[0, 160]]
    full = ivf_knn(ds, cents, queries, 5, nprobe=1).to_pylist()
    part = ivf_knn_partitioned(idx, cents, queries, 5, nprobe=1).to_pylist()
    assert part == full and len(full) == 10


def test_read_csv_roundtrip(tmp_path):
    import ray.data

    from dataguards_ray.io import cast_schema, read_csv

    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    ds = read_csv(str(p))
    out = cast_schema(ds, pa.schema([("a", pa.int32()), ("b", pa.string())]))
    assert [r for r in out.take_all()] == [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]


def test_lsh_ann_in_group_verify_100k():
    """Round-2 verdict item #2: the LSH-ANN scale path must verify
    inside bucket groups — 100k vectors, planted exact duplicates, no
    corpus-sized driver materialization anywhere in the path."""
    import ray.data

    from dataguards_ray.similarity import lsh_bucket_pairs

    rng = np.random.RandomState(0)
    n, d = 100_000, 16
    V = rng.standard_normal((n, d)).astype(np.float64)
    planted = [(10, n - 1), (500, n - 2), (7777, n - 3)]
    for a, b in planted:
        V[b] = V[a]
    tbl = pa.table(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": pa.array(V.tolist(), type=pa.list_(pa.float32()))}
    )
    ds = ray.data.from_arrow(tbl).repartition(16)
    pairs = lsh_bucket_pairs(ds, 0.999, n_planes=10, n_tables=2)
    got = set(zip(pairs.column("id_a").to_pylist(), pairs.column("id_b").to_pylist()))
    assert all(p in got for p in planted)
    # random 16-dim vectors essentially never reach cosine 0.999
    assert pairs.num_rows == len(planted)


def test_multimodal_decode_resize():
    import ray.data

    from dataguards_ray.multimodal import (
        decode_images,
        encode_fake_image,
        resize_images,
    )

    items = [{"img_id": i, "image": encode_fake_image(32, 16, seed=i)} for i in range(20)]
    ds = ray.data.from_items(items)
    dec = decode_images(ds, concurrency=(1, 2)).to_pandas()
    assert set(dec["width"]) == {32} and set(dec["height"]) == {16}
    small = resize_images(ds, 8, 8, concurrency=(1, 2))
    dec2 = decode_images(small, concurrency=(1, 2)).to_pandas()
    assert set(dec2["width"]) == {8} and set(dec2["height"]) == {8}

    import pytest as _pytest

    from dataguards_ray.multimodal import _decode_one

    with _pytest.raises(NotImplementedError):
        _decode_one(b"\x89PNG\r\n...")


def test_urltools():
    from dataguards_ray.urltools import url_domain_one, url_normalize_one

    assert url_normalize_one("HTTPS://Example.COM:443/a/b?q=1#frag") == "https://example.com/a/b?q=1"
    assert url_normalize_one("http://example.com:8080/x") == "http://example.com:8080/x"
    assert url_domain_one("https://a.b.site9.example.com/p") == "example.com"
    assert url_domain_one("https://news.bbc.co.uk/x") == "bbc.co.uk"
    assert url_domain_one("https://localhost/") == "localhost"
    # absolute-FQDN trailing dot (blocklist-evasion form) is the same host
    from dataguards_ray.urltools import url_host_one

    assert url_domain_one("http://evil.example.com./x") == "example.com"
    assert url_host_one("http://Evil.Example.COM./x") == "evil.example.com"
    assert url_normalize_one("http://example.com./x") == "http://example.com/x"
    # IPv6 literals re-bracket so normalized urls re-parse (idempotent)
    assert url_normalize_one("HTTPS://[::1]:8443/x") == "https://[::1]:8443/x"
    assert url_normalize_one(url_normalize_one("https://[2001:db8::1]/p")) \
        == "https://[2001:db8::1]/p"


def test_domains_array_matches_scalar():
    import pyarrow as pa

    from dataguards_ray.urltools import domains_array, url_domain_one

    urls = [
        "https://www.site9.example.com/p",
        "https://news.bbc.co.uk/x",
        "http://EXAMPLE.com:8080/y",
        "https://www.site9.example.com/q",  # repeated host (dict-encode path)
        None,
        "",
        "https://localhost/",
    ]
    got = domains_array(pa.chunked_array([urls[:3], urls[3:]])).to_pylist()
    want = [url_domain_one(u) if u else "" for u in urls]
    assert got == want


def test_block_by_domain_drop_and_flag():
    import ray.data

    from dataguards_ray.urltools import block_by_domain

    rows = [
        {"id": 1, "url": "https://www.bad.com/a"},
        {"id": 2, "url": "https://ok.org/b"},
        {"id": 3, "url": "https://sub.BAD.com/c"},      # case + subdomain
        {"id": 4, "url": "https://news.bbc.co.uk/d"},   # PSL 3-label domain
        {"id": 5, "url": "https://bbc.co.uk/e"},
    ]
    ds = ray.data.from_items(rows)
    blocked = {"bad.com", "BBC.co.uk"}  # mixed case in the list too

    kept = sorted(r["id"] for r in block_by_domain(ds, blocked).take_all())
    assert kept == [2]

    flagged = {r["id"]: r["blocked"]
               for r in block_by_domain(ds, blocked, mode="flag").take_all()}
    assert flagged == {1: True, 2: False, 3: True, 4: True, 5: True}

    # host-level entry (UT1 lists mix granularities): blocks the exact
    # host (and default 'either' matching), NOT the registered domain
    kept_host = sorted(r["id"] for r in
                       block_by_domain(ds, {"news.bbc.co.uk"}).take_all())
    assert kept_host == [1, 2, 3, 5]
    # match='domain' ignores host-level entries entirely
    kept_dom = sorted(r["id"] for r in block_by_domain(
        ds, {"news.bbc.co.uk"}, match="domain").take_all())
    assert kept_dom == [1, 2, 3, 4, 5]


def test_cast_schema_and_jsonl(tmp_path):
    import json

    import pyarrow as pa
    import ray.data

    from dataguards_ray.io import cast_schema, read_jsonl

    ds = ray.data.from_items([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    target = pa.schema([("b", pa.string()), ("a", pa.int32())])
    out = cast_schema(ds, target)
    assert pa.schema(out.schema().base_schema).equals(target)

    p = tmp_path / "rows.jsonl"
    with open(p, "w") as f:
        for i in range(3):
            f.write(json.dumps({"k": i}) + "\n")
    assert sorted(r["k"] for r in read_jsonl(str(p)).take_all()) == [0, 1, 2]


def test_domain_blocklist_step():
    import json

    import ray.data

    from dataguards_ray.pipeline import make_step

    with open("fixtures/domain_blocklist.json") as f:
        blocked = frozenset(json.load(f)["blocked"])
    step = make_step("blocklist", blocked=blocked)
    ds = ray.data.from_items(
        [{"url": "https://site7.example.com/x"},     # host match
         {"url": "https://a.dup3.example.org/y"},    # registered-domain match
         {"url": "https://clean.example.com/z"}]
    )
    out = step.apply(ds).take_all()
    assert [r["url"] for r in out] == ["https://clean.example.com/z"]


def test_bloom_filter():
    import random

    from dataguards_ray.bloom import bloom_from

    rng = random.Random(3)
    keys = [f"key-{rng.randrange(10**9)}" for _ in range(5000)]
    bf = bloom_from(keys, fp_rate=0.01)
    assert all(k in bf for k in keys)  # zero false negatives
    fp = sum(1 for i in range(5000) if f"absent-{i}" in bf) / 5000
    assert fp < 0.03
    assert bf.nbytes < 64 * 1024


def test_prepare_handles_nulls():
    import pyarrow as pa

    from dataguards_ray.steps.prepare import prepare_batch

    t = pa.table(
        {
            "url": ["https://a/x", None, "https://a/y"],
            "warc_ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
            "html": pa.array([None, b"<p>hi</p>", None], type=pa.binary()),
            "text": ["ok text", None, None],
            "lang": ["en", "en", "en"],
        }
    )
    out = prepare_batch(t)
    assert out.column("valid").to_pylist() == [True, False, False]
    assert out.column("text_clean").to_pylist()[2] == ""


def test_near_dedup_filter():
    import ray.data

    from dataguards_ray.neardup import near_dedup_filter

    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " tail one"},
        {"doc_id": 3, "text": base + " tail two"},
        {"doc_id": 4, "text": "entirely different content here " * 20},
    ]
    out = near_dedup_filter(ray.data.from_items(rows), threshold=0.5)
    assert sorted(r["doc_id"] for r in out.take_all()) == [1, 4]
    # the distributed (label-propagation) component path must agree
    out_d = near_dedup_filter(ray.data.from_items(rows), threshold=0.5, distributed=True)
    assert sorted(r["doc_id"] for r in out_d.take_all()) == [1, 4]


def test_exact_dedup_filter_and_dedup_job(tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from dataguards_ray.neardup import exact_dedup_filter
    from jobs.dedup_job import run_dedup_job

    rows = [
        {"doc_id": 5, "text": "aaa"}, {"doc_id": 2, "text": "aaa"},
        {"doc_id": 3, "text": "bbb"}, {"doc_id": 9, "text": "aaa"},
        {"doc_id": 7, "text": "ccc"},
    ]
    got = sorted(r["doc_id"] for r in exact_dedup_filter(ray.data.from_items(rows)).take_all())
    assert got == [2, 3, 7]  # min id wins per distinct text

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(src / "part0.parquet"))
    res = run_dedup_job(str(src), str(tmp_path / "out"), mode="exact")
    walls = res.pop("phase_walls")  # round-5 diagnostics ride the summary
    assert set(walls) == {"discovery", "survivor_write"}
    assert res == {"mode": "exact", "input_rows": 5, "kept_rows": 3, "dropped_rows": 2}
    back = sorted(r["doc_id"] for r in ray.data.read_parquet(str(tmp_path / "out")).take_all())
    assert back == [2, 3, 7]

    # minhash mode with STRING ids (derived int64 hash id, column dropped)
    base = "the quick brown fox jumps over the lazy dog " * 20
    rows2 = [
        {"uid": "u-one", "text": base},
        {"uid": "u-two", "text": base + " tail"},
        {"uid": "u-three", "text": "entirely different content here " * 20},
    ]
    src2 = tmp_path / "in2"
    src2.mkdir()
    pq.write_table(pa.Table.from_pylist(rows2), str(src2 / "p.parquet"))
    res2 = run_dedup_job(str(src2), str(tmp_path / "out2"), mode="minhash",
                         threshold=0.5, id_col="uid")
    assert res2["input_rows"] == 3 and res2["kept_rows"] == 2
    surv = ray.data.read_parquet(str(tmp_path / "out2"))
    assert "__nid" not in surv.schema().names
    kept = {r["uid"] for r in surv.take_all()}
    assert "u-three" in kept and len(kept) == 2


def test_minhash_pathological_bucket():
    """Round-2 verdict item #1: one hot LSH bucket (identical docs) must
    cost O(n) star edges, not an O(n²) clique — 5k identical docs finish
    fast and dedup to a single survivor."""
    import ray.data

    from dataguards_ray.neardup import minhash_near_dup_pairs, near_dedup_filter

    text = "boilerplate terms of service apply to every page " * 10
    ds = ray.data.from_items([{"doc_id": i, "text": text} for i in range(5000)])
    pairs = minhash_near_dup_pairs(ds, threshold=0.8)
    # star from min id: 4999 edges, all est 1.0 — the pair COUNT is the
    # real O(n)-vs-O(n^2) regression guard (a clique would emit 12.5M)
    assert pairs.num_rows == 4999
    assert pairs.column("id_a").to_pylist()[:3] == [0, 0, 0]
    assert set(pairs.column("est_jaccard").to_pylist()) == {1.0}
    survivors = near_dedup_filter(ds, threshold=0.8).take_all()
    assert [r["doc_id"] for r in survivors] == [0]


def test_connected_components_label_propagation():
    import ray.data

    from dataguards_ray.neardup import connected_components

    # chain 0-1-2-3-4 (diameter forces multiple rounds) + pair 10-11
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]
    pairs = ray.data.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    comp = {r["node"]: r["root"] for r in connected_components(pairs).take_all()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10}


def test_verify_pairs_jaccard_joinback():
    import ray.data

    from dataguards_ray.neardup import (minhash_pair_candidates, ngram_jaccard,
                                        verify_pairs_jaccard)

    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " tail one"},
        {"doc_id": 3, "text": "entirely different content here " * 20},
    ]
    ds = ray.data.from_items(rows)
    cand = minhash_pair_candidates(ds, threshold=0.5)
    got = verify_pairs_jaccard(ds, cand).take_all()
    assert len(got) == 1 and got[0]["id_a"] == 1 and got[0]["id_b"] == 2
    assert got[0]["jaccard"] == ngram_jaccard(rows[0]["text"], rows[1]["text"])


def test_multimodal_audio_and_video():
    import ray.data

    from dataguards_ray.multimodal import (
        audio_features,
        decode_images,
        encode_fake_audio,
        encode_fake_video,
        sample_frames,
    )

    auds = [{"aud_id": i, "audio": encode_fake_audio(16000, 16000 * 2, seed=i)}
            for i in range(8)]
    feats = audio_features(ray.data.from_items(auds), concurrency=(1, 2)).to_pandas()
    assert set(feats["sample_rate"]) == {16000}
    assert all(abs(d - 2.0) < 1e-9 for d in feats["duration_s"])
    assert (feats["rms"] > 0).all()

    vids = [{"vid_id": i, "video": encode_fake_video(16, 8, 10, seed=i)} for i in range(4)]
    frames = sample_frames(ray.data.from_items(vids), every_k=3, concurrency=(1, 2))
    df = frames.to_pandas()
    assert len(df) == 4 * 4  # frames 0,3,6,9
    decoded = decode_images(frames, concurrency=(1, 2)).to_pandas()
    assert set(decoded["width"]) == {16} and set(decoded["height"]) == {8}


# --- round-2 widening batch 2: range join, outer join, windows, pivot, var --


def test_range_join_cross_bucket():
    """An interval spanning several buckets must still meet points in
    every bucket exactly once (the point's bucket owns the pair)."""
    import ray.data

    from dataguards_ray.joins import range_join

    points = ray.data.from_items(
        [{"k": "a", "t": t, "pid": i} for i, t in enumerate([5, 15, 25, 35, 95])]
        + [{"k": "b", "t": 15, "pid": 90}]
    )
    intervals = ray.data.from_items(
        [
            {"k": "a", "lo": 10, "hi": 30, "iid": 1},   # spans buckets 1..3 @ b=10
            {"k": "a", "lo": 0, "hi": 100, "iid": 2},   # spans all
            {"k": "a", "lo": 40, "hi": 20, "iid": 3},   # end < start → empty
            {"k": "b", "lo": 0, "hi": 20, "iid": 4},
        ]
    )
    out = range_join(points, intervals, key="k", ts_col="t",
                     start_col="lo", end_col="hi", bucket_us=10)
    pairs = sorted((r["pid"], r["iid"]) for r in out.take_all())
    # iid=1 hits t=15,25 (incl. hi=30 → t=30 absent); iid=2 hits all five a-points
    assert pairs == [(0, 2), (1, 1), (1, 2), (2, 1), (2, 2), (3, 2), (4, 2), (90, 4)]


def test_range_join_auto_bucket_and_nulls():
    import ray.data

    from dataguards_ray.joins import range_join

    points = ray.data.from_items(
        [{"k": "a", "t": 10, "pid": 1}, {"k": None, "t": 10, "pid": 2},
         {"k": "a", "t": None, "pid": 3}]
    )
    intervals = ray.data.from_items(
        [{"k": "a", "lo": 0, "hi": 20, "iid": 1}, {"k": None, "lo": 0, "hi": 20, "iid": 2}]
    )
    out = range_join(points, intervals, key="k", ts_col="t",
                     start_col="lo", end_col="hi")  # bucket from max width
    assert [(r["pid"], r["iid"]) for r in out.take_all()] == [(1, 1)]


def test_range_join_span_cap():
    import ray.data

    from dataguards_ray.joins import range_join

    points = ray.data.from_items([{"k": "a", "t": 5, "pid": 1}])
    intervals = ray.data.from_items([{"k": "a", "lo": 0, "hi": 10_000, "iid": 1}])
    with pytest.raises(Exception, match="max_span_buckets"):
        range_join(points, intervals, key="k", ts_col="t", start_col="lo",
                   end_col="hi", bucket_us=10, max_span_buckets=4).take_all()


def test_outer_join_by_key_full_left_right():
    import ray.data

    from dataguards_ray.joins import outer_join_by_key

    left = ray.data.from_items(
        [{"k": 1, "lv": "a"}, {"k": 2, "lv": "b"}, {"k": 2, "lv": "b2"},
         {"k": None, "lv": "ln"}]
    )
    right = ray.data.from_items(
        [{"k": 2, "rv": "x"}, {"k": 2, "rv": "x2"}, {"k": 3, "rv": "y"},
         {"k": None, "rv": "rn"}]
    )
    full = outer_join_by_key(left, right, "k", how="full")
    rows = sorted(
        ((r["k"], r["lv"], r["k_r"], r["rv"]) for r in full.take_all()),
        key=lambda t: (t[0] is None, t[0], t[1] or "", t[3] or ""),
    )
    # k=2 → 2×2 cross product; k=1 left-only; k=3 right-only; nulls never match
    assert rows == [
        (1, "a", None, None),
        (2, "b", 2, "x"), (2, "b", 2, "x2"), (2, "b2", 2, "x"), (2, "b2", 2, "x2"),
        (None, None, None, "rn"), (None, None, 3, "y"), (None, "ln", None, None),
    ]
    n_left = len(outer_join_by_key(left, right, "k", how="left").take_all())
    n_right = len(outer_join_by_key(left, right, "k", how="right").take_all())
    assert n_left == 6  # 4 matches + left-only k=1 + null-key left row
    assert n_right == 6  # 4 matches + right-only k=3 + null-key right row
    inner = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in outer_join_by_key(left, right, "k", how="inner").take_all()
    )
    # matches only: no null-extension, null keys never match
    assert inner == [(2, "b", "x"), (2, "b", "x2"),
                     (2, "b2", "x"), (2, "b2", "x2")]


def test_lag_gap_and_moving_sum():
    import ray.data

    from dataguards_ray.events import lag_gap, moving_sum

    rows = [
        {"user_id": 1, "event_id": 1, "ts": 100, "value": 1.0},
        {"user_id": 1, "event_id": 2, "ts": 150, "value": None},
        {"user_id": 1, "event_id": 3, "ts": 160, "value": 2.0},
        {"user_id": 1, "event_id": 4, "ts": 200, "value": 3.0},
        {"user_id": 2, "event_id": 5, "ts": 50, "value": None},
    ]
    ds = ray.data.from_items(rows)
    gaps = {r["event_id"]: r["gap_us"] for r in lag_gap(ds).take_all()}
    assert gaps == {1: None, 2: 50, 3: 10, 4: 40, 5: None}
    mov = {r["event_id"]: r["moving_cents"] for r in moving_sum(ds, window_rows=2).take_all()}
    # window 2: e1=100; e2=100 (null skipped, prior value in window);
    # e3=200 (e2 null + e3); e4=500; user2 single null window → NULL
    assert mov == {1: 100, 2: 100, 3: 200, 4: 500, 5: None}


def test_pivot_count_and_sum():
    import ray.data

    from dataguards_ray.aggregates import pivot

    rows = [
        {"g": "a", "c": "x", "v": 1}, {"g": "a", "c": "y", "v": 2},
        {"g": "a", "c": "x", "v": 3}, {"g": "b", "c": "z", "v": 4},
        {"g": "b", "c": None, "v": 5},
    ]
    ds = ray.data.from_items(rows)
    cnt = {r["g"]: (r["n_x"], r["n_y"]) for r in pivot(ds, ["g"], "c", ["x", "y"]).take_all()}
    assert cnt == {"a": (2, 1), "b": (0, 0)}  # 'z' and NULL fall outside the value list
    sm = {r["g"]: (r["sum_x"], r["sum_y"])
          for r in pivot(ds, ["g"], "c", ["x", "y"], value_col="v", agg="sum").take_all()}
    # SQL SUM(CASE WHEN c=v THEN x END): empty cells are NULL, not 0
    assert sm == {"a": (4, 2), "b": (None, None)}


def test_grouped_var_exact():
    import ray.data

    from dataguards_ray.aggregates import grouped_var

    rows = (
        [{"g": "a", "x": v} for v in (1, 2, 3, 4)]
        + [{"g": "b", "x": 7}]                      # n=1 → NULL
        + [{"g": "c", "x": None}, {"g": "c", "x": 10}, {"g": "c", "x": 20}]
    )
    ds = ray.data.from_items(rows)
    out = {r["g"]: r["v"] for r in grouped_var(ds, ["g"], "x", "v").take_all()}
    # a: (4*30 - 100) // 12 = 1;  c (nulls skipped): (2*500 - 900) // 2 = 50
    assert out == {"a": 1, "b": None, "c": 50}


def test_review_fixes_null_ts_empty_scrub_collisions():
    """Sixth-review regressions: lag_gap null-ts rows must be NULL (not
    INT64_MIN garbage); scrub_empty_blocks of a 0-row dataset must stay
    typed (hash_join-safe); suffix collisions fail fast pre-shuffle."""
    import ray.data

    from dataguards_ray.events import lag_gap
    from dataguards_ray.joins import (hash_join, outer_join_by_key, range_join,
                                      scrub_empty_blocks)

    rows = [
        {"user_id": 1, "event_id": 1, "ts": 100},
        {"user_id": 1, "event_id": 2, "ts": None},
        {"user_id": 1, "event_id": 3, "ts": 150},
    ]
    gaps = {r["event_id"]: r["gap_us"] for r in lag_gap(ray.data.from_items(rows)).take_all()}
    # null ts sorts last (DuckDB NULLS LAST): order 1,3,2 → e3 gap=50, e2 NULL
    assert gaps == {1: None, 2: None, 3: 50}

    # scrub of a 0-row dataset keeps a TYPED schema (no schemaless
    # block).  A filter-to-empty chain loses its schema entirely in Ray
    # 2.49 (zero-COLUMN block) — the caller-supplied `schema` recovers.
    sch = pa.schema([("k", pa.int64()), ("n", pa.int64())])
    empty = ray.data.from_arrow(
        pa.table({"k": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())})
    ).filter(expr="n > 0")
    scrubbed = scrub_empty_blocks(empty, 4, schema=sch)
    assert scrubbed.count() == 0
    assert [f.name for f in pa.schema(scrubbed.schema().base_schema)] == ["k", "n"]
    # production caller with zero candidate pairs must not crash
    # (Dataset.join with an empty side is unfixable in Ray 2.49)
    from dataguards_ray.neardup import verify_pairs_jaccard

    docs = ray.data.from_items([{"doc_id": 1, "text": "abc"}])
    no_pairs = ray.data.from_arrow(
        pa.table({"id_a": pa.array([], type=pa.int64()),
                  "id_b": pa.array([], type=pa.int64())})
    )
    assert verify_pairs_jaccard(docs, no_pairs).take_all() == []
    # filtered-to-empty pairs lose their schema entirely — the id type
    # is re-inferred from the corpus
    filtered = ray.data.from_items([{"id_a": 1, "id_b": 2}]).filter(expr="id_a > 5")
    assert verify_pairs_jaccard(docs, filtered).take_all() == []

    left = ray.data.from_items([{"k": 1, "v": 1, "v_r": 9}])
    rgt = ray.data.from_items([{"k": 1, "v": 2}])
    with pytest.raises(ValueError, match="collision"):
        outer_join_by_key(left, rgt, "k")
    # interval's "t" (shared with points) suffixes to "t_r", which the
    # points side already has as a literal column
    pts = ray.data.from_items([{"k": 1, "t": 5, "t_r": 0}])
    iv = ray.data.from_items([{"k": 1, "lo": 0, "hi": 10, "t": 1}])
    with pytest.raises(ValueError, match="collision"):
        range_join(pts, iv, key="k", ts_col="t", start_col="lo", end_col="hi",
                   bucket_us=10)


def test_grouped_covar_truncation_and_nulls():
    """Negative covariance must TRUNCATE toward zero (DuckDB `//`), not
    floor; NULL in either column skips the pair; n=1 yields NULL."""
    import ray.data

    from dataguards_ray.aggregates import grouped_covar

    rows = (
        # a: n=3, Σxy=19, Σx=7, Σy=12 → num=3·19−84=−27, den=6 → −4 (floor −5)
        [{"g": "a", "x": 1, "y": 9}, {"g": "a", "x": 2, "y": 1},
         {"g": "a", "x": 4, "y": 2}]
        + [{"g": "b", "x": 7, "y": 7}]                      # n=1 → NULL
        # c: null on either side drops the PAIR → effective n=2,
        # x=[10,20], y=[1,3] → num=2·70−30·4=20, den=2 → 10
        + [{"g": "c", "x": None, "y": 5}, {"g": "c", "x": 5, "y": None},
           {"g": "c", "x": 10, "y": 1}, {"g": "c", "x": 20, "y": 3}]
    )
    rows += [{"g": "d", "x": None, "y": 1}, {"g": "d", "x": 2, "y": None}]
    ds = ray.data.from_items(rows).repartition(3)
    out = {r["g"]: r["cv"] for r in grouped_covar(ds, ["g"], "x", "y", "cv").take_all()}
    # d: zero valid pairs -> the group still emits, with NULL (SQL COVAR_SAMP)
    assert out == {"a": -4, "b": None, "c": 10, "d": None}


def test_dense_rank_top_ties_nulls_partition_invariance():
    """SQL DENSE_RANK tie semantics (all rows of a tied value kept, one
    rank per distinct value), NULL ranks last as ONE tied value, and the
    per-batch prune must not change the answer across partitionings."""
    import ray.data

    from dataguards_ray.aggregates import dense_rank_top

    rows = [
        {"g": "a", "id": 1, "v": 30}, {"g": "a", "id": 2, "v": 30},
        {"g": "a", "id": 3, "v": 20}, {"g": "a", "id": 4, "v": 10},
        {"g": "a", "id": 5, "v": 10}, {"g": "a", "id": 6, "v": 5},
        {"g": "b", "id": 7, "v": None}, {"g": "b", "id": 8, "v": 1},
        {"g": "b", "id": 9, "v": None},
    ]
    expect = {
        # a: 30→1 (both rows), 20→2, 10→3 (both rows); 5 (rank 4) cut
        (1, 1), (2, 1), (3, 2), (4, 3), (5, 3),
        # b desc NULLS LAST: 1→1, NULL→2 (one tied value, both rows)
        (8, 1), (7, 2), (9, 2),
    }
    for nparts in (1, 4):
        ds = ray.data.from_items(rows).repartition(nparts)
        got = {(r["id"], r["rnk"])
               for r in dense_rank_top(ds, ["g"], "v", 3, out="rnk").take_all()}
        assert got == expect, nparts


def test_grouped_string_agg_distinct_sorted():
    """string_agg(DISTINCT col ORDER BY col): duplicates collapse, nulls
    are skipped, output order is ascending regardless of input order or
    partitioning."""
    import ray.data

    from dataguards_ray.aggregates import grouped_string_agg

    rows = [
        {"g": "a", "c": "zeta"}, {"g": "a", "c": "alpha"},
        {"g": "a", "c": "zeta"}, {"g": "a", "c": None},
        {"g": "a", "c": "mid"}, {"g": "b", "c": "solo"},
        {"g": "n", "c": None},  # all-NULL group -> (g, NULL), not dropped
    ]
    for nparts in (1, 5):
        ds = ray.data.from_items(rows).repartition(nparts)
        out = {r["g"]: r["cs"]
               for r in grouped_string_agg(ds, ["g"], "c", "cs").take_all()}
        assert out == {"a": "alpha,mid,zeta", "b": "solo", "n": None}, nparts


def test_ntile_bucket_sizes_and_partition_invariance():
    """NTILE(n): bucket sizes differ by at most one with larger buckets
    first (nr=7, n=3 → 3/2/2); fewer rows than buckets → one row per
    bucket; assignment follows the (val desc, id asc) total order and
    is invariant across input partitionings."""
    import ray.data

    from dataguards_ray.aggregates import ntile

    rows = [{"g": "a", "id": i, "v": 100 - i} for i in range(1, 8)]  # 7 rows
    rows += [{"g": "b", "id": 1, "v": 5}, {"g": "b", "id": 2, "v": 4}]  # 2 < n
    expect = {
        # a: ids 1..7 in v-desc order → buckets 1,1,1,2,2,3,3
        ("a", 1, 1), ("a", 2, 1), ("a", 3, 1),
        ("a", 4, 2), ("a", 5, 2), ("a", 6, 3), ("a", 7, 3),
        ("b", 1, 1), ("b", 2, 2),
    }
    for nparts in (1, 4):
        ds = ray.data.from_items(rows).repartition(nparts)
        got = {(r["g"], r["id"], r["tile"])
               for r in ntile(ds, ["g"], 3,
                              [("v", True), ("id", False)]).take_all()}
        assert got == expect, nparts


def test_hll_approx_count_distinct():
    """HLL: ≤3% relative error at 30k distinct (p=12 → σ≈1.6%),
    EXACT partition invariance (deterministic hash), NULLs ignored,
    grouped variant within 5% per group."""
    import ray.data

    from dataguards_ray.hll import approx_count_distinct

    rows = [{"v": f"item-{i}", "g": f"g{i % 3}"} for i in range(30000)] * 2
    rows += [{"v": None, "g": "g0"}] * 10
    estimates = []
    for nparts in (1, 16):
        ds = ray.data.from_items(rows).repartition(nparts)
        est = approx_count_distinct(ds, "v").take_all()[0]["approx_distinct"]
        estimates.append(est)
        assert abs(est - 30000) / 30000 < 0.03, est
    assert estimates[0] == estimates[1]  # deterministic across partitionings

    by_g = {r["g"]: r["approx_distinct"]
            for r in approx_count_distinct(
                ray.data.from_items(rows).repartition(8), "v", keys=["g"]
            ).take_all()}
    assert set(by_g) == {"g0", "g1", "g2"}
    for g, est in by_g.items():
        assert abs(est - 10000) / 10000 < 0.05, (g, est)


def test_hll_small_range_is_near_exact():
    """Linear-counting regime: tiny cardinalities are essentially exact."""
    import ray.data

    from dataguards_ray.hll import approx_count_distinct

    # global aggregate of empty / all-null input must emit one 0 row
    empty = ray.data.from_items([{"v": None}, {"v": None}])
    assert approx_count_distinct(empty, "v").take_all() == [
        {"approx_distinct": 0}]

    rows = [{"v": f"u{i % 37}"} for i in range(5000)]
    est = approx_count_distinct(
        ray.data.from_items(rows).repartition(4), "v"
    ).take_all()[0]["approx_distinct"]
    # linear counting counts touched registers: a register collision
    # (P≈16% for 37 values in 4096 registers) costs at most one
    assert abs(est - 37) <= 1


def test_grouped_quantile_cont_scaled():
    """Interpolated quantile ×q_den stays exact-integer: matches
    numpy percentile (linear) ×4; n=1 group; all-null group → NULL;
    partition-invariant."""
    import ray.data

    from dataguards_ray.aggregates import grouped_quantile_cont_scaled

    vals = [11, 3, 7, 19, 5]          # sorted: 3,5,7,11,19
    rows = [{"g": "a", "x": v} for v in vals]
    rows += [{"g": "b", "x": 42}, {"g": "n", "x": None}]
    # a: h = 3*(5-1)/4 = 3 → exactly v[3]=11 → ×4 = 44
    # numpy check: np.percentile(vals, 75, method="linear") == 11.0
    expect = {"a": 44, "b": 42 * 4, "n": None}
    for nparts in (1, 4):
        ds = ray.data.from_items(rows).repartition(nparts)
        out = {r["g"]: r["q"]
               for r in grouped_quantile_cont_scaled(
                   ds, ["g"], "x", "q", 3, 4).take_all()}
        assert out == expect, nparts
    # a fractional interpolation point: q=1/2 over 4 values
    rows4 = [{"g": "c", "x": v} for v in (1, 2, 4, 8)]
    out = {r["g"]: r["q"]
           for r in grouped_quantile_cont_scaled(
               ray.data.from_items(rows4), ["g"], "x", "q", 1, 2).take_all()}
    # h = 1*(4-1)/2 = 1.5 → (2+4)/2 → ×2 = 6
    assert out == {"c": 6}


def test_randomized_differential_window_aggregates():
    """Seeded-random differential test vs DuckDB for the batch-3
    window/aggregate family — negatives, NULLs, ties, and skewed
    groups that the fixed TPC-H queries never produce."""
    import duckdb
    import ray.data

    from dataguards_ray.aggregates import (dense_rank_top, grouped_covar,
                                           grouped_quantile_cont_scaled, ntile)

    for seed in (7, 41):
        rng = np.random.default_rng(seed)
        n = 400
        g = rng.choice(["a", "b", "c"], size=n, p=[0.7, 0.2, 0.1])
        x = rng.integers(-1000, 1000, size=n).astype(float)
        y = rng.integers(-1000, 1000, size=n).astype(float)
        x[rng.random(n) < 0.1] = np.nan
        y[rng.random(n) < 0.1] = np.nan
        tbl = pa.table({
            "g": pa.array(g),
            "rid": pa.array(np.arange(n), type=pa.int64()),
            "x": pa.array([None if np.isnan(v) else int(v) for v in x],
                          type=pa.int64()),
            "y": pa.array([None if np.isnan(v) else int(v) for v in y],
                          type=pa.int64()),
        })
        con = duckdb.connect()
        con.register("t", tbl)
        ds = ray.data.from_arrow(tbl).repartition(5)

        # covar (truncating integer division, pairwise nulls)
        got = {r["g"]: r["cv"]
               for r in grouped_covar(ds, ["g"], "x", "y", "cv").take_all()}
        want = {r[0]: r[1] for r in con.sql("""
            SELECT g, CASE WHEN COUNT(q) > 1 THEN CAST(
              (COUNT(q)*SUM(CAST(q AS HUGEINT)*p)
               - SUM(CAST(q AS HUGEINT))*SUM(CAST(p AS HUGEINT)))
              // (COUNT(q)*(COUNT(q)-1)) AS BIGINT) END
            FROM (SELECT g,
                   CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x END AS q,
                   CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y END AS p
                  FROM t) GROUP BY g""").fetchall()}
        assert got == want, ("covar", seed)

        # dense_rank <= 3 (ties + NULLS LAST)
        got = {(r["g"], r["rid"], r["rnk"])
               for r in dense_rank_top(ds, ["g"], "x", 3, out="rnk").take_all()}
        want = {tuple(r) for r in con.sql("""
            SELECT g, rid, rnk FROM (
              SELECT g, rid, CAST(dense_rank() OVER (
                PARTITION BY g ORDER BY x DESC) AS BIGINT) AS rnk FROM t)
            WHERE rnk <= 3""").fetchall()}
        assert got == want, ("dense_rank", seed)

        # ntile(5) over a unique total order
        got = {(r["g"], r["rid"], r["tile"])
               for r in ntile(ds, ["g"], 5,
                              [("x", True), ("rid", False)]).take_all()}
        want = {tuple(r) for r in con.sql("""
            SELECT g, rid, CAST(ntile(5) OVER (
              PARTITION BY g ORDER BY x DESC NULLS LAST, rid) AS BIGINT)
            FROM t""").fetchall()}
        assert got == want, ("ntile", seed)

        # interpolated quantile x8 (q = 3/8 exercises non-dyadic f)
        got = {r["g"]: r["q"]
               for r in grouped_quantile_cont_scaled(
                   ds, ["g"], "x", "q", 3, 8).take_all()}
        want = {r[0]: r[1] for r in con.sql("""
            SELECT g, CAST(ROUND(8*quantile_cont(x, 0.375)) AS BIGINT)
            FROM t GROUP BY g""").fetchall()}
        assert got == want, ("quantile_cont", seed)
        con.close()


def test_lead_gap_matches_duckdb():
    """LEAD variant: gap until next event, last-row NULL, null-ts rows
    NULL on both operands, ties broken by event_id."""
    import duckdb
    import ray.data

    from dataguards_ray.events import lag_gap

    rows = [
        {"user_id": 1, "event_id": 1, "ts": 100}, {"user_id": 1, "event_id": 2, "ts": 250},
        {"user_id": 1, "event_id": 3, "ts": 250}, {"user_id": 1, "event_id": 4, "ts": None},
        {"user_id": 2, "event_id": 5, "ts": 7},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    got = {r["event_id"]: r["gap_us"] for r in lag_gap(ds, lead=True).take_all()}
    # order u1: e1(100), e2(250), e3(250), e4(NULL): e1→150, e2→0,
    # e3→NULL (next ts NULL), e4 NULL; u2 single row NULL
    assert got == {1: 150, 2: 0, 3: None, 4: None, 5: None}


def test_grouped_mode_ties_and_nulls():
    """MODE: most frequent non-null value, ties -> smallest value,
    all-null group -> (keys, NULL); partition-invariant."""
    import ray.data

    from dataguards_ray.aggregates import grouped_mode

    rows = (
        [{"g": "a", "v": "x"}] * 3 + [{"g": "a", "v": "y"}] * 3  # tie -> 'x'
        + [{"g": "a", "v": None}] * 9                            # nulls never win
        + [{"g": "b", "v": "q"}, {"g": "b", "v": "r"}, {"g": "b", "v": "r"}]
        + [{"g": "n", "v": None}]
    )
    for nparts in (1, 4):
        ds = ray.data.from_items(rows).repartition(nparts)
        out = {r["g"]: r["m"]
               for r in grouped_mode(ds, ["g"], "v", "m").take_all()}
        assert out == {"a": "x", "b": "r", "n": None}, nparts


def test_profile_table_counts():
    """Profiling: per-column rows / nulls / exact distinct (nulls
    excluded from distinct, SQL COUNT(DISTINCT) semantics)."""
    import ray.data

    from dataguards_ray.profile import profile_table

    rows = [
        {"a": 1, "b": "x"}, {"a": 1, "b": None},
        {"a": 2, "b": "y"}, {"a": None, "b": "y"},
    ]
    ds = ray.data.from_items(rows).repartition(3)
    out = {r["col"]: (r["n_rows"], r["n_null"], r["n_distinct"])
           for r in profile_table(ds, ["a", "b"]).take_all()}
    assert out == {"a": (4, 1, 2), "b": (4, 1, 2)}


def test_grouped_first_last_edge_cases():
    """FIRST/LAST_VALUE: null order col rows excluded, null values
    round-trip to NULL, negative order values sort correctly (bias),
    partition-invariant."""
    import ray.data

    from dataguards_ray.aggregates import grouped_first_last

    rows = [
        {"k": 1, "o": -5, "t": 0, "v": "neg"},   # negative order -> first
        {"k": 1, "o": 2, "t": 0, "v": None},     # null value carried
        {"k": 1, "o": 9, "t": 0, "v": "last"},
        {"k": 1, "o": None, "t": 0, "v": "zz"},  # null order -> excluded
        {"k": 2, "o": None, "t": 0, "v": "x"},   # all-null-order group -> gone
        {"k": 3, "o": 7, "t": 1, "v": "only"},
        {"k": 3, "o": 7, "t": 0, "v": "tie0"},   # tiebreak col decides
    ]
    ds = ray.data.from_items(rows).repartition(3)
    out = grouped_first_last(ds, "k", ["o", "t"], "v",
                             first_name="f", last_name="l")
    got = {r["k"]: (r["f"], r["l"]) for r in out.take_all()}
    assert got == {1: ("neg", "last"), 3: ("tie0", "only")}


def test_span_dedup_semantics():
    """C4 span dedup: first occurrence (min doc_id, start) keeps the
    span, later occurrences lose exactly those segments; docs without
    duplicated spans pass through byte-identical; partition-invariant;
    segment split round-trips the text."""
    import ray.data

    from dataguards_ray.spandedup import sentence_segments, span_dedup

    dup = ("One common sentence here. Another shared sentence follows! "
           "A third shared one? ")
    docs = [
        {"doc_id": 1, "text": "Unique intro for doc one. " + dup + "Tail one."},
        {"doc_id": 2, "text": dup + "Doc two keeps its ending. Extra line."},
        {"doc_id": 3, "text": "Unrelated document. No shared spans at all! S."},
        {"doc_id": 4, "text": ""},
    ]
    assert "".join(sentence_segments(docs[0]["text"])) == docs[0]["text"]

    def run(n_parts):
        ds = ray.data.from_items(docs).repartition(n_parts)
        return {r["doc_id"]: (r["text"], r["n_spans_removed"])
                for r in span_dedup(ds).take_all()}

    out = run(3)
    assert out[1] == (docs[0]["text"], 0)          # winner untouched
    assert out[2][1] == 1 and dup not in out[2][0]  # loser span removed
    assert out[2][0].endswith("Doc two keeps its ending. Extra line.")
    assert out[3] == (docs[2]["text"], 0)
    assert out[4] == ("", 0)
    assert out == run(1)


def test_interval_join_exactly_once_and_semantics():
    """Interval-overlap join: inclusive boundaries, inverted intervals
    drop, cross-key isolation, and EXACTLY-ONCE output even when a pair
    shares many (key, bucket) groups (canonical-bucket emission)."""
    import ray.data

    from dataguards_ray.joins import interval_join

    L = [
        {"k": 1, "lid": 1, "s": 0, "e": 100},
        {"k": 1, "lid": 2, "s": 250, "e": 260},
        {"k": 2, "lid": 3, "s": 0, "e": 100},   # no rights under key 2
        {"k": 1, "lid": 4, "s": 90, "e": 80},   # inverted -> dropped
    ]
    R = [
        {"k": 1, "rid": 1, "s": 50, "e": 300},   # spans many buckets
        {"k": 1, "rid": 2, "s": 100, "e": 120},  # touches lid1 boundary
        {"k": 1, "rid": 3, "s": 255, "e": 256},
        {"k": 1, "rid": 4, "s": 101, "e": 102},  # just misses lid1
    ]
    expected = [(1, 1), (1, 2), (2, 1), (2, 3)]
    for bu in (7, 50, 1000, None):  # tiny buckets force shared groups
        out = interval_join(
            ray.data.from_items(L).repartition(3),
            ray.data.from_items(R).repartition(2),
            key="k", left_start="s", left_end="e",
            right_start="s", right_end="e", bucket_us=bu,
        )
        pairs = sorted((r["lid"], r["rid"]) for r in out.take_all())
        assert pairs == expected, (bu, pairs)


def test_line_dedup_semantics():
    """Line dedup: duplicated long lines removed after the first
    occurrence; short boilerplate lines exempt; newline structure of
    kept lines preserved; partition-invariant."""
    import ray.data

    from dataguards_ray.spandedup import line_dedup

    boiler = "This exact boilerplate line is repeated across documents.\n"
    docs = [
        {"doc_id": 1, "text": "Home\nUnique first body line of doc one.\n" + boiler},
        {"doc_id": 2, "text": boiler + "Home\nOwn content of document two."},
        {"doc_id": 3, "text": "Home\nNothing shared in here at all."},
    ]

    def run(n):
        ds = ray.data.from_items(docs).repartition(n)
        return {r["doc_id"]: (r["text"], r["n_spans_removed"])
                for r in line_dedup(ds).take_all()}

    out = run(3)
    assert out[1] == (docs[0]["text"], 0)            # first occurrence kept
    assert out[2] == ("Home\nOwn content of document two.", 1)
    assert out[3] == (docs[2]["text"], 0)            # "Home" exempt (short)
    assert out == run(1)


def test_span_dedup_fallback_paths_identical():
    """The stage-2 groupby fallback (max_driver_winners=0) and stage-3
    cogroup fallback (max_broadcast_losers=0) produce results identical
    to the broadcast fast paths."""
    import ray.data

    from dataguards_ray.spandedup import span_dedup

    dup = ("Alpha shared sentence one. Beta shared sentence two! "
           "Gamma shared sentence three? ")
    docs = [
        {"doc_id": 10, "text": "Own opener sentence here. " + dup + "Tail."},
        {"doc_id": 11, "text": dup + "Unique eleven ending."},
        {"doc_id": 12, "text": dup + "Unique twelve ending."},
        {"doc_id": 13, "text": "No duplicate content inside. At all! Ok."},
    ]

    def run(**kw):
        ds = ray.data.from_items(docs).repartition(2)
        return sorted(
            (r["doc_id"], r["text"], r["n_spans_removed"])
            for r in span_dedup(ds, **kw).take_all())

    fast = run()
    assert fast == run(max_driver_winners=0)
    assert fast == run(max_broadcast_losers=0)
    assert fast == run(max_driver_winners=0, max_broadcast_losers=0)
    # recompute-twice streaming discovery (VERDICT r03): identical on
    # every path combination, nothing pinned
    assert fast == run(streaming_discovery=True)
    assert fast == run(streaming_discovery=True, max_driver_winners=0)
    assert fast == run(streaming_discovery=True, max_driver_winners=0,
                       max_broadcast_losers=0)
    by_id = {d: (t, n) for d, t, n in fast}
    assert by_id[10][1] == 0 and by_id[11][1] == 1 and by_id[12][1] == 1
    assert dup not in by_id[11][0] and dup not in by_id[12][0]


def test_global_row_number():
    """Global ROW_NUMBER: dense 1..N under the total order, null order
    rows excluded, stable across partitioning and bucket widths."""
    import ray.data

    from dataguards_ray.aggregates import global_row_number

    rows = [{"id": i, "v": (i * 37) % 101} for i in range(200)]
    rows[7]["v"] = None  # excluded
    expected = [r["id"] for r in sorted(
        (r for r in rows if r["v"] is not None),
        key=lambda r: (r["v"], r["id"]))]

    for bw in (1, 13, None):
        ds = ray.data.from_items(rows).repartition(5)
        out = global_row_number(ds, ["v", "id"], bucket_width=bw).take_all()
        got = [r["id"] for r in sorted(out, key=lambda r: r["rn"])]
        assert [r["rn"] for r in sorted(out, key=lambda r: r["rn"])] == \
            list(range(1, len(expected) + 1))
        assert got == expected, bw


def test_table_diff_statuses_and_nulls():
    """table_diff: added/removed/changed classification, IS DISTINCT
    FROM null semantics, equal rows dropped, null keys never match."""
    import ray.data

    from dataguards_ray.joins import table_diff

    L = [
        {"k": 1, "v": 10}, {"k": 2, "v": 20}, {"k": 3, "v": None},
        {"k": 4, "v": 40}, {"k": None, "v": 0},
    ]
    R = [
        {"k": 1, "v": 10},           # equal -> dropped
        {"k": 2, "v": 21},           # changed (value)
        {"k": 3, "v": 30},           # changed (null -> value)
        {"k": 5, "v": 50},           # added
        {"k": None, "v": 0},         # null key -> added
    ]                                # k=4 -> removed; L null key -> removed
    out = table_diff(ray.data.from_items(L).repartition(2),
                     ray.data.from_items(R).repartition(3), "k")
    got = sorted((r["k"] if r["k"] is not None else -99, r["status"])
                 for r in out.take_all())
    assert got == [(-99, "added"), (-99, "removed"), (2, "changed"),
                   (3, "changed"), (4, "removed"), (5, "added")]


def test_approx_quantile_hist_error_bound():
    """Histogram quantile sketch: within one bucket width of the exact
    quantile_disc value, exact at q=1, [] on all-null, and
    partition-invariant."""
    import ray.data

    from dataguards_ray.aggregates import approx_quantile_hist

    vals = [((i * 131) % 997) / 7.0 for i in range(5000)]
    rows = ([{"v": v} for v in vals] + [{"v": None}] * 20
            + [{"v": float("nan")}] * 5)  # NaN ignored like NULL
    qs = [0.01, 0.5, 0.9, 0.99, 1.0]
    ds = ray.data.from_items(rows).repartition(7)
    got = approx_quantile_hist(ds, "v", qs, n_buckets=1024)
    width = (max(vals) - min(vals)) / 1024
    sv = sorted(vals)
    import math
    for q, g in zip(qs, got):
        exact = sv[max(1, math.ceil(q * len(sv))) - 1]
        assert abs(g - exact) <= width + 1e-9, (q, g, exact)
    assert got[-1] == max(vals)
    got2 = approx_quantile_hist(ray.data.from_items(rows).repartition(1),
                                "v", qs, n_buckets=1024)
    assert got == got2
    assert approx_quantile_hist(
        ray.data.from_items([{"v": None}] * 5), "v", [0.5]) == []


def test_randomized_differential_batch4_ops():
    """Seeded-random differential test vs DuckDB for the batch-4 family:
    grouped FIRST/LAST_VALUE, global ROW_NUMBER, interval-overlap join,
    and table_diff — negatives, NULLs, ties, skewed groups."""
    import duckdb
    import ray.data

    from dataguards_ray.aggregates import (global_row_number,
                                           grouped_first_last, grouped_rank)
    from dataguards_ray.events import range_sum
    from dataguards_ray.joins import interval_join, table_diff

    for seed in (11, 43):
        rng = np.random.default_rng(seed)
        n = 300
        g = rng.choice(["a", "b", "c"], size=n, p=[0.7, 0.2, 0.1])
        ts = rng.integers(-500, 500, size=n)
        tbl = pa.table({
            "g": pa.array(g),
            "rid": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array([None if rng.random() < 0.1 else int(v)
                            for v in ts], type=pa.int64()),
            "v": pa.array([None if rng.random() < 0.1 else f"s{int(v) % 7}"
                           for v in ts], type=pa.string()),
        })
        con = duckdb.connect()
        con.register("t", tbl)
        ds = ray.data.from_arrow(tbl).repartition(5)

        # FIRST/LAST_VALUE over (ts, rid), null-ts rows excluded
        got = {(r["g"], r["f"], r["l"]) for r in grouped_first_last(
            ds, "g", ["ts", "rid"], "v", first_name="f", last_name="l"
        ).take_all()}
        want = {tuple(r) for r in con.sql("""
            SELECT DISTINCT g, FIRST_VALUE(v) OVER w, LAST_VALUE(v) OVER w
            FROM t WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY g ORDER BY ts, rid
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """).fetchall()}
        assert got == want, ("first_last", seed)

        # global ROW_NUMBER over (ts, rid)
        for bw in (3, None):
            got = {(r["rid"], r["rn"]) for r in global_row_number(
                ds, ["ts", "rid"], bucket_width=bw).take_all()}
            want = {tuple(r) for r in con.sql("""
                SELECT rid, CAST(ROW_NUMBER() OVER (ORDER BY ts, rid)
                  AS BIGINT) FROM t WHERE ts IS NOT NULL""").fetchall()}
            assert got == want, ("row_number", seed, bw)

        # interval-overlap join: [ts, ts+w] per side, well-formed only
        iv = con.sql("""
            SELECT g, rid, ts AS s, ts + 40 AS e FROM t
            WHERE ts IS NOT NULL""").arrow()
        jv = con.sql("""
            SELECT g, rid AS rid_b, ts AS s, ts + 25 AS e FROM t
            WHERE ts IS NOT NULL""").arrow()
        got = {(r["rid"], r["rid_b"]) for r in interval_join(
            ray.data.from_arrow(iv).repartition(4),
            ray.data.from_arrow(jv).repartition(3),
            key="g", left_start="s", left_end="e",
            right_start="s", right_end="e", bucket_us=17,
        ).take_all()}
        want = {tuple(r) for r in con.sql("""
            SELECT a.rid, b.rid FROM t a JOIN t b ON a.g = b.g
            WHERE a.ts IS NOT NULL AND b.ts IS NOT NULL
              AND a.ts <= b.ts + 25 AND b.ts <= a.ts + 40""").fetchall()}
        assert got == want, ("interval_join", seed)

        # table_diff vs a mutated copy (key = rid, compare v)
        mut = con.sql("""
            SELECT rid, CASE WHEN rid % 5 = 0 THEN 'CHANGED' ELSE v END AS v
            FROM t WHERE rid % 7 <> 0
            UNION ALL SELECT rid + 1000, v FROM t WHERE rid % 9 = 0
        """).arrow()
        got = {(r["rid"], r["status"]) for r in table_diff(
            ray.data.from_arrow(tbl.select(["rid", "v"])).repartition(3),
            ray.data.from_arrow(mut).repartition(4), "rid").take_all()}
        con.register("m", mut)
        want = {tuple(r) for r in con.sql("""
            SELECT COALESCE(t.rid, m.rid),
                   CASE WHEN m.rid IS NULL THEN 'removed'
                        WHEN t.rid IS NULL THEN 'added'
                        ELSE 'changed' END
            FROM t FULL OUTER JOIN m ON t.rid = m.rid
            WHERE m.rid IS NULL OR t.rid IS NULL
               OR t.v IS DISTINCT FROM m.v""").fetchall()}
        assert got == want, ("table_diff", seed)

        # RANK with gaps (ties from ts % 50, DESC NULLS LAST)
        rtbl = con.sql("SELECT g, rid, ts % 50 AS b FROM t").arrow()
        got = {(r["g"], r["rid"], r["rnk"]) for r in grouped_rank(
            ray.data.from_arrow(rtbl).repartition(4), ["g"], "b").take_all()}
        want = {tuple(r) for r in con.sql("""
            SELECT g, rid, CAST(RANK() OVER (
              PARTITION BY g ORDER BY ts % 50 DESC) AS BIGINT)
            FROM t""").fetchall()}
        assert got == want, ("rank_gaps", seed)

        # time-RANGE moving sum with peer rows (duplicate ts)
        etbl = con.sql("""
            SELECT g AS user_id, rid AS event_id, ts % 60 AS ts,
                   CAST(ts AS DOUBLE)/7 AS value FROM t""").arrow()
        con.register("etbl", etbl)
        got = {(r["user_id"], r["event_id"], r["range_cents"])
               for r in range_sum(
                   ray.data.from_arrow(etbl).repartition(4),
                   range_us=10).take_all()}
        want = {tuple(r) for r in con.sql("""
            SELECT user_id, event_id,
                   CAST(SUM(CAST(FLOOR(COALESCE(value,0)*100+0.5) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts
                           RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)
                     AS BIGINT)
            FROM (SELECT user_id, event_id, ts, value
                  FROM etbl WHERE ts IS NOT NULL)""").fetchall()}
        assert got == want, ("range_sum", seed)

        # grouped MAD (negatives, nulls, discrete-median both passes)
        from dataguards_ray.aggregates import grouped_mad

        got = {(r["g"], r["mad"]) for r in grouped_mad(
            ray.data.from_arrow(tbl.select(["g", "ts"])).repartition(4),
            ["g"], "ts", "mad").take_all()}
        want = {tuple(r) for r in con.sql("""
            WITH m AS (SELECT g, quantile_disc(ts, 0.5) AS med
                       FROM t GROUP BY g)
            SELECT t.g, CAST(quantile_disc(abs(ts - m.med), 0.5) AS BIGINT)
            FROM t JOIN m ON m.g = t.g GROUP BY t.g""").fetchall()}
        assert got == want, ("mad", seed)
        con.close()


def test_embedding_dedup_filter_components():
    """Embedding dedup: transitive components collapse to the min id
    (a~b, b~c but a!~c still drops both b and c); isolated vectors
    survive; driver and distributed paths identical."""
    import ray.data

    from dataguards_ray.similarity import embedding_dedup_filter

    rows = [
        {"vec_id": 1, "embedding": [1.0, 0.0, 0.0]},
        {"vec_id": 2, "embedding": [0.96, 0.28, 0.0]},   # ~ 1 (cos .96)
        {"vec_id": 3, "embedding": [0.85, 0.53, 0.0]},   # ~ 2, not ~ 1 at .95
        {"vec_id": 4, "embedding": [0.0, 0.0, 1.0]},     # isolated
    ]

    def run(**kw):
        ds = ray.data.from_items(rows).repartition(2)
        return sorted(r["vec_id"] for r in
                      embedding_dedup_filter(ds, 0.95, **kw).take_all())

    assert run() == [1, 4]
    assert run(distributed=True) == [1, 4]


def test_compression_ratio_signal():
    """zlib repetition signal: repetitive text compresses far below
    prose, empty -> NULL, deterministic across partitioning."""
    import ray.data

    from dataguards_ray.textstats import compression_ratios

    prose = ("The quick brown fox jumps over seventeen lazy dogs while "
             "unusual zebras quietly examine fjords beyond the valley.")
    rows = [
        {"doc_id": 1, "text": prose * 2},
        {"doc_id": 2, "text": "spam " * 50},
        {"doc_id": 3, "text": ""},
    ]

    def run(n):
        ds = ray.data.from_items(rows).repartition(n)
        return {r["doc_id"]: r["compression_ratio"]
                for r in compression_ratios(ds).take_all()}

    out = run(3)
    assert out[3] is None
    assert 0.0 < out[2] < out[1] < 1.0  # repetitive compresses far below prose
    assert out == run(1)


def test_exact_dedup_keep_by():
    """keep_by winner: best value wins, NULLs lose, ties break to min
    id; default (min id) unchanged."""
    import ray.data

    from dataguards_ray.neardup import exact_dedup_filter

    rows = [
        {"doc_id": 1, "text": "same", "q": 5.0},
        {"doc_id": 2, "text": "same", "q": 9.0},   # best q -> wins
        {"doc_id": 3, "text": "same", "q": None},  # null loses
        {"doc_id": 4, "text": "other", "q": 1.0},
        {"doc_id": 5, "text": "tied", "q": 2.0},
        {"doc_id": 6, "text": "tied", "q": 2.0},   # tie -> min id (5)
    ]
    ds = ray.data.from_items(rows).repartition(3)
    best = sorted(r["doc_id"] for r in exact_dedup_filter(
        ds, keep_by=("q", True)).take_all())
    assert best == [2, 4, 5]
    default = sorted(r["doc_id"] for r in exact_dedup_filter(ds).take_all())
    assert default == [1, 4, 5]


def test_asof_join_forward_semantics():
    """Forward as-of: earliest right with ts >= left ts (inclusive),
    unmatched -> null, per-key isolation, negative timestamps safe."""
    import ray.data

    from dataguards_ray.joins import asof_join_forward

    L = [{"k": 1, "lid": 1, "ts": -50}, {"k": 1, "lid": 2, "ts": 10},
         {"k": 1, "lid": 3, "ts": 100}, {"k": 2, "lid": 4, "ts": 0}]
    R = [{"k": 1, "rid": 7, "ts": -50},   # ties with lid1 (inclusive)
         {"k": 1, "rid": 8, "ts": 60},    # next after lid2
         {"k": 2, "rid": 9, "ts": -5}]    # before lid4 -> no match
    out = asof_join_forward(
        ray.data.from_items(L).repartition(2),
        ray.data.from_items(R).repartition(2), key="k", ts_col="ts")
    got = {r["lid"]: r["rid_r"] if "rid_r" in r else r["rid"]
           for r in out.take_all()}
    assert got == {1: 7, 2: 8, 3: None, 4: None}


def test_interval_join_edges():
    """Empty side -> no rows (no crash); degenerate hot bucket trips the
    max_group_pairs guard instead of OOMing a task."""
    import pytest
    import ray.data

    from dataguards_ray.joins import interval_join

    L = [{"k": 1, "lid": i, "s": 0, "e": 5} for i in range(40)]
    empty = ray.data.from_items(L).filter(expr="lid > 1000")
    out = interval_join(
        ray.data.from_items(L).repartition(2), empty,
        key="k", left_start="s", left_end="e",
        right_start="s", right_end="e", bucket_us=10)
    assert out.take_all() == []

    hot = interval_join(
        ray.data.from_items(L).repartition(2),
        ray.data.from_items(L).repartition(2),
        key="k", left_start="s", left_end="e",
        right_start="s", right_end="e", bucket_us=10, max_group_pairs=100)
    with pytest.raises(Exception, match="max_group_pairs"):
        hot.take_all()


def test_funnel_ordered_depth():
    """Funnel: stages must occur in order (a later-stage event BEFORE
    the prior stage doesn't count), the conversion window caps each
    step, depth 0 when stage 1 absent; partition-invariant."""
    import ray.data

    from dataguards_ray.events import funnel

    rows = [
        # u1: view@10 -> click@20 -> purchase@25 = depth 3
        {"user_id": 1, "event_id": 1, "ts": 10, "event_type": "view"},
        {"user_id": 1, "event_id": 2, "ts": 20, "event_type": "click"},
        {"user_id": 1, "event_id": 3, "ts": 25, "event_type": "purchase"},
        # u2: click BEFORE view only -> depth 1 (view@30, no later click)
        {"user_id": 2, "event_id": 4, "ts": 5, "event_type": "click"},
        {"user_id": 2, "event_id": 5, "ts": 30, "event_type": "view"},
        # u3: click too late for the window -> depth 1
        {"user_id": 3, "event_id": 6, "ts": 0, "event_type": "view"},
        {"user_id": 3, "event_id": 7, "ts": 500, "event_type": "click"},
        # u4: no view at all -> depth 0
        {"user_id": 4, "event_id": 8, "ts": 1, "event_type": "purchase"},
    ]

    def run(n):
        ds = ray.data.from_items(rows).repartition(n)
        return {r["user_id"]: r["depth"] for r in funnel(
            ds, ["view", "click", "purchase"], within_us=100).take_all()}

    out = run(3)
    assert out == {1: 3, 2: 1, 3: 1, 4: 0}
    assert out == run(1)


def test_grouped_mad_semantics():
    """MAD: median(|x - median|) with discrete-median (lower) semantics,
    nulls ignored, all-null group -> null; partition-invariant."""
    import ray.data

    from dataguards_ray.aggregates import grouped_mad

    rows = ([{"g": "a", "v": v} for v in (1, 2, 4, 100)]   # med 2, devs 1,0,2,98 -> mad 1
            + [{"g": "b", "v": 7}]                          # single -> mad 0
            + [{"g": "c", "v": None}, {"g": "c", "v": None}])

    def run(n):
        ds = ray.data.from_items(rows).repartition(n)
        return {r["g"]: r["mad"] for r in grouped_mad(
            ds, ["g"], "v", "mad").take_all()}

    out = run(3)
    assert out == {"a": 1, "b": 0, "c": None}
    assert out == run(1)


def test_exact_dedup_null_text_and_string_ids():
    """Regression: exact dedup with STRING ids and NULL text/ids must
    not crash Ray's sort groupby (encoded fingerprint key) nor numpy id
    comparison; null texts form ONE group (SQL GROUP BY md5(text)),
    null ids lose."""
    import ray.data

    from dataguards_ray.neardup import exact_dedup_filter

    rows = [
        {"doc_id": "b", "text": "same"},
        {"doc_id": "a", "text": "same"},     # min string id wins
        {"doc_id": "x", "text": None},
        {"doc_id": None, "text": None},      # null id loses
        {"doc_id": "z", "text": "unique"},
    ]
    ds = ray.data.from_items(rows).repartition(3)
    got = sorted(str(r["doc_id"]) for r in exact_dedup_filter(ds).take_all())
    assert got == ["a", "x", "z"]


def test_near_dup_no_evidence_docs_never_pair():
    """Docs with no shingles (empty/short text) or no tokens share the
    sentinel MinHash signature / zero SimHash — they carry no similarity
    evidence and must emit NO candidate pairs (previously every empty
    doc 'matched' every other one)."""
    import ray.data

    from dataguards_ray.neardup import (minhash_pair_candidates,
                                        simhash_pair_candidates)

    long_a = "a genuinely long duplicated document body with many words. " * 3
    rows = [
        {"doc_id": 1, "text": long_a},
        {"doc_id": 2, "text": long_a},        # true near-dup pair
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": None},
        {"doc_id": 5, "text": "tiny"},        # < shingle window
    ]
    ds = ray.data.from_items(rows).repartition(2)
    mh = {(r["id_a"], r["id_b"]) for r in minhash_pair_candidates(
        ds, threshold=0.5).take_all()}
    assert mh == {(1, 2)}
    sh = {(r["id_a"], r["id_b"]) for r in simhash_pair_candidates(
        ds, max_hamming=3).take_all()}
    assert (1, 2) in sh and all(a not in (3, 4) and b not in (3, 4)
                                for a, b in sh)


def test_embedding_dedup_lsh_matches_exact():
    """Round-3 verdict item #1: the LSH discovery path must yield the
    same survivor set as the exact all-pairs path on a corpus with
    planted high-cosine duplicates (LSH recall at cos>=0.998 with
    8 planes x 12 tables is ~1 - 1e-10; seed is fixed so the outcome
    is deterministic)."""
    import ray.data

    from dataguards_ray.similarity import embedding_dedup_filter

    rng = np.random.RandomState(7)
    n, d = 200, 16
    V = rng.standard_normal((n, d))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    # planted near-identical groups: (10,190,191) and (50,192)
    for src, dst in [(10, 190), (10, 191), (50, 192)]:
        V[dst] = V[src] + rng.standard_normal(d) * 1e-3
    tbl = pa.table(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": pa.array(V.tolist(), type=pa.list_(pa.float64()))}
    )

    def run(**kw):
        ds = ray.data.from_arrow(tbl).repartition(4)
        out = embedding_dedup_filter(ds, 0.998, **kw)
        return sorted(r["vec_id"] for r in out.take_all())

    exact = run(discovery="exact")
    lsh = run(discovery="lsh", n_planes=8, n_tables=12)
    assert exact == lsh
    assert 190 not in exact and 191 not in exact and 192 not in exact
    assert 10 in exact and 50 in exact and len(exact) == n - 3


def test_embedding_dedup_auto_switches_to_lsh():
    """auto discovery must flip to the LSH path above max_exact_vectors
    (here forced tiny) and still resolve the planted component."""
    import ray.data

    from dataguards_ray.similarity import embedding_dedup_filter

    rng = np.random.RandomState(11)
    n, d = 64, 12
    V = rng.standard_normal((n, d))
    V[63] = V[5] * 2.0  # exact duplicate direction (cos = 1)
    tbl = pa.table(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": pa.array(V.tolist(), type=pa.list_(pa.float64()))}
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    out = embedding_dedup_filter(
        ds, 0.999, discovery="auto", max_exact_vectors=8,
        n_planes=8, n_tables=12,
    )
    got = sorted(r["vec_id"] for r in out.take_all())
    assert 63 not in got and 5 in got and len(got) == n - 1


def test_ivf_train_capped_sample():
    """Round-3 verdict item #2: ivf_train must bound its driver pull.
    With max_train_vectors far below the corpus size the derived
    sample_mod kicks in, and the trained index still recalls the
    well-separated clusters."""
    import ray.data

    from dataguards_ray.similarity import ivf_assign, ivf_knn, ivf_train, knn_cosine

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((4, 8)) * 5
    V = np.vstack([c + rng.standard_normal((500, 8)) * 0.3 for c in centers])
    tbl = pa.table(
        {"vec_id": np.arange(len(V), dtype=np.int64),
         "embedding": pa.array(V.tolist(), type=pa.list_(pa.float32()))}
    )
    ds = ray.data.from_arrow(tbl).repartition(4).materialize()
    cents = ivf_train(ds, 4, max_train_vectors=128)  # 2000 vectors -> mod 16
    cells = [r["cluster"] for r in ivf_assign(ds, cents).take_all()]
    assert len(set(cells)) == 4
    queries = V[[0, 500, 1000, 1500]]
    exact = knn_cosine(ds, queries, 5)
    approx = ivf_knn(ds, cents, queries, 5, nprobe=1)
    e = set(zip(exact.column("query_id").to_pylist(), exact.column("vec_id").to_pylist()))
    a = set(zip(approx.column("query_id").to_pylist(), approx.column("vec_id").to_pylist()))
    assert len(e & a) / len(e) >= 0.95


def test_span_dedup_fallback_duplicate_doc_ids():
    """ADVICE r02 item #3: duplicated doc_ids must yield identical
    output on the broadcast fast path and the cogroup fallback — one
    output row PER input row on both."""
    import ray.data

    from dataguards_ray.spandedup import span_dedup

    body = ("First unique sentence alpha. Second unique sentence beta. "
            "Third unique sentence gamma. ")
    dup = ("Copied sentence one here. Copied sentence two here. "
           "Copied sentence three here. ")
    rows = [
        {"doc_id": 1, "text": body + dup},
        {"doc_id": 2, "text": dup + "And a trailing original sentence."},
        {"doc_id": 2, "text": dup + "And a trailing original sentence."},  # dup id
    ]

    def run(**kw):
        ds = ray.data.from_items(rows).repartition(2)
        return sorted(
            (r["doc_id"], r["text"], r["n_spans_removed"])
            for r in span_dedup(ds, **kw).take_all()
        )

    fast = run()
    fallback = run(max_broadcast_losers=0)
    assert fast == fallback
    assert len(fast) == 3  # one row per input row, duplicate id kept twice
    assert [d for d, _, _ in fast] == [1, 2, 2]


def test_add_simhash_output_schema_unchanged():
    """ADVICE r02 item #4: add_simhash is a public feature transform —
    output schema must be input + the simhash column, nothing else."""
    import ray.data

    from dataguards_ray.neardup import add_simhash

    ds = ray.data.from_items([{"doc_id": 1, "text": "hello world"}])
    out = add_simhash(ds, text_col="text")
    assert set(out.schema().names) == {"doc_id", "text", "simhash"}
    internal = add_simhash(ds, text_col="text", emit_ntok=True)
    assert set(internal.schema().names) == {"doc_id", "text", "simhash", "__ntok"}


def test_global_row_number_degenerate_lead_guard():
    """ADVICE r02 item #2 + r03 revision: a constant leading order
    column collapses all rows into one range bucket.  Default: warn but
    still number correctly (skew is slow, not wrong); strict=True fails
    fast above guard_rows."""
    import pytest as _pytest
    import ray.data

    from dataguards_ray.aggregates import global_row_number

    n = 20_000
    tbl = pa.table({"v": np.zeros(n, dtype=np.int64),
                    "id": np.arange(n, dtype=np.int64)})
    ds = ray.data.from_arrow(tbl).repartition(4)
    with _pytest.raises(ValueError, match="spread"):
        global_row_number(ds, ["v", "id"], guard_rows=10_000,
                          strict=True).take_all()
    # default (non-strict) warns and still numbers correctly
    out = global_row_number(ds, ["v", "id"], guard_rows=10_000).take_all()
    assert sorted(r["rn"] for r in out) == list(range(1, n + 1))


def test_dedup_job_pruned_two_read(tmp_path):
    """VERDICT r02 #7: with payload columns present the job discovers
    winners over a column-pruned read and drops losers from the full
    read — output must carry the payload and match the single-read
    library result exactly (incl. the NULL-text group)."""
    import pyarrow.parquet as pq
    import ray.data

    from dataguards_ray.neardup import exact_dedup_filter, exact_dedup_filter_pruned
    from jobs.dedup_job import run_dedup_job

    rows = [
        {"doc_id": 5, "text": "aaa", "payload": "p5", "m": 1},
        {"doc_id": 2, "text": "aaa", "payload": "p2", "m": 2},
        {"doc_id": 3, "text": "bbb", "payload": "p3", "m": 3},
        {"doc_id": 9, "text": "aaa", "payload": "p9", "m": 4},
        {"doc_id": 7, "text": None, "payload": "p7", "m": 5},
        {"doc_id": 8, "text": None, "payload": "p8", "m": 6},
    ]
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(src / "p.parquet"))

    res = run_dedup_job(str(src), str(tmp_path / "out"), mode="exact")
    assert res["input_rows"] == 6 and res["kept_rows"] == 3
    back = sorted(
        (r["doc_id"], r["payload"], r["m"])
        for r in ray.data.read_parquet(str(tmp_path / "out")).take_all()
    )
    assert back == [(2, "p2", 2), (3, "p3", 3), (7, "p7", 5)]

    # library-level parity: pruned two-read == one-shuffle exact filter
    thin = ray.data.read_parquet(str(src), columns=["doc_id", "text"])
    full = ray.data.read_parquet(str(src))
    a = sorted(r["doc_id"] for r in exact_dedup_filter_pruned(
        thin, full).take_all())
    b = sorted(r["doc_id"] for r in exact_dedup_filter(full).take_all())
    assert a == b == [2, 3, 7]

    # null ids → falls back to the single-read path, still correct
    rows_null = [
        {"doc_id": None, "text": "zzz", "payload": "x"},
        {"doc_id": 1, "text": "zzz", "payload": "y"},
        {"doc_id": 4, "text": "www", "payload": "z"},
    ]
    src2 = tmp_path / "in2"
    src2.mkdir()
    pq.write_table(pa.Table.from_pylist(rows_null), str(src2 / "p.parquet"))
    res2 = run_dedup_job(str(src2), str(tmp_path / "out2"), mode="exact")
    assert res2["kept_rows"] == 2  # null id LOSES to id=1 in the zzz group


def test_dedup_job_pruned_minhash_string_ids(tmp_path):
    """Pruned minhash path with string ids: the deterministic __nid is
    derived identically on the thin and full reads, so losers found on
    the pruned read are dropped from the payload-bearing read."""
    import pyarrow.parquet as pq
    import ray.data

    from jobs.dedup_job import run_dedup_job

    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [
        {"uid": "u-one", "text": base, "payload": "keepme1"},
        {"uid": "u-two", "text": base + " tail", "payload": "keepme2"},
        {"uid": "u-three", "text": "entirely different content here " * 20,
         "payload": "keepme3"},
    ]
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(src / "p.parquet"))
    res = run_dedup_job(str(src), str(tmp_path / "out"), mode="minhash",
                        threshold=0.5, id_col="uid")
    assert res["input_rows"] == 3 and res["kept_rows"] == 2
    surv = ray.data.read_parquet(str(tmp_path / "out"))
    assert "__nid" not in surv.schema().names
    kept = {r["uid"]: r["payload"] for r in surv.take_all()}
    assert kept.get("u-three") == "keepme3" and len(kept) == 2


def test_incremental_dedup_against_prior(tmp_path):
    """VERDICT r02 missing #4: dedup a new crawl AGAINST a prior run's
    output via its thin manifest.  With ids monotone across runs the
    incremental survivors (prior ∪ new) must row-equal the single-shot
    run over both corpora — exact and minhash modes."""
    import pyarrow.parquet as pq
    import ray.data

    from jobs.dedup_job import run_dedup_job

    base = "the quick brown fox jumps over the lazy dog again and again " * 15
    other = "completely unrelated body of text about gardening tips " * 15
    third = "a third distinct document concerning maritime law details " * 15
    corpus_a = [
        {"doc_id": 1, "text": base, "m": "a1"},
        {"doc_id": 2, "text": base, "m": "a2"},          # internal exact dup
        {"doc_id": 3, "text": other, "m": "a3"},
    ]
    corpus_b = [
        {"doc_id": 11, "text": base, "m": "b1"},          # cross-run exact dup
        {"doc_id": 12, "text": other + " tail words", "m": "b2"},  # cross near-dup
        {"doc_id": 13, "text": third, "m": "b3"},
        {"doc_id": 14, "text": third, "m": "b4"},         # internal exact dup
    ]

    def write(rows, name):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "p.parquet"))
        return str(d)

    src_a = write(corpus_a, "a")
    src_b = write(corpus_b, "b")
    src_ab = write(corpus_a + corpus_b, "ab")

    def ids_of(out_dir):
        return sorted(r["doc_id"]
                      for r in ray.data.read_parquet(out_dir).take_all())

    for mode, thr in (("exact", 0.8), ("minhash", 0.5)):
        out_a = str(tmp_path / f"{mode}_outa")
        out_b = str(tmp_path / f"{mode}_outb")
        out_s = str(tmp_path / f"{mode}_outs")
        run_dedup_job(src_a, out_a, mode=mode, threshold=thr)
        res = run_dedup_job(src_b, out_b, mode=mode, threshold=thr,
                            against=out_a)
        single = run_dedup_job(src_ab, out_s, mode=mode, threshold=thr)
        assert ids_of(out_a) + ids_of(out_b) == ids_of(out_s), mode
        assert res["against"] == out_a
    # exact: cross-run dup 11 and internal loser 14 dropped from B
    assert ids_of(str(tmp_path / "exact_outb")) == [12, 13]
    # minhash at 0.5 also drops the cross-run NEAR dup 12
    assert ids_of(str(tmp_path / "minhash_outb")) == [13]

    # chained incremental: C against B's output alone must still know
    # about corpus A (manifests merge forward)
    corpus_c = [{"doc_id": 21, "text": base, "m": "c1"},
                {"doc_id": 22, "text": "fresh new content entirely " * 15,
                 "m": "c2"}]
    src_c = write(corpus_c, "c")
    out_c = str(tmp_path / "exact_outc")
    run_dedup_job(src_c, out_c, mode="exact",
                  against=str(tmp_path / "exact_outb"))
    assert ids_of(out_c) == [22]  # 21 duplicates corpus A's base text


def test_token_segments_invariant():
    from dataguards_ray.spandedup import token_segments

    for t in ["", "  ", "a", " a b  c ", "one\ntwo\t three\n",
              "\n\nlead", "tail  ", "x"]:
        assert "".join(token_segments(t)) == t, repr(t)


def _oracle_substring_dedup(rows, window):
    """Single-threaded scalar reference of the frozen substring-dedup
    spec: normalized token windows, global-first-occurrence winner,
    union-of-losing-windows surgery."""
    from dataguards_ray.spandedup import token_segments

    occ = {}
    for did, text in sorted(rows):
        segs = token_segments(text or "")
        norm = [" ".join(s.split()).lower() for s in segs]
        for i in range(len(segs) - window + 1):
            key = " ".join(norm[i:i + window]).strip()
            if not key:
                continue
            occ.setdefault(key, []).append((did, i))
    losers = {}
    for lst in occ.values():
        if len(lst) < 2:
            continue
        lst.sort()
        for did, st in lst[1:]:
            losers.setdefault(did, set()).add(st)
    out = []
    for did, text in rows:
        segs = token_segments(text or "")
        drop = [False] * len(segs)
        sts = sorted(losers.get(did, ()))
        for s in sts:
            for j in range(s, min(s + window, len(segs))):
                drop[j] = True
        out.append((did, "".join(s for s, d in zip(segs, drop) if not d),
                    len(sts)))
    return sorted(out)


def test_substring_dedup_matches_scalar_oracle():
    """VERDICT r02 missing #5 / stretch #9: exact substring dedup (Lee
    et al. 2022) — distributed surgery must reproduce the scalar oracle
    byte-identically on both resolution paths."""
    import ray.data

    from dataguards_ray.spandedup import substring_dedup

    rep = ("shared boilerplate sentence number %d with several words here. "
           % 1) * 4  # ~40 tokens of repeated region
    long_rep = " ".join(f"tok{i % 7} common run" for i in range(40))  # 120 toks
    rows = [
        (1, "unique opening text for document one. " * 3 + long_rep),
        (2, long_rep + " plus an entirely different tail for doc two. " * 3),
        (3, " ".join(f"distinct{i} word{i * 3 + 1}" for i in range(40)) + "."),
        (4, rep + " and " + rep),  # within-doc repeat (region < window? 40*4 toks)
        (5, ""),
    ]
    window = 20
    expected = _oracle_substring_dedup(rows, window)

    def run(**kw):
        ds = ray.data.from_items(
            [{"doc_id": d, "text": t} for d, t in rows]).repartition(3)
        got = substring_dedup(ds, window=window, **kw).take_all()
        return sorted((r["doc_id"], r["text"], r["n_spans_removed"])
                      for r in got)

    assert run() == expected
    # cogroup fallback path must agree byte-for-byte
    assert run(max_broadcast_losers=0) == expected
    # docs untouched by dedup pass through byte-identical
    assert [t for d, t, n in expected if d == 3][0] == rows[2][1]
    # the cross-doc long repeated region was removed from doc 2
    doc2 = [t for d, t, n in expected if d == 2][0]
    assert "different tail for doc two" in doc2
    assert len(doc2) < len(rows[1][1])


def test_substring_dedup_job_mode(tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from jobs.dedup_job import run_dedup_job

    body = " ".join(f"w{i} filler token" for i in range(60))
    rows = [{"doc_id": 1, "text": "intro words here. " + body},
            {"doc_id": 2, "text": body + " outro words here."},
            {"doc_id": 3, "text": "independent short doc."}]
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(src / "p.parquet"))
    res = run_dedup_job(str(src), str(tmp_path / "out"), mode="substring",
                        window=25)
    assert res["kept_rows"] == 3 and res["spans_removed"] > 0
    back = {r["doc_id"]: r for r in
            ray.data.read_parquet(str(tmp_path / "out")).take_all()}
    assert back[1]["text"] == rows[0]["text"]  # first occurrence intact
    assert len(back[2]["text"]) < len(rows[1]["text"])
    assert back[3]["text"] == rows[2]["text"]
    # streaming discovery (recompute-twice, nothing pinned): byte-equal
    res2 = run_dedup_job(str(src), str(tmp_path / "out2"), mode="substring",
                         window=25, streaming_discovery=True)
    assert res2["kept_rows"] == 3 and res2["spans_removed"] == res["spans_removed"]
    back2 = {r["doc_id"]: r for r in
             ray.data.read_parquet(str(tmp_path / "out2")).take_all()}
    assert all(back2[d]["text"] == back[d]["text"] for d in (1, 2, 3))


def test_dedup_job_embedding_mode(tmp_path):
    """dg dedup --mode embedding: cosine near-dup survivors with payload
    intact; string ids ride the deterministic __nid derivation."""
    import pyarrow.parquet as pq
    import ray.data

    rows = [
        {"uid": "a", "embedding": [1.0, 0.0, 0.0], "m": 1},
        {"uid": "b", "embedding": [0.999, 0.01, 0.0], "m": 2},   # dup of a
        {"uid": "c", "embedding": [0.0, 1.0, 0.0], "m": 3},
        {"uid": "d", "embedding": [0.0, 0.0, 1.0], "m": 4},
    ]
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(src / "p.parquet"))

    from jobs.dedup_job import run_dedup_job

    res = run_dedup_job(str(src), str(tmp_path / "out"), mode="embedding",
                        threshold=0.95, id_col="uid")
    assert res["input_rows"] == 4 and res["kept_rows"] == 3
    surv = ray.data.read_parquet(str(tmp_path / "out"))
    assert "__nid" not in surv.schema().names
    kept = {r["uid"]: r["m"] for r in surv.take_all()}
    assert set(kept) in ({"a", "c", "d"}, {"b", "c", "d"})
    assert kept.get("c") == 3 and kept.get("d") == 4


def test_incremental_embedding_dedup_against_prior(tmp_path):
    """--against for embedding mode: new vectors near-duplicating the
    prior run's survivors are dropped via the vector manifest; with
    monotone ids the incremental union row-equals the single-shot run."""
    import pyarrow.parquet as pq
    import ray.data

    from jobs.dedup_job import run_dedup_job

    a = [{"doc_id": 1, "embedding": [1.0, 0.0, 0.0]},
         {"doc_id": 2, "embedding": [0.999, 0.02, 0.0]},   # internal dup
         {"doc_id": 3, "embedding": [0.0, 1.0, 0.0]}]
    b = [{"doc_id": 11, "embedding": [0.998, 0.03, 0.0]},  # cross-run dup of 1
         {"doc_id": 12, "embedding": [0.0, 0.0, 1.0]},
         {"doc_id": 13, "embedding": [0.0, 0.01, 0.999]}]  # internal dup of 12

    def write(rows, name):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "p.parquet"))
        return str(d)

    def ids_of(out_dir):
        return sorted(r["doc_id"]
                      for r in ray.data.read_parquet(out_dir).take_all())

    src_a, src_b, src_ab = write(a, "a"), write(b, "b"), write(a + b, "ab")
    out_a, out_b, out_s = (str(tmp_path / n) for n in ("oa", "ob", "os"))
    run_dedup_job(src_a, out_a, mode="embedding", threshold=0.95)
    run_dedup_job(src_b, out_b, mode="embedding", threshold=0.95,
                  against=out_a)
    run_dedup_job(src_ab, out_s, mode="embedding", threshold=0.95)
    assert ids_of(out_a) == [1, 3]
    assert ids_of(out_b) == [12]
    assert ids_of(out_a) + ids_of(out_b) == ids_of(out_s)


def test_dedup_job_simhash_mode_and_incremental(tmp_path):
    """dg dedup --mode simhash: Hamming-ball near-dup survivors; the
    cross-run manifest is one uint64 per survivor, and --against
    rebuilds prior docs' block buckets from those stored hashes (prior
    text never re-read)."""
    import pyarrow.parquet as pq
    import ray.data

    from jobs.dedup_job import run_dedup_job

    d1 = "the quick brown fox jumps over the lazy dog " * 8
    d2 = "completely different content about container shipping " * 8
    d3 = "a third topic entirely regarding alpine meadow flora " * 8
    a = [{"doc_id": "a1", "text": d1},
         {"doc_id": "a2", "text": d1 + "tail"},   # near-dup of a1
         {"doc_id": "a3", "text": d2}]
    b = [{"doc_id": "b1", "text": d1 + "end"},    # cross-run dup of a1
         {"doc_id": "b2", "text": d3}]

    def write(rows, name):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "p.parquet"))
        return str(d)

    def ids_of(out_dir):
        return sorted(r["doc_id"]
                      for r in ray.data.read_parquet(out_dir).take_all())

    out_a, out_b = str(tmp_path / "oa"), str(tmp_path / "ob")
    res_a = run_dedup_job(write(a, "a"), out_a, mode="simhash",
                          max_hamming=3, partitions=4)
    assert res_a["kept_rows"] == 2 and ids_of(out_a) == ["a1", "a3"]
    # manifest: one (doc_id, h) row per survivor
    man = pq.read_table(out_a + "/_dedup_manifest/simhash")
    assert man.num_rows == 2 and set(man.schema.names) == {"doc_id", "h"}

    res_b = run_dedup_job(write(b, "b"), out_b, mode="simhash",
                          max_hamming=3, partitions=4, against=out_a)
    assert ids_of(out_b) == ["b2"]
    assert res_b["dropped_rows"] == 1

    # geometry change on resume fails loudly
    with pytest.raises(ValueError, match="resume mismatch"):
        run_dedup_job(write(a, "a2dir"), out_a, mode="simhash",
                      max_hamming=2, partitions=4, resume=True)


def test_dedup_job_semdedup_mode(tmp_path):
    """dg dedup --mode semdedup: within-cluster cosine dedup survivors
    with payload intact; string ids ride the __nid derivation."""
    import pyarrow.parquet as pq
    import ray.data

    rows = [
        {"uid": "a", "embedding": [1.0, 0.0, 0.0], "m": 1},
        {"uid": "b", "embedding": [0.999, 0.01, 0.0], "m": 2},   # dup of a
        {"uid": "c", "embedding": [0.0, 1.0, 0.0], "m": 3},
        {"uid": "d", "embedding": [0.0, 0.0, 1.0], "m": 4},
    ]
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(src / "p.parquet"))

    from jobs.dedup_job import run_dedup_job

    res = run_dedup_job(str(src), str(tmp_path / "out"), mode="semdedup",
                        threshold=0.95, id_col="uid", n_clusters=2)
    assert res["input_rows"] == 4 and res["kept_rows"] == 3
    surv = ray.data.read_parquet(str(tmp_path / "out"))
    assert "__nid" not in surv.schema().names
    kept = {r["uid"]: r["m"] for r in surv.take_all()}
    # one of the near-dup pair survives (centroid-closest), c and d stay
    assert set(kept) in ({"a", "c", "d"}, {"b", "c", "d"})
    assert kept.get("c") == 3 and kept.get("d") == 4


def test_incremental_semdedup_against_prior(tmp_path):
    """--against for semdedup: the prior run's centroids are reused
    verbatim (frozen in the manifest), prior survivors always win, and
    a chain only ever needs the LATEST output — a run-C doc duplicating
    a run-A survivor drops with only run-B as --against."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from jobs.dedup_job import run_dedup_job

    rng = np.random.default_rng(11)
    base = rng.normal(size=(12, 8))

    def write(ids, vecs, name):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array(list(ids), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  type=pa.list_(pa.float64()))}),
            str(d / "p.parquet"))
        return str(d)

    def ids_of(out_dir):
        return sorted(r["doc_id"]
                      for r in ray.data.read_parquet(out_dir).take_all())

    jig = 0.0005 * rng.normal(size=8)
    src_a = write(range(12), base, "a")                       # 12 distinct
    src_b = write([100, 101], [base[3] + jig,                 # dup of a3
                               rng.normal(size=8)], "b")      # fresh
    out_a, out_b, out_c = (str(tmp_path / n) for n in ("oa", "ob", "oc"))
    run_dedup_job(src_a, out_a, mode="semdedup", threshold=0.95,
                  n_clusters=3)
    res_b = run_dedup_job(src_b, out_b, mode="semdedup", threshold=0.95,
                          against=out_a)
    assert ids_of(out_a) == list(range(12))
    assert ids_of(out_b) == [101]
    assert res_b["dropped_rows"] == 1

    # centroids are carried forward verbatim
    ca = pq.read_table(
        out_a + "/_dedup_manifest/semdedup_centroids/centroids.parquet")
    cb = pq.read_table(
        out_b + "/_dedup_manifest/semdedup_centroids/centroids.parquet")
    assert ca.equals(cb)

    # chain: a dup of an A-survivor AND a dup of B's fresh survivor both
    # drop with only out_b as --against (manifest is cumulative)
    src_c = write([200, 201, 202],
                  [base[7] + jig,                         # dup of a7
                   np.asarray(pq.read_table(src_b + "/p.parquet")
                              .column("embedding").to_pylist()[1]) + jig,
                   rng.normal(size=8)], "c")
    run_dedup_job(src_c, out_c, mode="semdedup", threshold=0.95,
                  against=out_b)
    assert ids_of(out_c) == [202]

    # changed geometry fails loudly instead of silently mixing
    with pytest.raises(ValueError, match="semdedup-params mismatch"):
        run_dedup_job(src_c, str(tmp_path / "bad"), mode="semdedup",
                      threshold=0.90, against=out_b)
    with pytest.raises(ValueError, match="n-clusters"):
        run_dedup_job(src_c, str(tmp_path / "bad2"), mode="semdedup",
                      threshold=0.95, n_clusters=7, against=out_b)


def test_incremental_dedup_all_new_docs_duplicate_prior(tmp_path):
    """Review r03: --against where EVERY new doc duplicates the prior
    corpus — zero survivors must not crash, and the forward-merged
    manifest must keep the chain alive."""
    import pyarrow.parquet as pq
    import ray.data

    from jobs.dedup_job import run_dedup_job

    base = "repeated body of text for the crash regression " * 10
    a = [{"doc_id": 1, "text": base, "m": 1}]
    b = [{"doc_id": 11, "text": base, "m": 2}]
    c = [{"doc_id": 21, "text": base, "m": 3},
         {"doc_id": 22, "text": "genuinely new content here " * 10, "m": 4}]

    def write(rows, name):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "p.parquet"))
        return str(d)

    out_a, out_b, out_c = (str(tmp_path / n) for n in ("oa", "ob", "oc"))
    run_dedup_job(write(a, "a"), out_a, mode="exact")
    res_b = run_dedup_job(write(b, "b"), out_b, mode="exact", against=out_a)
    assert res_b["kept_rows"] == 0 and res_b["dropped_rows"] == 1
    # chain through the empty run: C against B must still know corpus A
    res_c = run_dedup_job(write(c, "c"), out_c, mode="exact", against=out_b)
    assert res_c["kept_rows"] == 1
    kept = ray.data.read_parquet(out_c).take_all()
    assert [r["doc_id"] for r in kept] == [22]


def test_dedup_job_embedding_null_id_deterministic(tmp_path):
    """Review r03: with a null id among string ids, the nid'd dataset is
    materialized once, so a (null, named) near-dup pair resolves — one
    survivor, never both, across repeated runs."""
    import pyarrow.parquet as pq
    import ray.data

    from jobs.dedup_job import run_dedup_job

    rows = [
        {"uid": None, "embedding": [1.0, 0.0, 0.0], "m": 1},
        {"uid": "a", "embedding": [0.999, 0.01, 0.0], "m": 2},  # dup pair
        {"uid": "b", "embedding": [0.0, 1.0, 0.0], "m": 3},
    ]
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(src / "p.parquet"))
    for trial in range(2):
        out = str(tmp_path / f"out{trial}")
        res = run_dedup_job(str(src), out, mode="embedding",
                            threshold=0.95, id_col="uid")
        assert res["kept_rows"] == 2, trial  # exactly one of the pair
        kept = {r["uid"] for r in ray.data.read_parquet(out).take_all()}
        assert "b" in kept and len(kept) == 2


def _write_warc(path, records, gz=False):
    """Minimal WARC/1.0 writer for fixtures (responses + a request)."""
    import gzip as _gzip

    out = b""
    for rec in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + rec["body"]) if rec.get("http", True) else rec["body"]
        hdr = (f"WARC/1.0\r\nWARC-Type: {rec['type']}\r\n"
               f"WARC-Target-URI: {rec['url']}\r\n"
               f"WARC-Date: {rec['date']}\r\n"
               f"Content-Length: {len(http)}\r\n\r\n").encode()
        member = hdr + http + b"\r\n\r\n"
        out += _gzip.compress(member) if gz else member
    with open(path, "wb") as f:
        f.write(out)


def test_read_warc_source(tmp_path):
    """WARC source: response records only, HTTP envelope stripped,
    WARC-Date -> timestamp, gzip multi-member transparent; lifts to the
    pages schema and runs through the flagship prepare stage."""
    import ray.data

    from dataguards_ray.sources import pages_from_warc, read_warc

    records = [
        {"type": "request", "url": "http://a.example/x",
         "date": "2017-03-06T04:02:06Z", "body": b"GET / HTTP/1.1",
         "http": False},
        {"type": "response", "url": "http://a.example/x",
         "date": "2017-03-06T04:02:06Z",
         "body": b"<html><body>Hello WARC one</body></html>"},
        {"type": "response", "url": "http://b.example/y",
         "date": "2021-11-30T23:59:59Z",
         "body": b"<html><body>Second page body</body></html>"},
    ]
    plain = tmp_path / "f.warc"
    gzed = tmp_path / "g.warc.gz"
    _write_warc(str(plain), records)
    _write_warc(str(gzed), records, gz=True)

    for p in (plain, gzed):
        rows = sorted(read_warc(str(p)).take_all(), key=lambda r: r["url"])
        assert [r["url"] for r in rows] == ["http://a.example/x",
                                            "http://b.example/y"]
        assert rows[0]["html"] == b"<html><body>Hello WARC one</body></html>"
        assert rows[1]["warc_ts"].year == 2021
    pages = pages_from_warc(read_warc(str(gzed)))
    assert set(pages.schema().names) == {"url", "warc_ts", "html", "text",
                                         "lang"}
    # the flagship prepare stage accepts the lifted schema end-to-end
    from dataguards_ray.pipeline import PrepareStep

    prepared = PrepareStep().apply(pages).take_all()
    assert len(prepared) == 2
    texts = {r["url"]: r for r in prepared}
    assert "Hello WARC one" in str(texts["http://a.example/x"].get(
        "text_clean", "")) or any(
        "Hello WARC one" in str(v) for v in texts["http://a.example/x"].values())


def _chunked(body: bytes, sizes=(7, 16, 3)) -> bytes:
    """RFC 7230 chunked framing of body (round-robin chunk sizes)."""
    out, pos, i = [], 0, 0
    while pos < len(body):
        n = min(sizes[i % len(sizes)], len(body) - pos)
        out.append(f"{n:x}\r\n".encode() + body[pos:pos + n] + b"\r\n")
        pos += n
        i += 1
    out.append(b"0\r\n\r\n")
    return b"".join(out)


def test_warc_http_transfer_and_content_encoding(tmp_path):
    """Response bodies with Transfer-Encoding: chunked and/or
    Content-Encoding: gzip/deflate are decoded to the true html (ADVICE
    r03: real Common-Crawl records routinely carry both)."""
    import gzip as _gzip
    import zlib

    from dataguards_ray.sources import read_warc

    body = b"<html><body>" + b"decoded payload bytes " * 20 + b"</body></html>"
    variants = {
        "http://plain.example/": (b"", body),
        "http://chunked.example/": (
            b"Transfer-Encoding: chunked\r\n", _chunked(body)),
        "http://gzip.example/": (
            b"Content-Encoding: gzip\r\n", _gzip.compress(body)),
        "http://deflate.example/": (
            b"Content-Encoding: deflate\r\n", zlib.compress(body)),
        "http://both.example/": (
            b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
            _chunked(_gzip.compress(body))),
    }
    out = b""
    for url, (extra, wire) in variants.items():
        http = b"HTTP/1.1 200 OK\r\n" + extra + b"Content-Type: text/html\r\n\r\n" + wire
        hdr = (f"WARC/1.0\r\nWARC-Type: response\r\n"
               f"WARC-Target-URI: {url}\r\n"
               f"WARC-Date: 2020-01-02T03:04:05Z\r\n"
               f"Content-Length: {len(http)}\r\n\r\n").encode()
        out += hdr + http + b"\r\n\r\n"
    p = tmp_path / "enc.warc"
    p.write_bytes(out)
    rows = {r["url"]: r["html"] for r in read_warc(str(p)).take_all()}
    assert set(rows) == set(variants)
    for url in variants:
        assert rows[url] == body, url


def test_warc_tolerant_of_malformed_records(tmp_path):
    """Corrupt Content-Length / garbage between records / truncated tail
    are skipped with a resync — good records still come through (ADVICE
    r03: untrusted archives must not kill the read task)."""
    from dataguards_ray.sources import read_warc

    def rec(url, body, length=None):
        http = b"HTTP/1.1 200 OK\r\n\r\n" + body
        n = length if length is not None else len(http)
        return (f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: 2020-01-02T03:04:05Z\r\n"
                f"Content-Length: {n}\r\n\r\n").encode() + http + b"\r\n\r\n"

    good1 = rec("http://ok1.example/", b"<html>first good</html>")
    bad_len = rec("http://bad.example/", b"<html>x</html>", length="NOTANUMBER")
    garbage = b"complete garbage, not a record at all\r\nmore junk\r\n"
    good2 = rec("http://ok2.example/", b"<html>second good</html>")
    truncated = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                 b"WARC-Target-URI: http://trunc.example/\r\n"
                 b"WARC-Date: 2020-01-02T03:04:05Z\r\n"
                 b"Content-Length: 99999\r\n\r\nshort")
    p = tmp_path / "dirty.warc"
    p.write_bytes(good1 + bad_len + garbage + good2 + truncated)
    rows = sorted(r["url"] for r in read_warc(str(p)).take_all())
    assert rows == ["http://ok1.example/", "http://ok2.example/"]


def test_filter_job_warc_input(tmp_path):
    """dg filter --format warc: Common-Crawl archives straight into the
    flagship (extract derives text from html; lineage as usual)."""
    from dataguards_ray.pipeline import run_filter_job

    body = ("<html><body><p>" + "This is a clean english sentence "
            "with plenty of ordinary words in it. " * 30
            + "</p></body></html>").encode()
    records = [
        {"type": "response", "url": f"http://site{i}.example/page",
         "date": "2020-01-02T03:04:05Z", "body": body}
        for i in range(6)
    ]
    warc = tmp_path / "crawl.warc.gz"
    _write_warc(str(warc), records, gz=True)
    recs = run_filter_job(str(warc), str(tmp_path / "out"), concurrency=4,
                          input_format="warc")
    assert sum(r["input_rows"] for r in recs) == 6


def _png_bytes(px, ctype, filters=None):
    """Spec-conformant PNG writer for tests — independent of the decoder
    (chunks + filters written by hand per the PNG spec)."""
    import struct
    import zlib

    h = len(px)
    w = len(px[0])
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    filters = filters or [0] * h

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b""
    prev = [0] * (w * channels)
    for y, frow in zip(range(h), filters):
        flat = []
        for x in range(w):
            v = px[y][x]
            flat.extend(v if isinstance(v, (list, tuple)) else [v])
        enc = []
        for i, v in enumerate(flat):
            a = flat[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if frow == 0:
                enc.append(v & 0xFF)
            elif frow == 1:
                enc.append((v - a) & 0xFF)
            elif frow == 2:
                enc.append((v - b) & 0xFF)
            elif frow == 3:
                enc.append((v - (a + b) // 2) & 0xFF)
            else:  # paeth
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                enc.append((v - pred) & 0xFF)
        raw += bytes([frow]) + bytes(enc)
        prev = flat
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_codecs_png_all_filters():
    """Real PNG decode: every scanline filter type, gray and RGB, checked
    against pixels written per-spec by an independent test writer."""
    import numpy as np

    from dataguards_ray.codecs import decode_png

    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, (5, 7)).tolist()
    for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5,
                    [0, 1, 2, 3, 4]):
        out = decode_png(_png_bytes(gray, ctype=0, filters=filters))
        assert out.tolist() == gray, filters

    rgb = [[[int(rng.randint(0, 256)) for _ in range(3)] for _ in range(4)]
           for _ in range(3)]
    out = decode_png(_png_bytes(rgb, ctype=2, filters=[4, 3, 1]))
    assert out.tolist() == rgb


def test_codecs_ppm_bmp_wav_and_stage_integration(tmp_path):
    """PPM/PGM/WAV decode + the multimodal stages consuming REAL formats
    (PNG/WAV) alongside the fixture format."""
    import struct

    import numpy as np
    import ray.data

    from dataguards_ray.codecs import decode_ppm, decode_wav
    from dataguards_ray.multimodal import audio_features, decode_images

    # PGM/PPM with a comment in the header
    pgm = b"P5 # comment\n3 2 255\n" + bytes([0, 10, 20, 30, 40, 50])
    assert decode_ppm(pgm).tolist() == [[0, 10, 20], [30, 40, 50]]

    # PCM16 stereo WAV: mono mean, rate preserved
    rate, samples = 8000, np.array([1000, -1000, 2000, 2000], dtype=np.int16)
    data = samples.tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, rate,
                                   rate * 4, 4, 16)
           + b"data" + struct.pack("<I", len(data)) + data)
    r, x = decode_wav(wav)
    assert r == rate and len(x) == 2
    assert abs(x[0] - 0.0) < 1e-6 and abs(x[1] - 2000 / 32768) < 1e-4

    # stages consume real PNG + WAV payloads end-to-end
    gray = [[50, 100], [150, 200]]
    png = _png_bytes(gray, ctype=0)
    img_rows = [{"img_id": 1, "image": png}]
    out = decode_images(ray.data.from_items(img_rows)).take_all()
    assert out[0]["width"] == 2 and out[0]["height"] == 2
    assert abs(out[0]["mean_px"] - 125.0) < 1e-6

    aud_rows = [{"audio_id": 1, "audio": wav}]
    feats = audio_features(ray.data.from_items(aud_rows)).take_all()
    assert feats[0]["sample_rate"] == rate


def test_codecs_bmp_24bit():
    """Uncompressed 24-bit bottom-up BMP, row padding and BGR order."""
    import struct

    from dataguards_ray.codecs import decode_bmp

    # 2x2: top row [red, green], bottom row [blue, white]
    rows_topdown = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    w = h = 2
    stride = (w * 3 + 3) & ~3  # 8 with 2 pad bytes
    body = b""
    for r in reversed(rows_topdown):  # bottom-up storage
        line = b"".join(bytes([b_, g, rch]) for rch, g, b_ in r)
        body += line + b"\x00" * (stride - len(line))
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                         2835, 2835, 0, 0))
    px = decode_bmp(hdr + body)
    assert px.tolist() == [[[255, 0, 0], [0, 255, 0]],
                           [[0, 0, 255], [255, 255, 255]]]


def _jpeg_bytes(px, sampling=(1, 1), restart=0, q=1):
    """Baseline JFIF encoder for tests — independent of the decoder
    (own zigzag walk, own DCT matrix, own canonical-Huffman assignment,
    markers written by hand per ITU-T T.81).  ``q``: flat quant value
    (1 = near-lossless up to DCT rounding).  ``sampling``: (h,v) factors
    for Y; chroma is (1,1) — (2,2) = 4:2:0.  ``restart``: DRI interval
    in MCUs (0 = none)."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    color = px.ndim == 3
    fh, fw = px.shape[:2]

    # zigzag scan order via the diagonal walk (independent derivation)
    zz = []
    for s in range(15):
        d = [(y, s - y) for y in range(max(0, s - 7), min(8, s + 1))]
        zz.extend(d if s % 2 else d[::-1])
    zz_nat = np.array([y * 8 + x for y, x in zz])  # scan idx -> natural

    M = np.array([[np.sqrt((2 - (u == 0)) / 8)
                   * np.cos((2 * x + 1) * u * np.pi / 16)
                   for x in range(8)] for u in range(8)])

    # custom canonical Huffman tables (valid per T.81; Kraft < 1, the
    # all-ones max-length code unused)
    dc_counts = [0, 0, 0, 11, 1] + [0] * 11
    dc_values = list(range(12))
    ac_counts = [0] * 7 + [254, 2] + [0] * 7
    ac_values = list(range(256))

    def canon(counts, values):
        codes, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                codes[values[k]] = (code, ln)
                k += 1
                code += 1
            code <<= 1
        return codes

    dc_codes, ac_codes = canon(dc_counts, dc_values), canon(ac_counts, ac_values)

    if color:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        hs, vs = sampling
        comps = [(1, hs, vs), (2, 1, 1), (3, 1, 1)]
        planes = [y]
        for c in (cb, cr):
            if (hs, vs) == (1, 1):
                planes.append(c)
            else:  # average-pool subsample
                ph = -(-fh // vs) * vs
                pw = -(-fw // hs) * hs
                cp = np.pad(c, ((0, ph - fh), (0, pw - fw)), mode="edge")
                planes.append(cp.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3)))
    else:
        comps = [(1, 1, 1)]
        planes = [px]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    # pad each plane to its MCU-aligned block grid (edge replicate)
    padded = []
    for (cid, hs, vs), pl in zip(comps, planes):
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        padded.append(np.pad(pl, ((0, th - pl.shape[0]), (0, tw - pl.shape[1])),
                             mode="edge"))

    qtab = np.full(64, q, dtype=np.int64)

    bits = []  # (value, nbits)

    def emit(code, ln):
        bits.append((code, ln))

    def encode_block(block, pred):
        s = M @ (block - 128.0) @ M.T
        coef = np.round(s.reshape(64) / qtab.reshape(8, 8).reshape(64)).astype(np.int64)
        seq = coef[zz_nat]
        diff = int(seq[0]) - pred
        t = int(diff != 0 and int(np.floor(np.log2(abs(diff)))) + 1)
        c, ln = dc_codes[t]
        emit(c, ln)
        if t:
            v = diff if diff > 0 else diff + (1 << t) - 1
            emit(v & ((1 << t) - 1), t)
        run = 0
        last_nz = max((k for k in range(1, 64) if seq[k]), default=0)
        for k in range(1, last_nz + 1):
            v = int(seq[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]
                emit(c, ln)
                run -= 16
            sbits = int(np.floor(np.log2(abs(v)))) + 1
            c, ln = ac_codes[(run << 4) | sbits]
            emit(c, ln)
            vv = v if v > 0 else v + (1 << sbits) - 1
            emit(vv & ((1 << sbits) - 1), sbits)
            run = 0
        if last_nz < 63:
            c, ln = ac_codes[0x00]
            emit(c, ln)
        return int(seq[0])

    def flush_bits():
        out = bytearray()
        acc, nacc = 0, 0
        for v, ln in bits:
            acc = (acc << ln) | v
            nacc += ln
            while nacc >= 8:
                byte = (acc >> (nacc - 8)) & 0xFF
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)
                nacc -= 8
                acc &= (1 << nacc) - 1
        if nacc:
            byte = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        bits.clear()
        return bytes(out)

    entropy = bytearray()
    preds = [0] * len(comps)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart and m and m % restart == 0:
            entropy += flush_bits()
            entropy += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, (cid, hs, vs) in enumerate(comps):
            for by in range(vs):
                for bx in range(hs):
                    ry = (my * vs + by) * 8
                    rx = (mx * hs + bx) * 8
                    preds[ci] = encode_block(
                        padded[ci][ry:ry + 8, rx:rx + 8], preds[ci])
    entropy += flush_bits()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytes([0xFF, 0xD8])
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qtab[zz_nat].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", fh, fw) + bytes([len(comps)])
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += seg(0xC0, sof)
    for tc, counts, values in ((0, dc_counts, dc_values),
                               (1, ac_counts, ac_values)):
        out += seg(0xC4, bytes([tc << 4]) + bytes(counts) + bytes(values))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0 for all
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    return out + bytes(entropy) + bytes([0xFF, 0xD9])


def test_codecs_jpeg_baseline_gray_and_444():
    """Baseline JPEG roundtrip at flat quant 1: grayscale and 4:4:4 RGB
    decode within DCT-rounding tolerance of the source."""
    import numpy as np

    from dataguards_ray.codecs import decode_jpeg

    rng = np.random.RandomState(7)
    # smooth gradient + mild noise (worst-case hard edges belong to the
    # subsampled-chroma test where tolerance is looser)
    yy, xx = np.mgrid[0:24, 0:40]
    gray = ((yy * 4 + xx * 3) % 256).astype(np.uint8)
    out = decode_jpeg(_jpeg_bytes(gray))
    assert out.shape == (24, 40)
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 3

    rgb = np.stack([((yy * 5 + xx) % 256), ((yy + xx * 7) % 256),
                    ((yy * 2 + xx * 2) % 256)], axis=-1).astype(np.uint8)
    out = decode_jpeg(_jpeg_bytes(rgb))
    assert out.shape == (24, 40, 3)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 6


def test_codecs_jpeg_420_restarts_and_dispatch():
    """4:2:0 chroma subsampling with odd dimensions + restart intervals;
    decode_image dispatch; arithmetic SOF raises NotImplementedError."""
    import numpy as np
    import pytest as _pytest

    from dataguards_ray.codecs import decode_image, decode_jpeg

    yy, xx = np.mgrid[0:21, 0:35]
    rgb = np.stack([(yy * 3) % 256, (xx * 2) % 256,
                    ((yy + xx) * 2) % 256], axis=-1).astype(np.uint8)
    blob = _jpeg_bytes(rgb, sampling=(2, 2), restart=2)
    out = decode_jpeg(blob)
    assert out.shape == (21, 35, 3)
    # luma is full-res (tight); chroma is smooth so 2x2 pooling stays close
    luma = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    assert np.abs(luma(out) - luma(rgb)).max() <= 6
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() <= 4

    w, h, g = decode_image(blob)
    assert (w, h) == (35, 21) and g.shape == (21, 35)

    # SOF2-flagged stream with a sequential scan decodes identically
    # (the generic scan decoder keys on Ss/Se, not the SOF marker)
    seq444 = _jpeg_bytes(rgb)
    prog = bytearray(seq444)
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2  # flip SOF0 -> SOF2
    assert np.array_equal(decode_jpeg(bytes(prog)), decode_jpeg(seq444))

    arith = bytearray(_jpeg_bytes(rgb))
    arith[idx + 1] = 0xC9  # SOF9: arithmetic sequential
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(arith))

    with _pytest.raises(ValueError):
        decode_jpeg(blob[:40])  # truncated: no scan


def _jpeg_progressive_bytes(px, sampling=(1, 1), q=1):
    """Progressive (SOF2) JFIF encoder for tests — independent of the
    decoder (own zigzag/DCT/Huffman, T.81 G.1.2 scan procedures written
    from the spec).  Scan script exercises every progressive block
    kind: interleaved DC first (Al=1) + DC refine, per-component AC
    first over two spectral bands at Al=2, then two successive-
    approximation refinement passes (2→1→0) with libjpeg-style EOBRUN
    batching and buffered correction bits."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    color = px.ndim == 3
    fh, fw = px.shape[:2]

    zz = []
    for s in range(15):
        d = [(y, s - y) for y in range(max(0, s - 7), min(8, s + 1))]
        zz.extend(d if s % 2 else d[::-1])
    zz_nat = np.array([y * 8 + x for y, x in zz])

    M = np.array([[np.sqrt((2 - (u == 0)) / 8)
                   * np.cos((2 * x + 1) * u * np.pi / 16)
                   for x in range(8)] for u in range(8)])

    dc_counts = [0, 0, 0, 11, 1] + [0] * 11
    dc_values = list(range(12))
    ac_counts = [0] * 7 + [254, 2] + [0] * 7
    ac_values = list(range(256))

    def canon(counts, values):
        codes, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                codes[values[k]] = (code, ln)
                k += 1
                code += 1
            code <<= 1
        return codes

    dc_codes, ac_codes = canon(dc_counts, dc_values), canon(ac_counts, ac_values)

    if color:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        hs0, vs0 = sampling
        comps = [(1, hs0, vs0), (2, 1, 1), (3, 1, 1)]
        planes = [y]
        for c in (cb, cr):
            if (hs0, vs0) == (1, 1):
                planes.append(c)
            else:
                ph = -(-fh // vs0) * vs0
                pw = -(-fw // hs0) * hs0
                cp = np.pad(c, ((0, ph - fh), (0, pw - fw)), mode="edge")
                planes.append(cp.reshape(ph // vs0, vs0,
                                         pw // hs0, hs0).mean(axis=(1, 3)))
    else:
        comps = [(1, 1, 1)]
        planes = [px]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    qtab = np.full(64, q, dtype=np.int64)

    # quantized coefficients (zigzag order) per component per block,
    # on the FULL MCU-padded grid (interleaved DC scans cover padding)
    seqs = []
    for (cid, hs, vs), pl in zip(comps, planes):
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        p = np.pad(pl, ((0, th - pl.shape[0]), (0, tw - pl.shape[1])),
                   mode="edge")
        grid = np.empty((th // 8, tw // 8, 64), dtype=np.int64)
        for by in range(th // 8):
            for bx in range(tw // 8):
                s = M @ (p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0) @ M.T
                grid[by, bx] = np.round(s.reshape(64) / q).astype(np.int64)[zz_nat]
        seqs.append(grid)

    bits = []

    def emit(code, ln):
        bits.append((code, ln))

    def flush_bits():
        out = bytearray()
        acc, nacc = 0, 0
        for v, ln in bits:
            acc = (acc << ln) | v
            nacc += ln
            while nacc >= 8:
                byte = (acc >> (nacc - 8)) & 0xFF
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)
                nacc -= 8
                acc &= (1 << nacc) - 1
        if nacc:
            byte = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        bits.clear()
        return bytes(out)

    def stv(c, a):  # AC point transform: sign(c) * (|c| >> a)
        return (abs(int(c)) >> a) * (1 if c > 0 else -1)

    def dc_first_scan(al):
        preds = [0] * len(comps)
        if color:  # interleaved MCU order
            for m in range(mcus_x * mcus_y):
                my, mx = divmod(m, mcus_x)
                for ci, (cid, hs, vs) in enumerate(comps):
                    for by in range(vs):
                        for bx in range(hs):
                            v = int(seqs[ci][my * vs + by, mx * hs + bx][0]) >> al
                            diff = v - preds[ci]
                            preds[ci] = v
                            t = int(diff != 0 and
                                    int(np.floor(np.log2(abs(diff)))) + 1)
                            c, ln = dc_codes[t]
                            emit(c, ln)
                            if t:
                                vv = diff if diff > 0 else diff + (1 << t) - 1
                                emit(vv & ((1 << t) - 1), t)
        else:
            g = seqs[0]
            for by in range(g.shape[0]):
                for bx in range(g.shape[1]):
                    v = int(g[by, bx][0]) >> al
                    diff = v - preds[0]
                    preds[0] = v
                    t = int(diff != 0 and int(np.floor(np.log2(abs(diff)))) + 1)
                    c, ln = dc_codes[t]
                    emit(c, ln)
                    if t:
                        vv = diff if diff > 0 else diff + (1 << t) - 1
                        emit(vv & ((1 << t) - 1), t)

    def dc_refine_scan(al):
        if color:
            for m in range(mcus_x * mcus_y):
                my, mx = divmod(m, mcus_x)
                for ci, (cid, hs, vs) in enumerate(comps):
                    for by in range(vs):
                        for bx in range(hs):
                            emit((int(seqs[ci][my * vs + by, mx * hs + bx][0])
                                  >> al) & 1, 1)
        else:
            g = seqs[0]
            for by in range(g.shape[0]):
                for bx in range(g.shape[1]):
                    emit((int(g[by, bx][0]) >> al) & 1, 1)

    def comp_block_grid(ci):
        _, hs, vs = comps[ci]
        cw = -(-fw * hs // hmax)
        ch = -(-fh * vs // vmax)
        return -(-ch // 8), -(-cw // 8)

    def ac_first_scan(ci, ss, se, al):
        bh, bw = comp_block_grid(ci)
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                c, ln = ac_codes[nb << 4]
                emit(c, ln)
                if nb:
                    emit(eobrun - (1 << nb), nb)
                eobrun = 0

        for u in range(bh * bw):
            by, bx = divmod(u, bw)
            seq = seqs[ci][by, bx]
            vals = [stv(seq[k], al) for k in range(ss, se + 1)]
            nz = [j for j, v in enumerate(vals) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for j in range(nz[-1] + 1):
                v = vals[j]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    emit(c, ln)
                    run -= 16
                sb = int(np.floor(np.log2(abs(v)))) + 1
                c, ln = ac_codes[(run << 4) | sb]
                emit(c, ln)
                vv = v if v > 0 else v + (1 << sb) - 1
                emit(vv & ((1 << sb) - 1), sb)
                run = 0
            if nz[-1] < se - ss:
                eobrun += 1
        flush_eob()

    def ac_refine_scan(ci, ss, se, ah, al):
        bh, bw = comp_block_grid(ci)
        eobrun = 0
        be = []  # buffered correction bits across the EOB run

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                c, ln = ac_codes[nb << 4]
                emit(c, ln)
                if nb:
                    emit(eobrun - (1 << nb), nb)
            for b in be:
                emit(b, 1)
            be.clear()
            eobrun = 0

        for u in range(bh * bw):
            by, bx = divmod(u, bw)
            seq = seqs[ci][by, bx]
            prev = [stv(seq[k], ah) for k in range(ss, se + 1)]
            cur = [stv(seq[k], al) for k in range(ss, se + 1)]
            newly = [j for j in range(len(cur)) if prev[j] == 0 and cur[j]]
            corr = lambda j: (abs(int(seq[ss + j])) >> al) & 1
            if not newly:
                eobrun += 1
                be.extend(corr(j) for j in range(len(cur)) if prev[j])
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            pending = []
            for j in range(newly[-1] + 1):
                if prev[j]:
                    pending.append(corr(j))
                elif cur[j] == 0:
                    run += 1
                    if run == 16:
                        c, ln = ac_codes[0xF0]
                        emit(c, ln)
                        for b in pending:
                            emit(b, 1)
                        pending = []
                        run = 0
                else:  # newly nonzero: must be ±1 at this level
                    assert abs(cur[j]) == 1
                    c, ln = ac_codes[(run << 4) | 1]
                    emit(c, ln)
                    emit(1 if cur[j] > 0 else 0, 1)
                    for b in pending:
                        emit(b, 1)
                    pending = []
                    run = 0
            # tail after the last newly-nonzero joins the EOB run (the
            # loop above ends AT the last newly, so pending/run are
            # freshly reset; decoder-side the EOB consumes correction
            # bits for the remaining nonzero-history positions)
            if newly[-1] + 1 <= len(cur) - 1:
                eobrun += 1
                be.extend(corr(t) for t in range(newly[-1] + 1, len(cur))
                          if prev[t])
        flush_eob()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def sos(scan_comps, ss, se, ah, al):
        p = bytes([len(scan_comps)])
        for cid in scan_comps:
            p += bytes([cid, 0x00])
        p += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, p)

    out = bytes([0xFF, 0xD8])
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qtab[zz_nat].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", fh, fw) + bytes([len(comps)])
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += seg(0xC2, sof)
    for tc, counts, values in ((0, dc_counts, dc_values),
                               (1, ac_counts, ac_values)):
        out += seg(0xC4, bytes([tc << 4]) + bytes(counts) + bytes(values))

    all_ids = [c[0] for c in comps]
    # scan script: DC first/refine, AC first per band at Al=2, then two
    # refinement passes 2->1->0
    dc_first_scan(1)
    out += sos(all_ids, 0, 0, 0, 1) + flush_bits()
    dc_refine_scan(0)
    out += sos(all_ids, 0, 0, 1, 0) + flush_bits()
    for ci in range(len(comps)):
        ac_first_scan(ci, 1, 5, 2)
        out += sos([comps[ci][0]], 1, 5, 0, 2) + flush_bits()
        ac_first_scan(ci, 6, 63, 2)
        out += sos([comps[ci][0]], 6, 63, 0, 2) + flush_bits()
    for ah, al in ((2, 1), (1, 0)):
        for ci in range(len(comps)):
            ac_refine_scan(ci, 1, 5, ah, al)
            out += sos([comps[ci][0]], 1, 5, ah, al) + flush_bits()
            ac_refine_scan(ci, 6, 63, ah, al)
            out += sos([comps[ci][0]], 6, 63, ah, al) + flush_bits()
    return out + bytes([0xFF, 0xD9])


def test_codecs_jpeg_progressive_gray_noise():
    """Progressive decode == baseline decode of the SAME quantized
    coefficients, bit-exact, on dense random data (exercises ZRL, long
    runs, successive approximation and EOB runs)."""
    import numpy as np

    from dataguards_ray.codecs import decode_jpeg

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    prog = _jpeg_progressive_bytes(gray)
    base = _jpeg_bytes(gray)
    assert prog.find(b"\xff\xc2") > 0  # really SOF2, many scans
    assert prog.count(b"\xff\xda") == 8  # 2 DC + 2 AC-first + 4 refine
    out = decode_jpeg(prog)
    assert out.shape == (24, 40)
    assert np.array_equal(out, decode_jpeg(base))


def test_codecs_jpeg_progressive_color_420():
    """Progressive 3-component 4:2:0 (interleaved DC scan + per-
    component non-interleaved AC scans over distinct block grids) ==
    the baseline encoding of the same planes; smooth image exercises
    EOBRUN batching across blocks."""
    import numpy as np

    from dataguards_ray.codecs import decode_image, decode_jpeg

    yy, xx = np.mgrid[0:21, 0:35]
    rgb = np.stack([(yy * 3) % 256, (xx * 2) % 256,
                    ((yy + xx) * 2) % 256], axis=-1).astype(np.uint8)
    prog = _jpeg_progressive_bytes(rgb, sampling=(2, 2))
    base = _jpeg_bytes(rgb, sampling=(2, 2))
    out = decode_jpeg(prog)
    assert out.shape == (21, 35, 3)
    assert np.array_equal(out, decode_jpeg(base))
    w, h, g = decode_image(prog)  # sniffing dispatch handles SOF2
    assert (w, h) == (35, 21) and g.shape == (21, 35)


def test_codecs_jpeg_progressive_eob_runs_across_blocks():
    """Mostly-flat image: 10 of 12 blocks have all-zero AC bands, so
    the encoder's EOBRUN batching provably emits multi-block runs
    (consecutive no-content blocks accumulate before one flush), and
    the featured blocks' refinement bits ride inside/around them —
    decode must still be bit-exact vs the baseline encoding."""
    import numpy as np

    from dataguards_ray.codecs import decode_jpeg

    img = np.full((16, 48), 128, dtype=np.uint8)
    yy, xx = np.mgrid[0:8, 0:8]
    img[0:8, 0:8] = (128 + 60 * np.cos((2 * xx + 1) * np.pi / 16)
                     ).clip(0, 255).astype(np.uint8)
    img[8:16, 40:48] = (128 + 50 * np.cos((2 * yy + 1) * np.pi / 8)
                        + 9 * np.cos((2 * xx + 1) * 3 * np.pi / 16)
                        ).clip(0, 255).astype(np.uint8)
    prog = _jpeg_progressive_bytes(img)
    base = _jpeg_bytes(img)
    assert np.array_equal(decode_jpeg(prog), decode_jpeg(base))


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_matches_tuple_oracle():
    """decontaminate ≡ an exact tuple-n-gram scalar oracle: same
    contaminated set and window counts, flag/drop consistent, stable
    across partitioning, sub-n-token docs clean."""
    import random

    import ray.data

    from dataguards_ray import spec
    from dataguards_ray.textstats import decontaminate

    rng = random.Random(99)
    vocab = [f"word{i}" for i in range(50)]

    def doc(k):
        return " ".join(rng.choice(vocab) for _ in range(k))

    bench_rows = [{"doc_id": 1000 + i, "text": doc(30)} for i in range(4)]
    n = 7
    docs = []
    for i in range(40):
        t = doc(25)
        if i % 5 == 0:  # splice a benchmark n-gram mid-doc
            src = bench_rows[i % 4]["text"].split(" ")
            j = rng.randrange(0, len(src) - n)
            t = doc(6) + " " + " ".join(src[j:j + n]) + " " + doc(6)
        docs.append({"doc_id": i, "text": t})
    docs.append({"doc_id": 98, "text": "short doc"})   # < n tokens
    docs.append({"doc_id": 99, "text": None})

    # exact oracle over token tuples
    bench_grams = set()
    for r in bench_rows:
        toks = spec.lm_tokens(r["text"])
        bench_grams.update(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))
    expect = {}
    for r in docs:
        toks = spec.lm_tokens(r["text"] or "")
        hits = sum(1 for i in range(max(0, len(toks) - n + 1))
                   if tuple(toks[i:i + n]) in bench_grams)
        expect[r["doc_id"]] = hits

    bench = ray.data.from_items(bench_rows).repartition(2)
    for parts in (1, 5):
        ds = ray.data.from_items(docs).repartition(parts)
        got = {r["doc_id"]: (r["contaminated"], r["n_contaminated"])
               for r in decontaminate(ds, bench, n=n, mode="flag").take_all()}
        assert {d: c for d, (f, c) in got.items()} == expect, parts
        assert all(f == (c > 0) for f, c in got.values())
        kept = {r["doc_id"] for r in
                decontaminate(ds, bench, n=n, mode="drop").take_all()}
        assert kept == {d for d, c in expect.items() if c == 0}
    assert sum(1 for c in expect.values() if c > 0) >= 8  # gate fired


@pytest.mark.usefixtures("ray_session")
def test_sample_by_token_budget():
    """Token-budget sample ≡ the windowed-cumsum definition (scalar
    oracle), exact at the boundary, partition-invariant, whole-corpus
    and zero budgets handled."""
    import hashlib
    import re

    import ray.data

    from dataguards_ray.aggregates import sample_by_token_budget

    rows = [{"doc_id": i, "text": " ".join(f"t{j}" for j in range((i * 7) % 23 + 1))}
            for i in range(120)]
    rows.append({"doc_id": 900, "text": None})
    rows[50]["text"] = rows[10]["text"]  # duplicated text: id tiebreak

    def oracle(budget):
        scored = [(hashlib.md5(r["text"].encode()).hexdigest(), r["doc_id"],
                   len(re.findall(r"\w+", r["text"])))
                  for r in rows if r["text"] is not None]
        scored.sort()
        keep, run = set(), 0
        for h, d, n in scored:
            if run + n > budget:
                break
            run += n
            keep.add(d)
        return keep

    for budget in (0, 137, 600, 10 ** 9):
        want = oracle(budget)
        for parts in (1, 6):
            ds = ray.data.from_items(rows).repartition(parts)
            got = {r["doc_id"] for r in
                   sample_by_token_budget(ds, budget).take_all()}
            assert got == want, (budget, parts, len(got), len(want))
    assert 0 < len(oracle(600)) < 120  # the mid budget actually cuts


def test_semdedup_matches_scalar_oracle():
    """SemDeDup (Abbas et al. 2023): Ray output equals a scalar oracle
    that replays the exact spec — nearest-centroid assignment, csim-desc
    order (id tiebreak), drop j iff max_{i<j} cos >= tau — including the
    pipeline's f32 vector roundtrip; partition-count invariant; both
    keep modes."""
    import ray.data

    from dataguards_ray.similarity import ivf_train, semdedup_filter

    rng = np.random.default_rng(7)
    n, d, k, thr = 240, 12, 6, 0.99
    base = rng.normal(size=(n, d))
    for i in range(50):  # inject near-dup pairs (i, i+120)
        base[120 + i] = base[i] + rng.normal(scale=0.01, size=d)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    tbl = pa.table({"vec_id": pa.array(np.arange(n), type=pa.int64()),
                    "embedding": pa.array(list(base.astype(np.float64)))})

    def oracle(keep):
        C = ivf_train(ray.data.from_arrow(tbl), k, iters=8, seed=42)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
        sims = base @ Cn.T
        assign = sims.argmax(axis=1)
        csim = sims[np.arange(n), assign]
        dropped = set()
        for c in range(k):
            idx = np.where(assign == c)[0]
            if len(idx) < 2:
                continue
            V = base[idx].astype(np.float32).astype(np.float64)
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
            order = np.lexsort(
                (idx, -csim[idx] if keep == "closest" else csim[idx]))
            oid, Vo = idx[order], V[order]
            S = Vo @ Vo.T
            for j in range(1, len(oid)):
                if S[:j, j].max() >= thr:
                    dropped.add(int(oid[j]))
        return sorted(set(range(n)) - dropped)

    for keep in ("closest", "farthest"):
        want = oracle(keep)
        assert len(want) < n  # the injected dups actually drop
        for parts in (1, 5):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            got = sorted(r["vec_id"] for r in
                         semdedup_filter(ds, thr, n_clusters=k,
                                         keep=keep, seed=42).take_all())
            assert got == want, (keep, parts, len(got), len(want))


def test_semdedup_cluster_cap_raises():
    """Clusters above max_cluster_rows fail loudly with sizing guidance
    instead of OOMing the worker on the O(m^2) kernel."""
    import ray.data

    from dataguards_ray.similarity import semdedup_losers

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 4))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table({"vec_id": pa.array(np.arange(40), type=pa.int64()),
                    "embedding": pa.array(list(vecs))})
    # one centroid => one 40-row cluster > cap
    cents = np.ones((1, 4)) / 2.0
    with pytest.raises(Exception, match="max_cluster_rows"):
        semdedup_losers(ray.data.from_arrow(tbl), 0.9, cents,
                        max_cluster_rows=16).take_all()


def test_grouped_agg_fallback_merge_parity():
    """The distributed final merge (above the driver cap) must produce
    the same groups/values as the driver-side Arrow merge, including
    the null-key group and count-as-sum merging."""
    import ray.data

    from dataguards_ray.aggregates import _fallback_group_merge, grouped_agg

    rows = [{"g": ["a", "b", None][i % 3], "h": i % 2, "v": float(i)}
            for i in range(101)]
    ds = ray.data.from_items(rows)
    aggs = [("v", "sum", "s"), ("v", "min", "mn"), ("v", "count", "n")]
    fast = grouped_agg(ds, ["g", "h"], aggs).take_all()

    def partial(b):
        g = b.group_by(["g", "h"]).aggregate(
            [("v", "sum"), ("v", "min"), ("v", "count")])
        return g.rename_columns(["g", "h", "s", "mn", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    slow = _fallback_group_merge(partials, ["g", "h"], aggs).take_all()

    def key(r):
        return (str(r["g"]), r["h"])

    def norm(rs):
        return [(str(r["g"]), r["h"], r["s"], r["mn"], r["n"])
                for r in sorted(rs, key=key)]

    assert norm(fast) == norm(slow)


def test_md5_kernel_parity():
    """hashutil's buffer-level md5 kernels are bit-identical to
    hashlib per row (the samplers' DuckDB-parity rank derivation rides
    them), incl. unicode, empties, sliced and chunked arrays."""
    import binascii
    import hashlib

    from dataguards_ray.hashutil import (hex_prefix_buckets,
                                         md5_digest_matrix, md5_hex_array)

    texts = ["", "a", "ü ünïcode ☃", "x" * 5000,
             "the quick brown fox"] * 3
    arr = pa.array(texts)
    dig = md5_digest_matrix(arr)
    hexes = md5_hex_array(dig).to_pylist()
    for i, t in enumerate(texts):
        h = hashlib.md5(t.encode("utf-8"))
        assert dig[i].tobytes() == h.digest()
        assert hexes[i] == h.hexdigest()
        for p in (1, 2, 3, 4):
            assert hex_prefix_buckets(dig, p)[i] == int(
                h.hexdigest()[:p], 16)
    # zero-copy offset handling: sliced + chunked views hash the same
    sl = arr.slice(3, 4)
    assert md5_digest_matrix(sl)[0].tobytes() == hashlib.md5(
        texts[3].encode()).digest()
    ch = pa.chunked_array([arr.slice(0, 5), arr.slice(5)])
    assert (md5_digest_matrix(ch) == dig).all()
    assert md5_digest_matrix(pa.array([], type=pa.string())).shape == (0, 16)


def test_incremental_span_dedup_against_prior(tmp_path):
    """Round-5: --against for span/line/substring.  With monotone ids,
    prior-output + incremental-output must row-equal (ids, text bytes,
    n_spans_removed) the single-shot run over both corpora."""
    import pyarrow.parquet as pq
    import ray.data

    from jobs.dedup_job import run_dedup_job

    # sentence-shaped texts so span mode (3-sentence windows) engages;
    # shared blocks cross corpora and within each corpus
    blk_a = ("First shared sentence one.\nSecond shared sentence two.\n"
             "Third shared sentence three.\n")
    blk_b = ("Unique opener for doc %d.\nAnother line of text here.\n"
             "Closing thought number %d.\n")
    corpus_a = [
        {"doc_id": 1, "text": blk_a * 3 + blk_b % (1, 1)},
        {"doc_id": 2, "text": blk_b % (2, 2) + blk_a * 2},  # internal dup
        {"doc_id": 3, "text": blk_b % (3, 3) * 2},
    ]
    corpus_b = [
        {"doc_id": 11, "text": blk_a + blk_b % (11, 11)},   # cross-run dup
        {"doc_id": 12, "text": blk_b % (12, 12) * 3},       # internal dup
        {"doc_id": 13, "text": "totally fresh material here. " * 8},
    ]

    def write(rows, name):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "p.parquet"))
        return str(d)

    src_a = write(corpus_a, "a")
    src_b = write(corpus_b, "b")
    src_ab = write(corpus_a + corpus_b, "ab")

    def rows_of(out_dir):
        return sorted(
            (r["doc_id"], r["text"], r["n_spans_removed"])
            for r in ray.data.read_parquet(out_dir).take_all())

    for mode in ("span", "line", "substring"):
        kw = {"window": 6} if mode == "substring" else {}
        out_a = str(tmp_path / f"{mode}_outa")
        out_b = str(tmp_path / f"{mode}_outb")
        out_s = str(tmp_path / f"{mode}_outs")
        run_dedup_job(src_a, out_a, mode=mode, **kw)
        res = run_dedup_job(src_b, out_b, mode=mode, against=out_a, **kw)
        run_dedup_job(src_ab, out_s, mode=mode, **kw)
        assert rows_of(out_a) + rows_of(out_b) == rows_of(out_s), mode
        assert res["against"] == out_a
        # the incremental run really removed cross-run spans
        assert res["spans_removed"] > 0, mode

        # chaining: C against B's output alone must still know corpus A
        corpus_c = [{"doc_id": 21, "text": blk_a + "tail only here. "},
                    {"doc_id": 22, "text": "never seen text at all. " * 6}]
        src_c = write(corpus_c, f"{mode}_c")
        out_c = str(tmp_path / f"{mode}_outc")
        run_dedup_job(src_c, out_c, mode=mode, against=out_b, **kw)
        src_abc = write(corpus_a + corpus_b + corpus_c, f"{mode}_abc")
        out_sc = str(tmp_path / f"{mode}_outsc")
        run_dedup_job(src_abc, out_sc, mode=mode, **kw)
        assert (rows_of(out_a) + rows_of(out_b) + rows_of(out_c)
                == rows_of(out_sc)), mode

    # window geometry is pinned: resuming the chain with a different
    # substring window fails loudly instead of silently no-opping
    with pytest.raises(ValueError, match="span-params mismatch"):
        run_dedup_job(src_b, str(tmp_path / "w_out"), mode="substring",
                      window=9, against=str(tmp_path / "substring_outa"))


def test_span_dedup_auto_streaming_parity(tmp_path, monkeypatch):
    """Round-5 auto-switch: with the pin cap forced tiny, the default
    (auto) path streams (recompute-twice) and its output byte-equals
    the pinned path; in-memory inputs (unknown size) stay pinned."""
    import pyarrow.parquet as pq
    import ray.data

    from dataguards_ray import spandedup

    rows = [{"doc_id": i,
             "text": (f"alpha beta gamma {i % 4}. second sentence here. "
                      f"third sentence too. ") * 3}
            for i in range(40)]
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(src / "p.parquet"))

    ds = ray.data.read_parquet(str(src))
    est = spandedup._input_file_bytes(ds)
    assert est is not None and est > 0
    assert spandedup._input_file_bytes(ray.data.from_items([{"a": 1}])) is None

    pinned = sorted(
        (r["doc_id"], r["text"], r["n_spans_removed"])
        for r in spandedup.span_dedup(
            ray.data.read_parquet(str(src)),
            streaming_discovery=False).take_all())
    monkeypatch.setattr(spandedup, "AUTO_STREAM_PIN_CAP", 1)
    auto = sorted(
        (r["doc_id"], r["text"], r["n_spans_removed"])
        for r in spandedup.span_dedup(
            ray.data.read_parquet(str(src))).take_all())
    assert auto == pinned


def test_codecs_jpeg_encoder_roundtrip():
    """Round-5 baseline JPEG ENCODER: bit-exact round-trip through the
    (independently verified) decoder at flat quant 1, incl. non-multiple
    -of-8 dims; q>1 stays within quantization tolerance."""
    import numpy as np

    from dataguards_ray.codecs import decode_jpeg, encode_jpeg_gray

    rng = np.random.RandomState(11)
    for h, w in ((24, 40), (17, 23), (8, 8), (1, 1), (9, 64)):
        yy, xx = np.mgrid[0:h, 0:w]
        gray = ((yy * 4 + xx * 3) % 256).astype(np.uint8)
        out = decode_jpeg(encode_jpeg_gray(gray))
        assert out.shape == (h, w)
        assert np.abs(out.astype(int) - gray.astype(int)).max() <= 1, (h, w)
    noisy = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_gray(noisy, q=4))
    assert np.abs(out.astype(int) - noisy.astype(int)).max() <= 4 * 8


def test_codecs_avi_mjpeg_demux():
    """AVI-MJPEG mux → demux yields the exact frame bytes; decoded
    frames match the known-good source arrays; 'rec '-grouped and
    padded (odd-size) chunks demux too; non-AVI raises."""
    import struct

    import numpy as np

    from dataguards_ray.codecs import (decode_jpeg, encode_avi_mjpeg,
                                       encode_jpeg_gray,
                                       iter_avi_mjpeg_frames)

    yy, xx = np.mgrid[0:12, 0:16]
    srcs = [((yy * 3 + xx * 5 + 17 * i) % 256).astype(np.uint8)
            for i in range(5)]
    frames = [encode_jpeg_gray(s) for s in srcs]
    avi = encode_avi_mjpeg(frames, 16, 12, fps=5)
    back = list(iter_avi_mjpeg_frames(avi))
    assert back == frames
    for s, f in zip(srcs, back):
        assert np.abs(decode_jpeg(f).astype(int) - s.astype(int)).max() <= 1

    # hand-build a movi with a 'rec ' group and an audio chunk to skip
    def chunk(four, data):
        return four + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) & 1 else b"")

    movi_body = (b"movi" + chunk(b"01wb", b"AUDIO") +
                 chunk(b"LIST", b"rec " + chunk(b"00dc", frames[0])) +
                 chunk(b"00db", frames[1]))
    body = b"AVI " + chunk(b"LIST", movi_body)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    assert list(iter_avi_mjpeg_frames(blob)) == [frames[0], frames[1]]

    with pytest.raises(ValueError, match="AVI"):
        list(iter_avi_mjpeg_frames(b"\x00\x01\x02\x03" * 8))


def test_multimodal_real_video_frames(ray_session):
    """End-to-end real video path: AVI-MJPEG fixture → sample_frames
    actor pool (every 2nd frame) → real JPEG decode; frame pixel means
    match the deterministic source arrays."""
    import numpy as np
    import ray.data

    from dataguards_ray.codecs import decode_jpeg
    from dataguards_ray.multimodal import (decode_images,
                                           encode_mjpeg_video,
                                           sample_frames)

    rows = [{"vid_id": i, "video": encode_mjpeg_video(8, 6, 6, seed=i)}
            for i in range(4)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    frames = sample_frames(ds, every_k=2)
    got = frames.take_all()
    assert len(got) == 4 * 3  # 6 frames, every 2nd
    assert sorted({r["frame_idx"] for r in got}) == [0, 2, 4]
    # decoded mean matches recomputing the source frame directly
    r0 = next(r for r in got if r["vid_id"] == 2 and r["frame_idx"] == 2)
    rng = np.random.RandomState(2)
    base = rng.randint(0, 256, (6, 8)).astype(np.int64)
    src = ((base + 11 * 2) % 256).astype(np.uint8)
    dec_px = decode_jpeg(bytes(r0["image"]))
    assert dec_px.shape == src.shape
    # q=1 is near-lossless: random noise rounds within ±2 through DCT
    assert np.abs(dec_px.astype(int) - src.astype(int)).max() <= 2
    dec = decode_images(frames).take_all()
    assert len(dec) == 12 and all("mean_px" in r for r in dec)


def _gif_bytes(frames, palette, sw=None, sh=None, *, bg=0, gce=None,
               interlace_frame=None):
    """Minimal GIF89a writer for tests — independent of the decoder:
    literal LZW (a CLEAR code before every pixel code keeps every code
    a root, codesize fixed), global palette, optional per-frame GCE
    (disposal, transparency) and interlace flag.

    frames: list of (x, y, 2-D index array); gce: list of
    (disposal, transparent_idx|None) per frame."""
    import struct

    import numpy as np

    mcs = max(2, int(np.ceil(np.log2(len(palette)))))
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    cs = mcs + 1

    def lzw_literal(idx):
        acc = 0
        nb = 0
        out = bytearray()

        def put(code):
            nonlocal acc, nb
            acc |= code << nb
            nb += cs
            while nb >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nb -= 8

        put(clear)
        for v in idx.flatten():
            put(int(v))
            put(clear)  # dictionary never grows; codesize stays fixed
        put(eoi)
        if nb:
            out.append(acc & 0xFF)
        return bytes(out)

    sw = sw or max(x + a.shape[1] for x, _, a in frames)
    sh = sh or max(y + a.shape[0] for _, y, a in frames)
    pbits = mcs - 1
    head = (b"GIF89a" + struct.pack("<HHBBB", sw, sh, 0x80 | pbits, bg, 0)
            + b"".join(bytes(c) for c in palette)
            + b"\x00" * (3 * ((2 << pbits) - len(palette))))
    body = b""
    for fi, (x, y, idx) in enumerate(frames):
        g = gce[fi] if gce else None
        if g is not None:
            disp, trans = g
            flags = (disp << 2) | (1 if trans is not None else 0)
            body += (b"\x21\xf9\x04" + bytes([flags]) + b"\x00\x00"
                     + bytes([trans if trans is not None else 0]) + b"\x00")
        ilace = 0x40 if interlace_frame == fi else 0
        if ilace:
            order = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                order.extend(range(start, idx.shape[0], step))
            idx = idx[order]
        body += (b"\x2c" + struct.pack("<HHHHB", x, y, idx.shape[1],
                                       idx.shape[0], ilace)
                 + bytes([mcs]))
        data = lzw_literal(idx)
        for off in range(0, len(data), 255):
            chunk = data[off:off + 255]
            body += bytes([len(chunk)]) + chunk
        body += b"\x00"
    return head + body + b"\x3b"


def test_codecs_gif_decode():
    """GIF: literal-LZW frames, compositing with disposal 1/2/3,
    transparency, interlace, decode_image dispatch — vs known-good
    arrays computed by hand."""
    import numpy as np

    from dataguards_ray.codecs import decode_gif, decode_image, iter_gif_frames

    pal = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0)]
    gray = [0, 255, 76, 150]  # BT.601 of the palette rows

    # single frame, full screen
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    g = decode_gif(_gif_bytes([(0, 0, idx)], pal))
    exp = np.array([[gray[v] for v in row] for row in idx])
    assert np.array_equal(g, exp)
    w, h, g2 = decode_image(_gif_bytes([(0, 0, idx)], pal))
    assert (w, h) == (3, 2) and np.array_equal(g2, exp)

    # interlaced frame decodes identically
    big = np.arange(40, dtype=np.uint8).reshape(10, 4) % 4
    plain = decode_gif(_gif_bytes([(0, 0, big)], pal))
    laced = decode_gif(_gif_bytes([(0, 0, big)], pal, interlace_frame=0))
    assert np.array_equal(plain, laced)

    # animation: disposal 1 (keep), 2 (restore bg), 3 (restore prev),
    # transparency punches through to the canvas
    f0 = np.full((2, 2), 1, dtype=np.uint8)          # white screen
    f1 = np.array([[2]], dtype=np.uint8)              # red dot at (1,1)
    f2 = np.array([[3, 0]], dtype=np.uint8)           # green+transparent
    frames = list(iter_gif_frames(_gif_bytes(
        [(0, 0, f0), (1, 1, f1), (0, 0, f2)], pal, sw=2, sh=2,
        gce=[(1, None), (3, None), (0, 0)])))
    assert len(frames) == 3
    assert np.array_equal(frames[0], np.full((2, 2), 255))
    exp1 = np.array([[255, 255], [255, 76]])
    assert np.array_equal(frames[1], exp1)
    # frame 1 had disposal 3 → canvas back to all-white before frame 2;
    # frame 2: green at (0,0), index 0 transparent → keeps white
    exp2 = np.array([[150, 255], [255, 255]])
    assert np.array_equal(frames[2], exp2)

    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)


def test_multimodal_gif_video_source(ray_session):
    """Animated GIF rides the video path: frames composited, sampled by
    the actor pool as decodable PGM blobs, decoded back bit-exact."""
    import numpy as np
    import ray.data

    from dataguards_ray.codecs import decode_image
    from dataguards_ray.multimodal import sample_frames

    pal = [(i, i, i) for i in range(4)]
    f0 = np.zeros((3, 4), dtype=np.uint8)
    f1 = np.full((3, 4), 1, dtype=np.uint8)
    f2 = np.full((3, 4), 3, dtype=np.uint8)
    gif = _gif_bytes([(0, 0, f0), (0, 0, f1), (0, 0, f2)], pal)
    ds = ray.data.from_arrow(pa.Table.from_pylist(
        [{"vid_id": 1, "video": gif}]))
    got = sorted(sample_frames(ds, every_k=2).take_all(),
                 key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in got] == [0, 2]
    w, h, px0 = decode_image(bytes(got[0]["image"]))
    assert (w, h) == (4, 3) and np.array_equal(px0, np.zeros((3, 4)))
    _, _, px2 = decode_image(bytes(got[1]["image"]))
    assert np.array_equal(px2, np.full((3, 4), 3))


def test_asof_bucketed_kernel_invariant_in_num_buckets(ray_session):
    """Round-5: the hash-bucketed multi-key as-of kernel must produce
    identical matches for ANY bucket count (1 = everything in one
    kernel call, big = one key per bucket), incl. ts ties, left rows
    with no match, and null left keys."""
    import random

    import ray.data

    from dataguards_ray.joins import asof_join

    rng = random.Random(99)
    lefts, rights = [], []
    used = set()
    for i in range(400):
        k = None if i % 37 == 0 else f"u{i % 11}"
        lefts.append({"lid": i, "ts": rng.randrange(0, 3_000), "k": k})
        rk = f"u{rng.randrange(0, 13)}"  # some keys never on the left
        rts = rng.randrange(0, 3_000)
        if (rk, rts) not in used:
            used.add((rk, rts))
            rights.append({"rid": 10_000 + i, "ts": rts, "k": rk})
    lds = ray.data.from_items(lefts).repartition(5)
    rds = ray.data.from_items(rights).repartition(3)

    def res(nb):
        out = asof_join(lds, rds, key="k", ts_col="ts", num_buckets=nb)
        return sorted((r["lid"], r["rid"]) for r in out.take_all())

    base = res(256)
    assert res(1) == base
    assert res(7) == base
    assert res(4096) == base
    # null-keyed left rows survive unmatched
    nulls = {r["lid"] for r in lefts if r["k"] is None}
    matched = {a for a, b in base if b is not None}
    assert nulls.isdisjoint(matched) and len(base) == len(lefts)


def test_broadcast_lookup_vectorized_matches_scalar(ray_session):
    """Round-5: the index_in/take fast path of broadcast_lookup must
    equal dict.get semantics — missing keys, null keys, defaults,
    typed outputs — and exotic dicts (None value) keep the scalar
    path with identical results."""
    import ray.data

    from dataguards_ray.joins import broadcast_lookup

    rows = [{"k": "a"}, {"k": "b"}, {"k": "zz"}, {"k": None}, {"k": "c"}]
    ds = ray.data.from_arrow(pa.Table.from_pylist(
        rows, schema=pa.schema([("k", pa.string())])))

    cases = [
        ({"a": 1, "b": 2, "c": 3}, None, [1, 2, None, None, 3]),
        ({"a": 1, "b": 2, "c": 3}, -9, [1, 2, -9, -9, 3]),
        ({"a": 1, "b": None, "c": 3}, -9, [1, None, -9, -9, 3]),  # scalar path
        ({"a": "x", "c": "y"}, "d", ["x", "d", "d", "d", "y"]),
    ]
    for d, default, expect in cases:
        out = broadcast_lookup(ds, d, "k", "v", default=default)
        got = [r["v"] for r in sorted(out.take_all(),
                                      key=lambda r: (r["k"] is None,
                                                     r["k"] or ""))]
        exp = [e for _, e in sorted(zip(rows, expect),
                                    key=lambda t: (t[0]["k"] is None,
                                                   t[0]["k"] or ""))]
        assert got == exp, (d, default)

    # int keys + typed output
    ids = ray.data.from_items([{"k": i} for i in (1, 2, 99)])
    out = broadcast_lookup(ids, {1: 10, 2: 20}, "k", "v", default=0,
                           out_type=pa.int64())
    assert sorted((r["k"], r["v"]) for r in out.take_all()) == [
        (1, 10), (2, 20), (99, 0)]


def test_multimodal_on_error_policies(ray_session):
    """Round-5 crawl robustness: corrupt media blobs skip or flag per
    stage policy instead of killing the job; default stays fail-fast."""
    import numpy as np
    import ray.data

    from dataguards_ray.multimodal import (audio_features, decode_images,
                                           encode_fake_audio,
                                           encode_fake_image,
                                           encode_mjpeg_video,
                                           sample_frames)

    good = encode_fake_image(4, 3, seed=1)
    corrupt_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 10  # truncated
    unknown = b"WEBPVP8 garbage"
    imgs = ray.data.from_arrow(pa.Table.from_pylist(
        [{"doc_id": 1, "image": good}, {"doc_id": 2, "image": corrupt_png},
         {"doc_id": 3, "image": unknown}],
        schema=pa.schema([("doc_id", pa.int64()), ("image", pa.binary())])))

    with pytest.raises(Exception):
        decode_images(imgs).take_all()  # default: fail fast
    kept = decode_images(imgs, on_error="skip").take_all()
    assert [r["doc_id"] for r in kept] == [1]
    flagged = sorted(decode_images(imgs, on_error="flag").take_all(),
                     key=lambda r: r["doc_id"])
    assert flagged[0]["decode_error"] is None
    assert "ValueError" in flagged[1]["decode_error"]
    assert "NotImplementedError" in flagged[2]["decode_error"]
    assert flagged[1]["width"] is None

    auds = ray.data.from_arrow(pa.Table.from_pylist(
        [{"doc_id": 1, "audio": encode_fake_audio(8000, 100, seed=2)},
         {"doc_id": 2, "audio": b"ID3 not decodable"}],
        schema=pa.schema([("doc_id", pa.int64()), ("audio", pa.binary())])))
    assert [r["doc_id"] for r in
            audio_features(auds, on_error="skip").take_all()] == [1]
    fa = sorted(audio_features(auds, on_error="flag").take_all(),
                key=lambda r: r["doc_id"])
    assert fa[0]["decode_error"] is None and fa[1]["sample_rate"] is None

    vids = ray.data.from_arrow(pa.Table.from_pylist(
        [{"vid_id": 1, "video": encode_mjpeg_video(8, 6, 4, seed=3)},
         {"vid_id": 2, "video": b"mp4 is not supported here"}],
        schema=pa.schema([("vid_id", pa.int64()), ("video", pa.binary())])))
    got = sample_frames(vids, every_k=2, on_error="skip").take_all()
    assert sorted({r["vid_id"] for r in got}) == [1]
    with pytest.raises(Exception):
        sample_frames(vids, every_k=2).take_all()


def test_codec_forged_header_guards():
    """Round-5 hardening sweep: forged crawl headers across EVERY
    format fail instantly with a clean error — no multi-GB allocation,
    no hour-long loop, no exotic exception leaking past on_error."""
    import struct
    import zlib

    import numpy as np

    from dataguards_ray.codecs import (decode_image, decode_jpeg,
                                       decode_wav, iter_avi_mjpeg_frames)

    def png_chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    # PNG: forged dims AND a small-dims decompression bomb
    ihdr = struct.pack(">IIBBBBB", 50000, 50000, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + png_chunk(b"IHDR", ihdr)
           + png_chunk(b"IDAT", zlib.compress(b"\x00" * 1000))
           + png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="implausible"):
        decode_image(png)
    ihdr2 = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    png2 = (b"\x89PNG\r\n\x1a\n" + png_chunk(b"IHDR", ihdr2)
            + png_chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
            + png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="bomb"):
        decode_image(png2)

    # BMP: zero width / huge skinny height
    def bmp(w, h):
        return (b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24,
                              0, 0, 0, 0, 0, 0) + b"\x00" * 50)

    with pytest.raises(ValueError):
        decode_image(bmp(0, 2_000_000))
    with pytest.raises(ValueError):
        decode_image(bmp(1, 60_000_000))

    # JPEG: component/sampling blowup under the pixel cap
    def seg(m, p):
        return bytes([0xFF, m]) + struct.pack(">H", len(p) + 2) + p

    comps = b"".join(bytes([i, 0x44, 0]) for i in range(255))
    jpg = (b"\xff\xd8" + seg(0xDB, b"\x00" + bytes([1] * 64))
           + seg(0xC0, struct.pack(">BHHB", 8, 7000, 9000, 255) + comps)
           + seg(0xDA, bytes([1, 1, 0, 0, 63, 0])) + b"\x00\x00\xff\xd9")
    with pytest.raises(ValueError, match="coefficient volume"):
        decode_jpeg(jpg)

    # AVI: forged nested-LIST size must not spin on empty slices
    avi = (b"RIFF" + struct.pack("<I", 0xFFFFFFF0) + b"AVI " + b"LIST"
           + struct.pack("<I", 0xFFFFFFF0) + b"movi" + b"\x00" * 16)
    assert list(iter_avi_mjpeg_frames(avi)) == []

    # WAV: forged zero sample rate
    fmt_body = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
           + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError, match="sample rate"):
        decode_wav(wav)

    # truncated GIF through the VIDEO path normalizes to ValueError
    from dataguards_ray.multimodal import _iter_video_frames

    with pytest.raises(ValueError, match="corrupt GIF video"):
        list(_iter_video_frames(b"GIF89a\x00\x00\x00\x00"))


def test_embedding_dedup_empty_corpus():
    """0-row corpus → 0 rows kept, no crash: np.array([]) from an empty
    take_all is 1-D and axis-1 normalization used to AxisError; an
    empty Arrow list column also can't reshape(0, -1) (found probing
    `dg dedup --mode embedding` on an empty parquet)."""
    import ray.data

    from dataguards_ray.similarity import (_normalize, _to_matrix,
                                           embedding_dedup_filter)

    m = _normalize(np.array([], dtype=np.float64))
    assert m.shape == (0, 0)
    fx = _to_matrix(pa.chunked_array([], type=pa.list_(pa.float64())))
    assert fx.shape == (0, 0)
    fx3 = _to_matrix(pa.chunked_array([], type=pa.list_(pa.float64(), 3)))
    assert fx3.shape == (0, 3)

    empty = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float64()))}))
    assert embedding_dedup_filter(empty, 0.9).count() == 0
