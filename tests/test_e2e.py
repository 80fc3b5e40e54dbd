"""End-to-end: Ray pipeline must reproduce the oracle exactly (SURVEY §5.1).

Targets (BASELINE.md): keep/drop F1 ≥ 0.99 (we assert == 1.0), scrubbed
text byte-identical per url, survivor set identical after both dedups —
and all of it invariant under partition count (§5.4).
"""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from conftest import corpus_path, golden_path


def _run_annotate(path: str, num_blocks: int | None = None):
    import ray.data

    from dataguards_ray.pipeline import FilterPipeline

    ds = ray.data.read_parquet(path)
    if num_blocks is not None:
        ds = ds.repartition(num_blocks)
    return FilterPipeline().annotate(ds).to_pandas()


def _assert_matches_golden(ann: pd.DataFrame, golden: pd.DataFrame):
    a = ann.set_index("url").sort_index()
    g = golden.to_pandas().set_index("url").sort_index() if not isinstance(golden, pd.DataFrame) else golden.set_index("url").sort_index()
    assert set(a.index) == set(g.index)
    pd.testing.assert_series_equal(a["keep"], g["keep"], check_names=False)
    assert (a["text_scrubbed"] == g["text_scrubbed"]).all()
    assert (a["lang_id"] == g["lang_id"]).all()
    assert (a["ppl"].astype("float32") == g["ppl"].astype("float32")).all()
    assert (a["lang_score"].astype("float32") == g["lang_score"].astype("float32")).all()
    # drop_rule: same first-violated rule (nullable)
    assert (a["drop_rule"].fillna("") == g["drop_rule"].fillna("")).all()


@pytest.mark.usefixtures("ray_session")
def test_annotate_matches_oracle(golden500):
    ann = _run_annotate(corpus_path(500))
    _assert_matches_golden(ann, golden500.to_pandas())


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("blocks", [1, 7])
def test_partition_invariance(golden500, blocks):
    ann = _run_annotate(corpus_path(500), num_blocks=blocks)
    _assert_matches_golden(ann, golden500.to_pandas())


@pytest.mark.usefixtures("ray_session")
def test_full_run_survivors_and_lineage(tmp_path, golden500):
    import pyarrow.parquet as pq

    from dataguards_ray import io as dg_io
    from dataguards_ray.pipeline import FilterPipeline
    from oracle.oracle import oracle_run

    out = str(tmp_path / "out")
    recs = FilterPipeline().run(corpus_path(500), out)
    res = oracle_run(pq.read_table(corpus_path(500)))

    surv = sorted(dg_io.read_filtered(out).to_pandas()["url"])
    assert surv == res["survivor_urls"]

    assert sum(r["input_rows"] for r in recs) == res["golden"].num_rows
    assert sum(r["kept_rows"] for r in recs) == len(res["survivor_urls"])
    assert all(r["stage"] == "final" for r in recs)

    # lineage rule counters == oracle rule drops
    agg: dict[str, int] = {}
    for r in recs:
        for rule, n in r["rule_counts"].items():
            agg[rule] = agg.get(rule, 0) + n
    assert agg == res["rule_drops"]

    # manifests on disk all reached 'final'
    stages = dg_io.partitions_by_stage(out)
    assert stages["final"] == {r["part_id"] for r in recs}
    shutil.rmtree(out)


@pytest.mark.usefixtures("ray_session")
def test_resume_skips_done_partitions(tmp_path):
    """Kill-after-k-partitions resume equivalence (BASELINE.md)."""
    import pyarrow.parquet as pq

    from dataguards_ray import io as dg_io
    from dataguards_ray.pipeline import FilterPipeline

    path = corpus_path(500)
    full_out = str(tmp_path / "full")
    FilterPipeline().run(path, full_out)

    # simulate a crash: keep only first 10 partitions' outputs
    part_out = str(tmp_path / "partial")
    FilterPipeline().run(path, part_out)
    done = sorted(dg_io.partitions_by_stage(part_out)["final"])
    import os

    for pid in done[10:]:
        os.remove(os.path.join(part_out, "_lineage", f"part-{pid:05d}.json"))
        for pref in ("part", "kept"):
            f = os.path.join(part_out, f"{pref}-{pid:05d}.parquet")
            if os.path.exists(f):
                os.remove(f)

    recs2 = FilterPipeline().run(path, part_out, resume=True)
    assert {r["part_id"] for r in recs2} == set(done)

    a = dg_io.read_filtered(full_out).to_pandas().sort_values("url").reset_index(drop=True)
    b = dg_io.read_filtered(part_out).to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_correctness_tier_2000_docs():
    """Correctness-tier corpus (SURVEY §5: bigger fixture sweep) — full
    per-url parity at 2000 docs."""
    from conftest import golden_path
    import pyarrow.parquet as pq

    golden = pq.read_table(golden_path(2000)).to_pandas()
    ann = _run_annotate(corpus_path(2000))
    _assert_matches_golden(ann, golden)


@pytest.mark.usefixtures("ray_session")
def test_alternate_seed_and_num_parts(tmp_path):
    """Parity holds for a different generator seed and partition count
    (catches seed- or P-dependent assumptions)."""
    import pyarrow.parquet as pq

    from dataguards_ray import io as dg_io
    from dataguards_ray.pipeline import FilterPipeline
    from oracle.oracle import oracle_run

    path = corpus_path(300, seed=7)
    out = str(tmp_path / "out")
    recs = FilterPipeline(num_parts=17).run(path, out)
    res = oracle_run(pq.read_table(path))
    surv = sorted(dg_io.read_filtered(out).to_pandas()["url"])
    assert surv == res["survivor_urls"]
    assert len({r["part_id"] for r in recs}) <= 17
    assert sum(r["input_rows"] for r in recs) == res["golden"].num_rows


@pytest.mark.usefixtures("ray_session")
def test_actor_pool_and_individual_step_chains_match_default(golden500):
    """The explicit actor-pool variant (use_actors=True) and the
    unfused LangId→Perplexity→Score chain must produce the same
    annotations as the default fused task pool (same kernels, different
    execution shapes)."""
    import ray.data

    from dataguards_ray.pipeline import (FilterPipeline, FusedAnnotateStep,
                                         LangIdStep, PerplexityStep, PrepareStep,
                                         ScoreStep)

    ds = ray.data.read_parquet(corpus_path(500))
    golden = golden500.to_pandas()

    # concurrency=1 per stage: the test session has 4 CPUs and a
    # full-width pool starves downstream operators (known Ray behavior
    # documented in bench.py)
    actor_pipe = FilterPipeline(
        steps=[PrepareStep(), FusedAnnotateStep(use_actors=True, concurrency=1)]
    )
    _assert_matches_golden(actor_pipe.annotate(ds).to_pandas(), golden)

    step_pipe = FilterPipeline(
        steps=[PrepareStep(), LangIdStep(concurrency=1),
               PerplexityStep(concurrency=1), ScoreStep(concurrency=1)]
    )
    _assert_matches_golden(step_pipe.annotate(ds).to_pandas(), golden)


@pytest.mark.usefixtures("ray_session")
def test_null_urls_never_dedup():
    """Oracle/pipeline alignment (round-2 review): distinct null-url rows
    are schema-invalid, NOT duplicates of each other — both engines must
    keep them as separate (dropped) rows."""
    import pyarrow as pa
    import ray.data

    from dataguards_ray.pipeline import FilterPipeline
    from dataguards_ray.schema import PAGES_SCHEMA
    from oracle.oracle import oracle_run

    rows = [
        {"url": None, "warc_ts": 1_000, "html": None, "text": "first invalid", "lang": "en"},
        {"url": None, "warc_ts": 2_000, "html": None, "text": "second invalid", "lang": "en"},
        {"url": "http://a/x", "warc_ts": 1_000, "html": None,
         "text": "ok words " * 60, "lang": "en"},
    ]
    t = pa.Table.from_pylist(rows).cast(PAGES_SCHEMA)
    golden = oracle_run(t)["golden"]
    ann = FilterPipeline().annotate(ray.data.from_arrow(t)).to_pandas()
    assert golden.num_rows == 3 and len(ann) == 3
    assert (ann["url"].isna().sum()) == 2
    assert not ann[ann["url"].isna()]["keep"].any()
    assert sum(1 for g in golden.to_pylist() if g["url"] is None) == 2


@pytest.mark.usefixtures("ray_session")
def test_degenerate_corpora(tmp_path):
    """Empty corpus and all-dropped corpus both finish cleanly."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from dataguards_ray.pipeline import FilterPipeline
    from dataguards_ray.schema import PAGES_SCHEMA

    empty = tmp_path / "empty.parquet"
    pq2.write_table(PAGES_SCHEMA.empty_table(), str(empty))
    assert FilterPipeline().run(str(empty), str(tmp_path / "out_empty")) == []

    rows = [{"url": f"http://x/{i}", "warc_ts": 1000 + i, "html": None,
             "text": "zz", "lang": "en"} for i in range(20)]
    alldrop = tmp_path / "alldrop.parquet"
    pq2.write_table(pa.Table.from_pylist(rows).cast(PAGES_SCHEMA), str(alldrop))
    recs = FilterPipeline().run(str(alldrop), str(tmp_path / "out_drop"))
    assert sum(r["input_rows"] for r in recs) == 20
    assert sum(r.get("kept_rows", 0) for r in recs) == 0


@pytest.mark.usefixtures("ray_session")
def test_fresh_run_refuses_dirty_out_dir(tmp_path):
    """ADVICE fix: run(resume=False) must fail fast when out_dir holds a
    previous run's manifests/parts instead of silently merging them."""
    import pytest

    from dataguards_ray.pipeline import FilterPipeline

    path = corpus_path(500)
    out = str(tmp_path / "out")
    FilterPipeline().run(path, out)
    with pytest.raises(ValueError, match="already contains run artifacts"):
        FilterPipeline().run(path, out)


@pytest.mark.usefixtures("ray_session")
def test_resume_mid_phase2_crash(tmp_path):
    """Crash DURING finalize: some partitions final, some still only
    annotated (kept file + manifest present, final file deleted) —
    resume must re-finalize exactly the unfinished ones and converge to
    the clean run's output."""
    import json
    import os

    from dataguards_ray import io as dg_io
    from dataguards_ray.pipeline import FilterPipeline

    path = corpus_path(500)
    clean_out = str(tmp_path / "clean")
    FilterPipeline().run(path, clean_out)

    crash_out = str(tmp_path / "crash")
    FilterPipeline().run(path, crash_out)
    final = sorted(dg_io.partitions_by_stage(crash_out)["final"])
    # roll 8 partitions back to the annotated stage (phase-2 crash shape)
    for pid in final[:8]:
        f = os.path.join(crash_out, f"part-{pid:05d}.parquet")
        if os.path.exists(f):
            os.remove(f)
        mp = os.path.join(crash_out, "_lineage", f"part-{pid:05d}.json")
        m = json.load(open(mp))
        m["stage"] = "annotated"
        for k in ("kept_rows", "dropped_rows", "output_file"):
            m.pop(k, None)
        json.dump(m, open(mp, "w"))

    recs = FilterPipeline().run(path, crash_out, resume=True)
    assert all(r["stage"] == "final" for r in recs)
    a = dg_io.read_filtered(clean_out).to_pandas().sort_values("url").reset_index(drop=True)
    b = dg_io.read_filtered(crash_out).to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_resume_ignores_stray_tmp_files(tmp_path):
    """Atomic-write protocol: leftover .tmp files from a crash are inert."""
    import os

    from dataguards_ray import io as dg_io
    from dataguards_ray.pipeline import FilterPipeline

    path = corpus_path(500)
    out = str(tmp_path / "out")
    FilterPipeline().run(path, out)
    # simulate crash debris
    open(os.path.join(out, ".tmp-part-00001.parquet-deadbeef"), "wb").close()
    open(os.path.join(out, "_lineage", ".tmp-00002-deadbeef"), "w").close()
    stages = dg_io.partitions_by_stage(out)
    n_final = len(stages["final"])
    recs = FilterPipeline().run(path, out, resume=True)
    assert len(dg_io.partitions_by_stage(out)["final"]) == n_final
    assert sum(r["kept_rows"] for r in recs) == 195


@pytest.mark.usefixtures("ray_session")
def test_empty_corpus_run_and_stats(tmp_path):
    """A 0-row input runs the full filter → read-back → stats chain
    without crashing: no part files are written, read_filtered returns
    an empty dataset instead of failing read_parquet([]), and
    domain_stats short-circuits (found probing the CLI with an empty
    parquet)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dataguards_ray import io as dg_io
    from dataguards_ray.pipeline import FilterPipeline
    from fixtures.gen import pages_table
    from jobs.stats_job import domain_stats, lineage_stats

    src = str(tmp_path / "empty.parquet")
    pq.write_table(pages_table(1).slice(0, 0), src)
    out = str(tmp_path / "out")
    recs = FilterPipeline().run(src, out)
    assert sum(r["input_rows"] for r in recs) == 0

    assert dg_io.read_filtered(out).count() == 0
    rep = lineage_stats(out)
    assert rep["input_rows"] == 0 and rep["kept_rows"] == 0
    assert domain_stats(out) == []
