"""E2 reporting: lineage-manifest stats must match the oracle's
rule-drop counts and per-language retention (SURVEY §3 E2, §5 F4)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from conftest import corpus_path


@pytest.mark.usefixtures("ray_session")
def test_lineage_stats_match_oracle(tmp_path):
    from dataguards_ray.pipeline import FilterPipeline
    from jobs.stats_job import domain_stats, lineage_stats
    from oracle.oracle import oracle_run

    path = corpus_path(500)
    out = str(tmp_path / "out")
    FilterPipeline().run(path, out)
    res = oracle_run(pq.read_table(path))

    stats = lineage_stats(out)
    assert stats["rule_drops"] == res["rule_drops"]
    want_ret = {
        lg: (v["total"], v["kept"]) for lg, v in res["lang_retention"].items()
    }
    got_ret = {
        lg: (v["total"], v["kept"]) for lg, v in stats["lang_retention"].items()
    }
    assert got_ret == want_ret
    assert stats["kept_rows"] == len(res["survivor_urls"])

    # fixture urls live under *.example.com / dup*.example.org → the
    # registered-domain report collapses to those two
    top = domain_stats(out, 5)
    assert top and top[0][0] == "example.com" and all(n > 0 for _, n in top)


def test_key_skew_report(ray_session):
    """Skew profiler: a hot key dominates frac_of_total and skew_ratio;
    distinct estimate is near-exact at tiny cardinality."""
    import ray.data

    from dataguards_ray.profile import key_skew_report

    rows = [{"k": "hot"}] * 80 + [{"k": f"cold{i}"} for i in range(20)]
    t = key_skew_report(ray.data.from_items(rows).repartition(4), "k", top=3)
    d = {r["key_value"]: r for r in t.to_pylist()}
    assert d["hot"]["n"] == 80
    assert abs(d["hot"]["frac_of_total"] - 0.8) < 1e-9
    assert d["hot"]["n_distinct_est"] == 21
    assert d["hot"]["skew_ratio"] > 10  # 80 vs mean 100/21


def test_key_skew_report_null_hot_key(ray_session):
    """ADVICE r02 item #1: a 94%-null key column must report the null
    group as the hot key (the engine's encoded-key groupbys DO send the
    null group to one reducer), not n=0/skew 1.0."""
    import ray.data

    from dataguards_ray.profile import key_skew_report

    rows = [{"k": None} for _ in range(80)] + [{"k": f"k{i}"} for i in range(5)]
    t = key_skew_report(ray.data.from_items(rows).repartition(3), "k", top=3)
    d = {r["key_value"]: r for r in t.to_pylist()}
    assert d["None"]["n"] == 80
    assert abs(d["None"]["frac_of_total"] - 80 / 85) < 1e-9
    assert d["None"]["skew_ratio"] > 4  # 80 vs mean 85/6


def test_key_skew_report_non_hot_null_group(ray_session):
    """Review r03: a null group OUTSIDE the top-k must still count as a
    key in the mean, so hot keys' skew_ratio isn't understated."""
    import ray.data

    from dataguards_ray.profile import key_skew_report

    rows = ([{"k": "hot1"}] * 50 + [{"k": "hot2"}] * 50
            + [{"k": None}] * 5
            + [{"k": f"c{i}"} for i in range(20) for _ in (0, 1)])
    t = key_skew_report(ray.data.from_items(rows).repartition(3), "k", top=2)
    d = {r["key_value"]: r for r in t.to_pylist()}
    assert set(d) == {"hot1", "hot2"}
    total, keys = 50 + 50 + 5 + 40, 22 + 1  # 22 non-null keys + null group
    assert abs(d["hot1"]["skew_ratio"] - 50 / (total / keys)) < 0.35


def test_ppl_bucket_tags(ray_session):
    """CCNet head/middle/tail: per-lang tertile proportions within one
    log-bin, head = lowest perplexity, deterministic across
    partitioning; precomputed-column path model-free and identical."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dataguards_ray import langdata, spec
    from dataguards_ray.textstats import ppl_bucket_tags

    import random

    rows = []
    for i in range(240):
        lg = spec.LANGS[i % 2]  # two languages, 120 docs each
        rng = random.Random(1000 + i)
        rows.append({"doc_id": i, "text": langdata.clean_doc(rng, lg)})
    rows.append({"doc_id": 999, "text": ""})  # unscored -> 'und'

    def run(nparts):
        ds = ray.data.from_items(rows).repartition(nparts)
        out = ppl_bucket_tags(ds).to_pandas().sort_values("doc_id")
        return out

    a = run(3)
    b = run(7)
    assert a[["doc_id", "ppl_bucket"]].values.tolist() == \
        b[["doc_id", "ppl_bucket"]].values.tolist()
    assert a[a["doc_id"] == 999]["ppl_bucket"].iloc[0] == "und"

    scored = a[a["ppl_bucket"] != "und"]
    for lg, grp in scored.groupby("lang_id"):
        n = len(grp)
        counts = grp["ppl_bucket"].value_counts()
        # tertiles: each bucket within a few docs of n/3 (ties share a
        # log-bin)
        for lab in ("head", "middle", "tail"):
            assert abs(counts.get(lab, 0) - n / 3) <= max(3, 0.1 * n), (lg, dict(counts))
        # head really is the cleanest: max head ppl <= min tail ppl
        assert grp[grp["ppl_bucket"] == "head"]["ppl"].max() <= \
            grp[grp["ppl_bucket"] == "tail"]["ppl"].min()

    # precomputed-column path (flagship output shape): identical buckets
    pre = a[["doc_id", "lang_id", "ppl"]].copy()
    pre["text"] = [r["text"] for r in sorted(rows, key=lambda r: r["doc_id"])]
    ds2 = ray.data.from_arrow(pa.Table.from_pandas(pre, preserve_index=False))
    c = (ppl_bucket_tags(ds2, lang_col="lang_id", ppl_col="ppl")
         .to_pandas().sort_values("doc_id"))
    assert c["ppl_bucket"].tolist() == a["ppl_bucket"].tolist()
