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
