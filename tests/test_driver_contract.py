"""Driver-contract guard: entry() + a representative queries() subset vs
their oracle_sql() through DuckDB at sf0.001 (full sweep:
tools/check_queries.py at sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SUBSET = [
    "tpch_q1", "join_customer_orders", "topk_orders", "latest_event_per_user",
    "cfd_violations", "dc_pair_violations", "dedup_docs_exact", "knn_embeddings",
    "hash_sample", "token_counts", "sessionize_events", "bpe_token_counts",
    "asof_click_purchase", "token_histogram",
    "dc_pair_ineq", "cfd_mixed_tableau", "rule_not_matches", "rule_in_between",
    "window_hopping_events", "median_price_by_priority", "stratified_sample_docs",
    "rollup_counts", "p90_price_by_priority", "distinct_customers_by_priority",
    "running_total_per_user",
    "first_last_event_type", "tpch_q4_shape", "tpch_q17_shape", "tpch_q18_shape",
    "tpch_q2_shape", "tpch_q7_shape", "tpch_q8_shape", "tpch_q9_shape",
    "tpch_q11_shape", "tpch_q13_shape", "tpch_q15_shape", "tpch_q16_shape",
    "tpch_q19_shape", "tpch_q20_shape", "tpch_q21_shape", "tpch_q22_shape",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import __ray_entry__ as e

    ds = e.entry()
    df = ds.to_pandas()
    assert len(df) >= 1
    assert {"url", "keep", "drop_rule", "text_scrubbed", "dedup_keep"} <= set(df.columns)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_sql(name, ddb):
    import pyarrow as pa
    import ray.data

    import __ray_entry__ as e

    res = e.queries()[name](SF)
    if isinstance(res, ray.data.Dataset):
        mine = res.to_pandas()
    elif isinstance(res, pa.Table):
        mine = res.to_pandas()
    else:
        mine = res
    ref = ddb.sql(e.oracle_sql()[name]).df()
    pd.testing.assert_frame_equal(_canon(mine), _canon(ref), check_dtype=False)
