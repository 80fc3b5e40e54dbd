"""Driver contract (see module docstring history): entry() smoke,
queries() per-operator callables, oracle_sql() DuckDB mirrors.

Ray is initialised by the DRIVER before this module is imported — nothing
here (or in dataguards_ray) calls ray.init()/ray.shutdown().

Float-determinism policy for SQL-checked aggregates: money/value sums
are computed as integer cents via FLOOR(x*100 + 0.5) in BOTH engines
(identical IEEE-double expression → identical bits → exact int64 sums);
counts are int64; avgs are avoided (sum+count instead).  Similarity
scores are never returned — only ids/ranks (ulp-level cross-engine
rounding cannot flap whole result sets).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from datetime import datetime
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SF_SMOKE = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _read(sf_dir: str, name: str, columns: list[str] | None = None):
    from dataguards_ray.io import read_table

    return read_table(sf_dir, name, columns=columns)


def _cents(arr) -> pa.Array:
    """int64 cents = FLOOR(x*100 + 0.5) — mirror of the SQL expression."""
    v = pc.cast(arr, pa.float64())
    return pc.cast(pc.floor(pc.add(pc.multiply(v, 100.0), 0.5)), pa.int64())


_CENTS_SQL = "CAST(FLOOR({x}*100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship E1 over sf0.001 documents mapped to the pages schema:
    extract → langid → perplexity → quality rules → scrub → dedup flags."""
    from dataguards_ray.adapters import documents_as_pages
    from dataguards_ray.pipeline import FilterPipeline

    ds = documents_as_pages(SF_SMOKE)
    return FilterPipeline().annotate(ds)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_tpch_q1(sf_dir: str):
    from dataguards_ray.aggregates import grouped_agg

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b.column("l_shipdate"), pa.scalar(datetime(1998, 9, 2))))
        disc_price = pc.multiply(
            pc.cast(b.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(b.column("l_discount"), pa.float64())),
        )
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "qty_c": _cents(b.column("l_quantity")),
                "base_c": _cents(b.column("l_extendedprice")),
                "disc_c": _cents(disc_price),
            }
        )

    out = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [("qty_c", "sum", "sum_qty_cents"), ("base_c", "sum", "sum_base_cents"),
         ("disc_c", "sum", "sum_disc_cents"), ("qty_c", "count", "count_order")],
    )
    return out


_SQL_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({_CENTS_SQL.format(x='l_quantity')}) AS BIGINT) AS sum_qty_cents,
       CAST(SUM({_CENTS_SQL.format(x='l_extendedprice')}) AS BIGINT) AS sum_base_cents,
       CAST(SUM({_CENTS_SQL.format(x='l_extendedprice*(1.0-l_discount)')}) AS BIGINT) AS sum_disc_cents,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def _q_filter_project(sf_dir: str):
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"])

    def f(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(b.column("l_quantity"), 30.0),
                    pc.less_equal(b.column("l_quantity"), 40.0)),
            pc.greater(b.column("l_discount"), 0.05),
        )
        b = b.filter(m)
        rev = pc.multiply(
            pc.cast(b.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(b.column("l_discount"), pa.float64())),
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_linenumber": b.column("l_linenumber"),
                "revenue_cents": _cents(rev),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


_SQL_FILTER_PROJECT = f"""
SELECT l_orderkey, l_linenumber,
       {_CENTS_SQL.format(x='l_extendedprice*(1.0-l_discount)')} AS revenue_cents
FROM lineitem
WHERE l_quantity >= 30.0 AND l_quantity <= 40.0 AND l_discount > 0.05
"""


def _q_join_customer_orders(sf_dir: str):
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import broadcast_lookup

    cust = {r["c_custkey"]: r["c_mktsegment"]
            for r in _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).take_all()}
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = broadcast_lookup(orders, cust, "o_custkey", "c_mktsegment",
                              out_type=pa.string())

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"c_mktsegment": b.column("c_mktsegment"),
             "price_c": _cents(b.column("o_totalprice"))}
        )

    return grouped_agg(
        joined.map_batches(prep, batch_format="pyarrow"),
        ["c_mktsegment"],
        [("price_c", "sum", "total_cents"), ("price_c", "count", "n_orders")],
    )


_SQL_JOIN_CUST_ORDERS = f"""
SELECT c_mktsegment,
       CAST(SUM({_CENTS_SQL.format(x='o_totalprice')}) AS BIGINT) AS total_cents,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def _q_join_region_nation_customer(sf_dir: str):
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import broadcast_lookup

    regions = {r["r_regionkey"]: r["r_name"] for r in _read(sf_dir, "region").take_all()}
    nations = {r["n_nationkey"]: regions[r["n_regionkey"]]
               for r in _read(sf_dir, "nation").take_all()}
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = broadcast_lookup(cust, nations, "c_nationkey", "r_name", out_type=pa.string())
    return grouped_agg(joined, ["r_name"], [("c_custkey", "count", "n_customers")])


_SQL_JOIN_RNC = """
SELECT r_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def _q_semi_join(sf_dir: str):
    from dataguards_ray.joins import semi_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    return semi_join(cust, orders, "c_custkey", right_key="o_custkey")


_SQL_SEMI = "SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)"


def _q_anti_join(sf_dir: str):
    """Customers without an URGENT order (filtered right side keeps the
    result non-empty at every sf — empty frames lose schema in pandas)."""
    from dataguards_ray.joins import anti_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'"
    )
    return anti_join(cust, orders, "c_custkey", right_key="o_custkey")


_SQL_ANTI = (
    "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
    "(SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')"
)


def _q_hash_join_supplier_nation(sf_dir: str):
    """Large-large path: Dataset.join (hash-partitioned)."""
    from dataguards_ray.joins import hash_join

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    j = hash_join(sup, nat, on=["s_nationkey"], right_on=["n_nationkey"], num_partitions=4)
    return j.select_columns(["s_suppkey", "n_name"])


_SQL_HASH_JOIN = "SELECT s_suppkey, n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey"


def _q_topk_orders(sf_dir: str):
    from dataguards_ray.aggregates import topk

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": b.column("o_orderkey"),
             "price_cents": _cents(b.column("o_totalprice"))}
        )

    return topk(ds.map_batches(prep, batch_format="pyarrow"),
                [("price_cents", True), ("o_orderkey", False)], 10)


_SQL_TOPK = f"""
SELECT o_orderkey, {_CENTS_SQL.format(x='o_totalprice')} AS price_cents
FROM orders ORDER BY price_cents DESC, o_orderkey ASC LIMIT 10
"""


def _q_distinct(sf_dir: str):
    from dataguards_ray.aggregates import distinct

    return distinct(_read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"]),
                    ["l_returnflag", "l_linestatus"])


_SQL_DISTINCT = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def _q_union_all_names(sf_dir: str):
    r = _read(sf_dir, "region", ["r_name"]).rename_columns({"r_name": "name"})
    n = _read(sf_dir, "nation", ["n_name"]).rename_columns({"n_name": "name"})
    return r.union(n)


_SQL_UNION = "SELECT r_name AS name FROM region UNION ALL SELECT n_name AS name FROM nation"


def _q_nations_without_negbal_suppliers(sf_dir: str):
    from dataguards_ray.aggregates import distinct
    from dataguards_ray.joins import anti_join

    nat = _read(sf_dir, "nation", ["n_nationkey"])
    sup = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"]).filter(
        expr="s_acctbal < 0.0"
    )
    return distinct(anti_join(nat, sup, "n_nationkey", right_key="s_nationkey"),
                    ["n_nationkey"])


_SQL_EXCEPT = (
    "SELECT n_nationkey FROM nation EXCEPT "
    "SELECT s_nationkey FROM supplier WHERE s_acctbal < 0"
)


def _q_latest_event_per_user(sf_dir: str):
    from dataguards_ray.joins import latest_by_key

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    out = latest_by_key(ds, "user_id", "ts", "event_id")
    return out.select_columns(["user_id", "event_id", "event_type", "value"])


_SQL_LATEST_EVENT = """
SELECT user_id, event_id, event_type, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def _q_json_props_stats(sf_dir: str):
    from dataguards_ray.aggregates import grouped_agg

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def parse(b: pa.Table) -> pa.Table:
        ks = [json.loads(p)["k"] for p in b.column("props").to_pylist()]
        return pa.table(
            {"event_type": b.column("event_type"), "k": pa.array(ks, type=pa.int64())}
        )

    return grouped_agg(ds.map_batches(parse, batch_format="pyarrow"),
                       ["event_type"], [("k", "sum", "sum_k"), ("k", "count", "n")])


_SQL_JSON = """
SELECT event_type, CAST(SUM(CAST(json_extract(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def _q_window_tumbling(sf_dir: str):
    from dataguards_ray.aggregates import grouped_agg

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        win = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()), 3600000000.0)), pa.int64())
        return pa.table(
            {"event_type": b.column("event_type"), "win": win,
             "value_c": _cents(b.column("value"))}
        )

    return grouped_agg(ds.map_batches(prep, batch_format="pyarrow"),
                       ["event_type", "win"],
                       [("value_c", "sum", "sum_value_cents"), ("value_c", "count", "n")])


def _q_window_distinct_users(sf_dir: str):
    """Per-window COUNT(DISTINCT user): tumbling 1 h windows ×
    aggregates.grouped_count_distinct — the windowed-dedup combo (two
    thin pre-aggregated passes, no raw-row shuffle)."""
    from dataguards_ray.aggregates import grouped_count_distinct

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def prep(b: pa.Table) -> pa.Table:
        us = pc.cast(b.column("ts"), pa.int64())
        win = pc.cast(pc.floor(pc.divide(
            pc.cast(us, pa.float64()), 3600000000.0)), pa.int64())
        return pa.table({"win": win, "user_id": b.column("user_id")})

    return grouped_count_distinct(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["win"], "user_id", "n_users")


_SQL_WINDOW_DISTINCT = """
SELECT CAST(FLOOR(epoch_us(ts)/3600000000.0) AS BIGINT) AS win,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY win
"""


_SQL_WINDOW = f"""
SELECT event_type, CAST(FLOOR(epoch_us(ts)/3600000000.0) AS BIGINT) AS win,
       CAST(SUM({_CENTS_SQL.format(x='value')}) AS BIGINT) AS sum_value_cents,
       COUNT(*) AS n
FROM events GROUP BY event_type, win
"""


def _q_running_total(sf_dir: str):
    """Cumulative window: SUM OVER (PARTITION BY user ORDER BY ts,
    event_id) via events.running_total (per-key cumsum map_groups)."""
    from dataguards_ray.events import running_total

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return running_total(ds)


_SQL_RUNNING_TOTAL = f"""
SELECT user_id, event_id,
       CAST(SUM({_CENTS_SQL.format(x='value')}) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM events
"""


def _q_window_hopping(sf_dir: str):
    """Hopping windows (1 h size / 15 min hop): vectorized 4-way explode
    + pre-aggregated groupby (events.hopping_window)."""
    from dataguards_ray.events import hopping_window

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    return hopping_window(ds, ["event_type"])


_SQL_WINDOW_HOP = f"""
SELECT event_type,
       CAST(FLOOR(epoch_us(ts)/900000000.0) - s.k AS BIGINT) AS win,
       COUNT(*) AS n,
       CAST(SUM({_CENTS_SQL.format(x='value')}) AS BIGINT) AS sum_value_cents
FROM events CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS k) s
GROUP BY event_type, win
"""


def _q_mad_price_by_priority(sf_dir: str):
    """Robust dispersion (aggregates.grouped_mad): exact median absolute
    deviation of price cents per priority — two discrete-median passes,
    group medians broadcast between them."""
    from dataguards_ray.aggregates import grouped_mad

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderpriority": b.column("o_orderpriority"),
             "price_c": _cents(b.column("o_totalprice"))}
        )

    return grouped_mad(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["o_orderpriority"], "price_c", "mad_price_cents",
    )


_SQL_MAD = f"""
WITH m AS (
  SELECT o_orderpriority,
         quantile_disc({_CENTS_SQL.format(x='o_totalprice')}, 0.5) AS med
  FROM orders GROUP BY o_orderpriority)
SELECT o.o_orderpriority,
       CAST(quantile_disc(
            abs({_CENTS_SQL.format(x='o_totalprice')} - m.med), 0.5)
         AS BIGINT) AS mad_price_cents
FROM orders o JOIN m ON m.o_orderpriority = o.o_orderpriority
GROUP BY o.o_orderpriority
"""


def _q_median_price_by_priority(sf_dir: str):
    """Exact per-group discrete median (aggregates.grouped_median) —
    order statistics need co-located groups, so this is the one
    map_groups shuffle among the aggregate queries."""
    from dataguards_ray.aggregates import grouped_median

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderpriority": b.column("o_orderpriority"),
             "price_c": _cents(b.column("o_totalprice"))}
        )

    return grouped_median(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["o_orderpriority"], "price_c", "median_price_cents",
    )


_SQL_MEDIAN = f"""
SELECT o_orderpriority,
       quantile_disc({_CENTS_SQL.format(x='o_totalprice')}, 0.5) AS median_price_cents
FROM orders GROUP BY o_orderpriority
"""


def _q_p90_price_by_priority(sf_dir: str):
    """Exact per-group discrete p90 (aggregates.grouped_quantile)."""
    from dataguards_ray.aggregates import grouped_quantile

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderpriority": b.column("o_orderpriority"),
             "price_c": _cents(b.column("o_totalprice"))}
        )

    return grouped_quantile(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["o_orderpriority"], "price_c", "p90_price_cents", 0.9,
    )


_SQL_P90 = f"""
SELECT o_orderpriority,
       quantile_disc({_CENTS_SQL.format(x='o_totalprice')}, 0.9) AS p90_price_cents
FROM orders GROUP BY o_orderpriority
"""


def _q_distinct_customers_by_priority(sf_dir: str):
    """Exact COUNT(DISTINCT) per group via the two-level pre-aggregated
    pipeline (aggregates.grouped_count_distinct)."""
    from dataguards_ray.aggregates import grouped_count_distinct

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_custkey"])
    return grouped_count_distinct(ds, ["o_orderpriority"], "o_custkey", "n_customers")


_SQL_COUNT_DISTINCT = """
SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders GROUP BY o_orderpriority
"""


def _q_stratified_sample_docs(sf_dir: str):
    """Deterministic stratified sample: first 3 docs per source ordered
    by (md5 fingerprint, doc_id) — row_number() semantics."""
    from dataguards_ray.aggregates import stratified_sample
    from dataguards_ray.textstats import add_fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    withfp = add_fingerprint(ds, "text", "fp")
    out = stratified_sample(withfp, "source", 3, [("fp", False), ("doc_id", False)])
    return out.select_columns(["source", "doc_id"])


_SQL_STRATIFIED = """
SELECT source, doc_id FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
  FROM documents) WHERE rn <= 3
"""


def _q_top2_orders_per_priority(sf_dir: str):
    """Per-group top-k (top-2 orders by price per priority) — the
    stratified-sample kernel under a value ordering."""
    from dataguards_ray.aggregates import stratified_sample

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderpriority": b.column("o_orderpriority"),
             "o_orderkey": b.column("o_orderkey"),
             "price_c": _cents(b.column("o_totalprice"))}
        )

    out = stratified_sample(
        ds.map_batches(prep, batch_format="pyarrow"),
        "o_orderpriority", 2, [("price_c", True), ("o_orderkey", False)],
    )
    return out


_SQL_TOP2_PER_GROUP = f"""
SELECT o_orderpriority, o_orderkey, price_c FROM (
  SELECT o_orderpriority, o_orderkey,
         {_CENTS_SQL.format(x='o_totalprice')} AS price_c,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY {_CENTS_SQL.format(x='o_totalprice')} DESC,
                                     o_orderkey) AS rn
  FROM orders) WHERE rn <= 2
"""


def _q_rollup_counts(sf_dir: str):
    """GROUPING SETS ((flag,status),(flag),()) via aggregates.grouping_sets
    — one pre-aggregated pass per set, union with null rolled-up keys."""
    from dataguards_ray.aggregates import grouping_sets

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"l_returnflag": b.column("l_returnflag"),
             "l_linestatus": b.column("l_linestatus"),
             "qty_c": _cents(b.column("l_quantity"))}
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    return grouping_sets(
        prepped,
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        [("qty_c", "count", "n"), ("qty_c", "sum", "sum_qty_cents")],
    )


_SQL_ROLLUP = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM({_CENTS_SQL.format(x='l_quantity')}) AS BIGINT) AS sum_qty_cents
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def _q_orders_snapshot_diff(sf_dir: str):
    """Snapshot reconciliation (joins.table_diff): orders vs a
    deterministically mutated copy (orderkey%7 rows deleted, %11 rows
    repriced, %13 rows re-added under key+10M) — added/removed/changed
    per key, equal rows drop.  One projected-column cogroup shuffle."""
    from dataguards_ray.joins import table_diff

    base = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def mutate(b: pa.Table) -> pa.Table:
        k = b.column("o_orderkey")
        p = pc.cast(b.column("o_totalprice"), pa.float64())
        keep = pc.not_equal(_pc_mod(k, 7), 0)
        bump = pc.equal(_pc_mod(k, 11), 0)
        upd = pa.table(
            {"o_orderkey": k,
             "o_totalprice": pc.if_else(bump, pc.add(p, 1.0), p)}
        ).filter(keep)
        extra = pa.table(
            {"o_orderkey": pc.add(k, 10_000_000),
             "o_totalprice": p}
        ).filter(pc.equal(_pc_mod(k, 13), 0))
        return pa.concat_tables([upd, extra])

    mutated = base.map_batches(mutate, batch_format="pyarrow")
    return table_diff(base, mutated, "o_orderkey").sort("o_orderkey")


def _pc_mod(arr, d: int):
    """Arrow int modulo (no pc.mod kernel in this pyarrow build)."""
    import numpy as np

    v = (arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
         ).to_numpy(zero_copy_only=False)
    return pa.array(np.mod(v, d), type=pa.int64())


_SQL_SNAPSHOT_DIFF = """
WITH r AS (
  SELECT o_orderkey,
         o_totalprice + CASE WHEN o_orderkey % 11 = 0 THEN 1.0 ELSE 0 END
           AS o_totalprice
  FROM orders WHERE o_orderkey % 7 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice FROM orders
  WHERE o_orderkey % 13 = 0
), l AS (SELECT o_orderkey, o_totalprice FROM orders)
SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
       CASE WHEN r.o_orderkey IS NULL THEN 'removed'
            WHEN l.o_orderkey IS NULL THEN 'added'
            ELSE 'changed' END AS status
FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey
WHERE r.o_orderkey IS NULL OR l.o_orderkey IS NULL
   OR l.o_totalprice IS DISTINCT FROM r.o_totalprice
ORDER BY o_orderkey
"""


def _q_cube_order_counts(sf_dir: str):
    """GROUP BY CUBE (aggregates.grouping_sets with all 4 subsets of
    (status, priority)): order counts + total cents at every
    granularity.  Same machinery as rollup — one partials-only pass per
    set over the materialized prep."""
    from dataguards_ray.aggregates import grouping_sets

    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderstatus": b.column("o_orderstatus"),
             "o_orderpriority": b.column("o_orderpriority"),
             "price_c": _cents(b.column("o_totalprice"))}
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    return grouping_sets(
        prepped,
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"],
         ["o_orderpriority"], []],
        [("price_c", "count", "n"), ("price_c", "sum", "sum_cents")],
    )


_SQL_CUBE = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM({_CENTS_SQL.format(x='o_totalprice')}) AS BIGINT) AS sum_cents
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def _q_salted_source_counts(sf_dir: str):
    from dataguards_ray.aggregates import salted_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return salted_groupby(ds, ["source"], [("doc_id", "count", "n_docs")],
                          salt_n=8, salt_source="doc_id")


_SQL_SALTED = "SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source"


def _q_check_config_orders(sf_dir: str):
    """Declarative rules-as-DATA surface (rules/config.py +
    jobs/check_job.py — the DataGuards user runs a JSON config, not
    Python): range + regex + predicate rules loaded from a config dict,
    compiled by RuleSet, violating orders with their FIRST violated rule
    in config order."""
    from dataguards_ray.rules.config import rules_from_config

    cfg = {"rules": [
        {"type": "range", "name": "price.range", "col": "o_totalprice",
         "lo": 0, "hi": 400000},
        {"type": "regex", "name": "priority.format",
         "col": "o_orderpriority", "pattern": "^[1-5]-"},
        {"type": "predicate", "name": "status.known", "all_of": [
            {"col": "o_orderstatus", "op": "in", "value": ["O", "F", "P"]}]},
    ]}
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_totalprice", "o_orderpriority",
                "o_orderstatus"])
    out = rules_from_config(cfg).evaluate(ds).filter(expr="keep == False")
    return out.select_columns(["o_orderkey", "drop_rule"]).sort("o_orderkey")


_SQL_CHECK_CONFIG = """
SELECT o_orderkey,
       CASE WHEN o_totalprice IS NULL
                 OR NOT (o_totalprice >= 0 AND o_totalprice <= 400000)
              THEN 'price.range'
            WHEN o_orderpriority IS NULL
                 OR NOT regexp_matches(o_orderpriority, '^[1-5]-')
              THEN 'priority.format'
            WHEN o_orderstatus IS NULL
                 OR o_orderstatus NOT IN ('O', 'F', 'P')
              THEN 'status.known' END AS drop_rule
FROM orders
WHERE (o_totalprice IS NULL OR NOT (o_totalprice >= 0 AND o_totalprice <= 400000))
   OR (o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-'))
   OR (o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F', 'P'))
ORDER BY o_orderkey
"""


def _q_rule_range_violations(sf_dir: str):
    from dataguards_ray.rules import RangeRule, RuleSet

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    out = RuleSet([RangeRule("qty.range", "l_quantity", 5.0, 45.0)]).evaluate(ds)
    out = out.filter(expr="keep == False")
    return out.select_columns(["l_orderkey", "l_linenumber", "drop_rule"])


_SQL_RULE_RANGE = """
SELECT l_orderkey, l_linenumber, 'qty.range' AS drop_rule
FROM lineitem
WHERE l_quantity IS NULL OR NOT (l_quantity >= 5.0 AND l_quantity <= 45.0)
"""


def _q_rule_predicate_violations(sf_dir: str):
    from dataguards_ray.rules import RangeRule, RegexRule, RuleSet

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    rules = RuleSet([
        RangeRule("bal.nonneg", "c_acctbal", lo=0.0),
        RegexRule("name.format", "c_name", r"^Customer#"),
    ])
    out = rules.evaluate(ds).filter(expr="keep == False")
    return out.select_columns(["c_custkey", "drop_rule"])


_SQL_RULE_PRED = """
SELECT c_custkey,
       CASE WHEN c_acctbal IS NULL OR c_acctbal < 0.0 THEN 'bal.nonneg'
            WHEN c_name IS NULL OR NOT regexp_matches(c_name, '^Customer#') THEN 'name.format' END AS drop_rule
FROM customer
WHERE (c_acctbal IS NULL OR c_acctbal < 0.0)
   OR (c_name IS NULL OR NOT regexp_matches(c_name, '^Customer#'))
"""


def _q_cfd_violations(sf_dir: str):
    from dataguards_ray.rules.cfd import CFD

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
    cfd = CFD("fd.order_flag", ["l_orderkey"], "l_returnflag",
              [{"l_orderkey": "_", "l_returnflag": "_"}])
    keys = cfd.violating_keys(ds)
    return pa.table({"l_orderkey": pa.array(sorted(int(k) for k in keys), type=pa.int64())})


_SQL_CFD = """
SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
HAVING COUNT(DISTINCT l_returnflag) > 1
"""


def _q_cfd_mixed_tableau(sf_dir: str):
    """Multi-attribute-LHS CFD with MIXED tableau rows (round-2 verdict
    item #9): one wildcard-Y row (true FD on the BUILDING subset:
    nationkey → acctbal) plus one all-constant row (FURNITURE/3
    customers must have acctbal 1000.0)."""
    from dataguards_ray.rules.cfd import CFD

    ds = _read(sf_dir, "customer",
               ["c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal"])
    cfd = CFD(
        "cfd.seg_nation_bal",
        ["c_mktsegment", "c_nationkey"],
        "c_acctbal",
        [
            {"c_mktsegment": "BUILDING", "c_nationkey": "_", "c_acctbal": "_"},
            {"c_mktsegment": "FURNITURE", "c_nationkey": 3, "c_acctbal": 1000.0},
        ],
    )
    out = cfd.apply_shuffle(ds)
    return out.map_batches(
        lambda b: b.filter(b.column("__viol_cfd.seg_nation_bal")).select(["c_custkey"]),
        batch_format="pyarrow",
    )


_SQL_CFD_MIXED = """
SELECT c_custkey FROM customer c
WHERE (c.c_mktsegment = 'BUILDING' AND c.c_nationkey IN (
         SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
         GROUP BY c_nationkey HAVING COUNT(DISTINCT c_acctbal) > 1))
   OR (c.c_mktsegment = 'FURNITURE' AND c.c_nationkey = 3 AND c.c_acctbal <> 1000.0)
"""


def _q_rule_not_matches(sf_dir: str):
    """R1 `not_matches` regex shape: parts whose type starts with
    PROMO/ECONOMY violate the rule (must_match=False)."""
    from dataguards_ray.rules import RegexRule, RuleSet

    ds = _read(sf_dir, "part", ["p_partkey", "p_type"])
    rules = RuleSet(
        [RegexRule("type.no_promo", "p_type", "^(PROMO|ECONOMY)", must_match=False)]
    )
    out = rules.evaluate(ds).filter(expr="keep == False")
    return out.select_columns(["p_partkey", "drop_rule"])


_SQL_RULE_NOT_MATCHES = """
SELECT p_partkey, 'type.no_promo' AS drop_rule
FROM part WHERE regexp_matches(p_type, '^(PROMO|ECONOMY)')
"""


def _q_rule_in_between(sf_dir: str):
    """R1 `in` + `between` predicate atoms fused in one PredicateRule."""
    from dataguards_ray.rules import Predicate, PredicateRule, RuleSet

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    rule = PredicateRule(
        "ord.priority_price",
        [Predicate("o_orderpriority", "in", ["1-URGENT", "2-HIGH", "3-MEDIUM"]),
         Predicate("o_totalprice", "between", (1000.0, 200000.0))],
    )
    out = RuleSet([rule]).evaluate(ds).filter(expr="keep == False")
    return out.select_columns(["o_orderkey", "drop_rule"])


_SQL_RULE_IN_BETWEEN = """
SELECT o_orderkey, 'ord.priority_price' AS drop_rule
FROM orders
WHERE o_orderpriority IS NULL OR o_totalprice IS NULL
   OR NOT (o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
           AND o_totalprice BETWEEN 1000.0 AND 200000.0)
"""


def _q_dc_single_violations(sf_dir: str):
    from dataguards_ray.rules import DenialConstraint, Predicate, RuleSet

    ds = _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])
    dc = DenialConstraint(
        "dc.negbal_building",
        single=[Predicate("c_acctbal", "<", 0.0), Predicate("c_mktsegment", "==", "BUILDING")],
    )
    out = RuleSet([dc]).evaluate(ds).filter(expr="keep == False")
    return out.select_columns(["c_custkey"])


_SQL_DC_SINGLE = "SELECT c_custkey FROM customer WHERE c_acctbal < 0.0 AND c_mktsegment = 'BUILDING'"


def _q_dc_pair_violations(sf_dir: str):
    from dataguards_ray.rules import Atom, DenialConstraint

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_retailprice"])
    dc = DenialConstraint("dc.brand_type_price", eq_keys=["p_brand", "p_type"],
                          pair_atoms=[Atom("p_retailprice", "!=", "p_retailprice")])
    out = dc.apply_shuffle(ds)
    return out.map_batches(
        lambda b: b.filter(b.column("__viol_dc.brand_type_price")).select(["p_partkey"]),
        batch_format="pyarrow",
    )


_SQL_DC_PAIR = """
SELECT p_partkey FROM part p
WHERE EXISTS (SELECT 1 FROM part q WHERE q.p_brand = p.p_brand AND q.p_type = p.p_type
              AND q.p_partkey <> p.p_partkey AND q.p_retailprice <> p.p_retailprice)
"""


def _q_dc_pair_ineq(sf_dir: str):
    """Two-inequality-atom pairwise DC via the O(n log n) dominance sweep
    (rules/dc.two_atom_flags): ¬∃ t,t′ same brand with t.price >
    t′.price ∧ t.size < t′.size — flags every row in a witness pair."""
    from dataguards_ray.rules import Atom, DenialConstraint

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice", "p_size"])
    dc = DenialConstraint(
        "dc.price_size_dominance",
        eq_keys=["p_brand"],
        pair_atoms=[Atom("p_retailprice", ">", "p_retailprice"),
                    Atom("p_size", "<", "p_size")],
    )
    out = dc.apply_shuffle(ds)
    return out.map_batches(
        lambda b: b.filter(b.column("__viol_dc.price_size_dominance")).select(["p_partkey"]),
        batch_format="pyarrow",
    )


_SQL_DC_PAIR_INEQ = """
SELECT p_partkey FROM part p
WHERE EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_brand = p.p_brand AND q.p_partkey <> p.p_partkey
    AND ((p.p_retailprice > q.p_retailprice AND p.p_size < q.p_size)
      OR (q.p_retailprice > p.p_retailprice AND q.p_size < p.p_size)))
"""


def _q_dedup_docs_exact(sf_dir: str):
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.textstats import add_fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    withfp = add_fingerprint(ds, "text", "fp")
    out = grouped_agg(withfp, ["fp"], [("doc_id", "min", "doc_id")])
    return out.select_columns(["doc_id"])


_SQL_DEDUP_DOCS = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)"


def _q_dedup_docs_keep_longest(sf_dir: str):
    """Exact dedup with a QUALITY winner (neardup.exact_dedup_filter
    keep_by): per duplicate group keep the LONGEST doc (ties → min id)
    — real pipelines keep the best duplicate, not the lowest id."""
    from dataguards_ray.neardup import exact_dedup_filter

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    out = exact_dedup_filter(ds, keep_by=("n_chars", True))
    return out.select_columns(["doc_id"]).sort("doc_id")


_SQL_DEDUP_KEEP_LONGEST = """
SELECT doc_id FROM (
  SELECT doc_id, ROW_NUMBER() OVER (
      PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) WHERE rn = 1
ORDER BY doc_id
"""


def _q_regex_extract_source(sf_dir: str):
    """Vectorized regexp capture (M-family): pc.extract_regex pulls the
    numeric id out of `source` (both engines run RE2), docs counted per
    id.  Non-matching rows drop (mirrored by WHERE regexp_matches)."""
    from dataguards_ray.aggregates import grouped_agg

    ds = _read(sf_dir, "documents", ["source"])

    def f(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(b.column("source"), pattern=r"^src(?P<num>\d+)$")
        num = pc.cast(pc.struct_field(ex, "num"), pa.int64())
        t = pa.table({"num": num})
        return t.filter(pc.is_valid(num))

    out = grouped_agg(ds.map_batches(f, batch_format="pyarrow"),
                      ["num"], [("num", "count", "n")])
    return out.sort("num")


_SQL_REGEX_EXTRACT = r"""
SELECT CAST(regexp_extract(source, '^src(\d+)$', 1) AS BIGINT) AS num,
       COUNT(*) AS n
FROM documents WHERE regexp_matches(source, '^src(\d+)$')
GROUP BY num ORDER BY num
"""


def _q_top_sources(sf_dir: str):
    from dataguards_ray.aggregates import grouped_agg, topk

    counts = grouped_agg(_read(sf_dir, "documents", ["doc_id", "source"]),
                         ["source"], [("doc_id", "count", "n_docs")])
    return topk(counts, [("n_docs", True), ("source", False)], 5)


_SQL_TOP_SOURCES = """
SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
ORDER BY n_docs DESC, source ASC LIMIT 5
"""


def _q_token_counts(sf_dir: str):
    from dataguards_ray.textstats import add_token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_token_count(ds).select_columns(["doc_id", "n_tokens"])


_SQL_TOKENS = r"SELECT doc_id, CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_tokens FROM documents"


def _q_quality_scores(sf_dir: str):
    from dataguards_ray.textstats import add_quality_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_quality_scores(ds).select_columns(["doc_id", "n_tokens", "word_chars"])


_SQL_QUALITY = r"""
SELECT doc_id, CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '\w')) AS BIGINT) AS word_chars
FROM documents
"""


def _q_doc_fingerprints(sf_dir: str):
    from dataguards_ray.textstats import add_fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_fingerprint(ds).select_columns(["doc_id", "fingerprint"])


_SQL_FINGERPRINT = "SELECT doc_id, md5(text) AS fingerprint FROM documents"


def _q_sessionize_events(sf_dir: str):
    """Gap-based session windows (30 min) per user over events."""
    from dataguards_ray.events import sessionize

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return sessionize(ds, gap_us=1_800_000_000)


_SQL_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts_us, cents,
         -- (ts_us, event_id) = the same total order the pipeline uses;
         -- ordering by ts_us alone is nondeterministic on duplicate ts
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, MIN(ts_us) AS session_start_us,
       COUNT(*) AS n_events, CAST(SUM(cents) AS BIGINT) AS sum_value_cents
FROM sess GROUP BY user_id, sid
"""


_BPE_PAT = "'[a-z]+| ?[[:alpha:]]+| ?[0-9]+| ?[^\\s[:alpha:]0-9]+|\\s+"


def _q_bpe_token_counts(sf_dir: str):
    """BPE-ish token count: GPT-2-style pretokenizer regex (RE2-safe
    subset, no lookarounds), vectorized via the pyarrow count kernel."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b.column("text"), _BPE_PAT)
        return pa.table(
            {"doc_id": b.column("doc_id"), "n_bpe_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


_SQL_BPE_TOKENS = (
    "SELECT doc_id, CAST(len(regexp_extract_all(text, '''[a-z]+| ?[[:alpha:]]+| ?[0-9]+| ?[^\s[:alpha:]0-9]+|\s+')) AS BIGINT)"
    " AS n_bpe_tokens FROM documents"
)


def _q_token_histogram(sf_dir: str):
    """Quality-score distribution: doc count per 50-token bucket."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.textstats import WORD_RE2

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(b.column("text"), WORD_RE2), pa.int64())
        bucket = pc.cast(
            pc.floor(pc.divide(pc.cast(n, pa.float64()), 50.0)), pa.int64()
        )
        return pa.table({"bucket": bucket, "doc_id": b.column("doc_id")})

    return grouped_agg(ds.map_batches(prep, batch_format="pyarrow"),
                       ["bucket"], [("doc_id", "count", "n_docs")])


_SQL_TOKEN_HIST = r"""
SELECT CAST(FLOOR(len(regexp_extract_all(text, '\w+'))/50.0) AS BIGINT) AS bucket,
       COUNT(*) AS n_docs
FROM documents GROUP BY bucket
"""


def _q_asof_click_purchase(sf_dir: str):
    """As-of join: each click matched to the user's latest prior purchase
    (backward, inclusive) — joins.asof_join vs DuckDB ASOF LEFT JOIN."""
    from dataguards_ray.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "ts", "user_id"])
    purch = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "ts", "user_id"])
    out = asof_join(clicks, purch, key="user_id", ts_col="ts")

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "click_id": b.column("event_id"),
                "purchase_id": pc.cast(b.column("event_id_r"), pa.int64()),
            }
        )

    return out.map_batches(proj, batch_format="pyarrow")


_SQL_ASOF = """
SELECT c.event_id AS click_id, CAST(p.event_id AS BIGINT) AS purchase_id
FROM (SELECT event_id, ts, user_id FROM events WHERE event_type='click') c
ASOF LEFT JOIN (SELECT event_id, ts, user_id FROM events WHERE event_type='purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def _q_asof_next_purchase(sf_dir: str):
    """Forward as-of join (joins.asof_join_forward): each click matched
    to the user's EARLIEST following purchase — the backward kernel on
    negated timestamps (inherits salting/carry-in unchanged)."""
    from dataguards_ray.joins import asof_join_forward

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "ts", "user_id"])
    purch = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "ts", "user_id"])
    out = asof_join_forward(clicks, purch, key="user_id", ts_col="ts")

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {"click_id": b.column("event_id"),
             "purchase_id": pc.cast(b.column("event_id_r"), pa.int64())}
        )

    return out.map_batches(proj, batch_format="pyarrow")


_SQL_ASOF_FWD = """
SELECT c.event_id AS click_id, CAST(p.event_id AS BIGINT) AS purchase_id
FROM (SELECT event_id, ts, user_id FROM events WHERE event_type='click') c
ASOF LEFT JOIN (SELECT event_id, ts, user_id FROM events WHERE event_type='purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""


def _q_hash_sample(sf_dir: str):
    """T3: deterministic hash-based sampling (parallelism-invariant —
    NOT ds.random_sample); md5-prefix mod 1000 < 200 → ~20% of docs."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        mask = [
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 1000 < 200
            for t in b.column("text").to_pylist()
        ]
        return b.filter(pa.array(mask, type=pa.bool_())).select(["doc_id"])

    return ds.map_batches(f, batch_format="pyarrow")


_SQL_HASH_SAMPLE = """
SELECT doc_id FROM documents
WHERE ('0x' || substr(md5(text), 1, 8))::BIGINT % 1000 < 200
"""


def _q_knn_embeddings(sf_dir: str):
    from dataguards_ray.similarity import knn_cosine

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = sorted(
        (r for r in ds.take_all() if r["vec_id"] < 5), key=lambda r: r["vec_id"]
    )
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [int(r["vec_id"]) for r in qrows]
    t = knn_cosine(ds, queries, 6)
    return pa.table(
        {
            # map positional query index -> the actual query vec_id so the
            # SQL mirror holds even if vec_ids aren't contiguous from 0
            "query_id": pa.array([qids[j] for j in t.column("query_id").to_pylist()],
                                 type=pa.int64()),
            "vec_id": t.column("vec_id"),
            "rank": pc.cast(t.column("rank"), pa.int64()),
        }
    )


_SQL_KNN = """
SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
       CAST(row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id ASC
       ) AS BIGINT) AS rank
FROM (SELECT * FROM embeddings WHERE vec_id < 5) q CROSS JOIN embeddings e
QUALIFY rank <= 6
"""


def _q_near_dup_embeddings(sf_dir: str):
    from dataguards_ray.similarity import near_dup_cosine

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return near_dup_cosine(ds, 0.4)


_SQL_NEAR_DUP_EMB = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
"""


# ---- rows-only (non-SQL-expressible) --------------------------------------


def _mutated_documents(sf_dir: str):
    """documents ∪ deterministic near-copies of doc_id<10 (near-dup bait)."""
    import ray.data

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    base = sorted(ds.filter(expr="doc_id < 10").take_all(), key=lambda r: r["doc_id"])
    copies = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] + 1_000_000 for r in base], type=pa.int64()),
            "text": pa.array([r["text"] + " xyzzy plugh" for r in base], type=pa.string()),
        }
    )
    return ds.union(ray.data.from_arrow(copies))


def _q_minhash_near_dups(sf_dir: str):
    from dataguards_ray.neardup import minhash_near_dup_pairs

    t = minhash_near_dup_pairs(_mutated_documents(sf_dir), threshold=0.5)
    return t.select(["id_a", "id_b"])


def _q_minhash_near_dups_digest(sf_dir: str):
    """The thin-exchange (digest-payload) LSH discovery — contract is
    row-identity with _q_minhash_near_dups (parity-pinned in
    tests/test_neardup_thin.py); the driver row proves the 100 TB
    shuffle path runs on the same corpus."""
    from dataguards_ray.neardup import minhash_near_dup_pairs

    t = minhash_near_dup_pairs(
        _mutated_documents(sf_dir), threshold=0.5, payload="digest")
    return t.select(["id_a", "id_b"])


def _web_documents(sf_dir: str):
    """documents with deterministic web-page structure (the synthetic
    corpus has no punctuation): a period every 10 words, a shared
    3-sentence boilerplate tail, and a shared footer line — realistic
    bait for span/line dedup."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    BOILER = (" Subscribe to our newsletter for updates today. "
              "All rights reserved by the site owner! "
              "Contact the webmaster with any questions? ")
    FOOTER = "\nCopyright footer line shared across every page here.\n"

    def f(b: pa.Table) -> pa.Table:
        out = []
        for t in b.column("text").to_pylist():
            words = (t or "").split(" ")
            parts = []
            for i, w in enumerate(words, 1):
                parts.append(w)
                parts.append(". " if i % 10 == 0 else " ")
            out.append("".join(parts).rstrip() + "." + BOILER + FOOTER)
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": pa.array(out, type=pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def _q_approx_quantiles_price(sf_dir: str):
    """Histogram approx-quantile sketch (aggregates.approx_quantile_hist):
    p50/p90/p99 of o_totalprice within one bucket width
    ((max-min)/8192) of the exact quantile.  Rows-only (the bound, not
    the value, is the contract; pytest asserts it against the exact
    operator)."""
    from dataguards_ray.aggregates import approx_quantile_hist

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    vals = approx_quantile_hist(ds, "o_totalprice", [0.5, 0.9, 0.99])
    return pa.table(
        {"q": pa.array([0.5, 0.9, 0.99], type=pa.float64()),
         "approx": pa.array(vals, type=pa.float64())}
    )


def _q_span_dedup_docs(sf_dir: str):
    """C4-style duplicated-span dedup (spandedup.span_dedup): remove
    repeated 3-sentence spans corpus-wide, keep the first occurrence —
    over _web_documents, where every page shares a boilerplate tail, so
    all but the first page lose it.  One row per input doc: (doc_id,
    n_spans_removed, n_chars).  Rows-only (the winner/loser resolution
    and segment surgery aren't SQL-expressible); pytest checks exact
    removal semantics and partition invariance."""
    from dataguards_ray.spandedup import span_dedup

    out = span_dedup(_web_documents(sf_dir))

    def slim(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b.column("doc_id"),
             "n_spans_removed": b.column("n_spans_removed"),
             "n_chars": pc.utf8_length(b.column("text"))})

    return out.map_batches(slim, batch_format="pyarrow").sort("doc_id")


def _q_substring_dedup_docs(sf_dir: str):
    """Exact duplicated-substring dedup à la Lee et al. 2022
    (spandedup.substring_dedup): any repeated 20-token normalized
    window removed from all but its global first occurrence — over
    _web_documents, whose shared boilerplate tail is longer than the
    window, so later pages lose the whole region.  One row per input
    doc: (doc_id, n_spans_removed, n_chars).  Rows-only (winner
    resolution + byte surgery aren't SQL-expressible); pytest checks
    byte-identity against a scalar oracle on both resolution paths."""
    from dataguards_ray.spandedup import substring_dedup

    out = substring_dedup(_web_documents(sf_dir), window=20)

    def slim(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b.column("doc_id"),
             "n_spans_removed": b.column("n_spans_removed"),
             "n_chars": pc.utf8_length(b.column("text"))})

    return out.map_batches(slim, batch_format="pyarrow").sort("doc_id")


def _q_event_key_skew(sf_dir: str):
    """Shuffle-skew profiler (profile.key_skew_report): hot event_type
    keys + HLL distinct estimate + max/mean ratio — the pre-flight
    check before any groupby/join on the key.  Rows-only (the HLL
    estimate has no SQL twin; the exact hot-key counts are SQL-green
    via top_sources/salted_source_counts)."""
    from dataguards_ray.profile import key_skew_report

    ds = _read(sf_dir, "events", ["event_type"])
    return key_skew_report(ds, "event_type", top=5)


def _q_compression_ratio_docs(sf_dir: str):
    """zlib repetition signal (textstats.compression_ratios): compressed
    over raw size per doc — the Gopher/MassiveText boilerplate gate.
    Rows-only (no zlib in SQL); pytest pins repetitive ≪ prose and
    determinism."""
    from dataguards_ray.textstats import compression_ratios

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return compression_ratios(docs).sort("doc_id")


def _q_embedding_dedup(sf_dir: str):
    """Embedding-cosine near-dup dedup (similarity.embedding_dedup_filter):
    survivors after dropping cosine-≥0.4 components to their min-id
    member.  Rows-only (components aren't SQL-expressible; the pair
    stage is SQL-green as near_dup_embeddings)."""
    from dataguards_ray.similarity import embedding_dedup_filter

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_dedup_filter(ds, 0.4).select_columns(["vec_id"]).sort("vec_id")


def _q_semdedup_embeddings(sf_dir: str):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means clusters
    over the embedding column, within-cluster pairwise cosine ≥ τ drops
    all but the centroid-closest representative.  One cluster-keyed
    all-to-all with thin f32 payloads (similarity.semdedup_filter).
    Rows-only (k-means isn't SQL-expressible); pytest pins Ray ≡ scalar
    oracle on seeded corpora."""
    from dataguards_ray.similarity import semdedup_filter

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return (semdedup_filter(ds, 0.4, n_clusters=8)
            .select_columns(["vec_id"]).sort("vec_id"))


def _q_semdedup_incremental(sf_dir: str):
    """Cross-run incremental SemDeDup (round 5): the embeddings table
    split by vec_id parity into a 'prior crawl' (even ids) and a 'new
    crawl' (odd ids).  The prior half is semantically deduped; the new
    half then dedups AGAINST its survivors under the same frozen
    centroids (similarity.semdedup_filter(prior=...)) — prior
    survivors always win and are never retroactively dropped, the
    contract `dg dedup --mode semdedup --against` runs on recurring
    crawls.  Returns the new-crawl survivors.  Rows-only (k-means and
    the prior-wins ordering aren't SQL-expressible)."""
    from dataguards_ray.similarity import ivf_train, semdedup_filter

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _parity(want: int):
        def f(b: pa.Table) -> pa.Table:
            ids = pc.cast(b.column("vec_id"), pa.int64())
            return b.filter(pc.equal(pc.bit_wise_and(ids, 1), want))

        return f

    prior_raw = ds.map_batches(_parity(0), batch_format="pyarrow")
    new_raw = ds.map_batches(_parity(1), batch_format="pyarrow")
    cents = ivf_train(prior_raw, 8, id_col="vec_id")
    prior_surv = semdedup_filter(prior_raw, 0.4, centroids=cents)
    out = semdedup_filter(
        new_raw, 0.4, centroids=cents,
        prior=prior_surv.select_columns(["vec_id", "embedding"]))
    return out.select_columns(["vec_id"]).sort("vec_id")


def _q_line_dedup_docs(sf_dir: str):
    """RefinedWeb-style corpus-wide exact line dedup
    (spandedup.line_dedup): duplicated normalized lines (≥15 chars)
    removed after their first occurrence — over _web_documents, whose
    shared footer line survives only on the first page.  Rows-only."""
    from dataguards_ray.spandedup import line_dedup

    out = line_dedup(_web_documents(sf_dir))

    def slim(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b.column("doc_id"),
             "n_spans_removed": b.column("n_spans_removed"),
             "n_chars": pc.utf8_length(b.column("text"))})

    return out.map_batches(slim, batch_format="pyarrow").sort("doc_id")


def _q_simhash_near_dups(sf_dir: str):
    from dataguards_ray.neardup import simhash_near_dup_pairs

    t = simhash_near_dup_pairs(_mutated_documents(sf_dir), max_hamming=3)
    return t.select(["id_a", "id_b"])


def _q_simhash_dedup_docs(sf_dir: str):
    """SimHash dedup end-to-end (round 5, `dg dedup --mode simhash`'s
    kernel): 4-block bucket discovery at Hamming ≤ 3 → connected
    components → min-id winner; returns surviving doc ids of the
    near-dup-bait corpus.  Rows-only (components aren't
    SQL-expressible; the pair stage is driver-checked as
    simhash_near_dups)."""
    from dataguards_ray.neardup import (drop_pair_losers,
                                        simhash_pair_candidates)

    ds = _mutated_documents(sf_dir)
    pairs = simhash_pair_candidates(ds, max_hamming=3)
    return (drop_pair_losers(ds, pairs)
            .select_columns(["doc_id"]).sort("doc_id"))


def _q_lsh_ann_pairs(sf_dir: str):
    from dataguards_ray.similarity import lsh_bucket_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return lsh_bucket_pairs(ds, 0.4)


def _q_ivf_knn(sf_dir: str):
    """IVF ANN (deterministic spherical k-means cells, nprobe=3) — the
    second scale path alongside hyperplane LSH (rows-only: recall < 1)."""
    from dataguards_ray.similarity import ivf_knn, ivf_train

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = ivf_train(ds, 8)
    qrows = sorted(
        (r for r in ds.take_all() if r["vec_id"] < 5), key=lambda r: r["vec_id"]
    )
    queries = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = [int(r["vec_id"]) for r in qrows]
    t = ivf_knn(ds, cents, queries, 6, nprobe=3)
    return pa.table(
        {
            "query_id": pa.array([qids[j] for j in t.column("query_id").to_pylist()],
                                 type=pa.int64()),
            "vec_id": t.column("vec_id"),
            "rank": pc.cast(t.column("rank"), pa.int64()),
        }
    )


def _q_lang_guess(sf_dir: str):
    from dataguards_ray.textstats import add_lang_guess

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return add_lang_guess(ds).select_columns(["doc_id", "lang", "lang_guess"])


def _q_model_quality_scores(sf_dir: str):
    """Model-based quality scoring (quality.py: from-scratch fastText-
    style NB over hashed char n-grams, FineWeb-Edu/DCLM-style soft
    signal).  Rows-only: the learned weights have no SQL equivalent;
    value-checked bit-identically vs the scalar oracle in
    tests/test_quality.py."""
    from dataguards_ray.quality import add_quality_score

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return add_quality_score(ds).select_columns(["doc_id", "quality_score"])


def _q_decontaminate_docs(sf_dir: str):
    """Benchmark decontamination (GPT-3 App. C / PaLM 13-gram rule):
    flag training docs sharing any 13-token n-gram with a 'benchmark'
    (deterministically, docs 0-4 play the eval set).  Rows-only: the
    rolling-hash membership probe has no SQL equivalent; an exact
    tuple-n-gram oracle pins values in tests/test_operators.py."""
    from dataguards_ray.textstats import decontaminate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = ds.filter(expr="doc_id < 5")
    out = decontaminate(ds, bench, n=13, mode="flag")
    return out.select_columns(["doc_id", "contaminated", "n_contaminated"])


def _q_token_budget_sample(sf_dir: str):
    """Deterministic token-budget sample (mixture building): docs in
    md5(text)-then-id order while the running RE2 \\w+ token total stays
    ≤ 15k (cuts at ~55% of the sf0.01 corpus).  Distributed as thin bucket partials + one boundary-bucket
    resolve + a broadcast filter — no global sort, no windowed shuffle
    (aggregates.sample_by_token_budget)."""
    from dataguards_ray.aggregates import sample_by_token_budget

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return sample_by_token_budget(ds, 15_000).select_columns(["doc_id"])


_SQL_TOKEN_BUDGET_SAMPLE = r"""
SELECT doc_id FROM (
  SELECT doc_id,
         SUM(len(regexp_extract_all(text, '\w+')))
             OVER (ORDER BY md5(text), doc_id) AS cum
  FROM documents WHERE text IS NOT NULL
) t WHERE cum <= 15000
"""


def _q_ppl_buckets(sf_dir: str):
    """CCNet-style corpus partitioning (Wenzek et al. 2020 §4.3):
    per-language head/middle/tail perplexity tertiles over documents.
    Rows-only: the LM scores have no SQL equivalent; tertile proportions
    and determinism are pytest-checked (tests/test_stats.py)."""
    from dataguards_ray.textstats import ppl_bucket_tags

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ppl_bucket_tags(ds).select_columns(
        ["doc_id", "lang_id", "ppl_bucket"])


def _q_scrub_documents(sf_dir: str):
    from dataguards_ray import spec

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        res = [spec.scrub_text(t or "") for t in b.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "text_scrubbed": pa.array([r[0] for r in res], type=pa.string()),
                "scrub_count": pa.array([r[1] + r[2] for r in res], type=pa.int32()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _q_ngram_jaccard_pairs(sf_dir: str):
    """Exact char-13-gram Jaccard verification of MinHash candidates via
    the distributed join-back verify (LSH candidates → hash-join texts
    back on → per-batch exact kernel; the corpus never reaches the
    driver — round-2 rework; rows-only)."""
    from dataguards_ray.neardup import minhash_pair_candidates, verify_pairs_jaccard

    ds = _mutated_documents(sf_dir)
    cand = minhash_pair_candidates(ds, threshold=0.3)
    verified = verify_pairs_jaccard(ds, cand)

    def proj(b: pa.Table) -> pa.Table:
        jac = [round(x, 3) for x in b.column("jaccard").to_pylist()]
        return pa.table(
            {
                "id_a": b.column("id_a"),
                "id_b": b.column("id_b"),
                "jaccard_3dp": pa.array(jac, type=pa.float64()),
            }
        )

    return verified.map_batches(proj, batch_format="pyarrow").sort(["id_a", "id_b"])


def _q_multimodal_decode(sf_dir: str):
    """Multimodal plumbing over a deterministic synthetic image column
    (doc_id-seeded FAKEIMG blobs): decode + resize actor stages
    (rows-only; real codecs are stubbed — see dataguards_ray/multimodal)."""
    import ray.data

    from dataguards_ray.multimodal import decode_images, encode_fake_image, resize_images

    ds = _read(sf_dir, "documents", ["doc_id"])

    def make_images(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        blobs = [encode_fake_image(24, 16, seed=int(i)) for i in ids]
        return pa.table(
            {"doc_id": b.column("doc_id"), "image": pa.array(blobs, type=pa.binary())}
        )

    imgs = ds.map_batches(make_images, batch_format="pyarrow")
    dec = decode_images(resize_images(imgs, 8, 8, concurrency=(1, 4)), concurrency=(1, 4))

    def proj(b: pa.Table) -> pa.Table:
        mean100 = pc.cast(pc.floor(pc.add(pc.multiply(b.column("mean_px"), 100.0), 0.5)), pa.int64())
        return pa.table(
            {"doc_id": b.column("doc_id"), "width": b.column("width"),
             "height": b.column("height"), "mean_px_c": mean100}
        )

    return dec.map_batches(proj, batch_format="pyarrow")


def _q_multimodal_audio(sf_dir: str):
    """Audio plumbing: doc_id-seeded FAKEAUD blobs → actor-pool feature
    extraction (rate, n_samples, rms scaled to int; rows-only)."""
    from dataguards_ray.multimodal import audio_features, encode_fake_audio

    ds = _read(sf_dir, "documents", ["doc_id"]).limit(200)

    def make(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        blobs = [encode_fake_audio(16000, 800, seed=int(i)) for i in ids]
        return pa.table(
            {"doc_id": b.column("doc_id"), "audio": pa.array(blobs, type=pa.binary())}
        )

    feats = audio_features(ds.map_batches(make, batch_format="pyarrow"), concurrency=(1, 4))

    def proj(b: pa.Table) -> pa.Table:
        rms1000 = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("rms"), 1000.0), 0.5)), pa.int64()
        )
        return pa.table(
            {"doc_id": b.column("doc_id"), "sample_rate": b.column("sample_rate"),
             "zero_crossings": b.column("zero_crossings"), "rms_m": rms1000}
        )

    return feats.map_batches(proj, batch_format="pyarrow")


def _q_multimodal_frames(sf_dir: str):
    """Video: doc_id-seeded REAL AVI-MJPEG blobs (baseline JPEG frames
    in a RIFF container, both pure-numpy codecs) → actor-pool frame
    sampling (flat explode: one row per kept frame) → real JPEG decode
    (rows-only)."""
    from dataguards_ray.multimodal import encode_mjpeg_video, sample_frames

    ds = _read(sf_dir, "documents", ["doc_id"]).limit(100)

    def make(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        blobs = [encode_mjpeg_video(8, 6, 6, seed=int(i)) for i in ids]
        return pa.table(
            {"vid_id": pc.cast(b.column("doc_id"), pa.int64()),
             "video": pa.array(blobs, type=pa.binary())}
        )

    from dataguards_ray.multimodal import decode_images

    frames = sample_frames(ds.map_batches(make, batch_format="pyarrow"), every_k=2)
    dec = decode_images(frames, concurrency=(1, 4))

    def proj(b: pa.Table) -> pa.Table:
        mean100 = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column("mean_px"), 100.0), 0.5)), pa.int64()
        )
        return pa.table(
            {"vid_id": b.column("vid_id"), "frame_idx": b.column("frame_idx"),
             "mean_px_c": mean100}
        )

    return dec.map_batches(proj, batch_format="pyarrow")


def _q_flagship(sf_dir: str):
    from dataguards_ray.adapters import documents_as_pages
    from dataguards_ray.pipeline import FilterPipeline

    ds = FilterPipeline().annotate(documents_as_pages(sf_dir))
    return ds.select_columns(["url", "keep", "drop_rule", "lang_id", "text_scrubbed"])


def _q_rule_drop_stats(sf_dir: str):
    from dataguards_ray.adapters import documents_as_pages
    from dataguards_ray.pipeline import FilterPipeline
    from dataguards_ray.rules.dsl import violation_report

    ds = FilterPipeline().annotate(documents_as_pages(sf_dir))
    return violation_report(ds)


def _q_lang_retention(sf_dir: str):
    from dataguards_ray.adapters import documents_as_pages
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.pipeline import FilterPipeline

    ds = FilterPipeline().annotate(documents_as_pages(sf_dir))

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"lang_id": b.column("lang_id"),
             "kept": pc.cast(b.column("keep"), pa.int64())}
        )

    return grouped_agg(ds.map_batches(prep, batch_format="pyarrow"),
                       ["lang_id"], [("kept", "sum", "kept"), ("kept", "count", "total")])


# --- round-2 widening batch 2: range join, window lag/moving, pivot,
# --- full outer, variance, unnest, multi-way join ---------------------------


def _q_range_join_click_purchase(sf_dir: str):
    """Point-in-interval range join (joins.range_join): purchases within
    6 h after each click of the same user.  Intervals are exploded into
    the time buckets they span; each point meets its intervals in
    exactly one (key, bucket) group — no dedup pass."""
    from dataguards_ray.joins import range_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    W = 6 * 3600 * 1_000_000  # 6 h in µs

    def clicks_to_intervals(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "click"))
        s = pc.cast(b.column("ts"), pa.int64())
        return pa.table(
            {"user_id": b.column("user_id"),
             "click_id": b.column("event_id"),
             "start_us": s,
             "end_us": pc.add(s, pa.scalar(W, type=pa.int64()))}
        )

    def purchases(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "purchase"))
        return pa.table(
            {"user_id": b.column("user_id"),
             "purchase_id": b.column("event_id"),
             "ts_us": pc.cast(b.column("ts"), pa.int64())}
        )

    out = range_join(
        ev.map_batches(purchases, batch_format="pyarrow"),
        ev.map_batches(clicks_to_intervals, batch_format="pyarrow"),
        key="user_id", ts_col="ts_us", start_col="start_us", end_col="end_us",
        bucket_us=W,
    )
    return out.select_columns(["user_id", "click_id", "purchase_id"])


_SQL_RANGE_JOIN = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND epoch_us(p.ts) BETWEEN epoch_us(c.ts) AND epoch_us(c.ts) + 21600000000
"""


def _q_funnel_depths(sf_dir: str):
    """Ordered conversion funnel (events.funnel): per user, how many of
    view → click → purchase completed in order within a 1-hour
    conversion window per step (stage i+1 counts only at/after stage
    i's earliest qualifying time); users counted per depth."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.events import funnel

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    d = funnel(ds, ["view", "click", "purchase"], within_us=3_600_000_000)
    out = grouped_agg(d, ["depth"], [("depth", "count", "n_users")])
    return out.sort("depth")


_SQL_FUNNEL = """
WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
           WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY user_id),
c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2 FROM events e
      JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t1
        AND epoch_us(e.ts) <= v.t1 + 3600000000
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3 FROM events e
      JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t2
        AND epoch_us(e.ts) <= c.t2 + 3600000000
      GROUP BY e.user_id)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_users FROM (
  SELECT u.user_id,
         CASE WHEN p.user_id IS NOT NULL THEN 3
              WHEN c.user_id IS NOT NULL THEN 2
              WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS depth
  FROM (SELECT DISTINCT user_id FROM events WHERE ts IS NOT NULL) u
  LEFT JOIN v ON v.user_id = u.user_id
  LEFT JOIN c ON c.user_id = u.user_id
  LEFT JOIN p ON p.user_id = u.user_id)
GROUP BY depth ORDER BY depth
"""


def _q_interval_overlap_click_view(sf_dir: str):
    """Interval-overlap join (joins.interval_join): click activity
    windows [ts, ts+30 min] × view windows [ts, ts+20 min] per user.
    Canonical-bucket emission — exactly-once with no dedup pass."""
    from dataguards_ray.joins import interval_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    W_C, W_V = 1_800_000_000, 1_200_000_000

    def side(etype: str, width: int, id_out: str):
        def f(b: pa.Table) -> pa.Table:
            b = b.filter(pc.and_(pc.equal(b.column("event_type"), etype),
                                 pc.is_valid(b.column("ts"))))
            ts = pc.cast(b.column("ts"), pa.int64())
            return pa.table(
                {"user_id": b.column("user_id"),
                 id_out: b.column("event_id"),
                 "start_us": ts,
                 "end_us": pc.add(ts, width)}
            )
        return ev.map_batches(f, batch_format="pyarrow")

    out = interval_join(
        side("click", W_C, "click_id"), side("view", W_V, "view_id"),
        key="user_id",
        left_start="start_us", left_end="end_us",
        right_start="start_us", right_end="end_us",
    )
    return out.select_columns(["user_id", "click_id", "view_id"])


_SQL_INTERVAL_OVERLAP = """
SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id
FROM events c JOIN events v
  ON v.user_id = c.user_id
 AND c.event_type = 'click' AND v.event_type = 'view'
 AND epoch_us(c.ts) <= epoch_us(v.ts) + 1200000000
 AND epoch_us(v.ts) <= epoch_us(c.ts) + 1800000000
"""


def _q_event_gap_lag(sf_dir: str):
    """LAG window (events.lag_gap): µs since the user's previous event."""
    from dataguards_ray.events import lag_gap

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return lag_gap(ds)


_SQL_EVENT_GAP = """
SELECT user_id, event_id,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
"""


def _q_event_gap_lead(sf_dir: str):
    """LEAD window (events.lag_gap lead=True): µs until the user's next
    event — symmetric to event_gap_lag, same total order."""
    from dataguards_ray.events import lag_gap

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return lag_gap(ds, lead=True)


_SQL_EVENT_GAP_LEAD = """
SELECT user_id, event_id,
       LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts) AS gap_us
FROM events
"""


def _q_moving_sum_events(sf_dir: str):
    """Rows-based moving window (events.moving_sum): 3-event moving sum
    of value cents per user."""
    from dataguards_ray.events import moving_sum

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return moving_sum(ds, window_rows=3)


_SQL_MOVING_SUM = f"""
SELECT user_id, event_id,
       CAST(SUM({_CENTS_SQL.format(x='value')}) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_cents
FROM events
"""


def _q_range_sum_events(sf_dir: str):
    """Time-RANGE moving window (events.range_sum): 5-minute trailing
    value-cents sum per user, SQL RANGE-frame peer semantics (all
    same-ts rows included)."""
    from dataguards_ray.events import range_sum

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return range_sum(ds, range_us=300_000_000)


_SQL_RANGE_SUM = f"""
SELECT user_id, event_id,
       CAST(SUM({_CENTS_SQL.format(x='COALESCE(value, 0)')}) OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
         AS BIGINT) AS range_cents
FROM events WHERE ts IS NOT NULL
"""


def _q_rank_customer_balance(sf_dir: str):
    """Full RANK() with gaps (aggregates.grouped_rank): customers ranked
    by balance within their nation — ties share, gaps follow."""
    from dataguards_ray.aggregates import grouped_rank

    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    return grouped_rank(ds, ["c_nationkey"], "c_acctbal")


_SQL_RANK_GAPS = """
SELECT c_custkey, c_nationkey, c_acctbal,
       CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
         AS BIGINT) AS rnk
FROM customer
"""


def _q_pivot_orders_status(sf_dir: str):
    """SQL PIVOT (aggregates.pivot): order counts per priority × status.
    Indicator columns + the pre-aggregated groupby — no extra pass."""
    from dataguards_ray.aggregates import pivot

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    return pivot(ds, ["o_orderpriority"], "o_orderstatus", ["O", "F", "P"])


_SQL_PIVOT = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
FROM orders GROUP BY o_orderpriority
"""


def _q_full_outer_nation_balance(sf_dir: str):
    """FULL OUTER equi-join (joins.outer_join_by_key — the tagged-union
    groupby path, immune to Dataset.join's partition-coverage quirk):
    nations' count of deep-negative customers vs low-balance suppliers —
    each side has nations the other lacks, so both null-extension
    directions are exercised."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import outer_join_by_key

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    supp = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def prep_c(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("c_acctbal"), pa.scalar(-900.0)))
        return pa.table({"c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64())})

    def prep_s(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("s_acctbal"), pa.scalar(500.0)))
        return pa.table({"s_nationkey": pc.cast(b.column("s_nationkey"), pa.int64())})

    c_agg = grouped_agg(cust.map_batches(prep_c, batch_format="pyarrow"),
                        ["c_nationkey"], [("c_nationkey", "count", "n_cust")])
    s_agg = grouped_agg(supp.map_batches(prep_s, batch_format="pyarrow"),
                        ["s_nationkey"], [("s_nationkey", "count", "n_supp")])
    out = outer_join_by_key(c_agg, s_agg, "c_nationkey",
                            right_key="s_nationkey", how="full")

    def finish(b: pa.Table) -> pa.Table:
        nk = pc.if_else(pc.is_valid(b.column("c_nationkey")),
                        b.column("c_nationkey"), b.column("s_nationkey"))
        return pa.table(
            {"nationkey": nk,
             "n_cust": pc.fill_null(b.column("n_cust"), 0),
             "n_supp": pc.fill_null(b.column("n_supp"), 0)}
        )

    res = out.map_batches(finish, batch_format="pyarrow")
    # dim-bounded result (≤ nations rows): pull and pin the schema — at
    # tiny SFs BOTH filtered sides can be empty and a fully-empty Ray
    # chain forgets its columns (the oracle's empty result is typed)
    return pa.Table.from_pylist(
        res.take_all(), schema=pa.schema(
            [("nationkey", pa.int64()), ("n_cust", pa.int64()),
             ("n_supp", pa.int64())]))


_SQL_FULL_OUTER = """
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
FROM (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, COUNT(*) AS n_cust
      FROM customer WHERE c_acctbal < -900 GROUP BY 1) c
FULL OUTER JOIN
     (SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, COUNT(*) AS n_supp
      FROM supplier WHERE s_acctbal < 500 GROUP BY 1) s
  ON c.c_nationkey = s.s_nationkey
"""


def _q_var_price_by_status(sf_dir: str):
    """Exact integer sample-variance floor per group (aggregates.grouped_var)
    over floor-dollar prices — int64 partials, arbitrary-precision final
    combine, hash-identical to DuckDB's HUGEINT evaluation."""
    from dataguards_ray.aggregates import grouped_var

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor(pc.cast(b.column("o_totalprice"), pa.float64())), pa.int64())
        return pa.table({"o_orderstatus": b.column("o_orderstatus"), "d": d})

    return grouped_var(ds.map_batches(prep, batch_format="pyarrow"),
                       ["o_orderstatus"], "d", "var_floor_d2")


_SQL_VAR = """
SELECT o_orderstatus,
       CAST((COUNT(d)*SUM(d*d) - SUM(d)*SUM(d)) // (COUNT(d)*(COUNT(d)-1)) AS BIGINT)
           AS var_floor_d2
FROM (SELECT o_orderstatus, CAST(FLOOR(o_totalprice) AS BIGINT) AS d FROM orders)
GROUP BY o_orderstatus
"""


def _q_top_tokens(sf_dir: str):
    """Unnest/explode (flat list_flatten per batch): top-20 space-split
    tokens over documents by (count desc, token asc).  Per-batch local
    counts → partials-only groupby → top-k."""
    from dataguards_ray.aggregates import grouped_agg, topk

    ds = _read(sf_dir, "documents", ["text"])

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(b.column("text"), " "))
        t = pa.table({"token": toks})
        t = t.filter(pc.not_equal(t.column("token"), ""))
        g = t.group_by("token").aggregate([("token", "count")])
        return g.rename_columns(["token", "n"])

    counts = grouped_agg(ds.map_batches(explode, batch_format="pyarrow"),
                         ["token"], [("n", "sum", "n")])
    return topk(counts, [("n", True), ("token", False)], 20)


_SQL_TOP_TOKENS = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> '' GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


def _q_tpch_q3(sf_dir: str):
    """TPC-H Q3 shape (3-way join + aggregate + top-k): revenue of
    BUILDING-segment orders not yet shipped at the cutoff.  Composition:
    broadcast semi-join (orders→customers), broadcast lookup
    (lineitem→orders meta), pre-aggregated revenue partials, top-k.
    At 100 TB the order-meta side exceeds broadcast — swap the lookup
    for hash_join (same columns, one extra shuffle)."""
    from dataguards_ray.aggregates import grouped_agg, topk
    from dataguards_ray.joins import broadcast_lookup, semi_join

    CUT = datetime(1996, 6, 1)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'"
    )
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    def prep_orders(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("o_orderdate"), pa.scalar(CUT)))
        # epoch µs arrow-side (naive datetime.timestamp() is tz-dependent)
        return pa.table(
            {"o_orderkey": b.column("o_orderkey"),
             "o_custkey": b.column("o_custkey"),
             "o_us": pc.cast(b.column("o_orderdate"), pa.int64()),
             "o_orderpriority": b.column("o_orderpriority")}
        )

    orders = orders.map_batches(prep_orders, batch_format="pyarrow")
    orders = semi_join(orders, cust, "o_custkey", right_key="c_custkey")
    # broadcast side as aligned Arrow arrays (key, date, priority) pulled
    # via to_arrow_refs — no row-dict materialization on the driver
    import ray as _ray

    otbl = pa.concat_tables(_ray.get(orders.to_arrow_refs()))
    ref = _ray.put((otbl.column("o_orderkey").combine_chunks(),
                    otbl.column("o_us").combine_chunks(),
                    otbl.column("o_orderpriority").combine_chunks()))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    li = li.map_batches(
        lambda b: b.filter(pc.greater(b.column("l_shipdate"), pa.scalar(CUT))),
        batch_format="pyarrow",
    )

    from dataguards_ray.steps.dedup import get_broadcast

    def join_rev(b: pa.Table) -> pa.Table:
        # one vectorized index_in probe: the null-index mask is the
        # semi-join, take() on the aligned columns is the value fetch
        ks, od, op = get_broadcast(ref)
        idx = pc.index_in(b.column("l_orderkey"), value_set=ks)
        mask = pc.is_valid(idx)
        b = b.filter(mask)
        hit = pc.array_filter(idx, mask)
        rev = pc.multiply(
            pc.cast(b.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(b.column("l_discount"), pa.float64())),
        )
        return pa.table(
            {"l_orderkey": b.column("l_orderkey"),
             "o_orderdate_us": pc.take(od, hit),
             "o_orderpriority": pc.take(op, hit),
             "rev_c": _cents(rev)}
        )

    agg = grouped_agg(
        li.map_batches(join_rev, batch_format="pyarrow"),
        ["l_orderkey", "o_orderdate_us", "o_orderpriority"],
        [("rev_c", "sum", "revenue_cents")],
    )
    return topk(agg, [("revenue_cents", True), ("l_orderkey", False)], 10)


_SQL_TPCH_Q3 = f"""
SELECT l_orderkey, o_orderdate_us, o_orderpriority, revenue_cents FROM (
  SELECT l.l_orderkey, epoch_us(o.o_orderdate) AS o_orderdate_us,
         o.o_orderpriority,
         CAST(SUM({_CENTS_SQL.format(x='l.l_extendedprice*(1-l.l_discount)')}) AS BIGINT)
             AS revenue_cents
  FROM customer c, orders o, lineitem l
  WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey
    AND l.l_orderkey = o.o_orderkey
    AND o.o_orderdate < TIMESTAMP '1996-06-01'
    AND l.l_shipdate  > TIMESTAMP '1996-06-01'
  GROUP BY 1, 2, 3)
ORDER BY revenue_cents DESC, l_orderkey LIMIT 10
"""


def _q_covar_qty_price_by_status(sf_dir: str):
    """Exact integer sample covariance per group (aggregates.grouped_covar)
    over cents-scaled quantity × price — int64 partials, arbitrary-
    precision final combine, TRUNCATING division (DuckDB `//` truncates
    toward zero where Python floors; covariance can be negative)."""
    from dataguards_ray.aggregates import grouped_covar

    ds = _read(sf_dir, "lineitem", ["l_linestatus", "l_quantity", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"l_linestatus": b.column("l_linestatus"),
             "q": _cents(b.column("l_quantity")),
             "p": _cents(b.column("l_extendedprice"))}
        )

    return grouped_covar(ds.map_batches(prep, batch_format="pyarrow"),
                         ["l_linestatus"], "q", "p", "covar_qp_c2")


_SQL_COVAR = f"""
SELECT l_linestatus,
       CASE WHEN COUNT(q) > 1 THEN CAST(
         (COUNT(q)*SUM(CAST(q AS HUGEINT)*p)
          - SUM(CAST(q AS HUGEINT))*SUM(CAST(p AS HUGEINT)))
         // (COUNT(q)*(COUNT(q)-1)) AS BIGINT) END AS covar_qp_c2
FROM (SELECT l_linestatus,
             CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                  THEN {_CENTS_SQL.format(x='l_quantity')} END AS q,
             CASE WHEN l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
                  THEN {_CENTS_SQL.format(x='l_extendedprice')} END AS p
      FROM lineitem)
GROUP BY l_linestatus
"""


def _q_dense_rank_cust_balance(sf_dir: str):
    """DENSE_RANK ≤ 3 per market segment by floor-dollar balance desc —
    SQL tie semantics (all rows of a tied value share the rank and all
    are kept).  Per-batch top-k-distinct prune before the shuffle."""
    from dataguards_ray.aggregates import dense_rank_top

    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_custkey", "c_acctbal"])

    def prep(b: pa.Table) -> pa.Table:
        bal = pc.cast(pc.floor(pc.cast(b.column("c_acctbal"), pa.float64())), pa.int64())
        return pa.table(
            {"c_mktsegment": b.column("c_mktsegment"),
             "c_custkey": b.column("c_custkey"), "bal_d": bal}
        )

    return dense_rank_top(ds.map_batches(prep, batch_format="pyarrow"),
                          ["c_mktsegment"], "bal_d", 3, out="rnk")


_SQL_DENSE_RANK = """
SELECT c_mktsegment, c_custkey, bal_d, rnk FROM (
  SELECT c_mktsegment, c_custkey,
         CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_d,
         CAST(dense_rank() OVER (
            PARTITION BY c_mktsegment
            ORDER BY CAST(FLOOR(c_acctbal) AS BIGINT) DESC) AS BIGINT) AS rnk
  FROM customer) WHERE rnk <= 3
"""


def _q_nations_with_cust_and_supp(sf_dir: str):
    """INTERSECT by key: nations present in BOTH customer and supplier —
    distinct pre-pass on each side, then a (broadcast/Bloom) semi join."""
    from dataguards_ray.aggregates import distinct
    from dataguards_ray.joins import semi_join

    cust = distinct(
        _read(sf_dir, "customer", ["c_nationkey"]).rename_columns(
            {"c_nationkey": "nationkey"}), ["nationkey"])
    supp = _read(sf_dir, "supplier", ["s_nationkey"]).rename_columns(
        {"s_nationkey": "nationkey"})
    return semi_join(cust, supp, "nationkey")


_SQL_INTERSECT = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT DISTINCT s_nationkey AS nationkey FROM supplier
"""


def _q_orders_per_month(sf_dir: str):
    """Calendar bucketing: orders per month (strftime '%Y-%m' — identical
    zero-padded rendering in Arrow and DuckDB) with count + cents total."""
    from dataguards_ray.aggregates import grouped_agg

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {"month": pc.strftime(b.column("o_orderdate"), format="%Y-%m"),
             "price_c": _cents(b.column("o_totalprice"))}
        )

    return grouped_agg(ds.map_batches(prep, batch_format="pyarrow"), ["month"],
                       [("price_c", "count", "n_orders"),
                        ("price_c", "sum", "total_cents")])


_SQL_PER_MONTH = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT({_CENTS_SQL.format(x='o_totalprice')}) AS n_orders,
       CAST(SUM({_CENTS_SQL.format(x='o_totalprice')}) AS BIGINT) AS total_cents
FROM orders GROUP BY month
"""


def _q_priorities_by_status(sf_dir: str):
    """string_agg(DISTINCT col ORDER BY col) per group — deterministic
    sorted-distinct concatenation (aggregates.grouped_string_agg)."""
    from dataguards_ray.aggregates import grouped_string_agg

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
    return grouped_string_agg(ds, ["o_orderstatus"], "o_orderpriority",
                              "priorities", sep=",")


_SQL_STRING_AGG = """
SELECT o_orderstatus,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
           AS priorities
FROM orders GROUP BY o_orderstatus
"""


def _q_tpch_q12_shape(sf_dir: str):
    """TPC-H Q12 shape: date-range filter on lineitem, equi-join to
    orders, conditional CASE-WHEN aggregation per linestatus.  Both join
    sides are slimmed to key + needed column BEFORE the shuffle."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import hash_join

    lo = int(pa.scalar("1996-01-01").cast(pa.timestamp("us")).value)
    hi = int(pa.scalar("1997-01-01").cast(pa.timestamp("us")).value)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"])

    def prep_li(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("l_shipdate"), pa.int64())
        keep = pc.and_(
            pc.fill_null(pc.greater_equal(ts, lo), False),
            pc.fill_null(pc.less(ts, hi), False),
        )
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_linestatus": b.column("l_linestatus")}).filter(keep)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).rename_columns(
        {"o_orderkey": "l_orderkey"})
    j = hash_join(li.map_batches(prep_li, batch_format="pyarrow"), orders,
                  on=["l_orderkey"], num_partitions=8)

    def flags(b: pa.Table) -> pa.Table:
        hi_p = pc.is_in(b.column("o_orderpriority"),
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        hi_p = pc.fill_null(hi_p, False)
        return pa.table(
            {"l_linestatus": b.column("l_linestatus"),
             "high": pc.cast(hi_p, pa.int64()),
             "low": pc.cast(pc.invert(hi_p), pa.int64())}
        )

    return grouped_agg(j.map_batches(flags, batch_format="pyarrow"),
                       ["l_linestatus"],
                       [("high", "sum", "high_line_count"),
                        ("low", "sum", "low_line_count")])


_SQL_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


def _q_ntile_customer_balance(sf_dir: str):
    """NTILE(4) per market segment by floor-dollar balance desc with a
    unique custkey tiebreak (aggregates.ntile) — quartile assignment is
    position-based, so the total order makes it parallelism-invariant
    and hash-comparable against DuckDB's window NTILE."""
    from dataguards_ray.aggregates import ntile

    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_custkey", "c_acctbal"])

    def prep(b: pa.Table) -> pa.Table:
        bal = pc.cast(pc.floor(pc.cast(b.column("c_acctbal"), pa.float64())), pa.int64())
        return pa.table(
            {"c_mktsegment": b.column("c_mktsegment"),
             "c_custkey": b.column("c_custkey"), "bal_d": bal}
        )

    return ntile(ds.map_batches(prep, batch_format="pyarrow"),
                 ["c_mktsegment"], 4,
                 [("bal_d", True), ("c_custkey", False)], out="tile")


_SQL_NTILE = """
SELECT c_mktsegment, c_custkey, bal_d,
       CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                           ORDER BY bal_d DESC, c_custkey) AS BIGINT) AS tile
FROM (SELECT c_mktsegment, c_custkey,
             CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_d FROM customer)
"""


def _q_tpch_q5_shape(sf_dir: str):
    """TPC-H Q5 shape (5-way join): revenue per ASIA nation from 1996
    orders where the supplier is in the customer's nation.  Composition:
    region⋈nation and supplier are driver-built broadcast dicts (dims),
    orders→customer nation via broadcast lookup, lineitem⋈orders
    ADAPTIVE — the date+region-filtered order set broadcasts when it
    fits (map-side lookup, no lineitem shuffle), else the big-big
    hash_join — supplier-nation equality filter + revenue aggregation
    fused in one map_batches.  At 100 TB customer also exceeds
    broadcast — swap the o_custkey lookup for a hash_join too."""
    import ray as _ray

    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import hash_join
    from dataguards_ray.steps.dedup import get_broadcast

    # dims on the driver: asian nations, supplier→nation, customer→nation
    asia_regions = {r["r_regionkey"] for r in _read(sf_dir, "region").take_all()
                    if r["r_name"] == "ASIA"}
    nat_rows = _read(sf_dir, "nation").take_all()
    nat = {r["n_nationkey"]: r["n_name"] for r in nat_rows}
    asia = {r["n_nationkey"] for r in nat_rows
            if r["n_regionkey"] in asia_regions}
    supp = {r["s_suppkey"]: r["s_nationkey"]
            for r in _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()}
    cust = {r["c_custkey"]: r["c_nationkey"]
            for r in _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).take_all()
            if r["c_nationkey"] in asia}

    lo = int(pa.scalar("1996-01-01").cast(pa.timestamp("us")).value)
    hi = int(pa.scalar("1997-01-01").cast(pa.timestamp("us")).value)
    cref = _ray.put((pa.array(list(cust), type=pa.int64()),
                     pa.array(list(cust.values()), type=pa.int64())))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_orders(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("o_orderdate"), pa.int64())
        keep = pc.and_(
            pc.fill_null(pc.greater_equal(ts, lo), False),
            pc.fill_null(pc.less(ts, hi), False),
        )
        b = b.filter(keep)
        # vectorized custkey→nationkey: one index_in probe does both the
        # semi-join (null index = non-ASIA customer) and the value fetch
        ck, cv = get_broadcast(cref)
        idx = pc.index_in(b.column("o_custkey"), value_set=ck)
        mask = pc.is_valid(idx)
        b = b.filter(mask)
        return pa.table(
            {"l_orderkey": b.column("o_orderkey"),
             "c_nationkey": pc.take(cv, pc.array_filter(idx, mask))}
        )

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    ords = orders.map_batches(prep_orders, batch_format="pyarrow").materialize()
    if ords.count() <= 2_000_000:
        # the date+region filters leave a broadcast-sized order set:
        # map-side lookup beats shuffling all of lineitem (measured 29 s
        # → ~2 s at sf0.1).  Above the cap: the big-big hash_join.
        # Pull as Arrow blocks (zero row-dict materialization on the
        # driver — up to 2M rows ride this path).
        otbl = pa.concat_tables(_ray.get(ords.to_arrow_refs()))
        okeys = otbl.column("l_orderkey").combine_chunks()
        ovals = otbl.column("c_nationkey").combine_chunks()
        oref = _ray.put((okeys, ovals))

        def attach(b: pa.Table) -> pa.Table:
            ks, vs = get_broadcast(oref)
            idx = pc.index_in(b.column("l_orderkey"), value_set=ks)
            mask = pc.is_valid(idx)
            return b.filter(mask).append_column(
                "c_nationkey", pc.take(vs, pc.array_filter(idx, mask)))

        j = li.map_batches(attach, batch_format="pyarrow")
    else:
        j = hash_join(li, ords, on=["l_orderkey"], num_partitions=8)

    skeys = pa.array(list(supp), type=pa.int64())
    svals = pa.array(list(supp.values()), type=pa.int64())
    nkeys = pa.array(list(nat), type=pa.int64())
    nvals = pa.array(list(nat.values()), type=pa.string())
    sref = _ray.put((skeys, svals, nkeys, nvals))

    def rev(b: pa.Table) -> pa.Table:
        # vectorized dim lookups: index_in + take (a missing supplier
        # yields a null index → null nation → fill_null(False) drops it)
        sk, sv, nk, nv = get_broadcast(sref)
        snat = pc.take(sv, pc.index_in(b.column("l_suppkey"), value_set=sk))
        keep = pc.fill_null(pc.equal(snat, b.column("c_nationkey")), False)
        b = b.filter(keep)
        names = pc.take(nv, pc.index_in(b.column("c_nationkey"), value_set=nk))
        r = pc.multiply(
            pc.cast(b.column("l_extendedprice"), pa.float64()),
            pc.subtract(1.0, pc.cast(b.column("l_discount"), pa.float64())),
        )
        return pa.table({"n_name": names, "rev_c": _cents(r)})

    return grouped_agg(j.map_batches(rev, batch_format="pyarrow"),
                       ["n_name"], [("rev_c", "sum", "revenue_cents")])


_SQL_TPCH_Q5 = f"""
SELECT n_name,
       CAST(SUM({_CENTS_SQL.format(x='l_extendedprice*(1-l_discount)')}) AS BIGINT)
           AS revenue_cents
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def _q_balance_histogram(sf_dir: str):
    """Numeric histogram: floor-dollar balances bucketed by floored
    division into $1000-wide bins (negative balances land in negative
    bins — Arrow's float floor and SQL FLOOR agree), count + sum per
    bin.  Pure pre-aggregated groupby; bins are bounded (~11) so the
    shuffle moves a handful of partial rows per block."""
    from dataguards_ray.aggregates import grouped_agg

    ds = _read(sf_dir, "customer", ["c_acctbal"])

    def prep(b: pa.Table) -> pa.Table:
        bal = pc.cast(pc.floor(pc.cast(b.column("c_acctbal"), pa.float64())), pa.int64())
        bkt = pc.cast(pc.floor(pc.divide(pc.cast(bal, pa.float64()), 1000.0)), pa.int64())
        return pa.table({"bucket": bkt, "bal_d": bal})

    return grouped_agg(ds.map_batches(prep, batch_format="pyarrow"), ["bucket"],
                       [("bal_d", "count", "n_cust"),
                        ("bal_d", "sum", "sum_bal_d")])


_SQL_BAL_HIST = """
SELECT CAST(FLOOR(CAST(bal_d AS DOUBLE)/1000) AS BIGINT) AS bucket,
       COUNT(bal_d) AS n_cust,
       CAST(SUM(bal_d) AS BIGINT) AS sum_bal_d
FROM (SELECT CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_d FROM customer)
GROUP BY bucket
"""


def _q_nations_cust_except_supp(sf_dir: str):
    """EXCEPT by key: nations with customers but NO high-balance
    (≥9500) supplier — distinct pre-pass then a (broadcast/Bloom) anti
    join.  Completes the set-op trio with union_all_names and
    nations_with_cust_and_supp.  The balance filter keeps the result
    non-empty at every test SF (an unfiltered EXCEPT is empty from
    sf0.01 up, and a 0-row Ray result loses its schema — a documented
    Ray 2.49 pitfall, see joins.scrub_empty_blocks)."""
    from dataguards_ray.aggregates import distinct
    from dataguards_ray.joins import anti_join

    cust = distinct(
        _read(sf_dir, "customer", ["c_nationkey"]).rename_columns(
            {"c_nationkey": "nationkey"}), ["nationkey"])
    supp = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"]).filter(
        expr="s_acctbal >= 9500"
    ).rename_columns({"s_nationkey": "nationkey"})
    return anti_join(cust, supp, "nationkey")


_SQL_SETOP_EXCEPT = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal >= 9500
"""


def _q_p75_cont_price_by_priority(sf_dir: str):
    """INTERPOLATED 75th-percentile order price per priority via
    aggregates.grouped_quantile_cont_scaled — returned ×4 (the q_den)
    so both engines compute in exact integers (f is a multiple of 1/4;
    quantile_disc queries cover the discrete variant)."""
    from dataguards_ray.aggregates import grouped_quantile_cont_scaled

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderpriority": b.column("o_orderpriority"),
                         "price_c": _cents(b.column("o_totalprice"))})

    return grouped_quantile_cont_scaled(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["o_orderpriority"], "price_c", "p75_x4_cents", 3, 4)


_SQL_P75_CONT = f"""
SELECT o_orderpriority,
       CAST(ROUND(4*quantile_cont(price_c, 0.75)) AS BIGINT) AS p75_x4_cents
FROM (SELECT o_orderpriority,
             {_CENTS_SQL.format(x='o_totalprice')} AS price_c FROM orders)
GROUP BY o_orderpriority
"""


def _q_approx_distinct_docs_by_source(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT doc_id) per source
    (hll.approx_count_distinct, p=12): zero raw-row shuffle — each batch
    ships ≤4096 thin (source, register, max_rho) rows, merged by an
    associative grouped MAX.  Rows-only by contract (an approximation
    cannot hash-match SQL); the error-bound and partition-invariance
    checks live in tests/test_operators.py."""
    from dataguards_ray.hll import approx_count_distinct

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return approx_count_distinct(ds, "doc_id", keys=["source"])


def _q_ind_fk_violations(sf_dir: str):
    """Inclusion dependency (referential integrity): orders whose
    o_custkey is absent from the non-negative-balance customer key set
    (rules/integrity.InclusionRule — MATCH SIMPLE null semantics; the
    reference side moves only thin distinct encoded keys)."""
    from dataguards_ray.rules.integrity import InclusionRule

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    ref = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).filter(
        expr="c_acctbal >= 0"
    )
    rule = InclusionRule("fk_cust", ["o_custkey"], ref, ["c_custkey"])
    flagged = rule.apply_shuffle(orders)
    return flagged.filter(expr="__viol_fk_cust == True").select_columns(
        ["o_orderkey", "o_custkey"]
    )


_SQL_IND_FK = """
SELECT o_orderkey, o_custkey FROM orders o
WHERE o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_acctbal >= 0 AND c.c_custkey = o.o_custkey)
"""


def _q_unique_violations_orders(sf_dir: str):
    """UNIQUE(o_custkey, o_orderdate) violations — ALL copies of any
    duplicated key (rules/integrity.UniqueRule: thin (key, count)
    partials, only duplicated keys broadcast/join-marked; NULL
    components exempt per SQL UNIQUE)."""
    from dataguards_ray.rules.integrity import UniqueRule

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    rule = UniqueRule("uniq_cust_date", ["o_custkey", "o_orderdate"])
    flagged = rule.apply_shuffle(orders)
    viol = flagged.filter(expr="__viol_uniq_cust_date == True")

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": b.column("o_orderkey"),
             "o_custkey": b.column("o_custkey"),
             "o_date_us": pc.cast(b.column("o_orderdate"), pa.int64())}
        )

    return viol.map_batches(to_us, batch_format="pyarrow")


_SQL_UNIQUE_VIOL = """
SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS o_date_us
FROM orders
WHERE (o_custkey, o_orderdate) IN (
    SELECT (o_custkey, o_orderdate) FROM orders
    WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    GROUP BY o_custkey, o_orderdate HAVING COUNT(*) > 1)
"""


def _q_mode_priority_by_status(sf_dir: str):
    """Deterministic per-group MODE (aggregates.grouped_mode): most
    frequent priority per order status, smallest-value tiebreak (SQL
    mode() tie order is engine-defined — the explicit tiebreak makes it
    reproducible, mirrored in the oracle via ROW_NUMBER)."""
    from dataguards_ray.aggregates import grouped_mode

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
    return grouped_mode(ds, ["o_orderstatus"], "o_orderpriority", "mode_priority")


_SQL_MODE = """
SELECT o_orderstatus, o_orderpriority AS mode_priority FROM (
  SELECT o_orderstatus, o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM orders WHERE o_orderpriority IS NOT NULL
  GROUP BY o_orderstatus, o_orderpriority) WHERE rn = 1
"""


def _q_profile_events(sf_dir: str):
    """Table profiling (profile.profile_table): per-column row/null/
    exact-distinct counts over the events table in two streamed passes
    (count partials + batch-local-distinct pair shuffle).  The float
    `value` column is excluded per the profiling contract (float
    rendering is engine-specific)."""
    from dataguards_ray.profile import profile_table

    cols = ["event_id", "ts", "user_id", "event_type", "props"]
    return profile_table(_read(sf_dir, "events", cols), cols)


_SQL_PROFILE = """
SELECT 'event_id' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*)-COUNT(event_id) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct FROM events
UNION ALL
SELECT 'ts', COUNT(*), COUNT(*)-COUNT(ts), COUNT(DISTINCT ts) FROM events
UNION ALL
SELECT 'user_id', COUNT(*), COUNT(*)-COUNT(user_id),
       COUNT(DISTINCT user_id) FROM events
UNION ALL
SELECT 'event_type', COUNT(*), COUNT(*)-COUNT(event_type),
       COUNT(DISTINCT event_type) FROM events
UNION ALL
SELECT 'props', COUNT(*), COUNT(*)-COUNT(props),
       COUNT(DISTINCT props) FROM events
"""


def _q_event_row_number(sf_dir: str):
    """Global ROW_NUMBER (aggregates.global_row_number): every event
    enumerated under the total order (ts, event_id) — range buckets +
    driver cumsum of thin per-bucket counts + local sort, one shuffle,
    no global sort barrier."""
    from dataguards_ray.aggregates import global_row_number

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b.column("event_id"),
                         "ts_us": pc.cast(b.column("ts"), pa.int64())})

    ds = ds.map_batches(prep, batch_format="pyarrow")
    out = global_row_number(ds, ["ts_us", "event_id"])
    return out.select_columns(["event_id", "rn"])


_SQL_ROW_NUMBER = """
SELECT event_id,
       CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) AS BIGINT) AS rn
FROM events WHERE ts IS NOT NULL
"""


def _q_first_last_event_type(sf_dir: str):
    """FIRST_VALUE/LAST_VALUE window (aggregates.grouped_first_last):
    each user's first and last event_type under (ts, event_id).  The
    window collapses to a min+max over an order-preserving string
    encoding — thin partials only, the events table never shuffles."""
    from dataguards_ray.aggregates import grouped_first_last

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return grouped_first_last(
        ds, "user_id", ["ts", "event_id"], "event_type",
        first_name="first_type", last_name="last_type",
    )


_SQL_FIRST_LAST = """
SELECT DISTINCT user_id,
       FIRST_VALUE(event_type) OVER w AS first_type,
       LAST_VALUE(event_type) OVER w AS last_type
FROM events WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def _q_tpch_q4_shape(sf_dir: str):
    """TPC-H Q4 shape (EXISTS semi-join + grouped count): orders placed
    1995-H1 having at least one returned lineitem, counted by priority.
    Composition: date-range filter at the read → semi_join (Bloom path
    above the broadcast threshold) → pre-aggregated grouped count.
    (Testdata lineitem has no commit/receipt dates; the EXISTS predicate
    is l_returnflag = 'R' — same join/aggregate shape.)"""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import semi_join

    LO, HI = datetime(1995, 1, 1), datetime(1995, 7, 1)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    orders = orders.map_batches(
        lambda b: b.filter(
            pc.and_(pc.greater_equal(b.column("o_orderdate"), pa.scalar(LO)),
                    pc.less(b.column("o_orderdate"), pa.scalar(HI)))),
        batch_format="pyarrow",
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).filter(
        expr="l_returnflag == 'R'"
    )
    qual = semi_join(orders, li, "o_orderkey", right_key="l_orderkey")
    out = grouped_agg(qual, ["o_orderpriority"],
                      [("o_orderkey", "count", "order_count")])
    return out.sort("o_orderpriority")


_SQL_TPCH_Q4 = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1995-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def _q_tpch_q17_shape(sf_dir: str):
    """TPC-H Q17 shape (correlated-avg filter + global sum): revenue
    cents of Brand#4 lineitems with quantity under 20% of that part's
    average quantity.  Composition: part filter → semi_join prunes
    lineitem to the brand's parts → per-part (sum, count) partials →
    broadcast 0.2*avg thresholds (dimension-sized: one entry per part
    of ONE brand) → vectorized filter → global sum.  l_quantity is
    integer-valued, so the float avg is order-independent and matches
    DuckDB bit-for-bit."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import broadcast_lookup, semi_join

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).filter(
        expr="p_brand == 'Brand#4'"
    )
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])
    li = semi_join(li, part, "l_partkey", right_key="p_partkey").materialize()
    avgs = grouped_agg(li, ["l_partkey"],
                       [("l_quantity", "sum", "s"), ("l_quantity", "count", "n")])
    thr = {r["l_partkey"]: 0.2 * (r["s"] / r["n"]) for r in avgs.take_all()}

    def keep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(pc.cast(b.column("l_quantity"), pa.float64()),
                             b.column("_thr")))
        return pa.table({"c": _cents(b.column("l_extendedprice"))})

    kept = broadcast_lookup(li, thr, "l_partkey", "_thr",
                            out_type=pa.float64()).map_batches(
        keep, batch_format="pyarrow")
    total = kept.sum("c") or 0
    return pa.table({"sum_cents": pa.array([int(total)], type=pa.int64())})


_SQL_TPCH_Q17 = f"""
SELECT CAST(COALESCE(SUM({_CENTS_SQL.format(x='l_extendedprice')}), 0) AS BIGINT)
       AS sum_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4'
  AND l.l_quantity < 0.2 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)
"""


def _q_tpch_q18_shape(sf_dir: str):
    """TPC-H Q18 shape (HAVING-filtered groupby + 3-way join + top-k):
    large-volume orders (sum qty > 250) with customer name, top 100 by
    price.  Composition: per-orderkey qty partials → HAVING filter on
    the thin aggregate (the qualifying set is small BY CONSTRUCTION of
    the threshold — classic Q18; swap the two broadcast lookups for
    hash_join if a lax threshold ever makes it large) → broadcast
    attach to orders → broadcast customer names → top-k."""
    from dataguards_ray.aggregates import grouped_agg, topk
    from dataguards_ray.joins import broadcast_lookup, semi_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    sums = grouped_agg(li, ["l_orderkey"], [("l_quantity", "sum", "sum_qty")])
    qual = {r["l_orderkey"]: int(r["sum_qty"])
            for r in sums.take_all() if r["sum_qty"] > 250}

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    okeys = pa.array(list(qual), type=pa.int64())
    orders = orders.map_batches(
        lambda b: b.filter(pc.is_in(b.column("o_orderkey"), value_set=okeys)),
        batch_format="pyarrow",
    ).materialize()

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    cust = semi_join(cust, orders, "c_custkey", right_key="o_custkey")
    cmap = {r["c_custkey"]: r["c_name"] for r in cust.take_all()}

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {"c_name": b.column("c_name"),
             "o_custkey": b.column("o_custkey"),
             "o_orderkey": b.column("o_orderkey"),
             "o_us": pc.cast(b.column("o_orderdate"), pa.int64()),
             "total_cents": _cents(b.column("o_totalprice")),
             "sum_qty": b.column("sum_qty")}
        )

    joined = broadcast_lookup(orders, qual, "o_orderkey", "sum_qty",
                              out_type=pa.int64())
    joined = broadcast_lookup(joined, cmap, "o_custkey", "c_name",
                              out_type=pa.string())
    joined = joined.map_batches(fin, batch_format="pyarrow")
    return topk(joined, [("total_cents", True), ("o_orderkey", False)], 100)


_SQL_TPCH_Q18 = f"""
SELECT c_name, o_custkey, o_orderkey, epoch_us(o_orderdate) AS o_us,
       {_CENTS_SQL.format(x='o_totalprice')} AS total_cents,
       CAST(s.sum_qty AS BIGINT) AS sum_qty
FROM orders o
JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250) s
  ON s.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY total_cents DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Round-4 late additions: mixture sampling, DSIR selection, TPC-H Q6/Q10/Q14
# ---------------------------------------------------------------------------

_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
_MIX_BUDGET = 6000
# identical arithmetic to aggregates.sample_mixture so the SQL literals match
_MIX_BUDGETS = {
    s: int(w / float(sum(_MIX_WEIGHTS.values())) * _MIX_BUDGET)
    for s, w in _MIX_WEIGHTS.items()
}


def _q_sample_mixture(sf_dir: str):
    """Pile/DoReMi-style mixture building: per-source token budgets
    (50/30/20% of 6k tokens over three sources), docs taken in
    md5(text)-then-id order per source while the running total fits.
    Distributed as thin (source, bucket) partials + per-source boundary
    resolve + one broadcast filter (aggregates.sample_mixture)."""
    from dataguards_ray.aggregates import sample_mixture

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    return sample_mixture(ds, _MIX_BUDGET, _MIX_WEIGHTS).select_columns(
        ["doc_id", "source"])


_SQL_SAMPLE_MIXTURE = rf"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         SUM(len(regexp_extract_all(text, '\w+')))
             OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS cum
  FROM documents WHERE text IS NOT NULL AND source IN ('src0','src1','src2')
) t WHERE cum <= CASE source WHEN 'src0' THEN {_MIX_BUDGETS['src0']}
                 WHEN 'src1' THEN {_MIX_BUDGETS['src1']}
                 ELSE {_MIX_BUDGETS['src2']} END
"""


# UT1-style domain blocklist (frozen test list over the synthetic sources)
_BLOCKED_DOMAINS = ("src13.com", "src17.com", "src3.com", "src7.com")


def _q_url_blocklist_filter(sf_dir: str):
    """UT1/RefinedWeb-style domain blocklist gate: synthesize a
    deterministic url per doc (https://www.<source>.com/d/<doc_id> — the
    documents table carries no url column), extract the registered
    domain (urltools.url_domain_one through the dictionary-encoded
    vectorized kernel, so www. strips and only unique hosts hit Python),
    and drop docs whose domain is on the broadcast blocklist
    (urltools.block_by_domain: ray.put once + pc.is_in per batch, no
    shuffle).  The url construction is SQL-mirrored so the oracle checks
    the whole chain."""
    from dataguards_ray.urltools import block_by_domain, domains_array

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def mk_url(b: pa.Table) -> pa.Table:
        urls = pc.binary_join_element_wise(
            "https://www.", b.column("source"), ".com/d/",
            pc.cast(b.column("doc_id"), pa.string()), "")
        return b.append_column("url", urls)

    kept = block_by_domain(
        ds.map_batches(mk_url, batch_format="pyarrow"), _BLOCKED_DOMAINS)

    def add_dom(b: pa.Table) -> pa.Table:
        return b.append_column("domain", domains_array(b.column("url")))

    return kept.map_batches(add_dom, batch_format="pyarrow").select_columns(
        ["doc_id", "source", "domain"])


_SQL_URL_BLOCKLIST = f"""
SELECT doc_id, source, source || '.com' AS domain FROM documents
WHERE source || '.com' NOT IN ({", ".join(f"'{d}'" for d in _BLOCKED_DOMAINS)})
"""


def _q_dsir_logweights(sf_dir: str):
    """DSIR importance log-weights (Xie et al. 2023): hashed
    unigram+bigram bag models fitted on target (lang='en' docs) and the
    raw corpus, per-doc log p_t(x) - log p_r(x).  Rows-only: the hashed
    feature models have no SQL equivalent; tests/test_dsir.py pins the
    values bit-identically against a scalar oracle."""
    from dataguards_ray.dsir import dsir_log_weights

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    target = docs.map_batches(
        lambda b: b.filter(pc.equal(b.column("lang"), "en")),
        batch_format="pyarrow")
    return dsir_log_weights(docs, target).select_columns(
        ["doc_id", "dsir_logw"])


def _q_dsir_resample(sf_dir: str):
    """DSIR Gumbel-top-k resampling: 100 docs without replacement with
    P ∝ importance weight, deterministic in (seed, text, id).  Driver
    sees k rows only (per-batch top-k partials)."""
    from dataguards_ray.dsir import dsir_resample

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    target = docs.map_batches(
        lambda b: b.filter(pc.equal(b.column("lang"), "en")),
        batch_format="pyarrow")
    return dsir_resample(docs, target, 100).select_columns(
        ["doc_id", "dsir_logw", "dsir_key"])


def _q_tpch_q6_shape(sf_dir: str):
    """TPC-H Q6 shape: pure scan-filter-global-sum (no shuffle at all —
    per-row int64 cents, native distributed sum).  Revenue from
    discounted 1996 shipments with qty < 24 and discount in
    [0.05, 0.07]."""
    lo = int(pa.scalar("1996-01-01").cast(pa.timestamp("us")).value)
    hi = int(pa.scalar("1997-01-01").cast(pa.timestamp("us")).value)

    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("l_shipdate"), pa.int64())
        disc = pc.cast(b.column("l_discount"), pa.float64())
        qty = pc.cast(b.column("l_quantity"), pa.float64())
        keep = pc.and_(
            pc.and_(
                pc.fill_null(pc.greater_equal(ts, lo), False),
                pc.fill_null(pc.less(ts, hi), False)),
            pc.and_(
                pc.fill_null(pc.and_(pc.greater_equal(disc, 0.05),
                                     pc.less_equal(disc, 0.07)), False),
                pc.fill_null(pc.less(qty, 24.0), False)))
        f = b.filter(keep)
        rev = pc.multiply(pc.cast(f.column("l_extendedprice"), pa.float64()),
                          pc.cast(f.column("l_discount"), pa.float64()))
        return pa.table({"rev_cents": _cents(rev)})

    total = li.map_batches(prep, batch_format="pyarrow").sum("rev_cents")
    return pa.table({"revenue_cents": pa.array([int(total or 0)],
                                               type=pa.int64())})


_SQL_TPCH_Q6 = f"""
SELECT CAST(COALESCE(SUM({_CENTS_SQL.format(x='l_extendedprice*l_discount')}), 0)
       AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def _q_tpch_q10_shape(sf_dir: str):
    """TPC-H Q10 shape: returned-item revenue per customer for one
    quarter's orders, top 20.  Join sides slimmed before the shuffle;
    customer names attached AFTER the top-k (20-row driver lookup, not
    a corpus-sized join)."""
    from dataguards_ray.aggregates import grouped_agg, topk
    from dataguards_ray.joins import hash_join

    lo = int(pa.scalar("1996-01-01").cast(pa.timestamp("us")).value)
    hi = int(pa.scalar("1996-04-01").cast(pa.timestamp("us")).value)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"])

    def prep_li(b: pa.Table) -> pa.Table:
        keep = pc.fill_null(pc.equal(b.column("l_returnflag"), "R"), False)
        f = b.filter(keep)
        ep = pc.cast(f.column("l_extendedprice"), pa.float64())
        di = pc.cast(f.column("l_discount"), pa.float64())
        rev = pc.multiply(ep, pc.subtract(pa.scalar(1.0, pa.float64()), di))
        return pa.table({"l_orderkey": f.column("l_orderkey"),
                         "rev_cents": _cents(rev)})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_o(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("o_orderdate"), pa.int64())
        keep = pc.and_(pc.fill_null(pc.greater_equal(ts, lo), False),
                       pc.fill_null(pc.less(ts, hi), False))
        f = b.filter(keep)
        return pa.table({"l_orderkey": f.column("o_orderkey"),
                         "o_custkey": f.column("o_custkey")})

    j = hash_join(li.map_batches(prep_li, batch_format="pyarrow"),
                  orders.map_batches(prep_o, batch_format="pyarrow"),
                  on=["l_orderkey"], num_partitions=8)
    rev = grouped_agg(j, ["o_custkey"],
                      [("rev_cents", "sum", "revenue_cents")])
    top = topk(rev, [("revenue_cents", True), ("o_custkey", False)],
               20).to_pandas()

    keys = pa.array([int(k) for k in top["o_custkey"]], type=pa.int64())
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    c20 = cust.map_batches(
        lambda b: b.filter(pc.is_in(b.column("c_custkey"), value_set=keys)),
        batch_format="pyarrow").to_pandas()
    c20["acctbal_cents"] = (c20["c_acctbal"] * 100 + 0.5).apply(
        lambda x: int(np.floor(x)))
    out = top.merge(c20[["c_custkey", "c_name", "acctbal_cents"]],
                    left_on="o_custkey", right_on="c_custkey",
                    how="left").drop(columns=["c_custkey"])
    if out["c_name"].isna().any():  # SQL's inner join would re-rank;
        raise ValueError("tpch_q10_shape: o_custkey missing from "
                         "customer — post-topk lookup is only valid "
                         "under FK integrity (holds for this corpus)")
    return pa.Table.from_pandas(
        out[["o_custkey", "c_name", "acctbal_cents", "revenue_cents"]],
        preserve_index=False)


_SQL_TPCH_Q10 = f"""
SELECT o_custkey, c_name,
       {_CENTS_SQL.format(x='c_acctbal')} AS acctbal_cents,
       CAST(SUM({_CENTS_SQL.format(x='l_extendedprice*(1-l_discount)')})
            AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY o_custkey, c_name, c_acctbal
ORDER BY revenue_cents DESC, o_custkey
LIMIT 20
"""


def _q_tpch_q14_shape(sf_dir: str):
    """TPC-H Q14 shape: promo-type revenue share for one ship-month.
    part is the broadcast small side (partkey → is-promo flag via
    ray.put, no shuffle); output is the exact int64 numerator and
    denominator (a float percentage would not hash-compare)."""
    lo = int(pa.scalar("1997-06-01").cast(pa.timestamp("us")).value)
    hi = int(pa.scalar("1997-07-01").cast(pa.timestamp("us")).value)

    import ray as _ray

    from dataguards_ray.steps.dedup import get_broadcast

    # broadcast side as aligned Arrow arrays (partkey, is-promo flag):
    # probed with one vectorized index_in per batch, no per-row dict
    ptbl = pa.concat_tables(
        _ray.get(_read(sf_dir, "part",
                       ["p_partkey", "p_type"]).to_arrow_refs()))
    ref = _ray.put((
        ptbl.column("p_partkey").combine_chunks(),
        pc.fill_null(pc.equal(ptbl.column("p_type"), "PROMO"),
                     False).combine_chunks()))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        pk, pf = get_broadcast(ref)
        ts = pc.cast(b.column("l_shipdate"), pa.int64())
        keep = pc.and_(pc.fill_null(pc.greater_equal(ts, lo), False),
                       pc.fill_null(pc.less(ts, hi), False))
        f = b.filter(keep)
        # INNER-join semantics: drop rows whose partkey is absent from
        # part — null index_in result = absent (vectorized probe)
        idx = pc.index_in(f.column("l_partkey"), value_set=pk)
        mask = pc.is_valid(idx)
        f = f.filter(mask)
        isp = pc.take(pf, pc.array_filter(idx, mask))
        ep = pc.cast(f.column("l_extendedprice"), pa.float64())
        di = pc.cast(f.column("l_discount"), pa.float64())
        cents = _cents(pc.multiply(
            ep, pc.subtract(pa.scalar(1.0, pa.float64()), di)))
        return pa.table({
            "promo_cents": pc.if_else(isp, cents, pa.scalar(0, pa.int64())),
            "total_cents": cents})

    agg = li.map_batches(prep, batch_format="pyarrow").materialize()
    return pa.table({
        "promo_cents": pa.array([int(agg.sum("promo_cents") or 0)],
                                type=pa.int64()),
        "total_cents": pa.array([int(agg.sum("total_cents") or 0)],
                                type=pa.int64())})


_SQL_TPCH_Q14 = f"""
SELECT CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN
         {_CENTS_SQL.format(x='l_extendedprice*(1-l_discount)')}
       ELSE 0 END), 0) AS BIGINT) AS promo_cents,
       CAST(COALESCE(SUM({_CENTS_SQL.format(x='l_extendedprice*(1-l_discount)')}), 0)
            AS BIGINT) AS total_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'
"""


def _q_tpch_q7_shape(sf_dir: str):
    """TPC-H Q7 shape (volume shipping between two nations): revenue by
    (supp_nation, cust_nation, ship year) for opposite NATION_1/NATION_2
    pairs, 1996–1997.  supplier/nation broadcast as dims; customer→
    nation is a slim Dataset side (NOT broadcast — corpus-sized at
    scale) joined to orders on custkey, then to the nation-filtered
    lineitem on orderkey (the canonical two big-big exchanges of Q7),
    both via the robust tagged-union groupby join."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import outer_join_by_key
    from dataguards_ray.steps.dedup import get_broadcast

    nat_a, nat_b = "NATION_1", "NATION_2"
    lo = int(pa.scalar("1996-01-01").cast(pa.timestamp("us")).value)
    hi = int(pa.scalar("1998-01-01").cast(pa.timestamp("us")).value)

    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation").take_all()
              if r["n_name"] in (nat_a, nat_b)}
    sup = {r["s_suppkey"]: nation[r["s_nationkey"]]
           for r in _read(sf_dir, "supplier",
                          ["s_suppkey", "s_nationkey"]).take_all()
           if r["s_nationkey"] in nation}
    import ray as _ray

    # broadcast as (sorted keys, name code) numpy pairs: the per-batch
    # lookup is one searchsorted over the corpus-sized column instead
    # of a per-row Python dict probe (Q8's np.isin pattern, plus the
    # name payload as an int8 code into the 2-name dictionary)
    names_dict = pa.array([nat_a, nat_b], type=pa.string())

    def _lookup_pair(m: dict) -> tuple:
        keys = np.sort(np.asarray(list(m), dtype=np.int64))
        codes = np.asarray([0 if m[k] == nat_a else 1 for k in keys],
                           dtype=np.int8)
        return keys, codes

    sup_ref = _ray.put(_lookup_pair(sup))
    nat_ref = _ray.put(_lookup_pair(nation))

    def _code_lookup(col: "pa.ChunkedArray", ref) -> tuple:
        """(present bool mask over col, matched rows' name StringArray).
        Null keys count as absent (the dict .get semantics)."""
        keys, codes = get_broadcast(ref)
        k = pc.fill_null(pc.cast(col, pa.int64()),
                         -1).to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return np.zeros(len(k), dtype=bool), pa.array(
                [], type=pa.string())
        idx = np.minimum(np.searchsorted(keys, k), len(keys) - 1)
        present = keys[idx] == k
        names = pc.take(names_dict,
                        pa.array(codes[idx[present]].astype(np.int32)))
        return present, names

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def prep_c(b: pa.Table) -> pa.Table:
        present, names = _code_lookup(b.column("c_nationkey"), nat_ref)
        return pa.table({
            "o_custkey": b.column("c_custkey").filter(pa.array(present)),
            "cust_nation": names})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    # tagged-union groupby join (inner): immune to Dataset.join's
    # partition-coverage crash on the sparse nation-filtered key sets
    # (see hash_join docstring)
    o2n = outer_join_by_key(
        orders, cust.map_batches(prep_c, batch_format="pyarrow"),
        "o_custkey", how="inner").select_columns(
        ["o_orderkey", "cust_nation"])

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount"])

    def prep_li(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("l_shipdate"), pa.int64())
        keep = pc.and_(pc.fill_null(pc.greater_equal(ts, lo), False),
                       pc.fill_null(pc.less(ts, hi), False))
        f = b.filter(keep)
        present, names = _code_lookup(f.column("l_suppkey"), sup_ref)
        f = f.filter(pa.array(present))
        ep = pc.cast(f.column("l_extendedprice"), pa.float64())
        di = pc.cast(f.column("l_discount"), pa.float64())
        rev = pc.multiply(ep, pc.subtract(pa.scalar(1.0, pa.float64()), di))
        return pa.table({
            "o_orderkey": f.column("l_orderkey"),
            "supp_nation": names,
            "l_year": pc.year(pc.cast(f.column("l_shipdate"),
                                      pa.timestamp("us"))),
            "rev_cents": _cents(rev)})

    j = outer_join_by_key(li.map_batches(prep_li, batch_format="pyarrow"),
                          o2n, "o_orderkey", how="inner")

    def opposite(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b.column("supp_nation"),
                                  b.column("cust_nation")))
        return b.filter(pc.fill_null(keep, False))

    agg = grouped_agg(j.map_batches(opposite, batch_format="pyarrow"),
                      ["supp_nation", "cust_nation", "l_year"],
                      [("rev_cents", "sum", "revenue_cents")])
    # dim-bounded result (nations² × years); pin the schema so an empty
    # result at tiny SFs still carries its columns
    rows = agg.sort(["supp_nation", "cust_nation", "l_year"]).take_all()
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("supp_nation", pa.string()), ("cust_nation", pa.string()),
         ("l_year", pa.int64()), ("revenue_cents", pa.int64())]))


_SQL_TPCH_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(YEAR FROM l_shipdate) AS l_year,
       CAST(SUM({_CENTS_SQL.format(x='l_extendedprice*(1-l_discount)')})
            AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def _q_tpch_q13_shape(sf_dir: str):
    """TPC-H Q13 shape: distribution of per-customer order counts with
    the priority filter playing the comment-pattern exclusion.  LEFT
    join via outer_join_by_key (customers with zero qualifying orders
    count at 0) over a pre-aggregated per-custkey count — the join
    moves one thin row per customer, never raw orders."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import outer_join_by_key

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                      "o_orderpriority"])

    def prep_o(b: pa.Table) -> pa.Table:
        keep = pc.fill_null(
            pc.invert(pc.equal(b.column("o_orderpriority"), "1-URGENT")),
            False)
        f = b.filter(keep)
        return pa.table({"o_custkey": f.column("o_custkey"),
                         "o_orderkey": f.column("o_orderkey")})

    cnt = grouped_agg(orders.map_batches(prep_o, batch_format="pyarrow"),
                      ["o_custkey"], [("o_orderkey", "count", "c_count")])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    j = outer_join_by_key(cust, cnt, "c_custkey", right_key="o_custkey",
                          how="left")

    def fill(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "c_count": pc.fill_null(
                pc.cast(b.column("c_count"), pa.int64()), 0)})

    dist = grouped_agg(j.map_batches(fill, batch_format="pyarrow"),
                       ["c_count"], [("c_custkey", "count", "custdist")])
    return dist.sort(["custdist", "c_count"], descending=[True, True])


_SQL_TPCH_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def _q_tpch_q15_shape(sf_dir: str):
    """TPC-H Q15 shape (top supplier view): per-supplier revenue for one
    quarter, keep the max-revenue supplier(s).  Revenue table is
    supplier-sized (pre-aggregated partials), so the max + filter pass
    runs over a materialized thin Dataset; names attach from the
    broadcast supplier dim."""
    from dataguards_ray.aggregates import grouped_agg

    lo = int(pa.scalar("1996-01-01").cast(pa.timestamp("us")).value)
    hi = int(pa.scalar("1996-04-01").cast(pa.timestamp("us")).value)

    li = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("l_shipdate"), pa.int64())
        keep = pc.and_(pc.fill_null(pc.greater_equal(ts, lo), False),
                       pc.fill_null(pc.less(ts, hi), False))
        f = b.filter(keep)
        ep = pc.cast(f.column("l_extendedprice"), pa.float64())
        di = pc.cast(f.column("l_discount"), pa.float64())
        rev = pc.multiply(ep, pc.subtract(pa.scalar(1.0, pa.float64()), di))
        return pa.table({"s_suppkey": f.column("l_suppkey"),
                         "rev_cents": _cents(rev)})

    rev = grouped_agg(li.map_batches(prep, batch_format="pyarrow"),
                      ["s_suppkey"],
                      [("rev_cents", "sum", "total_revenue_cents")]
                      ).materialize()  # supplier-sized; consumed twice
    mx = rev.max("total_revenue_cents")
    top = rev.map_batches(
        lambda b: b.filter(pc.equal(b.column("total_revenue_cents"),
                                    pa.scalar(mx, pa.int64()))),
        batch_format="pyarrow").to_pandas()

    names = {r["s_suppkey"]: r["s_name"]
             for r in _read(sf_dir, "supplier",
                            ["s_suppkey", "s_name"]).take_all()}
    top["s_name"] = top["s_suppkey"].map(names)
    if top["s_name"].isna().any():
        raise ValueError("tpch_q15_shape: l_suppkey missing from supplier "
                         "(FK integrity required for the dim lookup)")
    top = top.sort_values("s_suppkey").reset_index(drop=True)
    return pa.Table.from_pandas(
        top[["s_suppkey", "s_name", "total_revenue_cents"]],
        preserve_index=False)


_SQL_TPCH_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(SUM({_CENTS_SQL.format(x='l_extendedprice*(1-l_discount)')})
              AS BIGINT) AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
FROM revenue r JOIN supplier s ON r.s_suppkey = s.s_suppkey
WHERE r.total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM revenue)
ORDER BY s.s_suppkey
"""


def _q_tpch_q16_shape(sf_dir: str):
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    for filtered parts — partsupp doesn't exist in this corpus, so the
    part-supplier relation is lineitem's (l_partkey, l_suppkey).  part
    broadcasts as a dense attribute array (a dim); the count rides
    grouped_count_distinct (distinct pairs first, thin partials only)."""
    from dataguards_ray.aggregates import grouped_count_distinct
    from dataguards_ray.steps.dedup import get_broadcast

    import ray as _ray

    # filter part on the driver with Arrow kernels, ship the surviving
    # (partkey, brand, type, size) columns as aligned broadcast arrays
    ptbl = pa.concat_tables(_ray.get(_read(
        sf_dir, "part",
        ["p_partkey", "p_brand", "p_type", "p_size"]).to_arrow_refs()))
    psz = pc.cast(ptbl.column("p_size"), pa.int64())
    keep = pc.and_(
        pc.and_(pc.not_equal(ptbl.column("p_brand"), "Brand#21"),
                pc.not_equal(ptbl.column("p_type"), "PROMO")),
        pc.is_in(psz, value_set=pa.array([1, 3, 5, 7, 9, 12],
                                         type=pa.int64())))
    ptbl = ptbl.set_column(
        ptbl.schema.get_field_index("p_size"), "p_size", psz).filter(keep)
    ref = _ray.put(tuple(
        ptbl.column(c).combine_chunks()
        for c in ("p_partkey", "p_brand", "p_type", "p_size")))

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def prep(b: pa.Table) -> pa.Table:
        pk, pb, pt, psize = get_broadcast(ref)
        idx = pc.index_in(b.column("l_partkey"), value_set=pk)
        mask = pc.is_valid(idx)
        hit = pc.array_filter(idx, mask)
        return pa.table({
            "p_brand": pc.take(pb, hit),
            "p_type": pc.take(pt, hit),
            "p_size": pc.take(psize, hit),
            "l_suppkey": b.column("l_suppkey").filter(mask)})

    cnt = grouped_count_distinct(
        li.map_batches(prep, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size"], "l_suppkey", "supplier_cnt")
    return cnt.sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
                    descending=[True, False, False, False])


_SQL_TPCH_Q16 = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#21' AND p_type <> 'PROMO'
  AND p_size IN (1, 3, 5, 7, 9, 12)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def _q_tpch_q19_shape(sf_dir: str):
    """TPC-H Q19 shape: disjunctive brand/size/quantity predicates over
    lineitem⨝part, one global revenue sum.  part ships once as dense
    numpy attribute arrays indexed by partkey (vectorized gather — no
    per-row dict probes), the disjunction is pure numpy masks, and the
    only aggregation is a native distributed sum: zero shuffle."""
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_size"]).take_all()
    maxk = max(r["p_partkey"] for r in part)
    brand_id = np.full(maxk + 1, -1, dtype=np.int32)   # -1 = absent
    size_arr = np.zeros(maxk + 1, dtype=np.int32)
    brands = {"Brand#12": 0, "Brand#23": 1, "Brand#3": 2}
    for r in part:
        brand_id[r["p_partkey"]] = brands.get(r["p_brand"], 3)
        size_arr[r["p_partkey"]] = int(r["p_size"])
    import ray as _ray

    ref = _ray.put((brand_id, size_arr))
    from dataguards_ray.steps.dedup import get_broadcast

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        bid, siz = get_broadcast(ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        ok = (pk >= 0) & (pk < len(bid))
        pk = np.where(ok, pk, 0)
        br = np.where(ok, bid[pk], -1)
        sz = siz[pk]
        qty = pc.cast(b.column("l_quantity"), pa.float64()).to_numpy(
            zero_copy_only=False)
        m = (((br == 0) & (sz >= 1) & (sz <= 5) & (qty >= 1) & (qty <= 11))
             | ((br == 1) & (sz >= 1) & (sz <= 10) & (qty >= 10) & (qty <= 20))
             | ((br == 2) & (sz >= 1) & (sz <= 12) & (qty >= 20) & (qty <= 30)))
        f = b.filter(pa.array(m))
        ep = pc.cast(f.column("l_extendedprice"), pa.float64())
        di = pc.cast(f.column("l_discount"), pa.float64())
        rev = pc.multiply(ep, pc.subtract(pa.scalar(1.0, pa.float64()), di))
        return pa.table({"rev_cents": _cents(rev)})

    total = li.map_batches(prep, batch_format="pyarrow").sum("rev_cents")
    return pa.table({"revenue_cents": pa.array([int(total or 0)],
                                               type=pa.int64())})


_SQL_TPCH_Q19 = f"""
SELECT CAST(COALESCE(SUM({_CENTS_SQL.format(x='l_extendedprice*(1-l_discount)')}), 0)
            AS BIGINT) AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 12
       AND l_quantity BETWEEN 20 AND 30)
"""


def _q_tpch_q22_shape(sf_dir: str):
    """TPC-H Q22 shape (global-sales-opportunity): customers above the
    positive-balance average with no orders since 1999, grouped by a
    custkey-derived country code.  The average threshold is EXACT
    integer arithmetic (cents·count > total_cents — no float summation
    order in the hash); the no-orders side is anti_join (broadcast
    is_in under the cap, Bloom + exact left_anti above it)."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import anti_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def pos_cents(b: pa.Table) -> pa.Table:
        cents = _cents(pc.cast(b.column("c_acctbal"), pa.float64()))
        pos = pc.fill_null(pc.greater(cents, 0), False)
        f = cents.filter(pos)
        return pa.table({"cents": f,
                         "one": pa.array(np.ones(len(f), dtype=np.int64))})

    agg = cust.map_batches(pos_cents, batch_format="pyarrow").materialize()
    total = int(agg.sum("cents") or 0)
    cnt = int(agg.sum("one") or 0)
    if cnt == 0:
        raise ValueError("tpch_q22_shape: no positive balances")

    lo = int(pa.scalar("1999-01-01").cast(pa.timestamp("us")).value)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    recent = orders.map_batches(
        lambda b: b.filter(pc.fill_null(pc.greater_equal(
            pc.cast(b.column("o_orderdate"), pa.int64()), lo), False)),
        batch_format="pyarrow").select_columns(["o_custkey"])

    no_ord = anti_join(cust, recent, "c_custkey", right_key="o_custkey")

    def pick(b: pa.Table) -> pa.Table:
        cents = _cents(pc.cast(b.column("c_acctbal"), pa.float64()))
        # cents/1 > total/cnt  <=>  cents*cnt > total (exact integers)
        keep = pc.fill_null(pc.greater(
            pc.multiply(pc.cast(cents, pa.int64()),
                        pa.scalar(cnt, pa.int64())),
            pa.scalar(total, pa.int64())), False)
        f = b.filter(keep)
        code = pc.cast(
            pc.subtract(
                pc.cast(f.column("c_custkey"), pa.int64()),
                pc.multiply(
                    pc.divide(pc.cast(f.column("c_custkey"), pa.int64()),
                              pa.scalar(10, pa.int64())),
                    pa.scalar(10, pa.int64()))),
            pa.int64())
        return pa.table({
            "cntrycode": code,
            "bal_cents": _cents(pc.cast(f.column("c_acctbal"),
                                        pa.float64())),
            "one": pa.array(np.ones(f.num_rows, dtype=np.int64))})

    out = grouped_agg(no_ord.map_batches(pick, batch_format="pyarrow"),
                      ["cntrycode"],
                      [("one", "sum", "numcust"),
                       ("bal_cents", "sum", "totacctbal_cents")])
    return out.sort("cntrycode")


_SQL_TPCH_Q22 = f"""
WITH pos AS (
  SELECT SUM({_CENTS_SQL.format(x='c_acctbal')}) AS total,
         COUNT(*) AS cnt
  FROM customer WHERE {_CENTS_SQL.format(x='c_acctbal')} > 0)
SELECT CAST(c_custkey % 10 AS BIGINT) AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM({_CENTS_SQL.format(x='c_acctbal')}) AS BIGINT)
         AS totacctbal_cents
FROM customer, pos
WHERE {_CENTS_SQL.format(x='c_acctbal')} * cnt > total
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1 ORDER BY 1
"""


def _q_tpch_q2_shape(sf_dir: str):
    """TPC-H Q2 shape (min-cost supplier per part, argmin join-back):
    partsupp doesn't exist in this corpus, so the part-supplier relation
    and its cost derive from lineitem — cost(part,supp) =
    MIN(cents(l_extendedprice)).  Composition: EUROPE-supplier attrs +
    filtered-part keys broadcast (dims) → vectorized np.isin prune of
    lineitem → per-(part,supp) MIN partials (thin: dim×dim bounded) →
    per-part MIN broadcast back onto the pair aggregate (the correlated
    subquery) → equality filter → attach supplier attrs → sort + limit
    on a unique key.  No corpus-sized exchange: both groupbys ride thin
    partials."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import broadcast_lookup
    from dataguards_ray.steps.dedup import get_broadcast
    import math
    import ray as _ray

    nat = {r["n_nationkey"]: r["n_name"]
           for r in _read(sf_dir, "nation").take_all()}
    reg = {r["r_regionkey"]: r["r_name"]
           for r in _read(sf_dir, "region").take_all()}
    n2r = {k: reg[r]
           for k, r in ((r["n_nationkey"], r["n_regionkey"])
                        for r in _read(sf_dir, "nation").take_all())}
    sup = {r["s_suppkey"]: (r["s_name"], nat[r["s_nationkey"]],
                            int(math.floor(r["s_acctbal"] * 100 + 0.5)))
           for r in _read(sf_dir, "supplier").take_all()
           if n2r[r["s_nationkey"]] == "EUROPE"}
    parts = np.sort(np.asarray(
        [r["p_partkey"] for r in _read(
            sf_dir, "part", ["p_partkey", "p_size", "p_type"]).take_all()
         if int(r["p_size"]) == 7 and r["p_type"] == "LARGE"],
        dtype=np.int64))
    sups = np.sort(np.asarray(sorted(sup), dtype=np.int64))
    keys_ref = _ray.put((parts, sups))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        pk_arr, sk_arr = get_broadcast(keys_ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        keep = np.isin(pk, pk_arr) & np.isin(sk, sk_arr)
        f = b.filter(pa.array(keep))
        return pa.table({"p_partkey": f.column("l_partkey"),
                         "s_suppkey": f.column("l_suppkey"),
                         "cost_cents": _cents(f.column("l_extendedprice"))})

    pairs = grouped_agg(li.map_batches(prep, batch_format="pyarrow"),
                        ["p_partkey", "s_suppkey"],
                        [("cost_cents", "min", "cost_cents")])
    mins = {r["p_partkey"]: int(r["mn"]) for r in grouped_agg(
        pairs, ["p_partkey"], [("cost_cents", "min", "mn")]).take_all()}
    sup_ref = _ray.put(sup)

    def pick(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("cost_cents"), b.column("_mn")))
        sm = get_broadcast(sup_ref)
        attrs = [sm[k] for k in b.column("s_suppkey").to_pylist()]
        return pa.table({
            "s_acctbal_cents": pa.array([a[2] for a in attrs], pa.int64()),
            "s_name": pa.array([a[0] for a in attrs], pa.string()),
            "n_name": pa.array([a[1] for a in attrs], pa.string()),
            "p_partkey": b.column("p_partkey"),
            "cost_cents": b.column("cost_cents")})

    out = broadcast_lookup(pairs, mins, "p_partkey", "_mn",
                           out_type=pa.int64()).map_batches(
        pick, batch_format="pyarrow")
    rows = out.sort(["s_acctbal_cents", "n_name", "s_name", "p_partkey"],
                    descending=[True, False, False, False]
                    ).limit(100).take_all()
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("s_acctbal_cents", pa.int64()), ("s_name", pa.string()),
         ("n_name", pa.string()), ("p_partkey", pa.int64()),
         ("cost_cents", pa.int64())]))


_SQL_TPCH_Q2 = f"""
WITH eursup AS (
  SELECT s_suppkey, s_name, n_name,
         {_CENTS_SQL.format(x='s_acctbal')} AS s_acctbal_cents
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
ps AS (
  SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
         MIN({_CENTS_SQL.format(x='l_extendedprice')}) AS cost_cents
  FROM lineitem JOIN part ON p_partkey = l_partkey
                JOIN eursup ON s_suppkey = l_suppkey
  WHERE p_size = 7 AND p_type = 'LARGE' GROUP BY 1, 2),
mn AS (SELECT p_partkey, MIN(cost_cents) AS m FROM ps GROUP BY 1)
SELECT s_acctbal_cents, s_name, n_name, ps.p_partkey, cost_cents
FROM ps JOIN mn USING (p_partkey) JOIN eursup USING (s_suppkey)
WHERE cost_cents = m
ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def _q_tpch_q8_shape(sf_dir: str):
    """TPC-H Q8 shape (national market share): NATION_3's share of
    ECONOMY-part revenue shipped to ASIA customers, by order year
    1996–1997.  Numerator and denominator are returned as int64 cents
    (no float division — hash-stable).  part keys + supplier→is-nation
    broadcast as dims; customer→region is a slim Dataset side joined to
    orders on custkey, then to part-filtered lineitem on orderkey (Q8's
    two canonical big-big exchanges), both via the tagged-union groupby
    join; final aggregate is a 2-row year groupby over thin partials."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import outer_join_by_key
    from dataguards_ray.steps.dedup import get_broadcast
    import ray as _ray

    reg = {r["r_regionkey"]: r["r_name"]
           for r in _read(sf_dir, "region").take_all()}
    n2r = {r["n_nationkey"]: reg[r["n_regionkey"]]
           for r in _read(sf_dir, "nation").take_all()}
    nat = {r["n_nationkey"]: r["n_name"]
           for r in _read(sf_dir, "nation").take_all()}
    asia = np.sort(np.asarray([k for k, v in n2r.items() if v == "ASIA"],
                              dtype=np.int64))
    numer = np.sort(np.asarray(
        [r["s_suppkey"] for r in _read(
            sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
         if nat[r["s_nationkey"]] == "NATION_3"], dtype=np.int64))
    parts = np.sort(np.asarray(
        [r["p_partkey"] for r in _read(
            sf_dir, "part", ["p_partkey", "p_type"]).take_all()
         if r["p_type"] == "ECONOMY"], dtype=np.int64))
    dims_ref = _ray.put((asia, numer, parts))
    lo = int(pa.scalar("1996-01-01").cast(pa.timestamp("us")).value)
    hi = int(pa.scalar("1998-01-01").cast(pa.timestamp("us")).value)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def prep_c(b: pa.Table) -> pa.Table:
        asia_n, _, _ = get_broadcast(dims_ref)
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(np.isin(nk, asia_n)))
        return pa.table({"o_custkey": f.column("c_custkey"),
                         "_asia": pa.array(np.ones(len(f), dtype=np.int8))})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_o(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("o_orderdate"), pa.int64())
        keep = pc.and_(pc.fill_null(pc.greater_equal(ts, lo), False),
                       pc.fill_null(pc.less(ts, hi), False))
        f = b.filter(keep)
        return pa.table({
            "o_orderkey": f.column("o_orderkey"),
            "o_custkey": f.column("o_custkey"),
            "o_year": pc.year(pc.cast(f.column("o_orderdate"),
                                      pa.timestamp("us")))})

    o2a = outer_join_by_key(
        orders.map_batches(prep_o, batch_format="pyarrow"),
        cust.map_batches(prep_c, batch_format="pyarrow"),
        "o_custkey", how="inner").select_columns(
        ["o_orderkey", "o_year"])

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"])

    def prep_li(b: pa.Table) -> pa.Table:
        _, numer_s, parts_p = get_broadcast(dims_ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(np.isin(pk, parts_p)))
        ep = pc.cast(f.column("l_extendedprice"), pa.float64())
        di = pc.cast(f.column("l_discount"), pa.float64())
        rev = pc.multiply(ep, pc.subtract(pa.scalar(1.0, pa.float64()), di))
        sk = f.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": f.column("l_orderkey"),
            "rev_cents": _cents(rev),
            "_is_nat": pa.array(np.isin(sk, numer_s).astype(np.int64))})

    j = outer_join_by_key(li.map_batches(prep_li, batch_format="pyarrow"),
                          o2a, "o_orderkey", how="inner")

    def to_partial(b: pa.Table) -> pa.Table:
        rev = pc.cast(b.column("rev_cents"), pa.int64())
        return pa.table({
            "o_year": b.column("o_year"),
            "nation_cents": pc.multiply(rev, b.column("_is_nat")),
            "total_cents": rev})

    agg = grouped_agg(j.map_batches(to_partial, batch_format="pyarrow"),
                      ["o_year"], [("nation_cents", "sum", "nation_cents"),
                                   ("total_cents", "sum", "total_cents")])
    rows = agg.sort("o_year").take_all()
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("o_year", pa.int64()), ("nation_cents", pa.int64()),
         ("total_cents", pa.int64())]))


_SQL_TPCH_Q8 = f"""
SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
       CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                THEN {_CENTS_SQL.format(x='l_extendedprice*(1-l_discount)')}
                ELSE 0 END) AS BIGINT) AS nation_cents,
       CAST(SUM({_CENTS_SQL.format(x='l_extendedprice*(1-l_discount)')})
            AS BIGINT) AS total_cents
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = cn.n_regionkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1
"""


def _q_tpch_q9_shape(sf_dir: str):
    """TPC-H Q9 shape (product-type profit by nation × year): partsupp
    doesn't exist, so unit cost = p_retailprice; year = ship year (keeps
    the shape dim-join-only — Q8 already exercises the orders big-big
    exchange).  profit = l_extendedprice*(1-l_discount) −
    p_retailprice*l_quantity, summed as cents.  part ships once as a
    dense retailprice array (absent parts = NaN, vectorized gather);
    supplier→nation as a dense code array; the only exchange is the
    (nation, year) groupby over thin partials."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.steps.dedup import get_broadcast
    import ray as _ray

    nat = {r["n_nationkey"]: r["n_name"]
           for r in _read(sf_dir, "nation").take_all()}
    part = _read(sf_dir, "part",
                 ["p_partkey", "p_name", "p_retailprice"]).take_all()
    maxp = max(r["p_partkey"] for r in part)
    rp = np.full(maxp + 1, np.nan, dtype=np.float64)
    for r in part:
        if "bolt" in r["p_name"]:
            rp[r["p_partkey"]] = float(r["p_retailprice"])
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
    maxs = max(r["s_suppkey"] for r in sup)
    names = sorted(set(nat.values()))
    code = {n: i for i, n in enumerate(names)}
    sn = np.full(maxs + 1, -1, dtype=np.int32)
    for r in sup:
        sn[r["s_suppkey"]] = code[nat[r["s_nationkey"]]]
    ref = _ray.put((rp, sn, np.asarray(names, dtype=object)))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_shipdate", "l_quantity",
                "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        rp_a, sn_a, names_a = get_broadcast(ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        cost = rp_a[np.clip(pk, 0, len(rp_a) - 1)]
        cost[pk >= len(rp_a)] = np.nan
        keep = ~np.isnan(cost)
        f = b.filter(pa.array(keep))
        cost = cost[keep]
        ep = pc.cast(f.column("l_extendedprice"), pa.float64()).to_numpy()
        di = pc.cast(f.column("l_discount"), pa.float64()).to_numpy()
        qt = pc.cast(f.column("l_quantity"), pa.float64()).to_numpy()
        profit = ep * (1.0 - di) - cost * qt
        sk = f.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "nation": pa.array(names_a[sn_a[sk]], type=pa.string()),
            "o_year": pc.year(pc.cast(f.column("l_shipdate"),
                                      pa.timestamp("us"))),
            "profit_cents": _cents(pa.array(profit))})

    agg = grouped_agg(li.map_batches(prep, batch_format="pyarrow"),
                      ["nation", "o_year"],
                      [("profit_cents", "sum", "profit_cents")])
    rows = agg.sort(["nation", "o_year"],
                    descending=[False, True]).take_all()
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("nation", pa.string()), ("o_year", pa.int64()),
         ("profit_cents", pa.int64())]))


_SQL_TPCH_Q9 = f"""
SELECT n_name AS nation, EXTRACT(YEAR FROM l_shipdate) AS o_year,
       CAST(SUM({_CENTS_SQL.format(
           x='(l_extendedprice*(1-l_discount) - p_retailprice*l_quantity)')})
            AS BIGINT) AS profit_cents
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


def _q_tpch_q11_shape(sf_dir: str):
    """TPC-H Q11 shape (important stock, HAVING vs a global total):
    per-part lineitem value for NATION_7's suppliers, keeping parts
    whose value exceeds 0.1% of the total.  Pure integer math on both
    sides (value_cents*1000 > total_cents) — no float fraction.  The
    per-part aggregate is thin partials; the total is a native
    distributed sum over that aggregate; the filter is one vectorized
    map with the scalar captured."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.steps.dedup import get_broadcast
    import ray as _ray

    nat = {r["n_nationkey"]: r["n_name"]
           for r in _read(sf_dir, "nation").take_all()}
    sups = np.sort(np.asarray(
        [r["s_suppkey"] for r in _read(
            sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
         if nat[r["s_nationkey"]] == "NATION_7"], dtype=np.int64))
    ref = _ray.put(sups)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        sk_arr = get_broadcast(ref)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(np.isin(sk, sk_arr)))
        return pa.table({"p_partkey": f.column("l_partkey"),
                         "value_cents": _cents(f.column("l_extendedprice"))})

    agg = grouped_agg(li.map_batches(prep, batch_format="pyarrow"),
                      ["p_partkey"],
                      [("value_cents", "sum", "value_cents")])
    total = int(agg.sum("value_cents") or 0)
    kept = agg.map_batches(
        lambda b: b.filter(pc.greater(
            pc.multiply(pc.cast(b.column("value_cents"), pa.int64()),
                        pa.scalar(1000, pa.int64())),
            pa.scalar(total, pa.int64()))),
        batch_format="pyarrow")
    rows = kept.sort(["value_cents", "p_partkey"],
                     descending=[True, False]).take_all()
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("p_partkey", pa.int64()), ("value_cents", pa.int64())]))


_SQL_TPCH_Q11 = f"""
WITH v AS (
  SELECT l_partkey AS p_partkey,
         SUM({_CENTS_SQL.format(x='l_extendedprice')}) AS value_cents
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_7' GROUP BY 1)
SELECT p_partkey, CAST(value_cents AS BIGINT) AS value_cents FROM v
WHERE value_cents * 1000 > (SELECT SUM(value_cents) FROM v)
ORDER BY value_cents DESC, p_partkey
"""


def _q_tpch_q20_shape(sf_dir: str):
    """TPC-H Q20 shape (semi-join on an aggregate-derived set): without
    partsupp availqty, a supplier 'has excess share' of a part when its
    1997-shipped quantity exceeds half the part's total 1997 quantity.
    NATION_2 suppliers appearing in that set, by name.  Composition:
    date filter + part-name keys broadcast → per-(part,supp) qty
    partials (thin) → per-part totals broadcast back (the correlated
    threshold) → vectorized share filter → supplier-dim distinct on the
    driver → final dim-only projection.  l_quantity is integer-valued
    so doubled-quantity comparisons are exact."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import broadcast_lookup
    from dataguards_ray.steps.dedup import get_broadcast
    import ray as _ray

    nat = {r["n_nationkey"]: r["n_name"]
           for r in _read(sf_dir, "nation").take_all()}
    parts = np.sort(np.asarray(
        [r["p_partkey"] for r in _read(
            sf_dir, "part", ["p_partkey", "p_name"]).take_all()
         if r["p_name"].startswith("small")], dtype=np.int64))
    ref = _ray.put(parts)
    lo = int(pa.scalar("1997-01-01").cast(pa.timestamp("us")).value)
    hi = int(pa.scalar("1998-01-01").cast(pa.timestamp("us")).value)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        pk_arr = get_broadcast(ref)
        ts = pc.cast(b.column("l_shipdate"), pa.int64())
        keep = pc.and_(pc.fill_null(pc.greater_equal(ts, lo), False),
                       pc.fill_null(pc.less(ts, hi), False))
        f = b.filter(keep)
        pk = f.column("l_partkey").to_numpy(zero_copy_only=False)
        f = f.filter(pa.array(np.isin(pk, pk_arr)))
        return pa.table({"p_partkey": f.column("l_partkey"),
                         "s_suppkey": f.column("l_suppkey"),
                         "qty": pc.cast(f.column("l_quantity"),
                                        pa.float64())})

    pairs = grouped_agg(li.map_batches(prep, batch_format="pyarrow"),
                        ["p_partkey", "s_suppkey"], [("qty", "sum", "q")])
    tots = {r["p_partkey"]: float(r["tq"]) for r in grouped_agg(
        pairs, ["p_partkey"], [("q", "sum", "tq")]).take_all()}

    excess = broadcast_lookup(pairs, tots, "p_partkey", "_tq",
                              out_type=pa.float64()).map_batches(
        lambda b: b.filter(pc.greater(
            pc.multiply(pc.cast(b.column("q"), pa.float64()),
                        pa.scalar(2.0, pa.float64())),
            b.column("_tq"))),
        batch_format="pyarrow")
    qual = {r["s_suppkey"] for r in excess.select_columns(
        ["s_suppkey"]).take_all()}

    out = [(r["s_name"], nat[r["s_nationkey"]])
           for r in _read(sf_dir, "supplier",
                          ["s_suppkey", "s_name", "s_nationkey"]).take_all()
           if r["s_suppkey"] in qual
           and nat[r["s_nationkey"]] == "NATION_2"]
    out.sort()
    return pa.table({
        "s_name": pa.array([x[0] for x in out], pa.string()),
        "n_name": pa.array([x[1] for x in out], pa.string())})


_SQL_TPCH_Q20 = """
WITH pq AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1, 2),
tot AS (SELECT l_partkey, SUM(q) AS tq FROM pq GROUP BY 1)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2' AND s_suppkey IN (
  SELECT l_suppkey FROM pq JOIN tot USING (l_partkey) WHERE 2*q > tq)
ORDER BY s_name
"""


def _q_tpch_q21_shape(sf_dir: str):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the corpus
    has no commit/receipt dates, so 'late' = l_shipdate more than 120
    days after o_orderdate.  A supplier waits an order when it is the
    ONLY late supplier on a finished multi-supplier order (the EXISTS /
    NOT-EXISTS pair).  Composition: F-orders ⨝ lineitem on orderkey
    (the big-big exchange, tagged-union join) → per-(order,supp)
    any-late partials → per-order [n_suppliers, n_late, the-late-supp]
    via one more thin groupby (MAX over late?supp:-1 resolves the
    unique late supplier exactly when n_late=1 — no per-group Python)
    → filter → supplier-name counts → top-k."""
    from dataguards_ray.aggregates import grouped_agg
    from dataguards_ray.joins import broadcast_lookup, outer_join_by_key

    late_us = 120 * 86400 * 1_000_000

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_orderdate"])

    def prep_o(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("o_orderstatus"), "F"))
        return pa.table({"o_orderkey": f.column("o_orderkey"),
                         "o_ts": pc.cast(f.column("o_orderdate"),
                                         pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])

    def prep_li(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b.column("l_orderkey"),
                         "s_suppkey": b.column("l_suppkey"),
                         "ship_ts": pc.cast(b.column("l_shipdate"),
                                            pa.int64())})

    j = outer_join_by_key(li.map_batches(prep_li, batch_format="pyarrow"),
                          orders.map_batches(prep_o,
                                             batch_format="pyarrow"),
                          "o_orderkey", how="inner")

    def flag(b: pa.Table) -> pa.Table:
        late = pc.cast(pc.greater(
            b.column("ship_ts"),
            pc.add(b.column("o_ts"), pa.scalar(late_us, pa.int64()))),
            pa.int64())
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "s_suppkey": b.column("s_suppkey"),
                         "late": late})

    per_pair = grouped_agg(j.map_batches(flag, batch_format="pyarrow"),
                           ["o_orderkey", "s_suppkey"],
                           [("late", "max", "late")])

    def widen(b: pa.Table) -> pa.Table:
        late = pc.cast(b.column("late"), pa.int64())
        sk = pc.cast(b.column("s_suppkey"), pa.int64())
        late_sk = pc.if_else(pc.equal(late, 1), sk,
                             pa.scalar(-1, pa.int64()))
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "one": pa.array(np.ones(len(b), dtype=np.int64)),
                         "late": late, "late_sk": late_sk})

    per_order = grouped_agg(per_pair.map_batches(widen,
                                                 batch_format="pyarrow"),
                            ["o_orderkey"],
                            [("one", "sum", "nsupp"),
                             ("late", "sum", "nlate"),
                             ("late_sk", "max", "lsk")])
    waits = per_order.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(pc.cast(b.column("nsupp"), pa.int64()), 2),
            pc.equal(pc.cast(b.column("nlate"), pa.int64()), 1))),
        batch_format="pyarrow")

    names = {r["s_suppkey"]: r["s_name"]
             for r in _read(sf_dir, "supplier",
                            ["s_suppkey", "s_name"]).take_all()}
    named = broadcast_lookup(waits, names, "lsk", "s_name",
                             out_type=pa.string())
    cnt = grouped_agg(named.map_batches(
        lambda b: b.append_column("one", pa.array(
            np.ones(len(b), dtype=np.int64))), batch_format="pyarrow"),
        ["s_name"], [("one", "sum", "numwait")])
    rows = cnt.sort(["numwait", "s_name"],
                    descending=[True, False]).limit(100).take_all()
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("s_name", pa.string()), ("numwait", pa.int64())]))


_SQL_TPCH_Q21 = """
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 120 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
p AS (
  SELECT l_orderkey, l_suppkey, MAX(late) AS late
  FROM l GROUP BY 1, 2),
g AS (
  SELECT l_orderkey, COUNT(*) AS nsupp, SUM(late) AS nlate,
         MAX(CASE WHEN late = 1 THEN l_suppkey ELSE -1 END) AS lsk
  FROM p GROUP BY 1)
SELECT s_name, COUNT(*) AS numwait
FROM g JOIN supplier ON s_suppkey = lsk
WHERE nsupp >= 2 AND nlate = 1
GROUP BY 1 ORDER BY numwait DESC, s_name
LIMIT 100
"""


_FD_COLS = ["o_custkey", "o_orderpriority", "o_orderstatus"]


def _q_fd_discovery_orders(sf_dir: str):
    """TANE-style FD discovery over three orders columns (full lattice,
    prune=False so the SQL oracle can mirror row-for-row).  Per
    candidate: one thin distinct-(LHS,RHS) exchange + driver-side group
    stats — a loop over the 9-candidate lattice, never over rows
    (rules/discovery.py)."""
    from dataguards_ray.rules.discovery import discover_fds

    ds = _read(sf_dir, "orders", _FD_COLS)
    return discover_fds(ds, _FD_COLS, max_lhs=2, prune=False)


def _fd_discovery_sql() -> str:
    """DuckDB mirror generated from the SAME candidate lattice.
    COUNT(DISTINCT x) ignores NULLs in SQL while Arrow's group-distinct
    counts the NULL value — corrected with a MAX(x IS NULL) term."""
    from dataguards_ray.rules.discovery import fd_candidates

    parts = []
    for lhs, rhs in fd_candidates(_FD_COLS, 2):
        lhs_sql = ", ".join(lhs)
        inner = (f"SELECT COUNT(DISTINCT {rhs}) + "
                 f"MAX(CASE WHEN {rhs} IS NULL THEN 1 ELSE 0 END) AS d "
                 f"FROM orders GROUP BY {lhs_sql}")
        parts.append(
            f"SELECT '{','.join(lhs)}' AS lhs, '{rhs}' AS rhs, "
            f"CAST(COUNT(*) AS BIGINT) AS n_groups, "
            f"CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) "
            f"AS n_violating_groups, "
            f"SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0 AS holds "
            f"FROM ({inner}) t")
    return "\nUNION ALL\n".join(parts)


def _q_cfd_mine_source_lang(sf_dir: str):
    """Constant-CFD mining (CFDMiner-style): per source the majority
    lang becomes a pattern (source=s → lang=c) kept at support ≥ 5 and
    confidence ≥ 3/10 (integer cross-multiplied — no float in the
    decision).  One thin (source, lang, n) exchange; majority pick on
    the driver below the cap, distributed map_groups above
    (rules/discovery.py:discover_constant_cfds)."""
    from dataguards_ray.rules.discovery import discover_constant_cfds

    ds = _read(sf_dir, "documents", ["source", "lang"])
    return discover_constant_cfds(ds, ["source"], "lang",
                                  min_support=5, min_conf=(3, 10))


_SQL_CFD_MINE = """
WITH pc AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY source, lang),
best AS (SELECT source, lang, n,
                SUM(n) OVER (PARTITION BY source) AS s,
                ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY n DESC, lang) AS rn
         FROM pc)
SELECT source, lang, n AS support, CAST(s AS BIGINT) AS group_size
FROM best WHERE rn = 1 AND n >= 5 AND n * 10 >= s * 3
"""


# Round-5 driver window (VERDICT r04 item #8): every query whose code
# path changed this round (samplers, Q7 prep, as-of bucketing, span
# dedup defaults, real MJPEG video, check job, read_table block sizing
# touches ALL — the full 132-query sweep also ran green in-session),
# then the entries whose last driver check was the r02 window (oldest
# coverage first).
_R05_WINDOW = [
    "token_budget_sample", "sample_mixture_docs", "tpch_q7_shape",
    "asof_click_purchase", "asof_next_purchase", "multimodal_video_frames",
    "span_dedup_docs", "line_dedup_docs", "substring_dedup_docs",
    "check_config_orders", "hash_sample", "dedup_docs_exact",
    "minhash_near_dups", "minhash_near_dups_digest", "embedding_dedup",
    "flagship_pipeline",
    "tpch_q8_shape", "tpch_q21_shape", "knn_embeddings",
    # oldest driver coverage (green r02, unseen since)
    "tpch_q1", "join_customer_orders",
    "join_region_nation_customer", "semi_join_customers_with_orders",
    "anti_join_customers_without_orders", "hash_join_supplier_nation",
    "topk_orders",
    "nations_without_suppliers_negbal", "latest_event_per_user",
    "json_props_stats", "window_tumbling_events", "window_hopping_events",
    "window_distinct_users", "running_total_per_user",
    "range_join_click_purchase", "interval_overlap_click_view",
    "event_gap_lag", "moving_sum_events", "range_sum_events",
    "rank_customer_balance", "pivot_orders_status",
    "full_outer_nation_balance", "var_price_by_status", "top_tokens",
    "tpch_q3", "median_price_by_priority",
    # round-5-session addition (incremental semdedup) + its touched
    # kernel's existing query: take the slots of union_all_names /
    # distinct_flag_status (both twice-green, trivial shapes)
    "semdedup_incremental", "semdedup_embeddings",
    # round-5-session addition (simhash dedup mode): takes
    # filter_project's slot (twice-green, trivial shape)
    "simhash_dedup_docs",
    # round-5-session fixes touched dsir (empty-corpus int cast) and
    # urltools (root-dot strip): both take window slots from the
    # mad/p90 quantile siblings (median keeps the family's driver row)
    "dsir_resample_docs", "url_blocklist_filter",
    # distinct_customers_by_priority (green r02) yielded its slot to
    # minhash_near_dups_digest
]


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDERING CONTRACT: the driver verifies the FIRST 50 entries of this
    # dict against oracle_sql() (rows+schema+hash; rows-only when no SQL
    # entry exists).  r02/r03/r04 rotated disjoint windows until every
    # entry had a driver row; round 5 leads with _R05_WINDOW (above).
    q = _queries_registry()
    lead = {name: q[name] for name in _R05_WINDOW}
    return lead | {k: v for k, v in q.items() if k not in lead}


def _queries_registry() -> dict[str, Callable[[str], Any]]:
    return {
        # --- never in any driver window before round 4 ---
        "multimodal_decode": _q_multimodal_decode,
        "multimodal_audio_features": _q_multimodal_audio,
        "multimodal_video_frames": _q_multimodal_frames,
        "rule_drop_stats": _q_rule_drop_stats,
        # --- round-4 additions ---
        "model_quality_scores": _q_model_quality_scores,
        "ppl_buckets": _q_ppl_buckets,
        "decontaminate_docs": _q_decontaminate_docs,
        "token_budget_sample": _q_token_budget_sample,
        "sample_mixture_docs": _q_sample_mixture,
        "url_blocklist_filter": _q_url_blocklist_filter,
        "dsir_logweights": _q_dsir_logweights,
        "dsir_resample_docs": _q_dsir_resample,
        "tpch_q6_shape": _q_tpch_q6_shape,
        "tpch_q10_shape": _q_tpch_q10_shape,
        "tpch_q14_shape": _q_tpch_q14_shape,
        "fd_discovery_orders": _q_fd_discovery_orders,
        "cfd_mine_source_lang": _q_cfd_mine_source_lang,
        "semdedup_embeddings": _q_semdedup_embeddings,
        # --- round-5 addition: incremental semdedup ---
        "semdedup_incremental": _q_semdedup_incremental,
        "tpch_q7_shape": _q_tpch_q7_shape,
        "tpch_q13_shape": _q_tpch_q13_shape,
        "tpch_q15_shape": _q_tpch_q15_shape,
        "tpch_q16_shape": _q_tpch_q16_shape,
        "tpch_q19_shape": _q_tpch_q19_shape,
        "tpch_q22_shape": _q_tpch_q22_shape,
        "tpch_q2_shape": _q_tpch_q2_shape,
        "tpch_q8_shape": _q_tpch_q8_shape,
        "tpch_q9_shape": _q_tpch_q9_shape,
        "tpch_q11_shape": _q_tpch_q11_shape,
        "tpch_q20_shape": _q_tpch_q20_shape,
        "tpch_q21_shape": _q_tpch_q21_shape,
        # --- r03 driver-green regression tail ---
        "check_config_orders": _q_check_config_orders,
        "dedup_docs_keep_longest": _q_dedup_docs_keep_longest,
        "top_sources": _q_top_sources,
        "regex_extract_source": _q_regex_extract_source,
        "token_counts": _q_token_counts,
        "quality_scores": _q_quality_scores,
        "doc_fingerprints": _q_doc_fingerprints,
        "hash_sample": _q_hash_sample,
        "token_histogram": _q_token_histogram,
        "sessionize_events": _q_sessionize_events,
        "funnel_depths": _q_funnel_depths,
        "bpe_token_counts": _q_bpe_token_counts,
        "knn_embeddings": _q_knn_embeddings,
        "near_dup_embeddings": _q_near_dup_embeddings,
        "covar_qty_price_by_status": _q_covar_qty_price_by_status,
        "dense_rank_cust_balance": _q_dense_rank_cust_balance,
        "nations_with_cust_and_supp": _q_nations_with_cust_and_supp,
        "orders_per_month": _q_orders_per_month,
        "priorities_by_status": _q_priorities_by_status,
        "tpch_q12_shape": _q_tpch_q12_shape,
        "ntile_customer_balance": _q_ntile_customer_balance,
        "tpch_q5_shape": _q_tpch_q5_shape,
        "balance_histogram": _q_balance_histogram,
        "nations_cust_except_supp": _q_nations_cust_except_supp,
        "p75_cont_price_by_priority": _q_p75_cont_price_by_priority,
        "event_gap_lead": _q_event_gap_lead,
        "mode_priority_by_status": _q_mode_priority_by_status,
        "profile_events": _q_profile_events,
        "ind_fk_violations": _q_ind_fk_violations,
        "unique_violations_orders": _q_unique_violations_orders,
        "first_last_event_type": _q_first_last_event_type,
        "event_row_number": _q_event_row_number,
        "tpch_q4_shape": _q_tpch_q4_shape,
        "tpch_q17_shape": _q_tpch_q17_shape,
        "tpch_q18_shape": _q_tpch_q18_shape,
        # --- 16 rows-only queries unchecked by the r02 driver window ---
        "approx_distinct_docs_by_source": _q_approx_distinct_docs_by_source,
        "approx_quantiles_price": _q_approx_quantiles_price,
        "minhash_near_dups": _q_minhash_near_dups,
        # round-5 addition: thin-exchange LSH discovery (row-identical)
        "minhash_near_dups_digest": _q_minhash_near_dups_digest,
        "span_dedup_docs": _q_span_dedup_docs,
        "line_dedup_docs": _q_line_dedup_docs,
        "substring_dedup_docs": _q_substring_dedup_docs,
        "embedding_dedup": _q_embedding_dedup,
        "compression_ratio_docs": _q_compression_ratio_docs,
        "event_key_skew": _q_event_key_skew,
        "simhash_near_dups": _q_simhash_near_dups,
        # --- round-5 addition: simhash dedup end-to-end ---
        "simhash_dedup_docs": _q_simhash_dedup_docs,
        "lsh_ann_pairs": _q_lsh_ann_pairs,
        "ivf_knn_embeddings": _q_ivf_knn,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "lang_guess": _q_lang_guess,
        "scrub_documents": _q_scrub_documents,
        "flagship_pipeline": _q_flagship,
        "lang_retention": _q_lang_retention,
        # --- the 50 entries driver-verified green in CORRECTNESS_r02 ---
        "tpch_q1": _q_tpch_q1,
        "filter_project": _q_filter_project,
        "join_customer_orders": _q_join_customer_orders,
        "join_region_nation_customer": _q_join_region_nation_customer,
        "semi_join_customers_with_orders": _q_semi_join,
        "anti_join_customers_without_orders": _q_anti_join,
        "hash_join_supplier_nation": _q_hash_join_supplier_nation,
        "topk_orders": _q_topk_orders,
        "distinct_flag_status": _q_distinct,
        "union_all_names": _q_union_all_names,
        "nations_without_suppliers_negbal": _q_nations_without_negbal_suppliers,
        "latest_event_per_user": _q_latest_event_per_user,
        "asof_click_purchase": _q_asof_click_purchase,
        "asof_next_purchase": _q_asof_next_purchase,
        "json_props_stats": _q_json_props_stats,
        "window_tumbling_events": _q_window_tumbling,
        "window_hopping_events": _q_window_hopping,
        "window_distinct_users": _q_window_distinct_users,
        "running_total_per_user": _q_running_total,
        "range_join_click_purchase": _q_range_join_click_purchase,
        "interval_overlap_click_view": _q_interval_overlap_click_view,
        "event_gap_lag": _q_event_gap_lag,
        "moving_sum_events": _q_moving_sum_events,
        "range_sum_events": _q_range_sum_events,
        "rank_customer_balance": _q_rank_customer_balance,
        "pivot_orders_status": _q_pivot_orders_status,
        "full_outer_nation_balance": _q_full_outer_nation_balance,
        "var_price_by_status": _q_var_price_by_status,
        "top_tokens": _q_top_tokens,
        "tpch_q3": _q_tpch_q3,
        "median_price_by_priority": _q_median_price_by_priority,
        "mad_price_by_priority": _q_mad_price_by_priority,
        "p90_price_by_priority": _q_p90_price_by_priority,
        "distinct_customers_by_priority": _q_distinct_customers_by_priority,
        "stratified_sample_docs": _q_stratified_sample_docs,
        "top2_orders_per_priority": _q_top2_orders_per_priority,
        "rollup_counts": _q_rollup_counts,
        "cube_order_counts": _q_cube_order_counts,
        "orders_snapshot_diff": _q_orders_snapshot_diff,
        "salted_source_counts": _q_salted_source_counts,
        "rule_range_violations": _q_rule_range_violations,
        "rule_predicate_violations": _q_rule_predicate_violations,
        "cfd_violations": _q_cfd_violations,
        "cfd_mixed_tableau": _q_cfd_mixed_tableau,
        "rule_not_matches": _q_rule_not_matches,
        "rule_in_between": _q_rule_in_between,
        "dc_single_violations": _q_dc_single_violations,
        "dc_pair_violations": _q_dc_pair_violations,
        "dc_pair_ineq": _q_dc_pair_ineq,
        "dedup_docs_exact": _q_dedup_docs_exact,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tpch_q1": _SQL_TPCH_Q1,
        "filter_project": _SQL_FILTER_PROJECT,
        "join_customer_orders": _SQL_JOIN_CUST_ORDERS,
        "join_region_nation_customer": _SQL_JOIN_RNC,
        "semi_join_customers_with_orders": _SQL_SEMI,
        "anti_join_customers_without_orders": _SQL_ANTI,
        "hash_join_supplier_nation": _SQL_HASH_JOIN,
        "topk_orders": _SQL_TOPK,
        "distinct_flag_status": _SQL_DISTINCT,
        "union_all_names": _SQL_UNION,
        "nations_without_suppliers_negbal": _SQL_EXCEPT,
        "latest_event_per_user": _SQL_LATEST_EVENT,
        "asof_click_purchase": _SQL_ASOF,
        "asof_next_purchase": _SQL_ASOF_FWD,
        "json_props_stats": _SQL_JSON,
        "window_tumbling_events": _SQL_WINDOW,
        "window_hopping_events": _SQL_WINDOW_HOP,
        "window_distinct_users": _SQL_WINDOW_DISTINCT,
        "running_total_per_user": _SQL_RUNNING_TOTAL,
        "range_join_click_purchase": _SQL_RANGE_JOIN,
        "interval_overlap_click_view": _SQL_INTERVAL_OVERLAP,
        "event_gap_lag": _SQL_EVENT_GAP,
        "moving_sum_events": _SQL_MOVING_SUM,
        "range_sum_events": _SQL_RANGE_SUM,
        "rank_customer_balance": _SQL_RANK_GAPS,
        "pivot_orders_status": _SQL_PIVOT,
        "full_outer_nation_balance": _SQL_FULL_OUTER,
        "var_price_by_status": _SQL_VAR,
        "top_tokens": _SQL_TOP_TOKENS,
        "tpch_q3": _SQL_TPCH_Q3,
        "median_price_by_priority": _SQL_MEDIAN,
        "mad_price_by_priority": _SQL_MAD,
        "p90_price_by_priority": _SQL_P90,
        "distinct_customers_by_priority": _SQL_COUNT_DISTINCT,
        "stratified_sample_docs": _SQL_STRATIFIED,
        "top2_orders_per_priority": _SQL_TOP2_PER_GROUP,
        "rollup_counts": _SQL_ROLLUP,
        "cube_order_counts": _SQL_CUBE,
        "orders_snapshot_diff": _SQL_SNAPSHOT_DIFF,
        "salted_source_counts": _SQL_SALTED,
        "rule_range_violations": _SQL_RULE_RANGE,
        "check_config_orders": _SQL_CHECK_CONFIG,
        "rule_predicate_violations": _SQL_RULE_PRED,
        "cfd_violations": _SQL_CFD,
        "cfd_mixed_tableau": _SQL_CFD_MIXED,
        "rule_not_matches": _SQL_RULE_NOT_MATCHES,
        "rule_in_between": _SQL_RULE_IN_BETWEEN,
        "dc_single_violations": _SQL_DC_SINGLE,
        "dc_pair_violations": _SQL_DC_PAIR,
        "dc_pair_ineq": _SQL_DC_PAIR_INEQ,
        "dedup_docs_exact": _SQL_DEDUP_DOCS,
        "dedup_docs_keep_longest": _SQL_DEDUP_KEEP_LONGEST,
        "top_sources": _SQL_TOP_SOURCES,
        "regex_extract_source": _SQL_REGEX_EXTRACT,
        "token_counts": _SQL_TOKENS,
        "quality_scores": _SQL_QUALITY,
        "doc_fingerprints": _SQL_FINGERPRINT,
        "hash_sample": _SQL_HASH_SAMPLE,
        "token_budget_sample": _SQL_TOKEN_BUDGET_SAMPLE,
        "token_histogram": _SQL_TOKEN_HIST,
        "sessionize_events": _SQL_SESSIONIZE,
        "funnel_depths": _SQL_FUNNEL,
        "bpe_token_counts": _SQL_BPE_TOKENS,
        "knn_embeddings": _SQL_KNN,
        "near_dup_embeddings": _SQL_NEAR_DUP_EMB,
        "covar_qty_price_by_status": _SQL_COVAR,
        "dense_rank_cust_balance": _SQL_DENSE_RANK,
        "nations_with_cust_and_supp": _SQL_INTERSECT,
        "orders_per_month": _SQL_PER_MONTH,
        "priorities_by_status": _SQL_STRING_AGG,
        "tpch_q12_shape": _SQL_Q12,
        "sample_mixture_docs": _SQL_SAMPLE_MIXTURE,
        "url_blocklist_filter": _SQL_URL_BLOCKLIST,
        "tpch_q6_shape": _SQL_TPCH_Q6,
        "tpch_q10_shape": _SQL_TPCH_Q10,
        "tpch_q14_shape": _SQL_TPCH_Q14,
        "fd_discovery_orders": _fd_discovery_sql(),
        "cfd_mine_source_lang": _SQL_CFD_MINE,
        "tpch_q7_shape": _SQL_TPCH_Q7,
        "tpch_q13_shape": _SQL_TPCH_Q13,
        "tpch_q15_shape": _SQL_TPCH_Q15,
        "tpch_q16_shape": _SQL_TPCH_Q16,
        "tpch_q19_shape": _SQL_TPCH_Q19,
        "tpch_q22_shape": _SQL_TPCH_Q22,
        "tpch_q2_shape": _SQL_TPCH_Q2,
        "tpch_q8_shape": _SQL_TPCH_Q8,
        "tpch_q9_shape": _SQL_TPCH_Q9,
        "tpch_q11_shape": _SQL_TPCH_Q11,
        "tpch_q20_shape": _SQL_TPCH_Q20,
        "tpch_q21_shape": _SQL_TPCH_Q21,
        "ntile_customer_balance": _SQL_NTILE,
        "tpch_q5_shape": _SQL_TPCH_Q5,
        "balance_histogram": _SQL_BAL_HIST,
        "nations_cust_except_supp": _SQL_SETOP_EXCEPT,
        "p75_cont_price_by_priority": _SQL_P75_CONT,
        "event_gap_lead": _SQL_EVENT_GAP_LEAD,
        "mode_priority_by_status": _SQL_MODE,
        "profile_events": _SQL_PROFILE,
        "ind_fk_violations": _SQL_IND_FK,
        "unique_violations_orders": _SQL_UNIQUE_VIOL,
        "first_last_event_type": _SQL_FIRST_LAST,
        "event_row_number": _SQL_ROW_NUMBER,
        "tpch_q4_shape": _SQL_TPCH_Q4,
        "tpch_q17_shape": _SQL_TPCH_Q17,
        "tpch_q18_shape": _SQL_TPCH_Q18,
    }
