"""Relational operator surface over the driver star schema (SURVEY §2 /
§3.4): one registry entry per operator family, each with a DuckDB oracle.

Exact-match discipline (the driver hash-compares values): money/decimal
aggregates are summed as *integers* (price × 100 / 10000 rounded to
int64) on both sides, so distributed summation order can never produce a
last-ulp mismatch against DuckDB; ratios are then computed with the
identical IEEE expression. Quantiles/cosines are rounded to fixed
decimals on both sides (boundary risk ≪ 1e-9 per value).

Every query takes ``sf_dir`` and returns a Dataset / pyarrow Table /
pandas DataFrame. Ray is pre-initialised by the caller — nothing here
calls ray.init().
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from .sizing import join_parts


def _t(sf_dir: str, table: str, columns=None):
    from .sizing import read_blocks

    path = os.path.join(sf_dir, f"{table}.parquet")
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=read_blocks(path))


def _cents(arr, scale: int = 100) -> pa.Array:
    """Exact integer representation of a fixed-decimal double column."""
    return pc.round(pc.multiply(arr, pa.scalar(float(scale)))).cast(pa.int64())


# =====================================================================
# aggregations
# =====================================================================

def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 family: multi-aggregate groupby with derived measures."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        """Per-block PARTIAL aggregate (Arrow group_by over ≤ |flags|×
        |statuses| in-block groups): the exchange then carries blocks×6
        partial rows instead of sorting 600k rows by two string keys —
        the combiner discipline every few-group aggregate needs."""
        disc_price = pc.multiply(b["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty": b["l_quantity"].cast(pa.int64()) if pa.types.is_integer(b["l_quantity"].type)
                   else pc.round(b["l_quantity"]).cast(pa.int64()),
            "base_c": _cents(b["l_extendedprice"]),
            "disc_c4": _cents(disc_price, 10000),
            "disc_c": _cents(b["l_discount"]),
        })
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_c", "sum"), ("disc_c4", "sum"),
             ("disc_c", "sum"), ([], "count_all")])
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "qty": g["qty_sum"],
            "base_c": g["base_c_sum"],
            "disc_c4": g["disc_c4_sum"],
            "disc_c": g["disc_c_sum"],
            "n": g["count_all"],
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty_i"),
            Sum("base_c", alias_name="base_c"),
            Sum("disc_c4", alias_name="disc_c4"),
            Sum("disc_c", alias_name="disc_c"),
            Sum("n", alias_name="count_order"),
        )
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = b["count_order"].cast(pa.float64())
        sum_qty = b["sum_qty_i"].cast(pa.float64())
        sum_base = pc.divide(b["base_c"].cast(pa.float64()), pa.scalar(100.0))
        sum_disc_price = pc.divide(b["disc_c4"].cast(pa.float64()), pa.scalar(10000.0))
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty": sum_qty,
            "sum_base_price": sum_base,
            "sum_disc_price": sum_disc_price,
            "avg_qty": pc.divide(sum_qty, n),
            "avg_price": pc.divide(sum_base, n),
            "avg_disc": pc.divide(
                pc.divide(b["disc_c"].cast(pa.float64()), pa.scalar(100.0)), n),
            "count_order": b["count_order"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS sum_disc_price,
  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE)/COUNT(*) AS avg_qty,
  (CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0)/COUNT(*) AS avg_price,
  (CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE)/100.0)/COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_filter_project(sf_dir: str):
    """M13/M2 family: predicate pushdown-ish filter + computed column."""
    ds = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice",
             "l_discount"])

    def fn(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01"))),
            pc.less(b["l_shipdate"], pa.scalar(pd.Timestamp("1996-02-01"))),
        )
        b = b.filter(m)
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": b["l_linenumber"],
            "revenue": pc.divide(_cents(rev, 10000).cast(pa.float64()),
                                 pa.scalar(10000.0)),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SQL_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber,
  CAST(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT) AS DOUBLE)/10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
"""


def q_revenue_by_nation(sf_dir: str):
    """J5 join chain: lineitem ⨝ orders stays the ONE genuine big-big
    hash-join shuffle (both sides scale with the data) — but the
    lineitem side first PRE-AGGREGATES to one (orderkey, rev, n_items)
    row per order through an orderkey-hash partition fold (join-aware
    pre-aggregation: the join then moves one row per order, not one
    per lineitem). The customer→nation dimension hop is a broadcast
    lookup (sorted-key searchsorted per batch) behind the same
    ``_BROADCAST_KEY_LIMIT`` guard as semi/anti join. An oversized
    customer table falls back to the full join chain."""
    import ray

    from .sizing import fold_parts

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    n_fold_parts = fold_parts()

    def rev(b: pa.Table) -> pa.Table:
        r = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        okey = b["l_orderkey"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            kp = ((okey.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(n_fold_parts)).astype(np.int64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "rev_c4": _cents(r, 10000),
                         "kp": pa.array(kp)})

    def fold_order(g: pd.DataFrame) -> pd.DataFrame:
        okey = g["l_orderkey"].to_numpy()
        uk, inv = np.unique(okey, return_inverse=True)
        # float64 bincount of int 1e-4-dollar units is exact (≪ 2^53)
        return pd.DataFrame({
            "l_orderkey": uk,
            "rev_c4": np.bincount(inv, weights=g["rev_c4"].to_numpy())
                        .astype(np.int64),
            "n_items": np.bincount(inv).astype(np.int64),
        })

    li = (
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kp")
        .map_groups(fold_order, batch_format="pandas")
    )
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"])
    j = li.join(orders, join_type="inner", num_partitions=join_parts(),
                on=("l_orderkey",), right_on=("o_orderkey",))
    if cust.count() > _BROADCAST_KEY_LIMIT:
        j = j.join(cust, join_type="inner", num_partitions=join_parts(),
                   on=("o_custkey",), right_on=("c_custkey",))
        j = j.join(nation, join_type="inner", num_partitions=join_parts(),
                   on=("c_nationkey",), right_on=("n_nationkey",))
        agg = j.groupby("n_name").aggregate(Sum("rev_c4", alias_name="rev_c4"),
                                            Sum("n_items", alias_name="n_items"))
        return agg.map_batches(
            lambda b: pa.table({
                "n_name": b["n_name"],
                "revenue": pc.divide(b["rev_c4"].cast(pa.float64()),
                                     pa.scalar(10000.0)),
                "n_items": b["n_items"],
            }),
            batch_format="pyarrow",
        )
    nation_of = {r["n_nationkey"]: r["n_name"] for r in nation.take_all()}
    ct = cust.to_pandas()  # guarded small side — bounded materialization
    ck = ct["c_custkey"].to_numpy()
    order_ck = np.argsort(ck, kind="mergesort")
    ck_sorted = ck[order_ck]
    names_sorted = np.array(
        [nation_of[k] for k in ct["c_nationkey"].to_numpy()[order_ck]],
        dtype=object)
    lut_ref = ray.put((ck_sorted, names_sorted))

    def tag_nation(b: pa.Table) -> pa.Table:
        """Nation lookup + per-block PARTIAL aggregate — the final
        exchange carries blocks×25 rows, not one row per order."""
        import ray as _r

        keys, names = _r.get(lut_ref)
        idx = np.searchsorted(keys, b["o_custkey"].to_numpy(zero_copy_only=False))
        g = pa.table({
            "n_name": pa.array(names[idx], type=pa.string()),
            "rev_c4": b["rev_c4"],
            "n_items": b["n_items"],
        }).group_by("n_name").aggregate([("rev_c4", "sum"),
                                         ("n_items", "sum")])
        return pa.table({"n_name": g["n_name"], "rev_c4": g["rev_c4_sum"],
                         "n_items": g["n_items_sum"]})

    agg = (
        j.map_batches(tag_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev_c4", alias_name="rev_c4"),
                   Sum("n_items", alias_name="n_items"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "n_name": b["n_name"],
            "revenue": pc.divide(b["rev_c4"].cast(pa.float64()), pa.scalar(10000.0)),
            "n_items": b["n_items"],
        }),
        batch_format="pyarrow",
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue,
  COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_top_customers(sf_dir: str):
    """O2 sort + limit with deterministic tie-break."""
    return (
        _t(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
        .sort(["c_acctbal", "c_custkey"], descending=[True, False])
        .limit(10)
    )


SQL_TOP_CUSTOMERS = """
SELECT c_custkey, c_name, c_acctbal FROM customer
ORDER BY c_acctbal DESC, c_custkey LIMIT 10
"""


def q_distinct_segments(sf_dir: str):
    """G3 distinct."""
    vals = _t(sf_dir, "customer", ["c_mktsegment"]).unique("c_mktsegment")
    return pa.table({"c_mktsegment": pa.array(sorted(vals), type=pa.string())})


SQL_DISTINCT_SEGMENTS = "SELECT DISTINCT c_mktsegment FROM customer"


def q_count_distinct_parts(sf_dir: str):
    """COUNT(DISTINCT) = per-block Arrow distinct (combiner — shrinks the
    all-to-all to each block's unique pairs before it ships) → ONE
    exchange grouped on a small-int hash of the key (same key → same
    partition, so per-partition nunique-per-flag sums are exact) → tiny
    per-flag fold. Grouping on the hash instead of aggregating ~60k
    (flag, key) string+int groups is ~4× cheaper for identical output."""
    from .sizing import fold_parts

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])
    n_parts = fold_parts()

    def block_distinct(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_returnflag", "l_partkey"]).aggregate([])
        key = g["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            hp = ((key.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"l_returnflag": g["l_returnflag"],
                         "l_partkey": g["l_partkey"], "hp": pa.array(hp)})

    def part_nunique(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_returnflag")["l_partkey"].nunique()
        return pd.DataFrame({"l_returnflag": out.index.to_numpy(),
                             "nd": out.to_numpy().astype(np.int64)})

    return (
        ds.map_batches(block_distinct, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("hp")
        .map_groups(part_nunique, batch_format="pandas")
        .groupby("l_returnflag")
        .aggregate(Sum("nd", alias_name="n_parts"))
    )


SQL_COUNT_DISTINCT_PARTS = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_returnflag
"""


def q_union_orders(sf_dir: str):
    """D1 union (all) of two filtered branches with provenance column."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])

    def pick(tag: str, lo: float, hi: float, status: str | None):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(b["o_totalprice"], pa.scalar(lo)),
                        pc.less(b["o_totalprice"], pa.scalar(hi)))
            if status is not None:
                m = pc.and_(m, pc.equal(b["o_orderstatus"], pa.scalar(status)))
            b = b.filter(m)
            return pa.table({
                "o_orderkey": b["o_orderkey"],
                "o_totalprice": b["o_totalprice"],
                "bucket": pa.array([tag] * b.num_rows, type=pa.string()),
            })
        return fn

    hi = ds.map_batches(pick("high", 400000.0, 1e18, None), batch_format="pyarrow")
    lo = ds.map_batches(pick("lowF", -1e18, 50000.0, "F"), batch_format="pyarrow")
    return hi.union(lo)


SQL_UNION_ORDERS = """
SELECT o_orderkey, o_totalprice, 'high' AS bucket FROM orders WHERE o_totalprice >= 400000
UNION ALL
SELECT o_orderkey, o_totalprice, 'lowF' AS bucket FROM orders
WHERE o_totalprice < 50000 AND o_orderstatus = 'F'
"""


def q_string_funcs(sf_dir: str):
    """M9/§2.8 string kernels: upper + substring match + agg."""
    ds = _t(sf_dir, "part", ["p_name", "p_brand", "p_retailprice"])

    def fn(b: pa.Table) -> pa.Table:
        b = b.filter(pc.match_substring(b["p_name"], "widget"))
        return pa.table({
            "brand": pc.utf8_upper(b["p_brand"]),
            "price_c": _cents(b["p_retailprice"]),
        })

    agg = (
        ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("brand")
        .aggregate(Count(alias_name="n"), Sum("price_c", alias_name="price_c"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "brand": b["brand"], "n": b["n"],
            "sum_price": pc.divide(b["price_c"].cast(pa.float64()), pa.scalar(100.0)),
        }),
        batch_format="pyarrow",
    )


SQL_STRING_FUNCS = """
SELECT UPPER(p_brand) AS brand, COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(p_retailprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_price
FROM part WHERE p_name LIKE '%widget%' GROUP BY UPPER(p_brand)
"""


def q_orders_by_month(sf_dir: str):
    """§2.8 date kernels: month truncation + agg."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def fn(b: pa.Table) -> pa.Table:
        return pa.table({
            "month": pc.floor_temporal(b["o_orderdate"], unit="month"),
            "price_c": _cents(b["o_totalprice"]),
        })

    agg = (
        ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("month")
        .aggregate(Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "month": b["month"], "n_orders": b["n_orders"],
            "total": pc.divide(b["price_c"].cast(pa.float64()), pa.scalar(100.0)),
        }),
        batch_format="pyarrow",
    )


SQL_ORDERS_BY_MONTH = """
SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n_orders,
  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total
FROM orders GROUP BY date_trunc('month', o_orderdate)
"""


def q_json_extract(sf_dir: str):
    """M14 JSON scalar fn + agg (int-exact)."""
    ds = _t(sf_dir, "events", ["event_type", "props"])

    def fn(b: pa.Table) -> pa.Table:
        ks = [int(json.loads(p)["k"]) for p in b["props"].to_pylist()]
        return pa.table({
            "event_type": b["event_type"],
            "k": pa.array(ks, type=pa.int64()),
        })

    agg = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"], "n": b["n"],
            "avg_k": pc.divide(b["sum_k"].cast(pa.float64()),
                               b["n"].cast(pa.float64())),
        }),
        batch_format="pyarrow",
    )


SQL_JSON_EXTRACT = """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)/COUNT(*) AS avg_k
FROM events GROUP BY event_type
"""


def q_case_when(sf_dir: str):
    """Conditional aggregation (pc.if_else)."""
    ds = _t(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def fn(b: pa.Table) -> pa.Table:
        urgent = pc.starts_with(b["o_orderpriority"], "1")
        cents = _cents(b["o_totalprice"])
        return pa.table({
            "o_orderstatus": b["o_orderstatus"],
            "urgent_c": pc.if_else(urgent, cents, pa.scalar(0, type=pa.int64())),
            "is_urgent": urgent.cast(pa.int64()),
        })

    agg = (
        ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderstatus")
        .aggregate(Sum("urgent_c", alias_name="urgent_c"),
                   Sum("is_urgent", alias_name="n_urgent"),
                   Count(alias_name="n"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "o_orderstatus": b["o_orderstatus"], "n": b["n"],
            "n_urgent": b["n_urgent"],
            "urgent_total": pc.divide(b["urgent_c"].cast(pa.float64()),
                                      pa.scalar(100.0)),
        }),
        batch_format="pyarrow",
    )


SQL_CASE_WHEN = """
SELECT o_orderstatus, COUNT(*) AS n,
  CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
  CAST(SUM(CASE WHEN o_orderpriority LIKE '1%'
       THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END) AS DOUBLE)/100.0
       AS urgent_total
FROM orders GROUP BY o_orderstatus
"""


def quantile_disc_from_hist(values: np.ndarray, counts: np.ndarray,
                            q: float) -> float:
    """Exact discrete quantile from a (sorted values, counts) histogram —
    the same element numpy's ``inverted_cdf`` (== DuckDB quantile_disc)
    picks from the expanded array, chosen by rank instead of
    materializing the rows. The virtual index uses the identical float
    arithmetic as numpy so results are bit-equal (formula verified
    against np.quantile in tests)."""
    cum = counts.cumsum()
    n = int(cum[-1])
    vi = q * n - 1.0
    prev = np.floor(vi)
    idx = max(0, int(prev) + (1 if vi > prev else 0))
    return float(values[np.searchsorted(cum, idx + 1)])


def q_quantiles(sf_dir: str):
    """G2/§2.5 exact per-group quantiles, distributed (VERDICT r1 item
    #6): per-block (group, value)→count histogram combiner (Arrow
    group_by per batch), ONE groupby(flag) shuffle of the partials, then
    a numpy merge + rank lookup per group. vs round 1 this sorts packed
    (value, count) numerics instead of raw pandas rows, and the shuffle
    carries partial histograms, which compress whenever values repeat
    (quantized/categorical data). Worst case (near-unique values, as in
    TPC-H prices) per-group memory is O(rows in group) as two numeric
    arrays — the documented cardinality assumption; beyond that the
    exact path is multi-pass selection, approximate is t-digest.
    Semantics are exact quantile_disc (an actual element, bit-equal to
    DuckDB / numpy inverted_cdf — duplicates need no pre-merge: the
    cumulative-count rank lookup is insensitive to repeated values)."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def block_hist(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_returnflag", "l_extendedprice"]).aggregate(
            [("l_extendedprice", "count")]
        )
        return g.rename_columns(["l_returnflag", "l_extendedprice", "n"])

    hist = ds.map_batches(block_hist, batch_format="pyarrow",
                          zero_copy_batch=True)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        v = g["l_extendedprice"].to_numpy()
        c = g["n"].to_numpy().astype(np.int64)
        order = np.argsort(v, kind="mergesort")
        v, c = v[order], c[order]
        return pd.DataFrame({
            "l_returnflag": [g["l_returnflag"].iloc[0]],
            "p50": [quantile_disc_from_hist(v, c, 0.5)],
            "p95": [quantile_disc_from_hist(v, c, 0.95)],
        })

    return hist.groupby("l_returnflag").map_groups(per_group, batch_format="pandas")


SQL_QUANTILES = """
SELECT l_returnflag,
  quantile_disc(l_extendedprice, 0.5) AS p50,
  quantile_disc(l_extendedprice, 0.95) AS p95
FROM lineitem GROUP BY l_returnflag
"""


_BROADCAST_KEY_LIMIT = 5_000_000  # ~40 MB of int64 keys; beyond this the
# "small side" isn't small — broadcast would ship the set to every task
# and sorted() would burn the driver, so fall back to a real hash join.


def _distinct_keys(ds, col: str):
    """One row per distinct key, as a Dataset (for the join fallback)."""
    return ds.groupby(col).aggregate(Count(alias_name="_n")).select_columns([col])


def q_semi_join(sf_dir: str):
    """J5 semi join. Fast path: broadcast key set consulted per batch (no
    shuffle at all — right when the build side is small, as here). Guarded
    by ``_BROADCAST_KEY_LIMIT``: a big build side falls back to
    distinct-keys + ``Dataset.join`` so the pattern survives at scale
    (VERDICT r1 item #7)."""
    import ray

    orders = _t(sf_dir, "orders", ["o_custkey"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    if orders.count() > _BROADCAST_KEY_LIMIT:
        hit = cust.join(_distinct_keys(orders, "o_custkey"), join_type="inner",
                        num_partitions=join_parts(), on=("c_custkey",),
                        right_on=("o_custkey",))
        return (hit.groupby("c_mktsegment")
                .aggregate(Count(alias_name="n_customers")))
    keys = orders.unique("o_custkey")
    key_ref = ray.put(np.array(sorted(keys), dtype=np.int64))

    def fn(b: pa.Table) -> pa.Table:
        import ray as _r

        ks = _r.get(key_ref)
        have = np.isin(b["c_custkey"].to_numpy(zero_copy_only=False), ks)
        return b.filter(pa.array(have))

    return (
        cust.map_batches(fn, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_customers"))
    )


SQL_SEMI_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def q_anti_join(sf_dir: str):
    """J5 anti join via broadcast key set + broadcast dimension lookup
    (nation is tiny — a dict beats a shuffle join). Restricted to
    high-value orders so the anti set is non-empty at every sf (and
    because Ray's hash join chokes on an empty left side). Same
    ``_BROADCAST_KEY_LIMIT`` guard as the semi join: a big build side
    falls back to a left-outer ``Dataset.join`` + null filter."""
    import ray

    big = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: b.filter(pc.greater(b["o_totalprice"], pa.scalar(300000.0)))
        .select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    names = {
        r["n_nationkey"]: r["n_name"]
        for r in _t(sf_dir, "nation").take_all()
    }
    names_ref = ray.put(names)
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def name_of(b: pa.Table) -> pa.Table:
        import ray as _r

        nm = _r.get(names_ref)
        n_name = pa.array([nm[k] for k in b["c_nationkey"].to_pylist()],
                          type=pa.string())
        return pa.table({"n_name": n_name})

    if big.count() > _BROADCAST_KEY_LIMIT:
        probe = cust.join(
            _distinct_keys(big, "o_custkey").map_batches(
                lambda b: b.append_column("_hit", pa.array([1] * b.num_rows,
                                                           type=pa.int64())),
                batch_format="pyarrow",
            ),
            join_type="left_outer", num_partitions=join_parts(),
            on=("c_custkey",), right_on=("o_custkey",),
        )
        anti = probe.map_batches(
            lambda b: b.filter(pc.is_null(b["_hit"])), batch_format="pyarrow"
        )
        return (anti.map_batches(name_of, batch_format="pyarrow")
                .groupby("n_name").aggregate(Count(alias_name="n_customers")))
    keys = big.unique("o_custkey")
    key_ref = ray.put(np.array(sorted(keys), dtype=np.int64))

    def fn(b: pa.Table) -> pa.Table:
        import ray as _r

        ks = _r.get(key_ref)
        have = np.isin(b["c_custkey"].to_numpy(zero_copy_only=False), ks)
        return name_of(b.filter(pa.array(~have)))

    return (
        cust.map_batches(fn, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_customers"))
    )


SQL_ANTI_JOIN = """
SELECT n_name, COUNT(*) AS n_customers FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
GROUP BY n_name
"""


def q_topk_per_group(sf_dir: str):
    """O2 windowed top-k per group. Scale path: per-block partial top-k
    (vectorized pandas) prunes the shuffle, then an exact per-group head.
    Bounded to custkey < 400 so the oracle comparison stays cheap; the
    bound is pushed into the parquet scan (row-group pruning)."""
    import pyarrow.dataset as pads

    from .sizing import read_blocks

    opath = os.path.join(sf_dir, "orders.parquet")
    ds = rd.read_parquet(
        opath,
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
        filter=pads.field("o_custkey") < 400,
        override_num_blocks=read_blocks(opath),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("o_custkey", sort=False).head(2)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True], kind="mergesort")
        return g.head(2)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("o_custkey")
        .map_groups(final, batch_format="pandas")
    )


SQL_TOPK_PER_GROUP = """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders WHERE o_custkey < 400
) WHERE rn <= 2
"""


def q_having(sf_dir: str):
    """G-agg + HAVING filter on the aggregate."""
    agg = (
        _t(sf_dir, "part", ["p_brand"])
        .groupby("p_brand")
        .aggregate(Count(alias_name="n_parts"))
    )
    return agg.map_batches(
        lambda b: b.filter(pc.greater(b["n_parts"], pa.scalar(5))),
        batch_format="pyarrow",
    )


SQL_HAVING = """
SELECT p_brand, COUNT(*) AS n_parts FROM part
GROUP BY p_brand HAVING COUNT(*) > 5
"""


# =====================================================================
# stream-shaped (events)
# =====================================================================

def q_sessionize(sf_dir: str):
    """§2.9 session windows: per-user 30-minute-gap sessionization via
    groupby(user).map_groups over ts-sorted groups."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values().to_numpy()
        if len(ts) == 0:
            return pd.DataFrame({"user_id": [], "n_sessions": [], "n_events": []})
        # exact microsecond gaps (timestamps are timestamp[us]); DuckDB's
        # date_diff('second') counts boundary crossings, which diverges on
        # sub-second components — both sides use microseconds instead
        gaps = np.diff(ts).astype("timedelta64[us]").astype(np.int64)
        n_sessions = 1 + int((gaps > 1800 * 1_000_000).sum())
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_sessions": [n_sessions],
            "n_events": [len(ts)],
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


SQL_SESSIONIZE = """
SELECT user_id,
  CAST(1 + SUM(CASE WHEN gap_us > 1800 * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
  COUNT(*) AS n_events
FROM (
  SELECT user_id,
    COALESCE(date_diff('microsecond',
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts),
             0) AS gap_us
  FROM events
) GROUP BY user_id
"""


def q_tumbling_window(sf_dir: str):
    """§2.9 tumbling (hour) windows per event type."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def fn(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "hour": pc.floor_temporal(b["ts"], unit="hour"),
            "value_c": _cents(b["value"], 10000),
        })

    agg = (
        ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="value_c"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"], "hour": b["hour"], "n": b["n"],
            "sum_value": pc.divide(b["value_c"].cast(pa.float64()),
                                   pa.scalar(10000.0)),
        }),
        batch_format="pyarrow",
    )


SQL_TUMBLING_WINDOW = """
SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(value*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def q_asof_join(sf_dir: str):
    """J6 as-of join: each purchase matched to the user's most recent
    strictly-prior view. Ray: per-user sorted merge in map_groups (the
    documented partitioning assumption: user_id co-located). Ties on
    (user, ts) among views are collapsed to MAX(value) first on BOTH
    sides so the match is well-defined."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        views = (
            g[g["event_type"] == "view"]
            .groupby("ts", sort=True)["value"].max().reset_index()
        )
        buys = g[g["event_type"] == "purchase"].sort_values("ts", kind="mergesort")
        if len(buys) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "user_id": pd.Series([], dtype="int64"),
                 "prior_view_value": pd.Series([], dtype="float64")})
        vts = views["ts"].to_numpy()
        vval = views["value"].to_numpy()
        idx = np.searchsorted(vts, buys["ts"].to_numpy(), side="left") - 1
        prior = np.where(idx >= 0, vval[np.clip(idx, 0, None)], np.nan)
        return pd.DataFrame({
            "event_id": buys["event_id"].to_numpy(),
            "user_id": buys["user_id"].to_numpy(),
            "prior_view_value": prior,
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


SQL_ASOF_JOIN = """
WITH v AS (
  SELECT user_id, ts, MAX(value) AS value FROM events
  WHERE event_type = 'view' GROUP BY user_id, ts
), p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, v.value AS prior_view_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts > v.ts
"""


def q_csv_roundtrip(sf_dir: str):
    """S9 relational sink surface: project+filter lineitem →
    ``Dataset.write_csv`` (partitioned files under /tmp) → ``read_csv``
    re-ingest → aggregate. Quantities are cast to int64 before the write
    so the text round-trip is exact. The aggregate is materialized before
    the scratch dir is removed."""
    import shutil

    out = f"/tmp/crawlray_csv_{os.getpid()}"
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["l_quantity"], pa.scalar(10.0)))
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "qty": b["l_quantity"].cast(pa.int64()),
        })

    ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True
                   ).write_csv(out)
    back = rd.read_csv(out)
    result = (
        back.groupby("l_returnflag")
        .aggregate(Sum("qty", alias_name="sum_qty"), Count(alias_name="n_rows"))
        .materialize()
    )
    shutil.rmtree(out, ignore_errors=True)
    return result


SQL_CSV_ROUNDTRIP = """
SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem WHERE l_quantity <= 10 GROUP BY l_returnflag
"""


def q_sql_roundtrip(sf_dir: str):
    """S9 relational SQL sink (the reference stored article rows in a
    SQL DB via an ORM): region → ``Dataset.write_sql`` into a sqlite
    database (stdlib DBAPI; single-writer, so concurrency=1 — the
    pattern targets one DB endpoint regardless of cluster size) →
    ``ray.data.read_sql`` re-ingest → projection. Exact string/int
    round-trip; DuckDB oracle on the source table."""
    import sqlite3

    db = f"/tmp/crawlray_sql_{os.getpid()}.db"
    if os.path.exists(db):
        os.remove(db)
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE region_rt (r_regionkey INTEGER, r_name TEXT)")
    con.commit()
    con.close()

    def factory():
        return sqlite3.connect(db)

    src = _t(sf_dir, "region", ["r_regionkey", "r_name"])
    src.write_sql("INSERT INTO region_rt VALUES(?, ?)", factory,
                  concurrency=1)
    back = rd.read_sql("SELECT r_regionkey, r_name FROM region_rt", factory)
    result = back.map_batches(
        lambda b: pa.table({
            "r_regionkey": b["r_regionkey"].cast(pa.int64()),
            "name_upper": pc.utf8_upper(b["r_name"]),
        }),
        batch_format="pyarrow",
    ).materialize()
    os.remove(db)
    return result


SQL_SQL_ROUNDTRIP = """
SELECT r_regionkey, UPPER(r_name) AS name_upper FROM region
"""


# =====================================================================
# registry
# =====================================================================

RELATIONAL_QUERIES = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "filter_project": (q_filter_project, SQL_FILTER_PROJECT),
    "revenue_by_nation": (q_revenue_by_nation, SQL_REVENUE_BY_NATION),
    "top_customers": (q_top_customers, SQL_TOP_CUSTOMERS),
    "distinct_segments": (q_distinct_segments, SQL_DISTINCT_SEGMENTS),
    "count_distinct_parts": (q_count_distinct_parts, SQL_COUNT_DISTINCT_PARTS),
    "union_orders": (q_union_orders, SQL_UNION_ORDERS),
    "string_funcs": (q_string_funcs, SQL_STRING_FUNCS),
    "orders_by_month": (q_orders_by_month, SQL_ORDERS_BY_MONTH),
    "json_extract": (q_json_extract, SQL_JSON_EXTRACT),
    "case_when": (q_case_when, SQL_CASE_WHEN),
    "quantiles": (q_quantiles, SQL_QUANTILES),
    "semi_join": (q_semi_join, SQL_SEMI_JOIN),
    "anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "having": (q_having, SQL_HAVING),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "tumbling_window": (q_tumbling_window, SQL_TUMBLING_WINDOW),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "csv_roundtrip": (q_csv_roundtrip, SQL_CSV_ROUNDTRIP),
    "sql_roundtrip": (q_sql_roundtrip, SQL_SQL_ROUNDTRIP),
}
