"""TPC-H-shape widening (round 4): the remaining classic decision-support
join/aggregate shapes the relational surface did not yet cover, each
adapted to the driver's trimmed schema (no partsupp / commitdate /
shipmode / comment columns) and each with an exact DuckDB oracle.

Shapes and their distributed plans:
- Q5  local_supplier_volume — 6-way join collapsed to ONE fact scan with
  guarded broadcast key→value lookups for every dimension hop.
- Q7  nation_trade_volume — bidirectional nation-pair revenue by year.
- Q8  market_share — ratio-of-conditional-sums per year.
- Q10 returned_item_losses — fact partial-agg → custkey fold → global
  top-20 via per-partition partial top-k.
- Q13 customer_order_histogram — histogram-of-group-sizes without ever
  materializing the customer⟕orders join.
- Q14 promo_revenue — conditional-ratio single-row aggregate.
- Q15 top_revenue_supplier — max-equality (argmax with ties) join.
- Q16 supplier_part_counts — distinct-triple exchange + bounded-group
  count distinct with an anti-set exclusion.
- Q17 small_qty_revenue — per-key scalar threshold (0.2×avg) applied by
  exact integer cross-multiplication, no floats in the cut.
- Q19 disjunctive_revenue — OR-of-conjunctions predicate pushed into one
  vectorized block mask.
- Q11-adapted important_parts — global-share HAVING via an exact
  integer threshold derived from two bounded aggregates.
- Q4-adapted late_shipment_priority — EXISTS with correlated date
  arithmetic, deduped through one orderkey exchange.
- bfs_hops — iterative min-hop BFS over the part↔supplier co-occurrence
  graph, oracled by a recursive CTE (WITH RECURSIVE ... UNION).

Exact-match discipline (same as relational.py/analytics.py): money sums
ride as int64 1e-4-dollar units (`rev_c4`) or cents, counts as int64;
float finals are computed with the IDENTICAL IEEE expression on both
sides and rounded to 6 dp. Broadcast lookups sit behind
``_BROADCAST_KEY_LIMIT`` with a Dataset.join fallback (forced-branch
equality is pinned in tests/test_tpch_shapes.py).

Ray is pre-initialised by the caller — nothing here calls ray.init().
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .sizing import fold_parts, join_parts


def _t(sf_dir: str, table: str, columns=None, filter=None):
    from .sizing import read_blocks

    path = os.path.join(sf_dir, f"{table}.parquet")
    return rd.read_parquet(path, columns=columns, filter=filter,
                           override_num_blocks=read_blocks(path))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.view(np.uint64) if x.dtype == np.int64 else x.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z.view(np.int64)


def _rev_c4(b: pa.Table) -> np.ndarray:
    """Per-row revenue in exact 1e-4-dollar units (int64): prices carry
    2 decimals and discounts 2 decimals, so price·(1−disc)·10⁴ is an
    integer in exact arithmetic — the float product lands within half a
    unit of it and rounds exactly (same argument as revenue_by_nation,
    validated at sf0.1)."""
    r = pc.multiply(b["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), b["l_discount"]))
    return pc.round(pc.multiply(r, pa.scalar(10000.0))) \
        .cast(pa.int64()).to_numpy(zero_copy_only=False)


def _bcast_sorted(tbl: pa.Table, key: str, *vals):
    """ray.put a (sorted keys, value arrays...) tuple for searchsorted
    probes inside map_batches — the dimension ships to the object store
    ONCE, not per block."""
    k = tbl[key].to_numpy(zero_copy_only=False)
    srt = np.argsort(k, kind="mergesort")
    out = [k[srt]]
    for v in vals:
        col = tbl[v].to_numpy(zero_copy_only=False)
        out.append(col[srt])
    return ray.put(tuple(out))


def _probe(ks: np.ndarray, keys: np.ndarray):
    """searchsorted membership probe: (clamped index, hit mask)."""
    if len(ks) == 0:
        return np.zeros(len(keys), np.int64), np.zeros(len(keys), bool)
    idx = np.searchsorted(ks, keys)
    idx[idx >= len(ks)] = 0
    return idx, ks[idx] == keys


def _pull(ds, empty_schema: dict) -> pa.Table:
    """Bounded materialization of a small/guarded Dataset as one Table."""
    batches = list(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
    if not batches:
        return pa.table({k: pa.array([], type=t)
                         for k, t in empty_schema.items()})
    return pa.concat_tables(batches).combine_chunks()


def _ts(s: str):
    return _dt.datetime.fromisoformat(s)


def _broadcast_limit() -> int:
    from .relational import _BROADCAST_KEY_LIMIT
    return _BROADCAST_KEY_LIMIT


# =====================================================================
# Q5: local supplier volume — revenue where customer and supplier share
# a nation, for one region and one order-date year
# =====================================================================

def q_local_supplier_volume(sf_dir: str, region: str = "ASIA",
                            lo: str = "1997-01-01", hi: str = "1998-01-01"):
    """TPC-H Q5 family. Scale plan: every dimension hop is a guarded
    broadcast lookup probed INSIDE one lineitem scan — nation/region
    fold to a nationkey→(name, in-region) dict, supplier to a sorted
    suppkey→nationkey array, and the date-windowed orders⨝customer
    pre-join to a sorted orderkey→cust-nationkey array (bounded by the
    window; count-guarded). The fact table never shuffles: per-block
    partials bincount revenue into ≤|nation| cells and the driver folds
    blocks×25 skinny rows. Oversized sides fall back to the full
    Dataset.join chain (forced-branch equality pinned)."""
    nation = _pull(_t(sf_dir, "nation"), {})
    region_t = _pull(_t(sf_dir, "region"), {})
    rk = {r: k for k, r in zip(region_t["r_regionkey"].to_pylist(),
                               region_t["r_name"].to_pylist())}[region]
    nat_name = {}
    nat_in_region = set()
    for nk, nn, nr in zip(nation["n_nationkey"].to_pylist(),
                          nation["n_name"].to_pylist(),
                          nation["n_regionkey"].to_pylist()):
        nat_name[nk] = nn
        if nr == rk:
            nat_in_region.add(nk)

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"],
                filter=_date_window("o_orderdate", lo, hi))
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    limit = _broadcast_limit()
    if (orders.count() > limit or cust.count() > limit
            or supp.count() > limit):
        return _q5_join_fallback(sf_dir, nat_name, nat_in_region, lo, hi)

    st = _pull(supp, {"s_suppkey": pa.int64(), "s_nationkey": pa.int64()})
    supp_ref = _bcast_sorted(st, "s_suppkey", "s_nationkey")
    ct = _pull(cust, {"c_custkey": pa.int64(), "c_nationkey": pa.int64()})
    ck = ct["c_custkey"].to_numpy(zero_copy_only=False)
    cn = ct["c_nationkey"].to_numpy(zero_copy_only=False)
    csrt = np.argsort(ck, kind="mergesort")
    ck, cn = ck[csrt], cn[csrt]
    ot = _pull(orders, {"o_orderkey": pa.int64(), "o_custkey": pa.int64()})
    ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
    oc = ot["o_custkey"].to_numpy(zero_copy_only=False)
    osrt = np.argsort(ok, kind="mergesort")
    ok = ok[osrt]
    # fuse the customer hop at build time: orderkey → cust nationkey
    cidx, chit = _probe(ck, oc[osrt])
    onat = np.where(chit, cn[cidx], np.int64(-1))
    ord_ref = ray.put((ok, onat))
    n_nat = max(nat_name) + 1

    def partial(b: pa.Table) -> pa.Table:
        sks, snat = ray.get(supp_ref)
        oks, onats = ray.get(ord_ref)
        lo_k = b["l_orderkey"].to_numpy(zero_copy_only=False)
        oi, ohit = _probe(oks, lo_k)
        si, shit = _probe(sks, b["l_suppkey"].to_numpy(zero_copy_only=False))
        s_nat = np.where(shit, snat[si], np.int64(-2))
        c_nat = np.where(ohit, onats[oi], np.int64(-1))
        keep = (s_nat == c_nat) & np.isin(
            s_nat, np.fromiter(nat_in_region, np.int64,
                               len(nat_in_region)))
        if not keep.any():
            return pa.table({"nk": pa.array([], pa.int64()),
                             "rev_c4": pa.array([], pa.int64())})
        rev = _rev_c4(b)[keep]
        nk = s_nat[keep]
        # float64 bincount of int 1e-4-dollar units is exact (≪ 2^53)
        sums = np.bincount(nk, weights=rev, minlength=n_nat)
        nz = np.nonzero(sums)[0]
        return pa.table({"nk": pa.array(nz.astype(np.int64)),
                         "rev_c4": pa.array(sums[nz].astype(np.int64))})

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    parts = _pull(li.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True),
                  {"nk": pa.int64(), "rev_c4": pa.int64()})
    nk = parts["nk"].to_numpy(zero_copy_only=False)
    rv = parts["rev_c4"].to_numpy(zero_copy_only=False)
    sums = np.bincount(nk, weights=rv, minlength=n_nat) if len(nk) \
        else np.zeros(n_nat)
    nz = np.nonzero(sums)[0]
    return pa.table({
        "n_name": pa.array([nat_name[int(k)] for k in nz], pa.string()),
        "rev_c4": pa.array(sums[nz].astype(np.int64)),
    })


def _date_window(col: str, lo: str, hi: str):
    import pyarrow.dataset as pads

    return (pads.field(col) >= _ts(lo)) & (pads.field(col) < _ts(hi))


def _q5_join_fallback(sf_dir, nat_name, nat_in_region, lo, hi):
    """Full Dataset.join chain for an oversized dimension side."""
    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "rev_c4": pa.array(_rev_c4(b))})

    li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"],
                filter=_date_window("o_orderdate", lo, hi))
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j = li.join(orders, join_type="inner", num_partitions=join_parts(),
                on=("l_orderkey",), right_on=("o_orderkey",))
    j = j.join(cust, join_type="inner", num_partitions=join_parts(),
               on=("o_custkey",), right_on=("c_custkey",))
    j = j.join(supp, join_type="inner", num_partitions=join_parts(),
               on=("l_suppkey",), right_on=("s_suppkey",))

    in_region = np.fromiter(nat_in_region, np.int64, len(nat_in_region))

    def local_only(b: pa.Table) -> pa.Table:
        cn = b["c_nationkey"].to_numpy(zero_copy_only=False)
        sn = b["s_nationkey"].to_numpy(zero_copy_only=False)
        keep = (cn == sn) & np.isin(sn, in_region)
        b = b.filter(pa.array(keep))
        return pa.table({
            "n_name": pa.array(
                [nat_name[int(k)] for k in
                 b["s_nationkey"].to_numpy(zero_copy_only=False)],
                pa.string()),
            "rev_c4": b["rev_c4"],
        })

    agg = (j.map_batches(local_only, batch_format="pyarrow")
           .groupby("n_name").aggregate(Sum("rev_c4", alias_name="rev_c4")))
    return agg


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*10000)
                 AS BIGINT)) AS BIGINT) AS rev_c4
FROM customer c, orders o, lineitem l, supplier s, nation n, region r
WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
  AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# =====================================================================
# Q7: nation trade volume — bidirectional pair revenue by ship year
# =====================================================================

def q_nation_trade_volume(sf_dir: str, nation_a: str = "NATION_1",
                          nation_b: str = "NATION_2",
                          lo: str = "1996-01-01", hi: str = "1998-01-01"):
    """TPC-H Q7 family: revenue shipped between two specific nations
    (both directions), grouped by (supp_nation, cust_nation, year of
    l_shipdate). Same one-scan plan as Q5 — supplier and the date-free
    orders⨝customer hop broadcast (guarded), ship-date window pushed to
    the read, ≤4 output groups folded from per-block partials."""
    nation = _pull(_t(sf_dir, "nation", ["n_nationkey", "n_name"]), {})
    name_of = dict(zip(nation["n_nationkey"].to_pylist(),
                       nation["n_name"].to_pylist()))
    key_of = {v: k for k, v in name_of.items()}
    ka, kb = key_of[nation_a], key_of[nation_b]

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    limit = _broadcast_limit()
    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount"],
            filter=_date_window("l_shipdate", lo, hi))
    if (orders.count() > limit or cust.count() > limit
            or supp.count() > limit):
        return _q7_join_fallback(li, orders, cust, supp, name_of, ka, kb)

    st = _pull(supp, {"s_suppkey": pa.int64(), "s_nationkey": pa.int64()})
    supp_ref = _bcast_sorted(st, "s_suppkey", "s_nationkey")
    ct = _pull(cust, {"c_custkey": pa.int64(), "c_nationkey": pa.int64()})
    ck = ct["c_custkey"].to_numpy(zero_copy_only=False)
    cn = ct["c_nationkey"].to_numpy(zero_copy_only=False)
    csrt = np.argsort(ck, kind="mergesort")
    ck, cn = ck[csrt], cn[csrt]
    ot = _pull(orders, {"o_orderkey": pa.int64(), "o_custkey": pa.int64()})
    ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
    oc = ot["o_custkey"].to_numpy(zero_copy_only=False)
    osrt = np.argsort(ok, kind="mergesort")
    ok = ok[osrt]
    cidx, chit = _probe(ck, oc[osrt])
    onat = np.where(chit, cn[cidx], np.int64(-1))
    ord_ref = ray.put((ok, onat))
    y_lo = int(lo[:4])
    n_years = int(hi[:4]) - y_lo + 1

    def partial(b: pa.Table) -> pa.Table:
        sks, snat = ray.get(supp_ref)
        oks, onats = ray.get(ord_ref)
        oi, ohit = _probe(oks, b["l_orderkey"].to_numpy(zero_copy_only=False))
        si, shit = _probe(sks, b["l_suppkey"].to_numpy(zero_copy_only=False))
        s_nat = np.where(shit, snat[si], np.int64(-2))
        c_nat = np.where(ohit, onats[oi], np.int64(-1))
        ab = (s_nat == ka) & (c_nat == kb)
        ba = (s_nat == kb) & (c_nat == ka)
        keep = ab | ba
        if not keep.any():
            return pa.table({"cell": pa.array([], pa.int64()),
                             "rev_c4": pa.array([], pa.int64())})
        yr = pc.year(b["l_shipdate"]).to_numpy(zero_copy_only=False)[keep]
        dirn = ba[keep].astype(np.int64)  # 0 = a→b, 1 = b→a
        cell = dirn * n_years + (yr - y_lo)
        sums = np.bincount(cell, weights=_rev_c4(b)[keep],
                           minlength=2 * n_years)
        nz = np.nonzero(sums)[0]
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "rev_c4": pa.array(sums[nz].astype(np.int64))})

    parts = _pull(li.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True),
                  {"cell": pa.int64(), "rev_c4": pa.int64()})
    cells = parts["cell"].to_numpy(zero_copy_only=False)
    rv = parts["rev_c4"].to_numpy(zero_copy_only=False)
    sums = np.bincount(cells, weights=rv, minlength=2 * n_years) \
        if len(cells) else np.zeros(2 * n_years)
    nz = np.nonzero(sums)[0]
    sn, cn_, yr = [], [], []
    for c in nz:
        d, y = divmod(int(c), n_years)
        sn.append(nation_b if d else nation_a)
        cn_.append(nation_a if d else nation_b)
        yr.append(y_lo + y)
    return pa.table({
        "supp_nation": pa.array(sn, pa.string()),
        "cust_nation": pa.array(cn_, pa.string()),
        "l_year": pa.array(yr, pa.int64()),
        "rev_c4": pa.array(sums[nz].astype(np.int64)),
    })


def _q7_join_fallback(li, orders, cust, supp, name_of, ka, kb):
    def rev(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"], "l_suppkey": b["l_suppkey"],
            "l_year": pc.year(b["l_shipdate"]).cast(pa.int64()),
            "rev_c4": pa.array(_rev_c4(b)),
        })

    j = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    j = j.join(orders, join_type="inner", num_partitions=join_parts(),
               on=("l_orderkey",), right_on=("o_orderkey",))
    j = j.join(cust, join_type="inner", num_partitions=join_parts(),
               on=("o_custkey",), right_on=("c_custkey",))
    j = j.join(supp, join_type="inner", num_partitions=join_parts(),
               on=("l_suppkey",), right_on=("s_suppkey",))

    def pair_only(b: pa.Table) -> pa.Table:
        cn = b["c_nationkey"].to_numpy(zero_copy_only=False)
        sn = b["s_nationkey"].to_numpy(zero_copy_only=False)
        keep = ((sn == ka) & (cn == kb)) | ((sn == kb) & (cn == ka))
        b = b.filter(pa.array(keep))
        sn = b["s_nationkey"].to_numpy(zero_copy_only=False)
        cn = b["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "supp_nation": pa.array([name_of[int(k)] for k in sn],
                                    pa.string()),
            "cust_nation": pa.array([name_of[int(k)] for k in cn],
                                    pa.string()),
            "l_year": b["l_year"],
            "rev_c4": b["rev_c4"],
        })

    # ≤ 2 directions × years groups — pull through the typed-empty
    # path so a zero-match window keeps its schema
    return _pull(
        j.map_batches(pair_only, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("rev_c4", alias_name="rev_c4")),
        {"supp_nation": pa.string(), "cust_nation": pa.string(),
         "l_year": pa.int64(), "rev_c4": pa.int64()})


SQL_NATION_TRADE_VOLUME = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev_c4) AS BIGINT) AS rev_c4
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
             CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*10000)
                  AS BIGINT) AS rev_c4
      FROM supplier s, lineitem l, orders o, customer c,
           nation n1, nation n2
      WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
        AND c.c_custkey = o.o_custkey
        AND s.s_nationkey = n1.n_nationkey
        AND c.c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01') shipping
GROUP BY 1, 2, 3
"""


# =====================================================================
# Q8: market share of one supplier nation within a customer region
# =====================================================================

def q_market_share(sf_dir: str, supp_nation: str = "NATION_3",
                   region: str = "AMERICA", p_type: str = "ECONOMY",
                   lo: str = "1996-01-01", hi: str = "1998-01-01"):
    """TPC-H Q8 family: the share of `supp_nation` in `region`'s
    `p_type` purchase volume, per order year — a ratio of two
    conditional sums. Numerator and denominator are exact int64 rev_c4
    partials bincounted per block into ≤2·years cells; the single
    float division + 6-dp round happens ONCE on the driver with the
    identical IEEE expression as the oracle."""
    nation = _pull(_t(sf_dir, "nation"), {})
    region_t = _pull(_t(sf_dir, "region"), {})
    rk = {r: k for k, r in zip(region_t["r_regionkey"].to_pylist(),
                               region_t["r_name"].to_pylist())}[region]
    in_region = {nk for nk, nr in zip(nation["n_nationkey"].to_pylist(),
                                      nation["n_regionkey"].to_pylist())
                 if nr == rk}
    target_nk = {nn: nk for nk, nn in zip(nation["n_nationkey"].to_pylist(),
                                          nation["n_name"].to_pylist())
                 }[supp_nation]

    import pyarrow.dataset as pads

    part = _t(sf_dir, "part", ["p_partkey"],
              filter=pads.field("p_type") == p_type)
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
                filter=_date_window("o_orderdate", lo, hi))
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    limit = _broadcast_limit()
    y_lo = int(lo[:4])
    n_years = int(hi[:4]) - y_lo + 1
    if (part.count() > limit or orders.count() > limit
            or cust.count() > limit or supp.count() > limit):
        parts = _q8_join_partials(sf_dir, in_region, target_nk, p_type,
                                  lo, hi, y_lo, n_years)
        return _q8_finalize(parts, y_lo, n_years)

    pk = np.sort(_pull(part, {"p_partkey": pa.int64()})["p_partkey"]
                 .to_numpy(zero_copy_only=False))
    part_ref = ray.put(pk)
    st = _pull(supp, {"s_suppkey": pa.int64(), "s_nationkey": pa.int64()})
    supp_ref = _bcast_sorted(st, "s_suppkey", "s_nationkey")
    ct = _pull(cust, {"c_custkey": pa.int64(), "c_nationkey": pa.int64()})
    ck = ct["c_custkey"].to_numpy(zero_copy_only=False)
    cn = ct["c_nationkey"].to_numpy(zero_copy_only=False)
    csrt = np.argsort(ck, kind="mergesort")
    ck, cn = ck[csrt], cn[csrt]
    ot = _pull(orders, {"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                        "o_orderdate": pa.timestamp("us")})
    ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
    oc = ot["o_custkey"].to_numpy(zero_copy_only=False)
    oyr = pc.year(ot["o_orderdate"]).to_numpy(zero_copy_only=False)
    osrt = np.argsort(ok, kind="mergesort")
    ok, oyr = ok[osrt], oyr[osrt]
    cidx, chit = _probe(ck, oc[osrt])
    # fuse region membership at build time: -1 = customer outside region
    onat = np.where(chit, cn[cidx], np.int64(-1))
    o_in = np.isin(onat, np.fromiter(in_region, np.int64, len(in_region)))
    oyr = np.where(o_in, oyr, np.int64(-1))
    ord_ref = ray.put((ok, oyr))

    def partial(b: pa.Table) -> pa.Table:
        pks = ray.get(part_ref)
        sks, snat = ray.get(supp_ref)
        oks, oyrs = ray.get(ord_ref)
        _, phit = _probe(pks, b["l_partkey"].to_numpy(zero_copy_only=False))
        oi, ohit = _probe(oks, b["l_orderkey"].to_numpy(zero_copy_only=False))
        si, shit = _probe(sks, b["l_suppkey"].to_numpy(zero_copy_only=False))
        yr = np.where(ohit, oyrs[oi], np.int64(-1))
        keep = phit & (yr >= 0) & shit
        if not keep.any():
            return pa.table({"cell": pa.array([], pa.int64()),
                             "rev_c4": pa.array([], pa.int64())})
        rev = _rev_c4(b)[keep]
        is_target = (np.where(shit, snat[si], np.int64(-2))[keep]
                     == target_nk).astype(np.int64)
        cell = is_target * n_years + (yr[keep] - y_lo)
        sums = np.bincount(cell, weights=rev, minlength=2 * n_years)
        nz = np.nonzero(sums)[0]
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "rev_c4": pa.array(sums[nz].astype(np.int64))})

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey",
             "l_extendedprice", "l_discount"])
    parts = _pull(li.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True),
                  {"cell": pa.int64(), "rev_c4": pa.int64()})
    return _q8_finalize(parts, y_lo, n_years)


def _q8_finalize(parts: pa.Table, y_lo: int, n_years: int) -> pa.Table:
    """Shared ≤2·years-cell fold + the ONE float division (identical
    IEEE expression as the oracle) for both q8 plans."""
    cells = parts["cell"].to_numpy(zero_copy_only=False)
    rv = parts["rev_c4"].to_numpy(zero_copy_only=False)
    sums = np.bincount(cells, weights=rv, minlength=2 * n_years) \
        if len(cells) else np.zeros(2 * n_years)
    years, shares = [], []
    for y in range(n_years):
        den = int(sums[y] + sums[n_years + y])
        if den == 0:
            continue
        num = int(sums[n_years + y])
        years.append(y_lo + y)
        shares.append(round(num / den, 6))
    return pa.table({"o_year": pa.array(years, pa.int64()),
                     "mkt_share": pa.array(shares, pa.float64())})


def _q8_join_partials(sf_dir, in_region, target_nk, p_type, lo, hi,
                      y_lo, n_years) -> pa.Table:
    """Oversized-dimension plan for q_market_share: the full
    Dataset.join chain (part semi-filter ⨝ orders ⨝ customer ⨝
    supplier), then the same per-block conditional bincount into
    ≤2·years cells as the broadcast plan."""
    import pyarrow.dataset as pads

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_partkey": b["l_partkey"],
                         "l_suppkey": b["l_suppkey"],
                         "rev_c4": pa.array(_rev_c4(b))})

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey",
             "l_extendedprice", "l_discount"]) \
        .map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    part = _t(sf_dir, "part", ["p_partkey"],
              filter=pads.field("p_type") == p_type)
    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_orderdate"],
                filter=_date_window("o_orderdate", lo, hi))
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j = li.join(part, join_type="inner", num_partitions=join_parts(),
                on=("l_partkey",), right_on=("p_partkey",))
    j = j.join(orders, join_type="inner", num_partitions=join_parts(),
               on=("l_orderkey",), right_on=("o_orderkey",))
    j = j.join(cust, join_type="inner", num_partitions=join_parts(),
               on=("o_custkey",), right_on=("c_custkey",))
    j = j.join(supp, join_type="inner", num_partitions=join_parts(),
               on=("l_suppkey",), right_on=("s_suppkey",))
    in_reg = np.fromiter(in_region, np.int64, len(in_region))

    def cells(b: pa.Table) -> pa.Table:
        cn = b["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(cn, in_reg)
        if not keep.any():
            return pa.table({"cell": pa.array([], pa.int64()),
                             "rev_c4": pa.array([], pa.int64())})
        yr = pc.year(b["o_orderdate"]).to_numpy(zero_copy_only=False)[keep]
        sn = b["s_nationkey"].to_numpy(zero_copy_only=False)[keep]
        rv = b["rev_c4"].to_numpy(zero_copy_only=False)[keep]
        cell = (sn == target_nk).astype(np.int64) * n_years + (yr - y_lo)
        sums = np.bincount(cell, weights=rv, minlength=2 * n_years)
        nz = np.nonzero(sums)[0]
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "rev_c4": pa.array(sums[nz].astype(np.int64))})

    return _pull(j.map_batches(cells, batch_format="pyarrow"),
                 {"cell": pa.int64(), "rev_c4": pa.int64()})


SQL_MARKET_SHARE = """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                           THEN rev_c4 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(rev_c4) AS DOUBLE), 6) AS mkt_share
FROM (SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*10000)
                  AS BIGINT) AS rev_c4,
             n2.n_name AS supp_nation
      FROM part p, lineitem l, supplier s, orders o, customer c,
           nation n1, nation n2, region r
      WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
        AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        AND c.c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
        AND s.s_nationkey = n2.n_nationkey
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        AND p.p_type = 'ECONOMY') all_nations
GROUP BY 1
"""


# =====================================================================
# Q14: promo revenue ratio over one ship month
# =====================================================================

def q_promo_revenue(sf_dir: str, lo: str = "1996-03-01",
                    hi: str = "1996-04-01"):
    """TPC-H Q14 family: the PROMO share of one month's revenue as a
    percentage. partkey→is-promo broadcast (guarded, join fallback),
    ship-date window pushed to the read, two exact int64 sums per
    block, one driver division rounded to 6 dp (identical expression
    tree both sides: (100.0·num)/den)."""
    part = _t(sf_dir, "part", ["p_partkey", "p_type"])
    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_extendedprice", "l_discount"],
            filter=_date_window("l_shipdate", lo, hi))
    if part.count() > _broadcast_limit():
        j = li.join(part, join_type="inner", num_partitions=join_parts(),
                    on=("l_partkey",), right_on=("p_partkey",))

        def both(b: pa.Table) -> pa.Table:
            rev = _rev_c4(b)
            promo = (b["p_type"].to_numpy(zero_copy_only=False)
                     == "PROMO")
            return pa.table({
                "num_c4": pa.array([int(rev[promo].sum())], pa.int64()),
                "den_c4": pa.array([int(rev.sum())], pa.int64()),
            })

        parts = _pull(j.map_batches(both, batch_format="pyarrow"),
                      {"num_c4": pa.int64(), "den_c4": pa.int64()})
    else:
        pt = _pull(part, {"p_partkey": pa.int64(), "p_type": pa.string()})
        pk = pt["p_partkey"].to_numpy(zero_copy_only=False)
        promo = (np.asarray(pt["p_type"].to_pylist(), dtype=object)
                 == "PROMO")
        srt = np.argsort(pk, kind="mergesort")
        lut_ref = ray.put((pk[srt], promo[srt]))

        def partial(b: pa.Table) -> pa.Table:
            pks, is_promo = ray.get(lut_ref)
            pi, phit = _probe(
                pks, b["l_partkey"].to_numpy(zero_copy_only=False))
            rev = _rev_c4(b)[phit]
            pm = is_promo[pi][phit]
            return pa.table({
                "num_c4": pa.array([int(rev[pm].sum())], pa.int64()),
                "den_c4": pa.array([int(rev.sum())], pa.int64()),
            })

        parts = _pull(li.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      {"num_c4": pa.int64(), "den_c4": pa.int64()})
    num = int(pc.sum(parts["num_c4"]).as_py() or 0)
    den = int(pc.sum(parts["den_c4"]).as_py() or 0)
    return pa.table({"promo_revenue":
                     pa.array([round((100.0 * num) / den, 6)],
                              pa.float64())})


SQL_PROMO_REVENUE = """
SELECT ROUND((100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(ROUND(l.l_extendedprice*(1-l.l_discount)
                                    *10000) AS BIGINT)
                    ELSE 0 END) AS DOUBLE))
             / CAST(SUM(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)
                                   *10000) AS BIGINT)) AS DOUBLE),
             6) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01'
"""


# =====================================================================
# Q19: disjunctive predicate revenue (OR-of-conjunction blocks)
# =====================================================================

def q_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 family: revenue under three OR-ed (brand, size-range,
    quantity-range) conjunction blocks. The part side reduces to a
    sorted partkey→(brand-code, size) lookup restricted to the three
    brands at the READ (row-group pruned); the whole disjunction is one
    vectorized mask per block — no shuffle, single-row output."""
    import pyarrow.dataset as pads

    blocks = [("Brand#12", 1, 5, 1, 11),
              ("Brand#23", 1, 10, 10, 20),
              ("Brand#34", 1, 15, 20, 30)]
    brands = [b[0] for b in blocks]
    part = _t(sf_dir, "part", ["p_partkey", "p_brand", "p_size"],
              filter=pads.field("p_brand").isin(brands))
    pt = _pull(part, {"p_partkey": pa.int64(), "p_brand": pa.string(),
                      "p_size": pa.int64()})
    pk = pt["p_partkey"].to_numpy(zero_copy_only=False)
    bcode = np.array([brands.index(x) for x in pt["p_brand"].to_pylist()],
                     np.int64)
    size = pt["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    srt = np.argsort(pk, kind="mergesort")
    lut_ref = ray.put((pk[srt], bcode[srt], size[srt]))

    def partial(b: pa.Table) -> pa.Table:
        pks, bc, sz = ray.get(lut_ref)
        pi, phit = _probe(pks, b["l_partkey"].to_numpy(zero_copy_only=False))
        qty = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        code, s = bc[pi], sz[pi]
        keep = np.zeros(len(qty), bool)
        for i, (_, s_lo, s_hi, q_lo, q_hi) in enumerate(blocks):
            keep |= ((code == i) & (s >= s_lo) & (s <= s_hi)
                     & (qty >= q_lo) & (qty <= q_hi))
        keep &= phit
        return pa.table({"rev_c4":
                         pa.array([int(_rev_c4(b)[keep].sum())],
                                  pa.int64())})

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    parts = _pull(li.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True),
                  {"rev_c4": pa.int64()})
    return pa.table({"rev_c4":
                     pa.array([int(pc.sum(parts["rev_c4"]).as_py() or 0)],
                              pa.int64())})


SQL_DISJUNCTIVE_REVENUE = """
SELECT CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*10000)
                AS BIGINT)), 0) AS BIGINT) AS rev_c4
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


# =====================================================================
# Q10: returned-item losses — top-20 customers by returned revenue
# =====================================================================

def q_returned_item_losses(sf_dir: str, lo: str = "1996-01-01",
                           hi: str = "1996-07-01", k: int = 20):
    """TPC-H Q10 family. Scale plan: return-flag filter pushed to the
    READ; the date-windowed orderkey→custkey map broadcasts (guarded,
    window-bounded); per-block Arrow group_by(custkey) partials → ONE
    custkey-hash fold → per-partition top-k (rev desc, custkey asc) →
    driver merges ≤parts·k rows → the ≤k winners pull their names and
    nations through filtered dimension reads. The deterministic
    tie-break (custkey asc at equal revenue) is mirrored in the SQL."""
    import pyarrow.dataset as pads

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"],
                filter=_date_window("o_orderdate", lo, hi))
    if orders.count() > _broadcast_limit():
        cand = _q10_join_candidates(sf_dir, orders, k)
        return _q10_finalize(sf_dir, cand, k)
    ot = _pull(orders, {"o_orderkey": pa.int64(), "o_custkey": pa.int64()})
    ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
    oc = ot["o_custkey"].to_numpy(zero_copy_only=False)
    osrt = np.argsort(ok, kind="mergesort")
    ord_ref = ray.put((ok[osrt], oc[osrt]))
    n_parts = fold_parts()

    def partial(b: pa.Table) -> pa.Table:
        oks, ocs = ray.get(ord_ref)
        oi, ohit = _probe(oks, b["l_orderkey"].to_numpy(zero_copy_only=False))
        if not ohit.any():
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "rev_c4": pa.array([], pa.int64()),
                             "kp": pa.array([], pa.int64())})
        cust = ocs[oi][ohit]
        rev = _rev_c4(b)[ohit]
        uk, inv = np.unique(cust, return_inverse=True)
        sums = np.bincount(inv, weights=rev).astype(np.int64)
        kp = (_splitmix64(uk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"c_custkey": pa.array(uk),
                         "rev_c4": pa.array(sums),
                         "kp": pa.array(kp)})

    def fold_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("c_custkey", sort=False)["rev_c4"].sum()
        df = pd.DataFrame({"c_custkey": s.index.to_numpy(np.int64),
                           "rev_c4": s.to_numpy(np.int64)})
        df = df.sort_values(["rev_c4", "c_custkey"],
                            ascending=[False, True], kind="mergesort")
        return df.head(k)

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount"],
            filter=pads.field("l_returnflag") == "R")
    cand = _pull(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("kp").map_groups(fold_topk, batch_format="pandas"),
        {"c_custkey": pa.int64(), "rev_c4": pa.int64()})
    return _q10_finalize(sf_dir, cand, k)


def _q10_finalize(sf_dir: str, cand: pa.Table, k: int) -> pa.Table:
    """Shared q10 finale: merge the ≤parts·k candidates, pull the ≤k
    winners' names/nations through filtered dimension reads."""
    import pyarrow.dataset as pads

    df = cand.to_pandas().sort_values(
        ["rev_c4", "c_custkey"], ascending=[False, True],
        kind="mergesort").head(k)
    if len(df) == 0:
        return pa.table({"c_custkey": pa.array([], pa.int64()),
                         "c_name": pa.array([], pa.string()),
                         "n_name": pa.array([], pa.string()),
                         "rev_c4": pa.array([], pa.int64())})
    cks = sorted(int(x) for x in df["c_custkey"])
    ct = pads.dataset(os.path.join(sf_dir, "customer.parquet")).to_table(
        columns=["c_custkey", "c_name", "c_nationkey"],
        filter=pads.field("c_custkey").isin(cks))
    nation = _pull(_t(sf_dir, "nation", ["n_nationkey", "n_name"]), {})
    nname = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))
    meta = {c: (n, nname[nk]) for c, n, nk in
            zip(ct["c_custkey"].to_pylist(), ct["c_name"].to_pylist(),
                ct["c_nationkey"].to_pylist())}
    return pa.table({
        "c_custkey": pa.array(df["c_custkey"].to_numpy(np.int64)),
        "c_name": pa.array([meta[int(c)][0] for c in df["c_custkey"]],
                           pa.string()),
        "n_name": pa.array([meta[int(c)][1] for c in df["c_custkey"]],
                           pa.string()),
        "rev_c4": pa.array(df["rev_c4"].to_numpy(np.int64)),
    })


def _q10_join_candidates(sf_dir: str, orders, k: int) -> pa.Table:
    """Oversized-window plan for q_returned_item_losses: hash-join the
    R-flagged lineitems to the windowed orders, then the same per-block
    custkey partial → ONE custkey-hash fold → per-partition top-k as
    the broadcast plan."""
    import pyarrow.dataset as pads

    n_parts = fold_parts()

    def rev(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "rev_c4": pa.array(_rev_c4(b))})

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount"],
            filter=pads.field("l_returnflag") == "R") \
        .map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    j = li.join(orders, join_type="inner", num_partitions=join_parts(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ck, return_inverse=True)
        sums = np.bincount(
            inv, weights=b["rev_c4"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        kp = (_splitmix64(uk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"c_custkey": pa.array(uk),
                         "rev_c4": pa.array(sums),
                         "kp": pa.array(kp)})

    def fold_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("c_custkey", sort=False)["rev_c4"].sum()
        df = pd.DataFrame({"c_custkey": s.index.to_numpy(np.int64),
                           "rev_c4": s.to_numpy(np.int64)})
        df = df.sort_values(["rev_c4", "c_custkey"],
                            ascending=[False, True], kind="mergesort")
        return df.head(k)

    return _pull(
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("kp").map_groups(fold_topk, batch_format="pandas"),
        {"c_custkey": pa.int64(), "rev_c4": pa.int64()})


SQL_RETURNED_ITEM_LOSSES = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*10000)
                AS BIGINT)) AS BIGINT) AS rev_c4
FROM customer c, orders o, lineitem l, nation n
WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
  AND c.c_nationkey = n.n_nationkey AND l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3
ORDER BY rev_c4 DESC, c_custkey LIMIT 20
"""


# =====================================================================
# Q13: customer distribution — histogram of per-customer order counts
# =====================================================================

def q_customer_order_histogram(sf_dir: str):
    """TPC-H Q13 family: how many customers placed exactly N orders,
    INCLUDING the zero bucket (the LEFT JOIN's raison d'être) — without
    materializing the join. Scale plan: per-block value_counts(custkey)
    partials → ONE custkey-hash fold where each partition emits a
    bounded (order-count → customer-count) histogram + its distinct-
    customer tally; the driver folds blocks×≤max_count skinny rows and
    derives bucket 0 as |customer| − |customers with orders| (two
    dataset counts, no join)."""
    n_parts = fold_parts()
    orders = _t(sf_dir, "orders", ["o_custkey"])

    def partial(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(ck, return_counts=True)
        kp = (_splitmix64(uk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"c_custkey": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64)),
                         "kp": pa.array(kp)})

    def fold_hist(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("c_custkey", sort=False)["n"].sum()
        counts = s.to_numpy(np.int64)
        uc, freq = np.unique(counts, return_counts=True)
        return pd.DataFrame({"c_count": uc,
                             "custdist": freq.astype(np.int64)})

    hist = _pull(
        orders.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("kp").map_groups(fold_hist, batch_format="pandas"),
        {"c_count": pa.int64(), "custdist": pa.int64()})
    hs = {}
    with_orders = 0
    for c, d in zip(hist["c_count"].to_pylist(),
                    hist["custdist"].to_pylist()):
        hs[c] = hs.get(c, 0) + d
        with_orders += d
    total_cust = _t(sf_dir, "customer", ["c_custkey"]).count()
    zero = total_cust - with_orders
    if zero > 0:
        hs[0] = hs.get(0, 0) + zero
    cc = sorted(hs)
    return pa.table({"c_count": pa.array(cc, pa.int64()),
                     "custdist": pa.array([hs[c] for c in cc], pa.int64())})


SQL_CUSTOMER_ORDER_HISTOGRAM = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1) c_orders
GROUP BY 1
"""


# =====================================================================
# Q15: top revenue supplier — max-equality (argmax with ties)
# =====================================================================

def q_top_revenue_supplier(sf_dir: str, lo: str = "1996-01-01",
                           hi: str = "1996-04-01"):
    """TPC-H Q15 family: the supplier(s) achieving the quarter's MAX
    revenue — the scalar-subquery max-equality join. Scale plan:
    per-block group_by(suppkey) partials → ONE suppkey-hash fold →
    each partition emits only its local argmax candidates (ties kept)
    → the driver picks the global max from ≤parts rows and pulls the
    winners' names through a filtered dimension read."""
    import pyarrow.dataset as pads

    n_parts = fold_parts()

    def partial(b: pa.Table) -> pa.Table:
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(sk, return_inverse=True)
        sums = np.bincount(inv, weights=_rev_c4(b)).astype(np.int64)
        kp = (_splitmix64(uk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"s_suppkey": pa.array(uk),
                         "total_c4": pa.array(sums),
                         "kp": pa.array(kp)})

    def fold_max(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("s_suppkey", sort=False)["total_c4"].sum()
        m = s.max()
        s = s[s == m]
        return pd.DataFrame({"s_suppkey": s.index.to_numpy(np.int64),
                             "total_c4": s.to_numpy(np.int64)})

    li = _t(sf_dir, "lineitem",
            ["l_suppkey", "l_extendedprice", "l_discount"],
            filter=_date_window("l_shipdate", lo, hi))
    cand = _pull(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("kp").map_groups(fold_max, batch_format="pandas"),
        {"s_suppkey": pa.int64(), "total_c4": pa.int64()})
    if cand.num_rows == 0:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_c4": pa.array([], pa.int64())})
    tot = cand["total_c4"].to_numpy(zero_copy_only=False)
    m = tot.max()
    win = cand.filter(pa.array(tot == m))
    sks = sorted(win["s_suppkey"].to_pylist())
    st = pads.dataset(os.path.join(sf_dir, "supplier.parquet")).to_table(
        columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(sks))
    nm = dict(zip(st["s_suppkey"].to_pylist(), st["s_name"].to_pylist()))
    return pa.table({
        "s_suppkey": pa.array(sks, pa.int64()),
        "s_name": pa.array([nm[s] for s in sks], pa.string()),
        "total_c4": pa.array([int(m)] * len(sks), pa.int64()),
    })


SQL_TOP_REVENUE_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000)
                  AS BIGINT)) AS BIGINT) AS total_c4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.total_c4
FROM supplier s JOIN revenue r ON s.s_suppkey = r.s_suppkey
WHERE r.total_c4 = (SELECT MAX(total_c4) FROM revenue)
"""


# =====================================================================
# Q16: distinct suppliers per (brand, size) with an exclusion set
# =====================================================================

def q_supplier_part_counts(sf_dir: str):
    """TPC-H Q16 family: COUNT(DISTINCT suppkey) per part (brand, size)
    over the observed supply relation (distinct lineitem pairs stand in
    for partsupp), excluding negative-balance suppliers (the complaint
    NOT IN). Scale plan: the filtered part attrs broadcast as a sorted
    partkey→(brand-code, size) lookup (guarded) and the exclusion set
    as a sorted array; per-block np.unique on a packed
    (brand, size, suppkey) int64 triple → ONE triple-hash exchange →
    per-partition distinct + bincount per (brand, size) → driver folds
    bounded (≤brands·sizes) cells."""
    import pyarrow.dataset as pads

    sizes = [1, 5, 10, 15, 20, 25, 30, 35]
    part = _t(sf_dir, "part", ["p_partkey", "p_brand", "p_size"],
              filter=(pads.field("p_type") != "PROMO")
                     & pads.field("p_size").isin(sizes))
    if part.count() > _broadcast_limit():
        return _q16_join_fallback(sf_dir, part)
    pt = _pull(part, {"p_partkey": pa.int64(), "p_brand": pa.string(),
                      "p_size": pa.int64()})
    brands = sorted(set(pt["p_brand"].to_pylist()))
    bcode = {b: i for i, b in enumerate(brands)}
    scode = {s: i for i, s in enumerate(sizes)}
    pk = pt["p_partkey"].to_numpy(zero_copy_only=False)
    attr = np.array([bcode[b] * len(sizes) + scode[s]
                     for b, s in zip(pt["p_brand"].to_pylist(),
                                     pt["p_size"].to_pylist())], np.int64)
    srt = np.argsort(pk, kind="mergesort")
    lut_ref = ray.put((pk[srt], attr[srt]))
    excl = _pull(_t(sf_dir, "supplier", ["s_suppkey"],
                    filter=pads.field("s_acctbal") < 0.0),
                 {"s_suppkey": pa.int64()})
    excl_ref = ray.put(np.sort(
        excl["s_suppkey"].to_numpy(zero_copy_only=False)))
    n_cells = len(brands) * len(sizes)
    n_parts = fold_parts()

    def triples(b: pa.Table) -> pa.Table:
        pks, attrs = ray.get(lut_ref)
        ex = ray.get(excl_ref)
        pi, phit = _probe(pks, b["l_partkey"].to_numpy(zero_copy_only=False))
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        _, ehit = _probe(ex, sk)
        keep = phit & ~ehit
        if not keep.any():
            return pa.table({"triple": pa.array([], pa.int64()),
                             "kp": pa.array([], pa.int64())})
        # suppkey < 2^40 packed under the ≤2^23 (brand,size) cell — the
        # pack is asserted, not assumed
        cell, sk = attrs[pi][keep], sk[keep]
        assert sk.max() < (1 << 40), "suppkey exceeds packing domain"
        packed = np.unique(cell * (1 << 40) + sk)
        kp = (_splitmix64(packed).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"triple": pa.array(packed), "kp": pa.array(kp)})

    def fold_cells(g: pd.DataFrame) -> pd.DataFrame:
        tri = np.unique(g["triple"].to_numpy(np.int64))
        cell = tri >> 40
        sums = np.bincount(cell, minlength=n_cells)
        nz = np.nonzero(sums)[0]
        return pd.DataFrame({"cell": nz.astype(np.int64),
                             "supplier_cnt": sums[nz].astype(np.int64)})

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    cells = _pull(
        li.map_batches(triples, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("kp").map_groups(fold_cells, batch_format="pandas"),
        {"cell": pa.int64(), "supplier_cnt": pa.int64()})
    agg = {}
    for c, n in zip(cells["cell"].to_pylist(),
                    cells["supplier_cnt"].to_pylist()):
        agg[c] = agg.get(c, 0) + n
    cc = sorted(agg)
    return pa.table({
        "p_brand": pa.array([brands[c // len(sizes)] for c in cc],
                            pa.string()),
        "p_size": pa.array([sizes[c % len(sizes)] for c in cc],
                           pa.int64()),
        "supplier_cnt": pa.array([agg[c] for c in cc], pa.int64()),
    })


def _q16_join_fallback(sf_dir: str, part) -> pa.Table:
    """Oversized-part plan for q_supplier_part_counts: per-block
    distinct (partkey, suppkey) pairs pre-shrink the exchange, then a
    partkey-hash join carries the (brand, size) attrs, the NOT IN is a
    broadcast probe (the negative-balance subset is a small slice of
    the supplier dimension — the same side the broadcast plan ships),
    and ONE (brand, size)-hash groupby counts distinct suppliers."""
    import pyarrow.dataset as pads

    def dpairs(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(pk) == 0:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "l_suppkey": pa.array([], pa.int64())})
        order = np.lexsort((sk, pk))
        pk, sk = pk[order], sk[order]
        keep = np.ones(len(pk), bool)
        keep[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
        return pa.table({"l_partkey": pa.array(pk[keep]),
                         "l_suppkey": pa.array(sk[keep])})

    pairs = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]) \
        .map_batches(dpairs, batch_format="pyarrow", zero_copy_batch=True)
    j = pairs.join(part, join_type="inner", num_partitions=join_parts(),
                   on=("l_partkey",), right_on=("p_partkey",))
    excl = _pull(_t(sf_dir, "supplier", ["s_suppkey"],
                    filter=pads.field("s_acctbal") < 0.0),
                 {"s_suppkey": pa.int64()})
    excl_ref = ray.put(np.sort(
        excl["s_suppkey"].to_numpy(zero_copy_only=False)))

    def keep_good(b: pa.Table) -> pa.Table:
        ex = ray.get(excl_ref)
        _, ehit = _probe(ex, b["l_suppkey"].to_numpy(zero_copy_only=False))
        return b.filter(pa.array(~ehit)) \
            .select(["p_brand", "p_size", "l_suppkey"])

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_brand": [g["p_brand"].iloc[0]],
            "p_size": np.array([g["p_size"].iloc[0]], np.int64),
            "supplier_cnt": np.array([g["l_suppkey"].nunique()],
                                     np.int64),
        })

    out = _pull(
        j.map_batches(keep_good, batch_format="pyarrow")
        .groupby(["p_brand", "p_size"])
        .map_groups(count_distinct, batch_format="pandas"),
        {"p_brand": pa.string(), "p_size": pa.int64(),
         "supplier_cnt": pa.int64()})
    # match the broadcast plan's (brand, size) ordering
    df = out.to_pandas().sort_values(["p_brand", "p_size"],
                                     ignore_index=True)
    return pa.table({
        "p_brand": pa.array(df["p_brand"], pa.string()),
        "p_size": pa.array(df["p_size"].to_numpy(np.int64)),
        "supplier_cnt": pa.array(df["supplier_cnt"].to_numpy(np.int64)),
    })


SQL_SUPPLIER_PART_COUNTS = """
SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


# =====================================================================
# Q17: small-quantity revenue — per-key 0.2×avg threshold, exact
# =====================================================================

def q_small_qty_revenue(sf_dir: str, brand: str = "Brand#23"):
    """TPC-H Q17 family: revenue from lines whose quantity is below 20%
    of their part's average quantity. The correlated scalar subquery
    becomes (pass 1) per-block (partkey, Σqty, count) partials → ONE
    partkey-hash fold → a guarded broadcast of the per-part stats, then
    (pass 2) a streamed filter using the EXACT integer cross-multiply
    5·qty·cnt < Σqty (no float average anywhere near the cut — the same
    trick as idle_rich_customers). Output: total cents + avg_yearly at
    6 dp (identical expression both sides)."""
    import pyarrow.dataset as pads

    part = _t(sf_dir, "part", ["p_partkey"],
              filter=pads.field("p_brand") == brand)
    if part.count() > _broadcast_limit():
        return _q17_exchange_fallback(sf_dir, part)
    pk_arr = np.sort(_pull(part, {"p_partkey": pa.int64()})["p_partkey"]
                     .to_numpy(zero_copy_only=False))
    part_ref = ray.put(pk_arr)
    n_parts = fold_parts()

    def stats_partial(b: pa.Table) -> pa.Table:
        pks = ray.get(part_ref)
        lk = b["l_partkey"].to_numpy(zero_copy_only=False)
        _, phit = _probe(pks, lk)
        if not phit.any():
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "sq": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "kp": pa.array([], pa.int64())})
        lk = lk[phit]
        qty = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[phit]
        uk, inv = np.unique(lk, return_inverse=True)
        sq = np.bincount(inv, weights=qty).astype(np.int64)
        cnt = np.bincount(inv).astype(np.int64)
        kp = (_splitmix64(uk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"l_partkey": pa.array(uk), "sq": pa.array(sq),
                         "cnt": pa.array(cnt), "kp": pa.array(kp)})

    def fold_stats(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("l_partkey", sort=False)[["sq", "cnt"]].sum()
        return pd.DataFrame({"l_partkey": s.index.to_numpy(np.int64),
                             "sq": s["sq"].to_numpy(np.int64),
                             "cnt": s["cnt"].to_numpy(np.int64)})

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    li = _t(sf_dir, "lineitem", li_cols)
    stats = _pull(
        li.map_batches(stats_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("kp").map_groups(fold_stats, batch_format="pandas"),
        {"l_partkey": pa.int64(), "sq": pa.int64(), "cnt": pa.int64()})
    # stats rows ≤ the brand's part count, which already passed the
    # broadcast guard above — safe to ship
    spk = stats["l_partkey"].to_numpy(zero_copy_only=False)
    ssq = stats["sq"].to_numpy(zero_copy_only=False)
    scnt = stats["cnt"].to_numpy(zero_copy_only=False)
    ssrt = np.argsort(spk, kind="mergesort")
    stats_ref = ray.put((spk[ssrt], ssq[ssrt], scnt[ssrt]))

    def pass2(b: pa.Table) -> pa.Table:
        pks, sq, cnt = ray.get(stats_ref)
        pi, phit = _probe(pks, b["l_partkey"].to_numpy(zero_copy_only=False))
        qty = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = phit & (5 * qty * cnt[pi] < sq[pi])
        cents = pc.round(pc.multiply(b["l_extendedprice"],
                                     pa.scalar(100.0))).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"loss_c": pa.array([int(cents[keep].sum())],
                                            pa.int64())})

    parts = _pull(li.map_batches(pass2, batch_format="pyarrow",
                                 zero_copy_batch=True),
                  {"loss_c": pa.int64()})
    loss = int(pc.sum(parts["loss_c"]).as_py() or 0)
    return pa.table({"loss_c": pa.array([loss], pa.int64()),
                     "avg_yearly": pa.array([round(loss / 700.0, 6)],
                                            pa.float64())})


def _q17_exchange_fallback(sf_dir: str, part) -> pa.Table:
    """Oversized-brand plan for q_small_qty_revenue: hash-join the
    fact to the brand's parts, then ONE partkey-hash exchange
    co-locates each part's rows so the per-part stats AND the
    5·qty·cnt < Σqty cut are computed inside the owning group — no
    stats broadcast at any scale."""
    n_parts = fold_parts()

    def keyed(b: pa.Table) -> pa.Table:
        lk = b["l_partkey"].to_numpy(zero_copy_only=False)
        qty = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cents = pc.round(pc.multiply(b["l_extendedprice"],
                                     pa.scalar(100.0))).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        kp = (_splitmix64(lk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"l_partkey": pa.array(lk), "qty": pa.array(qty),
                         "cents": pa.array(cents), "kp": pa.array(kp)})

    def cut_group(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("l_partkey", sort=False)["qty"]
        sq = grp.transform("sum").to_numpy(np.int64)
        cnt = grp.transform("size").to_numpy(np.int64)
        keep = 5 * g["qty"].to_numpy(np.int64) * cnt < sq
        return pd.DataFrame({"loss_c": np.array(
            [g["cents"].to_numpy(np.int64)[keep].sum()], np.int64)})

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice"])
    j = li.join(part, join_type="inner", num_partitions=join_parts(),
                on=("l_partkey",), right_on=("p_partkey",))
    parts = _pull(
        j.map_batches(keyed, batch_format="pyarrow")
        .groupby("kp").map_groups(cut_group, batch_format="pandas"),
        {"loss_c": pa.int64()})
    loss = int(pc.sum(parts["loss_c"]).as_py() or 0)
    return pa.table({"loss_c": pa.array([loss], pa.int64()),
                     "avg_yearly": pa.array([round(loss / 700.0, 6)],
                                            pa.float64())})


SQL_SMALL_QTY_REVENUE = """
WITH agg AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS sq,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem l JOIN part p
    ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
  GROUP BY 1),
hit AS (
  SELECT CAST(ROUND(l.l_extendedprice*100) AS BIGINT) AS pc
  FROM lineitem l JOIN agg a ON l.l_partkey = a.l_partkey
  WHERE 5 * CAST(ROUND(l.l_quantity) AS BIGINT) * a.cnt < a.sq)
SELECT CAST(COALESCE(SUM(pc), 0) AS BIGINT) AS loss_c,
       ROUND(CAST(COALESCE(SUM(pc), 0) AS DOUBLE) / 700.0, 6)
         AS avg_yearly
FROM hit
"""


# =====================================================================
# Q11-adapted: parts with outsized revenue share (global-scalar HAVING)
# =====================================================================

def q_important_parts(sf_dir: str):
    """TPC-H Q11 family adapted to the trimmed schema: parts whose
    lineitem revenue exceeds 1.5× the average per-part revenue — a
    HAVING against a global scalar (2× is degenerate on the synthetic
    domain: zero qualifying parts at every test scale). Scale plan:
    per-block group_by(partkey) partials → ONE partkey-hash fold,
    materialized once (part-dimension sized); the global Σ and part
    count fold from per-partition one-row partials; the cut
    v·2n > 3·g is applied as the exact integer comparison
    v > (3g)//(2n) (equivalent for positive ints: with q=(3g)//(2n)
    and r=3g mod 2n, v·2n>3g ⇔ v≥q+1 ⇔ v>q since r<2n), so no float
    enters the cut and no int64 overflow path exists at any scale."""
    n_parts = fold_parts()

    def partial(b: pa.Table) -> pa.Table:
        lk = b["l_partkey"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(lk, return_inverse=True)
        sums = np.bincount(inv, weights=_rev_c4(b)).astype(np.int64)
        kp = (_splitmix64(uk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"l_partkey": pa.array(uk),
                         "value_c4": pa.array(sums),
                         "kp": pa.array(kp)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("l_partkey", sort=False)["value_c4"].sum()
        return pd.DataFrame({"l_partkey": s.index.to_numpy(np.int64),
                             "value_c4": s.to_numpy(np.int64)})

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_extendedprice", "l_discount"])
    per_part = (li.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("kp").map_groups(fold, batch_format="pandas")
                .materialize())

    def scal(b: pa.Table) -> pa.Table:
        return pa.table({
            "g": pa.array([int(pc.sum(b["value_c4"]).as_py() or 0)],
                          pa.int64()),
            "n": pa.array([b.num_rows], pa.int64()),
        })

    sc = _pull(per_part.map_batches(scal, batch_format="pyarrow"),
               {"g": pa.int64(), "n": pa.int64()})
    g = int(pc.sum(sc["g"]).as_py() or 0)
    n = int(pc.sum(sc["n"]).as_py() or 0)
    if n == 0:
        return pa.table({"l_partkey": pa.array([], pa.int64()),
                         "value_c4": pa.array([], pa.int64())})
    thresh = (3 * g) // (2 * n)

    def cut(b: pa.Table) -> pa.Table:
        keep = pc.greater(b["value_c4"], pa.scalar(thresh))
        return b.filter(keep).select(["l_partkey", "value_c4"])

    # the qualifying set is a small subset of the (already bounded)
    # part dimension — pull it through the typed-empty path so a
    # zero-row result keeps its schema (Ray drops schema on empty
    # Datasets in to_pandas)
    return _pull(per_part.map_batches(cut, batch_format="pyarrow"),
                 {"l_partkey": pa.int64(), "value_c4": pa.int64()})


SQL_IMPORTANT_PARTS = """
WITH pr AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000)
                  AS BIGINT)) AS BIGINT) AS value_c4
  FROM lineitem GROUP BY 1),
tot AS (SELECT CAST(SUM(value_c4) AS BIGINT) AS g,
               CAST(COUNT(*) AS BIGINT) AS n FROM pr)
SELECT pr.l_partkey, pr.value_c4
FROM pr, tot WHERE pr.value_c4 * 2 * tot.n > 3 * tot.g
"""


# =====================================================================
# Q4-adapted: order priority counts under a correlated EXISTS
# =====================================================================

def q_late_shipment_priority(sf_dir: str, lo: str = "1996-01-01",
                             hi: str = "1996-04-01", days: int = 90):
    """TPC-H Q4 family (commitdate/receiptdate are absent, so 'late' is
    l_shipdate > o_orderdate + 90 days): count date-windowed orders per
    priority where at least one lineitem shipped late — EXISTS with
    correlated date arithmetic. Scale plan: the windowed orderkey →
    (orderdate µs, priority-code) map broadcasts (guarded); lineitem
    blocks emit their DISTINCT late orderkeys → ONE orderkey-hash
    exchange dedups across blocks and bincounts priority codes per
    partition → driver folds ≤5·parts rows."""
    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_orderdate", "o_orderpriority"],
                filter=_date_window("o_orderdate", lo, hi))
    if orders.count() > _broadcast_limit():
        return _q4_join_fallback(sf_dir, orders, days)
    ot = _pull(orders, {"o_orderkey": pa.int64(),
                        "o_orderdate": pa.timestamp("us"),
                        "o_orderpriority": pa.string()})
    prios = sorted(set(ot["o_orderpriority"].to_pylist()))
    pcode = {p: i for i, p in enumerate(prios)}
    ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
    od = ot["o_orderdate"].to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    op = np.array([pcode[p] for p in ot["o_orderpriority"].to_pylist()],
                  np.int64)
    osrt = np.argsort(ok, kind="mergesort")
    ord_ref = ray.put((ok[osrt], od[osrt], op[osrt]))
    late_us = np.int64(days) * np.int64(86_400_000_000)
    n_parts = fold_parts()

    def late_keys(b: pa.Table) -> pa.Table:
        oks, ods, ops = ray.get(ord_ref)
        lk = b["l_orderkey"].to_numpy(zero_copy_only=False)
        oi, ohit = _probe(oks, lk)
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        late = ohit & (ship > ods[oi] + late_us)
        if not late.any():
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "prio": pa.array([], pa.int64()),
                             "kp": pa.array([], pa.int64())})
        keys = np.unique(lk[late])
        kp = (_splitmix64(keys).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        pi2 = np.searchsorted(oks, keys)
        return pa.table({"o_orderkey": pa.array(keys),
                         "prio": pa.array(ops[pi2]),
                         "kp": pa.array(kp)})

    n_prio = len(prios)

    def fold_prio(g: pd.DataFrame) -> pd.DataFrame:
        _, first = np.unique(g["o_orderkey"].to_numpy(np.int64),
                             return_index=True)
        counts = np.bincount(g["prio"].to_numpy(np.int64)[first],
                             minlength=n_prio)
        nz = np.nonzero(counts)[0]
        return pd.DataFrame({"prio": nz.astype(np.int64),
                             "order_count": counts[nz].astype(np.int64)})

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    parts = _pull(
        li.map_batches(late_keys, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("kp").map_groups(fold_prio, batch_format="pandas"),
        {"prio": pa.int64(), "order_count": pa.int64()})
    agg = np.zeros(n_prio, np.int64)
    for p, c in zip(parts["prio"].to_pylist(),
                    parts["order_count"].to_pylist()):
        agg[p] += c
    nz = np.nonzero(agg)[0]
    return pa.table({
        "o_orderpriority": pa.array([prios[i] for i in nz], pa.string()),
        "order_count": pa.array(agg[nz], pa.int64()),
    })


def _q4_join_fallback(sf_dir: str, orders, days: int) -> pa.Table:
    """Oversized-window plan for q_late_shipment_priority: hash-join
    lineitem to the windowed orders, evaluate the correlated date
    arithmetic post-join, then ONE orderkey-hash exchange dedups the
    EXISTS and bincounts priorities per partition."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    j = li.join(orders, join_type="inner", num_partitions=join_parts(),
                on=("l_orderkey",), right_on=("o_orderkey",))
    late_us = np.int64(days) * np.int64(86_400_000_000)
    n_parts = fold_parts()

    def late_rows(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        od = b["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        late = ship > od + late_us
        if not late.any():
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "o_orderpriority": pa.array([], pa.string()),
                             "kp": pa.array([], pa.int64())})
        lk = b["l_orderkey"].to_numpy(zero_copy_only=False)[late]
        keys, first = np.unique(lk, return_index=True)
        prio = b["o_orderpriority"].take(
            pa.array(np.flatnonzero(late)[first]))
        kp = (_splitmix64(keys).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"o_orderkey": pa.array(keys),
                         "o_orderpriority": prio,
                         "kp": pa.array(kp)})

    def fold_prio(g: pd.DataFrame) -> pd.DataFrame:
        dd = g.drop_duplicates("o_orderkey")
        s = dd.groupby("o_orderpriority", sort=True).size()
        return pd.DataFrame({
            "o_orderpriority": s.index.to_numpy(object),
            "order_count": s.to_numpy(np.int64),
        })

    parts = _pull(
        j.map_batches(late_rows, batch_format="pyarrow")
        .groupby("kp").map_groups(fold_prio, batch_format="pandas"),
        {"o_orderpriority": pa.string(), "order_count": pa.int64()})
    agg: dict[str, int] = {}
    for p, c in zip(parts["o_orderpriority"].to_pylist(),
                    parts["order_count"].to_pylist()):
        agg[p] = agg.get(p, 0) + c
    prios = sorted(agg)
    return pa.table({
        "o_orderpriority": pa.array(prios, pa.string()),
        "order_count": pa.array([agg[p] for p in prios], pa.int64()),
    })


SQL_LATE_SHIPMENT_PRIORITY = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY 1
"""


# =====================================================================
# BFS min-hop over the part↔supplier co-occurrence graph
# =====================================================================

def q_bfs_hops(sf_dir: str, seed_suppkey: int = 1, max_hops: int = 4):
    """Iterative distributed BFS: minimum hop distance from one supplier
    to every node of the bipartite part↔supplier graph induced by
    lineitem co-occurrence (nodes packed as 2·partkey / 2·suppkey+1).
    The oracle is a recursive CTE (WITH RECURSIVE … UNION + MIN(hop)) —
    a rare exactly-SQL-checkable iterative algorithm. Scale plan: the
    distinct edge list folds through ONE src-hash exchange and
    materializes ONCE (it is re-scanned per hop); each round broadcasts
    only the current frontier (a node array bounded by the dimension
    domain, count-asserted) and per-block set-intersections emit
    newly-reached nodes; the driver's seen set is node-domain-sized
    (parts+suppliers — dimension tables), never edge-sized."""
    n_parts = fold_parts()

    def edge_partial(b: pa.Table) -> pa.Table:
        p = b["l_partkey"].to_numpy(zero_copy_only=False)
        s = b["l_suppkey"].to_numpy(zero_copy_only=False)
        # nodes 2·key(+1) must stay < 2^31 so (src<<32)|dst fits int64
        # without touching the sign bit (the ADVICE pagerank lesson)
        assert p.max(initial=0) < (1 << 30) and s.max(initial=0) < (1 << 30)
        a = 2 * p
        bnode = 2 * s + 1
        # undirected: emit both directions, packed (src<<32)|dst
        src = np.concatenate([a, bnode])
        dst = np.concatenate([bnode, a])
        packed = np.unique((src << np.int64(32)) | dst)
        kp = (_splitmix64(packed >> np.int64(32)).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"edge": pa.array(packed), "kp": pa.array(kp)})

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        e = np.unique(g["edge"].to_numpy(np.int64))
        return pd.DataFrame({"src": (e >> 32).astype(np.int64),
                             "dst": (e & 0xFFFFFFFF).astype(np.int64)})

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    edges = (li.map_batches(edge_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("kp").map_groups(dedup, batch_format="pandas")
             .materialize())

    seed = 2 * seed_suppkey + 1
    dist = {seed: 0}
    frontier = np.array([seed], np.int64)
    for hop in range(max_hops):
        f_ref = ray.put(np.sort(frontier))

        def expand(b: pa.Table, _f=f_ref) -> pa.Table:
            fr = ray.get(_f)
            src = b["src"].to_numpy(zero_copy_only=False)
            _, hit = _probe(fr, src)
            nxt = np.unique(b["dst"].to_numpy(zero_copy_only=False)[hit])
            return pa.table({"node": pa.array(nxt)})

        nxt = _pull(edges.map_batches(expand, batch_format="pyarrow"),
                    {"node": pa.int64()})
        nodes = np.unique(nxt["node"].to_numpy(zero_copy_only=False))
        new = np.array([n for n in nodes if n not in dist], np.int64)
        if len(new) == 0:
            break
        for n in new:
            dist[int(n)] = hop + 1
        frontier = new
    ks = sorted(dist)
    return pa.table({"node": pa.array(ks, pa.int64()),
                     "hop": pa.array([dist[k] for k in ks], pa.int64())})


SQL_BFS_HOPS = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT 2*l_partkey AS a, 2*l_suppkey+1 AS b FROM lineitem),
und AS (SELECT a AS src, b AS dst FROM edges
        UNION ALL SELECT b, a FROM edges),
bfs(node, hop) AS (
  SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT)
  UNION
  SELECT u.dst, bfs.hop + 1
  FROM bfs JOIN und u ON u.src = bfs.node
  WHERE bfs.hop < 4)
SELECT node, CAST(MIN(hop) AS BIGINT) AS hop FROM bfs GROUP BY 1
"""


# =====================================================================
# Q6: forecast revenue change — one-scan conditional sum
# =====================================================================

def q_forecast_revenue(sf_dir: str, lo: str = "1996-01-01",
                       hi: str = "1997-01-01"):
    """TPC-H Q6 family: revenue that would vanish if discounts in
    [0.05, 0.07] on sub-24-quantity lines were dropped. One streamed
    scan with the ship-date window pushed to the READ; the discount
    band compares on exact rounded cents-of-discount (floats never
    enter a boundary comparison — 0.05/0.07 are not representable);
    revenue = Σ price·disc·10⁴ exact int64 partials."""
    li = _t(sf_dir, "lineitem",
            ["l_quantity", "l_extendedprice", "l_discount"],
            filter=_date_window("l_shipdate", lo, hi))

    def partial(b: pa.Table) -> pa.Table:
        d_c = pc.round(pc.multiply(b["l_discount"], pa.scalar(100.0))) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        qty = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = (d_c >= 5) & (d_c <= 7) & (qty < 24)
        rev = pc.round(pc.multiply(
            pc.multiply(b["l_extendedprice"], b["l_discount"]),
            pa.scalar(10000.0))).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"rev_c4":
                         pa.array([int(rev[keep].sum())], pa.int64())})

    parts = _pull(li.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True),
                  {"rev_c4": pa.int64()})
    return pa.table({"rev_c4":
                     pa.array([int(pc.sum(parts["rev_c4"]).as_py() or 0)],
                              pa.int64())})


SQL_FORECAST_REVENUE = """
SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice*l_discount*10000)
                          AS BIGINT)), 0) AS BIGINT) AS rev_c4
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND CAST(ROUND(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


# =====================================================================
# Q9-adapted: revenue by supplier nation × ship year for a part family
# =====================================================================

def q_nation_profit(sf_dir: str, token: str = "widget"):
    """TPC-H Q9 family adapted to the trimmed schema (no partsupp →
    profit reduces to revenue): revenue grouped by (supplier nation,
    ship year) over parts whose name contains `token`. Scale plan: the
    name-matched partkeys and the supplier→nationkey map broadcast
    (guarded; join fallback below), the fact scans ONCE, and per-block
    partials bincount into ≤|nation|·years cells."""
    import pyarrow.dataset as pads

    nation = _pull(_t(sf_dir, "nation", ["n_nationkey", "n_name"]), {})
    nat_name = dict(zip(nation["n_nationkey"].to_pylist(),
                        nation["n_name"].to_pylist()))
    part = _t(sf_dir, "part", ["p_partkey"],
              filter=pc.match_substring(pads.field("p_name"), token))
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    limit = _broadcast_limit()
    n_nat = max(nat_name) + 1
    if part.count() > limit or supp.count() > limit:
        return _q9_join_fallback(sf_dir, part, nat_name)

    pk_ref = ray.put(np.sort(
        _pull(part, {"p_partkey": pa.int64()})["p_partkey"]
        .to_numpy(zero_copy_only=False)))
    supp_ref = _bcast_sorted(
        _pull(supp, {"s_suppkey": pa.int64(), "s_nationkey": pa.int64()}),
        "s_suppkey", "s_nationkey")

    def partial(b: pa.Table) -> pa.Table:
        pks = ray.get(pk_ref)
        sks, snat = ray.get(supp_ref)
        _, phit = _probe(pks, b["l_partkey"].to_numpy(zero_copy_only=False))
        si, shit = _probe(sks, b["l_suppkey"].to_numpy(zero_copy_only=False))
        keep = phit & shit
        if not keep.any():
            return pa.table({"cell": pa.array([], pa.int64()),
                             "rev_c4": pa.array([], pa.int64())})
        yr = pc.year(b["l_shipdate"]).to_numpy(zero_copy_only=False)[keep]
        nk = snat[si][keep]
        cell = nk * np.int64(8192) + yr
        uc, inv = np.unique(cell, return_inverse=True)
        sums = np.bincount(inv, weights=_rev_c4(b)[keep]).astype(np.int64)
        return pa.table({"cell": pa.array(uc),
                         "rev_c4": pa.array(sums)})

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount"])
    parts = _pull(li.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True),
                  {"cell": pa.int64(), "rev_c4": pa.int64()})
    agg: dict[int, int] = {}
    for c, v in zip(parts["cell"].to_pylist(), parts["rev_c4"].to_pylist()):
        agg[c] = agg.get(c, 0) + v
    cc = sorted(agg)
    return pa.table({
        "n_name": pa.array([nat_name[c // 8192] for c in cc], pa.string()),
        "l_year": pa.array([c % 8192 for c in cc], pa.int64()),
        "rev_c4": pa.array([agg[c] for c in cc], pa.int64()),
    })


def _q9_join_fallback(sf_dir, part, nat_name) -> pa.Table:
    """Oversized-side plan for q_nation_profit: part semi-filter and
    supplier nation hop as hash joins, then a bounded
    (nation, year) groupby."""
    def rev(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": b["l_partkey"], "l_suppkey": b["l_suppkey"],
            "l_year": pc.year(b["l_shipdate"]).cast(pa.int64()),
            "rev_c4": pa.array(_rev_c4(b)),
        })

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount"]) \
        .map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j = li.join(part, join_type="inner", num_partitions=join_parts(),
                on=("l_partkey",), right_on=("p_partkey",))
    j = j.join(supp, join_type="inner", num_partitions=join_parts(),
               on=("l_suppkey",), right_on=("s_suppkey",))

    def named(b: pa.Table) -> pa.Table:
        nk = b["s_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array([nat_name[int(k)] for k in nk],
                               pa.string()),
            "l_year": b["l_year"], "rev_c4": b["rev_c4"],
        })

    out = _pull(
        j.map_batches(named, batch_format="pyarrow")
        .groupby(["n_name", "l_year"])
        .aggregate(Sum("rev_c4", alias_name="rev_c4")),
        {"n_name": pa.string(), "l_year": pa.int64(),
         "rev_c4": pa.int64()})
    df = out.to_pandas().sort_values(["n_name", "l_year"],
                                     ignore_index=True)
    return pa.table({
        "n_name": pa.array(df["n_name"], pa.string()),
        "l_year": pa.array(df["l_year"].to_numpy(np.int64)),
        "rev_c4": pa.array(df["rev_c4"].to_numpy(np.int64)),
    })


SQL_NATION_PROFIT = """
SELECT n.n_name,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(ROUND(l.l_extendedprice*(1-l.l_discount)*10000)
                AS BIGINT)) AS BIGINT) AS rev_c4
FROM lineitem l, part p, supplier s, nation n
WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
  AND s.s_nationkey = n.n_nationkey
  AND p.p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# =====================================================================
# Q2: min-cost supplier — the correlated scalar-MIN subquery shape
# =====================================================================

def _pair_reduce(pk: np.ndarray, sk: np.ndarray, v: np.ndarray, op):
    """Per-block combiner: reduce v over distinct (pk, sk) pairs with a
    ufunc (np.minimum / np.add) via lexsort + reduceat — no Python loop,
    no hash table, output ≤ distinct pairs in the block."""
    if len(pk) == 0:
        return pk, sk, v
    order = np.lexsort((sk, pk))
    pk, sk, v = pk[order], sk[order], v[order]
    new = np.ones(len(pk), bool)
    new[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
    idx = np.nonzero(new)[0]
    return pk[idx], sk[idx], op.reduceat(v, idx)


def q_min_cost_supplier(sf_dir: str, region: str = "EUROPE",
                        name_like: str = "widget"):
    """TPC-H Q2 family: for each part matching the name filter, the
    region supplier(s) achieving that part's MINIMUM observed supply
    cost (min l_extendedprice over the lineitem supply relation, in
    exact cents) — the correlated scalar-MIN subquery. Scale plan: the
    filtered part keys and the region-filtered supplier attrs broadcast
    as sorted lookups (guarded); the fact scan reduces each block to
    per-(part, supplier) min-cost rows via lexsort+reduceat; ONE
    partkey-hash exchange folds pair minima and keeps only rows equal
    to the partition-local per-part min (ties preserved — every
    qualifying pair lives in exactly one partition, so the local min IS
    the global min). Oversized sides fall back to the Dataset.join
    plan (forced-branch equality pinned in tests/test_tpch_shapes.py)."""
    import pyarrow.dataset as pads

    nation = _pull(_t(sf_dir, "nation"), {})
    region_t = _pull(_t(sf_dir, "region"), {})
    rk = {r: k for k, r in zip(region_t["r_regionkey"].to_pylist(),
                               region_t["r_name"].to_pylist())}[region]
    nat_name = dict(zip(nation["n_nationkey"].to_pylist(),
                        nation["n_name"].to_pylist()))
    in_region = sorted(k for k, nr in
                       zip(nation["n_nationkey"].to_pylist(),
                           nation["n_regionkey"].to_pylist()) if nr == rk)
    # LIKE '%x%' is substring containment — applied with
    # pc.match_substring on the bounded two-column pull below.
    pt = _t(sf_dir, "part", ["p_partkey", "p_name"])
    supp = _t(sf_dir, "supplier",
              filter=pads.field("s_nationkey").isin(in_region))
    limit = _broadcast_limit()
    if pt.count() > limit or supp.count() > limit:
        return _q2_join_fallback(sf_dir, in_region, nat_name, name_like)
    ptab = _pull(pt, {"p_partkey": pa.int64(), "p_name": pa.string()})
    keep = pc.match_substring(ptab["p_name"], name_like)
    pks = np.sort(ptab.filter(keep)["p_partkey"]
                  .to_numpy(zero_copy_only=False))
    stab = _pull(supp, {"s_suppkey": pa.int64(), "s_name": pa.string(),
                        "s_nationkey": pa.int64(), "s_acctbal": pa.float64()})
    sk_arr = stab["s_suppkey"].to_numpy(zero_copy_only=False)
    ssrt = np.argsort(sk_arr, kind="mergesort")
    sk_sorted = sk_arr[ssrt]
    s_name = np.asarray(stab["s_name"].to_pylist(), object)[ssrt]
    s_nat = stab["s_nationkey"].to_numpy(zero_copy_only=False)[ssrt]
    bal_c = np.round(stab["s_acctbal"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)[ssrt]
    keys_ref = ray.put((pks, sk_sorted))
    n_parts = fold_parts()

    def partial(b: pa.Table) -> pa.Table:
        pka, ska = ray.get(keys_ref)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        _, phit = _probe(pka, pk)
        _, shit = _probe(ska, sk)
        m = phit & shit
        cost = pc.round(pc.multiply(b["l_extendedprice"],
                                    pa.scalar(100.0))) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        pk, sk, cost = _pair_reduce(pk[m], sk[m], cost[m], np.minimum)
        kp = (_splitmix64(pk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"l_partkey": pa.array(pk), "l_suppkey":
                         pa.array(sk), "cost_c": pa.array(cost),
                         "kp": pa.array(kp)})

    def fold_min(g: pd.DataFrame) -> pd.DataFrame:
        pair = g.groupby(["l_partkey", "l_suppkey"],
                         sort=False)["cost_c"].min().reset_index()
        part_min = pair.groupby("l_partkey")["cost_c"].transform("min")
        w = pair[pair["cost_c"] == part_min]
        return pd.DataFrame({
            "l_partkey": w["l_partkey"].to_numpy(np.int64),
            "l_suppkey": w["l_suppkey"].to_numpy(np.int64),
            "cost_c": w["cost_c"].to_numpy(np.int64)})

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice"])
    win = _pull(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("kp").map_groups(fold_min, batch_format="pandas"),
        {"l_partkey": pa.int64(), "l_suppkey": pa.int64(),
         "cost_c": pa.int64()})
    wpk = win["l_partkey"].to_numpy(zero_copy_only=False)
    wsk = win["l_suppkey"].to_numpy(zero_copy_only=False)
    wc = win["cost_c"].to_numpy(zero_copy_only=False)
    si, shit = _probe(sk_sorted, wsk)
    assert shit.all(), "winner supplier vanished from the broadcast side"
    order = np.lexsort((wsk, wpk, -bal_c[si]))
    si, wpk, wc = si[order], wpk[order], wc[order]
    return pa.table({
        "bal_c": pa.array(bal_c[si]),
        "s_name": pa.array(s_name[si].tolist(), pa.string()),
        "n_name": pa.array([nat_name[int(k)] for k in s_nat[si]],
                           pa.string()),
        "p_partkey": pa.array(wpk),
        "cost_c": pa.array(wc),
    })


def _q2_join_fallback(sf_dir, in_region, nat_name, name_like):
    """Oversized-side plan: pair minima still combine per block, then a
    partkey hash join against the name-filtered part keys, a suppkey
    join against the region-filtered supplier read, and the SAME
    one-exchange per-part min-equality fold. Both join right sides stay
    RAW parquet reads (filters pushed into the scan) — a map_batches'd
    right side can hand the hash-join empty schema-less partitions
    (Ray 2.49, same bug family as the run_crawl HASH_SHUFFLE note)."""
    import pyarrow.dataset as pads

    part = _t(sf_dir, "part", ["p_partkey"],
              filter=pc.match_substring(pads.field("p_name"), name_like))
    supp = _t(sf_dir, "supplier",
              ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
              filter=pads.field("s_nationkey").isin(in_region))

    def pair_partial(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        cost = pc.round(pc.multiply(b["l_extendedprice"],
                                    pa.scalar(100.0))) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        pk, sk, cost = _pair_reduce(pk, sk, cost, np.minimum)
        return pa.table({"l_partkey": pa.array(pk),
                         "l_suppkey": pa.array(sk),
                         "cost_c": pa.array(cost)})

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(pair_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
    j = li.join(part, join_type="inner", num_partitions=join_parts(),
                on=("l_partkey",), right_on=("p_partkey",))
    j = j.join(supp, join_type="inner", num_partitions=join_parts(),
               on=("l_suppkey",), right_on=("s_suppkey",))

    def fold_min(g: pd.DataFrame) -> pd.DataFrame:
        pair = g.groupby(["l_partkey", "l_suppkey"], sort=False) \
            .agg(cost_c=("cost_c", "min"), s_acctbal=("s_acctbal", "first"),
                 s_name=("s_name", "first"),
                 s_nationkey=("s_nationkey", "first")) \
            .reset_index()
        part_min = pair.groupby("l_partkey")["cost_c"].transform("min")
        w = pair[pair["cost_c"] == part_min].copy()
        w["bal_c"] = np.round(w["s_acctbal"].to_numpy(np.float64)
                              * 100.0).astype(np.int64)
        return w[["l_partkey", "l_suppkey", "cost_c", "bal_c",
                  "s_name", "s_nationkey"]]

    out = _pull(
        j.groupby("l_partkey").map_groups(fold_min,
                                          batch_format="pandas"),
        {"l_partkey": pa.int64(), "l_suppkey": pa.int64(),
         "cost_c": pa.int64(), "bal_c": pa.int64(),
         "s_name": pa.string(), "s_nationkey": pa.int64()})
    df = out.to_pandas()
    df["n_name"] = [nat_name[int(k)] for k in df["s_nationkey"]]
    df = df.sort_values(["bal_c", "l_partkey", "l_suppkey"],
                        ascending=[False, True, True],
                        ignore_index=True)
    return pa.table({
        "bal_c": pa.array(df["bal_c"].to_numpy(np.int64)),
        "s_name": pa.array(df["s_name"], pa.string()),
        "n_name": pa.array(df["n_name"], pa.string()),
        "p_partkey": pa.array(df["l_partkey"].to_numpy(np.int64)),
        "cost_c": pa.array(df["cost_c"].to_numpy(np.int64)),
    })


SQL_MIN_COST_SUPPLIER = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS cost_c
  FROM lineitem GROUP BY 1, 2),
sup AS (
  SELECT s.s_suppkey, s.s_name,
         CAST(ROUND(s.s_acctbal*100) AS BIGINT) AS bal_c, n.n_name
  FROM supplier s, nation n, region r
  WHERE s.s_nationkey = n.n_nationkey
    AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'),
flt AS (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'),
best AS (
  SELECT ps.l_partkey, MIN(ps.cost_c) AS min_c
  FROM ps JOIN sup ON ps.l_suppkey = sup.s_suppkey
          JOIN flt ON ps.l_partkey = flt.p_partkey
  GROUP BY 1)
SELECT sup.bal_c, sup.s_name, sup.n_name,
       ps.l_partkey AS p_partkey, ps.cost_c
FROM ps JOIN sup ON ps.l_suppkey = sup.s_suppkey
        JOIN best ON ps.l_partkey = best.l_partkey
                 AND ps.cost_c = best.min_c
"""


# =====================================================================
# Q20: dominant suppliers — the nested-aggregate IN-subquery shape
# =====================================================================

def q_dominant_supplier(sf_dir: str, name_like: str = "widget",
                        lo: str = "1997-01-01", hi: str = "1998-01-01",
                        regions: tuple = ("EUROPE", "ASIA")):
    """TPC-H Q20 family: suppliers who shipped MORE THAN HALF of some
    filtered part's total windowed volume — the nested-aggregate IN
    subquery (partsupp availqty stands in as the observed shipped
    share). Scale plan: the name-filtered part keys broadcast sorted
    (guarded); the date window is pushed into the parquet read; blocks
    reduce to per-(part, supplier) quantity sums via lexsort+reduceat;
    ONE partkey-hash exchange computes per-part totals and keeps
    2·pair > total rows (exact integers, no division); the qualifying
    supplier set is output-bounded, so the nation/region finale is a
    filtered dimension read. Oversized part side falls back to the
    Dataset.join plan (forced-branch equality pinned)."""
    import pyarrow.dataset as pads

    nation = _pull(_t(sf_dir, "nation"), {})
    region_t = _pull(_t(sf_dir, "region"), {})
    rks = {k for k, r in zip(region_t["r_regionkey"].to_pylist(),
                             region_t["r_name"].to_pylist())
           if r in regions}
    good_nat = sorted(k for k, nr in
                      zip(nation["n_nationkey"].to_pylist(),
                          nation["n_regionkey"].to_pylist()) if nr in rks)
    pt = _t(sf_dir, "part", ["p_partkey", "p_name"])
    if pt.count() > _broadcast_limit():
        return _q20_join_fallback(sf_dir, good_nat, name_like, lo, hi)
    ptab = _pull(pt, {"p_partkey": pa.int64(), "p_name": pa.string()})
    pks = np.sort(ptab.filter(
        pc.match_substring(ptab["p_name"], name_like))["p_partkey"]
        .to_numpy(zero_copy_only=False))
    pks_ref = ray.put(pks)
    n_parts = fold_parts()

    def partial(b: pa.Table) -> pa.Table:
        pka = ray.get(pks_ref)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        _, phit = _probe(pka, pk)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        q = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        pk, sk, q = _pair_reduce(pk[phit], sk[phit], q[phit], np.add)
        kp = (_splitmix64(pk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"l_partkey": pa.array(pk),
                         "l_suppkey": pa.array(sk),
                         "q": pa.array(q), "kp": pa.array(kp)})

    def fold_dominant(g: pd.DataFrame) -> pd.DataFrame:
        pair = g.groupby(["l_partkey", "l_suppkey"],
                         sort=False)["q"].sum().reset_index()
        tot = pair.groupby("l_partkey")["q"].transform("sum")
        w = pair[2 * pair["q"] > tot]
        return pd.DataFrame({"s_suppkey": np.unique(
            w["l_suppkey"].to_numpy(np.int64))})

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"],
            filter=_date_window("l_shipdate", lo, hi))
    cand = _pull(
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("kp").map_groups(fold_dominant, batch_format="pandas"),
        {"s_suppkey": pa.int64()})
    sks = sorted(set(cand["s_suppkey"].to_pylist()))
    if not sks:
        return pa.table({"s_name": pa.array([], pa.string())})
    st = pads.dataset(os.path.join(sf_dir, "supplier.parquet")).to_table(
        columns=["s_suppkey", "s_name", "s_nationkey"],
        filter=pads.field("s_suppkey").isin(sks)
               & pads.field("s_nationkey").isin(good_nat))
    return pa.table({"s_name": pa.array(sorted(st["s_name"].to_pylist()),
                                        pa.string())})


def _q20_join_fallback(sf_dir, good_nat, name_like, lo, hi):
    """Oversized-part plan: pair sums combine per block, partkey hash
    join carries the name filter, and the SAME one-exchange dominance
    fold runs per partkey group."""
    def flt_parts(b: pa.Table) -> pa.Table:
        return b.filter(pc.match_substring(b["p_name"], name_like)) \
            .select(["p_partkey"])

    part = _t(sf_dir, "part", ["p_partkey", "p_name"]) \
        .map_batches(flt_parts, batch_format="pyarrow",
                     zero_copy_batch=True)

    def pair_partial(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        q = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        pk, sk, q = _pair_reduce(pk, sk, q, np.add)
        return pa.table({"l_partkey": pa.array(pk),
                         "l_suppkey": pa.array(sk), "q": pa.array(q)})

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"],
            filter=_date_window("l_shipdate", lo, hi)) \
        .map_batches(pair_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
    j = li.join(part, join_type="inner", num_partitions=join_parts(),
                on=("l_partkey",), right_on=("p_partkey",))

    def fold_dominant(g: pd.DataFrame) -> pd.DataFrame:
        pair = g.groupby(["l_partkey", "l_suppkey"],
                         sort=False)["q"].sum().reset_index()
        tot = pair.groupby("l_partkey")["q"].transform("sum")
        w = pair[2 * pair["q"] > tot]
        return pd.DataFrame({"s_suppkey": np.unique(
            w["l_suppkey"].to_numpy(np.int64))})

    import pyarrow.dataset as pads

    cand = _pull(
        j.groupby("l_partkey").map_groups(fold_dominant,
                                          batch_format="pandas"),
        {"s_suppkey": pa.int64()})
    sks = sorted(set(cand["s_suppkey"].to_pylist()))
    if not sks:
        return pa.table({"s_name": pa.array([], pa.string())})
    st = pads.dataset(os.path.join(sf_dir, "supplier.parquet")).to_table(
        columns=["s_suppkey", "s_name", "s_nationkey"],
        filter=pads.field("s_suppkey").isin(sks)
               & pads.field("s_nationkey").isin(good_nat))
    return pa.table({"s_name": pa.array(sorted(st["s_name"].to_pylist()),
                                        pa.string())})


SQL_DOMINANT_SUPPLIER = """
WITH w AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '%widget%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1, 2),
tot AS (SELECT l_partkey, SUM(q) AS tq FROM w GROUP BY 1)
SELECT DISTINCT s.s_name
FROM w JOIN tot USING (l_partkey)
       JOIN supplier s ON s.s_suppkey = w.l_suppkey
       JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE 2*w.q > tot.tq
  AND n.n_regionkey IN (SELECT r_regionkey FROM region
                        WHERE r_name IN ('EUROPE', 'ASIA'))
ORDER BY s.s_name
"""


# =====================================================================
# Q12: lines per ship class split by order-priority band
# =====================================================================

_HIGH_PRIOS = ("1-URGENT", "2-HIGH")


def q_priority_line_classes(sf_dir: str, lo: str = "1996-01-01",
                            hi: str = "1997-01-01"):
    """TPC-H Q12 family (shipmode is absent from the trimmed schema, so
    l_linestatus stands in for the ship-class axis): for lines shipped
    inside the date window, count per class the lines whose order is
    HIGH priority (1-URGENT / 2-HIGH) vs everything else. Scale plan:
    the fact scan is windowed AT THE READ; each block probes the
    broadcast orderkey→is-high bitmap (searchsorted over sorted int64
    keys + one int8 bit array — the only order attribute the query
    needs) and bincounts (class, band) locally, so nothing is exchanged
    at all: the driver folds ≤ 2·|classes| skinny rows per block. Past
    ``_BROADCAST_KEY_LIMIT`` orderkeys the bitmap is replaced by a
    Dataset.join on the orderkey with the identical post-join bincount
    (forced-branch equality pinned in tests/test_tpch_shapes.py)."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_linestatus"],
            filter=_date_window("l_shipdate", lo, hi))
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    if orders.count() > _broadcast_limit():
        counted = _q12_join_fallback(li, orders)
    else:
        ot = _pull(orders, {"o_orderkey": pa.int64(),
                            "o_orderpriority": pa.string()})
        ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
        hi_bit = pc.is_in(ot["o_orderpriority"],
                          value_set=pa.array(_HIGH_PRIOS)) \
            .to_numpy(zero_copy_only=False).astype(np.int8)
        srt = np.argsort(ok, kind="mergesort")
        ord_ref = ray.put((ok[srt], hi_bit[srt]))

        def probe_count(b: pa.Table) -> pa.Table:
            oks, bits = ray.get(ord_ref)
            lk = b["l_orderkey"].to_numpy(zero_copy_only=False)
            oi, ohit = _probe(oks, lk)
            return _band_partial(b["l_linestatus"],
                                 bits[oi].astype(bool) & ohit, ohit)

        counted = li.map_batches(probe_count, batch_format="pyarrow",
                                 zero_copy_batch=True)
    parts = _pull(counted, {"ship_class": pa.string(),
                            "high_line_count": pa.int64(),
                            "low_line_count": pa.int64()})
    agg: dict[str, list[int]] = {}
    for c, h, l in zip(parts["ship_class"].to_pylist(),
                       parts["high_line_count"].to_pylist(),
                       parts["low_line_count"].to_pylist()):
        cur = agg.setdefault(c, [0, 0])
        cur[0] += h
        cur[1] += l
    classes = sorted(agg)
    return pa.table({
        "ship_class": pa.array(classes, pa.string()),
        "high_line_count": pa.array([agg[c][0] for c in classes],
                                    pa.int64()),
        "low_line_count": pa.array([agg[c][1] for c in classes],
                                   pa.int64()),
    })


def _band_partial(status: pa.ChunkedArray | pa.Array, is_high: np.ndarray,
                  keep: np.ndarray) -> pa.Table:
    """Per-block (class, band) bincount → ≤2·|classes| partial rows."""
    sdf = pd.Series(
        status.to_pandas() if isinstance(status, pa.ChunkedArray)
        else status.to_pandas())
    codes, classes = pd.factorize(sdf, sort=True)
    m = keep.astype(bool)
    if not m.any():
        return pa.table({"ship_class": pa.array([], pa.string()),
                         "high_line_count": pa.array([], pa.int64()),
                         "low_line_count": pa.array([], pa.int64())})
    hi_cnt = np.bincount(codes[m & is_high], minlength=len(classes))
    lo_cnt = np.bincount(codes[m & ~is_high], minlength=len(classes))
    return pa.table({
        "ship_class": pa.array(classes.astype(str), pa.string()),
        "high_line_count": pa.array(hi_cnt.astype(np.int64)),
        "low_line_count": pa.array(lo_cnt.astype(np.int64)),
    })


def _q12_join_fallback(li, orders):
    """Oversized-orders plan for q_priority_line_classes: Dataset.join
    on the orderkey, then the identical per-block bincount partials."""
    j = li.join(orders, join_type="inner", num_partitions=join_parts(),
                on=("l_orderkey",), right_on=("o_orderkey",))

    def band_count(b: pa.Table) -> pa.Table:
        is_high = pc.is_in(b["o_orderpriority"],
                           value_set=pa.array(_HIGH_PRIOS)) \
            .to_numpy(zero_copy_only=False).astype(bool)
        return _band_partial(b["l_linestatus"], is_high,
                             np.ones(b.num_rows, bool))

    return j.map_batches(band_count, batch_format="pyarrow")


SQL_PRIORITY_LINE_CLASSES = """
SELECT l_linestatus AS ship_class,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
"""


TPCH_QUERIES = {
    "local_supplier_volume": (q_local_supplier_volume,
                              SQL_LOCAL_SUPPLIER_VOLUME),
    "nation_trade_volume": (q_nation_trade_volume,
                            SQL_NATION_TRADE_VOLUME),
    "market_share": (q_market_share, SQL_MARKET_SHARE),
    "promo_revenue": (q_promo_revenue, SQL_PROMO_REVENUE),
    "disjunctive_revenue": (q_disjunctive_revenue,
                            SQL_DISJUNCTIVE_REVENUE),
    "returned_item_losses": (q_returned_item_losses,
                             SQL_RETURNED_ITEM_LOSSES),
    "customer_order_histogram": (q_customer_order_histogram,
                                 SQL_CUSTOMER_ORDER_HISTOGRAM),
    "top_revenue_supplier": (q_top_revenue_supplier,
                             SQL_TOP_REVENUE_SUPPLIER),
    "supplier_part_counts": (q_supplier_part_counts,
                             SQL_SUPPLIER_PART_COUNTS),
    "small_qty_revenue": (q_small_qty_revenue, SQL_SMALL_QTY_REVENUE),
    "important_parts": (q_important_parts, SQL_IMPORTANT_PARTS),
    "late_shipment_priority": (q_late_shipment_priority,
                               SQL_LATE_SHIPMENT_PRIORITY),
    "bfs_hops": (q_bfs_hops, SQL_BFS_HOPS),
    "forecast_revenue": (q_forecast_revenue, SQL_FORECAST_REVENUE),
    "nation_profit": (q_nation_profit, SQL_NATION_PROFIT),
    "min_cost_supplier": (q_min_cost_supplier, SQL_MIN_COST_SUPPLIER),
    "dominant_supplier": (q_dominant_supplier, SQL_DOMINANT_SUPPLIER),
    "priority_line_classes": (q_priority_line_classes,
                              SQL_PRIORITY_LINE_CLASSES),
}
