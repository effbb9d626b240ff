"""Windowed / OLAP analytics surface (round 3 widening of SURVEY §2.8–2.9):
window functions (LAG / ROW_NUMBER), ROLLUP hierarchies, pivot
(conditional aggregation), exact-integer correlation statistics,
deterministic hash sampling, and a regex (BPE-ish) tokenizer — each with
a DuckDB oracle — plus a rows-only mergeable approximate-quantile sketch
(tolerance-pinned in tests/test_analytics_ops.py).

Same exact-match discipline as relational.py: every aggregate is summed
as int64 (cents / plain ints) so distributed summation order can never
produce a last-ulp mismatch; float finals are computed with the IDENTICAL
IEEE expression on both sides (each double op is correctly rounded, so
identical operands + identical expression tree = identical bits).

Ray is pre-initialised by the caller — nothing here calls ray.init().
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _sized_read(path, **kw):
    """rd.read_parquet with footer-derived block sizing (see
    sizing.read_blocks) — keeps downstream stages from paying 64-way
    task dispatch on small single-file tables. Directories fall back to
    Ray's own per-file splitting."""
    from .sizing import read_blocks

    if "override_num_blocks" not in kw:
        kw["override_num_blocks"] = read_blocks(path)
    return rd.read_parquet(path, **kw)


def _t(sf_dir: str, table: str, columns=None):
    return _sized_read(os.path.join(sf_dir, f"{table}.parquet"),
                       columns=columns)


def _cents(arr, scale: int = 100) -> pa.Array:
    return pc.round(pc.multiply(arr, pa.scalar(float(scale)))).cast(pa.int64())


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over int64 keys (Steele et al. 2014, public
    domain) — a full-avalanche 64-bit hash for filter probes without an
    int→str→murmur detour (stringifying 600k keys per block dominated
    the cuckoo_semi_join probe, measured)."""
    z = x.view(np.uint64) if x.dtype == np.int64 else x.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z.view(np.int64)


# =====================================================================
# window functions (§2.9): LAG + ROW_NUMBER per partition
# =====================================================================

def q_window_lag(sf_dir: str):
    """Per-customer order sequence: ROW_NUMBER and the microsecond gap
    to the previous order (LAG). Scale shape: one groupby(o_custkey)
    shuffle carrying only 3 small columns; the window itself is a
    vectorized per-group numpy pass (partitioning assumption: one
    customer's orders fit in a worker — the same assumption every
    PARTITION BY engine makes per partition). First row's gap is -1 on
    both sides (avoids nullable-int round-trip ambiguity)."""
    import pyarrow.dataset as pads

    ds = _sized_read(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
        filter=pads.field("o_custkey") < 300,
    )

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        ts = g["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.empty(len(ts), dtype=np.int64)
        gap[0] = -1
        gap[1:] = ts[1:] - ts[:-1]
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].to_numpy(),
            "o_orderkey": g["o_orderkey"].to_numpy(),
            "rn": np.arange(1, len(ts) + 1, dtype=np.int64),
            "gap_us": gap,
        })

    return ds.groupby("o_custkey").map_groups(per_cust, batch_format="pandas")


SQL_WINDOW_LAG = """
SELECT o_custkey, o_orderkey,
  ROW_NUMBER() OVER w AS rn,
  COALESCE(date_diff('microsecond',
                     LAG(o_orderdate) OVER w, o_orderdate), -1) AS gap_us
FROM orders WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# =====================================================================
# ROLLUP (§2.5): hierarchical aggregation
# =====================================================================

def q_rollup_agg(sf_dir: str):
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus): the finest level
    is ONE distributed groupby; the coarser levels re-aggregate the
    already-aggregated table, which is bounded by |priorities| ×
    |statuses| (≤ 15 rows at any data scale) — so the driver-side fold is
    O(groups), never O(rows). Rollup null cells are the literal 'ALL' on
    both sides (COALESCE in the oracle) to keep the hash compare free of
    null-ordering ambiguity."""
    ds = _t(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "priority": b["o_orderpriority"],
            "status": b["o_orderstatus"],
            "price_c": _cents(b["o_totalprice"]),
        })

    base = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["priority", "status"])
        .aggregate(Count(alias_name="n"), Sum("price_c", alias_name="price_c"))
        .take_all()  # bounded: ≤ |priorities|·|statuses| rows
    )
    fine = pd.DataFrame(base)
    lvl1 = (fine.groupby("priority", as_index=False)[["n", "price_c"]].sum()
            .assign(status="ALL"))
    lvl0 = pd.DataFrame({
        "priority": ["ALL"], "status": ["ALL"],
        "n": [fine["n"].sum()], "price_c": [fine["price_c"].sum()],
    })
    out = pd.concat([fine, lvl1, lvl0], ignore_index=True)
    return pa.table({
        "priority": pa.array(out["priority"], type=pa.string()),
        "status": pa.array(out["status"], type=pa.string()),
        "n": pa.array(out["n"].astype(np.int64)),
        "total": pa.array((out["price_c"].astype(np.int64) / 100.0)
                          .astype(np.float64)),
    })


SQL_ROLLUP_AGG = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
  COALESCE(o_orderstatus, 'ALL') AS status,
  COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


# =====================================================================
# pivot (§2.5): conditional aggregation to a wide layout
# =====================================================================

def q_pivot_status(sf_dir: str):
    """Pivot order totals by status into columns: one masked-cents column
    per status inside the SAME map (no extra scans), one groupby — the
    classic SUM(CASE WHEN …) pivot, fully streaming."""
    ds = _t(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])
    statuses = ["F", "O", "P"]

    def prep(b: pa.Table) -> pa.Table:
        cents = _cents(b["o_totalprice"])
        cols = {"priority": b["o_orderpriority"]}
        for s in statuses:
            mask = pc.equal(b["o_orderstatus"], pa.scalar(s))
            cols[f"c_{s}"] = pc.if_else(mask, cents, pa.scalar(0, pa.int64()))
        return pa.table(cols)

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("priority")
        .aggregate(*[Sum(f"c_{s}", alias_name=f"c_{s}") for s in statuses])
    )
    return agg.map_batches(
        lambda b: pa.table({
            "priority": b["priority"],
            **{f"total_{s.lower()}": pc.divide(b[f"c_{s}"].cast(pa.float64()),
                                               pa.scalar(100.0))
               for s in statuses},
        }),
        batch_format="pyarrow",
    )


SQL_PIVOT_STATUS = """
SELECT o_orderpriority AS priority,
  CAST(SUM(CASE WHEN o_orderstatus='F' THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END) AS DOUBLE)/100.0 AS total_f,
  CAST(SUM(CASE WHEN o_orderstatus='O' THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END) AS DOUBLE)/100.0 AS total_o,
  CAST(SUM(CASE WHEN o_orderstatus='P' THEN CAST(ROUND(o_totalprice*100) AS BIGINT) ELSE 0 END) AS DOUBLE)/100.0 AS total_p
FROM orders GROUP BY o_orderpriority
"""


# =====================================================================
# correlation / covariance (§2.5 statistical aggregates)
# =====================================================================

def q_corr_stats(sf_dir: str):
    """Pearson correlation + population covariance of (quantity, price)
    per returnflag from EXACT integer moment sums (n, Σx, Σy, Σx², Σxy,
    Σy² as int64 — x=rounded qty ≤ 50, y=rounded dollars ≤ ~10⁶, so Σy²
    stays < 2⁵³ through sf≈10; the partial+final pattern G4 demands). The
    float finale uses the identical expression tree on both sides, so
    correctly-rounded IEEE ops give bit-equal results with no rounding
    fudge."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        # half_towards_infinity = DuckDB ROUND's half-away-from-zero on
        # positive values; Arrow's default half_to_even would diverge on
        # exact .5-dollar prices (cents never hit halves, dollars do)
        x = pc.round(b["l_quantity"],
                     round_mode="half_towards_infinity").cast(pa.int64())
        y = pc.round(b["l_extendedprice"],
                     round_mode="half_towards_infinity").cast(pa.int64())
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "x": x, "y": y,
            "xx": pc.multiply(x, x), "xy": pc.multiply(x, y),
            "yy": pc.multiply(y, y),
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"), Sum("y", alias_name="sy"),
            Sum("xx", alias_name="sxx"), Sum("xy", alias_name="sxy"),
            Sum("yy", alias_name="syy"),
        )
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = b["n"].cast(pa.float64()).to_numpy()
        sx = b["sx"].cast(pa.float64()).to_numpy()
        sy = b["sy"].cast(pa.float64()).to_numpy()
        sxx = b["sxx"].cast(pa.float64()).to_numpy()
        sxy = b["sxy"].cast(pa.float64()).to_numpy()
        syy = b["syy"].cast(pa.float64()).to_numpy()
        mx, my = sx / n, sy / n
        cov = sxy / n - mx * my
        vx = sxx / n - mx * mx
        vy = syy / n - my * my
        corr = cov / np.sqrt(vx * vy)
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "n": b["n"],
            "cov_qty_price": pa.array(cov),
            "corr_qty_price": pa.array(corr),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_CORR_STATS = """
WITH m AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS n_i,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE) AS sx,
    CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)) AS DOUBLE) AS sy,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT) * CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT) * CAST(ROUND(l_extendedprice) AS BIGINT)) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT) * CAST(ROUND(l_extendedprice) AS BIGINT)) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n_i AS n,
  (sxy/n - (sx/n)*(sy/n)) AS cov_qty_price,
  (sxy/n - (sx/n)*(sy/n)) /
    sqrt((sxx/n - (sx/n)*(sx/n)) * (syy/n - (sy/n)*(sy/n))) AS corr_qty_price
FROM m
"""


# =====================================================================
# deterministic hash sampling (O4 with an EXACT oracle)
# =====================================================================

def q_hash_sample(sf_dir: str):
    """1-in-8 deterministic sample of documents by a Knuth multiplicative
    hash of doc_id — unlike random sampling this is reproducible,
    partition-independent, AND exactly SQL-expressible, so it is the
    oracled counterpart of qa_sample (whose membership is block-dependent
    by design). At 100 TB this is the sampling you actually want: any
    worker can decide membership locally with no coordination or RNG
    state."""
    ds = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def pick(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (did * np.uint64(2654435761)) % np.uint64(1 << 32)
        return b.filter(pa.array(h % np.uint64(8) == np.uint64(3)))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


SQL_HASH_SAMPLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE ((doc_id * 2654435761) % 4294967296) % 8 = 3
"""


# =====================================================================
# BPE-ish regex tokenizer (training-data op, oracled)
# =====================================================================

_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def q_regex_tokens(sf_dir: str):
    """Token counting with a BPE-ish segmentation regex (letter runs |
    single digits | lone punctuation — the GPT-2 pre-tokenizer family),
    counted by Arrow's RE2 kernel per block and aggregated per source.
    DuckDB also uses RE2, so len(regexp_extract_all(...)) is an exact
    oracle for the same pattern. Complements token_count (whitespace
    tokens)."""
    ds = _t(sf_dir, "documents", ["source", "text"])

    def count(b: pa.Table) -> pa.Table:
        return pa.table({
            "source": b["source"],
            "n_tok": pc.count_substring_regex(b["text"], _TOKEN_RE)
                       .cast(pa.int64()),
        })

    agg = (
        ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"), Sum("n_tok", alias_name="sum_tokens"))
    )
    return agg


SQL_REGEX_TOKENS = f"""
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(len(regexp_extract_all(text, '{_TOKEN_RE}'))) AS BIGINT) AS sum_tokens
FROM documents GROUP BY source
"""


# =====================================================================
# ordered list / string aggregation (§2.5 array-agg family)
# =====================================================================

def q_string_agg_topn(sf_dir: str):
    """Per-nation ordered string_agg of the top-3 customers by balance:
    per-block partial top-3 prunes the shuffle (same trick as
    topk_per_group), the per-group final sorts and joins — the ordered
    list-aggregation family with a deterministic tie-break."""
    ds = _t(sf_dir, "customer", ["c_nationkey", "c_name", "c_acctbal",
                                 "c_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["c_nationkey", "c_acctbal", "c_custkey"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("c_nationkey", sort=False).head(3)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_acctbal", "c_custkey"],
                          ascending=[False, True], kind="mergesort").head(3)
        return pd.DataFrame({
            "c_nationkey": [int(g["c_nationkey"].iloc[0])],
            "top3": [",".join(g["c_name"])],
        })

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("c_nationkey")
        .map_groups(final, batch_format="pandas")
    )


SQL_STRING_AGG_TOPN = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
  string_agg(c_name, ',' ORDER BY c_acctbal DESC, c_custkey) AS top3
FROM (
  SELECT c_nationkey, c_name, c_acctbal, c_custkey,
    ROW_NUMBER() OVER (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 3 GROUP BY c_nationkey
"""


# =====================================================================
# approximate quantiles (mergeable sketch — the scale path where exact
# distributed quantiles' O(distinct-values-per-group) final merge breaks)
# =====================================================================

_AQ_CENTROIDS = 512  # sketch size; rank error ≤ total_weight/_AQ_CENTROIDS


def _aq_compress(vals: np.ndarray, wts: np.ndarray, c: int = _AQ_CENTROIDS):
    """Compress (sorted values, weights) to ≤ c equal-weight centroids —
    a t-digest-lite with uniform buckets: deterministic, mergeable, and
    rank error bounded by W/c per quantile. Vectorized (bincount)."""
    if len(vals) <= c:
        return vals, wts
    total = float(wts.sum())
    cum = np.cumsum(wts) - wts / 2.0
    idx = np.minimum((cum * (c / total)).astype(np.int64), c - 1)
    wsum = np.bincount(idx, weights=wts, minlength=c)
    vsum = np.bincount(idx, weights=vals * wts, minlength=c)
    keep = wsum > 0
    return vsum[keep] / wsum[keep], wsum[keep]


def q_approx_quantiles(sf_dir: str, qs=(0.5, 0.9, 0.99)):
    """Per-returnflag approximate quantiles of l_extendedprice via the
    partial+final mergeable-sketch pattern (G4): every block compresses
    its values to ≤512 weighted centroids (so the groupby shuffle carries
    O(blocks·512) rows, never the data), the final map_groups merges the
    centroid sets and interpolates the quantiles. Rows-only entry — the
    companion exact operator is q_quantiles; the tolerance is pinned by
    tests/test_scale_shapes.py."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        flags_out, vals_out, wts_out = [], [], []
        flags = b["l_returnflag"].to_numpy(zero_copy_only=False)
        prices = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        for f in np.unique(flags):
            v = np.sort(prices[flags == f], kind="mergesort")
            cv, cw = _aq_compress(v, np.ones(len(v)))
            flags_out.append(np.full(len(cv), f))
            vals_out.append(cv)
            wts_out.append(cw)
        return pa.table({
            "l_returnflag": pa.array(np.concatenate(flags_out)),
            "centroid": pa.array(np.concatenate(vals_out)),
            "weight": pa.array(np.concatenate(wts_out)),
        })

    def final(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["centroid"].to_numpy(), kind="mergesort")
        v = g["centroid"].to_numpy()[order]
        w = g["weight"].to_numpy()[order]
        v, w = _aq_compress(v, w)
        cum = np.cumsum(w) - w / 2.0
        total = float(w.sum())
        est = np.interp([q * total for q in qs], cum, v)
        row = {"l_returnflag": [g["l_returnflag"].iloc[0]]}
        for q, e in zip(qs, est):
            row[f"p{int(q * 100)}"] = [float(e)]
        return pd.DataFrame(row)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .map_groups(final, batch_format="pandas")
    )


# =====================================================================
# LEFT OUTER join (J5 family: preserve-unmatched side)
# =====================================================================

def q_left_join(sf_dir: str):
    """Customers LEFT JOIN their urgent-order aggregate: the right side
    is pre-shrunk by ONE groupby (o_custkey → count + cents sum, bounded
    by |customers| regardless of order volume) before the single
    left-outer hash join, so the join's right side never scales with
    fact-table rows — the aggregate-then-outer-join shape. Unmatched
    customers surface with n_urgent=0 / spend=0.0 (COALESCE on both
    sides keeps the hash compare free of null ambiguity). The
    customer-key predicate is PUSHED THROUGH the join into the orders
    read (a LEFT join keeps only left keys, so filtering the right
    side to the same range is semantics-preserving) — row-group
    pruning then drops most of the fact scan."""
    import pyarrow.dataset as pads

    from .sizing import join_parts

    cust = _sized_read(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
        filter=pads.field("c_custkey") < 400,
    )
    orders = _sized_read(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
        filter=pads.field("o_custkey") < 400,
    )

    def prep(b: pa.Table) -> pa.Table:
        m = pc.equal(b["o_orderpriority"], pa.scalar("1-URGENT"))
        b = b.filter(m)
        return pa.table({
            "o_custkey": b["o_custkey"],
            "price_c": _cents(b["o_totalprice"]),
        })

    agg = (
        orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_urgent"), Sum("price_c", alias_name="spend_c"))
    )
    j = cust.join(agg, join_type="left_outer", num_partitions=join_parts(),
                  on=("c_custkey",), right_on=("o_custkey",))

    def finalize(b: pa.Table) -> pa.Table:
        zero = pa.scalar(0, pa.int64())
        n = pc.coalesce(b["n_urgent"], zero)
        s = pc.coalesce(b["spend_c"], zero)
        return pa.table({
            "c_custkey": b["c_custkey"],
            "c_name": b["c_name"],
            "n_urgent": n,
            "urgent_spend": pc.divide(s.cast(pa.float64()), pa.scalar(100.0)),
        })

    return j.map_batches(finalize, batch_format="pyarrow")


SQL_LEFT_JOIN = """
SELECT c_custkey, c_name,
  COALESCE(a.n_urgent, 0) AS n_urgent,
  CAST(COALESCE(a.spend_c, 0) AS DOUBLE)/100.0 AS urgent_spend
FROM customer LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_urgent,
    SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS spend_c
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
) a ON c_custkey = a.o_custkey
WHERE c_custkey < 400
"""


# =====================================================================
# FULL OUTER join (J5 family: preserve both unmatched sides)
# =====================================================================

def q_full_join(sf_dir: str):
    """Urgent-order counts (custkey < 200) FULL OUTER JOIN low-priority
    counts (100 ≤ custkey < 300): the key ranges only half-overlap, so
    left-only, right-only, and matched rows all genuinely occur. Plan:
    ONE fact scan emits side-tagged per-block partial counts for both
    predicates, ONE (side,key) groupby folds them, the bounded result
    (≤2·|customers| skinny int rows) is materialized once and split by
    side with two cheap filters feeding the full-outer hash join — one
    scan and one exchange where the naive plan pays two of each
    (measured 6.5 s → this shape at sf0.1/32cpus). Keys are coalesced
    into one output column and counts null-filled on both sides —
    completing the inner/left/full join-type surface."""
    from .sizing import join_parts

    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def prep(b: pa.Table) -> pa.Table:
        # ONE scan emits per-block partial counts for BOTH sides,
        # side-tagged — (side, key, n) skinny rows, ≤ 2·|block keys|.
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        prio = b["o_orderpriority"]
        sides, keys, ns = [], [], []
        for side, (p, lo, hi) in enumerate(
                (("1-URGENT", 0, 200), ("5-LOW", 100, 300))):
            m = (pc.equal(prio, pa.scalar(p)).to_numpy(zero_copy_only=False)
                 & (ck >= lo) & (ck < hi))
            u, c = np.unique(ck[m], return_counts=True)
            sides.append(np.full(len(u), side, np.int64))
            keys.append(u)
            ns.append(c.astype(np.int64))
        return pa.table({"side": pa.array(np.concatenate(sides)),
                         "key": pa.array(np.concatenate(keys)),
                         "n": pa.array(np.concatenate(ns))})

    agg = (orders.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby(["side", "key"]).aggregate(Sum("n", alias_name="cnt"))
           .materialize())  # bounded: ≤ 2·|customers| skinny int rows

    def pick(side: int, key: str, cnt: str):
        def f(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b["side"], pa.scalar(side)))
            return pa.table({key: b["key"], cnt: b["cnt"]})
        return f

    a = agg.map_batches(pick(0, "ka", "n_urgent"), batch_format="pyarrow")
    b = agg.map_batches(pick(1, "kb", "n_low"), batch_format="pyarrow")
    j = a.join(b, join_type="full_outer", num_partitions=join_parts(),
               on=("ka",), right_on=("kb",))

    def finalize(t: pa.Table) -> pa.Table:
        # Ray's full_outer join coalesces the key into the LEFT key
        # column (verified: right-only rows carry ka, zero nulls)
        zero = pa.scalar(0, pa.int64())
        return pa.table({
            "custkey": t["ka"],
            "n_urgent": pc.coalesce(t["n_urgent"], zero),
            "n_low": pc.coalesce(t["n_low"], zero),
        })

    return j.map_batches(finalize, batch_format="pyarrow")


SQL_FULL_JOIN = """
SELECT COALESCE(a.ka, b.kb) AS custkey,
  COALESCE(a.n_urgent, 0) AS n_urgent,
  COALESCE(b.n_low, 0) AS n_low
FROM (
  SELECT o_custkey AS ka, COUNT(*) AS n_urgent FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_custkey < 200
  GROUP BY o_custkey
) a FULL JOIN (
  SELECT o_custkey AS kb, COUNT(*) AS n_low FROM orders
  WHERE o_orderpriority = '5-LOW' AND o_custkey >= 100 AND o_custkey < 300
  GROUP BY o_custkey
) b ON a.ka = b.kb
"""


# =====================================================================
# window frame aggregate (§2.9): moving average, ROWS 2 PRECEDING
# =====================================================================

def q_moving_avg(sf_dir: str):
    """Per-customer 3-order moving average of order totals (the framed
    window-aggregate family: ROWS BETWEEN 2 PRECEDING AND CURRENT ROW).
    Same scale shape as q_window_lag: one groupby shuffle of 3 small
    columns, then a vectorized prefix-sum pass per partition. Exactness:
    the frame sum is int64 cents; the single float division
    sum/(n_frame*100) uses the identical expression on both sides."""
    import pyarrow.dataset as pads

    ds = _sized_read(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
        filter=pads.field("o_custkey") < 300,
    )

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        c = np.round(g["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        s = np.cumsum(c)
        win = s.copy()
        win[3:] = s[3:] - s[:-3]
        n_frame = np.minimum(np.arange(1, len(c) + 1, dtype=np.int64), 3)
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].to_numpy(),
            "o_orderkey": g["o_orderkey"].to_numpy(),
            "mavg": win.astype(np.float64) / (n_frame * 100),
        })

    return ds.groupby("o_custkey").map_groups(per_cust, batch_format="pandas")


SQL_MOVING_AVG = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER w AS DOUBLE)
    / (COUNT(*) OVER w * 100) AS mavg
FROM orders WHERE o_custkey < 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# =====================================================================
# ranking window functions (§2.9): NTILE + PERCENT_RANK
# =====================================================================

def q_window_rank(sf_dir: str):
    """NTILE(4) quartiles and PERCENT_RANK per market segment over
    account balance (ORDER BY c_acctbal DESC, c_custkey — fully
    deterministic, no rank ties). NTILE follows the SQL spec: the first
    n % k buckets get one extra row. percent_rank = (rn-1)/(n-1) as one
    float division (0.0 for a single-row partition, per spec)."""
    import pyarrow.dataset as pads

    ds = _sized_read(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_mktsegment", "c_custkey", "c_acctbal"],
        filter=pads.field("c_custkey") < 500,
    )

    def per_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_acctbal", "c_custkey"],
                          ascending=[False, True], kind="mergesort")
        n = len(g)
        rn = np.arange(1, n + 1, dtype=np.int64)
        q, r = divmod(n, 4)
        boundary = (q + 1) * r
        tile = np.where(
            rn <= boundary,
            (rn - 1) // (q + 1) + 1,
            r + (rn - boundary - 1) // max(q, 1) + 1,
        ).astype(np.int64)
        pr = ((rn - 1).astype(np.float64) / (n - 1)
              if n > 1 else np.zeros(1, dtype=np.float64))
        return pd.DataFrame({
            "c_mktsegment": g["c_mktsegment"].to_numpy(),
            "c_custkey": g["c_custkey"].to_numpy(),
            "quartile": tile,
            "pct_rank": pr,
        })

    return ds.groupby("c_mktsegment").map_groups(per_seg, batch_format="pandas")


SQL_WINDOW_RANK = """
SELECT c_mktsegment, c_custkey,
  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
  PERCENT_RANK() OVER w AS pct_rank
FROM customer WHERE c_custkey < 500
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
"""


# =====================================================================
# CUBE (§2.5): all grouping-set combinations
# =====================================================================

def q_cube_agg(sf_dir: str):
    """GROUP BY CUBE(o_orderpriority, o_orderstatus): one distributed
    groupby computes the finest level; the other three grouping sets
    re-aggregate that bounded table (≤ |priorities|·|statuses| rows at
    any data scale) on the driver — the same O(groups) fold as ROLLUP
    plus the (ALL, status) set."""
    ds = _t(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "priority": b["o_orderpriority"],
            "status": b["o_orderstatus"],
            "price_c": _cents(b["o_totalprice"]),
        })

    base = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["priority", "status"])
        .aggregate(Count(alias_name="n"), Sum("price_c", alias_name="price_c"))
        .take_all()  # bounded: ≤ |priorities|·|statuses| rows
    )
    fine = pd.DataFrame(base)
    by_p = (fine.groupby("priority", as_index=False)[["n", "price_c"]].sum()
            .assign(status="ALL"))
    by_s = (fine.groupby("status", as_index=False)[["n", "price_c"]].sum()
            .assign(priority="ALL"))
    grand = pd.DataFrame({
        "priority": ["ALL"], "status": ["ALL"],
        "n": [fine["n"].sum()], "price_c": [fine["price_c"].sum()],
    })
    out = pd.concat([fine, by_p, by_s, grand], ignore_index=True)
    return pa.table({
        "priority": pa.array(out["priority"], type=pa.string()),
        "status": pa.array(out["status"], type=pa.string()),
        "n": pa.array(out["n"].astype(np.int64)),
        "total": pa.array((out["price_c"].astype(np.int64) / 100.0)
                          .astype(np.float64)),
    })


SQL_CUBE_AGG = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
  COALESCE(o_orderstatus, 'ALL') AS status,
  COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total
FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


# =====================================================================
# scalar-subquery filter (§2.4): compare every row to a global aggregate
# =====================================================================

def q_above_avg(sf_dir: str):
    """Parts priced strictly above the global average retail price — the
    scalar-subquery pattern (TPC-H Q17 family). Two streaming passes:
    pass 1 reduces to ONE (sum_cents, count) row; pass 2 filters with the
    EXACT integer cross-multiplication price_c · n > sum_c, so no float
    average ever exists to disagree about. The scalar broadcast is two
    int64s — free at any cluster size."""
    cols = ["p_partkey", "p_name", "p_retailprice"]
    stats = (
        _t(sf_dir, "part", ["p_retailprice"])
        .map_batches(
            lambda b: pa.table({"price_c": _cents(b["p_retailprice"])}),
            batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Count(alias_name="n"), Sum("price_c", alias_name="sum_c"))
    )
    n_total = int(stats["n"])
    sum_c = int(stats["sum_c"])

    def pick(b: pa.Table) -> pa.Table:
        price_c = _cents(b["p_retailprice"])
        keep = pc.greater(pc.multiply(price_c, pa.scalar(n_total, pa.int64())),
                          pa.scalar(sum_c, pa.int64()))
        return b.filter(keep)

    return _t(sf_dir, "part", cols).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True)


SQL_ABOVE_AVG = """
SELECT p_partkey, p_name, p_retailprice FROM part
WHERE CAST(ROUND(p_retailprice*100) AS BIGINT)
      * (SELECT COUNT(*) FROM part)
    > (SELECT SUM(CAST(ROUND(p_retailprice*100) AS BIGINT)) FROM part)
"""


# =====================================================================
# hopping (sliding) window (§2.9): overlapping event-time windows
# =====================================================================

def q_hopping_window(sf_dir: str):
    """2-hour windows hopping every hour: each event lands in exactly
    two windows (starts floor(ts,1h) and floor(ts,1h)−1h), emitted by
    ONE vectorized map that duplicates rows into their window
    assignments before a single groupby — the fan-out-then-aggregate
    shape every overlapping-window engine uses; the shuffle carries
    (type, window_start, cents), never the event payload."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])
    hour = pa.scalar(3_600_000_000, pa.duration("us"))

    def fan_out(b: pa.Table) -> pa.Table:
        def arr(x):
            return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

        w0 = arr(pc.floor_temporal(b["ts"], unit="hour"))
        w1 = arr(pc.subtract(w0, hour))
        cents = arr(_cents(b["value"], 10000))
        et = arr(b["event_type"])
        return pa.table({
            "event_type": pa.concat_arrays([et, et]),
            "w": pa.concat_arrays([w0, w1]),
            "value_c": pa.concat_arrays([cents, cents]),
        })

    agg = (
        ds.map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "w"])
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="value_c"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"], "w": b["w"], "n": b["n"],
            "sum_value": pc.divide(b["value_c"].cast(pa.float64()),
                                   pa.scalar(10000.0)),
        }),
        batch_format="pyarrow",
    )


SQL_HOPPING_WINDOW = """
SELECT event_type, w, COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(value*10000) AS BIGINT)) AS DOUBLE)/10000.0 AS sum_value
FROM (
  SELECT event_type, value,
    unnest([date_trunc('hour', ts),
            date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS w
  FROM events)
GROUP BY event_type, w
"""


# =====================================================================
# cumulative window aggregate (§2.9): running total per partition
# =====================================================================

def q_running_total(sf_dir: str):
    """Per-customer running spend (SUM ... ROWS UNBOUNDED PRECEDING):
    one groupby(o_custkey) shuffle carrying 3 small columns, then a
    vectorized cumsum over int cents per group — the cumulative-frame
    sibling of q_moving_avg's bounded frame. The division to float
    happens once per row on identical int64 operands, so the hash
    compare is exact."""
    import pyarrow.dataset as pads

    ds = _sized_read(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
        filter=pads.field("o_custkey") < 300,
    )

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        cents = np.round(g["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        run = np.cumsum(cents)
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].to_numpy(),
            "o_orderkey": g["o_orderkey"].to_numpy(),
            "running_spend": run.astype(np.float64) / 100.0,
        })

    return ds.groupby("o_custkey").map_groups(per_cust, batch_format="pandas")


SQL_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DOUBLE)/100.0 AS running_spend
FROM orders WHERE o_custkey < 300
"""


# =====================================================================
# arg-extreme aggregation (§2.5): the row that holds the group maximum
# =====================================================================

def q_arg_extremes(sf_dir: str):
    """Per nation: the customer holding the MAX balance (arg_max with a
    deterministic min-custkey tie-break). Distributed shape: every block
    reduces to ≤ |nations| candidate rows (per-block partial arg-max),
    so the groupby shuffle carries O(blocks·25) rows regardless of
    customer count; the final pick re-applies the same ordering. The
    balance column is compared only (never recomputed), so floats pass
    through bit-exact."""
    ds = _t(sf_dir, "customer",
            ["c_nationkey", "c_custkey", "c_name", "c_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["c_nationkey", "c_acctbal", "c_custkey"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("c_nationkey", sort=False).head(1)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_acctbal", "c_custkey"],
                          ascending=[False, True], kind="mergesort").head(1)
        return pd.DataFrame({
            "c_nationkey": [int(g["c_nationkey"].iloc[0])],
            "top_name": [g["c_name"].iloc[0]],
            "top_bal": [float(g["c_acctbal"].iloc[0])],
        })

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("c_nationkey")
        .map_groups(final, batch_format="pandas")
    )


SQL_ARG_EXTREMES = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
  c_name AS top_name, c_acctbal AS top_bal
FROM (
  SELECT c_nationkey, c_name, c_acctbal,
    ROW_NUMBER() OVER (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn = 1
"""


# =====================================================================
# percent-of-total (§2.5): group share of a global aggregate
# =====================================================================

def q_pct_of_total(sf_dir: str):
    """Revenue share per returnflag: ONE distributed groupby produces
    the per-flag cent sums (≤ |flags| rows); the global total is the sum
    of those group sums (O(groups) on the driver, same discipline as
    rollup/cube), and the share is a single float division on identical
    int64 operands on both sides — the broadcast-the-scalar window
    pattern (SUM() OVER ()) without a second pass over the data."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "rev_c": _cents(b["l_extendedprice"]),
        })

    rows = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(Sum("rev_c", alias_name="rev_c"))
        .take_all()  # bounded: one row per returnflag
    )
    total = sum(r["rev_c"] for r in rows)
    return pa.table({
        "l_returnflag": pa.array([r["l_returnflag"] for r in rows],
                                 type=pa.string()),
        "revenue": pa.array([r["rev_c"] / 100.0 for r in rows],
                            type=pa.float64()),
        "share": pa.array([r["rev_c"] / total for r in rows],
                          type=pa.float64()),
    })


SQL_PCT_OF_TOTAL = """
WITH g AS (
  SELECT l_returnflag,
    SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS rev_c
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag,
  CAST(rev_c AS DOUBLE)/100.0 AS revenue,
  CAST(rev_c AS DOUBLE) / CAST((SELECT SUM(rev_c) FROM g) AS DOUBLE) AS share
FROM g
"""


# =====================================================================
# multiway join (J5): TPC-H Q3-shaped shipping-priority top-k
# =====================================================================

def q_shipping_priority(sf_dir: str):
    """customer ⨝ orders ⨝ lineitem with date predicates and a top-10 by
    revenue (TPC-H Q3 shape). Scale plan: (1) lineitem pre-aggregates to
    (l_orderkey, rev_c4) behind its shipdate filter — the ONE
    fact-sized shuffle routes fused (okey, cents) rows to hash
    partitions folded with np.bincount (an orderkey Aggregate pays
    ~100k-group machinery for the same result); (2) the BUILDING
    customer keys are a broadcast semi-filter on orders (no shuffle);
    (3) the filtered orders side is DIMENSION-sized — when it fits the
    broadcast guard the revenue table streams against it with no join
    exchange at all, else a hash join; (4) top-10 is per-block partial
    top-k + an O(10·blocks) driver merge — no global sort. Ties broken
    by o_orderkey on both sides."""
    import ray
    import pyarrow.dataset as pads

    from .sizing import fold_parts, join_parts

    n_parts = fold_parts()

    li = _sized_read(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pads.field("l_shipdate") > np.datetime64("1995-03-15", "us"),
    )

    def rev(b: pa.Table) -> pa.Table:
        r = pc.multiply(b["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), b["l_discount"]))
        okey = b["l_orderkey"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            kp = ((okey.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "rev_c4": _cents(r, 10000),
                         "kp": pa.array(kp)})

    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        okey = g["l_orderkey"].to_numpy()
        uk, inv = np.unique(okey, return_inverse=True)
        # float64 bincount of int cents is EXACT here: per-order revenue
        # ≪ 2^53 in 1e-4-dollar units
        return pd.DataFrame({
            "l_orderkey": uk,
            "rev_c4": np.bincount(inv, weights=g["rev_c4"].to_numpy())
                        .astype(np.int64),
        })

    li_agg = (
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kp")
        .map_groups(fold_part, batch_format="pandas")
    )

    cust = _sized_read(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"],
        filter=pads.field("c_mktsegment") == "BUILDING",
    )
    from .relational import _BROADCAST_KEY_LIMIT

    if cust.count() > _BROADCAST_KEY_LIMIT:
        # oversized segment: real semi join instead of a broadcast set
        orders = _sized_read(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
            filter=pads.field("o_orderdate") < np.datetime64("1995-03-15", "us"),
        ).join(cust, join_type="inner", num_partitions=join_parts(),
               on=("o_custkey",), right_on=("c_custkey",)) \
         .select_columns(["o_orderkey", "o_orderdate"])
        return _ship_prio_topk(li_agg, orders)
    keys = np.sort(np.concatenate(
        [b["c_custkey"].to_numpy(zero_copy_only=False)
         for b in cust.iter_batches(batch_size=65536,
                                    batch_format="pyarrow")]
        or [np.empty(0, np.int64)]).astype(np.int64))
    keys_ref = ray.put(keys)

    orders = _sized_read(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pads.field("o_orderdate") < np.datetime64("1995-03-15", "us"),
    )

    def semi(b: pa.Table) -> pa.Table:
        import ray as _r

        ks = _r.get(keys_ref)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, ck)
        idx[idx >= len(ks)] = 0
        hit = ks[idx] == ck if len(ks) else np.zeros(len(ck), bool)
        return b.filter(pa.array(hit)).select(["o_orderkey", "o_orderdate"])

    orders = orders.map_batches(semi, batch_format="pyarrow")
    return _ship_prio_topk(li_agg, orders)


_SHIP_BROADCAST_MAX_ORDERS = 2_000_000


def _ship_prio_topk(li_agg, orders) -> pa.Table:
    """Shared tail of q_shipping_priority's broadcast and join paths.
    The date+segment-filtered orders side is dimension-sized: when it
    fits ``_SHIP_BROADCAST_MAX_ORDERS`` it is broadcast once (two
    arrays) and the revenue table streams against it with NO join
    exchange; past the guard, a hash join. Then per-block partial
    top-10 + O(10·blocks) driver merge."""
    import ray

    from .sizing import join_parts

    orders = orders.materialize()
    if orders.count() <= _SHIP_BROADCAST_MAX_ORDERS:
        ok_c, od_c = [], []
        for b in orders.iter_batches(batch_size=262144,
                                     batch_format="pyarrow"):
            ok_c.append(b["o_orderkey"].to_numpy(zero_copy_only=False))
            od_c.append(b["o_orderdate"].to_numpy(zero_copy_only=False)
                        .astype("datetime64[us]").astype(np.int64))
        okeys = np.concatenate(ok_c or [np.empty(0, np.int64)]).astype(np.int64)
        odates = np.concatenate(od_c or [np.empty(0, np.int64)])
        order = np.argsort(okeys)
        lut_ref = ray.put((okeys[order], odates[order]))

        def lookup(b: pa.Table) -> pa.Table:
            import ray as _r

            ks, ds_ = _r.get(lut_ref)
            lk = b["l_orderkey"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(ks, lk)
            idx[idx >= len(ks)] = 0
            hit = (ks[idx] == lk) if len(ks) else np.zeros(len(lk), bool)
            return pa.table({
                "l_orderkey": pa.array(lk[hit]),
                "rev_c4": pa.array(
                    b["rev_c4"].to_numpy(zero_copy_only=False)[hit]),
                "o_orderdate": pa.array(ds_[idx[hit]]
                                        .astype("datetime64[us]")),
            })

        j = li_agg.map_batches(lookup, batch_format="pyarrow")
    else:
        j = li_agg.join(orders, join_type="inner",
                        num_partitions=join_parts(),
                        on=("l_orderkey",), right_on=("o_orderkey",))

    def partial_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["rev_c4", "l_orderkey"],
                              ascending=[False, True], kind="mergesort").head(10)

    merged = pd.concat(
        [b for b in j.map_batches(partial_top, batch_format="pandas")
                     .iter_batches(batch_format="pandas")],
        ignore_index=True,
    ).sort_values(["rev_c4", "l_orderkey"],
                  ascending=[False, True], kind="mergesort").head(10)
    return pa.table({
        "l_orderkey": pa.array(merged["l_orderkey"].to_numpy()),
        "revenue": pa.array(merged["rev_c4"].to_numpy().astype(np.float64)
                            / 10000.0),
        "o_orderdate": pa.array(
            merged["o_orderdate"].to_numpy().astype("datetime64[us]")),
    })


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey,
  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT))
       AS DOUBLE)/10000.0 AS revenue,
  o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) DESC,
         l_orderkey
LIMIT 10
"""


# =====================================================================
# range (non-equi) join (J6 family): value-band lookup
# =====================================================================

_BANDS = [(0, 0.0, 50.0), (1, 50.0, 150.0), (2, 150.0, 300.0),
          (3, 300.0, 1000.0)]


def q_range_join(sf_dir: str):
    """events ⨝ bands ON value ∈ [lo, hi) — a genuine non-equi range
    join executed as the broadcast-small-side plan every engine picks
    when one side is an interval dimension: the band edges ship once
    (they are constants here; `ray.put` once for a real dimension
    table), each block does ONE vectorized searchsorted, and the only
    shuffle is the final bounded groupby. Half-open bands mirror the SQL
    `>= lo AND < hi` predicate exactly."""
    ds = _t(sf_dir, "events", ["event_type", "value"])
    edges = np.array([b[1] for b in _BANDS] + [_BANDS[-1][2]])

    def tag(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        band = np.searchsorted(edges, v, side="right").astype(np.int64) - 1
        ok = (band >= 0) & (band < len(_BANDS)) & (v < edges[-1])
        return pa.table({
            "band_id": pa.array(band[ok]),
            "event_type": pc.array_filter(b["event_type"], pa.array(ok)),
            "value_c": pc.array_filter(_cents(b["value"]), pa.array(ok)),
        })

    agg = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band_id", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="value_c"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "band_id": b["band_id"], "event_type": b["event_type"],
            "n": b["n"],
            "sum_value": pc.divide(b["value_c"].cast(pa.float64()),
                                   pa.scalar(100.0)),
        }),
        batch_format="pyarrow",
    )


SQL_RANGE_JOIN = f"""
WITH bands(band_id, lo, hi) AS (VALUES
  {", ".join(f"({i}, {lo}, {hi})" for i, lo, hi in _BANDS)})
SELECT CAST(band_id AS BIGINT) AS band_id, event_type, COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band_id, event_type
"""


# =====================================================================
# stratified sampling (O4): exactly k rows per group, deterministic
# =====================================================================

def q_stratified_sample(sf_dir: str):
    """Exactly 5 events per event_type, picked by ascending Knuth
    multiplicative hash of event_id — a coordination-free stratified
    sample: any worker ranks its own rows locally (per-block partial
    top-5 per group prunes the shuffle to O(blocks·types·5) rows), the
    per-group final re-ranks, and the whole selection is exactly
    SQL-expressible so the oracle is exact, unlike RNG sampling."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def with_hash(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["event_id"].to_numpy().astype(np.uint64)
             * np.uint64(2654435761)) % np.uint64(1 << 32)
        df = df.assign(h=h.astype(np.int64))
        df = df.sort_values(["event_type", "h", "event_id"], kind="mergesort")
        return df.groupby("event_type", sort=False).head(5)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "event_id"], kind="mergesort").head(5)
        return g[["event_type", "event_id", "value"]]

    return (
        ds.map_batches(with_hash, batch_format="pandas")
        .groupby("event_type")
        .map_groups(final, batch_format="pandas")
    )


SQL_STRATIFIED_SAMPLE = """
SELECT event_type, event_id, value FROM (
  SELECT event_type, event_id, value,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY (event_id * 2654435761) % 4294967296,
                                event_id) AS rn
  FROM events
) WHERE rn <= 5
"""


# =====================================================================
# sketch-accelerated semi join (J5 × G5): cuckoo pre-filter + verify
# =====================================================================

def q_cuckoo_semi_join(sf_dir: str):
    """lineitem ⋉ part(p_brand='Brand#2') with the engine's own cuckoo
    filter (state/cuckoo.py — the north rule's seen-set sketch) as a
    broadcast pre-filter: the dim side builds one filter + sorted key
    array, ships them once via ray.put, and every fact block drops
    non-candidates with a vectorized membership probe BEFORE the exact
    searchsorted verify — the bloom-join pattern that keeps a 100-TB
    fact scan from shuffling rows that can never match. False positives
    are removed by the verify, so the result is exact (and oracled)."""
    import ray

    from crawlray.state.cuckoo import CuckooFilter

    import pyarrow.dataset as pads

    dim = _sized_read(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"],
        filter=pads.field("p_brand") == "Brand#2",
    )
    from .relational import _BROADCAST_KEY_LIMIT
    from .sizing import join_parts

    fact = _t(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_returnflag"])
    if dim.count() > _BROADCAST_KEY_LIMIT:
        # dim side too big even for a sketch broadcast: real semi join
        j = fact.join(dim, join_type="inner", num_partitions=join_parts(),
                      on=("l_partkey",), right_on=("p_partkey",))
        return (
            j.map_batches(
                lambda b: pa.table({
                    "l_returnflag": b["l_returnflag"],
                    "qty": pc.round(b["l_quantity"],
                                    round_mode="half_towards_infinity")
                             .cast(pa.int64()),
                }),
                batch_format="pyarrow")
            .groupby("l_returnflag")
            .aggregate(Count(alias_name="n"), Sum("qty", alias_name="sum_qty"))
        )
    keys = np.sort(np.concatenate(
        [b["p_partkey"].to_numpy(zero_copy_only=False)
         for b in dim.iter_batches(batch_size=65536,
                                   batch_format="pyarrow")]
        or [np.empty(0, np.int64)]).astype(np.int64))
    cf = CuckooFilter(capacity=max(1 << 10, 4 * len(keys)))
    cf.add_batch(_splitmix64(keys))
    side_ref = ray.put((cf.dump(), keys))

    from .sizing import cluster_cpus

    class Probe:
        def __init__(self):
            dump, ks = ray.get(side_ref)
            self.cf = CuckooFilter.restore(dump)
            self.keys = ks

        def __call__(self, b: pa.Table) -> pa.Table:
            pk = b["l_partkey"].to_numpy(zero_copy_only=False)
            cand = self.cf.contains_batch(_splitmix64(pk))  # no false negs
            idx = np.searchsorted(self.keys, pk[cand])
            idx[idx >= len(self.keys)] = 0
            exact = (self.keys[idx] == pk[cand]) if len(self.keys) else \
                np.zeros(int(cand.sum()), bool)
            mask = np.zeros(len(pk), bool)
            mask[np.flatnonzero(cand)[exact]] = True
            t = b.filter(pa.array(mask))
            # per-block partial: the exchange carries blocks×|flags| rows
            g = pa.table({
                "l_returnflag": t["l_returnflag"],
                "qty": pc.round(t["l_quantity"], round_mode="half_towards_infinity").cast(pa.int64()),
            }).group_by(["l_returnflag"]).aggregate(
                [("qty", "sum"), ([], "count_all")])
            return pa.table({"l_returnflag": g["l_returnflag"],
                             "qty": g["qty_sum"], "n": g["count_all"]})

    return (
        fact.map_batches(Probe, batch_format="pyarrow", zero_copy_batch=True,
                         concurrency=(1, max(4, cluster_cpus() // 2)))
        .groupby("l_returnflag")
        .aggregate(Sum("n", alias_name="n"), Sum("qty", alias_name="sum_qty"))
    )


SQL_CUCKOO_SEMI_JOIN = """
SELECT l_returnflag, COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2')
GROUP BY l_returnflag
"""


# =====================================================================
# exact distributed median by 2-pass selection (closes the
# O(distinct-per-group) gap the exact-quantile histogram merge carries)
# =====================================================================

_SEL_BUCKET = 4096  # cents per coarse bucket in pass 1


def _sel_hist(b: pa.Table) -> pa.Table:
    """Per-block (flag, coarse-bucket) histogram — the pass-1 combiner
    for the 2-pass selections, Arrow-native (pandas blocks here once
    measured 7× slower on identical data); its bounded partials are
    driver-folded, never Ray-aggregated."""
    cents = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0))) \
              .cast(pa.int64()).to_numpy(zero_copy_only=False)
    flags = b["l_returnflag"].to_numpy(zero_copy_only=False)
    bucket = cents // _SEL_BUCKET
    fcodes, funiq = pd.factorize(flags)
    key = fcodes.astype(np.int64) * (1 << 32) + bucket
    uk, counts = np.unique(key, return_counts=True)
    return pa.table({
        "l_returnflag": pa.array(funiq[(uk >> 32).astype(np.int64)],
                                 type=pa.string()),
        "bucket": pa.array((uk & ((1 << 32) - 1)).astype(np.int64)),
        "cnt": pa.array(counts.astype(np.int64)),
    })


def q_median_selection(sf_dir: str):
    """Exact per-returnflag median (quantile_disc 0.5) of
    l_extendedprice by TWO bounded passes — the multi-pass selection
    q_quantiles' docstring defers to when per-group distinct counts are
    unbounded: pass 1 histograms cents into fixed-width coarse buckets
    per block (only (flag, bucket, count) partials — O(blocks ×
    buckets), never the data — leave the workers; the bounded fold runs
    on the driver) and locates the bucket holding the target rank; pass 2
    re-reads ONLY rows in that one bucket per flag (expected n/buckets
    of the data) and selects the exact rank within it. Driver holds
    O(buckets) counts + O(n/buckets) candidate values — both bounded at
    any scale. Cents are an exact monotonic recode of 2-decimal prices,
    so selecting on cents and dividing back is bit-exact."""
    import ray

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    # driver fold of the bounded pass-1 partials (blocks × flags ×
    # buckets skinny rows): Ray's Aggregate costs ~150 µs per
    # block×group — ~5 s for this ~7k-group histogram — while one
    # pandas groupby over the pulled partials is milliseconds
    parts = [
        b.to_pandas()
        for b in ds.map_batches(_sel_hist, batch_format="pyarrow",
                                zero_copy_batch=True)
        .iter_batches(batch_size=262144, batch_format="pyarrow")
    ]
    cdf = (
        pd.concat(parts, ignore_index=True)
        .groupby(["l_returnflag", "bucket"], as_index=False)["cnt"].sum()
        .sort_values(["l_returnflag", "bucket"])
    )
    want = {}  # flag -> (bucket, rank_within_bucket 1-based)
    for flag, g in cdf.groupby("l_returnflag", sort=False):
        n = int(g["cnt"].sum())
        k = (n - 1) // 2 + 1  # quantile_disc(0.5) rank, 1-based
        cum = g["cnt"].cumsum().to_numpy()
        i = int(np.searchsorted(cum, k))
        below = int(cum[i - 1]) if i else 0
        want[str(flag)] = (int(g["bucket"].iloc[i]), k - below)
    want_ref = ray.put(want)

    def candidates(b: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        cents = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0))) \
                  .cast(pa.int64()).to_numpy(zero_copy_only=False)
        flags = b["l_returnflag"].to_numpy(zero_copy_only=False)
        bucket = cents // _SEL_BUCKET
        mask = np.zeros(len(cents), bool)
        for f, (bk, _r) in w.items():
            mask |= (flags == f) & (bucket == bk)
        return pa.table({
            "l_returnflag": pa.array(flags[mask], type=pa.string()),
            "cents": pa.array(cents[mask], type=pa.int64()),
        })

    cand = pd.DataFrame(
        ds.map_batches(candidates, batch_format="pyarrow",
                       zero_copy_batch=True).take_all()
    )  # bounded: expected n/buckets rows per flag
    rows = []
    for f, (bk, r) in sorted(want.items()):
        vals = np.sort(cand.loc[cand["l_returnflag"] == f, "cents"].to_numpy())
        rows.append((f, vals[r - 1] / 100.0))
    return pa.table({
        "l_returnflag": pa.array([f for f, _ in rows], type=pa.string()),
        "median_price": pa.array([m for _, m in rows], type=pa.float64()),
    })


SQL_MEDIAN_SELECTION = """
SELECT l_returnflag,
  quantile_disc(l_extendedprice, 0.5) AS median_price
FROM lineitem GROUP BY l_returnflag
"""


# =====================================================================
# exact interpolated percentiles (quantile_cont) by 2-pass selection
# =====================================================================

def q_quantile_cont(sf_dir: str, qs=(0.25, 0.75)):
    """Exact PERCENTILE_CONT(0.25 / 0.75) per returnflag with the same
    two bounded passes as q_median_selection, generalized to multiple
    quantiles and to the interpolated definition: pass 1's coarse
    histogram locates BOTH neighbor ranks ⌊(n-1)q⌋+1 and +2 for every q,
    pass 2 re-reads only those buckets, and the final value is
    lo + frac·(hi−lo) computed with the IDENTICAL double expression the
    oracle uses (every operand is exactly reproducible: cents/100.0 and
    (n−1)·q), so interpolation is bit-equal. Driver state stays
    O(buckets) + O(n/buckets) at any scale."""
    import ray

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    # driver fold of the bounded pass-1 partials (blocks × flags ×
    # buckets skinny rows): Ray's Aggregate costs ~150 µs per
    # block×group — ~5 s for this ~7k-group histogram — while one
    # pandas groupby over the pulled partials is milliseconds
    parts = [
        b.to_pandas()
        for b in ds.map_batches(_sel_hist, batch_format="pyarrow",
                                zero_copy_batch=True)
        .iter_batches(batch_size=262144, batch_format="pyarrow")
    ]
    cdf = (
        pd.concat(parts, ignore_index=True)
        .groupby(["l_returnflag", "bucket"], as_index=False)["cnt"].sum()
        .sort_values(["l_returnflag", "bucket"])
    )
    need = {}   # flag -> {bucket: count_below}
    ranks = {}  # flag -> list of (q, k1, k2, frac)
    for flag, g in cdf.groupby("l_returnflag", sort=False):
        n = int(g["cnt"].sum())
        cum = g["cnt"].cumsum().to_numpy()
        buckets = g["bucket"].to_numpy()
        fneed, franks = {}, []
        for q in qs:
            r = (n - 1) * float(q)          # exact same double as SQL
            k1 = int(np.floor(r)) + 1
            frac = r - np.floor(r)
            k2 = k1 + 1 if (frac > 0.0 and k1 < n) else k1
            for k in (k1, k2):
                i = int(np.searchsorted(cum, k))
                below = int(cum[i - 1]) if i else 0
                fneed[int(buckets[i])] = below
            franks.append((float(q), k1, k2, float(frac)))
        need[str(flag)] = fneed
        ranks[str(flag)] = franks
    need_ref = ray.put(need)

    def candidates(b: pa.Table) -> pa.Table:
        w = ray.get(need_ref)
        cents = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0))) \
                  .cast(pa.int64()).to_numpy(zero_copy_only=False)
        flags = b["l_returnflag"].to_numpy(zero_copy_only=False)
        bucket = cents // _SEL_BUCKET
        mask = np.zeros(len(cents), bool)
        for f, bks in w.items():
            fm = flags == f
            for bk in bks:
                mask |= fm & (bucket == bk)
        return pa.table({
            "l_returnflag": pa.array(flags[mask], type=pa.string()),
            "bucket": pa.array(bucket[mask], type=pa.int64()),
            "cents": pa.array(cents[mask], type=pa.int64()),
        })

    cand = pd.DataFrame(
        ds.map_batches(candidates, batch_format="pyarrow",
                       zero_copy_batch=True).take_all()
    )
    out = {"l_returnflag": []}
    for q in qs:
        out[f"p{int(q * 100)}"] = []
    for f in sorted(ranks):
        pools = {
            bk: np.sort(cand.loc[(cand["l_returnflag"] == f)
                                 & (cand["bucket"] == bk), "cents"].to_numpy())
            for bk in need[f]
        }

        def value_at(k: int) -> float:
            for bk, below in need[f].items():
                vals = pools[bk]
                if below < k <= below + len(vals):
                    return vals[k - below - 1] / 100.0
            raise AssertionError(f"rank {k} not in fetched buckets")

        out["l_returnflag"].append(f)
        for q, k1, k2, frac in ranks[f]:
            lo, hi = value_at(k1), value_at(k2)
            out[f"p{int(q * 100)}"].append(lo + frac * (hi - lo))
    return pa.table({
        "l_returnflag": pa.array(out["l_returnflag"], type=pa.string()),
        **{c: pa.array(out[c], type=pa.float64())
           for c in out if c != "l_returnflag"},
    })


SQL_QUANTILE_CONT = """
WITH r AS (
  SELECT l_returnflag AS f, l_extendedprice AS v,
    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem),
k AS (
  SELECT f, n,
    MIN(CASE WHEN rn = CAST(floor((n-1)*CAST(0.25 AS DOUBLE)) AS BIGINT)+1
             THEN v END) AS lo25,
    MIN(CASE WHEN rn = CAST(floor((n-1)*CAST(0.25 AS DOUBLE)) AS BIGINT)+2
             THEN v END) AS hi25,
    MIN(CASE WHEN rn = CAST(floor((n-1)*CAST(0.75 AS DOUBLE)) AS BIGINT)+1
             THEN v END) AS lo75,
    MIN(CASE WHEN rn = CAST(floor((n-1)*CAST(0.75 AS DOUBLE)) AS BIGINT)+2
             THEN v END) AS hi75
  FROM r GROUP BY f, n)
SELECT f AS l_returnflag,
  lo25 + ((n-1)*CAST(0.25 AS DOUBLE) - floor((n-1)*CAST(0.25 AS DOUBLE)))
         * (COALESCE(hi25, lo25) - lo25) AS p25,
  lo75 + ((n-1)*CAST(0.75 AS DOUBLE) - floor((n-1)*CAST(0.75 AS DOUBLE)))
         * (COALESCE(hi75, lo75) - lo75) AS p75
FROM k
"""


# =====================================================================
# GROUPING SETS (§2.5): arbitrary grouping-set list, one fine pass
# =====================================================================

def q_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((priority), (status)): like rollup/cube,
    ONE distributed groupby computes the finest (priority, status) level
    and each requested set is an O(groups) fold of that bounded table —
    no second pass over the data for any number of sets."""
    ds = _t(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "priority": b["o_orderpriority"],
            "status": b["o_orderstatus"],
            "price_c": _cents(b["o_totalprice"]),
        })

    fine = pd.DataFrame(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["priority", "status"])
        .aggregate(Count(alias_name="n"), Sum("price_c", alias_name="price_c"))
        .take_all()
    )
    by_p = (fine.groupby("priority", as_index=False)[["n", "price_c"]].sum()
            .assign(status="ALL"))
    by_s = (fine.groupby("status", as_index=False)[["n", "price_c"]].sum()
            .assign(priority="ALL"))
    out = pd.concat([by_p, by_s], ignore_index=True)
    return pa.table({
        "priority": pa.array(out["priority"], type=pa.string()),
        "status": pa.array(out["status"], type=pa.string()),
        "n": pa.array(out["n"].astype(np.int64)),
        "total": pa.array((out["price_c"].astype(np.int64) / 100.0)
                          .astype(np.float64)),
    })


SQL_GROUPING_SETS = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
  COALESCE(o_orderstatus, 'ALL') AS status,
  COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
"""


# =====================================================================
# weighted average (§2.5): ratio of two distributed integer sums
# =====================================================================

def q_weighted_avg(sf_dir: str):
    """Quantity-weighted mean unit price per returnflag: both numerator
    (Σ price_cents·qty) and denominator (Σ qty) are exact int64 sums, so
    the distributed summation order cannot perturb the final single
    float division — the ratio-of-sums pattern that makes weighted
    means safe to compute across thousands of blocks."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        qty = pc.round(b["l_quantity"]).cast(pa.int64())
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "pq": pc.multiply(_cents(b["l_extendedprice"]), qty),
            "qty": qty,
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(Sum("pq", alias_name="pq"), Sum("qty", alias_name="qty"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "l_returnflag": b["l_returnflag"],
            "w_avg_price": pc.divide(
                pc.divide(b["pq"].cast(pa.float64()), pa.scalar(100.0)),
                b["qty"].cast(pa.float64())),
        }),
        batch_format="pyarrow",
    )


SQL_WEIGHTED_AVG = """
SELECT l_returnflag,
  (CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
            * CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE)/100.0)
  / CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE) AS w_avg_price
FROM lineitem GROUP BY l_returnflag
"""


# =====================================================================
# funnel / sequence pattern (§2.9): ordered event milestones per user
# =====================================================================

def q_funnel(sf_dir: str):
    """Users whose FIRST view precedes their FIRST click precedes their
    FIRST purchase — sequence-pattern matching as three conditional-min
    aggregates in ONE groupby(user_id) shuffle (each row ships one
    int64 timestamp into at most one of three columns), then a bounded
    vectorized filter. No per-user event list is ever materialized —
    the shape that survives a 10^9-user event log."""
    from ray.data.aggregate import Min

    ds = _t(sf_dir, "events", ["user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64())
        et = b["event_type"]

        def only(kind):
            return pc.if_else(pc.equal(et, pa.scalar(kind)), ts,
                              pa.scalar(None, pa.int64()))

        return pa.table({
            "user_id": b["user_id"],
            "tv": only("view"), "tc": only("click"), "tp": only("purchase"),
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Min("tv", alias_name="tv"), Min("tc", alias_name="tc"),
                   Min("tp", alias_name="tp"))
    )

    def ok(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.less(b["tv"], b["tc"]),
                            pc.less(b["tc"], b["tp"])),
                    pc.is_valid(b["tv"]))
        m = pc.fill_null(m, False)
        return pa.table({"user_id": pc.array_filter(b["user_id"], m)})

    n = agg.map_batches(ok, batch_format="pyarrow").count()
    return pa.table({"n_users": pa.array([n], type=pa.int64())})


SQL_FUNNEL = """
SELECT COUNT(*) AS n_users FROM (
  SELECT user_id,
    min(CASE WHEN event_type='view' THEN ts END) AS tv,
    min(CASE WHEN event_type='click' THEN ts END) AS tc,
    min(CASE WHEN event_type='purchase' THEN ts END) AS tp
  FROM events GROUP BY user_id)
WHERE tv IS NOT NULL AND tc IS NOT NULL AND tp IS NOT NULL
  AND tv < tc AND tc < tp
"""


# =====================================================================
# INTERSECT / EXCEPT (D5) as one membership-vector groupby
# =====================================================================

def q_intersect_except(sf_dir: str):
    """(custkeys ordering in January ∩ February) ∖ March — the set-op
    chain as ONE groupby over conditional-max membership bits instead of
    three scans + two shuffles: each row ships (custkey, m1, m2, m3)
    where the bits are 0/1, Max folds them, and a vectorized filter
    applies the whole INTERSECT/EXCEPT expression at once."""
    from ray.data.aggregate import Max

    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.month(b["o_orderdate"])

        def bit(mm):
            return pc.cast(pc.equal(m, pa.scalar(mm)), pa.int64())

        return pa.table({
            "o_custkey": b["o_custkey"],
            "m1": bit(1), "m2": bit(2), "m3": bit(3),
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(Max("m1", alias_name="m1"), Max("m2", alias_name="m2"),
                   Max("m3", alias_name="m3"))
    )

    def pick(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.equal(b["m1"], pa.scalar(1)),
                            pc.equal(b["m2"], pa.scalar(1))),
                    pc.equal(b["m3"], pa.scalar(0)))
        return pa.table({"o_custkey": pc.array_filter(b["o_custkey"], m)})

    return agg.map_batches(pick, batch_format="pyarrow")


SQL_INTERSECT_EXCEPT = """
SELECT o_custkey FROM orders WHERE month(o_orderdate) = 1
INTERSECT
SELECT o_custkey FROM orders WHERE month(o_orderdate) = 2
EXCEPT
SELECT o_custkey FROM orders WHERE month(o_orderdate) = 3
"""


# =====================================================================
# CROSS JOIN (J5 family): keyless product with a broadcast small side
# =====================================================================

def q_cross_join(sf_dir: str):
    """region × nation: the keyless product is a broadcast fan-out —
    the 5-row side ships once (ray.put for a real dimension) and each
    nation block emits |block|·5 rows locally; no shuffle at all. The
    only sane cross-join plan when one side is bounded."""
    import ray

    regions = sorted(
        r["r_name"] for r in _t(sf_dir, "region", ["r_name"]).take_all()
    )
    r_ref = ray.put(regions)

    def fan(b: pa.Table) -> pa.Table:
        import ray as _r

        rs = _r.get(r_ref)
        n = b["n_name"].combine_chunks() if isinstance(b["n_name"], pa.ChunkedArray) \
            else b["n_name"]
        return pa.table({
            "r_name": pa.array([r for r in rs for _ in range(len(n))],
                               type=pa.string()),
            "n_name": pa.concat_arrays([n] * len(rs)),
        })

    return _t(sf_dir, "nation", ["n_name"]).map_batches(
        fan, batch_format="pyarrow", zero_copy_batch=True)


SQL_CROSS_JOIN = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


# =====================================================================
# UNPIVOT (M13 family): wide → long without a shuffle
# =====================================================================

def q_unpivot(sf_dir: str):
    """part(size, retail cents) unpivoted to (p_partkey, attr, val)
    long rows — the inverse of pivot_status, done as a purely local
    per-block fan-out (concat of column-tagged arrays); row order is
    irrelevant under the driver's sorted compare."""
    import pyarrow.dataset as pads

    ds = _sized_read(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_size", "p_retailprice"],
        filter=pads.field("p_partkey") < 100,
    )

    def fan(b: pa.Table) -> pa.Table:
        def arr(x):
            return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

        pk = arr(b["p_partkey"])
        size = arr(b["p_size"].cast(pa.int64()))
        retail = arr(_cents(b["p_retailprice"]))
        n = len(pk)
        return pa.table({
            "p_partkey": pa.concat_arrays([pk, pk]),
            "attr": pa.array(["size"] * n + ["retail_c"] * n,
                             type=pa.string()),
            "val": pa.concat_arrays([size, retail]),
        })

    return ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)


SQL_UNPIVOT = """
SELECT p_partkey, 'size' AS attr, CAST(p_size AS BIGINT) AS val
FROM part WHERE p_partkey < 100
UNION ALL
SELECT p_partkey, 'retail_c' AS attr,
  CAST(ROUND(p_retailprice*100) AS BIGINT) AS val
FROM part WHERE p_partkey < 100
"""


# =====================================================================
# date-part extraction (§2.8 date/time family)
# =====================================================================

def q_date_parts(sf_dir: str):
    """year / quarter / month / ISO day-of-week / ISO week per order —
    the calendar-kernel family over Arrow's temporal compute functions,
    pinned against DuckDB's isodow/weekofyear conventions."""
    import pyarrow.dataset as pads

    ds = _sized_read(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
        filter=pads.field("o_orderkey") < 600,
    )

    def parts(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"]
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "y": pc.year(d).cast(pa.int64()),
            "q": pc.quarter(d).cast(pa.int64()),
            "m": pc.month(d).cast(pa.int64()),
            "isodow": pc.day_of_week(d, count_from_zero=False,
                                     week_start=1).cast(pa.int64()),
            "isoweek": pc.iso_week(d).cast(pa.int64()),
        })

    return ds.map_batches(parts, batch_format="pyarrow", zero_copy_batch=True)


SQL_DATE_PARTS = """
SELECT o_orderkey,
  year(o_orderdate) AS y, quarter(o_orderdate) AS q,
  month(o_orderdate) AS m, isodow(o_orderdate) AS isodow,
  weekofyear(o_orderdate) AS isoweek
FROM orders WHERE o_orderkey < 600
"""


# =====================================================================
# RANK() with ties (O2 variant: tie-inclusive top-k per group)
# =====================================================================

def q_rank_ties(sf_dir: str):
    """Customers with RANK() ≤ 3 per nation by balance — the
    tie-INCLUSIVE top-k (groups can exceed 3 rows on equal balances),
    complementing topk_per_group's ROW_NUMBER semantics. Per-block
    pruning stays safe under ties: a row with ≤2 strictly-greater rows
    globally has ≤2 strictly-greater rows in its own block, so keeping
    each block's rank-≤3 rows is a superset; the per-group final
    recomputes the exact rank. Balances are compared only, never
    recomputed — floats pass through bit-exact."""
    ds = _t(sf_dir, "customer", ["c_nationkey", "c_custkey", "c_acctbal"])

    def rank_le3(df: pd.DataFrame, grp: str) -> pd.DataFrame:
        df = df.sort_values([grp, "c_acctbal"], ascending=[True, False],
                            kind="mergesort")
        # rank = 1 + #strictly-greater within the group (dense over
        # duplicates): competition rank via cumcount of value changes
        out = []
        for _, g in df.groupby(grp, sort=False):
            vals = g["c_acctbal"].to_numpy()
            first_idx = np.flatnonzero(np.r_[True, vals[1:] != vals[:-1]])
            rk = np.zeros(len(vals), dtype=np.int64)
            rk[first_idx] = first_idx + 1
            rk = np.maximum.accumulate(rk)
            keep = rk <= 3
            gg = g.iloc[keep].copy()
            gg["rk"] = rk[keep]
            out.append(gg)
        return pd.concat(out) if out else df.head(0).assign(rk=0)

    partial = ds.map_batches(lambda df: rank_le3(df, "c_nationkey")
                             .drop(columns=["rk"]),
                             batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = rank_le3(g, "c_nationkey")
        g = g.sort_values(["rk", "c_custkey"], kind="mergesort")
        return pd.DataFrame({
            "c_nationkey": g["c_nationkey"].to_numpy().astype(np.int64),
            "c_custkey": g["c_custkey"].to_numpy(),
            "c_acctbal": g["c_acctbal"].to_numpy(),
            "rk": g["rk"].to_numpy(),
        })

    return partial.groupby("c_nationkey").map_groups(
        final, batch_format="pandas")


SQL_RANK_TIES = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey, c_acctbal,
  rk
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
    RANK() OVER (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC) AS rk
  FROM customer
) WHERE rk <= 3
"""


# =====================================================================
# multi-column COUNT(DISTINCT) in ONE fused shuffle
# =====================================================================

def q_multi_distinct(sf_dir: str):
    """COUNT(DISTINCT partkey) AND COUNT(DISTINCT suppkey) per
    returnflag through ONE shuffle: each block emits its distinct
    (flag, channel, key) triples for both channels (the combiner), the
    single groupby dedups the union, and a bounded per-flag fold counts
    each channel — two distinct-aggregations for the price of one
    all-to-all."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_partkey", "l_suppkey"])

    from .sizing import fold_parts

    n_parts = fold_parts()

    def channels(b: pa.Table) -> pa.Table:
        def arr(x):
            return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

        p = b.group_by(["l_returnflag", "l_partkey"]).aggregate([])
        s = b.group_by(["l_returnflag", "l_suppkey"]).aggregate([])
        np_, ns = p.num_rows, s.num_rows
        key = np.concatenate([
            arr(p["l_partkey"]).to_numpy(zero_copy_only=False),
            arr(s["l_suppkey"]).to_numpy(zero_copy_only=False),
        ]).astype(np.int64)
        chan_i = np.concatenate([np.zeros(np_, np.int64),
                                 np.ones(ns, np.int64)])
        # partition on a hash of (key, chan) ONLY — the flag needn't be
        # hashed for correctness (nunique below re-groups by flag inside
        # the partition), and the exchange then groups on a small-int
        # key instead of a 3-column string aggregate (~4× faster)
        with np.errstate(over="ignore"):
            hp = ((((key << 1) | chan_i).view(np.uint64)
                   * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "flag": pa.concat_arrays([arr(p["l_returnflag"]),
                                      arr(s["l_returnflag"])]),
            "chan": pa.array(["p"] * np_ + ["s"] * ns, type=pa.string()),
            "key": pa.array(key),
            "hp": pa.array(hp),
        })

    def part_nunique(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["flag", "chan"])["key"].nunique().reset_index()
        return pd.DataFrame({"flag": out["flag"], "chan": out["chan"],
                             "n": out["key"].to_numpy().astype(np.int64)})

    uniq = (
        ds.map_batches(channels, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hp")
        .map_groups(part_nunique, batch_format="pandas")
        .groupby(["flag", "chan"]).aggregate(Sum("n", alias_name="n"))
        .take_all()  # bounded: flags × 2 rows
    )
    df = pd.DataFrame(uniq).pivot(index="flag", columns="chan",
                                  values="n").reset_index()
    return pa.table({
        "l_returnflag": pa.array(df["flag"], type=pa.string()),
        "n_parts": pa.array(df["p"].to_numpy().astype(np.int64)),
        "n_supps": pa.array(df["s"].to_numpy().astype(np.int64)),
    })


SQL_MULTI_DISTINCT = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_suppkey) AS n_supps
FROM lineitem GROUP BY l_returnflag
"""


# =====================================================================
# partitioned parquet sink round-trip (S-family: resumable output)
# =====================================================================

def q_partitioned_sink(sf_dir: str):
    """Hive-partitioned parquet sink round-trip: lineitem (3 pruned
    columns) writes with ``partition_cols=["l_returnflag"]`` — one
    directory per key, the resumable-output layout where a failed run
    skips finished partitions — then ONLY the ``l_returnflag=R``
    directory is read back (partition pruning: the other flags' files
    never open) and aggregated. Oracle = the same aggregate over the
    source table WHERE l_returnflag='R'."""
    import shutil
    import tempfile

    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity"])
    out_dir = tempfile.mkdtemp(prefix="crawlray_psink_")
    try:
        ds.write_parquet(out_dir, partition_cols=["l_returnflag"])
        back = _sized_read(os.path.join(out_dir, "l_returnflag=R"))

        def prep(b: pa.Table) -> pa.Table:
            return pa.table({
                "l_linestatus": b["l_linestatus"],
                "qty": pc.round(b["l_quantity"]).cast(pa.int64()),
            })

        return pa.Table.from_pylist(
            back.map_batches(prep, batch_format="pyarrow")
            .groupby("l_linestatus")
            .aggregate(Count(alias_name="n"), Sum("qty", alias_name="sum_qty"))
            .take_all()  # bounded: one row per linestatus
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_PARTITIONED_SINK = """
SELECT l_linestatus, COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus
"""


# =====================================================================
# salted two-stage aggregate (the hot-key shuffle discipline, §4.2,
# as a reusable query-surface op)
# =====================================================================

def q_salted_groupby(sf_dir: str):
    """SUM/COUNT per event_type via the SALTED two-stage plan: stage 1
    groups by (event_type, salt = event_id % 16) so a hot key's rows
    spread over 16 reducers instead of serializing on one; stage 2
    re-aggregates the ≤ |types|·16 partials. With only 5 event types,
    the UNSALTED plan caps reduce parallelism at 5 no matter how many
    cores exist — the same skew law the crawl engine's hot-host salting
    handles, here as a generic aggregate. Integer cents make both
    stages' sums order-independent, so the result is bit-equal to the
    plain GROUP BY oracle."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b["event_type"],
            "salt": pa.array((eid % 16).astype(np.int64)),
            "value_c": _cents(b["value"]),
        })

    partial = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "salt"])
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="value_c"))
    )
    final = (
        partial.groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("value_c", alias_name="value_c"))
    )
    return final.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"], "n": b["n"],
            "sum_value": pc.divide(b["value_c"].cast(pa.float64()),
                                   pa.scalar(100.0)),
        }),
        batch_format="pyarrow",
    )


SQL_SALTED_GROUPBY = """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
FROM events GROUP BY event_type
"""


# =====================================================================
# inverted index build (IR / training-data op)
# =====================================================================

def q_inverted_index(sf_dir: str):
    """Posting lists: token → ordered list of the doc_ids containing it
    (docs < 50; tokens with ≥ 3 postings). Each block emits its DISTINCT
    (token, doc_id) pairs (the combiner — duplicate occurrences inside a
    doc never shuffle), one groupby builds the lists, and the postings
    are sorted + comma-joined so the oracle compare is a plain string
    equality. The per-token map_groups assumes one token's postings fit
    a worker — the same bound every postings builder has; a 100-TB build
    shards giant tokens by doc-range into list segments."""
    import pyarrow.dataset as pads

    ds = _sized_read(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pads.field("doc_id") < 50,
    )

    def pairs(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(b["text"].combine_chunks()
                            if isinstance(b["text"], pa.ChunkedArray)
                            else b["text"])
        toks = pc.split_pattern_regex(low, "[^a-z]+")
        flat = pc.list_flatten(toks)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        dids = np.repeat(b["doc_id"].to_numpy(zero_copy_only=False), reps)
        tnp = flat.to_numpy(zero_copy_only=False)
        keep = tnp != ""
        df = pd.DataFrame({"token": tnp[keep], "doc_id": dids[keep]})
        df = df.drop_duplicates()
        return pa.table({
            "token": pa.array(df["token"], type=pa.string()),
            "doc_id": pa.array(df["doc_id"].to_numpy().astype(np.int64)),
        })

    def build(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 3:
            return pd.DataFrame({"token": [], "df": [], "postings": []})
        return pd.DataFrame({
            "token": [g["token"].iloc[0]],
            "df": [np.int64(len(ids))],
            "postings": [",".join(str(i) for i in ids)],
        })

    return (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .map_groups(build, batch_format="pandas")
    )


SQL_INVERTED_INDEX = """
SELECT token, COUNT(DISTINCT doc_id) AS df,
  string_agg(DISTINCT CAST(doc_id AS VARCHAR), ',' ORDER BY
             CAST(doc_id AS BIGINT)) AS postings
FROM (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
  FROM documents WHERE doc_id < 50)
WHERE token <> ''
GROUP BY token HAVING COUNT(DISTINCT doc_id) >= 3
"""


# =====================================================================
# windowed self-join (stream-stream join within a time bound)
# =====================================================================

def q_window_self_join(sf_dir: str):
    """Per user: how many ordered event pairs lie within 30 minutes of
    each other — the bounded-interval stream-stream self-join. One
    groupby(user_id) shuffle; inside each partition a sorted
    two-pointer (searchsorted) counts each row's forward window in
    O(n log n), versus the O(n²) blow-up of a literal self-join. Pair
    order is (ts, event_id) so equal timestamps count exactly once,
    mirrored in the oracle's join condition."""
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts"])
    half_hour = np.int64(30 * 60 * 1_000_000)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        # forward neighbors with ts_j <= ts_i + 30min, j > i in the sort
        hi = np.searchsorted(ts, ts + half_hour, side="right")
        n_pairs = int((hi - np.arange(1, len(ts) + 1)).sum())
        if n_pairs == 0:  # the inner self-join has no row for this user
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "n_pairs": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"user_id": [int(g["user_id"].iloc[0])],
                             "n_pairs": [np.int64(n_pairs)]})

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


SQL_WINDOW_SELF_JOIN = """
SELECT e1.user_id, COUNT(*) AS n_pairs
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND (e2.ts > e1.ts OR (e2.ts = e1.ts AND e2.event_id > e1.event_id))
 AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
GROUP BY e1.user_id
"""


# =====================================================================
# PageRank (iterative graph algorithm; rows-only, numpy-pinned)
# =====================================================================

_PR_DAMPING = 0.85
_PR_ITERS = 10
_PR_DRIVER_FOLD_LIMIT = 1_000_000  # nodes; beyond this each iteration
# runs a groupby(dst) all-to-all instead of the driver partial-fold
_PR_EDGE_DRIVER_LIMIT = 5_000_000  # deduped edges; at or below, the whole
# power iteration runs on the driver over two int64 arrays (~80 MB at the
# limit) — the same guarded-small-side discipline as connected_components'
# union-find; past it, the distributed per-round loop below


def q_pagerank(sf_dir: str, iters: int = _PR_ITERS):
    """PageRank over the part→supplier co-occurrence graph (distinct
    (l_partkey, l_suppkey) edges, both directions, so the chain is
    connected): the second iterative-algorithm family next to
    connected_components. The edge list is built distributed (map +
    ONE dedup groupby) and materialized; its count then picks the loop:
    ≤ ``_PR_EDGE_DRIVER_LIMIT`` edges run all iterations locally over
    two int64 arrays (10 distributed rounds of ~1.5 s dispatch each to
    move a few MB is pure overhead), larger graphs run the distributed
    loop — per iteration ONE map over the edge dataset (ranks broadcast
    via ray.put; a web-scale node set swaps the broadcast for a join on
    src) emits per-block (dst, contribution) partials the driver folds,
    or a groupby(dst) past ``_PR_DRIVER_FOLD_LIMIT`` nodes.
    Deterministic either way: fixed iteration count, float64
    throughout. Pinned against a numpy power iteration at 1e-10
    (tests/test_analytics_ops.py)."""
    import ray

    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    from .sizing import cluster_cpus, fold_parts

    n_parts = fold_parts()

    def edge_keys(b: pa.Table) -> pa.Table:
        """Per-block-distinct fused (src<<32)|dst keys, hash-partitioned —
        the dedup exchange groups on a small-int key and unpacks with
        numpy, instead of a (src, dst) multi-key aggregate over ~2 rows
        per lineitem (measured ~6× slower for identical output)."""
        p = b["l_partkey"].to_numpy(zero_copy_only=False)
        s = b["l_suppkey"].to_numpy(zero_copy_only=False)
        src = np.concatenate([2 * p, 2 * s + 1])      # part=even, supp=odd
        dst = np.concatenate([2 * s + 1, 2 * p])
        # pack via uint64 view: src < 2^32 keeps the high word exact and
        # dst < 2^32 cannot bleed into it; assert the bound instead of
        # silently colliding at node ids >= 2^31 (TPC-H SF ~5000+ keys)
        if len(src) and (src.max() >= (1 << 32) or dst.max() >= (1 << 32)):
            raise ValueError(
                "pagerank edge packing needs node ids < 2^32; use the "
                "multi-key dedup path for larger key spaces")
        key = np.unique(
            (src.astype(np.uint64) << np.uint64(32))
            | dst.astype(np.uint64)).view(np.int64)
        with np.errstate(over="ignore"):
            ep = ((key.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"key": pa.array(key), "ep": pa.array(ep)})

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        # unpack through the uint64 view so src in [2^31, 2^32) (negative
        # as int64) is not sign-extended by the arithmetic shift
        key = np.unique(g["key"].to_numpy()).view(np.uint64)
        return pd.DataFrame({
            "src": (key >> np.uint64(32)).astype(np.int64),
            "dst": (key & np.uint64(0xFFFFFFFF)).astype(np.int64)})

    edges = (
        li.map_batches(edge_keys, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("ep")
        .map_groups(dedup_part, batch_format="pandas")
        .materialize()  # reused below — never re-read parquet
    )

    if edges.count() <= _PR_EDGE_DRIVER_LIMIT:
        src_c, dst_c = [], []
        for b in edges.iter_batches(batch_size=262144,
                                    batch_format="pyarrow"):
            src_c.append(b["src"].to_numpy(zero_copy_only=False))
            dst_c.append(b["dst"].to_numpy(zero_copy_only=False))
        src = np.concatenate(src_c).astype(np.int64)
        dst = np.concatenate(dst_c).astype(np.int64)
        nodes, outdeg_i = np.unique(src, return_counts=True)
        n = len(nodes)
        outdeg = outdeg_i.astype(np.float64)
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        rank = np.full(n, 1.0 / n)
        base = (1.0 - _PR_DAMPING) / n
        for _ in range(iters):
            w = rank / outdeg
            rank = base + _PR_DAMPING * np.bincount(di, weights=w[si],
                                                    minlength=n)
        order = np.lexsort((nodes, -rank))[:10]
        return pa.table({
            "node": pa.array(nodes[order], type=pa.int64()),
            "rank": pa.array(rank[order], type=pa.float64()),
        })

    # coalesce the dedup-groupby's many small output blocks ONCE so the
    # iteration passes don't each pay ~200 task dispatches
    edges = edges.repartition(cluster_cpus()).materialize()
    deg = edges.groupby("src").count()  # bounded: |nodes|
    src_c, cnt_c = [], []
    for b in deg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        src_c.append(b["src"].to_numpy(zero_copy_only=False))
        cnt_c.append(b["count()"].to_numpy(zero_copy_only=False))
    srcs = np.concatenate(src_c).astype(np.int64)
    cnts = np.concatenate(cnt_c).astype(np.float64)
    order = np.argsort(srcs)
    nodes = srcs[order]
    n = len(nodes)
    outdeg = cnts[order]
    rank = np.full(n, 1.0 / n)
    base = (1.0 - _PR_DAMPING) / n

    for _ in range(iters):
        ref = ray.put((nodes, rank / outdeg))

        def contrib(b: pa.Table) -> pa.Table:
            """Per-block PARTIAL: vectorized gather of src weights +
            bincount fold per dst — each block ships ≤ min(|block|,
            |nodes|) partial rows."""
            import ray as _r

            ns, w = _r.get(ref)
            src = b["src"].to_numpy(zero_copy_only=False)
            dst = b["dst"].to_numpy(zero_copy_only=False)
            wi = w[np.searchsorted(ns, src)]
            uk, inv = np.unique(dst, return_inverse=True)
            return pa.table({
                "dst": pa.array(uk),
                "w": pa.array(np.bincount(inv, weights=wi)),
            })

        mapped = edges.map_batches(contrib, batch_format="pyarrow")
        if n > _PR_DRIVER_FOLD_LIMIT:
            # web-scale node set: one groupby(dst) per iteration
            mapped = mapped.groupby("dst").aggregate(Sum("w", alias_name="w"))
        # fold the bounded partials (O(blocks × nodes) rows) vectorized
        acc = np.zeros(n)
        folded = mapped.to_pandas()
        np.add.at(acc, np.searchsorted(nodes, folded["dst"].to_numpy()),
                  folded["w"].to_numpy())
        rank = base + _PR_DAMPING * acc

    order = np.lexsort((nodes, -rank))[:10]
    return pa.table({
        "node": pa.array(nodes[order], type=pa.int64()),
        "rank": pa.array(rank[order], type=pa.float64()),
    })


# =====================================================================
# event-time watermark / late-data detection (§2.9 streaming semantics)
# =====================================================================

def q_late_events(sf_dir: str, tolerance_us: int = 3_600_000_000):
    """Out-of-order (late) event detection — the watermark primitive of
    every streaming engine: an event is LATE when its event time trails
    the user's running event-time watermark (max ts among
    earlier-ARRIVING events) by more than the tolerance. The fixture's
    events arrive exactly in event-time order (zero late rows), so
    arrival order is a deterministic Lehmer permutation of event_id —
    (event_id·48271) mod 1000003 — identical on both sides, which
    makes ~6% of events late and actually exercises the path. Scale
    shape: ONE groupby(user) shuffle carrying 3 small columns, then a
    vectorized per-group pass (sort by arrival, shifted running max
    via np.maximum.accumulate) — the same partitioning every
    PARTITION BY engine assumes; late rows are a trickle, so the
    output is tiny."""
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy()
        g = g.iloc[np.lexsort((eid, (eid * 48271) % 1000003))]
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        wm = np.empty(len(ts), dtype=np.int64)
        if len(ts):
            wm[0] = ts[0]  # no predecessor → lateness 0, never late
        if len(ts) > 1:
            np.maximum.accumulate(ts[:-1], out=wm[1:])
        late = (wm - ts) > tolerance_us
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy()[late],
            "event_id": g["event_id"].to_numpy()[late],
            "lateness_us": (wm - ts)[late],
        })

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


SQL_LATE_EVENTS = """
SELECT user_id, event_id,
       date_diff('microsecond', ts, wm) AS lateness_us
FROM (
  SELECT user_id, event_id, ts,
         MAX(ts) OVER (PARTITION BY user_id
                       ORDER BY (event_id * 48271) % 1000003, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS wm
  FROM events)
WHERE wm IS NOT NULL AND date_diff('microsecond', ts, wm) > 3600000000
"""


# =====================================================================
# watermark-gated windowed aggregate (the EMIT side of late-data
# handling — late_events detects; this drops at the aggregate)
# =====================================================================

def q_watermark_agg(sf_dir: str, tolerance_us: int = 3_600_000_000):
    """Hourly event counts where rows arriving LATER than the per-user
    watermark tolerance are excluded and tallied separately — the
    window-emit semantics of every watermarked streaming aggregate
    (late rows can't retract an already-emitted pane, so they're
    diverted). Same deterministic Lehmer arrival permutation as
    late_events; ONE exchange grouped on a user-hash partition key
    (each partition runs its users' watermark passes vectorized AND
    pre-folds its (window, on_time, late) partials — one pandas group
    per user would cost ~1000 tiny tasks), then a bounded driver fold
    over partitions×windows partial rows."""
    from .sizing import fold_parts

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts"])
    n_parts = fold_parts()

    def tag(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            up = ((u.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(n_parts)).astype(np.int64)
        # ts as int64 µs: all downstream math is integer microseconds,
        # and the exchange ships one int64 instead of a timestamp
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts_us": pa.array(
                b["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64)),
            "up": pa.array(up),
        })

    def part_fold(g: pd.DataFrame) -> pd.DataFrame:
        hs, ls = [], []
        for _uid, gu in g.groupby("user_id", sort=False):
            eid = gu["event_id"].to_numpy()
            gu = gu.iloc[np.lexsort((eid, (eid * 48271) % 1000003))]
            ts = gu["ts_us"].to_numpy()
            wm = np.empty(len(ts), dtype=np.int64)
            if len(ts):
                wm[0] = ts[0]
            if len(ts) > 1:
                np.maximum.accumulate(ts[:-1], out=wm[1:])
            hs.append(ts - (ts % 3_600_000_000))
            ls.append((wm - ts) > tolerance_us)
        if not hs:
            return pd.DataFrame({
                "window_start": pd.Series([], dtype="datetime64[us]"),
                "on_time": pd.Series([], dtype=np.int64),
                "late": pd.Series([], dtype=np.int64)})
        hour = np.concatenate(hs)
        late = np.concatenate(ls)
        uk, inv = np.unique(hour, return_inverse=True)
        n_late = np.bincount(inv, weights=late).astype(np.int64)
        n_all = np.bincount(inv)
        # int64 µs key: Ray's aggregate over a timestamp key falls off
        # the fast path (measured 7.6 s for this 40k-row fold vs <1 s
        # on int64); the final map restores the timestamp type
        return pd.DataFrame({
            "hour_us": uk,
            "on_time": (n_all - n_late).astype(np.int64),
            "late": n_late,
        })

    folded = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("up")
        .map_groups(part_fold, batch_format="pandas")
    )
    # final fold on the driver: the input is bounded by partitions ×
    # windows (~40k skinny rows) and Ray's Aggregate costs ~150 µs per
    # block×group (measured 7.5 s for this 720-group fold) — the same
    # bounded-driver-fold discipline as histogram / rollup
    h_c, a_c, l_c = [], [], []
    for b in folded.iter_batches(batch_size=65536, batch_format="pyarrow"):
        h_c.append(b["hour_us"].to_numpy(zero_copy_only=False))
        a_c.append(b["on_time"].to_numpy(zero_copy_only=False))
        l_c.append(b["late"].to_numpy(zero_copy_only=False))
    hour = np.concatenate(h_c or [np.empty(0, np.int64)])
    uk, inv = np.unique(hour, return_inverse=True)
    on_time = np.bincount(inv, weights=np.concatenate(
        a_c or [np.empty(0, np.int64)])).astype(np.int64)
    late = np.bincount(inv, weights=np.concatenate(
        l_c or [np.empty(0, np.int64)])).astype(np.int64)
    return pa.table({
        "window_start": pa.array(uk.astype("datetime64[us]")),
        "n_on_time": pa.array(on_time),
        "n_late": pa.array(late),
    })


SQL_WATERMARK_AGG = """
SELECT date_trunc('hour', ts) AS window_start,
  COUNT(*) FILTER (WHERE wm IS NULL
                   OR date_diff('microsecond', ts, wm) <= 3600000000)
    AS n_on_time,
  COUNT(*) FILTER (WHERE wm IS NOT NULL
                   AND date_diff('microsecond', ts, wm) > 3600000000)
    AS n_late
FROM (
  SELECT ts,
         MAX(ts) OVER (PARTITION BY user_id
                       ORDER BY (event_id * 48271) % 1000003, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS wm
  FROM events)
GROUP BY 1
"""


# =====================================================================
# schema-evolution union (heterogeneous shards aligned by name)
# =====================================================================

def q_schema_union(sf_dir: str):
    """Union of two shards with DIFFERENT schemas — the ingestion
    reality when a field was added mid-collection: the old shard
    (even event_ids) lacks ``value``; alignment adds it as typed
    nulls block-locally (no shuffle, no driver pass), the union
    streams, and the aggregate distinguishes row count from valued
    count. Mirrors DuckDB's UNION ALL BY NAME semantics."""
    old = _t(sf_dir, "events", ["event_id", "event_type"])
    new = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def align_old(b: pa.Table) -> pa.Table:
        ev = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = pa.array(ev % 2 == 0)
        b = b.filter(keep)
        return pa.table({
            "event_type": b["event_type"],
            "value_c": pa.nulls(b.num_rows, pa.int64()),
            "valued": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
        })

    def align_new(b: pa.Table) -> pa.Table:
        ev = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = pa.array(ev % 2 == 1)
        b = b.filter(keep)
        return pa.table({
            "event_type": b["event_type"],
            "value_c": _cents(b["value"]),
            "valued": pa.array(np.ones(b.num_rows, dtype=np.int64)),
        })

    u = old.map_batches(align_old, batch_format="pyarrow",
                        zero_copy_batch=True) \
        .union(new.map_batches(align_new, batch_format="pyarrow",
                               zero_copy_batch=True))
    agg = u.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("valued", alias_name="n_valued"),
        Sum("value_c", alias_name="sum_c"))

    def finalize(b: pa.Table) -> pa.Table:
        s = pc.coalesce(b["sum_c"], pa.scalar(0, pa.int64()))
        return pa.table({
            "event_type": b["event_type"],
            "n": b["n"],
            "n_valued": b["n_valued"],
            "sum_value": pc.divide(s.cast(pa.float64()), pa.scalar(100.0)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_SCHEMA_UNION = """
WITH old AS (SELECT event_id, event_type FROM events WHERE event_id % 2 = 0),
new AS (SELECT event_id, event_type, value FROM events WHERE event_id % 2 = 1),
u AS (SELECT * FROM old UNION ALL BY NAME SELECT * FROM new)
SELECT event_type, COUNT(*) AS n, COUNT(value) AS n_valued,
  CAST(COALESCE(SUM(CAST(ROUND(value*100) AS BIGINT)), 0) AS DOUBLE)/100.0
    AS sum_value
FROM u GROUP BY event_type
"""


# =====================================================================
# JSONL sink/source round-trip (the training-data interchange format)
# =====================================================================

def q_jsonl_roundtrip(sf_dir: str):
    """Write documents metadata as JSONL (one object per line — the
    de-facto LLM training-data interchange format), read it back with
    the distributed JSON reader, and aggregate. Ray writes one .json
    fragment per block and reads them back as parallel tasks, so both
    directions stream; the oracle aggregates the source table
    directly, proving the sink→source hop is lossless."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="crawlray_jsonl_")
    try:
        _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"]) \
            .write_json(out)
        back = rd.read_json(out)
        agg = (back.groupby("lang")
               .aggregate(Count(alias_name="n"),
                          Sum("n_chars", alias_name="sum_chars")))
        return pa.Table.from_pylist(agg.take_all())  # one row per lang
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_JSONL_ROUNDTRIP = """
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
"""


# =====================================================================
# right outer join (aggregate-then-outer-join, mirror of left_join)
# =====================================================================

def q_right_join(sf_dir: str):
    """RIGHT OUTER: every customer appears even with zero orders.
    Both sides flow through ONE exchange grouped on a hash of the
    customer key (fact rows carry cents, dimension rows carry the
    segment); each partition folds spend with np.bincount and keeps
    exactly the dimension rows — right-outer semantics with no
    dedicated join exchange and no per-key aggregate machinery."""
    from .sizing import fold_parts

    n_parts = fold_parts()

    def tag_orders(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            hp = ((k.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "k": b["o_custkey"],
            "c": _cents(b["o_totalprice"]),
            "seg": pa.nulls(b.num_rows, pa.string()),
            "hp": pa.array(hp),
        })

    def tag_cust(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            hp = ((k.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "k": b["c_custkey"],
            "c": pa.array(np.zeros(b.num_rows, np.int64)),
            "seg": b["c_mktsegment"],
            "hp": pa.array(hp),
        })

    u = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(tag_orders, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .union(_t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
               .map_batches(tag_cust, batch_format="pyarrow",
                            zero_copy_batch=True))

    def part_join(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy()
        seg = g["seg"].to_numpy()
        is_dim = ~pd.isna(seg)
        uk, inv = np.unique(k, return_inverse=True)
        # float64 bincount of int cents is exact (sums ≪ 2^53)
        spend = np.bincount(inv, weights=g["c"].to_numpy(),
                            minlength=len(uk))
        dim_rows = np.flatnonzero(is_dim)
        return pd.DataFrame({
            "c_custkey": k[dim_rows],
            "c_mktsegment": seg[dim_rows],
            "spend": spend[inv[dim_rows]] / 100.0,
        })

    return u.groupby("hp").map_groups(part_join, batch_format="pandas")


SQL_RIGHT_JOIN = """
SELECT c_custkey, c_mktsegment,
  CAST(COALESCE(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)), 0)
       AS DOUBLE)/100.0 AS spend
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_mktsegment
"""


# =====================================================================
# bucketed co-partitioned join (pre-bucketed storage ⇒ no join shuffle)
# =====================================================================

def q_bucketed_join(sf_dir: str, nbuckets: int = 8):
    """Join + aggregate over CO-PARTITIONED bucketed tables — the
    pattern the brief's \"pick ONE partitioning key and reuse it\"
    rule turns into storage: both orders and customer are written once
    as Hive-partitioned parquet on bucket = custkey % nbuckets, after
    which the per-customer aggregate AND the customer join run
    independently inside each bucket (a custkey lives in exactly one
    bucket, so per-bucket results are globally correct with NO
    cross-bucket exchange — on a real cluster each bucket's shuffle is
    node-local and the dimension bucket is a bounded broadcast). The
    driver folds nothing; results stream as the union of per-bucket
    pipelines. spend is integer cents, so the oracle is bit-exact."""
    import shutil
    import tempfile

    import pyarrow.parquet as papq
    import ray

    root = tempfile.mkdtemp(prefix="crawlray_bucketed_")
    try:
        # ETL: one bucketed write per table, SAME bucket key both sides
        def o_prep(b: pa.Table) -> pa.Table:
            ck = b["o_custkey"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "o_custkey": b["o_custkey"],
                "cents": _cents(b["o_totalprice"]),
                "bucket": pa.array(ck % nbuckets),
            })

        def c_prep(b: pa.Table) -> pa.Table:
            ck = b["c_custkey"].combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "c_custkey": b["c_custkey"],
                "c_mktsegment": b["c_mktsegment"],
                "bucket": pa.array(ck % nbuckets),
            })

        _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
            .map_batches(o_prep, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .write_parquet(os.path.join(root, "orders"),
                           partition_cols=["bucket"])
        _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
            .map_batches(c_prep, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .write_parquet(os.path.join(root, "customer"),
                           partition_cols=["bucket"])

        outs = []
        for bkt in range(nbuckets):
            odir = os.path.join(root, "orders", f"bucket={bkt}")
            cdir = os.path.join(root, "customer", f"bucket={bkt}")
            if not (os.path.isdir(odir) and os.path.isdir(cdir)):
                continue
            cust = papq.read_table(cdir)  # dimension bucket: bounded
            order_key = np.argsort(np.asarray(cust["c_custkey"]))
            dim_ref = ray.put((
                np.asarray(cust["c_custkey"])[order_key],
                np.asarray(cust["c_mktsegment"]).astype(object)[order_key]))

            def local_pipe(b: pa.Table, ref=dim_ref) -> pa.Table:
                # one task per bucket: the task READS its whole bucket
                # dir, then the groupby AND the dimension join run
                # inside it — zero exchange, the point of bucketing
                # (a read_parquet lineage can split a bucket into
                # per-fragment blocks, which would break the local
                # groupby's correctness — a custkey may span fragments)
                keys, segs = ray.get(ref)
                t = papq.read_table(b["dir"][0].as_py(),
                                    columns=["o_custkey", "cents"])
                g = t.group_by("o_custkey").aggregate([("cents", "sum")])
                ck = g["o_custkey"].to_numpy(zero_copy_only=False)
                cents = g["cents_sum"].to_numpy(zero_copy_only=False)
                idx = np.clip(np.searchsorted(keys, ck), 0,
                              max(len(keys) - 1, 0))
                # inner-join gate: drop custkeys with no customer row
                hit = (keys[idx] == ck if len(keys)
                       else np.zeros(len(ck), dtype=bool))
                return pa.table({
                    "c_custkey": pa.array(ck[hit]),
                    "c_mktsegment": pa.array(segs[idx[hit]],
                                             type=pa.string()),
                    "spend": pa.array(cents[hit].astype(np.float64)
                                      / 100.0),
                })

            outs.append(
                rd.from_items([{"dir": odir}])
                .map_batches(local_pipe, batch_format="pyarrow"))

        # columnar pull, not take_all(): |custkeys| rows (see STATUS.md
        # eighth-session perf lesson)
        batches = list(outs[0].union(*outs[1:])
                       .iter_batches(batch_size=65536,
                                     batch_format="pyarrow"))
        tbl = pa.concat_tables(
            [pa.table(b) if not isinstance(b, pa.Table) else b
             for b in batches])
        order = pc.sort_indices(tbl, sort_keys=[("c_custkey", "ascending")])
        tbl = tbl.take(order)
        return pa.table({
            "c_custkey": pc.cast(tbl["c_custkey"], pa.int64()),
            "c_mktsegment": pc.cast(tbl["c_mktsegment"], pa.string()),
            "spend": pc.cast(tbl["spend"], pa.float64()),
        })
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_BUCKETED_JOIN = """
SELECT o_custkey AS c_custkey, c_mktsegment,
  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0
    AS spend
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey, c_mktsegment
"""


# =====================================================================
# equi-width histogram — the zero-shuffle aggregate
# =====================================================================

def q_histogram(sf_dir: str, hi: float = 600000.0, nbins: int = 24):
    """Equi-width histogram of order totals. Scale shape: each block
    folds into a fixed (nbins+2)-slot count/cents pair (np.bincount /
    np.add.at over integer cents), the driver merges ≤ nbins+2 rows per
    block — NO groupby/shuffle exists at any data size, the histogram
    width is a constant independent of row count. Bucket ids use the
    identical IEEE expression on both sides (floor(x*nbins/hi)+1, CASE
    for x ≥ hi) so boundary ulp can never disagree; empty buckets are
    dropped on both sides (GROUP BY only yields non-empty groups)."""
    ds = _t(sf_dir, "orders", ["o_totalprice"])

    def fold(b: pa.Table) -> pa.Table:
        x = b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        bucket = (np.floor(x * float(nbins) / hi) + 1.0).astype(np.int64)
        bucket[x >= hi] = nbins + 1
        cents = _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)
        n = np.bincount(bucket, minlength=nbins + 2)
        tot = np.zeros(nbins + 2, dtype=np.int64)
        np.add.at(tot, bucket, cents)
        nz = np.nonzero(n > 0)[0]
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "n": pa.array(n[nz].astype(np.int64)),
                         "cents": pa.array(tot[nz])})

    rows = ds.map_batches(fold, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    df = (pd.DataFrame(rows).groupby("bucket", as_index=False).sum()
          .sort_values("bucket"))
    return pa.table({
        "bucket": pa.array(df["bucket"].to_numpy().astype(np.int64)),
        "n": pa.array(df["n"].to_numpy().astype(np.int64)),
        "total": pa.array(df["cents"].to_numpy().astype(np.float64) / 100.0),
    })


SQL_HISTOGRAM = """
SELECT CASE WHEN o_totalprice >= 600000.0 THEN 25
            ELSE CAST(FLOOR(o_totalprice * 24.0 / 600000.0) AS BIGINT) + 1
       END AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0
         AS total
FROM orders GROUP BY bucket
"""


# =====================================================================
# deterministic MODE per group (most frequent value, ties → smallest)
# =====================================================================

def q_mode_per_group(sf_dir: str):
    """Most frequent event_type per user (users < 40): per-block
    (user, type) pandas size() combiner shrinks the shuffle to
    block-distinct pairs, ONE multi-key groupby reduces exactly, and
    the per-user arg-max (ties broken to the lexicographically
    smallest type, same ORDER BY as the SQL window) folds over the
    ≤ |users|·|types| aggregate on the driver."""
    import pyarrow.dataset as pads

    ds = _sized_read(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type"],
                         filter=pads.field("user_id") < 40)

    def counts(b: pa.Table) -> pa.Table:
        g = (b.to_pandas().groupby(["user_id", "event_type"], sort=False)
             .size().reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(counts, batch_format="pyarrow")
           .groupby(["user_id", "event_type"])
           .aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas().sort_values(
        ["user_id", "n", "event_type"], ascending=[True, False, True],
        kind="mergesort")
    top = df.groupby("user_id", as_index=False).head(1)
    return pa.table({
        "user_id": pa.array(top["user_id"].to_numpy().astype(np.int64)),
        "top_type": pa.array(top["event_type"], type=pa.string()),
        "n": pa.array(top["n"].to_numpy().astype(np.int64)),
    })


SQL_MODE_PER_GROUP = """
SELECT user_id, event_type AS top_type, n FROM (
  SELECT user_id, event_type, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events WHERE user_id < 40 GROUP BY user_id, event_type)
WHERE rn = 1
"""


# =====================================================================
# skyline / Pareto front (multi-criteria NOT EXISTS dominance)
# =====================================================================

def _pareto_front(df: pd.DataFrame) -> pd.DataFrame:
    """Non-dominated rows under (maximize p_size, minimize
    p_retailprice); duplicates of a front point are all kept (identical
    points never strictly dominate each other — matching NOT EXISTS
    semantics). Sorted scan: one pass over the ≤|distinct sizes| groups."""
    df = df.sort_values(["p_size", "p_retailprice"],
                        ascending=[False, True], kind="mergesort")
    sizes = df["p_size"].to_numpy()
    prices = df["p_retailprice"].to_numpy()
    keep = np.zeros(len(df), dtype=bool)
    best = np.inf
    i = 0
    while i < len(df):
        j = i
        while j < len(sizes) and sizes[j] == sizes[i]:
            j += 1
        m = prices[i]  # min price within this size (sorted asc)
        if m < best:
            keep[i:j] = prices[i:j] == m
            best = m
        i = j
    return df[keep]


def q_skyline(sf_dir: str):
    """Pareto-optimal parts (maximize size, minimize price). Scale
    shape: pareto(∪ of per-block paretos) = global pareto, so every
    block prunes locally (sorted scan over its ≤|distinct sizes|
    groups) and the driver finalizes over ≤ front×blocks survivors —
    the classic NOT-EXISTS self-join (O(n²)) never runs and nothing
    shuffles."""
    ds = _t(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def prune(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_pareto_front(b.to_pandas()),
                                    preserve_index=False)

    rows = ds.map_batches(prune, batch_format="pyarrow").take_all()
    front = _pareto_front(pd.DataFrame(rows)).sort_values("p_partkey")
    return pa.table({
        "p_partkey": pa.array(front["p_partkey"].to_numpy().astype(np.int64)),
        "p_size": pa.array(front["p_size"].to_numpy().astype(np.int32),
                           type=pa.int32()),
        "p_retailprice": pa.array(
            front["p_retailprice"].to_numpy().astype(np.float64)),
    })


SQL_SKYLINE = """
SELECT p.p_partkey, p.p_size, p.p_retailprice FROM part p
WHERE NOT EXISTS (SELECT 1 FROM part q
  WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
    AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice))
"""


# =====================================================================
# CDC compaction: latest record per key (upsert semantics)
# =====================================================================

def q_upsert_latest(sf_dir: str):
    """Change-data-capture compaction — collapse an append-only change
    stream to the LATEST record per key (the upsert/SCD-1 materialize
    every lakehouse table maintenance job runs). Key = (user_id,
    event_type); latest = max (ts, event_id). Scale shape: per-block
    partial latest first (each block reduces to ≤ |keys touched| rows),
    so the ONE groupby shuffle carries at most blocks×keys candidate
    rows — never the stream; the final pick re-applies the identical
    ordering. ``value`` is carried, never recomputed, so floats pass
    through bit-exact (arg_extremes discipline)."""
    ds = _t(sf_dir, "events", ["user_id", "event_type", "event_id",
                               "ts", "value"])

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], ascending=[False, False],
                            kind="mergesort")
        return df.groupby(["user_id", "event_type"], sort=False).head(1)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], ascending=[False, False],
                          kind="mergesort").head(1)
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "event_type": g["event_type"].to_numpy(),
            "last_event_id": g["event_id"].to_numpy(),
            "last_value": g["value"].to_numpy(),
        })

    return (
        ds.map_batches(latest, batch_format="pandas")
          .groupby(["user_id", "event_type"])
          .map_groups(final, batch_format="pandas")
    )


SQL_UPSERT_LATEST = """
SELECT user_id, event_type, event_id AS last_event_id,
       value AS last_value
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


# =====================================================================
# snapshot diff (added / removed / changed between two table versions)
# =====================================================================

def q_dataset_diff(sf_dir: str):
    """Delta between two snapshots of a table — the reconciliation op
    behind every incremental-ingest audit: classify each key as added
    (v2 only), removed (v1 only) or changed (both, different value);
    unchanged keys never leave the pipeline. Fixture versions derive
    deterministically from orders: v1 drops keys %97==0, v2 drops
    %89==0 and bumps the price by 1.00 on keys %11==0. Scale shape:
    BOTH versions are emitted from ONE pass over the table (each block
    tags its rows for v1 and v2 — no second scan), the single exchange
    groups on a small-int hash of the key (same key → same partition),
    and each partition classifies vectorized — no full outer join, no
    per-key aggregate machinery, and matching-and-unchanged keys (the
    overwhelming majority in a real diff) die inside the partition."""
    from .sizing import fold_parts

    n_parts = fold_parts()

    def versions(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)
        m1 = k % 97 != 0
        m2 = k % 89 != 0
        k1, c1 = k[m1], cents[m1].astype(np.float64)
        k2 = k[m2]
        c2 = (cents[m2] + np.where(k2 % 11 == 0, 100, 0)).astype(np.float64)
        kk = np.concatenate([k1, k2])
        side = np.concatenate([np.zeros(len(k1), np.int64),
                               np.ones(len(k2), np.int64)])
        cc = np.concatenate([c1, c2])
        with np.errstate(over="ignore"):
            hp = ((kk.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"k": pa.array(kk), "side": pa.array(side),
                         "c": pa.array(cc), "hp": pa.array(hp)})

    def part_diff(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy()
        side = g["side"].to_numpy()
        c = g["c"].to_numpy()
        uk, inv = np.unique(k, return_inverse=True)
        c1 = np.full(len(uk), np.nan)
        c2 = np.full(len(uk), np.nan)
        c1[inv[side == 0]] = c[side == 0]
        c2[inv[side == 1]] = c[side == 1]
        in1, in2 = ~np.isnan(c1), ~np.isnan(c2)
        keep = ~in1 | ~in2 | (c1 != c2)
        status = np.where(~in1, "added", np.where(~in2, "removed",
                                                  "changed"))
        return pd.DataFrame({
            "o_orderkey": uk[keep],
            "status": status[keep],
            "old_price": c1[keep] / 100.0,
            "new_price": c2[keep] / 100.0,
        })

    return (
        _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .map_batches(versions, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hp")
        .map_groups(part_diff, batch_format="pandas")
    )


SQL_DATASET_DIFF = """
WITH v1 AS (SELECT o_orderkey AS k,
                   CAST(ROUND(o_totalprice*100) AS BIGINT) AS c
            FROM orders WHERE o_orderkey % 97 <> 0),
v2 AS (SELECT o_orderkey AS k,
              CAST(ROUND(o_totalprice*100) AS BIGINT)
              + CASE WHEN o_orderkey % 11 = 0 THEN 100 ELSE 0 END AS c
       FROM orders WHERE o_orderkey % 89 <> 0)
SELECT COALESCE(v1.k, v2.k) AS o_orderkey,
       CASE WHEN v1.k IS NULL THEN 'added'
            WHEN v2.k IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       CAST(v1.c AS DOUBLE)/100.0 AS old_price,
       CAST(v2.c AS DOUBLE)/100.0 AS new_price
FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
WHERE v1.k IS NULL OR v2.k IS NULL OR v1.c <> v2.c
"""


# =====================================================================
# skew join (hot-key broadcast + cold hash join hybrid)
# =====================================================================

def q_skew_join(sf_dir: str, _stats: dict | None = None):
    """Skew-aware join — the hybrid plan for a fact table whose join
    key is heavy-tailed (one key here carries ~25% of all rows, the
    shape that makes a plain hash join's hottest partition the whole
    job's wall clock). Plan: (1) a cheap key-count pass (per-block
    Arrow value_counts, key-bounded fold) finds hot keys; (2) hot fact
    rows join via the BROADCAST dim rows of those few keys (bounded by
    |hot|, however big the dim table is); (3) cold rows take the
    normal hash join, where no partition can explode by construction;
    (4) union → final aggregate. Result is provably identical to the
    plain join (the oracle IS the plain join). The projected fact
    (2 int64 cols) materializes once — it has three consumers (count
    pass, hot split, cold split) and would re-execute per consumer
    otherwise; the object store spills it past memory. Key:
    jk = partkey%100, except 25% of rows (orderkey%4==0) collapse
    onto jk=0."""
    fact = _t(sf_dir, "lineitem",
              ["l_orderkey", "l_partkey", "l_extendedprice"])
    dim = _t(sf_dir, "part", ["p_partkey"])

    def mk_fact(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        jk = np.where(ok % 4 == 0, 0, pk % 100).astype(np.int64)
        return pa.table({"jk": pa.array(jk),
                         "c": _cents(b["l_extendedprice"])})

    def mk_dim(b: pa.Table) -> pa.Table:
        pk = b["p_partkey"].to_numpy(zero_copy_only=False)
        return pa.table({"jk": pa.array((pk % 100).astype(np.int64)),
                         "one": pa.array(np.ones(len(pk), dtype=np.int64))})

    f = fact.map_batches(mk_fact, batch_format="pyarrow",
                         zero_copy_batch=True)
    d = dim.map_batches(mk_dim, batch_format="pyarrow",
                        zero_copy_batch=True) \
        .groupby("jk").aggregate(Sum("one", alias_name="n_parts"))

    # pass 1: per-key fact counts (key-bounded; the hot set is tiny)
    def key_counts(b: pa.Table) -> pa.Table:
        vc = b["jk"].value_counts()
        return pa.table({"jk": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts: dict[int, int] = {}
    for row in f.map_batches(key_counts, batch_format="pyarrow") \
                .take_all():
        counts[int(row["jk"])] = counts.get(int(row["jk"]), 0) + int(row["n"])
    total = sum(counts.values()) or 1
    hot = {k for k, n in counts.items() if n > 0.05 * total}
    if _stats is not None:  # test observability: prove the hot path runs
        _stats["hot"] = set(hot)
        _stats["total"] = total

    d_mat = d.materialize()
    hot_rows = {int(r["jk"]): int(r["n_parts"])
                for r in d_mat.take_all() if int(r["jk"]) in hot}
    hot_ref = ray.put(hot_rows)

    def split_hot(b: pa.Table) -> pa.Table:
        jk = b["jk"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(np.isin(jk, list(hot))))

    def split_cold(b: pa.Table) -> pa.Table:
        jk = b["jk"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(~np.isin(jk, list(hot))))

    def bcast_join(b: pa.Table) -> pa.Table:
        rows = ray.get(hot_ref)
        keys = np.fromiter(rows.keys(), dtype=np.int64, count=len(rows))
        vals = np.fromiter(rows.values(), dtype=np.int64, count=len(rows))
        order = np.argsort(keys)
        keys, vals = keys[order], vals[order]
        jk = b["jk"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(np.isin(jk, keys)))  # inner-join semantics
        jk = b["jk"].to_numpy(zero_copy_only=False)
        return pa.table({
            "jk": b["jk"], "c": b["c"],
            "n_parts": pa.array(vals[np.searchsorted(keys, jk)]),
        })

    f_mat = f.materialize()
    hot_joined = f_mat.map_batches(split_hot, batch_format="pyarrow") \
        .map_batches(bcast_join, batch_format="pyarrow")
    from .sizing import join_parts
    cold_joined = f_mat.map_batches(split_cold, batch_format="pyarrow") \
        .join(d_mat, join_type="inner", num_partitions=join_parts(),
              on=("jk",))

    def partial(b: pa.Table) -> pa.Table:
        """Per-block combiner: the final exchange carries blocks×|keys|
        partial rows, not the full joined fact."""
        g = b.group_by(["jk", "n_parts"]).aggregate(
            [("c", "sum"), ([], "count_all")])
        return pa.table({"jk": g["jk"], "n_parts": g["n_parts"],
                         "c": g["c_sum"], "n": g["count_all"]})

    agg = hot_joined.union(cold_joined) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("jk").aggregate(
            Sum("n", alias_name="n"),
            Sum("c", alias_name="sum_c"),
            Max("n_parts", alias_name="n_parts"))

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "jk": b["jk"], "n_parts": b["n_parts"], "n": b["n"],
            "revenue": pc.divide(pc.cast(b["sum_c"], pa.float64()),
                                 pa.scalar(100.0)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_SKEW_JOIN = """
WITH fact AS (SELECT CASE WHEN l_orderkey % 4 = 0 THEN 0
                          ELSE l_partkey % 100 END AS jk,
                     CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c
              FROM lineitem),
dim AS (SELECT p_partkey % 100 AS jk, COUNT(*) AS n_parts
        FROM part GROUP BY 1)
SELECT f.jk, dim.n_parts, COUNT(*) AS n,
       CAST(SUM(f.c) AS DOUBLE)/100.0 AS revenue
FROM fact f JOIN dim USING (jk)
GROUP BY 1, 2
"""


# =====================================================================
# retention cohorts (cohort month × activity month)
# =====================================================================

def q_retention_cohorts(sf_dir: str):
    """Cohort retention — the product-analytics staple: users grouped
    by first-active month, counted in every month they return. Scale
    shape: a per-block DISTINCT (user, month) combiner shrinks the
    stream before the ONE groupby(user) shuffle (each user's partials
    meet in one group, which re-distincts and emits (cohort=min,
    month) pairs); the second groupby is bounded by months² — both
    shuffles carry 2 small ints per row, never events."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def months(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False)
        y = ts.astype("datetime64[Y]").astype(np.int64) + 1970
        m = (ts.astype("datetime64[M]").astype(np.int64) % 12) + 1
        ym = y * 100 + m
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([uid, ym], axis=1), axis=0)
        return pa.table({"user_id": pa.array(pairs[:, 0]),
                         "ym": pa.array(pairs[:, 1])})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ym = np.unique(g["ym"].to_numpy())
        return pd.DataFrame({
            "cohort": np.full(len(ym), ym.min(), dtype=np.int64),
            "ym": ym,
        })

    pairs = ds.map_batches(months, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("user_id").map_groups(per_user, batch_format="pandas")
    return pairs.groupby(["cohort", "ym"]).aggregate(
        Count(alias_name="n_users"))


SQL_RETENTION_COHORTS = """
WITH act AS (SELECT DISTINCT user_id,
                    year(ts)*100 + month(ts) AS ym FROM events),
coh AS (SELECT user_id, MIN(ym) AS cohort FROM act GROUP BY 1)
SELECT cohort, ym, COUNT(*) AS n_users
FROM act JOIN coh USING (user_id)
GROUP BY 1, 2
"""


# =====================================================================
# z-score outlier detection (exact global moments → broadcast)
# =====================================================================

def q_outlier_docs(sf_dir: str):
    """Length-outlier detection — the z-score quality gate of training
    -data curation: docs whose |z| over n_chars exceeds 1.8. Scale
    shape: pass 1 is an exact (n, Σx, Σx²) int64 reduction (3 numbers
    per block, no shuffle); mean/std derive from those integers with
    the IDENTICAL IEEE expression on both sides, so the rounded z and
    the cut agree bit-for-bit; pass 2 is a block-local filter. No
    per-row float ever aggregates — the corr_stats discipline."""
    ds = _t(sf_dir, "documents", ["doc_id", "n_chars"])

    def moments(b: pa.Table) -> pa.Table:
        x = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"n": pa.array([len(x)], type=pa.int64()),
                         "sx": pa.array([int(x.sum())], type=pa.int64()),
                         "sxx": pa.array([int((x * x).sum())],
                                         type=pa.int64())})

    parts = ds.map_batches(moments, batch_format="pyarrow").take_all()
    n = sum(int(p["n"]) for p in parts)
    sx = sum(int(p["sx"]) for p in parts)
    sxx = sum(int(p["sxx"]) for p in parts)
    # identical expression tree to the SQL: each double op is correctly
    # rounded, so identical operands ⇒ identical bits
    mean = float(sx) / n
    std = math.sqrt((float(sxx) - float(sx) * sx / n) / n)

    def zfilter(b: pa.Table) -> pa.Table:
        x = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        z = pc.round(pa.array((x - mean) / std), ndigits=4,
                     round_mode="half_towards_infinity")
        zn = z.to_numpy(zero_copy_only=False)
        keep = pa.array(np.abs(zn) >= 1.8)
        return pa.table({"doc_id": b["doc_id"].filter(keep),
                         "n_chars": b["n_chars"].filter(keep),
                         "z": z.filter(keep)})

    return ds.map_batches(zfilter, batch_format="pyarrow",
                          zero_copy_batch=True)


SQL_OUTLIER_DOCS = """
WITH m AS (SELECT COUNT(*) AS n, SUM(n_chars) AS sx,
                  SUM(n_chars*n_chars) AS sxx FROM documents),
z AS (SELECT doc_id, n_chars,
             ROUND((n_chars - CAST(sx AS DOUBLE)/n)
                   / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n)/n),
                   4) AS z
      FROM documents, m)
SELECT doc_id, n_chars, z FROM z WHERE ABS(z) >= 1.8
"""


# =====================================================================
# SCD-2 validity intervals (change stream → full history)
# =====================================================================

def q_scd2_intervals(sf_dir: str):
    """Slowly-changing-dimension type 2 — the other half of the CDC
    family next to upsert_latest: turn the change stream into validity
    intervals (value, valid_from, valid_to-open) per key, the layout
    warehouse history tables keep. Scale shape: ONE groupby((user,
    type)) shuffle; the interval assembly is a vectorized shift within
    each group (the PARTITION BY assumption). The still-current last
    version gets the classic warehouse high-date sentinel
    (9999-12-31) rather than NULL — null timestamps compare as
    unequal in value-hash harnesses (NaT != NaT), so an open interval
    must be a concrete value on both sides. Values pass through
    bit-exact."""
    ds = _t(sf_dir, "events", ["user_id", "event_type", "event_id",
                               "ts", "value"])

    def fil(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b["user_id"], pa.scalar(100, pa.int64())))

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]")
        valid_to = np.empty(len(ts), dtype="datetime64[us]")
        valid_to[:-1] = ts[1:]
        valid_to[-1:] = np.datetime64("9999-12-31T00:00:00", "us")
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "event_type": g["event_type"].to_numpy(),
            "value": g["value"].to_numpy(),
            "valid_from": ts,
            "valid_to": valid_to,
        })

    return ds.map_batches(fil, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby(["user_id", "event_type"]) \
        .map_groups(per_key, batch_format="pandas")


SQL_SCD2_INTERVALS = """
SELECT user_id, event_type, value,
       ts AS valid_from,
       COALESCE(LEAD(ts) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id),
                TIMESTAMP '9999-12-31') AS valid_to
FROM events WHERE user_id < 100
"""


# =====================================================================
# rolling distinct count (7-day rolling DAU)
# =====================================================================

def q_rolling_distinct(sf_dir: str):
    """7-day rolling DISTINCT active users per day — the windowed
    distinct aggregate no frame-based engine gets for free (DISTINCT
    inside a window needs a per-window set, not a running sum). Scale
    shape: shuffle 1 groups by user (2 small ints per row); each user
    group dedups its active days and fans every day out to the ≤7
    windows it can serve — at most ONE row per (user, window) leaves
    the group, so shuffle 2's Count(window) is exact with no second
    distinct pass. Window days are clamped to days that exist in the
    data (the day set is bounded → broadcast)."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def to_days(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([uid, day], axis=1), axis=0)
        return pa.table({"user_id": pa.array(pairs[:, 0]),
                         "day": pa.array(pairs[:, 1])})

    day_pairs = ds.map_batches(to_days, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    def block_days(b: pa.Table) -> pa.Table:
        return pa.table({"day": pa.array(
            np.unique(b["day"].to_numpy(zero_copy_only=False)))})

    all_days = np.unique(np.array(
        [r["day"] for r in
         day_pairs.map_batches(block_days,
                               batch_format="pyarrow").take_all()],
        dtype=np.int64))
    days_ref = ray.put(all_days)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        days = np.unique(g["day"].to_numpy())
        wins = np.unique((days[:, None]
                          + np.arange(7, dtype=np.int64)[None, :]).ravel())
        valid = ray.get(days_ref)
        idx = np.searchsorted(valid, wins)
        idx[idx >= len(valid)] = max(len(valid) - 1, 0)
        wins = wins[valid[idx] == wins] if len(valid) else wins[:0]
        return pd.DataFrame({"day": wins,
                             "one": np.ones(len(wins), dtype=np.int64)})

    return day_pairs.groupby("user_id") \
        .map_groups(per_user, batch_format="pandas") \
        .groupby("day").aggregate(Sum("one", alias_name="dau7"))


SQL_ROLLING_DISTINCT = """
WITH act AS (SELECT DISTINCT user_id,
                    datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS day
             FROM events),
days AS (SELECT DISTINCT day FROM act)
SELECT d.day, COUNT(DISTINCT a.user_id) AS dau7
FROM days d JOIN act a ON a.day BETWEEN d.day - 6 AND d.day
GROUP BY 1
"""


# =====================================================================
# triangle counting (graph pattern matching)
# =====================================================================

def q_triangle_count(sf_dir: str):
    """Triangle count over the co-supply graph (suppliers joined by a
    shared part, parts < 200) — the graph-pattern op next to PageRank
    and connected components. Scale shape: the distinct (part, supp)
    projection and the per-part co-pair emission are distributed (each
    part group emits its own bounded supplier pairs; the shuffle
    carries 2 ints per row); the supplier node set is DIMENSION-sized,
    so the deduped edge set folds to the driver and the count is one
    dense A³ trace — the same bounded-state discipline as histogram /
    rollup. A web-scale node set would swap the finale for the
    partitioned node-iterator (broadcast sorted adjacency, per-edge
    neighborhood intersection), exactly as pagerank documents its
    groupby swap. The oracle is the 3-way self-join."""
    import pyarrow.dataset as pads

    ds = _sized_read(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"],
        filter=pads.field("l_partkey") < 200)

    def distinct_ps(b: pa.Table) -> pa.Table:
        p = b["l_partkey"].to_numpy(zero_copy_only=False)
        s = b["l_suppkey"].to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([p, s], axis=1), axis=0)
        return pa.table({"p": pa.array(pairs[:, 0]),
                         "s": pa.array(pairs[:, 1])})

    def co_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sup = np.unique(g["s"].to_numpy())
        if len(sup) < 2:
            return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                                 "v": pd.Series([], dtype=np.int64)})
        iu, iv = np.triu_indices(len(sup), k=1)
        return pd.DataFrame({"u": sup[iu], "v": sup[iv]})

    co = ds.map_batches(distinct_ps, batch_format="pyarrow",
                        zero_copy_batch=True) \
        .groupby("p").map_groups(co_pairs, batch_format="pandas")
    # collect as Arrow batches, NOT take_all(): row-dict conversion is
    # ~1000× slower than a columnar pull at these pair counts (measured
    # 71 s vs <1 s for 87k rows at sf0.1)
    chunks = [np.stack([b["u"].to_numpy(zero_copy_only=False),
                        b["v"].to_numpy(zero_copy_only=False)], axis=1)
              for b in co.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")]
    if not chunks:
        return pa.table({"n_edges": pa.array([0], type=pa.int64()),
                         "triangles": pa.array([0], type=pa.int64())})
    uv = np.unique(np.concatenate(chunks).astype(np.int64), axis=0)
    nodes = np.unique(uv)
    idx = np.searchsorted(nodes, uv)
    # float64 so the matmul hits BLAS (an int64 A³ is ~100× slower
    # scalar code); exact — every entry is an integer count ≪ 2^53
    a = np.zeros((len(nodes), len(nodes)), dtype=np.float64)
    a[idx[:, 0], idx[:, 1]] = 1.0
    a[idx[:, 1], idx[:, 0]] = 1.0
    tri = int(round(np.trace(a @ a @ a))) // 6
    return pa.table({"n_edges": pa.array([len(uv)], type=pa.int64()),
                     "triangles": pa.array([tri], type=pa.int64())})


SQL_TRIANGLE_COUNT = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
            FROM lineitem WHERE l_partkey < 200),
e AS (SELECT DISTINCT a.s AS u, b.s AS v
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s)
SELECT (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT COUNT(*)
        FROM e e1 JOIN e e2 ON e2.u = e1.v
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS triangles
"""


# =====================================================================
# column profiling (data-quality audit: the first query on any new table)
# =====================================================================

_PROFILE_COLS = ["l_discount", "l_extendedprice", "l_linenumber", "l_quantity"]


def q_profile_table(sf_dir: str):
    """Per-column profile of lineitem's numeric columns — row count,
    null count, exact distinct count, min, max: the data-quality audit
    every ingest runs first. Scale shape: counts/min/max come from ONE
    map pass emitting a 4-row partial per block (O(blocks × cols), no
    row ever shuffles) folded by a tiny groupby(col); the exact
    distinct count emits per-block DISTINCT (col, value) pairs — the
    shuffle is bounded by the total distinct-value count, not the row
    count (the same per-block-combiner discipline as count_distinct) —
    through a (col, value) groupby then an O(distinct) count per col.
    Both folds land on ≤ |cols| rows; the driver only zips them."""
    ds = _t(sf_dir, "lineitem", _PROFILE_COLS)

    def partials(b: pa.Table) -> pa.Table:
        col_n, n_n, null_n, mins, maxs = [], [], [], [], []
        for c in _PROFILE_COLS:
            col = b[c]
            v = col.cast(pa.float64())
            mm = pc.min_max(v)
            col_n.append(c)
            n_n.append(b.num_rows)
            null_n.append(col.null_count)
            mins.append(mm["min"].as_py() if mm["min"].is_valid else math.inf)
            maxs.append(mm["max"].as_py() if mm["max"].is_valid else -math.inf)
        return pa.table({
            "col": pa.array(col_n, type=pa.string()),
            "n": pa.array(n_n, type=pa.int64()),
            "nulls": pa.array(null_n, type=pa.int64()),
            "minv": pa.array(mins, type=pa.float64()),
            "maxv": pa.array(maxs, type=pa.float64()),
        })

    stats = {
        r["col"]: r
        for r in ds.map_batches(partials, batch_format="pyarrow",
                                zero_copy_batch=True)
        .groupby("col")
        .aggregate(Sum("n", alias_name="n_rows"),
                   Sum("nulls", alias_name="n_nulls"),
                   Min("minv", alias_name="min_v"),
                   Max("maxv", alias_name="max_v"))
        .take_all()  # bounded: one row per profiled column
    }

    from .sizing import fold_parts

    n_parts = fold_parts()

    def dvals(b: pa.Table) -> pa.Table:
        """Per-block DISTINCT (col, value) pairs, partitioned by a HASH
        of the pair — the exchange groups on a small-int key (n_parts
        distinct values) instead of aggregating ~n_distinct string+float
        groups, which costs ~4× less shuffle machinery for the same
        exactness (same pair → same partition)."""
        cols, vals, parts = [], [], []
        for ci, c in enumerate(_PROFILE_COLS):
            u = pc.unique(b[c].cast(pa.float64()).drop_null())
            u = u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
            # normalize before hashing raw bits: -0.0 == 0.0 but differs
            # bitwise (would land in two partitions and double-count vs
            # COUNT(DISTINCT)); likewise collapse NaN payload variants
            # to the canonical quiet NaN
            vn = u.to_numpy(zero_copy_only=False) + 0.0
            vn[np.isnan(vn)] = np.nan
            u = pa.array(vn, type=pa.float64())
            bits = vn.view(np.uint64)
            salt = np.uint64((ci * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            h = (bits ^ salt) * np.uint64(0xBF58476D1CE4E5B9)
            cols.append(pa.array([c] * len(u), type=pa.string()))
            vals.append(u)
            parts.append((h % np.uint64(n_parts)).astype(np.int64))
        return pa.table({"col": pa.concat_arrays(cols),
                         "v": pa.concat_arrays(vals),
                         "vp": pa.array(np.concatenate(parts))})

    def part_nunique(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: DuckDB COUNT(DISTINCT) skips NULL (already
        # dropped upstream) but counts NaN as a value
        out = g.groupby("col")["v"].nunique(dropna=False)
        return pd.DataFrame({"col": out.index.to_numpy(),
                             "nd": out.to_numpy().astype(np.int64)})

    nd = {
        r["col"]: r["n_distinct"]
        for r in ds.map_batches(dvals, batch_format="pyarrow",
                                zero_copy_batch=True)
        .groupby("vp")
        .map_groups(part_nunique, batch_format="pandas")
        .groupby("col")
        .aggregate(Sum("nd", alias_name="n_distinct"))
        .take_all()  # bounded: one row per profiled column
    }

    cols = sorted(_PROFILE_COLS)
    return pa.table({
        "col": pa.array(cols, type=pa.string()),
        "n_rows": pa.array([stats[c]["n_rows"] for c in cols], pa.int64()),
        "n_nulls": pa.array([stats[c]["n_nulls"] for c in cols], pa.int64()),
        "n_distinct": pa.array([nd[c] for c in cols], pa.int64()),
        "min_v": pa.array([stats[c]["min_v"] for c in cols], pa.float64()),
        "max_v": pa.array([stats[c]["max_v"] for c in cols], pa.float64()),
    })


SQL_PROFILE_TABLE = """
SELECT 'l_discount' AS col, COUNT(*) AS n_rows,
  COUNT(*) - COUNT(l_discount) AS n_nulls,
  COUNT(DISTINCT l_discount) AS n_distinct,
  CAST(MIN(l_discount) AS DOUBLE) AS min_v,
  CAST(MAX(l_discount) AS DOUBLE) AS max_v FROM lineitem
UNION ALL
SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
  COUNT(DISTINCT l_extendedprice),
  CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_linenumber', COUNT(*), COUNT(*) - COUNT(l_linenumber),
  COUNT(DISTINCT l_linenumber),
  CAST(MIN(l_linenumber) AS DOUBLE), CAST(MAX(l_linenumber) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
  COUNT(DISTINCT l_quantity),
  CAST(MIN(l_quantity) AS DOUBLE), CAST(MAX(l_quantity) AS DOUBLE)
FROM lineitem
"""


# =====================================================================
# exact per-group quantiles (PERCENTILE_DISC ... GROUP BY)
# =====================================================================

def q_group_quantiles(sf_dir: str):
    """Exact p25/p50 of l_quantity per l_returnflag — PERCENTILE_DISC
    per group. One groupby(flag) shuffle carrying 2 columns, then a
    vectorized per-group sort + integer-exact rank lookup (index =
    ⌈q·n⌉, computed in integers so no float ⌈0.9·10⌉=10-style rounding
    trap exists; verified = DuckDB's discrete-percentile semantics).
    Partitioning assumption: one group's values fit a worker — the
    PARTITION BY contract; a skewed group generalizes to the
    median_selection two-pass histogram per group (same code path,
    grouped histograms)."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def per_flag(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["l_quantity"].to_numpy().astype(np.float64))
        n = len(v)
        p25 = v[max(0, -(-n // 4) - 1)]
        p50 = v[max(0, -(-n // 2) - 1)]
        return pd.DataFrame({"l_returnflag": [g["l_returnflag"].iloc[0]],
                             "p25": [p25], "p50": [p50]})

    return ds.groupby("l_returnflag").map_groups(per_flag,
                                                 batch_format="pandas")


SQL_GROUP_QUANTILES = """
SELECT l_returnflag,
  CAST(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE)
    AS p25,
  CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE)
    AS p50
FROM lineitem GROUP BY l_returnflag
"""


# =====================================================================
# sort-based storage layout + zone-map (min/max) pruned scan
# =====================================================================

def q_sorted_layout(sf_dir: str):
    """Sort-ordered storage layout: lineitem (3 pruned columns) is
    range-sorted by l_shipdate and written once, so every output file
    covers a narrow shipdate range and its parquet min/max statistics
    become ZONE MAPS — the read back applies a 3-month predicate as a
    parquet filter and row groups outside the range never decompress
    (tests/test_analytics_ops.py proves the pruning on the fragment
    stats: matching row groups ≪ total). At 100 TB this is THE scan
    optimization: one sort at ingest buys every time-ranged query a
    ~(range/total) scan fraction. The aggregate itself is bounded
    (one row per month) and integer-cents exact.

    The sorted layout is written under ``CRAWLRAY_SCRATCH_ROOT`` — on a
    multi-node cluster point it at shared storage (NFS / fuse-mounted
    object store) so write_parquet tasks on remote workers land where
    the read-back (and cleanup) can see them; the /tmp default is a
    single-node convenience only (same discipline as
    ``CRAWLRAY_INDEX_ROOT``)."""
    import shutil
    import tempfile

    import pyarrow.dataset as pads

    ds = _t(sf_dir, "lineitem",
            ["l_shipdate", "l_extendedprice", "l_discount"])
    scratch = os.environ.get("CRAWLRAY_SCRATCH_ROOT")
    if scratch:
        os.makedirs(scratch, exist_ok=True)
    out_dir = tempfile.mkdtemp(prefix="crawlray_sorted_", dir=scratch)
    try:
        ds.sort("l_shipdate").write_parquet(out_dir)
        lo = np.datetime64("1997-01-01", "us")
        hi = np.datetime64("1997-04-01", "us")
        back = _sized_read(
            out_dir,
            filter=(pads.field("l_shipdate") >= lo)
                   & (pads.field("l_shipdate") < hi),
        )

        def prep(b: pa.Table) -> pa.Table:
            disc = _cents(b["l_discount"])       # discount fraction ×100
            price = _cents(b["l_extendedprice"])  # cents
            # revenue = price·(1-disc) in exact integer 1e-4-dollar units
            rev = pc.multiply(price, pc.subtract(pa.scalar(100, pa.int64()),
                                                 disc))
            return pa.table({
                "month": pc.floor_temporal(b["l_shipdate"], unit="month"),
                "rev4": rev,
            })

        rows = (
            back.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("month")
            .aggregate(Count(alias_name="n"), Sum("rev4", alias_name="rev4"))
            .take_all()  # bounded: one row per month in the window
        )
        t = pa.Table.from_pylist(rows)
        return pa.table({
            "month": t["month"],
            "n": t["n"],
            "revenue": pc.divide(t["rev4"].cast(pa.float64()),
                                 pa.scalar(10000.0)),
        })
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_SORTED_LAYOUT = """
SELECT date_trunc('month', l_shipdate) AS month, COUNT(*) AS n,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE)
    / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
GROUP BY 1
"""


# =====================================================================
# diversified top-k (global top-k with a per-group cap)
# =====================================================================

def q_topk_diversified(sf_dir: str, k: int = 10, per_group: int = 2):
    """Global top-10 lineitems by revenue with AT MOST 2 per supplier —
    the diversity-constrained ranking every retrieval/feed layer runs
    (plain top-k returns one hot supplier's rows). Three bounded
    prunes, no global sort: (1) per block, each supplier keeps its
    local top-2 (safe: a supplier's global #i≤2 row has at most i−1
    better rows anywhere, so it survives any block-local top-2);
    (2) one supplier groupby re-ranks the surviving candidates to the
    true per-supplier top-2; (3) per-block partial top-10 + an
    O(k·blocks) driver merge. Deterministic ties:
    (rev DESC, orderkey, linenumber) everywhere, mirrored in the
    oracle's window ordering."""
    ds = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice",
             "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        r = pc.multiply(b["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({
            "l_suppkey": b["l_suppkey"],
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": b["l_linenumber"],
            "rev_c4": _cents(r, 10000),
        })
        df = t.to_pandas().sort_values(
            ["rev_c4", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby("l_suppkey", sort=False).head(per_group),
            preserve_index=False)

    def supp_top(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["rev_c4", "l_orderkey", "l_linenumber"],
                             ascending=[False, True, True],
                             kind="mergesort").head(per_group)

    def partial_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["rev_c4", "l_orderkey", "l_linenumber"],
                              ascending=[False, True, True],
                              kind="mergesort").head(k)

    cand = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_suppkey")
        .map_groups(supp_top, batch_format="pandas")
        .map_batches(partial_top, batch_format="pandas")
    )
    merged = pd.concat(
        [b for b in cand.iter_batches(batch_format="pandas")],
        ignore_index=True,
    ).sort_values(["rev_c4", "l_orderkey", "l_linenumber"],
                  ascending=[False, True, True], kind="mergesort").head(k)
    return pa.table({
        "l_orderkey": pa.array(merged["l_orderkey"].to_numpy()),
        "l_linenumber": pa.array(merged["l_linenumber"].to_numpy()
                                 .astype(np.int64)),
        "l_suppkey": pa.array(merged["l_suppkey"].to_numpy()),
        "revenue": pa.array(merged["rev_c4"].to_numpy()
                            .astype(np.float64) / 10000.0),
    })


SQL_TOPK_DIVERSIFIED = """
WITH scored AS (
  SELECT l_orderkey, l_linenumber, l_suppkey,
    CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT) AS rev_c4,
    ROW_NUMBER() OVER (PARTITION BY l_suppkey
                       ORDER BY CAST(ROUND(l_extendedprice*(1.0-l_discount)
                                           *10000) AS BIGINT) DESC,
                                l_orderkey, l_linenumber) AS rn
  FROM lineitem)
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_suppkey, CAST(rev_c4 AS DOUBLE)/10000.0 AS revenue
FROM scored WHERE rn <= 2
ORDER BY rev_c4 DESC, l_orderkey, l_linenumber
LIMIT 10
"""


# =====================================================================
# time-weighted average (interval-weighted state value per user)
# =====================================================================

def q_time_weighted_avg(sf_dir: str):
    """Per-user TIME-WEIGHTED mean of `value` — each reading holds
    until the next one, so it weighs by its interval (the correct
    average for sampled gauges/sensors; the arithmetic mean over-weighs
    bursts). One groupby(user) shuffle carrying 3 small columns, then a
    vectorized per-group pass: sort by (ts, event_id), weight =
    microseconds to the next reading (last reading weighs 0 — no
    successor bounds its interval; users with one reading drop, as
    their total weight is 0). Exactness: value is cents-scaled to
    int64, weights are int64 µs; both sums are exact int64 (< 2^63)
    and the result is rounded to 6 dp on both sides (DuckDB widens
    BIGINT sums to HUGEINT, whose division differs by ~1 ulp)."""
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(ts) < 2:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "twa": pd.Series([], dtype=np.float64)})
        v_c = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        w = ts[1:] - ts[:-1]
        # accumulate through Python ints (arbitrary precision): int64
        # products v_c*w wrap silently near 2^63 (~1e4 cents × 1e11 us ×
        # 1e4 rows) where DuckDB's HUGEINT SUM stays exact
        num = int((v_c[:-1].astype(object) * w.astype(object)).sum())
        den = int(w.astype(object).sum())
        if den == 0:  # all readings share one timestamp (HAVING mirror)
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "twa": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            # 6-dp rounding on both sides: DuckDB's BIGINT SUM widens to
            # HUGEINT, whose division tree differs from ours by ~1 ulp
            "twa": [round(num / den / 100.0, 6)],
        })

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


SQL_TIME_WEIGHTED_AVG = """
WITH w AS (
  SELECT user_id, CAST(ROUND(value*100) AS BIGINT) AS v_c,
    date_diff('microsecond', ts,
              LEAD(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id)) AS wt
  FROM events)
SELECT user_id,
  ROUND(CAST(SUM(v_c * wt) AS DOUBLE) / SUM(wt) / 100.0, 6) AS twa
FROM w WHERE wt IS NOT NULL
GROUP BY user_id HAVING SUM(wt) > 0
"""


# =====================================================================
# degree distribution (graph-stats family next to pagerank/triangles)
# =====================================================================

def q_degree_distribution(sf_dir: str):
    """Degree histogram of the part–supplier bipartite graph: how many
    parts have exactly d distinct suppliers — the degree-distribution
    audit every graph pipeline starts with (skew in it predicts every
    downstream hot spot). Two bounded folds: per-block distinct
    (part, supp) pairs → one part-hash exchange counting each part's
    distinct suppliers per partition → an O(distinct-degrees) driver
    histogram. The full fact table never aggregates per key."""
    from .sizing import fold_parts

    ds = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    n_parts = fold_parts()

    def pairs(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        k = g["l_partkey"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            hp = ((k.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"p": g["l_partkey"], "s": g["l_suppkey"],
                         "hp": pa.array(hp)})

    def part_degrees(g: pd.DataFrame) -> pd.DataFrame:
        deg = g.groupby("p")["s"].nunique()
        hist = deg.value_counts()
        return pd.DataFrame({"degree": hist.index.to_numpy()
                             .astype(np.int64),
                             "n_parts": hist.to_numpy().astype(np.int64)})

    rows = (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hp")
        .map_groups(part_degrees, batch_format="pandas")
        .groupby("degree")
        .aggregate(Sum("n_parts", alias_name="n_parts"))
    )
    return rows


SQL_DEGREE_DISTRIBUTION = """
SELECT degree, COUNT(*) AS n_parts FROM (
  SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS degree
  FROM lineitem GROUP BY l_partkey)
GROUP BY degree
"""


# =====================================================================
# relational division (the FOR-ALL query: has every value of a domain)
# =====================================================================

def q_relational_division(sf_dir: str):
    """Customers who placed orders in EVERY order-priority class —
    relational division, the classic FOR-ALL shape (suppliers-who-
    supply-all-parts). Engine plan: per-block DISTINCT (custkey,
    priority) pairs → ONE exchange grouped on a hash of the customer
    key → per-partition nunique compared against the domain size
    (itself a tiny distinct, broadcast as one int). No NOT-EXISTS
    double negation, no self-join — the count-distinct-equals-domain
    formulation every warehouse uses."""
    from .sizing import fold_parts

    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    n_parts = fold_parts()
    n_domain = len(_t(sf_dir, "orders", ["o_orderpriority"])
                   .unique("o_orderpriority"))

    def pairs(b: pa.Table) -> pa.Table:
        g = b.group_by(["o_custkey", "o_orderpriority"]).aggregate([])
        k = g["o_custkey"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            hp = ((k.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"k": g["o_custkey"], "p": g["o_orderpriority"],
                         "hp": pa.array(hp)})

    def part_division(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("k")["p"].nunique()
        full = nd[nd == n_domain].index.to_numpy()
        return pd.DataFrame({"o_custkey": np.sort(full)})

    return (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hp")
        .map_groups(part_division, batch_format="pandas")
    )


SQL_RELATIONAL_DIVISION = """
SELECT o_custkey FROM orders
GROUP BY o_custkey
HAVING COUNT(DISTINCT o_orderpriority) =
  (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
"""


# =====================================================================
# date spine / gap filling (dense time series from sparse events)
# =====================================================================

def q_date_spine(sf_dir: str):
    """Gap-filled monthly series: urgent orders of a sparse customer
    slice aggregated by month, then LEFT-JOINED onto a dense month
    spine so empty months surface as zero rows — the reporting
    pattern every dashboard needs (a groupby alone silently drops
    empty buckets). Scale shape: the aggregate is the only
    distributed work (per-block partials — month count is bounded);
    the spine is generated, not scanned, and the fill is an O(months)
    driver reindex. Spine range is fixed [1995-01, 2001-12] on both
    sides so the result doesn't depend on which months happen to have
    data."""
    import pyarrow.dataset as pads

    ds = _sized_read(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority", "o_orderdate",
                 "o_totalprice"],
        filter=pads.field("o_custkey") < 150,
    )

    def prep(b: pa.Table) -> pa.Table:
        m = pc.equal(b["o_orderpriority"], pa.scalar("1-URGENT"))
        t = b.filter(m)
        g = pa.table({
            "month": pc.floor_temporal(t["o_orderdate"], unit="month"),
            "c": _cents(t["o_totalprice"]),
        }).group_by("month").aggregate([("c", "sum"), ([], "count_all")])
        return pa.table({"month": g["month"], "c": g["c_sum"],
                         "n": g["count_all"]})

    rows = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("month")
        .aggregate(Sum("c", alias_name="c"), Sum("n", alias_name="n"))
        .take_all()  # bounded: one row per month with data
    )
    have = {pd.Timestamp(r["month"]): (int(r["n"]), int(r["c"]))
            for r in rows}
    spine = pd.date_range("1995-01-01", "2001-12-01", freq="MS")
    return pa.table({
        "month": pa.array(spine.values.astype("datetime64[us]")),
        "n_orders": pa.array([have.get(m, (0, 0))[0] for m in spine],
                             pa.int64()),
        "total": pa.array([have.get(m, (0, 0))[1] / 100.0 for m in spine],
                          pa.float64()),
    })


SQL_DATE_SPINE = """
WITH spine AS (
  SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                TIMESTAMP '2001-12-01',
                                INTERVAL 1 MONTH)) AS month
), agg AS (
  SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n,
    SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS c
  FROM orders
  WHERE o_custkey < 150 AND o_orderpriority = '1-URGENT'
  GROUP BY 1)
SELECT spine.month, COALESCE(agg.n, 0) AS n_orders,
  CAST(COALESCE(agg.c, 0) AS DOUBLE)/100.0 AS total
FROM spine LEFT JOIN agg USING (month)
"""


# =====================================================================
# incremental view maintenance (merge a delta into a stored aggregate)
# =====================================================================

def q_incremental_agg(sf_dir: str):
    """Materialized-view maintenance: a stored per-priority aggregate
    (orders with o_orderkey % 10 ≠ 0 — "yesterday's view") absorbs a
    DELTA batch (the % 10 = 0 rows) by merging per-group partials.
    The merge step touches O(groups) rows, never the base data — the
    point of incremental computation at 100 TB (the delta is a
    trickle; the view is the ocean; in a real deployment the delta
    arrives as its own partition, while this fixture derives both
    sides from one table). Sum/count merge additively; the oracle is
    the full recompute over everything, so the correctness gate IS the
    view-maintenance invariant: merge(view, delta) ≡ recompute(all).
    Both sides integer-cents exact."""
    def agg_of(pred_mod_keep):
        ds = _t(sf_dir, "orders",
                ["o_orderkey", "o_orderpriority", "o_totalprice"])

        def prep(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            keep = (k % 10 != 0) if pred_mod_keep else (k % 10 == 0)
            t = b.filter(pa.array(keep))
            g = pa.table({
                "priority": t["o_orderpriority"],
                "c": _cents(t["o_totalprice"]),
            }).group_by("priority").aggregate(
                [("c", "sum"), ([], "count_all")])
            return pa.table({"priority": g["priority"], "c": g["c_sum"],
                             "n": g["count_all"]})

        return (
            ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("priority")
            .aggregate(Sum("c", alias_name="c"), Sum("n", alias_name="n"))
            .take_all()  # bounded: one row per priority
        )

    view = {r["priority"]: [r["c"], r["n"]] for r in agg_of(True)}
    for r in agg_of(False):            # merge the delta INTO the view
        cur = view.setdefault(r["priority"], [0, 0])
        cur[0] += r["c"]
        cur[1] += r["n"]

    prios = sorted(view)
    return pa.table({
        "o_orderpriority": pa.array(prios, type=pa.string()),
        "n_orders": pa.array([view[p][1] for p in prios], pa.int64()),
        "total": pa.array([view[p][0] / 100.0 for p in prios],
                          pa.float64()),
    })


SQL_INCREMENTAL_AGG = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0
    AS total
FROM orders GROUP BY o_orderpriority
"""


# =====================================================================
# robust dispersion: median absolute deviation per group
# =====================================================================

def q_mad_per_group(sf_dir: str):
    """Median + MAD (median absolute deviation) of l_quantity per
    l_returnflag — the robust outlier-scale statistic (outlier_docs'
    z-score breaks on heavy tails; MAD does not). One groupby(flag)
    shuffle carrying 2 columns, then a vectorized per-group pass: both
    medians are numpy's interpolated median, which is bit-equal to
    DuckDB's median()/mad() on these integer-valued doubles (halves are
    exact in binary). Group-fits-a-worker assumption as in
    group_quantiles; the scale path is the two-pass selection histogram
    per group."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def per_flag(g: pd.DataFrame) -> pd.DataFrame:
        v = g["l_quantity"].to_numpy().astype(np.float64)
        med = np.median(v)
        return pd.DataFrame({"l_returnflag": [g["l_returnflag"].iloc[0]],
                             "med": [med],
                             "mad": [np.median(np.abs(v - med))]})

    return ds.groupby("l_returnflag").map_groups(per_flag,
                                                 batch_format="pandas")


SQL_MAD_PER_GROUP = """
SELECT l_returnflag, CAST(median(l_quantity) AS DOUBLE) AS med,
  CAST(mad(l_quantity) AS DOUBLE) AS mad
FROM lineitem GROUP BY l_returnflag
"""


# =====================================================================
# TPC-H Q18 shape: grouped-HAVING semi join (large-quantity orders)
# =====================================================================

def q_large_order_customers(sf_dir: str, min_qty: int = 300):
    """TPC-H Q18 family: orders whose TOTAL lineitem quantity exceeds a
    threshold, joined back to orders + customer — the grouped-HAVING
    derived table as a semi-join build side. Scale plan: (1) per-block
    Arrow group_by(l_orderkey) partial sums shrink the fact stream
    before its ONE hash-partition fold (same shape as
    shipping_priority); (2) the HAVING filter makes the qualifying set
    tiny, so it broadcasts as a sorted key array (count-guarded with a
    Dataset.join fallback); (3) orders stream against the broadcast
    with no exchange, and the ≤|qualifying| result rows pull their
    customer names through a filtered dimension read — no corpus-sized
    customer broadcast."""
    import pyarrow.dataset as pads

    from .relational import _BROADCAST_KEY_LIMIT
    from .sizing import fold_parts, join_parts

    n_parts = fold_parts()
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        g = pa.table({
            "l_orderkey": b["l_orderkey"],
            "qty": b["l_quantity"].cast(pa.int64()),
        }).group_by("l_orderkey").aggregate([("qty", "sum")])
        okey = g["l_orderkey"].to_numpy(zero_copy_only=False)
        kp = (_splitmix64(okey.astype(np.int64)).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return g.append_column("kp", pa.array(kp))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("l_orderkey", sort=False)["qty_sum"].sum()
        s = s[s > min_qty]
        return pd.DataFrame({"o_orderkey": s.index.to_numpy(np.int64),
                             "sum_qty": s.to_numpy(np.int64)})

    # materialize the HAVING output (bounded): count() and the key pull
    # below would otherwise each re-execute the fact-sized pipeline
    big = (li.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .materialize())

    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
    if big.count() > _BROADCAST_KEY_LIMIT:
        # enormous qualifying set: full hash-join plan
        hit = orders.join(big, join_type="inner",
                          num_partitions=join_parts(), on=("o_orderkey",))
        hit = hit.map_batches(
            lambda b: b.append_column(
                "total_cents", _cents(b["o_totalprice"]))
            .drop_columns(["o_totalprice"]),
            batch_format="pyarrow")
        cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
        out = hit.join(cust, join_type="inner",
                       num_partitions=join_parts(),
                       on=("o_custkey",), right_on=("c_custkey",))
        return out.map_batches(
            lambda b: b.append_column(
                "c_custkey", b["o_custkey"]).drop_columns(["o_custkey"]),
            batch_format="pyarrow")
    rows = pa.concat_tables(
        list(big.iter_batches(batch_size=65536, batch_format="pyarrow"))
        or [pa.table({"o_orderkey": pa.array([], pa.int64()),
                      "sum_qty": pa.array([], pa.int64())})])
    order_keys = rows["o_orderkey"].to_numpy(zero_copy_only=False)
    srt = np.argsort(order_keys)
    keys = order_keys[srt]
    qtys = rows["sum_qty"].to_numpy(zero_copy_only=False)[srt]
    keys_ref = ray.put((keys, qtys))

    def semi(b: pa.Table) -> pa.Table:
        ks, qs = ray.get(keys_ref)
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, ok)
        idx[idx >= len(ks)] = 0
        hit = (ks[idx] == ok) if len(ks) else np.zeros(len(ok), bool)
        b = b.filter(pa.array(hit))
        ok2 = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": b["o_custkey"],
            "o_orderkey": b["o_orderkey"],
            "o_orderdate": b["o_orderdate"],
            "total_cents": _cents(b["o_totalprice"]),
            "sum_qty": pa.array(qs[np.searchsorted(ks, ok2)]),
        })

    hits = orders.map_batches(semi, batch_format="pyarrow")

    def add_names(b: pa.Table) -> pa.Table:
        # ≤|qualifying| rows total: pull ONLY the needed customer rows
        # through a filtered dimension read (row-group pruned)
        cks = sorted(set(b["c_custkey"].to_pylist()))
        t = pads.dataset(os.path.join(sf_dir, "customer.parquet")) \
            .to_table(columns=["c_custkey", "c_name"],
                      filter=pads.field("c_custkey").isin(cks))
        nm = dict(zip(t["c_custkey"].to_pylist(), t["c_name"].to_pylist()))
        return b.append_column(
            "c_name",
            pa.array([nm[k] for k in b["c_custkey"].to_pylist()],
                     type=pa.string()))

    return hits.map_batches(add_names, batch_format="pyarrow")


SQL_LARGE_ORDER_CUSTOMERS = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


# =====================================================================
# TPC-H Q21 shape: multi-EXISTS/NOT-EXISTS self-join on the fact table
# =====================================================================

def q_sole_returning_supplier(sf_dir: str):
    """TPC-H Q21 family: suppliers who were the ONLY supplier with a
    returned line ('R') on a multi-supplier order — the
    EXISTS + NOT-EXISTS double self-join on lineitem, expressed without
    ever joining the fact table to itself. Scale plan: per-block
    DISTINCT (orderkey, suppkey, max returned-bit) combiner → ONE
    orderkey-hash exchange where each partition derives per-order
    supplier counts and returned-supplier counts locally → qualifying
    (suppkey) rows fold per-partition into (suppkey, cnt) partials →
    a dimension-bounded groupby(suppkey) → broadcast supplier names.
    The two EXISTS subqueries cost one shuffle total."""
    import pyarrow.dataset as pads

    from .sizing import fold_parts

    n_parts = fold_parts()
    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_returnflag"])

    def prep(b: pa.Table) -> pa.Table:
        # NO per-block combiner here: (orderkey, suppkey) pairs are
        # already ~unique per block on this fact table, so a two-key
        # Arrow group_by per block costs seconds and shrinks nothing
        # (measured) — the partition fold dedups instead
        ret = pc.cast(pc.equal(b["l_returnflag"], pa.scalar("R")),
                      pa.int64())
        okey = b["l_orderkey"].to_numpy(zero_copy_only=False)
        kp = (_splitmix64(okey.astype(np.int64)).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "l_orderkey": b["l_orderkey"], "l_suppkey": b["l_suppkey"],
            "ret": ret, "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["l_orderkey", "l_suppkey"], sort=False)["ret"] \
            .max().reset_index()
        ordstats = per.groupby("l_orderkey", sort=False).agg(
            n_supp=("l_suppkey", "size"), n_ret=("ret", "sum"))
        per = per.join(ordstats, on="l_orderkey")
        hit = per[(per["ret"] == 1) & (per["n_ret"] == 1)
                  & (per["n_supp"] >= 2)]
        cnt = hit.groupby("l_suppkey", sort=False).size()
        return pd.DataFrame({"l_suppkey": cnt.index.to_numpy(np.int64),
                             "numwait": cnt.to_numpy(np.int64)})

    partials = (li.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("kp").map_groups(fold, batch_format="pandas"))
    # final supplier fold on the driver: the partials are bounded by
    # |suppliers| × n_partitions skinny int rows, and a Ray Aggregate
    # over ~1000 groups pays all-to-all machinery for a bincount's
    # worth of work (the r3 few-group-aggregate lesson, measured ~7 s
    # → ~0 here)
    rows = pa.concat_tables(
        list(partials.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"))
        or [pa.table({"l_suppkey": pa.array([], pa.int64()),
                      "numwait": pa.array([], pa.int64())})])
    sk = rows["l_suppkey"].to_numpy(zero_copy_only=False)
    nw = rows["numwait"].to_numpy(zero_copy_only=False)
    uk, inv = np.unique(sk, return_inverse=True)
    tot = np.bincount(inv, weights=nw).astype(np.int64)
    t = pads.dataset(os.path.join(sf_dir, "supplier.parquet")) \
        .to_table(columns=["s_suppkey", "s_name"],
                  filter=pads.field("s_suppkey").isin(uk.tolist()))
    nm = dict(zip(t["s_suppkey"].to_pylist(), t["s_name"].to_pylist()))
    return pa.table({
        "s_name": pa.array([nm[int(k)] for k in uk], type=pa.string()),
        "numwait": pa.array(tot),
    })


SQL_SOLE_RETURNING_SUPPLIER = """
WITH per AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
  FROM lineitem GROUP BY 1, 2),
ord AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(ret) AS n_ret
  FROM per GROUP BY 1)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per p
JOIN ord o ON p.l_orderkey = o.l_orderkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.ret = 1 AND o.n_ret = 1 AND o.n_supp >= 2
GROUP BY 1
"""


# =====================================================================
# TPC-H Q22 shape: scalar-average subquery + NOT EXISTS anti join
# =====================================================================

def q_idle_rich_customers(sf_dir: str):
    """TPC-H Q22 family: customers with above-average (positive)
    account balance and NO high-value order (the fixture gives nearly
    every customer SOME order, so the NOT EXISTS is scoped to orders
    above 350k to stay non-degenerate at every sf), per nation. Scale
    plan:
    the scalar AVG is an exact (Σ cents, n) two-int fold (no float
    average exists — the filter is the integer cross-multiply
    cents·n > Σ, above_avg's trick); the NOT EXISTS is the broadcast
    anti-join: distinct o_custkey per block → count-guarded sorted key
    broadcast (Dataset.join fallback past the guard); the final
    aggregate is a per-block partial over ≤|nations| groups."""
    from .relational import _BROADCAST_KEY_LIMIT
    from .sizing import join_parts

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(b: pa.Table) -> pa.Table:
        cents = _cents(b["c_acctbal"])
        pos = pc.greater(cents, pa.scalar(0, pa.int64()))
        kept = cents.filter(pos)
        return pa.table({
            "s": pa.array([pc.sum(kept).as_py() or 0], pa.int64()),
            "n": pa.array([len(kept)], pa.int64()),
        })

    parts = cust.map_batches(bal_partial, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    tot_s = sum(int(p["s"]) for p in parts)
    tot_n = sum(int(p["n"]) for p in parts)

    import pyarrow.dataset as pads

    # materialized: count() and the key pull below must not re-execute
    active = _sized_read(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"],
        filter=pads.field("o_totalprice") > 350000.0,
    ).map_batches(
        lambda b: b.group_by("o_custkey").aggregate([]),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    if active.count() > _BROADCAST_KEY_LIMIT:
        flagged = cust.join(
            active.map_batches(
                lambda b: b.append_column(
                    "_hit", pa.array([1] * b.num_rows, pa.int64())),
                batch_format="pyarrow"),
            join_type="left_outer", num_partitions=join_parts(),
            on=("c_custkey",), right_on=("o_custkey",))
        idle = flagged.map_batches(
            lambda b: b.filter(pc.is_null(b["_hit"]))
            .select(["c_nationkey", "c_acctbal"]),
            batch_format="pyarrow")
    else:
        keys = np.unique(np.concatenate(
            [b["o_custkey"].to_numpy(zero_copy_only=False)
             for b in active.iter_batches(batch_size=65536,
                                          batch_format="pyarrow")]
            or [np.empty(0, np.int64)]).astype(np.int64))
        keys_ref = ray.put(keys)

        def anti(b: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            ck = b["c_custkey"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(ks, ck)
            idx[idx >= len(ks)] = 0
            hit = (ks[idx] == ck) if len(ks) else np.zeros(len(ck), bool)
            return b.filter(pa.array(~hit)) \
                .select(["c_nationkey", "c_acctbal"])

        idle = cust.map_batches(anti, batch_format="pyarrow")

    def nat_partial(b: pa.Table) -> pa.Table:
        cents = _cents(b["c_acctbal"]).to_numpy(zero_copy_only=False)
        rich = cents * tot_n > tot_s   # exact: c_acctbal > AVG(positive)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)[rich]
        cents = cents[rich]
        uk, inv = np.unique(nk, return_inverse=True)
        return pa.table({
            "c_nationkey": pa.array(uk.astype(np.int64)),
            "numcust": pa.array(np.bincount(inv).astype(np.int64)),
            "totacctbal_cents": pa.array(
                np.bincount(inv, weights=cents).astype(np.int64)),
        })

    return (idle.map_batches(nat_partial, batch_format="pyarrow")
            .groupby("c_nationkey")
            .aggregate(Sum("numcust", alias_name="numcust"),
                       Sum("totacctbal_cents",
                           alias_name="totacctbal_cents")))


SQL_IDLE_RICH_CUSTOMERS = """
WITH s AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS tot,
         COUNT(*) AS n
  FROM customer WHERE ROUND(c_acctbal * 100) > 0)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_cents
FROM customer c, s
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * s.n > s.tot
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 350000.0)
GROUP BY c_nationkey
"""


# =====================================================================
# inequality pair join: per-customer price inversions (IEJoin class)
# =====================================================================

def q_order_inversions(sf_dir: str):
    """Inequality self-join (IEJoin class, Khayyat et al. 2015): count,
    per customer, order pairs where the EARLIER order was the more
    expensive one (date <, totalprice >) — two inequality predicates,
    no equality beyond the partition key. Scale plan: the only exchange
    is ONE hash partition on o_custkey; each partition counts its
    customers' inversions locally (per-customer O(k²) bit-mask count —
    orders-per-customer is naturally bounded, the documented
    partitioning assumption; swap the inner kernel for a BIT/merge
    count if a key ever carries millions of orders). The O(n²)
    cross-partition matrix never exists; the SQL oracle runs exactly
    that self-join."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    orders = _t(sf_dir, "orders",
                ["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(ck).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "o_custkey": b["o_custkey"],
            "date_us": b["o_orderdate"].cast(pa.int64()),
            "cents": _cents(b["o_totalprice"]),
            "kp": pa.array(kp),
        })

    def count_inv(g: pd.DataFrame) -> pd.DataFrame:
        out_k, out_c = [], []
        for ck, sub in g.groupby("o_custkey", sort=False):
            d = sub["date_us"].to_numpy()
            t = sub["cents"].to_numpy()
            cnt = int(((d[:, None] < d[None, :])
                       & (t[:, None] > t[None, :])).sum())
            if cnt:
                out_k.append(int(ck))
                out_c.append(cnt)
        return pd.DataFrame({"o_custkey": np.array(out_k, dtype=np.int64),
                             "inversions": np.array(out_c, dtype=np.int64)})

    return (orders.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("kp").map_groups(count_inv, batch_format="pandas"))


SQL_ORDER_INVERSIONS = """
SELECT o1.o_custkey, CAST(COUNT(*) AS BIGINT) AS inversions
FROM orders o1
JOIN orders o2 ON o1.o_custkey = o2.o_custkey
 AND o1.o_orderdate < o2.o_orderdate
 AND o1.o_totalprice > o2.o_totalprice
GROUP BY 1
"""


# =====================================================================
# per-group linear regression from exact integer moments
# =====================================================================

def q_regr_per_group(sf_dir: str):
    """Least-squares slope/intercept of extendedprice (cents) on
    quantity per returnflag — per-group LINEAR REGRESSION from exact
    integer moment sums: the shuffle carries 5 int64 partials per
    (block, group) (corr_stats' G4 discipline); the driver finale does
    the n·Σxy − Σx·Σy arithmetic in arbitrary-precision Python ints
    (the cross products pass 2⁶³ at sf ≳ 1 — the q_time_weighted_avg
    overflow lesson), mirrored by DuckDB's HUGEINT sums, then ONE
    correctly-rounded double division per term on both sides — no
    regr_slope() float accumulation anywhere."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_quantity", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        x = b["l_quantity"].cast(pa.int64())
        y = _cents(b["l_extendedprice"])
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "x": x, "y": y,
            "xx": pc.multiply(x, x), "xy": pc.multiply(x, y),
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(
            Count(alias_name="n"),
            Sum("x", alias_name="sx"), Sum("y", alias_name="sy"),
            Sum("xx", alias_name="sxx"), Sum("xy", alias_name="sxy"),
        )
    )

    def finalize(b: pa.Table) -> pa.Table:
        slopes, intercepts = [], []
        for r in b.to_pylist():
            n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
            sxx, sxy = int(r["sxx"]), int(r["sxy"])
            num = n * sxy - sx * sy      # exact python ints ≡ HUGEINT
            den = n * sxx - sx * sx
            slope = float(num) / float(den)
            intercepts.append(float(np.round(
                (float(sy) - slope * float(sx)) / float(n), 6)))
            slopes.append(float(np.round(slope, 6)))
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "slope": pa.array(slopes, pa.float64()),
            "intercept": pa.array(intercepts, pa.float64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_REGR_PER_GROUP = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(l_quantity AS BIGINT)) AS sx,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sy,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
           AS sxx,
         SUM(CAST(l_quantity AS BIGINT)
             * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY 1)
SELECT l_returnflag,
  ROUND(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
        / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE), 6) AS slope,
  ROUND((CAST(sy AS DOUBLE)
         - (CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
            / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE))
           * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
FROM m
"""


# =====================================================================
# gaps-and-islands: per-user consecutive-day activity streaks
# =====================================================================

def q_activity_streaks(sf_dir: str):
    """Gaps-and-islands over the event stream: each user's longest run
    of CONSECUTIVE active days and their number of distinct runs — the
    classic sessionization-by-calendar shape (SQL needs the
    day − ROW_NUMBER() anchor trick; the engine needs none of it).
    Scale plan: per-block DISTINCT (user, day) combiner shrinks the
    stream before its ONE user-hash exchange; each partition derives
    every local user's runs from a sorted unique-day array (vectorized
    diff), emitting exactly one row per user."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "ts"])
    day_us = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor(pc.divide(
            b["ts"].cast(pa.int64()).cast(pa.float64()),
            pa.scalar(float(day_us)))), pa.int64())
        g = pa.table({"user_id": b["user_id"], "day": day}) \
            .group_by(["user_id", "day"]).aggregate([])
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return g.append_column("kp", pa.array(kp))

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        out_u, out_m, out_n = [], [], []
        for uid, sub in g.groupby("user_id", sort=False):
            days = np.unique(sub["day"].to_numpy())
            brk = np.flatnonzero(np.diff(days) != 1)
            starts = np.concatenate(([0], brk + 1))
            ends = np.concatenate((brk, [len(days) - 1]))
            runs = ends - starts + 1
            out_u.append(int(uid))
            out_m.append(int(runs.max()))
            out_n.append(len(runs))
        return pd.DataFrame({
            "user_id": np.array(out_u, dtype=np.int64),
            "max_streak": np.array(out_m, dtype=np.int64),
            "n_streaks": np.array(out_n, dtype=np.int64),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(streaks, batch_format="pandas"))


SQL_ACTIVITY_STREAKS = """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
r AS (SELECT user_id, day,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM d),
s AS (SELECT user_id, COUNT(*) AS len
      FROM r GROUP BY user_id, day - CAST(rn AS INTEGER))
SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks
FROM s GROUP BY 1
"""


# =====================================================================
# time-RANGE window frame (RANGE BETWEEN INTERVAL ... PRECEDING)
# =====================================================================

def q_range_moving_sum(sf_dir: str, window_us: int = 3_600_000_000):
    """Per-user rolling 1-hour sum over EVENT TIME — the RANGE frame
    (``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW``), which
    unlike the ROWS frame (moving_avg) is defined by timestamp distance
    and includes ALL peers of the current timestamp. Scale plan: one
    user-hash exchange; each partition sorts its users' events once and
    computes every window with two vectorized searchsorted passes over
    a prefix-sum array — O(n log n) per partition, no per-row Python,
    no self-join. Cents int64 both sides."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "cents": _cents(b["value"]),
            "kp": pa.array(kp),
        })

    def window(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _uid, sub in g.groupby("user_id", sort=False):
            sub = sub.sort_values("ts_us", kind="mergesort")
            ts = sub["ts_us"].to_numpy()
            cents = sub["cents"].to_numpy()
            pref = np.concatenate(([0], np.cumsum(cents)))
            lo = np.searchsorted(ts, ts - window_us, side="left")
            hi = np.searchsorted(ts, ts, side="right")  # peers included
            outs.append(pd.DataFrame({
                "event_id": sub["event_id"].to_numpy(),
                "user_id": sub["user_id"].to_numpy(),
                "win_cents": (pref[hi] - pref[lo]).astype(np.int64),
            }))
        return pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                          "user_id": pd.Series([], dtype=np.int64),
                          "win_cents": pd.Series([], dtype=np.int64)})

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(window, batch_format="pandas"))


SQL_RANGE_MOVING_SUM = """
SELECT event_id, user_id,
  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
    PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
  AS BIGINT) AS win_cents
FROM events
"""


# =====================================================================
# window frame bounds: LEAD / FIRST_VALUE / LAST_VALUE (§2.9)
# =====================================================================

def q_window_bounds(sf_dir: str):
    """LEAD plus unbounded-frame FIRST_VALUE / LAST_VALUE per user over
    the event stream — the remaining navigation-function family next to
    LAG (q_window_lag) and NTILE/PERCENT_RANK (q_window_rank). Scale
    shape: ONE user-hash groupby exchange over 4 skinny columns; each
    partition sorts its users' events once ((ts, event_id) is a total
    order) and derives all three columns from vectorized shifts /
    per-group boundary indices — no per-row Python. Partitioning
    assumption: one user's events fit in a worker, the same per-PARTITION
    assumption every window engine makes. The last row's LEAD is the
    literal 'NONE' on both sides (COALESCE in the oracle) to avoid
    null-ordering ambiguity in the driver's hash compare."""
    import pyarrow.dataset as pads

    ds = _sized_read(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_id", "ts", "event_type"],
        filter=pads.field("user_id") < 200,
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        lead = np.empty_like(et)
        lead[:-1] = et[1:]
        lead[-1] = "NONE"
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "event_id": g["event_id"].to_numpy(),
            "lead_type": lead,
            "first_type": np.full(len(et), et[0]),
            "last_type": np.full(len(et), et[-1]),
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


SQL_WINDOW_BOUNDS = """
SELECT user_id, event_id,
  COALESCE(LEAD(event_type) OVER w, 'NONE') AS lead_type,
  FIRST_VALUE(event_type) OVER w AS first_type,
  LAST_VALUE(event_type) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
FROM events WHERE user_id < 200
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# =====================================================================
# sweep-line: max concurrent intervals per group
# =====================================================================

def q_max_concurrent(sf_dir: str):
    """Peak number of simultaneously-open shipment intervals
    [l_shipdate, l_shipdate + l_quantity days] per returnflag — the
    classic sweep-line / room-scheduling operator (resource-peak
    sizing). Each block emits ±1 boundary events; ONE flag-hash
    exchange; each group does a vectorized lexsort + cumsum + max.
    Tie rule pinned on BOTH sides: at equal timestamps starts sort
    before ends (+1 before −1 → touching intervals count as
    overlapping). Per-group events must fit a worker here; a group too
    large for that switches to the two-pass distributed prefix-scan
    (sort by t, per-block (sum, max-prefix) partials, tiny driver
    offset fold — the q_running_total pattern) at the cost of a sort
    instead of a hash exchange."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_shipdate", "l_quantity"])
    day_us = 86_400_000_000

    def bounds(b: pa.Table) -> pa.Table:
        start = b["l_shipdate"].cast(pa.int64())
        days = pc.round(b["l_quantity"]).cast(pa.int64())
        end = pc.add(start, pc.multiply(days, pa.scalar(day_us)))
        flags = b["l_returnflag"]
        return pa.table({
            "flag": pa.concat_arrays([flags.combine_chunks(),
                                      flags.combine_chunks()]),
            "t": pa.concat_arrays([start.combine_chunks(),
                                   end.combine_chunks()]),
            "d": pa.array(np.concatenate([
                np.ones(b.num_rows, dtype=np.int64),
                np.full(b.num_rows, -1, dtype=np.int64)])),
        })

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        t = g["t"].to_numpy()
        d = g["d"].to_numpy()
        order = np.lexsort((-d, t))  # starts (+1) before ends (−1) at ties
        peak = int(np.cumsum(d[order]).max())
        return pd.DataFrame({"flag": [g["flag"].iloc[0]],
                             "max_concurrent": np.array([peak], np.int64)})

    return (ds.map_batches(bounds, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("flag").map_groups(sweep, batch_format="pandas"))


SQL_MAX_CONCURRENT = """
WITH ev AS (
  SELECT l_returnflag AS flag, epoch_us(l_shipdate) AS t, 1 AS d
  FROM lineitem
  UNION ALL
  SELECT l_returnflag,
         epoch_us(l_shipdate) + CAST(ROUND(l_quantity) AS BIGINT) * 86400000000,
         -1
  FROM lineitem
), s AS (
  SELECT flag, SUM(d) OVER (PARTITION BY flag ORDER BY t, d DESC
                            ROWS UNBOUNDED PRECEDING) AS conc
  FROM ev
)
SELECT flag, CAST(MAX(conc) AS BIGINT) AS max_concurrent
FROM s GROUP BY flag
"""


# =====================================================================
# Welch's t-test per group (A/B experiment analysis)
# =====================================================================

def q_welch_ttest(sf_dir: str):
    """Welch's two-sample t-statistic between the BUILDING and MACHINERY
    market segments' account balances, per nation — the A/B-experiment
    readout a training-data pipeline runs over bucketed corpora. Exact
    integer moment sums (n, Σx, Σx² in cents) per (nation, segment)
    ride ONE groupby exchange as 3 int64 partials per block×group; the
    finale forms n·Σx² − (Σx)² in arbitrary-precision Python ints
    (≡ DuckDB HUGEINT — Σx² of 10⁶-cent balances passes 2⁶³ near 10⁹
    rows/group), then ONE identical IEEE expression per side:
    t = (m₁−m₂)/√(v₁/n₁+v₂/n₂), rounded to 6 dp. Groups with a
    degenerate side (n<2) are dropped on both sides."""
    ds = _t(sf_dir, "customer", ["c_nationkey", "c_mktsegment", "c_acctbal"])
    segs = ("BUILDING", "MACHINERY")

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["c_mktsegment"],
                              value_set=pa.array(segs)))
        x = _cents(b["c_acctbal"])
        return pa.table({
            "c_nationkey": b["c_nationkey"].cast(pa.int64()),
            "seg": b["c_mktsegment"],
            "x": x,
            "xx": pc.multiply(x, x),
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["c_nationkey", "seg"])
        .aggregate(Count(alias_name="n"),
                   Sum("x", alias_name="sx"),
                   Sum("xx", alias_name="sxx"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        # ≤ |nations|×2 rows at any scale — bounded driver-side fold
        out = []
        for nk, g in df.groupby("c_nationkey", sort=True):
            m = {r.seg: r for r in g.itertuples()}
            a, b_ = m.get(segs[0]), m.get(segs[1])
            if a is None or b_ is None or a.n < 2 or b_.n < 2:
                continue
            stats = []
            for r in (a, b_):
                n, sx, sxx = int(r.n), int(r.sx), int(r.sxx)
                num = n * sxx - sx * sx          # exact ints ≡ HUGEINT
                mean = float(sx) / float(n)
                var = float(num) / float(n * (n - 1))
                stats.append((n, mean, var))
            (n1, m1, v1), (n2, m2, v2) = stats
            t = (m1 - m2) / math.sqrt(v1 / float(n1) + v2 / float(n2))
            out.append((int(nk), int(n1), int(n2), float(np.round(t, 6))))
        return pd.DataFrame(out, columns=["c_nationkey", "n1", "n2", "t_stat"])

    part = agg.to_pandas()  # ≤ nations×2 rows — bounded materialization
    return pa.Table.from_pandas(finalize(part), preserve_index=False)


SQL_WELCH_TTEST = """
WITH m AS (
  SELECT c_nationkey, c_mktsegment AS seg,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sx,
         SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
             * CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sxx
  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY 1, 2
), w AS (
  SELECT a.c_nationkey,
         a.n AS n1, b.n AS n2,
         CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE) AS m1,
         CAST(b.sx AS DOUBLE) / CAST(b.n AS DOUBLE) AS m2,
         CAST(CAST(a.n AS HUGEINT) * a.sxx - a.sx * a.sx AS DOUBLE)
           / CAST(a.n * (a.n - 1) AS DOUBLE) AS v1,
         CAST(CAST(b.n AS HUGEINT) * b.sxx - b.sx * b.sx AS DOUBLE)
           / CAST(b.n * (b.n - 1) AS DOUBLE) AS v2
  FROM m a JOIN m b USING (c_nationkey)
  WHERE a.seg = 'BUILDING' AND b.seg = 'MACHINERY'
    AND a.n >= 2 AND b.n >= 2
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, n1, n2,
  ROUND((m1 - m2) / SQRT(v1 / CAST(n1 AS DOUBLE)
                         + v2 / CAST(n2 AS DOUBLE)), 6) AS t_stat
FROM w
"""


# =====================================================================
# association pairs: co-occurrence lift (market-basket over event types)
# =====================================================================

def q_pair_lift(sf_dir: str):
    """Pairwise event-type co-occurrence LIFT across users — the
    frequent-itemset / association readout (Agrawal-style support +
    lift restricted to pairs). Scale shape: per-block DISTINCT
    (user, type) combiner shrinks the stream before its ONE user-hash
    exchange; each partition emits its local users' sorted type pairs
    and folds them with value_counts, so the final fold is bounded by
    |types|² + |types| + 1 rows per partition — never per-user data.
    lift(a,b) = c_ab·U / (c_a·c_b) with the IDENTICAL IEEE expression
    on both sides, 6 dp."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def distinct_block(b: pa.Table) -> pa.Table:
        t = b.group_by(["user_id", "event_type"]).aggregate([])
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            kp = ((uid.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("kp", pa.array(kp))

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        # one hash partition: every row of a user lives here
        g = g.drop_duplicates(["user_id", "event_type"])
        rows = []
        for _uid, types in g.groupby("user_id")["event_type"]:
            ts = sorted(set(types))
            for t_ in ts:
                rows.append(("s", t_, ""))
            for i in range(len(ts)):
                for j in range(i + 1, len(ts)):
                    rows.append(("p", ts[i], ts[j]))
            rows.append(("u", "", ""))
        df = pd.DataFrame(rows, columns=["kind", "ta", "tb"])
        out = df.value_counts(["kind", "ta", "tb"]).reset_index(name="c")
        out["c"] = out["c"].astype(np.int64)
        return out

    folded = (ds.map_batches(distinct_block, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("kp").map_groups(pairs_part, batch_format="pandas")
              .groupby(["kind", "ta", "tb"])
              .aggregate(Sum("c", alias_name="c")))

    part = folded.to_pandas()  # ≤ |types|²+|types|+1 rows — bounded
    nu = int(part.loc[part["kind"] == "u", "c"].sum())
    singles = {r.ta: int(r.c) for r in
               part[part["kind"] == "s"].itertuples()}
    pr = part[part["kind"] == "p"].sort_values(["ta", "tb"])
    lifts = [float(np.round(
        float(c) * float(nu) / (float(singles[a]) * float(singles[b])), 6))
        for a, b, c in zip(pr["ta"], pr["tb"], pr["c"])]
    return pa.table({
        "ta": pa.array(pr["ta"], pa.string()),
        "tb": pa.array(pr["tb"], pa.string()),
        "cab": pa.array(pr["c"].astype(np.int64)),
        "lift": pa.array(lifts, pa.float64()),
    })


SQL_PAIR_LIFT = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu FROM events),
s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM ut GROUP BY 1),
p AS (SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(COUNT(*) AS BIGINT) AS cab
      FROM ut a JOIN ut b USING (user_id)
      WHERE a.event_type < b.event_type GROUP BY 1, 2)
SELECT ta, tb, cab,
  ROUND(CAST(cab AS DOUBLE) * CAST(nu AS DOUBLE)
        / (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE)), 6) AS lift
FROM p CROSS JOIN u
JOIN s sa ON sa.event_type = ta
JOIN s sb ON sb.event_type = tb
"""


# =====================================================================
# first-touch attribution
# =====================================================================

def q_first_touch(sf_dir: str):
    """Marketing-style FIRST-TOUCH ATTRIBUTION: each user's lifetime
    purchase revenue is credited to the event type of their very first
    event. ONE user-hash exchange carries 5 skinny columns; each
    partition derives, per local user, the argmin-(ts, event_id) first
    type AND the purchase-cents sum in the same pass (both user-local
    facts — no second exchange over raw events); the per-user rows then
    reduce through Ray's distributive Sum/Count (per-block partials,
    ≤ |types| groups)."""
    ds = _t(sf_dir, "events",
            ["user_id", "event_id", "ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        cents = _cents(b["value"])
        is_p = pc.equal(b["event_type"], pa.scalar("purchase"))
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts": b["ts"].cast(pa.int64()),
            "event_type": b["event_type"],
            "cents": pc.if_else(is_p, cents, pa.scalar(0, pa.int64())),
        })

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        first = np.lexsort((eid, ts))[0]
        return pd.DataFrame({
            "first_type": [g["event_type"].iloc[first]],
            "cents": np.array([g["cents"].to_numpy().sum()], np.int64),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("user_id").map_groups(per_user, batch_format="pandas")
           .groupby("first_type")
           .aggregate(Count(alias_name="users"),
                      Sum("cents", alias_name="cents")))

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "first_type": b["first_type"],
            "users": b["users"],
            "revenue": pc.divide(b["cents"].cast(pa.float64()),
                                 pa.scalar(100.0)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_FIRST_TOUCH = """
WITH f AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events),
ft AS (SELECT user_id, event_type AS first_type FROM f WHERE rn = 1),
rev AS (SELECT user_id,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT first_type, CAST(COUNT(*) AS BIGINT) AS users,
  CAST(CAST(SUM(COALESCE(c, 0)) AS BIGINT) AS DOUBLE) / 100.0 AS revenue
FROM ft LEFT JOIN rev USING (user_id)
GROUP BY 1
"""


# =====================================================================
# trimmed (truncated) mean per group
# =====================================================================

def q_trimmed_mean(sf_dir: str, trim: float = 0.05):
    """5%-each-side TRIMMED MEAN of extendedprice per returnflag — the
    outlier-robust aggregate (rank-trim is well-defined on ties: the
    cut lands inside a run of equal values, so the kept multiset — and
    the sum — is tie-order-independent; ROW_NUMBER's arbitrary tie
    order in the oracle is therefore harmless). Per-group sort here
    (3 groups); a group too large for one worker switches to the exact
    2-pass selection-quantile cut (q_median_selection's machinery) to
    find the k-th / (n−k)-th values and block-local partial sums of
    the kept range. k = ⌊trim·n⌋ and the mean expression are IEEE-
    identical on both sides, 6 dp."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"flag": b["l_returnflag"],
                         "c": _cents(b["l_extendedprice"])})

    def per_flag(g: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(g["c"].to_numpy())
        n = len(c)
        k = int(np.floor(trim * n))
        kept = c[k:n - k]
        mean = float(np.round(
            float(kept.sum()) / float(len(kept)) / 100.0, 6))
        return pd.DataFrame({
            "flag": [g["flag"].iloc[0]],
            "n_kept": np.array([len(kept)], np.int64),
            "trimmed_mean": np.array([mean], np.float64),
        })

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("flag").map_groups(per_flag, batch_format="pandas"))


SQL_TRIMMED_MEAN = """
WITH r AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY CAST(ROUND(l_extendedprice * 100)
                                          AS BIGINT)) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem)
SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_kept,
  ROUND(CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS trimmed_mean
FROM r
WHERE rn > CAST(FLOOR(0.05 * n) AS BIGINT)
  AND rn <= n - CAST(FLOOR(0.05 * n) AS BIGINT)
GROUP BY flag
"""


# =====================================================================
# Z-order (Morton) layout: multi-dimensional zone-map clustering
# =====================================================================

def _morton_spread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each value to even bit positions
    (0b...abcd → 0b...0a0b0c0d) — one half of a 2-D Morton code."""
    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def q_zorder_layout(sf_dir: str):
    """Z-ORDER (Morton-interleaved) storage layout: lineitem is
    clustered by the bit-interleave of 16-bit-quantized (shipdate,
    partkey), so parquet min/max zone maps prune on EITHER dimension —
    the multi-column generalization of q_sorted_layout (a time-sorted
    layout cannot prune a partkey-only predicate at all; the Z-layout
    prunes both: tests/test_analytics_ops.py pins it). Quantization
    bounds come from ONE bounded aggregate pre-pass (4 int64 partials
    per block — ingest-time cost, paid once). The read back applies a
    genuinely 2-D predicate as a parquet filter; at 100 TB the scan
    fraction is ~(range₁/total₁)·O(√(range₂/total₂)) instead of a full
    scan. Output aggregate is bounded (one row per month) and
    integer-exact. Layout lands under ``CRAWLRAY_SCRATCH_ROOT`` (shared
    storage on a multi-node cluster; /tmp is the single-node default)."""
    import shutil
    import tempfile

    import pyarrow.dataset as pads

    ds = _t(sf_dir, "lineitem", ["l_shipdate", "l_partkey", "l_quantity"])

    bounds = ds.map_batches(
        lambda b: pa.table({
            "dmin": pa.array([pc.min(b["l_shipdate"]).cast(pa.int64()).as_py()]),
            "dmax": pa.array([pc.max(b["l_shipdate"]).cast(pa.int64()).as_py()]),
            "pmin": pa.array([pc.min(b["l_partkey"]).as_py()]),
            "pmax": pa.array([pc.max(b["l_partkey"]).as_py()]),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()  # blocks×4 int64 — bounded pre-pass
    dmin, dmax = int(bounds["dmin"].min()), int(bounds["dmax"].max())
    pmin, pmax = int(bounds["pmin"].min()), int(bounds["pmax"].max())
    dspan, pspan = max(1, dmax - dmin), max(1, pmax - pmin)

    def add_z(b: pa.Table) -> pa.Table:
        d = b["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        p = b["l_partkey"].to_numpy(zero_copy_only=False)
        d16 = ((d - dmin).astype(np.uint64) * np.uint64(65535)
               // np.uint64(dspan))
        p16 = ((p - pmin).astype(np.uint64) * np.uint64(65535)
               // np.uint64(pspan))
        z = (_morton_spread16(d16)
             | (_morton_spread16(p16) << np.uint64(1))).astype(np.int64)
        return b.append_column("z", pa.array(z))

    scratch = os.environ.get("CRAWLRAY_SCRATCH_ROOT")
    if scratch:
        os.makedirs(scratch, exist_ok=True)
    out_dir = tempfile.mkdtemp(prefix="crawlray_zorder_", dir=scratch)
    try:
        (ds.map_batches(add_z, batch_format="pyarrow", zero_copy_batch=True)
         .sort("z").write_parquet(out_dir))
        lo = np.datetime64("1996-03-01", "us")
        hi = np.datetime64("1996-09-01", "us")
        back = _sized_read(
            out_dir,
            columns=["l_shipdate", "l_partkey", "l_quantity"],
            filter=(pads.field("l_shipdate") >= lo)
                   & (pads.field("l_shipdate") < hi)
                   & (pads.field("l_partkey") < 100),
        )

        rows = (
            back.map_batches(
                lambda b: pa.table({
                    "month": pc.floor_temporal(b["l_shipdate"], unit="month"),
                    "qty": pc.round(b["l_quantity"]).cast(pa.int64()),
                }),
                batch_format="pyarrow", zero_copy_batch=True)
            .groupby("month")
            .aggregate(Count(alias_name="n"), Sum("qty", alias_name="qty"))
            .take_all()  # bounded: one row per month in the window
        )
        return pa.Table.from_pylist(rows)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SQL_ZORDER_LAYOUT = """
SELECT date_trunc('month', l_shipdate) AS month,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-09-01'
  AND l_partkey < 100
GROUP BY 1
"""


# =====================================================================
# window distribution functions: CUME_DIST + NTH_VALUE
# =====================================================================

def q_window_dist(sf_dir: str):
    """CUME_DIST (with real tie/peer semantics — acctbal alone orders
    the frame, so equal balances share a distribution value) plus
    NTH_VALUE(name, 2) over the unbounded frame, per market segment —
    the distribution-function family next to NTILE/PERCENT_RANK
    (q_window_rank) and LEAD/FIRST/LAST (q_window_bounds). Scale shape:
    ONE segment-hash groupby exchange over 4 skinny columns; each
    partition sorts once by (acctbal, custkey) and derives cume_dist
    vectorized as searchsorted-right(balances, balances)/n — the peer
    count — and the 2nd-row name by index. cume_dist is ONE int/int
    double division on both sides, so the hash compare is exact.
    Partitioning assumption: one segment's customers fit in a worker
    (the per-PARTITION assumption every window engine makes)."""
    ds = _t(sf_dir, "customer",
            ["c_mktsegment", "c_custkey", "c_name", "c_acctbal"])

    def per_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_acctbal", "c_custkey"], kind="mergesort")
        bal = g["c_acctbal"].to_numpy()
        n = len(bal)
        cd = np.searchsorted(bal, bal, side="right") / np.float64(n)
        second = g["c_name"].iloc[1] if n >= 2 else "NONE"
        return pd.DataFrame({
            "c_custkey": g["c_custkey"].to_numpy(),
            "c_mktsegment": g["c_mktsegment"].to_numpy(),
            "cume_dist": cd,
            "second_name": np.full(n, second, object),
        })

    return ds.groupby("c_mktsegment").map_groups(per_seg,
                                                 batch_format="pandas")


SQL_WINDOW_DIST = """
SELECT c_custkey, c_mktsegment,
  CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)
    AS cume_dist,
  COALESCE(NTH_VALUE(c_name, 2) OVER (
    PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
    'NONE') AS second_name
FROM customer
"""


# =====================================================================
# sliding-window median (holistic aggregate over a bounded frame)
# =====================================================================

def q_moving_median(sf_dir: str):
    """MEDIAN(value) OVER (PARTITION BY user ORDER BY ts, event_id ROWS
    BETWEEN 2 PRECEDING AND CURRENT ROW) — a HOLISTIC window aggregate
    (median needs the frame's values, not a running sum, so it can't
    cascade like SUM/AVG frames). Scale shape: ONE user-hash exchange
    over 3 skinny columns; each partition sorts its users once and
    evaluates every 3-row frame in one vectorized np.median over a
    stacked (n−2, 3) view, plus the two short-frame heads. The even
    frame (row 1) is (v0+v1)/2 — matched against DuckDB empirically at
    all three scales (one IEEE add + halving on identical operands)."""
    import pyarrow.dataset as pads

    ds = _sized_read(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_id", "ts", "value"],
        filter=pads.field("user_id") < 300,
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        v = g["value"].to_numpy()
        n = len(v)
        out = np.empty(n, np.float64)
        out[0] = v[0]
        if n >= 2:
            out[1] = (v[0] + v[1]) / 2.0
        if n >= 3:
            frames = np.lib.stride_tricks.sliding_window_view(v, 3)
            out[2:] = np.median(frames, axis=1)
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "event_id": g["event_id"].to_numpy(),
            "moving_median": out,
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


SQL_MOVING_MEDIAN = """
SELECT user_id, event_id,
  MEDIAN(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    AS moving_median
FROM events WHERE user_id < 300
"""


# =====================================================================
# global NTILE by distributed exact selection (no global sort)
# =====================================================================

def q_global_ntile(sf_dir: str, k: int = 4):
    """NTILE(4) over the WHOLE fact table (a global window — every row
    needs its global rank) without ever sorting the data: the three
    bucket boundaries are exact order statistics of the total order
    (price-cents, orderkey, linenumber), found by the same 2-pass
    selection as q_median_selection — pass 1 folds a bounded coarse
    histogram of cents on the driver, pass 2 pulls only the ≈n/buckets
    candidate rows inside the three cut buckets and indexes the exact
    boundary TUPLES (the tiebreak keys make ties unambiguous: rows
    equal on price straddle a boundary by key order, so the cut must be
    a full tuple). Pass 3 broadcasts the 3 cut tuples and every block
    bincounts its rows' buckets locally — ≤k partial rows per block
    reach the driver. Three streaming scans, zero shuffles, and the
    driver never holds more than O(buckets + n/buckets + k) rows."""
    ds = _t(sf_dir, "lineitem",
            ["l_extendedprice", "l_orderkey", "l_linenumber"])
    bw = np.int64(50_000)  # $500 coarse buckets over cents

    def cents_of(b: pa.Table) -> np.ndarray:
        return pc.round(pc.multiply(b["l_extendedprice"],
                                    pa.scalar(100.0))) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)

    def hist(b: pa.Table) -> pa.Table:
        bk, cnt = np.unique(cents_of(b) // bw, return_counts=True)
        return pa.table({"bucket": pa.array(bk),
                         "cnt": pa.array(cnt.astype(np.int64))})

    folds = [b.to_pandas() for b in
             ds.map_batches(hist, batch_format="pyarrow",
                            zero_copy_batch=True)
             .iter_batches(batch_size=262144, batch_format="pyarrow")]
    cdf = (pd.concat(folds, ignore_index=True)
           .groupby("bucket", as_index=False)["cnt"].sum()
           .sort_values("bucket"))
    n = int(cdf["cnt"].sum())
    sizes = [n // k + (1 if i < n % k else 0) for i in range(k)]
    cut_ranks = np.cumsum(sizes)[:-1]  # 1-based rank of each bucket's last row
    cum = cdf["cnt"].cumsum().to_numpy()
    cut_buckets, below = [], []
    for r in cut_ranks:
        i = int(np.searchsorted(cum, r))
        cut_buckets.append(int(cdf["bucket"].iloc[i]))
        below.append(int(cum[i - 1]) if i else 0)
    want = sorted(set(cut_buckets))
    want_ref = ray.put(np.array(want, np.int64))

    def candidates(b: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        c = cents_of(b)
        m = np.isin(c // bw, w)
        return pa.table({
            "cents": pa.array(c[m]),
            "ok": b["l_orderkey"].filter(pa.array(m)),
            "ln": b["l_linenumber"].filter(pa.array(m)),
        })

    cand = pd.DataFrame(
        ds.map_batches(candidates, batch_format="pyarrow",
                       zero_copy_batch=True).take_all())
    cand_bk = cand["cents"].to_numpy() // bw
    cuts = []  # exact (cents, orderkey, linenumber) boundary tuples
    for r, bk, bl in zip(cut_ranks, cut_buckets, below):
        g = cand[cand_bk == bk].sort_values(["cents", "ok", "ln"],
                                            kind="mergesort")
        row = g.iloc[int(r) - bl - 1]
        cuts.append((int(row["cents"]), int(row["ok"]), int(row["ln"])))
    cuts_ref = ray.put(cuts)

    def assign(b: pa.Table) -> pa.Table:
        cs = ray.get(cuts_ref)
        c = cents_of(b)
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = b["l_linenumber"].to_numpy(zero_copy_only=False)
        bucket = np.ones(len(c), np.int64)
        for cc, co, cl in cs:  # row > cut tuple, lexicographically
            gt = (c > cc) | ((c == cc) & ((ok > co) |
                                          ((ok == co) & (ln > cl))))
            bucket += gt
        cnt = np.bincount(bucket, minlength=k + 1)[1:]
        s = np.bincount(bucket, weights=c.astype(np.float64),
                        minlength=k + 1)[1:].astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": pa.array(nz + 1),
                         "n_lines": pa.array(cnt[nz].astype(np.int64)),
                         "sum_c": pa.array(s[nz])})

    parts = pd.DataFrame(
        ds.map_batches(assign, batch_format="pyarrow",
                       zero_copy_batch=True).take_all())
    agg = parts.groupby("bucket", as_index=False).sum().sort_values("bucket")
    return pa.table({
        "bucket": pa.array(agg["bucket"].to_numpy(np.int64)),
        "n_lines": pa.array(agg["n_lines"].to_numpy(np.int64)),
        "sum_price": pa.array(agg["sum_c"].to_numpy(np.int64)
                              .astype(np.float64) / 100.0),
    })


SQL_GLOBAL_NTILE = """
WITH t AS (
  SELECT NTILE(4) OVER (ORDER BY l_extendedprice, l_orderkey,
                        l_linenumber) AS bucket,
         l_extendedprice
  FROM lineitem)
SELECT CAST(bucket AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0
    AS sum_price
FROM t GROUP BY 1
"""


# =====================================================================
# collect_list / array aggregation round-trip (order baskets)
# =====================================================================

def q_order_baskets(sf_dir: str):
    """Per-order part basket as an ORDERED list rendered to a string
    (collect_list / array_agg + array_to_string): the array-aggregation
    surface next to string_agg_topn. Scale shape: the orderkey
    predicate is pushed into the read (row-group pruning); ONE
    orderkey-hash groupby exchange; each group's ≤7 lines sort by
    (partkey, linenumber) and join locally. Baskets are bounded by
    lines-per-order (≤7 in TPC-H), so group size never scales with the
    corpus — the safe collect_list regime; an unbounded-group
    collect_list would need the capped/sketched variant instead."""
    import pyarrow.dataset as pads

    ds = _sized_read(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_linenumber"],
        filter=pads.field("l_orderkey") < 2000,
    )

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_partkey", "l_linenumber"], kind="mergesort")
        pk = g["l_partkey"].to_numpy()
        return pd.DataFrame({
            "l_orderkey": [int(g["l_orderkey"].iloc[0])],
            "n_parts": np.array([len(pk)], np.int64),
            "parts": [",".join(str(int(p)) for p in pk)],
        })

    return ds.groupby("l_orderkey").map_groups(per_order,
                                               batch_format="pandas")


SQL_ORDER_BASKETS = """
SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_parts,
  array_to_string(list(l_partkey ORDER BY l_partkey, l_linenumber), ',')
    AS parts
FROM lineitem WHERE l_orderkey < 2000
GROUP BY 1
"""


# =====================================================================
# EXCEPT ALL — multiset (bag) difference with multiplicity
# =====================================================================

def q_except_all(sf_dir: str):
    """January custkeys EXCEPT ALL February custkeys — bag semantics,
    where a key ordering 3× in January and 1× in February survives
    TWICE (q_intersect_except's set-bit plan cannot express this:
    multiplicity, not membership, decides). Plan: ONE scan emits
    per-block (key, n_jan, n_feb) partial counts, ONE key groupby sums
    them, and each output group re-emits its key max(0, n_jan − n_feb)
    times via a vectorized np.repeat — output size is the answer size,
    and nothing wider than 3 int64 columns ever shuffles."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.month(b["o_orderdate"]).to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        keep = (m == 1) | (m == 2)
        ck, m = ck[keep], m[keep]
        # per-block combiner: (key, month) pair counts packed as one int
        pairs = ck * 16 + m
        up, cnt = np.unique(pairs, return_counts=True)
        k2, m2 = up // 16, up % 16
        return pa.table({
            "key": pa.array(k2.astype(np.int64)),
            "n_jan": pa.array(np.where(m2 == 1, cnt, 0).astype(np.int64)),
            "n_feb": pa.array(np.where(m2 == 2, cnt, 0).astype(np.int64)),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("key")
           .aggregate(Sum("n_jan", alias_name="n_jan"),
                      Sum("n_feb", alias_name="n_feb")))

    def emit(b: pa.Table) -> pa.Table:
        k = b["key"].to_numpy(zero_copy_only=False)
        d = (b["n_jan"].to_numpy(zero_copy_only=False)
             - b["n_feb"].to_numpy(zero_copy_only=False))
        d = np.maximum(d, 0)
        return pa.table({"o_custkey": pa.array(np.repeat(k, d))})

    return agg.map_batches(emit, batch_format="pyarrow")


def q_intersect_all(sf_dir: str):
    """INTERSECT ALL — the bag-semantics sibling of q_except_all (a key
    ordering 3× in January and 2× in February survives TWICE). Same
    plan: per-block (key, n_jan, n_feb) combiner, ONE key groupby,
    vectorized np.repeat of min(n_jan, n_feb)."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.month(b["o_orderdate"]).to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        keep = (m == 1) | (m == 2)
        ck, m = ck[keep], m[keep]
        pairs = ck * 16 + m
        up, cnt = np.unique(pairs, return_counts=True)
        k2, m2 = up // 16, up % 16
        return pa.table({
            "key": pa.array(k2.astype(np.int64)),
            "n_jan": pa.array(np.where(m2 == 1, cnt, 0).astype(np.int64)),
            "n_feb": pa.array(np.where(m2 == 2, cnt, 0).astype(np.int64)),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("key")
           .aggregate(Sum("n_jan", alias_name="n_jan"),
                      Sum("n_feb", alias_name="n_feb")))

    def emit(b: pa.Table) -> pa.Table:
        k = b["key"].to_numpy(zero_copy_only=False)
        d = np.minimum(b["n_jan"].to_numpy(zero_copy_only=False),
                       b["n_feb"].to_numpy(zero_copy_only=False))
        return pa.table({"o_custkey": pa.array(np.repeat(k, d))})

    return agg.map_batches(emit, batch_format="pyarrow")


SQL_INTERSECT_ALL = """
SELECT o_custkey FROM orders WHERE month(o_orderdate) = 1
INTERSECT ALL
SELECT o_custkey FROM orders WHERE month(o_orderdate) = 2
"""


SQL_EXCEPT_ALL = """
SELECT o_custkey FROM orders WHERE month(o_orderdate) = 1
EXCEPT ALL
SELECT o_custkey FROM orders WHERE month(o_orderdate) = 2
"""


# =====================================================================
# global ORDER BY ... LIMIT k OFFSET m without a global sort
# =====================================================================

def q_limit_offset(sf_dir: str, limit: int = 20, offset: int = 50):
    """Page 'rows 50..69 of customers by balance DESC' — global
    LIMIT+OFFSET pagination. A global sort just for one page is the
    classic anti-plan; instead every block reduces to its own top-
    (limit+offset) candidates (partial top-k, the q_top_customers
    pattern), the ≤(limit+offset)·blocks candidate rows fold once, and
    the page is sliced driver-side — the data never shuffles and the
    driver holds O(page·blocks) skinny rows. Deterministic total order
    via the (acctbal DESC, custkey) tiebreak."""
    need = limit + offset
    ds = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["c_acctbal", "c_custkey"],
                              ascending=[False, True],
                              kind="mergesort").head(need)

    cand = pd.DataFrame(
        ds.map_batches(partial, batch_format="pandas").take_all())
    page = (cand.sort_values(["c_acctbal", "c_custkey"],
                             ascending=[False, True], kind="mergesort")
            .iloc[offset:offset + limit])
    return pa.table({
        "c_custkey": pa.array(page["c_custkey"].to_numpy(np.int64)),
        "c_name": pa.array(page["c_name"].to_numpy(object), pa.string()),
        "c_acctbal": pa.array(page["c_acctbal"].to_numpy(np.float64)),
    })


SQL_LIMIT_OFFSET = """
SELECT c_custkey, c_name, c_acctbal
FROM customer ORDER BY c_acctbal DESC, c_custkey
LIMIT 20 OFFSET 50
"""


# =====================================================================
# Markov transition matrix over per-user event sequences
# =====================================================================

def q_markov_transitions(sf_dir: str):
    """First-order Markov transition matrix over the event stream: for
    every (current event type → next event type) pair, the observed
    count and the row-normalized transition probability — the
    user-journey model a recommendation / next-action pipeline fits.
    Scale plan: ONE user-hash exchange carries (user, ts, event_id,
    type-code) skinny rows; each partition lexsorts once by
    (user, ts, event_id) and derives every consecutive pair with a
    single vectorized shift (no per-user Python loop), folding pairs to
    ≤|types|² partial counts via bincount before they leave the task.
    The finale is a ≤|types|² driver fold; p = n / Σ_cur n with ONE
    identical IEEE division per cell both sides."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "kp": pa.array(kp),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        types, codes = np.unique(g["event_type"].to_numpy(object),
                                 return_inverse=True)
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], codes[order]
        same = u[:-1] == u[1:]          # consecutive rows, same user
        cur, nxt = c[:-1][same], c[1:][same]
        k = len(types)
        cnt = np.bincount(cur * k + nxt, minlength=k * k)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({
            "cur": types[nz // k],
            "nxt": types[nz % k],
            "n": cnt[nz].astype(np.int64),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(pairs, batch_format="pandas")
           .groupby(["cur", "nxt"])
           .aggregate(Sum("n", alias_name="n")))

    df = agg.to_pandas()  # ≤ |event types|² rows — bounded fold
    tot = df.groupby("cur")["n"].transform("sum")
    df["p"] = np.round(df["n"].astype(np.float64)
                       / tot.astype(np.float64), 6)
    df = df.sort_values(["cur", "nxt"], kind="mergesort")
    return pa.table({
        "cur": pa.array(df["cur"].to_numpy(object), pa.string()),
        "nxt": pa.array(df["nxt"].to_numpy(object), pa.string()),
        "n": pa.array(df["n"].to_numpy(np.int64)),
        "p": pa.array(df["p"].to_numpy(np.float64)),
    })


SQL_MARKOV_TRANSITIONS = """
WITH s AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
), c AS (
  SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
)
SELECT cur, nxt, n,
       ROUND(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY cur) AS DOUBLE), 6) AS p
FROM c
"""


# =====================================================================
# chi-square test of independence (per-cell observed vs expected)
# =====================================================================

def q_chi2_independence(sf_dir: str):
    """Chi-square independence readout between two categorical columns
    (document language × source): per cell, the observed count, the
    expected count under independence, and the cell's χ² contribution —
    the corpus-balance diagnostic a training-mix pipeline runs before
    re-weighting sources. Scale plan: per-block Arrow group_by combiner
    shrinks the stream to ≤|langs|·|sources| cells per block before ONE
    tiny groupby exchange; the finale is a bounded driver fold. Per-cell
    floats come from EXACT integer moments (expected = r·c/n, contrib =
    (n·o − r·c)²/(n·r·c) with python-int ≡ HUGEINT numerators), one
    correctly-rounded division per term — per-cell rows mean NO
    cross-side float-sum ordering exists to diverge."""
    ds = _t(sf_dir, "documents", ["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        return (pa.table({"lang": b["lang"], "source": b["source"]})
                .group_by(["lang", "source"])
                .aggregate([([], "count_all")])
                .rename_columns(["lang", "source", "o"]))

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["lang", "source"])
           .aggregate(Sum("o", alias_name="o")))

    df = agg.to_pandas()  # ≤ |langs|×|sources| rows — bounded fold
    df = df.sort_values(["lang", "source"], kind="mergesort")
    r = df.groupby("lang")["o"].transform("sum")
    c = df.groupby("source")["o"].transform("sum")
    n = int(df["o"].sum())
    exp, contrib = [], []
    for o_, r_, c_ in zip(df["o"], r, c):
        o_, r_, c_ = int(o_), int(r_), int(c_)
        exp.append(np.round(float(r_ * c_) / float(n), 6))
        num = n * o_ - r_ * c_          # exact ints ≡ HUGEINT
        contrib.append(np.round(float(num * num) / float(n * r_ * c_), 6))
    return pa.table({
        "lang": pa.array(df["lang"].to_numpy(object), pa.string()),
        "source": pa.array(df["source"].to_numpy(object), pa.string()),
        "o": pa.array(df["o"].to_numpy(np.int64)),
        "expected": pa.array(np.array(exp, dtype=np.float64)),
        "chi2_contrib": pa.array(np.array(contrib, dtype=np.float64)),
    })


SQL_CHI2_INDEPENDENCE = """
WITH o AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY 1, 2
), r AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM o GROUP BY 1),
c AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM o GROUP BY 1),
t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM o)
SELECT o.lang, o.source, o.o,
  ROUND(CAST(CAST(r.r AS HUGEINT) * c.c AS DOUBLE)
        / CAST(t.n AS DOUBLE), 6) AS expected,
  ROUND(CAST((CAST(t.n AS HUGEINT) * o.o - CAST(r.r AS HUGEINT) * c.c)
             * (CAST(t.n AS HUGEINT) * o.o - CAST(r.r AS HUGEINT) * c.c)
             AS DOUBLE)
        / CAST(CAST(t.n AS HUGEINT) * r.r * c.c AS DOUBLE), 6)
    AS chi2_contrib
FROM o JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t
"""


# =====================================================================
# data-quality check suite (dbt-style: nulls / uniqueness / FK / range)
# =====================================================================

def q_dq_checks(sf_dir: str):
    """dbt-style data-quality suite over the star schema — the four
    canonical checks an ingest gate runs per load: NOT NULL, key
    uniqueness, referential integrity (lineitem.l_orderkey →
    orders.o_orderkey), and an accepted-range rule. One row per check
    with its violation count. Scale shapes: null/range checks fold as
    per-block counts (zero shuffle); uniqueness counts rows minus
    distinct keys through ONE key groupby; the FK check tags dimension
    and fact keys through ONE shared key-hash exchange and counts fact
    keys with no dimension partner (no broadcast, no join
    materialization)."""
    from .sizing import fold_parts

    n_parts = fold_parts()

    def scalar_fold(ds, fn) -> int:
        tot = 0
        for b in ds.map_batches(fn, batch_format="pyarrow",
                                zero_copy_batch=True) \
                   .iter_batches(batch_format="pyarrow"):
            tot += int(pc.sum(b["n"]).as_py() or 0)
        return tot

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    # 1. NOT NULL — per-block null counts, zero shuffle
    nulls = scalar_fold(orders, lambda b: pa.table({
        "n": pa.array([b["o_custkey"].null_count], pa.int64())}))

    # 2. uniqueness — rows minus distinct keys, one key groupby
    def key_partial(b: pa.Table) -> pa.Table:
        u = b["o_orderkey"].combine_chunks().unique()
        return pa.table({"k": u})

    n_rows = scalar_fold(orders, lambda b: pa.table({
        "n": pa.array([b.num_rows], pa.int64())}))
    n_keys = (orders.map_batches(key_partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
              .groupby("k").aggregate(Count(alias_name="c"))
              .count())
    dups = n_rows - int(n_keys)

    # 3. referential integrity — tagged union through ONE exchange
    def tag(col: str, is_dim: bool):
        def fn(b: pa.Table) -> pa.Table:
            k = b[col].combine_chunks()
            if is_dim:
                k = k.unique()
            arr = k.to_numpy(zero_copy_only=False).astype(np.int64)
            kp = (_splitmix64(arr).view(np.uint64)
                  % np.uint64(n_parts)).astype(np.int64)
            return pa.table({
                "k": pa.array(arr),
                "is_dim": pa.array(
                    np.full(len(arr), is_dim, dtype=np.bool_)),
                "kp": pa.array(kp),
            })
        return fn

    def orphans(g: pd.DataFrame) -> pd.DataFrame:
        dim = g.loc[g["is_dim"], "k"].to_numpy()
        fact = g.loc[~g["is_dim"], "k"].to_numpy()
        bad = int((~np.isin(fact, dim)).sum())
        return pd.DataFrame({"n": [bad]})

    tagged = (orders.map_batches(tag("o_orderkey", True),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)
              .union(li.map_batches(tag("l_orderkey", False),
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)))
    orphan_rows = sum(
        int(pc.sum(b["n"]).as_py() or 0) for b in
        tagged.groupby("kp").map_groups(orphans, batch_format="pandas")
        .iter_batches(batch_format="pyarrow"))

    # 4. accepted range (a rule real rows VIOLATE, proving the check
    #    detects, not just passes) — per-block counts, zero shuffle
    bad_qty = scalar_fold(li, lambda b: pa.table({
        "n": pa.array([int(pc.sum(pc.cast(pc.or_(
            pc.less_equal(b["l_quantity"], pa.scalar(0.0)),
            pc.greater(b["l_quantity"], pa.scalar(40.0))),
            pa.int64())).as_py() or 0)], pa.int64())}))

    return pa.table({
        "check": pa.array(["fk_lineitem_orders", "null_custkey",
                           "qty_range", "unique_orderkey"]),
        "n_violations": pa.array([orphan_rows, nulls, bad_qty, dups],
                                 pa.int64()),
    })


SQL_DQ_CHECKS = """
SELECT 'fk_lineitem_orders' AS check,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT) AS n_violations
UNION ALL
SELECT 'null_custkey',
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
FROM orders
UNION ALL
SELECT 'qty_range',
       CAST(COUNT(*) FILTER (WHERE l_quantity <= 0 OR l_quantity > 40)
            AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'unique_orderkey',
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
"""


# =====================================================================
# conversion lag (signup → first purchase latency distribution)
# =====================================================================

def q_conversion_lag(sf_dir: str):
    """Signup → first-purchase latency histogram: for every user with a
    purchase at-or-after their first signup, the whole-day lag between
    the two — the conversion-velocity readout growth teams watch. Scale
    plan: both event types ride ONE user-hash exchange; each partition
    derives per-user argmin stamps with two vectorized groupby-mins and
    emits ≤|days| bucket partials; the finale is a tiny groupby. Lag =
    floor((tp − ts0) / 86400s) on exact integer microseconds, identical
    on both sides (no calendar-boundary date_diff ambiguity)."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    day_us = 86_400_000_000

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["event_type"],
                              value_set=pa.array(["signup", "purchase"])))
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "is_signup": pc.equal(b["event_type"], pa.scalar("signup")),
            "kp": pa.array(kp),
        })

    def lags(g: pd.DataFrame) -> pd.DataFrame:
        s = (g[g["is_signup"]].groupby("user_id")["ts_us"].min()
             .rename("ts0"))
        p = g[~g["is_signup"]][["user_id", "ts_us"]]
        j = p.join(s, on="user_id", how="inner")
        j = j[j["ts_us"] >= j["ts0"]]
        if not len(j):
            return pd.DataFrame({"lag_days": pd.Series(dtype=np.int64),
                                 "n_users": pd.Series(dtype=np.int64)})
        tp = j.groupby("user_id")["ts_us"].min()
        lag = ((tp - s.loc[tp.index]) // day_us).astype(np.int64)
        vc = lag.value_counts()
        return pd.DataFrame({"lag_days": vc.index.to_numpy(np.int64),
                             "n_users": vc.to_numpy(np.int64)})

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(lags, batch_format="pandas")
            .groupby("lag_days")
            .aggregate(Sum("n_users", alias_name="n_users")))


SQL_CONVERSION_LAG = """
WITH s AS (SELECT user_id, MIN(ts) AS ts0 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT e.user_id,
             MIN(epoch_us(e.ts)) - MIN(epoch_us(s.ts0)) AS lag_us
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= s.ts0
      GROUP BY e.user_id)
SELECT CAST(lag_us // 86400000000 AS BIGINT) AS lag_days,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY 1
"""


# =====================================================================
# cumulative onboarding curve (first-seen day → new / cumulative users)
# =====================================================================

def q_daily_new_users(sf_dir: str):
    """Daily NEW users and the cumulative onboarding curve — first-seen
    attribution, the growth chart every ingest/user pipeline reports.
    Scale plan: argmin-per-user folds in ONE user groupby (Min of the
    day-truncated stamp); the per-day counts are a tiny second exchange
    and the running total is a ≤#days driver cumsum — the event stream
    itself never re-sorts."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "day": pc.floor_temporal(b["ts"], unit="day"),
        })

    first = (ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("user_id")
             .aggregate(Min("day", alias_name="day")))
    per_day = (first.groupby("day")
               .aggregate(Count(alias_name="new_users")))

    df = per_day.to_pandas()  # ≤ #days rows — bounded fold
    df = df.sort_values("day", kind="mergesort")
    df["cum_users"] = df["new_users"].cumsum().astype(np.int64)
    return pa.table({
        "day": pa.array(df["day"].to_numpy()),
        "new_users": pa.array(df["new_users"].to_numpy(np.int64)),
        "cum_users": pa.array(df["cum_users"].to_numpy(np.int64)),
    })


SQL_DAILY_NEW_USERS = """
WITH f AS (SELECT user_id, MIN(date_trunc('day', ts)) AS day
           FROM events GROUP BY 1),
d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users FROM f GROUP BY 1)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d
"""


# =====================================================================
# Gini concentration coefficient (revenue inequality across suppliers)
# =====================================================================

def q_gini_concentration(sf_dir: str):
    """Gini coefficient of revenue concentration across suppliers — the
    inequality statistic a sourcing/mix dashboard tracks (its corpus
    twin: how skewed the per-domain document share is). Per-supplier
    revenue folds to tenth-cent int64 partials in ONE suppkey groupby;
    the Gini finale G = Σᵢ(2i−n−1)·xᵢ / (n·Σx) over the ASCENDING
    per-supplier totals is tie-invariant (permuting equal xᵢ leaves the
    sum unchanged), computed on the driver over the bounded supplier
    vector with python-int (≡ HUGEINT) numerators — suppliers ≪ rows by
    construction; past a driver bound the sorted-prefix boundary fold
    (q_spearman_corr's ranking primitive) is the distributed plan.
    ONE identical IEEE division per side, 6 dp."""
    ds = _t(sf_dir, "lineitem",
            ["l_suppkey", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.round(pc.multiply(
            pc.multiply(b["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), b["l_discount"])),
            pa.scalar(10000.0))).cast(pa.int64())
        return pa.table({"l_suppkey": b["l_suppkey"], "rev": rev})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("l_suppkey")
           .aggregate(Sum("rev", alias_name="rev")))

    df = agg.to_pandas()  # ≤ |suppliers| rows — bounded fold
    x = np.sort(df["rev"].to_numpy(np.int64))
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.int64)
    # object-dtype products: (2i−n−1)·xᵢ can pass 2⁶³ long before the
    # bounded supplier vector itself is a problem
    num = int(((2 * i - n - 1).astype(object) * x.astype(object)).sum())
    tot = int(x.sum())
    gini = float(num) / float(n * tot)
    return pa.table({"gini": pa.array([np.round(gini, 6)]),
                     "n_suppliers": pa.array([n], pa.int64())})


SQL_GINI_CONCENTRATION = """
WITH s AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000)
                  AS BIGINT)) AS rev
  FROM lineitem GROUP BY 1
), r AS (
  SELECT rev, ROW_NUMBER() OVER (ORDER BY rev) AS i,
         COUNT(*) OVER () AS n
  FROM s
)
SELECT ROUND(CAST(SUM((2 * CAST(i AS HUGEINT) - n - 1) * rev) AS DOUBLE)
             / CAST(MAX(CAST(n AS HUGEINT))
                    * (SELECT SUM(CAST(rev AS HUGEINT)) FROM s) AS DOUBLE),
             6) AS gini,
       CAST(MAX(n) AS BIGINT) AS n_suppliers
FROM r
"""


# =====================================================================
# Spearman rank correlation (global average ranks, exact int moments)
# =====================================================================

def q_spearman_corr(sf_dir: str):
    """Spearman rank correlation between quantity and extended price —
    Pearson over GLOBAL average ranks, the tie-robust monotonic-
    association statistic (corr_stats is its Pearson sibling). Ranks are
    doubled so tie-averaged ranks stay exact integers (avg2 = 2·RANK +
    c − 1). Scale plan: quantity's rank map folds from per-block
    bincounts (bounded distinct, zero shuffle) and broadcasts; price
    ranks come from ONE range-partitioning sort of the 16-byte/row
    (q, p) projection — each sorted block derives its values' runs
    locally and a ≤#blocks BOUNDARY FOLD on the driver supplies the
    block offsets plus the merged runs of values straddling block
    seams, so every row's global average rank is known IN PLACE: no
    600k-group hash aggregate, no rank-map join-back (that plan
    measured 8.0 s; this one ~3 s at sf0.1). Moment products
    (rank²·rank²) are accumulated as SPLIT hi/lo int64 pairs (p>>32 /
    p&0xffffffff summed separately), reconstructed exactly as python
    ints on the driver — Σrx2·ry2 of 10¹⁰ doubled ranks passes 2⁶³ per
    ROW, so a plain int64 Sum cannot carry it; the split pair can.
    Finale: ONE identical IEEE expression per side, 6 dp."""
    # quantity rank map: bounded distinct — per-block partials, no shuffle
    qds = _t(sf_dir, "lineitem", ["l_quantity"])

    def q_partial(b: pa.Table) -> pa.Table:
        v, c = np.unique(
            b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True)
        return pa.table({"q": pa.array(v), "c": pa.array(c.astype(np.int64))})

    qfold: dict[int, int] = {}
    for b in qds.map_batches(q_partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
               .iter_batches(batch_format="pyarrow"):
        for v, c in zip(b["q"].to_pylist(), b["c"].to_pylist()):
            qfold[v] = qfold.get(v, 0) + c
    q_keys = np.array(sorted(qfold), dtype=np.int64)
    q_cnt = np.array([qfold[v] for v in q_keys], dtype=np.int64)
    q_before = np.concatenate(([0], np.cumsum(q_cnt)[:-1]))
    q_avg2 = 2 * q_before + q_cnt + 1
    q_ref = ray.put((q_keys, q_avg2))

    # ONE range sort of the skinny projection; two block passes over it
    ds = _t(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "q": b["l_quantity"].cast(pa.int64()),
            "p": _cents(b["l_extendedprice"]),
        })

    sorted_fact = (ds.map_batches(prep, batch_format="pyarrow",
                                  zero_copy_batch=True)
                   .sort("p").materialize())

    # pass A: ≤1 skinny row per block — the boundary fold's input
    def block_stats(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"first_p": pa.array([], pa.int64()),
                             "n_first": pa.array([], pa.int64()),
                             "last_p": pa.array([], pa.int64()),
                             "n_last": pa.array([], pa.int64()),
                             "tot": pa.array([], pa.int64())})
        p = b["p"].to_numpy(zero_copy_only=False)
        n_first = int(np.searchsorted(p, p[0], side="right"))
        n_last = len(p) - int(np.searchsorted(p, p[-1], side="left"))
        return pa.table({"first_p": pa.array([int(p[0])], pa.int64()),
                         "n_first": pa.array([n_first], pa.int64()),
                         "last_p": pa.array([int(p[-1])], pa.int64()),
                         "n_last": pa.array([n_last], pa.int64()),
                         "tot": pa.array([b.num_rows], pa.int64())})

    stats = sorted(
        (r["first_p"], r["last_p"], r["n_first"], r["n_last"], r["tot"])
        for batch in sorted_fact.map_batches(
            block_stats, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
        for r in batch.to_pylist())
    seam: dict[int, list] = {}  # straddling value → [global_before, count]
    block_offsets = []          # (identity tuple, offset) per block
    pos = 0
    for fp, lp, nf, nl, tot in stats:
        # boundary runs: a value can continue across the seam — merge by
        # (min position, summed count). Single-valued blocks contribute
        # once (first == last would double-count otherwise).
        if fp == lp:
            e = seam.setdefault(fp, [pos, 0])
            e[0] = min(e[0], pos)
            e[1] += tot
        else:
            e = seam.setdefault(fp, [pos, 0])
            e[0] = min(e[0], pos)
            e[1] += nf
            e2 = seam.setdefault(lp, [pos + tot - nl, 0])
            e2[0] = min(e2[0], pos + tot - nl)
            e2[1] += nl
        # a block identifies itself by (first, last, run lengths, size) —
        # collisions are only possible between ALL-same-value blocks,
        # whose every row is seam-overridden, so a wrong offset is inert
        block_offsets.append(((fp, lp, nf, nl, tot), pos))
        pos += tot
    seam_ref = ray.put((dict(seam), block_offsets))

    # pass B: per-row global avg ranks IN PLACE + split moment partials
    def moments(b: pa.Table) -> pa.Table:
        cols = {"n": 0, "sx": 0, "sy": 0, "sxx_h": 0, "sxx_l": 0,
                "syy_h": 0, "syy_l": 0, "sxy_h": 0, "sxy_l": 0}
        if b.num_rows == 0:
            return pa.table({k: pa.array([v], pa.int64())
                             for k, v in cols.items()})
        p = b["p"].to_numpy(zero_copy_only=False)
        qv = b["q"].to_numpy(zero_copy_only=False)
        seam_map, blocks = ray.get(seam_ref)
        n_first = int(np.searchsorted(p, p[0], side="right"))
        n_last = len(p) - int(np.searchsorted(p, p[-1], side="left"))
        ident = (int(p[0]), int(p[-1]), n_first, n_last, len(p))
        off = next(o for bid, o in blocks if bid == ident)
        uniq, start, cnt = np.unique(p, return_index=True,
                                     return_counts=True)
        gb = start.astype(np.int64) + off
        gc = cnt.astype(np.int64)
        for i, v in enumerate(uniq):
            sv = seam_map.get(int(v))
            if sv is not None:
                gb[i], gc[i] = sv
        run_ry2 = 2 * gb + gc + 1
        inv = np.searchsorted(uniq, p)
        ry2 = run_ry2[inv]
        keys, avg2 = ray.get(q_ref)
        rx2 = avg2[np.searchsorted(keys, qv)]

        def split_sum(prod: np.ndarray) -> tuple[int, int]:
            return (int((prod >> 32).sum()),
                    int((prod & np.int64(0xFFFFFFFF)).sum()))

        cols["n"] = len(p)
        cols["sx"], cols["sy"] = int(rx2.sum()), int(ry2.sum())
        cols["sxx_h"], cols["sxx_l"] = split_sum(rx2 * rx2)
        cols["syy_h"], cols["syy_l"] = split_sum(ry2 * ry2)
        cols["sxy_h"], cols["sxy_l"] = split_sum(rx2 * ry2)
        return pa.table({k: pa.array([v], pa.int64())
                         for k, v in cols.items()})

    parts = pa.concat_tables(
        sorted_fact.map_batches(moments, batch_format="pyarrow",
                                zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")).to_pandas()
    n = int(parts["n"].sum())
    sx, sy = int(parts["sx"].sum()), int(parts["sy"].sum())

    def joined(h: str, l_: str) -> int:
        return sum((int(hh) << 32) + int(ll)
                   for hh, ll in zip(parts[h], parts[l_]))

    sxx, syy, sxy = (joined("sxx_h", "sxx_l"), joined("syy_h", "syy_l"),
                     joined("sxy_h", "sxy_l"))
    num = n * sxy - sx * sy          # exact ints ≡ HUGEINT
    rho = float(num) / (math.sqrt(float(n * sxx - sx * sx))
                        * math.sqrt(float(n * syy - sy * sy)))
    return pa.table({"rho": pa.array([np.round(rho, 6)]),
                     "n": pa.array([n], pa.int64())})


SQL_SPEARMAN_CORR = """
WITH r AS (
  SELECT 2 * RANK() OVER (ORDER BY CAST(l_quantity AS BIGINT))
           + COUNT(*) OVER (PARTITION BY CAST(l_quantity AS BIGINT)) - 1
           AS rx2,
         2 * RANK() OVER (ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT))
           + COUNT(*) OVER (PARTITION BY
                            CAST(ROUND(l_extendedprice * 100) AS BIGINT)) - 1
           AS ry2
  FROM lineitem
), m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(rx2 AS HUGEINT)) AS sx, SUM(CAST(ry2 AS HUGEINT)) AS sy,
         SUM(CAST(rx2 AS HUGEINT) * rx2) AS sxx,
         SUM(CAST(ry2 AS HUGEINT) * ry2) AS syy,
         SUM(CAST(rx2 AS HUGEINT) * ry2) AS sxy
  FROM r
)
SELECT ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS rho,
       CAST(n AS BIGINT) AS n
FROM m
"""


# =====================================================================
# point-in-time (temporal validity) join — fact → SCD2 version at ts
# =====================================================================

def q_temporal_join(sf_dir: str):
    """Point-in-time join: every click event picks up the purchase-value
    VERSION that was valid at its timestamp — the feature-store /
    SCD2-lookup join (as-of joins pick the nearest row; a PIT join picks
    the validity interval [valid_from, valid_to) containing ts, with
    LEAD-closed intervals so same-ts duplicate versions resolve to the
    newest, exactly like the warehouse semantics). Scale plan: dimension
    and fact are tagged and ride ONE user-hash exchange together; each
    partition runs a single vectorized pandas merge_asof (backward,
    by=user) — per-version LEAD intervals never materialize. Facts
    before a user's first version drop (inner semantics)."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id",
                               "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["event_type"],
                              value_set=pa.array(["purchase", "click"])))
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "is_dim": pc.equal(b["event_type"], pa.scalar("purchase")),
            "value": b["value"],
            "kp": pa.array(kp),
        })

    def pit(g: pd.DataFrame) -> pd.DataFrame:
        dim = g[g["is_dim"]].sort_values(
            ["ts_us", "event_id"], kind="mergesort")
        fact = g[~g["is_dim"]].sort_values("ts_us", kind="mergesort")
        if not len(dim) or not len(fact):
            return pd.DataFrame({
                "event_id": pd.Series(dtype=np.int64),
                "user_id": pd.Series(dtype=np.int64),
                "purchase_value": pd.Series(dtype=np.float64),
                "valid_from": pd.Series(dtype="datetime64[us]"),
            })
        j = pd.merge_asof(
            fact[["event_id", "user_id", "ts_us"]],
            dim[["user_id", "ts_us", "value"]].rename(
                columns={"value": "purchase_value"}),
            on="ts_us", by="user_id", direction="backward",
        ).dropna(subset=["purchase_value"])
        # merge_asof picks the LAST dim row with ts <= fact ts — with the
        # (ts, event_id) dim sort that IS the newest same-ts version,
        # i.e. the row whose LEAD interval contains the fact timestamp.
        # valid_from: re-attach the matched version's start stamp
        vf = pd.merge_asof(
            fact[["ts_us", "user_id"]],
            dim[["user_id", "ts_us"]].assign(vf=dim["ts_us"].to_numpy()),
            on="ts_us", by="user_id", direction="backward",
        )["vf"]
        j["valid_from"] = pd.to_datetime(
            vf.loc[j.index].astype(np.int64), unit="us")
        return pd.DataFrame({
            "event_id": j["event_id"].to_numpy(np.int64),
            "user_id": j["user_id"].to_numpy(np.int64),
            "purchase_value": j["purchase_value"].to_numpy(np.float64),
            "valid_from": j["valid_from"].to_numpy(),
        })

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(pit, batch_format="pandas"))


SQL_TEMPORAL_JOIN = """
WITH dim AS (
  SELECT user_id, ts AS valid_from, value AS purchase_value,
         COALESCE(LEAD(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id),
                  TIMESTAMP '9999-12-31') AS valid_to
  FROM events WHERE event_type = 'purchase'
), f AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT f.event_id, f.user_id, dim.purchase_value, dim.valid_from
FROM f JOIN dim ON f.user_id = dim.user_id
  AND f.ts >= dim.valid_from AND f.ts < dim.valid_to
"""


# =====================================================================
# sequence gap detection (ordered scan with block-boundary fold)
# =====================================================================

def q_sequence_gaps(sf_dir: str):
    """Missing-id ranges in the finished orders' orderkey sequence —
    the integrity check an ingest ledger runs to find dropped batches
    (SQL needs a global LAG; a naive engine port would be a single-task
    ordered scan). Scale plan: ONE range-partitioning sort, then each
    block finds its internal gaps with a vectorized diff and emits one
    skinny (block min, max) stats row; the ONLY sequential work is the
    ≤#blocks boundary fold on the driver (adjacent blocks' max→min
    seams), unioned back as a tiny from_arrow dataset. The gap rows ARE
    the result — nothing else materializes."""
    ds = (_t(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
          .filter(expr="o_orderstatus == 'F'")
          .select_columns(["o_orderkey"])
          .sort("o_orderkey"))

    def block_gaps(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({"gap_start": pa.array([], pa.int64()),
                             "gap_end": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int64())})
        d = np.flatnonzero(np.diff(k) > 1)
        gs = np.concatenate((k[d] + 1, [k[0]]))          # kind 0: gaps
        ge = np.concatenate((k[d + 1] - 1, [k[-1]]))     # kind 1: stats
        kind = np.concatenate((np.zeros(len(d), np.int64), [1]))
        return pa.table({"gap_start": pa.array(gs.astype(np.int64)),
                         "gap_end": pa.array(ge.astype(np.int64)),
                         "kind": pa.array(kind)})

    mapped = ds.map_batches(block_gaps, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    internal = mapped.filter(expr="kind == 0") \
                     .select_columns(["gap_start", "gap_end"])

    # ≤ 1 stats row per block — bounded boundary fold
    stats = []
    for b in mapped.filter(expr="kind == 1") \
                   .iter_batches(batch_format="pyarrow"):
        stats.extend(zip(b["gap_start"].to_pylist(),
                         b["gap_end"].to_pylist()))
    stats.sort()
    seam_s, seam_e = [], []
    for (lo_prev, hi_prev), (lo_next, _) in zip(stats, stats[1:]):
        if lo_next - hi_prev > 1:
            seam_s.append(hi_prev + 1)
            seam_e.append(lo_next - 1)
    out = internal
    if seam_s:  # skip the union when no block seam hides a gap
        out = out.union(rd.from_arrow(pa.table({
            "gap_start": pa.array(seam_s, pa.int64()),
            "gap_end": pa.array(seam_e, pa.int64()),
        })))

    def length(b: pa.Table) -> pa.Table:
        return b.append_column(
            "gap_len", pc.add(pc.subtract(b["gap_end"], b["gap_start"]),
                              pa.scalar(1, pa.int64())))

    return out.map_batches(length, batch_format="pyarrow",
                           zero_copy_batch=True)


SQL_SEQUENCE_GAPS = """
WITH k AS (SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'),
s AS (SELECT k, LAG(k) OVER (ORDER BY k) AS prev FROM k)
SELECT CAST(prev + 1 AS BIGINT) AS gap_start,
       CAST(k - 1 AS BIGINT) AS gap_end,
       CAST(k - prev - 1 AS BIGINT) AS gap_len
FROM s WHERE prev IS NOT NULL AND k - prev > 1
"""


# =====================================================================
# Mann-Whitney U rank-sum test (purchase vs click values)
# =====================================================================

def _hi_lo(p: int) -> tuple[int, int]:
    """Split a nonnegative python int into (p >> 32, p & 0xffffffff) so a
    > 2^63 partial can ride two int64 columns (spearman's trick)."""
    return p >> 32, p & 0xFFFFFFFF


def _rank_sum_u(prepped) -> tuple[int, int, int, int]:
    """Exact Mann-Whitney U machinery over a Dataset of per-block
    (vc, a, n) partials (a = arm-A count, n = total count per value):
    ONE value-key groupby to the unique table, ONE range sort, per-block
    doubled-average-rank partials whose global offset enters LINEARLY,
    one <=#blocks driver fold. hi/lo int64 pairs carry the >2^63
    products. Returns (u1, n1, n2, tie3) as exact python ints —
    q_mann_whitney's test statistic and q_roc_auc's numerator share this
    (AUC = U / (n1*n2) is the rank-sum identity)."""
    uniq = (prepped.groupby("vc")
            .aggregate(Sum("a", alias_name="a"), Sum("n", alias_name="n"))
            .sort("vc"))

    def block_part(b: pa.Table) -> pa.Table:
        cols = ["first_vc", "sum_n", "sum_a", "r1_hi", "r1_lo",
                "tie_hi", "tie_lo"]
        if b.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        n_v = b["n"].to_numpy(zero_copy_only=False).astype(object)
        a_v = b["a"].to_numpy(zero_copy_only=False).astype(object)
        before = np.concatenate(([0], np.cumsum(n_v)[:-1]))
        r1 = int((a_v * (2 * before + n_v + 1)).sum())
        tie = int((n_v * n_v * n_v - n_v).sum())
        r1_hi, r1_lo = _hi_lo(r1)
        tie_hi, tie_lo = _hi_lo(tie)
        vals = [int(b["vc"][0].as_py()), int(n_v.sum()), int(a_v.sum()),
                r1_hi, r1_lo, tie_hi, tie_lo]
        return pa.table({c: pa.array([v], pa.int64())
                         for c, v in zip(cols, vals)})

    parts = sorted(
        (dict(zip(b.column_names, row))
         for b in uniq.map_batches(block_part, batch_format="pyarrow")
                      .iter_batches(batch_format="pyarrow")
         for row in zip(*(b[c].to_pylist() for c in b.column_names))),
        key=lambda r: r["first_vc"])
    n1 = sum(p["sum_a"] for p in parts)
    n = sum(p["sum_n"] for p in parts)
    n2 = n - n1
    off = 0
    r1_2 = 0
    tie3 = 0
    for p in parts:
        r1_2 += (p["r1_hi"] << 32) + p["r1_lo"] + 2 * off * p["sum_a"]
        tie3 += (p["tie_hi"] << 32) + p["tie_lo"]
        off += p["sum_n"]
    u1 = (r1_2 - n1 * (n1 + 1)) // 2
    return u1, n1, n2, tie3


def q_mann_whitney(sf_dir: str):
    """Mann-Whitney U rank-sum test: are purchase values stochastically
    larger than click values? The nonparametric two-sample test an
    experimentation pipeline runs when values are skewed (its corpus
    twin: compare quality-score distributions between two sources).

    Scale plan: ranks never materialize per row. Values fold to a
    UNIQUE-value table (vc -> n_v, a_v) in ONE cent-key groupby (the
    cent domain is bounded, ~50k states); one range sort of that skinny
    table lets each block derive its values' doubled average ranks from
    LOCAL prefix sums, and the global offset enters LINEARLY
    (R1 += 2*offset*SUM(a_v in block)) so a single <=#blocks driver fold
    finishes the rank sum - no second pass, no join-back. Per-block
    partials accumulate as python ints and ride hi/lo int64 pairs
    (a_v*(2*before+n_v+1) passes 2^63 near N~10^10; the tie term
    SUM(t^3-t) even sooner). Finale: U1 exact integer; z from the
    IDENTICAL IEEE expression both sides, 6 dp."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array(["purchase", "click"]))
        t = b.filter(keep)
        g = pa.table({
            "vc": _cents(t["value"]),
            "a": pc.equal(t["event_type"], pa.scalar("purchase"))
                   .cast(pa.int64()),
        }).group_by("vc").aggregate([("a", "sum"), ([], "count_all")])
        return pa.table({"vc": g["vc"], "a": g["a_sum"],
                         "n": g["count_all"]})

    u1, n1, n2, tie3 = _rank_sum_u(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    n = n1 + n2
    n1f, n2f, nf = float(n1), float(n2), float(n)
    mu = n1f * n2f / 2.0
    var = n1f * n2f / 12.0 * ((nf + 1.0) - float(tie3) / (nf * (nf - 1.0)))
    z = (float(u1) - mu) / math.sqrt(var)
    return pa.table({"u1": pa.array([u1], pa.int64()),
                     "n1": pa.array([n1], pa.int64()),
                     "n2": pa.array([n2], pa.int64()),
                     "z": pa.array([np.round(z, 6)], pa.float64())})


SQL_MANN_WHITNEY = """
WITH v AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS vc,
         (event_type = 'purchase') AS a
  FROM events WHERE event_type IN ('purchase', 'click')
), r AS (
  SELECT a,
         CAST(RANK() OVER (ORDER BY vc) AS HUGEINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY vc) AS HUGEINT) AS t
  FROM v
), s AS (
  SELECT SUM(CASE WHEN a THEN 2 * rk + t - 1 END) AS r1_2,
         CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
         CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS HUGEINT) AS n2
  FROM r
), tt AS (
  SELECT SUM(t * t * t - t) AS tie3
  FROM (SELECT CAST(COUNT(*) AS HUGEINT) AS t FROM v GROUP BY vc)
)
SELECT CAST((r1_2 - n1 * (n1 + 1)) // 2 AS BIGINT) AS u1,
       CAST(n1 AS BIGINT) AS n1,
       CAST(n2 AS BIGINT) AS n2,
       ROUND((CAST((r1_2 - n1 * (n1 + 1)) // 2 AS DOUBLE)
              - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
             / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                    * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                       - CAST(tie3 AS DOUBLE)
                         / (CAST(n1 + n2 AS DOUBLE)
                            * (CAST(n1 + n2 AS DOUBLE) - 1.0)))),
             6) AS z
FROM s, tt
"""


# =====================================================================
# two-sample Kolmogorov-Smirnov statistic (purchase vs view values)
# =====================================================================

def q_ks_test(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov D: the max ECDF gap between
    purchase and view value distributions - the distribution-drift
    check a data-quality monitor runs between two sources or two
    snapshot days. D compares as EXACT integers: at each support point
    |s1*n2 - s2*n1| with s = inclusive cumulative counts, so no float
    ECDF ever exists; ONE division at the end, 6 dp.

    Scale plan: same bounded unique-value fold as mann_whitney (ONE
    cent-key groupby); after the range sort each block reports only
    (sum1, sum2, gmax, gmin) of its LOCAL prefix gap g = lc1*n2 - lc2*n1
    - the global offset shifts every g by the same s, and
    max|s + g| = max(s + gmax, -(s + gmin)), so a <=#blocks driver fold
    finishes exactly. Bound: n1*n2 < 2^63 (per-arm N < ~3e9; past that
    the hi/lo pair rides here too)."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array(["purchase", "view"]))
        t = b.filter(keep)
        g = pa.table({
            "vc": _cents(t["value"]),
            "a": pc.equal(t["event_type"], pa.scalar("purchase"))
                   .cast(pa.int64()),
        }).group_by("vc").aggregate([("a", "sum"), ([], "count_all")])
        return pa.table({"vc": g["vc"], "c1": g["a_sum"],
                         "c2": pc.subtract(g["count_all"], g["a_sum"])})

    uniq = (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("vc")
            .aggregate(Sum("c1", alias_name="c1"),
                       Sum("c2", alias_name="c2"))
            .sort("vc")
            .materialize())

    tot = uniq.aggregate(Sum("c1"), Sum("c2"))
    n1, n2 = int(tot["sum(c1)"]), int(tot["sum(c2)"])

    def block_part(b: pa.Table, n1=n1, n2=n2) -> pa.Table:
        cols = ["first_vc", "s1", "s2", "gmax", "gmin"]
        if b.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        c1 = b["c1"].to_numpy(zero_copy_only=False)
        c2 = b["c2"].to_numpy(zero_copy_only=False)
        lc1, lc2 = np.cumsum(c1), np.cumsum(c2)
        g = lc1 * n2 - lc2 * n1
        vals = [int(b["vc"][0].as_py()), int(lc1[-1]), int(lc2[-1]),
                int(g.max()), int(g.min())]
        return pa.table({c: pa.array([v], pa.int64())
                         for c, v in zip(cols, vals)})

    parts = sorted(
        (dict(zip(b.column_names, row))
         for b in uniq.map_batches(block_part, batch_format="pyarrow")
                      .iter_batches(batch_format="pyarrow")
         for row in zip(*(b[c].to_pylist() for c in b.column_names))),
        key=lambda r: r["first_vc"])
    off1 = off2 = 0
    d_num = 0
    for p in parts:
        s = off1 * n2 - off2 * n1
        d_num = max(d_num, s + p["gmax"], -(s + p["gmin"]))
        off1 += p["s1"]
        off2 += p["s2"]
    d = float(d_num) / float(n1 * n2)
    return pa.table({"d": pa.array([np.round(d, 6)], pa.float64()),
                     "n1": pa.array([n1], pa.int64()),
                     "n2": pa.array([n2], pa.int64())})


SQL_KS_TEST = """
WITH v AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS vc,
         (event_type = 'purchase') AS a
  FROM events WHERE event_type IN ('purchase', 'view')
), u AS (
  SELECT vc,
         SUM(CASE WHEN a THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN a THEN 0 ELSE 1 END) AS c2
  FROM v GROUP BY vc
), t AS (
  SELECT CAST(SUM(c1) AS HUGEINT) AS n1, CAST(SUM(c2) AS HUGEINT) AS n2
  FROM u
), c AS (
  SELECT CAST(SUM(c1) OVER (ORDER BY vc) AS HUGEINT) AS s1,
         CAST(SUM(c2) OVER (ORDER BY vc) AS HUGEINT) AS s2
  FROM u
)
SELECT ROUND(CAST(MAX(ABS(s1 * n2 - s2 * n1)) AS DOUBLE)
             / CAST(n1 * n2 AS DOUBLE), 6) AS d,
       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
FROM c, t GROUP BY n1, n2
"""


# =====================================================================
# Benford first-significant-digit audit
# =====================================================================

def q_benford_digits(sf_dir: str):
    """Benford's-law first-digit audit over order totals - the classic
    fabricated-data screen (its corpus twin: audit synthetic/generated
    documents whose numeric fields were sampled uniformly instead of
    organically). First significant digits are derived from EXACT cent
    integers by repeated integer division (a <=10-step vectorized loop,
    no log10 boundary risk); digits fold per block to <=9 partial rows,
    so the exchange is blocks x 9 and the frequency division happens
    once per digit on the driver. Expected Benford mass log10(1 + 1/d)
    is the identical expression both sides, 6 dp."""
    ds = _t(sf_dir, "orders", ["o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        x = _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False).copy()
        while (x >= 10).any():
            big = x >= 10
            x[big] //= 10
        d, n = np.unique(x, return_counts=True)
        return pa.table({"digit": pa.array(d, pa.int64()),
                         "n": pa.array(n.astype(np.int64))})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("digit")
           .aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas()  # <= 9 rows - bounded fold
    df = df.sort_values("digit", ignore_index=True)
    total = float(int(df["n"].sum()))
    obs = np.round(df["n"].to_numpy(np.int64).astype(np.float64) / total, 6)
    exp = np.round(np.log10(1.0 + 1.0 / df["digit"].to_numpy(np.float64)), 6)
    return pa.table({"digit": pa.array(df["digit"].to_numpy(np.int64)),
                     "n": pa.array(df["n"].to_numpy(np.int64)),
                     "obs_freq": pa.array(obs, pa.float64()),
                     "benford_freq": pa.array(exp, pa.float64())})


SQL_BENFORD_DIGITS = """
WITH d AS (
  SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
), g AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
)
SELECT digit, n,
       ROUND(CAST(n AS DOUBLE) / CAST((SELECT SUM(n) FROM g) AS DOUBLE),
             6) AS obs_freq,
       ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_freq
FROM g
"""


# =====================================================================
# per-group skewness / kurtosis from exact integer raw moments
# =====================================================================

def q_skew_kurtosis(sf_dir: str):
    """Per-group population skewness g1 = m3/m2^1.5 and excess kurtosis
    g2 = m4/m2^2 - 3 over quantities - the shape statistics a
    distribution-drift monitor tracks next to mean/variance (corr_stats'
    higher-moment siblings). Raw moment sums S1..S4 fold as int64
    per-block Arrow partials (quantity <= 50 keeps x^4 <= 6.25e6; the
    documented bound is SUM(x^4) < 2^63, past which the hi/lo pair
    rides); central moments come from the EXACT integer identities
    M2 = n*S2 - S1^2, M3 = n^2*S3 - 3n*S1*S2 + 2*S1^3,
    M4 = n^3*S4 - 4n^2*S1*S3 + 6n*S1^2*S2 - 3*S1^4 in python ints
    (== HUGEINT) on the <=|flags| driver rows, so no float cancellation
    ever happens. Finale: IDENTICAL IEEE expression both sides
    (sqrt not pow - pow is not correctly rounded across libms), 6 dp."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        q = pc.round(b["l_quantity"]).cast(pa.int64())
        q2 = pc.multiply(q, q)
        t = pa.table({
            "flag": b["l_returnflag"], "s1": q, "s2": q2,
            "s3": pc.multiply(q2, q), "s4": pc.multiply(q2, q2),
        })
        g = t.group_by("flag").aggregate(
            [("s1", "sum"), ("s2", "sum"), ("s3", "sum"), ("s4", "sum"),
             ([], "count_all")])
        return g.rename_columns(["flag", "s1", "s2", "s3", "s4", "n"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("flag")
           .aggregate(Sum("s1", alias_name="s1"), Sum("s2", alias_name="s2"),
                      Sum("s3", alias_name="s3"), Sum("s4", alias_name="s4"),
                      Sum("n", alias_name="n")))
    df = agg.to_pandas()  # <= |flags| rows - bounded fold
    df = df.sort_values("flag", ignore_index=True)
    rows = {"flag": [], "n": [], "skew": [], "kurt": []}
    for _, r in df.iterrows():
        n, s1, s2, s3, s4 = (int(r["n"]), int(r["s1"]), int(r["s2"]),
                             int(r["s3"]), int(r["s4"]))
        m2i = n * s2 - s1 * s1
        m3i = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        m4i = (n ** 3 * s4 - 4 * n * n * s1 * s3
               + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
        nf = float(n)
        m2 = float(m2i) / (nf * nf)
        m3 = float(m3i) / (nf * nf * nf)
        m4 = float(m4i) / (nf * nf * nf * nf)
        rows["flag"].append(r["flag"])
        rows["n"].append(n)
        rows["skew"].append(np.round(m3 / (m2 * math.sqrt(m2)), 6))
        rows["kurt"].append(np.round(m4 / (m2 * m2) - 3.0, 6))
    return pa.table({"flag": pa.array(rows["flag"], pa.string()),
                     "n": pa.array(rows["n"], pa.int64()),
                     "skew": pa.array(rows["skew"], pa.float64()),
                     "kurt": pa.array(rows["kurt"], pa.float64())})


SQL_SKEW_KURTOSIS = """
WITH m AS (
  SELECT l_returnflag AS flag,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT)) AS s1,
         SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(l_quantity) AS BIGINT)) AS s2,
         SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(l_quantity) AS BIGINT)
             * CAST(ROUND(l_quantity) AS BIGINT)) AS s3,
         SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(l_quantity) AS BIGINT)
             * CAST(ROUND(l_quantity) AS BIGINT)
             * CAST(ROUND(l_quantity) AS BIGINT)) AS s4
  FROM lineitem GROUP BY 1
), c AS (
  SELECT flag, n,
         CAST(n * s2 - s1 * s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS m2,
         CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
           AS m3,
         CAST(n * n * n * s4 - 4 * n * n * s1 * s3
              + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
              * CAST(n AS DOUBLE)) AS m4
  FROM m
)
SELECT flag, CAST(n AS BIGINT) AS n,
       ROUND(m3 / (m2 * SQRT(m2)), 6) AS skew,
       ROUND(m4 / (m2 * m2) - 3.0, 6) AS kurt
FROM c
"""


# =====================================================================
# exact distributed weighted median per group
# =====================================================================

def q_weighted_median(sf_dir: str):
    """Quantity-weighted median price per return flag - the robust
    center a pricing/quality dashboard wants when heavy rows should
    count more (corpus twin: token-weighted median quality score per
    source). Selection is EXACT-integer: the median is the smallest
    price with 2*cumweight >= totweight, so no float CDF exists.

    Scale plan: NO hash aggregate at all - (flag, cent, weight) rows
    pre-fold block-locally (Arrow group_by, shrinks the sort payload for
    free) and go straight into ONE (flag, vc) range sort; duplicates of
    a pair MAY straddle block seams, and that is fine: pass A ships <=1
    skinny row per (block, flag) and the driver derives per-flag totals
    and per-block starting offsets (block order = (first, last) key of
    each block; blocks with identical first=last keys hold a single
    repeated value, so their relative order cannot change the crossing
    value); pass B re-scans the sorted table with the offset map
    broadcast and emits at most one candidate per (block, flag) - the
    driver keeps each flag's smallest. Nothing larger than blocks x
    flags ever reaches the driver."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_extendedprice", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "flag": b["l_returnflag"],
            "vc": _cents(b["l_extendedprice"]),
            "w": pc.round(b["l_quantity"]).cast(pa.int64()),
        })
        g = t.group_by(["flag", "vc"]).aggregate([("w", "sum")])
        return g.rename_columns(["flag", "vc", "w"])

    srt = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .sort(["flag", "vc"])
           .materialize())

    def pass_a(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"bflag": pa.array([], pa.string()),
                             "bvc": pa.array([], pa.int64()),
                             "lflag": pa.array([], pa.string()),
                             "lvc": pa.array([], pa.int64()),
                             "flag": pa.array([], pa.string()),
                             "w": pa.array([], pa.int64())})
        g = b.group_by("flag").aggregate([("w", "sum")])
        k = g.num_rows
        last = b.num_rows - 1
        return pa.table({
            "bflag": pa.array([b["flag"][0].as_py()] * k, pa.string()),
            "bvc": pa.array([b["vc"][0].as_py()] * k, pa.int64()),
            "lflag": pa.array([b["flag"][last].as_py()] * k, pa.string()),
            "lvc": pa.array([b["vc"][last].as_py()] * k, pa.int64()),
            "flag": g["flag"], "w": g["w_sum"]})

    parts = []
    for b in srt.map_batches(pass_a, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
        parts.extend(zip(b["bflag"].to_pylist(), b["bvc"].to_pylist(),
                         b["lflag"].to_pylist(), b["lvc"].to_pylist(),
                         b["flag"].to_pylist(), b["w"].to_pylist()))
    totals: dict[str, int] = {}
    offsets: dict[tuple, int] = {}
    # block order: (first key, last key); identical-key collisions can
    # only be all-one-value blocks, where order is provably irrelevant
    for bflag, bvc, lflag, lvc, flag, w in sorted(
            parts, key=lambda r: (r[4], r[0], r[1], r[2], r[3])):
        offsets[(bflag, bvc, lflag, lvc, flag)] = totals.get(flag, 0)
        totals[flag] = totals.get(flag, 0) + w
    off_ref = ray.put((offsets, totals))

    def pass_b(b: pa.Table) -> pa.Table:
        empty = pa.table({"flag": pa.array([], pa.string()),
                          "vc": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        offs, tots = ray.get(off_ref)
        last = b.num_rows - 1
        bkey = (b["flag"][0].as_py(), b["vc"][0].as_py(),
                b["flag"][last].as_py(), b["vc"][last].as_py())
        flags = b["flag"].to_pylist()
        vcs = b["vc"].to_numpy(zero_copy_only=False)
        ws = b["w"].to_numpy(zero_copy_only=False)
        out_f, out_v = [], []
        i = 0
        while i < len(flags):
            j = i
            while j < len(flags) and flags[j] == flags[i]:
                j += 1
            cum = offs[bkey + (flags[i],)] + np.cumsum(ws[i:j])
            hit = np.flatnonzero(2 * cum >= tots[flags[i]])
            if len(hit):
                out_f.append(flags[i])
                out_v.append(int(vcs[i + hit[0]]))
            i = j
        return pa.table({"flag": pa.array(out_f, pa.string()),
                         "vc": pa.array(out_v, pa.int64())})

    cand: dict[str, int] = {}
    for b in srt.map_batches(pass_b, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
        for f, v in zip(b["flag"].to_pylist(), b["vc"].to_pylist()):
            cand[f] = min(cand.get(f, v), v)
    flags = sorted(cand)
    return pa.table({
        "flag": pa.array(flags, pa.string()),
        "wmedian": pa.array([float(cand[f]) / 100.0 for f in flags],
                            pa.float64()),
        "tot_weight": pa.array([totals[f] for f in flags], pa.int64())})


SQL_WEIGHTED_MEDIAN = """
WITH w AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS vc,
         CAST(ROUND(l_quantity) AS BIGINT) AS wt
  FROM lineitem
), u AS (
  SELECT flag, vc, CAST(SUM(wt) AS HUGEINT) AS w FROM w GROUP BY 1, 2
), c AS (
  SELECT flag, vc,
         SUM(w) OVER (PARTITION BY flag ORDER BY vc) AS cum,
         SUM(w) OVER (PARTITION BY flag) AS tot
  FROM u
)
SELECT flag, CAST(MIN(vc) AS DOUBLE) / 100.0 AS wmedian,
       CAST(MIN(tot) AS BIGINT) AS tot_weight
FROM c WHERE 2 * cum >= tot GROUP BY flag
"""


# =====================================================================
# one-way ANOVA F statistic, exact-rational (no float cancellation)
# =====================================================================

def q_anova_f(sf_dir: str):
    """One-way ANOVA F across three event arms - does mean value differ
    between click/view/purchase? (corpus twin: does mean quality score
    differ between sources?). SSB is a difference of ~equal huge terms,
    so the float path would cancel catastrophically; instead F reduces
    to ONE division of exact integers via the common denominator
    D = n1*n2*n3: with T = SUM_g S_g^2 * (D/n_g),
    F = (N*T - S^2*D)*(N-k) / (N*(Q*D - T)*(k-1)). Per-group (n, S, Q)
    fold as int64 per-block Arrow partials through a k-row exchange;
    the finale is python-int (== HUGEINT) on <= k driver rows.
    Documented bound: N*T*(N-k) < 2^127 (holds through sf ~0.3 at cent
    scale; past that, scale cents down or split the product)."""
    arms = ["click", "view", "purchase"]
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"], value_set=pa.array(arms))
        t = b.filter(keep)
        vc = _cents(t["value"])
        g = pa.table({
            "g": t["event_type"], "s": vc, "q": pc.multiply(vc, vc),
        }).group_by("g").aggregate(
            [("s", "sum"), ("q", "sum"), ([], "count_all")])
        return g.rename_columns(["g", "s", "q", "n"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("g")
           .aggregate(Sum("s", alias_name="s"), Sum("q", alias_name="q"),
                      Sum("n", alias_name="n")))
    df = agg.to_pandas()  # <= k rows - bounded fold
    stats = {r["g"]: (int(r["n"]), int(r["s"]), int(r["q"]))
             for _, r in df.iterrows()}
    k = len(arms)
    ns = [stats[a][0] for a in arms]
    ss = [stats[a][1] for a in arms]
    n_tot = sum(ns)
    s_tot = sum(ss)
    q_tot = sum(stats[a][2] for a in arms)
    d = ns[0] * ns[1] * ns[2]
    t_sum = sum(s * s * (d // n) for s, n in zip(ss, ns))
    num = (n_tot * t_sum - s_tot * s_tot * d) * (n_tot - k)
    den = n_tot * (q_tot * d - t_sum) * (k - 1)
    f = float(num) / float(den)
    return pa.table({"f": pa.array([np.round(f, 6)], pa.float64()),
                     "n": pa.array([n_tot], pa.int64()),
                     "k": pa.array([k], pa.int64())})


SQL_ANOVA_F = """
WITH m AS (
  SELECT event_type AS g,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(CAST(ROUND(value * 100) AS BIGINT) AS HUGEINT)) AS s,
         SUM(CAST(CAST(ROUND(value * 100) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(value * 100) AS BIGINT)) AS q
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
  GROUP BY 1
), p AS (
  SELECT SUM(n) AS nn, SUM(s) AS stot, SUM(q) AS qtot,
         MAX(CASE WHEN g = 'click' THEN n END) AS n1,
         MAX(CASE WHEN g = 'view' THEN n END) AS n2,
         MAX(CASE WHEN g = 'purchase' THEN n END) AS n3,
         MAX(CASE WHEN g = 'click' THEN s END) AS s1,
         MAX(CASE WHEN g = 'view' THEN s END) AS s2,
         MAX(CASE WHEN g = 'purchase' THEN s END) AS s3
  FROM m
), e AS (
  SELECT nn, qtot, n1 * n2 * n3 AS d,
         s1 * s1 * (n2 * n3) + s2 * s2 * (n1 * n3)
           + s3 * s3 * (n1 * n2) AS t,
         stot * stot AS s2tot
  FROM p
)
SELECT ROUND(CAST((nn * t - s2tot * d) * (nn - 3) AS DOUBLE)
             / CAST(nn * (qtot * d - t) * 2 AS DOUBLE), 6) AS f,
       CAST(nn AS BIGINT) AS n,
       CAST(3 AS BIGINT) AS k
FROM e
"""


# =====================================================================
# year-over-year growth by month
# =====================================================================

def q_yoy_growth(sf_dir: str):
    """Monthly revenue with year-over-year growth - the seasonality-
    aware trend every revenue (or crawl-volume) dashboard leads with.
    Month revenues fold as int64 cent partials per block through a
    <=#months exchange; the YoY join is a driver dict lookup on the
    bounded month table keyed by (year-1, month) - no LAG(12) gap
    fragility when months are missing. growth = (rev - prev)/prev with
    ONE identical IEEE expression, 6 dp; NULL when no prior year."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "y": pc.year(b["o_orderdate"]),
            "m": pc.month(b["o_orderdate"]),
            "rev": _cents(b["o_totalprice"]),
        })
        g = t.group_by(["y", "m"]).aggregate([("rev", "sum")])
        return g.rename_columns(["y", "m", "rev"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["y", "m"])
           .aggregate(Sum("rev", alias_name="rev")))
    df = agg.to_pandas()  # <= #months rows - bounded fold
    df = df.sort_values(["y", "m"], ignore_index=True)
    prev = {(int(r["y"]), int(r["m"])): int(r["rev"])
            for _, r in df.iterrows()}
    growth = []
    for _, r in df.iterrows():
        p = prev.get((int(r["y"]) - 1, int(r["m"])))
        growth.append(
            None if p is None else
            np.round((float(int(r["rev"])) - float(p)) / float(p), 6))
    return pa.table({
        "y": pa.array(df["y"].to_numpy(np.int64)),
        "m": pa.array(df["m"].to_numpy(np.int64)),
        "revenue": pa.array(
            [float(v) / 100.0 for v in df["rev"].to_numpy(np.int64)],
            pa.float64()),
        "yoy": pa.array(growth, pa.float64()),
    })


SQL_YOY_GROWTH = """
WITH m AS (
  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS y,
         CAST(MONTH(o_orderdate) AS BIGINT) AS m,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT a.y, a.m, CAST(a.rev AS DOUBLE) / 100.0 AS revenue,
       ROUND((CAST(a.rev AS DOUBLE) - CAST(b.rev AS DOUBLE))
             / CAST(b.rev AS DOUBLE), 6) AS yoy
FROM m a LEFT JOIN m b ON b.y = a.y - 1 AND b.m = a.m
"""


# =====================================================================
# event path trigrams (sequential pattern counts)
# =====================================================================

def q_path_trigrams(sf_dir: str):
    """Counts of consecutive event-type TRIPLES per user journey - the
    order-3 sequential patterns (signup->view->purchase vs
    view->view->view) a funnel or next-action model mines; markov's
    order-2 sibling. Same scale plan as markov_transitions: skinny rows
    ride ONE user-hash exchange, each partition lexsorts once by
    (user, ts, event_id) and derives every consecutive triple with two
    vectorized shifts, folding to <=|types|^3 bincount partials before
    anything leaves the task; the finale is a bounded driver-side
    groupby fold."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "kp": pa.array(kp),
        })

    def triples(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        types, codes = np.unique(g["event_type"].to_numpy(object),
                                 return_inverse=True)
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], codes[order]
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        a, b2, c3 = c[:-2][same], c[1:-1][same], c[2:][same]
        k = len(types)
        cnt = np.bincount((a * k + b2) * k + c3, minlength=k * k * k)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({
            "t1": types[nz // (k * k)],
            "t2": types[(nz // k) % k],
            "t3": types[nz % k],
            "n": cnt[nz].astype(np.int64),
        })

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(triples, batch_format="pandas")
            .groupby(["t1", "t2", "t3"])
            .aggregate(Sum("n", alias_name="n")))


SQL_PATH_TRIGRAMS = """
WITH s AS (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE t3 IS NOT NULL GROUP BY 1, 2, 3
"""


# =====================================================================
# RFM customer segmentation (3 global NTILE(4) dimensions)
# =====================================================================

def _ntile_pairs(rfm, metric: str, k: int = 4):
    """(ck, tile) pairs for NTILE(k) OVER (ORDER BY metric DESC, ck)
    over a materialized per-entity Dataset: ONE range sort of the skinny
    (metric, ck) table, a <=1-row-per-block pass A for lengths, then a
    pass B with the <=#blocks offset map broadcast assigns every row its
    global row number IN PLACE - NTILE's uneven tile sizes (first n%k
    tiles get one extra) are reproduced exactly."""
    srt = rfm.sort([metric, "ck"], descending=[True, False]).materialize()

    # block order: recovered by sorting block stats on (metric desc, ck)
    # of each block's first row - the full pair is unique per block
    def pass_a2(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"fm": pa.array([], pa.float64()),
                             "fck": pa.array([], pa.int64()),
                             "nrows": pa.array([], pa.int64())})
        return pa.table({
            "fm": pa.array([float(b[metric][0].as_py())], pa.float64()),
            "fck": pa.array([b["ck"][0].as_py()], pa.int64()),
            "nrows": pa.array([b.num_rows], pa.int64())})

    stats = []
    for b in srt.map_batches(pass_a2, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
        stats.extend(zip(b["fm"].to_pylist(), b["fck"].to_pylist(),
                         b["nrows"].to_pylist()))
    stats.sort(key=lambda r: (-r[0], r[1]))
    n = sum(s[2] for s in stats)
    offsets = {}
    pos = 0
    for fm, fck, nr in stats:
        offsets[(fm, fck)] = pos
        pos += nr
    q, r = n // k, n % k
    off_ref = ray.put(offsets)

    def pass_b(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"ck": pa.array([], pa.int64()),
                             "tile": pa.array([], pa.int64())})
        offs = ray.get(off_ref)
        start = offs[(float(b[metric][0].as_py()), b["ck"][0].as_py())]
        rn = start + np.arange(b.num_rows, dtype=np.int64)
        big = r * (q + 1)
        tile = np.where(rn < big, rn // (q + 1) + 1,
                        r + (rn - big) // max(q, 1) + 1)
        return pa.table({"ck": b["ck"],
                         "tile": pa.array(tile.astype(np.int64))})

    return srt.map_batches(pass_b, batch_format="pyarrow")


def q_rfm_segments(sf_dir: str):
    """RFM segmentation: every customer scored into recency / frequency
    / monetary quartiles, segments counted - the classic lifecycle
    grid (corpus twin: score sources by last-crawl recency, page count,
    and byte volume). Per-customer RFM folds in ONE custkey exchange;
    each NTILE(4) dimension is one range sort of the SKINNY per-customer
    table plus an offset fold (no rank join-back), and the three (ck,
    tile) pair sets re-assemble by riding ONE more custkey exchange as
    tagged columns (Sum-able because exactly one is nonzero per
    dimension). Ties are impossible by construction: the full sort key
    (metric, ck) is unique. Finale: <=64 segment rows."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "ck": b["o_custkey"],
            "dt": b["o_orderdate"].cast(pa.int64()),
            "mon": _cents(b["o_totalprice"]),
        })
        g = t.group_by("ck").aggregate(
            [("dt", "max"), ("mon", "sum"), ([], "count_all")])
        return g.rename_columns(["ck", "last_dt", "mon", "freq"])

    rfm = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("ck")
           .aggregate(Max("last_dt", alias_name="last_dt"),
                      Sum("freq", alias_name="freq"),
                      Sum("mon", alias_name="mon"))
           .materialize())

    def tag(which: int):
        def fn(b: pa.Table) -> pa.Table:
            tiles = b["tile"].to_numpy(zero_copy_only=False)
            z = np.zeros(len(tiles), np.int64)
            cols = [tiles if which == i else z for i in range(3)]
            return pa.table({"ck": b["ck"],
                             "r_q": pa.array(cols[0]),
                             "f_q": pa.array(cols[1]),
                             "m_q": pa.array(cols[2])})
        return fn

    pairs = None
    for i, metric in enumerate(["last_dt", "freq", "mon"]):
        p = _ntile_pairs(rfm.select_columns([metric, "ck"]), metric) \
            .map_batches(tag(i), batch_format="pyarrow")
        pairs = p if pairs is None else pairs.union(p)

    seg = (pairs.groupby("ck")
           .aggregate(Sum("r_q", alias_name="r_q"),
                      Sum("f_q", alias_name="f_q"),
                      Sum("m_q", alias_name="m_q")))

    def seg_counts(b: pa.Table) -> pa.Table:
        g = b.group_by(["r_q", "f_q", "m_q"]).aggregate([([], "count_all")])
        return g.rename_columns(["r_q", "f_q", "m_q", "n"])

    return (seg.map_batches(seg_counts, batch_format="pyarrow")
            .groupby(["r_q", "f_q", "m_q"])
            .aggregate(Sum("n", alias_name="n")))


SQL_RFM_SEGMENTS = """
WITH rfm AS (
  SELECT o_custkey AS ck, MAX(o_orderdate) AS last_dt,
         CAST(COUNT(*) AS BIGINT) AS freq,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS mon
  FROM orders GROUP BY 1
), t AS (
  SELECT ck,
         CAST(NTILE(4) OVER (ORDER BY last_dt DESC, ck) AS BIGINT) AS r_q,
         CAST(NTILE(4) OVER (ORDER BY freq DESC, ck) AS BIGINT) AS f_q,
         CAST(NTILE(4) OVER (ORDER BY mon DESC, ck) AS BIGINT) AS m_q
  FROM rfm
)
SELECT r_q, f_q, m_q, CAST(COUNT(*) AS BIGINT) AS n
FROM t GROUP BY 1, 2, 3
"""


# =====================================================================
# interval-union coverage per user (sweep-free fixed-length union)
# =====================================================================

def q_interval_union(sf_dir: str, length_s: int = 300):
    """Total covered time per user when every event opens a fixed
    5-minute activity window - the union-of-intervals length that
    sessionization, billing, and crawl-politeness audits all need.
    Fixed-length intervals make the union GAP-LOCAL: sorted by start,
    interval i contributes min(next_start - start, L) and the last
    contributes L, so no sweep state crosses rows. Scale plan: skinny
    (user, ts) rows ride ONE user-hash exchange; each partition lexsorts
    once and the per-user fold is a vectorized minimum over shifted
    starts - exact int64 microseconds end to end, no float time."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    length_us = length_s * 1_000_000
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "kp": pa.array(kp),
        })

    def cover(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        u, t = uid[order], ts[order]
        same = u[:-1] == u[1:]
        gap = np.minimum(t[1:] - t[:-1], length_us)
        # per-user: sum of capped gaps for non-last rows + L for the last
        users, idx, counts = np.unique(u, return_index=True,
                                       return_counts=True)
        covered = np.add.reduceat(
            np.concatenate((np.where(same, gap, 0), [0])), idx) \
            + length_us
        return pd.DataFrame({
            "user_id": users.astype(np.int64),
            "covered_us": covered.astype(np.int64),
            "n_events": counts.astype(np.int64),
        })

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(cover, batch_format="pandas")
            .select_columns(["user_id", "covered_us", "n_events"]))


SQL_INTERVAL_UNION = """
WITH s AS (
  SELECT user_id, epoch_us(ts) AS t,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS nxt
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN nxt IS NULL THEN 300000000
                     ELSE LEAST(nxt - t, 300000000) END) AS BIGINT)
         AS covered_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id
"""


# =====================================================================
# event debounce (drop rapid same-user same-type repeats)
# =====================================================================

def q_event_debounce(sf_dir: str, window_s: int = 5):
    """Debounce: an event is NOISE if the same user fired the same type
    within the previous 5 seconds - the double-click / double-submit
    filter every event collector applies before counting (crawl twin:
    collapse rapid refetches of one URL). LAG semantics (distance to the
    previous event of the same (user, type), kept or not) make the
    predicate row-local after ONE user-hash exchange + per-partition
    lexsort by (user, type, ts, event_id); kept/dropped tallies fold as
    <=|types|x2 bincount partials inside each task."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    win_us = window_s * 1_000_000
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "kp": pa.array(kp),
        })

    def tally(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        types, codes = np.unique(g["event_type"].to_numpy(object),
                                 return_inverse=True)
        order = np.lexsort((eid, ts, codes, uid))
        u, c, t = uid[order], codes[order], ts[order]
        same = (u[:-1] == u[1:]) & (c[:-1] == c[1:])
        noise = np.concatenate(
            ([False], same & (t[1:] - t[:-1] <= win_us)))
        k = len(types)
        cnt = np.bincount(c * 2 + noise, minlength=2 * k)
        return pd.DataFrame({
            "event_type": types,
            "kept": cnt[0::2].astype(np.int64),
            "dropped": cnt[1::2].astype(np.int64),
        })

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(tally, batch_format="pandas")
            .groupby("event_type")
            .aggregate(Sum("kept", alias_name="kept"),
                       Sum("dropped", alias_name="dropped")))


SQL_EVENT_DEBOUNCE = """
WITH s AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY user_id, event_type
             ORDER BY epoch_us(ts), event_id) AS gap
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN gap IS NULL OR gap > 5000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       CAST(SUM(CASE WHEN gap IS NOT NULL AND gap <= 5000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS dropped
FROM s GROUP BY event_type
"""


# =====================================================================
# per-source language-mix entropy
# =====================================================================

def q_lang_entropy(sf_dir: str):
    """Shannon entropy of each source's language mix - the diversity
    score a corpus-curation dashboard tracks per domain (a source that
    suddenly goes monolingual or uniform-random flags a crawl or
    labeling bug). Counts fold exactly (per-block Arrow partials through
    a <=|sources x langs| exchange); H = ln n - (SUM c*ln c)/n runs on
    the bounded driver rows with the term sum in SORTED lang order (the
    same convention as token_entropy), 6 dp both sides."""
    ds = _docs_cols(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "lang", "c"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["source", "lang"])
           .aggregate(Sum("c", alias_name="c")))
    df = agg.to_pandas()  # <= |sources| x |langs| rows - bounded fold
    df = df.sort_values(["source", "lang"], ignore_index=True)
    out_s, out_n, out_h = [], [], []
    for src, g in df.groupby("source", sort=True):
        n = int(g["c"].sum())
        s = 0.0
        for c in g["c"]:  # sorted lang order - deterministic float sum
            c = float(int(c))
            s = s + c * math.log(c)
        h = math.log(float(n)) - s / float(n)
        out_s.append(src)
        out_n.append(n)
        out_h.append(np.round(h, 6))
    return pa.table({"source": pa.array(out_s, pa.string()),
                     "n_docs": pa.array(out_n, pa.int64()),
                     "h": pa.array(out_h, pa.float64())})


def _docs_cols(sf_dir: str):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["source", "lang"])


SQL_LANG_ENTROPY = """
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), s AS (
  SELECT source, SUM(c) AS n,
         SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))
             ORDER BY lang) AS clnc
  FROM c GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       ROUND(LN(CAST(n AS DOUBLE)) - clnc / CAST(n AS DOUBLE), 6) AS h
FROM s
"""


# =====================================================================
# nearest-match as-of join (bidirectional, tie -> earlier)
# =====================================================================

def q_asof_nearest(sf_dir: str):
    """Nearest-neighbor temporal join: each purchase matched to the
    user's CLOSEST view in time, either direction, ties to the earlier
    view - the attribution variant when influence can trail a purchase
    (backward-only asof_join's sibling, J6). Per-user ts-duplicate views
    collapse to MAX(value) first on BOTH sides so the match is
    well-defined. Scale plan: one user exchange; per partition the
    candidate set is just searchsorted's two neighbors per purchase
    (vectorized), never a pairwise matrix - the oracle's O(V*P) join is
    exactly what this plan avoids. Distances stay exact int64 us."""
    ds = _t(sf_dir, "events",
            ["event_id", "user_id", "ts", "event_type", "value"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        views = (g[g["event_type"] == "view"]
                 .assign(ts_us=lambda d: d["ts"].astype("int64"))
                 .groupby("ts_us", sort=True)["value"].max().reset_index())
        buys = g[g["event_type"] == "purchase"]
        empty = pd.DataFrame(
            {"event_id": pd.Series([], dtype="int64"),
             "user_id": pd.Series([], dtype="int64"),
             "nearest_view_value": pd.Series([], dtype="float64"),
             "dist_us": pd.Series([], dtype="int64")})
        if len(buys) == 0 or len(views) == 0:
            return empty
        vts = views["ts_us"].to_numpy()
        vval = views["value"].to_numpy()
        bts = buys["ts"].astype("int64").to_numpy()
        right = np.searchsorted(vts, bts, side="left")
        left = right - 1
        d_left = np.where(left >= 0,
                          np.abs(bts - vts[np.clip(left, 0, None)]),
                          np.iinfo(np.int64).max)
        d_right = np.where(right < len(vts),
                           np.abs(vts[np.clip(right, None, len(vts) - 1)]
                                  - bts),
                           np.iinfo(np.int64).max)
        pick_left = d_left <= d_right  # tie -> earlier view
        idx = np.where(pick_left, np.clip(left, 0, None),
                       np.clip(right, None, len(vts) - 1))
        return pd.DataFrame({
            "event_id": buys["event_id"].to_numpy(),
            "user_id": buys["user_id"].to_numpy(),
            "nearest_view_value": vval[idx],
            "dist_us": np.where(pick_left, d_left, d_right)
                         .astype(np.int64),
        })

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


SQL_ASOF_NEAREST = """
WITH v AS (
  SELECT user_id, epoch_us(ts) AS vts, MAX(value) AS value
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
), p AS (
  SELECT event_id, user_id, epoch_us(ts) AS pts
  FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT p.event_id, p.user_id, v.value,
         ABS(p.pts - v.vts) AS d,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY ABS(p.pts - v.vts), v.vts) AS rn
  FROM p JOIN v ON p.user_id = v.user_id
)
SELECT event_id, user_id, value AS nearest_view_value,
       CAST(d AS BIGINT) AS dist_us
FROM j WHERE rn = 1
"""


# =====================================================================
# LOCF gap-fill onto a daily spine (time-series resampling)
# =====================================================================

def q_locf_fill(sf_dir: str):
    """Daily revenue per event type resampled onto the FULL day spine
    with last-observation-carried-forward - the gap-filling every
    time-series join/feature pipeline needs before aligning series
    (missing days otherwise silently vanish from windows). Day sums
    fold exactly (int64 cents) through a <=|types x days| exchange; the
    spine bounds come from ONE tiny Min/Max aggregate; the fill itself
    is a vectorized per-type forward index (np.maximum.accumulate over
    observed-day positions) inside map_groups - rows before a type's
    first observation stay NULL, exactly LAST_VALUE IGNORE NULLS."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])
    day_us = 86_400_000_000

    lim = ds.aggregate(Min("ts"), Max("ts"))
    lo = int(pd.Timestamp(lim["min(ts)"]).value // 1000) // day_us * day_us
    hi = int(pd.Timestamp(lim["max(ts)"]).value // 1000) // day_us * day_us
    spine = np.arange(lo, hi + day_us, day_us, dtype=np.int64)

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": b["event_type"],
            "day": pc.multiply(
                pc.divide(b["ts"].cast(pa.int64()),
                          pa.scalar(day_us, pa.int64())).cast(pa.int64()),
                pa.scalar(day_us, pa.int64())),
            "rev": _cents(b["value"]),
        })
        g = t.group_by(["event_type", "day"]).aggregate([("rev", "sum")])
        return g.rename_columns(["event_type", "day", "rev"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["event_type", "day"])
           .aggregate(Sum("rev", alias_name="rev")))

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day", kind="mergesort")
        days = g["day"].to_numpy()
        revs = g["rev"].to_numpy(np.int64)
        pos = np.searchsorted(days, spine, side="right") - 1
        locf = np.where(pos >= 0,
                        revs[np.clip(pos, 0, None)].astype(np.float64)
                        / 100.0,
                        np.nan)
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]] * len(spine),
            "day": spine,
            "rev_locf": locf,
            "filled": ~np.isin(spine, days),
        })

    out = agg.groupby("event_type").map_groups(fill,
                                               batch_format="pandas")

    def typed(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "day": b["day"].cast(pa.timestamp("us")),
            "rev_locf": b["rev_locf"],
            "filled": b["filled"],
        })

    return out.map_batches(typed, batch_format="pyarrow")


SQL_LOCF_FILL = """
WITH b AS (
  SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
  FROM events
), days AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b
), t AS (
  SELECT DISTINCT event_type FROM events
), a AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS rev
  FROM events GROUP BY 1, 2
), sp AS (
  SELECT t.event_type, d.day, a.rev
  FROM t CROSS JOIN days d
  LEFT JOIN a ON a.event_type = t.event_type AND a.day = d.day
)
SELECT event_type, day,
       CAST(LAST_VALUE(rev IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / 100.0 AS rev_locf,
       (rev IS NULL) AS filled
FROM sp
"""


# =====================================================================
# per-group min-max feature scaling (broadcast stats, no join-back)
# =====================================================================

def q_minmax_scale(sf_dir: str):
    """Per-group min-max normalization of prices to [0, 1] - the feature
    scaling every training pipeline applies before mixing columns of
    different magnitude. Scale plan: group min/max fold in one TINY
    exchange (<=|flags| rows), broadcast as a dict, and every block
    scales IN PLACE - no join-back of group stats to rows, which is the
    shuffle this op classically wastes. Numerator/denominator subtract
    as exact int64 cents BEFORE the single division (identical IEEE
    expression both sides), 6 dp."""
    ds = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_linenumber", "l_returnflag",
             "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({"flag": b["l_returnflag"],
                      "vc": _cents(b["l_extendedprice"])})
        g = t.group_by("flag").aggregate([("vc", "min"), ("vc", "max")])
        return g.rename_columns(["flag", "mn", "mx"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("flag")
           .aggregate(Min("mn", alias_name="mn"),
                      Max("mx", alias_name="mx")))
    stats = {r["flag"]: (int(r["mn"]), int(r["mx"]))
             for _, r in agg.to_pandas().iterrows()}
    stats_ref = ray.put(stats)

    def scale(b: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        flags = b["l_returnflag"].to_pylist()
        vc = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        mn = np.fromiter((st[f][0] for f in flags), np.int64, len(flags))
        mx = np.fromiter((st[f][1] for f in flags), np.int64, len(flags))
        scaled = (vc - mn).astype(np.float64) / (mx - mn).astype(np.float64)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": b["l_linenumber"],
            "flag": b["l_returnflag"],
            "scaled": pa.array(np.round(scaled, 6)),
        })

    return ds.map_batches(scale, batch_format="pyarrow",
                          zero_copy_batch=True)


SQL_MINMAX_SCALE = """
WITH v AS (
  SELECT l_orderkey, l_linenumber, l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS vc
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, flag,
       ROUND(CAST(vc - MIN(vc) OVER (PARTITION BY flag) AS DOUBLE)
             / CAST(MAX(vc) OVER (PARTITION BY flag)
                    - MIN(vc) OVER (PARTITION BY flag) AS DOUBLE),
             6) AS scaled
FROM v
"""


# =====================================================================
# smoothed target encoding (categorical -> prior-blended mean)
# =====================================================================

def q_target_encoding(sf_dir: str, m: int = 10):
    """Smoothed target encoding of p_brand by mean retail price:
    enc = (sum + m*prior) / (n + m) with the GLOBAL mean as prior - the
    leakage-resistant categorical feature (rare brands shrink toward the
    prior instead of memorizing noise). The blend stays EXACT until one
    division: enc = (sum_c*N + m*S_tot) / (N*(n+m)) in python ints
    (== HUGEINT), then /100 for dollars - no float prior ever exists.
    One tiny brand exchange; the global sums ride the same fold."""
    ds = _t(sf_dir, "part", ["p_brand", "p_retailprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({"brand": b["p_brand"],
                      "vc": _cents(b["p_retailprice"])})
        g = t.group_by("brand").aggregate([("vc", "sum"), ([], "count_all")])
        return g.rename_columns(["brand", "s", "n"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("brand")
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")))
    df = agg.to_pandas()  # <= |brands| rows - bounded fold
    df = df.sort_values("brand", ignore_index=True)
    s_tot = int(df["s"].sum())
    n_tot = int(df["n"].sum())
    enc = []
    for _, r in df.iterrows():
        num = int(r["s"]) * n_tot + m * s_tot
        den = n_tot * (int(r["n"]) + m)
        enc.append(np.round(float(num) / float(den) / 100.0, 6))
    return pa.table({"brand": pa.array(df["brand"].to_numpy(object),
                                       pa.string()),
                     "n": pa.array(df["n"].to_numpy(np.int64)),
                     "enc": pa.array(enc, pa.float64())})


SQL_TARGET_ENCODING = """
WITH b AS (
  SELECT p_brand AS brand,
         SUM(CAST(CAST(ROUND(p_retailprice * 100) AS BIGINT) AS HUGEINT))
           AS s,
         CAST(COUNT(*) AS HUGEINT) AS n
  FROM part GROUP BY 1
), g AS (
  SELECT SUM(s) AS s_tot, SUM(n) AS n_tot FROM b
)
SELECT brand, CAST(n AS BIGINT) AS n,
       ROUND(CAST(s * n_tot + 10 * s_tot AS DOUBLE)
             / CAST(n_tot * (n + 10) AS DOUBLE) / 100.0, 6) AS enc
FROM b, g
"""


# =====================================================================
# Cramer's V association strength (chi2_independence's scalar finale)
# =====================================================================

def q_cramers_v(sf_dir: str):
    """Cramer's V between event type and value sign-bucket - the
    normalized [0,1] association strength a feature-selection pass
    ranks categorical pairs by (chi2_independence readies the cells;
    this op finishes the scalar). chi2's numerator terms (n*o - r*c)^2
    stay exact python ints (== HUGEINT) over the bounded contingency
    cells; V = sqrt(chi2 / (n*min(r-1, c-1))) with chi2 = SUM of ONE
    exact-ratio division per cell in sorted cell order, 6 dp."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "et": b["event_type"],
            "hi": pc.greater(b["value"], pa.scalar(100.0)).cast(pa.int64()),
        })
        g = t.group_by(["et", "hi"]).aggregate([([], "count_all")])
        return g.rename_columns(["et", "hi", "o"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["et", "hi"])
           .aggregate(Sum("o", alias_name="o")))
    df = agg.to_pandas()  # <= |types| x 2 cells - bounded fold
    df = df.sort_values(["et", "hi"], ignore_index=True)
    n = int(df["o"].sum())
    row_t = df.groupby("et")["o"].sum().to_dict()
    col_t = df.groupby("hi")["o"].sum().to_dict()
    chi2 = 0.0
    for _, r in df.iterrows():  # sorted cell order - deterministic sum
        rt, ct, o = int(row_t[r["et"]]), int(col_t[r["hi"]]), int(r["o"])
        num = (n * o - rt * ct) ** 2
        chi2 = chi2 + float(num) / float(n * rt * ct)
    k = min(len(row_t), len(col_t))
    v = math.sqrt(chi2 / float(n * (k - 1)))
    return pa.table({"v": pa.array([np.round(v, 6)], pa.float64()),
                     "n": pa.array([n], pa.int64()),
                     "chi2": pa.array([np.round(chi2, 6)], pa.float64())})


SQL_CRAMERS_V = """
WITH c AS (
  SELECT event_type AS et, CAST(value > 100.0 AS BIGINT) AS hi,
         CAST(COUNT(*) AS HUGEINT) AS o
  FROM events GROUP BY 1, 2
), t AS (
  SELECT et, hi, o,
         SUM(o) OVER () AS n,
         SUM(o) OVER (PARTITION BY et) AS rt,
         SUM(o) OVER (PARTITION BY hi) AS ct
  FROM c
), s AS (
  SELECT MAX(n) AS n,
         SUM(CAST((n * o - rt * ct) * (n * o - rt * ct) AS DOUBLE)
             / CAST(n * rt * ct AS DOUBLE) ORDER BY et, hi) AS chi2,
         LEAST(COUNT(DISTINCT et), COUNT(DISTINCT hi)) AS k
  FROM t
)
SELECT ROUND(SQRT(chi2 / CAST(n * (k - 1) AS DOUBLE)), 6) AS v,
       CAST(n AS BIGINT) AS n,
       ROUND(chi2, 6) AS chi2
FROM s
"""


# =====================================================================
# binned statistics (equal-width bins, per-bin target aggregate)
# =====================================================================

def q_binned_stats(sf_dir: str, width_c: int = 1_000_000):
    """Equal-width price bins with per-bin count and mean quantity -
    scipy's binned_statistic / the histogram-with-a-target that every
    feature-vs-response diagnostic plots. Bin ids come from exact cent
    integer division (no float edge ambiguity); counts and quantity
    sums fold as int64 per-block partials through a <=#bins exchange;
    ONE identical IEEE division per bin, 6 dp."""
    ds = _t(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "bin": pc.divide(_cents(b["l_extendedprice"]),
                             pa.scalar(width_c, pa.int64())),
            "qty": pc.round(b["l_quantity"]).cast(pa.int64()),
        })
        g = t.group_by("bin").aggregate([("qty", "sum"), ([], "count_all")])
        return g.rename_columns(["bin", "qty", "n"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bin")
           .aggregate(Sum("qty", alias_name="qty"),
                      Sum("n", alias_name="n")))

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "bin": b["bin"],
            "n": b["n"],
            "avg_qty": pc.round(
                pc.divide(b["qty"].cast(pa.float64()),
                          b["n"].cast(pa.float64())),
                ndigits=6, round_mode="half_towards_infinity"),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_BINNED_STATS = """
WITH v AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) // 1000000 AS bin,
         CAST(ROUND(l_quantity) AS BIGINT) AS qty
  FROM lineitem
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(qty) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS avg_qty
FROM v GROUP BY bin
"""


# =====================================================================
# join cardinality WITHOUT executing the join
# =====================================================================

def q_join_cardinality(sf_dir: str):
    """|orders JOIN lineitem| computed WITHOUT materializing a single
    joined row: per-key counts from BOTH sides ride ONE tagged key-hash
    exchange and the answer is SUM(n_left * n_right) - the planner-side
    cardinality pass that decides broadcast-vs-shuffle and detects
    blowup keys before a join runs. Per-block Arrow partials shrink
    each side to distinct keys first; products and the final sum are
    exact int64 (documented bound SUM(na*nb) < 2^63 - a 10^18-row
    output would be the real problem long before the counter)."""
    orders = _t(sf_dir, "orders", ["o_orderkey"])
    li = _t(sf_dir, "lineitem", ["l_orderkey"])

    from .sizing import fold_parts

    n_parts = fold_parts()

    def side(col, tag):
        def fn(b: pa.Table) -> pa.Table:
            k, c = np.unique(b[col].to_numpy(zero_copy_only=False),
                             return_counts=True)
            k = k.astype(np.int64)
            z = np.zeros(len(k), np.int64)
            kp = (_splitmix64(k).view(np.uint64)
                  % np.uint64(n_parts)).astype(np.int64)
            return pa.table({
                "key": pa.array(k),
                "na": pa.array(c.astype(np.int64) if tag == 0 else z),
                "nb": pa.array(c.astype(np.int64) if tag == 1 else z),
                "kp": pa.array(kp),
            })
        return fn

    # per-partition fold + product fused: the ~|orderkeys|-group Ray
    # hash Aggregate this replaces measured ~4 s vs <1 s at sf0.1
    def fold_prod(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("key", sort=False)[["na", "nb"]].sum()  # int64
        na = t["na"].to_numpy(np.int64)
        nb = t["nb"].to_numpy(np.int64)
        return pd.DataFrame({
            "rows": np.array([int((na * nb).sum())], np.int64),
            "keys": np.array([int(((na > 0) & (nb > 0)).sum())],
                             np.int64)})

    out = (orders.map_batches(side("o_orderkey", 0),
                              batch_format="pyarrow",
                              zero_copy_batch=True)
           .union(li.map_batches(side("l_orderkey", 1),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True))
           .groupby("kp").map_groups(fold_prod, batch_format="pandas")
           .aggregate(Sum("rows"), Sum("keys")))
    return pa.table({
        "join_rows": pa.array([int(out["sum(rows)"])], pa.int64()),
        "matched_keys": pa.array([int(out["sum(keys)"])], pa.int64()),
    })


SQL_JOIN_CARDINALITY = """
WITH a AS (SELECT o_orderkey AS key, COUNT(*) AS na FROM orders GROUP BY 1),
b AS (SELECT l_orderkey AS key, COUNT(*) AS nb FROM lineitem GROUP BY 1)
SELECT CAST(SUM(na * nb) AS BIGINT) AS join_rows,
       CAST(COUNT(*) AS BIGINT) AS matched_keys
FROM a JOIN b USING (key)
"""


# =====================================================================
# dynamic partition pruning (dimension predicate pushed into the read)
# =====================================================================

def q_dynamic_pruning(sf_dir: str):
    """Revenue from one nation's suppliers with the supplier-key set
    PUSHED INTO THE FACT SCAN - dynamic partition pruning, the
    read-prune that makes a 100 TB star join affordable: the dimension
    side resolves first (one tiny read), and the fact read carries an
    `isin` predicate so parquet row groups whose zone maps exclude every
    wanted supplier never leave storage. No join executes at all; the
    probe IS the scan filter. Scale guard: the pushed key set must stay
    broadcast-sized; past _BROADCAST_KEY_LIMIT the op takes a real hash
    semi join instead of a mega-expression (forced-branch equality
    pinned in tests/test_scale_shapes.py), and the dimension keys are
    never pulled to the driver on that branch."""
    import pyarrow.dataset as pads

    from .relational import _BROADCAST_KEY_LIMIT
    from .sizing import join_parts

    sup = _sized_read(os.path.join(sf_dir, "supplier.parquet"),
                      columns=["s_suppkey", "s_nationkey"])
    # anchor nation = the first supplier's nation: nonempty at EVERY
    # scale (a named nation can have zero suppliers at tiny sf)
    min_key = int(sup.aggregate(Min("s_suppkey"))["min(s_suppkey)"])
    nk = int(rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
        filter=pads.field("s_suppkey") == min_key)
        .take_batch(1, batch_format="pyarrow")["s_nationkey"][0].as_py())
    nation_sup = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey"],
        filter=pads.field("s_nationkey") == nk)
    n_sup = nation_sup.count()

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.round(pc.multiply(
            pc.multiply(b["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), b["l_discount"])),
            pa.scalar(10000.0))).cast(pa.int64())
        return pa.table({
            "rev": pa.array([int(pc.sum(rev).as_py() or 0)], pa.int64()),
            "n": pa.array([b.num_rows], pa.int64()),
        })

    if n_sup > _BROADCAST_KEY_LIMIT:
        # oversized dimension: real hash semi join, keys never driver-pulled
        ds = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_extendedprice", "l_discount"]) \
            .join(nation_sup, join_type="inner",
                  num_partitions=join_parts(),
                  on=("l_suppkey",), right_on=("s_suppkey",))
    else:
        keys = np.sort(np.concatenate(
            [b["s_suppkey"].to_numpy(zero_copy_only=False)
             for b in nation_sup.iter_batches(batch_size=65536,
                                              batch_format="pyarrow")]
            or [np.empty(0, np.int64)]).astype(np.int64))
        ds = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
            filter=pads.field("l_suppkey").isin(keys.tolist()))

    out = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .aggregate(Sum("rev"), Sum("n")))
    return pa.table({
        "revenue": pa.array([float(int(out["sum(rev)"] or 0)) / 10000.0],
                            pa.float64()),
        "n_rows": pa.array([int(out["sum(n)"] or 0)], pa.int64()),
        "n_suppliers": pa.array([n_sup], pa.int64()),
    })


SQL_DYNAMIC_PRUNING = """
WITH s AS (
  SELECT s_suppkey FROM supplier
  WHERE s_nationkey = (SELECT s_nationkey FROM supplier
                       WHERE s_suppkey = (SELECT MIN(s_suppkey)
                                          FROM supplier))
)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000)
                     AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_suppliers
FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM s)
"""


# =====================================================================
# stratified k-fold assignment (deterministic, md5-keyed)
# =====================================================================

def q_stratified_kfold(sf_dir: str, k: int = 5):
    """Deterministic stratified k-fold CV assignment: every document
    lands in fold md5(doc_id) % k, and the per-(stratum, fold) counts
    verify the folds stay balanced WITHIN each language stratum - the
    split audit a training pipeline runs before cross-validation
    (md5_split's k-fold sibling). Embarrassingly parallel; the exchange
    carries <= |langs| x k partial rows."""
    import hashlib

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "lang"])

    def fold(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        f = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % k
             for i in ids), dtype=np.int64, count=len(ids))
        g = pa.table({"lang": b["lang"], "fold": pa.array(f)}) \
            .group_by(["lang", "fold"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "fold", "n"])

    return (ds.map_batches(fold, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["lang", "fold"])
            .aggregate(Sum("n", alias_name="n")))


SQL_STRATIFIED_KFOLD = """
SELECT lang,
       CAST(CONCAT('0x', SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 8))
            AS BIGINT) % 5 AS fold,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2
"""


# =====================================================================
# top-k movers between two periods (trending detection)
# =====================================================================

def q_topk_movers(sf_dir: str):
    """Which event types are TRENDING: counts in the first vs second
    half of the time range, absolute delta and the exact-rational ratio
    - the period-over-period mover board every monitoring dashboard
    keeps. The midpoint comes from ONE tiny Min/Max fold; per-(type,
    half) counts ride a <= |types| x 2 exchange as per-block partials;
    deltas and the cross-multiplied ratio stay exact integers until one
    division, 6 dp."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    lim = ds.aggregate(Min("ts"), Max("ts"))
    lo = int(pd.Timestamp(lim["min(ts)"]).value // 1000)
    hi = int(pd.Timestamp(lim["max(ts)"]).value // 1000)
    mid = lo + (hi - lo) // 2

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": b["event_type"],
            "late": pc.greater(b["ts"].cast(pa.int64()),
                               pa.scalar(mid, pa.int64())).cast(pa.int64()),
        })
        g = t.group_by(["event_type", "late"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "late", "n"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["event_type", "late"])
           .aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas()  # <= |types| x 2 rows - bounded fold
    piv = {}
    for _, r in df.iterrows():
        piv.setdefault(r["event_type"], [0, 0])[int(r["late"])] = int(r["n"])
    types = sorted(piv)
    early = [piv[t][0] for t in types]
    late = [piv[t][1] for t in types]
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_early": pa.array(early, pa.int64()),
        "n_late": pa.array(late, pa.int64()),
        "delta": pa.array([b - a for a, b in zip(early, late)], pa.int64()),
        "ratio": pa.array(
            [np.round(float(b) / float(a), 6) if a else None
             for a, b in zip(early, late)], pa.float64()),
    })


SQL_TOPK_MOVERS = """
WITH b AS (
  SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi FROM events
), c AS (
  SELECT event_type,
         CAST(epoch_us(ts) > lo + (hi - lo) // 2 AS BIGINT) AS late,
         COUNT(*) AS n
  FROM events, b GROUP BY 1, 2
)
SELECT event_type,
       CAST(COALESCE(SUM(CASE WHEN late = 0 THEN n END), 0) AS BIGINT)
         AS n_early,
       CAST(COALESCE(SUM(CASE WHEN late = 1 THEN n END), 0) AS BIGINT)
         AS n_late,
       CAST(COALESCE(SUM(CASE WHEN late = 1 THEN n END), 0)
            - COALESCE(SUM(CASE WHEN late = 0 THEN n END), 0) AS BIGINT)
         AS delta,
       ROUND(CAST(COALESCE(SUM(CASE WHEN late = 1 THEN n END), 0) AS DOUBLE)
             / CAST(SUM(CASE WHEN late = 0 THEN n END) AS DOUBLE), 6)
         AS ratio
FROM c GROUP BY event_type
"""


# =====================================================================
# ROC AUC via the rank-sum identity (no threshold sweep)
# =====================================================================

def q_roc_auc(sf_dir: str):
    """ROC AUC of document length as a predictor of lang = 'en' - the
    classifier-eval scalar, computed EXACTLY through the rank-sum
    identity AUC = U / (n1*n2) instead of a threshold sweep (pr_curve
    is the sweep sibling; this is the integral). Shares q_mann_whitney's
    distributed machinery (_rank_sum_u): ranks never materialize, ties
    average exactly via doubled ranks, and AUC is ONE division of exact
    integers, 6 dp."""
    ds = _t(sf_dir, "documents", ["lang", "n_chars"])

    def prep(b: pa.Table) -> pa.Table:
        g = pa.table({
            "vc": b["n_chars"],
            "a": pc.equal(b["lang"], pa.scalar("en")).cast(pa.int64()),
        }).group_by("vc").aggregate([("a", "sum"), ([], "count_all")])
        return pa.table({"vc": g["vc"], "a": g["a_sum"],
                         "n": g["count_all"]})

    u1, n1, n2, _tie3 = _rank_sum_u(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True))
    auc = float(u1) / float(n1 * n2)
    return pa.table({"auc": pa.array([np.round(auc, 6)], pa.float64()),
                     "n_pos": pa.array([n1], pa.int64()),
                     "n_neg": pa.array([n2], pa.int64())})


SQL_ROC_AUC = """
WITH v AS (
  SELECT n_chars AS vc, (lang = 'en') AS a FROM documents
), r AS (
  SELECT a,
         CAST(RANK() OVER (ORDER BY vc) AS HUGEINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY vc) AS HUGEINT) AS t
  FROM v
), s AS (
  SELECT SUM(CASE WHEN a THEN 2 * rk + t - 1 END) AS r1_2,
         CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
         CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS HUGEINT) AS n2
  FROM r
)
SELECT ROUND(CAST((r1_2 - n1 * (n1 + 1)) // 2 AS DOUBLE)
             / CAST(n1 * n2 AS DOUBLE), 6) AS auc,
       CAST(n1 AS BIGINT) AS n_pos,
       CAST(n2 AS BIGINT) AS n_neg
FROM s
"""


# =====================================================================
# pairwise source token-set overlap (Jaccard of vocabularies)
# =====================================================================

def q_source_overlap(sf_dir: str):
    """Jaccard overlap of the DISTINCT-token vocabularies of every
    source pair - the corpus-mix diagnostic that flags mirrored or
    plagiarizing sources before dedup even runs. Scale plan: per-block
    distinct (source, token) partials fold in ONE groupby to the
    bounded presence table (|sources| x |vocab|); the driver packs each
    token's source set into a BITMASK (sources are bounded by
    construction) and every pair's intersection is a popcount fold over
    <=|vocab| masks - the |sources|^2 x |vocab| join never exists.
    Exact integers until one division per pair, 6 dp."""
    ds = _t(sf_dir, "documents", ["source", "text"])

    def prep(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = np.repeat(b["source"].to_numpy(zero_copy_only=False),
                        lens.astype(np.int64))
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        d = pd.DataFrame({"source": src, "tok": flat}).drop_duplicates()
        return pa.table({"source": pa.array(d["source"].to_numpy(object),
                                            pa.string()),
                         "tok": pa.array(d["tok"].to_numpy(object),
                                         pa.string())})

    pres = (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["source", "tok"])
            .aggregate(Count(alias_name="c")))
    df = pres.to_pandas()  # <= |sources| x |vocab| rows - bounded fold
    sources = sorted(df["source"].unique())
    sidx = {s: i for i, s in enumerate(sources)}
    masks: dict[str, int] = {}
    for _, r in df.iterrows():
        masks[r["tok"]] = masks.get(r["tok"], 0) | (1 << sidx[r["source"]])
    sizes = [0] * len(sources)
    for m in masks.values():
        for i in range(len(sources)):
            if m >> i & 1:
                sizes[i] += 1
    out = {"src_a": [], "src_b": [], "inter": [], "uni": [], "jaccard": []}
    for i, a in enumerate(sources):
        for j in range(i + 1, len(sources)):
            inter = sum(1 for m in masks.values()
                        if (m >> i & 1) and (m >> j & 1))
            if inter == 0:
                continue
            uni = sizes[i] + sizes[j] - inter
            out["src_a"].append(a)
            out["src_b"].append(sources[j])
            out["inter"].append(inter)
            out["uni"].append(uni)
            out["jaccard"].append(np.round(float(inter) / float(uni), 6))
    return pa.table({
        "src_a": pa.array(out["src_a"], pa.string()),
        "src_b": pa.array(out["src_b"], pa.string()),
        "inter": pa.array(out["inter"], pa.int64()),
        "uni": pa.array(out["uni"], pa.int64()),
        "jaccard": pa.array(out["jaccard"], pa.float64()),
    })


SQL_SOURCE_OVERLAP = """
WITH p AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
  FROM documents
), sz AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1
), ix AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, inter,
       sa.n + sb.n - inter AS uni,
       ROUND(CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE),
             6) AS jaccard
FROM ix
JOIN sz sa ON sa.source = ix.src_a
JOIN sz sb ON sb.source = ix.src_b
"""


# =====================================================================
# Kendall's tau-b, exact, via the bounded-category formulation
# =====================================================================

_KT_K = 24  # hour-of-day categories


def q_kendall_tau(sf_dir: str):
    """Kendall's tau-b between hour-of-day and event value - the
    tie-robust ordinal association next to spearman_corr (rank-based)
    and corr_stats (linear). The O(n^2) pair space never exists on
    EITHER side: with x bounded (24 hours), concordant-minus-discordant
    reduces to per-(y, x-vector) cumulative counts, and every product
    stays an exact integer until ONE division.

    Scale plan: per-block (value-cent, hour) partials pivot to 24-column
    vector rows and fold in ONE y-key groupby (one row per distinct
    cent); after the range sort each block computes its matrix
    contribution with numpy cumsums ALONE - the global per-x offsets
    enter LINEARLY (via the block's suffix-weight vector W), and the
    tot-dependent discordant term separates into a driver-side
    colsum x Tlt product, so a single <=#blocks driver fold finishes
    exactly (the mann_whitney offset trick, generalized to a 24-vector).
    Products approach n^2: partials accumulate as python ints and ride
    hi/lo int64 pairs. Pinned against an O(n^2) numpy brute force in
    tests (the oracle's ASOF formulation is derived independently)."""
    ds = _t(sf_dir, "events", ["ts", "value"])
    k = _KT_K

    def prep(b: pa.Table) -> pa.Table:
        vc = _cents(b["value"]).to_numpy(zero_copy_only=False)
        hr = pc.hour(b["ts"]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        key = vc * k + hr
        uk, cnt = np.unique(key, return_counts=True)
        y = uk // k
        x = uk % k
        uy, inv = np.unique(y, return_inverse=True)
        m = np.zeros((len(uy), k), np.int64)
        np.add.at(m, (inv, x), cnt)
        cols = {"y": pa.array(uy)}
        for i in range(k):
            cols[f"c{i}"] = pa.array(m[:, i])
        return pa.table(cols)

    from .sizing import fold_parts

    n_parts = fold_parts()

    def add_kp(b: pa.Table) -> pa.Table:
        y = b["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(y).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return b.append_column("kp", pa.array(kp))

    def fold24(g: pd.DataFrame) -> pd.DataFrame:
        # int64 pandas sum - exact; a Ray 24-column hash Aggregate over
        # the ~|distinct cents| groups measured 5x slower here
        out = g.groupby("y", sort=False)[[f"c{i}" for i in range(k)]].sum()
        return out.reset_index()

    rows = (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .map_batches(add_kp, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("kp").map_groups(fold24, batch_format="pandas")
            .sort("y"))

    def block_part(b: pa.Table) -> pa.Table:
        cols = (["first_y", "lt_hi", "lt_lo", "gta_hi", "gta_lo",
                 "tie_hi", "tie_lo"]
                + [f"s{i}" for i in range(k)] + [f"w{i}" for i in range(k)])
        if b.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        m = np.stack([b[f"c{i}"].to_numpy(zero_copy_only=False)
                      for i in range(k)], axis=1).astype(object)
        incl = np.cumsum(m, axis=0)
        pre = incl - m
        plt_excl = np.cumsum(pre, axis=1) - pre       # sum over xa < xb
        lt = int((m * plt_excl).sum())
        aft_excl = np.cumsum(incl, axis=1) - incl
        gta = int((m * aft_excl).sum())
        colsum = m.sum(axis=0)
        rev = colsum[::-1]
        w = (np.cumsum(rev) - rev)[::-1]              # sum over xb > a
        rowsum = m.sum(axis=1)
        tie = int((rowsum * (rowsum - 1) // 2).sum())
        lt_hi, lt_lo = _hi_lo(lt)
        gta_hi, gta_lo = _hi_lo(gta)
        tie_hi, tie_lo = _hi_lo(tie)
        vals = ([int(b["y"][0].as_py()), lt_hi, lt_lo, gta_hi, gta_lo,
                 tie_hi, tie_lo]
                + [int(v) for v in colsum] + [int(v) for v in w])
        return pa.table({c: pa.array([v], pa.int64())
                         for c, v in zip(cols, vals)})

    parts = sorted(
        (dict(zip(b.column_names, row))
         for b in rows.map_batches(block_part, batch_format="pyarrow")
                      .iter_batches(batch_format="pyarrow")
         for row in zip(*(b[c].to_pylist() for c in b.column_names))),
        key=lambda r: r["first_y"])
    off = [0] * k
    lt = gta = tie_y = 0
    for p in parts:
        ow = sum(off[a] * p[f"w{a}"] for a in range(k))
        lt += (p["lt_hi"] << 32) + p["lt_lo"] + ow
        gta += (p["gta_hi"] << 32) + p["gta_lo"] + ow
        tie_y += (p["tie_hi"] << 32) + p["tie_lo"]
        for a in range(k):
            off[a] += p[f"s{a}"]
    tot = off
    tlt = 0
    gtb = 0
    for b_ in range(k):
        gtb += tot[b_] * tlt
        tlt += tot[b_]
    num = lt - (gtb - gta)                 # C - D
    n = sum(tot)
    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in tot)
    n2 = tie_y
    tau = float(num) / math.sqrt(float(n0 - n1) * float(n0 - n2))
    return pa.table({"tau": pa.array([np.round(tau, 6)], pa.float64()),
                     "n": pa.array([n], pa.int64()),
                     "cd": pa.array([num], pa.int64())})


SQL_KENDALL_TAU = """
WITH v AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS y,
         CAST(HOUR(ts) AS BIGINT) AS x
  FROM events
), cells AS (
  SELECT y, x, CAST(COUNT(*) AS HUGEINT) AS n FROM v GROUP BY 1, 2
), cum AS (
  SELECT y, x, n,
         SUM(n) OVER (PARTITION BY x ORDER BY y) AS cle
  FROM cells
), tot AS (
  SELECT x, CAST(SUM(n) AS HUGEINT) AS t FROM cells GROUP BY 1
), xp AS (
  SELECT a.x AS xa, b.x AS xb FROM tot a JOIN tot b ON a.x < b.x
), expanded AS (
  SELECT c.y, c.x, c.n, xp.xa FROM cells c JOIN xp ON xp.xb = c.x
), lt AS (
  SELECT SUM(e.n * COALESCE(a.cle, 0)) AS lt
  FROM expanded e ASOF LEFT JOIN cum a
    ON a.x = e.xa AND a.y < e.y
), gt AS (
  SELECT SUM(e.n * (t.t - COALESCE(a.cle, 0))) AS gt
  FROM expanded e
  JOIN tot t ON t.x = e.xa
  ASOF LEFT JOIN cum a ON a.x = e.xa AND a.y <= e.y
), tn AS (
  SELECT CAST(SUM(rs * (rs - 1) // 2) AS HUGEINT) AS n2,
         CAST(SUM(rs) AS HUGEINT) AS n
  FROM (SELECT SUM(n) AS rs FROM cells GROUP BY y)
), tx AS (
  SELECT CAST(SUM(t * (t - 1) // 2) AS HUGEINT) AS n1 FROM tot
)
SELECT ROUND(CAST(lt.lt - gt.gt AS DOUBLE)
             / SQRT(CAST(tn.n * (tn.n - 1) // 2 - tx.n1 AS DOUBLE)
                    * CAST(tn.n * (tn.n - 1) // 2 - tn.n2 AS DOUBLE)),
             6) AS tau,
       CAST(tn.n AS BIGINT) AS n,
       CAST(lt.lt - gt.gt AS BIGINT) AS cd
FROM lt, gt, tn, tx
"""


# =====================================================================
# clamped-at-zero running balance (Lindley recursion, vectorized)
# =====================================================================

def q_capped_running_total(sf_dir: str):
    """Per-user running balance that cannot go below zero - the
    inventory / wallet / token-bucket scan b_t = max(0, b_{t-1} + d_t).
    The recursion LOOKS inherently sequential, but the Lindley identity
    b_t = cs_t - min(0, min_{j<=t} cs_j) (cs = plain running sum) makes
    it two associative scans - so the engine runs cumsum +
    minimum.accumulate per user partition (fully vectorized, exact
    int64 cents) and the oracle runs the SAME identity as two stacked
    window functions, no recursive CTE. One user-hash exchange;
    purchases credit, clicks debit."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type",
                               "value"])

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array(["purchase", "click"]))
        t = b.filter(keep)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        vc = _cents(t["value"]).to_numpy(zero_copy_only=False)
        sign = np.where(
            pc.equal(t["event_type"], pa.scalar("purchase"))
              .to_numpy(zero_copy_only=False), vc, -vc)
        return pa.table({
            "user_id": t["user_id"],
            "ts_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"],
            "d": pa.array(sign.astype(np.int64)),
            "kp": pa.array(kp),
        })

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        d = g["d"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, uid))
        u, dd, ee = uid[order], d[order], eid[order]
        n = len(u)
        cs = np.cumsum(dd)
        # rebase the global cumsum to per-user segments (vectorized):
        # base of segment k = cs just before its first row
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        base_vals = cs[starts] - dd[starts]
        seg_len = np.diff(np.concatenate((starts, [n])))
        cs = cs - np.repeat(base_vals, seg_len)
        # segmented running min (the only per-segment pass; segments =
        # users in this partition, each a contiguous slice)
        bal = np.empty(n, np.int64)
        for s, ln in zip(starts, seg_len):
            seg = cs[s:s + ln]
            bal[s:s + ln] = seg - np.minimum(
                0, np.minimum.accumulate(seg))
        return pd.DataFrame({
            "user_id": u.astype(np.int64),
            "event_id": ee.astype(np.int64),
            "balance": (bal.astype(np.float64) / 100.0).round(6),
        })

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(scan, batch_format="pandas")
            .select_columns(["user_id", "event_id", "balance"]))


SQL_CAPPED_RUNNING_TOTAL = """
WITH v AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value * 100) AS BIGINT)
              ELSE -CAST(ROUND(value * 100) AS BIGINT) END AS d
  FROM events WHERE event_type IN ('purchase', 'click')
), cs AS (
  SELECT user_id, event_id, t,
         SUM(d) OVER (PARTITION BY user_id ORDER BY t, event_id) AS cs
  FROM v
)
SELECT user_id, event_id,
       ROUND(CAST(cs - LEAST(0, MIN(cs) OVER (
                 PARTITION BY user_id ORDER BY t, event_id
             )) AS DOUBLE) / 100.0, 6) AS balance
FROM cs
"""


# =====================================================================
# quantile mapping (score -> percentile within a reference distribution)
# =====================================================================

def q_quantile_map(sf_dir: str):
    """Map every purchase value to its percentile within the VIEW value
    distribution - quantile mapping, the domain-adaptation /
    score-calibration transform (its corpus twin: normalize one
    source's quality scores against a reference source). The reference
    CDF folds from bounded unique-cent counts (zero shuffle, the cent
    domain is finite) and broadcasts as two sorted arrays; every
    purchase block maps IN PLACE with one searchsorted - no join, no
    row ever leaves its block. pct = count(view <= v)/n_views as ONE
    exact-integer division per row, 6 dp."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])

    def ref_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], pa.scalar("view")))
        v, c = np.unique(_cents(t["value"]).to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"vc": pa.array(v.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    fold: dict[int, int] = {}
    for b in ds.map_batches(ref_partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .iter_batches(batch_format="pyarrow"):
        for v, c in zip(b["vc"].to_pylist(), b["n"].to_pylist()):
            fold[v] = fold.get(v, 0) + c
    keys = np.array(sorted(fold), dtype=np.int64)
    cum = np.cumsum(np.array([fold[v] for v in keys], dtype=np.int64))
    n_view = int(cum[-1]) if len(cum) else 0
    ref = ray.put((keys, cum))

    def map_pct(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], pa.scalar("purchase")))
        k, c = ray.get(ref)
        vc = _cents(t["value"]).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(k, vc, side="right") - 1
        le = np.where(idx >= 0, c[np.clip(idx, 0, None)], 0)
        return pa.table({
            "event_id": t["event_id"],
            "pct": pa.array(np.round(
                le.astype(np.float64) / float(n_view), 6)),
        })

    return ds.map_batches(map_pct, batch_format="pyarrow",
                          zero_copy_batch=True)


SQL_QUANTILE_MAP = """
WITH ref AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS vc, COUNT(*) AS n
  FROM events WHERE event_type = 'view' GROUP BY 1
), cum AS (
  SELECT vc, CAST(SUM(n) OVER (ORDER BY vc) AS HUGEINT) AS cle FROM ref
), nv AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM events
  WHERE event_type = 'view'
), p AS (
  SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id,
       ROUND(CAST(COALESCE(c.cle, 0) AS DOUBLE) / CAST(nv.n AS DOUBLE),
             6) AS pct
FROM p ASOF LEFT JOIN cum c ON c.vc <= p.vc, nv
"""


# =====================================================================
# winsorized mean per group (exact bounded-domain cuts)
# =====================================================================

def q_winsorized_mean(sf_dir: str):
    """Per-flag winsorized mean of quantities: values below the exact
    P10 (PERCENTILE_DISC) clamp up to it, above the P90 clamp down -
    the outlier-robust mean a quality dashboard prefers to trimming
    (rows keep their weight). Quantity's bounded domain makes the cuts
    a zero-shuffle per-(flag, value) bincount fold; the clamped sum is
    then one broadcast-cuts map + a <=|flags| exchange - exact int64
    until ONE division, 6 dp."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def hist(b: pa.Table) -> pa.Table:
        t = pa.table({"flag": b["l_returnflag"],
                      "q": pc.round(b["l_quantity"]).cast(pa.int64())})
        g = t.group_by(["flag", "q"]).aggregate([([], "count_all")])
        return g.rename_columns(["flag", "q", "n"])

    agg = (ds.map_batches(hist, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["flag", "q"])
           .aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas()  # <= |flags| x |domain| rows - bounded fold
    cuts: dict[str, tuple[int, int]] = {}
    for flag, g in df.groupby("flag"):
        g = g.sort_values("q")
        q = g["q"].to_numpy(np.int64)
        c = np.cumsum(g["n"].to_numpy(np.int64))
        n = int(c[-1])
        # PERCENTILE_DISC(f): first value with cum >= ceil(f * n)
        lo = int(q[np.searchsorted(c, -(-n // 10))])
        hi = int(q[np.searchsorted(c, -(-(9 * n) // 10))])
        cuts[flag] = (lo, hi)
    cuts_ref = ray.put(cuts)

    def clamp(b: pa.Table) -> pa.Table:
        cu = ray.get(cuts_ref)
        flags = b["l_returnflag"].to_pylist()
        q = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        lo = np.fromiter((cu[f][0] for f in flags), np.int64, len(flags))
        hi = np.fromiter((cu[f][1] for f in flags), np.int64, len(flags))
        w = np.clip(q, lo, hi)
        g = pa.table({"flag": b["l_returnflag"],
                      "w": pa.array(w.astype(np.int64))}) \
            .group_by("flag").aggregate([("w", "sum"), ([], "count_all")])
        return g.rename_columns(["flag", "w", "n"])

    out = (ds.map_batches(clamp, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("flag")
           .aggregate(Sum("w", alias_name="w"), Sum("n", alias_name="n")))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({
            "flag": b["flag"],
            "n": b["n"],
            "wmean": pc.round(
                pc.divide(b["w"].cast(pa.float64()),
                          b["n"].cast(pa.float64())),
                ndigits=6, round_mode="half_towards_infinity"),
        })

    return out.map_batches(fin, batch_format="pyarrow")


SQL_WINSORIZED_MEAN = """
WITH v AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_quantity) AS BIGINT) AS q
  FROM lineitem
), c AS (
  SELECT flag,
         CAST(quantile_disc(q, 0.1) AS BIGINT) AS lo,
         CAST(quantile_disc(q, 0.9) AS BIGINT) AS hi
  FROM v GROUP BY 1
)
SELECT v.flag, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(LEAST(GREATEST(v.q, c.lo), c.hi)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS wmean
FROM v JOIN c ON c.flag = v.flag
GROUP BY v.flag
"""


# =====================================================================
# Cohen's kappa (chance-corrected lang-id agreement)
# =====================================================================

def q_cohens_kappa(sf_dir: str):
    """Cohen's kappa between the labeled language and the lang_id
    prediction - the chance-corrected agreement scalar on top of
    lang_confusion's matrix (accuracy alone flatters a skewed label
    mix). kappa = (n*SUM(diag) - SUM(row_i*col_i)) /
    (n^2 - SUM(row_i*col_i)) stays exact python ints (== HUGEINT) over
    the bounded confusion cells; ONE division, 6 dp. Same one
    |langs|^2-cell exchange as lang_confusion; the predictor runs once
    per block."""
    from ..functions.textstats import lang_id

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["lang", "text"])

    def fn(b: pa.Table) -> pa.Table:
        g = pa.table({
            "lang": b["lang"],
            "pred": pa.array(lang_id(b["text"].to_pylist()),
                             type=pa.string()),
        }).group_by(["lang", "pred"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "pred", "n"])

    agg = (ds.map_batches(fn, batch_format="pyarrow")
           .groupby(["lang", "pred"])
           .aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas()  # <= |langs|^2 cells - bounded fold
    n = int(df["n"].sum())
    diag = int(df[df["lang"] == df["pred"]]["n"].sum())
    rows = df.groupby("lang")["n"].sum().to_dict()
    cols = df.groupby("pred")["n"].sum().to_dict()
    labels = sorted(set(rows) | set(cols))
    rc = sum(int(rows.get(l, 0)) * int(cols.get(l, 0)) for l in labels)
    kappa = float(n * diag - rc) / float(n * n - rc)
    return pa.table({
        "kappa": pa.array([np.round(kappa, 6)], pa.float64()),
        "n": pa.array([n], pa.int64()),
        "agree": pa.array([diag], pa.int64())})


def _cohens_kappa_oracle_sql() -> str:
    """kappa over the SAME generated confusion expression as
    lang_confusion (one stopword table, zero drift)."""
    from ..functions.textstats import _STOPWORDS

    langs = sorted(_STOPWORDS)
    score_cols = []
    for lang in langs:
        terms = " + ".join(
            f"CASE WHEN regexp_matches(lower(text), '(^|\\s){w}(\\s|$)') "
            f"THEN 1 ELSE 0 END"
            for w in sorted(_STOPWORDS[lang])
        )
        score_cols.append(f"({terms}) AS s_{lang}")
    greatest = "GREATEST(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = [f"WHEN {greatest} = 0 THEN 'und'"]
    case += [f"WHEN s_{lang} = {greatest} THEN '{lang}'" for lang in langs]
    return f"""
WITH s AS (SELECT lang, {', '.join(score_cols)} FROM documents),
c AS (SELECT lang, CASE {' '.join(case)} END AS pred,
             CAST(COUNT(*) AS HUGEINT) AS n
      FROM s GROUP BY 1, 2),
m AS (SELECT CAST(SUM(n) AS HUGEINT) AS n,
             CAST(SUM(CASE WHEN lang = pred THEN n ELSE 0 END)
                  AS HUGEINT) AS diag
      FROM c),
r AS (SELECT lang AS l, SUM(n) AS rn FROM c GROUP BY 1),
k AS (SELECT pred AS l, SUM(n) AS cn FROM c GROUP BY 1),
rc AS (SELECT CAST(COALESCE(SUM(r.rn * k.cn), 0) AS HUGEINT) AS rc
       FROM r JOIN k ON r.l = k.l)
SELECT ROUND(CAST(m.n * m.diag - rc.rc AS DOUBLE)
             / CAST(m.n * m.n - rc.rc AS DOUBLE), 6) AS kappa,
       CAST(m.n AS BIGINT) AS n,
       CAST(m.diag AS BIGINT) AS agree
FROM m, rc
"""


SQL_COHENS_KAPPA = _cohens_kappa_oracle_sql()


# =====================================================================
# nDCG@k (graded-relevance ranking quality)
# =====================================================================

def q_ndcg(sf_dir: str, k: int = 20):
    """nDCG@20 of a length-ranked document list against graded language
    relevance (en=3, de=1, else 0) - the ranking-quality scalar that
    completes the eval family next to pr_curve (sweep) and roc_auc
    (integral). Scale plan: the top-k by (n_chars DESC, doc_id) folds
    as per-block k-candidates -> driver merge (bounded k, no global
    sort), and the IDEAL DCG needs only the per-grade COUNTS (grades
    are bounded), not a second ranking. Ties are impossible by
    construction (doc_id breaks them). Gains 2^rel - 1 are exact ints;
    the log2 discounts are the identical expression both sides, 6 dp."""
    ds = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def cand(b: pa.Table) -> pa.Table:
        nc = b["n_chars"].to_numpy(zero_copy_only=False)
        di = b["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((di, -nc))[:k]
        t = b.take(pa.array(order))
        rel = np.where(
            pc.equal(t["lang"], pa.scalar("en")).to_numpy(
                zero_copy_only=False), 3,
            np.where(pc.equal(t["lang"], pa.scalar("de")).to_numpy(
                zero_copy_only=False), 1, 0))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": t["n_chars"],
            "rel": pa.array(rel.astype(np.int64)),
        })

    def grade_counts(b: pa.Table) -> pa.Table:
        g = pa.table({"lang": b["lang"]}).group_by("lang") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"])

    # per-grade counts: a tiny exchange (grades bounded by |langs|)
    gc = (ds.map_batches(grade_counts, batch_format="pyarrow",
                         zero_copy_batch=True)
          .groupby("lang").aggregate(Sum("n", alias_name="n"))).to_pandas()
    n_by_grade = {3: 0, 1: 0}
    for _, r in gc.iterrows():
        if r["lang"] == "en":
            n_by_grade[3] += int(r["n"])
        elif r["lang"] == "de":
            n_by_grade[1] += int(r["n"])

    # top-k fold: <= k rows per block reach the driver
    cands = []
    for b in ds.map_batches(cand, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .iter_batches(batch_format="pyarrow"):
        cands.extend(zip(b["n_chars"].to_pylist(), b["doc_id"].to_pylist(),
                         b["rel"].to_pylist()))
    cands.sort(key=lambda r: (-r[0], r[1]))
    top = cands[:k]
    dcg = 0.0
    for i, (_nc, _di, rel) in enumerate(top):  # fixed ascending-i order
        dcg = dcg + float(2 ** rel - 1) / math.log2(float(i + 2))
    ideal = [3] * min(k, n_by_grade[3])
    ideal += [1] * min(k - len(ideal), n_by_grade[1])
    idcg = 0.0
    for i, rel in enumerate(ideal):
        idcg = idcg + float(2 ** rel - 1) / math.log2(float(i + 2))
    return pa.table({
        "ndcg": pa.array([np.round(dcg / idcg, 6)], pa.float64()),
        "k": pa.array([k], pa.int64()),
        "dcg": pa.array([np.round(dcg, 6)], pa.float64())})


SQL_NDCG = """
WITH r AS (
  SELECT CASE WHEN lang = 'en' THEN 3
              WHEN lang = 'de' THEN 1 ELSE 0 END AS rel,
         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS pos
  FROM documents
), d AS (
  SELECT SUM(CAST(POWER(2, rel) - 1 AS DOUBLE)
             / LOG2(CAST(pos + 1 AS DOUBLE)) ORDER BY pos) AS dcg
  FROM r WHERE pos <= 20
), i AS (
  SELECT ROW_NUMBER() OVER (ORDER BY rel DESC) AS pos, rel FROM r
), id AS (
  SELECT SUM(CAST(POWER(2, rel) - 1 AS DOUBLE)
             / LOG2(CAST(pos + 1 AS DOUBLE)) ORDER BY pos) AS idcg
  FROM i WHERE pos <= 20
)
SELECT ROUND(d.dcg / id.idcg, 6) AS ndcg,
       CAST(20 AS BIGINT) AS k,
       ROUND(d.dcg, 6) AS dcg
FROM d, id
"""


# =====================================================================
# Kaplan-Meier survival curve (time to conversion, right-censored)
# =====================================================================

def q_kaplan_meier(sf_dir: str):
    """Kaplan-Meier time-to-conversion curve: for every signed-up user,
    days until the FIRST at-or-after purchase; users who never convert
    are right-CENSORED at their last observed event - the survival
    estimator that makes conversion velocity honest (conversion_lag's
    histogram silently drops the censored majority). Scale plan: all
    three per-user stamps (first signup, first qualifying purchase, last
    activity) derive in ONE user-hash exchange; day-bucketed (event,
    censor) counts fold to <=#days rows, and the curve is a driver-side
    ascending scan over that bounded table. n_risk and d stay exact
    ints; S(t) = exp(SUM ln(1 - d/n)) with the IDENTICAL ascending
    expression both sides (never the naive product), 6 dp."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    day_us = 86_400_000_000

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "is_signup": pc.equal(b["event_type"], pa.scalar("signup")),
            "is_purchase": pc.equal(b["event_type"],
                                    pa.scalar("purchase")),
            "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s0 = (g[g["is_signup"]].groupby("user_id")["ts_us"].min()
              .rename("t0"))
        if not len(s0):
            return pd.DataFrame({"day": pd.Series(dtype=np.int64),
                                 "d": pd.Series(dtype=np.int64),
                                 "c": pd.Series(dtype=np.int64)})
        p = g[g["is_purchase"]][["user_id", "ts_us"]] \
            .join(s0, on="user_id", how="inner")
        p = p[p["ts_us"] >= p["t0"]]
        tp = p.groupby("user_id")["ts_us"].min()
        tmax = g.groupby("user_id")["ts_us"].max()
        day = pd.Series(np.where(
            s0.index.isin(tp.index),
            (tp.reindex(s0.index).fillna(0).astype(np.int64)
             - s0) // day_us,
            (tmax.reindex(s0.index) - s0) // day_us), index=s0.index)
        ev = s0.index.isin(tp.index)
        out = pd.DataFrame({"day": day.to_numpy(np.int64), "ev": ev})
        gg = out.groupby(["day", "ev"]).size().reset_index(name="n")
        return pd.DataFrame({
            "day": gg["day"].to_numpy(np.int64),
            "d": np.where(gg["ev"], gg["n"], 0).astype(np.int64),
            "c": np.where(gg["ev"], 0, gg["n"]).astype(np.int64),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .groupby("day")
           .aggregate(Sum("d", alias_name="d"), Sum("c", alias_name="c")))
    df = agg.to_pandas()  # <= #days rows - bounded fold
    df = df.sort_values("day", ignore_index=True)
    n_total = int((df["d"] + df["c"]).sum())
    rows = {"day": [], "n_risk": [], "d": [], "s": []}
    seen = 0
    acc = 0.0
    for _, r in df.iterrows():
        d, c = int(r["d"]), int(r["c"])
        n_risk = n_total - seen
        # the terminal total-death step (d == n_risk) would be ln(0):
        # S hits 0 with nobody left at risk - both sides drop that row
        # (it can only be the last event row)
        if d > 0 and d < n_risk:
            acc = acc + math.log(1.0 - float(d) / float(n_risk))
            rows["day"].append(int(r["day"]))
            rows["n_risk"].append(n_risk)
            rows["d"].append(d)
            rows["s"].append(np.round(math.exp(acc), 6))
        seen += d + c
    return pa.table({"day": pa.array(rows["day"], pa.int64()),
                     "n_risk": pa.array(rows["n_risk"], pa.int64()),
                     "d": pa.array(rows["d"], pa.int64()),
                     "s": pa.array(rows["s"], pa.float64())})


SQL_KAPLAN_MEIER = """
WITH s0 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY 1
), pp AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS tp
  FROM events e JOIN s0 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s0.t0
  GROUP BY 1
), tm AS (
  SELECT user_id, MAX(epoch_us(ts)) AS tmax FROM events GROUP BY 1
), u AS (
  SELECT s0.user_id,
         CASE WHEN pp.tp IS NOT NULL THEN (pp.tp - s0.t0) // 86400000000
              ELSE (tm.tmax - s0.t0) // 86400000000 END AS day,
         (pp.tp IS NOT NULL) AS ev
  FROM s0 LEFT JOIN pp USING (user_id) JOIN tm USING (user_id)
), g AS (
  SELECT day, CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c
  FROM u GROUP BY 1
), k AS (
  SELECT day, d,
         CAST((SELECT COUNT(*) FROM u) AS BIGINT)
           - CAST(COALESCE(SUM(d + c) OVER (
                 ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
  FROM g
)
SELECT day, n_risk, d,
       ROUND(EXP(SUM(LN(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)))
                 OVER (ORDER BY day)), 6) AS s
FROM k WHERE d > 0 AND d < n_risk
"""


# =====================================================================
# burstiness: index of dispersion of daily event counts per type
# =====================================================================

def q_burstiness(sf_dir: str):
    """Index of dispersion (variance/mean, the Fano factor) of DAILY
    event counts per type - the burst detector: ~1 for Poisson-like
    arrivals, >>1 for bursty ones (crawl twin: which hosts publish in
    bursts vs a steady drip, which sets their revisit cadence). Daily
    counts fold exactly through a <=|types| x #days exchange; variance
    comes from the integer identity n*S2 - S1^2 (no float
    cancellation) over the bounded per-type day vectors; ONE identical
    IEEE expression per type, 6 dp. Days with zero events count as
    zeros via the observed [min, max] day span - both sides use the
    same span arithmetic."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])
    day_us = 86_400_000_000

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": b["event_type"],
            "day": pc.multiply(
                pc.divide(b["ts"].cast(pa.int64()),
                          pa.scalar(day_us, pa.int64())).cast(pa.int64()),
                pa.scalar(day_us, pa.int64())),
        })
        g = t.group_by(["event_type", "day"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "day", "n"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["event_type", "day"])
           .aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas()  # <= |types| x #days rows - bounded fold
    lo = int(df["day"].min())
    hi = int(df["day"].max())
    span = (hi - lo) // day_us + 1   # identical span on both sides
    out = {"event_type": [], "n_days": [], "dispersion": []}
    for et, g in df.groupby("event_type", sort=True):
        c = g["n"].to_numpy(np.int64)
        s1 = int(c.sum())
        s2 = int((c.astype(object) * c.astype(object)).sum())
        n = span                      # zero days included
        var_num = n * s2 - s1 * s1    # = n^2 * population variance
        disp = float(var_num) / (float(n) * float(s1))
        out["event_type"].append(et)
        out["n_days"].append(n)
        out["dispersion"].append(np.round(disp, 6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_days": pa.array(out["n_days"], pa.int64()),
        "dispersion": pa.array(out["dispersion"], pa.float64())})


SQL_BURSTINESS = """
WITH d AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day
  FROM events
), c AS (
  SELECT event_type, day, CAST(COUNT(*) AS HUGEINT) AS n
  FROM d GROUP BY 1, 2
), span AS (
  SELECT MAX(day) - MIN(day) + 1 AS n_days FROM d
), m AS (
  SELECT event_type, SUM(n) AS s1, SUM(n * n) AS s2 FROM c GROUP BY 1
)
SELECT event_type, CAST(span.n_days AS BIGINT) AS n_days,
       ROUND(CAST(span.n_days * s2 - s1 * s1 AS DOUBLE)
             / (CAST(span.n_days AS DOUBLE) * CAST(s1 AS DOUBLE)),
             6) AS dispersion
FROM m, span
"""


# =====================================================================
# lag-1 autocorrelation of daily revenue (ACF diagnostic)
# =====================================================================

def q_acf_lag1(sf_dir: str):
    """Lag-1 autocorrelation of daily order revenue - the ACF
    diagnostic that decides whether yesterday predicts today (momentum)
    or the series is white noise; the first number a forecasting
    pipeline checks before fitting anything. Day sums fold exactly
    (int64 cents) through a <=#days exchange; r1 is Pearson over the
    CONSECUTIVE-day pairs (gaps excluded on both sides by the d+1 join
    rule), from exact integer moment sums with ONE identical IEEE
    expression, 6 dp."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    day_us = 86_400_000_000

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "day": pc.divide(b["o_orderdate"].cast(pa.int64()),
                             pa.scalar(day_us, pa.int64())).cast(pa.int64()),
            "rev": _cents(b["o_totalprice"]),
        })
        g = t.group_by("day").aggregate([("rev", "sum")])
        return g.rename_columns(["day", "rev"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("day")
           .aggregate(Sum("rev", alias_name="rev")))
    df = agg.to_pandas()  # <= #days rows - bounded fold
    df = df.sort_values("day", ignore_index=True)
    day = df["day"].to_numpy(np.int64)
    rev = df["rev"].to_numpy(np.int64).astype(object)
    consec = day[1:] - day[:-1] == 1
    x, y = rev[:-1][consec], rev[1:][consec]
    n = int(len(x))
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    sxy = int((x * y).sum())
    num = n * sxy - sx * sy
    den = math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    return pa.table({
        "r1": pa.array([np.round(float(num) / den, 6)], pa.float64()),
        "n_pairs": pa.array([n], pa.int64())})


SQL_ACF_LAG1 = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), p AS (
  SELECT CAST(a.rev AS HUGEINT) AS x, CAST(b.rev AS HUGEINT) AS y
  FROM d a JOIN d b ON b.day = a.day + 1
), m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM p
)
SELECT ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r1,
       CAST(n AS BIGINT) AS n_pairs
FROM m
"""


# =====================================================================
# Jarque-Bera normality test per group
# =====================================================================

def q_jarque_bera(sf_dir: str):
    """Jarque-Bera normality statistic JB = n/6*(g1^2 + g2^2/4) per line
    status over quantities, with the chi^2(2) 95% reject verdict - the
    omnibus check a drift monitor runs before trusting any
    mean/variance-based alert (Jarque & Bera 1980). Reuses the
    skew_kurtosis discipline: int64 raw-moment partials S1..S4 per block
    (quantity <= 50 keeps x^4 <= 6.25e6), exact integer central-moment
    identities in python ints on the <=|status| driver rows, IDENTICAL
    IEEE finale both sides, 6 dp; the reject flag compares the ROUNDED
    JB so a last-ulp wobble can never flip it."""
    ds = _t(sf_dir, "lineitem", ["l_linestatus", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        q = pc.round(b["l_quantity"]).cast(pa.int64())
        q2 = pc.multiply(q, q)
        t = pa.table({
            "status": b["l_linestatus"], "s1": q, "s2": q2,
            "s3": pc.multiply(q2, q), "s4": pc.multiply(q2, q2),
        })
        g = t.group_by("status").aggregate(
            [("s1", "sum"), ("s2", "sum"), ("s3", "sum"), ("s4", "sum"),
             ([], "count_all")])
        return g.rename_columns(["status", "s1", "s2", "s3", "s4", "n"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("status")
           .aggregate(Sum("s1", alias_name="s1"), Sum("s2", alias_name="s2"),
                      Sum("s3", alias_name="s3"), Sum("s4", alias_name="s4"),
                      Sum("n", alias_name="n")))
    df = agg.to_pandas()  # <= |status| rows - bounded fold
    df = df.sort_values("status", ignore_index=True)
    rows = {"status": [], "n": [], "jb": [], "reject": []}
    for _, r in df.iterrows():
        n, s1, s2, s3, s4 = (int(r["n"]), int(r["s1"]), int(r["s2"]),
                             int(r["s3"]), int(r["s4"]))
        m2i = n * s2 - s1 * s1
        m3i = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        m4i = (n ** 3 * s4 - 4 * n * n * s1 * s3
               + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
        nf = float(n)
        m2 = float(m2i) / (nf * nf)
        m3 = float(m3i) / (nf * nf * nf)
        m4 = float(m4i) / (nf * nf * nf * nf)
        g1 = m3 / (m2 * math.sqrt(m2))
        g2 = m4 / (m2 * m2) - 3.0
        jb = np.round((nf / 6.0) * (g1 * g1 + (g2 * g2) / 4.0), 6)
        rows["status"].append(r["status"])
        rows["n"].append(n)
        rows["jb"].append(jb)
        rows["reject"].append(1 if jb > 5.991465 else 0)
    return pa.table({"status": pa.array(rows["status"], pa.string()),
                     "n": pa.array(rows["n"], pa.int64()),
                     "jb": pa.array(rows["jb"], pa.float64()),
                     "reject": pa.array(rows["reject"], pa.int64())})


SQL_JARQUE_BERA = """
WITH m AS (
  SELECT l_linestatus AS status,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT)) AS s1,
         SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(l_quantity) AS BIGINT)) AS s2,
         SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(l_quantity) AS BIGINT)
             * CAST(ROUND(l_quantity) AS BIGINT)) AS s3,
         SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT)
             * CAST(ROUND(l_quantity) AS BIGINT)
             * CAST(ROUND(l_quantity) AS BIGINT)
             * CAST(ROUND(l_quantity) AS BIGINT)) AS s4
  FROM lineitem GROUP BY 1
), c AS (
  SELECT status, n,
         CAST(n * s2 - s1 * s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS m2,
         CAST(n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
           AS m3,
         CAST(n * n * n * s4 - 4 * n * n * s1 * s3
              + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
              * CAST(n AS DOUBLE)) AS m4
  FROM m
), g AS (
  SELECT status, n,
         m3 / (m2 * SQRT(m2)) AS g1,
         m4 / (m2 * m2) - 3.0 AS g2
  FROM c
), j AS (
  SELECT status, n,
         ROUND((CAST(n AS DOUBLE) / 6.0)
               * (g1 * g1 + (g2 * g2) / 4.0), 6) AS jb
  FROM g
)
SELECT status, CAST(n AS BIGINT) AS n, jb,
       CAST(CASE WHEN jb > 5.991465 THEN 1 ELSE 0 END AS BIGINT) AS reject
FROM j
"""


# =====================================================================
# Mann-Kendall trend test on daily revenue
# =====================================================================

def q_mann_kendall(sf_dir: str):
    """Mann-Kendall trend test over the daily-revenue series: S =
    sum_{i<j} sign(rev_j - rev_i) and Kendall tau with tie correction -
    the nonparametric is-this-series-trending check (Mann 1945, Kendall
    1975) a forecasting pipeline runs before fitting (crawl twin: is a
    host's publish rate drifting up). Day sums fold exactly (int64
    cents) through a <=#days exchange; S is computed on the bounded
    driver rows with exact integer sign counting (one vectorized pass
    per row, O(#days^2) comparisons on <=~2.5k days); tie term from
    np.unique counts; ONE identical IEEE tau expression, 6 dp. The
    oracle self-joins the same bounded daily table."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    day_us = 86_400_000_000

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "day": pc.divide(b["o_orderdate"].cast(pa.int64()),
                             pa.scalar(day_us, pa.int64())).cast(pa.int64()),
            "rev": _cents(b["o_totalprice"]),
        })
        g = t.group_by("day").aggregate([("rev", "sum")])
        return g.rename_columns(["day", "rev"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("day")
           .aggregate(Sum("rev", alias_name="rev")))
    df = agg.to_pandas()  # <= #days rows - bounded fold
    df = df.sort_values("day", ignore_index=True)
    rev = df["rev"].to_numpy(np.int64)
    n = int(len(rev))
    s = 0
    for i in range(n - 1):  # exact integer sign fold, O(n^2) on <=~2.5k
        d = rev[i + 1:] - rev[i]
        s += int((d > 0).sum()) - int((d < 0).sum())
    _, tc = np.unique(rev, return_counts=True)
    ty = int(((tc.astype(object) * (tc.astype(object) - 1)) // 2).sum())
    pairs = n * (n - 1) // 2
    tau = float(s) / math.sqrt(float(pairs) * float(pairs - ty))
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "s": pa.array([s], pa.int64()),
        "tau": pa.array([np.round(tau, 6)], pa.float64())})


SQL_MANN_KENDALL = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), p AS (
  SELECT CASE WHEN b.rev > a.rev THEN 1
              WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sg
  FROM d a JOIN d b ON b.day > a.day
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d
), t AS (
  SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS ty
  FROM (SELECT COUNT(*) AS c FROM d GROUP BY rev)
), s AS (
  SELECT CAST(SUM(sg) AS BIGINT) AS s FROM p
)
SELECT m.n AS n_days, s.s AS s,
       ROUND(CAST(s.s AS DOUBLE)
             / SQRT(CAST(m.n * (m.n - 1) // 2 AS DOUBLE)
                    * CAST(m.n * (m.n - 1) // 2 - t.ty AS DOUBLE)),
             6) AS tau
FROM m, t, s
"""


# =====================================================================
# geometric mean per group (bounded-domain ordered-term fold)
# =====================================================================

def q_geometric_mean(sf_dir: str):
    """Geometric mean quantity per return flag - the multiplicative
    average a ratio-scaled metric wants (data twin: geomean of per-doc
    compression ratios per source). Quantity's bounded integer domain
    (<= 50 distinct values) makes the log-sum EXACT-ordered: per-block
    (flag, q) count partials -> one <=|flags|x50 exchange -> the driver
    folds sum c_v * ln(v) sequentially in ASCENDING v order, the same
    ordered-aggregate convention as lang_entropy, so both sides
    accumulate the identical float sequence; gmean = exp(s/n), 6 dp."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "flag": b["l_returnflag"],
            "q": pc.round(b["l_quantity"]).cast(pa.int64()),
        })
        g = t.group_by(["flag", "q"]).aggregate([([], "count_all")])
        return g.rename_columns(["flag", "q", "c"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["flag", "q"])
           .aggregate(Sum("c", alias_name="c")))
    df = agg.to_pandas()  # <= |flags| x 50 rows - bounded fold
    df = df.sort_values(["flag", "q"], ignore_index=True)
    out = {"flag": [], "n": [], "gmean": []}
    for flag, g in df.groupby("flag", sort=True):
        n = int(g["c"].sum())
        s = 0.0
        for q, c in zip(g["q"], g["c"]):  # ascending q - ordered sum
            s = s + float(int(c)) * math.log(float(int(q)))
        out["flag"].append(flag)
        out["n"].append(n)
        out["gmean"].append(np.round(math.exp(s / float(n)), 6))
    return pa.table({"flag": pa.array(out["flag"], pa.string()),
                     "n": pa.array(out["n"], pa.int64()),
                     "gmean": pa.array(out["gmean"], pa.float64())})


SQL_GEOMETRIC_MEAN = """
WITH c AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_quantity) AS BIGINT) AS q,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
), s AS (
  SELECT flag, SUM(c) AS n,
         SUM(CAST(c AS DOUBLE) * LN(CAST(q AS DOUBLE)) ORDER BY q) AS s
  FROM c GROUP BY flag
)
SELECT flag, CAST(n AS BIGINT) AS n,
       ROUND(EXP(s / CAST(n AS DOUBLE)), 6) AS gmean
FROM s
"""


# =====================================================================
# sliding-window burst flags (RANGE-frame COUNT + threshold)
# =====================================================================

def q_burst_flags(sf_dir: str, window_us: int = 600_000_000,
                  threshold: int = 2):
    """Events whose user fired >= threshold events inside the trailing
    10-minute window - the rate-limit / bot-burst detector (crawl twin:
    hosts suddenly hammered by the frontier; the politeness clock's
    anomaly readout). Scale shape: ONE user-hash exchange (the
    range_moving_sum pattern); each partition sorts a user's events once
    and counts every trailing window with two vectorized searchsorted
    passes - RANGE semantics, so timestamp PEERS are included exactly as
    the SQL frame does; per-partition (type, flagged, total) bincount
    partials fold through a <=|types| final exchange."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["ts", "user_id", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "event_type": b["event_type"],
            "ts_us": b["ts"].cast(pa.int64()),
            "kp": pa.array(kp),
        })

    def window(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _uid, sub in g.groupby("user_id", sort=False):
            sub = sub.sort_values("ts_us", kind="mergesort")
            ts = sub["ts_us"].to_numpy()
            lo = np.searchsorted(ts, ts - window_us, side="left")
            hi = np.searchsorted(ts, ts, side="right")  # peers included
            outs.append(pd.DataFrame({
                "event_type": sub["event_type"].to_numpy(),
                "fl": ((hi - lo) >= threshold).astype(np.int64),
            }))
        if not outs:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "n_flagged": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64)})
        df = pd.concat(outs, ignore_index=True)
        agg = df.groupby("event_type", sort=False)["fl"].agg(["sum", "count"])
        return pd.DataFrame({
            "event_type": agg.index.to_numpy(),
            "n_flagged": agg["sum"].to_numpy(np.int64),
            "n_events": agg["count"].to_numpy(np.int64)})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(window, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("n_flagged", alias_name="n_flagged"),
                      Sum("n_events", alias_name="n_events")))
    df = agg.to_pandas()  # <= |types| rows - bounded fold
    df = df.sort_values("event_type", ignore_index=True)
    return pa.table({
        "event_type": pa.array(df["event_type"], pa.string()),
        "n_flagged": pa.array(df["n_flagged"].to_numpy(np.int64)),
        "n_events": pa.array(df["n_events"].to_numpy(np.int64))})


SQL_BURST_FLAGS = """
WITH w AS (
  SELECT event_type,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS c
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM w GROUP BY 1
"""


# =====================================================================
# CUSUM changepoint on daily revenue (exact-integer argmax)
# =====================================================================

def q_cusum_changepoint(sf_dir: str):
    """CUSUM changepoint: the day k maximizing |n*cum_k - k*total| over
    the daily-revenue series - the standard at-most-one-changepoint
    locator (Page 1954; the statistic is n^2 x the mean-centered CUSUM,
    kept in INTEGER cents so no float comparison ever decides the
    argmax). Day sums fold exactly through a <=#days exchange; the
    bounded driver rows take one cumsum and one argmax; ties break to
    the earliest day on both sides. n*cum stays < 2^63 for any corpus
    with < 9.2e18 total cents x days (documented bound)."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    day_us = 86_400_000_000

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "day": pc.divide(b["o_orderdate"].cast(pa.int64()),
                             pa.scalar(day_us, pa.int64())).cast(pa.int64()),
            "rev": _cents(b["o_totalprice"]),
        })
        g = t.group_by("day").aggregate([("rev", "sum")])
        return g.rename_columns(["day", "rev"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("day")
           .aggregate(Sum("rev", alias_name="rev")))
    df = agg.to_pandas()  # <= #days rows - bounded fold
    df = df.sort_values("day", ignore_index=True)
    day = df["day"].to_numpy(np.int64)
    rev = df["rev"].to_numpy(np.int64).astype(object)
    n = int(len(rev))
    cum = np.cumsum(rev)          # python ints - exact
    total = int(cum[-1])
    k = np.arange(1, n + 1, dtype=object)
    g = np.abs(n * cum - k * total)
    best = int(np.argmax(g))       # first max = earliest day
    return pa.table({
        "day": pa.array([int(day[best])], pa.int64()),
        "g": pa.array([int(g[best])], pa.int64())})


SQL_CUSUM_CHANGEPOINT = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(rev) AS total FROM d
), w AS (
  SELECT day,
         SUM(rev) OVER (ORDER BY day) AS cum,
         ROW_NUMBER() OVER (ORDER BY day) AS k
  FROM d
)
SELECT day, CAST(ABS(t.n * w.cum - w.k * t.total) AS BIGINT) AS g
FROM w, t
ORDER BY g DESC, day
LIMIT 1
"""


# =====================================================================
# common-neighbors link prediction (top supplier pairs by shared parts)
# =====================================================================

def q_common_neighbors(sf_dir: str):
    """Top-20 supplier pairs ranked by COMMON NEIGHBORS in the
    part-supplier bipartite graph (# distinct parts both supply) - the
    classic link-prediction score (Liben-Nowell & Kleinberg 2003; data
    twin: candidate mirror/affiliate sites sharing many outlinks).
    Scale shape: per-block DISTINCT (part, supp) combiner -> ONE
    partkey-hash exchange (every edge of a part lands together) ->
    per-partition pair emission VECTORIZED BY DEGREE CLASS (parts of
    equal degree d form an (m, d) matrix; one triu_indices gather emits
    all m*C(d,2) pairs - no per-part Python loop), pre-folded to local
    (packed-pair-key, count) rows -> SECOND int-key-hash exchange with a
    per-partition pandas sum + partial top-20 under the TOTAL order
    (c DESC, key ASC == c DESC, s1, s2 - the pack is lexicographic);
    driver merges <=20 x parts rows. A Ray hash Aggregate over the
    |supps|^2/2 pair groups is NOT used - measured 493 s vs ~2 s for
    this fold at sf0.1 (the few-group-Aggregate lesson at 500k groups);
    the |supps|^2 table never reaches the driver. Packing guard:
    suppkeys must fit 32 bits (dimension keys; asserted)."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def distinct_block(b: pa.Table) -> pa.Table:
        t = b.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(p).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("kp", pa.array(kp))

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_partkey", "l_suppkey"])
        g = g.sort_values(["l_partkey", "l_suppkey"], kind="mergesort")
        p = g["l_partkey"].to_numpy(np.int64)
        s = g["l_suppkey"].to_numpy(np.int64)
        empty = pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                              "c": pd.Series([], dtype=np.int64),
                              "kp2": pd.Series([], dtype=np.int64)})
        if len(p) == 0:
            return empty
        if s.max() >= 2 ** 31:
            raise ValueError("suppkey exceeds 32-bit pack range")
        new = np.concatenate(([True], p[1:] != p[:-1]))
        seg_start = np.flatnonzero(new)
        seg_len = np.diff(np.concatenate((seg_start, [len(p)])))
        keys = []
        for d in np.unique(seg_len):
            if d < 2:
                continue
            starts = seg_start[seg_len == d]
            mat = s[starts[:, None] + np.arange(int(d))[None, :]]
            ii, jj = np.triu_indices(int(d), 1)
            keys.append((mat[:, ii].ravel() << 32) | mat[:, jj].ravel())
        if not keys:
            return empty
        key = np.concatenate(keys)
        uk, inv = np.unique(key, return_counts=True)
        kp2 = (_splitmix64(uk).view(np.uint64)
               % np.uint64(n_parts)).astype(np.int64)
        return pd.DataFrame({"key": uk, "c": inv.astype(np.int64),
                             "kp2": kp2})

    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("key", sort=False)["c"].sum()  # int64 - exact
        key = tot.index.to_numpy(np.int64)
        c = tot.to_numpy(np.int64)
        order = np.lexsort((key, -c))[:20]  # c DESC, key ASC - total order
        key, c = key[order], c[order]
        return pd.DataFrame({"s1": key >> 32,
                             "s2": key & np.int64(0xFFFFFFFF), "c": c})

    top = (ds.map_batches(distinct_block, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(pairs_part, batch_format="pandas")
           .groupby("kp2").map_groups(fold_part, batch_format="pandas"))
    parts = list(top.iter_batches(batch_format="pyarrow"))
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"s1": pa.array([], pa.int64()), "s2": pa.array([], pa.int64()),
         "c": pa.array([], pa.int64())})
    idx = pc.sort_indices(merged, sort_keys=[("c", "descending"),
                                             ("s1", "ascending"),
                                             ("s2", "ascending")])
    return merged.take(idx[:20]).select(["s1", "s2", "c"])


SQL_COMMON_NEIGHBORS = """
WITH ps AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
), pairs AS (
  SELECT a.s AS s1, b.s AS s2, CAST(COUNT(*) AS BIGINT) AS c
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
  GROUP BY 1, 2
)
SELECT s1, s2, c FROM pairs
ORDER BY c DESC, s1, s2
LIMIT 20
"""


# =====================================================================
# mutual information between two categorical columns
# =====================================================================

def q_mutual_info(sf_dir: str):
    """Mutual information (nats) between a document's language and its
    source - the dependence score a corpus-curation dashboard uses to
    catch a source that suddenly goes monolingual (0 = independent;
    chi2_independence's information-theoretic sibling). Cell counts fold
    exactly through a <=|langs|x|sources| exchange of per-block Arrow
    partials; MI = sum (c/n) ln(n*c/(cl*cs)) runs on the bounded driver
    rows with the term sum in SORTED (lang, source) order (the
    lang_entropy ordered-aggregate convention), every operand an exact
    integer until the one division per term; 6 dp both sides."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["lang", "source"])

    def prep(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "source", "c"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["lang", "source"])
           .aggregate(Sum("c", alias_name="c")))
    df = agg.to_pandas()  # <= |langs| x |sources| rows - bounded fold
    df = df.sort_values(["lang", "source"], ignore_index=True)
    n = int(df["c"].sum())
    cl = df.groupby("lang")["c"].sum().to_dict()
    cs = df.groupby("source")["c"].sum().to_dict()
    mi = 0.0
    for lang, src, c in zip(df["lang"], df["source"], df["c"]):
        c = int(c)  # sorted (lang, source) order - deterministic sum
        mi = mi + (float(c) / float(n)) * math.log(
            float(n * c) / float(int(cl[lang]) * int(cs[src])))
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "mi": pa.array([np.round(mi, 6)], pa.float64())})


SQL_MUTUAL_INFO = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells
), lm AS (
  SELECT lang, CAST(SUM(c) AS BIGINT) AS cl FROM cells GROUP BY 1
), sm AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM cells GROUP BY 1
)
SELECT tot.n AS n,
       ROUND(SUM((CAST(c.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
                 * LN(CAST(tot.n * c.c AS DOUBLE)
                      / CAST(lm.cl * sm.cs AS DOUBLE))
                 ORDER BY c.lang, c.source), 6) AS mi
FROM cells c
JOIN lm USING (lang) JOIN sm USING (source) CROSS JOIN tot
GROUP BY tot.n
"""


# =====================================================================
# Theil-Sen robust trend slope (median of pairwise slopes)
# =====================================================================

def q_theil_sen(sf_dir: str):
    """Theil-Sen estimator over the daily-revenue series: the median of
    all pairwise slopes (rev_j - rev_i)/(day_j - day_i) - the robust
    trend line that shrugs off outlier days where OLS (regr_per_group)
    bends (Theil 1950, Sen 1968; mann_kendall's slope companion). Day
    sums fold exactly (int64 cents) through a <=#days exchange; the
    O(#days^2) slope set (~3M doubles at 2.4k days) is built vectorized
    on the bounded driver rows. The median is reported as the exact
    lower/upper middle ORDER STATISTICS plus their midpoint computed
    with the IDENTICAL (lo+hi)/2 expression both sides - never an
    engine-internal interpolation that could differ by an ulp."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    day_us = 86_400_000_000

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "day": pc.divide(b["o_orderdate"].cast(pa.int64()),
                             pa.scalar(day_us, pa.int64())).cast(pa.int64()),
            "rev": _cents(b["o_totalprice"]),
        })
        g = t.group_by("day").aggregate([("rev", "sum")])
        return g.rename_columns(["day", "rev"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("day")
           .aggregate(Sum("rev", alias_name="rev")))
    df = agg.to_pandas()  # <= #days rows - bounded fold
    df = df.sort_values("day", ignore_index=True)
    day = df["day"].to_numpy(np.int64)
    rev = df["rev"].to_numpy(np.int64)
    n = int(len(day))
    slopes = []
    for i in range(n - 1):  # vectorized per row: ~n^2/2 doubles total
        slopes.append((rev[i + 1:] - rev[i]).astype(np.float64)
                      / (day[i + 1:] - day[i]).astype(np.float64))
    s = np.sort(np.concatenate(slopes))
    m = int(len(s))
    lo = float(s[(m - 1) // 2])
    hi = float(s[m // 2])
    return pa.table({
        "n_pairs": pa.array([m], pa.int64()),
        "slope": pa.array([np.round((lo + hi) / 2.0, 6)], pa.float64())})


SQL_THEIL_SEN = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), p AS (
  SELECT CAST(b.rev - a.rev AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
           AS slope
  FROM d a JOIN d b ON b.day > a.day
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m FROM p
), r AS (
  SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn FROM p
), lo AS (
  SELECT slope FROM r, m WHERE rn = (m.m - 1) // 2 + 1
), hi AS (
  SELECT slope FROM r, m WHERE rn = m.m // 2 + 1
)
SELECT m.m AS n_pairs,
       ROUND((lo.slope + hi.slope) / 2.0, 6) AS slope
FROM m, lo, hi
"""


# =====================================================================
# Jaccard link prediction (top supplier pairs by neighborhood overlap)
# =====================================================================

def q_jaccard_links(sf_dir: str):
    """Top-20 supplier pairs by JACCARD similarity of their part
    neighborhoods c/(d1+d2-c) - common_neighbors' normalized sibling
    (Liben-Nowell & Kleinberg 2003), which stops high-degree hubs from
    dominating the ranking. Same scale shape as common_neighbors (ONE
    partkey-hash exchange -> degree-class-vectorized pair emission ->
    packed-int-key partition fold), plus a bounded degree table
    (<=|supps| rows) folded from the SAME exchange: the per-partition
    task emits pair rows AND degree-partial rows (partition-local
    distinct is globally exact because a part's edges live in exactly
    one partition), tagged by kind, through ONE materialized pass - the
    input is never scanned or shuffled twice. Ranking uses the ROUNDED
    score (6 dp) then the packed key, a total order identical on both
    sides, so the per-partition partial top-20 is exact."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def distinct_block(b: pa.Table) -> pa.Table:
        t = b.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(p).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("kp", pa.array(kp))

    def emit_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_partkey", "l_suppkey"])
        g = g.sort_values(["l_partkey", "l_suppkey"], kind="mergesort")
        p = g["l_partkey"].to_numpy(np.int64)
        s = g["l_suppkey"].to_numpy(np.int64)
        empty = pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                              "c": pd.Series([], dtype=np.int64),
                              "kp2": pd.Series([], dtype=np.int64),
                              "kind": pd.Series([], dtype=np.int64)})
        if len(p) == 0:
            return empty
        if s.max() >= 2 ** 31:
            raise ValueError("suppkey exceeds 32-bit pack range")
        # degree partials (kind=0): globally-distinct edges counted here
        vc = pd.Series(s).value_counts()
        frames = [pd.DataFrame({
            "key": vc.index.to_numpy(np.int64),
            "c": vc.to_numpy(np.int64),
            "kp2": np.zeros(len(vc), np.int64),
            "kind": np.zeros(len(vc), np.int64)})]
        new = np.concatenate(([True], p[1:] != p[:-1]))
        seg_start = np.flatnonzero(new)
        seg_len = np.diff(np.concatenate((seg_start, [len(p)])))
        keys = []
        for d in np.unique(seg_len):
            if d < 2:
                continue
            starts = seg_start[seg_len == d]
            mat = s[starts[:, None] + np.arange(int(d))[None, :]]
            ii, jj = np.triu_indices(int(d), 1)
            keys.append((mat[:, ii].ravel() << 32) | mat[:, jj].ravel())
        if keys:
            key = np.concatenate(keys)
            uk, inv = np.unique(key, return_counts=True)
            kp2 = (_splitmix64(uk).view(np.uint64)
                   % np.uint64(n_parts)).astype(np.int64)
            frames.append(pd.DataFrame({
                "key": uk, "c": inv.astype(np.int64), "kp2": kp2,
                "kind": np.ones(len(uk), np.int64)}))
        return pd.concat(frames, ignore_index=True)

    tagged = (ds.map_batches(distinct_block, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("kp").map_groups(emit_part, batch_format="pandas")
              .materialize())

    # bounded degree fold on the driver: <= |supps| x n_parts rows
    deg: dict[int, int] = {}
    for b in (tagged
              .map_batches(lambda t: t.filter(pc.equal(t["kind"], 0)),
                           batch_format="pyarrow", zero_copy_batch=True)
              .iter_batches(batch_format="pyarrow")):
        for s_, d_ in zip(b["key"].to_pylist(), b["c"].to_pylist()):
            deg[int(s_)] = deg.get(int(s_), 0) + int(d_)

    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("key", sort=False)["c"].sum()  # int64 - exact
        key = tot.index.to_numpy(np.int64)
        c = tot.to_numpy(np.int64)
        s1 = key >> 32
        s2 = key & np.int64(0xFFFFFFFF)
        d1 = np.array([deg[int(v)] for v in s1], dtype=np.int64)
        d2 = np.array([deg[int(v)] for v in s2], dtype=np.int64)
        jac = np.round(c.astype(np.float64)
                       / (d1 + d2 - c).astype(np.float64), 6)
        order = np.lexsort((key, -jac))[:20]  # jac DESC, key ASC
        return pd.DataFrame({"s1": s1[order], "s2": s2[order],
                             "c": c[order], "jac": jac[order]})

    top = (tagged
           .map_batches(lambda t: t.filter(pc.equal(t["kind"], 1))
                        .drop_columns(["kind"]),
                        batch_format="pyarrow", zero_copy_batch=True)
           .groupby("kp2").map_groups(fold_part, batch_format="pandas"))
    parts = list(top.iter_batches(batch_format="pyarrow"))
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"s1": pa.array([], pa.int64()), "s2": pa.array([], pa.int64()),
         "c": pa.array([], pa.int64()), "jac": pa.array([], pa.float64())})
    df = merged.to_pandas()
    key = (df["s1"].to_numpy(np.int64) << 32) | df["s2"].to_numpy(np.int64)
    order = np.lexsort((key, -df["jac"].to_numpy()))[:20]
    out = df.iloc[order].reset_index(drop=True)
    return pa.table({"s1": pa.array(out["s1"].to_numpy(np.int64)),
                     "s2": pa.array(out["s2"].to_numpy(np.int64)),
                     "c": pa.array(out["c"].to_numpy(np.int64)),
                     "jac": pa.array(out["jac"].to_numpy(np.float64))})


SQL_JACCARD_LINKS = """
WITH ps AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
), deg AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM ps GROUP BY 1
), pairs AS (
  SELECT a.s AS s1, b.s AS s2, CAST(COUNT(*) AS BIGINT) AS c
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
  GROUP BY 1, 2
)
SELECT s1, s2, c,
       ROUND(CAST(c AS DOUBLE) / CAST(d1.d + d2.d - c AS DOUBLE), 6)
         AS jac
FROM pairs JOIN deg d1 ON d1.s = s1 JOIN deg d2 ON d2.s = s2
ORDER BY jac DESC, s1, s2
LIMIT 20
"""


# =====================================================================
# Adamic-Adar link prediction (degree-weighted common neighbors)
# =====================================================================

def q_adamic_adar(sf_dir: str):
    """Top-20 supplier pairs by ADAMIC-ADAR score sum 1/ln(deg(p)) over
    shared parts p - the third link-prediction flavor (Adamic & Adar
    2003), which discounts promiscuous neighbors that common_neighbors
    counts at full weight. The part degree domain is BOUNDED (<= ~52
    suppliers per part), so the float score is an EXACT-ORDERED sum:
    pair emissions carry their part's degree, fold to integer counts
    per (pair, deg) through the packed-key partition exchange (key
    packs s1|s2|deg - still one int64), and each pair's score folds
    sum c_d * (1/ln d) in ASCENDING d order - the lang_entropy ordered
    convention, mirrored by the oracle's SUM(... ORDER BY d). Ranking
    by (ROUNDED score DESC, s1, s2) makes the per-partition partial
    top-20 exact under a total order."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def distinct_block(b: pa.Table) -> pa.Table:
        t = b.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(p).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("kp", pa.array(kp))

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_partkey", "l_suppkey"])
        g = g.sort_values(["l_partkey", "l_suppkey"], kind="mergesort")
        p = g["l_partkey"].to_numpy(np.int64)
        s = g["l_suppkey"].to_numpy(np.int64)
        empty = pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                              "c": pd.Series([], dtype=np.int64),
                              "kp2": pd.Series([], dtype=np.int64)})
        if len(p) == 0:
            return empty
        if s.max() >= 2 ** 26:
            raise ValueError("suppkey exceeds 26-bit pack range")
        new = np.concatenate(([True], p[1:] != p[:-1]))
        seg_start = np.flatnonzero(new)
        seg_len = np.diff(np.concatenate((seg_start, [len(p)])))
        keys = []
        for d in np.unique(seg_len):
            if d < 2:
                continue
            if d >= 2 ** 12:
                raise ValueError("part degree exceeds 12-bit pack range")
            starts = seg_start[seg_len == d]
            mat = s[starts[:, None] + np.arange(int(d))[None, :]]
            ii, jj = np.triu_indices(int(d), 1)
            # key packs (s1, s2, deg): 26 + 26 + 12 bits
            keys.append((mat[:, ii].ravel() << 38)
                        | (mat[:, jj].ravel() << 12)
                        | np.int64(d))
        if not keys:
            return empty
        key = np.concatenate(keys)
        uk, inv = np.unique(key, return_counts=True)
        # partition on the PAIR (drop the degree bits) so one pair's
        # degree rows land together for the ordered score fold
        kp2 = (_splitmix64(uk >> 12).view(np.uint64)
               % np.uint64(n_parts)).astype(np.int64)
        return pd.DataFrame({"key": uk, "c": inv.astype(np.int64),
                             "kp2": kp2})

    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("key", sort=True)["c"].sum()  # int64 - exact
        key = tot.index.to_numpy(np.int64)
        c = tot.to_numpy(np.int64)
        pair = key >> 12
        deg = key & np.int64(0xFFF)
        # ascending (pair, deg) from the sorted groupby: sequential
        # ordered sum per pair boundary
        scores = {}
        counts = {}
        for pk, d, cd in zip(pair, deg, c):
            scores[pk] = scores.get(pk, 0.0) \
                + float(int(cd)) * (1.0 / math.log(float(int(d))))
            counts[pk] = counts.get(pk, 0) + int(cd)
        pks = np.fromiter(scores.keys(), dtype=np.int64)
        sc = np.round(np.fromiter(scores.values(), dtype=np.float64), 6)
        cn = np.fromiter(counts.values(), dtype=np.int64)
        order = np.lexsort((pks, -sc))[:20]  # score DESC, pair ASC
        pks, sc, cn = pks[order], sc[order], cn[order]
        return pd.DataFrame({"s1": pks >> 26,
                             "s2": pks & np.int64(0x3FFFFFF),
                             "c": cn, "aa": sc})

    top = (ds.map_batches(distinct_block, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(pairs_part, batch_format="pandas")
           .groupby("kp2").map_groups(fold_part, batch_format="pandas"))
    parts = list(top.iter_batches(batch_format="pyarrow"))
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"s1": pa.array([], pa.int64()), "s2": pa.array([], pa.int64()),
         "c": pa.array([], pa.int64()), "aa": pa.array([], pa.float64())})
    df = merged.to_pandas()
    key = (df["s1"].to_numpy(np.int64) << 26) | df["s2"].to_numpy(np.int64)
    order = np.lexsort((key, -df["aa"].to_numpy()))[:20]
    out = df.iloc[order].reset_index(drop=True)
    return pa.table({"s1": pa.array(out["s1"].to_numpy(np.int64)),
                     "s2": pa.array(out["s2"].to_numpy(np.int64)),
                     "c": pa.array(out["c"].to_numpy(np.int64)),
                     "aa": pa.array(out["aa"].to_numpy(np.float64))})


SQL_ADAMIC_ADAR = """
WITH ps AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
), deg AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM ps GROUP BY 1
), pd AS (
  SELECT a.s AS s1, b.s AS s2, deg.d AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
  JOIN deg ON deg.p = a.p
  GROUP BY 1, 2, 3
), sc AS (
  SELECT s1, s2, CAST(SUM(c) AS BIGINT) AS c,
         ROUND(SUM(CAST(c AS DOUBLE) * (1.0 / LN(CAST(d AS DOUBLE)))
                   ORDER BY d), 6) AS aa
  FROM pd GROUP BY 1, 2
)
SELECT s1, s2, c, aa FROM sc
ORDER BY aa DESC, s1, s2
LIMIT 20
"""


# =====================================================================
# truncated EWMA smoothing of daily revenue (exact power-of-2 decay)
# =====================================================================

def q_ewma_smooth(sf_dir: str):
    """10-day truncated exponential smoothing of daily revenue with
    decay 1/2 per day - the EWMA readout of a monitoring dashboard.
    The decay being a POWER OF TWO makes every term rev * 2^-k an
    EXACT double (a pure exponent shift, no rounding), so both sides
    sum the identical floats in the identical ascending-k order and
    the usual cross-libm pow() hazard never arises; gaps in the day
    spine shrink the window on both sides identically (the k-offset
    join only matches days that exist). Day sums fold exactly (int64
    cents) through a <=#days exchange; the smoothing itself is a
    vectorized shift-accumulate over the bounded driver rows. One trap
    this op actually hits: dyadic num/den quotients land EXACTLY on
    .xxxxxx5 decimal boundaries (28 of 2399 days at sf0.01), where
    np.round's half-even and DuckDB ROUND's half-away disagree - the
    finale therefore emulates half-away explicitly
    (floor(x*1e6 + 0.5)/1e6; values are positive)."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    day_us = 86_400_000_000

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "day": pc.divide(b["o_orderdate"].cast(pa.int64()),
                             pa.scalar(day_us, pa.int64())).cast(pa.int64()),
            "rev": _cents(b["o_totalprice"]),
        })
        g = t.group_by("day").aggregate([("rev", "sum")])
        return g.rename_columns(["day", "rev"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("day")
           .aggregate(Sum("rev", alias_name="rev")))
    df = agg.to_pandas()  # <= #days rows - bounded fold
    df = df.sort_values("day", ignore_index=True)
    day = df["day"].to_numpy(np.int64)
    rev = df["rev"].to_numpy(np.int64).astype(np.float64)
    pos = {int(d): i for i, d in enumerate(day)}
    num = np.zeros(len(day), np.float64)
    den = np.zeros(len(day), np.float64)
    for k in range(10):  # ascending k - identical order both sides
        w = 1.0 / float(1 << k)
        src = np.array([pos.get(int(d) - k, -1) for d in day])
        hit = src >= 0
        num[hit] = num[hit] + rev[src[hit]] * w
        den[hit] = den[hit] + w
    q = num / den
    return pa.table({
        "day": pa.array(day, pa.int64()),
        "ewma": pa.array(np.floor(q * 1e6 + 0.5) / 1e6, pa.float64())})


SQL_EWMA_SMOOTH = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), k AS (
  SELECT range AS k FROM range(10)
), w AS (
  SELECT a.day AS day, k.k AS k,
         CAST(b.rev AS DOUBLE) / CAST(1 << k.k AS DOUBLE) AS term,
         1.0 / CAST(1 << k.k AS DOUBLE) AS wt
  FROM d a CROSS JOIN k JOIN d b ON b.day = a.day - k.k
)
SELECT day,
       ROUND(SUM(term ORDER BY k) / SUM(wt ORDER BY k), 6) AS ewma
FROM w GROUP BY day
"""


# =====================================================================
# group k-fold assignment (leakage-free user-grouped CV folds)
# =====================================================================

def q_group_kfold(sf_dir: str, k: int = 5):
    """GROUP k-fold assignment: every event lands in fold
    md5(user_id) % k, so ALL of a user's events share a fold and a
    cross-validation split can never leak one user's behavior across
    folds (stratified_kfold splits rows; this splits GROUPS - the
    difference between a valid and an optimistically-biased eval).
    Per-block (user, n) partials ride ONE user-hash exchange; each
    partition computes folds for its distinct users and emits <= k
    (fold, users, events) partial rows; the final exchange is <= k x
    partitions. hashlib md5 == DuckDB md5() on the decimal string."""
    import hashlib

    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id"])

    def prep(b: pa.Table) -> pa.Table:
        u, c = np.unique(b["user_id"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        u = u.astype(np.int64)
        kp = (_splitmix64(u).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"user_id": pa.array(u),
                         "n": pa.array(c.astype(np.int64)),
                         "kp": pa.array(kp)})

    def fold_users(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("user_id", sort=False)["n"].sum()
        users = t.index.to_numpy(np.int64)
        ev = t.to_numpy(np.int64)
        f = np.fromiter(
            (int(hashlib.md5(str(int(u)).encode()).hexdigest()[:8], 16) % k
             for u in users), dtype=np.int64, count=len(users))
        out = pd.DataFrame({"fold": f, "users": 1, "events": ev}) \
            .groupby("fold", sort=False).sum().reset_index()
        return out.astype({"fold": np.int64, "users": np.int64,
                           "events": np.int64})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold_users, batch_format="pandas")
           .groupby("fold")
           .aggregate(Sum("users", alias_name="n_users"),
                      Sum("events", alias_name="n_events")))
    df = agg.to_pandas().sort_values("fold", ignore_index=True)
    return pa.table({
        "fold": pa.array(df["fold"].to_numpy(np.int64)),
        "n_users": pa.array(df["n_users"].to_numpy(np.int64)),
        "n_events": pa.array(df["n_events"].to_numpy(np.int64))})


SQL_GROUP_KFOLD = """
WITH f AS (
  SELECT CAST(CONCAT('0x', SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 5 AS fold,
         user_id
  FROM events
)
SELECT fold, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM f GROUP BY 1
"""


# =====================================================================
# temperature-scaled source sampling weights (multilingual mixing)
# =====================================================================

def q_temperature_mix(sf_dir: str):
    """Temperature-scaled sampling probabilities per source,
    p_s = c_s^0.5 / sum c^0.5 - the alpha=0.5 upsampling rule
    multilingual corpora mix with (Conneau et al. 2020, XLM-R), which
    lifts low-resource sources without letting the head dominate.
    Counts fold exactly through a <= |sources| exchange; alpha = 0.5
    makes the power a SQRT - correctly rounded per IEEE 754 (unlike
    pow(), which the repo bans cross-libm) - and the denominator sums
    in SORTED source order on both sides; one division per source,
    6 dp."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["source"])

    def prep(b: pa.Table) -> pa.Table:
        g = b.group_by("source").aggregate([([], "count_all")])
        return g.rename_columns(["source", "c"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("c", alias_name="c")))
    df = agg.to_pandas()  # <= |sources| rows - bounded fold
    df = df.sort_values("source", ignore_index=True)
    den = 0.0
    for c in df["c"]:  # sorted source order - deterministic float sum
        den = den + math.sqrt(float(int(c)))
    ps = [np.round(math.sqrt(float(int(c))) / den, 6) for c in df["c"]]
    return pa.table({
        "source": pa.array(df["source"], pa.string()),
        "n_docs": pa.array(df["c"].to_numpy(np.int64)),
        "p": pa.array(ps, pa.float64())})


SQL_TEMPERATURE_MIX = """
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1
), d AS (
  SELECT SUM(SQRT(CAST(c AS DOUBLE)) ORDER BY source) AS den FROM c
)
SELECT source, c AS n_docs,
       ROUND(SQRT(CAST(c AS DOUBLE)) / d.den, 6) AS p
FROM c, d
"""


# =====================================================================
# day-of-week seasonality index
# =====================================================================

def q_dow_seasonality(sf_dir: str):
    """Day-of-week seasonal index of order revenue: mean revenue on
    ISO weekday d over the all-days mean - the weekly-rhythm readout a
    revisit scheduler keys on (crawl twin: which weekdays a host
    publishes). Per-(dow) cent sums and day counts fold exactly through
    a <= 7 exchange; the index stays EXACT INTEGERS through the cross
    product (S_d * n_all) / (n_d * S_all) - python ints on the bounded
    driver rows == HUGEINT - until one division, 6 dp. Day means use
    DISTINCT day counts so a missing calendar day can't skew its
    weekday (same span rule both sides)."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    day_us = 86_400_000_000

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "day": pc.divide(b["o_orderdate"].cast(pa.int64()),
                             pa.scalar(day_us, pa.int64())).cast(pa.int64()),
            "rev": _cents(b["o_totalprice"]),
        })
        g = t.group_by("day").aggregate([("rev", "sum")])
        return g.rename_columns(["day", "rev"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("day")
           .aggregate(Sum("rev", alias_name="rev")))
    df = agg.to_pandas()  # <= #days rows - bounded fold
    # 1970-01-01 was a Thursday: isodow = (epoch_day + 3) % 7 + 1
    df["dow"] = (df["day"].to_numpy(np.int64) + 3) % 7 + 1
    s_all = int(df["rev"].sum())
    n_all = int(len(df))
    g = df.groupby("dow", sort=True)["rev"]
    rows = {"dow": [], "n_days": [], "index": []}
    for dow, vals in g:
        s_d = int(vals.sum())
        n_d = int(len(vals))
        rows["dow"].append(int(dow))
        rows["n_days"].append(n_d)
        rows["index"].append(np.round(
            float(s_d * n_all) / float(n_d * s_all), 6))
    return pa.table({"dow": pa.array(rows["dow"], pa.int64()),
                     "n_days": pa.array(rows["n_days"], pa.int64()),
                     "index": pa.array(rows["index"], pa.float64())})


SQL_DOW_SEASONALITY = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), t AS (
  SELECT CAST(SUM(rev) AS HUGEINT) AS s_all,
         CAST(COUNT(*) AS HUGEINT) AS n_all
  FROM d
)
SELECT CAST((day + 3) % 7 + 1 AS BIGINT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CAST(SUM(CAST(rev AS HUGEINT)) * t.n_all AS DOUBLE)
             / CAST(COUNT(*) * t.s_all AS DOUBLE), 6) AS index
FROM d, t GROUP BY 1, t.n_all, t.s_all
"""


# =====================================================================
# multi-lag autocorrelation function (ACF 1..7)
# =====================================================================

def q_acf_lags(sf_dir: str, max_lag: int = 7):
    """The autocorrelation function out to lag 7 over daily revenue -
    acf_lag1 extended to the full weekly window, the series diagnostic
    that separates momentum (smooth decay) from weekly seasonality (a
    spike at lag 7). One <=#days exchange of exact int64 day sums;
    every lag's Pearson r comes from exact integer moment sums over the
    lag-L day pairs (gaps excluded by the day+L rule both sides), ONE
    identical IEEE expression per lag, 6 dp."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    day_us = 86_400_000_000

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "day": pc.divide(b["o_orderdate"].cast(pa.int64()),
                             pa.scalar(day_us, pa.int64())).cast(pa.int64()),
            "rev": _cents(b["o_totalprice"]),
        })
        g = t.group_by("day").aggregate([("rev", "sum")])
        return g.rename_columns(["day", "rev"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("day")
           .aggregate(Sum("rev", alias_name="rev")))
    df = agg.to_pandas()  # <= #days rows - bounded fold
    df = df.sort_values("day", ignore_index=True)
    day = df["day"].to_numpy(np.int64)
    rev = df["rev"].to_numpy(np.int64).astype(object)
    pos = {int(d): i for i, d in enumerate(day)}
    rows = {"lag": [], "r": [], "n_pairs": []}
    for lag in range(1, max_lag + 1):
        src = np.array([pos.get(int(d) + lag, -1) for d in day])
        hit = src >= 0
        x, y = rev[hit], rev[src[hit]]
        n = int(len(x))
        sx, sy = int(x.sum()), int(y.sum())
        sxx, syy = int((x * x).sum()), int((y * y).sum())
        sxy = int((x * y).sum())
        num = n * sxy - sx * sy
        den = math.sqrt(float(n * sxx - sx * sx)
                        * float(n * syy - sy * sy))
        rows["lag"].append(lag)
        rows["r"].append(np.round(float(num) / den, 6))
        rows["n_pairs"].append(n)
    return pa.table({"lag": pa.array(rows["lag"], pa.int64()),
                     "r": pa.array(rows["r"], pa.float64()),
                     "n_pairs": pa.array(rows["n_pairs"], pa.int64())})


SQL_ACF_LAGS = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), l AS (
  SELECT CAST(range + 1 AS BIGINT) AS lag FROM range(7)
), p AS (
  SELECT l.lag, CAST(a.rev AS HUGEINT) AS x, CAST(b.rev AS HUGEINT) AS y
  FROM d a CROSS JOIN l JOIN d b ON b.day = a.day + l.lag
), m AS (
  SELECT lag, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM p GROUP BY 1
)
SELECT lag,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r,
       CAST(n AS BIGINT) AS n_pairs
FROM m
"""


# =====================================================================
# JSON-field aggregation (vectorized payload parsing in the hot path)
# =====================================================================

def q_json_agg_stats(sf_dir: str):
    """Per-type aggregate over a field parsed OUT OF the JSON payload
    column: n, sum(k), min/max - the event-property rollup every
    product-analytics pipeline runs, with the parse VECTORIZED (one RE2
    extract_regex kernel per block, no per-row json.loads) because at
    100 TB the JSON decode IS the hot path. Exact int64 partials
    through a <= |types| exchange; missing/malformed payloads count
    separately (n_bad) instead of poisoning the sums."""
    ds = _t(sf_dir, "events", ["event_type", "props"])

    def prep(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(b["props"], r'"k":\s*(?P<k>-?\d+)')
        valid = ex.is_valid()
        k = pc.if_else(valid,
                       pc.cast(pc.struct_field(ex, "k"), pa.int64()),
                       pa.scalar(0, pa.int64()))
        t = pa.table({
            "event_type": b["event_type"],
            "k": k,
            "good": valid.cast(pa.int64()),
            "bad": pc.invert(valid).cast(pa.int64()),
            "kmin": pc.if_else(valid, k, pa.scalar(2 ** 62, pa.int64())),
            "kmax": pc.if_else(valid, k, pa.scalar(-2 ** 62, pa.int64())),
        })
        g = t.group_by("event_type").aggregate(
            [("k", "sum"), ("good", "sum"), ("bad", "sum"),
             ("kmin", "min"), ("kmax", "max")])
        return g.rename_columns(
            ["event_type", "k", "good", "bad", "kmin", "kmax"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("event_type")
           .aggregate(Sum("k", alias_name="sum_k"),
                      Sum("good", alias_name="n_good"),
                      Sum("bad", alias_name="n_bad"),
                      Min("kmin", alias_name="min_k"),
                      Max("kmax", alias_name="max_k")))
    df = agg.to_pandas().sort_values("event_type", ignore_index=True)
    return pa.table({
        "event_type": pa.array(df["event_type"], pa.string()),
        "n_good": pa.array(df["n_good"].to_numpy(np.int64)),
        "n_bad": pa.array(df["n_bad"].to_numpy(np.int64)),
        "sum_k": pa.array(df["sum_k"].to_numpy(np.int64)),
        "min_k": pa.array(df["min_k"].to_numpy(np.int64)),
        "max_k": pa.array(df["max_k"].to_numpy(np.int64))})


SQL_JSON_AGG_STATS = """
WITH x AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_good,
       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bad,
       CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM x GROUP BY 1
"""


# =====================================================================
# k-core decomposition (iterative graph peeling)
# =====================================================================

_KCORE_DRIVER_LIMIT = 5_000_000  # edges; ~80 MB of 2xint64 - the same
# guarded-small-side discipline as _CC_DRIVER_LIMIT (dedup_groups)


def _peel_rounds(s1: np.ndarray, s2: np.ndarray, k: int):
    """One synchronous peeling schedule: drop ALL nodes below degree k
    each round (the deterministic batch formulation - round count is
    O(peeling depth), and the fixed point is the unique k-core
    regardless of schedule, Matula & Beck 1983). Returns the surviving
    edge mask."""
    alive = np.ones(len(s1), bool)
    while True:
        nodes = np.concatenate((s1[alive], s2[alive]))
        if len(nodes) == 0:
            return alive
        deg_nodes, deg = np.unique(nodes, return_counts=True)
        bad = set(deg_nodes[deg < k].tolist())
        if not bad:
            return alive
        bad_arr = np.fromiter(bad, dtype=np.int64)
        drop = (np.isin(s1, bad_arr) | np.isin(s2, bad_arr)) & alive
        alive &= ~drop


def q_kcore(sf_dir: str, k: int = 3):
    """The k=3 CORE of the supplier co-supply graph (suppliers sharing
    >= 2 distinct parts): iteratively peel every node with degree < k
    until a fixed point - the standard dense-subgraph / spam-farm
    detector (Matula & Beck 1983; crawl twin: link-farm cores in the
    host graph). Fourth iterative family next to pagerank / logreg /
    BPE. Edge derivation is the common_neighbors pipeline (ONE
    partkey-hash exchange -> packed-key partition fold, c >= 2 filter
    inside the fold); peeling runs on the driver under the
    _KCORE_DRIVER_LIMIT edge guard, and past it as DISTRIBUTED rounds:
    per-block degree bincount partials fold (node domain is
    dimension-bounded here; a web-scale node domain swaps in the
    hash-partition degree fold), the below-k node set broadcasts via
    ray.put, one vectorized filter pass per round. Both paths proven
    equal (forced-branch test); pinned against an independent
    adjacency-dict peeler. Output: surviving nodes with their core
    degrees, sorted."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def distinct_block(b: pa.Table) -> pa.Table:
        t = b.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(p).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("kp", pa.array(kp))

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_partkey", "l_suppkey"])
        g = g.sort_values(["l_partkey", "l_suppkey"], kind="mergesort")
        p = g["l_partkey"].to_numpy(np.int64)
        s = g["l_suppkey"].to_numpy(np.int64)
        empty = pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                              "c": pd.Series([], dtype=np.int64),
                              "kp2": pd.Series([], dtype=np.int64)})
        if len(p) == 0:
            return empty
        if s.max() >= 2 ** 31:
            raise ValueError("suppkey exceeds 32-bit pack range")
        new = np.concatenate(([True], p[1:] != p[:-1]))
        seg_start = np.flatnonzero(new)
        seg_len = np.diff(np.concatenate((seg_start, [len(p)])))
        keys = []
        for d in np.unique(seg_len):
            if d < 2:
                continue
            starts = seg_start[seg_len == d]
            mat = s[starts[:, None] + np.arange(int(d))[None, :]]
            ii, jj = np.triu_indices(int(d), 1)
            keys.append((mat[:, ii].ravel() << 32) | mat[:, jj].ravel())
        if not keys:
            return empty
        key = np.concatenate(keys)
        uk, inv = np.unique(key, return_counts=True)
        kp2 = (_splitmix64(uk).view(np.uint64)
               % np.uint64(n_parts)).astype(np.int64)
        return pd.DataFrame({"key": uk, "c": inv.astype(np.int64),
                             "kp2": kp2})

    def edge_fold(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("key", sort=False)["c"].sum()
        key = tot.index.to_numpy(np.int64)
        key = key[tot.to_numpy(np.int64) >= 2]  # edge = >= 2 shared parts
        return pd.DataFrame({"s1": key >> 32,
                             "s2": key & np.int64(0xFFFFFFFF)})

    edges = (ds.map_batches(distinct_block, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("kp").map_groups(pairs_part, batch_format="pandas")
             .groupby("kp2").map_groups(edge_fold, batch_format="pandas")
             .materialize())
    n_edges = edges.count()

    if n_edges <= _KCORE_DRIVER_LIMIT:
        tabs = list(edges.iter_batches(batch_format="pyarrow"))
        et = pa.concat_tables(tabs) if tabs else pa.table(
            {"s1": pa.array([], pa.int64()), "s2": pa.array([], pa.int64())})
        s1 = et["s1"].to_numpy(zero_copy_only=False).astype(np.int64)
        s2 = et["s2"].to_numpy(zero_copy_only=False).astype(np.int64)
        alive = _peel_rounds(s1, s2, k)
        nodes = np.concatenate((s1[alive], s2[alive]))
    else:
        ed = edges
        while True:
            # per-block degree bincount partials -> bounded driver fold
            def deg_part(b: pa.Table) -> pa.Table:
                ns = np.concatenate(
                    (b["s1"].to_numpy(zero_copy_only=False),
                     b["s2"].to_numpy(zero_copy_only=False)))
                u, c = np.unique(ns, return_counts=True)
                return pa.table({"s": pa.array(u.astype(np.int64)),
                                 "d": pa.array(c.astype(np.int64))})

            deg: dict[int, int] = {}
            for b in ed.map_batches(deg_part, batch_format="pyarrow") \
                       .iter_batches(batch_format="pyarrow"):
                for s_, d_ in zip(b["s"].to_pylist(), b["d"].to_pylist()):
                    deg[int(s_)] = deg.get(int(s_), 0) + int(d_)
            bad = np.array(sorted(s_ for s_, d_ in deg.items() if d_ < k),
                           dtype=np.int64)
            if len(bad) == 0:
                break
            bad_ref = ray.put(bad)

            def drop(b: pa.Table) -> pa.Table:
                import ray as _r

                ba = _r.get(bad_ref)
                a1 = b["s1"].to_numpy(zero_copy_only=False)
                a2 = b["s2"].to_numpy(zero_copy_only=False)
                keep = ~(np.isin(a1, ba) | np.isin(a2, ba))
                return b.filter(pa.array(keep))

            ed = ed.map_batches(drop, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
        tabs = list(ed.iter_batches(batch_format="pyarrow"))
        et = pa.concat_tables(tabs) if tabs else pa.table(
            {"s1": pa.array([], pa.int64()), "s2": pa.array([], pa.int64())})
        nodes = np.concatenate(
            (et["s1"].to_numpy(zero_copy_only=False),
             et["s2"].to_numpy(zero_copy_only=False))).astype(np.int64)

    if len(nodes) == 0:
        return pa.table({"s": pa.array([], pa.int64()),
                         "core_deg": pa.array([], pa.int64())})
    u, c = np.unique(nodes, return_counts=True)
    return pa.table({"s": pa.array(u.astype(np.int64)),
                     "core_deg": pa.array(c.astype(np.int64))})


# =====================================================================
# CUPED variance-reduced A/B readout
# =====================================================================

def q_cuped_adjust(sf_dir: str):
    """CUPED-adjusted experiment readout (Deng et al. 2013): users split
    into two arms by md5(user_id) % 2, pre-period spend (first half of
    the time range) is the covariate, post-period spend the metric;
    theta = cov(X,Y)/var(X) pooled, and each arm reports its raw and
    adjusted mean - the variance-reduction step every experimentation
    platform runs before the t-test. ONE Min/Max fold fixes the
    midpoint; per-user (x, y) cent sums derive inside one user-hash
    exchange whose partitions emit 5 int64 moment partials per arm
    (python-int == HUGEINT on the driver fold); theta and the adjusted
    means use the IDENTICAL IEEE expression both sides, 6 dp, in cents
    (no /100 - one fewer float op)."""
    import hashlib

    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    lim = ds.aggregate(Min("ts"), Max("ts"))
    lo = int(pd.Timestamp(lim["min(ts)"]).value // 1000)
    hi = int(pd.Timestamp(lim["max(ts)"]).value // 1000)
    mid = lo + (hi - lo) // 2

    def prep(b: pa.Table) -> pa.Table:
        late = pc.greater(b["ts"].cast(pa.int64()),
                          pa.scalar(mid, pa.int64()))
        cents = _cents(b["value"])
        zero = pa.scalar(0, pa.int64())
        t = pa.table({
            "user_id": b["user_id"],
            "x": pc.if_else(late, zero, cents),
            "y": pc.if_else(late, cents, zero),
        })
        g = t.group_by("user_id").aggregate([("x", "sum"), ("y", "sum")])
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return g.rename_columns(["user_id", "x", "y"]) \
            .append_column("kp", pa.array(kp))

    def arm_moments(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("user_id", sort=False)[["x", "y"]].sum()
        users = t.index.to_numpy(np.int64)
        x = t["x"].to_numpy(np.int64).astype(object)
        y = t["y"].to_numpy(np.int64).astype(object)
        arm = np.fromiter(
            (int(hashlib.md5(str(int(u)).encode()).hexdigest()[:8], 16) % 2
             for u in users), dtype=np.int64, count=len(users))
        rows = []
        for a in (0, 1):
            m = arm == a
            if not m.any():
                continue
            rows.append((a, int(m.sum()), int(x[m].sum()), int(y[m].sum()),
                         int((x[m] * x[m]).sum()),
                         int((x[m] * y[m]).sum())))
        return pd.DataFrame(rows, columns=["arm", "n", "sx", "sy",
                                           "sxx", "sxy"]) \
            .astype({"arm": np.int64, "n": np.int64, "sx": np.int64,
                     "sy": np.int64, "sxx": np.int64, "sxy": np.int64})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(arm_moments, batch_format="pandas")
           .groupby("arm")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("sxy", alias_name="sxy")))
    df = agg.to_pandas().sort_values("arm", ignore_index=True)
    n = int(df["n"].sum())
    sx = int(df["sx"].sum())
    sy = int(df["sy"].sum())
    sxx = int(df["sxx"].sum())
    sxy = int(df["sxy"].sum())
    theta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    gx = float(sx) / float(n)
    rows = {"arm": [], "n_users": [], "mean_y": [], "mean_y_adj": []}
    for _, r in df.iterrows():
        na, sxa, sya = int(r["n"]), int(r["sx"]), int(r["sy"])
        my = float(sya) / float(na)
        adj = my - theta * (float(sxa) / float(na) - gx)
        rows["arm"].append(int(r["arm"]))
        rows["n_users"].append(na)
        rows["mean_y"].append(np.round(my, 6))
        rows["mean_y_adj"].append(np.round(adj, 6))
    return pa.table({
        "arm": pa.array(rows["arm"], pa.int64()),
        "n_users": pa.array(rows["n_users"], pa.int64()),
        "mean_y": pa.array(rows["mean_y"], pa.float64()),
        "mean_y_adj": pa.array(rows["mean_y_adj"], pa.float64())})


SQL_CUPED_ADJUST = """
WITH lim AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
), u AS (
  SELECT user_id,
         SUM(CASE WHEN epoch_us(ts) > lim.lo + (lim.hi - lim.lo) // 2
                  THEN 0 ELSE CAST(ROUND(value * 100) AS BIGINT) END)
           AS x,
         SUM(CASE WHEN epoch_us(ts) > lim.lo + (lim.hi - lim.lo) // 2
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
           AS y
  FROM events, lim GROUP BY user_id, lim.lo, lim.hi
), a AS (
  SELECT CAST(CONCAT('0x', SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 2 AS arm,
         CAST(x AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
  FROM u
), pool AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM a
), t AS (
  SELECT CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS gx
  FROM pool
), g AS (
  SELECT arm, CAST(COUNT(*) AS HUGEINT) AS na,
         SUM(x) AS sxa, SUM(y) AS sya
  FROM a GROUP BY 1
)
SELECT arm, CAST(na AS BIGINT) AS n_users,
       ROUND(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE), 6) AS mean_y,
       ROUND(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
             - t.theta * (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)
                          - t.gx), 6) AS mean_y_adj
FROM g, t
"""


# =====================================================================
# two-proportion z-test (conversion-rate A/B)
# =====================================================================

def q_prop_ztest(sf_dir: str):
    """Two-proportion z-test on conversion rates: users split into two
    arms by md5(user_id) % 2, converted = fired >= 1 high-value
    purchase (value > 150 - non-degenerate at every test scale, since
    EVERY user purchases at least once in this data);
    z = (p0 - p1) / sqrt(p(1-p)(1/n0 + 1/n1)) with the POOLED
    proportion - the first readout of every A/B dashboard (cuped_adjust
    and welch_ttest's binary-metric sibling). ONE user-hash exchange;
    each partition emits (arm, users, conversions) int partials; the
    z finale is ONE identical IEEE expression on the 2-row driver fold,
    6 dp."""
    import hashlib

    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": b["user_id"],
            "conv": pc.and_(
                pc.equal(b["event_type"], pa.scalar("purchase")),
                pc.greater(b["value"], pa.scalar(150.0))).cast(pa.int64()),
        })
        g = t.group_by("user_id").aggregate([("conv", "max")])
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return g.rename_columns(["user_id", "conv"]) \
            .append_column("kp", pa.array(kp))

    def arm_fold(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("user_id", sort=False)["conv"].max()
        users = t.index.to_numpy(np.int64)
        conv = t.to_numpy(np.int64)
        arm = np.fromiter(
            (int(hashlib.md5(str(int(u)).encode()).hexdigest()[:8], 16) % 2
             for u in users), dtype=np.int64, count=len(users))
        out = pd.DataFrame({"arm": arm, "n": 1, "c": conv}) \
            .groupby("arm", sort=False).sum().reset_index()
        return out.astype({"arm": np.int64, "n": np.int64, "c": np.int64})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(arm_fold, batch_format="pandas")
           .groupby("arm")
           .aggregate(Sum("n", alias_name="n"), Sum("c", alias_name="c")))
    df = agg.to_pandas().sort_values("arm", ignore_index=True)
    if len(df) != 2 or list(df["arm"]) != [0, 1]:
        raise ValueError(
            "degenerate arm split: two-proportion z-test needs both "
            "md5 arms non-empty, got arms=%s" % list(df["arm"]))
    n0, c0 = int(df["n"][0]), int(df["c"][0])
    n1, c1 = int(df["n"][1]), int(df["c"][1])
    p0 = float(c0) / float(n0)
    p1 = float(c1) / float(n1)
    pp = float(c0 + c1) / float(n0 + n1)
    z = (p0 - p1) / math.sqrt(pp * (1.0 - pp)
                              * (1.0 / float(n0) + 1.0 / float(n1)))
    return pa.table({
        "n0": pa.array([n0], pa.int64()), "c0": pa.array([c0], pa.int64()),
        "n1": pa.array([n1], pa.int64()), "c1": pa.array([c1], pa.int64()),
        "z": pa.array([np.round(z, 6)], pa.float64())})


SQL_PROP_ZTEST = """
WITH u AS (
  SELECT user_id,
         CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
                       THEN 1 ELSE 0 END)
              AS BIGINT) AS conv
  FROM events GROUP BY 1
), a AS (
  SELECT CAST(CONCAT('0x', SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 2 AS arm, conv
  FROM u
), g AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(conv) AS BIGINT) AS c
  FROM a GROUP BY 1
), w AS (
  SELECT
    MAX(CASE WHEN arm = 0 THEN n END) AS n0,
    MAX(CASE WHEN arm = 0 THEN c END) AS c0,
    MAX(CASE WHEN arm = 1 THEN n END) AS n1,
    MAX(CASE WHEN arm = 1 THEN c END) AS c1
  FROM g
)
SELECT n0, c0, n1, c1,
  ROUND((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
         - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        / SQRT((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
               * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
               * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))),
        6) AS z
FROM w
"""


# =====================================================================
# sessionized bounce rate by entry event type
# =====================================================================

def q_bounce_rate(sf_dir: str):
    """Bounce rate by session ENTRY type: sessions (30-min inactivity
    gaps) that end after a single event, grouped by their first event -
    the engagement readout next to sessionize (which counts sessions)
    and funnel (which orders milestones). ONE user-hash exchange; each
    partition sorts its users' events once ((ts, event_id) total
    order), derives session boundaries and first-event types from
    vectorized diffs/boundary gathers, and emits <= |types| (entry,
    sessions, bounces) partials; exact integer ratio until one
    division, 6 dp."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    gap_us = 1_800_000_000
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "kp": pa.array(kp),
        })

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        new = np.ones(len(g), bool)
        if len(g) > 1:
            new[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(new)
        lens = np.diff(np.concatenate((starts, [len(g)])))
        entry = g["event_type"].to_numpy()[starts]
        out = pd.DataFrame({"event_type": entry,
                            "n_sessions": 1,
                            "n_bounces": (lens == 1).astype(np.int64)})
        agg = out.groupby("event_type", sort=False).sum().reset_index()
        return agg.astype({"n_sessions": np.int64, "n_bounces": np.int64})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(sessions, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("n_sessions", alias_name="n_sessions"),
                      Sum("n_bounces", alias_name="n_bounces")))
    df = agg.to_pandas().sort_values("event_type", ignore_index=True)
    ns = df["n_sessions"].to_numpy(np.int64)
    nb = df["n_bounces"].to_numpy(np.int64)
    return pa.table({
        "event_type": pa.array(df["event_type"], pa.string()),
        "n_sessions": pa.array(ns),
        "n_bounces": pa.array(nb),
        "bounce_rate": pa.array(
            np.round(nb.astype(np.float64) / ns.astype(np.float64), 6))})


SQL_BOUNCE_RATE = """
WITH base AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS tu,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                   OR LAG(epoch_us(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), sid AS (
  SELECT user_id, event_type, event_id, tu,
         SUM(new) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS s
  FROM base
), f AS (
  SELECT user_id, s,
         FIRST_VALUE(event_type) OVER (
           PARTITION BY user_id, s ORDER BY tu, event_id) AS entry,
         COUNT(*) OVER (PARTITION BY user_id, s) AS n
  FROM sid
), d AS (
  SELECT DISTINCT user_id, s, entry, n FROM f
)
SELECT entry AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
FROM d GROUP BY 1
"""


# =====================================================================
# conditional entropy of the event Markov chain
# =====================================================================

def q_markov_entropy(sf_dir: str):
    """Conditional entropy H(next | current) of the event-type Markov
    chain in nats - how predictable the next user action is given the
    current one (0 = deterministic journeys; ln|types| = uniform
    chaos); the single-number summary of markov_transitions that a
    journey-model dashboard alarms on. Same one-user-exchange pair
    derivation (vectorized lexsort + shift, bincount partials);
    H = sum (c_xy/n) ln(c_x/c_xy) folds on the <=|types|^2 driver rows
    in SORTED (cur, nxt) order - exact integer ratios inside every ln,
    6 dp both sides."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "kp": pa.array(kp),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        types, codes = np.unique(g["event_type"].to_numpy(object),
                                 return_inverse=True)
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], codes[order]
        same = u[:-1] == u[1:]
        cur, nxt = c[:-1][same], c[1:][same]
        k = len(types)
        cnt = np.bincount(cur * k + nxt, minlength=k * k)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({
            "cur": types[nz // k],
            "nxt": types[nz % k],
            "n": cnt[nz].astype(np.int64),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(pairs, batch_format="pandas")
           .groupby(["cur", "nxt"])
           .aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas()  # <= |types|^2 rows - bounded fold
    df = df.sort_values(["cur", "nxt"], ignore_index=True)
    n = int(df["n"].sum())
    cx = df.groupby("cur")["n"].sum().to_dict()
    h = 0.0
    for cur, c in zip(df["cur"], df["n"]):  # sorted (cur, nxt) order
        c = int(c)
        h = h + (float(c) / float(n)) * math.log(
            float(int(cx[cur])) / float(c))
    return pa.table({
        "n_transitions": pa.array([n], pa.int64()),
        "h": pa.array([np.round(h, 6)], pa.float64())})


SQL_MARKOV_ENTROPY = """
WITH s AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
), c AS (
  SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
), r AS (
  SELECT cur, CAST(SUM(n) AS BIGINT) AS cx FROM c GROUP BY 1
), t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n FROM c
)
SELECT t.n AS n_transitions,
       ROUND(SUM((CAST(c.n AS DOUBLE) / CAST(t.n AS DOUBLE))
                 * LN(CAST(r.cx AS DOUBLE) / CAST(c.n AS DOUBLE))
                 ORDER BY c.cur, c.nxt), 6) AS h
FROM c JOIN r USING (cur) CROSS JOIN t
GROUP BY t.n
"""


# =====================================================================
# population stability index (distribution drift per event type)
# =====================================================================

def q_psi_drift(sf_dir: str):
    """Population Stability Index of the VALUE distribution per event
    type, first half vs second half of the time range - the standard
    model-monitoring drift score (PSI < 0.1 stable, > 0.25 act): 10
    fixed 50-dollar bins over cents, PSI = sum (p_b - q_b) ln(p_b/q_b)
    over bins populated in BOTH halves (the standard zero-bin skip,
    mirrored in the oracle's filter). ONE Min/Max fold fixes the
    midpoint; (type, half, bin) counts ride a <=|types|x2x11 exchange
    of per-block Arrow partials; every ratio inside ln is an exact
    integer cross product; terms sum in ascending bin order, 6 dp."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    lim = ds.aggregate(Min("ts"), Max("ts"))
    lo = int(pd.Timestamp(lim["min(ts)"]).value // 1000)
    hi = int(pd.Timestamp(lim["max(ts)"]).value // 1000)
    mid = lo + (hi - lo) // 2
    width = 5000  # cents: 10 x $50 bins, clamped top

    def prep(b: pa.Table) -> pa.Table:
        cents = _cents(b["value"])
        bin_ = pc.min_element_wise(
            pc.divide(cents, pa.scalar(width, pa.int64())).cast(pa.int64()),
            pa.scalar(9, pa.int64()))
        t = pa.table({
            "event_type": b["event_type"],
            "late": pc.greater(b["ts"].cast(pa.int64()),
                               pa.scalar(mid, pa.int64())).cast(pa.int64()),
            "bin": bin_,
        })
        g = t.group_by(["event_type", "late", "bin"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "late", "bin", "n"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["event_type", "late", "bin"])
           .aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas()  # <= |types| x 2 x 10 rows - bounded fold
    out = {"event_type": [], "psi": []}
    for et, g in df.groupby("event_type", sort=True):
        n1 = int(g.loc[g["late"] == 0, "n"].sum())
        n2 = int(g.loc[g["late"] == 1, "n"].sum())
        c1 = {int(b_): int(v) for b_, v in
              zip(g.loc[g["late"] == 0, "bin"], g.loc[g["late"] == 0, "n"])}
        c2 = {int(b_): int(v) for b_, v in
              zip(g.loc[g["late"] == 1, "bin"], g.loc[g["late"] == 1, "n"])}
        psi = 0.0
        for b_ in range(10):  # ascending bin order - deterministic sum
            a, c = c1.get(b_, 0), c2.get(b_, 0)
            if a == 0 or c == 0:
                continue  # standard zero-bin skip, mirrored in SQL
            psi = psi + (float(a * n2 - c * n1) / float(n1 * n2)) \
                * math.log(float(a * n2) / float(c * n1))
        out["event_type"].append(et)
        out["psi"].append(np.round(psi, 6))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "psi": pa.array(out["psi"], pa.float64())})


SQL_PSI_DRIFT = """
WITH lim AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
), x AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) > lim.lo + (lim.hi - lim.lo) // 2
              THEN 1 ELSE 0 END AS late,
         LEAST(CAST(ROUND(value * 100) AS BIGINT) // 5000, 9) AS bin
  FROM events, lim
), c AS (
  SELECT event_type, late, bin, CAST(COUNT(*) AS BIGINT) AS n
  FROM x GROUP BY 1, 2, 3
), tot AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN late = 0 THEN n ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN late = 1 THEN n ELSE 0 END) AS BIGINT) AS n2
  FROM c GROUP BY 1
), pv AS (
  SELECT c.event_type, c.bin,
         CAST(SUM(CASE WHEN late = 0 THEN n ELSE 0 END) AS HUGEINT) AS a,
         CAST(SUM(CASE WHEN late = 1 THEN n ELSE 0 END) AS HUGEINT) AS b
  FROM c GROUP BY 1, 2
)
SELECT pv.event_type,
       ROUND(COALESCE(SUM(
         CASE WHEN pv.a > 0 AND pv.b > 0 THEN
           (CAST(pv.a * tot.n2 - pv.b * tot.n1 AS DOUBLE)
            / CAST(tot.n1 * tot.n2 AS DOUBLE))
           * LN(CAST(pv.a * tot.n2 AS DOUBLE)
                / CAST(pv.b * tot.n1 AS DOUBLE))
         END ORDER BY pv.bin), 0.0), 6) AS psi
FROM pv JOIN tot USING (event_type)
GROUP BY 1
"""


# =====================================================================
# last-touch attribution (first_touch's mirror)
# =====================================================================

def q_last_touch(sf_dir: str):
    """LAST-TOUCH attribution: each user's lifetime purchase revenue
    credited to the type of their LAST non-purchase event before (or
    at) their final purchase - first_touch's mirror, completing the
    attribution pair every marketing pipeline compares. Same scale
    shape: ONE user-hash exchange, per-user argmax-(ts, event_id) over
    the user-local rows, distributive <=|types| finale. Users with no
    non-purchase touch before their last purchase credit 'direct' on
    both sides. Ordering is TRUE (ts, event_id) lexicographic on BOTH
    sides (the oracle uses ROW_NUMBER tuple ordering, not a packed
    ts*K+event_id key, so no event_id bound is assumed at any scale)."""
    ds = _t(sf_dir, "events",
            ["user_id", "event_id", "ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        cents = _cents(b["value"])
        is_p = pc.equal(b["event_type"], pa.scalar("purchase"))
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "ts": b["ts"].cast(pa.int64()),
            "event_type": b["event_type"],
            "cents": pc.if_else(is_p, cents, pa.scalar(0, pa.int64())),
        })

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy()
        cents = int(g["cents"].to_numpy().sum())
        is_p = et == "purchase"
        if not is_p.any():
            return pd.DataFrame({"last_type": pd.Series([], dtype=object),
                                 "cents": pd.Series([], dtype=np.int64)})
        order = np.lexsort((eid, ts))
        last_p = order[is_p[order]][-1]
        cut_ts, cut_eid = ts[last_p], eid[last_p]
        before = (~is_p) & ((ts < cut_ts)
                            | ((ts == cut_ts) & (eid < cut_eid)))
        if before.any():
            cand = order[before[order]][-1]
            lt = et[cand]
        else:
            lt = "direct"
        return pd.DataFrame({"last_type": [lt],
                             "cents": np.array([cents], np.int64)})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("user_id").map_groups(per_user, batch_format="pandas")
           .groupby("last_type")
           .aggregate(Count(alias_name="users"),
                      Sum("cents", alias_name="cents")))

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "last_type": b["last_type"],
            "users": b["users"],
            "revenue": pc.divide(b["cents"].cast(pa.float64()),
                                 pa.scalar(100.0)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_LAST_TOUCH = """
WITH pu AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value * 100) AS BIGINT)
                  ELSE 0 END) AS cents
  FROM events GROUP BY 1
  HAVING SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
), lp AS (
  SELECT user_id, epoch_us(ts) AS cut_tu, event_id AS cut_eid,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
), cut AS (
  SELECT user_id, cut_tu, cut_eid FROM lp WHERE rn = 1
), t AS (
  SELECT e.user_id, e.event_type, epoch_us(e.ts) AS tu, e.event_id
  FROM events e JOIN cut USING (user_id)
  WHERE e.event_type <> 'purchase'
    AND (epoch_us(e.ts) < cut.cut_tu
         OR (epoch_us(e.ts) = cut.cut_tu AND e.event_id < cut.cut_eid))
), lt AS (
  SELECT user_id, event_type AS last_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY tu DESC, event_id DESC) AS rn
  FROM t
), j AS (
  SELECT pu.user_id, COALESCE(lt.last_type, 'direct') AS last_type,
         pu.cents
  FROM pu LEFT JOIN lt ON lt.user_id = pu.user_id AND lt.rn = 1
)
SELECT last_type, CAST(COUNT(*) AS BIGINT) AS users,
       CAST(CAST(SUM(cents) AS DOUBLE) / 100.0 AS DOUBLE) AS revenue
FROM j GROUP BY 1
"""


# =====================================================================
# equi-depth histogram via rank selection (no sort, no shuffle)
# =====================================================================

def q_equidepth_hist(sf_dir: str):
    """Equi-DEPTH decile histogram of event values: bucket b holds rows
    with rank r in (floor(b*n/10), floor((b+1)*n/10)] under the total
    order (value, then arbitrary among equal values - bucket COUNTS and
    VALUE BOUNDS are tie-invariant), with each bucket's (n, lo, hi) -
    histogram's equi-depth sibling, the quantile summary an optimizer's
    statistics collector stores. ZERO sort and zero row shuffle: value
    cents live in a bounded domain, so per-block bincount partials fold
    to ONE cumulative count vector on the driver (the winsorized_mean
    shape) and every bucket boundary is a searchsorted rank lookup;
    the oracle pays the full ROW_NUMBER sort instead."""
    ds = _t(sf_dir, "events", ["value"])

    def prep(b: pa.Table) -> pa.Table:
        c = _cents(b["value"]).to_numpy(zero_copy_only=False)
        u, cnt = np.unique(c, return_counts=True)
        return pa.table({"vc": pa.array(u.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("vc")
           .aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas()  # <= |distinct cents| rows - bounded fold
    df = df.sort_values("vc", ignore_index=True)
    vc = df["vc"].to_numpy(np.int64)
    cum = np.cumsum(df["n"].to_numpy(np.int64))
    n = int(cum[-1])
    rows = {"bucket": [], "n": [], "lo": [], "hi": []}
    for b_ in range(10):
        r_lo = (b_ * n) // 10 + 1          # first rank in bucket
        r_hi = ((b_ + 1) * n) // 10        # last rank in bucket
        if r_hi < r_lo:
            continue
        i_lo = int(np.searchsorted(cum, r_lo))
        i_hi = int(np.searchsorted(cum, r_hi))
        rows["bucket"].append(b_)
        rows["n"].append(r_hi - r_lo + 1)
        rows["lo"].append(int(vc[i_lo]))
        rows["hi"].append(int(vc[i_hi]))
    return pa.table({
        "bucket": pa.array(rows["bucket"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64()),
        "lo": pa.array(rows["lo"], pa.int64()),
        "hi": pa.array(rows["hi"], pa.int64())})


SQL_EQUIDEPTH_HIST = """
WITH v AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events
), r AS (
  SELECT vc, ROW_NUMBER() OVER (ORDER BY vc) AS rn,
         COUNT(*) OVER () AS n
  FROM v
)
SELECT CAST((rn * 10 - 1) // n AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(vc) AS BIGINT) AS lo,
       CAST(MAX(vc) AS BIGINT) AS hi
FROM r GROUP BY 1
"""


# =====================================================================
# top growth customers (period-over-period, exact integer filter)
# =====================================================================

def q_top_growth_customers(sf_dir: str):
    """Customers whose second-half spend MORE THAN DOUBLED their
    first-half spend, top-20 by the exact integer growth margin
    s2 - 2*s1 - topk_movers at customer grain, the expansion-account
    list a sales dashboard keeps. ONE Min/Max fold fixes the midpoint;
    per-block (cust, half) cent partials ride a custkey-hash exchange
    whose partitions fold, filter (s1 > 0 AND s2 > 2*s1 - all int64)
    and emit partial top-20s under the total order (margin DESC, cust
    ASC); the driver merges <=20 x partitions rows. A Ray hash
    Aggregate over the ~|customers| groups is avoided (the
    join_cardinality lesson)."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    lim = ds.aggregate(Min("o_orderdate"), Max("o_orderdate"))
    lo = int(pd.Timestamp(lim["min(o_orderdate)"]).value // 1000)
    hi = int(pd.Timestamp(lim["max(o_orderdate)"]).value // 1000)
    mid = lo + (hi - lo) // 2

    def prep(b: pa.Table) -> pa.Table:
        cents = _cents(b["o_totalprice"])
        late = pc.greater(b["o_orderdate"].cast(pa.int64()),
                          pa.scalar(mid, pa.int64()))
        zero = pa.scalar(0, pa.int64())
        t = pa.table({
            "cust": b["o_custkey"],
            "s1": pc.if_else(late, zero, cents),
            "s2": pc.if_else(late, cents, zero),
        })
        g = t.group_by("cust").aggregate([("s1", "sum"), ("s2", "sum")])
        c = g["cust"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(c).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return g.rename_columns(["cust", "s1", "s2"]) \
            .append_column("kp", pa.array(kp))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("cust", sort=False)[["s1", "s2"]].sum()
        cust = t.index.to_numpy(np.int64)
        s1 = t["s1"].to_numpy(np.int64)
        s2 = t["s2"].to_numpy(np.int64)
        m = (s1 > 0) & (s2 > 2 * s1)
        cust, s1, s2 = cust[m], s1[m], s2[m]
        margin = s2 - 2 * s1
        order = np.lexsort((cust, -margin))[:20]
        return pd.DataFrame({"cust": cust[order], "s1": s1[order],
                             "s2": s2[order], "margin": margin[order]})

    top = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas"))
    parts = list(top.iter_batches(batch_format="pyarrow"))
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"cust": pa.array([], pa.int64()), "s1": pa.array([], pa.int64()),
         "s2": pa.array([], pa.int64()),
         "margin": pa.array([], pa.int64())})
    df = merged.to_pandas()
    order = np.lexsort((df["cust"].to_numpy(np.int64),
                        -df["margin"].to_numpy(np.int64)))[:20]
    out = df.iloc[order].reset_index(drop=True)
    return pa.table({
        "cust": pa.array(out["cust"].to_numpy(np.int64)),
        "s1": pa.array(out["s1"].to_numpy(np.int64)),
        "s2": pa.array(out["s2"].to_numpy(np.int64)),
        "margin": pa.array(out["margin"].to_numpy(np.int64))})


SQL_TOP_GROWTH_CUSTOMERS = """
WITH lim AS (
  SELECT MIN(epoch_us(o_orderdate)) AS lo,
         MAX(epoch_us(o_orderdate)) AS hi
  FROM orders
), u AS (
  SELECT o_custkey AS cust,
         SUM(CASE WHEN epoch_us(o_orderdate)
                       > lim.lo + (lim.hi - lim.lo) // 2
                  THEN 0 ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT)
             END) AS s1,
         SUM(CASE WHEN epoch_us(o_orderdate)
                       > lim.lo + (lim.hi - lim.lo) // 2
                  THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0
             END) AS s2
  FROM orders, lim GROUP BY cust, lim.lo, lim.hi
)
SELECT cust, CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
       CAST(s2 - 2 * s1 AS BIGINT) AS margin
FROM u WHERE s1 > 0 AND s2 > 2 * s1
ORDER BY margin DESC, cust
LIMIT 20
"""


# =====================================================================
# median inter-purchase gap (bounded-domain selection, no sort)
# =====================================================================

def q_purchase_gap_median(sf_dir: str):
    """Median days between a user's consecutive purchases - the
    repurchase-cadence number a lifecycle team tracks (crawl twin: the
    revisit interval distribution behind adaptive scheduling). Gaps
    derive inside ONE user-hash exchange (per-user sort, vectorized
    diff, integer floor-div to days); the DAY-GAP DOMAIN IS BOUNDED
    (<= the corpus time span), so the median needs no sort: per-
    partition gap bincounts fold through a <= #distinct-gaps exchange
    and the driver selects the exact lower/upper middle order
    statistics from one cumsum, reporting the identical (lo+hi)/2
    both sides (dyadic - rounding is a no-op)."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    day_us = 86_400_000_000
    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
        filter=pads.field("event_type") == "purchase")

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "kp": pa.array(kp),
        })

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        if len(g) < 2:
            return pd.DataFrame({"gap": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        same = uid[1:] == uid[:-1]
        gap = (ts[1:] - ts[:-1])[same] // day_us
        u, c = np.unique(gap, return_counts=True)
        return pd.DataFrame({"gap": u.astype(np.int64),
                             "n": c.astype(np.int64)})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(gaps, batch_format="pandas")
           .groupby("gap").aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas().sort_values("gap", ignore_index=True)
    gap = df["gap"].to_numpy(np.int64)
    cum = np.cumsum(df["n"].to_numpy(np.int64))
    m = int(cum[-1])
    lo = int(gap[np.searchsorted(cum, (m - 1) // 2 + 1)])
    hi = int(gap[np.searchsorted(cum, m // 2 + 1)])
    return pa.table({
        "n_gaps": pa.array([m], pa.int64()),
        "med_days": pa.array([(float(lo) + float(hi)) / 2.0],
                             pa.float64())})


SQL_PURCHASE_GAP_MEDIAN = """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id
  FROM events WHERE event_type = 'purchase'
), g AS (
  SELECT (tu - LAG(tu) OVER (PARTITION BY user_id
                             ORDER BY tu, event_id)) // 86400000000
           AS gap
  FROM p
), gg AS (
  SELECT gap FROM g WHERE gap IS NOT NULL
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m FROM gg
), r AS (
  SELECT gap, ROW_NUMBER() OVER (ORDER BY gap) AS rn FROM gg
), lo AS (
  SELECT gap FROM r, m WHERE rn = (m.m - 1) // 2 + 1
), hi AS (
  SELECT gap FROM r, m WHERE rn = m.m // 2 + 1
)
SELECT m.m AS n_gaps,
       (CAST(lo.gap AS DOUBLE) + CAST(hi.gap AS DOUBLE)) / 2.0
         AS med_days
FROM m, lo, hi
"""


# =====================================================================
# Herfindahl-Hirschman supplier concentration per nation
# =====================================================================

def q_hhi_concentration(sf_dir: str):
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation - HHI = sum of squared market shares, the antitrust-style
    single-vendor-risk score (gini_concentration's squared-share
    sibling; crawl twin: is one host dominating a source's pages).
    Lineitem folds to per-supplier cent sums (supplier is a DIMENSION -
    the groupby is bounded by |supps|); the supplier->nation map is a
    bounded broadcast read; HHI = sum c_i^2 / (sum c_i)^2 runs in exact
    python ints (HUGEINT mirror) on the <=|supps| driver rows - squares
    of int sums commute, so no ordering discipline is even needed; one
    division, 6 dp."""
    sup = rd.read_parquet(os.path.join(sf_dir, "supplier.parquet"),
                          columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s2n = dict(zip(sup["s_suppkey"].astype(np.int64),
                   sup["s_nationkey"].astype(np.int64)))

    ds = _t(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "s": b["l_suppkey"],
            "c": _cents(b["l_extendedprice"]),
        })
        g = t.group_by("s").aggregate([("c", "sum")])
        return g.rename_columns(["s", "c"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("s")
           .aggregate(Sum("c", alias_name="c")))
    df = agg.to_pandas()  # <= |supps| rows - bounded dimension fold
    df["nation"] = df["s"].map(s2n).astype(np.int64)
    rows = {"nation": [], "n_suppliers": [], "hhi": []}
    for nk, g in df.groupby("nation", sort=True):
        c = [int(v) for v in g["c"]]
        tot = sum(c)
        num = sum(v * v for v in c)
        rows["nation"].append(int(nk))
        rows["n_suppliers"].append(len(c))
        rows["hhi"].append(np.round(float(num) / float(tot * tot), 6))
    return pa.table({
        "nation": pa.array(rows["nation"], pa.int64()),
        "n_suppliers": pa.array(rows["n_suppliers"], pa.int64()),
        "hhi": pa.array(rows["hhi"], pa.float64())})


SQL_HHI_CONCENTRATION = """
WITH r AS (
  SELECT s.s_nationkey AS nation, l.l_suppkey AS s,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
              AS HUGEINT) AS c
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       ROUND(CAST(SUM(c * c) AS DOUBLE)
             / CAST(SUM(c) * SUM(c) AS DOUBLE), 6) AS hhi
FROM r GROUP BY 1
"""


# =====================================================================
# order-to-ship lag stats per priority (fact-fact exchange + bounded
# domain median)
# =====================================================================

def q_ship_lag(sf_dir: str):
    """Order-to-ship latency per order priority: mean and MEDIAN lag in
    days - the fulfillment SLA readout, and the one fact-FACT shape
    (orders ⨝ lineitem both big) where the median usually forces a
    per-group sort. Not here: both tables tag through ONE orderkey-hash
    exchange (the temporal_join pattern); lag days are exact integers
    via a +10000-day offset before the floor-div (numpy FLOORS negative
    division, DuckDB // TRUNCATES - the offset makes every dividend
    positive so both agree; this data has negative lags); the DAY
    domain is bounded, so per-(priority, lagday) bincount partials fold
    through a tiny exchange and the driver selects exact medians from
    one cumsum per priority. Mean = exact int sums, one division,
    6 dp."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    day_us = 86_400_000_000
    off_days = 10_000

    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def prep_o(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(k).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "okey": b["o_orderkey"],
            "ts": b["o_orderdate"].cast(pa.int64()),
            "prio": b["o_orderpriority"],
            "side": pa.array(np.zeros(b.num_rows, np.int64)),
            "kp": pa.array(kp),
        })

    def prep_l(b: pa.Table) -> pa.Table:
        k = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(k).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "okey": b["l_orderkey"],
            "ts": b["l_shipdate"].cast(pa.int64()),
            "prio": pa.array([""] * b.num_rows, pa.string()),
            "side": pa.array(np.ones(b.num_rows, np.int64)),
            "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l_ = g[g["side"] == 1]
        omap = pd.Series(o["ts"].to_numpy(np.int64),
                         index=o["okey"].to_numpy(np.int64))
        pmap = pd.Series(o["prio"].to_numpy(object),
                         index=o["okey"].to_numpy(np.int64))
        lk = l_["okey"].to_numpy(np.int64)
        odate = omap.reindex(lk).to_numpy(np.int64)
        prio = pmap.reindex(lk).to_numpy(object)
        lag = (l_["ts"].to_numpy(np.int64) - odate
               + off_days * day_us) // day_us - off_days
        out = pd.DataFrame({"prio": prio, "lag": lag, "n": 1})
        agg = out.groupby(["prio", "lag"], sort=False)["n"].sum() \
            .reset_index()
        return agg.astype({"lag": np.int64, "n": np.int64})

    partials = (orders.map_batches(prep_o, batch_format="pyarrow",
                                   zero_copy_batch=True)
                .union(li.map_batches(prep_l, batch_format="pyarrow",
                                      zero_copy_batch=True))
                .groupby("kp").map_groups(fold, batch_format="pandas"))
    # bounded columnar driver fold: <= partitions x |prios| x #lag-days
    # skinny rows (a string-keyed Ray Aggregate here measured 40 s vs
    # <1 s for this concat+groupby at sf0.1)
    tabs = list(partials.iter_batches(batch_format="pyarrow"))
    df = (pa.concat_tables(tabs).to_pandas()
          .groupby(["prio", "lag"], sort=True)["n"].sum().reset_index())
    rows = {"prio": [], "n": [], "mean_days": [], "med_days": []}
    for prio, g in df.groupby("prio", sort=True):
        lag = g["lag"].to_numpy(np.int64)
        cnt = g["n"].to_numpy(np.int64)
        n = int(cnt.sum())
        s = int((lag.astype(object) * cnt.astype(object)).sum())
        cum = np.cumsum(cnt)
        lo = int(lag[np.searchsorted(cum, (n - 1) // 2 + 1)])
        hi = int(lag[np.searchsorted(cum, n // 2 + 1)])
        rows["prio"].append(prio)
        rows["n"].append(n)
        rows["mean_days"].append(np.round(float(s) / float(n), 6))
        rows["med_days"].append((float(lo) + float(hi)) / 2.0)
    return pa.table({
        "prio": pa.array(rows["prio"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "mean_days": pa.array(rows["mean_days"], pa.float64()),
        "med_days": pa.array(rows["med_days"], pa.float64())})


SQL_SHIP_LAG = """
WITH j AS (
  SELECT o.o_orderpriority AS prio,
         (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
          + 864000000000000) // 86400000000 - 10000 AS lag
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), m AS (
  SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(lag) AS HUGEINT) AS s
  FROM j GROUP BY 1
), r AS (
  SELECT prio, lag,
         ROW_NUMBER() OVER (PARTITION BY prio ORDER BY lag) AS rn
  FROM j
), lo AS (
  SELECT r.prio, r.lag FROM r JOIN m USING (prio)
  WHERE r.rn = (m.n - 1) // 2 + 1
), hi AS (
  SELECT r.prio, r.lag FROM r JOIN m USING (prio)
  WHERE r.rn = m.n // 2 + 1
)
SELECT m.prio, m.n,
       ROUND(CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE), 6) AS mean_days,
       (CAST(lo.lag AS DOUBLE) + CAST(hi.lag AS DOUBLE)) / 2.0
         AS med_days
FROM m JOIN lo USING (prio) JOIN hi USING (prio)
"""


# =====================================================================
# realized-vs-list price per brand (broadcast dimension join)
# =====================================================================

def q_brand_margin(sf_dir: str):
    """Per-brand pricing power: realized unit price (revenue / qty) and
    the realized-to-list ratio vs the part's retail price - the pricing
    dashboard's discount-depth readout. Part attributes (brand, retail
    cents) broadcast once via ray.put (dimension side - the
    revenue_by_nation shape); lineitem folds block-locally to exact
    int64 partials per brand (Σext_cents, Σqty, Σqty*retail_cents)
    through a <=|brands| exchange; two divisions per brand at the end,
    6 dp, every operand an exact integer until then."""
    import pyarrow.parquet as pq

    pt = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_brand", "p_retailprice"])
    pk = np.asarray(pt["p_partkey"], dtype=np.int64)
    brands, bcode = np.unique(np.asarray(pt["p_brand"], dtype=object),
                              return_inverse=True)
    retail = np.round(np.asarray(pt["p_retailprice"], dtype=np.float64)
                      * 100.0).astype(np.int64)
    lut_code = np.zeros(int(pk.max()) + 1, np.int64)
    lut_retail = np.zeros(int(pk.max()) + 1, np.int64)
    lut_code[pk] = bcode
    lut_retail[pk] = retail
    lut_ref = ray.put((lut_code, lut_retail, len(brands)))

    ds = _t(sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        import ray as _r

        code_lut, retail_lut, nb = _r.get(lut_ref)
        p = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ext = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        code = code_lut[p]
        listc = retail_lut[p] * qty
        s_ext = np.zeros(nb, np.int64)   # int64 partials - exact
        s_qty = np.zeros(nb, np.int64)
        s_lst = np.zeros(nb, np.int64)
        np.add.at(s_ext, code, ext)
        np.add.at(s_qty, code, qty)
        np.add.at(s_lst, code, listc)
        return pa.table({
            "code": pa.array(np.arange(nb, dtype=np.int64)),
            "ext": pa.array(s_ext),
            "qty": pa.array(s_qty),
            "lst": pa.array(s_lst),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("code")
           .aggregate(Sum("ext", alias_name="ext"),
                      Sum("qty", alias_name="qty"),
                      Sum("lst", alias_name="lst")))
    df = agg.to_pandas().sort_values("code", ignore_index=True)
    out = {"brand": [], "unit_price": [], "realized_ratio": []}
    for _, r in df.iterrows():
        ext, qty, lst = int(r["ext"]), int(r["qty"]), int(r["lst"])
        if qty == 0:
            # brand code present in the part LUT but touched by no
            # lineitem row: the oracle's inner join emits no such
            # brand, so neither do we (also avoids 0/0).
            continue
        out["brand"].append(str(brands[int(r["code"])]))
        out["unit_price"].append(np.round(float(ext) / float(qty), 6))
        out["realized_ratio"].append(np.round(float(ext) / float(lst), 6))
    return pa.table({
        "brand": pa.array(out["brand"], pa.string()),
        "unit_price": pa.array(out["unit_price"], pa.float64()),
        "realized_ratio": pa.array(out["realized_ratio"], pa.float64())})


SQL_BRAND_MARGIN = """
WITH j AS (
  SELECT p.p_brand AS brand,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS ext,
         CAST(ROUND(l.l_quantity) AS BIGINT) AS qty,
         CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
           * CAST(ROUND(l.l_quantity) AS BIGINT) AS lst
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), m AS (
  SELECT brand, CAST(SUM(ext) AS HUGEINT) AS ext,
         CAST(SUM(qty) AS HUGEINT) AS qty,
         CAST(SUM(lst) AS HUGEINT) AS lst
  FROM j GROUP BY 1
)
SELECT brand,
       ROUND(CAST(ext AS DOUBLE) / CAST(qty AS DOUBLE), 6) AS unit_price,
       ROUND(CAST(ext AS DOUBLE) / CAST(lst AS DOUBLE), 6)
         AS realized_ratio
FROM m
"""


ANALYTICS_QUERIES = {
    "brand_margin": (q_brand_margin, SQL_BRAND_MARGIN),
    "ship_lag": (q_ship_lag, SQL_SHIP_LAG),
    "hhi_concentration": (q_hhi_concentration, SQL_HHI_CONCENTRATION),
    "top_growth_customers": (q_top_growth_customers,
                             SQL_TOP_GROWTH_CUSTOMERS),
    "purchase_gap_median": (q_purchase_gap_median,
                            SQL_PURCHASE_GAP_MEDIAN),
    "last_touch": (q_last_touch, SQL_LAST_TOUCH),
    "equidepth_hist": (q_equidepth_hist, SQL_EQUIDEPTH_HIST),
    "markov_entropy": (q_markov_entropy, SQL_MARKOV_ENTROPY),
    "psi_drift": (q_psi_drift, SQL_PSI_DRIFT),
    "prop_ztest": (q_prop_ztest, SQL_PROP_ZTEST),
    "bounce_rate": (q_bounce_rate, SQL_BOUNCE_RATE),
    "cuped_adjust": (q_cuped_adjust, SQL_CUPED_ADJUST),
    "kcore": (q_kcore, None),
    "acf_lags": (q_acf_lags, SQL_ACF_LAGS),
    "json_agg_stats": (q_json_agg_stats, SQL_JSON_AGG_STATS),
    "dow_seasonality": (q_dow_seasonality, SQL_DOW_SEASONALITY),
    "group_kfold": (q_group_kfold, SQL_GROUP_KFOLD),
    "temperature_mix": (q_temperature_mix, SQL_TEMPERATURE_MIX),
    "adamic_adar": (q_adamic_adar, SQL_ADAMIC_ADAR),
    "ewma_smooth": (q_ewma_smooth, SQL_EWMA_SMOOTH),
    "mutual_info": (q_mutual_info, SQL_MUTUAL_INFO),
    "theil_sen": (q_theil_sen, SQL_THEIL_SEN),
    "jaccard_links": (q_jaccard_links, SQL_JACCARD_LINKS),
    "burst_flags": (q_burst_flags, SQL_BURST_FLAGS),
    "cusum_changepoint": (q_cusum_changepoint, SQL_CUSUM_CHANGEPOINT),
    "common_neighbors": (q_common_neighbors, SQL_COMMON_NEIGHBORS),
    "jarque_bera": (q_jarque_bera, SQL_JARQUE_BERA),
    "mann_kendall": (q_mann_kendall, SQL_MANN_KENDALL),
    "geometric_mean": (q_geometric_mean, SQL_GEOMETRIC_MEAN),
    "burstiness": (q_burstiness, SQL_BURSTINESS),
    "acf_lag1": (q_acf_lag1, SQL_ACF_LAG1),
    "kaplan_meier": (q_kaplan_meier, SQL_KAPLAN_MEIER),
    "ndcg": (q_ndcg, SQL_NDCG),
    "quantile_map": (q_quantile_map, SQL_QUANTILE_MAP),
    "winsorized_mean": (q_winsorized_mean, SQL_WINSORIZED_MEAN),
    "cohens_kappa": (q_cohens_kappa, SQL_COHENS_KAPPA),
    "capped_running_total": (q_capped_running_total,
                             SQL_CAPPED_RUNNING_TOTAL),
    "kendall_tau": (q_kendall_tau, SQL_KENDALL_TAU),
    "roc_auc": (q_roc_auc, SQL_ROC_AUC),
    "source_overlap": (q_source_overlap, SQL_SOURCE_OVERLAP),
    "dynamic_pruning": (q_dynamic_pruning, SQL_DYNAMIC_PRUNING),
    "stratified_kfold": (q_stratified_kfold, SQL_STRATIFIED_KFOLD),
    "topk_movers": (q_topk_movers, SQL_TOPK_MOVERS),
    "cramers_v": (q_cramers_v, SQL_CRAMERS_V),
    "binned_stats": (q_binned_stats, SQL_BINNED_STATS),
    "join_cardinality": (q_join_cardinality, SQL_JOIN_CARDINALITY),
    "minmax_scale": (q_minmax_scale, SQL_MINMAX_SCALE),
    "target_encoding": (q_target_encoding, SQL_TARGET_ENCODING),
    "asof_nearest": (q_asof_nearest, SQL_ASOF_NEAREST),
    "locf_fill": (q_locf_fill, SQL_LOCF_FILL),
    "interval_union": (q_interval_union, SQL_INTERVAL_UNION),
    "event_debounce": (q_event_debounce, SQL_EVENT_DEBOUNCE),
    "lang_entropy": (q_lang_entropy, SQL_LANG_ENTROPY),
    "yoy_growth": (q_yoy_growth, SQL_YOY_GROWTH),
    "path_trigrams": (q_path_trigrams, SQL_PATH_TRIGRAMS),
    "rfm_segments": (q_rfm_segments, SQL_RFM_SEGMENTS),
    "skew_kurtosis": (q_skew_kurtosis, SQL_SKEW_KURTOSIS),
    "weighted_median": (q_weighted_median, SQL_WEIGHTED_MEDIAN),
    "anova_f": (q_anova_f, SQL_ANOVA_F),
    "mann_whitney": (q_mann_whitney, SQL_MANN_WHITNEY),
    "ks_test": (q_ks_test, SQL_KS_TEST),
    "benford_digits": (q_benford_digits, SQL_BENFORD_DIGITS),
    "markov_transitions": (q_markov_transitions, SQL_MARKOV_TRANSITIONS),
    "chi2_independence": (q_chi2_independence, SQL_CHI2_INDEPENDENCE),
    "sequence_gaps": (q_sequence_gaps, SQL_SEQUENCE_GAPS),
    "temporal_join": (q_temporal_join, SQL_TEMPORAL_JOIN),
    "spearman_corr": (q_spearman_corr, SQL_SPEARMAN_CORR),
    "gini_concentration": (q_gini_concentration, SQL_GINI_CONCENTRATION),
    "daily_new_users": (q_daily_new_users, SQL_DAILY_NEW_USERS),
    "conversion_lag": (q_conversion_lag, SQL_CONVERSION_LAG),
    "dq_checks": (q_dq_checks, SQL_DQ_CHECKS),
    "except_all": (q_except_all, SQL_EXCEPT_ALL),
    "intersect_all": (q_intersect_all, SQL_INTERSECT_ALL),
    "limit_offset": (q_limit_offset, SQL_LIMIT_OFFSET),
    "window_dist": (q_window_dist, SQL_WINDOW_DIST),
    "moving_median": (q_moving_median, SQL_MOVING_MEDIAN),
    "global_ntile": (q_global_ntile, SQL_GLOBAL_NTILE),
    "order_baskets": (q_order_baskets, SQL_ORDER_BASKETS),
    "zorder_layout": (q_zorder_layout, SQL_ZORDER_LAYOUT),
    "window_bounds": (q_window_bounds, SQL_WINDOW_BOUNDS),
    "max_concurrent": (q_max_concurrent, SQL_MAX_CONCURRENT),
    "welch_ttest": (q_welch_ttest, SQL_WELCH_TTEST),
    "pair_lift": (q_pair_lift, SQL_PAIR_LIFT),
    "first_touch": (q_first_touch, SQL_FIRST_TOUCH),
    "trimmed_mean": (q_trimmed_mean, SQL_TRIMMED_MEAN),
    "range_moving_sum": (q_range_moving_sum, SQL_RANGE_MOVING_SUM),
    "regr_per_group": (q_regr_per_group, SQL_REGR_PER_GROUP),
    "activity_streaks": (q_activity_streaks, SQL_ACTIVITY_STREAKS),
    "large_order_customers": (q_large_order_customers,
                              SQL_LARGE_ORDER_CUSTOMERS),
    "sole_returning_supplier": (q_sole_returning_supplier,
                                SQL_SOLE_RETURNING_SUPPLIER),
    "idle_rich_customers": (q_idle_rich_customers,
                            SQL_IDLE_RICH_CUSTOMERS),
    "order_inversions": (q_order_inversions, SQL_ORDER_INVERSIONS),
    "window_lag": (q_window_lag, SQL_WINDOW_LAG),
    "rollup_agg": (q_rollup_agg, SQL_ROLLUP_AGG),
    "pivot_status": (q_pivot_status, SQL_PIVOT_STATUS),
    "corr_stats": (q_corr_stats, SQL_CORR_STATS),
    "hash_sample": (q_hash_sample, SQL_HASH_SAMPLE),
    "regex_tokens": (q_regex_tokens, SQL_REGEX_TOKENS),
    "string_agg_topn": (q_string_agg_topn, SQL_STRING_AGG_TOPN),
    "approx_quantiles": (q_approx_quantiles, None),
    "left_join": (q_left_join, SQL_LEFT_JOIN),
    "moving_avg": (q_moving_avg, SQL_MOVING_AVG),
    "window_rank": (q_window_rank, SQL_WINDOW_RANK),
    "cube_agg": (q_cube_agg, SQL_CUBE_AGG),
    "above_avg": (q_above_avg, SQL_ABOVE_AVG),
    "hopping_window": (q_hopping_window, SQL_HOPPING_WINDOW),
    "full_join": (q_full_join, SQL_FULL_JOIN),
    "running_total": (q_running_total, SQL_RUNNING_TOTAL),
    "arg_extremes": (q_arg_extremes, SQL_ARG_EXTREMES),
    "pct_of_total": (q_pct_of_total, SQL_PCT_OF_TOTAL),
    "shipping_priority": (q_shipping_priority, SQL_SHIPPING_PRIORITY),
    "range_join": (q_range_join, SQL_RANGE_JOIN),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "cuckoo_semi_join": (q_cuckoo_semi_join, SQL_CUCKOO_SEMI_JOIN),
    "median_selection": (q_median_selection, SQL_MEDIAN_SELECTION),
    "grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    "weighted_avg": (q_weighted_avg, SQL_WEIGHTED_AVG),
    "funnel": (q_funnel, SQL_FUNNEL),
    "intersect_except": (q_intersect_except, SQL_INTERSECT_EXCEPT),
    "cross_join": (q_cross_join, SQL_CROSS_JOIN),
    "unpivot": (q_unpivot, SQL_UNPIVOT),
    "date_parts": (q_date_parts, SQL_DATE_PARTS),
    "quantile_cont": (q_quantile_cont, SQL_QUANTILE_CONT),
    "rank_ties": (q_rank_ties, SQL_RANK_TIES),
    "multi_distinct": (q_multi_distinct, SQL_MULTI_DISTINCT),
    "partitioned_sink": (q_partitioned_sink, SQL_PARTITIONED_SINK),
    "salted_groupby": (q_salted_groupby, SQL_SALTED_GROUPBY),
    "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
    "window_self_join": (q_window_self_join, SQL_WINDOW_SELF_JOIN),
    "pagerank": (q_pagerank, None),
    "histogram": (q_histogram, SQL_HISTOGRAM),
    "bucketed_join": (q_bucketed_join, SQL_BUCKETED_JOIN),
    "jsonl_roundtrip": (q_jsonl_roundtrip, SQL_JSONL_ROUNDTRIP),
    "right_join": (q_right_join, SQL_RIGHT_JOIN),
    "schema_union": (q_schema_union, SQL_SCHEMA_UNION),
    "late_events": (q_late_events, SQL_LATE_EVENTS),
    "mode_per_group": (q_mode_per_group, SQL_MODE_PER_GROUP),
    "skyline": (q_skyline, SQL_SKYLINE),
    "upsert_latest": (q_upsert_latest, SQL_UPSERT_LATEST),
    "dataset_diff": (q_dataset_diff, SQL_DATASET_DIFF),
    "skew_join": (q_skew_join, SQL_SKEW_JOIN),
    "retention_cohorts": (q_retention_cohorts, SQL_RETENTION_COHORTS),
    "outlier_docs": (q_outlier_docs, SQL_OUTLIER_DOCS),
    "rolling_distinct": (q_rolling_distinct, SQL_ROLLING_DISTINCT),
    "scd2_intervals": (q_scd2_intervals, SQL_SCD2_INTERVALS),
    "triangle_count": (q_triangle_count, SQL_TRIANGLE_COUNT),
    "profile_table": (q_profile_table, SQL_PROFILE_TABLE),
    "group_quantiles": (q_group_quantiles, SQL_GROUP_QUANTILES),
    "sorted_layout": (q_sorted_layout, SQL_SORTED_LAYOUT),
    "mad_per_group": (q_mad_per_group, SQL_MAD_PER_GROUP),
    "incremental_agg": (q_incremental_agg, SQL_INCREMENTAL_AGG),
    "date_spine": (q_date_spine, SQL_DATE_SPINE),
    "relational_division": (q_relational_division, SQL_RELATIONAL_DIVISION),
    "watermark_agg": (q_watermark_agg, SQL_WATERMARK_AGG),
    "time_weighted_avg": (q_time_weighted_avg, SQL_TIME_WEIGHTED_AVG),
    "topk_diversified": (q_topk_diversified, SQL_TOPK_DIVERSIFIED),
    "degree_distribution": (q_degree_distribution, SQL_DEGREE_DISTRIBUTION),
}
