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

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum


def _t(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


def _cents(arr, scale: int = 100) -> pa.Array:
    return pc.round(pc.multiply(arr, pa.scalar(float(scale)))).cast(pa.int64())


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

    ds = rd.read_parquet(
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
  SUM(len(regexp_extract_all(text, '{_TOKEN_RE}'))) AS sum_tokens
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
    sides keeps the hash compare free of null ambiguity)."""
    import pyarrow.dataset as pads

    from .sizing import join_parts

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
        filter=pads.field("c_custkey") < 400,
    )
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"])

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
    left-only, right-only, and matched rows all genuinely occur. Both
    sides are groupby-aggregated BEFORE the join (each bounded by
    |customers|), keys are coalesced into one output column and counts
    null-filled on both sides — completing the inner/left/full join-type
    surface over the same aggregate-then-join shape."""
    from .sizing import join_parts

    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def side(prio: str, lo: int, hi: int, key: str, cnt: str):
        def prep(b: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.equal(b["o_orderpriority"], pa.scalar(prio)),
                pc.and_(pc.greater_equal(b["o_custkey"], pa.scalar(lo)),
                        pc.less(b["o_custkey"], pa.scalar(hi))))
            return pa.table({key: b["o_custkey"].filter(m)})

        return (
            orders.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(key).aggregate(Count(alias_name=cnt))
        )

    a = side("1-URGENT", 0, 200, "ka", "n_urgent")
    b = side("5-LOW", 100, 300, "kb", "n_low")
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

    ds = rd.read_parquet(
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

    ds = rd.read_parquet(
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


ANALYTICS_QUERIES = {
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
}
