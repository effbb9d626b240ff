"""Round-5 widening of the analytics surface: time-series resampling
(weekly OHLC), gap-aware rolling correlation, inequality indices (Theil
T, Lorenz decile curve), graph clustering coefficients, embedding-
truncation quality (Matryoshka readout), cosine range search, exact
two-feature OLS, OOV-rate vocabulary coverage, and a two-rate Poisson
z-test — each with a DuckDB oracle.

Same exact-match discipline as relational.py / analytics.py: every
aggregate folds as int64 (cents / counts / quantized units) so
distributed summation order can never produce a last-ulp mismatch;
float finals are ONE identical IEEE expression on both sides, 6 dp;
order-dependent float term sums are summed in an explicit ORDER BY on
both sides.

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

from .analytics import _cents, _splitmix64, _t

DAY_US = 86_400_000_000


def _day_rev_fold(sf_dir: str) -> pd.DataFrame:
    """(day, cnt, rev-cents) per order day — the bounded <= #days fold
    shared by the round-5 time-series ops (same shape as acf_lags /
    dow_seasonality: block-local pyarrow partials, ONE <= #days
    exchange, driver finale on the skinny day table)."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "day": pc.divide(b["o_orderdate"].cast(pa.int64()),
                             pa.scalar(DAY_US, pa.int64())).cast(pa.int64()),
            "rev": _cents(b["o_totalprice"]),
            "cnt": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by("day").aggregate([("rev", "sum"), ("cnt", "sum")])
        return g.rename_columns(["day", "rev", "cnt"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("day")
           .aggregate(Sum("rev", alias_name="rev"),
                      Sum("cnt", alias_name="cnt")))
    return agg.to_pandas().sort_values("day", ignore_index=True)


# =====================================================================
# trailing 7-day rolling correlation (count vs revenue)
# =====================================================================

def q_rolling_corr(sf_dir: str, window_days: int = 7):
    """Trailing-7-day rolling Pearson correlation between daily order
    COUNT and daily REVENUE — the demand-mix drift monitor (are busier
    days still proportionally richer days?). Gap-aware RANGE frame
    semantics: the window is calendar days [d-6, d] actually present,
    exactly DuckDB's RANGE BETWEEN 6 PRECEDING AND CURRENT ROW over the
    integer day key. Scale: ONE <= #days exchange of exact int64
    (cnt, rev) day sums; windowed moment sums come from prefix sums +
    two searchsorted cuts on the sorted day table (driver fold over
    bounded rows, the burst_flags shape); r is ONE identical IEEE
    expression both sides, 6 dp, NULL when the window is degenerate
    (n < 2 or zero variance)."""
    df = _day_rev_fold(sf_dir)
    day = df["day"].to_numpy(np.int64)
    x = df["cnt"].to_numpy(np.int64).astype(object)   # exact python ints
    y = df["rev"].to_numpy(np.int64).astype(object)
    csx = np.concatenate(([0], np.cumsum(x)))
    csy = np.concatenate(([0], np.cumsum(y)))
    csxx = np.concatenate(([0], np.cumsum(x * x)))
    csyy = np.concatenate(([0], np.cumsum(y * y)))
    csxy = np.concatenate(([0], np.cumsum(x * y)))
    lo = np.searchsorted(day, day - (window_days - 1), side="left")
    rows = {"day": [], "n": [], "r": []}
    for i in range(len(day)):
        j = int(lo[i])
        n = i + 1 - j
        sx, sy = int(csx[i + 1] - csx[j]), int(csy[i + 1] - csy[j])
        sxx = int(csxx[i + 1] - csxx[j])
        syy = int(csyy[i + 1] - csyy[j])
        sxy = int(csxy[i + 1] - csxy[j])
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        rows["day"].append(int(day[i]))
        rows["n"].append(n)
        if n < 2 or vx <= 0 or vy <= 0:
            rows["r"].append(None)
        else:
            r = float(n * sxy - sx * sy) \
                / math.sqrt(float(vx) * float(vy))
            rows["r"].append(np.round(r, 6))
    return pa.table({"day": pa.array(rows["day"], pa.int64()),
                     "n": pa.array(rows["n"], pa.int64()),
                     "r": pa.array(rows["r"], pa.float64())})


SQL_ROLLING_CORR = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS x,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders GROUP BY 1
), w AS (
  SELECT day,
    CAST(COUNT(*) OVER win AS BIGINT) AS n,
    CAST(SUM(x) OVER win AS HUGEINT) AS sx,
    CAST(SUM(y) OVER win AS HUGEINT) AS sy,
    CAST(SUM(x * x) OVER win AS HUGEINT) AS sxx,
    CAST(SUM(y * y) OVER win AS HUGEINT) AS syy,
    CAST(SUM(x * y) OVER win AS HUGEINT) AS sxy
  FROM d
  WINDOW win AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT CAST(day AS BIGINT) AS day, n,
  CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                  / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(n * syy - sy * sy AS DOUBLE)), 6)
       END AS r
FROM w
"""


# =====================================================================
# weekly OHLC resample of purchase values
# =====================================================================

def q_ohlc_weekly(sf_dir: str):
    """Weekly OHLC (open / high / low / close) of purchase values — the
    canonical time-series downsample (finance bars; the crawl twin is
    per-week first/peak/floor/latest page-size per host). Week = epoch
    day // 7; open/close are the values at the (ts, event_id)-MIN/MAX
    rows — TRUE tuple order, no packed key. Scale: skinny (week, ts,
    eid, cents) rows ride ONE week-hash exchange (the interval_union
    shape); each partition lexsorts once and takes per-week head/tail/
    min/max vectorized — all int64 cents, zero float."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.equal(b["event_type"], pa.scalar("purchase"))
        t = b.filter(m)
        ts = t["ts"].cast(pa.int64())
        wk = pc.divide(pc.divide(ts, pa.scalar(DAY_US, pa.int64())),
                       pa.scalar(7, pa.int64())).cast(pa.int64())
        w = wk.to_numpy(zero_copy_only=False)
        kp = (_splitmix64(w).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "wk": wk, "ts_us": ts, "event_id": t["event_id"],
            "c": _cents(t["value"]), "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        wk = g["wk"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, wk))
        wk, ts, eid, c = wk[order], ts[order], eid[order], c[order]
        weeks, idx, counts = np.unique(wk, return_index=True,
                                       return_counts=True)
        last = idx + counts - 1
        hi = np.maximum.reduceat(c, idx)
        lo = np.minimum.reduceat(c, idx)
        return pd.DataFrame({
            "wk": weeks.astype(np.int64),
            "open": c[idx].astype(np.int64),
            "high": hi.astype(np.int64),
            "low": lo.astype(np.int64),
            "close": c[last].astype(np.int64),
            "n": counts.astype(np.int64),
        })

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(fold, batch_format="pandas")
            .select_columns(["wk", "open", "high", "low", "close", "n"]))


SQL_OHLC_WEEKLY = """
WITH p AS (
  SELECT (epoch_us(ts) // 86400000000) // 7 AS wk, ts, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
), o AS (
  SELECT wk, c AS open,
         ROW_NUMBER() OVER (PARTITION BY wk ORDER BY ts, event_id) AS rn
  FROM p
), cl AS (
  SELECT wk, c AS close,
         ROW_NUMBER() OVER (PARTITION BY wk
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM p
), agg AS (
  SELECT wk, MAX(c) AS high, MIN(c) AS low, CAST(COUNT(*) AS BIGINT) AS n
  FROM p GROUP BY 1
)
SELECT CAST(agg.wk AS BIGINT) AS wk, o.open, agg.high, agg.low,
       cl.close, agg.n
FROM agg
JOIN o ON o.wk = agg.wk AND o.rn = 1
JOIN cl ON cl.wk = agg.wk AND cl.rn = 1
"""


# =====================================================================
# Theil T inequality index of daily revenue
# =====================================================================

def q_theil_index(sf_dir: str):
    """Theil T index of revenue concentration across order days — the
    decomposable entropy-based inequality measure (Theil 1967; the
    corpus twin: how unevenly crawl volume spreads over days). T =
    (1/n) Σ (x_d/μ)·ln(x_d/μ) with μ = S/n; every ratio stays the EXACT
    integer cross product x_d·n / S inside the ln, and the term sum is
    ORDER BY day on both sides (ordered aggregate — float addition is
    not associative). One <= #days exchange; driver finale on the
    bounded day table; 6 dp."""
    df = _day_rev_fold(sf_dir)
    x = [int(v) for v in df["rev"]]          # exact python ints
    n, s = len(x), sum(x)
    acc = 0.0
    for v in x:                               # day-ascending order
        ratio = float(v * n) / float(s)
        acc += ratio * math.log(ratio)
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "theil": pa.array([np.round(acc / float(n), 6)], pa.float64())})


SQL_THEIL_INDEX = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), t AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(rev) AS HUGEINT) AS s
  FROM d
)
SELECT CAST(t.n AS BIGINT) AS n_days,
       ROUND(SUM((CAST(d.rev * t.n AS DOUBLE) / CAST(t.s AS DOUBLE))
                 * LN(CAST(d.rev * t.n AS DOUBLE) / CAST(t.s AS DOUBLE))
                 ORDER BY d.day) / CAST(t.n AS DOUBLE), 6) AS theil
FROM d, t GROUP BY t.n, t.s
"""


# =====================================================================
# Lorenz curve by customer-revenue deciles
# =====================================================================

def q_lorenz_deciles(sf_dir: str):
    """Lorenz decile curve of customer lifetime revenue: customers
    ranked into NTILE(10) by revenue (DESC, custkey tie-break — the
    full sort key is unique) and each decile's revenue share — the
    whale-curve readout behind every gini_concentration number. Scale:
    per-customer cents fold in ONE custkey exchange; the decile
    assignment is rfm_segments' distributed NTILE (one range sort of
    the skinny table + a <= #blocks offset fold, no rank join-back)
    emitting (tile, cents) partials block-locally; <= 10-row finale,
    exact integers until one division per decile."""
    from .analytics import _ntile_pairs

    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({"ck": b["o_custkey"], "mon": _cents(b["o_totalprice"])})
        g = t.group_by("ck").aggregate([("mon", "sum")])
        return g.rename_columns(["ck", "mon"])

    per_cust = (ds.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("ck")
                .aggregate(Sum("mon", alias_name="mon"))
                .materialize())

    pairs = _ntile_pairs(per_cust, "mon", k=10)

    # ride the tile assignment back over ONE ck exchange to attach mon,
    # then fold (tile -> cents, customers) block-locally
    tagged = pairs.map_batches(
        lambda b: pa.table({"ck": b["ck"],
                            "tile": b["tile"],
                            "mon": pa.array(np.zeros(b.num_rows, np.int64))}),
        batch_format="pyarrow").union(
        per_cust.map_batches(
            lambda b: pa.table({"ck": b["ck"],
                                "tile": pa.array(
                                    np.zeros(b.num_rows, np.int64)),
                                "mon": b["mon"]}),
            batch_format="pyarrow"))

    joined = (tagged.groupby("ck")
              .aggregate(Sum("tile", alias_name="tile"),
                         Sum("mon", alias_name="mon")))

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by("tile").aggregate([("mon", "sum"), ([], "count_all")])
        return g.rename_columns(["decile", "cents", "n_customers"])

    agg = (joined.map_batches(fold, batch_format="pyarrow")
           .groupby("decile")
           .aggregate(Sum("cents", alias_name="cents"),
                      Sum("n_customers", alias_name="n_customers")))
    df = agg.to_pandas().sort_values("decile", ignore_index=True)
    cents = df["cents"].to_numpy(np.int64)
    total = int(cents.sum())
    return pa.table({
        "decile": pa.array(df["decile"].to_numpy(np.int64)),
        "cents": pa.array(cents),
        "n_customers": pa.array(df["n_customers"].to_numpy(np.int64)),
        "share": pa.array(np.round(
            cents.astype(np.float64) / float(total), 6), pa.float64())})


SQL_LORENZ_DECILES = """
WITH m AS (
  SELECT o_custkey AS ck,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS mon
  FROM orders GROUP BY 1
), t AS (
  SELECT ck, mon,
         CAST(NTILE(10) OVER (ORDER BY mon DESC, ck) AS BIGINT) AS decile
  FROM m
), g AS (
  SELECT decile, CAST(SUM(mon) AS HUGEINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1
), tot AS (SELECT CAST(SUM(mon) AS HUGEINT) AS st FROM m)
SELECT g.decile, CAST(g.s AS BIGINT) AS cents, g.n AS n_customers,
       ROUND(CAST(g.s AS DOUBLE) / CAST(tot.st AS DOUBLE), 6) AS share
FROM g, tot
"""


# =====================================================================
# per-node clustering coefficient (co-supply graph)
# =====================================================================

def q_clustering_coeff(sf_dir: str):
    """LOCAL clustering coefficient per supplier node on the co-supply
    graph (suppliers joined by a shared part, parts < 200 — the same
    graph as triangle_count / kcore): c_u = 2·T_u / (d_u·(d_u−1)), the
    per-node transitivity that separates hub-and-spoke suppliers from
    clique members. Scale shape: the distinct (part, supp) projection
    and per-part co-pair emission are distributed (bounded pairs per
    part group); the deduped edge set folds to the DIMENSION-sized
    driver where per-node triangles are diag(A³)/2 in one BLAS pass —
    the triangle_count finale extended from the trace to the diagonal
    (same dense-A discipline, same documented node-iterator swap at
    web-scale node counts). Exact ints until one division, 6 dp; only
    nodes with degree >= 2 (c undefined below)."""
    import pyarrow.dataset as pads

    from .analytics import _sized_read

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
    chunks = [np.stack([b["u"].to_numpy(zero_copy_only=False),
                        b["v"].to_numpy(zero_copy_only=False)], axis=1)
              for b in co.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")]
    if not chunks:
        return pa.table({"node": pa.array([], pa.int64()),
                         "degree": pa.array([], pa.int64()),
                         "triangles": pa.array([], pa.int64()),
                         "coeff": pa.array([], pa.float64())})
    uv = np.unique(np.concatenate(chunks).astype(np.int64), axis=0)
    nodes = np.unique(uv)
    idx = np.searchsorted(nodes, uv)
    a = np.zeros((len(nodes), len(nodes)), dtype=np.float64)
    a[idx[:, 0], idx[:, 1]] = 1.0
    a[idx[:, 1], idx[:, 0]] = 1.0
    deg = a.sum(axis=1).astype(np.int64)
    tri2 = np.einsum("ij,ji->i", a @ a, a)  # diag(A³): 2·T_u, exact ints
    keep = deg >= 2
    t_u = (tri2[keep] / 2.0).astype(np.int64)
    d_u = deg[keep]
    coeff = np.round(
        (2.0 * t_u.astype(np.float64))
        / (d_u.astype(np.float64) * (d_u - 1).astype(np.float64)), 6)
    return pa.table({
        "node": pa.array(nodes[keep]),
        "degree": pa.array(d_u),
        "triangles": pa.array(t_u),
        "coeff": pa.array(coeff, pa.float64())})


SQL_CLUSTERING_COEFF = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
            FROM lineitem WHERE l_partkey < 200),
e AS (SELECT DISTINCT a.s AS u, b.s AS v
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
d AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM sym GROUP BY 1),
t AS (SELECT a.u AS node, CAST(COUNT(*) AS BIGINT) AS tri
      FROM sym a JOIN sym b ON b.u = a.u AND a.v < b.v
      JOIN e ON e.u = a.v AND e.v = b.v
      GROUP BY 1)
SELECT d.node, d.degree, COALESCE(t.tri, 0) AS triangles,
       ROUND(CAST(2 * COALESCE(t.tri, 0) AS DOUBLE)
             / CAST(d.degree * (d.degree - 1) AS DOUBLE), 6) AS coeff
FROM d LEFT JOIN t USING (node)
WHERE d.degree >= 2
"""


# =====================================================================
# embedding-truncation quality (Matryoshka readout)
# =====================================================================

def q_emb_truncation(sf_dir: str, head_dims: int = 32):
    """Per-label mean cosine between each embedding and its first-32-
    dim truncation — the Matryoshka-representation readout (Kusupati
    et al. 2022) that says how much retrieval quality a dimension cut
    keeps. cos(full, head-padded) reduces to sh / (√ss·√sh) with
    ss = Σv², sh = Σ_{i<=32} v²; every v² is EXACT in float64 (float32
    mantissa squared fits), and both sides sum in DIM ORDER (ordered
    aggregate in SQL, a sequential dim loop here — float addition is
    not associative). Per-vector cosines quantize to integer
    micro-units (half-away, the label_centroids convention) so the
    per-label mean is an exact integer fold through a <= |labels|
    exchange; one division + round at the end. Block-local, zero
    shuffle of vectors."""
    from .dataops import _embedding_matrix

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path, columns=["embedding", "label"])

    def prep(b: pa.Table) -> pa.Table:
        emb = _embedding_matrix(b["embedding"])    # (n, d) float64
        lab = b["label"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n, d = emb.shape
        sq = emb * emb                             # exact per-term
        ss = np.zeros(n, np.float64)
        sh = np.zeros(n, np.float64)
        for j in range(d):                         # sequential dim order
            ss = ss + sq[:, j]
            if j < head_dims:
                sh = sh + sq[:, j]
        ok = sh > 0.0
        cos = np.zeros(n, np.float64)
        cos[ok] = sh[ok] / (np.sqrt(ss[ok]) * np.sqrt(sh[ok]))
        q = cos * 1e6
        qc = np.where(q >= 0, np.floor(q + 0.5),
                      -np.floor(-q + 0.5)).astype(np.int64)
        ul, inv = np.unique(lab[ok], return_inverse=True)
        sums = np.zeros(len(ul), np.int64)
        np.add.at(sums, inv, qc[ok])
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({"label": pa.array(ul), "s": pa.array(sums),
                         "n": pa.array(cnt)})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("label")
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")))
    df = agg.to_pandas().sort_values("label", ignore_index=True)
    s = df["s"].to_numpy(np.int64)
    n = df["n"].to_numpy(np.int64)
    # half-AWAY 6-dp finale (DuckDB ROUND), not np.round's half-even:
    # an integer-micro mean s/n CAN land exactly on a .5e-6 boundary
    mean = s.astype(np.float64) / n.astype(np.float64) / 1e6
    y = mean * 1e6
    mean6 = np.where(y >= 0, np.floor(y + 0.5), -np.floor(-y + 0.5)) / 1e6
    return pa.table({
        "label": pa.array(df["label"].to_numpy(np.int64)),
        "n": pa.array(n),
        "mean_cos": pa.array(mean6, pa.float64())})


SQL_EMB_TRUNCATION = """
WITH u AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), s AS (
  SELECT vec_id, label,
         SUM(v * v ORDER BY i) AS ss,
         SUM(CASE WHEN i <= 32 THEN v * v ELSE 0 END ORDER BY i) AS sh
  FROM u GROUP BY 1, 2
), c AS (
  SELECT label,
         CAST(ROUND(1000000 * sh / (SQRT(ss) * SQRT(sh))) AS BIGINT) AS qc
  FROM s WHERE sh > 0
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(qc) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / 1000000.0, 6) AS mean_cos
FROM c GROUP BY 1
"""


# =====================================================================
# cosine range search (threshold, not top-k)
# =====================================================================

def q_ann_range(sf_dir: str, tau: float = 0.3):
    """RANGE similarity search: for every embedding, how many of the
    bounded candidates (vec_id < 512, self excluded) lie within cosine
    >= 0.3 — the radius-query complement to ann_cosine's top-k (dedup
    calibration and density estimation both want counts-in-ball, not
    nearest-k). knn_join's scale shape: candidates broadcast once with
    norms pre-divided, probe side streams with ONE float64 matmul per
    block; the 6-dp-rounded cosine is compared to tau EXACTLY on both
    sides, so the count is integer-deterministic. Zero shuffle."""
    import pyarrow.parquet as pq

    from .dataops import _embedding_matrix

    path = os.path.join(sf_dir, "embeddings.parquet")
    cap = 512
    t = pq.read_table(path, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", cap)])
    cids = np.asarray(t["vec_id"], dtype=np.int64)
    cmat = _embedding_matrix(t["embedding"])
    cn = np.linalg.norm(cmat, axis=1)
    cand_ref = ray.put((cids, cmat / np.where(cn == 0, 1.0, cn)[:, None]))

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])

    def count_ball(b: pa.Table) -> pa.Table:
        import ray as _r

        ids, matn = _r.get(cand_ref)
        vid = b["vec_id"].to_numpy(zero_copy_only=False)
        emb = _embedding_matrix(b["embedding"])
        n = np.linalg.norm(emb, axis=1)
        embn = emb / np.where(n == 0, 1.0, n)[:, None]
        cos = np.round(embn @ matn.T, 6)
        hit = cos >= tau
        hit[vid[:, None] == ids[None, :]] = False   # self excluded
        return pa.table({
            "vec_id": pa.array(vid),
            "n_matches": pa.array(hit.sum(axis=1).astype(np.int64)),
        })

    return ds.map_batches(count_ball, batch_format="pyarrow")


SQL_ANN_RANGE = """
SELECT a.vec_id,
       CAST(SUM(CASE WHEN ROUND(list_cosine_similarity(
                 a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.3
                THEN 1 ELSE 0 END) AS BIGINT) AS n_matches
FROM embeddings a
JOIN embeddings b ON b.vec_id < 512 AND b.vec_id <> a.vec_id
GROUP BY 1
"""


# =====================================================================
# exact two-feature OLS per group (normal equations, Cramer's rule)
# =====================================================================

def q_ols_two(sf_dir: str):
    """Two-feature linear regression per returnflag: extendedprice
    (cents) ~ b0 + b1·quantity + b2·discount(%) solved EXACTLY by
    Cramer's rule on the 3x3 normal equations — regr_per_group's
    multi-feature extension, closed-form (no iteration, no float
    accumulation drift). Scale shape: all nine moment sums (n, Σq, Σd,
    Σq², Σqd, Σd², Σy, Σqy, Σdy) are exact int64 block partials
    through a <= 3-row exchange; the driver computes every 3x3
    determinant in UNBOUNDED python ints (the oracle's HUGEINT) and
    divides once per coefficient — the SAME expression tree both
    sides, 6 dp."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_quantity", "l_discount", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        q = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d = _cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        y = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        flags = np.asarray(b["l_returnflag"], dtype=object)
        uf, inv = np.unique(flags, return_inverse=True)
        cols = {
            "n": np.ones(len(q), np.int64), "sq": q, "sd": d,
            "sqq": q * q, "sqd": q * d, "sdd": d * d,
            "sy": y, "sqy": q * y, "sdy": d * y,
        }
        out = {"flag": pa.array(uf)}
        for k, v in cols.items():
            s = np.zeros(len(uf), np.int64)
            np.add.at(s, inv, v)
            out[k] = pa.array(s)
        return pa.table(out)

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("flag")
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ["n", "sq", "sd", "sqq", "sqd", "sdd",
                                  "sy", "sqy", "sdy"]]))
    df = agg.to_pandas().sort_values("flag", ignore_index=True)
    rows = {"flag": [], "n": [], "b0": [], "b1": [], "b2": []}

    def det3(m):
        return (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))

    for _, r in df.iterrows():
        n, sq, sd = int(r["n"]), int(r["sq"]), int(r["sd"])
        sqq, sqd, sdd = int(r["sqq"]), int(r["sqd"]), int(r["sdd"])
        sy, sqy, sdy = int(r["sy"]), int(r["sqy"]), int(r["sdy"])
        xtx = [[n, sq, sd], [sq, sqq, sqd], [sd, sqd, sdd]]
        xty = [sy, sqy, sdy]
        den = det3(xtx)
        if den == 0:
            continue
        bs = []
        for j in range(3):
            m = [row[:] for row in xtx]
            for i in range(3):
                m[i][j] = xty[i]
            bs.append(np.round(float(det3(m)) / float(den), 6))
        rows["flag"].append(str(r["flag"]))
        rows["n"].append(n)
        rows["b0"].append(bs[0])
        rows["b1"].append(bs[1])
        rows["b2"].append(bs[2])
    return pa.table({
        "flag": pa.array(rows["flag"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "b0": pa.array(rows["b0"], pa.float64()),
        "b1": pa.array(rows["b1"], pa.float64()),
        "b2": pa.array(rows["b2"], pa.float64())})


SQL_OLS_TWO = """
WITH m AS (
  SELECT l_returnflag AS flag,
    CAST(COUNT(*) AS HUGEINT) AS n,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS HUGEINT) AS sq,
    CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS HUGEINT) AS sd,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
             * CAST(ROUND(l_quantity) AS BIGINT)) AS HUGEINT) AS sqq,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
             * CAST(ROUND(l_discount * 100) AS BIGINT)) AS HUGEINT) AS sqd,
    CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
             * CAST(ROUND(l_discount * 100) AS BIGINT)) AS HUGEINT) AS sdd,
    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
      AS sy,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
             * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
      AS sqy,
    CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
             * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
      AS sdy
  FROM lineitem GROUP BY 1
), dets AS (
  SELECT flag, n,
    n * (sqq * sdd - sqd * sqd) - sq * (sq * sdd - sqd * sd)
      + sd * (sq * sqd - sqq * sd) AS den,
    sy * (sqq * sdd - sqd * sqd) - sq * (sqy * sdd - sqd * sdy)
      + sd * (sqy * sqd - sqq * sdy) AS d0,
    n * (sqy * sdd - sqd * sdy) - sy * (sq * sdd - sqd * sd)
      + sd * (sq * sdy - sqy * sd) AS d1,
    n * (sqq * sdy - sqy * sqd) - sq * (sq * sdy - sqy * sd)
      + sy * (sq * sqd - sqq * sd) AS d2
  FROM m
)
SELECT flag, CAST(n AS BIGINT) AS n,
       ROUND(CAST(d0 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS b0,
       ROUND(CAST(d1 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS b1,
       ROUND(CAST(d2 AS DOUBLE) / CAST(den AS DOUBLE), 6) AS b2
FROM dets WHERE den <> 0
"""


# =====================================================================
# OOV rate per source vs the corpus top-1000 vocabulary
# =====================================================================

def q_oov_rate(sf_dir: str, vocab_k: int = 1000):
    """Out-of-vocabulary token rate per source against the corpus-wide
    top-1000 vocabulary — the tokenizer-coverage readout that says
    which feed a fixed vocab serves worst. Pass 1 is word_freq's
    combiner (per-block Arrow value_counts → ONE token groupby →
    per-block partial top-k merged on the driver, count-DESC token-ASC
    tie-break, no global sort); the bounded vocab broadcasts once via
    ray.put; pass 2 tokenizes each block (same RE2 both sides), maps
    tokens to their row's source with list_parent_indices, and counts
    membership with ONE Arrow is_in kernel into <= |sources| partials.
    Exact integer ratio until one division, 6 dp."""
    from .dataops import _docs

    ds = _docs(sf_dir, ["text"])

    def counts(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(b["text"].combine_chunks())
        flat = pc.list_flatten(pc.split_pattern_regex(low, "[^a-z]+"))
        flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    agg = (ds.map_batches(counts, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("token")
           .aggregate(Sum("n", alias_name="n")))

    def partial_top(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["n", "token"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df.head(vocab_k), preserve_index=False)

    cand = [c for b in agg.map_batches(partial_top, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
            for c in zip(b["token"].to_pylist(), b["n"].to_pylist())]
    cand.sort(key=lambda t: (-t[1], t[0]))
    vocab_ref = ray.put(pa.array([t[0] for t in cand[:vocab_k]],
                                 pa.string()))

    docs = _docs(sf_dir, ["source", "text"])

    def oov(b: pa.Table) -> pa.Table:
        import ray as _r

        vocab = _r.get(vocab_ref)
        low = pc.utf8_lower(b["text"].combine_chunks())
        lists = pc.split_pattern_regex(low, "[^a-z]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False)
        ok = pc.not_equal(flat, pa.scalar(""))
        inv = pc.is_in(flat, value_set=vocab)
        okn = ok.to_numpy(zero_copy_only=False)
        oovn = np.logical_and(
            okn, np.logical_not(inv.to_numpy(zero_copy_only=False)))
        src = np.asarray(b["source"], dtype=object)
        us, sinv = np.unique(src, return_inverse=True)
        tok_per_row = np.bincount(parent[okn], minlength=len(src))
        oov_per_row = np.bincount(parent[oovn], minlength=len(src))
        nt = np.zeros(len(us), np.int64)
        no = np.zeros(len(us), np.int64)
        np.add.at(nt, sinv, tok_per_row)
        np.add.at(no, sinv, oov_per_row)
        return pa.table({"source": pa.array(us), "n_tokens": pa.array(nt),
                         "n_oov": pa.array(no)})

    agg2 = (docs.map_batches(oov, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("source")
            .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                       Sum("n_oov", alias_name="n_oov")))
    df = agg2.to_pandas().sort_values("source", ignore_index=True)
    nt = df["n_tokens"].to_numpy(np.int64)
    no = df["n_oov"].to_numpy(np.int64)
    return pa.table({
        "source": pa.array(df["source"], pa.string()),
        "n_tokens": pa.array(nt), "n_oov": pa.array(no),
        "oov_rate": pa.array(np.round(
            no.astype(np.float64) / nt.astype(np.float64), 6),
            pa.float64())})


SQL_OOV_RATE = """
WITH tk AS (
  SELECT source, token FROM (
    SELECT source,
           unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
    FROM documents)
  WHERE token <> ''
), v AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS n FROM tk GROUP BY 1)
  QUALIFY ROW_NUMBER() OVER (ORDER BY n DESC, token) <= 1000
)
SELECT tk.source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       ROUND(CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
FROM tk LEFT JOIN v USING (token)
GROUP BY 1
"""


# =====================================================================
# two-rate Poisson z-test per event type (first vs second half)
# =====================================================================

def q_poisson_rate(sf_dir: str):
    """Two-rate Poisson z-test per event type: did the daily event rate
    change between the first and second half of the observation span?
    z = (c1/t1 − c2/t2) / √(c1/t1² + c2/t2²) — the count-data
    change detector next to prop_ztest (proportions) and
    cusum_changepoint (location). The span midpoint comes from ONE
    global Min/Max day fold (topk_movers' convention: first half =
    [lo, mid], mid = (lo+hi)//2); per-(type, half) counts are exact
    int64 partials through a <= |types|·2 exchange; z is ONE identical
    IEEE expression on the bounded driver rows, 6 dp."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    bounds = ds.map_batches(
        lambda b: pa.table({
            "lo": pa.array([pc.min(b["ts"]).cast(pa.int64()).as_py()
                            // DAY_US], pa.int64()),
            "hi": pa.array([pc.max(b["ts"]).cast(pa.int64()).as_py()
                            // DAY_US], pa.int64())}),
        batch_format="pyarrow").aggregate(Min("lo"), Max("hi"))
    lo, hi = int(bounds["min(lo)"]), int(bounds["max(hi)"])
    mid = (lo + hi) // 2
    t1, t2 = mid - lo + 1, hi - mid

    def prep(b: pa.Table) -> pa.Table:
        day = pc.divide(b["ts"].cast(pa.int64()),
                        pa.scalar(DAY_US, pa.int64())).cast(pa.int64())
        half = pc.greater(day, pa.scalar(mid, pa.int64())).cast(pa.int64())
        t = pa.table({"event_type": b["event_type"], "half": half,
                      "c": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["event_type", "half"]).aggregate([("c", "sum")])
        return g.rename_columns(["event_type", "half", "c"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["event_type", "half"])
           .aggregate(Sum("c", alias_name="c")))
    df = agg.to_pandas()
    piv = df.pivot_table(index="event_type", columns="half", values="c",
                         aggfunc="sum", fill_value=0)
    rows = {"event_type": [], "n1": [], "n2": [], "z": []}
    for et in sorted(piv.index):
        c1 = int(piv.loc[et].get(0, 0))
        c2 = int(piv.loc[et].get(1, 0))
        if c1 == 0 and c2 == 0:
            continue
        r1 = float(c1) / float(t1)
        r2 = float(c2) / float(t2)
        z = (r1 - r2) / math.sqrt(
            float(c1) / float(t1 * t1) + float(c2) / float(t2 * t2))
        rows["event_type"].append(str(et))
        rows["n1"].append(c1)
        rows["n2"].append(c2)
        rows["z"].append(np.round(z, 6))
    return pa.table({
        "event_type": pa.array(rows["event_type"], pa.string()),
        "n1": pa.array(rows["n1"], pa.int64()),
        "n2": pa.array(rows["n2"], pa.int64()),
        "z": pa.array(rows["z"], pa.float64())})


SQL_POISSON_RATE = """
WITH b AS (
  SELECT MIN(epoch_us(ts) // 86400000000) AS lo,
         MAX(epoch_us(ts) // 86400000000) AS hi
  FROM events
), m AS (
  SELECT lo, hi, (lo + hi) // 2 AS mid,
         (lo + hi) // 2 - lo + 1 AS t1, hi - (lo + hi) // 2 AS t2
  FROM b
), c AS (
  SELECT e.event_type,
    CAST(SUM(CASE WHEN epoch_us(e.ts) // 86400000000 <= m.mid
             THEN 1 ELSE 0 END) AS BIGINT) AS c1,
    CAST(SUM(CASE WHEN epoch_us(e.ts) // 86400000000 > m.mid
             THEN 1 ELSE 0 END) AS BIGINT) AS c2,
    MAX(m.t1) AS t1, MAX(m.t2) AS t2
  FROM events e, m GROUP BY 1
)
SELECT event_type, c1 AS n1, c2 AS n2,
  ROUND((CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE)
         - CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE))
        / SQRT(CAST(c1 AS DOUBLE) / CAST(t1 * t1 AS DOUBLE)
               + CAST(c2 AS DOUBLE) / CAST(t2 * t2 AS DOUBLE)), 6) AS z
FROM c WHERE c1 + c2 > 0
"""


# =====================================================================
# seasonal decomposition (STL-lite: centered-MA trend + dow seasonal)
# =====================================================================

def q_seasonal_decompose(sf_dir: str):
    """Additive seasonal decomposition of daily revenue, STL-lite:
    trend = centered 7-day moving average (gap-aware RANGE frame, FULL
    windows only), seasonal = per-weekday mean of the detrended series
    — the classical-decomposition readout behind every forecast
    baseline. Scale: the <= #days exchange from rolling_corr; windowed
    sums via prefix sums + searchsorted; the detrended values are
    floats, so the per-dow mean is summed in DAY ORDER on both sides
    (ordered aggregate — float addition is not associative); trend and
    seasonal use the IDENTICAL expression tree both sides, 6 dp."""
    df = _day_rev_fold(sf_dir)
    day = df["day"].to_numpy(np.int64)
    rev = df["rev"].to_numpy(np.int64).astype(object)
    cs = np.concatenate(([0], np.cumsum(rev)))
    lo = np.searchsorted(day, day - 3, side="left")
    hi = np.searchsorted(day, day + 3, side="right")
    acc: dict[int, list] = {}
    for i in range(len(day)):
        n = int(hi[i] - lo[i])
        if n != 7:            # full centered windows only
            continue
        trend = float(int(cs[hi[i]] - cs[lo[i]])) / float(n)
        detr = float(int(rev[i])) - trend
        dow = int((day[i] + 3) % 7 + 1)
        acc.setdefault(dow, []).append(detr)   # day-ascending order
    rows = {"dow": [], "n_days": [], "seasonal": []}
    for dow in sorted(acc):
        vals = acc[dow]
        s = 0.0
        for v in vals:                          # sequential, day order
            s += v
        rows["dow"].append(dow)
        rows["n_days"].append(len(vals))
        rows["seasonal"].append(np.round(s / float(len(vals)), 6))
    return pa.table({"dow": pa.array(rows["dow"], pa.int64()),
                     "n_days": pa.array(rows["n_days"], pa.int64()),
                     "seasonal": pa.array(rows["seasonal"], pa.float64())})


SQL_SEASONAL_DECOMPOSE = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), w AS (
  SELECT day, rev,
    CAST(COUNT(*) OVER win AS BIGINT) AS n,
    CAST(SUM(rev) OVER win AS HUGEINT) AS s
  FROM d
  WINDOW win AS (ORDER BY day
                 RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), t AS (
  SELECT day, (day + 3) % 7 + 1 AS dow,
         CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
           AS detr
  FROM w WHERE n = 7
)
SELECT CAST(dow AS BIGINT) AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(SUM(detr ORDER BY day) / CAST(COUNT(*) AS DOUBLE), 6)
         AS seasonal
FROM t GROUP BY 1
"""


# =====================================================================
# DAU/WAU stickiness per week
# =====================================================================

def q_stickiness(sf_dir: str):
    """Weekly stickiness: sum of daily active users over the week's
    active days divided by (active days × weekly active users) — the
    avg-DAU/WAU engagement ratio every growth dashboard tracks. Scale:
    blocks emit DISTINCT (user, week, day) triples (np.unique combiner
    — the exchange carries per-block-distinct rows, never the event
    stream) through ONE user-hash exchange, so each partition owns all
    rows of its users and can emit exact (week, day)→dau and week→wau
    partials; a tiny (week, day) groupby folds them; driver finale on
    the bounded week table, exact ints until one division, 6 dp."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["ts", "user_id"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // DAY_US)
        tri = np.unique(np.stack([uid, day], axis=1), axis=0)
        kp = (_splitmix64(tri[:, 0]).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"u": pa.array(tri[:, 0]), "day": pa.array(tri[:, 1]),
                         "kp": pa.array(kp)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ud = np.unique(np.stack([g["u"].to_numpy(np.int64),
                                 g["day"].to_numpy(np.int64)], axis=1),
                       axis=0)
        u, day = ud[:, 0], ud[:, 1]
        wk = day // 7
        # dau partials: distinct (u, day) count per (week, day)
        keys, cnts = np.unique(np.stack([wk, day], axis=1), axis=0,
                               return_counts=True)
        # wau partials: distinct u per week (users are partition-local)
        uw = np.unique(np.stack([u, wk], axis=1), axis=0)
        wku, wau = np.unique(uw[:, 1], return_counts=True)
        return pd.DataFrame({
            "week": np.concatenate([keys[:, 0], wku]).astype(np.int64),
            "day": np.concatenate(
                [keys[:, 1], np.full(len(wku), -1)]).astype(np.int64),
            "dau": np.concatenate(
                [cnts, np.zeros(len(wku))]).astype(np.int64),
            "wau": np.concatenate(
                [np.zeros(len(keys)), wau]).astype(np.int64),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .groupby(["week", "day"])
           .aggregate(Sum("dau", alias_name="dau"),
                      Sum("wau", alias_name="wau")))
    df = agg.to_pandas()
    rows = {"week": [], "n_days": [], "dau_sum": [], "wau": [],
            "stickiness": []}
    for wk, g in df.groupby("week", sort=True):
        days = g[g["day"] >= 0]
        dau_sum = int(days["dau"].sum())
        n_days = int(len(days))
        wau = int(g["wau"].sum())
        rows["week"].append(int(wk))
        rows["n_days"].append(n_days)
        rows["dau_sum"].append(dau_sum)
        rows["wau"].append(wau)
        rows["stickiness"].append(np.round(
            float(dau_sum) / float(n_days * wau), 6))
    return pa.table({
        "week": pa.array(rows["week"], pa.int64()),
        "n_days": pa.array(rows["n_days"], pa.int64()),
        "dau_sum": pa.array(rows["dau_sum"], pa.int64()),
        "wau": pa.array(rows["wau"], pa.int64()),
        "stickiness": pa.array(rows["stickiness"], pa.float64())})


SQL_STICKINESS = """
WITH du AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
), wk AS (
  SELECT user_id, day, day // 7 AS week FROM du
), d AS (
  SELECT week, day, CAST(COUNT(*) AS BIGINT) AS dau
  FROM wk GROUP BY 1, 2
), w AS (
  SELECT week, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM wk GROUP BY 1
), s AS (
  SELECT week, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(dau) AS BIGINT) AS dau_sum
  FROM d GROUP BY 1
)
SELECT CAST(s.week AS BIGINT) AS week, s.n_days, s.dau_sum, w.wau,
       ROUND(CAST(s.dau_sum AS DOUBLE)
             / CAST(s.n_days * w.wau AS DOUBLE), 6) AS stickiness
FROM s JOIN w USING (week)
"""


# =====================================================================
# day-of-week × hour activity heatmap
# =====================================================================

def q_dow_hour_heatmap(sf_dir: str):
    """Event counts on the (ISO weekday × hour-of-day) grid — the
    activity heatmap behind crawl-rate scheduling (when is the site
    quiet?) and on-call staffing. Block-local bincount over the packed
    dow·24+hour code (<= 168 cells), ONE <= 168-row exchange, zero
    driver math — the bounded-grid shape at its simplest."""
    ds = _t(sf_dir, "events", ["ts"])

    def prep(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // DAY_US
        dow = (day + 3) % 7 + 1
        hour = (us % DAY_US) // 3_600_000_000
        code = dow * 24 + hour
        cnt = np.bincount(code, minlength=8 * 24).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            "dow": pa.array((nz // 24).astype(np.int64)),
            "hour": pa.array((nz % 24).astype(np.int64)),
            "n": pa.array(cnt[nz]),
        })

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["dow", "hour"])
            .aggregate(Sum("n", alias_name="n")))


SQL_DOW_HOUR_HEATMAP = """
SELECT CAST((epoch_us(ts) // 86400000000 + 3) % 7 + 1 AS BIGINT) AS dow,
       CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


# =====================================================================
# partition-skew audit (hash-layout health check)
# =====================================================================

def q_partition_skew(sf_dir: str, n_parts: int = 64):
    """Row counts per md5(user)%64 hash partition of the events table —
    the layout-health audit run before committing to a partition key
    (a skewed key makes every downstream shuffle lopsided). md5 == the
    md5_split convention (hashlib ≡ DuckDB md5), memoized per DISTINCT
    user per block so the digest cost is per-user, not per-row;
    <= 64-row bincount partials through one tiny exchange; share =
    exact integer ratio, 6 dp."""
    import hashlib

    ds = _t(sf_dir, "events", ["user_id"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu, inv = np.unique(uid, return_inverse=True)
        up = np.fromiter(
            (int(hashlib.md5(str(int(u)).encode()).hexdigest()[:8], 16)
             % n_parts for u in uu), dtype=np.int64, count=len(uu))
        part = up[inv]
        cnt = np.bincount(part, minlength=n_parts).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({"part": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz])})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("part")
           .aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas().sort_values("part", ignore_index=True)
    n = df["n"].to_numpy(np.int64)
    total = int(n.sum())
    return pa.table({
        "part": pa.array(df["part"].to_numpy(np.int64)),
        "n": pa.array(n),
        "share": pa.array(np.round(
            n.astype(np.float64) / float(total), 6), pa.float64())})


SQL_PARTITION_SKEW = """
WITH p AS (
  SELECT CAST(CONCAT('0x', SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 64 AS part
  FROM events
), c AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1
), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
SELECT c.part, c.n,
       ROUND(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share
FROM c, t
"""


# =====================================================================
# containment join (asymmetric set-similarity: quote / subset dedup)
# =====================================================================

def q_containment_join(sf_dir: str):
    """DIRECTIONAL containment join at C(a,b) = |A∩B| / |A| >= 0.8 over
    word-trigram shingle sets — the asymmetric complement to
    set_sim_join's Jaccard: a short doc quoted inside a long one has
    high containment but low Jaccard, which is exactly the subset/quote
    case training-data dedup must catch (Jaccard misses it by
    construction). Corpus: doc_id < 300 originals plus first-half-word
    sub-documents (planted containment 1.0). Plan (prefix filtering,
    Bayardo et al. 2007 adapted to the asymmetric threshold): the PROBE
    side emits only its |A| − ⌈τ|A|⌉ + 1 rarest shingles (any pair with
    C >= τ must share one), the INDEX side emits all shingles (the
    index doc's size is unbounded by the threshold); ONE token-hash-
    partitioned exchange pairs and verifies exactly in integer
    arithmetic (5·inter >= 4·|A|); a pair groupby dedups multi-token
    hits. Probe prefixes are rarest-first, so hot shingles never fan
    out on the probe side."""
    import pyarrow.dataset as pads

    from .dataops import _pair_part
    from crawlray.functions.murmur3 import hash64_batch_i64

    tau_n, tau_d = 4, 5
    base = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pads.field("doc_id") < 300)

    def doc_shingles(b: pa.Table) -> pa.Table:
        import re

        split = re.compile("[^a-z]+")
        ids, out = [], []
        for did, text in zip(b["doc_id"].to_pylist(),
                             b["text"].to_pylist()):
            w = [t for t in split.split((text or "").lower()) if t]
            # (original, first-half sub-doc) — WORD-level slice, the
            # oracle slices the same word array
            for offset, words in ((0, w), (1_000_000, w[:len(w) // 2])):
                sh = sorted({" ".join(words[j:j + 3])
                             for j in range(len(words) - 2)})
                if sh:
                    ids.append(did + offset)
                    out.append(",".join(sh))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "toks": pa.array(out, type=pa.string())})

    docs = base.map_batches(doc_shingles, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def tok_rows(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(b["toks"], ","))
        return pa.table({"token": flat})

    df_rows = (docs.map_batches(tok_rows, batch_format="pyarrow")
               .groupby("token").count().take_all())
    df_lut = {r["token"]: int(r["count()"]) for r in df_rows}
    lut_ref = ray.put(df_lut)

    def emit(b: pa.Table) -> pa.Table:
        import ray as _r

        lut = _r.get(lut_ref)
        out_tok, out_id, out_sz, out_payload, out_side = [], [], [], [], []
        for did, toks in zip(b["doc_id"].to_pylist(),
                             b["toks"].to_pylist()):
            s = toks.split(",")
            n = len(s)
            ordered = sorted(s, key=lambda t: (lut[t], t))
            npref = n - (-(-tau_n * n // tau_d)) + 1
            payload = ",".join(ordered)
            for i, t in enumerate(ordered):
                probe = i < npref
                out_tok.append(t)
                out_id.append(did)
                out_sz.append(n)
                out_payload.append(payload)
                out_side.append(1 if probe else 0)
        tok_arr = pa.array(out_tok, type=pa.string())
        h = np.asarray(hash64_batch_i64(tok_arr))
        return pa.table({
            "token": tok_arr,
            "tpart": pa.array(_pair_part(h)),
            "doc_id": pa.array(out_id, type=pa.int64()),
            "sz": pa.array(out_sz, type=pa.int64()),
            "toks": pa.array(out_payload, type=pa.string()),
            "probe": pa.array(out_side, type=pa.int64()),
        })

    def pair_verify(part: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out, c_out = [], [], []
        for _tok, g in part.groupby("token", sort=False):
            ids = g["doc_id"].to_numpy()
            szs = g["sz"].to_numpy()
            probes = g["probe"].to_numpy()
            sets = [set(t.split(",")) for t in g["toks"].to_numpy()]
            for i in range(len(ids)):
                if probes[i] != 1:
                    continue
                for j in range(len(ids)):
                    if ids[i] == ids[j]:
                        continue
                    # |B| >= ⌈τ|A|⌉ is necessary for containment
                    if szs[j] * tau_d < szs[i] * tau_n:
                        continue
                    inter = len(sets[i] & sets[j])
                    if inter * tau_d >= szs[i] * tau_n:
                        a_out.append(ids[i])
                        b_out.append(ids[j])
                        c_out.append(inter / szs[i])
        return pd.DataFrame({
            "doc_a": pd.Series(a_out, dtype=np.int64),
            "doc_b": pd.Series(b_out, dtype=np.int64),
            "cont": pd.Series(np.round(c_out, 6), dtype=np.float64),
        })

    pairs = (docs.map_batches(emit, batch_format="pyarrow")
             .groupby("tpart")
             .map_groups(pair_verify, batch_format="pandas"))
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("cont", alias_name="cont"))


SQL_CONTAINMENT_JOIN = """
WITH w0 AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                x -> x <> '') AS l
  FROM documents WHERE doc_id < 300
), corpus AS (
  SELECT doc_id, l FROM w0
  UNION ALL
  SELECT doc_id + 1000000, l[1:len(l) // 2] FROM w0
), tok AS (
  SELECT DISTINCT doc_id, array_to_string(l[g:g+2], ' ') AS token
  FROM corpus, UNNEST(generate_series(1, len(l) - 2)) AS t(g)
), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
ipairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id <> b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
  ROUND(CAST(inter AS DOUBLE) / sa.sz, 6) AS cont
FROM ipairs
JOIN sizes sa ON sa.doc_id = doc_a
WHERE 5 * inter >= 4 * sa.sz
"""


# =====================================================================
# char-bigram cross-entropy per source (OOD source detector)
# =====================================================================

def q_char_xentropy(sf_dir: str):
    """Per-source cross-entropy under the CORPUS char-bigram model —
    the out-of-distribution detector that flags a feed whose character
    statistics drift from the corpus (encoding rot, language change,
    boilerplate takeover) without any labeled data. Normalization maps
    non-[a-z] to space on both sides; the alphabet is 27 symbols, so
    per-(source, bigram) counts are <= |sources|·729 exact int64
    partials through ONE tiny exchange, the GLOBAL model is the
    column-sum of that same table (no second pass over the corpus),
    and every ln argument is an exact integer ratio. The per-source
    term sum is ordered by bigram (ordered aggregate in SQL, ascending
    code here — space sorts before 'a' in BOTH orders), 6 dp."""
    from .dataops import _docs

    ds = _docs(sf_dir, ["source", "text"])

    # byte → symbol code: 0 = space (and every non-letter), 1..26 = a..z
    lut = np.zeros(256, np.int64)
    for i in range(26):
        lut[ord("a") + i] = i + 1

    def prep(b: pa.Table) -> pa.Table:
        src = np.asarray(b["source"], dtype=object)
        us, sinv = np.unique(src, return_inverse=True)
        counts = np.zeros((len(us), 27 * 27), np.int64)
        for i, text in enumerate(b["text"].to_pylist()):
            if text is None:
                continue
            raw = text.lower().encode("utf-8", "replace")
            # non-ASCII bytes all map to code 0 == the oracle's space
            # (regexp_replace('[^a-z]', ' ') is per-CHARACTER; fixture
            # text is ASCII, asserted by the oracle match itself)
            codes = lut[np.frombuffer(raw, dtype=np.uint8)]
            if len(codes) < 2:
                continue
            bg = codes[:-1] * 27 + codes[1:]
            counts[sinv[i]] += np.bincount(bg, minlength=27 * 27)
        nz = np.nonzero(counts)
        return pa.table({
            "source": pa.array(us[nz[0]]),
            "code": pa.array(nz[1].astype(np.int64)),
            "c": pa.array(counts[nz].astype(np.int64)),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["source", "code"])
           .aggregate(Sum("c", alias_name="c")))
    df = agg.to_pandas()  # <= |sources|·729 rows — bounded fold
    g = df.groupby("code")["c"].sum()          # global bigram counts
    gc = {int(k): int(v) for k, v in g.items()}
    g1: dict[int, int] = {}
    for code, v in gc.items():
        g1[code // 27] = g1.get(code // 27, 0) + v
    rows = {"source": [], "n_bigrams": [], "xent": []}
    for src, grp in df.groupby("source", sort=True):
        grp = grp.sort_values("code")
        total = int(grp["c"].sum())
        acc = 0.0
        for code, c in zip(grp["code"], grp["c"]):
            code, c = int(code), int(c)
            acc += float(c) * math.log(
                float(gc[code]) / float(g1[code // 27]))
        rows["source"].append(str(src))
        rows["n_bigrams"].append(total)
        rows["xent"].append(np.round(-acc / float(total), 6))
    return pa.table({
        "source": pa.array(rows["source"], pa.string()),
        "n_bigrams": pa.array(rows["n_bigrams"], pa.int64()),
        "xent": pa.array(rows["xent"], pa.float64())})


SQL_CHAR_XENTROPY = """
WITH n AS (
  SELECT source, regexp_replace(lower(text), '[^a-z]', ' ', 'g') AS s
  FROM documents WHERE text IS NOT NULL
), bg AS (
  SELECT source, substring(s, CAST(i AS INT), 2) AS b
  FROM n, UNNEST(generate_series(1, length(s) - 1)) AS t(i)
  WHERE length(s) >= 2
), c AS (
  SELECT source, b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2
), g AS (
  SELECT b, CAST(SUM(c) AS BIGINT) AS gc FROM c GROUP BY 1
), g1 AS (
  SELECT substring(b, 1, 1) AS c1, CAST(SUM(gc) AS BIGINT) AS g1c
  FROM g GROUP BY 1
), t AS (
  SELECT c.source, c.b, c.c, g.gc, g1.g1c
  FROM c JOIN g USING (b)
  JOIN g1 ON g1.c1 = substring(c.b, 1, 1)
)
SELECT source, CAST(SUM(c) AS BIGINT) AS n_bigrams,
  ROUND(-SUM(CAST(c AS DOUBLE)
             * LN(CAST(gc AS DOUBLE) / CAST(g1c AS DOUBLE))
             ORDER BY b) / CAST(SUM(c) AS DOUBLE), 6) AS xent
FROM t GROUP BY 1
"""


# =====================================================================
# weighted co-supply projection (bipartite → weighted graph)
# =====================================================================

def q_weighted_projection(sf_dir: str):
    """WEIGHTED projection of the part–supplier bipartite graph:
    supplier pairs with edge weight = number of DISTINCT shared parts
    (parts < 200), weight >= 2 — the graph triangle_count / kcore /
    clustering_coeff analyze unweighted, now with the tie strength a
    partner-recommendation ranker needs. Scale shape: distinct (part,
    supp) projection distributed; per-part pair emission bounded per
    group; pairs pack into ONE int64 key ((u << 32) | v — supplier keys
    are < 2^31, asserted) and fold through a packed-key-hash partition
    bincount (the common_neighbors shape: a Ray string/struct Aggregate
    over ~10⁶ pair groups measured two orders slower)."""
    import pyarrow.dataset as pads

    from .analytics import _sized_read
    from .sizing import fold_parts

    n_parts = fold_parts()
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
        sup = np.unique(g["s"].to_numpy().astype(np.int64))
        if len(sup) < 2:
            return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                 "kp": pd.Series([], dtype=np.int64)})
        assert sup.max() < (1 << 31), "suppkey exceeds the 32-bit pack"
        iu, iv = np.triu_indices(len(sup), k=1)
        key = (sup[iu] << np.int64(32)) | sup[iv]
        kp = (_splitmix64(key).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pd.DataFrame({"key": key, "kp": kp})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy(np.int64)
        uk, w = np.unique(key, return_counts=True)
        keep = w >= 2
        uk, w = uk[keep], w[keep].astype(np.int64)
        return pd.DataFrame({
            "u": (uk >> np.int64(32)).astype(np.int64),
            "v": (uk & np.int64(0xFFFFFFFF)).astype(np.int64),
            "w": w,
        })

    return (ds.map_batches(distinct_ps, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("p").map_groups(co_pairs, batch_format="pandas")
            .groupby("kp").map_groups(fold, batch_format="pandas")
            .select_columns(["u", "v", "w"]))


SQL_WEIGHTED_PROJECTION = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
            FROM lineitem WHERE l_partkey < 200)
SELECT a.s AS u, b.s AS v, CAST(COUNT(*) AS BIGINT) AS w
FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""


# =====================================================================
# exponential time-decay revenue score per customer
# =====================================================================

def q_decay_score(sf_dir: str):
    """Per-customer revenue with exponential recency decay: each
    order's cents are weighted 2^(−k), k = 30-day buckets of age from
    the newest order (capped at 30 buckets ≈ a 10⁻⁹ floor) — the
    recency-weighted LTV a re-engagement ranker scores on (crawl twin:
    recency-weighted host value for revisit priority). EXACT by
    construction: the weight is a power of two, so cents·2^(30−k) is
    an integer — partials are int64, distributed Sum order cannot
    round, and the single final division by 2^30 is exact dyadic; the
    6-dp finale emulates DuckDB's half-away ROUND. One Min/Max day
    fold for the anchor, one custkey exchange of int64 partials."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    bounds = ds.map_batches(
        lambda b: pa.table({"hi": pa.array(
            [pc.max(b["o_orderdate"]).cast(pa.int64()).as_py() // DAY_US],
            pa.int64())}),
        batch_format="pyarrow").aggregate(Max("hi"))
    maxd = int(bounds["max(hi)"])

    def prep(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        c = _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)
        k = np.minimum((maxd - day) // 30, 30)
        assert int(c.max()) < (1 << 33), "cents exceed the 2^33 shift bound"
        scaled = c << (30 - k)                  # exact int64
        t = pa.table({"ck": b["o_custkey"], "scaled": pa.array(scaled)})
        g = t.group_by("ck").aggregate([("scaled", "sum")])
        return g.rename_columns(["ck", "scaled"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("ck")
           .aggregate(Sum("scaled", alias_name="scaled")))

    def finalize(b: pa.Table) -> pa.Table:
        s = b["scaled"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = s / 1073741824.0                # exact dyadic division
        y = score * 1e6
        r6 = np.where(y >= 0, np.floor(y + 0.5), -np.floor(-y + 0.5)) / 1e6
        return pa.table({"ck": b["ck"], "score": pa.array(r6, pa.float64())})

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_DECAY_SCORE = """
WITH b AS (
  SELECT MAX(epoch_us(o_orderdate) // 86400000000) AS maxd FROM orders
), o AS (
  SELECT o_custkey AS ck,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
         LEAST((b.maxd - epoch_us(o_orderdate) // 86400000000) // 30, 30)
           AS k
  FROM orders, b
)
SELECT ck,
  ROUND(CAST(SUM(c * (CAST(1 AS BIGINT) << CAST(30 - k AS INT)))
             AS DOUBLE) / 1073741824.0, 6) AS score
FROM o GROUP BY 1
"""


# =====================================================================
# linear (equal-split) multi-touch attribution
# =====================================================================

def q_linear_attribution(sf_dir: str):
    """LINEAR multi-touch attribution: every purchase's cents split
    EQUALLY across all prior non-purchase touches of that user —
    completing the attribution triple next to first_touch and
    last_touch. The split is exact-INTEGER by convention: each of the
    k touches gets cents // k and the remainder goes to the EARLIEST
    touch ((ts, event_id) tuple order, rank 1) — no fractional cents,
    so the distributed fold is an order-free int64 Sum; purchases with
    no prior touch credit 'direct'. ONE user-hash exchange; per-user
    vectorized prefix counts (touches are sorted once, purchases
    binary-search their cut); <= |types| finale."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts",
                               "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"], "event_id": b["event_id"],
            "ts": b["ts"].cast(pa.int64()),
            "event_type": b["event_type"],
            "c": _cents(b["value"]),
            "kp": pa.array(kp),
        })

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        credits: dict[str, int] = {}
        for _u, gu in g.groupby("user_id", sort=False):
            ts = gu["ts"].to_numpy(np.int64)
            eid = gu["event_id"].to_numpy(np.int64)
            et = gu["event_type"].to_numpy()
            c = gu["c"].to_numpy(np.int64)
            order = np.lexsort((eid, ts))
            ts, eid, et, c = ts[order], eid[order], et[order], c[order]
            is_p = et == "purchase"
            t_idx = np.nonzero(~is_p)[0]        # touches in tuple order
            t_types = et[t_idx]
            for pi in np.nonzero(is_p)[0]:
                # touches strictly before the purchase in tuple order
                k = int(np.searchsorted(t_idx, pi, side="left"))
                cents = int(c[pi])
                if k == 0:
                    credits["direct"] = credits.get("direct", 0) + cents
                    continue
                q, r = divmod(cents, k)
                for j in range(k):
                    ty = str(t_types[j])
                    credits[ty] = credits.get(ty, 0) \
                        + q + (r if j == 0 else 0)
        if not credits:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "cents": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({
            "event_type": list(credits.keys()),
            "cents": np.array(list(credits.values()), np.int64)})

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(per_part, batch_format="pandas")
            .groupby("event_type")
            .aggregate(Sum("cents", alias_name="cents")))


SQL_LINEAR_ATTRIBUTION = """
WITH t AS (
  SELECT user_id, event_id, epoch_us(ts) AS tu, event_type
  FROM events WHERE event_type <> 'purchase'
), p AS (
  SELECT user_id, event_id, epoch_us(ts) AS tu,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
), pt AS (
  SELECT p.user_id, p.event_id AS pe, p.c, t.event_type,
    ROW_NUMBER() OVER (PARTITION BY p.user_id, p.event_id
                       ORDER BY t.tu, t.event_id) AS rn,
    COUNT(*) OVER (PARTITION BY p.user_id, p.event_id) AS k
  FROM p JOIN t ON t.user_id = p.user_id
    AND (t.tu < p.tu OR (t.tu = p.tu AND t.event_id < p.event_id))
), credit AS (
  SELECT event_type,
         SUM(c // k + CASE WHEN rn = 1 THEN c % k ELSE 0 END) AS cents
  FROM pt GROUP BY 1
  UNION ALL
  SELECT 'direct', SUM(c)
  FROM p WHERE NOT EXISTS (
    SELECT 1 FROM t WHERE t.user_id = p.user_id
      AND (t.tu < p.tu OR (t.tu = p.tu AND t.event_id < p.event_id)))
)
SELECT event_type, CAST(SUM(cents) AS BIGINT) AS cents
FROM credit GROUP BY 1
"""


# =====================================================================
# Flesch-style readability per source
# =====================================================================

def q_readability(sf_dir: str):
    """Flesch reading-ease per source from corpus-exact counts:
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with
    words = [a-z]+ runs of the lowercased text, sentences = [.!?]+
    runs (floored at 1 per doc), syllables ≈ [aeiou]+ vowel runs — the
    standard automated approximation, identical RE2 counts on both
    sides. All three counts are exact int64 per-source partials
    through ONE <= |sources| exchange (three Arrow
    count_substring_regex kernels per block, no token explosion); the
    finale is ONE identical IEEE expression, 6 dp."""
    from .dataops import _docs

    ds = _docs(sf_dir, ["source", "text"])

    def prep(b: pa.Table) -> pa.Table:
        ok = pc.is_valid(b["text"])
        t = b.filter(ok)
        low = pc.utf8_lower(t["text"].combine_chunks())
        w = pc.count_substring_regex(low, "[a-z]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = pc.count_substring_regex(low, "[.!?]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.count_substring_regex(low, "[aeiou]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.maximum(s, 1)                    # >= 1 sentence per doc
        src = np.asarray(t["source"], dtype=object)
        us, inv = np.unique(src, return_inverse=True)
        out = {"source": pa.array(us)}
        for name, v in (("w", w), ("s", s), ("y", y)):
            acc = np.zeros(len(us), np.int64)
            np.add.at(acc, inv, v)
            out[name] = pa.array(acc)
        return pa.table(out)

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("w", alias_name="w"), Sum("s", alias_name="s"),
                      Sum("y", alias_name="y")))
    df = agg.to_pandas().sort_values("source", ignore_index=True)
    rows = {"source": [], "words": [], "flesch": []}
    for _, r in df.iterrows():
        w, s, y = int(r["w"]), int(r["s"]), int(r["y"])
        if w == 0:
            continue
        f = 206.835 - 1.015 * (float(w) / float(s)) \
            - 84.6 * (float(y) / float(w))
        rows["source"].append(str(r["source"]))
        rows["words"].append(w)
        rows["flesch"].append(np.round(f, 6))
    return pa.table({
        "source": pa.array(rows["source"], pa.string()),
        "words": pa.array(rows["words"], pa.int64()),
        "flesch": pa.array(rows["flesch"], pa.float64())})


SQL_READABILITY = """
WITH d AS (
  SELECT source,
    CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS w,
    GREATEST(CAST(len(regexp_extract_all(lower(text), '[.!?]+'))
                  AS BIGINT), 1) AS s,
    CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS y
  FROM documents WHERE text IS NOT NULL
), g AS (
  SELECT source, CAST(SUM(w) AS BIGINT) AS w, CAST(SUM(s) AS BIGINT) AS s,
         CAST(SUM(y) AS BIGINT) AS y
  FROM d GROUP BY 1
)
SELECT source, w AS words,
  ROUND(206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
        - 84.6 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE)), 6) AS flesch
FROM g WHERE w > 0
"""


# =====================================================================
# log-log price elasticity per brand (quantized-ln OLS)
# =====================================================================

def q_elasticity(sf_dir: str):
    """Log-log OLS slope of ln(quantity) on ln(price) per brand — the
    price-elasticity readout every pricing team fits first. Both ln
    values QUANTIZE to exact milli-unit int64 before any sum (ROUND
    half-away — the scale cancels in the slope, and integer moments
    make the distributed fold order-free; ln of an exact integer is
    bit-identical libm on both sides). Brand rides the broadcast part
    LUT (the brand_margin shape — dimension never joins); five moment
    partials per brand per block through a <= |brands| exchange; slope
    = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) in unbounded python ints (oracle
    HUGEINT), one division, 6 dp."""
    import pyarrow.parquet as pq

    pt = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_brand"])
    pk = np.asarray(pt["p_partkey"], dtype=np.int64)
    brands, bcode = np.unique(np.asarray(pt["p_brand"], dtype=object),
                              return_inverse=True)
    lut_code = np.zeros(int(pk.max()) + 1, np.int64)
    lut_code[pk] = bcode
    lut_ref = ray.put((lut_code, len(brands)))

    ds = _t(sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        import ray as _r

        code_lut, nb = _r.get(lut_ref)
        p = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cents = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        x = np.log(cents.astype(np.float64)) * 1000.0
        y = np.log(qty.astype(np.float64)) * 1000.0
        xq = np.where(x >= 0, np.floor(x + 0.5),
                      -np.floor(-x + 0.5)).astype(np.int64)
        yq = np.where(y >= 0, np.floor(y + 0.5),
                      -np.floor(-y + 0.5)).astype(np.int64)
        code = code_lut[p]
        out = {"code": pa.array(np.arange(nb, dtype=np.int64))}
        for name, v in (("n", np.ones(len(p), np.int64)),
                        ("sx", xq), ("sy", yq),
                        ("sxx", xq * xq), ("sxy", xq * yq)):
            s = np.zeros(nb, np.int64)
            np.add.at(s, code, v)
            out[name] = pa.array(s)
        return pa.table(out)

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("code")
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ["n", "sx", "sy", "sxx", "sxy"]]))
    df = agg.to_pandas().sort_values("code", ignore_index=True)
    rows = {"brand": [], "n": [], "elasticity": []}
    for _, r in df.iterrows():
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, sxy = int(r["sxx"]), int(r["sxy"])
        den = n * sxx - sx * sx
        if n == 0 or den == 0:
            continue
        rows["brand"].append(str(brands[int(r["code"])]))
        rows["n"].append(n)
        rows["elasticity"].append(np.round(
            float(n * sxy - sx * sy) / float(den), 6))
    return pa.table({
        "brand": pa.array(rows["brand"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "elasticity": pa.array(rows["elasticity"], pa.float64())})


SQL_ELASTICITY = """
WITH q AS (
  SELECT p.p_brand AS brand,
    CAST(ROUND(1000 * LN(CAST(CAST(ROUND(l.l_extendedprice * 100)
                                   AS BIGINT) AS DOUBLE))) AS BIGINT) AS x,
    CAST(ROUND(1000 * LN(CAST(CAST(ROUND(l.l_quantity) AS BIGINT)
                              AS DOUBLE))) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), m AS (
  SELECT brand, CAST(COUNT(*) AS HUGEINT) AS n,
    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
    CAST(SUM(x * x) AS HUGEINT) AS sxx,
    CAST(SUM(x * y) AS HUGEINT) AS sxy
  FROM q GROUP BY 1
)
SELECT brand, CAST(n AS BIGINT) AS n,
  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS elasticity
FROM m WHERE n * sxx - sx * sx <> 0
"""


# =====================================================================
# degree assortativity of the co-supply graph
# =====================================================================

def q_degree_assortativity(sf_dir: str):
    """Degree assortativity coefficient (Newman 2002) of the co-supply
    graph: Pearson correlation between the degrees at the two ends of
    every edge (both orientations) — one number that says whether hubs
    link to hubs (positive) or to the periphery (negative). Scale
    shape: the distributed distinct-projection + per-part pair emission
    from triangle_count; the DIMENSION-sized edge set folds once,
    degrees come from one bincount, and the moment sums are exact
    unbounded python ints (oracle HUGEINT) — ONE identical IEEE
    expression at the end, 6 dp."""
    import pyarrow.dataset as pads

    from .analytics import _sized_read

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
    chunks = [np.stack([b["u"].to_numpy(zero_copy_only=False),
                        b["v"].to_numpy(zero_copy_only=False)], axis=1)
              for b in co.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")]
    if not chunks:
        return pa.table({"n_edges": pa.array([0], pa.int64()),
                         "r": pa.array([None], pa.float64())})
    uv = np.unique(np.concatenate(chunks).astype(np.int64), axis=0)
    nodes, inv = np.unique(uv, return_inverse=True)
    deg = np.bincount(inv).astype(np.int64)
    idx = inv.reshape(uv.shape)
    # both orientations: x = deg at one end, y = deg at the other
    x = np.concatenate([deg[idx[:, 0]], deg[idx[:, 1]]]).astype(object)
    y = np.concatenate([deg[idx[:, 1]], deg[idx[:, 0]]]).astype(object)
    m = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy = int((x * x).sum()), int((y * y).sum())
    sxy = int((x * y).sum())
    den2 = (m * sxx - sx * sx) * (m * syy - sy * sy)
    r = None if den2 <= 0 else np.round(
        float(m * sxy - sx * sy) / math.sqrt(float(den2)), 6)
    return pa.table({"n_edges": pa.array([len(uv)], pa.int64()),
                     "r": pa.array([r], pa.float64())})


SQL_DEGREE_ASSORTATIVITY = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
            FROM lineitem WHERE l_partkey < 200),
e AS (SELECT DISTINCT a.s AS u, b.s AS v
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
d AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM sym GROUP BY 1),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS m,
    CAST(SUM(du.deg) AS HUGEINT) AS sx,
    CAST(SUM(dv.deg) AS HUGEINT) AS sy,
    CAST(SUM(du.deg * du.deg) AS HUGEINT) AS sxx,
    CAST(SUM(dv.deg * dv.deg) AS HUGEINT) AS syy,
    CAST(SUM(du.deg * dv.deg) AS HUGEINT) AS sxy
  FROM sym JOIN d du ON du.node = sym.u JOIN d dv ON dv.node = sym.v
)
SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
  CASE WHEN (m * sxx - sx * sx) * (m * syy - sy * sy) > 0
       THEN ROUND(CAST(m * sxy - sx * sy AS DOUBLE)
                  / SQRT(CAST((m * sxx - sx * sx)
                              * (m * syy - sy * sy) AS DOUBLE)), 6)
       END AS r
FROM m
"""


# =====================================================================
# customer quartile-migration matrix (H1 → H2)
# =====================================================================

def q_customer_migration(sf_dir: str):
    """Customer revenue-quartile MIGRATION matrix: each customer active
    in both halves of the span is quartiled within each half (NTILE(4)
    over that half's active customers, rev DESC + custkey tie-break)
    and the 4×4 transition counts show who climbs and who churns in
    place — the cohort-movement readout behind every retention deck.
    Span midpoint from ONE Min/Max day fold (topk_movers' rule);
    per-customer half revenues fold through ONE custkey exchange as
    tagged int64 sums; EACH half's quartile runs rfm_segments'
    distributed NTILE (skinny range sort + offset fold); the two
    (ck, tile) pair sets and the activity flags re-join by riding one
    more custkey exchange as Sum-able tagged columns; <= 16-row
    finale."""
    from .analytics import _ntile_pairs

    ds = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    bounds = ds.map_batches(
        lambda b: pa.table({
            "lo": pa.array([pc.min(b["o_orderdate"]).cast(pa.int64())
                            .as_py() // DAY_US], pa.int64()),
            "hi": pa.array([pc.max(b["o_orderdate"]).cast(pa.int64())
                            .as_py() // DAY_US], pa.int64())}),
        batch_format="pyarrow").aggregate(Min("lo"), Max("hi"))
    lo, hi = int(bounds["min(lo)"]), int(bounds["max(hi)"])
    mid = (lo + hi) // 2

    def prep(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        c = _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)
        h2 = day > mid
        t = pa.table({
            "ck": b["o_custkey"],
            "r1": pa.array(np.where(h2, 0, c).astype(np.int64)),
            "r2": pa.array(np.where(h2, c, 0).astype(np.int64)),
        })
        g = t.group_by("ck").aggregate([("r1", "sum"), ("r2", "sum")])
        return g.rename_columns(["ck", "r1", "r2"])

    per_cust = (ds.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("ck")
                .aggregate(Sum("r1", alias_name="r1"),
                           Sum("r2", alias_name="r2"))
                .materialize())

    def active(col):
        def fn(b: pa.Table) -> pa.Table:
            keep = pc.greater(b[col], pa.scalar(0, pa.int64()))
            t = b.filter(keep)
            return pa.table({"mon": t[col], "ck": t["ck"]})
        return fn

    h1 = per_cust.map_batches(active("r1"),
                              batch_format="pyarrow").materialize()
    h2 = per_cust.map_batches(active("r2"),
                              batch_format="pyarrow").materialize()

    def tag(which: int):
        def fn(b: pa.Table) -> pa.Table:
            tiles = b["tile"].to_numpy(zero_copy_only=False)
            z = np.zeros(len(tiles), np.int64)
            return pa.table({
                "ck": b["ck"],
                "q1": pa.array(tiles if which == 0 else z),
                "q2": pa.array(tiles if which == 1 else z)})
        return fn

    pairs = _ntile_pairs(h1, "mon").map_batches(
        tag(0), batch_format="pyarrow").union(
        _ntile_pairs(h2, "mon").map_batches(tag(1),
                                            batch_format="pyarrow"))
    joined = (pairs.groupby("ck")
              .aggregate(Sum("q1", alias_name="q1"),
                         Sum("q2", alias_name="q2")))

    def cells(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(b["q1"], pa.scalar(0, pa.int64())),
                       pc.greater(b["q2"], pa.scalar(0, pa.int64())))
        t = b.filter(keep)
        g = t.group_by(["q1", "q2"]).aggregate([([], "count_all")])
        return g.rename_columns(["q1", "q2", "n"])

    return (joined.map_batches(cells, batch_format="pyarrow")
            .groupby(["q1", "q2"])
            .aggregate(Sum("n", alias_name="n")))


SQL_CUSTOMER_MIGRATION = """
WITH b AS (
  SELECT (MIN(epoch_us(o_orderdate) // 86400000000)
          + MAX(epoch_us(o_orderdate) // 86400000000)) // 2 AS mid
  FROM orders
), r AS (
  SELECT o_custkey AS ck,
    SUM(CASE WHEN epoch_us(o_orderdate) // 86400000000 <= b.mid
        THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS r1,
    SUM(CASE WHEN epoch_us(o_orderdate) // 86400000000 > b.mid
        THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS r2
  FROM orders, b GROUP BY 1
), t1 AS (
  SELECT ck, CAST(NTILE(4) OVER (ORDER BY r1 DESC, ck) AS BIGINT) AS q1
  FROM r WHERE r1 > 0
), t2 AS (
  SELECT ck, CAST(NTILE(4) OVER (ORDER BY r2 DESC, ck) AS BIGINT) AS q2
  FROM r WHERE r2 > 0
)
SELECT q1, q2, CAST(COUNT(*) AS BIGINT) AS n
FROM t1 JOIN t2 USING (ck) GROUP BY 1, 2
"""


# =====================================================================
# OLS residual outliers (model-based anomaly detection)
# =====================================================================

def q_residual_outliers(sf_dir: str, k: int = 20):
    """Top-20 lineitems by |residual| under the per-returnflag
    two-feature OLS from ols_two — MODEL-based outlier detection (the
    row the fitted pricing relation explains worst), next to the
    distributional outlier_docs. Two passes: the bounded moment fold
    re-derives the exact coefficients (same python-int Cramer
    determinants as the oracle's HUGEINT), then a broadcast-coefficient
    scoring pass keeps a per-block partial top-k by (|resid| DESC,
    orderkey, linenumber) — <= k·blocks driver rows, no global sort.
    Residuals are the IDENTICAL IEEE expression both sides; ranking
    compares the unrounded double, output rounds 6 dp."""
    ds = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_linenumber", "l_returnflag",
             "l_quantity", "l_discount", "l_extendedprice"])

    def moments(b: pa.Table) -> pa.Table:
        q = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d = _cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        y = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        flags = np.asarray(b["l_returnflag"], dtype=object)
        uf, inv = np.unique(flags, return_inverse=True)
        cols = {"n": np.ones(len(q), np.int64), "sq": q, "sd": d,
                "sqq": q * q, "sqd": q * d, "sdd": d * d,
                "sy": y, "sqy": q * y, "sdy": d * y}
        out = {"flag": pa.array(uf)}
        for kname, v in cols.items():
            s = np.zeros(len(uf), np.int64)
            np.add.at(s, inv, v)
            out[kname] = pa.array(s)
        return pa.table(out)

    agg = (ds.map_batches(moments, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("flag")
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ["n", "sq", "sd", "sqq", "sqd", "sdd",
                                  "sy", "sqy", "sdy"]]))
    mdf = agg.to_pandas()

    def det3(m):
        return (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))

    coef: dict[str, tuple] = {}
    for _, r in mdf.iterrows():
        n, sq, sd = int(r["n"]), int(r["sq"]), int(r["sd"])
        sqq, sqd, sdd = int(r["sqq"]), int(r["sqd"]), int(r["sdd"])
        sy, sqy, sdy = int(r["sy"]), int(r["sqy"]), int(r["sdy"])
        xtx = [[n, sq, sd], [sq, sqq, sqd], [sd, sqd, sdd]]
        xty = [sy, sqy, sdy]
        den = det3(xtx)
        if den == 0:
            continue
        bs = []
        for j in range(3):
            m = [row[:] for row in xtx]
            for i in range(3):
                m[i][j] = xty[i]
            bs.append(float(det3(m)) / float(den))
        coef[str(r["flag"])] = tuple(bs)
    coef_ref = ray.put(coef)

    def score(b: pa.Table) -> pa.Table:
        import ray as _r

        cf = _r.get(coef_ref)
        q = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        d = _cents(b["l_discount"]).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        flags = np.asarray(b["l_returnflag"], dtype=object)
        b0 = np.array([cf[f][0] for f in flags])
        b1 = np.array([cf[f][1] for f in flags])
        b2 = np.array([cf[f][2] for f in flags])
        resid = y - (b0 + b1 * q + b2 * d)
        okey = b["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = b["l_linenumber"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((ln, okey, -np.abs(resid)))[:k]
        return pa.table({
            "okey": pa.array(okey[order].astype(np.int64)),
            "line": pa.array(ln[order]),
            "resid": pa.array(resid[order], pa.float64()),
        })

    rows = [r for b in ds.map_batches(score, batch_format="pyarrow",
                                      zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow")
            for r in zip(b["okey"].to_pylist(), b["line"].to_pylist(),
                         b["resid"].to_pylist())]
    rows.sort(key=lambda r: (-abs(r[2]), r[0], r[1]))
    top = rows[:k]
    return pa.table({
        "okey": pa.array([r[0] for r in top], pa.int64()),
        "line": pa.array([r[1] for r in top], pa.int64()),
        "resid": pa.array([np.round(r[2], 6) for r in top], pa.float64())})


SQL_RESIDUAL_OUTLIERS = """
WITH m AS (
  SELECT l_returnflag AS flag,
    CAST(COUNT(*) AS HUGEINT) AS n,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS HUGEINT) AS sq,
    CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS HUGEINT) AS sd,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
             * CAST(ROUND(l_quantity) AS BIGINT)) AS HUGEINT) AS sqq,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
             * CAST(ROUND(l_discount * 100) AS BIGINT)) AS HUGEINT) AS sqd,
    CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
             * CAST(ROUND(l_discount * 100) AS BIGINT)) AS HUGEINT) AS sdd,
    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
      AS sy,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
             * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
      AS sqy,
    CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
             * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
      AS sdy
  FROM lineitem GROUP BY 1
), cf AS (
  SELECT flag,
    CAST(sy * (sqq * sdd - sqd * sqd) - sq * (sqy * sdd - sqd * sdy)
         + sd * (sqy * sqd - sqq * sdy) AS DOUBLE)
      / CAST(n * (sqq * sdd - sqd * sqd) - sq * (sq * sdd - sqd * sd)
             + sd * (sq * sqd - sqq * sd) AS DOUBLE) AS b0,
    CAST(n * (sqy * sdd - sqd * sdy) - sy * (sq * sdd - sqd * sd)
         + sd * (sq * sdy - sqy * sd) AS DOUBLE)
      / CAST(n * (sqq * sdd - sqd * sqd) - sq * (sq * sdd - sqd * sd)
             + sd * (sq * sqd - sqq * sd) AS DOUBLE) AS b1,
    CAST(n * (sqq * sdy - sqy * sqd) - sq * (sq * sdy - sqy * sd)
         + sy * (sq * sqd - sqq * sd) AS DOUBLE)
      / CAST(n * (sqq * sdd - sqd * sqd) - sq * (sq * sdd - sqd * sd)
             + sd * (sq * sqd - sqq * sd) AS DOUBLE) AS b2
  FROM m
), r AS (
  SELECT l.l_orderkey AS okey, CAST(l.l_linenumber AS BIGINT) AS line,
    CAST(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS DOUBLE)
      - (cf.b0
         + cf.b1 * CAST(CAST(ROUND(l.l_quantity) AS BIGINT) AS DOUBLE)
         + cf.b2 * CAST(CAST(ROUND(l.l_discount * 100) AS BIGINT)
                        AS DOUBLE)) AS resid
  FROM lineitem l JOIN cf ON cf.flag = l.l_returnflag
)
SELECT okey, line, ROUND(resid, 6) AS resid
FROM r
QUALIFY ROW_NUMBER() OVER (ORDER BY ABS(resid) DESC, okey, line) <= 20
"""


# =====================================================================
# ABC / Pareto inventory classification
# =====================================================================

def q_abc_pareto(sf_dir: str):
    """ABC (Pareto) classification of parts by revenue: rank parts by
    revenue DESC (partkey tie-break), class A = parts whose cumulative
    revenue share stays <= 80%, B = <= 95%, C = the tail — the
    inventory-prioritization cut every ops team draws (crawl twin:
    which hosts carry 80% of the corpus). Class boundaries are EXACT
    INTEGER comparisons (5·cum <= 4·total, 20·cum <= 19·total) — no
    float ever decides a class. Per-part cents come from per-block
    Arrow partials folded COLUMNARLY on the driver (<= |parts|·blocks
    skinny rows — the ship_lag lesson: a Ray hash Aggregate over the
    10⁴-10⁶ part groups measured ~25× slower than this bounded fold);
    driver ranks the skinny part table once; <= 3-row finale with one
    division per class."""
    ds = _t(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({"p": b["l_partkey"],
                      "c": _cents(b["l_extendedprice"])})
        g = t.group_by("p").aggregate([("c", "sum")])
        return g.rename_columns(["p", "c"])

    acc_p, acc_c = [], []
    for b in (ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)
              .iter_batches(batch_format="pyarrow")):
        acc_p.append(b["p"].to_numpy(zero_copy_only=False))
        acc_c.append(b["c"].to_numpy(zero_copy_only=False))
    allp = np.concatenate(acc_p)
    allc = np.concatenate(acc_c)
    up, inv = np.unique(allp, return_inverse=True)
    sums = np.zeros(len(up), np.int64)
    np.add.at(sums, inv, allc)
    df = pd.DataFrame({"p": up.astype(np.int64), "c": sums})
    df = df.sort_values(["c", "p"], ascending=[False, True],
                        ignore_index=True)
    c = df["c"].to_numpy(np.int64)
    total = int(c.sum())
    cum = np.cumsum(c.astype(object))           # exact python ints
    cls = np.where(5 * cum <= 4 * total, 0,
                   np.where(20 * cum <= 19 * total, 1, 2))
    rows = {"cls": [], "n_parts": [], "cents": [], "share": []}
    for ci, name in enumerate("ABC"):
        m = cls == ci
        if not m.any():
            continue
        s = int(c[m].sum())
        rows["cls"].append(name)
        rows["n_parts"].append(int(m.sum()))
        rows["cents"].append(s)
        rows["share"].append(np.round(float(s) / float(total), 6))
    return pa.table({
        "cls": pa.array(rows["cls"], pa.string()),
        "n_parts": pa.array(rows["n_parts"], pa.int64()),
        "cents": pa.array(rows["cents"], pa.int64()),
        "share": pa.array(rows["share"], pa.float64())})


SQL_ABC_PARETO = """
WITH r AS (
  SELECT l_partkey AS p,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS c
  FROM lineitem GROUP BY 1
), t AS (SELECT CAST(SUM(c) AS HUGEINT) AS total FROM r),
w AS (
  SELECT p, c,
    CAST(SUM(c) OVER (ORDER BY c DESC, p) AS HUGEINT) AS cum
  FROM r
), k AS (
  SELECT CASE WHEN 5 * w.cum <= 4 * t.total THEN 'A'
              WHEN 20 * w.cum <= 19 * t.total THEN 'B'
              ELSE 'C' END AS cls, w.c, t.total
  FROM w, t
)
SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(c) AS BIGINT) AS cents,
       ROUND(CAST(SUM(c) AS DOUBLE) / CAST(MAX(total) AS DOUBLE), 6)
         AS share
FROM k GROUP BY 1
"""


# =====================================================================
# click abandonment (windowed anti-join)
# =====================================================================

def q_click_abandonment(sf_dir: str):
    """Click-abandonment rate by weekday: the share of clicks NOT
    followed by a purchase from the same user within 24 hours — a
    WINDOWED ANTI-JOIN (the follow-up-exists predicate funnels and
    re-engagement triggers both need; the plain anti_join has no time
    bound). ONE user-hash exchange; each partition sorts its users'
    purchase timestamps once and every click answers with ONE
    searchsorted probe (no per-pair work); <= 7×2 int partials;
    exact ratio until one division, 6 dp. Window is inclusive:
    purchase ts ∈ [click ts, click ts + 24 h]."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    win_us = 86_400_000_000
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array(["click", "purchase"]))
        t = b.filter(keep)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"], "ts_us": t["ts"].cast(pa.int64()),
            "event_type": t["event_type"], "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        res = np.zeros((8, 2), np.int64)        # dow → (clicks, abandoned)
        for _u, gu in g.groupby("user_id", sort=False):
            ts = gu["ts_us"].to_numpy(np.int64)
            et = gu["event_type"].to_numpy()
            pts = np.sort(ts[et == "purchase"])
            cts = ts[et == "click"]
            if len(cts) == 0:
                continue
            nxt = np.searchsorted(pts, cts, side="left")
            has = nxt < len(pts)
            followed = np.zeros(len(cts), bool)
            followed[has] = pts[nxt[has]] <= cts[has] + win_us
            dow = ((cts // DAY_US) + 3) % 7 + 1
            np.add.at(res[:, 0], dow, 1)
            np.add.at(res[:, 1], dow, (~followed).astype(np.int64))
        nz = np.nonzero(res[:, 0])[0]
        return pd.DataFrame({"dow": nz.astype(np.int64),
                             "clicks": res[nz, 0],
                             "abandoned": res[nz, 1]})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .groupby("dow")
           .aggregate(Sum("clicks", alias_name="clicks"),
                      Sum("abandoned", alias_name="abandoned")))
    df = agg.to_pandas().sort_values("dow", ignore_index=True)
    ck = df["clicks"].to_numpy(np.int64)
    ab = df["abandoned"].to_numpy(np.int64)
    return pa.table({
        "dow": pa.array(df["dow"].to_numpy(np.int64)),
        "clicks": pa.array(ck), "abandoned": pa.array(ab),
        "rate": pa.array(np.round(
            ab.astype(np.float64) / ck.astype(np.float64), 6),
            pa.float64())})


SQL_CLICK_ABANDONMENT = """
WITH c AS (
  SELECT user_id, epoch_us(ts) AS tu,
         (epoch_us(ts) // 86400000000 + 3) % 7 + 1 AS dow
  FROM events WHERE event_type = 'click'
), a AS (
  SELECT dow,
    CASE WHEN NOT EXISTS (
      SELECT 1 FROM events p
      WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        AND epoch_us(p.ts) >= c.tu
        AND epoch_us(p.ts) <= c.tu + 86400000000)
    THEN 1 ELSE 0 END AS abandoned
  FROM c
)
SELECT CAST(dow AS BIGINT) AS dow, CAST(COUNT(*) AS BIGINT) AS clicks,
       CAST(SUM(abandoned) AS BIGINT) AS abandoned,
       ROUND(CAST(SUM(abandoned) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS rate
FROM a GROUP BY 1
"""


# =====================================================================
# label-centroid similarity matrix
# =====================================================================

def q_centroid_distances(sf_dir: str):
    """Pairwise cosine similarity between per-label embedding
    CENTROIDS — the class-confusability matrix that says which labels
    a classifier (or a cluster merge pass) will struggle to separate.
    Centroids never materialize as floats: cosine is scale-invariant,
    so cos(c_a, c_b) = cos(s_a, s_b) over the 2^30-quantized int64
    dimension SUMS (label_centroids' exact quantization) — every dot
    product is an exact unbounded python int (oracle HUGEINT), ONE
    sqrt/division expression per label pair, 6 dp. The fold is
    <= |labels|·d rows; the pair matrix is <= |labels|² on the
    driver."""
    from .dataops import _embedding_matrix

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path, columns=["embedding", "label"])
    scale = 1073741824.0  # 2^30

    def prep(b: pa.Table) -> pa.Table:
        lab = b["label"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        emb = _embedding_matrix(b["embedding"])
        q = np.where(emb >= 0, np.floor(emb * scale + 0.5),
                     np.ceil(emb * scale - 0.5)).astype(np.int64)
        ul, inv = np.unique(lab, return_inverse=True)
        d = q.shape[1]
        sums = np.zeros((len(ul), d), np.int64)
        np.add.at(sums, inv, q)
        return pa.table({
            "label": pa.array(np.repeat(ul, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(ul))),
            "s": pa.array(sums.ravel()),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["label", "dim"])
           .aggregate(Sum("s", alias_name="s")))
    df = agg.to_pandas().sort_values(["label", "dim"], ignore_index=True)
    labels = np.unique(df["label"].to_numpy(np.int64))
    d = df["dim"].nunique()
    vecs = {int(lb): [int(v) for v in
                      df[df["label"] == lb].sort_values("dim")["s"]]
            for lb in labels}
    norms = {lb: sum(v * v for v in vec) for lb, vec in vecs.items()}
    rows = {"la": [], "lb": [], "cos": []}
    for i, la in enumerate(labels):
        for lb in labels[i + 1:]:
            dot = sum(a * b for a, b in zip(vecs[int(la)], vecs[int(lb)]))
            rows["la"].append(int(la))
            rows["lb"].append(int(lb))
            rows["cos"].append(np.round(
                float(dot) / (math.sqrt(float(norms[int(la)]))
                              * math.sqrt(float(norms[int(lb)]))), 6))
    return pa.table({"la": pa.array(rows["la"], pa.int64()),
                     "lb": pa.array(rows["lb"], pa.int64()),
                     "cos": pa.array(rows["cos"], pa.float64())})


SQL_CENTROID_DISTANCES = """
WITH u AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1073741824.0)
              AS BIGINT) AS qv
  FROM embeddings
), s AS (
  SELECT label, dim, CAST(SUM(qv) AS HUGEINT) AS s FROM u GROUP BY 1, 2
), n2 AS (
  SELECT label, CAST(SUM(s * s) AS HUGEINT) AS nn FROM s GROUP BY 1
), d AS (
  SELECT a.label AS la, b.label AS lb,
         CAST(SUM(a.s * b.s) AS HUGEINT) AS dot
  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
  GROUP BY 1, 2
)
SELECT d.la, d.lb,
  ROUND(CAST(d.dot AS DOUBLE)
        / (SQRT(CAST(na.nn AS DOUBLE)) * SQRT(CAST(nb.nn AS DOUBLE))), 6)
    AS cos
FROM d JOIN n2 na ON na.label = d.la JOIN n2 nb ON nb.label = d.lb
"""


# =====================================================================
# exact-duplicate cluster-size histogram
# =====================================================================

def q_dup_size_hist(sf_dir: str):
    """Histogram of exact-duplicate CLUSTER sizes (how many texts occur
    once, twice, thrice …) — the dedup-planning readout that says
    whether duplication is a few huge families or a long tail (drives
    the choice between broadcast winners and hash-partition dedup).
    One md5-text exchange (the dup_ratio_by_source convention, NULL ≡
    ''): each partition owns every row of its hashes, counts cluster
    sizes locally, and emits <= |distinct sizes| bincount partials;
    the finale is a tiny size groupby."""
    import hashlib

    from .analytics import _splitmix64 as _sm
    from .dataops import _docs
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _docs(sf_dir, ["text"])

    def prep(b: pa.Table) -> pa.Table:
        texts = [(t if t is not None else "")
                 for t in b["text"].to_pylist()]
        ut, inv = np.unique(np.array(texts, dtype=object),
                            return_inverse=True)
        uh = np.fromiter(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
             for t in ut), dtype=np.int64, count=len(ut))
        h = uh[inv]
        kp = (_sm(h).view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"h": pa.array(h), "kp": pa.array(kp)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        _, counts = np.unique(g["h"].to_numpy(np.int64),
                              return_counts=True)
        size, n = np.unique(counts, return_counts=True)
        return pd.DataFrame({"size": size.astype(np.int64),
                             "n_clusters": n.astype(np.int64)})

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(fold, batch_format="pandas")
            .groupby("size")
            .aggregate(Sum("n_clusters", alias_name="n_clusters")))


SQL_DUP_SIZE_HIST = """
WITH h AS (
  SELECT CAST(CONCAT('0x', SUBSTR(md5(COALESCE(text, '')), 1, 8))
              AS BIGINT) AS h, CAST(COUNT(*) AS BIGINT) AS size
  FROM documents GROUP BY 1
)
SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM h GROUP BY 1
"""


# =====================================================================
# cross-source exact-duplicate matrix
# =====================================================================

def q_dup_source_matrix(sf_dir: str):
    """Source×source matrix of exact-duplicate DOC PAIRS: for every
    unordered source pair (diagonal included), how many document pairs
    share identical text — the syndication map that says which feeds
    republish which (dedup's WHO-copies-WHOM attribution, finishing
    what dup_ratio_by_source starts). Same single md5-text exchange;
    each hash's rows co-locate, so its bounded per-source counts emit
    c_a·c_b (a<b) and C(c_a,2) (diagonal) pair counts locally —
    <= |sources|² partials, the pair table never materializes. The
    matrix is DENSE (every unordered source pair, zero-filled) on both
    sides: each partition emits a 0 diagonal row per source it sees,
    so every source reaches the bounded driver finale even when no
    duplicates exist at all."""
    import hashlib

    from .analytics import _splitmix64 as _sm
    from .dataops import _docs
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _docs(sf_dir, ["source", "text"])

    def prep(b: pa.Table) -> pa.Table:
        texts = [(t if t is not None else "")
                 for t in b["text"].to_pylist()]
        ut, inv = np.unique(np.array(texts, dtype=object),
                            return_inverse=True)
        uh = np.fromiter(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
             for t in ut), dtype=np.int64, count=len(ut))
        h = uh[inv]
        kp = (_sm(h).view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"h": pa.array(h), "source": b["source"],
                         "kp": pa.array(kp)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out: dict[tuple, int] = {}
        for s in np.unique(g["source"].to_numpy()):
            out[(str(s), str(s))] = 0          # presence marker
        for _h, grp in g.groupby("h", sort=False):
            srcs, cnts = np.unique(grp["source"].to_numpy(),
                                   return_counts=True)
            for i in range(len(srcs)):
                ci = int(cnts[i])
                if ci >= 2:
                    k = (str(srcs[i]), str(srcs[i]))
                    out[k] = out.get(k, 0) + ci * (ci - 1) // 2
                for j in range(i + 1, len(srcs)):
                    k = (str(srcs[i]), str(srcs[j]))
                    out[k] = out.get(k, 0) + ci * int(cnts[j])
        ks = list(out.keys())
        return pd.DataFrame({
            "src_a": [k[0] for k in ks], "src_b": [k[1] for k in ks],
            "pairs": np.array(list(out.values()), np.int64)})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .groupby(["src_a", "src_b"])
           .aggregate(Sum("pairs", alias_name="pairs")))
    df = agg.to_pandas()  # <= |sources|² rows — bounded fold
    counts = {(a, b): int(p) for a, b, p in
              zip(df["src_a"], df["src_b"], df["pairs"])}
    sources = sorted({a for a, _b in counts} | {b for _a, b in counts})
    rows = {"src_a": [], "src_b": [], "pairs": []}
    for i, a in enumerate(sources):
        for b in sources[i:]:
            rows["src_a"].append(a)
            rows["src_b"].append(b)
            rows["pairs"].append(counts.get((a, b), 0))
    return pa.table({
        "src_a": pa.array(rows["src_a"], pa.string()),
        "src_b": pa.array(rows["src_b"], pa.string()),
        "pairs": pa.array(rows["pairs"], pa.int64())})


SQL_DUP_SOURCE_MATRIX = """
WITH d AS (
  SELECT doc_id, source,
         CAST(CONCAT('0x', SUBSTR(md5(COALESCE(text, '')), 1, 8))
              AS BIGINT) AS h
  FROM documents
), p AS (
  SELECT LEAST(a.source, b.source) AS src_a,
         GREATEST(a.source, b.source) AS src_b,
         CAST(COUNT(*) AS BIGINT) AS pairs
  FROM d a JOIN d b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), s AS (SELECT DISTINCT source FROM documents),
grid AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM s a JOIN s b ON a.source <= b.source
)
SELECT grid.src_a, grid.src_b, COALESCE(p.pairs, 0) AS pairs
FROM grid LEFT JOIN p USING (src_a, src_b)
"""


# =====================================================================
# dedup savings per source (bytes removable by exact dedup)
# =====================================================================

def q_dedup_savings(sf_dir: str):
    """Bytes exact dedup would RECLAIM per source: for every duplicate
    cluster the min-doc_id copy survives (dedup_exact's winner rule)
    and every loser's n_chars counts against the loser's OWN source —
    the dedup-ROI readout a curation team budgets by. Same single
    md5-text exchange; each partition marks its hashes' winners by one
    vectorized per-cluster argmin and folds loser bytes to <= |sources|
    partials; exact integer ratio until one division, 6 dp."""
    import hashlib

    from .analytics import _splitmix64 as _sm
    from .dataops import _docs
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _docs(sf_dir, ["doc_id", "source", "text", "n_chars"])

    def prep(b: pa.Table) -> pa.Table:
        texts = [(t if t is not None else "")
                 for t in b["text"].to_pylist()]
        ut, inv = np.unique(np.array(texts, dtype=object),
                            return_inverse=True)
        uh = np.fromiter(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
             for t in ut), dtype=np.int64, count=len(ut))
        h = uh[inv]
        kp = (_sm(h).view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"h": pa.array(h), "doc_id": b["doc_id"],
                         "source": b["source"], "n_chars": b["n_chars"],
                         "kp": pa.array(kp)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy(np.int64)
        did = g["doc_id"].to_numpy(np.int64)
        nch = g["n_chars"].to_numpy(np.int64)
        src = g["source"].to_numpy()
        order = np.lexsort((did, h))            # per-cluster min doc_id first
        h, did, nch, src = h[order], did[order], nch[order], src[order]
        is_first = np.ones(len(h), bool)
        is_first[1:] = h[1:] != h[:-1]
        loser = ~is_first
        us, sinv = np.unique(src, return_inverse=True)
        total = np.zeros(len(us), np.int64)
        saved = np.zeros(len(us), np.int64)
        np.add.at(total, sinv, nch)
        np.add.at(saved, sinv[loser], nch[loser])
        return pd.DataFrame({"source": us, "total_chars": total,
                             "saved_chars": saved})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .groupby("source")
           .aggregate(Sum("total_chars", alias_name="total_chars"),
                      Sum("saved_chars", alias_name="saved_chars")))
    df = agg.to_pandas().sort_values("source", ignore_index=True)
    tc = df["total_chars"].to_numpy(np.int64)
    sc = df["saved_chars"].to_numpy(np.int64)
    return pa.table({
        "source": pa.array(df["source"], pa.string()),
        "total_chars": pa.array(tc), "saved_chars": pa.array(sc),
        "saved_ratio": pa.array(np.round(
            sc.astype(np.float64) / tc.astype(np.float64), 6),
            pa.float64())})


SQL_DEDUP_SAVINGS = """
WITH d AS (
  SELECT doc_id, source, n_chars,
    ROW_NUMBER() OVER (
      PARTITION BY CAST(CONCAT('0x',
                        SUBSTR(md5(COALESCE(text, '')), 1, 8)) AS BIGINT)
      ORDER BY doc_id) AS rn
  FROM documents
)
SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS saved_chars,
       ROUND(CAST(SUM(CASE WHEN rn > 1 THEN n_chars ELSE 0 END)
                  AS DOUBLE) / CAST(SUM(n_chars) AS DOUBLE), 6)
         AS saved_ratio
FROM d GROUP BY 1
"""


# =====================================================================
# ORC round-trip (columnar interchange beyond parquet)
# =====================================================================

def q_orc_roundtrip(sf_dir: str):
    """Write events through a distributed ORC sink (one fragment per
    block via map_batches — Ray has no native ORC writer) and read the
    fragments back as parallel tasks driven by the MANIFEST the sink
    emitted (never a listdir — the multi-node-safe discipline every
    index/sink in this repo follows), then aggregate. The oracle
    aggregates the source table directly, proving the hop lossless.
    ORC matters because it is the other columnar interchange format a
    warehouse hand-off actually requests."""
    import shutil
    import tempfile
    import uuid

    out = tempfile.mkdtemp(prefix="crawlray_orc_")
    try:
        def write_frag(b: pa.Table) -> pa.Table:
            import pyarrow.orc as orc

            if b.num_rows == 0:
                return pa.table({"path": pa.array([], pa.string())})
            p = os.path.join(out, f"frag-{uuid.uuid4().hex}.orc")
            orc.write_table(b, p)
            return pa.table({"path": pa.array([p], pa.string())})

        manifest = (_t(sf_dir, "events", ["event_type", "value"])
                    .map_batches(write_frag, batch_format="pyarrow")
                    .take_all())
        paths = [r["path"] for r in manifest]

        def read_frag(b: pa.Table) -> pa.Table:
            import pyarrow.orc as orc

            tables = [orc.read_table(p) for p in b["path"].to_pylist()]
            t = pa.concat_tables(tables) if tables else \
                pa.table({"event_type": pa.array([], pa.string()),
                          "value": pa.array([], pa.float64())})
            return pa.table({"event_type": t["event_type"],
                             "c": _cents(t["value"])})

        back = rd.from_items([{"path": p} for p in paths]) \
            .map_batches(read_frag, batch_format="pyarrow")
        agg = (back.groupby("event_type")
               .aggregate(Count(alias_name="n"),
                          Sum("c", alias_name="cents")))
        return pa.Table.from_pylist(agg.take_all())
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_ORC_ROUNDTRIP = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1
"""


# =====================================================================
# Arrow IPC (Feather V2) round-trip
# =====================================================================

def q_ipc_roundtrip(sf_dir: str):
    """Write lineitem's pricing columns through a distributed Arrow
    IPC (Feather V2) sink and re-read the fragments in parallel from
    the sink's manifest — the ZERO-COPY interchange hop (IPC files map
    back into Arrow memory without decode, which is why actor-to-actor
    spill files and torch dataloaders speak it), aggregated and proven
    lossless against the oracle on the source table."""
    import shutil
    import tempfile
    import uuid

    out = tempfile.mkdtemp(prefix="crawlray_ipc_")
    try:
        def write_frag(b: pa.Table) -> pa.Table:
            import pyarrow.feather as feather

            if b.num_rows == 0:
                return pa.table({"path": pa.array([], pa.string())})
            p = os.path.join(out, f"frag-{uuid.uuid4().hex}.arrow")
            feather.write_feather(b, p)
            return pa.table({"path": pa.array([p], pa.string())})

        manifest = (_t(sf_dir, "lineitem",
                       ["l_returnflag", "l_extendedprice"])
                    .map_batches(write_frag, batch_format="pyarrow")
                    .take_all())
        paths = [r["path"] for r in manifest]

        def read_frag(b: pa.Table) -> pa.Table:
            import pyarrow.feather as feather

            tables = [feather.read_table(p) for p in b["path"].to_pylist()]
            t = pa.concat_tables(tables) if tables else \
                pa.table({"l_returnflag": pa.array([], pa.string()),
                          "l_extendedprice": pa.array([], pa.float64())})
            return pa.table({"flag": t["l_returnflag"],
                             "c": _cents(t["l_extendedprice"])})

        back = rd.from_items([{"path": p} for p in paths]) \
            .map_batches(read_frag, batch_format="pyarrow")
        agg = (back.groupby("flag")
               .aggregate(Count(alias_name="n"),
                          Sum("c", alias_name="cents")))
        return pa.Table.from_pylist(agg.take_all())
    finally:
        shutil.rmtree(out, ignore_errors=True)


SQL_IPC_ROUNDTRIP = """
SELECT l_returnflag AS flag, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM lineitem GROUP BY 1
"""


# =====================================================================
# modularity of the nation partition (community-quality metric)
# =====================================================================

def q_modularity(sf_dir: str):
    """Newman modularity Q of the supplier co-supply graph under the
    NATION partition — does geography explain who co-supplies? The
    community-quality score every clustering pass is judged by, here
    on a GIVEN partition so it stays exactly oracle-able. Q =
    Σ_c(4m·L_c − D_c²) / (4m²) — a SINGLE exact-integer numerator
    (unbounded python ints == HUGEINT) and ONE division, no per-term
    float sum at all. Scale shape: triangle_count's distributed edge
    derivation; nation rides a broadcast supplier LUT; the finale is
    one bincount over the dimension-sized edge fold."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .analytics import _sized_read

    st = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                       columns=["s_suppkey", "s_nationkey"])
    sk = np.asarray(st["s_suppkey"], dtype=np.int64)
    nk = np.asarray(st["s_nationkey"], dtype=np.int64)
    lut = np.zeros(int(sk.max()) + 1, np.int64)
    lut[sk] = nk

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
    chunks = [np.stack([b["u"].to_numpy(zero_copy_only=False),
                        b["v"].to_numpy(zero_copy_only=False)], axis=1)
              for b in co.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")]
    uv = np.unique(np.concatenate(chunks).astype(np.int64), axis=0)
    m = len(uv)
    cu, cv = lut[uv[:, 0]], lut[uv[:, 1]]
    ncom = int(max(cu.max(), cv.max())) + 1
    l_c = np.bincount(cu[cu == cv], minlength=ncom).astype(np.int64)
    d_c = (np.bincount(cu, minlength=ncom)
           + np.bincount(cv, minlength=ncom)).astype(np.int64)
    num = sum(4 * m * int(l) - int(d) * int(d)
              for l, d in zip(l_c, d_c))       # exact python ints
    q = np.round(float(num) / float(4 * m * m), 6)
    return pa.table({
        "n_edges": pa.array([m], pa.int64()),
        "n_communities": pa.array([int((d_c > 0).sum())], pa.int64()),
        "modularity": pa.array([q], pa.float64())})


SQL_MODULARITY = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
            FROM lineitem WHERE l_partkey < 200),
e AS (SELECT DISTINCT a.s AS u, b.s AS v
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
en AS (
  SELECT su.s_nationkey AS cu, sv.s_nationkey AS cv
  FROM e JOIN supplier su ON su.s_suppkey = e.u
         JOIN supplier sv ON sv.s_suppkey = e.v
), m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m FROM en),
lc AS (
  SELECT cu AS c, CAST(COUNT(*) AS HUGEINT) AS l
  FROM en WHERE cu = cv GROUP BY 1
), dc AS (
  SELECT c, CAST(SUM(d) AS HUGEINT) AS d FROM (
    SELECT cu AS c, COUNT(*) AS d FROM en GROUP BY 1
    UNION ALL
    SELECT cv AS c, COUNT(*) AS d FROM en GROUP BY 1)
  GROUP BY 1
), terms AS (
  SELECT dc.c, 4 * m.m * COALESCE(lc.l, 0) - dc.d * dc.d AS t
  FROM dc LEFT JOIN lc ON lc.c = dc.c, m
)
SELECT CAST(m.m AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM dc) AS BIGINT) AS n_communities,
       ROUND(CAST((SELECT SUM(t) FROM terms) AS DOUBLE)
             / CAST(4 * m.m * m.m AS DOUBLE), 6) AS modularity
FROM m
"""


# =====================================================================
# k-anonymity audit over quasi-identifier cells
# =====================================================================

def q_k_anonymity(sf_dir: str, k: int = 10):
    """k-anonymity audit of documents over the (lang, source) quasi-
    identifier pair: how many cells hold fewer than k docs — the
    re-identification-risk readout a release review runs before
    publishing a corpus slice. Block-local (lang, source) bincounts
    through ONE <= |langs|·|sources| exchange; the finale reports
    total cells, risky cells, the smallest cell, and the share of DOCS
    sitting in risky cells (the number that actually gates release)."""
    from .dataops import _docs

    ds = _docs(sf_dir, ["lang", "source"])

    def prep(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "source", "n"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["lang", "source"])
           .aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas()
    n = df["n"].to_numpy(np.int64)
    risky = n < k
    total = int(n.sum())
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "n_cells": pa.array([len(n)], pa.int64()),
        "risky_cells": pa.array([int(risky.sum())], pa.int64()),
        "min_cell": pa.array([int(n.min())], pa.int64()),
        "risky_doc_share": pa.array([np.round(
            float(int(n[risky].sum())) / float(total), 6)], pa.float64())})


SQL_K_ANONYMITY = """
WITH c AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
)
SELECT CAST(10 AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS risky_cells,
       CAST(MIN(n) AS BIGINT) AS min_cell,
       ROUND(CAST(SUM(CASE WHEN n < 10 THEN n ELSE 0 END) AS DOUBLE)
             / CAST(SUM(n) AS DOUBLE), 6) AS risky_doc_share
FROM c
"""


# =====================================================================
# Wilson confidence interval per experiment arm
# =====================================================================

def q_wilson_ci(sf_dir: str):
    """Wilson score 95% confidence interval on the conversion rate of
    each md5 experiment arm (prop_ztest's split and conversion rule) —
    the interval every A/B readout should print next to its point
    estimate (Wilson, not Wald: it behaves at small n and extreme p).
    ONE user-hash exchange of exact (arm, users, conversions) int
    partials; lo/hi are ONE identical IEEE expression with z = 1.96 on
    the 2-row driver fold, 6 dp."""
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
    z = 1.96
    rows = {"arm": [], "n": [], "c": [], "lo": [], "hi": []}
    for _, r in df.iterrows():
        n, c = int(r["n"]), int(r["c"])
        p = float(c) / float(n)
        denom = 1.0 + z * z / float(n)
        center = p + z * z / (2.0 * float(n))
        margin = z * math.sqrt(p * (1.0 - p) / float(n)
                               + z * z / (4.0 * float(n) * float(n)))
        rows["arm"].append(int(r["arm"]))
        rows["n"].append(n)
        rows["c"].append(c)
        rows["lo"].append(np.round((center - margin) / denom, 6))
        rows["hi"].append(np.round((center + margin) / denom, 6))
    return pa.table({
        "arm": pa.array(rows["arm"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64()),
        "c": pa.array(rows["c"], pa.int64()),
        "lo": pa.array(rows["lo"], pa.float64()),
        "hi": pa.array(rows["hi"], pa.float64())})


SQL_WILSON_CI = """
WITH u AS (
  SELECT user_id,
         CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
                       THEN 1 ELSE 0 END) AS BIGINT) AS conv
  FROM events GROUP BY 1
), a AS (
  SELECT CAST(CONCAT('0x', SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 2 AS arm, conv
  FROM u
), g AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS c
  FROM a GROUP BY 1
)
SELECT arm, n, c,
  ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
         + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE))
         - 1.96 * SQRT(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                       * (1.0 - CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                       / CAST(n AS DOUBLE)
                       + 1.96 * 1.96
                         / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE)), 6) AS lo,
  ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
         + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE))
         + 1.96 * SQRT(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                       * (1.0 - CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                       / CAST(n AS DOUBLE)
                       + 1.96 * 1.96
                         / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE)), 6) AS hi
FROM g
"""


# =====================================================================
# linear-interpolation gap fill over the daily spine
# =====================================================================

def q_lerp_fill(sf_dir: str):
    """Daily revenue over the FULL calendar spine with missing days
    LINEARLY INTERPOLATED between their nearest present neighbors —
    LOCF's smoother sibling (forecasting and charting both want the
    straight line, not the step). The interpolant stays an EXACT
    integer cross product (prev·(next_d−d) + next·(d−prev_d)) over an
    integer denominator until ONE division, 6 dp; present days emit
    their exact cents. One <= #days exchange; the spine fill is two
    searchsorted gathers on the bounded driver table (the locf_fill
    shape). Spine spans [first, last] present day, so every gap has
    both neighbors."""
    df = _day_rev_fold(sf_dir)
    day = df["day"].to_numpy(np.int64)
    rev = df["rev"].to_numpy(np.int64)
    spine = np.arange(day[0], day[-1] + 1, dtype=np.int64)
    pos = np.searchsorted(day, spine)           # next-present index
    present = (pos < len(day)) & (day[np.minimum(pos, len(day) - 1)]
                                  == spine)
    prev_i = np.searchsorted(day, spine, side="right") - 1
    rows = {"day": [], "filled": [], "cents": []}
    for i, d in enumerate(spine):
        if present[i]:
            rows["day"].append(int(d))
            rows["filled"].append(0)
            rows["cents"].append(float(int(rev[pos[i]])))
        else:
            pi, ni = int(prev_i[i]), int(pos[i])
            pd_, nd = int(day[pi]), int(day[ni])
            num = int(rev[pi]) * (nd - int(d)) \
                + int(rev[ni]) * (int(d) - pd_)
            rows["day"].append(int(d))
            rows["filled"].append(1)
            rows["cents"].append(np.round(float(num) / float(nd - pd_), 6))
    return pa.table({
        "day": pa.array(rows["day"], pa.int64()),
        "filled": pa.array(rows["filled"], pa.int64()),
        "cents": pa.array(rows["cents"], pa.float64())})


SQL_LERP_FILL = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), spine AS (
  SELECT unnest(generate_series((SELECT MIN(day) FROM d),
                                (SELECT MAX(day) FROM d))) AS day
), j AS (
  SELECT s.day, d.rev,
    LAST_VALUE(d.rev IGNORE NULLS)
      OVER (ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS prev_rev,
    LAST_VALUE(CASE WHEN d.rev IS NOT NULL THEN s.day END IGNORE NULLS)
      OVER (ORDER BY s.day ROWS UNBOUNDED PRECEDING) AS prev_day,
    FIRST_VALUE(d.rev IGNORE NULLS)
      OVER (ORDER BY s.day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_rev,
    FIRST_VALUE(CASE WHEN d.rev IS NOT NULL THEN s.day END IGNORE NULLS)
      OVER (ORDER BY s.day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
  FROM spine s LEFT JOIN d USING (day)
)
SELECT CAST(day AS BIGINT) AS day,
  CAST(CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled,
  CASE WHEN rev IS NOT NULL THEN CAST(rev AS DOUBLE)
       ELSE ROUND(CAST(prev_rev * (next_day - day)
                       + next_rev * (day - prev_day) AS DOUBLE)
                  / CAST(next_day - prev_day AS DOUBLE), 6)
  END AS cents
FROM j
"""


# =====================================================================
# peak detection over the daily revenue series
# =====================================================================

def q_peak_days(sf_dir: str):
    """STRICT local maxima of daily revenue over a ±3-calendar-day
    neighborhood — the peak detector behind promo post-mortems and
    crawl-burst forensics. A day is a peak iff its revenue exceeds
    EVERY other present day in [d−3, d+3] (gap-aware RANGE semantics,
    DuckDB's frame EXCLUDE CURRENT ROW); the comparison is exact
    int64 cents — no float ever decides a peak. One <= #days
    exchange; two searchsorted cuts + one sliding max on the bounded
    driver table."""
    df = _day_rev_fold(sf_dir)
    day = df["day"].to_numpy(np.int64)
    rev = df["rev"].to_numpy(np.int64)
    lo = np.searchsorted(day, day - 3, side="left")
    hi = np.searchsorted(day, day + 3, side="right")
    rows = {"day": [], "rev": []}
    for i in range(len(day)):
        window = np.concatenate([rev[lo[i]:i], rev[i + 1:hi[i]]])
        if len(window) > 0 and int(rev[i]) > int(window.max()):
            rows["day"].append(int(day[i]))
            rows["rev"].append(int(rev[i]))
    return pa.table({"day": pa.array(rows["day"], pa.int64()),
                     "rev": pa.array(rows["rev"], pa.int64())})


SQL_PEAK_DAYS = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), w AS (
  SELECT day, rev,
    MAX(rev) OVER (ORDER BY day
                   RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING
                   EXCLUDE CURRENT ROW) AS neigh
  FROM d
)
SELECT CAST(day AS BIGINT) AS day, CAST(rev AS BIGINT) AS rev
FROM w WHERE neigh IS NOT NULL AND rev > neigh
"""


# =====================================================================
# log2-bucketed inter-event gap histogram
# =====================================================================

def q_gap_histogram(sf_dir: str):
    """Histogram of inter-event gaps (consecutive events of the same
    user, microseconds) in powers-of-two buckets — the latency-
    histogram shape every ops dashboard draws, with the bucket decided
    by INTEGER bit position (np.frexp's exact exponent here,
    length(bin(gap))−1 in the oracle) so no float log ever rounds a
    boundary. Zero gaps (same-microsecond events) are excluded on
    both sides. ONE user-hash exchange; per-partition lexsort + diff;
    <= 64-bucket partials."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"], "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.int64()), "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        same = uid[1:] == uid[:-1]
        gap = (ts[1:] - ts[:-1])[same]
        gap = gap[gap > 0]
        if len(gap) == 0:
            return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        # exact integer log2: frexp exponents are exact for ints < 2^53
        _, e = np.frexp(gap.astype(np.float64))
        bucket = (e - 1).astype(np.int64)
        ub, cnt = np.unique(bucket, return_counts=True)
        return pd.DataFrame({"bucket": ub, "n": cnt.astype(np.int64)})

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(fold, batch_format="pandas")
            .groupby("bucket")
            .aggregate(Sum("n", alias_name="n")))


SQL_GAP_HISTOGRAM = """
WITH g AS (
  SELECT epoch_us(ts)
         - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT CAST(LENGTH(BIN(CAST(gap AS BIGINT))) - 1 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM g WHERE gap > 0 GROUP BY 1
"""


# =====================================================================
# forecast backtest (naive vs seasonal-naive MAE)
# =====================================================================

def q_forecast_backtest(sf_dir: str):
    """Backtest of the two forecasting baselines every model must
    beat: naive (ŷ_d = y_{d−1}) and seasonal-naive (ŷ_d = y_{d−7})
    over daily revenue, scored by MAE — the eval harness half of
    forecast_revenue. Errors are exact integer |differences| on the
    bounded day fold (only days whose lag day is PRESENT score, same
    gap rule both sides); one division per metric, 6 dp."""
    df = _day_rev_fold(sf_dir)
    day = df["day"].to_numpy(np.int64)
    rev = df["rev"].to_numpy(np.int64)
    pos = {int(d): i for i, d in enumerate(day)}
    out = {}
    for lag, name in ((1, "naive"), (7, "seasonal")):
        errs = []
        for i, d in enumerate(day):
            j = pos.get(int(d) - lag)
            if j is not None:
                errs.append(abs(int(rev[i]) - int(rev[j])))
        out[name] = (len(errs), sum(errs))
    return pa.table({
        "n_naive": pa.array([out["naive"][0]], pa.int64()),
        "mae_naive": pa.array([np.round(
            float(out["naive"][1]) / float(out["naive"][0]), 6)],
            pa.float64()),
        "n_seasonal": pa.array([out["seasonal"][0]], pa.int64()),
        "mae_seasonal": pa.array([np.round(
            float(out["seasonal"][1]) / float(out["seasonal"][0]), 6)],
            pa.float64())})


SQL_FORECAST_BACKTEST = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(ABS(a.rev - b.rev)) AS HUGEINT) AS s
  FROM d a JOIN d b ON b.day = a.day - 1
), s7 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(ABS(a.rev - b.rev)) AS HUGEINT) AS s
  FROM d a JOIN d b ON b.day = a.day - 7
)
SELECT n.n AS n_naive,
       ROUND(CAST(n.s AS DOUBLE) / CAST(n.n AS DOUBLE), 6) AS mae_naive,
       s7.n AS n_seasonal,
       ROUND(CAST(s7.s AS DOUBLE) / CAST(s7.n AS DOUBLE), 6)
         AS mae_seasonal
FROM n, s7
"""


# =====================================================================
# new-vs-returning revenue split per week
# =====================================================================

def q_new_vs_returning(sf_dir: str):
    """Weekly purchase revenue split into NEW users (their first-ever
    purchase falls in this week) vs RETURNING — the acquisition-vs-
    retention revenue mix every growth report leads with. ONE
    user-hash exchange: each partition owns all of a user's purchases,
    derives the first-purchase week locally ((ts, event_id) tuple
    min), and emits exact (week, new_cents, ret_cents) int partials;
    <= #weeks finale, one division for the new-share, 6 dp."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts",
                               "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.equal(b["event_type"], pa.scalar("purchase"))
        t = b.filter(m)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "ts_us": t["ts"].cast(pa.int64()),
            "c": _cents(t["value"]), "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        wk = ts // DAY_US // 7
        first_wk = pd.Series(wk).groupby(pd.Series(uid)).transform("min") \
            .to_numpy()
        is_new = wk == first_wk
        df_ = pd.DataFrame({
            "week": wk,
            "new_cents": np.where(is_new, c, 0).astype(np.int64),
            "ret_cents": np.where(is_new, 0, c).astype(np.int64),
        })
        agg = df_.groupby("week", sort=False).sum().reset_index()
        return agg.astype({"week": np.int64, "new_cents": np.int64,
                           "ret_cents": np.int64})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .groupby("week")
           .aggregate(Sum("new_cents", alias_name="new_cents"),
                      Sum("ret_cents", alias_name="ret_cents")))
    df = agg.to_pandas().sort_values("week", ignore_index=True)
    nc = df["new_cents"].to_numpy(np.int64)
    rc = df["ret_cents"].to_numpy(np.int64)
    return pa.table({
        "week": pa.array(df["week"].to_numpy(np.int64)),
        "new_cents": pa.array(nc), "ret_cents": pa.array(rc),
        "new_share": pa.array(np.round(
            nc.astype(np.float64) / (nc + rc).astype(np.float64), 6),
            pa.float64())})


SQL_NEW_VS_RETURNING = """
WITH p AS (
  SELECT user_id, epoch_us(ts) // 86400000000 // 7 AS week,
         CAST(ROUND(value * 100) AS BIGINT) AS c,
         MIN(epoch_us(ts) // 86400000000 // 7)
           OVER (PARTITION BY user_id) AS first_week
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST(week AS BIGINT) AS week,
  CAST(SUM(CASE WHEN week = first_week THEN c ELSE 0 END) AS BIGINT)
    AS new_cents,
  CAST(SUM(CASE WHEN week <> first_week THEN c ELSE 0 END) AS BIGINT)
    AS ret_cents,
  ROUND(CAST(SUM(CASE WHEN week = first_week THEN c ELSE 0 END)
             AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS new_share
FROM p GROUP BY 1
"""


# =====================================================================
# engagement breadth (users by distinct event-type count)
# =====================================================================

def q_engagement_breadth(sf_dir: str):
    """How many users touch exactly k distinct event types — the
    engagement-breadth histogram that separates single-feature users
    from power users (the histogram OF a distinct count: two nested
    aggregations). ONE user-hash exchange of per-block DISTINCT
    (user, type) pairs (np.unique combiner); each partition owns all
    of a user's pairs, so the per-user nunique and the <= |types|
    histogram partials are both partition-local."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        # block-distinct (user, type) pairs via ONE Arrow group_by —
        # the combiner: the exchange carries pairs, never the stream
        g = pa.table({"u": b["user_id"], "t": b["event_type"]}) \
            .group_by(["u", "t"]).aggregate([])
        u = g["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(u).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return g.append_column("kp", pa.array(kp))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        df_ = g.drop_duplicates(["u", "t"])
        breadth = df_.groupby("u", sort=False)["t"].nunique()
        k, n = np.unique(breadth.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"breadth": k.astype(np.int64),
                             "n_users": n.astype(np.int64)})

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(fold, batch_format="pandas")
            .groupby("breadth")
            .aggregate(Sum("n_users", alias_name="n_users")))


SQL_ENGAGEMENT_BREADTH = """
WITH u AS (
  SELECT user_id, CAST(COUNT(DISTINCT event_type) AS BIGINT) AS breadth
  FROM events GROUP BY 1
)
SELECT breadth, CAST(COUNT(*) AS BIGINT) AS n_users
FROM u GROUP BY 1
"""


# =====================================================================
# open-order aging report
# =====================================================================

def q_aging_report(sf_dir: str):
    """Aging report of OPEN orders ('O' status): count and value in
    30-day age buckets from the newest order date — the
    working-capital readout every fulfillment review starts with
    (crawl twin: how stale the unfetched frontier is). One Min/Max
    day fold anchors the clock; block-local integer bucket bincounts
    through a tiny exchange; exact cents, zero float until the final
    share division."""
    ds = _t(sf_dir, "orders", ["o_orderstatus", "o_orderdate",
                               "o_totalprice"])

    bounds = ds.map_batches(
        lambda b: pa.table({"hi": pa.array(
            [pc.max(b["o_orderdate"]).cast(pa.int64()).as_py() // DAY_US],
            pa.int64())}),
        batch_format="pyarrow").aggregate(Max("hi"))
    maxd = int(bounds["max(hi)"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.equal(b["o_orderstatus"], pa.scalar("O"))
        t = b.filter(m)
        day = (t["o_orderdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        bucket = (maxd - day) // 30
        ub, inv = np.unique(bucket, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(ub), np.int64)
        np.add.at(s, inv, c)
        return pa.table({"bucket": pa.array(ub.astype(np.int64)),
                         "n": pa.array(n), "cents": pa.array(s)})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("cents", alias_name="cents")))
    df = agg.to_pandas().sort_values("bucket", ignore_index=True)
    c = df["cents"].to_numpy(np.int64)
    total = int(c.sum())
    return pa.table({
        "bucket": pa.array(df["bucket"].to_numpy(np.int64)),
        "n": pa.array(df["n"].to_numpy(np.int64)),
        "cents": pa.array(c),
        "share": pa.array(np.round(
            c.astype(np.float64) / float(total), 6), pa.float64())})


SQL_AGING_REPORT = """
WITH b AS (
  SELECT MAX(epoch_us(o_orderdate) // 86400000000) AS maxd FROM orders
), o AS (
  SELECT (b.maxd - epoch_us(o_orderdate) // 86400000000) // 30 AS bucket,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders, b WHERE o_orderstatus = 'O'
), g AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS cents
  FROM o GROUP BY 1
), t AS (SELECT CAST(SUM(cents) AS HUGEINT) AS total FROM g)
SELECT CAST(g.bucket AS BIGINT) AS bucket, g.n, g.cents,
       ROUND(CAST(g.cents AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
         AS share
FROM g, t
"""


# =====================================================================
# Hill tail-index estimator (heavy-tail diagnosis)
# =====================================================================

def q_hill_tail(sf_dir: str, k: int = 100):
    """Hill estimator of the revenue distribution's tail index over
    the top-100 customers: H = (1/k)Σ ln(x_i / x_{k+1}), α = 1/H —
    the heavy-tail diagnosis that says whether whale revenue has a
    finite mean at all (α ≤ 1: no). Per-customer cents fold in ONE
    custkey exchange; the top-(k+1) VALUES are rank-deterministic
    (ties share a value, so the multiset — and every ln term — is
    tie-order-independent); ln terms sum in rank order on both sides;
    two divisions, 6 dp."""
    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({"ck": b["o_custkey"], "mon": _cents(b["o_totalprice"])})
        g = t.group_by("ck").aggregate([("mon", "sum")])
        return g.rename_columns(["ck", "mon"])

    per_cust = (ds.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("ck")
                .aggregate(Sum("mon", alias_name="mon")))

    def partial_top(b: pa.Table) -> pa.Table:
        df_ = b.to_pandas().sort_values(
            ["mon", "ck"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df_.head(k + 1), preserve_index=False)

    rows = [r for b in per_cust.map_batches(partial_top,
                                            batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
            for r in zip(b["mon"].to_pylist(), b["ck"].to_pylist())]
    rows.sort(key=lambda r: (-r[0], r[1]))
    top = rows[:k + 1]
    xk1 = int(top[k][0])
    h = 0.0
    for mon, _ck in top[:k]:                    # rank order
        h += math.log(float(int(mon)) / float(xk1))
    h /= float(k)
    return pa.table({
        "n_top": pa.array([k], pa.int64()),
        "hill": pa.array([np.round(h, 6)], pa.float64()),
        "alpha": pa.array([np.round(1.0 / h, 6)], pa.float64())})


SQL_HILL_TAIL = """
WITH m AS (
  SELECT o_custkey AS ck,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS mon
  FROM orders GROUP BY 1
), r AS (
  SELECT ck, mon,
         ROW_NUMBER() OVER (ORDER BY mon DESC, ck) AS rn
  FROM m QUALIFY rn <= 101
), cut AS (SELECT mon AS xk1 FROM r WHERE rn = 101),
h AS (
  SELECT SUM(LN(CAST(r.mon AS DOUBLE) / CAST(cut.xk1 AS DOUBLE))
             ORDER BY r.rn) / 100.0 AS hill
  FROM r, cut WHERE r.rn <= 100
)
SELECT CAST(100 AS BIGINT) AS n_top, ROUND(hill, 6) AS hill,
       ROUND(1.0 / hill, 6) AS alpha
FROM h
"""


# =====================================================================
# mean session entropy by weekday
# =====================================================================

def q_session_entropy(sf_dir: str):
    """Mean per-session event-type ENTROPY by the session's start
    weekday — are weekend sessions more single-purpose? Sessions are
    30-minute-gap bounded (sessionize's rule, (ts, event_id) tuple
    order); each session's entropy −Σ(c/n)·ln(c/n) uses exact integer
    ratios inside every ln with the term sum ordered by event type on
    both sides, then QUANTIZES to integer micro-units (half-away) so
    the per-dow mean is an exact integer fold; the finale emulates
    DuckDB's half-away 6-dp ROUND. ONE user-hash exchange; everything
    session-local is partition-local."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    gap_us = 1800 * 1_000_000
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"], "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_type": b["event_type"], "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        if len(uid) == 0:
            return pd.DataFrame({"dow": pd.Series([], dtype=np.int64),
                                 "qsum": pd.Series([], dtype=np.int64),
                                 "n_sessions": pd.Series([],
                                                         dtype=np.int64)})
        order = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        # one vectorized pass over ALL sessions in the partition: a
        # session break is a user change or a >30-min gap
        brk = np.ones(len(ts), bool)
        brk[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        sess = np.cumsum(brk) - 1
        n_sess = int(sess[-1]) + 1
        n = np.bincount(sess, minlength=n_sess).astype(np.int64)
        _types, tcode = np.unique(et, return_inverse=True)
        packed = sess * np.int64(len(_types)) + tcode
        upk, c = np.unique(packed, return_counts=True)  # sess-major,
        ps = (upk // len(_types)).astype(np.int64)      # type-ascending
        r = c.astype(np.float64) / n[ps].astype(np.float64)
        terms = -(r * np.log(r))
        # per-session term sum in type-ascending order: reduceat's
        # segments are <= |types| (= 5) elements, below numpy's
        # pairwise-summation threshold, so the reduction is the same
        # sequential order as the oracle's ORDER BY event_type
        starts = np.unique(ps, return_index=True)[1]
        ent = np.zeros(n_sess, np.float64)
        ent[np.unique(ps)] = np.add.reduceat(terms, starts)
        y = ent * 1e6
        qe = np.where(y >= 0, np.floor(y + 0.5),
                      -np.floor(-y + 0.5)).astype(np.int64)
        first = np.unique(sess, return_index=True)[1]
        dow = ((ts[first] // DAY_US + 3) % 7 + 1).astype(np.int64)
        sums = np.zeros(8, np.int64)
        cnts = np.zeros(8, np.int64)
        np.add.at(sums, dow, qe)
        np.add.at(cnts, dow, 1)
        nz = np.nonzero(cnts)[0]
        return pd.DataFrame({"dow": nz.astype(np.int64),
                             "qsum": sums[nz], "n_sessions": cnts[nz]})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .groupby("dow")
           .aggregate(Sum("qsum", alias_name="qsum"),
                      Sum("n_sessions", alias_name="n_sessions")))
    df = agg.to_pandas().sort_values("dow", ignore_index=True)
    q = df["qsum"].to_numpy(np.int64)
    n = df["n_sessions"].to_numpy(np.int64)
    mean = q.astype(np.float64) / n.astype(np.float64) / 1e6
    y = mean * 1e6
    mean6 = np.where(y >= 0, np.floor(y + 0.5), -np.floor(-y + 0.5)) / 1e6
    return pa.table({
        "dow": pa.array(df["dow"].to_numpy(np.int64)),
        "n_sessions": pa.array(n),
        "mean_entropy": pa.array(mean6, pa.float64())})


SQL_SESSION_ENTROPY = """
WITH g AS (
  SELECT user_id, event_id, epoch_us(ts) AS tu, event_type,
    CASE WHEN COALESCE(epoch_us(ts) - LAG(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts, event_id), 0)
              > 1800000000
         THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, event_id, tu, event_type,
    SUM(brk) OVER (PARTITION BY user_id
                   ORDER BY tu, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
), tc AS (
  SELECT user_id, sid, event_type, CAST(COUNT(*) AS BIGINT) AS c,
         MIN(tu) AS start_min
  FROM s GROUP BY 1, 2, 3
), sn AS (
  SELECT user_id, sid, CAST(SUM(c) AS BIGINT) AS n,
         MIN(start_min) AS t0
  FROM tc GROUP BY 1, 2
), sess AS (
  SELECT tc.user_id, tc.sid, sn.t0,
    CAST(ROUND(1000000 *
      (-SUM((CAST(tc.c AS DOUBLE) / CAST(sn.n AS DOUBLE))
            * LN(CAST(tc.c AS DOUBLE) / CAST(sn.n AS DOUBLE))
            ORDER BY tc.event_type))) AS BIGINT) AS qe
  FROM tc JOIN sn USING (user_id, sid)
  GROUP BY 1, 2, 3
)
SELECT CAST((t0 // 86400000000 + 3) % 7 + 1 AS BIGINT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       ROUND(CAST(SUM(qe) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / 1000000.0, 6) AS mean_entropy
FROM sess GROUP BY 1
"""


# =====================================================================
# hapax ratio per source (lexical richness)
# =====================================================================

def _hapax_driver_limit() -> int:
    """Read at call time so tests can force the distributed branch
    (the repo's standard guarded-fold discipline)."""
    return int(os.environ.get("CRAWLRAY_HAPAX_DRIVER_LIMIT", 5_000_000))


def q_hapax_ratio(sf_dir: str):
    """Per-source HAPAX ratio: the share of a source's distinct
    vocabulary that occurs exactly once in the WHOLE corpus — the
    lexical-richness readout between heaps_law (growth) and oov_rate
    (coverage): boilerplate-heavy feeds have almost no hapax, scraped
    forums are full of them. ONE token-HASH exchange of block-level
    (token, source, c) Arrow combiners: each partition owns every row
    of its tokens, so corpus totals, per-source distinct markers, and
    hapax credits all fold VECTORIZED partition-locally (a per-token
    pandas map_groups over the ~10⁴-10⁶ token groups measured 4.1 s —
    this fold is sub-second); <= |sources| finale, one division,
    6 dp."""
    from .dataops import _docs
    from .sizing import fold_parts
    from crawlray.functions.murmur3 import hash64_batch_i64

    n_parts = fold_parts()
    ds = _docs(sf_dir, ["source", "text"])

    def counts(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(b["text"].combine_chunks())
        lists = pc.split_pattern_regex(low, "[^a-z]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        src = pc.take(b["source"].combine_chunks(), parent)
        t = pa.table({"token": flat, "source": src})
        t = t.filter(pc.not_equal(t["token"], pa.scalar("")))
        g = t.group_by(["token", "source"]).aggregate([([], "count_all")])
        g = g.rename_columns(["token", "source", "c"])
        h = np.asarray(hash64_batch_i64(g["token"].combine_chunks()))
        kp = (_splitmix64(h).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return g.append_column("kp", pa.array(kp))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        tok, tinv = np.unique(g["token"].to_numpy(), return_inverse=True)
        src, sinv = np.unique(g["source"].to_numpy(), return_inverse=True)
        c = g["c"].to_numpy(np.int64)
        totals = np.zeros(len(tok), np.int64)
        np.add.at(totals, tinv, c)
        pair = tinv * np.int64(len(src)) + sinv
        upair = np.unique(pair)
        pt, ps = upair // len(src), upair % len(src)
        nd = np.bincount(ps, minlength=len(src)).astype(np.int64)
        hap = np.bincount(ps[totals[pt] == 1],
                          minlength=len(src)).astype(np.int64)
        return pd.DataFrame({"source": src, "n_distinct": nd,
                             "n_hapax": hap})

    partials = ds.map_batches(counts, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    limit = _hapax_driver_limit()
    if partials.count() <= limit:
        # combiner rows are vocab×sources-bounded (38k at sf0.1): the
        # columnar driver fold skips TWO Ray shuffles' fixed cost
        # (~2.5 s measured); the kp-exchange path below is the
        # web-scale-vocabulary fallback, forced-branch equality-tested
        frames = [b.to_pandas()
                  for b in partials.iter_batches(batch_format="pyarrow")]
        df = fold(pd.concat(frames, ignore_index=True))
        df = df.groupby("source").sum().reset_index() \
            .astype({"n_distinct": np.int64, "n_hapax": np.int64})
    else:
        agg2 = (partials.groupby("kp")
                .map_groups(fold, batch_format="pandas")
                .groupby("source")
                .aggregate(Sum("n_distinct", alias_name="n_distinct"),
                           Sum("n_hapax", alias_name="n_hapax")))
        df = agg2.to_pandas()
    df = df.sort_values("source", ignore_index=True)
    nd = df["n_distinct"].to_numpy(np.int64)
    nh = df["n_hapax"].to_numpy(np.int64)
    return pa.table({
        "source": pa.array(df["source"], pa.string()),
        "n_distinct": pa.array(nd), "n_hapax": pa.array(nh),
        "hapax_ratio": pa.array(np.round(
            nh.astype(np.float64) / nd.astype(np.float64), 6),
            pa.float64())})


SQL_HAPAX_RATIO = """
WITH tk AS (
  SELECT source, token FROM (
    SELECT source,
           unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
    FROM documents)
  WHERE token <> ''
), st AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM tk GROUP BY 1, 2
), tot AS (
  SELECT token, CAST(SUM(c) AS BIGINT) AS total FROM st GROUP BY 1
)
SELECT st.source,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN tot.total = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hapax,
       ROUND(CAST(SUM(CASE WHEN tot.total = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS hapax_ratio
FROM st JOIN tot USING (token)
GROUP BY 1
"""


# =====================================================================
# co-purchase part pairs (market basket on the fact table)
# =====================================================================

def q_copurchase_pairs(sf_dir: str, k: int = 20):
    """Top-20 part PAIRS by co-occurrence in the same order — the
    market-basket readout on the fact table (pair_lift's event-type
    version scaled to real item cardinality). Plan: ONE orderkey
    exchange of distinct (order, part) rows; each order group emits
    its bounded within-order pairs packed into a single int64 key
    ((lo << 32) | hi — partkeys are < 2^31, asserted); a packed-key-
    hash partition bincount folds pair counts (the common_neighbors
    shape); per-partition partial top-k merges on the driver
    (count DESC, pair ASC tie-break both sides)."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def prep(b: pa.Table) -> pa.Table:
        g = pa.table({"o": b["l_orderkey"], "p": b["l_partkey"]}) \
            .group_by(["o", "p"]).aggregate([])
        o = g["o"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(o).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return g.append_column("kp", pa.array(kp))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        df_ = g.drop_duplicates(["o", "p"])
        o = df_["o"].to_numpy(np.int64)
        p = df_["p"].to_numpy(np.int64)
        assert p.max() < (1 << 31), "partkey exceeds the 32-bit pack"
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        starts = np.unique(o, return_index=True)[1]
        keys = []
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < len(starts) else len(o)
            parts_ = p[s:e]
            if len(parts_) < 2:
                continue
            iu, iv = np.triu_indices(len(parts_), k=1)
            keys.append((parts_[iu] << np.int64(32)) | parts_[iv])
        if not keys:
            return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                 "kp2": pd.Series([], dtype=np.int64)})
        key = np.concatenate(keys)
        kp2 = (_splitmix64(key).view(np.uint64)
               % np.uint64(n_parts)).astype(np.int64)
        return pd.DataFrame({"key": key, "kp2": kp2})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uk, c = np.unique(g["key"].to_numpy(np.int64), return_counts=True)
        df_ = pd.DataFrame({"key": uk, "n": c.astype(np.int64)})
        df_ = df_.sort_values(["n", "key"], ascending=[False, True],
                              kind="mergesort").head(k)
        return df_

    rows = [r for b in
            (ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("kp").map_groups(pairs, batch_format="pandas")
             .groupby("kp2").map_groups(fold, batch_format="pandas"))
            .iter_batches(batch_format="pyarrow")
            for r in zip(b["key"].to_pylist(), b["n"].to_pylist())]
    rows.sort(key=lambda r: (-r[1], r[0]))
    top = rows[:k]
    return pa.table({
        "part_a": pa.array([r[0] >> 32 for r in top], pa.int64()),
        "part_b": pa.array([r[0] & 0xFFFFFFFF for r in top], pa.int64()),
        "n": pa.array([r[1] for r in top], pa.int64())})


SQL_COPURCHASE_PAIRS = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
pr AS (
  SELECT a.p AS part_a, b.p AS part_b, CAST(COUNT(*) AS BIGINT) AS n
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
)
SELECT part_a, part_b, n FROM pr
QUALIFY ROW_NUMBER() OVER (
  ORDER BY n DESC, part_a * 4294967296 + part_b) <= 20
"""


# =====================================================================
# hierarchical share-of-parent (region → nation)
# =====================================================================

def q_share_of_parent(sf_dir: str):
    """Each nation's share of its REGION's customer-order revenue —
    the share-of-parent readout a drill-down dashboard shows at every
    level (rollup_agg gives the totals; this gives the ratios that
    make them readable). Dimension chain (customer → nation → region)
    broadcasts as one LUT (the revenue_by_nation shape); orders fold
    block-locally to exact <= |nations| int partials; region totals
    derive from the SAME fold (no second pass); one division per
    nation, 6 dp."""
    import pyarrow.parquet as pq

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_regionkey", "n_name"])
    ck = np.asarray(cust["c_custkey"], dtype=np.int64)
    cn = np.asarray(cust["c_nationkey"], dtype=np.int64)
    lut_nat = np.zeros(int(ck.max()) + 1, np.int64)
    lut_nat[ck] = cn
    nk = np.asarray(nat["n_nationkey"], dtype=np.int64)
    nr = np.asarray(nat["n_regionkey"], dtype=np.int64)
    nname = np.asarray(nat["n_name"], dtype=object)
    n_nat = int(nk.max()) + 1
    lut_reg = np.zeros(n_nat, np.int64)
    lut_reg[nk] = nr
    names = np.empty(n_nat, object)
    names[nk] = nname
    lut_ref = ray.put((lut_nat, n_nat))

    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        import ray as _r

        nat_lut, nn = _r.get(lut_ref)
        c = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)
        code = nat_lut[c]
        s = np.zeros(nn, np.int64)
        np.add.at(s, code, cents)
        return pa.table({"nation": pa.array(np.arange(nn, dtype=np.int64)),
                         "cents": pa.array(s)})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("nation")
           .aggregate(Sum("cents", alias_name="cents")))
    df = agg.to_pandas()  # <= |nations| rows — bounded fold
    cents = np.zeros(n_nat, np.int64)
    cents[df["nation"].to_numpy(np.int64)] = df["cents"].to_numpy(np.int64)
    reg_tot = np.zeros(int(nr.max()) + 1, np.int64)
    np.add.at(reg_tot, lut_reg, cents)
    keep = cents > 0
    idx = np.nonzero(keep)[0]
    return pa.table({
        "region": pa.array(lut_reg[idx]),
        "nation": pa.array([str(names[i]) for i in idx], pa.string()),
        "cents": pa.array(cents[idx]),
        "share_of_region": pa.array(np.round(
            cents[idx].astype(np.float64)
            / reg_tot[lut_reg[idx]].astype(np.float64), 6), pa.float64())})


SQL_SHARE_OF_PARENT = """
WITH r AS (
  SELECT n.n_regionkey AS region, n.n_name AS nation,
         SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
), t AS (
  SELECT region, CAST(SUM(cents) AS HUGEINT) AS rt FROM r GROUP BY 1
)
SELECT CAST(r.region AS BIGINT) AS region, r.nation,
       CAST(r.cents AS BIGINT) AS cents,
       ROUND(CAST(r.cents AS DOUBLE) / CAST(t.rt AS DOUBLE), 6)
         AS share_of_region
FROM r JOIN t USING (region)
WHERE r.cents > 0
"""


# =====================================================================
# maximum drawdown of the daily revenue series
# =====================================================================

def q_max_drawdown(sf_dir: str):
    """Maximum DRAWDOWN of daily revenue: the deepest relative fall
    from any prior running-maximum day — the stability readout that
    ranks a volatile feed below a steady one even at equal totals
    (finance's risk metric applied to pipeline throughput). Running
    max and the (rm − rev) numerators are exact int64 on the bounded
    day fold; each day's drawdown is ONE identical division; the
    maximum of those doubles is order-independent. Output: the max
    drawdown and the count of days at a new running maximum."""
    df = _day_rev_fold(sf_dir)
    rev = df["rev"].to_numpy(np.int64)
    rm = np.maximum.accumulate(rev)
    dd = (rm - rev).astype(np.float64) / rm.astype(np.float64)
    return pa.table({
        "n_days": pa.array([len(rev)], pa.int64()),
        "n_peak_days": pa.array([int((rev == rm).sum())], pa.int64()),
        "max_drawdown": pa.array([np.round(float(dd.max()), 6)],
                                 pa.float64())})


SQL_MAX_DRAWDOWN = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), w AS (
  SELECT day, rev,
    MAX(rev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS rm
  FROM d
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
  CAST(SUM(CASE WHEN rev = rm THEN 1 ELSE 0 END) AS BIGINT)
    AS n_peak_days,
  ROUND(MAX(CAST(rm - rev AS DOUBLE) / CAST(rm AS DOUBLE)), 6)
    AS max_drawdown
FROM w
"""


# =====================================================================
# Simpson's paradox check (aggregate vs per-group slopes)
# =====================================================================

def q_simpson_check(sf_dir: str):
    """Simpson's-paradox audit: the OLS slope of extendedprice on
    discount computed over ALL lineitems and within each returnflag
    group, plus a reversed flag when the aggregate slope's sign
    contradicts every group's — the one-query sanity check that stops
    a dashboard from shipping a confounded trend. Five exact int64
    moment partials per scope through a <= 4-row exchange (the ALL
    scope is the SUM of the group partials — no second pass); slope =
    (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) in unbounded ints, one division,
    6 dp."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_discount", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        x = _cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        y = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        flags = np.asarray(b["l_returnflag"], dtype=object)
        uf, inv = np.unique(flags, return_inverse=True)
        out = {"flag": pa.array(uf)}
        for name, v in (("n", np.ones(len(x), np.int64)),
                        ("sx", x), ("sy", y),
                        ("sxx", x * x), ("sxy", x * y)):
            s = np.zeros(len(uf), np.int64)
            np.add.at(s, inv, v)
            out[name] = pa.array(s)
        return pa.table(out)

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("flag")
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ["n", "sx", "sy", "sxx", "sxy"]]))
    df = agg.to_pandas().sort_values("flag", ignore_index=True)

    def slope(n, sx, sy, sxx, sxy):
        den = n * sxx - sx * sx
        return None if den == 0 else float(n * sxy - sx * sy) / float(den)

    rows = {"scope": [], "n": [], "slope": []}
    g_slopes = []
    tot = [0] * 5
    for _, r in df.iterrows():
        vals = [int(r[c]) for c in ["n", "sx", "sy", "sxx", "sxy"]]
        tot = [a + b for a, b in zip(tot, vals)]
        s = slope(*vals)
        g_slopes.append(s)
        rows["scope"].append(str(r["flag"]))
        rows["n"].append(vals[0])
        rows["slope"].append(None if s is None else np.round(s, 6))
    s_all = slope(*tot)
    rows["scope"].append("ALL")
    rows["n"].append(tot[0])
    rows["slope"].append(None if s_all is None else np.round(s_all, 6))
    reversed_flag = int(s_all is not None and all(
        s is not None and (s > 0) != (s_all > 0) for s in g_slopes))
    return pa.table({
        "scope": pa.array(rows["scope"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "slope": pa.array(rows["slope"], pa.float64()),
        "reversed": pa.array([reversed_flag] * len(rows["scope"]),
                             pa.int64())})


SQL_SIMPSON_CHECK = """
WITH m AS (
  SELECT l_returnflag AS scope,
    CAST(COUNT(*) AS HUGEINT) AS n,
    CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS HUGEINT) AS sx,
    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
      AS sy,
    CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
             * CAST(ROUND(l_discount * 100) AS BIGINT)) AS HUGEINT)
      AS sxx,
    CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
             * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS HUGEINT)
      AS sxy
  FROM lineitem GROUP BY 1
), a AS (
  SELECT 'ALL' AS scope, SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
         SUM(sxx) AS sxx, SUM(sxy) AS sxy
  FROM m
), u AS (SELECT * FROM m UNION ALL SELECT * FROM a),
s AS (
  SELECT scope, n,
    CASE WHEN n * sxx - sx * sx <> 0
         THEN CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope
  FROM u
), rev AS (
  SELECT CAST(CASE WHEN
    (SELECT slope FROM s WHERE scope = 'ALL') IS NOT NULL
    AND NOT EXISTS (
      SELECT 1 FROM s WHERE scope <> 'ALL'
        AND (slope IS NULL
             OR (slope > 0) = ((SELECT slope FROM s
                                WHERE scope = 'ALL') > 0)))
    THEN 1 ELSE 0 END AS BIGINT) AS reversed
)
SELECT s.scope, CAST(s.n AS BIGINT) AS n, ROUND(s.slope, 6) AS slope,
       rev.reversed
FROM s, rev
"""


# =====================================================================
# error-run-length histogram (gaps-and-islands, RLE)
# =====================================================================

def q_type_runs(sf_dir: str):
    """Histogram of CONSECUTIVE-error run lengths within each user's
    event stream — the run-length-encoding readout that separates
    isolated failures from error storms (SQL's gaps-and-islands
    pattern, done here as one vectorized RLE per partition). ONE
    user-hash exchange, (ts, event_id) tuple order; a run boundary is
    a user change or a non-error between errors; <= max-run-length
    bincount partials."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"], "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "is_err": pc.equal(b["event_type"],
                               pa.scalar("error")).cast(pa.int64()),
            "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        err = g["is_err"].to_numpy(np.int64).astype(bool)
        order = np.lexsort((eid, ts, uid))
        uid, err = uid[order], err[order]
        # run starts: an error whose predecessor is a different user
        # or a non-error
        start = err.copy()
        start[1:] &= (uid[1:] != uid[:-1]) | ~err[:-1]
        run_id = np.cumsum(start) - 1
        lengths = np.bincount(run_id[err])
        ul, c = np.unique(lengths[lengths > 0], return_counts=True)
        return pd.DataFrame({"run_len": ul.astype(np.int64),
                             "n_runs": c.astype(np.int64)})

    return (ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("kp").map_groups(fold, batch_format="pandas")
            .groupby("run_len")
            .aggregate(Sum("n_runs", alias_name="n_runs")))


SQL_TYPE_RUNS = """
WITH s AS (
  SELECT user_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS rn,
    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS rt
  FROM events
), runs AS (
  SELECT user_id, rn - rt AS grp, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM s WHERE event_type = 'error' GROUP BY 1, 2
)
SELECT run_len, CAST(COUNT(*) AS BIGINT) AS n_runs
FROM runs GROUP BY 1
"""


# =====================================================================
# consecutive-order-day islands
# =====================================================================

def q_order_islands(sf_dir: str):
    """Gaps-and-islands over ORDER DAYS: the distribution of
    consecutive-day runs in the order calendar (how long does demand
    stay unbroken?) plus the longest island — the island twin of
    sequence_gaps. One <= #days exchange; the island decomposition is
    a single diff on the sorted day table (day − rank is constant
    within an island, exactly the oracle's ROW_NUMBER trick)."""
    df = _day_rev_fold(sf_dir)
    day = df["day"].to_numpy(np.int64)
    grp = day - np.arange(len(day), dtype=np.int64)
    _, counts = np.unique(grp, return_counts=True)
    ul, c = np.unique(counts, return_counts=True)
    return pa.table({
        "island_len": pa.array(ul.astype(np.int64)),
        "n_islands": pa.array(c.astype(np.int64))})


SQL_ORDER_ISLANDS = """
WITH d AS (
  SELECT DISTINCT epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
), g AS (
  SELECT day, day - ROW_NUMBER() OVER (ORDER BY day) AS grp FROM d
), runs AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS island_len FROM g GROUP BY 1
)
SELECT island_len, CAST(COUNT(*) AS BIGINT) AS n_islands
FROM runs GROUP BY 1
"""


# =====================================================================
# winback rate (churn-and-return lifecycle)
# =====================================================================

def q_winback_rate(sf_dir: str, churn_days: int = 60):
    """Winback audit: how many users ever went quiet for more than 60
    days between purchases, and how many of their silences ended in
    another purchase — the lifecycle readout a reactivation campaign
    is judged against. Per-user purchase gaps are partition-local
    after ONE user-hash exchange ((ts, event_id) tuple order); every
    over-threshold gap is a churn episode and every such gap is by
    construction a winback (a TRAILING silence has no next purchase,
    so episodes = gaps > T between consecutive purchases, winbacks =
    those same gaps — the table also reports users still quiet at the
    horizon = the newest PURCHASE anywhere, so the whole query is one
    pass over the purchase stream). Exact integer day math; one
    division, 6 dp."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    gap_us = churn_days * DAY_US
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.equal(b["event_type"], pa.scalar("purchase"))
        t = b.filter(m)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"], "event_id": t["event_id"],
            "ts_us": t["ts"].cast(pa.int64()), "kp": pa.array(kp),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    horizon = int(prepped.aggregate(Max("ts_us"))["max(ts_us)"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        same = uid[1:] == uid[:-1]
        winbacks = int(((ts[1:] - ts[:-1] > gap_us) & same).sum())
        # users whose LAST purchase is > T before the horizon
        last = np.ones(len(uid), bool)
        last[:-1] = ~same
        still_quiet = int((horizon - ts[last] > gap_us).sum())
        n_users = int(last.sum())
        return pd.DataFrame({
            "n_users": [n_users], "winbacks": [winbacks],
            "still_quiet": [still_quiet]})

    agg = (prepped
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .aggregate(Sum("n_users", alias_name="n_users"),
                      Sum("winbacks", alias_name="winbacks"),
                      Sum("still_quiet", alias_name="still_quiet")))
    n_users = int(agg["n_users"])
    winbacks = int(agg["winbacks"])
    quiet = int(agg["still_quiet"])
    episodes = winbacks + quiet
    return pa.table({
        "n_users": pa.array([n_users], pa.int64()),
        "episodes": pa.array([episodes], pa.int64()),
        "winbacks": pa.array([winbacks], pa.int64()),
        "winback_rate": pa.array(
            [None if episodes == 0
             else np.round(float(winbacks) / float(episodes), 6)],
            pa.float64())})


SQL_WINBACK_RATE = """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS tu,
    LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type = 'purchase'
), h AS (SELECT MAX(epoch_us(ts)) AS horizon FROM events
         WHERE event_type = 'purchase'),
w AS (
  SELECT CAST(SUM(CASE WHEN tu - prev > 60 * 86400000000 THEN 1
                       ELSE 0 END) AS BIGINT) AS winbacks
  FROM p WHERE prev IS NOT NULL
), q AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
    CAST(SUM(CASE WHEN h.horizon - lastp > 60 * 86400000000 THEN 1
             ELSE 0 END) AS BIGINT) AS still_quiet
  FROM (SELECT user_id, MAX(tu) AS lastp FROM p GROUP BY 1), h
  GROUP BY ALL
)
SELECT q.n_users, w.winbacks + q.still_quiet AS episodes, w.winbacks,
  CASE WHEN w.winbacks + q.still_quiet > 0
       THEN ROUND(CAST(w.winbacks AS DOUBLE)
                  / CAST(w.winbacks + q.still_quiet AS DOUBLE), 6)
  END AS winback_rate
FROM w, q
"""


# =====================================================================
# supplier lead-time consistency (variance of ship lag per supplier)
# =====================================================================

def q_lag_consistency(sf_dir: str, k: int = 20):
    """Top-20 LEAST consistent suppliers by ship-lag standard
    deviation — ship_lag told you the fleet median; this names the
    suppliers whose lead time you cannot plan around. The
    order-date/ship-date join rides ONE orderkey-hash exchange (the
    temporal_join tag pattern); per-supplier exact int64 moment
    partials (n, Σlag, Σlag²) fold through a <= |suppliers| exchange;
    std = √((nΣx²−(Σx)²)/n²) in unbounded ints until one sqrt, ranked
    (std DESC, suppkey) both sides, 6 dp. The +10000-day offset makes
    numpy floor-div equal DuckDB's truncating // on negative lags."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    off = 10_000

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])

    def prep_o(b: pa.Table) -> pa.Table:
        kk = b["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        kp = (_splitmix64(kk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "okey": b["o_orderkey"],
            "ts": b["o_orderdate"].cast(pa.int64()),
            "supp": pa.array(np.full(b.num_rows, -1, np.int64)),
            "kp": pa.array(kp),
        })

    def prep_l(b: pa.Table) -> pa.Table:
        kk = b["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        kp = (_splitmix64(kk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "okey": b["l_orderkey"],
            "ts": b["l_shipdate"].cast(pa.int64()),
            "supp": b["l_suppkey"],
            "kp": pa.array(kp),
        })

    tagged = orders.map_batches(prep_o, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .union(li.map_batches(prep_l, batch_format="pyarrow",
                              zero_copy_batch=True))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        side = g["supp"].to_numpy(np.int64)
        om = side < 0
        okey = g["okey"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        ok, ot = okey[om], ts[om]
        osort = np.argsort(ok, kind="mergesort")
        ok, ot = ok[osort], ot[osort]
        lk, lt_, sup = okey[~om], ts[~om], side[~om]
        od = ot[np.searchsorted(ok, lk)]        # vectorized key lookup
        lag = (lt_ - od) // DAY_US + off
        us, inv = np.unique(sup, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s1 = np.zeros(len(us), np.int64)
        s2 = np.zeros(len(us), np.int64)
        np.add.at(s1, inv, lag)
        np.add.at(s2, inv, lag * lag)
        return pd.DataFrame({"supp": us, "n": n, "s1": s1, "s2": s2})

    # <= |suppliers|·partitions skinny partial rows: the columnar
    # driver fold replaces a Ray hash Aggregate that measured 6.1 s on
    # the same 64k rows (the ship_lag/abc_pareto lesson yet again)
    acc: dict[str, list] = {"supp": [], "n": [], "s1": [], "s2": []}
    for b in (tagged.groupby("kp").map_groups(fold,
                                              batch_format="pandas")
              .iter_batches(batch_format="pyarrow")):
        for col in acc:
            acc[col].append(b[col].to_numpy(zero_copy_only=False))
    supp_all = np.concatenate(acc["supp"])
    us, inv = np.unique(supp_all, return_inverse=True)
    supp = us.astype(np.int64)
    n = np.zeros(len(us), np.int64)
    s1 = np.zeros(len(us), np.int64)
    s2 = np.zeros(len(us), np.int64)
    np.add.at(n, inv, np.concatenate(acc["n"]))
    np.add.at(s1, inv, np.concatenate(acc["s1"]))
    np.add.at(s2, inv, np.concatenate(acc["s2"]))
    keep = n >= 2
    supp, n, s1, s2 = supp[keep], n[keep], s1[keep], s2[keep]
    # n·s2 and s1² stay < 2^63 at these magnitudes (lag+offset < 2^15,
    # n < 2^31) — vectorized, no python-int loop over |suppliers|
    var_num = n * s2 - s1 * s1
    std = np.round(np.sqrt(var_num.astype(np.float64)
                           / (n * n).astype(np.float64)), 6)
    order = np.lexsort((supp, -std))[:k]
    top = [(int(supp[i]), int(n[i]), float(std[i])) for i in order]
    return pa.table({
        "supp": pa.array([r[0] for r in top], pa.int64()),
        "n": pa.array([r[1] for r in top], pa.int64()),
        "lag_std": pa.array([r[2] for r in top], pa.float64())})


SQL_LAG_CONSISTENCY = """
WITH j AS (
  SELECT l.l_suppkey AS supp,
    (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000
      + 10000 AS lag
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), m AS (
  SELECT supp, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(lag) AS HUGEINT) AS s1,
         CAST(SUM(lag * lag) AS HUGEINT) AS s2
  FROM j GROUP BY 1 HAVING COUNT(*) >= 2
), s AS (
  SELECT supp, CAST(n AS BIGINT) AS n,
    ROUND(SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE)
               / CAST(n * n AS DOUBLE)), 6) AS lag_std
  FROM m
)
SELECT supp, n, lag_std FROM s
QUALIFY ROW_NUMBER() OVER (ORDER BY lag_std DESC, supp) <= 20
"""


# =====================================================================
# two-way interaction effects (dow × priority)
# =====================================================================

def q_two_way_effects(sf_dir: str):
    """Two-way ANOVA-style INTERACTION surface: mean order revenue per
    (weekday × priority) cell minus the additive model (grand + row +
    column effects) — the interaction readout that says whether
    priority behaves differently on weekends before anyone fits a
    model. One <= 7×|priorities| exchange of exact int64 (n, cents)
    partials; row/column/grand sums derive from the SAME fold; the
    interaction is ONE identical IEEE expression (four divisions) per
    cell, 6 dp."""
    ds = _t(sf_dir, "orders", ["o_orderdate", "o_orderpriority",
                               "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        day = (b["o_orderdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        dow = ((day + 3) % 7 + 1).astype(np.int64)
        t = pa.table({"dow": pa.array(dow), "prio": b["o_orderpriority"],
                      "c": _cents(b["o_totalprice"]),
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["dow", "prio"]).aggregate([("c", "sum"),
                                                   ("n", "sum")])
        return g.rename_columns(["dow", "prio", "c", "n"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["dow", "prio"])
           .aggregate(Sum("c", alias_name="c"), Sum("n", alias_name="n")))
    df = agg.to_pandas()
    row = df.groupby("dow")[["c", "n"]].sum()
    col = df.groupby("prio")[["c", "n"]].sum()
    s, n = int(df["c"].sum()), int(df["n"].sum())
    rows = {"dow": [], "prio": [], "n": [], "interaction": []}
    for _, r in df.sort_values(["dow", "prio"]).iterrows():
        d, p = int(r["dow"]), str(r["prio"])
        inter = (float(int(r["c"])) / float(int(r["n"]))
                 - float(int(row.loc[d, "c"])) / float(int(row.loc[d, "n"]))
                 - float(int(col.loc[p, "c"])) / float(int(col.loc[p, "n"]))
                 + float(s) / float(n))
        rows["dow"].append(d)
        rows["prio"].append(p)
        rows["n"].append(int(r["n"]))
        rows["interaction"].append(np.round(inter, 6))
    return pa.table({
        "dow": pa.array(rows["dow"], pa.int64()),
        "prio": pa.array(rows["prio"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "interaction": pa.array(rows["interaction"], pa.float64())})


SQL_TWO_WAY_EFFECTS = """
WITH o AS (
  SELECT (epoch_us(o_orderdate) // 86400000000 + 3) % 7 + 1 AS dow,
         o_orderpriority AS prio,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
), cell AS (
  SELECT dow, prio, CAST(SUM(c) AS HUGEINT) AS sc,
         CAST(COUNT(*) AS HUGEINT) AS nc
  FROM o GROUP BY 1, 2
), rw AS (
  SELECT dow, CAST(SUM(sc) AS HUGEINT) AS sr,
         CAST(SUM(nc) AS HUGEINT) AS nr
  FROM cell GROUP BY 1
), cl AS (
  SELECT prio, CAST(SUM(sc) AS HUGEINT) AS sp,
         CAST(SUM(nc) AS HUGEINT) AS np
  FROM cell GROUP BY 1
), g AS (
  SELECT CAST(SUM(sc) AS HUGEINT) AS s, CAST(SUM(nc) AS HUGEINT) AS n
  FROM cell
)
SELECT CAST(cell.dow AS BIGINT) AS dow, cell.prio,
       CAST(cell.nc AS BIGINT) AS n,
       ROUND(CAST(cell.sc AS DOUBLE) / CAST(cell.nc AS DOUBLE)
             - CAST(rw.sr AS DOUBLE) / CAST(rw.nr AS DOUBLE)
             - CAST(cl.sp AS DOUBLE) / CAST(cl.np AS DOUBLE)
             + CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE), 6)
         AS interaction
FROM cell JOIN rw USING (dow) JOIN cl USING (prio), g
"""


# =====================================================================
# quantity × discount joint grid
# =====================================================================

def q_qty_discount_grid(sf_dir: str):
    """Joint distribution of (quantity, discount%) with mean unit
    revenue per cell — the 2-D pricing heatmap (bounded 50×11 grid)
    that shows where discounting actually concentrates. Block-local
    packed-code bincounts (the dow_hour_heatmap shape at a bigger
    grid); exact cents; one division per cell, 6 dp."""
    ds = _t(sf_dir, "lineitem",
            ["l_quantity", "l_discount", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        q = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d = _cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        c = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        code = q * 101 + d
        size = int(code.max()) + 1
        n = np.bincount(code, minlength=size).astype(np.int64)
        s = np.zeros(size, np.int64)
        np.add.at(s, code, c)
        nz = np.nonzero(n)[0]
        return pa.table({
            "qty": pa.array((nz // 101).astype(np.int64)),
            "disc": pa.array((nz % 101).astype(np.int64)),
            "n": pa.array(n[nz]), "cents": pa.array(s[nz]),
        })

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["qty", "disc"])
           .aggregate(Sum("n", alias_name="n"),
                      Sum("cents", alias_name="cents")))

    def finalize(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = b["cents"].to_numpy(zero_copy_only=False).astype(np.float64)
        # half-AWAY 6-dp finale (DuckDB ROUND): integer-ratio means DO
        # land exactly on .5e-6 boundaries
        y = (c / n) * 1e6
        m6 = np.where(y >= 0, np.floor(y + 0.5), -np.floor(-y + 0.5)) / 1e6
        return pa.table({
            "qty": b["qty"], "disc": b["disc"], "n": b["n"],
            "mean_cents": pa.array(m6, pa.float64())})

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_QTY_DISCOUNT_GRID = """
SELECT CAST(ROUND(l_quantity) AS BIGINT) AS qty,
       CAST(ROUND(l_discount * 100) AS BIGINT) AS disc,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS mean_cents
FROM lineitem GROUP BY 1, 2
"""


# =====================================================================
# event-type co-usage Jaccard (bitmask inclusion counts)
# =====================================================================

def q_type_overlap(sf_dir: str):
    """User-set Jaccard between every event-type pair — which features
    share an audience (source_overlap's bitmask trick on the behavior
    axis). Each partition of ONE user-hash exchange folds its users'
    type BITMASKS (<= 2^|types| = 32 distinct masks!), so the whole
    overlap structure crosses the wire as <= 32 counts; the driver
    recovers every pairwise intersection/union by exact popcount
    arithmetic — the |types|²·|users| join never exists. One division
    per pair, 6 dp."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    # fixed global type order: the bounded distinct fold
    types = sorted(
        r["event_type"] for r in
        ds.map_batches(
            lambda b: pa.table({"event_type": pc.unique(
                b["event_type"].combine_chunks())}),
            batch_format="pyarrow").groupby("event_type").count()
        .select_columns(["event_type"]).take_all())
    tcode = {t: i for i, t in enumerate(types)}
    code_ref = ray.put(tcode)

    def prep(b: pa.Table) -> pa.Table:
        g = pa.table({"u": b["user_id"], "t": b["event_type"]}) \
            .group_by(["u", "t"]).aggregate([])
        u = g["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(u).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return g.append_column("kp", pa.array(kp))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _r

        codes = _r.get(code_ref)
        u = g["u"].to_numpy(np.int64)
        bit = np.array([1 << codes[t] for t in g["t"]], np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        mask = np.zeros(len(uu), np.int64)
        np.bitwise_or.at(mask, inv, bit)
        um, c = np.unique(mask, return_counts=True)
        return pd.DataFrame({"mask": um.astype(np.int64),
                             "n": c.astype(np.int64)})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .groupby("mask")
           .aggregate(Sum("n", alias_name="n")))
    counts = {int(r["mask"]): int(r["n"]) for r in agg.take_all()}
    rows = {"type_a": [], "type_b": [], "both": [], "either": [],
            "jaccard": []}
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            j = tcode[tb]
            bi, bj = 1 << tcode[ta], 1 << j
            both = sum(n for m, n in counts.items()
                       if (m & bi) and (m & bj))
            either = sum(n for m, n in counts.items()
                         if (m & bi) or (m & bj))
            rows["type_a"].append(ta)
            rows["type_b"].append(tb)
            rows["both"].append(both)
            rows["either"].append(either)
            rows["jaccard"].append(np.round(
                float(both) / float(either), 6))
    return pa.table({
        "type_a": pa.array(rows["type_a"], pa.string()),
        "type_b": pa.array(rows["type_b"], pa.string()),
        "both": pa.array(rows["both"], pa.int64()),
        "either": pa.array(rows["either"], pa.int64()),
        "jaccard": pa.array(rows["jaccard"], pa.float64())})


SQL_TYPE_OVERLAP = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
), s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY 1
)
SELECT p.type_a, p.type_b, p.both,
       sa.n + sb.n - p.both AS either,
       ROUND(CAST(p.both AS DOUBLE)
             / CAST(sa.n + sb.n - p.both AS DOUBLE), 6) AS jaccard
FROM p JOIN s sa ON sa.event_type = p.type_a
       JOIN s sb ON sb.event_type = p.type_b
"""


# =====================================================================
# n-th purchase revenue curve
# =====================================================================

def q_purchase_index_curve(sf_dir: str):
    """Average purchase value by the purchase's per-user SEQUENCE
    INDEX (1st, 2nd, 3rd …) — do customers spend more as they mature?
    The lifecycle curve every LTV model is sanity-checked against.
    ONE user-hash exchange; per-user ranks come from one partition
    lexsort ((ts, event_id) tuple order); per-index exact int64
    (n, cents) partials are bounded by the max purchases-per-user;
    one division per index, half-away 6-dp finale."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts",
                               "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.equal(b["event_type"], pa.scalar("purchase"))
        t = b.filter(m)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"], "event_id": t["event_id"],
            "ts_us": t["ts"].cast(pa.int64()), "c": _cents(t["value"]),
            "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, c = uid[order], c[order]
        new = np.ones(len(uid), bool)
        new[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(new)[0]
        idx = np.arange(len(uid)) - np.repeat(starts, np.diff(
            np.concatenate([starts, [len(uid)]]))) + 1
        ui, n = np.unique(idx, return_counts=True)
        s = np.zeros(len(ui), np.int64)
        np.add.at(s, np.searchsorted(ui, idx), c)
        return pd.DataFrame({"pidx": ui.astype(np.int64),
                             "n": n.astype(np.int64), "cents": s})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .groupby("pidx")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("cents", alias_name="cents")))
    df = agg.to_pandas().sort_values("pidx", ignore_index=True)
    n = df["n"].to_numpy(np.int64).astype(np.float64)
    c = df["cents"].to_numpy(np.int64).astype(np.float64)
    y = (c / n) * 1e6
    m6 = np.where(y >= 0, np.floor(y + 0.5), -np.floor(-y + 0.5)) / 1e6
    return pa.table({
        "pidx": pa.array(df["pidx"].to_numpy(np.int64)),
        "n": pa.array(df["n"].to_numpy(np.int64)),
        "mean_cents": pa.array(m6, pa.float64())})


SQL_PURCHASE_INDEX_CURVE = """
WITH p AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS pidx
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST(pidx AS BIGINT) AS pidx, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS mean_cents
FROM p GROUP BY 1
"""


# =====================================================================
# token burstiness (collection vs document frequency)
# =====================================================================

def q_token_burstiness(sf_dir: str, k: int = 50):
    """Burstiness of the top-50 tokens: collection frequency over
    document frequency (mean occurrences per CONTAINING doc) — the
    Church–Gale readout separating topical words (bursty: when they
    appear, they appear often) from function words (spread thin).
    Block combiners emit per-token (cf, df) pairs from ONE Arrow
    value_counts + one distinct pass; a token groupby folds them; the
    driver takes the top-50 by (cf DESC, token) — exact ints, one
    division, 6 dp."""
    from .dataops import _docs

    ds = _docs(sf_dir, ["text"])

    def counts(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(b["text"].combine_chunks())
        lists = pc.split_pattern_regex(low, "[^a-z]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        ok = pc.not_equal(flat, pa.scalar(""))
        flat = flat.filter(ok)
        parent = parent.filter(ok)
        vc = pc.value_counts(flat)
        # df partial: distinct (doc, token) pairs per block
        dt = pa.table({"p": parent, "t": flat}) \
            .group_by(["p", "t"]).aggregate([])
        dfc = pc.value_counts(dt["t"].combine_chunks())
        cf_map = {str(v): int(c.as_py()) for v, c in
                  zip(vc.field("values"), vc.field("counts"))}
        out_t, out_cf, out_df = [], [], []
        for v, c in zip(dfc.field("values"), dfc.field("counts")):
            tok = str(v)
            out_t.append(tok)
            out_cf.append(cf_map[tok])
            out_df.append(int(c.as_py()))
        return pa.table({"token": pa.array(out_t, pa.string()),
                         "cf": pa.array(out_cf, pa.int64()),
                         "df": pa.array(out_df, pa.int64())})

    agg = (ds.map_batches(counts, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("token")
           .aggregate(Sum("cf", alias_name="cf"),
                      Sum("df", alias_name="df")))

    def partial_top(b: pa.Table) -> pa.Table:
        df_ = b.to_pandas().sort_values(
            ["cf", "token"], ascending=[False, True], kind="mergesort")
        return pa.Table.from_pandas(df_.head(k), preserve_index=False)

    rows = [r for b in agg.map_batches(partial_top,
                                       batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
            for r in zip(b["token"].to_pylist(), b["cf"].to_pylist(),
                         b["df"].to_pylist())]
    rows.sort(key=lambda r: (-r[1], r[0]))
    top = rows[:k]
    cf = np.array([r[1] for r in top], np.int64)
    df_ = np.array([r[2] for r in top], np.int64)
    return pa.table({
        "token": pa.array([r[0] for r in top], pa.string()),
        "cf": pa.array(cf), "df": pa.array(df_),
        "burstiness": pa.array(np.round(
            cf.astype(np.float64) / df_.astype(np.float64), 6),
            pa.float64())})


SQL_TOKEN_BURSTINESS = """
WITH tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
    FROM documents)
  WHERE token <> ''
), m AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY 1
)
SELECT token, cf, df,
       ROUND(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE), 6) AS burstiness
FROM m
QUALIFY ROW_NUMBER() OVER (ORDER BY cf DESC, token) <= 50
"""


# =====================================================================
# session path cardinality (sequence mining)
# =====================================================================

def q_path_cardinality(sf_dir: str, k: int = 5):
    """How many DISTINCT event-type paths do sessions take, and which
    five dominate — the sequence-mining readout behind any UX funnel
    redesign (path = the session's full type sequence in (ts,
    event_id) order, 30-minute-gap sessions). Paths are partition-
    local after ONE user-hash exchange; each partition emits
    (path, n) partials; the finale reports total distinct paths and
    the top-5 by (count DESC, path)."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    gap_us = 1800 * 1_000_000
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"], "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "event_type": b["event_type"], "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[order], ts[order], et[order]
        brk = np.ones(len(ts), bool)
        brk[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        sess = np.cumsum(brk) - 1
        paths: dict[str, int] = {}
        starts = np.nonzero(brk)[0]
        ends = np.concatenate([starts[1:], [len(sess)]])
        for s, e in zip(starts, ends):
            p = ">".join(et[s:e])
            paths[p] = paths.get(p, 0) + 1
        return pd.DataFrame({"path": list(paths.keys()),
                             "n": np.array(list(paths.values()),
                                           np.int64)})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .groupby("path")
           .aggregate(Sum("n", alias_name="n")))
    df = agg.to_pandas()
    df = df.sort_values(["n", "path"], ascending=[False, True],
                        ignore_index=True, kind="mergesort")
    top = df.head(k)
    return pa.table({
        "path": pa.array(list(top["path"]) + ["__total_distinct__"],
                         pa.string()),
        "n": pa.array(list(top["n"].astype(np.int64)) + [len(df)],
                      pa.int64())})


SQL_PATH_CARDINALITY = """
WITH g AS (
  SELECT user_id, event_id, epoch_us(ts) AS tu, event_type,
    CASE WHEN COALESCE(epoch_us(ts) - LAG(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts, event_id), 0)
              > 1800000000
         THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, event_id, tu, event_type,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY tu, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
), p AS (
  SELECT user_id, sid,
         STRING_AGG(event_type, '>' ORDER BY tu, event_id) AS path
  FROM s GROUP BY 1, 2
), c AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1
), topk AS (
  SELECT path, n FROM c
  QUALIFY ROW_NUMBER() OVER (ORDER BY n DESC, path) <= 5
)
SELECT path, n FROM topk
UNION ALL
SELECT '__total_distinct__', CAST(COUNT(*) AS BIGINT) FROM c
"""


# =====================================================================
# lagged cross-correlation (clicks lead purchases?)
# =====================================================================

def q_cross_correlation(sf_dir: str, max_lag: int = 3):
    """Cross-correlation between daily CLICK and PURCHASE counts at
    lags −3…+3 — does click volume lead purchase volume (positive-lag
    peak) or trail it? The acf_lags machinery generalized to two
    series: one <= #days exchange of exact (day, clicks, purchases)
    int partials; each lag's Pearson r uses exact integer moments
    over day pairs BOTH PRESENT (the gap rule both sides), ONE
    identical IEEE expression per lag, 6 dp."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array(["click", "purchase"]))
        t = b.filter(keep)
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // DAY_US)
        is_c = (np.asarray(t["event_type"], dtype=object)
                == "click").astype(np.int64)
        ud, inv = np.unique(day, return_inverse=True)
        clicks = np.zeros(len(ud), np.int64)
        purch = np.zeros(len(ud), np.int64)
        np.add.at(clicks, inv, is_c)
        np.add.at(purch, inv, 1 - is_c)
        return pa.table({"day": pa.array(ud.astype(np.int64)),
                         "clicks": pa.array(clicks),
                         "purchases": pa.array(purch)})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("day")
           .aggregate(Sum("clicks", alias_name="clicks"),
                      Sum("purchases", alias_name="purchases")))
    df = agg.to_pandas().sort_values("day", ignore_index=True)
    day = df["day"].to_numpy(np.int64)
    x = df["clicks"].to_numpy(np.int64).astype(object)
    y = df["purchases"].to_numpy(np.int64).astype(object)
    pos = {int(d): i for i, d in enumerate(day)}
    rows = {"lag": [], "n_pairs": [], "r": []}
    for lag in range(-max_lag, max_lag + 1):
        src = np.array([pos.get(int(d) + lag, -1) for d in day])
        hit = src >= 0
        a, b_ = x[hit], y[src[hit]]
        n = int(len(a))
        rows["lag"].append(lag)
        rows["n_pairs"].append(n)
        if n < 2:
            rows["r"].append(None)
            continue
        sx, sy = int(a.sum()), int(b_.sum())
        sxx, syy = int((a * a).sum()), int((b_ * b_).sum())
        sxy = int((a * b_).sum())
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx <= 0 or vy <= 0:
            rows["r"].append(None)
            continue
        rows["r"].append(np.round(
            float(n * sxy - sx * sy) / math.sqrt(float(vx) * float(vy)),
            6))
    return pa.table({"lag": pa.array(rows["lag"], pa.int64()),
                     "n_pairs": pa.array(rows["n_pairs"], pa.int64()),
                     "r": pa.array(rows["r"], pa.float64())})


SQL_CROSS_CORRELATION = """
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         AS BIGINT) AS x,
    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS y
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
), lags AS (
  SELECT unnest(generate_series(-3, 3)) AS lag
), m AS (
  SELECT l.lag, CAST(COUNT(*) AS HUGEINT) AS n,
    CAST(SUM(a.x) AS HUGEINT) AS sx, CAST(SUM(b.y) AS HUGEINT) AS sy,
    CAST(SUM(a.x * a.x) AS HUGEINT) AS sxx,
    CAST(SUM(b.y * b.y) AS HUGEINT) AS syy,
    CAST(SUM(a.x * b.y) AS HUGEINT) AS sxy
  FROM lags l
  JOIN d a ON TRUE
  JOIN d b ON b.day = a.day + l.lag
  GROUP BY 1
)
SELECT CAST(lags.lag AS BIGINT) AS lag,
  CAST(COALESCE(m.n, 0) AS BIGINT) AS n_pairs,
  CASE WHEN m.n >= 2 AND m.n * m.sxx - m.sx * m.sx > 0
            AND m.n * m.syy - m.sy * m.sy > 0
       THEN ROUND(CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                  / SQRT(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)
                         * CAST(m.n * m.syy - m.sy * m.sy AS DOUBLE)), 6)
  END AS r
FROM lags LEFT JOIN m USING (lag)
"""


# =====================================================================
# keyness: distinctive tokens per language (smoothed log-odds)
# =====================================================================

def q_keyness(sf_dir: str, k: int = 10):
    """Top-10 DISTINCTIVE tokens per language by Laplace-smoothed
    log-odds versus the rest of the corpus — the keyness readout
    (corpus linguistics' answer to 'what is this slice about') that
    tfidf_topterms can't give because idf ignores the contrast group.
    One token groupby of (token, lang, c) block combiners; per-token
    rows co-locate, so each lang's in/out counts emit together;
    keyness = ln((c_in+1)/(n_in−c_in+1)) − ln((c_out+1)/(n_out−c_out
    +1)) — exact integer ratios inside both ln; per-lang partial
    top-10 by (keyness DESC, token) — rank on the ROUNDED 6-dp value
    both sides so the cut is deterministic."""
    from .dataops import _docs
    from .sizing import fold_parts
    from crawlray.functions.murmur3 import hash64_batch_i64

    n_parts = fold_parts()
    ds = _docs(sf_dir, ["lang", "text"])

    def counts(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(b["text"].combine_chunks())
        lists = pc.split_pattern_regex(low, "[^a-z]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        lang = pc.take(b["lang"].combine_chunks(), parent)
        t = pa.table({"token": flat, "lang": lang})
        t = t.filter(pc.not_equal(t["token"], pa.scalar("")))
        g = t.group_by(["token", "lang"]).aggregate([([], "count_all")])
        g = g.rename_columns(["token", "lang", "c"])
        h = np.asarray(hash64_batch_i64(g["token"].combine_chunks()))
        kp = (_splitmix64(h).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return g.append_column("kp", pa.array(kp))

    partials = ds.map_batches(counts, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    # per-lang totals: a <= |langs| fold off the SAME partials
    lt = (partials.groupby("lang").aggregate(Sum("c", alias_name="n"))
          .take_all())
    n_lang = {r["lang"]: int(r["n"]) for r in lt}
    n_all = sum(n_lang.values())
    tot_ref = ray.put(n_lang)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _r

        totals = _r.get(tot_ref)
        nall = sum(totals.values())
        tok, tinv = np.unique(g["token"].to_numpy(), return_inverse=True)
        lang = g["lang"].to_numpy()
        c = g["c"].to_numpy(np.int64)
        langs = sorted(totals)
        lidx = {lg: i for i, lg in enumerate(langs)}
        linv = np.array([lidx[lg] for lg in lang], np.int64)
        cin = np.zeros((len(tok), len(langs)), np.int64)
        np.add.at(cin, (tinv, linv), c)
        ctot = cin.sum(axis=1)
        out = {"lang": [], "token": [], "keyness": []}
        for li, lg in enumerate(langs):
            n_in = totals[lg]
            n_out = nall - n_in
            ci = cin[:, li]
            co = ctot - ci
            key = (np.log((ci + 1).astype(np.float64)
                          / (n_in - ci + 1).astype(np.float64))
                   - np.log((co + 1).astype(np.float64)
                            / (n_out - co + 1).astype(np.float64)))
            key = np.round(key, 6)
            ordr = np.lexsort((tok, -key))[:k]   # partial top-k
            out["lang"].extend([lg] * len(ordr))
            out["token"].extend(tok[ordr])
            out["keyness"].extend(key[ordr])
        return pd.DataFrame(out)

    rows = [tuple(r) for b in
            (partials.groupby("kp").map_groups(fold,
                                               batch_format="pandas"))
            .iter_batches(batch_format="pyarrow")
            for r in zip(b["lang"].to_pylist(), b["token"].to_pylist(),
                         b["keyness"].to_pylist())]
    rows.sort(key=lambda r: (r[0], -r[2], r[1]))
    out = {"lang": [], "token": [], "keyness": []}
    seen: dict[str, int] = {}
    for lg, tok, key in rows:
        if seen.get(lg, 0) >= k:
            continue
        seen[lg] = seen.get(lg, 0) + 1
        out["lang"].append(lg)
        out["token"].append(tok)
        out["keyness"].append(key)
    return pa.table({
        "lang": pa.array(out["lang"], pa.string()),
        "token": pa.array(out["token"], pa.string()),
        "keyness": pa.array(out["keyness"], pa.float64())})


SQL_KEYNESS = """
WITH tk AS (
  SELECT lang, token FROM (
    SELECT lang,
           unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
    FROM documents)
  WHERE token <> ''
), lc AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM tk GROUP BY 1, 2
), lt AS (
  SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM lc GROUP BY 1
), tt AS (
  SELECT token, CAST(SUM(c) AS BIGINT) AS ct FROM lc GROUP BY 1
), alln AS (SELECT CAST(SUM(n) AS BIGINT) AS nall FROM lt),
grid AS (
  SELECT lt.lang, tt.token, lt.n AS n_in, alln.nall - lt.n AS n_out,
         COALESCE(lc.c, 0) AS ci, tt.ct - COALESCE(lc.c, 0) AS co
  FROM lt CROSS JOIN tt CROSS JOIN alln
  LEFT JOIN lc ON lc.lang = lt.lang AND lc.token = tt.token
), s AS (
  SELECT lang, token,
    ROUND(LN(CAST(ci + 1 AS DOUBLE) / CAST(n_in - ci + 1 AS DOUBLE))
          - LN(CAST(co + 1 AS DOUBLE) / CAST(n_out - co + 1 AS DOUBLE)),
          6) AS keyness
  FROM grid
)
SELECT lang, token, keyness FROM s
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
                           ORDER BY keyness DESC, token) <= 10
"""


# =====================================================================
# brand breadth histogram (basket diversity)
# =====================================================================

def q_brand_breadth(sf_dir: str):
    """How many customers buy from exactly k distinct BRANDS —
    engagement_breadth's basket twin (loyalty vs promiscuity in one
    histogram). Brand rides the broadcast part LUT; block combiners
    emit distinct (customer, brand-code) pairs; ONE custkey-hash
    exchange makes the per-customer nunique partition-local;
    <= |brands| histogram partials."""
    import pyarrow.parquet as pq

    from .sizing import fold_parts

    n_parts = fold_parts()
    pt = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_brand"])
    pk = np.asarray(pt["p_partkey"], dtype=np.int64)
    _brands, bcode = np.unique(np.asarray(pt["p_brand"], dtype=object),
                               return_inverse=True)
    lut = np.zeros(int(pk.max()) + 1, np.int64)
    lut[pk] = bcode
    lut_ref = ray.put(lut)

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def prep_o(b: pa.Table) -> pa.Table:
        kk = b["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        kp = (_splitmix64(kk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"okey": b["o_orderkey"], "val": b["o_custkey"],
                         "side": pa.array(np.zeros(b.num_rows, np.int64)),
                         "kp": pa.array(kp)})

    def prep_l(b: pa.Table) -> pa.Table:
        import ray as _r

        code_lut = _r.get(lut_ref)
        p = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        kk = b["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        kp = (_splitmix64(kk).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"okey": b["l_orderkey"],
                         "val": pa.array(code_lut[p]),
                         "side": pa.array(np.ones(b.num_rows, np.int64)),
                         "kp": pa.array(kp)})

    tagged = orders.map_batches(prep_o, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .union(li.map_batches(prep_l, batch_format="pyarrow",
                              zero_copy_batch=True))

    def to_pairs(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l_ = g[g["side"] == 1]
        o2c = dict(zip(o["okey"].to_numpy(np.int64),
                       o["val"].to_numpy(np.int64)))
        lk = l_["okey"].to_numpy(np.int64)
        code = l_["val"].to_numpy(np.int64)
        ck = np.fromiter((o2c[k_] for k_ in lk), np.int64, len(lk))
        pairs = np.unique(np.stack([ck, code], axis=1), axis=0)
        return pd.DataFrame({"ck": pairs[:, 0], "code": pairs[:, 1]})

    pairs = tagged.groupby("kp").map_groups(to_pairs,
                                            batch_format="pandas")

    def prep2(b: pa.Table) -> pa.Table:
        ck = b["ck"].to_numpy(zero_copy_only=False)
        kp = (_splitmix64(ck).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return b.append_column("kp2", pa.array(kp))

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        df_ = g.drop_duplicates(["ck", "code"])
        breadth = df_.groupby("ck", sort=False)["code"].nunique()
        kk, n = np.unique(breadth.to_numpy(np.int64), return_counts=True)
        return pd.DataFrame({"breadth": kk.astype(np.int64),
                             "n_customers": n.astype(np.int64)})

    return (pairs.map_batches(prep2, batch_format="pyarrow")
            .groupby("kp2").map_groups(hist, batch_format="pandas")
            .groupby("breadth")
            .aggregate(Sum("n_customers", alias_name="n_customers")))


SQL_BRAND_BREADTH = """
WITH cb AS (
  SELECT DISTINCT o.o_custkey AS ck, p.p_brand AS brand
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
), b AS (
  SELECT ck, CAST(COUNT(*) AS BIGINT) AS breadth FROM cb GROUP BY 1
)
SELECT breadth, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM b GROUP BY 1
"""


# =====================================================================
# dataset card (one-row corpus summary)
# =====================================================================

def q_dataset_card(sf_dir: str):
    """The DATASET CARD row: document count, total tokens, vocabulary
    size, language count, exact-duplicate docs, and mean length — the
    six numbers every corpus release prints first, all exact, in
    three bounded passes (block combiners for counts, word_freq's
    token groupby for the vocabulary, dup_ratio's md5 exchange for
    duplicates). One row out; mean is the only division, 6 dp."""
    import hashlib

    from .dataops import _docs
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _docs(sf_dir, ["lang", "text", "n_chars"])

    def basic(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(b["text"].combine_chunks())
        ntok = pc.sum(pc.count_substring_regex(low, "[a-z]+")).as_py() or 0
        return pa.table({
            "n_docs": pa.array([b.num_rows], pa.int64()),
            "n_tokens": pa.array([int(ntok)], pa.int64()),
            "n_chars": pa.array([int(pc.sum(b["n_chars"]).as_py() or 0)],
                                pa.int64()),
        })

    agg = ds.map_batches(basic, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_tokens", alias_name="n_tokens"),
                   Sum("n_chars", alias_name="n_chars"))
    n_docs = int(agg["n_docs"])
    n_tokens = int(agg["n_tokens"])
    n_chars = int(agg["n_chars"])

    def toks(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(b["text"].combine_chunks())
        flat = pc.list_flatten(pc.split_pattern_regex(low, "[^a-z]+"))
        flat = pc.unique(flat.filter(pc.not_equal(flat, pa.scalar(""))))
        return pa.table({"token": flat})

    vocab = ds.map_batches(toks, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("token").count().count()

    langs = ds.map_batches(
        lambda b: pa.table({"lang": pc.unique(b["lang"].combine_chunks())}),
        batch_format="pyarrow").groupby("lang").count().count()

    def hashes(b: pa.Table) -> pa.Table:
        texts = [(t if t is not None else "")
                 for t in b["text"].to_pylist()]
        ut, inv = np.unique(np.array(texts, dtype=object),
                            return_inverse=True)
        uh = np.fromiter(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
             for t in ut), dtype=np.int64, count=len(ut))
        h = uh[inv]
        from .analytics import _splitmix64 as _sm

        kp = (_sm(h).view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"h": pa.array(h), "kp": pa.array(kp)})

    def dup_fold(g: pd.DataFrame) -> pd.DataFrame:
        _, counts = np.unique(g["h"].to_numpy(np.int64),
                              return_counts=True)
        return pd.DataFrame({
            "dups": [int(counts[counts > 1].sum())]})

    dup_docs = int(ds.map_batches(hashes, batch_format="pyarrow",
                                  zero_copy_batch=True)
                   .groupby("kp").map_groups(dup_fold,
                                             batch_format="pandas")
                   .aggregate(Sum("dups", alias_name="dups"))["dups"])

    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_tokens": pa.array([n_tokens], pa.int64()),
        "vocab_size": pa.array([int(vocab)], pa.int64()),
        "n_langs": pa.array([int(langs)], pa.int64()),
        "dup_docs": pa.array([dup_docs], pa.int64()),
        "mean_chars": pa.array([np.round(
            float(n_chars) / float(n_docs), 6)], pa.float64())})


SQL_DATASET_CARD = """
WITH tok AS (
  SELECT token FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
    FROM documents)
  WHERE token <> ''
), h AS (
  SELECT CAST(CONCAT('0x', SUBSTR(md5(COALESCE(text, '')), 1, 8))
              AS BIGINT) AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM tok) AS n_tokens,
  (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) FROM tok) AS vocab_size,
  (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents)
    AS n_langs,
  (SELECT CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) FROM h)
    AS dup_docs,
  (SELECT ROUND(CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                6) FROM documents) AS mean_chars
"""


# =====================================================================
# effective sample size of the temperature mix
# =====================================================================

def q_mix_ess(sf_dir: str):
    """Effective sample size of the α=0.5 temperature-scaled source
    mix: ESS = (Σ√c)² / Σc — the diagnostic that says how many
    'effective sources' the sampler really draws from (ESS ==
    |sources| iff perfectly balanced). The per-source counts fold to
    <= |sources| exact ints; √c is correctly rounded on both sides and
    the two sums are ordered by source; two divisions, 6 dp."""
    from .dataops import _docs

    ds = _docs(sf_dir, ["source"])

    def prep(b: pa.Table) -> pa.Table:
        g = b.group_by("source").aggregate([([], "count_all")])
        return g.rename_columns(["source", "c"])

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("c", alias_name="c")))
    df = agg.to_pandas().sort_values("source", ignore_index=True)
    c = [int(v) for v in df["c"]]
    s_sqrt = 0.0
    for v in c:                                  # source-ascending order
        s_sqrt += math.sqrt(float(v))
    s = sum(c)
    ess = (s_sqrt * s_sqrt) / float(s)
    return pa.table({
        "n_sources": pa.array([len(c)], pa.int64()),
        "n_docs": pa.array([s], pa.int64()),
        "ess": pa.array([np.round(ess, 6)], pa.float64()),
        "balance": pa.array([np.round(ess / float(len(c)), 6)],
                            pa.float64())})


SQL_MIX_ESS = """
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
         CAST(SUM(c) AS BIGINT) AS n_docs,
         SUM(SQRT(CAST(c AS DOUBLE)) ORDER BY source) AS sq
  FROM c
)
SELECT n_sources, n_docs,
       ROUND(sq * sq / CAST(n_docs AS DOUBLE), 6) AS ess,
       ROUND((sq * sq / CAST(n_docs AS DOUBLE))
             / CAST(n_sources AS DOUBLE), 6) AS balance
FROM s
"""


# =====================================================================
# retrieval MRR / recall@10 (embedding neighbor ranking quality)
# =====================================================================

def q_retrieval_mrr(sf_dir: str, recall_k: int = 10):
    """Mean reciprocal rank and recall@10 of SAME-LABEL retrieval over
    the bounded candidate set (vec_id < 512, self excluded), macro-
    averaged per label — the retrieval-eval pair that completes
    ndcg/roc_auc for the embedding column (how soon does a probe's
    class appear in its neighbor list?). knn_join's broadcast shape:
    one matmul per probe block; ranks order by (ROUNDED 6-dp cosine
    DESC, vec_id) so the rank — and therefore every metric — is
    integer-deterministic; reciprocal ranks quantize to micro-units
    (half-away) so the per-label mean is an exact integer fold.
    Probes with no same-label candidate drop on both sides."""
    import pyarrow.parquet as pq

    from .dataops import _embedding_matrix

    path = os.path.join(sf_dir, "embeddings.parquet")
    cap = 512
    t = pq.read_table(path, columns=["vec_id", "embedding", "label"],
                      filters=[("vec_id", "<", cap)])
    cids = np.asarray(t["vec_id"], dtype=np.int64)
    clab = np.asarray(t["label"], dtype=np.int64)
    cmat = _embedding_matrix(t["embedding"])
    cn = np.linalg.norm(cmat, axis=1)
    cand_ref = ray.put((cids, clab,
                        cmat / np.where(cn == 0, 1.0, cn)[:, None]))

    ds = rd.read_parquet(path, columns=["vec_id", "embedding", "label"])

    def rank(b: pa.Table) -> pa.Table:
        import ray as _r

        ids, labs, matn = _r.get(cand_ref)
        vid = b["vec_id"].to_numpy(zero_copy_only=False)
        lab = b["label"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        emb = _embedding_matrix(b["embedding"])
        n = np.linalg.norm(emb, axis=1)
        embn = emb / np.where(n == 0, 1.0, n)[:, None]
        cos = np.round(embn @ matn.T, 6)
        out_lab, out_qrr, out_hit = [], [], []
        for i in range(len(vid)):
            keep = ids != vid[i]
            order = np.lexsort((ids[keep], -cos[i][keep]))
            same = labs[keep][order] == lab[i]
            hits = np.nonzero(same)[0]
            if len(hits) == 0:
                continue
            r = int(hits[0]) + 1
            y = 1e6 / r
            out_lab.append(int(lab[i]))
            out_qrr.append(int(np.floor(y + 0.5)))
            out_hit.append(1 if r <= recall_k else 0)
        ul = np.unique(np.array(out_lab, np.int64)) if out_lab else \
            np.array([], np.int64)
        qrr = np.array(out_qrr, np.int64)
        hit = np.array(out_hit, np.int64)
        larr = np.array(out_lab, np.int64)
        s = np.zeros(len(ul), np.int64)
        h = np.zeros(len(ul), np.int64)
        c = np.zeros(len(ul), np.int64)
        pos = np.searchsorted(ul, larr)
        np.add.at(s, pos, qrr)
        np.add.at(h, pos, hit)
        np.add.at(c, pos, 1)
        return pa.table({"label": pa.array(ul), "qrr": pa.array(s),
                         "hits": pa.array(h), "n": pa.array(c)})

    agg = (ds.map_batches(rank, batch_format="pyarrow")
           .groupby("label")
           .aggregate(Sum("qrr", alias_name="qrr"),
                      Sum("hits", alias_name="hits"),
                      Sum("n", alias_name="n")))
    df = agg.to_pandas().sort_values("label", ignore_index=True)
    qrr = df["qrr"].to_numpy(np.int64)
    hits = df["hits"].to_numpy(np.int64)
    n = df["n"].to_numpy(np.int64)
    y = (qrr.astype(np.float64) / n.astype(np.float64))
    m6 = np.where(y >= 0, np.floor(y + 0.5), -np.floor(-y + 0.5)) / 1e6
    return pa.table({
        "label": pa.array(df["label"].to_numpy(np.int64)),
        "n_probes": pa.array(n),
        "mrr": pa.array(m6, pa.float64()),
        "recall_at_10": pa.array(np.round(
            hits.astype(np.float64) / n.astype(np.float64), 6),
            pa.float64())})


SQL_RETRIEVAL_MRR = """
WITH pairs AS (
  SELECT a.vec_id, CAST(a.label AS BIGINT) AS label,
    CAST(b.label AS BIGINT) AS blabel,
    ROW_NUMBER() OVER (
      PARTITION BY a.vec_id
      ORDER BY ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 6)
               DESC, b.vec_id) AS rnk
  FROM embeddings a
  JOIN embeddings b ON b.vec_id < 512 AND b.vec_id <> a.vec_id
), firsts AS (
  SELECT vec_id, label, MIN(rnk) AS r
  FROM pairs WHERE blabel = label GROUP BY 1, 2
), q AS (
  SELECT label, CAST(ROUND(1000000.0 / r) AS BIGINT) AS qrr,
         CASE WHEN r <= 10 THEN 1 ELSE 0 END AS hit
  FROM firsts
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_probes,
  ROUND(CAST(SUM(qrr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 1000000.0
    AS mrr,
  ROUND(CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
    AS recall_at_10
FROM q GROUP BY 1
"""


# =====================================================================
# personalized PageRank (fifth iterative family)
# =====================================================================

def q_ppr(sf_dir: str, alpha: float = 0.15, iters: int = 20, k: int = 20):
    """PERSONALIZED PageRank from the smallest supplier node of the
    co-supply graph (α = 0.15 restart, 20 fixed iterations) — the
    seed-relative relevance ranking behind 'related suppliers' /
    'similar hosts', and the fifth iterative family next to global
    pagerank, connected components, k-core, and logreg. Scale shape:
    the distributed edge derivation from triangle_count; the
    DIMENSION-sized graph iterates as dense BLAS on the driver with
    the same documented node-iterator swap at web-scale node counts.
    Deterministic: fixed iteration count, float64, one (score, node)
    sort at the end; rows-only (iterative float scores have no SQL
    equivalent) — pinned against an independent recomputation plus
    mass-conservation invariants in tests."""
    import pyarrow.dataset as pads

    from .analytics import _sized_read

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
    chunks = [np.stack([b["u"].to_numpy(zero_copy_only=False),
                        b["v"].to_numpy(zero_copy_only=False)], axis=1)
              for b in co.iter_batches(batch_size=65536,
                                       batch_format="pyarrow")]
    uv = np.unique(np.concatenate(chunks).astype(np.int64), axis=0)
    nodes = np.unique(uv)
    idx = np.searchsorted(nodes, uv)
    n = len(nodes)
    a = np.zeros((n, n), np.float64)
    a[idx[:, 0], idx[:, 1]] = 1.0
    a[idx[:, 1], idx[:, 0]] = 1.0
    deg = a.sum(axis=1)
    w = a / deg[:, None]                        # row-stochastic
    r = np.zeros(n, np.float64)
    seed = 0                                    # smallest node id
    r[seed] = 1.0
    e = np.zeros(n, np.float64)
    e[seed] = 1.0
    for _ in range(iters):
        r = alpha * e + (1.0 - alpha) * (r @ w)
    order = np.lexsort((nodes, -np.round(r, 6)))[:k]
    return pa.table({
        "node": pa.array(nodes[order]),
        "score": pa.array(np.round(r[order], 6), pa.float64())})


# =====================================================================
# deterministic weighted sampling (Efraimidis–Spirakis, hash uniforms)
# =====================================================================

def q_weighted_sample(sf_dir: str, k: int = 20):
    """Weighted sample WITHOUT replacement of 20 documents with
    probability ∝ n_chars, fully DETERMINISTIC: Efraimidis–Spirakis
    (2006) keys ln(u)/w with the uniform u derived from md5(doc_id) —
    the reproducible weighted sampler a data pipeline needs where
    random.random() would break resume/audit (hash_sample's weighted
    sibling). u = (md5_32 + 1)/(2^32 + 1) is an exact rational on both
    sides; the key is ONE identical ln-and-divide expression; per-block
    partial top-k by (key DESC, doc_id) merges on the driver — no
    global sort. Zero-weight docs are excluded (they cannot be
    sampled)."""
    import hashlib

    ds = _t(sf_dir, "documents", ["doc_id", "n_chars"])

    def keys(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = w > 0
        did, w = did[keep], w[keep]
        h = np.fromiter(
            (int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16)
             for d in did), dtype=np.int64, count=len(did))
        u = (h.astype(np.float64) + 1.0) / 4294967297.0
        key = np.log(u) / w.astype(np.float64)
        order = np.lexsort((did, -key))[:k]
        return pa.table({
            "doc_id": pa.array(did[order]),
            "n_chars": pa.array(w[order]),
            "key": pa.array(key[order], pa.float64()),
        })

    rows = [r for b in ds.map_batches(keys, batch_format="pyarrow",
                                      zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow")
            for r in zip(b["doc_id"].to_pylist(),
                         b["n_chars"].to_pylist(),
                         b["key"].to_pylist())]
    rows.sort(key=lambda r: (-r[2], r[0]))
    top = rows[:k]
    return pa.table({
        "doc_id": pa.array([r[0] for r in top], pa.int64()),
        "n_chars": pa.array([r[1] for r in top], pa.int64()),
        "key": pa.array([np.round(r[2], 6) for r in top], pa.float64())})


SQL_WEIGHTED_SAMPLE = """
WITH d AS (
  SELECT doc_id, n_chars,
    LN((CAST(CAST(CONCAT('0x',
          SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          AS DOUBLE) + 1.0) / 4294967297.0)
      / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars, ROUND(key, 6) AS key
FROM d
QUALIFY ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) <= 20
"""


# =====================================================================
# CVaR / expected shortfall of daily revenue
# =====================================================================

def q_cvar(sf_dir: str, q: float = 0.05):
    """Value-at-Risk and CONDITIONAL VaR (expected shortfall) of daily
    revenue at the 5% level: the cutoff below which the worst 5% of
    days fall, and the mean of those days — the tail-risk pair that
    says how bad a bad day actually is (max_drawdown's distributional
    sibling). The worst-k multiset is rank-deterministic (k =
    ⌊0.05·n⌋, ties share values); sums are exact int64 cents on the
    bounded day fold; one division, 6 dp."""
    df = _day_rev_fold(sf_dir)
    rev = np.sort(df["rev"].to_numpy(np.int64))
    n = len(rev)
    k = int(np.floor(q * n))
    if k == 0:
        k = 1
    tail = rev[:k]
    var = int(rev[k - 1])
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "k_tail": pa.array([k], pa.int64()),
        "var_cents": pa.array([var], pa.int64()),
        "cvar_cents": pa.array([np.round(
            float(int(tail.sum())) / float(k), 6)], pa.float64())})


SQL_CVAR = """
WITH d AS (
  SELECT SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY epoch_us(o_orderdate) // 86400000000
), r AS (
  SELECT rev, ROW_NUMBER() OVER (ORDER BY rev) AS rn,
         COUNT(*) OVER () AS n
  FROM d
), kk AS (
  SELECT GREATEST(CAST(FLOOR(0.05 * n) AS BIGINT), 1) AS k,
         CAST(n AS BIGINT) AS n
  FROM r LIMIT 1
)
SELECT kk.n AS n_days, kk.k AS k_tail,
  (SELECT CAST(rev AS BIGINT) FROM r WHERE rn = kk.k) AS var_cents,
  (SELECT ROUND(CAST(SUM(rev) AS DOUBLE) / CAST(kk.k AS DOUBLE), 6)
   FROM r WHERE rn <= kk.k) AS cvar_cents
FROM kk
"""


# =====================================================================
# best 7-day revenue window
# =====================================================================

def q_best_week(sf_dir: str):
    """The single best trailing-7-calendar-day revenue window and its
    end day — peak_days finds local spikes; this finds THE peak run
    (promo post-mortems and capacity planning both start here).
    Gap-aware RANGE semantics via prefix sums + searchsorted on the
    bounded day fold; window sums are exact int64, so the argmax — and
    its min-day tie-break — is integer-deterministic."""
    df = _day_rev_fold(sf_dir)
    day = df["day"].to_numpy(np.int64)
    rev = df["rev"].to_numpy(np.int64)
    cs = np.concatenate(([0], np.cumsum(rev)))
    lo = np.searchsorted(day, day - 6, side="left")
    wsum = cs[np.arange(1, len(day) + 1)] - cs[lo]
    best = int(wsum.max())
    end_day = int(day[np.nonzero(wsum == best)[0][0]])  # min end day
    return pa.table({
        "end_day": pa.array([end_day], pa.int64()),
        "window_cents": pa.array([best], pa.int64())})


SQL_BEST_WEEK = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), w AS (
  SELECT day,
    CAST(SUM(rev) OVER (ORDER BY day
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
         AS BIGINT) AS wsum
  FROM d
)
SELECT CAST(day AS BIGINT) AS end_day, wsum AS window_cents
FROM w
QUALIFY ROW_NUMBER() OVER (ORDER BY wsum DESC, day) <= 1
"""


# =====================================================================
# per-user feature matrix (ML feature assembly)
# =====================================================================

def q_feature_matrix(sf_dir: str):
    """The churn-model FEATURE MATRIX: one row per user with recency
    (days since last event vs the global horizon), frequency (events),
    monetary (purchase cents), breadth (distinct event types), and
    error rate — the feature-engineering join every tabular-ML
    pipeline runs before training (logreg_train's input stage made
    explicit). ONE user-hash exchange; every feature is partition-
    local and vectorized (sorted-run reductions, no per-user loop);
    exact ints everywhere, error_rate's single division at 6 dp."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        is_p = pc.equal(b["event_type"], pa.scalar("purchase"))
        cents = _cents(b["value"])
        return pa.table({
            "user_id": b["user_id"], "ts_us": b["ts"].cast(pa.int64()),
            "event_type": b["event_type"],
            "pc": pc.if_else(is_p, cents, pa.scalar(0, pa.int64())),
            "kp": pa.array(kp),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    horizon_day = int(prepped.aggregate(Max("ts_us"))["max(ts_us)"]) \
        // DAY_US

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        cents = g["pc"].to_numpy(np.int64)
        order = np.argsort(uid, kind="mergesort")
        uid, ts, et, cents = uid[order], ts[order], et[order], cents[order]
        users, idx, counts = np.unique(uid, return_index=True,
                                       return_counts=True)
        last_ts = np.maximum.reduceat(ts, idx)
        monetary = np.add.reduceat(cents, idx)
        is_err = (et == "error").astype(np.int64)
        errors = np.add.reduceat(is_err, idx)
        _t2, tcode = np.unique(et, return_inverse=True)
        pair = uid * np.int64(len(_t2)) + tcode
        breadth = np.bincount(
            np.searchsorted(users, np.unique(pair) // len(_t2))
        ).astype(np.int64)
        return pd.DataFrame({
            "user_id": users,
            "recency_days": (horizon_day - last_ts // DAY_US)
            .astype(np.int64),
            "frequency": counts.astype(np.int64),
            "monetary_cents": monetary.astype(np.int64),
            "breadth": breadth,
            "error_rate": np.round(
                errors.astype(np.float64) / counts.astype(np.float64), 6),
        })

    return (prepped.groupby("kp").map_groups(fold, batch_format="pandas")
            .select_columns(["user_id", "recency_days", "frequency",
                             "monetary_cents", "breadth", "error_rate"]))


SQL_FEATURE_MATRIX = """
WITH h AS (SELECT MAX(epoch_us(ts)) // 86400000000 AS horizon
           FROM events)
SELECT user_id,
  CAST(h.horizon - MAX(epoch_us(ts)) // 86400000000 AS BIGINT)
    AS recency_days,
  CAST(COUNT(*) AS BIGINT) AS frequency,
  CAST(SUM(CASE WHEN event_type = 'purchase'
           THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS monetary_cents,
  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS breadth,
  ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS error_rate
FROM events, h
GROUP BY user_id, h.horizon
"""


# =====================================================================
# referential-integrity audit (orphan foreign keys)
# =====================================================================

def q_ri_audit(sf_dir: str):
    """Referential-integrity audit of the fact table: how many
    lineitem rows carry a partkey, suppkey, or orderkey that does NOT
    exist in its dimension — the three orphan counts a warehouse load
    check gates on (dq_checks' cross-TABLE sibling). Dimension key
    sets broadcast ONCE as sorted arrays (ray.put; part/supplier are
    dimension-sized, orders keys are the largest at fact/4 — the
    documented broadcast bound); each block answers all three audits
    with vectorized searchsorted membership — zero shuffle, <= 1-row
    partials."""
    import pyarrow.parquet as pq

    pk = np.sort(np.asarray(pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey"])["p_partkey"], dtype=np.int64))
    sk = np.sort(np.asarray(pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey"])["s_suppkey"], dtype=np.int64))
    ok = np.sort(np.asarray(pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey"])["o_orderkey"], dtype=np.int64))
    keys_ref = ray.put((pk, sk, ok))

    ds = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_orderkey"])

    def member(sorted_keys: np.ndarray, v: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(sorted_keys, v)
        hit = pos < len(sorted_keys)
        out = np.zeros(len(v), bool)
        out[hit] = sorted_keys[pos[hit]] == v[hit]
        return out

    def audit(b: pa.Table) -> pa.Table:
        import ray as _r

        pk_, sk_, ok_ = _r.get(keys_ref)
        p = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n_rows": pa.array([b.num_rows], pa.int64()),
            "orphan_part": pa.array([int((~member(pk_, p)).sum())],
                                    pa.int64()),
            "orphan_supp": pa.array([int((~member(sk_, s)).sum())],
                                    pa.int64()),
            "orphan_order": pa.array([int((~member(ok_, o)).sum())],
                                     pa.int64()),
        })

    agg = ds.map_batches(audit, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .aggregate(Sum("n_rows", alias_name="n_rows"),
                   Sum("orphan_part", alias_name="orphan_part"),
                   Sum("orphan_supp", alias_name="orphan_supp"),
                   Sum("orphan_order", alias_name="orphan_order"))
    return pa.table({
        "n_rows": pa.array([int(agg["n_rows"])], pa.int64()),
        "orphan_part": pa.array([int(agg["orphan_part"])], pa.int64()),
        "orphan_supp": pa.array([int(agg["orphan_supp"])], pa.int64()),
        "orphan_order": pa.array([int(agg["orphan_order"])], pa.int64())})


SQL_RI_AUDIT = """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
   WHERE l_partkey NOT IN (SELECT p_partkey FROM part)) AS orphan_part,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
   WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
    AS orphan_supp,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
    AS orphan_order
"""


# =====================================================================
# prefix-collision rate per source (C4-style prefix dedup signal)
# =====================================================================

def q_prefix_collision(sf_dir: str, n_tokens: int = 16):
    """Share of each source's documents whose FIRST-16-TOKEN prefix is
    shared by at least one other document corpus-wide — the template/
    boilerplate signal C4-style cleaning keys on (exact dedup misses
    docs that diverge after a shared opening). Prefix = first 16
    [a-z]+ tokens of the lowercased text joined by single spaces,
    IDENTICAL RE2 both sides; then exactly dup_ratio_by_source's
    one-md5-exchange plan on the prefix string."""
    import hashlib

    from .analytics import _splitmix64 as _sm
    from .dataops import _docs
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _docs(sf_dir, ["source", "text"])

    def prep(b: pa.Table) -> pa.Table:
        import re

        split = re.compile("[^a-z]+")
        prefixes = []
        for t in b["text"].to_pylist():
            w = [x for x in split.split((t or "").lower()) if x]
            prefixes.append(" ".join(w[:n_tokens]))
        ut, inv = np.unique(np.array(prefixes, dtype=object),
                            return_inverse=True)
        uh = np.fromiter(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
             for t in ut), dtype=np.int64, count=len(ut))
        h = uh[inv]
        kp = (_sm(h).view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"h": pa.array(h), "source": b["source"],
                         "kp": pa.array(kp)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("h", sort=False)["source"].transform("size")
        dup = (cnt > 1).astype(np.int64)
        out = pd.DataFrame({"source": g["source"].to_numpy(),
                            "n_dup": dup.to_numpy(), "n_docs": 1})
        agg = out.groupby("source", sort=False).sum().reset_index()
        return agg.astype({"n_dup": np.int64, "n_docs": np.int64})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .groupby("source")
           .aggregate(Sum("n_dup", alias_name="n_dup"),
                      Sum("n_docs", alias_name="n_docs")))
    df = agg.to_pandas().sort_values("source", ignore_index=True)
    nd = df["n_dup"].to_numpy(np.int64)
    nn = df["n_docs"].to_numpy(np.int64)
    return pa.table({
        "source": pa.array(df["source"], pa.string()),
        "n_dup": pa.array(nd), "n_docs": pa.array(nn),
        "collision_rate": pa.array(np.round(
            nd.astype(np.float64) / nn.astype(np.float64), 6),
            pa.float64())})


SQL_PREFIX_COLLISION = """
WITH p AS (
  SELECT source,
    array_to_string(
      list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                                        '[^a-z]+'),
                  x -> x <> '')[1:16], ' ') AS prefix
  FROM documents
), h AS (
  SELECT source,
         COUNT(*) OVER (
           PARTITION BY CAST(CONCAT('0x', SUBSTR(md5(prefix), 1, 8))
                             AS BIGINT)) AS c
  FROM p
)
SELECT source,
       CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS collision_rate
FROM h GROUP BY 1
"""


# =====================================================================
# cumulative gains curve (targeting-model eval)
# =====================================================================

def q_gains_curve(sf_dir: str):
    """Cumulative GAINS curve: users ranked into deciles by event
    frequency (the deterministic proxy score) and each decile's
    cumulative share of total purchase revenue — the gains chart that
    says 'the top 20% of scored users hold X% of the value', the
    targeting-eval sibling of roc_auc/pr_curve. Per-user (frequency,
    purchase cents) folds in ONE user exchange; the decile assignment
    is the distributed NTILE (skinny sort + offset fold); tile and
    cents re-join as Sum-able tagged columns; <= 10-row finale with
    exact integer cumulative sums, one division per row."""
    from .analytics import _ntile_pairs

    ds = _t(sf_dir, "events", ["user_id", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        is_p = pc.equal(b["event_type"], pa.scalar("purchase"))
        cents = pc.if_else(is_p, _cents(b["value"]),
                           pa.scalar(0, pa.int64()))
        t = pa.table({"ck": b["user_id"], "freq": pa.array(
            np.ones(b.num_rows, np.int64)), "mon": cents})
        g = t.group_by("ck").aggregate([("freq", "sum"), ("mon", "sum")])
        return g.rename_columns(["ck", "freq", "mon"])

    per_user = (ds.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("ck")
                .aggregate(Sum("freq", alias_name="freq"),
                           Sum("mon", alias_name="mon"))
                .materialize())

    pairs = _ntile_pairs(
        per_user.map_batches(
            lambda b: pa.table({"freq": b["freq"].cast(pa.int64()),
                                "ck": b["ck"]}),
            batch_format="pyarrow").materialize(),
        "freq", k=10)

    tagged = pairs.map_batches(
        lambda b: pa.table({"ck": b["ck"], "tile": b["tile"],
                            "mon": pa.array(
                                np.zeros(b.num_rows, np.int64))}),
        batch_format="pyarrow").union(
        per_user.map_batches(
            lambda b: pa.table({"ck": b["ck"],
                                "tile": pa.array(
                                    np.zeros(b.num_rows, np.int64)),
                                "mon": b["mon"]}),
            batch_format="pyarrow"))

    joined = (tagged.groupby("ck")
              .aggregate(Sum("tile", alias_name="tile"),
                         Sum("mon", alias_name="mon")))

    def cells(b: pa.Table) -> pa.Table:
        g = b.group_by("tile").aggregate([("mon", "sum"),
                                          ([], "count_all")])
        return g.rename_columns(["decile", "cents", "n_users"])

    agg = (joined.map_batches(cells, batch_format="pyarrow")
           .groupby("decile")
           .aggregate(Sum("cents", alias_name="cents"),
                      Sum("n_users", alias_name="n_users")))
    df = agg.to_pandas().sort_values("decile", ignore_index=True)
    cents = df["cents"].to_numpy(np.int64)
    total = int(cents.sum())
    cum = np.cumsum(cents.astype(object))
    return pa.table({
        "decile": pa.array(df["decile"].to_numpy(np.int64)),
        "n_users": pa.array(df["n_users"].to_numpy(np.int64)),
        "cents": pa.array(cents),
        "cum_share": pa.array(np.round(
            np.array([float(c) for c in cum]) / float(total), 6),
            pa.float64())})


SQL_GAINS_CURVE = """
WITH u AS (
  SELECT user_id AS ck, CAST(COUNT(*) AS BIGINT) AS freq,
    SUM(CASE WHEN event_type = 'purchase'
        THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS mon
  FROM events GROUP BY 1
), t AS (
  SELECT ck, mon,
         CAST(NTILE(10) OVER (ORDER BY freq DESC, ck) AS BIGINT)
           AS decile
  FROM u
), g AS (
  SELECT decile, CAST(SUM(mon) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM t GROUP BY 1
), tot AS (SELECT CAST(SUM(cents) AS HUGEINT) AS total FROM g)
SELECT g.decile, g.n_users, g.cents,
  ROUND(CAST(SUM(g.cents) OVER (ORDER BY g.decile
                                ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        / CAST(tot.total AS DOUBLE), 6) AS cum_share
FROM g, tot
"""


# =====================================================================
# delta-method CI on revenue-per-order (ratio metric)
# =====================================================================

def q_ratio_ci(sf_dir: str):
    """95% delta-method confidence interval on revenue-per-order per
    customer segment — ratio KPIs (revenue/orders, clicks/sessions)
    need the delta method because both numerator and denominator vary
    per customer; the naive mean-of-ratios is a different (wrong)
    estimand. Per-customer (orders, cents) fold through ONE custkey
    exchange with the segment riding a broadcast LUT; per-segment
    exact int64 moments (n, Σx, Σy, Σx², Σy², Σxy) in DOLLAR units —
    cents² sums overflow int64 at sf >= 0.01 (hit and fixed), dollars
    keep Σx² < 2^63 through sf ~ 100 (x < 2^31 asserted per block);
    r = Σx/Σy and
    var(r) = (Σx²−2rΣxy+r²Σy²)·n/(n−1)/Σy² — ONE identical IEEE
    expression chain, z = 1.96, 6 dp."""
    import pyarrow.parquet as pq

    ct = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                       columns=["c_custkey", "c_mktsegment"])
    ck = np.asarray(ct["c_custkey"], dtype=np.int64)
    segs, scode = np.unique(np.asarray(ct["c_mktsegment"], dtype=object),
                            return_inverse=True)
    lut = np.zeros(int(ck.max()) + 1, np.int64)
    lut[ck] = scode
    lut_ref = ray.put((lut, len(segs)))

    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        # half-AWAY dollar rounding (DuckDB ROUND): totalprice ends in
        # .50 often, where pc.round's half-even disagrees
        v = b["o_totalprice"].to_numpy(zero_copy_only=False)
        x = np.floor(v + 0.5).astype(np.int64)   # prices are positive
        t = pa.table({"ck": b["o_custkey"], "x": pa.array(x),
                      "y": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by("ck").aggregate([("x", "sum"), ("y", "sum")])
        return g.rename_columns(["ck", "x", "y"])

    per_cust = (ds.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("ck")
                .aggregate(Sum("x", alias_name="x"),
                           Sum("y", alias_name="y")))

    def moments(b: pa.Table) -> pa.Table:
        import ray as _r

        seg_lut, ns = _r.get(lut_ref)
        c = b["ck"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        assert int(x.max()) < (1 << 31), "dollar sums exceed the x² bound"
        code = seg_lut[c]
        out = {"seg": pa.array(np.arange(ns, dtype=np.int64))}
        for name, v in (("n", np.ones(len(c), np.int64)),
                        ("sx", x), ("sy", y), ("sxx", x * x),
                        ("syy", y * y), ("sxy", x * y)):
            s = np.zeros(ns, np.int64)
            np.add.at(s, code, v)
            out[name] = pa.array(s)
        return pa.table(out)

    agg = (per_cust.map_batches(moments, batch_format="pyarrow")
           .groupby("seg")
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]]))
    df = agg.to_pandas().sort_values("seg", ignore_index=True)
    z = 1.96
    rows = {"segment": [], "n": [], "ratio": [], "lo": [], "hi": []}
    for _, rr in df.iterrows():
        n = int(rr["n"])
        if n < 2:
            continue
        sx, sy = int(rr["sx"]), int(rr["sy"])
        sxx, syy, sxy = int(rr["sxx"]), int(rr["syy"]), int(rr["sxy"])
        r = float(sx) / float(sy)
        var = (float(sxx) - 2.0 * r * float(sxy)
               + r * r * float(syy)) * float(n) / float(n - 1) \
            / (float(sy) * float(sy))
        se = math.sqrt(var)
        rows["segment"].append(str(segs[int(rr["seg"])]))
        rows["n"].append(n)
        rows["ratio"].append(np.round(r, 6))
        rows["lo"].append(np.round(r - z * se, 6))
        rows["hi"].append(np.round(r + z * se, 6))
    return pa.table({
        "segment": pa.array(rows["segment"], pa.string()),
        "n": pa.array(rows["n"], pa.int64()),
        "ratio": pa.array(rows["ratio"], pa.float64()),
        "lo": pa.array(rows["lo"], pa.float64()),
        "hi": pa.array(rows["hi"], pa.float64())})


SQL_RATIO_CI = """
WITH u AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         SUM(CAST(ROUND(o.o_totalprice) AS BIGINT)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), m AS (
  SELECT segment, CAST(COUNT(*) AS HUGEINT) AS n,
    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
    CAST(SUM(x * x) AS HUGEINT) AS sxx,
    CAST(SUM(y * y) AS HUGEINT) AS syy,
    CAST(SUM(x * y) AS HUGEINT) AS sxy
  FROM u GROUP BY 1 HAVING COUNT(*) >= 2
), s AS (
  SELECT segment, CAST(n AS BIGINT) AS n,
    CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
    SQRT((CAST(sxx AS DOUBLE)
          - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
            * CAST(sxy AS DOUBLE)
          + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
            * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
            * CAST(syy AS DOUBLE))
         * CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE)
         / (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS se
  FROM m
)
SELECT segment, n, ROUND(r, 6) AS ratio,
       ROUND(r - 1.96 * se, 6) AS lo, ROUND(r + 1.96 * se, 6) AS hi
FROM s
"""


# =====================================================================
# pairwise Jaccard histogram (shingle dedup-threshold calibration)
# =====================================================================

def q_jaccard_histogram(sf_dir: str):
    """Histogram (10 bins) of word-trigram-shingle Jaccard over every
    document pair sharing at least one shingle (doc_id < 300, the
    set_sim corpus cap) — the threshold-calibration curve for SHINGLE
    dedup, sibling to cosine_histogram's embedding curve: where the
    natural-pair mass ends tells you where to put τ. Plan: per-doc
    distinct shingle sets; ONE token-hash exchange emits co-occurring
    doc pairs per shingle; a packed-pair-key exchange dedups pairs and
    carries both sizes + a shared-count SUM, so J = shared /(|A|+|B|
    −shared) needs NO second look at the sets; exact integer binning
    (20·inter vs union cross products — no float decides a bin)."""
    import pyarrow.dataset as pads

    from .dataops import _pair_part
    from .sizing import fold_parts
    from crawlray.functions.murmur3 import hash64_batch_i64

    n_parts = fold_parts()
    base = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pads.field("doc_id") < 300)

    def doc_shingles(b: pa.Table) -> pa.Table:
        import re

        split = re.compile("[^a-z]+")
        out_tok, out_id, out_sz = [], [], []
        for did, text in zip(b["doc_id"].to_pylist(),
                             b["text"].to_pylist()):
            w = [t for t in split.split((text or "").lower()) if t]
            sh = sorted({" ".join(w[j:j + 3])
                         for j in range(len(w) - 2)})
            for t in sh:
                out_tok.append(t)
                out_id.append(did)
                out_sz.append(len(sh))
        tok = pa.array(out_tok, pa.string())
        h = np.asarray(hash64_batch_i64(tok))
        return pa.table({
            "token": tok, "tpart": pa.array(_pair_part(h)),
            "doc_id": pa.array(out_id, pa.int64()),
            "sz": pa.array(out_sz, pa.int64()),
        })

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        keys, sa, sb = [], [], []
        for _tok, g in part.groupby("token", sort=False):
            ids = g["doc_id"].to_numpy(np.int64)
            szs = g["sz"].to_numpy(np.int64)
            order = np.argsort(ids)
            ids, szs = ids[order], szs[order]
            if len(ids) < 2:
                continue
            iu, iv = np.triu_indices(len(ids), k=1)
            keys.append((ids[iu] << np.int64(32)) | ids[iv])
            sa.append(szs[iu])
            sb.append(szs[iv])
        if not keys:
            return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                 "sa": pd.Series([], dtype=np.int64),
                                 "sb": pd.Series([], dtype=np.int64),
                                 "shared": pd.Series([], dtype=np.int64),
                                 "kp": pd.Series([], dtype=np.int64)})
        key = np.concatenate(keys)
        kp = (_splitmix64(key).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pd.DataFrame({"key": key,
                             "sa": np.concatenate(sa),
                             "sb": np.concatenate(sb),
                             "shared": np.ones(len(key), np.int64),
                             "kp": kp})

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        df_ = g.groupby("key", sort=False).agg(
            sa=("sa", "first"), sb=("sb", "first"),
            shared=("shared", "sum")).reset_index()
        inter = df_["shared"].to_numpy(np.int64)
        union = df_["sa"].to_numpy(np.int64) \
            + df_["sb"].to_numpy(np.int64) - inter
        # bin = floor(10·J) capped at 9 — exact integer cross products
        binv = np.minimum((10 * inter) // union, 9).astype(np.int64)
        ub, c = np.unique(binv, return_counts=True)
        return pd.DataFrame({"bin": ub, "n": c.astype(np.int64)})

    return (base.map_batches(doc_shingles, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("tpart").map_groups(pairs, batch_format="pandas")
            .groupby("kp").map_groups(hist, batch_format="pandas")
            .groupby("bin")
            .aggregate(Sum("n", alias_name="n")))


SQL_JACCARD_HISTOGRAM = """
WITH w AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                x -> x <> '') AS l
  FROM documents WHERE doc_id < 300
), tok AS (
  SELECT DISTINCT doc_id, array_to_string(l[g:g+2], ' ') AS token
  FROM w, UNNEST(generate_series(1, len(l) - 2)) AS t(g)
), sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM tok
             GROUP BY doc_id),
ip AS (
  SELECT a.doc_id AS da, b.doc_id AS db,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), j AS (
  SELECT LEAST((10 * ip.inter)
               // (sa.sz + sb.sz - ip.inter), 9) AS bin
  FROM ip JOIN sizes sa ON sa.doc_id = ip.da
          JOIN sizes sb ON sb.doc_id = ip.db
)
SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n
FROM j GROUP BY 1
"""


# =====================================================================
# per-part price-trend sweep (regression per high-cardinality member)
# =====================================================================

def q_price_trend_parts(sf_dir: str, k: int = 20):
    """Top-20 parts by |unit-price trend| (cents/day OLS slope of
    realized unit price on ship day) — regr_per_group run per
    HIGH-CARDINALITY dimension member (every part, not 3 flags),
    which forces the scale shape: exact int64 moment partials per
    part fold through ONE partkey-hash partition exchange (never a
    20k-group hash Aggregate), slopes divide unbounded ints on the
    bounded per-partition member table, and per-partition partial
    top-k merges on the driver. Unit price quantizes half-away to
    whole cents (one identical expression both sides); rank by
    (ROUNDED |slope| DESC, part) is deterministic."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "lineitem",
            ["l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        p = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (b["l_shipdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // DAY_US)
        qty = pc.round(b["l_quantity"]).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ext = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        up = ext.astype(np.float64) / qty.astype(np.float64)
        y = np.floor(up + 0.5).astype(np.int64)   # half-away, positive
        kp = (_splitmix64(p).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"p": pa.array(p), "x": pa.array(day),
                         "y": pa.array(y), "kp": pa.array(kp)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        p = g["p"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        up_, inv = np.unique(p, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        sums = {}
        for name, v in (("sx", x), ("sy", y), ("sxx", x * x),
                        ("sxy", x * y)):
            s = np.zeros(len(up_), np.int64)
            np.add.at(s, inv, v)
            sums[name] = s
        den = n * sums["sxx"] - sums["sx"] * sums["sx"]
        num = n * sums["sxy"] - sums["sx"] * sums["sy"]
        keep = (n >= 3) & (den > 0)
        slope = np.round(num[keep].astype(np.float64)
                         / den[keep].astype(np.float64), 6)
        pp, nn = up_[keep], n[keep]
        order = np.lexsort((pp, -np.abs(slope)))[:k]
        return pd.DataFrame({"part": pp[order], "n": nn[order],
                             "slope": slope[order]})

    rows = [r for b in
            (ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("kp").map_groups(fold, batch_format="pandas"))
            .iter_batches(batch_format="pyarrow")
            for r in zip(b["part"].to_pylist(), b["n"].to_pylist(),
                         b["slope"].to_pylist())]
    rows.sort(key=lambda r: (-abs(r[2]), r[0]))
    top = rows[:k]
    return pa.table({
        "part": pa.array([r[0] for r in top], pa.int64()),
        "n": pa.array([r[1] for r in top], pa.int64()),
        "slope": pa.array([r[2] for r in top], pa.float64())})


SQL_PRICE_TREND_PARTS = """
WITH q AS (
  SELECT l_partkey AS part,
    epoch_us(l_shipdate) // 86400000000 AS x,
    CAST(ROUND(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    AS DOUBLE)
               / CAST(CAST(ROUND(l_quantity) AS BIGINT) AS DOUBLE))
         AS BIGINT) AS y
  FROM lineitem
), m AS (
  SELECT part, CAST(COUNT(*) AS HUGEINT) AS n,
    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
    CAST(SUM(x * x) AS HUGEINT) AS sxx,
    CAST(SUM(x * y) AS HUGEINT) AS sxy
  FROM q GROUP BY 1 HAVING COUNT(*) >= 3
), s AS (
  SELECT part, CAST(n AS BIGINT) AS n,
    ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
          / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope
  FROM m WHERE n * sxx - sx * sx > 0
)
SELECT part, n, slope FROM s
QUALIFY ROW_NUMBER() OVER (ORDER BY ABS(slope) DESC, part) <= 20
"""


# =====================================================================
# attribution-window sweep (1h / 1d / 7d lookback)
# =====================================================================

def q_attribution_window(sf_dir: str):
    """Share of purchases with a prior non-purchase touch within 1
    hour, 1 day, and 7 days — the lookback-window sensitivity sweep
    that decides an attribution policy BEFORE anyone commits to one
    (first/last/linear all inherit the window). ONE user-hash
    exchange; each partition sorts its users' touches once and every
    purchase answers all three windows with ONE searchsorted probe
    (strictly-before tuple semantics); <= 3-row exact int partials,
    one division per window, 6 dp."""
    from .sizing import fold_parts

    n_parts = fold_parts()
    windows = [3600 * 1_000_000, 86_400 * 1_000_000,
               7 * 86_400 * 1_000_000]
    names = ["1h", "1d", "7d"]
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"], "event_id": b["event_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "is_p": pc.equal(b["event_type"],
                             pa.scalar("purchase")).cast(pa.int64()),
            "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        res = np.zeros(4, np.int64)             # purchases, hit_1h/1d/7d
        for _u, gu in g.groupby("user_id", sort=False):
            ts = gu["ts_us"].to_numpy(np.int64)
            eid = gu["event_id"].to_numpy(np.int64)
            is_p = gu["is_p"].to_numpy(np.int64).astype(bool)
            tts = np.sort(ts[~is_p])
            pts = ts[is_p]
            peid = eid[is_p]
            res[0] += len(pts)
            if len(tts) == 0:
                continue
            # nearest touch strictly before the purchase ts; a touch
            # at the SAME microsecond counts when its event_id is
            # smaller — conservative: use ts-strict (documented, both
            # sides)
            _ = peid
            prev = np.searchsorted(tts, pts, side="left") - 1
            has = prev >= 0
            gap = np.where(has, pts - tts[np.maximum(prev, 0)],
                           np.int64(1) << 62)
            for i, w in enumerate(windows):
                res[1 + i] += int((gap <= w).sum())
        return pd.DataFrame({
            "purchases": [int(res[0])], "h1": [int(res[1])],
            "d1": [int(res[2])], "d7": [int(res[3])]})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .aggregate(Sum("purchases", alias_name="purchases"),
                      Sum("h1", alias_name="h1"),
                      Sum("d1", alias_name="d1"),
                      Sum("d7", alias_name="d7")))
    total = int(agg["purchases"])
    hits = [int(agg["h1"]), int(agg["d1"]), int(agg["d7"])]
    return pa.table({
        "window": pa.array(names, pa.string()),
        "purchases": pa.array([total] * 3, pa.int64()),
        "attributed": pa.array(hits, pa.int64()),
        "share": pa.array([np.round(float(h) / float(total), 6)
                           for h in hits], pa.float64())})


SQL_ATTRIBUTION_WINDOW = """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS tu
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, epoch_us(ts) AS tu
  FROM events WHERE event_type <> 'purchase'
), g AS (
  SELECT p.user_id, p.tu,
         MAX(t.tu) AS prev
  FROM p LEFT JOIN t ON t.user_id = p.user_id AND t.tu < p.tu
  GROUP BY 1, 2
), c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS purchases,
    CAST(SUM(CASE WHEN tu - prev <= 3600000000 THEN 1 ELSE 0 END)
         AS BIGINT) AS h1,
    CAST(SUM(CASE WHEN tu - prev <= 86400000000 THEN 1 ELSE 0 END)
         AS BIGINT) AS d1,
    CAST(SUM(CASE WHEN tu - prev <= 604800000000 THEN 1 ELSE 0 END)
         AS BIGINT) AS d7
  FROM g
)
SELECT w.window, c.purchases,
  CASE w.window WHEN '1h' THEN c.h1 WHEN '1d' THEN c.d1
                ELSE c.d7 END AS attributed,
  ROUND(CAST(CASE w.window WHEN '1h' THEN c.h1 WHEN '1d' THEN c.d1
             ELSE c.d7 END AS DOUBLE)
        / CAST(c.purchases AS DOUBLE), 6) AS share
FROM (SELECT unnest(['1h', '1d', '7d']) AS window) w, c
"""


# =====================================================================
# daily log-return volatility
# =====================================================================

def q_volatility(sf_dir: str):
    """Volatility of daily revenue: standard deviation of ln-returns
    over consecutive PRESENT days (gap rule both sides), plus the
    √365-annualized figure — the stability scalar next to
    max_drawdown and cvar. ln-returns QUANTIZE to micro-unit int64
    (ln of exact integer ratios, half-away — the elasticity trick) so
    the distributed moments are exact; std = √((nΣx²−(Σx)²)/(n(n−1)))
    in unbounded ints until one sqrt, de-scaled by the quantization
    constant, 6 dp."""
    df = _day_rev_fold(sf_dir)
    day = df["day"].to_numpy(np.int64)
    rev = df["rev"].to_numpy(np.int64)
    consec = day[1:] == day[:-1] + 1
    r1 = rev[1:][consec].astype(np.float64)
    r0 = rev[:-1][consec].astype(np.float64)
    x = np.log(r1 / r0) * 1e6
    xq = np.where(x >= 0, np.floor(x + 0.5),
                  -np.floor(-x + 0.5)).astype(object)
    n = len(xq)
    sx = int(sum(int(v) for v in xq))
    sxx = int(sum(int(v) * int(v) for v in xq))
    var_num = n * sxx - sx * sx
    vol = math.sqrt(float(var_num) / float(n * (n - 1))) / 1e6
    return pa.table({
        "n_returns": pa.array([n], pa.int64()),
        "daily_vol": pa.array([np.round(vol, 6)], pa.float64()),
        "annualized": pa.array([np.round(vol * math.sqrt(365.0), 6)],
                               pa.float64())})


SQL_VOLATILITY = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), r AS (
  SELECT CAST(ROUND(1000000 * LN(CAST(b.rev AS DOUBLE)
                                 / CAST(a.rev AS DOUBLE))) AS BIGINT)
           AS x
  FROM d a JOIN d b ON b.day = a.day + 1
), m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(x * x) AS HUGEINT) AS sxx
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_returns,
  ROUND(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
             / CAST(n * (n - 1) AS DOUBLE)) / 1000000.0, 6)
    AS daily_vol,
  ROUND(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
             / CAST(n * (n - 1) AS DOUBLE)) / 1000000.0
        * SQRT(365.0), 6) AS annualized
FROM m
"""


# =====================================================================
# dedup transitivity audit (single-link over-merge risk)
# =====================================================================

def q_dedup_transitivity(sf_dir: str):
    """Transitivity audit of the Jaccard-0.8 near-dup pair graph: of
    every wedge a~b~c, how many close into a triangle (a~c too)? Low
    transitivity means single-link clustering (dedup_groups) chains
    unrelated docs through hubs — THE failure mode to check before
    trusting connected-components dedup. Reuses set_sim_join's entire
    distributed plan for the pair set (prefix filtering, one shingle
    exchange); the PAIR graph is bounded (near-dup pairs, not docs),
    so wedges count on the driver with one sorted adjacency pass;
    exact integer ratio, 6 dp."""
    from .dataops import q_set_sim_join

    pairs_ds = q_set_sim_join(sf_dir)
    rows = [
        (int(a), int(b))
        for b_ in pairs_ds.iter_batches(batch_format="pyarrow")
        for a, b in zip(b_["doc_a"].to_pylist(), b_["doc_b"].to_pylist())]
    edges = set()
    adj: dict[int, set] = {}
    for a, b in rows:
        lo, hi = (a, b) if a < b else (b, a)
        if (lo, hi) in edges:
            continue
        edges.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    closed = 0
    wedges = 0
    for center, nbrs in adj.items():
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                wedges += 1
                lo, hi = ns[i], ns[j]
                if (lo, hi) in edges:
                    closed += 1
    # every triangle closes 3 wedges; report wedge-level transitivity
    open_w = wedges - closed
    return pa.table({
        "n_pairs": pa.array([len(edges)], pa.int64()),
        "wedges": pa.array([wedges], pa.int64()),
        "closed": pa.array([closed], pa.int64()),
        "transitivity": pa.array(
            [None if wedges == 0
             else np.round(float(closed) / float(wedges), 6)],
            pa.float64()),
        "open_wedges": pa.array([open_w], pa.int64())})


SQL_DEDUP_TRANSITIVITY = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT doc_id + 1000000, regexp_replace(text, ' [^ ]*$', '')
  FROM documents WHERE doc_id < 300
), w AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                x -> x <> '') AS l
  FROM corpus
), tok AS (
  SELECT DISTINCT doc_id, array_to_string(l[g:g+2], ' ') AS token
  FROM w, UNNEST(generate_series(1, len(l) - 2)) AS t(g)
), sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
ipairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
e AS (
  SELECT doc_a AS u, doc_b AS v
  FROM ipairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE 5 * inter >= 4 * (sa.sz + sb.sz - inter)
), sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
wedge AS (
  SELECT a.u AS center, a.v AS x, b.v AS y
  FROM sym a JOIN sym b ON b.u = a.u AND a.v < b.v
), c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS wedges,
    CAST(COALESCE(SUM(CASE WHEN EXISTS (
      SELECT 1 FROM e WHERE e.u = wedge.x AND e.v = wedge.y)
      THEN 1 ELSE 0 END), 0) AS BIGINT) AS closed
  FROM wedge
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_pairs,
  c.wedges, c.closed,
  CASE WHEN c.wedges > 0
       THEN ROUND(CAST(c.closed AS DOUBLE)
                  / CAST(c.wedges AS DOUBLE), 6) END AS transitivity,
  c.wedges - c.closed AS open_wedges
FROM c
"""


# =====================================================================
# jackknife standard error on a ratio (deterministic resampling)
# =====================================================================

def q_jackknife_ratio(sf_dir: str):
    """JACKKNIFE standard error of revenue-per-order per segment —
    the deterministic resampling family (bootstrap needs RNG; leave-
    one-out does not), cross-checkable against ratio_ci's delta
    method: the two SEs should agree to first order and the query
    shows both assumptions' gap. Per-customer (dollars, orders) folds
    in ONE custkey exchange; each segment's customers co-locate in a
    segment groupby, where every leave-one-out ratio r_i =
    (Sx−x_i)/(Sy−y_i) is vectorized and the two order-dependent float
    sums (r̄ and the squared deviations) run in CUSTKEY order on both
    sides; se = √((n−1)/n · Σ(r_i−r̄)²), 6 dp."""
    import pyarrow.parquet as pq

    ct = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                       columns=["c_custkey", "c_mktsegment"])
    ck = np.asarray(ct["c_custkey"], dtype=np.int64)
    segs, scode = np.unique(np.asarray(ct["c_mktsegment"], dtype=object),
                            return_inverse=True)
    lut = np.zeros(int(ck.max()) + 1, np.int64)
    lut[ck] = scode
    lut_ref = ray.put((lut, [str(s) for s in segs]))

    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        v = b["o_totalprice"].to_numpy(zero_copy_only=False)
        x = np.floor(v + 0.5).astype(np.int64)   # half-away dollars
        t = pa.table({"ck": b["o_custkey"], "x": pa.array(x),
                      "y": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by("ck").aggregate([("x", "sum"), ("y", "sum")])
        return g.rename_columns(["ck", "x", "y"])

    per_cust = (ds.map_batches(prep, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("ck")
                .aggregate(Sum("x", alias_name="x"),
                           Sum("y", alias_name="y")))

    def tag_seg(b: pa.Table) -> pa.Table:
        import ray as _r

        seg_lut, names = _r.get(lut_ref)
        c = b["ck"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = np.array([names[i] for i in seg_lut[c]], dtype=object)
        return b.append_column("segment", pa.array(seg, pa.string()))

    def jack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ck", ignore_index=True)
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        n = len(x)
        if n < 2:
            return pd.DataFrame({"segment": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64),
                                 "ratio": pd.Series([], dtype=np.float64),
                                 "se_jack": pd.Series([],
                                                      dtype=np.float64)})
        sx, sy = int(x.sum()), int(y.sum())
        ri = (float(sx) - x.astype(np.float64)) \
            / (float(sy) - y.astype(np.float64))
        acc = 0.0
        for v in ri:                             # custkey order
            acc += v
        rbar = acc / float(n)
        acc2 = 0.0
        for v in ri:                             # custkey order
            d = v - rbar
            acc2 += d * d
        se = math.sqrt(acc2 * float(n - 1) / float(n))
        return pd.DataFrame({
            "segment": [str(g["segment"].iloc[0])],
            "n": np.array([n], np.int64),
            "ratio": np.array([np.round(float(sx) / float(sy), 6)],
                              np.float64),
            "se_jack": np.array([np.round(se, 6)], np.float64)})

    return (per_cust.map_batches(tag_seg, batch_format="pyarrow")
            .groupby("segment").map_groups(jack, batch_format="pandas")
            .select_columns(["segment", "n", "ratio", "se_jack"]))


SQL_JACKKNIFE_RATIO = """
WITH u AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey AS ck,
         SUM(CAST(ROUND(o.o_totalprice) AS BIGINT)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), s AS (
  SELECT segment, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM u GROUP BY 1 HAVING COUNT(*) >= 2
), j AS (
  SELECT u.segment, u.ck,
    (CAST(s.sx AS DOUBLE) - CAST(u.x AS DOUBLE))
      / (CAST(s.sy AS DOUBLE) - CAST(u.y AS DOUBLE)) AS ri
  FROM u JOIN s USING (segment)
), m AS (
  SELECT segment, SUM(ri ORDER BY ck) / CAST(COUNT(*) AS DOUBLE) AS rbar
  FROM j GROUP BY 1
), v AS (
  SELECT j.segment,
    SUM((j.ri - m.rbar) * (j.ri - m.rbar) ORDER BY j.ck) AS ss
  FROM j JOIN m USING (segment) GROUP BY 1
)
SELECT s.segment, s.n,
  ROUND(CAST(s.sx AS DOUBLE) / CAST(s.sy AS DOUBLE), 6) AS ratio,
  ROUND(SQRT(v.ss * CAST(s.n - 1 AS DOUBLE) / CAST(s.n AS DOUBLE)), 6)
    AS se_jack
FROM s JOIN v USING (segment)
"""


# =====================================================================
# difference-in-differences (two arms × two halves)
# =====================================================================

def q_diff_in_diff(sf_dir: str):
    """DIFFERENCE-IN-DIFFERENCES on per-user purchase revenue: md5
    arms × span halves, DiD = (Ā₂−Ā₁) − (B̄₂−B̄₁) with the unpaired
    four-cell standard error — the quasi-experimental workhorse when
    randomization happened once but the world changed under it (CUPED
    and prop_ztest's sibling). ONE user-hash exchange; per-(arm,
    half) exact int64 moments (n, Σ cents, Σ cents²) from per-user
    sums; the finale is ONE identical IEEE expression chain (four
    means, four variances, one sqrt), 6 dp."""
    import hashlib

    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

    bounds = ds.map_batches(
        lambda b: pa.table({
            "lo": pa.array([pc.min(b["ts"]).cast(pa.int64()).as_py()
                            // DAY_US], pa.int64()),
            "hi": pa.array([pc.max(b["ts"]).cast(pa.int64()).as_py()
                            // DAY_US], pa.int64())}),
        batch_format="pyarrow").aggregate(Min("lo"), Max("hi"))
    lo, hi = int(bounds["min(lo)"]), int(bounds["max(hi)"])
    mid = (lo + hi) // 2

    def prep(b: pa.Table) -> pa.Table:
        m = pc.equal(b["event_type"], pa.scalar("purchase"))
        t = b.filter(m)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // DAY_US)
        half = (day > mid).astype(np.int64)
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"], "half": pa.array(half),
            "c": _cents(t["value"]), "kp": pa.array(kp),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["user_id", "half"], sort=False)["c"].sum() \
            .reset_index()
        uid = per["user_id"].to_numpy(np.int64)
        half = per["half"].to_numpy(np.int64)
        c = per["c"].to_numpy(np.int64)
        arm = np.fromiter(
            (int(hashlib.md5(str(int(u)).encode()).hexdigest()[:8], 16) % 2
             for u in uid), dtype=np.int64, count=len(uid))
        cell = arm * 2 + half
        n = np.bincount(cell, minlength=4).astype(np.int64)
        s1 = np.zeros(4, np.int64)
        s2 = np.zeros(4, np.int64)
        np.add.at(s1, cell, c)
        np.add.at(s2, cell, c * c)
        return pd.DataFrame({"cell": np.arange(4, dtype=np.int64),
                             "n": n, "s1": s1, "s2": s2})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .groupby("cell")
           .aggregate(Sum("n", alias_name="n"), Sum("s1", alias_name="s1"),
                      Sum("s2", alias_name="s2")))
    df = agg.to_pandas().sort_values("cell", ignore_index=True)
    n = {int(r["cell"]): int(r["n"]) for _, r in df.iterrows()}
    s1 = {int(r["cell"]): int(r["s1"]) for _, r in df.iterrows()}
    s2 = {int(r["cell"]): int(r["s2"]) for _, r in df.iterrows()}
    if any(n.get(i, 0) < 2 for i in range(4)):
        raise ValueError("degenerate DiD cell: all four arm×half cells "
                         "need n >= 2, got %s" % n)
    mean = {i: float(s1[i]) / float(n[i]) for i in range(4)}
    var = {i: (float(n[i]) * float(s2[i]) - float(s1[i]) * float(s1[i]))
           / (float(n[i]) * float(n[i] - 1)) for i in range(4)}
    # cells: 0=A·H1, 1=A·H2, 2=B·H1, 3=B·H2
    did = (mean[1] - mean[0]) - (mean[3] - mean[2])
    se = math.sqrt(var[0] / float(n[0]) + var[1] / float(n[1])
                   + var[2] / float(n[2]) + var[3] / float(n[3]))
    return pa.table({
        "n_a1": pa.array([n[0]], pa.int64()),
        "n_a2": pa.array([n[1]], pa.int64()),
        "n_b1": pa.array([n[2]], pa.int64()),
        "n_b2": pa.array([n[3]], pa.int64()),
        "did_cents": pa.array([np.round(did, 6)], pa.float64()),
        "z": pa.array([np.round(did / se, 6)], pa.float64())})


SQL_DIFF_IN_DIFF = """
WITH b AS (
  SELECT (MIN(epoch_us(ts) // 86400000000)
          + MAX(epoch_us(ts) // 86400000000)) // 2 AS mid
  FROM events
), u AS (
  SELECT e.user_id,
    CAST(CONCAT('0x', SUBSTR(md5(CAST(e.user_id AS VARCHAR)), 1, 8))
         AS BIGINT) % 2 AS arm,
    CASE WHEN epoch_us(e.ts) // 86400000000 > b.mid THEN 1 ELSE 0 END
      AS half,
    SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS c
  FROM events e, b WHERE e.event_type = 'purchase'
  GROUP BY 1, 2, 3
), m AS (
  SELECT arm * 2 + half AS cell, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(c) AS HUGEINT) AS s1,
         CAST(SUM(c * c) AS HUGEINT) AS s2
  FROM u GROUP BY 1
), p AS (
  SELECT
    MAX(CASE WHEN cell = 0 THEN n END) AS n0,
    MAX(CASE WHEN cell = 1 THEN n END) AS n1,
    MAX(CASE WHEN cell = 2 THEN n END) AS n2,
    MAX(CASE WHEN cell = 3 THEN n END) AS n3,
    MAX(CASE WHEN cell = 0 THEN s1 END) AS a0,
    MAX(CASE WHEN cell = 1 THEN s1 END) AS a1,
    MAX(CASE WHEN cell = 2 THEN s1 END) AS a2,
    MAX(CASE WHEN cell = 3 THEN s1 END) AS a3,
    MAX(CASE WHEN cell = 0 THEN s2 END) AS q0,
    MAX(CASE WHEN cell = 1 THEN s2 END) AS q1,
    MAX(CASE WHEN cell = 2 THEN s2 END) AS q2,
    MAX(CASE WHEN cell = 3 THEN s2 END) AS q3
  FROM m
)
SELECT CAST(n0 AS BIGINT) AS n_a1, CAST(n1 AS BIGINT) AS n_a2,
       CAST(n2 AS BIGINT) AS n_b1, CAST(n3 AS BIGINT) AS n_b2,
  ROUND((CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE)
         - CAST(a0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        - (CAST(a3 AS DOUBLE) / CAST(n3 AS DOUBLE)
           - CAST(a2 AS DOUBLE) / CAST(n2 AS DOUBLE)), 6) AS did_cents,
  ROUND(((CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          - CAST(a0 AS DOUBLE) / CAST(n0 AS DOUBLE))
         - (CAST(a3 AS DOUBLE) / CAST(n3 AS DOUBLE)
            - CAST(a2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
        / SQRT(
     ((CAST(n0 AS DOUBLE) * CAST(q0 AS DOUBLE)
       - CAST(a0 AS DOUBLE) * CAST(a0 AS DOUBLE))
      / (CAST(n0 AS DOUBLE) * CAST(n0 - 1 AS DOUBLE)))
       / CAST(n0 AS DOUBLE)
     + ((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
         - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE))
        / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)))
       / CAST(n1 AS DOUBLE)
     + ((CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
         - CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE))
        / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE)))
       / CAST(n2 AS DOUBLE)
     + ((CAST(n3 AS DOUBLE) * CAST(q3 AS DOUBLE)
         - CAST(a3 AS DOUBLE) * CAST(a3 AS DOUBLE))
        / (CAST(n3 AS DOUBLE) * CAST(n3 - 1 AS DOUBLE)))
       / CAST(n3 AS DOUBLE)), 6) AS z
FROM p
"""


# =====================================================================
# sample-ratio-mismatch check (A/B guardrail)
# =====================================================================

def q_srm_check(sf_dir: str):
    """Sample-ratio-mismatch guardrail on the md5 split: chi² (1 dof)
    of the observed arm sizes against the designed 50/50 — the FIRST
    check every experimentation platform runs, because a biased split
    invalidates every downstream test (prop_ztest, wilson_ci,
    diff_in_diff all assume this passes). One user-hash exchange of
    exact arm counts; chi² = (n₀−n₁)²/(n₀+n₁) in unbounded ints until
    one division; flagged when chi² > 3.841 (the 5% critical value —
    an exact constant compare, no p-value needed)."""
    import hashlib

    from .sizing import fold_parts

    n_parts = fold_parts()
    ds = _t(sf_dir, "events", ["user_id"])

    def prep(b: pa.Table) -> pa.Table:
        uid = np.unique(
            b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        kp = (_splitmix64(uid).view(np.uint64)
              % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"u": pa.array(uid), "kp": pa.array(kp)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["u"].to_numpy(np.int64))
        arm = np.fromiter(
            (int(hashlib.md5(str(int(x)).encode()).hexdigest()[:8], 16) % 2
             for x in u), dtype=np.int64, count=len(u))
        return pd.DataFrame({"n0": [int((arm == 0).sum())],
                             "n1": [int((arm == 1).sum())]})

    agg = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("kp").map_groups(fold, batch_format="pandas")
           .aggregate(Sum("n0", alias_name="n0"),
                      Sum("n1", alias_name="n1")))
    n0, n1 = int(agg["n0"]), int(agg["n1"])
    chi2 = float((n0 - n1) * (n0 - n1)) / float(n0 + n1)
    return pa.table({
        "n0": pa.array([n0], pa.int64()),
        "n1": pa.array([n1], pa.int64()),
        "chi2": pa.array([np.round(chi2, 6)], pa.float64()),
        "srm_flag": pa.array([1 if chi2 > 3.841 else 0], pa.int64())})


SQL_SRM_CHECK = """
WITH u AS (
  SELECT DISTINCT user_id,
    CAST(CONCAT('0x', SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 8))
         AS BIGINT) % 2 AS arm
  FROM events
), c AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM u
)
SELECT n0, n1,
  ROUND(CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
        / CAST(n0 + n1 AS DOUBLE), 6) AS chi2,
  CAST(CASE WHEN CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                 / CAST(n0 + n1 AS DOUBLE) > 3.841
       THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM c
"""


ROUNDFIVE_QUERIES = {
    "srm_check": (q_srm_check, SQL_SRM_CHECK),
    "diff_in_diff": (q_diff_in_diff, SQL_DIFF_IN_DIFF),
    "jackknife_ratio": (q_jackknife_ratio, SQL_JACKKNIFE_RATIO),
    "dedup_transitivity": (q_dedup_transitivity, SQL_DEDUP_TRANSITIVITY),
    "volatility": (q_volatility, SQL_VOLATILITY),
    "attribution_window": (q_attribution_window, SQL_ATTRIBUTION_WINDOW),
    "price_trend_parts": (q_price_trend_parts, SQL_PRICE_TREND_PARTS),
    "jaccard_histogram": (q_jaccard_histogram, SQL_JACCARD_HISTOGRAM),
    "ratio_ci": (q_ratio_ci, SQL_RATIO_CI),
    "gains_curve": (q_gains_curve, SQL_GAINS_CURVE),
    "ri_audit": (q_ri_audit, SQL_RI_AUDIT),
    "prefix_collision": (q_prefix_collision, SQL_PREFIX_COLLISION),
    "feature_matrix": (q_feature_matrix, SQL_FEATURE_MATRIX),
    "cvar": (q_cvar, SQL_CVAR),
    "best_week": (q_best_week, SQL_BEST_WEEK),
    "weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "ppr": (q_ppr, None),
    "retrieval_mrr": (q_retrieval_mrr, SQL_RETRIEVAL_MRR),
    "dataset_card": (q_dataset_card, SQL_DATASET_CARD),
    "mix_ess": (q_mix_ess, SQL_MIX_ESS),
    "keyness": (q_keyness, SQL_KEYNESS),
    "brand_breadth": (q_brand_breadth, SQL_BRAND_BREADTH),
    "cross_correlation": (q_cross_correlation, SQL_CROSS_CORRELATION),
    "token_burstiness": (q_token_burstiness, SQL_TOKEN_BURSTINESS),
    "path_cardinality": (q_path_cardinality, SQL_PATH_CARDINALITY),
    "type_overlap": (q_type_overlap, SQL_TYPE_OVERLAP),
    "purchase_index_curve": (q_purchase_index_curve,
                             SQL_PURCHASE_INDEX_CURVE),
    "two_way_effects": (q_two_way_effects, SQL_TWO_WAY_EFFECTS),
    "qty_discount_grid": (q_qty_discount_grid, SQL_QTY_DISCOUNT_GRID),
    "winback_rate": (q_winback_rate, SQL_WINBACK_RATE),
    "lag_consistency": (q_lag_consistency, SQL_LAG_CONSISTENCY),
    "type_runs": (q_type_runs, SQL_TYPE_RUNS),
    "order_islands": (q_order_islands, SQL_ORDER_ISLANDS),
    "simpson_check": (q_simpson_check, SQL_SIMPSON_CHECK),
    "share_of_parent": (q_share_of_parent, SQL_SHARE_OF_PARENT),
    "max_drawdown": (q_max_drawdown, SQL_MAX_DRAWDOWN),
    "hapax_ratio": (q_hapax_ratio, SQL_HAPAX_RATIO),
    "copurchase_pairs": (q_copurchase_pairs, SQL_COPURCHASE_PAIRS),
    "hill_tail": (q_hill_tail, SQL_HILL_TAIL),
    "session_entropy": (q_session_entropy, SQL_SESSION_ENTROPY),
    "engagement_breadth": (q_engagement_breadth, SQL_ENGAGEMENT_BREADTH),
    "aging_report": (q_aging_report, SQL_AGING_REPORT),
    "forecast_backtest": (q_forecast_backtest, SQL_FORECAST_BACKTEST),
    "new_vs_returning": (q_new_vs_returning, SQL_NEW_VS_RETURNING),
    "peak_days": (q_peak_days, SQL_PEAK_DAYS),
    "gap_histogram": (q_gap_histogram, SQL_GAP_HISTOGRAM),
    "wilson_ci": (q_wilson_ci, SQL_WILSON_CI),
    "lerp_fill": (q_lerp_fill, SQL_LERP_FILL),
    "modularity": (q_modularity, SQL_MODULARITY),
    "k_anonymity": (q_k_anonymity, SQL_K_ANONYMITY),
    "orc_roundtrip": (q_orc_roundtrip, SQL_ORC_ROUNDTRIP),
    "ipc_roundtrip": (q_ipc_roundtrip, SQL_IPC_ROUNDTRIP),
    "dup_size_hist": (q_dup_size_hist, SQL_DUP_SIZE_HIST),
    "dup_source_matrix": (q_dup_source_matrix, SQL_DUP_SOURCE_MATRIX),
    "dedup_savings": (q_dedup_savings, SQL_DEDUP_SAVINGS),
    "abc_pareto": (q_abc_pareto, SQL_ABC_PARETO),
    "click_abandonment": (q_click_abandonment, SQL_CLICK_ABANDONMENT),
    "centroid_distances": (q_centroid_distances, SQL_CENTROID_DISTANCES),
    "degree_assortativity": (q_degree_assortativity,
                             SQL_DEGREE_ASSORTATIVITY),
    "customer_migration": (q_customer_migration, SQL_CUSTOMER_MIGRATION),
    "residual_outliers": (q_residual_outliers, SQL_RESIDUAL_OUTLIERS),
    "linear_attribution": (q_linear_attribution, SQL_LINEAR_ATTRIBUTION),
    "readability": (q_readability, SQL_READABILITY),
    "elasticity": (q_elasticity, SQL_ELASTICITY),
    "containment_join": (q_containment_join, SQL_CONTAINMENT_JOIN),
    "char_xentropy": (q_char_xentropy, SQL_CHAR_XENTROPY),
    "weighted_projection": (q_weighted_projection, SQL_WEIGHTED_PROJECTION),
    "decay_score": (q_decay_score, SQL_DECAY_SCORE),
    "seasonal_decompose": (q_seasonal_decompose, SQL_SEASONAL_DECOMPOSE),
    "stickiness": (q_stickiness, SQL_STICKINESS),
    "dow_hour_heatmap": (q_dow_hour_heatmap, SQL_DOW_HOUR_HEATMAP),
    "partition_skew": (q_partition_skew, SQL_PARTITION_SKEW),
    "ols_two": (q_ols_two, SQL_OLS_TWO),
    "oov_rate": (q_oov_rate, SQL_OOV_RATE),
    "poisson_rate": (q_poisson_rate, SQL_POISSON_RATE),
    "clustering_coeff": (q_clustering_coeff, SQL_CLUSTERING_COEFF),
    "emb_truncation": (q_emb_truncation, SQL_EMB_TRUNCATION),
    "ann_range": (q_ann_range, SQL_ANN_RANGE),
    "rolling_corr": (q_rolling_corr, SQL_ROLLING_CORR),
    "ohlc_weekly": (q_ohlc_weekly, SQL_OHLC_WEEKLY),
    "theil_index": (q_theil_index, SQL_THEIL_INDEX),
    "lorenz_deciles": (q_lorenz_deciles, SQL_LORENZ_DECILES),
}
