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


ROUNDFIVE_QUERIES = {
    "clustering_coeff": (q_clustering_coeff, SQL_CLUSTERING_COEFF),
    "emb_truncation": (q_emb_truncation, SQL_EMB_TRUNCATION),
    "ann_range": (q_ann_range, SQL_ANN_RANGE),
    "rolling_corr": (q_rolling_corr, SQL_ROLLING_CORR),
    "ohlc_weekly": (q_ohlc_weekly, SQL_OHLC_WEEKLY),
    "theil_index": (q_theil_index, SQL_THEIL_INDEX),
    "lorenz_deciles": (q_lorenz_deciles, SQL_LORENZ_DECILES),
}
