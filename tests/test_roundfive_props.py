"""Round-5 operator invariants — properties that hold by construction
and catch silent breakage the oracle comparison can't (conservation
laws, cross-operator consistency, planted recall).
"""

import math

import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as e

SF = "/root/testdata/sf0.001"


def _df(name, sf=SF):
    res = e.queries()[name](sf)
    try:
        return res.to_pandas()
    except AttributeError:
        return res


def test_linear_attribution_conserves_revenue(ray_session):
    """Equal-split attribution is a partition of purchase cents: the
    credited total must equal the purchase total to the cent."""
    import duckdb

    got = _df("linear_attribution")
    con = duckdb.connect()
    total = con.execute(
        f"SELECT CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) "
        f"FROM '{SF}/events.parquet' WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert int(got["cents"].sum()) == int(total)


def test_lorenz_deciles_partition_and_order(ray_session):
    """Deciles partition the customers; shares sum to 1 within 6-dp
    rounding; decile 1 (top revenue) dominates decile 10."""
    got = _df("lorenz_deciles").sort_values("decile")
    assert list(got["decile"]) == list(range(1, 11))
    assert abs(float(got["share"].sum()) - 1.0) < 1e-5
    assert int(got["cents"].iloc[0]) > int(got["cents"].iloc[-1])


def test_dup_matrix_consistent_with_size_hist(ray_session):
    """Cross-operator conservation: total duplicate PAIRS in the
    source matrix must equal sum over clusters of C(size, 2) from the
    size histogram — two independent plans over the same exchange."""
    mat = _df("dup_source_matrix", "/root/testdata/sf0.01")
    hist = _df("dup_size_hist", "/root/testdata/sf0.01")
    pairs_mat = int(mat["pairs"].sum())
    pairs_hist = int(sum(n * (s * (s - 1) // 2)
                         for s, n in zip(hist["size"], hist["n_clusters"])))
    assert pairs_mat == pairs_hist


def test_containment_planted_recall(ray_session):
    """Every planted first-half sub-doc (offset 1e6) with enough
    shingles must be found contained (cont == 1.0) in its parent —
    the asymmetric prefix filter may not lose a single planted pair."""
    import re

    import duckdb

    got = _df("containment_join")
    found = {(int(a), int(b)): float(c)
             for a, b, c in zip(got["doc_a"], got["doc_b"], got["cont"])}
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        f"WHERE doc_id < 300").df()
    split = re.compile("[^a-z]+")
    n_expected = 0
    for did, text in zip(docs["doc_id"], docs["text"]):
        w = [t for t in split.split((text or "").lower()) if t]
        sub = w[:len(w) // 2]
        sh_sub = {" ".join(sub[j:j + 3]) for j in range(len(sub) - 2)}
        sh_full = {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}
        if not sh_sub or not sh_full:
            continue
        n_expected += 1
        key = (int(did) + 1_000_000, int(did))
        assert key in found, f"planted pair {key} missing"
        # sub's shingles are a subset of full's → containment 1.0
        assert found[key] == 1.0
    assert n_expected > 50  # the fixture actually exercises the planted path


def test_modularity_in_valid_range(ray_session):
    got = _df("modularity")
    q = float(got["modularity"].iloc[0])
    assert -0.5 <= q <= 1.0


def test_wilson_ci_brackets_point_estimate(ray_session):
    got = _df("wilson_ci")
    for _, r in got.iterrows():
        p = r["c"] / r["n"]
        assert r["lo"] <= p <= r["hi"]
        assert 0.0 <= r["lo"] <= r["hi"] <= 1.0


def test_decay_score_bounded_by_raw_revenue(ray_session):
    """Decay weights are <= 1, so every score is bounded by the
    customer's raw revenue; and a customer with only newest-bucket
    orders scores exactly their revenue."""
    import duckdb

    got = _df("decay_score").set_index("ck")["score"]
    con = duckdb.connect()
    raw = con.execute(
        f"SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) "
        f"AS BIGINT)) AS BIGINT) AS c FROM '{SF}/orders.parquet' "
        f"GROUP BY 1").df().set_index("o_custkey")["c"]
    for ck, score in got.items():
        assert score <= raw[ck] + 1e-6


def test_ohlc_weekly_invariants(ray_session):
    got = _df("ohlc_weekly")
    assert (got["low"] <= got["open"]).all()
    assert (got["low"] <= got["close"]).all()
    assert (got["open"] <= got["high"]).all()
    assert (got["close"] <= got["high"]).all()
    assert (got["n"] >= 1).all()


def test_abc_pareto_partitions_revenue(ray_session):
    got = _df("abc_pareto")
    assert abs(float(got["share"].sum()) - 1.0) < 1e-5
    # A-class revenue share is the largest by construction at any
    # non-degenerate distribution
    byc = got.set_index("cls")
    if "A" in byc.index and "C" in byc.index:
        assert byc.loc["A", "cents"] >= byc.loc["C", "cents"]


def test_hapax_distributed_branch_equal(ray_session, monkeypatch):
    """Forcing the kp-exchange fallback (driver limit 0) must produce
    the exact same table as the guarded bounded driver fold."""
    fast = _df("hapax_ratio").sort_values("source", ignore_index=True)
    monkeypatch.setenv("CRAWLRAY_HAPAX_DRIVER_LIMIT", "0")
    slow = _df("hapax_ratio").sort_values("source", ignore_index=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_ppr_matches_independent_power_iteration(ray_session):
    """ppr's top-20 must equal an independent dense recomputation of
    personalized PageRank on the same edge set, and its full score
    vector must conserve probability mass."""
    import duckdb

    got = _df("ppr")
    con = duckdb.connect()
    edges = con.execute(f"""
        WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                    FROM '{SF}/lineitem.parquet' WHERE l_partkey < 200)
        SELECT DISTINCT a.s AS u, b.s AS v
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s""").df()
    nodes = np.unique(edges[["u", "v"]].to_numpy())
    n = len(nodes)
    idx = {int(x): i for i, x in enumerate(nodes)}
    a = np.zeros((n, n))
    for u, v in edges.to_numpy():
        a[idx[int(u)], idx[int(v)]] = 1.0
        a[idx[int(v)], idx[int(u)]] = 1.0
    w = a / a.sum(axis=1)[:, None]
    r = np.zeros(n)
    r[0] = 1.0
    e = r.copy()
    for _ in range(20):
        r = 0.15 * e + 0.85 * (r @ w)
    assert abs(r.sum() - 1.0) < 1e-9            # mass conserved
    order = np.lexsort((nodes, -np.round(r, 6)))[:20]
    assert list(got["node"]) == [int(nodes[i]) for i in order]
    assert list(got["score"]) == [float(np.round(r[i], 6))
                                  for i in order]
