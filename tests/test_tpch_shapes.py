"""TPC-H-shape widening pins (pipelines/tpch.py) beyond the DuckDB
contract rows: forced-fallback equality for the guarded broadcast
lookups, and the exact-integer threshold argument important_parts
relies on.

Threshold proof pinned here (see q_important_parts): for positive ints
v, g, n the cut v·2n > 3g is equivalent to v > (3g)//(2n). Let
q = (3g)//(2n) and r = 3g mod 2n (0 ≤ r < 2n). If v ≥ q+1 then
v·2n ≥ 2nq + 2n = 3g − r + 2n > 3g. If v ≤ q then v·2n ≤ 2nq = 3g − r
≤ 3g, never strictly greater. Hence both sides keep exactly {v > q}.
"""

import os

import numpy as np
import pandas as pd
import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res.sort_values(list(res.columns), ignore_index=True)


@pytest.mark.parametrize("qname", ["local_supplier_volume",
                                   "nation_trade_volume",
                                   "market_share",
                                   "returned_item_losses",
                                   "supplier_part_counts",
                                   "late_shipment_priority",
                                   "small_qty_revenue",
                                   "nation_profit",
                                   "min_cost_supplier",
                                   "dominant_supplier",
                                   "priority_line_classes"])
def test_forced_join_fallback_equals_broadcast(ray_session, monkeypatch,
                                               qname):
    """The >5M-key Dataset.join path must produce byte-identical output
    to the broadcast-lookup fast path it guards."""
    import crawlray.pipelines.relational as rel
    from crawlray.pipelines import tpch

    fn = tpch.TPCH_QUERIES[qname][0]
    fast = _df(fn(SF_DIR))
    monkeypatch.setattr(rel, "_BROADCAST_KEY_LIMIT", 1)
    slow = _df(fn(SF_DIR))
    pd.testing.assert_frame_equal(fast, slow)


def test_important_parts_integer_threshold_property():
    """v·2n > 3g  ⇔  v > (3g)//(2n) on random positive ints, including
    the r == 0 boundary the floor argument must get right."""
    rng = np.random.default_rng(7)
    for _ in range(2000):
        n = int(rng.integers(1, 1000))
        g = int(rng.integers(1, 10**12))
        q = (3 * g) // (2 * n)
        for v in (q - 1, q, q + 1, int(rng.integers(1, 10**10))):
            if v <= 0:
                continue
            assert (v * 2 * n > 3 * g) == (v > q)
    # exact-divisibility boundary: 3g == 2n·q exactly
    n, q = 6, 11
    g = (2 * n * q) // 3  # 3g = 2n·q
    assert 3 * g == 2 * n * q
    assert not (q * 2 * n > 3 * g) and not (q > (3 * g) // (2 * n))


def test_important_parts_schema_stable_when_empty(ray_session, monkeypatch):
    """A zero-qualifier run must keep (l_partkey, value_c4) int64 —
    Ray drops schema on empty Datasets, which the typed pull prevents."""
    from crawlray.pipelines.tpch import q_important_parts

    out = _df(q_important_parts("/root/testdata/sf0.001"))
    assert list(out.columns) == ["l_partkey", "value_c4"]
    assert str(out["l_partkey"].dtype) == "int64"
    assert str(out["value_c4"].dtype) == "int64"


def test_bfs_hops_packing_bounds(ray_session):
    """bfs_hops packs (src, dst) into one int64; the guard must hold on
    the synthetic domain (src < 2^31, dst < 2^32) and the result must
    include the seed at hop 0."""
    from crawlray.pipelines.tpch import q_bfs_hops

    out = _df(q_bfs_hops(SF_DIR))
    assert (out.loc[out["node"] == 3, "hop"] == 0).all()
    assert out["hop"].between(0, 4).all()
    assert out["node"].min() >= 0
