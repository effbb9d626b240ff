"""Round-4 ADVICE regression pins: each test builds the exact degenerate
input the advisor described and proves engine == oracle (or the guarded
error) — so the fixes can't silently regress.

1. last_touch: event_id >= 1e6 + near-simultaneous events — the old
   packed ts*1e6+event_id oracle key misordered these; the tuple-order
   oracle must agree with the engine's (ts, event_id) lexicographic cut.
2. brand_margin: a brand with zero lineitem rows must be omitted (not
   ZeroDivisionError), matching the oracle's inner join.
3. dup_ratio_by_source: NULL text must not crash np.unique and must
   group with '' on BOTH sides (COALESCE convention).
4. cross_label_match: a probe whose label matches every candidate is
   dropped, matching the oracle's empty join (no -inf sentinel rows).
5. prop_ztest: a one-arm split raises an explicit error, not KeyError.
"""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as e

from tests.test_driver_contract import _normalize, _to_pandas


def _events(rows):
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(pd.to_datetime([r[1] for r in rows], unit="us"),
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })


def _compare(name, sf_dir):
    got = _normalize(_to_pandas(e.queries()[name](str(sf_dir))))
    con = duckdb.connect()
    for t in ["events", "documents", "embeddings", "part", "lineitem"]:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    want = _normalize(con.execute(e.oracle_sql()[name]).df())
    pd.testing.assert_frame_equal(got, want)
    return got


def test_last_touch_large_event_ids_same_microsecond(ray_session, tmp_path):
    # user 1: purchase at T (eid 1_000_001); 'click' 1 us earlier with
    # eid 5_000_000 (the packed key would push it AFTER the purchase);
    # 'view' 3 us earlier. True last touch is 'click'.
    T = 1_700_000_000_000_000
    rows = [
        (1, T - 3, 1, "view", 0.0),
        (5_000_000, T - 1, 1, "click", 0.0),
        (1_000_001, T, 1, "purchase", 10.0),
        # user 2: two purchases in the same microsecond, eids straddling
        # 1e6 — the cut must pick eid-max, and the touch just before it.
        (2, T - 2, 2, "click", 0.0),
        (3, T, 2, "purchase", 5.0),
        (7_000_000, T, 2, "purchase", 7.0),
    ]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(_events(rows), str(d / "events.parquet"))
    got = _compare("last_touch", d)
    assert set(got["last_type"]) == {"click"}
    assert float(got.loc[got["last_type"] == "click", "revenue"].sum()) \
        == 22.0


def test_brand_margin_untouched_brand_omitted(ray_session, tmp_path):
    part = pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["Brand#A", "Brand#Z"], pa.string()),
        "p_retailprice": pa.array([100.0, 50.0], pa.float64()),
    })
    li = pa.table({
        "l_partkey": pa.array([1, 1], pa.int64()),
        "l_quantity": pa.array([2.0, 3.0], pa.float64()),
        "l_extendedprice": pa.array([180.0, 270.0], pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(part, str(d / "part.parquet"))
    pq.write_table(li, str(d / "lineitem.parquet"))
    got = _compare("brand_margin", d)
    # Brand#Z has no lineitem rows: no row, no ZeroDivisionError
    assert list(got["brand"]) == ["Brand#A"]
    # unit_price is in cents on both sides: 45000 cents / 5 units
    assert got["unit_price"].iloc[0] == 9000.0
    assert got["realized_ratio"].iloc[0] == 0.9


def test_dup_ratio_null_text_groups_with_empty(ray_session, tmp_path):
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([None, "", "x", "x"], pa.string()),
        "source": pa.array(["a", "b", "a", "b"], pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    got = _compare("dup_ratio_by_source", d)
    # NULL ≡ '' convention: every doc is a duplicate of something
    assert list(got["dup_ratio"]) == [1.0, 1.0]


def test_cross_label_match_all_masked_probe_dropped(ray_session, tmp_path):
    def emb_table(labels):
        rng = np.random.RandomState(3)
        vecs = rng.randn(len(labels), 4).astype(np.float32)
        return pa.table({
            "vec_id": pa.array(range(len(labels)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        })

    # all-same-label: every probe masks every candidate → 0 rows, no
    # -inf/INT64_MAX sentinel rows, matching the oracle's empty join
    # (schema comparison is skipped: an empty Dataset's to_pandas drops
    # columns, so compare row counts directly)
    d1 = tmp_path / "same"
    d1.mkdir()
    pq.write_table(emb_table([1, 1, 1]), str(d1 / "embeddings.parquet"))
    got = _to_pandas(e.queries()["cross_label_match"](str(d1)))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{d1 / 'embeddings.parquet'}'")
    want = con.execute(e.oracle_sql()["cross_label_match"]).df()
    assert len(got) == 0 and len(want) == 0

    # mixed labels: all probes survive and match the oracle exactly
    d2 = tmp_path / "mixed"
    d2.mkdir()
    pq.write_table(emb_table([1, 1, 1, 2]), str(d2 / "embeddings.parquet"))
    got = _compare("cross_label_match", d2)
    assert len(got) == 4


def test_prop_ztest_degenerate_arm_raises(ray_session, tmp_path):
    # pick user ids that all hash into md5-arm 0
    uids = [u for u in range(1, 400)
            if int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
            % 2 == 0][:5]
    T = 1_700_000_000_000_000
    rows = [(i + 1, T + i, u, "purchase", 200.0)
            for i, u in enumerate(uids)]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(_events(rows), str(d / "events.parquet"))
    with pytest.raises(ValueError, match="degenerate arm split"):
        e.queries()["prop_ztest"](str(d))
