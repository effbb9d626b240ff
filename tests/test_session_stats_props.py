"""Property pins for the fifteenth-session statistics family — the
invariances that an oracle sharing the same inputs cannot witness:
monotone-transform invariance of rank statistics, sign symmetry,
bounds, and clamp-identity of the Lindley scan.

All tests build tiny synthetic parquet dirs and call the REGISTERED
queries (same code path as the driver), with block sizes forced small
so the distributed folds actually exercise multi-block seams.
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events_dir(tmp_path, vals, types, name="sf"):
    n = len(vals)
    d = tmp_path / name
    d.mkdir()
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            pd.to_datetime(np.arange(n, dtype=np.int64) * 3_600_000_000
                           + 1_600_000_000_000_000, unit="us")),
        "user_id": pa.array((np.arange(n, dtype=np.int64) % 7)),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(np.asarray(vals, np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def _small_blocks():
    import ray.data

    ctx = ray.data.DataContext.get_current()
    prev = ctx.target_max_block_size
    ctx.target_max_block_size = 2048
    return ctx, prev


def test_mann_whitney_monotone_invariance(ray_session, tmp_path):
    """U depends only on ranks: applying a strictly increasing
    transform (x -> 3x + 7) to every value leaves (u1, z) unchanged."""
    import __ray_entry__ as e

    rng = np.random.RandomState(3)
    vals = np.round(rng.gamma(2.0, 40.0, 600), 2)
    types = np.where(np.arange(600) % 2 == 0, "purchase", "click")
    ctx, prev = _small_blocks()
    try:
        a = e.queries()["mann_whitney"](
            _events_dir(tmp_path, vals, types, "a")).to_pandas()
        b = e.queries()["mann_whitney"](
            _events_dir(tmp_path, vals * 3.0 + 7.0, types, "b")).to_pandas()
    finally:
        ctx.target_max_block_size = prev
    assert int(a["u1"][0]) == int(b["u1"][0])
    assert float(a["z"][0]) == float(b["z"][0])


def test_ks_identical_distributions_is_small_and_bounded(ray_session,
                                                         tmp_path):
    """D in [0, 1]; two arms drawn as interleaved copies of the SAME
    values give D == 0 exactly (every ECDF step matches)."""
    import __ray_entry__ as e

    vals = np.tile(np.round(np.linspace(1.0, 99.0, 250), 2), 2)
    types = np.array(["purchase"] * 250 + ["view"] * 250)
    ctx, prev = _small_blocks()
    try:
        r = e.queries()["ks_test"](
            _events_dir(tmp_path, vals, types)).to_pandas()
    finally:
        ctx.target_max_block_size = prev
    assert float(r["d"][0]) == 0.0
    assert int(r["n1"][0]) == int(r["n2"][0]) == 250


def test_kendall_tau_bounds_and_antisymmetry(ray_session, tmp_path):
    """tau in [-1, 1]; negating the association (value -> max - value)
    flips the sign of C - D exactly (hours untouched, ties preserved
    because the cent map is injective under the reflection)."""
    import __ray_entry__ as e

    rng = np.random.RandomState(11)
    vals = np.round(rng.uniform(1.0, 400.0, 500), 2)
    types = np.array(["view"] * 500)
    ctx, prev = _small_blocks()
    try:
        a = e.queries()["kendall_tau"](
            _events_dir(tmp_path, vals, types, "a")).to_pandas()
        b = e.queries()["kendall_tau"](
            _events_dir(tmp_path, np.round(400.01 - vals, 2), types,
                        "b")).to_pandas()
    finally:
        ctx.target_max_block_size = prev
    assert -1.0 <= float(a["tau"][0]) <= 1.0
    assert int(a["cd"][0]) == -int(b["cd"][0])
    assert float(a["tau"][0]) == -float(b["tau"][0])


def test_capped_running_total_matches_sequential_clamp(ray_session,
                                                       tmp_path):
    """The Lindley-identity scan equals the literal sequential
    recursion b_t = max(0, b_{t-1} + d_t) per user."""
    import __ray_entry__ as e

    rng = np.random.RandomState(5)
    vals = np.round(rng.uniform(0.5, 50.0, 400), 2)
    types = np.where(rng.rand(400) < 0.5, "purchase", "click")
    d = _events_dir(tmp_path, vals, types)
    ctx, prev = _small_blocks()
    try:
        got = e.queries()["capped_running_total"](d).to_pandas()
    finally:
        ctx.target_max_block_size = prev
    df = pd.DataFrame({
        "event_id": np.arange(400, dtype=np.int64),
        "user_id": np.arange(400, dtype=np.int64) % 7,
        "d": np.where(types == "purchase",
                      np.round(vals * 100).astype(np.int64),
                      -np.round(vals * 100).astype(np.int64)),
    })
    want = {}
    for uid, g in df.groupby("user_id"):
        bal = 0
        for _, r in g.sort_values("event_id").iterrows():
            bal = max(0, bal + int(r["d"]))
            want[int(r["event_id"])] = round(bal / 100.0, 6)
    got_map = dict(zip(got["event_id"].astype(int),
                       got["balance"].astype(float)))
    assert got_map == pytest.approx(want)


def test_roc_auc_perfect_and_random_separation(ray_session, tmp_path):
    """AUC == 1 when every positive outranks every negative; reversing
    the labels gives exactly 1 - AUC (complement identity)."""
    import __ray_entry__ as e

    d = tmp_path / "docs"
    d.mkdir()
    n = 300
    lang = np.where(np.arange(n) < 100, "en", "nl")
    n_chars = np.where(np.arange(n) < 100, 5000 + np.arange(n),
                       100 + np.arange(n))
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["woord"] * n, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array(n_chars.astype(np.int64)),
    }), str(d / "documents.parquet"))
    r = __import__("__ray_entry__").queries()["roc_auc"](str(d)).to_pandas()
    assert float(r["auc"][0]) == 1.0
    assert int(r["n_pos"][0]) == 100 and int(r["n_neg"][0]) == 200
