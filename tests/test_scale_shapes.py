"""Tests for the round-2 scale-shape fixes (VERDICT r1 items #1/#4/#5/
#6/#7): quantile-from-histogram exactness, ANN partial-top-k / bucketed
probe correctness, semi/anti join fallback path, LSH bucket cap.
"""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_quantile_disc_from_hist_matches_numpy():
    from crawlray.pipelines.relational import quantile_disc_from_hist

    rng = np.random.default_rng(7)
    for _ in range(300):
        n = int(rng.integers(1, 400))
        # duplicate-heavy draws so the histogram path is exercised
        raw = rng.integers(0, 40, size=n).astype(np.float64) * 1.5
        v, c = np.unique(raw, return_counts=True)
        full = np.sort(raw)
        for q in (0.25, 0.5, 0.9, 0.95, 1.0):
            want = float(np.quantile(full, q, method="inverted_cdf"))
            got = quantile_disc_from_hist(v, c, q)
            assert got == want, (n, q, got, want)


def _brute_cos(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"])
    emb = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()])
    q = emb[ids == 0][0]
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(emb, axis=1)
    cos = (emb @ qn) / np.where(norms == 0, 1.0, norms)
    return dict(zip(ids.tolist(), cos.tolist()))


def test_ann_lsh_scores_exact_and_ordered(ray_session):
    """The bucketed probe is approximate in WHICH ids it returns, but the
    scores it reports must be the exact cosine for those ids, in
    descending order, and the probe must return a full top-5."""
    from crawlray.pipelines.dataops import q_ann_lsh

    out = q_ann_lsh(SF_DIR).to_pandas()
    assert len(out) == 5
    assert (out["cos"].to_numpy()[:-1] >= out["cos"].to_numpy()[1:]).all()
    truth = _brute_cos(SF_DIR)
    for vid, cos in zip(out["vec_id"], out["cos"]):
        assert cos == pytest.approx(round(truth[int(vid)], 6), abs=1e-9)
        assert int(vid) != 0


def test_ann_lsh_index_reads_subset_only(ray_session):
    """The probe must NOT scan the whole corpus: the union of probed
    bucket dirs is a strict subset of the index rows. The bucket →
    files mapping comes from the build-time manifest, not a directory
    listing (VERDICT r2 item #6)."""
    from crawlray.pipelines.dataops import _ann_lsh_index, _ann_lsh_manifest

    idx = _ann_lsh_index(SF_DIR)
    buckets = _ann_lsh_manifest(idx)["buckets"]
    n_total = pq.read_metadata(
        os.path.join(SF_DIR, "embeddings.parquet")).num_rows
    per_bucket = {
        sig: sum(pq.read_metadata(os.path.join(idx, rel)).num_rows
                 for rel in rels)
        for sig, rels in buckets.items()
    }
    assert sum(per_bucket.values()) == n_total  # index is a partition
    assert len(buckets) > 8  # signatures actually spread


def test_ann_lsh_shared_root_no_listdir_probe(ray_session, tmp_path,
                                              monkeypatch):
    """Multi-node shape (VERDICT r2 item #6): the index builds under
    CRAWLRAY_INDEX_ROOT (shared storage stand-in, not the hardcoded
    /tmp default), and once built, the PROBE path never enumerates
    directories — os.listdir is forbidden during q_ann_lsh."""
    import crawlray.pipelines.dataops as d

    root = str(tmp_path / "shared" / "indexes")
    monkeypatch.setenv("CRAWLRAY_INDEX_ROOT", root)
    idx = d._ann_lsh_index(SF_DIR)  # build (may listdir — single writer)
    assert idx.startswith(root)
    real_listdir = os.listdir

    def forbidden(*a, **k):
        raise AssertionError("os.listdir called in the probe path")

    monkeypatch.setattr(os, "listdir", forbidden)
    try:
        out = d.q_ann_lsh(SF_DIR).to_pandas()
    finally:
        monkeypatch.setattr(os, "listdir", real_listdir)
    assert len(out) == 5
    truth = _brute_cos(SF_DIR)
    for vid, cos in zip(out["vec_id"], out["cos"]):
        assert cos == pytest.approx(round(truth[int(vid)], 6), abs=1e-9)


def test_semi_anti_join_fallback_path(ray_session, monkeypatch):
    """Force the big-build-side branch and check it matches the
    broadcast fast path."""
    import crawlray.pipelines.relational as rel

    fast_semi = rel.q_semi_join(SF_DIR).to_pandas()
    fast_anti = rel.q_anti_join(SF_DIR).to_pandas()
    monkeypatch.setattr(rel, "_BROADCAST_KEY_LIMIT", 1)
    slow_semi = rel.q_semi_join(SF_DIR).to_pandas()
    slow_anti = rel.q_anti_join(SF_DIR).to_pandas()

    def norm(df):
        return df.sort_values(list(df.columns), ignore_index=True)

    pd.testing.assert_frame_equal(norm(fast_semi), norm(slow_semi))
    pd.testing.assert_frame_equal(norm(fast_anti), norm(slow_anti))


def test_dynamic_pruning_join_fallback_equal(ray_session, monkeypatch):
    """Force dynamic_pruning past the broadcast guard and check the
    hash-semi-join branch equals the isin-pushdown fast path."""
    import crawlray.pipelines.analytics as ana
    import crawlray.pipelines.relational as rel

    fast = ana.q_dynamic_pruning(SF_DIR).to_pandas()
    monkeypatch.setattr(rel, "_BROADCAST_KEY_LIMIT", 0)
    slow = ana.q_dynamic_pruning(SF_DIR).to_pandas()
    pd.testing.assert_frame_equal(fast, slow)


def test_lsh_bucket_cap_truncates():
    """A bucket larger than the cap emits exactly cap·(cap−1)/2 pairs of
    the LOWEST doc_ids; small buckets emit full all-pairs; singletons
    emit nothing."""
    from crawlray.pipelines.dataops import _LSH_BUCKET_CAP, bucket_pairs

    cap = _LSH_BUCKET_CAP
    n = cap + 40
    df = pd.DataFrame({
        "band_id": np.concatenate([np.zeros(n), np.ones(3), [2]]).astype(np.int64),
        "band_hash": np.zeros(n + 4, dtype=np.int64),
        "doc_id": np.concatenate([
            np.arange(n)[::-1],          # hot bucket, unsorted on purpose
            [100, 101, 102],             # small bucket → 3 pairs
            [999],                       # singleton → none
        ]).astype(np.int64),
    })
    out = bucket_pairs(df)
    doc_a = (out["pairkey"].to_numpy() >> 32)
    doc_b = (out["pairkey"].to_numpy() & 0xFFFFFFFF)
    hot_mask = doc_a < 100
    assert hot_mask.sum() == cap * (cap - 1) // 2
    assert doc_b[hot_mask].max() == cap - 1       # lowest ids survive the cap
    small = sorted(zip(doc_a[~hot_mask].tolist(), doc_b[~hot_mask].tolist()))
    assert small == [(100, 101), (100, 102), (101, 102)]
    assert (doc_a < doc_b).all()


def test_ann_cosine_no_global_sort(ray_session):
    """Top-k comes from per-block partial top-k + a driver merge: the
    result is a plain Arrow table, proving no Dataset.sort (all-to-all)
    exists in the plan (VERDICT r1 item #5 'no all-to-all sort')."""
    import pyarrow as pa

    from crawlray.pipelines.dataops import q_ann_cosine

    out = q_ann_cosine(SF_DIR)
    assert isinstance(out, pa.Table)
    assert out.num_rows == 10
    cos = out["cos"].to_numpy()
    assert (cos[:-1] >= cos[1:]).all()


def test_simhash_neardup_recovers_planted(ray_session):
    """ZERO silent loss (VERDICT r2 item #7): the pipeline must recover
    EXACTLY the planted pairs that 4×16 banding can reach (≥1 equal
    band AND hamming ≤ 8, computed locally from the fingerprints) — the
    former hot-bucket truncation dropped ~6% of reachable pairs. Recall
    below that ceiling is banding-inherent (the perturbation moved the
    fingerprint > 3 bits), not a pipeline loss. Also: every reported
    pair within hamming 8, and the overall planted recall ≥ 0.9
    (measured banding ceiling ≈ 0.93 at sf0.1)."""
    import numpy as np

    from crawlray.functions.sketches import hamming64, simhash64
    from crawlray.pipelines.dataops import q_simhash_neardup

    df = q_simhash_neardup(SF_DIR).to_pandas()
    assert (df["hamming"] <= 8).all()
    planted = df[(df["doc_b"] - df["doc_a"]) == 1_000_000]
    n_docs = pq.read_metadata(
        os.path.join(SF_DIR, "documents.parquet")).num_rows

    # local oracle for the banding-reachable planted set
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    texts = t["text"].to_pylist()
    fp_orig = simhash64(texts).view(np.uint64)
    fp_pert = simhash64(
        [" ".join(x.split()[:-1]) for x in texts]).view(np.uint64)
    ham = hamming64(fp_orig.view(np.int64), fp_pert.view(np.int64))
    share_band = np.zeros(len(texts), dtype=bool)
    for i in range(4):
        mask = np.uint64(0xFFFF) << np.uint64(16 * i)
        share_band |= (fp_orig & mask) == (fp_pert & mask)
    reachable = set(
        np.asarray(t["doc_id"])[share_band & (ham <= 8)].tolist())

    got = set(planted["doc_a"].tolist())
    missing = reachable - got
    assert not missing, f"{len(missing)} banding-reachable pairs lost"
    assert len(planted) >= 0.9 * n_docs, (len(planted), n_docs)


def test_minhash_neardup_recovers_all_planted(ray_session):
    """The second-level hot-bucket split (subkey = next band) must keep
    every planted perturbed pair: 100% recall at this SF (was ~94%
    under plain truncation)."""
    from crawlray.pipelines.dataops import q_minhash_neardup

    df = q_minhash_neardup(SF_DIR).to_pandas()
    planted = df[(df["doc_b"] - df["doc_a"]) == 1_000_000]
    n_docs = pq.read_metadata(
        os.path.join(SF_DIR, "documents.parquet")).num_rows
    assert len(planted) == n_docs, (len(planted), n_docs)


def test_median_selection_bounded_driver_state(ray_session):
    """The 2-pass selection's pass-1 histogram must be bounded by
    price_range/_SEL_BUCKET per flag (never O(rows) or O(distinct)), and
    pass 2 must fetch only the target buckets' rows."""
    import pyarrow.dataset as pads

    from crawlray.pipelines.analytics import _SEL_BUCKET, q_median_selection

    t = pq.read_table(os.path.join(SF_DIR, "lineitem.parquet"),
                      columns=["l_returnflag", "l_extendedprice"])
    cents = np.round(np.asarray(t["l_extendedprice"]) * 100).astype(np.int64)
    n_buckets = len(np.unique(cents // _SEL_BUCKET))
    flags = np.unique(np.asarray(t["l_returnflag"]))
    # histogram width is bounded by the VALUE DOMAIN (price range /
    # _SEL_BUCKET), never by row count or distinct count — the property
    # that distinguishes this from the O(distinct) exact-quantile merge
    assert n_buckets <= cents.max() // _SEL_BUCKET + 1 < 4000
    out = q_median_selection(SF_DIR).to_pandas()
    assert set(out.columns) == {"l_returnflag", "median_price"}
    assert len(out) == len(flags)
    # exactness vs numpy (quantile_disc 0.5 = lower median, per flag)
    fl = np.asarray(t["l_returnflag"])
    for f in flags:
        vals = np.sort(cents[fl == f])
        k = (len(vals) - 1) // 2  # 0-based rank of quantile_disc(0.5)
        want = vals[k] / 100.0
        got = float(out.loc[out["l_returnflag"] == f, "median_price"].iloc[0])
        assert got == want, (f, got, want)


def test_quantile_cont_matches_numpy_linear(ray_session):
    """Interpolated percentiles equal numpy's 'linear' method (the same
    definition PERCENTILE_CONT uses) bit-for-bit on cents-recoded data."""
    from crawlray.pipelines.analytics import q_quantile_cont

    t = pq.read_table(os.path.join(SF_DIR, "lineitem.parquet"),
                      columns=["l_returnflag", "l_extendedprice"])
    prices = np.asarray(t["l_extendedprice"])
    fl = np.asarray(t["l_returnflag"])
    out = q_quantile_cont(SF_DIR).to_pandas()
    for f in np.unique(fl):
        vals = np.sort(np.round(prices[fl == f] * 100).astype(np.int64)) / 100.0
        for q, col in ((0.25, "p25"), (0.75, "p75")):
            n = len(vals)
            r = (n - 1) * q
            k = int(np.floor(r))
            frac = r - np.floor(r)
            hi = vals[k + 1] if frac > 0 and k + 1 < n else vals[k]
            want = vals[k] + frac * (hi - vals[k])
            got = float(out.loc[out["l_returnflag"] == f, col].iloc[0])
            assert got == want, (f, q, got, want)


def test_heavy_hitters_equals_word_freq_prefix(ray_session):
    """The candidate-set 2-pass top-k must equal the full-vocabulary
    groupby's top-k (same tokenization, same tie-break) — proving the
    per-block top-m candidate generation lost nothing on this corpus."""
    from crawlray.pipelines.dataops import q_heavy_hitters, q_word_freq

    hh = q_heavy_hitters(SF_DIR, k=20).to_pandas()
    wf = q_word_freq(SF_DIR, k=40).to_pandas().head(20).reset_index(drop=True)
    assert hh["token"].tolist() == wf["token"].tolist()
    assert hh["n"].tolist() == wf["n"].tolist()


def test_epoch_shuffle_deterministic_and_epoch_dependent(ray_session):
    """The epoch stream must be identical across re-runs (resumable
    ingest) and differ between epochs; every position maps to a real
    doc and no doc repeats within the head."""
    from crawlray.pipelines.dataops import q_epoch_shuffle

    a1 = q_epoch_shuffle(SF_DIR, epoch=1).to_pandas()
    a2 = q_epoch_shuffle(SF_DIR, epoch=1).to_pandas()
    b = q_epoch_shuffle(SF_DIR, epoch=2).to_pandas()
    assert a1["doc_id"].tolist() == a2["doc_id"].tolist()
    assert a1["doc_id"].tolist() != b["doc_id"].tolist()
    assert a1["doc_id"].is_unique
    assert a1["position"].tolist() == list(range(len(a1)))


def test_training_pipeline_lineage(ray_session):
    """The end-to-end curation pipeline must show honest lineage:
    doc counts monotonically non-increasing through quality→dedup→
    decontaminate, the planted exact duplicates halved away, the
    eval set gone, and packing compressing chunks into fewer bins."""
    from crawlray.pipelines.dataops import q_training_pipeline

    t = {r["stage"]: r["n"]
         for r in q_training_pipeline(SF_DIR).to_pylist()}
    assert t["input"] == 1000  # 500 docs + planted duplicate copy
    assert t["quality_gate"] < t["input"]  # the 8% gate really filters
    assert t["exact_dedup"] == t["quality_gate"] // 2  # dups halved
    assert t["decontaminate"] < t["exact_dedup"]  # eval set dropped
    assert t["chunks"] >= t["decontaminate"]  # explode, ≥1 chunk/doc
    assert 0 < t["packed_bins"] < t["chunks"]  # packing compresses


def test_training_pipeline_cuckoo_branch_equal(ray_session, monkeypatch):
    """Forcing the 100-TB dedup plan (cuckoo prefilter over drop ids +
    false-positive rescue, no corpus-sized keep-id broadcast) must give
    byte-identical lineage to the default broadcast path."""
    from crawlray.pipelines.dataops import q_training_pipeline

    base = q_training_pipeline(SF_DIR).to_pylist()
    monkeypatch.setenv("CRAWLRAY_TP_BROADCAST_LIMIT", "0")
    forced = q_training_pipeline(SF_DIR).to_pylist()
    assert forced == base
    """Per-group HLL distinct-token estimates must land within 5% of
    the exact per-source distinct counts (p=12 → ~1.6% std error)."""
    import duckdb

    from crawlray.pipelines.dataops import q_hll_by_group

    est = {r["source"]: r["approx_distinct_tokens"]
           for r in q_hll_by_group(SF_DIR).take_all()}
    exact = dict(duckdb.sql(f"""
        SELECT source, COUNT(DISTINCT token) FROM (
          SELECT source,
                 unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
          FROM read_parquet('{SF_DIR}/documents.parquet'))
        WHERE token <> '' GROUP BY source""").fetchall())
    assert set(est) == set(exact)
    for src, true in exact.items():
        assert abs(est[src] - true) <= max(0.05 * true, 2), \
            (src, est[src], true)


def test_compression_ratio_discriminates(ray_session):
    """The zlib quality signal must separate degenerate repetition from
    natural text: a synthetic all-same-token doc scores a strictly
    lower ratio than the minimum over the real corpus, and ratios are
    sane (0 < ratio ≤ ~1)."""
    import zlib

    from crawlray.pipelines.dataops import q_compression_ratio

    df = q_compression_ratio(SF_DIR).to_pandas()
    assert len(df) > 0
    assert (df["ratio"] > 0).all() and (df["ratio"] <= 1.5).all()
    junk = "spam " * 200
    junk_ratio = len(zlib.compress(junk.encode(), 6)) / len(junk)
    assert junk_ratio < df["ratio"].min()


def test_pack_sequences_invariants(ray_session):
    """Sample-packing invariants that must hold at ANY block
    partitioning: every document assigned to exactly one bin, no bin
    exceeds the token budget, and the overall fill factor beats the
    trivial one-doc-per-bin packing by a wide margin."""
    import duckdb

    from crawlray.pipelines.dataops import q_pack_sequences

    budget = 256
    df = q_pack_sequences(SF_DIR, budget=budget).to_pandas()
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert len(df) == n_docs
    assert df["doc_id"].is_unique
    per_bin = df.groupby("bin_id")["n_tokens"].sum()
    assert (per_bin <= budget).all(), per_bin.max()
    fill = df["n_tokens"].sum() / (len(per_bin) * budget)
    assert fill >= 0.5, fill  # docs are ≤99 tokens; FFD packs ≥2 per bin


def test_cms_freq_bounds(ray_session):
    """Count-min estimates must dominate the exact counts (one-sided
    error) and stay within ε·N of them (ε = e/width); the absent probe
    token's estimate is bounded the same way (true count 0)."""
    import duckdb

    from crawlray.pipelines.dataops import _CMS_PROBES, q_cms_freq

    est = {r["token"]: r["est_n"] for r in q_cms_freq(SF_DIR).to_pylist()}
    con = duckdb.connect()
    exact = dict(con.execute(f"""
        SELECT token, COUNT(*) FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
          FROM read_parquet('{SF_DIR}/documents.parquet'))
        WHERE token <> '' GROUP BY token""").fetchall())
    n_total = sum(exact.values())
    eps_n = (2.718281828 / 2048) * n_total
    for tok in _CMS_PROBES:
        true = exact.get(tok, 0)
        assert est[tok] >= true, (tok, est[tok], true)
        assert est[tok] <= true + eps_n, (tok, est[tok], true, eps_n)


def test_heavy_hitters_uncertifiable_cut_falls_back_exactly(
        ray_session, monkeypatch):
    """With the candidate width squeezed to 1 the missed-token ceiling
    T = Σ cap_b exceeds the k-th count, the runtime proof fails, and
    the query must fall back to the full-vocabulary plan — returning
    the exact answer anyway (wrong answers are never an option)."""
    import crawlray.pipelines.dataops as d

    monkeypatch.setattr(d, "_HH_PER_BLOCK", 1)
    hh = d.q_heavy_hitters(SF_DIR, k=20).to_pandas()
    wf = d.q_word_freq(SF_DIR, k=40).to_pandas().head(20).reset_index(drop=True)
    assert hh["token"].tolist() == wf["token"].tolist()
    assert hh["n"].tolist() == wf["n"].tolist()


def test_cuckoo_semi_join_prefilter_drops_rows(ray_session):
    """The broadcast cuckoo pre-filter must admit every true match (no
    false negatives — guaranteed by the filter) while dropping most
    non-matching fact rows before the exact verify."""
    from crawlray.functions.murmur3 import hash64_batch_i64
    from crawlray.state.cuckoo import CuckooFilter

    part = pq.read_table(os.path.join(SF_DIR, "part.parquet"),
                         columns=["p_partkey", "p_brand"])
    keys = np.asarray(part["p_partkey"])[np.asarray(part["p_brand"]) == "Brand#2"]
    cf = CuckooFilter(capacity=max(1 << 10, 4 * len(keys)))
    cf.add_batch(hash64_batch_i64(keys.astype(str)))
    li = pq.read_table(os.path.join(SF_DIR, "lineitem.parquet"),
                       columns=["l_partkey"])
    pk = np.asarray(li["l_partkey"])
    cand = cf.contains_batch(hash64_batch_i64(pk.astype(str)))
    true = np.isin(pk, keys)
    assert not (true & ~cand).any()          # zero false negatives
    assert cand.sum() < 0.5 * len(pk)        # prefilter actually selective


def test_embedding_pca_matches_numpy(ray_session):
    """The per-block Gram-partial PCA must equal a single-machine numpy
    PCA on the same data to float tolerance (the partials are exact
    sums; only association order differs)."""
    from crawlray.pipelines.dataops import q_embedding_pca

    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                      columns=["embedding"])
    emb = np.stack([np.asarray(e, dtype=np.float64)
                    for e in t["embedding"].to_pylist()])
    cov = np.cov(emb, rowvar=False, bias=True)
    want = np.linalg.eigvalsh(cov)[::-1][:5]
    got = q_embedding_pca(SF_DIR).to_pandas()
    assert np.allclose(got["eigenvalue"].to_numpy(), want, rtol=1e-8)
    assert np.allclose(got["explained_ratio"].to_numpy(),
                       want / np.trace(cov), rtol=1e-8)


def test_broadcast_fallbacks_match_fast_paths(ray_session, monkeypatch):
    """shipping_priority and cuckoo_semi_join must produce identical
    results through their oversized-dim join fallbacks (the 100-TB
    branch) as through the broadcast fast paths."""
    import crawlray.pipelines.analytics as an
    import crawlray.pipelines.relational as rel

    fast_sp = an.q_shipping_priority(SF_DIR).to_pandas()
    fast_cj = an.q_cuckoo_semi_join(SF_DIR).to_pandas()
    monkeypatch.setattr(rel, "_BROADCAST_KEY_LIMIT", 1)
    slow_sp = an.q_shipping_priority(SF_DIR).to_pandas()
    slow_cj = an.q_cuckoo_semi_join(SF_DIR).to_pandas()

    def norm(df):
        return df.sort_values(list(df.columns), ignore_index=True)

    pd.testing.assert_frame_equal(norm(fast_sp), norm(slow_sp))
    pd.testing.assert_frame_equal(norm(fast_cj), norm(slow_cj))


def test_config_for_scale_10e10():
    """The 10^10-URL sizing math must produce parameters that fit real
    nodes: shard capacity a power of two with ≤ ~77% projected load,
    uint16 bucket memory ≤ 512 MB per shard, parts ≥ 2× CPUs."""
    from crawlray.pipelines.config import config_for_scale

    cfg = config_for_scale(10**10, total_cpus=256 * 32, n_nodes=256)
    assert cfg.seen_shards == 256
    per_shard = 10**10 / cfg.seen_shards
    assert cfg.seen_capacity >= 1.3 * per_shard * 0.999
    assert cfg.seen_capacity & (cfg.seen_capacity - 1) == 0  # power of 2
    assert cfg.seen_capacity * 2 <= 512 * 2**20  # uint16 fingerprints
    assert cfg.n_parts >= 2 * 256 * 32
    # and a laptop-sized call stays sane
    small = config_for_scale(100_000, total_cpus=8)
    assert small.seen_shards == 2 and small.n_parts >= 32


def test_text_family_vocab_guard_branches_equal(ray_session, monkeypatch):
    """Forcing the web-scale text-family plans (token hash join for
    tfidf/unigram-LM, distributed Sennrich rounds for BPE — no vocab
    ever pulled to the driver or broadcast) must reproduce the default
    vocab-bounded paths: exactly for integer/string columns, and to
    float-addition-order tolerance (<1e-6 after the shared 6-dp round)
    for unigram's per-doc log-prob fold."""
    import crawlray.pipelines.dataops as d

    def norm(df):
        return df.sort_values(list(df.columns), ignore_index=True)

    base_tfidf = norm(d.q_tfidf_topterms(SF_DIR).to_pandas())
    base_uni = norm(d.q_unigram_logprob(SF_DIR).to_pandas())
    base_bpe = d.q_bpe_train(SF_DIR).to_pandas()

    monkeypatch.setattr(d, "_VOCAB_DRIVER_LIMIT", 0)
    forced_tfidf = norm(d.q_tfidf_topterms(SF_DIR).to_pandas())
    forced_uni = norm(d.q_unigram_logprob(SF_DIR).to_pandas())
    forced_bpe = d.q_bpe_train(SF_DIR).to_pandas()

    pd.testing.assert_frame_equal(base_tfidf, forced_tfidf)
    pd.testing.assert_frame_equal(base_bpe, forced_bpe)
    forced_uni = forced_uni.set_index("doc_id").loc[
        base_uni["doc_id"]].reset_index()
    assert (base_uni["n_tokens"].to_numpy()
            == forced_uni["n_tokens"].to_numpy()).all()
    assert np.abs(base_uni["avg_logprob"].to_numpy()
                  - forced_uni["avg_logprob"].to_numpy()).max() <= 1e-6
