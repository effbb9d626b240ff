"""Crawl parity: the distributed engine vs the sequential oracle
(SURVEY §5.2 parity tests 1–4) on the deterministic mini-web.

Exercises: intra-wave dedup winners, cross-wave seen-set novelty,
robots deny rules, per-host page-cap budgets, politeness virtual-clock
spacing, deterministic (wave, part, host, seq) ordering, span-sequence
equality per doc (BASELINE.json input_hint invariant), and
checkpoint/resume idempotence.
"""

import glob
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlray.functions.murmur3 import hash64s
from crawlray.pipelines.config import CrawlConfig
from crawlray.state.robots import RobotsPolicy

FETCH_COLS = ["wave", "part", "host", "seq", "url_canon", "url_hash",
              "scheduled_ms", "status"]


def _cfg(pages_path):
    return CrawlConfig(
        n_parts=4,
        seen_shards=2,
        max_depth=6,
        max_waves=5,
        max_pages_per_host=35,       # exercised: hot host exceeds it
        fetch_concurrency=(1, 4),
        parse_concurrency=(1, 4),
        transport={"kind": "sim", "pages_path": pages_path},
    )


def _engine_log(run_dir):
    files = sorted(glob.glob(f"{run_dir}/pages/wave=*/*.parquet"))
    t = pa.concat_tables(
        [pq.read_table(f, columns=FETCH_COLS + ["spans", "final_url"])
         for f in files]
    )
    return t.to_pylist()


def _key(r):
    return tuple(r[c] for c in FETCH_COLS)


@pytest.fixture(scope="module")
def crawl_env(ray_session, tmp_path_factory):
    from crawlray.pipelines.crawl import run_crawl
    from crawlray.sources.miniweb import write_web
    from tests.oracle import build_pages_index, crawl_oracle

    root = tmp_path_factory.mktemp("crawl")
    paths = write_web(str(root / "web"), n_hosts=8, pages_per_host=14,
                      hot_factor=8)
    cfg = _cfg(paths["pages"])
    seeds = pq.read_table(paths["seeds"])["url"].to_pylist()
    robots_t = pq.read_table(paths["robots"])
    run_dir = str(root / "run")
    summary = run_crawl(run_dir, seeds, robots_t, cfg)
    oracle = crawl_oracle(
        seeds,
        RobotsPolicy.from_arrow(robots_t, cfg.default_delay_ms),
        build_pages_index(pq.read_table(paths["pages"])),
        cfg,
    )
    return {
        "paths": paths, "cfg": cfg, "seeds": seeds, "robots_t": robots_t,
        "run_dir": run_dir, "summary": summary, "oracle": oracle,
        "root": root,
    }


def test_fetch_log_parity(crawl_env):
    eng = sorted(_key(r) for r in _engine_log(crawl_env["run_dir"]))
    ora = sorted(_key(r) for r in crawl_env["oracle"].fetch_log)
    assert len(eng) > 100  # the fixture actually crawls something
    assert eng == ora


def test_seen_set_parity(crawl_env):
    last = crawl_env["summary"]["waves"][-1]["wave"]
    hashes = set()
    for f in sorted(glob.glob(f"{crawl_env['run_dir']}/seen/wave={last}/shard-*.bin")):
        d = pickle.loads(open(f, "rb").read())
        hashes |= set(np.frombuffer(d["exact"], dtype=np.int64).tolist())
    assert hashes == {hash64s(u) for u in crawl_env["oracle"].seen}


def test_span_sequence_parity(crawl_env):
    # doc identity = final_url (the canonical identity after redirects;
    # equals url_canon for direct fetches)
    rows = _engine_log(crawl_env["run_dir"])
    eng_docs = {
        r["final_url"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in r["spans"]]
        for r in rows
        if r["status"] == 200
    }
    ora_docs = crawl_env["oracle"].docs
    assert set(eng_docs) == set(ora_docs)
    for k in ora_docs:
        assert eng_docs[k] == ora_docs[k], k


def test_politeness_never_violated(crawl_env):
    robots = RobotsPolicy.from_arrow(crawl_env["robots_t"])
    by_host_wave = {}
    for r in _engine_log(crawl_env["run_dir"]):
        by_host_wave.setdefault((r["wave"], r["host"]), []).append(r["scheduled_ms"])
    for (w, h), times in by_host_wave.items():
        times.sort()
        d = robots.crawl_delay_ms(h)
        for a, b in zip(times, times[1:]):
            assert b - a >= d, (w, h)


def test_host_cap_respected(crawl_env):
    cap = crawl_env["cfg"].max_pages_per_host
    counts = {}
    for r in _engine_log(crawl_env["run_dir"]):
        counts[r["host"]] = counts.get(r["host"], 0) + 1
    assert max(counts.values()) <= cap
    # the hot host actually hits the cap (fixture guarantees pressure)
    assert max(counts.values()) == cap


def test_robots_denied_never_fetched(crawl_env):
    for r in _engine_log(crawl_env["run_dir"]):
        assert "/prive/" not in r["url_canon"]


def test_resume_parity(crawl_env):
    """Kill after wave 2, resume, final fetch log identical (parity test 4)."""
    from crawlray.pipelines.crawl import run_crawl
    import dataclasses

    cfg = crawl_env["cfg"]
    run2 = str(crawl_env["root"] / "run_resumed")
    cfg_short = dataclasses.replace(cfg, max_waves=2)
    run_crawl(run2, crawl_env["seeds"], crawl_env["robots_t"], cfg_short)
    run_crawl(run2, crawl_env["seeds"], crawl_env["robots_t"], cfg, resume=True)
    eng1 = sorted(_key(r) for r in _engine_log(crawl_env["run_dir"]))
    eng2 = sorted(_key(r) for r in _engine_log(run2))
    assert eng1 == eng2


def test_metrics_lineage_reconciles(crawl_env):
    """S8: the persisted metrics table's per-wave lineage must reconcile
    with ground truth — rows_in == the oracle's frontier size per wave,
    rows_out == the fetch-log rows of that wave, wall time and input
    refs populated."""
    from collections import Counter

    t = pq.read_table(f"{crawl_env['run_dir']}/metrics/metrics.parquet")
    waves = {r["wave"]: r for r in t.to_pylist() if r["stage"] == "wave_pipeline"}
    assert sorted(waves) == list(range(len(crawl_env["oracle"].waves)))
    for w, size in enumerate(crawl_env["oracle"].waves):
        assert waves[w]["rows_in"] == size, w
    per_wave = Counter(r["wave"] for r in _engine_log(crawl_env["run_dir"]))
    for w, m in waves.items():
        assert m["rows_out"] == per_wave.get(w, 0), w
        assert m["wall_ms"] > 0
        assert m["input_refs"].endswith(f"wave={w}")


def test_docs_manifest_written(crawl_env):
    from crawlray.sources.lance_compat import read_manifest

    man = read_manifest(f"{crawl_env['run_dir']}/pages/wave=0")
    assert man is not None
    assert man["num_rows"] > 0
    names = [f["name"] for f in man["schema"]]
    assert "spans" in names and "url_canon" in names


def test_redirect_alias_fetched_once_stored_under_final(crawl_env):
    """VERDICT r2 item #4 'Done' criterion: aliased URLs are fetched
    exactly once and their docs are stored under the final canonical
    URL; no URL (alias or target) is ever fetched twice."""
    rows = _engine_log(crawl_env["run_dir"])
    fetched = [r["url_canon"] for r in rows]
    assert len(fetched) == len(set(fetched))  # nothing fetched twice
    aliases = [r for r in rows if "/oud/artikel-" in r["url_canon"]]
    assert aliases  # the fixture actually exercises redirects
    for r in aliases:
        assert r["status"] == 200              # final status, not 301
        assert "/oud/" not in r["final_url"]   # stored under the target
        assert r["final_url"] != r["url_canon"]


def test_redirect_sole_discovery_marks_target_seen(ray_session, tmp_path):
    """A redirect can be the ONLY discovery channel for its target: the
    alias fetch stores the body under the target URL and marks the
    target seen, so a LATER direct link to the target is deduped (never
    fetched). Engine ≡ oracle on the full fetch log."""
    from crawlray.pipelines.config import CrawlConfig
    from crawlray.pipelines.crawl import run_crawl
    from tests.oracle import build_pages_index, crawl_oracle

    host = "x.nl"
    target = f"https://{host}/sectie/1/artikel-1"

    def html(links):
        body = "".join(f'<a href="{u}">l</a>' for u in links)
        return f"<html><head><title>t</title></head><body>{body}</body></html>".encode()

    pages = pa.table({
        "url": [f"https://{host}/", f"https://{host}/oud/artikel-1",
                target, f"https://{host}/sectie/2/artikel-2"],
        "host": [host] * 4,
        "status": pa.array([200, 301, 200, 200], type=pa.int16()),
        "content_type": ["text/html"] * 4,
        "html": pa.array([
            html(["/oud/artikel-1", "/sectie/2/artikel-2"]),
            target.encode(),                       # 301 Location
            html([]),
            html(["/sectie/1/artikel-1"]),         # direct link, later wave
        ], type=pa.large_binary()),
        "latency_ms": pa.array([10.0, 5.0, 10.0, 10.0], type=pa.float32()),
    })
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    robots_t = pa.table({
        "host": [host], "allow": [[]], "deny": [[]],
        "crawl_delay_ms": pa.array([10], type=pa.int32()),
    })
    cfg = CrawlConfig(
        n_parts=2, seen_shards=1, max_depth=5, max_waves=5,
        max_pages_per_host=50, fetch_concurrency=(1, 2),
        parse_concurrency=(1, 2),
        transport={"kind": "sim", "pages_path": pages_path},
    )
    run_dir = str(tmp_path / "run")
    run_crawl(run_dir, [f"https://{host}/"], robots_t, cfg)
    rows = _engine_log(run_dir)
    fetched = sorted(r["url_canon"] for r in rows)
    # the target is NEVER fetched directly — its body arrived via the alias
    assert target not in fetched
    assert f"https://{host}/oud/artikel-1" in fetched
    # ... but its doc exists, stored under the target url
    docs = {r["final_url"] for r in rows if r["status"] == 200}
    assert target in docs
    ora = crawl_oracle(
        [f"https://{host}/"], RobotsPolicy.from_arrow(robots_t),
        build_pages_index(pages), cfg,
    )
    assert sorted(_key(r) for r in rows) == sorted(_key(r) for r in ora.fetch_log)
    assert target in ora.seen


def test_allowlist_cross_host_seen_but_never_fetched(ray_session, tmp_path):
    """VERDICT r2 item #5 'Done' criterion: with ``allowed_hosts`` set to
    a closed subset, a cross-host link to a non-allowlisted domain is
    admitted to the seen set (dedup identity is preserved) but never
    fetched — the engine cannot walk off the list. Full fetch-log and
    seen-set parity vs the oracle under the same config."""
    import pickle

    from crawlray.functions.canon import host_of
    from crawlray.pipelines.crawl import run_crawl
    from crawlray.sources.miniweb import write_web
    from tests.oracle import build_pages_index, crawl_oracle

    paths = write_web(str(tmp_path / "web"), n_hosts=4, pages_per_host=12,
                      hot_factor=2)
    allowed = ("news-0.nl", "news-1.nl")
    cfg = CrawlConfig(
        n_parts=3, seen_shards=2, max_depth=6, max_waves=5,
        max_pages_per_host=60, allowed_hosts=allowed,
        fetch_concurrency=(1, 4), parse_concurrency=(1, 4),
        transport={"kind": "sim", "pages_path": paths["pages"]},
    )
    seeds = pq.read_table(paths["seeds"])["url"].to_pylist()
    robots_t = pq.read_table(paths["robots"])
    run_dir = str(tmp_path / "run")
    summary = run_crawl(run_dir, seeds, robots_t, cfg)
    ora = crawl_oracle(
        seeds, RobotsPolicy.from_arrow(robots_t, cfg.default_delay_ms),
        build_pages_index(pq.read_table(paths["pages"])), cfg,
    )
    rows = _engine_log(run_dir)
    # nothing off-list was ever fetched (seeds for hosts 2/3 included)
    assert rows
    for r in rows:
        assert r["host"] in allowed, r["url_canon"]
    # fetch-log parity under the allowlist
    assert sorted(_key(r) for r in rows) == sorted(_key(r) for r in ora.fetch_log)
    # the fixture really produced off-list discoveries, and they are in
    # the SEEN set (marked at admission, dropped only at the policy gate)
    off_list = {u for u in ora.seen if host_of(u) not in allowed}
    assert off_list
    last = summary["waves"][-1]["wave"]
    hashes = set()
    for f in sorted(glob.glob(f"{run_dir}/seen/wave={last}/shard-*.bin")):
        d = pickle.loads(open(f, "rb").read())
        hashes |= set(np.frombuffer(d["exact"], dtype=np.int64).tolist())
    assert hashes == {hash64s(u) for u in ora.seen}
    for u in off_list:
        assert hash64s(u) in hashes


def test_meta_robots_and_canonical_parity(ray_session, tmp_path):
    """Robots-meta semantics engine ≡ oracle: noindex stores no content
    but its links ARE discovered; nofollow stores content but discovers
    NO links; ``none`` does both; per-anchor rel=nofollow drops only
    that anchor; <link rel=canonical> is recorded (resolved against the
    final URL) as pages-sink metadata and never becomes a discovery
    candidate."""
    from crawlray.pipelines.crawl import run_crawl
    from tests.oracle import build_pages_index, crawl_oracle

    host = "meta.nl"

    def page(body_html, head=""):
        return (f"<html><head><title>t</title>{head}</head>"
                f"<body>{body_html}</body></html>").encode()

    urls = {
        "/": page('<p>wortel</p><a href="/noindex">a</a>'
                  '<a href="/nofollow">b</a><a href="/none">c</a>'
                  '<a href="/canon">d</a>'
                  '<a rel="nofollow" href="/from-anchor">x</a>'),
        "/noindex": page('<p>verborgen</p><a href="/from-noindex">v</a>',
                         head='<meta name="robots" content="noindex">'),
        "/nofollow": page('<p>zichtbaar</p><a href="/from-nofollow">w</a>',
                          head='<meta name="robots" content="nofollow">'),
        "/none": page('<p>weg</p><a href="/from-none">z</a>',
                      head='<meta name="robots" content="none">'),
        "/canon": page('<p>dubbel</p>',
                       head='<link rel="canonical" '
                            'href="/canonical-target">'),
        "/from-noindex": page("<p>bereikt</p>"),
        "/from-nofollow": page("<p>nooit</p>"),
        "/from-none": page("<p>nooit</p>"),
        "/from-anchor": page("<p>nooit</p>"),
        "/canonical-target": page("<p>nooit</p>"),
    }
    pages = pa.table({
        "url": [f"https://{host}{p}" for p in urls],
        "host": [host] * len(urls),
        "status": pa.array([200] * len(urls), type=pa.int16()),
        "content_type": ["text/html"] * len(urls),
        "html": pa.array(list(urls.values()), type=pa.large_binary()),
        "latency_ms": pa.array([10.0] * len(urls), type=pa.float32()),
    })
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    robots_t = pa.table({
        "host": [host], "allow": [[]], "deny": [[]],
        "crawl_delay_ms": pa.array([10], type=pa.int32()),
    })
    cfg = CrawlConfig(
        n_parts=2, seen_shards=1, max_depth=4, max_waves=4,
        max_pages_per_host=20, fetch_concurrency=(1, 2),
        parse_concurrency=(1, 2),
        transport={"kind": "sim", "pages_path": pages_path},
    )
    run_dir = str(tmp_path / "run")
    run_crawl(run_dir, [f"https://{host}/"], robots_t, cfg)
    files = sorted(glob.glob(f"{run_dir}/pages/wave=*/*.parquet"))
    t = pa.concat_tables(
        [pq.read_table(f, columns=FETCH_COLS
                       + ["spans", "final_url", "canonical", "links"])
         for f in files])
    rows = t.to_pylist()
    fetched = {r["url_canon"] for r in rows}
    u = lambda p: f"https://{host}{p}"  # noqa: E731
    # noindex page's link IS followed; nofollow/none/anchor-nofollow
    # links and the canonical target are NOT
    assert u("/from-noindex") in fetched
    for p in ("/from-nofollow", "/from-none", "/from-anchor",
              "/canonical-target"):
        assert u(p) not in fetched, p
    stored = {r["final_url"] for r in rows
              if r["status"] == 200 and len(r["spans"])}
    assert u("/noindex") not in stored and u("/none") not in stored
    assert u("/nofollow") in stored and u("/canon") in stored
    # nofollow page stored with ZERO links
    (nf_row,) = [r for r in rows if r["final_url"] == u("/nofollow")]
    assert nf_row["links"] == []
    # canonical metadata recorded, resolved against the final URL
    eng_canon = {r["final_url"]: r["canonical"] for r in rows
                 if r["canonical"]}
    assert eng_canon == {u("/canon"): u("/canonical-target")}
    ora = crawl_oracle(
        [f"https://{host}/"], RobotsPolicy.from_arrow(robots_t),
        build_pages_index(pages), cfg,
    )
    assert (sorted(_key(r) for r in rows)
            == sorted(_key(r) for r in ora.fetch_log))
    assert set(ora.docs) == stored
    assert ora.canonicals == eng_canon


def test_charset_span_parity(ray_session, tmp_path):
    """VERDICT r3 missing #1 'Done' criterion: a legacy ISO-8859-1 page
    with Dutch diacritics decodes through the charset sniffer (header
    param → meta prescan → UTF-8) identically in the distributed parse
    stage and the sequential oracle — span parity holds and the text is
    NOT mojibake."""
    from tests.oracle import build_pages_index, crawl_oracle

    host = "legacy.nl"
    txt1 = "Eén geïrriteerde cliënt in Curaçao"
    txt2 = "Zo'n café aan de Zuidas — heerlijk"
    root_html = (
        "<html><head><title>Oud</title></head><body>"
        f"<p>{txt1}</p>"
        '<a href="/artikel/meta">meer</a>'
        "</body></html>"
    ).encode("iso-8859-1")
    # second page: charset declared ONLY via <meta>, generic header
    meta_html = (
        '<html><head><meta charset="windows-1252"><title>Meta</title>'
        f"</head><body><p>{txt2}</p></body></html>"
    ).encode("windows-1252")
    pages = pa.table({
        "url": [f"https://{host}/", f"https://{host}/artikel/meta"],
        "host": [host] * 2,
        "status": pa.array([200, 200], type=pa.int16()),
        "content_type": ["text/html; charset=iso-8859-1", "text/html"],
        "html": pa.array([root_html, meta_html], type=pa.large_binary()),
        "latency_ms": pa.array([10.0, 10.0], type=pa.float32()),
    })
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    robots_t = pa.table({
        "host": [host], "allow": [[]], "deny": [[]],
        "crawl_delay_ms": pa.array([10], type=pa.int32()),
    })
    cfg = CrawlConfig(
        n_parts=2, seen_shards=1, max_depth=3, max_waves=3,
        max_pages_per_host=10, fetch_concurrency=(1, 2),
        parse_concurrency=(1, 2),
        transport={"kind": "sim", "pages_path": pages_path},
    )
    run_dir = str(tmp_path / "run")
    run_crawl_mod = __import__("crawlray.pipelines.crawl",
                               fromlist=["run_crawl"])
    run_crawl_mod.run_crawl(run_dir, [f"https://{host}/"], robots_t, cfg)
    rows = _engine_log(run_dir)
    eng_docs = {
        r["final_url"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in r["spans"]]
        for r in rows if r["status"] == 200
    }
    ora = crawl_oracle(
        [f"https://{host}/"], RobotsPolicy.from_arrow(robots_t),
        build_pages_index(pages), cfg,
    )
    assert eng_docs == ora.docs
    # not mojibake: the diacritics survived on both pages
    assert eng_docs[f"https://{host}/"][0][1] == txt1
    assert eng_docs[f"https://{host}/artikel/meta"][0][1] == txt2


def test_language_gate_parity(ray_session, tmp_path):
    """M10 content-language gate: with keep_languages=('nl',), a linked
    French page is still fetched (politeness/log parity) but stores NO
    content and its outlinks are never discovered; Dutch pages store
    normally. Engine ≡ oracle on fetch log and stored docs; a control
    run without the gate walks through the French page."""
    from crawlray.pipelines.crawl import run_crawl
    from tests.oracle import build_pages_index, crawl_oracle

    host = "taal.nl"
    nl = ("De kat zit op de mat en het huis is een warm huis. "
          "Dat is goed, van de buurt op te zien.")
    fr = ("Le chat est sur le tapis et la maison est une grande maison "
          "pres de la riviere au bord du chemin.")

    def html(text, links=()):
        body = "".join(f'<a href="{u}">l</a>' for u in links)
        return (f"<html><head><title>t</title></head><body>"
                f"<p>{text}</p>{body}</body></html>").encode()

    pages = pa.table({
        "url": [f"https://{host}/", f"https://{host}/frans",
                f"https://{host}/nl-2", f"https://{host}/achter-frans"],
        "host": [host] * 4,
        "status": pa.array([200] * 4, type=pa.int16()),
        "content_type": ["text/html"] * 4,
        "html": pa.array([
            html(nl, ["/frans", "/nl-2"]),
            html(fr, ["/achter-frans"]),   # only discovery path
            html(nl),
            html(nl),
        ], type=pa.large_binary()),
        "latency_ms": pa.array([10.0] * 4, type=pa.float32()),
    })
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    robots_t = pa.table({
        "host": [host], "allow": [[]], "deny": [[]],
        "crawl_delay_ms": pa.array([10], type=pa.int32()),
    })

    def cfg_of(keep):
        return CrawlConfig(
            n_parts=2, seen_shards=1, max_depth=4, max_waves=4,
            max_pages_per_host=20, keep_languages=keep,
            fetch_concurrency=(1, 2), parse_concurrency=(1, 2),
            transport={"kind": "sim", "pages_path": pages_path},
        )

    run_gated = str(tmp_path / "run_gated")
    cfg = cfg_of(("nl",))
    run_crawl(run_gated, [f"https://{host}/"], robots_t, cfg)
    rows = _engine_log(run_gated)
    fetched = {r["url_canon"] for r in rows}
    # the French page IS fetched (it was linked from a Dutch page)...
    assert f"https://{host}/frans" in fetched
    # ...but its outlink is never discovered
    assert f"https://{host}/achter-frans" not in fetched
    stored = {r["final_url"] for r in rows
              if r["status"] == 200 and len(r["spans"])}
    assert stored == {f"https://{host}/", f"https://{host}/nl-2"}
    ora = crawl_oracle(
        [f"https://{host}/"], RobotsPolicy.from_arrow(robots_t),
        build_pages_index(pages), cfg,
    )
    assert (sorted(_key(r) for r in rows)
            == sorted(_key(r) for r in ora.fetch_log))
    assert set(ora.docs) == stored
    # control: without the gate the French outlink is crawled
    run_open = str(tmp_path / "run_open")
    run_crawl(run_open, [f"https://{host}/"], robots_t, cfg_of(None))
    assert f"https://{host}/achter-frans" in {
        r["url_canon"] for r in _engine_log(run_open)}


def test_anchor_text_parity(crawl_env):
    """VERDICT r2 item #10: anchor text is retained through the parse
    stage into the pages sink (``link_anchors`` parallel to ``links``)
    and matches the oracle's (href, anchor) sequence per doc — first
    occurrence of a canonical URL keeps its anchor, same winner as the
    in-page dedup."""
    files = sorted(glob.glob(f"{crawl_env['run_dir']}/pages/wave=*/*.parquet"))
    t = pa.concat_tables(
        [pq.read_table(f, columns=["final_url", "status", "links",
                                   "link_anchors"]) for f in files])
    eng = {
        r["final_url"]: list(zip(r["links"], r["link_anchors"]))
        for r in t.to_pylist() if r["status"] == 200
    }
    ora = crawl_env["oracle"].links
    assert set(eng) == set(ora)
    for k, v in ora.items():
        assert eng[k] == v, k
    anchors = {a for v in eng.values() for _, a in v}
    assert {"lees verder", "meer"} <= anchors  # fixture really varies them


def test_rand_block_equals_generator():
    """The vectorized LCG closed-form block must reproduce _rand's draw
    stream exactly, across key tuples and past the table-extension
    boundary (the miniweb fixture's byte-identity depends on it)."""
    from crawlray.sources.miniweb import _rand, _rand_block

    for keys in [(0, 0), (7, 123), (42,), (3, 99999)]:
        for n in [1, 5, 100, 4096, 4097, 9000]:
            r = _rand(42, *keys)
            assert _rand_block(42, keys, n).tolist() == \
                [next(r) for _ in range(n)], (keys, n)


def test_trap_path_seen_but_never_fetched(ray_session, tmp_path):
    """M2 trap guard: a link into an infinite URL space (repeated path
    segment — the calendar/relative-link-loop signature) is admitted to
    the seen set (dedup identity preserved) but NEVER fetched, so the
    crawl cannot descend the trap branch. Engine ≡ oracle on the full
    fetch log under the guard."""
    from crawlray.pipelines.config import CrawlConfig
    from crawlray.pipelines.crawl import run_crawl
    from tests.oracle import build_pages_index, crawl_oracle

    host = "x.nl"
    trap = f"https://{host}/d/d/d/artikel-1"
    legit = f"https://{host}/sectie/1/artikel-1"

    def html(links):
        body = "".join(f'<a href="{u}">l</a>' for u in links)
        return (f"<html><head><title>t</title></head>"
                f"<body>{body}</body></html>").encode()

    pages = pa.table({
        "url": [f"https://{host}/", trap, legit],
        "host": [host] * 3,
        "status": pa.array([200, 200, 200], type=pa.int16()),
        "content_type": ["text/html"] * 3,
        "html": pa.array([
            html([trap, legit]),
            html([f"https://{host}/d/d/d/d/artikel-1"]),  # deeper trap
            html([]),
        ], type=pa.large_binary()),
        "latency_ms": pa.array([10.0, 5.0, 10.0], type=pa.float32()),
    })
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    robots_t = pa.table({
        "host": [host], "allow": [[]], "deny": [[]],
        "crawl_delay_ms": pa.array([10], type=pa.int32()),
    })
    cfg = CrawlConfig(
        n_parts=2, seen_shards=1, max_depth=5, max_waves=5,
        max_pages_per_host=50, fetch_concurrency=(1, 2),
        parse_concurrency=(1, 2),
        transport={"kind": "sim", "pages_path": pages_path},
    )
    run_dir = str(tmp_path / "run")
    run_crawl(run_dir, [f"https://{host}/"], robots_t, cfg)
    rows = _engine_log(run_dir)
    fetched = sorted(r["url_canon"] for r in rows)
    assert trap not in fetched           # the guard held
    assert legit in fetched              # normal pages still crawl
    ora = crawl_oracle(
        [f"https://{host}/"], RobotsPolicy.from_arrow(robots_t),
        build_pages_index(pages), cfg,
    )
    assert sorted(_key(r) for r in rows) == sorted(_key(r) for r in ora.fetch_log)
    assert trap in ora.seen              # seen-marked at admission
