"""§2.10 per-site extractor registry (VERDICT r1 item #7): a host with a
custom extraction rule must (a) produce spans that DIFFER from the
generic parser's output and (b) still match the sequential oracle, which
resolves through the same registry.
"""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlray.functions.extractors import lead_only, resolve, title_as_span
from crawlray.functions.htmlx import parse_html


HTML = b"""<html><head><title>Kop</title></head><body>
<p>eerste alinea met inhoud.</p>
<img src="/media/a.jpg" alt="beeld">
<p>tweede alinea.</p>
<video src="/media/b.mp4">
<p>derde alinea die de lead-regel wegsnijdt.</p>
</body></html>"""


def test_lead_only_truncates_spans():
    gen = parse_html(HTML).spans
    lead = lead_only(HTML).spans
    assert len(gen) == 5
    # first two text spans + first media span, document order preserved
    assert lead == [gen[0], gen[1], gen[2]]
    assert [s[0] for s in lead] == ["text", "image", "text"]


def test_title_as_span_prepends():
    out = title_as_span(HTML).spans
    assert out[0] == ("text", "Kop", None)
    assert out[1:] == parse_html(HTML).spans


def test_resolve_longest_pattern_and_default():
    cfg = {"nu.nl": "lead_only", "sport.nu.nl": "title_as_span"}
    assert resolve("www.sport.nu.nl", cfg) is title_as_span
    assert resolve("sport.nu.nl", cfg) is title_as_span
    assert resolve("www.nu.nl", cfg) is lead_only
    assert resolve("elders.nl", cfg) is parse_html
    assert resolve("x.nl", None) is parse_html
    with pytest.raises(KeyError):
        resolve("nu.nl", {"nu.nl": "bestaat_niet"})


@pytest.fixture(scope="module")
def extractor_env(ray_session, tmp_path_factory):
    import dataclasses

    from crawlray.pipelines.config import CrawlConfig
    from crawlray.pipelines.crawl import run_crawl
    from crawlray.sources.miniweb import write_web
    from crawlray.state.robots import RobotsPolicy
    from tests.oracle import build_pages_index, crawl_oracle

    root = tmp_path_factory.mktemp("ext")
    paths = write_web(str(root / "web"), n_hosts=4, pages_per_host=10,
                      hot_factor=2)
    cfg = CrawlConfig(
        n_parts=4, seen_shards=2, max_depth=5, max_waves=4,
        fetch_concurrency=(1, 4), parse_concurrency=(1, 4),
        transport={"kind": "sim", "pages_path": paths["pages"]},
        extractors={"news-1.nl": "lead_only"},
    )
    seeds = pq.read_table(paths["seeds"])["url"].to_pylist()
    robots_t = pq.read_table(paths["robots"])
    run_dir = str(root / "run")
    run_crawl(run_dir, seeds, robots_t, cfg)
    pages_index = build_pages_index(pq.read_table(paths["pages"]))
    pol = RobotsPolicy.from_arrow(robots_t, cfg.default_delay_ms)
    oracle = crawl_oracle(seeds, pol, pages_index, cfg)
    oracle_generic = crawl_oracle(
        seeds, RobotsPolicy.from_arrow(robots_t, cfg.default_delay_ms),
        pages_index, dataclasses.replace(cfg, extractors={}),
    )
    return {"run_dir": run_dir, "oracle": oracle,
            "oracle_generic": oracle_generic}


def _docs(run_dir):
    files = sorted(glob.glob(f"{run_dir}/pages/wave=*/*.parquet"))
    t = pa.concat_tables(
        [pq.read_table(f, columns=["final_url", "host", "status", "spans"])
         for f in files]
    )
    # doc identity = final_url (equals url_canon for direct fetches)
    return {
        r["final_url"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in r["spans"]]
        for r in t.to_pylist() if r["status"] == 200
    }


def test_custom_host_matches_oracle_with_same_registry(extractor_env):
    eng = _docs(extractor_env["run_dir"])
    ora = extractor_env["oracle"].docs
    assert set(eng) == set(ora)
    for k in ora:
        assert eng[k] == ora[k], k


def test_custom_host_differs_from_generic(extractor_env):
    """The rule genuinely changes output: news-1.nl spans are capped at 3
    and at least one page lost spans vs a generic-registry oracle run;
    other hosts are untouched."""
    eng = _docs(extractor_env["run_dir"])
    gen = extractor_env["oracle_generic"].docs
    custom = {u: v for u, v in eng.items() if "news-1.nl" in u}
    assert custom
    assert all(len(v) <= 3 for v in custom.values())
    assert any(len(v) < len(gen[u]) for u, v in custom.items())
    for u, v in eng.items():
        if "news-1.nl" not in u:
            assert v == gen[u], u
