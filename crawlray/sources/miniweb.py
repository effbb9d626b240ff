"""Deterministic synthetic mini-web (FIXTURES.md §2).

Stands in for the live Dutch-news web in this sealed sandbox: a known
link graph with seeds, per-host robots policies, interleaved text+media
HTML bodies, duplicate/denied/malformed links (canonicalizer + robots +
dedup coverage) and one designated hot host (skew-splitting coverage).

Everything derives from an LCG on (seed, host, page) — no global RNG
state, so generation is order-independent and stable across runs and
Python versions. The same tables feed the engine's SimTransport and the
sequential oracle (tests/oracle.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import PAGES, ROBOTS, SEEDS

_WORDS = (
    "nieuws kabinet kamer minister verkiezing stad politie onderzoek economie "
    "bedrijf cultuur sport voetbal wedstrijd europa wereld klimaat energie "
    "zorg onderwijs rechter vonnis media burgemeester provincie gemeente "
    "akkoord debat motie crisis herstel groei daling cijfers rapport"
).split()

_WORDS_NP = np.array(_WORDS, dtype=object)


_LCG_A = 6364136223846793005
_LCG_C = 1442695040888963407


def _lcg(x: int) -> int:
    return (x * _LCG_A + _LCG_C) & 0xFFFFFFFFFFFFFFFF


def _rand(seed: int, *keys: int):
    """Deterministic stream of ints from a key tuple."""
    x = seed & 0xFFFFFFFFFFFFFFFF
    for k in keys:
        x = _lcg(x ^ (k & 0xFFFFFFFFFFFFFFFF))
    while True:
        x = _lcg(x)
        yield x >> 11


# Vectorized _rand: the LCG has the closed form
#   x_j = a^j·x_0 + b_j  (mod 2^64),  b_{j+1} = a·b_j + c
# so the first n draws for ANY keyed start state are one uint64 numpy
# multiply-add over precomputed (a^j, b_j) tables — the per-draw Python
# generator was ~75% of synthetic page generation (profiled; the bench
# fetch stage regenerates every page from its URL). Stream equality with
# _rand is pinned in tests/test_crawl_parity.py.
_POW_A = np.empty(0, dtype=np.uint64)
_POW_B = np.empty(0, dtype=np.uint64)


def _extend_lcg_tables(n: int) -> None:
    global _POW_A, _POW_B
    if len(_POW_A) >= n:
        return
    size = max(4096, 1 << (n - 1).bit_length())
    A = np.empty(size, dtype=np.uint64)
    B = np.empty(size, dtype=np.uint64)
    a, b = 1, 0
    for j in range(size):
        a = (a * _LCG_A) & 0xFFFFFFFFFFFFFFFF
        b = (b * _LCG_A + _LCG_C) & 0xFFFFFFFFFFFFFFFF
        A[j] = a
        B[j] = b
    _POW_A, _POW_B = A, B


def _rand_block(seed: int, keys: tuple, n: int) -> np.ndarray:
    """First ``n`` draws of ``_rand(seed, *keys)`` as one uint64 array."""
    _extend_lcg_tables(n)
    x = seed & 0xFFFFFFFFFFFFFFFF
    for k in keys:
        x = _lcg(x ^ (k & 0xFFFFFFFFFFFFFFFF))
    with np.errstate(over="ignore"):
        return (_POW_A[:n] * np.uint64(x) + _POW_B[:n]) >> np.uint64(11)


class _BlockRand:
    """Cursor over a vectorized draw block; regenerates a doubled block
    (cheap — one multiply-add) if a page draws past the estimate."""

    __slots__ = ("seed", "keys", "draws", "ptr")

    def __init__(self, seed: int, keys: tuple, n0: int):
        self.seed = seed
        self.keys = keys
        self.draws = _rand_block(seed, keys, n0)
        self.ptr = 0

    def _refill(self, need: int) -> None:
        n = len(self.draws)
        while n < need:
            n *= 2
        self.draws = _rand_block(self.seed, self.keys, n)

    def nxt(self) -> int:
        if self.ptr >= len(self.draws):
            self._refill(self.ptr + 1)
        v = int(self.draws[self.ptr])
        self.ptr += 1
        return v

    def take(self, cnt: int) -> np.ndarray:
        if self.ptr + cnt > len(self.draws):
            self._refill(self.ptr + cnt)
        out = self.draws[self.ptr:self.ptr + cnt]
        self.ptr += cnt
        return out


def host_name(k: int) -> str:
    return f"news-{k}.nl"


def page_path(i: int) -> str:
    if i == 0:
        return "/"
    return f"/sectie/{i % 5}/artikel-{i}"


def _page_html(
    seed: int,
    k: int,
    i: int,
    n_hosts: int,
    n_pages: int,
    fanout: int = 2,
    heft: int = 1,
) -> bytes:
    """Pseudo-article: 2–8 paragraphs (×``heft``), interleaved media, tree
    links fanout*i+1 .. fanout*i+fanout (same host; fanout=2 → binary
    tree), duplicate + tracking-param + relative link variants, ~10%
    cross-host edges, a denied link, a 404 link, a binary decoy link.

    Draws come from the VECTORIZED ``_rand`` block (same stream, same
    consumption order — the count draw of each paragraph precedes its
    word draws exactly as the original generator expression evaluated
    them); per-word Python generator calls were ~75% of page cost."""
    rr = _BlockRand(seed, (k, i), heft * 256 + 64)
    nxt = rr.nxt
    n_words = np.uint64(len(_WORDS))
    host = host_name(k)
    parts = [f"<html><head><title>Artikel {i} — {host}</title>"]
    parts.append(
        f'<meta property="article:published_time" '
        f'content="2024-0{1 + i % 9}-{1 + i % 27:02d}T{i % 24:02d}:00:00Z">'
    )
    parts.append("</head><body>")
    n_paras = 2 + nxt() % 7
    links: list[str] = []
    # clamp to the page range up front: at bench fanout (32768) the
    # unclamped loop spun 32k Python iterations per page mostly failing
    # the bound (profiled ~0.7 ms/page — the generator's hot spot)
    for c in range(fanout * i + 1,
                   min(fanout * i + fanout + 1, n_pages)):
        links.append(page_path(c))
    if links:
        # duplicate with tracking junk + fragment (dedup/canonicalizer coverage)
        links.append(links[0] + "?utm_source=home&utm_medium=web#teaser")
        # relative with dot segments
        links.append(".." + links[0] if not links[0] == "/" else "/")
    if nxt() % 10 == 0 and n_hosts > 1:
        other = (k + 1 + nxt() % (n_hosts - 1)) % n_hosts
        links.append(f"https://{host_name(other)}/")
    if nxt() % 7 == 0:
        links.append("/prive/geheim-%d" % i)          # robots-denied
    if nxt() % 11 == 0:
        links.append("/weg/bestaat-niet-%d" % i)      # 404
    if nxt() % 13 == 0:
        links.append("/media/foto-%d.jpg" % i)        # binary decoy (M2 filter)
    if nxt() % 9 == 0:
        # 301 alias of THIS page (redirect coverage): fetching it must
        # resolve to the already-stored page and never duplicate a fetch
        links.append("/oud/artikel-%d" % i)
    li = 0
    for p in range(n_paras):
        cnt = heft * (8 + nxt() % 18)
        idx = (rr.take(cnt) % n_words).astype(np.int64)
        words = " ".join(_WORDS_NP[idx])
        inline = ""
        if li < len(links) and nxt() % 2:
            inline = f' <a href="{links[li]}">lees verder</a>'
            li += 1
        parts.append(f"<p>{words}{inline}.</p>")
        if nxt() % 3 == 0:
            kind = "img" if nxt() % 4 else "video"
            src = f"/media/{kind}-{i}-{p}.{'jpg' if kind == 'img' else 'mp4'}"
            alt = f' alt="beeld {p}"' if kind == "img" and nxt() % 2 else ""
            parts.append(f"<{kind} src=\"{src}\"{alt}>")
    while li < len(links):
        parts.append(f'<a href="{links[li]}">meer</a>')
        li += 1
    parts.append("</body></html>")
    return "\n".join(parts).encode("utf-8")


def make_meta(n_hosts: int):
    """(seeds, robots) tables for an ``n_hosts`` mini-web — shared by the
    materialized (make_web/SimTransport) and implicit (SynthTransport)
    fixtures so both describe the same web."""
    seeds = pa.Table.from_pydict(
        {
            "url": [f"https://{host_name(k)}/" for k in range(n_hosts)],
            "priority": [0] * n_hosts,
        },
        schema=SEEDS,
    )
    robots = pa.Table.from_pydict(
        {
            "host": [host_name(k) for k in range(n_hosts)],
            "allow": [[] for _ in range(n_hosts)],
            "deny": [["/prive/"] for _ in range(n_hosts)],
            "crawl_delay_ms": [50 + (k % 5) * 50 for k in range(n_hosts)],
        },
        schema=ROBOTS.remove(ROBOTS.get_field_index("fetched_ok")),
    )
    return seeds, robots


def synth_page(spec: dict, url: str):
    """O(1)-memory implicit web: regenerate the page a URL denotes, or a
    404 — byte-identical to the ``make_web`` row for the same parameters
    (property-tested in tests/test_crawl_parity.py). This is what lets
    the benchmark simulate a web far larger than RAM: no pages table is
    materialized anywhere; fetch actors carry only this spec dict."""
    miss = (404, "text/html", b"", 5.0)
    if not url.startswith("https://news-"):
        return miss
    rest = url[len("https://"):]
    slash = rest.find("/")
    if slash < 0:
        return miss
    host, path = rest[:slash], rest[slash:]
    try:
        k = int(host[len("news-"):-len(".nl")])
    except ValueError:
        return miss
    n_hosts = spec["n_hosts"]
    if not (0 <= k < n_hosts) or host != host_name(k):
        return miss
    n_pages = spec["pages_per_host"] * (
        spec.get("hot_factor", 1) if k == spec.get("hot_host", 0) else 1
    )
    if path.startswith("/oud/artikel-"):
        # 301 alias — byte-identical to the make_web row
        try:
            i = int(path[len("/oud/artikel-"):])
        except ValueError:
            return miss
        if not (0 <= i < n_pages) or path != f"/oud/artikel-{i}":
            return miss
        return (301, "text/html", f"https://{host}{page_path(i)}".encode(), 5.0)
    if path == "/":
        i = 0
    else:
        parts = path.split("/")
        if len(parts) != 4 or parts[1] != "sectie" or not parts[3].startswith("artikel-"):
            return miss
        try:
            i = int(parts[3][len("artikel-"):])
        except ValueError:
            return miss
        if i == 0 or page_path(i) != path:
            return miss
    if i >= n_pages:
        return miss
    seed = spec.get("seed", 42)
    html = _page_html(
        seed, k, i, n_hosts, n_pages,
        spec.get("fanout", 2), spec.get("heft", 1),
    )
    lat = float(20 + (next(_rand(seed, k, i, 7)) % 80))
    return (200, "text/html", html, lat)


def make_web(
    n_hosts: int = 10,
    pages_per_host: int = 30,
    seed: int = 42,
    hot_host: int = 0,
    hot_factor: int = 20,
    fanout: int = 2,
    heft: int = 1,
    with_feeds: bool = False,
    with_robots_txt: bool = False,
):
    """Returns (seeds, robots, pages) pyarrow Tables (schemas.SEEDS/ROBOTS/
    PAGES). Host ``hot_host`` gets ``hot_factor``× the pages of the rest.
    ``fanout`` controls the link-tree branching (wave width vs depth);
    ``heft`` scales page size (parse work per page).

    ``with_feeds=True`` adds per-host discovery channels (D1 coverage):
    ``/sitemap.xml`` listing the host root plus ARCHIVE pages reachable
    ONLY via the sitemap (never linked), ``/rss.xml`` listing a disjoint
    set of feed-only pages plus a robots-denied decoy and (host 0) a
    cross-host URL, and host 0 additionally serves a ``/sitemap-index.xml``
    pointing at a second-level ``/sitemap-extra.xml`` with one more
    otherwise-unreachable page (index recursion coverage).

    ``with_robots_txt=True`` additionally serves ``/robots.txt`` text per
    host whose crawlray-group rules parse to EXACTLY the robots table's
    rows (deny /prive/, the host's crawl delay) — with decoy groups for
    other agents — so robots_mode='fetch' runs must make identical
    decisions to table-mode runs (S2 parity)."""
    seeds, robots = make_meta(n_hosts)
    urls, hosts, statuses, ctypes, htmls, lats = [], [], [], [], [], []

    def add(url, host, status, ctype, body, lat):
        urls.append(url); hosts.append(host); statuses.append(status)
        ctypes.append(ctype); htmls.append(body); lats.append(lat)

    for k in range(n_hosts):
        n_pages = pages_per_host * (hot_factor if k == hot_host else 1)
        host = host_name(k)
        for i in range(n_pages):
            add(f"https://{host}{page_path(i)}", host, 200, "text/html",
                _page_html(seed, k, i, n_hosts, n_pages, fanout, heft),
                float(20 + (next(_rand(seed, k, i, 7)) % 80)))
            # 301 alias (FIXTURES §2: redirect with target): body is the
            # Location, followed transport-side (see transport.py)
            add(f"https://{host}/oud/artikel-{i}", host, 301, "text/html",
                f"https://{host}{page_path(i)}".encode(), 5.0)
        if with_robots_txt:
            delay_s = (50 + (k % 5) * 50) / 1000
            body = (
                "# fixture robots\n"
                "User-agent: googlebot\n"
                "Disallow: /\n"
                "\n"
                "User-agent: crawlray\n"
                "User-agent: anderebot\n"
                "Disallow: /prive/\n"
                f"Crawl-delay: {delay_s}\n"
                "\n"
                "User-agent: *\n"
                "Disallow: /alles/\n"
            ).encode()
            add(f"https://{host}/robots.txt", host, 200, "text/plain",
                body, 8.0)
        if not with_feeds:
            continue
        # archive/feed-only pages: generated from high page indexes so the
        # tree-link logic emits no in-range links — unreachable by crawl
        n_arch = max(2, pages_per_host // 4)
        arch_urls, feed_urls = [], []
        for j in range(n_arch):
            u = f"https://{host}/archief/stuk-{j}"
            arch_urls.append(u)
            add(u, host, 200, "text/html",
                _page_html(seed, k, 50_000 + j, n_hosts, n_pages, fanout, heft),
                25.0)
        for j in range(max(2, n_arch // 2)):
            u = f"https://{host}/feed/item-{j}"
            feed_urls.append(u)
            add(u, host, 200, "text/html",
                _page_html(seed, k, 60_000 + j, n_hosts, n_pages, fanout, heft),
                25.0)
        if k == 0:
            # host 0's /sitemap.xml is a sitemap INDEX: its urlset lives
            # one hop away at /sitemap-extra.xml (and adds one more
            # otherwise-unreachable page) — index recursion lands those
            # candidates one wave later
            deep = f"https://{host}/archief/diep-0"
            add(deep, host, 200, "text/html",
                _page_html(seed, k, 70_000, n_hosts, n_pages, fanout, heft),
                25.0)
            add(f"https://{host}/sitemap.xml", host, 200, "application/xml",
                ("<?xml version='1.0'?>"
                 "<sitemapindex xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'>"
                 f"<sitemap><loc>https://{host}/sitemap-extra.xml</loc></sitemap>"
                 "</sitemapindex>").encode(), 10.0)
            sm = ["<?xml version='1.0'?>"
                  "<urlset xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'>",
                  f"<url><loc>https://{host}/</loc></url>",
                  f"<url><loc>{deep}</loc></url>"]
            for j, u in enumerate(arch_urls):
                sm.append(f"<url><loc>{u}</loc>"
                          f"<lastmod>2024-02-{1 + j % 27:02d}</lastmod></url>")
            sm.append("</urlset>")
            add(f"https://{host}/sitemap-extra.xml", host, 200,
                "application/xml", "".join(sm).encode(), 10.0)
        else:
            sm = ["<?xml version='1.0'?>"
                  "<urlset xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'>",
                  f"<url><loc>https://{host}/</loc>"
                  f"<lastmod>2024-01-0{1 + k % 9}</lastmod></url>"]
            for j, u in enumerate(arch_urls):
                sm.append(f"<url><loc>{u}</loc>"
                          f"<lastmod>2024-02-{1 + j % 27:02d}</lastmod></url>")
            sm.append("</urlset>")
            add(f"https://{host}/sitemap.xml", host, 200, "application/xml",
                "".join(sm).encode(), 10.0)
        items = [f"<item><title>Feed {k}-{j}</title><link>{u}</link></item>"
                 for j, u in enumerate(feed_urls)]
        items.append(f"<item><title>Verboden</title>"
                     f"<link>https://{host}/prive/feed-geheim</link></item>")
        if k == 0 and n_hosts > 1:
            items.append(f"<item><title>Cross</title>"
                         f"<link>https://{host_name(1)}/</link></item>")
        add(f"https://{host}/rss.xml", host, 200, "application/rss+xml",
            ("<?xml version='1.0'?><rss version='2.0'><channel>"
             + "".join(items) + "</channel></rss>").encode(), 10.0)

    pages = pa.Table.from_pydict(
        {
            "url": urls,
            "host": hosts,
            "status": statuses,
            "content_type": ctypes,
            "html": htmls,
            "latency_ms": lats,
        },
        schema=PAGES,
    )
    return seeds, robots, pages


def write_web(out_dir: str, **kw) -> dict:
    """Materialize the fixture as parquet; returns the path dict used by
    crawl configs ({seeds,robots,pages} → file paths)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    seeds, robots, pages = make_web(**kw)
    paths = {}
    for name, tbl in (("seeds", seeds), ("robots", robots), ("pages", pages)):
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths


def make_docs(n: int, seed: int = 42) -> pa.Table:
    """FIXTURES.md §1: deterministic interleaved-docs table (DOCS schema).
    span count ~ 1 + (i*2654435761 % 12); ~70% text spans."""
    from ..functions.spans import docs_table

    doc_ids = [f"doc-{i:08d}" for i in range(n)]
    per_doc = []
    kinds = ("text", "image", "text", "video", "text", "text", "audio", "text", "text", "link")
    for i in range(n):
        r = _rand(seed, i)
        n_spans = 1 + (i * 2654435761) % 12
        spans = []
        for j in range(n_spans):
            kind = kinds[(i + j * 3 + next(r) % 3) % len(kinds)]
            if kind == "text":
                txt = " ".join(_WORDS[next(r) % len(_WORDS)] for _ in range(4 + next(r) % 9))
                spans.append(("text", txt, None))
            else:
                spans.append((kind, None, f"media/{doc_ids[i]}/{j}.jpg"))
        per_doc.append(spans)
    return docs_table(doc_ids, per_doc)
