"""S3/S4: sitemap and RSS/Atom readers — the reference's non-link URL
discovery channels (SURVEY §2.1; reference capability: sitemap.xml /
feed parsing `[recon]`), stdlib-only (xml.etree), exposed both as pure
parsers and as a Ray Data ``flat_map``-style batch stage.

Discovery channels union into one frontier candidate stream with a
``via`` provenance column (SURVEY D1): links ∪ sitemap ∪ feed.
Malformed XML yields zero URLs (a crawler treats a broken sitemap as
absent, it does not fail the wave).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime, timezone

import pyarrow as pa

_SM_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
_ATOM_NS = "{http://www.w3.org/2005/Atom}"


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_dt(s: str | None):
    """lastmod/pubDate → timestamp[us]-compatible datetime (UTC, naive).
    Accepts W3C datetime (sitemaps/Atom) and RFC 822 (RSS)."""
    if not s:
        return None
    s = s.strip()
    for fn in (
        lambda x: datetime.fromisoformat(x.replace("Z", "+00:00")),
        lambda x: datetime.strptime(x, "%a, %d %b %Y %H:%M:%S %z"),
        lambda x: datetime.strptime(x, "%a, %d %b %Y %H:%M:%S GMT").replace(
            tzinfo=timezone.utc
        ),
        lambda x: datetime.strptime(x, "%Y-%m-%d"),
    ):
        try:
            dt = fn(s)
            if dt.tzinfo is not None:
                dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
            return dt
        except ValueError:
            continue
    return None


def parse_sitemap(xml_bytes: bytes) -> tuple[list[tuple[str, object]], list[str]]:
    """One sitemap document → (page_urls, child_sitemap_urls).

    ``page_urls`` is [(url, lastmod|None)] from a <urlset>; a
    <sitemapindex> instead yields child sitemap URLs (the caller
    recurses — in the engine that is simply another fetch wave over the
    ``child`` list, so index depth costs no special machinery)."""
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return [], []
    kind = _strip(root.tag)
    pages: list[tuple[str, object]] = []
    children: list[str] = []
    for el in root:
        if _strip(el.tag) not in ("url", "sitemap"):
            continue
        loc, lastmod = None, None
        for sub in el:
            t = _strip(sub.tag)
            if t == "loc":
                loc = (sub.text or "").strip()
            elif t == "lastmod":
                lastmod = _parse_dt(sub.text)
        if not loc:
            continue
        if kind == "sitemapindex":
            children.append(loc)
        else:
            pages.append((loc, lastmod))
    return pages, children


def parse_feed(xml_bytes: bytes) -> list[tuple[str, str | None, object]]:
    """RSS 2.0 or Atom document → [(url, title, published)]."""
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return []
    out: list[tuple[str, str | None, object]] = []
    kind = _strip(root.tag)
    if kind == "rss":
        for item in root.iter("item"):
            url = (item.findtext("link") or "").strip()
            if not url:
                continue
            out.append(
                (url, item.findtext("title"), _parse_dt(item.findtext("pubDate")))
            )
    elif kind == "feed":  # Atom
        for entry in root.iter(f"{_ATOM_NS}entry"):
            url = None
            for link in entry.iter(f"{_ATOM_NS}link"):
                if link.get("rel") in (None, "alternate"):
                    url = link.get("href")
                    break
            if not url:
                continue
            out.append(
                (
                    url,
                    entry.findtext(f"{_ATOM_NS}title"),
                    _parse_dt(
                        entry.findtext(f"{_ATOM_NS}published")
                        or entry.findtext(f"{_ATOM_NS}updated")
                    ),
                )
            )
    return out


def discover_batch(batch: pa.Table) -> pa.Table:
    """Ray stage (map_batches over zero-copy Arrow): fetched discovery
    documents (url_canon, content_type, body) → exploded candidate URLs
    with provenance. Sitemap-index children come back with
    via='sitemap_index' so the driver loop can fetch-and-recurse.
    ``idx`` is the row's 0-based position WITHIN its source document
    (pages and children enumerated separately) — the deterministic
    ordering key feed_candidates packs into srckeys, carried explicitly
    so downstream re-batching cannot lose document boundaries."""
    urls, vias, titles, lastmods, srcs, idxs = [], [], [], [], [], []
    for src, ctype, body in zip(
        batch["url_canon"].to_pylist(),
        batch["content_type"].to_pylist(),
        batch["body"].to_pylist(),
    ):
        low = src.lower()
        if "sitemap" in low or "xml" in (ctype or ""):
            pages, children = parse_sitemap(body or b"")
            if pages or children:
                for i, (u, lm) in enumerate(pages):
                    urls.append(u); vias.append("sitemap")
                    titles.append(None); lastmods.append(lm); srcs.append(src)
                    idxs.append(i)
                for i, u in enumerate(children):
                    urls.append(u); vias.append("sitemap_index")
                    titles.append(None); lastmods.append(None); srcs.append(src)
                    idxs.append(i)
                continue
        for i, (u, title, pub) in enumerate(parse_feed(body or b"")):
            urls.append(u); vias.append("feed")
            titles.append(title); lastmods.append(pub); srcs.append(src)
            idxs.append(i)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "via": pa.array(vias, type=pa.string()),
            "title": pa.array(titles, type=pa.string()),
            "lastmod": pa.array(lastmods, type=pa.timestamp("us")),
            "src": pa.array(srcs, type=pa.string()),
            "idx": pa.array(idxs, type=pa.int64()),
        }
    )


FEED_SRC_SEQ = (1 << 30) - 1  # max src_seq. NOTE (ADVICE r2): feed
# srckeys pack the URL's OWN host-part while link srckeys pack the
# SOURCE page's part, so the "page link beats feed" min-srckey tie-break
# only holds when both discoveries share a part; a cross-part page link
# whose source part exceeds the URL's part loses to the feed key (which
# then sets depth=1). Parity is preserved — the oracle packs keys
# identically — this comment just states the real tie-break semantics.


_EPOCH = datetime(1970, 1, 1)


def lastmod_to_us(dt) -> int:
    """lastmod/pubDate datetime (naive UTC, _parse_dt output) → int64
    microseconds since epoch; -1 when absent. The refresh-crawl version
    store compares these ints — shared by engine and oracle so both
    round identically."""
    if dt is None:
        return -1
    return int((dt - _EPOCH).total_seconds() * 1_000_000)


def feed_candidates(batch: pa.Table, n_parts: int) -> pa.Table:
    """Discovery rows (discover_batch output) → frontier candidate rows
    in the SAME schema as the link-explode stream, so both discovery
    channels union into the wave's ONE admission shuffle (D1):

        srckey64 = pack(part(host(url)), FEED_SRC_SEQ, idx-in-doc, depth=1)

    Deterministic: idx is the row's position within its feed document;
    ties between a URL listed in several discovery docs resolve by idx
    (same both sides of the parity suite). sitemap_index rows are NOT
    candidates — the driver re-queues them as next-wave discovery docs."""
    import numpy as np

    from ..functions.canon import canonicalize, host_of
    from ..functions.murmur3 import hash64s
    from ..stages.frontier import pack_srckey

    urls, hosts, idxs, lastmods = [], [], [], []
    for url, via, src, idx, lm in zip(
        batch["url"].to_pylist(), batch["via"].to_pylist(),
        batch["src"].to_pylist(), batch["idx"].to_pylist(),
        batch["lastmod"].to_pylist(),
    ):
        if via not in ("sitemap", "feed"):
            continue
        cu = canonicalize(url, base=src)
        if not cu:
            continue
        h = host_of(cu)
        if not h:
            continue
        urls.append(cu)
        hosts.append(h)
        idxs.append(min(int(idx), 65535))
        lastmods.append(lastmod_to_us(lm))
    uh = np.array([hash64s(u) for u in urls], dtype=np.int64)
    hh = np.array([hash64s(h) for h in hosts], dtype=np.int64)
    part = (hh.view(np.uint64) % np.uint64(n_parts)).astype(np.int64)
    srckey = pack_srckey(part, np.full(len(urls), FEED_SRC_SEQ, dtype=np.int64),
                         np.array(idxs, dtype=np.int64),
                         np.ones(len(urls), dtype=np.int64))
    return pa.table({
        "url_canon": pa.array(urls, type=pa.string()),
        "url_hash": pa.array(uh),
        "host": pa.array(hosts, type=pa.string()),
        "host_hash": pa.array(hh),
        "part": pa.array(part),
        "srckey64": pa.array(np.asarray(srckey, dtype=np.int64)),
        "seen_only": pa.array(np.zeros(len(urls), dtype=np.int64)),
        # feed-entry publish/lastmod stamp (µs; -1 absent) — the refresh
        # crawl's version signal: strictly-newer than the recorded
        # version re-admits an already-seen URL (config.refetch_if_newer)
        "lastmod_us": pa.array(np.asarray(lastmods, dtype=np.int64)),
    })
