"""Fetch transports (SURVEY §5.2): pluggable behind the fetch stage.

``SimTransport`` serves fetches from a mini-web pages table — the
default in this sealed sandbox (no network) and the thing that makes the
benchmark measure the engine instead of socket latency. ``HttpTransport``
is the real-web path (requests.Session reuse per actor); it exists for
API completeness and is guarded — untestable here.

A transport maps canonical URLs → (status, content_type, body,
latency_ms, final_url). Missing URLs are 404 with empty body. 3xx
responses are followed transport-side (≤ ``MAX_REDIRECTS`` hops, RFC
9110 semantics: the simulated Location is the body of the 3xx row);
``final_url`` is the URL that produced the terminal response, so the
engine can re-canonicalize and store the page under its real identity
(VERDICT r2 item #4 — every real news site redirects http→https/www/
slug changes, and a crawler that keys bodies by the ALIAS re-fetches
the same article under every alias).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

MAX_REDIRECTS = 5

# terminal status for a redirect chain longer than MAX_REDIRECTS (the
# requests lib raises TooManyRedirects; we need a deterministic row)
TOO_MANY_REDIRECTS = 310

NO_LASTMOD = -1  # int64 sentinel: response carries no Last-Modified


def validators_match(cond_etag, cond_lastmod_us, etag, lastmod_us) -> bool:
    """RFC 9110 conditional-GET revalidation: If-None-Match (etag
    equality) wins when both sides have an etag; otherwise
    If-Modified-Since (server Last-Modified not newer than the client's
    stamp). Shared pure kernel — the engine's transports and the
    sequential test oracle decide 304s through this one function."""
    if cond_etag is not None and etag is not None:
        return cond_etag == etag
    if (cond_lastmod_us is not None and cond_lastmod_us >= 0
            and lastmod_us is not None and lastmod_us >= 0):
        return lastmod_us <= cond_lastmod_us
    return False


def follow_redirects(fetch_one, url: str, max_hops: int = MAX_REDIRECTS):
    """Follow a 3xx chain through ``fetch_one(url) -> (status, ctype,
    body, latency_ms)``; the Location target is the (absolute-URL) body
    of the 3xx response. Latency accumulates across hops. Returns the
    5-tuple (status, ctype, body, latency_ms_total, final_url)."""
    total = 0.0
    cur = url
    for _ in range(max_hops + 1):
        status, ctype, body, lat = fetch_one(cur)
        total += float(lat)
        if 300 <= status < 400 and body:
            cur = bytes(body).decode("utf-8", "replace").strip()
            continue
        return status, ctype, body, total, cur
    return TOO_MANY_REDIRECTS, "text/html", b"", total, cur


class SimTransport:
    """Deterministic in-memory web. Loaded ONCE per fetch actor from the
    pages parquet (actor-pool ``__init__``), then O(1) dict lookups per
    URL. At bench scale the pages table is a few hundred MB per actor —
    the price of simulating a web without a network."""

    def __init__(self, pages_path: str):
        t = pq.read_table(pages_path)
        urls = t["url"].to_pylist()
        self._index = dict(
            zip(
                urls,
                zip(
                    t["status"].to_pylist(),
                    t["content_type"].to_pylist(),
                    t["html"].to_pylist(),
                    t["latency_ms"].to_pylist(),
                ),
            )
        )
        # optional server-side validators per URL (conditional refetch):
        # fixture tables may carry `etag` / `last_modified_us` columns
        n = len(urls)
        etags = (t["etag"].to_pylist() if "etag" in t.column_names
                 else [None] * n)
        lastmods = (t["last_modified_us"].to_pylist()
                    if "last_modified_us" in t.column_names
                    else [NO_LASTMOD] * n)
        self._validators = dict(zip(urls, zip(
            etags, (NO_LASTMOD if lm is None else int(lm) for lm in lastmods))))

    def fetch_many(self, urls: list[str]):
        """[(status, content_type, body, latency_ms, final_url)] aligned
        with urls; 3xx rows (body = Location) are followed."""
        idx = self._index
        miss = (404, "text/html", b"", 5.0)
        return [follow_redirects(lambda u: idx.get(u, miss), u) for u in urls]

    def fetch_many_cond(self, urls: list[str], conds=None):
        """Conditional-GET variant: ``conds`` is an aligned list of
        (etag, last_modified_us) validators (or None per URL / None for
        the whole list). A 200 terminal response whose current
        validators still match the condition becomes a 304 with an
        empty body — the revalidation costs the round-trip latency but
        never re-downloads the body. Returns 7-tuples
        (status, ctype, body, latency_ms, final_url, etag,
        last_modified_us); responses without validators carry
        (None, NO_LASTMOD)."""
        idx = self._index
        miss = (404, "text/html", b"", 5.0)
        out = []
        for i, u in enumerate(urls):
            status, ctype, body, lat, final = follow_redirects(
                lambda x: idx.get(x, miss), u)
            etag, lastmod = self._validators.get(final, (None, NO_LASTMOD))
            cond = conds[i] if conds is not None else None
            if (status == 200 and cond is not None
                    and validators_match(cond[0], cond[1], etag, lastmod)):
                out.append((304, ctype, b"", lat, final, etag, lastmod))
            else:
                out.append((status, ctype, body, lat, final, etag, lastmod))
        return out


class SynthTransport:
    """Implicit deterministic web (miniweb.synth_page): pages are
    regenerated from the URL on demand — O(1) actor memory, so the
    simulated web can be arbitrarily larger than RAM. This is the
    10^10-frontier-scale benchmark transport; SimTransport (materialized
    table) remains the oracle-parity fixture."""

    def __init__(self, spec: dict):
        from .miniweb import synth_page

        self._spec = dict(spec)
        self._page = synth_page

    def fetch_many(self, urls: list[str]):
        spec = self._spec
        page = self._page
        return [follow_redirects(lambda u: page(spec, u), u) for u in urls]


class HttpTransport:
    """Real-web transport: one ``requests.Session`` per actor (connection
    reuse), UA + timeout config. NOT exercised in this sandbox (no
    egress); the politeness schedule upstream already spaces requests."""

    def __init__(self, user_agent: str = "crawlray/0.1", timeout_s: float = 10.0):
        import requests  # present in env; unusable without network

        self._sess = requests.Session()
        self._sess.headers["User-Agent"] = user_agent
        self._timeout = timeout_s

    def fetch_many(self, urls: list[str]):
        import requests

        out = []
        for u in urls:
            try:
                # requests follows redirects; surface the FINAL url so
                # the engine re-canonicalizes instead of silently keying
                # the body under the alias (VERDICT r2 item #4)
                r = self._sess.get(u, timeout=self._timeout,
                                   allow_redirects=True)
                lat = r.elapsed.total_seconds() * 1000.0
                for hop in r.history:
                    lat += hop.elapsed.total_seconds() * 1000.0
                out.append(
                    (
                        r.status_code,
                        r.headers.get("Content-Type", ""),
                        r.content,
                        lat,
                        str(r.url),
                    )
                )
            except requests.TooManyRedirects:
                out.append((TOO_MANY_REDIRECTS, "", b"", 0.0, u))
            except Exception:
                out.append((599, "", b"", 0.0, u))
        return out

    def fetch_many_cond(self, urls: list[str], conds=None):
        """Conditional GET over the wire: If-None-Match / If-Modified-
        Since request headers from the recorded validators; ETag /
        Last-Modified response headers surfaced so the engine records
        the next baseline. NOT exercised in this sandbox (no egress)."""
        import requests
        from email.utils import format_datetime, parsedate_to_datetime

        out = []
        for i, u in enumerate(urls):
            headers = {}
            cond = conds[i] if conds is not None else None
            if cond is not None:
                if cond[0] is not None:
                    headers["If-None-Match"] = cond[0]
                if cond[1] is not None and cond[1] >= 0:
                    import datetime as _dt

                    headers["If-Modified-Since"] = format_datetime(
                        _dt.datetime.fromtimestamp(
                            cond[1] / 1e6, tz=_dt.timezone.utc),
                        usegmt=True)
            try:
                r = self._sess.get(u, timeout=self._timeout,
                                   allow_redirects=True, headers=headers)
                lat = r.elapsed.total_seconds() * 1000.0
                for hop in r.history:
                    lat += hop.elapsed.total_seconds() * 1000.0
                etag = r.headers.get("ETag")
                lm_hdr = r.headers.get("Last-Modified")
                lastmod = NO_LASTMOD
                if lm_hdr:
                    try:
                        lastmod = int(
                            parsedate_to_datetime(lm_hdr).timestamp() * 1e6)
                    except (TypeError, ValueError):
                        pass
                out.append((r.status_code,
                            r.headers.get("Content-Type", ""),
                            r.content, lat, str(r.url), etag, lastmod))
            except requests.TooManyRedirects:
                out.append((TOO_MANY_REDIRECTS, "", b"", 0.0, u,
                            None, NO_LASTMOD))
            except Exception:
                out.append((599, "", b"", 0.0, u, None, NO_LASTMOD))
        return out


def make_transport(spec: dict):
    """Build a transport from a config dict (picklable into actors)."""
    kind = spec.get("kind", "sim")
    if kind == "sim":
        return SimTransport(spec["pages_path"])
    if kind == "synth":
        return SynthTransport(spec)
    if kind == "http":
        return HttpTransport(
            user_agent=spec.get("user_agent", "crawlray/0.1"),
            timeout_s=spec.get("timeout_s", 10.0),
        )
    raise ValueError(f"unknown transport kind: {kind}")
