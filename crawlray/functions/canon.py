"""URL canonicalization + validation (SURVEY.md §2.2 M1–M3).

The single most parity-critical UDF: the reference's URL-seen set is keyed
by canonical URLs (BASELINE.json north_rule: "canonicalized +
murmur3-hashed"). Both the distributed engine and the sequential oracle
(tests/oracle.py) call these same pure functions, so canonicalization can
never diverge between them; the property pinned by tests is idempotence
(``canonicalize(canonicalize(u)) == canonicalize(u)``) plus golden pairs.

Rules (RFC 3986 normalization + common crawler conventions):
- lowercase scheme and host; strip fragment; drop default ports (80/443)
- resolve ``.`` / ``..`` path segments; collapse ``//`` in paths
- percent-encoding: decode unreserved characters, uppercase remaining hex
- query: parse, drop tracking params (utm_*, fbclid, gclid, ...), sort by
  (key, value), re-encode; drop empty query
- empty path -> "/"
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urljoin, urlsplit, urlunsplit

TRACKING_PARAMS = re.compile(
    r"^(utm_\w+|fbclid|gclid|dclid|msclkid|mc_cid|mc_eid|ref|icid)$", re.I
)

# characters never percent-encoded in path/query after normalization
_SAFE_PATH = "/:@!$&'()*+,;=~.-_"
_SAFE_QUERY = ":@!$&'()*+,;/?~.-_"

_BINARY_EXT = re.compile(
    r"\.(?:jpe?g|png|gif|webp|svg|ico|bmp|tiff?|mp3|mp4|m4a|mkv|avi|mov|webm|"
    r"wav|ogg|pdf|zip|gz|tar|rar|7z|exe|dmg|iso|css|js|woff2?|ttf|eot)$",
    re.I,
)

DEFAULT_PORTS = {"http": "80", "https": "443"}


def _norm_path_segments(path: str) -> str:
    """Resolve ``.``/``..`` and collapse duplicate slashes, keeping a
    trailing slash if the original (resolved) path had one."""
    if not path:
        return "/"
    trailing = path.endswith("/")
    out: list[str] = []
    for seg in path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    norm = "/" + "/".join(out)
    if trailing and norm != "/":
        norm += "/"
    return norm


def _renc(s: str, safe: str) -> str:
    """Percent-decode then re-encode with a fixed safe set and uppercase
    hex — idempotent normalization of %-escapes."""
    return quote(unquote(s), safe=safe)


# ---- fast path ------------------------------------------------------
# The crawl hot loop canonicalizes ~35 links per page (10M+ calls per
# big wave); the overwhelmingly common case is a CLEAN link — an
# absolute path like "/sectie/3/artikel-55" against an
# already-canonical base, or a clean lowercase absolute URL — for which
# the full urljoin/urlsplit/percent-renorm pipeline is a no-op. The fast
# path recognizes exactly those inputs with two regexes and returns the
# identical result; ANY suspicious feature (%-escapes, query, fragment,
# ports, userinfo, uppercase scheme/host, dot segments, empty segments,
# backslashes, spaces) falls through to the slow path. Equivalence
# fast(u) == slow(u) on eligible inputs is property-tested
# (tests/test_canon.py) and parity-safe by construction: the engine and
# the sequential oracle share this one function.

_FAST_BASE = re.compile(
    r"^(https?://[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?)(?=/|$)"
)
_FAST_PATH = re.compile(r"^/(?:[A-Za-z0-9~._-]+/)*[A-Za-z0-9~._-]*$")


def _fast_canonicalize(url: str, base: str | None) -> str | None:
    if "%" in url or "?" in url or "#" in url or "\\" in url or " " in url:
        return None
    if url.startswith("/"):
        if not base:
            return None
        m = _FAST_BASE.match(base)
        if not m:
            return None
        prefix, path = m.group(1), url
    else:
        m = _FAST_BASE.match(url)
        if not m:
            return None
        prefix = m.group(1)
        path = url[len(prefix):]
        if not path:
            return prefix + "/"
    if not _FAST_PATH.match(path):
        return None
    if "/./" in path or "/../" in path or path.endswith(("/.", "/..")):
        return None
    return prefix + path


def canonicalize(url: str, base: str | None = None) -> str | None:
    """Canonical form of ``url`` (resolved against ``base`` if given), or
    None when the URL is not canonicalizable (bad scheme / no host)."""
    url = url.strip()
    fast = _fast_canonicalize(url, base)
    if fast is not None:
        return fast
    return _slow_canonicalize(url, base)


def _slow_canonicalize(url: str, base: str | None = None) -> str | None:
    if base:
        url = urljoin(base, url)
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        return None
    port = parts.port
    netloc = host
    if port is not None and str(port) != DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = _renc(_norm_path_segments(parts.path), _SAFE_PATH)
    query = ""
    if parts.query:
        kept = []
        for piece in parts.query.split("&"):
            if not piece:
                continue
            k, _, v = piece.partition("=")
            if not k and not v:
                # a bare "=" piece: emitting it would round-trip to an
                # empty piece (dropped above) — idempotence demands we
                # drop it NOW (hypothesis: c("?0&=") must equal c²)
                continue
            if TRACKING_PARAMS.match(unquote(k)):
                continue
            kept.append((_renc(k, _SAFE_QUERY.replace("&", "").replace("=", "")),
                         _renc(v, _SAFE_QUERY.replace("&", "").replace("=", ""))))
        kept.sort()
        query = "&".join(f"{k}={v}" if v else k for k, v in kept)
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url_canon: str) -> str:
    """Host (without port) of an already-canonical URL."""
    return urlsplit(url_canon).hostname or ""


TRAP_MAX_RUN = 2       # a path segment repeated consecutively > this
TRAP_MAX_SEGMENTS = 24  # unbounded-depth guard


def is_trap_path(url_canon: str, max_run: int = TRAP_MAX_RUN,
                 max_segments: int = TRAP_MAX_SEGMENTS) -> bool:
    """M2 crawler-trap heuristic: infinite URL spaces (calendar loops,
    relative-link cycles, session-path echoes) show up as a path segment
    repeated consecutively (``/a/a/a/…``) or as unboundedly deep paths.
    Real sites virtually never repeat a segment more than twice in a row,
    so the guard prunes the trap branch at the policy gate — the engine
    admits the URL to the SEEN set (dedup identity intact) but never
    fetches it, exactly like the depth and allowlist gates. True=trap."""
    path = urlsplit(url_canon).path
    segs = path.split("/")
    n = 0
    run = 1
    prev = None
    for s in segs:
        if not s:
            continue
        n += 1
        if n > max_segments:
            return True
        if s == prev:
            run += 1
            if run > max_run:
                return True
        else:
            run = 1
            prev = s
    return False


def is_crawlable(
    url_canon: str,
    *,
    allowed_hosts: set[str] | None = None,
    max_len: int = 2048,
) -> bool:
    """M2 validation: http(s) canonical URL, optional host allowlist, no
    binary-extension paths, bounded length, not a crawler-trap path."""
    if not url_canon or len(url_canon) > max_len:
        return False
    parts = urlsplit(url_canon)
    if parts.scheme not in ("http", "https"):
        return False
    if allowed_hosts is not None and (parts.hostname or "") not in allowed_hosts:
        return False
    if _BINARY_EXT.search(parts.path):
        return False
    if is_trap_path(url_canon):
        return False
    return True


def canonicalize_batch(urls, bases=None) -> list[str | None]:
    """Batch canonicalization used inside ``map_batches``. Per-row Python is
    unavoidable here (structural URL parsing has no Arrow kernel); a
    memo dict amortizes repeated URLs within a batch, which is common
    for crawl frontiers (duplicate links)."""
    memo: dict[str, str | None] = {}
    if bases is None:
        out = []
        for u in urls:
            r = memo.get(u)
            if r is None and u not in memo:
                r = canonicalize(u)
                memo[u] = r
            out.append(r)
        return out
    return [canonicalize(u, b) for u, b in zip(urls, bases)]
