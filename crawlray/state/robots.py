"""Robots policy: per-host allow/deny prefix rules + crawl-delay budget,
plus the robots.txt TEXT parser and per-host fetch stage (S2 — the
reference fetches and parses ``/robots.txt`` per site; the pre-parsed
table remains the fast path).

Semantics follow stdlib ``urllib.robotparser`` longest-match convention
simplified to path prefixes: the longest matching rule wins; allow beats
deny on equal length; no rule → allowed. Grammar per RFC 9309: groups of
``User-agent`` lines (consecutive lines stack onto one group) followed by
``Allow``/``Disallow``/``Crawl-delay`` records; the group whose agent
token is the longest case-insensitive substring of our UA wins, ``*``
matches everything at specificity 0, and all groups naming the winning
agent merge. The robots table is tiny (one row per host) so it is
broadcast via ``ray.put`` and consulted inside stages — never shuffled
(SURVEY J1).
"""

from __future__ import annotations

from urllib.parse import urlsplit

DEFAULT_UA = "crawlray"

# compiled wildcard-rule regexes (rules containing * or a trailing $),
# keyed by the raw rule string — shared across policy instances
_WILDCARD_CACHE: dict = {}


def parse_robots_sitemaps(text: str) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body (sitemaps.org /
    RFC 9309 §2.3: independent of user-agent groups — they may appear
    anywhere and apply to every crawler). Order preserved, duplicates
    dropped; the values are absolute URLs by spec."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            v = value.strip()
            if v and v not in seen:
                seen.add(v)
                out.append(v)
    return out


def parse_robots_txt(
    text: str, user_agent: str = DEFAULT_UA, default_delay_ms: int = 1000
) -> tuple[list[str], list[str], int]:
    """robots.txt body → (allow_prefixes, deny_prefixes, crawl_delay_ms)
    for ``user_agent``. Unknown directives and malformed lines are
    ignored (a crawler treats a broken robots.txt leniently); rules
    before any User-agent line are ignored per the RFC."""
    ua = user_agent.lower()
    # group: [agents, allow, deny, delay_ms|None]
    groups: list[list] = []
    cur: list | None = None
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_agent:
                cur = [[], [], [], None]
                groups.append(cur)
            if value:
                cur[0].append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            continue  # record before any User-agent line
        if field == "allow":
            if value:
                cur[1].append(value)
        elif field == "disallow":
            if value:
                cur[2].append(value)
            # empty Disallow == allow everything: contributes no rule
        elif field == "crawl-delay":
            try:
                cur[3] = int(float(value) * 1000)
            except ValueError:
                pass

    def specificity(agents: list[str]) -> int:
        # RFC 9309 / urllib.robotparser: the group TOKEN must be a
        # substring of the crawler UA — never the reverse, else a longer
        # foreign token that merely contains our UA (e.g.
        # 'crawlray-images') would outrank the exact 'crawlray' group
        # (ADVICE r2).
        best = -1
        for a in agents:
            if a == "*":
                best = max(best, 0)
            elif a in ua:
                best = max(best, len(a))
        return best

    best_spec = max((specificity(g[0]) for g in groups), default=-1)
    if best_spec < 0:
        return [], [], default_delay_ms
    allow: list[str] = []
    deny: list[str] = []
    delay = None
    for g in groups:
        if specificity(g[0]) == best_spec:
            allow.extend(g[1])
            deny.extend(g[2])
            if g[3] is not None and delay is None:
                delay = g[3]
    return allow, deny, delay if delay is not None else default_delay_ms


class RobotsPolicy:
    def __init__(self, robots_rows: list[dict], default_delay_ms: int = 1000):
        """robots_rows: [{host, allow, deny, crawl_delay_ms}, ...]."""
        self._by_host: dict[str, tuple[list[str], list[str], int]] = {}
        self._transient: set[str] = set()  # failed fetches: retry next wave
        # host → robots-declared sitemap URLs (discovery channel D1:
        # probed alongside the /sitemap.xml and /rss.xml defaults)
        self._sitemaps: dict[str, list[str]] = {}
        self.default_delay_ms = default_delay_ms
        for r in robots_rows:
            self._by_host[r["host"]] = (
                list(r.get("allow") or []),
                list(r.get("deny") or []),
                int(r.get("crawl_delay_ms") or default_delay_ms),
            )
            if r.get("sitemaps"):
                self._sitemaps[r["host"]] = list(r["sitemaps"])

    def crawl_delay_ms(self, host: str) -> int:
        e = self._by_host.get(host)
        return e[2] if e else self.default_delay_ms

    @staticmethod
    def _rule_matches(rule: str, path: str) -> bool:
        """RFC 9309 §2.2.2 path matching: plain rules are prefix
        matches; ``*`` matches any byte sequence (incl. empty) and a
        trailing ``$`` anchors the end of the path. Compiled lazily and
        memoized per rule string (the module-level cache is shared by
        every policy instance — rule sets are tiny)."""
        if "*" not in rule and not rule.endswith("$"):
            return path.startswith(rule)
        rx = _WILDCARD_CACHE.get(rule)
        if rx is None:
            import re

            pat = re.escape(rule[:-1] if rule.endswith("$") else rule)
            pat = "^" + pat.replace(r"\*", ".*")
            if rule.endswith("$"):
                pat += "$"
            rx = re.compile(pat)
            _WILDCARD_CACHE[rule] = rx
        return rx.search(path) is not None

    def allowed(self, url_canon: str) -> bool:
        parts = urlsplit(url_canon)
        e = self._by_host.get(parts.hostname or "")
        if e is None:
            return True  # no robots → allowed (reference behavior)
        allow, deny, _ = e
        # RFC 9309: the match target is the path INCLUDING the query
        path = parts.path or "/"
        if parts.query:
            path = f"{path}?{parts.query}"
        # most-specific (longest-rule) match wins; allow beats deny on
        # equal length (the allow scan's strict > runs first)
        best_len, best_allow = -1, True
        for rule in allow:
            if rule and len(rule) > best_len and self._rule_matches(rule, path):
                best_len, best_allow = len(rule), True
        for rule in deny:
            if rule and len(rule) > best_len and self._rule_matches(rule, path):
                best_len, best_allow = len(rule), False
        return best_allow

    def allowed_many(self, urls: list[str]) -> list[bool]:
        return [self.allowed(u) for u in urls]

    @classmethod
    def from_arrow(cls, robots_table, default_delay_ms: int = 1000) -> "RobotsPolicy":
        """None → empty policy (every URL allowed, default delay)."""
        rows = robots_table.to_pylist() if robots_table is not None else []
        return cls(rows, default_delay_ms=default_delay_ms)

    # ---- incremental population (S2 fetch mode) ----
    def known(self) -> set[str]:
        """Hosts with a DURABLE policy entry. Hosts whose robots fetch
        failed (5xx / transport error → temporary deny-all) are excluded
        so the next wave's _ensure_robots retries them instead of caching
        the failure forever (ADVICE r2 / RFC 9309 §2.3.1.4)."""
        return set(self._by_host) - self._transient

    def sitemaps_for(self, host: str) -> list[str]:
        """Robots-declared sitemap URLs for a host ([] when none)."""
        return self._sitemaps.get(host, [])

    def add_rows(self, rows: list[dict]) -> None:
        for r in rows:
            host = r["host"]
            self._by_host[host] = (
                list(r.get("allow") or []),
                list(r.get("deny") or []),
                int(r.get("crawl_delay_ms") or self.default_delay_ms),
            )
            if r.get("sitemaps"):
                self._sitemaps[host] = list(r["sitemaps"])
            if r.get("fetched_ok", True):
                self._transient.discard(host)
            else:
                self._transient.add(host)


class RobotsFetcher:
    """S2 fetch stage: host batches → per-host robots.txt rules, through
    the SAME pluggable transport as page fetches (actor pool: transport
    built once per actor in ``__init__``). Status semantics per RFC 9309
    §2.3.1: 200 → parsed rules; 4xx (robots definitively absent) →
    allow-all, cached; 5xx / transport failure (robots UNREACHABLE) →
    temporary deny-all with fetched_ok=False, which RobotsPolicy treats
    as transient so the host is retried next wave (ADVICE r2)."""

    def __init__(self, transport_spec: dict, default_delay_ms: int = 1000,
                 user_agent: str = DEFAULT_UA):
        from ..sources.transport import make_transport

        self._transport = make_transport(transport_spec)
        self._default = default_delay_ms
        self._ua = user_agent

    def __call__(self, batch):
        import pyarrow as pa

        hosts = batch["host"].to_pylist()
        results = self._transport.fetch_many(
            [f"https://{h}/robots.txt" for h in hosts]
        )
        allows, denies, delays, oks, maps = [], [], [], [], []
        for status, _ctype, body, _lat, _final in results:
            if status == 200 and body:
                txt = bytes(body).decode("utf-8", errors="replace")
                a, d, ms = parse_robots_txt(txt, self._ua, self._default)
                allows.append(a); denies.append(d); delays.append(ms)
                maps.append(parse_robots_sitemaps(txt))
                oks.append(True)
            elif status >= 500 or status <= 0:
                # unreachable → temporary complete disallow, retried
                allows.append([]); denies.append(["/"])
                delays.append(self._default); oks.append(False)
                maps.append([])
            else:
                # 4xx: robots definitively absent → allow-all, cacheable
                allows.append([]); denies.append([]); delays.append(self._default)
                oks.append(True); maps.append([])
        return pa.table({
            "host": pa.array(hosts, type=pa.string()),
            "allow": pa.array(allows, type=pa.list_(pa.string())),
            "deny": pa.array(denies, type=pa.list_(pa.string())),
            "crawl_delay_ms": pa.array(delays, type=pa.int32()),
            "fetched_ok": pa.array(oks, type=pa.bool_()),
            "sitemaps": pa.array(maps, type=pa.list_(pa.string())),
        })


def fetch_robots_batch(batch, *, spec_token: str, transport_spec: dict,
                       default_delay_ms: int = 1000,
                       user_agent: str = DEFAULT_UA):
    """Task-based form of RobotsFetcher (see stages/taskstate.py):
    the transport is memoized per worker process instead of spawning a
    fresh actor pool every wave."""
    from ..stages.taskstate import instance

    r = instance("RobotsFetcher",
                 (spec_token, default_delay_ms, user_agent),
                 lambda: RobotsFetcher(transport_spec,
                                       default_delay_ms=default_delay_ms,
                                       user_agent=user_agent))
    return r(batch)
